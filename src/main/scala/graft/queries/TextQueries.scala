package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

object TextQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
