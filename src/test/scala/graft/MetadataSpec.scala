package graft

import org.apache.spark.sql.functions._

import graft.analytics.Metadata

/** Unit semantics of the metadata date/title assets
  * (publication_date.py, titles.py) on hand-checked fixtures; hash
  * parity vs DuckDB is owned by the q_domain_* oracles.
  */
class MetadataSpec extends SparkTestBase {

  import spark.implicits._

  private def date(s: String) = java.sql.Date.valueOf(s)

  private val mids = Seq((1L, "m1"), (2L, "m2"), (3L, "m3"), (4L, "m4"), (5L, "m5"))
    .toDF("manifestation_id_i", "manifestation_id")
  // manifestation i → edition i (1:1 here)
  private val emap = (1L to 5L).map(i => (i, i)).toDF("manifestation_id_i", "edition_id_i")
  private val editionIds = (1L to 5L).map(i => (i, s"e$i")).toDF("edition_id_i", "edition_id")

  test("editionPublicationDate: ESTC year wins; corpus strings only as fallback") {
    val estc = Seq(("e1", Some(1700)), ("e2", None), ("e3", None), ("e4", None))
      .toDF("estc_id", "publication_year")
    val eebo = Seq(
      ("m1", "1650"),            // 4-char string, but ESTC 1700 present → 1700 wins
      ("m2", "-1697"),           // 5-char, no ESTC → 1697
      ("m3", "1690-1697"),       // 9-char → first year 1690
      ("m4", "April 24, 1649"))  // long form → exact date
      .toDF("eebo_tcp_id", "eebo_tls_publication_date")
    val empty = spark.emptyDataFrame
      .withColumn("ecco_id", lit("x")).withColumn("ecco_date_start", lit(0))
    val noNews = spark.emptyDataFrame
      .withColumn("article_id", lit("x"))
      .withColumn("issue_start_date", lit(null).cast("date"))
    val out = Metadata.editionPublicationDate(mids, emap, editionIds, estc,
        eebo, empty, noNews)
      .collect().map(r => r.getLong(0) -> Option(r.getDate(1))).toMap
    assert(out(1L) === Some(date("1700-01-01")))
    assert(out(2L) === Some(date("1697-01-01")))
    assert(out(3L) === Some(date("1690-01-01")))
    assert(out(4L) === Some(date("1649-04-24")))
  }

  test("manifestationPublicationDate: corpus string wins over ESTC (inverse priority)") {
    val estc = Seq(("e1", Some(1700))).toDF("estc_id", "publication_year")
    val eebo = Seq(("m1", "1650")).toDF("eebo_tcp_id", "eebo_tls_publication_date")
    val ecco = Seq(("m2", 17580101, "t"))
      .toDF("ecco_id", "ecco_date_start", "ecco_full_title")
    val noNews = spark.emptyDataFrame
      .withColumn("article_id", lit("x"))
      .withColumn("issue_start_date", lit(null).cast("date"))
    val out = Metadata.manifestationPublicationDate(mids, emap, editionIds, estc,
        eebo, ecco, noNews)
      .collect().map(r => r.getLong(0) -> Option(r.getDate(1))).toMap
    // m1: the eebo string 1650 is used even though ESTC says 1700
    assert(out(1L) === Some(date("1650-01-01")))
    // m2: plausible yyyymmdd → year prefix
    assert(out(2L) === Some(date("1758-01-01")))
  }

  test("manifestationTitle MAX-collapses multi-mapped EEBO titles past NULLs") {
    val ecco = Seq(("m2", 0, "ECCO title"))
      .toDF("ecco_id", "ecco_date_start", "ecco_full_title")
    val eebo = Seq(
      ("m1", "1650", Option("EEBO title")),
      ("m1", "1650", None))  // second mapping with NULL title
      .toDF("eebo_tcp_id", "eebo_tls_publication_date", "eebo_tls_title")
    val news = Seq(("m3", date("1700-01-01"), "NEWS title"))
      .toDF("article_id", "issue_start_date", "newspaper_title")
    val out = Metadata.manifestationTitle(mids, ecco, eebo, news)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "EEBO title", 2L -> "ECCO title", 3L -> "NEWS title"))
  }

  test("yearHistogramEnds returns latest-N then earliest-N") {
    val pd = Seq.tabulate(30)(i => (i.toLong, date(s"${1700 + i}-01-01")))
      .toDF("id", "publication_date")
    val out = Metadata.yearHistogramEnds(pd, 3).collect()
      .map(r => r.getInt(0))
    assert(out.toSeq === Seq(1729, 1728, 1727, 1700, 1701, 1702))
  }
}
