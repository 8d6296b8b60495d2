package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Author/actor metadata assets (reference:
  * etl_textreuse/assets/actors_and_authors.py:11-55): dictionary-encoded
  * actors and the per-edition author table.
  *
  * Scale notes: all inputs are metadata-cardinality (editions/actors,
  * orders of magnitude below pieces) — joins here broadcast; the output
  * `edition_authors` is itself the broadcast side of every downstream
  * reception-statistics join.
  */
object Metadata {

  /** The actors of each edition that hold the AUTHOR role (reference:
    * actors_and_authors.py:47-51). The role restriction is part of the
    * LEFT join condition — a mixed equi+constant predicate (J5), NOT a
    * pre-filter, so editions whose only links are non-author roles stay
    * present with a NULL author (downstream statistics treat "no author"
    * distinctly from "different author").
    *
    * @param editionIds (edition_id, edition_id_i)
    * @param actorLinks (estc_id, actor_id, actor_role_author)
    * @param actorIds   (actor_id, actor_id_i)
    * @return (edition_id_i, actor_id_i nullable)
    */
  def editionAuthors(editionIds: DataFrame, actorLinks: DataFrame,
      actorIds: DataFrame): DataFrame =
    editionIds
      .join(broadcast(actorLinks),
        col("estc_id") === col("edition_id") && col("actor_role_author") === 1,
        "left")
      .join(broadcast(actorIds), Seq("actor_id"), "left")
      .select("edition_id_i", "actor_id_i")

  /** Publication date of each manifestation (reference:
    * publication_date.py:136-197): a three-branch UNION ALL, one per
    * corpus, each with the reference's messy-date normalization ladder —
    * the engine's densest scalar-function site:
    *
    *  - EEBO: the TLS date string parsed by LENGTH cases ("1697",
    *    "-1697", "1690-1697", "April 24, 1649"), ESTC year fallback when
    *    absent; aggregated MIN per manifestation because one document
    *    can carry several ESTC mappings;
    *  - ECCO: the numeric yyyymmdd start date when plausible (non-zero,
    *    not the year-1000 sentinel, ≤ 1839), else the ESTC year;
    *  - newspapers: the issue start date verbatim.
    *
    * All branches are map-side scalar work + broadcast metadata joins;
    * the only shuffle is the EEBO MIN aggregation on manifestation_id_i.
    *
    * @param mids (manifestation_id_i, manifestation_id)
    * @param editionMapping (manifestation_id_i, edition_id_i)
    * @param editionIds (edition_id_i, edition_id)
    * @param estcCore (estc_id, publication_year nullable)
    * @param eeboCore (eebo_tcp_id, eebo_tls_publication_date, ...)
    * @param eccoCore (ecco_id, ecco_date_start, ...)
    * @param newspapersCore (article_id, issue_start_date, ...)
    * @return (manifestation_id_i, publication_date nullable)
    */
  def manifestationPublicationDate(mids: DataFrame, editionMapping: DataFrame,
      editionIds: DataFrame, estcCore: DataFrame, eeboCore: DataFrame,
      eccoCore: DataFrame, newspapersCore: DataFrame): DataFrame = {
    def withEstc(corpus: DataFrame, idCol: String): DataFrame =
      corpus
        .join(broadcast(mids), col(idCol) === col("manifestation_id"))
        .join(broadcast(editionMapping), Seq("manifestation_id_i"))
        .join(broadcast(editionIds), Seq("edition_id_i"))
        .join(broadcast(estcCore), col("edition_id") === col("estc_id"), "left")
    val d = col("eebo_tls_publication_date")
    val estcDate =
      to_date(concat(col("publication_year").cast("int").cast("string"), lit("-01-01")))
    val eebo = withEstc(eeboCore, "eebo_tcp_id")
      .select(col("manifestation_id_i"),
        when(d.isNull, estcDate)
          .when(length(d) === 4, to_date(concat(d, lit("-01-01"))))
          .when(length(d) === 5, to_date(concat(substring(d, -4, 4), lit("-01-01"))))
          .when(length(d) === 9, to_date(concat(substring(d, 1, 4), lit("-01-01"))))
          .when(length(d) > 9, to_date(d, "LLLL d, yyyy"))
          .as("publication_date"))
      // one document, several ESTC mappings → earliest wins
      .groupBy("manifestation_id_i")
      .agg(min("publication_date").as("publication_date"))
    val ds = col("ecco_date_start")
    val ecco = withEstc(eccoCore, "ecco_id")
      .select(col("manifestation_id_i"),
        when(ds =!= 0 && ds =!= 10000101 && ds <= 18390000,
            to_date(concat(substring(ds.cast("int").cast("string"), 1, 4), lit("-01-01"))))
          .otherwise(estcDate)
          .as("publication_date"))
    val news = newspapersCore
      .join(broadcast(mids), col("article_id") === col("manifestation_id"))
      .select(col("manifestation_id_i"), col("issue_start_date").as("publication_date"))
    eebo.unionAll(ecco).unionAll(news)
  }

  /** Publication date of each EDITION (reference:
    * publication_date.py:15-73). Differs from the manifestation asset in
    * two reference-faithful ways: the ESTC year takes PRIORITY here (the
    * corpus strings are only consulted when ESTC is silent — the
    * manifestation asset prefers the corpus strings), and the branches
    * combine with UNION (distinct) rather than UNION ALL.
    *
    * @return (edition_id_i, publication_date nullable), distinct
    */
  def editionPublicationDate(mids: DataFrame, editionMapping: DataFrame,
      editionIds: DataFrame, estcCore: DataFrame, eeboCore: DataFrame,
      eccoCore: DataFrame, newspapersCore: DataFrame): DataFrame = {
    def withEstc(corpus: DataFrame, idCol: String): DataFrame =
      corpus
        .join(broadcast(mids), col(idCol) === col("manifestation_id"))
        .join(broadcast(editionMapping), Seq("manifestation_id_i"))
        .join(broadcast(editionIds), Seq("edition_id_i"))
        .join(broadcast(estcCore), col("edition_id") === col("estc_id"), "left")
    val estcYearDate =
      to_date(col("publication_year").cast("int").cast("string"), "yyyy")
    val d = col("eebo_tls_publication_date")
    val eebo = withEstc(eeboCore, "eebo_tcp_id")
      .select(col("edition_id_i"),
        when(col("publication_year").isNull,
            when(length(d) === 4, to_date(d, "yyyy"))
              .when(length(d) === 5, to_date(substring(d, -4, 4), "yyyy"))
              .when(length(d) === 9, to_date(substring(d, 1, 4), "yyyy"))
              .when(length(d) > 9, to_date(d, "LLLL d, yyyy")))
          .otherwise(estcYearDate)
          .as("publication_date"))
    val ds = col("ecco_date_start")
    val ecco = withEstc(eccoCore, "ecco_id")
      .select(col("edition_id_i"),
        when(col("publication_year").isNull && ds =!= 0,
            to_date(substring(ds.cast("int").cast("string"), 1, 4), "yyyy"))
          .when(col("publication_year").isNull && ds === 0, lit(null).cast("date"))
          .otherwise(estcYearDate)
          .as("publication_date"))
    val news = newspapersCore
      .join(broadcast(mids), col("article_id") === col("manifestation_id"))
      .join(broadcast(editionMapping), Seq("manifestation_id_i"))
      .select(col("edition_id_i"), col("issue_start_date").as("publication_date"))
    eebo.unionAll(ecco).unionAll(news).distinct()
  }

  /** Earliest publication date per WORK (reference:
    * publication_date.py:90-106): edition dates rolled up through the
    * edition → manifestation → work mappings with a MIN; the joins are
    * LEFT like the reference, so editions outside the work mapping land
    * in a NULL-work group instead of vanishing.
    *
    * @param workMapping (manifestation_id_i, work_id_i)
    */
  def workEarliestPublicationDate(editionPubDate: DataFrame,
      editionMapping: DataFrame, workMapping: DataFrame): DataFrame =
    editionPubDate
      .join(broadcast(editionMapping), Seq("edition_id_i"), "left")
      .join(broadcast(workMapping), Seq("manifestation_id_i"), "left")
      .groupBy("work_id_i")
      .agg(min("publication_date").as("publication_date"))

  /** Title of each manifestation (reference: titles.py:10-34): per-corpus
    * UNION ALL; the EEBO branch MAX-collapses titles per manifestation
    * (A5 max-string at its domain site) because one eebo_tcp id maps to
    * several rows, some with NULL titles.
    *
    * @return (manifestation_id_i, title)
    */
  def manifestationTitle(mids: DataFrame, eccoCore: DataFrame,
      eeboCore: DataFrame, newspapersCore: DataFrame): DataFrame = {
    val ecco = mids.join(eccoCore, col("ecco_id") === col("manifestation_id"))
      .select(col("manifestation_id_i"), col("ecco_full_title").as("title"))
    val eebo = mids.join(eeboCore, col("eebo_tcp_id") === col("manifestation_id"))
      .groupBy("manifestation_id_i")
      .agg(max("eebo_tls_title").as("title"))
    val news = mids.join(newspapersCore, col("article_id") === col("manifestation_id"))
      .select(col("manifestation_id_i"), col("newspaper_title").as("title"))
    ecco.unionAll(eebo).unionAll(news)
  }

  /** Publication-year histogram (reference: publication_date.py:74-79):
    * count per year, first `limit` years ascending. NULL years (no
    * parseable date anywhere) sort FIRST explicitly — Spark and SQL
    * engines disagree on the default.
    */
  def yearHistogram(pubDates: DataFrame, limit: Int): DataFrame =
    pubDates
      .groupBy(year(col("publication_date")).as("publication_year"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("publication_year").asc_nulls_first)
      .limit(limit)

  /** The twin LIMIT summary (reference: publication_date.py:196-211):
    * latest `limit` years UNION ALL earliest `limit` years.
    */
  def yearHistogramEnds(pubDates: DataFrame, limit: Int): DataFrame = {
    val counts = pubDates
      .groupBy(year(col("publication_date")).as("publication_year"))
      .agg(count(lit(1)).as("cnt"))
    counts.orderBy(col("publication_year").desc_nulls_last).limit(limit)
      .unionAll(counts.orderBy(col("publication_year").asc_nulls_first).limit(limit))
  }
}
