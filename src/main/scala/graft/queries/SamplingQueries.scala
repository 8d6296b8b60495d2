package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sampling.Sampling
import graft.text.TextAnalysis

/** Deterministic sampling / corpus-mixing queries over `documents`, with
  * DuckDB oracles re-deriving the same salted-hash buckets and window
  * quotas.
  */
object SamplingQueries {

  private val P = TextAnalysis.HashMod

  /** DuckDB twin of the per-token rolling hash (TextAnalysis.rollingHash)
    * — same fragment family as DedupQueries.charHash. */
  private def charHash(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($expr, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(acc, c) -> (acc * 31 + c) % $P)"

  /** Shared CTE prefix for the DSIR importance oracles: per-token hash
    * buckets, smoothed bucket stats, and the fixed-point probability
    * ratios — mirroring Sampling.importanceWeights term for term (every
    * factor cast to DOUBLE before multiplying, same association).
    */
  private val importanceCtes: String =
    s"""WITH tok AS (
       |  SELECT doc_id, lang = 'en' AS is_t,
       |    unnest(list_transform(regexp_split_to_array(trim(text), '\\s+'),
       |      tk -> ${charHash("tk")})) % 256 AS b
       |  FROM documents),
       |bs AS (
       |  SELECT b, CAST(count(*) AS BIGINT) AS c_r,
       |    CAST(count(*) FILTER (WHERE is_t) AS BIGINT) AS c_t
       |  FROM tok GROUP BY b),
       |tot AS (
       |  SELECT CAST(sum(c_r) AS BIGINT) AS n_r,
       |    CAST(sum(c_t) AS BIGINT) AS n_t
       |  FROM bs),
       |ratios AS (
       |  SELECT b,
       |    CAST(floor(1000000.0 *
       |      (CAST(c_t + 1 AS DOUBLE) * CAST(n_r + 256 AS DOUBLE)) /
       |      (CAST(c_r + 1 AS DOUBLE) * CAST(n_t + 256 AS DOUBLE)))
       |      AS BIGINT) AS ratio_fp
       |  FROM bs CROSS JOIN tot),
       |dtf AS (
       |  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS tf
       |  FROM tok GROUP BY 1, 2),
       |w AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       |    CAST(sum(tf * ratio_fp) AS BIGINT) AS importance_fp
       |  FROM dtf JOIN ratios USING (b) GROUP BY 1)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // 30% deterministic Bernoulli sample keyed on doc_id (salt 3)
    "q_sample_hash" -> ((s, dir) =>
      Sampling.sampleByHash(Tables(s, dir, "documents"), "doc_id",
        fraction = 0.3, salt = 3)),

    // curriculum-ordered export: a difficulty stage (length quartile by
    // exact ntile; shorter-first is the classic curriculum) composed
    // with the deterministic within-stage hash shuffle — stages feed
    // the trainer in order, each internally shuffled, all reproducible
    "q_pipeline_curriculum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val docs = Tables(s, dir, "documents").select("doc_id", "n_chars")
      val staged = docs.withColumn("stage",
        ntile(4).over(Window.orderBy(col("n_chars"), col("doc_id")))
          .cast("long"))
      val h = Sampling.saltedKeyHash(col("doc_id"), salt = 19)
      staged.withColumn("pos",
        (row_number().over(Window.partitionBy(col("stage"))
          .orderBy(h, col("doc_id"))) - 1).cast("long"))
    }),

    // per-epoch deterministic dataloader ordering: 3 epochs, 8 shards —
    // each epoch an independent permutation from (id, epoch) alone
    "q_sample_epoch_order" -> ((s, dir) =>
      Sampling.epochOrder(
        Tables(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", epochs = 3, nShards = 8)),

    // domain mixing: at most 8 docs per (source, lang), longest first
    "q_sample_cap" -> ((s, dir) =>
      Sampling.capPerGroup(Tables(s, dir, "documents"),
        Seq("source", "lang"), orderCol = "n_chars", tieCol = "doc_id", n = 8)),

    // language reweighting: per-group deterministic rates (salt 7) —
    // 80% of en, 50% of zh, 25% of de, 10% of everything else
    "q_sample_weighted" -> ((s, dir) =>
      Sampling.sampleByHashWeighted(Tables(s, dir, "documents"),
        keyCol = "doc_id", groupCol = "lang", rates = weightedRates,
        defaultRate = 0.1, salt = 7)),

    // mixture planning: the per-language sampling rates that hit the
    // target token mixture under a 500k budget — run BEFORE sampling
    "q_sample_mixture_plan" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      Sampling.mixturePlan(Tables(s, dir, "documents"), "lang",
        TextAnalysis.tokenCount(col("text")),
        mixtureTargets, budgetTokens = 500000L)
    }),

    // Neyman minimum-variance allocation of a 10k inspection budget
    // across return-flag strata: big AND noisy strata draw more; the
    // N_h·S_h weight stays integer as floor(sqrt(N·Σx² − (Σx)²))
    "q_sample_neyman" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      Sampling.neymanAllocation(
        Tables(s, dir, "lineitem").select(col("l_returnflag").as("flag"),
          floor(col("l_quantity") * 100.0).cast("long").as("qty_c")),
        "flag", "qty_c", budget = 10000L)
    }),

    // sequence packing: whitespace token counts, 512-token budget,
    // 8 deterministic shards (salt 5)
    "q_pack_sequences" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val docs = Tables(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      Sampling.packSequences(docs, keyCol = "doc_id", tokenCol = "n_tokens",
        budget = 512L, shards = 8, salt = 5)
    }),

    // stratified 80/10/10 train/val/test assignment (salt 11)
    "q_sample_splits" -> ((s, dir) =>
      Sampling.assignSplits(Tables(s, dir, "documents"), keyCol = "doc_id",
        splits = splitFractions, salt = 11)),

    // uniform (hash-ordered) 5-per-(source,lang) downsample, salt 13
    "q_sample_group_uniform" -> ((s, dir) =>
      Sampling.samplePerGroup(Tables(s, dir, "documents"), keyCol = "doc_id",
        groupCols = Seq("source", "lang"), n = 5, salt = 13)),

    // temperature-flattened mixing: keep-rates derived from √n_g group
    // sizes, expected output 25% of the corpus (salt 17)
    "q_sample_temperature" -> ((s, dir) =>
      Sampling.sampleTemperature(Tables(s, dir, "documents"), keyCol = "doc_id",
        groupCol = "source", outFraction = 0.25, salt = 17)),

    // deterministic corpus shuffle for training export: reproducible
    // (shard, pos) placement into 8 shards (salt 19)
    "q_sample_shards" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      Sampling.shuffleToShards(Tables(s, dir, "documents"), keyCol = "doc_id",
        nShards = 8, salt = 19)
        .select(col("doc_id"), col("shard"), col("pos"))
    }),

    // incremental shard assignment (daily drop): docs < 300 are the
    // already-exported history (only its per-shard counts load); the
    // rest append after each shard's high-water mark, same salt
    "q_sample_shards_inc" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val docs = Tables(s, dir, "documents")
      val counts = Sampling.shuffleToShards(docs.where(col("doc_id") < 300),
          keyCol = "doc_id", nShards = 8, salt = 19)
        .groupBy("shard").agg(count(lit(1)).as("n_rows"))
      Sampling.shuffleToShardsIncremental(docs.where(col("doc_id") >= 300),
          counts, keyCol = "doc_id", nShards = 8, salt = 19)
        .select(col("doc_id"), col("shard"), col("pos"))
    }),

    // DSIR-style importance weights: target slice = English docs,
    // 256 hash buckets, fixed-point probability-ratio scores
    "q_sample_importance" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      Sampling.importanceWeights(Tables(s, dir, "documents"),
        isTarget = col("lang") === "en", buckets = 256)
    }),

    // importance selection: top 64 docs by length-normalized score
    "q_sample_importance_topk" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      Sampling.selectByImportance(Tables(s, dir, "documents"),
        isTarget = col("lang") === "en", k = 64, buckets = 256)
    }),

    // mixture-weighting COMPOSITION: quality gate × importance score →
    // per-(lang, source) mixture accounting — the "how much of each
    // slice does the target-like, quality-passing corpus hold" table a
    // mixture designer reads before setting sampling rates
    "q_pipeline_weighting" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val docs = Tables(s, dir, "documents")
      val quality = TextAnalysis.qualityScore(docs)
        .select(col("doc_id"), col("quality_score"),
          col("n_tokens").as("q_n_tokens"))
      val imp = Sampling.importanceWeights(docs,
          isTarget = col("lang") === "en", buckets = 256)
        .select(col("doc_id"),
          floor(col("importance_fp") / col("n_tokens")).cast("long").as("spt"))
      val eligible = col("quality_score") >= 0.3 && col("q_n_tokens") >= 8
      docs.select("doc_id", "lang", "source")
        .join(quality, Seq("doc_id"))
        .join(imp, Seq("doc_id"))
        .withColumn("w", when(eligible, col("spt")).otherwise(0L))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          count_if(eligible).as("n_eligible"),
          sum(col("w")).as("sum_weight"),
          max(col("w")).as("max_weight"))
    }),

    // export pipeline COMPOSITION (the sampling-family flagship, peer of
    // q_pipeline_curation/_dedup/_embeddings): exact-dedup keep →
    // deterministic shuffle-to-shards (salt 23) → per-shard manifest
    // (doc count, token mass, first/last doc in shard order) — the
    // final "write the training corpus" accounting
    "q_pipeline_export" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val docs = Tables(s, dir, "documents")
      val kept = graft.dedup.Dedup.exact(docs)
        .where(col("is_kept")).select("doc_id")
      val corpus = docs.join(kept, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.shuffleToShards(corpus, keyCol = "doc_id", nShards = 8, salt = 23)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("sum_tokens"),
          min_by(col("doc_id"), col("pos")).as("first_doc"),
          max_by(col("doc_id"), col("pos")).as("last_doc"))
    })
  )

  private val splitFractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private val weightedRates = Map("en" -> 0.8, "zh" -> 0.5, "de" -> 0.25)

  /** ONE Scala value feeds the mixture-plan face and its oracle CASE. */
  private val mixtureTargets: Seq[(String, Long)] =
    Seq("en" -> 500L, "de" -> 200L, "fr" -> 150L, "es" -> 100L, "zh" -> 50L)

  val oracles: Map[String, String] = Map(
    // HUGEINT sufficient statistics, one IEEE sqrt on the same
    // decimal→double input, floor-div allocation with the size clamp
    "q_sample_neyman" ->
      """WITH x AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(floor(l_quantity * 100.0) AS BIGINT) AS v
        |  FROM lineitem),
        |per AS (
        |  SELECT flag, CAST(count(*) AS BIGINT) AS n_rows,
        |    sum(CAST(v AS HUGEINT)) AS sx,
        |    sum(CAST(v * v AS HUGEINT)) AS sxx
        |  FROM x GROUP BY 1),
        |w AS (
        |  SELECT flag, n_rows,
        |    CAST(floor(sqrt(CAST(CAST(n_rows AS HUGEINT) * sxx - sx * sx
        |      AS DOUBLE))) AS BIGINT) AS w
        |  FROM per),
        |tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w)
        |SELECT w.flag, w.n_rows, w.w,
        |  CAST(CASE WHEN t.tw > 0
        |    THEN least(w.n_rows, (10000 * w.w) // t.tw)
        |    ELSE 0 END AS BIGINT) AS alloc
        |FROM w CROSS JOIN tw t""".stripMargin,

    "q_sample_mixture_plan" -> {
      val cases = mixtureTargets
        .map { case (g, s) => s"WHEN lang = '$g' THEN CAST($s AS BIGINT)" }
        .mkString(" ")
      s"""WITH m AS (
         |  SELECT lang,
         |    CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
         |      AS BIGINT) AS mass,
         |    (CASE $cases ELSE CAST(0 AS BIGINT) END) * 500000 // 1000
         |      AS target_tokens
         |  FROM documents GROUP BY lang)
         |SELECT lang, mass, target_tokens,
         |  CASE WHEN mass <= 0 THEN CAST(0 AS BIGINT)
         |    ELSE least(1000000, (target_tokens * 1000000) // mass)
         |    END AS rate_s,
         |  (mass * (CASE WHEN mass <= 0 THEN 0
         |    ELSE least(1000000, (target_tokens * 1000000) // mass) END))
         |    // 1000000 AS expected_tokens
         |FROM m""".stripMargin
    },

    // ntile + the salted hash, both mirrored; the global stage window
    // is corpus-rank-exact in both engines
    "q_pipeline_curriculum" -> {
      val a = TextAnalysis.hashA(19)
      val b = TextAnalysis.hashB(19)
      s"""WITH s AS (
         |  SELECT doc_id, n_chars,
         |    CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS stage,
         |    (((doc_id % $P) * $a + $b) % $P) AS h
         |  FROM documents)
         |SELECT doc_id, n_chars, stage,
         |  CAST(row_number() OVER (PARTITION BY stage ORDER BY h, doc_id) - 1
         |    AS BIGINT) AS pos
         |FROM s""".stripMargin
    },

    // the engine's mid-square double-hash ladder with the epoch as the
    // probe index, mirrored term for term
    "q_sample_epoch_order" -> {
      val KP = 2147483647L
      def pm(a: String, b: Long) = s"((($a) % $b + $b) % $b)"
      val x = pm("doc_id", KP)
      val h1a = pm(s"$x * $x + 12345", KP)
      val h1 = pm(s"$h1a * $h1a + 6789", KP)
      val h2a = pm(s"($x + 40503) * ($x + 99991)", KP)
      val h2 = pm(s"$h2a * $h2a + 987654321", KP)
      val sk = pm(s"$h1 + e.epoch * $h2", KP)
      s"""SELECT doc_id, lang, e.epoch AS epoch, $sk AS sort_key,
         |  $sk % 8 AS shard
         |FROM documents, unnest(range(3)) AS e(epoch)""".stripMargin
    },

    "q_sample_hash" -> {
      val a = TextAnalysis.hashA(3)
      val b = TextAnalysis.hashB(3)
      s"""SELECT * FROM documents
         |WHERE (((doc_id % $P) * $a + $b) % $P) % 1000 < 300""".stripMargin
    },

    "q_sample_cap" ->
      """SELECT * FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY source, lang
        |    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
        |  FROM documents)
        |WHERE rank <= 8""".stripMargin,

    // mirrors Sampling.importanceWeights bucket-for-bucket (shared CTEs)
    "q_sample_importance" ->
      s"""$importanceCtes
         |SELECT doc_id, n_tokens, importance_fp FROM w""".stripMargin,

    // selection face: floor of double division (both engines' `/` on
    // BIGINT is double division), ties by doc_id
    "q_sample_importance_topk" ->
      s"""$importanceCtes
         |SELECT doc_id, n_tokens, importance_fp,
         |  CAST(floor(importance_fp / n_tokens) AS BIGINT) AS score_per_token
         |FROM w
         |ORDER BY score_per_token DESC, doc_id
         |LIMIT 64""".stripMargin,

    // mirrors the weighting composition: importance CTEs + the
    // q_text_quality formula verbatim, joined per doc, CASE-gated
    "q_pipeline_weighting" -> {
      val toks = "regexp_split_to_array(trim(text), '\\s+')"
      s"""$importanceCtes,
         |q AS (
         |  SELECT doc_id, lang, source,
         |    CAST(len($toks) AS BIGINT) AS q_n_tokens,
         |    least(1.0, CAST(len($toks) AS DOUBLE) / 64.0)
         |      * (1.0 - CAST(length(text) - length(regexp_replace(text,
         |          '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
         |        / greatest(CAST(length(text) AS DOUBLE), 1.0)) AS quality_score
         |  FROM documents),
         |j AS (
         |  SELECT q.lang, q.source,
         |    q.quality_score >= 0.3 AND q.q_n_tokens >= 8 AS eligible,
         |    CAST(floor(w.importance_fp / w.n_tokens) AS BIGINT) AS spt
         |  FROM q JOIN w USING (doc_id))
         |SELECT lang, source, count(*) AS n_docs,
         |  CAST(count(*) FILTER (WHERE eligible) AS BIGINT) AS n_eligible,
         |  CAST(sum(CASE WHEN eligible THEN spt ELSE 0 END) AS BIGINT) AS sum_weight,
         |  max(CASE WHEN eligible THEN spt ELSE 0 END) AS max_weight
         |FROM j GROUP BY 1, 2""".stripMargin
    },

    // mirrors the export composition: the exact-dedup twin embeds
    // verbatim from DedupQueries (one definition for both faces), then
    // the same salted shard hash, then per-shard arg_min/arg_max by pos
    "q_pipeline_export" -> {
      val a = TextAnalysis.hashA(23)
      val b = TextAnalysis.hashB(23)
      val toks = "regexp_split_to_array(trim(text), '\\s+')"
      s"""WITH kept AS (
         |  SELECT doc_id FROM (${DedupQueries.exactDedupSql}) WHERE is_kept),
         |corpus AS (
         |  SELECT d.doc_id, CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM documents d JOIN kept USING (doc_id)),
         |h AS (
         |  SELECT doc_id, n_tokens, ((doc_id % $P) * $a + $b) % $P AS h
         |  FROM corpus),
         |p AS (
         |  SELECT doc_id, n_tokens, CAST(h % 8 AS BIGINT) AS shard,
         |    row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS pos
         |  FROM h)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  arg_min(doc_id, pos) AS first_doc,
         |  arg_max(doc_id, pos) AS last_doc
         |FROM p GROUP BY shard""".stripMargin
    },

    // mirrors the incremental composition: history contributes only its
    // per-shard counts; the batch ranks within itself and offsets
    "q_sample_shards_inc" -> {
      val a = TextAnalysis.hashA(19)
      val b = TextAnalysis.hashB(19)
      s"""WITH hh AS (
         |  SELECT doc_id, ((doc_id % $P) * $a + $b) % $P AS h FROM documents),
         |hist AS (
         |  SELECT CAST(h % 8 AS BIGINT) AS shard,
         |    CAST(count(*) AS BIGINT) AS n_rows
         |  FROM hh WHERE doc_id < 300 GROUP BY 1),
         |b AS (
         |  SELECT doc_id, h, CAST(h % 8 AS BIGINT) AS shard
         |  FROM hh WHERE doc_id >= 300),
         |p AS (
         |  SELECT doc_id, shard,
         |    row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1 AS pos0
         |  FROM b)
         |SELECT p.doc_id, p.shard,
         |  CAST(p.pos0 + coalesce(hist.n_rows, 0) AS BIGINT) AS pos
         |FROM p LEFT JOIN hist USING (shard)""".stripMargin
    },

    // mirrors Sampling.shuffleToShards: same full-range salted hash,
    // shard = h mod 8, pos = 0-based rank of (h, doc_id) within shard
    "q_sample_shards" -> {
      val a = TextAnalysis.hashA(19)
      val b = TextAnalysis.hashB(19)
      s"""WITH h AS (
         |  SELECT doc_id, ((doc_id % $P) * $a + $b) % $P AS h
         |  FROM documents)
         |SELECT doc_id, CAST(h % 8 AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1
         |    AS BIGINT) AS pos
         |FROM h""".stripMargin
    },

    "q_sample_weighted" -> {
      val a = TextAnalysis.hashA(7)
      val b = TextAnalysis.hashB(7)
      // built from the SAME map the Spark query uses — a rate tweak
      // cannot desynchronize the two faces
      val cases = weightedRates
        .map { case (g, r) => s"WHEN lang = '$g' THEN ${(r * 1000.0).toLong}" }
        .mkString(" ")
      s"""SELECT * FROM documents
         |WHERE (((doc_id % $P) * $a + $b) % $P) % 1000 <
         |  CASE $cases ELSE 100 END""".stripMargin
    },

    "q_pack_sequences" -> {
      val a = TextAnalysis.hashA(5)
      val b = TextAnalysis.hashB(5)
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         |    ((((doc_id % $P) * $a + $b) % $P) % 1000) % 8 AS shard
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, n_tokens, shard,
         |    -- sum() OVER returns HUGEINT in DuckDB; pin to BIGINT so the
         |    -- modulo below types like the Spark face
         |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
         |      AS BIGINT) AS start
         |  FROM d)
         |SELECT doc_id, n_tokens, shard,
         |  CAST(floor(start / 512) AS BIGINT) AS seq_id,
         |  CAST(start % 512 AS BIGINT) AS seq_offset
         |FROM s""".stripMargin
    },

    "q_sample_splits" -> {
      val a = TextAnalysis.hashA(11)
      val b = TextAnalysis.hashB(11)
      // CASE ladder built from the SAME fraction list the Spark query
      // uses, so a fraction tweak cannot desynchronize the faces
      val cums = splitFractions.map(_._2 * 1000.0)
        .scanLeft(0L)((acc, f) => acc + f.toLong).tail
      val whens = splitFractions.zip(cums)
        .map { case ((name, _), cum) => s"WHEN bucket < $cum THEN '$name'" }
        .mkString(" ")
      s"""WITH d AS (
         |  SELECT *, (((doc_id % $P) * $a + $b) % $P) % 1000 AS bucket
         |  FROM documents)
         |SELECT * EXCLUDE (bucket), CASE $whens END AS split FROM d""".stripMargin
    },

    "q_sample_temperature" -> {
      val a = TextAnalysis.hashA(17)
      val b = TextAnalysis.hashB(17)
      s"""WITH w AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_g,
         |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
         |      AS w_s
         |  FROM documents GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(w_s) AS BIGINT) AS w_total,
         |    CAST(sum(n_g) AS BIGINT) AS n_total
         |  FROM w),
         |r AS (
         |  SELECT source,
         |    least(CAST(1000 AS BIGINT),
         |      CAST(floor(CAST(0.25 AS DOUBLE) * CAST(n_total AS DOUBLE)
         |        * CAST(w_s AS DOUBLE) / CAST(w_total AS DOUBLE)
         |        / CAST(n_g AS DOUBLE) * 1000.0) AS BIGINT)) AS threshold
         |  FROM w CROSS JOIN tot)
         |SELECT d.* FROM documents d JOIN r USING (source)
         |WHERE (((d.doc_id % $P) * $a + $b) % $P) % 1000 < r.threshold""".stripMargin
    },

    "q_sample_group_uniform" -> {
      val a = TextAnalysis.hashA(13)
      val b = TextAnalysis.hashB(13)
      s"""SELECT * FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY source, lang
         |    ORDER BY (((doc_id % $P) * $a + $b) % $P) % 1000, doc_id)
         |    AS BIGINT) AS rank
         |  FROM documents)
         |WHERE rank <= 5""".stripMargin
    }
  )
}
