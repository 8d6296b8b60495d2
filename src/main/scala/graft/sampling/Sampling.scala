package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deterministic corpus sampling and mixing operators — the knobs a
  * training-data pipeline turns between dedup and tokenization:
  *
  *  - hash-based Bernoulli sampling: membership decided by a salted
  *    integer hash of a key, so the same (key, salt, fraction) always
  *    selects the same rows on any cluster, any partitioning, any run —
  *    unlike `df.sample`, whose per-partition RNG changes with the
  *    split layout. Map-only, no shuffle, trivially pushed to scans.
  *  - per-group quota caps ("domain mixing"): keep at most n rows per
  *    group by a quality ordering. One shuffle on the group key; groups
  *    are bounded (domains, sources, languages), so the per-group window
  *    sort never sees pathological partitions at scale.
  */
object Sampling {

  private val P = TextAnalysis.HashMod

  /** Salted hash bucket in [0, 1000) for a non-negative 64-bit key
    * column. Negative keys produce negative remainders (Spark and
    * DuckDB both follow sign-of-dividend `%`, so the two engines still
    * agree) and would always pass the sample filter — map ids to
    * non-negative space first if your keys can be negative.
    */
  def hashBucket(key: Column, salt: Int): Column =
    (((key % P) * lit(TextAnalysis.hashA(salt)) + lit(TextAnalysis.hashB(salt))) % P) % 1000L

  /** Deterministic Bernoulli sample: keep rows whose salted key-hash
    * bucket falls below fraction·1000. Changing `salt` draws an
    * independent sample; the same salt reproduces the sample exactly.
    */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double,
      salt: Int = 0): DataFrame =
    df.where(hashBucket(col(keyCol), salt) < (fraction * 1000.0).toLong)

  /** Per-group weighted Bernoulli sample — the domain-mixing knob
    * (Gopher/DoReMi-style corpus reweighting): each group keeps its own
    * deterministic fraction of rows, e.g. 80% of `en`, 25% of `de`, 10%
    * of everything else. Same salted-hash membership as [[sampleByHash]]
    * (reproducible on any cluster and partitioning); the per-group
    * threshold is a literal map lookup, so the filter stays map-only
    * and codegen'd — no join, no shuffle, pushable to the scan.
    *
    * Rates are quantized to 1/1000ths (the hash-bucket resolution);
    * groups absent from `rates` fall back to `defaultRate`.
    */
  def sampleByHashWeighted(df: DataFrame, keyCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: Int = 0): DataFrame = {
    val thresholds = rates.map { case (g, r) => g -> (r * 1000.0).toLong }
    df.where(hashBucket(col(keyCol), salt) <
      coalesce(element_at(typedlit(thresholds), col(groupCol)),
        lit((defaultRate * 1000.0).toLong)))
  }

  /** Temperature-flattened corpus mixing (the mT5/PaLM α = 0.5 rule):
    * group keep-rates are DERIVED from the group sizes so the expected
    * output mix follows p_g ∝ √n_g — big domains are downweighted, the
    * long tail upweighted, without anyone hand-maintaining a rate map
    * (that manual knob is [[sampleByHashWeighted]]). `outFraction`
    * sets the expected total output size; a group whose flattened
    * share exceeds its row count caps at keep-everything (rate 1), so
    * tiny groups are never oversampled into duplication.
    *
    * Determinism: weights are fixed-point √n (sqrt is IEEE
    * correctly-rounded — unlike pow — which is why α is fixed at 0.5),
    * totals are integer sums, and the final rate expression is a fixed
    * AST over exact integers, so the 1/1000th-quantized thresholds are
    * engine-exact. Membership is the same salted-hash bucket as every
    * sampler here. Scale shape: one partial-agged groupBy for counts
    * (|groups| rows), a 1-row bounded-aggregate attach for the totals
    * (the designed BNLJ shape), thresholds broadcast back — the corpus
    * itself is filtered map-side and never shuffles.
    */
  def sampleTemperature(df: DataFrame, keyCol: String, groupCol: String,
      outFraction: Double, salt: Int = 0): DataFrame = {
    require(outFraction > 0.0 && outFraction <= 1.0,
      s"outFraction must be in (0, 1], got $outFraction")
    val weighted = df.groupBy(groupCol).agg(count(lit(1)).as("n_g"))
      .withColumn("w_s",
        floor(sqrt(col("n_g").cast("double")) * lit(1000000.0)).cast("long"))
    val totals = weighted.agg(sum(col("w_s")).as("w_total"), sum(col("n_g")).as("n_total"))
    val thresholds = weighted.join(broadcast(totals))
      .select(col(groupCol),
        least(lit(1000L),
          floor(lit(outFraction) * col("n_total").cast("double") *
              col("w_s").cast("double") / col("w_total").cast("double") /
              col("n_g").cast("double") * lit(1000.0))
            .cast("long")).as("_threshold"))
    df.join(broadcast(thresholds), Seq(groupCol))
      .where(hashBucket(col(keyCol), salt) < col("_threshold"))
      .drop("_threshold")
  }

  /** Sequence packing — the training-batch construction step that runs
    * after sampling and before tokenized shards are written: documents
    * are packed into fixed token-budget sequences, contiguous-fill in a
    * deterministic order (each document starts at the running-token
    * offset of its predecessors; the sequence id is the budget-quotient
    * of that start offset, so a document whose tokens straddle a
    * boundary belongs to the sequence where it starts — the "packed
    * sequences with document boundaries" layout).
    *
    * Scale shape: a single global ordering would serialize the corpus
    * through one window partition, so packing is sharded — each document
    * is salted-hashed into one of `shards` independent packing streams
    * and the running sum windows per shard. Shards at cluster scale are
    * sized to executor count (thousands), each sorting |corpus|/shards
    * rows; determinism is preserved because shard assignment and
    * intra-shard order both derive from the key, not the partitioning.
    *
    * Output: input columns + `shard`, `seq_id` (per-shard sequence
    * number), `seq_offset` (token offset of this document within its
    * sequence's budget window).
    */
  def packSequences(df: DataFrame, keyCol: String, tokenCol: String,
      budget: Long, shards: Int, salt: Int = 0): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", hashBucket(col(keyCol), salt) % shards.toLong)
      .withColumn("_start", sum(col(tokenCol)).over(w) - col(tokenCol))
      // floor, not integer cast: `/` on longs is double division in both
      // Spark and DuckDB, and floor keeps the two faces identical
      .withColumn("seq_id", floor(col("_start") / budget).cast("long"))
      .withColumn("seq_offset", col("_start") % budget)
      .drop("_start")
  }

  /** Stratified train/val/test assignment: each row gets a named split,
    * decided by which cumulative salted-hash threshold its key bucket
    * falls under — deterministic on any cluster/partitioning, and the
    * splits are exactly disjoint and exhaustive by construction (the
    * CASE ladder covers [0, 1000)). Fractions are quantized to 1/1000ths
    * and must sum to 1 after quantization; map-only, scan-pushable.
    */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], salt: Int = 0,
      splitCol: String = "split"): DataFrame =
    assignSplitsBy(df, col(keyCol), splits, salt, splitCol)

  /** [[assignSplits]] generalized to an arbitrary decision key
    * expression — the form [[splitByGroup]] uses to split on a GROUP
    * representative instead of the row's own key.
    */
  def assignSplitsBy(df: DataFrame, byCol: Column,
      splits: Seq[(String, Double)], salt: Int = 0,
      splitCol: String = "split"): DataFrame = {
    require(!df.columns.contains(splitCol),
      s"input already has a '$splitCol' column; pass splitCol = <other name>")
    val quantized = splits.map { case (name, f) => name -> (f * 1000.0).toLong }
    require(quantized.map(_._2).sum == 1000L,
      s"split fractions must sum to 1.0 after 1/1000th quantization: $quantized")
    val bucket = hashBucket(byCol, salt)
    // CASE ladder front-to-back over cumulative thresholds
    val thresholds = quantized.scanLeft(0L)(_ + _._2).tail
    val expr = quantized.zip(thresholds).tail
      .foldLeft(when(bucket < thresholds.head, lit(quantized.head._1))) {
        case (acc, ((name, _), cum)) => acc.when(bucket < cum, lit(name))
      }
    df.withColumn(splitCol, expr)
  }

  /** LEAKAGE-SAFE stratified split: the split decision hashes the
    * row's dedup-GROUP representative, not the row key, so every
    * member of a near-duplicate group lands in the same split — the
    * guard against train/test contamination through near-duplicates
    * (the reason dedup-groups exist in a training-data pipeline).
    * `groups(groupKeyCol, groupIdCol)` is a key → group-representative
    * map (e.g. `Dedup.dedupGroups` output); keys absent from it form
    * their own singleton group (coalesce to the row key), so a partial
    * group table degrades safely instead of dropping rows.
    *
    * Scale shape: one co-partitioned equi-join on the row key (the
    * group map is corpus-sized — never broadcast) followed by the
    * map-only CASE ladder; with both sides bucketed by the key the
    * join is shuffle-free.
    */
  def splitByGroup(df: DataFrame, keyCol: String, groups: DataFrame,
      groupKeyCol: String, groupIdCol: String,
      splits: Seq[(String, Double)], salt: Int = 0,
      splitCol: String = "split"): DataFrame = {
    require(!df.columns.contains(groupIdCol),
      s"input already has a '$groupIdCol' column; alias the group table")
    val g = groups.select(col(groupKeyCol).as(keyCol), col(groupIdCol))
    val joined = df.join(g, Seq(keyCol), "left")
      .withColumn(groupIdCol, coalesce(col(groupIdCol), col(keyCol)))
    assignSplitsBy(joined, col(groupIdCol), splits, salt, splitCol)
  }

  /** Uniform per-group downsampling: keep `n` rows of each group chosen
    * by salted-hash order (not by a quality column — the unbiased-mixing
    * counterpart of [[capPerGroup]]). Deterministic for a (key, salt);
    * the rank filter plans a map-side partial WindowGroupLimit, so hot
    * groups do not sort their full contents on one reducer.
    */
  def samplePerGroup(df: DataFrame, keyCol: String, groupCols: Seq[String],
      n: Int, salt: Int = 0, rankCol: String = "rank"): DataFrame = {
    require(!df.columns.contains(rankCol),
      s"input already has a '$rankCol' column; pass rankCol = <other name>")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hashBucket(col(keyCol), salt), col(keyCol))
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .where(col(rankCol) <= n)
  }

  /** Per-group quota: keep the top `n` rows of each group under
    * (orderCol DESC, tieCol ASC) — e.g. the 20 highest-quality documents
    * per source. Returns the input columns plus the 1-based `rankCol`;
    * fails fast if the input already carries a column of that name
    * (silently overwriting a caller's quality column would be data
    * loss), so pass a different `rankCol` in that case.
    */
  /** Mixture PLANNING: per group, the sampling rate that hits a target
    * token mixture under a total budget — the arithmetic a pipeline
    * runs BEFORE sampling ("to make en 50% of a 500k-token mix at this
    * corpus's masses, sample en at rate r"). For each group with
    * target share s‰: target = budget·s div 1000, rate_s =
    * min(1e6, target·1e6 div mass) (a group short of its target is
    * taken whole — the planner reports the shortfall via
    * expected_tokens = mass·rate_s div 1e6, not by inventing data).
    * Groups without a target plan rate 0. All integer floor
    * arithmetic; one partial-aggregated groupBy, |groups|-bounded
    * output. Feed rate_s/1e6 to the hash sampler per group to execute
    * the plan deterministically.
    */
  def mixturePlan(df: DataFrame, groupCol: String, tokenCountCol: Column,
      targetsPerMille: Seq[(String, Long)], budgetTokens: Long): DataFrame = {
    require(targetsPerMille.nonEmpty, "need at least one target share")
    require(targetsPerMille.forall(_._2 >= 0), "shares must be nonnegative")
    require(targetsPerMille.map(_._2).sum <= 1000L,
      "target shares exceed 1000 per mille")
    require(budgetTokens >= 0, "budget must be nonnegative")
    val share = targetsPerMille.foldLeft(lit(0L)) { case (acc, (g, s)) =>
      when(col(groupCol) === g, lit(s)).otherwise(acc)
    }
    df.groupBy(col(groupCol))
      .agg(sum(tokenCountCol.cast("long")).as("mass"))
      .withColumn("target_tokens",
        graft.ml.Training.floorDivP(share * budgetTokens, lit(1000L)))
      .withColumn("rate_s",
        when(col("mass") <= 0L, lit(0L))
          .otherwise(least(lit(1000000L),
            graft.ml.Training.floorDivP(col("target_tokens") * lit(1000000L),
              col("mass")))))
      .withColumn("expected_tokens",
        graft.ml.Training.floorDivP(col("mass") * col("rate_s"), lit(1000000L)))
  }

  def capPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tieCol: String, n: Int, rankCol: String = "rank"): DataFrame = {
    require(!df.columns.contains(rankCol),
      s"input already has a '$rankCol' column; pass rankCol = <other name>")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieCol))
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .where(col(rankCol) <= n)
  }

  /** Full-range salted key hash in [0, P): the pre-bucket value behind
    * [[hashBucket]], for uses that need more than 1000 distinct values
    * (shard assignment, shuffle ordering). Same non-negative-key
    * contract as [[hashBucket]].
    */
  def saltedKeyHash(key: Column, salt: Int): Column =
    ((key % P) * lit(TextAnalysis.hashA(salt)) + lit(TextAnalysis.hashB(salt))) % P

  /** Deterministic corpus shuffle for training export: every row gets a
    * pseudo-random but reproducible (shard, pos) — shard = salted key
    * hash mod nShards, pos = rank of the hash within its shard. The
    * standard pre-training step "globally shuffle the corpus, then
    * write N shards the loader reads sequentially", WITHOUT
    * `orderBy(rand())`'s partitioning/run dependence: the same (key,
    * salt, nShards) always produces the same placement, on any cluster,
    * so an export can be re-run, resumed or audited byte-for-byte.
    * Changing `salt` draws an independent permutation per epoch.
    *
    * Scale shape: one hash shuffle on shard plus a per-shard sort —
    * exactly the job the sharded write performs anyway (pos IS the
    * within-file row order; write with
    * repartition(shard) + sortWithinPartitions(pos)). Pick nShards ≈
    * corpus_bytes / target_file_size (~100k 1 GB shards at 100 TB) so a
    * shard is one output file and the per-shard window sorts one file's
    * rows, never a hot partition.
    */
  def shuffleToShards(df: DataFrame, keyCol: String, nShards: Int,
      salt: Int = 0): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // same guard as capPerGroup's rankCol: silently overwriting an
    // existing shard/pos column would corrupt caller data
    Seq("shard", "pos", "_h").foreach { c =>
      require(!df.columns.contains(c), s"input already has a '$c' column")
    }
    val withH = df.withColumn("_h", saltedKeyHash(col(keyCol), salt))
      .withColumn("shard", (col("_h") % nShards).cast("long"))
    // hash ties are broken by the key, so pos is total and reproducible
    val w = Window.partitionBy("shard").orderBy(col("_h"), col(keyCol))
    withH.withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("_h")
  }

  /** Per-epoch deterministic dataloader ordering: every (row, epoch)
    * pair gets a sort key from the double-hash ladder
    * ([[graft.sketch.Sketches.slot]] with the EPOCH as the probe
    * index), so each training epoch sees an independent pseudo-random
    * permutation of the corpus derived purely from (id, epoch) — no
    * materialized index, no driver-side shuffle state, bit-reproducible
    * across reruns and cluster layouts. Workers read their `shard`
    * (hash of the sort key) and sort locally by (sort_key, id); the
    * tie column makes the order total.
    *
    * This is the 100 TB answer to "shuffle the dataset each epoch":
    * a global sort per epoch is a full-corpus exchange ×epochs, while
    * this is a map-only key assignment composed with the same
    * range/shard write the export path already does once.
    */
  def epochOrder(df: DataFrame, idCol: String, epochs: Int,
      nShards: Int): DataFrame = {
    require(epochs >= 1 && nShards >= 1, "epochs and nShards must be >= 1")
    df.withColumn("epoch", explode(sequence(lit(0L), lit(epochs - 1L))))
      .withColumn("sort_key",
        graft.sketch.Sketches.slot(col(idCol).cast("long"), col("epoch"),
          2147483647L))
      .withColumn("shard", pmod(col("sort_key"), lit(nShards.toLong)))
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much more its hashed-unigram profile looks like a TARGET
    * corpus slice than like the raw corpus. Features are rolling token
    * hashes folded into `buckets` hash buckets; each bucket gets a
    * Laplace-smoothed probability under the target and raw token
    * distributions, and a document's weight is the token-frequency-
    * weighted sum of per-bucket probability ratios.
    *
    * Determinism contract (the engine-exactness adaptation, like the
    * fixed-k dedup-groups contract): the canonical DSIR weight is a sum
    * of log-likelihood ratios, but `ln` is not IEEE correctly-rounded
    * and differs across engines in the last ulp — so the per-bucket
    * statistic here is the smoothed probability RATIO in fixed point,
    *   ratio_fp(b) = floor(scale · ((c_t+1)·(N_r+B)) / ((c_r+1)·(N_t+B)))
    * with every factor cast to double BEFORE multiplying (each count is
    * exactly representable below 2^53 and *, / are exactly rounded, so
    * the identical expression tree is bit-exact in any engine), and the
    * document weight Σ tf_b · ratio_fp(b) is an exact integer sum. A
    * monotone per-bucket surrogate of the log ratio — same ordering of
    * buckets, oracle-checkable end-to-end.
    *
    * Scale shape: explode shares the exchange-barriered token-hash
    * scan; bucket stats are one partial-agged groupBy of ≤`buckets`
    * rows; corpus totals attach via a 1-row broadcast (the
    * [[sampleTemperature]] shape); the ratio table broadcasts back onto
    * per-(doc, bucket) term frequencies. Shuffle keys are (doc_id,
    * bucket) longs — token strings never shuffle.
    *
    * Output: (doc_id, n_tokens, importance_fp); higher = more
    * target-like. Divide by n_tokens for a length-normalized score
    * ([[selectByImportance]] does).
    */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      buckets: Int = 256, scale: Double = 1000000.0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val tht = docs.select(col("doc_id"), isTarget.as("_is_target"),
        transform(TextAnalysis.tokens(col("text")),
          t => TextAnalysis.rollingHash(t)).as("th"))
      .repartition(col("doc_id"))
    val tok = tht.select(col("doc_id"), col("_is_target"),
        explode(col("th")).as("_h"))
      .withColumn("_b", col("_h") % buckets.toLong).drop("_h")
    val bucketStats = tok.groupBy("_b").agg(
      count(lit(1)).as("c_r"),
      count_if(col("_is_target")).as("c_t"))
    val totals = bucketStats.agg(sum("c_r").as("n_r"), sum("c_t").as("n_t"))
    val b = lit(buckets.toLong)
    val ratios = bucketStats.join(broadcast(totals))
      .select(col("_b"),
        floor(lit(scale) *
            ((col("c_t") + 1L).cast("double") * (col("n_r") + b).cast("double")) /
            ((col("c_r") + 1L).cast("double") * (col("n_t") + b).cast("double")))
          .cast("long").as("_ratio_fp"))
    tok.groupBy(col("doc_id"), col("_b")).agg(count(lit(1)).as("_tf"))
      .join(broadcast(ratios), Seq("_b"))
      .groupBy("doc_id")
      .agg(sum(col("_tf")).as("n_tokens"),
        sum(col("_tf") * col("_ratio_fp")).as("importance_fp"))
  }

  /** Importance selection: the top `k` documents by length-normalized
    * importance ([[importanceWeights]] per token, floor-divided so the
    * score stays an exact long), ties broken by doc_id. Plans as
    * TakeOrderedAndProject — per-partition top-k then a k-row driver
    * merge, no global sort, no single hot reducer.
    */
  def selectByImportance(docs: DataFrame, isTarget: Column, k: Int,
      buckets: Int = 256, scale: Double = 1000000.0): DataFrame =
    importanceWeights(docs, isTarget, buckets, scale)
      .withColumn("score_per_token",
        floor(col("importance_fp") / col("n_tokens")).cast("long"))
      .orderBy(col("score_per_token").desc, col("doc_id"))
      .limit(k)

  /** Incremental shard assignment — the daily-drop face of
    * [[shuffleToShards]] (the placement member of the incremental
    * family next to `Dedup.exactIncremental` and
    * `Ids.extendDictionary`): rows already exported NEVER move — their
    * (shard, pos) is on disk — and the new batch appends after each
    * shard's high-water mark. `shardCounts(shard, n_rows)` is the
    * persisted per-shard manifest of everything already placed (the
    * export pipeline's manifest carries exactly this); only the counts
    * load, never the placed rows. The hash is salt-stable, so a key's
    * shard never changes across drops; pos continues at
    * n_rows + rank-within-batch. The manifest is nShards rows —
    * always broadcast.
    */
  def shuffleToShardsIncremental(df: DataFrame, shardCounts: DataFrame,
      keyCol: String, nShards: Int, salt: Int = 0): DataFrame =
    shuffleToShards(df, keyCol, nShards, salt)
      .join(broadcast(shardCounts.select(col("shard"), col("n_rows"))),
        Seq("shard"), "left")
      .withColumn("pos", col("pos") + coalesce(col("n_rows"), lit(0L)))
      .drop("n_rows")

  /** Neyman-optimal stratified sample allocation — "given a labeling /
    * inspection budget, how many rows from each stratum": minimum-
    * variance allocation puts budget where strata are BIG and NOISY,
    *   n_h ∝ N_h·S_h,
    * and the integer form is exact up to one final floor: the weight
    *   w_h = floor(√(N_h·Σx² − (Σx)²))
    * IS N_h·S_h up to the floor (population variance cross-multiplied
    * by N_h² under the root), so no per-stratum mean or stddev double
    * ever materializes. Allocations floor-divide against the weight
    * total and clamp to the stratum size (a stratum can't give more
    * rows than it has — the mixturePlan clamp); the unallocated floor
    * remainder is reported, never silently redistributed.
    *
    * Sufficient statistics accumulate as DECIMAL(38,0) (the
    * correlationMatrix convention — long sums of squares overflow
    * first); the one √ is IEEE-exact on both engines for the same
    * decimal→double input, the corr-face contract.
    *
    * Scale shape: ONE partial-aggregated groupBy on the stratum key +
    * a 1-row weight-total broadcast. Constant-variance strata weight by
    * pure size; zero-variance strata draw nothing (S_h = 0 — Neyman's
    * actual optimum: a constant stratum needs one row, which the
    * caller's minimum, not the allocator, should enforce).
    *
    * @return (group, n_rows, w, alloc) — w = floor(N_h·S_h)
    */
  def neymanAllocation(df: DataFrame, groupCol: String, valueCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val v = col(valueCol).cast("long")
    val per = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(v.cast("decimal(38,0)")).as("sx"),
        sum((v * v).cast("decimal(38,0)")).as("sxx"))
      .select(col(groupCol), col("n_rows"),
        floor(sqrt((col("n_rows").cast("decimal(38,0)") * col("sxx") -
          col("sx") * col("sx")).cast("double"))).cast("long").as("w"))
    val tot = per.agg(sum(col("w")).as("tw"))
    per.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_rows"), col("w"),
        when(col("tw") > 0,
          least(col("n_rows"), expr(s"($budget * w) div tw")))
          .otherwise(0L).as("alloc"))
  }

  /** Poisson(1) CDF ×1e5, the bootstrap weight ladder — ONE Scala value
    * feeds the operator's CASE ladder and the oracle's. Buckets past
    * the last threshold weight 7 (cumulative mass 0.999992).
    */
  val poissonCdf100k: Seq[Long] =
    Seq(36788L, 73576L, 91970L, 98101L, 99634L, 99941L, 99992L)

  private def poissonWeight(h: Column): Column =
    poissonCdf100k.zipWithIndex
      .foldRight(lit(poissonCdf100k.size.toLong)) { case ((thr, i), rest) =>
        when(h < thr, i.toLong).otherwise(rest)
      }

  /** Poisson-bootstrap confidence interval for a column mean — the
    * uncertainty companion to the point profiler ("the mean moved 2%;
    * is that noise?"): `b` deterministic resamples, each row entering
    * resample i with weight ~ Poisson(1) drawn from the salted key
    * hash (the online-bootstrap trick: with-replacement resampling
    * without a global shuffle or any randomness source — every engine
    * and every partitioning reproduces the same resamples), then the
    * 2.5%/97.5% order statistics of the `b` resample means.
    *
    * Exact arithmetic: weights are integer CASE-ladder lookups against
    * the Poisson(1) CDF in 1e-5 buckets, resample means are pmod-
    * subtract floor divisions ×100, and the interval is a rank
    * selection over the `b` means (value at rank — tie-order
    * independent). Resamples that draw no rows (probability e^{-n}·b —
    * toy inputs only) are dropped and the rank indexes derive from the
    * surviving count.
    *
    * Scale shape: one map-only ×`b` explode (b is a constant ~40) +
    * one b-keyed partial-agged groupBy; the rank window runs over the
    * `b`-row mean table. The corpus never sorts, never self-joins.
    *
    * @return one row (n_rows, mean_x100, ci_lo_x100, ci_hi_x100,
    *         n_resamples)
    */
  def bootstrapMeanCi(df: DataFrame, keyCol: String, valueCol: String,
      b: Int = 40, salt: Int = 101): DataFrame = {
    require(b >= 4, s"need at least 4 resamples, got $b")
    val reps = array((0 until b).map { i =>
      struct(lit(i.toLong).as("rep"),
        lit(TextAnalysis.hashA(salt + i)).as("ha"),
        lit(TextAnalysis.hashB(salt + i)).as("hb"))
    }: _*)
    // mid-square mixing (the textFeat hash pattern) is load-bearing:
    // the bare linear ((k·a+b) mod P) mod 1e5 steps by (a mod 1e5) on
    // CONSECUTIVE keys, so a run of sequential ids can sit entirely
    // inside the weight-0 band and silently empty a resample (found by
    // the constant-column spec at n=200); squaring breaks the
    // linearity. h0 < P ≈ 1e9 keeps h0² inside a long
    val weighted = df
      .select(col(keyCol).as("k"), col(valueCol).cast("long").as("v"))
      .select(col("k"), col("v"), explode(reps).as("r"))
      .select(col("r.rep").as("rep"), col("v"),
        (((col("k") % P) * col("r.ha") + col("r.hb")) % P).as("h0"))
      .select(col("rep"), col("v"),
        poissonWeight((col("h0") * col("h0")) % P % 100000L).as("w"))
    val means = weighted.groupBy("rep")
      .agg(sum(col("w") * col("v")).as("sv"), sum(col("w")).as("sw"))
      .where(col("sw") > 0)
      .select(col("rep"),
        expr("(sv * 100 - pmod(sv * 100, sw)) div sw").as("m"))
    val ranked = means.select(col("m"),
      row_number().over(Window.orderBy(col("m"), col("rep"))).as("rn"),
      count(lit(1)).over(Window.partitionBy()).as("cnt"))
    val lo = ranked.where(col("rn") === expr("cnt * 25 div 1000 + 1"))
      .select(col("m").as("ci_lo_x100"), col("cnt").as("n_resamples"))
    val hi = ranked.where(col("rn") === expr("cnt - cnt * 25 div 1000"))
      .select(col("m").as("ci_hi_x100"))
    df.agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("long")).as("sx"))
      .select(col("n_rows"),
        expr("(sx * 100 - pmod(sx * 100, n_rows)) div n_rows").as("mean_x100"))
      .crossJoin(broadcast(lo))
      .crossJoin(broadcast(hi))
      .select(col("n_rows"), col("mean_x100"), col("ci_lo_x100"),
        col("ci_hi_x100"), col("n_resamples"))
  }
}
