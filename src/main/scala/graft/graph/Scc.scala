package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Strongly connected components of a DIRECTED edge list — the directed
  * dual of [[ConnectedComponents]]: mutual reachability, not shared
  * membership. The undirected CC label is wrong on directed data (a
  * one-way edge merges components it must not), and the reference family
  * has no directed primitive at all.
  *
  * Algorithm: iterative trim + forward-coloring + backward-membership
  * (Orzan's coloring algorithm — the standard distributed SCC, cf.
  * "A distributed algorithm for strongly connected components"
  * / GraphX's SCC), chosen over Tarjan (inherently sequential DFS) and
  * over the naive mutual-closure definition (O(n·m) transitive closure
  * is a non-starter at 100 TB; it survives only as the DuckDB oracle on
  * the test fixture):
  *
  *   1. **Trim to fixpoint**: a node with no in-edges or no out-edges
  *      in the active graph is on no cycle → its own singleton SCC,
  *      and its removal can expose more. The fixpoint drains entire
  *      acyclic regions at two aggregates per pass, so the expensive
  *      phases below only ever run on cyclic cores.
  *   2. **Color**: propagate the MAXIMUM node id forward to a fixpoint;
  *      color(v) = max id that reaches v. Color classes are closed
  *      under SCC membership (mutually-reachable nodes see the same
  *      ancestors), and each class contains exactly one PIVOT — the
  *      node that is its own color.
  *   3. **Membership**: the pivot's SCC is exactly the set of its
  *      class members that reach it BACKWARD through the class
  *      (forward reach is already implied by the color). Label them
  *      (relabelled to the class MINIMUM id — the CC label contract),
  *      remove them, repeat.
  *
  * Every labelled batch is final (an SCC is never split by removing a
  * different SCC), so the outer loop strictly shrinks the active graph;
  * each round peels at least every current pivot's component. Round
  * count is bounded by the condensation's pivot-peel depth — short on
  * real graphs (hub SCCs color most of the graph in one wave), O(path)
  * only on adversarial pure-path DAGs, which the trim rule eats from
  * both ends instead. Unlike CC, no star-contraction shortcut exists
  * for DIRECTED reachability (re-rooting a tree does not preserve edge
  * direction) — label propagation to a fixpoint is the honest primitive,
  * so the scale design is per-round cost: both propagation loops are
  * frontier-limited (only CHANGED labels relay — the shortestPaths
  * delta trick), the active edge set is persisted hash-partitioned on
  * the join key once per outer round (src for coloring, dst for the
  * backward sweep) so each inner round reshuffles only the frontier,
  * and all shuffled rows are (long, long) pairs.
  *
  * SCC labels are schedule-independent (mutual reachability is a
  * property of the graph, not the wave order), so the DuckDB
  * recursive-CTE closure twin re-derives them exactly and the driver
  * hash-checks this whole iterative machine.
  */
object Scc {

  /** (node, scc) for every endpoint of `edges` (`src` → `dst`);
    * scc = minimum member id, the CC label contract. Self-loop EDGES
    * carry no connectivity and are dropped, but their endpoints are
    * kept: a node appearing only in self-loops is its own singleton
    * SCC, not absent from the output (ADVICE r10 — the node set is
    * derived from the RAW edge list, before the self-loop filter).
    * Fails loudly if any propagation loop exceeds `maxRounds` rather
    * than returning a partial labelling.
    */
  def stronglyConnected(edges: DataFrame, maxRounds: Int = 60): DataFrame = {
    val raw = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    var active = raw
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)
    var remaining = raw.select(col("src").as("node"))
      .unionAll(raw.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    // r13 round economy: the remaining-set size is TRACKED arithmetically
    // (every batch that leaves it is counted anyway), so the loop guards
    // cost no isEmpty probe jobs; labelled batches are DEFERRED to one
    // final union instead of an eager checkpointed merge per batch; and
    // every in-loop merge/update takes a LAZY checkpoint that the next
    // pass's gating count materializes (the coloring-loop fusion,
    // applied everywhere).
    var remainingCount = remaining.count()
    val batches = scala.collection.mutable.ListBuffer[DataFrame]()
    // typed empty seed so an edge-free input returns an empty (node, scc)
    // frame instead of null
    val emptyLabels: DataFrame = remaining
      .select(col("node"), col("node").as("scc")).limit(0)
    var outer = 0
    while (remainingCount > 0) {
      outer += 1
      require(outer <= maxRounds,
        s"stronglyConnected did not drain within $maxRounds peel rounds; raise maxRounds")

      // ---- trim TO FIXPOINT: a node with no in-edge or no out-edge
      // (or no edge at all) is on no cycle → singleton SCC, and its
      // removal can expose more. Draining the whole DAG fringe here,
      // pass by 2-job pass, is what keeps the EXPENSIVE phases off
      // acyclic regions: without the fixpoint, a depth-L inter-SCC
      // chain erodes one layer per OUTER round and pays a full
      // coloring + membership sweep of the surviving graph each time
      // (measured 2× on the sf0.1 fixture). Pass count is bounded by
      // the remaining graph's trim depth — same loud cap.
      var trimming = true
      var trimPass = 0
      while (trimming && remainingCount > 0) {
        trimPass += 1
        require(trimPass <= maxRounds,
          s"stronglyConnected trim still eroding after $maxRounds passes; raise maxRounds")
        // STRIDE-2 erosion (r13): the trim step is a deterministic
        // downward closure (drop nodes lacking an in- or out-edge in the
        // induced subgraph), so applying it TWICE inside one scheduled
        // pass reaches the same fixpoint in half the driver rounds; the
        // union of trimmed batches — all labelled (node, node) — is
        // identical however the erosion is batched.
        def erode(act: DataFrame): DataFrame = {
          val hasOut = act.select(col("src").as("node")).distinct()
          val hasIn = act.select(col("dst").as("node")).distinct()
          hasOut.join(hasIn, Seq("node"))
        }
        val core1 = erode(active)
        val act1 = active
          .join(core1.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(core1.select(col("node").as("dst")), Seq("dst"), "left_semi")
        val core = erode(act1).localCheckpoint(false)
        // 1-job pass: the trimmed count materializes core AND trimmed
        // (core rides inside trimmed's plan); the labelled batch joins
        // the deferred union, the remaining size updates by arithmetic,
        // and the active-set shrink is lazy until the next pass reads it
        val trimmed = remaining.join(core, Seq("node"), "left_anti")
          .select(col("node"), col("node").as("scc"))
          .localCheckpoint(false)
        val nTrimmed = trimmed.count()
        if (nTrimmed == 0) trimming = false
        else {
          batches += trimmed
          remaining = core
          remainingCount -= nTrimmed
          active = active
            .join(core.select(col("node").as("src")), Seq("src"), "left_semi")
            .join(core.select(col("node").as("dst")), Seq("dst"), "left_semi")
            .localCheckpoint(false)
        }
      }
      if (remainingCount > 0) {
        // the fully-trimmed edge set, cached once per outer round in
        // BOTH join layouts (coloring joins on src, the backward sweep
        // on dst) so every inner round moves only its frontier — the
        // hopDistance cache pattern, twice. The partition count is
        // sized to the surviving data (≈20k edge rows per partition,
        // capped at the session default): AQE coalesces SHUFFLE stages
        // but not CACHED sides, and a 3k-edge cyclic core spread over
        // 32 cached partitions prices every one of the ~20 inner
        // rounds at full 32-task scheduling latency for kilobytes of
        // work — the dominant cost of this loop measured locally. At
        // cluster scale the cap restores full parallelism.
        val activeRows = active.count()
        val parts = math.max(1, math.min(
          active.sparkSession.sessionState.conf.numShufflePartitions,
          (activeRows / 20000L).toInt))
        val bySrc = active.repartition(parts, col("src"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val byDst = active.repartition(parts, col("dst"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          // ---- forward max-coloring to fixpoint (frontier-limited).
          // Round latency, not data volume, is the local cost of a
          // tiny-frontier loop (every joined side auto-broadcasts), so
          // each round is fused to TWO scheduled jobs: the improved
          // frontier takes a LAZY localCheckpoint whose first action is
          // the count that also decides convergence (one job,
          // truncated lineage), and the colors rebuild keeps its eager
          // checkpoint (it feeds two branches next round).
          var colors = remaining.select(col("node"), col("node").as("color"))
            .localCheckpoint(false)
          var frontier = colors
          var frontierRows = 1L
          var r = 0
          while (frontierRows > 0) {
            r += 1
            require(r <= maxRounds,
              s"stronglyConnected coloring still moving after $maxRounds rounds; raise maxRounds")
            // STRIDE-2 relaxation: max-propagation is monotone and
            // idempotent, so pushing the wave TWO hops per scheduled
            // round is always safe and halves the round count — and
            // round latency, not data volume, is what prices this loop
            // (a second tiny hash join in the same job is nearly free)
            val hop1 = frontier.join(bySrc, col("node") === col("src"))
              .groupBy(col("dst").as("node"))
              .agg(max(col("color")).as("color"))
            val hop2 = hop1.join(bySrc, col("node") === col("src"))
              .groupBy(col("dst").as("node"))
              .agg(max(col("color")).as("color"))
            val cand = hop1.unionAll(hop2)
              .groupBy(col("node").as("cnode"))
              .agg(max(col("color")).as("cand_color"))
            val improved = cand.join(colors, col("cnode") === col("node"))
              .where(col("cand_color") > col("color"))
              .select(col("cnode").as("node"), col("cand_color").as("color"))
              .localCheckpoint(false)
            frontierRows = improved.count()
            // lazy merge — materialized by the next round's gating
            // count (improved reads colors), one fewer job per round
            if (frontierRows > 0) {
              colors = colors.join(improved.select("node"), Seq("node"), "left_anti")
                .unionAll(improved)
                .localCheckpoint(false)
            }
            frontier = improved
          }

          // ---- backward membership sweep within each color class
          var members = colors.where(col("node") === col("color"))
            .select(col("node"), col("color"))
            .localCheckpoint(false)
          // one backward hop that KEEPS the class gate: a membership
          // path must stay inside its color class, so unlike the
          // coloring stride the gate re-applies at every hop
          def back(f: DataFrame): DataFrame = f
            .join(byDst, col("node") === col("dst"))
            .select(col("src").as("mnode"), col("color").as("mcolor"))
            .distinct()
            .join(colors.select(col("node").as("mnode"), col("color").as("own")),
              Seq("mnode"))
            .where(col("mcolor") === col("own"))
            .select(col("mnode").as("node"), col("mcolor").as("color"))
          var mfront = members
          var mfrontRows = 1L
          r = 0
          while (mfrontRows > 0) {
            r += 1
            require(r <= maxRounds,
              s"stronglyConnected membership still moving after $maxRounds rounds; raise maxRounds")
            // stride-2 + the 2-job round fusion, as in the coloring loop
            val s1 = back(mfront)
            val s2 = back(s1)
            val fresh = s1.unionAll(s2).distinct()
              .join(members, Seq("node"), "left_anti")
              .localCheckpoint(false)
            mfrontRows = fresh.count()
            // lazy merge — the next round's anti-join count reads it
            if (mfrontRows > 0)
              members = members.unionAll(fresh).localCheckpoint(false)
            mfront = fresh
          }

          // relabel each peeled class to its minimum member id; the
          // peel count is the round's ONE dedicated job — it
          // materializes the batch, keeps the remaining-size arithmetic
          // exact, and the remaining/active shrinks stay lazy until the
          // next outer round's trim count reads them
          val mins = members.groupBy(col("color"))
            .agg(min(col("node")).as("scc"))
          val peeled = members.join(mins, Seq("color"))
            .select(col("node"), col("scc"))
            .localCheckpoint(false)
          val nPeeled = peeled.count()
          batches += peeled
          remainingCount -= nPeeled
          remaining = remaining
            .join(peeled.select("node"), Seq("node"), "left_anti")
            .localCheckpoint(false)
          active = active
            .join(peeled.select(col("node").as("src")), Seq("src"), "left_anti")
            .join(peeled.select(col("node").as("dst")), Seq("dst"), "left_anti")
            .select("src", "dst")
            .localCheckpoint(false)
        } finally { bySrc.unpersist(); byDst.unpersist() }
      }
    }
    // one deferred union of every labelled batch (each one a cached
    // checkpoint) — identical rows to the old eager per-batch merge
    if (batches.isEmpty) emptyLabels
    else batches.reduce(_ unionAll _)
  }

  /** Incrementally absorb edges into an existing SCC labelling — the
    * daily-drop maintenance face of [[stronglyConnected]], mirroring
    * [[ConnectedComponents.addEdges]]'s contraction argument in the
    * directed world: every old SCC stays strongly connected when edges
    * are ADDED (edges never break mutual reachability), so collapsing
    * each to one vertex preserves the SCC structure of the union graph,
    * and running SCC on the contracted graph + expanding back equals
    * the from-scratch labelling.
    *
    * One directed-world difference is load-bearing: `edges` must be the
    * FULL edge set (old ∪ new), not just the batch. Directed
    * reachability is non-local — a new edge B→A closes a cycle through
    * the OLD path A→B, so old inter-SCC (condensation) edges must feed
    * the contracted run. The linear contraction pass touches every
    * edge, but the ITERATIVE machine then runs on the contracted graph
    * only — |condensation| + |batch| nodes, not |corpus| — which is
    * where the iteration rounds (the expensive part) are saved.
    *
    * The invariant that carries correctness: incoming labels are
    * component MINIMA (stronglyConnected's own contract), so the
    * contracted graph's minima are the union graph's minima.
    */
  def addEdges(labels: DataFrame, edges: DataFrame,
      maxRounds: Int = 60): DataFrame = {
    val l = labels.select(col("node").cast("long").as("node"),
      col("scc").cast("long").as("scc"))
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    val newNodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .join(l.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("scc"))
    val all = l.unionAll(newNodes).localCheckpoint()
    val contracted = e
      .join(all.select(col("node").as("src"), col("scc").as("src_c")), Seq("src"))
      .join(all.select(col("node").as("dst"), col("scc").as("dst_c")), Seq("dst"))
      .select(col("src_c").as("src"), col("dst_c").as("dst"))
      .where(col("src") =!= col("dst"))
    val rel = stronglyConnected(contracted, maxRounds)
      .select(col("node").as("scc"), col("scc").as("new_scc"))
    all.join(rel, Seq("scc"), "left")
      .select(col("node"), coalesce(col("new_scc"), col("scc")).as("scc"))
  }

  /** Condensation of the directed graph under an SCC labelling: one
    * node per SCC, one edge per ordered SCC pair with the witnessing
    * edge count — a DAG by the definition of SCC, and the input
    * contract of [[dagLongestPath]]. Two hash joins against the label
    * map plus one pair-keyed count; nothing iterative.
    */
  def condensation(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    val l = labels.select(col("node").cast("long").as("node"),
      col("scc").cast("long").as("scc"))
    e.join(l.select(col("node").as("src"), col("scc").as("src_scc")), Seq("src"))
      .join(l.select(col("node").as("dst"), col("scc").as("dst_scc")), Seq("dst"))
      .where(col("src_scc") =!= col("dst_scc"))
      .groupBy("src_scc", "dst_scc")
      .agg(count(lit(1)).as("n_edges"))
  }

  /** Path-count centrality of a DAG: for every node, the number of
    * source→node paths (f), node→sink paths (g), and source→sink paths
    * THROUGH the node (f·g) — the exact flow-betweenness analogue that
    * IS distributable, because path counting is a semiring the
    * level-synchronous iteration solves exactly (true shortest-path
    * betweenness needs Brandes' sequential dependency accumulation).
    * Run it on [[condensation]] output for "which components are the
    * load-bearing bridges of the dependency structure".
    *
    * Two frontier-limited sum-propagations (forward from sources,
    * backward from sinks): round r's frontier carries the count of
    * length-r paths — every path has one definite length, so summing
    * the per-round arrivals is exact and rounds = DAG depth. Counts
    * accumulate in DECIMAL(38,0): path counts grow like branching^depth,
    * and under ANSI mode a 38-digit overflow fails LOUDLY instead of
    * wrapping (the engine-vs-oracle silent-divergence hazard). On a
    * cyclic input the propagation never drains — the `maxRounds` cap is
    * the loud cycle detector, as in [[dagLongestPath]].
    *
    * @return (node, f_paths, g_paths, through_paths)
    */
  def dagPathCentrality(edges: DataFrame, maxRounds: Int = 60): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    val bySrc = e.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val byDst = e.repartition(col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node")))
        .distinct()
        .localCheckpoint()

      // one sum-propagation wave: seeds carry count 1; each round joins
      // the frontier to its outgoing edges and sums arrivals per target.
      // r13 round economy, three changes that leave every count exact:
      //  - STRIDE-2: round r's frontier carries the exact count of
      //    length-L paths, so relaying it one MORE hop inside the same
      //    scheduled round yields the exact length-(L+1) counts — two
      //    per-length deliveries per round, half the rounds. Both hops
      //    are per-length-exact, so summing them later is unchanged.
      //  - DEFERRED accumulation: no per-round acc rebuild (which paid
      //    an exchange + a checkpoint job per round) — every per-length
      //    frontier is retained (each one a cached checkpoint) and ONE
      //    final groupBy sums them; addition is associative, the total
      //    per node is identical.
      //  - the gating count materializes both hops' lazy checkpoints in
      //    one job (hop1 rides inside hop2's plan).
      def wave(seed: DataFrame, adj: DataFrame, from: String, to: String,
          what: String): DataFrame = {
        val perLength = scala.collection.mutable.ListBuffer[DataFrame](seed)
        var frontier = seed
        var frontierRows = 1L
        var r = 0
        def hop(f: DataFrame): DataFrame = f
          .join(adj, col("node") === col(from))
          .groupBy(col(to).as("nnode"))
          .agg(sum(col("cnt")).as("ncnt"))
          .select(col("nnode").as("node"), col("ncnt").as("cnt"))
        while (frontierRows > 0) {
          r += 1
          require(2 * r <= maxRounds + 1,
            s"dagPathCentrality $what wave still flowing after $maxRounds " +
              "hops — cyclic input or raise maxRounds")
          val h1 = hop(frontier).localCheckpoint(false)
          val h2 = hop(h1).localCheckpoint(false)
          // one gating count: h2's plan reads h1, so the count
          // materializes both checkpoints. h2 empty with h1 non-empty
          // just means length L+1 only reached sinks — h1 is already
          // retained; the loop may stop either way.
          frontierRows = h2.count()
          perLength += h1
          if (frontierRows > 0) perLength += h2
          frontier = h2
        }
        perLength.reduce(_ unionAll _)
          .groupBy("node").agg(sum(col("cnt")).as("cnt"))
      }

      // seed sets are checkpointed ONCE and reused by both the guard
      // and the waves (the eager pre-r13 shape computed each anti-join
      // twice: once for the isEmpty probe, once inside the wave)
      def seedOf(anti: String): DataFrame = nodes
        .join(e.select(col(anti).as("node")).distinct(), Seq("node"), "left_anti")
        .select(col("node"), lit(1).cast("decimal(38,0)").as("cnt"))
        .localCheckpoint(false)
      val sources = seedOf("dst")
      val sinks = seedOf("src")
      val (nSources, nSinks) = (sources.count(), sinks.count())
      // a non-empty DAG has ≥1 source and ≥1 sink; a sourceless input
      // (pure cycle) would otherwise return EMPTY silently — the
      // maxRounds trip only catches cycles reachable from a source
      // order matters: the happy path short-circuits on the counts and
      // never pays the isEmpty probe job
      require((nSources > 0 && nSinks > 0) || nodes.isEmpty,
        "dagPathCentrality: no source/sink node — cyclic input " +
          "(run stronglyConnected/condensation first)")
      // the two waves share no state — run them as concurrent job
      // groups (guide §2.6: independent DAGs back-fill each other's
      // round-latency stalls; same argument on a real cluster)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fF = Future(wave(sources, bySrc, "src", "dst", "forward"))
      val fG = Future(wave(sinks, byDst, "dst", "src", "backward"))
      val f = Await.result(fF, Duration.Inf)
      val g = Await.result(fG, Duration.Inf)
      // in a DAG every node descends from some source and reaches some
      // sink, so the inner join keeps every node
      val out = f.select(col("node"), col("cnt").as("f0"))
        .join(g.select(col("node"), col("cnt").as("g0")), Seq("node"))
        .select(col("node"),
          col("f0").cast("long").as("f_paths"),
          col("g0").cast("long").as("g_paths"),
          (col("f0") * col("g0")).cast("long").as("through_paths"))
      // loud coverage check (ADVICE r10): a cycle component DISCONNECTED
      // from every source and sink enters neither wave — the maxRounds
      // trip only sees source-reachable cycles — and the inner join
      // would silently drop its nodes. Full coverage or fail.
      require(nodes.join(out.select("node"), Seq("node"), "left_anti").isEmpty,
        "dagPathCentrality: nodes unreached by both waves — cyclic " +
          "component disconnected from all sources/sinks (run " +
          "stronglyConnected/condensation first)")
      out
    } finally { bySrc.unpersist(); byDst.unpersist() }
  }

  /** Reciprocity of a directed edge list: the fraction of edges whose
    * reverse is also present (×1e6, floor) — the one-number "how
    * two-way is this graph" profile (near 1e6 → effectively undirected,
    * CC is the right tool; near 0 → genuinely directional, SCC/DAG
    * analysis applies). One semi-join against the reversed edge set +
    * one global aggregate; the 1-row combine is a union of tagged
    * counters, not a crossJoin (keeps the graph-family broadcast lint
    * trivially clean).
    *
    * @return one row (n_edges, n_reciprocal, recip_ppm)
    */
  def reciprocity(edges: DataFrame): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    val recip = e.join(rev, Seq("src", "dst"), "left_semi")
    e.select(lit(1L).as("ne"), lit(0L).as("nr"))
      .unionAll(recip.select(lit(0L).as("ne"), lit(1L).as("nr")))
      .agg(coalesce(sum(col("ne")), lit(0L)).as("n_edges"),
        coalesce(sum(col("nr")), lit(0L)).as("n_reciprocal"))
      .select(col("n_edges"), col("n_reciprocal"),
        // DECIMAL numerator: n_reciprocal·1e6 wraps a silent long past
        // ~9.2e12 edges (the gini convention)
        when(col("n_edges") > 0,
          expr("cast((cast(n_reciprocal as decimal(38,0)) * 1000000) div n_edges as bigint)"))
          .otherwise(lit(null).cast("long")).as("recip_ppm"))
  }

  /** Longest-path depth of every node of a DAG (edge count from any
    * source): depth(v) = max over in-neighbours u of depth(u) + 1,
    * sources at 0 — the critical-path / topological-level primitive
    * (stage scheduling, dependency depth, curriculum ordering).
    *
    * Frontier-limited max-relaxation: only nodes whose depth GREW last
    * round relay, so rounds = DAG depth and a settled prefix costs
    * nothing. On a CYCLIC input the relaxation never settles — the
    * `maxRounds` cap is therefore also the loud cycle detector (the
    * longest path is undefined on a cycle; failing beats looping).
    * Depths are schedule-independent → recursive-CTE oracle-exact.
    */
  def dagLongestPath(edges: DataFrame, maxRounds: Int = 60): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var depth = e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node")))
        .distinct()
        .withColumn("depth", lit(0L))
        .localCheckpoint()
      var frontier = depth
      var frontierRows = 1L
      var r = 0
      while (frontierRows > 0) {
        r += 1
        require(r <= maxRounds,
          s"dagLongestPath still relaxing after $maxRounds rounds — " +
            "cyclic input or raise maxRounds (run stronglyConnected/condensation first)")
        // STRIDE-2 relaxation (r13, the coloring-loop trick): max-
        // relaxation is monotone and idempotent, so pushing the wave TWO
        // hops per scheduled round is always safe, halves the round
        // count, and converges to the same schedule-independent fixpoint
        // the recursive-CTE oracle derives. Round fusion: the improved
        // frontier takes a LAZY checkpoint whose first action is the
        // gating count, and the depth merge — exchange-free over two
        // cached sides — materializes inside the NEXT round's count.
        val hop1 = frontier.join(e, col("node") === col("src"))
          .groupBy(col("dst").as("cnode"))
          .agg(max(col("depth") + 1L).as("cand_depth"))
        val hop2 = hop1.join(e, col("cnode") === col("src"))
          .groupBy(col("dst").as("c2"))
          .agg(max(col("cand_depth") + 1L).as("d2"))
          .select(col("c2").as("cnode"), col("d2").as("cand_depth"))
        val cand = hop1.unionAll(hop2)
          .groupBy(col("cnode"))
          .agg(max(col("cand_depth")).as("cand_depth"))
        val improved = cand.join(depth, col("cnode") === col("node"))
          .where(col("cand_depth") > col("depth"))
          .select(col("cnode").as("node"), col("cand_depth").as("depth"))
          .localCheckpoint(false)
        frontierRows = improved.count()
        if (frontierRows > 0)
          depth = depth.join(improved.select("node"), Seq("node"), "left_anti")
            .unionAll(improved)
            .localCheckpoint(false)
        frontier = improved
      }
      depth
    } finally e.unpersist()
  }
}
