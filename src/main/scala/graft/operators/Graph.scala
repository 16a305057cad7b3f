package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over the trade graph the TPC-H-ish fixture
  * implies: an undirected customer⇄supplier edge for every (customer,
  * supplier) pair that ever traded (orders ⋈ lineitem, distinct pairs,
  * both directions materialized so the random walk is symmetric). Node
  * ids disambiguate the two populations arithmetically
  * (`c_custkey·2` / `s_suppkey·2+1`) — no strings on any shuffle.
  *
  * Everything is fixed-iteration and ALL-INTEGER (ranks in integer
  * "nano-mass" units, truncating division), so results are bit-equal to
  * the DuckDB oracle's unrolled-CTE twin regardless of partitioning,
  * summation order, or engine — the same money-in-cents discipline the
  * relational family uses, applied to iterative state.
  *
  * Scale notes (100 TB thinking):
  *   - the edge table (src, dst, outdeg) is built ONCE, hash-partitioned
  *     on `src`, and persisted; every iteration reuses that layout so the
  *     per-iteration cost is one shuffle of the (node, rank) pairs to the
  *     edge partitioning plus one aggregation exchange on `dst` — the
  *     classic two-exchange Pregel superstep, rows never wider than
  *     24 bytes
  *   - iteration count is a bounded parameter; lineage is truncated with
  *     a localCheckpoint every `checkpointEvery` supersteps so the plan
  *     does not deepen linearly with iterations (the classic iterative-
  *     Spark OOM trap)
  *   - rank SCALE must satisfy `N · SCALE · dampPct < 2^63`: the default
  *     1e9 is safe to ~10^8 nodes; callers at larger N pass a smaller
  *     scale (documented, asserted nowhere at runtime — the overflow
  *     would need a single node absorbing the whole graph's mass)
  *   - truncating division leaks ≤ outdeg−1 nano-units per node per
  *     superstep ("dropped mass" semantics, identical in the oracle);
  *     dangling nodes cannot exist here because edges are symmetric
  */
object Graph {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Rank scale: the uniform vector is `SCALE` per node. */
  val Scale = 1000000000L

  /** Symmetric trade edges with out-degree, one row per directed edge:
    * (src, dst, outdeg). Distinct pairs only — edge weight is ignored by
    * design (the oracle does the same).
    */
  def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    val (pairs, edges) = tradeEdgesFrom(spark, dir, col("l_suppkey") * 2 + 1)
    Dedup.materializeAndRelease(Seq(pairs), edges)
  }

  /** [[tradeEdges]] generalized over the supplier-node expression — the
    * seam the hub-skew twin uses to collapse suppliers into super-nodes.
    *
    * Returns (the CACHED distinct pair table, the edge frame built on it);
    * the caller unpersists the pair cache once edges are materialized.
    * Caching matters (r17 opt, measured in the pageRank SQL tab): `pairs`
    * is referenced four times in the edge plan (both union branches, then
    * both again under the degree aggregate), and Spark does not dedupe
    * common subtrees — uncached, the orders ⋈ lineitem → distinct build
    * (the most expensive stage of every graph query) executed TWICE per
    * edge materialization even with exchange reuse.
    */
  private[graft] def tradeEdgesFrom(spark: SparkSession, dir: String,
      snode: org.apache.spark.sql.Column,
      // plan-inspection seam (ADVICE r17, the marginIvfCandidates pattern):
      // PlanGrab dumps the edge plan without paying the orders ⋈ lineitem
      // materialization the eager fill would run
      fillCache: Boolean = true): (DataFrame, DataFrame) = {
    // dedupe (order, supplier) BEFORE the join: the distinct shuffles on
    // l_orderkey — the join key the rows need anyway — and shrinks the
    // join output ~4x (multi-lineitem orders) ahead of the wide pair
    // distinct; at fact-table scale this is the difference between
    // shuffling lineitem once and shuffling the joined pairs too
    val pairs = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
      .join(t(spark, dir, "lineitem").select("l_orderkey", "l_suppkey").distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("cnode"), snode.as("snode"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (fillCache) pairs.count() // eager fill — four consumers below (cache-before-AQE rule)
    val directed = pairs.select(col("cnode").as("src"), col("snode").as("dst"))
      .unionAll(pairs.select(col("snode").as("src"), col("cnode").as("dst")))
    val deg = directed.groupBy("src").agg(count(lit(1)).as("outdeg"))
    (pairs, directed.join(deg, "src"))
  }

  /** All graph nodes (isolated customers/suppliers included — they keep
    * the base rank, identically in the oracle). */
  def tradeNodes(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select((col("c_custkey") * 2).as("node"))
      .unionAll(t(spark, dir, "supplier")
        .select((col("s_suppkey") * 2 + 1).as("node")))

  /** Fixed-iteration integer PageRank:
    * `pr' = SCALE·(100−dampPct)/100 + dampPct · Σ_in (pr div outdeg) div 100`.
    */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 5,
      dampPct: Long = 85, scale: Long = Scale,
      checkpointEvery: Int = 4): DataFrame = {
    val (pairs, edges) = tradeEdgesFrom(spark, dir, col("l_suppkey") * 2 + 1)
    pageRankCore(spark, edges, tradeNodes(spark, dir),
      iters, dampPct, scale, checkpointEvery, extraCaches = Seq(pairs))
  }

  /** Hub-heavy degree-skew twin of [[pageRank]]: the identical integer
    * recurrence over the trade graph with the supplier side COLLAPSED to
    * `l_suppkey % hubMod` — `hubMod` supplier super-nodes absorb EVERY
    * customer edge, so the max degree is ~(suppliers/hubMod)× the natural
    * fixture's. A green oracle row proves the superstep survives hot keys:
    * the neighbor sum is a partial-aggregating `groupBy` (map-side combine
    * shrinks the hub's contribution stream before the exchange), never a
    * window or a collected neighbor list, so a 10^6-degree hub costs one
    * combiner cell per upstream partition — the property that matters when
    * a real 100 TB graph has power-law hubs.
    */
  def pageRankHubSkew(spark: SparkSession, dir: String, iters: Int = 5,
      hubMod: Long = 8, dampPct: Long = 85, scale: Long = Scale,
      checkpointEvery: Int = 4): DataFrame = {
    require(hubMod >= 1, s"hubMod must be >= 1, got $hubMod")
    val (pairs, edges) = tradeEdgesFrom(spark, dir, (col("l_suppkey") % hubMod) * 2 + 1)
    val nodes = t(spark, dir, "customer").select((col("c_custkey") * 2).as("node"))
      .unionAll(t(spark, dir, "supplier")
        .select(((col("s_suppkey") % hubMod) * 2 + 1).as("node")).distinct())
    pageRankCore(spark, edges, nodes, iters, dampPct, scale, checkpointEvery,
      extraCaches = Seq(pairs))
  }

  /** Node count under which the per-superstep (node, state) vector is
    * BROADCAST and the edge cache is partitioned by `dst` so the superstep
    * aggregate needs NO exchange (r18 opt, guide §2.4/§3.1): a 2^20-node
    * vector of two longs hashes to ~50 MB — comfortably broadcastable —
    * while past the gate the cores fall back to the classic shuffle-join
    * superstep (edges partitioned by `src`, ranks exchanged), which is the
    * correct regime when the rank vector itself is cluster-sized. The gate
    * reads the RUNTIME node count (already measured for the overflow
    * check), so the choice is data-adaptive, not a local[32] constant.
    */
  val BroadcastableNodes: Long = 1L << 20

  /** The broadcast-regime loop support shared by [[pageRankCore]] and
    * [[componentsCore]] (r18): the dst-partitioned edge cache, the
    * connected (= src) node set, and the isolated remainder. REQUIRES
    * symmetric edges (src-set == dst-set) — both builders materialize every
    * undirected pair in both directions, so a node has in-edges iff it has
    * out-edges; isolated nodes can then leave the superstep loop entirely
    * (their state is constant) and re-attach once at the end, which is
    * what lets the loop run without the per-superstep zero-row union that
    * destroyed the aggregate's partitioning.
    */
  private def broadcastRegimeEdges(spark: SparkSession, edges0: DataFrame,
      nodes: DataFrame, shuffleN: Int): (DataFrame, DataFrame, DataFrame) = {
    val edges = edges0
      .repartition(shuffleN, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the distinct's scan fills the edge cache as a side effect
    val connected = edges.select(col("src").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    connected.count()
    val isolated = nodes.join(connected, Seq("node"), "left_anti")
      .localCheckpoint(true)
    (edges, connected, isolated)
  }

  private def pageRankCore(spark: SparkSession, edges0: DataFrame, nodes0: DataFrame,
      iters: Int, dampPct: Long, scale: Long, checkpointEvery: Int,
      extraCaches: Seq[DataFrame] = Nil): DataFrame = {
    require(dampPct >= 1 && dampPct <= 100, s"dampPct must be in [1, 100], got $dampPct")
    val shuffleN = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val nodes = nodes0.persist(StorageLevel.MEMORY_AND_DISK)
    // Overflow precondition, asserted at RUNTIME on the actual node count
    // (the count also warms the persisted node set): a node's inbound sum
    // is bounded by the total mass N·scale, which the damping step then
    // multiplies by dampPct before the div — so N·scale·dampPct must fit
    // in a Long. The default scale is safe to ~10^8 nodes; beyond that
    // this fails loudly instead of wrapping silently.
    val nNodes = nodes.count()
    require(nNodes == 0 || scale <= Long.MaxValue / nNodes / dampPct,
      s"integer PageRank overflow: $nNodes nodes × scale=$scale × dampPct=$dampPct " +
        "exceeds 2^63 — pass a smaller scale")
    val base = scale * (100L - dampPct) / 100L
    if (nNodes <= BroadcastableNodes) {
      // BROADCAST REGIME (r18 opt, measured 1.2-1.4× on the probe and
      // bit-identical by checksum): the rank vector rides a broadcast into
      // the dst-partitioned edge cache, so the superstep aggregate's
      // ENSURE_REQUIREMENTS is already satisfied by the cache layout — the
      // whole superstep is ONE map stage, zero exchanges (was: one
      // exchange of ~375k partial-sum rows per superstep at sf0.1 plus the
      // zero-contribution union). Isolated nodes sit at the base rank from
      // superstep 1 on (no in-edges ⇒ pr = base + damp·0), so they join
      // once at the end instead of riding every superstep.
      val (edges, connected, isolated) =
        broadcastRegimeEdges(spark, edges0, nodes, shuffleN)
      var ranks = connected.withColumn("pr", lit(scale))
      for (i <- 1 to iters) {
        val contrib = broadcast(ranks)
          .join(edges, ranks("node") === edges("src"))
          .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        ranks = contrib.groupBy("node")
          .agg((lit(base) + expr(s"($dampPct * sum(c)) div 100")).as("pr"))
        if (i % checkpointEvery == 0 && i < iters)
          ranks = ranks.localCheckpoint()
      }
      val out = ranks
        .unionAll(isolated.withColumn("pr", lit(if (iters == 0) scale else base)))
        .select(col("node").cast("bigint").as("node"),
          col("pr").cast("bigint").as("pr"))
      return Dedup.materializeAndRelease(
        Seq(edges, connected, nodes) ++ extraCaches, out)
    }
    // SHUFFLE REGIME — the rank vector is too big to broadcast: edges stay
    // src-partitioned so the per-superstep join exchanges only the ranks,
    // and nodes ride the aggregate as zero-contribution rows instead of a
    // post-agg left join — ONE exchange per superstep, not two.
    val edges = edges0
      .repartition(shuffleN, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("pr", lit(scale))
    for (i <- 1 to iters) {
      val contrib = ranks
        .join(edges, ranks("node") === edges("src"))
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .unionAll(nodes.select(col("node"), lit(0L).as("c")))
      ranks = contrib.groupBy("node")
        .agg((lit(base) + expr(s"($dampPct * sum(c)) div 100")).as("pr"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    val out = ranks.select(col("node").cast("bigint").as("node"),
      col("pr").cast("bigint").as("pr"))
    Dedup.materializeAndRelease(Seq(edges, nodes) ++ extraCaches, out)
  }

  /** Min-label propagation — connected components once converged (k ≥
    * graph diameter; the dense trade graph converges in 2-3 supersteps,
    * and the SEMANTICS are "after exactly `iters` supersteps", so the
    * oracle is exact whether or not convergence happened). Per superstep
    * each node takes the min of its own label and its in-neighbors'
    * labels — the HashToMin/large-star building block every distributed CC
    * uses; the [[graft.operators.Dedup]] cluster path applies the same
    * idea edge-wise for unbounded diameters.
    *
    * Scale: same two-exchange superstep as [[pageRank]] over the same
    * persisted src-partitioned edges; labels are 16-byte rows.
    */
  def components(spark: SparkSession, dir: String, iters: Int = 4,
      // probe-measured (CompProbe): materializing every 2 supersteps beats
      // one deep 4-superstep lineage by ~30% — AQE re-plans shallower trees
      checkpointEvery: Int = 2): DataFrame = {
    val (pairs, edges) = tradeEdgesFrom(spark, dir, col("l_suppkey") * 2 + 1)
    componentsCore(spark, edges.select("src", "dst"),
      tradeNodes(spark, dir), iters, checkpointEvery, extraCaches = Seq(pairs))
  }

  /** Hub-heavy degree-skew twin of [[components]] (the
    * [[pageRankHubSkew]] pattern): suppliers collapse to `l_suppkey %
    * hubMod` super-nodes, so every min-label superstep funnels nearly the
    * whole customer label set into `hubMod` aggregate keys — the hot-key
    * stress the plain fixture's even degree distribution never exercises.
    * Same recurrence, same oracle shape; partial aggregation (map-side
    * min combine) is what keeps the hot keys safe, which is exactly the
    * property the green twin row certifies.
    */
  def componentsHubSkew(spark: SparkSession, dir: String, iters: Int = 4,
      hubMod: Long = 8, checkpointEvery: Int = 2): DataFrame = {
    require(hubMod >= 1, s"hubMod must be >= 1, got $hubMod")
    val (pairs, edges0) = tradeEdgesFrom(spark, dir, (col("l_suppkey") % hubMod) * 2 + 1)
    val edges = edges0.select("src", "dst")
    val nodes = t(spark, dir, "customer").select((col("c_custkey") * 2).as("node"))
      .unionAll(t(spark, dir, "supplier")
        .select(((col("s_suppkey") % hubMod) * 2 + 1).as("node")).distinct())
    componentsCore(spark, edges, nodes, iters, checkpointEvery, extraCaches = Seq(pairs))
  }

  private def componentsCore(spark: SparkSession, edges0: DataFrame,
      nodes0: DataFrame, iters: Int, checkpointEvery: Int,
      extraCaches: Seq[DataFrame] = Nil): DataFrame = {
    val shuffleN = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val nodes = nodes0.persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = nodes.count()
    if (nNodes <= BroadcastableNodes) {
      // BROADCAST REGIME (r18 opt — the [[pageRankCore]] treatment): label
      // vector broadcast into the dst-partitioned edge cache, neighbor-min
      // aggregate exchange-free, and `min(self ∪ nbrs)` recovered as
      // `least(self, min(nbrs))` via a co-partitioned node-scale join
      // instead of the per-superstep zero-row union (which destroyed the
      // aggregate's partitioning). Isolated nodes keep their own label by
      // definition and re-attach once at the end. The inner join is total:
      // symmetric edges ⇒ every connected node has in-edges ⇒ nbrMin
      // covers exactly the connected set.
      val (edges, connected, isolated) =
        broadcastRegimeEdges(spark, edges0, nodes, shuffleN)
      var labels = connected.withColumn("label", col("node"))
      for (i <- 1 to iters) {
        val nbrMin = broadcast(labels)
          .join(edges, labels("node") === edges("src"))
          .select(col("dst").as("node"), col("label").as("lbl"))
          .groupBy("node").agg(min(col("lbl")).as("nm"))
        labels = labels.join(nbrMin, Seq("node"))
          .select(col("node"), least(col("label"), col("nm")).as("label"))
        if (i % checkpointEvery == 0 && i < iters)
          labels = labels.localCheckpoint()
      }
      val out = labels
        .unionAll(isolated.withColumn("label", col("node")))
        .select(col("node").cast("bigint").as("node"),
          col("label").cast("bigint").as("label"))
      return Dedup.materializeAndRelease(
        Seq(edges, connected, nodes) ++ extraCaches, out)
    }
    // SHUFFLE REGIME — label vector too big to broadcast (see pageRankCore)
    val edges = edges0
      .repartition(shuffleN, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.withColumn("label", col("node"))
    for (i <- 1 to iters) {
      // min(self ∪ neighbor labels) in ONE aggregate — the self rows ride
      // the union, so there is no post-agg join back to the node set
      val cand = labels.join(edges, labels("node") === edges("src"))
        .select(col("dst").as("node"), col("label").as("lbl"))
        .unionAll(labels.select(col("node"), col("label").as("lbl")))
      labels = cand.groupBy("node").agg(min(col("lbl")).as("label"))
      if (i % checkpointEvery == 0 && i < iters)
        labels = labels.localCheckpoint()
    }
    val out = labels.select(col("node").cast("bigint").as("node"),
      col("label").cast("bigint").as("label"))
    Dedup.materializeAndRelease(Seq(edges, nodes) ++ extraCaches, out)
  }

  /** Bounded-hop BFS reachability: minimum hop count (≤ maxHops) from the
    * seed set — customers of one nation — over the symmetric trade graph.
    * Per superstep the frontier is the NEWLY reached nodes only
    * (anti-join against the visited set), so work per hop is proportional
    * to the frontier, not the graph.
    */
  def reachability(spark: SparkSession, dir: String, maxHops: Int = 3,
      nation: String = "NATION_1"): DataFrame = {
    val (pairs, edges0) = tradeEdgesFrom(spark, dir, col("l_suppkey") * 2 + 1)
    val edges = edges0.select("src", "dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seeds = t(spark, dir, "customer")
      .join(t(spark, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === nation)
      .select((col("c_custkey") * 2).as("node"))
    val caches = scala.collection.mutable.ArrayBuffer[DataFrame](pairs, edges)
    var visited = seeds.withColumn("hop", lit(0L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    caches += visited
    var frontier = visited.select("node")
    for (h <- 1 to maxHops) {
      val next = frontier.join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(h.toLong))
        .persist(StorageLevel.MEMORY_AND_DISK)
      caches += next
      visited = visited.unionAll(next).persist(StorageLevel.MEMORY_AND_DISK)
      caches += visited
      frontier = next.select("node")
    }
    val out = visited.select(col("node").cast("bigint").as("node"), col("hop"))
    Dedup.materializeAndRelease(caches.toSeq, out)
  }

  /** TRIANGLE COUNT + global clustering coefficient (round 10) over the
    * supplier CO-SERVICE projection: suppliers are adjacent when they
    * served at least `minOrders` common orders (the bipartite trade graph
    * itself is triangle-free, so the one-mode projection is where
    * community structure lives; the strength threshold is also the
    * density control — the sf0.1 projection thins 453k raw pairs to 48k
    * edges at the default).
    *
    * The count is the classic oriented two-join: with every edge stored
    * once as `u < v`, a triangle `a<b<c` is found EXACTLY once as
    * e(a,b) ⋈ e(b,c) ⋈ e(a,c) — two hash equi-joins, no direction
    * double-counting, no cartesian anywhere. Wedges come from the degree
    * table (`Σ d(d−1)/2`, integers), so the global clustering
    * coefficient `3·triangles / wedges` lands in exact permille.
    *
    * Scale: per-order supplier pairs are bounded by (suppliers/order)²
    * — a fan-out the fixture caps at ~50, and real procurement data
    * keeps small; the edge aggregate shuffles (u, v) pairs once; the
    * triangle join's intermediate is the wedge set, Σ d² — the
    * threshold parameter is the knob that keeps it subquadratic, which
    * is exactly how production triangle counts run (strength-thresholded
    * or degree-ordered).
    */
  /** LINK PREDICTION (round-10 continuation) — resource-allocation index
    * over the supplier co-service graph: for each NON-adjacent pair
    * `(u, v)`, `RA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/deg(w)`, the classic
    * Zhou–Lü–Zhang predictor, kept exact as `Σ 1000000 div deg(w)`
    * micro-units (deg ≥ 1 always — every w on a wedge has ≥ 2 edges).
    * Candidate pairs are enumerated from WEDGES (two-hop paths through a
    * common neighbor) — never from the node cross product — then existing
    * edges are removed with an anti join and the top-k survives under the
    * TOTAL order `(ra DESC, common DESC, u, v)` (u<v pairs are unique, so
    * the limit is deterministic).
    *
    * The strength threshold is SELF-TUNING: an absolute cut cannot track
    * the fixture's density across SFs (at sf0.01 every supplier pair
    * co-serves ≥ 10 orders — the graph is complete and has no links to
    * predict), so edges survive only STRICTLY ABOVE the
    * `cutPermille`-quantile co-service weight, read off the weight
    * HISTOGRAM (distinct weights ≪ edges) with pure integer rank
    * arithmetic — identical on both engines, no interpolating percentile
    * anywhere. The default is the TOP-DECILE backbone (900): the median
    * cut still leaves this fixture ~50% dense, and measured at sf0.1
    * that means 184M wedges (18.5 s); the 900 cut carries 1.3M (137×
    * less) while still yielding 344k candidate pairs — link prediction
    * is only meaningful on a sparse graph to begin with.
    *
    * Scale: the threshold pass windows over the weight histogram (tiny by
    * construction), never the edge list; the wedge set is Σ deg(w)² over
    * middle vertices — the same quantity [[triangles]] bounds, with the
    * quantile cut as the density knob. Two r13 de-hub treatments (VERDICT
    * r12 #2) keep a residual hub from funneling its d² wedges through one
    * task:
    *
    *   - the wedge self-join is BLOCKED per mid: each mid of degree d gets
    *     `s = ⌈d / wedgeCap⌉` hash-buckets over its neighbors, each side
    *     replicates ×s over the OTHER side's bucket, and the join key is
    *     `(mid, bucketₐ, bucket_b)` — so a hub's d² wedge rows spread over
    *     s² shuffle keys with ≤ ~wedgeCap² rows each, at a replication
    *     cost of d·s ≈ d²/wedgeCap rows (1/wedgeCap of the wedge output
    *     itself). Light mids have s = 1 and the machinery degenerates to
    *     the plain self-join with zero overhead. Pair semantics are
    *     untouched: bucket assignment is deterministic, so each (mid,u,v)
    *     wedge matches exactly once.
    *   - the per-mid degree rides ALONG on the blocked rows (deg is joined
    *     once, before the explode) instead of broadcasting the |V|-row
    *     degree table — a plain equi-join AQE may still broadcast when it
    *     is genuinely small.
    *
    * The final top-k is a TakeOrdered, no global sort materializes.
    */
  def linkPredict(spark: SparkSession, dir: String, topK: Int = 20,
      cutPermille: Int = 900, wedgeCap: Int = 1024): DataFrame =
    linkPredictCore(
      t(spark, dir, "lineitem").select("l_orderkey", "l_suppkey").distinct(),
      topK, cutPermille, wedgeCap)

  /** Hub-heavy skew twin of [[linkPredict]] (the [[trianglesHubSkew]]
    * treatment): suppliers collapse to `l_suppkey % hubMod` super-nodes
    * BEFORE the co-order self-join, so the pair aggregate sees at most
    * C(hubMod, 2) distinct keys each carrying an order-table-sized count,
    * and every surviving mid is a hub — the wedge-blocking path is the
    * plan under load. Identical arithmetic, parameterized oracle. The
    * dense hub graph keeps real non-adjacent pairs only below the median
    * cut, hence the 500 default.
    */
  def linkPredictHubSkew(spark: SparkSession, dir: String, topK: Int = 20,
      cutPermille: Int = 500, hubMod: Long = 8, wedgeCap: Int = 1024): DataFrame = {
    require(hubMod >= 1, s"hubMod must be >= 1, got $hubMod")
    linkPredictCore(
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), (col("l_suppkey") % hubMod).as("l_suppkey"))
        .distinct(),
      topK, cutPermille, wedgeCap)
  }

  private def linkPredictCore(sup: DataFrame, topK: Int, cutPermille: Int,
      wedgeCap: Int): DataFrame = {
    require(wedgeCap >= 1, s"wedgeCap must be >= 1, got $wedgeCap")
    val (ew, e) = sparsifiedCoServiceEdgesFrom(sup, cutPermille)
    val adj = e.select(col("u").as("mid"), col("v").as("nb"))
      .union(e.select(col("v").as("mid"), col("u").as("nb")))
    val deg = adj.groupBy("mid").agg(count(lit(1)).as("d"))
    // s = ⌈d / wedgeCap⌉ hash-buckets per mid; each row carries its own
    // bucket (`bs`) and replicates over the other side's bucket (`bo`).
    // PERSISTED: both sides of the wedge self-join read this one frame, so
    // the adj ⋈ deg + explode subtree runs once, not once per side (it is
    // ~2|E|·s̄ narrow rows — tiny next to the wedge output it feeds).
    val blocked = adj.join(deg, "mid")
      .withColumn("s", expr(s"(d + ${wedgeCap - 1}L) div ${wedgeCap}L"))
      .withColumn("bs", pmod(hash(col("nb")).cast("bigint"), col("s")))
      .withColumn("bo", explode(expr("sequence(0L, s - 1L)")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    blocked.count() // eager fill before the two-consumer self-join (cache-before-AQE)
    val scored = blocked.as("a").join(blocked.as("b"),
        col("a.mid") === col("b.mid") &&
          col("a.bs") === col("b.bo") && col("a.bo") === col("b.bs") &&
          col("a.nb") < col("b.nb"))
      .select(col("a.nb").as("u"), col("b.nb").as("v"), col("a.d").as("d"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("n_common"), sum(expr("1000000L div d")).as("ra_micros"))
    val out = scored.join(e, Seq("u", "v"), "left_anti")
      .orderBy(col("ra_micros").desc, col("n_common").desc, col("u").asc, col("v").asc)
      .limit(topK)
      .select(col("u"), col("v"), col("n_common").cast("bigint").as("n_common"),
        col("ra_micros").cast("bigint").as("ra_micros"))
    Dedup.materializeAndRelease(Seq(ew, blocked), out)
  }

  /** The shared QUANTILE-SPARSIFIED supplier co-service edge stage (the
    * self-tuning cut [[linkPredict]] documents): returns the CACHED
    * weighted pair table (caller must hand it to
    * `Dedup.materializeAndRelease`) and the u<v edge set strictly above
    * the `permille`-quantile co-service weight (500 = the lower median;
    * `cum·1000 ≥ n·permille` is the same integer rank rule — for 500 it
    * is algebraically identical to the `(n+1) div 2` median form the
    * link-predict oracle states). [[lpaCommunities]] cuts at 900: the
    * median graph is still ~50% dense on this fixture and LPA would
    * collapse to one community — the top-decile backbone is where the
    * community structure lives.
    */
  private def sparsifiedCoServiceEdges(spark: SparkSession, dir: String,
      permille: Int = 500): (DataFrame, DataFrame) =
    sparsifiedCoServiceEdgesFrom(
      t(spark, dir, "lineitem").select("l_orderkey", "l_suppkey").distinct(), permille)

  private[graft] def sparsifiedCoServiceEdgesFrom(sup: DataFrame,
      permille: Int): (DataFrame, DataFrame) = {
    require(permille >= 1 && permille <= 999, s"permille must be in [1, 999], got $permille")
    val ew = sup.as("a").join(sup.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .groupBy(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .cache()
    ew.count() // fill before the multi-consumer fan-out (cache-before-AQE rule)
    val hist = ew.groupBy("w").agg(count(lit(1)).as("c"))
    // The weight domain is shared-order COUNTS — its distinct-value count
    // is bounded by the max co-service weight, not the edge count. The
    // quadratic broadcast range join below is the parallel form, but it is
    // only tractable while the histogram stays genuinely small (4096² ≈
    // 17M comparisons); past that, a single-partition running-sum window
    // over the histogram is strictly cheaper (a few thousand 16-byte rows
    // through one task vs billions of nested-loop comparisons), so fall
    // back to it instead of failing.
    val nDistinctW = hist.count()
    val cum =
      if (nDistinctW <= 4096)
        // cum(w) = Σ c over weights ≤ w via a broadcast range join: stays
        // parallel over the histogram instead of single-partition-windowing it
        hist
          .join(broadcast(hist.select(col("w").as("w2"), col("c").as("c2"))), col("w2") <= col("w"))
          .groupBy("w").agg(sum("c2").as("cum"))
      else {
        val win = org.apache.spark.sql.expressions.Window.orderBy("w")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        hist.select(col("w"), sum("c").over(win).as("cum"))
      }
    val thr = cum
      .crossJoin(broadcast(ew.agg(count(lit(1)).as("n"))))
      .filter(col("cum") * 1000 >= col("n") * permille)
      .agg(min("w").as("t"))
    val e = ew.crossJoin(broadcast(thr)).filter(col("w") > col("t")).select("u", "v")
    (ew, e)
  }

  /** LABEL-PROPAGATION COMMUNITIES (round-10 continuation) — synchronous
    * LPA (Raghavan et al. 2007) over the median-sparsified co-service
    * graph: every node starts as its own label; each superstep every node
    * adopts the most frequent label among its neighbors, ties to the
    * SMALLEST label — the deterministic variant, so the fixed `steps`
    * supersteps produce one well-defined labeling on any engine (async
    * LPA's order-dependence is exactly what's excluded). Output: each
    * supplier's community after `steps` rounds plus the community size.
    *
    * Scale: one superstep = one equi-join of the adjacency with the
    * (node, label) table + a (node, label) count aggregate + a min-struct
    * argmax per node — the two-exchange Pregel shape [[pageRank]]
    * documents, rows never wider than three longs; the argmax is an
    * aggregate (`min(struct(-c, lbl))`), NOT a per-node window, so no
    * degree-sized partition materializes. Fixed `steps` bounds the
    * lineage (localCheckpoint every 2).
    */
  def lpaCommunities(spark: SparkSession, dir: String, steps: Int = 3,
      cutPermille: Int = 900): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val (ew, e) = sparsifiedCoServiceEdges(spark, dir, cutPermille)
    val adj = e.select(col("u").as("v"), col("v").as("nb"))
      .union(e.select(col("v").as("v"), col("u").as("nb")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()
    var labels = adj.select(col("v")).distinct().withColumn("lbl", col("v"))
    (1 to steps).foreach { i =>
      val counted = adj.join(labels.select(col("v").as("nb"), col("lbl")), "nb")
        .groupBy("v", "lbl").agg(count(lit(1)).as("c"))
      labels = counted
        .groupBy("v")
        .agg(min(struct((-col("c")).as("negc"), col("lbl").as("lbl"))).as("m"))
        .select(col("v"), col("m.lbl").as("lbl"))
      if (i % 2 == 0) labels = labels.localCheckpoint(true)
    }
    val sized = labels.join(labels.groupBy("lbl").agg(count(lit(1)).as("sz")), "lbl")
      .select(col("v").as("supplier"), col("lbl").cast("bigint").as("community"),
        col("sz").cast("bigint").as("community_size"))
    val out = Dedup.materializeAndRelease(Seq(ew), sized)
    adj.unpersist(false)
    out
  }

  def triangles(spark: SparkSession, dir: String, minOrders: Long = 5L,
      wedgeCap: Int = 1024): DataFrame =
    trianglesCore(
      t(spark, dir, "lineitem").select("l_orderkey", "l_suppkey").distinct(),
      minOrders, wedgeCap)

  /** Hub-heavy skew twin of [[triangles]]: suppliers collapse to
    * `l_suppkey % hubMod` super-nodes BEFORE the co-order self-join, so
    * the pair aggregation sees at most C(hubMod, 2) distinct (u, v) keys
    * each carrying an order-table-sized row count — the maximally hot
    * aggregate the plain projection never produces. Partial aggregation
    * (map-side count combine) is the property under test; the wedge stage
    * downstream runs over the tiny hub graph unchanged. Identical
    * arithmetic to the plain twin, parameterized oracle.
    */
  def trianglesHubSkew(spark: SparkSession, dir: String,
      minOrders: Long = 5L, hubMod: Long = 8, wedgeCap: Int = 1024): DataFrame = {
    require(hubMod >= 1, s"hubMod must be >= 1, got $hubMod")
    trianglesCore(
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), (col("l_suppkey") % hubMod).as("l_suppkey"))
        .distinct(),
      minOrders, wedgeCap)
  }

  private def trianglesCore(sup: DataFrame, minOrders: Long,
      wedgeCap: Int = 1024): DataFrame = {
    require(wedgeCap >= 1, s"wedgeCap must be >= 1, got $wedgeCap")
    val e = sup.as("a").join(sup.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .groupBy(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minOrders)
      .select("u", "v")
      .cache()
    e.count() // fill before the multi-consumer fan-out (cache-before-AQE rule)
    val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // DEGREE ORIENTATION (the standard wedge-count cut): point every edge
    // from its lower-(degree, id) endpoint, so wedges enumerate only from
    // each triangle's lowest-degree vertex — Σ C(outdeg, 2) with outdeg
    // capped near √(2m), instead of Σ C(deg, 2). Each triangle has
    // exactly ONE vertex with both triangle edges outgoing under a total
    // order on the vertices, so the count stays exact; the closing
    // lookup uses the canonical u<v edge set. Measured ~4× fewer wedge
    // rows on the sf0.1 projection. The degree table is |V| rows — plain
    // equi-joins (AQE broadcasts when genuinely small), never an
    // unconditional broadcast (r13, the linkPredict treatment). The
    // persisted two-consumer frame is `blocked` below (r14: oriented
    // itself is single-consumer once the blocking subsumes it).
    val oriented = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("src"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("dst"))
    // BLOCKED wedge enumeration (r14 deep-read — closing the residual the
    // orientation argument left open): orientation caps outdeg near
    // √(2m), but a vertex RETAINING that outdegree still lands its
    // C(√(2m), 2) ≈ m wedge rows on the one task owning its src key. The
    // linkPredict cure applies verbatim: s = ⌈outdeg/wedgeCap⌉ hash
    // sub-buckets over each src's out-neighbors, rows replicate across
    // the other side's bucket, and the join keys on (src, bs=bo, bo=bs) —
    // wedges BIT-identical (every out-pair meets exactly once, the
    // property-tested blocked-self-join lemma), hot sources spread over
    // s² keys, light sources (s = 1, every fixture vertex at the default
    // cap) degenerate to the plain self-join.
    val odeg = oriented.groupBy("src").agg(count(lit(1)).as("od"))
    val blocked = oriented.join(odeg, "src")
      .withColumn("s", expr(s"(od + ${wedgeCap - 1}L) div ${wedgeCap}L"))
      .withColumn("bs", pmod(hash(col("dst")).cast("bigint"), col("s")))
      .withColumn("bo", explode(expr("sequence(0L, s - 1L)")))
      .select("src", "dst", "bs", "bo")
      .persist(StorageLevel.MEMORY_AND_DISK)
    blocked.count() // eager fill before the two-consumer self-join
    val nTri = blocked.as("e1")
      .join(blocked.as("e2"),
        col("e1.src") === col("e2.src") &&
          col("e1.bs") === col("e2.bo") && col("e1.bo") === col("e2.bs") &&
          col("e1.dst") < col("e2.dst"))
      .select(col("e1.dst").as("wu"), col("e2.dst").as("wv"))
      .join(e, col("wu") === col("u") && col("wv") === col("v"), "left_semi")
      .count()
    val out = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(expr("d * (d - 1) div 2")).as("n_wedges"))
      .join(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .select(col("n_nodes").cast("bigint").as("n_nodes"),
        col("n_edges").cast("bigint").as("n_edges"),
        col("n_wedges").cast("bigint").as("n_wedges"),
        lit(nTri).as("n_triangles"),
        // NULL when the graph has no wedges (every node degree ≤ 1 — a
        // valid outcome of a harsh minOrders threshold): Spark's ANSI
        // `div 0` would kill the job, DuckDB's `// 0` is NULL — the CASE
        // pins the oracle's semantics (r16 review find, the r15
        // text_quality DIVIDE_BY_ZERO class)
        expr(s"CASE WHEN n_wedges > 0 THEN (3L * ${nTri}L * 1000L) div n_wedges END")
          .as("clustering_permille"))
    Dedup.materializeAndRelease(Seq(e, blocked), out)
  }
}
