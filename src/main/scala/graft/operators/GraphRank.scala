package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic integer-arithmetic PageRank over a weighted undirected
  * graph — the graph-centrality ranking pass of a curation pipeline.
  * Near-dup pair generators ([[Dedup.winnowOverlapPairs]], MinHash LSH,
  * embedding LSH) induce a similarity graph over the corpus; damped
  * centrality over that graph ranks documents by how much duplicated /
  * boilerplate mass surrounds them, which is global evidence for choosing
  * cluster representatives (vs the per-pair min-id rule) and the same
  * machinery CommonCrawl-style source ranking runs over a link graph.
  *
  * Cross-engine determinism by construction: ALL arithmetic is 64-bit
  * integer. The total mass is `scale` integer units, split uniformly at
  * init (`scale div n` each); each iteration a node sends
  * `(rank * w) div wsum` units down each incident edge and updates to
  * `tele + (num * incoming) div den` where
  * `tele = ((scale div n) * (den - num)) div den`. No floating point
  * appears anywhere, so an engine replaying the same expressions with
  * floor division (DuckDB `//`) reproduces every iteration BITWISE — the
  * same derived-state oracle discipline as the kmeans / BPE replays, but
  * with exact integer state instead of quantized floats. Floor truncation
  * leaks a few units of mass per node per round (bounded by n + E units);
  * the leak is itself deterministic and ranking-irrelevant.
  *
  * Scale shape (the Pregel shape): the symmetrized edge relation with its
  * precomputed out-weight (`src, dst, w, wsum`) is lineage-truncated ONCE
  * and reused by every iteration; each iteration is one shuffled
  * join+aggregate (contributions grouped by `dst`) plus a broadcast-able
  * left join back onto the node set — O(iters) shuffles total, no driver
  * data beyond the single node count. With the default lazy
  * local-checkpoint truncation the whole fixed-iteration chain runs in ONE
  * action and caches at most `iters` rank frames of (long, long) rows; the
  * 100 TB path passes `checkpointDir` (HDFS/object-store URI) and gets
  * per-iteration reliable checkpoints that survive executor loss, exactly
  * like [[Dedup.connectedComponents]].
  *
  * Overflow bound: intermediate products are `rank * w <= scale * maxW`
  * and `num * incoming <= num * scale`; with the default
  * `scale = 10^12` any `maxW <= 10^6` and `num <= 10^6` stay far inside
  * Long range. Isolated documents (no qualifying pair) are not graph
  * nodes and carry no rank — restrict or union downstream as needed.
  */
object GraphRank {

  /** Weighted damped PageRank over undirected `pairs`.
    *
    * @param pairs   (aCol, bCol, wCol) rows, each an undirected weighted
    *                edge; symmetrized internally.
    * @param iters   fixed iteration count (deterministic, no convergence
    *                test — rank ordering stabilizes in a handful of rounds
    *                on shallow similarity graphs).
    * @param scale   total integer mass distributed across nodes.
    * @param num/den damping factor as an exact rational (85/100 = 0.85).
    * @param idOut   output id column name.
    * @return (idOut, rank): one row per graph node, rank in integer mass
    *         units (descending rank = descending centrality).
    */
  def pagerank(
      pairs: DataFrame,
      iters: Int = 6,
      scale: Long = 1000000000000L,
      num: Long = 85,
      den: Long = 100,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      wCol: String = "n_shared",
      idOut: String = "doc_id",
      checkpointDir: Option[String] = None): DataFrame =
    rankImpl(pairs, None, iters, scale, num, den, aCol, bCol, wCol, idOut, checkpointDir)

  /** PERSONALIZED PageRank: identical integer machinery, but the teleport
    * mass returns only to `seeds` (uniformly split among the seed nodes
    * present in the graph) instead of to every node — rank becomes
    * proximity-to-the-seed-set, the graph-structural sibling of the
    * lexical/dense seed expansion in [[Retrieval.hybridSeedExpand]]
    * ("more docs like these" by similarity-graph reachability). Same
    * bitwise-replayable arithmetic: the per-node teleport is a CASE on
    * seed membership, everything stays 64-bit integer.
    */
  def personalizedPagerank(
      pairs: DataFrame,
      seeds: Seq[Long],
      iters: Int = 6,
      scale: Long = 1000000000000L,
      num: Long = 85,
      den: Long = 100,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      wCol: String = "n_shared",
      idOut: String = "doc_id",
      checkpointDir: Option[String] = None): DataFrame = {
    require(seeds.nonEmpty, "personalizedPagerank: empty seed set")
    rankImpl(pairs, Some(seeds), iters, scale, num, den, aCol, bCol, wCol, idOut, checkpointDir)
  }

  /** BATCHED multi-seed personalized PageRank: one rank relation keyed by
    * `(seed_id, node)` instead of one full PPR run per seed. Each seed's
    * column of the state evolves under EXACTLY the single-seed arithmetic
    * of [[personalizedPagerank]] (`present = 1`, so the per-seed teleport
    * is `(scale * (den - num)) div den` on the seed node and 0 elsewhere),
    * so every `(seed_id, node, rank)` row is BITWISE equal to the
    * corresponding single-seed run — integer addition is order-free, and
    * the grouped contribution sum per `(seed_id, dst)` partitions exactly
    * as the per-seed sums do.
    *
    * Scale shape — the reason this exists: S single-seed runs cost
    * S · iters full-graph shuffled join+aggregates and a driver-built plan
    * linear in S; here the seed dimension rides IN the shuffle key, so the
    * whole batch is one join+aggregate per iteration REGARDLESS of seed
    * count (the edge relation fans out against the seed-expanded rank
    * frame on `src`, contributions group by `(seed_id, dst)`). State is
    * S·N rows of three longs — at 100 TB graph scale with hundreds of
    * seeds this is the difference between 6 graph passes and 600.
    * GraphRankSpec pins both the bitwise equality and the
    * actions-independent-of-seed-count property.
    *
    * Seeds must all be graph nodes (each single-seed run would demand the
    * same); duplicates are collapsed. Output: (seedOut, idOut, rank), one
    * row per (seed, graph node).
    */
  def personalizedPagerankMulti(
      pairs: DataFrame,
      seeds: Seq[Long],
      iters: Int = 6,
      scale: Long = 1000000000000L,
      num: Long = 85,
      den: Long = 100,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      wCol: String = "n_shared",
      idOut: String = "doc_id",
      seedOut: String = "seed_id",
      checkpointDir: Option[String] = None): DataFrame = {
    require(seeds.nonEmpty, "personalizedPagerankMulti: empty seed set")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(num > 0 && num < den, s"damping $num/$den must be in (0, 1)")
    require(scale >= 1000000L && scale <= 1000000000000000L,
      s"scale $scale outside sane integer-mass range [1e6, 1e15]")
    val distinctSeeds = seeds.distinct
    val durable = Dedup.durableBy(pairs, checkpointDir)

    val sym = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"), col(wCol).cast("long").as("w"))
      .unionByName(
        pairs.select(col(bCol).as("src"), col(aCol).as("dst"), col(wCol).cast("long").as("w")))
    val wsum = sym.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
    val ew = durable(sym.join(wsum, "src"))
    val nodes = ew.select(col("src").as("node")).distinct()

    val n = nodes.count()
    require(n > 0, "pagerank: empty graph (no pairs)")
    val r0 = scale / n
    val present = nodes.where(col("node").isin(distinctSeeds: _*)).count()
    require(present == distinctSeeds.size,
      s"personalizedPagerankMulti: ${distinctSeeds.size - present} seed(s) are not graph nodes")
    // single-seed teleport (present = 1 in each per-seed run)
    val teleSeed = ((scale / 1L) * (den - num)) / den

    val spark = pairs.sparkSession
    import spark.implicits._
    // the (seed, node) grid: seeds are a KB-scale literal list, broadcast
    val grid = nodes.crossJoin(broadcast(distinctSeeds.toDF("seed_id")))
    val tele = when(col("node") === col("seed_id"), lit(teleSeed)).otherwise(lit(0L))

    var ranks = grid.withColumn("rank", lit(r0))
    for (_ <- 1 to iters) {
      val inc = ew
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("seed_id"), col("dst"))
        .agg(sum(expr("(rank * w) div wsum")).as("inc"))
      ranks = durable(
        grid
          .join(inc.withColumnRenamed("dst", "node"), Seq("seed_id", "node"), "left")
          .select(
            col("seed_id"),
            col("node"),
            (tele + expr(s"($num * coalesce(inc, cast(0 as bigint))) div $den"))
              .as("rank")))
    }
    ranks.select(col("seed_id").as(seedOut), col("node").as(idOut), col("rank"))
  }

  private def rankImpl(
      pairs: DataFrame,
      seeds: Option[Seq[Long]],
      iters: Int,
      scale: Long,
      num: Long,
      den: Long,
      aCol: String,
      bCol: String,
      wCol: String,
      idOut: String,
      checkpointDir: Option[String]): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(num > 0 && num < den, s"damping $num/$den must be in (0, 1)")
    require(scale >= 1000000L && scale <= 1000000000000000L,
      s"scale $scale outside sane integer-mass range [1e6, 1e15]")
    val durable = Dedup.durableBy(pairs, checkpointDir)

    val sym = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"), col(wCol).cast("long").as("w"))
      .unionByName(
        pairs.select(col(bCol).as("src"), col(aCol).as("dst"), col(wCol).cast("long").as("w")))
    val wsum = sym.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
    // the loop relation: every iteration scans THIS, not the pair generator
    val ew = durable(sym.join(wsum, "src"))
    val nodes = ew.select(col("src").as("node")).distinct()

    val n = nodes.count()
    require(n > 0, "pagerank: empty graph (no pairs)")
    val r0 = scale / n
    // teleport column: uniform everywhere (classic), or the full teleport
    // budget split uniformly over the seed nodes PRESENT in the graph
    // (personalized) — absent seeds would silently strand mass otherwise
    val teleCol = seeds match {
      case None =>
        lit(((scale / n) * (den - num)) / den)
      case Some(ss) =>
        val present = nodes.where(col("node").isin(ss: _*)).count()
        require(present > 0, s"personalizedPagerank: no seed is a graph node (seeds=$ss)")
        val teleSeed = ((scale / present) * (den - num)) / den
        when(col("node").isin(ss: _*), lit(teleSeed)).otherwise(lit(0L))
    }

    var ranks = nodes.withColumn("rank", lit(r0))
    for (_ <- 1 to iters) {
      val inc = ew
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(expr("(rank * w) div wsum")).as("inc"))
      ranks = durable(
        nodes
          .join(inc.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(
            col("node"),
            (teleCol + expr(s"($num * coalesce(inc, cast(0 as bigint))) div $den"))
              .as("rank")))
    }
    ranks.select(col("node").as(idOut), col("rank"))
  }

  /** Single-source(-set) shortest HOP distances — BFS levels — from a seed
    * set over an undirected graph, by iterative min-relaxation: round k
    * extends every known distance across one edge and keeps the per-node
    * minimum, so after `maxHops` rounds every node at distance ≤ maxHops
    * carries its EXACT hop count (relaxation can only shorten, never
    * lengthen, and level-k nodes are fixed after round k). Unreachable /
    * farther nodes are absent, not null — the frontier never visits them.
    *
    * All-integer state (`node BIGINT, hops BIGINT`), so an engine replaying
    * the same relaxation — or the textbook recursive-CTE BFS, which is what
    * the oracle runs — reproduces the distances bitwise. This is the
    * reachability primitive next to [[Dedup.connectedComponents]] (which
    * answers "same cluster?" but not "how far?") and [[personalizedPagerank]]
    * (proximity mass, not metric distance).
    *
    * Scale shape (Pregel, like [[rankImpl]]): the symmetrized edge relation
    * is lineage-truncated ONCE and reused; each round is one shuffled
    * equi-join on the frontier key plus a min-aggregate — O(maxHops)
    * shuffles, no driver-side data. The distance frame never exceeds the
    * reachable node set. `checkpointDir` upgrades the per-round truncation
    * to reliable checkpoints for executor-loss survival at 100 TB, exactly
    * like the components loop.
    */
  def hopDistances(
      pairs: DataFrame,
      seeds: Seq[Long],
      maxHops: Int,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      idOut: String = "doc_id",
      checkpointDir: Option[String] = None): DataFrame = {
    require(seeds.nonEmpty, "hopDistances: at least one seed required")
    require(maxHops >= 1 && maxHops <= 64,
      s"hopDistances: maxHops must be in [1, 64], got $maxHops")
    val durable = Dedup.durableBy(pairs, checkpointDir)
    val sym = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(
        pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
    val edges = durable(sym)
    val nodes = edges.select(col("src").as("node")).distinct()
    val present = nodes.where(col("node").isin(seeds: _*))
    require(present.count() > 0,
      s"hopDistances: no seed is a graph node (seeds=$seeds)")
    var dist = present.select(col("node"), lit(0L).as("hops"))
    for (_ <- 1 to maxHops) {
      val reached = edges
        .join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("hops") + lit(1L)).as("hops"))
      dist = durable(
        dist.unionByName(reached)
          .groupBy(col("node"))
          .agg(min(col("hops")).as("hops")))
    }
    dist.select(col("node").as(idOut), col("hops")).orderBy(col(idOut))
  }

  /** Per-node triangle counts and local clustering coefficient over
    * undirected `pairs` — the cohesion metric that separates a TIGHT
    * duplicate cluster (boilerplate families: everyone overlaps everyone,
    * clustering → 1) from a hub-and-spoke pattern (one template document
    * loosely touching many unrelated docs, clustering → 0). Centrality
    * ([[pagerank]]) says "how much mass surrounds this node"; clustering
    * says whether that mass is one clique or scattered — together they
    * drive the keep-the-canonical / break-up-the-hub curation decisions.
    *
    * Exact and all-integer: `clustering_ppm = 2·10^6 · triangles div
    * (deg·(deg-1))` (floor division, nonnegative operands — replays
    * bitwise). Scale shape: triangle enumeration is the standard two-join
    * canonical-ordering scan — edges kept as `a < b` rows, so each
    * triangle is generated exactly once as `a < b < c`; both joins are
    * shuffled equi-joins on a node key, no cartesian. Skew caveat at
    * 100 TB: a hub node of degree d contributes O(d²) wedge candidates —
    * the standard mitigation (degree-ordered orientation) is unnecessary
    * here because the winnow graph's `maxPrintFreq` knob already caps
    * hot-print degree upstream.
    */
  def triangleStats(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      idOut: String = "doc_id"): DataFrame = {
    val e = pairs.select(
      least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = e.select(col("a").as("n")).unionByName(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("degree"))
    val wedges = e.as("x").join(e.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("a"), col("x.b").as("b"), col("y.b").as("c"))
    val tri = wedges.join(
      e.select(col("a"), col("b").as("c")), Seq("a", "c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("n"), "left_outer")
      .select(
        col("n").as(idOut), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn(
        "clustering_ppm",
        expr("CASE WHEN degree >= 2 THEN n_triangles * 2000000 div (degree * (degree - 1)) ELSE 0L END"))
      .orderBy(col(idOut))
  }

  /** k-CORE decomposition by iterative peeling (Seidman 1983; the
    * distributed round structure of Montresor et al., "Distributed k-Core
    * Decomposition", IEEE TPDS 2013): repeatedly drop every node whose
    * degree in the REMAINING graph is below `k` until none is — removals
    * CASCADE, so a node can die in round 3 because its round-2 neighbors
    * died, which is exactly what a plain `HAVING count(*) >= k` cannot
    * express. The survivors are the maximal subgraph where every node
    * keeps ≥ k neighbors — the dense-cluster extractor that separates a
    * boilerplate clique from the loose periphery [[triangleStats]]'
    * clustering coefficient only scores locally.
    *
    * Scale shape: each round is ONE degree aggregation plus two
    * node-keyed semi-joins over the shrinking edge set — all shuffles on
    * the node key, lineage truncated per round like
    * [[graft.operators.Dedup.connectedComponents]] (localCheckpoint, or a
    * real checkpoint dir for multi-executor restarts). Rounds needed =
    * the peel depth (bounded by the degeneracy ordering length), in
    * practice single digits on similarity graphs; `maxRounds` is a loud
    * backstop, and the emitted `converged` flag records that the loop
    * reached the fixpoint rather than the cap.
    *
    * Output: one row per surviving node — (idOut, core_deg ≥ k,
    * converged), ordered by node.
    */
  /** WEIGHTED single-source (multi-seed) shortest paths by synchronous
    * Bellman–Ford rounds — the weighted generalization of [[hopDistances]]:
    * round t relaxes every edge once
    * (`d_t(v) = min(d_{t-1}(v), min_u d_{t-1}(u) + w(u,v))`), so after H
    * rounds every ≤H-hop shortest path is final and convergence
    * (`d_H == d_{H-1}`) certifies the full answer. All-integer costs —
    * the caller maps similarity to a cost like `1_000_000 div n_shared` —
    * so the replay is bitwise. Each round is ONE node-keyed join+min
    * aggregation over the static edge relation (the Pregel shape shared
    * with [[pagerank]]), lineage truncated per round; distances only
    * DECREASE and the reached set only GROWS, which is what lets the
    * emitted `converged` flag reduce to (count, sum) equality between
    * the last two rounds — and lets the oracle replay the rounds as a
    * linear unrolled CTE chain instead of enumerating paths.
    *
    * Output: (idOut, dist, converged) for every reached node, by node.
    */
  def shortestPaths(
      pairs: DataFrame,
      seeds: Seq[Long],
      costCol: Column,
      maxHops: Int,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      idOut: String = "doc_id",
      checkpointDir: Option[String] = None): DataFrame = {
    require(seeds.nonEmpty, "shortestPaths: at least one seed required")
    require(maxHops >= 1 && maxHops <= 64,
      s"shortestPaths: maxHops must be in [1, 64], got $maxHops")
    val durable = Dedup.durableBy(pairs, checkpointDir)
    val sym = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"),
        costCol.cast("long").as("w"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst"), costCol.cast("long").as("w")))
      .where(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
    val edges = durable(sym)
    val present = edges.select(col("src").as("node")).distinct()
      .where(col("node").isin(seeds: _*))
    require(present.count() > 0, s"shortestPaths: no seed is a graph node (seeds=$seeds)")
    var dist = durable(present.select(col("node"), lit(0L).as("dist")))
    var snap = dist.agg(count(lit(1)), coalesce(sum(col("dist")), lit(0L))).head()
    var converged = false
    var round = 0
    while (!converged && round < maxHops) {
      val relaxed = edges
        .join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = durable(
        dist.unionByName(relaxed).groupBy(col("node")).agg(min(col("dist")).as("dist")))
      val s = dist.agg(count(lit(1)), coalesce(sum(col("dist")), lit(0L))).head()
      // distances only decrease and nodes only appear: equal (count, sum)
      // between rounds certifies the fixpoint
      converged = s.getLong(0) == snap.getLong(0) && s.getLong(1) == snap.getLong(1)
      snap = s
      round += 1
    }
    dist.select(col("node").as(idOut), col("dist"), lit(converged).as("converged"))
      .orderBy(col(idOut))
  }

  /** Newman MODULARITY of a node partition over an undirected weighted
    * graph, in EXACT integers (Newman & Girvan 2004, eq. 5):
    * `Q = Σ_c [ I_c/2m − (deg_c/(2m))² ]` with `I_c` the community's
    * internal ORDERED edge mass — emitted per community as the exact
    * scaled numerator `q_num = 2m·I_c − deg_c²` whose total over the
    * denominator `(2m)²` IS Q; no float and no floor division ever
    * enters the output, so both engines agree bitwise even for negative
    * (worse-than-random) partitions. One edge pass for degrees, one
    * community join for intra-edge mass; at 100 TB both are
    * node/edge-keyed shuffles, and the per-community output is
    * community-count-sized.
    *
    * `membership`: (idOut?, actually (node, community)) — typically
    * [[graft.operators.Dedup.connectedComponents]] output. Edges whose
    * endpoints miss a membership row are ignored (documented: audit
    * membership coverage separately).
    *
    * Output: per-community (community, n_nodes, deg_sum, intra_2x, m2,
    * q_num) ordered by community, plus the same global `q_num_total` on
    * every row.
    */
  def modularity(
      pairs: DataFrame,
      membership: DataFrame,
      weightCol: Column,
      aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame = {
    val e = pairs.select(
      col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"),
      weightCol.cast("long").as("w"))
    val m2 = e.agg(coalesce(sum(col("w") * 2L), lit(0L)).as("m2")) // 2m
    val mem = membership.select(
      col(membership.columns.head).cast("long").as("node"),
      col(membership.columns(1)).cast("long").as("community"))
    val deg = e.select(col("a").as("node"), col("w"))
      .unionByName(e.select(col("b").as("node"), col("w")))
      .groupBy(col("node")).agg(sum(col("w")).as("deg"))
      .join(mem, "node")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("deg_sum"))
    val intra = e
      .join(mem.select(col("node").as("a"), col("community").as("ca")), "a")
      .join(mem.select(col("node").as("b"), col("community").as("cb")), "b")
      .where(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg((sum(col("w")) * 2L).as("intra_2x"))
    val perC = deg.join(intra, Seq("community"), "left_outer")
      .select(col("community"), col("n_nodes"), col("deg_sum"),
        coalesce(col("intra_2x"), lit(0L)).as("intra_2x"))
      .crossJoin(broadcast(m2))
      .withColumn("q_num", col("m2") * col("intra_2x") - col("deg_sum") * col("deg_sum"))
    // Q = q_num_total / m2² — emitted as the exact integer pair, never a
    // float or a floor-division whose negative-operand semantics differ
    // across engines; the consumer divides at display time. The total
    // rides a window over the COMMUNITY-sized frame (one tiny exchange)
    // rather than a scalar crossJoin, which would re-derive the whole
    // perC subtree a second time
    import org.apache.spark.sql.expressions.Window
    perC.withColumn("q_num_total", sum(col("q_num")).over(Window.partitionBy(lit(1))))
      .orderBy(col("community"))
  }

  def kCore(
      pairs: DataFrame,
      k: Int,
      maxRounds: Int = 50,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      idOut: String = "doc_id",
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    require(maxRounds >= 1, s"kCore: maxRounds must be >= 1, got $maxRounds")
    val durable = Dedup.durableBy(pairs, checkpointDir)
    val sym = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(
        pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .where(col("src") =!= col("dst")).distinct()
    var edges = durable(sym)
    var nEdges = edges.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds && nEdges > 0L) {
      val keep = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("src").as("keep_node"))
      val pruned = durable(
        edges
          .join(keep, col("src") === col("keep_node"), "left_semi")
          .join(keep, col("dst") === col("keep_node"), "left_semi"))
      val m = pruned.count()
      converged = m == nEdges
      edges = pruned
      nEdges = m
      round += 1
    }
    if (nEdges == 0L) converged = true // empty fixpoint
    edges.groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
      .select(col("src").as(idOut), col("core_deg"), lit(converged).as("converged"))
      .orderBy(col(idOut))
  }

  /** SYNCHRONOUS LABEL PROPAGATION communities (Raghavan et al. 2007, the
    * near-linear community detector) made fully DETERMINISTIC: every node
    * starts labeled with itself, and each round reassigns it the label
    * most frequent among its neighbors with the tie broken toward the
    * SMALLEST label (classic LPA breaks ties randomly and oscillates;
    * the min-tie-break plus a FIXED round count gives one well-defined
    * answer both engines can replay — the oracle unrolls the rounds as
    * CTEs, the k-means/PageRank discipline). Complements the other graph
    * ops: components find CONNECTIVITY, modularity SCORES a partition,
    * LPA finds the dense-region partition itself.
    *
    * Each round is one neighbor-label join + one (node, label) count +
    * one argmax window — all shuffles on the node key, rounds-many jobs
    * total, state one label per node. Nodes outside the edge set have no
    * neighbors and keep themselves (they are not emitted — callers union
    * singletons back if wanted).
    */
  def labelPropagation(
      pairs: DataFrame,
      iters: Int,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"labelPropagation: iters must be >= 1, got $iters")
    import org.apache.spark.sql.expressions.Window
    val durable = Dedup.durableBy(pairs, checkpointDir)
    val edges = durable(pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .unionByName(
        pairs.select(col(bCol).cast("long").as("a"), col(aCol).cast("long").as("b")))
      .where(col("a") =!= col("b")).distinct())
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node"))
    val byFreqThenMin = Window.partitionBy(col("a"))
      .orderBy(col("c").desc, col("lbl").asc)
    (0 until iters).foreach { _ =>
      labels = durable(edges
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(byFreqThenMin))
        .where(col("rn") === 1)
        .select(col("a").as("node"), col("lbl")))
    }
    labels
  }
}
