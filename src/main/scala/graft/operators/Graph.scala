package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components.
  *
  * PageRank here uses ORDER-INDEPENDENT fixed-point arithmetic: ranks
  * are int64 scaled by 2^30, per-edge contributions are integer
  * divisions, and per-node sums are exact long additions — so the
  * result is bit-identical under any partitioning/merge order (double
  * sums over shuffled contributions are not, which is why a float
  * formulation can't be differentially tested — the same trick as the
  * IVF Lloyd step). Each round is one shuffle (contributions grouped by
  * destination) plus a broadcast of the two scalar aggregates (dangling
  * mass, total nodes); lineage is truncated per round with
  * localCheckpoint exactly like connectedComponents — plans stay O(1)
  * per iteration.
  */
object Graph {

  val Scale: Long = 1L << 30

  /** The session's configured shuffle parallelism — the partition count
    * to PIN on a pre-checkpoint repartition. An eager localCheckpoint
    * freezes its input's runtime partitioning, and AQE coalesces a
    * small exchange to very few partitions (correct for size-
    * proportional work, disastrous for the expanding joins these
    * materialized edge lists feed). Pinning to the configured count
    * keeps the materialized layout as parallel as the session asked
    * for — scale-adaptive via conf, not a constant. */
  private[graft] def shufflePartitions(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt

  /** Scale-GATED broadcast of a per-vertex loop frame (r17). Every
    * iterative operator joins a |V|-bounded frame (ranks, labels,
    * frontier) against the checkpointed edge list each round, and the
    * checkpoint's UnknownPartitioning means Spark re-exchanges and
    * sorts the |E| edge rows per round for a sort-merge join (q86:
    * a 2.4M-row exchange plus the round's dominant join stage, three
    * times per query). When the vertex count — measured, not
    * estimated — is small enough to broadcast, hint it and the edge
    * side never moves; past the threshold (conf-overridable; default
    * 4M rows ≈ 64 MB built) the loop keeps the shuffle join, so
    * billion-vertex graphs never collect anything. A blanket hint
    * would be the driver-OOM trap the degree-table comment in
    * orientedTriangles documents; the gate is what makes it safe. */
  private[graft] def vertexSide(df: DataFrame, nRows: Long): DataFrame = {
    val max = df.sparkSession.conf
      .getOption("spark.graft.graph.broadcastVerticesMaxRows")
      .map(_.toLong).getOrElse(4000000L)
    if (nRows >= 0 && nRows <= max) broadcast(df) else df
  }

  /** Exact integer floor-division for longs (Column./ is always DOUBLE
    * division). Safe because every numerator here is < 2^53: the double
    * quotient m/n can only round across an integer boundary when
    * n·q > 2^53, i.e. m > 2^53 — so cast-truncate ≡ floor exactly. */
  private def ldiv(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (a / b).cast("long")

  /** `iters` rounds of damped PageRank over a DIRECTED edge list
    * (src, dst). Dangling mass (nodes with no out-edges) redistributes
    * uniformly. Returns (id, pr_fixed) with pr_fixed = rank · 2^30;
    * ranks sum to ~2^30·N/N = 2^30 up to integer-floor loss. Scaling
    * bound: intermediate products stay under 2^63 for N·damping·2^30 <
    * 2^62, i.e. any graph under ~4B nodes with damping as d100/100. */
  def pageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
      iters: Int = 10, dampingPct: Int = 85): DataFrame = {
    require(dampingPct > 0 && dampingPct < 100)
    val n = nodes.select(col(idCol).as("id")).distinct().localCheckpoint(true)
    // materialize the edge list PRE-PARTITIONED on the join key:
    // upstream distinct()s leave it hash-partitioned on (src, dst),
    // which does NOT satisfy the per-round ranks⋈e join on src.
    // localCheckpoint, NOT persist (r16): the persisted edge list was
    // measured being recomputed — lineitem scan and distinct included —
    // on every round's exchange (q82: ten ~7-9s map stages re-emitting
    // all 268k edges). The eager checkpoint stores the rows once, and
    // LogicalRDD carries the repartition's hashpartitioning(src) so the
    // per-round join still reuses it without a new exchange.
    val e = edges.select(col("src"), col("dst"))
      .repartition(shufflePartitions(edges), col("src"))
      .localCheckpoint(true)
    val outDeg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg"))
    // N is a bounded driver scalar (1 row) — a literal in every round's
    // plan beats carrying an n_nodes column through every row
    val nNodes: Long = n.count()
    // empty graph → well-defined empty rank table (and Scale/nNodes
    // below would otherwise divide by zero)
    if (nNodes == 0) {
      return n.select(col("id"), lit(0L).as("pr_fixed"))
    }

    // the dangling mass rides each round's checkpoint job via
    // observe() (the kCore pattern) — a separate per-round aggregation
    // job would double the round's job count for one scalar
    def danglingObs(name: String) =
      new org.apache.spark.sql.Observation(name)
    def withDangling(df: DataFrame,
        obs: org.apache.spark.sql.Observation): DataFrame =
      df.observe(obs, coalesce(sum(when(col("outdeg").isNull,
        col("pr"))), lit(0L)).as("dangling"))

    // init: every node starts at 2^30 / N (exact integer division —
    // the tiny floor loss is identical everywhere)
    var obs = danglingObs("pr_init")
    var ranks = withDangling(n
      .select(col("id"), lit(Scale / nNodes).as("pr"))
      .join(outDeg, Seq("id"), "left"), obs)
      .localCheckpoint(true)

    var i = 0
    while (i < iters) {
      // the previous checkpoint job already computed this round's
      // dangling mass
      val dangling: Long = obs.get("dangling").asInstanceOf[Long]
      // per-edge contribution = floor(pr/outdeg); per-node inflow is an
      // exact long sum — the one shuffle of the round. The rank side is
      // |V|-bounded and nNodes is already measured: the gated broadcast
      // keeps the checkpointed edge list from re-exchanging+sorting
      // every round (see vertexSide)
      val contrib = vertexSide(ranks.filter(col("outdeg").isNotNull),
          nNodes)
        .join(e, col("id") === col("src"))
        .select(col("dst").as("id"), ldiv(col("pr"), col("outdeg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("inflow"))
      // pr' = (100-d)·S/(100·N) + d·(inflow + dangling/N)/100, all in
      // integer arithmetic with a FIXED operation order
      val prNew =
        lit((100L - dampingPct) * Scale / (100L * nNodes)) +
          ldiv(lit(dampingPct.toLong) * (coalesce(col("inflow"), lit(0L)) +
            lit(dangling / nNodes)), lit(100L))
      obs = danglingObs(s"pr_round_$i")
      ranks = withDangling(ranks
        .join(contrib, Seq("id"), "left")
        .select(col("id"), prNew.as("pr"), col("outdeg")), obs)
        .localCheckpoint(true)
      i += 1
    }
    ranks.select(col("id"), col("pr").as("pr_fixed"))
  }

  /** Synchronous label propagation (community detection), fully
    * deterministic: labels start as the node id; each round every node
    * adopts the MODE of its neighbors' labels with ties broken by the
    * smallest label — an argmax over exact integer counts, so unlike
    * the classic randomized-order LPA the result is identical under
    * any partitioning AND replayable by plain SQL (the q86 oracle runs
    * the same rounds as chained CTEs). Fixed `iters` rounds (the
    * convergence-free variant — data-dependent stopping would make the
    * round count, and thus the oracle, input-dependent). One shuffle
    * per round (the neighbor-label count); the argmax is a plain
    * max(struct(c, -label)) aggregate — (count desc, label asc) as one
    * total order over exact integers, partially aggregatable map-side,
    * where a row_number window would force an extra per-partition sort;
    * localCheckpoint truncates lineage exactly like pageRank. */
  def labelPropagation(edges: DataFrame, iters: Int,
      assumeDistinct: Boolean = false): DataFrame = {
    // pre-partitioned on src for the same reason as pageRank's edge
    // cache: the per-round neighbor-label join keys on src, and the
    // distinct's (src, dst) partitioning would re-exchange the doubled
    // edge list every round. assumeDistinct skips the dedup exchange
    // entirely: when the caller's edges are distinct a<b pairs (q86's
    // co-occurrence graph), the doubled union cannot contain
    // duplicates — the distinct() was a full wasted shuffle of the
    // doubled edge list
    val doubled = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
    // localCheckpoint, NOT persist (r16): see pageRank — the persisted
    // doubled edge list was re-derived from source on every round's
    // join exchange; the checkpoint stores it once and keeps the
    // src-hashpartitioning via LogicalRDD.
    val adj = (if (assumeDistinct) doubled else doubled.distinct())
      .repartition(shufflePartitions(edges), col("src"))
      .localCheckpoint(true)
    var labels = adj.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    // measured once (a cheap scan of the just-checkpointed blocks):
    // |labels| = |incident vertices|, constant across rounds — the
    // gate for broadcasting the per-round label side (see vertexSide)
    val nLabels = labels.count()
    var i = 0
    while (i < iters) {
      val counts = adj
        .join(vertexSide(
          labels.select(col("id").as("src"), col("label")), nLabels),
          Seq("src"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("c"))
      val next = counts.groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("dst").as("id"), (-col("m.nl")).as("new_label"))
      val merged = labels.join(vertexSide(next, nLabels), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("new_label"), col("label")).as("label"))
      // checkpoint every SECOND round (and the last): two propagation
      // rounds per materialized job — the q52 pointer-doubling cadence
      // applied here. Plans stay ≤ 2 rounds deep; job count halves.
      labels = if (i % 2 == 1 || i == iters - 1)
        merged.localCheckpoint(true) else merged
      i += 1
    }
    labels
  }

  /** The k-core: the maximal subgraph where every vertex has degree ≥ k,
    * found by iterative peeling — drop sub-k vertices, recompute
    * degrees, repeat to fixpoint. The fixpoint is unique, so the result
    * is deterministic regardless of peel order/parallelism. Each round
    * is one degree aggregate + two semi joins; the edge count rides the
    * checkpoint job via observe() (no separate probe job), and
    * convergence = no edge dropped. Returns the surviving vertex ids. */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 50): DataFrame = {
    var adj = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"),
        col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var prevEdges = -1L
    var curEdges = adj.count()
    var iter = 0
    while (curEdges != prevEdges && curEdges > 0 && iter < maxIter) {
      val keep = adj.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("v"))
      val obs = new org.apache.spark.sql.Observation(s"kcore_$iter")
      val pruned = adj
        .join(keep.select(col("v").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("v").as("dst")), Seq("dst"), "left_semi")
        .observe(obs, count(lit(1)).as("n_edges"))
        .localCheckpoint(true)
      prevEdges = curEdges
      curEdges = Option(obs.get("n_edges"))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      adj = pruned
      iter += 1
    }
    adj.select(col("src").as("id")).distinct()
  }

  /** Bounded-round k-core peeling — `kCore` with a STATIC round count
    * instead of the data-dependent convergence probe, the q82/q86
    * treatment that makes the recurrence replayable as chained DuckDB
    * CTEs (a data-dependent round count would make the oracle SQL's
    * shape input-dependent). Each round drops every vertex whose
    * current degree is < k and keeps only edges with both endpoints
    * surviving — pure set logic, so the result is deterministic under
    * any partitioning. With `rounds` ≥ the peel depth it IS the k-core
    * fixpoint (GraphSpec proves equality against `kCore` on the
    * fixture); fewer rounds give the partially-peeled subgraph, still
    * well-defined. Returns (id, deg): surviving vertices with their
    * degree in the surviving subgraph. Same per-round shape as kCore —
    * one degree aggregate + two semi joins, lineage truncated per
    * round — so the 100 TB story is kCore's. */
  def kCoreRounds(edges: DataFrame, k: Int, rounds: Int,
      assumeDistinct: Boolean = false): DataFrame = {
    val doubled = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"),
        col("id_a").as("dst")))
    var adj = (if (assumeDistinct) doubled else doubled.distinct())
      .localCheckpoint(true)
    var i = 0
    while (i < rounds) {
      val keep = adj.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("v"))
      adj = adj
        .join(keep.select(col("v").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("v").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint(true)
      i += 1
    }
    adj.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
  }

  /** Bounded-round multi-source BFS hop distance over an UNDIRECTED
    * edge list (id_a, id_b): each round expands the FRONTIER (nodes
    * first reached last round) one hop and anti-joins against the
    * already-settled set, so dist(v) = the exact hop distance for every
    * v within `rounds` hops of any seed — unreached nodes are absent,
    * not ∞ rows. Synchronous unweighted BFS is confluent (a node's
    * settle round is its hop distance regardless of expansion/partition
    * order), so the result is deterministic AND replayable by plain
    * SQL: the q179 oracle runs the equivalent min-plus relaxation
    * (dist_i(v) = min(dist_{i-1}(v), min over in-neighbors u of
    * dist_{i-1}(u)+1)) as chained DuckDB CTEs — frontier BFS and
    * min-plus agree round for round on unweighted graphs.
    *
    * Scale shape: the adjacency is doubled once, pre-partitioned on src
    * and cached (the pageRank edge-cache rationale — every round's
    * expansion joins on src); each round is ONE shuffle (the frontier
    * join + dst distinct) plus an anti join against the settled set,
    * and only the frontier — not the whole settled set — drives the
    * join, so per-round work tracks the frontier size, not the total
    * reach. Lineage: each frontier is localCheckpoint'd; the settled
    * set is a union of those materialized frames (leaf scans, no
    * recursive plan growth). `assumeDistinct` skips the dedup exchange
    * when the caller proves the doubled edge list duplicate-free
    * (bipartite disjoint key spaces, as in q165/q179). */
  /** Resource-allocation link prediction over a (node, nbr) incidence
    * list: candidate link (a, b) scores Σ_{shared nbr s} 1/deg(s) — the
    * RA index, the division-free cousin of Adamic–Adar (1/deg instead
    * of 1/log deg: no libm, so the score is EXACT in fixed point:
    * per-neighbor weight = floor(2^30/deg), summed as longs — the
    * pageRank arithmetic). Returns the top-k candidate pairs by
    * (ra_fixed DESC, id_a, id_b) — a strict total order, so the cut is
    * deterministic in any engine.
    *
    * Scale shape: pairs are generated PER SHARED NEIGHBOR (one
    * equi-join on nbr), never all-pairs; `degCap` drops super-nodes
    * before expansion — principled, not just defensive: a neighbor of
    * degree d contributes C(d,2) pairs each worth only 1/d, so hubs
    * cost quadratically while signalling ~nothing (the standard RA/AA
    * practice). With the cap, expansion is ≤ C(degCap, 2) rows per
    * neighbor and the result is top-k'd via TakeOrderedAndProject —
    * no global sort materializes. */
  def linkPredictRA(inc: DataFrame, degCap: Int = 64,
      topK: Int = 100): DataFrame = {
    val deg = inc.groupBy("nbr").agg(count(lit(1)).as("d"))
      .filter(col("d") >= 2 && col("d") <= degCap)
      .select(col("nbr"), ldiv(lit(Scale), col("d")).as("w"))
    inc.select(col("nbr"), col("node").as("id_a"))
      .join(deg, Seq("nbr")) // also semi-filters to capped neighbors
      .join(inc.select(col("nbr"), col("node").as("id_b")), Seq("nbr"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("w")).as("ra_fixed"), count(lit(1)).as("n_common"))
      .orderBy(col("ra_fixed").desc, col("id_a").asc, col("id_b").asc)
      .limit(topK)
  }

  def bfsRounds(edges: DataFrame, seeds: DataFrame, rounds: Int,
      assumeDistinct: Boolean = false): DataFrame = {
    val doubled = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"),
        col("id_a").as("dst")))
    // localCheckpoint, NOT persist (r16): see pageRank.
    val adj = (if (assumeDistinct) doubled else doubled.distinct())
      .repartition(shufflePartitions(edges), col("src"))
      .localCheckpoint(true)
    var dist = seeds.select(col("id")).distinct()
      .select(col("id"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var frontier = dist
    var i = 0
    while (i < rounds && !frontier.isEmpty) {
      val reached = frontier
        .join(adj, col("id") === col("src"))
        .select(col("dst").as("id")).distinct()
      val newly = reached.join(dist, Seq("id"), "left_anti")
        .select(col("id"), lit(i + 1L).as("dist"))
        .localCheckpoint(true)
      dist = dist.unionByName(newly)
      frontier = newly
      i += 1
    }
    dist
  }

  /** Bounded-round Bellman–Ford over an UNDIRECTED weighted edge list
    * (id_a, id_b, w) — the WEIGHTED sibling of bfsRounds: `rounds`
    * synchronous min-plus relaxations dist_i(v) = min(dist_{i-1}(v),
    * min over neighbors u of dist_{i-1}(u) + w(u,v)) from the seed set
    * at cost 0. After r rounds dist(v) is exactly the cheapest path of
    * ≤ r hops (the textbook Bellman–Ford invariant) — a deterministic,
    * partition-independent quantity (min and + over exact longs), so
    * the q183 oracle replays the identical recurrence as chained CTEs.
    * Unlike BFS, a settled node can improve in a later round (a longer
    * path may be cheaper), so every reached node — not a frontier —
    * relaxes each round. Unreached nodes are absent rows, not ∞.
    *
    * Scale shape: the doubled adjacency is min-deduped per (src, dst)
    * once (the cheapest parallel edge dominates any path under
    * min-plus), pre-partitioned on src and cached; each round is ONE
    * shuffle (the relax join + min aggregate), lineage truncated per
    * round. */
  /** Bounded-round TEMPORAL (time-respecting) reachability over a
    * DIRECTED edge list (src, dst, t): earliest-arrival relaxation
    * arr_i(v) = min(arr_{i-1}(v), min over edges (u,v) with
    * t ≥ arr_{i-1}(u) of t) — a path may only traverse edges whose
    * timestamps are NON-DECREASING, the defining constraint of
    * temporal graphs (an edge that fired before you arrived at u is
    * not usable; plain BFS over the same edges overstates reach).
    * Seeds start at `startT`. After r rounds arr(v) is the earliest
    * arrival over time-respecting paths of ≤ r hops — exact integer
    * min-plus, so deterministic under any partitioning and replayed
    * by the q186 oracle as chained CTEs. Unreached nodes are absent.
    *
    * Scale shape: identical to bellmanFordRounds — one relax shuffle
    * per round against the pre-partitioned cached edge list (the time
    * constraint is a join residual on the equi-join, not a range
    * join), lineage truncated per round. Parallel (src, dst) edges at
    * different times all stay: under the time constraint an earlier
    * edge is not dominated by a cheaper-looking later one. */
  def temporalReachRounds(edges: DataFrame, seeds: DataFrame,
      startT: Long, rounds: Int): DataFrame = {
    // localCheckpoint, NOT persist (r16): see pageRank.
    val adj = edges.select(col("src"), col("dst"), col("t"))
      .repartition(shufflePartitions(edges), col("src"))
      .localCheckpoint(true)
    var arr = seeds.select(col("id")).distinct()
      .select(col("id"), lit(startT).as("arr"))
      .localCheckpoint(true)
    var i = 0
    while (i < rounds) {
      val relaxed = arr.join(adj, col("id") === col("src"))
        .where(col("t") >= col("arr"))
        .select(col("dst").as("id"), col("t").as("arr"))
      arr = arr.unionByName(relaxed)
        .groupBy("id").agg(min(col("arr")).as("arr"))
        .localCheckpoint(true)
      i += 1
    }
    arr
  }

  /** Bounded-round HITS (Kleinberg hubs-and-authorities) over a
    * DIRECTED edge list (src, dst), in the pageRank fixed-point
    * discipline: scores are int64 scaled by 2^30, every round's
    * authority step a(v) = Σ_{u→v} h(u) and hub step h(u) = Σ_{u→v} a(v)
    * are exact long sums, and the L1 normalization x ← x·2^30 DIV Σx
    * is an integral division with the product carried in DECIMAL(38,0)
    * — so the result is bit-identical under any partitioning/merge
    * order and replayable as chained DuckDB CTEs with one scalar
    * subquery per normalization (the q237 oracle). Fixed `iters`
    * rounds (the q82/q165 bounded-round treatment — a convergence test
    * would make the oracle's shape input-dependent).
    *
    * Scale shape: the edge list is cached TWICE, pre-partitioned on
    * src and on dst — the authority step joins on src and the hub step
    * on dst, and a single partitioning would re-exchange the (large)
    * edge side every half-round; 2× edge storage buys zero per-round
    * edge shuffles, the pageRank edge-cache rationale applied to an
    * alternating iteration. Each normalization total rides the
    * half-round's checkpoint job via observe(). Bound: scores ≤ 2^30
    * after each normalization, so raw sums stay under 2^63 for graphs
    * with Σ-degree < 2^33 (~8B edges); the DECIMAL(38,0) product
    * covers the ·2^30 renormalization far beyond that.
    *
    * Returns (id, auth_fixed, hub_fixed), absent scores as 0. */
  def hits(edges: DataFrame, iters: Int = 2): DataFrame = {
    // localCheckpoint, NOT persist (r16): see pageRank. eD re-shuffles
    // the MATERIALIZED eS rows instead of re-deriving the distinct, so
    // the source is scanned once for both layouts.
    val e = edges.select(col("src"), col("dst")).distinct()
    val eS = e.repartition(shufflePartitions(edges), col("src"))
      .localCheckpoint(true)
    val eD = eS.repartition(shufflePartitions(edges), col("dst"))
      .localCheckpoint(true)

    // x·2^30 DIV total — SQL's IntegralDivide (exact truncating
    // division; all values nonnegative, so ≡ floor), the product in
    // DECIMAL(38,0) (x ≤ E·2^30 already uses most of int64; ·2^30
    // again needs 38 digits). NOT decimal `/` + cast: Spark's decimal
    // division ROUNDS to the result scale, which can cross an integer
    // boundary and diverge from the oracle's `//`.
    def norm(xCol: String, tot: Long): org.apache.spark.sql.Column =
      expr(s"CAST((CAST($xCol AS DECIMAL(38,0)) * ${Scale}L)" +
        s" DIV ${tot}L AS BIGINT)")

    var hubs = eS.select(col("src").as("id")).distinct()
      .select(col("id"), lit(Scale).as("h"))
      .localCheckpoint(true)
    var auths: DataFrame = null
    var i = 0
    while (i < iters) {
      val aObs = new org.apache.spark.sql.Observation(s"hits_a_$i")
      val araw = eS
        .join(hubs.select(col("id").as("src"), col("h")), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("h")).as("ar"))
        .observe(aObs, sum(col("ar")).as("tot"))
        .localCheckpoint(true)
      // empty/all-zero guard: DIV 0 would throw under ANSI; with no
      // mass every normalized score is 0 regardless of divisor
      val aTot = Option(aObs.get("tot")).map(_.asInstanceOf[Long])
        .filter(_ != 0L).getOrElse(1L)
      auths = araw.select(col("dst"), norm("ar", aTot).as("a"))
      val hObs = new org.apache.spark.sql.Observation(s"hits_h_$i")
      val hraw = eD
        .join(auths, Seq("dst"))
        .groupBy(col("src")).agg(sum(col("a")).as("hr"))
        .observe(hObs, sum(col("hr")).as("tot"))
        .localCheckpoint(true)
      val hTot = Option(hObs.get("tot")).map(_.asInstanceOf[Long])
        .filter(_ != 0L).getOrElse(1L)
      hubs = hraw.select(col("src").as("id"), norm("hr", hTot).as("h"))
      i += 1
    }
    val out = auths.select(col("dst").as("id"), col("a").as("auth_fixed"))
      .join(hubs.select(col("id"), col("h").as("hub_fixed")),
        Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("auth_fixed"), lit(0L)).as("auth_fixed"),
        coalesce(col("hub_fixed"), lit(0L)).as("hub_fixed"))
      .localCheckpoint(true)
    out
  }

  def bellmanFordRounds(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    val doubled = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"), col("w"))
      .unionByName(edges.select(col("id_b").as("src"),
        col("id_a").as("dst"), col("w")))
    // parallel edges: only the cheapest can ever matter under min-plus
    // localCheckpoint, NOT persist (r16): see pageRank.
    val adj = doubled.groupBy(col("src"), col("dst"))
      .agg(min(col("w")).as("w"))
      .repartition(shufflePartitions(edges), col("src"))
      .localCheckpoint(true)
    var dist = seeds.select(col("id")).distinct()
      .select(col("id"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var i = 0
    while (i < rounds) {
      val relaxed = dist.join(adj, col("id") === col("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("id").agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
      i += 1
    }
    dist
  }
}
