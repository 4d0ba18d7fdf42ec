package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Expr

/** Embedding similarity search over `array<float>` columns.
  *
  * Two tiers, per SURVEY.md §7 phase 6:
  *  - `bruteForceTopK`: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; O(|Q|·n) with no shuffle on the corpus
  *    side. Correctness baseline.
  *  - `lshTopK`: random-hyperplane (sign) LSH — corpus and queries get a
  *    b-bit bucket; the join runs on the bucket (+ optional multiprobe),
  *    collapsing the candidate set from n to n/2^b per query on
  *    average. This is the 100 TB path: bucket join shuffles
  *    candidates only.
  *
  * All arithmetic folds left-to-right in double precision via the
  * `aggregate`/`zip_with` higher-order functions — deterministic and
  * reproducible in any engine (float addition is not associative; a
  * fixed fold order is what makes the score hash-stable).
  */
object Similarity {

  /** Deterministic left-fold dot product of two float-array columns in
    * double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Native one-accumulator dot product (see [[graft.functions.DotProd]]).
    * For all-pairs scans: hoist each side's norm to a per-ROW column and
    * pay only the dot per PAIR — `dotNative(a,b) / (norm(a)·norm(b))` is
    * bit-identical to [[cosine]] (every fold unchanged). */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.functions.DotProd(
        org.apache.spark.sql.GraftSql.expression(a),
        org.apache.spark.sql.GraftSql.expression(b)))

  /** Cosine similarity — raw double. With a fixed fold order the value is
    * bit-identical in any engine, so it is safe as a ranking key; callers
    * truncate for display/hash stability. Evaluated by the native
    * one-pass CosineSim expression; `cosineHof` below is the executable
    * HOF specification it is asserted bit-identical against. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.functions.CosineSim(
        org.apache.spark.sql.GraftSql.expression(a),
        org.apache.spark.sql.GraftSql.expression(b)))

  private[graft] def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Fused ADC sum Σ_j lut_j[code_j] — one codegen'd expression (see
    * [[graft.functions.PqAdc]]); `adcChain` below is the element_at
    * formulation it is asserted bit-identical against (HashingSpec).
    * Codes are 0-based ints as produced by `cellOf`. */
  def adcNative(luts: Seq[Column], codes: Seq[Column]): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.functions.PqAdc(
        luts.map(org.apache.spark.sql.GraftSql.expression),
        codes.map(org.apache.spark.sql.GraftSql.expression)))

  private[graft] def adcChain(luts: Seq[Column], codes: Seq[Column]): Column =
    luts.zip(codes).map { case (l, c) => element_at(l, c + 1) }
      .reduce(_ + _)

  /** Exact top-k: for each query vector (small set — broadcast), rank the
    * full corpus by cosine. Ranking key includes the corpus id so ties
    * are deterministic. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qvec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col(vecCol)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane i,
    * dim j): a value in [-0.5, 0.5) derived from md5 — reproducible
    * everywhere, no RNG state. */
  private[graft] def planeComponent(i: Int, j: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane_${i}_$j".getBytes("UTF-8"))
      .take(7).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16).toDouble / Math.pow(2.0, 56)) - 0.5
  }

  /** Multi-table sign-LSH buckets: `tables` independent hash tables of
    * `bits` hyperplanes each; bucket_t bit i = 1 iff
    * dot(v, plane_{t·bits+i}) > 0. Returns array<long> of length
    * `tables`.
    *
    * Single-table sign-LSH has collision probability (1 − θ/π)^bits per
    * true neighbor — at the fixture's neighbor angles (~70°) and 6 bits
    * that is ~5%, i.e. near-zero recall. L independent tables lift
    * recall to 1 − (1 − p)^L (the standard LSH construction); the
    * corpus index grows by L rows per vector, which is the classic
    * space-for-recall trade.
    *
    * The hyperplanes are ONE array-of-arrays literal (data, not
    * expression nodes) and all loops are higher-order functions, so
    * plan size is O(1) in dim × bits × tables — a naive inlined-literal
    * tree at production sizes (768-dim × 64-bit) is ~50k nodes and
    * breaks codegen. Per-plane dots fold left-to-right in double,
    * identical to `dot`, so bucket ids are reproducible in any engine
    * (the DuckDB oracle recomputes them from the same md5-derived
    * planes). */
  def lshBuckets(vec: Column, dim: Int, bits: Int, tables: Int): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.functions.SignLshBuckets(
        org.apache.spark.sql.GraftSql.expression(vec), dim, bits, tables))

  /** Higher-order-function formulation of lshBuckets — kept as the
    * executable specification the native SignLshBuckets expression is
    * asserted bit-identical against (HashingSpec); the DuckDB oracle
    * independently recomputes the same construction in SQL. */
  private[graft] def lshBucketsHof(vec: Column, dim: Int, bits: Int,
      tables: Int): Column = {
    val planes: Seq[Seq[Double]] = (0 until tables * bits).map(gi =>
      (0 until dim).map(j => planeComponent(gi, j)))
    val planesLit = typedLit(planes)
    transform(sequence(lit(0), lit(tables - 1)), t =>
      // fold bits high→low with acc*2 + bit ≡ Σ bit_i · 2^i, in exact
      // integer arithmetic (shiftleft only takes a literal bit count)
      aggregate(
        transform(sequence(lit(bits - 1), lit(0), lit(-1)), i => {
          val d = aggregate(
            zip_with(vec, element_at(planesLit, t * lit(bits) + i + 1),
              (x, p) => x.cast("double") * p),
            lit(0.0), (acc, v) => acc + v)
          when(d > 0, lit(1L)).otherwise(lit(0L))
        }),
        lit(0L), (acc, v) => acc * lit(2L) + v))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    * generation (multi-table sign-LSH) + exact cosine verification
    * against a threshold. The near-dup regime is where sign-LSH shines:
    * cos ≥ 0.95 ⇒ per-bit collision ≥ 0.9, so a handful of tables
    * recovers essentially all true pairs — and a positively-scaled
    * duplicate lands in the SAME bucket in every table (signs are
    * scale-invariant), giving exact recall on rescaled copies. Shuffle
    * profile matches minhashCandidates: bucket-join, collision-bound. */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, bits: Int = 8,
      tables: Int = 8): DataFrame = {
    val buckets = lshBuckets(col(vecCol), dim, bits, tables)
    val b = corpus.select(col(idCol).as("vid"), posexplode(buckets))
      .toDF("vid", "tbl", "bucket")
    val pairs = b.toDF("id_a", "tbl", "bucket")
      .join(b.toDF("id_b", "tbl", "bucket"), Seq("tbl", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    pairs
      .join(corpus.select(col(idCol).as("id_a"), col(vecCol).as("va")),
        Seq("id_a"))
      .join(corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb")),
        Seq("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Driver-side L2 normalization with the SAME arithmetic the SQL
    * oracle uses (left-fold sum of squares → sqrt → per-element
    * divide), so a pre-normalized centroid literal is reproducible by
    * any engine. Assumes nonzero vectors (seeds are real embeddings;
    * a quantized mean of nonzero members cancelling to exactly zero
    * does not occur). */
  private def normalized(c: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(c.foldLeft(0.0)((a, v) => a + v * v))
    c.map(_ / n)
  }

  /** Per-cell assignment SCOREs: dot(vec, ĉ_i) against pre-normalized
    * centroids. Equal to cos(vec, c_i) · ‖vec‖ — a positive per-row
    * scaling, so the argmax/ordering over cells is IDENTICAL to cosine
    * while the per-row cost drops ~3× (no ‖vec‖ and no ‖c_i‖
    * recomputation per centroid). Evaluated by the native DotScores
    * expression (flat nlist×dim loop, matrix as data); the HOF
    * formulation below is the asserted spec. The oracle computes the
    * same score from the same normalized centroids. */
  private def scoreArrCent(centsHat: Seq[Seq[Double]])(vec: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.functions.DotScores(
        org.apache.spark.sql.GraftSql.expression(vec), centsHat))

  private[graft] def scoreArrCentHof(centsHat: Seq[Seq[Double]])(
      vec: Column): Column = {
    val centHatLit = typedLit(centsHat)
    transform(sequence(lit(0), lit(centsHat.length - 1)), i =>
      aggregate(
        zip_with(vec, element_at(centHatLit, i + 1),
          (x, p) => x.cast("double") * p),
        lit(0.0), (acc, v) => acc + v))
  }

  /** Nearest cell: index of the max score (first occurrence — ties
    * break to the smallest centroid id, mirroring the oracle's cid
    * ASC). */
  private def cellOf(centsHat: Seq[Seq[Double]])(vec: Column): Column =
    Expr.let(scoreArrCent(centsHat)(vec)) { a =>
      (array_position(a, array_max(a)) - 1).cast("int")
    }

  /** One Lloyd (k-means) refinement step over the current centroids,
    * executed distributed: map-only cell assignment, one groupBy over
    * (cell, dim), and a bounded nlist×dim collect (the coarse quantizer
    * lives driver-side, same as the bootstrap).
    *
    * The new centroid is the mean of 2^-20-QUANTIZED member values:
    * per (cell, dim) we sum floor(x·2^20) as exact integers — an
    * order-INDEPENDENT reduction (double mean is not: float addition
    * doesn't associate, so a shuffle-order-dependent mean could never
    * be reproduced by another engine) — then divide once in double.
    * Quantization error (≤2^-20 per element) is irrelevant to a coarse
    * quantizer; determinism is what makes q42's oracle hash-match. */
  private def lloydStep(corpus: DataFrame, vecCol: String,
      cents: Seq[Seq[Double]], nlist: Int): Seq[Seq[Double]] = {
    val centsHat = cents.map(normalized)
    // the (cell, vec) pair is exploded out of a single-element struct
    // array: selecting the cell expression as a SIBLING of posexplode
    // lets CollapseProject re-inline it ABOVE the generator, where it
    // re-runs once per exploded element (64× — this was 30s of a 39s
    // query); a generator's own input is evaluated once per input row
    val stats = corpus
      .select(explode(array(struct(
        cellOf(centsHat)(col(vecCol)).as("cell"),
        col(vecCol).as("v")))).as("e"))
      .select(col("e.cell").as("cell"), posexplode(col("e.v")))
      .groupBy("cell", "pos")
      .agg(sum(floor(col("col").cast("double") * lit(1048576.0)).cast("long"))
        .as("qsum"), count(lit(1)).as("n"))
      .collect()
    val byCell = stats.groupBy(_.getInt(0))
    (0 until nlist).map { c =>
      byCell.get(c) match {
        case Some(rows) => rows.sortBy(_.getInt(1))
          .map(r => (r.getLong(2).toDouble / r.getLong(3)) / 1048576.0).toSeq
        case None => cents(c) // empty cell keeps its seed
      }
    }
  }

  /** IVF (inverted-file) ANN top-k — the cell-partitioned alternative
    * to sign-LSH. Index build: `nlist` seed centroids = the lowest-id
    * vectors (deterministic init, reproducible by any engine) refined
    * by `refine` Lloyd iterations (distributed groupBy-mean, see
    * lloydStep) — actual k-means seeding, not just "first 16 vectors".
    * Each corpus vector is assigned to its nearest centroid by a pure
    * per-row expression (argmax over a centroid literal — map-only, no
    * shuffle); each query probes its `nprobe` nearest cells; exact
    * cosine re-ranks the union of probed cells.
    *
    * Scale shape: assignment cost is nlist×dim multiplications per row
    * with zero shuffle; the only shuffle is the candidate equi-join on
    * `cell`, which touches nprobe/nlist of the corpus per query. Cells
    * are disjoint (unlike LSH tables) so no candidate dedup is needed. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      refine: Int = 1): DataFrame = {
    val seeds: Seq[Seq[Double]] = corpus.filter(col(idCol) < nlist)
      .orderBy(col(idCol)).select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    // empty corpus → no index to build and a well-defined empty result
    // (top-k over nothing); returning it beats crashing in cellOf
    if (seeds.isEmpty)
      return queries.limit(0).select(col(idCol).as("query_id"),
        col(idCol).as("neighbor_id"),
        lit(0.0).as("cos"), lit(0).as("rank"))
    val centroids = (0 until refine)
      .foldLeft(seeds)((c, _) => lloydStep(corpus, vecCol, c, nlist))
    val centsHat = centroids.map(normalized)

    def cell(vec: Column): Column = cellOf(centsHat)(vec)

    // nprobe nearest cells: sort (−score, idx) structs, take the prefix
    // (score ordering ≡ cosine ordering, see scoreArrCent)
    def probeCells(vec: Column): Column =
      Expr.let(scoreArrCent(centsHat)(vec)) { a =>
        transform(
          slice(array_sort(zip_with(a, sequence(lit(0), lit(nlist - 1)),
            (c, i) => struct((-c).as("negcos"), i.as("idx")))),
            1, nprobe),
          s => s.getField("idx"))
      }

    val assigned = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("nvec"), cell(col(vecCol)).as("cell"))
    val probes = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qvec"),
      explode(probeCells(col(vecCol))).as("cell")))
    val scored = probes.join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Full k-means over an embedding corpus — `rounds` Lloyd iterations
    * from deterministic seeds (the k lowest-id vectors), reporting
    * per-cluster statistics: member count, mean cosine to the final
    * centroid (cohesion), and the first centroid coordinates.
    *
    * Every piece is oracle-reproducible by construction: seeds are
    * data-deterministic, each iteration's centroid is the mean of
    * 2^-20-QUANTIZED member values (exact integer sum → one double
    * divide; see lloydStep — a raw double mean is shuffle-order-
    * dependent and can never hash-match another engine), and the
    * cohesion metric is itself a quantized mean. DuckDB replays the
    * identical recurrence as `rounds` chained CTE blocks (the q82
    * PageRank proof pattern applied to Lloyd).
    *
    * Scale shape: per round, one map-only assignment pass (argmax over
    * a k×dim centroid literal — no shuffle, no join) + one
    * (cell, dim)-keyed aggregate with map-side partial combine; the
    * k×dim stats collect is bounded by the model size, not the data.
    * The corpus is scanned rounds+1 times — at 100 TB callers persist
    * it (here each scan is one parquet pass, cheaper than caching at
    * test scale). */
  def kmeansStats(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, coords: Int = 4): DataFrame = {
    val seeds: Seq[Seq[Double]] = corpus.filter(col(idCol) < k)
      .orderBy(col(idCol)).select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val coordCols = (0 until coords).map(i => s"c$i")
    // empty corpus → no seeds, no model; a well-typed empty result
    if (seeds.isEmpty)
      return corpus.limit(0).select(lit(0).as("cell") +: lit(0L).as("n") +:
        lit(0.0).as("mean_cos") +: coordCols.map(c => lit(0.0).as(c)): _*)
    val cents = (0 until rounds)
      .foldLeft(seeds)((c, _) => lloydStep(corpus, vecCol, c, k))
    val centsHat = cents.map(normalized)
    // final assignment: cell + score in ONE let-bound evaluation of the
    // k scores; cos = score / ‖v‖ (score = dot(v, ĉ), see scoreArrCent)
    val assigned = corpus.select(
      Expr.let(scoreArrCent(centsHat)(col(vecCol))) { a =>
        struct((array_position(a, array_max(a)) - 1).cast("int").as("cell"),
          array_max(a).as("score"))
      }.as("s"), col(vecCol).as("v"))
      .select(col("s.cell").as("cell"),
        (col("s.score") / norm(col("v"))).as("cos"))
    val stats = assigned.groupBy("cell").agg(
      count(lit(1)).as("n"),
      sum(floor(col("cos") * lit(1048576.0)).cast("long")).as("qc"))
    // centroid coords ride as a k×coords literal — map-only, no join
    val centLit = typedLit(cents.map(_.take(coords)))
    stats.select(
      col("cell") +: col("n") +:
        ((col("qc").cast("double") / col("n")) / lit(1048576.0))
          .as("mean_cos") +:
        coordCols.zipWithIndex.map { case (c, i) =>
          element_at(element_at(centLit, col("cell") + 1), i + 1).as(c)
        }: _*)
  }

  /** Product-quantization codebook statistics — the PQ compression
    * stage of an IVF-PQ index: the vector space splits into `m`
    * contiguous subspaces of dim/m dimensions, each with its OWN
    * k-codeword codebook trained independently (the whole point of PQ:
    * m small codebooks represent k^m composite cells at m·k·(dim/m)
    * floats of model). Each subspace's codebook is exactly a
    * kmeansStats run on the sliced subvectors — same deterministic
    * seeds (k lowest-id vectors' slices), same quantized-integer Lloyd
    * recurrence, so the q184 oracle replays m copies of the q109 CTE
    * chain over list slices. Spherical (cosine) assignment like every
    * clustering op here. Returns per (subspace, code):
    * member count, cohesion (mean cosine to the codeword), and leading
    * codeword coordinates.
    *
    * Scale shape: m independent map-only assignment passes + (code,
    * dim)-keyed aggregates; total model collect is m·k·(dim/m) = k·dim
    * values — the same bound as one full-space k-means. */
  def productQuantizeStats(corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int, k: Int, rounds: Int,
      coords: Int = 4): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into $m subspaces")
    val sublen = dim / m
    (0 until m).map { j =>
      val sub = corpus.select(col(idCol),
        slice(col(vecCol), j * sublen + 1, sublen).as("subv"))
      kmeansStats(sub, idCol, "subv", k, rounds, coords)
        .select(lit(j).as("subspace") +: col("cell").as("code") +:
          col("n") +: col("mean_cos") +:
          (0 until coords).map(i => col(s"c$i")): _*)
    }.reduce(_ unionByName _)
  }

  /** The trained (raw, UN-normalized) centroids of a quantized-Lloyd
    * run — the model [[kmeansStats]]/[[productQuantizeStats]] report
    * statistics OF; exposed so an index build can encode against it. */
  private def trainCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, rounds: Int): Seq[Seq[Double]] = {
    val seeds: Seq[Seq[Double]] = corpus.filter(col(idCol) < k)
      .orderBy(col(idCol)).select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    if (seeds.isEmpty) Seq.empty // empty corpus → no model to train
    else {
      // the deterministic seeding contract is ids 0..k-1 PRESENT (the
      // oracle replays `WHERE id < k`, so the rule cannot change); a
      // corpus with sparse low ids under-seeds and lloydStep would die
      // with a bare ArrayIndexOutOfBounds deep in the fold — fail with
      // the actual contract instead
      require(seeds.size == k,
        s"quantized-Lloyd seeding needs ids 0..${k - 1} present " +
          s"(found ${seeds.size} of $k) — train on the original " +
          "densely-indexed corpus, or remap ids before training")
      (0 until rounds).foldLeft(seeds)((c, _) =>
        lloydStep(corpus, vecCol, c, k))
    }
  }

  /** PQ ADC (asymmetric-distance) top-k — the QUERY path of the
    * IVF-PQ index whose codebooks [[productQuantizeStats]] trains
    * (same subspace split, same quantized-Lloyd recurrence, same
    * normalized codewords). Three stages:
    *
    *  1. ENCODE (map-only, once per corpus): each vector's m subspace
    *     slices are assigned their nearest codeword by the same
    *     argmax-dot rule as the trainer — the vector compresses to m
    *     small ints (the inverted-file payload; 8 codes × 4 subspaces
    *     here = 12 bits/vector vs 2048 for the raw floats).
    *  2. ADC SCAN: each query computes its m×k lookup table ONCE —
    *     lut_j[c] = dot(q_subspace_j, ĉ_{j,c}) (the per-subspace
    *     score array the trainer already uses, so the same native
    *     DotScores expression) — then scoring a corpus vector is m
    *     array lookups + m−1 adds, NO per-pair float loop: that
    *     per-pair cost collapse is the entire point of ADC, and why a
    *     PQ scan survives corpus sizes a brute-force dot cannot.
    *  3. RE-RANK: the `shortlist` best ADC candidates per query
    *     (ties → smaller id) get EXACT fixed-fold cosines (the q37
    *     path) and the top `k` emit.
    *
    * Scale shape: encoding is map-only against an m·k·(dim/m)-double
    * literal; the scan shuffles nothing (queries broadcast); only the
    * per-query top-`shortlist`/top-`k` windows partition by query_id.
    * Every double is fold-order-pinned, so an oracle can replay the
    * codebooks (q184's CTE chain), the codes, the LUTs, and the ADC
    * sums bit-for-bit. */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int, kCodes: Int, rounds: Int,
      shortlist: Int, k: Int): DataFrame = {
    val codebooks = pqTrain(corpus, idCol, vecCol, dim, m, kCodes, rounds)
    if (codebooks.exists(_.isEmpty)) // empty corpus → empty top-k
      return queries.limit(0).select(col(idCol).as("query_id"),
        col(idCol).as("neighbor_id"), lit(0.0).as("cos"),
        lit(0).as("rank"))
    pqAdcScan(pqEncode(corpus, idCol, vecCol, codebooks), queries,
      idCol, vecCol, codebooks, shortlist, k)
  }

  /** PQ codebook training alone — the INDEX-BUILD half of
    * [[pqAdcTopK]] (identical recurrence: per-subspace quantized-Lloyd
    * from the k lowest-id seeds, normalized). Split out so a
    * deployment can train + [[pqEncode]] once and serve many query
    * batches via [[pqAdcScan]] — the stored-index treatment the dedup
    * bucket index got; a per-query-batch retrain is pure waste and
    * made the ADC scan look slower than brute force (its wall was
    * ~2/3 index build). */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, kCodes: Int, rounds: Int): Seq[Seq[Seq[Double]]] = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into $m subspaces")
    val sublen = dim / m
    (0 until m).map { j =>
      val subDf = corpus.select(col(idCol),
        slice(col(vecCol), j * sublen + 1, sublen).as("subv"))
      trainCentroids(subDf, idCol, "subv", kCodes, rounds).map(normalized)
    }
  }

  /** Empty-codebook guard shared by the split-out encode/scan halves:
    * the monoliths ([[pqAdcTopK]]/[[ivfPqTopK]]) return an empty top-k
    * frame for an empty corpus, but the public halves receive the
    * TRAINED model as an argument — an empty one means the caller
    * trained on an empty corpus and skipped the monolith's guard, and
    * `codebooks.head.head.size` would otherwise surface as a bare
    * NoSuchElementException deep in plan construction. */
  private def requireTrained(codebooks: Seq[Seq[Seq[Double]]],
      op: String): Unit =
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      s"$op needs non-empty trained codebooks (pqTrain on an empty " +
        "corpus yields empty ones — guard the empty corpus at the " +
        "caller as pqAdcTopK does)")

  /** Map-only PQ encoding of the corpus against trained codebooks:
    * (neighbor_id, nvec, code0..code{m-1}) — the frame a deployment
    * stores as its PQ index (plus nvec for the exact re-rank; a
    * footprint-minimal variant would store codes only and join vectors
    * back for the shortlist). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    requireTrained(codebooks, "pqEncode")
    val m = codebooks.size
    val sublen = codebooks.head.head.size
    val codeCols = (0 until m).map(j =>
      cellOf(codebooks(j))(slice(col(vecCol), j * sublen + 1, sublen))
        .as(s"code$j"))
    corpus.select(
      col(idCol).as("neighbor_id") +: col(vecCol).as("nvec") +: codeCols: _*)
  }

  /** The per-query-batch SCAN half of [[pqAdcTopK]]: LUT build
    * (query-side, m·kCodes dots per query), fused-ADC score of every
    * encoded row ([[adcNative]]), per-query shortlist cut, exact
    * cosine re-rank. Bit-identical composition with
    * [[pqTrain]]/[[pqEncode]] to the monolithic [[pqAdcTopK]]
    * (same expressions in the same order). */
  def pqAdcScan(encoded: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, codebooks: Seq[Seq[Seq[Double]]],
      shortlist: Int, k: Int): DataFrame = {
    requireTrained(codebooks, "pqAdcScan")
    val m = codebooks.size
    val sublen = codebooks.head.head.size
    val lutCols = (0 until m).map(j =>
      scoreArrCent(codebooks(j))(
        slice(col(vecCol), j * sublen + 1, sublen)).as(s"lut$j"))
    val q = broadcast(queries.select(
      col(idCol).as("query_id") +: col(vecCol).as("qvec") +: lutCols: _*))
    val scored = q.crossJoin(encoded)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", adcNative(
        (0 until m).map(j => col(s"lut$j")),
        (0 until m).map(j => col(s"code$j"))))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    val short = scored.withColumn("srank", row_number().over(wAdc))
      .filter(col("srank") <= shortlist)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    short.withColumn("cos", cosine(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Full IVF-PQ search — the composition the two halves exist for:
    * [[ivfTopK]]'s coarse quantizer restricts WHICH candidates are
    * scored (each query probes its `nprobe` nearest of `nlist` cells;
    * the cell equi-join touches ~nprobe/nlist of the corpus) and
    * [[pqAdcTopK]]'s product quantizer restricts HOW MUCH each
    * candidate costs (m LUT lookups + m−1 adds — no per-pair float
    * loop). Same deterministic training recurrences as q42/q184, same
    * fold-order-pinned doubles, so the whole index — coarse cells, PQ
    * codes, LUTs, ADC sums, both top-k cuts — replays in an oracle.
    * Exact cosine re-ranks the `shortlist` ADC survivors.
    *
    * Scale shape: everything before the cell join is map-only against
    * driver-trained literals (nlist·dim + k·dim doubles of model);
    * the join shuffles candidates only; the per-query windows are the
    * standard top-k tail. This is the 100 TB ANN serving plan: prune
    * by cell, scan by code, verify exactly on a constant-size set. */
  /** Scale-aware ADC shortlist depth for [[ivfPqTopK]]. A FIXED
    * shortlist decays with corpus growth: the ADC score mis-ranks a
    * roughly constant fraction of the candidates it orders, so the
    * number of true top-k members pushed below a fixed cut grows
    * linearly with the candidate volume nC·nprobe/nlist — recall@10
    * measured 0.950 at 50k vectors but 0.835 at 200k with shortlist
    * pinned at 50 (ProbeAnn, r8). Holding the shortlist at a constant
    * FRACTION of the candidate volume holds recall: 1/256 reproduces
    * the proven 50k operating point (12.5k candidates/query → fraction
    * 49, so the 5k=50 floor binds — the floor is what's returned at
    * ≤51.2k candidates; above that the fraction takes over) and the
    * floor keeps small corpora at the exact-re-rank-everything end.
    * The shortlist only multiplies the exact re-rank (k·dim flops per
    * row on a per-query top-`shortlist` set) — the ADC scan, which
    * dominates, is untouched — so the depth is cheap to scale. */
  def ivfPqShortlist(corpusSize: Long, nlist: Int, nprobe: Int,
      k: Int): Int = {
    val candidates = corpusSize.toDouble * nprobe / nlist
    math.max(5 * k, math.ceil(candidates / 256).toInt)
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int, kCodes: Int, rounds: Int,
      nlist: Int, nprobe: Int, shortlist: Int, k: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into $m subspaces")
    val coarse = trainCoarse(corpus, idCol, vecCol, nlist, rounds)
    val codebooks = pqTrain(corpus, idCol, vecCol, dim, m, kCodes, rounds)
    if (coarse.isEmpty || codebooks.exists(_.isEmpty))
      return queries.limit(0).select(col(idCol).as("query_id"),
        col(idCol).as("neighbor_id"), lit(0.0).as("cos"),
        lit(0).as("rank"))
    ivfPqScan(ivfPqEncode(corpus, idCol, vecCol, coarse, codebooks),
      queries, idCol, vecCol, coarse, codebooks, nprobe, shortlist, k)
  }

  /** The coarse quantizer's trained, NORMALIZED centroids — the
    * index-build half of [[ivfTopK]]/[[ivfPqTopK]]'s cell structure,
    * public so a deployment trains once and serves many batches via
    * [[ivfPqEncode]]/[[ivfPqScan]]. */
  def trainCoarse(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, rounds: Int): Seq[Seq[Double]] =
    trainCentroids(corpus, idCol, vecCol, nlist, rounds).map(normalized)

  /** Map-only IVF-PQ encoding: [[pqEncode]]'s frame plus the coarse
    * `cell` assignment — the stored serving index of [[ivfPqTopK]]
    * (write partitioned/bucketed by `cell` and the per-query cell join
    * prunes at the file level, the [[graft.operators.Dedup.bucketIndex]]
    * treatment). */
  def ivfPqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      coarse: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    requireTrained(codebooks, "ivfPqEncode")
    require(coarse.nonEmpty, "ivfPqEncode needs a non-empty coarse " +
      "quantizer (training on an empty corpus yields none — guard the " +
      "empty corpus at the caller as ivfPqTopK does)")
    val m = codebooks.size
    val sublen = codebooks.head.head.size
    val codeCols = (0 until m).map(j =>
      cellOf(codebooks(j))(slice(col(vecCol), j * sublen + 1, sublen))
        .as(s"code$j"))
    corpus.select(
      Seq(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
        cellOf(coarse)(col(vecCol)).as("cell")) ++ codeCols: _*)
  }

  /** The `nprobe` nearest coarse cells per vector (cos desc, lower
    * cell id on ties) — the query-side cell expansion shared by
    * [[ivfPqScan]] and the touched-cell collection of
    * [[ivfPqScanStored]]'s partition pruning. */
  private def probeCells(coarse: Seq[Seq[Double]], nprobe: Int)(
      vec: Column): Column = {
    val nlist = coarse.size
    Expr.let(scoreArrCent(coarse)(vec)) { a =>
      transform(
        slice(array_sort(zip_with(a, sequence(lit(0), lit(nlist - 1)),
          (c, i) => struct((-c).as("negcos"), i.as("idx")))),
          1, nprobe),
        s => s.getField("idx"))
    }
  }

  /** The per-query-batch half of [[ivfPqTopK]] against a pre-built
    * [[ivfPqEncode]] index: probe-cell expansion, cell equi-join,
    * fused-ADC score, shortlist cut, exact re-rank — bit-identical
    * composition to the monolith (asserted in DedupSimilaritySpec).
    *
    * Hot-cell skew (r9 verdict item 4), measured rather than assumed:
    * the cell join BROADCASTS the query batch (deliberate — a serving
    * batch is model-sized by contract; split oversized batches into
    * sub-batches rather than lifting the hint), so the encoded corpus
    * is never hash-partitioned by cell — each scan task streams its
    * parquet split map-side whatever cell it holds, and a hot cell
    * parallelizes by FILE SPLIT (`maxPartitionBytes`), not by shuffle
    * key. Downstream, Spark inserts a partial WindowGroupLimit before
    * the per-query shortlist window, capping shuffle rows at
    * `shortlist` per (query, input partition). Both facts are pinned
    * in PlanSpec; ProbeAnn prints the per-cell histogram so a corpus
    * whose skew outgrows this analysis is visible. The residual skew
    * surface is cell-IMBALANCED candidate COUNTS inflating one
    * query's window — bounded by that query's probed-cell volume, not
    * by any single cell. Intra-cell SELF-joins ([[semanticDedup]])
    * are the family where a hot cell concentrates in one partition —
    * see that scaladoc's salting note. */
  def ivfPqScan(encoded: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, coarse: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], nprobe: Int,
      shortlist: Int, k: Int): DataFrame = {
    requireTrained(codebooks, "ivfPqScan")
    require(coarse.nonEmpty, "ivfPqScan needs a non-empty coarse " +
      "quantizer (training on an empty corpus yields none — guard the " +
      "empty corpus at the caller as ivfPqTopK does)")
    val m = codebooks.size
    val sublen = codebooks.head.head.size
    def probeCellsArr(vec: Column): Column = probeCells(coarse, nprobe)(vec)
    val lutCols = (0 until m).map(j =>
      scoreArrCent(codebooks(j))(
        slice(col(vecCol), j * sublen + 1, sublen)).as(s"lut$j"))
    val q = broadcast(queries.select(
      Seq(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        explode(probeCellsArr(col(vecCol))).as("cell")) ++ lutCols: _*))
    val scored = q.join(encoded, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", adcNative(
        (0 until m).map(j => col(s"lut$j")),
        (0 until m).map(j => col(s"code$j"))))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    val short = scored.withColumn("srank", row_number().over(wAdc))
      .filter(col("srank") <= shortlist)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    short.withColumn("cos", cosine(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Builds and STORES the IVF-PQ serving index — the deployment form
    * [[ivfPqEncode]]'s scaladoc promised (r9 verdict item 1), the
    * build-state-once/consume-increments design the reference's whole
    * ingest loop is shaped around (ref `ingestion/ingestion.py:32-96`):
    * the
    * encoded corpus written `partitionBy("cell")` (each coarse cell is
    * a directory; a query batch's probed cells prune at the FILE
    * level, so scan I/O tracks nprobe/nlist, not corpus size — the
    * [[graft.operators.Dedup.writeBucketIndex]] treatment) plus a
    * `_graft_index.json` sidecar pinning the trained model (coarse
    * centroids + PQ codebooks, exact shortest-repr doubles) and its
    * parameters. [[ivfPqScanStored]] reads the model from the sidecar
    * — never from the caller — because a scan against a different
    * model than the codes were encoded with returns silently wrong
    * neighbors, not an error.
    *
    * Scale shape: one training pass (bounded-model collects only), one
    * map-only encode, one partitioned write. At 100 TB the index is
    * built once and probed per batch forever; a per-process re-encode
    * (the in-memory split's implicit cost) re-scans the corpus every
    * restart. */
  def writeIvfPqIndex(corpus: DataFrame, path: String, idCol: String,
      vecCol: String, dim: Int, m: Int, kCodes: Int, rounds: Int,
      nlist: Int): Unit = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into $m subspaces")
    val coarse = trainCoarse(corpus, idCol, vecCol, nlist, rounds)
    val codebooks = pqTrain(corpus, idCol, vecCol, dim, m, kCodes, rounds)
    require(coarse.nonEmpty && codebooks.forall(_.nonEmpty),
      "writeIvfPqIndex trained an empty model — the corpus is empty; " +
        "an empty serving index is a deployment error, not a frame")
    ivfPqEncode(corpus, idCol, vecCol, coarse, codebooks)
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    // corpus size feeds ivfPqShortlist at scan time; count the WRITTEN
    // table from its footer metadata (one walk + tail reads — never a
    // second data scan, and no task-per-file count job)
    val n = IndexCompact.footerRowTotal(corpus.sparkSession, path)
    val meta = graft.config.Sidecar.newNode()
    meta.put("dim", dim)
    meta.put("m", m)
    meta.put("kCodes", kCodes)
    meta.put("rounds", rounds)
    meta.put("nlist", nlist)
    meta.put("count", n)
    graft.config.Sidecar.putDoubles2(meta, "coarse", coarse)
    graft.config.Sidecar.putDoubles3(meta, "codebooks", codebooks)
    graft.config.Sidecar.write(corpus.sparkSession, path, meta)
  }

  /** Appends new vectors to a STORED [[writeIvfPqIndex]] table — the
    * index-maintenance half of the ANN serving loop. The batch is
    * encoded with the FROZEN model the sidecar pins (coarse centroids
    * + PQ codebooks trained at build time — encoding a batch with a
    * retrained model while old codes stay would corrupt every ADC
    * comparison, the same hazard class the sidecar exists for), so
    * append-then-scan ≡ scanning an index encoded over old ∪ new with
    * the ORIGINAL model (asserted in DedupSimilaritySpec). Model
    * staleness is inherent to IVF-PQ appends: cell boundaries and
    * codewords reflect the build-time distribution; retrain cadence
    * (rebuild when the appended fraction grows large) is a deployment
    * decision, not this operator's. Cost ∝ |batch|: map-only encode +
    * append into the probed cell dirs; the sidecar's `count` is
    * updated so the derived shortlist keeps tracking the true corpus
    * size. */
  def appendToIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, newCorpus: DataFrame, idCol: String,
      vecCol: String): Unit = {
    val meta = graft.config.Sidecar.read(spark, path,
      "Similarity.writeIvfPqIndex")
    val coarse = graft.config.Sidecar.doubles2(meta, "coarse")
    val codebooks = graft.config.Sidecar.doubles3(meta, "codebooks")
    // pin the batch so the count and the write see the same rows even
    // if the caller's frame is non-deterministic
    val batch = newCorpus.localCheckpoint(false)
    val batchCount = batch.count()
    // intent marker: a crash between the parquet append and the sidecar
    // count update leaves NO swap leftovers, so [[recoverIvfPqIndex]]
    // would otherwise see a healthy tree and silently keep the
    // understated count forever (shortlist sizing drifts low — r11
    // ADVICE). The marker brackets the non-atomic append+repin pair;
    // recovery finding one repins by footer recount regardless of swap
    // state. Underscore-prefixed ⇒ parquet readers ignore it.
    val intentP = new org.apache.hadoop.fs.Path(path, AppendIntentMarker)
    val fs = intentP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a LEFTOVER marker means a prior append crashed mid-write and
    // nothing has recovered yet; overwriting it here would adopt the
    // stale sidecar count as the arithmetic base and understate the
    // corpus forever (the crashed batch's partial rows are on disk but
    // uncounted — the exact window the marker exists to close, and the
    // most likely post-crash path is precisely a retried append, not a
    // maintenance window; r12 ADVICE). Recover FIRST: the footer
    // recount repins `count` to ground truth, then this append's
    // arithmetic is exact again.
    if (fs.exists(intentP)) {
      recoverIvfPqIndex(spark, path): Unit
      // re-read the repinned sidecar — `meta` above holds the stale count
      return appendToIvfPqIndex(spark, path, batch, idCol, vecCol)
    }
    fs.create(intentP, true).close()
    ivfPqEncode(batch, idCol, vecCol, coarse, codebooks)
      .write.mode("append").partitionBy("cell").parquet(path)
    // refresh the pinned corpus count (drives ivfPqShortlist at scan
    // time) by ARITHMETIC, not a recount: encode is 1:1 with batch
    // rows, and a footer recount would re-list every cell dir —
    // corpus-scale metadata I/O on a path whose contract is cost ∝ the
    // append batch (the delete path's own argument, r10 verdict item 2;
    // build/append/delete all maintain `count` through the same
    // sidecar, so the arithmetic is exact)
    val n = graft.config.Sidecar.long(meta, "count") + batchCount
    val updated = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    updated.put("count", n)
    graft.config.Sidecar.write(spark, path, updated)
    require(fs.delete(intentP, false) || !fs.exists(intentP),
      s"append intent-marker cleanup failed: $intentP — run recover")
  }

  /** See [[appendToIvfPqIndex]] — present on disk only while an append
    * is between its parquet write and its sidecar count update. */
  private[graft] val AppendIntentMarker = "_graft_append_intent"

  /** Crash-recovery fsck for a stored [[writeIvfPqIndex]] table — see
    * [[IndexCompact.recover]]: rolls a crashed compaction/deletion swap
    * forward (committed temp present) or back (uncommitted), restores
    * anything stranded aside, and is idempotent. Run it at the start
    * of a maintenance window (compact/delete already self-heal) or
    * after a known crash.
    *
    * If recovery changed anything, the sidecar's pinned corpus `count`
    * is REPINNED by a footer recount: a crash can land between the
    * swap and the family wrapper's count arithmetic
    * ([[deleteFromIvfPqIndex]] updates the sidecar only after
    * [[IndexCompact.deleteMatchingChecked]] returns), leaving the
    * count stale. The recount is corpus-scale metadata I/O
    * ([[IndexCompact.footerRowTotal]]: one parallel walk + footer tail
    * reads, never data pages or a task-per-file count job) — more than
    * the per-batch maintenance paths pay, but recovery is the rare
    * post-crash path, where exactness beats the one-time metadata
    * cost.
    *
    * A crashed APPEND leaves no swap leftovers at all — only the
    * [[AppendIntentMarker]] [[appendToIvfPqIndex]] writes before its
    * parquet append and removes after its sidecar update. Recovery
    * finding the marker repins the count by recount (the appended rows
    * ARE on disk or aren't; the footer is ground truth either way) and
    * clears it — without this the understated count would persist
    * silently across every later append (r11 ADVICE). Returns the
    * action log (empty = healthy). */
  def recoverIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[String] = {
    val swapActions = IndexCompact.recover(spark, path)
    val intentP = new org.apache.hadoop.fs.Path(path, AppendIntentMarker)
    val fs = intentP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val intent = fs.exists(intentP)
    val actions =
      if (intent) swapActions :+ "found interrupted-append intent marker"
      else swapActions
    if (intent) require(fs.delete(intentP, false),
      s"intent-marker removal failed: $intentP")
    if (actions.nonEmpty) {
      val meta = graft.config.Sidecar.read(spark, path,
        "Similarity.writeIvfPqIndex")
      val n = IndexCompact.footerRowTotal(spark, path)
      val updated = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      updated.put("count", n)
      graft.config.Sidecar.write(spark, path, updated)
      actions :+ s"repinned sidecar count = $n after recovery"
    } else actions
  }

  /** Folds the per-append file fragments back to one file per cell
    * directory (see [[IndexCompact]]) — layout only; the pinned model
    * sidecar (incl. the append-maintained corpus count) is untouched.
    * Scan-identity asserted in DedupSimilaritySpec. Returns
    * (filesBefore, filesAfter). */
  def compactIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (Long, Long) =
    IndexCompact.compact(spark, path, "Similarity.writeIvfPqIndex")

  /** Deletes vectors from a STORED [[writeIvfPqIndex]] table — the
    * takedown/opt-out step of the ANN serving lifecycle. Each vector
    * lives in exactly ONE cell directory, so only the deleted ids'
    * cells are rewritten ([[IndexCompact.deleteMatching]] over the
    * encoded frame's `neighbor_id`); the trained model stays FROZEN —
    * deleting rows can't invalidate codes the way retraining would,
    * only leave the cell boundaries reflecting a stale distribution
    * (the same staleness contract as [[appendToIvfPqIndex]]; the
    * [[coarseDriftStats]] report is the rebuild trigger either way). The
    * sidecar's `count` IS refreshed so the derived shortlist keeps
    * tracking the true corpus size. Delete-then-scan ≡
    * frozen-model-scan-over-remaining row-identity is asserted in
    * DedupSimilaritySpec. Returns (rowsDeleted, dirsRewritten).
    * `evidence` commits the compliance line inside the swap protocol —
    * see [[graft.operators.Dedup.deleteFromBucketIndex]], the contract
    * is shared. */
  def deleteFromIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, deleteIds: DataFrame,
      evidence: Option[graft.sinks.ComplianceLog.Key] = None): (Long, Long) = {
    val meta = graft.config.Sidecar.read(spark, path,
      "Similarity.writeIvfPqIndex")
    val res = IndexCompact.deleteMatchingChecked(spark, path,
      "neighbor_id", deleteIds, evidence)
    if (res._1 > 0) {
      // each vector is exactly one encoded row, so the delta IS the
      // new count — no recount job (a footer recount would re-list
      // every cell dir, corpus-scale metadata I/O on a path whose
      // contract is cost ∝ the delete batch). Build/append maintain
      // `count` through the same sidecar, so the arithmetic is exact.
      val n = math.max(0L,
        graft.config.Sidecar.long(meta, "count") - res._1)
      val updated = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      updated.put("count", n)
      graft.config.Sidecar.write(spark, path, updated)
    }
    res
  }

  /** Per-query-batch scan against a STORED [[writeIvfPqIndex]] table:
    * reads the trained model from the sidecar (a bare parquet dir is
    * REFUSED — same silent-wrong-results rationale as
    * [[graft.operators.Dedup.incrementalCandidatesStored]]), collects
    * the batch's touched cell set (≤ nlist ints — model-size, not
    * data), prunes the index read to those cells (partition filter →
    * file-level pruning), and runs the standard [[ivfPqScan]] tail.
    * Row-identical to the in-memory monolith by construction: the
    * per-(query, cell) join pairs are unchanged by pruning to the
    * batch's cell UNION, and floats/codes round-trip parquet exactly.
    *
    * `shortlist` ≤ 0 derives the scale-aware depth from the sidecar's
    * corpus count via [[ivfPqShortlist]] — the stored index knows its
    * own size, so the caller doesn't have to. */
  def ivfPqScanStored(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, idCol: String, vecCol: String,
      nprobe: Int, k: Int, shortlist: Int = 0): DataFrame = {
    val meta = graft.config.Sidecar.read(spark, path,
      "Similarity.writeIvfPqIndex")
    val nlist = graft.config.Sidecar.int(meta, "nlist")
    val count = graft.config.Sidecar.long(meta, "count")
    val coarse = graft.config.Sidecar.doubles2(meta, "coarse")
    val codebooks = graft.config.Sidecar.doubles3(meta, "codebooks")
    require(coarse.size == nlist,
      s"sidecar coarse model has ${coarse.size} centroids, nlist=$nlist")
    require(nprobe >= 1 && nprobe <= nlist,
      s"nprobe $nprobe out of range for nlist=$nlist")
    // a fully-taken-down index (every cell dir deleted) is a valid
    // state with zero neighbors — not a readable parquet dir
    if (!IndexCompact.hasPartDirs(spark, path))
      return queries.limit(0).select(col(idCol).as("query_id"),
        col(idCol).as("neighbor_id"), lit(0.0).as("cos"),
        lit(0).as("rank"))
    val sl = if (shortlist > 0) shortlist
      else ivfPqShortlist(count, nlist, nprobe, k)
    val touched = queries
      .select(explode(probeCells(coarse, nprobe)(col(vecCol))).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq // ≤ nlist values
    val encoded = spark.read.parquet(path)
      .where(col("cell").isin(touched.map(Int.box): _*))
    ivfPqScan(encoded, queries, idCol, vecCol, coarse, codebooks,
      nprobe, sl, k)
  }

  /** The touched cell set a query batch probes against a stored index
    * — the same computation [[ivfPqScanStored]] prunes with, exposed
    * package-private so ProbeAnn can measure file-level pruning
    * (files under probed cell dirs vs total) without duplicating the
    * probe-cell expression. */
  private[graft] def storedProbedCells(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, vecCol: String, nprobe: Int): Seq[Int] = {
    val meta = graft.config.Sidecar.read(spark, path,
      "Similarity.writeIvfPqIndex")
    val coarse = graft.config.Sidecar.doubles2(meta, "coarse")
    queries
      .select(explode(probeCells(coarse, nprobe)(col(vecCol))).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  /** ADMISSION CONTROL for the stored-index ANN scan — the ops gate
    * that runs BEFORE [[ivfPqScanStored]], the IVF-PQ sibling of
    * [[graft.operators.Dedup.probeAdmission]] (r11 verdict item 5):
    * per query, the number of encoded rows its scan would read — the
    * EXACT per-query scan volume, the sum of the stored index's cell
    * sizes over the query's own nprobe probe cells under the frozen
    * sidecar model (the same assignment expression the scan prunes
    * with) — plus the admit/quarantine flag against a row budget. A
    * query batch landing in a crawl-duplicated hot cell, or an nprobe
    * set too high for the index's size, is exactly the scan that
    * degenerates toward a full read at 100 TB; this surfaces it BEFORE
    * the ADC join runs.
    *
    * I/O shape: strictly LESS than the scan it gates — cell sizes come
    * from a zero-data-column count over ONLY the batch's touched cell
    * directories (partition-pruned footer counts; the scan itself
    * reads codes + vectors from those same dirs). Returns
    * (query_id, est_rows, admit); a fully-taken-down index admits
    * everything at volume 0. */
  def scanAdmission(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, idCol: String, vecCol: String,
      nprobe: Int, budget: Long): DataFrame = {
    val meta = graft.config.Sidecar.read(spark, path,
      "Similarity.writeIvfPqIndex")
    val nlist = graft.config.Sidecar.int(meta, "nlist")
    val coarse = graft.config.Sidecar.doubles2(meta, "coarse")
    require(nprobe >= 1 && nprobe <= nlist,
      s"nprobe $nprobe out of range for nlist=$nlist")
    val qc = queries.select(col(idCol).as("query_id"),
      explode(probeCells(coarse, nprobe)(col(vecCol))).as("cell"))
    if (!IndexCompact.hasPartDirs(spark, path))
      return queries.select(col(idCol).as("query_id"),
        lit(0L).as("est_rows"), lit(true).as("admit"))
    val touched = qc.select(col("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq // ≤ nlist values
    val sizes = spark.read.parquet(path)
      .where(col("cell").isin(touched.map(Int.box): _*))
      .groupBy(col("cell")).agg(count(lit(1)).as("csize"))
    qc.join(sizes, Seq("cell"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("csize"), lit(0L))).as("est_rows"))
      .withColumn("admit", col("est_rows") <= lit(budget))
  }

  /** Model-drift report — the RETRAIN TRIGGER for an append-maintained
    * ANN index ([[appendToIvfPqIndex]] freezes the build-time model;
    * this measures what that freeze costs): train the coarse quantizer
    * on the BUILD slice, assign BOTH slices under the frozen model,
    * and report per cell how much worse the appended vectors fit
    * (mean cosine to their assigned centroid, old vs new, fixed-point
    * exact like [[kmeansStats]]). A drift near zero means the frozen
    * cells still describe the incoming distribution; a persistently
    * positive drift (new vectors sit farther from every centroid) is
    * the signal to rebuild with [[writeIvfPqIndex]].
    *
    * Scale shape: training is the usual bounded-model collect; both
    * assignments are map-only against the nlist×dim literal; ONE
    * map-side-combinable aggregate (≤ nlist rows out). */
  def coarseDriftStats(buildCorpus: DataFrame, appended: DataFrame,
      idCol: String, vecCol: String, nlist: Int,
      rounds: Int): DataFrame = {
    val coarse = trainCoarse(buildCorpus, idCol, vecCol, nlist, rounds)
    require(coarse.nonEmpty,
      "coarseDriftStats needs a non-empty build corpus to train on")
    def assigned(df: DataFrame, isNew: Boolean): DataFrame = df.select(
      Expr.let(scoreArrCent(coarse)(col(vecCol))) { a =>
        struct((array_position(a, array_max(a)) - 1).cast("int")
          .as("cell"), array_max(a).as("score"))
      }.as("s"), col(vecCol).as("v"))
      .select(col("s.cell").as("cell"),
        (col("s.score") / norm(col("v"))).as("cos"),
        lit(isNew).as("is_new"))
    val q20 = 1048576.0 // 2^20 fixed point — order-independent sums
    assigned(buildCorpus, isNew = false)
      .unionByName(assigned(appended, isNew = true))
      .groupBy(col("cell"))
      .agg(
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_old"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
        sum(when(!col("is_new"),
          floor(col("cos") * lit(q20)).cast("long")).otherwise(0L))
          .as("q_old"),
        sum(when(col("is_new"),
          floor(col("cos") * lit(q20)).cast("long")).otherwise(0L))
          .as("q_new"))
      .select(col("cell"), col("n_old"), col("n_new"),
        when(col("n_old") > 0,
          (col("q_old").cast("double") / col("n_old")) / lit(q20))
          .as("mean_cos_old"),
        when(col("n_new") > 0,
          (col("q_new").cast("double") / col("n_new")) / lit(q20))
          .as("mean_cos_new"),
        when(col("n_old") > 0 && col("n_new") > 0,
          ((col("q_old").cast("double") / col("n_old")) -
            (col("q_new").cast("double") / col("n_new"))) / lit(q20))
          .as("drift"))
  }

  /** SemDeDup-style semantic deduplication: cluster the corpus with
    * `rounds` Lloyd iterations from deterministic seeds (the k
    * lowest-id vectors — exactly kmeansStats' recurrence, so the q180
    * oracle replays it as the same chained CTEs), then WITHIN each
    * cluster drop every member whose cosine to a LOWER-id member is ≥
    * `threshold` (the greedy keep-first rule — deterministic, no
    * connected components needed). Returns the per-cluster report
    * (cell, n, n_dropped, n_kept).
    *
    * Scale shape: clustering is the kmeansStats shape (map-only
    * assignment per round + a (cell,dim) aggregate; the only collect is
    * the k×dim model). The near-dup pass self-joins WITHIN cells only —
    * never all-pairs: SemDeDup's design point is k chosen so cells stay
    * small (n/k members ⇒ Σ C(n/k, 2) ≈ n²/2k pairs; k scales with the
    * corpus). For 100 TB runs the intra-cell join is an equi-join on
    * cell, so each cell's pairs form within one shuffle partition, and
    * a skewed giant cell is exactly the q60-style salting case. The
    * threshold compare uses the same fixed-fold cosine both engines
    * reproduce bit-identically (see `cosine`). */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, threshold: Double): DataFrame = {
    val seeds: Seq[Seq[Double]] = corpus.filter(col(idCol) < k)
      .orderBy(col(idCol)).select(col(vecCol)).collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toSeq).toSeq
    if (seeds.isEmpty)
      return corpus.limit(0).select(lit(0).as("cell"), lit(0L).as("n"),
        lit(0L).as("n_dropped"), lit(0L).as("n_kept"))
    val cents = (0 until rounds)
      .foldLeft(seeds)((c, _) => lloydStep(corpus, vecCol, c, k))
    val centsHat = cents.map(normalized)
    // deterministic map-only projection — recomputed per consumer
    // rather than persisted (no cache-lifetime leak; at 100 TB the
    // caller persists the assignment once)
    val assigned = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      cellOf(centsHat)(col(vecCol)).as("cell"))
    val dropped = assigned
      .select(col("cell"), col("id").as("id_a"), col("v").as("va"))
      .join(assigned.select(col("cell"), col("id").as("id_b"),
        col("v").as("vb")), Seq("cell"))
      .where(col("id_a") < col("id_b") &&
        cosine(col("va"), col("vb")) >= threshold)
      .select(col("cell"), col("id_b").as("id")).distinct()
      .groupBy("cell").agg(count(lit(1)).as("n_dropped"))
    val out = assigned.groupBy("cell").agg(count(lit(1)).as("n"))
      .join(dropped, Seq("cell"), "left")
      .select(col("cell"), col("n"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"))
    out
  }

  /** ANN top-k via multi-table LSH: candidate = corpus row sharing any
    * (table, bucket) with the query; exact cosine re-rank over the
    * deduplicated candidate set. May return fewer than k rows when
    * buckets are sparse (standard ANN trade-off; recall vs
    * bruteForceTopK is asserted in ScalaTest).
    *
    * Scale shape: the exploded index carries only (id, table, bucket) —
    * vectors are joined back afterwards from the base table — so the
    * candidate-join shuffle is narrow even with L tables; the query
    * side is broadcast twice (buckets, then vectors). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, bits: Int = 6,
      tables: Int = 16): DataFrame = {
    val buckets = lshBuckets(col(vecCol), dim, bits, tables)
    val cb = corpus
      .select(col(idCol).as("neighbor_id"), posexplode(buckets))
      .toDF("neighbor_id", "tbl", "bucket")
    val qb = broadcast(queries
      .select(col(idCol).as("query_id"), posexplode(buckets))
      .toDF("query_id", "tbl", "bucket"))
    val cands = qb.join(cb, Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val scored = cands
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("nvec")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qvec"))), Seq("query_id"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }
}
