package graft

import graft.functions.Hashing

/** DuckDB oracle SQL for every SQL-expressible SparkEntry query.
  *
  * Contract (driver): each SQL runs in DuckDB against the same parquet
  * tables; the driver sorts columns BY NAME and hash-compares values —
  * so every computed column is aliased to exactly the Spark-side name,
  * and engine-variant arithmetic is avoided by construction: decimal-
  * exact sums cast to double, floor(x*1e6)/1e6 truncation instead of
  * round, md5-based portable hashing (Hashing.scala) recomputed here
  * with DuckDB's own md5().
  *
  * Every registry query has an oracle entry (no rows-only rows). Shape
  * rule: final projections are FLAT — no array/struct/binary columns —
  * because the driver's comparator row-sorts on every column before
  * hashing and numpy arrays are unsortable (a RegistrySpec lint
  * enforces this). Multi-value results are "|"-joined strings; the HLL
  * sketch (q40) is asserted as a ±20% bounds boolean.
  */
object Oracle {

  private val P = Hashing.SmallPrime // 1000000007

  /** DuckDB rendering of Hashing.md5Long: first 15 hex chars of md5 →
    * int64 (60 bits, non-negative). */
  private def md5Long(x: String): String =
    s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"

  private def md5Mod(x: String): String = s"(${md5Long(x)} % $P)"

  /** DuckDB rendering of TextAnalysis.tokens. */
  private val toks = raw"string_split_regex(trim(lower(text)), '\s+')"

  /** The PINNED quantized DCT-II basis as a VALUES list (u, i, w) —
    * rendered from the SAME constants the Spark-side transform uses
    * (Multimodal.DctBasis), so the two engines cannot drift. */
  private val dctBasisValues: String =
    graft.operators.Multimodal.DctBasis.zipWithIndex.flatMap {
      case (row, u) => row.zipWithIndex.map {
        case (w, i) => s"($u, $i, $w)"
      }
    }.mkString(", ")

  /** DuckDB rendering of Dedup.shingles(text, n) given a `toks` list
    * column: sliding word windows joined by spaces (list comprehension
    * over 1-based inclusive slices). */
  private def shingles(toksCol: String, n: Int): String =
    s"CASE WHEN len($toksCol) >= $n " +
      s"THEN [array_to_string($toksCol[i:i+${n - 1}], ' ') " +
      s"for i in range(1, len($toksCol) - ${n - 2})] " +
      s"ELSE [array_to_string($toksCol, ' ')] END"

  /** Decimal-exact double sum (mirrors Queries.dsum). */
  private def dsum(c: String): String =
    s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  /** floor-truncation to 6 dp (mirrors Queries.f6). */
  private def f6(c: String): String = s"floor(($c) * 1000000) / 1000000.0"

  /** The BPE training CTE chain shared by q204 (merge list) and q207
    * (encoder): word-frequency top-200, char-exploded seq0, then K
    * rounds of pair-count → argmax(best$r) → greedy-leftmost merge
    * (odd-rank-within-island over consecutive match positions — the
    * only overlap chains form when left==right). Mirrors
    * Queries.bpeLearnedMerges exactly. */
  private def bpeCtes(k: Int): String = {
    def round(r: Int): String =
      s"""p$r AS (
         |  SELECT a.sym AS lft, b.sym AS rgt,
         |    CAST(sum(a.cnt) AS BIGINT) AS c
         |  FROM seq${r - 1} a JOIN seq${r - 1} b
         |    ON a.w = b.w AND b.pos = a.pos + 1
         |  GROUP BY 1, 2),
         |best$r AS (SELECT lft, rgt, c FROM p$r
         |  ORDER BY c DESC, lft, rgt LIMIT 1),
         |m$r AS (
         |  SELECT a.w, a.pos,
         |    a.pos - row_number() OVER (PARTITION BY a.w ORDER BY a.pos)
         |      AS isl
         |  FROM seq${r - 1} a JOIN seq${r - 1} b
         |    ON a.w = b.w AND b.pos = a.pos + 1
         |  CROSS JOIN best$r bb
         |  WHERE a.sym = bb.lft AND b.sym = bb.rgt),
         |k$r AS (
         |  SELECT w, pos FROM (
         |    SELECT w, pos,
         |      row_number() OVER (PARTITION BY w, isl ORDER BY pos) AS rn
         |    FROM m$r) WHERE rn % 2 = 1),
         |seq$r AS MATERIALIZED (
         |  SELECT s.w, s.cnt,
         |    CAST(row_number() OVER (PARTITION BY s.w ORDER BY s.pos)
         |      AS BIGINT) AS pos,
         |    CASE WHEN k.pos IS NOT NULL THEN s.sym || bb.rgt
         |         ELSE s.sym END AS sym
         |  FROM seq${r - 1} s
         |  CROSS JOIN best$r bb
         |  LEFT JOIN k$r k ON s.w = k.w AND s.pos = k.pos
         |  LEFT JOIN k$r k2 ON s.w = k2.w AND s.pos = k2.pos + 1
         |  WHERE k2.pos IS NULL)""".stripMargin
    s"""wordsall AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents),
       |words AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM wordsall
       |  WHERE length(w) BETWEEN 3 AND 12
       |  GROUP BY w ORDER BY cnt DESC, w LIMIT 200),
       |expanded AS (
       |  SELECT w, cnt, unnest(range(1, length(w) + 1)) AS pos
       |  FROM words),
       |seq0 AS MATERIALIZED (
       |  SELECT w, cnt, CAST(pos AS BIGINT) AS pos,
       |    substr(w, CAST(pos AS INTEGER), 1) AS sym
       |  FROM expanded),
       |${(1 to k).map(round).mkString(",\n")}""".stripMargin
  }

  /** Typed JSON integer extraction mirroring Spark's schema'd
    * `from_json("k BIGINT")`: only bare JSON integers parse; a
    * string-encoded number ('k':"12"), a double, or a non-numeric
    * yields NULL — where DuckDB's bare `CAST(json_extract_string(..))`
    * would parse "12" or raise. The fixture only emits bare integers
    * (both engines agree there), but the guard keeps the oracle
    * equivalent under any future fixture, not just the current one. */
  private def jint(src: String, path: String, t: String = "BIGINT"): String =
    s"CASE WHEN json_type(json_extract($src, '$path')) IN ('BIGINT','UBIGINT')" +
      s" THEN CAST(json_extract_string($src, '$path') AS $t) END"

  /** DuckDB rendering of Dedup.simhash over an `hs` hashed-token list:
    * 32 per-bit majority votes summed with 2^b weights. */
  private val simhashSql: String = (0 until 32).map(b =>
    s"CASE WHEN 2 * len(list_filter(hs, h -> (h >> $b) % 2 = 1)) > len(hs) " +
      s"THEN ${1L << b} ELSE 0 END").mkString(" + ")

  // -- q28/q29 minhash: same deterministic coefficients as Hashing -----
  private def sigElems(hsCol: String, numHashes: Int): Seq[String] =
    (0 until numHashes).map { i =>
      s"list_min(list_transform($hsCol, h -> (h * ${Hashing.coefA(i)} + ${Hashing.coefB(i)}) % $P))"
    }

  // -- q38: recompute Similarity.planeComponent in SQL -----------------
  // planeComponent(i, j) = int64(md5("plane_<i>_<j>")[0:14 hex]) / 2^56
  // − 0.5; both engines round the 56-bit integer to double identically
  // (IEEE nearest-even), and division by 2^56 is exact.
  private val planeSql =
    "CAST('0x' || substr(md5('plane_' || i || '_' || j), 1, 14) AS BIGINT)" +
      " / 72057594037927936.0 - 0.5"

  /** One PQ subspace's codebook-training CTE chain (the q109 Lloyd
    * replay over a 16-dim list slice) — shared by q184 (codebook
    * stats) and q293 (the ADC query path against the same codebooks).
    * Exposes, per subspace j: `es$j` (sliced corpus), `cent1s$j` /
    * `cent1ns$j` (raw / normalized trained codewords), `afs$j` (each
    * vector's assigned code — the PQ ENCODING), `sts$j` (stats). */
  private def pqBlock(j: Int): String = pqBlock(j, "TRUE")

  /** As above with a TRAINING-slice predicate: Lloyd rounds see only
    * `trainWhere` rows while the final encode (`afs\$j`) still covers
    * the whole corpus — the frozen-model append contract q318 pins
    * (codes for appended vectors computed under codebooks trained on
    * the build slice alone). `TRUE` reproduces the original
    * train-on-everything blocks bit-identically. */
  private def pqBlock(j: Int, trainWhere: String): String = {
    val lo = j * 16 + 1
    val hi = (j + 1) * 16
    def round(i: Int): String =
      s"""ac${i}s$j AS (SELECT e.vec_id, e.v, cid,
         |  list_dot_product(e.v, cv) AS s FROM ets$j e, cent${i}ns$j),
         |a${i}s$j AS (SELECT vec_id, v, cid AS cell FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY s DESC, cid ASC) AS rn FROM ac${i}s$j)
         |  WHERE rn = 1),
         |q${i}s$j AS (SELECT cell, jj,
         |  sum(CAST(floor(v[jj] * 1048576.0) AS BIGINT)) AS qsum,
         |  count(*) AS n
         |  FROM a${i}s$j, range(1, 17) t(jj) GROUP BY cell, jj),
         |m${i}s$j AS (SELECT cell AS cid,
         |  list((CAST(qsum AS DOUBLE) / n) / 1048576.0 ORDER BY jj)
         |    AS cv FROM q${i}s$j GROUP BY cell),
         |cent${i + 1}s$j AS (SELECT p.cid, coalesce(m.cv, p.cv) AS cv
         |  FROM cent${i}s$j p LEFT JOIN m${i}s$j m USING (cid)),
         |cent${i + 1}ns$j AS (SELECT cid,
         |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
         |    AS cv FROM cent${i + 1}s$j)""".stripMargin
    s"""es$j AS MATERIALIZED (SELECT vec_id,
       |  (CAST(embedding AS DOUBLE[]))[$lo:$hi] AS v FROM embeddings),
       |ets$j AS (SELECT * FROM es$j WHERE $trainWhere),
       |cent0s$j AS (SELECT vec_id AS cid, v AS cv FROM ets$j
       |  WHERE vec_id < 8),
       |cent0ns$j AS (SELECT cid,
       |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
       |    AS cv FROM cent0s$j),
       |${round(0)},
       |acfs$j AS (SELECT e.vec_id, e.v, cid,
       |  list_dot_product(e.v, cv) AS s FROM es$j e, cent1ns$j),
       |afs$j AS (SELECT vec_id, v, cid AS cell, s AS score FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY s DESC, cid ASC) AS rn FROM acfs$j) WHERE rn = 1),
       |sts$j AS (SELECT cell, count(*) AS n,
       |  sum(CAST(floor(score / sqrt(list_dot_product(v, v))
       |    * 1048576.0) AS BIGINT)) AS qc
       |  FROM afs$j GROUP BY cell)""".stripMargin
  }

  /** Shared DuckDB replay of the full IVF-PQ index — coarse Lloyd,
    * cell assignment, probe sets, PQ codebooks, codes, LUTs, ADC
    * sums, both top-k cuts — used by BOTH q295 (in-memory monolith)
    * and q304 (stored serving-index scan): the two Spark paths are
    * row-identical by construction. */
  private def ivfPqSearchSql: String = ivfPqSearchSql("TRUE")

  /** As above with a TRAINING-slice predicate threaded through both
    * the coarse quantizer and the PQ blocks; assignment, probing and
    * scoring always cover the whole corpus. */
  private def ivfPqSearchSql(trainWhere: String): String = {
    def lut(j: Int): String =
      s"""lut$j AS (SELECT q.vec_id AS query_id, c.cid,
         |  list_dot_product(q.v, c.cv) AS s
         |  FROM es$j q, cent1ns$j c WHERE q.vec_id < 5)""".stripMargin
    s"""WITH ${(0 until 4).map(pqBlock(_, trainWhere)).mkString(",\n")},
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |etr AS (SELECT * FROM e WHERE $trainWhere),
         |cent0r AS (SELECT vec_id AS cid, v AS cv FROM etr
         |  WHERE vec_id < 16),
         |cent0 AS (SELECT cid,
         |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
         |    AS cv FROM cent0r),
         |ac0 AS (SELECT e.vec_id, e.v, cid,
         |  list_dot_product(e.v, cv) AS ccos FROM etr e, cent0),
         |a0 AS (SELECT vec_id, v, cid AS cell FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, cid ASC) AS rn FROM ac0) WHERE rn = 1),
         |qsums AS (SELECT cell, j,
         |  sum(CAST(floor(v[j] * 1048576.0) AS BIGINT)) AS qsum,
         |  count(*) AS n
         |  FROM a0, range(1, 65) t(j) GROUP BY cell, j),
         |cent1 AS (SELECT cell AS cid,
         |  list((CAST(qsum AS DOUBLE) / n) / 1048576.0 ORDER BY j) AS cv
         |  FROM qsums GROUP BY cell),
         |centr AS (SELECT c0.cid, coalesce(c1.cv, c0.cv) AS cv
         |  FROM cent0r c0 LEFT JOIN cent1 c1 ON c0.cid = c1.cid),
         |cent AS (SELECT cid,
         |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
         |    AS cv FROM centr),
         |ac AS (SELECT e.vec_id, e.v, cid,
         |  list_dot_product(e.v, cv) AS ccos FROM e, cent),
         |assign AS (SELECT vec_id AS neighbor_id, cid AS cell FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, cid ASC) AS rn FROM ac) WHERE rn = 1),
         |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, cid ASC) AS rn FROM ac
         |  WHERE vec_id < 5) WHERE rn <= 4),
         |codes AS (SELECT a0c.vec_id, a0c.cell AS code0,
         |    a1c.cell AS code1, a2c.cell AS code2, a3c.cell AS code3
         |  FROM afs0 a0c JOIN afs1 a1c USING (vec_id)
         |    JOIN afs2 a2c USING (vec_id) JOIN afs3 a3c USING (vec_id)),
         |${(0 until 4).map(lut).mkString(",\n")},
         |cand AS (SELECT p.query_id, a.neighbor_id
         |  FROM probes p JOIN assign a USING (cell)
         |  WHERE p.query_id <> a.neighbor_id),
         |adc AS (SELECT c.query_id, c.neighbor_id,
         |    ((l0.s + l1.s) + l2.s) + l3.s AS adc
         |  FROM cand c
         |  JOIN codes cd ON cd.vec_id = c.neighbor_id
         |  JOIN lut0 l0 ON l0.query_id = c.query_id
         |    AND l0.cid = cd.code0
         |  JOIN lut1 l1 ON l1.query_id = c.query_id
         |    AND l1.cid = cd.code1
         |  JOIN lut2 l2 ON l2.query_id = c.query_id
         |    AND l2.cid = cd.code2
         |  JOIN lut3 l3 ON l3.query_id = c.query_id
         |    AND l3.cid = cd.code3),
         |short AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY adc DESC, neighbor_id ASC) AS srank
         |    FROM adc) WHERE srank <= 50),
         |scored AS (SELECT query_id, neighbor_id,
         |    list_dot_product(qe.v, ce.v) /
         |      (sqrt(list_dot_product(qe.v, qe.v))
         |        * sqrt(list_dot_product(ce.v, ce.v))) AS cos
         |  FROM short
         |  JOIN e qe ON qe.vec_id = query_id
         |  JOIN e ce ON ce.vec_id = neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, ${f6("cos")} AS cos,
         |  CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q01_incremental_watermark" ->
      """SELECT event_id, ts, user_id, event_type, value,
        |  CAST(year(ts) AS VARCHAR) AS year, CAST(month(ts) AS VARCHAR) AS month
        |FROM events
        |WHERE ts IS NOT NULL AND ts > TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id""".stripMargin,

    "q02_sap_timestamp" ->
      """SELECT event_id, strftime(ts, '%Y%m%d') AS budat,
        |  strftime(ts, '%H%M%S') AS cputm,
        |  date_trunc('second', ts) AS ref_ts
        |FROM events ORDER BY event_id""".stripMargin,

    "q03_pii_sha256" ->
      """SELECT c_custkey, sha256(c_name) AS name_hash,
        |  sha256(c_mktsegment) AS segment_hash
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q04_projection_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q05_partition_strings" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS VARCHAR) AS year,
        |  CAST(month(o_orderdate) AS VARCHAR) AS month,
        |  CAST(weekofyear(o_orderdate) AS VARCHAR) AS week
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q06_watermark_advance" ->
      "SELECT strftime(max(ts), '%Y-%m-%dT%H:%M:%S.%fZ') AS sync_value FROM events",

    "q07_counts" ->
      """SELECT count(*) AS n_rows, count(DISTINCT user_id) AS n_users,
        |  count(value) AS n_values
        |FROM events""".stripMargin,

    "q08_stringify" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) AS user_id_str,
        |  CAST(value > 100 AS VARCHAR) AS is_big_str
        |FROM events ORDER BY event_id""".stripMargin,

    "q09_c1_prep" ->
      """SELECT event_id, ts AS sysmodtime, sha256(event_type) AS email_hash,
        |  CAST(user_id AS VARCHAR) AS is_pro,
        |  CAST(weekofyear(ts) AS VARCHAR) AS week
        |FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id""".stripMargin,

    "q10_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
         |  sum_disc_price, count_order,
         |  ${f6("sum_qty / count_order")} AS avg_qty
         |FROM (
         |  SELECT l_returnflag, l_linestatus,
         |    ${dsum("l_quantity")} AS sum_qty,
         |    ${dsum("l_extendedprice")} AS sum_base_price,
         |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         |      AS sum_disc_price,
         |    count(*) AS count_order
         |  FROM lineitem
         |  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |  GROUP BY l_returnflag, l_linestatus)
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q11_join_broadcast" ->
      s"""SELECT p_brand, count(*) AS n_items,
         |  ${dsum("l_extendedprice")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q12_join_multiway" ->
      s"""SELECT r_name, count(*) AS n_orders,
         |  ${dsum("o_totalprice")} AS total_price
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q13_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q14_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q15_dedup_keep_latest" ->
      """SELECT user_id, event_type, event_id, ts FROM (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q16_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q17_running_window" ->
      """SELECT user_id, CAST(rn AS INTEGER) AS rn, event_id, running_n,
        |  running_value
        |FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |  FROM events)
        |ORDER BY user_id, rn""".stripMargin,

    "q18_order_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 100""".stripMargin,

    "q19_set_except" ->
      """(SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
        |EXCEPT
        |(SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |ORDER BY o_custkey""".stripMargin,

    "q20_set_intersect" ->
      """(SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
        |INTERSECT
        |(SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |ORDER BY o_custkey""".stripMargin,

    "q21_union_compact" ->
      """SELECT event_id, ts, user_id, event_type, value FROM (
        |  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-10 00:00:00'
        |  UNION
        |  SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-15 00:00:00')
        |ORDER BY event_id""".stripMargin,

    "q22_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q23_sliding_window" ->
      """SELECT window_start, count(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events)
        |GROUP BY window_start ORDER BY window_start""".stripMargin,

    "q24_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts >= lag(ts) OVER w + INTERVAL '10 minutes' THEN 1 ELSE 0 END AS news
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessioned AS (
        |  SELECT user_id, ts, sum(news) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT min(ts) AS session_start, user_id, count(*) AS n_events,
        |  max(ts) AS last_ts
        |FROM sessioned GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q25_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |  ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q26_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         |  ${dsum("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q27_dedup_exact" ->
      """SELECT lang, source, min(doc_id) AS doc_id, count(*) AS dup_count
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q28_minhash_signature" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s)
         |SELECT doc_id,
         |  array_to_string([${sigElems("hs", 16).mkString(", ")}], '|') AS signature
         |FROM h ORDER BY doc_id""".stripMargin,

    "q29_minhash_candidates" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |ORDER BY id_a, id_b""".stripMargin,

    // incremental LSH dedup: the FULL q29 pair set restricted to pairs
    // touching the 5% batch — the lossless-vs-full-rerun contract the
    // Spark side's index-probe join must satisfy
    "q294_incremental_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |WHERE a.doc_id % 20 = 7 OR b.doc_id % 20 = 7
         |ORDER BY id_a, id_b""".stripMargin,

    "q54_sql_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q55_correlated_subquery" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |    AS avg_yearly,
        |  count(*) AS n_small
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |  FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q56_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q57_unpivot" ->
      s"""WITH w AS (SELECT l_returnflag,
         |    ${dsum("l_quantity")} AS qty,
         |    ${dsum("l_extendedprice")} AS price,
         |    ${dsum("l_discount")} AS disc
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, metric, value FROM (
         |  SELECT l_returnflag, 'qty' AS metric, qty AS value FROM w
         |  UNION ALL
         |  SELECT l_returnflag, 'price', price FROM w
         |  UNION ALL
         |  SELECT l_returnflag, 'disc', disc FROM w)
         |ORDER BY l_returnflag, metric""".stripMargin,

    // truncate/zero-pad on the hex rendering: 128 hex chars = 64 bytes,
    // and '0'-char padding is exactly the hex of 0x00 bytes
    "q58_resize_payload" ->
      """SELECT doc_id,
        |  CAST(length(rp) // 2 AS INTEGER) AS resized_len,
        |  md5(rp) AS resized_md5
        |FROM (SELECT doc_id,
        |    rpad(substr(hex(encode(text)), 1, 128), 128, '0') AS rp
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q59_lead_lag" ->
      """SELECT user_id, event_id,
        |  epoch_us(ts) // 1000000
        |    - lag(epoch_us(ts) // 1000000, 1) OVER w AS gap_s,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY event_id""".stripMargin,

    // identical semantics to q16 — the salted two-phase plan must land
    // on exactly the direct-window answer
    "q60_salted_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q61_not_in_subquery" ->
      """SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_suppkey NOT IN (
        |  SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q62_top_tokens" ->
      s"""SELECT token, count(*) AS df FROM (
         |  SELECT doc_id, unnest(list_distinct($toks)) AS token FROM documents)
         |GROUP BY token ORDER BY df DESC, token ASC LIMIT 20""".stripMargin,

    "q63_hash_split" ->
      s"""SELECT lang, split, count(*) AS n_docs, min(doc_id) AS min_doc_id
         |FROM (SELECT lang, doc_id,
         |    CASE WHEN ${md5Long("CAST(doc_id AS VARCHAR)")} % 100 < 95
         |      THEN 'train' ELSE 'valid' END AS split
         |  FROM documents)
         |GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    "q53_kmv_distinct" ->
      s"""SELECT event_type,
         |  CASE WHEN len(m) < 32 THEN len(m)
         |    ELSE CAST(floor(31.0 * 1152921504606846976.0 / m[32]) AS BIGINT)
         |  END AS approx_distinct
         |FROM (
         |  SELECT event_type,
         |    list_sort(list(DISTINCT ${md5Long("CAST(user_id AS VARCHAR)")}))[1:32] AS m
         |  FROM events GROUP BY event_type)
         |ORDER BY event_type""".stripMargin,

    "q52_dedup_components" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(v, u) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a)
         |SELECT v AS doc_id, min(u) AS component FROM reach
         |GROUP BY v ORDER BY doc_id""".stripMargin,

    // q305: the incremental survivor-maintenance DELTA — the FULL
    // component computation over old ∪ new (q52's reach chain) diffed
    // against the corpus-only components. The Spark side produces the
    // same delta via the incremental merge of touched components only
    // (Dedup.incrementalComponents), so the hash match IS the
    // incremental ≡ full-recompute contract, pinned externally.
    "q305_incremental_survivors" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(v, u) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a),
         |full_assign AS (SELECT v AS doc_id, min(u) AS component
         |  FROM reach GROUP BY v),
         |old_edges AS (SELECT a, b FROM edges
         |  WHERE a % 20 <> 7 AND b % 20 <> 7),
         |reach_old(v, u) AS (
         |  SELECT doc_id, doc_id FROM documents WHERE doc_id % 20 <> 7
         |  UNION
         |  SELECT r.v, e.b FROM reach_old r JOIN old_edges e ON r.u = e.a),
         |old_assign AS (SELECT v AS doc_id, min(u) AS component
         |  FROM reach_old GROUP BY v)
         |SELECT f.doc_id, f.component,
         |  CASE WHEN o.doc_id IS NULL THEN 'new' ELSE 'merged' END AS status
         |FROM full_assign f LEFT JOIN old_assign o USING (doc_id)
         |WHERE o.doc_id IS NULL OR f.component <> o.component
         |ORDER BY f.doc_id""".stripMargin,

    // q306: the end-to-end per-batch pipeline — full components over
    // old ∪ new (the incremental merge's proven equal), batch
    // survivors = canonical min-id representatives, q33's quality
    // arithmetic, q92's packing window — one hash over the whole
    // composition.
    "q306_incremental_pipeline" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(v, u) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a),
         |full_assign AS (SELECT v AS doc_id, min(u) AS component
         |  FROM reach GROUP BY v),
         |surv AS (SELECT d.doc_id, d.lang, d.text FROM documents d
         |  JOIN full_assign f USING (doc_id)
         |  WHERE d.doc_id % 20 = 7 AND f.component = d.doc_id),
         |st AS (SELECT doc_id, lang,
         |    CAST(len($toks) AS BIGINT) AS n_tokens,
         |    CAST(length(text) AS DOUBLE) AS nchars,
         |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS nalpha,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS nwords
         |  FROM surv),
         |q AS (SELECT doc_id, lang, n_tokens,
         |    ${f6("least(1.0, nwords / 20.0) * (nalpha / nchars)")} AS quality_score
         |  FROM st),
         |g AS (SELECT * FROM q WHERE quality_score >= 0.5),
         |o AS (SELECT doc_id, lang, n_tokens, quality_score,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS tok_off
         |  FROM g)
         |SELECT doc_id, lang, n_tokens, quality_score, tok_off,
         |  CAST(floor(CAST(tok_off AS DOUBLE) / 2048) AS BIGINT)
         |    AS seq_first,
         |  CAST(floor(CAST(tok_off + n_tokens - 1 AS DOUBLE) / 2048)
         |    AS BIGINT) AS seq_last
         |FROM o ORDER BY lang, doc_id""".stripMargin,

    // q307: coarse-model drift — q109's Lloyd chain trained on the
    // BUILD slice only (one round, nlist=8), frozen assignment of the
    // full corpus, per-cell fixed-point mean fit split old/new
    "q307_model_drift" ->
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |eb AS (SELECT * FROM e WHERE vec_id < 400),
         |cent0 AS (SELECT vec_id AS cid, v AS cv FROM eb WHERE vec_id < 8),
         |cent0n AS (SELECT cid,
         |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cv
         |  FROM cent0),
         |ac0 AS (SELECT eb.vec_id, eb.v, cid, list_dot_product(eb.v, cv) AS s
         |  FROM eb, cent0n),
         |a0 AS (SELECT vec_id, v, cid AS cell FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY s DESC, cid ASC) AS rn FROM ac0) WHERE rn = 1),
         |q0 AS (SELECT cell, j,
         |  sum(CAST(floor(v[j] * 1048576.0) AS BIGINT)) AS qsum,
         |  count(*) AS n
         |  FROM a0, range(1, 65) t(j) GROUP BY cell, j),
         |m0 AS (SELECT cell AS cid,
         |  list((CAST(qsum AS DOUBLE) / n) / 1048576.0 ORDER BY j) AS cv
         |  FROM q0 GROUP BY cell),
         |cent1 AS (SELECT p.cid, coalesce(m.cv, p.cv) AS cv
         |  FROM cent0 p LEFT JOIN m0 m USING (cid)),
         |cent1n AS (SELECT cid,
         |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cv
         |  FROM cent1),
         |acf AS (SELECT e.vec_id, e.v, cid, list_dot_product(e.v, cv) AS s
         |  FROM e, cent1n),
         |af AS (SELECT vec_id, v, cid AS cell, s AS score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY s DESC, cid ASC) AS rn FROM acf) WHERE rn = 1),
         |fl AS (SELECT cell,
         |  CAST(floor(score / sqrt(list_dot_product(v, v)) * 1048576.0)
         |    AS BIGINT) AS qcos,
         |  vec_id >= 400 AS is_new FROM af),
         |ag AS (SELECT cell,
         |  CAST(sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_old,
         |  CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_new,
         |  sum(CASE WHEN NOT is_new THEN qcos ELSE 0 END) AS q_old,
         |  sum(CASE WHEN is_new THEN qcos ELSE 0 END) AS q_new
         |  FROM fl GROUP BY cell)
         |SELECT CAST(cell AS INTEGER) AS cell, n_old, n_new,
         |  CASE WHEN n_old > 0 THEN
         |    ${f6("(CAST(q_old AS DOUBLE) / n_old) / 1048576.0")} END
         |    AS mean_cos_old,
         |  CASE WHEN n_new > 0 THEN
         |    ${f6("(CAST(q_new AS DOUBLE) / n_new) / 1048576.0")} END
         |    AS mean_cos_new,
         |  CASE WHEN n_old > 0 AND n_new > 0 THEN
         |    ${f6("(CAST(q_old AS DOUBLE) / n_old - CAST(q_new AS DOUBLE) / n_new) / 1048576.0")} END
         |    AS drift
         |FROM ag ORDER BY cell""".stripMargin,

    // q308: stored-bucket-index balance — q52's banding chain, bpart =
    // bucket mod parts, per-part row/bucket/hot-bucket stats
    "q308_index_balance" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |bs AS (SELECT CAST(bucket % 16 AS INTEGER) AS bpart, band, bucket,
         |  count(*) AS bsize FROM buckets GROUP BY 1, 2, 3)
         |SELECT bpart, CAST(sum(bsize) AS BIGINT) AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST(max(bsize) AS BIGINT) AS max_bucket
         |FROM bs GROUP BY bpart ORDER BY bpart""".stripMargin,

    // q309: per-source boilerplate 2-grams (doc-frequency >= 20% of the
    // source's docs AND >= 3 docs) over text + the per-source injected
    // footer sentence (q67-style deterministic synthetic furniture),
    // then the per-doc covered fraction
    "q309_boilerplate_ngrams" ->
      s"""WITH t AS (SELECT doc_id, source,
         |  string_split_regex(trim(lower(text || ' ' || source ||
         |    '_hdr cookie notice all rights reserved ' || source ||
         |    '_end')), '\\s+') AS tk FROM documents),
         |sgl AS (SELECT doc_id, source, ${shingles("tk", 2)} AS sh FROM t),
         |pos AS (SELECT doc_id, source, unnest(sh) AS g FROM sgl),
         |df AS (SELECT source, g, CAST(count(DISTINCT doc_id) AS BIGINT)
         |    AS df FROM pos GROUP BY source, g),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM t GROUP BY source),
         |boiler AS (SELECT df.source, df.g FROM df JOIN sz USING (source)
         |  WHERE df.df * 5 >= sz.n_docs AND df.df >= 3),
         |per AS (SELECT pos.doc_id, CAST(count(*) AS BIGINT) AS n_pos,
         |    CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_boiler
         |  FROM pos LEFT JOIN boiler b
         |    ON b.source = pos.source AND b.g = pos.g
         |  GROUP BY pos.doc_id)
         |SELECT doc_id, n_pos, n_boiler,
         |  ${f6("CAST(n_boiler AS DOUBLE) / n_pos")} AS boiler_frac
         |FROM per ORDER BY doc_id""".stripMargin,

    // q310: Laplace bigram LM trained on src0 only (q90's arithmetic
    // restricted to the reference slice), per-doc fixed-point score,
    // per-lang terciles on the integer mean (// = Spark's div)
    "q310_perplexity_gate" ->
      s"""WITH d AS (SELECT doc_id, lang, source, $toks AS ts
         |  FROM documents),
         |dd AS (SELECT doc_id, lang, source, ts FROM d WHERE len(ts) >= 2),
         |bi AS (SELECT doc_id, lang, source, ts[g] AS u, ts[g + 1] AS v
         |  FROM (SELECT doc_id, lang, source, ts,
         |    unnest(generate_series(1, len(ts) - 1)) AS g FROM dd)),
         |rb AS (SELECT u, v FROM bi WHERE source = 'src0'),
         |cuv AS (SELECT u, v, CAST(count(*) AS BIGINT) AS c_uv
         |  FROM rb GROUP BY u, v),
         |cu AS (SELECT u, CAST(count(*) AS BIGINT) AS c_u
         |  FROM rb GROUP BY u),
         |vs AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vsz
         |  FROM (SELECT unnest(ts) AS tok FROM dd WHERE source = 'src0')),
         |sc AS (SELECT doc_id, lang,
         |    CAST(floor(CAST(coalesce(c_uv, 0) + 1 AS DOUBLE) /
         |      (coalesce(c_u, 0) + vsz) * 1099511627776.0) AS BIGINT) AS pf
         |  FROM bi LEFT JOIN cuv USING (u, v) LEFT JOIN cu USING (u)
         |  CROSS JOIN vs),
         |agg AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT)
         |      AS n_bigrams,
         |    CAST(sum(pf) AS BIGINT) AS sum_pf FROM sc GROUP BY doc_id,
         |    lang),
         |avgd AS (SELECT doc_id, lang, n_bigrams,
         |  sum_pf // n_bigrams AS avg_pf FROM agg)
         |SELECT doc_id, lang, n_bigrams, avg_pf,
         |  CAST(ntile(3) OVER (PARTITION BY lang
         |    ORDER BY avg_pf DESC, doc_id) AS BIGINT) AS bucket
         |FROM avgd ORDER BY doc_id""".stripMargin,

    // q311: per-lang BPE fertility/compression — q207's trained
    // encoder replayed per distinct (lang, word), weighted by counts
    "q311_tokenizer_fertility" -> {
      val K = 8
      val inner = (1 to K).foldLeft(
        """regexp_replace(w, '(.)', '@\1', 'g')""") { (acc, r) =>
        s"""replace($acc,
           |  (SELECT '@' || lft || '@' || rgt FROM best$r),
           |  (SELECT '@' || lft || rgt FROM best$r))""".stripMargin
      }
      s"""WITH ${bpeCtes(K)},
         |lwords AS (
         |  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z]+'))
         |    AS w FROM documents),
         |lw AS (
         |  SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt FROM lwords
         |  WHERE length(w) BETWEEN 3 AND 12 GROUP BY lang, w),
         |repr AS (SELECT lang, cnt, w, $inner AS r FROM lw),
         |pw AS (SELECT lang, cnt,
         |    CAST(len(string_split(r, '@')) - 1 AS BIGINT) AS n_bpe,
         |    CAST(length(w) AS BIGINT) AS n_chars FROM repr),
         |agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_vocab,
         |    CAST(sum(cnt) AS BIGINT) AS n_words,
         |    CAST(sum(cnt * n_bpe) AS BIGINT) AS n_bpe_tokens,
         |    CAST(sum(cnt * n_chars) AS BIGINT) AS n_chars_tot
         |  FROM pw GROUP BY lang)
         |SELECT lang, n_vocab, n_words, n_bpe_tokens,
         |  ${f6("CAST(n_bpe_tokens AS DOUBLE) / n_words")} AS fertility,
         |  ${f6("CAST(n_chars_tot AS DOUBLE) / n_bpe_tokens")}
         |    AS chars_per_token
         |FROM agg ORDER BY lang""".stripMargin
    },

    // q312: gate-overlap ablation matrix — the q66/q309/q310 flag
    // definitions verbatim, list-concat of fired gate names, self-join
    // on doc_id, unordered-pair counts (diagonal = solo drop counts)
    "q312_filter_ablation" ->
      s"""WITH t AS (SELECT doc_id, lang, source, $toks AS tk
         |  FROM documents),
         |shf AS (SELECT doc_id, len(tk) < 25 AS f_short FROM t),
         |s2 AS (SELECT doc_id, source, ${shingles("tk", 2)} AS sh FROM t),
         |rep AS (SELECT doc_id,
         |  (len(sh) - len(list_distinct(sh))) * 5 >= len(sh) AS f_rep
         |  FROM s2),
         |tf AS (SELECT doc_id, source,
         |  string_split_regex(trim(lower(text || ' ' || source ||
         |    '_hdr cookie notice all rights reserved ' || source ||
         |    '_end')), '\\s+') AS ftk FROM documents),
         |sf2 AS (SELECT doc_id, source, ${shingles("ftk", 2)} AS sh
         |  FROM tf),
         |pos AS (SELECT doc_id, source, unnest(sh) AS g FROM sf2),
         |dfq AS (SELECT source, g, count(DISTINCT doc_id) AS df
         |  FROM pos GROUP BY source, g),
         |sz AS (SELECT source, count(*) AS n_docs FROM t GROUP BY source),
         |boiler AS (SELECT dfq.source, dfq.g FROM dfq JOIN sz
         |  USING (source) WHERE dfq.df * 5 >= sz.n_docs AND dfq.df >= 3),
         |per AS (SELECT pos.doc_id, count(*) AS n_pos,
         |    sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler
         |  FROM pos LEFT JOIN boiler b
         |    ON b.source = pos.source AND b.g = pos.g
         |  GROUP BY pos.doc_id),
         |bo AS (SELECT doc_id, n_boiler * 5 >= n_pos AS f_boiler FROM per),
         |dd AS (SELECT doc_id, lang, source, tk AS ts FROM t
         |  WHERE len(tk) >= 2),
         |bi AS (SELECT doc_id, lang, source, ts[g] AS u, ts[g + 1] AS v
         |  FROM (SELECT doc_id, lang, source, ts,
         |    unnest(generate_series(1, len(ts) - 1)) AS g FROM dd)),
         |rb AS (SELECT u, v FROM bi WHERE source = 'src0'),
         |cuv AS (SELECT u, v, CAST(count(*) AS BIGINT) AS c_uv
         |  FROM rb GROUP BY u, v),
         |cu AS (SELECT u, CAST(count(*) AS BIGINT) AS c_u
         |  FROM rb GROUP BY u),
         |vs AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vsz
         |  FROM (SELECT unnest(ts) AS tok FROM dd WHERE source = 'src0')),
         |sc AS (SELECT doc_id, lang,
         |    CAST(floor(CAST(coalesce(c_uv, 0) + 1 AS DOUBLE) /
         |      (coalesce(c_u, 0) + vsz) * 1099511627776.0) AS BIGINT) AS pf
         |  FROM bi LEFT JOIN cuv USING (u, v) LEFT JOIN cu USING (u)
         |  CROSS JOIN vs),
         |agg AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT)
         |      AS n_bigrams,
         |    CAST(sum(pf) AS BIGINT) AS sum_pf FROM sc GROUP BY doc_id,
         |    lang),
         |tl AS (SELECT doc_id, ntile(3) OVER (PARTITION BY lang
         |    ORDER BY sum_pf // n_bigrams DESC, doc_id) = 3 AS f_tail
         |  FROM agg),
         |flags AS (SELECT shf.doc_id, shf.f_short,
         |    coalesce(rep.f_rep, false) AS f_rep,
         |    coalesce(bo.f_boiler, false) AS f_boiler,
         |    coalesce(tl.f_tail, false) AS f_tail
         |  FROM shf LEFT JOIN rep USING (doc_id)
         |  LEFT JOIN bo USING (doc_id) LEFT JOIN tl USING (doc_id)),
         |failed AS (SELECT doc_id, unnest(
         |    (CASE WHEN f_boiler THEN ['boiler'] ELSE [] END) ||
         |    (CASE WHEN f_rep THEN ['rep'] ELSE [] END) ||
         |    (CASE WHEN f_short THEN ['short'] ELSE [] END) ||
         |    (CASE WHEN f_tail THEN ['tail'] ELSE [] END)) AS f
         |  FROM flags)
         |SELECT a.f AS f_a, b.f AS f_b, CAST(count(*) AS BIGINT) AS n_docs
         |FROM failed a JOIN failed b
         |  ON a.doc_id = b.doc_id AND a.f <= b.f
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q313: q52's component CTEs + q33's quality arithmetic; keep =
    // argmax quality (f6-truncated, doc_id tie-break) per component
    "q313_quality_survivors" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(v, u) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a),
         |comp AS (SELECT v AS doc_id, min(u) AS component FROM reach
         |  GROUP BY v),
         |qual AS (SELECT doc_id,
         |  ${f6("least(1.0, nwords / 20.0) * (nalpha / nchars)")}
         |    AS quality_score
         |  FROM (
         |    SELECT doc_id,
         |      CAST(length(text) AS DOUBLE) AS nchars,
         |      CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
         |        AS DOUBLE) AS nalpha,
         |      CAST(len(string_split_regex(trim(text), '\\s+'))
         |        AS DOUBLE) AS nwords
         |    FROM documents)),
         |j AS (SELECT comp.component, comp.doc_id, qual.quality_score,
         |    row_number() OVER (PARTITION BY component
         |      ORDER BY quality_score DESC, comp.doc_id) AS rn
         |  FROM comp JOIN qual USING (doc_id))
         |SELECT component, CAST(count(*) AS BIGINT) AS n_members,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS survivor,
         |  max(CASE WHEN rn = 1 THEN quality_score END) AS best_quality
         |FROM j GROUP BY component ORDER BY component""".stripMargin,

    // q314: q52's component CTEs; the expansion is two semi-joins
    // (seed docs -> their components -> all members)
    "q314_takedown_expansion" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(v, u) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a),
         |comp AS (SELECT v AS doc_id, min(u) AS component FROM reach
         |  GROUP BY v),
         |seed_comps AS (SELECT DISTINCT component FROM comp
         |  WHERE doc_id % 50 = 3)
         |SELECT c.doc_id, c.component,
         |  CAST(CASE WHEN c.doc_id % 50 = 3 THEN 1 ELSE 0 END AS INT)
         |    AS is_seed
         |FROM comp c JOIN seed_comps sc USING (component)
         |ORDER BY c.doc_id""".stripMargin,

    // q316: q313's component + quality CTEs with a capped rank filter
    // and a per-component size window — bounded-duplication sampling
    "q316_cluster_cap_sample" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(v, u) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a),
         |comp AS (SELECT v AS doc_id, min(u) AS component FROM reach
         |  GROUP BY v),
         |qual AS (SELECT doc_id,
         |  ${f6("least(1.0, nwords / 20.0) * (nalpha / nchars)")}
         |    AS quality_score
         |  FROM (
         |    SELECT doc_id,
         |      CAST(length(text) AS DOUBLE) AS nchars,
         |      CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
         |        AS DOUBLE) AS nalpha,
         |      CAST(len(string_split_regex(trim(text), '\\s+'))
         |        AS DOUBLE) AS nwords
         |    FROM documents)),
         |j AS (SELECT comp.component, comp.doc_id,
         |    row_number() OVER (PARTITION BY component
         |      ORDER BY quality_score DESC, comp.doc_id) AS rn,
         |    CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
         |      AS cluster_size
         |  FROM comp JOIN qual USING (doc_id))
         |SELECT doc_id, component, CAST(rn AS INT) AS rank_in_cluster,
         |  cluster_size
         |FROM j WHERE rn <= 2 ORDER BY doc_id""".stripMargin,

    // q317: the Spark side materializes a lang-partitioned corpus
    // copy, deletes the request batch through the touched-dirs-only
    // swap (Hive-escaped string partition names), and re-aggregates
    // the table it actually left on disk — DuckDB replays the
    // remaining corpus directly, so the hash match pins the physical
    // delete end-to-end
    "q317_partitioned_takedown" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE NOT (doc_id % 7 = 3 AND lang IN ('de', 'fr'))
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // q319: the Spark side drops whole source directories (metadata
    // only, zero rewrite) and re-aggregates the table left on disk;
    // DuckDB replays the surviving slice directly
    "q319_partition_ttl" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE CAST(substr(source, 4) AS INT) < 10
        |GROUP BY source ORDER BY source""".stripMargin,

    // q320: the Spark side merges the corpus's STORED per-type KMV
    // sketches with the batch's (k smallest of the union, no corpus
    // rescan); DuckDB recomputes k-min over old UNION new from scratch
    // — the hash match is the merge ≡ recompute contract (exact for
    // KMV: min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)))
    "q320_incremental_kmv" ->
      s"""WITH h AS (SELECT DISTINCT event_type AS t,
         |    ${md5Long("CAST(user_id AS VARCHAR)")} AS h
         |  FROM events),
         |sk AS (SELECT t, list_sort(list(DISTINCT h))[1:32] AS m
         |  FROM h GROUP BY t)
         |SELECT t AS event_type,
         |  CAST(CASE WHEN len(m) < 32 THEN len(m)
         |    ELSE CAST(floor(31.0 * 1152921504606846976.0 / m[32])
         |      AS BIGINT) END AS BIGINT) AS approx_distinct
         |FROM sk ORDER BY event_type""".stripMargin,

    // q322: the dirty register (trailing digit pair transposed) linked
    // back to the clean one by 15-char prefix blocking + Jaro-Winkler
    // best-match; the native kernel is bit-exact with DuckDB's
    // jaro_winkler_similarity, so the (sim DESC, key ASC) ranking is
    // deterministic in both engines
    "q322_record_linkage" ->
      s"""WITH clean AS (SELECT c_custkey AS clean_key,
         |    c_name AS clean_name FROM customer),
         |dirty AS (SELECT c_custkey AS dirty_key,
         |    substr(c_name, 1, 16) || substr(c_name, 18, 1)
         |      || substr(c_name, 17, 1) AS dirty_name
         |  FROM customer WHERE c_custkey % 3 = 0),
         |cand AS (SELECT dirty_key, clean_key,
         |    jaro_winkler_similarity(dirty_name, clean_name) AS sim
         |  FROM dirty JOIN clean
         |    ON substr(dirty_name, 1, 15) = substr(clean_name, 1, 15)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY dirty_key
         |    ORDER BY sim DESC, clean_key ASC) AS rn FROM cand)
         |SELECT dirty_key, clean_key AS best_clean_key,
         |  ${f6("sim")} AS sim, clean_key = dirty_key AS linked_ok
         |FROM r WHERE rn = 1 ORDER BY dirty_key""".stripMargin,

    // q323: the Spark side copies lineitem out NESTED-partitioned
    // (YEAR=/MONTH= of l_shipdate — the reference's own canonical
    // layout), drops every month before 1995-07 through the TTL engine
    // (leaf-directory deletes only, first year dropped PARTIALLY so
    // the predicate genuinely needs the inner level), and
    // re-aggregates the directories left on disk; DuckDB replays the
    // surviving slice directly
    "q323_nested_ttl" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS yr,
        |  CAST(month(l_shipdate) AS INT) AS mo,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE NOT (year(l_shipdate) * 12 + month(l_shipdate)
        |  < 1995 * 12 + 7)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q324: per ANN query, the stored scan's row volume = corpus cell
    // sizes summed over the query's nprobe probe cells — the coarse
    // half of q304's IVF-PQ replay (Lloyd training, whole-corpus
    // assignment, probe-cell ranking) feeding a size sum instead of
    // the ADC tail, so the match pins assignment parity AND the
    // admission arithmetic
    "q324_scan_admission" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cent0r AS (SELECT vec_id AS cid, v AS cv FROM e
        |  WHERE vec_id < 16),
        |cent0 AS (SELECT cid,
        |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
        |    AS cv FROM cent0r),
        |ac0 AS (SELECT e.vec_id, e.v, cid,
        |  list_dot_product(e.v, cv) AS ccos FROM e, cent0),
        |a0 AS (SELECT vec_id, v, cid AS cell FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY ccos DESC, cid ASC) AS rn FROM ac0) WHERE rn = 1),
        |qsums AS (SELECT cell, j,
        |  sum(CAST(floor(v[j] * 1048576.0) AS BIGINT)) AS qsum,
        |  count(*) AS n
        |  FROM a0, range(1, 65) t(j) GROUP BY cell, j),
        |cent1 AS (SELECT cell AS cid,
        |  list((CAST(qsum AS DOUBLE) / n) / 1048576.0 ORDER BY j) AS cv
        |  FROM qsums GROUP BY cell),
        |centr AS (SELECT c0.cid, coalesce(c1.cv, c0.cv) AS cv
        |  FROM cent0r c0 LEFT JOIN cent1 c1 ON c0.cid = c1.cid),
        |cent AS (SELECT cid,
        |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
        |    AS cv FROM centr),
        |ac AS (SELECT e.vec_id, cid,
        |  list_dot_product(e.v, cv) AS ccos FROM e, cent),
        |assign AS (SELECT vec_id, cid AS cell FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY ccos DESC, cid ASC) AS rn FROM ac) WHERE rn = 1),
        |sizes AS (SELECT cell, count(*) AS csize
        |  FROM assign GROUP BY cell),
        |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY ccos DESC, cid ASC) AS rn FROM ac
        |  WHERE vec_id < 5) WHERE rn <= 4),
        |vol AS (SELECT query_id, sum(coalesce(csize, 0)) AS est
        |  FROM probes LEFT JOIN sizes USING (cell) GROUP BY query_id)
        |SELECT query_id, CAST(est AS BIGINT) AS est_rows,
        |  est <= 125 AS admit
        |FROM vol ORDER BY query_id""".stripMargin,

    // q325: nested-layout takedown by id — the Spark side deletes the
    // doomed orders' lines from a (yr, mo)-partitioned copy through
    // the nested manifest swap and re-aggregates the leaves left on
    // disk; DuckDB replays the surviving rows directly
    "q325_nested_takedown" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS yr,
        |  CAST(month(l_shipdate) AS INT) AS mo,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE NOT (l_orderkey % 13 = 4)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q326: DATE-partitioned takedown by id — the swap engine's
    // DateType dir rendering driven end-to-end; money as floor-cents
    // BIGINT (IEEE multiply + floor bit-identical in both engines)
    "q326_date_takedown" ->
      """SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
        |    AS VARCHAR) AS d,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM orders
        |WHERE NOT (o_orderkey % 11 = 7)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q327: null-partition TTL contract — phase 1 replays the typed
    // sweep's survivors under SQL three-valued logic (NULL never
    // satisfies the comparison, so the null group MUST appear);
    // phase 2 replays the deliberate isNull sweep (null group gone).
    // The Spark side reads both states physically from disk.
    "q327_null_partition_ttl" ->
      """WITH base AS (SELECT doc_id, n_chars,
        |    nullif(source, 'src7') AS src FROM documents),
        |p1 AS (SELECT 1 AS phase, coalesce(src, 'null') AS src,
        |    count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM base
        |  WHERE src IS NULL
        |    OR NOT (CAST(substring(src, 4) AS INT) >= 15)
        |  GROUP BY 1, 2),
        |p2 AS (SELECT 2 AS phase, src, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM base
        |  WHERE src IS NOT NULL
        |    AND NOT (CAST(substring(src, 4) AS INT) >= 15)
        |  GROUP BY 1, 2)
        |SELECT CAST(phase AS INT) AS phase, src, n_docs, sum_chars
        |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
        |ORDER BY phase, src""".stripMargin,

    // q328: compliance-ledger evidence replay — each disjoint takedown
    // batch must have deleted exactly the rows matching its id
    // predicate, across exactly its ids' distinct partition values
    // (the touched-directory count of the partition swap); the Spark
    // side reads these numbers back from the ledger the deletes wrote
    "q328_compliance_ledger" ->
      """WITH b AS (SELECT CASE CAST(doc_id % 30 AS INT)
        |    WHEN 3 THEN 0 WHEN 13 THEN 1 WHEN 23 THEN 2 END AS batch_id,
        |    source
        |  FROM documents
        |  WHERE CAST(doc_id % 30 AS INT) IN (3, 13, 23))
        |SELECT CAST(batch_id AS BIGINT) AS batch_id,
        |  count(*) AS rows_deleted,
        |  CAST(count(DISTINCT source) AS BIGINT) AS dirs_rewritten
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    // q336: per-lineage audit drill-down — every covering line
    // reconstructed from the raw documents table (the same grouped
    // counts the appends carried), recorded 1 per line, plus the
    // one-flat-row gap cell ('' lineage, recorded 0, -1 sentinels)
    // for the batch no lineage covered
    "q336_audit_lineage" ->
      """WITH lines AS (
        |  SELECT source AS lineage,
        |    CAST(n_chars % 2 AS BIGINT) AS batch_id,
        |    count(*) AS rows_deleted,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS dirs_rewritten
        |  FROM documents
        |  WHERE source IN ('src15','src16','src17','src18','src19')
        |  GROUP BY 1, 2
        |)
        |SELECT * FROM (
        |  SELECT 'takedown' AS target, batch_id, lineage,
        |    CAST(1 AS BIGINT) AS recorded, rows_deleted, dirs_rewritten
        |  FROM lines
        |  UNION ALL
        |  SELECT 'takedown', CAST(2 AS BIGINT), '', CAST(0 AS BIGINT),
        |    CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
        |) ORDER BY batch_id, lineage""".stripMargin,

    // q335: ledger fold invariance — after folding the four oldest
    // evidence names into one consolidated file, the ledger read-back
    // must still equal an independent replay of all six deletes (the
    // fold is maintenance, never semantics)
    "q335_ledger_fold" ->
      """WITH b AS (SELECT CASE CAST(doc_id % 60 AS INT)
        |    WHEN 5 THEN 0 WHEN 15 THEN 1 WHEN 25 THEN 2
        |    WHEN 35 THEN 3 WHEN 45 THEN 4 WHEN 55 THEN 5 END
        |    AS batch_id, source
        |  FROM documents
        |  WHERE CAST(doc_id % 60 AS INT) IN (5, 15, 25, 35, 45, 55))
        |SELECT CAST(batch_id AS BIGINT) AS batch_id,
        |  count(*) AS rows_deleted,
        |  CAST(count(DISTINCT source) AS BIGINT) AS dirs_rewritten
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    // q334: SimHash takedown replay — delete-then-probe must equal a
    // probe of the REMAINING corpus reconstructed index-free (q331's
    // replay minus the doomed slice), and the ledger's recorded
    // rows_deleted must equal bands x |doomed| (each doc holds one
    // banded row per band)
    "q334_simhash_takedown" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |h AS (SELECT doc_id, list_transform(tk, x -> ${md5Long("x")}) AS hs FROM t),
         |sk AS (SELECT doc_id, CAST($simhashSql AS BIGINT) AS sk FROM h),
         |banded AS (SELECT doc_id, sk, unnest([0, 1, 2, 3]) AS band FROM sk),
         |bv AS (SELECT doc_id, sk, band, (sk >> (band * 8)) & 255 AS bandval
         |  FROM banded),
         |bnew AS (SELECT * FROM bv WHERE doc_id % 20 = 7),
         |remain AS (SELECT * FROM bv
         |  WHERE doc_id % 20 NOT IN (7, 3, 13)),
         |del AS (SELECT CAST(4 * count(*) AS BIGINT) AS rows_deleted
         |  FROM documents WHERE doc_id % 20 IN (3, 13)),
         |pairs AS (SELECT DISTINCT n.doc_id AS id_new,
         |    o.doc_id AS id_old,
         |    CAST(bit_count(xor(n.sk, o.sk)) AS INTEGER) AS hamming
         |  FROM bnew n JOIN remain o
         |  ON n.band = o.band AND n.bandval = o.bandval)
         |SELECT id_new, id_old, hamming, rows_deleted
         |FROM pairs, del WHERE hamming <= 2
         |ORDER BY id_new, id_old""".stripMargin,

    // q333: multi-lineage audit cell — two identical table copies
    // swept by one cron slot (one runId) record two lineage-keyed
    // lines in ONE (target, batch) cell; the audit must aggregate to
    // exactly one row per cell (recorded = covering-line count, sums
    // across lineages) plus a -1-sentinel gap row for the slot that
    // never ran. Reconstructed from the TTL predicate over the raw
    // table: rows = 2 × matching docs, dirs = 2 × distinct doomed
    // partition values.
    "q333_audit_multilineage" ->
      """WITH doomed AS (
        |  SELECT count(*) AS n_rows, count(DISTINCT source) AS n_dirs
        |  FROM documents
        |  WHERE CAST(substr(source, 4, 10) AS INT) >= 15
        |)
        |SELECT * FROM (
        |  SELECT 'ttl-sweep' AS target, CAST(5 AS BIGINT) AS batch_id,
        |    CAST(2 AS BIGINT) AS recorded,
        |    CAST(2 * n_rows AS BIGINT) AS rows_deleted,
        |    CAST(2 * n_dirs AS BIGINT) AS dirs_rewritten
        |  FROM doomed
        |  UNION ALL
        |  SELECT 'ttl-sweep', CAST(6 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
        |) ORDER BY batch_id""".stripMargin,

    // q332: SimHash admission replay — per batch doc, the sum of
    // corpus (band, bandval) bucket sizes over the doc's own cells
    // (an upper bound counting multi-cell pairs once per shared cell),
    // then the literal budget cut — the estimator reconstructed
    // index-free
    "q332_simhash_admission" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |h AS (SELECT doc_id, list_transform(tk, x -> ${md5Long("x")}) AS hs FROM t),
         |sk AS (SELECT doc_id, CAST($simhashSql AS BIGINT) AS sk FROM h),
         |banded AS (SELECT doc_id, sk, unnest([0, 1, 2, 3]) AS band FROM sk),
         |bv AS (SELECT doc_id, band, (sk >> (band * 8)) & 255 AS bandval
         |  FROM banded),
         |corp AS (SELECT band, bandval, count(*) AS bsize
         |  FROM bv WHERE NOT doc_id % 20 = 7 GROUP BY 1, 2),
         |vol AS (SELECT b.doc_id, sum(COALESCE(c.bsize, 0)) AS est
         |  FROM (SELECT * FROM bv WHERE doc_id % 20 = 7) b
         |  LEFT JOIN corp c ON b.band = c.band AND b.bandval = c.bandval
         |  GROUP BY 1)
         |SELECT doc_id, CAST(est AS BIGINT) AS est_candidates,
         |  est <= 30 AS admit
         |FROM vol ORDER BY doc_id""".stripMargin,

    // q331: stored-SimHash lifecycle replay — both probe phases
    // reconstructed index-free from the raw text (full simhash vote,
    // byte banding, band equi-join, exact Hamming cut); phase 2's
    // corpus includes batch A because the append landed it
    "q331_simhash_stored" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |h AS (SELECT doc_id, list_transform(tk, x -> ${md5Long("x")}) AS hs FROM t),
         |sk AS (SELECT doc_id, CAST($simhashSql AS BIGINT) AS sk FROM h),
         |banded AS (SELECT doc_id, sk, unnest([0, 1, 2, 3]) AS band FROM sk),
         |bv AS (SELECT doc_id, sk, band, (sk >> (band * 8)) & 255 AS bandval
         |  FROM banded),
         |ba AS (SELECT * FROM bv WHERE doc_id % 20 = 7),
         |bb AS (SELECT * FROM bv WHERE doc_id % 20 = 13),
         |corp AS (SELECT * FROM bv WHERE doc_id % 20 NOT IN (7, 13)),
         |p1 AS (SELECT DISTINCT 1 AS phase, n.doc_id AS id_new,
         |    o.doc_id AS id_old,
         |    CAST(bit_count(xor(n.sk, o.sk)) AS INTEGER) AS hamming
         |  FROM ba n JOIN corp o
         |  ON n.band = o.band AND n.bandval = o.bandval),
         |p2 AS (SELECT DISTINCT 2 AS phase, n.doc_id AS id_new,
         |    o.doc_id AS id_old,
         |    CAST(bit_count(xor(n.sk, o.sk)) AS INTEGER) AS hamming
         |  FROM bb n JOIN (SELECT * FROM corp UNION ALL SELECT * FROM ba) o
         |  ON n.band = o.band AND n.bandval = o.bandval)
         |SELECT phase, id_new, id_old, hamming
         |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
         |WHERE hamming <= 2
         |ORDER BY phase, id_new, id_old""".stripMargin,

    // q330: ledger-audit replay — every covered (target, batch) cell's
    // recorded counts must equal an independent reconstruction of that
    // batch's deletes (row count by id predicate, directory count as
    // the batch's distinct partition values — the batches are disjoint
    // id slices, so each cell is order-independent), and every gap
    // cell must surface as recorded=0 with -1 sentinels
    "q330_ledger_audit" ->
      """WITH grid AS (
        |  SELECT * FROM (VALUES
        |    ('archive', CAST(0 AS BIGINT), 1), ('archive', 1, 0),
        |    ('archive', 2, 1),
        |    ('corpus', 0, 1), ('corpus', 1, 1), ('corpus', 2, 1),
        |    ('mirror', 0, 1), ('mirror', 1, 1), ('mirror', 2, 0)
        |  ) g(target, batch_id, covered)
        |), per_batch AS (
        |  SELECT CAST(CASE CAST(doc_id % 30 AS INT)
        |      WHEN 3 THEN 0 WHEN 13 THEN 1 WHEN 23 THEN 2 END AS BIGINT)
        |      AS batch_id,
        |    count(*) AS n_rows,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_dirs
        |  FROM documents
        |  WHERE CAST(doc_id % 30 AS INT) IN (3, 13, 23)
        |  GROUP BY 1
        |)
        |SELECT g.target, g.batch_id,
        |  CAST(g.covered AS BIGINT) AS recorded,
        |  CASE WHEN g.covered = 1 THEN p.n_rows
        |    ELSE CAST(-1 AS BIGINT) END AS rows_deleted,
        |  CASE WHEN g.covered = 1 THEN p.n_dirs
        |    ELSE CAST(-1 AS BIGINT) END AS dirs_rewritten
        |FROM grid g JOIN per_batch p USING (batch_id)
        |ORDER BY target, batch_id""".stripMargin,

    // q329: footer-metadata balance replay — the per-leaf row counts
    // the maintenance window reads from parquet footer tails must
    // equal a full recount of the doubled (two-append) skewed copy,
    // and the balance ratio must match max/(total/leaves) computed in
    // the same division order (exact double identity)
    "q329_footer_balance" ->
      """WITH base AS (
        |  SELECT CASE WHEN doc_id % 10 < 5 THEN 0
        |    ELSE doc_id % 10 END AS part_g
        |  FROM documents
        |), per AS (
        |  SELECT part_g, 2 * count(*) AS leaf_rows
        |  FROM base GROUP BY part_g
        |)
        |SELECT part_g, leaf_rows,
        |  CAST(MAX(leaf_rows) OVER () AS DOUBLE) /
        |    (CAST(SUM(leaf_rows) OVER () AS DOUBLE) /
        |     CAST(COUNT(*) OVER () AS DOUBLE)) AS balance
        |FROM per ORDER BY part_g""".stripMargin,

    // q321: per batch doc, the probe's candidate-volume upper bound =
    // the sum of corpus bucket sizes over the doc's own (band, bucket)
    // cells — q29's banding replay split into corpus/batch sides
    "q321_probe_admission" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |cb AS (SELECT * FROM buckets WHERE NOT (doc_id % 20 = 7)),
         |bb AS (SELECT * FROM buckets WHERE doc_id % 20 = 7),
         |sizes AS (SELECT band, bucket, count(*) AS bsize
         |  FROM cb GROUP BY band, bucket),
         |vol AS (SELECT bb.doc_id,
         |    sum(coalesce(bsize, 0)) AS est
         |  FROM bb LEFT JOIN sizes USING (band, bucket)
         |  GROUP BY bb.doc_id)
         |SELECT doc_id, CAST(est AS BIGINT) AS est_candidates,
         |  est <= 3 AS admit
         |FROM vol ORDER BY doc_id""".stripMargin,

    // q315: the FULL component recompute over the remaining corpus
    // (q52's reach chain with the doomed canonical ids excluded),
    // diffed against the original labels. The Spark side produces the
    // same delta via the component-LOCALIZED repair
    // (Dedup.deleteRepairAssignments), so the hash match IS the
    // localized ≡ full-recompute contract — incl. component SPLITS —
    // pinned externally.
    "q315_delete_repair" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(v, u) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a),
         |old_assign AS (SELECT v AS doc_id, min(u) AS component
         |  FROM reach GROUP BY v),
         |doomed AS (SELECT component AS doc_id FROM old_assign
         |  GROUP BY component HAVING count(*) >= 2),
         |rem_edges AS (SELECT a, b FROM edges
         |  WHERE a NOT IN (SELECT doc_id FROM doomed)
         |    AND b NOT IN (SELECT doc_id FROM doomed)),
         |reach_new(v, u) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  WHERE doc_id NOT IN (SELECT doc_id FROM doomed)
         |  UNION
         |  SELECT r.v, e.b FROM reach_new r JOIN rem_edges e ON r.u = e.a),
         |new_assign AS (SELECT v AS doc_id, min(u) AS component
         |  FROM reach_new GROUP BY v)
         |SELECT n.doc_id, o.component AS old_component, n.component
         |FROM new_assign n JOIN old_assign o USING (doc_id)
         |WHERE n.component <> o.component
         |ORDER BY n.doc_id""".stripMargin,

    "q30_simhash" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |h AS (SELECT doc_id, list_transform(tk, x -> ${md5Long("x")}) AS hs FROM t)
         |SELECT doc_id, CAST($simhashSql AS BIGINT) AS simhash
         |FROM h ORDER BY doc_id""".stripMargin,

    "q51_simhash_candidates" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |h AS (SELECT doc_id, list_transform(tk, x -> ${md5Long("x")}) AS hs FROM t),
         |sk AS (SELECT doc_id, CAST($simhashSql AS BIGINT) AS sk FROM h),
         |banded AS (SELECT doc_id, sk, unnest([0, 1, 2, 3]) AS band FROM sk),
         |bv AS (SELECT doc_id, sk, band, (sk >> (band * 8)) & 255 AS bandval
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sk, b.sk)) AS INTEGER) AS hamming
         |  FROM bv a JOIN bv b
         |  ON a.band = b.band AND a.bandval = b.bandval AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 2
         |ORDER BY id_a, id_b""".stripMargin,

    "q31_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |sgl AS (SELECT doc_id, ${shingles("tk", 2)} AS sh FROM t),
         |ex AS (SELECT doc_id AS jid, unnest(list_distinct(sh)) AS sh FROM sgl),
         |sizes AS (SELECT jid, count(*) AS set_size FROM ex GROUP BY jid),
         |s3 AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h3 AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s3),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h3),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS inter_size
         |  FROM pairs
         |  JOIN ex sa ON sa.jid = pairs.id_a
         |  JOIN ex sb ON sb.jid = pairs.id_b AND sb.sh = sa.sh
         |  GROUP BY id_a, id_b)
         |SELECT id_a, id_b,
         |  ${f6("CAST(inter_size AS DOUBLE) / CAST(size_a + size_b - inter_size AS DOUBLE)")} AS jaccard
         |FROM inter
         |JOIN (SELECT jid AS id_a, set_size AS size_a FROM sizes) USING (id_a)
         |JOIN (SELECT jid AS id_b, set_size AS size_b FROM sizes) USING (id_b)
         |ORDER BY id_a, id_b""".stripMargin,

    "q32_text_stats" ->
      s"""SELECT doc_id, CAST(len($toks) AS INTEGER) AS n_tokens,
         |  CAST(length(text) AS INTEGER) AS n_chars_m,
         |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS INTEGER) AS n_punct,
         |  CAST(len(string_split_regex(trim(text), '\\s+'))
         |    + length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS INTEGER) AS token_estimate
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q33_text_quality" ->
      s"""SELECT doc_id,
         |  ${f6("nalpha / nchars")} AS alpha_ratio,
         |  ${f6("npunct / nchars")} AS punct_ratio,
         |  ${f6("nchars / nwords")} AS avg_word_len,
         |  ${f6("least(1.0, nwords / 20.0) * (nalpha / nchars)")} AS quality_score
         |FROM (
         |  SELECT doc_id,
         |    CAST(length(text) AS DOUBLE) AS nchars,
         |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS nalpha,
         |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS npunct,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS nwords
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q34_langid" -> {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val words = Map(
        "de" -> Seq("der", "und", "die", "das", "ist"),
        "en" -> Seq("the", "and", "of", "to", "is"),
        "es" -> Seq("el", "que", "los", "una", "y"),
        "fr" -> Seq("le", "la", "et", "les", "de"),
        "zh" -> Seq("的", "是", "了", "在", "我"))
      val scoreCols = langs.map { l =>
        val in = words(l).map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(tk, x -> x IN ($in))) AS BIGINT) AS s_$l"
      }.mkString(", ")
      val mx = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      val caseChain = langs.map(l => s"WHEN s_$l = mx THEN '$l'").mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang, $toks AS tk FROM documents),
         |scored AS (SELECT doc_id, lang, $scoreCols FROM t),
         |m AS (SELECT *, $mx AS mx FROM scored)
         |SELECT doc_id, lang,
         |  CASE WHEN mx = 0 THEN 'und' $caseChain ELSE 'und' END AS lang_pred
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "q35_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents)
         |SELECT doc_id, list_reduce(
         |  list_prepend(CAST(0 AS BIGINT), list_transform(tk, x -> ${md5Mod("x")})),
         |  (h, x) -> (h * 31 + x) % $P) AS fingerprint
         |FROM t ORDER BY doc_id""".stripMargin,

    "q36_json_props" ->
      s"""SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  max(k) AS max_k
        |FROM (SELECT event_type,
        |  ${jint("props", "$.k", "INTEGER")} AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q37_knn_brute_force" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
         |scored AS (SELECT query_id, e.vec_id AS neighbor_id,
         |  list_dot_product(qv, v) /
         |    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cos
         |  FROM q, e WHERE query_id <> e.vec_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, ${f6("cos")} AS cos,
         |  CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q38_knn_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |planes AS (SELECT i, j, $planeSql AS c
         |  FROM range(0, 96) t1(i), range(0, 64) t2(j)),
         |pl AS (SELECT i, list(c ORDER BY j) AS p FROM planes GROUP BY i),
         |bitvals AS (SELECT e.vec_id, pl.i,
         |  CASE WHEN list_dot_product(v, p) > 0
         |    THEN CAST(POWER(2, pl.i % 6) AS BIGINT) ELSE 0 END AS bit
         |  FROM e, pl),
         |bkts AS (SELECT vec_id, i // 6 AS tbl, sum(bit) AS bucket
         |  FROM bitvals GROUP BY 1, 2),
         |cands AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM bkts q JOIN bkts c ON q.tbl = c.tbl AND q.bucket = c.bucket
         |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
         |scored AS (SELECT query_id, neighbor_id,
         |  list_dot_product(qe.v, ce.v) /
         |    (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) AS cos
         |  FROM cands
         |  JOIN e qe ON qe.vec_id = query_id
         |  JOIN e ce ON ce.vec_id = neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, ${f6("cos")} AS cos,
         |  CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // the HLL estimate itself is engine-internal; the oracle states the
    // ±20% bound the Spark side actually checks (rsd 5% default — a
    // breach means the sketch is broken, which is exactly the signal)
    "q40_approx_distinct" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q41_data_dictionary" ->
      """SELECT table_name,
        |  array_to_string(list_sort(list(DISTINCT column_name)), '|') AS columns,
        |  min_by(incremental_reference, event_id)
        |    FILTER (WHERE incremental_reference IS NOT NULL) AS incremental_reference
        |FROM (SELECT event_type AS table_name,
        |    'col_' || CAST(user_id % 10 AS VARCHAR) AS column_name,
        |    CASE WHEN value > 150 THEN ts END AS incremental_reference,
        |    event_id
        |  FROM events)
        |GROUP BY table_name ORDER BY table_name""".stripMargin,

    "q43_training_pipeline" -> {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val words = Map(
        "de" -> Seq("der", "und", "die", "das", "ist"),
        "en" -> Seq("the", "and", "of", "to", "is"),
        "es" -> Seq("el", "que", "los", "una", "y"),
        "fr" -> Seq("le", "la", "et", "les", "de"),
        "zh" -> Seq("的", "是", "了", "在", "我"))
      val scoreCols = langs.map { l =>
        val in = words(l).map(w => s"'$w'").mkString(", ")
        s"len(list_filter(tk, x -> x IN ($in))) AS s_$l"
      }.mkString(", ")
      val mx = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      val caseChain = langs.map(l => s"WHEN s_$l = mx THEN '$l'").mkString(" ")
      val qualityScore = f6(
        "least(1.0, nwords / 20.0) * (nalpha / nchars)")
      s"""WITH base AS (SELECT doc_id, text,
         |    CAST(length(text) AS DOUBLE) AS nchars,
         |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS nalpha,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS nwords
         |  FROM documents),
         |q AS (SELECT doc_id, text, $qualityScore AS quality_score FROM base),
         |qf AS (SELECT doc_id, text, quality_score, $toks AS tk FROM q
         |  WHERE quality_score >= 0.8),
         |sc AS (SELECT *, $scoreCols FROM qf),
         |m AS (SELECT *, $mx AS mx FROM sc),
         |lf AS (SELECT doc_id, text, quality_score, tk FROM m
         |  WHERE (CASE WHEN mx = 0 THEN 'und' $caseChain ELSE 'und' END) = 'en'),
         |fp AS (SELECT *, list_reduce(
         |  list_prepend(CAST(0 AS BIGINT), list_transform(tk, x -> ${md5Mod("x")})),
         |  (h, x) -> (h * 31 + x) % $P) AS fingerprint FROM lf),
         |exact AS (SELECT * FROM fp WHERE doc_id IN (
         |  SELECT min(doc_id) FROM fp GROUP BY fingerprint)),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM exact),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
         |SELECT doc_id, CAST(len(tk) AS INTEGER) AS n_tokens, quality_score
         |FROM exact WHERE doc_id NOT IN (SELECT id_b FROM pairs)
         |ORDER BY doc_id""".stripMargin
    },

    "q49_range_join" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b
        |FROM events a JOIN events b
        |ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 600000000
        |ORDER BY id_a, id_b""".stripMargin,

    "q50_percentiles" ->
      s"""SELECT l_returnflag,
         |  ${f6("pq[1]")} AS p50, ${f6("pq[2]")} AS p95, ${f6("pq[3]")} AS p99
         |FROM (SELECT l_returnflag,
         |  quantile_cont(l_extendedprice, [0.5, 0.95, 0.99]) AS pq
         |  FROM lineitem GROUP BY l_returnflag)
         |ORDER BY l_returnflag""".stripMargin,

    "q48_asof_join" ->
      """WITH l AS (SELECT user_id AS k, ts AS _ts, 1 AS _side,
        |    CAST(NULL AS BIGINT) AS _tie, event_id,
        |    CAST(NULL AS BIGINT) AS o_orderkey,
        |    CAST(NULL AS DOUBLE) AS o_totalprice
        |  FROM events),
        |r AS (SELECT o_custkey AS k, o_orderdate AS _ts, 0 AS _side,
        |    o_orderkey AS _tie, CAST(NULL AS BIGINT) AS event_id,
        |    o_orderkey, o_totalprice
        |  FROM orders),
        |u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        |w AS (SELECT *,
        |  last_value(CASE WHEN _side = 0
        |      THEN struct_pack(ok := o_orderkey, tp := o_totalprice)
        |    END IGNORE NULLS) OVER win AS rs
        |  FROM u WINDOW win AS (PARTITION BY k
        |    ORDER BY _ts ASC, _side ASC, _tie ASC NULLS LAST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, k AS user_id, rs.ok AS asof_o_orderkey,
        |  rs.tp AS asof_o_totalprice
        |FROM w WHERE _side = 1 ORDER BY event_id""".stripMargin,

    "q47_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS INTEGER)
        |    AS n_bpe_tokens,
        |  array_to_string(
        |    regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')[1:5], '|')
        |    AS head_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q46_sql_api" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue,
        |  o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-06-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-06-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q45_embedding_near_dup" ->
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |aug AS (SELECT vec_id, v FROM base
         |  UNION ALL
         |  SELECT vec_id + 100000, list_transform(v, x -> x * 1.5) FROM base
         |  WHERE vec_id < 50),
         |planes AS (SELECT i, j, $planeSql AS c
         |  FROM range(0, 64) t1(i), range(0, 64) t2(j)),
         |pl AS (SELECT i, list(c ORDER BY j) AS p FROM planes GROUP BY i),
         |bitvals AS (SELECT aug.vec_id, pl.i,
         |  CASE WHEN list_dot_product(v, p) > 0
         |    THEN CAST(POWER(2, pl.i % 8) AS BIGINT) ELSE 0 END AS bit
         |  FROM aug, pl),
         |bkts AS (SELECT vec_id, i // 8 AS tbl, sum(bit) AS bucket
         |  FROM bitvals GROUP BY 1, 2),
         |pairs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bkts a JOIN bkts b
         |  ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |scored AS (SELECT id_a, id_b,
         |  list_dot_product(va.v, vb.v) /
         |    (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v))) AS cos
         |  FROM pairs
         |  JOIN aug va ON va.vec_id = id_a
         |  JOIN aug vb ON vb.vec_id = id_b)
         |SELECT id_a, id_b, ${f6("cos")} AS cos FROM scored
         |WHERE cos >= 0.999 ORDER BY id_a, id_b""".stripMargin,

    // frames sliced on the hex rendering (128 hex chars = 64 payload
    // bytes): byte semantics for any content, and the md5 runs over the
    // same uppercase-hex string both engines produce
    "q44_frame_sample" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT doc_id, frame_idx, CAST(length(f) // 2 AS INTEGER) AS frame_len,
        |  md5(f) AS frame_md5
        |FROM (
        |  SELECT doc_id, i AS frame_idx, substr(hx, i * 128 + 1, 128) AS f
        |  FROM b, range(0, 4) t(i)
        |  WHERE n > 0 AND i <= least(3, CAST(ceil(n / 64.0) AS INTEGER) - 1))
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // the refined-centroid CTEs replay Similarity.lloydStep exactly:
    // assignment scores are dot(v, ĉ) against L2-NORMALIZED centroids
    // (≡ cosine ordering — positive per-row scaling); refinement sums
    // floor(x*2^20) per (cell,dim) as exact integers (order-
    // independent), one double division, then re-normalizes
    "q42_knn_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent0r AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
         |cent0 AS (SELECT cid,
         |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cv
         |  FROM cent0r),
         |ac0 AS (SELECT e.vec_id, e.v, cid,
         |  list_dot_product(e.v, cv) AS ccos
         |  FROM e, cent0),
         |a0 AS (SELECT vec_id, v, cid AS cell FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, cid ASC) AS rn FROM ac0) WHERE rn = 1),
         |qsums AS (SELECT cell, j,
         |  sum(CAST(floor(v[j] * 1048576.0) AS BIGINT)) AS qsum, count(*) AS n
         |  FROM a0, range(1, 65) t(j) GROUP BY cell, j),
         |cent1 AS (SELECT cell AS cid,
         |  list((CAST(qsum AS DOUBLE) / n) / 1048576.0 ORDER BY j) AS cv
         |  FROM qsums GROUP BY cell),
         |centr AS (SELECT c0.cid, coalesce(c1.cv, c0.cv) AS cv
         |  FROM cent0r c0 LEFT JOIN cent1 c1 ON c0.cid = c1.cid),
         |cent AS (SELECT cid,
         |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cv
         |  FROM centr),
         |ac AS (SELECT e.vec_id, e.v, cid,
         |  list_dot_product(e.v, cv) AS ccos
         |  FROM e, cent),
         |assign AS (SELECT vec_id AS neighbor_id, v AS nv, cid AS cell FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, cid ASC) AS rn FROM ac) WHERE rn = 1),
         |probes AS (SELECT vec_id AS query_id, v AS qv, cid AS cell FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, cid ASC) AS rn FROM ac WHERE vec_id < 5)
         |  WHERE rn <= 4),
         |scored AS (SELECT query_id, neighbor_id,
         |  list_dot_product(qv, nv) /
         |    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS cos
         |  FROM probes JOIN assign USING (cell)
         |  WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, ${f6("cos")} AS cos,
         |  CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // byte semantics via the payload's hex rendering (2 hex chars per
    // byte) — matches Spark's UTF-8 byte payload for ANY text, not just
    // ASCII (this DuckDB build has no BLOB substring/md5)
    "q39_multimodal_features" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT doc_id, 'text/plain' AS media_type,
        |  CAST(n AS INTEGER) AS byte_len,
        |  lower(substr(hx, 1, 8)) AS header_hex,
        |  CAST(n AS DOUBLE) AS f_len,
        |  CAST(CAST('0x' || substr(hx, 1, 2) AS INT) AS DOUBLE) AS f_first,
        |  CAST(CAST('0x' || substr(hx, 2 * n - 1, 2) AS INT) AS DOUBLE) AS f_last,
        |  CAST(list_sum([CAST('0x' || substr(hx, 2 * i - 1, 2) AS INT)
        |    for i in range(1, n + 1)]) AS DOUBLE) / n AS f_mean
        |FROM b ORDER BY doc_id""".stripMargin,

    // recomputes q64's channel sums straight from the pixel formula —
    // the Spark side must recover the identical sums from actual PNG
    // bytes through ImageIO, so a match proves lossless decode
    "q64_image_decode" ->
      """SELECT d.doc_id,
        |  CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
        |  CAST(sum((d.doc_id * 31 + x.i * 7 + y.i * 13) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((d.doc_id * 17 + x.i * 11 + y.i * 3) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((d.doc_id * 5 + x.i * 19 + y.i * 29) % 256) AS BIGINT) AS sum_b
        |FROM documents d,
        |  generate_series(0, 7) AS x(i), generate_series(0, 7) AS y(i)
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    "q65_decontamination" ->
      s"""WITH t AS (SELECT doc_id, source, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, source, list_distinct(
         |    list_transform(${shingles("tk", 3)}, x -> ${md5Long("x")})) AS hs
         |  FROM t),
         |e AS (SELECT doc_id, source, unnest(hs) AS sh FROM s),
         |bench AS (SELECT DISTINCT sh FROM e WHERE source = 'src0'),
         |train AS (SELECT doc_id, sh FROM e WHERE source <> 'src0')
         |SELECT train.doc_id,
         |  CAST(count(DISTINCT train.sh) AS BIGINT) AS n_shared
         |FROM train JOIN bench USING (sh)
         |GROUP BY train.doc_id ORDER BY doc_id""".stripMargin,

    "q66_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 2)} AS bg FROM t)
         |SELECT doc_id, CAST(len(bg) AS INTEGER) AS n_bigrams,
         |  CAST(len(list_distinct(bg)) AS INTEGER) AS n_distinct_bigrams,
         |  ${f6("CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)")} AS dup_frac
         |FROM s ORDER BY doc_id""".stripMargin,

    // plain (non-interpolated) string: the regex backslashes must stay
    // literal
    "q67_pii_redaction" ->
      """WITH t AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 7 = 0
        |    THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |    ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0
        |    THEN ' call +1-555-' || CAST(doc_id % 10000 AS VARCHAR)
        |    ELSE '' END AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text2,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(text2,
        |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]+')) AS INTEGER) AS n_phones,
        |  md5(regexp_replace(regexp_replace(text2,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]+', '<PHONE>', 'g')) AS redacted_md5
        |FROM t ORDER BY doc_id""".stripMargin,

    "q68_token_budget_sample" ->
      s"""WITH t AS (SELECT doc_id, lang, len($toks) AS n_tokens,
         |    ${md5Long("CAST(doc_id AS VARCHAR)")} AS h FROM documents),
         |w AS (SELECT doc_id, lang, n_tokens,
         |  sum(n_tokens) OVER (PARTITION BY lang ORDER BY h
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens,
         |  CAST(cum AS BIGINT) AS cum_n_tokens
         |FROM w WHERE cum - n_tokens < 3000 ORDER BY doc_id""".stripMargin,

    "q69_tfidf_top_terms" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toks) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (SELECT doc_id, term,
         |    ${f6("tf * (n_docs + 1.0) / (df_t + 1.0)")} AS score
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         |r AS (SELECT doc_id, term, score, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
         |  FROM scored)
         |SELECT doc_id, term, score, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q70_stratified_sample" ->
      s"""SELECT doc_id, source FROM documents
         |WHERE ${md5Mod("CAST(doc_id AS VARCHAR)")} <
         |  CASE source WHEN 'src0' THEN ${(0.5 * Hashing.SmallPrime).toLong}
         |    WHEN 'src1' THEN ${(0.2 * Hashing.SmallPrime).toLong}
         |    ELSE ${(0.08 * Hashing.SmallPrime).toLong} END
         |ORDER BY doc_id""".stripMargin,

    "q71_length_band" ->
      """WITH b AS (SELECT quantile_disc(n_chars, 0.05) AS lo,
        |    quantile_disc(n_chars, 0.95) AS hi FROM documents)
        |SELECT doc_id, n_chars, lo, hi FROM documents CROSS JOIN b
        |WHERE n_chars BETWEEN lo AND hi ORDER BY doc_id""".stripMargin,

    // every derived double constant is interpolated from the SAME Scala
    // doubles the query uses (shortest round-trip repr), so both
    // engines evaluate bit-identical literals in the same op order
    "q72_bm25" -> {
      val terms = Seq("join", "hash", "merge")
      val (k1, b) = (1.2, 0.75)
      val contrib = s"(n_docs - df_t + 0.5) / (df_t + 0.5) * " +
        s"(tf * ${k1 + 1}) / (tf + $k1 * " +
        s"(${1 - b} + $b * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))"
      val slots = terms.map(t0 =>
        s"COALESCE(max(CASE WHEN term = '$t0' THEN contrib END), 0.0)")
        .mkString(" + ")
      s"""WITH dl AS (SELECT doc_id, len($toks) AS dl FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest($toks) AS term FROM documents)
         |  WHERE term IN (${terms.map(t0 => s"'$t0'").mkString(", ")})
         |  GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
         |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
         |per AS (SELECT tf.doc_id, tf.term, $contrib AS contrib
         |  FROM tf JOIN dfreq USING (term) JOIN dl ON dl.doc_id = tf.doc_id
         |  CROSS JOIN stats),
         |agg AS (SELECT doc_id, ${f6(slots)} AS bm25,
         |    CAST(count(*) AS INTEGER) AS n_terms_hit
         |  FROM per GROUP BY doc_id),
         |r AS (SELECT doc_id, bm25, n_terms_hit, row_number() OVER (
         |    ORDER BY bm25 DESC, doc_id ASC) AS rank FROM agg)
         |SELECT doc_id, bm25, n_terms_hit, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin
    },

    "q74_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
         |  CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
         |  count(*) AS n, ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
         |  (l_returnflag), (l_linestatus), ())
         |ORDER BY g_flag, g_status, l_returnflag ASC NULLS FIRST,
         |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "q75_outer_join" ->
      s"""WITH per AS (SELECT o_custkey AS c_custkey, count(*) AS n_orders,
         |    ${dsum("o_totalprice")} AS total_spent
         |  FROM orders GROUP BY o_custkey)
         |SELECT c_nationkey, count(*) AS n_customers,
         |  CAST(sum(CASE WHEN n_orders IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_without_orders,
         |  ${dsum("COALESCE(total_spent, 0.0)")} AS nation_spend
         |FROM customer LEFT JOIN per USING (c_custkey)
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    // the priority division is ONE double op computed identically in
    // both engines; rank ties break on doc_id
    "q81_priority_sample" ->
      s"""WITH t AS (SELECT doc_id, lang, len($toks) AS w,
         |    ${md5Long("CAST(doc_id AS VARCHAR)")} AS h FROM documents),
         |r AS (SELECT doc_id, lang, w, row_number() OVER (
         |    PARTITION BY lang
         |    ORDER BY CAST(h AS DOUBLE) / CAST(w AS DOUBLE) ASC,
         |      doc_id ASC) AS rank
         |  FROM t)
         |SELECT doc_id, lang, CAST(w AS INTEGER) AS n_tokens,
         |  CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 20 ORDER BY doc_id""".stripMargin,

    // naive a<b<c triangle count — the degree-oriented Spark plan must
    // find exactly the same triangles
    "q78_triangles" ->
      """WITH e AS (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        |  FROM lineitem l1 JOIN lineitem l2
        |  ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey)
        |SELECT (SELECT count(*) FROM e) AS n_edges,
        |  (SELECT count(*) FROM e e1
        |    JOIN e e2 ON e1.b = e2.a
        |    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles""".stripMargin,

    "q79_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |    WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts) AS c_ts FROM events e
        |    JOIN v USING (user_id)
        |    WHERE event_type = 'click' AND ts > v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts) AS p_ts FROM events e
        |    JOIN c USING (user_id)
        |    WHERE event_type = 'purchase' AND ts > c_ts GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_view_click,
        |  (SELECT count(*) FROM p) AS n_full_funnel""".stripMargin,

    "q80_cohort_retention" ->
      """WITH f AS (SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cw
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS aw FROM events)
        |SELECT CAST(cw AS VARCHAR) AS cohort_week,
        |  CAST((aw - cw) / 7 AS INTEGER) AS week_offset,
        |  count(*) AS n_active
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // shift-and-mask reconstruction of the Morton interleave — bit
    // positions are disjoint so + is |
    "q77_zorder" -> {
      val z = (0 until 16).flatMap(i => Seq(
        s"(((l_suppkey >> $i) & 1) << ${2 * i})",
        s"(((l_partkey >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      s"""SELECT l_orderkey, l_linenumber, CAST($z AS BIGINT) AS z
         |FROM lineitem
         |ORDER BY z ASC, l_orderkey ASC, l_linenumber ASC
         |LIMIT 100""".stripMargin
    },

    // the Misra-Gries sketch must be result-invisible: the oracle is
    // the PLAIN exact top-10 by frequency
    "q76_heavy_hitters" ->
      s"""WITH f AS (SELECT term, count(*) AS freq
         |  FROM (SELECT unnest($toks) AS term FROM documents) GROUP BY 1),
         |r AS (SELECT term, freq, row_number() OVER (
         |    ORDER BY freq DESC, term ASC) AS rank FROM f)
         |SELECT term, CAST(freq AS BIGINT) AS freq,
         |  CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,

    // the bloom prefilter must be result-invisible: the oracle is the
    // PLAIN semi join
    "q73_bloom_semi_join" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem
        |WHERE l_suppkey IN
        |  (SELECT s_suppkey FROM supplier WHERE s_nationkey = 3)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // replays Graph.pageRank's int64 fixed-point recurrence verbatim as
    // 10 chained CTEs — every op is an integer floor-div (DuckDB `//` ≡
    // Spark (a/b).cast(long) for the nonnegative operands here) or an
    // exact long sum, so the hash match is bit-for-bit, no tolerance.
    // Constants: Scale 2^30, damping 85/100 — interpolated from the
    // SAME Scala values the query passes to Graph.pageRank.
    "q82_pagerank" -> {
      val sc = graft.operators.Graph.Scale
      val d = 85
      def round(i: Int): String =
        s"""r$i AS MATERIALIZED (
           |  SELECT n.id,
           |    ((${(100L - d) * sc}) // (100 * nn.n))
           |      + ($d * (COALESCE(inf.inflow, 0) + (dang.dm // nn.n))) // 100
           |      AS pr
           |  FROM nodes n
           |  CROSS JOIN nn
           |  CROSS JOIN (SELECT COALESCE(CAST(SUM(r.pr) AS BIGINT), 0) AS dm
           |    FROM r${i - 1} r LEFT JOIN outdeg o USING (id)
           |    WHERE o.od IS NULL) dang
           |  LEFT JOIN (SELECT e.dst AS id,
           |      CAST(SUM(r.pr // o.od) AS BIGINT) AS inflow
           |    FROM r${i - 1} r JOIN outdeg o USING (id)
           |      JOIN edges e ON e.src = r.id
           |    GROUP BY 1) inf USING (id))""".stripMargin
      s"""WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |    SELECT l_partkey AS src, l_suppkey + 1000000 AS dst
         |    FROM lineitem
         |    UNION ALL
         |    SELECT l_suppkey + 1000000 AS src, l_partkey AS dst
         |    FROM lineitem WHERE l_suppkey % 2 = 1)),
         |nodes AS MATERIALIZED (SELECT DISTINCT id FROM (
         |    SELECT src AS id FROM edges
         |    UNION ALL SELECT dst AS id FROM edges)),
         |outdeg AS MATERIALIZED (SELECT src AS id, count(*) AS od FROM edges GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS MATERIALIZED (SELECT id, $sc // nn.n AS pr FROM nodes CROSS JOIN nn),
         |${(1 to 10).map(round).mkString(",\n")}
         |SELECT id, pr AS pr_fixed FROM r10 ORDER BY id""".stripMargin
    },

    // wedges from the degree table, triangles via the naive a<b<c SQL;
    // the coefficient division is written in the same op order as the
    // Spark query (3.0 * T, then / W) before the shared f6 floor
    "q84_clustering_coefficient" ->
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
         |  FROM lineitem l1 JOIN lineitem l2
         |  ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
         |deg AS (SELECT v, count(*) AS d FROM (
         |    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
         |  GROUP BY 1),
         |w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
         |  FROM deg),
         |t AS (SELECT count(*) AS n_triangles FROM e e1
         |  JOIN e e2 ON e1.b = e2.a
         |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
         |SELECT n_wedges, n_triangles,
         |  ${f6("3.0 * n_triangles / n_wedges")} AS global_coeff
         |FROM w CROSS JOIN t""".stripMargin,

    // replays Graph.labelPropagation's 3 synchronous rounds as chained
    // CTEs: neighbor-label counts, argmax with (count DESC, label ASC)
    // tie-break, keep-own-label for isolated nodes — every step exact
    // integer arithmetic, so the assignment hash-matches bit-for-bit
    "q86_label_propagation" -> {
      def round(i: Int): String =
        s"""l$i AS MATERIALIZED (
           |  SELECT l.id, COALESCE(n.new_label, l.label) AS label
           |  FROM l${i - 1} l LEFT JOIN (
           |    SELECT dst AS id, label AS new_label FROM (
           |      SELECT dst, label, row_number() OVER (
           |        PARTITION BY dst ORDER BY c DESC, label ASC) AS rn
           |      FROM (SELECT a.dst, l2.label, count(*) AS c
           |        FROM adj a JOIN l${i - 1} l2 ON a.src = l2.id
           |        GROUP BY 1, 2))
           |    WHERE rn = 1) n ON l.id = n.id)""".stripMargin
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
         |  FROM lineitem l1 JOIN lineitem l2
         |  ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
         |adj AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
         |  UNION SELECT b AS src, a AS dst FROM e),
         |l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label
         |  FROM adj),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT id, label FROM l3 ORDER BY id""".stripMargin
    },

    // the count-min sketch must be result-invisible: the oracle is the
    // plain exact recount over the probe terms plus TRUE for the
    // one-sided bound boolean
    "q85_count_min_freq" ->
      s"""SELECT term, CAST(count(*) AS BIGINT) AS n_exact, TRUE AS cms_ok
         |FROM (SELECT unnest($toks) AS term FROM documents)
         |WHERE term IN ('the', 'data', 'join', 'hash', 'merge')
         |GROUP BY term ORDER BY term""".stripMargin,

    // gap-split sessionization in plain SQL: identical lag/new-session/
    // running-sum windows on epoch-micros longs (exact integer math)
    "q87_batch_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us
        |  FROM events),
        |f AS (SELECT user_id, event_id, ts, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |        OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END
        |      AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY us ASC, event_id ASC)),
        |g AS (SELECT user_id, ts, CAST(SUM(new_s) OVER (
        |    PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM f)
        |SELECT user_id, session_idx, min(ts) AS session_start,
        |  max(ts) AS session_end, CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q88_rolling_time_window" ->
      """SELECT user_id, event_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS sum_1h
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS us, value
        |  FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    // ntile is BIGINT in DuckDB, INT in Spark → cast; the two ratio
    // columns are single double divisions of exact integer ranks
    "q89_rank_family" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC)
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin,

    // add-one-smoothed bigram probabilities quantized to 2^40 fixed
    // point: the division is IEEE exactly-rounded and the scaling a
    // power-of-two multiply, so pf is bit-identical here and in Spark
    // and the per-doc sum an exact integer (DuckDB sums BIGINT into
    // HUGEINT → cast back)
    "q90_bigram_lm" ->
      s"""WITH d AS (SELECT doc_id, $toks AS ts FROM documents),
         |dd AS (SELECT doc_id, ts FROM d WHERE len(ts) >= 2),
         |bi AS (SELECT doc_id, ts[g] AS u, ts[g + 1] AS v
         |  FROM (SELECT doc_id, ts,
         |    unnest(generate_series(1, len(ts) - 1)) AS g FROM dd)),
         |cuv AS (SELECT u, v, count(*) AS c_uv FROM bi GROUP BY u, v),
         |cu AS (SELECT u, count(*) AS c_u FROM bi GROUP BY u),
         |vs AS (SELECT count(DISTINCT tok) AS vsz
         |  FROM (SELECT unnest(ts) AS tok FROM dd)),
         |sc AS (SELECT doc_id,
         |    CAST(floor(CAST(c_uv + 1 AS DOUBLE) / (c_u + vsz)
         |      * 1099511627776.0) AS BIGINT) AS pf
         |  FROM bi JOIN cuv USING (u, v) JOIN cu USING (u) CROSS JOIN vs),
         |agg AS (SELECT doc_id, count(*) AS n_bigrams,
         |    CAST(sum(pf) AS BIGINT) AS sum_pf FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, sum_pf,
         |  ${f6("sum_pf / 1099511627776.0 / n_bigrams")} AS avg_prob
         |FROM agg ORDER BY doc_id""".stripMargin,

    // chunk count = 1 + max(0, ceil((n-W)/S)) in exact integer math
    // (double-floor over a small numerator, per the Spark side); chunk
    // content asserted via md5 fingerprint + length
    "q91_chunking" ->
      s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
         |c AS (SELECT doc_id, text,
         |    unnest(generate_series(0, CAST(greatest(0,
         |      floor(CAST(n - 128 + 95 AS DOUBLE) / 96)) AS BIGINT)))
         |      AS chunk_id
         |  FROM d),
         |ch AS (SELECT doc_id, chunk_id, chunk_id * 96 + 1 AS chunk_start,
         |    substr(text, CAST(chunk_id * 96 + 1 AS INTEGER), 128) AS chunk
         |  FROM c)
         |SELECT doc_id, chunk_id, chunk_start,
         |  CAST(length(chunk) AS BIGINT) AS chunk_len,
         |  ${md5Long("chunk")} AS chunk_hash
         |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,

    // concatenate-and-cut packing: per-language exclusive prefix sum
    // of token counts, window index = exact-integer floor division
    "q92_sequence_pack" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |    CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
         |o AS (SELECT doc_id, lang, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS tok_off
         |  FROM d)
         |SELECT doc_id, lang, n_tokens, tok_off,
         |  CAST(floor(CAST(tok_off AS DOUBLE) / 2048) AS BIGINT)
         |    AS seq_first,
         |  CAST(floor(CAST(tok_off + n_tokens - 1 AS DOUBLE) / 2048)
         |    AS BIGINT) AS seq_last
         |FROM o ORDER BY lang, doc_id""".stripMargin,

    // sqrt is IEEE-correctly-rounded (unlike ln/pow) and each sqrt is
    // quantized to 2^30 fixed point before the exact long denominator
    // sum, so the temperature weights replay bit-for-bit
    "q93_mixture_weights" ->
      s"""WITH d AS (SELECT source, count(*) AS n_docs,
         |    CAST(sum(len($toks)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |sq AS (SELECT source, n_docs, n_tokens,
         |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1073741824)
         |      AS BIGINT) AS sq_fixed FROM d),
         |tot AS (SELECT CAST(sum(sq_fixed) AS BIGINT) AS tot_fixed FROM sq)
         |SELECT source, n_docs, n_tokens,
         |  ${f6("CAST(sq_fixed AS DOUBLE) / tot_fixed")} AS weight,
         |  CAST(floor(10000.0 * sq_fixed / tot_fixed) AS BIGINT)
         |    AS epoch_draw
         |FROM sq CROSS JOIN tot ORDER BY source""".stripMargin,

    // per-doc-distinct 8-token spans occurring in >= 2 documents
    "q94_span_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 8)} AS sh FROM t),
         |e AS (SELECT doc_id, unnest(list_distinct(sh)) AS span FROM s)
         |SELECT span, count(*) AS n_docs, min(doc_id) AS min_doc,
         |  max(doc_id) AS max_doc
         |FROM e GROUP BY span HAVING count(*) >= 2
         |ORDER BY span""".stripMargin,

    // SCD2 merge: changed keys close the old row and open a new one,
    // unchanged history passes through
    "q95_scd2_merge" ->
      """WITH base AS (SELECT c_custkey AS k, c_mktsegment AS addr,
        |    '2024-01-01' AS valid_from, '9999-12-31' AS valid_to
        |  FROM customer),
        |upd AS (SELECT c_custkey AS k, c_mktsegment || ' rev2' AS new_addr
        |  FROM customer WHERE c_custkey % 10 = 3),
        |m AS (SELECT base.*, upd.new_addr FROM base
        |  LEFT JOIN upd USING (k)),
        |out AS (
        |  SELECT k, addr, valid_from,
        |    CASE WHEN new_addr IS NOT NULL AND new_addr <> addr
        |      THEN '2024-06-01' ELSE valid_to END AS valid_to
        |  FROM m
        |  UNION ALL
        |  SELECT k, new_addr AS addr, '2024-06-01' AS valid_from,
        |    '9999-12-31' AS valid_to
        |  FROM m WHERE new_addr IS NOT NULL AND new_addr <> addr)
        |SELECT k, addr, valid_from, valid_to,
        |  valid_to = '9999-12-31' AS is_current
        |FROM out ORDER BY k, valid_from""".stripMargin,

    // seeded md5 order, 256-way sharded with per-shard ranks
    "q96_epoch_shuffle" ->
      s"""WITH d AS (SELECT doc_id,
         |    ${md5Long("'42:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |s AS (SELECT doc_id, h, h % 256 AS shard FROM d)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY h, doc_id) AS BIGINT) AS shard_rank
         |FROM s ORDER BY shard, shard_rank""".stripMargin,

    // cumulative quality gates as conditional sums over one scan
    "q97_attrition" ->
      """SELECT count(*) AS n_total,
        |  CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_after_length,
        |  CAST(sum(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_after_words,
        |  CAST(sum(CASE WHEN p3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_after_alpha,
        |  count(DISTINCT CASE WHEN p3 THEN text END) AS n_after_dedup
        |FROM (
        |  SELECT text, p1, p1 AND nwords >= 20 AS p2,
        |    p1 AND nwords >= 20 AND nalpha / nchars >= 0.5 AS p3
        |  FROM (
        |    SELECT text, nchars >= 100 AS p1, nchars, nalpha, nwords
        |    FROM (
        |      SELECT text,
        |        CAST(length(text) AS DOUBLE) AS nchars,
        |        CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
        |          AS DOUBLE) AS nalpha,
        |        CAST(len(string_split_regex(trim(text), '\s+'))
        |          AS DOUBLE) AS nwords
        |      FROM documents)))""".stripMargin,

    // full-outer reconciliation between two derived snapshots
    "q98_snapshot_diff" ->
      """WITH a AS (SELECT o_orderkey AS k, o_totalprice AS va FROM orders),
        |b AS (SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
        |      ELSE o_totalprice END AS vb
        |  FROM orders WHERE o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000 AS k, o_totalprice AS vb
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |d AS (SELECT coalesce(a.k, b.k) AS k,
        |    CASE WHEN va IS NULL THEN 'added'
        |      WHEN vb IS NULL THEN 'removed'
        |      WHEN va <> vb THEN 'changed'
        |      ELSE 'unchanged' END AS diff_class
        |  FROM a FULL OUTER JOIN b ON a.k = b.k)
        |SELECT diff_class, count(*) AS n, min(k) AS min_key,
        |  max(k) AS max_key
        |FROM d GROUP BY diff_class ORDER BY diff_class""".stripMargin,

    // per-span distinct source sets, pair-expanded (the oracle may use
    // the quadratic self-join — correctness only)
    "q99_source_overlap" ->
      s"""WITH t AS (SELECT doc_id, source, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, source, ${shingles("tk", 8)} AS sh FROM t),
         |e AS (SELECT DISTINCT source, span FROM (
         |  SELECT source, unnest(list_distinct(sh)) AS span FROM s))
         |SELECT a.source AS src_a, b.source AS src_b,
         |  count(*) AS n_shared_spans
         |FROM e a JOIN e b ON a.span = b.span AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the oracle computes the rollup in ONE pass over the whole table;
    // the Spark side merges partial agg states (existing + delta) —
    // hash-matching proves merge ≡ recompute for the algebraic aggs
    "q100_incremental_agg" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price,
        |  strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // Deequ-shaped constraint audit: four conditional sums + a
    // uniqueness delta in one aggregate, plus the RI anti-join count
    "q101_constraint_audit" ->
      """SELECT
        |  (SELECT count(*) FROM events) AS n_rows,
        |  (SELECT CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) FROM events) AS null_user,
        |  (SELECT CAST(sum(CASE WHEN event_type NOT IN
        |    ('click','view','purchase') THEN 1 ELSE 0 END) AS BIGINT)
        |    FROM events) AS off_taxonomy,
        |  (SELECT CAST(sum(CASE WHEN value > 400.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) FROM events) AS over_cap,
        |  (SELECT count(*) - count(DISTINCT event_id) FROM events)
        |    AS dup_event_ids,
        |  (SELECT count(*) FROM events e LEFT JOIN
        |    (SELECT c_custkey FROM customer WHERE c_custkey % 4 <> 0) c
        |    ON e.user_id = c.c_custkey WHERE c.c_custkey IS NULL)
        |    AS churned_user_events""".stripMargin,

    // the naive per-purchase correlated subquery — correct by
    // construction, and free here; the Spark side runs the one-sort
    // union formulation instead
    "q102_last_touch" ->
      """WITH p AS (SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts, event_id, event_type AS channel
        |  FROM events WHERE event_type IN ('click', 'view')),
        |j AS (SELECT p.user_id,
        |    (SELECT t.channel FROM t
        |      WHERE t.user_id = p.user_id AND t.ts <= p.ts
        |      ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS attr
        |  FROM p)
        |SELECT coalesce(attr, 'none') AS channel,
        |  count(*) AS n_purchases,
        |  count(DISTINCT user_id) AS n_users
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // basket pairs via the quadratic self-join (oracle-side only);
    // confidence and lift are single IEEE divisions of exact longs
    "q103_association_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
        |item AS (SELECT l_partkey, count(*) AS c FROM li GROUP BY 1),
        |pairs AS (SELECT x.l_partkey AS a, y.l_partkey AS b,
        |    count(*) AS c_ab
        |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT a, b, c_ab, ia.c AS c_a, ib.c AS c_b,
        |  floor(CAST(c_ab AS DOUBLE) / ia.c * 1000000) / 1000000.0
        |    AS confidence,
        |  floor(CAST(n_orders * c_ab AS DOUBLE) / (ia.c * ib.c)
        |    * 1000000) / 1000000.0 AS lift
        |FROM pairs JOIN item ia ON ia.l_partkey = a
        |  JOIN item ib ON ib.l_partkey = b CROSS JOIN n
        |ORDER BY a, b""".stripMargin,

    // dense (user, day) scaffold via generate_series; zero-filled
    // counts + per-user running cumulative
    "q104_gap_fill" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events
        |  WHERE user_id % 10 = 0),
        |daily AS (SELECT user_id, day, count(*) AS n FROM ev
        |  GROUP BY 1, 2),
        |cal AS (SELECT u.user_id, d.day FROM
        |  (SELECT DISTINCT user_id FROM ev) u CROSS JOIN
        |  (SELECT unnest(generate_series(DATE '2024-01-01',
        |    DATE '2024-01-31', INTERVAL 1 DAY))::DATE AS day) d)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n_events,
        |  CAST(sum(coalesce(n, 0)) OVER (PARTITION BY user_id
        |    ORDER BY day) AS BIGINT) AS cum_events
        |FROM cal LEFT JOIN daily USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,

    // session paths: q87's session numbering, then list_sort over
    // (us, event_id, type) structs makes step order total
    "q105_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS us FROM events),
        |f AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END
        |    AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY us ASC, event_id ASC)),
        |g AS (SELECT user_id, event_type, us, event_id,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id
        |      ORDER BY us ASC, event_id ASC ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS session_idx
        |  FROM f),
        |p AS (SELECT user_id, session_idx,
        |    array_to_string(list_transform(list_sort(list(
        |      struct_pack(us := us, eid := event_id,
        |        et := event_type)))[1:5], x -> x.et), '>') AS path
        |  FROM g GROUP BY 1, 2),
        |c AS (SELECT path, count(*) AS n_sessions FROM p GROUP BY 1)
        |SELECT path, n_sessions, CAST(rank AS INTEGER) AS rank
        |FROM (SELECT *, row_number() OVER (
        |  ORDER BY n_sessions DESC, path ASC) AS rank FROM c)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // windowed distinct via day-grain expansion: each (day, user)
    // contributes to 7 window-end days
    "q106_rolling_distinct" ->
      """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |daily AS (SELECT day, count(DISTINCT user_id) AS users_1d
        |  FROM ud GROUP BY 1),
        |offs AS (SELECT CAST(unnest(generate_series(0, 6)) AS INTEGER)
        |  AS g),
        |rolling AS (SELECT tday AS day, count(DISTINCT user_id) AS users_7d
        |  FROM (SELECT ud.user_id, ud.day + offs.g AS tday
        |    FROM ud CROSS JOIN offs) x
        |  GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, users_1d, users_7d
        |FROM rolling JOIN daily USING (day)
        |WHERE day BETWEEN DATE '2024-01-07' AND DATE '2024-01-30'
        |ORDER BY day""".stripMargin,

    // spike = integer inequality n*7 > 2*sum7 (boundary-safe); mean
    // emitted f6 for the report only
    "q107_anomaly_days" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT day, n,
        |    CAST(sum(n) OVER w AS BIGINT) AS t_sum,
        |    count(n) OVER w AS t_cnt
        |  FROM daily WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT strftime(day, '%Y-%m-%d') AS day, n,
        |  floor(CAST(t_sum AS DOUBLE) / 7 * 1000000) / 1000000.0
        |    AS trailing_avg,
        |  n * 7 > t_sum * 2 AS is_spike
        |FROM t WHERE t_cnt = 7 ORDER BY day""".stripMargin,

    // per-column ANALYZE stats, one row per profiled column
    "q108_table_stats" -> {
      val statCols = Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_partkey")
      statCols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  CAST(min($c) AS DOUBLE) AS min_v,
           |  CAST(max($c) AS DOUBLE) AS max_v,
           |  count(DISTINCT $c) AS ndv,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_nulls
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    // Lloyd replayed as chained CTE blocks (the q82 pattern): round i
    // assigns with the NORMALIZED round-i centroids, re-means QUANTIZED
    // member values as exact integer sums, and coalesces empty cells to
    // the previous raw centroid — the same recurrence as
    // Similarity.lloydStep / kmeansStats, bit for bit
    "q109_kmeans" -> {
      def round(i: Int): String =
        s"""ac$i AS (SELECT e.vec_id, e.v, cid, list_dot_product(e.v, cv) AS s
           |  FROM e, cent${i}n),
           |a$i AS (SELECT vec_id, v, cid AS cell FROM (
           |  SELECT *, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY s DESC, cid ASC) AS rn FROM ac$i) WHERE rn = 1),
           |q$i AS (SELECT cell, j,
           |  sum(CAST(floor(v[j] * 1048576.0) AS BIGINT)) AS qsum,
           |  count(*) AS n
           |  FROM a$i, range(1, 65) t(j) GROUP BY cell, j),
           |m$i AS (SELECT cell AS cid,
           |  list((CAST(qsum AS DOUBLE) / n) / 1048576.0 ORDER BY j) AS cv
           |  FROM q$i GROUP BY cell),
           |cent${i + 1} AS (SELECT p.cid, coalesce(m.cv, p.cv) AS cv
           |  FROM cent$i p LEFT JOIN m$i m USING (cid)),
           |cent${i + 1}n AS (SELECT cid,
           |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cv
           |  FROM cent${i + 1})""".stripMargin
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |cent0n AS (SELECT cid,
         |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cv
         |  FROM cent0),
         |${(0 until 3).map(round).mkString(",\n")},
         |acf AS (SELECT e.vec_id, e.v, cid, list_dot_product(e.v, cv) AS s
         |  FROM e, cent3n),
         |af AS (SELECT vec_id, v, cid AS cell, s AS score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY s DESC, cid ASC) AS rn FROM acf) WHERE rn = 1),
         |st AS (SELECT cell, count(*) AS n,
         |  sum(CAST(floor(score / sqrt(list_dot_product(v, v))
         |    * 1048576.0) AS BIGINT)) AS qc
         |  FROM af GROUP BY cell)
         |SELECT CAST(st.cell AS INTEGER) AS cell, CAST(st.n AS BIGINT) AS n,
         |  ${f6("(CAST(st.qc AS DOUBLE) / st.n) / 1048576.0")} AS mean_cos,
         |  ${f6("c.cv[1]")} AS c0, ${f6("c.cv[2]")} AS c1,
         |  ${f6("c.cv[3]")} AS c2, ${f6("c.cv[4]")} AS c3
         |FROM st JOIN cent3 c ON c.cid = st.cell
         |ORDER BY cell""".stripMargin
    },

    // DuckDB's windowed sum(BIGINT) is HUGEINT — the integer DIV
    // arithmetic is exact either way; cast the outputs back to BIGINT
    "q110_pps_sample" ->
      """WITH d AS (SELECT doc_id, source, coalesce(n_chars, 0) AS w
        |  FROM documents),
        |tot AS (SELECT source, sum(w) AS tw FROM d GROUP BY source),
        |c AS (SELECT doc_id, source, w,
        |  sum(w) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT doc_id, source, CAST(w AS BIGINT) AS w,
        |  CAST((cum * 32) // tw AS BIGINT) AS pick
        |FROM c JOIN tot USING (source)
        |WHERE tw > 0 AND (cum * 32) // tw > ((cum - w) * 32) // tw
        |ORDER BY source, doc_id""".stripMargin,

    // sketches replayed as full-distinct-list slices (the q53 form);
    // the set-op estimators are integer/md5-deterministic end to end
    "q111_kmv_set_ops" ->
      s"""WITH h AS (SELECT DISTINCT event_type AS t, user_id AS u,
         |    ${md5Long("CAST(user_id AS VARCHAR)")} AS h
         |  FROM events),
         |sk AS (SELECT t, list_sort(list(DISTINCT h))[1:32] AS m,
         |    count(DISTINCT u) AS nd
         |  FROM h GROUP BY t),
         |p AS (SELECT a.t AS type_a, b.t AS type_b, a.m AS ma, b.m AS mb,
         |    a.nd AS nda, b.nd AS ndb
         |  FROM sk a JOIN sk b ON a.t < b.t),
         |u AS (SELECT *, list_sort(list_distinct(ma || mb))[1:32] AS mu
         |  FROM p),
         |e AS (SELECT *,
         |  CASE WHEN len(mu) < 32 THEN len(mu)
         |    ELSE CAST(floor(31.0 * 1152921504606846976.0 / mu[32]) AS BIGINT)
         |  END AS est_union,
         |  len(list_filter(mu, x -> list_contains(ma, x)
         |    AND list_contains(mb, x))) AS ns
         |  FROM u),
         |xi AS (SELECT x.t AS type_a, y.t AS type_b,
         |    count(*) AS exact_intersect
         |  FROM (SELECT DISTINCT event_type AS t, user_id AS u FROM events) x
         |  JOIN (SELECT DISTINCT event_type AS t, user_id AS u FROM events) y
         |    ON x.u = y.u AND x.t < y.t
         |  GROUP BY 1, 2)
         |SELECT e.type_a, e.type_b,
         |  CAST(e.est_union AS BIGINT) AS est_union,
         |  CAST((e.ns * e.est_union) // 32 AS BIGINT) AS est_intersect,
         |  CAST(e.nda + e.ndb - coalesce(xi.exact_intersect, 0)
         |    AS BIGINT) AS exact_union,
         |  CAST(coalesce(xi.exact_intersect, 0) AS BIGINT) AS exact_intersect
         |FROM e LEFT JOIN xi USING (type_a, type_b)
         |ORDER BY type_a, type_b""".stripMargin,

    // the GK sketch is merge-order-dependent so it must be
    // result-invisible: the oracle states the exact quantiles and TRUE
    // for the bound booleans (rank error ≤ n/accuracy by construction)
    "q83_approx_percentile" ->
      s"""SELECT l_returnflag,
         |  ${f6("pq[2]")} AS p50, ${f6("pq[5]")} AS p95,
         |  TRUE AS approx50_ok, TRUE AS approx95_ok
         |FROM (SELECT l_returnflag,
         |  quantile_cont(l_extendedprice,
         |    [0.48, 0.5, 0.52, 0.93, 0.95, 0.97]) AS pq
         |  FROM lineitem GROUP BY l_returnflag)
         |ORDER BY l_returnflag""".stripMargin,

    "q112_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events),
        |isl AS (SELECT user_id, d,
        |  d - CAST(row_number() OVER
        |    (PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
        |  FROM days)
        |SELECT user_id, strftime(min(d), '%Y-%m-%d') AS streak_start,
        |  strftime(max(d), '%Y-%m-%d') AS streak_end,
        |  count(*) AS days
        |FROM isl GROUP BY user_id, grp HAVING count(*) >= 3
        |ORDER BY user_id, streak_start""".stripMargin,

    "q113_pivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  count(*) FILTER (o_orderstatus = 'F') AS f_cnt,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'F') AS DOUBLE), 0.0) AS f_rev,
        |  count(*) FILTER (o_orderstatus = 'O') AS o_cnt,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'O') AS DOUBLE), 0.0) AS o_rev,
        |  count(*) FILTER (o_orderstatus = 'P') AS p_cnt,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'P') AS DOUBLE), 0.0) AS p_rev
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,

    "q114_unpivot" ->
      """WITH wide AS (SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price,
        |  CAST(count(*) AS DOUBLE) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, measure, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value
        |    FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_price', sum_price FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'cnt', cnt FROM wide)
        |ORDER BY l_returnflag, measure""".stripMargin,

    // independent algorithm: quadratic NOT-EXISTS dominance definition
    // vs the query's running-max frontier scan
    "q115_skyline" ->
      """WITH best AS (SELECT p_retailprice AS price,
        |    CAST(max(p_size) AS BIGINT) AS size
        |  FROM part GROUP BY 1)
        |SELECT price, size FROM best b
        |WHERE NOT EXISTS (SELECT 1 FROM best o
        |  WHERE o.price < b.price AND o.size >= b.size)
        |ORDER BY price""".stripMargin,

    "q116_mode_per_group" ->
      """WITH counts AS (SELECT c_mktsegment AS segment,
        |    o_orderpriority AS prio, count(*) AS cnt
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT segment, prio AS mode_priority, cnt FROM (
        |  SELECT *, row_number() OVER (PARTITION BY segment
        |    ORDER BY cnt DESC, prio) AS rn FROM counts)
        |WHERE rn = 1 ORDER BY segment""".stripMargin,

    "q117_histogram" ->
      """SELECT bucket, CAST(bucket * 25000 AS DOUBLE) AS lo,
        |  CAST((bucket + 1) * 25000 AS DOUBLE) AS hi, count(*) AS cnt
        |FROM (SELECT CAST(floor(o_totalprice /
        |  CAST(25000.0 AS DOUBLE)) AS BIGINT) AS bucket FROM orders)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    // exact integer moments (DuckDB sums BIGINT into HUGEINT — exact
    // like the Spark side's DECIMAL(38,0)); the closed-form corr is one
    // double expression over identical integers in both engines
    "q118_corr_moments" ->
      s"""WITH m AS (SELECT l_returnflag,
         |  CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS ix,
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS iy
         |  FROM lineitem),
         |a AS (SELECT l_returnflag, count(*) AS n,
         |  CAST(sum(ix) AS DOUBLE) AS sx, CAST(sum(iy) AS DOUBLE) AS sy,
         |  CAST(sum(ix * ix) AS DOUBLE) AS sxx,
         |  CAST(sum(iy * iy) AS DOUBLE) AS syy,
         |  CAST(sum(ix * iy) AS DOUBLE) AS sxy
         |  FROM m GROUP BY 1)
         |SELECT l_returnflag, n,
         |  ${f6("(CAST(n AS DOUBLE) * sxy - sx * sy) / " +
             "(sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * " +
             "sqrt(CAST(n AS DOUBLE) * syy - sy * sy))")} AS corr
         |FROM a ORDER BY l_returnflag""".stripMargin,

    "q119_decile_stats" ->
      s"""WITH d AS (SELECT c_mktsegment AS segment, c_acctbal,
         |  CAST(ntile(10) OVER (PARTITION BY c_mktsegment
         |    ORDER BY c_acctbal, c_custkey) AS BIGINT) AS decile
         |  FROM customer)
         |SELECT segment, decile, count(*) AS cnt,
         |  min(c_acctbal) AS lo, max(c_acctbal) AS hi,
         |  ${f6("CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)" +
             " / count(*)")} AS mean_bal
         |FROM d GROUP BY 1, 2 ORDER BY segment, decile""".stripMargin,

    "q120_fuzzy_match" ->
      """WITH n AS (SELECT c_name AS name, substr(c_name, 1, 16) AS blk
        |  FROM customer)
        |SELECT a.name AS name, count(*) AS n_fuzzy
        |FROM n a JOIN n b ON a.blk = b.blk AND a.name <> b.name
        |  AND levenshtein(a.name, b.name) <= 1
        |GROUP BY 1 ORDER BY name""".stripMargin,

    // the EWMA recurrence replayed as a recursive CTE over day rank —
    // integer halving, so both engines walk identical longs
    "q121_ewma" ->
      """WITH RECURSIVE daily AS (
        |  SELECT o_orderpriority AS prio,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS x,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d'))
        |      AS rn
        |  FROM orders GROUP BY 1, 2),
        |r AS (
        |  SELECT prio, day, rn, x AS e FROM daily WHERE rn = 1
        |  UNION ALL
        |  SELECT d.prio, d.day, d.rn, (d.x + r.e) // 2
        |  FROM daily d JOIN r ON d.prio = r.prio AND d.rn = r.rn + 1)
        |SELECT prio, day, CAST(e AS BIGINT) AS ewma FROM r
        |ORDER BY prio, day""".stripMargin,

    "q122_novelty" ->
      s"""WITH t AS (SELECT doc_id, source, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, source,
         |    unnest(list_distinct(${shingles("tk", 3)})) AS sh FROM t),
         |f AS (SELECT sh, min(doc_id) AS first_doc FROM s GROUP BY 1)
         |SELECT s.doc_id, s.source, count(*) AS n_shingles,
         |  count(*) FILTER (f.first_doc = s.doc_id) AS n_novel,
         |  ${f6("CAST(count(*) FILTER (f.first_doc = s.doc_id) AS DOUBLE)" +
             " / CAST(count(*) AS DOUBLE)")} AS novelty
         |FROM s JOIN f USING (sh)
         |GROUP BY 1, 2 ORDER BY s.doc_id""".stripMargin,

    "q123_filter_funnel" ->
      """SELECT source,
        |  CASE WHEN length(text) < 100 THEN 'too_short'
        |    WHEN length(text) > 5000 THEN 'too_long'
        |    WHEN length(regexp_replace(text, '[A-Za-z ]', '', 'g')) * 10
        |      > length(text) * 3 THEN 'too_symbolic'
        |    ELSE 'pass' END AS verdict,
        |  count(*) AS cnt
        |FROM documents GROUP BY 1, 2 ORDER BY source, verdict""".stripMargin,

    // q52's recursive-reachability components + per-component argmax
    "q124_cluster_rep" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(v, u) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a),
         |comp AS (SELECT v AS doc_id, min(u) AS component FROM reach
         |  GROUP BY v),
         |rk AS (SELECT c.component, c.doc_id, d.n_chars,
         |  row_number() OVER (PARTITION BY c.component
         |    ORDER BY d.n_chars DESC, c.doc_id) AS rn
         |  FROM comp c JOIN documents d USING (doc_id))
         |SELECT component, count(*) AS cluster_size,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS rep_doc_id,
         |  max(CASE WHEN rn = 1 THEN n_chars END) AS rep_n_chars
         |FROM rk GROUP BY 1 ORDER BY component""".stripMargin,

    "q125_next_event_pairs" ->
      """SELECT user_id, event_id, context, label FROM (
        |  SELECT user_id, event_id,
        |    concat_ws('>', lag(event_type, 3) OVER win,
        |      lag(event_type, 2) OVER win, lag(event_type, 1) OVER win,
        |      event_type) AS context,
        |    lead(event_type, 1) OVER win AS label
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
        |WHERE label IS NOT NULL ORDER BY user_id, event_id""".stripMargin,

    // the leakage audit recomputed from raw events, not from the
    // construction
    "q126_grouped_split" ->
      s"""WITH ev AS (SELECT *,
         |  CASE WHEN ${md5Long("CAST(user_id AS VARCHAR)")} % 100 < 90
         |    THEN 'train' ELSE 'valid' END AS split FROM events),
         |leak AS (SELECT count(*) FILTER (ns > 1) AS leaked_users
         |  FROM (SELECT user_id, count(DISTINCT split) AS ns
         |    FROM ev GROUP BY 1))
         |SELECT split, count(DISTINCT user_id) AS n_users,
         |  count(*) AS n_events, leak.leaked_users
         |FROM ev CROSS JOIN leak
         |GROUP BY split, leak.leaked_users ORDER BY split""".stripMargin,

    "q127_multi_grain_distinct" ->
      """WITH e AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |    event_type, user_id FROM events)
        |SELECT day, event_type,
        |  CAST(grouping(day) AS INT) AS g_day,
        |  CAST(grouping(event_type) AS INT) AS g_type,
        |  count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM e
        |GROUP BY GROUPING SETS ((day), (event_type), (day, event_type), ())
        |ORDER BY g_day, g_type, day ASC NULLS FIRST,
        |  event_type ASC NULLS FIRST""".stripMargin,

    "q128_interval_merge" ->
      """WITH iv AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS st,
        |    epoch_us(CAST(ts AS TIMESTAMP)) + 300000000 AS en
        |  FROM events),
        |m AS (SELECT user_id, st, en,
        |  max(en) OVER (PARTITION BY user_id ORDER BY st
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM iv),
        |i AS (SELECT *, sum(CASE WHEN pme IS NULL OR st > pme
        |    THEN 1 ELSE 0 END)
        |  OVER (PARTITION BY user_id ORDER BY st) AS island FROM m)
        |SELECT user_id, CAST(island AS BIGINT) AS island,
        |  min(st) AS start_us, max(en) AS end_us, count(*) AS n_events
        |FROM i GROUP BY 1, 2 ORDER BY user_id, island""".stripMargin,

    "q129_revenue_share" ->
      s"""WITH rev AS (SELECT n_regionkey AS regionkey, n_name AS nation,
         |  sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
         |    AS cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY 1, 2)
         |SELECT regionkey, nation,
         |  CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
         |  ${f6("CAST(cents AS DOUBLE) / CAST(sum(cents) OVER " +
             "(PARTITION BY regionkey) AS DOUBLE)")} AS share
         |FROM rev ORDER BY regionkey, nation""".stripMargin,

    "q130_chi_square" ->
      s"""WITH cell AS (SELECT lang, source, count(*) AS o
         |  FROM documents GROUP BY 1, 2),
         |rm AS (SELECT lang, sum(o) AS rm FROM cell GROUP BY 1),
         |cm AS (SELECT source, sum(o) AS cm FROM cell GROUP BY 1),
         |n AS (SELECT sum(o) AS n FROM cell)
         |SELECT cell.lang, cell.source, cell.o,
         |  ${f6("CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE) / " +
             "CAST(n.n AS DOUBLE)")} AS expected,
         |  ${f6("(CAST(o AS DOUBLE) - CAST(rm AS DOUBLE) * " +
             "CAST(cm AS DOUBLE) / CAST(n.n AS DOUBLE)) * " +
             "(CAST(o AS DOUBLE) - CAST(rm AS DOUBLE) * " +
             "CAST(cm AS DOUBLE) / CAST(n.n AS DOUBLE)) / " +
             "(CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE) / " +
             "CAST(n.n AS DOUBLE))")} AS chi2_term
         |FROM cell JOIN rm USING (lang) JOIN cm USING (source)
         |  CROSS JOIN n
         |ORDER BY lang, source""".stripMargin,

    "q131_assortativity" ->
      s"""WITH e AS (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
         |  FROM lineitem l1 JOIN lineitem l2
         |  ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
         |b AS (SELECT a AS x, b AS y FROM e
         |  UNION ALL SELECT b, a FROM e),
         |deg AS (SELECT x AS v, count(*) AS d FROM b GROUP BY 1),
         |p AS (SELECT dx.d AS dx, dy.d AS dy FROM b
         |  JOIN deg dx ON b.x = dx.v JOIN deg dy ON b.y = dy.v),
         |m AS (SELECT count(*) AS n,
         |  CAST(sum(dx) AS DOUBLE) AS sx, CAST(sum(dy) AS DOUBLE) AS sy,
         |  CAST(sum(dx * dx) AS DOUBLE) AS sxx,
         |  CAST(sum(dy * dy) AS DOUBLE) AS syy,
         |  CAST(sum(dx * dy) AS DOUBLE) AS sxy FROM p)
         |SELECT n AS n_pairs,
         |  ${f6("(CAST(n AS DOUBLE) * sxy - sx * sy) / " +
             "(sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * " +
             "sqrt(CAST(n AS DOUBLE) * syy - sy * sy))")} AS assortativity
         |FROM m""".stripMargin,

    "q132_class_cap_sample" ->
      s"""WITH h AS (SELECT vec_id, label,
         |    ${md5Long("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |r AS (SELECT *, row_number() OVER (PARTITION BY label
         |    ORDER BY h, vec_id) AS rn FROM h)
         |SELECT label, count(*) AS n_kept,
         |  array_to_string(list_sort(list(CAST(vec_id AS VARCHAR))), '|')
         |    AS kept_ids
         |FROM r WHERE rn <= 20 GROUP BY label ORDER BY label""".stripMargin,

    "q133_skew_report" ->
      """WITH perkey AS (SELECT l_orderkey, count(*) AS n
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(length(bin(n)) AS INT) AS bucket,
        |  count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS rows,
        |  min(n) AS min_n, max(n) AS max_n
        |FROM perkey GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q134_wilson_ci" ->
      s"""WITH a AS (SELECT source, count(*) AS n,
         |  count(*) FILTER (length(text) >= 100 AND length(text) <= 5000)
         |    AS k
         |  FROM documents GROUP BY 1),
         |d AS (SELECT source, n, k,
         |  CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         |  CAST(n AS DOUBLE) AS nd,
         |  CAST(1.96 AS DOUBLE) AS z FROM a)
         |SELECT source, n, k, ${f6("p")} AS pass_rate,
         |  ${f6("((p + z * z / (nd * 2.0)) - z * " +
             "sqrt(p * (1.0 - p) / nd + z * z / (nd * nd * 4.0)))" +
             " / (1.0 + z * z / nd)")} AS ci_lo,
         |  ${f6("((p + z * z / (nd * 2.0)) + z * " +
             "sqrt(p * (1.0 - p) / nd + z * z / (nd * nd * 4.0)))" +
             " / (1.0 + z * z / nd)")} AS ci_hi
         |FROM d ORDER BY source""".stripMargin,

    "q135_json_extract" ->
      s"""SELECT event_type, count(*) AS n,
        |  count(k) AS n_parsed, min(k) AS min_k, max(k) AS max_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (SELECT event_type,
        |  ${jint("props", "$.k")} AS k
        |  FROM events)
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q136_k_anonymity" ->
      """WITH g AS (SELECT c_mktsegment, c_nationkey, count(*) AS n
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(10 AS BIGINT) AS k, count(*) AS n_groups,
        |  count(*) FILTER (n < 10) AS n_violating,
        |  CAST(coalesce(sum(n) FILTER (n < 10), 0) AS BIGINT)
        |    AS rows_at_risk,
        |  min(n) AS min_group
        |FROM g""".stripMargin,

    // q29's candidate pairs + plain-shingle intersection; containments
    // are f6-floored BEFORE the threshold filter on both sides
    "q137_containment" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |sp AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |u AS (SELECT doc_id, unnest(list_distinct(sh)) AS g FROM sp),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM sp),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |sz AS (SELECT doc_id, count(*) AS sz FROM u GROUP BY 1),
         |inter AS (SELECT p.id_a, p.id_b, count(*) AS common
         |  FROM pairs p JOIN u a ON a.doc_id = p.id_a
         |  JOIN u b ON b.doc_id = p.id_b AND b.g = a.g
         |  GROUP BY 1, 2),
         |c AS (SELECT i.id_a, i.id_b, i.common,
         |  ${f6("CAST(i.common AS DOUBLE) / CAST(sa.sz AS DOUBLE)")}
         |    AS containment_a,
         |  ${f6("CAST(i.common AS DOUBLE) / CAST(sb.sz AS DOUBLE)")}
         |    AS containment_b
         |  FROM inter i JOIN sz sa ON sa.doc_id = i.id_a
         |  JOIN sz sb ON sb.doc_id = i.id_b)
         |SELECT * FROM c
         |WHERE containment_a >= 0.9 OR containment_b >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,

    "q138_weighted_median" ->
      """WITH g AS (SELECT l_returnflag, l_extendedprice AS v,
        |  sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, v, w,
        |  sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
        |  sum(w) OVER (PARTITION BY l_returnflag) AS tw FROM g)
        |SELECT l_returnflag, min(v) AS weighted_median,
        |  CAST(max(tw) AS BIGINT) AS total_weight
        |FROM c WHERE cw * 2 >= tw
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q139_trend_slope" ->
      s"""WITH daily AS (SELECT o_orderpriority AS prio,
         |  datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |    AS x,
         |  sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
         |    AS y
         |  FROM orders GROUP BY 1, 2),
         |m AS (SELECT prio, count(*) AS n,
         |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |  CAST(sum(x * x) AS DOUBLE) AS sxx,
         |  CAST(sum(x * y) AS DOUBLE) AS sxy
         |  FROM daily GROUP BY 1)
         |SELECT prio, n AS n_days,
         |  ${f6("(CAST(n AS DOUBLE) * sxy - sx * sy) / " +
             "(CAST(n AS DOUBLE) * sxx - sx * sx)")} AS slope_cents_per_day,
         |  ${f6("(sy - (CAST(n AS DOUBLE) * sxy - sx * sy) / " +
             "(CAST(n AS DOUBLE) * sxx - sx * sx) * sx) / " +
             "CAST(n AS DOUBLE)")} AS intercept_cents
         |FROM m ORDER BY prio""".stripMargin,

    "q140_temporal_join" ->
      """WITH dim AS (
        |  SELECT c_custkey, c_mktsegment AS segment,
        |    '0001-01-01' AS eff_from, '1997-01-01' AS eff_to
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 = 0 THEN 'MACHINERY'
        |      ELSE c_mktsegment END,
        |    '1997-01-01', '9999-12-31'
        |  FROM customer),
        |o AS (SELECT o_orderkey, o_custkey,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS od
        |  FROM orders)
        |SELECT segment, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_customers
        |FROM o JOIN dim ON o_custkey = c_custkey
        |  AND od >= eff_from AND od < eff_to
        |GROUP BY 1 ORDER BY segment""".stripMargin,

    "q141_cohens_kappa" ->
      s"""WITH cls AS (SELECT
         |  CASE WHEN length(text) >= 500 THEN 1 ELSE 0 END AS a,
         |  CASE WHEN (length(text) -
         |    length(regexp_replace(text, '[0-9]', '', 'g'))) * 50
         |    < length(text) THEN 1 ELSE 0 END AS b
         |  FROM documents),
         |m AS (SELECT count(*) AS n,
         |  count(*) FILTER (a = b) AS agree,
         |  count(*) FILTER (a = 1) AS a1,
         |  count(*) FILTER (b = 1) AS b1 FROM cls),
         |d AS (SELECT n, agree, a1, b1,
         |  CAST(n AS DOUBLE) AS nd,
         |  CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
         |  (CAST(a1 AS DOUBLE) / CAST(n AS DOUBLE)) *
         |    (CAST(b1 AS DOUBLE) / CAST(n AS DOUBLE)) +
         |  ((CAST(n AS DOUBLE) - CAST(a1 AS DOUBLE)) / CAST(n AS DOUBLE)) *
         |    ((CAST(n AS DOUBLE) - CAST(b1 AS DOUBLE)) / CAST(n AS DOUBLE))
         |    AS pe
         |  FROM m)
         |SELECT n, agree, a1, b1, ${f6("po")} AS po, ${f6("pe")} AS pe,
         |  ${f6("(po - pe) / (1.0 - pe)")} AS kappa
         |FROM d""".stripMargin,

    "q142_rfm_segments" ->
      """WITH per AS (SELECT o_custkey,
        |  max(strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')) AS last_od,
        |  count(*) AS freq,
        |  sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    AS cents
        |  FROM orders GROUP BY 1),
        |scored AS (SELECT cents,
        |  ntile(5) OVER (ORDER BY last_od DESC, o_custkey) AS r,
        |  ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f,
        |  ntile(5) OVER (ORDER BY cents DESC, o_custkey) AS m
        |  FROM per)
        |SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS segment,
        |  count(*) AS n_customers,
        |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) AS cents_sum
        |FROM scored GROUP BY 1 ORDER BY segment""".stripMargin,

    "q143_time_to_convert" ->
      """WITH ev AS (SELECT user_id, event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |fv AS (SELECT user_id, min(us) AS v_us FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |conv AS (SELECT e.user_id, min(e.us - fv.v_us) AS dt_us
        |  FROM ev e JOIN fv USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.us >= fv.v_us
        |  GROUP BY 1)
        |SELECT count(*) AS n_converted,
        |  CAST(quantile_disc(dt_us, 0.5) AS BIGINT) AS p50_us,
        |  CAST(quantile_disc(dt_us, 0.95) AS BIGINT) AS p95_us,
        |  max(dt_us) AS max_us
        |FROM conv""".stripMargin,

    "q144_survivorship" ->
      s"""WITH base AS (SELECT user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
        |  CASE WHEN event_type = 'purchase' THEN value END
        |    AS purchase_value,
        |  CASE WHEN ${jint("props", "$.k")}
        |    % 7 <> 0
        |    THEN ${jint("props", "$.k")} END
        |    AS k
        |  FROM events),
        |f1 AS (SELECT user_id, purchase_value FROM (
        |  SELECT user_id, purchase_value, row_number() OVER
        |    (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
        |  FROM base WHERE purchase_value IS NOT NULL) WHERE rn = 1),
        |f2 AS (SELECT user_id, k FROM (
        |  SELECT user_id, k, row_number() OVER
        |    (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
        |  FROM base WHERE k IS NOT NULL) WHERE rn = 1)
        |SELECT g.user_id, g.n_updates, f1.purchase_value,
        |  f2.k AS last_k
        |FROM (SELECT user_id, count(*) AS n_updates FROM base
        |  GROUP BY 1) g
        |LEFT JOIN f1 USING (user_id) LEFT JOIN f2 USING (user_id)
        |ORDER BY g.user_id""".stripMargin,

    "q145_datasheet" ->
      s"""WITH a AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  count(DISTINCT lang) AS n_langs,
         |  count(*) - count(DISTINCT md5(text)) AS n_exact_dups,
         |  count(*) FILTER (length(text) < 100) AS n_short
         |  FROM documents GROUP BY 1)
         |SELECT source, n_docs, total_chars, n_langs, n_exact_dups,
         |  ${f6("CAST(n_exact_dups AS DOUBLE) / CAST(n_docs AS DOUBLE)")}
         |    AS dup_rate,
         |  ${f6("CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE)")}
         |    AS mean_chars,
         |  n_short
         |FROM a ORDER BY source""".stripMargin,

    "q146_curriculum" ->
      """WITH w AS (SELECT doc_id, source,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY n_chars, doc_id) AS BIGINT) AS within_rank
        |  FROM documents)
        |SELECT CAST(row_number() OVER (ORDER BY within_rank, source,
        |    doc_id) AS BIGINT) AS position,
        |  doc_id, source, within_rank
        |FROM w ORDER BY position""".stripMargin,

    "q147_shard_balance" ->
      s"""WITH per AS (SELECT
         |  ${md5Long("'42:' || CAST(doc_id AS VARCHAR)")} % 256 AS shard,
         |  count(*) AS n
         |  FROM documents GROUP BY 1)
         |SELECT count(*) AS n_shards, min(n) AS min_n, max(n) AS max_n,
         |  CAST(sum(n) AS BIGINT) AS total,
         |  ${f6("CAST(max(n) AS DOUBLE) / CAST(min(n) AS DOUBLE)")}
         |    AS balance_ratio
         |FROM per""".stripMargin,

    "q148_epoch_decorrelation" ->
      s"""WITH r AS (SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY
         |    ${md5Long("'42:' || CAST(doc_id AS VARCHAR)")}, doc_id)
         |    AS BIGINT) AS r1,
         |  CAST(row_number() OVER (ORDER BY
         |    ${md5Long("'43:' || CAST(doc_id AS VARCHAR)")}, doc_id)
         |    AS BIGINT) AS r2
         |  FROM documents),
         |m AS (SELECT count(*) AS n,
         |  CAST(sum(r1) AS DOUBLE) AS sx, CAST(sum(r2) AS DOUBLE) AS sy,
         |  CAST(sum(r1 * r1) AS DOUBLE) AS sxx,
         |  CAST(sum(r2 * r2) AS DOUBLE) AS syy,
         |  CAST(sum(r1 * r2) AS DOUBLE) AS sxy FROM r),
         |d AS (SELECT n,
         |  (CAST(n AS DOUBLE) * sxy - sx * sy) /
         |  (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
         |   sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS rho FROM m)
         |SELECT n AS n_docs, ${f6("rho")} AS spearman_rho,
         |  abs(rho) < 0.1 AS decorrelated
         |FROM d""".stripMargin,

    "q149_mad" ->
      """WITH o AS (SELECT o_orderpriority AS prio,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |med AS (SELECT prio, CAST(quantile_disc(c, 0.5) AS BIGINT) AS m
        |  FROM o GROUP BY 1)
        |SELECT prio, max(m) AS median_cents,
        |  CAST(quantile_disc(abs(c - m), 0.5) AS BIGINT) AS mad_cents,
        |  count(*) AS n
        |FROM o JOIN med USING (prio)
        |GROUP BY prio ORDER BY prio""".stripMargin,

    "q150_winsorized_mean" ->
      s"""WITH o AS (SELECT o_orderpriority AS prio,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM orders),
         |b AS (SELECT prio,
         |  CAST(quantile_disc(c, 0.05) AS BIGINT) AS lo,
         |  CAST(quantile_disc(c, 0.95) AS BIGINT) AS hi
         |  FROM o GROUP BY 1)
         |SELECT prio, count(*) AS n,
         |  ${f6("CAST(sum(greatest(lo, least(hi, c))) AS DOUBLE) / " +
             "CAST(count(*) AS DOUBLE) / 100.0")} AS winsorized_mean
         |FROM o JOIN b USING (prio)
         |GROUP BY prio ORDER BY prio""".stripMargin,

    "q151_benford" ->
      s"""WITH per AS (SELECT
         |  substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
         |    1, 1) AS first_digit,
         |  count(*) AS n
         |  FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1)
         |SELECT first_digit, n,
         |  ${f6("CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE)")}
         |    AS share
         |FROM per ORDER BY first_digit""".stripMargin,

    "q152_schema_evolution" ->
      s"""SELECT event_type, count(*) AS n, count(k) AS n_with_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (
        |  SELECT event_type, CAST(NULL AS BIGINT) AS k FROM events
        |  WHERE event_id % 2 = 0
        |  UNION ALL
        |  SELECT event_type,
        |    ${jint("props", "$.k")}
        |  FROM events WHERE event_id % 2 <> 0)
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q153_regex_parse" ->
      """WITH p AS (SELECT c_custkey,
        |  CASE WHEN regexp_extract(c_name, '^Customer#(\d+)$', 1) <> ''
        |    THEN CAST(regexp_extract(c_name, '^Customer#(\d+)$', 1)
        |      AS BIGINT) END AS parsed_id
        |  FROM customer)
        |SELECT count(*) AS n, count(parsed_id) AS n_parsed,
        |  count(*) FILTER (parsed_id = c_custkey) AS n_consistent,
        |  count(*) FILTER (parsed_id IS NULL OR parsed_id <> c_custkey)
        |    AS n_bad
        |FROM p""".stripMargin,

    "q154_cuped" ->
      s"""WITH per AS (SELECT user_id,
         |  sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
         |    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    ELSE 0 END) AS x,
         |  sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
         |    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    ELSE 0 END) AS y
         |  FROM events GROUP BY 1),
         |armed AS (SELECT *,
         |  CASE WHEN ${md5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
         |    THEN 'A' ELSE 'B' END AS arm FROM per),
         |mom AS (SELECT count(*) AS n,
         |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |  CAST(sum(x * x) AS DOUBLE) AS sxx,
         |  CAST(sum(x * y) AS DOUBLE) AS sxy FROM armed),
         |arms AS (SELECT arm, count(*) AS n_users,
         |  CAST(sum(x) AS DOUBLE) AS ax, CAST(sum(y) AS DOUBLE) AS ay
         |  FROM armed GROUP BY 1),
         |j AS (SELECT arm, n_users, ax, ay, n, sx, sy, sxx, sxy,
         |  (CAST(n AS DOUBLE) * sxy - sx * sy) /
         |  (CAST(n AS DOUBLE) * sxx - sx * sx) AS theta,
         |  sx / CAST(n AS DOUBLE) AS xbar
         |  FROM arms CROSS JOIN mom)
         |SELECT arm, n_users,
         |  ${f6("ay / CAST(n_users AS DOUBLE) / 100.0")} AS raw_mean,
         |  ${f6("(ay / CAST(n_users AS DOUBLE) - theta * " +
             "(ax / CAST(n_users AS DOUBLE) - xbar)) / 100.0")}
         |    AS cuped_mean
         |FROM j ORDER BY arm""".stripMargin,

    "q155_tpch_q3" ->
      """SELECT l_orderkey, o_od, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) -
        |     CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN (SELECT o_orderkey, o_custkey,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_od,
        |    o_orderpriority
        |  FROM orders
        |  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
        |    < '1997-06-15') o ON l_orderkey = o.o_orderkey
        |JOIN customer ON o.o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') > '1997-06-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q156_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name, c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) -
        |     CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
        |    >= '1997-01-01'
        |  AND strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
        |    < '1997-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q157_bag_set_ops" ->
      """WITH y1995 AS (SELECT o_custkey FROM orders
        |  WHERE year(o_orderdate) = 1995),
        |y1996 AS (SELECT o_custkey FROM orders
        |  WHERE year(o_orderdate) = 1996),
        |ex AS (SELECT 'except_all' AS op, o_custkey, count(*) AS n
        |  FROM (SELECT * FROM y1995 EXCEPT ALL SELECT * FROM y1996)
        |  GROUP BY 2),
        |inter AS (SELECT 'intersect_all' AS op, o_custkey, count(*) AS n
        |  FROM (SELECT * FROM y1995 INTERSECT ALL SELECT * FROM y1996)
        |  GROUP BY 2)
        |SELECT op, o_custkey, n FROM
        |  (SELECT * FROM ex UNION ALL SELECT * FROM inter)
        |ORDER BY op, o_custkey""".stripMargin,

    "q158_wow_report" ->
      s"""WITH weekly AS (SELECT
         |  strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS wk,
         |  sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
         |    AS cents
         |  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1),
         |l AS (SELECT wk, cents,
         |  lag(cents, 1) OVER (ORDER BY wk) AS prev FROM weekly)
         |SELECT wk, CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
         |  CAST(prev AS DOUBLE) / CAST(100 AS DOUBLE) AS prev_revenue,
         |  CASE WHEN prev IS NOT NULL AND prev <> 0 THEN
         |    ${f6("CAST(cents - prev AS DOUBLE) / CAST(prev AS DOUBLE)")}
         |  END AS wow_change
         |FROM l ORDER BY wk""".stripMargin,

    "q159_not_in_null" ->
      """SELECT 'with_null' AS variant, count(*) AS n FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT nullif(c_custkey, 7) FROM customer WHERE c_custkey < 100)
        |UNION ALL
        |SELECT 'no_null', count(*) FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT c_custkey FROM customer
        |   WHERE c_custkey < 100 AND c_custkey <> 7)
        |ORDER BY variant""".stripMargin,

    "q160_correlated_subquery" ->
      """SELECT k, count(*) AS n_orders FROM (
        |  SELECT o_orderkey,
        |    (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey)
        |      AS k
        |  FROM orders)
        |GROUP BY k ORDER BY k""".stripMargin,

    "q161_lateral_topk" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM (SELECT c_custkey FROM customer
        |      WHERE c_mktsegment = 'MACHINERY' AND c_custkey % 10 = 0) c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin,

    "q162_id_gaps" ->
      """WITH ids AS (SELECT event_id AS id FROM events
        |  WHERE event_id % 97 <> 0),
        |l AS (SELECT id, lead(id, 1) OVER (ORDER BY id) AS nxt FROM ids)
        |SELECT id + 1 AS gap_start, nxt - 1 AS gap_end,
        |  nxt - id - 1 AS missing
        |FROM l WHERE nxt IS NOT NULL AND nxt - id > 1
        |ORDER BY gap_start""".stripMargin,

    "q163_decile_migration" ->
      """WITH d95 AS (SELECT o_custkey,
        |  CAST(ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT)
        |    AS d
        |  FROM (SELECT o_custkey,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS cents
        |    FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1)),
        |d96 AS (SELECT o_custkey,
        |  CAST(ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT)
        |    AS d
        |  FROM (SELECT o_custkey,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS cents
        |    FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1))
        |SELECT coalesce(d95.d, 0) AS decile_1995,
        |  coalesce(d96.d, 0) AS decile_1996,
        |  count(*) AS n_customers
        |FROM d95 FULL OUTER JOIN d96 USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY decile_1995, decile_1996""".stripMargin,

    "q164_ref_completeness" ->
      """SELECT * FROM (
        |  SELECT 'lineitem_orders' AS relation,
        |    'orphan_facts' AS direction, count(*) AS n_dangling
        |  FROM lineitem WHERE NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |  UNION ALL
        |  SELECT 'lineitem_orders', 'childless_dims', count(*)
        |  FROM orders WHERE NOT EXISTS
        |    (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |  UNION ALL
        |  SELECT 'orders_customer', 'orphan_facts', count(*)
        |  FROM orders WHERE NOT EXISTS
        |    (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |  UNION ALL
        |  SELECT 'orders_customer', 'childless_dims', count(*)
        |  FROM customer WHERE NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
        |ORDER BY relation, direction""".stripMargin,

    // replays Graph.kCoreRounds' 6 synchronous peel rounds as chained
    // CTEs (the q82/q86 pattern): each round keeps edges whose BOTH
    // endpoints currently have degree >= 2 — pure set logic, exact
    "q165_kcore_bounded" -> {
      def round(i: Int): String =
        s"""adj$i AS MATERIALIZED (
           |  SELECT src, dst FROM adj${i - 1}
           |  WHERE src IN (SELECT src FROM adj${i - 1}
           |      GROUP BY src HAVING count(*) >= 2)
           |    AND dst IN (SELECT src FROM adj${i - 1}
           |      GROUP BY src HAVING count(*) >= 2))""".stripMargin
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey AS a, l_partkey + 3000000 AS b
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'),
         |adj0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
         |  UNION SELECT b, a FROM e),
         |${(1 to 6).map(round).mkString(",\n")}
         |SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
         |FROM adj6 GROUP BY 1 ORDER BY id""".stripMargin
    },

    "q166_tpch_q18" ->
      """WITH big AS (SELECT l_orderkey FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_od, o_totalprice,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |JOIN big USING (l_orderkey)
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q167_tpch_q21" ->
      """WITH l1 AS (
        |  SELECT l_orderkey, l_suppkey,
        |    (epoch_us(CAST(l_shipdate AS TIMESTAMP)) -
        |     epoch_us(CAST(o_orderdate AS TIMESTAMP)))
        |      > 7776000000000 AS late
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.late
        |  AND EXISTS (SELECT 1 FROM l1 l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM l1 l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,

    "q168_tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND epoch_us(CAST(l_shipdate AS TIMESTAMP)) -
        |        epoch_us(CAST(o_orderdate AS TIMESTAMP)) > 5184000000000)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q169_tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey,
        |    CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q170_tpch_q22" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM customer),
        |pos AS (SELECT CAST(sum(cents) AS BIGINT) AS sum_cents,
        |    count(*) AS n_pos
        |  FROM c WHERE cents > 0)
        |SELECT CAST(c_nationkey % 5 AS VARCHAR) AS cntrycode,
        |  CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(cents) AS BIGINT) AS totacctbal_cents
        |FROM c CROSS JOIN pos
        |WHERE cents * n_pos > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderstatus = 'F' AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY cntrycode""".stripMargin,

    // recomputes the aHash from the PNG generator's closed-form
    // channels (q64's trick, extended to the full hash): gray = sum of
    // the three affine-mod-256 channels, bit = gray·64 > imageTotal
    // (the 8×8 image makes every grid cell one pixel), packed into
    // unsigned 32-bit halves so no BIGINT shift overflows
    "q171_image_ahash" ->
      """WITH g AS (SELECT DISTINCT doc_id - doc_id % 7 AS gid
        |    FROM documents),
        |cells AS (SELECT g.gid, x.i AS x, y.i AS y,
        |    ((g.gid*31 + x.i*7 + y.i*13) % 256)
        |      + ((g.gid*17 + x.i*11 + y.i*3) % 256)
        |      + ((g.gid*5 + x.i*19 + y.i*29) % 256) AS gray
        |  FROM g, generate_series(0, 7) AS x(i),
        |    generate_series(0, 7) AS y(i)),
        |tot AS (SELECT gid, CAST(sum(gray) AS BIGINT) AS total
        |  FROM cells GROUP BY 1),
        |bits AS (SELECT c.gid, c.y * 8 + c.x AS idx
        |  FROM cells c JOIN tot USING (gid) WHERE c.gray * 64 > tot.total),
        |h AS (SELECT gid,
        |    CAST(COALESCE(sum(CASE WHEN idx >= 32
        |      THEN CAST(1 AS BIGINT) << (idx - 32) END), 0) AS BIGINT)
        |      AS ahash_hi,
        |    CAST(COALESCE(sum(CASE WHEN idx < 32
        |      THEN CAST(1 AS BIGINT) << idx END), 0) AS BIGINT)
        |      AS ahash_lo
        |  FROM bits GROUP BY gid),
        |hashes AS (SELECT g.gid, COALESCE(h.ahash_hi, 0) AS ahash_hi,
        |    COALESCE(h.ahash_lo, 0) AS ahash_lo
        |  FROM g LEFT JOIN h USING (gid))
        |SELECT ahash_hi, ahash_lo, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM (SELECT doc_id, doc_id - doc_id % 7 AS gid FROM documents)
        |JOIN hashes USING (gid)
        |GROUP BY 1, 2 ORDER BY ahash_hi, ahash_lo""".stripMargin,

    // the PLAIN one-shot join: hash equality against the Spark side's
    // four-way base/delta union proves the incremental algebra
    "q172_incremental_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q174_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(rev) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) -
        |       CAST(l_discount AS DECIMAL(18,2))) AS rev
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q177_tpch_q8" -> {
      val cents = """CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      * 100) AS BIGINT)""".stripMargin
      s"""WITH cr AS (SELECT c_custkey FROM customer
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA'),
         |j AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    n.n_name AS supp_nation, $cents AS cents
         |  FROM lineitem
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN nation n ON n.n_nationkey = s_nationkey
         |  WHERE o_custkey IN (SELECT c_custkey FROM cr)),
         |a AS (SELECT o_year,
         |  CAST(COALESCE(sum(CASE WHEN supp_nation = 'NATION_3'
         |    THEN cents END), 0) AS BIGINT) AS nation_cents,
         |  CAST(sum(cents) AS BIGINT) AS region_cents
         |  FROM j GROUP BY 1)
         |SELECT o_year, nation_cents, region_cents,
         |  CASE WHEN region_cents > 0 THEN
         |    ${f6("CAST(nation_cents AS DOUBLE) / " +
                "CAST(region_cents AS DOUBLE)")}
         |  END AS mkt_share
         |FROM a ORDER BY o_year""".stripMargin
    },

    "q178_tpch_q6" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(COALESCE(sum(CAST(floor(
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(l_discount AS DECIMAL(18,2)) * 100) AS BIGINT)), 0)
        |    AS BIGINT) AS revenue_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    // replays Graph.bfsRounds' 4 frontier rounds as chained min-plus
    // CTEs (the q82/q86/q165 pattern): frontier BFS and synchronous
    // min-plus relaxation agree round for round on unweighted graphs
    "q179_bfs_hops" -> {
      def round(i: Int): String =
        s"""d$i AS MATERIALIZED (
           |  SELECT id, min(dist) AS dist FROM (
           |    SELECT id, dist FROM d${i - 1}
           |    UNION ALL
           |    SELECT adj.dst AS id, d.dist + 1 AS dist
           |    FROM d${i - 1} d JOIN adj ON adj.src = d.id)
           |  GROUP BY id)""".stripMargin
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey AS a, l_partkey + 3000000 AS b
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'),
         |adj AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
         |  UNION SELECT b, a FROM e),
         |d0 AS MATERIALIZED (
         |  SELECT c_custkey AS id, CAST(0 AS BIGINT) AS dist
         |  FROM customer WHERE c_nationkey = 3),
         |${(1 to 4).map(round).mkString(",\n")}
         |SELECT id, CAST(dist AS BIGINT) AS dist
         |FROM d4 ORDER BY id""".stripMargin
    },

    // 4 independent q109 Lloyd replays, one per PQ subspace, each over
    // the 16-dim list slice; the blocks only differ in the slice
    // bounds and CTE suffix
    "q184_product_quantize" -> {
      def select(j: Int): String =
        s"""SELECT $j AS subspace, CAST(st.cell AS INTEGER) AS code,
           |  CAST(st.n AS BIGINT) AS n,
           |  ${f6("(CAST(st.qc AS DOUBLE) / st.n) / 1048576.0")} AS mean_cos,
           |  ${f6("c.cv[1]")} AS c0, ${f6("c.cv[2]")} AS c1,
           |  ${f6("c.cv[3]")} AS c2, ${f6("c.cv[4]")} AS c3
           |FROM sts$j st JOIN cent1s$j c ON c.cid = st.cell""".stripMargin
      s"""WITH ${(0 until 4).map(pqBlock).mkString(",\n")}
         |${(0 until 4).map(select).mkString("\nUNION ALL\n")}
         |ORDER BY subspace, code""".stripMargin
    },

    // the composed IVF-PQ index: q42's coarse CTEs pick the candidate
    // set (probed cells), q293's PQ machinery scores it (LUT lookups
    // in the Spark side's fixed left-assoc order), exact q37 cosine
    // re-ranks the 50-deep shortlist
    "q295_ivf_pq_search" -> ivfPqSearchSql,

    // q304 runs the STORED serving-index scan (ivfPqScanStored over a
    // writeIvfPqIndex table) with q295's exact parameters; the two
    // Spark paths are row-identical by construction (and asserted in
    // DedupSimilaritySpec), so the same DuckDB replay of the index
    // oracles both — pinning stored ≡ in-memory against an EXTERNAL
    // engine, not just against ourselves.
    "q304_ivf_pq_stored" -> ivfPqSearchSql,

    // q318: the SAME replay with the Lloyd training CTEs restricted to
    // the build slice (vec_id < 375) while encode/probe/ADC cover the
    // whole corpus — the frozen-model APPEND contract pinned externally
    "q318_ivf_append_scan" -> ivfPqSearchSql("vec_id < 375"),

    // the ADC query path over the SAME codebooks: afs$j IS the PQ
    // encoding, lut$j the per-query score table; adc sums the four
    // lookups in the Spark side's fixed left-assoc order, shortlist
    // ties break to the smaller id, exact q37 cosine re-ranks
    "q293_pq_adc_search" -> {
      def lut(j: Int): String =
        s"""lut$j AS (SELECT q.vec_id AS query_id, c.cid,
           |  list_dot_product(q.v, c.cv) AS s
           |  FROM es$j q, cent1ns$j c WHERE q.vec_id < 5)""".stripMargin
      s"""WITH ${(0 until 4).map(pqBlock).mkString(",\n")},
         |e64 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |codes AS (SELECT a0.vec_id, a0.cell AS code0, a1.cell AS code1,
         |    a2.cell AS code2, a3.cell AS code3
         |  FROM afs0 a0 JOIN afs1 a1 USING (vec_id)
         |    JOIN afs2 a2 USING (vec_id) JOIN afs3 a3 USING (vec_id)),
         |${(0 until 4).map(lut).mkString(",\n")},
         |adc AS (SELECT l0.query_id, c.vec_id AS neighbor_id,
         |    ((l0.s + l1.s) + l2.s) + l3.s AS adc
         |  FROM codes c
         |  JOIN lut0 l0 ON l0.cid = c.code0
         |  JOIN lut1 l1 ON l1.query_id = l0.query_id
         |    AND l1.cid = c.code1
         |  JOIN lut2 l2 ON l2.query_id = l0.query_id
         |    AND l2.cid = c.code2
         |  JOIN lut3 l3 ON l3.query_id = l0.query_id
         |    AND l3.cid = c.code3
         |  WHERE l0.query_id <> c.vec_id),
         |short AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY adc DESC, neighbor_id ASC) AS srank
         |    FROM adc) WHERE srank <= 50),
         |scored AS (SELECT query_id, neighbor_id,
         |    list_dot_product(qe.v, ce.v) /
         |      (sqrt(list_dot_product(qe.v, qe.v))
         |        * sqrt(list_dot_product(ce.v, ce.v))) AS cos
         |  FROM short
         |  JOIN e64 qe ON qe.vec_id = query_id
         |  JOIN e64 ce ON ce.vec_id = neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, ${f6("cos")} AS cos,
         |  CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },

    // Graph.temporalReachRounds' 4 earliest-arrival relaxations as
    // chained CTEs: an edge is traversable only at t >= the current
    // arrival; min arrival strictly dominates (a smaller arr admits a
    // superset of later edges), so min-per-node is lossless
    "q186_temporal_reach" -> {
      def round(i: Int): String =
        s"""d$i AS MATERIALIZED (
           |  SELECT id, min(arr) AS arr FROM (
           |    SELECT id, arr FROM d${i - 1}
           |    UNION ALL
           |    SELECT adj.dst AS id, adj.t AS arr
           |    FROM d${i - 1} d JOIN adj ON adj.src = d.id
           |    WHERE adj.t >= d.arr)
           |  GROUP BY id)""".stripMargin
      s"""WITH half AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey AS ca, l_partkey + 3000000 AS pb,
         |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS t
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
         |adj AS MATERIALIZED (
         |  SELECT ca AS src, pb AS dst, t FROM half
         |  UNION ALL SELECT pb, ca, t FROM half),
         |d0 AS MATERIALIZED (
         |  SELECT c_custkey AS id, CAST(788918400000000 AS BIGINT) AS arr
         |  FROM customer WHERE c_nationkey = 3),
         |${(1 to 4).map(round).mkString(",\n")}
         |SELECT id, CAST(arr AS BIGINT) AS arr
         |FROM d4 ORDER BY id""".stripMargin
    },

    // both funnel tiers replayed whole: the q35 rolling-hash
    // fingerprint (min-id canonical) then q182's brute-force pair set
    // restricted to the exact-dedup survivors (greedy higher-id drop)
    "q185_dedup_funnel" ->
      s"""WITH t AS (SELECT doc_id, source, $toks AS tk FROM documents),
         |fp AS (SELECT doc_id, source, list_reduce(
         |  list_prepend(CAST(0 AS BIGINT), list_transform(tk, x -> ${md5Mod("x")})),
         |  (h, x) -> (h * 31 + x) % $P) AS fingerprint FROM t),
         |s1 AS MATERIALIZED (SELECT doc_id, source FROM fp
         |  WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY fingerprint)),
         |sgl AS (SELECT doc_id, ${shingles("tk", 2)} AS sh FROM t
         |  WHERE doc_id IN (SELECT doc_id FROM s1)),
         |ex AS MATERIALIZED (SELECT doc_id AS jid,
         |  unnest(list_distinct(list_transform(sh, x -> ${md5Long("x")})))
         |  AS sh FROM sgl),
         |sz AS (SELECT jid, count(*) AS s FROM ex GROUP BY jid),
         |inter AS (SELECT a.jid AS id_a, b.jid AS id_b, count(*) AS i
         |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.jid < b.jid
         |  GROUP BY 1, 2),
         |drp AS (SELECT DISTINCT id_b FROM inter
         |  JOIN sz sa ON sa.jid = id_a JOIN sz sb ON sb.jid = id_b
         |  WHERE i * 5 >= (sa.s + sb.s - i) * 3),
         |s2 AS (SELECT * FROM s1
         |  WHERE doc_id NOT IN (SELECT id_b FROM drp)),
         |n0 AS (SELECT source, count(*) AS n_total FROM t GROUP BY source),
         |n1 AS (SELECT source, count(*) AS n_exact FROM s1 GROUP BY source),
         |n2 AS (SELECT source, count(*) AS n_near FROM s2 GROUP BY source)
         |SELECT source, CAST(n_total AS BIGINT) AS n_total,
         |  CAST(coalesce(n_exact, 0) AS BIGINT) AS n_exact,
         |  CAST(coalesce(n_near, 0) AS BIGINT) AS n_near
         |FROM n0 LEFT JOIN n1 USING (source) LEFT JOIN n2 USING (source)
         |ORDER BY source""".stripMargin,

    // the q109 Lloyd replay (1 round, k=8) over the q45 augmented
    // corpus, then the greedy within-cell near-dup drop: a member is
    // dropped iff some LOWER-id member of the SAME cell has cosine >=
    // 0.95 (the fixture's cosine band 0.60..1.0 is empty, so the
    // threshold compare cannot straddle engine rounding)
    "q180_semantic_dedup" -> {
      def round(i: Int): String =
        s"""ac$i AS (SELECT e.vec_id, e.v, cid, list_dot_product(e.v, cv) AS s
           |  FROM e, cent${i}n),
           |a$i AS (SELECT vec_id, v, cid AS cell FROM (
           |  SELECT *, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY s DESC, cid ASC) AS rn FROM ac$i) WHERE rn = 1),
           |q$i AS (SELECT cell, j,
           |  sum(CAST(floor(v[j] * 1048576.0) AS BIGINT)) AS qsum,
           |  count(*) AS n
           |  FROM a$i, range(1, 65) t(j) GROUP BY cell, j),
           |m$i AS (SELECT cell AS cid,
           |  list((CAST(qsum AS DOUBLE) / n) / 1048576.0 ORDER BY j) AS cv
           |  FROM q$i GROUP BY cell),
           |cent${i + 1} AS (SELECT p.cid, coalesce(m.cv, p.cv) AS cv
           |  FROM cent$i p LEFT JOIN m$i m USING (cid)),
           |cent${i + 1}n AS (SELECT cid,
           |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cv
           |  FROM cent${i + 1})""".stripMargin
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |e AS MATERIALIZED (SELECT vec_id, v FROM base
         |  UNION ALL
         |  SELECT vec_id + 100000, list_transform(v, x -> x * 1.5)
         |  FROM base WHERE vec_id < 50),
         |cent0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |cent0n AS (SELECT cid,
         |  list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cv
         |  FROM cent0),
         |${(0 until 1).map(round).mkString(",\n")},
         |acf AS (SELECT e.vec_id, e.v, cid, list_dot_product(e.v, cv) AS s
         |  FROM e, cent1n),
         |af AS MATERIALIZED (SELECT vec_id, v, cid AS cell FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY s DESC, cid ASC) AS rn FROM acf) WHERE rn = 1),
         |drp AS (SELECT DISTINCT b.cell, b.vec_id FROM af a JOIN af b
         |  ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE list_dot_product(a.v, b.v) /
         |    (sqrt(list_dot_product(a.v, a.v)) *
         |     sqrt(list_dot_product(b.v, b.v))) >= 0.95),
         |nn AS (SELECT cell, count(*) AS n FROM af GROUP BY cell),
         |dd AS (SELECT cell, count(*) AS nd FROM drp GROUP BY cell)
         |SELECT CAST(nn.cell AS INTEGER) AS cell, CAST(nn.n AS BIGINT) AS n,
         |  CAST(coalesce(dd.nd, 0) AS BIGINT) AS n_dropped,
         |  CAST(nn.n - coalesce(dd.nd, 0) AS BIGINT) AS n_kept
         |FROM nn LEFT JOIN dd USING (cell)
         |ORDER BY cell""".stripMargin
    },

    // RA index in the same 2^30 fixed point (integer // division);
    // the deg<=64 cap mirrors Graph.linkPredictRA's hub guard
    "q181_link_predict" ->
      """WITH inc AS MATERIALIZED (
        |  SELECT DISTINCT o_custkey AS node, l_partkey AS nbr
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'),
        |w AS (SELECT nbr, 1073741824 // count(*) AS w FROM inc
        |  GROUP BY nbr HAVING count(*) BETWEEN 2 AND 64),
        |p AS (SELECT x.node AS id_a, y.node AS id_b, w.w
        |  FROM inc x JOIN w USING (nbr) JOIN inc y USING (nbr)
        |  WHERE x.node < y.node)
        |SELECT id_a, id_b, CAST(sum(w) AS BIGINT) AS ra_fixed,
        |  CAST(count(*) AS BIGINT) AS n_common
        |FROM p GROUP BY id_a, id_b
        |ORDER BY ra_fixed DESC, id_a ASC, id_b ASC LIMIT 100""".stripMargin,

    // BRUTE FORCE on purpose: every pair sharing any shingle, exact
    // integer threshold — a hash match proves the Spark side's prefix
    // filter is lossless, not merely that surfaced pairs score right
    "q182_similarity_join" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |sgl AS (SELECT doc_id, ${shingles("tk", 2)} AS sh FROM t),
         |ex AS MATERIALIZED (SELECT doc_id AS jid,
         |  unnest(list_distinct(list_transform(sh, x -> ${md5Long("x")})))
         |  AS sh FROM sgl),
         |sz AS (SELECT jid, count(*) AS s FROM ex GROUP BY jid),
         |inter AS (SELECT a.jid AS id_a, b.jid AS id_b,
         |    count(*) AS inter_size
         |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.jid < b.jid
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, CAST(inter_size AS BIGINT) AS inter_size,
         |  CAST(sa.s + sb.s - inter_size AS BIGINT) AS union_size,
         |  ${f6("CAST(inter_size AS DOUBLE) / " +
             "CAST(sa.s + sb.s - inter_size AS DOUBLE)")} AS jaccard
         |FROM inter
         |JOIN sz sa ON sa.jid = id_a
         |JOIN sz sb ON sb.jid = id_b
         |WHERE inter_size * 5 >= (sa.s + sb.s - inter_size) * 3
         |ORDER BY id_a, id_b""".stripMargin,

    // Graph.bellmanFordRounds' 4 weighted min-plus relaxations as
    // chained CTEs (the q179 recurrence with edge weights; every
    // reached node relaxes each round)
    "q183_cheapest_path" -> {
      def round(i: Int): String =
        s"""d$i AS MATERIALIZED (
           |  SELECT id, min(dist) AS dist FROM (
           |    SELECT id, dist FROM d${i - 1}
           |    UNION ALL
           |    SELECT adj.dst AS id, d.dist + adj.w AS dist
           |    FROM d${i - 1} d JOIN adj ON adj.src = d.id)
           |  GROUP BY id)""".stripMargin
      s"""WITH e AS MATERIALIZED (
         |  SELECT o_custkey AS a, l_partkey + 3000000 AS b,
         |    CAST(min(l_quantity) AS BIGINT) AS w
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
         |  GROUP BY 1, 2),
         |adj AS MATERIALIZED (
         |  SELECT src, dst, min(w) AS w FROM (
         |    SELECT a AS src, b AS dst, w FROM e
         |    UNION ALL SELECT b, a, w FROM e)
         |  GROUP BY src, dst),
         |d0 AS MATERIALIZED (
         |  SELECT c_custkey AS id, CAST(0 AS BIGINT) AS dist
         |  FROM customer WHERE c_nationkey = 3),
         |${(1 to 4).map(round).mkString(",\n")}
         |SELECT id, CAST(dist AS BIGINT) AS dist
         |FROM d4 ORDER BY id""".stripMargin
    },

    "q175_tpch_q14" -> {
      val cents = """CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      * 100) AS BIGINT)""".stripMargin
      s"""WITH j AS (SELECT p_type, $cents AS cents
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'),
         |a AS (SELECT
         |  CAST(COALESCE(sum(CASE WHEN p_type = 'PROMO' THEN cents END), 0)
         |    AS BIGINT) AS promo_cents,
         |  CAST(sum(cents) AS BIGINT) AS total_cents FROM j)
         |SELECT promo_cents, total_cents,
         |  CASE WHEN total_cents > 0 THEN
         |    ${f6("100.0 * CAST(promo_cents AS DOUBLE) / " +
                "CAST(total_cents AS DOUBLE)")}
         |  END AS promo_share
         |FROM a""".stripMargin
    },

    "q176_tpch_q19" -> {
      val cents = """CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      * 100) AS BIGINT)""".stripMargin
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(COALESCE(sum($cents), 0) AS BIGINT) AS sum_cents
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
         |    AND p_size BETWEEN 1 AND 5)
         |  OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
         |    AND p_size BETWEEN 1 AND 10)
         |  OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
         |    AND p_size BETWEEN 1 AND 15)""".stripMargin
    },

    "q173_l_diversity" ->
      """SELECT c_mktsegment, c_nationkey,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT CAST(floor(
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      / 100000.0) AS BIGINT)) AS BIGINT) AS l,
        |  count(DISTINCT CAST(floor(
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      / 100000.0) AS BIGINT)) < 3 AS low_diversity
        |FROM customer
        |GROUP BY 1, 2 ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    // per-row-floored cents (q178 shape) keep the `= max` equality
    // integer-exact, so Q15's tie semantics survive cross-engine
    "q187_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(
        |      CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) -
        |       CAST(l_discount AS DECIMAL(18,2))) * 100) AS BIGINT))
        |      AS BIGINT) AS total_rev_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev_cents
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    // pc + floor((nc−pc)·(d−pd)/(nd−pd)): every input is an exact
    // integer and the one double expression uses only * and /, so the
    // floor is engine-independent (derived-float convention)
    "q188_interpolate" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2),
        |kept AS (SELECT * FROM daily WHERE cents % 3 <> 0),
        |scaffold AS (
        |  SELECT prio, unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY))::DATE AS d
        |  FROM (SELECT prio, min(d) AS d0, max(d) AS d1
        |        FROM kept GROUP BY prio)),
        |j AS (SELECT s.prio, s.d, k.cents FROM scaffold s
        |  LEFT JOIN kept k ON s.prio = k.prio AND s.d = k.d),
        |w AS (SELECT prio, d, cents,
        |    last_value(cents IGNORE NULLS) OVER wp AS pc,
        |    last_value(CASE WHEN cents IS NOT NULL THEN d END
        |      IGNORE NULLS) OVER wp AS pd,
        |    first_value(cents IGNORE NULLS) OVER wn AS nc,
        |    first_value(CASE WHEN cents IS NOT NULL THEN d END
        |      IGNORE NULLS) OVER wn AS nd
        |  FROM j WINDOW
        |    wp AS (PARTITION BY prio ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY prio ORDER BY d
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT prio, strftime(d, '%Y-%m-%d') AS day,
        |  CAST(CASE WHEN cents IS NOT NULL THEN cents
        |    ELSE pc + CAST(floor(
        |      CAST(nc - pc AS DOUBLE) * date_diff('day', pd, d)
        |        / date_diff('day', pd, nd)) AS BIGINT)
        |    END AS BIGINT) AS cents_filled,
        |  cents IS NULL AS interpolated
        |FROM w ORDER BY prio, day""".stripMargin,

    // DuckDB's damerau_levenshtein IS the reference for the native
    // expression (full DL, not OSA — pinned in HashingSpec)
    "q189_typo_match" ->
      """WITH n AS (SELECT s_name AS name, substring(s_name, 1, 16) AS blk
        |  FROM supplier)
        |SELECT a.name,
        |  CAST(count(*) AS BIGINT) AS n_dl1,
        |  CAST(coalesce(sum(CASE WHEN
        |    levenshtein(a.name, b.name) = 2 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_transpose
        |FROM n a JOIN n b ON a.blk = b.blk AND a.name <> b.name
        |WHERE damerau_levenshtein(a.name, b.name) <= 1
        |GROUP BY a.name ORDER BY a.name""".stripMargin,

    // per-source rank r → pooled position (r−1)(N−1)//(ng−1): pure
    // integer floor division both engines, no float in the mapping
    "q190_quantile_norm" ->
      """WITH d AS (SELECT source, doc_id, n_chars FROM documents),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS r,
        |    count(*) OVER (PARTITION BY source) AS ng FROM d),
        |pool AS (SELECT n_chars AS pool_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS gidx
        |  FROM d),
        |n AS (SELECT count(*) AS nn FROM d)
        |SELECT r.source, r.doc_id, r.n_chars,
        |  pool.pool_chars AS norm_chars
        |FROM r, n
        |JOIN pool ON pool.gidx = CASE WHEN r.ng > 1
        |  THEN ((r.r - 1) * (n.nn - 1)) // (r.ng - 1)
        |  ELSE (n.nn - 1) // 2 END
        |ORDER BY r.source, r.doc_id""".stripMargin,

    // pseudo-partsupp (no PARTSUPP in the fixture): cost = min line
    // cents, qty = total shipped, per observed (part, supplier) pair
    "q191_tpch_q2" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT))
        |      AS ps_cost_cents
        |  FROM lineitem GROUP BY 1, 2),
        |eur AS (
        |  SELECT ps.l_partkey, ps.ps_cost_cents,
        |    CAST(CAST(s_acctbal AS DECIMAL(18,2))*100 AS BIGINT) AS bal_cents,
        |    s_name, n_name, p_partkey, p_brand
        |  FROM ps
        |  JOIN supplier ON s_suppkey = ps.l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
        |  JOIN part ON p_partkey = ps.l_partkey AND p_size = 15),
        |mc AS (SELECT l_partkey AS mk, min(ps_cost_cents) AS min_cost
        |  FROM eur GROUP BY 1)
        |SELECT bal_cents, s_name, n_name, p_partkey, p_brand
        |FROM eur JOIN mc ON mk = l_partkey AND ps_cost_cents = min_cost
        |ORDER BY bal_cents DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    // exact integer cent-percent units: ec*(100-d%) - rc*100*qty
    "q192_tpch_q9" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) *
        |      (100 - CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT)) -
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2))*100 AS BIGINT) *
        |      100 * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_u
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%gear%'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY n_name, o_year
        |ORDER BY n_name, o_year DESC""".stripMargin,

    // HAVING threshold cross-multiplied in 128-bit (HUGEINT there,
    // DECIMAL(38,0) in Spark) — value*1000 vs national total
    "q193_tpch_q11" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT))
        |      AS ps_cost_cents,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_qty
        |  FROM lineitem GROUP BY 1, 2),
        |v AS (
        |  SELECT l_partkey AS p_partkey,
        |    CAST(sum(ps_cost_cents * ps_qty) AS BIGINT) AS value_u
        |  FROM ps
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |    WHERE s_nationkey = 3)
        |  GROUP BY 1),
        |tot AS (SELECT sum(value_u) AS total_u FROM v)
        |SELECT p_partkey, value_u FROM v, tot
        |WHERE value_u * 1000 > total_u
        |ORDER BY value_u DESC, p_partkey""".stripMargin,

    // mode := l_returnflag, late := shipped >60d after order date
    "q194_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE epoch_us(CAST(l_shipdate AS TIMESTAMP)) -
        |  epoch_us(CAST(o_orderdate AS TIMESTAMP)) > 5184000000000
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // complaint suppliers := negative balance; anti join then
    // count-distinct per (brand, type, size)
    "q195_tpch_q16" ->
      """WITH ps AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 15, 20, 25, 30)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |    WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // correlated avg → (sum,count) rejoin; 5*q*n < sum ⟺ q < 0.2*avg;
    // avg_yearly = floor-div of the non-negative cents sum by 7
    "q196_tpch_q17" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) AS ec,
        |    CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |    WHERE p_brand = 'Brand#23')),
        |pp AS (SELECT l_partkey AS pk,
        |    CAST(sum(q) AS BIGINT) AS sq, count(*) AS nq
        |  FROM li GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(COALESCE(sum(ec), 0) AS BIGINT) AS total_cents,
        |  CAST(COALESCE(sum(ec), 0) AS BIGINT) // 7 AS avg_yearly_cents
        |FROM li JOIN pp ON pk = l_partkey
        |WHERE q * 5 * nq < sq""".stripMargin,

    // dominant supplier := shipped a strict majority of a red part's
    // 1995 volume; AMERICA suppliers only
    "q197_tpch_q20" ->
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_partkey IN (SELECT p_partkey FROM part
        |      WHERE p_name LIKE 'red %')),
        |bs AS (SELECT l_partkey, l_suppkey, CAST(sum(q) AS BIGINT) AS sq
        |  FROM li GROUP BY 1, 2),
        |bp AS (SELECT l_partkey AS pk, CAST(sum(sq) AS BIGINT) AS tq
        |  FROM bs GROUP BY 1)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS n_parts
        |FROM bs
        |JOIN bp ON pk = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN region ON r_regionkey = n_regionkey AND r_name = 'AMERICA'
        |WHERE sq * 2 > tq
        |GROUP BY s_name
        |ORDER BY s_name""".stripMargin,

    // q63's portable md5 split × q65's shingle machinery turned
    // inward: per eval split, how much 3-gram content leaks from train
    "q198_split_leakage" ->
      s"""WITH d AS (
         |  SELECT doc_id, $toks AS tk,
         |    CASE WHEN ${md5Long("CAST(doc_id AS VARCHAR)")} % 100 < 90
         |        THEN 'train'
         |      WHEN ${md5Long("CAST(doc_id AS VARCHAR)")} % 100 < 95
         |        THEN 'valid'
         |      ELSE 'test' END AS split
         |  FROM documents),
         |s AS (SELECT doc_id, split, list_distinct(
         |    list_transform(${shingles("tk", 3)}, x -> ${md5Long("x")}))
         |    AS hs
         |  FROM d),
         |e AS (SELECT doc_id, split, unnest(hs) AS sh FROM s),
         |tr AS (SELECT DISTINCT sh FROM e WHERE split = 'train'),
         |ev AS (SELECT doc_id, split, sh FROM e WHERE split <> 'train'),
         |per AS (SELECT doc_id, split, count(*) AS n_sh
         |  FROM ev GROUP BY 1, 2),
         |sha AS (SELECT ev.doc_id, count(*) AS n_sh_shared
         |  FROM ev JOIN tr USING (sh) GROUP BY 1)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN COALESCE(n_sh_shared, 0) * 2 >= n_sh
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(sum(n_sh) AS BIGINT) AS n_shingles,
         |  CAST(sum(COALESCE(n_sh_shared, 0)) AS BIGINT) AS n_shared
         |FROM per LEFT JOIN sha USING (doc_id)
         |GROUP BY split ORDER BY split""".stripMargin,

    // q37's exact scorer with the label inequality in the join
    "q199_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, label AS q_label, v AS qv
         |  FROM e WHERE vec_id < 8),
         |scored AS (SELECT query_id, q_label,
         |  e.vec_id AS neighbor_id, e.label AS n_label,
         |  list_dot_product(qv, v) /
         |    (sqrt(list_dot_product(qv, qv)) *
         |     sqrt(list_dot_product(v, v))) AS cos
         |  FROM q, e
         |  WHERE query_id <> e.vec_id AND q_label <> e.label),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(q_label AS BIGINT) AS q_label,
         |  neighbor_id, CAST(n_label AS BIGINT) AS n_label,
         |  ${f6("cos")} AS cos, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // 10-NN majority vote per vector, ties toward the smaller label
    "q200_label_noise" ->
      s"""WITH e AS (SELECT vec_id, label,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |scored AS (SELECT a.vec_id, a.label,
         |  b.vec_id AS nid, b.label AS nlabel,
         |  list_dot_product(a.v, b.v) /
         |    (sqrt(list_dot_product(a.v, a.v)) *
         |     sqrt(list_dot_product(b.v, b.v))) AS cos
         |  FROM e a, e b WHERE a.vec_id <> b.vec_id),
         |knn AS (SELECT * FROM (SELECT vec_id, label, nlabel,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, nid ASC) AS rank
         |  FROM scored) WHERE rank <= 10),
         |votes AS (SELECT vec_id, label, nlabel, count(*) AS votes
         |  FROM knn GROUP BY 1, 2, 3),
         |top AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY votes DESC, nlabel ASC) AS vr
         |  FROM votes)
         |SELECT vec_id, CAST(label AS BIGINT) AS label,
         |  CAST(nlabel AS BIGINT) AS maj_label,
         |  CAST(votes AS BIGINT) AS n_maj,
         |  nlabel <> label AS flagged
         |FROM top WHERE vr = 1
         |ORDER BY vec_id""".stripMargin,

    // q63's portable hash gating per-source acceptance rates derived
    // in exact int64 floor arithmetic (// everywhere, no doubles)
    "q201_mixture_resample" ->
      s"""WITH cnt AS (SELECT source, count(*) AS n_before,
         |    CAST(substr(source, 4, 10) AS BIGINT) + 1 AS tgt_num
         |  FROM documents GROUP BY source),
         |c2 AS (SELECT *, tgt_num * 1000000000000 // n_before AS r
         |  FROM cnt),
         |norm AS (SELECT max(r) AS rmax,
         |    CAST(sum(tgt_num) AS BIGINT) AS tgt_den FROM c2),
         |dim AS (SELECT source, n_before,
         |    r * 1000000 // rmax AS accept_ppm,
         |    tgt_num * 1000000 // tgt_den AS target_ppm
         |  FROM c2, norm),
         |kept AS (SELECT d.source, count(*) AS n_after
         |  FROM documents d JOIN dim USING (source)
         |  WHERE ${md5Long("'res:' || CAST(doc_id AS VARCHAR)")}
         |      % 1000000 < accept_ppm
         |  GROUP BY d.source),
         |j AS (SELECT dim.source, n_before, target_ppm, accept_ppm,
         |    COALESCE(n_after, 0) AS n_after
         |  FROM dim LEFT JOIN kept ON dim.source = kept.source),
         |tot AS (SELECT CAST(sum(n_after) AS BIGINT) AS total_after
         |  FROM j)
         |SELECT source, n_before, target_ppm, accept_ppm,
         |  CAST(n_after AS BIGINT) AS n_after,
         |  CAST(n_after * 1000000 // total_after AS BIGINT)
         |    AS achieved_ppm
         |FROM j, tot ORDER BY source""".stripMargin,

    // per-source P10 on an exact-int lexical-diversity score;
    // quantile_disc on BIGINT is BIGINT (the q71 typing rule)
    "q202_domain_quality_gate" ->
      s"""WITH scored AS (SELECT doc_id, source,
         |    CAST(len(list_distinct($toks)) AS BIGINT) * 1000000
         |      // CAST(len($toks) AS BIGINT) AS score
         |  FROM documents),
         |thr AS (SELECT source, quantile_disc(score, 0.10) AS p10
         |  FROM scored GROUP BY source)
         |SELECT doc_id, source, score, p10, score >= p10 AS kept
         |FROM scored JOIN thr USING (source)
         |ORDER BY doc_id""".stripMargin,

    // DATE - DATE is INTEGER days in DuckDB (Spark side: datediff)
    "q203_growth_accounting" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events),
        |h AS (SELECT max(d) AS max_d FROM act),
        |m AS (SELECT user_id, d,
        |    lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d,
        |    lead(d) OVER (PARTITION BY user_id ORDER BY d) AS next_d,
        |    min(d) OVER (PARTITION BY user_id) AS first_d
        |  FROM act)
        |SELECT strftime(d, '%Y-%m-%d') AS day,
        |  CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(sum(CASE WHEN d <> first_d AND d - prev_d = 1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(sum(CASE WHEN d <> first_d AND d - prev_d > 1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
        |  CAST(sum(CASE WHEN d < max_d AND
        |      (next_d IS NULL OR next_d - d > 1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_churned_out,
        |  count(*) AS n_active
        |FROM m, h GROUP BY d ORDER BY day""".stripMargin,

    // BPE merge learning replayed whole: K rounds of (pair-count →
    // argmax → greedy-leftmost merge) as chained CTEs over a
    // (word,pos,sym) table. Greedy-leftmost = odd rank within each
    // island of consecutive match positions (overlap chains only form
    // when left==right). Mirrors Queries.q204BpeMerges exactly.
    "q204_bpe_merges" -> {
      val K = 8
      s"""WITH ${bpeCtes(K)}
         |SELECT * FROM (
         |${(1 to K).map(r =>
        s"""SELECT CAST($r AS BIGINT) AS round, lft AS left_sym,
           |  rgt AS right_sym, lft || rgt AS merged, c AS pair_weight
           |FROM best$r""".stripMargin).mkString("\nUNION ALL\n")}
         |) ORDER BY round""".stripMargin
    },

    // the apply half: q204's learned merges replayed as K nested
    // left-to-right replace() calls over a marker-prefixed symbol
    // encoding, on the FULL (unlimited) 3..12-letter vocabulary
    "q207_bpe_encode" -> {
      val K = 8
      val inner = (1 to K).foldLeft(
        """regexp_replace(w, '(.)', '@\1', 'g')""") { (acc, r) =>
        s"""replace($acc,
           |  (SELECT '@' || lft || '@' || rgt FROM best$r),
           |  (SELECT '@' || lft || rgt FROM best$r))""".stripMargin
      }
      s"""WITH ${bpeCtes(K)},
         |allw AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM wordsall
         |  WHERE length(w) BETWEEN 3 AND 12 GROUP BY w),
         |repr AS (SELECT cnt, $inner AS r FROM allw),
         |tk AS (SELECT unnest(string_split(r, '@')) AS token, cnt
         |  FROM repr)
         |SELECT token, CAST(sum(cnt) AS BIGINT) AS weight FROM tk
         |WHERE token <> ''
         |GROUP BY token ORDER BY weight DESC, token LIMIT 30""".stripMargin
    },

    // lift = P(ab)/(P(a)P(b)) over adjacent word pairs; exact integer
    // counts, ONE double expression at the end (the integer cross
    // product would overflow 2^63 at corpus scale)
    "q208_collocation_lift" ->
      s"""WITH toks AS (
         |  SELECT regexp_extract_all(lower(text), '[a-z]+') AS ts
         |  FROM documents),
         |unic AS (
         |  SELECT w, count(*) AS n FROM (
         |    SELECT unnest(ts) AS w FROM toks) GROUP BY 1),
         |nwt AS (SELECT CAST(sum(n) AS BIGINT) AS nw FROM unic),
         |bic AS (
         |  SELECT wa, wb, count(*) AS nab FROM (
         |    SELECT ts[i] AS wa, ts[i + 1] AS wb
         |    FROM (SELECT ts, unnest(range(1, len(ts))) AS i
         |          FROM toks WHERE len(ts) >= 2))
         |  GROUP BY 1, 2),
         |nbt AS (SELECT CAST(sum(nab) AS BIGINT) AS nb FROM bic)
         |SELECT bic.wa, bic.wb, bic.nab, ua.n AS na, ub.n AS nb_uni,
         |  ${f6("""CAST(bic.nab AS DOUBLE) * CAST(nwt.nw AS DOUBLE)
           |    * CAST(nwt.nw AS DOUBLE)
           |    / (CAST(nbt.nb AS DOUBLE) * CAST(ua.n AS DOUBLE)
           |       * CAST(ub.n AS DOUBLE))""".stripMargin)} AS lift
         |FROM bic
         |JOIN unic ua ON bic.wa = ua.w
         |JOIN unic ub ON bic.wb = ub.w
         |CROSS JOIN nwt CROSS JOIN nbt
         |WHERE bic.nab >= 5
         |ORDER BY lift DESC, wa, wb LIMIT 30""".stripMargin,

    // exact-integer CUSUM: deviations scaled by the day count so no
    // mean division happens; peak = integer max comparison
    "q205_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1),
        |tot AS (SELECT count(*) AS nd, CAST(sum(cents) AS BIGINT) AS t
        |  FROM daily),
        |c AS (SELECT d, cents,
        |    CAST(sum(nd * cents - t)
        |      OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS cusum
        |  FROM daily, tot)
        |SELECT strftime(d, '%Y-%m-%d') AS day, cents, cusum,
        |  abs(cusum) = max(abs(cusum)) OVER () AS is_change_point
        |FROM c ORDER BY day""".stripMargin,

    // isotonic fit via the exact max-min characterization over B=20
    // integer bins; each range rate is ONE double division, min/max
    // over doubles are order-independent
    "q206_isotonic_calibration" ->
      s"""WITH ev AS (
         |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS c,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |bounds AS (SELECT min(c) AS lo, max(c) AS hi FROM ev),
         |binned AS (
         |  SELECT (c - lo) * 20 // (hi - lo + 1) AS bin,
         |    count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
         |  FROM ev, bounds GROUP BY 1),
         |pre AS (
         |  SELECT bin, n, pos,
         |    CAST(sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS pn,
         |    CAST(sum(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS pp
         |  FROM binned),
         |ranges AS (
         |  SELECT l.bin AS i, h.bin AS k,
         |    CAST(h.pp - l.pp + l.pos AS DOUBLE)
         |      / CAST(h.pn - l.pn + l.n AS DOUBLE) AS rate
         |  FROM pre l JOIN pre h ON l.bin <= h.bin),
         |mn AS (
         |  SELECT b.bin, r.i, min(r.rate) AS mnr
         |  FROM binned b JOIN ranges r ON r.i <= b.bin AND b.bin <= r.k
         |  GROUP BY 1, 2),
         |fit AS (SELECT bin, max(mnr) AS fitted_raw FROM mn GROUP BY 1)
         |SELECT b.bin, b.n, b.pos,
         |  ${f6("CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE)")}
         |    AS raw_rate,
         |  ${f6("fitted_raw")} AS fitted_rate
         |FROM binned b JOIN fit USING (bin)
         |ORDER BY bin""".stripMargin,

    // Gini = (Σ(2·i0+1)·r − n·Σr)/(n·Σr); weighted sum in HUGEINT
    // (DECIMAL(38,0) on the Spark side), ONE double division
    "q209_gini_revenue" ->
      s"""WITH rev AS (
         |  SELECT o_custkey,
         |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS r
         |  FROM orders GROUP BY 1),
         |idx AS (SELECT r,
         |    row_number() OVER (ORDER BY r, o_custkey) - 1 AS i0
         |  FROM rev),
         |agg AS (SELECT
         |    sum(CAST(2 * i0 + 1 AS HUGEINT) * CAST(r AS HUGEINT)) AS a,
         |    count(*) AS n, CAST(sum(r) AS BIGINT) AS sr
         |  FROM idx)
         |SELECT n AS n_customers, sr AS total_cents,
         |  CASE WHEN n > 0 THEN
         |    ${f6("""CAST(a - CAST(n AS HUGEINT) * CAST(sr AS HUGEINT)
           |      AS DOUBLE)
           |      / (CAST(n AS DOUBLE) * CAST(sr AS DOUBLE))""".stripMargin)}
         |  END AS gini
         |FROM agg""".stripMargin,

    // ECE with the common denominator n_b·W pulled out: Σ|pos_b·W−S_b|
    // is an exact BIGINT, ECE = that / (N·W) in one double division
    "q210_calibration_ece" ->
      s"""WITH ev AS (
         |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS c,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |bounds AS (SELECT min(c) AS lo, max(c) AS hi FROM ev),
         |binned AS (
         |  SELECT (c - lo) * 20 // (hi - lo + 1) AS bin,
         |    hi - lo + 1 AS w, count(*) AS n,
         |    CAST(sum(y) AS BIGINT) AS pos,
         |    CAST(sum(c - lo) AS BIGINT) AS sb
         |  FROM ev, bounds GROUP BY 1, 2),
         |agg AS (SELECT CAST(sum(n) AS BIGINT) AS n_events,
         |    max(w) AS width,
         |    CAST(sum(abs(pos * w - sb)) AS BIGINT) AS gap_sum
         |  FROM binned)
         |SELECT n_events, width, gap_sum,
         |  CASE WHEN n_events > 0 THEN
         |    ${f6("""CAST(gap_sum AS DOUBLE)
           |      / (CAST(n_events AS DOUBLE) * CAST(width AS DOUBLE))"""
        .stripMargin)}
         |  END AS ece
         |FROM agg""".stripMargin,

    // integer-scaled MRR: rr = 1000000 // rank summed exactly, ONE
    // double division at the end
    "q211_purchase_mrr" ->
      s"""WITH ranked AS (
         |  SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY value DESC, event_id) AS rk
         |  FROM events),
         |firsts AS (
         |  SELECT user_id, min(rk) AS first_rk FROM ranked
         |  WHERE event_type = 'purchase' GROUP BY 1),
         |agg AS (SELECT count(*) AS n_users,
         |    CAST(sum(1000000 // first_rk) AS BIGINT) AS rr_scaled
         |  FROM firsts)
         |SELECT n_users, rr_scaled,
         |  CASE WHEN n_users > 0 THEN
         |    ${f6("""CAST(rr_scaled AS DOUBLE)
           |      / (CAST(n_users AS DOUBLE) * 1000000.0)""".stripMargin)}
         |  END AS mrr
         |FROM agg""".stripMargin,

    // tie-corrected Mann–Whitney: 2U = Σ pos_s·(2·neg_below + neg_s)
    // exact in HUGEINT (DECIMAL(38,0) on the Spark side), ONE double
    // division for AUC = 2U / (2·P·N)
    "q212_roc_auc" ->
      s"""WITH ev AS (
         |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS c,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |s AS (SELECT c, CAST(sum(y) AS BIGINT) AS pos,
         |    CAST(count(*) - sum(y) AS BIGINT) AS neg
         |  FROM ev GROUP BY 1),
         |cum AS (SELECT pos, neg,
         |    CAST(coalesce(sum(neg) OVER (ORDER BY c
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS nb
         |  FROM s),
         |agg AS (SELECT CAST(sum(pos) AS BIGINT) AS p,
         |    CAST(sum(neg) AS BIGINT) AS n,
         |    sum(CAST(pos AS HUGEINT) *
         |      (2 * CAST(nb AS HUGEINT) + CAST(neg AS HUGEINT))) AS u2
         |  FROM cum)
         |SELECT p AS n_pos, n AS n_neg,
         |  CASE WHEN p > 0 AND n > 0 THEN
         |    ${f6("""CAST(u2 AS DOUBLE)
           |      / (2.0 * CAST(p AS DOUBLE) * CAST(n AS DOUBLE))"""
        .stripMargin)}
         |  END AS auc
         |FROM agg""".stripMargin,

    // Spearman = Pearson on tie-averaged ranks; 2·avgrank = 2·below +
    // cnt + 1 keeps every rank integral, moments in HUGEINT, the q118
    // one-double-expression corr shape for both coefficients
    "q213_spearman" ->
      s"""WITH li AS (
         |  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS x,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS y
         |  FROM lineitem),
         |rx AS (SELECT x,
         |    2 * (CAST(coalesce(sum(cnt) OVER (ORDER BY x
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT)) + cnt + 1 AS rx
         |  FROM (SELECT x, CAST(count(*) AS BIGINT) AS cnt
         |        FROM li GROUP BY 1)),
         |ry AS (SELECT y,
         |    2 * (CAST(coalesce(sum(cnt) OVER (ORDER BY y
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT)) + cnt + 1 AS ry
         |  FROM (SELECT y, CAST(count(*) AS BIGINT) AS cnt
         |        FROM li GROUP BY 1)),
         |m AS (SELECT count(*) AS n,
         |    CAST(sum(CAST(rx AS HUGEINT)) AS DOUBLE) AS sx,
         |    CAST(sum(CAST(ry AS HUGEINT)) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT))
         |      AS DOUBLE) AS sxx,
         |    CAST(sum(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT))
         |      AS DOUBLE) AS syy,
         |    CAST(sum(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT))
         |      AS DOUBLE) AS sxy,
         |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS vx,
         |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS vy,
         |    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
         |      AS DOUBLE) AS vxx,
         |    CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
         |      AS DOUBLE) AS vyy,
         |    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
         |      AS DOUBLE) AS vxy
         |  FROM li JOIN rx USING (x) JOIN ry USING (y))
         |SELECT n,
         |  CASE WHEN n > 1 THEN
         |    ${f6("""(CAST(n AS DOUBLE) * sxy - sx * sy)
           |      / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
           |        * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))"""
        .stripMargin)}
         |  END AS spearman,
         |  CASE WHEN n > 1 THEN
         |    ${f6("""(CAST(n AS DOUBLE) * vxy - vx * vy)
           |      / (sqrt(CAST(n AS DOUBLE) * vxx - vx * vx)
           |        * sqrt(CAST(n AS DOUBLE) * vyy - vy * vy))"""
        .stripMargin)}
         |  END AS pearson
         |FROM m""".stripMargin,

    // normal equations from exact HUGEINT moments; Cramer's rule as a
    // pinned double expression tree (identical parenthesization on the
    // Spark side — IEEE evaluation order makes the two bit-equal)
    "q214_ols_normal_eq" ->
      s"""WITH li AS (
         |  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS x1,
         |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS x2,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS y
         |  FROM lineitem),
         |m AS (SELECT count(*) AS n,
         |    CAST(sum(CAST(x1 AS HUGEINT)) AS DOUBLE) AS s1,
         |    CAST(sum(CAST(x2 AS HUGEINT)) AS DOUBLE) AS s2,
         |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(x1 AS HUGEINT) * CAST(x1 AS HUGEINT))
         |      AS DOUBLE) AS s11,
         |    CAST(sum(CAST(x1 AS HUGEINT) * CAST(x2 AS HUGEINT))
         |      AS DOUBLE) AS s12,
         |    CAST(sum(CAST(x2 AS HUGEINT) * CAST(x2 AS HUGEINT))
         |      AS DOUBLE) AS s22,
         |    CAST(sum(CAST(x1 AS HUGEINT) * CAST(y AS HUGEINT))
         |      AS DOUBLE) AS s1y,
         |    CAST(sum(CAST(x2 AS HUGEINT) * CAST(y AS HUGEINT))
         |      AS DOUBLE) AS s2y,
         |    CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
         |      AS DOUBLE) AS syy
         |  FROM li),
         |d AS (SELECT n, s1, s2, sy, s1y, s2y, syy,
         |    CAST(n AS DOUBLE) * (s11 * s22 - s12 * s12)
         |      - s1 * (s1 * s22 - s12 * s2)
         |      + s2 * (s1 * s12 - s11 * s2) AS det,
         |    sy * (s11 * s22 - s12 * s12)
         |      - s1 * (s1y * s22 - s12 * s2y)
         |      + s2 * (s1y * s12 - s11 * s2y) AS d0,
         |    CAST(n AS DOUBLE) * (s1y * s22 - s12 * s2y)
         |      - sy * (s1 * s22 - s12 * s2)
         |      + s2 * (s1 * s2y - s1y * s2) AS d1,
         |    CAST(n AS DOUBLE) * (s11 * s2y - s1y * s12)
         |      - s1 * (s1 * s2y - s1y * s2)
         |      + sy * (s1 * s12 - s11 * s2) AS d2
         |  FROM m),
         |b AS (SELECT n, sy, s1y, s2y, syy, det,
         |    d0 / det AS b0, d1 / det AS b1, d2 / det AS b2,
         |    syy - sy * sy / CAST(n AS DOUBLE) AS sst
         |  FROM d)
         |SELECT n,
         |  CASE WHEN n > 2 AND det <> 0 THEN ${f6("b0")} END AS beta0,
         |  CASE WHEN n > 2 AND det <> 0 THEN ${f6("b1")} END AS beta1,
         |  CASE WHEN n > 2 AND det <> 0 THEN ${f6("b2")} END AS beta2,
         |  CASE WHEN n > 2 AND det <> 0 AND sst <> 0 THEN
         |    ${f6("1.0 - (syy - (b0 * sy + b1 * s1y + b2 * s2y)) / sst")}
         |  END AS r2
         |FROM b""".stripMargin,

    // per-candidate exact (count, positives) from bin prefix sums;
    // impurity 2·(pL·negL/nL + pR·negR/nR)/N with HUGEINT core and a
    // pinned division tree
    "q215_gini_stump" ->
      s"""WITH ev AS (
         |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS c,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |bounds AS (SELECT min(c) AS lo, max(c) AS hi FROM ev),
         |bins AS (
         |  SELECT (c - lo) * 20 // (hi - lo + 1) AS bin,
         |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos,
         |    max(lo) AS lo, max(hi) AS hi
         |  FROM ev, bounds GROUP BY 1),
         |cum AS (SELECT bin, lo, hi,
         |    CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
         |    CAST(sum(pos) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS pl
         |  FROM bins),
         |tot AS (SELECT max(nl) AS nt, max(pl) AS pt FROM cum),
         |cand AS (
         |  SELECT lo + (bin + 1) * (hi - lo + 1) // 20 AS thr,
         |    nl, pl, nt - nl AS nr, pt - pl AS pr, nt
         |  FROM cum, tot WHERE nl < nt)
         |SELECT thr, nl AS n_left, pl AS pos_left,
         |  nr AS n_right, pr AS pos_right,
         |  ${f6("""2.0 * (CAST(CAST(pl AS HUGEINT)
           |        * CAST(nl - pl AS HUGEINT) AS DOUBLE)
           |      / CAST(nl AS DOUBLE)
           |      + CAST(CAST(pr AS HUGEINT)
           |          * CAST(nr - pr AS HUGEINT) AS DOUBLE)
           |        / CAST(nr AS DOUBLE))
           |    / CAST(nt AS DOUBLE)""".stripMargin)} AS gini_split
         |FROM cand ORDER BY thr""".stripMargin,

    // unsmoothed NB posterior ∝ c(pri,seg)·c(st,seg)/c(seg); the
    // argmax is the exact 128-bit cross-multiplication, never a float
    "q216_naive_bayes" ->
      s"""WITH base AS (
         |  SELECT o_orderpriority AS pri, o_orderstatus AS st,
         |    c_mktsegment AS seg
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM base),
         |segs AS (SELECT seg, CAST(count(*) AS BIGINT) AS c_seg
         |  FROM base GROUP BY 1),
         |ps AS (SELECT pri, seg, CAST(count(*) AS BIGINT) AS c_ps
         |  FROM base GROUP BY 1, 2),
         |ss AS (SELECT st, seg, CAST(count(*) AS BIGINT) AS c_ss
         |  FROM base GROUP BY 1, 2),
         |scores AS (SELECT pri, st, seg,
         |    CAST(c_ps AS HUGEINT) * CAST(c_ss AS HUGEINT) AS num,
         |    c_seg AS den
         |  FROM ps JOIN ss USING (seg) JOIN segs USING (seg)),
         |win AS (SELECT * FROM scores a WHERE NOT EXISTS (
         |  SELECT 1 FROM scores b
         |  WHERE b.pri = a.pri AND b.st = a.st AND
         |    (b.num * CAST(a.den AS HUGEINT)
         |        > a.num * CAST(b.den AS HUGEINT)
         |     OR (b.num * CAST(a.den AS HUGEINT)
         |        = a.num * CAST(b.den AS HUGEINT) AND b.seg < a.seg))))
         |SELECT pri, st, seg AS pred_segment,
         |  ${f6("""CAST(num AS DOUBLE)
           |    / (CAST(den AS DOUBLE) * CAST(n_total AS DOUBLE))"""
        .stripMargin)} AS score
         |FROM win, nt ORDER BY pri, st""".stripMargin,

    // EMD over the ordered band distribution with common denominator
    // n_g·N: cumulative integer diffs in HUGEINT, ONE double division
    "q217_t_closeness" ->
      s"""WITH d AS (
         |  SELECT c_mktsegment, c_nationkey,
         |    CAST(floor(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
         |      AS BIGINT) / 100000.0) AS BIGINT) AS band
         |  FROM customer),
         |gb AS (SELECT band, CAST(count(*) AS BIGINT) AS cnt_g
         |  FROM d GROUP BY 1),
         |sc AS (SELECT CAST(sum(cnt_g) AS BIGINT) AS n_all,
         |    CAST(count(*) AS BIGINT) AS m FROM gb),
         |grp AS (SELECT c_mktsegment, c_nationkey,
         |    CAST(count(*) AS BIGINT) AS ng
         |  FROM d GROUP BY 1, 2),
         |cells AS (SELECT c_mktsegment, c_nationkey, band,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM d GROUP BY 1, 2, 3),
         |grid AS (SELECT g.c_mktsegment, g.c_nationkey, g.ng,
         |    b.band, b.cnt_g, coalesce(c.cnt, 0) AS cnt
         |  FROM grp g CROSS JOIN gb b
         |  LEFT JOIN cells c ON c.c_mktsegment = g.c_mktsegment
         |    AND c.c_nationkey = g.c_nationkey AND c.band = b.band),
         |cum AS (SELECT c_mktsegment, c_nationkey, ng,
         |    sum(CAST(cnt AS HUGEINT) * CAST(n_all AS HUGEINT)
         |        - CAST(cnt_g AS HUGEINT) * CAST(ng AS HUGEINT))
         |      OVER (PARTITION BY c_mktsegment, c_nationkey
         |        ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING
         |        AND CURRENT ROW) AS cumd,
         |    n_all, m
         |  FROM grid, sc)
         |SELECT c_mktsegment, c_nationkey, max(ng) AS n,
         |  CASE WHEN max(m) > 1 THEN
         |    ${f6("""CAST(sum(abs(cumd)) AS DOUBLE)
           |      / (CAST(max(m) - 1 AS DOUBLE) * CAST(max(ng) AS DOUBLE)
           |        * CAST(max(n_all) AS DOUBLE))""".stripMargin)}
         |  END AS emd
         |FROM cum GROUP BY 1, 2
         |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    // distinct-so-far via token FIRST occurrence — no per-checkpoint
    // re-scan; fully integer, no floats anywhere
    "q218_vocab_growth" ->
      s"""WITH docs AS (
         |  SELECT doc_id, $toks AS toks FROM documents),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs),
         |dec AS (SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_toks,
         |    (row_number() OVER (ORDER BY doc_id) - 1) * 10 // n_docs
         |      AS decile
         |  FROM docs, nd),
         |per_dec AS (SELECT decile, CAST(count(*) AS BIGINT) AS nd,
         |    CAST(sum(n_toks) AS BIGINT) AS tok
         |  FROM dec GROUP BY 1),
         |first_doc AS (SELECT token, min(doc_id) AS first_doc FROM (
         |    SELECT doc_id, unnest(list_distinct(toks)) AS token
         |    FROM docs) GROUP BY 1),
         |new_vocab AS (SELECT decile, CAST(count(*) AS BIGINT) AS nv
         |  FROM first_doc f JOIN dec d ON f.first_doc = d.doc_id
         |  GROUP BY 1)
         |SELECT decile,
         |  CAST(sum(nd) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
         |    PRECEDING AND CURRENT ROW) AS BIGINT) AS docs_cum,
         |  CAST(sum(tok) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
         |    PRECEDING AND CURRENT ROW) AS BIGINT) AS tokens_cum,
         |  CAST(sum(coalesce(nv, 0)) OVER (ORDER BY decile ROWS BETWEEN
         |    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_cum
         |FROM per_dec LEFT JOIN new_vocab USING (decile)
         |ORDER BY decile""".stripMargin,

    // 2²⁰ fixed-point component sums (q109 idiom); n cancels in the
    // cosine so sum-vectors stand in for centroids; HUGEINT dot/norms
    "q219_embedding_drift" ->
      s"""WITH e AS (
         |  SELECT label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |q AS (SELECT label, j,
         |    CAST(floor(v[j] * 1048576.0) AS BIGINT) AS qv
         |  FROM e, range(1, 65) t(j)),
         |lj AS (SELECT label, j, CAST(sum(qv) AS BIGINT) AS sl
         |  FROM q GROUP BY 1, 2),
         |g AS (SELECT j, CAST(sum(sl) AS BIGINT) AS sg FROM lj GROUP BY 1),
         |a AS (SELECT label,
         |    sum(CAST(sl AS HUGEINT) * CAST(sg AS HUGEINT)) AS dot,
         |    sum(CAST(sl AS HUGEINT) * CAST(sl AS HUGEINT)) AS nl2,
         |    sum(CAST(sg AS HUGEINT) * CAST(sg AS HUGEINT)) AS ng2
         |  FROM lj JOIN g USING (j) GROUP BY 1),
         |n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
         |  FROM embeddings GROUP BY 1)
         |SELECT label, n_vecs,
         |  ${f6("""CAST(dot AS DOUBLE)
           |    / (sqrt(CAST(nl2 AS DOUBLE)) * sqrt(CAST(ng2 AS DOUBLE)))"""
        .stripMargin)} AS cos_to_global
         |FROM a JOIN n USING (label) ORDER BY label""".stripMargin,

    // rightmost-min winnowing via the single-integer tie encoding
    // c = h·2²⁰ + (2²⁰−1−i); df-capped fingerprint overlap join
    "q220_winnowing" ->
      s"""WITH docs AS (
         |  SELECT doc_id, $toks AS tk FROM documents
         |  WHERE len($toks) >= 3),
         |grams AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
         |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
         |  FROM (SELECT doc_id, tk,
         |      unnest(generate_series(1, len(tk) - 2)) AS i
         |    FROM docs)),
         |hashed AS (SELECT doc_id, i, ${md5Mod("gram")} AS h FROM grams),
         |cc AS (SELECT doc_id, i,
         |    count(*) OVER (PARTITION BY doc_id) AS gcnt,
         |    min(h * 1048576 + (1048575 - i)) OVER (
         |      PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
         |  FROM hashed),
         |fps AS (SELECT DISTINCT doc_id, wmin // 1048576 AS h
         |  FROM cc WHERE i <= greatest(gcnt - 3, 1)),
         |cap AS (SELECT h FROM (
         |    SELECT h, count(*) AS df FROM fps GROUP BY 1)
         |  WHERE df <= 100),
         |k AS (SELECT f.doc_id, f.h FROM fps f JOIN cap USING (h))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY n_shared DESC, doc_a, doc_b
         |LIMIT 20""".stripMargin,

    // absorbing-chain value iteration in 10¹² fixed point: 8 chained
    // HUGEINT rounds with integer-DIV truncation, the q82 pattern
    "q221_markov_attribution" -> {
      def round(i: Int): String =
        s"""a$i AS (SELECT state, p FROM p${i - 1}
           |  UNION ALL SELECT 'purchase', CAST(1000000000000 AS HUGEINT)
           |  UNION ALL SELECT 'drop', CAST(0 AS HUGEINT)),
           |p$i AS (SELECT t.src AS state,
           |    sum(CAST(t.cnt AS HUGEINT) * a.p)
           |      // CAST(max(tt.tot) AS HUGEINT) AS p
           |  FROM trans t JOIN a$i a ON a.state = t.dst
           |    JOIN tot tt ON tt.src = t.src
           |  GROUP BY t.src)""".stripMargin
      s"""WITH steps AS (
         |  SELECT event_type AS src,
         |    coalesce(lead(event_type, 1) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id), 'drop') AS dst
         |  FROM events),
         |trans AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt
         |  FROM steps WHERE src <> 'purchase' GROUP BY 1, 2),
         |tot AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS tot
         |  FROM trans GROUP BY 1),
         |p0 AS (SELECT src AS state, CAST(0 AS HUGEINT) AS p FROM tot),
         |${(1 to 8).map(round).mkString(",\n")}
         |SELECT tt.src AS state, tt.tot AS n_out,
         |  CAST(p.p AS BIGINT) AS p_scaled,
         |  ${f6("CAST(p.p AS DOUBLE) / 1000000000000.0")} AS p_convert
         |FROM p8 p JOIN tot tt ON tt.src = p.state
         |ORDER BY state""".stripMargin
    },

    // sparse tf-vector cosine: dot is a token self-join (≤ sources²
    // rows per token), moments HUGEINT-exact, sqrt in the final double
    "q222_source_token_cosine" ->
      s"""WITH tf AS (
         |  SELECT source, token, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT source, unnest($toks) AS token FROM documents)
         |  GROUP BY 1, 2),
         |norms AS (SELECT source,
         |    sum(CAST(tf AS HUGEINT) * CAST(tf AS HUGEINT)) AS n2
         |  FROM tf GROUP BY 1),
         |dots AS (SELECT a.source AS source_a, b.source AS source_b,
         |    CAST(count(*) AS BIGINT) AS n_shared_tokens,
         |    sum(CAST(a.tf AS HUGEINT) * CAST(b.tf AS HUGEINT)) AS dot
         |  FROM tf a JOIN tf b ON a.token = b.token
         |    AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b, n_shared_tokens,
         |  ${f6("""CAST(dot AS DOUBLE)
           |    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))"""
        .stripMargin)} AS cosine
         |FROM dots
         |JOIN norms na ON na.source = source_a
         |JOIN norms nb ON nb.source = source_b
         |ORDER BY source_a, source_b""".stripMargin,

    // RRF with integer scaling: 10⁶ // (60 + rank) summed exactly
    "q223_rrf_fusion" ->
      s"""WITH docs AS (
         |  SELECT doc_id, n_chars, CAST(len($toks) AS BIGINT) AS n_toks
         |  FROM documents),
         |rc AS (SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS r_chars
         |  FROM docs),
         |rt AS (SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY n_toks DESC, doc_id) AS BIGINT) AS r_toks
         |  FROM docs)
         |SELECT doc_id, r_chars, r_toks,
         |  1000000 // (60 + r_chars) + 1000000 // (60 + r_toks)
         |    AS rrf_scaled,
         |  ${f6("""CAST(1000000 // (60 + r_chars)
           |    + 1000000 // (60 + r_toks) AS DOUBLE) / 1000000.0"""
        .stripMargin)} AS rrf
         |FROM docs JOIN rc USING (doc_id) JOIN rt USING (doc_id)
         |ORDER BY rrf_scaled DESC, doc_id LIMIT 20""".stripMargin,

    // Nelson–Aalen with right-censoring; each increment is the exact
    // scaled integer d·10¹² // n_risk, H is its running sum
    "q224_cumulative_hazard" ->
      s"""WITH users AS (
         |  SELECT o_orderkey,
         |    max(CAST(o_orderdate AS DATE)) AS first_d,
         |    max(CAST(l_shipdate AS DATE)) AS last_d
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  GROUP BY 1),
         |hz AS (SELECT max(last_d) AS h,
         |    CAST(count(*) AS BIGINT) AS n_users FROM users),
         |lives AS (SELECT
         |    CAST(date_diff('day', first_d, last_d) AS BIGINT) AS life,
         |    last_d <= h - 7 AS uncensored, n_users
         |  FROM users, hz),
         |by_day AS (SELECT life, CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum(CASE WHEN uncensored THEN 1 ELSE 0 END) AS BIGINT)
         |      AS deaths,
         |    max(n_users) AS n_users
         |  FROM lives GROUP BY 1),
         |at_risk AS (SELECT life, deaths,
         |    n_users - (CAST(sum(m) OVER (ORDER BY life ROWS BETWEEN
         |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - m)
         |      AS n_risk
         |  FROM by_day),
         |terms AS (SELECT life, deaths, n_risk,
         |    CAST(CAST(deaths AS HUGEINT) * 1000000000000 // n_risk
         |      AS BIGINT) AS term
         |  FROM at_risk)
         |SELECT life AS day, n_risk, deaths,
         |  h_scaled,
         |  ${f6("CAST(h_scaled AS DOUBLE) / 1000000000000.0")}
         |    AS cum_hazard
         |FROM (SELECT life, n_risk, deaths,
         |    CAST(sum(term) OVER (ORDER BY life ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS h_scaled
         |  FROM terms)
         |WHERE deaths > 0 ORDER BY day""".stripMargin,

    // tau-b on the bounded contingency table; C/D from dominating
    // cell pairs, doubled tie identities keep everything integral
    "q225_kendall_tau" ->
      s"""WITH cells AS (
         |  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS x,
         |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS j,
         |    CAST(count(*) AS BIGINT) AS f
         |  FROM lineitem GROUP BY 1, 2),
         |cagg AS (SELECT sum(CAST(a.f AS HUGEINT) * CAST(b.f AS HUGEINT))
         |    AS cc
         |  FROM cells a JOIN cells b ON b.x > a.x AND b.j > a.j),
         |dagg AS (SELECT sum(CAST(a.f AS HUGEINT) * CAST(b.f AS HUGEINT))
         |    AS dd
         |  FROM cells a JOIN cells b ON b.x > a.x AND b.j < a.j),
         |nagg AS (SELECT CAST(sum(f) AS BIGINT) AS n FROM cells),
         |tx AS (SELECT sum(CAST(r AS HUGEINT) * CAST(r - 1 AS HUGEINT))
         |    AS tx2
         |  FROM (SELECT CAST(sum(f) AS BIGINT) AS r FROM cells
         |        GROUP BY x)),
         |tj AS (SELECT sum(CAST(c AS HUGEINT) * CAST(c - 1 AS HUGEINT))
         |    AS tj2
         |  FROM (SELECT CAST(sum(f) AS BIGINT) AS c FROM cells
         |        GROUP BY j)),
         |m AS (SELECT n, CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT)
         |    AS a2, tx2, tj2, cc, dd
         |  FROM nagg, cagg, dagg, tx, tj)
         |SELECT n,
         |  CASE WHEN n > 1 AND a2 > tx2 AND a2 > tj2 THEN
         |    ${f6("""(CAST(cc - dd AS DOUBLE) * 2.0)
           |      / (sqrt(CAST(a2 - tx2 AS DOUBLE))
           |        * sqrt(CAST(a2 - tj2 AS DOUBLE)))""".stripMargin)}
         |  END AS tau_b
         |FROM m""".stripMargin,

    // q215's bins re-read as a P/R/F1 sweep; F1 = 2·TP/(pred+P) keeps
    // every metric a single exact division
    "q226_pr_curve" ->
      s"""WITH ev AS (
         |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS c,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |bounds AS (SELECT min(c) AS lo, max(c) AS hi FROM ev),
         |bins AS (
         |  SELECT (c - lo) * 20 // (hi - lo + 1) AS bin,
         |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos,
         |    max(lo) AS lo, max(hi) AS hi
         |  FROM ev, bounds GROUP BY 1),
         |cum AS (SELECT bin, lo, hi,
         |    CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
         |    CAST(sum(pos) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS pl
         |  FROM bins),
         |tot AS (SELECT max(nl) AS nt, max(pl) AS pt FROM cum),
         |cand AS (
         |  SELECT lo + (bin + 1) * (hi - lo + 1) // 20 AS thr,
         |    pt - pl AS tp, nt - nl - (pt - pl) AS fp, pl AS fn,
         |    nt - nl AS pred_pos, pt
         |  FROM cum, tot WHERE nl < nt)
         |SELECT thr, tp, fp, fn,
         |  CASE WHEN pred_pos > 0 THEN
         |    ${f6("CAST(tp AS DOUBLE) / CAST(pred_pos AS DOUBLE)")}
         |  END AS precision,
         |  CASE WHEN pt > 0 THEN
         |    ${f6("CAST(tp AS DOUBLE) / CAST(pt AS DOUBLE)")}
         |  END AS recall,
         |  CASE WHEN pred_pos + pt > 0 THEN
         |    ${f6("""(2.0 * CAST(tp AS DOUBLE))
           |      / CAST(pred_pos + pt AS DOUBLE)""".stripMargin)}
         |  END AS f1
         |FROM cand ORDER BY thr""".stripMargin,

    // pooled-variance Cohen's d as one pinned double tree over exact
    // HUGEINT class moments
    "q227_cohens_d" ->
      s"""WITH m AS (
         |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
         |      AS y,
         |    count(*) AS n,
         |    CAST(sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS HUGEINT)) AS DOUBLE) AS sx,
         |    CAST(sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS HUGEINT) *
         |      CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS HUGEINT)) AS DOUBLE) AS sxx
         |  FROM events GROUP BY 1),
         |p AS (SELECT n AS n1, sx AS sx1, sxx AS sxx1 FROM m WHERE y = 1),
         |o AS (SELECT n AS n0, sx AS sx0, sxx AS sxx0 FROM m WHERE y = 0)
         |SELECT n1, n0,
         |  CASE WHEN n1 > 1 AND n0 > 1 THEN
         |    ${f6("""(sx1 / CAST(n1 AS DOUBLE) - sx0 / CAST(n0 AS DOUBLE))
           |      / sqrt(((sxx1 - sx1 * sx1 / CAST(n1 AS DOUBLE))
           |        + (sxx0 - sx0 * sx0 / CAST(n0 AS DOUBLE)))
           |        / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE) - 2.0))"""
        .stripMargin)}
         |  END AS cohens_d
         |FROM p CROSS JOIN o""".stripMargin,

    // AP from the bin decomposition: Σ pos_b·tp_b·10¹² // (P·pred_b)
    // summed exactly, one display division
    "q228_average_precision" ->
      s"""WITH ev AS (
         |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS c,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |bounds AS (SELECT min(c) AS lo, max(c) AS hi FROM ev),
         |bins AS (
         |  SELECT (c - lo) * 20 // (hi - lo + 1) AS bin,
         |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
         |  FROM ev, bounds GROUP BY 1),
         |cum AS (SELECT bin, n, pos,
         |    CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
         |    CAST(sum(pos) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS pl
         |  FROM bins),
         |tot AS (SELECT max(nl) AS nt, max(pl) AS pt FROM cum),
         |terms AS (SELECT
         |    CAST(CAST(pos AS HUGEINT) * (pt - (pl - pos))
         |      * 1000000000000
         |      // (CAST(pt AS HUGEINT) * (nt - (nl - n))) AS BIGINT)
         |      AS term, pt
         |  FROM cum, tot WHERE pos > 0)
         |SELECT max(pt) AS n_pos, CAST(sum(term) AS BIGINT) AS ap_scaled,
         |  CASE WHEN max(pt) > 0 THEN
         |    ${f6("CAST(sum(term) AS DOUBLE) / 1000000000000.0")}
         |  END AS avg_precision
         |FROM terms""".stripMargin,

    // deterministic resampling: 30 md5-gated replicate means, spread
    // read off the 30-row order statistics
    "q229_resample_stability" ->
      s"""WITH means AS (
         |  SELECT rep, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS HUGEINT)) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE) AS mean_c
         |  FROM (SELECT value, event_id,
         |      unnest(generate_series(1, 30)) AS rep
         |    FROM events WHERE event_type = 'purchase')
         |  WHERE ${md5Long(
        "CAST(event_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)")}
         |    % 3 = 0
         |  GROUP BY 1),
         |ranked AS (SELECT mean_c,
         |    row_number() OVER (ORDER BY mean_c, rep) AS rk
         |  FROM means)
         |SELECT CAST(count(*) AS BIGINT) AS n_reps,
         |  ${f6("min(mean_c)")} AS lo,
         |  ${f6("max(CASE WHEN rk = 4 THEN mean_c END)")} AS p10,
         |  ${f6("max(CASE WHEN rk = 16 THEN mean_c END)")} AS p50,
         |  ${f6("max(CASE WHEN rk = 27 THEN mean_c END)")} AS p90,
         |  ${f6("max(mean_c)")} AS hi
         |FROM ranked""".stripMargin,

    // Lindley identity: b = S − least(0, running min S) turns the
    // floor-at-zero recurrence into two windows
    "q230_capped_inventory" ->
      s"""WITH li AS (
         |  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
         |    l_orderkey, l_linenumber,
         |    CASE WHEN l_returnflag = 'R'
         |      THEN -CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
         |        AS BIGINT)
         |      ELSE CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
         |        AS BIGINT) END AS x
         |  FROM lineitem),
         |sums AS (SELECT l_partkey, d, l_orderkey, l_linenumber,
         |    CAST(sum(x) OVER w AS BIGINT) AS s
         |  FROM li
         |  WINDOW w AS (PARTITION BY l_partkey
         |    ORDER BY d, l_orderkey, l_linenumber
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |walked AS (SELECT l_partkey, d, l_orderkey, l_linenumber,
         |    s - least(0, CAST(min(s) OVER w AS BIGINT)) AS b
         |  FROM sums
         |  WINDOW w AS (PARTITION BY l_partkey
         |    ORDER BY d, l_orderkey, l_linenumber
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |agg AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_moves,
         |    max(b) AS high_water
         |  FROM walked GROUP BY 1),
         |closing AS (SELECT l_partkey, b AS closing FROM (
         |    SELECT l_partkey, b, row_number() OVER (
         |      PARTITION BY l_partkey
         |      ORDER BY d DESC, l_orderkey DESC, l_linenumber DESC) AS rn
         |    FROM walked) WHERE rn = 1)
         |SELECT l_partkey, n_moves, high_water, closing
         |FROM agg JOIN closing USING (l_partkey)
         |ORDER BY closing DESC, l_partkey LIMIT 20""".stripMargin,

    // user-day gaps-and-islands; island key = day_num − row_number
    "q231_longest_streak" ->
      s"""WITH days AS (
         |  SELECT DISTINCT user_id,
         |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
         |  FROM events),
         |islands AS (SELECT user_id,
         |    date_diff('day', DATE '1970-01-01', d)
         |      - row_number() OVER (PARTITION BY user_id ORDER BY d)
         |      AS grp,
         |    d
         |  FROM days)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS len,
         |  strftime(min(d), '%Y-%m-%d') AS streak_start,
         |  strftime(max(d), '%Y-%m-%d') AS streak_end
         |FROM islands GROUP BY user_id, grp
         |ORDER BY len DESC, user_id, min(d) LIMIT 20""".stripMargin,

    // exact half-life: cents·2⁻ʷ as (cents·2²⁰) >> min(w,40) — pure
    // integer shifts, bit-identical decay in any engine
    "q232_decayed_value" ->
      s"""WITH o AS (
         |  SELECT o_custkey,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS cents,
         |    CAST(o_orderdate AS DATE) AS d
         |  FROM orders),
         |hz AS (SELECT max(d) AS h FROM o),
         |aged AS (SELECT o_custkey, cents,
         |    ((cents * 1048576) >> CAST(least(
         |      CAST(floor(date_diff('day', d, h) / 7.0) AS BIGINT), 40)
         |      AS INTEGER)) AS decayed
         |  FROM o, hz)
         |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(cents) AS BIGINT) AS total_cents,
         |  CAST(sum(decayed) AS BIGINT) AS decayed_scaled,
         |  ${f6("CAST(sum(decayed) AS DOUBLE) / 1048576.0")}
         |    AS decayed_cents
         |FROM aged GROUP BY 1
         |ORDER BY decayed_scaled DESC, o_custkey LIMIT 20""".stripMargin,

    // variance-to-mean of per-(customer,week) order counts with the
    // zero cells corrected algebraically — the grid never exists
    "q233_overdispersion" ->
      s"""WITH o AS (
         |  SELECT o_custkey, date_trunc('week', o_orderdate) AS wk
         |  FROM orders),
         |cells AS (SELECT o_custkey, wk, CAST(count(*) AS BIGINT) AS x
         |  FROM o GROUP BY 1, 2),
         |wks AS (SELECT CAST(count(DISTINCT wk) AS BIGINT) AS n_weeks
         |  FROM o),
         |cst AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT)
         |    AS n_cust FROM o),
         |m AS (SELECT CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
         |      AS DOUBLE) AS sxx
         |  FROM cells)
         |SELECT n_cust, n_weeks, sx AS n_orders,
         |  CASE WHEN sx > 0 THEN
         |    ${f6("""(sxx / (CAST(n_cust AS DOUBLE)
           |        * CAST(n_weeks AS DOUBLE))
           |      - (CAST(sx AS DOUBLE) / (CAST(n_cust AS DOUBLE)
           |        * CAST(n_weeks AS DOUBLE)))
           |      * (CAST(sx AS DOUBLE) / (CAST(n_cust AS DOUBLE)
           |        * CAST(n_weeks AS DOUBLE))))
           |    / (CAST(sx AS DOUBLE) / (CAST(n_cust AS DOUBLE)
           |      * CAST(n_weeks AS DOUBLE)))""".stripMargin)}
         |  END AS vmr
         |FROM m, wks, cst""".stripMargin,

    // Lorenz curve over population deciles: gidx·10 // n assigns the
    // decile, cum_cents stays an exact BIGINT, ONE double division
    "q234_lorenz_curve" ->
      s"""WITH rev AS (
         |  SELECT o_custkey,
         |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS r
         |  FROM orders GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM rev),
         |idx AS (SELECT r,
         |    row_number() OVER (ORDER BY r, o_custkey) - 1 AS gidx
         |  FROM rev),
         |dec AS (SELECT r, gidx * 10 // nc AS decile FROM idx, n),
         |perdec AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
         |    CAST(sum(r) AS BIGINT) AS cents
         |  FROM dec GROUP BY 1),
         |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM perdec),
         |cum AS (SELECT decile, n_cust,
         |    CAST(sum(cents) OVER (ORDER BY decile
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_cents
         |  FROM perdec)
         |SELECT decile, n_cust, cum_cents,
         |  CASE WHEN total > 0 THEN
         |    ${f6("CAST(cum_cents AS DOUBLE) / CAST(total AS DOUBLE)")}
         |  END AS cum_share
         |FROM cum, tot ORDER BY decile""".stripMargin,

    // Two-sample KS: the sup CDF gap evaluated at every distinct
    // pooled value, exact integer |cumA·nB − cumB·nA| over the common
    // denominator, argmax tie-broken smallest-v, ONE double division
    "q235_ks_test" ->
      s"""WITH li AS (
         |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS v,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         |  FROM lineitem),
         |s AS (SELECT v, CAST(sum(y) AS BIGINT) AS ca,
         |    CAST(count(*) - sum(y) AS BIGINT) AS cb
         |  FROM li GROUP BY 1),
         |cum AS (SELECT v,
         |    CAST(sum(ca) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_ca,
         |    CAST(sum(cb) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_cb
         |  FROM s),
         |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
         |    CAST(sum(cb) AS BIGINT) AS n_b FROM s),
         |gaps AS (SELECT v,
         |    abs(CAST(cum_ca AS HUGEINT) * n_b -
         |        CAST(cum_cb AS HUGEINT) * n_a) AS gap
         |  FROM cum, tot),
         |best AS (SELECT gap, v FROM gaps ORDER BY gap DESC, v ASC
         |  LIMIT 1)
         |SELECT n_a, n_b, v AS v_at_max,
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN
         |    ${f6("""CAST(gap AS DOUBLE)
           |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"""
        .stripMargin)}
         |  END AS ks_d
         |FROM best, tot""".stripMargin,

    // Tie-corrected Mann–Whitney: 2U and Σ(t³−t) exact in HUGEINT,
    // effect size and z as terminal doubles whose operation order
    // mirrors the Spark expression token for token (sqrt and divide
    // are correctly rounded — bit-reproducible across engines)
    "q236_mann_whitney" ->
      s"""WITH li AS (
         |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS v,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         |  FROM lineitem),
         |s AS (SELECT v, CAST(sum(y) AS BIGINT) AS ca,
         |    CAST(count(*) - sum(y) AS BIGINT) AS cb
         |  FROM li GROUP BY 1),
         |cum AS (SELECT ca, cb,
         |    CAST(coalesce(sum(cb) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cbb
         |  FROM s),
         |agg AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
         |    CAST(sum(cb) AS BIGINT) AS n_b,
         |    sum(CAST(ca AS HUGEINT) *
         |      (2 * CAST(cbb AS HUGEINT) + CAST(cb AS HUGEINT))) AS u2,
         |    sum(CAST(ca + cb AS HUGEINT) * CAST(ca + cb AS HUGEINT) *
         |        CAST(ca + cb AS HUGEINT) - CAST(ca + cb AS HUGEINT))
         |      AS tie3
         |  FROM cum)
         |SELECT n_a, n_b,
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN
         |    ${f6("""CAST(u2 AS DOUBLE)
           |      / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"""
        .stripMargin)}
         |  END AS cles,
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN
         |    ${f6("""(CAST(u2 AS DOUBLE) / 2.0
           |      - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
           |      / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
           |        * (((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) + 1.0)
           |          - CAST(tie3 AS DOUBLE)
           |            / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
           |              * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
           |                - 1.0))))""".stripMargin)}
         |  END AS z
         |FROM agg""".stripMargin,

    // HITS, 2 bounded rounds replayed as chained CTEs: each round is
    // an exact long sum then an L1 renormalization x·2^30 // Σx with
    // the product in HUGEINT — the q82 fixed-point discipline on an
    // alternating recurrence; one scalar subquery per normalization
    "q237_hits" ->
      """WITH e AS (SELECT DISTINCT l_suppkey + 1000000 AS src,
        |    l_partkey AS dst FROM lineitem),
        |h0 AS (SELECT DISTINCT src AS id,
        |    CAST(1073741824 AS BIGINT) AS h FROM e),
        |a1r AS (SELECT dst, CAST(sum(h) AS BIGINT) AS ar
        |  FROM e JOIN h0 ON e.src = h0.id GROUP BY 1),
        |a1t AS (SELECT CASE WHEN coalesce(sum(ar), 0) = 0
        |    THEN CAST(1 AS HUGEINT)
        |    ELSE CAST(sum(ar) AS HUGEINT) END AS t FROM a1r),
        |a1 AS (SELECT dst,
        |    CAST(CAST(ar AS HUGEINT) * 1073741824 // t AS BIGINT) AS a
        |  FROM a1r, a1t),
        |h1r AS (SELECT src, CAST(sum(a) AS BIGINT) AS hr
        |  FROM e JOIN a1 USING (dst) GROUP BY 1),
        |h1t AS (SELECT CASE WHEN coalesce(sum(hr), 0) = 0
        |    THEN CAST(1 AS HUGEINT)
        |    ELSE CAST(sum(hr) AS HUGEINT) END AS t FROM h1r),
        |h1 AS (SELECT src AS id,
        |    CAST(CAST(hr AS HUGEINT) * 1073741824 // t AS BIGINT) AS h
        |  FROM h1r, h1t),
        |a2r AS (SELECT dst, CAST(sum(h) AS BIGINT) AS ar
        |  FROM e JOIN h1 ON e.src = h1.id GROUP BY 1),
        |a2t AS (SELECT CASE WHEN coalesce(sum(ar), 0) = 0
        |    THEN CAST(1 AS HUGEINT)
        |    ELSE CAST(sum(ar) AS HUGEINT) END AS t FROM a2r),
        |a2 AS (SELECT dst,
        |    CAST(CAST(ar AS HUGEINT) * 1073741824 // t AS BIGINT) AS a
        |  FROM a2r, a2t),
        |h2r AS (SELECT src, CAST(sum(a) AS BIGINT) AS hr
        |  FROM e JOIN a2 USING (dst) GROUP BY 1),
        |h2t AS (SELECT CASE WHEN coalesce(sum(hr), 0) = 0
        |    THEN CAST(1 AS HUGEINT)
        |    ELSE CAST(sum(hr) AS HUGEINT) END AS t FROM h2r),
        |h2 AS (SELECT src AS id,
        |    CAST(CAST(hr AS HUGEINT) * 1073741824 // t AS BIGINT) AS h
        |  FROM h2r, h2t)
        |SELECT coalesce(a2.dst, h2.id) AS id,
        |  coalesce(a2.a, CAST(0 AS BIGINT)) AS auth_fixed,
        |  coalesce(h2.h, CAST(0 AS BIGINT)) AS hub_fixed
        |FROM a2 FULL OUTER JOIN h2 ON a2.dst = h2.id
        |ORDER BY auth_fixed DESC, id ASC LIMIT 20""".stripMargin,

    // ACF at lags 1–7 on N-scaled integer deviations e_t = N·x_t − S:
    // numerators and denominator exact in HUGEINT, one double
    // division per lag (the f6 floor applied to num/den directly)
    "q238_acf" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx FROM daily),
        |dev AS (SELECT d, CAST(x AS HUGEINT) * n - sx AS e
        |  FROM daily, tot),
        |lagged AS (SELECT e,
        |    lag(e, 1) OVER (ORDER BY d) AS e1,
        |    lag(e, 2) OVER (ORDER BY d) AS e2,
        |    lag(e, 3) OVER (ORDER BY d) AS e3,
        |    lag(e, 4) OVER (ORDER BY d) AS e4,
        |    lag(e, 5) OVER (ORDER BY d) AS e5,
        |    lag(e, 6) OVER (ORDER BY d) AS e6,
        |    lag(e, 7) OVER (ORDER BY d) AS e7
        |  FROM dev),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(e * e) AS den,
        |    sum(CASE WHEN e1 IS NOT NULL THEN e * e1 END) AS num1,
        |    sum(CASE WHEN e2 IS NOT NULL THEN e * e2 END) AS num2,
        |    sum(CASE WHEN e3 IS NOT NULL THEN e * e3 END) AS num3,
        |    sum(CASE WHEN e4 IS NOT NULL THEN e * e4 END) AS num4,
        |    sum(CASE WHEN e5 IS NOT NULL THEN e * e5 END) AS num5,
        |    sum(CASE WHEN e6 IS NOT NULL THEN e * e6 END) AS num6,
        |    sum(CASE WHEN e7 IS NOT NULL THEN e * e7 END) AS num7
        |  FROM lagged)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS lag, n - 1 AS n_pairs,
        |    CASE WHEN den > 0 THEN floor(CAST(num1 AS DOUBLE)
        |      / CAST(den AS DOUBLE) * 1000000) / 1000000.0 END AS acf
        |  FROM agg
        |  UNION ALL SELECT CAST(2 AS BIGINT), n - 2,
        |    CASE WHEN den > 0 THEN floor(CAST(num2 AS DOUBLE)
        |      / CAST(den AS DOUBLE) * 1000000) / 1000000.0 END FROM agg
        |  UNION ALL SELECT CAST(3 AS BIGINT), n - 3,
        |    CASE WHEN den > 0 THEN floor(CAST(num3 AS DOUBLE)
        |      / CAST(den AS DOUBLE) * 1000000) / 1000000.0 END FROM agg
        |  UNION ALL SELECT CAST(4 AS BIGINT), n - 4,
        |    CASE WHEN den > 0 THEN floor(CAST(num4 AS DOUBLE)
        |      / CAST(den AS DOUBLE) * 1000000) / 1000000.0 END FROM agg
        |  UNION ALL SELECT CAST(5 AS BIGINT), n - 5,
        |    CASE WHEN den > 0 THEN floor(CAST(num5 AS DOUBLE)
        |      / CAST(den AS DOUBLE) * 1000000) / 1000000.0 END FROM agg
        |  UNION ALL SELECT CAST(6 AS BIGINT), n - 6,
        |    CASE WHEN den > 0 THEN floor(CAST(num6 AS DOUBLE)
        |      / CAST(den AS DOUBLE) * 1000000) / 1000000.0 END FROM agg
        |  UNION ALL SELECT CAST(7 AS BIGINT), n - 7,
        |    CASE WHEN den > 0 THEN floor(CAST(num7 AS DOUBLE)
        |      / CAST(den AS DOUBLE) * 1000000) / 1000000.0 END FROM agg
        |) ORDER BY lag""".stripMargin,

    // Herfindahl per region: HHI = Σr² / (Σr)² by cross-multiplication
    // — exact HUGEINT moments, one double division per region
    "q239_herfindahl" ->
      s"""WITH rev AS (
         |  SELECT r_name, s_suppkey,
         |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS r
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  GROUP BY 1, 2)
         |SELECT r_name, CAST(count(*) AS BIGINT) AS n_sup,
         |  CASE WHEN sum(CAST(r AS HUGEINT)) > 0 THEN
         |    ${f6("""CAST(sum(CAST(r AS HUGEINT) * CAST(r AS HUGEINT))
           |        AS DOUBLE)
           |      / (CAST(sum(CAST(r AS HUGEINT)) AS DOUBLE)
           |        * CAST(sum(CAST(r AS HUGEINT)) AS DOUBLE))"""
        .stripMargin)}
         |  END AS hhi
         |FROM rev GROUP BY 1 ORDER BY r_name""".stripMargin,

    // Kruskal–Wallis: doubled tie-averaged ranks keep 2R_g integral;
    // the five KNOWN priority groups pivot to one row so the Σ over
    // groups is a fixed-order scalar double expression
    "q240_kruskal_wallis" ->
      s"""WITH ord AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS v,
         |    o_orderpriority AS g
         |  FROM orders),
         |bygv AS (SELECT v, g, CAST(count(*) AS BIGINT) AS cnt
         |  FROM ord GROUP BY 1, 2),
         |byv AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS t
         |  FROM bygv GROUP BY 1),
         |cum AS (SELECT v, t,
         |    CAST(coalesce(sum(t) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS below
         |  FROM byv),
         |perg AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS ng,
         |    sum(CAST(cnt AS HUGEINT) *
         |      CAST(2 * below + t + 1 AS HUGEINT)) AS r2
         |  FROM bygv JOIN cum USING (v) GROUP BY 1),
         |ties AS (SELECT CAST(sum(t) AS BIGINT) AS n,
         |    sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT) *
         |        CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS tie3
         |  FROM cum),
         |piv AS (SELECT
         |    max(CASE WHEN g = '1-URGENT' THEN r2 END) AS r2_0,
         |    max(CASE WHEN g = '2-HIGH' THEN r2 END) AS r2_1,
         |    max(CASE WHEN g = '3-MEDIUM' THEN r2 END) AS r2_2,
         |    max(CASE WHEN g = '4-NOT SPECIFIED' THEN r2 END) AS r2_3,
         |    max(CASE WHEN g = '5-LOW' THEN r2 END) AS r2_4,
         |    max(CASE WHEN g = '1-URGENT' THEN ng END) AS ng_0,
         |    max(CASE WHEN g = '2-HIGH' THEN ng END) AS ng_1,
         |    max(CASE WHEN g = '3-MEDIUM' THEN ng END) AS ng_2,
         |    max(CASE WHEN g = '4-NOT SPECIFIED' THEN ng END) AS ng_3,
         |    max(CASE WHEN g = '5-LOW' THEN ng END) AS ng_4
         |  FROM perg)
         |SELECT n,
         |  ${f6("""3.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
           |      * (CAST(r2_0 AS DOUBLE) * CAST(r2_0 AS DOUBLE)
           |          / (4.0 * CAST(ng_0 AS DOUBLE))
           |        + CAST(r2_1 AS DOUBLE) * CAST(r2_1 AS DOUBLE)
           |          / (4.0 * CAST(ng_1 AS DOUBLE))
           |        + CAST(r2_2 AS DOUBLE) * CAST(r2_2 AS DOUBLE)
           |          / (4.0 * CAST(ng_2 AS DOUBLE))
           |        + CAST(r2_3 AS DOUBLE) * CAST(r2_3 AS DOUBLE)
           |          / (4.0 * CAST(ng_3 AS DOUBLE))
           |        + CAST(r2_4 AS DOUBLE) * CAST(r2_4 AS DOUBLE)
           |          / (4.0 * CAST(ng_4 AS DOUBLE)))
           |      - 3.0 * (CAST(n AS DOUBLE) + 1.0)""".stripMargin)}
         |    AS h,
         |  ${f6("""(3.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
           |      * (CAST(r2_0 AS DOUBLE) * CAST(r2_0 AS DOUBLE)
           |          / (4.0 * CAST(ng_0 AS DOUBLE))
           |        + CAST(r2_1 AS DOUBLE) * CAST(r2_1 AS DOUBLE)
           |          / (4.0 * CAST(ng_1 AS DOUBLE))
           |        + CAST(r2_2 AS DOUBLE) * CAST(r2_2 AS DOUBLE)
           |          / (4.0 * CAST(ng_2 AS DOUBLE))
           |        + CAST(r2_3 AS DOUBLE) * CAST(r2_3 AS DOUBLE)
           |          / (4.0 * CAST(ng_3 AS DOUBLE))
           |        + CAST(r2_4 AS DOUBLE) * CAST(r2_4 AS DOUBLE)
           |          / (4.0 * CAST(ng_4 AS DOUBLE)))
           |      - 3.0 * (CAST(n AS DOUBLE) + 1.0))
           |      / (1.0 - CAST(tie3 AS DOUBLE)
           |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
           |          * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))"""
        .stripMargin)}
         |    AS h_corrected
         |FROM piv, ties""".stripMargin,

    // Cramér–von Mises: Σ t·gap² with the cross-multiplied integer
    // gap, exact in HUGEINT, one terminal double division
    "q241_cramer_von_mises" ->
      s"""WITH li AS (
         |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS v,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         |  FROM lineitem),
         |s AS (SELECT v, CAST(sum(y) AS BIGINT) AS ca,
         |    CAST(count(*) - sum(y) AS BIGINT) AS cb
         |  FROM li GROUP BY 1),
         |cum AS (SELECT v, ca, cb,
         |    CAST(sum(ca) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_ca,
         |    CAST(sum(cb) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_cb
         |  FROM s),
         |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
         |    CAST(sum(cb) AS BIGINT) AS n_b FROM s),
         |agg AS (SELECT sum(CAST(ca + cb AS HUGEINT) *
         |      (CAST(cum_ca AS HUGEINT) * n_b -
         |       CAST(cum_cb AS HUGEINT) * n_a) *
         |      (CAST(cum_ca AS HUGEINT) * n_b -
         |       CAST(cum_cb AS HUGEINT) * n_a)) AS s
         |  FROM cum, tot)
         |SELECT n_a, n_b,
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN
         |    ${f6("""CAST(s AS DOUBLE)
           |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
           |        * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
           |        * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))"""
        .stripMargin)}
         |  END AS cvm
         |FROM agg, tot""".stripMargin,

    // Welch's t: exact HUGEINT moments, then means/variances/standard
    // errors as named intermediates computed with the identical
    // operation order as the Spark expression tree
    "q242_welch_t" ->
      s"""WITH ev AS (
         |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS c,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events WHERE event_type IN ('purchase', 'click')),
         |m AS (SELECT CAST(sum(y) AS BIGINT) AS n_a,
         |    CAST(count(*) - sum(y) AS BIGINT) AS n_b,
         |    sum(CASE WHEN y = 1 THEN CAST(c AS HUGEINT)
         |      ELSE CAST(0 AS HUGEINT) END) AS sa,
         |    sum(CASE WHEN y = 0 THEN CAST(c AS HUGEINT)
         |      ELSE CAST(0 AS HUGEINT) END) AS sb,
         |    sum(CASE WHEN y = 1 THEN CAST(c AS HUGEINT) *
         |      CAST(c AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS qa,
         |    sum(CASE WHEN y = 0 THEN CAST(c AS HUGEINT) *
         |      CAST(c AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS qb
         |  FROM ev),
         |d AS (SELECT n_a, n_b,
         |    CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
         |    CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
         |    (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) *
         |      CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE))
         |      / (CAST(n_a AS DOUBLE) - 1.0) AS va,
         |    (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) *
         |      CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE))
         |      / (CAST(n_b AS DOUBLE) - 1.0) AS vb
         |  FROM m),
         |e AS (SELECT n_a, n_b, ma, mb,
         |    va / CAST(n_a AS DOUBLE) AS sea,
         |    vb / CAST(n_b AS DOUBLE) AS seb
         |  FROM d)
         |SELECT n_a, n_b,
         |  CASE WHEN n_a > 1 AND n_b > 1 THEN
         |    ${f6("(ma - mb) / sqrt(sea + seb)")}
         |  END AS t_stat,
         |  CASE WHEN n_a > 1 AND n_b > 1 THEN
         |    ${f6("""((sea + seb) * (sea + seb))
           |      / (sea * sea / (CAST(n_a AS DOUBLE) - 1.0)
           |        + seb * seb / (CAST(n_b AS DOUBLE) - 1.0))"""
        .stripMargin)}
         |  END AS df
         |FROM e""".stripMargin,

    // Ljung–Box at h=7 on the q238 moment CTEs: Q = N(N+2)·Σ r_k²/(N−k)
    // with r_k = num_k/den, seven terms in fixed order
    "q243_ljung_box" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx FROM daily),
         |dev AS (SELECT d, CAST(x AS HUGEINT) * n - sx AS e
         |  FROM daily, tot),
         |lagged AS (SELECT e,
         |    lag(e, 1) OVER (ORDER BY d) AS e1,
         |    lag(e, 2) OVER (ORDER BY d) AS e2,
         |    lag(e, 3) OVER (ORDER BY d) AS e3,
         |    lag(e, 4) OVER (ORDER BY d) AS e4,
         |    lag(e, 5) OVER (ORDER BY d) AS e5,
         |    lag(e, 6) OVER (ORDER BY d) AS e6,
         |    lag(e, 7) OVER (ORDER BY d) AS e7
         |  FROM dev),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(e * e) AS den,
         |    sum(CASE WHEN e1 IS NOT NULL THEN e * e1 END) AS num1,
         |    sum(CASE WHEN e2 IS NOT NULL THEN e * e2 END) AS num2,
         |    sum(CASE WHEN e3 IS NOT NULL THEN e * e3 END) AS num3,
         |    sum(CASE WHEN e4 IS NOT NULL THEN e * e4 END) AS num4,
         |    sum(CASE WHEN e5 IS NOT NULL THEN e * e5 END) AS num5,
         |    sum(CASE WHEN e6 IS NOT NULL THEN e * e6 END) AS num6,
         |    sum(CASE WHEN e7 IS NOT NULL THEN e * e7 END) AS num7
         |  FROM lagged)
         |SELECT n AS n_days,
         |  CASE WHEN den > 0 AND n > 7 THEN
         |    ${f6("""CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
           |      * ((CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE))
           |          * (CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE))
           |          / (CAST(n AS DOUBLE) - 1.0)
           |        + (CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE))
           |          * (CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE))
           |          / (CAST(n AS DOUBLE) - 2.0)
           |        + (CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE))
           |          * (CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE))
           |          / (CAST(n AS DOUBLE) - 3.0)
           |        + (CAST(num4 AS DOUBLE) / CAST(den AS DOUBLE))
           |          * (CAST(num4 AS DOUBLE) / CAST(den AS DOUBLE))
           |          / (CAST(n AS DOUBLE) - 4.0)
           |        + (CAST(num5 AS DOUBLE) / CAST(den AS DOUBLE))
           |          * (CAST(num5 AS DOUBLE) / CAST(den AS DOUBLE))
           |          / (CAST(n AS DOUBLE) - 5.0)
           |        + (CAST(num6 AS DOUBLE) / CAST(den AS DOUBLE))
           |          * (CAST(num6 AS DOUBLE) / CAST(den AS DOUBLE))
           |          / (CAST(n AS DOUBLE) - 6.0)
           |        + (CAST(num7 AS DOUBLE) / CAST(den AS DOUBLE))
           |          * (CAST(num7 AS DOUBLE) / CAST(den AS DOUBLE))
           |          / (CAST(n AS DOUBLE) - 7.0))""".stripMargin)}
         |  END AS q_lb
         |FROM agg""".stripMargin,

    // Cross-correlation at lags −3..+3 on N-scaled integer deviations
    // of two daily series; per-lag terminal double with mirrored
    // operation order (num / (sqrt(sxx)·sqrt(syy)))
    "q244_cross_corr" -> {
      def ccf(num: String): String =
        s"""CASE WHEN sxx > 0 AND syy > 0 THEN
           |    ${f6(s"""CAST($num AS DOUBLE)
             |      / (sqrt(CAST(sxx AS DOUBLE))
             |        * sqrt(CAST(syy AS DOUBLE)))""".stripMargin)}
           |  END""".stripMargin
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x,
         |    CAST(count(*) AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(y) AS BIGINT) AS sy FROM daily),
         |dev AS (SELECT d, CAST(x AS HUGEINT) * n - sx AS ex,
         |    CAST(y AS HUGEINT) * n - sy AS ey
         |  FROM daily, tot),
         |lagged AS (SELECT ex, ey,
         |    lag(ex, 1) OVER (ORDER BY d) AS ex1,
         |    lag(ex, 2) OVER (ORDER BY d) AS ex2,
         |    lag(ex, 3) OVER (ORDER BY d) AS ex3,
         |    lag(ey, 1) OVER (ORDER BY d) AS ey1,
         |    lag(ey, 2) OVER (ORDER BY d) AS ey2,
         |    lag(ey, 3) OVER (ORDER BY d) AS ey3
         |  FROM dev),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(ex * ex) AS sxx, sum(ey * ey) AS syy,
         |    sum(ex * ey) AS num0,
         |    sum(CASE WHEN ey1 IS NOT NULL THEN ex * ey1 END) AS nump1,
         |    sum(CASE WHEN ey2 IS NOT NULL THEN ex * ey2 END) AS nump2,
         |    sum(CASE WHEN ey3 IS NOT NULL THEN ex * ey3 END) AS nump3,
         |    sum(CASE WHEN ex1 IS NOT NULL THEN ex1 * ey END) AS numm1,
         |    sum(CASE WHEN ex2 IS NOT NULL THEN ex2 * ey END) AS numm2,
         |    sum(CASE WHEN ex3 IS NOT NULL THEN ex3 * ey END) AS numm3
         |  FROM lagged)
         |SELECT * FROM (
         |  SELECT CAST(-3 AS BIGINT) AS lag, n - 3 AS n_pairs,
         |    ${ccf("numm3")} AS ccf FROM agg
         |  UNION ALL SELECT CAST(-2 AS BIGINT), n - 2,
         |    ${ccf("numm2")} FROM agg
         |  UNION ALL SELECT CAST(-1 AS BIGINT), n - 1,
         |    ${ccf("numm1")} FROM agg
         |  UNION ALL SELECT CAST(0 AS BIGINT), n - 0,
         |    ${ccf("num0")} FROM agg
         |  UNION ALL SELECT CAST(1 AS BIGINT), n - 1,
         |    ${ccf("nump1")} FROM agg
         |  UNION ALL SELECT CAST(2 AS BIGINT), n - 2,
         |    ${ccf("nump2")} FROM agg
         |  UNION ALL SELECT CAST(3 AS BIGINT), n - 3,
         |    ${ccf("nump3")} FROM agg
         |) ORDER BY lag""".stripMargin
    },

    // Cramér's V: per-cell χ² terms summed in a DETERMINISTIC
    // sequential order (running-sum window over (lang, source)) so the
    // double fold is bit-identical to Spark's; V from the raw χ²
    "q245_cramers_v" ->
      s"""WITH cell AS (
         |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
         |  FROM documents GROUP BY 1, 2),
         |rm AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rm
         |  FROM cell GROUP BY 1),
         |cm AS (SELECT source, CAST(sum(o) AS BIGINT) AS cm
         |  FROM cell GROUP BY 1),
         |n AS (SELECT CAST(sum(o) AS BIGINT) AS n,
         |    CAST(count(DISTINCT lang) AS BIGINT) AS r_levels,
         |    CAST(count(DISTINCT source) AS BIGINT) AS c_levels
         |  FROM cell),
         |terms AS (SELECT cell.lang, cell.source, n.n, n.r_levels,
         |    n.c_levels,
         |    (CAST(o AS DOUBLE) - CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
         |        / CAST(n.n AS DOUBLE))
         |      * (CAST(o AS DOUBLE) - CAST(rm AS DOUBLE)
         |          * CAST(cm AS DOUBLE) / CAST(n.n AS DOUBLE))
         |      / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
         |        / CAST(n.n AS DOUBLE)) AS term
         |  FROM cell JOIN rm USING (lang) JOIN cm USING (source), n),
         |folded AS (SELECT n, r_levels, c_levels,
         |    sum(term) OVER (ORDER BY lang, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS chi2,
         |    row_number() OVER (ORDER BY lang, source) AS rn,
         |    count(*) OVER () AS m
         |  FROM terms)
         |SELECT n, r_levels, c_levels,
         |  ${f6("chi2")} AS chi2,
         |  ${f6("""sqrt(chi2 / (CAST(n AS DOUBLE)
           |      * CAST(least(r_levels, c_levels) - 1 AS DOUBLE)))"""
        .stripMargin)}
         |    AS cramers_v
         |FROM folded WHERE rn = m""".stripMargin,

    // MASE: both absolute-difference sums exact integers; one ratio of
    // means at the end
    "q246_mase" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |lagged AS (SELECT x,
         |    lag(x, 1) OVER (ORDER BY d) AS x1,
         |    lag(x, 7) OVER (ORDER BY d) AS x7
         |  FROM daily),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN x7 IS NOT NULL THEN abs(x - x7) END)
         |      AS BIGINT) AS s7,
         |    CAST(sum(CASE WHEN x1 IS NOT NULL THEN abs(x - x1) END)
         |      AS BIGINT) AS s1
         |  FROM lagged)
         |SELECT n AS n_days, s7 AS sum_abs_seasonal,
         |  s1 AS sum_abs_naive,
         |  CASE WHEN n > 8 AND s1 > 0 THEN
         |    ${f6("""(CAST(s7 AS DOUBLE) / (CAST(n AS DOUBLE) - 7.0))
           |      / (CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0))"""
        .stripMargin)}
         |  END AS mase
         |FROM agg""".stripMargin,

    // PACF lags 1–3: Durbin–Levinson closed forms through CTE-named
    // intermediates, operation order mirroring the Spark expressions
    "q247_pacf" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx FROM daily),
         |dev AS (SELECT d, CAST(x AS HUGEINT) * n - sx AS e
         |  FROM daily, tot),
         |lagged AS (SELECT e,
         |    lag(e, 1) OVER (ORDER BY d) AS e1,
         |    lag(e, 2) OVER (ORDER BY d) AS e2,
         |    lag(e, 3) OVER (ORDER BY d) AS e3
         |  FROM dev),
         |agg AS (SELECT sum(e * e) AS den,
         |    sum(CASE WHEN e1 IS NOT NULL THEN e * e1 END) AS num1,
         |    sum(CASE WHEN e2 IS NOT NULL THEN e * e2 END) AS num2,
         |    sum(CASE WHEN e3 IS NOT NULL THEN e * e3 END) AS num3
         |  FROM lagged),
         |r AS (SELECT den,
         |    CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
         |    CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2,
         |    CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE) AS r3
         |  FROM agg),
         |p2 AS (SELECT *, (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22
         |  FROM r),
         |p3 AS (SELECT *, r1 - phi22 * r1 AS phi21 FROM p2)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS lag,
         |    CASE WHEN den > 0 THEN ${f6("r1")} END AS pacf FROM p3
         |  UNION ALL SELECT CAST(2 AS BIGINT),
         |    CASE WHEN den > 0 THEN ${f6("phi22")} END FROM p3
         |  UNION ALL SELECT CAST(3 AS BIGINT),
         |    CASE WHEN den > 0 THEN
         |      ${f6("""(r3 - phi21 * r2 - phi22 * r1)
           |      / (1.0 - phi21 * r1 - phi22 * r2)""".stripMargin)}
         |    END FROM p3
         |) ORDER BY lag""".stripMargin,

    // Leave-one-out target encoding: (Σ−y)·10⁶ // (n−1) exact per row,
    // audited per category (count/min/max/Σ of the integer codes)
    "q248_loo_encoding" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS y
        |  FROM orders),
        |st AS (SELECT g, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(count(*) AS BIGINT) AS n FROM o GROUP BY 1),
        |enc AS (SELECT o.g,
        |    CAST(CAST(sy - y AS HUGEINT) * 1000000
        |      // CAST(n - 1 AS HUGEINT) AS BIGINT) AS enc
        |  FROM o JOIN st USING (g) WHERE n > 1)
        |SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
        |  min(enc) AS min_enc, max(enc) AS max_enc,
        |  CAST(sum(enc) AS BIGINT) AS sum_enc
        |FROM enc GROUP BY 1 ORDER BY g""".stripMargin,

    // Feature hashing: bucket = md5_60 % 64, sign = next hash bit;
    // signed sums exact, the 64-dim corpus vector engine-portable
    "q249_feature_hash" ->
      s"""WITH t AS (SELECT $toks AS tk FROM documents),
         |e AS (SELECT unnest(tk) AS tok FROM t),
         |f AS (SELECT tok FROM e WHERE len(tok) > 0),
         |h AS (SELECT ${md5Long("tok")} AS h FROM f)
         |SELECT h % 64 AS idx, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END)
         |    AS BIGINT) AS sum_w
         |FROM h GROUP BY 1 ORDER BY idx""".stripMargin,

    // Two-proportion z on the md5 A/B split: four exact integers, the
    // pooled-variance z through named double intermediates
    "q250_two_proportion_z" ->
      s"""WITH u AS (
         |  SELECT user_id,
         |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
         |      END) AS BIGINT) AS conv
         |  FROM events GROUP BY 1),
         |a AS (SELECT conv,
         |    ${md5Long("CAST(user_id AS VARCHAR)")} % 2 AS arm FROM u),
         |m AS (SELECT
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_b,
         |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
         |      AS x_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
         |      AS x_b
         |  FROM a),
         |d AS (SELECT n_a, n_b, x_a, x_b,
         |    CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
         |    CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
         |    CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
         |  FROM m)
         |SELECT n_a, n_b, x_a, x_b,
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN ${f6("pa - pb")} END
         |    AS lift,
         |  CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0
         |      AND x_a + x_b < n_a + n_b THEN
         |    ${f6("""(pa - pb) / sqrt(pp * (1.0 - pp)
           |      * (1.0 / CAST(n_a AS DOUBLE)
           |        + 1.0 / CAST(n_b AS DOUBLE)))""".stripMargin)}
         |  END AS z
         |FROM d""".stripMargin,

    // Max drawdown: cumulative + running-max windows keep every
    // drawdown an exact cent integer; the relative max is a max over
    // per-row doubles (order-independent, unlike a double sum)
    "q251_max_drawdown" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |cum AS (SELECT d,
         |    CAST(sum(x) OVER (ORDER BY d
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM daily),
         |rm AS (SELECT d, cum,
         |    CAST(max(cum) OVER (ORDER BY d
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS runmax
         |  FROM cum)
         |SELECT CAST(count(*) AS BIGINT) AS n_days,
         |  CAST(max(runmax - cum) AS BIGINT) AS max_dd_cents,
         |  ${f6("""max(CASE WHEN runmax > 0 THEN
           |      CAST(runmax - cum AS DOUBLE) / CAST(runmax AS DOUBLE)
           |    END)""".stripMargin)} AS max_dd_frac
         |FROM rm""".stripMargin,

    // Fused two-sample readout: the q235/q236/q241 pipelines merged
    // over one shared per-value CDF — identical arithmetic per test
    "q252_two_sample_summary" ->
      s"""WITH li AS (
         |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS v,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         |  FROM lineitem),
         |s AS (SELECT v, CAST(sum(y) AS BIGINT) AS ca,
         |    CAST(count(*) - sum(y) AS BIGINT) AS cb
         |  FROM li GROUP BY 1),
         |cum AS (SELECT v, ca, cb,
         |    CAST(sum(ca) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_ca,
         |    CAST(sum(cb) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_cb
         |  FROM s),
         |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
         |    CAST(sum(cb) AS BIGINT) AS n_b FROM s),
         |g AS (SELECT v, ca, cb, ca + cb AS t, cum_cb - cb AS cbb,
         |    CAST(cum_ca AS HUGEINT) * n_b -
         |      CAST(cum_cb AS HUGEINT) * n_a AS gap
         |  FROM cum, tot),
         |best AS (SELECT abs(gap) AS gap, v FROM g
         |  ORDER BY abs(gap) DESC, v ASC LIMIT 1),
         |agg AS (SELECT
         |    sum(CAST(ca AS HUGEINT) *
         |      (2 * CAST(cbb AS HUGEINT) + CAST(cb AS HUGEINT))) AS u2,
         |    sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT) *
         |        CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS tie3,
         |    sum(CAST(t AS HUGEINT) * gap * gap) AS cvm_s
         |  FROM g)
         |SELECT n_a, n_b, best.v AS v_at_max,
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN
         |    ${f6("""CAST(best.gap AS DOUBLE)
           |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"""
        .stripMargin)}
         |  END AS ks_d,
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN
         |    ${f6("""CAST(u2 AS DOUBLE)
           |      / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"""
        .stripMargin)}
         |  END AS cles,
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN
         |    ${f6("""(CAST(u2 AS DOUBLE) / 2.0
           |      - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
           |      / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
           |        * (((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) + 1.0)
           |          - CAST(tie3 AS DOUBLE)
           |            / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
           |              * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
           |                - 1.0))))""".stripMargin)}
         |  END AS z,
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN
         |    ${f6("""CAST(cvm_s AS DOUBLE)
           |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
           |        * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
           |        * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))"""
        .stripMargin)}
         |  END AS cvm
         |FROM best, agg, tot""".stripMargin,

    // Pettitt: U_t = Σ(2r_i) − t(N+1) exact with doubled midranks;
    // K = max|U_t|, split day tie-broken earliest
    "q253_pettitt" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |byv AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt
         |  FROM daily GROUP BY 1),
         |rk AS (SELECT x,
         |    2 * CAST(coalesce(sum(cnt) OVER (ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) + cnt + 1 AS r2
         |  FROM byv),
         |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
         |ut AS (SELECT d, n,
         |    CAST(sum(r2) OVER (ORDER BY d
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS HUGEINT)
         |      - CAST(row_number() OVER (ORDER BY d) AS HUGEINT)
         |        * (n + 1) AS u
         |  FROM daily JOIN rk USING (x), n1),
         |best AS (SELECT n, abs(u) AS k, d FROM ut
         |  ORDER BY abs(u) DESC, d ASC LIMIT 1)
         |SELECT n AS n_days, CAST(k AS BIGINT) AS k_stat,
         |  strftime(d, '%Y-%m-%d') AS split_day,
         |  ${f6("""6.0 * CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
           |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
           |          * CAST(n AS DOUBLE)
           |        + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"""
        .stripMargin)}
         |    AS k_exponent
         |FROM best""".stripMargin,

    // Day-of-week eta²: between-group over total SS from exact
    // integer moments; the 7 fixed groups pivot to one row so the
    // between-group sum has a fixed operation order. DuckDB's
    // dayofweek is 0-based Sunday; +1 aligns with Spark's 1-based
    "q254_dow_seasonality" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |dw AS (SELECT x, CAST(dayofweek(d) + 1 AS BIGINT) AS dow
         |  FROM daily),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx,
         |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
         |  FROM dw),
         |perg AS (SELECT dow, CAST(count(*) AS BIGINT) AS ng,
         |    CAST(sum(x) AS BIGINT) AS sg FROM dw GROUP BY 1),
         |piv AS (SELECT
         |    ${(1 to 7).map(g =>
               s"max(CASE WHEN dow = $g THEN sg END) AS sg_$g, " +
                 s"max(CASE WHEN dow = $g THEN ng END) AS ng_$g")
               .mkString(",\n         |    ")}
         |  FROM perg)
         |SELECT n AS n_days,
         |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |      / CAST(n AS DOUBLE) > 0 THEN
         |    ${f6("(" + (1 to 7).map(g =>
               s"""CASE WHEN ng_$g IS NOT NULL AND ng_$g > 0 THEN
                  |      (CAST(n AS DOUBLE) * CAST(sg_$g AS DOUBLE)
                  |        - CAST(ng_$g AS DOUBLE) * CAST(sx AS DOUBLE))
                  |      * (CAST(n AS DOUBLE) * CAST(sg_$g AS DOUBLE)
                  |        - CAST(ng_$g AS DOUBLE) * CAST(sx AS DOUBLE))
                  |      / (CAST(ng_$g AS DOUBLE)
                  |        * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                  |    ELSE 0.0 END""".stripMargin)
               .mkString("\n         |    + ") + """)
           |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           |      / CAST(n AS DOUBLE))""".stripMargin)}
         |  END AS eta2
         |FROM piv, tot""".stripMargin,

    // dHash from the generator's closed-form channels: bit (y, x) set
    // iff gray(x,y) > gray(x+1,y) on the 8×8 grid (7 comparisons per
    // row, idx = y*7+x) — lossless PNG makes this ≡ decode-then-hash
    "q255_image_dhash" ->
      """WITH g AS (SELECT DISTINCT doc_id - doc_id % 7 AS gid
        |    FROM documents),
        |cells AS (SELECT g.gid, x.i AS x, y.i AS y,
        |    ((g.gid*31 + x.i*7 + y.i*13) % 256)
        |      + ((g.gid*17 + x.i*11 + y.i*3) % 256)
        |      + ((g.gid*5 + x.i*19 + y.i*29) % 256) AS gray
        |  FROM g, generate_series(0, 7) AS x(i),
        |    generate_series(0, 7) AS y(i)),
        |bits AS (SELECT a.gid, a.y * 7 + a.x AS idx
        |  FROM cells a JOIN cells b
        |    ON a.gid = b.gid AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 7 AND a.gray > b.gray),
        |h AS (SELECT gid,
        |    CAST(COALESCE(sum(CAST(1 AS BIGINT) << idx), 0) AS BIGINT)
        |      AS dhash
        |  FROM bits GROUP BY gid),
        |hashes AS (SELECT g.gid, COALESCE(h.dhash, 0) AS dhash
        |  FROM g LEFT JOIN h USING (gid))
        |SELECT dhash, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM (SELECT doc_id, doc_id - doc_id % 7 AS gid FROM documents)
        |JOIN hashes USING (gid)
        |GROUP BY 1 ORDER BY dhash""".stripMargin,

    // Q–Q deciles: per class, decile k = min v with cum·10 ≥ k·n
    // (exact discrete percentile by cross-multiplication), 18
    // conditional mins in one pass, unpivoted to 9 rows
    "q256_qq_deciles" -> {
      val mins = (1 to 9).map(k =>
        s"""min(CASE WHEN cum_ca * 10 >= $k * n_a THEN v END) AS qa_$k,
           |    min(CASE WHEN cum_cb * 10 >= $k * n_b THEN v END)
           |      AS qb_$k""".stripMargin).mkString(",\n    ")
      val rows = (1 to 9).map(k =>
        s"""SELECT CAST($k AS BIGINT) AS decile, qa_$k AS v_returned,
           |    qb_$k AS v_kept, qa_$k - qb_$k AS gap_cents FROM one"""
          .stripMargin).mkString("\n  UNION ALL ")
      s"""WITH li AS (
         |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS v,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         |  FROM lineitem),
         |s AS (SELECT v, CAST(sum(y) AS BIGINT) AS ca,
         |    CAST(count(*) - sum(y) AS BIGINT) AS cb
         |  FROM li GROUP BY 1),
         |cum AS (SELECT v,
         |    CAST(sum(ca) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_ca,
         |    CAST(sum(cb) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_cb
         |  FROM s),
         |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
         |    CAST(sum(cb) AS BIGINT) AS n_b FROM s),
         |one AS (SELECT
         |    $mins
         |  FROM cum, tot)
         |SELECT * FROM (
         |  $rows
         |) ORDER BY decile""".stripMargin
    },

    // Vocabulary Jaccard per source pair: distinct (source, token),
    // one token equi-join, |A∪B| = |A|+|B|−|A∩B|, one division/pair
    "q257_vocab_jaccard" ->
      s"""WITH t AS (SELECT source, $toks AS tk FROM documents),
         |e AS (SELECT DISTINCT source, unnest(tk) AS tok FROM t),
         |f AS (SELECT source, tok FROM e WHERE len(tok) > 0),
         |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS nv
         |  FROM f GROUP BY 1),
         |inter AS (SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(count(*) AS BIGINT) AS n_common
         |  FROM f a JOIN f b ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, sa.nv AS nv_a, sb.nv AS nv_b, n_common,
         |  ${f6("""CAST(n_common AS DOUBLE)
           |      / CAST(sa.nv + sb.nv - n_common AS DOUBLE)"""
        .stripMargin)}
         |    AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.source = src_a
         |JOIN sizes sb ON sb.source = src_b
         |ORDER BY src_a, src_b""".stripMargin,

    // ESS = (Σw)²/Σw² exact HUGEINT moments, one terminal division;
    // design effect = n/ESS from the same row
    "q258_effective_sample_size" ->
      s"""WITH w AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS w
         |  FROM orders),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(w AS HUGEINT)) AS sw,
         |    sum(CAST(w AS HUGEINT) * CAST(w AS HUGEINT)) AS sww
         |  FROM w)
         |SELECT n,
         |  CASE WHEN sww > 0 THEN
         |    ${f6("""(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
           |      / CAST(sww AS DOUBLE)""".stripMargin)}
         |  END AS ess,
         |  CASE WHEN sww > 0 THEN
         |    ${f6("""CAST(n AS DOUBLE)
           |      / ((CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
           |        / CAST(sww AS DOUBLE))""".stripMargin)}
         |  END AS design_effect
         |FROM m""".stripMargin,

    // Kaplan–Meier on the q224 frame: ordered prefix product over the
    // model-sized event table via list_reduce in ascending-life order
    // (IEEE 1.0·x = x ⇒ the init-vs-first-element fold shapes agree
    // with Spark's aggregate)
    "q259_kaplan_meier" ->
      s"""WITH users AS (
         |  SELECT o_orderkey,
         |    max(CAST(o_orderdate AS DATE)) AS first_d,
         |    max(CAST(l_shipdate AS DATE)) AS last_d
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  GROUP BY 1),
         |hz AS (SELECT max(last_d) AS h,
         |    CAST(count(*) AS BIGINT) AS n_users FROM users),
         |lives AS (SELECT
         |    CAST(date_diff('day', first_d, last_d) AS BIGINT) AS life,
         |    last_d <= h - 7 AS uncensored, n_users
         |  FROM users, hz),
         |by_day AS (SELECT life, CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum(CASE WHEN uncensored THEN 1 ELSE 0 END) AS BIGINT)
         |      AS deaths,
         |    max(n_users) AS n_users
         |  FROM lives GROUP BY 1),
         |ev AS (SELECT life,
         |    n_users - (CAST(sum(m) OVER (ORDER BY life ROWS BETWEEN
         |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - m)
         |      AS n_risk,
         |    deaths
         |  FROM by_day),
         |fac AS (SELECT life, n_risk, deaths,
         |    CAST(n_risk - deaths AS DOUBLE) / CAST(n_risk AS DOUBLE)
         |      AS factor
         |  FROM ev WHERE deaths > 0),
         |one AS (SELECT list(life ORDER BY life) AS ls,
         |    list(n_risk ORDER BY life) AS ns,
         |    list(deaths ORDER BY life) AS ds,
         |    list(factor ORDER BY life) AS fs
         |  FROM fac),
         |rows AS (SELECT unnest([{'day': ls[i], 'n_risk': ns[i],
         |      'deaths': ds[i],
         |      's': list_reduce(fs[1:i], (a, b) -> a * b)}
         |    for i in range(1, len(fs) + 1)],
         |    recursive := true)
         |  FROM one)
         |SELECT day, n_risk, deaths, ${f6("s")} AS survival
         |FROM rows ORDER BY day""".stripMargin,

    // Log-rank: per event day, observed vs expected group-A deaths
    // and the hypergeometric variance as 10¹²-scaled exact integral
    // divisions, summed in HUGEINT; z is the one terminal double
    "q260_log_rank" ->
      s"""WITH users AS (
         |  SELECT o_orderkey,
         |    max(CAST(o_orderdate AS DATE)) AS first_d,
         |    max(CAST(l_shipdate AS DATE)) AS last_d,
         |    CAST(max(CASE WHEN o_orderpriority = '1-URGENT'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS grp
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  GROUP BY 1),
         |hz AS (SELECT max(last_d) AS h FROM users),
         |lives AS (SELECT
         |    CAST(date_diff('day', first_d, last_d) AS BIGINT) AS life,
         |    last_d <= h - 7 AS uncensored, grp
         |  FROM users, hz),
         |by_day AS (SELECT life, CAST(sum(grp) AS BIGINT) AS ma,
         |    CAST(count(*) - sum(grp) AS BIGINT) AS mb,
         |    CAST(sum(CASE WHEN uncensored THEN grp ELSE 0 END)
         |      AS BIGINT) AS da,
         |    CAST(sum(CASE WHEN uncensored THEN 1 - grp ELSE 0 END)
         |      AS BIGINT) AS db
         |  FROM lives GROUP BY 1),
         |tot AS (SELECT CAST(sum(ma) AS BIGINT) AS na_tot,
         |    CAST(sum(mb) AS BIGINT) AS nb_tot FROM by_day),
         |cum AS (SELECT life, ma, mb, da, db,
         |    CAST(sum(ma) OVER (ORDER BY life ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_ma,
         |    CAST(sum(mb) OVER (ORDER BY life ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_mb
         |  FROM by_day),
         |pre AS (SELECT da, db, da + db AS d,
         |    na_tot - (cum_ma - ma) AS na,
         |    nb_tot - (cum_mb - mb) AS nb
         |  FROM cum, tot WHERE da + db > 0),
         |terms AS (SELECT da, d,
         |    CAST(CAST(d AS HUGEINT) * na * 1000000000000
         |      // (na + nb) AS BIGINT) AS e_s,
         |    CASE WHEN na + nb > 1 THEN
         |      CAST(CAST(d AS HUGEINT) * (na + nb - d) * na * nb
         |        * 1000000000000
         |        // ((na + nb - 1) * CAST(na + nb AS HUGEINT)
         |          * (na + nb)) AS BIGINT)
         |    ELSE 0 END AS v_s
         |  FROM pre),
         |agg AS (SELECT CAST(sum(da) AS BIGINT) AS o_a,
         |    CAST(count(*) AS BIGINT) AS n_event_days,
         |    sum(CAST(e_s AS HUGEINT)) AS es,
         |    sum(CAST(v_s AS HUGEINT)) AS vs
         |  FROM terms)
         |SELECT o_a, n_event_days,
         |  ${f6("CAST(es AS DOUBLE) / 1000000000000.0")} AS e_a,
         |  CASE WHEN vs > 0 THEN
         |    ${f6("""(CAST(o_a AS DOUBLE)
           |      - CAST(es AS DOUBLE) / 1000000000000.0)
           |      / sqrt(CAST(vs AS DOUBLE) / 1000000000000.0)"""
        .stripMargin)}
         |  END AS z
         |FROM agg""".stripMargin,

    // Mann–Kendall: S from the ordered self-join of the daily frame,
    // ×18 tie-corrected variance exact, continuity-corrected z
    "q261_mann_kendall" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |pairs AS (SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
         |      WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
         |  FROM daily a JOIN daily b ON a.d < b.d),
         |ties AS (SELECT CAST(sum(t) AS BIGINT) AS n,
         |    sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS tie18
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS t
         |    FROM daily GROUP BY x))
         |SELECT n AS n_days, s_stat,
         |  CASE WHEN CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5)
         |      - tie18 AS DOUBLE) > 0 THEN
         |    ${f6("""(CASE WHEN s_stat > 0
           |        THEN CAST(s_stat AS DOUBLE) - 1.0
           |      WHEN s_stat < 0 THEN CAST(s_stat AS DOUBLE) + 1.0
           |      ELSE 0.0 END)
           |      / sqrt(CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5)
           |        - tie18 AS DOUBLE) / 18.0)""".stripMargin)}
         |  END AS z
         |FROM pairs, ties""".stripMargin,

    // Theil–Sen: pairwise slopes = ONE IEEE division of exact ints
    // each; DISCRETE median via collapsed-value cumulative counts —
    // min(slope where cum ≥ (n+1)//2) picks an actual element
    "q262_theil_sen" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |slopes AS (SELECT CAST(b.x - a.x AS DOUBLE)
         |    / CAST(b.d - a.d AS DOUBLE) AS slope
         |  FROM daily a JOIN daily b ON a.d < b.d),
         |byv AS (SELECT slope, count(*) AS cnt FROM slopes GROUP BY 1),
         |cum AS (SELECT slope, sum(cnt) OVER (ORDER BY slope) AS cum
         |  FROM byv),
         |n AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily)
         |    AS n_days,
         |  (SELECT CAST(count(*) AS BIGINT) FROM slopes) AS n_pairs),
         |med AS (SELECT min(slope) AS m FROM cum, n
         |  WHERE cum >= (n_pairs + 1) // 2)
         |SELECT n_days, n_pairs, ${f6("m")} AS ts_slope
         |FROM n, med""".stripMargin,

    // Hodges–Lehmann shift between md5 arms of the daily series:
    // median of all pairwise b−a differences, integer cents end to end
    "q263_hodges_lehmann" ->
      s"""WITH ev AS (SELECT
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    CAST(ts AS DATE) AS d,
         |    ${md5Long("CAST(event_id AS VARCHAR)")} % 2 AS arm
         |  FROM events),
         |daily AS (SELECT d, arm, CAST(sum(c) AS BIGINT) AS x
         |  FROM ev GROUP BY 1, 2),
         |a AS (SELECT x AS xa FROM daily WHERE arm = 0),
         |b AS (SELECT x AS xb FROM daily WHERE arm = 1),
         |diffs AS (SELECT xb - xa AS diff FROM b, a),
         |byv AS (SELECT diff, count(*) AS cnt FROM diffs GROUP BY 1),
         |cum AS (SELECT diff, sum(cnt) OVER (ORDER BY diff) AS cum
         |  FROM byv),
         |n AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
         |  (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b),
         |med AS (SELECT CAST(min(diff) AS BIGINT) AS m FROM cum, n
         |  WHERE cum >= (n_a * n_b + 1) // 2)
         |SELECT n_a, n_b, n_a * n_b AS n_pairs, m AS hl_shift_cents
         |FROM n, med""".stripMargin,

    // neighborhood Jaccard over the q181 bipartite graph: same capped
    // incidence, exact-integer cross-multiplied ppm ranking
    "q264_neighborhood_jaccard" ->
      """WITH inc AS MATERIALIZED (
        |  SELECT DISTINCT o_custkey AS node, l_partkey AS nbr
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'),
        |capped AS (SELECT nbr FROM inc GROUP BY nbr
        |  HAVING count(*) BETWEEN 2 AND 64),
        |incc AS MATERIALIZED (
        |  SELECT node, nbr FROM inc WHERE nbr IN (SELECT nbr FROM capped)),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
        |  FROM incc GROUP BY node),
        |pairs AS (SELECT x.node AS id_a, y.node AS id_b,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM incc x JOIN incc y
        |    ON x.nbr = y.nbr AND x.node < y.node
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, n_common,
        |  da.deg + db.deg - n_common AS union_size,
        |  n_common * 1000000 // (da.deg + db.deg - n_common) AS jac_ppm
        |FROM pairs
        |JOIN deg da ON da.node = id_a
        |JOIN deg db ON db.node = id_b
        |ORDER BY jac_ppm DESC, id_a ASC, id_b ASC LIMIT 100""".stripMargin,

    // strict-order funnel: each step's min-ts must precede the next
    // step's qualifying events; conversion as exact ppm floor division
    "q265_conversion_funnel" ->
      """WITH e AS (SELECT user_id, event_type, ts FROM events),
        |t1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(ts) AS t2 FROM e
        |  JOIN t1 ON e.user_id = t1.user_id
        |  WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(ts) AS t3 FROM e
        |  JOIN t2 ON e.user_id = t2.user_id
        |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n_step1,
        |  (SELECT CAST(count(*) AS BIGINT) FROM t2) AS n_step2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM t3) AS n_step3,
        |  CASE WHEN (SELECT count(*) FROM t1) > 0 THEN
        |    (SELECT count(*) FROM t2) * 1000000
        |      // (SELECT count(*) FROM t1) END AS conv12_ppm,
        |  CASE WHEN (SELECT count(*) FROM t2) > 0 THEN
        |    (SELECT count(*) FROM t3) * 1000000
        |      // (SELECT count(*) FROM t2) END AS conv23_ppm,
        |  CASE WHEN (SELECT count(*) FROM t1) > 0 THEN
        |    (SELECT count(*) FROM t3) * 1000000
        |      // (SELECT count(*) FROM t1) END AS conv13_ppm""".stripMargin,

    // classical additive decomposition: ×7-scaled exact integers;
    // doubles only in the final /7.0 and the per-dow mean, pinned
    "q266_ts_decomposition" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |tr AS (SELECT d, t7, 7 * x - t7 AS d7, dayofweek(d) AS dw
         |  FROM (SELECT d, x,
         |      CAST(sum(x) OVER w AS BIGINT) AS t7,
         |      count(*) OVER w AS c7
         |    FROM daily
         |    WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING
         |      AND 3 FOLLOWING))
         |  WHERE c7 = 7),
         |seas AS (SELECT dw,
         |    CAST(CAST(sum(d7) AS BIGINT) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE) AS s7
         |  FROM tr GROUP BY 1)
         |SELECT strftime(d, '%Y-%m-%d') AS d,
         |  ${f6("CAST(t7 AS DOUBLE) / 7.0")} AS trend,
         |  ${f6("s7 / 7.0")} AS seasonal,
         |  ${f6("(CAST(d7 AS DOUBLE) - s7) / 7.0")} AS remainder
         |FROM tr JOIN seas USING (dw)
         |ORDER BY d""".stripMargin,

    // Brier under the portable split: train bins fit exact ppm rates,
    // eval squared error exact in HUGEINT, ONE terminal division
    "q267_brier_score" ->
      s"""WITH ev AS (SELECT
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      // 1000 AS bin,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         |    ${md5Long("CAST(event_id AS VARCHAR)")} % 2 AS arm
         |  FROM events),
         |bins AS (SELECT bin,
         |    CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS p_ppm
         |  FROM ev WHERE arm = 0 GROUP BY 1),
         |gl AS (SELECT
         |    CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS g_ppm
         |  FROM ev WHERE arm = 0),
         |scored AS (SELECT e.y,
         |    coalesce(b.p_ppm, (SELECT g_ppm FROM gl)) AS p
         |  FROM ev e LEFT JOIN bins b USING (bin) WHERE e.arm = 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_eval,
         |  ${f6("""CAST(sum(CAST(p - y * 1000000 AS HUGEINT)
           |      * (p - y * 1000000)) AS DOUBLE)
           |    / (CAST(count(*) AS DOUBLE) * 1.0e12)""".stripMargin)}
         |    AS brier
         |FROM scored""".stripMargin,

    // Chao1 per source: S + f1(f1−1)/(2(f2+1)), one division on exact
    // integers (bias-corrected form — denominator never 0)
    "q268_chao1_richness" ->
      s"""WITH t AS (SELECT source, $toks AS tk FROM documents),
         |e AS (SELECT source, unnest(tk) AS tok FROM t),
         |f AS (SELECT source, tok FROM e WHERE len(tok) > 0),
         |cnts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM f GROUP BY 1, 2)
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS s_types,
         |  CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
         |  ${f6("""CAST(count(*) AS DOUBLE)
           |    + CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
           |        * (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1)
           |        AS DOUBLE)
           |      / CAST(2 * (sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1)
           |        AS DOUBLE)""".stripMargin)} AS chao1
         |FROM cnts GROUP BY source
         |ORDER BY source""".stripMargin,

    // TV distance over token distributions: common-denominator exact
    // integer mass (shared tokens via ONE equi-join, disjoint mass via
    // the totals identity), ONE terminal division per pair; the pair
    // frame is the full source cross so zero-overlap pairs emit TV=1
    "q269_tv_distance" ->
      s"""WITH t AS (SELECT source, $toks AS tk FROM documents),
         |e AS (SELECT source, unnest(tk) AS tok FROM t),
         |f AS (SELECT source, tok FROM e WHERE len(tok) > 0),
         |cnts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM f GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
         |  FROM cnts GROUP BY 1),
         |cn AS MATERIALIZED (SELECT c.source, c.tok, c.c, t.n
         |  FROM cnts c JOIN tot t ON c.source = t.source),
         |pairs AS (SELECT ta.source AS src_a, tb.source AS src_b,
         |    ta.n AS n_a, tb.n AS n_b
         |  FROM tot ta JOIN tot tb ON ta.source < tb.source),
         |common AS (SELECT a.source AS src_a, b.source AS src_b,
         |    sum(a.c) AS ca_common, sum(b.c) AS cb_common,
         |    sum(abs(CAST(a.c AS HUGEINT) * b.n
         |      - CAST(b.c AS HUGEINT) * a.n)) AS s_in
         |  FROM cn a JOIN cn b
         |    ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b,
         |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         |  ${f6("""CAST(COALESCE(s_in, 0)
           |      + CAST(n_a - COALESCE(ca_common, 0) AS HUGEINT) * n_b
           |      + CAST(n_b - COALESCE(cb_common, 0) AS HUGEINT) * n_a
           |      AS DOUBLE)
           |    / CAST(CAST(2 AS HUGEINT) * n_a * n_b AS DOUBLE)"""
        .stripMargin)} AS tv
         |FROM pairs LEFT JOIN common USING (src_a, src_b)
         |ORDER BY src_a, src_b""".stripMargin,

    // DCT-sign hash recomputed from the closed-form channels with the
    // SAME pinned integer basis (Multimodal.DctBasis) — exact integer
    // transform both engines, the q171/q255 lossless-codec treatment
    "q270_image_phash" ->
      s"""WITH g AS (SELECT DISTINCT doc_id - doc_id % 7 AS gid
         |    FROM documents),
         |cells AS (SELECT g.gid, x.i AS x, y.i AS y,
         |    ((g.gid*31 + x.i*7 + y.i*13) % 256)
         |      + ((g.gid*17 + x.i*11 + y.i*3) % 256)
         |      + ((g.gid*5 + x.i*19 + y.i*29) % 256) AS gray
         |  FROM g, generate_series(0, 7) AS x(i),
         |    generate_series(0, 7) AS y(i)),
         |basis(u, i, w) AS (VALUES $dctBasisValues),
         |coef AS (SELECT c.gid, bu.u AS u, bv.u AS v,
         |    sum(bu.w * bv.w * c.gray) AS d
         |  FROM cells c
         |  JOIN basis bu ON bu.i = c.y
         |  JOIN basis bv ON bv.i = c.x
         |  GROUP BY 1, 2, 3),
         |bits AS (SELECT gid, u * 8 + v AS idx FROM coef WHERE d > 0),
         |h AS (SELECT gid,
         |    CAST(COALESCE(sum(CASE WHEN idx >= 32
         |      THEN CAST(1 AS BIGINT) << (idx - 32) END), 0) AS BIGINT)
         |      AS phash_hi,
         |    CAST(COALESCE(sum(CASE WHEN idx < 32
         |      THEN CAST(1 AS BIGINT) << idx END), 0) AS BIGINT)
         |      AS phash_lo
         |  FROM bits GROUP BY gid),
         |hashes AS (SELECT g.gid, COALESCE(h.phash_hi, 0) AS phash_hi,
         |    COALESCE(h.phash_lo, 0) AS phash_lo
         |  FROM g LEFT JOIN h USING (gid))
         |SELECT phash_hi, phash_lo, CAST(count(*) AS BIGINT) AS n_docs,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM (SELECT doc_id, doc_id - doc_id % 7 AS gid FROM documents)
         |JOIN hashes USING (gid)
         |GROUP BY 1, 2 ORDER BY phash_hi, phash_lo""".stripMargin,

    // Holt level+trend recurrence replayed as a recursive CTE —
    // '//' and Scala Long '/' both truncate toward zero, so the
    // integer halving matches even when the trend goes negative
    "q271_holt_smoothing" ->
      """WITH RECURSIVE daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS x,
        |    row_number() OVER (ORDER BY strftime(ts, '%Y-%m-%d')) AS rn
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT day, rn, x AS l, CAST(0 AS BIGINT) AS b
        |  FROM daily WHERE rn = 1
        |  UNION ALL
        |  SELECT d.day, d.rn,
        |    (d.x + r.l + r.b) // 2,
        |    (r.b + ((d.x + r.l + r.b) // 2 - r.l)) // 2
        |  FROM daily d JOIN r ON d.rn = r.rn + 1)
        |SELECT day, CAST(l AS BIGINT) AS level_cents,
        |  CAST(b AS BIGINT) AS trend_cents,
        |  CAST(l + b AS BIGINT) AS forecast_cents
        |FROM r ORDER BY day""".stripMargin,

    // grid-density clustering: dense-cell threshold by integer
    // cross-multiply, 4 min-label rounds as chained CTEs over the
    // 8-neighborhood cell graph
    "q272_grid_density" ->
      """WITH o AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cx,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |cells AS (SELECT cx, cents // 2500000 AS cy,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM o GROUP BY 1, 2),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |    CAST(sum(n) AS BIGINT) AS n_rows FROM cells),
        |dense AS MATERIALIZED (SELECT cx, cy, n,
        |    cx * 100000 + cy AS label
        |  FROM cells, tot WHERE n * n_cells > 2 * n_rows),
        |e AS MATERIALIZED (SELECT a.cx, a.cy, b.cx AS nx, b.cy AS ny
        |  FROM dense a JOIN dense b
        |    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
        |l0 AS (SELECT cx, cy, label FROM dense),
        |l1 AS (SELECT e.cx, e.cy, min(l.label) AS label FROM e
        |  JOIN l0 l ON l.cx = e.nx AND l.cy = e.ny GROUP BY 1, 2),
        |l2 AS (SELECT e.cx, e.cy, min(l.label) AS label FROM e
        |  JOIN l1 l ON l.cx = e.nx AND l.cy = e.ny GROUP BY 1, 2),
        |l3 AS (SELECT e.cx, e.cy, min(l.label) AS label FROM e
        |  JOIN l2 l ON l.cx = e.nx AND l.cy = e.ny GROUP BY 1, 2),
        |l4 AS (SELECT e.cx, e.cy, min(l.label) AS label FROM e
        |  JOIN l3 l ON l.cx = e.nx AND l.cy = e.ny GROUP BY 1, 2)
        |SELECT d.cx, d.cy, d.n, l4.label
        |FROM dense d JOIN l4 USING (cx, cy)
        |ORDER BY cx, cy""".stripMargin,

    // ordered-pair sequence support from per-(user,type) first
    // occurrences; the self-join is ≤5×5 per user
    "q273_sequence_patterns" ->
      """WITH firsts AS (SELECT user_id, event_type,
        |    min(epoch_us(ts)) AS t0
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  CAST(count(*) AS BIGINT) AS n_both,
        |  CAST(sum(CASE WHEN a.t0 < b.t0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ordered,
        |  CAST(sum(CASE WHEN a.t0 < b.t0 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS ordered_ppm
        |FROM firsts a JOIN firsts b ON a.user_id = b.user_id
        |  AND a.event_type <> b.event_type
        |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin,

    // Goodman–Kruskal lambda from the exact contingency table: counts
    // and maxes only, one terminal division
    "q274_gk_lambda" ->
      s"""WITH j AS (SELECT c_mktsegment, o_orderpriority,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |segmax AS (SELECT CAST(sum(mx) AS BIGINT) AS sum_seg_max
         |  FROM (SELECT max(n) AS mx FROM j GROUP BY c_mktsegment)),
         |priomax AS (SELECT CAST(max(n) AS BIGINT) AS max_prio,
         |    CAST(sum(n) AS BIGINT) AS n_total
         |  FROM (SELECT CAST(sum(n) AS BIGINT) AS n FROM j
         |    GROUP BY o_orderpriority))
         |SELECT n_total, max_prio, sum_seg_max,
         |  CASE WHEN n_total > max_prio THEN
         |    ${f6("""CAST(sum_seg_max - max_prio AS DOUBLE)
           |      / CAST(n_total - max_prio AS DOUBLE)""".stripMargin)}
         |  END AS lambda
         |FROM segmax, priomax""".stripMargin,

    // exact join size from per-key count products; the CM estimate is
    // result-invisible — its two-sided bound is pinned TRUE (the q85
    // sketch treatment: a broken sketch would hash-mismatch)
    "q275_cm_join_size" ->
      """WITH a AS (SELECT l_partkey AS k FROM lineitem),
        |b AS (SELECT l_partkey AS k FROM lineitem
        |  WHERE l_returnflag = 'R'),
        |ca AS (SELECT k, count(*) AS ca FROM a GROUP BY 1),
        |cb AS (SELECT k, count(*) AS cb FROM b GROUP BY 1)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_left,
        |  (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_right,
        |  CAST(sum(CAST(ca AS HUGEINT) * cb) AS BIGINT)
        |    AS exact_join_size,
        |  TRUE AS cm_bound_ok
        |FROM ca JOIN cb USING (k)""".stripMargin,

    // Somers' D both directions from the q225 contingency machinery —
    // asymmetric denominators, doubled identities, one division each
    "q276_somers_d" ->
      s"""WITH cells AS (
         |  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS x,
         |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS j,
         |    CAST(count(*) AS BIGINT) AS f
         |  FROM lineitem GROUP BY 1, 2),
         |cagg AS (SELECT sum(CAST(a.f AS HUGEINT) * CAST(b.f AS HUGEINT))
         |    AS cc
         |  FROM cells a JOIN cells b ON b.x > a.x AND b.j > a.j),
         |dagg AS (SELECT sum(CAST(a.f AS HUGEINT) * CAST(b.f AS HUGEINT))
         |    AS dd
         |  FROM cells a JOIN cells b ON b.x > a.x AND b.j < a.j),
         |nagg AS (SELECT CAST(sum(f) AS BIGINT) AS n FROM cells),
         |tx AS (SELECT sum(CAST(r AS HUGEINT) * CAST(r - 1 AS HUGEINT))
         |    AS tx2
         |  FROM (SELECT CAST(sum(f) AS BIGINT) AS r FROM cells
         |        GROUP BY x)),
         |tj AS (SELECT sum(CAST(c AS HUGEINT) * CAST(c - 1 AS HUGEINT))
         |    AS tj2
         |  FROM (SELECT CAST(sum(f) AS BIGINT) AS c FROM cells
         |        GROUP BY j)),
         |m AS (SELECT n, CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT)
         |    AS a2, tx2, tj2, cc, dd
         |  FROM nagg, cagg, dagg, tx, tj)
         |SELECT n,
         |  CASE WHEN a2 > tx2 THEN
         |    ${f6("""(CAST(cc - dd AS DOUBLE) * 2.0)
           |      / CAST(a2 - tx2 AS DOUBLE)""".stripMargin)}
         |  END AS d_j_given_x,
         |  CASE WHEN a2 > tj2 THEN
         |    ${f6("""(CAST(cc - dd AS DOUBLE) * 2.0)
           |      / CAST(a2 - tj2 AS DOUBLE)""".stripMargin)}
         |  END AS d_x_given_j
         |FROM m""".stripMargin,

    // DiD: exact cell sums/counts, four IEEE divisions in the pinned
    // (T_post − T_pre) − (C_post − C_pre) tree
    "q277_diff_in_diff" ->
      s"""WITH ev AS (SELECT
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    ${md5Long("CAST(user_id AS VARCHAR)")} % 2 AS arm,
         |    CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
         |      THEN 0 ELSE 1 END AS post
         |  FROM events),
         |m AS (SELECT
         |  CAST(sum(CASE WHEN arm = 1 AND post = 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_t_pre,
         |  CAST(sum(CASE WHEN arm = 1 AND post = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_t_post,
         |  CAST(sum(CASE WHEN arm = 0 AND post = 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_c_pre,
         |  CAST(sum(CASE WHEN arm = 0 AND post = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_c_post,
         |  CAST(sum(CASE WHEN arm = 1 AND post = 0 THEN c ELSE 0 END)
         |    AS BIGINT) AS s_t_pre,
         |  CAST(sum(CASE WHEN arm = 1 AND post = 1 THEN c ELSE 0 END)
         |    AS BIGINT) AS s_t_post,
         |  CAST(sum(CASE WHEN arm = 0 AND post = 0 THEN c ELSE 0 END)
         |    AS BIGINT) AS s_c_pre,
         |  CAST(sum(CASE WHEN arm = 0 AND post = 1 THEN c ELSE 0 END)
         |    AS BIGINT) AS s_c_post
         |  FROM ev)
         |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
         |  CASE WHEN n_t_pre > 0 AND n_t_post > 0 AND n_c_pre > 0
         |      AND n_c_post > 0 THEN
         |    ${f6("""(CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)
           |      - CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))
           |      - (CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)
           |      - CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE))"""
        .stripMargin)}
         |  END AS did_cents
         |FROM m""".stripMargin,

    // seasonal MK: within-dow pairs only; Var = Σ_dow per-dow
    // tie-corrected variance, carried ×18 exact
    "q278_seasonal_mk" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x,
         |    dayofweek(CAST(ts AS DATE)) AS dw
         |  FROM events GROUP BY 1, 3),
         |pairs AS (SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
         |      WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
         |  FROM daily a JOIN daily b ON a.dw = b.dw AND a.d < b.d),
         |perdow AS (SELECT dw, CAST(sum(t) AS BIGINT) AS n,
         |    sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS tie18
         |  FROM (SELECT dw, CAST(count(*) AS BIGINT) AS t
         |    FROM daily GROUP BY dw, x) GROUP BY dw),
         |v AS (SELECT CAST(sum(n) AS BIGINT) AS n_days,
         |    sum(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - tie18)
         |      AS var18
         |  FROM perdow)
         |SELECT n_days, s_stat,
         |  CASE WHEN CAST(var18 AS DOUBLE) > 0 THEN
         |    ${f6("""(CASE WHEN s_stat > 0
           |        THEN CAST(s_stat AS DOUBLE) - 1.0
           |      WHEN s_stat < 0 THEN CAST(s_stat AS DOUBLE) + 1.0
           |      ELSE 0.0 END)
           |      / sqrt(CAST(var18 AS DOUBLE) / 18.0)""".stripMargin)}
         |  END AS z
         |FROM pairs, v""".stripMargin,

    // Bhattacharyya/Hellinger: exact bin products, the √ sum as ONE
    // deterministic bin-ordered left fold (the q259 treatment)
    "q279_hellinger" ->
      s"""WITH ev AS (SELECT
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      // 1000 AS bin,
         |    ${md5Long("CAST(user_id AS VARCHAR)")} % 2 AS arm
         |  FROM events),
         |bins AS (SELECT bin,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS ca,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cb
         |  FROM ev GROUP BY 1),
         |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
         |    CAST(sum(cb) AS BIGINT) AS n_b FROM bins),
         |folded AS (SELECT list_reduce(
         |    list_prepend(CAST(0.0 AS DOUBLE),
         |      list(sqrt(CAST(ca * cb AS DOUBLE)) ORDER BY bin)),
         |    (a, b) -> a + b) AS s FROM bins)
         |SELECT n_a, n_b,
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN
         |    ${f6("""s / sqrt(CAST(n_a AS DOUBLE)
           |      * CAST(n_b AS DOUBLE))""".stripMargin)}
         |  END AS bc,
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN
         |    ${f6("""sqrt(greatest(0.0, 1.0 - s
           |      / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))))"""
        .stripMargin)}
         |  END AS hellinger
         |FROM folded, tot""".stripMargin,

    // McNemar: discordant-pair counts only, exact single divisions
    "q280_mcnemar" ->
      s"""WITH u AS (SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase'
         |      AND CAST(ts AS DATE) < DATE '2024-01-16'
         |      THEN 1 ELSE 0 END) AS pre,
         |    max(CASE WHEN event_type = 'purchase'
         |      AND CAST(ts AS DATE) >= DATE '2024-01-16'
         |      THEN 1 ELSE 0 END) AS post
         |  FROM events GROUP BY 1),
         |m AS (SELECT
         |    CAST(sum(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c
         |  FROM u)
         |SELECT b, c,
         |  CASE WHEN b + c > 0 THEN
         |    ${f6("""(CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
           |      * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
           |      / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE))"""
        .stripMargin)}
         |  END AS chi2,
         |  CASE WHEN b + c > 0 THEN
         |    ${f6("""(abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
           |      * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
           |      / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE))"""
        .stripMargin)}
         |  END AS chi2_corrected
         |FROM m""".stripMargin,

    // partial correlation: 9 exact HUGEINT moments + n, three q118
    // pinned Pearson trees, pinned composition
    "q281_partial_corr" ->
      s"""WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |    CAST(sum(z) AS DOUBLE) AS sz,
         |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         |    CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
         |    CAST(sum(CAST(z AS HUGEINT) * z) AS DOUBLE) AS szz,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
         |    CAST(sum(CAST(x AS HUGEINT) * z) AS DOUBLE) AS sxz,
         |    CAST(sum(CAST(y AS HUGEINT) * z) AS DOUBLE) AS syz
         |  FROM (SELECT
         |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS x,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS y,
         |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS z
         |  FROM lineitem)),
         |r AS (SELECT n,
         |  (CAST(n AS DOUBLE) * sxy - sx * sy)
         |    / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
         |      * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS rxy,
         |  (CAST(n AS DOUBLE) * sxz - sx * sz)
         |    / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
         |      * sqrt(CAST(n AS DOUBLE) * szz - sz * sz)) AS rxz,
         |  (CAST(n AS DOUBLE) * syz - sz * sy)
         |    / (sqrt(CAST(n AS DOUBLE) * szz - sz * sz)
         |      * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS rzy
         |  FROM m)
         |SELECT n, ${f6("rxy")} AS r_xy, ${f6("rxz")} AS r_xz,
         |  ${f6("rzy")} AS r_zy,
         |  ${f6("""(rxy - rxz * rzy)
           |    / sqrt((1.0 - rxz * rxz) * (1.0 - rzy * rzy))"""
        .stripMargin)} AS r_xy_given_z
         |FROM r""".stripMargin,

    // RMST: area under the q259 KM steps to τ=60, every product and
    // every addition in the SAME ordered-fold sequence as Spark
    // (list_prepend starts ≡ Spark's fold-start values: 1.0·f₁ = f₁)
    "q282_rmst" ->
      s"""WITH users AS (
         |  SELECT o_orderkey,
         |    max(CAST(o_orderdate AS DATE)) AS first_d,
         |    max(CAST(l_shipdate AS DATE)) AS last_d
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  GROUP BY 1),
         |hz AS (SELECT max(last_d) AS h,
         |    CAST(count(*) AS BIGINT) AS n_users FROM users),
         |lives AS (SELECT
         |    CAST(date_diff('day', first_d, last_d) AS BIGINT) AS life,
         |    last_d <= h - 7 AS uncensored, n_users
         |  FROM users, hz),
         |by_day AS (SELECT life, CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum(CASE WHEN uncensored THEN 1 ELSE 0 END) AS BIGINT)
         |      AS deaths,
         |    max(n_users) AS n_users
         |  FROM lives GROUP BY 1),
         |ev AS (SELECT life,
         |    n_users - (CAST(sum(m) OVER (ORDER BY life ROWS BETWEEN
         |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - m)
         |      AS n_risk,
         |    deaths
         |  FROM by_day),
         |fac AS (SELECT life,
         |    CAST(n_risk - deaths AS DOUBLE) / CAST(n_risk AS DOUBLE)
         |      AS factor
         |  FROM ev WHERE deaths > 0 AND life <= 60),
         |one AS (SELECT list(life ORDER BY life) AS ls,
         |    list(factor ORDER BY life) AS fs,
         |    (SELECT n_users FROM hz) AS n_users
         |  FROM fac)
         |SELECT n_users, CAST(len(ls) AS BIGINT) AS n_event_days,
         |  ${f6("""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      [list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
           |          fs[1:i-1]), (a, b) -> a * b)
           |        * CAST(ls[i] - (CASE WHEN i = 1 THEN 0
           |          ELSE ls[i-1] END) AS DOUBLE)
           |        for i in range(1, len(ls) + 1)]),
           |      (a, b) -> a + b)
           |    + list_reduce(list_prepend(CAST(1.0 AS DOUBLE), fs),
           |      (a, b) -> a * b)
           |      * CAST(60 - coalesce(ls[len(ls)], 0) AS DOUBLE)"""
        .stripMargin)} AS rmst_days,
         |  ${f6("""list_reduce(list_prepend(CAST(1.0 AS DOUBLE), fs),
           |    (a, b) -> a * b)""".stripMargin)} AS s_tau
         |FROM one""".stripMargin,

    // MH common odds ratio: the five strata pivot to one row, both
    // 5-term sums left-associated pinned trees, one division per term
    "q283_mantel_haenszel" -> {
      val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE",
        "MIDDLE EAST")
      val cells = regions.zipWithIndex.flatMap { case (rn, i) =>
        Seq(
          s"""CAST(sum(CASE WHEN r_name = '$rn' AND e AND o
             |    THEN 1 ELSE 0 END) AS BIGINT) AS a$i""".stripMargin,
          s"""CAST(sum(CASE WHEN r_name = '$rn' AND e AND NOT o
             |    THEN 1 ELSE 0 END) AS BIGINT) AS b$i""".stripMargin,
          s"""CAST(sum(CASE WHEN r_name = '$rn' AND NOT e AND o
             |    THEN 1 ELSE 0 END) AS BIGINT) AS c$i""".stripMargin,
          s"""CAST(sum(CASE WHEN r_name = '$rn' AND NOT e AND NOT o
             |    THEN 1 ELSE 0 END) AS BIGINT) AS d$i""".stripMargin)
      }.mkString(",\n")
      def term(x: String, y: String, i: Int) =
        s"CAST($x$i * $y$i AS DOUBLE) / " +
          s"CAST(a$i + b$i + c$i + d$i AS DOUBLE)"
      val num = regions.indices.map(term("a", "d", _)).mkString(" + ")
      val den = regions.indices.map(term("b", "c", _)).mkString(" + ")
      val ns = regions.indices
        .map(i => s"a$i + b$i + c$i + d$i AS n_s$i").mkString(", ")
      s"""WITH base AS (SELECT r_name,
         |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS e,
         |    l_returnflag = 'R' AS o
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey),
         |m AS (SELECT
         |$cells
         |  FROM base)
         |SELECT $ns,
         |  ${f6(num)} AS mh_num, ${f6(den)} AS mh_den,
         |  CASE WHEN ($den) > 0 THEN ${f6(s"($num) / ($den)")} END
         |    AS or_mh
         |FROM m""".stripMargin
    },

    // Cochran–Armitage: T·N and Var·N³ as plain exact aggregates
    // (integer sums commute), one terminal double expression
    "q284_cochran_armitage" ->
      s"""WITH g AS (SELECT
         |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS sc,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS r
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1),
         |m AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
         |    CAST(sum(r) AS BIGINT) AS rr,
         |    sum(CAST(sc AS HUGEINT) * n) AS sns,
         |    sum(CAST(sc AS HUGEINT) * sc * n) AS sns2,
         |    sum(CAST(sc AS HUGEINT) * r) AS srs
         |  FROM g)
         |SELECT nn AS n_total, rr AS r_total,
         |  CAST(srs * nn - sns * rr AS BIGINT) AS t_scaled,
         |  CASE WHEN CAST(CAST(rr AS HUGEINT) * (nn - rr)
         |      * (CAST(nn AS HUGEINT) * sns2 - sns * sns) AS DOUBLE)
         |      > 0 THEN
         |    ${f6("""CAST(srs * nn - sns * rr AS DOUBLE)
           |      * sqrt(CAST(nn AS DOUBLE))
           |      / sqrt(CAST(CAST(rr AS HUGEINT) * (nn - rr)
           |        * (CAST(nn AS HUGEINT) * sns2 - sns * sns)
           |        AS DOUBLE))""".stripMargin)}
         |  END AS z
         |FROM m""".stripMargin,

    // Wasserstein-1: exact CDF-gap mass over the common denominator,
    // gaps from lead() on the domain-bounded value frame
    "q285_wasserstein" ->
      s"""WITH ev AS (SELECT
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         |    ${md5Long("CAST(user_id AS VARCHAR)")} % 2 AS arm
         |  FROM events),
         |byv AS (SELECT v,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS ca,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cb
         |  FROM ev GROUP BY 1),
         |cum AS (SELECT v,
         |    CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cum_ca,
         |    CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cum_cb,
         |    lead(v) OVER (ORDER BY v) AS nv
         |  FROM byv),
         |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
         |    CAST(sum(cb) AS BIGINT) AS n_b FROM byv),
         |mass AS (SELECT sum(abs(CAST(cum_ca AS HUGEINT) * n_b
         |      - CAST(cum_cb AS HUGEINT) * n_a) * (nv - v)) AS mass
         |  FROM cum, tot WHERE nv IS NOT NULL)
         |SELECT n_a, n_b,
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN
         |    ${f6("""CAST(mass AS DOUBLE)
           |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"""
        .stripMargin)}
         |  END AS w1_cents
         |FROM mass, tot""".stripMargin,

    // blocklist gate: pushed-down IN filter on the token stream,
    // zero-hit sources survive the outer join
    "q286_blocklist_report" ->
      s"""WITH t AS (SELECT doc_id, source, $toks AS tk FROM documents),
         |e AS (SELECT doc_id, source, unnest(tk) AS tok FROM t),
         |hits AS (SELECT doc_id, source,
         |    CAST(count(*) AS BIGINT) AS h
         |  FROM e WHERE tok IN ('slow', 'broken', 'error', 'crash',
         |    'fail')
         |  GROUP BY 1, 2),
         |per AS (SELECT source, CAST(count(*) AS BIGINT) AS nf,
         |    CAST(sum(h) AS BIGINT) AS nh
         |  FROM hits GROUP BY 1),
         |docs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY 1)
         |SELECT d.source, d.n_docs,
         |  COALESCE(p.nf, 0) AS n_flagged, COALESCE(p.nh, 0) AS n_hits,
         |  COALESCE(p.nf, 0) * 1000000 // d.n_docs AS flagged_ppm
         |FROM docs d LEFT JOIN per p ON d.source = p.source
         |ORDER BY d.source""".stripMargin,

    // permutation test: md5 pseudo-relabelings, exact-sum means, the
    // extreme count compares identically-computed doubles
    "q287_permutation_test" ->
      s"""WITH ev AS (SELECT
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    event_id,
         |    ${md5Long("CAST(user_id AS VARCHAR)")} % 2 AS arm
         |  FROM events),
         |obs AS (SELECT
         |    CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS DOUBLE)
         |      / CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
         |        AS DOUBLE)
         |    - CAST(sum(CASE WHEN arm = 1 THEN c ELSE 0 END) AS DOUBLE)
         |      / CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
         |        AS DOUBLE) AS obs_diff
         |  FROM ev),
         |perms AS (SELECT rep,
         |    CAST(sum(CASE WHEN parm = 0 THEN c ELSE 0 END) AS DOUBLE)
         |      / CAST(sum(CASE WHEN parm = 0 THEN 1 ELSE 0 END)
         |        AS DOUBLE)
         |    - CAST(sum(CASE WHEN parm = 1 THEN c ELSE 0 END)
         |        AS DOUBLE)
         |      / CAST(sum(CASE WHEN parm = 1 THEN 1 ELSE 0 END)
         |        AS DOUBLE) AS d
         |  FROM (SELECT c, r.rep,
         |      ${md5Long("CAST(event_id AS VARCHAR) || ':' || " +
           "CAST(r.rep AS VARCHAR)")} % 2 AS parm
         |    FROM ev, generate_series(1, 30) AS r(rep))
         |  GROUP BY rep)
         |SELECT CAST(count(*) AS BIGINT) AS n_reps,
         |  ${f6("max(obs_diff)")} AS obs_diff,
         |  CAST(sum(CASE WHEN abs(d) >= abs(obs_diff) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_extreme,
         |  CAST((1 + sum(CASE WHEN abs(d) >= abs(obs_diff)
         |      THEN 1 ELSE 0 END)) * 1000000
         |    // (count(*) + 1) AS BIGINT) AS p_hat_ppm
         |FROM perms, obs""".stripMargin,

    // three q179 min-plus chains, one per probe; reciprocals as exact
    // integer division so the harmonic sum is a BIGINT
    "q288_harmonic_centrality" -> {
      def chain(k: Int): String = {
        def round(i: Int): String =
          s"""p${k}d$i AS MATERIALIZED (
             |  SELECT id, min(dist) AS dist FROM (
             |    SELECT id, dist FROM p${k}d${i - 1}
             |    UNION ALL
             |    SELECT adj.dst AS id, d.dist + 1 AS dist
             |    FROM p${k}d${i - 1} d JOIN adj ON adj.src = d.id)
             |  GROUP BY id)""".stripMargin
        s"""p${k}d0 AS MATERIALIZED (
           |  SELECT id, CAST(0 AS BIGINT) AS dist FROM
           |    (SELECT c_custkey AS id FROM customer
           |     WHERE c_nationkey = 3 ORDER BY c_custkey
           |     LIMIT 1 OFFSET $k)),
           |${(1 to 4).map(round).mkString(",\n")},
           |p${k}h AS (SELECT
           |    (SELECT id FROM p${k}d0) AS probe,
           |    CAST(count(*) AS BIGINT) AS n_reached,
           |    CAST(sum(1000000 // dist) AS BIGINT) AS h_ppm
           |  FROM p${k}d4 WHERE dist > 0)""".stripMargin
      }
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey AS a, l_partkey + 3000000 AS b
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'),
         |adj AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
         |  UNION SELECT b, a FROM e),
         |${(0 to 2).map(chain).mkString(",\n")}
         |SELECT * FROM p0h UNION ALL SELECT * FROM p1h
         |UNION ALL SELECT * FROM p2h ORDER BY probe""".stripMargin
    },

    // Page's L over the COMPLETE Mon–Sun weeks (b derived, not
    // hardcoded): doubled within-week midranks, L2 exact, no-ties
    // closed-form z
    "q289_page_trend" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |f AS (SELECT x,
         |    CAST(date_diff('day', DATE '2024-01-01', d) AS BIGINT)
         |      AS dn
         |  FROM daily WHERE d >= DATE '2024-01-01'
         |    AND d < DATE '2024-01-29'),
         |cells0 AS (SELECT x, dn // 7 AS wk, dn % 7 + 1 AS j FROM f),
         |complete AS (SELECT wk FROM cells0 GROUP BY wk
         |  HAVING count(*) = 7),
         |cells AS (SELECT c.* FROM cells0 c
         |  JOIN complete USING (wk)),
         |ranked AS (SELECT a.wk, a.j, a.x,
         |    CAST(2 * sum(CASE WHEN bb.x < a.x THEN 1 ELSE 0 END)
         |      + sum(CASE WHEN bb.x = a.x THEN 1 ELSE 0 END) + 1
         |      AS BIGINT) AS r2
         |  FROM cells a JOIN cells bb ON a.wk = bb.wk
         |  GROUP BY 1, 2, 3),
         |l AS (SELECT CAST(sum(j * r2) AS BIGINT) AS l2,
         |    CAST(count(DISTINCT wk) AS BIGINT) AS nb
         |  FROM ranked)
         |SELECT l2,
         |  CASE WHEN nb > 0 THEN
         |  ${f6("""(CAST(l2 AS DOUBLE) / 2.0
           |    - CAST(nb AS DOUBLE) * 7.0 * 8.0 * 8.0 / 4.0)
           |    / sqrt(CAST(nb AS DOUBLE) * 49.0 * 8.0 * 48.0
           |      / 144.0)""".stripMargin)}
         |  END AS z
         |FROM l""".stripMargin,

    // Jonckheere–Terpstra via the CDF identity (near-unique value key
    // makes cell-pair joins row×row in disguise — see the Spark-side
    // scaladoc): per-value pivoted group counts, running totals over
    // v, 2J = Σ t_j·Σ_{i<j}(2·cum_i − t_i). Exact integers.
    "q290_jonckheere" ->
      s"""WITH cells AS (SELECT
         |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS v,
         |    CAST(count(*) AS BIGINT) AS f
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |pv AS (SELECT v,
         |    ${(1 to 5).map(k =>
              s"CAST(sum(CASE WHEN g = $k THEN f ELSE 0 END) AS BIGINT) AS t$k")
              .mkString(",\n         |    ")}
         |  FROM cells GROUP BY v),
         |cum AS (SELECT v, ${(1 to 5).map(k => s"t$k").mkString(", ")},
         |    ${(1 to 5).map(k =>
              s"CAST(sum(t$k) OVER (ORDER BY v) AS BIGINT) AS c$k")
              .mkString(",\n         |    ")}
         |  FROM pv),
         |j2 AS (SELECT sum(
         |    ${(2 to 5).map { j =>
              val inner = (1 until j).map(i => s"(2 * c$i - t$i)")
                .mkString(" + ")
              s"CAST(t$j AS HUGEINT) * ($inner)"
            }.mkString("\n         |    + ")}) AS j2
         |  FROM cum),
         |sizes AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
         |    sum(CAST(n AS HUGEINT) * n) AS sn2,
         |    sum(CAST(n AS HUGEINT) * n * (2 * n + 3)) AS sn23
         |  FROM (SELECT CAST(sum(f) AS BIGINT) AS n FROM cells
         |    GROUP BY g))
         |SELECT nn AS n_total, CAST(j2 AS BIGINT) AS j2,
         |  ${f6("""(CAST(j2 AS DOUBLE) / 2.0
           |    - CAST(CAST(nn AS HUGEINT) * nn - sn2 AS DOUBLE)
           |      / 2.0 / 2.0)
           |    / sqrt((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
           |      * (2.0 * CAST(nn AS DOUBLE) + 3.0)
           |      - CAST(sn23 AS DOUBLE)) / 72.0)""".stripMargin)}
         |  AS z
         |FROM j2, sizes""".stripMargin,

    // Lin's CCC over the paired daily arm series: one exact-moment
    // pass, one pinned tree
    "q291_concordance" ->
      s"""WITH daily AS (SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CASE WHEN ${md5Long("CAST(user_id AS VARCHAR)")}
         |      % 2 = 0 THEN CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT) ELSE 0 END) AS BIGINT) AS xa,
         |    CAST(sum(CASE WHEN ${md5Long("CAST(user_id AS VARCHAR)")}
         |      % 2 = 1 THEN CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT) ELSE 0 END) AS BIGINT) AS xb
         |  FROM events GROUP BY 1),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(xa) AS DOUBLE) AS sa,
         |    CAST(sum(xb) AS DOUBLE) AS sb,
         |    CAST(sum(CAST(xa AS HUGEINT) * xa) AS DOUBLE) AS saa,
         |    CAST(sum(CAST(xb AS HUGEINT) * xb) AS DOUBLE) AS sbb,
         |    CAST(sum(CAST(xa AS HUGEINT) * xb) AS DOUBLE) AS sab
         |  FROM daily)
         |SELECT n AS n_days,
         |  ${f6("""2.0 * (CAST(n AS DOUBLE) * sab - sa * sb)
           |    / ((CAST(n AS DOUBLE) * saa - sa * sa)
           |      + (CAST(n AS DOUBLE) * sbb - sb * sb)
           |      + (sa - sb) * (sa - sb))""".stripMargin)} AS ccc
         |FROM m""".stripMargin,

    // Durbin–Watson with the D² cancellation: scaled residuals are
    // exact integers, DW is ONE division of two exact sums
    "q292_durbin_watson" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |t AS (SELECT x,
         |    CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT)
         |      AS tt
         |  FROM daily),
         |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(tt AS HUGEINT)) AS st,
         |    sum(CAST(x AS HUGEINT)) AS sy,
         |    sum(CAST(tt AS HUGEINT) * tt) AS stt,
         |    sum(CAST(tt AS HUGEINT) * x) AS sty
         |  FROM t),
         |scaled AS (SELECT tt,
         |    (CAST(n AS HUGEINT) * stt - st * st) * x
         |      - ((sy * stt - st * sty)
         |        + (CAST(n AS HUGEINT) * sty - st * sy) * tt) AS e
         |  FROM t, mo),
         |terms AS (SELECT e, e - lag(e) OVER (ORDER BY tt) AS de
         |  FROM scaled),
         |agg AS (SELECT sum(e * e) AS sse, sum(de * de) AS ssd
         |  FROM terms)
         |SELECT CASE WHEN CAST(sse AS DOUBLE) > 0 THEN
         |    ${f6("CAST(ssd AS DOUBLE) / CAST(sse AS DOUBLE)")}
         |  END AS dw
         |FROM agg""".stripMargin,

    "q296_minhash_calibration" -> {
      val eq16 = (1 to 16).map(i =>
        s"CASE WHEN sa.sg[$i] = sb.sg[$i] THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s3 AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |ex AS (SELECT doc_id AS jid, unnest(list_distinct(sh)) AS sh FROM s3),
         |sizes AS (SELECT jid, count(*) AS set_size FROM ex GROUP BY jid),
         |h3 AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s3),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h3),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS inter_size
         |  FROM pairs
         |  JOIN ex sa ON sa.jid = pairs.id_a
         |  JOIN ex sb ON sb.jid = pairs.id_b AND sb.sh = sa.sh
         |  GROUP BY id_a, id_b),
         |jac AS (SELECT id_a, id_b,
         |  CAST(inter_size AS DOUBLE) /
         |    CAST(size_a + size_b - inter_size AS DOUBLE) AS jaccard
         |  FROM inter
         |  JOIN (SELECT jid AS id_a, set_size AS size_a FROM sizes) USING (id_a)
         |  JOIN (SELECT jid AS id_b, set_size AS size_b FROM sizes) USING (id_b)),
         |est AS (SELECT j.id_a, j.id_b, j.jaccard,
         |  CAST($eq16 AS DOUBLE) / 16.0 AS est
         |  FROM jac j JOIN sig sa ON sa.doc_id = j.id_a
         |  JOIN sig sb ON sb.doc_id = j.id_b)
         |SELECT id_a, id_b, ${f6("est")} AS est_jaccard,
         |  ${f6("jaccard")} AS jaccard,
         |  ${f6("abs(est - jaccard)")} AS abs_err
         |FROM est ORDER BY id_a, id_b""".stripMargin
    },

    "q297_packing_efficiency" ->
      s"""WITH d AS (SELECT lang, doc_id,
         |  CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
         |o AS (SELECT lang, doc_id, n_tokens,
         |  coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS tok_off FROM d),
         |s AS (SELECT lang, n_tokens,
         |  CASE WHEN n_tokens > 0 AND tok_off // 2048 <>
         |    (tok_off + n_tokens - 1) // 2048 THEN 1 ELSE 0 END AS straddle
         |  FROM o),
         |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(straddle) AS BIGINT) AS n_straddlers
         |  FROM s GROUP BY lang)
         |SELECT lang, n_docs, total_tokens,
         |  CAST((total_tokens + 2047) // 2048 AS BIGINT) AS n_seqs,
         |  CAST(((total_tokens + 2047) // 2048) * 2048 - total_tokens
         |    AS BIGINT) AS waste_tokens,
         |  ${f6("CAST(total_tokens AS DOUBLE) / CAST(((total_tokens + 2047) // 2048) * 2048 AS DOUBLE)")} AS fill_rate,
         |  n_straddlers
         |FROM g ORDER BY lang""".stripMargin,

    "q298_ndcg_quality" -> {
      // the SAME discount doubles the Spark query embeds (shortest-repr
      // round-trip preserves the bits), so the irrational 1/log2(i+1)
      // cannot drift between engines — the DctBasis pattern
      val discVals = Queries.ndcgDiscounts.zipWithIndex
        .map { case (d, i) => s"(${i + 1}, $d)" }.mkString(", ")
      val fx = "1099511627776.0" // 2^40
      s"""WITH base AS (SELECT source, doc_id, n_chars,
         |  CAST(length(text) AS DOUBLE) AS nchars,
         |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS nalpha,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS nwords
         |  FROM documents),
         |q AS (SELECT source, doc_id,
         |  floor((least(1.0, nwords / 20.0) * (nalpha / nchars)) * 1000000)
         |    / 1000000.0 AS quality_score,
         |  CASE WHEN n_chars >= 300 THEN 3 WHEN n_chars >= 200 THEN 2
         |    WHEN n_chars >= 100 THEN 1 ELSE 0 END AS rel
         |  FROM base),
         |g AS (SELECT source, doc_id, quality_score, rel,
         |  CASE WHEN rel = 3 THEN 7 WHEN rel = 2 THEN 3
         |    WHEN rel = 1 THEN 1 ELSE 0 END AS gain FROM q),
         |r AS (SELECT source, gain,
         |  row_number() OVER (PARTITION BY source
         |    ORDER BY quality_score DESC, doc_id ASC) AS r_sys,
         |  row_number() OVER (PARTITION BY source
         |    ORDER BY rel DESC, doc_id ASC) AS r_ideal
         |  FROM g),
         |disc(i, d) AS (VALUES $discVals),
         |terms AS (SELECT r.source,
         |  CASE WHEN r_sys <= 10 THEN CAST(floor(
         |    CAST(gain AS DOUBLE) * dsys.d * $fx) AS BIGINT)
         |    ELSE 0 END AS dterm,
         |  CASE WHEN r_ideal <= 10 THEN CAST(floor(
         |    CAST(gain AS DOUBLE) * dideal.d * $fx) AS BIGINT)
         |    ELSE 0 END AS iterm
         |  FROM r
         |  LEFT JOIN disc dsys ON dsys.i = r.r_sys
         |  LEFT JOIN disc dideal ON dideal.i = r.r_ideal),
         |a AS (SELECT source, CAST(sum(dterm) AS BIGINT) AS dcg_fixed,
         |  CAST(sum(iterm) AS BIGINT) AS idcg_fixed
         |  FROM terms GROUP BY source)
         |SELECT source,
         |  ${f6(s"CAST(dcg_fixed AS DOUBLE) / $fx")} AS dcg10,
         |  ${f6(s"CAST(idcg_fixed AS DOUBLE) / $fx")} AS idcg10,
         |  CASE WHEN idcg_fixed > 0
         |    THEN ${f6("CAST(dcg_fixed AS DOUBLE) / CAST(idcg_fixed AS DOUBLE)")}
         |  END AS ndcg10
         |FROM a ORDER BY source""".stripMargin
    },

    "q299_krippendorff_alpha" ->
      s"""WITH ratings AS (SELECT event_id // 5 AS item,
         |  event_type AS label FROM events),
         |oic AS (SELECT item, label, CAST(count(*) AS BIGINT) AS o
         |  FROM ratings GROUP BY item, label),
         |m AS (SELECT item, CAST(sum(o) AS BIGINT) AS m FROM oic
         |  GROUP BY item),
         |wm AS (SELECT oic.item, oic.label, oic.o, m.m
         |  FROM oic JOIN m USING (item) WHERE m.m >= 2),
         |s12 AS (SELECT CAST(sum(o * (m - o) * (12 // (m - 1)))
         |    AS BIGINT) AS s12,
         |  CAST(sum(o) AS BIGINT) AS n,
         |  CAST(count(DISTINCT item) AS BIGINT) AS n_items FROM wm),
         |nc AS (SELECT label, CAST(sum(o) AS BIGINT) AS n_c FROM wm
         |  GROUP BY label),
         |de AS (SELECT CAST(sum(n_c * (s12.n - n_c)) AS BIGINT)
         |  AS de_num FROM nc, s12)
         |SELECT n_items, n AS n_ratings,
         |  ${f6("1.0 - CAST(s12 * (n - 1) AS DOUBLE) / CAST(12 * de_num AS DOUBLE)")} AS alpha
         |FROM s12, de""".stripMargin,

    "q300_lsh_tuning_curve" -> {
      // one banding/bucket/pair chain per band count over the SAME
      // 16-slot signatures; the exact side reuses the q31 shingle join
      // restricted to each config's candidates
      def cfg(b: Int): String = {
        val rows = 16 / b
        val slots = (1 to rows).map(k => s"sg[band*$rows+$k]")
          .mkString(", ")
        s"""banded$b AS (SELECT doc_id,
           |  unnest([${(0 until b).mkString(", ")}]) AS band, sg FROM sig),
           |buckets$b AS (SELECT doc_id, band,
           |  ${md5Long(s"array_to_string([$slots], '_')")} AS bucket
           |  FROM banded$b),
           |pairs$b AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
           |  FROM buckets$b x JOIN buckets$b y
           |  ON x.band = y.band AND x.bucket = y.bucket
           |    AND x.doc_id < y.doc_id),
           |inter$b AS (SELECT id_a, id_b, count(*) AS inter_size
           |  FROM pairs$b
           |  JOIN ex sa ON sa.jid = pairs$b.id_a
           |  JOIN ex sb ON sb.jid = pairs$b.id_b AND sb.sh = sa.sh
           |  GROUP BY id_a, id_b),
           |jac$b AS (SELECT id_a, id_b,
           |  CAST(inter_size AS DOUBLE) /
           |    CAST(size_a + size_b - inter_size AS DOUBLE) AS jaccard
           |  FROM inter$b
           |  JOIN (SELECT jid AS id_a, set_size AS size_a FROM sizes)
           |    USING (id_a)
           |  JOIN (SELECT jid AS id_b, set_size AS size_b FROM sizes)
           |    USING (id_b)),
           |rep$b AS (SELECT $b AS bands, $rows AS rows_per_band,
           |  (SELECT CAST(count(*) AS BIGINT) FROM pairs$b)
           |    AS n_candidates,
           |  (SELECT CAST(coalesce(sum(CASE WHEN jaccard >= 0.4
           |      THEN 1 ELSE 0 END), 0) AS BIGINT) FROM jac$b)
           |    AS n_high_sim)""".stripMargin
      }
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s3 AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |ex AS (SELECT doc_id AS jid, unnest(list_distinct(sh)) AS sh FROM s3),
         |sizes AS (SELECT jid, count(*) AS set_size FROM ex GROUP BY jid),
         |h3 AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s3),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h3),
         |${Seq(2, 4, 8).map(cfg).mkString(",\n")},
         |rep AS (SELECT * FROM rep2 UNION ALL SELECT * FROM rep4
         |  UNION ALL SELECT * FROM rep8)
         |SELECT bands, rows_per_band, n_candidates, n_high_sim,
         |  CASE WHEN n_candidates > 0 THEN
         |    ${f6("CAST(n_high_sim AS DOUBLE) / CAST(n_candidates AS DOUBLE)")}
         |  END AS precision
         |FROM rep ORDER BY bands""".stripMargin
    },

    "q301_fuzzy_decontamination" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s3 AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |ex AS (SELECT doc_id AS jid, unnest(list_distinct(sh)) AS sh FROM s3),
         |sizes AS (SELECT jid, count(*) AS set_size FROM ex GROUP BY jid),
         |h3 AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s3),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h3),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS inter_size
         |  FROM pairs
         |  JOIN ex sa ON sa.jid = pairs.id_a
         |  JOIN ex sb ON sb.jid = pairs.id_b AND sb.sh = sa.sh
         |  GROUP BY id_a, id_b),
         |jac AS (SELECT id_a, id_b,
         |  CAST(inter_size AS DOUBLE) /
         |    CAST(size_a + size_b - inter_size AS DOUBLE) AS jaccard
         |  FROM inter
         |  JOIN (SELECT jid AS id_a, set_size AS size_a FROM sizes) USING (id_a)
         |  JOIN (SELECT jid AS id_b, set_size AS size_b FROM sizes) USING (id_b)),
         |oriented AS (SELECT
         |  CASE WHEN id_a % 20 = 3 THEN id_b ELSE id_a END AS corpus_id,
         |  CASE WHEN id_a % 20 = 3 THEN id_a ELSE id_b END AS bench_id,
         |  jaccard FROM jac
         |  WHERE (id_a % 20 = 3) <> (id_b % 20 = 3)),
         |best AS (SELECT corpus_id, bench_id, jaccard,
         |  row_number() OVER (PARTITION BY corpus_id
         |    ORDER BY jaccard DESC, bench_id ASC) AS rn FROM oriented)
         |SELECT corpus_id, bench_id, ${f6("jaccard")} AS max_jaccard,
         |  jaccard >= 0.5 AS contaminated
         |FROM best WHERE rn = 1 ORDER BY corpus_id""".stripMargin,

    "q302_token_burstiness" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS cf,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM tk WHERE length(tok) > 0 GROUP BY tok)
         |SELECT tok, cf, df,
         |  ${f6("CAST(cf AS DOUBLE) / CAST(df AS DOUBLE)")} AS burstiness
         |FROM f ORDER BY cf DESC, tok ASC LIMIT 20""".stripMargin,

    "q303_cross_source_dups" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s3 AS (SELECT doc_id, ${shingles("tk", 3)} AS sh FROM t),
         |h3 AS (SELECT doc_id, list_transform(sh, x -> ${md5Mod("x")}) AS hs FROM s3),
         |sig AS (SELECT doc_id, [${sigElems("hs", 16).mkString(", ")}] AS sg FROM h3),
         |banded AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS band, sg FROM sig),
         |buckets AS (SELECT doc_id, band,
         |  ${md5Long("array_to_string([sg[band*4+1], sg[band*4+2], sg[band*4+3], sg[band*4+4]], '_')")} AS bucket
         |  FROM banded),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |lab AS (SELECT least(da.source, db.source) AS src_lo,
         |  greatest(da.source, db.source) AS src_hi
         |  FROM pairs
         |  JOIN documents da ON da.doc_id = pairs.id_a
         |  JOIN documents db ON db.doc_id = pairs.id_b)
         |SELECT src_lo, src_hi, CAST(count(*) AS BIGINT) AS n_pairs,
         |  src_lo <> src_hi AS cross_source
         |FROM lab GROUP BY src_lo, src_hi
         |ORDER BY src_lo, src_hi""".stripMargin,
  )
}
