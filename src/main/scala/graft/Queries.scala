package graft

import java.sql.Timestamp

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.config.TableSettings
import graft.operators._
import graft.sinks.PartitionedSink
import graft.sources.Tables

/** The operator-coverage query registry (SURVEY.md §2 inventory + §7
  * phase 5/6 extensions). Every query is deterministic: exact-typed sort
  * keys, decimal-exact aggregation (double sums are order-dependent;
  * decimal sums are not), and floor-truncation instead of round for
  * derived doubles (floor(x*1e6) is bit-deterministic across engines;
  * round() is boundary-sensitive to the double's shortest decimal
  * representation).
  */
object Queries {

  // -- helpers -----------------------------------------------------------
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Exact sum of a 2-decimal double column: decimal cast → exact decimal
    * sum → double. Identical in any engine regardless of add order. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Bit-deterministic 6-dp truncation (see scaladoc above). */
  private def f6(c: Column): Column = floor(c * lit(1000000L)) / lit(1000000.0)

  private val wmEvents = Timestamp.valueOf("2024-01-15 00:00:00")

  // =======================================================================
  // Reference-parity queries (SURVEY.md §2.1-2.6)
  // =======================================================================

  /** P1+P2+F2+F3: the incremental-ingestion flagship — not-null ref,
    * strict-> watermark, unpadded YEAR/MONTH partition strings. */
  def q01IncrementalWatermark(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("ts").isNotNull && col("ts") > lit(wmEvents))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"),
        Prep.yearString(col("ts")).as("year"),
        Prep.monthString(col("ts")).as("month"))
      .orderBy("event_id")

  /** F1: SAP timestamp reconstruction from split yyyyMMdd/HHmmss string
    * columns (native to_timestamp replaces the reference's Python UDF,
    * config.py:18-32). */
  def q02SapTimestamp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        date_format(col("ts"), "yyyyMMdd").as("budat"),
        date_format(col("ts"), "HHmmss").as("cputm"))
      .withColumn("ref_ts", Prep.sapTimestamp(col("budat"), col("cputm")))
      .orderBy("event_id")

  /** F5: SHA-256 PII hashing (sha2 ≡ hexdigest: lowercase, null→null). */
  def q03PiiSha256(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"),
        Prep.sha256Pii(col("c_name")).as("name_hash"),
        Prep.sha256Pii(col("c_mktsegment")).as("segment_hash"))
      .orderBy("c_custkey")

  /** P3+P2: config-driven projection + pushed-down filter. */
  def q04ProjectionFilter(s: SparkSession, dir: String): DataFrame =
    Prep.project(t(s, dir, "lineitem"),
      Some(Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")))
      .filter(col("l_quantity") > 30)
      .orderBy("l_orderkey", "l_linenumber")

  /** F2+F3+F4: all three unpadded partition-string derivations incl. the
    * ISO-week year-boundary edge. */
  def q05PartitionStrings(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        Prep.yearString(col("o_orderdate")).as("year"),
        Prep.monthString(col("o_orderdate")).as("month"),
        Prep.isoWeekString(col("o_orderdate")).as("week"))
      .orderBy("o_orderkey")

  /** A1+F7: watermark advance — global max formatted with the sync
    * document's exact µs+'Z' pattern. */
  def q06WatermarkAdvance(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .agg(date_format(max(col("ts")), graft.config.Formats.SyncPattern)
        .as("sync_value"))

  /** A2+A3 family: global counts (plus distinct count). */
  def q07Counts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        count(col("value")).as("n_values"))

  /** F6: stringify casts (SQL 'true' casing — the documented divergence
    * from Python's str(True), SURVEY.md §4.3 trap 4). */
  def q08Stringify(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        Prep.stringify(col("user_id")).as("user_id_str"),
        Prep.stringify(col("value") > 100).as("is_big_str"))
      .orderBy("event_id")

  /** Full c1 prep pipeline (config.py:59-92): projection → conditional
    * sha2/stringify → strict-> watermark → unpadded ISO week. */
  def q09C1Prep(s: SparkSession, dir: String): DataFrame = {
    val staged = t(s, dir, "events").select(
      col("event_id"), col("ts").as("SYSMODTIME"),
      col("event_type").as("EMAIL__C"), col("user_id").as("IS_PRO__C"))
    val settings = TableSettings(
      refColumn = "SYSMODTIME", refFirstValue = "2024-01-15T00:00:00.000000Z",
      columnsToImport = Some(Seq("event_id", "SYSMODTIME", "EMAIL__C", "IS_PRO__C")))
    Prep.c1(settings, wmEvents.toLocalDateTime)(staged)
      .select(col("event_id"), col("SYSMODTIME").as("sysmodtime"),
        col("EMAIL__C").as("email_hash"), col("IS_PRO__C").as("is_pro"),
        col("WEEK").as("week"))
      .orderBy("event_id")
  }

  // =======================================================================
  // Relational breadth (SURVEY.md §2.7-2.10 — absent in reference)
  // =======================================================================

  /** TPC-H Q1-style grouped aggregation; decimal-exact sums. */
  def q10PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit(Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", f6(col("sum_qty") / col("count_order")))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Broadcast equi-join: fact ⋈ small dim, explicitly broadcast. */
  def q11JoinBroadcast(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val part = t(s, dir, "part")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("p_brand")
  }

  /** Multi-way star join region⋈nation⋈customer⋈orders (dims broadcast,
    * fact shuffles once). */
  def q12JoinMultiway(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region")
    val nation = t(s, dir, "nation")
    val customer = t(s, dir, "customer")
    val orders = t(s, dir, "orders")
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"))
      .orderBy("r_name")
  }

  /** Left-semi join (EXISTS). */
  def q13SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val customer = t(s, dir, "customer")
    val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
    customer.join(bigOrders, customer("c_custkey") === bigOrders("o_custkey"),
      "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Left-anti join (NOT EXISTS) — customers with no high-value order
    * (the complement of q13, so the result is non-trivially non-empty). */
  def q14AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val customer = t(s, dir, "customer")
    val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
    customer.join(bigOrders, customer("c_custkey") === bigOrders("o_custkey"),
      "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Window dedup keep-latest — generalizes the reference's watermark
    * semantics (SURVEY.md §2.8). */
  def q15DedupKeepLatest(s: SparkSession, dir: String): DataFrame =
    Dedup.keepLatest(t(s, dir, "events"), Seq("user_id", "event_type"),
      "ts", "event_id")
      .select("user_id", "event_type", "event_id", "ts")
      .orderBy("user_id", "event_type")

  /** Top-k per group via window rank. */
  def q16TopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Running window frame (ROWS UNBOUNDED PRECEDING): running count and
    * decimal-exact running sum per user. */
  def q17RunningWindow(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val frame = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(order))
      .withColumn("running_n", count(lit(1)).over(frame))
      .withColumn("running_value",
        sum(col("value").cast(DecimalType(18, 2))).over(frame).cast("double"))
      .select("user_id", "rn", "event_id", "running_n", "running_value")
      .orderBy("user_id", "rn")
  }

  /** Global sort + limit top-k. */
  def q18OrderLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .limit(100)

  /** EXCEPT (distinct) — reconciliation between two increments. */
  def q19SetExcept(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val y1995 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
    val y1996 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
    y1995.except(y1996).orderBy("o_custkey")
  }

  /** INTERSECT (distinct). */
  def q20SetIntersect(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val y1995 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
    val y1996 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
    y1995.intersect(y1996).orderBy("o_custkey")
  }

  /** UNION of two overlapping increments + distinct — multi-increment
    * compaction. */
  def q21UnionCompact(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val a = e.filter(col("ts") < lit(Timestamp.valueOf("2024-01-10 00:00:00")))
    val b = e.filter(col("ts") >= lit(Timestamp.valueOf("2024-01-05 00:00:00")) &&
      col("ts") < lit(Timestamp.valueOf("2024-01-15 00:00:00")))
    a.unionByName(b).distinct()
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  // =======================================================================
  // Event-time windows (SURVEY.md §2.11 — batch `window()` expressions)
  // =======================================================================

  /** Tumbling 1-hour event-time window aggregation. */
  def q22TumblingWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** Sliding 1-hour window, 30-minute slide (each event in 2 windows). */
  def q23SlidingWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))
      .orderBy("window_start")

  /** Session windows (10-minute gap) per user. */
  def q24SessionWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("last_ts"))
      .orderBy("user_id", "session_start")

  /** ROLLUP grouping sets. */
  def q25Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Explicit GROUPING SETS — the general form q25/q26 specialize,
    * with grouping() markers disambiguating "NULL because subtotal"
    * from "NULL in the data" (the distinction Hive-style reports rely
    * on). Plans as ONE Expand over one scan, like rollup/cube. */
  def q74GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    s.sql("""
      SELECT l_returnflag, l_linestatus,
        CAST(grouping(l_returnflag) AS INT) AS g_flag,
        CAST(grouping(l_linestatus) AS INT) AS g_status,
        count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem_v
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        (l_returnflag), (l_linestatus), ())
      ORDER BY g_flag, g_status, l_returnflag ASC NULLS FIRST,
        l_linestatus ASC NULLS FIRST""")
  }

  /** Outer joins — the coverage q11–q14 (inner/semi/anti) leaves out:
    * LEFT OUTER preserving customers with no orders (their aggregates
    * coalesce to 0), plus a count proving the preserved-side rows
    * survive. One shuffle per side; the orders side pre-aggregates
    * BEFORE the join (aggregate-below-join beats join-then-aggregate:
    * the join input shrinks from |orders| to |customers-with-orders|). */
  def q75OuterJoin(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_spent"))
    t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      .join(perCust, Seq("c_custkey"), "left")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("n_orders").isNull, 1L).otherwise(0L))
          .as("n_without_orders"),
        dsum(coalesce(col("total_spent"), lit(0.0))).as("nation_spend"))
      .orderBy("c_nationkey")
  }

  /** CUBE grouping sets. */
  def q26Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  // =======================================================================
  // LLM-pipeline extensions: dedup / similarity / text / multimodal / json
  // =======================================================================

  /** Exact dedup with deterministic canonical representative. */
  def q27DedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactCanonical(t(s, dir, "documents"), Seq("lang", "source"), "doc_id")
      .orderBy("lang", "source")

  /** MinHash signatures (portable md5-based hash family). The 16-slot
    * signature is emitted "|"-joined: a flat string survives any
    * row-sorting comparator, and the join is lossless for fixed-width
    * non-negative longs. */
  def q28MinhashSignature(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        array_join(
          transform(Dedup.minhashSignature(col("text"), 3, 16),
            _.cast("string")), "|").as("signature"))
      .orderBy("doc_id")

  /** MinHash LSH candidate pairs (4 bands × 4 rows). */
  def q29MinhashCandidates(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidates(t(s, dir, "documents"), "text", "doc_id")
      .orderBy("id_a", "id_b")

  /** SimHash 32-bit sketches. */
  def q30Simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.withSimhash(t(s, dir, "documents"), "text")
      .select("doc_id", "simhash")
      .orderBy("doc_id")

  /** TPC-H Q5-shaped 6-table join (local-supplier volume): exercises
    * Catalyst join ordering/reordering across two independent paths to
    * the nation key (customer and supplier). */
  def q54SqlTpchQ5(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(s"${n}_v"))
    s.sql("""
      SELECT n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
          AS revenue
      FROM customer_v, orders_v, lineitem_v, supplier_v, nation_v, region_v
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""")
  }

  /** TPC-H Q17-shaped correlated scalar subquery (small-quantity
    * revenue per brand): each lineitem is gated on 20% of the average
    * quantity OF ITS OWN PART — the Catalyst subquery-rewrite family
    * (`RewriteCorrelatedScalarSubquery` → aggregate + join) that no
    * other registry query exercises. Deterministic across engines:
    * quantities are integral, so avg = exact-integer-sum / count is
    * order-independent; revenue uses the decimal-exact sum contract. */
  def q55CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    t(s, dir, "part").createOrReplaceTempView("part_v")
    s.sql("""
      SELECT p_brand,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
          AS avg_yearly,
        count(*) AS n_small
      FROM lineitem_v JOIN part_v ON p_partkey = l_partkey
      WHERE l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem_v l2 WHERE l2.l_partkey = p_partkey)
      GROUP BY p_brand ORDER BY p_brand""")
  }

  /** Pivot (long→wide): order counts by priority × status. The pivot
    * values are EXPLICIT (`Seq("F","O","P")`), which matters at scale:
    * without them Spark runs an extra distinct-scan job over the pivot
    * column before it can even plan. With them this is ONE hash
    * aggregate — the same plan as the oracle's conditional-count
    * formulation. Empty cells coalesce to 0 (pivot yields null). */
  def q56Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  /** Unpivot/melt (wide→long): per-flag decimal-exact sums unpivoted
    * into (metric, value) rows — the inverse of q56's family, planned
    * as Expand (each input row fans out to one row per metric, no
    * shuffle beyond the feeding aggregate). */
  def q57Unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("qty"),
        dsum(col("l_extendedprice")).as("price"),
        dsum(col("l_discount")).as("disc"))
    wide.unpivot(Array(col("l_returnflag")),
      Array(col("qty"), col("price"), col("disc")), "metric", "value")
      .orderBy("l_returnflag", "metric")
  }

  /** Multimodal resize plumbing: every payload truncated/zero-padded to
    * exactly 64 bytes (the fixed-size input contract of a batched
    * decoder), fingerprinted via the portable md5-of-hex convention.
    * Pure expressions, no shuffle — the whole operator pipelines into
    * the scan. */
  def q58ResizePayload(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Multimodal.resizePayload(
      Multimodal.withPayload(docs, "text", "doc_id"), "payload", 64)
      .select(col("doc_id"),
        length(col("payload")).as("resized_len"),
        md5(hex(col("payload"))).as("resized_md5"))
      .orderBy("doc_id")
  }

  /** Lead/lag window family: per-user inter-event gaps — seconds since
    * the previous event and the next event's type. One shuffle on
    * user_id (same window as q17's running frame). */
  def q59LeadLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
          .as("gap_s"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .select("user_id", "event_id", "gap_s", "next_type")
      .orderBy("event_id")
  }

  /** Salted two-phase top-k (the skew-safe q16): windows need every row
    * of a key in ONE task, so a hot key is the scale-killer neither
    * partial aggregation nor AQE rescues. Local top-k per (key, salt)
    * then global top-k over ≤ salt×k survivors — identical result
    * (proven vs the direct window in SkewSpec, and against q16's own
    * oracle SQL here), bounded task size. */
  def q60SaltedTopK(s: SparkSession, dir: String): DataFrame =
    Skew.saltedTopK(t(s, dir, "orders"), Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3,
      salt = 8, saltBy = Seq("o_orderkey"))
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")

  /** TPC-H Q16-shaped NOT IN subquery (supplier diversity per brand,
    * excluding a supplier subset): `NOT IN (subquery)` plans as a
    * null-aware anti join — a distinct Catalyst family from q14's
    * left_anti (NOT EXISTS), because NOT IN must also reject when the
    * subquery yields any NULL. s_suppkey is non-null here, so both
    * engines agree; the plan family still gets exercised. */
  def q61NotInSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    t(s, dir, "part").createOrReplaceTempView("part_v")
    t(s, dir, "supplier").createOrReplaceTempView("supplier_v")
    s.sql("""
      SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem_v JOIN part_v ON p_partkey = l_partkey
      WHERE l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier_v WHERE s_nationkey < 5)
      GROUP BY p_brand ORDER BY p_brand""")
  }

  /** Corpus vocabulary top-k: the most document-frequent tokens — the
    * stopword/vocabulary analysis a corpus pipeline runs before
    * quality scoring. Explode→distinct-per-doc→count→top-k: one
    * map-side-combined aggregate over exploded tokens, then a global
    * top-k (rank by df desc, token asc — total order). */
  def q62TopTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(array_distinct(TextAnalysis.tokens(col("text"))))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(20)

  /** Deterministic hash-based train/validation split — THE reproducible
    * way to partition a corpus (random() is neither reproducible nor
    * engine-portable): split = md5-hash of the doc id mod 100, train if
    * < 95. Any engine recomputes the identical assignment, so the
    * split survives re-runs, backfills, and engine migrations. */
  def q63HashSplit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("split",
        when(pmod(graft.functions.Hashing.md5Long(
          col("doc_id").cast("string")), lit(100)) < 95, lit("train"))
          .otherwise(lit("valid")))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"))
      .orderBy("lang", "split")

  /** Portable KMV distinct-count sketch (q40's HLL is engine-internal
    * and rows-only; KMV over the md5 family is reproducible anywhere,
    * so the approx-counting family gets a hash-checked oracle too). */
  def q53KmvDistinct(s: SparkSession, dir: String): DataFrame =
    Sketches.kmvDistinct(t(s, dir, "events"), Seq("event_type"),
      "user_id", k = 32)
      .orderBy("event_type")

  /** Near-dup CLUSTERS: connected components over q29's MinHash-LSH
    * candidate pairs — the grouping a dedup pass consumes (one keeper
    * per component). */
  def q52DedupComponents(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id")
    Dedup.connectedComponents(docs, "doc_id", pairs)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** SimHash band candidates verified by exact Hamming distance — the
    * sketch pipeline counterpart of q29 (threshold 2 of 32 bits — the
    * fixture's shared-vocabulary docs correlate strongly, so looser
    * thresholds admit a quadratic candidate set). */
  def q51SimhashCandidates(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashCandidates(t(s, dir, "documents"), "text", "doc_id",
      maxHamming = 2)
      .orderBy("id_a", "id_b")

  /** Exact n-gram Jaccard verification fed by q29's MinHash-LSH
    * candidate pairs — the executed plan IS the scale story: the
    * candidate set is collision-bound (bucket equi-join), never an
    * all-pairs or low-cardinality-key self-join, and the verify stage
    * is one explode + equi-join + group-by over those pairs. */
  def q31NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id")
    Dedup.ngramJaccard(docs, pairs, "doc_id", "text", 2)
      .withColumn("jaccard", f6(col("jaccard")))
      .orderBy("id_a", "id_b")
  }

  /** Token/char statistics. */
  def q32TextStats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withTokenStats(t(s, dir, "documents"), "text")
      .select("doc_id", "n_tokens", "n_chars_m", "n_punct", "token_estimate")
      .orderBy("doc_id")

  /** Quality scoring. */
  def q33TextQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withQuality(t(s, dir, "documents"), "text")
      .select("doc_id", "alpha_ratio", "punct_ratio", "avg_word_len",
        "quality_score")
      .orderBy("doc_id")

  /** Language-ID heuristic vs the labeled lang column. */
  def q34LangId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withLangId(t(s, dir, "documents"), "text")
      .select("doc_id", "lang", "lang_pred")
      .orderBy("doc_id")

  /** Rolling-hash document fingerprint. */
  def q35Fingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withFingerprint(t(s, dir, "documents"), "text")
      .select("doc_id", "fingerprint")
      .orderBy("doc_id")

  /** JSON event-property extraction + aggregation (from_json). */
  def q36JsonProps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Exact brute-force cosine top-k (embedding similarity baseline). */
  def q37KnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .withColumn("cos", f6(col("cos")))
      .orderBy("query_id", "rank")
  }

  /** ANN via multi-table sign-LSH (the 100 TB path; recall vs q37
    * asserted in ScalaTest; the DuckDB oracle recomputes the same
    * md5-derived hyperplanes). */
  def q38KnnLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.lshTopK(emb, queries, "vec_id", "embedding", 64, 10,
      bits = 6, tables = 16)
      .withColumn("cos", f6(col("cos")))
      .orderBy("query_id", "rank")
  }

  /** Multimodal binary-column plumbing (stubbed decode, real schema /
    * partition / batch shape). */
  def q39MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Multimodal.extractFeatures(
      Multimodal.withPayload(docs, "text", "doc_id"), "doc_id")
      .orderBy("doc_id")
  }

  /** REAL image decode through the multimodal seam: deterministic PNGs
    * generated per doc (pixel channels are affine-mod-256 in
    * (doc_id, x, y)), decoded back with JDK ImageIO, reduced to
    * integer-exact channel sums. PNG is lossless, so the oracle — which
    * recomputes the sums from the pixel formula, never touching a PNG —
    * verifies true pixel-for-pixel decode fidelity, not just plumbing. */
  def q64ImageDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageFeatures(
      Multimodal.withGeneratedPng(
        t(s, dir, "documents").select(col("doc_id")), "doc_id"),
      "doc_id")
      // map-only chain: without a materialization point the
      // presentation sort's range sampler re-executes every PNG
      // encode+decode a second time
      .localCheckpoint(false)
      .orderBy("doc_id")

  /** Test-set decontamination: training docs (every source but src0)
    * sharing at least one word trigram with the src0 "benchmark" set.
    * Benchmark shingle hashes broadcast; the corpus side never
    * shuffles its text. */
  def q65Decontamination(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.contamination(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"),
      "text", "doc_id")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** Within-doc repetition (duplicate-bigram fraction) — Gopher-style
    * boilerplate/spam signal; pure projection, zero shuffle. */
  def q66Repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withRepetition(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("n_bigrams"),
        col("n_distinct_bigrams"), col("dup_frac"))
      .orderBy("doc_id")

  /** PII count+mask over text with synthetic-but-deterministic PII
    * injected (the fixture corpus has none): every 7th doc gains an
    * email, every 11th a phone number — both derived from doc_id so
    * the oracle regenerates them exactly. */
  def q67PiiRedaction(s: SparkSession, dir: String): DataFrame = {
    val withPii = t(s, dir, "documents").withColumn("text2",
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call +1-555-"),
            (col("doc_id") % 10000))).otherwise(lit(""))))
    TextAnalysis.redactPii(withPii, "text2")
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy("doc_id")
  }

  /** Language-stratified token-budget sampling: each language's
    * hash-ordered document prefix totalling <3000 tokens — the
    * "N tokens per language, reproducibly" pipeline stage, via the
    * two-phase bounded-task prefix sum (Sampling.budgetPrefix). */
  def q68TokenBudgetSample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      size(TextAnalysis.tokens(col("text"))).as("n_tokens"),
      Sampling.idHash(col("doc_id")).as("h"))
    Sampling.budgetPrefix(docs, "lang", "n_tokens", "h", budget = 3000L)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("cum_n_tokens"))
      .orderBy("doc_id")
  }

  /** TF-IDF-style top terms per doc with a RATIONAL idf —
    * tf·(N+1)/(df+1) instead of tf·log(N/df): the ranking logic and the
    * dataflow (explode → tf agg → df join → per-doc top-k window) are
    * the real thing, while every arithmetic op (int mult, one double
    * divide) is bit-identical across engines — log() is
    * library-dependent and would make the oracle flaky at f6
    * boundaries. */
  def q69TfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df via a count window over the (doc,term)-distinct tf rows — NOT
    // a self-join against a re-aggregated copy: one scan of the text
    // column instead of two, and the term-hash exchange the window
    // needs is the same one the join would have paid (power-law term
    // skew in that exchange is AQE-split either way)
    val wTerm = Window.partitionBy("term")
    val n = docs.agg(count(lit(1)).as("n_docs")) // metadata-only scan
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.withColumn("df_t", count(lit(1)).over(wTerm))
      .crossJoin(broadcast(n))
      .withColumn("score",
        f6(col("tf") * (col("n_docs") + lit(1.0)) / (col("df_t") + lit(1.0))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("score"), col("rank"))
      .orderBy("doc_id", "rank")
  }

  /** Deterministic stratified sampling: per-source keep fractions
    * applied as integer hash thresholds (md5Mod(doc_id) < frac·P) — the
    * sampleBy shape, but reproducible across engines/backfills because
    * the coin is the portable hash, not an RNG. Pure filter, zero
    * shuffle. */
  def q70StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val P = graft.functions.Hashing.SmallPrime
    val thresholds: Seq[(String, Long)] = Seq(
      "src0" -> (0.5 * P).toLong, "src1" -> (0.2 * P).toLong)
    val defaultThreshold = (0.08 * P).toLong
    val th = thresholds.foldRight(lit(defaultThreshold): Column) {
      case ((src, t), other) =>
        when(col("source") === src, lit(t)).otherwise(other)
    }
    t(s, dir, "documents")
      .filter(graft.functions.Hashing.md5Mod(
        col("doc_id").cast("string")) < th)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  /** Quantile-band length filter: keep docs whose n_chars lies within
    * the corpus's [p05, p95] — DISCRETE percentiles (actual set
    * members, integer-exact) so the band edges carry no float
    * interpolation ulp risk; the one-row bounds aggregate broadcasts. */
  def q71LengthBand(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bounds = docs.agg(
      expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars)").as("lo"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars)").as("hi"))
    docs.crossJoin(broadcast(bounds))
      .filter(col("n_chars").between(col("lo"), col("hi")))
      // percentile_disc returns DOUBLE in Spark but quantile_disc over a
      // BIGINT column returns BIGINT in DuckDB; both are integer-valued
      // (discrete percentile = an actual set member), so cast to long to
      // make the emitted cells type-identical, not just numerically equal.
      .select(col("doc_id"), col("n_chars"),
        col("lo").cast("long").as("lo"), col("hi").cast("long").as("hi"))
      .orderBy("doc_id")
  }

  /** BM25 retrieval scoring for a fixed query against the corpus —
    * rational idf (N−df+0.5)/(df+0.5), k1=1.2, b=0.75. Per-term
    * contributions land in FIXED conditional-aggregation slots and sum
    * in literal order (a bare sum(double) over shuffled rows is
    * order-dependent and can't be oracled); every division is written
    * in the same order in both engines. Only query-term rows survive
    * the explode (early filter), stats/df broadcast. */
  def q72Bm25(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("join", "hash", "merge")
    val (k1, b) = (1.2, 0.75)
    val docs = t(s, dir, "documents")
    // ONE scan of the text column: tokenize once, carry doc length and
    // the query-term-filtered token list through a single-element
    // explode (the struct-wrap keeps the expensive tokenize out of the
    // sibling-of-generator recompute trap), then explode_outer so
    // hitless docs still reach the corpus-stats aggregate. The naive
    // formulation scans documents twice more (dl + tf branches are
    // physically separate scans — branch reuse does not exist in a
    // single action).
    val base = docs.select(col("doc_id"),
        explode(array(graft.functions.Expr.let(
          TextAnalysis.tokens(col("text"))) { tk =>
          struct(size(tk).as("dl"),
            filter(tk, t0 => terms.map(t0 === lit(_)).reduce(_ || _))
              .as("hits"))
        })).as("s"))
      .select(col("doc_id"), col("s.dl").as("dl"),
        explode_outer(col("s.hits")).as("term"))
    // persist the post-aggregate frame (≈1 row per doc, text column
    // gone): its three consumers (corpus stats, tf, df) would otherwise
    // each re-scan and re-tokenize the corpus — predicate pushdown
    // specializes their subtrees, so exchange reuse can't save them
    val agg1 = base.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .persist()
    // populate the cache before its three consumers race it (r16 — see
    // partGraph's e.count() rationale)
    agg1.count()
    val stats = agg1.groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = agg1.filter(col("term").isNotNull)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val contrib =
      ((col("n_docs") - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5))) *
        (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) *
          (lit(1 - b) + lit(b) * col("dl") /
            (col("sum_dl").cast("double") / col("n_docs"))))
    val perTerm = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", contrib)
    val slots = terms.map(tm =>
      coalesce(max(when(col("term") === tm, col("contrib"))), lit(0.0)))
    // top-20 via orderBy().limit() — TakeOrderedAndProject, a per-
    // partition heap + one 20-row merge, never a global row_number
    // window funneling every scored doc through one task. The rank
    // window then runs over the 20 surviving rows only.
    val top = perTerm.groupBy("doc_id")
      .agg(f6(slots.reduce(_ + _)).as("bm25"),
        count(lit(1)).cast("int").as("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
    val w = Window.orderBy(col("bm25").desc, col("doc_id").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("bm25"), col("n_terms_hit"), col("rank"))
      .orderBy("rank")
  }

  /** Weighted sampling with zero randomness: sequential Poisson /
    * priority sampling — k smallest h/w priorities per language, so
    * token-heavy docs are proportionally likelier to be drawn and the
    * draw replays identically on any engine or backfill. */
  def q81PrioritySample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"),
      size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
    Sampling.prioritySample(docs, "lang", "n_tokens", "doc_id", k = 20)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("rank"))
      .orderBy("doc_id")
  }

  /** Damped PageRank over the part↔supplier graph, ORACLE-PROVEN: the
    * int64 fixed-point formulation (Graph.pageRank — ranks scaled by
    * 2^30, every division an exact integer floor, every sum an exact
    * long add) is bit-identical under any partitioning, so DuckDB can
    * replay the same recurrence as 10 chained CTEs and hash-match
    * cell-for-cell — no float tolerance anywhere. The graph: every
    * lineitem part points at its supplier (offset +1e6 to disjoin the
    * key spaces); odd suppliers point back, so even suppliers are
    * DANGLING (exercising the dangling-mass redistribution) and parts
    * fed by odd suppliers have genuine inflow. */
  def q82PageRank(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
    val fwd = li.select(col("l_partkey").as("src"),
      (col("l_suppkey") + lit(1000000L)).as("dst"))
    val rev = li.filter(col("l_suppkey") % 2 === 1)
      .select((col("l_suppkey") + lit(1000000L)).as("src"),
        col("l_partkey").as("dst"))
    val edges = fwd.unionByName(rev).distinct()
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id"))).distinct()
    Graph.pageRank(nodes, "id", edges, iters = 10, dampingPct = 85)
      .orderBy("id")
  }

  /** approx_percentile with a rank-error-bound contract — the operator
    * a real 100 TB pipeline runs instead of q50's exact sort (the GK
    * sketch is one bounded-memory pass; the exact percentile buffers
    * whole groups). Mirrors q40's HLL pattern: the sketch value is
    * merge-order-dependent so it can't be emitted, but its GUARANTEE —
    * rank error ≤ n/accuracy — is portable. accuracy=100 bounds rank
    * error by 0.01·n; the assertion brackets each approx value between
    * the exact quantiles at p∓0.02 (double the guaranteed bound, same
    * slack ratio as q40's ±20% vs 5% rsd), which the quantile
    * function's monotonicity makes equivalent to the rank bound. The
    * exact percentile exists for the check only — production keeps the
    * sketch. ONE buffer each (array forms), flattened above the agg. */
  def q83ApproxPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, " +
          "array(0.48D, 0.5D, 0.52D, 0.93D, 0.95D, 0.97D))").as("pq"),
        expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 100)")
          .as("aq"))
      .select(col("l_returnflag"),
        f6(element_at(col("pq"), 2)).as("p50"),
        f6(element_at(col("pq"), 5)).as("p95"),
        (element_at(col("aq"), 1) >= element_at(col("pq"), 1) &&
          element_at(col("aq"), 1) <= element_at(col("pq"), 3))
          .as("approx50_ok"),
        (element_at(col("aq"), 2) >= element_at(col("pq"), 4) &&
          element_at(col("aq"), 2) <= element_at(col("pq"), 6))
          .as("approx95_ok"))
      .orderBy("l_returnflag")

  /** Bloom-prefiltered semi join: lineitem rows for suppliers of one
    * nation. Result ≡ the plain semi join (the oracle states exactly
    * that) — the bloom admits false positives, never false negatives,
    * and the exact join removes the former — but the probe side sheds
    * non-matching rows BEFORE its shuffle via a 128 KB broadcast
    * bitset, the runtime-filter shape that dominates selective semi
    * joins at 100 TB. */
  def q73BloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val suppliers = t(s, dir, "supplier").filter(col("s_nationkey") === 3)
    RuntimeFilter.bloomSemiJoin(
      t(s, dir, "lineitem"), suppliers, "l_suppkey", "s_suppkey")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Z-order (Morton) values — the clustering key behind
    * two-dimensional file pruning (Layout.zorderWrite): bit-exact
    * engine-portable interleave, verified against the oracle's
    * shift-and-mask reconstruction. Top-100 rows by z keeps the result
    * small while exercising every bit position. */
  def q77Zorder(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        Layout.zorder(col("l_suppkey"), col("l_partkey")).as("z"))
      .orderBy(col("z").asc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(100)

  /** Triangle count on the co-purchase graph (parts sharing an order),
    * via DEGREE ORIENTATION: direct every edge toward its higher-
    * (degree, id) endpoint, enumerate wedges only at each triangle's
    * π-minimal vertex, close them against the oriented edge set. Out-
    * degrees are O(√m) under this orientation, so the wedge join is
    * bounded — the standard trick that keeps triangle counting feasible
    * when a hub vertex would make naive wedge enumeration quadratic.
    * The oracle counts the same triangles with the naive a<b<c SQL. */
  /** The part co-occurrence graph (a<b part pairs sharing an order) +
    * its degree table + the degree-oriented triangle count — shared by
    * q78 (triangles) and q84 (clustering coefficient). */
  private[graft] def partGraph(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, () => DataFrame) = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    // per-order pair expansion beats a lineitem self-join: one groupBy
    // exchange + an in-memory C(k,2) explode over tiny (≤7-item)
    // sorted part lists, instead of a sort-merge join over the full
    // table — the order key never re-sorts. Two FLAT generator steps
    // (posexplode, then explode of the strict suffix), not the earlier
    // nested transform/slice/flatten HOF: generators run inside
    // whole-stage codegen while nested lambda trees evaluate
    // interpreted per element — the HOF form cost ~29 s of executor
    // time cold (r16 stage profile) for the same 4M pairs.
    val e = li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(col("ps"), posexplode(col("ps")))
      .select(col("col").as("a"),
        explode(slice(col("ps"), col("pos") + lit(2), size(col("ps"))))
          .as("b"))
      .distinct()
      // materialize BEFORE any consumer runs (r16): AQE launches every
      // consumer exchange of the first action concurrently, and each
      // re-ran the basket explode + distinct when the pin was lazy.
      // r17: eager localCheckpoint instead of persist()+count() — the
      // columnar cache BUILD of the 1.2M-row edge list was the top
      // stage of q78's cold profile (~20 s of executor time in
      // CompressibleColumnBuilder) and the count() a second full pass;
      // the checkpoint stores the rows once with neither. The
      // partitioning it loses no longer matters: the r16 close join
      // that a checkpointed e once flipped to a bad broadcast is gone
      // (triangles are edge-iterated from the adjacency cache), and
      // every remaining consumer either broadcasts deg or repartitions
      // internally (labelPropagation).
      .localCheckpoint(true)
    val (deg, triangles) = orientedTriangles(e)
    (e, deg, triangles)
  }

  /** Degree table + degree-oriented triangle-count thunk over an a<b
    * edge list — partGraph's machinery factored out so ProbeGraph can
    * drive it on replicated graphs. */
  private[graft] def orientedTriangles(e: DataFrame)
      : (DataFrame, () => DataFrame) = {
    // degree table = |vertices| rows (keys, not edges). No broadcast
    // HINT: a hint overrides autoBroadcastJoinThreshold and would
    // collect |V| rows to the driver no matter the graph size — at
    // billions of vertices that is a driver OOM, not a fallback. Left
    // unhinted, Spark/AQE broadcasts small degree tables (this fixture
    // qualifies) and degrades to a shuffle join on a/b past the
    // threshold, which is the behavior a 100 TB graph needs.
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
      // persisted LAZILY (callers that take only `e` never pay for it):
      // deg feeds BOTH sides of the orientation join plus q84's
      // clustering denominator — uncached it was derived from e twice
      // per run (2 × ~14 s executor cold, r16 stage profile). The
      // thunk below populates it before its consumers race; cached
      // stats also let the optimizer broadcast both orientation joins
      // on this |V|-row frame instead of sort-merging them (and degrade
      // gracefully to a shuffle join past the threshold at real graph
      // scale).
      .persist()
    // π-orient each edge by (degree, id) so every triangle survives in
    // exactly one DAG shape a→b→c with a→c; only (src,dst) is needed —
    // the edge-iterator count below never orders wedges
    def orientedFrame() = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("s"), col("b").as("t")))
        .otherwise(struct(col("b").as("s"), col("a").as("t")))
        .as("e"))
      .select(col("e.s").as("src"), col("e.t").as("dst"))
    // EDGE-ITERATOR triangle count (r16 rewrite, guide §1.2 step 1:
    // fix the distributed algorithm before tuning stages). The previous
    // plan materialized every π-ordered WEDGE (a src-keyed self-join,
    // ~34 wedges per edge — 41M rows at sf0.1), shed non-closing ones
    // through a driver-built bloom over the edge set, then equi-joined
    // the survivors back against the edges: one wedge exchange, one
    // eager bloom-build pass, one close join, ~170 s of executor time
    // and three eager actions cold. Counting per EDGE instead —
    // Σ_{(u,v)∈E} |N⁺(u) ∩ N⁺(v)| over sorted out-neighbor arrays —
    // needs one groupBy to build the adjacency arrays and two
    // edge⋈adjacency equi-joins feeding the native merge-walk
    // intersect kernel: wedges are never materialized, the bloom (and
    // its driver round-trip) disappears, and the whole count is ONE
    // action. Each triangle a→b→c (π-DAG) is counted exactly once, at
    // its (a,b) edge, since c ∈ N⁺(a) ∩ N⁺(b) and neither other edge
    // sees it: N⁺ lists of b and c cannot contain a (orientation), so
    // the sum equals the wedge-close count row for row. At scale the
    // π-oriented out-lists are O(√m) (the classic arboricity bound),
    // so the collect_list arrays stay task-sized exactly where the
    // old wedge expansion went quadratic.
    // thunked: the bloom build is an eager driver action, and q86
    // consumes only `e` — callers that never count triangles must not
    // pay for materializing the oriented edges
    val triangles = () => {
      // populate deg's cache before the oriented branches' four join
      // consumers race concurrent scans of it (one eager tiny action)
      deg.count()
      // oriented now has exactly ONE consumer (the adjacency build):
      // the r17 rewrite below regenerates the edge rows by EXPLODING
      // the adjacency arrays instead of re-joining oriented against
      // adj on src — (src, N⁺(src)) exploded over N⁺(src) is row for
      // row the oriented edge list with na already attached. That
      // deletes the first adjacency join, oriented's hash(src)
      // exchange (1.2M rows), and — because adj is now persisted and
      // populated once — the SECOND full adj derivation the old
      // two-join shape paid (both join sides rebuilt the
      // scan→orient→collect_list chain from e; two identical ~14 s
      // partial-aggregate stages in the r17 cold profile).
      val adj = orientedFrame().groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("ns"))
        .persist()
      adj.count()
      def intersectCount(a: Column, b: Column): Column =
        org.apache.spark.sql.GraftSql.column(
          graft.functions.SortedIntersectCount(
            org.apache.spark.sql.GraftSql.expression(a),
            org.apache.spark.sql.GraftSql.expression(b)))
      // src is dropped before the exchange: only (na, dst) must ride
      // the shuffle (guide §2.3, project before the exchange). The
      // nb side is hinted SHUFFLE_HASH: a sort-merge join would SORT
      // the array-laden edge rows (the one big exchange this count
      // has left) just to discard the order inside the sum — the
      // hash build side is the |V|-row adjacency slice per partition,
      // uniform under vertex hashing, and AQE skew handling still
      // applies. Results are strategy-invariant (oracle-checked).
      adj.select(col("ns").as("na"), explode(col("ns")).as("dst"))
        .join(adj.select(col("src").as("dst"), col("ns").as("nb"))
          .hint("SHUFFLE_HASH"), Seq("dst"))
        .agg(coalesce(sum(intersectCount(col("na"), col("nb"))), lit(0L))
          .as("n_triangles"))
    }
    (deg, triangles)
  }

  def q78Triangles(s: SparkSession, dir: String): DataFrame = {
    val (e, _, triangles) = partGraph(s, dir)
    e.agg(count(lit(1)).as("n_edges")).crossJoin(broadcast(triangles()))
  }

  /** Global clustering coefficient = 3·triangles / wedges, where the
    * wedge count is ONE aggregate over the degree table (Σ C(d,2) — no
    * wedge materialization; the triangle count reuses q78's
    * degree-oriented plan). The coefficient division is a single
    * double op, f6-floored for the portable 6-dp contract. */
  def q84ClusteringCoefficient(s: SparkSession, dir: String): DataFrame = {
    val (_, deg, triangles) = partGraph(s, dir)
    // per-row C(d,2) is an exact long (d·(d−1) is even); the SUM is
    // then an exact long add — order-independent, unlike a double sum
    val wedges = deg.agg(
      sum((col("d") * (col("d") - 1) / lit(2)).cast("long")).as("n_wedges"))
    wedges.crossJoin(broadcast(triangles()))
      .select(col("n_wedges"), col("n_triangles"),
        f6(lit(3.0) * col("n_triangles") / col("n_wedges"))
          .as("global_coeff"))
  }

  /** Deterministic synchronous label propagation over the part
    * co-occurrence graph, ORACLE-PROVEN like q82: 3 fixed rounds of
    * adopt-the-neighbor-mode (ties → smallest label) are exact integer
    * argmaxes, so DuckDB replays the identical rounds as chained CTEs
    * and the full 2000-row community assignment hash-matches. */
  def q86LabelPropagation(s: SparkSession, dir: String): DataFrame = {
    val (e, _, _) = partGraph(s, dir)
    Graph.labelPropagation(
      e.select(col("a").as("src"), col("b").as("dst")), iters = 3,
      // e is distinct a<b pairs: doubling cannot duplicate — skips the
      // dedup exchange of the 2.4M-row doubled edge list
      assumeDistinct = true)
      .orderBy("id")
  }

  /** Count-min point-frequency estimates with the bloom-style
    * sketch-prunes/exact-confirms contract: the depth×width counter
    * array is merged map-side and driver-collected (bounded, like the
    * bloom bitset), per-term estimates are computed against it JVM-side,
    * and the EMITTED columns are the exact counts plus `cms_ok` — the
    * one-sided guarantee (estimate ≥ truth always; ≤ truth + 3N/width
    * slack) that any merge order satisfies. The oracle states the exact
    * counts and TRUE: the sketch must stay result-invisible. */
  def q85CountMinFreq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probes = Seq("the", "data", "join", "hash", "merge")
    val (depth, width) = (4, 2048)
    val toks = t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .persist() // scanned by the sketch, the N count, and the recount
    // count FIRST (r16): populates the persisted cache before the
    // sketch and recount consumers race the empty cache (see partGraph)
    val nTotal = toks.count()
    val sketch = Sketches.countMinSketch(toks, "term", depth, width)
    val slack = 3L * nTotal / width
    val estDf = probes
      .map(p => (p, Sketches.countMinEstimate(sketch, depth, width, p)))
      .toDF("term", "cm_est")
    toks.filter(col("term").isin(probes: _*))
      .groupBy("term").agg(count(lit(1)).as("n_exact"))
      .join(broadcast(estDf), Seq("term"))
      .select(col("term"), col("n_exact"),
        (col("cm_est") >= col("n_exact") &&
          col("cm_est") <= col("n_exact") + lit(slack)).as("cms_ok"))
      .orderBy("term")
  }

  /** BATCH sessionization — the offline counterpart of the streaming
    * session_window (q24) and flatMapGroupsWithState sessionize: the
    * classic gap-split is two windows over ONE (user_id, time) sort —
    * lag to flag gap starts, running sum to number sessions — then a
    * groupBy. Time arithmetic on unix MICROS longs (exact; interval
    * subtraction parity across engines is murkier than integer math). */
  def q87BatchSessionize(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("ts"), unix_micros(col("ts")).as("us"))
    ev.withColumn("new_s",
        when(lag(col("us"), 1).over(order).isNull ||
          col("us") - lag(col("us"), 1).over(order) > lit(1800000000L),
          lit(1)).otherwise(lit(0)))
      .withColumn("session_idx", sum(col("new_s")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_idx")
  }

  /** Time-RANGE window frame (RANGE BETWEEN 1h PRECEDING): each event's
    * trailing-hour count and exact decimal sum per user — the frame the
    * rows-based q17 can't express (rows ≠ time under irregular event
    * spacing). The frame is value-bounded on the micros long, so its
    * membership — and the decimal sum — is deterministic even with
    * tied timestamps. */
  def q88RollingTimeWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc)
      .rangeBetween(-3600000000L, 0)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h",
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double"))
      .select("user_id", "event_id", "n_1h", "sum_1h")
      .orderBy("user_id", "event_id")
  }

  /** The remaining rank-family windows (ntile / percent_rank /
    * cume_dist) — quartile bucketing and normalized ranks per group.
    * The ordering key is made total (price, orderkey, linenumber), so
    * every rank — and the divisions, single double ops over exact ints
    * — is engine-deterministic.
    *
    * Scale note: a 3-value partition key means each window task holds
    * a third of the table — inherent to exact global ranks within a
    * group (same class as q50's exact percentiles). The 100 TB
    * formulation is the q68 two-phase shape — range-partition on the
    * ordering key, per-bucket counts, broadcast prefix offsets, then
    * rank = offset + local rank — worth it only when groups actually
    * exceed a task; at dimension-like group counts the plain window
    * wins by avoiding the extra pass. */
  def q89RankFamily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    t(s, dir, "lineitem")
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .select("l_returnflag", "l_orderkey", "l_linenumber", "quartile",
        "pct_rank", "cume")
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
  }

  /** Bigram language-model quality scoring — the CCNet/KenLM-shaped
    * perplexity filter of LLM data pipelines, made engine-portable by
    * dropping the logarithm: each bigram's add-one-smoothed conditional
    * probability (c(u,v)+1)/(c(u)+V) is ONE exactly-rounded IEEE double
    * division, quantized to 2^40 fixed point (floor of a power-of-two
    * multiply — both steps exact), so the per-doc score is an exact
    * LONG sum, order-independent under any partitioning and replayable
    * cell-for-cell by the DuckDB oracle (ln() carries no cross-engine
    * bit guarantee; IEEE division and power-of-two scaling do). Higher
    * avg_prob = more predictable text — the same ranking signal as
    * negated perplexity. Scale: both count tables are map-side-
    * combinable aggregates; the scoring join shuffles the bigram
    * stream on (u,v) once — at 100 TB you'd prune the model to its
    * top-k rows and broadcast it, turning scoring into a map-only
    * pass (the bounded-model shape of q42's IVF and q73's bloom). */
  def q90BigramLm(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 2)
      .persist()
    // populate the cache before its consumers race it (r16 — see
    // partGraph's e.count() rationale)
    docs.count()
    val bi = docs.select(col("doc_id"),
        explode(transform(slice(col("ts"), lit(1), size(col("ts")) - 1),
          (u, i) => struct(u.as("u"),
            element_at(col("ts"), i + lit(2)).as("v")))).as("b"))
      .select(col("doc_id"), col("b.u").as("u"), col("b.v").as("v"))
    val cuv = bi.groupBy("u", "v").agg(count(lit(1)).as("c_uv"))
    val cu = bi.groupBy("u").agg(count(lit(1)).as("c_u"))
    val vocab = docs.select(explode(col("ts")).as("tok"))
      .agg(countDistinct(col("tok")).as("vsz"))
    bi.join(cuv, Seq("u", "v"))
      .join(cu, Seq("u"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor((col("c_uv") + lit(1)).cast("double") /
          (col("c_u") + col("vsz")) * lit(1L << 40)).as("pf"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("pf")).as("sum_pf"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_pf"),
        f6(col("sum_pf") / lit((1L << 40).toDouble) / col("n_bigrams"))
          .as("avg_prob"))
      .orderBy("doc_id")
  }

  /** Fixed-window document chunking with overlap — the training-data
    * prep step that splits long documents into model-context-sized
    * pieces (window 128 chars, stride 96 → 32-char overlap so no
    * boundary context is lost). Chunk count = 1 + max(0,
    * ceil((n−W)/S)) in exact integer arithmetic (the ceil is a
    * double-floor over a <2^53 numerator — exact, per Graph.ldiv);
    * every chunk is one substr. MAP-ONLY: a per-row explode with no
    * shuffle anywhere — output stays partitioned like the input, which
    * is exactly what a 100 TB chunking pass needs (the token-based
    * variant composes tokens() into the same shape). Chunk content is
    * asserted via its md5 fingerprint + length, not the raw string. */
  def q91Chunking(s: SparkSession, dir: String): DataFrame = {
    val (w, st) = (128, 96)
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), greatest(lit(0L),
          floor((col("n") - lit(w) + lit(st) - 1).cast("double") / st))))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * st + 1).as("chunk_start"),
        col("text").substr((col("chunk_id") * st + 1).cast("int"),
          lit(w)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
        length(col("chunk")).cast("long").as("chunk_len"),
        graft.functions.Hashing.md5Long(col("chunk")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Sequence packing for LM pretraining — the concatenate-and-cut
    * formulation production pipelines actually use: per language, docs
    * are laid end-to-end in deterministic (doc_id) order and the token
    * stream is cut into fixed 2048-token context windows; each doc's
    * placement (stream offset, first/last window it lands in) is an
    * EXCLUSIVE prefix sum — one window shuffle, every value an exact
    * integer, bit-replayable in SQL. Greedy no-split bin packing is a
    * sequential recurrence (not expressible as a prefix sum); the
    * split-at-boundary variant is both the parallelizable one and the
    * one LM training uses. Scale: single sum-over-window per language;
    * when one language exceeds a task, the q68 two-phase shape applies
    * (range-partition the order key, per-bucket totals, broadcast the
    * bucket prefix offsets). */
  def q92SequencePack(s: SparkSession, dir: String): DataFrame = {
    val b = 2048
    val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("tok_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("tok_off"),
        floor(col("tok_off").cast("double") / b).as("seq_first"),
        floor((col("tok_off") + col("n_tokens") - 1).cast("double") / b)
          .as("seq_last"))
      .orderBy("lang", "doc_id")
  }

  /** Temperature-based source-mixture reweighting (α = 0.5) — the
    * domain-balancing step of pretraining data recipes: sampling
    * weight ∝ n_docs^α, flattening the source distribution so small
    * domains aren't drowned. sqrt is the ONE nonlinearity that is
    * oracle-safe — IEEE 754 requires it correctly rounded (ln/pow
    * carry no such guarantee, which is why q90 dropped the log) — and
    * the weights' denominator Σ√n is made order-independent by
    * quantizing each √n to 2^30 fixed point before the exact long sum.
    * Scale: one map-side-combinable aggregate + a 1-row broadcast. */
  def q93MixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val srcs = t(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
          .as("n_tokens"))
      .withColumn("sq_fixed",
        floor(sqrt(col("n_docs").cast("double")) * lit(1L << 30)))
    srcs.crossJoin(broadcast(srcs.agg(sum(col("sq_fixed")).as("tot_fixed"))))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        f6(col("sq_fixed").cast("double") / col("tot_fixed")).as("weight"),
        floor(lit(10000.0) * col("sq_fixed") / col("tot_fixed"))
          .as("epoch_draw"))
      .orderBy("source")
  }

  /** Repeated-span detection — the n-gram-hash formulation of exact
    * substring deduplication (the Lee et al. "Deduplicating Training
    * Data" op): every 8-token span occurring in ≥ 2 distinct
    * documents, with its document frequency and witness doc ids. One
    * hash-aggregate over per-doc-distinct spans. Scale: the shuffle
    * carries the distinct-span stream; at 100 TB a count-min prefilter
    * (q85's sketch) sheds the singleton spans — the vast majority —
    * before the exchange, false-positive-only so the exact aggregate
    * after stays exact; suffix arrays are the single-node alternative,
    * span hashing the cluster-native one. */
  def q94SpanDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(Dedup.shingles(col("text"), 8))).as("span"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy("span")

  /** SCD2 merge — the CDC upsert the reference's append-only ingestion
    * (K2) can't express: a change batch against a type-2 dimension
    * closes the changed rows (valid_to = batch date), opens their new
    * versions, and passes unchanged history through. ONE scan of the
    * joined frame: each row explodes into its 1 (unchanged) or 2
    * (close + open) output versions — no triple re-scan of the merge
    * join. The change batch is derived deterministically (every 10th
    * customer gets a revised segment). Scale: one key-co-partitioned
    * join (change batches are typically tiny → AQE broadcasts), union
    * preserved partitioning — the same join shape Delta MERGE lowers
    * to. Sentinel '9999-12-31' keeps valid_to non-null and the output
    * flat-sortable. */
  def q95Scd2Merge(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val base = cust.select(col("c_custkey").as("k"),
      col("c_mktsegment").as("addr"),
      lit("2024-01-01").as("valid_from"), lit("9999-12-31").as("valid_to"))
    val upd = cust.filter(col("c_custkey") % 10 === 3)
      .select(col("c_custkey").as("k"),
        concat(col("c_mktsegment"), lit(" rev2")).as("new_addr"))
    val row = struct(col("addr"), col("valid_from"), col("valid_to"))
    base.join(upd, Seq("k"), "left")
      .select(col("k"), explode(
        when(col("new_addr").isNotNull && col("new_addr") =!= col("addr"),
          array(
            struct(col("addr"), col("valid_from"),
              lit("2024-06-01").as("valid_to")),
            struct(col("new_addr").as("addr"),
              lit("2024-06-01").as("valid_from"),
              lit("9999-12-31").as("valid_to"))))
          .otherwise(array(row))).as("r"))
      .select(col("k"), col("r.addr").as("addr"),
        col("r.valid_from").as("valid_from"),
        col("r.valid_to").as("valid_to"),
        (col("r.valid_to") === "9999-12-31").as("is_current"))
      .orderBy("k", "valid_from")
  }

  /** Deterministic epoch shuffle — reproducible global training order
    * without RNG state: order = md5(seed:doc_id), sharded into 256
    * output files with a per-shard rank. The per-shard window
    * parallelizes (256 independent sorts) where a single global
    * row_number would serialize; at 100 TB the same two columns drive
    * a range-partitioned sorted write (sortedWrite) — no global window
    * needed, and a new seed is a new literal, not a new pipeline. */
  def q96EpochShuffle(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.Hashing.md5Long(
      concat(lit("42:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    t(s, dir, "documents").select(col("doc_id"), h.as("h"))
      .withColumn("shard", col("h") % 256)
      .withColumn("shard_rank", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "shard_rank")
      .orderBy("shard", "shard_rank")
  }

  /** Pipeline attrition report — the per-stage survivor counts every
    * production data pipeline publishes next to its output: cumulative
    * gates (length ≥ 100 chars → ≥ 20 words → alpha ratio ≥ 0.5 →
    * exact dedup) over ONE scan, each stage a conditional sum in the
    * same aggregate. The ratio compare is a single IEEE division —
    * deterministic without f6 because it's compared, not emitted.
    * Scale: one map-side-combinable aggregate; the exact-dedup count
    * is the one all-to-all term — at 100 TB swap countDistinct for the
    * q40 HLL (±2% on a report row) or the q27 two-phase distinct. */
  def q97Attrition(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("double").as("nchars"),
        length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
          .cast("double").as("nalpha"),
        size(split(trim(col("text")), "\\s+")).cast("double").as("nwords"))
      .withColumn("p1", col("nchars") >= 100)
      .withColumn("p2", col("p1") && col("nwords") >= 20)
      .withColumn("p3", col("p2") && col("nalpha") / col("nchars") >= 0.5)
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("p1"), 1L).otherwise(0L)).as("n_after_length"),
        sum(when(col("p2"), 1L).otherwise(0L)).as("n_after_words"),
        sum(when(col("p3"), 1L).otherwise(0L)).as("n_after_alpha"),
        countDistinct(when(col("p3"), col("text"))).as("n_after_dedup"))

  /** Snapshot diff — the reconciliation report between two versions of
    * a table (the read-side complement of q95's SCD2 write): one
    * full-outer join on the key classifies every row added / removed /
    * changed / unchanged, then a map-side-combinable count per class.
    * The B snapshot is derived deterministically (every 7th key
    * replaced by a new high key, every 5th repriced). Scale: ONE
    * co-partitioned full-outer join (AQE skew-handled) + a 4-group
    * aggregate — the shape every data-diff / backfill-audit job needs
    * at 100 TB; decimal compares are exact. */
  def q98SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val a = o.select(col("o_orderkey").as("k"),
      col("o_totalprice").as("va"))
    val b = o.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")).as("vb"))
      .unionByName(o.filter(col("o_orderkey") % 7 === 0)
        .select((col("o_orderkey") + lit(100000000L)).as("k"),
          col("o_totalprice").as("vb")))
    a.join(b, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("va").isNull, "added")
          .when(col("vb").isNull, "removed")
          .when(col("va") =!= col("vb"), "changed")
          .otherwise("unchanged").as("diff_class"))
      .groupBy("diff_class")
      .agg(count(lit(1)).as("n"), min("k").as("min_key"),
        max("k").as("max_key"))
      .orderBy("diff_class")
  }

  /** Cross-source span-overlap matrix — how much verbatim text each
    * pair of corpus domains shares (the between-domain contamination
    * view of q94's repeated spans): spans → the DISTINCT source set
    * per span (bounded by |sources|, a safe collect_set) → sorted
    * C(k,2) pair expansion (the partGraph trick — no span self-join,
    * whose output would be quadratic in per-span source count) → one
    * count per pair. Scale: the heavy shuffle is the span aggregate;
    * everything after operates on ≤ |sources|-wide rows. */
  def q99SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val sp = t(s, dir, "documents")
      .select(col("source"),
        explode(array_distinct(Dedup.shingles(col("text"), 8))).as("span"))
      .distinct()
    sp.groupBy("span")
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss"))), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
      .agg(count(lit(1)).as("n_shared_spans"))
      .orderBy("src_a", "src_b")
  }

  /** Incremental aggregate maintenance — merge a delta's PARTIAL
    * aggregate states into an existing rollup instead of recomputing
    * history: count/sum/max are algebraic, so agg(existing ⊎ delta) =
    * agg(agg-states unioned then re-aggregated). The oracle computes
    * the whole table in one pass and must hash-match the merged result
    * cell-for-cell — the correctness claim behind every incremental
    * materialized view. Decimal partials re-sum exactly (no double
    * drift between the two paths); the cast to double happens once, on
    * the final emit. Scale: history is never re-read — each refresh
    * touches delta rows + |groups| state rows, which is what makes
    * daily maintenance of a 100 TB rollup an O(delta) job. */
  def q100IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_shipdate"), col("l_quantity"), col("l_extendedprice"))
    def partial(df: DataFrame): DataFrame = df
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("s_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("s_price"),
        max(col("l_shipdate")).as("mx"))
    val existing = partial(li.filter(col("l_shipdate") < "1997-01-01"))
    val delta = partial(li.filter(col("l_shipdate") >= "1997-01-01"))
    existing.unionByName(delta)
      .groupBy("ship_month")
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("s_qty")).as("s_qty"),
        sum(col("s_price")).as("s_price"),
        max(col("mx")).as("mx"))
      .select(col("ship_month"), col("n_rows"),
        col("s_qty").cast("double").as("sum_qty"),
        col("s_price").cast("double").as("sum_price"),
        date_format(col("mx"), "yyyy-MM-dd").as("max_ship"))
      .orderBy("ship_month")
  }

  /** Data-quality constraint audit (the Deequ-shaped validation layer
    * an ingestion engine runs before publishing a load): completeness
    * (null keys), domain membership (order status), range (positive
    * totals), uniqueness (key duplicates), and referential integrity
    * (orders without a customer) — the first four are conditional sums
    * in ONE scan-level aggregate; uniqueness rides the same aggregate
    * as n_rows − countDistinct; RI is one anti-join count. Scale: the
    * single-pass block is map-side-combinable; countDistinct and the
    * anti join are the two all-to-all terms, both key-bounded (swap
    * HLL for the count at report precision if keys don't fit). */
  def q101ConstraintAudit(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    // audit policy: conversion events only, values capped at 400, and
    // users must resolve against the ACTIVE customer segment (every
    // 4th customer is modeled churned) — fixture data is clean by
    // construction, so the policy is what makes violations real; the
    // uniqueness check stays green, showing both audit outcomes
    val scan = e.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L))
        .as("null_user"),
      sum(when(!col("event_type").isin("click", "view", "purchase"), 1L)
        .otherwise(0L)).as("off_taxonomy"),
      sum(when(col("value") > 400.0, 1L).otherwise(0L))
        .as("over_cap"),
      (count(lit(1)) - countDistinct(col("event_id")))
        .as("dup_event_ids"))
    val orphans = e.join(t(s, dir, "customer")
        .filter(col("c_custkey") % 4 =!= 0)
        .select(col("c_custkey").as("user_id")), Seq("user_id"),
        "left_anti")
      .agg(count(lit(1)).as("churned_user_events"))
    scan.crossJoin(broadcast(orphans))
  }

  /** Last-touch attribution — each purchase credits the LATEST
    * click/view of the same user at-or-before it (ties inside one
    * timestamp resolve to the highest event id; purchases with no
    * prior touch credit 'none'): the marketing-attribution op, and the
    * as-of join's (q48) natural self-application. Same scale shape as
    * q48 — ONE (user, ts) shuffle+sort via the union trick, where the
    * naive formulation is a per-purchase correlated subquery (exactly
    * what the DuckDB oracle runs, since correctness there is free).
    * The rollup is a 3-row aggregate over the attributed stream. */
  def q102LastTouch(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("channel"))
    AsOf.asOfJoin(purchases, touches, Seq("user_id"), "ts", "ts",
        Seq("channel"), rightTieBreak = "event_id")
      .select(col("user_id"),
        coalesce(col("asof_channel"), lit("none")).as("channel"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("channel")
  }

  /** Association rules (market-basket support / confidence / lift)
    * over co-purchased parts — the classic recommendation mining op,
    * kept oracle-exact by being RATIO-only: confidence c_ab/c_a is one
    * IEEE division and lift (N·c_ab)/(c_a·c_b) one division of exact
    * long products (no log/PMI — ln isn't cross-engine reproducible,
    * same rationale as q90). Pair counts reuse the per-order C(k,2)
    * expansion (one groupBy + in-memory explode over ≤7-item baskets —
    * no lineitem self-join); a min-support filter (c_ab ≥ 3) prunes
    * the rule space before the two dimension joins. Scale: support
    * counting is map-side combinable; the pair aggregate is the one
    * big shuffle, bounded by Σ C(basket,2). */
  def q103AssociationRules(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val norders = li.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    val item = li.distinct()
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val pairs = li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 3)
    pairs
      .join(item.select(col("l_partkey").as("a"), col("c").as("c_a")),
        Seq("a"))
      .join(item.select(col("l_partkey").as("b"), col("c").as("c_b")),
        Seq("b"))
      .crossJoin(broadcast(norders))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        f6(col("c_ab").cast("double") / col("c_a")).as("confidence"),
        f6((col("n_orders") * col("c_ab")).cast("double") /
          (col("c_a") * col("c_b"))).as("lift"))
      .orderBy("a", "b")
  }

  /** Calendar gap-fill — materialize the missing (user, day) rows a
    * raw event stream never emits, so downstream time-series consumers
    * see a dense daily matrix: a generated 31-day scaffold cross-
    * joined with the (bounded) user dimension, left-joined to the
    * daily counts, zero-filled, plus a running cumulative per user.
    * The scaffold side is rows × days — generated, never shuffled at
    * width; the one exchange is the daily count aggregate (plus the
    * cumulative's per-user window). The date arithmetic stays in
    * integer day space (sequence of DATEs, formatted once on emit). */
  def q104GapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("user_id") % 10 === 0)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val daily = ev.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
    val users = ev.select("user_id").distinct()
    val cal = users.select(col("user_id"),
      explode(expr(
        "sequence(to_date('2024-01-01'), to_date('2024-01-31'))"))
        .as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    cal.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .withColumn("cum_events", sum(col("n_events")).over(w))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd")
        .as("day"), col("n_events"), col("cum_events"))
      .orderBy("user_id", "day")
  }

  /** Session path analysis — the top event-type SEQUENCES (first 5
    * steps, '>'-joined) across gap-split sessions: the "what do users
    * actually do" op next to q79's fixed funnel. Reuses q87's
    * sessionization (lag-flag + running sum on unix-micros); the path
    * string is built from a sort_array over (us, event_id, type)
    * structs, so step order is total even under tied timestamps. The
    * final top-20 window runs over the aggregated path table (small by
    * construction — path space, not session space), the q72 pattern.
    * Scale: two aggregates over the session shuffle; nothing holds a
    * whole user's history except the per-session collect, bounded by
    * the 30-min gap. */
  def q105SessionPaths(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val paths = ev.withColumn("new_s",
        when(lag(col("us"), 1).over(order).isNull ||
          col("us") - lag(col("us"), 1).over(order) > lit(1800000000L),
          lit(1)).otherwise(lit(0)))
      .withColumn("session_idx", sum(col("new_s")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(array_join(transform(slice(sort_array(collect_list(
        struct(col("us"), col("event_id"), col("event_type")))),
        1, 5), x => x.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
    // top-20 as TakeOrderedAndProject (q68's shape), rank derived over
    // the 20-row survivor set — not a global window over every path.
    val top = paths.orderBy(col("n_sessions").desc, col("path").asc)
      .limit(20)
    val w = Window.orderBy(col("n_sessions").desc, col("path").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("path"), col("n_sessions"), col("rank"))
      .orderBy("rank")
  }

  /** Rolling 7-day distinct users (the DAU/WAU op): RANGE-window
    * distinct doesn't exist in any engine, so each (day, user) pair is
    * EXPANDED to the 7 window-end days it contributes to and distinct-
    * counted per end day — the standard day-grain trick that turns
    * windowed distinct into a plain aggregate. Cost is 7× the DAILY
    * distinct pairs (already deduped — tiny vs the event stream), one
    * shuffle. Emitted alongside the same-day distinct for ratio
    * reading; first 6 days dropped (partial windows). */
  def q106RollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val ud = t(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val daily = ud.groupBy("day")
      .agg(countDistinct(col("user_id")).as("users_1d"))
    val rolling = ud
      .select(col("user_id"), col("day"),
        explode(sequence(lit(0), lit(6))).as("o"))
      .select(col("user_id"), date_add(col("day"), col("o")).as("day"))
      .groupBy("day").agg(countDistinct(col("user_id")).as("users_7d"))
    rolling.join(daily, Seq("day"))
      .filter(col("day").between("2024-01-07", "2024-01-30"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("users_1d"), col("users_7d"))
      .orderBy("day")
  }

  /** Volume anomaly detection — flag days whose event count exceeds
    * 2× the trailing 7-day mean, the monitoring rule every ingest
    * pipeline runs over its own throughput. The spike test is the
    * INTEGER inequality n·7 > 2·Σ₇ (no double threshold — boundary
    * days would hash-differently); the mean is emitted f6 for the
    * report. The global day window runs over the already-aggregated
    * daily table (≤ days rows — tiny by construction; the heavy
    * aggregate below it is map-side-combinable per day). First 7 days
    * skipped (no full baseline). */
  def q107AnomalyDays(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("day")).rowsBetween(-7, -1)
    daily
      .withColumn("t_sum", sum(col("n")).over(w))
      .withColumn("t_cnt", count(col("n")).over(w))
      .filter(col("t_cnt") === 7)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
        f6(col("t_sum").cast("double") / 7).as("trailing_avg"),
        (col("n") * 7 > col("t_sum") * 2).as("is_spike"))
      .orderBy("day")
  }

  /** Single-pass table statistics (the ANALYZE layer a cost-based
    * optimizer and every data catalog runs): min / max / distinct /
    * null-count for each numeric lineitem column in ONE scan-level
    * aggregate, unpivoted to a (column, stats) row per column — the
    * per-column profile q101's constraint audit reads thresholds from.
    * All counts exact longs; min/max emitted as doubles (the columns'
    * native type). Scale: one map-side-combinable pass for everything
    * except the ndv terms — per column, swap in HLL (q40) at catalog
    * precision when exact distincts don't fit. */
  def q108TableStats(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_partkey")
    val li = t(s, dir, "lineitem")
    val agg = li.agg(count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))): _*)
    agg.select(col("n_rows"), explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(s"min_$c").as("min_v"),
          col(s"max_$c").as("max_v"), col(s"ndv_$c").as("ndv"),
          col(s"null_$c").as("n_nulls"))): _*)).as("r"))
      .select(col("r.col_name").as("col_name"), col("n_rows"),
        col("r.min_v").as("min_v"), col("r.max_v").as("max_v"),
        col("r.ndv").as("ndv"), col("r.n_nulls").as("n_nulls"))
      .orderBy("col_name")
  }

  /** k-means over the embeddings corpus: 3 Lloyd rounds from
    * deterministic seeds, reporting per-cluster size, cohesion (mean
    * cosine to the final centroid) and the leading centroid
    * coordinates. The whole recurrence is quantized-integer arithmetic
    * (Similarity.kmeansStats), so DuckDB replays it bit-for-bit as
    * chained CTEs — an ITERATIVE ML training loop under the oracle
    * gate, like q82's PageRank. */
  def q109Kmeans(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val r = Similarity.kmeansStats(emb, "vec_id", "embedding",
      k = 8, rounds = 3)
    r.select(col("cell") +: col("n") +: (
      "mean_cos" +: (0 until 4).map(i => s"c$i")).map(c => f6(col(c)).as(c)): _*)
      .orderBy("cell")
  }

  /** Weighted PPS (probability-proportional-to-size) SYSTEMATIC sample:
    * per source, walk the docs in id order and pick the row whose
    * cumulative-weight interval crosses each multiple of total/n — the
    * deterministic, single-pass weighted sampler (vs q70's Bernoulli
    * and q81's priority top-k). Selection is INTEGER-exact:
    * (cum·n) DIV tw > ((cum−w)·n) DIV tw — no float thresholds, so any
    * engine reproduces the exact pick set. A row heavier than the
    * stride is picked once (pick = highest multiple covered), the
    * standard PPS certainty-unit behavior.
    *
    * Scale shape: one partitioned window cum-sum + a broadcast of the
    * per-source totals; the cum·n product needs log2(tw·n) bits — at
    * 100 TB with long weights move the multiply to decimal(38,0), or
    * split the dominant source by the two-pass per-partition-offset
    * prefix sum (q92's pattern) if one partition outgrows a task. */
  def q110PpsSample(s: SparkSession, dir: String): DataFrame = {
    val n = 32L
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
      coalesce(col("n_chars"), lit(0L)).as("w"))
    val tot = docs.groupBy("source").agg(sum(col("w")).as("tw"))
    val win = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("cum", sum(col("w")).over(win))
      .join(broadcast(tot), Seq("source"))
      .filter(col("tw") > 0)
      .withColumn("pick", expr(s"(cum * $n) DIV tw"))
      .filter(col("pick") > expr(s"((cum - w) * $n) DIV tw"))
      .select(col("doc_id"), col("source"), col("w"), col("pick"))
      .orderBy("source", "doc_id")
  }

  /** KMV sketch SET OPERATIONS: per-event-type audience sketches
    * (bounded k-min arrays, KmvMinsAgg) merged pairwise — union
    * estimate from the k smallest of the concatenation, intersection
    * via Beyer et al.'s ρ·est(∪) with ρ counted over shared mins —
    * against the exact |A∪B| / |A∩B| recounted from the data. The
    * estimates are md5-deterministic, so the oracle hash-matches them
    * exactly (unlike HLL, whose sketch no other engine reproduces).
    *
    * Scale shape: sketch build is one O(k)-state aggregate per type;
    * the pairwise merge runs over |types|² sketch ROWS (model-sized,
    * broadcast), never re-touching the data; the exact recount (the
    * verification half) is one distinct + one equi-join on user_id. */
  def q111KmvSetOps(s: SparkSession, dir: String): DataFrame = {
    val k = 32
    val ev = t(s, dir, "events")
      .select(col("event_type").as("t"), col("user_id").as("u"))
    val sides = Sketches.kmvMins(ev, Seq("t"), "u", k)
      .join(ev.groupBy("t").agg(countDistinct(col("u")).as("nd")), Seq("t"))
    val a = sides.select(col("t").as("type_a"), col("kmins").as("ma"),
      col("nd").as("nda"))
    val b = sides.select(col("t").as("type_b"), col("kmins").as("mb"),
      col("nd").as("ndb"))
    val pairs = a.join(broadcast(b), col("type_a") < col("type_b"))
      .withColumn("mu", slice(array_sort(array_union(col("ma"), col("mb"))),
        1, k))
      .withColumn("est_union", Sketches.kmvEstimate(col("mu"), k))
      .withColumn("ns", expr(
        "CAST(size(filter(mu, x -> array_contains(ma, x) " +
          "AND array_contains(mb, x))) AS BIGINT)"))
      .withColumn("est_intersect", expr(s"(ns * est_union) DIV $k"))
    val ut = ev.distinct()
    val xi = ut.as("x").join(ut.as("y"),
        col("x.u") === col("y.u") && col("x.t") < col("y.t"))
      .groupBy(col("x.t").as("type_a"), col("y.t").as("type_b"))
      .agg(count(lit(1)).as("exact_intersect"))
    pairs.join(xi, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("est_union"),
        col("est_intersect"),
        (col("nda") + col("ndb") - coalesce(col("exact_intersect"), lit(0L)))
          .as("exact_union"),
        coalesce(col("exact_intersect"), lit(0L)).as("exact_intersect"))
      .orderBy("type_a", "type_b")
  }

  /** Conversion funnel view → click → purchase with STRICT event-time
    * ordering per user (a click counts only after that user's first
    * view; a purchase only after that click). Three conditional-min
    * aggregates chained by co-partitioned user_id joins — one shuffle
    * key end to end. */
  def q79Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"), col("event_type"),
      col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ts") > col("v_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("ts") > col("c_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_view_click"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("n_full_funnel"))))
  }

  /** Weekly cohort retention: users bucketed by the Monday-truncated
    * week of their first event; n_active per (cohort, week offset).
    * Two aggregates and one user-keyed join — the classic retention
    * matrix with no driver-side loops. */
  def q80CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"), col("ts"))
    val first = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cw"))
    val active = ev.select(col("user_id"),
      date_trunc("week", col("ts")).cast("date").as("aw")).distinct()
    active.join(first, Seq("user_id"))
      .groupBy(col("cw"), ((datediff(col("aw"), col("cw")) / 7)
        .cast("int")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .select(col("cw").cast("string").as("cohort_week"),
        col("week_offset"), col("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Heavy hitters: exact top-10 tokens by raw frequency, computed via
    * the Misra–Gries candidate sketch + exact recount — the shuffle
    * carries O(capacity) candidate terms, not the vocabulary. The
    * oracle is the PLAIN exact top-10: the sketch must be
    * result-invisible (same contract as the bloom prefilter). */
  def q76HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
    HeavyHitters.topKByFrequency(toks, "term", 10)
      .orderBy("rank")
  }

  /** Approx distinct (HLL++) — the 100 TB replacement for exact counts.
    * The sketch value itself is engine-internal, so the gate emits a
    * portable assertion instead of a grey rows-only row: exact n /
    * n_users both engines compute, plus `approx_ok` = the HLL estimate
    * landing within ±20% of truth (default rsd 5% ⇒ always true unless
    * the sketch breaks; the oracle states TRUE). The exact countDistinct
    * exists for the bound check only — production uses the sketch. */
  def q40ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id")).as("approx"))
      .select(col("event_type"), col("n"), col("n_users"),
        (col("approx") >= col("n_users") * 0.8 &&
          col("approx") <= col("n_users") * 1.2).as("approx_ok"))
      .orderBy("event_type")

  /** IVF ANN top-k — the cell-partitioned alternative to q38's LSH
    * (deterministic sampled centroids, nprobe=4 of nlist=16 cells). */
  def q42KnnIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 10,
      nlist = 16, nprobe = 4)
      .withColumn("cos", f6(col("cos")))
      .orderBy("query_id", "rank")
  }

  /** As-of join: each event attached to the latest order (by
    * o_orderdate <= ts) of the matching customer — the point-in-time
    * operator, composed as one shuffle+sort (AsOf.asOfJoin) instead of
    * a range join that would plan as a nested loop. */
  def q48AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"), col("ts"),
      col("event_id"))
    val ord = t(s, dir, "orders").select(col("o_custkey").as("user_id"),
      col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
    AsOf.asOfJoin(ev, ord, Seq("user_id"), "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), rightTieBreak = "o_orderkey")
      .select(col("event_id"), col("user_id"), col("asof_o_orderkey"),
        col("asof_o_totalprice"))
      .orderBy("event_id")
  }

  /** Interval self-join: pairs of events of the same user within 10
    * minutes — bucketed range join (one hash shuffle), never a
    * nested-loop plan. */
  def q49RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val a = ev.select(col("user_id"), col("event_id").as("id_a"),
      col("ts").as("ts_a"))
    val b = ev.select(col("user_id"), col("event_id").as("id_b"),
      col("ts").as("ts_b"))
    RangeJoin.withinInterval(a, b, Seq("user_id"), "ts_a", "ts_b",
      toleranceUs = 600000000L)
      .where(col("id_a") < col("id_b"))
      .select(col("user_id"), col("id_a"), col("id_b"))
      .orderBy("id_a", "id_b")
  }

  /** Exact interpolated percentiles (the deterministic counterpart of
    * the approx sketch in q40; percentile() and DuckDB quantile_cont
    * share the type-7 definition). Flat scalar columns, f6-truncated:
    * interpolation arithmetic is engine-deterministic but not spec'd
    * bit-exact, so the 6-dp floor is the portable contract. */
  def q50Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      // ONE percentile buffer per group (the array form), flattened
      // above the aggregate — three scalar percentile() calls would
      // sort-buffer the group three times
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D))")
        .as("pq"))
      .select(col("l_returnflag"),
        f6(element_at(col("pq"), 1)).as("p50"),
        f6(element_at(col("pq"), 2)).as("p95"),
        f6(element_at(col("pq"), 3)).as("p99"))
      .orderBy("l_returnflag")

  /** BPE-ish subword token accounting (GPT-2-style pretokenizer regex,
    * identical under Java regex and RE2). */
  def q47BpeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.bpeTokens(col("text"))).as("n_bpe_tokens"),
        array_join(slice(TextAnalysis.bpeTokens(col("text")), 1, 5), "|")
          .as("head_tokens"))
      .orderBy("doc_id")

  /** SQL-API surface (spark.sql over registered views): TPC-H Q3-shaped
    * shipping-priority query — same decimal-exact arithmetic contract
    * as the DataFrame queries. */
  def q46SqlApi(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    s.sql("""
      SELECT l_orderkey,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
          AS revenue,
        o_orderdate
      FROM customer_v JOIN orders_v ON c_custkey = o_custkey
      JOIN lineitem_v ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1995-06-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1995-06-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""")
  }

  /** Embedding-cosine near-dup detection: the corpus is augmented with
    * 50 positively-scaled copies (cos = 1 up to rounding; same LSH
    * bucket in every table by sign-invariance), and the operator must
    * recover exactly those pairs above the 0.999 threshold. Scaling is
    * done in double (×1.5 of a float-exact value is exact), so cosine
    * is bit-identical in any engine. */
  def q45EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
    val planted = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x.cast("double") * 1.5).as("vec"))
    val corpus = base.unionByName(planted)
    Similarity.nearDupPairs(corpus, "vec_id", "vec", 64,
      threshold = 0.999, bits = 8, tables = 8)
      .withColumn("cos", f6(col("cos")))
      .orderBy("id_a", "id_b")
  }

  /** Multimodal frame sampling: payloads exploded into fixed-size
    * binary frames with md5 fingerprints (first 4 frames of 64 bytes). */
  def q44FrameSample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Multimodal.frameSample(
      Multimodal.withPayload(docs, "text", "doc_id"), "payload", "doc_id",
      frameSize = 64, maxFrames = 4)
      .orderBy("doc_id", "frame_idx")
  }

  /** The composed training-data prep pipeline — the end-to-end flow a
    * 100 TB corpus actually runs, chaining the individually-verified
    * stages: quality gate → language gate → content-fingerprint exact
    * dedup (canonical min-id) → MinHash-LSH near-dup removal (greedy:
    * drop the higher id of each candidate pair) → token accounting.
    * Every stage is a narrow projection or one hash-shuffle; nothing
    * collects to the driver. */
  def q43TrainingPipeline(s: SparkSession, dir: String): DataFrame = {
    // NOT repartitioned (r17, measured): spreading the single-row-group
    // scan over the full partition width before the text kernels (the
    // r16 wave-2 treatment) measured WORSE at 8 and 32 cores here —
    // the pipeline's ~4 s of serial text work is spread across six
    // narrow stages whose per-task fixed costs (first-wave codegen
    // compile under the KeyLock, bypass-writer file opens) exceed the
    // saved compute; q200/q322 won that trade only because their
    // serial stages were single BIG expressions.
    val docs = t(s, dir, "documents")
    val quality = TextAnalysis.withQuality(docs, "text")
      .filter(col("quality_score") >= 0.8)
    val lang = TextAnalysis.withLangId(quality, "text")
      .filter(col("lang_pred") === "en")
    val fp = TextAnalysis.withFingerprint(lang, "text")
    val keep = fp.groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    // exact is consumed three times (both sides of the LSH band
    // self-join + the final anti-join); persist it — at scale this is
    // the stage boundary a production pipeline would materialize to
    // storage anyway
    val exact = fp.join(keep, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nearDups = Dedup.minhashCandidates(exact, "text", "doc_id")
      .select(col("id_b").as("doc_id")).distinct()
    exact.join(nearDups, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("int").as("n_tokens"),
        col("quality_score"))
      .orderBy("doc_id")
  }

  /** A4/S4: the data-dictionary aggregation (reference
    * bin/ingestion/parse-data-dictionary.py:28-45) — per table, the
    * distinct column set plus the first non-null incremental reference.
    * The fixture has no dictionary file, so the dictionary shape is
    * derived from `events`; the aggregation family is the point:
    * collect_set (sorted for determinism) + first-non-null. The
    * reference's pandas `first non-null in file order` is made
    * deterministic as min_by over a FILTER(non-null) — first non-null
    * in event_id order. */
  def q41DataDictionary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type").as("table_name"),
        concat(lit("col_"), col("user_id") % 10).as("column_name"),
        when(col("value") > 150, col("ts")).as("incremental_reference"),
        col("event_id"))
      .groupBy("table_name")
      .agg(
        // sorted + "|"-joined: deterministic AND flat (comparator-safe)
        array_join(array_sort(collect_set(col("column_name"))), "|")
          .as("columns"),
        expr("min_by(incremental_reference, event_id) " +
          "FILTER (WHERE incremental_reference IS NOT NULL)")
          .as("incremental_reference"))
      .orderBy("table_name")

  /** Gaps-and-islands: consecutive-day activity streaks per user. The
    * island key is the classic date − row_number() offset — one window
    * sort inside the user_id partition, one aggregate, no self-join.
    * Both shuffles key on user_id, so the plan holds at any user count;
    * per-user row counts bound the window sort.
    */
  def q112GapsIslands(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    days
      .withColumn("grp", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("d")).as("streak_start"), max(col("d")).as("streak_end"),
        count(lit(1)).as("days"))
      .filter(col("days") >= 3)
      // dates emit as strings (registry convention: parquet DATE vs
      // DuckDB date round-trip as different pandas dtypes)
      .select(col("user_id"),
        date_format(col("streak_start"), "yyyy-MM-dd").as("streak_start"),
        date_format(col("streak_end"), "yyyy-MM-dd").as("streak_end"),
        col("days"))
      .orderBy("user_id", "streak_start")
  }

  /** PIVOT: order count + exact revenue per order-year, spread across
    * the status enum. The pivot value list is EXPLICIT — Spark skips
    * the distinct-collect pre-job and the plan is a single hash
    * aggregate on yr with 6 conditional slots (the same shape the
    * oracle writes as FILTER aggregates). Missing (year, status) cells
    * are pinned to 0/0.0 so both engines agree on absent combinations.
    */
  def q113Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_orderstatus"), col("o_totalprice"))
      .groupBy("yr").pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("rev"))
      .select(col("yr"),
        coalesce(col("F_cnt"), lit(0L)).as("f_cnt"),
        coalesce(col("F_rev"), lit(0.0)).as("f_rev"),
        coalesce(col("O_cnt"), lit(0L)).as("o_cnt"),
        coalesce(col("O_rev"), lit(0.0)).as("o_rev"),
        coalesce(col("P_cnt"), lit(0L)).as("p_cnt"),
        coalesce(col("P_rev"), lit(0.0)).as("p_rev"))
      .orderBy("yr")

  /** UNPIVOT/melt: the per-returnflag measure matrix flipped to long
    * form with Dataset.unpivot — ONE Expand over the 5-row aggregate,
    * not a UNION of re-aggregations (the oracle spells it as UNION ALL
    * over a shared CTE; Spark's Expand is the single-scan equivalent).
    */
  def q114Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy("l_returnflag")
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).cast("double").as("cnt"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("cnt")),
        "measure", "value")
      .orderBy("l_returnflag", "measure")

  /** Pareto frontier (skyline): parts minimizing price while maximizing
    * size. Two-phase: (1) distributed per-price max-size collapse —
    * same-price smaller-size rows are dominated inside the aggregate,
    * shrinking the input to |distinct prices| (a bounded price domain,
    * not row count); (2) a single ordered pass keeping rows whose size
    * beats the running max over all strictly-cheaper prices. The global
    * window runs over the collapsed domain only — the full-table scan
    * never sorts globally. The oracle proves the same frontier by the
    * O(n²) NOT EXISTS dominance definition — two independent
    * algorithms, one answer.
    */
  def q115Skyline(s: SparkSession, dir: String): DataFrame = {
    val best = t(s, dir, "part")
      .groupBy(col("p_retailprice").as("price"))
      .agg(max(col("p_size")).cast("long").as("size"))
    val w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    best.withColumn("mx", max(col("size")).over(w))
      .filter(col("mx").isNull || col("size") > col("mx"))
      .select(col("price"), col("size"))
      .orderBy("price")
  }

  /** Mode per group with a total tie order: the modal order priority of
    * each market segment (ties → lexicographically smallest priority).
    * The heavy work is the partially-aggregatable (segment, prio)
    * count; the argmax window then runs over ≤ |segments|·|priorities|
    * rows. Deterministic by construction — the (cnt desc, prio asc)
    * order is total.
    */
  def q116ModePerGroup(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("segment")
      .orderBy(col("cnt").desc, col("prio").asc)
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("segment"), col("prio").as("mode_priority"), col("cnt"))
      .orderBy("segment")
  }

  /** Equi-width histogram via pure floor-division binning — no
    * min/max pre-pass, no width_bucket dialect variance: bucket =
    * floor(price / 25000). Single map-side-combinable aggregate; bin
    * edges re-derived from the bucket id (exact double products).
    */
  def q117Histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(floor(col("o_totalprice") / lit(25000.0)).cast("long")
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .select(col("bucket"), (col("bucket") * lit(25000.0)).as("lo"),
        ((col("bucket") + lit(1L)) * lit(25000.0)).as("hi"), col("cnt"))
      .orderBy("bucket")

  /** Pearson correlation via EXACT integer moments — the portable
    * formulation of corr() (whose float running sums are merge-order-
    * dependent and can't cross-engine hash-match). Both inputs scale to
    * cents as exact integers; the five moments are exact sums (products
    * decimal-cast so a 100 TB sum can't wrap int64); the closed-form
    * corr is then ONE double expression over identical integers —
    * bit-identical in any engine, any partitioning. Single
    * map-side-combinable aggregate, one shuffle of 3 rows.
    */
  def q118CorrMoments(s: SparkSession, dir: String): DataFrame = {
    val ix = (col("l_quantity").cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val iy = (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val m = t(s, dir, "lineitem")
      .select(col("l_returnflag"), ix.as("ix"), iy.as("iy"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("ix").cast(DecimalType(38, 0))).cast("double").as("sx"),
        sum(col("iy").cast(DecimalType(38, 0))).cast("double").as("sy"),
        sum((col("ix") * col("ix")).cast(DecimalType(38, 0)))
          .cast("double").as("sxx"),
        sum((col("iy") * col("iy")).cast(DecimalType(38, 0)))
          .cast("double").as("syy"),
        sum((col("ix") * col("iy")).cast(DecimalType(38, 0)))
          .cast("double").as("sxy"))
    val nd = col("n").cast("double")
    val corr = (nd * col("sxy") - col("sx") * col("sy")) /
      (sqrt(nd * col("sxx") - col("sx") * col("sx")) *
        sqrt(nd * col("syy") - col("sy") * col("sy")))
    m.select(col("l_returnflag"), col("n"), f6(corr).as("corr"))
      .orderBy("l_returnflag")
  }

  /** Decile calibration table: ntile(10) of account balance inside each
    * market segment (tie-broken on custkey so the bucket assignment is
    * total-ordered → engine-independent), then per-decile count / min /
    * max / exact mean. One window sort per segment partition.
    */
  def q119DecileStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    t(s, dir, "customer")
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("c_mktsegment").as("segment"), col("decile"))
      .agg(count(lit(1)).as("cnt"), min(col("c_acctbal")).as("lo"),
        max(col("c_acctbal")).as("hi"),
        f6(dsum(col("c_acctbal")) / count(lit(1))).as("mean_bal"))
      .orderBy("segment", "decile")
  }

  /** Blocked fuzzy matching (entity-resolution shape): candidate pairs
    * come ONLY from equality on a blocking key (the name minus its low
    * 2 digits) — an equi-join, never an all-pairs cross — and the
    * edit-distance verify runs inside each bounded block. Output is the
    * per-name fuzzy-neighbor count. At any scale the cost is
    * Σ|block|², controlled by the key's granularity — same shape as the
    * LSH-bucketed near-dup verifies (q29/q51).
    */
  def q120FuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "customer")
      .select(col("c_name").as("name"),
        substring(col("c_name"), 1, 16).as("blk"))
    // threshold form early-exits the DP once distance exceeds 1 —
    // O(threshold·len) per pair instead of O(len²)
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") &&
          col("a.name") =!= col("b.name") &&
          levenshtein(col("a.name"), col("b.name"), 1) === 1)
      .groupBy(col("a.name").as("name"))
      .agg(count(lit(1)).as("n_fuzzy"))
      .orderBy("name")
  }

  /** Integer-exact EWMA over the daily revenue series of each order
    * priority: e_1 = x_1, e_t = (x_t + e_{t-1}) div 2 — an inherently
    * ORDER-DEPENDENT recurrence (no window frame expresses it), run as
    * a typed flatMapGroups fold over the day-sorted per-group series.
    * The heavy distributed work is the (prio, day) cents aggregate; the
    * fold's state is calendar-bounded (#days, not #rows), the same
    * bounded-group argument as q92's sequence packing. All arithmetic
    * is long integer, so the trajectory is bit-identical in any
    * engine — the oracle replays the recurrence as a recursive CTE.
    */
  def q121Ewma(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("prio"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("x"))
    // typed per-group fold (KeyValueGroupedDataset): O(days) per group
    // where the aggregate() HOF's copy-on-append accumulator was
    // O(days²) — 2.6s → ~0.5s at sf0.1. Scala Long '/' truncates toward
    // zero ≡ floor on these non-negative cents.
    import s.implicits._
    daily.select(col("prio"), col("day"), col("x"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (prio, it) =>
        val rows = it.toArray.sortBy(_._2)
        var e = 0L
        var first = true
        rows.iterator.map { case (_, day, x) =>
          e = if (first) { first = false; x } else (x + e) / 2
          (prio, day, e)
        }
      }
      .toDF("prio", "day", "ewma")
      .orderBy("prio", "day")
  }

  /** Corpus novelty: for each document, the fraction of its 3-word
    * shingles never seen in any LOWER-doc_id document — the
    * incremental-dedup metric a crawl pipeline tracks per batch
    * ("how much of this source is new?"). First-occurrence attribution
    * is a min(doc_id) aggregate per shingle (one shuffle on the shingle
    * key, map-side combinable), then a shingle-keyed join back —
    * never any doc-to-doc pairing. The ratio is two exact longs
    * divided once in double.
    */
  def q122Novelty(s: SparkSession, dir: String): DataFrame = {
    val sh = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(array_distinct(Dedup.shingles(col("text"), 3))).as("sh"))
    val first = sh.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, Seq("sh"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
      .withColumn("novelty", f6(col("n_novel").cast("double") /
        col("n_shingles").cast("double")))
      .orderBy("doc_id")
  }

  /** Quality-filter funnel with FIRST-failing-rule attribution: every
    * document lands in exactly one verdict bucket (the observability
    * report a filtering pipeline ships alongside its keep/drop
    * decision). One codegen'd CASE projection, one tiny aggregate —
    * zero joins, zero extra scans.
    */
  def q123FilterFunnel(s: SparkSession, dir: String): DataFrame = {
    val nonAlpha = length(regexp_replace(col("text"), "[A-Za-z ]", ""))
    val verdict = when(length(col("text")) < 100, "too_short")
      .when(length(col("text")) > 5000, "too_long")
      .when(nonAlpha * lit(10) > length(col("text")) * lit(3),
        "too_symbolic")
      .otherwise("pass")
    t(s, dir, "documents")
      .groupBy(col("source"), verdict.as("verdict"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("source", "verdict")
  }

  /** Best-of-cluster representative selection: q52's near-dup
    * components, but keeping the HIGHEST-QUALITY member (longest doc,
    * ties → smallest id) instead of the min-id canonical — the policy a
    * real dedup pipeline ships, where the survivor should be the best
    * exemplar, not an arbitrary one. The argmax is a row_number window
    * inside each component (bounded cluster sizes ⇒ bounded window
    * partitions); the component labels come from the same pointer-
    * doubling CC as q52.
    */
  def q124ClusterRep(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id")
    val comp = Dedup.connectedComponents(docs, "doc_id", pairs)
      .withColumnRenamed("id", "doc_id")
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
    val w = Window.partitionBy("component")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    comp.withColumn("rn", row_number().over(w))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"),
        max(when(col("rn") === 1, col("doc_id"))).as("rep_doc_id"),
        max(when(col("rn") === 1, col("n_chars"))).as("rep_n_chars"))
      .orderBy("component")
  }

  /** Supervised-dataset construction for next-event prediction: per
    * user-ordered event stream, (context of the last 4 event types,
    * label = the next one) — the tabular shape of next-token training
    * pairs. ALL five window functions share one (user_id, ts, event_id)
    * sort — a single exchange + sort in the plan; concat_ws drops the
    * leading NULLs so short prefixes keep their partial context.
    */
  def q125NextEventPairs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        concat_ws(">",
          lag(col("event_type"), 3).over(w),
          lag(col("event_type"), 2).over(w),
          lag(col("event_type"), 1).over(w),
          col("event_type")).as("context"),
        lead(col("event_type"), 1).over(w).as("label"))
      .filter(col("label").isNotNull)
      .orderBy("user_id", "event_id")
  }

  /** GROUP-level train/valid split with a leakage audit: the split key
    * is hash(user_id) — not hash(event_id) — so all of a user's events
    * land on one side (the grouped split that prevents correlated-
    * example leakage; q63 is the per-row variant). The audit column
    * counts users whose events appear in both splits, which is zero BY
    * CONSTRUCTION — and the oracle recomputes it from the raw events
    * rather than trusting the construction.
    */
  def q126GroupedSplit(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").withColumn("split",
      when(pmod(graft.functions.Hashing.md5Long(
        col("user_id").cast("string")), lit(100)) < 90, lit("train"))
        .otherwise(lit("valid")))
    val leak = ev.groupBy("user_id")
      .agg(countDistinct(col("split")).as("ns"))
      .agg(count(when(col("ns") > 1, 1)).as("leaked_users"))
    ev.groupBy("split")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .crossJoin(broadcast(leak))
      .select(col("split"), col("n_users"), col("n_events"),
        col("leaked_users"))
      .orderBy("split")
  }

  /** Multi-grain EXACT distinct users in one scan: GROUPING SETS
    * ((day), (), plus per-type) over count(DISTINCT) — a single Expand
    * feeding one aggregate, where the naive form is N scans + a union.
    * grouping() flags disambiguate the NULL grain markers.
    */
  def q127MultiGrainDistinct(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("user_id"))
      .createOrReplaceTempView("events_mg_v")
    s.sql("""
      SELECT day, event_type,
        CAST(grouping(day) AS INT) AS g_day,
        CAST(grouping(event_type) AS INT) AS g_type,
        count(DISTINCT user_id) AS n_users,
        count(*) AS n_events
      FROM events_mg_v
      GROUP BY GROUPING SETS ((day), (event_type), (day, event_type), ())
      ORDER BY g_day, g_type, day ASC NULLS FIRST,
        event_type ASC NULLS FIRST""")
  }

  /** Interval merge (overlap coalescing): each event opens a 5-minute
    * activity window per user; overlapping windows merge into maximal
    * sessions-by-overlap. A new island starts where the start exceeds
    * the running max of prior ends (cumulative-max window, one sort per
    * user partition) — never an interval self-join. Emits micros since
    * the fixtures' nanos timestamps exceed DuckDB's µs resolution
    * anyway; long arithmetic end to end.
    */
  def q128IntervalMerge(s: SparkSession, dir: String): DataFrame = {
    val horizon = 300000000L // 5 min in µs
    val ev = t(s, dir, "events")
      .select(col("user_id"),
        unix_micros(col("ts")).as("st"))
      .withColumn("en", col("st") + lit(horizon))
    val w = Window.partitionBy("user_id").orderBy("st")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("prev_max_end", max(col("en")).over(wPrev))
      .withColumn("new_island",
        when(col("prev_max_end").isNull ||
          col("st") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("st")).as("start_us"), max(col("en")).as("end_us"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "island")
  }

  /** Ratio-to-report: each nation's revenue as a share of its region's
    * total — a partition-window division, no second aggregate pass or
    * self-join. The share is two exact decimal-cents longs divided once
    * in double.
    */
  def q129RevenueShare(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("regionkey"),
        col("n_name").as("nation"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("cents"))
    val w = Window.partitionBy("regionkey")
    rev.withColumn("region_cents", sum(col("cents")).over(w))
      .select(col("regionkey"), col("nation"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        f6(col("cents").cast("double") /
          col("region_cents").cast("double")).as("share"))
      .orderBy("regionkey", "nation")
  }

  /** Chi-square independence statistic for (lang × source) — the
    * feature-association screen run before keeping a metadata column
    * as a sampling stratum. Observed counts are exact longs; expected
    * counts and the statistic are assembled in double with one fixed
    * expression (+,-,*,/ only — no libm calls whose rounding could
    * diverge across engines). Two tiny shuffles (cell counts, margins).
    */
  def q130ChiSquare(s: SparkSession, dir: String): DataFrame = {
    val cell = t(s, dir, "documents")
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
    val rowM = cell.groupBy("lang").agg(sum(col("o")).as("rm"))
    val colM = cell.groupBy("source").agg(sum(col("o")).as("cm"))
    val n = cell.agg(sum(col("o")).as("n"))
    val e = col("rm").cast("double") * col("cm").cast("double") /
      col("n").cast("double")
    cell.join(rowM, Seq("lang")).join(colM, Seq("source"))
      .crossJoin(broadcast(n))
      .select(col("lang"), col("source"), col("o"),
        f6(e).as("expected"),
        f6((col("o").cast("double") - e) * (col("o").cast("double") - e)
          / e).as("chi2_term"))
      .orderBy("lang", "source")
  }

  /** Degree assortativity of the part co-order graph — "do hub parts
    * co-occur with hubs?" — as the exact-moment Pearson correlation
    * (q118's machinery) over the per-orientation endpoint degrees.
    * Degrees are exact longs from one aggregate over the doubled edge
    * list; the two degree joins key on vertex id (broadcast or shuffle
    * by Spark's choice, both equi-joins). One double expression at the
    * end, so the coefficient is engine-exact.
    */
  def q131Assortativity(s: SparkSession, dir: String): DataFrame = {
    val (e, _, _) = partGraph(s, dir)
    val both = e.select(col("a").as("x"), col("b").as("y"))
      .unionByName(e.select(col("b").as("x"), col("a").as("y")))
    val deg = both.groupBy(col("x").as("v"))
      .agg(count(lit(1)).as("d"))
    val pairs = both
      .join(deg.select(col("v").as("x"), col("d").as("dx")), Seq("x"))
      .join(deg.select(col("v").as("y"), col("d").as("dy")), Seq("y"))
    val m = pairs.agg(count(lit(1)).as("n"),
      sum(col("dx").cast(DecimalType(38, 0))).cast("double").as("sx"),
      sum(col("dy").cast(DecimalType(38, 0))).cast("double").as("sy"),
      sum((col("dx") * col("dx")).cast(DecimalType(38, 0)))
        .cast("double").as("sxx"),
      sum((col("dy") * col("dy")).cast(DecimalType(38, 0)))
        .cast("double").as("syy"),
      sum((col("dx") * col("dy")).cast(DecimalType(38, 0)))
        .cast("double").as("sxy"))
    val nd = col("n").cast("double")
    val r = (nd * col("sxy") - col("sx") * col("sy")) /
      (sqrt(nd * col("sxx") - col("sx") * col("sx")) *
        sqrt(nd * col("syy") - col("sy") * col("sy")))
    m.select(col("n").as("n_pairs"), f6(r).as("assortativity"))
  }

  /** Class-balanced downsampling: cap every label at K examples, chosen
    * by portable hash rank (deterministic "random" without RNG state).
    * Runs through Skew.saltedTopK — two bounded window phases instead
    * of one row_number over a whole (possibly huge) label partition, so
    * no task ever holds a full class. Kept ids emit sorted+joined
    * (flat-schema contract).
    */
  def q132ClassCapSample(s: SparkSession, dir: String): DataFrame = {
    val k = 20
    val hashed = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        graft.functions.Hashing.md5Long(col("vec_id").cast("string"))
          .as("h"))
    Skew.saltedTopK(hashed, Seq("label"),
        Seq(col("h").asc, col("vec_id").asc), k, salt = 8,
        saltBy = Seq("vec_id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(array_sort(collect_list(col("vec_id").cast("string"))),
          "|").as("kept_ids"))
      .orderBy("label")
  }

  /** Shuffle-key skew report — the diagnostic run before picking a
    * join/partitioning strategy: rows-per-key distribution for
    * l_orderkey, bucketed by bit-length (a log2 histogram in pure
    * integer ops — no libm). Two map-side-combinable aggregates; the
    * per-key pre-agg is the only real shuffle. A 100 TB planner reads
    * this to decide salting (q59) vs AQE skew-join.
    */
  def q133SkewReport(s: SparkSession, dir: String): DataFrame = {
    val perKey = t(s, dir, "lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    perKey
      .groupBy(length(bin(col("n"))).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("rows"),
        min(col("n")).as("min_n"), max(col("n")).as("max_n"))
      .orderBy("bucket")
  }

  /** Wilson score intervals for the per-source quality pass rate —
    * the uncertainty-aware version of q123's funnel (a pass-rate from
    * 50 docs and one from 50k deserve different trust). k and n are
    * exact longs; the interval is one fixed double expression
    * (+,-,*,/,sqrt only — IEEE-identical in any engine).
    */
  def q134WilsonCi(s: SparkSession, dir: String): DataFrame = {
    val pass = length(col("text")) >= 100 && length(col("text")) <= 5000
    val agg = t(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), count(when(pass, 1)).as("k"))
    val nd = col("n").cast("double")
    val p = col("k").cast("double") / nd
    val z = lit(1.96)
    val z2 = z * z
    val center = p + z2 / (nd * lit(2.0))
    val half = z * sqrt(p * (lit(1.0) - p) / nd +
      z2 / (nd * nd * lit(4.0)))
    val denom = lit(1.0) + z2 / nd
    agg.select(col("source"), col("n"), col("k"),
        f6(p).as("pass_rate"),
        f6((center - half) / denom).as("ci_lo"),
        f6((center + half) / denom).as("ci_hi"))
      .orderBy("source")
  }

  /** Semi-structured extraction: the events' JSON props column parsed
    * with a SCHEMA'D from_json (a single codegen'd JsonToStructs —
    * not a per-field get_json_object re-parse), then numeric stats per
    * event type with a parse-failure tally (from_json yields NULL on
    * malformed input; count(k) vs count(*) surfaces it).
    */
  def q135JsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        from_json(col("props"), "k BIGINT",
          Map.empty[String, String]).as("p"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("p.k")).as("n_parsed"),
        min(col("p.k")).as("min_k"), max(col("p.k")).as("max_k"),
        sum(col("p.k")).as("sum_k"))
      .orderBy("event_type")

  /** k-anonymity audit over the quasi-identifier (segment, nation):
    * how many identity groups fall below k members, and how many rows
    * they expose — the privacy gate run before releasing a training
    * extract keyed on demographic-ish columns. One aggregate tree,
    * all exact longs.
    */
  def q136KAnonymity(s: SparkSession, dir: String): DataFrame = {
    val k = 10L
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
      .agg(lit(k).as("k"), count(lit(1)).as("n_groups"),
        count(when(col("n") < k, 1)).as("n_violating"),
        coalesce(sum(when(col("n") < k, col("n"))), lit(0L))
          .as("rows_at_risk"),
        min(col("n")).as("min_group"))
  }

  /** Shingle CONTAINMENT over the LSH candidate pairs — the asymmetric
    * companion to Jaccard (q31): |A∩B|/|A| catches "B contains all of
    * A" near-dups (quotes, excerpt pages) that symmetric similarity
    * scores dilute. The intersection join expands each candidate pair
    * by one side's shingles only (Σ|sh(A)| over candidates — bounded
    * by the LSH bucket caps, never corpus-quadratic).
    */
  def q137Containment(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id")
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(Dedup.shingles(col("text"), 3))).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(sh.withColumnRenamed("doc_id", "id_a"), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh")),
        Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sza")),
        Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("szb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("common"),
        f6(col("common").cast("double") / col("sza").cast("double"))
          .as("containment_a"),
        f6(col("common").cast("double") / col("szb").cast("double"))
          .as("containment_b"))
      .filter(col("containment_a") >= 0.9 || col("containment_b") >= 0.9)
      .orderBy("id_a", "id_b")
  }

  /** Exact weighted median (weights = quantity in cents): collapse to
    * per-value weight first (the window then runs over |distinct
    * values| per group, not row count), cumulative weight, smallest
    * value where 2·cum ≥ total. All longs until the emitted value;
    * no percentile-function dialect variance at all.
    */
  def q138WeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").as("v"),
        (col("l_quantity").cast(DecimalType(18, 2)) * lit(100))
          .cast("long").as("w"))
      .groupBy(col("l_returnflag"), col("v")).agg(sum(col("w")).as("w"))
    val w1 = Window.partitionBy("l_returnflag").orderBy("v")
    val tot = Window.partitionBy("l_returnflag")
    g.withColumn("cw", sum(col("w")).over(w1))
      .withColumn("tw", sum(col("w")).over(tot))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("v")).as("weighted_median"),
        max(col("tw")).as("total_weight"))
      .orderBy("l_returnflag")
  }

  /** Per-group OLS trend: daily revenue regressed on the day index —
    * "is this order priority growing?". Same exact-integer-moment
    * machinery as q118 (x = epoch day, y = cents, both longs; products
    * decimal-cast), closed-form slope/intercept as one double
    * expression — the distributed regression that needs no ML library
    * and no iterative solver.
    */
  def q139TrendSlope(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("prio"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("x"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("y"))
    val m = daily.groupBy("prio")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 0))).cast("double").as("sx"),
        sum(col("y").cast(DecimalType(38, 0))).cast("double").as("sy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0)))
          .cast("double").as("sxx"),
        sum((col("x") * col("y")).cast(DecimalType(38, 0)))
          .cast("double").as("sxy"))
    val nd = col("n").cast("double")
    val beta = (nd * col("sxy") - col("sx") * col("sy")) /
      (nd * col("sxx") - col("sx") * col("sx"))
    m.select(col("prio"), col("n").as("n_days"),
        f6(beta).as("slope_cents_per_day"),
        f6((col("sy") - beta * col("sx")) / nd).as("intercept_cents"))
      .orderBy("prio")
  }

  /** Point-in-time (temporal) join: orders resolved against a
    * VERSIONED dimension — each order must see the customer segment
    * that was valid ON ITS ORDER DATE, the lookup warehouses get wrong
    * when they join the current row. The versioned dim is derived
    * deterministically (every 3rd customer changes segment at
    * 1997-01-01); the join is an equi-join on custkey with the
    * validity-interval predicate as a post-join filter — pair count is
    * bounded by versions-per-key (2), never a range blowup.
    */
  def q140TemporalJoin(s: SparkSession, dir: String): DataFrame = {
    val cut = "1997-01-01"
    val c = t(s, dir, "customer")
    // version 1: original segment, valid (-inf, cut); version 2:
    // switchers get segment 'MACHINERY', valid [cut, +inf)
    val v1 = c.select(col("c_custkey"), col("c_mktsegment").as("segment"),
      lit("0001-01-01").as("eff_from"), lit(cut).as("eff_to"))
    val v2 = c.select(col("c_custkey"),
      when(col("c_custkey") % 3 === 0, lit("MACHINERY"))
        .otherwise(col("c_mktsegment")).as("segment"),
      lit(cut).as("eff_from"), lit("9999-12-31").as("eff_to"))
    val dim = v1.unionByName(v2)
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
    o.join(dim, col("o_custkey") === col("c_custkey") &&
        col("od") >= col("eff_from") && col("od") < col("eff_to"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy("segment")
  }

  /** Cohen's kappa between two deterministic document classifiers
    * (length-band vs digit-density) — the agreement-beyond-chance
    * metric an annotation pipeline reports before trusting auto-labels.
    * The confusion counts are exact longs from ONE scan; kappa =
    * (po − pe)/(1 − pe) is one double expression over them.
    */
  def q141CohensKappa(s: SparkSession, dir: String): DataFrame = {
    val a = (length(col("text")) >= 500).cast("int") // classifier A
    val nDigits = length(col("text")) -
      length(regexp_replace(col("text"), "[0-9]", ""))
    val b = (nDigits * lit(50) < length(col("text"))).cast("int") // B
    val m = t(s, dir, "documents")
      .select(a.as("a"), b.as("b"))
      .agg(count(lit(1)).as("n"),
        count(when(col("a") === col("b"), 1)).as("agree"),
        count(when(col("a") === 1, 1)).as("a1"),
        count(when(col("b") === 1, 1)).as("b1"))
    val nd = col("n").cast("double")
    val po = col("agree").cast("double") / nd
    val pe = (col("a1").cast("double") / nd) *
      (col("b1").cast("double") / nd) +
      ((nd - col("a1").cast("double")) / nd) *
        ((nd - col("b1").cast("double")) / nd)
    // the global agg emits ONE row even on empty input (n=0) — and
    // Spark 4's ANSI mode makes the 0/0 a runtime error, not a NaN —
    // so the ratios are guarded (null on n=0 / degenerate pe)
    m.select(col("n"), col("agree"), col("a1"), col("b1"),
      when(col("n") > 0, f6(po)).as("po"),
      when(col("n") > 0, f6(pe)).as("pe"),
      when(col("n") > 0 && pe =!= lit(1.0),
        f6((po - pe) / (lit(1.0) - pe))).as("kappa"))
  }

  /** RFM segmentation: per-customer Recency/Frequency/Monetary scores
    * as quintiles (exact ntile(5) semantics with total tie orders),
    * composed into a 3-digit segment code, then segment population
    * counts. The quintiles come from [[Ranking.globalNtile]] — three
    * distributed range-partition sorts over |customers| — never an
    * unpartitioned ntile window (one task holding every customer is
    * the plan that does not finish at 100×). The classic
    * behavioral-segmentation op, fully deterministic.
    */
  def q142RfmSegments(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("last_od"),
        count(lit(1)).as("freq"),
        sum((col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
          .cast("long")).as("cents"))
    def q(d: DataFrame, c: Column, tile: String) = Ranking.globalNtile(
      d, Seq(c.desc, col("o_custkey").asc), 5, tile)
    val scored = // recent/frequent/high-spend = 1
      q(q(q(per, col("last_od"), "r"), col("freq"), "f"), col("cents"), "m")
    scored
      .groupBy((col("r") * 100 + col("f") * 10 + col("m")).cast("long")
        .as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).cast("double").as("cents_sum"))
      .orderBy("segment")
  }

  /** Time-to-convert: per user, µs between the FIRST view and the
    * first subsequent purchase; the distribution summarized with exact
    * discrete percentiles (long µs end to end — no interval types, no
    * float durations). Two min-aggregates on user_id, one bounded
    * percentile pass over |converted users|.
    */
  def q143TimeToConvert(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("us") >= col("v_us"))
      .groupBy("user_id").agg(min(col("us") - col("v_us")).as("dt_us"))
    conv.agg(count(lit(1)).as("n_converted"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dt_us)")
        .cast("long").as("p50_us"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY dt_us)")
        .cast("long").as("p95_us"),
      max(col("dt_us")).as("max_us"))
  }

  /** Survivorship (MDM record merge): consolidate each user's event
    * stream into one golden record where every FIELD independently
    * takes its latest NON-NULL value — the per-attribute recency rule
    * entity-resolution pipelines apply after matching. Field nulls are
    * derived deterministically (purchase-only values; k dropped when
    * ≡0 mod 7). One ranked window per field over only that field's
    * non-null rows, then left-joins back to the user spine — never a
    * whole-stream collect per user.
    */
  def q144Survivorship(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"),
        when(col("event_type") === "purchase", col("value"))
          .as("purchase_value"),
        { // one schema'd parse (q135's rule); CSE collapses the reuse
          val k = from_json(col("props"), "k BIGINT",
            Map.empty[String, String]).getField("k")
          when(k % 7 =!= 0, k).as("k")
        })
    def latest(field: String) = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("us").desc, col("event_id").desc)
      base.filter(col(field).isNotNull)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col(field))
    }
    base.groupBy("user_id").agg(count(lit(1)).as("n_updates"))
      .join(latest("purchase_value"), Seq("user_id"), "left")
      .join(latest("k"), Seq("user_id"), "left")
      .select(col("user_id"), col("n_updates"), col("purchase_value"),
        col("k").as("last_k"))
      .orderBy("user_id")
  }

  /** Dataset datasheet ("data card"): the one-row-per-source summary a
    * corpus release ships — volume, language spread, exact-dup rate
    * (md5 content hash), short-doc share, mean length. ONE scan, all
    * exact integers plus two guarded ratios.
    */
  def q145Datasheet(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_exact_dups"),
        count(when(length(col("text")) < 100, 1)).as("n_short"))
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("n_langs"), col("n_exact_dups"),
        f6(col("n_exact_dups").cast("double") /
          col("n_docs").cast("double")).as("dup_rate"),
        f6(col("total_chars").cast("double") /
          col("n_docs").cast("double")).as("mean_chars"),
        col("n_short"))
      .orderBy("source")

  /** Deterministic curriculum interleave: rank documents inside each
    * source by a difficulty proxy (length asc, id tiebreak), then
    * round-robin the sources — global position (within_rank, source)
    * — so every training prefix sees all sources in fixed proportion.
    * Both ranks are scale-safe: within_rank from [[Ranking.groupRanks]]
    * (sources are FEW, so a per-source window is one task per source
    * holding millions of rows — the same funnel as a global window),
    * position from [[Ranking.globalIndex]] over the tie-free
    * (within_rank, source, doc_id) key.
    */
  def q146Curriculum(s: SparkSession, dir: String): DataFrame = {
    val ranked = Ranking.groupRanks(
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars")),
      "source", Seq("n_chars", "doc_id"), "within_rank", "_ng")
      .drop("_ng")
    Ranking.globalIndex(ranked,
        Seq("within_rank", "source", "doc_id"), "_pidx")
      .withColumn("position", col("_pidx") + lit(1L))
      .select("position", "doc_id", "source", "within_rank")
      .orderBy("position")
  }

  /** Shard-balance audit for the q96 epoch shuffle: per-shard counts
    * plus the max/min balance ratio — the check a sharded training run
    * does before trusting hash assignment (a skewed shard becomes the
    * epoch's straggler). Exact longs; one aggregate over the hash
    * projection, one 256-row summary.
    */
  def q147ShardBalance(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.Hashing.md5Long(
      concat(lit("42:"), col("doc_id").cast("string")))
    val per = t(s, dir, "documents")
      .select((h % 256).as("shard"))
      .groupBy("shard").agg(count(lit(1)).as("n"))
    per.agg(count(lit(1)).as("n_shards"),
      min(col("n")).as("min_n"), max(col("n")).as("max_n"),
      sum(col("n")).as("total"),
      f6(max(col("n")).cast("double") / min(col("n")).cast("double"))
        .as("balance_ratio"))
  }

  /** Epoch decorrelation: Spearman rank correlation between two seeded
    * epoch orderings of the same corpus — near 0 proves the reshuffle
    * actually decorrelates batch composition across epochs. Ranks are
    * exact longs (md5-seeded total orders), so Spearman reduces to
    * q118's exact-moment Pearson over (rank₁, rank₂) — bit-identical
    * cross-engine where a float rank correlation wouldn't be.
    */
  def q148EpochDecorrelation(s: SparkSession, dir: String): DataFrame = {
    // epoch ranks via two Ranking.globalIndex range-partition sorts
    // over the tie-broken (hash, doc_id) keys — never an unpartitioned
    // row_number window over the whole corpus.
    def hashFor(seed: Int) = graft.functions.Hashing.md5Long(
      concat(lit(s"$seed:"), col("doc_id").cast("string")))
    val hashed = t(s, dir, "documents").select(col("doc_id"))
      .withColumn("_h1", hashFor(42))
      .withColumn("_h2", hashFor(43))
    val ranked = Ranking.globalIndex(
        Ranking.globalIndex(hashed, Seq("_h1", "doc_id"), "_i1"),
        Seq("_h2", "doc_id"), "_i2")
      .select(col("doc_id"), (col("_i1") + lit(1L)).as("r1"),
        (col("_i2") + lit(1L)).as("r2"))
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(col("r1").cast(DecimalType(38, 0))).cast("double").as("sx"),
      sum(col("r2").cast(DecimalType(38, 0))).cast("double").as("sy"),
      sum((col("r1") * col("r1")).cast(DecimalType(38, 0)))
        .cast("double").as("sxx"),
      sum((col("r2") * col("r2")).cast(DecimalType(38, 0)))
        .cast("double").as("syy"),
      sum((col("r1") * col("r2")).cast(DecimalType(38, 0)))
        .cast("double").as("sxy"))
    val nd = col("n").cast("double")
    val rho = (nd * col("sxy") - col("sx") * col("sy")) /
      (sqrt(nd * col("sxx") - col("sx") * col("sx")) *
        sqrt(nd * col("syy") - col("sy") * col("sy")))
    m.select(col("n").as("n_docs"), f6(rho).as("spearman_rho"),
      (abs(rho) < lit(0.1)).as("decorrelated"))
  }

  /** Median absolute deviation — the robust spread statistic outlier
    * filters should use instead of stddev (one corrupt row can't move
    * it). Two discrete-percentile passes per group: the median, then
    * the median of |x − median| over a broadcast-joined bound. Cents
    * arithmetic keeps |x − m| exact; percentile_disc picks actual data
    * values, so no cross-engine interpolation.
    */
  def q149Mad(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val o = t(s, dir, "orders")
      .select(col("o_orderpriority").as("prio"), cents.as("c"))
    val med = o.groupBy("prio")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
        .cast("long").as("m"))
    o.join(broadcast(med), Seq("prio"))
      .select(col("prio"), col("m"), abs(col("c") - col("m")).as("d"))
      .groupBy("prio")
      .agg(max(col("m")).as("median_cents"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY d)")
          .cast("long").as("mad_cents"),
        count(lit(1)).as("n"))
      .orderBy("prio")
  }

  /** Winsorized mean: clamp each value into its group's [p05, p95]
    * band, then take the exact mean — the robust average that keeps
    * outlier rows (unlike a trim) but caps their leverage. Discrete
    * bounds broadcast back; the clamped sum stays exact long cents.
    */
  def q150WinsorizedMean(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val o = t(s, dir, "orders")
      .select(col("o_orderpriority").as("prio"), cents.as("c"))
    val bounds = o.groupBy("prio")
      .agg(expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY c)")
        .cast("long").as("lo"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY c)")
          .cast("long").as("hi"))
    o.join(broadcast(bounds), Seq("prio"))
      .select(col("prio"),
        greatest(col("lo"), least(col("hi"), col("c"))).as("w"))
      .groupBy("prio")
      .agg(count(lit(1)).as("n"),
        f6(sum(col("w")).cast("double") / count(lit(1)).cast("double") /
          lit(100.0)).as("winsorized_mean"))
      .orderBy("prio")
  }

  /** Benford first-digit audit over order totals — the cheap fraud /
    * synthetic-data screen: observed count and share per leading
    * digit. Digit extraction is pure string arithmetic on the integer
    * part (no logs); shares are guarded exact-long ratios.
    */
  def q151Benford(s: SparkSession, dir: String): DataFrame = {
    val digit = substring(floor(col("o_totalprice")).cast("long")
      .cast("string"), 1, 1)
    val per = t(s, dir, "orders")
      .filter(col("o_totalprice") >= 1.0)
      .groupBy(digit.as("first_digit"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy()
    per.withColumn("share",
        f6(col("n").cast("double") / sum(col("n")).over(tot).cast("double")))
      .orderBy("first_digit")
  }

  /** Schema-evolution union: merge a v1 snapshot (no props field) with
    * a v2 snapshot (adds the parsed k) via unionByName(allowMissing
    * Columns) — the absent column null-fills instead of failing or
    * silently aligning by position. The aggregate then shows exactly
    * which share of each type carries the new field — the check run
    * after every schema migration.
    */
  def q152SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val v1 = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("event_type"))
    val v2 = ev.filter(col("event_id") % 2 =!= 0)
      .select(col("event_id"), col("event_type"),
        from_json(col("props"), "k BIGINT", Map.empty[String, String])
          .getField("k").as("k"))
    v1.unionByName(v2, allowMissingColumns = true)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"))
      .orderBy("event_type")
  }

  /** Structured field parsing with a consistency audit: the customer
    * id embedded in c_name ('Customer#NNNNNNNNN') regex-extracted and
    * cross-checked against c_custkey — the referential sanity pass an
    * ingestion pipeline runs on denormalized string keys. One codegen'd
    * projection + one tiny aggregate.
    */
  def q153RegexParse(s: SparkSession, dir: String): DataFrame = {
    val parsed = regexp_extract(col("c_name"), "^Customer#(\\d+)$", 1)
    t(s, dir, "customer")
      .select(col("c_custkey"),
        when(parsed =!= "", parsed.cast("long")).as("parsed_id"))
      .agg(count(lit(1)).as("n"),
        count(col("parsed_id")).as("n_parsed"),
        count(when(col("parsed_id") === col("c_custkey"), 1))
          .as("n_consistent"),
        count(when(col("parsed_id").isNull ||
          col("parsed_id") =!= col("c_custkey"), 1)).as("n_bad"))
  }

  /** CUPED variance-reduced experiment readout: users hash-split into
    * A/B; the outcome (post-period event value) is adjusted by the
    * pre-period covariate, y' = y − θ(x − x̄) with θ = cov(x,y)/var(x)
    * pooled across arms — the standard trick that shrinks experiment
    * confidence intervals with zero bias. Sums are exact value-cents
    * longs per user; θ and the adjusted means are one double closed
    * form — bit-identical cross-engine like q118/q139.
    */
  def q154Cuped(s: SparkSession, dir: String): DataFrame = {
    val cut = Timestamp.valueOf("2024-01-16 00:00:00")
    val per = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(sum(when(col("ts") < cut,
          (col("value").cast(DecimalType(18, 2)) * lit(100)).cast("long"))
          .otherwise(lit(0L))).as("x"),
        sum(when(col("ts") >= cut,
          (col("value").cast(DecimalType(18, 2)) * lit(100)).cast("long"))
          .otherwise(lit(0L))).as("y"))
      .withColumn("arm",
        when(pmod(graft.functions.Hashing.md5Long(
          col("user_id").cast("string")), lit(2)) === 0, "A")
          .otherwise("B"))
    // pooled θ from exact moments (decimal-cast products)
    val mom = per.agg(count(lit(1)).as("n"),
      sum(col("x").cast(DecimalType(38, 0))).cast("double").as("sx"),
      sum(col("y").cast(DecimalType(38, 0))).cast("double").as("sy"),
      sum((col("x") * col("x")).cast(DecimalType(38, 0)))
        .cast("double").as("sxx"),
      sum((col("x") * col("y")).cast(DecimalType(38, 0)))
        .cast("double").as("sxy"))
    val nd = col("n").cast("double")
    val theta = (nd * col("sxy") - col("sx") * col("sy")) /
      (nd * col("sxx") - col("sx") * col("sx"))
    val xbar = col("sx") / nd
    val arms = per.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast(DecimalType(38, 0))).cast("double").as("ax"),
        sum(col("y").cast(DecimalType(38, 0))).cast("double").as("ay"))
    arms.crossJoin(broadcast(mom))
      .select(col("arm"), col("n_users"),
        f6(col("ay") / col("n_users").cast("double") / lit(100.0))
          .as("raw_mean"),
        f6((col("ay") / col("n_users").cast("double") -
          theta * (col("ax") / col("n_users").cast("double") - xbar)) /
          lit(100.0)).as("cuped_mean"))
      .orderBy("arm")
  }

  /** TPC-H Q3 (shipping priority), adapted to the fixture schema
    * (o_orderpriority stands in for ship priority): segment-filtered
    * customers ⋈ open orders ⋈ not-yet-shipped lineitems, revenue =
    * exact decimal Σ price·(1−disc), top 10. Customer side broadcasts;
    * the l⋈o join shuffles on orderkey; the top-10 is
    * TakeOrderedAndProject, never a global sort materialization.
    */
  def q155TpchQ3(s: SparkSession, dir: String): DataFrame = {
    val cut = "1997-06-15"
    val c = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd") < cut)
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_od"),
        col("o_orderpriority"))
    val l = t(s, dir, "lineitem")
      .filter(date_format(col("l_shipdate"), "yyyy-MM-dd") > cut)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) -
            col("l_discount").cast(DecimalType(18, 2)))).as("rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_od"), col("o_orderpriority"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q10 (returned-item reporting): customers ranked by revenue
    * lost to returns in a quarter — returnflag='R' lineitems ⋈ orders
    * ⋈ customer ⋈ nation, exact decimal revenue, top 20. The nation
    * dim broadcasts; aggregation keys on the customer.
    */
  def q156TpchQ10(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) -
            col("l_discount").cast(DecimalType(18, 2)))).as("rev"))
    val o = t(s, dir, "orders")
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd") >= "1997-01-01"
        && date_format(col("o_orderdate"), "yyyy-MM-dd") < "1997-04-01")
      .select(col("o_orderkey"), col("o_custkey"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_mktsegment"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** BAG-semantics set operations — the multiplicity-preserving
    * variants q19/q20's distinct set ops leave out: a customer with 3
    * orders in 1995 and 1 in 1996 survives EXCEPT ALL twice.
    * Spark's exceptAll/intersectAll plan as count-balancing aggregates
    * + generate (no row-pairing join); emitted as per-key surviving
    * multiplicities.
    */
  def q157BagSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val y1995 = o.filter(year(col("o_orderdate")) === 1995)
      .select("o_custkey")
    val y1996 = o.filter(year(col("o_orderdate")) === 1996)
      .select("o_custkey")
    val ex = y1995.exceptAll(y1996).groupBy("o_custkey")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    val in = y1995.intersectAll(y1996).groupBy("o_custkey")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    ex.unionByName(in)
      .select(col("op"), col("o_custkey"), col("n"))
      .orderBy("op", "o_custkey")
  }

  /** Week-over-week revenue report: weekly exact cents, the previous
    * week via lag over ONE ordered pass, delta and guarded percent
    * change — the reporting shape behind every growth dashboard
    * (q107's anomaly score is its alerting sibling).
    *
    * The week key is the ISO week's MONDAY as a date string, not
    * year()+weekofyear(): pairing calendar year with ISO week number
    * mislabels late-December dates that fall in ISO week 1 of the next
    * year (1997-12-29 is "1997-W01" under the naive formula, merging it
    * with early January) — the exact Jan-1-in-week-52/53 edge Prep's
    * partition-string convention documents.
    */
  def q158WowReport(s: SparkSession, dir: String): DataFrame = {
    val weekly = t(s, dir, "orders")
      .filter(year(col("o_orderdate")) === 1997)
      .groupBy(date_format(date_trunc("week", col("o_orderdate")),
        "yyyy-MM-dd").as("wk"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("cents"))
    val w = Window.orderBy("wk")
    weekly.withColumn("prev", lag(col("cents"), 1).over(w))
      .select(col("wk"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        (col("prev").cast("double") / lit(100.0)).as("prev_revenue"),
        when(col("prev").isNotNull && col("prev") =!= 0,
          f6((col("cents") - col("prev")).cast("double") /
            col("prev").cast("double"))).as("wow_change"))
      .orderBy("wk")
  }

  /** NOT IN with a NULL in the subquery — the ANSI three-valued-logic
    * corner engines must agree on: one NULL in the list makes every
    * NOT IN row UNKNOWN (filtered), so the "nulled" branch returns 0
    * rows while the null-free branch anti-joins normally. Spark plans
    * this as a null-aware anti join; the query pins BOTH branches so a
    * future planner change can't silently flip the semantics.
    */
  def q159NotInNull(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("o_nin_v")
    t(s, dir, "customer").createOrReplaceTempView("c_nin_v")
    s.sql("""
      SELECT 'with_null' AS variant, count(*) AS n FROM o_nin_v
      WHERE o_custkey NOT IN
        (SELECT nullif(c_custkey, 7) FROM c_nin_v WHERE c_custkey < 100)
      UNION ALL
      SELECT 'no_null', count(*) FROM o_nin_v
      WHERE o_custkey NOT IN
        (SELECT c_custkey FROM c_nin_v
         WHERE c_custkey < 100 AND c_custkey <> 7)
      ORDER BY variant""")
  }

  /** Correlated scalar subquery — written in the correlated FORM so
    * Catalyst's decorrelation rewrite (subquery → aggregate + join) is
    * exercised, then histogrammed: how many orders have k lineitems.
    * The plan guard asserts the rewrite produced an equi-join, not a
    * per-row nested loop.
    */
  def q160CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("o_csq_v")
    t(s, dir, "lineitem").createOrReplaceTempView("l_csq_v")
    s.sql("""
      SELECT k, count(*) AS n_orders FROM (
        SELECT o_orderkey,
          (SELECT count(*) FROM l_csq_v WHERE l_orderkey = o_orderkey)
            AS k
        FROM o_csq_v)
      GROUP BY k ORDER BY k""")
  }

  /** LATERAL correlated derived table — per-customer top-2 orders
    * written in the LATERAL form (the SQL shape analysts reach for
    * before window functions): Spark plans the correlated LIMIT
    * subquery as a LateralJoin → rank rewrite, and both engines must
    * agree on the per-key ordering (total tie order pinned). Restricted
    * to one segment so the emitted pair list stays review-sized.
    */
  def q161LateralTopk(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("o_lat_v")
    t(s, dir, "customer").createOrReplaceTempView("c_lat_v")
    s.sql("""
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM (SELECT c_custkey FROM c_lat_v
            WHERE c_mktsegment = 'MACHINERY' AND c_custkey % 10 = 0) c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM o_lat_v o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY c.c_custkey, t.o_orderkey""")
  }

  /** Id-sequence gap detection: ranges missing from the event_id
    * space (the completeness check a CDC/ingest pipeline runs to
    * prove nothing was dropped). The adjacent-id lead comes from
    * [[Ranking.leadKey]] — range-bucketed per-bucket lead with
    * boundary stitching, never an unpartitioned window holding every
    * id in one task; emitted as (gap_start, gap_end) ranges so a
    * million-id hole is one row, not a million.
    */
  def q162IdGaps(s: SparkSession, dir: String): DataFrame = {
    // synthesize holes deterministically: drop ids ≡ 0 (mod 97)
    val ids = t(s, dir, "events")
      .filter(col("event_id") % 97 =!= 0)
      .select(col("event_id").as("id"))
    Ranking.leadKey(ids, "id", "nxt")
      .filter(col("nxt").isNotNull && col("nxt") - col("id") > 1)
      .select((col("id") + 1).as("gap_start"),
        (col("nxt") - 1).as("gap_end"),
        (col("nxt") - col("id") - 1).as("missing"))
      .orderBy("gap_start")
  }

  /** Rank-migration (decile transition) matrix: each customer's spend
    * decile in 1995 vs 1996 cross-tabulated — the churn/upsell
    * movement report. Two per-period aggregates, two ntile windows
    * (total tie order), one equi-join on the customer, one count
    * matrix. Customers present in only one period land in decile 0 of
    * the other (the "new/lost" row and column).
    */
  def q163DecileMigration(s: SparkSession, dir: String): DataFrame = {
    def decilesOf(yr: Int) = {
      val per = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === yr)
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
          .cast("long")).as("cents"))
      // exact ntile(10) semantics without the one-task window (q142)
      Ranking.globalNtile(per,
          Seq(col("cents").desc, col("o_custkey").asc), 10, "d")
        .select(col("o_custkey"), col("d"))
    }
    decilesOf(1995).withColumnRenamed("d", "d95")
      .join(decilesOf(1996).withColumnRenamed("d", "d96"),
        Seq("o_custkey"), "full_outer")
      .groupBy(coalesce(col("d95"), lit(0L)).as("decile_1995"),
        coalesce(col("d96"), lit(0L)).as("decile_1996"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("decile_1995", "decile_1996")
  }

  /** Bidirectional referential completeness — the fact↔dim audit in
    * BOTH directions at once: lineitems whose order is missing
    * (orphans) AND orders with no lineitems (childless), plus the
    * same for orders↔customer. Four anti-join counts assembled into
    * one relation/direction report; every join is a key equi-join.
    */
  def q164RefCompleteness(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem").select(col("l_orderkey"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = t(s, dir, "customer").select(col("c_custkey"))
    def cnt(df: DataFrame, rel: String, dirn: String) =
      df.agg(count(lit(1)).as("n_dangling"))
        .select(lit(rel).as("relation"), lit(dirn).as("direction"),
          col("n_dangling"))
    cnt(l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti"),
        "lineitem_orders", "orphan_facts")
      .unionByName(cnt(
        o.join(l, col("o_orderkey") === col("l_orderkey"), "left_anti"),
        "lineitem_orders", "childless_dims"))
      .unionByName(cnt(
        o.join(c, col("o_custkey") === col("c_custkey"), "left_anti"),
        "orders_customer", "orphan_facts"))
      .unionByName(cnt(
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti"),
        "orders_customer", "childless_dims"))
      .orderBy("relation", "direction")
  }

  /** Bounded-round k-core peeling over the 1995Q1 customer↔part
    * purchase graph, ORACLE-PROVEN like q82/q86: 6 fixed peel rounds
    * (≥ the graph's peel depth, so this IS the 2-core fixpoint here —
    * GraphSpec proves rounds≡fixpoint on this graph) replayed as
    * chained DuckDB CTEs. The quarterly bipartite purchase graph is the
    * sparse, skewed one — the part co-occurrence graph's min degree is
    * ~87 at sf0.01, so no small k peels it; here k=2 peels through 5
    * genuine cascade rounds (2794→…→2542 edges). Output: surviving
    * vertices with their final in-core degree. */
  def q165KCoreBounded(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1995-04-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val e = o.join(t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("id_a"),
        (col("l_partkey") + lit(3000000L)).as("id_b"))
      .distinct()
    // e is distinct and bipartite (disjoint key spaces): the doubled
    // union cannot contain duplicates
    Graph.kCoreRounds(e, k = 2, rounds = 6, assumeDistinct = true)
      .orderBy("id")
  }

  /** TPC-H Q18 adaptation (large-quantity orders): the canonical
    * semi-join-over-grouped-HAVING shape — the IN subquery aggregates
    * lineitem per order, the HAVING filters, the outer query SEMI-joins
    * the key set then re-aggregates with the order/customer context.
    * Quantities are integral doubles in the fixture; cast to long so
    * both the HAVING sum and the emitted sum are exact integer adds.
    * Top-100 by (o_totalprice DESC, o_orderkey) is a strict total
    * order → deterministic under the comparator's row sort, and plans
    * as TakeOrderedAndProject (PlanSpec-guarded). */
  def q166TpchQ18(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
    val bigKeys = l.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("sq"))
      .filter(col("sq") > 300).select("l_orderkey")
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_od"),
      col("o_totalprice"))
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
    l.join(bigKeys, Seq("l_orderkey"), "left_semi")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_od"), col("o_totalprice"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q21 adaptation (suppliers who alone delayed multi-supplier
    * orders): the remaining canonical subquery shape — an EXISTS and a
    * NOT EXISTS both correlated on the same outer row. The fixture has
    * no receipt/commit dates, so "late" is shipped >90 days after the
    * order date, compared in exact epoch micros. Catalyst decorrelates
    * the EXISTS to a left-semi and the NOT EXISTS to a left-anti join,
    * both keyed on l_orderkey with the supplier inequality as a join
    * residual — no nested loop (PlanSpec-guarded). */
  def q167TpchQ21(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("li_q21_v")
    t(s, dir, "orders").createOrReplaceTempView("o_q21_v")
    t(s, dir, "supplier").createOrReplaceTempView("s_q21_v")
    s.sql("""
      WITH l1 AS (
        SELECT l_orderkey, l_suppkey,
          unix_micros(CAST(l_shipdate AS TIMESTAMP)) -
            unix_micros(CAST(o_orderdate AS TIMESTAMP))
            > 7776000000000 AS late
        FROM li_q21_v JOIN o_q21_v ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F')
      SELECT s_name, count(*) AS numwait
      FROM l1 JOIN s_q21_v ON s_suppkey = l1.l_suppkey
      WHERE l1.late
        AND EXISTS (SELECT 1 FROM l1 l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM l1 l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name""")
  }

  /** TPC-H Q4 adaptation (order-priority checking): EXISTS whose inner
    * predicate references the OUTER row's date — a correlation through
    * an inequality, not just the join key. "Late" = any lineitem
    * shipped >60 days after the order date (the fixture has no
    * commit/receipt dates), exact epoch-micros arithmetic. Catalyst
    * decorrelates to a left-semi on l_orderkey with the date residual
    * in the join condition — plan-guarded nested-loop-free. */
  def q168TpchQ4(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("o_q4_v")
    t(s, dir, "lineitem").createOrReplaceTempView("li_q4_v")
    s.sql("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM o_q4_v
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        AND EXISTS (SELECT 1 FROM li_q4_v
          WHERE l_orderkey = o_orderkey
            AND unix_micros(CAST(l_shipdate AS TIMESTAMP)) -
              unix_micros(CAST(o_orderdate AS TIMESTAMP)) > 5184000000000)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  /** TPC-H Q13 adaptation (customer order-count distribution): the
    * canonical outer-join-then-histogram-of-counts — customers with
    * ZERO matching orders must appear as c_count=0, which only a LEFT
    * OUTER join with the predicate in the JOIN CONDITION (not WHERE —
    * there it would turn the join inner) expresses. count(o_orderkey)
    * counts non-null matches only. */
  def q169TpchQ13(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"))
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    c.join(o, col("c_custkey") === col("o_custkey") &&
        col("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q22 adaptation (global-sales-opportunity): an UNCORRELATED
    * scalar aggregate gating the outer filter plus a NOT EXISTS anti
    * join — the two-subquery shape q160 (correlated scalar) and q159
    * (NOT IN) don't cover. "Above-average balance" is compared WITHOUT
    * a division: cents·n > sum_cents (exact integer cross-multiply),
    * so the threshold is hash-exact where avg()'s double sum is
    * order-dependent. Country code = c_nationkey % 5 as a string. The
    * anti set is "ever placed an urgent finalized order" — nearly every
    * fixture customer has SOME order, so the classic no-orders-at-all
    * predicate would select zero rows; this one keeps 333 at sf0.01. */
  def q170TpchQ22(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"),
      col("c_nationkey"),
      (col("c_acctbal").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("cents"))
    val pos = c.filter(col("cents") > 0)
      .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n_pos"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F" &&
        col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.crossJoin(broadcast(pos))
      .filter(col("cents") * col("n_pos") > col("sum_cents"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_nationkey") % 5).cast("string").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sum(col("cents")).as("totacctbal_cents"))
      .orderBy("cntrycode")
  }

  /** Perceptual image hashing, ORACLE-PROVEN through a REAL codec: each
    * doc gets the generated PNG of its 7-doc group id, the Spark side
    * computes the 64-bit average-hash from ACTUALLY DECODED pixels
    * (`Multimodal.aHash64` — javax.imageio, the q64 seam), and DuckDB
    * recomputes the identical hash from the generator's closed-form
    * channels (PNG is lossless, the hash is all-integer and
    * division-free, so decode-then-hash ≡ formula-then-hash
    * bit-for-bit). Groups by (hi, lo) into exact-dup clusters of 7 —
    * the image counterpart of q27's text exact-dedup. The near-dup
    * machinery over the same hashes (banded Hamming join,
    * `Multimodal.imageNearDupPairs`) is spec-proven on perturbed
    * images. */
  def q171ImageAHash(s: SparkSession, dir: String): DataFrame = {
    val gen = udf((id: Long) => Multimodal.generatePng(id))
    // codec round-trip once per DISTINCT image, hashes broadcast back
    // (the q255 content-keyed decode dedup)
    val gids = t(s, dir, "documents")
      .select((col("doc_id") - col("doc_id") % 7).as("gid")).distinct()
      .withColumn("payload", gen(col("gid")))
    val hashed = Multimodal.withAHash(gids, "payload")
      .select(col("gid"), col("ahash_hi"), col("ahash_lo"))
    val d = t(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") - col("doc_id") % 7).as("gid"))
      .join(broadcast(hashed), Seq("gid"))
    d.groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("ahash_hi", "ahash_lo")
  }

  /** Incremental JOIN maintenance — the join counterpart of q100's
    * incremental aggregate: with base/delta splits of both inputs, the
    * maintained join is base⋈base ∪ base⋈ΔB ∪ ΔA⋈base ∪ ΔA⋈ΔB, and the
    * oracle computes the PLAIN one-shot join of the full inputs — the
    * hash match PROVES the delta algebra loses and duplicates nothing.
    * At scale only the three Δ-terms run per refresh (base⋈base is the
    * stored view), each a key-co-partitioned join with a small delta
    * side that AQE broadcasts. Aggregated to priority grain so the
    * equality is over the whole joined content, not a sample. */
  def q172IncrementalJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      col("o_orderpriority"))
    val l = t(s, dir, "lineitem").select(col("l_orderkey"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("cents"), col("l_linenumber"))
    val (oBase, oDelta) = (o.filter(col("o_orderkey") % 4 =!= 0),
      o.filter(col("o_orderkey") % 4 === 0))
    val (lBase, lDelta) = (l.filter(col("l_linenumber") <= 3),
      l.filter(col("l_linenumber") > 3))
    def part(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"), col("cents"))
    part(oBase, lBase).unionByName(part(oBase, lDelta))
      .unionByName(part(oDelta, lBase)).unionByName(part(oDelta, lDelta))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy("o_orderpriority")
  }

  /** l-diversity audit — the privacy gate k-anonymity (q136) misses:
    * a quasi-identifier group can be large (k-anonymous) yet expose its
    * members if they all share one SENSITIVE value. Sensitive attribute
    * = a STATIC $1000 account-balance band (exact cents integer
    * division) — a rank-based decile would need a global window, while
    * the static band is a map-side projection; l = distinct sensitive
    * values per (segment, nation) group; groups with l < 3 are
    * flagged. One two-level aggregate — the shape that holds at
    * 100 TB. */
  def q173LDiversity(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("c_acctbal").cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val d = t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(cents / lit(100000)).as("bal_band"))
    d.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("bal_band")).as("l"))
      .select(col("c_mktsegment"), col("c_nationkey"), col("n"), col("l"),
        (col("l") < 3).as("low_diversity"))
      .orderBy("c_mktsegment", "c_nationkey")
  }

  /** TPC-H Q7 adaptation (nation-pair trade volume): the classic
    * reorderable 6-table join — lineitem⋈orders⋈customer +
    * lineitem⋈supplier, each endpoint's nation from its own copy of the
    * nation dim, filtered to one unordered nation pair expressed as the
    * two ordered cases. Revenue is the exact decimal
    * Σ price·(1−disc) cast to double once at the end (the q155
    * pattern); the year comes from l_shipdate. All four dims broadcast;
    * the fact table is scanned once. */
  def q174TpchQ7(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"),
      col("l_suppkey"),
      year(col("l_shipdate")).cast("long").as("l_year"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))).as("rev"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = t(s, dir, "customer").select(col("c_custkey"),
      col("c_nationkey"))
    val sup = t(s, dir, "supplier").select(col("s_suppkey"),
      col("s_nationkey"))
    val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
      .join(broadcast(n.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
      .filter((col("supp_nation") === "NATION_1" &&
          col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" &&
          col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q14 adaptation (promo revenue share): conditional aggregate
    * ratio over one fact⋈dim month — exact decimal cents for both the
    * promo and total sums (emitted as longs), the share as the single
    * f6-floored double division at the end. Part dim broadcasts. */
  def q175TpchQ14(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-03-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .select(col("l_partkey"),
        floor((col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) -
            col("l_discount").cast(DecimalType(18, 2)))) * lit(100))
          .cast("long").as("cents"))
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_type"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        coalesce(sum(when(col("p_type") === "PROMO", col("cents"))),
          lit(0L)).as("promo_cents"),
        sum(col("cents")).as("total_cents"))
      .select(col("promo_cents"), col("total_cents"),
        when(col("total_cents") > 0,
          f6(lit(100.0) * col("promo_cents").cast("double") /
            col("total_cents").cast("double"))).as("promo_share"))
  }

  /** TPC-H Q19 adaptation (disjunctive-predicate join): an OR of three
    * brand×quantity×size conjunctions spanning BOTH join sides — the
    * shape that exercises constraint propagation (each side's scan
    * receives the union of its own ranges as a pushed filter) with the
    * cross-side residual evaluated on the joined row. Exact cents sum +
    * row count. */
  def q176TpchQ19(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_partkey"),
      col("l_quantity"),
      floor((col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))) * lit(100))
        .cast("long").as("cents"))
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"),
      col("p_size"))
    val cond =
      (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) &&
        col("p_size").between(1, 5)) ||
      (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) &&
        col("p_size").between(1, 10)) ||
      (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) &&
        col("p_size").between(1, 15))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(count(lit(1)).as("n"), coalesce(sum(col("cents")), lit(0L))
        .as("sum_cents"))
  }

  /** TPC-H Q8 adaptation (national market share): for each order year,
    * the share of one supplier nation's revenue within a customer
    * REGION — the region table's one real job in the fixture. Exact
    * cents for numerator and denominator (emitted), share as the one
    * f6 double division. Five broadcast dims around one fact scan. */
  def q177TpchQ8(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"),
      col("l_suppkey"),
      floor((col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))) * lit(100))
        .cast("long").as("cents"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      year(col("o_orderdate")).cast("long").as("o_year"))
    val c = t(s, dir, "customer").select(col("c_custkey"),
      col("c_nationkey"))
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val custRegion = c
      .join(broadcast(n.select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val sup = t(s, dir, "supplier").select(col("s_suppkey"),
      col("s_nationkey"))
    val supNation = broadcast(n.select(col("n_nationkey").as("snk"),
      col("n_name").as("supp_nation")))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"),
        "left_semi")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(supNation, col("s_nationkey") === col("snk"))
      .groupBy(col("o_year"))
      .agg(
        coalesce(sum(when(col("supp_nation") === "NATION_3",
          col("cents"))), lit(0L)).as("nation_cents"),
        sum(col("cents")).as("region_cents"))
      .select(col("o_year"), col("nation_cents"), col("region_cents"),
        when(col("region_cents") > 0,
          f6(col("nation_cents").cast("double") /
            col("region_cents").cast("double"))).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q6 (forecast revenue change) — the canonical scan-only
    * range-filter aggregate: one year, a discount band, a quantity
    * cap; every predicate reaches the parquet footer. Exact cents of
    * Σ price·discount. */
  def q178TpchQ6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(floor((col("l_extendedprice").cast(DecimalType(18, 2)) *
          col("l_discount").cast(DecimalType(18, 2))) * lit(100))
          .cast("long")), lit(0L)).as("revenue_cents"))

  /** Bounded-round multi-source BFS, ORACLE-PROVEN like q82/q86/q165:
    * hop distance from nation-3 customers over the 1995Q1
    * customer↔part purchase graph (q165's sparse bipartite graph — an
    * even hop = a customer, an odd hop = a part), 4 fixed frontier
    * rounds replayed as chained min-plus CTEs in DuckDB (frontier BFS
    * ≡ synchronous min-plus relaxation on unweighted graphs, round for
    * round). Seeds with no 1995Q1 purchases are isolated vertices —
    * emitted at dist 0 by both engines; nodes beyond 4 hops are absent
    * rows, not ∞. */
  def q179BfsHops(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1995-04-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val e = o.join(t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("id_a"),
        (col("l_partkey") + lit(3000000L)).as("id_b"))
      .distinct()
    val seeds = t(s, dir, "customer")
      .filter(col("c_nationkey") === 3)
      .select(col("c_custkey").as("id"))
    // e is distinct and bipartite (disjoint key spaces): the doubled
    // union cannot contain duplicates
    Graph.bfsRounds(e, seeds, rounds = 4, assumeDistinct = true)
      .orderBy("id")
  }

  /** SemDeDup-style semantic deduplication, ORACLE-PROVEN end to end:
    * k-means clustering (the q109 quantized-Lloyd recurrence, replayed
    * by DuckDB as chained CTEs) + greedy within-cluster cosine
    * near-dup removal over the q45 augmented corpus (50 planted ×1.5
    * copies — cosine ~1.0 with their originals, and a scaled vector
    * provably lands in its original's cell since argmax dot(v, ĉ) is
    * scale-invariant). τ=0.95 sits in the fixture's empty cosine band
    * (natural pairs top out at ~0.60, planted pairs are ~1.0) so the
    * threshold compare is boundary-safe in both engines. Output:
    * per-cluster keep/drop accounting. */
  def q180SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
    val planted = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x.cast("double") * 1.5).as("vec"))
    Similarity.semanticDedup(base.unionByName(planted), "vec_id", "vec",
      k = 8, rounds = 1, threshold = 0.95)
      .orderBy("cell")
  }

  /** Link prediction via the resource-allocation index over the 1995Q1
    * customer↔part incidence list: predicted customer↔customer links =
    * pairs sharing parts, scored Σ floor(2^30/deg(part)) — exact
    * integer fixed point (the division-free Adamic–Adar cousin; see
    * Graph.linkPredictRA), top-100 by a strict total order. Pairs are
    * generated per shared part (equi-join), never all-pairs; the deg≤64
    * hub cap never fires on the fixture (max part degree 7) but bounds
    * expansion at scale. */
  def q181LinkPredict(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1995-04-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val inc = o.join(t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("node"), col("l_partkey").as("nbr"))
      .distinct()
    Graph.linkPredictRA(inc, degCap = 64, topK = 100)
  }

  /** EXACT set-similarity join (2-gram Jaccard ≥ 3/5) via PPJoin-style
    * prefix filtering — the lossless scale path next to the LSH tiers
    * (q29/q51): candidates form only on each doc's rarest-token
    * prefix, the threshold is an integer cross-multiply, and the
    * ORACLE BRUTE-FORCES ALL PAIRS — a hash match proves the prefix
    * filter lost nothing, not just that the surfaced pairs score
    * right. */
  def q182SimilarityJoin(s: SparkSession, dir: String): DataFrame =
    Dedup.similarityJoinPrefix(t(s, dir, "documents"), "text", "doc_id",
      n = 2, tauNum = 3, tauDen = 5)
      .withColumn("jaccard", f6(col("inter_size").cast("double") /
        col("union_size").cast("double")))
      .orderBy("id_a", "id_b")

  /** Bounded-round Bellman–Ford, ORACLE-PROVEN like q179: cheapest
    * ≤4-hop path cost from nation-3 customers over the 1995Q1 purchase
    * graph with edge weight = the MIN quantity ever shipped on that
    * customer↔part relation (exact integer). The weighted sibling of
    * q179's BFS — every reached node relaxes each round (a longer path
    * may be cheaper), and the 4-round min-plus recurrence replays as
    * chained DuckDB CTEs. */
  def q183CheapestPath(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1995-04-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val e = o.join(t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_partkey"), col("l_quantity")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("id_a"),
        (col("l_partkey") + lit(3000000L)).as("id_b"))
      .agg(min(col("l_quantity").cast("long")).as("w"))
    val seeds = t(s, dir, "customer")
      .filter(col("c_nationkey") === 3)
      .select(col("c_custkey").as("id"))
    Graph.bellmanFordRounds(e, seeds, rounds = 4)
      .orderBy("id")
  }

  /** Product-quantization codebooks, ORACLE-PROVEN: 4 subspaces × 16
    * dims over the embeddings corpus, each codebook an independent
    * 8-codeword quantized-Lloyd run on the sliced subvectors (the PQ
    * stage of an IVF-PQ index; see Similarity.productQuantizeStats) —
    * DuckDB replays 4 copies of the q109 CTE chain over list slices.
    * 32 rows: per (subspace, code) membership, cohesion, and leading
    * codeword coordinates. */
  def q184ProductQuantize(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val r = Similarity.productQuantizeStats(emb, "vec_id", "embedding",
      dim = 64, m = 4, k = 8, rounds = 1)
    r.select(col("subspace") +: col("code") +: col("n") +: (
      "mean_cos" +: (0 until 4).map(i => s"c$i"))
        .map(c => f6(col(c)).as(c)): _*)
      .orderBy("subspace", "code")
  }

  /** Per-source dedup FUNNEL — the attrition report a corpus build
    * actually publishes, chaining two individually-proven tiers over
    * the whole documents table: content-fingerprint exact dedup
    * (min-id canonical, the q27/q43 tier) then the LOSSLESS
    * prefix-filtered similarity join (q182's τ=3/5 tier, greedy drop
    * of the higher id in each qualifying pair). Counts per source at
    * each stage; both tiers' full logic replays in the oracle, so the
    * funnel numbers are hash-proven end to end, not spot-checked. */
  def q185DedupFunnel(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val keep1 = TextAnalysis.withFingerprint(docs, "text")
      .groupBy(col("fingerprint")).agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val s1 = docs.join(keep1, Seq("doc_id"), "left_semi")
    val dropped = Dedup.similarityJoinPrefix(s1, "text", "doc_id",
        n = 2, tauNum = 3, tauDen = 5)
      .select(col("id_b").as("doc_id")).distinct()
    val s2 = s1.join(dropped, Seq("doc_id"), "left_anti")
    def cnt(df: DataFrame, name: String) =
      df.groupBy(col("source")).agg(count(lit(1)).as(name))
    cnt(docs, "n_total")
      .join(cnt(s1, "n_exact"), Seq("source"), "left")
      .join(cnt(s2, "n_near"), Seq("source"), "left")
      .select(col("source"),
        col("n_total"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
      .orderBy("source")
  }

  /** Bounded-round TEMPORAL reachability, ORACLE-PROVEN like
    * q179/q183: earliest time-respecting arrival from nation-3
    * customers over the 1995 purchase graph, where an edge (a
    * customer↔part purchase, timestamped with its order date) is
    * traversable only at t ≥ the current arrival — the constraint
    * that separates temporal influence/contagion reach from plain
    * BFS reach (which overstates it). 4 min-plus rounds on exact
    * epoch-micro longs, replayed as chained DuckDB CTEs; parallel
    * edges at different dates all kept (an earlier edge is never
    * dominated). */
  def q186TemporalReach(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"))
    val half = o.join(t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ca"),
        (col("l_partkey") + lit(3000000L)).as("pb"), col("t"))
      .distinct()
    val e = half.select(col("ca").as("src"), col("pb").as("dst"), col("t"))
      .unionByName(half.select(col("pb").as("src"), col("ca").as("dst"),
        col("t")))
    val seeds = t(s, dir, "customer")
      .filter(col("c_nationkey") === 3)
      .select(col("c_custkey").as("id"))
    Graph.temporalReachRounds(e, seeds, startT = 788918400000000L,
        rounds = 4)
      .orderBy("id")
  }

  /** TPC-H Q15 (top supplier) — the last TPC-H query faithfully
    * expressible on this schema (Q2/Q9/Q11/Q16/Q20 need partsupp,
    * Q12 needs shipmode/receiptdate): quarterly revenue per supplier
    * as exact per-row-floored cents (decimal in, long out — the q178
    * shape, so the `= max` equality compare is integer-exact and the
    * tie semantics of the spec survive), the scalar max broadcast
    * back, winners joined to the supplier dim. At scale: one
    * lineitem scan + one suppkey-keyed hash aggregate (~#suppliers
    * rows), a scalar subquery, and a broadcast join of the ~1-row
    * winner set — no global sort of the revenue table. */
  def q187TpchQ15(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(floor((col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) -
            col("l_discount").cast(DecimalType(18, 2)))) * lit(100))
        .cast("long")).as("total_rev_cents"))
    val mx = rev.agg(max(col("total_rev_cents")).as("mx"))
    val winners = rev.join(broadcast(mx),
      col("total_rev_cents") === col("mx"))
    t(s, dir, "supplier")
      .join(broadcast(winners), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_cents"))
      .orderBy("s_suppkey")
  }

  /** Time-series linear interpolation of missing readings — the
    * sensor-backfill op q104's carry-forward gap-fill does NOT cover:
    * per-priority daily revenue (exact cents, the q121 series) with a
    * deterministic ~1/3 of days dropped (cents%3==0 — reproducible in
    * both engines, no RNG), then each missing day rebuilt from its
    * surviving neighbors as pc + ⌊(nc−pc)·(d−pd)/(nd−pd)⌋. All inputs
    * to the one double expression are exact integers (cents, day
    * offsets; products ≪ 2^53), so the floor is engine-independent —
    * the [[graft-oracle-conventions]] derived-float shape. Heavy work
    * is the orders scan + (prio,day) aggregate; the scaffold/window
    * stage runs on calendar-bounded rows (#prios × #days). Edge days
    * exist by construction (the scaffold spans each priority's kept
    * min..max), so interior gaps always have both neighbors. */
  def q188Interpolate(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("prio"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("cents"))
    val kept = daily.filter(col("cents") % 3 =!= 0)
    val scaffold = kept.groupBy(col("prio"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("prio"),
        explode(sequence(col("d0"), col("d1"))).as("d"))
    val wPrev = Window.partitionBy("prio").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("prio").orderBy("d")
      .rowsBetween(0, Window.unboundedFollowing)
    scaffold.join(kept, Seq("prio", "d"), "left")
      .withColumn("pc", last(col("cents"), ignoreNulls = true).over(wPrev))
      .withColumn("pd", last(when(col("cents").isNotNull, col("d")),
        ignoreNulls = true).over(wPrev))
      .withColumn("nc", first(col("cents"), ignoreNulls = true).over(wNext))
      .withColumn("nd", first(when(col("cents").isNotNull, col("d")),
        ignoreNulls = true).over(wNext))
      .select(col("prio"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        when(col("cents").isNotNull, col("cents")).otherwise(
          col("pc") + floor(
            (col("nc") - col("pc")).cast("double") *
              datediff(col("d"), col("pd")).cast("double") /
              datediff(col("nd"), col("pd")).cast("double")).cast("long"))
          .as("cents_filled"),
        col("cents").isNull.as("interpolated"))
      .orderBy("prio", "day")
  }

  /** Transposition-aware blocked fuzzy match — q120's
    * entity-resolution shape upgraded with the native
    * [[graft.functions.DamerauLevenshtein]] expression: digit SWAPS
    * (…012 vs …021) are the canonical human typo, cost 1 under
    * Damerau–Levenshtein but 2 under plain levenshtein, so a lev≤1
    * verify silently drops exactly the likeliest error class. Candidate
    * pairs still come only from equality on the 16-char blocking
    * prefix (Σ|block|² cost, never all-pairs); per name we emit the
    * DL≤1 neighbor count and how many of those are PURE transpositions
    * (lev=2) — the pairs a levenshtein-only matcher misses. The DP
    * kernel is a static-call codegen expression, so the verify stays
    * inside whole-stage codegen. */
  def q189TypoMatch(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "supplier")
      .select(col("s_name").as("name"),
        substring(col("s_name"), 1, 16).as("blk"))
    val dl = org.apache.spark.sql.GraftSql.column(
      graft.functions.DamerauLevenshtein(
        org.apache.spark.sql.GraftSql.expression(col("a.name")),
        org.apache.spark.sql.GraftSql.expression(col("b.name"))))
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") &&
          col("a.name") =!= col("b.name") && dl <= 1)
      .select(col("a.name").as("name"),
        (levenshtein(col("a.name"), col("b.name")) === 2).as("tr"))
      .groupBy(col("name"))
      .agg(count(lit(1)).as("n_dl1"),
        sum(when(col("tr"), 1L).otherwise(0L)).as("n_transpose"))
      .orderBy("name")
  }

  /** Quantile normalization across sources — the batch-effect
    * correction step of corpus mixing: each source's n_chars
    * distribution is mapped onto the POOLED empirical distribution, so
    * two sources with different length profiles contribute
    * comparably-scaled values after alignment. Per-source rank r of
    * n_g maps to pooled sort position (r−1)(N−1) div (n_g−1)
    * (integer division on non-negative longs ≡ floor — no float
    * anywhere, so the mapping is engine-exact; at >2^53-row scale the
    * product needs decimal widening, noted in Ranking's contract).
    * Ranks come from [[Ranking.groupRanks]]/[[Ranking.globalIndex]] —
    * range-partitioned distributed sorts, NEVER a single-partition
    * window (Window.orderBy with no partition key is the plan that
    * does not finish at 100 TB); the position→value lookup is a plain
    * long equi-join against the indexed pooled table. */
  def q190QuantileNorm(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
    val ranked = Ranking.groupRanks(d, "source", Seq("n_chars", "doc_id"))
    val pooled = Ranking.globalIndex(
      d.select(col("n_chars").as("pool_chars"), col("doc_id").as("pid")),
      Seq("pool_chars", "pid"))
    val n = pooled.agg(count(lit(1)).as("nn"))
    ranked.crossJoin(broadcast(n))
      .withColumn("p", when(col("ng") > 1,
          expr("(r - 1) * (nn - 1) div (ng - 1)"))
        .otherwise(expr("(nn - 1) div 2")))
      .join(pooled.select(col("gidx"), col("pool_chars")),
        col("p") === col("gidx"))
      .select(col("source"), col("doc_id"), col("n_chars"),
        col("pool_chars").as("norm_chars"))
      .orderBy("source", "doc_id")
  }

  /** The fixture has no PARTSUPP table; the supply-relationship queries
    * (Q2/Q11/Q16/Q20 shapes) run on a pseudo-partsupp DERIVED from
    * lineitem: one row per observed (part, supplier) pair, supply cost
    * = the minimum line price ever charged (exact cents), available
    * quantity = total quantity ever shipped. One hash aggregate —
    * partial map-side combine makes it one shuffle of |PS| rows, reused
    * by all four queries. */
  private def pseudoPartsupp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
          .cast("long").as("ec"),
        col("l_quantity").cast("long").as("q"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("ec")).as("ps_cost_cents"), sum(col("q")).as("ps_qty"))

  /** TPC-H Q2 adaptation (minimum-cost supplier): for every size-15
    * part, the EUROPE supplier(s) whose pseudo-partsupp cost equals the
    * part's regional minimum — the correlated-scalar-min shape
    * expressed as an aggregate + equi-rejoin on (part, cost), which is
    * what Catalyst decorrelates the subquery to anyway. The
    * nation→region dimension chain broadcasts; the min table joins the
    * ps table on its own grouping key, so AQE keeps everything on the
    * one ps shuffle. Ties (two suppliers at the min) are all kept, as
    * in the spec. Exact cents; limit 100 under a TOTAL order. */
  def q191TpchQ2(s: SparkSession, dir: String): DataFrame = {
    val ps = pseudoPartsupp(s, dir)
    val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"),
      col("s_nationkey"),
      (col("s_acctbal").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("bal_cents"))
    val nEur = t(s, dir, "nation")
      .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val p = t(s, dir, "part").filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_brand"))
    val eurPs = ps
      .join(broadcast(sup.join(broadcast(nEur),
          col("s_nationkey") === col("n_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val minCost = eurPs.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("ps_cost_cents")).as("min_cost"))
    eurPs.join(minCost, col("p_partkey") === col("mk") &&
        col("ps_cost_cents") === col("min_cost"))
      .select(col("bal_cents"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"))
      .orderBy(col("bal_cents").desc, col("n_name").asc,
        col("s_name").asc, col("p_partkey").asc)
      .limit(100)
  }

  /** TPC-H Q9 adaptation (product-type profit): profit per supplier
    * nation per order year over 'gear' parts. No ps_supplycost in the
    * fixture — cost is p_retailprice·quantity. All arithmetic in exact
    * integer cent-percent units: ec·(100−d%) − rc·100·qty, so the sum
    * is order-independent and engine-exact (a double Σ here would be
    * neither). Dimension joins (part filter, supplier→nation)
    * broadcast; the one big join is lineitem⋈orders on the order key. */
  def q192TpchQ9(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").filter(col("p_name").like("%gear%"))
      .select(col("p_partkey"),
        (col("p_retailprice").cast(DecimalType(18, 2)) * lit(100))
          .cast("long").as("rc"))
    val supN = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"),
      col("l_suppkey"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("ec"),
      (col("l_discount").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("dpct"),
      col("l_quantity").cast("long").as("q"))
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("o_year"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("ec") * (lit(100L) - col("dpct")) -
        col("rc") * lit(100L) * col("q")).as("profit_u"))
      .orderBy(col("n_name").asc, col("o_year").desc)
  }

  /** TPC-H Q11 adaptation (important stock): per-part inventory value
    * (Σ cost·qty over pseudo-partsupp rows) held by NATION_3's
    * suppliers, keeping parts worth more than 0.1% of the nation's
    * total. The threshold compare cross-multiplies in DECIMAL(38,0) —
    * value·1000 vs total — because at 100 TB the long product would
    * overflow; the emitted value itself stays a BIGINT. The total is a
    * 1-row broadcast, the HAVING a map-side filter on the grouped
    * output — one shuffle end to end. */
  def q193TpchQ11(s: SparkSession, dir: String): DataFrame = {
    val ps = pseudoPartsupp(s, dir)
    val sup3 = t(s, dir, "supplier").filter(col("s_nationkey") === 3)
      .select(col("s_suppkey"))
    val value = ps.join(broadcast(sup3), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("ps_cost_cents") * col("ps_qty")).as("value_u"))
    val total = value.agg(sum(col("value_u")).as("total_u"))
    value.crossJoin(broadcast(total))
      .filter(col("value_u").cast(DecimalType(38, 0)) * lit(1000) >
        col("total_u").cast(DecimalType(38, 0)))
      .select(col("l_partkey").as("p_partkey"), col("value_u"))
      .orderBy(col("value_u").desc, col("p_partkey").asc)
  }

  /** TPC-H Q12 adaptation (shipping-mode priority): the fixture has no
    * l_shipmode/commitdate/receiptdate, so the "mode" is l_returnflag
    * and "late" is shipped >60 days after the order date (exact epoch
    * micros, the q167/q168 convention). The CASE-pivot aggregation —
    * urgent orders vs the rest counted in one pass — is the shape the
    * spec exercises; one join, one hash aggregate over 3 groups. */
  def q194TpchQ12(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"),
      col("o_orderpriority"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(unix_micros(col("l_shipdate").cast("timestamp")) -
        unix_micros(col("o_orderdate").cast("timestamp")) > 5184000000000L)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q16 adaptation (parts/supplier relationship): distinct
    * suppliers per (brand, type, size) over mid-size non-PROMO parts,
    * excluding negative-balance suppliers (the fixture's stand-in for
    * the spec's complaint-comment scan) via an anti join that Catalyst
    * plans as a broadcast left-anti — the NOT IN shape without its
    * NULL trap (s_suppkey is never null here; q159 covers the trap).
    * count(DISTINCT) expands to the standard two-phase partial
    * aggregate, no single-point distinct. */
  def q195TpchQ16(s: SparkSession, dir: String): DataFrame = {
    val ps = pseudoPartsupp(s, dir).select(col("l_partkey"), col("l_suppkey"))
    val p = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 7, 10, 15, 20, 25, 30))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complaints = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    ps.join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").cast("long").asc)
      .select(col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"), col("supplier_cnt"))
  }

  /** TPC-H Q17 adaptation (small-quantity-order revenue): revenue lost
    * to sub-20%-of-average-quantity orders of Brand#23 parts. The
    * correlated scalar avg becomes a per-part (sum, count) aggregate
    * broadcast back onto the lineitems; the fractional compare
    * cross-multiplies (5·qty·n < Σqty ⟺ qty < 0.2·avg) so no double
    * division exists on the filter path. avg_yearly is the one derived
    * value: integer floor-division of exact cents by 7 — identical in
    * both engines on the non-negative sum. */
  def q196TpchQ17(s: SparkSession, dir: String): DataFrame = {
    val p23 = t(s, dir, "part").filter(col("p_brand") === "Brand#23")
      .select(col("p_partkey"))
    val li = t(s, dir, "lineitem")
      .join(broadcast(p23), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
          .cast("long").as("ec"),
        col("l_quantity").cast("long").as("q"))
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("nq"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("q") * lit(5L) * col("nq") < col("sq"))
      .agg(count(lit(1)).as("n_lines"),
        coalesce(sum(col("ec")), lit(0L)).as("total_cents"))
      .select(col("n_lines"), col("total_cents"),
        expr("total_cents div 7").as("avg_yearly_cents"))
  }

  /** TPC-H Q20 adaptation (potential part promotion): AMERICA suppliers
    * who shipped a MAJORITY of some 'red' part's 1995 volume — the
    * spec's nested semi-join chain (supplier ⋉ partsupp ⋉ part, gated
    * by a correlated lineitem sum) with the availability predicate
    * recast as 2·supplier_qty > part_total. The per-(part,supp) and
    * per-part aggregates share one shuffle (the second groups the
    * first); part filter and the dimension chain broadcast; the final
    * count-per-supplier is |S|-sized. */
  def q197TpchQ20(s: SparkSession, dir: String): DataFrame = {
    val red = t(s, dir, "part").filter(col("p_name").like("red %"))
      .select(col("p_partkey"))
    val li95 = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01"))
      .join(broadcast(red), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("q"))
    val bySupp = li95.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("q")).as("sq"))
    val byPart = bySupp.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("sq")).as("tq"))
    val dominant = bySupp.join(byPart, col("l_partkey") === col("pk"))
      .filter(col("sq") * lit(2L) > col("tq"))
    val supAm = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
          .join(t(s, dir, "region").filter(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    dominant.join(broadcast(supAm), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("s_name"))
  }

  /** Train/eval split-leakage audit — the contamination check a
    * training pipeline runs BEFORE the split ships: documents get
    * splits from the q63 portable hash (md5 of doc_id, reproducible in
    * any engine), and each valid/test document is scored by how many of
    * its distinct 3-gram shingles also occur ANYWHERE in train (the q65
    * decontamination machinery turned inward on the corpus's own
    * split). A doc with ≥50% shared shingles is flagged — the compare
    * cross-multiplies, no division. The train shingle set rides a
    * broadcast semi-join, so the eval side never shuffles; per-split
    * roll-up is 2 rows out. */
  def q198SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val h = pmod(graft.functions.Hashing.md5Long(
      col("doc_id").cast("string")), lit(100))
    val sh = t(s, dir, "documents")
      .withColumn("split", when(h < 90, lit("train"))
        .when(h < 95, lit("valid")).otherwise(lit("test")))
      .select(col("doc_id"), col("split"),
        explode(array_distinct(
          Dedup.shingleHashes(col("text"), 3, mod = false))).as("sh"))
    val trainSh = broadcast(
      sh.filter(col("split") === "train").select("sh").distinct())
    val ev = sh.filter(col("split") =!= "train")
    val per = ev.groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_sh"))
    val shared = ev.join(trainSh, Seq("sh"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh_shared"))
    per.join(shared, Seq("doc_id"), "left_outer")
      .withColumn("shr", coalesce(col("n_sh_shared"), lit(0L)))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shr") * 2 >= col("n_sh"), 1L).otherwise(0L))
          .as("n_flagged"),
        sum(col("n_sh")).as("n_shingles"),
        sum(col("shr")).as("n_shared"))
      .orderBy("split")
  }

  /** Hard-negative mining for contrastive training: per anchor vector,
    * the top-5 most-similar vectors with a DIFFERENT label — the
    * near-miss examples a retrieval model trains against. The label
    * inequality rides the broadcast-join condition, so wrong-label
    * filtering happens before any score is computed. Brute-force over
    * a broadcast anchor set is the exact baseline (anchors are
    * model-sized); at corpus×corpus scale the candidate stream comes
    * from q38's LSH buckets instead, same downstream ranking. */
  def q199HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = broadcast(emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("qvec")))
    val scored = emb
      .select(col("vec_id").as("neighbor_id"), col("label").as("n_label"),
        col("embedding"))
      .join(q, col("query_id") =!= col("neighbor_id") &&
        col("q_label") =!= col("n_label"))
      .withColumn("cos", Similarity.cosine(col("qvec"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("q_label").cast("long").as("q_label"),
        col("neighbor_id"), col("n_label").cast("long").as("n_label"),
        f6(col("cos")).as("cos"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Label-noise audit via k-NN majority vote: a vector whose 10
    * nearest neighbors mostly carry a DIFFERENT label is a likely
    * mislabel — the standard pre-training label-quality sweep. Votes
    * tie-break toward the smaller label (the q86 max(struct) argmax, so
    * the verdict is deterministic); brute-force scoring against the
    * broadcast corpus is exact at fixture scale, and the 100 TB path
    * swaps in LSH candidates (q38) without touching the vote logic. */
  def q200LabelNoise(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    // norms hoisted per ROW so the n² pair loop pays 1 multiply-add per
    // element instead of 3 — bit-identical to cosine() (same folds,
    // same divide; see Similarity.dotNative)
    val corpus = broadcast(emb.select(col("vec_id").as("nid"),
      col("label").as("nlabel"), col("embedding").as("nvec"),
      Similarity.norm(col("embedding")).as("nnorm")))
    // spread the n² probe (r16): the query side is one small parquet
    // split, so the broadcast NLJ ran the whole 2000×2000 dot-product
    // loop in a single 4.8s task — repartition the stream side to the
    // configured parallelism before the join (deterministic hash; the
    // per-query window/vote below is partition-independent)
    val scored = emb.select(col("vec_id"), col("label"), col("embedding"),
        Similarity.norm(col("embedding")).as("qnorm"))
      .repartition(graft.operators.Graph.shufflePartitions(emb),
        col("vec_id"))
      .join(corpus, col("vec_id") =!= col("nid"))
      .withColumn("cos", Similarity.dotNative(col("embedding"),
        col("nvec")) / (col("qnorm") * col("nnorm")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nid").asc)
    val knn = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
    knn.groupBy(col("vec_id"), col("label"), col("nlabel"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(struct(col("votes"), (-col("nlabel")).as("neg"),
        col("nlabel"))).as("m"))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("m.nlabel").cast("long").as("maj_label"),
        col("m.votes").as("n_maj"),
        (col("m.nlabel") =!= col("label")).as("flagged"))
      .orderBy("vec_id")
  }

  /** Mixture rebalancing by importance resampling: given a target
    * domain mixture (weight ∝ source index + 1 — a stand-in for the
    * tuned weights a DoReMi-style optimization produces), each source's
    * acceptance rate is the exact-integer ratio of target share to
    * observed share, normalized so the most-underweighted source keeps
    * 100%; docs then pass a q63-style portable md5 hash gate, so the
    * downsample is reproducible in any engine, any run, any partition
    * layout. Report: per-source before/after counts, the target and
    * achieved mixture in ppm. Two scans at scale: the first collapses
    * to a sources-sized count aggregate (model-sized, broadcast back),
    * the second is a map-only hash filter — no doc-side shuffle at
    * all; every rate is int64 floor arithmetic (DIV, never /), so the
    * report hash-matches bit-for-bit. */
  def q201MixtureResample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cnt = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_before"))
      .withColumn("tgt_num",
        substring(col("source"), 4, 10).cast("long") + 1)
      .withColumn("r", expr("tgt_num * 1000000000000 DIV n_before"))
    val norm = cnt.agg(max(col("r")).as("rmax"),
      sum(col("tgt_num")).as("tgt_den"))
    val dim = cnt.crossJoin(broadcast(norm))
      .withColumn("accept_ppm", expr("r * 1000000 DIV rmax"))
      .withColumn("target_ppm", expr("tgt_num * 1000000 DIV tgt_den"))
      .select("source", "n_before", "accept_ppm", "target_ppm")
    val kept = docs
      .join(broadcast(dim.select("source", "accept_ppm")), Seq("source"))
      .filter(pmod(graft.functions.Hashing.md5Long(
          concat(lit("res:"), col("doc_id").cast("string"))),
        lit(1000000L)) < col("accept_ppm"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_after"))
    val j = dim.join(broadcast(kept), Seq("source"), "left_outer")
      .withColumn("n_after", coalesce(col("n_after"), lit(0L)))
    val tot = j.agg(sum(col("n_after")).as("total_after"))
    j.crossJoin(broadcast(tot))
      .withColumn("achieved_ppm", expr("n_after * 1000000 DIV total_after"))
      .select(col("source"), col("n_before"), col("target_ppm"),
        col("accept_ppm"), col("n_after"), col("achieved_ppm"))
      .orderBy("source")
  }

  /** Per-domain quality gate at a relative percentile — the C4/Gopher
    * filtering shape: a quality cut tuned globally over-prunes whole
    * domains whose score distribution sits low, so the threshold is
    * PER SOURCE (drop each domain's own worst decile). Score = lexical
    * diversity (distinct tokens per million tokens, exact int64 DIV —
    * repetitive boilerplate scores low); threshold = the source's P10
    * via percentile_disc (a set member, so both engines agree on the
    * exact long). Scale: score is a map-only projection; the
    * per-source discrete percentile is the one sort-heavy aggregate
    * (at 100 TB swap in approx_percentile under q83's rank-error
    * contract); thresholds broadcast back, the keep test is map-only.
    * Emits every doc with its verdict so both sides of the gate are
    * auditable. */
  def q202DomainQualityGate(s: SparkSession, dir: String): DataFrame = {
    val toksC = split(trim(lower(col("text"))), "\\s+")
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(array_distinct(toksC)).cast("long").as("n_distinct"),
        size(toksC).cast("long").as("n_tok"))
      .withColumn("score", expr("n_distinct * 1000000 DIV n_tok"))
    val thr = scored.groupBy(col("source"))
      .agg(expr("percentile_disc(0.10) WITHIN GROUP (ORDER BY score)")
        .cast("long").as("p10"))
    scored.join(broadcast(thr), Seq("source"))
      .select(col("doc_id"), col("source"), col("score"), col("p10"),
        (col("score") >= col("p10")).as("kept"))
      .orderBy("doc_id")
  }

  /** Growth accounting — the canonical DAU decomposition every
    * analytics stack ships: each active user-day is classified NEW
    * (first day ever), RETAINED (also active the previous day), or
    * RESURRECTED (returning after a gap), and CHURNED_OUT counts users
    * whose next activity skips tomorrow (right-censored at the
    * observed horizon, so the last day never reports unknowable
    * churn). One distinct-collapse of the event stream, then per-user
    * lag/lead windows and min — every term an exact integer; the
    * horizon is a 1-row broadcast scalar. Scale: the distinct and the
    * windows both shuffle on user_id ONCE (same key, one exchange
    * reused), the report aggregate is days-sized. */
  def q203GrowthAccounting(s: SparkSession, dir: String): DataFrame = {
    val act = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts").cast("timestamp")).as("d"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val wAll = Window.partitionBy(col("user_id"))
    val horizon = act.agg(max(col("d")).as("max_d"))
    val marked = act
      .withColumn("prev_d", lag(col("d"), 1).over(w))
      .withColumn("next_d", lead(col("d"), 1).over(w))
      .withColumn("first_d", min(col("d")).over(wAll))
      .crossJoin(broadcast(horizon))
    marked.groupBy(col("d"))
      .agg(
        sum(when(col("d") === col("first_d"), 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("d") =!= col("first_d") &&
          datediff(col("d"), col("prev_d")) === 1, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("d") =!= col("first_d") &&
          datediff(col("d"), col("prev_d")) > 1, 1L).otherwise(0L))
          .as("n_resurrected"),
        sum(when(col("d") < col("max_d") &&
          (col("next_d").isNull ||
            datediff(col("next_d"), col("d")) > 1), 1L).otherwise(0L))
          .as("n_churned_out"),
        count(lit(1)).as("n_active"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n_new"), col("n_retained"), col("n_resurrected"),
        col("n_churned_out"), col("n_active"))
      .orderBy("day")
  }

  /** BPE merge learning — the tokenizer-training core: learn the first
    * K byte-pair merges from the corpus, exactly as a HuggingFace/
    * SentencePiece trainer would. The data-scale pass is ONE
    * distributed word-frequency aggregation over the corpus (hash-agg
    * + deterministic top-V by (count desc, word asc)); BPE training
    * then runs on that bounded frequency table — V rows is a MODEL
    * artifact, not data, the same driver-materialization class as the
    * IVF seeds and Lloyd stats (VERDICT r5 `.collect()` audit). Each
    * round counts weighted adjacent symbol pairs, picks the argmax
    * (ties by pair lexicographically), and merges greedy-leftmost —
    * overlapping matches (only possible when left==right, e.g. "aaa")
    * keep alternate positions from each run start, matching the
    * reference BPE algorithm. The oracle replays all K rounds as
    * chained DuckDB CTEs over a (word,pos,sym) table, with the
    * leftmost-greedy rule expressed as odd-rank-within-island over the
    * match positions. Exact integer weights throughout. */
  def q204BpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeLearnedMerges(s, dir).toSeq
      .toDF("round", "left_sym", "right_sym", "pair_weight")
      .select(col("round"), col("left_sym"), col("right_sym"),
        concat(col("left_sym"), col("right_sym")).as("merged"),
        col("pair_weight"))
      .orderBy("round")
  }

  /** The q204 learning loop, shared with q207's encoder: one
    * distributed word-frequency top-V pass, then K greedy-leftmost
    * pair merges on the bounded (model-sized) frequency table. */
  private def bpeLearnedMerges(s: SparkSession, dir: String,
      topV: Int = 200, rounds: Int = 8): Seq[(Long, String, String, Long)] = {
    import s.implicits._
    val words = t(s, dir, "documents")
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")).between(3, 12))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(topV)
    // bounded model-sized collect: topV (word, count) rows
    val vocab = words.as[(String, Long)].collect()
    var seqs: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for { (syms, c) <- seqs; i <- 0 until syms.length - 1 }
        pairCnt.updateWith((syms(i), syms(i + 1)))(
          p => Some(p.getOrElse(0L) + c))
      if (pairCnt.nonEmpty) {
        val ((a, b), cnt) =
          pairCnt.minBy { case ((l, rt), c) => (-c, l, rt) }
        merges += ((r.toLong, a, b, cnt))
        seqs = seqs.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
      }
    }
    merges.toSeq
  }

  /** BPE encode — the apply half of the tokenizer loop: the K merges
    * learned by [[q204BpeMerges]] (a model-sized list) are applied to
    * the FULL corpus vocabulary as a chain of K literal string
    * replacements over a marker-prefixed symbol encoding ("cat" →
    * "@c@a@t"; merge (a,b) = replace "@a@b" → "@ab"). The marker
    * prefix means adjacent matches share no boundary characters, so
    * non-overlapping left-to-right replace IS greedy-leftmost BPE
    * application, identically in both engines. Map-only over the word
    * table after one distributed frequency agg; reports the top-30
    * resulting subword tokens by weighted frequency. Merge symbols
    * are [a-z]-only, so inlining them as literals is injection-safe. */
  def q207BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val merges = bpeLearnedMerges(s, dir)
    val encoded = merges.foldLeft(
      regexp_replace(col("w"), "(.)", "@$1")) { case (c, (_, a, b, _)) =>
      call_function("replace", c, lit(s"@$a@$b"), lit(s"@$a$b"))
    }
    t(s, dir, "documents")
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")).between(3, 12))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("repr", encoded)
      .select(explode(split(col("repr"), "@")).as("token"), col("cnt"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(sum(col("cnt")).as("weight"))
      .orderBy(col("weight").desc, col("token").asc)
      .limit(30)
  }

  /** CUSUM change-point detection over the daily revenue series —
    * the classic mean-shift detector: the cumulative sum of deviations
    * from the global mean drifts when the level shifts, and the
    * |CUSUM| peak marks the most likely change point. Entirely exact
    * integer arithmetic: deviations are scaled by the day count
    * (D·r_d − T instead of r_d − T/D) so no mean division ever
    * happens; the peak test is an integer comparison against the
    * global max. Scale: one hash-agg collapses the fact table to
    * days, the single-partition cumulative window runs on the
    * days-sized aggregate (bounded by calendar, not data), and the
    * two scalars ride a broadcast. Long-range bound: D·T ≤ 366·Σcents
    * stays far under 2^63 even at 100 TB revenue volumes. */
  def q205CusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .filter(year(col("o_orderdate")) === 1997)
      .groupBy(col("o_orderdate").as("d"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("cents"))
    val tot = daily.agg(count(lit(1)).as("nd"), sum(col("cents")).as("t"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cusum = daily.crossJoin(broadcast(tot))
      .withColumn("cusum",
        sum(col("nd") * col("cents") - col("t")).over(w))
    cusum
      .withColumn("peak", max(abs(col("cusum"))).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("cents"), col("cusum"),
        (abs(col("cusum")) === col("peak")).as("is_change_point"))
      .orderBy("day")
  }

  /** Isotonic calibration curve — fit a monotone success-rate curve
    * over integer score bins with the exact max-min characterization
    * of the L2 isotonic (PAVA) solution: fitted_j = max_{i≤j}
    * min_{k≥j} rate(i..k). Scores are quantized to cents and binned
    * by exact integer arithmetic (no ntile — ties would make the fit
    * order-dependent); per-bin counts and prefix sums are exact ints;
    * each range rate is ONE double division, and min/max over doubles
    * are order-independent, so the fit hashes identically across
    * engines. Scale: the fact scan collapses to B=20 bins in one
    * hash-agg; the O(B²)=210-range expansion and the max-min join run
    * on the bin table — model-sized work, like the Lloyd step. */
  def q206IsotonicCalibration(s: SparkSession, dir: String): DataFrame = {
    val B = 20
    val ev = t(s, dir, "events")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val bounds = ev.agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
    val binned = ev.crossJoin(broadcast(bounds))
      .withColumn("bin",
        expr(s"(c - lo) * $B DIV (hi - lo + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val wp = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = binned
      .withColumn("pn", sum(col("n")).over(wp))
      .withColumn("pp", sum(col("pos")).over(wp))
    // ranges(i,k): rate over bins i..k from prefix-sum differences
    val lo = pre.select(col("bin").as("i"), col("pn").as("pni"),
      col("pp").as("ppi"), col("n").as("ni"), col("pos").as("posi"))
    val hi = pre.select(col("bin").as("k"), col("pn").as("pnk"),
      col("pp").as("ppk"))
    val ranges = lo.join(hi, col("i") <= col("k"))
      .select(col("i"), col("k"),
        ((col("ppk") - col("ppi") + col("posi")).cast("double") /
          (col("pnk") - col("pni") + col("ni")).cast("double")).as("rate"))
    val fit = binned.select(col("bin")).join(ranges,
        col("i") <= col("bin") && col("bin") <= col("k"))
      .groupBy(col("bin"), col("i"))
      .agg(min(col("rate")).as("mn"))
      .groupBy(col("bin"))
      .agg(max(col("mn")).as("fitted_raw"))
    binned.join(fit, Seq("bin"))
      .select(col("bin"), col("n"), col("pos"),
        f6(col("pos").cast("double") / col("n").cast("double"))
          .as("raw_rate"),
        f6(col("fitted_raw")).as("fitted_rate"))
      .orderBy("bin")
  }

  /** Collocation mining by lift — the PMI family without the log:
    * lift(a,b) = P(ab) / (P(a)·P(b)) over adjacent word pairs, which
    * surfaces phrases ("neural networks") over merely-common pairs
    * ("of the"). Bigrams come from a map-only higher-order-function
    * expansion of each document's token array (transform over
    * sequence — no window, no shuffle per pair); unigram and bigram
    * counts are exact integers from two hash-aggs; the corpus scalars
    * ride a broadcast. Lift is ONE double expression (counts promoted
    * to double only at the end — the integer cross-product would
    * overflow 2^63 at 100 TB token counts, the double path scales),
    * f6-truncated, and the ordering key is that identical double in
    * both engines. Min support 5 keeps noise bigrams out. */
  def q208CollocationLift(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ts"))
    val uni = toks.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val nw = uni.agg(sum(col("n")).as("nw"))
    val bi = toks.filter(size(col("ts")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(ts) - 1),
          |  i -> struct(element_at(ts, i) AS wa,
          |              element_at(ts, i + 1) AS wb))""".stripMargin))
        .as("p"))
      .select(col("p.wa").as("wa"), col("p.wb").as("wb"))
      .groupBy("wa", "wb").agg(count(lit(1)).as("nab"))
    val nb = bi.agg(sum(col("nab")).as("nb"))
    // unigram joins stay shuffle joins: the vocabulary is corpus-sized
    // (not broadcastable at 100 TB); only the two 1-row scalars ride a
    // broadcast
    bi.filter(col("nab") >= 5)
      .join(uni.withColumnRenamed("w", "wa")
        .withColumnRenamed("n", "na"), Seq("wa"))
      .join(uni.withColumnRenamed("w", "wb")
        .withColumnRenamed("n", "nbw"), Seq("wb"))
      .crossJoin(broadcast(nw)).crossJoin(broadcast(nb))
      .select(col("wa"), col("wb"), col("nab"), col("na"),
        col("nbw").as("nb_uni"),
        f6(col("nab").cast("double") * col("nw").cast("double") *
          col("nw").cast("double") /
          (col("nb").cast("double") * col("na").cast("double") *
            col("nbw").cast("double"))).as("lift"))
      .orderBy(col("lift").desc, col("wa").asc, col("wb").asc)
      .limit(30)
  }

  /** Gini coefficient of revenue concentration across customers — the
    * canonical inequality metric, computed exactly: with revenues
    * ranked ascending (ties broken by key; the Gini sum is invariant
    * to the tie order since equal values commute), Gini =
    * (Σ(2i−n−1)·r_i) / (n·Σr) = (Σ(2·i0+1)·r_i − n·Σr) / (n·Σr).
    * The rank comes from [[Ranking.globalIndex]] — a range-partitioned
    * sort with per-partition offsets, never a single-partition window.
    * The weighted sum runs in DECIMAL(38,0) (HUGEINT in the oracle):
    * at 10⁹ customers × 10¹⁰ cents the int64 product overflows, the
    * 128-bit path does not. ONE double division at the end. */
  def q209GiniRevenue(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("r"))
    val idx = Ranking.globalIndex(rev, Seq("r", "o_custkey"), "i0")
    val a = idx.agg(
      sum((lit(2L) * col("i0") + lit(1L)).cast(DecimalType(38, 0)) *
        col("r").cast(DecimalType(38, 0))).as("a"),
      count(lit(1)).as("n"), sum(col("r")).as("sr"))
    a.select(col("n").as("n_customers"), col("sr").as("total_cents"),
      when(col("n") > 0, f6(
        (col("a") - col("n").cast(DecimalType(38, 0)) *
          col("sr").cast(DecimalType(38, 0))).cast("double") /
          (col("n").cast("double") * col("sr").cast("double"))))
        .as("gini"))
  }

  /** Expected calibration error, integer-exact: scores quantized to
    * cents and normalized by the integer width W = hi−lo+1, binned as
    * in q206; per-bin |accuracy − confidence| has the common
    * denominator n_b·W, so the bin gap |pos_b·W − S_b| and its sum
    * are exact BIGINTs, and ECE = Σgap / (N·W) is ONE double division
    * at the end. One hash-agg to B=20 bins; scalars ride a broadcast.
    * Long bound: pos·W ≤ 10¹²·5·10⁴ ≈ 5·10¹⁶ at 100 TB event counts. */
  def q210CalibrationEce(s: SparkSession, dir: String): DataFrame = {
    val B = 20
    val ev = t(s, dir, "events")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val bounds = ev.agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
    val binned = ev.crossJoin(broadcast(bounds))
      .withColumn("bin", expr(s"(c - lo) * $B DIV (hi - lo + 1)"))
      .withColumn("w", col("hi") - col("lo") + lit(1L))
      .groupBy(col("bin"), col("w"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        sum(col("c") - col("lo")).as("sb"))
    binned
      .agg(sum(col("n")).as("n_events"), max(col("w")).as("width"),
        sum(abs(col("pos") * col("w") - col("sb"))).as("gap_sum"))
      .select(col("n_events"), col("width"), col("gap_sum"),
        when(col("n_events") > 0, f6(col("gap_sum").cast("double") /
          (col("n_events").cast("double") * col("width").cast("double"))))
          .as("ece"))
  }

  /** Mean reciprocal rank of the purchase event within each user's
    * value-ranked event list — the ranking-eval staple, made portable
    * by integer scaling: per user, rr = 1000000 DIV rank (exact int,
    * quantization error < 10⁻⁶), summed exactly, ONE double division
    * at the end. The rank is a per-user window (millions of small
    * partitions — the scale-safe window shape), users without a
    * purchase contribute nothing, and the final aggregate is one row. */
  def q211PurchaseMrr(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val ranked = t(s, dir, "events")
      .withColumn("rk", row_number().over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(col("rk")).as("first_rk"))
    ranked
      .agg(count(lit(1)).as("n_users"),
        sum(expr("1000000 DIV first_rk")).as("rr_scaled"))
      .select(col("n_users"), col("rr_scaled"),
        when(col("n_users") > 0, f6(col("rr_scaled").cast("double") /
          (col("n_users").cast("double") * lit(1000000.0)))).as("mrr"))
  }

  /** ROC AUC of "value predicts purchase", computed exactly as the
    * tie-corrected Mann–Whitney statistic: AUC = [#(pos>neg pairs) +
    * ½·#(ties)] / (P·N). Aggregating to one row per distinct cent
    * score first makes every term integral — with neg_below from
    * [[Ranking.globalCumSum]] (the two-phase range-bucketed prefix
    * sum; a bare `ORDER BY` window would be one task), the doubled
    * numerator 2U = Σ_s pos_s·(2·neg_below_s + neg_s) is exact in
    * DECIMAL(38,0) (HUGEINT in the oracle) up to ~10¹² events per
    * class, and AUC = 2U / (2·P·N) is ONE double division. */
  def q212RocAuc(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val byScore = ev.groupBy(col("c"))
      .agg(sum(col("y")).as("pos"),
        (count(lit(1)) - sum(col("y"))).as("neg"))
    val cum = Ranking.globalCumSum(byScore, "c", Seq("neg"))
    val agg = cum
      .select(col("pos"), col("neg"),
        (col("cum_neg") - col("neg")).as("nb"))
      .agg(sum(col("pos")).as("p"), sum(col("neg")).as("n"),
        sum(col("pos").cast(DecimalType(38, 0)) *
          (lit(2L) * col("nb") + col("neg")).cast(DecimalType(38, 0)))
          .as("u2"))
    agg.select(col("p").as("n_pos"), col("n").as("n_neg"),
      when(col("p") > 0 && col("n") > 0,
        f6(col("u2").cast("double") /
          (lit(2.0) * col("p").cast("double") * col("n").cast("double"))))
        .as("auc"))
  }

  /** Spearman rank correlation between quantity and extended price —
    * Pearson on tie-averaged ranks, every rank integral by the ×2
    * trick: for a value with cnt occurrences and `below` rows under
    * it, 2·avgrank = 2·below + cnt + 1. Ranks come from per-variable
    * distinct-value tables through [[Ranking.globalCumSum]] (never a
    * global window), joined back onto the fact rows; moments over the
    * doubled ranks are exact in DECIMAL(38,0) (rank ≤ 2n, square ≤
    * 4n², sum ≤ 4n³ < 10³⁸ up to n ≈ 10¹² rows), and the correlation
    * is the q118 one-double-expression shape. Emitted next to plain
    * Pearson on the cent values — same moments pass, so the rank-vs-
    * linear contrast costs nothing extra. */
  def q213Spearman(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select((col("l_quantity").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("x"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
          .cast("long").as("y"))
    def ranks2(src: String): DataFrame = {
      val d = li.groupBy(col(src)).agg(count(lit(1)).as("cnt"))
      Ranking.globalCumSum(d, src, Seq("cnt"))
        .select(col(src),
          (lit(2L) * (col("cum_cnt") - col("cnt")) + col("cnt") + lit(1L))
            .as(s"r$src"))
    }
    val ranked = li.join(ranks2("x"), Seq("x")).join(ranks2("y"), Seq("y"))
    val dec = DecimalType(38, 0)
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(col("rx").cast(dec)).cast("double").as("sx"),
      sum(col("ry").cast(dec)).cast("double").as("sy"),
      sum((col("rx").cast(dec) * col("rx").cast(dec))).cast("double")
        .as("sxx"),
      sum((col("ry").cast(dec) * col("ry").cast(dec))).cast("double")
        .as("syy"),
      sum((col("rx").cast(dec) * col("ry").cast(dec))).cast("double")
        .as("sxy"),
      sum(col("x").cast(dec)).cast("double").as("vx"),
      sum(col("y").cast(dec)).cast("double").as("vy"),
      sum((col("x").cast(dec) * col("x").cast(dec))).cast("double")
        .as("vxx"),
      sum((col("y").cast(dec) * col("y").cast(dec))).cast("double")
        .as("vyy"),
      sum((col("x").cast(dec) * col("y").cast(dec))).cast("double")
        .as("vxy"))
    val nd = col("n").cast("double")
    def corr(sx: Column, sy: Column, sxx: Column, syy: Column,
        sxy: Column): Column =
      (nd * sxy - sx * sy) /
        (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))
    m.select(col("n"),
      when(col("n") > 1, f6(corr(col("sx"), col("sy"), col("sxx"),
        col("syy"), col("sxy")))).as("spearman"),
      when(col("n") > 1, f6(corr(col("vx"), col("vy"), col("vxx"),
        col("vyy"), col("vxy")))).as("pearson"))
  }

  /** Two-feature OLS with intercept — extendedprice regressed on
    * quantity and discount — solved in closed form from the normal
    * equations: ONE distributed pass computes the ten Gram-matrix
    * moments EXACTLY (cents-scaled ints summed in DECIMAL(38,0) /
    * HUGEINT; x²·n ≤ 10²⁶ at 10¹² rows), then Cramer's rule on the
    * 3×3 system runs on the driver side of the aggregate as a fixed
    * double expression tree — bit-identical across engines because
    * the parenthesization is pinned and both sides evaluate IEEE
    * doubles in written order. This is the scale shape for linear
    * model fitting: model work is O(p²) per partition (map-side
    * combine), never an iterative pass over data. R² comes free from
    * the same moments. */
  def q214OlsNormalEq(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val li = t(s, dir, "lineitem").select(
      (col("l_quantity").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("x1"),
      (col("l_discount").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("x2"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("y"))
    def sd(c: Column): Column = sum(c.cast(dec)).cast("double")
    val m = li.agg(count(lit(1)).as("n"),
      sd(col("x1")).as("s1"), sd(col("x2")).as("s2"), sd(col("y")).as("sy"),
      sum((col("x1").cast(dec) * col("x1").cast(dec))).cast("double")
        .as("s11"),
      sum((col("x1").cast(dec) * col("x2").cast(dec))).cast("double")
        .as("s12"),
      sum((col("x2").cast(dec) * col("x2").cast(dec))).cast("double")
        .as("s22"),
      sum((col("x1").cast(dec) * col("y").cast(dec))).cast("double")
        .as("s1y"),
      sum((col("x2").cast(dec) * col("y").cast(dec))).cast("double")
        .as("s2y"),
      sum((col("y").cast(dec) * col("y").cast(dec))).cast("double")
        .as("syy"))
    val nd = col("n").cast("double")
    val det = nd * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val d0 = col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y")) +
      col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))
    val d1 = nd * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
      col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
    val d2 = nd * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
      col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
      col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val b0 = d0 / det
    val b1 = d1 / det
    val b2 = d2 / det
    val sse = col("syy") -
      (b0 * col("sy") + b1 * col("s1y") + b2 * col("s2y"))
    val sst = col("syy") - col("sy") * col("sy") / nd
    val ok = col("n") > 2 && det =!= lit(0.0)
    m.select(col("n"),
      when(ok, f6(b0)).as("beta0"),
      when(ok, f6(b1)).as("beta1"),
      when(ok, f6(b2)).as("beta2"),
      when(ok && sst =!= lit(0.0), f6(lit(1.0) - sse / sst)).as("r2"))
  }

  /** Decision-stump split selection by exact Gini impurity: candidate
    * thresholds are the inner boundaries of 20 equi-width bins over
    * the cent-quantized score (the q210 binning), each side's
    * (count, positives) comes from bin counts run through a prefix
    * sum over the ≤20-row bin table — bounded by B, not by data, so
    * the bare window is scale-safe — and the weighted impurity
    * 2·(pL·negL/nL + pR·negR/nR)/N has an exact integer core
    * (pL·negL ≤ 10²⁴ rides DECIMAL(38,0)/HUGEINT) with the division
    * tree pinned identically in both engines. Emitting the whole
    * 19-candidate impurity curve (not just the argmin) keeps the
    * result tie-proof and shows the optimization surface. */
  def q215GiniStump(s: SparkSession, dir: String): DataFrame = {
    val B = 20
    val dec = DecimalType(38, 0)
    val ev = t(s, dir, "events")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val bounds = ev.agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
    val bins = ev.crossJoin(broadcast(bounds))
      .withColumn("bin", expr(s"(c - lo) * $B DIV (hi - lo + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("nl", sum(col("n")).over(w))
      .withColumn("pl", sum(col("pos")).over(w))
    val tot = cum.agg(max(col("nl")).as("nt"), max(col("pl")).as("pt"))
    val cand = cum.crossJoin(broadcast(tot))
      .filter(col("nl") < col("nt")) // inner boundaries only
      .select(
        expr(s"lo + (bin + 1) * (hi - lo + 1) DIV $B").as("thr"),
        col("nl"), col("pl"),
        (col("nt") - col("nl")).as("nr"), (col("pt") - col("pl")).as("pr"),
        col("nt"))
    cand.select(col("thr"), col("nl").as("n_left"),
      col("pl").as("pos_left"), col("nr").as("n_right"),
      col("pr").as("pos_right"),
      f6(lit(2.0) *
        ((col("pl").cast(dec) * (col("nl") - col("pl")).cast(dec))
          .cast("double") / col("nl").cast("double") +
          (col("pr").cast(dec) * (col("nr") - col("pr")).cast(dec))
            .cast("double") / col("nr").cast("double")) /
        col("nt").cast("double")).as("gini_split"))
      .orderBy(col("thr"))
  }

  /** Naive-Bayes classification of market segment from order priority
    * and status, EXACT end to end: training is three count aggregates
    * (class, feature×class — the NB "model" is just contingency
    * tables, the ideal distributed shape), and the per-combo argmax
    * avoids floating likelihoods entirely — unsmoothed posterior ∝
    * c(pri,seg)·c(st,seg)/c(seg), so "b beats a" is the exact
    * 128-bit cross-multiplication b.num·a.den > a.num·b.den
    * (num ≤ 10²⁴, ×den 10¹² = 10³⁶ < 10³⁸ even at 10¹² training
    * rows), ties broken by smallest segment label. The model tables
    * (5·25·15 rows) ride broadcast joins; the emitted score is ONE
    * double division for display only — selection never touches a
    * float. */
  def q216NaiveBayes(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderpriority").as("pri"),
        col("o_orderstatus").as("st"), col("c_mktsegment").as("seg"))
    val nTot = base.agg(count(lit(1)).as("n_total"))
    val segs = base.groupBy(col("seg")).agg(count(lit(1)).as("c_seg"))
    val ps = base.groupBy(col("pri"), col("seg"))
      .agg(count(lit(1)).as("c_ps"))
    val ss = base.groupBy(col("st"), col("seg"))
      .agg(count(lit(1)).as("c_ss"))
    val scores = ps.join(broadcast(ss), Seq("seg"))
      .join(broadcast(segs), Seq("seg"))
      .select(col("pri"), col("st"), col("seg"),
        (col("c_ps").cast(dec) * col("c_ss").cast(dec)).as("num"),
        col("c_seg").as("den"))
    val b = scores.select(col("pri").as("b_pri"), col("st").as("b_st"),
      col("seg").as("b_seg"), col("num").as("b_num"),
      col("den").as("b_den"))
    val beaten = col("b_num") * col("den").cast(dec) >
      col("num") * col("b_den").cast(dec) ||
      (col("b_num") * col("den").cast(dec) ===
        col("num") * col("b_den").cast(dec) &&
        col("b_seg") < col("seg"))
    val winners = scores.join(broadcast(b),
      col("pri") === col("b_pri") && col("st") === col("b_st") && beaten,
      "left_anti")
    winners.crossJoin(broadcast(nTot))
      .select(col("pri"), col("st"), col("seg").as("pred_segment"),
        f6(col("num").cast("double") /
          (col("den").cast("double") * col("n_total").cast("double")))
          .as("score"))
      .orderBy(col("pri"), col("st"))
  }

  /** t-closeness audit over the q136/q173 quasi-identifier groups:
    * for the ORDERED sensitive attribute (the q173 $1000 balance
    * band), Earth Mover's Distance between a group's distribution and
    * the global one is the mean |cumulative difference| — kept exact
    * by the common denominator n_g·N: cum_i = Σ_{j≤i}(cnt_gj·N −
    * cnt_j·n_g) is an integer (≤10²⁴ at 10¹² rows, DECIMAL(38,0) /
    * HUGEINT), and EMD = Σ|cum_i| / ((m−1)·n_g·N) is ONE double
    * division. The dense group×band grid comes from a broadcast of
    * the ≤dozens-row band list; the running sum is a per-group window
    * over ≤m rows — bounded by the attribute domain, not by data. */
  def q217TCloseness(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cents = (col("c_acctbal").cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val d = t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(cents / lit(100000)).as("band"))
    val globalBand = d.groupBy(col("band")).agg(count(lit(1)).as("cnt_g"))
    val scalars = globalBand.agg(sum(col("cnt_g")).as("n_all"),
      count(lit(1)).as("m"))
    val groups = d.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("ng"))
    val cells = d.groupBy(col("c_mktsegment"), col("c_nationkey"),
      col("band")).agg(count(lit(1)).as("cnt"))
    val grid = groups.crossJoin(broadcast(globalBand))
      .join(cells, Seq("c_mktsegment", "c_nationkey", "band"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val w = Window.partitionBy(col("c_mktsegment"), col("c_nationkey"))
      .orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.crossJoin(broadcast(scalars))
      .withColumn("diff", col("cnt").cast(dec) * col("n_all").cast(dec) -
        col("cnt_g").cast(dec) * col("ng").cast(dec))
      .withColumn("cumd", sum(col("diff")).over(w))
    cum.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(max(col("ng")).as("n"), max(col("n_all")).as("n_all"),
        max(col("m")).as("m"), sum(abs(col("cumd"))).as("sa"))
      .select(col("c_mktsegment"), col("c_nationkey"), col("n"),
        when(col("m") > 1, f6(col("sa").cast("double") /
          ((col("m") - 1).cast("double") * col("n").cast("double") *
            col("n_all").cast("double")))).as("emd"))
      .orderBy(col("c_mktsegment"), col("c_nationkey"))
  }

  /** Vocabulary growth curve (the Heaps-law saturation diagnostic a
    * corpus build watches to decide "is more data still adding new
    * words?"): walk the corpus in doc_id order, and at each decile of
    * documents report cumulative docs, token instances, and DISTINCT
    * vocabulary. Entirely integer-exact — no floats anywhere. The
    * scale trick is that "distinct so far" needs no re-scan per
    * checkpoint: each token's contribution is fully determined by its
    * FIRST document (one groupBy-min over the exploded tokens), so
    * vocabulary-new-per-decile is a count over first occurrences, and
    * the cumulative ride a 10-row window. Deciles come from
    * [[Ranking.globalIndex]], never a global ntile window. */
  def q218VocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dec = Ranking.globalIndex(
      docs.select(col("doc_id"), size(col("toks")).cast("long")
        .as("n_toks")), Seq("doc_id"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("n_toks"),
        expr("gidx * 10 DIV n_docs").as("decile"))
    val perDec = dec.groupBy(col("decile"))
      .agg(count(lit(1)).as("nd"), sum(col("n_toks")).as("tok"))
    val firstDoc = docs
      .select(explode(array_distinct(col("toks"))).as("token"),
        col("doc_id"))
      .groupBy(col("token")).agg(min(col("doc_id")).as("first_doc"))
    val newVocab = firstDoc
      .join(dec.select(col("doc_id").as("first_doc"), col("decile")),
        Seq("first_doc"))
      .groupBy(col("decile")).agg(count(lit(1)).as("nv"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDec.join(newVocab, Seq("decile"), "left")
      .withColumn("nv", coalesce(col("nv"), lit(0L)))
      .select(col("decile"),
        sum(col("nd")).over(w).as("docs_cum"),
        sum(col("tok")).over(w).as("tokens_cum"),
        sum(col("nv")).over(w).as("vocab_cum"))
      .orderBy(col("decile"))
  }

  /** Embedding-distribution drift per label: cosine between each
    * label's centroid and the global centroid — the cheap first-order
    * check that a source/class occupies the same region of embedding
    * space as the corpus. Exactness comes from the q109 idiom:
    * components quantize to 2²⁰ fixed-point BEFORE summing (float
    * addition is order-dependent; integer addition is not), the n
    * denominators cancel inside the cosine so SUM vectors stand in
    * for means, and dot/norms are exact DECIMAL(38,0)/HUGEINT sums
    * (label-sum 10¹⁸ × global-sum bound: exact to ~10¹⁷ rows) with
    * sqrt only in the final pinned double expression. One shuffle to
    * (label, dim) — 640 cells — then model-sized joins. */
  def q219EmbeddingDrift(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val q = t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("j0", "v")))
      .select(col("label"), (col("j0") + 1).as("j"),
        floor(col("v").cast("double") * lit(1048576.0)).cast("long")
          .as("qv"))
    val lj = q.groupBy(col("label"), col("j")).agg(sum(col("qv")).as("sl"))
    val g = lj.groupBy(col("j")).agg(sum(col("sl")).as("sg"))
    val a = lj.join(broadcast(g), Seq("j"))
      .groupBy(col("label"))
      .agg(sum(col("sl").cast(dec) * col("sg").cast(dec)).as("dot"),
        sum(col("sl").cast(dec) * col("sl").cast(dec)).as("nl2"),
        sum(col("sg").cast(dec) * col("sg").cast(dec)).as("ng2"))
    val n = t(s, dir, "embeddings").groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"))
    a.join(n, Seq("label"))
      .select(col("label"), col("n_vecs"),
        f6(col("dot").cast("double") /
          (sqrt(col("nl2").cast("double")) *
            sqrt(col("ng2").cast("double")))).as("cos_to_global"))
      .orderBy(col("label"))
  }

  /** Robust-winnowing fingerprints (the MOSS scheme) — the dedup
    * family's guarantee-bearing alternative to q35's whole-doc hash
    * and q29's MinHash: selecting the minimum trigram hash in every
    * window of W=4 consecutive grams guarantees any shared run of
    * ≥ W+K−1 tokens yields a shared fingerprint, at ~2/(W+1) the
    * stored density. The rightmost-minimum tie rule rides a single
    * integer: c = h·2²⁰ + (2²⁰−1−i) makes min(c) pick the smallest
    * hash and, among equals, the LARGEST position — no struct
    * comparison, portable to any engine (h < 2³⁰ from md5Mod, gram
    * positions < 2²⁰ documented). Per-doc windows are bounded by doc
    * length; the overlap join runs on distinct fingerprint hashes
    * with a df ≤ 100 hot-hash cap (the LSH hot-bucket convention). */
  def q220Winnowing(s: SparkSession, dir: String): DataFrame = {
    val W = 4
    val shift = 1048576L // 2^20
    // trigram hashes via the NATIVE shingle kernel (r16, guide §1.2
    // step 2): ShingleHashes is hash-identical to the old
    // tokenize → transform/element_at/concat → md5Mod chain
    // (HashingSpec pins the equivalence) but runs one flat pass
    // instead of an interpreted per-gram lambda tree. The per-doc gram
    // COUNT is the array's size, read before the explode — which
    // deletes the whole-doc count() window (a full extra pass over
    // every gram row) outright.
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      // single-row-group fixture ⇒ one scan task; spread the rows
      // BEFORE the tokenize/hash kernel so it runs suite-wide, not
      // serially in the scan task (r16, the wave-2 q309 treatment)
      .repartition(
        s.sessionState.conf.numShufflePartitions, col("doc_id"))
      .filter(size(TextAnalysis.tokens(col("text"))) >= 3)
      .select(col("doc_id"),
        Dedup.shingleHashes(col("text"), 3, mod = true).as("hs"))
    // sliding minima via the WORK-PROPORTIONAL native kernel (r17):
    // WinnowFingerprints walks each doc's gram-hash array once and
    // emits the adjacent-deduped window minima (wmin DIV shift)
    // directly — ~0.4 output values per gram. The r16
    // explode-to-window-starts aggregate it replaces was plan-clean
    // (no WindowExec, no extra exchange) but multiplied every gram
    // row by W = 4 and re-aggregated the blow-up: ~17× the executor
    // task-time of the r15 window for the same answer (the round-16
    // verdict's one condemned rewrite — wall only looked fine because
    // idle local cores absorbed it). The r15 WindowExec itself paid a
    // per-doc-GROUP frame setup under Spark's codegen KeyLock across
    // 291k doc groups; the kernel pays neither. Equivalence to the
    // aggregate formulation is pinned by WinnowSpec; with the input
    // hash-partitioned by doc_id upstream the fingerprint distinct
    // still satisfies its clustering with no further exchange, so the
    // whole tokenize→shingle→winnow→distinct chain remains one
    // codegen stage.
    val fps = docs
      .select(col("doc_id"),
        explode(Dedup.winnowFingerprints(col("hs"), W, shift)).as("h"))
      .distinct()
      // materialized once (r16): fps feeds the df-cap aggregate AND
      // both sides of the overlap self-join — un-pinned, the whole
      // tokenize/hash/window chain re-ran per consumer
      .localCheckpoint(true)
    val dfCap = fps.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 100)
    val kept = fps.join(dfCap.select("h"), Seq("h"))
    kept.select(col("h"), col("doc_id").as("doc_a"))
      .join(kept.select(col("h"), col("doc_id").as("doc_b")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** Markov-chain conversion attribution: from per-user journeys,
    * estimate P(reach 'purchase' before dropping | current state) —
    * the absorbing-chain readout behind removal-effect attribution.
    * The DATA pass is distributed (one per-user lead() window —
    * millions of small partitions — plus a transition-count
    * aggregate); the chain itself is a ≤|types|²-row MODEL, so the
    * 8 value-iteration rounds run exactly on the driver in BigInt
    * 10¹²-fixed-point (the bounded model-sized materialization the
    * IVF/bloom operators already use), with integer-DIV truncation
    * each round replayed bit-for-bit by the oracle's 8 chained
    * HUGEINT CTEs (the q82 PageRank pattern). Transitions out of
    * 'purchase' are absorbed; journey ends fall into 'drop'. */
  def q221MarkovAttribution(s: SparkSession, dir: String): DataFrame = {
    val scale = 1000000000000L // 10^12 fixed-point
    val rounds = 8
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = t(s, dir, "events")
      .select(col("event_type").as("src"),
        coalesce(lead(col("event_type"), 1).over(w), lit("drop"))
          .as("dst"))
      .filter(col("src") =!= "purchase")
    val trans = steps.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("cnt"))
    // bounded collect: |event_types|² rows — the model, not the data
    val edges = trans.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val tots = edges.groupBy(_._1).map { case (s0, es) =>
      (s0, es.map(_._3).sum)
    }
    var p: Map[String, BigInt] =
      tots.keys.map(_ -> BigInt(0)).toMap
    for (_ <- 1 to rounds) {
      p = tots.map { case (s0, tot) =>
        val num = edges.filter(_._1 == s0).map { case (_, dst, cnt) =>
          val pd =
            if (dst == "purchase") BigInt(scale)
            else if (dst == "drop") BigInt(0)
            else p.getOrElse(dst, BigInt(0))
          BigInt(cnt) * pd
        }.sum
        s0 -> num / BigInt(tot)
      }
    }
    import s.implicits._
    val model = tots.toSeq.sorted
      .map { case (s0, tot) => (s0, tot, p(s0).toLong) }
      .toDF("state", "n_out", "p_scaled")
    model.select(col("state"), col("n_out"), col("p_scaled"),
      f6(col("p_scaled").cast("double") / lit(1.0e12)).as("p_convert"))
      .orderBy(col("state"))
  }

  /** Pairwise token-distribution cosine between sources — the corpus
    * drift matrix ("are these two crawls the same kind of text?"),
    * computed on SPARSE term-frequency vectors: one explode+groupBy
    * to (source, token) counts, then the dot product is a self-join
    * on token — expansion bounded by sources² per token, never a
    * dense |vocab|-wide vector — and norms are one aggregate per
    * source. All moments exact (tf ≤ 10¹² → products 10²⁴ in
    * DECIMAL(38,0)/HUGEINT); sqrt only in the final pinned double. */
  def q222SourceTokenCosine(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val tf = t(s, dir, "documents")
      .select(col("source"), explode(TextAnalysis.tokens(col("text")))
        .as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("tf"))
    val norms = tf.groupBy(col("source"))
      .agg(sum(col("tf").cast(dec) * col("tf").cast(dec)).as("n2"))
    val dots = tf.select(col("token"), col("source").as("source_a"),
      col("tf").as("tf_a"))
      .join(tf.select(col("token"), col("source").as("source_b"),
        col("tf").as("tf_b")), Seq("token"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared_tokens"),
        sum(col("tf_a").cast(dec) * col("tf_b").cast(dec)).as("dot"))
    dots
      .join(broadcast(norms.select(col("source").as("source_a"),
        col("n2").as("n2_a"))), Seq("source_a"))
      .join(broadcast(norms.select(col("source").as("source_b"),
        col("n2").as("n2_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared_tokens"),
        f6(col("dot").cast("double") /
          (sqrt(col("n2_a").cast("double")) *
            sqrt(col("n2_b").cast("double")))).as("cosine"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Reciprocal-rank fusion of two document rankings (the standard
    * multi-retriever merge): score(d) = Σ_r 1/(60 + rank_r(d)), made
    * engine-exact by integer scaling — 10⁶ DIV (60 + r) per
    * retriever, summed as exact longs, ONE display division at the
    * end. Rankings come from [[Ranking.globalIndex]] over tie-broken
    * sort keys (never a global row_number window); the fused top-20
    * is a total order (score desc, doc_id). */
  def q223RrfFusion(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"))
    def rankBy(key: String, out: String): DataFrame =
      Ranking.globalIndex(
        docs.select(col("doc_id"), (-col(key)).as("neg")),
        Seq("neg", "doc_id"))
        .select(col("doc_id"), (col("gidx") + 1).as(out))
    val fused = docs
      .join(rankBy("n_chars", "r_chars"), Seq("doc_id"))
      .join(rankBy("n_toks", "r_toks"), Seq("doc_id"))
      .select(col("doc_id"), col("r_chars"), col("r_toks"),
        (expr("1000000 DIV (60 + r_chars)") +
          expr("1000000 DIV (60 + r_toks)")).as("rrf_scaled"))
    fused.orderBy(col("rrf_scaled").desc, col("doc_id")).limit(20)
      .select(col("doc_id"), col("r_chars"), col("r_toks"),
        col("rrf_scaled"),
        f6(col("rrf_scaled").cast("double") / lit(1000000.0)).as("rrf"))
  }

  /** Nelson–Aalen cumulative hazard of order fulfillment (time from
    * order date to the LAST line shipment), with honest
    * right-censoring: orders whose final receipt lands in the last 7
    * days of the observed window are censored — they contribute
    * at-risk time but no completion event. At-risk counts come from
    * one [[Ranking.globalCumSum]] over the per-day exit counts
    * (n_risk(t) = N − exits_before_t); each hazard increment
    * d_t·10¹² DIV n_risk(t) is an exact scaled integer (the q211
    * trick — deterministic in any engine, quantization < 10⁻⁶ per
    * step), and H(t) is a second cumulative pass. The data passes
    * are one orders⋈lineitem join + per-order max; everything after
    * runs on the distinct-day table. */
  def q224CumulativeHazard(s: SparkSession, dir: String): DataFrame = {
    val users = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(max(to_date(col("o_orderdate"))).as("first_d"),
        max(to_date(col("l_shipdate"))).as("last_d"))
      // lazy local checkpoint: `users` feeds the horizon aggregate AND
      // the lives projection (and byDay feeds globalCumSum's three
      // consumers) — without it the orders⋈lineitem shuffle join
      // re-executes once per consumer and dominates the query. An
      // |orders|-sized aggregate: exactly what a 100 TB run caches.
      .localCheckpoint(false)
    val horizon = users.agg(max(col("last_d")).as("h"),
      count(lit(1)).as("n_users"))
    val lives = users.crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long")
        .as("life"),
        (col("last_d") <= date_add(col("h"), -7)).as("uncensored"),
        col("n_users"))
    val byDay = lives.groupBy(col("life"))
      .agg(count(lit(1)).as("m"),
        sum(when(col("uncensored"), 1L).otherwise(0L)).as("deaths"),
        max(col("n_users")).as("n_users"))
    // BOUNDED-domain global windows (r17), not globalCumSum: byDay has
    // one row per distinct lifetime DAY — calendar-bounded (thousands
    // of rows at any corpus scale), the same boundedness argument as
    // the histogram/contingency operators — so the range-bucketed
    // machinery was pure fixed cost here: two lazy checkpoints, two
    // bounds aggregates, four window passes and two offset joins where
    // two single-sort windows over a model-sized frame produce the
    // identical exact integers. Both windows share one ordering, so
    // the whole post-join story is one tiny stage.
    val wCum = Window.orderBy(col("life"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = byDay
      .withColumn("cum_m", sum(col("m")).over(wCum))
      .select(col("life"), col("deaths"),
        (col("n_users") - (col("cum_m") - col("m"))).as("n_risk"))
      .withColumn("term",
        expr("CAST(deaths AS DECIMAL(38,0)) * 1000000000000 DIV n_risk"))
    atRisk
      .withColumn("cum_term", sum(col("term")).over(wCum))
      .filter(col("deaths") > 0)
      .select(col("life").as("day"), col("n_risk"), col("deaths"),
        col("cum_term").as("h_scaled"),
        f6(col("cum_term").cast("double") / lit(1.0e12))
          .as("cum_hazard"))
      .orderBy(col("day"))
  }

  /** Kendall tau-b between quantity and discount — the
    * concordant/discordant rank correlation, EXACT: both variables
    * have bounded domains, so the joint distribution is a ≤|X|·|J|
    * contingency table (model-sized — the same boundedness argument
    * as histogram bins), and C/D are sums of f_ab·f_cd over
    * strictly-dominating cell pairs — a self-join of the tiny cell
    * table, 10²⁴-safe in DECIMAL(38,0)/HUGEINT up to 10¹² rows. Tie
    * corrections n₀,n₁,n₂ use the exact r(r−1) DIV 2 identity; the
    * final tau is the one pinned double expression with sqrts. The
    * DATA pass is a single groupBy to cells. */
  def q225KendallTau(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = t(s, dir, "lineitem")
      .select((col("l_quantity").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("x"),
        (col("l_discount").cast(DecimalType(18, 2)) * lit(100))
          .cast("long").as("j"))
      .groupBy(col("x"), col("j")).agg(count(lit(1)).as("f"))
    val b = cells.select(col("x").as("bx"), col("j").as("bj"),
      col("f").as("bf"))
    val cAgg = cells.join(b, col("bx") > col("x") && col("bj") > col("j"))
      .agg(sum(col("f").cast(dec) * col("bf").cast(dec)).as("cc"))
    val dAgg = cells.join(b, col("bx") > col("x") && col("bj") < col("j"))
      .agg(sum(col("f").cast(dec) * col("bf").cast(dec)).as("dd"))
    val nAgg = cells.agg(sum(col("f")).as("n"))
    val tiesX = cells.groupBy(col("x")).agg(sum(col("f")).as("r"))
      .agg((sum(col("r").cast(dec) * (col("r") - 1).cast(dec)))
        .as("tx2"))
    val tiesJ = cells.groupBy(col("j")).agg(sum(col("f")).as("c"))
      .agg((sum(col("c").cast(dec) * (col("c") - 1).cast(dec)))
        .as("tj2"))
    // doubled identities avoid any halving: n₀−n₁ = (A−B1)/2 with
    // A = n(n−1), so tau = 2(C−D)/(√(A−B1)·√(A−B2)) stays exact
    val m = nAgg.crossJoin(cAgg).crossJoin(dAgg)
      .crossJoin(tiesX).crossJoin(tiesJ)
      .select(col("n"),
        (col("n").cast(dec) * (col("n") - 1).cast(dec)).as("a2"),
        col("tx2"), col("tj2"), col("cc"), col("dd"))
    m.select(col("n"),
      when(col("n") > 1 && col("a2") > col("tx2") &&
        col("a2") > col("tj2"),
        f6(((col("cc") - col("dd")).cast("double") * lit(2.0)) /
          (sqrt((col("a2") - col("tx2")).cast("double")) *
            sqrt((col("a2") - col("tj2")).cast("double")))))
        .as("tau_b"))
  }

  /** Precision / recall / F1 sweep across the q215 candidate
    * thresholds ("predict purchase when value ≥ t"): TP and predicted
    * counts fall out of the same bin prefix sums (one aggregate to 20
    * bins, window over ≤20 rows), every metric is ONE exact-integer
    * division — including F1, via the identity F1 = 2·TP/(pred+P)
    * which needs no precision/recall composition — so the curve is
    * engine-exact. Completes the eval family: q212 ranks (AUC), q210
    * calibrates (ECE), this picks the operating point. */
  def q226PrCurve(s: SparkSession, dir: String): DataFrame = {
    val B = 20
    val ev = t(s, dir, "events")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val bounds = ev.agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
    val bins = ev.crossJoin(broadcast(bounds))
      .withColumn("bin", expr(s"(c - lo) * $B DIV (hi - lo + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("nl", sum(col("n")).over(w))
      .withColumn("pl", sum(col("pos")).over(w))
    val tot = cum.agg(max(col("nl")).as("nt"), max(col("pl")).as("pt"))
    cum.crossJoin(broadcast(tot))
      .filter(col("nl") < col("nt"))
      .select(expr(s"lo + (bin + 1) * (hi - lo + 1) DIV $B").as("thr"),
        (col("pt") - col("pl")).as("tp"),
        (col("nt") - col("nl") - (col("pt") - col("pl"))).as("fp"),
        col("pl").as("fn"),
        (col("nt") - col("nl")).as("pred_pos"), col("pt"))
      .select(col("thr"), col("tp"), col("fp"), col("fn"),
        when(col("pred_pos") > 0, f6(col("tp").cast("double") /
          col("pred_pos").cast("double"))).as("precision"),
        when(col("pt") > 0, f6(col("tp").cast("double") /
          col("pt").cast("double"))).as("recall"),
        when(col("pred_pos") + col("pt") > 0,
          f6((lit(2.0) * col("tp").cast("double")) /
            (col("pred_pos") + col("pt")).cast("double"))).as("f1"))
      .orderBy(col("thr"))
  }

  /** Cohen's d — the standardized effect size of purchase value vs
    * everything else, the number an A/B readout reports next to its
    * p-value. Exact cent-scaled moments per class (one aggregate,
    * map-side combinable); the pooled-variance expression
    * (m₁−m₀)/√(((sxx₁−sx₁²/n₁)+(sxx₀−sx₀²/n₀))/(n₁+n₀−2)) is a
    * single pinned double tree evaluated identically by both
    * engines. */
  def q227CohensD(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val m = t(s, dir, "events")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(col("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast(dec)).cast("double").as("sx"),
        sum(col("c").cast(dec) * col("c").cast(dec)).cast("double")
          .as("sxx"))
    val p = m.filter(col("y") === 1)
      .select(col("n").as("n1"), col("sx").as("sx1"),
        col("sxx").as("sxx1"))
    val o = m.filter(col("y") === 0)
      .select(col("n").as("n0"), col("sx").as("sx0"),
        col("sxx").as("sxx0"))
    val j = p.crossJoin(o)
    val n1d = col("n1").cast("double")
    val n0d = col("n0").cast("double")
    val d = (col("sx1") / n1d - col("sx0") / n0d) /
      sqrt(((col("sxx1") - col("sx1") * col("sx1") / n1d) +
        (col("sxx0") - col("sx0") * col("sx0") / n0d)) /
        (n1d + n0d - lit(2.0)))
    j.select(col("n1"), col("n0"),
      when(col("n1") > 1 && col("n0") > 1, f6(d)).as("cohens_d"))
  }

  /** Average precision (area under the q226 P/R curve), kept exact by
    * the bin decomposition: walking thresholds from high to low, the
    * recall increment at bin b is exactly pos_b/P, so AP = Σ_b
    * pos_b·tp_b / (P·pred_b) — each term an integer-scaled division
    * (pos·tp·10¹² DIV (P·pred), products ≤ 10³⁶ in HUGEINT /
    * DECIMAL(38,0)) summed exactly, ONE display division at the
    * end. All curve math happens on the ≤20-row bin table. */
  def q228AveragePrecision(s: SparkSession, dir: String): DataFrame = {
    val B = 20
    val ev = t(s, dir, "events")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val bounds = ev.agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
    val bins = ev.crossJoin(broadcast(bounds))
      .withColumn("bin", expr(s"(c - lo) * $B DIV (hi - lo + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("nl", sum(col("n")).over(w))
      .withColumn("pl", sum(col("pos")).over(w))
    val tot = cum.agg(max(col("nl")).as("nt"), max(col("pl")).as("pt"))
    val terms = cum.crossJoin(broadcast(tot))
      .select(col("pos"),
        (col("pt") - (col("pl") - col("pos"))).as("tp"),
        (col("nt") - (col("nl") - col("n"))).as("pred"), col("pt"))
      .filter(col("pos") > 0)
      .select(expr("CAST(pos AS DECIMAL(38,0)) * tp * 1000000000000" +
        " DIV (CAST(pt AS DECIMAL(38,0)) * pred)").as("term"), col("pt"))
    terms.agg(max(col("pt")).as("n_pos"),
      sum(col("term")).as("ap_scaled"))
      .select(col("n_pos"), col("ap_scaled"),
        when(col("n_pos") > 0, f6(col("ap_scaled").cast("double") /
          lit(1.0e12))).as("avg_precision"))
  }

  /** Estimator-stability readout via DETERMINISTIC resampling — the
    * reproducible stand-in for a bootstrap CI (random() is neither
    * stable nor portable; the q63 hash-split rule is both): 30
    * replicate subsamples keep rows where md5(event_id:rep) % 3 = 0,
    * each replicate's mean purchase value is exact cents over exact
    * count (one division), and the spread report picks order
    * statistics (min / 4th / 16th / 27th / max of 30) from the
    * 30-row replicate table. The explode is a constant ×30 map-side
    * expansion feeding one partial-aggregated groupBy — no state
    * grows with replicates except the 30-row model. */
  def q229ResampleStability(s: SparkSession, dir: String): DataFrame = {
    val reps = 30
    val means = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"), col("event_id"))
      .select(col("c"), col("event_id"),
        explode(expr(s"sequence(1, $reps)")).as("rep"))
      .filter(pmod(graft.functions.Hashing.md5Long(
        concat(col("event_id").cast("string"), lit(":"),
          col("rep").cast("string"))), lit(3)) === 0)
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast(DecimalType(38, 0))).cast("double").as("sc"))
      .select(col("rep"), col("n"),
        (col("sc") / col("n").cast("double")).as("mean_c"))
    val w = Window.orderBy(col("mean_c"), col("rep"))
    val ranked = means.withColumn("rk", row_number().over(w))
    ranked.agg(count(lit(1)).as("n_reps"),
      min(col("mean_c")).as("lo"),
      max(when(col("rk") === 4, col("mean_c"))).as("p10"),
      max(when(col("rk") === 16, col("mean_c"))).as("p50"),
      max(when(col("rk") === 27, col("mean_c"))).as("p90"),
      max(col("mean_c")).as("hi"))
      .select(col("n_reps"), f6(col("lo")).as("lo"),
        f6(col("p10")).as("p10"), f6(col("p50")).as("p50"),
        f6(col("p90")).as("p90"), f6(col("hi")).as("hi"))
  }

  /** Floor-at-zero running inventory per part — the nonlinear
    * recurrence b_n = max(0, b_{n−1} + x_n) that LOOKS like it needs
    * a sequential scan, solved in closed form by the Lindley-equation
    * identity b_n = S_n − least(0, min_{k≤n} S_k): one running sum
    * and one running min over the same per-part window (millions of
    * small partitions — the scale-safe window shape), all exact
    * cent integers. Returned lines (returnflag 'R') draw down;
    * everything else restocks. Reports the 20 largest closing
    * balances with each part's movement count and high-water mark. */
  def q230CappedInventory(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        to_date(col("l_shipdate")).as("d"), col("l_orderkey"),
        col("l_linenumber"),
        when(col("l_returnflag") === "R",
          -(col("l_quantity").cast(DecimalType(18, 2)) * lit(100))
            .cast("long"))
          .otherwise((col("l_quantity").cast(DecimalType(18, 2)) *
            lit(100)).cast("long")).as("x"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("d"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = li
      .withColumn("s", sum(col("x")).over(w))
      .withColumn("mn", min(col("s")).over(w))
      .withColumn("b", col("s") - least(lit(0L), col("mn")))
    walked.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_moves"), max(col("b")).as("high_water"),
        max(struct(col("d"), col("l_orderkey"), col("l_linenumber"),
          col("b"))).getField("b").as("closing"))
      .orderBy(col("closing").desc, col("l_partkey"))
      .limit(20)
      .select(col("l_partkey"), col("n_moves"), col("high_water"),
        col("closing"))
  }

  /** Longest consecutive-day activity streak per user — the
    * gaps-and-islands classic on the user-day grid: distinct active
    * days collapse to islands via the day_num − row_number() key
    * (constant within a run of consecutive days), then one count per
    * island. Both windows partition by user (small partitions); the
    * report is the top-20 streaks with their date spans, emitted as
    * strings per the date convention. */
  def q231LongestStreak(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "events")
      .select(col("user_id"),
        to_date(col("ts").cast("timestamp")).as("d"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val islands = days
      .withColumn("grp",
        datediff(col("d"), lit("1970-01-01").cast("date")) -
          row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("d")).as("start_d"),
        max(col("d")).as("end_d"))
    islands
      .orderBy(col("len").desc, col("user_id"), col("start_d"))
      .limit(20)
      .select(col("user_id"), col("len"),
        date_format(col("start_d"), "yyyy-MM-dd").as("streak_start"),
        date_format(col("end_d"), "yyyy-MM-dd").as("streak_end"))
  }

  /** Time-decayed customer value with an EXACT half-life: a cents
    * amount aged w weeks is worth cents·2⁻ʷ, computed as
    * shiftright(cents · 2²⁰, min(w, 40)) — pure integer shifts, so
    * the decay is bit-identical in any engine (float pow decays are
    * not), map-side combinable, and monotone; the 2²⁰ pre-scale
    * keeps 20 fractional bits so young-ish amounts don't truncate
    * to zero, and the w ≤ 40 cap bounds the shift (2⁻⁴⁰ of a cent
    * is zero anyway). The report is the top-20 customers by decayed
    * revenue, undecayed totals alongside; age anchors to the corpus
    * max date (broadcast scalar) so the query is reproducible on a
    * frozen fixture. */
  def q232DecayedValue(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
          .cast("long").as("cents"),
        to_date(col("o_orderdate")).as("d"))
    val horizon = o.agg(max(col("d")).as("h"))
    val aged = o.crossJoin(broadcast(horizon))
      .withColumn("w",
        least(floor(datediff(col("h"), col("d")) / lit(7)).cast("long"),
          lit(40L)))
      .withColumn("decayed",
        expr("shiftright(cents * 1048576, CAST(w AS INT))"))
    aged.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"),
        sum(col("decayed")).as("decayed_scaled"))
      .orderBy(col("decayed_scaled").desc, col("o_custkey"))
      .limit(20)
      .select(col("o_custkey"), col("n_orders"), col("total_cents"),
        col("decayed_scaled"),
        f6(col("decayed_scaled").cast("double") / lit(1048576.0))
          .as("decayed_cents"))
  }

  /** Index of dispersion (variance-to-mean ratio) of weekly order
    * counts per customer — the standard "is demand Poisson or
    * bursty?" diagnostic. Counts come from one (custkey, week)
    * aggregate; the ratio needs the ZEROES too, so instead of
    * materializing the customer×week grid the moments are corrected
    * algebraically: over the full grid of n_cust·n_weeks cells,
    * Σx and Σx² equal the nonzero-cell sums — so mean and variance
    * come from three exact integers and the grid never exists. One
    * pinned double expression; VMR > 1 ⇒ overdispersed. */
  def q233Overdispersion(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val o = t(s, dir, "orders")
      .select(col("o_custkey"),
        date_trunc("week", col("o_orderdate")).cast("date").as("wk"))
    val cells = o.groupBy(col("o_custkey"), col("wk"))
      .agg(count(lit(1)).as("x"))
    val weeks = o.select(col("wk")).distinct()
      .agg(count(lit(1)).as("n_weeks"))
    val custs = o.select(col("o_custkey")).distinct()
      .agg(count(lit(1)).as("n_cust"))
    val m = cells.agg(
      sum(col("x")).as("sx"),
      sum(col("x").cast(dec) * col("x").cast(dec)).cast("double")
        .as("sxx"))
      .crossJoin(weeks).crossJoin(custs)
    val cellsD = (col("n_cust").cast("double") *
      col("n_weeks").cast("double"))
    val meanD = col("sx").cast("double") / cellsD
    val vmr = (col("sxx") / cellsD - meanD * meanD) / meanD
    m.select(col("n_cust"), col("n_weeks"), col("sx").as("n_orders"),
      when(col("sx") > 0, f6(vmr)).as("vmr"))
  }

  /** Lorenz curve of revenue concentration — the 10-point curve whose
    * area q209's Gini summarizes: customers ranked ascending by
    * revenue ([[Ranking.globalIndex]], never a global window), cut
    * into population deciles by gidx·10 DIV n, cumulative revenue
    * per decile via a ≤10-row window, share = ONE exact-integer
    * division per row. cum_cents stays an exact BIGINT so the curve
    * is hash-provable; the bottom-decile share vs the top's is the
    * headline inequality readout. */
  def q234LorenzCurve(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("r"))
    val n = rev.agg(count(lit(1)).as("n_cust"))
    val dec = Ranking.globalIndex(rev, Seq("r", "o_custkey"))
      .crossJoin(broadcast(n))
      .select(col("r"), expr("gidx * 10 DIV n_cust").as("decile"))
    val perDec = dec.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_cust"), sum(col("r")).as("cents"))
    val tot = perDec.agg(sum(col("cents")).as("total"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDec.crossJoin(broadcast(tot))
      .select(col("decile"), col("n_cust"),
        sum(col("cents")).over(w).as("cum_cents"), col("total"))
      .select(col("decile"), col("n_cust"), col("cum_cents"),
        when(col("total") > 0, f6(col("cum_cents").cast("double") /
          col("total").cast("double"))).as("cum_share"))
      .orderBy(col("decile"))
  }

  /** Two-sample Kolmogorov–Smirnov: does the price distribution of
    * RETURNED line items differ from the rest? [[Stats.ksTwoSample]]
    * evaluates D = sup|F̂_A − F̂_B| exactly at every distinct pooled
    * cent value — the gap as the integer |cumA·nB − cumB·nA| over the
    * common denominator, cumulative counts from the range-bucketed
    * two-phase prefix sum (never a single-task window), argmax value
    * tie-broken smallest-first by one max(struct) over exact ints, D
    * as ONE terminal double division. */
  def q235KsTest(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("cents"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    Stats.ksTwoSample(li, col("cents"), col("y"))
      .select(col("n_a"), col("n_b"), col("v_at_max"),
        f6(col("ks_d")).as("ks_d"))
  }

  /** Tie-corrected Mann–Whitney U on the same returned-vs-kept price
    * split — the rank-sum complement to q235's CDF-gap view: 2U from
    * exact per-value class counts (the q212 AUC numerator), the tie
    * term Σ(t³−t) in DECIMAL(38,0), and two terminal doubles with a
    * fixed operation order — the common-language effect size
    * A = U/(nA·nB) and the normal-approximation z (sqrt and divide
    * are correctly rounded under IEEE-754, so both hash identically
    * in DuckDB; ln/exp would not). */
  def q236MannWhitney(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("cents"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    Stats.mannWhitneyU(li, col("cents"), col("y"))
      .select(col("n_a"), col("n_b"), f6(col("cles")).as("cles"),
        f6(col("z")).as("z"))
  }

  /** Bounded-round HITS over the supplier→part endorsement graph
    * (distinct (suppkey, partkey) pairs from lineitem; supplier ids
    * offset into a disjoint key space): 2 full hub/authority rounds of
    * [[Graph.hits]] — int64 2^30 fixed point, L1 normalization as an
    * exact integral division — emitting the top-20 authorities
    * (hub-endorsed parts) under the strict (auth DESC, id) total
    * order. The oracle replays both rounds as chained CTEs with one
    * scalar subquery per normalization. */
  def q237Hits(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "lineitem")
      .select((col("l_suppkey") + lit(1000000L)).as("src"),
        col("l_partkey").as("dst"))
    Graph.hits(edges, iters = 2)
      .orderBy(col("auth_fixed").desc, col("id").asc)
      .limit(20)
  }

  /** Autocorrelation of daily event revenue at lags 1–7 — the
    * seasonality probe every time-series pipeline starts with. Exact
    * to the final division: with S = Σx and N days, the deviation is
    * carried N-scaled as e_t = N·x_t − S (integer, no mean rounding),
    * r_k = Σ_{t>k} e_t·e_{t−k} / Σ e_t² with both sides in
    * DECIMAL(38,0) and ONE double division per lag. The lag columns
    * ride a window over the POST-AGGREGATION daily frame (≤ a few
    * thousand rows — model-sized; the data-sized pass is the one
    * groupBy(day)), stacked to (lag, n_pairs, acf) rows. */
  /** Shared moment pass for the q238/q243 autocorrelation family: one
    * row with (n, den = Σe², num1..num7 = Σ e_t·e_{t−k}) over the
    * N-scaled integer deviations e_t = N·x_t − S of daily event
    * revenue, all in DECIMAL(38,0). */
  private def acfMoments(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("x"))
    val tot = daily.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"))
    val w = Window.orderBy(col("d"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("d"),
        (col("x").cast(dec) * col("n").cast(dec) - col("sx").cast(dec))
          .as("e"))
    val lagged = (1 to 7).foldLeft(dev) { (df, k) =>
      df.withColumn(s"e$k", lag(col("e"), k).over(w))
    }
    val aggCols = count(lit(1)).cast("long").as("n") +:
      sum(col("e") * col("e")).as("den") +:
      (1 to 7).map(k =>
        sum(when(col(s"e$k").isNotNull, col("e") * col(s"e$k")))
          .as(s"num$k"))
    lagged.agg(aggCols.head, aggCols.tail: _*)
  }

  def q238Acf(s: SparkSession, dir: String): DataFrame = {
    val agg = acfMoments(s, dir)
    // typed Columns, not a SQL string: in SQL text `1000000.0` parses
    // as a DECIMAL literal and the division silently becomes
    // DECIMAL(30,9) instead of DOUBLE
    val rows = (1 to 7).map { k =>
      struct(lit(k.toLong).as("lag"),
        (col("n") - lit(k.toLong)).as("n_pairs"),
        when(col("den") > 0,
          f6(col(s"num$k").cast("double") / col("den").cast("double")))
          .as("acf"))
    }
    agg.select(explode(array(rows: _*)).as("x"))
      .select(col("x.lag").as("lag"), col("x.n_pairs").as("n_pairs"),
        col("x.acf").as("acf"))
      .orderBy(col("lag"))
  }

  /** Herfindahl–Hirschman supplier-concentration index per region:
    * HHI = Σ_i share_i² over each region's supplier revenue shares —
    * the market-concentration staple, exact by cross-multiplication:
    * HHI = Σr_i² / (Σr_i)² with per-supplier revenue cents summed
    * exactly and both moments in DECIMAL(38,0), ONE double division
    * per region. Dimension joins (supplier→nation→region) broadcast;
    * the one data-sized shuffle is the (region, supplier) aggregate. */
  def q239Herfindahl(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rev = t(s, dir, "lineitem")
      .join(t(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("s_suppkey"))
      .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("r"))
    rev.groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_sup"),
        sum(col("r").cast(dec) * col("r").cast(dec)).as("num"),
        sum(col("r").cast(dec)).as("tot"))
      .select(col("r_name"), col("n_sup"),
        when(col("tot") > 0, f6(col("num").cast("double") /
          (col("tot").cast("double") * col("tot").cast("double"))))
          .as("hhi"))
      .orderBy(col("r_name"))
  }

  /** Kruskal–Wallis H across the five order priorities on order value
    * — the k-group generalization of q236's rank test. Doubled
    * tie-averaged ranks keep every per-group rank sum 2R_g integral
    * (2·avgrank(v) = 2·below(v) + t(v) + 1, counts from the
    * range-bucketed prefix sum); the five groups are KNOWN values, so
    * Σ_g (2R_g)²/n_g pivots to one row and sums in a FIXED expression
    * order (a distributed double sum would be merge-order-dependent);
    * H = 3/(N(N+1))·Σ − 3(N+1) and the tie correction
    * C = 1 − Σ(t³−t)/(N³−N) are terminal doubles. */
  def q240KruskalWallis(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val ord = t(s, dir, "orders").select(
      (col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("v"),
      col("o_orderpriority").as("g"))
    val byGV = ord.groupBy(col("v"), col("g"))
      .agg(count(lit(1)).as("cnt"))
    val byV = byGV.groupBy(col("v")).agg(sum(col("cnt")).as("t"))
    val cum = Ranking.globalCumSum(byV, "v", Seq("t"))
      .select(col("v"), col("t"), (col("cum_t") - col("t")).as("below"))
    val perG = byGV.join(cum, Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("cnt")).as("ng"),
        sum(col("cnt").cast(dec) *
          (lit(2L) * col("below") + col("t") + lit(1L)).cast(dec))
          .as("r2"))
    // totals over byV, not cum: a scalar branch over cum re-executes
    // the window subplan (see Stats.classCdf)
    val ties = byV.agg(sum(col("t")).as("n"),
      sum(col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec) -
        col("t").cast(dec)).as("tie3"))
    val groups = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")
    // pivot the ≤5 group rows onto one row so the Σ over groups is a
    // fixed-order scalar expression, not a distributed double sum
    val pivotCols = groups.zipWithIndex.map { case (gv, i) =>
      max(when(col("g") === gv, col("r2"))).as(s"r2_$i")
    } ++ groups.zipWithIndex.map { case (gv, i) =>
      max(when(col("g") === gv, col("ng"))).as(s"ng_$i")
    }
    val pivoted = perG.agg(pivotCols.head, pivotCols.tail: _*)
    val nd = col("n").cast("double")
    val sumTerms = (0 until 5).map { i =>
      (col(s"r2_$i").cast("double") * col(s"r2_$i").cast("double")) /
        (lit(4.0) * col(s"ng_$i").cast("double"))
    }.reduceLeft(_ + _)
    pivoted.crossJoin(broadcast(ties))
      .select(col("n"),
        f6((lit(3.0) / (nd * (nd + lit(1.0))) * sumTerms -
          lit(3.0) * (nd + lit(1.0)))).as("h"),
        f6((lit(3.0) / (nd * (nd + lit(1.0))) * sumTerms -
          lit(3.0) * (nd + lit(1.0))) /
          (lit(1.0) - col("tie3").cast("double") /
            (nd * nd * nd - nd))).as("h_corrected"))
  }

  /** Two-sample Cramér–von Mises on the q235 returned-vs-kept price
    * split — the INTEGRATED CDF gap next to KS's supremum: T =
    * Σ_v t(v)·(cumA·nB − cumB·nA)² / (nA·nB·N²), the squared gaps
    * exact in DECIMAL(38,0) and weighted by pooled multiplicity, ONE
    * terminal double division. Catches distributional differences
    * spread across the whole range that a single max gap understates. */
  def q241CramerVonMises(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val li = t(s, dir, "lineitem").select(
      (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("v"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val byV = li.groupBy(col("v"))
      .agg(sum(col("y")).as("ca"),
        (count(lit(1)) - sum(col("y"))).as("cb"))
    val cum = Ranking.globalCumSum(byV, "v", Seq("ca", "cb"))
    val tot = byV.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val gap2 = cum.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"), (col("ca") + col("cb")).as("t"),
        (col("cum_ca").cast(dec) * col("n_b").cast(dec) -
          col("cum_cb").cast(dec) * col("n_a").cast(dec)).as("gap"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(col("t").cast(dec) * col("gap") * col("gap")).as("s"))
    val nad = col("n_a").cast("double")
    val nbd = col("n_b").cast("double")
    val nd = nad + nbd
    gap2.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0,
        f6(col("s").cast("double") / (nad * nbd * nd * nd))).as("cvm"))
  }

  /** Welch's unequal-variance t-test: does mean purchase value differ
    * from mean click value? Exact moments (Σx, Σx² in DECIMAL(38,0)
    * over cent values) feed the textbook t and Welch–Satterthwaite df
    * as terminal double expressions with a fixed operation order —
    * means, variances, and standard errors are named intermediates
    * mirrored token for token in the oracle. */
  def q242WelchT(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val ev = t(s, dir, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val m = ev.agg(
      sum(col("y")).as("n_a"),
      (count(lit(1)) - sum(col("y"))).as("n_b"),
      sum(when(col("y") === 1, col("c")).otherwise(0L).cast(dec)).as("sa"),
      sum(when(col("y") === 0, col("c")).otherwise(0L).cast(dec)).as("sb"),
      sum(when(col("y") === 1, col("c").cast(dec) * col("c").cast(dec))
        .otherwise(lit(0L).cast(dec))).as("qa"),
      sum(when(col("y") === 0, col("c").cast(dec) * col("c").cast(dec))
        .otherwise(lit(0L).cast(dec))).as("qb"))
    val nad = col("n_a").cast("double")
    val nbd = col("n_b").cast("double")
    val ma = col("sa").cast("double") / nad
    val mb = col("sb").cast("double") / nbd
    val va = (col("qa").cast("double") -
      col("sa").cast("double") * col("sa").cast("double") / nad) /
      (nad - lit(1.0))
    val vb = (col("qb").cast("double") -
      col("sb").cast("double") * col("sb").cast("double") / nbd) /
      (nbd - lit(1.0))
    val sea = va / nad
    val seb = vb / nbd
    m.select(col("n_a"), col("n_b"),
      when(col("n_a") > 1 && col("n_b") > 1,
        f6((ma - mb) / sqrt(sea + seb))).as("t_stat"),
      when(col("n_a") > 1 && col("n_b") > 1,
        f6(((sea + seb) * (sea + seb)) /
          (sea * sea / (nad - lit(1.0)) +
            seb * seb / (nbd - lit(1.0))))).as("df"))
  }

  /** Ljung–Box portmanteau test at h=7 lags on daily event revenue —
    * "is there ANY autocorrelation?", the companion to q238's per-lag
    * view and built on the same exact moment pass: Q = N(N+2)·Σ_k
    * r_k²/(N−k) with r_k = num_k/den, the seven terms summed in a
    * FIXED expression order on the one-row moment frame. */
  def q243LjungBox(s: SparkSession, dir: String): DataFrame = {
    val agg = acfMoments(s, dir)
    val nd = col("n").cast("double")
    val terms = (1 to 7).map { k =>
      val rk = col(s"num$k").cast("double") / col("den").cast("double")
      rk * rk / (nd - lit(k.toDouble))
    }.reduceLeft(_ + _)
    agg.select(col("n").as("n_days"),
      when(col("den") > 0 && col("n") > lit(7L),
        f6(nd * (nd + lit(2.0)) * terms)).as("q_lb"))
  }

  /** Cross-correlation between daily revenue and daily event count at
    * lags −3..+3 — "does volume lead value?", the bivariate sibling of
    * q238: both series carried as N-scaled integer deviations
    * (ex = N·x − Sx, ey = N·y − Sy), every lagged cross-moment exact
    * in DECIMAL(38,0), and ccf(k) = num_k / (√Σex²·√Σey²) as an
    * order-mirrored terminal double per lag. Positive k correlates
    * x_t with y_{t−k} (count leading revenue); negative k the
    * reverse. Window over the post-aggregation daily frame only. */
  def q244CrossCorr(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("x"), count(lit(1)).as("y"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"))
    val w = Window.orderBy(col("d"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("d"),
        (col("x").cast(dec) * col("n").cast(dec) - col("sx").cast(dec))
          .as("ex"),
        (col("y").cast(dec) * col("n").cast(dec) - col("sy").cast(dec))
          .as("ey"))
    val lagged = (1 to 3).foldLeft(dev) { (df, k) =>
      df.withColumn(s"ex$k", lag(col("ex"), k).over(w))
        .withColumn(s"ey$k", lag(col("ey"), k).over(w))
    }
    val aggCols = count(lit(1)).cast("long").as("n") +:
      sum(col("ex") * col("ex")).as("sxx") +:
      sum(col("ey") * col("ey")).as("syy") +:
      sum(col("ex") * col("ey")).as("num0") +:
      ((1 to 3).map(k =>
        sum(when(col(s"ey$k").isNotNull, col("ex") * col(s"ey$k")))
          .as(s"nump$k")) ++
        (1 to 3).map(k =>
          sum(when(col(s"ex$k").isNotNull, col(s"ex$k") * col("ey")))
            .as(s"numm$k")))
    val agg = lagged.agg(aggCols.head, aggCols.tail: _*)
    val den = sqrt(col("sxx").cast("double")) *
      sqrt(col("syy").cast("double"))
    def row(k: Int, num: Column) =
      struct(lit(k.toLong).as("lag"),
        (col("n") - lit(math.abs(k).toLong)).as("n_pairs"),
        when(col("sxx") > 0 && col("syy") > 0,
          f6(num.cast("double") / den)).as("ccf"))
    val rows = (-3 to 3).map {
      case 0          => row(0, col("num0"))
      case k if k > 0 => row(k, col(s"nump$k"))
      case k          => row(k, col(s"numm${-k}"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.lag").as("lag"), col("r.n_pairs").as("n_pairs"),
        col("r.ccf").as("ccf"))
      .orderBy(col("lag"))
  }

  /** Cramér's V effect size for the q130 lang×source association —
    * the number the χ² table omits. The contingency table is
    * model-sized, so the per-cell double terms (O − E)²/E are summed
    * in a DETERMINISTIC SEQUENTIAL ORDER via a running-sum window
    * over (lang, source) — a distributed double sum would be
    * merge-order-dependent and unhashable; the ordered fold is
    * bit-identical in both engines. V = √(χ²/(N·(min(r,c)−1))). */
  def q245CramersV(s: SparkSession, dir: String): DataFrame = {
    val cell = t(s, dir, "documents")
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
    val rowM = cell.groupBy("lang").agg(sum(col("o")).as("rm"))
    val colM = cell.groupBy("source").agg(sum(col("o")).as("cm"))
    val n = cell.agg(sum(col("o")).as("n"),
      countDistinct(col("lang")).as("r_levels"),
      countDistinct(col("source")).as("c_levels"))
    val e = col("rm").cast("double") * col("cm").cast("double") /
      col("n").cast("double")
    val terms = cell.join(rowM, Seq("lang")).join(colM, Seq("source"))
      .crossJoin(broadcast(n))
      .select(col("lang"), col("source"), col("n"), col("r_levels"),
        col("c_levels"),
        ((col("o").cast("double") - e) * (col("o").cast("double") - e) / e)
          .as("term"))
    val w = Window.orderBy(col("lang"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.orderBy(col("lang"), col("source"))
    terms
      .select(col("n"), col("r_levels"), col("c_levels"),
        sum(col("term")).over(w).as("chi2"),
        row_number().over(wn).as("rn"),
        count(lit(1)).over(Window.partitionBy()).as("m"))
      .filter(col("rn") === col("m"))
      .select(col("n"), col("r_levels"), col("c_levels"),
        f6(col("chi2")).as("chi2"),
        f6(sqrt(col("chi2") / (col("n").cast("double") *
          (least(col("r_levels"), col("c_levels")) - lit(1L))
            .cast("double")))).as("cramers_v"))
  }

  /** MASE of the seasonal-naive weekly forecast on daily revenue —
    * "is there a weekly cycle worth modeling?": mean |x_t − x_{t−7}|
    * over mean |x_t − x_{t−1}|, both numerators EXACT integer sums of
    * cent differences (no float until the two means' ratio), so the
    * scale-free forecast-quality number every demand pipeline reports
    * is engine-exact. MASE < 1 ⇒ the weekly pattern beats the naive
    * random walk. */
  def q246Mase(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("x"))
    val w = Window.orderBy(col("d"))
    val lagged = daily
      .withColumn("x1", lag(col("x"), 1).over(w))
      .withColumn("x7", lag(col("x"), 7).over(w))
    val agg = lagged.agg(count(lit(1)).as("n"),
      sum(when(col("x7").isNotNull, abs(col("x") - col("x7")))).as("s7"),
      sum(when(col("x1").isNotNull, abs(col("x") - col("x1")))).as("s1"))
    val nd = col("n").cast("double")
    agg.select(col("n").as("n_days"), col("s7").as("sum_abs_seasonal"),
      col("s1").as("sum_abs_naive"),
      when(col("n") > 8 && col("s1") > 0,
        f6((col("s7").cast("double") / (nd - lit(7.0))) /
          (col("s1").cast("double") / (nd - lit(1.0))))).as("mase"))
  }

  /** Partial autocorrelation at lags 1–3 by the Durbin–Levinson
    * closed forms on q238's exact ACF moments — the AR-order
    * diagnostic next to the raw ACF: φ11 = r1, φ22 = (r2−r1²)/(1−r1²),
    * φ33 from the level-2 coefficients, every r_k a double from exact
    * DECIMAL(38,0) moments and every φ an order-mirrored double
    * expression (the q242 named-intermediate treatment — the oracle
    * computes the same recursion through CTE-named columns). */
  def q247Pacf(s: SparkSession, dir: String): DataFrame = {
    val agg = acfMoments(s, dir)
    val dend = col("den").cast("double")
    val r1 = col("num1").cast("double") / dend
    val r2 = col("num2").cast("double") / dend
    val r3 = col("num3").cast("double") / dend
    val phi22 = (r2 - r1 * r1) / (lit(1.0) - r1 * r1)
    val phi21 = r1 - phi22 * r1
    val phi33 = (r3 - phi21 * r2 - phi22 * r1) /
      (lit(1.0) - phi21 * r1 - phi22 * r2)
    val rows = Seq(
      struct(lit(1L).as("lag"),
        when(col("den") > 0, f6(r1)).as("pacf")),
      struct(lit(2L).as("lag"),
        when(col("den") > 0, f6(phi22)).as("pacf")),
      struct(lit(3L).as("lag"),
        when(col("den") > 0, f6(phi33)).as("pacf")))
    agg.select(explode(array(rows: _*)).as("x"))
      .select(col("x.lag").as("lag"), col("x.pacf").as("pacf"))
      .orderBy(col("lag"))
  }

  /** Leave-one-out target encoding of order priority by order value —
    * the categorical-feature prep that avoids self-leakage: each row's
    * code is the mean of the OTHER rows in its category,
    * (Σy_g − y_i)/(n_g − 1), kept exact by the 10⁶-scaled integral
    * division (enc = (Σ−y)·10⁶ DIV (n−1), product in DECIMAL(38,0)).
    * The category stats table is model-sized (broadcast); the one
    * data-sized pass is the groupBy + the joined projection. Emitted
    * as per-category audit aggregates (count/min/max/Σ of the codes —
    * all exact integers) so the full per-row encoding is verified
    * without a million-row result. */
  def q248LooEncoding(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderpriority").as("g"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("y"))
    val st = o.groupBy(col("g"))
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("n"))
    o.join(broadcast(st), Seq("g"))
      .filter(col("n") > 1)
      .select(col("g"), expr(
        "CAST((CAST(sy - y AS DECIMAL(38,0)) * 1000000)" +
          " DIV CAST(n - 1 AS DECIMAL(38,0)) AS BIGINT)").as("enc"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_rows"), min(col("enc")).as("min_enc"),
        max(col("enc")).as("max_enc"), sum(col("enc")).as("sum_enc"))
      .orderBy(col("g"))
  }

  /** Feature hashing (the hashing trick) over document tokens: every
    * token occurrence lands in bucket md5₆₀ % 64 with a ±1 sign from
    * the next hash bit — the fixed-dimension, vocabulary-free text
    * featurizer. One explode + one 64-group aggregate; the signed
    * sums are exact integers, and the md5-based bucket/sign are
    * engine-portable (the q63 discipline), so the whole 64-dim
    * corpus-level feature vector hash-matches DuckDB. */
  def q249FeatureHash(s: SparkSession, dir: String): DataFrame = {
    val tk = t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    tk.withColumn("h", graft.functions.Hashing.md5Long(col("tok")))
      .select((col("h") % 64).as("idx"),
        when(expr("(h DIV 64) % 2") === 0, 1L).otherwise(-1L).as("w"))
      .groupBy(col("idx"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("sum_w"))
      .orderBy(col("idx"))
  }

  /** Two-proportion z-test on a deterministic A/B split — the
    * experiment-readout staple: users hash into arms by md5 (the q63
    * portable-split discipline, so the assignment is reproducible in
    * any engine), conversion = any purchase event, and the pooled
    * z = (p̂_A − p̂_B)/√(p̂(1−p̂)(1/n_A+1/n_B)) is a terminal double
    * over four exact integers with named intermediates mirrored in
    * the oracle. */
  def q250TwoProportionZ(s: SparkSession, dir: String): DataFrame = {
    val u = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).as("conv"))
      .select(col("conv"),
        pmod(graft.functions.Hashing.md5Long(
          col("user_id").cast("string")), lit(2)).as("arm"))
    val m = u.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("x_a"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x_b"))
    val nad = col("n_a").cast("double")
    val nbd = col("n_b").cast("double")
    val pa = col("x_a").cast("double") / nad
    val pb = col("x_b").cast("double") / nbd
    val pp = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    m.select(col("n_a"), col("n_b"), col("x_a"), col("x_b"),
      when(col("n_a") > 0 && col("n_b") > 0, f6(pa - pb)).as("lift"),
      // z is undefined when the pooled rate is degenerate (all or no
      // users converted — the variance is 0 and ANSI rejects the /0)
      when(col("n_a") > 0 && col("n_b") > 0 &&
        col("x_a") + col("x_b") > 0 &&
        col("x_a") + col("x_b") < col("n_a") + col("n_b"),
        f6((pa - pb) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / nad + lit(1.0) / nbd)))).as("z"))
  }

  /** Maximum drawdown of cumulative daily revenue — the worst
    * peak-to-trough decline, the risk number every monitoring
    * dashboard carries: cumulative and running-max windows over the
    * POST-AGGREGATION daily frame keep every drawdown an exact cent
    * integer; the relative drawdown is a per-row double whose MAX is
    * order-independent (max, unlike sum, is safe to take over
    * distributed doubles). */
  def q251MaxDrawdown(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("x"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily.select(col("d"), sum(col("x")).over(w).as("cum"))
      .select(col("d"), col("cum"), max(col("cum")).over(w).as("runmax"))
    cum.agg(count(lit(1)).as("n_days"),
      max(col("runmax") - col("cum")).as("max_dd_cents"),
      f6(max(when(col("runmax") > 0,
        (col("runmax") - col("cum")).cast("double") /
          col("runmax").cast("double")))).as("max_dd_frac"))
  }

  /** The fused two-sample readout — q235 + q236 + q241 from ONE scan:
    * [[Stats.twoSampleSummary]] computes KS (with argmax), the
    * Mann–Whitney pair, and Cramér–von Mises off a single shared
    * per-value CDF, the monitoring-job shape where three
    * distribution tests cost one shuffle instead of three. Values
    * must equal the standalone queries' by construction (identical
    * arithmetic; the oracle is the three CTE pipelines merged). */
  def q252TwoSampleSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("cents"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    Stats.twoSampleSummary(li, col("cents"), col("y"))
      .select(col("n_a"), col("n_b"), col("v_at_max"),
        f6(col("ks_d")).as("ks_d"), f6(col("cles")).as("cles"),
        f6(col("z")).as("z"), f6(col("cvm")).as("cvm"))
  }

  /** Pettitt change-point test on daily revenue — the rank-based
    * companion to q205's CUSUM (no variance assumption): with doubled
    * midranks 2r from the per-value counts (integral under ties, the
    * q236 trick), U_t = Σ_{i≤t}(2r_i) − t(N+1) is EXACTLY the Pettitt
    * statistic and stays integral in DECIMAL(38,0); K = max_t |U_t|
    * with the split day tie-broken earliest. The rank table is the
    * scale-true globalCumSum pass; the U_t window rides the
    * POST-AGGREGATION daily frame. Emits K, the split day, and the
    * significance exponent term 6K²/(N³+N²) as one terminal double. */
  def q253Pettitt(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("x"))
    // doubled midrank of each day's value within the daily frame:
    // 2r = 2·below + cnt + 1 from per-value counts (exact under ties)
    val byV = daily.groupBy(col("x")).agg(count(lit(1)).as("cnt"))
    val cum = Ranking.globalCumSum(byV, "x", Seq("cnt"))
      .select(col("x"),
        (lit(2L) * (col("cum_cnt") - col("cnt")) + col("cnt") + lit(1L))
          .as("r2"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.orderBy(col("d"))
    val n1 = daily.agg(count(lit(1)).as("n"))
    val ut = daily.join(cum, Seq("x"))
      .crossJoin(broadcast(n1))
      .select(col("d"), col("n"),
        sum(col("r2").cast(dec)).over(w).as("sr2"),
        row_number().over(wn).cast("long").as("t"))
      .select(col("d"), col("n"),
        (col("sr2") - (col("t") * (col("n") + lit(1L))).cast(dec))
          .as("u"))
    ut.select(col("n"), abs(col("u")).as("k"),
        (-unix_date(col("d")).cast("long")).as("nd"))
      .agg(max(col("n")).as("n_days"),
        max(struct(col("k"), col("nd"))).as("m"))
      .select(col("n_days"),
        col("m.k").cast("long").as("k_stat"),
        expr("CAST(date_from_unix_date(CAST(-m.nd AS INT)) AS STRING)")
          .as("split_day"),
        f6(lit(6.0) * col("m.k").cast("double") *
          col("m.k").cast("double") /
          (col("n_days").cast("double") * col("n_days").cast("double") *
            col("n_days").cast("double") +
            col("n_days").cast("double") * col("n_days").cast("double")))
          .as("k_exponent"))
  }

  /** Day-of-week seasonality strength of revenue as the exact eta² —
    * between-group over total variance across the SEVEN fixed
    * day-of-week groups: both sums of squares from exact integer
    * moments (N²-scaled, the q238 deviation trick applied per group
    * via the q240 known-group pivot), one terminal division. eta² → 1
    * means the weekly profile explains the variance; → 0 means none. */
  def q254DowSeasonality(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("x"))
      .select(col("x"), dayofweek(col("d")).cast("long").as("dow"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"))
    val perG = daily.groupBy(col("dow"))
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"))
    // pivot the 7 fixed groups; Σ_g (N·sg − ng·Sx)²/(ng·N²) and the
    // total SS (N·Σx² − Sx²)/N — cross-multiplied so each term is a
    // double of exact integers, summed in a FIXED expression order
    val pivotCols = (1 to 7).flatMap { g =>
      Seq(max(when(col("dow") === g, col("sg"))).as(s"sg_$g"),
        max(when(col("dow") === g, col("ng"))).as(s"ng_$g"))
    }
    val piv = perG.agg(pivotCols.head, pivotCols.tail: _*)
      .crossJoin(broadcast(tot))
    val nd = col("n").cast("double")
    val sxd = col("sx").cast("double")
    val between = (1 to 7).map { g =>
      val sgd = col(s"sg_$g").cast("double")
      val ngd = col(s"ng_$g").cast("double")
      when(col(s"ng_$g").isNotNull && col(s"ng_$g") > 0,
        (nd * sgd - ngd * sxd) * (nd * sgd - ngd * sxd) /
          (ngd * (nd * nd))).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    val totalSs = (nd * col("sxx").cast("double") - sxd * sxd) / nd
    piv.select(col("n").as("n_days"),
      when(totalSs > 0, f6(between / totalSs)).as("eta2"))
  }

  /** Perceptual dHash through the REAL PNG codec — q171's gradient
    * sibling: each doc's 7-group image decodes via javax.imageio and
    * hashes by brighter-than-right-neighbor comparisons (8×7 = 56
    * exact cross-multiplied bits, [[Multimodal.dHash56]]); the oracle
    * recomputes the identical hash from the generator's closed-form
    * channels (PNG lossless ⇒ decode-then-hash ≡ formula-then-hash
    * bit-for-bit). Groups collapse to exact-dup clusters of 7. */
  def q255ImageDHash(s: SparkSession, dir: String): DataFrame = {
    val gen = udf((id: Long) => Multimodal.generatePng(id))
    // encode+decode once per DISTINCT image (gid), not per doc — the
    // hash of an identical payload is identical, so the 7-member
    // groups pay one codec round-trip and the hashes broadcast back
    // (the content-keyed decode dedup a real pipeline runs)
    val gids = t(s, dir, "documents")
      .select((col("doc_id") - col("doc_id") % 7).as("gid")).distinct()
      .withColumn("payload", gen(col("gid")))
    val hashed = Multimodal.withDHash(gids, "payload")
      .select(col("gid"), col("dhash"))
    t(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") - col("doc_id") % 7).as("gid"))
      .join(broadcast(hashed), Seq("gid"))
      .groupBy(col("dhash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("dhash")
  }

  /** Q–Q decile table for the returned-vs-kept price split — the
    * diagnostic that says WHERE the two distributions differ after
    * q235's KS says THAT they do: per class, decile k's value is the
    * smallest v with cum·10 ≥ k·n (exact discrete percentile — integer
    * cross-multiplication, no interpolation), all 18 deciles as
    * conditional MINs in ONE aggregate pass over the shared CDF, then
    * unpivoted to (decile, v_returned, v_kept, gap_cents) rows. */
  def q256QqDeciles(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("v"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val byV = li.groupBy(col("v"))
      .agg(sum(col("y")).as("ca"),
        (count(lit(1)) - sum(col("y"))).as("cb"))
    val cum = Ranking.globalCumSum(byV, "v", Seq("ca", "cb"))
    val tot = byV.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val aggs = (1 to 9).flatMap { k =>
      Seq(min(when(col("cum_ca") * 10 >= lit(k.toLong) * col("n_a"),
        col("v"))).as(s"qa_$k"),
        min(when(col("cum_cb") * 10 >= lit(k.toLong) * col("n_b"),
          col("v"))).as(s"qb_$k"))
    }
    val one = cum.crossJoin(broadcast(tot)).agg(aggs.head, aggs.tail: _*)
    val rows = (1 to 9).map { k =>
      struct(lit(k.toLong).as("decile"),
        col(s"qa_$k").as("v_returned"), col(s"qb_$k").as("v_kept"),
        (col(s"qa_$k") - col(s"qb_$k")).as("gap_cents"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.decile").as("decile"),
        col("r.v_returned").as("v_returned"),
        col("r.v_kept").as("v_kept"),
        col("r.gap_cents").as("gap_cents"))
      .orderBy(col("decile"))
  }

  /** Cross-source vocabulary Jaccard matrix — "how much do the
    * corpora share words?", the set-level companion to q222's
    * frequency-weighted cosine: distinct (source, token) pairs, one
    * equi-join ON TOKEN for the pairwise intersections (never
    * all-pairs over docs), |A∪B| = |A|+|B|−|A∩B| from the per-source
    * vocabulary sizes, one division per source pair (≤ C(5,2) rows —
    * model-sized output). */
  def q257VocabJaccard(s: SparkSession, dir: String): DataFrame = {
    val st = t(s, dir, "documents")
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("nv"))
    val inter = st.as("a")
      .join(st.as("b"), col("a.tok") === col("b.tok"))
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("source").as("src_a"), col("nv").as("nv_a")),
        Seq("src_a"))
      .join(sizes.select(col("source").as("src_b"), col("nv").as("nv_b")),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("nv_a"), col("nv_b"),
        col("n_common"),
        f6(col("n_common").cast("double") /
          (col("nv_a") + col("nv_b") - col("n_common")).cast("double"))
          .as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Effective sample size of the priority-weighted sample — the
    * number that says how much a weighted sample is really worth:
    * ESS = (Σw)²/Σw² with integer cent weights, both moments exact in
    * DECIMAL(38,0) and ONE terminal division; emitted next to the raw
    * count so the design effect n/ESS is read off directly. Weights =
    * order value (the q81/q110 sampling family's size measure). */
  def q258EffectiveSampleSize(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val w = t(s, dir, "orders")
      .select((col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("w"))
    w.agg(count(lit(1)).as("n"),
      sum(col("w").cast(dec)).as("sw"),
      sum(col("w").cast(dec) * col("w").cast(dec)).as("sww"))
      .select(col("n"),
        when(col("sww") > 0,
          f6((col("sw").cast("double") * col("sw").cast("double")) /
            col("sww").cast("double"))).as("ess"),
        when(col("sww") > 0,
          f6(col("n").cast("double") /
            ((col("sw").cast("double") * col("sw").cast("double")) /
              col("sww").cast("double")))).as("design_effect"))
  }

  /** Kaplan–Meier product-limit survival of order fulfillment — the
    * estimator that pairs with q224's Nelson–Aalen on the SAME
    * right-censored frame: S(t) = Π_{i≤t}(1 − d_i/n_i). The ordered
    * product over event days is the one genuinely sequential step, and
    * the event table is MODEL-SIZED (distinct lifetimes), so it rides
    * a sorted array + HOF prefix fold — collect_list's order doesn't
    * matter because sort_array imposes the total order before the
    * fold, making the double product a deterministic sequential
    * sequence both engines replay identically (each factor is one
    * correctly-rounded division; the oracle's list_reduce folds the
    * same factors in the same order, and IEEE 1.0·x = x makes the
    * init-vs-first-element fold shapes equal). Data passes: the q224
    * join/groupBy only. */
  def q259KaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val users = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(max(to_date(col("o_orderdate"))).as("first_d"),
        max(to_date(col("l_shipdate"))).as("last_d"))
      // lazy local checkpoint: `users` feeds the horizon aggregate AND
      // the lives projection (and byDay feeds globalCumSum's three
      // consumers) — without it the orders⋈lineitem shuffle join
      // re-executes once per consumer and dominates the query. An
      // |orders|-sized aggregate: exactly what a 100 TB run caches.
      .localCheckpoint(false)
    val horizon = users.agg(max(col("last_d")).as("h"),
      count(lit(1)).as("n_users"))
    val lives = users.crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long")
        .as("life"),
        (col("last_d") <= date_add(col("h"), -7)).as("uncensored"),
        col("n_users"))
    val byDay = lives.groupBy(col("life"))
      .agg(count(lit(1)).as("m"),
        sum(when(col("uncensored"), 1L).otherwise(0L)).as("deaths"),
        max(col("n_users")).as("n_users"))
    val ev = Ranking.globalCumSum(byDay, "life", Seq("m"))
      .select(col("life"),
        (col("n_users") - (col("cum_m") - col("m"))).as("n_risk"),
        col("deaths"))
      .filter(col("deaths") > 0)
      .select(col("life"), col("n_risk"), col("deaths"),
        ((col("n_risk") - col("deaths")).cast("double") /
          col("n_risk").cast("double")).as("factor"))
    ev.agg(sort_array(collect_list(struct(col("life"), col("n_risk"),
        col("deaths"), col("factor")))).as("arr"))
      // empty input → zero rows, not sequence(1,0)'s DESCENDING [1,0]
      // indexing into an empty array
      .filter(size(col("arr")) > 0)
      .select(explode(expr(
        "transform(sequence(1, size(arr)), i -> struct(" +
          "arr[i-1].life AS day, arr[i-1].n_risk AS n_risk, " +
          "arr[i-1].deaths AS deaths, " +
          "aggregate(slice(arr, 1, i), CAST(1.0 AS DOUBLE), " +
          "(a, x) -> a * x.factor) AS s))")).as("r"))
      .select(col("r.day").as("day"), col("r.n_risk").as("n_risk"),
        col("r.deaths").as("deaths"), f6(col("r.s")).as("survival"))
      .orderBy(col("day"))
  }

  /** Log-rank test — do urgent orders fulfill on a different survival
    * curve? The hypothesis test completing the q224/q259 survival
    * family: at each pooled event day, observed group-A deaths vs the
    * expectation d·n_a/n under the null, variance
    * d(n−d)/(n−1)·n_a·n_b/n², both carried as 10¹²-scaled exact
    * integral divisions (the q224 hazard-term discipline — the ≤1-ulp
    * floor loss per term is identical in both engines) and summed
    * exactly in DECIMAL(38,0); z = (O−E)/√V is the one terminal
    * double expression. Per-group at-risk counts ride the SAME
    * range-bucketed prefix-sum pass (4 weight columns, one shuffle). */
  def q260LogRank(s: SparkSession, dir: String): DataFrame = {
    val users = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(max(to_date(col("o_orderdate"))).as("first_d"),
        max(to_date(col("l_shipdate"))).as("last_d"),
        max(when(col("o_orderpriority") === "1-URGENT", 1L)
          .otherwise(0L)).as("grp"))
      .localCheckpoint(false) // the q224/q282 multi-consumer reuse
    val horizon = users.agg(max(col("last_d")).as("h"))
    val lives = users.crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long")
        .as("life"),
        (col("last_d") <= date_add(col("h"), -7)).as("uncensored"),
        col("grp"))
    val byDay = lives.groupBy(col("life"))
      .agg(sum(col("grp")).as("ma"),
        (count(lit(1)) - sum(col("grp"))).as("mb"),
        sum(when(col("uncensored"), col("grp")).otherwise(0L)).as("da"),
        sum(when(col("uncensored"), lit(1L) - col("grp")).otherwise(0L))
          .as("db"))
    val tot = byDay.agg(sum(col("ma")).as("na_tot"),
      sum(col("mb")).as("nb_tot"))
    val terms = Ranking.globalCumSum(byDay, "life", Seq("ma", "mb"))
      .crossJoin(broadcast(tot))
      .select(col("da"), col("db"), (col("da") + col("db")).as("d"),
        (col("na_tot") - (col("cum_ma") - col("ma"))).as("na"),
        (col("nb_tot") - (col("cum_mb") - col("mb"))).as("nb"))
      .filter(col("da") + col("db") > 0)
      .select(col("da"), col("d"),
        expr("CAST(d AS DECIMAL(38,0)) * na * 1000000000000" +
          " DIV (na + nb)").as("e_s"),
        when(col("na") + col("nb") > 1,
          expr("CAST(d AS DECIMAL(38,0)) * (na + nb - d) * na * nb" +
            " * 1000000000000" +
            " DIV ((na + nb - 1) * CAST(na + nb AS DECIMAL(38,0))" +
            " * (na + nb))")).otherwise(lit(0L)).as("v_s"))
    val agg = terms.agg(sum(col("da")).as("o_a"),
      count(lit(1)).as("n_event_days"),
      sum(col("e_s").cast(DecimalType(38, 0))).as("es"),
      sum(col("v_s").cast(DecimalType(38, 0))).as("vs"))
    agg.select(col("o_a"), col("n_event_days"),
      f6(col("es").cast("double") / lit(1.0e12)).as("e_a"),
      when(col("vs") > 0,
        f6((col("o_a").cast("double") -
          col("es").cast("double") / lit(1.0e12)) /
          sqrt(col("vs").cast("double") / lit(1.0e12)))).as("z"))
  }

  /** Mann–Kendall trend test on daily revenue — the nonparametric
    * significance test that q139's OLS slope lacks: S = Σ_{i<j}
    * sgn(x_j − x_i) from ONE ordered self-join of the
    * POST-AGGREGATION daily frame (n² pairs of a model-sized series —
    * never the raw events), the tie-corrected variance
    * [n(n−1)(2n+5) − Σt(t−1)(2t+5)]/18 carried ×18 as exact integers,
    * and the continuity-corrected z as the one terminal double. */
  def q261MannKendall(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("x"))
    val pairs = daily.as("a").join(daily.as("b"), col("a.d") < col("b.d"))
      .agg(sum(when(col("b.x") > col("a.x"), 1L)
        .when(col("b.x") < col("a.x"), -1L).otherwise(0L)).as("s_stat"))
    val ties = daily.groupBy(col("x")).agg(count(lit(1)).as("t"))
      .agg(sum(col("t")).as("n"),
        sum(col("t").cast(dec) * (col("t") - lit(1L)) *
          (lit(2L) * col("t") + lit(5L))).as("tie18"))
    val m = pairs.crossJoin(broadcast(ties))
    val nd = col("n").cast("double")
    val var18 = (col("n").cast(dec) * (col("n") - lit(1L)) *
      (lit(2L) * col("n") + lit(5L)) - col("tie18")).cast("double")
    val sd = col("s_stat").cast("double")
    val corrected = when(col("s_stat") > 0, sd - lit(1.0))
      .when(col("s_stat") < 0, sd + lit(1.0)).otherwise(lit(0.0))
    m.select(col("n").as("n_days"), col("s_stat"),
      when(var18 > 0, f6(corrected / sqrt(var18 / lit(18.0)))).as("z"))
  }

  /** Shared daily-revenue frame: exact cent sums per event day. The
    * day grain makes every downstream self-join day²-bounded — a
    * model-sized frame regardless of row count (q261's contract).
    * Lazily checkpointed: the family's self-joins and multi-consumer
    * shapes (q278 per-weekday pairs, q262/q263 day-pair sets, q289
    * ranked weeks) otherwise re-aggregate the full events table once
    * per branch — the calendar-bounded frame is the thing to
    * materialize, the event scan is the thing to do once. */
  private def dailyCents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("x"))
      .localCheckpoint(false)

  /** Theil–Sen robust trend slope of daily revenue — the median of all
    * pairwise slopes, the estimator OLS outliers can't drag. Slopes are
    * ONE IEEE division of exact integers each (correctly rounded, so
    * bit-stable cross-engine); the median is DISCRETE — collapsed
    * per-value counts, a cumulative count over the day²-bounded slope
    * frame, and min(slope where cum ≥ ⌈n/2⌉) picks an actual element,
    * so no interpolation arithmetic can diverge between engines. */
  def q262TheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyCents(s, dir)
    val slopes = daily.as("a").join(daily.as("b"), col("a.d") < col("b.d"))
      .select(((col("b.x") - col("a.x")).cast("double") /
        datediff(col("b.d"), col("a.d")).cast("double")).as("slope"))
    val med = Stats.discreteMedian(slopes, "slope")
      .select(col("n").as("n_pairs"), col("median").as("m"))
    daily.agg(count(lit(1)).as("n_days"))
      .crossJoin(broadcast(med))
      .select(col("n_days"), col("n_pairs"), f6(col("m")).as("ts_slope"))
  }

  /** Hodges–Lehmann location-shift estimate between the two md5 arms
    * of the daily-revenue series (the q250 split applied per event):
    * the median of ALL b−a pairwise differences — integer cents end to
    * end, zero floats. The pair frame is |A|·|B| ≤ days², model-sized;
    * the discrete median reuses q262's collapsed-CDF element pick. */
  def q263HodgesLehmann(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"),
        to_date(col("ts")).as("d"),
        pmod(graft.functions.Hashing.md5Long(
          col("event_id").cast("string")), lit(2)).as("arm"))
    val daily = ev.groupBy(col("d"), col("arm"))
      .agg(sum(col("c")).as("x"))
    val a = daily.filter(col("arm") === 0).select(col("x").as("xa"))
    val b = daily.filter(col("arm") === 1).select(col("x").as("xb"))
    val diffs = b.crossJoin(a).select((col("xb") - col("xa")).as("diff"))
    val med = Stats.discreteMedian(diffs, "diff")
      .select(col("median").as("m"))
    a.agg(count(lit(1)).as("n_a"))
      .crossJoin(b.agg(count(lit(1)).as("n_b")))
      .crossJoin(broadcast(med))
      .select(col("n_a"), col("n_b"),
        (col("n_a") * col("n_b")).as("n_pairs"),
        col("m").as("hl_shift_cents"))
  }

  /** Structural (neighborhood-Jaccard) similarity top-100 over the
    * 1995Q1 customer↔part bipartite graph — q181's wedge machinery
    * with the symmetric score: jac = |N∩| / |N(a)∪N(b)|, ranked by the
    * exact integer cross-multiply cn·10⁶ div (da+db−cn) so the
    * ordering never touches a float. Same deg∈[2,64] hub cap as q181
    * (principled: a degree-d hub emits C(d,2) pairs each worth little
    * evidence), degrees counted over the SAME capped incidence so the
    * score is internally consistent; TakeOrderedAndProject top-k. */
  def q264NeighborhoodJaccard(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1995-04-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val inc = o.join(t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("node"), col("l_partkey").as("nbr"))
      .distinct()
    val capped = inc.groupBy(col("nbr")).agg(count(lit(1)).as("dn"))
      .filter(col("dn") >= 2 && col("dn") <= 64)
      .select(col("nbr"))
    val incC = inc.join(capped, Seq("nbr"), "left_semi")
    val deg = incC.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val pairs = incC.select(col("nbr"), col("node").as("id_a"))
      .join(incC.select(col("nbr"), col("node").as("id_b")), Seq("nbr"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(deg.select(col("node").as("id_a"), col("deg").as("deg_a")),
        Seq("id_a"))
      .join(deg.select(col("node").as("id_b"), col("deg").as("deg_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_common"),
        (col("deg_a") + col("deg_b") - col("n_common")).as("union_size"),
        expr("n_common * 1000000L div (deg_a + deg_b - n_common)")
          .as("jac_ppm"))
      .orderBy(col("jac_ppm").desc, col("id_a").asc, col("id_b").asc)
      .limit(100)
  }

  /** Ordered conversion funnel view→click→purchase with STRICT
    * time-sequencing per user — each step's timestamp must exceed the
    * previous step's FIRST occurrence (min-ts), the semantics funnel
    * dashboards mean but naive type-count funnels (q97's gate shape)
    * don't enforce. Three conditional-min aggregate passes chained by
    * equi-joins on user — no window over the raw event stream, no
    * per-user collect; conversion rates as exact ppm integer division. */
  def q265ConversionFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, Seq("user_id"))
      .where(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id"))
      .where(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    t1.agg(count(lit(1)).as("n_step1"))
      .crossJoin(t2.agg(count(lit(1)).as("n_step2")))
      .crossJoin(t3.agg(count(lit(1)).as("n_step3")))
      .select(col("n_step1"), col("n_step2"), col("n_step3"),
        // rates are undefined (null) when the upstream step is empty —
        // ANSI div would otherwise throw on a zero-event dataset
        when(col("n_step1") > 0,
          expr("n_step2 * 1000000L div n_step1")).as("conv12_ppm"),
        when(col("n_step2") > 0,
          expr("n_step3 * 1000000L div n_step2")).as("conv23_ppm"),
        when(col("n_step1") > 0,
          expr("n_step3 * 1000000L div n_step1")).as("conv13_ppm"))
  }

  /** Classical additive time-series decomposition of daily revenue:
    * trend = centered 7-day moving average (full windows only),
    * seasonal = per-day-of-week mean of the detrended series,
    * remainder = the rest. Everything rides ×7-scaled exact integers
    * (7x − Σ₇x needs no division); the only doubles are the final
    * /7.0 displays and the per-dow mean — each ONE correctly-rounded
    * IEEE op on exact operands, pinned to the same tree both engines. */
  def q266TsDecomposition(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyCents(s, dir)
    val w7 = Window.orderBy(col("d")).rowsBetween(-3, 3)
    val tr = daily
      .select(col("d"), col("x"),
        sum(col("x")).over(w7).as("t7"),
        count(lit(1)).over(w7).as("c7"))
      .filter(col("c7") === 7)
      .select(col("d"), col("t7"),
        (lit(7L) * col("x") - col("t7")).as("d7"),
        dayofweek(col("d")).as("dw"))
    val seas = tr.groupBy(col("dw"))
      .agg(sum(col("d7")).as("sd7"), count(lit(1)).as("cn"))
      .select(col("dw"),
        (col("sd7").cast("double") / col("cn").cast("double")).as("s7"))
    tr.join(broadcast(seas), Seq("dw"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
        f6(col("t7").cast("double") / lit(7.0)).as("trend"),
        f6(col("s7") / lit(7.0)).as("seasonal"),
        f6((col("d7").cast("double") - col("s7")) / lit(7.0))
          .as("remainder"))
      .orderBy(col("d"))
  }

  /** Brier score of a binned purchase-probability model under the q63
    * portable train/eval split: train-arm events fit p(purchase) per
    * $10 value bin (exact ppm integer division), eval-arm events score
    * (p − y)² against it — the squared-error cousin of q210's ECE,
    * measuring calibration AND refinement at once. The bin model is
    * model-sized and broadcast; unseen bins fall back to the global
    * train rate; the score sum is exact in DECIMAL(38,0) with ONE
    * terminal division. */
  def q267BrierScore(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val ev = t(s, dir, "events")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"),
        pmod(graft.functions.Hashing.md5Long(
          col("event_id").cast("string")), lit(2)).as("arm"))
      .select(expr("c div 1000").as("bin"), col("y"), col("arm"))
    val train = ev.filter(col("arm") === 0)
    val bins = train.groupBy(col("bin"))
      .agg(expr("sum(y) * 1000000L div count(1)").as("p_ppm"))
    val glob = train
      .agg(expr("sum(y) * 1000000L div count(1)").as("g_ppm"))
    val scored = ev.filter(col("arm") === 1)
      .join(broadcast(bins), Seq("bin"), "left_outer")
      .crossJoin(broadcast(glob))
      .select(col("y"),
        coalesce(col("p_ppm"), col("g_ppm")).as("p"))
    scored.agg(count(lit(1)).as("n_eval"),
        sum(((col("p") - col("y") * lit(1000000L)) *
          (col("p") - col("y") * lit(1000000L))).cast(dec)).as("se"))
      .select(col("n_eval"),
        f6(col("se").cast("double") /
          (col("n_eval").cast("double") * lit(1.0e12))).as("brier"))
  }

  /** Chao1 vocabulary-richness estimate per source — how many distinct
    * tokens each corpus slice WOULD show with more data, from the
    * observed types plus the singleton/doubleton tail:
    * chao1 = S + f1(f1−1)/(2(f2+1)) (bias-corrected form, never /0).
    * One token-count aggregate per source feeds S, f1, f2; the
    * estimate is ONE division on exact integers. The growth-curve
    * companion to q218's Heaps saturation. */
  def q268Chao1Richness(s: SparkSession, dir: String): DataFrame = {
    val tk = t(s, dir, "documents")
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val cnts = tk.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    cnts.groupBy(col("source"))
      .agg(count(lit(1)).as("s_types"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("source"), col("s_types"), col("n_tokens"),
        col("f1"), col("f2"),
        f6(col("s_types").cast("double") +
          (col("f1") * (col("f1") - lit(1L))).cast("double") /
          (lit(2L) * (col("f2") + lit(1L))).cast("double")).as("chao1"))
      .orderBy(col("source"))
  }

  /** Total-variation distance matrix between per-source token
    * DISTRIBUTIONS — the weighted sibling of q257's set Jaccard (two
    * sources can share every token yet use them at wildly different
    * rates). TV(A,B) = ½·Σ|pA−pB| over the token UNION, computed with
    * the common denominator nA·nB so the sum is exact integers: the
    * shared-token part from ONE token equi-join (bounded by sources²
    * per token, never all-pairs-of-rows), the disjoint-token mass from
    * the totals identity Σ_{A−B} cA = nA − Σ_common cA — no outer join
    * needed. ONE terminal division per pair. The pair FRAME is the
    * full cross of the (bounded, broadcast) source totals, so a pair
    * sharing zero tokens still emits its row — at TV exactly 1 — and
    * the output is a complete distance matrix, not just the
    * overlapping corner of it. */
  def q269TvDistance(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val tk = t(s, dir, "documents")
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val cnts = tk.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val tot = cnts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val cn = cnts.join(broadcast(tot), Seq("source"))
    val pairs = tot.select(col("source").as("src_a"), col("n").as("n_a"))
      .crossJoin(tot.select(col("source").as("src_b"), col("n").as("n_b")))
      .filter(col("src_a") < col("src_b"))
    val common = cn.as("a")
      .join(cn.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(sum(col("a.c")).as("ca_common"),
        sum(col("b.c")).as("cb_common"),
        sum(abs(col("a.c").cast(dec) * col("b.n") -
          col("b.c").cast(dec) * col("a.n"))).as("s_in"))
    pairs.join(common, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        col("n_a"), col("n_b"),
        f6((coalesce(col("s_in"), lit(0L).cast(dec)) +
          (col("n_a") - coalesce(col("ca_common"), lit(0L))).cast(dec) *
            col("n_b") +
          (col("n_b") - coalesce(col("cb_common"), lit(0L))).cast(dec) *
            col("n_a"))
          .cast("double") /
          (lit(2L).cast(dec) * col("n_a") * col("n_b")).cast("double"))
          .as("tv"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** DCT-sign perceptual hash through the REAL PNG codec — the
    * frequency-domain member of the image-hash family (q171 aHash
    * spatial threshold, q255 dHash gradient, this one structure):
    * decode → 8×8 gray → exact integer DCT-II with the PINNED
    * quantized basis → 64 sign bits. The DuckDB oracle recomputes the
    * transform from the PNG generator's closed-form channels with the
    * SAME basis constants — lossless PNG makes decode-then-transform
    * ≡ formula-then-transform bit-for-bit. */
  def q270ImagePHash(s: SparkSession, dir: String): DataFrame = {
    val gen = udf((id: Long) => Multimodal.generatePng(id))
    // codec round-trip once per DISTINCT image, hashes broadcast back
    // (the q255 content-keyed decode dedup)
    val gids = t(s, dir, "documents")
      .select((col("doc_id") - col("doc_id") % 7).as("gid")).distinct()
      .withColumn("payload", gen(col("gid")))
    val hashed = Multimodal.withPHash(gids, "payload")
      .select(col("gid"), col("phash_hi"), col("phash_lo"))
    val d = t(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") - col("doc_id") % 7).as("gid"))
      .join(broadcast(hashed), Seq("gid"))
    d.groupBy(col("phash_hi"), col("phash_lo"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("phash_hi", "phash_lo")
  }

  /** Holt double-exponential (level+trend) smoothing of daily revenue
    * — the trend-aware sibling of q121's EWMA, same machinery: an
    * inherently order-dependent recurrence as a typed flatMapGroups
    * fold with α=β=1/2 integer halving (l_t = (x_t + l + b)/2,
    * b_t = (b + l_t − l_{t-1})/2 — truncating Long '/' ≡ DuckDB '//'
    * on negatives too, both toward zero), replayed by the oracle as a
    * recursive CTE. Forecast = level + trend, all exact cents. */
  def q271HoltSmoothing(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long")).as("x"))
    import s.implicits._
    daily.select(col("day"), col("x")).as[(String, Long)]
      .groupByKey(_ => 0)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_._1)
        var l = 0L
        var b = 0L
        var first = true
        rows.iterator.map { case (day, x) =>
          if (first) { first = false; l = x; b = 0L }
          else {
            val lPrev = l
            l = (x + l + b) / 2
            b = (b + (l - lPrev)) / 2
          }
          (day, l, b, l + b)
        }
      }
      .toDF("day", "level_cents", "trend_cents", "forecast_cents")
      .orderBy("day")
  }

  /** Grid-density clustering (the DBSCAN/CLIQUE shape that scales):
    * one aggregate pass bins orders into (lineitem-count, $25k-revenue)
    * cells, a cell is DENSE iff its count exceeds 2× the mean cell
    * count (integer cross-multiply against broadcast totals), and
    * cluster labels are 4 bounded rounds of min-label propagation
    * over the 8-neighborhood CELL graph — which is model-sized
    * (bounded by grid resolution, NOT by row count), so at 100 TB the
    * only data-scale work is the first aggregate. Neighbor edges come
    * from a 9-offset explode + equi-join, not an inequality join; the
    * oracle replays the rounds as chained CTEs. */
  def q272GridDensity(s: SparkSession, dir: String): DataFrame = {
    // order-level feature space (lineitem count × $25k revenue bins):
    // bell-shaped over revenue, so the dense region is a REAL cluster
    // with thin-tail noise cells around it — not a uniform wash
    val orders = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("cx"),
        sum((col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
          .cast("long")).as("cents"))
    val cells = orders
      .groupBy(col("cx"), expr("cents div 2500000").as("cy"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.agg(count(lit(1)).as("n_cells"),
      sum(col("n")).as("n_rows"))
    val dense = cells.crossJoin(broadcast(tot))
      .filter(col("n") * col("n_cells") > lit(2L) * col("n_rows"))
      .select(col("cx"), col("cy"), col("n"),
        (col("cx") * lit(100000L) + col("cy")).as("label"))
    // 9-offset explode + equi-join: the neighbor relation without an
    // inequality join (self-pair included keeps a cell's own label)
    val offs = Seq(-1L, 0L, 1L)
    val nbrs = dense.select(col("cx"), col("cy"),
        explode(array(offs.flatMap(dx => offs.map(dy =>
          struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)).as("o"))
      .select((col("cx") + col("o.dx")).as("nx"),
        (col("cy") + col("o.dy")).as("ny"), col("cx"), col("cy"))
    var lab = dense.select(col("cx"), col("cy"), col("label"))
    var r = 0
    while (r < 4) {
      lab = nbrs
        .join(lab.select(col("label"), col("cx").as("nx"),
          col("cy").as("ny")), Seq("nx", "ny"))
        .groupBy(col("cx"), col("cy"))
        .agg(min(col("label")).as("label"))
      r += 1
    }
    dense.select(col("cx"), col("cy"), col("n"))
      .join(lab, Seq("cx", "cy"))
      .orderBy("cx", "cy")
  }

  /** Sequential-pattern support: for every ORDERED pair of event
    * types (a→b), how many users did a before b — first-occurrence
    * semantics, the "A leads to B" question funnels (q265) ask for
    * two fixed steps generalized to all type pairs. One conditional
    * min-ts aggregate per (user, type), then a user-keyed self-join
    * that is ≤5×5 rows PER USER (bounded fan-out — never an event
    * self-join), grouped to the 20-row pair table with exact ppm
    * ordering shares. */
  def q273SequencePatterns(s: SparkSession, dir: String): DataFrame = {
    val firsts = t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(unix_micros(col("ts"))).as("t0"))
    firsts.select(col("user_id"), col("event_type").as("type_a"),
        col("t0").as("ta"))
      .join(firsts.select(col("user_id"), col("event_type").as("type_b"),
        col("t0").as("tb")), Seq("user_id"))
      .where(col("type_a") =!= col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"),
        sum(when(col("ta") < col("tb"), 1L).otherwise(0L)).as("n_ordered"))
      .select(col("type_a"), col("type_b"), col("n_both"),
        col("n_ordered"),
        expr("n_ordered * 1000000L div n_both").as("ordered_ppm"))
      .orderBy("type_a", "type_b")
  }

  /** Goodman–Kruskal lambda: how much does knowing the customer's
    * market segment improve a modal guess of the order's priority?
    * λ = (Σ_seg max_prio n(seg,prio) − max_prio n(prio)) /
    * (N − max_prio n(prio)) — association strength for NOMINAL pairs
    * where q245's Cramér's V measures deviation and q225's tau needs
    * order. Pure counts and maxes of exact integers off one
    * contingency aggregate; ONE terminal division. */
  def q274GkLambda(s: SparkSession, dir: String): DataFrame = {
    val j = t(s, dir, "orders")
      .join(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val segMax = j.groupBy(col("c_mktsegment"))
      .agg(max(col("n")).as("mx"))
      .agg(sum(col("mx")).as("sum_seg_max"))
    val prioMax = j.groupBy(col("o_orderpriority"))
      .agg(sum(col("n")).as("n"))
      .agg(max(col("n")).as("max_prio"), sum(col("n")).as("n_total"))
    segMax.crossJoin(broadcast(prioMax))
      .select(col("n_total"), col("max_prio"), col("sum_seg_max"),
        when(col("n_total") > col("max_prio"),
          f6((col("sum_seg_max") - col("max_prio")).cast("double") /
            (col("n_total") - col("max_prio")).cast("double")))
          .as("lambda"))
  }

  /** Count-min JOIN-SIZE estimation — the pre-join cardinality the
    * optimizer wants before committing a strategy: est = min over
    * sketch rows of Σ_w cmA[w]·cmB[w], provably ≥ the true size
    * |A⋈B| = Σ_k cA(k)·cB(k) (bucket merging only ADDS cross terms)
    * and ≤ true + 3·|A|·|B|/width on this fixture. The q85 treatment:
    * the sketch result is INVISIBLE — the exact join size is emitted
    * with the two-sided bound as a boolean the oracle pins TRUE, so a
    * broken sketch hash-mismatches. Sketch state is 2 model-sized
    * arrays; row totals give |A|,|B| for free (every CM row counts
    * all items). */
  def q275CmJoinSize(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val (depth, width) = (4, 4096)
    val a = t(s, dir, "lineitem")
      .select(col("l_partkey").cast("string").as("k"))
    val b = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_partkey").cast("string").as("k"))
    val skA = Sketches.countMinSketch(a, "k", depth, width)
    val skB = Sketches.countMinSketch(b, "k", depth, width)
    val est = (0 until depth).map { j =>
      var sum = 0L
      var w = 0
      while (w < width) { sum += skA(j * width + w) * skB(j * width + w)
        w += 1 }
      sum
    }.min
    val nA = skA.slice(0, width).sum
    val nB = skB.slice(0, width).sum
    // driver-side BigInt: 3·nA·nB overflows Long once each side passes
    // ~1.7e9 rows — exactly the 100 TB regime this bound targets. The
    // comparison itself rides DECIMAL(38,0) so exact+slack can't wrap.
    val slack = BigInt(3) * BigInt(nA) * BigInt(nB) / width
    val ca = a.groupBy(col("k")).agg(count(lit(1)).as("ca"))
    val cb = b.groupBy(col("k")).agg(count(lit(1)).as("cb"))
    val upperOk =
      if (slack >= BigInt(Long.MaxValue)) lit(true)
      else lit(est).cast(dec) <=
        col("exact_join_size").cast(dec) + lit(slack.toLong).cast(dec)
    ca.join(cb, Seq("k"))
      .agg(sum(col("ca").cast(dec) * col("cb").cast(dec))
        .cast("long").as("exact_join_size"))
      .select(lit(nA).as("n_left"), lit(nB).as("n_right"),
        col("exact_join_size"),
        (lit(est) >= col("exact_join_size") && upperOk)
          .as("cm_bound_ok"))
  }

  /** Somers' D in BOTH directions from q225's contingency machinery —
    * the ASYMMETRIC ordinal association (does quantity predict
    * discount better than discount predicts quantity?) tau-b
    * symmetrizes away: D_{J|X} = 2(C−D)/(n(n−1) − Σ r_x(r_x−1)),
    * doubled identities throughout, concordant/discordant mass from
    * dominating cell pairs of the bounded contingency table, ONE
    * division per direction. */
  def q276SomersD(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = t(s, dir, "lineitem")
      .select((col("l_quantity").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("x"),
        (col("l_discount").cast(DecimalType(18, 2)) * lit(100))
          .cast("long").as("j"))
      .groupBy(col("x"), col("j")).agg(count(lit(1)).as("f"))
    val b = cells.select(col("x").as("bx"), col("j").as("bj"),
      col("f").as("bf"))
    val cAgg = cells.join(b, col("bx") > col("x") && col("bj") > col("j"))
      .agg(sum(col("f").cast(dec) * col("bf").cast(dec)).as("cc"))
    val dAgg = cells.join(b, col("bx") > col("x") && col("bj") < col("j"))
      .agg(sum(col("f").cast(dec) * col("bf").cast(dec)).as("dd"))
    val nAgg = cells.agg(sum(col("f")).as("n"))
    val tiesX = cells.groupBy(col("x")).agg(sum(col("f")).as("r"))
      .agg(sum(col("r").cast(dec) * (col("r") - 1).cast(dec)).as("tx2"))
    val tiesJ = cells.groupBy(col("j")).agg(sum(col("f")).as("c"))
      .agg(sum(col("c").cast(dec) * (col("c") - 1).cast(dec)).as("tj2"))
    val m = nAgg.crossJoin(cAgg).crossJoin(dAgg)
      .crossJoin(tiesX).crossJoin(tiesJ)
      .select(col("n"),
        (col("n").cast(dec) * (col("n") - 1).cast(dec)).as("a2"),
        col("tx2"), col("tj2"), col("cc"), col("dd"))
    m.select(col("n"),
      when(col("a2") > col("tx2"),
        f6(((col("cc") - col("dd")).cast("double") * lit(2.0)) /
          (col("a2") - col("tx2")).cast("double"))).as("d_j_given_x"),
      when(col("a2") > col("tj2"),
        f6(((col("cc") - col("dd")).cast("double") * lit(2.0)) /
          (col("a2") - col("tj2")).cast("double"))).as("d_x_given_j"))
  }

  /** Difference-in-differences readout on the md5 A/B split: arm ×
    * (Jan 1–15 pre | Jan 16–30 post) cell means of event value, DiD =
    * (T_post − T_pre) − (C_post − C_pre). Cell sums are exact cents
    * and counts; the four means are one IEEE division each and the
    * estimate a pinned double tree — the experimentation readout that
    * controls for arm-level baseline differences where q250's z-test
    * can't. */
  def q277DiffInDiff(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"),
        pmod(graft.functions.Hashing.md5Long(
          col("user_id").cast("string")), lit(2)).as("arm"),
        when(to_date(col("ts")) < lit("2024-01-16"), 0L).otherwise(1L)
          .as("post"))
    val m = ev.agg(
      sum(when(col("arm") === 1 && col("post") === 0, 1L)
        .otherwise(0L)).as("n_t_pre"),
      sum(when(col("arm") === 1 && col("post") === 1, 1L)
        .otherwise(0L)).as("n_t_post"),
      sum(when(col("arm") === 0 && col("post") === 0, 1L)
        .otherwise(0L)).as("n_c_pre"),
      sum(when(col("arm") === 0 && col("post") === 1, 1L)
        .otherwise(0L)).as("n_c_post"),
      sum(when(col("arm") === 1 && col("post") === 0, col("c"))
        .otherwise(0L)).as("s_t_pre"),
      sum(when(col("arm") === 1 && col("post") === 1, col("c"))
        .otherwise(0L)).as("s_t_post"),
      sum(when(col("arm") === 0 && col("post") === 0, col("c"))
        .otherwise(0L)).as("s_c_pre"),
      sum(when(col("arm") === 0 && col("post") === 1, col("c"))
        .otherwise(0L)).as("s_c_post"))
    def mean(sc: String, nc: String) =
      col(sc).cast("double") / col(nc).cast("double")
    m.select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"),
      col("n_c_post"),
      when(col("n_t_pre") > 0 && col("n_t_post") > 0 &&
        col("n_c_pre") > 0 && col("n_c_post") > 0,
        f6((mean("s_t_post", "n_t_post") - mean("s_t_pre", "n_t_pre")) -
          (mean("s_c_post", "n_c_post") - mean("s_c_pre", "n_c_pre"))))
        .as("did_cents"))
  }

  /** SEASONAL Mann–Kendall on daily revenue — q261 restricted to
    * within-day-of-week pairs so the weekly cycle can't masquerade as
    * trend: S = Σ_dow S_dow (pairs join adds a dw equality — 7×
    * smaller than q261's), Var = Σ_dow [n(n−1)(2n+5) − ties]/18
    * carried ×18 exact, one terminal z. The dow key never reaches the
    * output, so each engine's own weekday numbering groups
    * identically. */
  def q278SeasonalMk(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = dailyCents(s, dir)
      .select(col("d"), col("x"), dayofweek(col("d")).as("dw"))
    val pairs = daily.as("a")
      .join(daily.as("b"),
        col("a.dw") === col("b.dw") && col("a.d") < col("b.d"))
      .agg(sum(when(col("b.x") > col("a.x"), 1L)
        .when(col("b.x") < col("a.x"), -1L).otherwise(0L)).as("s_stat"))
    val perDow = daily.groupBy(col("dw"), col("x"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("dw"))
      .agg(sum(col("t")).as("n"),
        sum(col("t").cast(dec) * (col("t") - lit(1L)) *
          (lit(2L) * col("t") + lit(5L))).as("tie18"))
    val vAgg = perDow
      .agg(sum(col("n")).as("n_days"),
        sum(col("n").cast(dec) * (col("n") - lit(1L)) *
          (lit(2L) * col("n") + lit(5L)) - col("tie18")).as("var18"))
    val m = pairs.crossJoin(broadcast(vAgg))
    val sd = col("s_stat").cast("double")
    val corrected = when(col("s_stat") > 0, sd - lit(1.0))
      .when(col("s_stat") < 0, sd + lit(1.0)).otherwise(lit(0.0))
    m.select(col("n_days"), col("s_stat"),
      when(col("var18").cast("double") > 0,
        f6(corrected / sqrt(col("var18").cast("double") / lit(18.0))))
        .as("z"))
  }

  /** Bhattacharyya coefficient / Hellinger distance between the md5
    * arms' value distributions over $10 bins — the
    * distribution-distance that sees SHAPE where q250 compares one
    * rate and q269's TV sees mass. BC = Σ√(cA·cB)/√(nA·nB): the bin
    * products are exact longs; the √ sum — 63 correctly-rounded ops
    * whose ORDER matters — runs as ONE deterministic left fold over
    * the bin-sorted array (the q259 model-sized-fold treatment), so
    * both engines add in the same sequence. */
  def q279Hellinger(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(expr("cast(cast(value as decimal(18,2)) * 100 as bigint)" +
        " div 1000").as("bin"),
        pmod(graft.functions.Hashing.md5Long(
          col("user_id").cast("string")), lit(2)).as("arm"))
    val bins = ev.groupBy(col("bin"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
    val tot = bins.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val folded = bins
      .agg(sort_array(collect_list(struct(col("bin"),
        (col("ca") * col("cb")).as("p")))).as("arr"))
      .select(expr("aggregate(arr, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> a + sqrt(CAST(x.p AS DOUBLE)))").as("s"))
    folded.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          f6(col("s") / sqrt(col("n_a").cast("double") *
            col("n_b").cast("double")))).as("bc"),
        when(col("n_a") > 0 && col("n_b") > 0,
          f6(sqrt(greatest(lit(0.0),
            lit(1.0) - col("s") / sqrt(col("n_a").cast("double") *
              col("n_b").cast("double")))))).as("hellinger"))
  }

  /** McNemar paired test: did per-user purchase behavior CHANGE
    * between Jan 1–15 and Jan 16–30? Only the discordant users
    * matter: b = converted-then-stopped, c = started-converting;
    * χ² = (b−c)²/(b+c) plus the continuity-corrected form — exact
    * integers, one division each. The PAIRED design q250's
    * two-sample z can't express (each user is their own control). */
  def q280McNemar(s: SparkSession, dir: String): DataFrame = {
    val u = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
          to_date(col("ts")) < lit("2024-01-16"), 1L).otherwise(0L))
          .as("pre"),
        max(when(col("event_type") === "purchase" &&
          to_date(col("ts")) >= lit("2024-01-16"), 1L).otherwise(0L))
          .as("post"))
    val m = u.agg(
      sum(when(col("pre") === 1 && col("post") === 0, 1L).otherwise(0L))
        .as("b"),
      sum(when(col("pre") === 0 && col("post") === 1, 1L).otherwise(0L))
        .as("c"))
    val bd = col("b").cast("double")
    val cd = col("c").cast("double")
    m.select(col("b"), col("c"),
      when(col("b") + col("c") > 0,
        f6((bd - cd) * (bd - cd) / (bd + cd))).as("chi2"),
      when(col("b") + col("c") > 0,
        f6((abs(bd - cd) - lit(1.0)) * (abs(bd - cd) - lit(1.0)) /
          (bd + cd))).as("chi2_corrected"))
  }

  /** Partial correlation of quantity and price CONTROLLING for
    * discount: r_xy·z = (r_xy − r_xz·r_zy)/√((1−r_xz²)(1−r_zy²)) with
    * all three Pearsons from ONE exact-moment pass (the q118
    * machinery widened to 3 variables, 9 decimal moments + n) —
    * the "is the association real or driven by z?" screen. Every r
    * is the q118 pinned double tree; the composition is a pinned
    * tree too. */
  def q281PartialCorr(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val ix = (col("l_quantity").cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val iy = (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val iz = (col("l_discount").cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val m = t(s, dir, "lineitem")
      .select(ix.as("x"), iy.as("y"), iz.as("z"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum(col("y").cast(dec)).cast("double").as("sy"),
        sum(col("z").cast(dec)).cast("double").as("sz"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast(dec)).cast("double").as("syy"),
        sum((col("z") * col("z")).cast(dec)).cast("double").as("szz"),
        sum((col("x") * col("y")).cast(dec)).cast("double").as("sxy"),
        sum((col("x") * col("z")).cast(dec)).cast("double").as("sxz"),
        sum((col("y") * col("z")).cast(dec)).cast("double").as("syz"))
    val nd = col("n").cast("double")
    def r(sab: Column, sa: Column, sb: Column, saa: Column,
        sbb: Column): Column =
      (nd * sab - sa * sb) /
        (sqrt(nd * saa - sa * sa) * sqrt(nd * sbb - sb * sb))
    val rxy = r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
    val rxz = r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
    val rzy = r(col("syz"), col("sz"), col("sy"), col("szz"), col("syy"))
    m.select(col("n"), f6(rxy).as("r_xy"), f6(rxz).as("r_xz"),
      f6(rzy).as("r_zy"),
      f6((rxy - rxz * rzy) /
        sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - rzy * rzy)))
        .as("r_xy_given_z"))
  }

  /** Restricted mean survival time to τ=60 days — the single number
    * ("average days alive within the first 60") that summarizes
    * q259's whole curve and stays valid under censoring where a plain
    * mean doesn't. Area under the KM step function: both the per-step
    * survival products AND the area sum run as deterministic ordered
    * folds over the model-sized event-day array (every multiply/add
    * in the same sequence both engines — the q259/q279 treatment);
    * s_{i−1} for the first step is the empty-slice fold = 1. */
  def q282Rmst(s: SparkSession, dir: String): DataFrame = {
    val tau = 60L
    val users = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(max(to_date(col("o_orderdate"))).as("first_d"),
        max(to_date(col("l_shipdate"))).as("last_d"))
      // lazy local checkpoint: `users` feeds the horizon aggregate AND
      // the lives projection (and byDay feeds globalCumSum's three
      // consumers) — without it the orders⋈lineitem shuffle join
      // re-executes once per consumer and dominates the query. An
      // |orders|-sized aggregate: exactly what a 100 TB run caches.
      .localCheckpoint(false)
    val horizon = users.agg(max(col("last_d")).as("h"),
      count(lit(1)).as("n_users"))
    val lives = users.crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long")
        .as("life"),
        (col("last_d") <= date_add(col("h"), -7)).as("uncensored"),
        col("n_users"))
    val byDay = lives.groupBy(col("life"))
      .agg(count(lit(1)).as("m"),
        sum(when(col("uncensored"), 1L).otherwise(0L)).as("deaths"),
        max(col("n_users")).as("n_users"))
    val ev = Ranking.globalCumSum(byDay, "life", Seq("m"))
      .select(col("life"),
        (col("n_users") - (col("cum_m") - col("m"))).as("n_risk"),
        col("deaths"), col("n_users"))
      .filter(col("deaths") > 0 && col("life") <= tau)
      .select(col("life"), col("n_users"),
        ((col("n_risk") - col("deaths")).cast("double") /
          col("n_risk").cast("double")).as("factor"))
    ev.agg(sort_array(collect_list(struct(col("life"), col("factor"))))
        .as("arr"),
        max(col("n_users")).as("n_users"))
      .select(col("n_users"), size(col("arr")).cast("long")
        .as("n_event_days"),
        // sequence(1, 0) is DESCENDING [1, 0] — the empty-array case
        // must short-circuit before the transform (the q259 lesson)
        expr(s"""(CASE WHEN size(arr) = 0 THEN CAST(0.0 AS DOUBLE)
          ELSE aggregate(transform(sequence(1, size(arr)), i ->
            aggregate(slice(arr, 1, i - 1), CAST(1.0 AS DOUBLE),
              (a, x) -> a * x.factor)
            * CAST(arr[i-1].life
              - (CASE WHEN i = 1 THEN 0L ELSE arr[i-2].life END)
              AS DOUBLE)),
            CAST(0.0 AS DOUBLE), (a, t) -> a + t) END)
          + aggregate(arr, CAST(1.0 AS DOUBLE), (a, x) -> a * x.factor)
          * CAST($tau - coalesce(get(arr, size(arr)-1).life, 0L)
            AS DOUBLE)
          """).as("rmst_raw"),
        expr("aggregate(arr, CAST(1.0 AS DOUBLE), " +
          "(a, x) -> a * x.factor)").as("s_tau"))
      .select(col("n_users"), col("n_event_days"),
        f6(col("rmst_raw")).as("rmst_days"), f6(col("s_tau")).as("s_tau"))
  }

  /** Mantel–Haenszel common odds ratio across region strata: does
    * urgent/high priority associate with returns AFTER controlling
    * for region? OR_MH = Σ_s(a·d/n) / Σ_s(b·c/n). The five region
    * strata PIVOT to one row (the q240 fixed-operation-order trick),
    * so the two 5-term double sums are pinned trees, each term one
    * IEEE division of exact counts — no distributed double
    * accumulation anywhere. */
  def q283MantelHaenszel(s: SparkSession, dir: String): DataFrame = {
    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE",
      "MIDDLE EAST")
    val base = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"),
        (col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH").as("e"),
        (col("l_returnflag") === "R").as("o"))
    def cell(rn: String, e: Boolean, o: Boolean, nm: String) =
      sum(when(col("r_name") === rn && col("e") === e &&
        col("o") === o, 1L).otherwise(0L)).as(nm)
    val aggs = regions.zipWithIndex.flatMap { case (rn, i) =>
      Seq(cell(rn, e = true, o = true, s"a$i"),
        cell(rn, e = true, o = false, s"b$i"),
        cell(rn, e = false, o = true, s"c$i"),
        cell(rn, e = false, o = false, s"d$i"))
    }
    val m = base.agg(aggs.head, aggs.tail: _*)
    def term(x: String, y: String, i: Int): Column =
      (col(s"$x$i") * col(s"$y$i")).cast("double") /
        (col(s"a$i") + col(s"b$i") + col(s"c$i") + col(s"d$i"))
          .cast("double")
    val num = regions.indices.map(term("a", "d", _)).reduce(_ + _)
    val den = regions.indices.map(term("b", "c", _)).reduce(_ + _)
    m.select(
      regions.indices.map(i =>
        (col(s"a$i") + col(s"b$i") + col(s"c$i") + col(s"d$i"))
          .as(s"n_s$i")) :+
      f6(num).as("mh_num") :+ f6(den).as("mh_den") :+
      when(den > 0, f6(num / den)).as("or_mh"): _*)
  }

  /** Cochran–Armitage trend test: does return probability TREND with
    * order priority (scores 1..5 from the priority digit)? The
    * dose-response question q130's chi-square can't rank. T·N =
    * Σ s_i(r_i·N − n_i·R) and Var·N³ = R(N−R)·(N·Σns² − (Σns)²) are
    * plain exact-integer aggregates (no ordering sensitivity —
    * integer sums commute), z = T·√N/√(Var·N³) the one terminal
    * double expression. */
  def q284CochranArmitage(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val g = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(substring(col("o_orderpriority"), 1, 1).cast("long")
        .as("sc"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .groupBy(col("sc"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("r"))
    val m = g.agg(sum(col("n")).as("nn"), sum(col("r")).as("rr"),
      sum(col("sc").cast(dec) * col("n")).as("sns"),
      sum(col("sc").cast(dec) * col("sc") * col("n")).as("sns2"),
      sum(col("sc").cast(dec) * col("r")).as("srs"))
    val tn = (col("srs") * col("nn") - col("sns") * col("rr"))
    val varN3 = (col("rr").cast(dec) * (col("nn") - col("rr")) *
      (col("nn").cast(dec) * col("sns2") - col("sns") * col("sns")))
    m.select(col("nn").as("n_total"), col("rr").as("r_total"),
      tn.cast("long").as("t_scaled"),
      when(varN3.cast("double") > 0,
        f6(tn.cast("double") * sqrt(col("nn").cast("double")) /
          sqrt(varN3.cast("double")))).as("z"))
  }

  /** Two-sample Wasserstein-1 (earth mover's) distance between the md5
    * arms' value distributions — the metric that says HOW FAR apart
    * (in cents) where q235's KS says how separable and q279's
    * Hellinger how overlapping: W₁ = Σ_k |F_A(v_k)−F_B(v_k)|·gap_k as
    * exact integers over the common denominator nA·nB, CDFs from
    * [[Ranking.globalCumSum]] on the collapsed per-value frame, gaps
    * from ONE lead() window on the same frame (bounded by the CENTS
    * DOMAIN, not row count), ONE terminal division. */
  def q285Wasserstein(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val ev = t(s, dir, "events")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("v"),
        pmod(graft.functions.Hashing.md5Long(
          col("user_id").cast("string")), lit(2)).as("arm"))
    val byV = ev.groupBy(col("v"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
    val cum = Ranking.leadKey(
      Ranking.globalCumSum(byV, "v", Seq("ca", "cb")), "v", "nxt")
    val tot = byV.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val terms = cum.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        (abs(col("cum_ca").cast(dec) * col("n_b") -
          col("cum_cb").cast(dec) * col("n_a")) *
          (col("nxt") - col("v")).cast(dec)).as("t"))
    terms.groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("t")).as("mass")) // last row's null term drops
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          f6(col("mass").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double"))))
          .as("w1_cents"))
  }

  /** Blocklist-filter report — the word-list content gate every
    * corpus pipeline runs before training (the C4/RefinedWeb rule
    * family's simplest member): per source, documents containing any
    * blocklisted token, total hits, and the flagged share in exact
    * ppm. The list is a pushed-down literal IN filter on the token
    * stream (no join at all); zero-hit sources survive via the outer
    * join from the per-source totals. */
  def q286BlocklistReport(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("slow", "broken", "error", "crash", "fail")
    val docs = t(s, dir, "documents")
    val hits = docs
      .select(col("doc_id"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("h"))
    val perSrc = hits.groupBy(col("source"))
      .agg(count(lit(1)).as("nf"), sum(col("h")).as("nh"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(perSrc, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"),
        coalesce(col("nf"), lit(0L)).as("n_flagged"),
        coalesce(col("nh"), lit(0L)).as("n_hits"),
        expr("coalesce(nf, 0L) * 1000000L div n_docs")
          .as("flagged_ppm"))
      .orderBy(col("source"))
  }

  /** Deterministic PERMUTATION test for the arm difference in mean
    * event value — the nonparametric significance q250's normal
    * approximation assumes away, made reproducible the q229 way:
    * 30 md5-derived pseudo-relabelings (md5(event_id:rep) % 2) stand
    * in for random permutations, p̂ = (1 + #{|Δ_rep| ≥ |Δ_obs|}) /
    * (reps+1). Every mean is exact-sum/count with ONE IEEE division;
    * the extreme-count compares doubles both engines compute
    * identically. */
  def q287PermutationTest(s: SparkSession, dir: String): DataFrame = {
    val reps = 30
    val dec = DecimalType(38, 0)
    val ev = t(s, dir, "events")
      .select((col("value").cast(DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"), col("event_id"),
        pmod(graft.functions.Hashing.md5Long(
          col("user_id").cast("string")), lit(2)).as("arm"))
    def diffOf(armCol: String): Column =
      (sum(when(col(armCol) === 0, col("c")).otherwise(0L)).cast(dec)
        .cast("double") /
        sum(when(col(armCol) === 0, 1L).otherwise(0L)).cast("double")) -
      (sum(when(col(armCol) === 1, col("c")).otherwise(0L)).cast(dec)
        .cast("double") /
        sum(when(col(armCol) === 1, 1L).otherwise(0L)).cast("double"))
    val obs = ev.agg(diffOf("arm").as("obs_diff"))
    val perms = ev
      .select(col("c"), col("event_id"),
        explode(expr(s"sequence(1, $reps)")).as("rep"))
      .select(col("c"), col("rep"),
        pmod(graft.functions.Hashing.md5Long(
          concat(col("event_id").cast("string"), lit(":"),
            col("rep").cast("string"))), lit(2)).as("parm"))
      .groupBy(col("rep"))
      .agg(diffOf("parm").as("d"))
    perms.crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("n_reps"),
        max(col("obs_diff")).as("od"),
        sum(when(abs(col("d")) >= abs(col("obs_diff")), 1L)
          .otherwise(0L)).as("n_extreme"))
      .select(col("n_reps"), f6(col("od")).as("obs_diff"),
        col("n_extreme"),
        expr("(1L + n_extreme) * 1000000L div (n_reps + 1L)")
          .as("p_hat_ppm"))
  }

  /** Bounded-radius HARMONIC centrality of three fixed probe
    * customers over the 1995Q1 purchase graph — the centrality the
    * PageRank/HITS family can't give (those score global influence;
    * harmonic says how CLOSE a node sits to everything): h(s) =
    * Σ_{v≠s} 1/d(s,v) over ≤4 hops, one q179 BFS per probe (per-probe
    * frontier work, the bounded-round contract), reciprocals as exact
    * 10⁶ div d integers so the sum is a long. Probes = the three
    * smallest nation-3 customer keys (deterministic; the 3-row
    * collect is model-sized). Oracle replays three q179 CTE chains. */
  def q288HarmonicCentrality(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1995-04-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val e = o.join(t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("id_a"),
        (col("l_partkey") + lit(3000000L)).as("id_b"))
      .distinct()
    val seedIds = t(s, dir, "customer")
      .filter(col("c_nationkey") === 3)
      .select(col("c_custkey")).orderBy(col("c_custkey")).limit(3)
      .collect().map(_.getLong(0))
    import s.implicits._
    if (seedIds.isEmpty) // empty dataset → no probes, empty report
      return Seq.empty[(Long, Long, Long)]
        .toDF("probe", "n_reached", "h_ppm")
    val per = seedIds.map { sid =>
      Graph.bfsRounds(e, Seq(sid).toDF("id"), rounds = 4,
          assumeDistinct = true)
        .filter(col("dist") > 0)
        .agg(count(lit(1)).as("n_reached"),
          sum(expr("1000000L div dist")).as("h_ppm"))
        .select(lit(sid).as("probe"), col("n_reached"), col("h_ppm"))
    }
    per.reduce(_ unionByName _).orderBy("probe")
  }

  /** Page's L test for an ORDERED weekly profile: within each of the
    * four complete Mon–Sun weeks of the fixture month, rank the seven
    * daily revenues (doubled midranks — exact under ties), then
    * L2 = Σ_j j · R2_j with R2_j the doubled rank sum of weekday j
    * across weeks. Tests "revenue rises through the week" — the
    * ordered alternative q240's Kruskal–Wallis ignores. Exact
    * integers end to end; z uses the no-ties closed forms (cents
    * sums never tie on this fixture; the L2 statistic itself is
    * tie-exact regardless). Only COMPLETE 7-day weeks enter, and the
    * week count b is DERIVED from the surviving frame — a missing
    * fixture day shrinks b instead of silently misstating z (the
    * closed forms' k=7 constants are then exact by construction). */
  def q289PageTrend(s: SparkSession, dir: String): DataFrame = {
    val daily0 = dailyCents(s, dir)
      .filter(col("d") >= lit("2024-01-01") && col("d") < lit("2024-01-29"))
      .select(col("d"), col("x"),
        ((unix_date(col("d")) - unix_date(lit("2024-01-01").cast("date")))
          .cast("long")).as("dn"))
      .select(col("x"), expr("dn div 7").as("wk"),
        (col("dn") % 7 + 1).as("j"))
    val complete = daily0.groupBy(col("wk"))
      .agg(count(lit(1)).as("nd")).filter(col("nd") === 7)
      .select(col("wk"))
    val daily = daily0.join(broadcast(complete), Seq("wk"))
    // doubled midrank of x within its week: 2r = 2·below + cnt + 1
    val ranked = daily.as("a")
      .join(daily.as("b"), col("a.wk") === col("b.wk"))
      .groupBy(col("a.wk").as("wk"), col("a.j").as("j"),
        col("a.x").as("x"))
      .agg((lit(2L) * sum(when(col("b.x") < col("a.x"), 1L)
        .otherwise(0L)) +
        sum(when(col("b.x") === col("a.x"), 1L).otherwise(0L)) +
        lit(1L)).as("r2"))
    val l = ranked.agg(sum(col("j") * col("r2")).as("l2"),
      countDistinct(col("wk")).as("nb"))
    val b = col("nb").cast("double")
    l.select(col("l2"),
      when(col("nb") > 0,
        f6((col("l2").cast("double") / lit(2.0) -
          b * lit(7.0) * lit(8.0) * lit(8.0) / lit(4.0)) /
          sqrt(b * lit(49.0) * lit(8.0) * lit(48.0) / lit(144.0))))
        .as("z"))
  }

  /** Jonckheere–Terpstra test: J = Σ_{i<j ordered priority groups}
    * #{a ∈ i, b ∈ j : a < b} (+ ties/2, doubled) — the ordered-group
    * dose-response test on VALUES where q284's Cochran–Armitage needs
    * a binary outcome. The value key (extendedprice cents) is
    * near-UNIQUE per row, so the q225 dominating-cell-pair shape is a
    * trap here: |cells| ≈ |rows| and a group-only inequality join is
    * row×row in disguise (~10¹¹ pair evaluations at sf0.1 — this
    * query is what timed out the round-7 bench). Instead J comes from
    * the CDF identity: pivot to ONE row per distinct value with the
    * five bounded priority-group frequencies t₁..t₅, take inclusive
    * running totals cum_tᵢ over v with the scale-safe
    * [[Ranking.globalCumSum]] (range-bucketed, never one task), and
    * 2J = Σ_v Σ_j t_j(v)·Σ_{i<j}(2·cum_tᵢ(v) − tᵢ(v)) — exactly the
    * doubled below-pairs + tied-pairs count, O(cells) total work.
    * All exact integers into DECIMAL(38,0); z is the one terminal
    * double. */
  def q290Jonckheere(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val joined = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(substring(col("o_orderpriority"), 1, 1).cast("long")
        .as("g"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * lit(100))
          .cast("long").as("v"))
    val groups = 1 to 5 // TPC-H o_orderpriority '1-URGENT'..'5-LOW'
    // pivot straight to one row per value (r17): the old
    // groupBy(g, v).count → groupBy(v) two-step exchanged the ~|rows|
    // cell frame twice for the same five conditional counts a single
    // value-keyed aggregate produces (map-side partial combine does
    // the same work either way — sum(g = k) over raw rows ≡
    // sum(when(g = k, f)) over pre-counted cells, both exact longs).
    val slots = groups.map(k =>
      sum(when(col("g") === k, 1L).otherwise(0L)).as(s"t$k"))
    // pinned HERE (not only inside globalCumSum) so the group-size
    // aggregate below reads the collapsed per-value frame instead of
    // re-running the orders⋈lineitem join
    val pv = joined.groupBy(col("v")).agg(slots.head, slots.tail: _*)
      .localCheckpoint(false)
    val cum = Ranking.globalCumSum(pv, "v", groups.map(k => s"t$k"))
    // per-value doubled dominance: t_j · Σ_{i<j} (2·F_i(v⁻) + t_i(v))
    // with F_i(v⁻) = cum_t_i − t_i, so the inner term is 2·cum − t.
    val term = groups.drop(1).map { j =>
      val inner = (1 until j).map(i =>
        lit(2L) * col(s"cum_t$i") - col(s"t$i")).reduce(_ + _)
      col(s"t$j").cast(dec) * inner
    }.reduce(_ + _)
    val j2 = cum.agg(sum(term).as("j2"))
    // per-group totals from the PINNED per-value frame: Σ_v t_k(v) is
    // exactly the final (= max, counts are nonnegative) cumulative
    // count the old max(cum_t_k) read — but aggregating cum re-ran the
    // range-bucketed window pass a second time (the two ~9 s window
    // stages in the r17 profile were this aggregate and j2's, each
    // recomputing the same windows over 583k values)
    val nk = (1 to 5).map(k => sum(col(s"t$k")).as(s"n$k"))
    val nkc = (1 to 5).map(k => col(s"n$k"))
    val sizes = pv.agg(nk.head, nk.tail: _*)
      .select(nkc.reduce(_ + _).as("nn"),
        nkc.map(n => n.cast(dec) * n).reduce(_ + _).as("sn2"),
        nkc.map(n => n.cast(dec) * n * (lit(2L) * n + lit(3L)))
          .reduce(_ + _).as("sn23"))
    val m = j2.crossJoin(broadcast(sizes))
    val nd = col("nn").cast("double")
    val mean2 = (col("nn").cast(dec) * col("nn") - col("sn2"))
      .cast("double") / lit(2.0)
    val variance = (nd * nd * (lit(2.0) * nd + lit(3.0)) -
      col("sn23").cast("double")) / lit(72.0)
    m.select(col("nn").as("n_total"), col("j2").cast("long").as("j2"),
      f6((col("j2").cast("double") / lit(2.0) - mean2 / lit(2.0)) /
        sqrt(variance)).as("z"))
  }

  /** Lin's concordance correlation between the two md5 arms' DAILY
    * revenue series (paired by day): CCC = 2·cov/(varA + varB +
    * (meanA−meanB)²) — penalizes level/scale disagreement plain
    * Pearson forgives, i.e. "do the arms TRACK each other", the
    * paired complement to q277's DiD. One exact-moment pass over the
    * paired day frame, one pinned double tree. */
  def q291Concordance(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = t(s, dir, "events")
      .select(to_date(col("ts")).as("d"),
        (col("value").cast(DecimalType(18, 2)) * lit(100))
          .cast("long").as("c"),
        pmod(graft.functions.Hashing.md5Long(
          col("user_id").cast("string")), lit(2)).as("arm"))
      .groupBy(col("d"))
      .agg(sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("xa"),
        sum(when(col("arm") === 1, col("c")).otherwise(0L)).as("xb"))
    val m = daily.agg(count(lit(1)).as("n"),
      sum(col("xa").cast(dec)).cast("double").as("sa"),
      sum(col("xb").cast(dec)).cast("double").as("sb"),
      sum((col("xa").cast(dec) * col("xa"))).cast("double").as("saa"),
      sum((col("xb").cast(dec) * col("xb"))).cast("double").as("sbb"),
      sum((col("xa").cast(dec) * col("xb"))).cast("double").as("sab"))
    val nd = col("n").cast("double")
    val cov2 = nd * col("sab") - col("sa") * col("sb")
    val varA2 = nd * col("saa") - col("sa") * col("sa")
    val varB2 = nd * col("sbb") - col("sb") * col("sb")
    val dmean2 = (col("sa") - col("sb")) * (col("sa") - col("sb"))
    m.select(col("n").as("n_days"),
      f6(lit(2.0) * cov2 / (varA2 + varB2 + dmean2)).as("ccc"))
  }

  /** Durbin–Watson autocorrelation statistic of the daily-revenue OLS
    * residuals — EXACT: with D = n·Σt²−(Σt)², the scaled residual
    * ê_t·D = D·y_t − (aN + bN·t) is an exact integer (aN, bN the
    * cross-multiplied normal-equation numerators), and D² cancels in
    * DW = Σ(Δê)²/Σê², so the statistic is ONE division of two exact
    * DECIMAL sums. The serial-correlation diagnostic for q139's
    * per-group trend fits, with zero float accumulation. */
  def q292DurbinWatson(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = dailyCents(s, dir)
      .select(col("x"), unix_date(col("d")).cast("long").as("tt"))
    val mo = daily.agg(count(lit(1)).as("n"),
      sum(col("tt").cast(dec)).as("st"),
      sum(col("x").cast(dec)).as("sy"),
      sum((col("tt").cast(dec) * col("tt"))).as("stt"),
      sum((col("tt").cast(dec) * col("x"))).as("sty"))
    val scaled = daily.crossJoin(broadcast(mo))
      .select(col("tt"),
        ((col("n").cast(dec) * col("stt") - col("st") * col("st")) *
          col("x") -
          ((col("sy") * col("stt") - col("st") * col("sty")) +
            (col("n").cast(dec) * col("sty") - col("st") * col("sy")) *
            col("tt"))).as("e"))
    val w = Window.orderBy(col("tt"))
    val terms = scaled
      .select(col("e"), (col("e") - lag(col("e"), 1).over(w)).as("de"))
    terms.agg(
        sum(col("e") * col("e")).as("sse"),
        sum(col("de") * col("de")).as("ssd"))
      .select(
        when(col("sse").cast("double") > 0,
          f6(col("ssd").cast("double") / col("sse").cast("double")))
          .as("dw"))
  }

  /** IVF-PQ ADC search, ORACLE-PROVEN end to end: the QUERY path the
    * q184 codebooks exist for. Corpus vectors ENCODE to 4 codes
    * (nearest codeword per 16-dim subspace — map-only, the index
    * build); each query computes its 4×8 lookup table once; the ADC
    * scan scores every candidate with 4 array lookups + 3 adds (the
    * per-pair float loop is GONE — that collapse is why a PQ scan
    * survives corpus sizes brute force cannot); the 50-candidate
    * shortlist re-ranks with exact q37 cosines. DuckDB replays
    * codebooks (q184's CTE chain), codes, LUTs, ADC sums, and both
    * top-k cuts bit-for-bit — fixed fold order everywhere. */
  def q293PqAdcSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.pqAdcTopK(emb, queries, "vec_id", "embedding",
        dim = 64, m = 4, kCodes = 8, rounds = 1, shortlist = 50, k = 10)
      .select(col("query_id"), col("neighbor_id"),
        f6(col("cos")).as("cos"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Incremental near-dup ingestion, ORACLE-PROVEN: the reference's
    * watermark-incremental core loop composed with the LSH dedup
    * family — a 5% batch (doc_id ≡ 7 mod 20) probes the remaining 95%
    * corpus for near-dup candidates with ZERO corpus×corpus work (see
    * Dedup.incrementalCandidates: banded batch broadcast-prunes the
    * corpus index to touched buckets, pairs require a batch member).
    * DuckDB replays the q29 banding and restricts the full pair set to
    * batch-touching pairs — the lossless-vs-full-rerun contract,
    * hash-checked (and differential-tested corpus-wide in
    * DedupSimilaritySpec). */
  def q294IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val batch = docs.filter(col("doc_id") % 20 === 7)
    val corpus = docs.filter(col("doc_id") % 20 =!= 7)
    Dedup.incrementalCandidates(corpus, batch, "text", "doc_id")
      .orderBy("id_a", "id_b")
  }

  /** Full IVF-PQ search, ORACLE-PROVEN: the q42 coarse quantizer
    * restricts WHICH candidates score (4 probed cells of 16 → ~1/4 of
    * the corpus per query) and the q184/q293 product quantizer
    * restricts HOW MUCH each costs (4 LUT lookups + 3 adds) — the
    * composed index a 100 TB ANN serving tier actually builds, with
    * exact q37 cosines re-ranking the 50-deep shortlist. DuckDB
    * replays the whole index: coarse Lloyd, cell assignment, probe
    * sets, PQ codebooks, codes, LUTs, ADC sums, both cuts. */
  def q295IvfPqSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
        dim = 64, m = 4, kCodes = 8, rounds = 1, nlist = 16, nprobe = 4,
        shortlist = 50, k = 10)
      .select(col("query_id"), col("neighbor_id"),
        f6(col("cos")).as("cos"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** MinHash-estimator calibration: for every LSH candidate pair, the
    * signature-agreement estimate of 3-shingle Jaccard (share of equal
    * slots across the 16-slot signatures — the unbiased MinHash
    * estimator) NEXT TO the exact set Jaccard, with absolute error.
    * The report a pipeline runs before trusting an LSH dedup threshold
    * at 100 TB: it shows directly how much estimator variance 16
    * hashes leave at the operating threshold (more hashes → tighter,
    * at linear signature cost). Candidates and signatures reuse the
    * q28/q29 machinery; the exact side is the q31 distinct-shingle
    * equi-join at the SAME n=3 the signatures hash, so estimate and
    * truth live on the same set space.
    *
    * Scale shape: candidates are collision-bound (never all-pairs);
    * the exact-Jaccard join is per-shingle equi (shuffles candidate
    * shingles only); the estimate is a per-pair map over two 16-slot
    * arrays. */
  def q296MinhashCalibration(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id")
    val exact = Dedup.ngramJaccard(docs, pairs, "doc_id", "text", 3)
    val sigs = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), 3, 16).as("sig"))
    exact
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")),
        Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")),
        Seq("id_b"))
      .withColumn("est",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") / lit(16.0))
      .select(col("id_a"), col("id_b"), f6(col("est")).as("est_jaccard"),
        f6(col("jaccard")).as("jaccard"),
        f6(abs(col("est") - col("jaccard"))).as("abs_err"))
      .orderBy("id_a", "id_b")
  }

  /** Sequence-packing efficiency report per language for the q92
    * contiguous-concat packing at B=2048: sequences allocated
    * (⌈total/B⌉), tokens wasted (only the LAST sequence is non-full
    * under contiguous packing), fill rate, and how many documents
    * straddle a sequence boundary (and so pay an attention-mask
    * split) — the numbers that decide between contiguous packing and
    * best-fit at training time. Integer DIV arithmetic throughout
    * (q92's floor(double) drifts past 2^53 token offsets; DIV never
    * does); one f6 division at emit.
    *
    * Scale shape: the per-language offset window is the q92 shape
    * (partitioned by lang), then one map-side-combinable aggregate. */
  def q297PackingEfficiency(s: SparkSession, dir: String): DataFrame = {
    val b = 2048L
    val docs = t(s, dir, "documents").select(col("lang"), col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("tok_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("straddle",
        when(col("n_tokens") > 0 &&
          expr(s"tok_off DIV $b") =!=
          expr(s"(tok_off + n_tokens - 1) DIV $b"), 1L).otherwise(0L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("straddle")).as("n_straddlers"))
      .withColumn("n_seqs", expr(s"(total_tokens + ${b - 1}) DIV $b"))
      .select(col("lang"), col("n_docs"), col("total_tokens"),
        col("n_seqs"),
        (col("n_seqs") * b - col("total_tokens")).as("waste_tokens"),
        f6(col("total_tokens").cast("double") /
          (col("n_seqs") * b).cast("double")).as("fill_rate"),
        col("n_straddlers"))
      .orderBy("lang")
  }

  /** Shared nDCG@10 discount table 1/log2(i+1), i = 1..10 — computed
    * ONCE here and embedded verbatim into the oracle SQL (the DctBasis
    * pattern), so the irrational discounts cannot drift between
    * engines. */
  private[graft] val ndcgDiscounts: Seq[Double] =
    (1 to 10).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  /** nDCG@10 of the quality-score ranking per source, with graded
    * relevance from length bands — the standard retrieval/eval metric
    * missing from the q211/q212/q223/q226/q228 eval family. DCG terms
    * are made ORDER-INDEPENDENT exactly: each (2^rel − 1)·disc(rank)
    * term is quantized to 2^-40 fixed point (gain·disc is a
    * bit-identical double product in both engines; ·2^40 is exact;
    * floor is exact) and summed as exact longs — the q93 fixed-point
    * trick, so no double fold order exists to pin. One division at
    * the end; sources whose top-10 ideal gain is zero emit NULL.
    *
    * Scale shape: two per-source top-10 windows (partitioned by
    * source) + one aggregate; the discount table is a 10-double
    * literal. */
  def q298NdcgQuality(s: SparkSession, dir: String): DataFrame = {
    val discLit = typedLit(ndcgDiscounts)
    val docs = TextAnalysis.withQuality(t(s, dir, "documents"), "text")
      .select(col("source"), col("doc_id"), col("quality_score"),
        when(col("n_chars") >= 300, 3L)
          .when(col("n_chars") >= 200, 2L)
          .when(col("n_chars") >= 100, 1L).otherwise(0L).as("rel"))
      .withColumn("gain", when(col("rel") === 3, 7L)
        .when(col("rel") === 2, 3L).when(col("rel") === 1, 1L)
        .otherwise(0L))
    val wSys = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    val wIdeal = Window.partitionBy(col("source"))
      .orderBy(col("rel").desc, col("doc_id").asc)
    val ranked = docs
      .withColumn("r_sys", row_number().over(wSys))
      .withColumn("r_ideal", row_number().over(wIdeal))
    def fixedTerm(rankCol: Column): Column =
      floor(col("gain").cast("double") *
        element_at(discLit, rankCol.cast("int")) * lit(1L << 40))
        .cast("long")
    ranked.groupBy(col("source"))
      .agg(
        sum(when(col("r_sys") <= 10, fixedTerm(col("r_sys")))
          .otherwise(0L)).as("dcg_fixed"),
        sum(when(col("r_ideal") <= 10, fixedTerm(col("r_ideal")))
          .otherwise(0L)).as("idcg_fixed"))
      .select(col("source"),
        f6(col("dcg_fixed").cast("double") / lit((1L << 40).toDouble))
          .as("dcg10"),
        f6(col("idcg_fixed").cast("double") / lit((1L << 40).toDouble))
          .as("idcg10"),
        when(col("idcg_fixed") > 0,
          f6(col("dcg_fixed").cast("double") /
            col("idcg_fixed").cast("double"))).as("ndcg10"))
      .orderBy("source")
  }

  /** Krippendorff's alpha (nominal) over a deterministic rater×item
    * frame from events (item = event_id DIV 5, rater = event_id mod 5,
    * label = event_type) — the missing-data-tolerant sibling of q141's
    * Cohen's kappa (kappa needs exactly two raters rating everything;
    * alpha handles any rater count per item, which is what real
    * labeling pipelines produce). EXACT arithmetic: the per-item
    * disagreement Σ_c o_ic(m_i−o_ic)/(m_i−1) is made integral by
    * scaling with 12 = lcm(1,2,3,4) (m_i ≤ 5 ⇒ m_i−1 divides 12), so
    * both the observed and expected sums are exact longs and
    * α = 1 − S12·(n−1)/(12·Σ_c n_c(n−n_c)) is ONE division at emit.
    *
    * Scale shape: two map-side-combinable aggregates ((item,label) →
    * item → scalars) plus a label-marginal aggregate — no windows, no
    * joins beyond a 1-row broadcast. */
  def q299KrippendorffAlpha(s: SparkSession, dir: String): DataFrame = {
    // rater identity (event_id mod 5) never enters nominal alpha — only
    // the per-item label counts do — so it is not materialized
    val ratings = t(s, dir, "events")
      .select(expr("event_id DIV 5").as("item"),
        col("event_type").as("label"))
    val oic = ratings.groupBy(col("item"), col("label"))
      .agg(count(lit(1)).as("o"))
    val withM = oic.join(
      oic.groupBy(col("item")).agg(sum(col("o")).as("m")), Seq("item"))
      .filter(col("m") >= 2)
    val s12 = withM
      .agg(sum(col("o") * (col("m") - col("o")) * (lit(12L) / (col("m") - 1))
        .cast("long")).as("s12"),
        sum(col("o")).as("n"),
        countDistinct(col("item")).as("n_items"),
        max(col("m")).as("max_m"))
    val nc = withM.groupBy(col("label")).agg(sum(col("o")).as("n_c"))
    val de = nc.crossJoin(broadcast(s12.select(col("n"))))
      .agg(sum(col("n_c") * (col("n") - col("n_c"))).as("de_num"))
    s12.crossJoin(broadcast(de))
      // the lcm-12 exactness claim above silently depends on m ≤ 5
      // (the event_id DIV 5 / mod 5 construction guarantees it on
      // unique dense ids, but a fixture change wouldn't error — both
      // engines would floor 12/(m−1) identically and the differential
      // gate would hash-match a mathematically wrong alpha). Fail loud
      // instead: assert_true throws on violation, returns null (→ the
      // coalesce keeps every row) when the assumption holds.
      // (max_m IS NULL = empty input — nothing to guard, and
      // assert_true raises on NULL conditions)
      .where(coalesce(expr("assert_true(max_m IS NULL OR max_m <= 5, " +
        "'q299: an item has >5 ratings; 12/(m-1) is no longer " +
        "integral and the exact-long disagreement sum would floor')"),
        lit(true)))
      .select(col("n_items"), col("n").as("n_ratings"),
        f6(lit(1.0) - (col("s12") * (col("n") - 1)).cast("double") /
          (lit(12L) * col("de_num")).cast("double")).as("alpha"))
  }

  /** LSH band-tuning curve: the SAME 16-slot MinHash signatures banded
    * as 2×8 / 4×4 / 8×2 (bands × rows-per-band), reporting per config
    * the candidate-pair volume, how many candidates are high-similarity
    * (exact 3-shingle Jaccard ≥ 0.4), and the implied precision — the
    * S-curve knob that decides an LSH dedup's shuffle volume at 100 TB
    * (more bands → higher recall, quadratically more candidate pairs;
    * this report prices that trade on the actual corpus). Candidates
    * reuse q29's machinery at each band count; the exact side is the
    * q31 distinct-shingle join restricted to each config's candidates.
    *
    * Scale shape: per config, one banding map + collision-bound bucket
    * join + per-shingle equi-join; three configs union into a 3-row
    * report. */
  def q300LshTuningCurve(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // the corpus-linear work is SHARED across the three configs: one
    // signature pass and one distinct-shingle explode (lazy
    // localCheckpoint — three consumers each), with only the cheap
    // banding/join tails per config. Identical buckets/Jaccards to the
    // per-config recompute by construction (bandsFromSignatures /
    // jaccardFromShingles are the same chains over the same values).
    val sigs = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), 3, 16).as("sig"))
      .localCheckpoint(false)
    val sh = docs.select(col("doc_id").as("jid"),
      explode(array_distinct(Dedup.shingles(col("text"), 3))).as("sh"))
      .localCheckpoint(false)
    val sizes = sh.groupBy("jid").agg(count(lit(1)).as("set_size"))
    Seq(2, 4, 8).map { b =>
      val pairs = Dedup.candidatesFromBanded(
        Dedup.bandsFromSignatures(sigs, "doc_id", "sig", 16, b),
        "doc_id")
      val jac = Dedup.jaccardFromShingles(sh, sizes, pairs)
      pairs.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(jac.agg(
          sum(when(col("jaccard") >= 0.4, 1L).otherwise(0L))
            .as("n_high_sim")))
        .select(lit(b).as("bands"), lit(16 / b).as("rows_per_band"),
          col("n_candidates"),
          coalesce(col("n_high_sim"), lit(0L)).as("n_high_sim"),
          when(col("n_candidates") > 0,
            f6(coalesce(col("n_high_sim"), lit(0L)).cast("double") /
              col("n_candidates").cast("double"))).as("precision"))
    }.reduce(_ unionByName _).orderBy("bands")
  }

  /** FUZZY benchmark decontamination — the LSH sibling of q65's exact
    * n-gram overlap: a held-out benchmark slice (doc_id ≡ 3 mod 20)
    * probes the training corpus through the SAME banded index
    * machinery as incremental ingestion (`Dedup.incrementalCandidates`
    * with the benchmark as the "batch" — its second role), candidate
    * pairs get exact 3-shingle Jaccard, and each corpus doc reports
    * its worst benchmark match (ties → smaller benchmark id) with a
    * contaminated flag at Jaccard ≥ 0.5. Catches the paraphrased /
    * lightly-edited leakage the exact 8-gram join misses.
    *
    * Scale shape: the probe is collision-bound (banded index, touched
    * buckets only — never corpus×benchmark); the exact Jaccard runs on
    * candidates only; the per-corpus-doc argmax window partitions by
    * doc. */
  def q301FuzzyDecontamination(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bench = docs.filter(col("doc_id") % 20 === 3)
    val corpus = docs.filter(col("doc_id") % 20 =!= 3)
    val pairs = Dedup.incrementalCandidates(corpus, bench, "text", "doc_id")
    val jac = Dedup.ngramJaccard(docs, pairs, "doc_id", "text", 3)
    // orient each pair as (corpus_id, bench_id); drop bench×bench pairs
    val oriented = jac
      .withColumn("a_is_bench", col("id_a") % 20 === 3)
      .withColumn("b_is_bench", col("id_b") % 20 === 3)
      .filter(col("a_is_bench") =!= col("b_is_bench"))
      .select(
        when(col("a_is_bench"), col("id_b")).otherwise(col("id_a"))
          .as("corpus_id"),
        when(col("a_is_bench"), col("id_a")).otherwise(col("id_b"))
          .as("bench_id"),
        col("jaccard"))
    val w = Window.partitionBy(col("corpus_id"))
      .orderBy(col("jaccard").desc, col("bench_id").asc)
    oriented.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("corpus_id"), col("bench_id"),
        f6(col("jaccard")).as("max_jaccard"),
        (col("jaccard") >= 0.5).as("contaminated"))
      .orderBy("corpus_id")
  }

  /** Token burstiness report — the boilerplate/template detector: for
    * the 20 highest-collection-frequency tokens, cf (total
    * occurrences), df (documents containing), and cf/df. A token
    * spread uniformly has cf/df near cf/N; one concentrated in few
    * docs (navigation chrome, license headers, templated spans) has
    * cf/df ≫ 1 and is a candidate for span-level dedup (q94) or
    * blocklisting (q286). Exact integer counts, ONE division at emit.
    *
    * Scale shape: one token explode + one (token) hash-aggregate with
    * map-side partials (df via countDistinct = one extra dedup level
    * on (token, doc)); top-20 is TakeOrderedAndProject, never a global
    * sort. */
  def q302TokenBurstiness(s: SparkSession, dir: String): DataFrame = {
    val tk = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    tk.groupBy(col("tok"))
      .agg(count(lit(1)).as("cf"), countDistinct(col("doc_id")).as("df"))
      .select(col("tok"), col("cf"), col("df"),
        f6(col("cf").cast("double") / col("df").cast("double"))
          .as("burstiness"))
      .orderBy(col("cf").desc, col("tok").asc)
      .limit(20)
  }

  /** Cross-source near-duplicate leakage matrix: the q29 LSH candidate
    * pairs grouped by UNORDERED source pair — how much syndicated /
    * mirrored content couples each pair of sources, the report that
    * decides whether dedup must run across source boundaries or can
    * shard by source (a zero off-diagonal means per-source sharding is
    * lossless; a hot off-diagonal cell means those two crawls overlap
    * and must dedup together). Distinct from q99 (token-level overlap
    * of source vocabularies): this counts near-duplicate DOCUMENT
    * pairs.
    *
    * Scale shape: the source label RIDES the banded rows (`carry`)
    * through the one collision-bound (band, bucket) self-join, so
    * candidate pairs are born carrying both labels — no second join
    * attaches them. The r9 formulation broadcast the (doc → source)
    * map onto the pairs, which at corpus scale is a billions-of-rows
    * broadcast (ADVICE r9 medium); carrying one short string on rows
    * that shuffle anyway costs ~nothing. The distinct dedups on
    * (id_a, id_b, src_a, src_b) — identical cardinality to (id_a,
    * id_b) since source is functionally dependent on id. */
  def q303CrossSourceDups(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val banded = Dedup.withMinhashBands(docs, "text", "doc_id",
      carry = Seq("source"))
    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("source").as("src_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("source").as("src_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("src_a"), col("src_b"))
      .distinct()
      .select(least(col("src_a"), col("src_b")).as("src_lo"),
        greatest(col("src_a"), col("src_b")).as("src_hi"))
      .groupBy(col("src_lo"), col("src_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("cross_source", col("src_lo") =!= col("src_hi"))
      .orderBy("src_lo", "src_hi")
  }

  /** The q295 IVF-PQ search run the way a DEPLOYMENT runs it: the
    * index is built and STORED once (`Similarity.writeIvfPqIndex` —
    * cell-partitioned parquet + `_graft_index.json` sidecar pinning
    * the trained coarse centroids and PQ codebooks) and the query
    * batch scans the stored table (`ivfPqScanStored`: model read from
    * the sidecar, never the caller; probed-cell partition filter →
    * file-level pruning). Same parameters as q295, so the SAME DuckDB
    * index replay oracles both — stored ≡ in-memory pinned against an
    * external engine, on top of the DedupSimilaritySpec row-identity
    * differential.
    *
    * Scale shape: the build half is one training pass + a map-only
    * encode + one partitioned write (runs once per corpus version, not
    * per batch — it's timed inside this query only because the gate
    * needs self-containment); the scan half reads ~nprobe/nlist of the
    * index files and shuffles nothing but per-query top-k windows. */
  def q304IvfPqStored(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    // per-run unique scratch dir (a fixed hash-keyed path raced under
    // concurrent runs against the same sfDir), deleted after the scan
    // materializes — the small result is pinned so the returned frame
    // never re-reads the deleted index
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_idx_").toString
    Similarity.writeIvfPqIndex(emb, path, "vec_id", "embedding",
      dim = 64, m = 4, kCodes = 8, rounds = 1, nlist = 16)
    val res = Similarity.ivfPqScanStored(s, path, queries, "vec_id",
        "embedding", nprobe = 4, k = 10, shortlist = 50)
      .select(col("query_id"), col("neighbor_id"),
        f6(col("cos")).as("cos"), col("rank"))
      .orderBy("query_id", "rank")
      .localCheckpoint(true)
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** Incremental SURVIVOR maintenance, ORACLE-PROVEN — the step after
    * q294's per-batch candidate pairs: merge the batch into the STORED
    * component assignments (`Dedup.incrementalComponents`: union-find
    * over touched component labels only — never a corpus-scale CC
    * recompute) and emit the DELTA an ingest pipeline persists — new
    * docs plus old docs whose canonical component changed. DuckDB
    * replays the FULL component computation over old ∪ new and diffs
    * it against the corpus-only components, so the hash match IS the
    * incremental ≡ full-recompute contract, pinned externally.
    *
    * Scale shape: the old assignments here are recomputed from the
    * corpus for gate self-containment (a deployment reads its stored
    * table); the OPERATOR's per-batch cost is two map-only passes over
    * the assignments plus a CC fixpoint on the batch-bound touched-
    * label graph (see incrementalComponents' scaladoc; per-batch wall
    * measured flat under corpus growth in ProbeIncremental). */
  def q305IncrementalSurvivors(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val batch = docs.filter(col("doc_id") % 20 === 7)
    val corpus = docs.filter(col("doc_id") % 20 =!= 7)
    val oldAssign = Dedup.connectedComponents(corpus, "doc_id",
        Dedup.minhashCandidates(corpus, "text", "doc_id"))
      .withColumnRenamed("id", "doc_id")
    val pairs = Dedup.incrementalCandidates(corpus, batch, "text",
      "doc_id")
    val updated = Dedup.incrementalComponents(oldAssign,
      batch.select("doc_id"), "doc_id", pairs)
    updated
      .join(oldAssign.select(col("doc_id"),
        col("component").as("old_component")), Seq("doc_id"), "left")
      .where(col("old_component").isNull ||
        col("component") =!= col("old_component"))
      .select(col("doc_id"), col("component"),
        when(col("old_component").isNull, lit("new"))
          .otherwise(lit("merged")).as("status"))
      .orderBy("doc_id")
  }

  /** End-to-end incremental-pipeline CAPSTONE, ORACLE-PROVEN — the
    * full per-batch path a 100 TB ingest runs, composed from the
    * operators that each carry their own green row: ingest increment
    * (the reference's watermark split — q294's batch) → near-dup probe
    * against the corpus (collision-bound candidates, q294) → survivor
    * maintenance (incremental component merge, q305; a batch doc
    * survives iff it IS its component's canonical min-id
    * representative) → quality gate (q33's score ≥ 0.5) → sequence
    * packing of the surviving gated batch (q92's exclusive prefix sum
    * per language). DuckDB replays every stage — reach-CTE components,
    * quality arithmetic, packing window — so the one hash pins the
    * whole composition.
    *
    * Scale shape: each stage is the proven shape of its parent query —
    * nothing here shuffles the corpus beyond the banding scan the
    * probe needs (stored-index form in DedupSimilaritySpec); the
    * packing window partitions by lang over BATCH rows only. */
  def q306IncrementalPipeline(s: SparkSession, dir: String): DataFrame = {
    val b = 2048
    val docs = t(s, dir, "documents")
    val batch = docs.filter(col("doc_id") % 20 === 7)
    val corpus = docs.filter(col("doc_id") % 20 =!= 7)
    val oldAssign = Dedup.connectedComponents(corpus, "doc_id",
        Dedup.minhashCandidates(corpus, "text", "doc_id"))
      .withColumnRenamed("id", "doc_id")
    val pairs = Dedup.incrementalCandidates(corpus, batch, "text",
      "doc_id")
    val updated = Dedup.incrementalComponents(oldAssign,
      batch.select("doc_id"), "doc_id", pairs)
    val survivors = batch.join(
      updated.where(col("component") === col("doc_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val gated = TextAnalysis.withQuality(survivors, "text")
      .where(col("quality_score") >= 0.5)
      .select(col("doc_id"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
        col("quality_score"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    gated
      .withColumn("tok_off",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("quality_score"), col("tok_off"),
        floor(col("tok_off").cast("double") / b).as("seq_first"),
        floor((col("tok_off") + col("n_tokens") - 1).cast("double") / b)
          .as("seq_last"))
      .orderBy("lang", "doc_id")
  }

  /** Coarse-model DRIFT report, ORACLE-PROVEN — the retrain trigger
    * for an append-maintained ANN index (q304's sidecar freezes the
    * build-time model; `appendToIvfPqIndex` encodes new vectors under
    * it): the quantizer trains on the build slice (vec_id < 400),
    * both slices assign under the frozen model, and each cell reports
    * old/new member counts, fixed-point-exact mean cosine fit for
    * each slice, and the drift gap. DuckDB replays the coarse Lloyd
    * chain over the build slice and the frozen assignment of the full
    * corpus.
    *
    * Scale shape: bounded-model training collect + two map-only
    * assignments against an nlist×dim literal + one map-side-
    * combinable aggregate (≤ nlist rows out). */
  def q307ModelDrift(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val build = emb.filter(col("vec_id") < 400)
    val appended = emb.filter(col("vec_id") >= 400)
    Similarity.coarseDriftStats(build, appended, "vec_id", "embedding",
        nlist = 8, rounds = 1)
      .select(col("cell"), col("n_old"), col("n_new"),
        f6(col("mean_cos_old")).as("mean_cos_old"),
        f6(col("mean_cos_new")).as("mean_cos_new"),
        f6(col("drift")).as("drift"))
      .orderBy("cell")
  }

  /** Bucket-index BALANCE report, ORACLE-PROVEN — the operational
    * monitor for a stored LSH index (`Dedup.writeBucketIndex` lays the
    * banded corpus out in `bpart = bucket mod parts` directories; this
    * reports whether that layout is actually balanced): per bpart, the
    * banded-row count (directory size — probe I/O per touched part),
    * distinct buckets, and the largest single bucket (the hot-bucket
    * candidate the `maxBucketSize` cap exists for). A skewed bpart
    * histogram means probe I/O varies by batch; a giant max bucket
    * means boilerplate that belongs in exact dedup.
    *
    * Scale shape: one banding map + two map-side-combinable
    * aggregates ((bpart, bucket) → bpart); `parts` rows out. */
  def q308IndexBalance(s: SparkSession, dir: String): DataFrame = {
    val parts = 16
    val idx = Dedup.bucketIndex(t(s, dir, "documents"), "text",
      "doc_id", parts = parts)
    idx.groupBy(col("bpart"), col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsize")) // (band, bucket) is the probe unit
      .groupBy(col("bpart"))
      .agg(sum(col("bsize")).as("n_rows"),
        count(lit(1)).as("n_buckets"),
        max(col("bsize")).as("max_bucket"))
      .orderBy("bpart")
  }

  /** Cross-document boilerplate detection — the CCNet/RefinedWeb
    * hygiene pass that finds site furniture (headers, footers, cookie
    * banners) repeated VERBATIM across many pages of one site: a word
    * 2-gram is boilerplate for a source when it appears in ≥ 20 % of
    * that source's documents AND in ≥ 3 of them (the absolute floor
    * keeps two-doc sources from declaring everything furniture).
    * Emits the per-document report a removal pass keys on: total
    * 2-gram positions, positions covered by boilerplate grams, and
    * the covered fraction — docs near 1.0 are pure furniture. The
    * threshold compares in exact integers (df·5 ≥ n_docs).
    *
    * Like q67's synthetic PII, the fixture corpus carries no real site
    * furniture (and the word-salad bigram doc-frequency ratios
    * CONCENTRATE below 20 % as sites grow — at sf0.1 nothing natural
    * fires), so every doc gains its source's deterministic footer
    * sentence ("<src>_hdr cookie notice all rights reserved
    * <src>_end") that the oracle regenerates exactly: its interior
    * 2-grams hit df = 100 % of the site and must all be flagged, the
    * doc-varying seam gram (last word, <src>_hdr) must not, and the
    * natural grams exercise the threshold both ways (some fire at
    * sf0.01, none at sf0.1).
    *
    * Scale shape: ONE shingle explode feeds both the doc-frequency
    * aggregate (distinct (source, gram, doc), then a map-side-
    * combinable hash-agg) and the per-doc position count; the
    * boilerplate set is the collision-bound survivor of the ≥ 20 %
    * filter (only high-DF grams) and joins back to positions on
    * (source, gram) with NO hint — AQE broadcasts it when small (the
    * common case) and shuffles when a pathological corpus makes it
    * big (the q303 lesson). Per-source doc counts are a |sources|-row
    * aggregate. Nothing is all-pairs; nothing corpus-scale is
    * broadcast. */
  def q309BoilerplateNgrams(s: SparkSession, dir: String): DataFrame = {
    // spread the tokenize+shingle map (r16): the corpus parquet is one
    // unsplittable row group, so the whole 291k-position explode ran in
    // the single scan task (~1.1s, and q312 pays it again); hashing the
    // raw docs across the configured parallelism first costs one tiny
    // exchange of the 5k texts
    val docs = t(s, dir, "documents")
      .repartition(graft.operators.Graph.shufflePartitions(
        t(s, dir, "documents")), col("doc_id"))
      .select(col("doc_id"), col("source"),
      Dedup.shingles(concat(col("text"), lit(" "), col("source"),
        lit("_hdr cookie notice all rights reserved "), col("source"),
        lit("_end")), 2).as("sh"))
    val pos = docs.select(col("doc_id"), col("source"),
      explode(col("sh")).as("g"))
    val df = pos.select(col("source"), col("g"), col("doc_id")).distinct()
      .groupBy("source", "g").agg(count(lit(1)).as("df"))
    val sz = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val boiler = df.join(sz, Seq("source"))
      .filter(col("df") * 5 >= col("n_docs") && col("df") >= 3)
      .select(col("source"), col("g"), lit(1L).as("is_b"))
    pos.join(boiler, Seq("source", "g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pos"),
        sum(coalesce(col("is_b"), lit(0L))).as("n_boiler"))
      .select(col("doc_id"), col("n_pos"), col("n_boiler"),
        f6(col("n_boiler").cast("double") / col("n_pos")).as("boiler_frac"))
      .orderBy("doc_id")
  }

  /** Reference-corpus perplexity gate — the CCNet quality filter: a
    * Laplace bigram LM trained on ONE trusted source (src0, the wiki
    * stand-in) scores every document, and each language's docs split
    * into head/middle/tail terciles by score (tercile 1 = most
    * reference-like; CCNet keeps head+middle and drops tail). Unseen
    * bigrams smooth to (0+1)/(c_u+V), unseen contexts to 1/V — the
    * q90 arithmetic with counts restricted to the reference slice.
    * Per-bigram probabilities round to 2^40 fixed point (floor) and
    * sum as exact longs; the tercile orders by the integer mean
    * (sum_pf div n_bigrams — integer DIV, no 2^53 drift) with doc_id
    * tie-break, so bucket assignment is bit-deterministic in both
    * engines.
    *
    * Scale shape: the LM is MODEL-sized (vocab²-bounded bigram counts,
    * vocab-bounded context counts), not corpus-sized — the two LEFT
    * joins hit tables AQE broadcasts, and the vocab size is a 1-row
    * broadcast. The tercile window partitions by lang; if one language
    * outgrows a task, Ranking.globalNtile / the q68 two-phase shape
    * swaps in unchanged. */
  def q310PerplexityGate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        TextAnalysis.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 2)
    def bigrams(d: DataFrame): DataFrame = d
      .select(col("doc_id"), col("lang"),
        explode(transform(slice(col("ts"), lit(1), size(col("ts")) - 1),
          (u, i) => struct(u.as("u"),
            element_at(col("ts"), i + lit(2)).as("v")))).as("b"))
      .select(col("doc_id"), col("lang"), col("b.u").as("u"),
        col("b.v").as("v"))
    val refBi = bigrams(docs.filter(col("source") === "src0"))
    val cuv = refBi.groupBy("u", "v").agg(count(lit(1)).as("c_uv"))
    val cu = refBi.groupBy("u").agg(count(lit(1)).as("c_u"))
    val vocab = docs.filter(col("source") === "src0")
      .select(explode(col("ts")).as("tok"))
      .agg(countDistinct(col("tok")).as("vsz"))
    bigrams(docs)
      .join(cuv, Seq("u", "v"), "left")
      .join(cu, Seq("u"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("lang"),
        floor((coalesce(col("c_uv"), lit(0L)) + lit(1)).cast("double") /
          (coalesce(col("c_u"), lit(0L)) + col("vsz")) * lit(1L << 40))
          .as("pf"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("pf")).as("sum_pf"))
      .withColumn("avg_pf", expr("sum_pf div n_bigrams"))
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy(col("lang"))
          .orderBy(col("avg_pf").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("avg_pf"),
        col("bucket"))
      .orderBy("doc_id")
  }

  /** Tokenizer fertility report — the per-language health check run
    * after every tokenizer retrain: fertility = BPE tokens emitted
    * per word (1.0 is perfect; ≫ 1 means the merge table under-serves
    * that language, whose documents then burn more context budget per
    * unit content) and compression = chars per BPE token. Words are
    * the q204/q207 population ([a-z]+, 3–12 chars); the encoder
    * replays the learned merge list greedily per distinct word.
    *
    * Scale shape: the encoder's replace-chain runs once per DISTINCT
    * (lang, word) — a vocab-bounded frame, not per token occurrence —
    * and per-(lang, word) counts weight the result back to corpus
    * mass in one |langs|-row hash-agg. The merge table is the same
    * bounded-model collect as q204/q207 (topV=200 × 8 rounds). */
  def q311TokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val merges = bpeLearnedMerges(s, dir)
    val encoded = merges.foldLeft(
      regexp_replace(col("w"), "(.)", "@$1")) { case (c, (_, a, b, _)) =>
      call_function("replace", c, lit(s"@$a@$b"), lit(s"@$a$b"))
    }
    t(s, dir, "documents")
      .select(col("lang"), explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")).between(3, 12))
      .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
      .select(col("lang"), col("cnt"),
        (size(split(encoded, "@")) - 1).cast("long").as("n_bpe"),
        length(col("w")).cast("long").as("n_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_vocab"),
        sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_bpe")).as("n_bpe_tokens"),
        sum(col("cnt") * col("n_chars")).as("n_chars_tot"))
      .select(col("lang"), col("n_vocab"), col("n_words"),
        col("n_bpe_tokens"),
        f6(col("n_bpe_tokens").cast("double") / col("n_words"))
          .as("fertility"),
        f6(col("n_chars_tot").cast("double") / col("n_bpe_tokens"))
          .as("chars_per_token"))
      .orderBy("lang")
  }

  /** Quality-gate ablation matrix — the report that tunes a filter
    * STACK rather than one filter: for every unordered pair of gates
    * (short-doc, repetition ≥ 20 %, boilerplate coverage ≥ 20 %,
    * perplexity tail tercile) the number of docs BOTH would drop;
    * diagonal = each gate's solo drop count. A pair whose overlap ≈ a
    * gate's diagonal means that gate is subsumed and can be retired
    * (it only re-drops what its partner already drops); a near-zero
    * off-diagonal means the gates are orthogonal and both earn their
    * compute. Distinct from q123 (a SEQUENTIAL funnel attributing
    * docs to the first gate that fires): this is the symmetric
    * marginal-overlap view. All thresholds compare in exact integers;
    * every output cell is a count.
    *
    * Scale shape: each flag rides the machinery of its parent query
    * (q66 repetition is per-row map work; q309's boilerplate join and
    * q310's model-sized LM joins keep their shapes), the four per-doc
    * flag frames combine on doc_id equi-joins, and the pair explosion
    * is ≤ 4 names per doc self-joined on doc_id (≤ 16 pairs/doc,
    * collision-bound by construction) into a ≤ 10-row aggregate. */
  def q312FilterAblation(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"),
      (size(TextAnalysis.tokens(col("text"))) < 25).as("f_short"))
    val rep = q66Repetition(s, dir).select(col("doc_id"),
      ((col("n_bigrams") - col("n_distinct_bigrams")) * 5 >=
        col("n_bigrams")).as("f_rep"))
    val boil = q309BoilerplateNgrams(s, dir).select(col("doc_id"),
      (col("n_boiler") * 5 >= col("n_pos")).as("f_boiler"))
    val tail = q310PerplexityGate(s, dir).select(col("doc_id"),
      (col("bucket") === 3).as("f_tail"))
    val flags = base
      .join(rep, Seq("doc_id"), "left")
      .join(boil, Seq("doc_id"), "left")
      .join(tail, Seq("doc_id"), "left")
      .select(col("doc_id"), col("f_short"),
        coalesce(col("f_rep"), lit(false)).as("f_rep"),
        coalesce(col("f_boiler"), lit(false)).as("f_boiler"),
        coalesce(col("f_tail"), lit(false)).as("f_tail"))
    val failed = flags.select(col("doc_id"),
      explode(filter(array(
        struct(lit("boiler").as("n"), col("f_boiler").as("v")),
        struct(lit("rep").as("n"), col("f_rep").as("v")),
        struct(lit("short").as("n"), col("f_short").as("v")),
        struct(lit("tail").as("n"), col("f_tail").as("v"))),
        x => x.getField("v"))).as("fs"))
      .select(col("doc_id"), col("fs.n").as("f"))
    val fa = failed.select(col("doc_id"), col("f").as("f_a"))
    val fb = failed.select(col("doc_id"), col("f").as("f_b"))
    fa.join(fb, Seq("doc_id")).where(col("f_a") <= col("f_b"))
      .groupBy("f_a", "f_b").agg(count(lit(1)).as("n_docs"))
      .orderBy("f_a", "f_b")
  }

  /** Quality-aware survivor selection — the keep rule production dedup
    * pipelines actually apply: within each near-duplicate cluster
    * (q52's connected components over banded-LSH candidate pairs) keep
    * the HIGHEST-QUALITY member (q33's score, doc_id ascending
    * tie-break), not the arbitrary min-id. Emits the per-cluster
    * decision table an ingest pipeline persists: survivor, member
    * count, and the survivor's quality. Complements q305 (which
    * maintains the min-id labeling incrementally): the labels stay
    * canonical min-ids, the KEEP decision upgrades to quality.
    *
    * Scale shape: clustering rides q52's machinery (collision-bound
    * banded pairs + pointer-doubling CC, never all-pairs); quality is
    * per-row map work joined on doc_id; the keep decision is one
    * row_number window + one aggregate over the SAME component
    * partitioning (no second exchange). Clusters are collision-bound
    * small; a pathological mega-cluster is q52's documented skew
    * story, not this operator's. */
  def q313QualitySurvivors(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val comp = Dedup.connectedComponents(docs, "doc_id",
        Dedup.minhashCandidates(docs, "text", "doc_id"))
      .withColumnRenamed("id", "doc_id")
    val q = TextAnalysis.withQuality(docs, "text")
      .select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy(col("component"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    comp.join(q, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"),
        max(when(col("rn") === 1, col("doc_id"))).as("survivor"),
        max(when(col("rn") === 1, col("quality_score")))
          .as("best_quality"))
      .orderBy("component")
  }

  /** Takedown EXPANSION — the compliance pass that precedes any
    * deletion: a takedown request names specific docs, but a trained
    * model has seen their near-duplicates too, so the removal set is
    * the full near-dup closure — every doc sharing a component (q52's
    * banded-LSH connected components) with a requested doc. Emits the
    * expanded removal set with its component and a seed flag — the
    * table [[graft.operators.Dedup.deleteFromBucketIndex]] (index),
    * [[graft.operators.Dedup.deleteRepairAssignments]] (survivor
    * state) and [[graft.sinks.PartitionedSink.deleteRowsByKey]] (the
    * corpus table itself) then consume.
    *
    * Scale shape: clustering rides q52's machinery (collision-bound
    * pairs, pointer-doubling CC); the expansion itself is two
    * semi-joins — seeds → touched components (bounded by the request
    * size, AQE broadcasts it) → members. No new corpus-scale shuffle
    * beyond q52's. */
  def q314TakedownExpansion(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val comp = Dedup.connectedComponents(docs, "doc_id",
        Dedup.minhashCandidates(docs, "text", "doc_id"))
      .withColumnRenamed("id", "doc_id")
    val seedComps = comp.where(col("doc_id") % 50 === 3)
      .select(col("component")).distinct()
    comp.join(seedComps, Seq("component"), "left_semi")
      .select(col("doc_id"), col("component"),
        when(col("doc_id") % 50 === 3, lit(1)).otherwise(lit(0))
          .cast("int").as("is_seed"))
      .orderBy("doc_id")
  }

  /** Takedown REPAIR delta, ORACLE-PROVEN — the survivor-maintenance
    * step after a deletion (the removal-side complement of q305's
    * append-side merge): the previously-kept canonical docs of every
    * multi-member cluster are recalled (found contaminated — the
    * worst-case takedown, since every deleted id is a component
    * label), and [[graft.operators.Dedup.deleteRepairAssignments]]
    * repairs the stored assignments by recomputing components over
    * ONLY the touched clusters' remaining members. Deletion can SPLIT
    * a cluster (the deleted doc may have been the bridge), so unlike
    * the append path no label algebra is sound — the localized
    * recompute is exact because edges never cross components. DuckDB
    * replays the FULL component computation over the remaining corpus
    * and diffs it against the original labels, so the hash match IS
    * the localized ≡ full-recompute contract, pinned externally.
    * Emits the delta an ingest pipeline persists: remaining docs whose
    * component label changed.
    *
    * Scale shape: the corpus-scale assignments and pairs tables are
    * pruned to the touched components by semi-joins against a
    * request-bounded list; the CC fixpoint runs on the touched
    * neighborhoods only (see deleteRepairAssignments' scaladoc; wall
    * measured ∝ touched size in ProbeIncremental). The old assignments
    * are recomputed here for gate self-containment — a deployment
    * reads its stored table. */
  def q315DeleteRepair(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id")
      .localCheckpoint(false)
    val assignments = Dedup.connectedComponents(docs, "doc_id", pairs)
      .withColumnRenamed("id", "doc_id").localCheckpoint(false)
    val doomed = assignments.groupBy(col("component"))
      .agg(count(lit(1)).as("n")).where(col("n") >= 2)
      .select(col("component").as("doc_id"))
    val repaired = Dedup.deleteRepairAssignments(assignments, pairs,
      doomed, "doc_id")
    repaired.join(assignments.select(col("doc_id"),
        col("component").as("old_component")), Seq("doc_id"))
      .where(col("component") =!= col("old_component"))
      .select(col("doc_id"), col("old_component"), col("component"))
      .orderBy("doc_id")
  }

  /** Bounded-duplication sampling ("soft dedup") — the middle ground
    * production corpora actually ship between keep-1 (q313) and
    * keep-all: within each near-dup cluster keep the top-`cap`(=2)
    * members by quality (q33's score, doc_id tie-break) and record
    * each survivor's in-cluster rank and the cluster size, so the
    * trainer can down-weight duplicates instead of losing them
    * entirely (bounded duplication is often a better loss trade than
    * hard dedup for high-quality clusters). Emits kept docs only.
    *
    * Scale shape: identical to q313's — q52's collision-bound
    * clustering, per-row quality map work, ONE component-partitioned
    * window computing rank and size together (no second exchange);
    * the cap filter is a post-window predicate. */
  def q316ClusterCapSample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val comp = Dedup.connectedComponents(docs, "doc_id",
        Dedup.minhashCandidates(docs, "text", "doc_id"))
      .withColumnRenamed("id", "doc_id")
    val q = TextAnalysis.withQuality(docs, "text")
      .select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy(col("component"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    val wAll = Window.partitionBy(col("component"))
    comp.join(q, Seq("doc_id"))
      .withColumn("rank_in_cluster", row_number().over(w))
      .withColumn("cluster_size", count(lit(1)).over(wAll))
      .where(col("rank_in_cluster") <= 2)
      .select(col("doc_id"), col("component"),
        col("rank_in_cluster"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** Partition-targeted corpus takedown, ORACLE-PROVEN — the
    * string-partition delete path r10's verdict asked for
    * ([[graft.sinks.PartitionedSink.deletePartitionRowsByKey]]): the
    * corpus copy is laid out `partitionBy(lang)` (Hive-escaped string
    * directory names — the layout every lang/source-partitioned corpus
    * table actually has), a takedown batch names docs concentrated in
    * two languages, and ONLY those two partition directories rewrite
    * (the same touched-dirs-only engine, recoverable swap included, as
    * the index families' deletes). The emitted per-lang survivor
    * aggregate is recomputed from the post-delete table, so the DuckDB
    * hash match pins the on-disk delete — escaping, swap, untouched
    * dirs — against an external replay of the remaining corpus.
    *
    * Scale shape: one two-column membership scan finds the touched
    * dirs; the rewrite reads and writes ONLY those (at 100 TB a
    * two-language takedown touches 2 of thousands of directories);
    * the audit aggregate is one map-side-combinable groupBy with
    * ≤ |langs| rows out. The scratch copy exists for gate
    * self-containment — a deployment deletes in place. */
  def q317PartitionedTakedown(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tbl = java.nio.file.Files
      .createTempDirectory("graft_part_takedown_").toString
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .repartition(col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(tbl)
    val del = docs
      .filter(col("doc_id") % 7 === 3 && col("lang").isin("de", "fr"))
      .select("doc_id")
    PartitionedSink.deletePartitionRowsByKey(s, tbl, "doc_id", del)
    // explicit schema: an EMPTY corpus writes a partition-less table
    // root that schema inference refuses; the audit's contract is an
    // empty aggregate, not a crash
    val res = s.read.schema("doc_id BIGINT, n_chars BIGINT, lang STRING")
      .parquet(tbl)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")
      .localCheckpoint(true) // pin before the scratch copy is deleted
    val p = new org.apache.hadoop.fs.Path(tbl)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** APPEND-maintained ANN index, ORACLE-PROVEN — the frozen-model
    * append contract q304 left to ScalaTest differentials, pinned
    * externally: the index is built (trained + encoded) over the
    * vec_id < 375 slice only, the rest of the corpus is APPENDED under
    * the frozen sidecar model
    * ([[graft.operators.Similarity.appendToIvfPqIndex]] — codes for
    * appended vectors computed with codebooks that never saw them),
    * and the stored scan runs q295's exact parameters. DuckDB replays
    * the same split — Lloyd training CTEs restricted to the build
    * slice, assignment/encode/probe/ADC over the whole corpus — so the
    * hash match IS the append ≡ frozen-model-rebuild contract, against
    * an external engine.
    *
    * Scale shape: identical to q304's (build once + map-only append +
    * pruned scan); the append leg is the part measured flat at
    * 4×/25×/100× in ProbeAnn after the r11 count-arithmetic fix. */
  def q318IvfAppendScan(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val build = emb.filter(col("vec_id") < 375)
    val appended = emb.filter(col("vec_id") >= 375)
    val queries = emb.filter(col("vec_id") < 5)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_append_idx_").toString
    Similarity.writeIvfPqIndex(build, path, "vec_id", "embedding",
      dim = 64, m = 4, kCodes = 8, rounds = 1, nlist = 16)
    Similarity.appendToIvfPqIndex(s, path, appended, "vec_id",
      "embedding")
    val res = Similarity.ivfPqScanStored(s, path, queries, "vec_id",
        "embedding", nprobe = 4, k = 10, shortlist = 50)
      .select(col("query_id"), col("neighbor_id"),
        f6(col("cos")).as("cos"), col("rank"))
      .orderBy("query_id", "rank")
      .localCheckpoint(true) // pin before the scratch index is deleted
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** Partition-DROP retention sweep, ORACLE-PROVEN — the cheapest
    * takedown shape of all
    * ([[graft.sinks.PartitionedSink.dropPartitionsWhere]]): when the
    * delete predicate aligns with the partition column (a TTL on date
    * buckets, a source decommission), whole directories drop with ZERO
    * rewrite — one listing, one column-pruned audit count, N recursive
    * deletes. Here the corpus copy is source-partitioned and shards
    * src10..src19 age out (the numeric-suffix predicate evaluates on a
    * directory-count-bounded driver frame, never a data scan); the
    * per-source survivor aggregate is recomputed from the table left
    * on disk, so the DuckDB hash match pins the physical drop.
    *
    * Scale shape: at 100 TB this is the operation that makes
    * time-partitioned corpora retainable — cost ∝ matched directory
    * count, data untouched. The scratch copy exists for gate
    * self-containment. */
  def q319PartitionTtl(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tbl = java.nio.file.Files
      .createTempDirectory("graft_part_ttl_").toString
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .repartition(col("source"))
      .write.mode("overwrite").partitionBy("source").parquet(tbl)
    PartitionedSink.dropPartitionsWhere(s, tbl,
      substring(col("source"), 4, 10).cast("int") >= 10)
    val res = s.read
      .schema("doc_id BIGINT, n_chars BIGINT, source STRING")
      .parquet(tbl)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("source")
      .localCheckpoint(true) // pin before the scratch copy is deleted
    val p = new org.apache.hadoop.fs.Path(tbl)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** INCREMENTAL cardinality maintenance, ORACLE-PROVEN — the
    * mergeable-sketch contract ([[graft.operators.Sketches.kmvMins]])
    * doing the job it exists for: the corpus's per-type KMV sketches
    * are the PERSISTED state (k longs per group, built once), a landed
    * batch builds its own sketches, and the merge — k smallest of the
    * union, pure array arithmetic on 2·k values per group — yields the
    * updated distinct-count estimate WITHOUT rescanning the corpus.
    * DuckDB replays the k-min computation over old ∪ new from scratch,
    * so the hash match IS the merge ≡ recompute contract (exact for
    * KMV by construction: min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B))).
    *
    * Scale shape: per-batch cost is one scan of the BATCH plus O(k)
    * per-group merge arithmetic; the corpus-scale sketch build is the
    * once-per-corpus state job (recomputed here for gate
    * self-containment). The same shape maintains NDV statistics for a
    * CBO or a dashboard at 100 TB. */
  def q320IncrementalKmv(s: SparkSession, dir: String): DataFrame = {
    val k = 32
    val ev = t(s, dir, "events")
      .select(col("event_type").as("t"), col("user_id").as("u"))
    val batch = ev.filter(col("u") % 10 === 3)
    val corpus = ev.filter(col("u") % 10 =!= 3)
    val stored = Sketches.kmvMins(corpus, Seq("t"), "u", k)
      .select(col("t"), col("kmins").as("ma"))
    val delta = Sketches.kmvMins(batch, Seq("t"), "u", k)
      .select(col("t"), col("kmins").as("mb"))
    val empty = array().cast("array<bigint>")
    stored.join(delta, Seq("t"), "full_outer")
      .withColumn("mu", slice(array_sort(array_union(
        coalesce(col("ma"), empty), coalesce(col("mb"), empty))), 1, k))
      .select(col("t").as("event_type"),
        Sketches.kmvEstimate(col("mu"), k).as("approx_distinct"))
      .orderBy("event_type")
  }

  /** Probe ADMISSION CONTROL, ORACLE-PROVEN — the ops gate before
    * q294's stored-index probe
    * ([[graft.operators.Dedup.probeAdmission]]): per batch doc, the
    * candidate volume its probe would generate, estimated from the
    * STORED index's bucket sizes over the doc's own buckets (an upper
    * bound — multi-bucket pairs count once per bucket), plus the
    * admit/quarantine flag against a volume budget. A doc landing in a
    * crawl-duplicated mega-bucket is exactly the probe that
    * degenerates toward a full scan at 100 TB; this surfaces it BEFORE
    * the join runs. DuckDB replays banding over the corpus, aggregates
    * bucket sizes, and sums them per batch doc — the hash match pins
    * the estimate, not just the flag.
    *
    * Scale shape: the same bpart-pruned, two-column index read as the
    * probe itself, one (band, bucket) aggregate over the pruned slice,
    * one batch-side join + per-doc sum. */
  def q321ProbeAdmission(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 20 === 7)
    val corpus = docs.filter(col("doc_id") % 20 =!= 7)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_admission_idx_").toString
    Dedup.writeBucketIndex(corpus, idx, "text", "doc_id", parts = 16)
    val res = Dedup.probeAdmission(s, idx, batch, "text", "doc_id",
        budget = 3L)
      .orderBy("doc_id")
      .localCheckpoint(true) // pin before the scratch index is deleted
    val p = new org.apache.hadoop.fs.Path(idx)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** Record LINKAGE via blocked Jaro–Winkler best-match, ORACLE-PROVEN
    * — the entity-resolution verify kernel q189's edit-distance matcher
    * lacks: a "dirty register" (every third customer's name with its
    * trailing digit pair transposed — the canonical key-entry typo)
    * is linked back to the clean register by prefix blocking + the
    * native codegen'd [[graft.functions.JaroWinkler]] expression
    * (semantics pinned BIT-EXACT to DuckDB's
    * `jaro_winkler_similarity`: boost only above jaro 0.7, prefix cap
    * 4 — HashingSpec + 249 785 blocked pairs at full double
    * precision). Per dirty record: the best clean candidate
    * (similarity desc, key asc — deterministic because the doubles are
    * engine-identical) and whether linkage recovered the true entity.
    * The report HONESTLY shows where JW linkage fails: a transposed id
    * that collides with another live sequential key links to the wrong
    * entity at similarity 1.0 — dense identifier spaces need
    * check-digits, not fuzzy matching; the linked_ok flag counts
    * exactly that.
    *
    * Scale shape: candidate volume is Σ|block|² via the 15-char
    * blocking prefix (≤1 000-key blocks at any SF — never all-pairs);
    * the JW verify is a static-call codegen kernel inside the join
    * filter projection; the best-match cut is one
    * blocking-key-partitioned window. */
  def q322RecordLinkage(s: SparkSession, dir: String): DataFrame = {
    val clean = t(s, dir, "customer")
      .select(col("c_custkey").as("clean_key"),
        col("c_name").as("clean_name"))
    val dirty = t(s, dir, "customer")
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("dirty_key"),
        concat(substring(col("c_name"), 1, 16),
          substring(col("c_name"), 18, 1),
          substring(col("c_name"), 17, 1)).as("dirty_name"))
    val jw = org.apache.spark.sql.GraftSql.column(
      graft.functions.JaroWinkler(
        org.apache.spark.sql.GraftSql.expression(col("dirty_name")),
        org.apache.spark.sql.GraftSql.expression(col("clean_name"))))
    val w = Window.partitionBy(col("dirty_key"))
      .orderBy(col("sim").desc, col("clean_key").asc)
    // spread the scoring (r16): the blocking prefix is degenerate on
    // this fixture (every c_name shares its first 15 chars), so the
    // broadcast join ran all |dirty|x|clean| Jaro-Winkler evaluations
    // in customer.parquet's single scan task (3.3s). Hash the dirty
    // side across the configured parallelism first — the window below
    // partitions by the same key, so no extra exchange downstream.
    dirty.repartition(graft.operators.Graph.shufflePartitions(dirty),
        col("dirty_key"))
      .join(clean,
        substring(col("dirty_name"), 1, 15) ===
          substring(col("clean_name"), 1, 15))
      .withColumn("sim", jw)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("dirty_key"), col("clean_key").as("best_clean_key"),
        f6(col("sim")).as("sim"),
        (col("clean_key") === col("dirty_key")).as("linked_ok"))
      .orderBy("dirty_key")
  }

  /** NESTED-layout retention sweep, ORACLE-PROVEN — the reference's own
    * canonical partition shape (`YEAR=2019/MONTH=4`, ref
    * `spark.py:56-58` partitionBy on a column LIST, `config.py:38-39`
    * deriving both columns from one date) driven through the TTL
    * engine ([[graft.sinks.PartitionedSink.dropPartitionsWhere]], r11
    * verdict item 1): lineitem is copied out partitioned by
    * (YEAR, MONTH) of l_shipdate — 83 leaf directories — and a
    * MONTH-GRAIN cutoff (everything before 1995-07) ages out. The
    * predicate sees BOTH partition levels (`yr*12+mo < cutoff`), which
    * is exactly what the single-level engine could not express: the
    * first year is dropped PARTIALLY (Jan–Jun 1995), so an outer-column
    * sweep would either spare or kill the whole year. The survivor
    * aggregate is recomputed from the directories left on disk, so the
    * DuckDB hash match pins the physical drops — leaves only, parents
    * pruned when emptied, data never rewritten.
    *
    * Scale shape: cost ∝ matched leaf count (metadata-only recursive
    * deletes, directory-count-bounded predicate frame) — the operation
    * that makes a date-bucketed 100 TB corpus retainable at month
    * grain without touching surviving years. Scratch copy for gate
    * self-containment. */
  def q323NestedTtl(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        col("l_quantity").cast("bigint").as("qty"),
        year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mo"))
    val tbl = java.nio.file.Files
      .createTempDirectory("graft_nested_ttl_").toString
    li.repartition(col("yr"), col("mo"))
      .write.mode("overwrite").partitionBy("yr", "mo").parquet(tbl)
    PartitionedSink.dropPartitionsWhere(s, tbl,
      col("yr").cast("int") * 12 + col("mo").cast("int") <
        lit(1995 * 12 + 7))
    val res = s.read
      .schema("l_orderkey BIGINT, qty BIGINT, yr INT, mo INT")
      .parquet(tbl)
      .groupBy(col("yr"), col("mo"))
      .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("sum_qty"))
      .orderBy("yr", "mo")
      .localCheckpoint(true) // pin before the scratch copy is deleted
    val p = new org.apache.hadoop.fs.Path(tbl)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** ANN scan ADMISSION CONTROL, ORACLE-PROVEN — the IVF-PQ sibling of
    * q321's LSH probe gate ([[graft.operators.Similarity
    * .scanAdmission]], r11 verdict item 5): per query of the batch,
    * the EXACT number of encoded rows its [[graft.operators.Similarity
    * .ivfPqScanStored]] scan would read — cell sizes of the stored
    * index summed over the query's own nprobe probe cells under the
    * frozen sidecar model — plus the admit/quarantine flag against a
    * row budget. The nprobe-too-high / hot-cell query batch surfaces
    * BEFORE the ADC join runs, from a zero-data-column count over only
    * the touched cell dirs (strictly less I/O than the scan it
    * gates). DuckDB independently replays coarse training, whole-corpus
    * assignment, the probe-cell ranking and the per-query size sums,
    * so the hash match pins both the assignment parity AND the volume
    * arithmetic externally.
    *
    * Scale shape: admission cost is footer counts over ≤ nprobe·|batch|
    * cell dirs — flat as the corpus grows (ProbeAnn measures the wall);
    * the decision it informs is the one that keeps a 100 TB serving
    * index inside its latency budget. */
  def q324ScanAdmission(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val path = java.nio.file.Files
      .createTempDirectory("graft_scan_admission_").toString
    Similarity.writeIvfPqIndex(emb, path, "vec_id", "embedding",
      dim = 64, m = 4, kCodes = 8, rounds = 1, nlist = 16)
    val res = Similarity.scanAdmission(s, path, queries, "vec_id",
        "embedding", nprobe = 4, budget = 125L)
      .select(col("query_id"), col("est_rows"), col("admit"))
      .orderBy("query_id")
      .localCheckpoint(true) // pin before the scratch index is deleted
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** NESTED-layout takedown BY ID, ORACLE-PROVEN — q317's
    * directory-targeted row delete
    * ([[graft.sinks.PartitionedSink.deletePartitionRowsByKey]] →
    * `IndexCompact.deleteMatchingChecked`) generalized to the
    * reference's canonical `YEAR=/MONTH=` shape: the doomed ids'
    * lineitem rows are removed from a (yr, mo)-partitioned copy
    * through the nested manifest swap — the touched-TUPLE predicate is
    * an OR of per-leaf (yr AND mo) conjunctions, the rewrite
    * repartitions on BOTH columns, and the swap unit is the deepest
    * touched directory. RecoverySpec proves the crash states; this
    * pins the end-to-end nested delete against DuckDB's replay of the
    * surviving rows. Delete set `l_orderkey % 13 = 4` — multi-line
    * orders whose lines ship in DIFFERENT months, so a doomed id's
    * rows span leaves and the per-leaf anti-join must agree across
    * them.
    *
    * Scale shape: same as q317 — one column-pruned corpus scan
    * (partition cols + id), rewrite bounded to touched leaves. */
  def q325NestedTakedown(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        col("l_quantity").cast("bigint").as("qty"),
        year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mo"))
    val tbl = java.nio.file.Files
      .createTempDirectory("graft_nested_takedown_").toString
    li.repartition(col("yr"), col("mo"))
      .write.mode("overwrite").partitionBy("yr", "mo").parquet(tbl)
    val del = li.filter(col("l_orderkey") % 13 === 4)
      .select("l_orderkey")
    PartitionedSink.deletePartitionRowsByKey(s, tbl, "l_orderkey", del)
    val res = s.read
      .schema("l_orderkey BIGINT, qty BIGINT, yr INT, mo INT")
      .parquet(tbl)
      .groupBy(col("yr"), col("mo"))
      .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("sum_qty"))
      .orderBy("yr", "mo")
      .localCheckpoint(true) // pin before the scratch copy is deleted
    val p = new org.apache.hadoop.fs.Path(tbl)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** DATE-partitioned takedown, ORACLE-PROVEN — the r12 DateType swap
    * support (`IndexCompact.partDirName` renders
    * `java.sql.Date`/`LocalDate` as the ISO string Spark's writer
    * itself produces) driven end-to-end: orders copied out partitioned
    * by a month-truncated DATE column (80 `d=1996-07-01`-style dirs —
    * the TTL-natural bucket type), a takedown batch deleted by id
    * through the manifest swap (touched DATE values collected from the
    * inferred partition column, dir names re-rendered through the
    * date branch), survivors re-aggregated from disk and hash-matched.
    * Money survives as floor-cents BIGINT — IEEE multiply + floor are
    * bit-identical in both engines, so the sum is exact.
    *
    * Scale shape: q317's — the date rendering changes WHICH dirs
    * rewrite, never how many. */
  def q326DateTakedown(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("bigint").as("cents"),
        date_trunc("month", col("o_orderdate")).cast("date").as("d"))
    val tbl = java.nio.file.Files
      .createTempDirectory("graft_date_takedown_").toString
    ord.repartition(col("d"))
      .write.mode("overwrite").partitionBy("d").parquet(tbl)
    val del = ord.filter(col("o_orderkey") % 11 === 7)
      .select("o_orderkey")
    PartitionedSink.deletePartitionRowsByKey(s, tbl, "o_orderkey", del)
    val res = s.read
      .schema("o_orderkey BIGINT, cents BIGINT, d DATE")
      .parquet(tbl)
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
      // report the bucket as its ISO string: the driver comparator
      // normalizes DuckDB DATE to a timestamp, so a DATE column can't
      // hash-match — the PARTITIONING stays DateType, only the report
      // column is stringified
      .select(col("d").cast("string").as("d"), col("n_orders"),
        col("sum_cents"))
      .orderBy("d")
      .localCheckpoint(true) // pin before the scratch copy is deleted
    val p = new org.apache.hadoop.fs.Path(tbl)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** NULL-partition TTL contract, ORACLE-PROVEN — the r13 decision for
    * `__HIVE_DEFAULT_PARTITION__` leaves in
    * [[graft.sinks.PartitionedSink.dropPartitionsWhere]] (r12 verdict
    * item 2) driven end-to-end: the corpus is copied out partitioned by
    * a NULLABLE source key (src7 nulled), a typed numeric TTL ages out
    * the high sources — and the null leaf survives BY SQL SEMANTICS
    * (the sentinel surfaces to the predicate as NULL, which never
    * satisfies a comparison; it is also counted in the sweep's
    * retained-nulls report, asserted in-line). Dropping null
    * partitions is then a second, DELIBERATE `isNull` sweep. The
    * result unions both phases' survivor aggregates recomputed from
    * the directories left on disk, so the DuckDB hash match pins both
    * physical states: phase 1 must still contain the null group
    * (silent retention is impossible to confuse with a drop), phase 2
    * must not.
    *
    * Scale shape: both sweeps are the metadata-only directory drops of
    * q319 — the null handling changes WHAT the predicate sees, never
    * what gets read. */
  def q327NullPartitionTtl(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        when(col("source") === "src7", lit(null))
          .otherwise(col("source")).as("src"))
    val tbl = java.nio.file.Files
      .createTempDirectory("graft_null_ttl_").toString
    docs.repartition(col("src"))
      .write.mode("overwrite").partitionBy("src").parquet(tbl)
    def survivors(phase: Int) = s.read
      .schema("doc_id BIGINT, n_chars BIGINT, src STRING")
      .parquet(tbl)
      .groupBy(coalesce(col("src"), lit("null")).as("src"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .withColumn("phase", lit(phase))
      .localCheckpoint(true) // pin before the next sweep mutates the dir
    val (_, _, nulls1) = PartitionedSink.dropPartitionsWhere(s, tbl,
      substring(col("src"), 4, 10).cast("int") >= 15)
    require(nulls1 == 1L,
      s"typed TTL must report the retained null leaf, got $nulls1")
    val phase1 = survivors(1)
    val (_, d2, nulls2) = PartitionedSink.dropPartitionsWhere(s, tbl,
      col("src").isNull)
    require(d2 == 1L && nulls2 == 0L,
      s"deliberate isNull sweep must drop the one null leaf: ($d2, $nulls2)")
    val phase2 = survivors(2)
    val res = phase1.unionByName(phase2)
      .select(col("phase"), col("src"), col("n_docs"), col("sum_chars"))
      .orderBy("phase", "src")
      .localCheckpoint(true)
    val p = new org.apache.hadoop.fs.Path(tbl)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** COMPLIANCE LEDGER, ORACLE-PROVEN — the unified takedown evidence
    * sink ([[graft.sinks.ComplianceLog]], r12 stretch item 8) driven
    * through three sequential takedown batches against a
    * source-partitioned corpus copy: each batch's
    * [[graft.sinks.PartitionedSink.deletePartitionRowsByKey]] evidence
    * (rows deleted, directories rewritten) is committed to the ledger
    * by the rename-aside protocol, and the query READS THE LEDGER
    * BACK. DuckDB replays what each disjoint batch must have deleted —
    * row count by id predicate, directory count as the batch's
    * distinct partition values — so the hash match pins the recorded
    * evidence against an independent reconstruction of the deletes,
    * not against the code that wrote it.
    *
    * Scale shape: the ledger is one tiny file per batch per target
    * (audit volume); the deletes are q317's touched-directory
    * rewrites. */
  def q328ComplianceLedger(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), col("source"))
    val tbl = java.nio.file.Files
      .createTempDirectory("graft_ledger_tbl_").toString
    val log = java.nio.file.Files
      .createTempDirectory("graft_ledger_log_").toString
    docs.repartition(col("source"))
      .write.mode("overwrite").partitionBy("source").parquet(tbl)
    for (b <- 0 until 3) {
      val ids = docs
        .filter(pmod(col("doc_id"), lit(30)) === lit(b * 10 + 3))
        .select("doc_id")
      val (r, d) = PartitionedSink.deletePartitionRowsByKey(s, tbl,
        "doc_id", ids)
      graft.sinks.ComplianceLog.append(s, log, "corpus", tbl,
        "q328", b.toLong, r, d): Unit
    }
    val res = graft.sinks.ComplianceLog.read(s, log)
      .select(col("batch_id"), col("rows_deleted"), col("dirs_rewritten"))
      .orderBy("batch_id")
      .localCheckpoint(true) // pin before the scratch dirs are deleted
    for (path <- Seq(tbl, log)) {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
    res
  }

  /** FOOTER-METADATA statistics, ORACLE-PROVEN — the maintenance
    * window's balance engine ([[graft.operators.Maintenance.run]] over
    * [[graft.operators.IndexCompact.footerLeafRows]], r13): per-leaf
    * row counts read from parquet footer TAILS (two seeks + one thrift
    * parse per file, through the census's retained listings — never a
    * data page, never a task-per-file count job), on a deliberately
    * SKEWED, two-append-fragmented partitioned copy so every leaf sums
    * multiple footers. DuckDB recounts the leaves from the raw rows
    * and recomputes max/(total/leaves) in the same division order, so
    * the hash match pins the direct footer parser AND the report's
    * balance ratio against an independent full count — the metadata
    * path and the data path must agree exactly.
    *
    * Scale shape: one walk (one listing per directory, 16-wide) plus
    * one parallelism-bounded footer job; the per-leaf frame is
    * leaf-count-bounded driver data, the same class as the census
    * itself. This is the statistics read a 100 TB table's balance
    * report runs on every maintenance window, so its exactness gets a
    * gate row, not just a spec assert. */
  def q329FooterBalance(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 10 < 5, lit(0L))
          .otherwise(col("doc_id") % 10).as("g"))
    val tbl = java.nio.file.Files
      .createTempDirectory("graft_footer_bal_").toString
    docs.repartition(col("g"))
      .write.mode("overwrite").partitionBy("g").parquet(tbl)
    docs.repartition(col("g"))
      .write.mode("append").partitionBy("g").parquet(tbl)
    val rep = graft.operators.Maintenance.run(s, tbl, maxFilesPerDir = 64)
    require(rep.family == "table" && rep.dataFilesBefore > rep.leafDirs,
      s"fixture must fragment leaves across appends: $rep")
    val root = new org.apache.hadoop.fs.Path(tbl)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val leaves = graft.operators.IndexCompact.leafCensus(fs, root)._2
    val perLeaf = graft.operators.IndexCompact.footerLeafRows(s,
      leaves.flatMap(l => l.dataFiles.map(f => (l.rel,
        new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(root, l.rel), f.name).toString,
        f.len))))
    // leaf-count-bounded driver frame (6 leaves), the census's own class
    val rows = perLeaf.toSeq
      .map { case (rel, n) =>
        (rel.stripPrefix("g=").toLong, n, rep.balanceMaxOverMean)
      }
      .sortBy(_._1)
    fs.delete(root, true): Unit
    import s.implicits._
    rows.toDF("part_g", "leaf_rows", "balance")
  }

  /** COMPLIANCE-LEDGER AUDIT, ORACLE-PROVEN — the READ path a
    * compliance officer actually runs (r13 stretch item 7): "what did
    * each takedown batch delete, on every target it should have hit —
    * and where are the gaps?" Three materializations of the corpus
    * (primary, mirror, archive — the deployment shape where one
    * request must land N places) each process an INCOMPLETE subset of
    * three takedown batches, every delete committing its evidence
    * through the swap-manifest protocol
    * ([[graft.sinks.PartitionedSink.deletePartitionRowsByKey]] with a
    * ledger key — r14's threaded evidence driven end-to-end under the
    * oracle, not just specs). The audit joins the full
    * (target × batch) grid against the ledger: covered cells carry
    * the recorded counts, gaps surface as `recorded = 0` rows — the
    * difference between "deleted nowhere" and "deleted everywhere but
    * the archive" is exactly what the unified ledger exists to make
    * visible. DuckDB reconstructs every covered cell's counts from
    * the id predicate and the batch's distinct partition values, so
    * the hash match pins the threaded evidence against an independent
    * replay of each delete.
    *
    * Scale shape: the deletes are q317's touched-directory rewrites;
    * the ledger read is audit-volume; the grid join is
    * (targets × batches)-bounded driver data. */
  def q330LedgerAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), col("source"))
    val log = java.nio.file.Files
      .createTempDirectory("graft_audit_log_").toString
    // coverage matrix with deliberate gaps: mirror missed batch 2,
    // archive missed batch 1
    val coverage = Seq(("archive", Seq(0, 2)), ("corpus", Seq(0, 1, 2)),
      ("mirror", Seq(0, 1)))
    // the three TARGETS are independent maintenance streams (separate
    // table roots, separate single-writer leases; ledger lines are
    // distinct (target, batch) files behind the inflight/rename
    // protocol), and each stream is a serial chain of small driver
    // actions — so run the streams from a thread pool (guide §2.6,
    // overlap independent jobs): the next stream's stages back-fill
    // the scheduler while the current one waits on its action
    // round-trips. Batches WITHIN a target stay ordered.
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(coverage.size)
    val tbls = try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = coverage.map { case (target, batches) =>
        scala.concurrent.Future {
          val tbl = java.nio.file.Files
            .createTempDirectory(s"graft_audit_${target}_").toString
          docs.repartition(col("source"))
            .write.mode("overwrite").partitionBy("source").parquet(tbl)
          for (b <- batches) {
            val ids = docs
              .filter(pmod(col("doc_id"), lit(30)) === lit(b * 10 + 3))
              .select("doc_id")
            PartitionedSink.deletePartitionRowsByKey(s, tbl, "doc_id",
              ids, Some(graft.sinks.ComplianceLog.Key(log, target,
                "q330", b.toLong))): Unit
          }
          tbl
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    val grid = coverage.map(_._1)
      .flatMap(target => (0L until 3L).map(b => (target, b)))
      .toDF("target", "batch_id")
    // the audit is LIBRARY surface (ComplianceLog.audit), not a
    // query-local join — a compliance review calls one API
    val res = graft.sinks.ComplianceLog.audit(s, log, grid)
      .orderBy("target", "batch_id")
      .localCheckpoint(true) // pin before the scratch dirs are deleted
    for (path <- tbls :+ log) {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
    res
  }

  /** STORED SimHash index lifecycle, ORACLE-PROVEN (r14) — the
    * Hamming-sketch dedup family completed from batch-only
    * ([[graft.operators.Dedup.simhashCandidates]], q30/q51) to the
    * same stored build → probe → append → probe loop the MinHash
    * family has: phase 1 probes batch A (doc_id ≡ 7 mod 20) against
    * the stored corpus index (bpart-pruned read, Hamming-verified
    * pairs), the batch is APPENDED under the sidecar's frozen banding,
    * and phase 2 probes batch B (≡ 13) against the GROWN index — its
    * pairs can now hit batch A's docs, which is the whole point of the
    * append. DuckDB replays both phases from the raw text (the full
    * simhash vote, the byte banding, the band equi-join, the exact
    * Hamming cut), so the hash match pins the stored probe against an
    * index-free reconstruction.
    *
    * Scale shape: the index is written once (parts-bounded dirs); each
    * probe reads only its touched bpart dirs; the append costs
    * ∝ |batch|. Same 100 TB posture as q294/q305's LSH loop. */
  def q331SimhashStored(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val batchA = docs.filter(pmod(col("doc_id"), lit(20)) === 7)
    val batchB = docs.filter(pmod(col("doc_id"), lit(20)) === 13)
    val corpus = docs.filter(!pmod(col("doc_id"), lit(20)).isin(7, 13))
    val idx = java.nio.file.Files
      .createTempDirectory("graft_simhash_idx_").toString
    Dedup.writeSimhashIndex(corpus, idx, "text", "doc_id")
    def probe(b: DataFrame, phase: Int) =
      Dedup.incrementalSimhashStored(s, idx, b, "text", "doc_id")
        .select(lit(phase).as("phase"), col("id_new"), col("id_old"),
          col("hamming"))
        .localCheckpoint(true) // pin before the index mutates/deletes
    val p1 = probe(batchA, 1)
    Dedup.appendToSimhashIndex(s, idx, batchA, "text")
    val p2 = probe(batchB, 2)
    val res = p1.unionByName(p2)
      .orderBy("phase", "id_new", "id_old")
      .localCheckpoint(true)
    val p = new org.apache.hadoop.fs.Path(idx)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** SimHash ADMISSION estimator, ORACLE-PROVEN (r14) — q321's gate
    * for the new stored family: per batch doc, the candidate volume
    * its [[graft.operators.Dedup.incrementalSimhashStored]] probe
    * would generate (sum of the stored index's (band, bandval) bucket
    * sizes over the doc's own cells, from the same bpart-pruned
    * two-column read the probe pays). DuckDB replays the whole
    * estimator index-free: the 32-bit sketch vote, the byte banding,
    * per-cell corpus counts, per-doc sums, the budget cut. Feeds
    * [[graft.streaming.Streaming.simhashMaintenanceStream]]'s gate. */
  def q332SimhashAdmission(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 20 === 7)
    val corpus = docs.filter(col("doc_id") % 20 =!= 7)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_shadm_idx_").toString
    Dedup.writeSimhashIndex(corpus, idx, "text", "doc_id")
    val res = Dedup.simhashAdmission(s, idx, batch, "text", "doc_id",
        budget = 30L)
      .orderBy("doc_id")
      .localCheckpoint(true) // pin before the scratch index is deleted
    val p = new org.apache.hadoop.fs.Path(idx)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** SimHash TAKEDOWN, ORACLE-PROVEN (r15) — the removal step that
    * completed the stored family's symmetry this round
    * ([[graft.operators.Dedup.deleteFromSimhashIndex]]: family-checked
    * sidecar, touched-bpart rewrites, evidence riding the swap
    * manifest): a takedown batch is deleted from the stored index and
    * its [[graft.sinks.ComplianceLog]] line read back, then a probe
    * batch runs against the post-delete index. DuckDB reconstructs
    * BOTH sides index-free — the probe pairs from the raw text over
    * the REMAINING corpus (full simhash vote, byte banding, band
    * equi-join, exact Hamming cut), and the evidence count as
    * bands × |doomed| — so one hash match pins delete-then-probe ≡
    * probe-of-remainder AND the recorded evidence against an
    * independent replay. The LSH family has this gate row via
    * q314/q317/q328; the SimHash family now has its own.
    *
    * Scale shape: the delete rewrites only bpart dirs holding doomed
    * rows (cost ∝ batch bucket spread); the probe is q331's
    * bpart-pruned read; the ledger read is audit volume. */
  def q334SimhashTakedown(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val batch = docs.filter(pmod(col("doc_id"), lit(20)) === 7)
    val corpus = docs.filter(pmod(col("doc_id"), lit(20)) =!= 7)
    val doomed = docs
      .filter(pmod(col("doc_id"), lit(20)).isin(3, 13))
      .select("doc_id")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_shtd_idx_").toString
    val ledger = java.nio.file.Files
      .createTempDirectory("graft_shtd_ledger_").toString
    Dedup.writeSimhashIndex(corpus, idx, "text", "doc_id")
    Dedup.deleteFromSimhashIndex(s, idx, doomed,
      Some(graft.sinks.ComplianceLog.Key(ledger, "simhash-index",
        "q334", 0L))): Unit
    // the gate pins the LEDGER's recorded line, not the return value —
    // the evidence a compliance officer would actually read
    val recorded = graft.sinks.ComplianceLog.read(s, ledger)
      .select("rows_deleted").collect()(0).getLong(0)
    val res = Dedup.incrementalSimhashStored(s, idx, batch, "text",
        "doc_id")
      .select(col("id_new"), col("id_old"), col("hamming"),
        lit(recorded).as("rows_deleted"))
      .orderBy("id_new", "id_old")
      .localCheckpoint(true) // pin before the scratch dirs are deleted
    for (path <- Seq(idx, ledger)) {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
    res
  }

  /** LEDGER FOLD INVARIANCE, ORACLE-PROVEN (r15) — evidence
    * compaction must be INVISIBLE to every reader: six takedown
    * batches commit their threaded-evidence lines, the four oldest
    * names are folded into one consolidated file
    * ([[graft.sinks.ComplianceLog.compactBefore]] — this round's
    * directory-read + name-id-filter fold, 3.4× faster at 10k files),
    * and the query reads the WHOLE ledger back. DuckDB replays all
    * six batches from the id predicate and the hash must match — so
    * the fold's read-side identity (which rows, which values, which
    * schema) is pinned externally, not just by specs; a fold that
    * dropped, duplicated or re-typed a line fails the gate.
    *
    * Scale shape: deletes are q317's touched-directory rewrites; the
    * fold is one parallel tiny-file read + one shuffle of
    * audit-volume rows; the read-back is audit volume. */
  def q335LedgerFold(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), col("source"))
    val tbl = java.nio.file.Files
      .createTempDirectory("graft_fold_tbl_").toString
    val log = java.nio.file.Files
      .createTempDirectory("graft_fold_log_").toString
    docs.repartition(col("source"))
      .write.mode("overwrite").partitionBy("source").parquet(tbl)
    for (b <- 0 until 6) {
      val ids = docs
        .filter(pmod(col("doc_id"), lit(60)) === lit(b * 10 + 5))
        .select("doc_id")
      PartitionedSink.deletePartitionRowsByKey(s, tbl, "doc_id", ids,
        Some(graft.sinks.ComplianceLog.Key(log, "corpus", "q335",
          b.toLong))): Unit
    }
    val (ff, _) = graft.sinks.ComplianceLog.compactBefore(s, log, 4L)
    require(ff == 4L, s"fold must fold the four oldest names, got $ff")
    val res = graft.sinks.ComplianceLog.read(s, log)
      .select(col("batch_id"), col("rows_deleted"),
        col("dirs_rewritten"))
      .orderBy("batch_id")
      .localCheckpoint(true) // pin before the scratch dirs are deleted
    for (path <- Seq(tbl, log)) {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
    res
  }

  /** MULTI-LINEAGE AUDIT CELL, ORACLE-PROVEN (r15) — the grid cell
    * shape [[graft.operators.Maintenance.runAll]] produces and the
    * r14 audit silently fanned out: two tables swept by ONE cron slot
    * (target `ttl-sweep`, one runId) into one shared ledger record
    * two lineage-keyed lines in the SAME (target, batch) cell, and
    * [[graft.sinks.ComplianceLog.audit]] must return EXACTLY one row
    * for it — `recorded` = the covering-line count (2), the counts
    * summed across lineages — plus a `recorded = 0` gap row for the
    * slot that never ran. The windows run with `parallelism = 2`, so
    * the opt-in concurrent cron is driven under the oracle, not just
    * specs. DuckDB reconstructs the cell from the TTL predicate
    * replayed over the raw table (2 × rows and 2 × distinct doomed
    * partition values — the tables are identical copies), so the
    * hash match pins the sweep evidence, the lineage keying AND the
    * per-cell aggregation against an independent replay.
    *
    * Scale shape: the sweeps are metadata-bounded whole-directory
    * drops; the audit is grid × ledger driver data (audit volume). */
  def q333AuditMultiLineage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), col("source"))
    val ledger = java.nio.file.Files
      .createTempDirectory("graft_ml_audit_log_").toString
    val tbls = Seq("a", "b").map { tag =>
      val tbl = java.nio.file.Files
        .createTempDirectory(s"graft_ml_audit_$tag").toString
      docs.repartition(col("source"))
        .write.mode("overwrite").partitionBy("source").parquet(tbl)
      tbl
    }
    val reps = graft.operators.Maintenance.runAll(s, tbls,
      maxFilesPerDir = 64,
      ttl = Some(col("source").substr(4, 10).cast("int") >= 15),
      evidence = Some((ledger, 5L)), parallelism = 2)
    require(reps.forall(_._2.ttlEvidenceRecorded),
      "both windows must record their own lineage-keyed line")
    val grid = Seq(("ttl-sweep", 5L), ("ttl-sweep", 6L))
      .toDF("target", "batch_id")
    val res = graft.sinks.ComplianceLog.audit(s, ledger, grid)
      .orderBy("batch_id")
      .localCheckpoint(true) // pin before the scratch dirs are deleted
    for (path <- tbls :+ ledger) {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
    res
  }

  /** PER-LINEAGE AUDIT DRILL-DOWN, ORACLE-PROVEN (r16, r15 verdict
    * stretch 7) — [[graft.sinks.ComplianceLog.auditByLineage]] answers
    * the question `audit`'s `recorded > 1` cells raise: WHICH lineages
    * covered the cell, each with its own (un-summed) counts, plus the
    * same one-flat-row gap semantics for cells no lineage covered.
    * Five takedown lineages (one per source) commit data-derived
    * evidence lines for two request batches; batch 2 never ran.
    * DuckDB reconstructs every line from the raw documents table (the
    * same grouped counts the appends carried) plus the sentinel gap
    * row, so the hash match pins the drill-down's join shape, the
    * gap row and the count pass-through against an independent
    * replay.
    *
    * Scale shape: the evidence writes are audit volume (one tiny file
    * per line, driver loop over a 10-row bounded aggregate); the
    * drill-down is grid × ledger — both audit volume, never data
    * volume. */
  def q336AuditLineage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
      .select(col("n_chars"), col("lang"), col("source"))
    val ledger = java.nio.file.Files
      .createTempDirectory("graft_lin_audit_log_").toString
    val srcs = Seq("src15", "src16", "src17", "src18", "src19")
    // the lines a real takedown family would have recorded: per
    // (lineage, batch) row/dir counts derived from the data so the
    // oracle can replay them — a bounded 10-row aggregate, collected
    // only to drive the appends (audit volume, not data volume)
    // batch keyed off n_chars parity, NOT doc_id: the fixture lays
    // sources out as doc_id ≡ srcN (mod 20), so any doc_id residue
    // that factors through 20 is constant per source and would
    // collapse the multi-lineage cells this query exists to drill
    val lines = docs
      .filter(col("source").isin(srcs: _*))
      .groupBy(col("source"),
        pmod(col("n_chars"), lit(2)).cast("long").as("batch_id"))
      .agg(count(lit(1)).as("rows"),
        countDistinct(col("lang")).as("dirs"))
      .collect()
    lines.foreach { r =>
      require(graft.sinks.ComplianceLog.append(s, ledger, "takedown",
        "/corpus", r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    }
    val grid = (0L until 3L).map(("takedown", _))
      .toDF("target", "batch_id")
    val res = graft.sinks.ComplianceLog.auditByLineage(s, ledger, grid)
      // '' is not a legal lineage name, so it is an unambiguous gap
      // sentinel that keeps the compare null-free
      .select(col("target"), col("batch_id"),
        coalesce(col("lineage"), lit("")).as("lineage"),
        col("recorded"), col("rows_deleted"), col("dirs_rewritten"))
      .orderBy("batch_id", "lineage")
      .localCheckpoint(true) // pin before the scratch ledger is deleted
    val p = new org.apache.hadoop.fs.Path(ledger)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  // =======================================================================
  // Registry
  // =======================================================================
  val all: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q01_incremental_watermark" -> (q01IncrementalWatermark _),
    "q02_sap_timestamp" -> (q02SapTimestamp _),
    "q03_pii_sha256" -> (q03PiiSha256 _),
    "q04_projection_filter" -> (q04ProjectionFilter _),
    "q05_partition_strings" -> (q05PartitionStrings _),
    "q06_watermark_advance" -> (q06WatermarkAdvance _),
    "q07_counts" -> (q07Counts _),
    "q08_stringify" -> (q08Stringify _),
    "q09_c1_prep" -> (q09C1Prep _),
    "q10_pricing_summary" -> (q10PricingSummary _),
    "q11_join_broadcast" -> (q11JoinBroadcast _),
    "q12_join_multiway" -> (q12JoinMultiway _),
    "q13_semi_join" -> (q13SemiJoin _),
    "q14_anti_join" -> (q14AntiJoin _),
    "q15_dedup_keep_latest" -> (q15DedupKeepLatest _),
    "q16_topk_per_group" -> (q16TopKPerGroup _),
    "q17_running_window" -> (q17RunningWindow _),
    "q18_order_limit" -> (q18OrderLimit _),
    "q19_set_except" -> (q19SetExcept _),
    "q20_set_intersect" -> (q20SetIntersect _),
    "q21_union_compact" -> (q21UnionCompact _),
    "q22_tumbling_window" -> (q22TumblingWindow _),
    "q23_sliding_window" -> (q23SlidingWindow _),
    "q24_session_window" -> (q24SessionWindow _),
    "q25_rollup" -> (q25Rollup _),
    "q26_cube" -> (q26Cube _),
    "q27_dedup_exact" -> (q27DedupExact _),
    "q28_minhash_signature" -> (q28MinhashSignature _),
    "q29_minhash_candidates" -> (q29MinhashCandidates _),
    "q30_simhash" -> (q30Simhash _),
    "q31_ngram_jaccard" -> (q31NgramJaccard _),
    "q32_text_stats" -> (q32TextStats _),
    "q33_text_quality" -> (q33TextQuality _),
    "q34_langid" -> (q34LangId _),
    "q35_fingerprint" -> (q35Fingerprint _),
    "q36_json_props" -> (q36JsonProps _),
    "q37_knn_brute_force" -> (q37KnnBruteForce _),
    "q38_knn_lsh" -> (q38KnnLsh _),
    "q39_multimodal_features" -> (q39MultimodalFeatures _),
    "q40_approx_distinct" -> (q40ApproxDistinct _),
    "q41_data_dictionary" -> (q41DataDictionary _),
    "q42_knn_ivf" -> (q42KnnIvf _),
    "q43_training_pipeline" -> (q43TrainingPipeline _),
    "q44_frame_sample" -> (q44FrameSample _),
    "q45_embedding_near_dup" -> (q45EmbeddingNearDup _),
    "q46_sql_api" -> (q46SqlApi _),
    "q47_bpe_tokens" -> (q47BpeTokens _),
    "q48_asof_join" -> (q48AsofJoin _),
    "q49_range_join" -> (q49RangeJoin _),
    "q50_percentiles" -> (q50Percentiles _),
    "q51_simhash_candidates" -> (q51SimhashCandidates _),
    "q52_dedup_components" -> (q52DedupComponents _),
    "q53_kmv_distinct" -> (q53KmvDistinct _),
    "q54_sql_tpch_q5" -> (q54SqlTpchQ5 _),
    "q55_correlated_subquery" -> (q55CorrelatedSubquery _),
    "q56_pivot" -> (q56Pivot _),
    "q57_unpivot" -> (q57Unpivot _),
    "q58_resize_payload" -> (q58ResizePayload _),
    "q59_lead_lag" -> (q59LeadLag _),
    "q60_salted_topk" -> (q60SaltedTopK _),
    "q61_not_in_subquery" -> (q61NotInSubquery _),
    "q62_top_tokens" -> (q62TopTokens _),
    "q63_hash_split" -> (q63HashSplit _),
    "q64_image_decode" -> (q64ImageDecode _),
    "q65_decontamination" -> (q65Decontamination _),
    "q66_repetition" -> (q66Repetition _),
    "q67_pii_redaction" -> (q67PiiRedaction _),
    "q68_token_budget_sample" -> (q68TokenBudgetSample _),
    "q69_tfidf_top_terms" -> (q69TfidfTopTerms _),
    "q70_stratified_sample" -> (q70StratifiedSample _),
    "q71_length_band" -> (q71LengthBand _),
    "q72_bm25" -> (q72Bm25 _),
    "q73_bloom_semi_join" -> (q73BloomSemiJoin _),
    "q74_grouping_sets" -> (q74GroupingSets _),
    "q75_outer_join" -> (q75OuterJoin _),
    "q76_heavy_hitters" -> (q76HeavyHitters _),
    "q77_zorder" -> (q77Zorder _),
    "q78_triangles" -> (q78Triangles _),
    "q79_funnel" -> (q79Funnel _),
    "q80_cohort_retention" -> (q80CohortRetention _),
    "q81_priority_sample" -> (q81PrioritySample _),
    "q82_pagerank" -> (q82PageRank _),
    "q83_approx_percentile" -> (q83ApproxPercentile _),
    "q84_clustering_coefficient" -> (q84ClusteringCoefficient _),
    "q85_count_min_freq" -> (q85CountMinFreq _),
    "q86_label_propagation" -> (q86LabelPropagation _),
    "q87_batch_sessionize" -> (q87BatchSessionize _),
    "q88_rolling_time_window" -> (q88RollingTimeWindow _),
    "q89_rank_family" -> (q89RankFamily _),
    "q90_bigram_lm" -> (q90BigramLm _),
    "q91_chunking" -> (q91Chunking _),
    "q92_sequence_pack" -> (q92SequencePack _),
    "q93_mixture_weights" -> (q93MixtureWeights _),
    "q94_span_dedup" -> (q94SpanDedup _),
    "q95_scd2_merge" -> (q95Scd2Merge _),
    "q96_epoch_shuffle" -> (q96EpochShuffle _),
    "q97_attrition" -> (q97Attrition _),
    "q98_snapshot_diff" -> (q98SnapshotDiff _),
    "q99_source_overlap" -> (q99SourceOverlap _),
    "q100_incremental_agg" -> (q100IncrementalAgg _),
    "q101_constraint_audit" -> (q101ConstraintAudit _),
    "q102_last_touch" -> (q102LastTouch _),
    "q103_association_rules" -> (q103AssociationRules _),
    "q104_gap_fill" -> (q104GapFill _),
    "q105_session_paths" -> (q105SessionPaths _),
    "q106_rolling_distinct" -> (q106RollingDistinct _),
    "q107_anomaly_days" -> (q107AnomalyDays _),
    "q108_table_stats" -> (q108TableStats _),
    "q109_kmeans" -> (q109Kmeans _),
    "q110_pps_sample" -> (q110PpsSample _),
    "q111_kmv_set_ops" -> (q111KmvSetOps _),
    "q112_gaps_islands" -> (q112GapsIslands _),
    "q113_pivot" -> (q113Pivot _),
    "q114_unpivot" -> (q114Unpivot _),
    "q115_skyline" -> (q115Skyline _),
    "q116_mode_per_group" -> (q116ModePerGroup _),
    "q117_histogram" -> (q117Histogram _),
    "q118_corr_moments" -> (q118CorrMoments _),
    "q119_decile_stats" -> (q119DecileStats _),
    "q120_fuzzy_match" -> (q120FuzzyMatch _),
    "q121_ewma" -> (q121Ewma _),
    "q122_novelty" -> (q122Novelty _),
    "q123_filter_funnel" -> (q123FilterFunnel _),
    "q124_cluster_rep" -> (q124ClusterRep _),
    "q125_next_event_pairs" -> (q125NextEventPairs _),
    "q126_grouped_split" -> (q126GroupedSplit _),
    "q127_multi_grain_distinct" -> (q127MultiGrainDistinct _),
    "q128_interval_merge" -> (q128IntervalMerge _),
    "q129_revenue_share" -> (q129RevenueShare _),
    "q130_chi_square" -> (q130ChiSquare _),
    "q131_assortativity" -> (q131Assortativity _),
    "q132_class_cap_sample" -> (q132ClassCapSample _),
    "q133_skew_report" -> (q133SkewReport _),
    "q134_wilson_ci" -> (q134WilsonCi _),
    "q135_json_extract" -> (q135JsonExtract _),
    "q136_k_anonymity" -> (q136KAnonymity _),
    "q137_containment" -> (q137Containment _),
    "q138_weighted_median" -> (q138WeightedMedian _),
    "q139_trend_slope" -> (q139TrendSlope _),
    "q140_temporal_join" -> (q140TemporalJoin _),
    "q141_cohens_kappa" -> (q141CohensKappa _),
    "q142_rfm_segments" -> (q142RfmSegments _),
    "q143_time_to_convert" -> (q143TimeToConvert _),
    "q144_survivorship" -> (q144Survivorship _),
    "q145_datasheet" -> (q145Datasheet _),
    "q146_curriculum" -> (q146Curriculum _),
    "q147_shard_balance" -> (q147ShardBalance _),
    "q148_epoch_decorrelation" -> (q148EpochDecorrelation _),
    "q149_mad" -> (q149Mad _),
    "q150_winsorized_mean" -> (q150WinsorizedMean _),
    "q151_benford" -> (q151Benford _),
    "q152_schema_evolution" -> (q152SchemaEvolution _),
    "q153_regex_parse" -> (q153RegexParse _),
    "q154_cuped" -> (q154Cuped _),
    "q155_tpch_q3" -> (q155TpchQ3 _),
    "q156_tpch_q10" -> (q156TpchQ10 _),
    "q157_bag_set_ops" -> (q157BagSetOps _),
    "q158_wow_report" -> (q158WowReport _),
    "q159_not_in_null" -> (q159NotInNull _),
    "q160_correlated_subquery" -> (q160CorrelatedSubquery _),
    "q161_lateral_topk" -> (q161LateralTopk _),
    "q162_id_gaps" -> (q162IdGaps _),
    "q163_decile_migration" -> (q163DecileMigration _),
    "q164_ref_completeness" -> (q164RefCompleteness _),
    "q165_kcore_bounded" -> (q165KCoreBounded _),
    "q166_tpch_q18" -> (q166TpchQ18 _),
    "q167_tpch_q21" -> (q167TpchQ21 _),
    "q168_tpch_q4" -> (q168TpchQ4 _),
    "q169_tpch_q13" -> (q169TpchQ13 _),
    "q170_tpch_q22" -> (q170TpchQ22 _),
    "q171_image_ahash" -> (q171ImageAHash _),
    "q172_incremental_join" -> (q172IncrementalJoin _),
    "q173_l_diversity" -> (q173LDiversity _),
    "q174_tpch_q7" -> (q174TpchQ7 _),
    "q175_tpch_q14" -> (q175TpchQ14 _),
    "q176_tpch_q19" -> (q176TpchQ19 _),
    "q177_tpch_q8" -> (q177TpchQ8 _),
    "q178_tpch_q6" -> (q178TpchQ6 _),
    "q179_bfs_hops" -> (q179BfsHops _),
    "q180_semantic_dedup" -> (q180SemanticDedup _),
    "q181_link_predict" -> (q181LinkPredict _),
    "q182_similarity_join" -> (q182SimilarityJoin _),
    "q183_cheapest_path" -> (q183CheapestPath _),
    "q184_product_quantize" -> (q184ProductQuantize _),
    "q185_dedup_funnel" -> (q185DedupFunnel _),
    "q186_temporal_reach" -> (q186TemporalReach _),
    "q187_tpch_q15" -> (q187TpchQ15 _),
    "q188_interpolate" -> (q188Interpolate _),
    "q189_typo_match" -> (q189TypoMatch _),
    "q190_quantile_norm" -> (q190QuantileNorm _),
    "q191_tpch_q2" -> (q191TpchQ2 _),
    "q192_tpch_q9" -> (q192TpchQ9 _),
    "q193_tpch_q11" -> (q193TpchQ11 _),
    "q194_tpch_q12" -> (q194TpchQ12 _),
    "q195_tpch_q16" -> (q195TpchQ16 _),
    "q196_tpch_q17" -> (q196TpchQ17 _),
    "q197_tpch_q20" -> (q197TpchQ20 _),
    "q198_split_leakage" -> (q198SplitLeakage _),
    "q199_hard_negatives" -> (q199HardNegatives _),
    "q200_label_noise" -> (q200LabelNoise _),
    "q201_mixture_resample" -> (q201MixtureResample _),
    "q202_domain_quality_gate" -> (q202DomainQualityGate _),
    "q203_growth_accounting" -> (q203GrowthAccounting _),
    "q204_bpe_merges" -> (q204BpeMerges _),
    "q205_cusum_changepoint" -> (q205CusumChangepoint _),
    "q206_isotonic_calibration" -> (q206IsotonicCalibration _),
    "q207_bpe_encode" -> (q207BpeEncode _),
    "q208_collocation_lift" -> (q208CollocationLift _),
    "q209_gini_revenue" -> (q209GiniRevenue _),
    "q210_calibration_ece" -> (q210CalibrationEce _),
    "q211_purchase_mrr" -> (q211PurchaseMrr _),
    "q212_roc_auc" -> (q212RocAuc _),
    "q213_spearman" -> (q213Spearman _),
    "q214_ols_normal_eq" -> (q214OlsNormalEq _),
    "q215_gini_stump" -> (q215GiniStump _),
    "q216_naive_bayes" -> (q216NaiveBayes _),
    "q217_t_closeness" -> (q217TCloseness _),
    "q218_vocab_growth" -> (q218VocabGrowth _),
    "q219_embedding_drift" -> (q219EmbeddingDrift _),
    "q220_winnowing" -> (q220Winnowing _),
    "q221_markov_attribution" -> (q221MarkovAttribution _),
    "q222_source_token_cosine" -> (q222SourceTokenCosine _),
    "q223_rrf_fusion" -> (q223RrfFusion _),
    "q224_cumulative_hazard" -> (q224CumulativeHazard _),
    "q225_kendall_tau" -> (q225KendallTau _),
    "q226_pr_curve" -> (q226PrCurve _),
    "q227_cohens_d" -> (q227CohensD _),
    "q228_average_precision" -> (q228AveragePrecision _),
    "q229_resample_stability" -> (q229ResampleStability _),
    "q230_capped_inventory" -> (q230CappedInventory _),
    "q231_longest_streak" -> (q231LongestStreak _),
    "q232_decayed_value" -> (q232DecayedValue _),
    "q233_overdispersion" -> (q233Overdispersion _),
    "q234_lorenz_curve" -> (q234LorenzCurve _),
    "q235_ks_test" -> (q235KsTest _),
    "q236_mann_whitney" -> (q236MannWhitney _),
    "q237_hits" -> (q237Hits _),
    "q238_acf" -> (q238Acf _),
    "q239_herfindahl" -> (q239Herfindahl _),
    "q240_kruskal_wallis" -> (q240KruskalWallis _),
    "q241_cramer_von_mises" -> (q241CramerVonMises _),
    "q242_welch_t" -> (q242WelchT _),
    "q243_ljung_box" -> (q243LjungBox _),
    "q244_cross_corr" -> (q244CrossCorr _),
    "q245_cramers_v" -> (q245CramersV _),
    "q246_mase" -> (q246Mase _),
    "q247_pacf" -> (q247Pacf _),
    "q248_loo_encoding" -> (q248LooEncoding _),
    "q249_feature_hash" -> (q249FeatureHash _),
    "q250_two_proportion_z" -> (q250TwoProportionZ _),
    "q251_max_drawdown" -> (q251MaxDrawdown _),
    "q252_two_sample_summary" -> (q252TwoSampleSummary _),
    "q253_pettitt" -> (q253Pettitt _),
    "q254_dow_seasonality" -> (q254DowSeasonality _),
    "q255_image_dhash" -> (q255ImageDHash _),
    "q256_qq_deciles" -> (q256QqDeciles _),
    "q257_vocab_jaccard" -> (q257VocabJaccard _),
    "q258_effective_sample_size" -> (q258EffectiveSampleSize _),
    "q259_kaplan_meier" -> (q259KaplanMeier _),
    "q260_log_rank" -> (q260LogRank _),
    "q261_mann_kendall" -> (q261MannKendall _),
    "q262_theil_sen" -> (q262TheilSen _),
    "q263_hodges_lehmann" -> (q263HodgesLehmann _),
    "q264_neighborhood_jaccard" -> (q264NeighborhoodJaccard _),
    "q265_conversion_funnel" -> (q265ConversionFunnel _),
    "q266_ts_decomposition" -> (q266TsDecomposition _),
    "q267_brier_score" -> (q267BrierScore _),
    "q268_chao1_richness" -> (q268Chao1Richness _),
    "q269_tv_distance" -> (q269TvDistance _),
    "q270_image_phash" -> (q270ImagePHash _),
    "q271_holt_smoothing" -> (q271HoltSmoothing _),
    "q272_grid_density" -> (q272GridDensity _),
    "q273_sequence_patterns" -> (q273SequencePatterns _),
    "q274_gk_lambda" -> (q274GkLambda _),
    "q275_cm_join_size" -> (q275CmJoinSize _),
    "q276_somers_d" -> (q276SomersD _),
    "q277_diff_in_diff" -> (q277DiffInDiff _),
    "q278_seasonal_mk" -> (q278SeasonalMk _),
    "q279_hellinger" -> (q279Hellinger _),
    "q280_mcnemar" -> (q280McNemar _),
    "q281_partial_corr" -> (q281PartialCorr _),
    "q282_rmst" -> (q282Rmst _),
    "q283_mantel_haenszel" -> (q283MantelHaenszel _),
    "q284_cochran_armitage" -> (q284CochranArmitage _),
    "q285_wasserstein" -> (q285Wasserstein _),
    "q286_blocklist_report" -> (q286BlocklistReport _),
    "q287_permutation_test" -> (q287PermutationTest _),
    "q288_harmonic_centrality" -> (q288HarmonicCentrality _),
    "q289_page_trend" -> (q289PageTrend _),
    "q290_jonckheere" -> (q290Jonckheere _),
    "q291_concordance" -> (q291Concordance _),
    "q292_durbin_watson" -> (q292DurbinWatson _),
    "q293_pq_adc_search" -> (q293PqAdcSearch _),
    "q294_incremental_dedup" -> (q294IncrementalDedup _),
    "q295_ivf_pq_search" -> (q295IvfPqSearch _),
    "q296_minhash_calibration" -> (q296MinhashCalibration _),
    "q297_packing_efficiency" -> (q297PackingEfficiency _),
    "q298_ndcg_quality" -> (q298NdcgQuality _),
    "q299_krippendorff_alpha" -> (q299KrippendorffAlpha _),
    "q300_lsh_tuning_curve" -> (q300LshTuningCurve _),
    "q301_fuzzy_decontamination" -> (q301FuzzyDecontamination _),
    "q302_token_burstiness" -> (q302TokenBurstiness _),
    "q303_cross_source_dups" -> (q303CrossSourceDups _),
    "q304_ivf_pq_stored" -> (q304IvfPqStored _),
    "q305_incremental_survivors" -> (q305IncrementalSurvivors _),
    "q306_incremental_pipeline" -> (q306IncrementalPipeline _),
    "q307_model_drift" -> (q307ModelDrift _),
    "q308_index_balance" -> (q308IndexBalance _),
    "q309_boilerplate_ngrams" -> (q309BoilerplateNgrams _),
    "q310_perplexity_gate" -> (q310PerplexityGate _),
    "q311_tokenizer_fertility" -> (q311TokenizerFertility _),
    "q312_filter_ablation" -> (q312FilterAblation _),
    "q313_quality_survivors" -> (q313QualitySurvivors _),
    "q314_takedown_expansion" -> (q314TakedownExpansion _),
    "q315_delete_repair" -> (q315DeleteRepair _),
    "q316_cluster_cap_sample" -> (q316ClusterCapSample _),
    "q317_partitioned_takedown" -> (q317PartitionedTakedown _),
    "q318_ivf_append_scan" -> (q318IvfAppendScan _),
    "q319_partition_ttl" -> (q319PartitionTtl _),
    "q320_incremental_kmv" -> (q320IncrementalKmv _),
    "q321_probe_admission" -> (q321ProbeAdmission _),
    "q322_record_linkage" -> (q322RecordLinkage _),
    "q323_nested_ttl" -> (q323NestedTtl _),
    "q324_scan_admission" -> (q324ScanAdmission _),
    "q325_nested_takedown" -> (q325NestedTakedown _),
    "q326_date_takedown" -> (q326DateTakedown _),
    "q327_null_partition_ttl" -> (q327NullPartitionTtl _),
    "q328_compliance_ledger" -> (q328ComplianceLedger _),
    "q329_footer_balance" -> (q329FooterBalance _),
    "q330_ledger_audit" -> (q330LedgerAudit _),
    "q331_simhash_stored" -> (q331SimhashStored _),
    "q332_simhash_admission" -> (q332SimhashAdmission _),
    "q333_audit_multilineage" -> (q333AuditMultiLineage _),
    "q334_simhash_takedown" -> (q334SimhashTakedown _),
    "q335_ledger_fold" -> (q335LedgerFold _),
    "q336_audit_lineage" -> (q336AuditLineage _),
  )
}
