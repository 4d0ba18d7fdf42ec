package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-comparison statistics — the two-sample tests a data
  * pipeline runs to answer "did this source/segment/experiment shift
  * the distribution?", built scale-true on [[Ranking.globalCumSum]]
  * (the two-phase range-bucketed prefix sum) instead of the
  * single-task `ORDER BY` window every textbook SQL formulation uses.
  *
  * Arithmetic discipline (the q212/q213 contract): aggregate to one
  * row per distinct value first, so every statistic is a function of
  * exact integer counts; cross-multiply instead of dividing (the KS
  * gap |F̂_A−F̂_B| becomes |cumA·nB − cumB·nA| over a common
  * denominator); carry products in DECIMAL(38,0); divide (and sqrt)
  * ONCE at the end. Division and sqrt are correctly rounded under
  * IEEE-754 — unlike ln/exp they are bit-reproducible across engines —
  * so a terminal double expression with a FIXED operation order hashes
  * identically in Spark and the DuckDB oracle.
  */
object Stats {

  private val dec = DecimalType(38, 0)

  /** Per-distinct-value class counts + exact cumulative counts: input
    * rows (value `v`: long, indicator `y` ∈ {0,1} marking class A),
    * output (cum, byV): one row per distinct v with (ca, cb, cum_ca,
    * cum_cb) — inclusive cumulative counts in ascending v order — plus
    * the pre-window per-value frame. The only data-sized shuffle is
    * the groupBy(v); the prefix sums are the range-bucketed two-phase
    * pass. Callers needing totals MUST aggregate byV, never cum: a
    * scalar branch over cum re-executes the whole window subplan
    * (Spark reuses exchanges, not window operators), while a branch
    * over byV shares the groupBy(v) exchange — observed 2-3× on the
    * KS wall at 25× replication before this split. */
  private def classCdf(df: DataFrame, v: Column,
      y: Column): (DataFrame, DataFrame) = {
    val byV = df.select(v.as("v"), y.cast("long").as("y"))
      .groupBy(col("v"))
      .agg(sum(col("y")).as("ca"),
        (count(lit(1)) - sum(col("y"))).as("cb"))
    (Ranking.globalCumSum(byV, "v", Seq("ca", "cb")), byV)
  }

  /** Two-sample Kolmogorov–Smirnov statistic D = sup_v |F̂_A(v) −
    * F̂_B(v)|, evaluated exactly at every distinct pooled value (the
    * sup over step functions is attained there). The gap is the exact
    * integer |cumA·nB − cumB·nA| (common denominator nA·nB), the
    * argmax value is tie-broken to the SMALLEST v via one
    * max(struct(gap, −v)) aggregate — a total order over exact
    * integers, so the cut is deterministic in any engine — and D is
    * ONE terminal double division.
    *
    * Returns a single row (n_a, n_b, v_at_max, ks_d). */
  def ksTwoSample(df: DataFrame, v: Column, y: Column): DataFrame = {
    val (cum, byV) = classCdf(df, v, y)
    val tot = byV.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    cum.crossJoin(broadcast(tot))
      .select(col("v"), col("n_a"), col("n_b"),
        abs(col("cum_ca").cast(dec) * col("n_b").cast(dec) -
          col("cum_cb").cast(dec) * col("n_a").cast(dec)).as("gap"))
      .agg(max(struct(col("gap"), (-col("v")).as("nv"))).as("m"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      .select(col("n_a"), col("n_b"),
        (-col("m.nv")).as("v_at_max"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("m.gap").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("ks_d"))
  }

  /** All three two-sample tests — KS, tie-corrected Mann–Whitney, and
    * Cramér–von Mises — from ONE pass over ONE shared per-value CDF:
    * the same groupBy(v) + range-bucketed prefix sum that each test
    * needs individually feeds a single aggregate computing the sup
    * gap (with argmax), 2U + the tie term, and the integrated squared
    * gap together. At 100 TB this is the shape a monitoring job runs:
    * three distribution readouts for the price of one scan+shuffle.
    * Returns one row (n_a, n_b, v_at_max, ks_d, cles, z, cvm) with
    * every terminal double the same order-mirrored expression as the
    * standalone operators. */
  def twoSampleSummary(df: DataFrame, v: Column, y: Column): DataFrame = {
    val (cum, byV) = classCdf(df, v, y)
    val tot = byV.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val agg = cum.crossJoin(broadcast(tot))
      .select(col("v"), col("ca"), col("cb"), col("n_a"), col("n_b"),
        (col("cum_cb") - col("cb")).as("cbb"),
        (col("ca") + col("cb")).as("t"),
        (col("cum_ca").cast(dec) * col("n_b").cast(dec) -
          col("cum_cb").cast(dec) * col("n_a").cast(dec)).as("gap"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(struct(abs(col("gap")).as("gap"), (-col("v")).as("nv")))
          .as("m"),
        sum(col("ca").cast(dec) *
          (lit(2L) * col("cbb") + col("cb")).cast(dec)).as("u2"),
        sum(col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec) -
          col("t").cast(dec)).as("tie3"),
        sum(col("t").cast(dec) * col("gap") * col("gap")).as("cvm_s"))
    val nad = col("n_a").cast("double")
    val nbd = col("n_b").cast("double")
    val nd = nad + nbd
    val ok = col("n_a") > 0 && col("n_b") > 0
    agg.select(col("n_a"), col("n_b"),
      (-col("m.nv")).as("v_at_max"),
      when(ok, col("m.gap").cast("double") / (nad * nbd)).as("ks_d"),
      when(ok, col("u2").cast("double") / (lit(2.0) * nad * nbd))
        .as("cles"),
      when(ok,
        (col("u2").cast("double") / lit(2.0) - nad * nbd / lit(2.0)) /
          sqrt(nad * nbd / lit(12.0) *
            ((nd + lit(1.0)) -
              col("tie3").cast("double") / (nd * (nd - lit(1.0))))))
        .as("z"),
      when(ok, col("cvm_s").cast("double") / (nad * nbd * nd * nd))
        .as("cvm"))
  }

  /** Tie-corrected Mann–Whitney U: 2U_A = Σ_v ca(v)·(2·cbBelow(v) +
    * cb(v)) — exact in DECIMAL(38,0), the q212 AUC numerator with the
    * roles named — plus the tie term Σ_v (t³ − t) over pooled counts
    * t(v) for the variance. Emits the common-language effect size
    * A = U/(nA·nB) (≡ ROC AUC of "v predicts class A") and the
    * normal-approximation z, both as terminal double expressions with
    * a fixed operation order:
    * z = (U − nA·nB/2) / sqrt(nA·nB/12 · ((N+1) − Σ(t³−t)/(N(N−1)))).
    *
    * Returns a single row (n_a, n_b, cles, z). */
  def mannWhitneyU(df: DataFrame, v: Column, y: Column): DataFrame = {
    val (cum, _) = classCdf(df, v, y)
    // n_a/n_b as max(cum_*) — the totals ARE the last cumulative
    // values, and consuming BOTH cum columns keeps column pruning
    // identical across globalCumSum's two branches so their exchanges
    // stay reusable (pruning cum_ca out reordered the offsets
    // branch's partial aggregate and cost a full duplicate input
    // shuffle — observed +50% shuffle rows vs ksTwoSample)
    val agg = cum
      .select(col("ca"), col("cb"),
        (col("cum_cb") - col("cb")).as("cbb"),
        (col("ca") + col("cb")).as("t"),
        col("cum_ca"), col("cum_cb"))
      .agg(max(col("cum_ca")).as("n_a"), max(col("cum_cb")).as("n_b"),
        sum(col("ca").cast(dec) *
          (lit(2L) * col("cbb") + col("cb")).cast(dec)).as("u2"),
        sum(col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec) -
          col("t").cast(dec)).as("tie3"))
    val nad = col("n_a").cast("double")
    val nbd = col("n_b").cast("double")
    val nd = nad + nbd
    agg.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0,
        col("u2").cast("double") / (lit(2.0) * nad * nbd)).as("cles"),
      when(col("n_a") > 0 && col("n_b") > 0,
        (col("u2").cast("double") / lit(2.0) - nad * nbd / lit(2.0)) /
          sqrt(nad * nbd / lit(12.0) *
            ((nd + lit(1.0)) -
              col("tie3").cast("double") / (nd * (nd - lit(1.0))))))
        .as("z"))
  }

  /** DISCRETE median — the lower-middle order statistic, i.e. the
    * element at 1-based rank ⌈n/2⌉ of the sorted multiset: collapsed
    * per-value counts, a cumulative count over the collapsed frame,
    * then min(v where cum ≥ (n+1) div 2). Picks an ACTUAL element, so
    * no interpolation arithmetic can diverge across engines — the
    * q262/q263 construction extracted. Works for any orderable value
    * type (long slopes-as-doubles included). The cumulative window is
    * single-partition over the COLLAPSED frame: use only where the
    * distinct-value count is model- or domain-bounded (pairwise-slope
    * and daily-difference frames are day²-bounded). Output: one row
    * (n, median) — n counts INPUT rows, median is null on empty
    * input. */
  def discreteMedian(df: DataFrame, valueCol: String): DataFrame = {
    val byV = df.groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(valueCol))
      .rowsBetween(Long.MinValue, 0)
    val cum = byV.select(col(valueCol), col("cnt"),
      sum(col("cnt")).over(w).as("cum"))
    val n = byV.agg(coalesce(sum(col("cnt")), lit(0L)).as("n"))
    cum.crossJoin(broadcast(n))
      .filter(col("cum") >= expr("(n + 1L) div 2"))
      .agg(max(col("n")).as("nx"), min(col(valueCol)).as("median"))
      .crossJoin(broadcast(n))
      .select(col("n"), col("median"))
  }
}
