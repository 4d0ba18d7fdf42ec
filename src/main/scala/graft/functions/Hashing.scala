package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing primitives.
  *
  * The dedup/fingerprint operators need a string → int64 hash that is
  * reproducible OUTSIDE Spark (so differential oracles — and any
  * downstream system reading our signatures — can recompute it). Spark's
  * `hash`/`xxhash64` seeds are Spark-internal, so we standardize on
  * md5 → first 15 hex chars → int64 (60 bits, always non-negative).
  * md5 is identical everywhere; the whole pipeline stays inside
  * WholeStageCodegen (md5/conv/substring are all codegen'd built-ins).
  */
object Hashing {

  /** Portable non-negative 60-bit hash of a string column — the native
    * Md5Long60 expression (one digest, no hex-string round trip). */
  def md5Long(c: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      Md5Long60(org.apache.spark.sql.GraftSql.expression(c)))

  /** Built-in-only equivalent of md5Long (3-expression chain). Kept as
    * the cross-engine specification: HashingSpec asserts md5Long ===
    * md5LongBuiltin, and the DuckDB oracle recomputes this formula. */
  def md5LongBuiltin(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Reduce to a smaller modulus so affine re-hashing (a*h+b) stays
    * within int64 in ANY engine (no silent-overflow dependence). */
  val SmallPrime: Long = 1000000007L

  def md5Mod(c: Column): Column = md5Long(c) % SmallPrime

  /** MinHash permutation family: h_i(x) = (a_i * x + b_i) mod p with
    * fixed deterministic coefficients; a_i < 2^31 and x < p < 2^31 keep
    * products < 2^62. */
  def affine(h: Column, a: Long, b: Long): Column =
    (h * lit(a) + lit(b)) % lit(SmallPrime)

  /** Same family with the permutation index as a COLUMN (a lambda
    * variable): a_i/b_i are computed by the same formulas as
    * coefA/coefB but in plan arithmetic. This lets N permutations share
    * ONE copy of the hashed-shingle subtree (`transform(sequence(0,
    * N-1), i => ...)`), keeping plan size O(1) in N — the naive
    * per-permutation expression duplicated the whole tokenize→shingle→
    * md5 tree N times, which cost tens of seconds of optimizer/codegen
    * time per query. */
  def affineAt(h: Column, i: Column): Column = {
    val iL = i.cast("long")
    val a = iL * lit(2L) + lit(1L) + (iL + lit(1L)) * lit(104729L)
    val b = (iL + lit(1L)) * lit(7919L)
    (h * a + b) % lit(SmallPrime)
  }

  /** Deterministic coefficient for permutation i (derived, not random —
    * reproducibility across engines beats entropy here). */
  def coefA(i: Int): Long = 2L * i + 1 + 104729L * (i + 1) // odd, < 2^31
  def coefB(i: Int): Long = 7919L * (i + 1)
}
