package graft

import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}

/** Registry-wide lints — the contract between `SparkEntry.queries` and
  * the driver's DuckDB comparator.
  *
  * The comparator sorts result ROWS on every column (pandas
  * sort_values) before hashing; array/struct/binary cells make that
  * sort throw (`unhashable type: numpy.ndarray`), which in round 2
  * silently turned five CORRECT queries into err rows. The lint makes
  * that class of failure a compile-adjacent local red.
  */
class RegistrySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every registry query has a flat (sortable) output schema") {
    val offending = Queries.all.toSeq.flatMap { case (name, fn) =>
      val bad = fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[StructType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType == BinaryType => s"$name.${f.name}: ${f.dataType.sql}"
      }
      bad
    }
    assert(offending.isEmpty,
      s"array/struct/map/binary final columns crash the driver comparator: ${offending.mkString(", ")}")
  }

  test("every registry query has an oracle entry (no grey rows)") {
    val missing = Queries.all.keySet -- Oracle.sql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val stale = Oracle.sql.keySet -- Queries.all.keySet
    assert(stale.isEmpty, s"oracle SQL without a query: $stale")
  }
}
