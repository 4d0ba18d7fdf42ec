package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.LongType

/** SQL surface for the engine's native expressions: `graft_md5long`,
  * `graft_zorder`, `graft_cosine` become callable from `spark.sql`, so
  * the SQL-API entry points (q46/q54 style) reach the same codegen'd
  * primitives the DataFrame API uses — a library isn't complete for
  * SQL-first users if its custom functions exist only as Scala calls.
  *
  * Two registration paths, same list: `register(spark)` installs into
  * a LIVE session's FunctionRegistry (tests, notebooks);
  * `graft.plans.GraftSparkExtensions` injects the identical builders
  * at session construction for deploy time
  * (`spark.sql.extensions=graft.plans.GraftSparkExtensions`). */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  private def info(name: String, cls: Class[_]): ExpressionInfo =
    new ExpressionInfo(cls.getName, name)

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_md5long"),
      info("graft_md5long", classOf[Md5Long60]),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_md5long(str)")
        Md5Long60(args.head)
      }),
    (FunctionIdentifier("graft_zorder"),
      info("graft_zorder", classOf[ZOrderValue]),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_zorder(x, y)")
        // the expression wants longs; accept any integral SQL literal
        ZOrderValue(Cast(args(0), LongType), Cast(args(1), LongType))
      }),
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", classOf[CosineSim]),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine(vec, vec)")
        CosineSim(args(0), args(1))
      }),
    (FunctionIdentifier("graft_damerau"),
      info("graft_damerau", classOf[DamerauLevenshtein]),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_damerau(str, str)")
        DamerauLevenshtein(args(0), args(1))
      }),
    (FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler", classOf[JaroWinkler]),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jaro_winkler(str, str)")
        JaroWinkler(args(0), args(1))
      }))

  /** Install into an already-running session (idempotent: re-register
    * overwrites with identical builders). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, inf, builder)
    }
}
