package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level utilities. */
object Expr {

  /** Let-binding for Catalyst expressions: evaluate `c` ONCE per row and
    * reference the result as a lambda variable inside `f`.
    *
    * Why this exists: Spark's higher-order functions (transform /
    * aggregate / filter / zip_with) re-evaluate every non-lambda-variable
    * subtree of the lambda body on EVERY element visit, and they do not
    * participate in whole-stage codegen, so no CSE rescues you. A
    * pipeline like "N permutations over an md5-hashed shingle array"
    * silently becomes O(N × shingles × tokens) re-tokenization — tens of
    * seconds on 500 rows. `let(c)(x => body)` = `transform(array(c),
    * x => body)[1]` pins `c` to one evaluation; lambda-variable reads
    * are free. */
  def let(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), x => f(x)), 1)
}
