package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `let`-binding for column expressions: evaluate `c` ONCE and reference
  * it many times in `body` as a lambda variable.
  *
  * Why: Catalyst's CollapseProject inlines staged projections, and
  * higher-order-function expressions are not whole-stage-codegen'd, so an
  * expensive subexpression (split / shingle array / md5 array) referenced
  * N times is otherwise evaluated N times per row. Binding it as the
  * element of a 1-element array transform makes it a lambda variable —
  * evaluated exactly once per row regardless of how often the body refers
  * to it. (Measured: the MinHash signature query dropped from 40s+ to
  * ~2s at sf0.01 with this.)
  */
object ExprLet {
  def let(c: Column)(body: Column => Column): Column =
    element_at(transform(array(c), x => body(x)), 1)
}
