package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProduct, ExplodeShingles, JsonIsObject, JsonIsValid, MinHashSigs, SqDist}

/** Session-extension packaging of graft's native functions, so a user
  * can enable the whole surface with
  * `spark.sql.extensions=graft.GraftExtensions` (cluster-wide, no code)
  * or [[GraftExtensions.install]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  /** (name, doc, builder) for every native graft function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("json_is_valid",
      info("json_is_valid", "json_is_valid(str) - true iff str is exactly one parseable JSON value"),
      es => JsonIsValid(es.head)),
    ("json_is_object",
      info("json_is_object", "json_is_object(str) - true iff str is a JSON object"),
      es => JsonIsObject(es.head)),
    ("minhash_sigs",
      info("minhash_sigs", "minhash_sigs(text[, perms]) - integer MinHash signatures of 3-word shingles"),
      es => MinHashSigs(es.head, es.lift(1) match {
        case Some(Literal(v: Int, _)) => v
        case Some(other) => other.eval().asInstanceOf[Number].intValue()
        case None => 4
      })),
    ("explode_shingles",
      info("explode_shingles", "explode_shingles(text[, n]) - one row per n-word shingle (default 3)"),
      es => ExplodeShingles(es.head, es.lift(1) match {
        case Some(Literal(v: Int, _)) => v
        case Some(other) => other.eval().asInstanceOf[Number].intValue()
        case None => 3
      })),
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - inner product of two ARRAY<DOUBLE> vectors (codegen'd left fold)"),
      es => { requireArity("vec_dot", es, 2); DotProduct(es.head, es(1)) }),
    ("vec_dist2",
      info("vec_dist2", "vec_dist2(a, b) - squared L2 distance of two ARRAY<DOUBLE> vectors (codegen'd left fold)"),
      es => { requireArity("vec_dist2", es, 2); SqDist(es.head, es(1)) }))

  /** Clean analysis-time error instead of an IndexOutOfBoundsException
    * when a SQL caller passes the wrong argument count (ADVICE r15). */
  private def requireArity(name: String, es: Seq[Expression], n: Int): Unit =
    if (es.length != n)
      throw new IllegalArgumentException(
        s"$name requires exactly $n arguments, got ${es.length}")

  /** Register the same functions on an already-running session. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, builder)
    }
}
