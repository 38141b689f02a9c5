package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Logistic-regression document-quality classifier — the model-based
  * filtering stage of a training-data pipeline (a fastText/LR-style
  * quality gate à la the CCNet / GPT-3 data recipes), built entirely
  * from Spark aggregates so it trains IN the engine.
  *
  * Scale shape: scoring is a pure codegen'd column expression
  * (embarrassingly parallel, shuffle-free); one training step is ONE
  * whole-corpus aggregation producing a (features+1)-vector of
  * gradient sums on the driver — O(corpus) work, O(features) state,
  * exactly the shape that survives 100 TB. Iterations are sequential
  * jobs over the same (cacheable) feature projection.
  *
  * Cross-engine determinism (for the DuckDB-oracled queries): features
  * derive from integer counts by IEEE double ops in a fixed
  * left-to-right order; gradient contributions are rounded to 9
  * decimals and summed as DECIMAL(28,9) — decimal sums are
  * order-independent, so Spark's partial/final aggregation tree and
  * any SQL engine's scan order produce the SAME step. The only
  * libm-dependent call (exp) sits inside a per-row term that the
  * rounding absorbs.
  */
object Classifier {

  /** Fixed feature order: [bias=1, length saturation, stopword ratio,
    * mean-token-length/10]. */
  val NumFeatures = 4

  /** Deterministic per-document feature vector (see class doc). The
    * token array is let-bound — one tokenization per row. */
  def features(text: Column): Column =
    ExprLet.let(TextAnalysis.tokens(text)) { ts =>
      val n = size(ts).cast("double")
      val stop = TextAnalysis.stopwordCount(ts).cast("double")
      val sumLen = aggregate(ts, lit(0L), (a, t) => a + length(t).cast("long"))
        .cast("double")
      array(
        lit(1.0),
        least(n / lit(50.0), lit(1.0)),
        stop / n,
        (sumLen / n) / lit(10.0))
    }

  def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** w·f accumulated strictly left-to-right — the SQL oracle writes the
    * same association, so the doubles agree bit-for-bit. */
  def dotW(weights: Seq[Double], f: Column): Column =
    weights.zipWithIndex
      .map { case (w, i) => lit(w) * element_at(f, i + 1) }
      .reduce(_ + _)

  /** P(keep | doc) under `weights`. */
  def score(weights: Seq[Double], text: Column): Column =
    sigmoid(dotW(weights, features(text)))

  /** Per-row gradient contributions (p − y)·f_j, rounded to 9 decimals
    * and cast DECIMAL(28,9) so their SUM is exact and order-free. */
  def gradientTerms(weights: Seq[Double], f: Column, y: Column): Seq[Column] = {
    val p = sigmoid(dotW(weights, f))
    weights.indices.map(j =>
      round((p - y) * element_at(f, j + 1), 9).cast(DecimalType(28, 9)))
  }

  /** One batch gradient-descent step: w_j ← w_j − lr·(Σ terms_j)/N.
    * One aggregation job; only features+1 numbers reach the driver. */
  def step(df: DataFrame, textCol: String, label: Column,
           weights: Seq[Double], lr: Double): Seq[Double] =
    stepOnFeatures(
      df.select(features(col(textCol)).as("f"),
        label.cast("double").as("y")),
      weights, lr)

  /** [[step]] over a pre-projected (f: array&lt;double&gt;, y: double)
    * frame — the loop-invariant featurization is what [[train]] caches. */
  def stepOnFeatures(fdf: DataFrame, weights: Seq[Double],
                     lr: Double): Seq[Double] = {
    val terms = gradientTerms(weights, col("f"), col("y"))
    val aggs = terms.zipWithIndex.map { case (c, j) => sum(c).as(s"g$j") } :+
      count(lit(1)).as("n")
    val row = fdf.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(weights.size).toDouble
    weights.indices.map { j =>
      // A NULL sum means no usable gradient rows (empty corpus, or all
      // labels/features NULL) — leave that weight unchanged rather than
      // NPE; n == 0 also lands here since the sums are then NULL too.
      Option(row.getDecimal(j))
        .fold(weights(j))(g => weights(j) - lr * (g.doubleValue() / n))
    }
  }

  /** Full-batch GD from `init` for `iters` steps. Features don't depend
    * on the weights, so the (f, y) projection is computed and cached
    * ONCE — without this, every iteration would re-tokenize the whole
    * corpus. */
  def train(df: DataFrame, textCol: String, label: Column,
            init: Seq[Double], lr: Double, iters: Int): Seq[Double] = {
    val fdf = df.select(features(col(textCol)).as("f"),
      label.cast("double").as("y")).persist()
    try (1 to iters).foldLeft(init)((w, _) => stepOnFeatures(fdf, w, lr))
    finally { fdf.unpersist(); () }
  }
}
