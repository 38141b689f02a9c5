package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear algebra over embedding columns — the Gram/
  * covariance pass and the PCA projection a representation-learning
  * pipeline runs before clustering, whitening, or ANN indexing.
  *
  * Everything here is EXACT INTEGER arithmetic over 1e-6-quantized
  * embeddings ([[quantize]]): `floor(x·10⁶)` of a float is the same
  * LONG in every engine (float→double widening is exact, the scaled
  * floor is deterministic), and integer sums are order-independent —
  * so the whole chain (Gram → trunc-div rescale → power iteration →
  * projection) is replayable bit-for-bit by the DuckDB oracle, with
  * none of the cross-engine drift a double aggregation would leak.
  * The only non-integer steps are the per-iteration max-normalize
  * (int64→double conversion, IEEE division, ×10⁶, floor — each
  * exactly specified by IEEE 754, hence engine-identical).
  *
  * Scale: the Gram is one corpus pass producing a BOUNDED d² artifact
  * (d = 64 → 2 080 upper-triangle sums); power iteration is driver
  * arithmetic on that artifact (the k-means-centroid discipline);
  * the projection is one codegen'd map pass. Long-overflow bounds are
  * checked loudly, not assumed. */
object LinAlg {

  /** Quantization scale: 6 decimal digits — keeps float precision
    * (2^-24 ≈ 6e-8 per unit) while bounding |q| ≈ 10⁶ for unit-range
    * embeddings. */
  val Scale = 1000000L

  /** `floor(x·10⁶)` per element, LONG — engine-identical (see class
    * doc). */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * Scale.toDouble).cast("long"))

  /** Quantized Gram matrix, upper triangle: `(i, j, g_q)` with
    * `i ≤ j`, `g_q = Σ_rows q_i·q_j` — exact LONG sums, declarative:
    * two chained posexplodes emit the d² per-row pairs straight into
    * a partial hash aggregate, so the shuffle is ≤ d(d+1)/2 rows per
    * map partition regardless of corpus size. The d²-per-row fanout
    * is the honest flop count of a Gram pass; [[gramQFast]] does the
    * same reduction at array speed (one treeAggregate) when the
    * explode overhead matters. */
  def gramQ(df: DataFrame, vecCol: String): DataFrame = {
    // Overflow guard (ADVICE r12): the LONG sum wraps silently once
    // n·max|q|² ≥ 2⁶³ (≈ 6e8 unit-range rows at d = 64). The bound
    // rides the same aggregate as two extra agg exprs (count + max)
    // in DECIMAL(38,0) — if it holds, every partial sum was bounded
    // by it too, so no intermediate overflow could have occurred.
    val two63 = lit(BigDecimal(2).pow(63).toBigInt.toString)
      .cast("decimal(38,0)")
    df.select(quantize(col(vecCol)).as("qv"))
      .select(posexplode(col("qv")).as(Seq("i", "qi")), col("qv"))
      .select(col("i"), col("qi"),
        posexplode(col("qv")).as(Seq("j", "qj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum(col("qi") * col("qj")).as("g_q"),
        count(lit(1)).cast("decimal(38,0)").as("_n"),
        greatest(max(abs(col("qi"))), max(abs(col("qj"))))
          .cast("decimal(38,0)").as("_m"))
      .select(col("i"), col("j"),
        when(col("_n") * col("_m") * col("_m") < two63, col("g_q"))
          .otherwise(raise_error(concat(
            lit("gramQ: int64 overflow risk — n·max|q|² = "),
            (col("_n") * col("_m") * col("_m")).cast("string"),
            lit(" ≥ 2^63; reduce the quantization scale"))))
          .cast("long").as("g_q"))
  }

  /** The same exact reduction as [[gramQ]] as ONE `treeAggregate`
    * pass over slot-packed upper-triangle LONG accumulators — the
    * MLlib-style Gram: no explode, no shuffle beyond the tree
    * combine of d(d+1)/2-long arrays. Returns slots in row-major
    * upper-triangle order: slot(i,j) = i·d − i(i−1)/2 + (j−i).
    * Exactly equal to [[gramQ]] (spec-gated) — integer sums have one
    * answer. */
  def gramQFast(df: DataFrame, vecCol: String, dim: Int): Array[Long] = {
    val n = dim * (dim + 1) / 2
    // Two witness slots ride the accumulator: slot n = max|q|
    // component seen, slot n+1 = row count. The post-hoc bound
    // count·max|q|² < 2⁶³ is checked in BigInt (the check itself
    // can't wrap); if it holds, every partial sum was bounded by it
    // too, so no intermediate overflow could have occurred
    // (ADVICE r12 — the doc's "checked loudly, not assumed" now
    // covers the Gram pass, not only topEigenQ).
    val acc = df.select(quantize(col(vecCol)).as("qv")).rdd
      .map(_.getSeq[Long](0).toArray)
      .treeAggregate(new Array[Long](n + 2))(
        (acc, q) => {
          require(q.length == dim,
            s"gramQFast: expected dim $dim, got ${q.length}")
          var k = 0; var i = 0
          while (i < dim) {
            val qi = q(i); var j = i
            while (j < dim) { acc(k) += qi * q(j); j += 1; k += 1 }
            val a = math.abs(qi)
            if (a > acc(n)) acc(n) = a
            i += 1
          }
          acc(n + 1) += 1
          acc
        },
        (a, b) => {
          var k = 0; while (k < n) { a(k) += b(k); k += 1 }
          a(n) = math.max(a(n), b(n)); a(n + 1) += b(n + 1)
          a
        })
    val bound = BigInt(acc(n + 1)) * BigInt(acc(n)) * BigInt(acc(n))
    require(bound < BigInt(2).pow(63),
      s"gramQFast: int64 overflow risk — n·max|q|² = $bound ≥ 2^63; " +
        "reduce the quantization scale")
    acc.take(n)
  }

  /** Dominant eigenvector by POWER ITERATION on the quantized Gram —
    * driver-side on the bounded d² artifact, every step exactly
    * replayable in SQL: rescale `gs = g_q / 10⁶` (LONG division —
    * truncation toward zero, matching DuckDB's integer `//`), then
    * `iters` rounds of exact integer mat-vec + max-normalize
    * (int64→double, IEEE divide, ×10⁶, floor). Returns the
    * eigenvector at 10⁶ scale; sign follows the all-ones start
    * vector deterministically. Overflow is checked loudly: the
    * mat-vec needs dim · max|gs| · 10⁶ < 2⁶³. */
  def topEigenQ(upper: Seq[(Int, Int, Long)], dim: Int,
                iters: Int = 8): Array[Long] = {
    val gs = Array.ofDim[Long](dim, dim)
    upper.foreach { case (i, j, g) =>
      val s = g / Scale
      gs(i)(j) = s; gs(j)(i) = s
    }
    val maxAbs = gs.map(_.map(math.abs).max).max
    require(maxAbs <= Long.MaxValue / (dim.toLong * Scale),
      s"topEigenQ: |gs| = $maxAbs overflows the exact mat-vec at " +
        s"dim $dim; raise the rescale divisor")
    var v = Array.fill(dim)(Scale)
    (1 to iters).foreach { _ =>
      val w = Array.tabulate(dim) { i =>
        var s = 0L; var j = 0
        while (j < dim) { s += gs(i)(j) * v(j); j += 1 }
        s
      }
      val m = w.map(math.abs).max
      require(m > 0, "topEigenQ: zero Gram matrix")
      v = w.map(x => math.floor(x.toDouble / m.toDouble * Scale.toDouble).toLong)
    }
    v
  }

  /** Exact quantized projection `proj_q = ⟨q(row), v⟩` — one
    * codegen'd map pass (zip_with product + aggregate sum over the
    * broadcast eigenvector literal). */
  def projectQ(df: DataFrame, idCol: String, vecCol: String,
               v: Array[Long]): DataFrame = {
    val vlit = array(v.map(lit(_)): _*)
    df.select(col(idCol),
      aggregate(zip_with(quantize(col(vecCol)), vlit, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as("proj_q"))
  }

  /** [[projectQ]] with the source columns RETAINED — the serving
    * layout (s20): one pass computes the probe scalar NEXT TO the
    * vector, so the candidate fetch and the exact rerank read the
    * materialized projection table and never rescan the corpus. */
  def withProjQ(df: DataFrame, vecCol: String, v: Array[Long],
                out: String = "proj_q"): DataFrame = {
    val vlit = array(v.map(lit(_)): _*)
    df.withColumn(out,
      aggregate(zip_with(quantize(col(vecCol)), vlit, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x))
  }
}
