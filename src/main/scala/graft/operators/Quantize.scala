package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest-neighbor search —
  * the memory-bound billion-vector scale path (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): split each
  * vector into `m` subvectors, quantize each against a tiny per-slot
  * codebook, and search with asymmetric distance computation (ADC) —
  * per-vector cost drops from O(dim) float ops to `m` table lookups and
  * storage from dim floats to `m` byte codes (32× for 64-dim → 8 codes).
  *
  * Scale shape: the codebook is O(m·k·d) — kilobytes — and broadcasts
  * as literals into a pure per-row encode expression (shuffle-free);
  * the ADC table for a query is computed ONCE on the driver (m·k
  * doubles); search is a scan + TakeOrdered. Codebooks here are the
  * first-k subvectors (a deterministic stand-in — a real pipeline
  * k-means-trains them offline; the encode/search plumbing is
  * identical).
  *
  * Determinism: all distances are sequential left folds in DOUBLE
  * (float→double widening is exact), matching the SQL oracle's
  * list_reduce fold; argmin ties break to the LOWEST centroid index via
  * first-position-of-min.
  */
object Quantize {

  /** `m`-th (0-based) `d`-dim subvector of a 1-based array column. */
  def subvec(v: Column, m: Int, d: Int): Column = slice(v, m * d + 1, d)

  /** Squared L2 distance as a sequential left fold (see class doc) —
    * the native codegen'd [[graft.functions.SqDist]] since round 15
    * (bit-identical math to the previous `aggregate(zip_with(...))`
    * HOF form, which was CodegenFallback on the assignment kernel). */
  def dist2(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.SqDist(
      org.apache.spark.sql.GraftBridge.expression(a),
      org.apache.spark.sql.GraftBridge.expression(b)))

  /** Codebook from the first `k` vectors: cb(m)(j) = subvector `m` of
    * vector `j`, widened to double (exact). One tiny collect — any PQ
    * index build materializes its codebook on the driver. */
  def codebookFromFirst(emb: DataFrame, idCol: String, embCol: String,
                        m: Int, k: Int): Seq[Seq[Seq[Double]]] = {
    val rows = emb.filter(col(idCol) < k)
      .select(col(idCol).cast("long"), col(embCol))
      .collect()
      .sortBy(_.getLong(0))
    require(rows.length == k, s"codebook needs vectors 0..${k - 1}")
    val vecs = rows.map(_.getSeq[Float](1).map(_.toDouble).toVector)
    val d = vecs.head.length / m
    (0 until m).map(mi => vecs.toSeq.map(v => v.slice(mi * d, mi * d + d): Seq[Double]))
  }

  /** PQ codes (array of `m` 0-based centroid indices) for a float or
    * double vector column. Ties take the lowest index (first position
    * of the minimum distance).
    *
    * Each distance is a flat `(x₁−c₁)² + … + (x_d−c_d)²` arithmetic
    * tree over direct per-element casts of the raw array (same value
    * as a sequential fold: identical left-to-right association, and
    * the fold's 0.0 seed adds exactly to a non-negative first term) —
    * no per-centroid zip_with/aggregate HOFs. The per-slot distance
    * array feeds BOTH argmin legs, so it is let-bound ([[ExprLet]]):
    * an expression this size falls out of whole-stage codegen, and
    * interpreted eval re-evaluates unshared subtrees per reference. */
  def encode(v: Column, cb: Seq[Seq[Seq[Double]]]): Column = {
    val d = cb.head.head.size
    ExprLet.let(transform(v, x => x.cast("double"))) { vd =>
      array(cb.indices.map { mi =>
        ExprLet.let(subvec(vd, mi, d)) { sv =>
          val dists = array(cb(mi).map { c =>
            c.indices.map { i =>
              (element_at(sv, i + 1) - lit(c(i))) *
                (element_at(sv, i + 1) - lit(c(i)))
            }.reduce(_ + _)
          }: _*)
          ExprLet.let(dists)(ds =>
            (array_position(ds, array_min(ds)) - 1).cast("int"))
        }
      }: _*)
    }
  }

  /** Native-kernel variant of [[encode]] over a raw ARRAY&lt;FLOAT&gt;
    * column — identical codes (asserted by spec), one tight loop per
    * row instead of a ~3500-node interpreted tree; the form an index
    * build over billions of vectors runs. */
  def encodeFast(v: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    graft.functions.PqEncode(v, cb)

  /** Lloyd's k-means per subquantizer slot — the real codebook trainer
    * that the first-k stand-in replaces. Deterministic end-to-end:
    * init = the first k vectors' subvectors; assignment = the exact
    * [[encodeFast]] argmin (ties to the lowest index); update = per-dim
    * means via scaled-integer sums (`round(x·10⁶)` longs — order-free,
    * so the trained codebook is identical across partitionings and
    * cluster sizes). Cells that lose all members keep their previous
    * centroid. Per iteration: one encode projection + ONE (slot, code,
    * dim) aggregation; only m·k·d numbers reach the driver. */
  def trainCodebook(emb: DataFrame, idCol: String, embCol: String,
                    m: Int, k: Int, iters: Int): Seq[Seq[Seq[Double]]] = {
    var cb = codebookFromFirst(emb, idCol, embCol, m, k)
    val d = cb.head.head.size
    for (_ <- 1 to iters) {
      val stats = emb
        .select(col(embCol).as("v"), encodeFast(col(embCol), cb).as("codes"))
        .where(col("codes").isNotNull)
        .select(col("v"), posexplode(col("codes")).as(Seq("slot", "code")))
        .select(col("slot"), col("code"),
          posexplode(slice(col("v"), col("slot") * d + 1, lit(d)))
            .as(Seq("i", "x")))
        .groupBy("slot", "code", "i")
        .agg(
          sum(round(col("x").cast("double") * 1e6).cast("long")).as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(m, k, d)((mi, j, i) => cb(mi)(j)(i))
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getLong(3).toDouble / (r.getLong(4).toDouble * 1e6)
      }
      cb = next.map(_.map(_.toSeq).toSeq).toSeq
    }
    cb
  }

  /** ADC table for a query vector: adc(m)(j) = ‖q_sub_m − cb(m)(j)‖².
    * Driver-side, same left-fold order as [[dist2]]. */
  def adcTable(q: Seq[Double], cb: Seq[Seq[Seq[Double]]]): Seq[Seq[Double]] = {
    val d = cb.head.head.size
    cb.indices.map { mi =>
      val qs = q.slice(mi * d, mi * d + d)
      cb(mi).map(c =>
        qs.zip(c).foldLeft(0.0)((acc, p) =>
          acc + (p._1 - p._2) * (p._1 - p._2)))
    }
  }

  /** Approximate distance of an encoded vector to the query: `m` table
    * lookups summed left-to-right. `codes` is referenced once per slot,
    * so it is let-bound — passing the whole [[encode]] tree unbound
    * would re-run the encode `m` times per row. */
  def adcDistance(codes: Column, adc: Seq[Seq[Double]]): Column =
    ExprLet.let(codes) { cs =>
      adc.indices.map(mi =>
          element_at(typedlit(adc(mi)), element_at(cs, mi + 1) + 1))
        .reduce(_ + _)
    }

  /** Column-side ADC table for a STREAMED query vector (the w25 /
    * ann-serve shape, where the query is data, not a driver value):
    * `tab(mi+1)(code+1) = ‖q_sub_mi − cb(mi)(code)‖²`, built ONCE per
    * query row. The per-segment arithmetic is the exact expression the
    * serve path previously evaluated per CANDIDATE row
    * (`aggregate(zip_with(slice(qv), centroid, sq), 0.0, +)` — same
    * zip order, same left fold), so looked-up distances are
    * bit-identical; what changes is WHERE the segment distances are
    * computed. Hoisting them per-QUERY was the serve-throughput fix
    * VERDICT r08 #3 asked to diagnose (the per-candidate hot path
    * becomes [[adcLookupExpr]], plain codegen'd `element_at` sums);
    * since round 16 the table itself is ALSO compiled — one native
    * [[graft.functions.AdcTable]] kernel (see below for the JIT-cliff
    * history that forbids the m·k-separate-kernels alternative). */
  def adcTableExpr(qv: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    // Round 16: the native single-kernel [[graft.functions.AdcTable]] —
    // ONE expression looping m·k·d internally in one small generated
    // method. This is the resolution of the round-15 JIT cliff: m·k
    // SEPARATE kernels (128 at the probe's 8×16) inlined into one
    // projection blew HotSpot's huge-method limit and dropped the
    // whole fused stage to interpreted bytecode (~10× on ann_serve),
    // which forced a temporary revert to the CodegenFallback HOF fold
    // (interpreted, but per-QUERY volume). The single kernel gets both:
    // the stage stays in whole-stage codegen AND the table runs
    // compiled. Bit-identical to the HOF form (AdcTableSpec).
    graft.functions.AdcTable(qv, cb)

  /** The HOF fold [[adcTableExpr]] replaced — kept VERBATIM as the
    * bit-identity reference for AdcTableSpec (the same role VecExprSpec's
    * inline HOFs play for vec_dot/vec_dist2). Not called from any
    * shipped query path. */
  private[graft] def adcTableExprHof(qv: Column, cb: Seq[Seq[Seq[Double]]]): Column = {
    val d = cb.head.head.size
    array(cb.indices.map { mi =>
      array(cb(mi).indices.map { code =>
        aggregate(
          zip_with(
            slice(qv, mi * d + 1, d),
            typedlit(cb(mi)(code)),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, t) => acc + t)
      }: _*)
    }: _*)
  }

  /** Approximate distance from a per-row ADC table ([[adcTableExpr]]):
    * `m` nested `element_at` lookups summed left-to-right — identical
    * association order to the expression it replaces, fully inside
    * whole-stage codegen. */
  def adcLookupExpr(tab: Column, codes: Column, m: Int): Column =
    ExprLet.let(codes) { cs =>
      (0 until m).map(mi =>
          element_at(element_at(tab, mi + 1), element_at(cs, mi + 1) + 1))
        .reduce(_ + _)
    }
}
