package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** [[IrEval.binaryEval]] against hand-computed ground truth —
  * the AUC numerator is exact integer arithmetic, so the expected
  * values are derivable on paper (and were). */
class IrEvalBinarySpec extends AnyFunSuite {
  import spark.implicits._

  test("binaryEval: tie-corrected AUC + confusion on a planted fixture") {
    // pos scores {3, 2, 2}, neg scores {1, 2}:
    //  pairs pos>neg: (3>1),(3>2),(2>1),(2>1) = 4; ties: 2 (both 2s
    //  vs the neg 2) → num2 = 2·4 + 2 = 10; AUC = 10/(2·3·2) = 5/6.
    //  thr=2: tp=3, fp=1, fn=0, tn=1.
    val df = Seq((1L, 3L), (1L, 2L), (1L, 2L), (0L, 1L), (0L, 2L))
      .toDF("y", "s")
    val r = IrEval.binaryEval(df, col("y"), col("s"), thr = 2L)
      .head()
    assert(r.getAs[Long]("n_pos") == 3L)
    assert(r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("auc_num2") == 10L)
    assert(math.abs(r.getAs[Double]("auc") - 10.0 / 12.0) < 1e-8)
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn")) == ((3L, 1L, 0L, 1L)))
    assert(math.abs(r.getAs[Double]("accuracy") - 0.8) < 1e-8)
    assert(math.abs(r.getAs[Double]("prec") - 0.75) < 1e-8)
    assert(math.abs(r.getAs[Double]("rec") - 1.0) < 1e-8)
    assert(math.abs(r.getAs[Double]("f1") - 6.0 / 7.0) < 1e-8)
  }

  test("binaryEval: degenerate one-class input reports NULL auc/rec " +
      "and convention prec/f1, never a 0/0 (ADVICE r12)") {
    // all-negative corpus below the threshold: no positives, no
    // positive predictions
    val allNeg = Seq((0L, 1L), (0L, 2L)).toDF("y", "s")
    val r = IrEval.binaryEval(allNeg, col("y"), col("s"), thr = 5L)
      .head()
    assert(r.isNullAt(r.fieldIndex("auc")))
    assert(r.isNullAt(r.fieldIndex("rec")))
    assert(r.getAs[Double]("prec") == 1.0) // tp+fp = 0 -> prCurve's 0/0
    assert(r.getAs[Double]("f1") == 0.0)   // tp = 0
    assert(r.getAs[Double]("accuracy") == 1.0) // tn = all
    // all-positive corpus: auc still NULL (no negative to rank)
    val allPos = Seq((1L, 1L), (1L, 2L)).toDF("y", "s")
    val p = IrEval.binaryEval(allPos, col("y"), col("s"), thr = 0L)
      .head()
    assert(p.isNullAt(p.fieldIndex("auc")))
    assert(p.getAs[Double]("rec") == 1.0)
    assert(p.getAs[Double]("prec") == 1.0)
  }

  test("binaryEval: perfect and inverted separations bound AUC") {
    val perfect = Seq((1L, 10L), (1L, 9L), (0L, 2L), (0L, 1L))
      .toDF("y", "s")
    assert(IrEval.binaryEval(perfect, col("y"), col("s"), 5L)
      .head().getAs[Double]("auc") == 1.0)
    val inverted = Seq((0L, 10L), (0L, 9L), (1L, 2L), (1L, 1L))
      .toDF("y", "s")
    assert(IrEval.binaryEval(inverted, col("y"), col("s"), 5L)
      .head().getAs[Double]("auc") == 0.0)
  }

  test("binaryEvalBy: each slice equals its own global binaryEval") {
    val df = spark.range(300).select(
      (col("id") % 3).cast("string").as("g"),
      (col("id") % 5 === 0).cast("long").as("y"),
      pmod(xxhash64(col("id")), lit(40)).as("s"))
    val sliced = IrEval.binaryEvalBy(df, col("g"), col("y"),
      col("s"), 20L).collect()
    for (r <- sliced) {
      val g = r.getString(0)
      val solo = IrEval.binaryEval(df.filter(col("g") === g),
        col("y"), col("s"), 20L).head()
      assert(r.getAs[Long]("auc_num2") == solo.getAs[Long]("auc_num2"))
      assert(r.getAs[Long]("tp") == solo.getAs[Long]("tp"))
      assert(r.getAs[Double]("accuracy") ==
        solo.getAs[Double]("accuracy"))
    }
  }

  test("binaryEvalBy: one-class slice reports null AUC") {
    val df = Seq(("a", 1L, 5L), ("a", 1L, 3L), ("b", 1L, 4L),
      ("b", 0L, 2L)).toDF("g", "y", "s")
    val rows = IrEval.binaryEvalBy(df, col("g"), col("y"), col("s"),
      3L).collect().map(r => r.getString(0) -> r).toMap
    assert(rows("a").isNullAt(rows("a").fieldIndex("auc")))
    assert(rows("b").getAs[Double]("auc") == 1.0)
  }

  test("binaryEval: partition-invariant (one answer under any layout)") {
    val df = spark.range(200).select(
      (col("id") % 3 === 0).cast("long").as("y"),
      pmod(xxhash64(col("id")), lit(50)).as("s"))
    val a = IrEval.binaryEval(df.repartition(1), col("y"), col("s"), 25L)
      .head()
    val b = IrEval.binaryEval(df.repartition(7, col("s")),
      col("y"), col("s"), 25L).head()
    assert(a == b)
  }
}
