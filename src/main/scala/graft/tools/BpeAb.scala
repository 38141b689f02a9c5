package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B/A/B probe for the BPE wall clause (round 19): six
  * gated pair attempts across two rounds produced auto ≈ 1.3-1.6×
  * recount in EVERY arm order and weather pattern — too consistent
  * for storm noise once the observer cost was removed. This probe
  * runs recount (B = trainBatched) and auto (A = trainIncremental,
  * no observer) INTERLEAVED in one JVM — B A B A — so any external
  * load wave hits both arms symmetrically; per-arm MIN across the
  * two repetitions is the weather-cancelled wall. Prints one JSON
  * row. Args: [rounds] [batch] (defaults 400 / 256 — the wall
  * clause's tier). */
object BpeAb {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(400)
    val batch = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.BpeTrain
    // the bpe arm's corpus verbatim (60k word types, 30k docs)
    val nTypes = 60000L
    val alpha = array(('a' to 'z').map(c => lit(c.toString)): _*)
    val docs3 = spark.range(30000L).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(40)),
        j => {
          val wid = pmod(xxhash64(col("id"), j), lit(nTypes))
          concat_ws("", transform(sequence(lit(1), lit(9)),
            c => element_at(alpha,
              (pmod(xxhash64(wid, c), lit(26)) + 1).cast("int"))))
        })).as("text"))
      .localCheckpoint()
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def runB(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = BpeTrain.trainBatched(docs3, "text", rounds, batch).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def runA(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = BpeTrain.trainIncremental(docs3, "text", rounds, batch)
        .count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // short warm-up of both paths (JIT + codegen), untimed
    BpeTrain.trainBatched(docs3, "text", 5, batch).count()
    BpeTrain.trainIncremental(docs3, "text", 5, batch).count()
    val (b1, nb1) = runB()
    val (a1, na1) = runA()
    val (b2, nb2) = runB()
    val (a2, na2) = runA()
    require(Set(nb1, na1, nb2, na2).size == 1,
      s"merge counts diverged: $nb1 $na1 $nb2 $na2")
    println(s"""{"probe":"bpe_abab","rounds":$rounds,"batch":$batch,""" +
      s""""merges":$nb1,""" +
      s""""recount_secs":[${fmt(b1)},${fmt(b2)}],""" +
      s""""auto_secs":[${fmt(a1)},${fmt(a2)}],""" +
      s""""recount_min":${fmt(math.min(b1, b2))},""" +
      s""""auto_min":${fmt(math.min(a1, a2))},""" +
      s""""ratio_min":${fmt(math.min(a1, a2) / math.min(b1, b2))}}""")
    spark.stop()
  }
}
