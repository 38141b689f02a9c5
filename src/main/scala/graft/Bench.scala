package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round at sf0.1): times the headline
  * queries and prints ONE JSON line. Results are forced through the
  * `noop` sink so every projected column is actually computed —
  * `.count()` would let Catalyst prune the expressions under test.
  */
object Bench {

  /** Representative slice of the surface: scan+agg, broadcast join,
    * multi-join, window, top-k, event-time window, JSON extraction,
    * single-pass inference, fingerprint/near-dup/simhash dedup, cosine
    * top-k, multimodal decode. */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q02_brand_revenue", "q03_region_order_stats",
    "q06_top_order_per_cust", "q08_topk_orders", "w01_daily_events",
    "q14_json_group", "p04_route_infer_single_pass", "d05_fingerprint",
    "d07_neardup_pairs", "d08_simhash", "s01_cosine_topk",
    "m01_multimodal_decode")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    val results = headline.filter(queries.contains).map { name =>
      val t0 = System.nanoTime()
      try queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
