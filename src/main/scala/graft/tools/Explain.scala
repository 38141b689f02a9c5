package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for selected queries so
  * pushdown / broadcast / codegen spans can be inspected.
  * `sbt "runMain graft.tools.Explain q01_pricing_summary ..."` (no args =
  * the bench headline set). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Surface Janino errors instead of silently interpreting — keeps
      // "the plan compiled" an auditable fact, not an assumption.
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.sameElements(Array("--all"))) graft.SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty) args.toSeq
      else graft.Bench.headline
    val queries = graft.SparkEntry.queries
    names.filter(queries.contains).foreach { name =>
      println(s"\n========== $name ==========")
      try {
        val df = queries(name)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        // Execute too: codegen compilation only happens at run time.
        df.write.format("noop").mode("overwrite").save()
        println(s"[explain] $name executed ok (codegen.fallback=false)")
      }
      catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
    }
    spark.stop()
  }
}
