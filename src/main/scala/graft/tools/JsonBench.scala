package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway micro-benchmark: q14's JSON scalar extraction strategies.
  * Run: sbt "runMain graft.tools.JsonBench /root/testdata/sf0.1"
  */
object JsonBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.queries.Tables.events(spark, dir)

    def time(name: String)(df: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[jsonbench] $name%-28s best=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }

    time("get_json_object") {
      ev.groupBy("event_type")
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).cast("long").as("sum_k"),
          count(lit(1)).as("n")).orderBy("event_type")
    }
    time("from_json") {
      ev.groupBy("event_type")
        .agg(sum(from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k STRING")).getField("k").cast("long")).cast("long").as("sum_k"),
          count(lit(1)).as("n")).orderBy("event_type")
    }
    time("try_variant_get") {
      ev.groupBy("event_type")
        .agg(sum(try_variant_get(try_parse_json(col("props")), "$.k", "long")).cast("long").as("sum_k"),
          count(lit(1)).as("n")).orderBy("event_type")
    }
    time("scan_only_baseline") {
      ev.groupBy("event_type")
        .agg(sum(length(col("props"))).cast("long").as("sum_k"),
          count(lit(1)).as("n")).orderBy("event_type")
    }
    spark.stop()
  }
}
