package graft.catalog

import org.apache.spark.sql.SparkSession

/** Hive-metastore-mode session (SURVEY.md §7.4's deferred path).
  *
  * The reference's entire output surface is Hive DDL
  * (`CreateHQL.scala:94-99`) destined for a Hive metastore; the sandbox
  * has no metastore ''service'', but Spark's `enableHiveSupport` +
  * embedded Derby IS a real `HiveExternalCatalog` — the same code path a
  * production metastore exercises, minus the thrift hop. This helper
  * builds exactly one such session per JVM, sharing the existing
  * SparkContext:
  *
  *  - `spark.sql.catalogImplementation` is a ''static'' conf, but since
  *    SPARK-31532 a NEW SparkSession created over an existing context
  *    gets its own SharedState with the builder's static confs applied —
  *    so a hive-backed session can coexist with the in-memory-catalog
  *    session Verify/Bench already hold.
  *  - The default/active sessions are saved and restored around the
  *    build, so `getOrCreate` creates rather than returns the existing
  *    session, and the rest of the suite keeps its session untouched.
  *  - Derby files + warehouse live under a fresh temp dir (one per JVM;
  *    embedded Derby allows a single connection, hence the memoization).
  *  - NEVER `stop()` this session — it shares the SparkContext.
  *
  * '''Concurrency contract: single-threaded callers only.''' While the
  * first call is inside `getOrCreate`, the JVM-global default/active
  * sessions are cleared; a concurrent thread calling
  * `SparkSession.builder().getOrCreate()` (or relying on
  * `getActiveSession`) during that window could bind to the hive
  * session or recreate state. The harness (Verify/Bench/tests) runs
  * queries sequentially, which is what makes this safe; any future
  * concurrent caller must acquire all its sessions through this same
  * object's lock.
  */
object HiveMode {

  @volatile private var cached: Option[SparkSession] = None

  def session(base: SparkSession): SparkSession = synchronized {
    cached.getOrElse {
      val prevDefault = SparkSession.getDefaultSession
      val prevActive = SparkSession.getActiveSession
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      try {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-hive").toString
        val hs = SparkSession.builder()
          .enableHiveSupport()
          .config("spark.sql.warehouse.dir", s"$tmp/warehouse")
          .config("javax.jdo.option.ConnectionURL",
            s"jdbc:derby:;databaseName=$tmp/metastore_db;create=true")
          // The metastore would otherwise list the location and stamp
          // totalSize into the table properties at CREATE time — which
          // Spark restores as catalog stats, defeating q63's
          // "stats only after ANALYZE" evidence. Non-spark keys land in
          // the SharedState's cloned hadoopConf, which is what the
          // embedded metastore reads.
          .config("hive.stats.autogather", "false")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .config("spark.sql.shuffle.partitions",
            base.conf.get("spark.sql.shuffle.partitions"))
          .getOrCreate()
        require(
          hs.conf.get("spark.sql.catalogImplementation") == "hive",
          "HiveMode: new session did not pick up the hive catalog " +
            "implementation (static-conf propagation broke)")
        cached = Some(hs)
        hs
      } finally {
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    }
  }
}
