package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions.lit
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.queries.Behavior

/** The behavioral-analytics battery (q75-q80, d58) against fixtures
  * whose answers are derivable on paper. Each block writes its own
  * tables into a fresh dir and runs the REAL `Q.run` closure — the same
  * code path Verify exercises — so sessionize gap math, funnel time
  * bounds, sweep half-open semantics, island grouping, rule lift, and
  * neighborhood Jaccard are each pinned to hand-computed values.
  */
class BehaviorSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark

  private def q(name: String) = Behavior.all.find(_.name == name).get.run

  private def freshDir(): String =
    Files.createTempDirectory("behavior_fixture").toString

  /** events fixture: ts is LONG nanoseconds, exactly how the real
    * nanos-typed events.parquet arrives under `nanosAsLong` (the
    * `Tables.events` conversion then applies identically). */
  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, tsNs, uid, et) => (id, tsNs, uid, et, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private val S = 1000000000L          // 1 second in ns
  private val Day = 86400L * S
  private val Jan1 = 1704067200L * S   // 2024-01-01T00:00Z, a Monday

  describe("q75_sessionize") {
    it("splits on >30-min gaps and folds per-user session stats") {
      val dir = freshDir()
      writeEvents(dir, Seq(
        (1L, Jan1, 1L, "click"),
        (2L, Jan1 + 10 * S, 1L, "click"),       // same session (10s gap)
        (3L, Jan1 + 2400 * S, 1L, "click"),     // 40min gap -> new session
        (4L, Jan1, 2L, "view")))
      val out = q("q75_sessionize")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.toSeq == Seq((1L, 2L, 2L, 3L), (2L, 1L, 1L, 1L)))
    }
    it("keeps a 30-min-exactly gap in one session (strict >)") {
      val dir = freshDir()
      writeEvents(dir, Seq(
        (1L, Jan1, 1L, "click"),
        (2L, Jan1 + 1800 * S, 1L, "click")))
      val out = q("q75_sessionize")(spark, dir).collect()
      assert(out.head.getLong(1) == 1L)   // n_sessions
    }
  }

  describe("q76_retention_cohorts") {
    it("buckets users by first-event ISO week and whole-week offsets") {
      val dir = freshDir()
      writeEvents(dir, Seq(
        (1L, Jan1, 1L, "view"),             // cohort Mon Jan 1, offset 0
        (2L, Jan1 + 9 * Day, 1L, "view"),   // Jan 10 -> week Jan 8, offset 1
        (3L, Jan1 + 9 * Day, 2L, "view")))  // cohort Jan 8, offset 0
      val out = q("q76_retention_cohorts")(spark, dir).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      assert(out.toSeq == Seq(
        ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
        ("2024-01-08", 0L, 1L)))
    }
  }

  describe("q77_funnel_steps") {
    it("requires each stage within one hour, strictly after the last") {
      val dir = freshDir()
      writeEvents(dir, Seq(
        (1L, Jan1, 1L, "view"),
        (2L, Jan1 + 1800 * S, 1L, "click"),     // 30min after view: ok
        (3L, Jan1 + 4800 * S, 1L, "purchase"),  // 50min after click: ok
        (4L, Jan1, 2L, "view"),
        (5L, Jan1 + 4000 * S, 2L, "click")))    // 66min: outside the hour
      val r = q("q77_funnel_steps")(spark, dir).collect().head
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
    }
  }

  describe("q78_interval_sweep") {
    it("counts overlap within the 5-min activity window, half-open") {
      val dir = freshDir()
      writeEvents(dir, Seq(
        (1L, Jan1, 1L, "view"),
        (2L, Jan1 + 60 * S, 2L, "view"),     // inside event 1's window
        (3L, Jan1 + 300 * S, 3L, "view"),    // starts AT event 1's end
        (4L, Jan1, 1L, "click")))            // other type: independent
      val out = q("q78_interval_sweep")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      // events 1+2 overlap; event 3 touches event 1 only at the open
      // boundary (end sorts before start at the same instant).
      assert(out == Map("view" -> 2L, "click" -> 1L))
    }
  }

  describe("q79_gaps_islands") {
    it("groups maximal consecutive same-type runs per user") {
      val dir = freshDir()
      writeEvents(dir, Seq(
        (1L, Jan1 + 1 * S, 1L, "view"),
        (2L, Jan1 + 2 * S, 1L, "view"),
        (3L, Jan1 + 3 * S, 1L, "click"),
        (4L, Jan1 + 4 * S, 1L, "view"),
        (5L, Jan1 + 5 * S, 2L, "view")))
      // user 1: view(2), click(1), view(1); user 2: view(1)
      val out = q("q79_gaps_islands")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.toSeq == Seq(
        ("click", 1L, 1L, 0L), ("view", 3L, 2L, 0L)))
    }
  }

  describe("q80_assoc_rules") {
    it("computes support-filtered confidence and lift from exact counts") {
      import spark.implicits._
      val dir = freshDir()
      // baskets: order 1 {A,B}, order 2 {A,B}, order 3 {A}
      Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L))
        .toDF("l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      Seq((10L, "A"), (20L, "B"))
        .toDF("p_partkey", "p_brand")
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
      val r = q("q80_assoc_rules")(spark, dir).collect()
      assert(r.length == 1)
      val row = r.head
      assert((row.getString(0), row.getString(1)) == (("A", "B")))
      assert(row.getLong(2) == 2L)                    // pair in 2 orders
      assert(row.getDouble(3) == 2.0 / 3.0)           // conf = cp/ca
      assert(row.getDouble(4) == (2.0 * 3) / (3 * 2)) // lift = cp*n/(ca*cb)
    }
  }

  describe("q81_scd2_intervals") {
    it("stitches run starts into [valid_from, valid_to) interval chains") {
      val dir = freshDir()
      writeEvents(dir, Seq(
        (1L, Jan1 + 1 * S, 1L, "view"),
        (2L, Jan1 + 2 * S, 1L, "view"),
        (3L, Jan1 + 3 * S, 1L, "click"),
        (4L, Jan1 + 4 * S, 1L, "view")))
      val us = 1704067200L * 1000000L   // Jan1 in µs
      val out = q("q81_scd2_intervals")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
      assert(out.toSeq == Seq(
        (1L, "view", us + 1000000L, us + 3000000L),
        (1L, "click", us + 3000000L, us + 4000000L),
        (1L, "view", us + 4000000L, -1L)))
    }
  }

  describe("q82_resample_gapfill") {
    it("zero-fills the dense per-user day grid") {
      val dir = freshDir()
      writeEvents(dir, Seq(
        (1L, Jan1, 1L, "view"),
        (2L, Jan1 + 3600 * S, 1L, "view"),   // same day
        (3L, Jan1 + 2 * Day, 1L, "view"),    // day 2; day 1 is a gap
        (4L, Jan1, 2L, "view")))
      val out = q("q82_resample_gapfill")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.toSeq == Seq((1L, 3L, 1L, 2L), (2L, 1L, 0L, 1L)))
    }
  }

  describe("d59_zscore_outliers") {
    it("flags |z| > 2 by the exact integer inequality") {
      import spark.implicits._
      val dir = freshDir()
      // five 100-char docs + one 600-char: only the 600 has z > 2
      // ((n*x-S)^2 = 6.25e6 > 4*(n*SS-S^2) = 5e6); with one fewer
      // 100-doc the deviant sits at exactly z = 2 and must NOT flag.
      (Seq((1L, "en", 600L)) ++ (2L to 6L).map(i => (i, "en", 100L)))
        .toDF("doc_id", "lang", "n_chars")
        .withColumn("text", lit("x"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = q("d59_zscore_outliers")(spark, dir).collect()
        .map(_.getLong(0))
      assert(out.toSeq == Seq(1L))
    }
    it("treats the z = 2 boundary as inside (strict >)") {
      import spark.implicits._
      val dir = freshDir()
      (Seq((1L, "en", 600L)) ++ (2L to 5L).map(i => (i, "en", 100L)))
        .toDF("doc_id", "lang", "n_chars")
        .withColumn("text", lit("x"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      assert(q("d59_zscore_outliers")(spark, dir).count() == 0)
    }
  }

  describe("d60_markov_transitions") {
    it("row-normalizes per-user bigram counts") {
      val dir = freshDir()
      writeEvents(dir, Seq(
        (1L, Jan1 + 1 * S, 1L, "view"),
        (2L, Jan1 + 2 * S, 1L, "click"),
        (3L, Jan1 + 3 * S, 1L, "view"),
        (4L, Jan1 + 1 * S, 2L, "view"),
        (5L, Jan1 + 2 * S, 2L, "view")))
      val out = q("d60_markov_transitions")(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3)))
      assert(out.toSeq == Seq(
        ("click", "view", 1L, 1.0),
        ("view", "click", 1L, 0.5),
        ("view", "view", 1L, 0.5)))
    }
  }

  describe("q83_chi_square_cells") {
    it("computes observed/expected/contribution from exact margins") {
      import spark.implicits._
      val dir = freshDir()
      // 2x2 with margins all 4, n=8, E=2 everywhere; contribution
      // (8*O-16)^2/128 = 0.5 for every cell.
      val rows = Seq.fill(3)(("P1", "O")) ++ Seq(("P1", "F")) ++
        Seq(("P2", "O")) ++ Seq.fill(3)(("P2", "F"))
      rows.toDF("o_orderpriority", "o_orderstatus")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val out = q("q83_chi_square_cells")(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
      assert(out.toSeq == Seq(
        ("P1", "F", 1L, 2.0, 0.5), ("P1", "O", 3L, 2.0, 0.5),
        ("P2", "F", 3L, 2.0, 0.5), ("P2", "O", 1L, 2.0, 0.5)))
    }
  }

  describe("q84_time_to_convert") {
    it("selects rank-based quantiles of signup->purchase delay") {
      val dir = freshDir()
      writeEvents(dir, Seq(
        (1L, Jan1, 1L, "signup"),
        (2L, Jan1 + 100 * S, 1L, "purchase"),
        (3L, Jan1, 2L, "signup"),
        (4L, Jan1 + 200 * S, 2L, "purchase"),
        (5L, Jan1 + 50 * S, 3L, "purchase")))  // purchase w/o signup
      val r = q("q84_time_to_convert")(spark, dir).collect()
      assert(r.length == 1)
      val row = r.head
      assert(row.getDate(0).toString == "2024-01-01")
      // n=2: p50 at rank ceil(1)=1 -> 1e8 us, p90 at ceil(1.8)=2 -> 2e8
      assert((row.getLong(1), row.getLong(2), row.getLong(3)) ==
        ((2L, 100000000L, 200000000L)))
    }
  }

  describe("d61_prefix_filter_join") {
    it("keeps J >= 0.9 pairs (boundary inclusive) through the prefix filter") {
      import spark.implicits._
      val dir = freshDir()
      // doc2 = doc1 minus "jj": J = 9/10 = 0.9 exactly (boundary in).
      // doc1's rarest-first 2-token prefix is [jj, aa], doc2's 1-token
      // prefix is [aa] -> they share "aa", so the filter must keep them.
      Seq(
        (1L, "aa bb cc dd ee ff gg hh ii jj"),
        (2L, "aa bb cc dd ee ff gg hh ii"),
        (3L, "xx yy zz"))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = q("d61_prefix_filter_join")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(out.toSeq == Seq((1L, 2L, 9L, 0.9)))
    }
  }

  describe("d58_sorted_neighborhood") {
    it("emits only adjacent pairs above the Jaccard threshold") {
      import spark.implicits._
      val dir = freshDir()
      Seq(
        (1L, "alpha beta gamma"),
        (2L, "alpha beta gamma delta"),
        (3L, "alpha zzz yyy xxx"),
        (4L, "??? ..."))                 // tokenizes to []: dropped
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = q("d58_sorted_neighborhood")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // sorted: doc1 < doc2 < doc3. (1,2): 3/4. (2,3): 1/7. (1,3): 1/6.
      assert(out.toSeq == Seq((1L, 2L, 0.75)))
    }
  }
}
