package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class PackingSpec extends AnyFunSuite {
  import spark.implicits._

  test("globalRunningSum matches a sequential scan") {
    val df = Seq((1L, 5L), (2L, 3L), (3L, 0L), (4L, 7L), (5L, 2L))
      .toDF("id", "v")
    val got = RankOps
      .globalRunningSum(df, Seq(col("id")), col("v"), "cum", 3)
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L), (2L, 8L), (3L, 8L), (4L, 15L), (5L, 17L)))
  }

  test("docSpans: contiguous half-open spans, zero-length docs dropped") {
    val df = Seq((10L, 4L), (11L, 0L), (12L, 6L), (13L, 2L))
      .toDF("doc_id", "len")
    val got = Packing.docSpans(df, "doc_id", "len")
      .orderBy("doc_id").select("doc_id", "start", "end")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((10L, 0L, 4L), (12L, 4L, 10L), (13L, 10L, 12L)))
  }

  test("packedSequences: budget cuts, split accounting, tail short") {
    // stream: doc1 [0,4), doc2 [4,10), doc3 [10,12); budget 5 →
    // seq0 [0,5): doc1 whole + doc2 head (split) — 2 docs, 5 tokens
    // seq1 [5,10): doc2 tail — 1 doc, 5 tokens, no split
    // seq2 [10,12): doc3 — 1 doc, 2 tokens (tail)
    val df = Seq((1L, 4L), (2L, 6L), (3L, 2L)).toDF("doc_id", "len")
    val got = Packing.packedSequences(df, "doc_id", "len", 5L)
      .select("seq", "n_docs", "n_tokens", "n_continued")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 5L, 1L), (1L, 1L, 5L, 0L), (2L, 1L, 2L, 0L)))
  }

  test("packedSequences conserves tokens and fills every non-tail seq") {
    val docs = (1L to 200L).map(i => (i, 1L + (i * 7) % 23)).toDF("doc_id", "len")
    val total = docs.agg(sum("len")).head().getLong(0)
    val seqs = Packing.packedSequences(docs, "doc_id", "len", 64L)
      .collect()
    assert(seqs.map(_.getAs[Long]("n_tokens")).sum == total)
    val nonTail = seqs.dropRight(1)
    assert(nonTail.forall(_.getAs[Long]("n_tokens") == 64L))
    assert(seqs.last.getAs[Long]("n_tokens") == (if (total % 64 == 0) 64L else total % 64))
  }

  test("weightedTopK: ES keys rank by ln(u)/w, zero weights dropped, deterministic") {
    val df = Seq((1L, 10L, "alpha"), (2L, 1000L, "beta"),
      (3L, 0L, "gamma"), (4L, 10L, "delta"))
      .toDF("doc_id", "w", "txt")
    val got = Sampling
      .weightedTopK(df, "doc_id", col("w"), col("txt"), k = 10)
      .collect()
    // zero-weight row never sampled
    assert(!got.map(_.getLong(0)).contains(3L))
    assert(got.length == 3)
    // keys match the closed form ln((h%P+1)/(P+1))/w, rounded to 9
    val expected = Seq(("alpha", 1L, 10L), ("beta", 2L, 1000L),
      ("delta", 4L, 10L)).map { case (txt, id, w) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(txt.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(md5, 16) % Dedup.HashP
      val u = (h + 1).toDouble / (Dedup.HashP + 1).toDouble
      id -> BigDecimal(math.log(u) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    got.foreach { r =>
      assert(r.getDouble(2) == expected(r.getLong(0)),
        s"key mismatch for doc ${r.getLong(0)}")
    }
    // ranked by key desc
    assert(got.map(_.getDouble(2)).toSeq == got.map(_.getDouble(2)).toSeq.sorted.reverse)
  }

  test("pairPack: shortest pairs with longest; waste accounting") {
    // lens sorted: 2,3,5,9 → packs: (2,9)=11 fits(b=12) waste 1;
    // (3,5)=8 fits waste 4
    val df = Seq((1L, 5L), (2L, 2L), (3L, 9L), (4L, 3L)).toDF("doc_id", "len")
    val got = Packing.pairPack(df, "doc_id", "len", 12L)
      .select("pack_id", "n_docs", "content", "fits", "n_seqs", "waste")
      .as[(Long, Long, Long, Boolean, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 11L, true, 1L, 1L), (2L, 2L, 8L, true, 1L, 4L)))
  }

  test("streamed assembly: carry chains batches; committed replay is a no-op; " +
      "crashed partial write is overwritten") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-packspec").toString
    try {
      val b0 = Seq((1L, 4L), (2L, 6L)).toDF("doc_id", "len")
      val b1 = Seq((3L, 2L), (4L, 5L)).toDF("doc_id", "len")
      Packing.initStream(spark, tmp)
      Packing.applyStreamBatch(b0, "doc_id", "len", tmp, "b0")
      // simulate a crash that left a partial (garbage) span write for
      // b1 but never committed the carry: the replay must overwrite it
      Seq((99L, 999L, 0L, 999L)).toDF("doc_id", "len", "start", "end")
        .write.mode("overwrite").parquet(s"$tmp/spans/b1")
      Packing.applyStreamBatch(b1, "doc_id", "len", tmp, "b1")
      // committed replay: a second apply of b1 must change nothing
      Packing.applyStreamBatch(b1, "doc_id", "len", tmp, "b1")
      val got = Packing.readSpans(spark, tmp)
        .orderBy("doc_id").select("doc_id", "start", "end")
        .as[(Long, Long, Long)].collect().toSeq
      val batch = Packing
        .docSpans(b0.unionByName(b1), "doc_id", "len")
        .orderBy("doc_id").select("doc_id", "start", "end")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == batch)
      assert(got == Seq((1L, 0L, 4L), (2L, 4L, 10L), (3L, 10L, 12L), (4L, 12L, 17L)))
    } finally graft.queries.Rm.rf(tmp)
  }

  test("streamed assembly: the rename-out→rename-in crash window " +
      "self-heals (carry missing, staged carry_new present)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-packheal").toString
    try {
      val b0 = Seq((1L, 4L), (2L, 6L)).toDF("doc_id", "len")
      val b1 = Seq((3L, 2L), (4L, 5L)).toDF("doc_id", "len")
      Packing.initStream(spark, tmp)
      Packing.applyStreamBatch(b0, "doc_id", "len", tmp, "b0")
      // simulate the crash BETWEEN the two renames: the live carry is
      // gone, the fully-staged carry_new (marker inside) remains
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/carry"),
        new org.apache.hadoop.fs.Path(s"$tmp/carry_new")))
      // a replay of the committed batch heals, then no-ops
      Packing.applyStreamBatch(b0, "doc_id", "len", tmp, "b0")
      // and the next batch folds against the healed carry
      Packing.applyStreamBatch(b1, "doc_id", "len", tmp, "b1")
      val got = Packing.readSpans(spark, tmp)
        .orderBy("doc_id").select("doc_id", "start", "end")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == Seq((1L, 0L, 4L), (2L, 4L, 10L), (3L, 10L, 12L),
        (4L, 12L, 17L)))
    } finally graft.queries.Rm.rf(tmp)
  }

  test("pairPack: non-fitting pair separates with truncation; odd singleton") {
    // lens: 4,6,20 (budget 8) → pack1 = (4,20): 24 > 8 → two seqs,
    // waste = 2*8 - (4 + min(20,8)) = 16 - 12 = 4; pack2 = {6} fits,
    // waste 2
    val df = Seq((1L, 20L), (2L, 4L), (3L, 6L)).toDF("doc_id", "len")
    val got = Packing.pairPack(df, "doc_id", "len", 8L)
      .select("pack_id", "n_docs", "content", "fits", "n_seqs", "waste")
      .as[(Long, Long, Long, Boolean, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 24L, false, 2L, 4L), (2L, 1L, 6L, true, 1L, 2L)))
  }
}
