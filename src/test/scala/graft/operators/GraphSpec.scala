package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

/** Graph analytics (d52/d53 back-ends): edge derivation from the gram
  * inverted index, PageRank on hand-checkable graphs, and oriented
  * triangle counting — each against values derivable on paper.
  */
class GraphSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark

  private def edgesOf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("da", "db")
  }

  describe("sharedGramEdges") {
    it("links exactly the documents sharing a distinct 3-gram") {
      import spark.implicits._
      val docs = Seq(
        (1L, "a b c d"),     // grams: "a b c", "b c d"
        (2L, "b c d e"),     // shares "b c d" with 1
        (3L, "x y z w"),     // no shared gram
        (4L, "a b c q")      // shares "a b c" with 1
      ).toDF("doc_id", "text")
      val e = Graph.sharedGramEdges(docs, "doc_id", "text")
        .orderBy("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(e.toSeq == Seq((1L, 2L), (1L, 4L)))
    }

    it("drops grams above the document-frequency cap") {
      import spark.implicits._
      // "t t t" appears in all 3 docs; cap 2 removes it -> no edges.
      val docs = Seq((1L, "t t t"), (2L, "t t t"), (3L, "t t t"))
        .toDF("doc_id", "text")
      assert(Graph.sharedGramEdges(docs, "doc_id", "text", maxDf = 2)
        .count() == 0)
      assert(Graph.sharedGramEdges(docs, "doc_id", "text", maxDf = 3)
        .count() == 3)
    }
  }

  describe("pageRank") {
    it("is uniform on a symmetric cycle") {
      // 3-cycle: every node has identical degree -> rank stays 1/3.
      val pr = Graph.pageRank(
        Graph.symmetrize(edgesOf((1L, 2L), (2L, 3L), (1L, 3L))), iters = 3)
        .collect().map(r => r.getDouble(1))
      pr.foreach(r => assert(math.abs(r - 1.0 / 3.0) < 1e-12))
    }

    it("ranks the hub of a star above the leaves and sums to ~1") {
      val star = Graph.symmetrize(
        edgesOf((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
      val pr = Graph.pageRank(star, iters = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(pr(1L) > pr(2L))
      assert(math.abs(pr(2L) - pr(5L)) < 1e-12) // leaves symmetric
      assert(math.abs(pr.values.sum - 1.0) < 1e-9)
      // Reference power iteration (same arithmetic, closed over the
      // star's two node classes: hub deg 4, leaves deg 1).
      var (hub, leaf) = (0.2, 0.2)
      for (_ <- 1 to 3) {
        val nh = (1.0 - 0.85) / 5.0 + 0.85 * 4 * leaf
        val nl = (1.0 - 0.85) / 5.0 + 0.85 * hub / 4
        hub = nh; leaf = nl
      }
      assert(math.abs(pr(1L) - hub) < 1e-12)
      assert(math.abs(pr(2L) - leaf) < 1e-12)
    }
  }

  describe("triangles / clustering") {
    it("finds the unique triangle of a triangle-plus-tail graph") {
      val canon = edgesOf((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      val tri = Graph.triangles(canon).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(tri.toSeq == Seq((1L, 2L, 3L)))
      val cc = Graph.clustering(canon).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(cc.toSeq == Seq(
        (1L, 2L, 1L, 1.0),        // deg 2, in 1 triangle: 2*1/(2*1)
        (2L, 2L, 1L, 1.0),
        (3L, 3L, 1L, 1.0 / 3.0),  // deg 3: 2*1/(3*2)
        (4L, 1L, 0L, 0.0)))       // tail: degree 1, coefficient 0
    }

    it("propagates clamped seed labels one hop per round, ties to min") {
      import spark.implicits._
      // Path 1-2-3-4-5, seeds: 1->"a", 5->"b". Round 1 labels 2 and 4;
      // round 2 reaches 3 with a 1-1 tie -> lexicographic min "a".
      val path = Graph.symmetrize(
        edgesOf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
      val seeds = Seq((1L, "a"), (5L, "b")).toDF("id", "lab")
      val out = Graph.labelPropagation(path, seeds, rounds = 2)
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(out == Map(
        1L -> Some("a"), 2L -> Some("a"), 3L -> Some("a"),
        4L -> Some("b"), 5L -> Some("b")))
      // One round only: the middle node is still unlabeled.
      val one = Graph.labelPropagation(path, seeds, rounds = 1)
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(one(3L).isEmpty && one(2L).contains("a") && one(4L).contains("b"))
    }

    it("counts each K4 triangle exactly once despite equal degrees") {
      val k4 = edgesOf(
        (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      assert(Graph.triangles(k4).count() == 4) // C(4,3)
    }
  }

  describe("bfsDistance") {
    it("computes exact min hop distances (shortcut beats the path)") {
      import spark.implicits._
      // path 1-2-3-4-5 plus shortcut 1-4: node 4 is 1 hop, 5 is 2
      val e = Graph.symmetrize(edgesOf(
        (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L)))
      val d = Graph.bfsDistance(e, Seq(1L).toDF("id"), maxDepth = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(d == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L,
        5L -> 2L))
    }
    it("maxDepth bounds the reach") {
      import spark.implicits._
      val e = Graph.symmetrize(edgesOf((1L, 2L), (2L, 3L)))
      val d = Graph.bfsDistance(e, Seq(1L).toDF("id"), maxDepth = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(d == Map(1L -> 0L, 2L -> 1L))
    }
    it("a whale frontier falls back to the shuffle join (adaptive " +
        "switch) with identical results — the seed set that would " +
        "have OOM'd an unconditional broadcast") {
      import spark.implicits._
      // a 2k-node star forest: seeding EVERY node makes round-1's
      // frontier the whole graph; maxBroadcastRows = 0 forces the
      // shuffle path that seed set needs at scale
      val e = Graph.symmetrize(
        (0L until 2000L).map(i => (i, 2000L + i % 7)).toDF("da", "db"))
      val seeds = (0L until 2000L).toDF("id")
      val shuffled = Graph
        .bfsDistance(e, seeds, maxDepth = 2, maxBroadcastRows = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val auto = Graph.bfsDistance(e, seeds, maxDepth = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(shuffled == auto && shuffled.size == 2007)
    }
  }

  describe("hashWalks") {
    it("follows the only edge and holds position at dead ends") {
      import spark.implicits._
      val e = Seq((2L, 3L)).toDF("src", "dst") // directed; 3, 7 dead
      val w = Graph.hashWalks(e, Seq(2L, 7L).toDF("id"), len = 3)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(w == Map(2L -> ((3L, 3L, 3L)), 7L -> ((7L, 7L, 7L))))
    }
    it("hop choice is the min-md5 neighbor (independently recomputed)") {
      import spark.implicits._
      val e = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
      def h(s: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val expected1 = if (h("1:1:2") < h("1:1:3")) 2L else 3L
      val got = Graph.hashWalks(e, Seq(1L).toDF("id"), len = 1)
        .head().getLong(1)
      assert(got == expected1)
    }
    it("a whale walker set falls back to the shuffle join with " +
        "identical walks") {
      import spark.implicits._
      val e = (0L until 500L).map(i => (i, (i + 1) % 500L))
        .toDF("src", "dst")
      val starts = (0L until 500L).toDF("id")
      val shuffled = Graph
        .hashWalks(e, starts, len = 2, maxBroadcastRows = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      val auto = Graph.hashWalks(e, starts, len = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(shuffled == auto && shuffled.size == 500)
    }
  }
}
