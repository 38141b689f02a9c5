package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: exact dedup is a hash shuffle on the dedup key (never a
  * sort); near-dup is MinHash + banded LSH — candidate pairs come from a
  * shuffle join on (band, signature) bucket keys, so cost is
  * O(docs × perms) + O(pairs within buckets), never the all-pairs cross
  * join. SimHash and n-gram Jaccard are per-row expressions + bucketed
  * joins with the same property.
  *
  * Hashing uses md5 (engine-portable, deterministic); permutation `j` is
  * simulated by salting the hash input with `j` and taking the
  * lexicographic min — equivalent to a random permutation family for LSH
  * purposes and exactly reproducible in the DuckDB oracle.
  */
object Dedup {

  /** Exact dedup: keep one row per key set. Plain hash shuffle; which
    * row survives is arbitrary (fine for counts/sets). */
  def exact(df: DataFrame, cols: String*): DataFrame = df.dropDuplicates(cols)

  /** Exact dedup with a deterministic keep rule: for each key, keep the
    * row minimizing `order` (e.g. smallest doc_id — "first seen" in a
    * corpus with monotonic ids). One hash aggregation via min_by, no
    * window sort. */
  def exactKeepMin(df: DataFrame, key: Column, order: Column): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(key.as("_k"))
      .agg(min_by(struct(cols.map(col): _*), order).as("_row"))
      .select(cols.map(c => col(s"_row.$c").as(c)): _*)
  }

  /** Word n-gram shingles of a token array (n=3); empty array when the
    * doc has fewer than n tokens (sequence() would otherwise count DOWN
    * for a negative span and crash element_at). The token array is
    * let-bound so it is computed once per row (see [[ExprLet]]). */
  def shingles(toks: Column, n: Int = 3): Column =
    ExprLet.let(toks) { ts =>
      when(size(ts) >= n,
        transform(
          sequence(lit(0), size(ts) - n),
          i => concat_ws(" ", (0 until n).map(k => element_at(ts, i + k + 1)): _*)))
        .otherwise(array())
    }

  /** MinHash signature value for permutation `j`: min md5 over salted
    * shingles (lexicographic min of hex strings). */
  def minhash(sh: Column, j: Int): Column =
    array_min(transform(sh, x => md5(concat(lit(s"${j}_"), x))))

  /** Universal-hash family modulus/coefficients for the integer MinHash
    * (portable exact arithmetic — reproducible in the SQL oracle). */
  val HashP = 1000003L
  val HashA = Vector(911L, 3571L, 181081L, 777767L)
  val HashB = Vector(17L, 271L, 5261L, 99991L)

  /** The engine-portable 60-bit string hash every text-hashing operator
    * builds on: first 15 md5 hex chars as an integer. ONE definition —
    * the SQL oracles mirror it as `('0x' || substr(md5(x),1,15))::BIGINT`,
    * so a width/prefix change must happen here and there together. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Integer MinHash signatures: each shingle is md5'd ONCE into a 60-bit
    * int, then each permutation is a cheap `(a_j*h + b_j) mod P` — 4×
    * less hashing than the salted-md5 variant; the hot path of banded
    * LSH at corpus scale. */
  def minhashIntSigs(textCol: Column, perms: Int = 4): Column =
    ExprLet.let(
      transform(shingles(TextAnalysis.tokens(textCol)),
        s => hash60(s) % HashP)) { hs =>
      // null (not an array of nulls) for shingle-less docs — same
      // contract as the native MinHashSigs expression.
      when(size(hs) > 0,
        array((0 until perms).map(j =>
          array_min(transform(hs, h => (h * HashA(j) + HashB(j)) % HashP))): _*))
        .otherwise(lit(null))
    }

  /** Long-format (doc, band) keys for banded LSH: one row per permutation
    * with its signature; docs sharing any (j, sig) are candidates. Uses
    * the native [[graft.functions.MinHashSigs]] expression (identical
    * arithmetic to [[minhashIntSigs]], ~100× faster); docs with no
    * shingles yield a null array and generate no band rows. */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
                   perms: Int = 4): DataFrame =
    df.select(
        col(idCol),
        posexplode(graft.functions.MinHashSigs(col(textCol), perms))
          .as(Seq("pos", "sig")))
      .select(col(idCol), col("pos").as("j"), col("sig"))  // posexplode is 0-based

  /** Distinct candidate near-dup pairs from band buckets: group by the
    * band key, emit in-bucket pairs — signatures are computed ONCE (a
    * self-join would re-evaluate the whole MinHash pipeline on both
    * sides) and cost stays O(Σ bucket²), never all-pairs.
    *
    * Degenerate buckets larger than `maxBucket` are DROPPED: a bucket
    * that large means a near-constant signature (boilerplate shingles),
    * its O(bucket²) pairs are garbage candidates, and materializing them
    * would OOM an executor. The two-step explode keeps per-row state at
    * O(bucket), never O(bucket²). */
  def candidatePairs(bands: DataFrame, idCol: String,
                     maxBucket: Int = 10000): DataFrame =
    bands.groupBy("j", "sig")
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      .select(col("ids"), explode(col("ids")).as("d1"))
      .select(col("d1"),
        explode(filter(col("ids"), y => y > col("d1"))).as("d2"))
      .distinct()

  /** 16-bit SimHash over whitespace tokens: per-bit majority vote of the
    * first 4 md5 hex nibbles of each token. Engine-portable integer
    * arithmetic only; the md5 array is let-bound so each token is hashed
    * once, not once per bit. */
  def simhash16(toks: Column): Column =
    ExprLet.let(transform(toks, t => md5(t))) { hs =>
      def nibble(h: Column, p: Int): Column =
        conv(substring(h, p, 1), 16, 10).cast("long")
      def bit(h: Column, b: Int): Column =
        shiftright(nibble(h, b / 4 + 1), b % 4) % 2
      (0 until 16).map { b =>
        when(aggregate(hs, lit(0L), (acc, h) => acc + bit(h, b)) * 2
               > size(hs).cast("long"),
             lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    }

  /** Distinct `(id, gram-hash)` rows for word n-grams of length `n` —
    * the long-substring dedup primitive (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL'22, at n-gram
    * granularity): two docs sharing ANY length-n token window are
    * substring duplicates. The gram is hashed to a 60-bit int before
    * the shuffle (8-byte key instead of ~n words — the shuffle volume
    * is what matters at corpus scale); both engines hash identically
    * (md5 prefix), so the ~1e-9 collision odds are portable, never a
    * cross-engine mismatch. Docs with fewer than n tokens contribute
    * no rows ([[shingles]] yields an empty array). */
  def longGramHashes(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 12): DataFrame =
    df.select(col(idCol),
        explode(shingles(TextAnalysis.tokens(col(textCol)), n)).as("gram"))
      .select(col(idCol), hash60(col("gram")).as("gh"))
      // ONE shuffle on gh serves both the dedup aggregation (gh alone
      // already co-locates every (gh, id) group) and any downstream
      // per-gram window/aggregation — a plain .distinct() would hash on
      // (gh, id) and force the gram-owner step to re-shuffle the whole
      // gram table a second time.
      .repartition(col("gh"))
      .dropDuplicates("gh", idCol)

  /** Jaccard similarity of the distinct-token sets of two documents. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Iteration count of the most recent [[connectedComponents]] run in
    * this JVM — read by the scale harness so the SCALE artifact can
    * record convergence rounds alongside wall time. Diagnostic only;
    * not part of any query result. */
  val lastCCIterations = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Connected components over an undirected edge list `(d1, d2)` — the
    * clustering step after [[candidatePairs]]: near-duplication is
    * transitive through pair chains, so every component keeps ONE
    * representative (its min id) and the rest are dropped.
    *
    * Alternating large-star / small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14). Unlike
    * label propagation — which re-shuffles the FULL edge list against
    * the label table every round — these operators rewrite the edge set
    * itself, and it contracts toward the star forest (≤ n−1 edges, one
    * star per component, rooted at the component min), so late rounds
    * touch a shrinking fraction of the original volume:
    *
    *  - large-star (over the symmetric neighborhood of each node u,
    *    m = min(u ∪ N(u))): emit (v, m) for every neighbor v > u —
    *    strictly-larger neighbors re-attach to the local min;
    *  - small-star (over the larger→smaller orientation, m = min of
    *    u's smaller neighborhood ∪ u): emit (v, m) for v ∈ N(u) ∪ {u},
    *    v ≠ m — the smaller neighborhood collapses onto its min.
    *
    * Both are ONE window shuffle each (partition-wide min, no join);
    * every edge they emit is (larger, smaller), so the directed
    * invariant is maintained for free. Convergence = the edge set IS a
    * star forest: no node is both a source and a destination and no
    * source repeats — checked with one aggregation over the round's
    * (small) output. Since components are never split and a star's
    * root is its min (all emitted edges point downward), the fixpoint
    * labels are exactly the canonical component-min labels the previous
    * label-propagation implementation produced — output-identical.
    * Each round is localCheckpoint'ed to truncate the iterative
    * lineage; `maxIter` bounds adversarial graphs (convergence is
    * O(log²·n) worst case, 3–5 rounds on LSH bucket graphs).
    *
    * Skew note (100 TB): both per-node mins are computed with
    * `groupBy(node).agg(min)` + join-back, NOT `Window.partitionBy`
    * (VERDICT r08 #2). A window must land the node's WHOLE neighborhood
    * in one task — window semantics forbid splitting the partition — so
    * in late rounds a whale star root serializes its component. The
    * groupBy combines map-side: the hot node ships ONE partial-min row
    * per upstream partition, and the join-back is a per-row lookup that
    * AQE's skew-join split can fan out across tasks (the `whale` Scale
    * probe plants a 60%-of-nodes component and measures exactly this:
    * peak single-task shuffle read 2.4 MB against a 1.2 M-node whale,
    * r09). The trade is a ~1.4x cold-time constant versus the window
    * form at 10x (extra min-exchange + join-back per round) for a
    * per-task bound that no longer depends on component shape — the
    * right side of the trade at 1000-executor scale, where one
    * serialized whale task IS the job's critical path.
    * [[candidatePairs]]' `maxBucket` cap still keeps degenerate
    * boilerplate components from forming upstream.
    *
    * Returns `(node, rep)` for every node that appears in an edge
    * (self-loop-only nodes map to themselves).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val d1 = edges.columns(0)
    val d2 = edges.columns(1)
    val raw = edges.select(col(d1).as("a0"), col(d2).as("b0"))
    // nodes whose ONLY edges are self-loops still get a (node, node) row
    // (contract parity with the label-propagation implementation).
    val selfLoops = raw.filter(col("a0") === col("b0"))
      .select(col("a0").as("node")).distinct()
    var dir = raw.filter(col("a0") =!= col("b0"))
      .select(greatest(col("a0"), col("b0")).as("a"),
              least(col("a0"), col("b0")).as("b"))
      .distinct()
      .localCheckpoint()
    // Star test: every source unique, no destination re-used as a source
    // — with the (larger, smaller) invariant this is exactly "the edge
    // set is a min-rooted star forest". One shuffle over 2|E| tiny rows.
    def isStarForest(e: DataFrame): Boolean =
      e.select(col("a").as("n"), lit(1L).as("s"), lit(0L).as("d"))
        .unionAll(e.select(col("b").as("n"), lit(0L).as("s"), lit(1L).as("d")))
        .groupBy("n").agg(sum("s").as("sc"), sum("d").as("dc"))
        .filter(col("sc") > 1 || (col("sc") > 0 && col("dc") > 0))
        .isEmpty
    var it = 0
    var converged = isStarForest(dir)
    while (it < maxIter && !converged) {
      val sym = dir.select(col("a").as("u"), col("b").as("v"))
        .unionAll(dir.select(col("b").as("u"), col("a").as("v")))
      // per-u min as a partial-aggregable groupBy + join-back (see the
      // skew note above); fresh column names per round keep the
      // self-join lineage unambiguous
      val uMin = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .toDF("u2", "mv")
      // large-star emits (v, m(u)) for every neighbor v > u — and a sym
      // row with v > u is exactly a dir row read as (v, u), so join the
      // (checkpointed) dir against uMin directly instead of shuffling
      // the twice-as-wide sym a second time
      val ls = dir.join(uMin, col("b") === col("u2"))
        .select(col("a"), least(col("b"), col("mv")).as("b"))
        // ls feeds BOTH the small-star min and its join-back; without
        // materialization the join subtree re-executes per consumer
        // (the d44 defect class — measured: +86 MB shuffle per round
        // at 10x for no wall-clock gain)
        .localCheckpoint()
      // ls may carry duplicate (a, b) rows (one per emitting center);
      // they don't change the small-star min and the round-final
      // distinct folds them — cheaper than an extra mid-round shuffle.
      val aMin = ls.groupBy("a").agg(min(col("b")).as("m")).toDF("a2", "m")
      val withM = ls.join(aMin, col("a") === col("a2"))
      val ss = withM.filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
        .unionAll(withM.select(col("a"), col("m").as("b")))
        .distinct()
      dir = ss.localCheckpoint()
      it += 1
      converged = isStarForest(dir)
    }
    lastCCIterations.set(it)
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents exhausted maxIter=$maxIter without reaching " +
          "the star-forest fixpoint; labels may not be fully transitive")
    val labels = dir.select(col("a").as("node"), col("b").as("rep"))
      .unionAll(dir.select(col("b").as("node"), col("b").as("rep")).distinct())
    if (selfLoops.isEmpty) labels
    else labels.unionAll(
      selfLoops.join(labels.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), col("node").as("rep")))
  }

  /** Incremental connected components — the nightly label-maintenance
    * shape: fold a NEW edge wave into an existing canonical-min
    * labeling without re-clustering the corpus.
    *
    * Mechanism: each new edge's endpoints are mapped through the
    * existing labels (two partitioned joins keyed on node; endpoints
    * never seen before label themselves), CONTRACTING the wave onto
    * the old component roots — so the graph [[connectedComponents]]
    * then runs on is sized by the WAVE (old roots it touches + new
    * nodes), never the corpus. Recomposition is one more join: an old
    * node re-roots iff its root was remapped by the delta; wave-new
    * nodes take their delta label directly.
    *
    * The result is exactly the full recompute's canonical-min
    * labeling (spec-swept against [[connectedComponents]] over the
    * union edge set; d77 holds it under the DuckDB gate): old roots
    * are their components' minima, so the delta's min over
    * {touched roots} ∪ {new nodes} IS the merged component's global
    * min. At 100 TB this is the difference between a nightly CC over
    * the whole pair history and one over the day's wave — the d62
    * store economics applied to cluster labels.
    *
    * `labels` is `(node, rep)` (the [[connectedComponents]] output);
    * `newEdges` is any 2-column edge frame. */
  def incrementalCC(labels: DataFrame, newEdges: DataFrame,
                    maxIter: Int = 20): DataFrame = {
    val l = labels.toDF("node", "rep")
    val e = newEdges.toDF("x", "y")
    // Every touch of the corpus-sized label table is a SCAN probed by
    // a broadcast of wave-sized state — never a shuffle of the labels
    // (the first formulation shuffled them three times and cost more
    // than the full recompute at 10x; measured, incc arm).
    val waveNodes = e.select(col("x").as("wn"))
      .unionAll(e.select(col("y").as("wn"))).distinct()
    // label lookup for the wave's nodes: one label scan, wave-sized out
    val lk = l.join(broadcast(waveNodes), col("node") === col("wn"))
      .select(col("node").as("wn"), col("rep").as("wrep"))
      .localCheckpoint()
    val contracted = e
      .join(broadcast(lk.toDF("xn", "xr")), col("x") === col("xn"),
        "left")
      .join(broadcast(lk.toDF("yn", "yr")), col("y") === col("yn"),
        "left")
      .select(coalesce(col("xr"), col("x")).as("a"),
        coalesce(col("yr"), col("y")).as("b"))
    val delta = connectedComponents(contracted, maxIter)
      .toDF("dnode", "drep")
    // only roots the wave actually re-rooted need corpus-wide remap
    val remap = delta.filter(col("dnode") =!= col("drep"))
    val updatedOld = l
      .join(broadcast(remap), col("rep") === col("dnode"), "left")
      .select(col("node"), coalesce(col("drep"), col("rep")).as("rep"))
    // wave nodes never labeled before take their delta label directly
    // (a contracted node is either an old root — already in l — or
    // exactly such a node)
    val newWaveNodes = waveNodes
      .join(broadcast(lk.select(col("wn"))), Seq("wn"), "left_anti")
    val waveNew = delta
      .join(broadcast(newWaveNodes), col("dnode") === col("wn"),
        "left_semi")
      .select(col("dnode").as("node"), col("drep").as("rep"))
    updatedOld.unionByName(waveNew)
  }
}
