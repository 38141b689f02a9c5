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

  /** Connected components over an undirected edge list `(d1, d2)` — the
    * clustering step after [[candidatePairs]]: near-duplication is
    * transitive through pair chains, so every component keeps ONE
    * representative (its min id) and the rest are dropped.
    *
    * Hash-min label propagation with pointer jumping: each round every
    * node (1) adopts the smallest label among itself and its neighbors,
    * then (2) short-circuits to its representative's representative.
    * The jump halves remaining label-chain length, so convergence is
    * O(log diameter) rounds — a 199-node chain-shaped LSH component
    * (observed in real corpus data) resolves in ~6 rounds where plain
    * propagation needs its full eccentricity. Each round is two
    * shuffles (edge join + jump self-join); convergence is detected
    * with a 1-row aggregate — labels only ever decrease, so an
    * unchanged label sum is a fixpoint — and each round is
    * localCheckpoint'ed to truncate the iterative lineage (a deep
    * round-over-round plan would otherwise blow up planning time).
    * `maxIter` bounds adversarial graphs (diameter ~2^maxIter).
    *
    * Returns `(node, rep)` for every node that appears in an edge.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val d1 = edges.columns(0)
    val d2 = edges.columns(1)
    val sym = edges.select(col(d1).as("src"), col(d2).as("dst"))
      .union(edges.select(col(d2).as("src"), col(d1).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("rep"))
      .localCheckpoint()
    def labelSum(df: DataFrame): Long =
      // coalesce: sum over ZERO rows is NULL (empty edge list — e.g. a
      // clean corpus with no candidate pairs — must yield an empty
      // result, not an NPE).
      df.agg(coalesce(sum(col("rep").cast("long")), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      // One union-of-three per round, ONE materialization:
      //   (a) my current rep, (b) each neighbor's rep, (c) pointer jump
      //   rep <- rep(rep) against the previous round's labels (the jump
      //   being one round stale does not break monotone min-convergence,
      //   and folding it here avoids a second checkpoint per round).
      val viaEdges = sym.join(labels, col("dst") === col("node"))
        .select(col("src").as("node"), col("rep"))
      val viaJump = labels
        .join(labels.toDF("rn", "rrep"), col("rep") === col("rn"))
        .select(col("node"), col("rrep").as("rep"))
      val next = labels.union(viaEdges).union(viaJump)
        .groupBy("node").agg(min("rep").as("rep"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      it += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents exhausted maxIter=$maxIter without reaching " +
          "a fixpoint; labels may not be fully transitive (raise maxIter " +
          "for graphs with diameter > ~2^maxIter)")
    labels
  }
}
