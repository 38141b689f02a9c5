package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE vocabulary TRAINING (Sennrich, Haddow & Birch, ACL 2016) — the
  * learn-the-tokenizer-from-the-corpus pass (d25 applies a BPE-ish
  * segmentation; this learns the merge table itself).
  *
  * Classic formulation: train on word TYPES weighted by corpus
  * frequency. The corpus is touched exactly once (the word count);
  * every merge round after that runs on the VOCABULARY-sized symbol
  * table — at 100 TB the corpus scan is the only corpus-scale stage,
  * and the loop's working set is bounded by distinct words.
  *
  * Symbol sequences are DOUBLE-space-joined strings, and a merge
  * round applies the winning pair (A,B) with one literal `replace`
  * of `' A  B '` by `' AB '` over `'  '+s+'  '`. The delimiter
  * doubling is what makes string replace EXACTLY BPE's greedy: each
  * match consumes one of the two spaces on either side and the
  * replacement restores it, so consecutive disjoint occurrences
  * ("a b a b" with A≠B) all fuse, while overlapping self-pair runs
  * ("a a a a a" with A==B) fuse at the odd positions only —
  * left-to-right non-overlapping, which is Sennrich's merge order.
  * (With single spaces the shared delimiter is consumed and every
  * other disjoint occurrence is silently skipped — caught by the
  * reference-implementation spec, kept here as a warning.) The same
  * builtin exists in DuckDB with the same scan semantics, so the
  * oracle replays training exactly. Word-internal merges only (no
  * end-of-word marker — documented divergence from the reference
  * implementation's `</w>`; the marker is a constant extra symbol,
  * not a structural change).
  *
  * Per round: one vocab-sized pair explode + hash agg, ONE driver
  * scalar (the argmax pair — ties broken count DESC then pair ASC so
  * training is deterministic), one vocab-sized replace. Driver state
  * is the merge table itself — `nMerges` rows. */
object BpeTrain {

  /** Learn `nMerges` merges; returns `(step, pair, n)` — the merge
    * table in training order with each pair's corpus-weighted count. */
  def train(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    var cur = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(concat_ws("  ",
        array_remove(split(col("w"), ""), "")).as("s"), col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      // single-symbol words carry no pairs; Spark's sequence(1, 0)
      // would DESCEND, so filter rather than rely on an empty range
      val top = cur
        .select(col("cnt"), split(col("s"), "  ").as("l"))
        .filter(size(col("l")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("l")) - 1),
          k => concat(element_at(col("l"), k), lit(" "),
            element_at(col("l"), k + 1)))).as("p"))
        .groupBy("p").agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("p").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val p = top(0).getString(0)
        merges += ((step, p, top(0).getLong(1)))
        val Array(a, b) = p.split(" ", 2)
        cur = cur.select(trim(replace(
            concat(lit("  "), col("s"), lit("  ")),
            lit(" " + a + "  " + b + " "),
            lit(" " + a + b + " "))).as("s"), col("cnt"))
          .localCheckpoint()
        step += 1
      }
    }
    merges.toSeq.toDF("step", "pair", "n")
  }

  /** BATCHED BPE training — the driver-round-trip economics fix
    * (VERDICT r09 #6): [[train]] pays one Spark job per merge, so a
    * real 32k vocabulary means 32k jobs. This variant learns MANY
    * merges per round: rank all pairs by (count DESC, pair ASC), keep
    * the top-`batchSize` window, GREEDILY admit the maximal
    * rank-order prefix-respecting disjoint subset — scanning the
    * window in rank order, a pair is admitted iff none of its three
    * symbols {a, b, a·b} appears among the symbols of the pairs
    * ALREADY ADMITTED this round — and apply the admitted merges in
    * one chained-replace pass. Any two admitted pairs are disjoint on
    * inputs AND merge results (the later one was checked against the
    * earlier's symbols), so the batch's replaces commute and the
    * single pass is order-insensitive; the result-symbol check also
    * excludes a same-round chain like (a,b)+(ab,c), whose outcome
    * would depend on application order. Greedy-vs-admitted (rather
    * than the stricter reject-on-any-higher-ranked-conflict) matters
    * on hot small alphabets: character-level rounds concentrate the
    * top of the ranking on a few symbols, and the strict rule admits
    * ~4 pairs/round where greedy admits ~batch-limited dozens. The
    * selection is sequential but window-sized (driver-side over
    * ≤ batchSize rows), and a SQL oracle replays it exactly as a
    * linear recursive CTE carrying the admitted-symbol set.
    *
    * Documented divergence from Sennrich's exact order (which [[train]]
    * preserves and d80 gates): pairs after a round's first are chosen
    * by PRE-round counts, where the exact algorithm would recount
    * after each merge — adjacent merges (e.g. "a b c": merging (a,b)
    * consumes occurrences of (b,c)) can therefore rank differently.
    * `batchSize = 1` degenerates to [[train]]'s exact order (one
    * dominant pair per round, counts exact at every step).
    *
    * Runs a fixed `nRounds` rounds (stopping early only when no pairs
    * remain); returns `(step, round, pair, n)` — global training
    * order, the round that admitted the pair, and the pair's
    * PRE-round corpus-weighted count. */
  /** Tracked eager localCheckpoint: returns the pinned frame plus the
    * storage-block RDD ids the checkpoint created, so a training loop
    * can RELEASE superseded rounds' blocks. Without this, a long run
    * (the 400-round scale arm) accumulates every round's checkpoint
    * blocks until the driver heap fills and GC pauses kill the RPC
    * layer — blocks are attributed by getPersistentRDDs delta, valid
    * because the checkpoint is synchronous and the loop is
    * single-threaded. */
  private def ckptTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = df.localCheckpoint()
    (out, sc.getPersistentRDDs.keySet.toSet -- before)
  }

  private def release(s: org.apache.spark.sql.SparkSession,
                      ids: Set[Int]): Unit = {
    val live = s.sparkContext.getPersistentRDDs
    ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
  }

  def trainBatched(docs: DataFrame, textCol: String, nRounds: Int,
                   batchSize: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    var (cur, curIds) = ckptTracked(docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(concat_ws("  ",
        array_remove(split(col("w"), ""), "")).as("s"), col("cnt")))
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, String, Long)]
    var round = 1
    var step = 1L
    var exhausted = false
    while (round <= nRounds && !exhausted) {
      val window = cur
        .select(col("cnt"), split(col("s"), "  ").as("l"))
        .filter(size(col("l")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("l")) - 1),
          k => concat(element_at(col("l"), k), lit(" "),
            element_at(col("l"), k + 1)))).as("p"))
        .groupBy("p").agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("p").asc)
        .limit(batchSize)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      if (window.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val admitted = window.filter { case (p, _) =>
          val Array(a, b) = p.split(" ", 2)
          val syms = Seq(a, b, a + b)
          if (syms.exists(used)) false
          else { used ++= syms; true }
        }
        admitted.foreach { case (p, n) =>
          merges += ((step, round.toLong, p, n)); step += 1
        }
        val applied = admitted.foldLeft(
            concat(lit("  "), col("s"), lit("  ")): org.apache.spark.sql.Column) {
          case (acc, (p, _)) =>
            val Array(a, b) = p.split(" ", 2)
            replace(acc, lit(" " + a + "  " + b + " "),
              lit(" " + a + b + " "))
        }
        val (nc, ncIds) = ckptTracked(
          cur.select(trim(applied).as("s"), col("cnt")))
        release(s, curIds)
        cur = nc; curIds = ncIds
        round += 1
      }
    }
    merges.toSeq.toDF("step", "round", "pair", "n")
  }

  /** INCREMENTAL batched BPE training — FastBPE's delta-update idea
    * (VERDICT r10 #7) on top of [[trainBatched]]'s round structure:
    * instead of re-running the vocabulary-sized pair explode + hash
    * aggregation every round, the pair-count table is MAINTAINED.
    * Only words whose symbol string contains an admitted pair's
    * `' a  b '` pattern can change any count (an admitted replace
    * no-ops everywhere else, and a round's admitted pairs are
    * symbol-disjoint including results, so no replace can create or
    * destroy another admitted pair's occurrences); each round
    * subtracts the TOUCHED words' pre-merge pairs, adds their
    * post-merge pairs, and folds the delta into the count table. The
    * expensive per-round stage — the pair explode — therefore scales
    * with touched words, not vocabulary (the full-vocab work left is
    * a cheap `contains` filter scan and the window's TakeOrdered over
    * the maintained counts). As training converges, merges become
    * rare and rounds get CHEAPER — the property the `bpe` scale arm
    * measures at 5k+ merges.
    *
    * Round 16 (VERDICT r15 #5): the delta machinery only pays for
    * itself past a DEPTH CROSSOVER — shallow hot rounds touch most of
    * the vocabulary, so maintaining the table costs ~2.3× a plain
    * recount (SCALE round-15: 52.3 vs 23.0 s over 60 rounds at 60k
    * types) while converged rounds win decisively. Each round now
    * AUTO-SWITCHES on a free signal (the admitted window's
    * corpus-weighted mass over the constant word-instance mass — an
    * upper bound on the touched fraction, already on the driver):
    * above `recountThreshold` the round runs [[trainBatched]]'s full
    * recount body, below it the delta body, materializing the
    * maintained table once per recount→delta transition.
    *
    * Round 17 (VERDICT r16 #2): the signal is the PROBE trigger, not
    * the commitment — the r17 calibration run showed the static
    * threshold picking the losing arm for 32 of 60 rounds (auto
    * 41.0 s vs recount 20.7 s), because the crossover also depends
    * on the corpus-size-dependent ratio of the delta arm's fixed
    * per-round floor to the vocab-sized recount, which no touched
    * fraction can see. Each delta streak is therefore judged by its
    * measured steady per-round wall against the recount rounds' EMA
    * and abandoned (threshold ÷ 8, geometric so probes are bounded)
    * if it is not winning.
    *
    * Round 18 (VERDICT r17 #2): a probe costs two rounds — the
    * transition round plus ONE steady round, which alone decides the
    * streak — and probes are skipped entirely while the minimum
    * steady delta wall observed this run (the arm's fixed floor)
    * exceeds the recount EMA, since even delta's best round then
    * loses by construction. The gate self-releases when recount cost
    * rises (bigger corpus / deeper symbols) above the floor. A probe
    * is also never STARTED with fewer than ~16 rounds left: the
    * transition's table build costs 3-10 recount rounds and a
    * winning arm repays at most ~one recount round per round, so a
    * late probe is unrepayable by construction. Both
    * arms produce identical windows and identical replaces, so the
    * merge table stays bit-identical regardless of where the switch
    * or the wall feedback lands.
    *
    * Output is bit-identical to [[trainBatched]] (same window, same
    * greedy admission, same replaces — spec-gated on randomized
    * corpora), so d92's DuckDB oracle gates this path unchanged.
    * `onRound` observes `(round, touchedWords, admittedPairs)` for
    * the scale probe. It is an Option, not a defaulted no-op lambda:
    * the touched-word count is an EXTRA Spark action per round, and
    * the gated d92 path must not pay one job per round for a metric
    * nobody reads (in recount-arm rounds the count exists ONLY for
    * the observer). `onArm` observes `(round, usedDelta, signal)` —
    * the switch's decision trace for the scale arm. */
  def trainIncremental(docs: DataFrame, textCol: String, nRounds: Int,
                       batchSize: Int,
                       onRound: Option[(Int, Long, Int) => Unit] = None,
                       maxMerges: Int = Int.MaxValue,
                       recountThreshold: Double = 0.05,
                       onArm: Option[(Int, Boolean, Double) => Unit] = None)
      : DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    def pairsOf(df: DataFrame): DataFrame = df
      .select(col("cnt"), split(col("s"), "  ").as("l"))
      .filter(size(col("l")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("l")) - 1),
        k => concat(element_at(col("l"), k), lit(" "),
          element_at(col("l"), k + 1)))).as("p"))
      .groupBy("p").agg(sum("cnt").as("n"))
    var (cur, curIds) = ckptTracked(docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(concat_ws("  ",
        array_remove(split(col("w"), ""), "")).as("s"), col("cnt")))
    // Word-instance mass is invariant under merges (replaces change
    // spellings, never rows or cnt) — ONE extra action for the whole
    // run, the denominator of the per-round arm signal below.
    val totalMass = math.max(1L,
      cur.agg(sum("cnt")).head().getLong(0)).toDouble
    // The maintained pair-count table exists only while in DELTA mode
    // (VERDICT r15 #5 — the depth-crossover switch): at shallow depth
    // the delta machinery's fixed cost (4 checkpoints + two touched
    // pair explodes + the fold) exceeds a plain full recount because
    // hot early pairs touch most of the vocabulary (SCALE round-15:
    // 52.3 s incremental vs 23.0 s recount over 60 shallow rounds at
    // 60k types); past the crossover touched words collapse and the
    // delta wins decisively. The signal is FREE: the admitted
    // window's corpus-weighted mass (already on the driver) over the
    // constant instance mass upper-bounds the touched fraction, so
    // rounds with signal above `recountThreshold` run trainBatched's
    // body (no table maintained) and rounds below it run the delta
    // body (materializing the table once on each recount→delta
    // transition).
    var pairCountsOpt: Option[(DataFrame, Set[Int])] = None
    // Round 17 (VERDICT r16 #2 — the calibration run): the touched-
    // fraction signal alone CANNOT place the crossover, because the
    // delta arm's per-round FLOOR (4 checkpoints + two touched
    // explodes + the fold, ~1 s here) competes with a recount whose
    // cost is VOCAB-sized, not corpus-sized — at 60k types a full
    // recount round costs ~0.35 s, so the floor loses at every
    // depth (measured r17: over the 60-round identity window,
    // recount 20.7 s vs pure delta 53.1 s vs signal-only auto at
    // 0.05 = 41.0 s — the static threshold picked the losing arm for
    // 32 rounds). The threshold is therefore only the PROBE trigger;
    // the commitment is WALL-FEEDBACK: on each delta streak, compare
    // the streak's steady per-round wall (transition round excluded —
    // its table build amortizes) against the recount rounds' EMA,
    // and if delta is not winning after `DeltaProbeRounds`, fall
    // back to recount and divide the effective threshold by 8 so the
    // next probe happens only materially deeper. Probes are bounded
    // (geometric threshold decay) and arms are output-identical, so
    // the feedback changes cost, never the merge table.
    //
    // Round 18 (VERDICT r17 #2 — trim the probe floor): a probe now
    // costs TWO rounds, not four — the transition round (table build,
    // already excluded from the feedback) plus ONE steady round,
    // whose wall alone decides the streak. And probes are SKIPPED
    // outright while the delta arm's observed FLOOR (the minimum
    // steady delta wall seen this run — a lower bound on any delta
    // round, since a steady round pays the fixed 4-checkpoint +
    // 2-explode cost before any touched work) exceeds the recount
    // EMA: when even delta's best-ever round loses to an average
    // recount, re-measuring is pure waste. The floor gate
    // self-releases where delta can genuinely win — recount cost
    // grows with corpus/symbol scale, so recountEma rises above the
    // floor exactly in the regime the delta machinery exists for.
    // A probe is an INVESTMENT: its transition round pays a full
    // pair-table build (measured 3-10x a recount round at shallow
    // depth) and a winning delta arm repays at most ~recountEma per
    // round (it cannot win more than the recount costs). With fewer
    // than this many rounds left, even a FREE delta arm cannot repay
    // the build — starting a probe there is pure loss (the r18
    // identity-depth run measured one late probe costing 5.3 s over
    // recount with 3 rounds left to amortize it). Continuing an
    // already-running streak is not a probe start and stays ungated.
    val ProbeMinRemainingRounds = 16
    val DeltaProbeRounds = 1
    var effThresh = recountThreshold
    var recountEma = -1.0
    var deltaEma = -1.0
    var deltaFloorEst = -1.0
    var deltaStreak = 0
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, String, Long)]
    var round = 1
    var step = 1L
    var exhausted = false
    // `maxMerges` is the vocab-size stop a production tokenizer run
    // uses (nRounds alone cannot target a merge count — admission
    // per round varies with symbol diversity); the final round may
    // overshoot by at most one window's admissions.
    while (round <= nRounds && !exhausted && merges.length < maxMerges) {
      // window from the maintained table (delta mode) or a full
      // recount (recount mode) — identical contents either way, the
      // incremental-equals-recount invariant the spec gates.
      // The round timer starts BEFORE the window read: in recount
      // mode the window IS the full pairsOf explode — the recount
      // arm's defining cost — so starting the clock after it would
      // understate recountEma and make the wall feedback abandon a
      // genuinely-winning delta arm on corpora where the explode
      // dominates (r17 review). The observer's touched-count job
      // lands inside both arms' windows symmetrically.
      val roundT0 = System.nanoTime()
      val window = pairCountsOpt.map(_._1).getOrElse(pairsOf(cur))
        .orderBy(col("n").desc, col("p").asc)
        .limit(batchSize)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      // arm-work clock: starts AFTER the window read. The shadow
      // floor below must estimate a STEADY delta round, whose window
      // comes from the cheap maintained table — a shadow round's own
      // window was the full explode (it runs tableless), and charging
      // that to the floor would fail every shadow by construction.
      val armT0 = System.nanoTime()
      if (window.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val admitted = window.filter { case (p, _) =>
          val Array(a, b) = p.split(" ", 2)
          val syms = Seq(a, b, a + b)
          if (syms.exists(used)) false
          else { used ++= syms; true }
        }
        admitted.foreach { case (p, n) =>
          merges += ((step, round.toLong, p, n)); step += 1
        }
        val padded = concat(lit("  "), col("s"), lit("  "))
        val touchedPred = admitted.map { case (p, _) =>
          val Array(a, b) = p.split(" ", 2)
          padded.contains(lit(" " + a + "  " + b + " "))
        }.reduce(_ || _)
        val applied = admitted.foldLeft(
            concat(lit("  "), col("s"), lit("  "))
              : org.apache.spark.sql.Column) {
          case (acc, (p, _)) =>
            val Array(a, b) = p.split(" ", 2)
            replace(acc, lit(" " + a + "  " + b + " "),
              lit(" " + a + b + " "))
        }
        val signal = admitted.map(_._2).sum.toDouble / totalMass
        // floor gate (r18): don't probe while delta's best observed
        // steady round already loses to the average recount round
        val floorBlocks = deltaFloorEst > 0 && recountEma > 0 &&
          deltaFloorEst >= recountEma
        // investment gate (r18): don't START a probe the remaining
        // rounds cannot repay; a running streak continues ungated
        val tooLateToProbe = pairCountsOpt.isEmpty &&
          (nRounds - round) < ProbeMinRemainingRounds
        val useDelta = signal <= effThresh && !floorBlocks &&
          !tooLateToProbe
        onArm.foreach(f => f(round, useDelta, signal))
        if (!useDelta) {
          // RECOUNT round — trainBatched's body verbatim: one full
          // replace, no maintained table (dropped if one existed).
          pairCountsOpt.foreach { case (_, ids) => release(s, ids) }
          pairCountsOpt = None
          deltaStreak = 0; deltaEma = -1.0
          // the observer pays the touched-count job only if watching
          onRound.foreach(f =>
            f(round, cur.filter(touchedPred).count(), admitted.length))
          // ckptTracked's localCheckpoint is EAGER, so the round's
          // work lands inside this timed window
          val (nc, ncIds) = ckptTracked(
            cur.select(trim(applied).as("s"), col("cnt")))
          release(s, curIds)
          cur = nc; curIds = ncIds
          val w = (System.nanoTime() - roundT0) / 1e9
          recountEma = if (recountEma < 0) w else 0.5 * recountEma + 0.5 * w
        } else {
          // DELTA round. On what would be the transition, run the
          // SHADOW-FLOOR probe first (r18 — "the signal-estimated
          // delta floor", realized by measurement): the touched
          // filter, replace, and reassembly checkpoints are a
          // measured LOWER BOUND on a steady delta round (the real
          // round adds the vocab-pair table fold + its checkpoint) —
          // and their outputs ARE a valid round result (assembled
          // delta ≡ the recount's full replace, the maintained-table
          // invariant the identity spec gates). So the floor is
          // measured BEFORE committing to the table build: a
          // hopeless shadow costs ~two extra checkpoints ONCE
          // (vs the old transition's full pair explode + table
          // checkpoint, 3-10 recount rounds at shallow depth); a
          // promising one converts in place into the transition.
          val isTransition = pairCountsOpt.isEmpty
          val (touched, tIds) = ckptTracked(cur.filter(touchedPred))
          val (replaced, rIds) = ckptTracked(
            touched.select(trim(applied).as("s"), col("cnt")))
          onRound.foreach(f => f(round, touched.count(), admitted.length))
          // coalesce BEFORE the checkpoint: union adds the two sides'
          // partition counts and localCheckpoint pins whatever it gets,
          // so without the bound the vocab table's partitions DOUBLE
          // per round — measured: 16 -> 1024 by round 8, 4096 by round
          // 10, per-round wall 1.2 s -> 11 s on pure task-scheduling
          // overhead (pairCounts is safe — its groupBy re-partitions to
          // the shuffle setting every round)
          val (nc, ncIds) = ckptTracked(
            cur.filter(!touchedPred).unionByName(replaced)
              .coalesce(s.sparkContext.defaultParallelism))
          if (isTransition) {
            val shadowFloor = (System.nanoTime() - armT0) / 1e9
            if (recountEma > 0 && shadowFloor >= recountEma) {
              // hopeless: even the tableless lower bound loses to an
              // average recount round — keep this round's (identical)
              // output, skip the table build entirely, and decay the
              // threshold below the current signal so the next shadow
              // fires only materially deeper (the failed-probe
              // discipline, at a fraction of its cost)
              release(s, curIds ++ tIds ++ rIds)
              cur = nc; curIds = ncIds
              effThresh = math.min(effThresh, signal) / 8.0
            } else {
              // promising: build the maintained table FROM THE NEW
              // STATE (pairsOf(new) ≡ fold(pairsOf(old), delta) — the
              // maintained invariant) and enter the streak; this
              // round is the transition, excluded from the feedback
              val (npc, npcIds) = ckptTracked(pairsOf(nc))
              release(s, curIds ++ tIds ++ rIds)
              cur = nc; curIds = ncIds
              pairCountsOpt = Some((npc, npcIds))
              deltaStreak = 0; deltaEma = -1.0
            }
          } else {
            val (pairCounts, pcIds) = pairCountsOpt.get
            // fold the touched delta into the maintained count table
            val (npc, npcIds) = ckptTracked(pairCounts
              .unionByName(pairsOf(touched).select(col("p"),
                (-col("n")).as("n")))
              .unionByName(pairsOf(replaced))
              .groupBy("p").agg(sum("n").as("n"))
              .filter(col("n") > 0))
            // the new checkpoints are materialized — everything this
            // round superseded (old cur/pairCounts, the round-local
            // touched/replaced) releases now
            release(s, curIds ++ pcIds ++ tIds ++ rIds)
            cur = nc; curIds = ncIds
            pairCountsOpt = Some((npc, npcIds))
            // wall feedback: steady delta rounds only
            val w = (System.nanoTime() - roundT0) / 1e9
            deltaEma = if (deltaEma < 0) w else 0.5 * deltaEma + 0.5 * w
            // the floor estimate: min steady delta wall this run — a
            // lower bound on what any future delta round can cost at
            // this corpus scale (fixed checkpoint/explode cost before
            // any touched work), feeding the probe-skip gate above
            deltaFloorEst =
              if (deltaFloorEst < 0) w else math.min(deltaFloorEst, w)
            deltaStreak += 1
            if (deltaStreak >= DeltaProbeRounds && recountEma > 0 &&
                deltaEma > recountEma) {
              // the probe lost: this corpus's recount is cheaper than
              // the delta floor at the current depth — force the fall
              // back by dropping the threshold BELOW the current
              // signal (÷8 of the threshold alone could still sit
              // above a deeply-converged signal and strand the run on
              // the losing arm — r17 review), so the next round runs
              // recount (dropping the table) and the next probe fires
              // only once the signal falls another 8× from here
              effThresh = math.min(effThresh, signal) / 8.0
              deltaStreak = 0; deltaEma = -1.0
            }
          }
        }
        round += 1
      }
    }
    merges.toSeq.toDF("step", "round", "pair", "n")
  }

  /** APPLY a learned merge table: segment every word type by
    * replaying the merges in training order (inference = the same
    * greedy replace as training — BPE's defining property), then
    * count tokens per document by joining word instances back to
    * their type's segmentation. The merge table is a bounded driver
    * artifact (`nMerges` strings); the corpus is touched twice (word
    * instances, join-back) and the replay runs on word TYPES.
    * Returns `(doc_id, n_tokens)` — post-BPE token counts. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[String]): DataFrame = {
    val words = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
    var seg = words.select(col("w")).distinct()
      .select(col("w"), concat_ws("  ",
        array_remove(split(col("w"), ""), "")).as("s"))
    merges.foreach { p =>
      val Array(a, b) = p.split(" ", 2)
      seg = seg.select(col("w"), trim(replace(
        concat(lit("  "), col("s"), lit("  ")),
        lit(" " + a + "  " + b + " "),
        lit(" " + a + b + " "))).as("s"))
    }
    words.join(seg.select(col("w"),
        size(split(col("s"), "  ")).cast("long").as("toks")), "w")
      .groupBy(idCol).agg(sum("toks").as("n_tokens"))
  }
}
