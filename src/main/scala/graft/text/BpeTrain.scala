package graft.text

import graft.functions.Bpe
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spark-native BPE TRAINING (Sennrich et al. 2016, arXiv:1508.07909)
  * — the producer of the artifact [[graft.functions.Bpe]] replays.
  * Training completes the tokenizer loop in-engine: corpus → artifact →
  * tokenizer-exact counts, with no offline tooling in the path
  * (`tools/train_bpe.py` remains as the independent reference
  * implementation; the parity spec pins this trainer to its committed
  * output byte for byte).
  *
  * Scale split — the only part of BPE training that is corpus-sized is
  * the WORD FREQUENCY table, and that is one distributed
  * `groupBy(word).count()`:
  *  - the corpus is scanned ONCE; partial aggregation collapses each
  *    partition to its distinct words map-side, so a 100 TB corpus
  *    reaches the shuffle as (distinct words × partitions) rows, not
  *    tokens;
  *  - the collected dictionary is vocabulary-sized (Heaps' law — 10⁶–
  *    10⁷ entries at web scale), and `maxWords` makes the driver bound
  *    a GUARANTEE (top-N by frequency through
  *    `TakeOrderedAndProject`, the [[graft.operators.Sampling]]
  *    exact-sample shape — per-partition heaps + driver merge, no
  *    global sort). Dropping the frequency tail barely moves merge
  *    counts: rank-r frequency ∝ 1/r (Zipf), and the classic trainers
  *    do the same;
  *  - the merge loop itself is driver-side over that bounded dict —
  *    O(nMerges × dict) with in-place pair recount, exactly the
  *    reference algorithm, deterministic ties (max frequency, then
  *    codepoint-lexicographically smallest pair). nMerges is 10⁴–10⁵
  *    in practice: minutes of driver CPU against a corpus-independent
  *    input.
  */
object BpeTrain {

  /** Distributed word-frequency table: one scan, one shuffle on the
    * word. `maxWords` caps the result at the N most frequent words
    * (ties by word, so the cap is deterministic) via per-partition
    * top-N — the driver-boundedness gate for the collect in [[train]]. */
  def wordCounts(docs: DataFrame, textCol: String,
      maxWords: Option[Int] = None): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    maxWords match {
      case Some(n) => counts.orderBy(col("freq").desc, col("word")).limit(n)
      case None    => counts
    }
  }

  /** Python-identical string ordering: by codepoint, not UTF-16 code
    * unit (Java's compareTo diverges above the BMP). */
  private[text] def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** The driver merge loop over a (word → freq) dictionary: at each of
    * `nMerges` steps the most frequent adjacent symbol pair (ties:
    * codepoint-lexicographically smallest) merges across every word,
    * all occurrences left-to-right. Returns (merges in rank order,
    * vocab = sorted base codepoints, then `</w>`, then merge outputs in
    * rank order) — the exact artifact format [[Bpe.artifact]] loads. */
  def trainFromCounts(words: Map[String, Long],
      nMerges: Int): (Seq[(String, String)], Seq[String]) = {
    // word → symbol array (codepoints + end-of-word marker)
    var vocab: Map[List[String], Long] = words.groupMapReduce {
      case (w, _) =>
        val b = List.newBuilder[String]
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          b += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        b += Bpe.EndOfWord
        b.result()
    }(_._2)(_ + _)
    val pairOrd = new Ordering[(String, String)] {
      def compare(x: (String, String), y: (String, String)): Int = {
        val c = cpCompare(x._1, y._1)
        if (c != 0) c else cpCompare(x._2, y._2)
      }
    }
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- vocab; Seq(a, b) <- syms.sliding(2))
        pairs.updateWith((a, b))(v => Some(v.getOrElse(0L) + f))
      if (pairs.isEmpty) exhausted = true
      else {
        val best = pairs.toSeq.minBy { case (p, f) => (-f, p) }(
          Ordering.Tuple2(Ordering.Long, pairOrd))._1
        merges += best
        val merged = best._1 + best._2
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val out = List.newBuilder[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: tail if a == best._1 && b == best._2 =>
              out += merged; rest = tail
            case a :: tail => out += a; rest = tail
            case Nil => ()
          }
          out.result()
        }(_._2)(_ + _)
      }
      step += 1
    }
    val ms = merges.result()
    val baseChars = words.keysIterator.flatMap(w =>
        w.codePoints().toArray.map(cp => new String(Character.toChars(cp))))
      .toSeq.distinct.sortWith(cpCompare(_, _) < 0)
    (ms, baseChars ++ Seq(Bpe.EndOfWord) ++ ms.map { case (l, r) => l + r })
  }

  /** End-to-end: corpus → word counts (distributed) → merge loop
    * (driver, bounded) → (merges, vocab). */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Option[Int] = None): (Seq[(String, String)], Seq[String]) = {
    val words = wordCounts(docs, textCol, maxWords).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    trainFromCounts(words, nMerges)
  }

  /** Result of [[trainDistributedStats]]: the merge trajectory (pair +
    * corpus frequency at selection time, rank order), the vocab layout,
    * and the number of Spark ROUNDS the trajectory cost — `rounds` <
    * `merges.size` whenever multi-merge batching fired. */
  final case class DistTrainResult(merges: Seq[(String, String, Long)],
      vocab: Seq[String], rounds: Int)

  /** One round's distributed statistics, from which [[selectExactBatch]]
    * simulates as many sequential merges as are provable: the top pair
    * counts, the top adjacent-TRIPLE (3-gram of symbols) counts, and
    * whether each list was exhaustive (if not, every unseen entry is
    * bounded by the floor — the last seen count). */
  private[text] final case class RoundStats(
      pairs: IndexedSeq[(String, String, Long)], sawAllPairs: Boolean,
      triples: Map[(String, String, String), Long], sawAllTriples: Boolean,
      tripleFloor: Long)

  /** EXACT multi-merge batch selection: a driver-side simulation of the
    * sequential merge loop over one round's pair AND triple counts,
    * emitting merges for as long as each step's winner is PROVABLY the
    * true sequential winner — then stopping, so the next Spark round
    * recounts. The emitted sequence (pairs, order, frequencies) is
    * byte-identical to the one-merge-at-a-time loop; batching only
    * changes how many Spark jobs it costs.
    *
    * The machinery rests on how merging p=(a,b)→m (a≠b; left-to-right,
    * and a≠b means every (a,b) adjacency merges — overlap needs b=a)
    * moves counts:
    *   - (x,a) loses exactly triples(x,a,b) occurrences, and (b,y)
    *     exactly triples(a,b,y) — EXACT decrements, provided x/y is not
    *     a symbol an earlier applied merge touched (staleness) and not
    *     a or b itself (self-chain 4-gram effects);
    *   - (x,m) is created with EXACTLY triples(x,a,b) occurrences and
    *     (m,y) with triples(a,b,y) — under the same cleanliness
    *     conditions these enter the candidate set as first-class
    *     mergeable pairs;
    *   - every other pair is EXACTLY unchanged (shared-LEFT (a,·) and
    *     shared-RIGHT (·,b) included: an `a` is consumed only when
    *     followed by `b`, a `b` only when preceded by `a`);
    *   - pre-existing pair counts never increase.
    * Whenever a count is NOT provable — the triple is missing from a
    * truncated list, a symbol is dirty, a self-chain form — the pair
    * moves to an UNKNOWN set carrying its last exact value as an upper
    * bound, and creations fold into a created-pairs bound. A step's
    * winner is accepted only while its exact count sits STRICTLY above
    * every unknown bound (unseen pairs ≤ pair floor, unseen triples ≤
    * triple floor, unknown-set bounds, created bound); at a tie the
    * lexicographic order against an unknowable count can't be resolved,
    * so the round ends. Winners that are themselves terminal — output
    * string already a live symbol (merging into an existing symbol
    * boosts its pre-existing pairs unboundedly), self-pair (a,a)
    * (run-length semantics), or a previously decremented/created pair
    * (their bookkeeping triples are stale) — are emitted and end the
    * round: they are exact as merges, but nothing after them is
    * provable. The head winner is always exact (global argmax over
    * complete information), so every round advances ≥ 1 merge. */
  private[text] def selectExactBatch(stats: RoundStats,
      isLiveSymbol: String => Boolean, budget: Int): Seq[(String, String, Long)] =
    simulateBatch(stats, isLiveSymbol, budget, speculate = false)._1

  /** [[selectExactBatch]] generalized with VERIFIED SPECULATION
    * (`speculate = true`): instead of ending the round at the first
    * unprovable step, the simulation CONTINUES past it with best-effort
    * count updates (missing/stale triples treated as their most likely
    * value) up to `budget` steps, returning the speculated sequence
    * plus `provableLen` — the length of the prefix the exact mode
    * would have emitted. Until the first exact-mode stop condition the
    * simulation state is BIT-IDENTICAL to exact mode (the lenient
    * update rules only engage after `provable` flips), so `provableLen`
    * is sound: steps ≤ provableLen need no verification; steps beyond
    * it are *predictions* whose true winners the caller must confirm
    * against the [[graft.functions.BpeBatchReplayExpr]] replay counts
    * (exactness restored by accepting only the verified prefix —
    * speculation errors cost wasted suffix, never a wrong merge). */
  private[text] def simulateBatch(stats: RoundStats,
      isLiveSymbol: String => Boolean, budget: Int,
      speculate: Boolean): (Seq[(String, String, Long)], Int) = {
    import scala.collection.mutable
    val pairOrd = new Ordering[(String, String)] {
      def compare(x: (String, String), y: (String, String)): Int = {
        val c = cpCompare(x._1, y._1)
        if (c != 0) c else cpCompare(x._2, y._2)
      }
    }
    // exact candidate counts; `tainted` marks pairs whose own count is
    // exact but whose application bookkeeping would need post-merge
    // triples we don't have (decremented originals, created pairs)
    val exact = mutable.HashMap.empty[(String, String), Long]
    val tainted = mutable.HashSet.empty[(String, String)]
    stats.pairs.foreach { case (l, r, f) => exact((l, r)) = f }
    val tripleFloor = if (stats.sawAllTriples) 0L else stats.tripleFloor
    // bounds no candidate may tie: unseen originals, moved-to-unknown
    // pairs, un-enumerable created pairs
    var unknownBar = if (stats.sawAllPairs) -1L else stats.pairs.last._3
    val dirty = mutable.HashSet.empty[String]
    val outputs = mutable.HashSet.empty[String]
    val out = mutable.ArrayBuffer.empty[(String, String, Long)]

    def winner(): Option[((String, String), Long)] =
      if (exact.isEmpty) None
      else Some(exact.minBy { case (p, f) => (-f, p) }(
        Ordering.Tuple2(Ordering.Long, pairOrd)))

    // `provable` mirrors exact mode: true until the first condition
    // that would have ended an exact round. While provable, every code
    // path below is BIT-IDENTICAL to exact mode (lenient rules are
    // gated on !provable), so provableLen is sound
    var provable = true
    var provableLen = 0
    def lenient: Boolean = speculate && !provable
    var stop = false
    while (!stop && out.size < budget) {
      winner() match {
        case None => stop = true
        case Some(((a, b), f)) =>
          // strictly above every unknowable count, else unorderable —
          // except the head, which is the global argmax over complete
          // information (the round's sort saw every pair): always exact
          if (out.nonEmpty && f <= unknownBar && provable) {
            if (!speculate) stop = true
            else provable = false // emit anyway — a prediction now
          }
          if (!stop) {
            out += ((a, b, f))
            if (provable) provableLen += 1
            val m = a + b
            val terminal = isLiveSymbol(m) || outputs.contains(m) ||
              a == b || tainted((a, b))
            if (terminal && !speculate) stop = true
            else if (terminal) provable = false // simulate on, predicted
            if (!stop && out.size == budget) stop = true
            if (!stop) {
              exact.remove((a, b))
              dirty += a; dirty += b; dirty += m
              outputs += m
              // (m,m) creations need the a,b,a,b 4-gram — bound only
              val mm = math.min(
                stats.triples.getOrElse((a, b, a), tripleFloor),
                stats.triples.getOrElse((b, a, b), tripleFloor))
              unknownBar = math.max(unknownBar, mm)
              if (!stats.sawAllTriples)
                unknownBar = math.max(unknownBar, tripleFloor)
              // decrements: a conflicting pair over ORIGINAL symbols
              // with no pre-round interaction triple keeps its exact
              // count (original-symbol triples only ever shrink, so a
              // zero stays zero); a seen triple decrements exactly when
              // everything involved is clean; otherwise the pair's
              // count is no longer provable and becomes a bound.
              // Created pairs (an output symbol inside) have no
              // pre-round triples at all — any conflict unknowns them.
              def conflictUpdate(p: (String, String), fp: Long,
                  other: String, triple: (String, String, String)): Unit = {
                val created = outputs(p._1) || outputs(p._2)
                val t = if (created) None else stats.triples.get(triple)
                t match {
                  case None if !created && stats.sawAllTriples => () // dec=0
                  case Some(dec) if other != a && other != b &&
                      !dirty(other) && !tainted(p) =>
                    if (dec >= fp) { exact.remove(p); () }
                    else { exact(p) = fp - dec; tainted += p }
                  case _ if lenient =>
                    // prediction mode: a missing/stale triple's most
                    // likely decrement is the seen value or 0 — keep
                    // the pair live so the simulation can rank it; the
                    // replay verifies whatever this guesses
                    val dec = t.getOrElse(0L)
                    if (dec >= fp) { exact.remove(p); () }
                    else { exact(p) = fp - dec; tainted += p }
                  case _ =>
                    exact.remove(p); unknownBar = math.max(unknownBar, fp)
                }
              }
              exact.filter { case ((_, r), _) => r == a }.foreach {
                case (p @ (x, _), fx) => conflictUpdate(p, fx, x, (x, a, b))
              }
              exact.filter { case ((l, _), _) => l == b }.foreach {
                case (p @ (_, y), fy) => conflictUpdate(p, fy, y, (a, b, y))
              }
              // exact creations from seen triples (clean outer symbol);
              // dirty/self-chain outer symbols fold into the bound
              // clean-symbol creations are exact; in lenient mode a
              // stale (dirty/self-chain) triple count still beats
              // dropping the created pair — the prediction horizon is
              // what buys batch length, and the replay verifies it all
              stats.triples.foreach {
                case ((x, ta, tb), c) if ta == a && tb == b =>
                  if (x != b && !dirty(x) || lenient) {
                    if (c > 0) { exact((x, m)) = c; tainted += ((x, m)) }
                  } else unknownBar = math.max(unknownBar, c)
                case ((ta, tb, y), c) if ta == a && tb == b =>
                  if (y != a && !dirty(y) || lenient) {
                    if (c > 0) { exact((m, y)) = c; tainted += ((m, y)) }
                  } else unknownBar = math.max(unknownBar, c)
                case _ => ()
              }
            }
          }
      }
    }
    (out.toSeq, provableLen)
  }

  /** FULLY DISTRIBUTED training: the (word → symbols, freq) dictionary
    * never leaves the cluster — each round's pair counting is one
    * Spark aggregate over the dictionary frame and the ONLY rows the
    * driver ever holds are the top pair counts per round (≤ `batchTopK`
    * rows) and the alphabet (base codepoints). This removes the
    * `maxWords` driver bound [[train]] needs: a corpus whose
    * distinct-word table itself exceeds driver memory (no Heaps'-law
    * mercy — think URL-/ID-riddled web text) trains here at full
    * fidelity.
    *
    * Per round: (1) adjacent-pair counts via map-side partial agg over
    * the checkpointed dict (`zip_with` over the symbol array — no
    * explode of the corpus, the frame is distinct-word-sized), shuffle
    * carries only distinct pairs; candidates ordered by (freq DESC,
    * pair ASC) — Spark's binary UTF8 ordering IS codepoint order,
    * matching [[cpCompare]]; (2) [[selectExactBatch]] picks the longest
    * provably-sequential prefix of merges from those counts (so a
    * 32k-merge vocabulary costs ~batch-size-fold fewer Spark rounds
    * than one-merge-per-round, with the merge SEQUENCE byte-identical —
    * singleton fallback on any conflict or tie); (3) the batch applied
    * map-only via chained codegen'd
    * [[graft.functions.BpeMergePairExpr]]s in rank order, then
    * `localCheckpoint` so each kept plan is one round deep and the next
    * round's aggregate scans cached rows, not a k-deep lineage (the
    * [[graft.operators.Graphs]] fixed-point pattern) — and the
    * SUPERSEDED round's checkpoint blocks are freed explicitly
    * ([[org.apache.spark.sql.GraftShims.unpersistCheckpoint]]), so
    * storage is bounded at one dictionary copy regardless of round
    * count, not left to ContextCleaner GC cadence.
    *
    * Byte-identical to [[trainFromCounts]] on the same word counts
    * (pinned by BpeTrainSpec at 200 merges): same tie order, same
    * left-to-right merge-all, same vocab layout. */
  def trainDistributed(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Option[Int] = None, batchTopK: Int = 256,
      maxBatch: Int = 64): (Seq[(String, String, Long)], Seq[String]) = {
    val r = trainDistributedStats(docs, textCol, nMerges, maxWords,
      batchTopK, maxBatch)
    (r.merges, r.vocab)
  }

  /** [[trainDistributed]] plus the round count (for scale assertions —
    * batching should cost far fewer rounds than merges).
    *
    * VERIFIED SPECULATION (round shape): each round (1) counts pairs,
    * (2) counts triples, (3) runs [[simulateBatch]] speculatively up to
    * `maxBatch` steps — the prefix exact mode could PROVE plus a
    * predicted continuation past the old stopping conditions (truncated
    * triples, dirty symbols, self-chains, live-symbol outputs), (4) if
    * anything speculative was proposed, ONE
    * [[graft.functions.BpeBatchReplayExpr]] aggregate replays the
    * speculated trajectory over the dictionary and returns the EXACT
    * corpus counts of every candidate pair at every intermediate state,
    * (5) the driver accepts speculative steps while each one's true
    * argmax (replay counts for tracked/created pairs; the round's pair
    * floor bounds everything else — pairs not touching a batch output
    * can only LOSE occurrences mid-batch) matches the prediction,
    * strictly above the floor; the first divergence contributes its
    * CORRECTED winner (the replay told us the true one) and ends the
    * round, so a wrong guess costs wasted suffix, never a wrong merge;
    * (6) only accepted merges are applied. Every emitted merge is
    * therefore the true sequential winner with its true corpus
    * frequency — byte-identical to [[trainFromCounts]], pinned by
    * BpeTrainSpec parity and the tools/fuzz sweeps — while a round can
    * now emit up to `maxBatch` merges for 4 jobs. */
  def trainDistributedStats(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Option[Int] = None,
      batchTopK: Int = 256, maxBatch: Int = 64): DistTrainResult = {
    import graft.functions.NativeBpe
    import org.apache.spark.sql.GraftShims
    require(batchTopK >= 1, s"batchTopK must be >= 1, got $batchTopK")
    val raw = wordCounts(docs, textCol, maxWords)
      .select(NativeBpe.bpeInitSyms(col("word")).as("syms"), col("freq"))
      .localCheckpoint()
    // right-size the round jobs to the DICTIONARY, not to the corpus's
    // shuffle partitioning: the dict is vocabulary-sized, and nMerges
    // rounds of 32-task jobs over a few thousand rows is pure scheduler
    // overhead (~64k words per partition keeps round tasks meaningful)
    val nWords = raw.count()
    val parts = math.max(1L,
      math.min(raw.rdd.getNumPartitions.toLong, nWords / 65536 + 1)).toInt
    val init =
      if (parts < raw.rdd.getNumPartitions) raw.coalesce(parts) else raw
    // alphabet: distinct base codepoints, codepoint-sorted (binary
    // UTF8 ordering == codepoint order) — bounded by alphabet size
    val baseChars = init
      .select(explode(col("syms")).as("c"))
      .filter(col("c") =!= Bpe.EndOfWord)
      .distinct().orderBy(col("c"))
      .collect().map(_.getString(0)).toSeq
    // live-symbol set is driver-known by construction: symbols are only
    // ever base codepoints, the end-of-word marker, or merge outputs
    val live = scala.collection.mutable.HashSet[String](baseChars: _*)
    live += Bpe.EndOfWord
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var cur = init
    var rounds = 0
    var exhausted = false
    val tripleTopK = batchTopK * 16
    while (merges.size < nMerges && !exhausted) {
      val top = cur
        .select(explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(batchTopK).collect()
      if (top.isEmpty) exhausted = true
      else {
        rounds += 1
        val rows = top.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .toIndexedSeq
        val budget = nMerges - merges.size
        // second (triple-count) aggregate only pays off when the round
        // can batch; with one merge left the head alone is taken
        val stats = if (budget <= 1 || rows.length <= 1)
          RoundStats(rows, sawAllPairs = rows.length < batchTopK,
            Map.empty, sawAllTriples = true, tripleFloor = 0L)
        else {
          val n3 = greatest(size(col("syms")) - 2, lit(0))
          val trip = cur
            .select(explode(zip_with(
              zip_with(
                slice(col("syms"), lit(1), n3),
                slice(col("syms"), lit(2), n3),
                (a, b) => struct(a.as("x"), b.as("y"))),
              slice(col("syms"), lit(3), n3),
              (xy, z) => struct(xy.getField("x").as("x"),
                xy.getField("y").as("y"), z.as("z")))).as("t"), col("freq"))
            .groupBy(col("t.x").as("x"), col("t.y").as("y"), col("t.z").as("z"))
            .agg(sum(col("freq")).as("f"))
            .orderBy(col("f").desc, col("x"), col("y"), col("z"))
            .limit(tripleTopK).collect()
          RoundStats(rows, sawAllPairs = rows.length < batchTopK,
            trip.map(r => (r.getString(0), r.getString(1), r.getString(2))
              -> r.getLong(3)).toMap,
            sawAllTriples = trip.length < tripleTopK,
            tripleFloor = if (trip.isEmpty) 0L else trip.last.getLong(3))
        }
        val cap = math.min(budget, maxBatch)
        val floor = if (stats.sawAllPairs) 0L else stats.pairs.last._3
        val pairOrd = new Ordering[(String, String)] {
          def compare(x: (String, String), y: (String, String)): Int = {
            val c = cpCompare(x._1, y._1)
            if (c != 0) c else cpCompare(x._2, y._2)
          }
        }
        val trackedPairs = stats.pairs.map(p => (p._1, p._2))
        val (spec0, provable0) =
          simulateBatch(stats, live, cap, speculate = true)
        val verified = scala.collection.mutable.ArrayBuffer(
          spec0.take(provable0): _*)
        var curSpec: Seq[(String, String)] =
          spec0.map(s => (s._1, s._2))
        // CHAINED REPLAYS: each replay verifies the current speculative
        // suffix; a divergence contributes its corrected winner AND the
        // exact counts at that state, from which a FRESH speculation
        // continues — so one round keeps extending (one job per leg,
        // each leg ≥ 1 verified merge) until the cap or a floor stall
        var replays = 0
        var stalled = false
        while (!stalled && verified.size < curSpec.size &&
            verified.size < cap) {
          replays += 1
          val repl = cur
            .select(explode(graft.functions.NativeBpe.bpeBatchReplay(
              col("syms"), curSpec, trackedPairs, verified.size)).as("e"),
              col("freq"))
            .groupBy(col("e.step").as("s"), col("e.l").as("l"),
              col("e.r").as("r"))
            .agg(sum(col("e.c") * col("freq")).as("f"))
            .collect()
          val byState = repl.groupBy(_.getInt(0)).view.mapValues(_.map(r =>
            (r.getString(1), r.getString(2), r.getLong(3))).toSeq).toMap
          var t = verified.size + 1
          var go = true
          var diverged = false
          while (go && t <= curSpec.size && verified.size < cap) {
            val cnts = byState.getOrElse(t - 1, Seq.empty).filter(_._3 > 0L)
            if (cnts.isEmpty) { go = false; stalled = true }
            else {
              val (wl, wr, fw) = cnts.minBy { case (l, r, f) =>
                (-f, (l, r))
              }(Ordering.Tuple2(Ordering.Long, pairOrd))
              // strictly above the floor, or an unseen pair could tie
              // and win the lexicographic break — unorderable
              if (fw <= floor) { go = false; stalled = true }
              else {
                verified += ((wl, wr, fw)) // the TRUE winner, true count
                if (wl == curSpec(t - 1)._1 && wr == curSpec(t - 1)._2)
                  t += 1
                else { go = false; diverged = true }
              }
            }
          }
          if (!stalled && verified.size < cap) {
            // seed the next speculation leg from the last state whose
            // counts are EXACT: the divergence state (its corrected
            // winner heads the new simulation) or the fully-verified
            // trajectory's final state
            val seedState = if (diverged) verified.size - 1 else verified.size
            val seed = byState.getOrElse(seedState, Seq.empty)
              .filter(_._3 > 0L)
              .sortBy { case (l, r, f) => (-f, (l, r)) }(
                Ordering.Tuple2(Ordering.Long, pairOrd))
            if (seed.isEmpty) stalled = true
            else {
              val liveNow = live.toSet ++ verified.map(v => v._1 + v._2)
              val (seq2, _) = simulateBatch(
                RoundStats(seed.toIndexedSeq, sawAllPairs = false,
                  stats.triples, stats.sawAllTriples, stats.tripleFloor),
                liveNow, cap - seedState, speculate = true)
              // on divergence the new head re-derives the corrected
              // winner (same exact counts, same order); nothing new
              // beyond it means the leg made no forward prediction
              val newSpec = verified.take(seedState).map(v => (v._1, v._2))
                .toSeq ++ seq2.map(s => (s._1, s._2))
              if (newSpec.size <= verified.size ||
                  newSpec.take(verified.size) !=
                    verified.map(v => (v._1, v._2)).toSeq)
                stalled = true // defensive: no progress or prefix drift
              else curSpec = newSpec
            }
          }
        }
        if (sys.env.contains("GRAFT_BPE_DEBUG"))
          println(s"DBG round provable=$provable0 accepted=${verified.size} " +
            s"replays=$replays cap=$cap stalled=$stalled")
        val batch: Seq[(String, String, Long)] = verified.toSeq
        merges ++= batch
        batch.foreach { case (l, r, _) => live += (l + r) }
        val prev = cur
        cur = cur
          .select(batch.foldLeft(col("syms")) { case (c, (l, r, _)) =>
            NativeBpe.bpeMergePair(c, l, r)
          }.as("syms"), col("freq"))
          .localCheckpoint()
        GraftShims.unpersistCheckpoint(prev)
      }
    }
    GraftShims.unpersistCheckpoint(cur)
    val ms = merges.toSeq
    DistTrainResult(ms,
      baseChars ++ Seq(Bpe.EndOfWord) ++ ms.map { case (l, r, _) => l + r },
      rounds)
  }

  /** Persist the artifact as a PARQUET table (`kind`/`rank`/`lhs`/
    * `rhs`/`sym` rows plus one version row carrying the expected merge
    * and vocab counts) — the scale form of [[save]]: written through
    * Spark's parquet writer rather than as one driver-assembled string,
    * and loadable by every executor directly via parquet-hadoop with
    * `Bpe.artifact("parquet:<dir>")`. A 100k-merge vocabulary is just
    * rows here; the version row makes a torn/partial artifact fail
    * loudly at load instead of tokenizing with a truncated merge
    * table. */
  def saveParquet(spark: org.apache.spark.sql.SparkSession, dir: String,
      merges: Seq[(String, String)], vocab: Seq[String]): Unit = {
    import spark.implicits._
    val rows =
      Seq(("version", -1, merges.size.toString, vocab.size.toString,
        "graft-bpe-1")) ++
      merges.zipWithIndex.map { case ((l, r), i) => ("merge", i, l, r, l + r) } ++
      vocab.zipWithIndex.map { case (s, i) => ("vocab", i, "", "", s) }
    rows.toDF("kind", "rank", "lhs", "rhs", "sym")
      .repartition(1) // artifact is vocabulary-sized; one file loads fastest
      .write.mode("overwrite").parquet(dir)
  }

  /** Write the artifact in the exact on-disk format [[Bpe.artifact]]
    * (and every public BPE distribution) consumes — after this,
    * `Bpe.artifact(s"file:$dir")` serves the freshly-trained
    * tokenizer. */
  def save(dir: String, merges: Seq[(String, String)],
      vocab: Seq[String]): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val mergeLines = (s"#version: graft-bpe-1 merges=${merges.size}" +:
      merges.map { case (l, r) => s"$l $r" }).mkString("", "\n", "\n")
    val vocabLines = vocab.mkString("", "\n", "\n")
    java.nio.file.Files.write(d.resolve("merges.txt"),
      mergeLines.getBytes("UTF-8"))
    java.nio.file.Files.write(d.resolve("vocab.txt"),
      vocabLines.getBytes("UTF-8"))
  }
}
