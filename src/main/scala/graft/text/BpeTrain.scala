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

  /** FULLY DISTRIBUTED training: the (word → symbols, freq) dictionary
    * never leaves the cluster — each round's pair counting is one
    * Spark aggregate over the dictionary frame and the ONLY rows the
    * driver ever holds are the winning pair per round (1 row × nMerges)
    * and the alphabet (base codepoints). This removes the `maxWords`
    * driver bound [[train]] needs: a corpus whose distinct-word table
    * itself exceeds driver memory (no Heaps'-law mercy — think
    * URL-/ID-riddled web text) trains here at full fidelity.
    *
    * Per round: (1) adjacent-pair counts via map-side partial agg over
    * the checkpointed dict (`zip_with` over the symbol array — no
    * explode of the corpus, the frame is distinct-word-sized), shuffle
    * carries only distinct pairs; winner by (freq DESC, pair ASC) —
    * Spark's binary UTF8 ordering IS codepoint order, matching
    * [[cpCompare]]; (2) the merge applied map-only via the codegen'd
    * [[graft.functions.BpeMergePairExpr]], then `localCheckpoint` so
    * each kept plan is one round deep and round k+1's aggregate scans
    * cached rows, not a k-deep lineage (the [[graft.operators.Graphs]]
    * fixed-point pattern). Cost: 2 jobs/round over a dictionary-sized
    * frame; the corpus is scanned exactly once (word counting).
    *
    * Byte-identical to [[trainFromCounts]] on the same word counts
    * (pinned by BpeTrainSpec): same tie order, same left-to-right
    * merge-all, same vocab layout. */
  def trainDistributed(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Option[Int] = None): (Seq[(String, String, Long)], Seq[String]) = {
    import graft.functions.NativeBpe
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
    val merges = Seq.newBuilder[(String, String, Long)]
    var cur = init
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val best = cur
        .select(explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val l = best(0).getString(0)
        val r = best(0).getString(1)
        val f = best(0).getLong(2)
        merges += ((l, r, f))
        cur = cur
          .select(NativeBpe.bpeMergePair(col("syms"), l, r).as("syms"),
            col("freq"))
          .localCheckpoint()
      }
      step += 1
    }
    val ms = merges.result()
    (ms, baseChars ++ Seq(Bpe.EndOfWord) ++ ms.map { case (l, r, _) => l + r })
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
