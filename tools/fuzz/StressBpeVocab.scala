import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LARGE-VOCAB BPE seal: a ≥ 5k-merge `trainDistributed` run on a
  * Zipf-distributed morphological corpus, byte-compared against the
  * sequential reference loop (`trainFromCounts`) on the IDENTICAL
  * word counts — the end-to-end evidence that the chained
  * replay-verified speculation's cost is governed by its DIVERGENCE
  * RATE at realistic vocabulary sizes, not by the 3-gram proof
  * horizon (round 11 measured only 105 merges / a 10-merge 2M-word
  * stress; a 32k-vocab tokenizer run needs thousands).
  *
  * Corpus: ~2M word occurrences drawn log-uniformly over 100k ranks
  * (frequency ∝ 1/rank — Zipf), each rank spelled as 3 CV syllables
  * from a 40-syllable inventory plus one of 5 suffixes — shared
  * subword structure (syllables recur across words, suffixes across
  * stems), which is what gives BPE thousands of productive merges,
  * exactly the regime natural text presents. Fully deterministic
  * (multiplicative-hash mixing, no RNG).
  *
  * Printed: merges, rounds, merges/round (the divergence-rate
  * number), wall. Required: the full 5k-merge trajectory (pairs AND
  * order) equals trainFromCounts on the same counts, and vocab
  * layouts match. */
object StressBpeVocab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.BpeTrain

    val nOcc = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nMerges = if (args.length > 1) args(1).toInt else 5000
    val maxBatch = if (args.length > 2) args(2).toInt else 64
    val maxRank = 100000.0
    val syls = for (c <- "bdfgklmn"; v <- "aeiou") yield s"$c$v" // 40
    val sufs = Seq("", "ing", "ed", "s", "er")
    val sylArr = array(syls.map(s => lit(s)): _*)
    val sufArr = array(sufs.map(lit): _*)
    // rank r(id) log-uniform over [1, maxRank] → P(rank = r) ∝ 1/r
    val u = (col("id") * 2654435761L % 1000003L).cast("double") / 1000003.0
    val rank = floor(exp(u * math.log(maxRank))).cast("long")
    val word = concat(
      element_at(sylArr, ((rank / 1600L) % 40L).cast("int") + 1),
      element_at(sylArr, ((rank / 40L) % 40L).cast("int") + 1),
      element_at(sylArr, (rank % 40L).cast("int") + 1),
      element_at(sufArr, (rank % 5L).cast("int") + 1))
    val docs = spark.range(0, nOcc)
      .select((col("id") / 20L).cast("long").as("doc"), word.as("w"))
      .groupBy(col("doc")).agg(concat_ws(" ", collect_list(col("w"))).as("text"))
      .localCheckpoint()

    val maxWords = Some(50000)
    val words = BpeTrain.wordCounts(docs, "text", maxWords).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"corpus: $nOcc occurrences, ${words.size} dictionary words " +
      s"(cap ${maxWords.get})")

    val t0 = System.nanoTime()
    val got = BpeTrain.trainDistributedStats(docs, "text", nMerges,
      maxWords = maxWords, maxBatch = maxBatch)
    val distSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val (expMerges, expVocab) = BpeTrain.trainFromCounts(words, nMerges)
    val refSec = (System.nanoTime() - t1) / 1e9

    require(got.merges.map(m => (m._1, m._2)) == expMerges,
      {
        val i = got.merges.map(m => (m._1, m._2)).zip(expMerges)
          .indexWhere { case (a, b) => a != b }
        s"trajectory diverges from the sequential loop at merge $i: " +
          s"got ${got.merges.lift(i)}, expected ${expMerges.lift(i)}"
      })
    require(got.vocab == expVocab, "vocab layout mismatch")
    println(f"""{"metric":"bpe_vocab_seal","occurrences":$nOcc,"dict":${words.size},"merges":${got.merges.size},"max_batch":$maxBatch,"rounds":${got.rounds},"merges_per_round":${got.merges.size.toDouble / got.rounds}%.1f,"dist_sec":$distSec%.1f,"ref_loop_sec":$refSec%.1f}""")
    spark.stop()
  }
}
