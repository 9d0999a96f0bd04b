package graft.text

import graft.SparkSpec
import graft.functions.{Bpe, NativeBpe}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainSpec extends AnyFunSuite with SparkSpec {

  test("merge loop: hand-computed merges and deterministic tie-breaks") {
    // aa×3, ab×2 → pairs (a,a)=3 (a,</w>)=3 (a,b)=2 (b,</w>)=2;
    // the 3-3 tie breaks lexicographically: '<' sorts before 'a'
    val (merges, vocab) =
      BpeTrain.trainFromCounts(Map("aa" -> 3L, "ab" -> 2L), 4)
    assert(merges == Seq(("a", "</w>"), ("a", "a</w>"),
      ("a", "b"), ("ab", "</w>")))
    assert(vocab == Seq("a", "b", "</w>",
      "a</w>", "aa</w>", "ab", "ab</w>"))
  }

  test("merge loop stops early when no pairs remain") {
    // single-char word: one pair (a,</w>), then the word is one symbol
    val (merges, _) = BpeTrain.trainFromCounts(Map("a" -> 5L), 10)
    assert(merges == Seq(("a", "</w>")))
  }

  test("trained artifact matches the committed fixture byte for byte") {
    // the committed default was trained by tools/train_bpe.py (the
    // independent python reference) on sf0.01 documents with 40 merges
    // — the Spark-native trainer must reproduce it exactly
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val (merges, vocab) = BpeTrain.train(docs, "text", nMerges = 40)
    def resource(name: String): Seq[String] = {
      val in = getClass.getResourceAsStream(s"/graft/bpe/$name")
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
      finally in.close()
    }
    val expMerges = resource("merges.txt").filterNot(_.startsWith("#"))
      .map { l => val i = l.indexOf(' '); (l.take(i), l.drop(i + 1)) }
    assert(merges == expMerges)
    assert(vocab == resource("vocab.txt").filter(_.nonEmpty))
  }

  test("save → file: artifact load → tokenizer-exact counts round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    val (merges, vocab) =
      BpeTrain.trainFromCounts(Map("aa" -> 3L, "ab" -> 2L), 4)
    BpeTrain.save(dir, merges, vocab)
    val art = Bpe.artifact(s"file:$dir")
    assert(Bpe.encodeWord("aa", art).toSeq == Seq("aa</w>"))
    assert(Bpe.encodeWord("ab", art).toSeq == Seq("ab</w>"))
    assert(Bpe.encodeWord("ba", art).toSeq == Seq("b", "a</w>"))
    import spark.implicits._
    val counts = Seq("aa ab", "ba ba aa").toDF("text")
      .select(NativeBpe.bpeTokenCount(col("text"), s"file:$dir").as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(counts == Seq(2, 5))
  }

  test("trainDistributed: hand-computed merges, freqs, and tie-breaks") {
    import spark.implicits._
    // same corpus as the driver-loop case: aa aa aa ab ab
    val docs = Seq("aa aa aa ab ab").toDF("text")
    val (merges, vocab) = BpeTrain.trainDistributed(docs, "text", 4)
    assert(merges == Seq(("a", "</w>", 3L), ("a", "a</w>", 3L),
      ("a", "b", 2L), ("ab", "</w>", 2L)))
    assert(vocab == Seq("a", "b", "</w>",
      "a</w>", "aa</w>", "ab", "ab</w>"))
  }

  test("trainDistributed stops early when no pairs remain") {
    import spark.implicits._
    val (merges, _) =
      BpeTrain.trainDistributed(Seq("a a a").toDF("text"), "text", 10)
    assert(merges.map(m => (m._1, m._2)) == Seq(("a", "</w>")))
  }

  test("trainDistributed == trainFromCounts on a real corpus") {
    // the distributed pair-count + merge rounds must be byte-identical
    // to the driver reference loop on the same word counts
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = BpeTrain.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (expMerges, expVocab) = BpeTrain.trainFromCounts(words, 25)
    val (gotMerges, gotVocab) = BpeTrain.trainDistributed(docs, "text", 25)
    assert(gotMerges.map(m => (m._1, m._2)) == expMerges)
    assert(gotVocab == expVocab)
  }

  test("batched trainDistributed == trainFromCounts at 200 merges, " +
      "in <= merges/8 rounds (verified speculation)") {
    // multi-merge batching must preserve the EXACT sequential merge
    // trajectory (pairs, order, frequencies) while collapsing rounds:
    // chained replay-verified speculation fills each round up to
    // maxBatch merges (this corpus exhausts at 105 merges — 2 rounds)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = BpeTrain.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (expMerges, expVocab) = BpeTrain.trainFromCounts(words, 200)
    val got = BpeTrain.trainDistributedStats(docs, "text", 200)
    assert(got.merges.map(m => (m._1, m._2)) == expMerges)
    assert(got.vocab == expVocab)
    assert(got.rounds <= math.max(1, got.merges.size / 8),
      s"verified speculation should cost <= merges/8 rounds " +
        s"(${got.merges.size} merges), got ${got.rounds}")
  }

  test("batched trainDistributed == trainFromCounts at 500 merges on " +
      "a Zipf morphological fixture (the StressBpeVocab shape, CI-sized)") {
    // shared subword structure (syllables recur across words, suffixes
    // across stems) is what makes deep merge trajectories productive —
    // the 5k-merge divergence-rate seal runs in tools/fuzz; this pins
    // the same corpus shape at CI cost
    val s = spark
    import s.implicits._
    val syls = for (c <- "bdfg"; v <- "aeiou") yield s"$c$v" // 20
    val sufs = Seq("", "ing", "ed", "s")
    val rng = new scala.util.Random(12)
    val words = Seq.tabulate(3000) { r =>
      val w = syls(r / 400 % 20) + syls(r / 20 % 20) + syls(r % 20) +
        sufs(r % 4)
      Seq.fill(1 + 3000 / (r + 1))(w) // frequency ∝ 1/rank
    }.flatten
    val docs = rng.shuffle(words).grouped(20)
      .map(_.mkString(" ")).toSeq.toDF("text")
    val counts = BpeTrain.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (expMerges, expVocab) = BpeTrain.trainFromCounts(counts, 500)
    val got = BpeTrain.trainDistributedStats(docs, "text", 500)
    assert(got.merges.map(m => (m._1, m._2)) == expMerges)
    assert(got.vocab == expVocab)
    assert(got.rounds <= math.max(1, got.merges.size / 8),
      s"${got.merges.size} merges should cost <= merges/8 rounds, " +
        s"got ${got.rounds}")
  }

  test("selectExactBatch: exact decrements, creations, terminal stops") {
    def rs(pairs: Seq[(String, String, Long)],
        triples: Map[(String, String, String), Long]) =
      BpeTrain.RoundStats(pairs.toIndexedSeq, sawAllPairs = true,
        triples, sawAllTriples = true, tripleFloor = 0L)
    def batch(s: BpeTrain.RoundStats, live: String*): Seq[(String, String, Long)] =
      BpeTrain.selectExactBatch(s, (live.toSet ++ Set("a","b","c","d","e","f")),
        budget = 100)
    // disjoint pairs, no interacting triples: all batch
    assert(batch(rs(Seq(("a","b",10L), ("c","d",8L), ("e","f",6L)), Map.empty)) ==
      Seq(("a","b",10L), ("c","d",8L), ("e","f",6L)))
    // triple-exact decrement: (b,c)=9 loses triples(a,b,c)=4 → merges
    // third at 5, exactly as the sequential loop would
    assert(batch(rs(Seq(("a","b",10L), ("c","d",8L), ("b","c",9L)),
      Map(("a","b","c") -> 4L))) ==
      Seq(("a","b",10L), ("c","d",8L), ("b","c",5L)))
    // exact creation out-competes originals: (c,ab) created at 7 wins
    // step 2 and is terminal (no triples over the fresh symbol)
    assert(batch(rs(Seq(("a","b",10L), ("e","f",6L)),
      Map(("c","a","b") -> 7L))) ==
      Seq(("a","b",10L), ("c","ab",7L)))
    // self-pair winner is terminal (run-length semantics)
    assert(batch(rs(Seq(("a","a",10L), ("c","d",8L)), Map.empty)) ==
      Seq(("a","a",10L)))
    // head output already live: terminal singleton (boost unbounded)
    assert(batch(rs(Seq(("a","b",10L), ("c","d",8L)), Map.empty), "ab") ==
      Seq(("a","b",10L)))
    // truncated pair list: unseen pairs bound at the floor; the tying
    // candidate is unorderable against them
    assert(BpeTrain.selectExactBatch(
      BpeTrain.RoundStats(IndexedSeq(("a","b",10L), ("c","d",8L), ("e","f",8L)),
        sawAllPairs = false, Map.empty, sawAllTriples = true, 0L),
      Set("a","b","c","d","e","f"), budget = 100) == Seq(("a","b",10L)))
    // truncated TRIPLE list: a decremented pair whose triple is unseen
    // becomes unorderable at the floor
    assert(BpeTrain.selectExactBatch(
      BpeTrain.RoundStats(IndexedSeq(("a","b",10L), ("b","c",9L), ("e","f",2L)),
        sawAllPairs = true, Map(("x","y","z") -> 9L), sawAllTriples = false, 9L),
      Set("a","b","c","d","e","f","x","y","z"), budget = 100) ==
      Seq(("a","b",10L)))
  }

  test("saveParquet → parquet: artifact load → tokenizer-exact round-trip") {
    // the scale artifact form: Spark-written parquet table, loaded
    // executor-side via parquet-hadoop — must tokenize identically to
    // the text form trained from the same corpus
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-bpe-pq")
    val txtDir = base.resolve("txt").toString
    val pqDir = base.resolve("pq").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (merges, vocab) = BpeTrain.train(docs, "text", nMerges = 40)
    BpeTrain.save(txtDir, merges, vocab)
    BpeTrain.saveParquet(spark, pqDir, merges, vocab)
    val fromTxt = Bpe.artifact(s"file:$txtDir")
    val fromPq = Bpe.artifact(s"parquet:$pqDir")
    assert(fromPq.merges.toSeq == fromTxt.merges.toSeq)
    assert(fromPq.vocab.toSeq == fromTxt.vocab.toSeq)
    // end-to-end through the codegen'd expression on executors
    val counts = docs.limit(50)
      .select(
        NativeBpe.bpeTokenCount(col("text"), s"parquet:$pqDir").as("pq"),
        NativeBpe.bpeTokenCount(col("text"), s"file:$txtDir").as("txt"))
      .collect()
    assert(counts.forall(r => r.getInt(0) == r.getInt(1)))
    // a torn artifact (missing rows vs the version header) fails loudly
    val tornDir = base.resolve("torn").toString
    BpeTrain.saveParquet(spark, tornDir, merges.drop(1), vocab)
    spark.read.parquet(tornDir)
      .filter(col("kind") =!= "version" || col("lhs") =!= "39")
      .withColumn("lhs", org.apache.spark.sql.functions.when(
        col("kind") === "version", "40").otherwise(col("lhs")))
      .write.mode("overwrite").parquet(base.resolve("torn2").toString)
    val ex = intercept[IllegalArgumentException] {
      Bpe.artifact(s"parquet:${base.resolve("torn2")}")
    }
    assert(ex.getMessage.contains("torn"))
  }

  test("trainDistributed == trainFromCounts on adversarial tiny alphabets") {
    // 2-4 letter alphabets maximize chains, self-pairs, ties, and
    // created-pair winners — every terminal path in the batch selector
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val alphabet = "abcd".take(2 + rng.nextInt(3))
      val freqs = (1 to 12).map { _ =>
        val w = (1 to (1 + rng.nextInt(5)))
          .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
        (w, 1L + rng.nextInt(9).toLong)
      }
      val text = freqs.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
        .mkString(" ")
      val wordMap = freqs.groupMapReduce(_._1)(_._2)(_ + _)
      val (expM, expV) = BpeTrain.trainFromCounts(wordMap, 30)
      val got = BpeTrain.trainDistributedStats(
        Seq(text).toDF("text"), "text", 30, batchTopK = 8)
      assert(got.merges.map(m => (m._1, m._2)) == expM,
        s"trial $trial corpus: $text")
      assert(got.vocab == expV, s"trial $trial corpus: $text")
    }
  }

  test("batchTopK=1 degenerates to one-merge-per-round but stays exact") {
    // the smallest candidate list exercises the truncation floor on
    // every round: bar == the head's own frequency → singleton batches
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = BpeTrain.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (expMerges, _) = BpeTrain.trainFromCounts(words, 15)
    val got = BpeTrain.trainDistributedStats(docs, "text", 15, batchTopK = 1)
    assert(got.merges.map(m => (m._1, m._2)) == expMerges)
    assert(got.rounds == 15, "topK=1 cannot batch")
  }

  test("maxWords cap keeps the N most frequent words, deterministically") {
    import spark.implicits._
    val docs = Seq.fill(5)("hot hot hot warm warm cold").toDF("text")
    val top = BpeTrain.wordCounts(docs, "text", maxWords = Some(2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top == Map("hot" -> 15L, "warm" -> 10L))
  }
}
