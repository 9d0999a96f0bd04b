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

  test("maxWords cap keeps the N most frequent words, deterministically") {
    import spark.implicits._
    val docs = Seq.fill(5)("hot hot hot warm warm cold").toDF("text")
    val top = BpeTrain.wordCounts(docs, "text", maxWords = Some(2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top == Map("hot" -> 15L, "warm" -> 10L))
  }
}
