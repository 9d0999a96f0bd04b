package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkSpec {

  private val art = Bpe.artifact("default")

  test("artifact loads: 40 ranked merges, vocab covers chars + merged symbols") {
    assert(art.merges.length == 40)
    assert(art.merges.head == ("e", "r")) // rank 0 = most frequent pair
    assert(art.vocab.contains("</w>"))
    // closure: every merge output is in the vocab
    art.merges.foreach { case (l, r) => assert(art.vocabSet.contains(l + r)) }
  }

  test("encodeWord matches hand-replayed merges on fixture words") {
    // hand-derived by replaying merges.txt rank order (independently
    // verified against the trainer's reference encoder)
    val expected = Map(
      "a" -> Seq("a</w>"),
      "batch" -> Seq("batch</w>"),
      "fast" -> Seq("f", "a", "st", "</w>"),
      "order" -> Seq("or", "d", "er</w>"),
      "table" -> Seq("t", "a", "b", "l", "e</w>"),
      "stream" -> Seq("st", "r", "e", "a", "m", "</w>"),
      "window" -> Seq("w", "in", "d", "ow</w>"))
    expected.foreach { case (w, toks) =>
      assert(Bpe.encodeWord(w, art).toSeq == toks, s"word '$w'")
    }
    // every emitted symbol is in the vocabulary (no OOV on in-domain text)
    expected.keys.foreach { w =>
      Bpe.encodeWord(w, art).foreach(s => assert(art.vocabSet.contains(s)))
    }
  }

  test("merge-all is left-to-right non-overlapping (identical-pair runs)") {
    // 'gg' merges via (g,g)? it does not exist in the fixture — craft
    // the run semantics through a word of repeated 'e': (e,r) is rank 0
    // but (e,e) is absent, so 'eee' stays chars; 'erer' exercises two
    // disjoint (e,r) merges in ONE pass
    val erer = Bpe.encodeWord("erer", art)
    assert(erer.head == "er") // first occurrence merged
    assert(erer.count(_ == "er") >= 1 && !erer.contains("e r"))
    // OOV characters pass through as single-codepoint symbols, unmerged
    val oov = Bpe.encodeWord("zzz", art)
    assert(oov.toSeq == Seq("z", "z", "z", "</w>"))
    // multi-codepoint (non-BMP) input splits by CODEPOINT, not UTF-16 char
    val astral = Bpe.encodeWord("😀x", art) // 😀x
    assert(astral.toSeq == Seq("😀", "x", "</w>"))
  }

  test("count and tokens expressions agree, survive codegen, skip empty words") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the fast table"),
      (2L, "  big  data  "), // leading/trailing/multi space → empty frags
      (3L, ""),
      (4L, "fast fast fast")).toDF("id", "text")
    val out = df.select(col("id"),
        graft.text.TextFunctions.bpeTokenCount(col("text")).as("n"),
        graft.text.TextFunctions.bpeTokens(col("text")).as("toks"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[String](2)))
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // the=3, fast=4, table=5
    assert(out(1L)._1 == 12)
    assert(out(1L)._2.size == 12)
    assert(out(1L)._2.take(3) == Seq("t", "h", "e</w>"))
    // big=3, data=3 — empty split fragments contribute nothing
    assert(out(2L)._1 == 6)
    assert(out(3L)._1 == 0 && out(3L)._2.isEmpty)
    // memo path: repeated words cost one encode, same result
    assert(out(4L)._1 == 12)
  }

  test("file: artifact key loads from a directory; unknown key fails at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/merges.txt"),
      "#version: test\na b\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/vocab.txt"),
      "a\nb\nab\n</w>\n")
    val custom = Bpe.artifact(s"file:$dir")
    assert(custom.merges.toSeq == Seq(("a", "b")))
    assert(Bpe.encodeWord("abab", custom).toSeq ==
      Seq("ab", "ab", "</w>"))
    intercept[IllegalArgumentException] {
      graft.functions.NativeBpe.bpeTokenCount(
        org.apache.spark.sql.functions.lit("x"), "nope:bad")
    }
  }
}
