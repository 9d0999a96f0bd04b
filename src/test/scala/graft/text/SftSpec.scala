package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SftSpec extends AnyFunSuite with SparkSpec {

  private def conv(turns: (String, String)*): String =
    turns.map { case (r, c) => s"""{"role":"$r","content":"$c"}""" }
      .mkString("[", ",", "]")

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "conv")
  }

  test("parseTurns: ordered typed turns; malformed JSON contributes none") {
    val out = Sft.parseTurns(df(
        1L -> conv("user" -> "hello there", "assistant" -> "hi"),
        2L -> "not json at all",
        3L -> conv("user" -> "solo")), "doc_id", "conv")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3))).toSet
    assert(out == Set((1L, 0, "user", "hello there"),
      (1L, 1, "assistant", "hi"), (3L, 0, "user", "solo")))
  }

  test("conversationStats: token accounting and the validity protocol") {
    val turns = Sft.parseTurns(df(
        // valid: user/assistant/user, assistant turn has 3 tokens
        1L -> conv("user" -> "a b", "assistant" -> "x y z", "user" -> "q"),
        // invalid: starts with assistant
        2L -> conv("assistant" -> "x", "user" -> "y"),
        // invalid: consecutive same role
        3L -> conv("user" -> "a", "user" -> "b"),
        // invalid: unknown role
        4L -> conv("user" -> "a", "system" -> "b"),
        // valid single turn
        5L -> conv("user" -> "one two three")), "doc_id", "conv")
    val out = Sft.conversationStats(turns, Sft.whitespaceTokens).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_turns") == 3)
    assert(out(1L).getAs[Long]("n_user") == 2)
    assert(out(1L).getAs[Long]("n_assistant") == 1)
    assert(out(1L).getAs[Long]("assistant_tokens") == 3)
    assert(out(1L).getAs[Long]("total_tokens") == 6)
    assert(out(1L).getAs[Int]("valid") == 1)
    assert(out(2L).getAs[Int]("valid") == 0)
    assert(out(3L).getAs[Int]("valid") == 0)
    assert(out(4L).getAs[Int]("valid") == 0)
    assert(out(5L).getAs[Int]("valid") == 1)
  }

  test("conversationStats defaults to tokenizer-exact BPE counts") {
    val turns = Sft.parseTurns(df(
        1L -> conv("user" -> "alpha beta", "assistant" -> "gamma delta epsilon")),
      "doc_id", "conv")
    val out = Sft.conversationStats(turns).collect().head
    def bpe(s: String) = graft.functions.BpeImpl.count(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), "default").toLong
    assert(out.getAs[Long]("assistant_tokens") == bpe("gamma delta epsilon"))
    assert(out.getAs[Long]("total_tokens") ==
      bpe("alpha beta") + bpe("gamma delta epsilon"))
    // a budget in BPE tokens is NOT a budget in whitespace words: the
    // artifact splits these words into subwords, so the exact count
    // strictly exceeds the 3-word whitespace estimate
    assert(out.getAs[Long]("assistant_tokens") > 3L)
  }

  test("stats plan: one doc_id shuffle shared by the window and the aggregate") {
    val turns = Sft.parseTurns(
      df(1L -> conv("user" -> "a", "assistant" -> "b")), "doc_id", "conv")
    val plan = Sft.conversationStats(turns)
      .queryExecution.executedPlan.toString
    // exactly one exchange below the window+agg chain (the agg reuses
    // the window's hash partitioning on doc_id)
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 1, s"$exchanges exchanges:\n${plan.take(2000)}")
  }

  test("dedupByAssistant: same responses collapse whatever the user said") {
    val turns = Sft.parseTurns(df(
        1L -> conv("user" -> "how do I sort", "assistant" -> "use quicksort"),
        2L -> conv("user" -> "sorting help pls", "assistant" -> "use quicksort"),
        3L -> conv("user" -> "a", "assistant" -> "use quicksort",
          "user" -> "b", "assistant" -> "with a pivot"),
        4L -> conv("user" -> "no reply here"),
        5L -> conv("user" -> "also no reply")), "doc_id", "conv")
    val out = Sft.dedupByAssistant(turns).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_convs")).toMap
    // 1 and 2 share the response key (survivor 1, n=2); 3 is distinct;
    // 4 and 5 both have the empty key and collapse to 4
    assert(out == Map(1L -> 2L, 3L -> 1L, 4L -> 2L))
  }

  test("packing composes: assistant-token budget via packSequences") {
    val s = spark
    import s.implicits._
    val stats = Sft.conversationStats(Sft.parseTurns(df(
        (1L to 8L).map(i => i -> conv(
          "user" -> "q q q", "assistant" -> Seq.fill(i.toInt)("t").mkString(" "))): _*),
      "doc_id", "conv"))
      .select(col("doc_id"), lit("sft").as("source"),
        col("assistant_tokens").as("tokens"))
    val packed = graft.operators.Sampling.packSequences(
      stats, "source", "doc_id", col("tokens"), budget = 10L)
    val byBatch = packed.groupBy(col("batch_id"))
      .agg(sum(col("n_tokens")).as("t")).collect()
    assert(byBatch.nonEmpty)
    assert(packed.count() == 8)
  }

  test("preferencePairs: argmax/argmin with pinned tie-breaks; zero-margin prompts dropped") {
    val s = spark
    import s.implicits._
    val cand = Seq(
      // prompt A: clear ranking
      ("A", "ok answer", 5L), ("A", "best answer", 9L), ("A", "bad", 1L),
      // prompt B: top score TIED — chosen = lexicographically smaller
      ("B", "zz response", 7L), ("B", "aa response", 7L), ("B", "meh", 2L),
      // prompt C: all scores equal -> no learnable margin -> dropped
      ("C", "x", 3L), ("C", "y", 3L),
      // prompt D: single candidate -> chosen == rejected -> dropped
      ("D", "only", 4L)
    ).toDF("prompt", "response", "score")
    val out = Sft.preferencePairs(cand, "prompt", "response", "score")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out.keySet == Set("A", "B"))
    assert(out("A") == (("best answer", 9L, "bad", 1L, 8L)))
    // tie at the top: "aa response" wins (response asc); rejected is
    // the true minimum
    assert(out("B") == (("aa response", 7L, "meh", 2L, 5L)))
  }
}
