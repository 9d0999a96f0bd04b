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

  test("rouge2Pairs: distinct-bigram max-recall inside prefix blocks only") {
    val s = spark
    import s.implicits._
    val resp = Seq(
      // 1↔2: same 2-token prefix block; bigrams of 1 = {ab,bc,cd,de}
      // (4), of 2 = {ab,bc,cd,dX} (4), overlap 3 → rouge2 = 0.75
      1L -> "a b c d e",
      2L -> "a b c d X",
      // 3: IDENTICAL text to 4 but different prefix → different block
      // from 1/2; 3↔4 same block, overlap 4/4 = 1.0
      3L -> "z w c d e",
      4L -> "z w c d e",
      // 5: shares bigrams {c d, d e} with 1 but prefix "q r" → never
      // a candidate (documented zero recall outside the block)
      5L -> "q r c d e",
      // 6: single token → no bigram → pairs with nothing
      6L -> "solo"
    ).toDF("id", "response")
    val pairs = Sft.rouge2Pairs(resp, "id", "response",
        blockTokens = 2, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 100) / 100)).toSet
    assert(pairs == Set((1L, 2L, 0.75), (3L, 4L, 1.0)))
  }

  test("rouge2Pairs: max-recall is asymmetric-length aware; repeats collapse") {
    val s = spark
    import s.implicits._
    // short = {ab,bc} (2 distinct); long = {ab,bc,cd,de,ef} (5);
    // overlap 2 → max(2/2, 2/5) = 1.0: the short response is entirely
    // contained, which is exactly what max-recall is for. Repeated
    // bigrams in "a b a b c" collapse to the distinct set.
    val resp = Seq(11L -> "a b c", 12L -> "a b c d e f",
        13L -> "a b a b c").toDF("id", "response")
    val got = Sft.rouge2Pairs(resp, "id", "response",
        blockTokens = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // 11↔12 contained (1.0); 11↔13 distinct sets equal {ab,bc,ba} vs
    // {ab,bc}: overlap 2 → max(2/2, 2/3) = 1.0; 12↔13 overlap 2 →
    // max(2/5, 2/3) < 0.99 dropped
    assert(got == Set((11L, 12L, 1.0), (11L, 13L, 1.0)))
  }

  test("rougeLPairs: LCS is order-sensitive where bigram sets are not") {
    val s = spark
    import s.implicits._
    val resp = Seq(
      // 31 vs 32: shared subsequence a b c d with one insertion each →
      // LCS 4, lens 5/5, rouge_l = 0.8
      31L -> "a b x c d",
      32L -> "a b c y d",
      // 33: same TOKENS as 31 but tail swapped — vs 31 LCS keeps 4
      // (a b x + one of {c,d}); vs 32 the c/d inversion cuts LCS to 3
      // (a b + one of {c,d}) → 0.6, below threshold: order sensitivity
      33L -> "a b x d c",
      // 34: shares only the block prefix → LCS 2, 0.4, dropped
      34L -> "a b p q r"
    ).toDF("id", "response")
    val got = Sft.rougeLPairs(resp, "id", "response",
        blockTokens = 2, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.rint(r.getDouble(3) * 100) / 100)).toSet
    assert(got == Set((31L, 32L, 4L, 0.8), (31L, 33L, 4L, 0.8)))
  }

  test("rougeLPairs: containment max-recall and short-response gating") {
    val s = spark
    import s.implicits._
    val resp = Seq(
      41L -> "a b c",          // subsequence of 42 → LCS 3, max-recall 1.0
      42L -> "a b q c r s",
      43L -> "a"               // < blockTokens → excluded entirely
    ).toDF("id", "response")
    val got = Sft.rougeLPairs(resp, "id", "response",
        blockTokens = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set((41L, 42L, 3L, 1.0)))
  }

  test("rouge2Dedup: transitive min-id survivor across a chained component") {
    val s = spark
    import s.implicits._
    // 21–23 chain inside one block (21~22 and 22~23 high, 21~23 may or
    // may not pair — transitivity must still collapse all three);
    // 24 unrelated same block; 25 its own block
    val resp = Seq(
      21L -> "p q r s t u",
      22L -> "p q r s t v",   // vs 21: 4/5 overlap = 0.8
      23L -> "p q r s w v",   // vs 22: {pq,qr,rs,sw,wv}∩{pq,qr,rs,st,tv}=3 → 0.6
      24L -> "p q 1 2 3 4",   // vs others: only {pq} → 0.2
      25L -> "k k k k"
    ).toDF("id", "response")
    val kept = Sft.rouge2Dedup(resp, "id", "response",
        blockTokens = 2, threshold = 0.6)
      .select(col("id")).as[Long].collect().toSet
    assert(kept == Set(21L, 24L, 25L))
  }
}
