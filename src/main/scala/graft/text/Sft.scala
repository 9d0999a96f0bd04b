package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SFT / conversation-data preparation: the post-pretraining slice of a
  * training-data pipeline — parse serialized chat transcripts into
  * typed turns, validate the role protocol, and account tokens per
  * role (assistant tokens are the ones a supervised-fine-tuning loss
  * actually trains on, so budget math runs on THEM, not raw length).
  * The reference has no conversation layer (its JSON handling is the
  * props-extraction path, `src/ingestion/extractors.py`); this extends
  * the LLM-pipeline surface the same way the curation operators do.
  *
  * Scale shape: parsing is `from_json` + `posexplode` — map-only,
  * codegen'd, no UDF. Per-conversation validation/stats run one
  * turn-ordered window and one aggregate on the SAME doc_id shuffle
  * (the window's partition key), so a conversation costs its turn
  * count, never a second exchange. Packing composes with
  * [[graft.operators.Sampling.packSequences]] over the per-doc
  * assistant-token counts. */
object Sft {

  /** The wire schema of one serialized conversation: an ordered JSON
    * array of {role, content} turns (the ChatML/ShareGPT common core). */
  val turnSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Conversations → one row per turn: (doc_id, turn_idx, role,
    * content). Malformed JSON yields a NULL parse and contributes no
    * turns (posexplode of NULL drops the row) — corrupt transcripts
    * are absent, not job-killing. */
  def parseTurns(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(from_json(col(jsonCol), turnSchema)).as(Seq("pos", "t")))
      .select(col("doc_id"), col("pos").cast(IntegerType).as("turn_idx"),
        col("t.role").as("role"), col("t.content").as("content"))

  /** Whitespace token count of a turn — the cheap approximate
    * tokenizer, for callers that opt out of the BPE default. */
  def whitespaceTokens(content: Column): Column =
    size(split(content, "\\s+")).cast(LongType)

  /** Tokenizer-exact turn count over the committed BPE artifact — the
    * DEFAULT input to every budget consumer here: an SFT token budget
    * means tokens as the trainer's tokenizer counts them, not
    * whitespace words. */
  def bpeTurnTokens(content: Column): Column =
    TextFunctions.bpeTokenCount(content).cast(LongType)

  /** Exact conversation dedup on ASSISTANT content: two transcripts
    * that elicit the same responses are training duplicates even when
    * the user phrasing differs, so the dedup key is the ordered
    * concatenation of assistant turns only. One (doc, key) aggregate +
    * the first-wins groupBy — the [[graft.dedup.Dedup]] exact pattern;
    * near-dup variants compose by feeding the same key column to the
    * MinHash pipeline. Conversations with NO assistant turns have an
    * empty key and dedup among themselves (deliberate: all-user
    * transcripts carry no trainable signal to distinguish).
    *
    * The key is md5 over the CONCATENATION OF PER-TURN MD5s (each a
    * fixed 32-hex block), not over delimiter-joined raw contents — a
    * separator char can appear inside a turn, so joining on it would
    * collide a one-turn "a\nb" with a two-turn ["a","b"]; fixed-width
    * blocks make the encoding prefix-free and collision-free. */
  def dedupByAssistant(turns: DataFrame): DataFrame = {
    val keys = turns
      .groupBy(col("doc_id"))
      .agg(md5(concat_ws("",
        transform(
          sort_array(collect_list(when(col("role") === "assistant",
            struct(col("turn_idx"), col("content"))))).getField("content"),
          c => md5(c))))
        .as("assistant_md5"))
    keys.groupBy(col("assistant_md5"))
      .agg(min(col("doc_id")).as("doc_id"),
        count(lit(1)).cast(LongType).as("n_convs"))
  }

  /** Per-conversation protocol validation + token accounting:
    * `valid` requires every role ∈ {user, assistant}, the first turn
    * from the user, and strict alternation (no two consecutive turns
    * by the same role) — the contract SFT trainers assume before
    * masking. One lag window + one aggregate on the doc_id shuffle.
    *
    * Token counts are TOKENIZER-EXACT by default ([[bpeTurnTokens]],
    * the committed BPE artifact) — `assistant_tokens` is what the
    * fine-tuning loss actually trains on, so the budget consumers
    * downstream ([[graft.operators.Sampling.packSequences]],
    * [[graft.operators.Sampling.tokenBudgetMix]]) receive trainer
    * tokens; pass [[whitespaceTokens]] to opt into the cheap
    * approximation. */
  def conversationStats(turns: DataFrame,
      turnTokens: Column => Column = bpeTurnTokens): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("turn_idx"))
    turns
      .withColumn("__prev", lag(col("role"), 1).over(w))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast(LongType).as("n_turns"),
        sum((col("role") === "user").cast(LongType)).as("n_user"),
        sum((col("role") === "assistant").cast(LongType)).as("n_assistant"),
        sum(turnTokens(col("content"))).as("total_tokens"),
        sum(when(col("role") === "assistant", turnTokens(col("content")))
          .otherwise(lit(0L))).as("assistant_tokens"),
        min(when(col("turn_idx") === 0, col("role"))).as("__first"),
        // a first turn has no predecessor (NULL comparison): coalesce so
        // a single-turn conversation is alternation-valid, not NULL
        (coalesce(sum((col("role") === col("__prev")).cast(LongType)),
          lit(0L)) === 0).as("__alt"),
        (sum(col("role").isin("user", "assistant").cast(LongType)) ===
          count(lit(1))).as("__roles"))
      .withColumn("valid",
        (col("__first") === "user" && col("__alt") && col("__roles"))
          .cast(IntegerType))
      .drop("__first", "__alt", "__roles")
  }

  /** Preference-pair construction — DPO/RLHF reward-data preparation:
    * for each prompt with ≥ 2 scored candidate responses, emit
    * `(prompt, chosen, chosen_score, rejected, rejected_score,
    * margin)` where chosen/rejected are the score-argmax/argmin
    * responses (ties broken by response text ascending, so ANY engine
    * picks the identical pair); prompts whose best and worst scores
    * are EQUAL are dropped — there is no learnable margin, and
    * emitting a tie as a preference would teach noise.
    *
    * Scale: two bounded-heap top-1 passes through the custom
    * [[graft.plans.TopKPerKeyExec]] operator (one shuffle on the
    * prompt key each, ONE ROW of state per prompt — never a per-prompt
    * sort, never a collect), then a prompt-keyed join of two
    * 1-row-per-prompt frames. A 10⁹-response corpus costs two
    * key-partitioned streaming passes. */
  /** The chosen-side extreme ordering: highest score, ties to the
    * lexicographically smallest response — ONE definition shared by
    * [[preferencePairs]] and the streaming
    * [[graft.streaming.Streams.preferencePairSink]], whose
    * losslessness argument DEPENDS on both using identical orderings
    * (a drift here would silently break streamed == batch on ties). */
  def chosenOrder(responseCol: String, scoreCol: String): Seq[graft.plans.TopK.Sort] =
    Seq(graft.plans.TopK.desc(scoreCol), graft.plans.TopK.asc(responseCol))

  /** The rejected-side twin of [[chosenOrder]]: lowest score, same
    * response tie-break. */
  def rejectedOrder(responseCol: String, scoreCol: String): Seq[graft.plans.TopK.Sort] =
    Seq(graft.plans.TopK.asc(scoreCol), graft.plans.TopK.asc(responseCol))

  /** Per-prompt extreme candidates — the best and worst response row
    * of each prompt under the shared orderings (≤ 2 rows per prompt).
    * The building block both the batch pairing and the streaming
    * sink's write-only state retain. */
  def promptExtremes(df: DataFrame, promptCol: String,
      responseCol: String, scoreCol: String): DataFrame = {
    import graft.plans.TopK
    val cand = df.select(col(promptCol), col(responseCol), col(scoreCol))
    TopK.perKey(cand, Seq(promptCol),
        chosenOrder(responseCol, scoreCol), 1, rankName = "__r")
      .unionByName(TopK.perKey(cand, Seq(promptCol),
        rejectedOrder(responseCol, scoreCol), 1, rankName = "__r"))
      .drop("__r").distinct()
  }

  def preferencePairs(df: DataFrame, promptCol: String,
      responseCol: String, scoreCol: String): DataFrame = {
    import graft.plans.TopK
    val cand = df.select(col(promptCol), col(responseCol), col(scoreCol))
    val chosen = TopK.perKey(cand, Seq(promptCol),
        chosenOrder(responseCol, scoreCol), 1, rankName = "__r")
      .drop("__r")
      .withColumnRenamed(responseCol, "chosen")
      .withColumnRenamed(scoreCol, "chosen_score")
    val rejected = TopK.perKey(cand, Seq(promptCol),
        rejectedOrder(responseCol, scoreCol), 1, rankName = "__r")
      .drop("__r")
      .withColumnRenamed(responseCol, "rejected")
      .withColumnRenamed(scoreCol, "rejected_score")
    chosen.join(rejected, Seq(promptCol))
      .filter(col("chosen_score") > col("rejected_score"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
  }

  /** Self-Instruct-style ROUGE near-dup PAIRS over instruction
    * responses (Wang et al. 2022, "Self-Instruct", §3.2 filter ROUGE-L
    * < 0.7 vs existing instructions — here the batch-corpus spelling):
    * distinct-bigram ROUGE-2 max-recall within deterministic
    * first-`blockTokens` prefix blocks.
    *
    * Semantics, precisely: rouge2(a,b) = max(|B_a∩B_b|/|B_a|,
    * |B_a∩B_b|/|B_b|) over DISTINCT bigram sets (official ROUGE clips
    * multiset counts; the set rendering is the SQL-replayable variant
    * and coincides whenever no bigram repeats within a response).
    * Responses with no bigram (< 2 tokens) pair with nothing. Blocking
    * is the [[graft.dedup.Dedup.blockedJaccardPairs]] contract: only
    * pairs agreeing on the token prefix are candidates — provable
    * recall within the block, zero recall outside it, documented
    * rather than probabilistic. ROUGE-L proper is available as the
    * native LCS expression ([[graft.functions.NativeText.lcsLength]])
    * for per-pair rescoring; it is not SQL-expressible, so the
    * oracle-gated corpus rule is ROUGE-2.
    *
    * Scale: one shuffle on the block key; within-block pairing is the
    * shuffle_hash self-join; everything after is per-pair expression
    * work. */
  def rouge2Pairs(df: DataFrame, idCol: String, respCol: String,
      blockTokens: Int = 2, threshold: Double = 0.6): DataFrame = {
    val toks = TextFunctions.tokens(col(respCol))
    val withB = df.select(col(idCol).as("__id"),
        concat_ws(" ", slice(toks, 1, blockTokens)).as("__blk"),
        array_distinct(TextFunctions.tokenShingles(col(respCol), 2)).as("__bg"))
      .where(size(col("__bg")) > 0)
    withB.as("l").hint("shuffle_hash").join(withB.as("r"),
        col("l.__blk") === col("r.__blk") && col("l.__id") < col("r.__id"))
      .withColumn("__ovl",
        size(array_intersect(col("l.__bg"), col("r.__bg"))).cast(DoubleType))
      .withColumn("rouge2", greatest(
        col("__ovl") / size(col("l.__bg")),
        col("__ovl") / size(col("r.__bg"))))
      .filter(col("rouge2") >= threshold)
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        col("rouge2"))
  }

  /** ROUGE-L rescoring over the same prefix-blocked candidates as
    * [[rouge2Pairs]] (Lin 2004 §3): lcs = longest common SUBSEQUENCE
    * of the token arrays (order-sensitive, gaps allowed — catches
    * reorder-with-insertions near-dups whose bigram sets diverge),
    * rouge_l = max(lcs/|a|, lcs/|b|), the max-recall convention the
    * bigram variant uses. Requires ≥ `blockTokens` tokens so the
    * block is a full prefix and both denominators are nonzero.
    *
    * Scale: identical shape to [[rouge2Pairs]] — one block-key
    * shuffle, per-pair work is the codegen'd O(|a|·|b|) LCS DP
    * ([[graft.functions.NativeText.lcsLength]]); responses are
    * bounded-length by construction upstream, so per-pair cost is a
    * constant, and blocking keeps the pair count linear in the hot
    * block size (star-capped upstream where corpora are adversarial). */
  def rougeLPairs(df: DataFrame, idCol: String, respCol: String,
      blockTokens: Int = 2, threshold: Double = 0.7): DataFrame = {
    val toks = TextFunctions.tokens(col(respCol))
    val withT = df.select(col(idCol).as("__id"),
        concat_ws(" ", slice(toks, 1, blockTokens)).as("__blk"),
        toks.as("__t"))
      .where(size(col("__t")) >= math.max(blockTokens, 1))
    withT.as("l").hint("shuffle_hash").join(withT.as("r"),
        col("l.__blk") === col("r.__blk") && col("l.__id") < col("r.__id"))
      .withColumn("lcs",
        graft.functions.NativeText.lcsLength(col("l.__t"), col("r.__t")))
      .withColumn("rouge_l", greatest(
        col("lcs") / size(col("l.__t")), col("lcs") / size(col("r.__t"))))
      .filter(col("rouge_l") >= threshold)
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        col("lcs"), col("rouge_l"))
  }

  /** Apply [[rouge2Pairs]] with transitive-closure survivor semantics
    * (minimum id per duplicate component survives — the
    * order-independent corpus spelling of Self-Instruct's greedy
    * arrival filter, conservative: it never keeps a response the
    * greedy filter would drop). Returns surviving rows of `df`. */
  def rouge2Dedup(df: DataFrame, idCol: String, respCol: String,
      blockTokens: Int = 2, threshold: Double = 0.6): DataFrame =
    graft.dedup.Dedup.removeNearDuplicatesTransitive(df,
      rouge2Pairs(df, idCol, respCol, blockTokens, threshold), idCol)
}
