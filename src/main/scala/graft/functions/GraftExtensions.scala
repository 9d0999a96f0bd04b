package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of the engine's native expressions, so
  * `spark.sql("SELECT graft_simhash64(text) …")` works alongside the
  * Column API.
  *
  * Two installation paths:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (applied at session build — the standard library-extension hook);
  *  - runtime: `GraftExtensions.install(spark)` for an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.SafeBroadcastRule())
    // row_number()<=k window-filter → bounded-heap TopKPerKey, plus the
    // strategy that plans the rewritten node
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule())
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  /** Exact-arity gate for every SQL builder: a call with the wrong
    * argument count must fail the ANALYSIS, not silently ignore the
    * extras (e.g. `graft_bpe_count('x', 'mydict')` quietly tokenizing
    * with the default dictionary). */
  private def arity(args: Seq[Expression], n: Int, fn: String): Seq[Expression] = {
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$fn expects exactly $n argument(s), got ${args.length}")
    args
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_simhash64",
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash64"),
      (args: Seq[Expression]) =>
        SimHash64Expr(arity(args, 1, "graft_simhash64").head)),
    ("graft_simhash_md5",
      new ExpressionInfo(classOf[SimHashMd5Expr].getName, "graft_simhash_md5"),
      (args: Seq[Expression]) =>
        SimHashMd5Expr(arity(args, 1, "graft_simhash_md5").head)),
    ("graft_nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName,
        "graft_nfc_normalize"),
      (args: Seq[Expression]) =>
        NfcNormalizeExpr(arity(args, 1, "graft_nfc_normalize").head)),
    ("graft_lcs_length",
      new ExpressionInfo(classOf[LcsLengthExpr].getName, "graft_lcs_length"),
      (args: Seq[Expression]) => { arity(args, 2, "graft_lcs_length")
        LcsLengthExpr(args(0), args(1)) }),
    ("graft_shingles",
      new ExpressionInfo(classOf[TokenShinglesExpr].getName, "graft_shingles"),
      (args: Seq[Expression]) => { arity(args, 2, "graft_shingles")
        TokenShinglesExpr(args(0), intArg(args(1), "graft_shingles")) }),
    ("graft_shingles_all",
      new ExpressionInfo(classOf[TokenShinglesAllExpr].getName,
        "graft_shingles_all"),
      (args: Seq[Expression]) => { arity(args, 2, "graft_shingles_all")
        TokenShinglesAllExpr(args(0), intArg(args(1), "graft_shingles_all")) }),
    ("graft_dotq",
      new ExpressionInfo(classOf[DotQExpr].getName, "graft_dotq"),
      (args: Seq[Expression]) => { arity(args, 2, "graft_dotq")
        DotQExpr(args(0), args(1)) }),
    ("graft_chunks",
      new ExpressionInfo(classOf[ChunkTokensExpr].getName, "graft_chunks"),
      (args: Seq[Expression]) => { arity(args, 3, "graft_chunks")
        ChunkTokensExpr(args(0),
          intArg(args(1), "graft_chunks"), intArg(args(2), "graft_chunks")) }),
    ("graft_top_ngram",
      new ExpressionInfo(classOf[TopNgramExpr].getName, "graft_top_ngram"),
      (args: Seq[Expression]) => { arity(args, 2, "graft_top_ngram")
        TopNgramExpr(args(0), intArg(args(1), "graft_top_ngram")) }),
    ("graft_top_char_grams",
      new ExpressionInfo(classOf[TopCharGramsExpr].getName,
        "graft_top_char_grams"),
      (args: Seq[Expression]) => { arity(args, 3, "graft_top_char_grams")
        TopCharGramsExpr(args(0),
          intArg(args(1), "graft_top_char_grams"),
          intArg(args(2), "graft_top_char_grams")) }),
    ("graft_deflate_len",
      new ExpressionInfo(classOf[DeflateLenExpr].getName,
        "graft_deflate_len"),
      (args: Seq[Expression]) =>
        DeflateLenExpr(arity(args, 1, "graft_deflate_len").head)),
    ("graft_bpe_count",
      new ExpressionInfo(classOf[BpeCountExpr].getName, "graft_bpe_count"),
      (args: Seq[Expression]) =>
        BpeCountExpr(arity(args, 1, "graft_bpe_count").head, "default")),
    ("graft_bpe_tokens",
      new ExpressionInfo(classOf[BpeTokensExpr].getName, "graft_bpe_tokens"),
      (args: Seq[Expression]) =>
        BpeTokensExpr(arity(args, 1, "graft_bpe_tokens").head, "default")),
    ("graft_lang_id",
      new ExpressionInfo(classOf[LangIdProfileExpr].getName,
        "graft_lang_id"),
      (args: Seq[Expression]) =>
        LangIdProfileExpr(arity(args, 1, "graft_lang_id").head)),
    ("graft_heavy_hitters",
      new ExpressionInfo(classOf[HeavyHittersAgg].getName,
        "graft_heavy_hitters"),
      (args: Seq[Expression]) => { arity(args, 2, "graft_heavy_hitters")
        HeavyHittersAgg(args(0),
          intArg(args(1), "graft_heavy_hitters")).toAggregateExpression() }))

  /** Register on an already-built session. */
  def install(spark: SparkSession): Unit = {
    functions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.GraftShims.registerFunction(spark, name, info, builder)
    }
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.plans.SafeBroadcastRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.SafeBroadcastRule()
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.plans.TopKRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.TopKRewriteRule()
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
  }
}
