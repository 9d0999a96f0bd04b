package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization, tokenizer-exact (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units",
  * arXiv:1508.07909): a word's symbols start as its codepoints plus an
  * explicit end-of-word marker `</w>`, and the committed merge list is
  * replayed in rank order — at each step the lowest-ranked applicable
  * pair merges across the word, all occurrences left-to-right.
  *
  * This replaces the heuristic subword ESTIMATE
  * ([[graft.text.TextFunctions.subwordCount]], which survives as the
  * no-artifact fallback) everywhere a count feeds a budget: token
  * budgets, sequence packing, and data-constrained allocation now mean
  * exactly what a trainer consuming the same artifact would measure.
  * The reference pipeline has no tokenizer at all (its text handling
  * stops at extraction, `src/ingestion/extractors.py:100-117`); this is
  * part of the training-data extension surface.
  *
  * Artifact: `merges.txt` (rank-ordered `left right` lines under a
  * `#version` header) + `vocab.txt` (one symbol per line), the format
  * every public BPE distribution uses. The committed default under
  * `src/main/resources/graft/bpe/` was trained by `tools/train_bpe.py`
  * (deterministic tie-breaks) on the sf0.01 documents corpus with 40
  * merges — few enough that words still split into subwords.
  *
  * Scale design: the artifact is a driver-bounded object (merge lists
  * ship at 10⁴–10⁵ lines; GPT-2's is 50k) loaded ONCE per executor from
  * the classpath/filesystem and shared across all tasks via the
  * process-wide registry — it rides the closure as a short string key,
  * never as data. Tokenization is per-row work inside whole-stage
  * codegen, with a per-word memo (natural-language corpora repeat
  * words endlessly; the memo is capped and cleared at 2²⁰ entries so a
  * pathological corpus of unique words cannot grow it unboundedly).
  */
object Bpe {

  /** A loaded tokenizer: merge ranks + vocabulary. */
  final class Artifact(val key: String, val merges: Array[(String, String)],
      val vocab: Array[String]) {
    private[functions] val ranks = {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        m.put(l + " " + r, i)
      }
      m
    }
    private[functions] val vocabSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](vocab.length * 2)
      vocab.foreach(s.add)
      s
    }
    private[functions] val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  }

  val EndOfWord = "</w>"
  private val MemoCap = 1 << 20

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Artifact]()

  /** Load (and cache process-wide) the artifact named by `key`:
    * `"default"` → the committed classpath fixture; `"file:<dir>"` →
    * `<dir>/merges.txt` + `<dir>/vocab.txt` on the local filesystem
    * (a path every executor can read — distribute via `--files` or a
    * shared mount on a real cluster); `"parquet:<dir>"` → the parquet
    * artifact table [[graft.text.BpeTrain.saveParquet]] writes, read
    * executor-side through parquet-hadoop (no SparkSession needed). */
  def artifact(key: String): Artifact =
    registry.computeIfAbsent(key, k => load(k))

  /** Read the parquet artifact table directly with parquet-hadoop —
    * callable from executors (tokenization expressions resolve their
    * artifact lazily inside tasks, where no SparkSession exists). The
    * version row's expected counts gate against a torn write. */
  private def loadParquet(key: String): Artifact = {
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val dir = new java.io.File(key.stripPrefix("parquet:"))
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    require(files.nonEmpty, s"no parquet files under $dir")
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, Int, String, String, String)]
    files.foreach { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(),
          new org.apache.hadoop.fs.Path(f.getPath))
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          rows += ((g.getString("kind", 0), g.getInteger("rank", 0),
            g.getString("lhs", 0), g.getString("rhs", 0),
            g.getString("sym", 0)))
          g = reader.read()
        }
      } finally reader.close()
    }
    val version = rows.filter(_._1 == "version")
    require(version.length == 1,
      s"artifact at $dir: expected exactly one version row, got ${version.length}")
    require(version.head._5 == "graft-bpe-1",
      s"artifact at $dir: unknown version '${version.head._5}'")
    val merges = rows.filter(_._1 == "merge").sortBy(_._2)
      .map(r => (r._3, r._4)).toArray
    val vocab = rows.filter(_._1 == "vocab").sortBy(_._2).map(_._5).toArray
    require(merges.length == version.head._3.toInt &&
      vocab.length == version.head._4.toInt,
      s"artifact at $dir is torn: ${merges.length}/${version.head._3} merges, " +
        s"${vocab.length}/${version.head._4} vocab")
    new Artifact(key, merges, vocab)
  }

  private def load(key: String): Artifact = {
    if (key.startsWith("parquet:")) return loadParquet(key)
    def readLines(open: => java.io.InputStream): Array[String] = {
      val in = open
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
      finally in.close()
    }
    val (mergeLines, vocabLines) = key match {
      case "default" =>
        def res(name: String) = {
          val s = getClass.getResourceAsStream(s"/graft/bpe/$name")
          require(s != null, s"missing classpath resource graft/bpe/$name")
          s
        }
        (readLines(res("merges.txt")), readLines(res("vocab.txt")))
      case k if k.startsWith("file:") =>
        val dir = k.stripPrefix("file:")
        (readLines(new java.io.FileInputStream(s"$dir/merges.txt")),
          readLines(new java.io.FileInputStream(s"$dir/vocab.txt")))
      case other =>
        throw new IllegalArgumentException(
          s"unknown BPE artifact key '$other' " +
            "(use \"default\", \"file:<dir>\", or \"parquet:<dir>\")")
    }
    val merges = mergeLines.iterator
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && sp < l.length - 1, s"malformed merge line: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }.toArray
    new Artifact(key, merges, vocabLines.filter(_.nonEmpty))
  }

  /** Encode ONE word (no whitespace) to its BPE symbols. Exposed for
    * tests and for hosts that need token strings rather than counts. */
  def encodeWord(word: String, art: Artifact): Array[String] = {
    val cached = art.memo.get(word)
    if (cached != null) return cached
    // initial symbols: codepoints (matches the oracle's per-character
    // split — NOT UTF-16 chars, which would diverge on non-BMP input)
    var syms = {
      val b = Array.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b += EndOfWord
      b.result()
    }
    var done = false
    while (!done && syms.length > 1) {
      // lowest-ranked pair present anywhere in the word
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = art.ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (l, r) = art.merges(bestRank)
        val merged = l + r
        // merge ALL occurrences, left-to-right non-overlapping
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += merged; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    if (art.memo.size() >= MemoCap) art.memo.clear()
    art.memo.put(word, syms)
    syms
  }
}

/** Static entry points referenced from generated code (same pattern as
  * [[NativeTextImpl]]: a static call keeps the expression inside
  * whole-stage codegen, no UDF/serialization boundary). */
object BpeImpl {

  /** Total BPE tokens in a text: Σ over whitespace words (empty
    * fragments from leading/trailing space skipped, matching the
    * oracle's `w <> ''` filter). */
  def count(text: UTF8String, key: String): Int = {
    val art = Bpe.artifact(key)
    val words = NativeTextImpl.tokenize(text)
    var n = 0
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) n += Bpe.encodeWord(words(i), art).length
      i += 1
    }
    n
  }

  /** A word's INITIAL training symbols: codepoints + `</w>` — the
    * round-zero state of the trainer ([[graft.text.BpeTrain]]). */
  def initSyms(word: UTF8String): GenericArrayData = {
    val s = word.toString
    val out = Array.newBuilder[Any]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out += UTF8String.fromString(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    out += UTF8String.fromString(Bpe.EndOfWord)
    new GenericArrayData(out.result())
  }

  /** One training merge applied to a symbol sequence: every adjacent
    * (l, r) merges, left-to-right non-overlapping — identical to the
    * per-word inner loop of [[Bpe.encodeWord]]. */
  def mergePair(syms: org.apache.spark.sql.catalyst.util.ArrayData,
      l: UTF8String, r: UTF8String): GenericArrayData = {
    val n = syms.numElements()
    val out = Array.newBuilder[Any]
    var j = 0
    while (j < n) {
      val cur = syms.getUTF8String(j)
      if (j < n - 1 && cur.equals(l) && syms.getUTF8String(j + 1).equals(r)) {
        out += UTF8String.concat(l, r); j += 2
      } else { out += cur; j += 1 }
    }
    new GenericArrayData(out.result())
  }

  /** All BPE tokens of a text in order, as array<string>. */
  def tokens(text: UTF8String, key: String): GenericArrayData = {
    val art = Bpe.artifact(key)
    val words = NativeTextImpl.tokenize(text)
    val out = Array.newBuilder[Any]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val syms = Bpe.encodeWord(words(i), art)
        var j = 0
        while (j < syms.length) {
          out += UTF8String.fromString(syms(j)); j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }
}

/** string → int: exact BPE token count, codegen'd. */
case class BpeCountExpr(child: Expression, artifactKey: String)
    extends UnaryExpression {
  // fail at plan time, not mid-job on every task
  Bpe.artifact(artifactKey)
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeImpl.count(input.asInstanceOf[UTF8String], artifactKey)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyLit = ctx.addReferenceObj("bpeKey", artifactKey, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.count($c, $keyLit)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** string → array<string>: the BPE token sequence, codegen'd. */
case class BpeTokensExpr(child: Expression, artifactKey: String)
    extends UnaryExpression {
  Bpe.artifact(artifactKey)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_bpe_tokens"

  override protected def nullSafeEval(input: Any): Any =
    BpeImpl.tokens(input.asInstanceOf[UTF8String], artifactKey)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyLit = ctx.addReferenceObj("bpeKey", artifactKey, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.tokens($c, $keyLit)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokensExpr =
    copy(child = newChild)
}

/** string → array<string>: a word's initial TRAINING symbols
  * (codepoints + `</w>`), codegen'd — the round-zero projection of the
  * distributed trainer ([[graft.text.BpeTrain.trainDistributed]]). */
case class BpeInitSymsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_bpe_init_syms"

  override protected def nullSafeEval(input: Any): Any =
    BpeImpl.initSyms(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.initSyms($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeInitSymsExpr =
    copy(child = newChild)
}

/** array<string> → array<string>: one training merge (l, r) applied
  * left-to-right non-overlapping, codegen'd. The pair rides the
  * expression as constants — a new (tiny) plan per training round. */
case class BpeMergePairExpr(child: Expression, l: String, r: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def prettyName: String = "graft_bpe_merge_pair"

  @transient private lazy val lU = UTF8String.fromString(l)
  @transient private lazy val rU = UTF8String.fromString(r)

  override protected def nullSafeEval(input: Any): Any =
    BpeImpl.mergePair(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], lU, rU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeL", lU, "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("bpeR", rU, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.mergePair($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePairExpr =
    copy(child = newChild)
}

/** array<string> → array<struct<step:int, l:string, r:string, c:long>>:
  * the per-word VERIFICATION TRACE of a speculative multi-merge batch
  * ([[graft.text.BpeTrain.trainDistributedStats]]'s verified
  * speculation). Applies the batch merges to the word's symbols one at
  * a time (identical left-to-right non-overlapping semantics as
  * [[BpeImpl.mergePair]]) and, at every state from `minState` merges
  * applied through `batch.size` (the FINAL state included — its exact
  * counts seed the next speculation leg of the chained-replay round),
  * emits the
  * word's counts of every RELEVANT adjacent pair — one in the
  * `tracked` top-K list or touching a batch output symbol. Aggregated
  * over the dictionary (× word freq), these are the EXACT corpus pair
  * counts along the speculated trajectory: the driver verifies each
  * speculative step's winner against them, with every untracked pair
  * bounded by the round's pair floor (pairs not touching an output
  * symbol never gain occurrences during the batch).
  *
  * Cost shape: O(len × batch) per word, map-side; output rows per word
  * bounded by states × relevant pairs present. The batch/tracked
  * constants ride `addReferenceObj`, so the generated source is
  * round-independent (one janino compile for all rounds). */
case class BpeBatchReplayExpr(child: Expression,
    batch: Seq[(String, String)], tracked: Seq[(String, String)],
    minState: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("step", IntegerType, nullable = false),
    StructField("l", StringType, nullable = false),
    StructField("r", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def prettyName: String = "graft_bpe_batch_replay"

  @transient private lazy val batchU: Array[(UTF8String, UTF8String)] =
    batch.iterator.map { case (l, r) =>
      (UTF8String.fromString(l), UTF8String.fromString(r))
    }.toArray
  @transient private lazy val trackedSet =
    tracked.iterator.map { case (l, r) =>
      (UTF8String.fromString(l), UTF8String.fromString(r))
    }.to(scala.collection.immutable.HashSet)
  @transient private lazy val outputSet =
    batch.iterator.map { case (l, r) => UTF8String.fromString(l + r) }
      .to(scala.collection.immutable.HashSet)

  private def applyMerge(syms: Array[UTF8String], l: UTF8String,
      r: UTF8String): Array[UTF8String] = {
    val out = Array.newBuilder[UTF8String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j).equals(l) &&
          syms(j + 1).equals(r)) {
        out += UTF8String.concat(l, r); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Called from generated code. */
  def replay(input: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val n = input.numElements()
    var cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) { cur(i) = input.getUTF8String(i); i += 1 }
    val out = Array.newBuilder[Any]
    val counts =
      scala.collection.mutable.HashMap.empty[(UTF8String, UTF8String), Long]
    var j = 1
    while (j <= batchU.length) {
      cur = applyMerge(cur, batchU(j - 1)._1, batchU(j - 1)._2)
      if (j >= minState) {
        counts.clear()
        var i2 = 0
        while (i2 < cur.length - 1) {
          val a = cur(i2); val b = cur(i2 + 1)
          if (outputSet.contains(a) || outputSet.contains(b) ||
              trackedSet.contains((a, b)))
            counts.updateWith((a, b))(v => Some(v.getOrElse(0L) + 1L))
          i2 += 1
        }
        counts.foreach { case ((l, r), c) =>
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](j, l, r, c))
        }
      }
      j += 1
    }
    new GenericArrayData(out.result())
  }

  override protected def nullSafeEval(input: Any): Any =
    replay(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeReplay", this,
      "graft.functions.BpeBatchReplayExpr")
    defineCodeGen(ctx, ev, c => s"$ref.replay($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeBatchReplayExpr =
    copy(child = newChild)
}

object NativeBpe {
  /** Column wrappers. */
  def bpeTokenCount(text: Column, artifactKey: String = "default"): Column =
    GraftShims.column(BpeCountExpr(GraftShims.expression(text), artifactKey))
  def bpeTokens(text: Column, artifactKey: String = "default"): Column =
    GraftShims.column(BpeTokensExpr(GraftShims.expression(text), artifactKey))
  def bpeInitSyms(word: Column): Column =
    GraftShims.column(BpeInitSymsExpr(GraftShims.expression(word)))
  def bpeMergePair(syms: Column, l: String, r: String): Column =
    GraftShims.column(BpeMergePairExpr(GraftShims.expression(syms), l, r))
  def bpeBatchReplay(syms: Column, batch: Seq[(String, String)],
      tracked: Seq[(String, String)], minState: Int): Column =
    GraftShims.column(BpeBatchReplayExpr(GraftShims.expression(syms),
      batch, tracked, minState))
}
