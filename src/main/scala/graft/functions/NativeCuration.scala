package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled single-pass scorers for the Gopher/C4 curation gates
  * ([[graft.text.Curation]]) — the last corpus-linear ArrayFilter
  * walks in the pretrain flagship.
  *
  * The Column spellings those gates shipped with
  * (`size(filter(tokens, t => t.rlike(...)))`,
  * `size(filter(lines, l => ...))`, the C4 line filter) are
  * `ArrayFilter`, which is `CodegenFallback`: every document pays an
  * interpreted per-element closure walk — plus the `split` that
  * materializes the token/line array only so the filter can walk it.
  * Each expression here is the identical predicate as ONE compiled
  * byte-level pass over the document, no intermediate array, inside
  * whole-stage codegen — the same tax class the round-12 quantize
  * measurement put at 3–3.8×.
  *
  * Parity contract (pinned by NativeCurationSpec against the retained
  * HOF reference spellings, including unicode adversaria): tokens are
  * Java-regex `\s+` runs (`\s` = `[ \t\n\x0B\f\r]`, ASCII-only — all
  * single UTF-8 bytes, so byte scanning never mis-splits a multi-byte
  * code point); `trim` strips ASCII space 0x20 only (Spark's
  * `StringTrim` default); startsWith/endsWith/contains are binary
  * (UTF8_BINARY collation).
  */
object NativeCurationImpl {
  /** Java regex `\s` (no UNICODE_CHARACTER_CLASS): space, tab, LF,
    * VT, FF, CR — the separator class of Spark's `split("\\s+")`. */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C ||
      b == 0x0D

  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  /** Count of `\s+` tokens containing at least one ASCII letter —
    * `size(filter(split(text, "\\s+"), t => t.rlike("[A-Za-z]")))`.
    * Boundary empty tokens contain no letter, so counting letter-
    * bearing non-whitespace RUNS is exact. */
  def alphaTokenCount(s: UTF8String): Long = {
    val b = s.getBytes
    var i = 0; var n = 0L
    var inRun = false; var runAlpha = false
    while (i < b.length) {
      val c = b(i)
      if (isWs(c)) {
        if (inRun && runAlpha) n += 1
        inRun = false; runAlpha = false
      } else {
        inRun = true
        if (isAlpha(c)) runAlpha = true
      }
      i += 1
    }
    if (inRun && runAlpha) n += 1
    n
  }

  /** `(n_lines, n_bullet, n_ellipsis)` over `split(text, "\n", -1)`:
    * line count, lines whose space-trimmed form starts with '-' or
    * '*', lines whose space-trimmed form ends with "...". */
  def gopherLineStats(s: UTF8String): InternalRow = {
    val b = s.getBytes
    var nLines = 1L; var nBullet = 0L; var nEllipsis = 0L
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x0A) {
        var ts = start; var te = i
        while (ts < te && b(ts) == 0x20) ts += 1
        while (te > ts && b(te - 1) == 0x20) te -= 1
        if (ts < te && (b(ts) == '-' || b(ts) == '*')) nBullet += 1
        if (te - ts >= 3 && b(te - 1) == '.' && b(te - 2) == '.' &&
          b(te - 3) == '.') nEllipsis += 1
        if (i < b.length) nLines += 1
        start = i + 1
      }
      i += 1
    }
    InternalRow(nLines, nBullet, nEllipsis)
  }

  /** Word count as `size(split(t, "\\s+", -1))` over the byte range
    * [from, until): separator-run count + 1 (Java split with limit -1
    * keeps leading/trailing empties; the empty string splits to
    * [""]). */
  @inline private def splitSize(b: Array[Byte], from: Int, until: Int): Int = {
    var seps = 0
    var inSep = false
    var i = from
    while (i < until) {
      if (isWs(b(i))) { if (!inSep) seps += 1; inSep = true }
      else inSep = false
      i += 1
    }
    seps + 1
  }

  /** Per-line whitespace normalization (see [[NormalizeLinesExpr]]):
    * emit each line's non-`\s` word runs joined by single spaces,
    * drop wordless lines, join kept lines with '\n'. Multi-byte UTF-8
    * is opaque to the scan (all `\s` members are single ASCII
    * bytes). */
  def normalizeLines(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    var o = 0
    var lineHasOut = false // current line already emitted a word
    var keptAny = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c == 0x0A) { lineHasOut = false; i += 1 }
      else if (isWs(c)) i += 1
      else {
        var j = i
        while (j < b.length && !isWs(b(j))) j += 1
        if (lineHasOut) { out(o) = 0x20; o += 1 }
        else if (keptAny) { out(o) = 0x0A; o += 1 }
        System.arraycopy(b, i, out, o, j - i)
        o += j - i
        lineHasOut = true; keptAny = true
        i = j
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** The FULL Gopher A1.1 feature struct in compiled passes —
    * (n_tokens, mean_word_len, symbol_ratio, alpha_word_ratio,
    * n_stop_words, bullet_ratio, ellipsis_ratio) — replacing the whole
    * Column composition (two regex walks, two splits, an
    * array_distinct + array_intersect) with byte scans. Replicated
    * semantics, each pinned by the parity spec:
    *  - n_tokens = `size(split(text, "\\s+"))` INCLUDING boundary
    *    empties (the empty string counts 1);
    *  - mean_word_len divides non-whitespace CODE POINTS (`length`
    *    counts chars, not bytes) by n_tokens;
    *  - symbols are leftmost non-overlapping `#|\.\.\.` matches
    *    ("...." counts once — the alternation consumes three dots);
    *  - stop words match case-sensitively, DISTINCT members counted;
    *  - ratios are the same when(den>0, num/den).otherwise(0) IEEE
    *    divides over exact integer counts. */
  def gopherStats(s: UTF8String, stops: Array[Array[Byte]]): InternalRow = {
    val b = s.getBytes
    // pass 1: token runs, non-ws code points, symbols, alpha runs,
    // distinct stop words
    var nonWsChars = 0L
    var nSym = 0L
    var nAlpha = 0L
    var stopMask = 0L
    var inRun = false; var runAlpha = false; var runStart = 0
    var i = 0
    def closeRun(end: Int): Unit = {
      if (inRun) {
        if (runAlpha) nAlpha += 1
        val len = end - runStart
        var w = 0
        while (w < stops.length) {
          val sw = stops(w)
          if (sw.length == len) {
            var j = 0
            while (j < len && b(runStart + j) == sw(j)) j += 1
            if (j == len) stopMask |= 1L << w
          }
          w += 1
        }
      }
      inRun = false; runAlpha = false
    }
    while (i < b.length) {
      val c = b(i)
      if (isWs(c)) { closeRun(i); i += 1 }
      else {
        if (!inRun) { inRun = true; runStart = i }
        if (isAlpha(c)) runAlpha = true
        // lead byte (not a UTF-8 continuation) = one code point
        if ((c & 0xC0) != 0x80) nonWsChars += 1
        // the '#' branch of the symbol alternation — single-byte, so
        // it can never overlap the "..." branch (different characters)
        if (c == '#') nSym += 1
        i += 1
      }
    }
    closeRun(b.length)
    // the "..." branch: leftmost non-overlapping triple dots (a run of
    // d dots yields floor(d/3) matches, exactly the regex's scan)
    nSym += countEllipses(b)
    val nTok = splitSize(b, 0, b.length).toLong
    var nStop = 0L
    while (stopMask != 0L) { nStop += stopMask & 1L; stopMask >>>= 1 }
    val lines = gopherLineStats(s)
    def ratio(num: Long, den: Long): Double =
      if (den > 0) num.toDouble / den.toDouble else 0.0
    InternalRow(nTok, ratio(nonWsChars, nTok), ratio(nSym, nTok),
      ratio(nAlpha, nTok), nStop,
      ratio(lines.getLong(1), lines.getLong(0)),
      ratio(lines.getLong(2), lines.getLong(0)))
  }

  /** Leftmost non-overlapping "..." matches — the `\.\.\.` branch of
    * the symbol alternation ('#' is single-byte and counted inline). */
  private def countEllipses(b: Array[Byte]): Long = {
    var n = 0L
    var i = 0
    while (i + 2 < b.length) {
      if (b(i) == '.' && b(i + 1) == '.' && b(i + 2) == '.') {
        n += 1; i += 3
      } else i += 1
    }
    n
  }

  private val JS = "javascript".getBytes("US-ASCII")

  /** ASCII-case-insensitive containment of "javascript" in [from,
    * until) — equivalent to `lower(t).contains("javascript")`: the
    * only code points whose lowercase form supplies the needed ASCII
    * letters are their own ASCII case pair (U+0130 lowers to "i"+
    * U+0307, which breaks the required contiguity — pinned by the
    * parity spec's unicode fixtures). */
  @inline private def containsJs(b: Array[Byte], from: Int, until: Int): Boolean = {
    if (until - from < JS.length) return false
    var i = from
    val last = until - JS.length
    while (i <= last) {
      var j = 0
      while (j < JS.length &&
        (b(i + j) | 0x20) == JS(j)) j += 1
      if (j == JS.length) return true
      i += 1
    }
    false
  }

  /** C4 line filter ([[graft.text.Curation.c4CleanedText]]): keep
    * lines whose space-trimmed form ends in `.` `!` `?` `"`, splits
    * into ≥ minWords `\s+` words, and doesn't mention javascript
    * (case-insensitive); survivors (UNtrimmed, as stored) re-joined
    * with '\n'. */
  def c4Clean(s: UTF8String, minWords: Int): UTF8String = {
    val b = s.getBytes
    val kept = new java.util.ArrayList[UTF8String]()
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x0A) {
        var ts = start; var te = i
        while (ts < te && b(ts) == 0x20) ts += 1
        while (te > ts && b(te - 1) == 0x20) te -= 1
        val endOk = te > ts && {
          val e = b(te - 1)
          e == '.' || e == '!' || e == '?' || e == '"'
        }
        if (endOk && splitSize(b, ts, te) >= minWords &&
          !containsJs(b, ts, te))
          kept.add(UTF8String.fromBytes(b, start, i - start))
        start = i + 1
      }
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString("\n"),
      kept.toArray(new Array[UTF8String](kept.size())): _*)
  }
}

/** string → struct<n_units,n_dup_units,unit_chars,dup_unit_chars>
  * (all bigint): the Gopher A1.2 duplication stats over units split
  * on a LITERAL separator ("\n" lines, "\n\n" paragraphs — no regex
  * metachars), leftmost non-overlapping like the regex split, leading
  * and trailing empties kept. "Duplicate" = every occurrence after
  * the first; char counts are CHARACTERS (Spark `length`), not bytes.
  * One pass + one hash set — the Column spelling
  * ([[graft.text.Curation.dupUnitStats]], kept as the parity
  * reference) walks `array_distinct` plus two
  * `aggregate(transform(...))` interpreted folds per document. */
case class DupUnitStatsExpr(child: Expression, sep: String)
    extends UnaryExpression {
  require(sep.nonEmpty, "empty separator")
  override def dataType: DataType = StructType(Seq(
    StructField("n_units", LongType, nullable = false),
    StructField("n_dup_units", LongType, nullable = false),
    StructField("unit_chars", LongType, nullable = false),
    StructField("dup_unit_chars", LongType, nullable = false)))
  override def prettyName: String = "graft_dup_unit_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.sql}")

  @transient private lazy val sepBytes: Array[Byte] =
    sep.getBytes("UTF-8")

  /** Called from generated code. */
  def stats(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val sb = sepBytes
    val seen = new java.util.HashSet[UTF8String]()
    var nUnits = 0L; var unitChars = 0L; var firstChars = 0L
    var start = 0
    var i = 0
    while (i <= b.length) {
      val atSep = i + sb.length <= b.length && {
        var j = 0
        while (j < sb.length && b(i + j) == sb(j)) j += 1
        j == sb.length
      }
      if (atSep || i == b.length) {
        val u = UTF8String.fromBytes(b, start, i - start)
        val chars = u.numChars().toLong
        nUnits += 1; unitChars += chars
        if (seen.add(u)) firstChars += chars
        if (atSep) { start = i + sb.length; i += sb.length }
        else i += 1
      } else i += 1
    }
    InternalRow(nUnits, nUnits - seen.size().toLong, unitChars,
      unitChars - firstChars)
  }

  override protected def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dupUnitStats", this,
      "graft.functions.DupUnitStatsExpr")
    defineCodeGen(ctx, ev, c => s"$ref.stats($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): DupUnitStatsExpr =
    copy(child = newChild)
}

/** string → string: per-line whitespace normalization — each line's
  * `\s+` runs collapse to single spaces, leading/trailing whitespace
  * trims, empty lines drop, survivors re-join with '\n'. One compiled
  * byte pass (output provably no longer than input, so a single exact
  * buffer); replaces the HTML extractor's final
  * `array_join(filter(transform(split(...), trim(regexp_replace(...)))))`
  * stage — an interpreted ArrayTransform AND ArrayFilter whose per-line
  * lambda re-enters a regex engine, on the corpus-linear crawl path.
  * NULL propagates (the HOF chain's array_join(null) is null). */
case class NormalizeLinesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_lines"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    NativeCurationImpl.normalizeLines(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeCurationImpl.normalizeLines($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeLinesExpr =
    copy(child = newChild)
}

/** string → the FULL Gopher A1.1 feature struct
  * ([[NativeCurationImpl.gopherStats]]) in compiled byte passes — the
  * Column composition it replaces ran two regex walks
  * (`regexp_replace(\s+)`, `regexp_extract_all(#|\.\.\.)`), two
  * splits, and an array_distinct + array_intersect per document on
  * the corpus-linear pretrain gate. NULL text yields the same struct
  * of nulls/zeros the Column spelling produced (the struct itself is
  * never null), so `gopherPassed`'s coalesce contract is unchanged. */
case class GopherStatsExpr(child: Expression, stopWords: Seq[String])
    extends UnaryExpression {
  require(stopWords.nonEmpty && stopWords.size <= 64,
    s"1..64 stop words, got ${stopWords.size}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = true),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_ratio", DoubleType, nullable = false),
    StructField("alpha_word_ratio", DoubleType, nullable = false),
    StructField("n_stop_words", LongType, nullable = true),
    StructField("bullet_ratio", DoubleType, nullable = false),
    StructField("ellipsis_ratio", DoubleType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gopher_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.sql}")

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopWords.iterator
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  /** Called from generated code (null-tolerant). */
  def stats(s: UTF8String): InternalRow =
    if (s == null) InternalRow(null, 0.0, 0.0, 0.0, null, 0.0, 0.0)
    else NativeCurationImpl.gopherStats(s, stopBytes)

  override def eval(input: InternalRow): Any =
    stats(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherStats", this,
      "graft.functions.GopherStatsExpr")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      InternalRow ${ev.value} = $ref.stats(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

/** string → boolean: the Gopher document pass rule evaluated off ONE
  * [[NativeCurationImpl.gopherStats]] pass. Exists because the struct
  * spelling `gopherPassed(gopherFeatures(text))` fans the OPAQUE
  * native struct into eight field references inside one predicate —
  * Catalyst cannot field-prune a custom expression the way it
  * simplifies `CreateNamedStruct(...).field`, and codegen's
  * subexpression elimination does not rescue short-circuited
  * conjunction branches, so each reference re-evaluated the whole
  * scorer (measured 3× on tx_html_funnel). Callers that want the
  * FEATURES project the struct into a column first (one evaluation,
  * cheap field access); callers that only gate use this. NULL text
  * fails the gate (the reference's coalesce(false)). */
case class GopherPassedExpr(child: Expression, stopWords: Seq[String],
    minTokens: Long, maxTokens: Long, minStopWords: Long)
    extends UnaryExpression {
  require(stopWords.nonEmpty && stopWords.size <= 64)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gopher_passed"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.sql}")

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopWords.iterator
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  /** Called from generated code (null-tolerant). */
  def passed(s: UTF8String): Boolean =
    if (s == null) false
    else {
      val r = NativeCurationImpl.gopherStats(s, stopBytes)
      val nTok = r.getLong(0)
      nTok >= minTokens && nTok <= maxTokens &&
        r.getDouble(1) >= 3.0 && r.getDouble(1) <= 10.0 &&
        r.getDouble(2) < 0.1 &&
        r.getDouble(5) < 0.9 && r.getDouble(6) < 0.3 &&
        r.getDouble(3) > 0.8 &&
        r.getLong(4) >= minStopWords
    }

  override def eval(input: InternalRow): Any =
    passed(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherPassed", this,
      "graft.functions.GopherPassedExpr")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = $ref.passed(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): GopherPassedExpr =
    copy(child = newChild)
}

/** string → bigint: tokens containing an ASCII letter ("alphabetic
  * words", the Gopher A1.1 ratio numerator). */
case class AlphaTokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_alpha_token_count"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    NativeCurationImpl.alphaTokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeCurationImpl.alphaTokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): AlphaTokenCountExpr =
    copy(child = newChild)
}

/** string → struct<n_lines, n_bullet, n_ellipsis> (all bigint): the
  * Gopher line-shape stats in one pass. */
case class GopherLineStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet", LongType, nullable = false),
    StructField("n_ellipsis", LongType, nullable = false)))
  override def prettyName: String = "graft_gopher_line_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    NativeCurationImpl.gopherLineStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeCurationImpl.gopherLineStats($c)")
  override protected def withNewChildInternal(newChild: Expression): GopherLineStatsExpr =
    copy(child = newChild)
}

/** string → bigint: count of `\s+` tokens that are MEMBERS of the
  * term set (binary equality — callers lowercase the text side with
  * Spark's own `lower` and the terms at plan build, so the match rule
  * is exactly the HOF's `array_contains(lowered, lower(t))`). Terms
  * ride `addReferenceObj` as a hash set — one membership probe per
  * token, not a per-term scan. */
case class TokenSetHitsExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty && terms.forall(_.nonEmpty),
    "term set must be non-empty strings")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_set_hits"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.sql}")

  @transient private lazy val termSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](terms.size * 2)
    terms.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  /** Called from generated code. */
  def hits(s: UTF8String): Long = {
    val b = s.getBytes
    var i = 0; var n = 0L
    var start = -1
    while (i <= b.length) {
      val ws = i == b.length ||
        (b(i) == 0x20 || b(i) == 0x09 || b(i) == 0x0A || b(i) == 0x0B ||
          b(i) == 0x0C || b(i) == 0x0D)
      if (ws) {
        if (start >= 0 &&
          termSet.contains(UTF8String.fromBytes(b, start, i - start))) n += 1
        start = -1
      } else if (start < 0) start = i
      i += 1
    }
    n
  }

  override protected def nullSafeEval(input: Any): Any =
    hits(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSetHits", this,
      "graft.functions.TokenSetHitsExpr")
    defineCodeGen(ctx, ev, c => s"$ref.hits($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): TokenSetHitsExpr =
    copy(child = newChild)
}

/** string → bigint: count of `terms` CONTAINED in the text
  * (binary substring — the [[graft.text.Curation.containsCount]]
  * cross-script rule). One compiled loop over the term array. */
case class ContainsCountExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "empty term list — callers short-circuit to 0")
  override def dataType: DataType = LongType
  // NULL text counts ZERO, never null — the HOF reference filters the
  // literal TERM array with a `text.contains(t)` lambda, and a null
  // lambda result drops the element: filter(terms, null-pred) is the
  // empty array, size 0 (probed against this exact Spark build)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_contains_count"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.sql}")

  @transient private lazy val termArr: Array[UTF8String] =
    terms.iterator.map(UTF8String.fromString).toArray

  /** Called from generated code. */
  def hits(s: UTF8String): Long = {
    if (s == null) return 0L
    var i = 0; var n = 0L
    while (i < termArr.length) {
      if (s.contains(termArr(i))) n += 1
      i += 1
    }
    n
  }

  override def eval(input: InternalRow): Any =
    hits(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("containsCount", this,
      "graft.functions.ContainsCountExpr")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = $ref.hits(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): ContainsCountExpr =
    copy(child = newChild)
}

/** string → string: the C4 line filter + rejoin in one pass. */
case class C4CleanExpr(child: Expression, minWords: Int)
    extends UnaryExpression {
  require(minWords >= 0, s"negative minWords: $minWords")
  override def dataType: DataType = StringType
  // NULL text cleans to "" — the HOF reference ends in
  // concat_ws("\n", ...), which swallows a null array into the empty
  // string (and callers already drop "" rows)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_c4_clean"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.sql}")
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) UTF8String.EMPTY_UTF8
    else NativeCurationImpl.c4Clean(v.asInstanceOf[UTF8String], minWords)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = ${c.isNull}
        ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
        : graft.functions.NativeCurationImpl.c4Clean(${c.value}, $minWords);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): C4CleanExpr =
    copy(child = newChild)
}

object NativeCuration {
  def gopherPassed(text: Column, stopWords: Seq[String], minTokens: Long,
      maxTokens: Long, minStopWords: Long): Column =
    GraftShims.column(GopherPassedExpr(GraftShims.expression(text),
      stopWords, minTokens, maxTokens, minStopWords))
  def gopherStats(text: Column, stopWords: Seq[String]): Column =
    GraftShims.column(GopherStatsExpr(GraftShims.expression(text),
      stopWords))
  def normalizeLines(text: Column): Column =
    GraftShims.column(NormalizeLinesExpr(GraftShims.expression(text)))
  def dupUnitStats(text: Column, sep: String): Column =
    GraftShims.column(DupUnitStatsExpr(GraftShims.expression(text), sep))
  def alphaTokenCount(text: Column): Column =
    GraftShims.column(AlphaTokenCountExpr(GraftShims.expression(text)))
  def gopherLineStats(text: Column): Column =
    GraftShims.column(GopherLineStatsExpr(GraftShims.expression(text)))
  def tokenSetHits(text: Column, terms: Seq[String]): Column =
    GraftShims.column(TokenSetHitsExpr(GraftShims.expression(text), terms))
  def containsCount(text: Column, terms: Seq[String]): Column =
    GraftShims.column(ContainsCountExpr(GraftShims.expression(text), terms))
  def c4Clean(text: Column, minWords: Int): Column =
    GraftShims.column(C4CleanExpr(GraftShims.expression(text), minWords))
}
