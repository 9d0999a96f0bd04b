package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot text-dedup path.
  *
  * The pure-`Column` formulations (TextFunctions.*Reference) express
  * SimHash/shingling through higher-order functions — `transform` /
  * `aggregate` lambdas are interpreted per element, so a 64-bit SimHash
  * costs 64 interpreted array passes per row. These expressions compute
  * the same values in one compiled loop per row and stay inside
  * whole-stage codegen (static call, no UDF/serialization boundary).
  * Parity with the Column versions is pinned by tests: same tokenizer
  * (`split("\\s+", -1)`), same per-token `xxhash64(seed=42)`, same
  * vote/threshold semantics, same first-occurrence shingle dedup.
  */
object NativeTextImpl {

  /** Spark's split(str, "\\s+") semantics (limit −1). */
  def tokenize(s: UTF8String): Array[String] = s.toString.split("\\s+", -1)

  /** 64-bit SimHash over whitespace tokens; bit b set iff
    * Σ_tokens(±1 by bit b of xxhash64(token, 42)) > 0. */
  def simhash64(s: UTF8String): Long = {
    val toks = tokenize(s)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val u = UTF8String.fromString(toks(t))
      val h = XXH64.hashUTF8String(u, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5-SimHash over whitespace tokens: per token, the first 15
    * hex chars of md5 (= 60 bits, parsed big-endian exactly like
    * `conv(substring(md5(t),1,15),16,10)`), then ±1 votes per bit.
    * Bit-identical to the explode+aggregate formulation in
    * [[graft.dedup.Dedup.simhashMd5SignaturesReference]] — pinned by a
    * parity test — but map-only: no explode, no shuffle, one compiled
    * call per row. */
  def simhashMd5(s: UTF8String): Long = {
    val toks = tokenize(s)
    val votes = new Array[Int](60)
    val md = mdLocal.get()
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(
        toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var i = 0
      while (i < 15) {
        val nib =
          if (i % 2 == 0) (d(i / 2) >> 4) & 0xF else d(i / 2) & 0xF
        v = (v << 4) | nib
        i += 1
      }
      var b = 0
      while (b < 60) {
        if (((v >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Per-token md5 bucket ids — the [[graft.text.Dsir.featureBucket]]
    * md5-twin scheme over every whitespace token in one compiled loop:
    * first 15 md5 hex chars parsed big-endian (< 2^60, exactly
    * `conv(substring(md5(t),1,15),16,10)`), then pmod `buckets` (the
    * 60-bit value is non-negative, so `%` == pmod). The Column
    * spelling wraps this chain in an ArrayTransform lambda —
    * CodegenFallback, so the whole md5 chain ran interpreted per token
    * on the corpus-linear LM-scoring path. */
  def bucketArray(s: UTF8String, buckets: Long): ArrayData = {
    val toks = tokenize(s)
    val md = mdLocal.get()
    val out = new Array[Any](toks.length)
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(
        toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var i = 0
      while (i < 15) {
        val nib =
          if (i % 2 == 0) (d(i / 2) >> 4) & 0xF else d(i / 2) & 0xF
        v = (v << 4) | nib
        i += 1
      }
      out(t) = v % buckets
      t += 1
    }
    new GenericArrayData(out)
  }

  /** N-gram twin of [[bucketArray]]: the md5 60-bit bucket of every
    * n-token SHINGLE (space-joined, boundary-empty tokens included —
    * exactly `concat_ws(" ", tok_i..tok_{i+n-1})` over the same `\s+`
    * split), in document order; empty for docs shorter than n tokens.
    * Replaces the DSIR feature pass's ArrayTransform lambda, which ran
    * the whole md5 chain interpreted per bigram occurrence. */
  def ngramBucketArray(s: UTF8String, n: Int, buckets: Long): ArrayData = {
    val toks = tokenize(s)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val md = mdLocal.get()
    val sb = new java.lang.StringBuilder
    val out = new Array[Any](m)
    var p = 0
    while (p < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(p + j))
        j += 1
      }
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var i = 0
      while (i < 15) {
        val nib =
          if (i % 2 == 0) (d(i / 2) >> 4) & 0xF else d(i / 2) & 0xF
        v = (v << 4) | nib
        i += 1
      }
      out(p) = v % buckets
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Minimum md5 (lowercase hex) over all n-token shingles — the
    * [[graft.text.TextFunctions.minShingleFingerprint]] containment
    * fingerprint in one compiled pass: no shingle array, no distinct
    * set (min over occurrences == min over distincts), no interpreted
    * per-shingle md5 lambda; digests compare as unsigned bytes, which
    * is exactly the hex string's lexicographic order. Null (matching
    * `array_min` over an empty array) for docs shorter than n. */
  def minShingleFingerprint(s: UTF8String, n: Int): UTF8String = {
    val toks = tokenize(s)
    if (toks.length < n) return null
    val md = mdLocal.get()
    val sb = new java.lang.StringBuilder
    var best: Array[Byte] = null
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (best == null) best = d
      else {
        var k = 0
        var cmp = 0
        while (k < 16 && cmp == 0) {
          cmp = (d(k) & 0xFF) - (best(k) & 0xFF)
          k += 1
        }
        if (cmp < 0) best = d
      }
      i += 1
    }
    val hex = new Array[Char](32)
    var k = 0
    while (k < 16) {
      hex(2 * k) = Character.forDigit((best(k) >> 4) & 0xF, 16)
      hex(2 * k + 1) = Character.forDigit(best(k) & 0xF, 16)
      k += 1
    }
    UTF8String.fromString(new String(hex))
  }

  /** Distinct n-token shingles in first-occurrence order (space-joined),
    * empty array for docs shorter than n tokens. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(s)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  /** NON-distinct twin of [[shingles]]: every occurrence in document
    * order (frequencies/positions preserved). Same single tokenize +
    * StringBuilder pass — the Column HOF spelling re-runs `split(text)`
    * inside every lambda element (no cross-lambda subexpression
    * elimination), i.e. O(tokens²) per document. */
  def shinglesAll(s: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(s)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Context-window chunks (see TextFunctions.chunkTokens): size-token
    * windows whose starts step by stride, short tail kept, none for
    * whitespace-only/empty docs. One tokenize + one StringBuilder pass
    * per row instead of the Column form's interpreted
    * sequence/transform/slice/array_join chain. */
  def chunks(s: UTF8String, size: Int, stride: Int): ArrayData = {
    // space-only trim — EXACTLY Spark SQL trim() / DuckDB trim(), which
    // the Column reference and the oracle use; trimAll (tabs/newlines)
    // would diverge on whitespace-only docs without 0x20 spaces
    if (s.trim().numChars() == 0)
      return new GenericArrayData(Array.empty[Any])
    val toks = tokenize(s)
    val n = toks.length
    val nChunks = (n - 1) / stride + 1
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder
    var c = 0
    while (c < nChunks) {
      sb.setLength(0)
      val start = c * stride
      val end = math.min(start + size, n)
      var i = start
      while (i < end) {
        if (i > start) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }

  private val deflaterLocal = new ThreadLocal[java.util.zip.Deflater] {
    // raw deflate (nowrap), fixed level — one native object per
    // executor thread, reset per row; allocating per row would churn
    // native zlib streams at corpus scale
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  /** Deflate-compressed byte length of the document (zlib level 6,
    * raw stream) — the numerator of the compression-ratio quality
    * signal (RedPajama-v2 `ccnet_length` family / Rae et al. 2021
    * repetition screens): highly repetitive or templated text
    * compresses far below natural prose. Deterministic for a fixed
    * zlib build (the JDK pins one); NOT replayable in ANSI SQL, so
    * consumers are test-verified rather than oracle-checked —
    * documented honestly like the KMeans production path. */
  def deflateLen(s: UTF8String): Long = {
    val d = deflaterLocal.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var total = 0L
    val buf = new Array[Byte](8192)
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Codepoint (= UTF-8 binary) string order — the order DuckDB's
    * binary collation and Spark's own UTF8String comparison sort by.
    * Java String.compareTo compares UTF-16 code units, which diverges
    * for supplementary-plane characters tied against U+E000..U+FFFF,
    * so count-ties broken with compareTo would silently disagree with
    * the SQL oracle on non-BMP corpora. */
  def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Ranked top-`k` character n-grams of a document (rank order in the
    * returned array), over the Cavnar-Trenkle normalization: lowercase
    * (root locale), ASCII-whitespace runs → one `_` — byte-for-byte
    * the `regexp_replace(lower(text), '\\s+', '_')` the SQL twin
    * applies (Java regex `\s` is ASCII-only; so is this loop). Ties
    * break count desc → binary-smallest gram, the oracle's
    * `ORDER BY c DESC, gram`. One normalize + hash-map + small sort
    * per row: a doc's own profile is a per-row problem — ranking it
    * through a (doc, gram) count shuffle moves every gram occurrence
    * cluster-wide for no reason (measured 3.6→1.3 s on the sf0.1
    * lang-profile query). */
  def topCharGrams(s: UTF8String, n: Int, k: Int): GenericArrayData = {
    val raw = s.toString.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    var ws = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (isWs) { if (!ws) sb.append('_'); ws = true }
      else { sb.append(c); ws = false }
      i += 1
    }
    val t = sb.toString
    if (t.length < n) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.HashMap[String, Array[Int]](t.length * 2)
    i = 0
    while (i <= t.length - n) {
      val g = t.substring(i, i + n)
      val c = counts.get(g)
      if (c == null) counts.put(g, Array(1)) else c(0) += 1
      i += 1
    }
    val entries = new Array[(String, Int)](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0))
      i += 1
    }
    java.util.Arrays.sort(entries,
      new java.util.Comparator[(String, Int)] {
        override def compare(a: (String, Int), b: (String, Int)): Int =
          if (a._2 != b._2) Integer.compare(b._2, a._2)
          else cpCompare(a._1, b._1)
      })
    val m = math.min(k, entries.length)
    val out = new Array[Any](m)
    i = 0
    while (i < m) { out(i) = UTF8String.fromString(entries(i)._1); i += 1 }
    new GenericArrayData(out)
  }

  /** Most frequent n-token shingle of a document with its occurrence
    * count, as `(gram, cnt)` — or null when the doc has fewer than n
    * tokens. One tokenize + one hash-map pass per row; ties break
    * higher count → longer gram (chars) → binary-smallest gram, the
    * same total order as `ORDER BY cnt DESC, len DESC, gram ASC` in
    * the SQL oracle (UTF8String comparison IS the binary order both
    * engines sort strings by). */
  def topNgram(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = tokenize(s)
    if (toks.length < n) return null
    val counts = new java.util.HashMap[UTF8String, Array[Int]](
      (toks.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val g = UTF8String.fromString(sb.toString)
      val c = counts.get(g)
      if (c == null) counts.put(g, Array(1)) else c(0) += 1
      i += 1
    }
    var best: UTF8String = null
    var bestCnt = 0
    var bestLen = -1
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey
      val c = e.getValue()(0)
      val len = g.numChars()
      if (c > bestCnt ||
          (c == bestCnt && (len > bestLen ||
            (len == bestLen && g.compareTo(best) < 0)))) {
        best = g; bestCnt = c; bestLen = len
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestCnt.toLong))
  }

  /** NFC-normalize a UTF8String; identity (no allocation) when the
    * quick-check says the input is already composed. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** LCS length over two token arrays — the ROUGE-L numerator
    * (Lin 2004, "ROUGE: A Package for Automatic Evaluation of
    * Summaries", §3). Classic two-row DP: O(|a|·|b|) time,
    * O(min(|a|,|b|)) space, one compiled loop per pair. Per-pair cost
    * is quadratic in response length by nature — callers run it on
    * CANDIDATE pairs (blocked/LSH'd), never all-pairs. */
  def lcsLength(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    val (small, large, sn, ln) = if (n <= m) (a, b, n, m) else (b, a, m, n)
    val st = new Array[UTF8String](sn)
    var i = 0
    while (i < sn) { st(i) = small.getUTF8String(i); i += 1 }
    var prev = new Array[Int](sn + 1)
    var cur = new Array[Int](sn + 1)
    var j = 0
    while (j < ln) {
      val lt = large.getUTF8String(j)
      var k = 0
      while (k < sn) {
        cur(k + 1) =
          if (lt == st(k) || (lt != null && lt.equals(st(k)))) prev(k) + 1
          else math.max(prev(k + 1), cur(k))
        k += 1
      }
      val t = prev; prev = cur; cur = t
      j += 1
    }
    prev(sn).toLong
  }
}

/** Unicode NFC normalization as a codegen'd expression: canonical
  * composition (combining sequences → precomposed forms, singleton
  * compatibility points like U+212B ANGSTROM SIGN → U+00C5) per
  * UAX #15. Spark ships no normalizer builtin, yet web text mixes
  * composed and decomposed spellings of the SAME string — exact
  * dedup, fingerprints, and blocklists all silently miss across the
  * two unless a normalization pass runs first. JDK `Normalizer` and
  * DuckDB's `nfc_normalize` implement the same stable standard, so
  * the operation is oracle-replayable cross-engine. Fast path: NFC
  * quick-check via `Normalizer.isNormalized` costs one scan and skips
  * allocation for the (overwhelmingly common) already-NFC row. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NativeTextImpl.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextImpl.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** string → long SimHash, codegen'd as one static call. */
case class LcsLengthExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> inputs, got ${l.sql}, ${r.sql}")
    }
  override def prettyName: String = "graft_lcs_length"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeTextImpl.lcsLength(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.NativeTextImpl.lcsLength($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LcsLengthExpr =
    copy(left = newLeft, right = newRight)
}


case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    NativeTextImpl.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextImpl.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** string → long 60-bit md5-SimHash, codegen'd as one static call. */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_simhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    NativeTextImpl.simhashMd5(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextImpl.simhashMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5Expr =
    copy(child = newChild)
}

/** string → array<bigint> per-token md5 bucket ids, codegen'd (the
  * [[graft.text.LmScore.bucketArray]] hot path — one compiled loop
  * instead of an interpreted ArrayTransform around the md5 chain). */
/** string → array<bigint> n-gram md5 buckets
  * ([[NativeTextImpl.ngramBucketArray]]), codegen'd. */
case class NgramBucketArrayExpr(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_ngram_bucket_array"

  override protected def nullSafeEval(input: Any): Any =
    NativeTextImpl.ngramBucketArray(input.asInstanceOf[UTF8String], n,
      buckets.toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextImpl.ngramBucketArray($c, $n, ${buckets}L)")

  override protected def withNewChildInternal(newChild: Expression): NgramBucketArrayExpr =
    copy(child = newChild)
}

case class BucketArrayExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_bucket_array"

  override protected def nullSafeEval(input: Any): Any =
    NativeTextImpl.bucketArray(input.asInstanceOf[UTF8String], buckets.toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextImpl.bucketArray($c, ${buckets}L)")

  override protected def withNewChildInternal(newChild: Expression): BucketArrayExpr =
    copy(child = newChild)
}

/** string → string minimum shingle-md5 fingerprint, codegen'd; null
  * for docs shorter than n tokens (the `array_min`-over-empty twin). */
case class MinShingleFingerprintExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_min_shingle_fp"

  override protected def nullSafeEval(input: Any): Any =
    NativeTextImpl.minShingleFingerprint(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.NativeTextImpl.minShingleFingerprint($c, $n);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(
      newChild: Expression): MinShingleFingerprintExpr =
    copy(child = newChild)
}

/** string → array<string> distinct n-token shingles, codegen'd. */
case class TokenShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    NativeTextImpl.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextImpl.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenShinglesExpr =
    copy(child = newChild)
}

/** string → array<string> of ALL n-token shingles in order, codegen'd
  * (the non-distinct twin of [[TokenShinglesExpr]]). */
case class TokenShinglesAllExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_shingles_all"

  override protected def nullSafeEval(input: Any): Any =
    NativeTextImpl.shinglesAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextImpl.shinglesAll($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenShinglesAllExpr =
    copy(child = newChild)
}

/** string → array<string> context-window chunks, codegen'd. */
case class ChunkTokensExpr(child: Expression, size: Int, stride: Int)
    extends UnaryExpression {
  require(size >= 1 && stride >= 1,
    s"size and stride must be >= 1, got size=$size stride=$stride")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_chunks"

  override protected def nullSafeEval(input: Any): Any =
    NativeTextImpl.chunks(input.asInstanceOf[UTF8String], size, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextImpl.chunks($c, $size, $stride)")

  override protected def withNewChildInternal(newChild: Expression): ChunkTokensExpr =
    copy(child = newChild)
}

/** string → struct(gram, cnt): the document's most frequent n-token
  * shingle (null when shorter than n tokens), one compiled hash-map
  * pass per row — the per-row mode never touches a shuffle. */
case class TopNgramExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_top_ngram"

  override protected def nullSafeEval(input: Any): Any =
    NativeTextImpl.topNgram(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.NativeTextImpl.topNgram($c, $n);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): TopNgramExpr =
    copy(child = newChild)
}

/** string → long deflate-compressed byte length, codegen'd. */
case class DeflateLenExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    NativeTextImpl.deflateLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextImpl.deflateLen($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLenExpr =
    copy(child = newChild)
}

/** string → array<string> of the top-k character n-grams in rank
  * order (Cavnar-Trenkle normalization), codegen'd. */
case class TopCharGramsExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n >= 1 && k >= 1, s"need n, k >= 1, got n=$n k=$k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_top_char_grams"

  override protected def nullSafeEval(input: Any): Any =
    NativeTextImpl.topCharGrams(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeTextImpl.topCharGrams($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): TopCharGramsExpr =
    copy(child = newChild)
}

/** string → array<string>: split on a literal separator, Spark-trim
  * (ASCII space 0x20 only, the `trim` contract) each piece, keep the
  * non-empty ones — the multimodal interleave segmentation pass
  * ([[graft.multimodal.Multimodal.interleaveSegments]]). The
  * `filter(transform(split(...), trim), _ != "")` spelling (retained
  * as `interleaveSegmentsReference`) runs two interpreted lambdas per
  * SEGMENT per corpus row — segment count grows with document length,
  * the same data-sized-array tax class as the compiled curation
  * gates. One pass here. */
case class TrimSegmentsExpr(child: Expression, sep: String)
    extends UnaryExpression {
  require(sep.nonEmpty, "empty separator")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_trim_segments"

  /** Called from generated code. */
  def segments(s: UTF8String): GenericArrayData = {
    // literal (non-regex) split — the reference's split() pattern is a
    // single control character with no regex metachars
    val parts = s.toString.split(java.util.regex.Pattern.quote(sep), -1)
    val out = new java.util.ArrayList[Any](parts.length)
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      var a = 0
      var b = p.length
      while (a < b && p.charAt(a) == ' ') a += 1
      while (b > a && p.charAt(b - 1) == ' ') b -= 1
      if (b > a) out.add(UTF8String.fromString(p.substring(a, b)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    segments(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trimSegments", this,
      "graft.functions.TrimSegmentsExpr")
    defineCodeGen(ctx, ev, c => s"$ref.segments($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TrimSegmentsExpr =
    copy(child = newChild)
}

/** array<struct<k1 .. kN-1, v: string>> → the struct-sorted
  * concatenation of the LAST field joined by `sep` — ONE compiled pass
  * replacing the interpreted group re-pack
  * `concat_ws(sep, transform(array_sort(collect_list(struct(k…, v))),
  * x -> x.v))` (per-doc line/token reassembly in
  * [[graft.dedup.Dedup.dedupLinesGlobal]], the span-removal rebuild,
  * the q11 LISTAGG ordering, the w_pattern_match event-sequence
  * re-pack). The interpreted spelling pays ArraySort's per-COMPARISON
  * interpreted struct ordering, a per-element lambda invocation, and
  * an extra array materialization — all multiplied by every
  * line/token/order/event of the corpus (corpus-linear work on the
  * post-shuffle side).
  *
  * Key fields (all but the last) may be int, long, date, timestamp
  * (the latter two are int/long in the internal representation with
  * the SAME ordering) or string (binary UTF8 order — Spark's default
  * UTF8_BINARY collation). Elements are ordered field-by-field, each
  * asc nulls-first — exactly array_sort's struct ordering; the last
  * (string payload) field participates in the ordering the same way,
  * which is what makes the 2-field form's tiebreak a special case.
  *
  * Semantics pinned to the interpreted spelling by
  * SortedStructConcatSpec:
  *  - a NULL payload sorts before non-null at equal keys (asc
  *    nulls-first field ordering) and is then skipped by the concat
  *    (concat_ws contract);
  *  - NULL elements are ignored entirely (array_sort puts them last /
  *    sort_array(asc) first, transform maps them to null, concat_ws
  *    skips them — so BOTH interpreted spellings agree with this one);
  *  - empty array → empty string; null array → empty string (concat_ws
  *    SKIPS null arguments and never itself returns null — so this
  *    expression is non-nullable, exactly like the spelling it
  *    replaces). */
case class SortedStructConcatExpr(child: Expression, sep: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  private def keyOk(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DateType | TimestampType |
        TimestampNTZType | StringType => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _) if fields.length >= 2 &&
        fields.last.dataType == StringType &&
        fields.init.forall(f => keyOk(f.dataType)) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<(int|long|date|timestamp|string)…, " +
        s"string>>, got ${t.sql}")
  }
  override def prettyName: String = "graft_sorted_struct_concat"

  // field accessor tags: 0 = int-backed (int/date), 1 = long-backed
  // (long/timestamp), 2 = string
  private lazy val fieldTags: Array[Int] = child.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    .fields.map(_.dataType match {
      case IntegerType | DateType => 0
      case LongType | TimestampType | TimestampNTZType => 1
      case StringType => 2
      case t => throw new IllegalStateException(s"unexpected field type $t")
    })
  private lazy val nFields = fieldTags.length
  private lazy val sepU = UTF8String.fromString(sep)

  /** Called from generated code. */
  def repack(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val nf = nFields
    val tags = fieldTags
    // gather non-null elements (null elements are skipped by the
    // interpreted twin's concat regardless of where its sort put them)
    val rows = new Array[org.apache.spark.sql.catalyst.InternalRow](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { rows(m) = arr.getStruct(i, nf); m += 1 }
      i += 1
    }
    val order = new Array[Integer](m)
    i = 0
    while (i < m) { order(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(order, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val ra = rows(a.intValue()); val rb = rows(b.intValue())
        var f = 0
        while (f < nf) {
          // each field: asc nulls-first, then the type's order
          val na = ra.isNullAt(f); val nb = rb.isNullAt(f)
          if (na != nb) return if (na) -1 else 1
          if (!na) {
            val c = tags(f) match {
              case 0 => java.lang.Integer.compare(ra.getInt(f), rb.getInt(f))
              case 1 => java.lang.Long.compare(ra.getLong(f), rb.getLong(f))
              case _ => ra.getUTF8String(f).compareTo(rb.getUTF8String(f))
            }
            if (c != 0) return c
          }
          f += 1
        }
        0
      }
    })
    val sorted = new Array[UTF8String](m)
    i = 0
    while (i < m) {
      val r = rows(order(i).intValue())
      sorted(i) = if (r.isNullAt(nf - 1)) null else r.getUTF8String(nf - 1)
      i += 1
    }
    UTF8String.concatWs(sepU, sorted: _*) // skips nulls, like concat_ws
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val c = child.eval(input)
    if (c == null) UTF8String.EMPTY_UTF8
    else repack(c.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("sortedStructConcat", this,
      "graft.functions.SortedStructConcatExpr")
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      UTF8String ${ev.value} = ${childGen.isNull}
        ? UTF8String.EMPTY_UTF8 : $ref.repack(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortedStructConcatExpr =
    copy(child = newChild)
}

object NativeText {
  def trimSegments(text: Column, sep: String): Column =
    GraftShims.column(TrimSegmentsExpr(GraftShims.expression(text), sep))
  /** Compiled twin of `concat_ws(sep, transform(array_sort(arr),
    * x -> x.<field1>))` over array<struct<int|long, string>>. */
  def sortedStructConcat(arr: Column, sep: String): Column =
    GraftShims.column(SortedStructConcatExpr(GraftShims.expression(arr), sep))

  /** Column wrappers. */
  def lcsLength(a: Column, b: Column): Column =
    GraftShims.column(
      LcsLengthExpr(GraftShims.expression(a), GraftShims.expression(b)))
  def nfcNormalize(text: Column): Column =
    GraftShims.column(NfcNormalizeExpr(GraftShims.expression(text)))
  def simhash64(text: Column): Column =
    GraftShims.column(SimHash64Expr(GraftShims.expression(text)))
  def simhashMd5(text: Column): Column =
    GraftShims.column(SimHashMd5Expr(GraftShims.expression(text)))
  def tokenShingles(text: Column, n: Int): Column =
    GraftShims.column(TokenShinglesExpr(GraftShims.expression(text), n))
  def tokenShinglesAll(text: Column, n: Int): Column =
    GraftShims.column(TokenShinglesAllExpr(GraftShims.expression(text), n))
  def chunkTokens(text: Column, size: Int, stride: Int): Column =
    GraftShims.column(ChunkTokensExpr(GraftShims.expression(text), size, stride))
  def topNgram(text: Column, n: Int): Column =
    GraftShims.column(TopNgramExpr(GraftShims.expression(text), n))
  def topCharGrams(text: Column, n: Int, k: Int): Column =
    GraftShims.column(TopCharGramsExpr(GraftShims.expression(text), n, k))
  def deflateLen(text: Column): Column =
    GraftShims.column(DeflateLenExpr(GraftShims.expression(text)))
  def ngramBucketArray(text: Column, n: Int, buckets: Int): Column =
    GraftShims.column(NgramBucketArrayExpr(GraftShims.expression(text),
      n, buckets))
  def bucketArray(text: Column, buckets: Int): Column =
    GraftShims.column(BucketArrayExpr(GraftShims.expression(text), buckets))
  def minShingleFingerprint(text: Column, n: Int): Column =
    GraftShims.column(
      MinShingleFingerprintExpr(GraftShims.expression(text), n))
}
