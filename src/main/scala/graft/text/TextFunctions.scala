package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for the training-data pipeline operators
  * (dedup, language ID, quality scoring, fingerprinting). All pure
  * `Column` expressions — codegen'd by Tungsten, no UDFs — so they run
  * inside whole-stage codegen at 100 TB scan speed.
  */
object TextFunctions {

  /** Whitespace tokenization (the `documents` table is single-spaced
    * lowercase; `\s+` keeps semantics stable on messier input). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Sliding n-token shingles joined by spaces: the unit of MinHash /
    * Jaccard document similarity. Empty for docs shorter than n tokens.
    * Native expression ([[graft.functions.TokenShinglesExpr]]) — one
    * compiled loop per row instead of interpreted nested HOFs. */
  def tokenShingles(text: Column, n: Int): Column =
    graft.functions.NativeText.tokenShingles(text, n)

  /** NON-distinct sliding n-token shingles — ALL occurrences in
    * document order, for operators that count or locate occurrences
    * ([[tokenShingles]] deduplicates, which is right for set
    * similarity but destroys frequencies/positions). Native expression
    * ([[graft.functions.TokenShinglesAllExpr]]): one tokenize per row —
    * the Column HOF spelling re-evaluates `split(text)` inside every
    * lambda element (O(tokens²) per document; it survives as
    * [[tokenShinglesAllReference]] for parity tests). */
  def tokenShinglesAll(text: Column, n: Int): Column =
    graft.functions.NativeText.tokenShinglesAll(text, n)

  /** Pure-Column reference formulation of [[tokenShinglesAll]] (kept
    * for parity tests; semantically identical, interpreted HOFs). */
  def tokenShinglesAllReference(text: Column, n: Int): Column = {
    val toks = tokens(text)
    // guard: sequence(0, x) with x<0 DESCENDS in Spark — short docs
    // must yield an empty shingle list
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Pure-Column reference formulation of [[tokenShingles]] (kept for
    * parity tests; semantically identical, interpreted HOFs). */
  def tokenShinglesReference(text: Column, n: Int): Column =
    array_distinct(tokenShinglesAllReference(text, n))

  /** Exact Jaccard similarity of two pre-distinct string arrays.
    * Ratio of two ints → one IEEE division, deterministic across
    * engines. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** Token count, whitespace semantics. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Compression-ratio quality signal (the RedPajama-v2 / CCNet
    * screen): deflate-compressed bytes ÷ raw bytes. Repetitive or
    * templated text compresses far below natural prose (ratio ≪ the
    * ~0.4–0.6 of clean English), so curation pipelines drop the low
    * tail. One compiled zlib pass per row
    * ([[graft.functions.DeflateLenExpr]]); deterministic per JDK but
    * not ANSI-replayable, so this signal is test-verified, not
    * oracle-gated. Empty text reports 1.0 (incompressible). */
  def compressionRatio(text: Column): Column =
    when(octet_length(text) === 0, lit(1.0))
      .otherwise(graft.functions.NativeText.deflateLen(text)
        .cast(org.apache.spark.sql.types.DoubleType) / octet_length(text))

  /** Dedup-grade normalization: lowercase, strip non-alphanumerics to
    * spaces, collapse runs of whitespace, trim. Run BEFORE hashing so
    * "Hello,  World!" and "hello world" collapse to one exact-dup
    * group. ASCII character class on purpose — identical semantics in
    * every regex engine (unicode \\p classes differ between engines,
    * which would break oracle portability). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** BPE-ish subword unit count: alpha runs, digit runs, single other
    * non-space chars — a cheap proxy for tokenizer load. The HEURISTIC
    * fallback for when no tokenizer artifact exists; budget-bearing
    * operators should prefer [[bpeTokenCount]] (tokenizer-exact). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Tokenizer-EXACT token count: replay the committed BPE merge list
    * ([[graft.functions.Bpe]]) — the number a trainer consuming the
    * same artifact would see, so token budgets/packing mean what they
    * say. Native expression, stays in whole-stage codegen. */
  def bpeTokenCount(text: Column, artifact: String = "default"): Column =
    graft.functions.NativeBpe.bpeTokenCount(text, artifact)

  /** The exact BPE token sequence (array<string>) — subword symbols
    * with `</w>` end-of-word markers, in document order. */
  def bpeTokens(text: Column, artifact: String = "default"): Column =
    graft.functions.NativeBpe.bpeTokens(text, artifact)

  /** Quality features (C4/Gopher-style heuristics over the reference's
    * length/pattern rule vocabulary): emitted as a struct so one
    * projection computes all of them in a single codegen stage. */
  def qualityFeatures(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast(DoubleType)
    struct(
      length(text).as("n_chars"),
      size(toks).as("n_tokens"),
      (length(text).cast(DoubleType) / nTok).as("chars_per_token"),
      (size(array_distinct(toks)).cast(DoubleType) / nTok).as("distinct_token_ratio"),
      size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).as("n_punct"))
  }

  /** Language-ID by stopword-set voting (n-gram-free heuristic): score
    * per language = |tokens ∩ stopwords(lang)|, argmax with fixed
    * preference order on ties. Sets below are small on purpose — this is
    * the reference-style heuristic, not a trained model. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "est", "un", "une"),
    "es" -> Seq("el", "la", "y", "es", "un", "una"))

  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val scores: Seq[(String, Column)] = langStopwords.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
    // argmax; strict > so earlier-listed languages win ties
    val (bestLang, bestScore) =
      scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
        case ((bl, bs), (l, sc)) =>
          (when(sc > bs, lit(l)).otherwise(bl), when(sc > bs, sc).otherwise(bs))
      }
    when(bestScore > 0, bestLang).otherwise(lit("unknown"))
  }

  /** PII-style scrubbing for corpus curation: replace URLs, email
    * addresses, IPv6/IPv4 addresses, SSN-shaped ID numbers, and phone
    * numbers with placeholder tokens — the standard pre-release scrub
    * set. Patterns are deliberately RE2-safe (no lookarounds, no
    * backrefs; ASCII classes) so Java regex and DuckDB read them
    * identically and redaction is engine-reproducible. Order matters
    * and is part of the contract: URLs first (they embed everything),
    * then emails, IPs before phones (dotted quads must not half-match
    * a phone shape), IDs before phones (3-2-4 vs 3-3-4 groups are
    * disjoint, but the order pins it). The IPv6 pattern is the
    * ≥4-group colon-hex scrub shape, not an RFC 4291 validator —
    * scrubbing over-matches by design. One codegen'd projection chain,
    * no UDF. */
  /** The distinct placeholder tokens [[redact]] emits — the audit
    * surface ([[graft.queries.TextQueries.txRedactAudit]]) counts
    * occurrences of exactly these. */
  val RedactionTokens: Seq[String] =
    Seq("<EMAIL>", "<ID>", "<IP>", "<PHONE>", "<URL>")

  def redact(text: Column): Column = {
    val urlPat = "https?://[^\\s/$.?#][^\\s]*"
    val emailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val ipv6Pat = "\\b([0-9A-Fa-f]{1,4}:){3,7}[0-9A-Fa-f]{1,4}\\b"
    val ipv4Pat = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val idPat = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
    val phoneParen =
      "(\\+[0-9]{1,3}[\\s-])?\\([0-9]{3}\\)[\\s-]?[0-9]{3}[-.][0-9]{4}"
    val phoneDash =
      "(\\+[0-9]{1,3}[\\s-])?\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
    Seq(urlPat -> "<URL>", emailPat -> "<EMAIL>", ipv6Pat -> "<IP>",
        ipv4Pat -> "<IP>", idPat -> "<ID>",
        phoneParen -> "<PHONE>", phoneDash -> "<PHONE>")
      .foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }
  }

  /** Gopher-style repetition score: fraction of n-gram OCCURRENCES that
    * are repeats of an earlier n-gram in the same doc —
    * `1 − distinct/total`, 0 for docs shorter than n tokens. The classic
    * duplicate-n-gram quality filter for training corpora; one int/int
    * division + one subtraction, engine-portable. */
  def repetitionScore(text: Column, n: Int): Column = {
    val total = tokenCount(text) - (n - 1)
    val distinct = size(tokenShingles(text, n))
    when(total > 0,
      lit(1.0) - distinct.cast(DoubleType) / total.cast(DoubleType))
      .otherwise(lit(0.0))
  }

  /** Document fingerprint: minimum MD5 over token shingles — a
    * deterministic containment fingerprint (winnowing-lite) identical in
    * any engine with standard MD5. Native expression
    * ([[graft.functions.MinShingleFingerprintExpr]]): one compiled
    * window scan keeping the running-min digest — the `transform`
    * spelling materialized the shingle array and ran md5 in an
    * interpreted (CodegenFallback) lambda per shingle. */
  def minShingleFingerprint(text: Column, n: Int): Column =
    graft.functions.NativeText.minShingleFingerprint(text, n)

  /** Pure-Column reference of [[minShingleFingerprint]] (parity tests). */
  private[graft] def minShingleFingerprintReference(text: Column,
      n: Int): Column =
    array_min(transform(tokenShingles(text, n), s => md5(s)))

  /** Context-window chunking: split a document into `size`-token chunks
    * whose starts step by `stride` (stride < size ⇒ overlapping
    * windows, the standard training-data chunker). The tail chunk may
    * be shorter; docs with at least one token produce
    * `floor((n−1)/stride)+1` chunks; empty/whitespace docs produce
    * none. Native expression ([[graft.functions.ChunkTokensExpr]]) —
    * one tokenize + one builder pass per row in codegen; map-side, the
    * doc never leaves its partition until the caller explodes. NULL
    * text yields an empty array (the expression itself is
    * null-intolerant; the coalesce restores the reference's NULL→[]
    * contract so `size(...) === 0` finds unchunkable docs). */
  def chunkTokens(text: Column, size: Int, stride: Int): Column =
    coalesce(graft.functions.NativeText.chunkTokens(text, size, stride),
      array().cast("array<string>"))

  /** Pure-Column reference formulation of [[chunkTokens]] (parity
    * tests; semantically identical, interpreted HOFs). */
  def chunkTokensReference(text: Column, size: Int, stride: Int): Column = {
    require(size >= 1 && stride >= 1, "size and stride must be >= 1")
    val toks = tokens(text)
    val n = org.apache.spark.sql.functions.size(toks)
    // floor of an exact small-int double division; `/` on int Columns
    // is fractional, and sequence() needs integral bounds
    val lastStart = floor((n - lit(1)).cast("double") / lit(stride)).cast("int")
    // split() never yields an empty array, so the only no-chunk cases
    // are NULL/whitespace-only text — one trim-length guard covers both
    when(length(trim(text)) > 0,
      transform(
        sequence(lit(0), lastStart),
        i => array_join(slice(toks, i * lit(stride) + lit(1), lit(size)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** 64-bit SimHash over tokens: per bit, sign of Σ_tokens(±1) using
    * xxhash64 bit b of each token. Native expression
    * ([[graft.functions.SimHash64Expr]]): one compiled loop per row. */
  def simhash64(text: Column): Column =
    graft.functions.NativeText.simhash64(text)

  /** Pure-Column reference formulation of [[simhash64]] (parity tests
    * only — 64 interpreted array passes per row). */
  def simhash64Reference(text: Column): Column = {
    val hashes = transform(tokens(text), t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }
}
