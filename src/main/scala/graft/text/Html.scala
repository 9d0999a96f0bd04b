package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step a real pretraining corpus runs
  * BEFORE any of the text curation here (raw crawls are HTML; Gopher /
  * C4 / dedup all consume extracted text). The trafilatura-lite core:
  * drop non-content machinery (comments, script/style subtrees), turn
  * block-level structure into line breaks, strip remaining tags,
  * decode the half-dozen entities that dominate real markup, and
  * normalize each resulting line — producing the newline-segmented
  * plain text [[Curation.c4CleanedText]] and the Gopher filters
  * expect. The reference pipeline has no HTML handling (its extractors
  * stop at JSON/CSV — `src/ingestion/extractors.py`); this extends the
  * LLM-pipeline surface.
  *
  * Built as a chain of Spark's own codegen'd string expressions
  * (`regexp_replace`/`replace`): composition of existing operators is
  * the preferred extension level, and every step is a regex an
  * independent SQL engine replays verbatim — which is what lets the
  * DuckDB oracle pin the extraction byte-for-byte. The one exception
  * is the FINAL per-line normalize, which as a HOF chain was
  * interpreted (ArrayTransform/ArrayFilter are CodegenFallback) with
  * a regex re-entry per line — that stage is a native compiled pass
  * ([[graft.functions.NormalizeLinesExpr]]), parity-pinned against
  * the retained HOF spelling. Map-only: no shuffle, no state.
  *
  * Deliberately NOT a browser-grade parser — the contract, pinned by
  * HtmlSpec's guard tests:
  *  - script/style strip to the FIRST closing tag: a `</script>`
  *    INSIDE a JS string ends the strip there, and the fragment
  *    between it and the real closing tag surfaces as text — a
  *    BOUNDED leak (the fragment itself), never an unbounded
  *    deletion of following content;
  *  - a script/style block that never closes does not strip at all:
  *    its code surfaces as text (tags removed) rather than deleting
  *    the rest of the document — fail-open by design, the
  *    quality gates downstream are what drop code-shaped text;
  *  - an unclosed tag at end-of-input (`<div class="x` with no `>`)
  *    survives literally — the tag regexes all require the closing
  *    `>`, so a truncated crawl can not swallow trailing text.
  *  The CDATA/escaped corner cases of real crawls are handled by
  *  upstream WARC tooling. No attribute parsing; entity decode covers
  *  [[Entities]] (the named HTML5 core that dominates real markup +
  *  the common numeric forms). Every rule is deterministic and
  *  engine-portable.
  */
object Html {

  /** Entity decode table, applied IN ORDER. Order is part of the
    * contract: every `&`-PRODUCING decode (`&#38;`, `&amp;`) comes
    * last, else `&amp;lt;` would double-decode to `<` instead of the
    * literal `&lt;` the author wrote — and because there are TWO
    * `&`-producers, each first decodes to the U+FFFF sentinel (a
    * Unicode noncharacter, guaranteed absent from interchanged text)
    * so one producer's output can never feed the other
    * (`&#38;amp;` must yield the literal `&amp;`, not `&`); the final
    * row converts the sentinel to `&`. One-to-one string replaces
    * only, so any SQL engine replays the chain verbatim (the DuckDB
    * twin is generated from this table). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
    "&#34;" -> "\"", "&#60;" -> "<", "&#62;" -> ">", "&#160;" -> " ",
    "&hellip;" -> "…", "&mdash;" -> "—", "&ndash;" -> "–",
    "&lsquo;" -> "‘", "&rsquo;" -> "’",
    "&ldquo;" -> "“", "&rdquo;" -> "”",
    "&laquo;" -> "«", "&raquo;" -> "»",
    "&middot;" -> "·", "&bull;" -> "•",
    "&copy;" -> "©", "&reg;" -> "®", "&trade;" -> "™",
    "&deg;" -> "°", "&times;" -> "×", "&divide;" -> "÷",
    "&sect;" -> "§", "&para;" -> "¶",
    "&euro;" -> "€", "&pound;" -> "£",
    "&yen;" -> "¥", "&cent;" -> "¢",
    "&#38;" -> "\uffff", "&amp;" -> "\uffff", "\uffff" -> "&")

  /** Tags whose open OR close breaks a text block — their boundaries
    * become newlines so downstream line-level cleaners see real lines
    * (inline tags like `<b>`/`<span>` dissolve into spaces instead). */
  val BlockTags: String =
    "p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|hr|section|article|" +
      "header|footer|blockquote|title|head|body|html"

  /** Extracted plain text: non-empty whitespace-normalized lines
    * joined by `\n` ("" when nothing survives). */
  def extractText(html: Column): Column = {
    // order matters: comments first (a commented-out <script> is not a
    // script), then script/style SUBTREES (their text is code, not
    // content — and embedded '<' inside them must not leak into tag
    // stripping), then block boundaries → '\n', then every remaining
    // tag → ' ' (inline tags must not glue adjacent words together)
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComments,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val blocks = regexp_replace(noStyle,
      s"(?i)</?(?:$BlockTags)\\b[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    // entity decode — [[Entities]] order (the &-producing pair LAST)
    val decoded = Entities.foldLeft(noTags) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    // per-line whitespace normalization, empty lines dropped — one
    // compiled pass ([[graft.functions.NormalizeLinesExpr]]); the HOF
    // spelling ([[normalizeLinesReference]], the parity pin) is an
    // interpreted ArrayTransform+ArrayFilter whose per-line lambda
    // re-enters the regex engine
    graft.functions.NativeCuration.normalizeLines(decoded)
  }

  /** The HOF reference spelling of [[extractText]]'s final normalize
    * stage (parity tests only — interpreted). */
  private[graft] def normalizeLinesReference(decoded: Column): Column =
    array_join(
      filter(
        transform(split(decoded, "\n", -1),
          l => trim(regexp_replace(l, "\\s+", " "))),
        l => l =!= ""),
      "\n")
}
