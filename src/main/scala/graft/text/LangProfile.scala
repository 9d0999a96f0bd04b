package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** N-gram-profile language identification (Cavnar & Trenkle 1994,
  * "N-Gram-Based Text Categorization"): a document's language is the
  * profile whose ranked character-trigram list is closest by
  * out-of-place distance to the document's own top-K trigram ranking.
  * Strictly stronger than the stopword vote ([[TextFunctions.langId]]):
  * character n-grams see morphology, not just a fixed word list.
  *
  * Profiles are COMMITTED constants computed (deterministically, at
  * class load — no training) from public-domain reference sentences
  * (UDHR Article 1 per language), so the oracle twin renders the same
  * (lang, gram, rank) rows as VALUES and the whole query — per-doc
  * trigram ranking, out-of-place sum, arg-min — replays in DuckDB
  * exactly: every step is integer arithmetic and deterministic
  * tie-breaks.
  *
  * Scale shape: the per-doc top-K ranking is map-only — one compiled
  * normalize + count + small-sort pass per row (native
  * [[graft.functions.TopCharGramsExpr]]; a doc's own profile is a
  * per-row problem, never a shuffle); profiles are a ≤ langs·K-row
  * broadcast; the only shuffle is the (doc, lang) distance aggregate
  * over docs·langs·K slim rows; arg-min is a K=1 bounded heap.
  * Nothing all-pairs, nothing driver-sized.
  */
object LangProfile {

  /** Profile depth: top-K trigrams per language and per document.
    * Cavnar-Trenkle used 300 over mixed 1–5-grams; 40 trigrams carry
    * the same signal at these sample sizes and keep the committed
    * fixture (and the oracle VALUES list) small. */
  val topK = 40

  /** Out-of-place penalty for a document trigram absent from a
    * language profile (the paper's "maximum distance"). */
  val missingPenalty: Long = topK.toLong

  /** Public-domain reference text per language: UDHR Article 1. */
  val samples: Seq[(String, String)] = Seq(
    "en" -> ("All human beings are born free and equal in dignity and " +
      "rights. They are endowed with reason and conscience and should " +
      "act towards one another in a spirit of brotherhood."),
    "de" -> ("Alle Menschen sind frei und gleich an Würde und Rechten " +
      "geboren. Sie sind mit Vernunft und Gewissen begabt und sollen " +
      "einander im Geist der Brüderlichkeit begegnen."),
    "fr" -> ("Tous les êtres humains naissent libres et égaux en dignité " +
      "et en droits. Ils sont doués de raison et de conscience et " +
      "doivent agir les uns envers les autres dans un esprit de " +
      "fraternité."),
    "es" -> ("Todos los seres humanos nacen libres e iguales en dignidad " +
      "y derechos y, dotados como están de razón y conciencia, deben " +
      "comportarse fraternalmente los unos con los otros."))

  /** The normalization both sides apply before shingling: lowercase,
    * whitespace runs → one underscore (the paper's word-boundary pad). */
  def normalize(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", "_")

  /** Character trigrams of a normalized string (plain Scala — used for
    * the committed profiles and by tests to hand-check the Spark side). */
  def trigrams(s: String): Seq[String] = {
    val n = normalize(s)
    if (n.length < 3) Seq.empty
    else (0 to n.length - 3).map(i => n.substring(i, i + 3))
  }

  /** Ranked profile of a text: top-K trigrams by (count desc, gram asc),
    * rank 1-based — the deterministic tie-break the oracle replays. */
  def profileOf(text: String): Seq[(String, Int)] =
    trigrams(text).groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (g, c) => (-c, g) }
      .take(topK).zipWithIndex.map { case ((g, _), i) => (g, i + 1) }

  /** The committed (lang, gram, rank) rows. */
  val profiles: Seq[(String, String, Int)] =
    samples.flatMap { case (lang, text) =>
      profileOf(text).map { case (g, r) => (lang, g, r) }
    }

  /** Per-document language prediction: (doc_id, predicted_lang,
    * oop_distance). Documents whose normalized text is shorter than 3
    * chars have no trigrams and are absent (the corpus-pass convention
    * shared with the hashed-feature operators). */
  def langIdProfile(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.plans.TopK
    val spark = docs.sparkSession
    import spark.implicits._
    // a doc's own ranked trigram profile is a PER-ROW problem: the
    // native expression ([[graft.functions.TopCharGramsExpr]]) builds
    // it in one compiled normalize + hash-map pass, so nothing
    // doc-internal ever shuffles — the (doc, gram) count-shuffle
    // spelling moved every gram occurrence cluster-wide and measured
    // ~3x slower at sf0.1
    val docTop = docs
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.NativeText.topCharGrams(
          col(textCol), 3, topK)).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("gram"),
        (col("pos") + 1).cast("int").as("rank"))
    val prof = profiles.toDF("lang", "gram", "prank")
    // fan out per language via a literal-array explode — a generator,
    // not a join: the langs×K cross product stays map-side and the
    // plan audit's no-BNLJ invariant holds without an allowlist entry
    val dists = docTop
      .withColumn("lang", explode(array(samples.map(s => lit(s._1)): _*)))
      .join(broadcast(prof), Seq("lang", "gram"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(coalesce(
        abs(col("rank").cast(LongType) - col("prank").cast(LongType)),
        lit(missingPenalty))).as("oop_distance"))
    TopK.perKey(dists, Seq("doc_id"),
        Seq(TopK.asc("oop_distance"), TopK.asc("lang")), 1)
      .select(col("doc_id"), col("lang").as("predicted_lang"),
        col("oop_distance"))
  }
}
