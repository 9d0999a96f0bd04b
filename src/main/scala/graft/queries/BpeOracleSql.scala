package graft.queries

import graft.functions.Bpe

/** DuckDB re-implementation of the BPE merge loop, built from the SAME
  * loaded artifact the engine tokenizes with ([[graft.functions.Bpe]])
  * — one source of truth, two independent executions: Spark replays
  * merges in a compiled loop, the oracle replays them in a recursive
  * CTE, and the driver hash-compares the results.
  *
  * Encoding trick: a word's symbol state is one string with every
  * symbol DELIMITED on both sides by chr(1) (`␁f␁a␁st␁</w>␁`), so a
  * pair pattern `␁l␁r␁` can only match at symbol boundaries — a bare
  * `l␁r` substring match would false-positive on symbol PREFIXES
  * (`a␁s` inside `a␁st`). Each recursion step rewrites the LEFTMOST
  * occurrence of the lowest-ranked applicable pair
  * (`regexp_replace` without the 'g' flag): merging one occurrence at
  * a time leftmost-first is equivalent to BPE's per-pass merge-all —
  * occurrences of a pair can only overlap when left == right, where
  * leftmost-first pairs off a run exactly like a single left-to-right
  * pass. Merge symbols are regex-safe by construction (the artifact's
  * alphabet is letters plus `</w>`).
  *
  * The merge table rides the SQL as a VALUES literal (the oracle runs
  * wherever the driver runs DuckDB — it cannot read the classpath).
  */
object BpeOracleSql {

  private def esc(s: String) = s.replace("'", "''")

  private lazy val mergesValues: String =
    Bpe.artifact("default").merges.zipWithIndex
      .map { case ((l, r), i) => s"($i, '${esc(l)}', '${esc(r)}')" }
      .mkString(", ")

  /** CTE pack: `bpe_dict(w, toks, n)` — every distinct word of `rel`
    * (any relation exposing `doc_id, text`) with its space-joined BPE
    * symbols and token count. MUST be spliced directly after
    * `WITH RECURSIVE`. */
  def dictCtesFor(rel: String): String = s"""
    bpe_merges(rank, l, r) AS (SELECT * FROM (VALUES $mergesValues) t),
    bpe_words AS (
      SELECT DISTINCT w FROM (
        SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM $rel)
      WHERE w <> ''),
    bpe_enc(w, state) AS (
      SELECT w, chr(1) || array_to_string(string_split(w, ''), chr(1))
               || chr(1) || '</w>' || chr(1)
      FROM bpe_words
      UNION ALL
      SELECT e.w, regexp_replace(e.state,
        (SELECT chr(1) || l || chr(1) || r || chr(1) FROM bpe_merges m
         WHERE contains(e.state, chr(1) || l || chr(1) || r || chr(1))
         ORDER BY rank LIMIT 1),
        (SELECT chr(1) || l || r || chr(1) FROM bpe_merges m
         WHERE contains(e.state, chr(1) || l || chr(1) || r || chr(1))
         ORDER BY rank LIMIT 1))
      FROM bpe_enc e
      WHERE EXISTS (SELECT 1 FROM bpe_merges m
        WHERE contains(e.state, chr(1) || m.l || chr(1) || m.r || chr(1)))),
    bpe_dict AS (
      SELECT w,
             array_to_string(string_split(trim(state, chr(1)), chr(1)), ' ')
               AS toks,
             len(string_split(trim(state, chr(1)), chr(1))) AS n
      FROM bpe_enc e
      WHERE NOT EXISTS (SELECT 1 FROM bpe_merges m
        WHERE contains(e.state, chr(1) || m.l || chr(1) || m.r || chr(1))))"""

  /** CTE pack (depends on [[dictCtesFor]]): `bpe_docs(doc_id, n_tokens,
    * seq)` — per-row total BPE tokens and the space-joined token
    * sequence in word order (keyed by `rel`'s doc_id, which must be
    * unique per row); wordless rows get (0, ''). */
  def docCtesFor(rel: String): String = s"""
    bpe_doc_words AS (
      SELECT doc_id, i, w FROM (
        SELECT doc_id,
               unnest([{'i': i, 'w': toks[i]}
                       FOR i IN range(1, len(toks) + 1)],
                      recursive := true)
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks
              FROM $rel))
      WHERE w <> ''),
    bpe_docs AS (
      SELECT d.doc_id,
             CAST(COALESCE(SUM(x.n), 0) AS INT) AS n_tokens,
             COALESCE(string_agg(x.toks, ' ' ORDER BY dw.i), '') AS seq
      FROM $rel d
      LEFT JOIN bpe_doc_words dw ON d.doc_id = dw.doc_id
      LEFT JOIN bpe_dict x ON dw.w = x.w
      GROUP BY d.doc_id)"""

  /** Statement head for oracles consuming per-row BPE counts of an
    * arbitrary `(doc_id, text)` relation — `rel` may be a table name
    * or a parenthesized subquery (its OWN nested WITH is fine). */
  def preludeFor(rel: String): String =
    s"WITH RECURSIVE ${dictCtesFor(rel)}, ${docCtesFor(rel)}"

  /** Statement head for oracles consuming per-doc BPE counts. */
  lazy val prelude: String = preludeFor("documents")
}
