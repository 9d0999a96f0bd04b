package graft.queries

import graft.multimodal.{MediaRecord, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators as driver-checked queries over the
  * `documents` table (its `text` column stands in for media bytes; a
  * production source reads `binaryFile`). The decode stage is a
  * deterministic stub ([[graft.multimodal.DecodeStub]]) — the Spark
  * plumbing (binary schema, batched mapPartitions, size-aware
  * partitioning, frame sampling) is the real deliverable.
  */
object MultimodalQueries extends QueryPack {

  /** Binary payload + typed metadata projection (oracle-checked: byte
    * length and md5 agree with DuckDB over the same UTF-8 bytes). */
  def mmPayloadMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.withPayload(table(s, dir, "documents"), "text")
      .select(col("doc_id"),
        col("meta.modality").as("modality"),
        col("meta.size_bytes").as("size_bytes"),
        md5(col("payload")).as("payload_md5"))
      .orderBy(col("doc_id"))

  /** Deterministic frame sampling: 4 evenly-spaced 32-char windows. */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(table(s, dir, "documents"), "text",
      n = 4, frameLen = 32)
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Batched decode + feature extraction via mapPartitions. The stub
    * decoder is a pure function of the payload bytes, so even this
    * query is oracle-checked: DuckDB recomputes width/height/mean from
    * the same bytes (corpus is ASCII ⇒ char codes ≡ UTF-8 bytes). */
  def mmDecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.withPayload(table(s, dir, "documents"), "text")
      .select(col("doc_id"), col("payload"),
        col("meta.modality").as("modality"), col("meta.format").as("format"))
      .as[MediaRecord]
    Multimodal.extractFeatures(media, batchSize = 64)
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        round(col("mean_byte"), 4).as("mean_byte"))
      .orderBy(col("doc_id"))
  }

  /** Audio-feature extraction over the same payloads. The corpus is
    * text, so every row takes [[graft.multimodal.DecodeStub]]'s
    * deterministic fallback — which is designed integer-exact (byte²
    * sums) precisely so DuckDB can recompute it bit-for-bit; the REAL
    * WAV/AIFF/AU path through the identical partition transform is
    * pinned by MultimodalSpec on synthesized audio. */
  def mmAudioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.withPayload(table(s, dir, "documents"), "text")
      .select(col("doc_id"), col("payload"),
        col("meta.modality").as("modality"), col("meta.format").as("format"))
      .as[MediaRecord]
    Multimodal.extractAudioFeatures(media, batchSize = 64)
      .toDF()
      .select(col("doc_id"), col("sample_rate"), col("channels"),
        col("frames"),
        round(col("duration_s"), 6).as("duration_s"),
        round(col("rms"), 6).as("rms"))
      .orderBy(col("doc_id"))
  }

  /** Compressed-audio metadata probe over the same payloads. The text
    * corpus takes the deterministic fallback (designed ANSI-SQL-
    * expressible, like the audio-features fallback) so the partition
    * transform is oracle-checked end to end; the REAL MP3/FLAC/Ogg
    * header parses are pinned by MultimodalSpec on crafted fixtures. */
  def mmAudioMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.withPayload(table(s, dir, "documents"), "text")
      .select(col("doc_id"), col("payload"),
        col("meta.modality").as("modality"), col("meta.format").as("format"))
      .as[MediaRecord]
    Multimodal.probeAudioMeta(media, batchSize = 64)
      .toDF()
      .select(col("doc_id"), col("format"), col("sample_rate"),
        col("channels"), round(col("duration_s"), 6).as("duration_s"),
        col("bitrate_kbps"))
      .orderBy(col("doc_id"))
  }

  /** Perceptual aHash/dHash over the same payloads
    * ([[graft.multimodal.Multimodal.perceptualHashes]]). The text
    * corpus takes the deterministic byte-tap grids, which the oracle
    * replays bit-for-bit (integer-exact thresholds, hex-byte
    * rendering); the REAL raster path (box-averaged luminance, small
    * perturbation robustness) is pinned by MultimodalSpec on
    * synthesized PNGs. */
  def mmPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.withPayload(table(s, dir, "documents"), "text")
      .select(col("doc_id"), col("payload"),
        col("meta.modality").as("modality"), col("meta.format").as("format"))
      .as[MediaRecord]
    Multimodal.perceptualHashes(media, batchSize = 64)
      .toDF()
      .select(col("doc_id"),
        format_string("%016x", col("ahash")).as("ahash_hex"),
        format_string("%016x", col("dhash")).as("dhash_hex"))
      .orderBy(col("doc_id"))
  }

  /** Image near-dup pairs over dHash
    * ([[graft.multimodal.Multimodal.imageNearDuplicates]]): pigeonhole
    * chunk blocking + bit_count(xor) verify at hamming ≤ 3. The corpus
    * has no byte-identical payloads, so every 50th document is planted
    * again under doc_id+100000 — the oracle recomputes the hashes and
    * brute-forces all pairs, pinning that blocking finds exactly the
    * planted copies and nothing else (nearest non-copy sits at
    * hamming 14 in this corpus). */
  def mmImageNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val copies = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val media = Multimodal.withPayload(base.union(copies), "text")
      .select(col("doc_id"), col("payload"),
        lit("text").as("modality"), lit("utf-8").as("format"))
      .as[MediaRecord]
    val hashes = Multimodal.perceptualHashes(media, batchSize = 64).toDF()
    Multimodal.imageNearDuplicates(hashes, "doc_id", "dhash", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Image dedup APPLIED: the [[mmImageNeardup]] pair set feeds the
    * text-dedup transitive machinery
    * ([[graft.dedup.Dedup.removeNearDuplicatesTransitive]]) — cluster
    * by hamming-≤3 dHash pairs, keep each cluster's lowest id. The
    * oracle recomputes hashes, brute-forces pairs, and closes them
    * with the d7 recursive-CTE pattern — the full image-dedup pipeline
    * pinned end to end: 510 inputs → 500 survivors (every planted copy
    * drops, nothing else). */
  def mmImageDedupApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val copies = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val all = base.union(copies)
    val media = Multimodal.withPayload(all, "text")
      .select(col("doc_id"), col("payload"),
        lit("text").as("modality"), lit("utf-8").as("format"))
      .as[MediaRecord]
    val hashes = Multimodal.perceptualHashes(media, batchSize = 64).toDF()
    val pairs = Multimodal.imageNearDuplicates(hashes, "doc_id", "dhash",
      maxHamming = 3)
    graft.dedup.Dedup.removeNearDuplicatesTransitive(all, pairs, "doc_id")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Audio energy-contour hash over the same payloads
    * ([[graft.multimodal.Multimodal.audioPerceptualHashes]]): the text
    * corpus takes the byte²-energy fallback, which the oracle replays
    * bit-for-bit (integer cross-multiplied comparisons, hex-byte
    * rendering); the REAL PCM path (volume invariance, noise
    * robustness) is pinned by MultimodalSpec on synthesized WAVs. */
  def mmAudioPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.withPayload(table(s, dir, "documents"), "text")
      .select(col("doc_id"), col("payload"),
        col("meta.modality").as("modality"), col("meta.format").as("format"))
      .as[MediaRecord]
    Multimodal.audioPerceptualHashes(media, batchSize = 64)
      .toDF()
      .select(col("doc_id"),
        format_string("%016x", col("chash")).as("chash_hex"))
      .orderBy(col("doc_id"))
  }

  /** Audio near-dup pairs over the contour hash — [[mmImageNeardup]]'s
    * planted-copy protocol on the audio signature: blocking + verify
    * must find exactly the byte-identical copies. */
  def mmAudioNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val copies = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val media = Multimodal.withPayload(base.union(copies), "text")
      .select(col("doc_id"), col("payload"),
        lit("text").as("modality"), lit("utf-8").as("format"))
      .as[MediaRecord]
    val hashes = Multimodal.audioPerceptualHashes(media, batchSize = 64).toDF()
    Multimodal.audioNearDuplicates(hashes, "doc_id", "chash", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Video content-hash over the same payloads
    * ([[graft.multimodal.Multimodal.videoPerceptualHashes]]): the text
    * corpus carries no container magic, so every row takes the
    * whole-payload byte-mean contour fallback — integer cross-
    * multiplied comparisons the oracle replays bit-for-bit; the REAL
    * mdat/Cluster media-data carving is pinned by MultimodalSpec on
    * crafted MP4/Matroska containers. */
  def mmVideoPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.withPayload(table(s, dir, "documents"), "text")
      .select(col("doc_id"), col("payload"),
        col("meta.modality").as("modality"), col("meta.format").as("format"))
      .as[MediaRecord]
    Multimodal.videoPerceptualHashes(media, batchSize = 64)
      .toDF()
      .select(col("doc_id"),
        format_string("%016x", col("vhash")).as("vhash_hex"))
      .orderBy(col("doc_id"))
  }

  /** Video near-dup pairs over the content hash — [[mmImageNeardup]]'s
    * planted-copy protocol on the video signature: pigeonhole blocking
    * + bit_count verify must find exactly the byte-identical copies
    * (the oracle brute-forces all pairs from recomputed hashes). */
  def mmVideoNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val copies = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val media = Multimodal.withPayload(base.union(copies), "text")
      .select(col("doc_id"), col("payload"),
        lit("text").as("modality"), lit("utf-8").as("format"))
      .as[MediaRecord]
    val hashes = Multimodal.videoPerceptualHashes(media, batchSize = 64).toDF()
    Multimodal.videoNearDuplicates(hashes, "doc_id", "vhash", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Interleaved image-text documents
    * ([[graft.multimodal.Multimodal.interleaveSegments]] +
    * [[graft.multimodal.Multimodal.attachMedia]], the MMC4/OBELICS
    * layout): text with two inline `<img:ID>` references per document
    * splits into ordered segments; image segments resolve against a
    * media table (documents stand in, keyed by md5), with every 100th
    * document carrying one DANGLING reference to pin the
    * unresolved-flag path. The oracle replays the regex segmentation,
    * classification, and resolution byte-for-byte. */
  def mmInterleave(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val toks = split(col("text"), "\\s+")
    val itext = concat(
      concat_ws(" ", slice(toks, 1, 8)),
      lit(" <img:"), ((col("doc_id") + 7) % 500).cast("string"), lit("> "),
      concat_ws(" ", slice(toks, 9, 8)),
      lit(" <img:"),
      when(col("doc_id") % 100 === 0, lit(999999L))
        .otherwise((col("doc_id") + 13) % 500).cast("string"), lit("> "),
      concat_ws(" ", slice(toks, 17, 8)))
    val media = docs.select(col("doc_id").as("media_id"),
      md5(col("text")).as("media_md5"))
    val segs = Multimodal.interleaveSegments(
      docs.withColumn("itext", itext), "doc_id", "itext")
    Multimodal.attachMedia(segs, media, "media_id")
      .select(col("doc_id"), col("seg_idx"), col("kind"),
        coalesce(col("media_id"), lit(-1L)).as("media_id"),
        md5(coalesce(col("content"), lit(""))).as("content_md5"),
        col("resolved").cast("int").as("resolved"),
        coalesce(col("media_md5"), lit("")).as("media_md5"))
      .orderBy(col("doc_id"), col("seg_idx"))
  }

  val queries: Map[String, QueryFn] = Map(
    "mm_interleave" -> (mmInterleave _),
    "mm_audio_phash" -> (mmAudioPhash _),
    "mm_audio_neardup" -> (mmAudioNeardup _),
    "mm_video_phash" -> (mmVideoPhash _),
    "mm_video_neardup" -> (mmVideoNeardup _),
    "mm_phash" -> (mmPhash _),
    "mm_image_neardup" -> (mmImageNeardup _),
    "mm_image_dedup_apply" -> (mmImageDedupApply _),
    "mm_audio_meta" -> (mmAudioMeta _),
    "mm_payload_meta" -> (mmPayloadMeta _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_decode_features" -> (mmDecodeFeatures _),
    "mm_audio_features" -> (mmAudioFeatures _))

  // the byte-tap grid + integer-threshold bit packing of
  // DecodeStub.perceptualHash's fallback path, as reusable CTE text
  // over a (doc_id, text) relation named `src`
  private val phashBytesSql = """
      t AS (
        SELECT doc_id,
               [ascii(substr(text, CAST((k*(length(text)-1))//63 + 1 AS INT), 1))
                FOR k IN range(0, 64)] AS ga,
               [ascii(substr(text, CAST((k*(length(text)-1))//71 + 1 AS INT), 1))
                FOR k IN range(0, 72)] AS gd
        FROM src),
      s AS (SELECT doc_id, ga, gd, list_sum(ga) AS sm FROM t),
      byt AS (
        SELECT doc_id,
               [list_sum([(CASE WHEN ga[8*j+c+1]*64 > sm THEN 1 ELSE 0 END)
                          * (1 << (7-c)) FOR c IN range(0, 8)])
                FOR j IN range(0, 8)] AS ab,
               [list_sum([(CASE WHEN gd[9*j+c+1] < gd[9*j+c+2] THEN 1 ELSE 0 END)
                          * (1 << (7-c)) FOR c IN range(0, 8)])
                FOR j IN range(0, 8)] AS db
        FROM s)"""

  // byte²-energy contour bytes of DecodeStub.audioPerceptualHash's
  // fallback path over a (doc_id, text) relation named `src`: 65
  // slices [k·n/65, max(from+1, (k+1)·n/65)), bit i = mean energy
  // rises i → i+1 via integer cross-multiplication
  private val audioHashBytesSql = """
      t AS (SELECT doc_id, text, length(text) AS n FROM src),
      sg AS (
        SELECT doc_id,
               [CAST(list_sum([ascii(substr(text, CAST(j AS INT), 1))
                               * ascii(substr(text, CAST(j AS INT), 1))
                               FOR j IN range((k*n)//65 + 1,
                                 GREATEST((k*n)//65 + 2, ((k+1)*n)//65 + 1))])
                     AS BIGINT) FOR k IN range(0, 65)] AS e,
               [GREATEST(1, ((k+1)*n)//65 - (k*n)//65)
                FOR k IN range(0, 65)] AS ln
        FROM t),
      byt AS (
        SELECT doc_id,
               [list_sum([(CASE WHEN e[8*j+c+2] * ln[8*j+c+1]
                                   > e[8*j+c+1] * ln[8*j+c+2]
                           THEN 1 ELSE 0 END) * (1 << (7-c))
                          FOR c IN range(0, 8)])
                FOR j IN range(0, 8)] AS cb
        FROM sg)"""

  // byte-mean contour bytes of DecodeStub.videoPerceptualHash's
  // whole-payload fallback path over a (doc_id, text) relation named
  // `src`: same 65-slice window formula as the audio contour, plain
  // byte sums (means, not energies), cross-multiplied comparisons
  private val videoHashBytesSql = """
      t AS (SELECT doc_id, text, length(text) AS n FROM src),
      sg AS (
        SELECT doc_id,
               [CAST(list_sum([ascii(substr(text, CAST(j AS INT), 1))
                               FOR j IN range((k*n)//65 + 1,
                                 GREATEST((k*n)//65 + 2, ((k+1)*n)//65 + 1))])
                     AS BIGINT) FOR k IN range(0, 65)] AS e,
               [GREATEST(1, ((k+1)*n)//65 - (k*n)//65)
                FOR k IN range(0, 65)] AS ln
        FROM t),
      byt AS (
        SELECT doc_id,
               [list_sum([(CASE WHEN e[8*j+c+2] * ln[8*j+c+1]
                                   > e[8*j+c+1] * ln[8*j+c+2]
                           THEN 1 ELSE 0 END) * (1 << (7-c))
                          FOR c IN range(0, 8)])
                FOR j IN range(0, 8)] AS vb
        FROM sg)"""

  val oracles: Map[String, String] = Map(
    "mm_video_phash" -> s"""
      WITH src AS (SELECT doc_id, text FROM documents),
      $videoHashBytesSql
      SELECT doc_id,
             array_to_string([printf('%02x', CAST(x AS INT)) FOR x IN vb], '')
               AS vhash_hex
      FROM byt ORDER BY doc_id""",
    "mm_video_neardup" -> s"""
      WITH src AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0),
      $videoHashBytesSql
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(list_sum([bit_count(xor(CAST(a.vb[j] AS BIGINT),
                                          CAST(b.vb[j] AS BIGINT)))
                            FOR j IN range(1, 9)]) AS BIGINT) AS hamming
      FROM byt a JOIN byt b ON a.doc_id < b.doc_id
      WHERE list_sum([bit_count(xor(CAST(a.vb[j] AS BIGINT),
                                    CAST(b.vb[j] AS BIGINT)))
                      FOR j IN range(1, 9)]) <= 3
      ORDER BY id_a, id_b""",
    "mm_interleave" -> """
      WITH it AS (
        SELECT doc_id,
               COALESCE(array_to_string(toks[1:8], ' '), '') || ' <img:' ||
               CAST((doc_id + 7) % 500 AS VARCHAR) || '> ' ||
               COALESCE(array_to_string(toks[9:16], ' '), '') || ' <img:' ||
               CAST(CASE WHEN doc_id % 100 = 0 THEN 999999
                         ELSE (doc_id + 13) % 500 END AS VARCHAR) || '> ' ||
               COALESCE(array_to_string(toks[17:24], ' '), '') AS itext
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks
              FROM documents)),
      seg0 AS (
        SELECT doc_id,
               list_filter(list_transform(string_split(
                 regexp_replace(itext, '(<img:[0-9]+>)',
                   chr(31) || '\1' || chr(31), 'g'),
                 chr(31)), x -> trim(x)), x -> x <> '') AS segs
        FROM it),
      seg AS (
        SELECT doc_id,
               unnest([{'seg_idx': i - 1, 'seg': segs[i]}
                       FOR i IN range(1, len(segs) + 1)],
                      recursive := true)
        FROM seg0),
      cls AS (
        SELECT doc_id, CAST(seg_idx AS INT) AS seg_idx,
               CASE WHEN regexp_matches(seg, '^<img:[0-9]+>$')
                    THEN 'image' ELSE 'text' END AS kind,
               CASE WHEN regexp_matches(seg, '^<img:[0-9]+>$')
                    THEN CAST(regexp_extract(seg, '^<img:([0-9]+)>$', 1)
                              AS BIGINT) END AS media_id,
               CASE WHEN NOT regexp_matches(seg, '^<img:[0-9]+>$')
                    THEN seg END AS content
        FROM seg),
      med AS (SELECT doc_id AS media_id, md5(text) AS media_md5
              FROM documents)
      SELECT c.doc_id, c.seg_idx, c.kind,
             COALESCE(c.media_id, -1) AS media_id,
             md5(COALESCE(c.content, '')) AS content_md5,
             CAST(CASE WHEN c.kind = 'text' OR m.media_md5 IS NOT NULL
                  THEN 1 ELSE 0 END AS INT) AS resolved,
             COALESCE(m.media_md5, '') AS media_md5
      FROM cls c LEFT JOIN med m ON c.media_id = m.media_id
      ORDER BY doc_id, seg_idx""",
    "mm_audio_phash" -> s"""
      WITH src AS (SELECT doc_id, text FROM documents),
      $audioHashBytesSql
      SELECT doc_id,
             array_to_string([printf('%02x', CAST(x AS INT)) FOR x IN cb], '')
               AS chash_hex
      FROM byt ORDER BY doc_id""",
    "mm_audio_neardup" -> s"""
      WITH src AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0),
      $audioHashBytesSql
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(list_sum([bit_count(xor(CAST(a.cb[j] AS BIGINT),
                                          CAST(b.cb[j] AS BIGINT)))
                            FOR j IN range(1, 9)]) AS BIGINT) AS hamming
      FROM byt a JOIN byt b ON a.doc_id < b.doc_id
      WHERE list_sum([bit_count(xor(CAST(a.cb[j] AS BIGINT),
                                    CAST(b.cb[j] AS BIGINT)))
                      FOR j IN range(1, 9)]) <= 3
      ORDER BY id_a, id_b""",
    "mm_phash" -> s"""
      WITH src AS (SELECT doc_id, text FROM documents),
      $phashBytesSql
      SELECT doc_id,
             array_to_string([printf('%02x', CAST(x AS INT)) FOR x IN ab], '')
               AS ahash_hex,
             array_to_string([printf('%02x', CAST(x AS INT)) FOR x IN db], '')
               AS dhash_hex
      FROM byt ORDER BY doc_id""",
    "mm_image_neardup" -> s"""
      WITH src AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0),
      $phashBytesSql
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(list_sum([bit_count(xor(CAST(a.db[j] AS BIGINT),
                                          CAST(b.db[j] AS BIGINT)))
                            FOR j IN range(1, 9)]) AS BIGINT) AS hamming
      FROM byt a JOIN byt b ON a.doc_id < b.doc_id
      WHERE list_sum([bit_count(xor(CAST(a.db[j] AS BIGINT),
                                    CAST(b.db[j] AS BIGINT)))
                      FOR j IN range(1, 9)]) <= 3
      ORDER BY id_a, id_b""",
    "mm_image_dedup_apply" -> s"""
      WITH RECURSIVE src AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0),
      $phashBytesSql,
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM byt a JOIN byt b ON a.doc_id < b.doc_id
        WHERE list_sum([bit_count(xor(CAST(a.db[j] AS BIGINT),
                                      CAST(b.db[j] AS BIGINT)))
                        FOR j IN range(1, 9)]) <= 3),
      edges AS (
        SELECT id_a AS esrc, id_b AS edst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(rsrc, rdst) AS (
        SELECT DISTINCT esrc, esrc FROM edges
        UNION
        SELECT r.rsrc, e.edst FROM reach r JOIN edges e ON r.rdst = e.esrc),
      comp AS (
        SELECT rsrc AS doc_id, MIN(rdst) AS cluster_id
        FROM reach GROUP BY rsrc)
      SELECT doc_id FROM src
      WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
      ORDER BY doc_id""",
    "mm_audio_meta" -> """
      SELECT doc_id, 'unknown' AS format,
             8000 + (ascii(substr(text, 1, 1)) % 8) * 1000 AS sample_rate,
             1 + ascii(substr(text, length(text), 1)) % 2 AS channels,
             round(CAST(length(text) AS DOUBLE) /
                   (8000 + (ascii(substr(text, 1, 1)) % 8) * 1000), 6)
               AS duration_s,
             0 AS bitrate_kbps
      FROM documents
      ORDER BY doc_id""",
    "mm_payload_meta" -> """
      SELECT doc_id, 'text' AS modality,
             CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
             md5(text) AS payload_md5
      FROM documents ORDER BY doc_id""",
    "mm_frame_sample" -> """
      WITH idx AS (SELECT UNNEST([0,1,2,3]) AS frame_idx)
      SELECT d.doc_id, i.frame_idx,
             md5(substr(d.text,
                 GREATEST(1, CAST(floor((length(d.text) - 32) * i.frame_idx / 3.0) AS BIGINT) + 1),
                 32)) AS frame_hash
      FROM documents d CROSS JOIN idx i
      ORDER BY d.doc_id, i.frame_idx""",
    "mm_decode_features" -> """
      SELECT doc_id,
             1 + ascii(substr(text, 1, 1)) % 640 AS width,
             1 + ascii(substr(text, length(text), 1)) % 480 AS height,
             round(list_avg(list_transform(range(1, length(text) + 1),
               i -> ascii(substr(text, CAST(i AS INT), 1)))), 4) AS mean_byte
      FROM documents
      ORDER BY doc_id""",
    "mm_audio_features" -> """
      SELECT doc_id,
             8000 + (ascii(substr(text, 1, 1)) % 8) * 1000 AS sample_rate,
             1 + ascii(substr(text, length(text), 1)) % 2 AS channels,
             CAST(length(text) AS BIGINT) AS frames,
             round(CAST(length(text) AS DOUBLE) /
                   (8000 + (ascii(substr(text, 1, 1)) % 8) * 1000), 6)
               AS duration_s,
             round(sqrt(CAST(list_sum(list_transform(range(1, length(text) + 1),
                   i -> ascii(substr(text, CAST(i AS INT), 1))
                      * ascii(substr(text, CAST(i AS INT), 1)))) AS DOUBLE)
                 / length(text)) / 255.0, 6) AS rms
      FROM documents
      ORDER BY doc_id""")
}
