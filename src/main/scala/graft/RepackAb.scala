package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the post-shuffle group re-packs still excused by
  * PlanAuditSpec's justifiedHofs allowlist
  * (`sbt "runMain graft.RepackAb"`): the interpreted
  * `concat_ws(sep, transform(array_sort(collect_list(struct(k, v))),
  * x -> x.v))` document-reassembly spelling vs the compiled
  * `SortedStructConcatExpr`, on the two corpus-proportional shapes the
  * round-14 verdict flagged (d10_line_dedup's per-doc line re-pack and
  * tx_dup_span_removal's per-doc token re-pack — the groups ARE
  * documents, so the lambda runs once per line/token of the corpus).
  * Same cached grouped-array frame, variants interleaved 6 rounds, MIN
  * reported; each pair also cross-checks crc32-sum equality so a faster
  * variant that changed the output fails loudly. Numbers land in
  * SCALE.md and the PlanAuditSpec justification comments.
  *
  * Measured (this host, local[32], warm legs): native 1.6–1.7×
  * (window max 2.4×) on 10.8M elements / 200k groups; first-leg
  * measurements on this host are inflated by environment noise —
  * believe the later legs and cross-run agreement. */
object RepackAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 40× the sf0.1 documents table ≈ 200k docs — the per-group
    // re-pack cost must dominate scan/setup, as in CurationAb/VecAb
    val docs = graft.queries.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), lit(39L))).as("__rep"))
      .select((col("doc_id") * 40 + col("__rep")).as("doc_id"), col("text"))
      .localCheckpoint()
    println(s"corpus: ${docs.count()} docs")

    // the d10 shape: per-doc LINE re-pack (struct<int,string>, "\n").
    // The sf0.1 documents carry no newlines, so a verbatim split("\n")
    // yields ONE line per doc (a degenerate 1-element re-pack that
    // measures nothing); re-line each doc at whitespace so the per-doc
    // element count matches the line-granularity corpora d10 targets
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\\s+", -1)).as(Seq("__idx", "__line")))
      .localCheckpoint()
    println(s"lines: ${lines.count()}")
    // the deleteIntervals shape: per-doc TOKEN re-pack (" ")
    val toks = docs.select(col("doc_id"),
      posexplode(graft.text.TextFunctions.tokens(col("text")))
        .as(Seq("pos", "tok")))
      .localCheckpoint()
    println(s"tokens: ${toks.count()}")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def ab(label: String, src: DataFrame, k: String, v: String,
        sep: String): Unit = {
      // materialize the grouped arrays ONCE so the A/B times ONLY the
      // re-pack projection (the VecAb discipline) — in the real queries
      // the collect_list shuffle is identical between spellings, so
      // the projection delta IS the optimization's whole effect
      val arrays = src.groupBy(col("doc_id"))
        .agg(collect_list(struct(col(k).as("k"), col(v).as("v"))).as("arr"))
        .localCheckpoint()
      arrays.count()
      src.unpersist(blocking = true) // the exploded frame is no longer needed
      def run(repack: org.apache.spark.sql.Column): Long =
        arrays.select(repack.as("__clean"))
          .agg(sum(crc32(col("__clean")))).head().getLong(0)
      val hof = concat_ws(sep,
        transform(array_sort(col("arr")), x => x("v")))
      val native =
        graft.functions.NativeText.sortedStructConcat(col("arr"), sep)
      var tn = Double.MaxValue; var tr = Double.MaxValue
      var hn = 0L; var hr = 0L
      // alternating rounds, hof first — the min per variant washes
      // out JIT warm-up, first-read effects and GC bursts
      for (_ <- 1 to 6) {
        tr = math.min(tr, time { hr = run(hof) })
        tn = math.min(tn, time { hn = run(native) })
      }
      require(hn == hr, s"$label: native/hof outputs DIFFER ($hn vs $hr)")
      println(f"$label%-22s native=$tn%6.2f s  hof=$tr%6.2f s  " +
        f"speedup=${tr / tn}%4.1f×  (outputs equal)")
      arrays.unpersist(blocking = true)
    }

    // heavier groups: the sf0.1 docs average ~54 tokens, real web pages
    // run ~1k — coarsen the grouping 20× so each re-packed array holds
    // ~1,080 elements (sort cost dominates, where the interpreted
    // comparator tax actually lives)
    val toksBig = docs.select(col("doc_id"),
      posexplode(graft.text.TextFunctions.tokens(col("text")))
        .as(Seq("pos", "tok")))
      .select(pmod(col("doc_id"), lit(10000L)).as("doc_id"),
        (col("pos") +
          floor(col("doc_id") / 10000L).cast("int") * 100000).as("pos"),
        col("tok"))
      .localCheckpoint()
    println(s"toksBig: ${toksBig.count()}")
    // the MULTI-KEY shapes (round 15, q11_status_listagg /
    // w_pattern_match): sort keys (long, long) and (long, string)
    // with a separate payload field — same grouped-array discipline
    def ab3(label: String, src: DataFrame, k1: org.apache.spark.sql.Column,
        k2: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column,
        sep: String): Unit = {
      val arrays = src.groupBy(col("doc_id"))
        .agg(collect_list(struct(k1.as("k1"), k2.as("k2"), v.as("v")))
          .as("arr"))
        .localCheckpoint()
      arrays.count()
      def run(repack: org.apache.spark.sql.Column): Long =
        arrays.select(repack.as("__clean"))
          .agg(sum(crc32(col("__clean")))).head().getLong(0)
      val hof = concat_ws(sep,
        transform(array_sort(col("arr")), x => x("v")))
      val native =
        graft.functions.NativeText.sortedStructConcat(col("arr"), sep)
      var tn = Double.MaxValue; var tr = Double.MaxValue
      var hn = 0L; var hr = 0L
      for (_ <- 1 to 6) {
        tr = math.min(tr, time { hr = run(hof) })
        tn = math.min(tn, time { hn = run(native) })
      }
      require(hn == hr, s"$label: native/hof outputs DIFFER ($hn vs $hr)")
      println(f"$label%-22s native=$tn%6.2f s  hof=$tr%6.2f s  " +
        f"speedup=${tr / tn}%4.1f×  (outputs equal)")
      arrays.unpersist(blocking = true)
    }

    ab("tokenRepack (spans)", toks, "pos", "tok", " ")
    ab("tokenRepack ~1k/doc", toksBig, "pos", "tok", " ")
    ab("lineRepack (d10)", lines, "__idx", "__line", "\n")
    // q11 shape: (long date-ish, long unique key) → 1-char status
    ab3("listagg (q11 shape)", toksBig,
      floor(col("pos") / 7).cast("long"), col("pos").cast("long"),
      substring(col("tok"), 1, 1), ",")
    // w_pattern shape: (long ts, string tiebreak) → 1-char letter
    ab3("eventSeq (w_pattern)", toksBig,
      col("pos").cast("long"), col("tok"),
      substring(col("tok"), 1, 1), "")
    spark.stop()
  }
}
