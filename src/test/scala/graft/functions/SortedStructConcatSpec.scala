package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Parity of the compiled group re-pack (`SortedStructConcatExpr`)
  * with the interpreted spelling it replaces —
  * `concat_ws(sep, transform(array_sort(collect_list(struct(k, v))),
  * x -> x.v))` — on the real corpus AND on the null/tie edge cases the
  * corpus never produces. The expression must be byte-identical in
  * every case: it sits under oracle-pinned rows (d10_line_dedup,
  * tx_dup_span_removal, tx_dup_span_removal_runs). */
class SortedStructConcatSpec extends AnyFunSuite with SparkSpec {

  private def hofRepack(k: String, v: String, sep: String) =
    concat_ws(sep,
      transform(array_sort(collect_list(struct(col(k), col(v)))),
        x => x(v)))

  private def nativeRepack(k: String, v: String, sep: String) =
    NativeText.sortedStructConcat(
      collect_list(struct(col(k), col(v))), sep)

  test("native re-pack ≡ interpreted spelling on real corpus lines (d10 shape)") {
    val lines = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        posexplode(split(col("text"), "\n", -1)).as(Seq("__idx", "__line")))
    val cmp = lines.groupBy(col("doc_id"))
      .agg(nativeRepack("__idx", "__line", "\n").as("native"),
        hofRepack("__idx", "__line", "\n").as("ref"))
    assert(cmp.filter(not(col("native") <=> col("ref"))).count() == 0)
  }

  test("native re-pack ≡ interpreted spelling on real corpus tokens (span shape)") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        posexplode(graft.text.TextFunctions.tokens(col("text")))
          .as(Seq("pos", "tok")))
    val cmp = toks.groupBy(col("doc_id"))
      .agg(nativeRepack("pos", "tok", " ").as("native"),
        hofRepack("pos", "tok", " ").as("ref"))
    assert(cmp.filter(not(col("native") <=> col("ref"))).count() == 0)
  }

  /** Direct array fixtures: duplicate keys (value tiebreak), null
    * values (sort nulls-first at equal key, then concat skips), null
    * ELEMENTS (ignored), empty array, unicode, negative keys. Applied
    * as a projection over a parquet round-trip so codegen actually
    * runs (a local relation would constant-fold). */
  test("edge fixtures: ties, null values, null elements, empty, unicode") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("arr", ArrayType(StructType(Seq(
        StructField("k", IntegerType),
        StructField("v", StringType)))))))
    val rows = Seq(
      Row(1, Seq(Row(3, "c"), Row(1, "a"), Row(2, "b"))),
      // duplicate key: ties break on the VALUE (struct ordering)
      Row(2, Seq(Row(1, "zz"), Row(1, "aa"), Row(0, "x"))),
      // null value at the duplicate key sorts first, concat skips it
      Row(3, Seq(Row(1, "b"), Row(1, null), Row(1, "a"))),
      // null element ignored entirely
      Row(4, Seq(Row(2, "end"), null, Row(1, "start"))),
      Row(5, Seq.empty[Row]),
      Row(6, null),
      // unicode + negative keys + separator character INSIDE a value
      Row(7, Seq(Row(-5, "é中"), Row(-9, "a b"), Row(0, ""))))
    val tmp = java.nio.file.Files.createTempDirectory("ssc_fix").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val cmp = df.select(col("id"),
      NativeText.sortedStructConcat(col("arr"), " ").as("native"),
      concat_ws(" ",
        transform(array_sort(col("arr")), x => x("v"))).as("ref"))
    val bad = cmp.filter(not(col("native") <=> col("ref"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
    // pin the semantics, not just parity
    val got = cmp.orderBy(col("id")).collect()
      .map(r => r.getAs[String]("native"))
    assert(got(0) == "a b c")
    assert(got(1) == "x aa zz")
    assert(got(2) == "a b")        // null v skipped
    assert(got(3) == "start end")  // null element skipped
    assert(got(4) == "")
    assert(got(5) == "") // null array: concat_ws skips it, never null
    assert(got(6) == "a b é中 ") // "" joins: trailing sep
  }

  test("long-key variant matches the interpreted spelling") {
    import spark.implicits._
    val df = Seq((1L, 2L, "b"), (1L, 1L, "a"), (2L, 9L, "z"))
      .toDF("g", "k", "v")
    val cmp = df.groupBy(col("g"))
      .agg(nativeRepack("k", "v", ",").as("native"),
        hofRepack("k", "v", ",").as("ref"))
    assert(cmp.filter(not(col("native") <=> col("ref"))).count() == 0)
  }

  // ---- multi-key form (round 15: q11_status_listagg / w_pattern_match) ----

  test("q11 shape: (timestamp|date, long, string) ≡ interpreted array_sort " +
      "spelling on the real orders table") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderstatus"))
    val cmp = o.groupBy(col("o_custkey"))
      .agg(
        NativeText.sortedStructConcat(
          collect_list(struct(col("o_orderdate"), col("o_orderkey"),
            col("o_orderstatus"))), ",").as("native"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("o_orderdate"),
              col("o_orderkey"), col("o_orderstatus")))),
            x => x("o_orderstatus")), ",").as("ref"))
    assert(cmp.filter(not(col("native") <=> col("ref"))).count() == 0)
  }

  test("w_pattern shape: (ts, string, string) ≡ BOTH interpreted " +
      "spellings (sort_array AND array_sort) on the real events table") {
    val e = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("l")).as("e"))
    val cmp = e.groupBy(col("user_id"))
      .agg(
        NativeText.sortedStructConcat(collect_list(col("e")), "").as("native"),
        array_join(transform(sort_array(collect_list(col("e"))),
          x => x("l")), "").as("ref_sa"),
        array_join(transform(array_sort(collect_list(col("e"))),
          x => x("l")), "").as("ref_as"))
    assert(cmp.filter(not(col("native") <=> col("ref_sa")) ||
      not(col("native") <=> col("ref_as"))).count() == 0)
  }

  /** Multi-key edge fixtures: null key fields at each position (asc
    * nulls-first per field), string-key BINARY order (uppercase before
    * lowercase), full-tie stability irrelevance (payload equal), and
    * ties resolved by the LAST (payload) field. Parquet round-trip so
    * codegen actually runs. */
  test("multi-key edge fixtures: null keys, binary string order, deep ties") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("arr", ArrayType(StructType(Seq(
        StructField("k1", LongType),
        StructField("k2", StringType),
        StructField("v", StringType)))))))
    val rows = Seq(
      // k1 ties → k2 binary order decides: "B" (0x42) < "a" (0x61)
      Row(1, Seq(Row(1L, "a", "second"), Row(1L, "B", "first"))),
      // null k1 sorts before every real k1
      Row(2, Seq(Row(0L, "x", "later"), Row(null, "z", "nullfirst"))),
      // null k2 sorts before real k2 at equal k1
      Row(3, Seq(Row(1L, "a", "real"), Row(1L, null, "nullk2"))),
      // k1 and k2 tie → payload field decides
      Row(4, Seq(Row(1L, "a", "zz"), Row(1L, "a", "aa"))))
    val tmp = java.nio.file.Files.createTempDirectory("ssc_mk").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val cmp = df.select(col("id"),
      NativeText.sortedStructConcat(col("arr"), " ").as("native"),
      concat_ws(" ",
        transform(array_sort(col("arr")), x => x("v"))).as("ref"))
    val bad = cmp.filter(not(col("native") <=> col("ref"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
    val got = cmp.orderBy(col("id")).collect()
      .map(r => r.getAs[String]("native"))
    assert(got(0) == "first second")
    assert(got(1) == "nullfirst later")
    assert(got(2) == "nullk2 real")
    assert(got(3) == "aa zz")
  }

  test("non-key field types are rejected at analysis") {
    import spark.implicits._
    val df = Seq((1, 0.5, "v")).toDF("g", "k", "v")
    val ex = intercept[Exception] {
      df.groupBy(col("g"))
        .agg(NativeText.sortedStructConcat(
          collect_list(struct(col("k"), col("v"))), ",").as("x"))
        .collect()
    }
    assert(ex.getMessage.contains("graft_sorted_struct_concat"))
  }

  test("the re-pack projection is codegen (no CodegenFallback beyond collect_list)") {
    val lines = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        posexplode(split(col("text"), "\n", -1)).as(Seq("__idx", "__line")))
    val agg = lines.groupBy(col("doc_id"))
      .agg(nativeRepack("__idx", "__line", "\n").as("__clean"))
    val fb = graft.PlanProbe.codegenFallbacks(agg)
      .filterNot(Set("CollectList"))
    assert(fb.isEmpty, fb.mkString(", "))
  }
}
