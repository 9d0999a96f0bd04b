package graft.functions

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("native functions callable from SQL after install") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      """SELECT graft_simhash64('the quick brown fox') AS h,
        |       graft_shingles('a b c d', 2) AS sh,
        |       graft_dotq(array(1L, 2L), array(3L, 4L)) AS d,
        |       graft_chunks('a b c d e', 2, 2) AS ch,
        |       graft_shingles_all('a b a b', 2) AS sha
        |""".stripMargin).head()
    assert(row.getLong(0) != 0L)
    assert(row.getSeq[String](1) == Seq("a b", "b c", "c d"))
    assert(row.getLong(2) == 11L)
    assert(row.getSeq[String](3) == Seq("a b", "c d", "e"))
    assert(row.getSeq[String](4) == Seq("a b", "b a", "a b"))
    val row2 = spark.sql(
      """SELECT graft_top_ngram('a b a b c', 2) AS tg,
        |       graft_top_char_grams('xyzxyz', 3, 2) AS tc
        |""".stripMargin).head()
    assert(row2.getStruct(0).getString(0) == "a b" &&
      row2.getStruct(0).getLong(1) == 2L)
    assert(row2.getSeq[String](1) == Seq("xyz", "yzx"))
    val hh = spark.sql(
      """SELECT graft_heavy_hitters(t, 4) AS hh
        |FROM (SELECT explode(array('a', 'b', 'a')) AS t)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(hh == Seq(("a", 2L), ("b", 1L)))
  }

  test("BPE and lang-id functions callable from SQL") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      """SELECT graft_bpe_count('fast table scan') AS n,
        |       graft_bpe_tokens('fast') AS toks,
        |       graft_lang_id('the quick brown fox and the lazy dog of that era have been here') AS l
        |""".stripMargin).head()
    assert(row.getInt(0) > 0)
    assert(row.getSeq[String](1).nonEmpty &&
      row.getSeq[String](1).last == graft.functions.Bpe.EndOfWord)
    assert(row.getStruct(2).getString(0) == "en")
  }

  test("SQL results match the Column API") {
    GraftExtensions.install(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    df.createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash64(text) AS h FROM docs_ext")
    val viaCol = df.select(col("doc_id"),
      graft.text.TextFunctions.simhash64(col("text")).as("h"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("extensions class applies cleanly to a SparkSessionExtensions") {
    // the config-time path: spark.sql.extensions=graft.functions.GraftExtensions
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }
}
