package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSpec {

  test("salted join result equals unsalted join on real tables") {
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"))
    val s_ = spark.read.parquet(s"$sf/supplier.parquet")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val plain = l.join(s_, "l_suppkey")
    val salted = Skew.saltedJoin(l, s_, "l_suppkey", "l_orderkey", salts = 4)
      .select(plain.columns.map(col): _*)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt spreads a hot key across reducers") {
    import spark.implicits._
    val hot = (1 to 1000).map(i => (42L, i.toLong)).toDF("k", "id")
    val salted = hot.withColumn("__salt", pmod(hash(col("id")), lit(8)))
    val spread = salted.groupBy("__salt").count().collect()
    assert(spread.length == 8) // all 8 salt buckets used
    assert(spread.map(_.getLong(1)).max < 1000) // no bucket holds everything
  }

  test("skew profile surfaces the hottest keys") {
    import spark.implicits._
    val df = (Seq.fill(100)(1L) ++ Seq.fill(10)(2L) ++ Seq(3L)).toDF("k")
    val prof = Skew.keySkewProfile(df, "k", topN = 2).collect()
    assert(prof.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 100L), (2L, 10L)))
  }
}
