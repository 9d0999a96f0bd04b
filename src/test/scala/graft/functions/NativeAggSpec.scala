package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NativeAggSpec extends AnyFunSuite with SparkSpec {

  private def summary(rows: Seq[String], k: Int, parts: Int): Seq[(String, Long)] = {
    val s = spark
    import s.implicits._
    rows.toDF("item").repartition(parts)
      .agg(NativeAgg.heavyHitters(col("item"), k).as("hh"))
      .head().getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
  }

  private def exact(rows: Seq[String]): Map[String, Long] =
    rows.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("k >= distinct: the sketch IS the exact count table, sorted") {
    val data = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(25)("gamma") ++ Seq.fill(10)("delta")
    val shuffled = new scala.util.Random(7).shuffle(data)
    for (parts <- Seq(1, 3, 8)) {
      val got = summary(shuffled, k = 16, parts = parts)
      assert(got == Seq(("alpha", 40L), ("beta", 25L), ("gamma", 25L),
        ("delta", 10L)), s"parts=$parts: $got")
    }
  }

  test("tie order is deterministic: count desc then item asc") {
    val got = summary(Seq("b", "a", "c", "a", "b", "c"), k = 10, parts = 2)
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 2L)))
  }

  test("approximate regime: MG guarantees hold under any partitioning") {
    // zipf-ish: item i has frequency 2000/i for i in 1..50
    val rnd = new scala.util.Random(11)
    val data = rnd.shuffle((1 to 50).flatMap(i =>
      Seq.fill(2000 / i)(f"item$i%02d")))
    val n = data.size
    val ex = exact(data)
    for ((k, parts) <- Seq((8, 1), (8, 4), (16, 8), (24, 3))) {
      val got = summary(data, k, parts)
      assert(got.size <= k)
      val bound = n.toDouble / (k + 1)
      val gotMap = got.toMap
      for ((item, c) <- got) {
        assert(c <= ex(item), s"over-count $item: $c > ${ex(item)}")
        assert(ex(item) - c <= bound,
          s"under-count $item beyond n/(k+1): ${ex(item) - c} > $bound")
      }
      // every item with true frequency > n/(k+1) must be present
      for ((item, f) <- ex if f > bound)
        assert(gotMap.contains(item), s"k=$k parts=$parts missing $item ($f > $bound)")
    }
  }

  test("nulls are skipped; empty input yields an empty summary") {
    val s = spark
    import s.implicits._
    val got = Seq(Some("x"), None, Some("x"), None).toDF("item")
      .agg(NativeAgg.heavyHitters(col("item"), 4))
      .head().getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(got == Seq(("x", 2L)))
    val empty = Seq.empty[String].toDF("item")
      .agg(NativeAgg.heavyHitters(col("item"), 4)).head().getSeq[Row](0)
    assert(empty.isEmpty)
  }

  test("grouped aggregation: one bounded summary per key") {
    val s = spark
    import s.implicits._
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"),
      ("g2", "z"), ("g2", "z"), ("g2", "z")).toDF("g", "item")
    val out = df.groupBy(col("g"))
      .agg(NativeAgg.heavyHitters(col("item"), 4).as("hh"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Row](1).map(x => (x.getString(0), x.getLong(1)))).toMap
    assert(out("g1") == Seq(("a", 2L), ("b", 1L)))
    assert(out("g2") == Seq(("z", 3L)))
  }

  test("plan: partial aggregation runs map-side (two-phase agg)") {
    val s = spark
    import s.implicits._
    val plan = Seq("a", "b").toDF("item").repartition(2)
      .agg(NativeAgg.heavyHitters(col("item"), 4))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_heavy_hitters"), plan.take(1500))
  }

  private def kmv(hashes: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    val s = spark
    import s.implicits._
    hashes.toDF("h").repartition(parts)
      .agg(NativeAgg.kmvMinHashes(col("h"), k).as("kmv"))
      .head().getSeq[Long](0)
  }

  test("kmv: exact regime keeps ALL distinct hashes, ascending, dup-folded") {
    val data = Seq(50L, 10L, 30L, 10L, 50L, 20L, 40L)
    for (parts <- Seq(1, 3))
      assert(kmv(data, k = 8, parts = parts) == Seq(10L, 20L, 30L, 40L, 50L))
  }

  test("kmv: approximate regime = k smallest distinct, any partitioning") {
    val rnd = new scala.util.Random(13)
    val data = rnd.shuffle((1L to 500L).map(_ * 7919L) ++
      (1L to 500L).map(_ * 7919L)) // every value twice
    val expect = (1L to 64L).map(_ * 7919L)
    for (parts <- Seq(1, 7))
      assert(kmv(data, k = 64, parts = parts) == expect, s"parts=$parts")
  }

  test("kmv: nulls ignored; estimate lands near truth on md5 hashes") {
    val s = spark
    import s.implicits._
    // 5000 distinct values through the house 60-bit md5 hash; the
    // Beyer et al. estimate with k=256 should land within ~25%
    // (stderr ≈ 1/√(k−2) ≈ 6.3%; 4σ headroom for one draw)
    val n = 5000
    val got = (1 to n).map(i => Some(s"v$i")).toDF("v")
      .union(Seq(Option.empty[String]).toDF("v"))
      .select(conv(substring(md5(col("v")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .agg(NativeAgg.kmvMinHashes(col("h"), 256).as("kmv"))
      .head().getSeq[Long](0)
    assert(got.length == 256)
    val est = 255.0 * 1152921504606846976.0 / got.last
    assert(math.abs(est - n) / n < 0.25, s"est=$est")
  }

  test("kmv overlap: sub-k regime makes the Jaccard estimator EXACT") {
    val s = spark
    import s.implicits._
    // |A|=6, |B|=5, |A∩B|=3, |A∪B|=8 → J = 3/8; with k=16 > |A∪B| the
    // sketches are the full sets and the union-resample estimate is J
    val a = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val b = Seq(4L, 5L, 6L, 7L, 8L)
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("s", "h")
    val sk = df.groupBy(col("s"))
      .agg(NativeAgg.kmvMinHashes(col("h"), 16).as("kmv"))
    val row = sk.as("x").join(sk.as("y"),
        col("x.s") < col("y.s"))
      .select(
        slice(array_sort(array_union(col("x.kmv"), col("y.kmv"))), 1, 16)
          .as("bigk"),
        array_intersect(col("x.kmv"), col("y.kmv")).as("inboth"))
      .select(size(array_intersect(col("bigk"), col("inboth")))
          .cast("double") / size(col("bigk")))
      .head().getDouble(0)
    assert(row == 3.0 / 8.0)
  }

  test("kmv: partial aggregation runs map-side") {
    val s = spark
    import s.implicits._
    val plan = Seq(1L, 2L).toDF("h").repartition(2)
      .agg(NativeAgg.kmvMinHashes(col("h"), 4))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_kmv_min_hashes"), plan.take(1500))
  }
}
