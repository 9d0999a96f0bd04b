package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KllSpec extends AnyFunSuite with SparkSpec {

  test("exact regime: kllQuantiles ≡ exactQuantiles on real data, " +
      "bit-identical under every partitioning and merge order") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("v"))
    val qs = Seq(0.25, 0.5, 0.9, 0.95)
    val exact = graft.operators.Quantiles
      .exactQuantiles(li, "l_returnflag", "v", qs)
      .select(col("l_returnflag"), col("q"), col("value"))
    for (parts <- Seq(1, 7, 32)) {
      val sk = li.repartition(parts)
        .groupBy(col("l_returnflag"))
        .agg(NativeAgg.kllQuantiles(col("v"), 65536, qs).as("vals"))
        .select(col("l_returnflag"),
          posexplode(col("vals")).as(Seq("qi", "value")))
        .select(col("l_returnflag"),
          element_at(array(qs.map(lit): _*), col("qi") + 1).as("q"),
          col("value"))
      assert(sk.exceptAll(exact).isEmpty && exact.exceptAll(sk).isEmpty,
        s"parts=$parts")
    }
  }

  test("exact-regime merge is associative and order-free: per-slice " +
      "sketches merged via KllMergeAgg ≡ one-shot sketch, any slicing") {
    import spark.implicits._
    val vs = (1 to 3000).map(i => ((i * 7919) % 3000).toDouble)
    val qs = Seq(0.1, 0.5, 0.99)
    val oneShot = vs.toDF("v")
      .agg(NativeAgg.kllQuantiles(col("v"), 4096, qs)).head().getSeq[Double](0)
    for (slices <- Seq(2, 5, 17)) {
      val sliced = vs.zipWithIndex.map { case (v, i) => (i % slices, v) }
        .toDF("slice", "v")
        .groupBy(col("slice"))
        .agg(NativeAgg.kllSketch(col("v"), 4096).as("kll"))
        .agg(NativeAgg.kllStateQuantiles(
          NativeAgg.kllMerge(col("kll"), 4096), qs))
        .head().getSeq[Double](0)
      assert(sliced == oneShot, s"slices=$slices: $sliced vs $oneShot")
    }
  }

  test("compacted regime: rank error within the deterministic-compactor " +
      "bound for every partitioning; quantiles are actual data values") {
    import spark.implicits._
    val n = 200000
    val k = 256
    val rng = new scala.util.Random(7)
    val vs = Array.fill(n)(rng.nextDouble() * 1e6)
    val sorted = vs.sorted
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    // deterministic-compactor bound: ≤ one level-h compaction error
    // (2^h ranks) per k·2^h mass through level h → ~n/k per level
    val bound = ((math.log(n.toDouble / k) / math.log(2)).ceil + 2) * n / k
    for (parts <- Seq(4, 32)) {
      val got = vs.toSeq.toDF("v").repartition(parts)
        .agg(NativeAgg.kllQuantiles(col("v"), k, qs))
        .head().getSeq[Double](0)
      qs.zip(got).foreach { case (q, v) =>
        val target = math.max(1L, math.ceil(q * n).toLong)
        val rank = java.util.Arrays.binarySearch(sorted, v)
        assert(rank >= 0, s"returned value $v is not a data element")
        val err = math.abs(rank + 1 - target)
        assert(err <= bound,
          f"parts=$parts q=$q: rank error $err > bound $bound%.0f")
      }
      // monotone across fractions
      assert(got == got.sorted, s"parts=$parts: not monotone: $got")
    }
  }

  test("nulls and NaN are excluded; an all-null group yields null " +
      "(the percentile convention); weight is conserved exactly") {
    import spark.implicits._
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", None), ("a", Some(Double.NaN)),
      ("a", Some(3.0)), ("b", None)).toDF("g", "v")
    val out = df.groupBy(col("g"))
      .agg(NativeAgg.kllQuantiles(col("v"), 64, Seq(0.5)).as("m"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(out("a") == Seq(1.0)) // median of {1.0, 3.0}: rank ceil(0.5·2)=1
    assert(out("b") == null)
    // weight conservation through heavy compaction: q=1.0's target is
    // the FULL weight n, so the cumulative walk must reach it — a
    // sketch that leaked weight in an odd-count compaction would walk
    // off the end. (The true max itself need not survive — its weight
    // shifts to a surviving neighbor within the rank bound, same as
    // every KLL.)
    val n = 50000
    val vs = (1 to n).map(_.toDouble)
    val maxQ = vs.toDF("v")
      .agg(NativeAgg.kllQuantiles(col("v"), 64, Seq(1.0)))
      .head().getSeq[Double](0).head
    val bound = ((math.log(n.toDouble / 64) / math.log(2)).ceil + 2) * n / 64
    assert(maxQ <= n.toDouble && maxQ >= n - bound,
      s"q=1.0 returned $maxQ, expected within $bound ranks of $n")
  }

  test("streaming fold: kllMergeBatch over micro-batches ≡ one-shot " +
      "sketch (deterministic merge), replay-idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kllfold").toString
    val path = s"$dir/state"
    val vs = (1 to 9000).map(i => ("t", ((i * 104729) % 9000).toDouble))
    val batches = vs.grouped(3000).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.Streams.kllMergeBatch(spark,
        b.toDF("g", "v"), path, Seq("g"), "v", 512, batchId = i.toLong)
    }
    val qs = Seq(0.25, 0.5, 0.95)
    val folded = graft.streaming.Streams
      .kllQuantilesState(spark, path, Seq("g"), qs)
      .orderBy(col("q")).collect().map(_.getDouble(2)).toSeq
    // replay of an already-applied batch must not change the state
    graft.streaming.Streams.kllMergeBatch(spark,
      batches(1).toDF("g", "v"), path, Seq("g"), "v", 512, batchId = 1L)
    val replayed = graft.streaming.Streams
      .kllQuantilesState(spark, path, Seq("g"), qs)
      .orderBy(col("q")).collect().map(_.getDouble(2)).toSeq
    assert(replayed == folded, "replay mutated the folded state")
    // the fold is a legal merge tree of the same sketch: every folded
    // quantile must sit within the rank bound of the exact answer
    val sorted = vs.map(_._2).sorted.toArray
    val n = vs.size
    val bound = ((math.log(n.toDouble / 512) / math.log(2)).ceil + 2) * n / 512
    qs.zip(folded).foreach { case (q, v) =>
      val target = math.max(1L, math.ceil(q * n).toLong)
      val rank = java.util.Arrays.binarySearch(sorted, v)
      assert(rank >= 0, s"folded value $v not a data element")
      assert(math.abs(rank + 1 - target) <= bound,
        s"q=$q rank error ${math.abs(rank + 1 - target)} > $bound")
    }
    // n_rows metadata folds exactly
    val nRows = spark.read.parquet(path).select(sum(col("n_rows")))
      .head().getLong(0)
    assert(nRows == n.toLong)
    // grid-free drift score over the folded state: the state vs a
    // one-shot reference sketch of the SAME data must score KS ≈ 0
    // within the summed rank bounds (0 exactly in the exact regime;
    // k=512 over 9k values is compacted, so bounded)
    val ref = vs.toDF("g", "v").groupBy(col("g"))
      .agg(NativeAgg.kllSketch(col("v"), 512).as("kll"))
    val ks = graft.streaming.Streams
      .kllKsState(spark, path, Seq("g"), ref)
      .head().getDouble(1)
    val e = ((math.log(n.toDouble / 512) / math.log(2)).ceil + 2) / 512
    assert(ks <= 2 * e, s"self-KS $ks > ${2 * e}")
  }

  test("two-sample KS from sketches: exact regime == brute-force KS; " +
      "identical distributions score 0; compacted within summed bounds") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val a = Array.fill(2000)(rng.nextGaussian())
    val b = Array.fill(3000)(rng.nextGaussian() + 0.4)
    def bruteKs(x: Array[Double], y: Array[Double]): Double = {
      val support = (x ++ y).distinct.sorted
      val xs = x.sorted
      val ys = y.sorted
      def cdf(s: Array[Double], v: Double): Double = {
        var lo = 0; var hi = s.length
        while (lo < hi) {
          val m = (lo + hi) >>> 1
          if (s(m) <= v) lo = m + 1 else hi = m
        }
        lo.toDouble / s.length
      }
      support.map(v => math.abs(cdf(xs, v) - cdf(ys, v))).max
    }
    def sketchOf(vs: Array[Double], k: Int) = vs.toSeq.toDF("v")
      .agg(NativeAgg.kllSketch(col("v"), k)).head().getAs[Array[Byte]](0)
    // exact regime: sketches hold everything → exact two-sample KS
    val exact = spark.range(1)
      .select(NativeAgg.kllKs(lit(sketchOf(a, 4096)), lit(sketchOf(b, 4096))))
      .head().getDouble(0)
    assert(exact == bruteKs(a, b), s"$exact vs ${bruteKs(a, b)}")
    // same distribution, same data → 0 exactly
    val zero = spark.range(1)
      .select(NativeAgg.kllKs(lit(sketchOf(a, 4096)), lit(sketchOf(a, 4096))))
      .head().getDouble(0)
    assert(zero == 0.0)
    // compacted: |sketchKS − trueKS| ≤ εa + εb (the summed rank bounds)
    val k = 128
    val skKs = spark.range(1)
      .select(NativeAgg.kllKs(lit(sketchOf(a, k)), lit(sketchOf(b, k))))
      .head().getDouble(0)
    def eps(n: Int) = ((math.log(n.toDouble / k) / math.log(2)).ceil + 2) / k
    assert(math.abs(skKs - bruteKs(a, b)) <= eps(a.length) + eps(b.length),
      s"sketch KS $skKs vs true ${bruteKs(a, b)}")
    // empty side → null
    val e = Seq.empty[Double].toDF("v")
      .agg(NativeAgg.kllSketch(col("v"), 64)).head().getAs[Array[Byte]](0)
    assert(spark.range(1)
      .select(NativeAgg.kllKs(lit(e), lit(sketchOf(a, 64)))).head().isNullAt(0))
  }

  test("double-cast boundary (VERDICT r14 #5): distinct wide decimals " +
      "beyond the 53-bit significand collide into one sketch value — " +
      "documented contract, pinned here") {
    import spark.implicits._
    // 2^53 and 2^53 + 1 are distinct longs but the SAME double
    val big = 9007199254740992L // 2^53
    val df = Seq(big, big + 1, big + 1).toDF("v")
    val qs = df.agg(NativeAgg.kllQuantiles(col("v").cast("double"), 64,
      Seq(0.000001, 1.0))).head().getSeq[Double](0)
    // all three inserts collapsed onto one double: min == max
    assert(qs(0) == qs(1) && qs(0) == big.toDouble)
    // below the boundary the distinction survives
    val ok = Seq(100L, 101L).toDF("v")
      .agg(NativeAgg.kllQuantiles(col("v").cast("double"), 64,
        Seq(0.000001, 1.0))).head().getSeq[Double](0)
    assert(ok(0) == 100.0 && ok(1) == 101.0)
  }

  test("TWO KllKsExpr in one projection compile under codegen (ADVICE " +
      "r14: with non-nullable lit children nullSafeExec emits the block " +
      "unbraced, so a fixed `Object r` local redeclared and janino " +
      "failed — freshName fixes it)") {
    import spark.implicits._
    def sketchOf(vs: Array[Double]) = vs.toSeq.toDF("v")
      .agg(NativeAgg.kllSketch(col("v"), 64)).head().getAs[Array[Byte]](0)
    val sa = sketchOf(Array(1.0, 2.0, 3.0))
    val sb = sketchOf(Array(1.5, 2.5))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = spark.range(1).select(
        NativeAgg.kllKs(lit(sa), lit(sb)).as("k1"),
        NativeAgg.kllKs(lit(sb), lit(sa)).as("k2")).head()
      assert(r.getDouble(0) == r.getDouble(1)) // KS is symmetric
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("KllSketchAgg/KllMergeAgg are imperative aggregates (allowed " +
      "fallback class); KllQuantilesExpr is codegen'd (not fallback)") {
    val cf = classOf[org.apache.spark.sql.catalyst.expressions
      .codegen.CodegenFallback]
    assert(!cf.isAssignableFrom(classOf[KllQuantilesExpr]))
  }
}
