package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkSpec {

  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("deterministic sample: same subset regardless of partitioning") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id")
    val b = Sampling.deterministicSample(docs.repartition(7), "doc_id", 0.3)
      .select("doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // fraction is approximately honored
    val rate = a.count().toDouble / docs.count()
    assert(rate > 0.15 && rate < 0.45, s"rate=$rate")
    // nested subsets: a 10% sample is contained in a 30% sample
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1).select("doc_id")
    assert(small.exceptAll(a).isEmpty)
  }

  test("universe sample: join-of-samples == sample-of-join, no orphans") {
    val s = spark
    import s.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val Seq(o, l) = Sampling.universeSample(Seq(
      (orders, "o_orderkey"), (lineitem, "l_orderkey")), 0.10)
    val joined = o.join(l, $"o_orderkey" === $"l_orderkey")
      .select($"o_orderkey", $"l_linenumber")
    // the algebraic identity: filtering the FULL join by the same key
    // predicate gives the identical row set
    val full = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
      .filter(Sampling.hashBucket($"o_orderkey") < 100000L)
      .select($"o_orderkey", $"l_linenumber")
    assert(joined.exceptAll(full).isEmpty && full.exceptAll(joined).isEmpty)
    // no orphans: every sampled lineitem key survives with its order
    val orphans = l.join(o, $"l_orderkey" === $"o_orderkey", "left_anti")
    assert(orphans.isEmpty)
    // contrast: INDEPENDENT 10% row samples of each side retain ~1% of
    // join pairs — the property universe sampling exists to avoid
    // (seeded Spark row-sample; any seeds demonstrate the p² decay)
    val oInd = orders.sample(0.10, seed = 1)
    val lInd = lineitem.sample(0.10, seed = 2)
    val indPairs = oInd.join(lInd, $"o_orderkey" === $"l_orderkey").count()
    assert(indPairs < joined.count() / 3,
      s"independent sampling kept $indPairs vs universe ${joined.count()}")
  }

  test("stratified mix honors per-source rates; unlisted sources drop") {
    val mixed = Sampling.stratifiedMix(docs, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.0))
    val bySource = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val src0Total = docs.filter(col("source") === "src0").count()
    assert(bySource.get("src0").contains(src0Total)) // rate 1.0 keeps all
    assert(!bySource.contains("src1")) // rate 0.0 drops all
    assert(bySource.keySet == Set("src0")) // unlisted sources drop
  }

  test("stratified quota: exactly min(n, stratum) rows, hash-deterministic, heap-planned") {
    val n = 25
    val out = Sampling.stratifiedQuota(docs, "source", "doc_id", n)
    val perSource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource == totals.map { case (s, t) => s -> math.min(n.toLong, t) })
    // partitioning-independent selection
    val again = Sampling.stratifiedQuota(docs.repartition(7), "source",
      "doc_id", n).select("doc_id")
    assert(out.select("doc_id").exceptAll(again).isEmpty &&
      again.exceptAll(out.select("doc_id")).isEmpty)
    // equals the literal ranked-window spelling of the same rule
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(Sampling.hashBucket(col("doc_id")), col("doc_id"))
    val reference = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n).select("doc_id")
    assert(out.select("doc_id").exceptAll(reference).isEmpty &&
      reference.exceptAll(out.select("doc_id")).isEmpty)
    // ranking runs on the bounded heap, not a per-stratum sort
    assert(out.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("weighted quota: exact per-stratum n, heavier weights win more " +
      "tickets, zero-weight rows fill last, partition-independent, " +
      "heap-planned") {
    import spark.implicits._
    val s2 = spark
    // one stratum: 100 heavy (w=8), 100 light (w=1), 20 zero (w=0)
    val rows = (0 until 100).map(i => (s"h$i", "s", 8L)) ++
      (0 until 100).map(i => (s"l$i", "s", 1L)) ++
      (0 until 20).map(i => (s"z$i", "s", 0L))
    val df = rows.toDF("k", "src", "w")
    val out = Sampling.weightedQuota(df, "src", "k", col("w"), n = 50)
      .collect().map(_.getString(0))
    assert(out.length == 50)
    val heavy = out.count(_.startsWith("h"))
    val light = out.count(_.startsWith("l"))
    // min-of-8-tickets beats min-of-1 with prob 8/9: heavy should
    // clearly dominate (binomial-comfortable margin, deterministic
    // data so this never flakes)
    assert(heavy > light * 2, s"heavy=$heavy light=$light")
    assert(!out.exists(_.startsWith("z")),
      "zero-weight rows must not enter while positive-weight rows remain")
    // zero-weight rows DO fill an underfilled quota, tie-broken by key
    val tiny = ((0 until 3).map(i => (s"p$i", "s", 1L)) ++
      (0 until 5).map(i => (s"z$i", "s", 0L))).toDF("k", "src", "w")
    val filled = Sampling.weightedQuota(tiny, "src", "k", col("w"), n = 6)
      .collect().map(_.getString(0)).sorted
    assert(filled.length == 6 && filled.count(_.startsWith("p")) == 3 &&
      filled.count(_.startsWith("z")) == 3)
    assert(filled.filter(_.startsWith("z")).toSeq == Seq("z0", "z1", "z2"))
    // partitioning-independent; bounded-heap plan; quota exactness on
    // the real corpus with a length weight
    val docsQ = Sampling.weightedQuota(docs, "source", "doc_id",
      expr("n_chars DIV 300"), n = 25)
    val again = Sampling.weightedQuota(docs.repartition(7), "source",
      "doc_id", expr("n_chars DIV 300"), n = 25).select("doc_id")
    assert(docsQ.select("doc_id").exceptAll(again).isEmpty &&
      again.exceptAll(docsQ.select("doc_id")).isEmpty)
    assert(docsQ.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val fb = graft.PlanProbe.codegenFallbacks(docsQ)
    assert(fb.isEmpty, fb.mkString(", "))
  }

  test("exact global sample: n rows, nested in larger samples, TakeOrdered plan") {
    val out = Sampling.exactSample(docs, "doc_id", 50)
    assert(out.count() == 50)
    // selection is the hash-lowest prefix: a 50-sample nests in a 120-sample
    val bigger = Sampling.exactSample(docs, "doc_id", 120).select("doc_id")
    assert(out.select("doc_id").exceptAll(bigger).isEmpty)
    // partitioning-independent
    val again = Sampling.exactSample(docs.repartition(7), "doc_id", 50)
    assert(out.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
    // per-partition top-n + driver merge — no global sort exchange
    assert(out.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    // n beyond the corpus keeps everything
    assert(Sampling.exactSample(docs, "doc_id", Int.MaxValue).count() == docs.count())
  }

  test("split assignment: disjoint cover, deterministic, full allocation leaves no NULLs") {
    val out = Sampling.assignSplits(docs, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)).cache()
    try {
      assert(out.count() == docs.count())
      // fully-allocated fractions must label EVERY row (the 0.8+0.1+0.1
      // cumulative sum lands a hair under 1.0 in FP — rounding, not
      // truncation, keeps the top bucket in 'test')
      assert(out.filter(col("split").isNull).count() == 0)
      val byName = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byName.keySet == Set("train", "valid", "test"))
      assert(byName("train") > byName("valid") && byName("train") > byName("test"))
      // no shuffle: pure projection
      assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally out.unpersist()
    // under-allocated fractions hold the remainder out as NULL
    val held = Sampling.assignSplits(docs, "doc_id", Seq("train" -> 0.5))
    assert(held.filter(col("split").isNull).count() > 0)
    // same key, same split, any partitioning
    val again = Sampling.assignSplits(docs.repartition(7), "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    assert(out.select("doc_id", "split").exceptAll(
      again.select("doc_id", "split")).isEmpty)
  }

  test("group-keyed splits: cluster members share a split, singletons == row-keyed") {
    val s = spark
    import s.implicits._
    // clusters: {1,2,3} -> rep 1, {10,11} -> rep 10; everything else solo
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val out = Sampling.assignSplitsByGroup(docs, "doc_id", groups,
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)).cache()
    try {
      assert(out.count() == docs.count())
      // every cluster lands in exactly one split — leakage impossible
      val perCluster = out.join(groups, Seq("doc_id"))
        .groupBy("cluster_id")
        .agg(countDistinct(col("split")).as("ns"))
        .collect().map(_.getLong(1))
      assert(perCluster.nonEmpty && perCluster.forall(_ == 1L))
      // a member's split is its REPRESENTATIVE's row-keyed split
      val repSplit = Sampling.assignSplits(docs.filter(col("doc_id") === 1L),
        "doc_id", Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .select("split").head().getString(0)
      val memberSplits = out.filter(col("doc_id").isin(1L, 2L, 3L))
        .select("split").collect().map(_.getString(0)).toSet
      assert(memberSplits == Set(repSplit))
      // singletons: identical to plain row-keyed assignment
      val solo = Sampling.assignSplits(docs, "doc_id",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      assert(out.filter(!col("doc_id").isin(1L, 2L, 3L, 10L, 11L))
        .select("doc_id", "split")
        .exceptAll(solo.filter(!col("doc_id").isin(1L, 2L, 3L, 10L, 11L))
          .select("doc_id", "split")).isEmpty)
    } finally out.unpersist()
  }

  test("working columns never clobber user columns of the same name") {
    // a corpus that already carries rank/__bucket/__w/__cum columns —
    // the operators' internals must pick fresh names, not drop them
    val loaded = docs.withColumn("rank", lit(7))
      .withColumn("__bucket", lit(8L))
      .withColumn("__w", lit(9L))
      .withColumn("__cum", lit(10L))
    val quota = Sampling.stratifiedQuota(loaded, "source", "doc_id", 5)
    assert(quota.columns.count(_ == "rank") == 1)
    assert(quota.columns.count(_ == "__bucket") == 1)
    assert(quota.select("rank", "__bucket").distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((7, 8L)))
    val exact = Sampling.exactSample(loaded, "doc_id", 5)
    assert(exact.columns.count(_ == "__bucket") == 1)
    assert(exact.select("__bucket").distinct().head().getLong(0) == 8L)
    // selection is unchanged by the presence of the extra columns
    assert(exact.select("doc_id").exceptAll(
      Sampling.exactSample(docs, "doc_id", 5).select("doc_id")).isEmpty)
    val packed = Sampling.packSequences(loaded, "source", "doc_id",
      graft.text.TextFunctions.tokenCount(col("text")), 100L)
    assert(packed.columns.count(_ == "__w") == 1)
    assert(packed.columns.count(_ == "__cum") == 1)
    assert(packed.select("__w", "__cum").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((9L, 10L)))
  }

  test("sampling is a pure filter: no shuffle") {
    val plan = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("token-budget mix caps each source near the budget, deterministically") {
    import graft.text.TextFunctions
    val w = TextFunctions.tokenCount(col("text"))
    val totals = docs.groupBy(col("source"))
      .agg(sum(w.cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = totals.values.min / 2 // force real downsampling everywhere
    val mixed = Sampling.tokenBudgetMix(docs, "source", "doc_id", w, budget)
    val kept = mixed.groupBy(col("source"))
      .agg(sum(w.cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every source was reduced, and none wildly overshoots the budget
    // (hash sampling is binomial — allow generous slack at 25-doc sources)
    kept.foreach { case (src, t) =>
      assert(t < totals(src), s"$src not reduced")
      assert(t <= budget * 3, s"$src kept $t for budget $budget")
    }
    // deterministic: identical subset on a re-run
    val again = Sampling.tokenBudgetMix(docs, "source", "doc_id", w, budget)
      .select("doc_id")
    assert(mixed.select("doc_id").exceptAll(again).isEmpty &&
      again.exceptAll(mixed.select("doc_id")).isEmpty)
    // a budget above every total keeps everything
    val all = Sampling.tokenBudgetMix(docs, "source", "doc_id", w,
      totals.values.max * 2)
    assert(all.count() == docs.count())
  }

  test("temperature mix: rarest source whole, rates = sqrt(cmin/c), empty ok") {
    val counts = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cMin = counts.values.min
    val mixed = Sampling.temperatureMix(docs, "source", "doc_id", alpha = 0.5)
    // the formula is pinned: identical to stratifiedMix at hand-derived rates
    val expected = Sampling.stratifiedMix(docs, "source", "doc_id",
      counts.map { case (s, c) => s -> math.sqrt(cMin.toDouble / c) })
    assert(mixed.select("doc_id").exceptAll(expected.select("doc_id")).isEmpty &&
      expected.select("doc_id").exceptAll(mixed.select("doc_id")).isEmpty)
    // every rarest source survives whole (rate exactly 1.0)
    val kept = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.filter(_._2 == cMin).keys.foreach { s =>
      assert(kept.get(s).contains(counts(s)), s"rarest source $s not whole")
    }
    // flattening: dominant sources keep a SMALLER fraction than rare ones
    val fracs = counts.map { case (s, c) =>
      c -> kept.getOrElse(s, 0L).toDouble / c }
    val (big, bigFrac) = fracs.maxBy(_._1)
    val (small, smallFrac) = fracs.minBy(_._1)
    if (big > small) assert(bigFrac <= smallFrac + 1e-9,
      s"dominant $big frac $bigFrac > rare $small frac $smallFrac")
    // empty input passes through
    assert(Sampling.temperatureMix(docs.limit(0), "source", "doc_id").count() == 0)
  }

  test("weighted sample: weight 1 keeps all, weight 0 none, deterministic between") {
    assert(Sampling.weightedSample(docs, "doc_id", lit(1.0)).count() ==
      docs.count())
    assert(Sampling.weightedSample(docs, "doc_id", lit(0.0)).count() == 0)
    // out-of-range weights clamp instead of misbehaving
    assert(Sampling.weightedSample(docs, "doc_id", lit(7.5)).count() ==
      docs.count())
    val half = Sampling.weightedSample(docs, "doc_id", lit(0.5))
    val again = Sampling.weightedSample(docs, "doc_id", lit(0.5))
    assert(half.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
    // weighted ⊆ uniform at the same fraction: same hash, same threshold
    val uniform = Sampling.deterministicSample(docs, "doc_id", 0.5)
    assert(half.select("doc_id").exceptAll(uniform.select("doc_id")).isEmpty)
  }

  test("sequence packing: contiguous batches near the budget, exact cover") {
    import graft.text.TextFunctions
    val packed = Sampling.packSequences(docs, "source", "doc_id",
      TextFunctions.tokenCount(col("text")), 100L)
    // every doc appears exactly once with its token count
    assert(packed.count() == docs.count())
    val batches = packed.groupBy(col("source"), col("batch_id"))
      .agg(sum(col("n_tokens")).as("t"), max(col("n_tokens")).as("m"))
      .collect()
    // a batch exceeds the budget only when a single doc spilled it:
    // total < budget + that batch's largest doc
    batches.foreach { r =>
      val (t, m) = (r.getLong(2), r.getLong(3))
      assert(t < 100L + m, s"batch total $t with max doc $m")
    }
    // batches start at 0, and batch_id is monotone in doc order (an
    // over-budget doc may skip ids — floor(start/budget) — never reuse)
    val perSource = packed.groupBy(col("source"))
      .agg(min(col("batch_id")).as("lo")).collect()
    perSource.foreach(r => assert(r.getLong(1) == 0L))
    val disorder = packed.as("a").join(packed.as("b"),
        col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.batch_id") > col("b.batch_id"))
      .count()
    assert(disorder == 0L)
  }

  test("materializePacked: hand-checked offsets and byte-stream pin") {
    val s = spark
    import s.implicits._
    // one stream, budget 10: docs of 4, 5, 3, 9 tokens →
    // batch 0 = [a (off 0), b (off 4)] (cum 9), batch 0 closes at 9;
    // c starts at cum 9 → floor(9/10) = 0 → batch 0 too (off 9);
    // d starts at cum 12 → batch 1 (off 0)
    val docs = Seq(
      (1L, "s", "w1 w2 w3 w4", 4L),
      (2L, "s", "x1 x2 x3 x4 x5", 5L),
      (3L, "s", "y1 y2 y3", 3L),
      (4L, "s", "z1 z2 z3 z4 z5 z6 z7 z8 z9", 9L)
    ).toDF("doc_id", "source", "text", "w")
    val out = Sampling.materializePacked(docs, "source", "doc_id",
        "text", col("w"), budget = 10L)
      .collect().map(r => r.getAs[Long]("batch_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("batch_tokens"),
          r.getAs[String]("offsets"), r.getAs[String]("packed_md5")))).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L)._1 == 3L && out(0L)._2 == 12L)
    assert(out(0L)._3 == "0,4,9")
    assert(out(1L)._1 == 1L && out(1L)._2 == 9L && out(1L)._3 == "0")
    // the packed stream is the RS-joined doc texts in key order
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0L)._4 ==
      md5hex("w1 w2 w3 w4\u001ex1 x2 x3 x4 x5\u001ey1 y2 y3"))
    assert(out(1L)._4 == md5hex("z1 z2 z3 z4 z5 z6 z7 z8 z9"))
  }

  test("materializePacked: NULL text keeps its slot as the empty string " +
      "(the coalesce contract survives the compiled re-pack, round 15)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "s", "aa bb", 2L),
      (2L, "s", null.asInstanceOf[String], 3L), // null text, 3 tokens
      (3L, "s", "cc", 1L)
    ).toDF("doc_id", "source", "text", "w")
    val out = Sampling.materializePacked(docs, "source", "doc_id",
        "text", col("w"), budget = 100L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("batch_tokens") == 6L)
    assert(r.getAs[String]("offsets") == "0,2,5") // null doc HOLDS its slot
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // the null text concatenates as "" BETWEEN the separators — the
    // md5 stays aligned with the offsets
    assert(r.getAs[String]("packed_md5") == md5hex("aa bb\u001e\u001ecc"))
  }

  test("lengthBucketedBatches: exact NTILE buckets, bounded batches, monotone lengths") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val docs = (1 to 103).map(i => (i.toLong, 1L + rnd.nextInt(500)))
      .toDF("doc_id", "w")
    val out = Sampling.lengthBucketedBatches(docs, "doc_id", col("w"),
        nBuckets = 4, batchSize = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Int]("bucket"), r.getAs[Long]("batch_id")))
    assert(out.length == 103)
    // exact NTILE sizes: 103 = 3×26 + 1×25
    val byBucket = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byBucket == Map(1 -> 26, 2 -> 26, 3 -> 26, 4 -> 25), byBucket)
    // every batch holds at most batchSize rows; ids 0..ceil(n/10)-1
    out.groupBy(r => (r._3, r._4)).foreach { case ((b, id), rows) =>
      assert(rows.length <= 10 && id >= 0 && id <= 2, s"($b,$id)=${rows.length}")
    }
    // buckets are length-ordered: every token count in bucket k is <=
    // every count in bucket k+1 (ties split deterministically by id)
    val maxPerBucket = out.groupBy(_._3).view.mapValues(_.map(_._2).max).toMap
    val minPerBucket = out.groupBy(_._3).view.mapValues(_.map(_._2).min).toMap
    (1 to 3).foreach { b =>
      assert(maxPerBucket(b) <= minPerBucket(b + 1),
        s"bucket $b max ${maxPerBucket(b)} > bucket ${b + 1} min ${minPerBucket(b + 1)}")
    }
  }

  test("materializePacked invariants on random weights: offsets tile each batch") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val docs = (1 to 300).map(i =>
      (i.toLong, s"src${i % 3}", s"doc body $i", 1L + rnd.nextInt(40)))
      .toDF("doc_id", "source", "text", "w")
    val out = Sampling.materializePacked(docs, "source", "doc_id",
        "text", col("w"), budget = 64L)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val offs = r.getAs[String]("offsets").split(",").map(_.toLong)
      val nDocs = r.getAs[Long]("n_docs")
      val total = r.getAs[Long]("batch_tokens")
      assert(offs.length == nDocs)
      assert(offs.head == 0L)
      // strictly increasing (weights are >= 1) and bounded by total
      assert(offs.zip(offs.tail).forall { case (a, b) => a < b }, offs.toSeq)
      assert(offs.last < total)
    }
    // per (source, batch): union of docs matches packSequences exactly
    val direct = Sampling.packSequences(docs, "source", "doc_id",
        col("w"), 64L)
      .groupBy(col("source"), col("batch_id"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    out.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[Long]("batch_id"))
      assert(direct(k) ==
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("batch_tokens"))), k)
    }
  }

  test("shardAndShuffle: balanced shards, contiguous ranks, layout-independent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Sampling.shardAndShuffle(docs, "doc_id", nShards = 8)
      .select(col("doc_id"), col("shard"), col("shard_pos"))
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every doc exactly once; shards cover [0, 8)
    assert(rows.length == docs.count())
    assert(rows.map(_._2).toSet.subsetOf((0 until 8).toSet))
    // shard_pos is exactly 1..n within each shard (a rank, no gaps)
    rows.groupBy(_._2).values.foreach { sh =>
      assert(sh.map(_._3).sorted.toSeq == (1L to sh.length).toSeq)
    }
    // hash-balanced: no shard more than 2x the mean
    val sizes = rows.groupBy(_._2).values.map(_.length)
    assert(sizes.max <= 2 * (rows.length / 8), sizes.toSeq.sorted)
    // within-shard order is NOT id order (it is a shuffle): at least
    // one shard has an inversion
    val inverted = rows.groupBy(_._2).values.exists { sh =>
      val byPos = sh.sortBy(_._3).map(_._1).toSeq
      byPos != byPos.sorted
    }
    assert(inverted, "within-shard order degenerated to id order")
    // deterministic under a different input layout
    val again = Sampling.shardAndShuffle(docs.repartition(13), "doc_id", 8)
      .select(col("doc_id"), col("shard"), col("shard_pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == rows.toSet)
  }

  test("dataConstrainedAllocation: caps, one redistribution round, hand-checked") {
    val s2 = spark
    import s2.implicits._
    // A: small source with a big mixture weight -> caps at 2 epochs;
    // B/C: uncapped, share A's surplus by weight
    val perSource = Seq(
      ("A", 100L, 6L), ("B", 1000L, 3L), ("C", 1000L, 1L))
      .toDF("source", "tokens", "weight")
    val out = Sampling.dataConstrainedAllocation(perSource,
        budget = 2000L, maxEpochs = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // wtot=10: prop A=1200 cap 200 -> 200; B=600; C=200. leftover=1000,
    // uncapped weight=4: B += min(2000-600, 1000*3/4=750)=750 -> 1350;
    // C += min(1800, 250)=250 -> 450
    assert(out("A") == ((100L, 200L, 2.0)), out)
    assert(out("B") == ((1000L, 1350L, 1.35)), out)
    assert(out("C") == ((1000L, 450L, 0.45)), out)
    // budget under every cap: pure proportional split, no extras
    val flat = Sampling.dataConstrainedAllocation(perSource,
        budget = 300L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(flat == Map("A" -> 180L, "B" -> 90L, "C" -> 30L), flat)
  }
}
