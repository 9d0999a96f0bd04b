package graft.dedup

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the probabilistic/engine-internal dedup paths against exhaustive
  * brute force at sf0.001 (500 docs — all-pairs is cheap here). */
class DedupSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("simhash LSH pairs == brute-force hamming pairs (completeness)") {
    val viaLsh = Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id"),
      TextFunctions.simhash64(col("text")).as("s"))
    val brute = sh.as("l").join(sh.as("r"), col("l.doc_id") < col("r.doc_id"))
      .filter(bit_count(col("l.s").bitwiseXOR(col("r.s"))) <= 3)
      .select(col("l.doc_id"), col("r.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLsh == brute, s"LSH ${viaLsh.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "fixture should contain simhash near-dups")
  }

  test("native md5-simhash expression == relational reference formulation") {
    val native = Dedup.simhashMd5Signatures(docs, "doc_id", "text")
    val reference = Dedup.simhashMd5SignaturesReference(docs, "doc_id", "text")
    assert(native.exceptAll(reference).isEmpty &&
      reference.exceptAll(native).isEmpty)
    assert(native.count() == docs.count())
  }

  test("md5-simhash blocked pairs == brute-force hamming pairs") {
    val blocked = Dedup.simhashMd5NearDuplicates(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhashMd5Signatures(docs, "doc_id", "text")
      .select(col("__id").as("doc_id"), col("__sim").as("s"))
    val brute = sh.as("l").join(sh.as("r"), col("l.doc_id") < col("r.doc_id"))
      .filter(bit_count(col("l.s").bitwiseXOR(col("r.s"))) <= 3)
      .select(col("l.doc_id"), col("r.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute, s"blocked ${blocked.size} vs brute ${brute.size}")
    // 60-bit signatures: every bit above 59 must be zero
    val bad = sh.filter(shiftright(col("s"), 60) =!= 0L).count()
    assert(bad == 0L)
  }

  test("LSH hot-band cap: mass duplicates emit star pairs, not O(n²)") {
    val spark2 = spark
    import spark2.implicits._
    // 60 byte-identical docs (+ a handful of distinct ones) — every band
    // of the 60 collides, the uncapped join would emit C(60,2)=1770 pairs
    val clone = "the same exact document body repeated many times over and over again"
    val docs = ((1L to 60L).map(i => (i, clone)) ++
      (61L to 70L).map(i => (i, s"unique text number $i with its own words and trailing padding tokens")))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val uncapped = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 16)
    assert(uncapped.count() == 1770L + uncapped.filter($"id_a" > 60).count())
    val capped = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 16,
      maxBandGroup = 10)
    val cappedClone = capped.filter($"id_b" <= 60)
    // star topology: representative (min id = 1) to each other member
    assert(cappedClone.count() == 59L)
    assert(cappedClone.filter($"id_a" === 1L).count() == 59L)
    // removal semantics survive the cap: one survivor of the clique
    val verified = Dedup.verifyJaccard(docs, capped, "doc_id", "text",
      shingleSize = 5, threshold = 0.8)
    val kept = Dedup.removeNearDuplicates(docs, verified, "doc_id")
      .filter($"doc_id" <= 60).collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("minhash-LSH near-dups == exhaustive jaccard >= 0.8 (recall check)") {
    val viaLsh = Dedup.minhashNearDuplicates(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = docs.select(col("doc_id"),
      TextFunctions.tokenShingles(col("text"), 5).as("sh"))
    val brute = sets.as("l").join(sets.as("r"), col("l.doc_id") < col("r.doc_id"))
      .filter(TextFunctions.jaccard(col("l.sh"), col("r.sh")) >= 0.8)
      .select(col("l.doc_id"), col("r.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLsh == brute, s"LSH ${viaLsh.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "fixture should contain minhash near-dups")
  }

  test("incremental dedup: new batch vs signature index == batch pipeline") {
    // growing-corpus workflow: the corpus half is indexed once (signature
    // frame persisted in practice), the "new" half arrives later
    val oldDocs = docs.filter(col("doc_id") % 2 === 0)
    val newDocs = docs.filter(col("doc_id") % 2 === 1)
    val indexSigs = Dedup.minhashSignatures(oldDocs, "doc_id", "text")
    val inc = Dedup.incrementalNearDuplicates(newDocs, indexSigs, docs,
        "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // expected: every batch-pipeline pair that involves at least one new
    // doc (old-old pairs were resolved when the index was built)
    val batch = Dedup.minhashNearDuplicates(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = batch.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(inc == expected, s"incremental ${inc.size} vs expected ${expected.size}")
    assert(expected.nonEmpty, "fixture should contain cross-half near-dups")
  }

  test("connected components: chains, stars, and multiple components") {
    val spark2 = spark
    import spark2.implicits._
    // components: chain {1,2,3,4}, star {10,11,12,13}, pair {20,21},
    // plus out-of-order edge directions to exercise canonicalization
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), // chain 1-2-3-4
      (10L, 11L), (10L, 12L), (13L, 10L), // star around 10
      (21L, 20L)) // simple pair
      .toDF("id_a", "id_b")
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L)
    // fast path (driver union-find, default gate) and distributed star
    // rounds (gate forced off) must produce the identical clustering
    val fast = Dedup.connectedComponents(pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, "doc_id",
        smallEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == expected)
    assert(dist == expected)
  }

  test("connected components == union-find on a pseudo-random graph") {
    val spark2 = spark
    import spark2.implicits._
    // deterministic graph: 200 nodes, 180 hash-derived edges
    val edges = (0 until 180).map { i =>
      val a = (i * 2654435761L % 200).abs
      val b = ((i * 40503L + 7) % 200).abs
      (math.max(a, b), math.min(a, b))
    }.filter(e => e._1 != e._2).distinct
    val pairs = edges.toDF("id_a", "id_b")
    // force the distributed star rounds: the driver union-find below IS
    // the fast path's algorithm, so parity here must test the star loop
    val comp = Dedup.connectedComponents(pairs, "doc_id",
        smallEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = nodes.map(n => n -> find(n)).toMap
    assert(comp == expected)
  }

  test("connected components: hub-skew star graph (1 hub, 1e5 spokes)") {
    val spark2 = spark
    import spark2.implicits._
    // the worst-case shape the groupBy-min rewrite exists for: one node
    // adjacent to every other. The hub id is ABOVE every spoke id so the
    // star rounds must actually re-point the whole neighborhood, and the
    // neighborhood minimum is computed by streamed partial aggregation —
    // never by buffering 1e5 rows in one window frame.
    val hub = 500000L
    val pairs = spark2.range(1, 100001)
      .select(lit(hub).as("id_a"), col("id").as("id_b"))
    val comp = Dedup.connectedComponents(pairs, "doc_id",
        smallEdgeThreshold = 0L)
    val agg = comp.agg(
      count(lit(1)).as("n"),
      countDistinct(col("cluster_id")).as("k"),
      min(col("cluster_id")).as("m")).head()
    assert(agg.getLong(0) == 100001L) // hub + every spoke gets a row
    assert(agg.getLong(1) == 1L && agg.getLong(2) == 1L) // one cluster, min id
  }

  test("mergeComponents: incremental == batch closure over the union") {
    val spark2 = spark
    import spark2.implicits._
    val old = Seq((2L, 1L), (2L, 3L), // component {1,2,3}
      (10L, 11L), // component {10,11}
      (21L, 20L)) // component {20,21}
      .toDF("id_a", "id_b")
    val existing = Dedup.connectedComponents(old, "doc_id")
    // the delta: BRIDGES two existing components (3-10), extends one
    // (21-22), and mints a brand-new one (30-31)
    val delta = Seq((3L, 10L), (21L, 22L), (30L, 31L)).toDF("id_a", "id_b")
    val inc = Dedup.mergeComponents(existing, delta, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(old.unionByName(delta), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
    // bridged component collapsed to the global minimum
    assert(inc(11L) == 1L && inc(10L) == 1L && inc(22L) == 20L)
    // folding an ALREADY-MERGED delta again is a no-op (idempotent)
    val again = Dedup.mergeComponents(inc.toSeq.toDF("doc_id", "cluster_id"),
        delta, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == full)
    // empty delta returns the assignment unchanged
    val none = Dedup.mergeComponents(existing,
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(none == Dedup.connectedComponents(old, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("mergeComponents chain: repeated folds == one closure (random graph)") {
    val spark2 = spark
    import spark2.implicits._
    val edges = (0 until 180).map { i =>
      val a = (i * 2654435761L % 200).abs
      val b = ((i * 40503L + 7) % 200).abs
      (math.max(a, b), math.min(a, b))
    }.filter(e => e._1 != e._2).distinct
    // fold in 4 arbitrary increments
    val slices = edges.grouped((edges.size + 3) / 4).toSeq
    var asg = Dedup.connectedComponents(slices.head.toDF("id_a", "id_b"),
      "doc_id")
    slices.tail.foreach { s =>
      asg = Dedup.mergeComponents(asg, s.toDF("id_a", "id_b"), "doc_id")
        .localCheckpoint()
    }
    val inc = asg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(edges.toDF("id_a", "id_b"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
  }

  test("mergeComponents property sweep: random graphs, random fold partitions") {
    val spark2 = spark
    import spark2.implicits._
    // five deterministic random graphs, each folded in a random number
    // of arbitrary increments — every bridge/extend/mint interleaving
    // the partition happens to produce must land on the full closure
    val rnd = new scala.util.Random(13)
    (1 to 5).foreach { c =>
      val edges = Seq.fill(30 + rnd.nextInt(60))(
          (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2).distinct
      val k = 2 + rnd.nextInt(3)
      val parts = edges.map(e => (rnd.nextInt(k), e)).groupBy(_._1)
        .values.map(_.map(_._2)).toSeq.filter(_.nonEmpty)
      var asg = Dedup.connectedComponents(
        parts.head.toDF("id_a", "id_b"), "doc_id")
      parts.tail.foreach { p =>
        asg = Dedup.mergeComponents(asg, p.toDF("id_a", "id_b"), "doc_id")
      }
      val inc = asg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = Dedup.connectedComponents(edges.toDF("id_a", "id_b"), "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(inc == full,
        s"case $c: ${edges.size} edges folded in ${parts.size} increments")
    }
  }

  test("transitive dedup keeps one survivor per component; greedy may keep more") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // A~C and B~C verified, A~B not: greedy drops only id_b's {3},
    // transitive collapses the whole component {1,2,3} to min id 1
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val greedy = Dedup.removeNearDuplicates(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val transitive = Dedup.removeNearDuplicatesTransitive(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(greedy == Set(1L, 2L, 4L, 5L, 6L))
    assert(transitive == Set(1L, 4L, 5L, 6L))
  }

  test("exact dedup keeps lowest-id survivor per content group") {
    import spark.implicits._
    val df = Seq((3L, "x y z"), (1L, "x y z"), (2L, "a b c"))
      .toDF("doc_id", "text")
    val kept = Dedup.exactByContent(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("best-survivor dedup keeps the highest score per component, ties to lowest id") {
    import spark.implicits._
    // component {1,2,3} (chain), component {5,6}, loner 9
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val docs = Seq(
      (1L, 10.0), (2L, 30.0), (3L, 20.0), // best: 2
      (5L, 7.0), (6L, 7.0),               // tie → lowest id 5
      (9L, 1.0)                           // no pairs → survives
    ).toDF("doc_id", "score")
    val kept = Dedup.removeNearDuplicatesBest(docs, pairs, "doc_id", "score")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 5L, 9L))
  }

  test("global line dedup: first corpus-wide occurrence wins, order kept") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a\nb\nc"),
      (2L, "b\nd"),    // 'b' first seen in doc 1 → removed here
      (3L, "a\nb"),    // everything already seen → rewritten to ""
      (4L, "e\ne\nc")  // within-doc repeat also collapses; 'c' is doc 1's
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLinesGlobal(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a\nb\nc", 2L -> "d", 3L -> "", 4L -> "e"))
    // result is partitioning-independent (first = lowest (id, idx), not
    // whichever task saw it first)
    val again = Dedup.dedupLinesGlobal(corpus.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
  }

  test("source overlap matrix: exact counts on a hand-built corpus") {
    import spark.implicits._
    val corpus = Seq(
      ("s1", "a"), ("s1", "b"), ("s1", "c"),
      ("s2", "b"), ("s2", "c"), ("s2", "d"),
      ("s3", "x"),         // shares nothing → appears in no pair row
      ("s1", "b"),         // duplicate (source, fp) must collapse
      ("s2", null: String) // null fingerprint must drop
    ).toDF("source", "fp")
    val m = Dedup.sourceOverlapMatrix(corpus, "source", "fp").collect()
    val byPair = m.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(byPair.keySet == Set(("s1", "s2")))
    val (shared, nA, nB, jaccard) = byPair(("s1", "s2"))
    assert(shared == 2 && nA == 3 && nB == 3)
    assert(math.abs(jaccard - 0.5) < 1e-15) // 2 / (3 + 3 - 2)
  }

  test("lshParams: balanced inflection rule; recall rule recovers production banding") {
    // textbook rule: inflection (1/8)^(1/8) ≈ 0.771, nearest to 0.8
    assert(Dedup.lshParams(64, 0.8) == ((8, 8)))
    // lower thresholds want MORE bands (catch weaker similarity)
    val (bLow, rLow) = Dedup.lshParams(64, 0.4)
    val (bHigh, rHigh) = Dedup.lshParams(64, 0.95)
    assert(bLow > 8 && bHigh < 8, s"($bLow,$rLow) / ($bHigh,$rHigh)")
    assert(bLow * rLow == 64 && bHigh * rHigh == 64)
    // the production rule: fewest bands with ≥ 99.9% capture AT the
    // threshold — exactly the (16, 4) the standalone queries run
    assert(Dedup.lshParamsForRecall(64, 0.8, 0.999) == ((16, 4)))
    val (b, r) = Dedup.lshParamsForRecall(64, 0.8, 0.999)
    assert(Dedup.lshCandidateProbability(0.8, b, r) >= 0.999)
    assert(Dedup.lshCandidateProbability(0.3, b, r) < 0.15)
    // probability is monotone in s
    val ps = (1 to 9).map(i => Dedup.lshCandidateProbability(i / 10.0, b, r))
    assert(ps.zip(ps.tail).forall { case (a, c) => a <= c })
    // unreachable recall fails loudly, not silently weak
    intercept[IllegalArgumentException] {
      Dedup.lshParamsForRecall(4, 0.1, 0.9999)
    }
  }
}
