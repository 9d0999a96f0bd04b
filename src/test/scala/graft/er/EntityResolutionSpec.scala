package graft.er

import graft.SparkSpec
import graft.er.EntityResolution._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EntityResolutionSpec extends AnyFunSuite with SparkSpec {

  private lazy val customer =
    spark.read.parquet(s"$sf/customer.parquet")
  private lazy val feed = dirtyCustomerFeed(customer).cache()
  private val hard = Seq("nationkey")

  private def plantedPairs: DataFrame =
    // (base rec_id, dup rec_id) for every planted duplicate
    customer.filter(col("c_custkey") % 5 === 0)
      .select((col("c_custkey") * 2).as("id_a"),
        (col("c_custkey") * 2 + 1).as("id_b"))

  test("dirty feed: planted dups are exactly the mod-5 keys, lev 1 from base") {
    val nCust = customer.count()
    val nDup = customer.filter(col("c_custkey") % 5 === 0).count()
    assert(feed.count() === nCust + nDup)
    // every dup is levenshtein-1 from its base, never equal to ANY base
    val bases = feed.filter(col("src") === "base")
      .select(col("rec_id").as("base_id"), col("name").as("base_name"))
    val dups = feed.filter(col("src") === "dup")
      .select(col("rec_id").as("dup_id"), col("name").as("dup_name"))
    val lev1 = dups.join(bases, col("dup_id") === col("base_id") + 1)
      .filter(levenshtein(col("dup_name"), col("base_name")) =!= 1)
    assert(lev1.isEmpty, "a planted dup is not edit-distance 1 from base")
    val collisions = dups.join(bases, col("dup_name") === col("base_name"))
    assert(collisions.isEmpty, "letter substitution must prevent exact collisions")
  }

  test("blocking pigeonhole: every planted pair surfaces as a candidate") {
    val cands = candidatePairs(feed, "rec_id", hard, customerNamePasses)
    val missed = plantedPairs.join(cands, Seq("id_a", "id_b"), "left_anti")
    assert(missed.isEmpty,
      "a single substitution must leave one disjoint chunk intact")
  }

  test("maxBlockSize skips oversized blocks (and the profile reports them)") {
    // cap 1: every block of size >= 2 is skipped, so no pairs survive
    val none = candidatePairs(feed, "rec_id", hard, customerNamePasses,
      maxBlockSize = 1)
    assert(none.isEmpty)
    val prof = blockProfile(feed, hard, customerNamePasses, maxBlockSize = 1)
      .agg(sum("records_skipped")).head().getLong(0)
    assert(prof > 0, "skipped records must be visible in the profile")
    // default cap: nothing skipped at fixture scale
    val prof2 = blockProfile(feed, hard, customerNamePasses)
      .agg(sum("records_skipped")).head().getLong(0)
    assert(prof2 === 0L)
  }

  test("scoring: planted pairs score exactly wNear+wSegment+wBalTight") {
    val s = ErScoring()
    val cands = candidatePairs(feed, "rec_id", hard, customerNamePasses)
    val scored = scorePairs(cands, feed, "rec_id", "name", "segment",
      "acctbal", s)
    val planted = plantedPairs.join(scored, Seq("id_a", "id_b"))
    assert(planted.count() === plantedPairs.count())
    val expected = s.wNear + s.wSegment + s.wBalTight
    assert(planted.filter(col("score") =!= expected || col("lev") =!= 1)
      .isEmpty, s"every planted pair must score $expected at lev 1")
  }

  test("resolve: every planted dup lands in its base's entity") {
    val cands = candidatePairs(feed, "rec_id", hard, customerNamePasses)
    val links = matchLinks(scorePairs(cands, feed, "rec_id", "name",
      "segment", "acctbal"))
    val assigned = resolve(feed, links, "rec_id").cache()
    val ent = assigned.select("rec_id", "entity_id")
    val baseEnt = ent.withColumnRenamed("entity_id", "e_base")
      .withColumnRenamed("rec_id", "id_a")
    val dupEnt = ent.withColumnRenamed("entity_id", "e_dup")
      .withColumnRenamed("rec_id", "id_b")
    val split = plantedPairs.join(baseEnt, "id_a").join(dupEnt, "id_b")
      .filter(col("e_base") =!= col("e_dup"))
    assert(split.isEmpty, "a planted dup must share its base's entity")
    assigned.unpersist()
  }

  test("survivorship: canonical fields come from the clean base record") {
    val golden = er3GoldenLocal().cache()
    // the min rec_id of any multi-record cluster is even (a base row),
    // so no canonical name may carry a planted letter in its digit span
    val dirtyCanon = golden.filter(col("n_records") > 1)
      .filter(!col("canon_name").rlike("^Customer#[0-9]+$"))
    assert(dirtyCanon.isEmpty, "survivorship must elect the clean base name")
    // a size-2 cluster rooted at a planted base is exactly {base, dup}
    // (the dup always links at score 50, so any cluster holding the
    // base holds the dup too) — survivorship keeps the dup's +0.25 bal
    val pairBal = golden.filter(col("n_records") === 2)
      .join(plantedPairs, golden("entity_id") === col("id_a"))
      .join(feed.filter(col("src") === "base"),
        col("id_a") === feed("rec_id"))
      .filter(col("max_bal") =!= col("acctbal") + 0.25)
    assert(pairBal.isEmpty, "pair clusters keep max(bal) = base + 0.25")
    golden.unpersist()
  }

  test("singletons: unmatched records are their own entity") {
    val golden = er3GoldenLocal()
    val feedN = feed.count()
    val total = golden.agg(sum("n_records")).head().getLong(0)
    assert(total === feedN, "every record belongs to exactly one entity")
    assert(golden.filter(col("n_records") === 1).count() > 0)
  }

  private def er3GoldenLocal(): DataFrame =
    EntityResolution.run(feed, "rec_id", "name", "segment", "acctbal",
      hard, customerNamePasses)

  test("k=2 edits: THREE interleaved classes keep the pigeonhole guarantee") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // 9-digit names; dirty twins carry TWO substitutions at varying
    // positions — two passes cannot guarantee a shared chunk (an edit
    // in each class), three can (3 classes for k=2 edits)
    val rows = (0 until 60).flatMap { i =>
      val name = f"Customer#$i%09d"
      val p1 = i % 9; val p2 = (i % 9 + 3 + i % 5) % 9 // two distinct slots
      val chars = name.toCharArray
      chars(9 + p1) = ('a' + i % 7).toChar
      chars(9 + p2) = ('h' + i % 5).toChar
      Seq(Row(i.toLong * 2, name, 1), Row(i.toLong * 2 + 1,
        new String(chars), 1))
    }
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("rec_id", LongType), StructField("name", StringType),
      StructField("nationkey", IntegerType))))
    def interleave(k: Int): Seq[BlockingPass] =
      (0 until k).map { cls =>
        BlockingPass(s"c$cls", concat(
          (0 until 9).filter(_ % k == cls)
            .map(p => substring(col("name"), 10 + p, 1)): _*))
      }
    val planted = df.filter(col("rec_id") % 2 === 0)
      .select(col("rec_id").as("id_a"), (col("rec_id") + 1).as("id_b"))
    val three = candidatePairs(df, "rec_id", Seq("nationkey"),
      interleave(3))
    assert(planted.join(three, Seq("id_a", "id_b"), "left_anti").isEmpty,
      "3 classes must surface every 2-substitution pair")
    // and 2 classes demonstrably DON'T (some twin edits hit both)
    val two = candidatePairs(df, "rec_id", Seq("nationkey"),
      interleave(2))
    assert(planted.join(two, Seq("id_a", "id_b"), "left_anti").count() > 0,
      "2 classes must miss some 2-substitution pair (k+1 rule is tight)")
  }
}
