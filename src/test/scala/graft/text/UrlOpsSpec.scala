package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlOpsSpec extends AnyFunSuite with SparkSpec {

  private def urls(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("id", "url")
  }

  test("normalization: scheme/host lowercase, path case kept, fragment and trailing slashes stripped") {
    val out = urls(
      1L -> "HtTpS://WWW.Example.COM/Path/To/Item",
      2L -> "http://example.com/a/b/",
      3L -> "http://example.com/a/b///",
      4L -> "https://example.com/x#frag/with/slash",
      5L -> "http://EXAMPLE.com",
      6L -> "not a url AT ALL",
      7L -> "http://example.com/a/?next=/",
      8L -> "http://Host.Tld?q=/slashed#frag")
      .select(col("id"), UrlOps.normalizeUrl(col("url")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "https://www.example.com/Path/To/Item")
    assert(out(2L) == "http://example.com/a/b")
    assert(out(3L) == "http://example.com/a/b")
    assert(out(4L) == "https://example.com/x")
    assert(out(5L) == "http://example.com")
    // trailing slashes strip from the PATH only: a query-final '/'
    // is part of the query value and must survive byte-for-byte
    assert(out(7L) == "http://example.com/a?next=/")
    assert(out(8L) == "http://host.tld?q=/slashed")
    // case-preserving fallback: schemeless rows with case-distinct
    // paths must NOT merge under dedup
    assert(out(6L) == "not a url AT ALL")
  }

  test("domainOf: one key per host spelling — port/userinfo/trailing dots stripped") {
    val out = urls(
      1L -> "https://A.B.c/d?q=1",
      2L -> "http://Host.Tld?q=/slashed",
      3L -> "garbage",
      4L -> "http://spam.example:8080/x",
      5L -> "http://user:pw@spam.example/y",
      6L -> "http://spam.example./z")
      .select(col("id"), UrlOps.domainOf(col("url")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a.b.c")
    assert(out(2L) == "host.tld")
    assert(out(3L) == "")
    assert(out(4L) == "spam.example")
    assert(out(5L) == "spam.example")
    assert(out(6L) == "spam.example")
  }

  test("output-column collisions fail loudly; internal names stay fresh") {
    val s2 = spark
    import s2.implicits._
    val withClash = Seq((1L, "http://a.example/x", "boom"))
      .toDF("id", "url", "url_norm")
    intercept[IllegalArgumentException] {
      UrlOps.dedupByUrl(withClash, "id", "url")
    }
    // a pre-existing __dom column survives filterBlocked untouched
    val withDom = Seq((1L, "http://ok.example/x", "keep"))
      .toDF("id", "url", "__dom")
    val out = UrlOps.filterBlocked(withDom, "url",
      Seq("spam.example").toDF("domain"))
    assert(out.columns.contains("__dom") &&
      out.select("__dom").head().getString(0) == "keep")
  }

  test("filterBlocked drops blocklisted domains via broadcast anti join") {
    val s = spark
    import s.implicits._
    val df = urls(
      1L -> "http://spam.example/x",
      2L -> "http://ok.example/y",
      3L -> "http://SPAM.example/z")
    val blocked = Seq("spam.example").toDF("domain")
    val kept = UrlOps.filterBlocked(df, "url", blocked)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
    val plan = UrlOps.filterBlocked(df, "url", blocked)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("dedupByUrl keeps the smallest id per NORMALIZED url") {
    val df = urls(
      5L -> "http://a.example/p",
      3L -> "HTTP://A.example/p/",          // same after normalization
      7L -> "http://a.example/p#frag",      // same after normalization
      2L -> "http://a.example/q")
    val out = UrlOps.dedupByUrl(df, "id", "url")
      .select("url_norm", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "http://a.example/p" -> 3L,
      "http://a.example/q" -> 2L))
  }

  test("capPerDomain bounds each domain and ranks by id through the heap operator") {
    val df = urls((1L to 20L).map(i =>
      i -> s"http://d${i % 2}.example/page/$i"): _*)
    val capped = UrlOps.capPerDomain(df, "id", "url", cap = 3)
    val byDom = capped.select("domain", "domain_rank", "id").collect()
      .groupBy(_.getString(0))
    assert(byDom.keySet == Set("d0.example", "d1.example"))
    byDom.foreach { case (_, rows) =>
      assert(rows.length == 3)
      val sorted = rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      assert(sorted == sorted.sorted) // rank order == id order
    }
    assert(capped.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }
}
