package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite with SparkSpec {

  private def extract(html: String): String = {
    val s = spark
    import s.implicits._
    Seq(html).toDF("html")
      .select(Html.extractText(col("html")).as("x"))
      .collect().head.getString(0)
  }

  test("block tags become line breaks; inline tags become spaces") {
    assert(extract("<h1>Title</h1><p>One two.</p><div>Three</div>") ==
      "Title\nOne two.\nThree")
    assert(extract("a<span>b</span>c <b>bold</b> d") == "a b c bold d")
    assert(extract("line one<br/>line two<br>line three") ==
      "line one\nline two\nline three")
  }

  test("script and style subtrees are dropped wholesale, embedded < and { included") {
    assert(extract(
      "<p>keep</p><script>if (1 < 2) { alert(\"x\"); }</script><p>also</p>") ==
      "keep\nalso")
    assert(extract("<style>p { color: red; }</style><p>text</p>") == "text")
    assert(extract("<SCRIPT>x</SCRIPT><p>case insensitive</p>") ==
      "case insensitive")
  }

  test("comments are dropped before script handling") {
    assert(extract("<p>a</p><!-- <script>not a script</script> --><p>b</p>") ==
      "a\nb")
    assert(extract("<!-- multi\nline\ncomment --><p>kept</p>") == "kept")
  }

  test("entities decode; &amp; decodes last") {
    assert(extract("<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>") ==
      "a & b <tag> \"q\" 's'")
    assert(extract("<p>x&nbsp;y</p>") == "x y")
    // &amp;lt; is the ESCAPED literal "&lt;" — must not double-decode
    assert(extract("<p>&amp;lt;</p>") == "&lt;")
  }

  test("whitespace normalizes per line; empty lines vanish") {
    assert(extract("<p>  a   b\t c  </p><p>   </p><p>d</p>") == "a b c\nd")
    assert(extract("<div></div><div></div>") == "")
    assert(extract("") == "")
  }

  test("extraction is idempotent on 200 generated documents") {
    val s = spark
    import s.implicits._
    // pseudo-random HTML-ish docs: tags, comments, scripts, odd
    // whitespace, plus &amp; (which decodes to a bare '&' — stable
    // under a second pass). Angle-bracket ENTITIES are deliberately
    // excluded: decoding &lt;b&gt; yields live markup, so re-running
    // extraction re-parses it — double-decode is inherent to
    // decode-then-reparse, not a bug to pin idempotence against.
    val rnd = new scala.util.Random(11)
    val words = Seq("alpha", "beta", "gamma", "x", "&amp;",
      "  spaced  out  ")
    val frags = Seq("<p>", "</p>", "<div class='c'>", "</div>", "<br/>",
      "<script>var x = \"</p>\";</script>", "<!-- note -->",
      "<style>.a { b: c; }</style>", "<span>", "</span>", "<h2>", "</h2>")
    val docs = (1 to 200).map { i =>
      (i.toLong, (1 to 12).map(_ =>
        if (rnd.nextBoolean()) frags(rnd.nextInt(frags.size))
        else words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("id", "html")
    val once = docs.select(col("id"), Html.extractText(col("html")).as("x"))
    val twice = once.select(col("id"), Html.extractText(col("x")).as("y"),
        col("x"))
      .collect()
    twice.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"not a fixpoint:\n<${r.getString(2)}>\n<${r.getString(1)}>")
    }
  }

  test("attributes and self-closing block tags handled") {
    assert(extract("""<div class="x" id='y'>inside</div>""") == "inside")
    assert(extract("""<hr class="sep"/><p>after</p>""") == "after")
  }

  test("guard: </script> inside a JS string leaks ONLY the bounded fragment") {
    // the strip ends at the FIRST closing tag (documented contract):
    // the fragment between it and the real close surfaces as text, the
    // trailing real </script> tag strips as a plain tag — and content
    // AFTER the script block is fully preserved, never swallowed
    val html =
      """<p>before</p><script>var a = "</script>"; run(a);</script><p>after</p>"""
    assert(extract(html) == "before\n\"; run(a);\nafter")
  }

  test("guard: unclosed script/style fails OPEN — code surfaces, nothing is swallowed") {
    // no closing tag anywhere: the subtree regex cannot match, so the
    // code text survives (minus tags) instead of deleting the rest of
    // the document; downstream quality gates are what drop code-shaped
    // text
    assert(extract("<p>keep</p><script>var x = 1; f(x);") ==
      "keep\nvar x = 1; f(x);")
    assert(extract("<style>p { color: red; }\n<p>tail text</p>") ==
      "p { color: red; }\ntail text")
  }

  test("guard: unclosed tag at end-of-input survives literally") {
    // every tag regex requires the closing '>': a truncated crawl can
    // not swallow trailing text into a half-open tag
    assert(extract("""<p>ok</p><div class="x""") == "ok\n<div class=\"x")
    assert(extract("<p>ok</p><scr") == "ok\n<scr")
  }

  test("native line normalize ≡ HOF reference on the whitespace zoo; " +
      "extractText plan carries no CodegenFallback") {
    val s = spark
    import s.implicits._
    val docs = Seq[Option[String]](
      Some(""), Some(" "), Some("\n"), Some("\n \n\t\n"),
      Some("  a   b\t c  \n   \nd"),
      Some("x\fy\rz"),
      Some("多  字节\t行\n\n次の  行"),
      Some("one\ntwo  words\n\n\n three "),
      Some("emoji 🙂  spaced"),
      None).toDF("t").repartition(2)
    val bad = docs.select(
        graft.functions.NativeCuration.normalizeLines(col("t")).as("n"),
        Html.normalizeLinesReference(col("t")).as("r"))
      .filter(not(col("n") <=> col("r")))
    assert(bad.count() == 0, bad.collect().mkString("\n"))
    // the extraction plan is fallback-free end to end
    val plan = docs.filter(col("t").isNotNull)
      .select(Html.extractText(col("t")).as("x"))
      .filter(col("x") =!= "")
    plan.collect()
    val found = graft.PlanProbe.codegenFallbacks(plan)
    assert(found.isEmpty, s"interpreted expressions in extractText: $found")
  }

  test("HTML5 named core + numeric entities decode; &-producing forms stay last") {
    assert(extract("<p>c &copy; 2024 &mdash; 5&deg; &euro;9 &hellip;</p>") ==
      "c © 2024 — 5° €9 …")
    assert(extract("<p>&ldquo;q&rdquo; &lsquo;s&rsquo; &laquo;fr&raquo;</p>") ==
      "“q” ‘s’ «fr»")
    assert(extract("<p>&#34;x&#34; &#60;y&#62; a&#160;b</p>") ==
      "\"x\" <y> a b")
    // numeric ampersand: same no-double-decode rule as &amp;
    assert(extract("<p>&#38;lt;</p>") == "&lt;")
    assert(extract("<p>&amp;copy;</p>") == "&copy;")
    // the two &-producers must not feed each other (sentinel pass):
    // the author's literal "&amp;" / "&#38;" survives either spelling
    assert(extract("<p>&#38;amp;</p>") == "&amp;")
    assert(extract("<p>&amp;#38;</p>") == "&#38;")
    assert(extract("<p>a &#38; b &amp; c</p>") == "a & b & c")
  }
}
