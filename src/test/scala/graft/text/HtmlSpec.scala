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
}
