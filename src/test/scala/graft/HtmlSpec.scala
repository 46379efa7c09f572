package graft

import org.apache.spark.sql.functions._
import graft.operators.Html

/** HTML → text extraction recipe against hand-computed fixtures (the
  * d_html_extract driver gate proves Spark ≡ DuckDB on the synthesized
  * corpus; this spec pins the recipe's behavior). */
class HtmlSpec extends SparkTestBase {
  import spark.implicits._

  private def ext(html: String): String =
    Seq(html).toDF("h").select(Html.extractText(col("h")).as("v"))
      .collect()(0).getString(0)

  test("tags stripped, text joined with single spaces") {
    assert(ext("<html><body><p>hello</p><p>world</p></body></html>") === "hello world")
    assert(ext("<div><b>bold</b>plain</div>") === "bold plain")
  }

  test("script and style blocks dropped entirely, case-insensitive, multiline") {
    assert(ext("<SCRIPT type='x'>if (1 < 2) { alert('</div>'); }\nmore()</script>keep") === "keep")
    assert(ext("<style>\np { color: red; }\n</style>text") === "text")
  }

  test("entity decode: &amp; LAST so &amp;lt; yields the literal &lt;") {
    assert(ext("a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f") === "a <b> \"c\" 'd' e f")
    assert(ext("&amp;lt; stays") === "&lt; stays")
    assert(ext("x &amp; y") === "x & y")
  }

  test("whitespace runs collapse; result is trimmed") {
    assert(ext("  <p>\n\t a \r\n b </p>  ") === "a b")
  }

  test("broken markup degrades to text, never throws") {
    assert(ext("no tags at all") === "no tags at all")
    assert(ext("<p unclosed") === "<p unclosed") // no '>' -> left as text
    assert(ext("") === "")
  }

  test("non-ASCII survives byte-exactly (the per-url text invariant)") {
    val t = "page body 42 marker 42 éè"
    assert(ext(s"<html>$t</html>") === t)
  }
}
