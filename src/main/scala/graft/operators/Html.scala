package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for the web-page fact table (`input_hint`:
  * pages arrive as `(url, warc_ts, html:binary, text, lang)` — the `text`
  * column is DERIVED from `html`, and the pipeline's per-row invariant is
  * byte-identical extracted text per url). Pure builtin narrow string
  * expressions — codegen'd, zero shuffle, a pure map at 100 TB.
  *
  * The recipe (applied in order, each step exactly reproducible in
  * DuckDB's RE2 — no backreferences, no lazy-quantifier surprises, global
  * replacement on both engines):
  *   1. `<script …>…</script>` and `<style …>…</style>` blocks dropped
  *      (case-insensitive, dot-matches-newline; separate patterns because
  *      RE2 has no backreferences);
  *   2. every remaining tag `<[^>]*>` → one space (comments and broken
  *      tags degrade to text, the C4-style tolerant behavior);
  *   3. entity decode for the HTML core set — `&lt; &gt; &quot; &#39;
  *      &nbsp;` first, `&amp;` LAST (the standard ordering pitfall:
  *      `&amp;lt;` must yield the literal `&lt;`, not `<`);
  *   4. whitespace runs `[ \t\n\r\f]+` → one space, then trim (the
  *      explicit class, not `\s`: Java and RE2 disagree on `\x0B`).
  */
object Html {

  /** Extracted plain text of an html STRING column (cast binary first:
    * `col.cast("string")` decodes UTF-8, matching the ingest encoding). */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val entities = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    // literal (non-regex) global replace — same result as the quoted
    // regexp pass but a plain substring scan; the DuckDB twin already
    // uses literal replace(), so parity is unchanged
    val decoded = entities.foldLeft(noTags) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f]+", " "))
  }

  /** The same recipe as DuckDB SQL over an expression `h` (the oracle
    * twin — RE2 `'g'` flag ≙ Spark's replace-all default). */
  def extractTextSql(h: String): String = {
    val noScript = s"regexp_replace($h, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    val noTags = s"regexp_replace($noStyle, '<[^>]*>', ' ', 'g')"
    // SQL-literal forms: '' = one apostrophe inside a quoted literal;
    // a double-quote needs no escaping there
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => s"replace($c, '$from', '$to')" }
    s"trim(regexp_replace($decoded, '[ \\t\\n\\r\\f]+', ' ', 'g'))"
  }
}
