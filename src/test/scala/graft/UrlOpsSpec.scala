package graft

import org.apache.spark.sql.functions._
import graft.operators.UrlOps

/** URL canonicalization + registered-domain extraction against
  * hand-written cases (the d_url_canonical driver gate covers the
  * synthesized corpus; this spec covers the recipe's edges). */
class UrlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(UrlOps.canonicalUrl(col("u")).as("v"))
      .collect()(0).getString(0)

  private def domain(url: String): String =
    Seq(url).toDF("u").select(UrlOps.registeredDomain(col("u")).as("v"))
      .collect()(0).getString(0)

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTP://WWW.Example.COM/Path/File.HTML") ===
      "http://www.example.com/Path/File.HTML")
  }

  test("default ports dropped, non-default kept") {
    assert(canon("http://a.com:80/x") === "http://a.com/x")
    assert(canon("https://a.com:443/x") === "https://a.com/x")
    assert(canon("http://a.com:443/x") === "http://a.com:443/x")
    assert(canon("https://a.com:8443/x") === "https://a.com:8443/x")
  }

  test("fragment stripped, trailing slashes stripped, userinfo dropped") {
    assert(canon("https://u:pw@a.com/p/#sec") === "https://a.com/p")
    assert(canon("https://a.com///") === "https://a.com")
    assert(canon("https://a.com./x") === "https://a.com/x") // trailing host dot
  }

  test("query: tracking params dropped, rest sorted, empties removed") {
    assert(canon("https://a.com/p?b=2&utm_source=x&a=1") === "https://a.com/p?a=1&b=2")
    assert(canon("https://a.com/p?UTM_campaign=y&z=9&gclid=123&fbclid=4") ===
      "https://a.com/p?z=9")
    assert(canon("https://a.com/p?&&a=1&") === "https://a.com/p?a=1")
    // all params dropped -> no '?'
    assert(canon("https://a.com/p?utm_x=1") === "https://a.com/p")
    // order-insensitive: two spellings, one canonical form
    assert(canon("https://a.com/p?x=1&y=2") === canon("https://a.com/p?y=2&x=1"))
  }

  test("fragment before query parse: '#' ends the query too") {
    assert(canon("https://a.com/p?b=2#frag?a=1") === "https://a.com/p?b=2")
  }

  test("registered domain: eTLD+1 with two-level public suffixes") {
    assert(domain("https://www.news.example.com/x") === "example.com")
    assert(domain("https://a.b.example.co.uk/x") === "example.co.uk")
    assert(domain("https://example.com") === "example.com")
    assert(domain("https://co.uk") === "co.uk") // bare suffix: only 2 labels
    assert(domain("http://localhost:8080/x") === "localhost")
  }

  test("host/port/path/query component extraction") {
    val df = Seq("HTTP://User@Sub.A.COM:8080/p/q?x=1#f").toDF("u")
    val r = df.select(
      UrlOps.scheme(col("u")).as("s"), UrlOps.host(col("u")).as("h"),
      UrlOps.port(col("u")).as("po"), UrlOps.path(col("u")).as("pa"),
      UrlOps.query(col("u")).as("q")).collect()(0)
    assert(r.getString(0) === "http" && r.getString(1) === "sub.a.com" &&
      r.getString(2) === "8080" && r.getString(3) === "/p/q" &&
      r.getString(4) === "x=1")
  }
}
