package graft.text

import graft.SparkSpec

class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    TextAnalysis.canonicalizeUrls(urls.toDF("url"), "url")
      .collect().map(_.getString(1)).toSeq

  test("scheme/host lowercased, default port stripped only for its scheme") {
    assert(canon(
      "HTTPS://Example.COM:443/Path/X",
      "http://a.com:80/x",
      "http://a.com:443/x", // 443 is NOT http's default → survives
      "https://a.com:8443/x") == Seq(
      "https://example.com/Path/X",
      "http://a.com/x",
      "http://a.com:443/x",
      "https://a.com:8443/x"))
  }

  test("fragment dropped, empty path becomes /, bare ? disappears") {
    assert(canon(
      "https://a.com#frag",
      "https://a.com?#frag",
      "https://a.com/p#a?b=fake-query-inside-fragment") == Seq(
      "https://a.com/",
      "https://a.com/",
      "https://a.com/p"))
  }

  test("tracking params dropped by name, rest sorted, valueless kept") {
    assert(canon(
      "https://a.com/p?utm_source=x&b=2&a=1",
      "https://a.com/p?z=9&utm_campaign=c&fbclid=abc&gclid",
      "https://a.com/p?utm_medium=m", // only tracking → no ? at all
      "https://a.com/p?flag&&a=1") == Seq( // empty params removed
      "https://a.com/p?a=1&b=2",
      "https://a.com/p?z=9",
      "https://a.com/p",
      "https://a.com/p?a=1&flag"))
  }

  test("utm-prefixed NAMES are dropped, utm as a value is not") {
    assert(canon("https://a.com/p?q=utm_source&utmx=1") ==
      Seq("https://a.com/p?q=utm_source&utmx=1"))
  }

  test("non-absolute values pass through fragment-stripped") {
    assert(canon("not a url#frag", "/relative/path?utm_source=x") ==
      Seq("not a url", "/relative/path?utm_source=x"))
  }
}
