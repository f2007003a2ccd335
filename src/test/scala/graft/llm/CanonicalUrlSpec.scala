package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The utm-strip contract on REAL-shaped URLs (ADVICE r8): the
  * canonicalization must drop a utm_* param wherever it sits — second
  * position, repeated, utm-only — and keep non-tracking params and
  * separators intact. The planted corpus only exercises first-position
  * single-utm; these are the cases the old anchored regex missed. */
class CanonicalUrlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Dedup.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("utm params are stripped in any position, count, and order") {
    assert(canon(
      "https://a.com/p?utm_source=x",          // first & only
      "https://a.com/p?ref=5&utm_medium=x",    // second position
      "https://a.com/p?utm_a=1&utm_b=2&ref=5", // repeated, before keeper
      "https://a.com/p?utm_a=1&ref=5&utm_b=2", // surrounding a keeper
      "https://a.com/p?utm_a=1&utm_b=2",       // utm-only, multi
      "https://a.com/p?a=1&b=2"                // nothing to strip
    ) == Seq(
      "https://a.com/p",
      "https://a.com/p?ref=5",
      "https://a.com/p?ref=5",
      "https://a.com/p?ref=5",
      "https://a.com/p",
      "https://a.com/p?a=1&b=2"))
  }

  test("scheme, case, fragment, and trailing slash rules still compose") {
    assert(canon("http://A.COM/Path/?utm_x=1#frag") == Seq("https://a.com/path"))
  }
}
