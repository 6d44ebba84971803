package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UrlCuration

/** UrlCuration.canonicalize edge semantics: authority-only lowercasing,
  * www strip, scheme-default port strip, utm strip in every position
  * (including adjacent params), fragment drop, trailing-slash policy,
  * idempotence. */
class UrlCurationSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def canon(s: String): String =
    Seq(s).toDF("u").select(UrlCuration.canonicalize(col("u")))
      .as[String].head()

  private def domain(s: String): String =
    Seq(s).toDF("u").select(UrlCuration.domainOf(col("u")))
      .as[String].head()

  test("scheme+host lowercase, path/query case preserved") {
    assert(canon("HTTPS://Example.COM/Path/File?Q=Value") ===
      "https://example.com/Path/File?Q=Value")
  }

  test("www label stripped, deeper www labels kept") {
    assert(canon("http://www.example.com/a") === "http://example.com/a")
    assert(canon("http://sub.www.example.com/a") ===
      "http://sub.www.example.com/a")
  }

  test("scheme-default ports drop; real ports and cross-scheme defaults survive") {
    assert(canon("http://h.com:80/a") === "http://h.com/a")
    assert(canon("https://h.com:443/a") === "https://h.com/a")
    assert(canon("http://h.com:8080/a") === "http://h.com:8080/a")
    // :443 is NOT http's default, :80 is NOT https' default
    assert(canon("http://h.com:443/a") === "http://h.com:443/a")
    assert(canon("https://h.com:80/a") === "https://h.com:80/a")
    // port with no path, with query
    assert(canon("http://h.com:80") === "http://h.com")
    assert(canon("http://h.com:80?x=1") === "http://h.com?x=1")
  }

  test("fragment drops everywhere") {
    assert(canon("http://h.com/a#sec") === "http://h.com/a")
    assert(canon("http://h.com/a?x=1#sec") === "http://h.com/a?x=1")
    assert(canon("http://h.com/#top") === "http://h.com")
  }

  test("utm params drop in every position; non-utm params keep order") {
    assert(canon("http://h.com/a?utm_source=x&id=3") === "http://h.com/a?id=3")
    assert(canon("http://h.com/a?id=3&utm_medium=y") === "http://h.com/a?id=3")
    assert(canon("http://h.com/a?a=1&utm_x=2&b=3") === "http://h.com/a?a=1&b=3")
    // adjacent utm params (needs the second mid-string pass)
    assert(canon("http://h.com/a?utm_a=1&utm_b=2&id=3") ===
      "http://h.com/a?id=3")
    // all params were tracking -> the '?' goes too
    assert(canon("http://h.com/a?utm_a=1&utm_b=2") === "http://h.com/a")
    assert(canon("http://h.com/a?utm_a=1") === "http://h.com/a")
  }

  test("trailing slashes drop, including root; '/?' collapses") {
    assert(canon("http://h.com/a/") === "http://h.com/a")
    assert(canon("http://h.com/") === "http://h.com")
    assert(canon("http://h.com/a/?id=1") === "http://h.com/a?id=1")
    assert(canon("http://h.com/a//") === "http://h.com/a")
    // interior slashes untouched
    assert(canon("http://h.com/a/b/c") === "http://h.com/a/b/c")
  }

  test("canonicalize is idempotent on already-canonical urls") {
    val messy = Seq(
      "HTTP://WWW.h0.Example.COM:80/docs/1/?utm_source=rss&id=1#s",
      "https://h.com/a?x=1&y=2", "http://h.com")
    for (m <- messy) assert(canon(canon(m)) === canon(m))
  }

  test("null-safe: null url canonicalizes to null") {
    val out = Seq[(Integer, String)]((1, null)).toDF("i", "u")
      .select(UrlCuration.canonicalize(col("u"))).collect()(0)
    assert(out.isNullAt(0))
  }

  test("domainOf extracts the canonical host, ignoring port/path") {
    assert(domain("http://h3.example.com:8080/docs/1?id=2") ===
      "h3.example.com")
    assert(domain("https://h.com") === "h.com")
  }

  test("the gate decorator collapses mod-150 congruent docs to one url") {
    // 450 synthetic ids (3 per mod-150 class) -> exactly 150 canonical
    // urls. Messy spellings: id and id+300 repeat verbatim (every
    // decorator residue divides 300 — the common "same url seen twice"
    // case), id+150 differs iff the www decoration flips (even ids), so
    // distinct messy = 75 classes x 2 + 75 x 1 = 225 > 150: the gate
    // exercises BOTH verbatim-dup and spelling-variant collapse.
    val df = spark.range(0, 450).toDF("doc_id")
    val canonCol =
      UrlCuration.canonicalize(graft.queries.LlmQueries.messyUrl(col("doc_id")))
    assert(df.select(canonCol.as("c")).distinct().count() === 150)
    assert(df.select(graft.queries.LlmQueries.messyUrl(col("doc_id")).as("m"))
      .distinct().count() === 225)
  }
}
