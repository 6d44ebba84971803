package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.UrlCuration
import graft.sinks.SqlDumpSink
import graft.sources.SqlDumpSource

/** Property coverage for the round-10 operators, raw ScalaCheck Gen with
  * fixed seeds (same pattern as PropertySpec — the scalatest bridge is
  * not in the offline cache):
  *  - arbitrary messy URLs: canonicalize is idempotent and its output
  *    carries no fragment, no utm_ params, a lowercase www-less
  *    authority;
  *  - arbitrary hostile cells round-trip value-exactly through the
  *    DISTRIBUTED dump writer -> statement scanner. */
class UrlPropertySpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "Http", "hTtpS")
    www <- Gen.oneOf("", "www.", "WWW.", "sub.")
    host <- Gen.oneOf("example.com", "Example.COM", "a-b.example.org",
      "x.y.example.net")
    port <- Gen.oneOf("", ":80", ":443", ":8080", ":9000")
    path <- Gen.oneOf("", "/", "/a", "/a/b", "/a/", "/a//", "/Docs/X")
    query <- Gen.oneOf("", "?id=1", "?utm_source=x", "?utm_a=1&utm_b=2",
      "?id=1&utm_m=e", "?utm_s=r&id=2", "?a=1&b=2", "?a=1&utm_x=2&b=3")
    frag <- Gen.oneOf("", "#top", "#a/b?c")
  } yield s"$scheme://$www$host$port$path$query$frag"

  private def canonAll(urls: Seq[String]): Seq[String] =
    urls.toDF("u").select(UrlCuration.canonicalize(col("u"))).as[String]
      .collect().toSeq

  test("canonicalize is idempotent on 300 generated messy urls") {
    val urls = samples(urlGen, 300, 42L)
    val once = canonAll(urls)
    val twice = canonAll(once)
    once.zip(twice).zip(urls).foreach { case ((a, b), u) =>
      assert(a == b, s"not idempotent for $u: '$a' -> '$b'")
    }
  }

  test("canonical urls carry no fragment/utm and a clean authority") {
    val urls = samples(urlGen, 300, 99L)
    val canon = canonAll(urls)
    val authRe = "^([a-z][a-z0-9+.-]*)://([^/?#]*)".r
    canon.zip(urls).foreach { case (c, u) =>
      assert(!c.contains("#"), s"fragment survived: $u -> $c")
      assert(!c.matches(".*[?&]utm_.*"), s"utm param survived: $u -> $c")
      val m = authRe.findFirstMatchIn(c)
      assert(m.isDefined, s"no authority in $c")
      val auth = m.get.group(2)
      assert(auth == auth.toLowerCase, s"authority not lowercased: $c")
      assert(!auth.startsWith("www."), s"www survived: $u -> $c")
      // scheme-default ports never survive
      assert(!(c.startsWith("http://") && auth.endsWith(":80")), c)
      assert(!(c.startsWith("https://") && auth.endsWith(":443")), c)
    }
  }

  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    Gen.oneOf("a,b", "a'b", "a''b", "a\\b", "(paren)", "semi;colon",
      "line1\nline2", "cr\rhere", ");\ntrap", "0x41", "NULL", "null",
      "", " edges ", "emoji éü", "\\n literal", "tab\there"))

  test("a multi-table dump directory parses each table back exactly") {
    // three tables exported into ONE directory tree (the
    // whole-database-dump shape): the statement scanner must route every
    // INSERT to its own CREATE TABLE schema with no cross-table bleed
    val out = java.nio.file.Files.createTempDirectory("dumpmulti").toString
    val tables = (0 until 3).map { ti =>
      val cells = samples(Gen.listOfN(20, cellGen), 1, 555L * (ti + 1)).head
      val df = cells.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", s"payload_$ti") // distinct column names per table
      SqlDumpSink.write(df, out, s"tab$ti")
      s"tab$ti" -> cells
    }
    for ((name, cells) <- tables) {
      val back = SqlDumpSource.parse(spark, s"$out/$name", Seq("all"),
        distributed = true)(name)
      assert(back.count() == cells.length, name)
      val got = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      cells.zipWithIndex.foreach { case (s, i) =>
        assert(got(i.toLong) == s, s"$name cell $i")
      }
    }
  }

  test("generated hostile cells round-trip through the distributed dump writer") {
    for (trial <- 0 until 3) {
      val cells = samples(Gen.listOfN(30, cellGen), 1, 1234L * (trial + 1)).head
      val df = cells.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "s")
      val out = java.nio.file.Files.createTempDirectory(s"dumpprop$trial").toString
      SqlDumpSink.write(df, out, "t", rowsPerInsert = 7)
      val back = SqlDumpSource.parse(spark, s"$out/t", Seq("all"),
        distributed = true)("t")
      val got = back.select("id", "s").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      cells.zipWithIndex.foreach { case (s, i) =>
        assert(got(i.toLong) == s,
          s"cell $i mismatch: wrote ${s.replace("\n", "\\n")} got " +
            s"${String.valueOf(got(i.toLong)).replace("\n", "\\n")}")
      }
    }
  }
}
