package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sinks.OrcSink
import graft.sources.{CsvSource, SqlDumpFixture, SqlDumpSource}

/** Property-based coverage per FIXTURES.md §3/§5, using raw ScalaCheck Gen
  * with fixed seeds (the scalatest-scalacheck bridge isn't in the offline
  * dependency cache):
  *  - adversarial INSERT statements (quotes, commas, parens, semicolons,
  *    escapes, NULLs, newlines) round-trip through the dump
  *    writer -> tokenizer exactly;
  *  - arbitrary rows survive ORC under every codec;
  *  - adversarial CSV cells survive CSV -> ORC.
  */
class PropertySpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    // each of these breaks the reference's regex parser (SURVEY §4.3.4)
    Gen.oneOf("a,b", "a'b", "a''b", "a\\b", "(paren)", "semi;colon",
      "quote'with,all;(of)it", "", " leading and trailing ",
      "O'Brien, Ltd. (Pty)", "tab\tchar", "multi\nline", "NULL"))

  private val rowGen: Gen[(String, Option[Double])] = for {
    s <- cellGen
    d <- Gen.option(Gen.choose(-99999.99, 99999.99))
  } yield (s, d)

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def mkDf(rows: Seq[(String, Option[Double])]) = {
    val data = rows.zipWithIndex.map { case ((s, d), i) =>
      Row(i.toLong, s, d.map(Double.box).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("s", StringType),
        StructField("d", DoubleType))))
  }

  test("property: generated dumps with adversarial strings parse back exactly") {
    for (trial <- 0 until 8) {
      val rows = samples(Gen.listOfN(40, rowGen), 1, 1000L * trial).head
      val df = mkDf(rows)
      val dir = Files.createTempDirectory("prop_dump").toString
      SqlDumpFixture.writeDump(df, "t", s"$dir/t.sql")
      val got = SqlDumpSource.parse(spark, s"$dir/t.sql")("t").collect()
        .map(r => (r.getLong(0), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
      val want = rows.zipWithIndex.map { case ((s, d), i) => (i.toLong, s, d) }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("property: reordered column-list INSERTs with adversarial values map by name") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("d", DoubleType)))
    for (trial <- 0 until 8) {
      val vals = samples(Gen.listOfN(20, rowGen), 1, 7000L * trial).head
      // reorder the column list per statement; SqlDumpSource must put every
      // cell back in schema position by NAME
      val perms = Seq(Seq("id", "s", "d"), Seq("s", "d", "id"), Seq("d", "id", "s"))
      val stmts = vals.zipWithIndex.map { case ((s, d), i) =>
        val cols = perms(i % perms.length)
        val byName = Map(
          "id" -> i.toString,
          "s" -> ("'" + s.replace("\\", "\\\\").replace("'", "''") + "'"),
          "d" -> d.map(_.toString).getOrElse("NULL"))
        s"INSERT INTO `t` (${cols.map(c => s"`$c`").mkString(", ")}) " +
          s"VALUES (${cols.map(byName).mkString(", ")});"
      }
      val dir = Files.createTempDirectory("prop_cols").toString
      Files.writeString(java.nio.file.Paths.get(s"$dir/t.sql"),
        "CREATE TABLE `t` (`id` BIGINT, `s` VARCHAR(64), `d` DOUBLE);\n" +
          stmts.mkString("\n") + "\n")
      val got = SqlDumpSource.parse(spark, s"$dir/t.sql")("t").collect()
        .map(r => (r.getLong(0), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
      val want = vals.zipWithIndex.map { case ((s, d), i) => (i.toLong, s, d) }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("property: chunker windows tile every document with the exact stride") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(99)
    val docs = (0 until 30).map { i =>
      val n = rnd.nextInt(300) // 0..299 tokens
      (i.toLong, (1 to n).map(k => s"t$k").mkString(" "))
    }
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val (chunk, overlap, stride) = (32, 8, 24)
    val rows = graft.operators.TextChunker
      .chunk(df, "doc_id", "text", chunk, overlap)
      .collect()
      .groupBy(_.getLong(0))
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val chunks = rows(id).sortBy(_.getLong(1))
      // stride tiling: chunk j starts at token j*stride (0-based)
      chunks.foreach { c =>
        val j = c.getLong(1).toInt
        val want = toks.slice(j * stride, j * stride + chunk)
        val got = c.getString(3).split(" ").filter(_.nonEmpty)
        assert(got.toSeq == want.toSeq, s"doc $id chunk $j")
      }
      // every token is covered by at least one chunk
      val covered = chunks.flatMap { c =>
        val j = c.getLong(1).toInt
        j * stride until math.min(toks.length, j * stride + chunk)
      }.toSet
      assert(covered == toks.indices.toSet, s"doc $id coverage gap")
    }
  }

  test("property: arbitrary rows survive ORC round-trip under every codec") {
    for (trial <- 0 until 2) {
      val rows = samples(Gen.listOfN(50, rowGen), 1, 77L + trial).head
      val df = mkDf(rows)
      val want = df.collect().toSet
      for (codec <- Seq("none", "snappy", "zlib", "zstd", "lzo")) {
        val dir = Files.createTempDirectory("prop_orc").toString
        OrcSink.write(df, dir, "t", codec)
        assert(OrcSink.read(spark, s"$dir/t").collect().toSet == want,
          s"trial $trial codec $codec")
      }
    }
  }

  test("property: mergeUpsert equals a sequential reference model") {
    // Reference model: apply changes in SEQ order to a key->value map
    // (delete removes, insert/update put). mergeUpsert's window must
    // produce the same final state for any delivery order, so the frame
    // is built SHUFFLED while the model applies sorted.
    val opGen = for {
      k <- Gen.choose(0L, 7L)
      op <- Gen.oneOf("U", "I", "D")
      v <- Gen.choose(0.0, 99.0).map(x => math.rint(x * 100) / 100)
    } yield (k, op, v)
    for (trial <- 0 until 12) {
      val nOps = 1 + trial % 9
      val ops = samples(Gen.listOfN(nOps, opGen), 1, 4242L + trial).head
        .zipWithIndex.map { case ((k, op, v), i) => (k, op, v, i.toLong + 1) }
      val baseRows = Seq((0L, 5.0), (1L, 6.0), (2L, 7.0), (3L, 8.0))
      val model = scala.collection.mutable.Map(baseRows: _*)
      ops.sortBy(_._4).foreach {
        case (k, "D", _, _) => model.remove(k)
        case (k, _, v, _) => model(k) = v
      }
      import spark.implicits._
      val base = baseRows.toDF("k", "v")
      val changes = new scala.util.Random(trial).shuffle(ops)
        .map { case (k, op, v, seq) => (k, v, op, seq) }
        .toDF("k", "v", "__op", "__seq")
      val got = OrcSink.mergeUpsert(base, changes, keyCols = Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == model.toMap, s"trial $trial ops=$ops")
    }
  }

  test("property: adversarial CSV cells survive CSV -> ORC round-trip") {
    for (trial <- 0 until 8) {
      // CSV caveats (standard Spark behavior, not ours): no embedded
      // newlines without multiLine; empty string reads back as null
      // (nullValue default); writer trims by default - disabled below.
      val cells = samples(Gen.listOfN(40, cellGen), 1, 31337L + trial).head
        .map(_.replace("\n", " ")).filter(_.nonEmpty)
      val data = cells.zipWithIndex.map { case (s, i) => Row(i.toLong, s) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1),
        StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("s", StringType))))
      val dir = Files.createTempDirectory("prop_csv").toString
      df.write.option("header", true)
        .option("ignoreLeadingWhiteSpace", false)
        .option("ignoreTrailingWhiteSpace", false)
        .csv(s"$dir/in")
      val back = CsvSource.read(spark, s"$dir/in")
      OrcSink.write(back, s"$dir/orc", "t")
      // inferSchema narrows small ids to int — read width-agnostically
      val got = OrcSink.read(spark, s"$dir/orc/t").collect()
        .map(r => r.getAs[Number](0).longValue() -> r.getString(1)).toMap
      cells.zipWithIndex.foreach { case (s, i) =>
        assert(got(i.toLong) == s, s"trial $trial cell $i: ${s.toSeq}")
      }
    }
  }
}
