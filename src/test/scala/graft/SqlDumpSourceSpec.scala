package graft

import java.io.StringReader
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.types._

import graft.sources.{SqlDumpFixture, SqlDumpSource}

/** Tokenizer correctness on every defect class of the reference parser
  * (SURVEY.md §4.3.4): commas/parens/semicolons inside strings, escaped
  * quotes (both '' and \'), NULLs, negative numbers, dates, multi-row
  * VALUES, comments, and CREATE TABLE schema extraction. */
class SqlDumpSourceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def stmts(sql: String): List[String] =
    SqlDumpSource.statements(new StringReader(sql)).toList

  test("statement splitting respects semicolons inside strings") {
    val sql = "INSERT INTO t VALUES ('a;b');INSERT INTO t VALUES ('c')"
    val out = stmts(sql)
    assert(out.size == 2)
    assert(out.head.contains("a;b"))
  }

  test("statement splitting skips comments") {
    val sql =
      """-- line comment; with a semicolon
        |# hash comment; too
        |/* block; comment */
        |SELECT 1""".stripMargin
    val out = stmts(sql)
    assert(out.size == 1)
    assert(out.head.trim == "SELECT 1")
  }

  test("CREATE TABLE yields typed schema with declared mapping") {
    val ddl =
      """CREATE TABLE `customer` (
        |  `c_custkey` INT NOT NULL,
        |  `c_name` VARCHAR(64),
        |  `c_acctbal` DECIMAL(12,2),
        |  `c_birth` DATE,
        |  `c_seen` DATETIME,
        |  PRIMARY KEY (`c_custkey`)
        |)""".stripMargin
    val td = SqlDumpSource.parseCreateTable(ddl).get
    assert(td.name == "customer")
    assert(td.schema.fields.map(_.name).toSeq ==
      Seq("c_custkey", "c_name", "c_acctbal", "c_birth", "c_seen"))
    assert(td.schema("c_custkey").dataType == LongType) // INT -> LONG
    assert(!td.schema("c_custkey").nullable)
    assert(td.schema("c_name").dataType == StringType)
    assert(td.schema("c_acctbal").dataType == DecimalType(12, 2))
    assert(td.schema("c_birth").dataType == DateType)
    assert(td.schema("c_seen").dataType == TimestampType)
  }

  test("CREATE TABLE with trailing parenthesized clauses keeps a clean schema") {
    val ddl =
      """CREATE TABLE t (
        |  `id` INT,
        |  `v` VARCHAR(10)
        |) PARTITION BY RANGE (id) (
        |  PARTITION p0 VALUES LESS THAN (10),
        |  PARTITION p1 VALUES LESS THAN (20)
        |) COMMENT='weird (paren) comment'""".stripMargin
    val td = SqlDumpSource.parseCreateTable(ddl).get
    assert(td.name == "t")
    assert(td.schema.fields.map(_.name).toSeq == Seq("id", "v"))
    assert(td.schema("id").dataType == LongType)
  }

  test("adversarial INSERT values parse exactly") {
    val (table, rows) = SqlDumpSource.parseInsert(
      """INSERT INTO `t` VALUES (1,'O''Brien, Ltd. (Pty)',NULL,-42.5),(2,'back\\slash and \'quote\'','x;y',0.01)"""
    ).get
    assert(table == "t")
    assert(rows.size == 2)
    assert(rows(0) == Seq(Some("1"), Some("O'Brien, Ltd. (Pty)"), None, Some("-42.5")))
    assert(rows(1) == Seq(Some("2"), Some("back\\slash and 'quote'"), Some("x;y"), Some("0.01")))
  }

  test("empty string stays distinct from NULL") {
    val (_, rows) = SqlDumpSource.parseInsert("INSERT INTO t VALUES ('',NULL)").get
    assert(rows.head == Seq(Some(""), None))
  }

  test("typed rows: dates, timestamps, decimals, booleans") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("d", DateType),
      StructField("ts", TimestampType), StructField("m", DecimalType(12, 2)),
      StructField("b", BooleanType)))
    val row = SqlDumpSource.toTypedRow(
      Seq(Some("7"), Some("1995-03-15"), Some("1995-03-15 10:30:45"), Some("711.56"), Some("1")),
      schema)
    assert(row.getLong(0) == 7L)
    assert(row.getDate(1) == java.sql.Date.valueOf("1995-03-15"))
    assert(row.getTimestamp(2) == java.sql.Timestamp.valueOf("1995-03-15 10:30:45"))
    assert(row.getDecimal(3) == new java.math.BigDecimal("711.56"))
    assert(row.getBoolean(4))
  }

  test("full dump round-trip preserves rows, schema, and table filter") {
    val dir = Files.createTempDirectory("dumpspec").toFile
    val path = s"$dir/two_tables.sql"
    val sql =
      """-- header
        |CREATE TABLE `a` (`id` INT, `name` VARCHAR(10));
        |INSERT INTO `a` VALUES (1,'x'),(2,'y;z'),(3,NULL);
        |CREATE TABLE `b` (`id` INT);
        |INSERT INTO `b` VALUES (9);
        |CREATE TABLE `empty_t` (`id` INT);
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(path), sql)

    for (distributed <- Seq(true, false)) {
      val all = SqlDumpSource.parse(spark, path, Seq("all"), distributed)
      assert(all.keySet == Set("a", "b", "empty_t"), s"distributed=$distributed")
      assert(all("a").count() == 3)
      assert(all("a").schema("id").dataType == LongType)
      assert(all("a").collect().map(r => Option(r.get(1))).toSet ==
        Set(Some("x"), Some("y;z"), None))
      assert(all("b").count() == 1)
      assert(all("empty_t").count() == 0)

      val onlyB = SqlDumpSource.parse(spark, path, Seq("b"), distributed)
      assert(onlyB.keySet == Set("b"))
    }
  }

  test("fixture writer -> parser round-trip is lossless (nation table)") {
    val dir = Files.createTempDirectory("dumpspec2").toFile
    val path = s"$dir/nation.sql"
    val nation = Tables.t(spark, "/root/testdata/sf0.001", "nation")
    SqlDumpFixture.writeDump(nation, "nation", path)
    val parsed = SqlDumpSource.parse(spark, path)("nation")
    // INT -> LONG widening per declared mapping; compare values as longs
    val want = nation.collect().map(r =>
      (r.getAs[Number]("n_nationkey").longValue(), r.getAs[String]("n_name"),
        r.getAs[Number]("n_regionkey").longValue())).toSet
    val got = parsed.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
