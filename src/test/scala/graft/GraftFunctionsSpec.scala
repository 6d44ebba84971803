package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

class GraftFunctionsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       ngram_jaccard('abcdef', 'abcdef', 3) AS j_same,
        |       ngram_jaccard('abcdef', 'uvwxyz', 3) AS j_diff,
        |       size(minhash_sig('hello world', 8, 5)) AS sig_len,
        |       sig_agree(minhash_sig('hello world', 8, 5),
        |                 minhash_sig('hello world', 8, 5)) AS agree
        |""".stripMargin).collect()(0)
    assert(row.getAs[Double]("d") == 11.0)
    assert(row.getAs[Double]("j_same") == 1.0)
    assert(row.getAs[Double]("j_diff") == 0.0)
    assert(row.getAs[Int]("sig_len") == 8)
    assert(row.getAs[Double]("agree") == 1.0)
  }

  test("SQL simhash64/lang_id equal the Scala APIs on raw text") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    GraftFunctions.register(spark)
    val messy = Seq("a\tb  c", " padded text ", "plain words here", "",
      "the cat and the dog is here", "el gato y la casa")
    messy.toDF("t").createOrReplaceTempView("sh_fn_v")
    val viaSql = spark.sql("SELECT simhash64(t) AS h, lang_id(t) AS l FROM sh_fn_v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val viaApi = messy.toDF("t")
      .select(graft.operators.Dedup.simhash64(col("t")).as("h"),
        graft.operators.TextAnalysis.langId(col("t")).as("l"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaSql == viaApi)
    // portable (MD5) mode through SQL: single-token signature IS the
    // MD5-low-64 hash (same pinned value as the expression spec)
    val p = spark.sql("SELECT simhash64('hello', true) AS h").head().getLong(0)
    assert(p == 0x5d41402abc4b2a76L)
    val pApi = messy.toDF("t")
      .select(graft.operators.Dedup.simhash64(col("t"), portable = true).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val pSql = spark.sql("SELECT simhash64(t, true) AS h FROM sh_fn_v")
      .collect().map(_.getLong(0)).toSeq
    assert(pSql == pApi)
  }

  test("sketch aggregate works through SQL") {
    GraftFunctions.register(spark)
    Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      .createOrReplaceTempView("li_fn_v")
    val row = spark.sql(
      "SELECT hll_sketch_distinct(l_partkey) AS sk, COUNT(DISTINCT l_partkey) AS ex FROM li_fn_v")
      .collect()(0)
    val (sk, ex) = (row.getAs[Long]("sk"), row.getAs[Long]("ex"))
    assert(math.abs(sk - ex).toDouble / ex < 0.05, s"$sk vs $ex")
  }

  test("jaro_winkler through SQL equals the Scala API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS jw").collect()(0)
    assert(r.getDouble(0) === 0.9611111111111111)
  }

  test("theta sketch aggregate works through SQL; estimate tracks exact") {
    GraftFunctions.register(spark)
    Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      .createOrReplaceTempView("li_fn_v2")
    val row = spark.sql(
      """SELECT theta_sketch(xxhash64(l_partkey)) AS sk,
        | COUNT(DISTINCT l_partkey) AS ex FROM li_fn_v2""".stripMargin)
      .collect()(0)
    val est = graft.functions.ThetaSketchAgg.estimate(row.getAs[Array[Byte]]("sk"))
    val ex = row.getAs[Long]("ex")
    assert(math.abs(est - ex) / ex < 0.05, s"$est vs $ex")
  }

  test("ac_scrub through SQL equals the Column API; non-literal dict rejected") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    GraftFunctions.register(spark)
    val texts = Seq("a table part b", "fast sort key!", "clean row")
    texts.toDF("t").createOrReplaceTempView("ac_fn_v")
    val viaSql = spark.sql(
      """SELECT ac_scrub(t, array('table part', 'table', 'fast sort key'), '#') AS s
        |FROM ac_fn_v""".stripMargin)
      .select(col("s.scrubbed"), col("s.n_matches"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    val viaApi = texts.toDF("t")
      .select(graft.functions.AcScrub.scrub(col("t"),
        Seq("table part", "table", "fast sort key"), "#").as("s"))
      .select(col("s.scrubbed"), col("s.n_matches"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(viaSql === viaApi)
    assert(viaSql.head === (("a # b", 1)))
    val err = intercept[Exception] {
      spark.sql("SELECT ac_scrub(t, array(t), '#') FROM ac_fn_v").collect()
    }
    assert(err.getMessage.contains("ac_scrub keywords") ||
      Option(err.getCause).exists(_.getMessage.contains("ac_scrub keywords")))
  }
}
