package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Persisted IVF index: serve must equal the in-memory serve on the
  * same frozen centroids, and an appended batch must make the index
  * equivalent to one built from the full corpus. */
class IvfIndexSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val d = "/root/testdata/sf0.001"
  private def emb = graft.Tables.t(spark, d, "embeddings")

  // stale-warehouse hygiene: a previous JVM's run leaves orphan table
  // DIRS after the in-memory catalog forgets them; the append-create
  // path (correctly) refuses to adopt an orphan location, so each test
  // clears its names first — the same self-heal the gate memo performs
  private def fresh(tables: String*): Unit = tables.foreach { tbl =>
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$tbl")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }
  private lazy val cents = Similarity.trainIvfCentroids(
    emb, "vec_id", "embedding", nCentroids = 16, lloydIters = 2)

  private def served(table: String) =
    Similarity.ivfIndexServe(spark, table, emb, "vec_id", "embedding",
        queryIds = _ < 10, k = 5, centroids = cents, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._3)).toSeq

  test("persisted-index serve equals the in-memory serve") {
    fresh("graft_ivf_spec_full")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      "graft_ivf_spec_full", cents)
    val direct = Similarity.ivfTopKServe(emb, "vec_id", "embedding",
        queryIds = _ < 10, k = 5, centroids = cents, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._3)).toSeq
    assert(served("graft_ivf_spec_full") === direct)
    assert(direct.nonEmpty)
  }

  test("appended batch makes the index equal to a full build") {
    fresh("graft_ivf_spec_part", "graft_ivf_spec_full2")
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 5 =!= 0),
      "vec_id", "embedding", "graft_ivf_spec_part", cents)
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 5 === 0),
      "vec_id", "embedding", "graft_ivf_spec_part", cents)
    Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      "graft_ivf_spec_full2", cents)
    assert(served("graft_ivf_spec_part") === served("graft_ivf_spec_full2"))
  }

  test("streamed ingest builds an index equal to a direct full build") {
    fresh("graft_ivf_spec_streamed", "graft_ivf_spec_full3")
    val base = java.nio.file.Files.createTempDirectory("ivf_ingest")
    val landing = base.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    for (i <- 0 until 3) {
      val stage = base.resolve(s".s$i")
      emb.filter(col("vec_id") % 3 === i)
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        landing.resolve(s"batch-$i.parquet"))
    }
    graft.streaming.EventStream.ivfIngestApply(spark, landing.toString,
      "graft_ivf_spec_streamed", cents, base.resolve("ckpt").toString)
    Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      "graft_ivf_spec_full3", cents)
    assert(served("graft_ivf_spec_streamed") === served("graft_ivf_spec_full3"))
  }
}
