package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

/** Model-based randomized testing of the snapshot table's WHOLE CRUD
  * lifecycle: a seeded random sequence of overwrite / append / merge /
  * delete / compact / cluster / vacuum ops runs against both the real
  * table and a trivially-correct in-memory model (a Map[id -> value]);
  * after every step the table's full content must equal the model, and
  * periodically a remembered earlier version must still time-travel to
  * its remembered content. Per-op unit tests prove each operator alone;
  * this proves the COMPOSITIONS (merge after delete after compact after
  * schema-relevant appends...) — the sequences a production table
  * actually experiences and where log-replay bugs hide. Deterministic:
  * fixed seed, fixed op distribution. */
class SnapshotTableModelSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("snapmodel").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(rows: Map[Long, Double]) =
    rows.toSeq.map { case (id, v) => (id, v) }.toDF("id", "v")

  private def content(dir: String): Map[Long, Double] =
    SnapshotTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("random op sequences match the in-memory model at every step") {
    val rnd = new scala.util.Random(20260815L)
    var nextId = 0L
    def slice(n: Int, value: Double): Map[Long, Double] = {
      val s = (nextId until nextId + n).map(i => i -> value).toMap
      nextId += n
      s
    }
    for (trial <- 1 to 2) {
      val dir = freshDir()
      var model: Map[Long, Double] = slice(100 + rnd.nextInt(100), 1.0)
      SnapshotTable.commit(spark,
        frame(model).repartitionByRange(4, col("id")), dir, "overwrite",
        statsCols = Seq("id"))
      // remembered snapshots for time-travel checks
      val history = scala.collection.mutable.ArrayBuffer(
        (SnapshotTable.currentVersion(spark, dir).get, model))
      for (step <- 1 to 14) {
        rnd.nextInt(10) match {
          case 0 => // overwrite with a fresh slice
            model = slice(50 + rnd.nextInt(100), step.toDouble)
            SnapshotTable.commit(spark,
              frame(model).repartitionByRange(4, col("id")), dir,
              "overwrite", statsCols = Seq("id"))
          case 1 | 2 => // append fresh ids
            val s = slice(30 + rnd.nextInt(80), step.toDouble)
            model ++= s
            SnapshotTable.commit(spark, frame(s), dir, "append",
              statsCols = Seq("id"))
          case 3 | 4 => // merge: update a random subset + insert fresh ids
            val updates = model.keySet.toSeq.sorted
              .filter(_ => rnd.nextInt(4) == 0)
              .map(id => id -> (step * 1000.0)).toMap ++
              slice(1 + rnd.nextInt(10), step * 1000.0)
            model = model ++ updates
            SnapshotTable.merge(spark, dir, frame(updates), "id",
              statsCols = Seq("id"))
          case 5 | 6 => // delete a random existing-key range
            val ks = model.keySet.toSeq.sorted
            val lo = ks(rnd.nextInt(ks.size))
            val hi = lo + rnd.nextInt(60)
            val after = model.filterNot { case (id, _) =>
              id >= lo && id <= hi }
            if (after.nonEmpty) { // keep the table non-empty
              model = after
              SnapshotTable.delete(spark, dir, "id", lo.toDouble, hi.toDouble)
            }
          case 7 => // compact (content no-op)
            SnapshotTable.compact(spark, dir, targetBytes = 1L << 20,
              clusterBy = Some("id"), statsCols = Seq("id"))
          case 8 => // cluster needs >= 2 z-cols: id + value
            SnapshotTable.cluster(spark, dir, Seq("id", "v"), numFiles = 4,
              statsCols = Seq("id"))
          case 9 => // vacuum under zero retention (no writers active here)
            SnapshotTable.vacuum(spark, dir, retentionMs = 0L)
        }
        assert(content(dir) === model,
          s"trial $trial step $step diverged from the model")
        if (step % 5 == 0)
          history += ((SnapshotTable.currentVersion(spark, dir).get, model))
        // every remembered version still time-travels to its content —
        // vacuum/maintenance must never break history
        val (hv, hm) = history(rnd.nextInt(history.size))
        val got = SnapshotTable.read(spark, dir, Some(hv)).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got === hm, s"trial $trial step $step: version $hv drifted")
      }
    }
  }
}
