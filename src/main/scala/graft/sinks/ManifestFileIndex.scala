package graft.sinks

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Zero-I/O [[FileIndex]] fed straight from a snapshot table's manifest —
  * the Delta `TahoeLogFileIndex` shape. `spark.read.orc(10k paths…)`
  * spends its wall time in `InMemoryFileIndex` stat-ing every path
  * (measured: 16.5s of a 19.8s read at 10k files on a local fs; worse
  * with object-store round trips), duplicating metadata the commit log
  * already holds. This index hands Spark the (path, length) pairs the
  * manifest recorded at write time, so planning a snapshot scan costs
  * ZERO filesystem calls regardless of file count — the property that
  * keeps a 100 TB table's query planning off the storage system.
  *
  * `length` is the ORC content length harvested from the footer at
  * commit time: every stripe offset lies inside it, and Spark's ORC
  * split arithmetic selects stripes by offset-in-range, so scans over
  * `[0, contentLength)` read every row (validated against plain
  * `spark.read.orc` on multi-stripe files in SnapshotTableSpec).
  *
  * No partition columns: snapshot tables carry layout in the manifest,
  * not in directory names. Filter pruning happens BEFORE this index is
  * built (scanPruned's manifest stab), where it can also skip whole
  * files — a partitionFilters hook here would be redundant. */
private[graft] final class ManifestFileIndex(
    root: Path, files: Seq[(Path, Long)]) extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty,
      files.map { case (p, len) =>
        // modTime 0: the manifest doesn't record it and no ORC read path
        // consults it (only the _metadata column surface would)
        new FileStatus(len, false, 1, len, 0L, p)
      }.toArray))

  override def inputFiles: Array[String] = files.map(_._1.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_._2).sum

  override def partitionSchema: StructType = new StructType()
}
