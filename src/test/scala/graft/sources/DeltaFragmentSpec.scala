package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The merge-on-read task writer's scale contract, pinned at the unit
  * level: deleted positions SPILL to fragment sidecars executor-side and
  * the [[DeltaTaskCommit]] carries only (file → fragment path) POINTERS
  * — a statement deleting a billion rows ships O(files) bytes through
  * the commit-message hop, never the positions themselves. */
class DeltaFragmentSpec extends AnyFunSuite {

  private def idRow(file: String, pos: Long): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(file), pos))

  test("task commit carries fragment pointers; fragments hold the sorted positions") {
    val staging = java.nio.file.Files.createTempDirectory("dvfrag").toString
    val conf = new org.apache.spark.util.SerializableConfiguration(
      new org.apache.hadoop.conf.Configuration())
    var inserted = 0
    val inner = new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      override def write(r: InternalRow): Unit = inserted += 1
      override def commit() = org.apache.spark.sql.graft.GraftStreamWrite
        .StagedFile("unused", 0L)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
    val w = new GraftDeltaTaskWriter(inner, staging, conf)
    // interleaved deletes across two files, unsorted positions
    w.delete(null, idRow("/data/f1.parquet", 42L))
    w.delete(null, idRow("/data/f2.parquet", 7L))
    w.delete(null, idRow("/data/f1.parquet", 3L))
    w.delete(null, idRow("/data/f1.parquet", 99L))
    val msg = w.commit().asInstanceOf[DeltaTaskCommit]
    assert(msg.deletes.keySet == Set("/data/f1.parquet", "/data/f2.parquet"))
    // the message holds PATHS into the staging dir, nothing else
    msg.deletes.values.flatten.foreach { p =>
      assert(p.contains(staging), s"fragment must live in the staging dir: $p")
    }
    val fs = new Path(staging).getFileSystem(conf.value)
    val f1 = msg.deletes("/data/f1.parquet").flatMap(p =>
      org.apache.spark.sql.graft.DeletionVectors.read(fs, new Path(p)))
    assert(f1.sorted == Seq(3L, 42L, 99L),
      s"fragments must hold exactly the file's deleted positions: $f1")
    val f2 = msg.deletes("/data/f2.parquet").flatMap(p =>
      org.apache.spark.sql.graft.DeletionVectors.read(fs, new Path(p)))
    assert(f2 == Seq(7L))
    // each individual fragment is internally sorted (the sidecar contract)
    msg.deletes.values.flatten.foreach { p =>
      val a = org.apache.spark.sql.graft.DeletionVectors.read(fs, new Path(p))
      assert(a.sameElements(a.sorted), s"fragment not sorted: $p")
    }
  }
}
