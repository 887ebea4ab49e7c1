package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The partition-pruning PLAN property behind q_partitioned_read: a
  * predicate on the partition column must become a PartitionFilter (the
  * scan lists only matching directories), not a post-scan data filter.
  */
class PartitionedLayoutSpec extends SparkSpec {

  test("partition predicate prunes directories at the scan") {
    val dir = tmpDir("partspec")
    spark.range(100)
      .select(col("id"), (col("id") % 4).cast("string").as("bucket"))
      .write.partitionBy("bucket").parquet(s"$dir/t")

    val q = spark.read.parquet(s"$dir/t").where(col("bucket") === "2")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString

    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("bucket"),
      s"partition filter not pushed to the scan:\n$scan")
    // collect() (not count()) so the metric lands on THIS queryExecution
    assert(q.collect().length == 25)

    // and the executed scan reads only that directory's files: the table
    // has 16 part files (4 buckets × 4 writer partitions); the pruned scan
    // must touch exactly the 4 under bucket=2
    val leaf = q.queryExecution.executedPlan.collectLeaves().head
    val numFiles = leaf.metrics("numFiles").value
    val totalFiles = spark.read.parquet(s"$dir/t").inputFiles.length
    assert(totalFiles == 16 && numFiles == 4,
      s"expected 4 of $totalFiles files scanned, got $numFiles")
  }
}
