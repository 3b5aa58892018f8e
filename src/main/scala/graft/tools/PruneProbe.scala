package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** One-off evidence: partition pruning on the ANN index's two-level
  * `_batch=/cell=` layout — a cell-filtered read must plan only the
  * probed cells' directories (SCALE.md round-8 claim). Not part of the
  * driver contract. */
object PruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("prune").toString
    // 4 batches x 8 cells of tiny vectors
    (0 until 4).foreach { b =>
      (0 until 8).flatMap(c => Seq((b * 100L + c, Seq(1f, 0f), c)))
        .toDF("id", "vec", "cell")
        .withColumn("_batch", lit(b.toLong))
        .write.mode("append").partitionBy("_batch", "cell")
        .parquet(s"$idx/vectors")
    }
    val probed = spark.read.parquet(s"$idx/vectors")
      .filter(col("cell").isin(2, 5))
    probed.collect()
    val scan = probed.queryExecution.executedPlan.collectLeaves().head
    val meta = scan.metrics
    println("#### files read: " + meta.get("numFiles").map(_.value))
    println("#### partitions read: " +
      meta.get("numPartitions").map(_.value))
    val all = spark.read.parquet(s"$idx/vectors")
    all.collect()
    val scanAll = all.queryExecution.executedPlan.collectLeaves().head
    println("#### files total: " +
      scanAll.metrics.get("numFiles").map(_.value))
    spark.stop()
  }
}
