package graft.tools

// Scratch profiler for k1_sink_dedup phases. Not part of the library
// surface; run with: sbt "runMain graft.tools.K1Profile"
object K1Profile {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft._
    import graft.sinks.{SinkOptions, SinkRouter}
    import graft.operators.UserRecognition
    import graft.sources.DriverEventsAdapter
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.get()
    sys.env.get("K1_LISTING_THRESHOLD").foreach(v =>
      s.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", v))
    sys.env.get("K1_AQE").foreach(v => s.conf.set("spark.sql.adaptive.enabled", v))
    s.read.parquet(s"$dir/lineitem.parquet").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"## $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"## ---- round $round")
      val wh = java.nio.file.Files.createTempDirectory("k1prof").toFile.getAbsolutePath
      val router = new SinkRouter(wh, SinkOptions(deduplicate = true))
      val env = DriverEventsAdapter.load(s, dir)
        .select(col("message_id"), col("timestamp"), col("anonymous_id"),
          col("user_id"), col("type"))
      t("write1 (create)") {
        router.write(env.withColumn("_table", lit("events")))
      }
      val recognized = t("resolveBatch plan") {
        UserRecognition.resolveBatch(env)
          .filter(col("recognized"))
          .select(col("message_id"), col("timestamp"), col("anonymous_id"),
            col("user_id"), col("type"))
      }
      t("write2 (merge)") {
        router.write(recognized.withColumn("_table", lit("events")))
      }
      t("readTable agg") {
        router.readTable(s, "events")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("message_id")).as("n_messages"),
            sum(when(col("user_id").isNotNull, 1).otherwise(0)).as("n_identified"))
          .collect()
      }
    }
    // floor decomposition on the last round's table
    locally {
      val wh2 = java.nio.file.Files.createTempDirectory("k1floor").toFile.getAbsolutePath
      val router = new SinkRouter(wh2, SinkOptions(deduplicate = true))
      val env = DriverEventsAdapter.load(s, dir)
        .select(col("message_id"), col("timestamp"), col("anonymous_id"),
          col("user_id"), col("type"))
      router.write(env.withColumn("_table", lit("events")))
      val tbl = s"$wh2/events"
      val schema = s.read.parquet(tbl).schema
      t("floor: full read count") {
        s.read.schema(schema).parquet(tbl).count() }
      t("floor: pk-col distinct collect") {
        s.read.schema(schema).parquet(tbl)
          .select("graft_dt", "message_id").distinct().count() }
      val win = {
        import org.apache.spark.sql.expressions.Window
        val r = Window.partitionBy(col("message_id"))
          .orderBy(col("timestamp").desc_nulls_last)
        s.read.schema(schema).parquet(tbl)
          .withColumn("_rn", row_number().over(r)).filter(col("_rn") === 1).drop("_rn")
      }
      t("floor: read+window count") { win.count() }
      t("floor: read+window+repart write 90 dirs") {
        win.repartition(32, col("graft_dt"))
          .write.mode("overwrite").partitionBy("graft_dt")
          .parquet(s"$wh2/floorout") }
      t("floor: flat write (no partitionBy)") {
        win.write.mode("overwrite").parquet(s"$wh2/floorflat") }
    }
    s.stop()
  }
}
