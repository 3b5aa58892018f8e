package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** One-off measurement: wide open-props projection via
  * `get_json_object` (re-tokenizes the JSON blob once per accessed key)
  * vs Spark 4 VARIANT `variant_get` (parse once into the binary
  * encoding, then pre-shredded path reads). Distinct keys on purpose —
  * identical paths would be collapsed by subexpression elimination and
  * measure nothing. Backs the SCALE.md round-8 claim for
  * [[graft.operators.Layouts.hoistPropertiesVariant]]; not part of the
  * driver contract.
  *
  *   sbt "runMain graft.tools.VariantProbe [sfDir]"
  */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // an 8-key JSON blob per lineitem row — the wide-props shape a
    // hoist / SaaS projection reads; persisted so both arms scan the
    // same cached strings
    val blobs = spark.range(8).crossJoin(
        spark.read.parquet(s"$sfDir/lineitem.parquet"))
      .select(to_json(struct(keys.map(col): _*)).as("props"))
      .persist()
    println(s"rows: ${blobs.count()}")

    def timed(label: String)(body: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = body
        println(f"#### $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    timed("json_string 8-key projection") {
      val cols = keys.map(k =>
        get_json_object(col("props"), s"$$.$k").cast("double").as(k))
      blobs.select(cols: _*)
        .selectExpr(s"sum(${keys.mkString("+")}) s").collect()(0).getDouble(0).toLong
    }
    timed("variant 8-key projection") {
      val parsed = blobs.select(parse_json(col("props")).as("pv"))
      val cols = keys.map(k =>
        variant_get(col("pv"), s"$$.$k", "DOUBLE").as(k))
      parsed.select(cols: _*)
        .selectExpr(s"sum(${keys.mkString("+")}) s").collect()(0).getDouble(0).toLong
    }
    spark.stop()
  }
}
