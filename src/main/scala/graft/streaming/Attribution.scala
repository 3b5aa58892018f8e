package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM join — the one Structured Streaming join
  * shape the rest of the engine doesn't already use (streams join
  * static dims everywhere else). The canonical case is attribution:
  * conversions join the impression that preceded them within an
  * attribution window, both sides unbounded.
  *
  * State stays bounded because BOTH sides carry watermarks and the join
  * condition bounds event time from both directions
  * (`conv.ts BETWEEN imp.ts AND imp.ts + window`): Spark derives state
  * eviction from exactly this pattern — impressions older than
  * (watermark − window) and conversions older than the watermark are
  * dropped from the join state. Without the two-sided time bound the
  * state grows forever; that is the 100 TB failure mode this operator
  * exists to avoid. Append output: each match emits once, when both
  * sides are final under the watermark.
  */
object Attribution {

  /** Join conversions to qualifying impressions for the same `keyCol`
    * within `windowSeconds` AFTER the impression. Emits one row per
    * (impression, conversion) pair — downstream pick first/last-touch
    * by aggregating on the conversion id. Column requirements: both
    * frames carry `keyCol` and an event-time `ts` (timestamp). */
  def attribute(impressions: DataFrame, conversions: DataFrame,
                keyCol: String, windowSeconds: Int,
                watermark: String = "10 minutes"): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    val imp = impressions
      .select(col(keyCol).as("k"), col("ts").as("imp_ts"),
        col("imp_id"))
      .withWatermark("imp_ts", watermark)
    val conv = conversions
      .select(col(keyCol).as("k"), col("ts").as("conv_ts"),
        col("conv_id"))
      .withWatermark("conv_ts", watermark)
    imp.join(conv,
      imp("k") === conv("k") &&
        col("conv_ts") >= col("imp_ts") &&
        col("conv_ts") <= col("imp_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(imp("k").as(keyCol), col("imp_id"), col("conv_id"),
        col("imp_ts"), col("conv_ts"),
        (unix_timestamp(col("conv_ts")) - unix_timestamp(col("imp_ts")))
          .as("lag_seconds"))
  }
}
