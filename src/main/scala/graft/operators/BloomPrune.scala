package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter semi-join pruning — the runtime-filter
  * pattern (Spark's `runtime.bloomFilter`, Trino's dynamic filters)
  * as a deliberate operator for when the optimizer can't see the
  * opportunity (e.g. the small side comes from a separate pipeline
  * stage or an earlier job's output).
  *
  * Why it matters at 100 TB: a plain semi join shuffles EVERY big-side
  * row to its join partition before any can be dropped. The bloom
  * pre-filter is a map-side test against a broadcast byte array, so
  * non-matching rows die inside the scan stage and never reach the
  * exchange — with a selective small side that is most of the corpus.
  * The follow-up exact semi join only pays for the survivors (bloom
  * false-positive rate among them, default ~3%), so results are
  * EXACTLY the semi join's — the bloom can only let extra rows
  * through to the exact join, never drop a real match.
  *
  * Built on Spark's native BloomFilterAggregate/BloomFilterMightContain
  * Catalyst expressions via the graftshim (same codegen'd kernels the
  * built-in runtime filter injects; no UDF). The filter itself is
  * driver-built once: the small side aggregates to ONE binary value
  * (scans distributed, merge on the driver), embedded as a literal so
  * every task probes it broadcast-style. [[Dedup.bloomIncremental]] is
  * the text-fingerprint specialization of the same pattern.
  */
object BloomPrune {

  /** The bloom bitmap for `keys`' single column, as raw bytes. */
  private[operators] def buildBloom(keys: DataFrame,
                                    expectedItems: Long,
                                    numBits: Long): Array[Byte] = {
    val child = new XxHash64(Seq(graftshim.expressionTree(col(keys.columns.head))))
    val agg = new BloomFilterAggregate(child,
      Literal(expectedItems), Literal(numBits))
      .toAggregateExpression()
    val row = keys.select(graftshim.column(agg).as("bloom")).head()
    row.getAs[Array[Byte]]("bloom")
  }

  /** All `big` rows whose `bigKey` appears in `small.smallKey` —
    * result-identical to `big.join(small, cond, "left_semi")`, but
    * non-matching big-side rows are dropped map-side by the bloom
    * before the exchange. */
  def semiJoin(big: DataFrame, bigKey: String,
               small: DataFrame, smallKey: String,
               expectedItems: Long = 1000000L,
               numBits: Long = 8388608L): DataFrame = {
    val bloom = buildBloom(small.select(col(smallKey)).na.drop(),
      expectedItems, numBits)
    val probe = graftshim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(graftshim.expressionTree(col(bigKey))))))
    big.filter(probe)
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
