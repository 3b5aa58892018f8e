package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC apply: fold a batch of change-data-capture operations
  * (insert/update/delete rows tagged with an op code and a log sequence
  * number) into a table snapshot — the Debezium/warehouse-sink contract
  * behind the reference's mutation streams (bulker's `deduplicate`
  * keeps the latest row per key, ref
  * `bulkerlib/implementations/sql/abstract.go`; a CDC feed adds the
  * explicit `op` discriminator and deletes, ref the `__deleted` /
  * op-code handling SaaS warehouses expect). [[graft.sinks.SinkRouter
  * .deleteWhereMor]] covers erasure-by-predicate; this covers the
  * general replication stream: per key, REPLAY ORDER decides.
  *
  * Contract (engine-exact, SQL-replayable):
  *  - `ops` rows: key, data attrs (same names as snapshot), `op` in
  *    {i, u, d}, `lsn` (monotone per key; (key, lsn) unique).
  *  - Per key only the op with the HIGHEST lsn matters: d ⇒ the key
  *    disappears, i/u ⇒ the key holds exactly that op's attrs
  *    (full-row image, the Debezium `after` state).
  *  - Snapshot keys never touched by an op pass through bit-identical.
  *
  * Scale shape: the winning op per key is a hash aggregation (max_by on
  * lsn — partial map-side combine, no sort window), sized by the CDC
  * batch, never the table. The snapshot splits touched/untouched with a
  * BROADCAST semi/anti join on the winner keys (a CDC batch is bounded;
  * the 100 TB snapshot never shuffles), and only winner rows (already
  * tiny) union back in. One shuffle of the ops batch, zero of the
  * snapshot.
  */
object Cdc {

  /** Apply `ops` to `snapshot`; returns the post-batch table. */
  def applyBatch(snapshot: DataFrame, ops: DataFrame,
                 keyCols: Seq[String], lsnCol: String = "lsn",
                 opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "applyBatch needs at least one key column")
    val dataCols = snapshot.columns.toSeq
    // winner per key = max-lsn op (hash agg; ties cannot happen by
    // contract, but max_by on (lsn, op) would make them deterministic)
    val winners = ops
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct((dataCols :+ opCol).filterNot(keyCols.contains).map(col): _*),
        col(lsnCol)).as("_w"))
      .select(keyCols.map(col) :+ col("_w.*"): _*)
    val winnerKeys = broadcast(winners.select(keyCols.map(col): _*))
    val untouched = snapshot.join(winnerKeys, keyCols, "left_anti")
    val upserts = winners.filter(lower(col(opCol)) =!= "d")
      .select(dataCols.map(col): _*)
    untouched.unionByName(upserts)
  }
}
