package graft.chain

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** The function-chain runtime — SURVEY §2.9 surface + §2.8 semantics.
  *
  * The reference (rotor) runs per-connection chains of event functions:
  * builtin transformations, then user functions, then a destination
  * function (`services/rotor/src/lib/functions-chain.ts:278-374`). Result
  * semantics (R5): array -> replaces the event (fan-out), null/"drop" ->
  * drop, undefined/same -> pass through; errors (R1/R3): a `RetryError`
  * marks the event retryable at the failed stage, a drop-error drops it,
  * other errors pass the last-good event through to the destination.
  *
  * Spark shape: a chain compiles to ONE `mapPartitions` over JSON-encoded
  * events (the reference's IR is the JSON object; jackson here), emitting
  * (event, status, failedStage) rows. Dataflow-visible operators (filters,
  * projections) should be expressed as DataFrame ops instead — this
  * runtime exists for the opaque user-function surface, and keeps the
  * whole chain in a single narrow stage (no shuffle, no driver loop).
  */
object FunctionChain {

  /** What a function returns (R5). */
  sealed trait Result
  case object Same extends Result
  case class Replace(events: Seq[ObjectNode]) extends Result
  case object Drop extends Result
  /** Retryable failure (ref RetryError). */
  case class Retry(reason: String) extends Result
  /** Drop + record (ref RetryError{drop:true}). */
  case class DropRetry(reason: String) extends Result

  /** An event function: name + body. `builtin` controls the metrics status
    * prefix (ref metrics.ts:156-175). */
  case class EventFunction(id: String, builtin: Boolean,
                           fn: ObjectNode => Result)

  case class ChainOutput(event: String, status: String, functionId: String,
                         error: String)

  private val mapperTl = new ThreadLocal[ObjectMapper] {
    override def initialValue(): ObjectMapper = new ObjectMapper()
  }

  /** Run a chain over JSON event strings.
    *
    * `fromStage`: index of the first function to run (R2 partial-chain
    * retry — a retried event re-enters at the failed stage, keeping
    * earlier results). Only the LAST function may multiply (R4).
    */
  def run(events: Dataset[String], chain: Seq[EventFunction],
          fromStage: Int = 0): Dataset[ChainOutput] = {
    val enc = Encoders.product[ChainOutput]
    events.mapPartitions { it =>
      val mapper = mapperTl.get()
      it.flatMap { raw =>
        runOne(mapper, raw, chain, fromStage)
      }
    }(enc)
  }

  private[chain] def runOne(mapper: ObjectMapper, raw: String,
                            chain: Seq[EventFunction],
                            fromStage: Int): Seq[ChainOutput] = {
    var current: Seq[ObjectNode] =
      try Seq(mapper.readTree(raw).asInstanceOf[ObjectNode])
      catch { case NonFatal(e) =>
        return Seq(ChainOutput(raw, "error", "parse", e.toString))
      }
    var lastError: String = null
    var i = math.max(fromStage, 0)
    while (i < chain.length) {
      val f = chain(i)
      val isLast = i == chain.length - 1
      val next = scala.collection.mutable.ArrayBuffer[ObjectNode]()
      var aborted: Option[Seq[ChainOutput]] = None
      current.foreach { ev =>
        if (aborted.isEmpty) {
          // R3: a PLAIN exception skips this function's edits but the
          // event continues down the chain (ref functions-chain.ts:
          // 352-358, "error" scenario); only an explicit Retry/DropRetry
          // result interrupts (ref RetryError semantics).
          val result =
            try f.fn(ev.deepCopy()) // functions get a deep copy (R5)
            catch { case NonFatal(e) =>
              lastError = s"${f.id}: ${e.toString}"
              Same
            }
          result match {
            case Same => next += ev
            case Replace(evs) =>
              // R4: only the final function may return multiple events
              if (evs.length > 1 && !isLast)
                aborted = Some(Seq(ChainOutput(mapper.writeValueAsString(ev),
                  "error", f.id,
                  "only the last function in a chain can multiply events")))
              else next ++= evs
            case Drop => // dropped silently (P10)
            case DropRetry(reason) =>
              aborted = Some(Seq(ChainOutput(mapper.writeValueAsString(ev),
                "dropped", f.id, reason)))
            case Retry(reason) =>
              // R1: retryable -> emit with failed stage for re-drive;
              // R3: the last-good event continues to the output row
              aborted = Some(Seq(ChainOutput(mapper.writeValueAsString(ev),
                "retry", f.id, reason)))
          }
        }
      }
      aborted match {
        case Some(out) => return out
        case None =>
          if (next.isEmpty) return Nil
          current = next.toSeq
          i += 1
      }
    }
    current.map(ev => ChainOutput(mapper.writeValueAsString(ev),
      "success", chain.lastOption.map(_.id).getOrElse(""), lastError))
  }

  /** R2: re-drive retry rows from their failed stage. `retries` is the
    * output of a previous run filtered to status == "retry"; returns the
    * chain output of the re-run (stage index looked up by function id). */
  def redrive(retries: Dataset[ChainOutput],
              chain: Seq[EventFunction]): Dataset[ChainOutput] = {
    val stageById = chain.map(_.id).zipWithIndex.toMap
    val enc = Encoders.product[ChainOutput]
    retries.mapPartitions { it =>
      val mapper = mapperTl.get()
      it.flatMap { r =>
        runOne(mapper, r.event, chain, stageById.getOrElse(r.functionId, 0))
      }
    }(enc)
  }

  /** A4 metrics status derivation for chain outputs. */
  def withMetricsStatus(out: DataFrame, chain: Seq[EventFunction]): DataFrame = {
    val builtinIds = chain.filter(_.builtin).map(_.id)
    out.withColumn("metric_status",
      when(col("status") === "success", "success")
        .when(col("status") === "dropped", "dropped")
        .when(col("functionId").isin(builtinIds: _*), "builtin_function_error")
        .otherwise("function_error"))
  }
}
