package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an undirected graph, DataFrame-native —
  * the graph-centrality companion to the identity-graph machinery
  * ([[Dedup.connectedComponents]] already does min-label propagation over
  * near-dup graphs; UR resolves anon↔user components, ref
  * `webapps/console/lib/server/user-recognition.ts` — centrality is the
  * natural next question a warehouse asks of the same edge tables:
  * which suppliers/customers/devices are hubs).
  *
  * Pregel re-expressed as declarative joins, one round per iteration:
  *   msgs  = edges ⋈ ranks ⋈ deg   (contribution r(u)/deg(u) per edge)
  *   ranks = (1-d) + d · Σ msgs     (hash aggregation by dst)
  *
  * Scale shape: the directed edge list (each undirected edge doubled) is
  * repartitioned ON src ONCE and persisted — every iteration's join
  * then reuses that partitioning and only the node-sized rank table
  * shuffles per round. Ranks persist per iteration (lineage truncation:
  * iteration N's plan must not replay iterations 1..N-1), and the
  * previous round unpersists eagerly. Damping keeps the fixed point
  * contracting, so a FIXED iteration count (deterministic, engine-
  * replayable — an unrolled-CTE oracle can reproduce every round's IEEE
  * arithmetic) is also the production shape: rank pipelines run a known
  * round budget, not convergence polling.
  *
  * `edges`: (src, dst) DISTINCT undirected pairs. Returns (v, r). */
object Graph {

  def pageRank(edges: DataFrame, iterations: Int = 3,
               damping: Double = 0.85): DataFrame = {
    val dir = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"),
        col("src").as("dst")))
      .repartition(col("src"))
      .persist()
    val deg = dir.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist()
    // contribution edge list with the degree folded in: r/deg joins on
    // src each round, so pre-joining deg once removes a per-iteration
    // join (deg is static)
    val withDeg = dir.join(deg, "src").persist()
    var ranks = deg.select(col("src").as("v"), lit(1.0).as("r")).persist()
    ranks.count() // materialize before the loop mutates the reference
    try {
      (1 to iterations).foreach { _ =>
        val next = withDeg
          .join(ranks, withDeg("src") === ranks("v"))
          .select(col("dst"), (col("r") / col("deg")).as("m"))
          .groupBy(col("dst"))
          .agg((lit(1.0 - damping) + lit(damping) * sum(col("m"))).as("r"))
          .select(col("dst").as("v"), col("r"))
          .persist()
        next.count()
        ranks.unpersist(false)
        ranks = next
      }
      ranks
    } finally {
      dir.unpersist(false)
      deg.unpersist(false)
      withDeg.unpersist(false)
    }
  }
}
