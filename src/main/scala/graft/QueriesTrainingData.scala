package graft

/** Training-data pipeline queries: dedup family, ANN similarity search,
  * text analysis, sampling/corpus assembly, alignment data, multimodal
  * plumbing — over the driver's `documents` and `embeddings` tables.
  * See [[Queries]] for the determinism rules.
  *
  * The registry is split along the COVERAGE.md family boundaries
  * ([[QueriesTdDedup]] / [[QueriesTdAnn]] / [[QueriesTdText]] /
  * [[QueriesTdSample]] / [[QueriesTdAlign]], shared helpers in
  * [[QueriesTdShared]]); each family keeps the single folded `gated`
  * shape — (name, query, oracle SQL) reads as ONE unit — and this
  * object concatenates them so the driver-facing surface is unchanged.
  */
object QueriesTrainingData {
  import Queries.Q

  val gated: Seq[(String, Q, String)] =
    QueriesTdDedup.gated ++ QueriesTdAnn.gated ++ QueriesTdText.gated ++
      QueriesTdSample.gated ++ QueriesTdAlign.gated

  val queries: Map[String, Q] =
    gated.map(g => (g._1, g._2)).toMap

  val oracles: Map[String, String] =
    gated.map(g => (g._1, g._3)).toMap
}
