package graft

import graft.operators.EntityResolution

class EntityResolutionSpec extends GraftSpec {
  import spark.implicits._

  private val catalog =
    Seq("red widget", "red wagon", "blue bolt", "green gear")
      .toDF("name")

  private def run(dirty: Seq[(Int, String)], maxDist: Int = 2)
      : Map[Int, (String, Int)] =
    EntityResolution.bestMatch(
      dirty.toDF("id", "name"), "id", "name", catalog, "name", maxDist)
      .select("id", "matched_name", "dist")
      .as[(Int, String, Int)].collect()
      .map { case (i, m, d) => i -> ((m, d)) }.toMap

  test("exact names match at distance 0") {
    assert(run(Seq(1 -> "blue bolt")) == Map(1 -> (("blue bolt", 0))))
  }

  test("single-edit corruptions match their source at distance 1") {
    val r = run(Seq(
      1 -> "red widge",    // dropped last char
      2 -> "blue boltx",   // appended char
      3 -> "green gearr")) // doubled last char
    assert(r == Map(
      1 -> (("red widget", 1)),
      2 -> (("blue bolt", 1)),
      3 -> (("green gear", 1))))
  }

  test("beyond maxDist stays unmatched") {
    assert(run(Seq(1 -> "red wi"), maxDist = 2).isEmpty)
  }

  test("blocking: a corrupted first token cannot match (stated recall " +
    "trade of single-pass blocking)") {
    // 'ed widget' is distance 1 from 'red widget' but blocks on 'ed'
    assert(run(Seq(1 -> "ed widget")).isEmpty)
  }

  test("ties break to the lexicographically smallest catalog name") {
    // 'red widgon' is distance 2 from BOTH 'red widget' and 'red wagon'
    assert(run(Seq(1 -> "red widgon")) == Map(1 -> (("red wagon", 2))))
  }

  test("multi-pass blocking recovers records whose first token is " +
    "corrupted, without changing already-matched records") {
    import org.apache.spark.sql.functions.{element_at, split}
    val r = EntityResolution.bestMatchMultiBlock(
      Seq(1 -> "ed widget",   // first token broken, last token intact
        2 -> "blue boltx",    // first-pass match, must stay identical
        3 -> "ed widgetx")    // BOTH tokens broken -> still unmatched
        .toDF("id", "name"),
      "id", "name", catalog, "name", maxDist = 2,
      Seq(n => split(n, " ").getItem(0),
        n => element_at(split(n, " "), -1)))
      .select("id", "matched_name", "dist")
      .as[(Int, String, Int)].collect()
      .map { case (i, m, d) => i -> ((m, d)) }.toMap
    assert(r == Map(
      1 -> (("red widget", 1)),
      2 -> (("blue bolt", 1))))
  }
}
