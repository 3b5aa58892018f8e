package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends GraftSpec {
  import spark.implicits._

  // path graph a — b — c
  private def path = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")

  test("pageRank: hand-computed values on the path graph") {
    // deg: a=1, b=2, c=1; p0 = 1 everywhere
    // p1: a = .15 + .85*(1/2) = .575, b = .15 + .85*(1+1) = 1.85, c = .575
    val r1 = Graph.pageRank(path, iterations = 1)
      .as[(String, Double)].collect().toMap
    assert(r1("a") == 0.575 && r1("b") == 1.85 && r1("c") == 0.575)
    // p3 continues the recursion
    val r3 = Graph.pageRank(path, iterations = 3)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r3("b") - 1.741625) < 1e-12)
    assert(math.abs(r3("a") - 0.6291875) < 1e-12)
  }

  test("pageRank: total rank mass is conserved at N") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c")).toDF("src", "dst")
    (1 to 4).foreach { it =>
      val total = Graph.pageRank(edges, iterations = it)
        .agg(sum(col("r"))).head.getDouble(0)
      assert(math.abs(total - 4.0) < 1e-9, s"iter $it: $total")
    }
  }

  test("pageRank: structurally symmetric nodes get equal ranks, " +
    "hubs rank highest") {
    // star: hub h connected to 4 leaves
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4"))
      .toDF("src", "dst")
    val r = Graph.pageRank(star, iterations = 3)
      .as[(String, Double)].collect().toMap
    val leaves = Seq("l1", "l2", "l3", "l4").map(r)
    assert(leaves.distinct.size == 1)
    assert(r("h") > leaves.head)
  }
}
