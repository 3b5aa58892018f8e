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

  private def tri(edges: Seq[(String, String)]): Map[String, Long] =
    Graph.triangleCounts(edges.toDF("src", "dst"))
      .as[(String, Long)].collect().toMap

  test("triangleCounts: K4 — every node in C(3,2)=3 triangles") {
    val k4 = for {
      Seq(a, b) <- Seq("a", "b", "c", "d").combinations(2).toSeq
    } yield (a, b)
    val r = tri(k4)
    assert(r == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("triangleCounts: triangle + pendant — pendant node absent") {
    val r = tri(Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")))
    assert(r == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("triangleCounts: 4-cycle has no triangles") {
    assert(tri(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))).isEmpty)
  }

  test("triangleCounts: two triangles sharing an edge") {
    // abc + bcd share edge b-c
    val r = tri(Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("b", "d"), ("c", "d")))
    assert(r == Map("a" -> 1L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
  }

  test("triangleCounts: orientation invariance — reversed edge list " +
    "gives identical counts") {
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
      ("b", "d"), ("d", "e"), ("c", "e"))
    assert(tri(e) == tri(e.map(_.swap)))
  }

  test("clusteringCoefficient: triangle+pendant and a path — exact micros, 0 and NULL cases") {
    // triangle {a,b,c} + pendant d on a, plus a disjoint path e-f-g:
    // a: deg 3, 1 triangle -> 2e6 div 6 = 333333; b, c: deg 2 -> 1e6;
    // d, e, g: deg 1 -> NULL (undefined); f: deg 2, 0 triangles -> 0
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"),
      ("e", "f"), ("f", "g")).toDF("src", "dst")
    val r = graft.operators.Graph.clusteringCoefficient(edges)
      .collect()
      .map(x => x.getString(0) -> ((x.getAs[Long]("deg"),
        x.getAs[Long]("n_triangles"),
        if (x.isNullAt(x.fieldIndex("coeff_micro"))) None
        else Some(x.getAs[Long]("coeff_micro"))))).toMap
    assert(r("a") == ((3L, 1L, Some(333333L))))
    assert(r("b") == ((2L, 1L, Some(1000000L))))
    assert(r("c") == ((2L, 1L, Some(1000000L))))
    assert(r("d") == ((1L, 0L, None)))
    assert(r("f") == ((2L, 0L, Some(0L))))
    assert(r("e") == ((1L, 0L, None)) && r("g") == ((1L, 0L, None)))
  }

  test("pageRankWeighted: unit weights equal plain pageRank; a heavy edge pulls rank") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))
    val plain = graft.operators.Graph.pageRank(
        edges.toDF("src", "dst"), iterations = 3).collect()
      .map(r => r.getString(0) -> math.rint(r.getDouble(1) * 1e9)).toMap
    val unit = graft.operators.Graph.pageRankWeighted(
        edges.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"),
        iterations = 3).collect()
      .map(r => r.getString(0) -> math.rint(r.getDouble(1) * 1e9)).toMap
    assert(unit == plain, s"unit-weight ranks diverge: $unit vs $plain")
    // h cites x with 10x the mass it cites y: x must outrank y
    val star = Seq(("h", "x", 10L), ("h", "y", 1L))
      .toDF("src", "dst", "w")
    val r = graft.operators.Graph.pageRankWeighted(star, iterations = 2)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("x") > r("y"), s"weighted pull failed: $r")
  }

  test("twoHopReach: path and star — exact distance-2 sets, micros") {
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Graph.twoHopReach(df).collect()
        .map(x => x.getString(0) -> ((x.getAs[Long]("n1"),
          x.getAs[Long]("n2"), x.getAs[Long]("h2_micro")))).toMap
    val p = run(path)
    // a-b-c-d: ends reach 1 direct + 1 at distance 2; middles 2 + 1
    assert(p("a") == ((1L, 1L, 1500000L)))
    assert(p("b") == ((2L, 1L, 2500000L)))
    assert(p("c") == ((2L, 1L, 2500000L)))
    assert(p("d") == ((1L, 1L, 1500000L)))
    // star center reaches everything directly (n2 = 0); leaves see
    // the other two leaves through the hub
    val star = Seq(("h", "x"), ("h", "y"), ("h", "z")).toDF("src", "dst")
    val s = run(star)
    assert(s("h") == ((3L, 0L, 3000000L)))
    assert(s("x") == ((1L, 2L, 2000000L)))
  }

  test("kCorePeel: chain peels in cascading rounds; round budget reports non-convergence loudly") {
    // triangle {a,b,c} + chain c-d-e at k=2: round 1 drops e (deg 1),
    // round 2 drops d (now deg 1), round 3 finds the fixpoint
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
      ("d", "e")).toDF("src", "dst")
    def run(rounds: Int) = graft.operators.Graph
      .kCorePeel(edges, k = 2, rounds = rounds).collect()
      .map(x => x.getString(0) ->
        ((x.getAs[Long]("core_deg"), x.getAs[Boolean]("converged"))))
      .toMap
    val full = run(3)
    assert(full == Map("a" -> ((2L, true)), "b" -> ((2L, true)),
      "c" -> ((2L, true))))
    // one round: e gone but d (now degree 1) still present, and the
    // non-fixpoint is reported, not silent
    val partial = run(1)
    assert(partial.keySet == Set("a", "b", "c", "d"))
    assert(partial("c") == ((3L, false)) && partial("d") == ((1L, false)))
  }

  test("labelPropagation: two cliques over a bridge stay two communities") {
    import graft.operators.{Dedup, Graph}
    // K4 on {1..4}, K4 on {11..14}, one bridge 4-11
    def clique(vs: Seq[Long]) = for {
      a <- vs; b <- vs if a < b
    } yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(11L, 12L, 13L, 14L)) :+ ((4L, 11L)))
      .toDF("src", "dst")
    val got = Graph.labelPropagation(edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    val left = Seq(1L, 2L, 3L, 4L).map(got)
    val right = Seq(11L, 12L, 13L, 14L).map(got)
    assert(left.distinct.size == 1, s"left clique split: $got")
    assert(right.distinct.size == 1, s"right clique split: $got")
    assert(left.head != right.head,
      "bridge edge must not merge the communities")
    // connected components WOULD merge them — the contrast that makes
    // LPA a different operator
    val cc = Dedup.connectedComponents(
        edges.withColumnRenamed("src", "id_a")
          .withColumnRenamed("dst", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size == 1)
  }

  test("bfsDistances: multi-source min-hop distances, horizon-bounded, unreached vertices absent") {
    // path 1-2-3-4, isolated pair 5-6; seeds {1, 6}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 6L).toDF("v")
    val got = Graph.bfsDistances(edges, seeds, maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 6L -> 0L, 5L -> 1L),
      s"got $got")
    // 4 is 3 hops out — beyond the horizon, absent (loud by absence,
    // the caller left-joins the vertex table for explicit rows)
    assert(!got.contains(4L))
    // undirected: seeding the other end walks the same path backwards;
    // a vertex reachable from two seeds takes the MIN
    val got2 = Graph.bfsDistances(edges, Seq(4L, 2L).toDF("v"), 3)
      .as[(Long, Long)].collect().toMap
    assert(got2(3L) == 1L && got2(1L) == 1L && got2(2L) == 0L)
  }

  test("assortativity: a star is perfectly disassortative; regular graphs have no signal") {
    val star = Seq(("c", "a"), ("c", "b"), ("c", "d")).toDF("src", "dst")
    val r = graft.operators.Graph.assortativity(star).collect().head
    assert(r.getAs[Long]("n_edges_directed") == 6)
    assert(r.getAs[Long]("r_micro") == -1000000L)
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val rc = graft.operators.Graph.assortativity(cycle).collect().head
    assert(rc.isNullAt(rc.fieldIndex("r_micro")))
  }

  test("personalizedPageRank: restart mass only at seeds; hand-folded 3-iteration values") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val seeds = Seq("a").toDF("v")
    val r = graft.operators.Graph
      .personalizedPageRank(edges, seeds, iterations = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // fold by hand: deg a=1, b=2, c=1; p1 = (a .15, b .85);
    // p2 = (a .51125, b .1275, c .36125); p3 below
    def close(x: Double, y: Double) = math.abs(x - y) < 1e-12
    assert(close(r("a"), 0.15 + 0.85 * (0.1275 / 2)))
    assert(close(r("b"), 0.85 * (0.51125 + 0.36125)))
    assert(close(r("c"), 0.85 * (0.1275 / 2)))
    // no seed, no mass: nodes unreachable from seeds emit no row
    assert(r.size == 3)
  }

  test("hits: hand-folded two-round max-normalized hubs and authorities") {
    val e = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"))
      .toDF("src", "dst")
    val r = graft.operators.Graph.hits(e, iterations = 2).collect()
      .map(x => x.getString(0) ->
        (Option(x.get(1)).map(_.asInstanceOf[Double]),
          Option(x.get(2)).map(_.asInstanceOf[Double]))).toMap
    def close(x: Option[Double], y: Double) =
      x.exists(v => math.abs(v - y) < 1e-12)
    assert(close(r("c1")._1, 1.0) && r("c1")._2.isEmpty)
    assert(close(r("c2")._1, 0.625) && r("c2")._2.isEmpty)
    assert(r("s1")._1.isEmpty && close(r("s1")._2, 1.0))
    assert(r("s2")._1.isEmpty && close(r("s2")._2, 0.6))
  }
}
