package graft

import graft.operators.Hierarchy

/** Hierarchy flattening: hand-built trees, forests, and the loud
  * failure modes (cycles, dangling parents, over-depth chains). */
class HierarchySpec extends GraftSpec {
  import spark.implicits._

  private def nodes(rows: (Long, java.lang.Long)*) =
    rows.toSeq.toDF("id", "par")

  test("flattenPaths: hand-built tree — roots, depths, full paths") {
    //      1
    //     / \
    //    2   3
    //   /
    //  4
    val out = Hierarchy.flattenPaths(
      nodes((1L, null), (2L, 1L), (3L, 1L), (4L, 2L)), "id", "par")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Long]("root") == 1 &&
      out(1L).getAs[Long]("depth") == 0 &&
      out(1L).getAs[String]("path") == "1")
    assert(out(4L).getAs[Long]("root") == 1 &&
      out(4L).getAs[Long]("depth") == 2 &&
      out(4L).getAs[String]("path") == "4>2>1")
    assert(out(3L).getAs[String]("path") == "3>1")
    assert(out.values.forall(_.getAs[Boolean]("resolved")))
  }

  test("flattenPaths: a forest keeps each tree's own root") {
    val out = Hierarchy.flattenPaths(
      nodes((1L, null), (2L, 1L), (10L, null), (11L, 10L)), "id", "par")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(2L).getAs[Long]("root") == 1 &&
      out(11L).getAs[Long]("root") == 10)
  }

  test("flattenPaths: cycles and dangling parents surface as resolved=false with null root/path") {
    // 5↔6 is a cycle; 7's parent 99 does not exist; 8 is a clean root
    val out = Hierarchy.flattenPaths(
      nodes((5L, 6L), (6L, 5L), (7L, 99L), (8L, null)), "id", "par")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    Seq(5L, 6L, 7L).foreach { bad =>
      val r = out(bad)
      assert(!r.getAs[Boolean]("resolved"), s"$bad resolved")
      assert(r.isNullAt(r.fieldIndex("root")) &&
        r.isNullAt(r.fieldIndex("path")), s"$bad leaked a garbage path")
    }
    assert(out(8L).getAs[Boolean]("resolved") &&
      out(8L).getAs[Long]("depth") == 0)
  }

  test("flattenPaths: cycle rows freeze once past maxDepth — no exponential path growth at large maxDepth") {
    // maxDepth = 100000 → 17 doubling rounds: without the freeze a
    // cycle node's path doubles every round to ~2^17 spliced entries
    // (eagerly checkpointed each round); with it, path/depth stop
    // growing once depth passes maxDepth, so doomed rows stay O(1).
    // The bound is observable via depth before the final null-out: one
    // last splice at most triples it, so depth must stay well under
    // 4 * maxDepth rather than reaching 2^17 * cycleLen.
    val cyc = nodes((5L, 6L), (6L, 7L), (7L, 5L), (8L, null))
    val out = Hierarchy.flattenPaths(cyc, "id", "par", maxDepth = 100000)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    Seq(5L, 6L, 7L).foreach { bad =>
      assert(!out(bad).getAs[Boolean]("resolved"))
      assert(out(bad).isNullAt(out(bad).fieldIndex("path")))
    }
    assert(out(8L).getAs[Boolean]("resolved"))
  }

  test("flattenPaths: chains deeper than maxDepth are a loud contract violation, shallow ones resolve") {
    // a 40-edge chain 0←1←…←40 with maxDepth 16: depth <= 16 resolves,
    // anything deeper reports false even when doubling happened to
    // collapse it
    val chain = (1L to 40L).map(i => (i, java.lang.Long.valueOf(i - 1))) :+
      ((0L, null.asInstanceOf[java.lang.Long]))
    val out = Hierarchy.flattenPaths(chain.toDF("id", "par"),
        "id", "par", maxDepth = 16)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    (0L to 16L).foreach(i => assert(out(i).getAs[Boolean]("resolved") &&
      out(i).getAs[Long]("depth") == i, s"node $i"))
    (17L to 40L).foreach(i =>
      assert(!out(i).getAs[Boolean]("resolved"), s"node $i resolved"))
  }

  test("treeTranscripts: root-to-leaf texts in order, internal nodes excluded, unresolved leaves dropped") {
    //  1("hi") ← 2("how") ← 4("are")
    //          ← 3("bye")
    // plus a cycle pair 5↔6 whose texts must never surface
    val n = nodes((1L, null), (2L, 1L), (3L, 1L), (4L, 2L),
      (5L, 6L), (6L, 5L))
    val texts = Seq((1L, "hi"), (2L, "how"), (3L, "bye"), (4L, "are"),
      (5L, "X"), (6L, "Y")).toDF("id", "text")
    val out = Hierarchy.treeTranscripts(n, "id", "par",
        texts, "id", "text")
      .collect().map(r => r.getAs[Long]("leaf_id") -> r).toMap
    // leaves are 3 and 4 (1 and 2 are parents; 5/6 unresolved)
    assert(out.keySet == Set(3L, 4L))
    assert(out(4L).getAs[String]("transcript") == "hi | how | are" &&
      out(4L).getAs[Long]("n_turns") == 3 &&
      out(4L).getAs[Long]("root") == 1)
    assert(out(3L).getAs[String]("transcript") == "hi | bye")
    assert(out.values.forall(_.getAs[Long]("n_missing") == 0))
  }

  test("treeTranscripts: a node id missing from texts is loud — n_missing > 0, null transcript, never shortened") {
    val n = nodes((1L, null), (2L, 1L), (3L, 1L), (4L, 2L))
    // node 2 (an INTERIOR node on leaf 4's path) has no text row
    val texts = Seq((1L, "hi"), (3L, "bye"), (4L, "are"))
      .toDF("id", "text")
    val out = Hierarchy.treeTranscripts(n, "id", "par",
        texts, "id", "text")
      .collect().map(r => r.getAs[Long]("leaf_id") -> r).toMap
    val r4 = out(4L)
    assert(r4.getAs[Long]("n_turns") == 3 &&
      r4.getAs[Long]("n_missing") == 1)
    assert(r4.isNullAt(r4.fieldIndex("transcript")),
      s"partial transcript leaked: ${r4.getAs[String]("transcript")}")
    // the unaffected leaf still renders fully
    assert(out(3L).getAs[String]("transcript") == "hi | bye" &&
      out(3L).getAs[Long]("n_missing") == 0)
  }

  test("flattenPaths: heap-rule tree matches a locally computed walk (the gate's shape)") {
    val n = (0L until 100L)
      .map(i => (i, if (i == 0) null else java.lang.Long.valueOf((i - 1) / 2)))
    val out = Hierarchy.flattenPaths(n.toDF("id", "par"), "id", "par")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    def walk(i: Long): List[Long] =
      if (i == 0) List(0L) else i :: walk((i - 1) / 2)
    (0L until 100L).foreach { i =>
      val w = walk(i)
      assert(out(i).getAs[String]("path") == w.mkString(">"), s"node $i")
      assert(out(i).getAs[Long]("depth") == w.length - 1)
      assert(out(i).getAs[Long]("root") == 0)
    }
  }
}
