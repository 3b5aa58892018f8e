package graft

import java.nio.file.Files

import graft.sinks.CommitLog

/** The shared commit protocol's executor, driven directly: manifest
  * atomicity, idempotent roll-forward from every interruption point,
  * inert pre-manifest staging, and multi-manifest recovery. The three
  * consumers (SinkRouter swap, batch compaction, ANN rebuild) are
  * crash-tested end-to-end in their own specs; this spec pins the
  * executor semantics they all assume. */
class CommitLogSpec extends GraftSpec {

  private def tmp() = Files.createTempDirectory("cl-spec").toString

  private def mkDir(root: String, name: String, marker: String): Unit = {
    val d = new java.io.File(root, name)
    d.mkdirs()
    Files.write(new java.io.File(d, "data").toPath,
      marker.getBytes("UTF-8")); ()
  }
  private def readMarker(root: String, name: String): Option[String] = {
    val f = new java.io.File(new java.io.File(root, name), "data")
    if (f.exists())
      Some(new String(Files.readAllBytes(f.toPath), "UTF-8"))
    else None
  }

  test("commit executes deletes, guarded renames (with clearFirst), cleanup, and drops the manifest") {
    val root = tmp()
    mkDir(root, "old1", "old1")
    mkDir(root, "live/sub", "oldsub")
    mkDir(root, ".staged-a", "new-a")
    mkDir(root, ".staged-b", "new-b")
    mkDir(root, ".scratch", "scratch")
    CommitLog.commit(spark, root, "t1", CommitLog.Swap(
      deletes = Seq("old1"),
      renames = Seq(
        CommitLog.Rename(".staged-a", "live/sub", clearFirst = Seq("live")),
        CommitLog.Rename(".staged-b", "fresh")),
      cleanup = Seq(".scratch")))
    assert(readMarker(root, "old1").isEmpty)
    assert(readMarker(root, "live/sub").contains("new-a"))
    assert(readMarker(root, "fresh").contains("new-b"))
    assert(!new java.io.File(root, ".scratch").exists())
    assert(!new java.io.File(root, ".commit-t1").exists())
    assert(!new java.io.File(root, ".staged-a").exists())
  }

  test("recover rolls forward idempotently from EVERY interruption point") {
    // replay the same persisted swap against progressively more
    // completed states — every replay must converge to the same end
    // state without resurrecting deleted dirs or double-applying
    val swap = CommitLog.Swap(
      deletes = Seq("old"),
      renames = Seq(CommitLog.Rename(".st", "live")))
    val body = // what commit would persist
      """{"deletes":["old"],"renames":[{"staged":".st","live":"live","clear":[]}],"cleanup":[]}"""
    def crashState(steps: Int): String = {
      val root = tmp()
      Files.write(new java.io.File(root, ".commit-x").toPath,
        body.getBytes("UTF-8"))
      // step 0: nothing executed yet
      if (steps < 1) { mkDir(root, "old", "old"); mkDir(root, ".st", "new")
        mkDir(root, "live", "prior") }
      // step 1: deletes done
      else if (steps < 2) { mkDir(root, ".st", "new"); mkDir(root, "live", "prior") }
      // step 2: live cleared, rename not yet run
      else if (steps < 3) { mkDir(root, ".st", "new") }
      // step 3: rename done, manifest not yet dropped
      else { mkDir(root, "live", "new") }
      root
    }
    (0 to 3).foreach { steps =>
      val root = crashState(steps)
      CommitLog.recover(spark, root)
      assert(readMarker(root, "old").isEmpty, s"step $steps: old survived")
      assert(readMarker(root, "live").contains("new"), s"step $steps")
      assert(!new java.io.File(root, ".commit-x").exists(), s"step $steps")
      // a SECOND recover is a no-op on the healthy table
      CommitLog.recover(spark, root)
      assert(readMarker(root, "live").contains("new"), s"step $steps re-run")
    }
  }

  test("pre-manifest staging is inert: recover never swaps without a commit point") {
    val root = tmp()
    mkDir(root, "live", "prior")
    mkDir(root, ".st", "new")
    CommitLog.recover(spark, root)
    assert(readMarker(root, "live").contains("prior"))
    assert(readMarker(root, ".st").contains("new")) // left for overwrite
  }

  test("recover completes multiple independent manifests on one root") {
    val root = tmp()
    mkDir(root, ".sa", "a"); mkDir(root, ".sb", "b")
    Files.write(new java.io.File(root, ".commit-a").toPath,
      """{"deletes":[],"renames":[{"staged":".sa","live":"la","clear":[]}],"cleanup":[]}"""
        .getBytes("UTF-8"))
    Files.write(new java.io.File(root, ".commit-b").toPath,
      """{"deletes":[],"renames":[{"staged":".sb","live":"lb","clear":[]}],"cleanup":[]}"""
        .getBytes("UTF-8"))
    CommitLog.recover(spark, root)
    assert(readMarker(root, "la").contains("a"))
    assert(readMarker(root, "lb").contains("b"))
    assert(!new java.io.File(root, ".commit-a").exists())
    assert(!new java.io.File(root, ".commit-b").exists())
  }

  test("a .tmp manifest (crash mid-manifest-write) is ignored") {
    val root = tmp()
    mkDir(root, "live", "prior"); mkDir(root, ".st", "new")
    Files.write(new java.io.File(root, ".commit-x.tmp").toPath,
      """{"deletes":["live"],"renames":[],"cleanup":[]}""".getBytes("UTF-8"))
    CommitLog.recover(spark, root)
    assert(readMarker(root, "live").contains("prior"))
  }
}
