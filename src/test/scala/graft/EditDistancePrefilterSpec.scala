package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Abs, Expression, Levenshtein}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.functions._

class EditDistancePrefilterSpec extends GraftSpec {
  import spark.implicits._

  private val pairs = Seq(
    ("abc", "abc"),      // 0
    ("abc", "abd"),      // 1
    ("abc", "xyz"),      // 3 — same length, fails only via the DP
    ("abc", "abcdef"),   // 3 — length diff alone excludes at k=2
    ("kitten", "sitting"), // 3
    ("flaw", "lawn"))    // 2

  private def cond(df: DataFrame): Expression =
    df.queryExecution.optimizedPlan.collect {
      case f: LFilter => f.condition
    }.head

  // a LocalRelation input would be folded away by ConvertToLocalRelation
  // before the Filter is observable — go through a file scan
  private lazy val stored: DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-edp").toString
    pairs.toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("lev <= k rewrites to banded levenshtein plus ONE length guard") {
    val df = stored.filter(levenshtein(col("a"), col("b")) <= 2)
    val c = cond(df)
    val levs = c.collect { case l: Levenshtein => l }
    assert(levs.nonEmpty && levs.forall(_.threshold.isDefined),
      s"expected banded levenshtein in: $c")
    // exactly one guard even though the optimizer batch runs to fixpoint
    assert(c.collect { case a: Abs => a }.size == 1, s"guards in: $c")
  }

  test("rewritten filter returns exactly the rows the plain predicate " +
    "selects") {
    val df = pairs.toDF("a", "b")
    val got = df.filter(levenshtein(col("a"), col("b")) <= 2)
      .as[(String, String)].collect().toSet
    assert(got == Set(("abc", "abc"), ("abc", "abd"), ("flaw", "lawn")))
    // strict form (< 3 ≡ <= 2) and flipped-literal form agree
    assert(df.filter(levenshtein(col("a"), col("b")) < 3)
      .as[(String, String)].collect().toSet == got)
    assert(df.filter(lit(3) > levenshtein(col("a"), col("b")))
      .as[(String, String)].collect().toSet == got)
    // k = 3 admits the distance-3 pairs the guard/band must NOT cut
    assert(df.filter(levenshtein(col("a"), col("b")) <= 3).count() == 6)
  }

  test("null operands drop the row, with and without the rewrite") {
    val df = Seq((Some("abc"), Some("abd")), (None, Some("x")),
      (Some("y"), None)).toDF("a", "b")
    assert(df.filter(levenshtein(col("a"), col("b")) <= 2).count() == 1)
  }

  test("lev <= k pushed into a JOIN condition is rewritten too (the ER " +
    "blocked-scoring shape)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val other = stored.select(col("a").as("x"), col("b").as("y"))
    val joined = stored.join(other,
      col("a") === col("x") && levenshtein(col("b"), col("y")) <= 2)
    val conds = joined.queryExecution.optimizedPlan.collect {
      case j: LJoin => j.condition
    }.flatten
    assert(conds.nonEmpty)
    val levs = conds.flatMap(_.collect { case l: Levenshtein => l })
    assert(levs.nonEmpty && levs.forall(_.threshold.isDefined),
      s"expected banded levenshtein in join: $conds")
    assert(conds.flatMap(_.collect { case a: Abs => a }).size == 1)
    // and the rewritten join returns what the plain predicate selects
    val expect = pairs.flatMap { case (a, b) =>
      pairs.collect { case (x, y) if a == x && lev(b, y) <= 2 => (a, b, x, y) }
    }.toSet
    assert(joined.as[(String, String, String, String)].collect().toSet
      == expect)
  }

  private def lev(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  test("unbounded or non-literal comparisons are left alone") {
    val df = stored.filter(levenshtein(col("a"), col("b")) <= length(col("a")))
    val c = cond(df)
    assert(c.collect { case l: Levenshtein => l }
      .forall(_.threshold.isEmpty), s"should not rewrite: $c")
  }
}
