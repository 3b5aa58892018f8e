package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.types._

/** Oracle-side type hygiene: every oracle SQL's OUTPUT types, as DuckDB
  * will actually produce them, must canonicalize identically to the
  * Spark gate's types under the driver's row-hash comparison.
  *
  * Why this exists: DuckDB promotes `SUM` over integer columns to
  * HUGEINT (int128), which the driver canonicalizes as `12.0` while
  * Spark's int64 prints `12` — every row hash differs even when every
  * value is equal. Exactly this (one bare `SUM(turn_tokens)`) kept
  * `td_sft_assemble` red for two rounds while the Spark output was
  * value-correct. A pure string lint over the SQL can't see column
  * types (a bare `SUM(double_col)` is safe, `ROUND(SUM(int_col))` is
  * not obviously so), so this spec asks DuckDB itself: it `DESCRIBE`s
  * every entry of [[SparkEntry.oracleSql]] against the sf0.001 views
  * (type inference only — no query is executed) and fails on
  *   - any HUGEINT / UHUGEINT output column (canonicalizes with a
  *     fractional rendering that can never match Spark's integer
  *     types; DECIMAL(p,s>0) is float-class — `ROUND(x, 1)` gates are
  *     green against Spark doubles — and is checked as such),
  *   - any numeric column whose integer/float render class differs
  *     from the Spark gate's column of the same name (`12` vs `12.0`),
  *   - any column name present on one side only (the driver sorts
  *     columns by name before hashing, so a name drift is a guaranteed
  *     mismatch),
  *   - any oracle SQL DuckDB cannot analyze at all.
  *
  * The probe shells the sandbox `python3` + `duckdb` (the same engine
  * the driver's correctness gate runs); if either is unavailable the
  * suite cancels rather than fails, so `sbt test` stays portable.
  */
class OracleTypeHygieneSpec extends GraftSpec {

  // The full-audit test below builds all 332 gate frames to read their
  // schemas — like GateHygieneSpec's sweep it is legitimately ~9 min
  // and pinned to the private sweep JVM group in build.sbt; the raised
  // bound still catches a true wedge without failing a slow sweep.
  override val timeLimit: org.scalatest.time.Span =
    org.scalatest.time.Span(1800, org.scalatest.time.Seconds)

  private val tables = Seq("events", "documents", "embeddings",
    "lineitem", "orders", "customer", "supplier", "part", "nation",
    "region")

  private def duckAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb")
        .redirectErrorStream(true).start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  /** name -> (colName -> duckType), or name -> error marker. */
  private def describeAll(sqlDir: Path): Map[String, Either[String, Map[String, String]]] = {
    val script = Files.createTempFile("oracle_describe", ".py")
    Files.writeString(script,
      s"""import duckdb, os, sys
         |sf, d = sys.argv[1], sys.argv[2]
         |con = duckdb.connect()
         |for t in ${tables.map("'" + _ + "'").mkString("[", ",", "]")}:
         |    con.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')" % (t, sf, t))
         |for f in sorted(os.listdir(d)):
         |    if not f.endswith('.sql'): continue
         |    name = f[:-4]
         |    sql = open(os.path.join(d, f)).read()
         |    try:
         |        for col, typ, *_ in con.execute('DESCRIBE ' + sql).fetchall():
         |            print('%s\\t%s\\t%s' % (name, col, typ))
         |    except Exception as e:
         |        print('%s\\tERROR\\t%s' % (name, str(e).replace('\\n', ' ')[:200]))
         |""".stripMargin)
    val pb = new ProcessBuilder("python3", script.toString, sf,
      sqlDir.toString).redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    assert(code == 0, s"duckdb describe probe exited $code:\n$out")
    out.linesIterator.toSeq
      .map(_.split("\t", 3)).collect { case Array(n, c, t) => (n, c, t) }
      .groupBy(_._1).map { case (n, rows) =>
        rows.find(_._2 == "ERROR") match {
          case Some((_, _, msg)) => n -> Left(msg)
          case None => n -> Right(rows.map(r => r._2 -> r._3).toMap)
        }
      }
  }

  private val duckInt =
    Set("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")
  private val duckFloat = Set("FLOAT", "DOUBLE")
  private def duckHazard(t: String): Boolean =
    t == "HUGEINT" || t == "UHUGEINT" ||
      t.startsWith("DECIMAL") && t.endsWith(",0)") || // int-rendering decimal
      // container outputs canonicalize engine-specifically ('[1, 2]' vs
      // '[1 2]' etc.) — no gate emits one today; keep it that way
      t.endsWith("[]") || t.startsWith("STRUCT") || t.startsWith("MAP") ||
      t.startsWith("UNION")

  private def sparkClass(dt: DataType): Option[String] = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
      Some("int")
    case _: FloatType | _: DoubleType => Some("float")
    case _ => None // non-numeric: rendering matches across engines today
  }
  private def duckClass(t: String): Option[String] =
    if (duckInt(t)) Some("int")
    else if (duckFloat(t) || t.startsWith("DECIMAL")) Some("float")
    else None

  /** The full audit over a (name -> oracle SQL) map: DESCRIBE every
    * entry in DuckDB and compare against the Spark schema supplied by
    * `sparkSchemaOf`. Returns the problem list (empty = clean). Both
    * the registry sweep and the planted-violation self-test below run
    * exactly this code path. */
  private def auditProblems(oracles: Map[String, String],
                            sparkSchemaOf: String => StructType): Seq[String] = {
    val sqlDir = Files.createTempDirectory("oracle_sql")
    oracles.foreach { case (name, sql) =>
      Files.writeString(sqlDir.resolve(s"$name.sql"), sql)
    }
    val described = describeAll(sqlDir)
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    oracles.keys.toSeq.sorted.foreach { name =>
      described.get(name) match {
        case None | Some(Left(_)) =>
          problems += s"$name: DuckDB cannot analyze oracle SQL: " +
            described.get(name).flatMap(_.left.toOption).getOrElse("missing")
        case Some(Right(duckCols)) =>
          duckCols.foreach { case (c, t) =>
            if (duckHazard(t))
              problems += s"$name.$c: oracle yields $t (canonicalizes " +
                "fractionally; wrap in CAST(... AS BIGINT/DOUBLE))"
          }
          val sparkCols = sparkSchemaOf(name).fields
            .map(f => f.name -> f.dataType)
          val sparkNames = sparkCols.map(_._1).toSet
          (duckCols.keySet -- sparkNames).foreach(c =>
            problems += s"$name.$c: oracle-only column (name drift)")
          (sparkNames -- duckCols.keySet).foreach(c =>
            problems += s"$name.$c: spark-only column (name drift)")
          sparkCols.foreach { case (c, dt) =>
            for {
              t <- duckCols.get(c) if !duckHazard(t)
              sc <- sparkClass(dt); dc <- duckClass(t) if sc != dc
            } problems += s"$name.$c: spark $dt renders as $sc but " +
              s"oracle $t renders as $dc (12 vs 12.0 hash mismatch)"
          }
      }
    }
    problems.toSeq
  }

  test("planted violations fire: the audit catches each hazard class it exists for — and passes a clean fixture") {
    assume(duckAvailable, "python3+duckdb not on this host; probe skipped")
    def schema(fields: (String, DataType)*): StructType =
      StructType(fields.map { case (n, t) => StructField(n, t) })
    val fixtures = Map(
      // the exact td_sft_assemble killer: bare SUM(int) -> HUGEINT
      "bad_hugeint" -> "SELECT SUM(o_orderkey) AS s FROM orders",
      // spark says column b, oracle says column a
      "bad_drift" -> "SELECT 1 AS a",
      // AVG renders 12.0 on DuckDB while the spark column is int64
      "bad_class" -> "SELECT AVG(o_orderkey) AS v FROM orders",
      // not analyzable at all
      "bad_sql" -> "SELECT FROM nowhere_at_all",
      // a correct gate shape: no findings expected
      "good" -> "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders")
    val schemas = Map(
      "bad_hugeint" -> schema("s" -> LongType),
      "bad_drift" -> schema("b" -> IntegerType),
      "bad_class" -> schema("v" -> LongType),
      "bad_sql" -> schema("x" -> LongType),
      "good" -> schema("n" -> LongType))
    val problems = auditProblems(fixtures, schemas)
    def hit(sub: String) = problems.exists(_.contains(sub))
    assert(hit("bad_hugeint.s: oracle yields HUGEINT"),
      s"HUGEINT lint silent:\n${problems.mkString("\n")}")
    assert(hit("bad_drift.a: oracle-only column") &&
      hit("bad_drift.b: spark-only column"),
      s"name-drift lint silent:\n${problems.mkString("\n")}")
    assert(hit("bad_class.v: spark LongType renders as int"),
      s"render-class lint silent:\n${problems.mkString("\n")}")
    assert(hit("bad_sql: DuckDB cannot analyze"),
      s"analyze-failure lint silent:\n${problems.mkString("\n")}")
    assert(!problems.exists(_.startsWith("good")),
      s"false positive on the clean fixture:\n${problems.mkString("\n")}")
  }

  test("oracle DuckDB output types carry no canonicalization hazard") {
    assume(duckAvailable, "python3+duckdb not on this host; probe skipped")
    val problems = auditProblems(SparkEntry.oracleSql,
      name => SparkEntry.queries(name)(spark, sf).schema)
    assert(problems.isEmpty,
      s"${problems.size} oracle type hazards:\n" + problems.mkString("\n"))
  }
}
