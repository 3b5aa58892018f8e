package graft.sinks

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** K2: a real JDBC warehouse destination behind the same `SinkOptions`
  * surface as the parquet [[SinkRouter]] — the relational-warehouse half
  * of the reference's destination list (postgres/mysql/redshift/…,
  * `webapps/console/lib/schema/destinations.tsx:369-617`; bulker applies
  * the same options as CREATE/ALTER/MERGE in its SQL adapters,
  * `bulkerlib/implementations/sql/abstract.go`). The in-sandbox database
  * is embedded Derby (`/opt/spark/jars/derby-*.jar`, zero extra deps);
  * the SQL used (quoted identifiers, ALTER TABLE ADD COLUMN, ANSI MERGE)
  * is the portable subset those warehouses share.
  *
  * Semantics (mirroring [[SinkRouter]]):
  *  - routing by `_table`, snake_case naming unless `keepOriginalNames`,
  *  - schema evolution: new batch columns become `ALTER TABLE ADD COLUMN`
  *    (nullable, so old rows read back as null), gated by `schemaFreeze`;
  *    batch columns missing from the table are fine (Spark's JDBC writer
  *    lists the frame's columns in its INSERT),
  *  - `deduplicate`: latest-row-per-`primaryKey` upsert — the batch is
  *    first collapsed in Spark (hash agg; MERGE forbids two source rows
  *    hitting one target row), bulk-loaded into a staging table, and
  *    applied with one atomic ANSI `MERGE` (update only when the staged
  *    row's `timestampColumn` is at-or-after the stored one — latest
  *    wins, batch beats ties, matching the parquet router).
  *
  * == Scale notes ==
  *
  * `df.write.jdbc` writes each partition through its own connection with
  * batched inserts — `numWritePartitions` caps the fan-in so a 1000-task
  * stage can't open 1000 warehouse connections. The staged-MERGE shape is
  * exactly bulker's "batch" mode; for columnar warehouses the staging
  * step becomes a bulk file load (COPY/PUT) but the MERGE contract is
  * unchanged. Dedup pruning by date window is a file-layout concern of
  * the parquet router; a warehouse MERGE prunes via its primary-key index
  * instead, so `deduplicateWindowDays` is not used here.
  *
  * Durability: the MERGE statement itself is atomic. A crash between the
  * staging load and the MERGE leaves only a staging table behind, which
  * the next write overwrites — appends are at-least-once across partial
  * failures, same honest caveat as the parquet router's multi-table
  * batches.
  */
object JdbcSink {
  /** Max length for string columns. Derby's built-in dialect maps
    * StringType to CLOB, which Derby cannot compare or index — that
    * breaks the MERGE join on the primary key, predicate pushdown, AND
    * null binds into VARCHAR columns (`setNull(CLOB)` raises 22005).
    * Keys and routed event fields are short; genuinely long payloads
    * belong in the parquet sink, not a relational row store. */
  val VarcharLen = 4096

  /** A Derby dialect with VARCHAR strings, registered ahead of Spark's
    * built-in one (registered dialects take precedence). Idempotent. */
  private lazy val registerDialect: Unit =
    JdbcDialects.registerDialect(new org.apache.spark.sql.jdbc.JdbcDialect {
      override def canHandle(url: String): Boolean =
        url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:derby")
      override def getJDBCType(dt: DataType): Option[org.apache.spark.sql.jdbc.JdbcType] =
        dt match {
          case StringType => Some(org.apache.spark.sql.jdbc.JdbcType(
            s"VARCHAR($VarcharLen)", java.sql.Types.VARCHAR))
          case BooleanType => Some(org.apache.spark.sql.jdbc.JdbcType(
            "BOOLEAN", java.sql.Types.BOOLEAN))
          case _ => None
        }
    })
}

class JdbcSink(url: String, options: SinkOptions = SinkOptions(),
               numWritePartitions: Int = 4) {
  JdbcSink.registerDialect

  // Derby (like most databases) folds unquoted identifiers to UPPER;
  // Spark's JDBC writer passes the table name through unquoted but
  // quotes COLUMN names, so tables are stored folded and columns exact.
  private def storedTableName(table: String) = table.toUpperCase
  private def q(id: String) = "\"" + id.replace("\"", "\"\"") + "\""

  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def tableExists(c: Connection, table: String): Boolean = {
    val rs = c.getMetaData.getTables(null, null, storedTableName(table), null)
    try rs.next() finally rs.close()
  }

  /** Column names as stored (exact case — Spark quoted them at CREATE). */
  private def tableColumns(c: Connection, table: String): Seq[String] = {
    val rs = c.getMetaData.getColumns(null, null, storedTableName(table), null)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    try { while (rs.next()) out += rs.getString("COLUMN_NAME") } finally rs.close()
    out.toSeq
  }

  /** Database column type for a Spark type: the (VARCHAR-string) dialect
    * registered above, then the common ANSI mapping (a dialect only
    * carries overrides; Spark's CREATE falls back the same way). */
  private def sqlType(dt: DataType): String =
    JdbcDialects.get(url).getJDBCType(dt).map(_.databaseTypeDefinition)
      .getOrElse(dt match {
        case LongType => "BIGINT"
        case IntegerType => "INTEGER"
        case FloatType => "REAL"
        case DoubleType => "DOUBLE PRECISION"
        case TimestampType => "TIMESTAMP"
        case DateType => "DATE"
        case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
        case other => throw new IllegalArgumentException(
          s"no JDBC type mapping for $other")
      })

  private def jdbcWriter(df: DataFrame) =
    df.coalesce(numWritePartitions).write
      .option("batchsize", "10000") // batched inserts, commit per partition

  /** Route one batch by `_table` — same contract as SinkRouter.write. */
  def write(batch: DataFrame): Unit = {
    val cached = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tables = cached.select(col("_table")).distinct()
        .collect().map(_.getString(0))
      tables.foreach { t =>
        writeTable(cached.filter(col("_table") === t).drop("_table"), t)
      }
    } finally cached.unpersist(false)
  }

  private def writeTable(rows: DataFrame, table: String): Unit = {
    val base =
      if (options.keepOriginalNames) rows
      else graft.functions.Scalars.snakeCaseSchema(rows)
    // collapse the batch to latest-per-key BEFORE the merge: ANSI MERGE
    // raises a cardinality violation if two source rows match one target
    // row, and the collapse is a cheap map-side-partial hash agg
    val df =
      if (!options.deduplicate) base
      else {
        val cols = base.columns
        // struct-wrapped ordering: null timestamps rank lowest instead of
        // being skipped by max_by's null handling
        base.groupBy(col(options.primaryKey))
          .agg(max_by(struct(cols.map(col): _*),
            struct(col(options.timestampColumn))).as("_r"))
          .select(col("_r.*"))
      }
    val exists = withConn(c => tableExists(c, table))
    if (!exists) {
      jdbcWriter(df).mode(SaveMode.Append).jdbc(url, table, props)
      // dedup tables merge on the primary key every batch: without an
      // index the MERGE join is a nested loop over the whole table
      // (O(batch x table) — 60s+ at 10k x 10k), with it an index lookup
      // per staged key. Real warehouses get this from their PK/cluster
      // key; Derby needs the index spelled out.
      if (options.deduplicate && df.columns.contains(options.primaryKey))
        withConn { c =>
          val st = c.createStatement()
          try st.executeUpdate(
            s"CREATE INDEX ${storedTableName(table)}_PK_IDX ON " +
              s"${storedTableName(table)} (${q(options.primaryKey)})")
          finally st.close()
        }
    } else {
      val existing = withConn(c => tableColumns(c, table))
      val existingSet = existing.toSet
      val newCols = df.columns.filterNot(existingSet)
      if (newCols.nonEmpty) {
        if (options.schemaFreeze)
          throw new IllegalStateException(
            s"schemaFreeze: new columns ${newCols.mkString(",")} rejected")
        withConn { c =>
          newCols.foreach { nc =>
            val st = c.createStatement()
            try st.executeUpdate(
              s"ALTER TABLE ${storedTableName(table)} ADD COLUMN ${q(nc)} " +
                sqlType(df.schema(nc).dataType))
            finally st.close()
          }
        }
      }
      if (!options.deduplicate)
        jdbcWriter(df).mode(SaveMode.Append).jdbc(url, table, props)
      else mergeVia(df, table)
    }
  }

  private def mergeVia(df: DataFrame, table: String): Unit = {
    val stage = s"${table}_stage"
    jdbcWriter(df).mode(SaveMode.Overwrite).jdbc(url, stage, props)
    val pk = options.primaryKey
    val ts = options.timestampColumn
    val cols = df.columns
    val updatable = cols.filterNot(_ == pk)
    val t = storedTableName(table); val s = storedTableName(stage)
    // a key-only table has nothing to update — emit an insert-only
    // MERGE instead of the syntactically invalid "UPDATE SET "
    val matched =
      if (updatable.isEmpty) ""
      else s"""WHEN MATCHED AND (t.${q(ts)} IS NULL OR s.${q(ts)} >= t.${q(ts)})
           |  THEN UPDATE SET ${updatable.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")}
           |""".stripMargin
    val merge =
      s"""MERGE INTO $t t USING $s s ON t.${q(pk)} = s.${q(pk)}
         |${matched}WHEN NOT MATCHED
         |  THEN INSERT (${cols.map(q).mkString(", ")})
         |  VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})""".stripMargin
    withConn { c =>
      val st = c.createStatement()
      try {
        st.executeUpdate(merge)
        st.executeUpdate(s"DROP TABLE $s")
      } finally st.close()
    }
  }

  /** Read a routed table back (Spark's JDBC source — predicate pushdown
    * and column pruning reach the database). */
  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.read.jdbc(url, storedTableName(table), props)

  /** Every user table in the warehouse (Derby user schema). */
  def listTables: Seq[String] = withConn { c =>
    val rs = c.getMetaData.getTables(null, null, "%", Array("TABLE"))
    val out = scala.collection.mutable.ArrayBuffer[String]()
    try {
      while (rs.next())
        if (rs.getString("TABLE_SCHEM") != null &&
            !rs.getString("TABLE_SCHEM").startsWith("SYS"))
          out += rs.getString("TABLE_NAME")
    } finally rs.close()
    out.toSeq.sorted
  }

  /** GDPR erasure on the JDBC warehouse — the parity point with
    * [[SinkRouter.deleteWhere]], but pushed down as ONE SQL DELETE: the
    * database's native O(matching rows) path (its own indexes/log do
    * the work the file warehouse does with a partition rewrite).
    * `predicateSql` is a SQL boolean over the table's columns; returns
    * rows deleted. */
  def deleteWhere(table: String, predicateSql: String): Long = withConn { c =>
    if (!tableExists(c, table)) 0L
    else {
      val st = c.createStatement()
      try st.executeUpdate(
        s"DELETE FROM ${q(storedTableName(table))} WHERE $predicateSql")
        .toLong
      finally st.close()
    }
  }

  /** Subject-access export (Art. 15) across the JDBC warehouse — the
    * [[SinkRouter.exportSubject]] parity: all rows whose `keyCol`
    * equals `keyValue`, from every table that carries the column, as
    * (tbl, row_json). The equality predicate pushes into each table's
    * JDBC scan. */
  def exportSubject(spark: SparkSession, keyCol: String,
                    keyValue: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val frames = listTables.flatMap { t =>
      val cols = withConn(c => tableColumns(c, t))
      cols.find(_.equalsIgnoreCase(keyCol)).map { kc =>
        readTable(spark, t)
          .filter(col(s"`$kc`") === keyValue)
          .select(lit(t.toLowerCase).as("tbl"),
            to_json(struct(col("*"))).as("row_json"))
      }
    }
    frames.reduceOption(_ unionByName _).getOrElse(
      spark.range(0).select(lit("").as("tbl"), lit("").as("row_json")))
  }
}
