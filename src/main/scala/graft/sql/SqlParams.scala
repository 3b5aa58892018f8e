package graft.sql

/** Named SQL parameters — the reference's query-console binding surface
  * (ref `libs/juava/src/sql-params.ts:6-52`, contract pinned by its own
  * `sql-params.test.ts`): `:name` placeholders rewrite to positional
  * `$N` (numbered by FIRST occurrence; a repeated name shares its
  * index), and `unrollParams` inlines `$N` back to SQL literals — the
  * form [[GuardedSql]] then validates and runs.
  *
  * Two documented hardenings over the reference's regexes (its own test
  * passes under both semantics):
  *  - a placeholder must end at a non-identifier character
  *    (`:id` never claims the `:id` prefix of `:idx`) and must not
  *    follow another `:` (a Postgres-style `x::int` cast is not the
  *    parameter `int`);
  *  - `unrollParams` keeps falsy-but-present values (`0`, `''`) and
  *    escapes embedded quotes AND backslashes (Spark's default parser
  *    processes backslash escapes inside literals, so quote-doubling
  *    alone still lets a value ending in `\` escape the closing quote
  *    and inject into the query), where the reference's
  *    `params[p] || null` JS truthiness silently turns `0`/`''` into
  *    `null` and its quoting never escapes — footguns, not contract
  *    (the test pins only truthy quote-free backslash-free values).
  */
object SqlParams {

  /** `:name` → `$N` with first-occurrence numbering; returns the
    * rewritten query and the values in index order. Array-style
    * callers (already-positional) pass an empty map and get the query
    * back untouched, as the reference's `namedParameters` does. */
  def namedParameters(sql: String, params: Map[String, Any]): (String, Seq[Any]) = {
    if (params.isEmpty) return (sql, Nil)
    val keys = params.keys.toSeq.sortBy(-_.length)
    val re = ("""(?<!:):(""" +
      keys.map(java.util.regex.Pattern.quote).mkString("|") +
      """)(?![A-Za-z0-9_])""").r
    val indexOf = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val out = re.replaceAllIn(sql, m => {
      val name = m.group(1)
      val idx = indexOf.getOrElseUpdate(name, indexOf.size + 1)
      java.util.regex.Matcher.quoteReplacement("$" + idx)
    })
    (out, indexOf.keys.toSeq.map(params))
  }

  /** `$N` → SQL literal (1-based, like the reference): strings quoted
    * with `''`-escaping, numbers/booleans bare, null/missing → NULL. */
  def unrollParams(sql: String, values: Seq[Any]): String =
    """\$(\d+)""".r.replaceAllIn(sql, m => {
      val i = m.group(1).toInt - 1
      val v = if (i >= 0 && i < values.length) values(i) else null
      java.util.regex.Matcher.quoteReplacement(literal(v))
    })

  private def literal(v: Any): String = v match {
    case null | None => "NULL"
    case Some(x) => literal(x)
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Short => n.toString
    case n: Byte => n.toString
    case n: Double => n.toString
    case n: Float => n.toString
    case n: BigDecimal => n.toString
    case n: java.math.BigDecimal => n.toString
    // Backslashes double BEFORE quote doubling: Spark's default parser
    // (escapedStringLiterals=false) processes backslash escapes inside
    // string literals, so an unescaped 'C:\temp' would parse with a tab
    // and a value ending in '\' would escape the closing quote — turning
    // the next param's content into live SQL. With both doublings the
    // literal round-trips byte-exact through the Spark parser.
    case s => "'" + s.toString.replace("\\", "\\\\")
      .replace("'", "''") + "'"
  }

  /** One-step bind: `:name` placeholders inlined as literals — the SQL
    * string a console hands to [[GuardedSql.query]]. */
  def bind(sql: String, params: Map[String, Any]): String = {
    val (q, vs) = namedParameters(sql, params)
    unrollParams(q, vs)
  }
}
