package graft.sql

/** Generates the exact SQL strings the reference engine pushes down to the
  * source database.
  *
  * Semantics re-expressed from spotify/dbeam (see
  * `/root/reference/dbeam-core/src/main/java/com/spotify/dbeam/args/QueryBuilder.java:30-253`):
  *   - table base: `SELECT * FROM <table> WHERE 1=1`
  *   - user-query base: `SELECT * FROM (<sql>) as user_sql_query WHERE 1=1`
  *     with a single trailing `;` (plus trailing whitespace) stripped
  *     (`QueryBuilder.java:202-206`)
  *   - conditions are appended conjunctively as ` AND <cond>`
  *   - `LIMIT n` appended last (`QueryBuilder.java:208-211`)
  *   - MIN/MAX rewrite keeps the FROM/WHERE and swaps the select clause
  *     (`QueryBuilder.java:243-252`)
  *
  * Pure string logic — no Spark, no JDBC — so it is golden-testable offline.
  */
final case class QueryBuilder private (
    private val baseSql: String,
    private val conditions: Vector[String],
    private val limit: Option[Long]
) {

  /** Append a raw conjunctive condition. */
  def withCondition(cond: String): QueryBuilder =
    copy(conditions = conditions :+ cond)

  /** Calendar-partition filter: `AND <col> >= '<start>' AND <col> < '<end>'`
    * (reference `QueryBuilder.java:142-159`).
    */
  def withPartitionCondition(col: String, startInclusive: String, endExclusive: String): QueryBuilder =
    withCondition(s"$col >= '$startInclusive' AND $col < '$endExclusive'")

  /** Split-range filter: `AND <col> >= <lo> AND <col> </<= <hi>`; the final
    * range of a split set is end-inclusive (reference `QueryBuilder.java:161-187`).
    */
  def withParallelizationCondition(col: String, startInclusive: Long, end: Long, endExclusive: Boolean): QueryBuilder =
    withCondition(s"$col >= $startInclusive AND $col ${if (endExclusive) "<" else "<="} $end")

  def withLimit(n: Long): QueryBuilder = copy(limit = Some(n))

  /** MIN/MAX bounds probe over the same FROM + WHERE (reference
    * `QueryBuilder.java:243-252`, `ParallelQueryBuilder.java:46-79`).
    */
  def minMaxQuery(splitColumn: String, minAlias: String = "min_s", maxAlias: String = "max_s"): QueryBuilder = {
    val select = s"SELECT MIN($splitColumn) as $minAlias, MAX($splitColumn) as $maxAlias"
    // NB: the reference keeps any LIMIT on the min/max probe
    // (`QueryBuilder.java:243-252` passes `this.limitStr` through).
    copy(baseSql = select + baseSql.substring(baseSql.indexOf(" FROM ")))
  }

  def build: String =
    baseSql +
      conditions.map(c => s" AND $c").mkString +
      limit.map(n => s" LIMIT $n").getOrElse("")

  override def toString: String = build
}

object QueryBuilder {

  /** Valid table names per reference `QueryBuilderArgs.java:92-105`. */
  private val TableNamePattern = "^[a-zA-Z_][a-zA-Z0-9_.]*$".r

  def isValidTableName(t: String): Boolean =
    t != null && TableNamePattern.matches(t)

  def fromTable(tableName: String): QueryBuilder = {
    require(tableName != null, "TableName cannot be null")
    require(isValidTableName(tableName), "'table' must follow [a-zA-Z_][a-zA-Z0-9_.]*")
    QueryBuilder(s"SELECT * FROM $tableName WHERE 1=1", Vector.empty, None)
  }

  def fromSqlQuery(sql: String): QueryBuilder = {
    val cleaned = stripTrailingSemicolon(sql)
    QueryBuilder(s"SELECT * FROM ($cleaned) as user_sql_query WHERE 1=1", Vector.empty, None)
  }

  /** One trailing `;` (with trailing whitespace preserved after removal) —
    * reference `QueryBuilder.java:202-206`.
    */
  def stripTrailingSemicolon(sql: String): String =
    sql.replaceAll(";([\\s]*)$", "$1")
}
