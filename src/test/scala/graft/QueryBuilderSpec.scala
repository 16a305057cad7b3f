package graft

import java.time.{Duration, Instant, Period}

import org.scalatest.funsuite.AnyFunSuite

import graft.args.{ArgParsers, QueryArgs}
import graft.sql.{ParallelRanges, QueryBuilder}

/** Golden SQL-generation tests ported from the reference's expectations
  * (`args/QueryBuilderArgsTest.java:80-292`, `args/QueryBuilderTest.java`,
  * `args/ParallelQueryBuilderTest.java:38-105`).
  */
class QueryBuilderSpec extends AnyFunSuite {

  test("table scan base query") {
    assert(QueryBuilder.fromTable("some_table").build ==
      "SELECT * FROM some_table WHERE 1=1")
  }

  test("table name validation") {
    assertThrows[IllegalArgumentException](QueryBuilder.fromTable("*invalid#name@!"))
    assertThrows[IllegalArgumentException](QueryBuilder.fromTable(null))
    QueryBuilder.fromTable("foo.bar") // dots allowed
    QueryBuilder.fromTable("_underscore_first")
  }

  test("user query wrap") {
    assert(QueryBuilder.fromSqlQuery("SELECT * FROM some_table").build ==
      "SELECT * FROM (SELECT * FROM some_table) as user_sql_query WHERE 1=1")
  }

  test("user query strips one trailing semicolon") {
    assert(QueryBuilder.fromSqlQuery("SELECT * FROM t;").build ==
      "SELECT * FROM (SELECT * FROM t) as user_sql_query WHERE 1=1")
    assert(QueryBuilder.fromSqlQuery("SELECT * FROM t;  \n").build ==
      "SELECT * FROM (SELECT * FROM t  \n) as user_sql_query WHERE 1=1")
  }

  test("user query keeps CTEs and inner semicolons intact") {
    val cte = "WITH cte AS (SELECT 1 AS x) SELECT * FROM cte"
    assert(QueryBuilder.fromSqlQuery(cte).build ==
      s"SELECT * FROM ($cte) as user_sql_query WHERE 1=1")
  }

  test("limit appended") {
    assert(QueryBuilder.fromTable("some_table").withLimit(7).build ==
      "SELECT * FROM some_table WHERE 1=1 LIMIT 7")
  }

  test("limit-one schema probe") {
    val args = QueryArgs(QueryBuilder.fromTable("some_table"))
    assert(args.sqlQueryWithLimitOne == "SELECT * FROM some_table WHERE 1=1 LIMIT 1")
  }

  test("partition column filter, daily default") {
    val args = QueryArgs(
      QueryBuilder.fromTable("some_table"),
      partitionColumn = Some("col"),
      partition = Some(Instant.parse("2027-07-31T00:00:00Z")))
    assert(args.buildQueries(_ => fail("no bounds expected")) == Vector(
      "SELECT * FROM some_table WHERE 1=1 AND col >= '2027-07-31' AND col < '2027-08-01'"))
  }

  test("partition column filter + limit") {
    val args = QueryArgs(
      QueryBuilder.fromTable("some_table"),
      limit = Some(5),
      partitionColumn = Some("col"),
      partition = Some(Instant.parse("2027-07-31T00:00:00Z")))
    assert(args.buildQueries(_ => fail()) == Vector(
      "SELECT * FROM some_table WHERE 1=1 AND col >= '2027-07-31' AND col < '2027-08-01' LIMIT 5"))
  }

  test("monthly partition period") {
    val args = QueryArgs(
      QueryBuilder.fromTable("some_table"),
      partitionColumn = Some("col"),
      partition = Some(Instant.parse("2027-07-31T00:00:00Z")),
      partitionPeriod = Period.ofMonths(1))
    assert(args.buildQueries(_ => fail()) == Vector(
      "SELECT * FROM some_table WHERE 1=1 AND col >= '2027-07-31' AND col < '2027-08-31'"))
  }

  test("hourly (sub-daily) partition period uses full ISO instants") {
    val args = QueryArgs(
      QueryBuilder.fromTable("some_table"),
      partitionColumn = Some("col"),
      partition = Some(Instant.parse("2027-07-31T00:00:00Z")),
      partitionPeriod = Duration.ofHours(1))
    assert(args.buildQueries(_ => fail()) == Vector(
      "SELECT * FROM some_table WHERE 1=1 AND col >= '2027-07-31T00:00:00Z' AND col < '2027-07-31T01:00:00Z'"))
  }

  test("sql file query with partition + limit") {
    val args = QueryArgs(
      QueryBuilder.fromSqlQuery("SELECT * FROM COFFEES WHERE SIZE > 10"),
      limit = Some(7),
      partitionColumn = Some("col"),
      partition = Some(Instant.parse("2027-07-31T00:00:00Z")))
    assert(args.buildQueries(_ => fail()) == Vector(
      "SELECT * FROM (SELECT * FROM COFFEES WHERE SIZE > 10) as user_sql_query WHERE 1=1" +
        " AND col >= '2027-07-31' AND col < '2027-08-01' LIMIT 7"))
  }

  // --- range splitting (ParallelQueryBuilderTest goldens) ---

  private val tab = QueryBuilder.fromTable("tab")

  test("ranges 100..400 / 3") {
    assert(ParallelRanges.queriesForBounds(100, 400, 3, "sp", tab) == Vector(
      "SELECT * FROM tab WHERE 1=1 AND sp >= 100 AND sp < 200",
      "SELECT * FROM tab WHERE 1=1 AND sp >= 200 AND sp < 300",
      "SELECT * FROM tab WHERE 1=1 AND sp >= 300 AND sp <= 400"))
  }

  test("ranges 100..402 / 5 (uneven)") {
    assert(ParallelRanges.queriesForBounds(100, 402, 5, "sp", tab) == Vector(
      "SELECT * FROM tab WHERE 1=1 AND sp >= 100 AND sp < 161",
      "SELECT * FROM tab WHERE 1=1 AND sp >= 161 AND sp < 222",
      "SELECT * FROM tab WHERE 1=1 AND sp >= 222 AND sp < 283",
      "SELECT * FROM tab WHERE 1=1 AND sp >= 283 AND sp < 344",
      "SELECT * FROM tab WHERE 1=1 AND sp >= 344 AND sp <= 402"))
  }

  test("degenerate ranges collapse to one query") {
    assert(ParallelRanges.queriesForBounds(1, 2, 5, "sp", tab) ==
      Vector("SELECT * FROM tab WHERE 1=1 AND sp >= 1 AND sp <= 2"))
    assert(ParallelRanges.queriesForBounds(1, 1, 5, "sp", tab) ==
      Vector("SELECT * FROM tab WHERE 1=1 AND sp >= 1 AND sp <= 1"))
    assert(ParallelRanges.queriesForBounds(1, 10, 1, "sp", tab) ==
      Vector("SELECT * FROM tab WHERE 1=1 AND sp >= 1 AND sp <= 10"))
  }

  test("limit divided across splits by integer division") {
    // reference QueryBuilderArgs.java:133-137
    val args = QueryArgs(
      QueryBuilder.fromTable("tab"),
      limit = Some(10),
      splitColumn = Some("sp"),
      queryParallelism = Some(3))
    val qs = args.buildQueries(_ => (0L, 9L))
    assert(qs.forall(_.endsWith(" LIMIT 3")))
    assert(qs.size == 3)
  }

  test("min/max probe query") {
    val args = QueryArgs(QueryBuilder.fromTable("COFFEES"))
    assert(args.minMaxSql("ROWNUM") ==
      "SELECT MIN(ROWNUM) as min_s, MAX(ROWNUM) as max_s FROM COFFEES WHERE 1=1")
  }

  test("min/max probe on user query keeps wrapping") {
    val args = QueryArgs(QueryBuilder.fromSqlQuery("SELECT * FROM COFFEES WHERE SIZE > 10"))
    assert(args.minMaxSql("ROWNUM") ==
      "SELECT MIN(ROWNUM) as min_s, MAX(ROWNUM) as max_s FROM" +
        " (SELECT * FROM COFFEES WHERE SIZE > 10) as user_sql_query WHERE 1=1")
  }

  test("parallelism coupling validated") {
    assertThrows[IllegalArgumentException](
      QueryArgs(QueryBuilder.fromTable("t"), queryParallelism = Some(3)))
    assertThrows[IllegalArgumentException](
      QueryArgs(QueryBuilder.fromTable("t"), splitColumn = Some("sp")))
    assertThrows[IllegalArgumentException](
      QueryArgs(QueryBuilder.fromTable("t"), splitColumn = Some("sp"), queryParallelism = Some(0)))
  }
}

/** Flexible instant / period parsing — reference
  * `options/JdbcExportArgsFactory.java:47-59,142-150` and
  * `args/QueryBuilderArgsTest.java:99-138`.
  */
class ArgParsersSpec extends AnyFunSuite {

  test("date-only partition") {
    assert(ArgParsers.parseInstant("2027-07-31") == Instant.parse("2027-07-31T00:00:00Z"))
  }
  test("full ISO partition") {
    assert(ArgParsers.parseInstant("2027-07-31T13:37:59Z") == Instant.parse("2027-07-31T13:37:59Z"))
  }
  test("month-only partition defaults day 1") {
    assert(ArgParsers.parseInstant("2027-05") == Instant.parse("2027-05-01T00:00:00Z"))
  }
  test("hourly partition") {
    assert(ArgParsers.parseInstant("2027-05-02T23") == Instant.parse("2027-05-02T23:00:00Z"))
  }
  test("year-only partition") {
    assert(ArgParsers.parseInstant("2027") == Instant.parse("2027-01-01T00:00:00Z"))
  }

  test("period vs duration parse") {
    assert(ArgParsers.parsePeriodOrDuration("P1D") == Period.ofDays(1))
    assert(ArgParsers.parsePeriodOrDuration("P1M") == Period.ofMonths(1))
    assert(ArgParsers.parsePeriodOrDuration("PT1H") == Duration.ofHours(1))
    assert(ArgParsers.parsePeriodOrDuration("PT30M") == Duration.ofMinutes(30))
  }

  test("partition freshness gate") {
    val now = Instant.parse("2027-08-10T00:00:00Z")
    // partition too old: > 2 periods behind
    assertThrows[IllegalArgumentException](
      ArgParsers.validatePartitionFreshness(
        Some(Instant.parse("2027-08-01T00:00:00Z")), None, Period.ofDays(1), skipCheck = false, None, now))
    // recent enough
    ArgParsers.validatePartitionFreshness(
      Some(Instant.parse("2027-08-09T00:00:00Z")), None, Period.ofDays(1), skipCheck = false, None, now)
    // bypassed with skipCheck
    ArgParsers.validatePartitionFreshness(
      Some(Instant.parse("2020-01-01T00:00:00Z")), None, Period.ofDays(1), skipCheck = true, None, now)
    // not applied when partitionColumn present
    ArgParsers.validatePartitionFreshness(
      Some(Instant.parse("2020-01-01T00:00:00Z")), Some("col"), Period.ofDays(1), skipCheck = false, None, now)
  }

  test("r15: monthly/yearly partition periods run the freshness gate instead of throwing") {
    val now = Instant.parse("2027-08-10T00:00:00Z")
    // Instant.minus(Period.ofMonths) throws UnsupportedTemporalTypeException;
    // the gate must route through OffsetDateTime like the reference
    // (JdbcExportArgsFactory.java:102-108) — a recent monthly partition passes...
    ArgParsers.validatePartitionFreshness(
      Some(Instant.parse("2027-07-01T00:00:00Z")), None, Period.ofMonths(1), skipCheck = false, None, now)
    // ...an old one fails the GATE (IllegalArgumentException, exit 43),
    // never an UnsupportedTemporalTypeException (exit 49)
    assertThrows[IllegalArgumentException](
      ArgParsers.validatePartitionFreshness(
        Some(Instant.parse("2027-05-01T00:00:00Z")), None, Period.ofMonths(1), skipCheck = false, None, now))
    // yearly periods take the same path
    ArgParsers.validatePartitionFreshness(
      Some(Instant.parse("2026-01-01T00:00:00Z")), None, Period.ofYears(1), skipCheck = false, None, now)
  }
}
