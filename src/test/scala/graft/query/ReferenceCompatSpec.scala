package graft.query

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import graft.catalog.TableStore
import graft.ingest.DynRecord

/** The reference's own documented/benchmarked queries, VERBATIM, through
  * the engine's SQL surface (reference `internal/metrics/benchmark.go:
  * 350-372`, `docs/SOLUTION.md:429,459`, `README.md:169`) — proves a
  * minIODB user can paste their queries unchanged. */
class ReferenceCompatSpec extends SparkSpec {

  private def engineWithData(): QueryEngine = {
    val store = new TableStore(spark, tmpDir("compat"))
    val now = Instant.now()
    val recent = Timestamp.from(now.minusSeconds(3600))
    val old = Timestamp.from(now.minusSeconds(10 * 24 * 3600))
    store.write("users", Seq(
      DynRecord("user-001", recent, Map("name" -> "u1", "age" -> 30)),
      DynRecord("user-002", recent, Map("name" -> "u2", "age" -> 22)),
      DynRecord("user-003", old, Map("name" -> "u3", "age" -> 45))))
    store.flush("users")
    store.write("orders", Seq(
      DynRecord("o1", recent, Map("user_id" -> "user-001", "amount" -> 10.0)),
      DynRecord("o2", recent, Map("user_id" -> "user-002", "amount" -> 20.0))))
    store.flush("orders")
    new QueryEngine(store)
  }

  test("gate parity with the reference's own injection corpus (query_test.go:207-227)") {
    def blocked(sql: String): Boolean = SqlGate.validate(spark, sql).isLeft
    // the reference's valid queries stay valid
    assert(!blocked("SELECT * FROM users WHERE id = 1"))
    assert(!blocked("SELECT name, email FROM users ORDER BY created_at DESC LIMIT 10"))
    assert(!blocked("SELECT COUNT(*) FROM users GROUP BY status"))
    // quote tautology: allowed in the reference too (it is valid SQL —
    // parameterization, not gating, is the tautology defense)
    assert(!blocked("SELECT * FROM users WHERE id = '1' OR '1'='1'"))
    // every multi-statement / piggybacked-DML case the reference blocks
    assert(blocked("SELECT * FROM users; DELETE FROM users"))
    assert(blocked("SELECT * FROM users; DROP TABLE users"))
    assert(blocked("SELECT * FROM users; INSERT INTO users VALUES (1, 'hacker')"))
    assert(blocked("SELECT * FROM users; UPDATE users SET password = 'hacked'"))
    assert(blocked("SELECT * FROM users; EXEC xp_cmdshell 'dir'"))
    // INTENTIONAL divergences (SqlGate scaladoc): the reference's regex
    // gate bans comments and UNION as injection paranoia; a parser-level
    // gate doesn't need to — a comment can't smuggle a second statement
    // past parsePlan, and UNION is a plain relational operator
    assert(!blocked("SELECT * FROM users--"))
    assert(!blocked("SELECT * FROM users/* comment */"))
    assert(!blocked("SELECT * FROM users UNION SELECT * FROM admins"))
  }

  test("point lookup (reference README.md:169)") {
    val engine = engineWithData()
    val r = engine.executeJson("SELECT * FROM users WHERE id = 'user-001'")
    assert(r.toOption.get.contains("user-001"))
  }

  test("time-relative count (reference benchmark.go:356, NOW() - INTERVAL)") {
    val engine = engineWithData()
    val r = engine.executeJson(
      "SELECT COUNT(*) AS n FROM users WHERE timestamp >= NOW() - INTERVAL '1 day'")
    assert(r.toOption.get == """[{"n":2}]""", r.toString)
  }

  test("hourly distinct (reference benchmark.go:362, DATE_TRUNC + COUNT DISTINCT)") {
    val engine = engineWithData()
    val r = engine.query(
      """SELECT DATE_TRUNC('hour', timestamp) as hour, COUNT(DISTINCT id) AS ids
        |FROM users GROUP BY hour ORDER BY hour""".stripMargin).toOption.get
    assert(r.df.count() >= 1)
  }

  test("join aggregate (reference docs/SOLUTION.md:459)") {
    val engine = engineWithData()
    val r = engine.query(
      """SELECT u.name, COUNT(o.id) AS n FROM users u
        |LEFT JOIN orders o ON u.id = o.user_id
        |GROUP BY u.name ORDER BY u.name""".stripMargin).toOption.get
    val rows = r.df.collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(rows == Seq(("u1", 1L), ("u2", 1L), ("u3", 0L)))
  }

  test("payload-qualified field access (reference docs/SOLUTION.md:836-841)") {
    // the documented single-table spelling: fixed columns flat, dynamic
    // fields via `payload.` — storage is flattened, the view synthesizes
    // the struct
    val engine = engineWithData()
    val r = engine.executeJson(
      """SELECT COUNT(*) AS n FROM users
        |WHERE id = 'user-001' AND timestamp >= '2023-10-01'
        |  AND payload.age > 20""".stripMargin)
    assert(r.toOption.get == """[{"n":1}]""", r.toString)
    // flat access over the same view still works (both spellings coexist)
    val flat = engine.executeJson(
      "SELECT COUNT(*) AS n FROM users WHERE age > 25")
    assert(flat.toOption.get == """[{"n":2}]""", flat.toString) // 30, 45
  }

  test("multi-table payload join, VERBATIM (reference docs/SOLUTION.md:847)") {
    val engine = engineWithData()
    val r = engine.query(
      "SELECT u.payload.name, COUNT(o.id) as order_count FROM users u " +
        "LEFT JOIN orders o ON u.id = o.payload.user_id GROUP BY u.payload.name")
      .toOption.get
    val rows = r.df.collect().map(x => (x.getString(0), x.getLong(1))).toSeq.sorted
    assert(rows == Seq(("u1", 1L), ("u2", 1L), ("u3", 0L)))
  }

  test("nested/list payload values: JSON-text fallback, queryable via payload + JSON funcs") {
    // the reference's payload is a protobuf Struct (SOLUTION.md:965) —
    // arbitrary JSON including nested objects and lists. Its own buffer
    // flattens scalars to typed columns and serializes nested values as
    // UTF8 JSON bytes (concurrent_buffer.go:560-655); the engine mirrors
    // that, so nested access is JSON-FUNCTION access on both systems
    // (DuckDB json_extract_string ↔ Spark get_json_object — dialect
    // delta documented in COVERAGE.md; there is no dotted
    // `payload.profile.city` surface in either engine's storage model)
    val store = new TableStore(spark, tmpDir("compat-nested"))
    val ts = Timestamp.from(Instant.now().minusSeconds(60))
    store.write("profiles", Seq(
      DynRecord("user-123", ts, Map(
        "name" -> "张三", "age" -> 25,
        "profile" -> Map("city" -> "北京", "zip" -> "100000"),
        "tags" -> Seq("vip", "beta"))),
      DynRecord("user-456", ts, Map(
        "name" -> "李四", "age" -> 31,
        "profile" -> Map("city" -> "上海", "zip" -> "200000"),
        "tags" -> Seq("beta")))))
    store.flush("profiles")
    val engine = new QueryEngine(store)
    // nested object → payload.profile is its JSON text; field extraction
    // via get_json_object, reachable through BOTH spellings
    val city = engine.executeJson(
      """SELECT get_json_object(payload.profile, '$.city') AS city
        |FROM profiles WHERE id = 'user-123'""".stripMargin)
    assert(city.toOption.get == """[{"city":"北京"}]""", city.toString)
    // list value → JSON array text; membership via from_json
    val vips = engine.executeJson(
      """SELECT COUNT(*) AS n FROM profiles
        |WHERE array_contains(from_json(payload.tags, 'array<string>'), 'vip')""".stripMargin)
    assert(vips.toOption.get == """[{"n":1}]""", vips.toString)
    // scalar siblings of the nested value still land typed and flat
    val age = engine.executeJson(
      "SELECT COUNT(*) AS n FROM profiles WHERE payload.age > 30")
    assert(age.toOption.get == """[{"n":1}]""", age.toString)
  }

  test("unused payload struct is pruned out of the scan (compat column costs nothing)") {
    val engine = engineWithData()
    val r = engine.query("SELECT id FROM users").toOption.get
    r.df.collect()
    val scans = r.df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(scans.contains("id") && !scans.contains("name"),
      s"payload struct not pruned from scan:\n$scans")
  }

  test("filtered top-N (reference docs/SOLUTION.md:429 shape)") {
    val engine = engineWithData()
    val r = engine.query(
      """SELECT name, age FROM users
        |WHERE age > 20 AND timestamp >= '2024-01-01'
        |ORDER BY age DESC LIMIT 10""".stripMargin).toOption.get
    val ages = r.df.collect().map(_.getAs[Double]("age")).toSeq
    assert(ages == ages.sorted.reverse && ages.nonEmpty)
  }
}
