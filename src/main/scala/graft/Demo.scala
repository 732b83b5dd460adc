package graft

import java.sql.Timestamp

import graft.catalog.TableStore
import graft.core.GraftSession
import graft.ingest.DynRecord
import graft.maintain.Compaction
import graft.mutate.Mutations
import graft.query.QueryEngine

/** End-to-end walkthrough of the engine's service surface (the
  * reference's WriteData → QueryData → DeleteData → compaction loop),
  * driven through the public API. Run: runMain graft.Demo [rootDir] */
object Demo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val spark = GraftSession.local("graft-demo", 8)
    val store = new TableStore(spark, root)
    val engine = new QueryEngine(store)
    val mut = new Mutations(store)

    def ts(s: String) = Timestamp.valueOf(s)
    println(s"== root: $root")

    // 1. schemaless ingest, mixed payloads (implicit table creation)
    store.write("users", Seq(
      DynRecord("u1", ts("2024-01-01 10:00:00"), Map("name" -> "ann", "age" -> 31, "tags" -> Seq("a", "b"))),
      DynRecord("u2", ts("2024-01-02 11:00:00"), Map("name" -> "bob", "email" -> "b@x.io"))))
    println("== hybrid query (rows still in buffer):")
    println(engine.executeJson("SELECT id, name, age FROM users ORDER BY id").merge)

    // 2. flush → parquet; query via SQL with aggregation
    store.flush("users")
    store.write("orders", Seq(
      DynRecord("o1", ts("2024-01-05 00:00:00"), Map("user_id" -> "u1", "amount" -> 10.5)),
      DynRecord("o2", ts("2024-01-05 00:01:00"), Map("user_id" -> "u1", "amount" -> 4.5)),
      DynRecord("o3", ts("2024-01-06 00:00:00"), Map("user_id" -> "u2", "amount" -> 7.0))))
    store.flush("orders")
    println("== join+agg:")
    println(engine.executeJson(
      """SELECT u.name, SUM(o.amount) AS total
        |FROM users u JOIN orders o ON u.id = o.user_id
        |GROUP BY u.name ORDER BY total DESC""".stripMargin).merge)

    // 3. SQL gate rejects DML
    println("== gate on DML: " + engine.executeJson("DROP TABLE users").left.getOrElse("?"))

    // 4. point delete (partition-scoped rewrite)
    println(s"== delete u1: removed ${mut.deleteById("users", "u1")} row(s)")
    println(engine.executeJson("SELECT id, name FROM users ORDER BY id").merge)

    // 5. compaction
    (1 to 5).foreach { i =>
      store.write("users", Seq(DynRecord(s"u$i$i", ts("2024-01-07 00:00:00"), Map("name" -> s"n$i"))))
      store.flush("users")
    }
    val comp = new Compaction(store, minFiles = 3)
    val (p, fb, fa) = comp.compact("users")
    println(s"== compaction: $p partition(s), $fb files -> $fa")
    println(engine.executeJson("SELECT count(*) AS n FROM users").merge)

    // 6. full service facade: write with generated id, backup/restore, metrics
    val svc = new graft.serve.ServiceFacade(store)
    val w = svc.writeData("users", DynRecord("", ts("2024-01-08 00:00:00"), Map("name" -> "gen")))
    println(s"== facade write, generated id: ${w.id.take(13)}…")
    val backupDir = root + "-backup"
    println(s"== backup: ${svc.backup("users", backupDir)} files")
    svc.deleteData("users", w.id)
    svc.restore("users", backupDir)
    println("== after restore: " + svc.queryData("SELECT count(*) AS n FROM users").merge)
    val m = svc.metrics()
    println(s"== metrics: queries=${m.totalQueries} writes=${m.totalWrites} " +
      s"cacheHits=${m.cacheHits} avgMs=${m.avgQueryMs.round}")

    // 7. REST transport: token-gated query over real loopback HTTP
    val authed = new graft.serve.ServiceFacade(store,
      authSecret = Some("demo-secret-0123456789abcdef"))
    val rest = new graft.serve.RestServer(authed)
    val port = rest.start()
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: String, token: Option[String] = None) = {
        val b = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port$path"))
          .header("Content-Type", "application/json")
        token.foreach(t => b.header("Authorization", s"Bearer $t"))
        http.send(b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      val noAuth = post("/v1/query", """{"sql":"SELECT 1 AS one"}""")
      println(s"== REST without token: HTTP ${noAuth.statusCode()}")
      val tokResp = post("/v1/auth/token",
        """{"subject":"demo","secret":"demo-secret-0123456789abcdef"}""")
      require(tokResp.statusCode() == 200,
        s"token issue failed: HTTP ${tokResp.statusCode()} ${tokResp.body()}")
      val access = """"access_token":"([^"]+)"""".r
        .findFirstMatchIn(tokResp.body()).get.group(1)
      val q = post("/v1/query",
        """{"sql":"SELECT count(*) AS n FROM users"}""", Some(access))
      println(s"== REST with token: HTTP ${q.statusCode()} body ${q.body()}")
    } finally rest.stop()

    spark.stop()
  }
}
