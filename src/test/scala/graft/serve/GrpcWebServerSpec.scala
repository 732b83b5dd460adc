package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.catalog.TableStore
import ProtoWire._

/** Drives the gRPC-Web transport over real loopback HTTP with
  * hand-encoded protobuf frames — the same bytes a stock grpc-web
  * client stub generated from the reference's miniodb.proto would
  * send. Golden wire vectors pin the codec against the PUBLIC
  * protobuf spec (not against itself). */
class GrpcWebServerSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def call(port: Int, service: String, method: String,
      msg: Array[Byte], token: Option[String] = None)
      : (Int, String, Seq[Array[Byte]]) = {
    val body = new java.io.ByteArrayOutputStream()
    body.write(0x00)
    body.write(msg.length >>> 24); body.write(msg.length >>> 16)
    body.write(msg.length >>> 8); body.write(msg.length)
    body.write(msg, 0, msg.length)
    val b = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/$service/$method"))
      .header("Content-Type", "application/grpc-web+proto")
      .POST(HttpRequest.BodyPublishers.ofByteArray(body.toByteArray))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    assert(resp.statusCode() == 200, s"HTTP ${resp.statusCode()}")
    // parse frames: data frames (0x00) + one trailer frame (0x80)
    val raw = resp.body()
    var i = 0
    var status = -1
    var statusMsg = ""
    val msgs = Seq.newBuilder[Array[Byte]]
    while (i + 5 <= raw.length) {
      val flag = raw(i) & 0xff
      val len = ((raw(i + 1) & 0xff) << 24) | ((raw(i + 2) & 0xff) << 16) |
        ((raw(i + 3) & 0xff) << 8) | (raw(i + 4) & 0xff)
      val payload = java.util.Arrays.copyOfRange(raw, i + 5, i + 5 + len)
      if ((flag & 0x80) != 0) {
        val text = new String(payload, UTF_8)
        status = "grpc-status: (\\d+)".r.findFirstMatchIn(text).map(_.group(1).toInt).getOrElse(-1)
        // strict per-spec decode: %XX escapes ONLY (URLDecoder would
        // also turn '+' into space, masking a non-compliant encoder)
        statusMsg = "grpc-message: ([^\r\n]*)".r.findFirstMatchIn(text)
          .map(m => pctDecode(m.group(1))).getOrElse("")
      } else msgs += payload
      i += 5 + len
    }
    (status, statusMsg, msgs.result())
  }

  /** Percent-decode exactly the %XX escapes (the gRPC spec's
    * grpc-message encoding); every other byte passes through. */
  private def pctDecode(s: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 2 < s.length) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(s.charAt(i).toInt); i += 1 }
    }
    new String(out.toByteArray, UTF_8)
  }

  private def withServer(authSecret: Option[String] = None,
      apiSecret: Option[String] = None)(f: (Int, ServiceFacade) => Unit): Unit = {
    val facade = new ServiceFacade(new TableStore(spark, tmpDir("grpc")),
      authSecret, apiSecret = apiSecret)
    val srv = new GrpcWebServer(facade)
    val port = srv.start()
    try f(port, facade) finally srv.stop()
  }

  test("proto wire golden vectors (public protobuf spec, not self-referential)") {
    // varint 300 = AC 02; tag(field 1, wiretype 0) = 0x08
    assert(w.int64(1, 300).bytes.toSeq === Seq(0x08, 0xAC.toByte, 0x02).map(_.toByte))
    // string field 2 "abc": tag = (2<<3)|2 = 0x12, len 3
    assert(w.string(2, "abc").bytes.toSeq ===
      Seq[Byte](0x12, 0x03) ++ "abc".getBytes(UTF_8).toSeq)
    // proto3 elision: zero scalar emits nothing
    assert(w.int64(1, 0).bytes.isEmpty && w.string(2, "").bytes.isEmpty)
    // negative int64 is ten 0xFF-ish bytes (two's complement varint)
    val neg = w.int64(1, -1).bytes
    assert(neg.length == 11 && i64(parse(neg), 1) == -1L)
    // double field 3 1.5: tag = (3<<3)|1 = 0x19, little-endian IEEE754
    assert(w.double(3, 1.5).bytes.toSeq ===
      Seq(0x19, 0, 0, 0, 0, 0, 0, 0xF8.toByte, 0x3F).map(_.toByte))
    // parse round-trips a composite message
    val m = parse(w.string(1, "t").int64(2, 42).msg(3, w.bool(1, true)).bytes)
    assert(str(m, 1) == "t" && i64(m, 2) == 42L && bool(sub(m, 3).get, 1))
    // Timestamp floor semantics (protobuf.dev): pre-epoch fractional
    // instants carry NEGATIVE seconds and NON-NEGATIVE nanos —
    // 1969-12-31T23:59:59.5Z is seconds=-1/nanos=5e8, not 0/5e8
    val preEpoch = new java.sql.Timestamp(-1000L)
    preEpoch.setNanos(500000000)          // getTime == -500 ms
    val tsm = parse(writeTimestamp(preEpoch).bytes)
    assert(i64(tsm, 1) == -1L && i32(tsm, 2) == 500000000)
    assert(readTimestamp(tsm).getTime == -500L)
  }

  test("Struct round-trip preserves the DynRecord payload shape") {
    val payload = Map[String, Any]("name" -> "ann", "score" -> 9.5,
      "age" -> 30L, "active" -> true, "note" -> null,
      "tags" -> Seq("a", "b"), "nested" -> Map[String, Any]("x" -> 1L),
      "zero" -> 0L, "empty" -> "")
    val back = readStruct(parse(writeStruct(payload).bytes))
    assert(back("name") == "ann" && back("score") == 9.5 && back("age") == 30L)
    assert(back("active") == true && back("note") == null)
    assert(back("tags") == Seq("a", "b"))
    assert(back("nested") == Map("x" -> 1L))
    // oneof members survive at their type defaults (elision suspended)
    assert(back("zero") == 0L && back("empty") == "")
  }

  test("write → query → update → delete over gRPC-Web") {
    withServer() { (port, _) =>
      val ts = writeTimestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      val rec = w.string(1, "u1").msg(2, ts)
        .msg(3, writeStruct(Map("name" -> "ann", "score" -> 9.5)))
      val (s1, _, m1) = call(port, "miniodb.v1.MinIODBService", "WriteData",
        w.string(1, "users").msg(2, rec).bytes)
      assert(s1 == 0 && bool(parse(m1.head), 1) && str(parse(m1.head), 2) == "u1")
      val (s2, _, m2) = call(port, "miniodb.v1.MinIODBService", "QueryData",
        w.string(1, "SELECT id, name, score FROM users").bytes)
      assert(s2 == 0)
      assert(str(parse(m2.head), 1) == """[{"id":"u1","name":"ann","score":9.5}]""")
      val (s3, _, m3) = call(port, "miniodb.v1.MinIODBService", "UpdateData",
        w.string(1, "users").string(2, "u1")
          .msg(3, writeStruct(Map("name" -> "ann2"))).msg(4, ts).bytes)
      assert(s3 == 0 && bool(parse(m3.head), 1))
      val (s4, _, m4) = call(port, "miniodb.v1.MinIODBService", "DeleteData",
        w.string(1, "users").string(2, "u1").bytes)
      assert(s4 == 0 && i32(parse(m4.head), 3) == 1)
    }
  }

  test("StreamQuery streams every batch; cursor resumes mid-stream") {
    withServer() { (port, facade) =>
      (1 to 5).foreach { i =>
        facade.writeData("t", graft.ingest.DynRecord(s"r$i",
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          Map("i" -> i.toLong)))
      }
      // true server-streaming (the proto's `returns (stream ...)`):
      // one response message PER BATCH, to exhaustion — 5 rows at
      // batch_size 2 = frames of 2/2/1
      val (s1, _, m1) = call(port, "miniodb.v1.MinIODBService", "StreamQuery",
        w.string(1, "SELECT id, i FROM t ORDER BY id").int32(2, 2).bytes)
      assert(s1 == 0)
      val pages = m1.map(parse)
      assert(pages.map(p => subs(p, 1).size) == Seq(2, 2, 1))
      val first = subs(pages.head, 1).head
      assert(str(first, 1) == "r1") // id carried from the row
      assert(readStruct(sub(first, 3).get)("i") == 1L)
      assert(pages.init.forall(bool(_, 2)) && !bool(pages.last, 2),
        "has_more on every frame but the last")
      assert(subs(pages.last, 1).map(str(_, 1)) == Seq("r5"))
      // an interrupted client re-enters mid-stream with the cursor the
      // first frame carried
      val cursor = str(pages.head, 3)
      assert(cursor.nonEmpty)
      val (s2, _, m2) = call(port, "miniodb.v1.MinIODBService", "StreamQuery",
        w.string(1, "SELECT id, i FROM t ORDER BY id").int32(2, 2)
          .string(3, cursor).bytes)
      assert(s2 == 0)
      assert(m2.map(parse).flatMap(subs(_, 1)).map(str(_, 1)) ==
        Seq("r3", "r4", "r5"))
    }
  }

  test("table lifecycle + health + status + metrics over gRPC-Web") {
    withServer() { (port, _) =>
      val cfg = w.int32(1, 99).int32(2, 30).string(6, "custom").string(7, "ord")
      val (s1, _, _) = call(port, "miniodb.v1.MinIODBService", "CreateTable",
        w.string(1, "cfg").msg(2, cfg).bytes)
      assert(s1 == 0)
      // duplicate without if_not_exists → INVALID_ARGUMENT
      val (sDup, msgDup, _) = call(port, "miniodb.v1.MinIODBService", "CreateTable",
        w.string(1, "cfg").bytes)
      // multi-word message: spaces must arrive as %20 (never '+') and
      // strict-decode back to spaces — pins the spec's percent-encoding
      assert(sDup == 3 && msgDup.contains("exists"))
      assert(msgDup.contains(" ") && !msgDup.contains("+"),
        s"grpc-message not percent-encoded per spec: '$msgDup'")
      val (s2, _, m2) = call(port, "miniodb.v1.MinIODBService", "GetTable",
        w.string(1, "cfg").bytes)
      assert(s2 == 0)
      val info = sub(parse(m2.head), 1).get
      assert(str(info, 1) == "cfg")
      val gotCfg = sub(info, 2).get
      assert(i32(gotCfg, 1) == 99 && str(gotCfg, 6) == "custom" && str(gotCfg, 7) == "ord")
      val (s3, _, m3) = call(port, "miniodb.v1.MinIODBService", "ListTables",
        Array.emptyByteArray)
      assert(s3 == 0 && subs(parse(m3.head), 1).map(str(_, 1)).contains("cfg"))
      val (sNf, _, _) = call(port, "miniodb.v1.MinIODBService", "GetTable",
        w.string(1, "absent").bytes)
      assert(sNf == 5, "NOT_FOUND")
      val (s4, _, _) = call(port, "miniodb.v1.MinIODBService", "DeleteTable",
        w.string(1, "cfg").bytes)
      assert(s4 == 0)
      val (s5, _, m5) = call(port, "miniodb.v1.MinIODBService", "HealthCheck",
        Array.emptyByteArray)
      assert(s5 == 0 && str(parse(m5.head), 1) == "healthy")
      val (s6, _, m6) = call(port, "miniodb.v1.MinIODBService", "GetStatus",
        Array.emptyByteArray)
      assert(s6 == 0 && i32(parse(m6.head), 6) == 1)
      val (s7, _, m7) = call(port, "miniodb.v1.MinIODBService", "GetMetrics",
        Array.emptyByteArray)
      assert(s7 == 0)
      val usage = subs(parse(m7.head), 3)
        .map(e => str(e, 1) -> i64(e, 2)).toMap
      assert(usage.contains("total_queries"))
      // unknown method → UNIMPLEMENTED
      val (s8, _, _) = call(port, "miniodb.v1.MinIODBService", "Nope",
        Array.emptyByteArray)
      assert(s8 == 12)
    }
  }

  test("bearer auth gates data methods; auth verbs issue/refresh/revoke") {
    withServer(Some("grpc-signing-key-0123456789"),
        apiSecret = Some("grpc-api-credential")) { (port, _) =>
      // no token → UNAUTHENTICATED; HealthCheck stays open
      val (sDenied, _, _) = call(port, "miniodb.v1.MinIODBService", "ListTables",
        Array.emptyByteArray)
      assert(sDenied == 16)
      val (sOpen, _, _) = call(port, "miniodb.v1.MinIODBService", "HealthCheck",
        Array.emptyByteArray)
      assert(sOpen == 0)
      // mint requires the API credential (not the signing key)
      val (sBad, _, _) = call(port, "miniodb.v1.AuthService", "GetToken",
        w.string(1, "alice").string(2, "grpc-signing-key-0123456789").bytes)
      assert(sBad == 3)
      val (sTok, _, mTok) = call(port, "miniodb.v1.AuthService", "GetToken",
        w.string(1, "alice").string(2, "grpc-api-credential").bytes)
      assert(sTok == 0)
      val tok = parse(mTok.head)
      val access = str(tok, 1)
      val refresh = str(tok, 2)
      assert(access.nonEmpty && refresh.nonEmpty && str(tok, 4) == "Bearer")
      assert(i64(tok, 3) > 0, "expires_in seconds")
      // valid bearer passes
      val (sOk, _, _) = call(port, "miniodb.v1.MinIODBService", "ListTables",
        Array.emptyByteArray, token = Some(access))
      assert(sOk == 0)
      // refresh rotates
      val (sRef, _, mRef) = call(port, "miniodb.v1.AuthService", "RefreshToken",
        w.string(1, refresh).bytes)
      assert(sRef == 0 && str(parse(mRef.head), 1).nonEmpty)
      // revoke, then the revoked token is rejected
      val (sRev, _, _) = call(port, "miniodb.v1.AuthService", "RevokeToken",
        w.string(1, access).bytes)
      assert(sRev == 0)
      val (sAfter, _, _) = call(port, "miniodb.v1.MinIODBService", "ListTables",
        Array.emptyByteArray, token = Some(access))
      assert(sAfter == 16)
    }
  }

  test("malformed input is INVALID_ARGUMENT in the trailer, never HTTP 500") {
    withServer() { (port, _) =>
      // non-SELECT dies at the gate
      val (s1, m1, _) = call(port, "miniodb.v1.MinIODBService", "QueryData",
        w.string(1, "DROP TABLE users").bytes)
      assert(s1 == 3 && m1.nonEmpty)
      // traversal table name dies at the validator
      val (s2, m2, _) = call(port, "miniodb.v1.MinIODBService", "WriteData",
        w.string(1, "..").msg(2, w.string(1, "x")
          .msg(3, writeStruct(Map("v" -> 1L)))).bytes)
      assert(s2 == 3 && m2.contains("invalid table name"))
      // garbage protobuf payload
      val (s3, _, _) = call(port, "miniodb.v1.MinIODBService", "QueryData",
        Array[Byte](0x08, 0xFF.toByte)) // truncated varint
      assert(s3 == 3)
    }
  }

  test("grpc-web-text mode: base64 request/response round-trip + CORS") {
    withServer() { (port, _) =>
      // the stock browser stub's default wire: body = base64(framed),
      // content-type application/grpc-web-text
      val msg = w.string(1, "SELECT 1 AS one").bytes
      val framed = new java.io.ByteArrayOutputStream()
      framed.write(0x00)
      framed.write(msg.length >>> 24); framed.write(msg.length >>> 16)
      framed.write(msg.length >>> 8); framed.write(msg.length)
      framed.write(msg, 0, msg.length)
      val b64 = java.util.Base64.getEncoder.encode(framed.toByteArray)
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/miniodb.v1.MinIODBService/QueryData"))
          .header("Content-Type", "application/grpc-web-text")
          .POST(HttpRequest.BodyPublishers.ofByteArray(b64))
          .build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").orElse("")
        .startsWith("application/grpc-web-text"))
      assert(resp.headers().firstValue("Access-Control-Allow-Origin")
        .orElse("") == "*")
      // body is ONE base64 blob of the framed stream
      val raw = java.util.Base64.getDecoder.decode(resp.body())
      val len = ((raw(1) & 0xff) << 24) | ((raw(2) & 0xff) << 16) |
        ((raw(3) & 0xff) << 8) | (raw(4) & 0xff)
      assert((raw(0) & 0xff) == 0)
      assert(str(parse(java.util.Arrays.copyOfRange(raw, 5, 5 + len)), 1)
        == """[{"one":1}]""")
      // trailer frame carries grpc-status 0
      val t = 5 + len
      assert((raw(t) & 0xff) == 0x80)
      assert(new String(raw, t + 5, raw.length - t - 5, UTF_8)
        .contains("grpc-status: 0"))
      // CHUNKED base64 (padding mid-body — each frame its own chunk,
      // as the protocol allows): must decode identically
      val chunked = java.util.Base64.getEncoder.encodeToString(
          java.util.Arrays.copyOfRange(framed.toByteArray, 0, 7)) +
        java.util.Base64.getEncoder.encodeToString(
          java.util.Arrays.copyOfRange(framed.toByteArray, 7,
            framed.toByteArray.length))
      assert(chunked.indexOf('=') >= 0 &&
        chunked.indexOf('=') < chunked.length - 2,
        "test setup: need mid-body padding to exercise chunked decode")
      val respC = client.send(
        HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/miniodb.v1.MinIODBService/QueryData"))
          .header("Content-Type", "application/grpc-web-text")
          .POST(HttpRequest.BodyPublishers.ofString(chunked))
          .build(),
        HttpResponse.BodyHandlers.ofByteArray())
      val rawC = java.util.Base64.getDecoder.decode(respC.body())
      assert(new String(rawC, UTF_8).contains("grpc-status: 0"),
        "chunked-base64 request body not decoded")
      // malformed base64 → INVALID_ARGUMENT in a text-mode trailer
      val bad = client.send(
        HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/miniodb.v1.MinIODBService/QueryData"))
          .header("Content-Type", "application/grpc-web-text")
          .POST(HttpRequest.BodyPublishers.ofString("!!!not-base64!!!"))
          .build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(bad.statusCode() == 200)
      val badRaw = java.util.Base64.getDecoder.decode(bad.body())
      assert(new String(badRaw, 5, badRaw.length - 5, UTF_8)
        .contains("grpc-status: 3"))
      // CORS preflight
      val pre = client.send(
        HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/miniodb.v1.MinIODBService/QueryData"))
          .method("OPTIONS", HttpRequest.BodyPublishers.noBody())
          .header("Origin", "http://localhost:8080")
          .header("Access-Control-Request-Method", "POST")
          .build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(pre.statusCode() == 204)
      assert(pre.headers().firstValue("Access-Control-Allow-Headers")
        .orElse("").contains("authorization"))
    }
  }

  test("CORS origin allowlist: echo on match + Vary, no grant on mismatch, * default") {
    val facade = new ServiceFacade(new TableStore(spark, tmpDir("grpcors")))
    val srv = new GrpcWebServer(facade,
      allowedOrigins = Seq("http://app.example"))
    val port = srv.start()
    try {
      def preflight(origin: String): java.net.http.HttpResponse[Array[Byte]] =
        client.send(
          HttpRequest.newBuilder(URI.create(
              s"http://127.0.0.1:$port/miniodb.v1.MinIODBService/QueryData"))
            .method("OPTIONS", HttpRequest.BodyPublishers.noBody())
            .header("Origin", origin)
            .header("Access-Control-Request-Method", "POST")
            .build(),
          HttpResponse.BodyHandlers.ofByteArray())
      val ok = preflight("http://app.example")
      assert(ok.headers().firstValue("Access-Control-Allow-Origin")
        .orElse("") == "http://app.example", "allowlisted origin not echoed")
      assert(ok.headers().firstValue("Vary").orElse("") == "Origin",
        "echoed grant must carry Vary: Origin for shared caches")
      val no = preflight("http://evil.example")
      assert(!no.headers().firstValue("Access-Control-Allow-Origin").isPresent,
        "non-allowlisted origin received a CORS grant")
      // the POST path applies the same gate (the preflight-less
      // same-origin-policy escape hatches, e.g. simple requests)
      val body = Array[Byte](0, 0, 0, 0, 0)
      val post = client.send(
        HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/miniodb.v1.MinIODBService/HealthCheck"))
          .header("Content-Type", "application/grpc-web+proto")
          .header("Origin", "http://evil.example")
          .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(post.statusCode() == 200 &&
        !post.headers().firstValue("Access-Control-Allow-Origin").isPresent)
    } finally srv.stop()
  }

  test("metadata verbs: backup → list → restore round-trip (reference field numbers)") {
    withServer() { (port, facade) =>
      facade.writeData("mt", graft.ingest.DynRecord("k1",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Map("v" -> 7L)))
      // BackupMetadataRequest{force=1} -> {success=1, message=2,
      // backup_id=3, timestamp=4}
      val (s1, _, m1) = call(port, "miniodb.v1.MinIODBService", "BackupMetadata",
        w.bool(1, true).bytes)
      val b1 = parse(m1.head)
      assert(s1 == 0 && bool(b1, 1) && str(b1, 3).startsWith("meta-"))
      assert(i64(sub(b1, 4).get, 1) > 0, "timestamp seconds")
      // ListBackupsRequest{days=1} -> {backups=1 repeated BackupInfo, total=2}
      val (s2, _, m2) = call(port, "miniodb.v1.MinIODBService", "ListBackups",
        w.int32(1, 7).bytes)
      val l = parse(m2.head)
      assert(s2 == 0 && i32(l, 2) >= 1)
      val info = subs(l, 1).find(b => str(b, 1) == "mt").get
      assert(str(info, 2) == "local" && i64(info, 4) > 0)
      assert(i64(sub(info, 5).get, 1) > 0, "last_modified")
      // a 0-day-old cutoff is "all" per the reference semantics (days<=0)
      // mutate then restore FROM the snapshot: the pre-backup row wins
      facade.deleteData("mt", "k1")
      // dry_run counts but must not touch the store
      val (sDry, _, mDry) = call(port, "miniodb.v1.MinIODBService", "RestoreMetadata",
        w.string(1, "mt").bool(3, true).bytes)
      val dr = parse(mDry.head)
      assert(sDry == 0 && bool(dr, 1) && i32(dr, 4) == 1 && i32(dr, 6) == 1)
      assert(facade.queryData("SELECT id FROM mt").exists(_ == "[]"),
        "dry_run must not restore")
      val (s3, _, m3) = call(port, "miniodb.v1.MinIODBService", "RestoreMetadata",
        w.string(1, "mt").bytes)
      val r = parse(m3.head)
      assert(s3 == 0 && bool(r, 1) && i32(r, 4) == 1 && i32(r, 5) == 1)
      assert(str(r, 8).endsWith("ms"), "duration")
      assert(facade.queryData("SELECT id FROM mt").exists(_.contains("k1")))
      // from_latest with nothing named restores every backed-up table
      val (s4, _, m4) = call(port, "miniodb.v1.MinIODBService", "RestoreMetadata",
        w.bool(2, true).bytes)
      assert(s4 == 0 && i32(parse(m4.head), 4) >= 1)
      // neither backup_file nor from_latest -> INVALID_ARGUMENT
      val (s5, _, _) = call(port, "miniodb.v1.MinIODBService", "RestoreMetadata",
        Array.emptyByteArray)
      assert(s5 == 3)
      // GetMetadataStatus{} -> {node_id=1, backup_status=2 map,
      // last_backup=3, health_status=5}
      val (s6, _, m6) = call(port, "miniodb.v1.MinIODBService",
        "GetMetadataStatus", Array.emptyByteArray)
      val st = parse(m6.head)
      assert(s6 == 0 && str(st, 1) == "local" && str(st, 5) == "healthy")
      val bs = subs(st, 2).map(e => str(e, 1) -> str(e, 2)).toMap
      assert(bs.get("mt").exists(_.startsWith("bytes=")))
      assert(i64(sub(st, 3).get, 1) > 0, "last_backup")
    }
  }
}
