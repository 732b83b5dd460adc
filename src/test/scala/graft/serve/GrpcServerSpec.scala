package graft.serve

import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.SparkSpec
import graft.catalog.TableStore
import ProtoWire._
import H2TestClient.grpcFrame

/** Drives the NATIVE gRPC transport over real loopback HTTP/2 with a
  * netty h2c client — prior-knowledge cleartext, the framing a stock
  * gRPC client library speaks on an insecure channel. The protobuf
  * bytes are [[ProtoWire]]'s, already pinned against the public spec
  * by GrpcWebServerSpec's golden vectors; what THIS spec pins is the
  * HTTP/2 layer: headers, 5-byte message framing across DATA-frame
  * boundaries, trailers, flow-control survival of a long client
  * stream, and the one verb gRPC-Web cannot express — client-
  * streaming StreamWrite. */
class GrpcServerSpec extends SparkSpec {

  private def withServer(authSecret: Option[String] = None,
      apiSecret: Option[String] = None)(f: (Int, ServiceFacade) => Unit): Unit = {
    val facade = new ServiceFacade(new TableStore(spark, tmpDir("grpch2")),
      authSecret, apiSecret = apiSecret)
    val srv = new GrpcServer(facade)
    val port = srv.start()
    try f(port, facade) finally srv.stop()
  }

  test("unary verbs over native HTTP/2: write → query → health") {
    withServer() { (port, _) =>
      val c = new H2TestClient(port)
      try {
        val ts = writeTimestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
        val rec = w.string(1, "u1").msg(2, ts)
          .msg(3, writeStruct(Map("name" -> "ann", "score" -> 9.5)))
        val r1 = c.call("miniodb.v1.MinIODBService", "WriteData",
          Seq(grpcFrame(w.string(1, "users").msg(2, rec).bytes)))
        assert(r1.status == "200" && r1.grpcStatus == 0, s"${r1.grpcMessage}")
        assert(bool(parse(r1.messages.head), 1))
        val r2 = c.call("miniodb.v1.MinIODBService", "QueryData",
          Seq(grpcFrame(w.string(1, "SELECT id, name FROM users").bytes)))
        assert(r2.grpcStatus == 0)
        assert(str(parse(r2.messages.head), 1) == """[{"id":"u1","name":"ann"}]""")
        // empty-body verb: HEADERS with END_STREAM only
        val r3 = c.call("miniodb.v1.MinIODBService", "HealthCheck", Nil)
        assert(r3.grpcStatus == 0 && str(parse(r3.messages.head), 1) == "healthy")
        // server-streaming: StreamQuery emits one message per batch
        (2 to 5).foreach { i =>
          val rec = w.string(1, s"u$i")
            .msg(3, writeStruct(Map("name" -> s"n$i", "score" -> 1.0)))
          c.call("miniodb.v1.MinIODBService", "WriteData",
            Seq(grpcFrame(w.string(1, "users").msg(2, rec).bytes)))
        }
        val r4 = c.call("miniodb.v1.MinIODBService", "StreamQuery",
          Seq(grpcFrame(
            w.string(1, "SELECT id FROM users ORDER BY id").int32(2, 2).bytes)))
        assert(r4.grpcStatus == 0)
        val pages = r4.messages.map(parse)
        assert(pages.map(p => subs(p, 1).size) == Seq(2, 2, 1),
          s"expected 3 streamed batches, got ${pages.size}")
        assert(!bool(pages.last, 2), "last frame carries has_more=false")
      } finally c.close()
    }
  }

  test("StreamWrite: client-streaming across DATA frames, split mid-message") {
    withServer() { (port, facade) =>
      val c = new H2TestClient(port)
      try {
        def swReq(table: String, ids: Seq[String]): Array[Byte] = {
          val req = w.string(2, table)
          ids.foreach { id =>
            req.msg(1, w.string(1, id)
              .msg(3, writeStruct(Map("v" -> id.length.toLong))))
          }
          req.bytes
        }
        // three request messages; the second is SPLIT across two DATA
        // frames (reassembly) and the third shares a frame with the
        // second's tail (multiple messages per frame)
        val m1 = grpcFrame(swReq("sw", Seq("a1", "a2")))
        val m2 = grpcFrame(swReq("sw", Seq("b1", "b2", "b3")))
        val m3 = grpcFrame(swReq("sw", Seq("c1")))
        val cut = m2.length / 2
        val frames = Seq(
          m1 ++ m2.take(cut),
          m2.drop(cut) ++ m3)
        val r = c.call("miniodb.v1.MinIODBService", "StreamWrite", frames)
        assert(r.grpcStatus == 0, s"grpc-message=${r.grpcMessage}")
        val resp = parse(r.messages.head)
        assert(bool(resp, 1), "success")
        assert(i64(resp, 2) == 6L, s"records_count=${i64(resp, 2)}")
        // the stream's records are queryable
        assert(facade.queryData("SELECT id FROM sw ORDER BY id")
          .exists(_.contains("b3")))
      } finally c.close()
    }
  }

  test("StreamWrite per-record failures collect; stream does not abort") {
    withServer() { (port, _) =>
      val c = new H2TestClient(port)
      try {
        // invalid table name on the middle request → its records error,
        // the rest of the stream still lands
        val good = w.string(2, "ok").msg(1, w.string(1, "g1")
          .msg(3, writeStruct(Map("v" -> 1L)))).bytes
        val bad = w.string(2, "..").msg(1, w.string(1, "x1")
          .msg(3, writeStruct(Map("v" -> 1L)))).bytes
        val r = c.call("miniodb.v1.MinIODBService", "StreamWrite",
          Seq(grpcFrame(good) ++ grpcFrame(bad) ++ grpcFrame(good)))
        assert(r.grpcStatus == 0)
        val resp = parse(r.messages.head)
        assert(!bool(resp, 1) && i64(resp, 2) == 2L)
        val errs = resp.getOrElse(3, Vector.empty).collect {
          case PBytes(b) => new String(b, java.nio.charset.StandardCharsets.UTF_8)
        }
        assert(errs.size == 1 && errs.head.contains("invalid table name"))
      } finally c.close()
    }
  }

  test("bearer auth and error trailers on the native transport") {
    withServer(Some("h2-signing-key-0123456789"),
        apiSecret = Some("h2-api-credential")) { (port, facade) =>
      val c = new H2TestClient(port)
      try {
        val denied = c.call("miniodb.v1.MinIODBService", "ListTables",
          Seq(grpcFrame(Array.emptyByteArray)))
        assert(denied.grpcStatus == 16)
        val tok = c.call("miniodb.v1.AuthService", "GetToken",
          Seq(grpcFrame(w.string(1, "alice").string(2, "h2-api-credential").bytes)))
        assert(tok.grpcStatus == 0)
        val access = str(parse(tok.messages.head), 1)
        val ok = c.call("miniodb.v1.MinIODBService", "ListTables",
          Seq(grpcFrame(Array.emptyByteArray)), token = Some(access))
        assert(ok.grpcStatus == 0)
        // wrong content-type → INVALID_ARGUMENT with percent-encoded
        // multi-word grpc-message (no literal '+')
        val badCt = c.call("miniodb.v1.MinIODBService", "HealthCheck",
          Seq(grpcFrame(Array.emptyByteArray)), contentType = "text/plain")
        assert(badCt.grpcStatus == 3)
        assert(badCt.grpcMessage.contains("%20") && !badCt.grpcMessage.contains("+"),
          s"grpc-message not percent-encoded: '${badCt.grpcMessage}'")
        // unknown method → UNIMPLEMENTED
        val nope = c.call("miniodb.v1.MinIODBService", "Nope",
          Seq(grpcFrame(Array.emptyByteArray)), token = Some(access))
        assert(nope.grpcStatus == 12)
        // the streaming verbs under a BOGUS service name must NOT
        // execute: auth is service-keyed, so method-keyed dispatch
        // would otherwise run them unauthenticated (the r15 review's
        // bypass finding)
        val sqBypass = c.call("evil.FakeService", "StreamQuery",
          Seq(grpcFrame(w.string(1, "SELECT 1 AS x").bytes)))
        assert(sqBypass.grpcStatus == 12 && sqBypass.messages.isEmpty,
          s"StreamQuery executed under a bogus service: ${sqBypass.grpcStatus}")
        val swBypass = c.call("evil.FakeService", "StreamWrite",
          Seq(grpcFrame(w.string(2, "evil").msg(1, w.string(1, "x")
            .msg(3, writeStruct(Map("v" -> 1L)))).bytes)))
        assert(swBypass.grpcStatus == 12, s"got ${swBypass.grpcStatus}")
        assert(facade.getTable("evil").isEmpty,
          "StreamWrite under a bogus service wrote data unauthenticated")
      } finally c.close()
    }
  }

  test("two request messages on a unary verb → INVALID_ARGUMENT, not silent drop") {
    withServer() { (port, facade) =>
      val c = new H2TestClient(port)
      try {
        def wd(id: String) = grpcFrame(w.string(1, "card")
          .msg(2, w.string(1, id).msg(3, writeStruct(Map("v" -> 1L)))).bytes)
        val r = c.call("miniodb.v1.MinIODBService", "WriteData",
          Seq(wd("a") ++ wd("b")))
        assert(r.grpcStatus == 3, s"got ${r.grpcStatus}")
        // neither write may have been acknowledged as a success
        assert(r.messages.isEmpty)
      } finally c.close()
    }
  }

  test("oversize inbound message → RESOURCE_EXHAUSTED (the stock 4 MiB cap, shrunk)") {
    val facade = new ServiceFacade(new TableStore(spark, tmpDir("grpch2cap")))
    val srv = new GrpcServer(facade, maxInboundMessageBytes = 1024)
    val port = srv.start()
    val c = new H2TestClient(port)
    try {
      val big = w.string(1, "users")
        .msg(2, w.string(1, "x").msg(3, writeStruct(Map("blob" -> ("y" * 4096)))))
        .bytes
      val r = c.call("miniodb.v1.MinIODBService", "WriteData", Seq(grpcFrame(big)))
      assert(r.grpcStatus == 8, s"expected RESOURCE_EXHAUSTED, got ${r.grpcStatus}")
      // a fitting message still lands afterwards
      val ok = c.call("miniodb.v1.MinIODBService", "HealthCheck", Nil)
      assert(ok.grpcStatus == 0)
    } finally { c.close(); srv.stop() }
  }

  test("garbage bytes on the h2c port: connection refused cleanly, server stays alive") {
    withServer() { (port, _) =>
      // not an HTTP/2 preface — netty must reject the connection
      // without wedging the event loop
      (1 to 5).foreach { _ =>
        val s = new java.net.Socket("127.0.0.1", port)
        try {
          s.setSoTimeout(5000)
          s.getOutputStream.write(
            "GET / HTTP/1.1\r\nHost: x\r\n\r\n ÿgarbage".getBytes("ISO-8859-1"))
          s.getOutputStream.flush()
          // read until the server closes (or returns anything) — must
          // not hang past the socket timeout
          try { while (s.getInputStream.read() != -1) () }
          catch { case _: java.net.SocketTimeoutException =>
            fail("server neither answered nor closed a garbage connection") }
        } finally s.close()
      }
      // a real client still works afterwards
      val c = new H2TestClient(port)
      try {
        val r = c.call("miniodb.v1.MinIODBService", "HealthCheck", Nil)
        assert(r.grpcStatus == 0, "server wedged after garbage connections")
      } finally c.close()
    }
  }

  test("StreamQuery under the KNOWN-but-wrong AuthService: UNIMPLEMENTED, no rows") {
    // the r15 review's second bypass shape: AuthService passes the
    // known-service gate and needsBearer() is false for it, so a
    // method-keyed streaming branch would run SQL with no bearer
    // check. The branch must be service-gated so this falls through
    // to dispatch.unary → auth() → UNIMPLEMENTED.
    withServer(Some("h2-signing-key-0123456789"),
        apiSecret = Some("h2-api-credential")) { (port, _) =>
      val c = new H2TestClient(port)
      try {
        val r = c.call("miniodb.v1.AuthService", "StreamQuery",
          Seq(grpcFrame(w.string(1, "SELECT 1 AS x").int32(2, 10).bytes)))
        assert(r.grpcStatus == 12 && r.messages.isEmpty,
          s"AuthService/StreamQuery executed unauthenticated: " +
            s"status=${r.grpcStatus} messages=${r.messages.size}")
        // same shape for the client-streaming verb: the fold is only
        // armed for MinIODBService, so this must be UNIMPLEMENTED too
        val sw = c.call("miniodb.v1.AuthService", "StreamWrite",
          Seq(grpcFrame(w.string(2, "evil").msg(1, w.string(1, "x")
            .msg(3, writeStruct(Map("v" -> 1L)))).bytes)))
        assert(sw.grpcStatus == 12, s"got ${sw.grpcStatus}")
      } finally c.close()
    }
  }

  test("stream ended mid-message: records already applied are reported") {
    withServer() { (port, facade) =>
      val c = new H2TestClient(port)
      try {
        def m(id: String) = grpcFrame(w.string(2, "partial")
          .msg(1, w.string(1, id).msg(3, writeStruct(Map("v" -> 1L)))).bytes)
        // two complete messages, then a third truncated mid-frame —
        // the client half-closes anyway (a crashed writer's shape)
        val truncated = m("p3").dropRight(4)
        val r = c.call("miniodb.v1.MinIODBService", "StreamWrite",
          Seq(m("p1") ++ m("p2") ++ truncated))
        assert(r.grpcStatus == 3, s"got ${r.grpcStatus}")
        // the trailer must carry the applied count so the client can
        // reconcile the partial write
        val decoded = java.net.URLDecoder.decode(r.grpcMessage, "UTF-8")
        assert(decoded.contains("after 2 records applied"),
          s"no applied-count in '$decoded'")
        assert(facade.queryData("SELECT id FROM partial ORDER BY id")
          .exists(j => j.contains("p1") && j.contains("p2") && !j.contains("p3")))
      } finally c.close()
    }
  }

  test("a slow StreamQuery does not block HealthCheck on the same connection") {
    // dispatch work must run OFF the netty event loop: with both
    // streams multiplexed onto one connection (hence one loop), a
    // facade-blocking query on stream A stalls stream B forever if
    // dispatch runs inline. 10 s of latch headroom ≫ the async hop.
    val gate = new CountDownLatch(1)
    val entered = new CountDownLatch(1)
    val store = new TableStore(spark, tmpDir("grpcslow"))
    val facade = new ServiceFacade(store) {
      override def streamQuery(sql: String, cursor: Long,
          pageSize: Int): Either[String, (Array[String], Long)] = {
        entered.countDown()
        assert(gate.await(60, TimeUnit.SECONDS))
        super.streamQuery(sql, cursor, pageSize)
      }
    }
    val srv = new GrpcServer(facade)
    val port = srv.start()
    val c = new H2TestClient(port)
    try {
      facade.writeData("slowt", graft.ingest.DynRecord("s1",
        new java.sql.Timestamp(0L), Map("v" -> 1L)))
      val slow = c.callAsync("miniodb.v1.MinIODBService", "StreamQuery",
        Seq(grpcFrame(w.string(1, "SELECT id FROM slowt").int32(2, 10).bytes)))
      assert(entered.await(30, TimeUnit.SECONDS), "slow query never started")
      // while the slow query holds its dispatch thread, the loop must
      // still serve new streams on the SAME connection
      val health = c.call("miniodb.v1.MinIODBService", "HealthCheck", Nil)
      assert(health.grpcStatus == 0,
        "HealthCheck blocked behind a slow StreamQuery: event loop not offloaded")
      gate.countDown()
      assert(slow.done.await(60, TimeUnit.SECONDS), "slow stream never finished")
      assert(slow.grpcStatus == 0, s"slow query failed: ${slow.grpcMessage}")
    } finally { gate.countDown(); c.close(); srv.stop() }
  }

  test("long client stream: 2000 messages, flow-control credit returned") {
    withServer() { (port, _) =>
      val c = new H2TestClient(port)
      try {
        // well past the 64 KiB initial connection/stream windows — the
        // stream only completes if the server returns WINDOW_UPDATE
        // credit as it consumes; total body ≈ 2000 × ~60 B ≈ 120 KiB
        val msgs = (1 to 2000).map { i =>
          grpcFrame(w.string(2, "bulk").msg(1, w.string(1, s"r$i")
            .msg(3, writeStruct(Map("i" -> i.toLong)))).bytes)
        }
        // batch into DATA frames of ~16 KiB so frames cross the
        // window boundaries mid-stream
        val frames = msgs.grouped(200).map(_.reduce(_ ++ _)).toSeq
        val r = c.call("miniodb.v1.MinIODBService", "StreamWrite", frames)
        assert(r.grpcStatus == 0, s"grpc-message=${r.grpcMessage}")
        assert(i64(parse(r.messages.head), 2) == 2000L)
      } finally c.close()
    }
  }

  test("SerialExecutor: an ordinary task failure keeps the tail draining; a fatal error propagates") {
    val facade = new ServiceFacade(new TableStore(spark, tmpDir("serexec")))
    val srv = new GrpcServer(facade)
    srv.start()
    try {
      val serial = new srv.SerialExecutor
      val ran = new CountDownLatch(1)
      serial.execute(() => throw new RuntimeException("task bug"))
      serial.execute(() => ran.countDown())
      // the tail task after a throwing one still runs (trailers for
      // other work keep flowing), and the failure is counted, not
      // silently discarded
      assert(ran.await(5, TimeUnit.SECONDS), "tail task must drain after a failure")
      assert(srv.swallowedTaskFailures.get() == 1L)
      // a FATAL error must escape the drain (kill the pool thread),
      // never be swallowed as recoverable stream state
      val fatalSeen = new CountDownLatch(1)
      val prior = Thread.getDefaultUncaughtExceptionHandler
      Thread.setDefaultUncaughtExceptionHandler((_, e) =>
        if (e.isInstanceOf[OutOfMemoryError]) fatalSeen.countDown())
      try {
        val serial2 = new srv.SerialExecutor
        serial2.execute(() => throw new OutOfMemoryError("simulated"))
        assert(fatalSeen.await(5, TimeUnit.SECONDS),
          "fatal error must propagate out of the drain loop")
        assert(srv.swallowedTaskFailures.get() == 1L,
          "fatal errors are not 'swallowed task failures'")
      } finally Thread.setDefaultUncaughtExceptionHandler(prior)
    } finally srv.stop()
  }

  test("stop() drops late stream tasks cleanly (no NPE/rejection surfacing)") {
    val facade = new ServiceFacade(new TableStore(spark, tmpDir("latetask")))
    val srv = new GrpcServer(facade)
    srv.start()
    val serial = new srv.SerialExecutor
    srv.stop()
    // a frame arriving on a not-yet-closed stream after stop() must be
    // dropped, not throw through the netty pipeline
    serial.execute(() => fail("must not run after stop"))
    Thread.sleep(100)
    assert(srv.swallowedTaskFailures.get() == 0L)
  }
}
