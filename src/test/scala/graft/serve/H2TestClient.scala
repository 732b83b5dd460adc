package graft.serve

import java.util.concurrent.{CountDownLatch, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.channel.MultiThreadIoEventLoopGroup
import io.netty.handler.codec.http2._

/** Collected response of one HTTP/2 stream (test-side). */
private[serve] final class H2Resp {
  @volatile var status: String = _
  @volatile var grpcStatus: Int = -1
  @volatile var grpcMessage: String = ""
  val body = new java.io.ByteArrayOutputStream()
  val done = new CountDownLatch(1)
  def messages: Seq[Array[Byte]] = {
    val b = body.toByteArray
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (i + 5 <= b.length) {
      val len = ((b(i + 1) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
        ((b(i + 3) & 0xff) << 8) | (b(i + 4) & 0xff)
      out += java.util.Arrays.copyOfRange(b, i + 5, i + 5 + len)
      i += 5 + len
    }
    out.result()
  }
}

/** Minimal h2c client shared by the native-transport specs: one
  * connection per instance, one stream per request. `frames` are
  * pre-cut DATA payload chunks — passing a message split across
  * several chunks exercises the server's reassembly. */
private[serve] final class H2TestClient(port: Int) {
  private val group = new MultiThreadIoEventLoopGroup(1, NioIoHandler.newFactory())
  private val ch: Channel = {
    val bs = new Bootstrap().group(group).channel(classOf[NioSocketChannel])
      .handler(new ChannelInitializer[SocketChannel] {
        override def initChannel(c: SocketChannel): Unit = {
          c.pipeline.addLast(Http2FrameCodecBuilder.forClient().build())
          // inbound (server-initiated) streams only; our streams get
          // handlers from the stream bootstrap
          c.pipeline.addLast(new Http2MultiplexHandler(
            new ChannelInboundHandlerAdapter()))
          ()
        }
      })
    bs.connect("127.0.0.1", port).sync().channel()
  }

  def call(service: String, method: String, frames: Seq[Array[Byte]],
      token: Option[String] = None,
      contentType: String = "application/grpc"): H2Resp = {
    val resp = callAsync(service, method, frames, token, contentType)
    if (!resp.done.await(60, TimeUnit.SECONDS))
      throw new AssertionError("stream timed out")
    resp
  }

  /** [[call]] without awaiting — for asserting that an in-flight slow
    * call does not block other streams on the same connection. */
  def callAsync(service: String, method: String, frames: Seq[Array[Byte]],
      token: Option[String] = None,
      contentType: String = "application/grpc"): H2Resp = {
    val resp = new H2Resp
    val sb = new Http2StreamChannelBootstrap(ch)
      .handler(new ChannelInitializer[Channel] {
        override def initChannel(sc: Channel): Unit = {
          sc.pipeline.addLast(new ChannelInboundHandlerAdapter {
            override def channelRead(ctx: ChannelHandlerContext,
                msg: AnyRef): Unit = msg match {
              case h: Http2HeadersFrame =>
                if (h.headers.status != null)
                  resp.status = h.headers.status.toString
                Option(h.headers.get("grpc-status")).foreach(s =>
                  resp.grpcStatus = s.toString.toInt)
                Option(h.headers.get("grpc-message")).foreach(m =>
                  resp.grpcMessage = m.toString)
                if (h.isEndStream) resp.done.countDown()
              case d: Http2DataFrame =>
                val b = new Array[Byte](d.content.readableBytes)
                d.content.readBytes(b)
                resp.body.write(b, 0, b.length)
                val end = d.isEndStream
                d.release()
                if (end) resp.done.countDown()
              case other =>
                io.netty.util.ReferenceCountUtil.release(other)
            }
          })
          ()
        }
      })
    val stream = sb.open().sync().getNow
    val hdrs = new DefaultHttp2Headers()
    hdrs.method("POST").scheme("http").path(s"/$service/$method")
      .authority(s"127.0.0.1:$port")
    hdrs.set("content-type", contentType)
    hdrs.set("te", "trailers")
    token.foreach(t => hdrs.set("authorization", s"Bearer $t"))
    if (frames.isEmpty) {
      stream.writeAndFlush(new DefaultHttp2HeadersFrame(hdrs, true))
    } else {
      stream.write(new DefaultHttp2HeadersFrame(hdrs))
      frames.zipWithIndex.foreach { case (f, i) =>
        val buf = stream.alloc.buffer(f.length)
        buf.writeBytes(f)
        stream.writeAndFlush(
          new DefaultHttp2DataFrame(buf, i == frames.size - 1))
      }
    }
    resp
  }

  def close(): Unit = {
    ch.close().sync()
    group.shutdownGracefully(0, 1, TimeUnit.SECONDS).sync()
    ()
  }
}

private[serve] object H2TestClient {
  /** 5-byte gRPC message framing. */
  def grpcFrame(msg: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + msg.length)
    out(0) = 0
    out(1) = (msg.length >>> 24).toByte
    out(2) = (msg.length >>> 16).toByte
    out(3) = (msg.length >>> 8).toByte
    out(4) = msg.length.toByte
    System.arraycopy(msg, 0, out, 5, msg.length)
    out
  }
}
