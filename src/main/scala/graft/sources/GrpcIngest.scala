package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler}
import io.netty.util.ReferenceCountUtil

/** Minimal gRPC-over-HTTP/2 (h2c, prior knowledge) server for the
  * unary OTLP `Export` RPCs — the collector-DEFAULT transport every
  * stock `otlp` exporter speaks (the reference embeds collector gRPC
  * receivers, internal/otelreceiver/receiver.go:45-93). Built directly
  * on Netty's public HTTP/2 frame codec (shipped with Spark) plus the
  * public gRPC wire format (grpc.io PROTOCOL-HTTP2: each message is a
  * 1-byte compressed flag + 4-byte big-endian length prefix; responses
  * carry `grpc-status` in the trailers), so no gRPC library is needed
  * for unary ingest.
  *
  * The handler only parses the framing and hands each decompressed
  * protobuf message to the per-path consumer — decode and storage run
  * distributed inside the streaming micro-batches, exactly like the
  * HTTP/1 listener ([[OtlpReceiver]] routes both transports into the
  * same MemoryStream sources, so the two transports share one decode +
  * layout path).
  */
/** `maxMessageBytes` (0 = unlimited) is the maxInboundMessageSize
  * every production gRPC server enforces: it bounds BOTH the buffered
  * request body per HTTP/2 stream and the per-message decompressed
  * size, so a single malicious or misconfigured client cannot exhaust
  * driver memory at the ingest edge. Violations answer grpc-status 8
  * (RESOURCE_EXHAUSTED), as do [[Admission.ResourceExhausted]] sheds
  * thrown by the per-path consumer.
  */
final class GrpcIngest(routes: Map[String, Array[Byte] => Unit],
    maxMessageBytes: Long = 0L) {

  private var group: NioEventLoopGroup = _
  private var serverCh: Channel = _

  def start(port: Int = 0): Int = {
    group = new NioEventLoopGroup(2)
    val b = new ServerBootstrap()
      .group(group)
      .channel(classOf[NioServerSocketChannel])
      .childHandler(new ChannelInitializer[SocketChannel] {
        override def initChannel(c: SocketChannel): Unit = {
          c.pipeline().addLast(
            Http2FrameCodecBuilder.forServer().build(),
            new Http2MultiplexHandler(new ChannelInitializer[Channel] {
              override def initChannel(sc: Channel): Unit = {
                sc.pipeline().addLast(new StreamHandler); ()
              }
            }))
          ()
        }
      })
    serverCh = b.bind("127.0.0.1", port).sync().channel()
    serverCh.localAddress().asInstanceOf[java.net.InetSocketAddress].getPort
  }

  def stop(): Unit = {
    if (serverCh != null) serverCh.close().sync()
    if (group != null) { group.shutdownGracefully().sync(); () }
  }

  /** One instance per HTTP/2 stream (the multiplex handler creates a
    * child channel per stream): buffers DATA frames until end-of-stream,
    * then parses the gRPC frames and responds with trailers.
    */
  private final class StreamHandler extends ChannelInboundHandlerAdapter {
    private var path = ""
    private var encoding = "identity"
    private var overBudget = false
    private val body = new java.io.ByteArrayOutputStream()

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
      msg match {
        case h: Http2HeadersFrame =>
          path = Option(h.headers().path()).map(_.toString).getOrElse("")
          encoding = Option(h.headers().get("grpc-encoding"))
            .map(_.toString).getOrElse("identity")
          if (h.isEndStream) respond(ctx)
        case d: Http2DataFrame =>
          val c = d.content()
          val arr = new Array[Byte](c.readableBytes())
          c.readBytes(arr)
          val end = d.isEndStream
          d.release()
          // size cap while BUFFERING: an over-budget stream stops
          // accumulating immediately (the rest of its frames are
          // drained and dropped) and answers RESOURCE_EXHAUSTED
          if (!overBudget) {
            if (maxMessageBytes > 0 &&
                body.size().toLong + arr.length > maxMessageBytes) {
              overBudget = true
              body.reset()
            } else body.write(arr)
          }
          if (end) respond(ctx)
        case other => ReferenceCountUtil.release(other); ()
      }

    private def respond(ctx: ChannelHandlerContext): Unit = {
      // gRPC status codes (public): 0 OK, 3 INVALID_ARGUMENT,
      // 8 RESOURCE_EXHAUSTED, 12 UNIMPLEMENTED
      val (status, message) =
        try routes.get(path) match {
          case None => (12, s"unknown method $path")
          case Some(consume) =>
            if (overBudget)
              throw new Admission.ResourceExhausted(
                s"message exceeds $maxMessageBytes byte limit")
            val bytes = body.toByteArray
            var i = 0
            while (i < bytes.length) {
              if (i + 5 > bytes.length)
                throw new IllegalArgumentException("truncated gRPC frame")
              val compressed = bytes(i) == 1
              val len = ((bytes(i + 1) & 0xff) << 24) |
                ((bytes(i + 2) & 0xff) << 16) |
                ((bytes(i + 3) & 0xff) << 8) | (bytes(i + 4) & 0xff)
              if (len < 0 || i + 5 + len > bytes.length)
                throw new IllegalArgumentException("truncated gRPC message")
              val raw = java.util.Arrays.copyOfRange(bytes, i + 5, i + 5 + len)
              val payload =
                if (!compressed) raw
                else if (encoding == "gzip")
                  // decompressed-size cap: a tiny frame can otherwise
                  // inflate to GBs before the consumer sees it
                  Admission.gunzipBounded(raw, maxMessageBytes)
                else throw new IllegalArgumentException(
                  s"unsupported grpc-encoding: $encoding")
              consume(payload)
              i += 5 + len
            }
            (0, "")
        } catch {
          case e: Admission.ResourceExhausted =>
            (8, Option(e.getMessage).getOrElse("resource exhausted"))
          case e: Exception => (3, Option(e.getMessage).getOrElse("bad request"))
        }
      val headers = new DefaultHttp2Headers().status("200")
      headers.set("content-type", "application/grpc")
      ctx.write(new DefaultHttp2HeadersFrame(headers, false))
      if (status == 0)
        // empty Export*ServiceResponse message (zero-field protobuf):
        // one uncompressed frame of length 0
        ctx.write(new DefaultHttp2DataFrame(
          Unpooled.wrappedBuffer(Array[Byte](0, 0, 0, 0, 0)), false))
      val trailers = new DefaultHttp2Headers()
      trailers.set("grpc-status", status.toString)
      if (message.nonEmpty)
        trailers.set("grpc-message",
          java.net.URLEncoder.encode(message, UTF_8).replace("+", "%20"))
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(trailers, true))
      ()
    }
  }
}
