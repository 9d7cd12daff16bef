package graft

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.ConcurrentHashMap

import graft.sources.Mqtt

/** In-process MQTT 3.1.1 broker for specs — the socket twin of
  * `RestSourceSpec`'s local HTTP server. Supports CONNECT, SUBSCRIBE
  * (exact topic or a trailing-`#` filter), PUBLISH QoS 0/1 (PUBACK to
  * the publisher; forwarded to subscribers at QoS 0), PING and
  * DISCONNECT — the surface [[graft.sources.Mqtt]] speaks.
  */
final class MiniMqttBroker extends AutoCloseable {

  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort

  // subscriber filter -> set of connection output streams
  private val subs = new ConcurrentHashMap[DataOutputStream, List[String]]()
  @volatile private var running = true

  private def matches(filter: String, topic: String): Boolean =
    filter == topic ||
      (filter.endsWith("#") && topic.startsWith(filter.dropRight(1)))

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      val c = Mqtt.readPacket(in)
      require(c.ptype == Mqtt.CONNECT, s"first packet must be CONNECT, got ${c.ptype}")
      out.synchronized {
        Mqtt.writePacket(out, Mqtt.CONNACK, 0, Array[Byte](0, 0))
      }
      while (running) {
        val p = Mqtt.readPacket(in)
        p.ptype match {
          case Mqtt.SUBSCRIBE =>
            val pid = ((p.body(0) & 0xFF) << 8) | (p.body(1) & 0xFF)
            var off = 2
            var filters = List.empty[String]
            while (off < p.body.length) {
              val (f, next) = Mqtt.readUtf8(p.body, off)
              filters ::= f
              off = next + 1 // requested qos byte
            }
            subs.merge(out, filters, (a, b) => a ++ b)
            out.synchronized {
              Mqtt.writePacket(out, Mqtt.SUBACK, 0,
                Array[Byte]((pid >>> 8).toByte, (pid & 0xFF).toByte) ++
                  filters.map(_ => 0.toByte))
            }
          case Mqtt.PUBLISH =>
            val qos = (p.flags >> 1) & 0x03
            val (topic, afterTopic) = Mqtt.readUtf8(p.body, 0)
            val payloadOff = if (qos > 0) afterTopic + 2 else afterTopic
            if (qos > 0) {
              val pid = ((p.body(afterTopic) & 0xFF) << 8) | (p.body(afterTopic + 1) & 0xFF)
              out.synchronized {
                Mqtt.writePacket(out, Mqtt.PUBACK, 0,
                  Array[Byte]((pid >>> 8).toByte, (pid & 0xFF).toByte))
              }
            }
            val fwd = Mqtt.utf8(topic) ++
              java.util.Arrays.copyOfRange(p.body, payloadOff, p.body.length)
            subs.forEach { (sub, filters) =>
              if (filters.exists(matches(_, topic)))
                try sub.synchronized { Mqtt.writePacket(sub, Mqtt.PUBLISH, 0, fwd) }
                catch { case _: Throwable => subs.remove(sub) }
            }
          case Mqtt.PINGREQ =>
            out.synchronized { Mqtt.writePacket(out, Mqtt.PINGRESP, 0, Array.empty) }
          case Mqtt.DISCONNECT =>
            throw new EOFException("client disconnected")
          case Mqtt.PUBACK => () // subscriber acking a forwarded qos-1 (not sent)
          case other => throw new IllegalStateException(s"unexpected packet $other")
        }
      }
    } catch {
      case _: EOFException | _: SocketException => ()
    } finally {
      subs.remove(out)
      try sock.close() catch { case _: Throwable => () }
    }
  }

  private val acceptor = new Thread(() =>
    try {
      while (running) {
        val s = server.accept()
        val t = new Thread(() => handle(s), "mini-mqtt-conn")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: SocketException => () }, "mini-mqtt-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = {
    running = false
    server.close()
  }
}
