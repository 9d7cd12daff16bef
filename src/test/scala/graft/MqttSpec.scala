package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.sources.{Mqtt, MqttLanding}

/** MQTT connector ([[graft.sources.Mqtt]]) against the in-process
  * broker: codec round-trips, pub/sub delivery, QoS-1 acks, the
  * executor-side publish sink, and the landing daemon feeding a REAL
  * file-stream Structured Streaming query — the reference's
  * broker-backed pipeline shape end to end.
  */
class MqttSpec extends SparkSpecBase {

  private def eventually[T](maxMs: Long = 10000)(f: => T): T = {
    val deadline = System.currentTimeMillis() + maxMs
    var last: Throwable = null
    while (System.currentTimeMillis() < deadline) {
      try return f
      catch { case e: Throwable => last = e; Thread.sleep(50) }
    }
    throw last
  }

  test("remaining-length varint round-trips across the size classes") {
    for (n <- Seq(0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 268435455)) {
      val bos = new java.io.ByteArrayOutputStream()
      Mqtt.writeRemainingLength(bos, n)
      val in = new java.io.ByteArrayInputStream(bos.toByteArray)
      assert(Mqtt.readRemainingLength(in) === n)
    }
  }

  test("publish/subscribe through the broker delivers payloads in order (qos 0 and 1)") {
    val broker = new MiniMqttBroker
    try {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val sub = new Mqtt.Client("127.0.0.1", broker.port, "spec-sub").connect()
      sub.subscribe(Seq("fuel/raw"))
      val pump = new Thread(() => sub.receiveLoop((_, p) =>
        got.add(new String(p, StandardCharsets.UTF_8))))
      pump.setDaemon(true)
      pump.start()

      val pub = new Mqtt.Client("127.0.0.1", broker.port, "spec-pub").connect()
      pub.publish("fuel/raw", "m0".getBytes, qos = 0)
      pub.publish("fuel/raw", "m1".getBytes, qos = 1) // blocks for PUBACK
      pub.publish("other/topic", "mX".getBytes, qos = 1) // not subscribed
      pub.publish("fuel/raw", "m2".getBytes, qos = 1)
      eventually() { assert(got.toArray.toSeq === Seq("m0", "m1", "m2")) }
      pub.close(); sub.close()
    } finally broker.close()
  }

  test("trailing-# filter matches nested topics") {
    val broker = new MiniMqttBroker
    try {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val sub = new Mqtt.Client("127.0.0.1", broker.port, "spec-sub2").connect()
      sub.subscribe(Seq("fuel/#"))
      val pump = new Thread(() => sub.receiveLoop((t, _) => got.add(t)))
      pump.setDaemon(true)
      pump.start()
      val pub = new Mqtt.Client("127.0.0.1", broker.port, "spec-pub2").connect()
      pub.publish("fuel/cleaned/prices", "x".getBytes, qos = 1)
      pub.publish("metrics/unrelated", "y".getBytes, qos = 1)
      eventually() { assert(got.toArray.toSeq === Seq("fuel/cleaned/prices")) }
      pub.close(); sub.close()
    } finally broker.close()
  }

  test("publishBatch publishes every row from executor-side partition clients") {
    import spark.implicits._
    val broker = new MiniMqttBroker
    try {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val sub = new Mqtt.Client("127.0.0.1", broker.port, "spec-sink-sub").connect()
      sub.subscribe(Seq("fuel/cleaned"))
      val pump = new Thread(() => sub.receiveLoop((_, p) =>
        got.add(new String(p, StandardCharsets.UTF_8))))
      pump.setDaemon(true)
      pump.start()

      val df = (1 to 100).map(i => s"""{"n":$i}""").toDF("payload")
        .repartition(8) // several executor-side clients
      val published = Mqtt.publishBatch(df, "payload", "127.0.0.1", broker.port, "fuel/cleaned")
      assert(published === 100L)
      eventually() { assert(got.size === 100) }
      assert(got.toArray.map(_.toString).toSet ===
        (1 to 100).map(i => s"""{"n":$i}""").toSet)
      sub.close()
    } finally broker.close()
  }

  test("landing daemon bridges broker -> atomic files -> real file-stream query") {
    val broker = new MiniMqttBroker
    val landingDir = java.nio.file.Files.createTempDirectory("mqtt_landing").toString
    try {
      val landing = new MqttLanding("127.0.0.1", broker.port, "fuel/raw", landingDir)
      val pub = new Mqtt.Client("127.0.0.1", broker.port, "spec-e2e-pub").connect()
      (1 to 5).foreach(i =>
        pub.publish("fuel/raw", s"""{"station":"$i","price":${180 + i}}""".getBytes, qos = 1))
      eventually() { assert(landing.landed === 5L) }
      pub.close()

      // the downstream the reference wires to its broker: a real
      // Structured Streaming file source over the landing directory
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("station",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("price",
          org.apache.spark.sql.types.DoubleType)))
      val q = spark.readStream.schema(schema).json(landingDir)
        .writeStream.format("memory").queryName("mqtt_landed")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val rows = spark.table("mqtt_landed").collect()
        assert(rows.length === 5)
        assert(rows.map(_.getAs[Double]("price")).sorted.toSeq ===
          Seq(181.0, 182.0, 183.0, 184.0, 185.0))
      } finally q.stop()
      landing.close()
    } finally broker.close()
  }
}
