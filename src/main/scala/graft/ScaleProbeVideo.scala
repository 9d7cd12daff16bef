package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Scale probe for the video/crossmodal family (round-11 verdict task
  * 6): the driver-gate video queries pin a FIXED planted fixture
  * (`doc_id < 200` — bounded for oracle tractability), so corpus
  * amplification does not scale them; this main synthesizes the same
  * planted layout at a caller-chosen N and times the operators
  * themselves.
  *
  * `runMain graft.ScaleProbeVideo <n> [<n>...]` — per N it times:
  *  - `video_neardup_pattern`: full shared-scene pairing over N
  *    pattern videos (N/4 in planted pairs, like the query's 50/200),
  *    through the geometric double-block.
  *  - `avi_decode`: MJPEG-in-AVI demux + per-frame `javax.imageio`
  *    decode + energy fingerprint over N real containers — the
  *    map-only stage. (The PAIRING stage is shared with the pattern
  *    path above; the uniform-gray AVI fixture has only 256 possible
  *    fingerprints, so pairing IT at large N measures a fixture
  *    collision artifact, not the operator.)
  *  - `video_gate`: the streaming gate's two parity batches over the
  *    planted corpus (state write + banded state join + CC).
  *
  * Protocol matches BASELINE.md's probe rules: run with
  * `SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g`, lead with a sponge
  * pass, take warm mins across repeats.
  */
object ScaleProbeVideo {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(200, 2000, 20000)
    val spark = GraftSession.get()

    def planted(n: Int) = spark.range(n).select(
      col("id").as("doc_id"),
      (col("id") + 5000L).as("__seed"),
      when(col("id") < n / 4, expr("id div 2") + 7000L)
        .otherwise(lit(0L)).as("__shseed"),
      when(col("id") < n / 4, lit(0)).otherwise(lit(-1)).as("__shfrom"),
      when(col("id") < n / 4, lit(30)).otherwise(lit(0)).as("__shcount"))

    def time(tag: String, n: Int, reps: Int = 2)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag n=$n min=${ts.min}%.2f s (of ${ts.mkString(", ")})")
      System.gc()
    }

    ns.foreach { n =>
      // sponge/warm pass at the smallest shape
      Multimodal.videoNearDup(
        Multimodal.withPatternVideo(planted(100), "__seed", "__shseed",
          "__shfrom", "__shcount"), "doc_id", "video")
        .write.format("noop").mode("overwrite").save()

      time("video_neardup_pattern", n) {
        Multimodal.videoNearDup(
          Multimodal.withPatternVideo(planted(n), "__seed", "__shseed",
            "__shfrom", "__shcount"), "doc_id", "video")
          .write.format("noop").mode("overwrite").save()
      }
      time("avi_decode", n) {
        Multimodal.withAviFrameEnergies(
          Multimodal.withMjpegAviVideo(planted(n), "__seed", "__shseed",
            "__shfrom", "__shcount"), "video")
          .select(col("doc_id"), col("frames"))
          .write.format("noop").mode("overwrite").save()
      }
      time("video_neardup_hashed", n) {
        Multimodal.videoNearDupHashed(
          Multimodal.withPatternVideo(planted(n), "__seed", "__shseed",
            "__shfrom", "__shcount"), "doc_id", "video")
          .write.format("noop").mode("overwrite").save()
      }
      time("video_gate", n, reps = 1) {
        val vids = Multimodal.withPatternVideo(planted(n), "__seed",
          "__shseed", "__shfrom", "__shcount")
        val state = graft.streaming.Scratch.tmpDir("probe_vidgate")
        graft.streaming.VideoGate.acceptBatch(
          vids.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "video", state)
          .write.format("noop").mode("overwrite").save()
        graft.streaming.VideoGate.acceptBatch(
          vids.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "video", state)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
