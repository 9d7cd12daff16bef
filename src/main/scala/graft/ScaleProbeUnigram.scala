package graft

/** Unigram-trainer driver-cost probe (round-19 verdict task 4):
  * [[graft.operators.Unigram.trainOnDict]] runs seeding + EM on the
  * DRIVER over the maxWords-bounded dict — this main measures its
  * wall/heap at dict sizes 100k and 1M with `maxPieceLen = 8` so the
  * guard cap (and the BASELINE entry) is a number, not a guess.
  *
  * The synthetic dict is deterministic (seeded PRNG): zipf-weighted
  * word frequencies, lengths 3–12 — the shape a real top-N corpus
  * dict has. No SparkSession: the cost under test is driver-side.
  *
  * `runMain graft.ScaleProbeUnigram <maxWords> <maxPieceLen>
  * [vocabSize] [emIters]`
  */
object ScaleProbeUnigram {
  def main(args: Array[String]): Unit = {
    val maxWords = args(0).toInt
    val pieceLen = if (args.length > 1) args(1).toInt else 8
    val vocabSize = if (args.length > 2) args(2).toInt else 30000
    val emIters = if (args.length > 3) args(3).toInt else 2

    val rnd = new java.util.Random(0x5eedL)
    val seen = new java.util.HashSet[String]()
    val dict = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (dict.length < maxWords) {
      val len = 3 + rnd.nextInt(10)
      val sb = new StringBuilder(len)
      (0 until len).foreach(_ => sb.append(('a' + rnd.nextInt(26)).toChar))
      val w = sb.toString
      if (seen.add(w))
        dict += ((w, math.max(1L, maxWords.toLong / (dict.length + 1))))
    }
    val totalChars = dict.iterator.map(_._1.length.toLong).sum
    val cells = dict.iterator.map { case (w, _) =>
      w.length.toLong * math.min(w.length, pieceLen) }.sum
    println(s"[probe] dict=$maxWords chars=$totalChars " +
      s"substringCells=$cells pieceLen=$pieceLen vocab=$vocabSize em=$emIters")

    def usedMb(): Long = {
      System.gc()
      val r = Runtime.getRuntime
      (r.totalMemory - r.freeMemory) >> 20
    }
    val m0 = usedMb()
    // transient peak (the seed candidate map dwarfs the end state):
    // sample used heap at 50 ms during the run
    @volatile var peakMb = 0L
    @volatile var stop = false
    val mon = new Thread(() => {
      val r = Runtime.getRuntime
      while (!stop) {
        peakMb = math.max(peakMb, (r.totalMemory - r.freeMemory) >> 20)
        Thread.sleep(50L)
      }
    })
    mon.setDaemon(true); mon.start()
    val t0 = System.nanoTime()
    val vocab = graft.operators.Unigram.trainOnDict(
      dict.toSeq, vocabSize, pieceLen, emIters, seedSize = 8 * vocabSize)
    val wall = (System.nanoTime() - t0) / 1e9
    stop = true
    val m1 = usedMb()
    println(f"[probe] trainOnDict wall $wall%.1f s heapDelta=${m1 - m0} MB " +
      s"heapPeak=$peakMb MB vocabOut=${vocab.size}")
  }
}
