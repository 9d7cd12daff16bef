package graft

/** Regenerates the COMMITTED [[graft.operators.UnigramVocab]] table —
  * run against the sf0.01 corpus and paste the emitted rows into
  * `UnigramVocab.scala` whenever the training corpus or the trainer's
  * committed hyper-parameters change:
  *
  *   runMain graft.UnigramVocabGen /root/testdata/sf0.01
  */
object UnigramVocabGen {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.get()
    val vocab = graft.operators.Unigram.trainVocab(
      Tables.documents(spark, dir), "text",
      vocabSize = 400, maxPieceLen = 4, maxWords = 5000, emIters = 2)
    println(s"[unigram-vocab] pieces=${vocab.size}")
    vocab.grouped(4).foreach { g =>
      println(g.map { case (p, s) =>
        "(\"" + p.replace("\\", "\\\\").replace("\"", "\\\"") + "\", " + s + "L)"
      }.mkString("    ", ", ", ","))
    }
    spark.stop()
    sys.exit(0)
  }
}
