package graft

/** Plan inspector: prints the formatted physical plan for the named
  * queries (all headline queries by default) against a given sf dir.
  * Used to audit pushdown, broadcast choice, and codegen spans —
  * `.explain` is part of the build loop, not an afterthought.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchNames
    val spark = GraftSession.get()
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
