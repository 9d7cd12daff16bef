package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.get()
    args.drop(1).foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[benchone] $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
