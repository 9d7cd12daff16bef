package graft
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(5, false)
    spark.stop()
  }
}
