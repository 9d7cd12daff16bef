package graft

/** Benchmark main — times the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints the one-line JSON the driver
  * ingests as `BENCH_r{N}.json`.
  *
  * Each query is fully executed via the noop DSv2 sink (`count()`
  * would let Catalyst prune the projections and under-report); one
  * untimed warm-up run amortizes JIT/codegen compilation so the
  * numbers reflect steady-state plan execution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    def runOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warm-up on the smallest corpus: JIT, codegen cache, parquet footers.
    SparkEntry.benchNames.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    val results = SparkEntry.benchNames.map { name =>
      val t0 = System.nanoTime()
      try runOnce(name)
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
