package graft

/** Generic per-job profiler (round 19, dev probe): runs named queries
  * through the noop sink with a SparkListener recording every job's
  * wall-clock and call site, then prints the per-job breakdown of the
  * LAST (warm) run. Attributes a replay query's fixed cost to its
  * micro-jobs — the measurement the per-tick job-count trims are
  * driven by.
  *
  * `runMain graft.ProbeJobs <sfDir> <query> [query...]`
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession.get()
    val jobs = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, String)]() // id -> (startNs, site)
    val starts = new java.util.concurrent.ConcurrentHashMap[
      Integer, java.lang.Long]() // id -> startNs (kept after job end)
    val done = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Double, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))
              .orElse(Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          val t = System.nanoTime()
          jobs.put(j.jobId, (t, site))
          starts.put(j.jobId, t); ()
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.remove(j.jobId)).foreach { case (t0, site) =>
            done.add((j.jobId, (System.nanoTime() - t0) / 1e9, site))
          }
          ()
        }
      })
    names.foreach { n =>
      (1 to 3).foreach { rep =>
        done.clear()
        starts.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.listTables().collect()
          .map(_.name).filter(_.startsWith("graft_stream_snap_"))
          .foreach(spark.catalog.dropTempView)
        // drain listener events before reading (listenerBus is
        // private[spark]; a short sleep suffices for a dev probe)
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        val all = done.asScala.toSeq.sortBy(_._1)
        println(f"[probe] $n rep$rep wall ${wall}%.3f s jobs=${all.size} " +
          f"jobSum=${all.map(_._2).sum}%.3f s")
        if (rep == 3) {
          // gap attribution (round 20): the driver time BETWEEN jobs
          // (planning, fs ops, checkpoint commits) is charged to the
          // job that follows it — the between-job cost the job-count
          // trims attack is otherwise invisible in per-job durations
          var prevEnd = t0
          all.foreach { case (id, s, site) =>
            val st = starts.getOrDefault(id, prevEnd)
            val gap = math.max(0L, st - prevEnd) / 1e9
            prevEnd = math.max(prevEnd, st + (s * 1e9).toLong)
            println(f"[probe]   job$id%-5d ${s}%7.3f s  gap ${gap}%6.3f s  $site")
          }
        }
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
