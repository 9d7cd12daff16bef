package graft

import java.nio.file.{Files, Paths}

/** Single-query slice of [[Verify]] for fast local iteration:
  * `runMain graft.VerifyOne <sfDir> <outDir> <name> [name...]` dumps
  * only the named queries (plus their oracle SQL), so
  * `scripts/check.py` can diff one new query in seconds instead of
  * re-running the full 100+-query dump.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifyOne <sfDir> <outDir> <name>...")
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      println(s"[verify] $name dumped")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
