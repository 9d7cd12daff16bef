package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps
  * total test time dominated by queries, not startup).
  */
object SparkSpecBase {
  lazy val spark: SparkSession = GraftSession.get("4")
}

trait SparkSpecBase extends AnyFunSuite {
  // stable identifier (val, not def) so `import spark.implicits._` works
  lazy val spark: SparkSession = SparkSpecBase.spark
  def resource(name: String): String =
    getClass.getResource(name).getPath
}
