package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt → the applicable `(prefix, allow)` rule list for one
  * agent ([[graft.operators.Robots]] has the semantics contract).
  * One pass over the body per row, codegen'd via the static helper
  * (the [[BpeEncodeExpr]] reference-object pattern for the agent
  * string). Group selection happens HERE (not downstream) so the
  * emitted array is already the one group that governs this agent —
  * the downstream allow decision is pure array arithmetic.
  */
case class RobotsRulesExpr(child: Expression, agent: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("prefix", StringType, nullable = false),
      StructField("allow", BooleanType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    RobotsRulesExpr.compute(input.asInstanceOf[UTF8String], agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("agent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RobotsRulesExpr.compute($c, $agentRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RobotsRulesExpr {

  private final case class Group(
      tokens: ArrayBuffer[String], rules: ArrayBuffer[(String, Boolean)])

  /** Parse `body` and return the governing group's rules for `agent`:
    * groups are runs of consecutive `User-agent` lines followed by
    * their rules; the winner is the group whose agent token is the
    * longest case-insensitive substring of `agent` (ties → first in
    * file), with the `*` group as score-zero fallback; comments
    * (`# …`) strip anywhere, keys are case-insensitive, empty rule
    * paths are no-ops, rule lines before any `User-agent` are
    * ignored per RFC 9309.
    */
  def compute(body: UTF8String, agent: String): ArrayData = {
    val agentLc = agent.toLowerCase
    val groups = ArrayBuffer.empty[Group]
    var current: Group = null
    var inAgentRun = false
    body.toString.split("\n", -1).foreach { raw =>
      val noComment = {
        val i = raw.indexOf('#')
        if (i >= 0) raw.substring(0, i) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) {
              current = Group(ArrayBuffer.empty, ArrayBuffer.empty)
              groups += current
              inAgentRun = true
            }
            if (value.nonEmpty) current.tokens += value.toLowerCase
          case "allow" | "disallow" =>
            inAgentRun = false
            if (current != null && value.nonEmpty)
              current.rules += ((value, key == "allow"))
          case _ => // Crawl-delay / Sitemap / unknown: close the
            // agent run but contribute nothing
            inAgentRun = false
        }
      }
    }
    var best: Group = null
    var bestScore = -1
    groups.foreach { g =>
      val score = g.tokens.foldLeft(-1) { (acc, t) =>
        val s =
          if (t == "*") 0
          else if (agentLc.contains(t)) t.length
          else -1
        math.max(acc, s)
      }
      if (score > bestScore) { bestScore = score; best = g }
    }
    val rules = if (best == null) ArrayBuffer.empty[(String, Boolean)]
                else best.rules
    new GenericArrayData(rules.map { case (p, a) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(p), a))
    }.toArray[Any])
  }
}
