package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt → the applicable `(pattern, allow)` rule list for one
  * agent ([[graft.operators.Robots]] has the semantics contract).
  * One pass over the body per row, codegen'd via the static helper
  * (the [[BpeEncodeExpr]] reference-object pattern for the agent
  * string). Group selection happens HERE (not downstream) so the
  * emitted array is already the one group that governs this agent —
  * the downstream allow decision ([[RobotsAllowExpr]]) is a single
  * pass over that array.
  */
case class RobotsRulesExpr(child: Expression, agent: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pattern", StringType, nullable = false),
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
      tokens: ArrayBuffer[String], rules: ArrayBuffer[(String, Boolean)]) {
    var crawlDelay: java.lang.Double = null
  }

  // precompiled: this expression family's contract is no per-row
  // regex compilation, and the delay parse runs once per Crawl-delay
  // line of every row-evaluated body
  private val DelayRe = java.util.regex.Pattern.compile("[0-9]+(\\.[0-9]+)?")

  /** The PRODUCT TOKEN of a crawler agent string per RFC 9309 §2.2.1:
    * the agent identifier up to (not including) the first `/` —
    * `graftbot/1.0 (+https://…)` → `graftbot` — lowercased for the
    * case-insensitive group match. Group tokens match by PREFIX of
    * this token (`graft` governs `graftbot`), never by substring of
    * the full agent string: containment would let an unrelated
    * group whose token happens to appear inside the version/comment
    * tail (`bot`, `aftbot/1.0`) silently bind this crawler.
    */
  def productToken(agent: String): String = {
    val slash = agent.indexOf('/')
    (if (slash >= 0) agent.substring(0, slash) else agent).trim.toLowerCase
  }

  /** The product token of a GROUP's `User-agent:` value — the robots
    * body side of the match. Google's parser extracts the product
    * token from the group line too (a site publishing
    * `User-agent: graftbot/1.0` means to bind graftbot, not a bot
    * whose product token happens to contain a slash), so the value is
    * truncated at its first non-product-token octet (anything outside
    * `[a-z_-]` after lowercasing, the robots.cc alphabet). `*` is the
    * wildcard group, kept verbatim; a value with NO leading
    * product-token octet (e.g. `1bot`) yields the empty string, which
    * [[selectGroup]] skips — an empty token is a prefix of everything
    * and would otherwise bind like a second `*`. Only the EXACT `*`
    * value is the wildcard group: a malformed `*bot` tokenizes to the
    * empty string and matches nothing (robots.cc extracts no token
    * from it), never to a second wildcard that could out-tie the real
    * one on file order.
    */
  def groupToken(value: String): String = {
    val v = value.trim.toLowerCase
    if (v == "*") "*"
    else v.takeWhile(c => (c >= 'a' && c <= 'z') || c == '_' || c == '-')
  }

  /** Parse `body` and return the governing group's rules for `agent`:
    * groups are runs of consecutive `User-agent` lines followed by
    * their rules; the winner is the group whose agent token is the
    * longest case-insensitive PREFIX of the agent's product token
    * (ties → first in file), with the `*` group as score-zero
    * fallback; comments (`# …`) strip anywhere, keys are
    * case-insensitive, empty rule paths are no-ops, rule lines before
    * any `User-agent` are ignored per RFC 9309. Rule values keep
    * their raw pattern text — `*` wildcards and the `$` end anchor
    * are interpreted at match time by [[RobotsAllowExpr]].
    */
  private def selectGroup(body: UTF8String, agent: String): Group = {
    val token = productToken(agent)
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
            if (value.nonEmpty) {
              // tokenize the group value too (ADVICE r15): a group
              // line `User-agent: graftbot/1.0` must bind graftbot
              val t = groupToken(value)
              if (t.nonEmpty) current.tokens += t
            }
          case "allow" | "disallow" =>
            inAgentRun = false
            if (current != null && value.nonEmpty)
              current.rules += ((value, key == "allow"))
          case "crawl-delay" =>
            // the de-facto extension (not RFC 9309, but honored by
            // most crawlers): per-GROUP fetch spacing in seconds;
            // unparseable values are ignored like any unknown line.
            // Strict decimal form only (ADVICE r15): Double.valueOf
            // also accepts NaN/Infinity/hex-floats/'1.5d', and a
            // hostile NaN delay would poison the politeness
            // scheduler's not_before_s (slot × NaN) instead of being
            // ignored — a delay is a plain non-negative decimal or
            // nothing
            inAgentRun = false
            if (current != null && current.crawlDelay == null &&
                DelayRe.matcher(value).matches())
              current.crawlDelay = java.lang.Double.valueOf(value)
          case _ => // Sitemap / unknown: close the agent run but
            // contribute nothing (Sitemap is GLOBAL, not per-group —
            // graft.operators.Robots.sitemaps extracts it)
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
          else if (token.startsWith(t)) t.length
          else -1
        math.max(acc, s)
      }
      if (score > bestScore) { bestScore = score; best = g }
    }
    best
  }

  def compute(body: UTF8String, agent: String): ArrayData = {
    val best = selectGroup(body, agent)
    val rules = if (best == null) ArrayBuffer.empty[(String, Boolean)]
                else best.rules
    new GenericArrayData(rules.map { case (p, a) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(p), a))
    }.toArray[Any])
  }

  /** The governing group's `Crawl-delay` in seconds for `agent` —
    * null when the group declares none (or no group applies). First
    * declaration wins within a group.
    */
  def computeDelay(body: UTF8String, agent: String): java.lang.Double = {
    val best = selectGroup(body, agent)
    if (best == null) null else best.crawlDelay
  }
}

/** Governing-group `Crawl-delay` extraction (see
  * [[RobotsRulesExpr.computeDelay]]) — same group selection as the
  * rule list, one codegen'd pass, nullable double seconds.
  */
case class RobotsCrawlDelayExpr(child: Expression, agent: String)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RobotsRulesExpr.computeDelay(input.asInstanceOf[UTF8String], agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("agent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("delay")
      s"""java.lang.Double $boxed =
         |  graft.functions.RobotsRulesExpr.computeDelay($c, $agentRef);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Longest-match allow decision for one URL path against a
  * [[RobotsRulesExpr]] rule array, with full RFC 9309 §2.2.3 pattern
  * semantics: `*` in a rule matches any run of characters (including
  * none), a trailing `$` anchors the rule to the END of the path
  * (a `$` anywhere else is a literal octet, per the Google
  * robots.txt parser). Specificity is the raw pattern's octet length
  * (`*` and `$` count — the googlebot/robots.cc convention), most
  * octets win, length ties resolve to Allow. An EMPTY path evaluates
  * as `/` (RFC 9309 §2.2.2: the URI path defaults to `/`), so
  * `Disallow: /` blocks the bare host URL. No matching rule → true;
  * null rules (no robots.txt) → null (callers coalesce to allowed).
  *
  * Single codegen'd pass over the (tiny, per-host) rule array — no
  * per-row regex compilation, no lambda dispatch.
  */
case class RobotsAllowExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(rules: Any, path: Any): Any =
    RobotsAllowExpr.compute(
      rules.asInstanceOf[ArrayData], path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, p) =>
      s"${ev.value} = graft.functions.RobotsAllowExpr.compute($r, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RobotsAllowExpr {

  /** Does `path` match robots rule `pattern`? Anchored at the path
    * start; `*` spans any run; a trailing `$` pins the match to the
    * path end. Greedy earliest-fit per literal segment is exact here:
    * matching each segment as early as possible only ever leaves MORE
    * room for the rest, and the one end-anchored segment is checked
    * against the suffix directly.
    */
  def matches(path: String, pattern: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts = pat.split("\\*", -1)
    if (!path.startsWith(parts(0))) return false
    var pos = parts(0).length
    var i = 1
    while (i < parts.length) {
      val p = parts(i)
      if (i == parts.length - 1 && anchored) {
        return path.endsWith(p) && path.length - p.length >= pos
      }
      val idx = path.indexOf(p, pos)
      if (idx < 0) return false
      pos = idx + p.length
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  def compute(rules: ArrayData, pathU: UTF8String): Boolean = {
    val raw = pathU.toString
    val path = if (raw.isEmpty) "/" else raw
    var bestLen = -1
    var bestAllow = true
    var i = 0
    val n = rules.numElements()
    while (i < n) {
      val row = rules.getStruct(i, 2)
      val pattern = row.getUTF8String(0).toString
      if (matches(path, pattern)) {
        val len = pattern.length
        val allow = row.getBoolean(1)
        // most octets win; exact ties resolve to allow
        if (len > bestLen || (len == bestLen && allow)) {
          bestLen = len
          bestAllow = allow
        }
      }
      i += 1
    }
    bestLen < 0 || bestAllow
  }
}
