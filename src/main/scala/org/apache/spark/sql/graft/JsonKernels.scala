/* Hosted under org.apache.spark.sql because Catalyst's extension surface
 * is private[sql] — the standard placement for third-party native
 * expressions. */
package org.apache.spark.sql.graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GetJsonObject, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared-parse JSON extraction — the engine's analog of the reference's
  * JsonStatementOptimizer (pinot-core/.../query/optimizer/statement/
  * JsonStatementOptimizer.java): a statement touching N json paths of
  * the same column should parse the document ONCE, not N times.
  * Spark's `GetJsonObject` re-parses the document per call; a projection
  * extracting four paths from one `props` column pays four full parses
  * per row. [[JsonExtractMulti]] (built by
  * [[graft.rules.JsonSharedParse]]) parses once into a Jackson tree and
  * walks every path.
  *
  * Bit-parity contract with `get_json_object`: the tree walk handles the
  * SIMPLE regime — `$.field`, `[n]`, one `[*]` — and each row that steps
  * outside it (field access on an array, wildcard over non-arrays,
  * wildcard matches that are themselves arrays, unparseable documents)
  * is answered by delegating that row to a real `GetJsonObject`, so
  * results are identical by construction for every input. Number
  * formatting matches because both sides serialize through Jackson's
  * writer (floats parse to DoubleNode exactly as GetJsonObject's
  * copyCurrentEvent re-serializes the double token). Known divergence:
  * duplicate keys inside one JSON object (the tree keeps the last, the
  * stream matches each) — out of scope for the gates, documented here. */
object JsonKernels {

  sealed trait Step extends Serializable
  final case class FieldStep(name: String) extends Step
  final case class IndexStep(i: Int) extends Step
  case object WildStep extends Step

  /** Compile a json path into walk steps; None when the path uses
    * features outside the simple grammar (`$` alone, quoted brackets,
    * multiple wildcards, recursive descent) — the rewrite rule then
    * leaves those calls on stock GetJsonObject. */
  def compile(path: String): Option[Array[Step]] = {
    if (path == null || !path.startsWith("$")) return None
    val steps = scala.collection.mutable.ArrayBuffer.empty[Step]
    var wilds = 0
    var i = 1
    while (i < path.length) {
      path.charAt(i) match {
        case '.' =>
          var j = i + 1
          while (j < path.length && path.charAt(j) != '.' &&
            path.charAt(j) != '[') j += 1
          val name = path.substring(i + 1, j)
          if (name.isEmpty || name.contains('*')) return None
          steps += FieldStep(name)
          i = j
        case '[' =>
          val j = path.indexOf(']', i)
          if (j < 0) return None
          val body = path.substring(i + 1, j).trim
          if (body == "*") { steps += WildStep; wilds += 1 }
          else if (body.nonEmpty && body.forall(_.isDigit))
            steps += IndexStep(body.toInt)
          else return None
          i = j + 1
        case _ => return None
      }
    }
    if (steps.isEmpty || wilds > 1) None else Some(steps.toArray)
  }

  def supported(path: String): Boolean = compile(path).isDefined

  /** Pre-compiled path set riding into codegen as one reference object;
    * the per-path GetJsonObject fallbacks are transient (rebuilt on the
    * executor) and evaluated only for out-of-regime rows. */
  final class Compiled(val raw: Array[String]) extends Serializable {
    val steps: Array[Array[Step]] = raw.map(p => compile(p).get)
    @transient private lazy val fallback: Array[GetJsonObject] =
      raw.map(p => GetJsonObject(
        BoundReference(0, StringType, nullable = false),
        Literal(UTF8String.fromString(p), StringType)))
    def fallbackEval(doc: UTF8String, i: Int): UTF8String =
      fallback(i).eval(InternalRow(doc)).asInstanceOf[UTF8String]
  }

  private val mapper = new ObjectMapper()

  /** One parse, every path: the hot kernel. Returns array<string> in
    * path order (null element = no match, exactly GetJsonObject's
    * verdict for that path). */
  def extractMulti(doc: UTF8String, c: Compiled): ArrayData = {
    val n = c.steps.length
    val out = new Array[AnyRef](n)
    val tree =
      try mapper.readTree(doc.toString)
      catch { case scala.util.control.NonFatal(_) => null }
    var i = 0
    while (i < n) {
      out(i) =
        if (tree == null) c.fallbackEval(doc, i) // unparseable → delegate
        else walk(tree, c.steps(i)) match {
          case null => c.fallbackEval(doc, i) // out-of-regime → delegate
          case (ms, wild) => format(ms, wild)
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** null = out of regime; otherwise (matches, sawWildcard). */
  private def walk(root: JsonNode, steps: Array[Step])
  : (java.util.ArrayList[JsonNode], Boolean) = {
    var cur = new java.util.ArrayList[JsonNode](1)
    cur.add(root)
    var wild = false
    var s = 0
    while (s < steps.length) {
      val next = new java.util.ArrayList[JsonNode](cur.size)
      var k = 0
      steps(s) match {
        case FieldStep(name) =>
          while (k < cur.size) {
            val c = cur.get(k)
            if (c.isArray) return null // stream-vs-tree semantics differ
            if (c.isObject) {
              val v = c.get(name)
              if (v != null) next.add(v)
            }
            k += 1
          }
        case IndexStep(ix) =>
          while (k < cur.size) {
            val c = cur.get(k)
            if (!c.isArray) return null
            if (ix < c.size) next.add(c.get(ix))
            k += 1
          }
        case WildStep =>
          wild = true
          while (k < cur.size) {
            val c = cur.get(k)
            if (!c.isArray) return null
            var e = 0
            while (e < c.size) { next.add(c.get(e)); e += 1 }
            k += 1
          }
      }
      cur = next
      if (cur.isEmpty) return (cur, wild) // no match — a regime answer
      s += 1
    }
    if (wild) {
      // a wildcard match that is itself an array triggers GetJsonObject's
      // flatten style, and a matched JSON null's in-array serialization
      // is the stream writer's business — delegate both
      var k = 0
      while (k < cur.size) {
        if (cur.get(k).isArray || cur.get(k).isNull) return null
        k += 1
      }
    }
    (cur, wild)
  }

  /** GetJsonObject's output contract: no match → null; single
    * non-wildcard match → raw text for strings, compact json otherwise;
    * single wildcard match → compact json (strings stay QUOTED); many →
    * a json array of compact values. */
  private def format(ms: java.util.ArrayList[JsonNode],
                     wild: Boolean): UTF8String =
    if (ms.isEmpty) null
    else if (!wild) {
      val m = ms.get(0)
      if (m.isNull) null // a JSON null IS SQL null to get_json_object
      else UTF8String.fromString(
        if (m.isTextual) m.textValue else m.toString)
    } else if (ms.size == 1) UTF8String.fromString(ms.get(0).toString)
    else {
      val sb = new java.lang.StringBuilder(32)
      sb.append('[')
      var k = 0
      while (k < ms.size) {
        if (k > 0) sb.append(',')
        sb.append(ms.get(k).toString)
        k += 1
      }
      sb.append(']')
      UTF8String.fromString(sb.toString)
    }
}

/** `array<string>` of `get_json_object(json, path)` for every path, off
  * ONE document parse (see [[JsonKernels]]). Built only by
  * [[graft.rules.JsonSharedParse]]; instances with equal (child, paths)
  * are structurally equal, which is what lets whole-stage codegen's
  * subexpression elimination evaluate one shared parse for a projection
  * extracting many paths. */
case class JsonExtractMulti(child: Expression, paths: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "json_extract_multi"

  @transient private lazy val compiled =
    new JsonKernels.Compiled(paths.toArray)

  override protected def nullSafeEval(doc: Any): Any =
    JsonKernels.extractMulti(doc.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode = {
    val ref = ctx.addReferenceObj("jsonPaths", compiled,
      classOf[JsonKernels.Compiled].getName)
    nullSafeCodeGen(ctx, ev, doc =>
      s"""${ev.value} = org.apache.spark.sql.graft.JsonKernels
         |  .extractMulti($doc, $ref);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
  : JsonExtractMulti = copy(child = newChild)
}
