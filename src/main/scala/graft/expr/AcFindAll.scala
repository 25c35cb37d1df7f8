package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern search (Aho & Corasick CACM '75): every
  * occurrence of every dictionary term in one left-to-right pass —
  * overlapping and nested matches included ("scan" reports `scan`,
  * `can`, and `an` when all three are in the dictionary). Returns
  * array<struct<term, pos>> with 1-based character start positions, in
  * scan order (by end position, longer terms first at the same end).
  *
  * This is the dictionary-tagging primitive (blocklists, PII term
  * lists, entity gazetteers) at corpus scale: cost is O(text + hits)
  * per row REGARDLESS of dictionary size, where the naive form is
  * |dict| regex/contains passes over the corpus. The automaton (trie +
  * BFS failure links with merged outputs) is compiled once per
  * expression instance on the driver and ships to executors as a
  * codegen reference object — the broadcast-dimension pattern at the
  * expression level, as [[WordpieceTokens]].
  *
  * Determinism: pure function of (text, dict); char-indexed (UTF-16
  * units), which equals character positions for the pure-ASCII corpus
  * contract the DuckDB oracle's substr replica relies on.
  */
case class AcFindAll(child: Expression, dict: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val model = AcFindAll.Model(dict)

  override def checkInputDataTypes(): TypeCheckResult =
    if (dict.isEmpty || dict.exists(_.isEmpty))
      TypeCheckResult.TypeCheckFailure("ac_find_all needs non-empty terms")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ac_find_all requires string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    AcFindAll.compute(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acModel", model,
      classOf[AcFindAll.Model].getName)
    defineCodeGen(ctx, ev, c => s"graft.expr.AcFindAll.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): AcFindAll =
    copy(child = newChild)

  override def prettyName: String = "ac_find_all"
}

object AcFindAll {
  /** Compiled automaton: per-node char→child transitions, BFS failure
    * links, and per-node output lists merged through the failure chain
    * at build time (output(v) = terms ending at v ∪ output(fail(v))),
    * so the scan never walks fail links to report.
    */
  case class Model(dict: Seq[String]) extends Serializable {
    @transient lazy val (next, fail, out): (Array[java.util.HashMap[Character, Integer]],
        Array[Int], Array[Array[Int]]) = build()
    @transient lazy val terms: Array[UTF8String] =
      dict.map(UTF8String.fromString).toArray
    @transient lazy val termLen: Array[Int] = dict.map(_.length).toArray

    private def build() = {
      val trans = scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
      val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
      dict.zipWithIndex.foreach { case (t, ti) =>
        var v = 0
        t.foreach { ch =>
          val nx = trans(v).get(ch)
          if (nx != null) v = nx
          else {
            trans += new java.util.HashMap[Character, Integer]()
            ends += Nil
            trans(v).put(ch, trans.length - 1)
            v = trans.length - 1
          }
        }
        ends(v) = ti :: ends(v)
      }
      val n = trans.length
      val f = new Array[Int](n)
      val o = new Array[List[Int]](n)
      (0 until n).foreach(i => o(i) = ends(i))
      val q = new java.util.ArrayDeque[Int]()
      trans(0).forEach { (_, c) => f(c) = 0; q.add(c) }
      while (!q.isEmpty) {
        val v = q.poll()
        o(v) = o(v) ::: o(f(v))
        trans(v).forEach { (ch, c) =>
          var u = f(v)
          while (u != 0 && !trans(u).containsKey(ch)) u = f(u)
          val t = trans(u).get(ch)
          f(c) = if (t != null && t != c) t else 0
          q.add(c)
        }
      }
      // longer terms first per node: stable report order at equal end
      val oArr = o.map(_.sortBy(ti => (-dict(ti).length, ti)).toArray)
      (trans.toArray, f, oArr)
    }
  }

  def compute(s: UTF8String, model: Model): ArrayData = {
    val text = s.toString
    val next = model.next
    val fail = model.fail
    val out = model.out
    val hits = new java.util.ArrayList[Any]()
    var state = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (state != 0 && !next(state).containsKey(ch)) state = fail(state)
      val t = next(state).get(ch)
      state = if (t != null) t else 0
      val os = out(state)
      var k = 0
      while (k < os.length) {
        val ti = os(k)
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
        row.update(0, model.terms(ti))
        row.update(1, i - model.termLen(ti) + 2) // 1-based start
        hits.add(row.asInstanceOf[InternalRow])
        k += 1
      }
      i += 1
    }
    new GenericArrayData(hits.toArray)
  }
}
