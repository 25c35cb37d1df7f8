package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match WordPiece subword tokenization (Wu et al. '16
  * §4.1, the BERT tokenizer's inference rule) as one native expression:
  * each whitespace word is segmented left-to-right, at every position
  * taking the LONGEST vocabulary piece that matches (word-initial
  * pieces plain, continuations prefixed `##`); a word with no match at
  * any position emits a single `[UNK]`.
  *
  * This is the real token-budget primitive for a training-data engine —
  * whitespace counts over-estimate subword models' costs by 1.3–1.5×,
  * and mixture/packing decisions keyed on token counts inherit that
  * error. The vocabulary is compiled ONCE per expression instance into
  * a hash set + max-length bound and shipped to executors as a codegen
  * reference object, so the per-row loop does set probes only — the
  * broadcast-dimension pattern expressed at the expression level.
  *
  * Determinism: greedy longest-match is a pure function of (word,
  * vocab); no floats, no hashing. The segmentation of each DISTINCT
  * word is fixed, which is what lets a SQL replica segment word TYPES
  * (a ≤|vocab-reachable| relation) and join back by word — the oracle's
  * shape — while the engine streams full documents.
  *
  * Input is a pre-normalized single-space-tokenized string (the
  * [[graft.dedup.Dedup.normalizeText]] contract, as [[WordShingles]]);
  * empty words are skipped, an empty input yields an empty array.
  */
case class WordpieceTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val model = WordpieceTokens.Model(vocab)

  override def checkInputDataTypes(): TypeCheckResult =
    if (vocab.isEmpty)
      TypeCheckResult.TypeCheckFailure("wordpiece needs a non-empty vocab")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"wordpiece requires string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    WordpieceTokens.compute(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceModel", model,
      classOf[WordpieceTokens.Model].getName)
    defineCodeGen(ctx, ev, c => s"graft.expr.WordpieceTokens.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordpieceTokens =
    copy(child = newChild)

  override def prettyName: String = "wordpiece"
}

object WordpieceTokens {
  val Unk = "[UNK]"

  /** Compiled vocabulary: one probe set, continuations stored WITH their
    * `##` prefix; maxLen bounds the longest-match scan (piece length in
    * characters, prefix excluded).
    */
  case class Model(vocab: Seq[String]) extends Serializable {
    @transient lazy val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](vocab.size * 2)
      vocab.foreach(s.add)
      s
    }
    @transient lazy val maxLen: Int =
      vocab.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
  }

  def compute(s: UTF8String, model: Model): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    val words = s.toString.split(" ", -1)
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val mark = out.size()
        var pos = 0
        var failed = false
        while (pos < w.length && !failed) {
          var len = math.min(model.maxLen, w.length - pos)
          var hit: String = null
          while (len >= 1 && hit == null) {
            val sub = w.substring(pos, pos + len)
            val cand = if (pos == 0) sub else "##" + sub
            if (model.set.contains(cand)) hit = cand
            len -= 1
          }
          if (hit == null) failed = true
          else {
            out.add(UTF8String.fromString(hit))
            pos += (if (pos == 0) hit.length else hit.length - 2)
          }
        }
        if (failed) {
          // standard WordPiece: any unmatchable position voids the word
          while (out.size() > mark) out.remove(out.size() - 1)
          out.add(UTF8String.fromString(Unk))
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}
