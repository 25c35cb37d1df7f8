package graft.ops

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Order-strict grouped concatenation as a typed `Aggregator` — the
  * alternative vehicle for A1's ordered fold (SURVEY §2.11). The default
  * plan-level implementation (`array_sort(collect_list(struct(idx, v)))`
  * in [[MergeOps.continuationMerge]]) enforces order structurally; this
  * Aggregator does the same with an explicit (idx, value) buffer, merges
  * correctly regardless of partial-aggregation order, and demonstrates the
  * `Dataset`/`Aggregator` extension point for semantics Catalyst built-ins
  * can't express.
  *
  * Buffer is the collected (idx, value) pairs; `finish` sorts once and
  * joins non-empty values with a space — identical semantics to the
  * window+groupBy form.
  */
object OrderedConcat extends Aggregator[(Long, String), List[(Long, String)], String] {

  override def zero: List[(Long, String)] = Nil

  override def reduce(buf: List[(Long, String)], row: (Long, String)): List[(Long, String)] =
    row :: buf

  override def merge(a: List[(Long, String)], b: List[(Long, String)]): List[(Long, String)] =
    a ::: b

  override def finish(buf: List[(Long, String)]): String =
    buf.sortBy(_._1).iterator
      .map(_._2)
      .map(v => if (v == null) "" else v.trim)
      .filter(_.nonEmpty)
      .mkString(" ")

  override def bufferEncoder: Encoder[List[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, String)]]()

  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** The TypedColumn form for `KeyValueGroupedDataset.agg`. */
  def column: TypedColumn[(Long, String), String] = OrderedConcat.toColumn
}
