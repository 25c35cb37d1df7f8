package graft.ops

import graft.Cols

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Row/column shaping operators (SURVEY.md §2.2). The reference relies on
  * implicit file order everywhere; Spark has no implicit row order, so
  * every order-sensitive op here takes an explicit order column.
  *
  * Scale note: a global `withIndex` is a single-partition window — correct
  * for the reference's small registry files. At 100 TB, order is always
  * per-document/per-source: pass `partitionBy` so the window parallelizes
  * across the natural grouping key.
  */
object ShapeOps {

  val IndexCol = "_idx"

  /** Mint an explicit 0-based row index from an order column. */
  def withIndex(df: DataFrame, orderBy: Column, partitionBy: Seq[Column] = Nil): DataFrame = {
    val w =
      if (partitionBy.isEmpty) Window.orderBy(orderBy)
      else Window.partitionBy(partitionBy: _*).orderBy(orderBy)
    df.withColumn(IndexCol, row_number().over(w).cast("long") - 1)
  }

  /** P2 — `df.slice(offset)`: drop the first `offset` rows in index order
    * (reference: handlers/belarus.py:115).
    */
  def sliceFrom(df: DataFrame, offset: Int): DataFrame =
    df.filter(col(IndexCol) >= offset)

  /** P1 — header promotion: the first row's values become column names,
    * null→"UNKNOWN", and the header row is dropped
    * (reference: handlers/belarus.py:112-115). Driver-side metadata op —
    * the single-row collect is intentional.
    */
  def promoteHeader(df: DataFrame): DataFrame = {
    val dataCols = df.columns.filter(_ != IndexCol)
    val first = df.orderBy(col(IndexCol)).select(dataCols.map(Cols.q).toIndexedSeq: _*).limit(1).collect()(0)
    val names = dataCols.indices.map { i =>
      Option(first.get(i)).map(_.toString).getOrElse("UNKNOWN")
    }
    val renamed = dataCols.zip(dedupNames(names)).foldLeft(df.filter(col(IndexCol) > 0)) {
      case (acc, (from, to)) => acc.withColumnRenamed(from, to)
    }
    renamed
  }

  /** P5 — duplicate/empty column-name dedup: empty or already-seen names
    * become `{name|Unnamed}_{counter}`, bumping the counter until unique
    * (reference: handlers/kyrgyzstan.py:256-267).
    */
  def dedupNames(names: Seq[String]): Seq[String] = {
    val used = mutable.Set[String]()
    names.map { raw =>
      val name = raw.trim
      val base = if (name.isEmpty) "Unnamed" else name
      val out =
        if (name.nonEmpty && !used.contains(name)) name
        else {
          var i = 1
          while (used.contains(s"${base}_$i")) i += 1
          s"${base}_$i"
        }
      used += out
      out
    }
  }

  /** P4 — `clean_column_name` repair (reference: handlers/kazakhstan.py:139-151). */
  def cleanColumnName(name: String): String = {
    var n = name.trim
    n = n.replaceAll("Наименова\\s*ние", "Наименование")
    n = n.replace("/", " или ")
    n = n.replace("\n", " ")
    n = n.replaceAll("\\s{2,}", " ")
    n.filter(ch => !Character.isISOControl(ch) && Character.isDefined(ch))
  }

  def cleanColumnNames(df: DataFrame): DataFrame =
    df.toDF(dedupNames(df.columns.toIndexedSeq.map(cleanColumnName)): _*)

  /** P3 — tolerant rename: missing source columns are ignored, matching
    * polars `rename(strict=False)` (reference: handlers/kyrgyzstan.py:284-296).
    */
  def renameTolerant(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping)

  /** S7 — multi-table concat with ragged-schema tolerance: union by name,
    * filling missing string cells with "" (reference concatenates every
    * DOCX table into one frame, handlers/kyrgyzstan.py:239-251).
    */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = {
    val unioned = dfs.reduce(_.unionByName(_, allowMissingColumns = true))
    val filled = unioned.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        coalesce(Cols.q(f.name), lit("")).as(f.name)
      else Cols.q(f.name)
    }
    unioned.select(filled.toIndexedSeq: _*)
  }
}
