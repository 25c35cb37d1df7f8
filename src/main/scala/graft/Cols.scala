package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Column references for data-driven names. Registry column names contain
  * dots ("Рег. №", "...англ. языке"), which bare `col(name)` parses as
  * struct-field access — every operator that takes a caller-supplied
  * column name must resolve it through here.
  */
object Cols {
  def q(name: String): Column =
    col("`" + name.replace("`", "``") + "`")
}
