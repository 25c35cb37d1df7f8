package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** The round driver compares oracled queries by loading both sides into
  * pandas and lexsorting every column; a cell holding an array (or map /
  * struct) is unhashable there and crashes the comparator — round 8 lost
  * two otherwise-correct queries (`q_embed_normalize`,
  * `q_random_project`) to exactly this. This spec pins the contract:
  * every ORACLED query must emit scalar-only columns (rows-only queries
  * may keep complex types — the driver only counts their rows).
  *
  * Schemas are resolved at sf0.001; batch queries only analyze (no jobs),
  * the streaming replay family executes but is sub-second at this SF.
  */
class OracleShapeSpec extends SparkSpec {

  private def complexCols(st: StructType): Seq[String] =
    st.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq

  test("every oracled query emits scalar-only columns") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val bad = complexCols(SparkEntry.queries(name)(spark, sf001).schema)
      if (bad.isEmpty) Nil else Seq(s"$name -> ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "oracled queries with pandas-unsortable complex columns " +
        s"(scalar-ize via posexplode/unnest): ${offenders.mkString("; ")}")
  }
}
