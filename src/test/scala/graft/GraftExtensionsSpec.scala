package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point must install every native function into a
  * fresh session via spark.sql.extensions, resolvable from SQL text.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions installs all functions into a new session") {
    // spark.sql.extensions is a STATIC conf read from the SparkContext at
    // first-session construction — in this test JVM a context already
    // exists, so exercise the same injection path programmatically via
    // builder.withExtensions (spark-submit users set the conf instead;
    // both call GraftExtensions.apply).
    val shared = SparkSpec.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val withExt = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val checks = Seq(
        "SELECT nfkc('ﬁ')" -> "fi",
        "SELECT word_shingles('a b c d', 3)[0]" -> "a b c",
        "SELECT CAST(dot_i64(array(1L, 2L), array(3L, 4L)) AS STRING)" -> "11")
      checks.foreach { case (sql, expected) =>
        val got = withExt.sql(sql).collect()(0).get(0).toString
        assert(got == expected, s"$sql → $got, expected $expected")
      }
      // long-valued functions just need to resolve and evaluate
      withExt.sql("SELECT rolling_hash64('abc'), simhash64(array('a','b'))").collect()
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
