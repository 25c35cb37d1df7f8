package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("planted excerpt: full containment one way, invisible to Jaccard") {
    val longText = (1 to 60).map(i => s"tok$i").mkString(" ")
    val excerpt = (11 to 22).map(i => s"tok$i").mkString(" ")
    val d = Seq((1L, excerpt), (2L, longText),
      (3L, "completely different content here entirely unrelated words"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(d, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1000000L))) // ordered: 1 ⊂ 2 only
    assert(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.9).count() == 0)
  }

  test("prefix-filtered output equals the naive ordered all-pairs join") {
    val d = Seq(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i j", // exact dup → mutual containment
      3L -> "a b c d e f",
      4L -> "x y z w v u t s r q",
      5L -> "c d e f g h i j k l m n").toDF("doc_id", "text")
    val t = 0.7
    val tLo6 = math.floor(t * 1e6).toLong
    val got = Dedup.containmentPairs(d, "doc_id", "text", 3, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val s = d.select($"doc_id".as("doc"), Dedup.shingles($"text", 3).as("sh"))
      .withColumn("n", size($"sh"))
    val naive = s.select($"doc".as("da"), $"sh".as("sha"), $"n".as("na"))
      .crossJoin(s.select($"doc".as("db"), $"sh".as("shb")))
      .filter($"da" =!= $"db")
      .withColumn("inter", size(array_intersect($"sha", $"shb")))
      .filter($"inter" * 1000000L >= lit(tLo6) * $"na")
      .select($"da", $"db", expr("(inter * 1000000) div na"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive && got.nonEmpty)
    assert(got.contains((1L, 2L, 1000000L)) && got.contains((2L, 1L, 1000000L)))
  }
}
