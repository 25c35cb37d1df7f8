package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Differential testing of the custom joins against their naive
  * formulations on seeded random data — the operators' clever plans
  * (window trick, bin bucketing) must be observationally identical to the
  * brute-force definitions.
  */
class JoinDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  test("as-of join ≡ naive max-timestamp-at-or-before on random data") {
    val leftRows = (1 to 300).map { i =>
      (rnd.nextInt(10).toLong, new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L), i.toLong)
    }
    val rightRows = (1 to 300).map { i =>
      (rnd.nextInt(10).toLong, new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L), i * 10.0)
    }
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("rk", "rt", "rv")

    val fast = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("rv"))
      .select("lid", "rv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    // naive: per left row, the right row with max (rt, rv) among rt <= t
    // (rv tiebreak mirrors last() over orderBy(t, side) when rts collide —
    // right rows with identical (k, rt) are ordered by their union order;
    // dedupe right side to avoid that ambiguity entirely)
    val dedupRight = right.groupBy("rk", "rt").agg(max("rv").as("rv"))
    val fastD = AsOfJoin.backward(left, dedupRight, "k", "rk", "t", "rt", Seq("rv"))
      .select("lid", "rv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    val naive = left.join(dedupRight, col("k") === col("rk") && col("rt") <= col("t"), "left")
      .groupBy("lid")
      .agg(max_by(col("rv"), col("rt")).as("rv"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    assert(fastD == naive)
    assert(fast.keySet == naive.keySet)
  }

  test("range join ≡ naive inequality join on random data") {
    val points = (1 to 500).map(i => (i.toLong, rnd.nextDouble() * 1000)).toDF("pid", "p")
    val intervals = (1 to 200).map { i =>
      val lo = rnd.nextDouble() * 1000
      (i.toLong, lo, lo + rnd.nextDouble() * 50)
    }.toDF("iid", "lo", "hi")

    val fast = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", binWidth = 25.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(fast == naive && naive.nonEmpty)
  }

  test("salted join ≡ plain join on random skewed data") {
    val big = (1 to 2000).map(i => (if (i % 3 == 0) 7L else rnd.nextInt(50).toLong, i))
      .toDF("k", "payload")
    val small = (0 until 50 by 5).map(k => (k.toLong, s"dim$k")).toDF("j", "label")
    val plain = big.join(small, col("k") === col("j"))
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(big, small, "k", "j", saltFactor = 7)
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    assert(plain == salted && plain.nonEmpty)
  }
}
