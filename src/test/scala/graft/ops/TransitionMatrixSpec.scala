package graft.ops

import graft.SparkSpec

class TransitionMatrixSpec extends SparkSpec {
  import spark.implicits._

  test("row-conditional transition counts and micro-probabilities") {
    // user 1: A→B→A→C; user 2: A→B. From A: 2×B, 1×C; from B: 1×A.
    val d = Seq((1L, 1L, "A", 1L), (1L, 2L, "B", 2L), (1L, 3L, "A", 3L),
      (1L, 4L, "C", 4L), (2L, 1L, "A", 5L), (2L, 2L, "B", 6L))
      .toDF("user", "ts", "etype", "eid")
    val out = EventOps.transitionMatrix(d, "user", "etype", "ts", "eid")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("A", "B") -> (2L, 666666L),
      ("A", "C") -> (1L, 333333L),
      ("B", "A") -> (1L, 1000000L)))
  }

  test("sequences never cross users; ts ties break on the tie column") {
    // equal ts inside user 1: order falls back to eid → X→Y, not Y→X
    val d = Seq((1L, 5L, "X", 1L), (1L, 5L, "Y", 2L), (2L, 9L, "Z", 3L))
      .toDF("user", "ts", "etype", "eid")
    val out = EventOps.transitionMatrix(d, "user", "etype", "ts", "eid")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("X", "Y"))) // no Y→Z bridge across users
  }
}
