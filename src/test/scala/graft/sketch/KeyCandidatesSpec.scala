package graft.sketch

import graft.SparkSpec

class KeyCandidatesSpec extends SparkSpec {
  import spark.implicits._

  test("keyCandidates: key, unique-with-nulls, duplicated, and composite") {
    val df = Seq(
      (Some(1L), Some("a"), 10L), (Some(2L), Some("a"), 11L),
      (Some(3L), Some("b"), 10L), (None, Some("c"), 12L))
      .toDF("id", "grp", "v")
    val out = Profiler.keyCandidates(df, Seq(Seq("id"), Seq("grp"),
        Seq("v"), Seq("grp", "v")))
      .collect().map(r => r.getString(0) -> r).toMap
    // id: unique among non-null but has a NULL → unique, not a key
    val id = out("id")
    assert(id.getBoolean(id.fieldIndex("is_unique")))
    assert(!id.getBoolean(id.fieldIndex("is_key")))
    assert(id.getLong(id.fieldIndex("n_nonnull")) == 3L)
    // grp: duplicated ("a" twice)
    val grp = out("grp")
    assert(!grp.getBoolean(grp.fieldIndex("is_unique")))
    assert(grp.getLong(grp.fieldIndex("max_dup")) == 2L)
    // v: duplicated (10 twice)
    assert(!out("v").getBoolean(out("v").fieldIndex("is_unique")))
    // (grp, v): all four combos distinct and non-null → a key
    val gv = out("grp,v")
    assert(gv.getBoolean(gv.fieldIndex("is_key")))
    assert(gv.getLong(gv.fieldIndex("n_distinct")) == 4L)
  }
}
