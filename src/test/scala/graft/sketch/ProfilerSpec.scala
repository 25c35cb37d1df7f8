package graft.sketch

import graft.SparkSpec

/** fdCheck pins SQL count-distinct semantics: null determinants drop,
  * null dependents never count as a distinct value, and the FD verdict
  * is exactly "no determinant maps to two distinct dependents".
  */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("fdCheck: violations, max fan-out, and the holds verdict") {
    // k1 → {v1}, k2 → {v2, v3}, k3 → {null}: one violating determinant,
    // max fan-out 2, FD fails. Reverse direction holds (v1→k1, v2→k2,
    // v3→k2).
    val df = Seq((Some("k1"), Some("v1")), (Some("k1"), Some("v1")),
      (Some("k2"), Some("v2")), (Some("k2"), Some("v3")),
      (Some("k3"), None: Option[String])).toDF("k", "v")
    val out = Profiler.fdCheck(df, Seq(("k", "v"), ("v", "k")))
      .orderBy("det_col").collect()
    assert(out.length == 2)
    val fwd = out(0)
    assert(fwd.getString(0) == "k" && fwd.getString(1) == "v")
    assert(fwd.getLong(2) == 3L)
    assert(fwd.getLong(3) == 1L)
    assert(fwd.getLong(4) == 2L)
    assert(!fwd.getBoolean(5))
    val rev = out(1)
    assert(rev.getLong(2) == 3L && rev.getLong(3) == 0L &&
      rev.getBoolean(5))
  }

  test("fdCheck: null determinants are excluded entirely") {
    val df = Seq((None: Option[String], Some("a")),
      (None: Option[String], Some("b")), (Some("k"), Some("a")))
      .toDF("k", "v")
    val r = Profiler.fdCheck(df, Seq(("k", "v"))).collect().head
    assert(r.getLong(2) == 1L && r.getLong(3) == 0L && r.getBoolean(5))
  }

  test("fdCheck: an all-null dependent reports zero deps, never violates") {
    val df = Seq((Some("k"), None: Option[String]),
      (Some("k"), None: Option[String])).toDF("k", "v")
    val r = Profiler.fdCheck(df, Seq(("k", "v"))).collect().head
    assert(r.getLong(2) == 1L && r.getLong(4) == 0L && r.getBoolean(5))
  }

  test("profileDiff: ratios and change flags off two profile passes") {
    val before = Seq(Some("x"), Some("y"), None).toDF("c")
    val after = Seq(Some("x"), None, None, None).toDF("c")
    val pb = Profiler.profileColumns(before, Seq("c")).collect().head
    val pa = Profiler.profileColumns(after, Seq("c")).collect().head
    val r = Profiler.profileDiff(before, after, Seq("c")).collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 333333L)
    assert(r.getLong(4) == 750000L)
    // self-consistent with the deterministic HLL estimates
    val expected = pa.getLong(3) * 1000000L / math.max(pb.getLong(3), 1L)
    assert(r.getLong(5) == expected)
    assert(!r.getBoolean(6))          // min stays "x"
    assert(r.getBoolean(7))           // max "y" → "x"
  }

  test("kAnonymity: hand-computed audit; null QI is a class, null sensitive uncounted") {
    // class (q=A): 3 rows, sens {x, x, y} → l = 2; class (q=null): 1 row,
    // sens null → l = 0. k = 2: B... the null class violates.
    val df = Seq((Some("A"), Some("x")), (Some("A"), Some("x")),
      (Some("A"), Some("y")), (None: Option[String], None: Option[String]))
      .toDF("q", "s")
    val r = Profiler.kAnonymity(df, Seq("q"), Some("s"), k = 2L)
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L)
    assert(r.getLong(5) == 250000L)
    assert(r.getLong(6) == 0L)
  }

  test("kAnonymity: no sensitive column → NULL l-diversity; anonymous table clean") {
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L)).toDF("q", "v")
    val r = Profiler.kAnonymity(df, Seq("q"), None, k = 2L).collect().head
    assert(r.getLong(2) == 2L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.getLong(5) == 0L)
    assert(r.isNullAt(6))
  }

  test("profileDiff: an empty/all-null before side never divides by zero") {
    val before = Seq(None: Option[String]).toDF("c")
    val after = Seq(Some("a"), Some("b")).toDF("c")
    val pa = Profiler.profileColumns(after, Seq("c")).collect().head
    val r = Profiler.profileDiff(before, after, Seq("c")).collect().head
    assert(r.getLong(3) == 1000000L)
    assert(r.getLong(5) == pa.getLong(3) * 1000000L)
    assert(r.getBoolean(6) && r.getBoolean(7))
  }

  test("referentialIntegrity: orphans, null FKs, and the dup-row weighting") {
    // children: two rows -> p1 (present), two rows -> p9 (missing, ONE
    // distinct key), one null FK. 5 rows, 2 orphan ROWS, 1 orphan KEY.
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L),
      None: Option[Long]).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Profiler.referentialIntegrity(
      Seq(("c->p", child, "fk", parent, "pk"))).collect().head
    assert(r.getString(0) == "c->p" && r.getString(1) == "fk")
    assert(r.getLong(2) == 5L && r.getLong(3) == 1L)
    assert(r.getLong(4) == 2L && r.getLong(5) == 1L)
    assert(r.getLong(6) == 2L * 1000000L / 5L)
    assert(!r.getBoolean(7))
  }

  test("referentialIntegrity: a clean edge is ok; empty child divides safely") {
    val clean = Seq(1L, 2L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val empty = Seq.empty[Long].toDF("fk")
    val out = Profiler.referentialIntegrity(Seq(
      ("clean", clean, "fk", parent, "pk"),
      ("empty", empty, "fk", parent, "pk")))
      .orderBy("relation").collect()
    assert(out(0).getLong(4) == 0L && out(0).getBoolean(7))
    assert(out(1).getLong(2) == 0L && out(1).getLong(4) == 0L &&
      out(1).getLong(6) == 0L && out(1).getBoolean(7))
  }

  test("referentialIntegrity: mixed-type keys compare AS STRINGS (pinned)") {
    // The r18 stacked rewrite compares key values cast to string (the
    // scaladoc contract). Pinning the consequence for MIXED-type edges:
    // a double child FK 1.0 renders "1.0" and never matches a long
    // parent key's "1" — such an edge reports orphans where Spark's
    // numeric join coercion would have matched. Same-value integer
    // types agree ("1" == "1"), which is why the declared star-schema
    // queries are value-identical (oracle-verified r18).
    val dblChild = Seq(1.0, 2.0).toDF("fk")
    val lngChild = Seq(1L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val out = Profiler.referentialIntegrity(Seq(
        ("dbl", dblChild, "fk", parent, "pk"),
        ("lng", lngChild, "fk", parent, "pk")))
      .orderBy("relation").collect()
    // "1.0"/"2.0" vs "1"/"2": every double key is an orphan by contract
    assert(out(0).getLong(4) == 2L && out(0).getLong(5) == 2L &&
      !out(0).getBoolean(7))
    // long vs long renders identically: clean edge
    assert(out(1).getLong(4) == 0L && out(1).getBoolean(7))
  }

  test("inclusionDeps: containment verdicts, missing counts, null drop") {
    // a = {1,2}; b = {1,2,3}; c = {2,9}; nulls in a must not count.
    val ta = Seq(Some(1L), Some(2L), Some(2L), None: Option[Long]).toDF("x")
    val tb = Seq(1L, 2L, 3L).toDF("x")
    val tc = Seq(2L, 9L).toDF("x")
    val out = Profiler.inclusionDeps(
        Seq(("a", ta, "x"), ("b", tb, "x"), ("c", tc, "x")))
      .orderBy("col_a", "col_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(out == Seq(
      ("a", "b", 2L, 0L, true), ("a", "c", 2L, 1L, false),
      ("b", "a", 3L, 1L, false), ("b", "c", 3L, 2L, false),
      ("c", "a", 2L, 1L, false), ("c", "b", 2L, 1L, false)))
  }

  test("inclusionDeps: shared-DataFrame attributes match distinct objects") {
    // r18 shared-scan grouping: two attributes passed as the SAME
    // DataFrame object (one exploded scan) must produce exactly the
    // verdicts of the same attributes passed as distinct objects (one
    // scan each), nulls included.
    val df = Seq((Some(1L), Some(10L)), (Some(2L), None),
        (None: Option[Long], Some(10L)), (Some(2L), Some(30L)))
      .toDF("x", "y")
    val other = Seq(1L, 2L, 10L).toDF("x")
    val shared = Profiler.inclusionDeps(
        Seq(("t.x", df, "x"), ("t.y", df, "y"), ("o", other, "x")))
      .orderBy("col_a", "col_b").collect().map(_.toSeq).toSeq
    val distinctObjs = Profiler.inclusionDeps(
        Seq(("t.x", df.select("x", "y"), "x"),
          ("t.y", df.select("y"), "y"), ("o", other, "x")))
      .orderBy("col_a", "col_b").collect().map(_.toSeq).toSeq
    assert(shared == distinctObjs)
    assert(shared.nonEmpty)
  }

  test("inclusionDeps: values compare as strings across source types") {
    // int 1 and string "1" are the SAME value under the string contract
    val ti = Seq(1L, 2L).toDF("x")
    val ts = Seq("1", "2").toDF("x")
    val out = Profiler.inclusionDeps(Seq(("i", ti, "x"), ("s", ts, "x")))
      .collect()
    assert(out.forall(r => r.getBoolean(4) && r.getLong(3) == 0L))
  }
}
