package graft.sketch

import graft.SparkSpec

class MutualInfoSpec extends SparkSpec {
  import spark.implicits._

  test("mutualInformation: identity = full dependence (NMI 1), " +
      "independence = 0, constant column NULLs NMI") {
    val d = (
      // dep: Y == X over two balanced classes → MI = H = ln 2
      Seq(("dep", "a", "a"), ("dep", "a", "a"), ("dep", "b", "b"),
        ("dep", "b", "b")) ++
      // ind: all four combos once → MI = 0
      Seq(("ind", "a", "c"), ("ind", "a", "d"), ("ind", "b", "c"),
        ("ind", "b", "d")) ++
      // const: Y constant → H(Y) = 0 → NMI undefined
      Seq(("const", "a", "c"), ("const", "a", "c"), ("const", "b", "c"),
        ("const", "b", "c"))).toDF("grp", "x", "y")
    val out = Profiler.mutualInformation(d, Seq("grp"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    val dep = out("dep")
    assert(dep.getLong(dep.fieldIndex("mi_micro")) == 693147L) // ln 2
    assert(dep.getLong(dep.fieldIndex("h_x_micro")) == 693147L)
    assert(dep.getLong(dep.fieldIndex("nmi_micro")) == 1000000L)
    val ind = out("ind")
    assert(ind.getLong(ind.fieldIndex("mi_micro")) == 0L)
    assert(ind.getLong(ind.fieldIndex("nmi_micro")) == 0L)
    val cst = out("const")
    assert(cst.getLong(cst.fieldIndex("mi_micro")) == 0L)
    assert(cst.getLong(cst.fieldIndex("h_y_micro")) == 0L)
    assert(cst.isNullAt(cst.fieldIndex("nmi_micro")))
  }

  test("mutualInformation: a partial association lands strictly between") {
    // X mostly determines Y, with one flipped row
    val d = (Seq.fill(9)(("g", "a", "c")) ++ Seq(("g", "a", "d")) ++
      Seq.fill(10)(("g", "b", "d"))).toDF("grp", "x", "y")
    val r = Profiler.mutualInformation(d, Seq("grp"), "x", "y")
      .collect().head
    val nmi = r.getLong(r.fieldIndex("nmi_micro"))
    assert(nmi > 0L && nmi < 1000000L, nmi.toString)
    assert(r.getLong(r.fieldIndex("n")) == 20L)
  }
}
