package graft

/** SURVEY §5.2.3: the typed heap aggregator and the window formulation
  * are two plans for one semantic — they must agree row-for-row.
  */
class UdfSpec extends SparkSpec {
  test("udaf_topk_typed equals win_topk_per_group exactly") {
    val a = SparkEntry.queries("udaf_topk_typed")(spark, sf)
    val w = SparkEntry.queries("win_topk_per_group")(spark, sf)
    assert(a.columns.sameElements(w.columns))
    assert(a.exceptAll(w).isEmpty && w.exceptAll(a).isEmpty)
    assert(a.count() == w.count())
  }
}
