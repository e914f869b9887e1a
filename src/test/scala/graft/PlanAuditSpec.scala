package graft

/** Plan-regression guards: the physical-plan properties PLANS.md claims
  * are asserted here so a refactor cannot silently lose a broadcast, a
  * pushed filter, or grow an extra shuffle.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("dictionary enrichment joins broadcast (J1)") {
    val p = plan("j1_enrich_users")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("headline joins broadcast every dimension side") {
    val p = plan("q5_region_volume")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to SMJ:\n" + p.take(2000))
  }

  test("filters push into the parquet scan (lineitem)") {
    val p = plan("f5_equality_predicates")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), IsNotNull(l_linestatus), EqualTo(l_returnflag,R), EqualTo(l_linestatus,F)]")
      || (p.contains("EqualTo(l_returnflag,R)") && p.contains("EqualTo(l_linestatus,F)")),
      p.take(2000))
  }

  test("scan projection prunes columns (ReadSchema)") {
    val p = plan("s2_scan_projection")
    assert(p.contains("ReadSchema: struct<event_id:bigint,user_id:bigint,event_type:string>"),
      p.take(2000))
    assert(!p.contains("props"), "unpruned column read:\n" + p.take(2000))
  }

  test("dedup window needs exactly one hash exchange") {
    val p = plan("a4_dedup_latest")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n${p.take(2000)}")
  }

  test("brute-force ANN broadcasts the query set, not the corpus") {
    val p = plan("ann_brute_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
  }
}
