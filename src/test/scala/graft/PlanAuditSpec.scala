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

  test("minhash verify is candidate-bounded: no shingle self-join, " +
    "candidate restriction below the per-doc aggregation") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val docs = Tables.load(spark, sf, "documents")
    val lazyFrame = graft.operators.Dedup.minHashVerifiedPairsPlan(
      docs, "doc_id", "text", 5, 4, 3, 0.5)
    val optimized = lazyFrame.queryExecution.optimizedPlan
    // 1) the verify path never self-joins the shingle index — the only
    //    equi-joins are LSH band/sig and the candidate-pair id joins
    val shingleJoins = optimized.collect {
      case j: Join if j.condition.exists(
        _.references.exists(_.name.startsWith("shingle"))) => j
    }
    assert(shingleJoins.isEmpty,
      s"verify path re-grew a shingle self-join:\n${optimized.treeString.take(3000)}")
    // 2) the per-doc shingle-set aggregation only sees candidate docs:
    //    a LeftSemi restriction sits BELOW the collect_set Aggregate
    val setAggs = optimized.collect {
      case a: Aggregate if a.aggregateExpressions
        .exists(_.toString.contains("collect_set")) => a
    }
    assert(setAggs.nonEmpty, "collect_set aggregation missing from plan")
    assert(setAggs.forall(a => a.collect {
      case j: Join if j.joinType == LeftSemi => j
    }.nonEmpty),
      "candidate LeftSemi restriction is not below the pair aggregation:\n" +
        optimized.treeString.take(3000))
    // 3) and no pair-level (two-id-column) aggregation exists at all —
    //    the exact intersection is computed per candidate pair directly
    assert(optimized.toString.contains("array_intersect"),
      "exact verify should use per-pair array_intersect")
  }
}
