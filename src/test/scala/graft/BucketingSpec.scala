package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: two tables bucketed on the same key
  * must join with no shuffle exchange (the persistent shard-key
  * co-location the reference gets from `Distributed(..., id)`).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed join plans without a shuffle exchange") {
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    graft.sources.IO.writeBucketedTable(
      orders.withColumnRenamed("o_custkey", "custkey"), "b_orders", "custkey", 4)
    graft.sources.IO.writeBucketedTable(
      customer.withColumnRenamed("c_custkey", "custkey"), "b_customer", "custkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not re-shuffle:\n$plan")
      // and it computes the right thing
      val expected = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
