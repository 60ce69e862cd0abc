package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BucketedTablesSpec extends SparkTestBase {

  test("same-bucketed tables join without any shuffle exchange") {
    val orders = Tables()
    BucketedTables.writeBucketed(orders._1, "b_orders", "o_orderkey", 4)
    BucketedTables.writeBucketed(orders._2, "b_lineitem", "l_orderkey", 4)
    // merge hints keep the comparison honest: a broadcast join would also
    // be exchange-free without proving co-location
    val joined = spark.table("b_lineitem").hint("merge")
      .join(spark.table("b_orders").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    joined.collect() // force planning + execution
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
    assert(joined.count() == 6000)
  }

  test("unbucketed baseline does shuffle (sanity check of the probe)") {
    val (o, l) = Tables()
    val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
    joined.collect()
    // small side gets broadcast OR shuffled; force SMJ to observe exchanges
    val smj = l.hint("merge").join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
    smj.collect()
    assert(smj.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
  }

  private def Tables() = (
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))
}
