package graft.ops


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}

/** Co-located joins via bucketing: writing both fact tables bucketed
  * by the join key lets the sort-merge join run with ZERO exchanges —
  * the pre-partitioning strategy for repeated fact-fact joins at
  * 100 TB (pay the shuffle once at write time, never again).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) { def rm(f: java.io.File): Unit = { Option(f.listFiles).foreach(_.foreach(rm)); f.delete() }; rm(dir) }
    }
    // sf0.001 tables are broadcast-sized; force SMJ so bucketing shows
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {

    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    Bucketing.writeBucketed(Tables(spark, SparkFixture.sfDir, "orders"),
      s"$dir/o", "b_orders", "o_orderkey", buckets = 8)
    Bucketing.writeBucketed(Tables(spark, SparkFixture.sfDir, "lineitem"),
      s"$dir/l", "b_lineitem", "l_orderkey", buckets = 8)

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side (the only allowed
    // exchange is the one for the final tiny aggregation)
    val joinSection = plan.substring(0, plan.indexOf("SortMergeJoin").max(0) + 1)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey")
      && !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n$plan")

    // and it computes the same result as the unbucketed join
    val expected = Tables(spark, SparkFixture.sfDir, "lineitem")
      .join(Tables(spark, SparkFixture.sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(joined.orderBy("o_orderstatus").collect().toSeq == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
