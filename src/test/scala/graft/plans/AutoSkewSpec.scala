package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}

/** Contracts for the opt-in auto-skew optimizer rule: off means OFF
  * (plan untouched), on means the q94 saltedJoinProfiled shape — hot
  * keys salted over buckets, dim replicated for hot keys only — with
  * results bit-equal to the plain join.
  */
class AutoSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def factDim() = {
    val li = Tables(spark, SparkFixture.sfDir, "lineitem")
      .select("l_suppkey", "l_extendedprice")
    val su = Tables(spark, SparkFixture.sfDir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    li.join(su, Seq("l_suppkey"))
      .groupBy("s_nationkey")
      // decimal-exact revenue: a double sum would reassociate under
      // the salted partitioning and break bit-equality spuriously
      .agg(sum(col("l_extendedprice").cast("decimal(18,6)")).as("rev"),
        count(lit(1)).as("n"))
  }

  private def optimized() = factDim().queryExecution.optimizedPlan.toString

  test("off by default: the join plans untouched even with a profile registered") {
    AutoSkew.register(spark, "l_suppkey", Seq(1L, 2L), buckets = 4)
    try {
      val plan = optimized()
      assert(!plan.contains("__graft_salt"),
        s"rule fired without the config flag:\n$plan")
    } finally AutoSkew.unregister(spark, "l_suppkey")
  }

  test("enabled without a registered profile: still untouched") {
    spark.conf.set(AutoSkew.EnabledKey, "true")
    try {
      val plan = optimized()
      assert(!plan.contains("__graft_salt"),
        s"rule fired without a profile:\n$plan")
    } finally spark.conf.unset(AutoSkew.EnabledKey)
  }

  test("enabled + profile: rewritten into the q94 shape, results bit-equal to the plain join") {
    // baseline: the plain join's result (rule off)
    val plain = factDim().collect()
      .map(r => (r.getInt(0), r.getDecimal(1), r.getLong(2))).toSet

    // a real profile: the fixture's hottest supplier keys (driver-side
    // <= topK rows — exactly what a persisted q92 output gives)
    val hot = graft.ops.SkewTools.hotKeyProfile(
        Tables(spark, SparkFixture.sfDir, "lineitem"), "l_suppkey",
        topK = 4, minSkew = 1.0)
      .collect().map(_.getLong(0)).toSeq
    assert(hot.nonEmpty, "fixture must yield a hot-key profile")

    spark.conf.set(AutoSkew.EnabledKey, "true")
    AutoSkew.register(spark, "l_suppkey", hot, buckets = 4)
    try {
      val plan = optimized()
      // the hand-built q94 shape, plan-visible: a salt projection on
      // the fact, a conditional-array explode on the dim, and the join
      // carrying BOTH the key and the salt equality
      assert(plan.contains("__graft_salt"), s"salt projection missing:\n$plan")
      assert(plan.contains("explode(if"), s"conditional dim replication missing:\n$plan")
      assert(plan.contains("monotonically_increasing_id"),
        s"round-robin fact salt missing:\n$plan")
      assert(plan.contains("__graft_salt_r"),
        s"join lost the salt equality:\n$plan")
      // and the salted result is EXACTLY the plain join's
      val salted = factDim().collect()
        .map(r => (r.getInt(0), r.getDecimal(1), r.getLong(2))).toSet
      assert(salted == plain, s"salted result diverged:\n$salted\nvs\n$plain")
    } finally {
      spark.conf.unset(AutoSkew.EnabledKey)
      AutoSkew.unregister(spark, "l_suppkey")
    }
  }
}
