package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}
import graft.queries.QueryDef.dsum

class SkewToolsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("salted join equals plain join on a skewed fact") {
    val l = Tables(spark, SparkFixture.sfDir, "lineitem") // l_suppkey: 10 keys, skewed enough
    val s = Tables(spark, SparkFixture.sfDir, "supplier")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = l.join(s, Seq("l_suppkey"))
      .groupBy("l_suppkey").agg(dsum(col("l_extendedprice")).as("v"), count(lit(1)).as("n"))
      .orderBy("l_suppkey").collect().toSeq
    val salted = SkewTools.saltedJoin(l, s, "l_suppkey", buckets = 8)
      .groupBy("l_suppkey").agg(dsum(col("l_extendedprice")).as("v"), count(lit(1)).as("n"))
      .orderBy("l_suppkey").collect().toSeq
    assert(salted == plain)
  }

  test("salted two-phase sum equals direct sum") {
    val l = Tables(spark, SparkFixture.sfDir, "lineitem")
    val direct = l.groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val salted = SkewTools.saltedSum(l, "l_returnflag", col("l_quantity"), 16, "q")
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // l_quantity is integral-valued -> double sums are exact in any order
    assert(salted == direct)
  }
}
