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

  test("profiled salted join equals plain join, column order included") {
    val l = Tables(spark, SparkFixture.sfDir, "lineitem")
      .select("l_suppkey", "l_extendedprice", "l_discount")
    val s = Tables(spark, SparkFixture.sfDir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    val plain = l.join(s, Seq("l_suppkey"))
    val salted = SkewTools.saltedJoinProfiled(l, s, "l_suppkey", buckets = 8, topK = 16)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    val key = Seq("l_suppkey", "l_extendedprice", "l_discount", "l_suppkey")
    assert(salted.orderBy(key.map(col): _*).collect().toSeq ==
      plain.orderBy(key.map(col): _*).collect().toSeq)
  }

  test("profiled salted join: a manufactured hot key spreads over the salt buckets") {
    import spark.implicits._
    // 10k rows on key 1 (the hot key), 100 uniform keys with 10 rows each
    val fact = spark.range(10000L).select(lit(1L).as("k"), col("id").as("v"))
      .union(spark.range(1000L).select((col("id") % 100 + 2).as("k"), col("id").as("v")))
    val dim = spark.range(101L).select((col("id") + 1).as("k"), (col("id") * 7).as("d"))
    val hot = SkewTools.hotKeyProfile(fact, "k", topK = 16)
    assert(hot.as[Long].collect().toSeq == Seq(1L), "only key 1 is hot (1000x uniform)")
    // the salted fact must give the hot key bounded per-(key,salt) runs:
    // no single reducer sees more than ~max_freq/buckets of key 1
    val spread = SkewTools.saltFact(fact, broadcast(hot.withColumn("__hot", lit(true))), "k", 8)
      .filter(col("k") === 1L).groupBy("__salt").count()
      .select("count").as[Long].collect()
    assert(spread.length == 8, s"hot key must hit all 8 buckets: ${spread.length}")
    assert(spread.max <= 10000 / 8 + 64, s"bucket imbalance: max=${spread.max}")
    // cold keys stay at salt 0 (no replication tax)
    val coldSalts = SkewTools.saltFact(fact, broadcast(hot.withColumn("__hot", lit(true))), "k", 8)
      .filter(col("k") =!= 1L).select("__salt").distinct().as[Int].collect().toSeq
    assert(coldSalts == Seq(0))
    // and the join still equals the plain join
    val plain = fact.join(dim, Seq("k")).groupBy("k")
      .agg(sum("v").as("sv"), sum("d").as("sd"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    val salted = SkewTools.saltedJoinProfiled(fact, dim, "k", buckets = 8)
      .groupBy("k").agg(sum("v").as("sv"), sum("d").as("sd"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("profiled salted join on a uniform fact: empty profile, no dim replication") {
    import spark.implicits._
    val fact = spark.range(1000L).select((col("id") % 100).as("k"), col("id").as("v"))
    val dim = spark.range(100L).select(col("id").as("k"), (col("id") * 3).as("d"))
    assert(SkewTools.hotKeyProfile(fact, "k").count() == 0)
    val out = SkewTools.saltedJoinProfiled(fact, dim, "k", buckets = 8)
    assert(out.count() == 1000)
    // every dim row joined exactly once per fact match — no 8x blow-up
    assert(out.groupBy("k").count().select("count").as[Long].collect().forall(_ == 10))
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
