package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}

class ShingleExprSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** The composed-builtins spelling the kernel replaces. */
  private def composed(df: org.apache.spark.sql.DataFrame) = {
    import graft.queries.QueryDef.sha60
    df.withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), explode(array_distinct(
        when(size(col("ws")) >= 3,
          expr("transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
          .otherwise(array(col("text"))))).as("sh"))
      .select(col("doc_id"), sha60(col("sh")).as("h"))
      .groupBy("doc_id").agg(sort_array(collect_set(col("h"))).as("hs"))
  }

  private def native(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), sort_array(ShingleExprs.shingle_sha60(col("text"))).as("hs"))

  test("shingle_sha60 equals the composed split/transform/sha2/conv spelling on the fixture") {
    val docs = Tables(spark, SparkFixture.sfDir, "documents")
    val a = composed(docs).as[(Long, Seq[Long])].collect().toMap
    val b = native(docs).as[(Long, Seq[Long])].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, hs) => assert(b(id) == hs, s"doc $id differs") }
  }

  test("edge cases: short docs, repeated shingles, empty words") {
    val docs = Seq(
      (1L, "one two"),                      // < 3 words -> whole text
      (2L, "a b c a b c a b c a b"),        // repeated 3-grams -> distinct
      (3L, "x  y z w"),                     // double space -> empty word kept
      (4L, "solo"),
      (5L, "a b c")
    ).toDF("doc_id", "text")
    val a = composed(docs).as[(Long, Seq[Long])].collect().toMap
    val b = native(docs).as[(Long, Seq[Long])].collect().toMap
    assert(a == b)
  }
}
