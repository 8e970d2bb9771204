package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}

class MinHashExprSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val P = MinHashes.P

  /** The interpreted HOF spelling the kernel replaces: one
    * transform + array_min pass per permutation. */
  private def composed(df: org.apache.spark.sql.DataFrame) = {
    val base = df.select(col("doc_id"),
      ShingleExprs.shingle_sha60(col("text")).as("arr"))
    val sigs = (0 until MinHashes.NPERM).map(k => array_min(expr(
      s"transform(arr, h -> (h % $P * ${MinHashes.permA(k)}L + ${MinHashes.permB(k)}L) % $P)")))
    base.select(col("doc_id"), array(sigs: _*).as("sig"))
  }

  private def native(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      MinHashExprs.minhash_sig(ShingleExprs.shingle_sha60(col("text"))).as("sig"))

  test("minhash_sig equals the 64 transform/array_min passes on the fixture") {
    val docs = Tables(spark, SparkFixture.sfDir, "documents")
    val a = composed(docs).as[(Long, Seq[Long])].collect().toMap
    val b = native(docs).as[(Long, Seq[Long])].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, sig) => assert(b(id) == sig, s"doc $id differs") }
  }

  test("edge cases: single-shingle doc, repeated text, hash order irrelevance") {
    val docs = Seq(
      (1L, "one two"),             // < 3 words: one shingle
      (2L, "a b c a b c a b c"),   // repeated 3-grams collapse to 3 distinct
      (3L, "x y z w v u t")
    ).toDF("doc_id", "text")
    val a = composed(docs).as[(Long, Seq[Long])].collect().toMap
    val b = native(docs).as[(Long, Seq[Long])].collect().toMap
    assert(a == b)
    // signatures are permutation minima over a SET — identical docs agree
    val dup = Seq((10L, "p q r s t"), (11L, "p q r s t")).toDF("doc_id", "text")
    val sigs = native(dup).as[(Long, Seq[Long])].collect().toMap
    assert(sigs(10L) == sigs(11L))
  }
}
