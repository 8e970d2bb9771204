package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The batched BPE trainer's ONLY contract is bit-equality with the
  * sequential greedy trainer — these cases drive the schedules apart
  * (conflicts, count ties, multi-round batches) and demand identical
  * merge tables anyway.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private implicit val scope: graft.ops.CacheScope =
    graft.ops.CacheScope.sessionOwned

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def seqMerges(d: org.apache.spark.sql.DataFrame, k: Int) =
    Llm.bpeLearn(d, k)._2

  private def batchMerges(d: org.apache.spark.sql.DataFrame, k: Int, b: Int) =
    Llm.bpeLearnBatched(d, k, b)._2

  test("conflict at a count tie: the batch must stop, not take the conflicting pair") {
    // "xab" repeated: (a,b) and (x,a) both count N and share symbol a.
    // Sequential merges (a,b) (lexicographic tie-break), then the NEW
    // pair (x,ab). A batch that greedily skipped past the conflict
    // would emit (x,a) as merge 2 — wrong table.
    val d = docs(Seq.fill(5)("xab").mkString(" "))
    val s = seqMerges(d, 2)
    val b = batchMerges(d, 2, 8)
    assert(b == s, s"batched $b != sequential $s")
    assert(s.map(m => (m._2, m._3)) == Seq(("a", "b"), ("x", "ab")))
  }

  test("disjoint pairs batch in one round with the sequential order preserved") {
    val d = docs("aa aa aa bb bb cc")
    val s = seqMerges(d, 3)
    val b = batchMerges(d, 3, 8)
    assert(b == s, s"batched $b != sequential $s")
    assert(s.map(m => (m._2, m._3)) == Seq(("a", "a"), ("b", "b"), ("c", "c")))
  }

  test("deep vocabulary on fixture text: 10 merges, batch 4, bit-equal schedule") {
    val d = graft.Tables(spark, SparkFixture.sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val s = seqMerges(d, 10)
    val b = batchMerges(d, 10, 4)
    assert(b == s,
      s"batched diverged from sequential at k=10:\n$b\nvs\n$s")
    assert(b.map(_._1) == (1 to 10), "merge indices must be sequential")
  }

  test("merge exhaustion terminates early instead of looping") {
    // one two-char word: a single merge fuses it; asking for 5 merges
    // must return the 1 learnable merge, not spin
    val d = docs("ab ab ab")
    val b = batchMerges(d, 5, 8)
    assert(b.map(m => (m._2, m._3)) == Seq(("a", "b")))
  }
}
