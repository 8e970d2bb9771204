package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Hand-traceable contracts for the unigram-LM (SentencePiece-style)
  * Viterbi-EM trainer: segmentation optimality, the ties-prefer-longer
  * rule, the character-coverage floor, and the EM prune.
  */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private implicit val scope: graft.ops.CacheScope =
    graft.ops.CacheScope.sessionOwned

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("Viterbi picks the min-cost segmentation and prefers longer pieces on ties") {
    // vocab: a=1.0, b=1.0, ab=1.5  ->  "ab" via piece 'ab' (1.5 < 2.0)
    val scores = Seq(("a", 1.0), ("b", 1.0), ("ab", 1.5)).toDF("p", "sc")
    val words = Seq(("ab", 3L)).toDF("w", "f")
    val toks = Llm.ugViterbi(words, scores)
      .select(col("toks")).as[Seq[String]].collect().head
    assert(toks == Seq("ab"), s"got $toks")
    // exact tie: ab=2.0 equals a+b -> the LONGER piece must win
    val tied = Seq(("a", 1.0), ("b", 1.0), ("ab", 2.0)).toDF("p", "sc")
    val toks2 = Llm.ugViterbi(words, tied)
      .select(col("toks")).as[Seq[String]].collect().head
    assert(toks2 == Seq("ab"), s"tie must prefer the longer piece: $toks2")
    // and when the split is strictly cheaper, it wins, in order
    val split = Seq(("a", 0.5), ("b", 0.5), ("ab", 1.5)).toDF("p", "sc")
    val toks3 = Llm.ugViterbi(words, split)
      .select(col("toks")).as[Seq[String]].collect().head
    assert(toks3 == Seq("a", "b"), s"got $toks3")
  }

  test("Viterbi fails loudly on an uncoverable word (vocabulary missing a char)") {
    // 'c' has no piece: best[length] stays Infinity — the coverage
    // guard must raise, never silently backtrack empty tokens
    val scores = Seq(("a", 1.0), ("b", 1.0)).toDF("p", "sc")
    val words = Seq(("abc", 1L)).toDF("w", "f")
    val ex = intercept[Exception] {
      Llm.ugViterbi(words, scores).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("not coverable")),
      s"expected the coverage raise_error, got: $ex")
  }

  test("EM prunes unused multi-char pieces; the char floor keeps every char") {
    // one word type "abab" x 4: the seed vocab holds a, b, ab, ba,
    // aba, bab, abab; after EM the 1-best segmentation concentrates
    // usage and unused multi-char pieces drop, but EVERY char stays
    val (words, cnts, sc) = Llm.ugTrain(docs("abab abab abab abab"), iters = 2)
    val pieces = cnts.select("p").as[String].collect().toSet
    assert(pieces.contains("a") && pieces.contains("b"), s"char floor lost: $pieces")
    // the trained tokenizer segments its training word into one piece
    // ("abab" dominates: every occurrence reinforces it)
    val toks = Llm.ugViterbi(words, sc)
      .select(col("toks")).as[Seq[String]].collect().head
    assert(toks == Seq("abab"), s"got $toks")
    // pruned: "aba"/"bab" are used by no 1-best segmentation
    assert(!pieces.contains("aba") && !pieces.contains("bab"),
      s"EM prune failed: $pieces")
    // counts: abab used 4x (f=4, 1 piece per occurrence... per TYPE
    // weighted by f) + no floor; a/b floor-only = 1
    val m = cnts.as[(String, Long)].collect().toMap
    assert(m("abab") == 4L && m("a") == 1L && m("b") == 1L, s"counts: $m")
  }

  test("words longer than ugMaxW are skipped, shorter ones still train") {
    val (words, _, _) = Llm.ugTrain(docs("abcdefghij ab ab"), iters = 1)
    val ws = words.select("w").as[String].collect().toSet
    assert(ws == Set("ab"), s"length filter drifted: $ws")
  }
}
