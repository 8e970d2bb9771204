package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The heuristic text-quality signal shared by the l4 scoring query,
  * the cleanup composites, and [[TrainDataPipeline]] — ONE definition
  * so the pipeline's gate and the published score can never drift
  * (the DuckDB oracle spellings live beside the queries).
  *
  * score = 0.4·min(n_tok/100, 1) + 0.3·min(stopword_ratio·5, 1) + 0.3,
  * rounded to 6 dp (both engines round identically, so thresholds and
  * rank orders replay bit-for-bit).
  */
object TextScores {

  /** English stopword probe set (the fixture's four high-frequency
    * markers; production swaps a real list — the plan is unchanged). */
  val enStopwords: Seq[String] = Seq("the", "a", "and", "of")

  /** Count of English stopword tokens in a split-word array column. */
  def stopCountEn(ws: Column): Column =
    size(filter(ws, x => x.isin(enStopwords: _*)))

  /** The 6-dp-rounded quality score from token and stopword counts. */
  def quality(nTok: Column, stopN: Column): Column = round(
    lit(0.4) * least(nTok.cast("double") / 100.0, lit(1.0)) +
    lit(0.3) * least(stopN.cast("double") / nTok * 5.0, lit(1.0)) +
    lit(0.3), 6)
}
