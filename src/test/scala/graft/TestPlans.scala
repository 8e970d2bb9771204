package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared executed-plan walkers for the pruning contracts — ONE copy,
  * so a Spark upgrade that changes the adaptive-plan node shapes (a
  * new wrapper exec) breaks one helper loudly instead of leaving five
  * test-local copies to silently return zero scans and vacuously pass
  * every numFiles assertion. */
object TestPlans {

  /** Every FileSourceScanExec in the EXECUTED plan, descending through
    * AQE wrappers and query stages. */
  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: QueryStageExec => fileScans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(fileScans)
  }

  /** Execute `df` and return the summed runtime `numFiles` metric of
    * its file scans — the I/O a pruning contract pins. */
  def scannedFiles(df: DataFrame): Long = {
    df.collect()
    fileScans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }
}
