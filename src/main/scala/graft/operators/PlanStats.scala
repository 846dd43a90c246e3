package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import scala.util.control.NonFatal

/** Driver-side EXACT row counts from metadata only — no Spark job.
  *
  * Size-gated operators ([[Similarity.neardupCosine]],
  * [[Dedup.connectedComponents]]) must route small inputs to a driver-local
  * kernel and large ones to a distributed plan. Probing the size with
  * `limit(n+1).collect()` costs a full pass (CollectLimit runs incremental
  * serial jobs); this helper answers from what the driver already holds:
  * the optimizer's `rowCount` statistic (exact for local relations) or the
  * parquet footers' record counts (exact when every plan node between the
  * scan and the root preserves row count). `None` means "genuinely unknown —
  * pay the probe"; it never guesses, because a wrong route CHANGES RESULTS
  * (the blocked/banded large-scale paths trade recall for scale).
  */
object PlanStats {

  /** True iff `p` emits exactly the rows of its single child/leaf —
    * projections and aliases only. A Filter/Join/Aggregate/Limit anywhere
    * makes footer counts an upper bound, not an answer. */
  private def rowPreserving(p: LogicalPlan): Boolean = p match {
    case _: Project | _: SubqueryAlias => rowPreserving(p.children.head)
    case _: LogicalRelation => true
    case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
    case _ => false
  }

  /** Sum of parquet footer record counts across the plan's input files.
    * Footers are a few KB each and read driver-side; a non-parquet or
    * pathless source surfaces as None. */
  private def footerCount(df: DataFrame): Option[Long] = {
    val files = df.inputFiles
    if (files.isEmpty) None
    else
      try {
        val conf = df.sparkSession.sessionState.newHadoopConf()
        var n = 0L
        files.foreach { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try n += r.getRecordCount
          finally r.close()
        }
        Some(n)
      } catch { case NonFatal(_) => None }
  }

  /** Exact row count of `df` if it is knowable without running a job.
    * Only row-preserving plans are answered at all — on any other shape even
    * the optimizer's `rowCount` may be a CBO cardinality ESTIMATE, and an
    * estimate must never pick the route. */
  def exactRowCount(df: DataFrame): Option[Long] = {
    val plan = df.queryExecution.optimizedPlan
    if (!rowPreserving(plan)) None
    else plan.stats.rowCount.map(_.toLong).orElse(footerCount(df))
  }
}
