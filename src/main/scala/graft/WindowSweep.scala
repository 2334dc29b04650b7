package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** The executable form of SURVEY §4's ranking-window rule: a Window
  * with EMPTY (or all-foldable) partition keys funnels its entire input
  * through one task, so it is only ever legal above a
  * cardinality-bounding node — an Aggregate (calendar/dimension
  * rollup), a Limit, or a cache whose build plan aggregates. Used by
  * [[WindowSweep.main]] (the dev sweep) and PlanAuditSpec's
  * suite-wide gate.
  */
object WindowSweep {

  /** Every node of a physical plan, descending through the leaf-like
    * wrappers AQE interposes (AdaptiveSparkPlanExec, query stages,
    * exchange reuse) that TreeNode traversal treats as opaque.
    */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Iterator[org.apache.spark.sql.execution.SparkPlan] =
    Iterator(p) ++ (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        flatten(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        flatten(r.child)
      case _ => p.children.iterator.flatMap(flatten)
    })

  /** For each Window node with an empty/foldable partition spec in the
    * query's optimized plan: how its input cardinality is bounded —
    * "agg" | "limit" | "cached-agg" (bounding Aggregate lives inside a
    * persisted relation's build plan) | "UNBOUNDED" (nothing bounds it:
    * the single-partition scale-killer the audit exists to ban).
    */
  def globalWindowBounds(df: DataFrame): Seq[String] = {
    def bound(p: LogicalPlan): Option[String] = p.collectFirst {
      case _: Aggregate => "agg"
      case _: GlobalLimit => "limit"
      case _: LocalLimit => "limit"
      case r: InMemoryRelation
          if flatten(r.cachedPlan).exists(_.nodeName.contains("Aggregate")) =>
        "cached-agg"
    }
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.forall(_.foldable) =>
        bound(w.child).getOrElse("UNBOUNDED")
    }
  }

  /** Dev tool: sweep every SparkEntry query and print its global-window
    * boundedness labels — the empirical input for PlanAuditSpec's
    * allowlist. Not part of the driver contract.
    */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.build(8)
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val bounds = globalWindowBounds(q(spark, dir))
        if (bounds.nonEmpty) println(s"GLOBALWIN $name ${bounds.mkString(",")}")
      } catch {
        case e: Throwable =>
          println(s"ERR $name ${e.getClass.getName}: ${e.getMessage}")
      } finally {
        spark.catalog.clearCache()
      }
    }
    println(f"SWEEP done in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
