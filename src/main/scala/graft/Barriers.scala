package graft

import org.apache.spark.sql.DataFrame

/** Round-barrier materialization for iterative loops (pagerank, label
  * propagation, connected-components pointer jumping).
  *
  * Every loop here cuts its per-round lineage with an EAGER checkpoint
  * (the CLAUDE.md iterative contract — persist/unpersist chains break
  * cache plan-matching and recompute the loop 2^rounds times). The
  * DEFAULT cut is `localCheckpoint`: blocks live in executor storage,
  * no distributed-FS round trip — the right latency trade on one JVM
  * and on healthy small clusters.
  *
  * But localCheckpoint TRUNCATES lineage to blocks that exist only on
  * the executors that computed them: at 1000 executors, one lost
  * container mid-loop loses a block nothing can recompute, failing the
  * whole job at round k of n. Deployments that expect executor churn
  * opt into RELIABLE barriers — `spark.checkpoint()` into the durable
  * checkpoint dir ([[GraftSession]] sets one; on a cluster point it at
  * HDFS/object storage) — paying one FS write per round for
  * loss-tolerance. Runtime conf, not static: the same session can run
  * a quick exploratory loop locally-checkpointed and a 10-hour
  * production loop reliably, flipping the conf between queries.
  */
object Barriers {

  /** Runtime conf key; unset/false → localCheckpoint, true → reliable
    * `checkpoint()` into the session's checkpoint dir.
    */
  val ReliableBarrierConf = "spark.graft.reliableBarriers"

  /** Cut `df`'s lineage eagerly, per the session's barrier mode.
    *
    * The checkpointed plan is rebuilt WITHOUT origin statistics
    * ([[org.apache.spark.sql.graft.StatsBarrier]]): checkpoint stats
    * propagation compounds doubly-exponentially through loops whose
    * rounds reference the previous barrier more than once — the r11
    * large-regime drill caught the connected-components pointer-jump
    * driver spending minutes per round multiplying 10⁹-bit size
    * estimates. Loops own their join strategies explicitly, so the
    * estimates a barrier could carry decide nothing anyway.
    */
  def roundBarrier(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.StatsBarrier.strip(
      if (df.sparkSession.conf.getOption(ReliableBarrierConf)
          .exists(_.trim.equalsIgnoreCase("true")))
        df.checkpoint() // eager; survives executor loss
      else
        df.localCheckpoint()) // eager; executor-local blocks
}
