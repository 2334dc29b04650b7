package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Dev tool (not part of the driver contract): run one named query through
  * the noop sink with a job/stage listener attached, then print a per-job
  * timing table — wall ms, stage count, summed task time, and the first
  * line of the job's call site. Answers "where do an iterative query's
  * seconds actually go" (scheduling/barrier overhead vs task compute)
  * without the Spark UI, which this sandbox disables.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("graph_pagerank")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    final case class Job(start: Long, var end: Long = -1L,
        var stages: Int = 0, var taskMs: Long = 0L, site: String,
        stageNames: mutable.ListBuffer[String] = mutable.ListBuffer.empty)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val stageOwner = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = Job(e.time,
            site = Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse(""))
          // exact stage→job attribution: concurrent jobs (AQE broadcast
          // builds overlap main jobs) would otherwise charge their stages
          // to whichever job started last
          e.stageIds.foreach(sid => stageOwner(sid) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val tMs = e.stageInfo.taskMetrics.executorRunTime
          stageOwner.get(e.stageInfo.stageId).flatMap(jobs.get)
            .orElse(jobs.lastOption.map(_._2))
            .foreach { j =>
              j.stages += 1; j.taskMs += tMs
              // stage name carries the action's call site (file:line) —
              // the no-UI way to attribute a monster job to its operator;
              // AQE stage names are opaque futures, so also surface the
              // first graft frame of the submission stack (details)
              val graftFrame = e.stageInfo.details.linesIterator
                .find(l => l.contains("graft") && !l.contains("JobProfile"))
                .map(_.trim).getOrElse("")
              val m = e.stageInfo.taskMetrics
              val cpuMs = m.executorCpuTime / 1000000
              val spill = m.memoryBytesSpilled / 1024 / 1024
              val tasks = e.stageInfo.numTasks
              j.stageNames += s"${e.stageInfo.name} [wall=${tMs}ms " +
                s"cpu=${cpuMs}ms tasks=$tasks spillMB=$spill] $graftFrame"
            }
        }
    }
    // warm pass first (codegen/JIT), then the profiled pass — mirrors
    // Bench's warm-pass methodology
    val fn = SparkEntry.queries(name)
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    GraftCaches.release(spark)
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    val wallMs = (System.nanoTime() - t0) / 1000000
    spark.sparkContext.removeSparkListener(listener)
    GraftCaches.release(spark)
    Thread.sleep(300) // let listener events drain
    val rows = jobs.synchronized(jobs.toSeq)
    println(f"== $name warm pass: $wallMs ms wall, ${rows.size} jobs ==")
    var prevEnd = -1L
    rows.foreach { case (id, j) =>
      val gap = if (prevEnd < 0) 0L else math.max(0L, j.start - prevEnd)
      prevEnd = math.max(prevEnd, j.end)
      println(f"job $id%3d  wall ${j.end - j.start}%6d ms  gap $gap%5d ms  " +
        f"stages ${j.stages}%2d  taskSum ${j.taskMs}%6d ms  ${j.site}  " +
        j.stageNames.mkString(" | "))
    }
    val jobWall = rows.map(j => j._2.end - j._2.start).sum
    println(f"sum(job wall) $jobWall ms; wall outside jobs ${wallMs - jobWall} ms")
    spark.stop()
  }
}
