package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Structural (load-invariant) anatomy of a gate: Spark JOB count, per-job
  * call sites, task counts and cumulative executor task time. On a box
  * whose external load cycles poison wall-clock measurements, the job
  * count and task-time totals are the stable signal — every job on
  * local[*] pays a scheduling + (often) codegen floor, so a gate that
  * runs 60 serial jobs over KB-sized data is control-plane bound no
  * matter how fast each job's compute is. Usage:
  *
  *   SPARK_GRAFT_ONLY=ice_mv_table java ... graft.tools.JobAnatomy
  */
object JobAnatomy {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "ice_mv_table")
      .split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.queries.DataOps.oracleExportEnabled = false

    final case class Job(id: Int, site: String, t0: Long,
      var t1: Long = 0L, var tasks: Int = 0, var taskMs: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    // execution id → root call site: AQE query-stage sub-jobs lose their
    // call site (submitted from thread pools), but they carry the SQL
    // execution id, whose SQLExecutionStart names the real action
    val execSite = new java.util.concurrent.ConcurrentHashMap[String, String]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execSite.put(e.executionId.toString, e.description)
        case _ =>
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // attribute by SQL execution first (covers AQE sub-jobs), then by
        // the result stage's call site
        val byExec = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(id => Option(execSite.get(id)))
        val site = byExec.orElse(e.stageInfos.lastOption.map(_.name)).getOrElse(
          Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?"))
        jobs.put(e.jobId, Job(e.jobId, site, e.time))
        order.add(e.jobId)
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.t1 = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        Option(stageToJob.get(e.stageId)).map(jobs.get).filter(_ != null)
          .foreach { j =>
            j.tasks += 1
            if (e.taskMetrics != null)
              j.taskMs += e.taskMetrics.executorRunTime
          }
      }
    })

    // untimed warmup (JVM/codegen first-use)
    try SparkEntryWarm.warm(s, dir) catch { case _: Throwable => }

    names.foreach { name =>
      jobs.clear(); order.clear(); stageToJob.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.distinct.flatMap(id => Option(jobs.get(id)))
      println(f"=== $name%s: wall $wall%.2f s, ${js.size} jobs, " +
        f"${js.map(_.tasks).sum} tasks, ${js.map(_.taskMs).sum / 1e3}%.1f task-cpu-s ===")
      // few jobs: print each (which action carries the cpu); many: group
      if (js.size <= 12) js.foreach { j =>
        println(f"  job ${j.id}%3d ${math.max(0L, j.t1 - j.t0)}%7d ms wall " +
          f"${j.taskMs}%7d ms task ${j.tasks}%5d tasks  ${j.site}%s")
      }
      // group jobs by call site: the serial floor is (#jobs x per-job cost)
      js.groupBy(_.site).toSeq
        .sortBy { case (_, g) => -g.map(j => j.t1 - j.t0).sum }
        .foreach { case (site, g) =>
          val wallMs = g.map(j => math.max(0L, j.t1 - j.t0)).sum
          println(f"  ${g.size}%3d jobs ${wallMs}%7d ms wall " +
            f"${g.map(_.taskMs).sum}%7d ms task  ${g.map(_.tasks).sum}%5d tasks  $site%s")
        }
    }
    s.stop()
  }
}

/** Warmup seam shared with Bench's contract (count_star). */
private object SparkEntryWarm {
  def warm(s: SparkSession, dir: String): Unit =
    graft.SparkEntry.queries("count_star")(s, dir).count()
}
