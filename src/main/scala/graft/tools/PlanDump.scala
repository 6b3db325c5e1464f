package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for gate queries into files — the
  * before/after plan evidence for plans/r15/. Usage:
  *
  *   SPARK_GRAFT_ONLY=q1,q2 SPARK_GRAFT_PLAN_DIR=plans/r15 \
  *   SPARK_GRAFT_PLAN_SUFFIX=after java ... graft.tools.PlanDump
  *
  * Writes <dir>/<query>_<suffix>.txt with the formatted physical plan of
  * the gate's RETURNED DataFrame. The gate function runs first (many
  * gates build tables/DML before returning their frame), so the plan is
  * the one the bench's final count() executes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r15")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q1_agg").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.queries.DataOps.oracleExportEnabled = false
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(s, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    s.stop()
  }
}
