package graft

import org.apache.spark.sql.SparkSession

// Scratch profiling harness (Test tree only; not shipped).
object ProfMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .appName("prof").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.queries.DataOps.oracleExportEnabled = false
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"PROF $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    // warm the JVM on a small query first
    time("warm")(SparkEntry.queries("count_star")(spark, dir).count())
    args.foreach { q =>
      time(q)(SparkEntry.queries(q)(spark, dir).count())
      time(q + " (2nd)")(SparkEntry.queries(q)(spark, dir).count())
    }
    spark.stop()
  }
}
