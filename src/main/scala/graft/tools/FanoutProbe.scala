package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates the per-file CPU cost of the 2.4k-partition fan-out write
  * behind `ice_transform_predicate` (638 task-cpu-s for 600k rows =
  * ~265 ms CPU per tiny file): writes the same lineitem day-partitioned
  * frame via plain Spark with varying writer settings and reports
  * task-cpu per configuration. Wall times on this box are load-poisoned;
  * task-cpu is the signal. */
object FanoutProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val cpuAcc = new java.util.concurrent.atomic.AtomicLong()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) cpuAcc.addAndGet(e.taskMetrics.executorRunTime)
    })
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("_p_l_day", date_format(col("l_shipdate"), "yyyy-MM-dd"))
    li.persist().count()
    def run(label: String)(f: String => Unit): Unit = {
      val out = java.nio.file.Files.createTempDirectory("fanout").toString
      cpuAcc.set(0)
      val t0 = System.nanoTime()
      f(out)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label%-48s wall $wall%7.2f s  task-cpu ${cpuAcc.get / 1e3}%8.1f s")
      // cleanup
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
    val repart = li.repartition(128, col("_p_l_day"))
    run("plain partitionBy, session-default codec") { out =>
      repart.write.mode("overwrite").partitionBy("_p_l_day").parquet(out)
    }
    run("plain partitionBy, snappy") { out =>
      repart.write.mode("overwrite").option("compression", "snappy")
        .partitionBy("_p_l_day").parquet(out)
    }
    run("plain partitionBy, fieldId write enabled") { out =>
      s.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
      repart.write.mode("overwrite").partitionBy("_p_l_day").parquet(out)
      s.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    }
    run("partitionBy, no column index") { out =>
      repart.write.mode("overwrite")
        .option("parquet.columnindex.write.enabled", "false")
        .partitionBy("_p_l_day").parquet(out)
    }
    run("partitionBy, no page checksum") { out =>
      repart.write.mode("overwrite")
        .option("parquet.page.write-checksum.enabled", "false")
        .partitionBy("_p_l_day").parquet(out)
    }
    run("partitionBy, no colindex + no checksum + no dict") { out =>
      repart.write.mode("overwrite")
        .option("parquet.columnindex.write.enabled", "false")
        .option("parquet.page.write-checksum.enabled", "false")
        .option("parquet.enable.dictionary", "false")
        .partitionBy("_p_l_day").parquet(out)
    }
    run("single file (no partitionBy), 1 task") { out =>
      li.coalesce(1).write.mode("overwrite").parquet(out)
    }
    run("128 tasks, no partitionBy") { out =>
      repart.write.mode("overwrite").parquet(out)
    }
    println("session parquet codec = " +
      s.conf.get("spark.sql.parquet.compression.codec"))
    s.stop()
  }
}
