package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Tables._

/** Temporary write-path experiments — not part of the deliverable. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = t(spark, dir, "lineitem").withColumn("_day", to_date(col("l_shipdate")))
    li.cache().count()
    val base = Files.createTempDirectory("graft_w").toString
    val sampler = new Thread(() => {
      while (true) {
        Thread.sleep(10000)
        val traces = Thread.getAllStackTraces
        val sb = new StringBuilder("\n==== SAMPLE ====\n")
        traces.forEach { (t, st) =>
          if (t.getName.contains("Executor task launch") && st.nonEmpty) {
            sb.append(s"--- ${t.getName} ${t.getState}\n")
            st.take(14).foreach(e => sb.append(s"    $e\n"))
          }
        }
        println(sb.toString)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    for (i <- 1 to 5) {
      time(s"partitionBy explicit 32 #$i") {
        li.repartition(32, col("_day")).write.mode("overwrite").partitionBy("_day").parquet(s"$base/p$i")
      }
    }
    spark.stop()
  }
}
