package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._
import graft.meta.{PartitionSpec => Spec}

/** Stage-level profiler for ice_transform_predicate (r11): splits the
  * gate into table-create, fan-out append (~2.4k day partitions at
  * sf0.1), and the pruned transform-predicate scan, so optimization
  * targets the measured cost center. */
object TransformPredProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    li.count() // warmup
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val whDir = Files.createTempDirectory("tp-prof").toString
      val cat = new graft.catalog.HadoopCatalog(whDir, s)
      val schema = Schema.fromSpark(li.schema)
      val tab = time("createTable") {
        cat.createTable("lineitem",
          schema, Spec.build(schema, 0, ("l_shipdate", DayTransform, "l_day")))
      }
      time("append (fan-out)")(tab.append(li))
      time("pruned scan") {
        tab.scan("day(l_shipdate) = '1997-06-05'")
          .select("l_orderkey", "l_linenumber", "l_shipdate")
          .toDF.count()
      }
      // raw Spark floor: the same fan-out shape through Spark's own writer
      val rawDir = Files.createTempDirectory("tp-raw").toString
      time("raw spark partitionBy") {
        li.withColumn("_day", to_date(col("l_shipdate")))
          .repartition(128, col("_day"))
          .write.partitionBy("_day").mode("overwrite").parquet(rawDir)
      }
      val stageDir = Files.createTempDirectory("tp-wf").toString
      val schema2 = Schema.fromSpark(li.schema)
      time("WriteFiles.write only") {
        graft.table.WriteFiles.write(s, stageDir, schema2,
          Spec.build(schema2, 0, ("l_shipdate", DayTransform, "l_day")), li,
          java.util.UUID.randomUUID().toString, None, Map.empty)
      }
    }
    s.stop()
  }
}
