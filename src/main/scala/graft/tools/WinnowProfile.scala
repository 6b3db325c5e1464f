package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profiler for ds_winnow_dedup (r11 task #1): times each
  * subtree of the winnowing plan in isolation so the fix targets the
  * measured cost center, not a guess. */
object WinnowProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.queries.DataOps.oracleExportEnabled = false
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    // warmup
    s.read.parquet(s"$dir/documents.parquet").count()

    val k = 8; val w = 8
    val base = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val dups = base.filter(col("doc_id") % 17 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000)
      .withColumn("text", concat(col("text"), lit(" winnow-copy")))
    val docs = base.unionByName(dups)
    val hashArr = graft.functions.SlidingMinFunctions.gram_hashes(col("text"), k)
    def fps: DataFrame = docs
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.SlidingMinFunctions.sliding_min(hashArr, w))).as("fp"))

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      time("docs.count")(docs.count())
      time("hashArr only (sum sizes)") {
        docs.select(size(hashArr).as("m")).agg(sum("m")).collect()(0).getLong(0)
      }
      time("sliding_min (sum sizes)") {
        docs.select(size(graft.functions.SlidingMinFunctions.sliding_min(hashArr, w)).as("m"))
          .agg(sum("m")).collect()(0).getLong(0)
      }
      time("fps explode.count")(fps.count())
      val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50).select("fp")
      time("rare.count")(rare.count())
      val sel = fps.join(rare, "fp")
      time("sel.count")(sel.count())
      val full = sel.as("a").join(sel.as("b"), "fp")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 5)
        .orderBy(col("doc_a"), col("doc_b"))
      time("full query")(full.count())
    }
    s.stop()
  }
}
