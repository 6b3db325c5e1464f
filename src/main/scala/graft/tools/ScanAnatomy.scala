package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Anatomy of the lineage-with-pos scan over one compacted file (the
  * DV-diff poll's cursor side, and the inner read of every rewrite).
  *
  * The r14 finding this pins: `__file` used to be DERIVED per row
  * (metaPathCol: two regexes + url_decode over `_metadata.file_path`),
  * and because it is the JOIN KEY of the lineage-constants join and
  * every MoR anti-join, the optimizer inlined that expression into the
  * join key, the inserted isnotnull filter, and the output project —
  * the regexes ran per row per use and the scan measured ~7.2 s for a
  * 1.5M-row file where the plain read is ~0.12 s. With the broadcast
  * path dict (PathDict) `__file` is a plain attribute and the same scan
  * is ~0.3–0.6 s. */
object ScanAnatomy {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val base = s.read.parquet(s"$dir/orders.parquet")
    val shift = base.agg(max("o_orderkey")).head().getLong(0) + 1
    val big = (0 until 10).map(i =>
      base.withColumn("o_orderkey", col("o_orderkey") + lit(i * shift)))
      .reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    big.count()
    val whDir = java.nio.file.Files.createTempDirectory("anat").toString
    val cat = "ganat"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
    val tab = new graft.catalog.HadoopCatalog(whDir, s)
      .createTable("db.orders", graft.core.Schema.fromSpark(big.schema),
        properties = Map("format-version" -> "3",
          "write.delete.mode" -> "merge-on-read",
          "write.update.mode" -> "merge-on-read"))
    val sorted = big.repartition(4).sortWithinPartitions("o_orderkey")
    tab.append(sorted.filter(col("o_orderkey") % 2 === 1))
    tab.append(sorted.filter(col("o_orderkey") % 2 === 0))
    tab.rewriteDataFiles(1L << 30)
    val cursor = tab.refresh().metadata.currentSnapshotId.get
    val rel = tab.refresh()
    val tasks = rel.planTasksAt(cursor)
    println(s"tasks=${tasks.size} rows=${tasks.map(_.file.recordCount).sum} " +
      s"bytes=${tasks.map(_.file.fileSizeInBytes).sum}")
    val paths = tasks.map(_.file.filePath)
    (1 to 2).foreach { r =>
      println(s"--- rep $r ---")
      time("raw parquet count")(s.read.parquet(paths: _*).count())
      time("raw + file_path+row_index")(
        s.read.parquet(paths: _*)
          .select(col("_metadata.file_path"), col("_metadata.row_index")).count())
      time("plain toDF count")(rel.scanForTasksAt(cursor, tasks).count())
      time("lineage scan count")(rel.lineageScanForTasksAt(cursor, tasks).count())
      val wp = rel.lineageScanWithPosForTasksAt(cursor, tasks)
      time("lineage+pos scan count")(wp.count())
      time("lineage+pos max(__pos)")(
        wp.select(col("__pos")).agg(max("__pos")).head())
    }
    rel.lineageScanWithPosForTasksAt(cursor, tasks).explain("formatted")
    s.stop()
  }
}
