package graft.tools
import org.apache.spark.sql.SparkSession

/** Stage anatomy of stream_lineage_cdc at sf0.1. */
object SlcProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val orders = s.read.parquet(s"$dir/orders.parquet")
    orders.count()
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val cat = s"gslc$round"
      val whDir = java.nio.file.Files.createTempDirectory("slcprof").toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
      val tab = new graft.catalog.HadoopCatalog(whDir, s)
        .createTable("db.orders", graft.core.Schema.fromSpark(orders.schema),
          properties = Map("format-version" -> "3",
            "write.delete.mode" -> "merge-on-read"))
      val sorted = orders.repartition(1).sortWithinPartitions("o_orderkey")
      time("append odd")(tab.append(sorted.filter(col("o_orderkey") % 2 === 1)))
      time("append even")(tab.append(sorted.filter(col("o_orderkey") % 2 === 0)))
      val baseSnap = tab.refresh().metadata.currentSnapshotId.get
      time("compaction")(tab.rewriteDataFiles(1L << 30))
      time("MoR DELETE")(s.sql(s"DELETE FROM $cat.db.orders WHERE o_orderkey % 7 = 3"))
      val (b1, cur1) = graft.streaming.TableChanges.pollLineageCdc(
        tab.refresh(), Some(baseSnap))
      time("poll1 count")(b1.count())
      time("CoW UPDATE")(s.sql(
        s"""UPDATE $cat.db.orders SET o_orderstatus = concat(o_orderstatus, 'X')
           |WHERE o_totalprice > 200000""".stripMargin))
      val (b2, _) = graft.streaming.TableChanges.pollLineageCdc(tab.refresh(), cur1)
      time("poll2 count")(b2.count())
    }
    s.stop()
  }
}
