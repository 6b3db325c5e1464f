package graft.tools
import org.apache.spark.sql.SparkSession

/** Stage anatomy of the stream_cdc_source gate at sf0.1 — splits gate
  * CONSTRUCTION (appends incl. the deterministic repartition(1) sort,
  * compaction, MoR DELETE, CoW UPDATE) from the STREAMING CONTROL PLANE
  * (query start, two processAllAvailable barriers, memory-sink
  * accumulation) from PER-BATCH DIFF COMPUTE (the same snapshot ranges
  * polled manually through TableChanges.pollLineageCdc and materialized
  * with an identical collect). control-plane ≈ barrier time − manual
  * poll time for the same range. */
object StreamCdcProfile {
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
    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROF $label%-28s $sec%8.3f s"); (r, sec)
    }
    val orders = s.read.parquet(s"$dir/orders.parquet")
    orders.count()
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val cat = s"gscp$round"
      val whDir = java.nio.file.Files.createTempDirectory("scprof").toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
      val tab = new graft.catalog.HadoopCatalog(whDir, s)
        .createTable("db.orders", graft.core.Schema.fromSpark(orders.schema),
          properties = Map("format-version" -> "3",
            "write.delete.mode" -> "merge-on-read"))
      val sorted = orders.repartition(1).sortWithinPartitions("o_orderkey")
      time("append odd")(tab.append(sorted.filter(col("o_orderkey") % 2 === 1)))
      time("append even")(tab.append(sorted.filter(col("o_orderkey") % 2 === 0)))
      val backfillHead = tab.refresh().metadata.currentSnapshotId.get

      // streaming leg 1: backfill (whole table as inserts)
      val sink = s"scprof_sink_$round"
      val (q, startSec) = time("stream start") {
        s.readStream.format("graft-cdc")
          .option("warehouse", whDir).option("table", "db.orders").load()
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
      }
      val (_, barrier1) = time("barrier1 (backfill)")(q.processAllAvailable())

      // churn range: compaction (zero phantom rows) + MoR DELETE + CoW UPDATE
      time("compaction")(tab.rewriteDataFiles(1L << 30))
      time("MoR DELETE")(s.sql(s"DELETE FROM $cat.db.orders WHERE o_orderkey % 7 = 3"))
      time("CoW UPDATE")(s.sql(
        s"""UPDATE $cat.db.orders SET o_orderstatus = concat(o_orderstatus, 'X')
           |WHERE o_totalprice > 200000""".stripMargin))
      val (_, barrier2) = time("barrier2 (churn)")(q.processAllAvailable())
      val (_, sinkRead) = time("sink count")(s.table(sink).count(): Unit)
      q.stop()

      // the same two ranges as manual diffs — per-batch compute alone
      tab.refresh()
      val head = tab.metadata.currentSnapshotId.get
      val (_, poll1) = time("manual diff backfill") {
        graft.streaming.TableChanges.lineageDiff(tab, None, backfillHead)
          .count(): Unit
      }
      val (_, poll2) = time("manual diff churn") {
        graft.streaming.TableChanges.lineageDiff(tab, Some(backfillHead), head)
          .count(): Unit
      }
      println(f"PROF control-plane estimate    ${startSec + barrier1 + barrier2 - poll1 - poll2}%8.3f s" +
        f" (start $startSec%.2f + barriers ${barrier1 + barrier2}%.2f − polls ${poll1 + poll2}%.2f)")
      println(f"PROF sink read                 $sinkRead%8.3f s")
    }
    s.stop()
  }
}
