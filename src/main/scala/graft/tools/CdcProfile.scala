package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level profiler for ice_lineage_cdc. */
object CdcProfile {
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
    import org.apache.spark.sql.functions._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val orders = s.read.parquet(s"$dir/orders.parquet")
    orders.count()
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val whDir = java.nio.file.Files.createTempDirectory("cdc-prof").toString
      val cat = s"gcdc$round"
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
      time("CoW UPDATE")(s.sql(
        s"""UPDATE $cat.db.orders SET o_orderstatus = concat(o_orderstatus, 'X')
           |WHERE o_totalprice > 200000""".stripMargin))
      val rel = tab.refresh()
      val idc = col(graft.core.RowLineage.RowIdName)
      def lin(sc: graft.table.IceScan) = sc.toDFWithLineage
        .select(idc.as("rid"), col("o_orderkey"), col("o_orderstatus"))
      time("diff query") {
        val before = lin(rel.scan.useSnapshot(baseSnap))
        val after = lin(rel.scan)
        before.as("b").join(after.as("a"), col("b.rid") === col("a.rid"), "full_outer")
          .select(coalesce(col("a.rid"), col("b.rid")).as("rid"),
            when(col("b.rid").isNull, "insert").when(col("a.rid").isNull, "delete")
              .when(not(col("a.o_orderstatus") <=> col("b.o_orderstatus")), "update")
              .otherwise("unchanged").as("ct"))
          .filter(col("ct") =!= "unchanged").count()
      }
    }
    s.stop()
  }
}
