package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale evidence for the filtered CDC feed: churn lands in EVERY
  * priority partition, a consumer polls with a filter on ONE — the
  * filtered poll must cost the filtered partition's churn (roughly the
  * unfiltered poll divided by the partition count), and scale with the
  * FILTERED churn when the corpus grows 10×. */
object FilteredCdcProfile {
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
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val sf01 = s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val shift = sf01.agg(max("o_orderkey")).head().getLong(0) + 1
    def corpus(mult: Int) = (0 until mult).map(i =>
      sf01.withColumn("o_orderkey", col("o_orderkey") + lit(i * shift)))
      .reduce(_ unionByName _)
    Seq(("sf0.1", 1), ("sf1", 10)).foreach { case (tag, mult) =>
      val big = corpus(mult).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rows = big.count()
      (1 to 2).foreach { round =>
        println(s"--- $tag round $round (rows=$rows) ---")
        val cat = s"gfcp${tag.replace(".", "")}$round"
        val whDir = java.nio.file.Files.createTempDirectory("fcprof").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
        val schema = graft.core.Schema.fromSpark(big.schema)
        val tab = new graft.catalog.HadoopCatalog(whDir, s)
          .createTable("db.orders", schema,
            graft.meta.PartitionSpec.build(schema, 0,
              ("o_orderpriority", graft.core.IdentityTransform, "prio")),
            properties = Map("format-version" -> "3",
              "write.delete.mode" -> "merge-on-read"))
        tab.append(big)
        val c0 = tab.refresh().metadata.currentSnapshotId
        // churn in EVERY partition: MoR DELETE + CoW UPDATE + ingest
        s.sql(s"DELETE FROM $cat.db.orders WHERE o_orderkey % 13 = 3")
        s.sql(s"UPDATE $cat.db.orders SET o_totalprice = o_totalprice + 1 " +
          "WHERE o_orderkey % 13 = 5")
        tab.refresh().append(big.filter(col("o_orderkey") % 13 === 11)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
        val rel = tab.refresh()
        val filt = graft.core.ExprParser.parse("o_orderpriority = '1-URGENT'")
        time("unfiltered poll") {
          graft.streaming.TableChanges.pollLineageCdc(rel, c0)._1.count()
        }
        time("filtered poll (1 of 5)") {
          graft.streaming.TableChanges.pollLineageCdc(rel, c0, Some(filt))._1.count()
        }
        // steady-state consumer case: the next churn lands ONLY in other
        // partitions — the filtered poll must be metadata-only (zero
        // candidate files, zero rows)
        val c1 = rel.metadata.currentSnapshotId
        s.sql(s"DELETE FROM $cat.db.orders WHERE o_orderpriority = '5-LOW' " +
          "AND o_orderkey % 17 = 2")
        val rel2 = tab.refresh()
        time("filtered poll, foreign churn") {
          val n = graft.streaming.TableChanges.pollLineageCdc(rel2, c1, Some(filt))
            ._1.count()
          require(n == 0, s"expected zero filtered changes, got $n")
        }
      }
      big.unpersist()
    }
    s.stop()
  }
}
