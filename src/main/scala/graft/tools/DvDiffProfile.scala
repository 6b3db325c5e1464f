package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Decomposition of the DML-only (scattered fixed-churn) lineage poll at
  * derived sf1 — which stage of the DV-diff delete branch carries the
  * 10×-corpus cost: planning, DV blob mask diff, the cursor-side
  * position scan, the position join, or the upserts branch. */
object DvDiffProfile {
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
      println(f"PROF $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val base = s.read.parquet(s"$dir/orders.parquet")
    val shift = base.agg(max("o_orderkey")).head().getLong(0) + 1
    val big = (0 until 10).map(i =>
      base.withColumn("o_orderkey", col("o_orderkey") + lit(i * shift)))
      .reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    big.count()
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val whDir = java.nio.file.Files.createTempDirectory("dvdiff").toString
      val cat = s"gdvd$round"
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
      s.sql(s"DELETE FROM $cat.db.orders WHERE o_orderkey % 7 = 3 AND o_orderkey < $shift")
      s.sql(s"""UPDATE $cat.db.orders SET o_orderstatus = concat(o_orderstatus, 'X')
               |WHERE o_totalprice > 200000 AND o_orderkey < $shift""".stripMargin)
      val rel = tab.refresh()
      val cur = rel.metadata.currentSnapshotId.get
      val cursorSeq = rel.metadata.snapshotById(cursor).get.sequenceNumber
      val plan = time("prunedDiffTasks (plan)")(
        graft.streaming.TableChanges.prunedDiffTasks(rel, cursor, cur, cursorSeq))
      println(s"     changed=${plan.changedTasks.size} removed=${plan.removedCand.size}" +
        s" dvMasked=${plan.dvMasked.size} other=${plan.otherMasked.size}")
      // stage 1: DV blob mask diff alone (executor-side, like the branch)
      import graft.meta.{DeletionVector, Io}
      val ioEntries = Io.confEntries(s)
      val descs = plan.dvMasked.map { case (bt, ct) =>
        def refs(t: graft.table.FileScanTask): Seq[(String, Long, Long)] =
          t.deletes.map(f => (f.filePath, f.contentOffset.getOrElse(0L),
            f.contentSizeInBytes.getOrElse(f.fileSizeInBytes)))
        (graft.core.PathUtil.canon(bt.file.filePath), refs(bt), refs(ct))
      }
      val rdd = s.sparkContext.parallelize(descs,
        math.min(descs.size, s.sparkContext.defaultParallelism))
        .flatMap { case (p, bRefs, cRefs) =>
          def mask(rs: Seq[(String, Long, Long)]): Set[Long] =
            rs.iterator.flatMap { case (pp, off, len) =>
              DeletionVector.readPositions(pp, off, len, Io.confFrom(ioEntries))
            }.toSet
          (mask(cRefs) -- mask(bRefs)).iterator.map(pos => (p, pos))
        }
      val posDf = s.createDataFrame(rdd).toDF("__file", "__pos")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("mask diff (posDf count)")(println(s"     positions=${posDf.count()}"))
      // stage 2: cursor-side position scan alone
      val scan = rel.lineageScanWithPosForTasksAt(cursor, plan.dvMasked.map(_._1))
      time("cursor pos-scan count")(scan.count())
      // stage 3: the position join
      time("pos join count")(
        scan.join(broadcast(posDf), Seq("__file", "__pos")).count())
      // stage 4: upserts branch alone
      time("changed-tasks scan count")(
        rel.lineageScanForTasksAt(cur, plan.changedTasks)
          .filter(col(graft.core.RowLineage.LastUpdatedName) > cursorSeq).count())
      posDf.unpersist()
      // whole poll for reference
      time("pollLineageCdc full")(
        graft.streaming.TableChanges.pollLineageCdc(rel, Some(cursor))._1.count())
    }
    s.stop()
  }
}
