package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** sf0.1 -> derived-sf1 (10 key-shifted copies) sweep for the v3
  * lineage-CDC diff and MoR SQL DML paths — pins their scaling
  * exponents before anyone trusts them at cluster scale. Same
  * derivation as SCALING.md's existing sf1 spot-checks. */
object Sf1CdcProfile {
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
    val base = s.read.parquet(s"$dir/orders.parquet")
    val shift = base.agg(max("o_orderkey")).head().getLong(0) + 1
    val big = (0 until 10).map(i =>
      base.withColumn("o_orderkey", col("o_orderkey") + lit(i * shift)))
      .reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    big.count()

    def run(label: String, orders: DataFrame, round: Int,
        churnCap: Option[Long] = None): Unit = {
      // churnCap restricts the DML to keys below the cap: a FIXED-churn
      // sweep (10× corpus, same absolute churn) isolates the poll's
      // churn-proportionality — the r13 file-pruned poll must stay ~flat
      val capSql = churnCap.map(c => s" AND o_orderkey < $c").getOrElse("")
      println(s"--- $label round $round (rows=${orders.count()}) ---")
      val whDir = java.nio.file.Files.createTempDirectory("sf1cdc").toString
      val cat = s"gsf1${label.filter(_.isLetterOrDigit)}$round"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
      val tab = new graft.catalog.HadoopCatalog(whDir, s)
        .createTable("db.orders", graft.core.Schema.fromSpark(orders.schema),
          properties = Map("format-version" -> "3",
            "write.delete.mode" -> "merge-on-read",
            "write.update.mode" -> "merge-on-read"))
      val sorted = orders.repartition(4).sortWithinPartitions("o_orderkey")
      tab.append(sorted.filter(col("o_orderkey") % 2 === 1))
      tab.append(sorted.filter(col("o_orderkey") % 2 === 0))
      val baseSnap = tab.refresh().metadata.currentSnapshotId.get
      time("compaction")(tab.rewriteDataFiles(1L << 30))
      // second cursor AFTER the compaction: the baseSnap-ranged poll's
      // "churn" includes the full-corpus rewrite (every file removed and
      // re-added — file pruning cannot help by construction), while this
      // range holds only the DML churn, the shape a steady-state pipeline
      // polls — THIS one must stay ~flat at 10× corpus under fixed churn
      val postCompact = tab.refresh().metadata.currentSnapshotId.get
      time("MoR DELETE (DV)")(
        s.sql(s"DELETE FROM $cat.db.orders WHERE o_orderkey % 7 = 3$capSql"))
      time("MoR UPDATE (DV+reinsert)")(s.sql(
        s"""UPDATE $cat.db.orders SET o_orderstatus = concat(o_orderstatus, 'X')
           |WHERE o_totalprice > 200000$capSql""".stripMargin))
      val rel = tab.refresh()
      time("batch lineage diff") {
        val idc = col(graft.core.RowLineage.RowIdName)
        def lin(sc: graft.table.IceScan) = sc.toDFWithLineage
          .select(idc.as("rid"), col("o_orderstatus"))
        lin(rel.scan.useSnapshot(baseSnap)).as("b")
          .join(lin(rel.scan).as("a"), col("b.rid") === col("a.rid"), "full_outer")
          .filter(col("b.rid").isNull || col("a.rid").isNull ||
            not(col("a.o_orderstatus") <=> col("b.o_orderstatus")))
          .count()
      }
      time("pollLineageCdc")(
        graft.streaming.TableChanges.pollLineageCdc(rel, Some(baseSnap))._1.count())
      // DML-only range: file pruning bounds the read at the DV-TOUCHED
      // files — with key-scattered churn (this repartitioned corpus)
      // that can still be every file; the honest granularity bound
      time("pollLineageCdc churn-only")(
        graft.streaming.TableChanges.pollLineageCdc(rel, Some(postCompact))._1.count())
      // steady-state ingest micro-batch: a FIXED 15k-row append plus a DV
      // delete INSIDE that batch — file-localized churn, the shape a
      // running pipeline polls every trigger; must be ~flat at any corpus
      val preIngest = rel.metadata.currentSnapshotId.get
      val freshBase = 100L * shift
      tab.append(orders.limit(15000)
        .withColumn("o_orderkey", col("o_orderkey") + lit(freshBase)))
      s.sql(s"DELETE FROM $cat.db.orders WHERE o_orderkey >= $freshBase AND o_orderkey % 2 = 0")
      val rel2 = tab.refresh()
      time("pollLineageCdc ingest-batch")(
        graft.streaming.TableChanges.pollLineageCdc(rel2, Some(preIngest))._1.count())
    }
    (1 to 2).foreach { r =>
      run("sf0.1", base, r)
      run("sf1", big, r)
      // fixed absolute churn (first-copy keys only) at 10× corpus: the
      // pruned poll's time must track CHURN, not corpus
      run("sf0.1-fixedchurn", base, r, churnCap = Some(shift))
      run("sf1-fixedchurn", big, r, churnCap = Some(shift))
    }
    s.stop()
  }
}
