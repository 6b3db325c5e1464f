package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase anatomy of the `ice_mv_table` gate at sf0.1: construction
  * (source table + churn commits) vs MV machinery (bootstrap, the two
  * exactly-once refreshes, final scan) — substantiates the
  * control-plane-floor claim for the gate's bench time and shows where
  * a refresh's seconds actually go at a 5k-row scale where data volume
  * is irrelevant. */
object MvProfile {
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
      println(f"PROF $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      val cat = s"gmvp$rep"
      val whDir = java.nio.file.Files.createTempDirectory("graft_mvprof").toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
      val hc = new graft.catalog.HadoopCatalog(whDir, s)
      val tab = time("create+append source") {
        val t = hc.createTable("db.corpus",
          graft.core.Schema.fromSpark(docs.schema),
          properties = Map("format-version" -> "2",
            "write.delete.mode" -> "merge-on-read",
            "write.update.mode" -> "merge-on-read"))
        t.append(docs.filter(col("doc_id") % 3 =!= 0)); t
      }
      val view = graft.ops.IncrementalAgg.AggView(
        keys = Seq("source", "lang"), sums = Seq("n_chars"),
        mins = Seq("n_chars", "doc_id"), maxs = Seq("n_chars", "doc_id"))
      val mv = time("mv create+bootstrap") {
        val m = hc.createTable("db.stats",
          graft.streaming.MaterializedAgg.schemaFor(view, tab),
          properties = Map("format-version" -> "2"))
        graft.streaming.MaterializedAgg.bootstrap(tab, m, view); m
      }
      time("churn round 1 (DELETE+UPDATE)") {
        s.sql(s"DELETE FROM $cat.db.corpus WHERE doc_id % 9 = 1")
        s.sql(s"UPDATE $cat.db.corpus SET n_chars = n_chars + 500 WHERE doc_id % 9 = 2")
      }
      // sub-step anatomy of what refreshOnce #1 is about to do
      locally {
        val rel = tab.refresh(); mv.refresh()
        val cur = mv.metadata.properties(
          graft.streaming.MaterializedAgg.CursorProp).toLong
        val head = rel.metadata.currentSnapshotId.get
        val batch = time("  anatomy: changelog count")(
          { val b = graft.streaming.TableChanges
              .changelog(rel, Some(cur), Some(head)); b.count(); b })
        time("  anatomy: state scan count")(mv.scan.toDF.count())
        val elector: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          keys => rel.scan.toDF.join(keys, view.keys, "left_semi")
        val folded = graft.ops.IncrementalAgg.applyChangelog(
          mv.scan.toDF, batch, view, elector)
        time("  anatomy: fold (applyChangelog) count")(folded.count())
      }
      time("refreshOnce #1")(
        graft.streaming.MaterializedAgg.refreshOnce(tab.refresh(), mv, view))
      time("churn round 2 (UPDATE+append)") {
        s.sql(s"UPDATE $cat.db.corpus SET n_chars = n_chars - 600 WHERE doc_id % 9 = 4")
        tab.refresh().append(docs.filter(col("doc_id") % 3 === 0))
      }
      time("refreshOnce #2")(
        graft.streaming.MaterializedAgg.refreshOnce(tab.refresh(), mv, view))
      time("final MV scan")(mv.refresh().scan.toDF
        .orderBy(col("source"), col("lang")).collect().length)
    }

    // r15: the two refresh-floor cuts, measured. (a) refreshAll shares
    // ONE changelog materialization across same-cursor MVs (vs N solo
    // reads); (b) a net-zero churn batch commits CURSOR-ONLY — no keyed
    // DML, no file writes, so the ~2-2.5 s commit floor disappears for
    // ranges that net nothing.
    for (mode <- Seq("solo", "shared")) {
      println(s"--- 3 same-cursor MVs, $mode ---")
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      val cat = s"gmvs_$mode"
      val whDir = java.nio.file.Files.createTempDirectory("graft_mvshared").toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
      val hc = new graft.catalog.HadoopCatalog(whDir, s)
      val tab = hc.createTable("db.corpus",
        graft.core.Schema.fromSpark(docs.schema),
        properties = Map("format-version" -> "2",
          "write.delete.mode" -> "merge-on-read",
          "write.update.mode" -> "merge-on-read"))
      tab.append(docs.filter(col("doc_id") % 3 =!= 0))
      val view = graft.ops.IncrementalAgg.AggView(
        keys = Seq("source", "lang"), sums = Seq("n_chars"),
        mins = Seq("n_chars"), maxs = Seq("n_chars"))
      val mvs = (1 to 3).map { i =>
        val m = hc.createTable(s"db.stats$i",
          graft.streaming.MaterializedAgg.schemaFor(view, tab),
          properties = Map("format-version" -> "2"))
        graft.streaming.MaterializedAgg.bootstrap(tab, m, view); m
      }
      s.sql(s"DELETE FROM $cat.db.corpus WHERE doc_id % 9 = 1")
      s.sql(s"UPDATE $cat.db.corpus SET n_chars = n_chars + 500 WHERE doc_id % 9 = 2")
      val rel = tab.refresh()
      if (mode == "solo")
        time("3x refreshOnce (3 feed reads)")(
          mvs.foreach(m => graft.streaming.MaterializedAgg.refreshOnce(rel, m)))
      else
        time("refreshAll (ONE feed read)")(
          graft.streaming.MaterializedAgg.refreshAll(rel, mvs))
      // net-zero churn: retire + reinsert identical rows → cursor-only
      val eng = new graft.catalog.HadoopCatalog(whDir, s).loadTable("db.corpus")
      val keep = eng.scan.toDF.filter(col("doc_id") % 9 === 5)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .cache()
      keep.count()
      s.sql(s"DELETE FROM $cat.db.corpus WHERE doc_id % 9 = 5")
      eng.refresh().append(keep)
      time("net-zero refreshOnce (cursor-only)")(
        graft.streaming.MaterializedAgg.refreshOnce(eng.refresh(), mvs.head))
      keep.unpersist()
    }
    s.stop()
  }
}
