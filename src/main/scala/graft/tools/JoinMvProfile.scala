package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase anatomy of the `ice_mv_join_table` gate at sf0.1 — the most
  * construction-heavy gate in the suite: two catalogs + two MoR tables +
  * bootstrap + four DML churn rounds + two TWO-FEED exactly-once
  * refreshes. Substantiates the control-plane-floor claim: each refresh
  * = two churn-proportional changelog reads + a join-delta fold whose
  * non-delta sides are key-pruned + the shared changed-only landing
  * (one keyed-DML commit) — nothing corpus-proportional. */
object JoinMvProfile {
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
      println(f"PROF $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val fact0 = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val dim0 = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment"))
      val cat = s"gjmvp$rep"
      val whDir = java.nio.file.Files.createTempDirectory("graft_jmvprof").toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
      val hc = new graft.catalog.HadoopCatalog(whDir, s)
      val morProps = Map("format-version" -> "2",
        "write.delete.mode" -> "merge-on-read",
        "write.update.mode" -> "merge-on-read")
      val (factTab, dimTab) = time("create+append fact+dim") {
        val f = hc.createTable("db.orders",
          graft.core.Schema.fromSpark(fact0.schema), properties = morProps)
        val d = hc.createTable("db.customer",
          graft.core.Schema.fromSpark(dim0.schema), properties = morProps)
        f.append(fact0.filter(col("o_orderkey") % 3 =!= 0)); d.append(dim0)
        (f, d)
      }
      val jv = graft.ops.IncrementalJoinAgg.JoinView(
        factKeys = Seq("o_custkey"), dimKeys = Seq("c_custkey"),
        agg = graft.ops.IncrementalAgg.AggView(keys = Seq("c_mktsegment"),
          sums = Seq("o_orderkey"),
          mins = Seq("o_totalprice"), maxs = Seq("o_totalprice")))
      val mv = time("mv create+bootstrap") {
        val m = hc.createTable("db.seg_stats",
          graft.streaming.MaterializedJoinAgg.schemaFor(jv, factTab, dimTab),
          properties = Map("format-version" -> "2"))
        graft.streaming.MaterializedJoinAgg.bootstrap(factTab, dimTab, m, jv); m
      }
      time("churn round 1 (2 fact DML + 2 dim DML)") {
        s.sql(s"DELETE FROM $cat.db.orders WHERE o_orderkey % 9 = 1")
        s.sql(s"UPDATE $cat.db.orders SET o_totalprice = o_totalprice + 1000 " +
          "WHERE o_orderkey % 9 = 2")
        s.sql(s"UPDATE $cat.db.customer SET c_mktsegment = 'MACHINERY' " +
          "WHERE c_custkey % 7 = 3")
        s.sql(s"DELETE FROM $cat.db.customer WHERE c_custkey % 11 = 4")
      }
      // sub-step anatomy of what refreshOnce #1 is about to do
      locally {
        val fRel = factTab.refresh(); val dRel = dimTab.refresh(); mv.refresh()
        val cf = mv.metadata.properties(
          graft.streaming.MaterializedJoinAgg.FactCursorProp).toLong
        val cd = mv.metadata.properties(
          graft.streaming.MaterializedJoinAgg.DimCursorProp).toLong
        val hf = fRel.metadata.currentSnapshotId.get
        val hd = dRel.metadata.currentSnapshotId.get
        val fb = time("  anatomy: fact changelog count")(
          { val b = graft.streaming.TableChanges
              .changelog(fRel, Some(cf), Some(hf)); b.count(); b })
        val db = time("  anatomy: dim changelog count")(
          { val b = graft.streaming.TableChanges
              .changelog(dRel, Some(cd), Some(hd)); b.count(); b })
        val delta = graft.ops.IncrementalJoinAgg.joinDelta(
          Some(fb), Some(db), jv,
          dimAtCursor = keys => graft.ops.Joins.nullSafeSemi(
            dimTab.scan.useSnapshot(cd).toDF, keys, jv.dimKeys),
          factAtHead = keys => graft.ops.Joins.nullSafeSemi(
            factTab.scan.useSnapshot(hf).toDF, keys, jv.factKeys)).get
        time("  anatomy: join-delta count")(delta.count())
        val folded = graft.ops.IncrementalAgg.applyChangelog(
          mv.scan.toDF, delta, jv.agg,
          keys => graft.ops.Joins.nullSafeSemi(
            graft.ops.IncrementalJoinAgg.joinRows(
              factTab.scan.useSnapshot(hf).toDF,
              dimTab.scan.useSnapshot(hd).toDF, jv), keys, jv.agg.keys))
        time("  anatomy: fold (applyChangelog) count")(folded.count())
      }
      time("refreshOnce #1 (both sides churned)")(
        graft.streaming.MaterializedJoinAgg.refreshOnce(
          factTab.refresh(), dimTab.refresh(), mv))
      time("churn round 2 (fact append + dim UPDATE)") {
        factTab.refresh().append(fact0.filter(col("o_orderkey") % 3 === 0))
        s.sql(s"UPDATE $cat.db.customer SET c_mktsegment = 'BUILDING' " +
          "WHERE c_custkey % 7 = 5")
      }
      time("refreshOnce #2")(
        graft.streaming.MaterializedJoinAgg.refreshOnce(
          factTab.refresh(), dimTab.refresh(), mv))
      time("final MV scan")(mv.refresh().scan.toDF
        .orderBy(col("c_mktsegment")).collect().length)
    }
    s.stop()
  }
}
