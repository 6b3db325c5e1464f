package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale sweep for generic incremental view maintenance
  * (graft.ops.IncrementalAgg): FIXED churn against 1× and 4× corpora
  * over a key-range-partitioned table — the recency-localized shape a
  * real pipeline has (churn lands in a bounded partition range while
  * the corpus keeps growing). The from-scratch aggregate (what a
  * non-incremental pipeline pays every refresh) must grow with the
  * corpus; the changelog APPLY step must stay ~FLAT — its inputs are
  * the churn-sized changelog, the group-keyed state, and the hole
  * groups' key ranges, which the elector pushes into the scan as range
  * predicates so only churned truncate-partitions' files open. */
object IvmProfile {
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
      println(f"PROF $label%-32s $sec%8.3f s"); (r, sec)
    }
    val base = s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val shift = base.agg(max("o_orderkey")).head().getLong(0) + 1
    // 10 key-range partitions per corpus copy; churn stays inside range 0
    val w = math.max(1L, shift / 10L)

    def run(label: String, copies: Int): Unit = {
      val orders = (0 until copies).map(i =>
        base.withColumn("o_orderkey", col("o_orderkey") + lit(i * shift)))
        .reduce(_ unionByName _)
      println(s"--- $label (rows=${orders.count()}) ---")
      val whDir = java.nio.file.Files.createTempDirectory("ivmprof").toString
      val cat = s"givm$copies"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
      val schema = graft.core.Schema.fromSpark(orders.schema)
      val tab = new graft.catalog.HadoopCatalog(whDir, s)
        .createTable("db.orders", schema,
          graft.meta.PartitionSpec.build(schema, 0, ("o_orderkey",
            graft.core.TruncateTransform(w.toInt), "krange")),
          properties = Map("format-version" -> "2"))
      tab.append(orders.repartition(8))
      val c0 = tab.refresh().metadata.currentSnapshotId
      // view keyed by (key range, sub-bucket): ~1000 groups per copy,
      // krange doubles as the partition-aligned elector predicate
      val view = graft.ops.IncrementalAgg.AggView(
        keys = Seq("krange", "kb"), sums = Seq("o_totalprice"),
        mins = Seq("o_totalprice"), maxs = Seq("o_totalprice"))
      def shaped(df: DataFrame): DataFrame = df
        .withColumn("krange", col("o_orderkey") - pmod(col("o_orderkey"), lit(w)))
        .withColumn("kb", pmod(col("o_orderkey"), lit(100L)))
      val rel0 = tab.refresh()
      val (state0, initSec) = time("init (from-scratch aggregate)") {
        val st = graft.ops.IncrementalAgg.init(
          shaped(rel0.scan.useSnapshot(c0.get).toDF), view)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        st.count(); st
      }
      // FIXED churn regardless of corpus size: key range 0 only
      time("fixed-churn DML (delete+update)") {
        s.sql(s"DELETE FROM $cat.db.orders WHERE o_orderkey % 7 = 3 " +
          s"AND o_orderkey < $w")
        s.sql(s"UPDATE $cat.db.orders SET o_totalprice = o_totalprice + 1 " +
          s"WHERE o_orderkey % 7 = 5 AND o_orderkey < $w")
      }
      val rel = tab.refresh()
      var electorFiles = -1
      time("changelog alone (diagnostic)") {
        graft.streaming.TableChanges.changelog(rel, c0).count()
      }
      val (_, applySec) = time("IVM apply (changelog + holes)") {
        val batch = shaped(graft.streaming.TableChanges.changelog(rel, c0))
        val st1 = graft.ops.IncrementalAgg.applyChangelog(
          state0, batch, view, { keys =>
            // hole groups' key ranges → truncate-partition-pruned scan
            val ranges = keys.select(col("krange")).distinct()
              .collect().map(_.getLong(0)).toSeq
            import graft.core.{And => GAnd, Or => GOr, GtEq, Lt}
            val pred = ranges.map(r =>
              GAnd(GtEq("o_orderkey", r), Lt("o_orderkey", r + w))
                : graft.core.Expr)
              .reduce[graft.core.Expr](GOr(_, _))
            val basef = rel.scan.filter(pred).toDF
            electorFiles = basef.inputFiles.length
            shaped(basef).join(keys, view.keys, "left_semi")
          })
        st1.count()
      }
      // the comparison a refresh pipeline cares about
      val (_, rescanSec) = time("from-scratch re-aggregate (refresh)") {
        graft.ops.IncrementalAgg.init(shaped(rel.scan.toDF), view).count()
      }
      val totalFiles = rel.scan.toDF.inputFiles.length
      println(f"SUMMARY $label init=$initSec%.2f apply=$applySec%.2f " +
        f"rescan=$rescanSec%.2f electorFiles=$electorFiles/$totalFiles")
      state0.unpersist()
    }

    run("1x corpus", 1)
    run("4x corpus", 4)
    s.stop()
  }
}
