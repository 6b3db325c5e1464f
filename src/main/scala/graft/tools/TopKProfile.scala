package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale sweep for top-k-per-group IVM (graft.ops.IncrementalTopK):
  * FIXED churn against 1× and 4× corpora over a key-range-partitioned
  * table. The from-scratch window ranking must grow with the corpus;
  * the changelog APPLY must stay ~FLAT — its inputs are the churn-sized
  * batch, the k·groups state, and the hole groups' re-election scan,
  * which prunes to the churned key ranges' files. */
object TopKProfile {
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
    val w = math.max(1L, shift / 10L)

    def run(label: String, copies: Int): Unit = {
      val orders = (0 until copies).map(i =>
        base.withColumn("o_orderkey", col("o_orderkey") + lit(i * shift)))
        .reduce(_ unionByName _)
      println(s"--- $label (rows=${orders.count()}) ---")
      val whDir = java.nio.file.Files.createTempDirectory("topkprof").toString
      val cat = s"gtk$copies"
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
      // ~1000 groups per copy: top-3 per (key range, sub-bucket)
      val v = graft.ops.IncrementalTopK.TopKView(
        keys = Seq("krange", "kb"), ord = "o_totalprice",
        id = "o_orderkey", k = 3)
      def shaped(df: DataFrame): DataFrame = df
        .withColumn("krange", col("o_orderkey") - pmod(col("o_orderkey"), lit(w)))
        .withColumn("kb", pmod(col("o_orderkey"), lit(100L)))
      val rel0 = tab.refresh()
      val (state0, initSec) = time("init (from-scratch top-k)") {
        val st = graft.ops.IncrementalTopK.init(
          shaped(rel0.scan.useSnapshot(c0.get).toDF), v)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        st.count(); st
      }
      // FIXED churn regardless of corpus size: key range 0 only —
      // deletes guarantee holes (some top-3 members die)
      time("fixed-churn DML (delete+update)") {
        s.sql(s"DELETE FROM $cat.db.orders WHERE o_orderkey % 7 = 3 " +
          s"AND o_orderkey < $w")
        s.sql(s"UPDATE $cat.db.orders SET o_totalprice = o_totalprice + 1 " +
          s"WHERE o_orderkey % 7 = 5 AND o_orderkey < $w")
      }
      val rel = tab.refresh()
      var electorFiles = -1
      val (_, applySec) = time("top-k apply (changelog + holes)") {
        val batch = shaped(graft.streaming.TableChanges.changelog(rel, c0))
        val st1 = graft.ops.IncrementalTopK.applyChangelog(
          state0, batch, v, { keys =>
            val ranges = keys.select(col("krange")).distinct()
              .collect().map(_.getLong(0)).toSeq
            import graft.core.{And => GAnd, Or => GOr, GtEq, Lt}
            val pred = ranges.map(r =>
              GAnd(GtEq("o_orderkey", r), Lt("o_orderkey", r + w))
                : graft.core.Expr)
              .reduce[graft.core.Expr](GOr(_, _))
            val basef = rel.scan.filter(pred).toDF
            electorFiles = basef.inputFiles.length
            graft.ops.Joins.nullSafeSemi(shaped(basef), keys, v.keys)
          })
        st1.count()
      }
      val (_, rescanSec) = time("from-scratch re-rank (refresh)") {
        graft.ops.IncrementalTopK.init(shaped(rel.scan.toDF), v).count()
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
