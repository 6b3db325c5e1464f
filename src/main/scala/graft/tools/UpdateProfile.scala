package graft.tools
import org.apache.spark.sql.SparkSession

/** Stage anatomy of the CoW SQL UPDATE: v2 (no lineage machinery) vs v3
  * (lineage diff), same data, same predicate — the delta is the lineage
  * diff's cost; repeated to settle JIT. */
object UpdateProfile {
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
      Seq("2", "3").foreach { fv =>
        val whDir = java.nio.file.Files.createTempDirectory("upd-prof").toString
        val cat = s"gupd${round}v$fv"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
        val tab = new graft.catalog.HadoopCatalog(whDir, s)
          .createTable("db.orders", graft.core.Schema.fromSpark(orders.schema),
            properties = Map("format-version" -> fv))
        tab.append(orders.repartition(4))
        time(s"v$fv UPDATE")(s.sql(
          s"""UPDATE $cat.db.orders SET o_orderstatus = concat(o_orderstatus, 'X')
             |WHERE o_totalprice > 200000""".stripMargin))
      }
    }
    s.stop()
  }
}
