package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** sf0.1 -> derived-sf1 sweep for the r12 direct-commit CoW DELETE on a
  * day-partitioned table (routed staging + required clustering), plus a
  * same-data comparison against the rewrite path (unpartitioned v2 with
  * a sort order forces the fallback) — pins both the scaling exponent
  * and the write-once saving. */
object DirectCommitProfile {
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
    base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    big.count()
    def run(label: String, orders: DataFrame, round: Int, sorted: Boolean): Unit = {
      val whDir = java.nio.file.Files.createTempDirectory("dcp").toString
      val cat = s"gdcp${label.filter(_.isLetterOrDigit)}$round$sorted"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      val hatch = if (sorted) "'write.graft.direct-commit'='false'," else ""
      s.sql(s"""CREATE TABLE $cat.db.orders (
        o_orderkey BIGINT, o_orderdate DATE, o_totalprice DOUBLE)
        PARTITIONED BY (months(o_orderdate))
        TBLPROPERTIES ($hatch 'format-version'='3')""")
      val tab = new graft.catalog.HadoopCatalog(whDir, s).loadTable("db.orders")
      orders.select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .createOrReplaceTempView(s"src_$cat")
      s.sql(s"INSERT INTO $cat.db.orders SELECT * FROM src_$cat")
      time(s"$label ${if (sorted) "rewrite " else "direct  "} DELETE")(
        s.sql(s"DELETE FROM $cat.db.orders WHERE o_orderkey % 5 = 2"))
      val direct = tab.refresh().scan.planFiles()
        .forall(_.file.filePath.contains("/data/cow-"))
      println(s"  direct=$direct files=${tab.scan.planFiles().size}")
    }
    (1 to 2).foreach { r =>
      run("sf0.1", base, r, sorted = false)
      run("sf0.1", base, r, sorted = true)
      run("sf1", big, r, sorted = false)
      run("sf1", big, r, sorted = true)
    }
    s.stop()
  }
}
