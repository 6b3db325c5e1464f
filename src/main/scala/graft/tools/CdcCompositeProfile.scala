package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage anatomy of the two heaviest r14 CDC-composition gates
  * (`ds_tfidf_cdc`, `ds_decontaminate_cdc`): splits gate CONSTRUCTION
  * (table build + DML churn) from STATE RECONSTRUCTION (the maintained
  * index rebuilt in-gate from the cursor snapshot — a real pipeline
  * persists it between polls) from MAINTENANCE+SERVE (the poll, the
  * churn-sized index updates, and the output query). The claim under
  * test: the maintained-state path's own work is churn-proportional;
  * the gate time is dominated by construction + reconstruction, which
  * a standing pipeline never pays per poll. */
object CdcCompositeProfile {
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
      println(f"PROF $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count()
    (1 to 2).foreach { round =>
      println(s"--- tfidf_cdc round $round ---")
      val cat = s"gtfp$round"
      val whDir = java.nio.file.Files.createTempDirectory("tfprof").toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
      val tab = new graft.catalog.HadoopCatalog(whDir, s)
        .createTable("db.corpus", graft.core.Schema.fromSpark(docs.schema),
          properties = Map("format-version" -> "3"))
      time("construct: t0 append")(tab.append(docs.filter(col("doc_id") % 3 =!= 0)))
      val c0 = tab.refresh().metadata.currentSnapshotId
      time("construct: DELETE")(
        s.sql(s"DELETE FROM $cat.db.corpus WHERE doc_id % 9 = 1"))
      time("construct: UPDATE")(s.sql(
        s"UPDATE $cat.db.corpus SET text = concat(text, ' v2') WHERE doc_id % 9 = 2"))
      time("construct: ingest append")(
        tab.refresh().append(docs.filter(col("doc_id") % 3 === 0)))
      val rel = tab.refresh()
      def postings(d: org.apache.spark.sql.DataFrame) = d
        .select(col("doc_id"),
          explode(filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // state reconstruction: the maintained postings as of the cursor
      val post0 = postings(rel.scan.useSnapshot(c0.get).toDF)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("reconstruct: postings0")(post0.count())
      val df0 = post0.groupBy("term").agg(count(lit(1)).as("df"))
      time("reconstruct: df0")(df0.count())
      // maintenance + serve
      val (changes0, _) = graft.streaming.TableChanges.pollLineageCdc(rel, c0)
      val changes = changes0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("maintain: poll")(changes.count())
      val retired = changes.filter(col("_change_type").isin("delete", "update"))
        .select(col("doc_id"))
      val addedPost = postings(changes
        .filter(col("_change_type").isin("insert", "update"))
        .select(col("doc_id"), col("text")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("maintain: churn postings")(addedPost.count())
      val retiredPost = post0.join(retired, Seq("doc_id"), "left_semi")
      val dfDelta = addedPost.select(col("term"), lit(1L).as("d"))
        .unionByName(retiredPost.select(col("term"), lit(-1L).as("d")))
        .groupBy("term").agg(sum(col("d")).as("d"))
      val df1 = df0.join(dfDelta, Seq("term"), "full_outer")
        .select(col("term"),
          (coalesce(col("df"), lit(0L)) + coalesce(col("d"), lit(0L))).as("df"))
        .filter(col("df") > 0)
      time("maintain: df merge")(df1.count())
      val n1 = rel.scan.count()
      time("serve: changed-docs top-3")(
        addedPost.join(df1, Seq("term"))
          .withColumn("score", (col("tf") * n1).cast("double") / col("df").cast("double"))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
              .orderBy(col("score").desc, col("term"))))
          .filter(col("rk") <= 3).count())
      post0.unpersist(); changes.unpersist(); addedPost.unpersist()
    }
    s.stop()
  }
}
