package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Scratch profiling harness (Test tree only; not shipped).
object ProfMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[8]")
      .config("spark.sql.shuffle.partitions", 8).appName("prof").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.functions.TextFunctions
    val docs0 = spark.read.parquet(dir + "/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"PROF $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    // warm
    docs0.count()
    val docs = docs0.select(col("doc_id"), TextFunctions.shingles3(col("text")).as("ws"),
      TextFunctions.minhash_sig(col("text"), 128).as("sig"))
    println("PROF avg shingles/doc = " + docs.select(avg(size(col("ws")))).collect()(0))
    val bands = docs.select(col("doc_id"), explode(transform(
      sequence(lit(0), lit(63)),
      b => struct(b.as("band"),
        element_at(col("sig"), b * 2 + 1).as("h1"),
        element_at(col("sig"), b * 2 + 2).as("h2")))).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.h1").as("h1"), col("bk.h2").as("h2"))
    time("bands count") { bands.count() }
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.h1") === col("y.h1") &&
          col("x.h2") === col("y.h2") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val nc = time("cands count") { cands.count() }
    println("PROF n_cands=" + nc)
    time("full dedupMinhashLsh") { graft.queries.DataOps.dedupMinhashLsh(spark, dir).count() }

    // jaccard breakdown
    val jd = docs.select(col("doc_id"), col("ws"))
    val exploded = jd.select(col("doc_id"), size(col("ws")).as("n"), explode(col("ws")).as("tok"))
    time("exploded count") { exploded.count() }
    val freq = exploded.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    time("freq count") { freq.count() }
    val ranked = exploded.join(freq, Seq("tok"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), col("tok"))))
      .withColumn("k", (col("n") - ceil(col("n") * 0.5) + 1).cast("int"))
    val tokens = ranked.filter(col("rank") <= col("k"))
      .select(col("doc_id"), col("n"), col("tok"))
    time("prefix tokens count") { tokens.count() }
    time("full dedupJaccard") { graft.queries.DataOps.dedupJaccard(spark, dir).count() }
    spark.stop()
  }
}
