package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog
import graft.core.Schema
import graft.functions.ZOrderBits

class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("normalization is order-preserving per type") {
    val ints = Seq(Int.MinValue, -7, -1, 0, 1, 42, Int.MaxValue)
    assert(ints.map(ZOrderBits.normInt) === ints.map(ZOrderBits.normInt).sorted)
    val longs = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue)
    assert(longs.map(ZOrderBits.normLong) === longs.map(ZOrderBits.normLong).sorted)
    val doubles = Seq(Double.NegativeInfinity, -1e300, -1.5, -0.0, 0.0, 2.5,
      1e300, Double.PositiveInfinity)
    val nd = doubles.map(ZOrderBits.normDouble)
    assert(nd.zip(nd.tail).forall { case (a, b) => a <= b })
    val strs = Seq("", "a", "ab", "b", "ba").map(
      org.apache.spark.unsafe.types.UTF8String.fromString)
    val ns = strs.map(ZOrderBits.normString)
    assert(ns.zip(ns.tail).forall { case (a, b) => a <= b })
  }

  test("interleave places bits round-robin from the MSB") {
    // two dims: key0 all-ones low 32, key1 zero → alternating 10 pattern
    val z = ZOrderBits.interleave(Array(0xffffffffL, 0L))
    assert(z === java.lang.Long.parseUnsignedLong(
      "1010101010101010101010101010101010101010101010101010101010101010", 2))
    // one dim: left-aligned 32 bits
    assert(ZOrderBits.interleave(Array(1L)) === (1L << 32))
    // locality: nearby keys share a long z-prefix
    val a = ZOrderBits.interleave(Array(100L, 200L))
    val b = ZOrderBits.interleave(Array(101L, 200L))
    val c = ZOrderBits.interleave(Array(100L, 3000000L))
    assert(java.lang.Long.numberOfLeadingZeros(a ^ b) >
      java.lang.Long.numberOfLeadingZeros(a ^ c))
  }

  test("zvalue column computes through codegen and matches eval") {
    val df = spark.range(0, 1000).toDF("a")
      .withColumn("b", (col("a") * 7919) % 1000)
    val z = df.withColumn("z",
      graft.functions.ZOrderFunctions.zvalue(Seq(col("a"), col("b"))))
    val rows = z.collect()
    rows.foreach { r =>
      val expect = ZOrderBits.interleave(Array(
        ZOrderBits.normLong(r.getLong(0)), ZOrderBits.normLong(r.getLong(1))))
      assert(r.getLong(2) === expect)
    }
  }

  test("zorder rewrite clusters files so 2-dim box predicates prune") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val cat = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft_z").toString, spark)
    val tab = cat.createTable("li_z", Schema.fromSpark(li.schema))
    tab.append(li.repartition(8))
    val total = tab.scan.planFiles()
    info(s"files=${total.size} bytes=${total.map(_.file.fileSizeInBytes).sum}")
    val (rewritten, added) = tab.rewriteDataFilesZOrder(
      Seq("l_orderkey", "l_partkey"), targetFileBytes = 32L * 1024)
    info(s"rewritten=$rewritten added=$added")
    assert(rewritten === 8)
    assert(added >= 4, s"added=$added")
    // contents unchanged
    assert(tab.scan.toDF.count() === li.count())
    val pre = li.agg(sum(col("l_quantity").cast("decimal(20,2)"))).head().getDecimal(0)
    val post = tab.scan.toDF
      .agg(sum(col("l_quantity").cast("decimal(20,2)"))).head().getDecimal(0)
    assert(pre === post)
    // both dimensions prune independently after clustering
    val k1 = tab.scan("l_orderkey <= 600").planFiles().size
    val k2 = tab.scan("l_partkey <= 20").planFiles().size
    info(s"read k1=$k1 k2=$k2 of $added")
    assert(k1 < added, s"l_orderkey pruning: $k1 of $added")
    assert(k2 < added, s"l_partkey pruning: $k2 of $added")
  }
}
