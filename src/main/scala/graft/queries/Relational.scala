package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational surface exercised through the engine's scans.
  *
  * The reference (apache/iceberg-python) delegates row-level compute to
  * Arrow; our engine delegates to Catalyst. These queries pin down the
  * relational operators listed in SURVEY.md §2.B (predicates) and §2.I
  * (joins / aggregates / dedup checks) — each has a DuckDB oracle.
  */
object Relational {
  import Tables._

  /** TPC-H Q1-style scan + group-by aggregate with map-side partial agg.
    * Ref semantics: scan filter + Arrow aggregate (io/pyarrow.py:1678). */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast(Money)).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast(Money)).cast("double").as("sum_base_price"),
        sum($"l_extendedprice".cast(Money) * (lit(1).cast(Money) - $"l_discount".cast(Money)))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style 3-way join + agg + top-k. customer and orders are much
    * smaller than lineitem: Catalyst broadcasts them (AQE confirms at sf0.1;
    * at 100 TB orders is no longer broadcastable and this becomes a shuffle
    * join on o_orderkey — the groupBy reuses that partitioning). */
  def q3JoinTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust  = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val ord   = t(s, dir, "orders").filter($"o_orderdate" < lit("1995-03-15").cast("timestamp"))
    val line  = t(s, dir, "lineitem").filter($"l_shipdate" > lit("1995-03-15").cast("timestamp"))
    line
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum($"l_extendedprice".cast(Money) * (lit(1).cast(Money) - $"l_discount".cast(Money)))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3JoinTopKSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Scan with row filter + column select — the reference's core read path
    * (DataScan table/__init__.py:2227). Filter and projection must reach the
    * parquet scan (PushedFilters / ReadSchema in .explain). */
  def scanFilterSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_discount" > 0.05 && $"l_quantity" < 10.0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val scanFilterSelectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_discount > 0.05 AND l_quantity < 10.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Deterministic limit: top-n by key (ref: scan limit io/pyarrow.py:1792). */
  def scanLimit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders").orderBy($"o_orderkey").limit(100)
  }

  val scanLimitSql: String =
    "SELECT * FROM orders ORDER BY o_orderkey LIMIT 100"

  /** Predicate battery: In / NotIn / StartsWith / NotNull / between-style
    * ranges (SURVEY §2.B) compiled to Spark Columns. */
  def predicates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .filter($"p_brand".isin("Brand#1", "Brand#2", "Brand#3") &&
              !$"p_type".isin("SMALL PLATED") &&
              $"p_name".startsWith("a") === false &&
              $"p_size".isNotNull &&
              $"p_size" >= 5 && $"p_size" <= 40)
      .select($"p_partkey", $"p_name", $"p_brand", $"p_size")
      .orderBy($"p_partkey")
  }

  val predicatesSql: String =
    """SELECT p_partkey, p_name, p_brand, p_size FROM part
      |WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')
      |  AND p_type NOT IN ('SMALL PLATED')
      |  AND p_name NOT LIKE 'a%'
      |  AND p_size IS NOT NULL AND p_size BETWEEN 5 AND 40
      |ORDER BY p_partkey""".stripMargin

  /** Inner join on keys — the upsert matched-row path
    * (ref upsert_util.py:100). Join key = identifier field. */
  def innerJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(c, $"o_custkey" === $"c_custkey", "inner")
      .select($"o_orderkey", $"c_custkey", $"c_name", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val innerJoinSql: String =
    """SELECT o_orderkey, c_custkey, c_name, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** Anti join — the upsert insert-detection path (ref table/__init__.py:915
    * filter(~match)). left_anti avoids materializing the negation. */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val antiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Distinct partition tuples — write fan-out planning
    * (ref io/pyarrow.py:3080 group_by(...).aggregate([])). */
  def distinctTuples(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select($"l_returnflag", $"l_linestatus")
      .distinct()
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val distinctTuplesSql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Duplicate-key check — upsert precondition (ref upsert_util.py:51). */
  def dupKeyCheck(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n"))
      .filter($"n" > 1)
      .orderBy($"l_orderkey")
  }

  val dupKeyCheckSql: String =
    """SELECT l_orderkey, count(*) AS n FROM lineitem
      |GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey""".stripMargin

  /** Window functions over the scan output (engine-level SQL surface,
    * SURVEY §2.I note) — ranked orders per customer. */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"rn")
      .orderBy($"o_custkey", $"rn", $"o_orderkey")
  }

  val windowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn, o_orderkey""".stripMargin

  /** Metadata-count equivalent over raw parquet (ref DataScan.count
    * table/__init__.py:2341 short-circuits on file stats; on an unfiltered
    * parquet scan Spark likewise answers from footer row counts). */
  def countStar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = t(s, dir, "lineitem").count()
    s.createDataFrame(Seq(Tuple1(n))).toDF("cnt")
  }

  val countStarSql: String = "SELECT count(*) AS cnt FROM lineitem"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> (q1Agg _),
    "q3_join_topk"      -> (q3JoinTopK _),
    "scan_filter_select"-> (scanFilterSelect _),
    "scan_limit"        -> (scanLimit _),
    "predicates"        -> (predicates _),
    "inner_join"        -> (innerJoin _),
    "anti_join"         -> (antiJoin _),
    "distinct_tuples"   -> (distinctTuples _),
    "dup_key_check"     -> (dupKeyCheck _),
    "window_rank"       -> (windowRank _),
    "count_star"        -> (countStar _),
  )

  val oracles: Map[String, String] = Map(
    "q1_agg"            -> q1AggSql,
    "q3_join_topk"      -> q3JoinTopKSql,
    "scan_filter_select"-> scanFilterSelectSql,
    "scan_limit"        -> scanLimitSql,
    "predicates"        -> predicatesSql,
    "inner_join"        -> innerJoinSql,
    "anti_join"         -> antiJoinSql,
    "distinct_tuples"   -> distinctTuplesSql,
    "dup_key_check"     -> dupKeyCheckSql,
    "window_rank"       -> windowRankSql,
    "count_star"        -> countStarSql,
  )
}
