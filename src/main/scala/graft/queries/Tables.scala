package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Helpers shared by all query entries.
  *
  * Determinism rules (driver hashes results vs a DuckDB oracle):
  *   - every query ends in an explicit orderBy on a unique key prefix;
  *   - aggregated doubles go through exact DECIMAL arithmetic and are cast
  *     back to double only at the end, so Spark and DuckDB produce
  *     bit-identical values regardless of summation order.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact money type: all testdata numerics are 2-decimal doubles. */
  val Money: DecimalType = DecimalType(18, 2)

  /** Guard for gate queries whose filter/construction is MEANT to select
    * data: a predicate that can never match would otherwise "pass"
    * vacuously with 0 rows on both engines (VERDICT r6 W1). The isEmpty
    * probe terminates at the first row, so the cost is one tiny job. */
  def nonEmpty(df: DataFrame): DataFrame = {
    require(!df.isEmpty,
      "gate query selected 0 rows — vacuous gate, check the construction against the testdata")
    df
  }
}
