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
}
