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
    * vacuously with 0 rows on both engines (VERDICT r6 W1).
    *
    * The probe is `count() > 0`, NOT `isEmpty`: isEmpty is take(1) over
    * the gate's final ORDERED frame, so Catalyst keeps the top-k sort and
    * the full-width projection — the probe re-ran the gate's whole DAG in
    * its most expensive shape (job-anatomy, sf0.1: 8.0 s / 22 jobs on
    * ds_curate_cdc where the count-shaped probe is 0.3 s — the optimizer
    * eliminates the sort and prunes every column under count, guide
    * §1.4). Guard semantics identical: count()==0 ⟺ isEmpty. */
  def nonEmpty(df: DataFrame): DataFrame = {
    require(df.count() > 0L,
      "gate query selected 0 rows — vacuous gate, check the construction against the testdata")
    df
  }
}
