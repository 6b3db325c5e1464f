package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * DataFrame-producing function over the driver-supplied parquet dir;
  * `oracleSql` holds the DuckDB-equivalent SQL for hash comparison.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q3JoinTopK(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (graft.queries.Relational.queries ++ graft.queries.Iceberg.queries ++
      graft.queries.DataOps.queries ++ graft.queries.Advanced.queries)
      .map { case (name, fn) =>
        // release the previous query's persisted intermediates (dedup
        // shingle/minhash caches) so sequential runners (Bench, Verify)
        // don't accumulate pinned storage memory across queries. Contract:
        // each returned DataFrame is materialized before the next queries()
        // entry is invoked — exactly how the driver, Bench and Verify run.
        // (A released cache is only a perf matter anyway: consumers
        // recompute, results are unchanged.)
        name -> ((s: SparkSession, d: String) => {
          graft.queries.DataOps.releaseCaches(); fn(s, d)
        })
      }

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Iceberg.oracles ++
      graft.queries.DataOps.oracles ++ graft.queries.Advanced.oracles
}
