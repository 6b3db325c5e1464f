package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{assert_true, broadcast, col, concat, lit}

import graft.core.PathUtil

/** Broadcast (raw `_metadata.file_path` → canonical path) dictionary for
  * an explicit file list.
  *
  * The canonical source path of a row is per-FILE constant, but deriving
  * it from `_metadata.file_path` per ROW ([[PathUtil.metaPathCol]]: two
  * regexes plus url_decode) dominated wide scans' CPU — worse, `__file`
  * is the JOIN KEY of every lineage / MoR-anti-join / position-delete
  * read, and the optimizer inlines an aliased expression into the join
  * key, its inserted `isnotnull` filter, and the output project, so the
  * regexes ran per row per use (measured 7.2 s vs 0.26 s on a 1.5M-row
  * file). Scans instead join this driver-built dict on the raw metadata
  * path: the driver applies the same Hadoop qualification Spark's file
  * listing applies ([[PathUtil.sparkMetaPaths]]), so per-row work
  * collapses to one broadcast-hash probe and `__file` stays a plain
  * dict attribute downstream. A dict miss (an engine path form escaping
  * the prediction) fails LOUDLY via raise_error — a null-check per row,
  * never a regex — instead of silently dropping the row.
  */
private[graft] object PathDict {
  /** `df` must carry the raw metadata path as `__rawfile`; returns it
    * with `__rawfile` replaced by canonical column `as`. When `lineage`
    * is given (canon path → (first_row_id, data seq)), the dict also
    * carries `__first_row_id`/`__last_seq` — lineage scans get their
    * per-file constants from the SAME broadcast probe instead of a
    * second join keyed on the canonical string. */
  def join(df: DataFrame, rs: SparkSession, paths: Seq[String], as: String,
      lineage: Option[String => (Long, Long)] = None): DataFrame = {
    val hconf = rs.sessionState.newHadoopConf()
    val joined = lineage match {
      case None =>
        val dict = paths.distinct.flatMap { p =>
          val canon = PathUtil.canon(p)
          PathUtil.sparkMetaPaths(p, hconf).map(enc => (enc, canon))
        }
        df.join(broadcast(rs.createDataFrame(dict)
          .toDF("__rawfile", "__dictfile")), Seq("__rawfile"), "left")
      case Some(info) =>
        val dict = paths.distinct.flatMap { p =>
          val canon = PathUtil.canon(p)
          val (first, seq) = info(canon)
          PathUtil.sparkMetaPaths(p, hconf).map(enc => (enc, canon, first, seq))
        }
        df.join(broadcast(rs.createDataFrame(dict)
          .toDF("__rawfile", "__dictfile", "__first_row_id", "__last_seq")),
          Seq("__rawfile"), "left")
    }
    // the miss guard is a standalone FILTER (assert_true returns null on
    // pass), not a branch woven into the value — so `as` stays a plain
    // attribute and downstream joins hash it directly instead of
    // re-evaluating a guard expression as their key
    joined
      .filter(assert_true(col("__dictfile").isNotNull, concat(
        lit("path-dict miss: _metadata.file_path "), col("__rawfile"),
        lit(" matched no planned task path"))).isNull)
      .drop("__rawfile")
      .withColumnRenamed("__dictfile", as)
  }
}
