package graft.ops

import org.apache.spark.sql.DataFrame

/** Null-safe keyed semi/anti joins. A `using`-column join compares keys
  * with `=`, so a NULL-keyed row never matches its own counterpart — a
  * retire/targeting join built that way silently exempts null-keyed
  * groups (they are never retired, their images never land), while the
  * rest of the engine (IncrementalAgg's state merge, groupBy itself)
  * treats a null key as its own group. These helpers join with `<=>`
  * instead; semi/anti joins emit only left-side columns, so no column
  * dedup is needed. */
object Joins {

  def nullSafeSemi(left: DataFrame, right: DataFrame, cols: Seq[String]): DataFrame =
    nullSafe(left, right, cols, "left_semi")

  def nullSafeAnti(left: DataFrame, right: DataFrame, cols: Seq[String]): DataFrame =
    nullSafe(left, right, cols, "left_anti")

  private def nullSafe(left: DataFrame, right: DataFrame, cols: Seq[String],
      joinType: String): DataFrame = {
    require(cols.nonEmpty, "null-safe join needs at least one key column")
    val l = left.alias("__nsl")
    val r = right.alias("__nsr")
    l.join(r, cols.map(c => l.col(c) <=> r.col(c)).reduce(_ && _), joinType)
  }
}
