package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{IncrementalTopK, Joins}
import graft.ops.IncrementalTopK.TopKView
import graft.table.IceTable

/** TOP-K MATERIALIZED VIEWS — the persisted, exactly-once face of
  * [[graft.ops.IncrementalTopK]]: the top-k-per-group rows live in
  * their own Iceberg table whose refresh cursor rides the SAME atomic
  * commit as the refreshed rows ([[MaterializedAgg]]'s contract), so
  * replays no-op and a crash between data and cursor cannot happen.
  *
  * Unlike an aggregate MV (one row per group), a rank MV holds UP TO K
  * ROWS per group — the landing therefore diffs whole GROUP IMAGES:
  * a touched group whose new row-set equals its current rows commits
  * nothing; a changed group retires ALL its rows by key and lands the
  * full new image (k rows), keeping untouched groups' files
  * byte-identical through the keyed-write targeting.
  *
  * The view definition (keys, ord, id, k) rides the MV's properties —
  * a table bootstrapped as a top-k view self-describes its refresh;
  * [[MaterializedAgg.refreshOnce]] pointed at it fails loudly (no
  * aggregate-view definition present) and vice versa. */
object MaterializedTopK {

  val KeysProp = "graft.mv.topk-keys"
  val OrdProp = "graft.mv.topk-ord"
  val IdProp = "graft.mv.topk-id"
  val KProp = "graft.mv.topk-k"

  private def viewProps(v: TopKView): Map[String, String] = {
    require((v.keys :+ v.ord :+ v.id).forall(!_.contains(",")),
      "view column names must not contain ','")
    Map(KeysProp -> v.keys.mkString(","), OrdProp -> v.ord,
      IdProp -> v.id, KProp -> v.k.toString)
  }

  /** The top-k view the MV table carries; None when not a top-k MV. */
  def viewOf(mv: IceTable): Option[TopKView] =
    for {
      ks <- mv.metadata.properties.get(KeysProp)
      ord <- mv.metadata.properties.get(OrdProp)
      id <- mv.metadata.properties.get(IdProp)
      k <- mv.metadata.properties.get(KProp)
    } yield TopKView(ks.split(",").toSeq.filter(_.nonEmpty), ord, id, k.toInt)

  /** The MV table's schema: the source's scan shape (top-k keeps whole
    * rows), with fresh ids. */
  def schemaFor(source: IceTable): graft.core.Schema = {
    val st = source.scan.toDF.limit(0).schema
    graft.core.Schema.fromSpark(org.apache.spark.sql.types.StructType(
      st.fields.map(_.copy(metadata = org.apache.spark.sql.types.Metadata.empty))))
  }

  /** Full build: the source's current top-k into the (empty) MV table,
    * view definition + cursor stamped in the same commit. `filter`
    * (predicate DSL) makes it a FILTERED rank view — the top-k of
    * `SELECT * WHERE p`, maintained from the filtered changelog (a row
    * updated out of p retracts via its filtered pre-image; churn below
    * p is silent; the elector re-ranks only p's survivors). */
  def bootstrap(source: IceTable, mv: IceTable, v: TopKView,
      filter: Option[String] = None): Option[Long] = {
    source.refresh(); mv.refresh()
    require(mv.metadata.properties.get(MaterializedAgg.CursorProp).isEmpty,
      s"table ${mv.name} is already a materialized view (cursor present) — " +
        "use refreshOnce")
    val head = source.metadata.currentSnapshotId.getOrElse(return None)
    val f = filter.map(graft.core.ExprParser.parse) // validates the DSL
    val sc = source.scan.useSnapshot(head)
    val full = IncrementalTopK.init(f.map(sc.filter).getOrElse(sc).toDF, v)
    val guard = IceTable.guardedCursorStamp(
      mv.name, None, head.toString, MaterializedAgg.CursorProp)
    mv.applyKeyed(None, v.keys, Some(full),
      m => { val g = guard(m)
        g.copy(properties = g.properties ++ viewProps(v) ++
          filter.map(MaterializedAgg.FilterProp -> _)) },
      mv.metadata.currentSnapshotId)
    Some(head)
  }

  /** Fold every source commit since the MV's cursor, exactly-once.
    * Returns (groups rewritten, rows written); (0, 0) when the source
    * has not moved or the range netted nothing (cursor still advances,
    * metadata-only on the netted case). */
  def refreshOnce(source: IceTable, mv: IceTable): (Long, Long) = {
    source.refresh(); mv.refresh()
    val v = viewOf(mv).getOrElse(throw new IllegalArgumentException(
      s"table ${mv.name} carries no top-k view definition — bootstrap it " +
        "first (an aggregate MV refreshes via MaterializedAgg.refreshOnce)"))
    val cur = mv.metadata.properties.get(MaterializedAgg.CursorProp).map(_.toLong)
    require(cur.nonEmpty,
      s"table ${mv.name} has no refresh cursor — bootstrap it first")
    val head = source.metadata.currentSnapshotId.getOrElse(return (0L, 0L))
    if (cur.contains(head)) return (0L, 0L) // replay/no-op
    val stamp = IceTable.guardedCursorStamp(
      mv.name, cur.map(_.toString), head.toString, MaterializedAgg.CursorProp)
    val f = MaterializedAgg.filterOf(mv) // filtered rank view: file-pruned feed
    val batch = TableChanges.changelog(source, cur, Some(head), f)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = batch.select(v.keys.map(col): _*).distinct()
      if (touched.isEmpty) {
        mv.commitMetadata(stamp) // e.g. compaction-only range
        return (0L, 0L)
      }
      val state = mv.scan.toDF
      val st1 = IncrementalTopK.applyChangelog(state, batch, v,
        keys => { // elector pinned to the fold's end cursor, p-filtered
          val sc = source.scan.useSnapshot(head)
          Joins.nullSafeSemi(f.map(sc.filter).getOrElse(sc).toDF, keys, v.keys)
        })
      // group-image diff: a touched group re-landing on its exact
      // current row-set commits nothing
      val images = Joins.nullSafeSemi(st1, touched, v.keys)
        .select(state.columns.map(col).toSeq: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val curRows = Joins.nullSafeSemi(state, touched, v.keys)
        val changedKeys = images.exceptAll(curRows)
          .unionByName(curRows.exceptAll(images))
          .select(v.keys.map(col): _*).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val nGroups = changedKeys.count()
          if (nGroups == 0) {
            mv.commitMetadata(stamp)
            return (0L, 0L)
          }
          // retire EVERY row of each changed group, land its full image
          val fullImages = Joins.nullSafeSemi(images, changedKeys, v.keys)
          val nRows = fullImages.count()
          mv.applyKeyed(Some(changedKeys), v.keys,
            if (nRows > 0) Some(fullImages) else None,
            stamp, mv.metadata.currentSnapshotId)
          (nGroups, nRows)
        } finally changedKeys.unpersist()
      } finally images.unpersist()
    } finally batch.unpersist()
  }
}
