package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.orc.{ColumnStatistics, OrcFile, TypeDescription}

import graft.core._
import graft.meta.{DataFile, FileContent}

/** ORC footer → DataFile stats harvest, the ORC sibling of
  * StatsHarvester.fileToDataFile (ref: the reference reads ORC data files,
  * io/pyarrow.py:1119–1125, and keys ids via ORC_FIELD_ID_KEY :740 —
  * `iceberg.id` type attributes; files without ids resolve through the
  * table's name mapping exactly like id-less parquet).
  *
  * Column matching: by `iceberg.id` attribute when the writer recorded
  * them, else by (dotted) name against the table schema — the same
  * resolution order the scan uses. Bounds follow Iceberg semantics (date =
  * epoch days, decimal = unscaled/scale). Timestamp bounds are SKIPPED:
  * ORC stats store millis interpreted through writer-local conventions
  * that differ between `timestamp` and `timestamp_instant`; omitting the
  * bound only disables pruning, never correctness. */
object OrcStats extends Serializable {

  private val FieldIdAttr = "iceberg.id" // ref io/pyarrow.py:740 ORC_FIELD_ID_KEY

  def fileToDataFile(path: String, colInfo: Seq[(String, Int, String)],
      conf: Configuration = new Configuration(),
      modes: Map[Int, String] = Map.empty): DataFile = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val size = fs.getFileStatus(p).getLen
    val reader = OrcFile.createReader(p, OrcFile.readerOptions(conf).filesystem(fs))
    try {
      val rows = reader.getNumberOfRows
      val stats = reader.getStatistics
      val byName = colInfo.map(c => c._1 -> c).toMap
      val byId = colInfo.map(c => c._2 -> c).toMap
      val modeOf: Int => StatsHarvester.ModeSpec = id =>
        modes.get(id).map(StatsHarvester.parseMode)
          .getOrElse(StatsHarvester.ModeSpec(counts = true, bounds = true,
            trunc = Some(StatsHarvester.BoundTruncateLength)))

      val valueCounts = scala.collection.mutable.Map[Int, Long]()
      val nullCounts = scala.collection.mutable.Map[Int, Long]()
      val colSizes = scala.collection.mutable.Map[Int, Long]()
      val lowers = scala.collection.mutable.Map[Int, Any]()
      val uppers = scala.collection.mutable.Map[Int, Any]()

      /** walk struct members depth-first; `slots` = number of value slots
        * the member has (rows at top level, parent's non-null count below —
        * Iceberg value_count includes nulls at the member's own level). */
      def walk(td: TypeDescription, dotted: String, slots: Long): Unit = {
        val resolved: Option[(String, Int, String)] =
          Option(td.getAttributeValue(FieldIdAttr))
            .flatMap(v => scala.util.Try(v.toInt).toOption).flatMap(byId.get)
            .orElse(byName.get(dotted))
        val st = stats(td.getId)
        resolved.foreach { case (_, id, trepr) =>
          val t = StatsHarvester.parseType(trepr)
          val mode = modeOf(id)
          colSizes(id) = st.getBytesOnDisk
          if (mode.counts) {
            valueCounts(id) = slots
            nullCounts(id) = math.max(0L, slots - st.getNumberOfValues)
          }
          if (mode.bounds && st.getNumberOfValues > 0) {
            decode(st, t).foreach { case (lo, hi) =>
              var l: Option[Any] = Some(lo)
              var u: Option[Any] = Some(hi)
              if (t == IString) mode.trunc.foreach { n =>
                l = l.map(v => StatsHarvester.truncateLower(v.toString, n))
                u = u.flatMap(v => StatsHarvester.truncateUpper(v.toString, n))
              }
              l.foreach(v => lowers(id) = v)
              u.foreach(v => uppers(id) = v)
            }
          }
        }
        if (td.getCategory == TypeDescription.Category.STRUCT) {
          val names = td.getFieldNames
          val children = td.getChildren
          var i = 0
          while (i < names.size()) {
            val childPath = if (dotted.isEmpty) names.get(i) else s"$dotted.${names.get(i)}"
            walk(children.get(i), childPath, st.getNumberOfValues)
            i += 1
          }
        }
        // list/map members carry no per-element Iceberg stats — stop
      }

      val root = reader.getSchema
      require(root.getCategory == TypeDescription.Category.STRUCT,
        s"ORC file $path has a non-struct root schema")
      val names = root.getFieldNames
      val children = root.getChildren
      var i = 0
      while (i < names.size()) {
        walk(children.get(i), names.get(i), rows)
        i += 1
      }

      DataFile(
        content = FileContent.Data,
        filePath = PathUtil.canon(path),
        fileFormat = "ORC",
        partition = Nil,
        recordCount = rows,
        fileSizeInBytes = size,
        valueCounts = valueCounts.toMap,
        nullValueCounts = nullCounts.toMap,
        lowerBounds = lowers.toMap,
        upperBounds = uppers.toMap,
        columnSizes = colSizes.toMap)
    } finally reader.close()
  }

  /** (lower, upper) in Iceberg-internal representation, or None when the
    * ORC stat kind can't produce a sound bound for the type. */
  private def decode(st: ColumnStatistics, t: IceType): Option[(Any, Any)] =
    (st, t) match {
      case (s: org.apache.orc.IntegerColumnStatistics, IInt) =>
        Some((s.getMinimum.toInt, s.getMaximum.toInt))
      case (s: org.apache.orc.IntegerColumnStatistics, ILong) =>
        Some((s.getMinimum, s.getMaximum))
      case (s: org.apache.orc.DoubleColumnStatistics, IFloat) =>
        Some((s.getMinimum.toFloat, s.getMaximum.toFloat))
      case (s: org.apache.orc.DoubleColumnStatistics, IDouble) =>
        Some((s.getMinimum, s.getMaximum))
      case (s: org.apache.orc.StringColumnStatistics, IString) =>
        // newer writers may drop long min/max but keep valid loose bounds
        val lo = Option(s.getMinimum).orElse(Option(s.getLowerBound))
        val hi = Option(s.getMaximum).orElse(Option(s.getUpperBound))
        for (l <- lo; h <- hi) yield (l, h)
      case (s: org.apache.orc.DateColumnStatistics, IDate) =>
        Some((s.getMinimumDayOfEpoch.toInt, s.getMaximumDayOfEpoch.toInt))
      case (s: org.apache.orc.DecimalColumnStatistics, IDecimal(_, scale)) =>
        for (l <- Option(s.getMinimum); h <- Option(s.getMaximum)) yield (
          l.bigDecimalValue.setScale(scale),
          h.bigDecimalValue.setScale(scale))
      case (s: org.apache.orc.BooleanColumnStatistics, IBoolean) =>
        Some((s.getFalseCount == 0, s.getTrueCount > 0))
      case _ => None // timestamps (writer-local millis), binary, others: skip
    }
}
