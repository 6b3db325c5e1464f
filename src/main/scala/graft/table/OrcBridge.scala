package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.core._
import graft.meta.{FileContent, Io, MetadataJson}
import graft.spark.{DeleteFileRef, EqDeleteRef, GraftOrcPartitionReader}

/** DataFrame over ORC data files driven by the DSv2 ORC row reader — for
  * the reads Spark's ORC file source cannot express: absolute row
  * positions (`_metadata.row_index` is parquet-only in Spark 4.1) and
  * row-level delete application (ref io/pyarrow.py:1629 applies deletes
  * irrespective of data format). ORC enters a table only via add_files,
  * so these frames are rare and small relative to the parquet hot path;
  * still, the shape is distributed: one RDD partition per file, delete
  * content resolved executor-side, nothing row-sized on the driver. */
private[graft] object OrcScanBridge {

  /** One task descriptor: (file path, position-delete refs, equality refs). */
  type Desc = (String, Array[DeleteFileRef], Array[EqDeleteRef])

  def descOf(tableLocation: String, t: FileScanTask): Desc = {
    val (eqFiles, posFiles) =
      t.deletes.partition(_.content == FileContent.EqualityDeletes)
    val dels = posFiles.map { f =>
      if (f.isDeletionVector)
        DeleteFileRef(f.filePath,
          f.contentOffset.getOrElse(throw new IllegalStateException(
            s"Deletion vector ${f.filePath} lacks content-offset")),
          f.contentSizeInBytes.getOrElse(f.fileSizeInBytes))
      else DeleteFileRef(f.filePath, -1L, -1L,
        canonicalPaths = PathUtil.underDataRoot(tableLocation, f.filePath))
    }.toArray
    (t.file.filePath, dels,
      eqFiles.map(f => EqDeleteRef(f.filePath, f.equalityIds.toArray)).toArray)
  }

  /** Columns: `readSchema` under CURRENT names [+ `__file` string]
    * [+ `__pos` long]. File-side resolution requests registration-time
    * (name-mapped) names — rows are positional, so the attached Spark
    * schema restores current names for free. */
  def frame(session: SparkSession, mapping: Seq[MappedField],
      readSchema: Schema, eqSchema: Schema, descs: Seq[Desc],
      keepFile: Boolean, keepPos: Boolean): DataFrame = {
    def mapped(f: NestedField): NestedField =
      f.copy(name = NameMapping.nameOf(mapping, f.id).getOrElse(f.name))
    val readJson = MetadataJson.schemaToJson(Schema(readSchema.fields.map(mapped))).toString
    val eqJson =
      if (eqSchema.fields.isEmpty) ""
      else MetadataJson.schemaToJson(Schema(eqSchema.fields.map(mapped))).toString
    val confEntries = Io.confEntries(session)
    val wantFile = keepFile
    val wantPos = keepPos
    // slice count capped at 4/core: each slice walks its files
    // sequentially, so a million ORC files is not a million tasks
    val sc = session.sparkContext
    val slices = math.max(1, math.min(descs.size, 4 * sc.defaultParallelism))
    val rdd = sc.parallelize(descs, slices)
      .flatMap { case (path, dels, eqs) =>
        val rdr = new GraftOrcPartitionReader(path, readJson, -1L,
          Io.confFrom(confEntries), dels, eqs, eqJson, emitPos = wantPos)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ =>
            try rdr.close() catch { case _: Exception => () }))
        val pathU = org.apache.spark.unsafe.types.UTF8String
          .fromString(PathUtil.canon(path))
        new Iterator[InternalRow] {
          private var fetched = false
          private var has = false
          private var closed = false
          def hasNext: Boolean = {
            if (!fetched) {
              has = rdr.next(); fetched = true
              // close EAGERLY on exhaustion: a slice walks many files
              // sequentially, and holding every reader (file handle +
              // decompression buffers) to task completion would
              // accumulate thousands of open readers per task. The
              // completion listener stays as the error-path backstop.
              if (!has && !closed) {
                closed = true
                try rdr.close() catch { case _: Exception => () }
              }
            }
            has
          }
          def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            fetched = false
            val base = rdr.get().asInstanceOf[GenericInternalRow]
            if (!wantFile) base
            else {
              // reader layout is [cols..., pos?]; public layout is
              // [cols..., __file, __pos?] — splice the path before pos
              val vs = base.values
              val out = new Array[Any](vs.length + 1)
              val nCols = if (wantPos) vs.length - 1 else vs.length
              System.arraycopy(vs, 0, out, 0, nCols)
              out(nCols) = pathU
              if (wantPos) out(nCols + 1) = vs(nCols)
              new GenericInternalRow(out)
            }
          }
        }
      }
    val sparkSchema = StructType(
      readSchema.toSpark.fields ++
        (if (keepFile) Seq(StructField("__file", StringType)) else Nil) ++
        (if (keepPos) Seq(StructField("__pos", LongType)) else Nil))
    org.apache.spark.sql.GraftBridge.frameOfInternalRows(session, rdd, sparkSchema)
  }
}
