package graft.core

/** v3 row lineage reserved fields (Iceberg spec §Row Lineage / §Reserved
  * Field IDs — an extension beyond the reference, which declares only the
  * manifest fields, ref manifest.py:406,:771).
  *
  * `_row_id` / `_last_updated_sequence_number` are normally INHERITED
  * (first_row_id + position; the file's data sequence number), but when a
  * writer moves an existing row to a different data file (compaction,
  * copy-on-write rewrites) the spec REQUIRES it to materialize the row's
  * current values as physical columns under these reserved ids. Readers
  * must prefer a non-null materialized value over inheritance. */
object RowLineage {
  val RowIdId = 2147483540
  val LastUpdatedId = 2147483539
  val RowIdName = "_row_id"
  val LastUpdatedName = "_last_updated_sequence_number"
  val RowId: NestedField = NestedField(RowIdId, RowIdName, ILong, required = false)
  val LastUpdated: NestedField =
    NestedField(LastUpdatedId, LastUpdatedName, ILong, required = false)
  val fields: Seq[NestedField] = Seq(RowId, LastUpdated)

  /** Table schema + the two reserved lineage columns — the write schema of
    * a v3 rewrite that materializes lineage. */
  def augment(schema: Schema): Schema =
    Schema(schema.fields ++ fields, schema.schemaId)

  val ReservedNames: Set[String] = Set(RowIdName, LastUpdatedName)

  /** v3 reserves the lineage column names at the TOP level of the table
    * schema (they are served as metadata columns and written as reserved
    * physical columns by rewrites — a user column with the same name
    * would be ambiguous on both faces). Enforced at v3 creation, at
    * upgrade-to-v3, and on every v3 schema evolution. */
  def requireNoReservedNames(schema: Schema): Unit = {
    val bad = schema.fields.map(_.name).filter(ReservedNames)
    require(bad.isEmpty,
      s"Column name(s) reserved for v3 row lineage: ${bad.mkString(", ")}")
  }
}
