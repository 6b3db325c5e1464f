package graft.core

import org.apache.spark.sql.types.StructType

/** Iceberg schema: an IStruct plus schema-id and identifier fields.
  *
  * Replicates the reference's schema machinery (ref: pyiceberg/schema.py:82
  * Schema; :1041 index_by_id; :1208 index_by_name; :1492 prune_columns).
  * Column resolution is by field-id — names are labels that can change
  * (rename) without rewriting data.
  */
final case class Schema(
    fields: Seq[NestedField],
    schemaId: Int = 0,
    identifierFieldIds: Seq[Int] = Nil) {

  lazy val struct: IStruct = IStruct(fields)

  // Column resolution is BY ID: a duplicate id silently shadows a column
  // in every id-keyed index and writes duplicate parquet field ids that
  // only fail later, at read, with an opaque vectorized-reader error
  // (e.g. assembling a schema from a scan-derived frame whose surviving
  // metadata ids collide with freshly assigned ones). Fail at
  // construction, naming the colliding columns.
  locally {
    val seen = scala.collection.mutable.Map[Int, String]()
    def walk(prefix: String, fs: Seq[NestedField]): Unit = fs.foreach { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      seen.put(f.id, path).foreach { prev =>
        throw new IllegalArgumentException(
          s"Schema has duplicate field id ${f.id}: [$prev, $path]")
      }
      f.fieldType match {
        case IStruct(nested) => walk(path, nested)
        case IList(eid, e, req) =>
          walk(path, Seq(NestedField(eid, "element", e, req)))
        case IMap(kid, k, vid, v, req) =>
          walk(path, Seq(NestedField(kid, "key", k, required = true),
            NestedField(vid, "value", v, req)))
        case _ =>
      }
    }
    walk("", fields)
  }

  /** id → field, including nested (ref: schema.py:1041). */
  lazy val byId: Map[Int, NestedField] = {
    val b = Map.newBuilder[Int, NestedField]
    def walk(fs: Seq[NestedField]): Unit = fs.foreach { f =>
      b += f.id -> f
      f.fieldType match {
        case IStruct(nested) => walk(nested)
        case IList(eid, e, req) => walk(Seq(NestedField(eid, "element", e, req)))
        case IMap(kid, k, vid, v, req) =>
          walk(Seq(NestedField(kid, "key", k, required = true), NestedField(vid, "value", v, req)))
        case _ =>
      }
    }
    walk(fields)
    b.result()
  }

  /** full dotted name → id (ref: schema.py:1208 index_by_name). */
  lazy val idByName: Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    def walk(prefix: String, fs: Seq[NestedField]): Unit = fs.foreach { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      b += path -> f.id
      f.fieldType match {
        case IStruct(nested) => walk(path, nested)
        case _ =>
      }
    }
    walk("", fields)
    b.result()
  }

  lazy val idByLowerName: Map[String, Int] = idByName.map { case (k, v) => k.toLowerCase -> v }

  def findField(name: String, caseSensitive: Boolean = true): Option[NestedField] =
    (if (caseSensitive) idByName.get(name) else idByLowerName.get(name.toLowerCase))
      .flatMap(byId.get)

  def findType(id: Int): Option[IceType] = byId.get(id).map(_.fieldType)

  /** Top-level position accessor for a field id (ref: schema.py:851 Accessor).
    * Nested accessors are not needed for partition records (always flat). */
  lazy val positionById: Map[Int, Int] = fields.zipWithIndex.map { case (f, i) => f.id -> i }.toMap

  /** Every field id (nested or not) → the id of its TOP-LEVEL ancestor —
    * what a columnar reader must materialize to evaluate a predicate on a
    * nested field (nested pruning within the struct is Spark's
    * SchemaPruning's job). */
  lazy val topAncestorById: Map[Int, Int] = {
    val b = Map.newBuilder[Int, Int]
    def walk(top: Int, t: IceType): Unit = t match {
      case IStruct(nested) => nested.foreach { f => b += f.id -> top; walk(top, f.fieldType) }
      case IList(eid, e, _) => b += eid -> top; walk(top, e)
      case IMap(kid, k, vid, v, _) =>
        b += kid -> top; b += vid -> top; walk(top, k); walk(top, v)
      case _ =>
    }
    fields.foreach { f => b += f.id -> f.id; walk(f.id, f.fieldType) }
    b.result()
  }

  /** id → full dotted name (inverse of idByName). */
  lazy val nameById: Map[Int, String] = idByName.map(_.swap)

  /** (dotted path, id, type repr) for every PRIMITIVE leaf reachable
    * through structs — the stats-harvest column set (a parquet footer's
    * column chunks are exactly these leaves; struct columns themselves
    * carry no stats). List/map internals are skipped (no dotted path). */
  lazy val leafColInfo: Seq[(String, Int, String)] =
    idByName.toSeq.sortBy(_._2).collect {
      case (path, id) if byId(id).fieldType.isPrimitive =>
        (path, id, byId(id).fieldType.repr)
    }

  /** Keep only the requested top-level columns, by name (ref: schema.py:1492
    * prune_columns — we prune whole top-level columns; nested pruning is
    * delegated to Spark's SchemaPruning once the scan projects). */
  def select(names: Seq[String], caseSensitive: Boolean = true): Schema = {
    if (names.contains("*")) return this
    // a nested selection keeps its whole top-level column (struct-internal
    // pruning is delegated to Spark's SchemaPruning)
    val wanted = names.map { n =>
      val id = findField(n, caseSensitive).getOrElse(
        throw new IllegalArgumentException(s"Column not found: $n")).id
      topAncestorById.getOrElse(id, id)
    }.toSet
    Schema(fields.filter(f => wanted(f.id)), schemaId, identifierFieldIds.filter(wanted))
  }

  def toSpark: StructType = StructType(fields.map(SchemaConv.toSparkField))

  def highestFieldId: Int = if (byId.isEmpty) 0 else byId.keys.max
}

object Schema {

  /** Make a field name Avro-compatible (ref: schema.py:1384
    * make_compatible_name): first char must be a letter or `_`, the rest
    * letters, digits or `_`. Invalid chars become `_xHHHH` (uppercase hex
    * code point) and a leading digit gains a `_` prefix — an INJECTIVE
    * encoding, unlike lossy `replaceAll("_")` which collides `a.b`/`a_b`. */
  def makeCompatibleName(name: String): String = {
    require(name.nonEmpty, "Can not sanitize an empty name")
    def validFirst(c: Char) = Character.isLetter(c) || c == '_'
    def validRest(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    def sanitizeChar(c: Char): String =
      if (Character.isDigit(c)) "_" + c
      else "_x" + Integer.toHexString(c).toUpperCase
    val ok = validFirst(name.head) && name.tail.forall(validRest)
    if (ok) name
    else {
      val sb = new StringBuilder
      sb.append(if (validFirst(name.head)) name.head.toString else sanitizeChar(name.head))
      name.tail.foreach(c => sb.append(if (validRest(c)) c.toString else sanitizeChar(c)))
      sb.toString
    }
  }

  /** Rewrite every (nested) field name to its Avro-compatible form, ids
    * and types unchanged (ref: schema.py:1440 sanitize_column_names). */
  def sanitizeColumnNames(schema: Schema): Schema = {
    def walk(t: IceType): IceType = t match {
      case IStruct(fs) => IStruct(fs.map(f =>
        f.copy(name = makeCompatibleName(f.name), fieldType = walk(f.fieldType))))
      case IList(id, el, req) => IList(id, walk(el), req)
      case IMap(kid, k, vid, v, req) => IMap(kid, walk(k), vid, walk(v), req)
      case prim => prim
    }
    Schema(schema.fields.map(f =>
      f.copy(name = makeCompatibleName(f.name), fieldType = walk(f.fieldType))),
      schema.schemaId, schema.identifierFieldIds)
  }

  /** Build from a Spark schema with fresh sequential ids
    * (ref: schema.py:1316 assign_fresh_schema_ids). */
  def fromSpark(st: StructType, schemaId: Int = 0): Schema = {
    var next = 0
    // top-level ids are assigned first (1..n), then nested — matches the
    // reference's fresh-id assignment order
    val topIds = st.fields.map { _ => next += 1; next }
    val counter = () => { next += 1; next }
    val fields = st.fields.toSeq.zip(topIds.toSeq).map { case (sf, id) =>
      val explicit = SchemaConv.fieldId(sf)
      NestedField(explicit.getOrElse(id), sf.name,
        SchemaConv.fromSpark(sf.dataType, counter), required = !sf.nullable)
    }
    Schema(fields, schemaId)
  }
}
