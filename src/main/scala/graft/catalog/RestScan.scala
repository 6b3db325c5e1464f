package graft.catalog

import java.util.Base64

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.core._
import graft.meta.{DataFile, PartitionSpec}
import graft.table.FileScanTask

/** REST scan-planning wire model (ref: pyiceberg/catalog/rest/
  * scan_planning.py — RESTDataFile/RESTDeleteFile :70–110, RESTFileScanTask
  * :120, ScanTasks :128, PlanTableScanRequest :185; expression JSON per
  * expressions/__init__.py:85 `handle_primitive_type` — `{"type":"eq",
  * "term":…,"value":…}` nodes, bare booleans for always-true/false).
  *
  * Server-side planning moves manifest pruning from every client to the
  * catalog service: the response carries pruned content files (delete
  * files deduplicated into one array, tasks referencing them by index)
  * plus per-file residual filters. Values in partition tuples and bounds
  * are serialized TYPE-AWARE (both ends know the table schema), using the
  * engine's internal value model: date = epoch days, timestamps = epoch
  * micros, decimal = plain string, binary = base64.
  */
object RestScanJson {
  private val mapper = new ObjectMapper()

  // ---- typed single values ----------------------------------------------

  def valueToJson(t: IceType, v: Any, n: ObjectNode, field: String): Unit = v match {
    case null => n.putNull(field)
    case b: Boolean => n.put(field, b)
    case i: Int => n.put(field, i)
    case l: Long => n.put(field, l)
    case f: Float => n.put(field, f)
    case d: Double => n.put(field, d)
    case bd: java.math.BigDecimal => n.put(field, bd.toPlainString)
    case s: String => n.put(field, s)
    case b: Array[Byte] => n.put(field, Base64.getEncoder.encodeToString(b))
    case other => throw new IllegalArgumentException(
      s"Cannot serialize $other (${other.getClass.getSimpleName}) as $t")
  }

  def valueFromJson(t: IceType, node: JsonNode): Any =
    if (node == null || node.isNull) null
    else t match {
      case IBoolean => node.asBoolean()
      case IInt | IDate => node.asInt()
      case ILong | ITime | ITimestamp | ITimestamptz => node.asLong()
      case IFloat => node.floatValue()
      case IDouble => node.doubleValue()
      case IDecimal(_, s) => new java.math.BigDecimal(node.asText())
        .setScale(s, java.math.RoundingMode.UNNECESSARY)
      case IString | IUUID => node.asText()
      case IBinary | IFixed(_) => Base64.getDecoder.decode(node.asText())
      case other => throw new IllegalArgumentException(s"Cannot read $other value")
    }

  // ---- expressions (unbound, wire format) -------------------------------

  /** Filter/residual literal values are untyped on the wire (the binder
    * coerces them against the schema on arrival, like user literals);
    * byte-array literals ride a `{"b64": …}` marker. */
  private def litToJson(v: Any): JsonNode = v match {
    case null => mapper.nullNode()
    case b: Boolean => mapper.getNodeFactory.booleanNode(b)
    case i: Int => mapper.getNodeFactory.numberNode(i.toLong)
    case l: Long => mapper.getNodeFactory.numberNode(l)
    case f: Float => mapper.getNodeFactory.numberNode(f.toDouble)
    case d: Double => mapper.getNodeFactory.numberNode(d)
    case bd: java.math.BigDecimal => mapper.getNodeFactory.numberNode(bd)
    case s: String => mapper.getNodeFactory.textNode(s)
    case b: Array[Byte] =>
      val n = mapper.createObjectNode()
      n.put("b64", Base64.getEncoder.encodeToString(b)); n
    case other => throw new IllegalArgumentException(s"Cannot serialize literal $other")
  }

  private def litFromJson(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isBoolean) n.asBoolean()
    else if (n.isBigDecimal || n.isFloatingPointNumber) {
      val d = n.decimalValue()
      // integral decimals fold to Long when exact (precision-safe; the
      // binder re-coerces against the column type either way)
      if (d.scale() > 0) d
      else try d.longValueExact(): java.lang.Long
      catch { case _: ArithmeticException => d }
    }
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isObject && n.has("b64")) Base64.getDecoder.decode(n.get("b64").asText())
    else n.asText()

  private def termToJson(ref: String, transform: Option[Transform]): JsonNode =
    transform match {
      case None => mapper.getNodeFactory.textNode(ref)
      case Some(t) =>
        val n = mapper.createObjectNode()
        n.put("type", "transform"); n.put("transform", t.name); n.put("term", ref)
        n
    }

  private def termFromJson(n: JsonNode): (String, Option[Transform]) =
    if (n.isTextual) (n.asText(), None)
    else (n.get("term").asText(), Some(Transform.parse(n.get("transform").asText())))

  def exprToJson(e: Expr): JsonNode = e match {
    case AlwaysTrue => mapper.getNodeFactory.booleanNode(true)
    case AlwaysFalse => mapper.getNodeFactory.booleanNode(false)
    case And(l, r) =>
      val n = mapper.createObjectNode()
      n.put("type", "and")
      n.set[JsonNode]("left", exprToJson(l)); n.set[JsonNode]("right", exprToJson(r)); n
    case Or(l, r) =>
      val n = mapper.createObjectNode()
      n.put("type", "or")
      n.set[JsonNode]("left", exprToJson(l)); n.set[JsonNode]("right", exprToJson(r)); n
    case Not(c) =>
      val n = mapper.createObjectNode()
      n.put("type", "not"); n.set[JsonNode]("child", exprToJson(c)); n
    case p: Predicate =>
      val n = mapper.createObjectNode()
      val tpe = p match {
        case _: IsNull => "is-null"
        case _: NotNull => "not-null"
        case _: IsNaN => "is-nan"
        case _: NotNaN => "not-nan"
        case _: Eq => "eq"
        case _: NotEq => "not-eq"
        case _: Lt => "lt"
        case _: LtEq => "lt-eq"
        case _: Gt => "gt"
        case _: GtEq => "gt-eq"
        case _: In => "in"
        case _: NotIn => "not-in"
        case _: StartsWith => "starts-with"
        case _: NotStartsWith => "not-starts-with"
      }
      n.put("type", tpe)
      n.set[JsonNode]("term", termToJson(p.ref, p.transform))
      p match {
        case Eq(_, v, _) => n.set[JsonNode]("value", litToJson(v))
        case NotEq(_, v, _) => n.set[JsonNode]("value", litToJson(v))
        case Lt(_, v, _) => n.set[JsonNode]("value", litToJson(v))
        case LtEq(_, v, _) => n.set[JsonNode]("value", litToJson(v))
        case Gt(_, v, _) => n.set[JsonNode]("value", litToJson(v))
        case GtEq(_, v, _) => n.set[JsonNode]("value", litToJson(v))
        case StartsWith(_, v, _) => n.set[JsonNode]("value", litToJson(v))
        case NotStartsWith(_, v, _) => n.set[JsonNode]("value", litToJson(v))
        case In(_, vs, _) =>
          val a = n.putArray("values"); vs.foreach(v => a.add(litToJson(v)))
        case NotIn(_, vs, _) =>
          val a = n.putArray("values"); vs.foreach(v => a.add(litToJson(v)))
        case _ => // unary predicates carry no value
      }
      n
  }

  def exprFromJson(n: JsonNode): Expr =
    if (n.isBoolean) { if (n.asBoolean()) AlwaysTrue else AlwaysFalse }
    else n.get("type").asText() match {
      case "and" => And(exprFromJson(n.get("left")), exprFromJson(n.get("right")))
      case "or" => Or(exprFromJson(n.get("left")), exprFromJson(n.get("right")))
      case "not" => Not(exprFromJson(n.get("child")))
      case tpe =>
        val (ref, tr) = termFromJson(n.get("term"))
        def v = litFromJson(n.get("value"))
        def vs = n.get("values").elements().asScala.toSeq.map(litFromJson)
        tpe match {
          case "is-null" => IsNull(ref, tr)
          case "not-null" => NotNull(ref, tr)
          case "is-nan" => IsNaN(ref, tr)
          case "not-nan" => NotNaN(ref, tr)
          case "eq" => Eq(ref, v, tr)
          case "not-eq" => NotEq(ref, v, tr)
          case "lt" => Lt(ref, v, tr)
          case "lt-eq" => LtEq(ref, v, tr)
          case "gt" => Gt(ref, v, tr)
          case "gt-eq" => GtEq(ref, v, tr)
          case "in" => In(ref, vs, tr)
          case "not-in" => NotIn(ref, vs, tr)
          case "starts-with" => StartsWith(ref, v.asInstanceOf[String], tr)
          case "not-starts-with" => NotStartsWith(ref, v.asInstanceOf[String], tr)
          case other => throw new IllegalArgumentException(s"Unknown expression: $other")
        }
    }

  /** Bound → unbound (for residual serialization: the wire carries
    * unbound expressions, ref RESTFileScanTask.residual_filter). */
  def unbind(b: BoundExpr): Expr = b match {
    case BTrue => AlwaysTrue
    case BFalse => AlwaysFalse
    case BAnd(l, r) => And(unbind(l), unbind(r))
    case BOr(l, r) => Or(unbind(l), unbind(r))
    case BNot(c) => Not(unbind(c))
    case BIsNull(_, name, t) => IsNull(name, t)
    case BNotNull(_, name, t) => NotNull(name, t)
    case BIsNaN(_, name, t) => IsNaN(name, t)
    case BNotNaN(_, name, t) => NotNaN(name, t)
    case BEq(_, name, v, t) => Eq(name, v, t)
    case BNotEq(_, name, v, t) => NotEq(name, v, t)
    case BLt(_, name, v, t) => Lt(name, v, t)
    case BLtEq(_, name, v, t) => LtEq(name, v, t)
    case BGt(_, name, v, t) => Gt(name, v, t)
    case BGtEq(_, name, v, t) => GtEq(name, v, t)
    case BIn(_, name, vs, t) => In(name, vs.toSeq, t)
    case BNotIn(_, name, vs, t) => NotIn(name, vs.toSeq, t)
    case BStartsWith(_, name, v, t) => StartsWith(name, v, t)
    case BNotStartsWith(_, name, v, t) => NotStartsWith(name, v, t)
  }

  // ---- content files ----------------------------------------------------

  private def contentName(c: Int): String = c match {
    case 0 => "data"
    case 1 => "position-deletes"
    case 2 => "equality-deletes"
  }
  private def contentCode(s: String): Int = s match {
    case "data" => 0
    case "position-deletes" => 1
    case "equality-deletes" => 2
  }

  /** keys/values parallel arrays (ref scan_planning.py:37 KeyValueMap). */
  private def countMap(n: ObjectNode, field: String, m: Map[Int, Long]): Unit =
    if (m.nonEmpty) {
      val o = n.putObject(field)
      val sorted = m.toSeq.sortBy(_._1)
      val ks = o.putArray("keys"); sorted.foreach { case (k, _) => ks.add(k) }
      val vs = o.putArray("values"); sorted.foreach { case (_, v) => vs.add(v) }
    }

  private def countMapFrom(n: JsonNode): Map[Int, Long] =
    if (n == null) Map.empty
    else {
      val ks = n.get("keys").elements().asScala.toSeq.map(_.asInt())
      val vs = n.get("values").elements().asScala.toSeq.map(_.asLong())
      ks.zip(vs).toMap
    }

  def dataFileToJson(df: DataFile, schema: Schema, spec: PartitionSpec): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("spec-id", df.specId)
    n.put("content", contentName(df.content))
    n.put("file-path", df.filePath)
    n.put("file-format", df.fileFormat.toUpperCase)
    n.put("file-size-in-bytes", df.fileSizeInBytes)
    n.put("record-count", df.recordCount)
    val partTypes = spec.partitionType(schema).map(_.fieldType)
    val pArr = n.putArray("partition")
    df.partition.zip(partTypes).foreach { case (v, t) =>
      val cell = mapper.createObjectNode()
      valueToJson(t, v, cell, "v")
      pArr.add(cell.get("v"))
    }
    if (df.splitOffsets.nonEmpty) {
      val a = n.putArray("split-offsets"); df.splitOffsets.foreach(a.add)
    }
    df.sortOrderId.foreach(n.put("sort-order-id", _))
    countMap(n, "column-sizes", df.columnSizes)
    countMap(n, "value-counts", df.valueCounts)
    countMap(n, "null-value-counts", df.nullValueCounts)
    countMap(n, "nan-value-counts", df.nanValueCounts)
    def boundsMap(field: String, m: Map[Int, Any]): Unit = {
      // only ids the schema can type: stats for dropped columns would
      // round-trip mistyped (the reader has no type for them either)
      val typed = m.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => schema.findType(k).map(t => (k, t, v)) }
      if (typed.nonEmpty) {
        val o = n.putObject(field)
        val ks = o.putArray("keys"); typed.foreach { case (k, _, _) => ks.add(k) }
        val vs = o.putArray("values")
        typed.foreach { case (_, t, v) =>
          val cell = mapper.createObjectNode()
          valueToJson(t, v, cell, "v")
          vs.add(cell.get("v"))
        }
      }
    }
    boundsMap("lower-bounds", df.lowerBounds)
    boundsMap("upper-bounds", df.upperBounds)
    if (df.equalityIds.nonEmpty) {
      val a = n.putArray("equality-ids"); df.equalityIds.foreach(a.add)
    }
    df.referencedDataFile.foreach(n.put("referenced-data-file", _))
    df.contentOffset.foreach(n.put("content-offset", _))
    df.contentSizeInBytes.foreach(n.put("content-size-in-bytes", _))
    n
  }

  def dataFileFromJson(n: JsonNode, schema: Schema,
      specById: Int => PartitionSpec): DataFile = {
    val specId = n.get("spec-id").asInt()
    val spec = specById(specId)
    val partTypes = spec.partitionType(schema).map(_.fieldType)
    val partition = Option(n.get("partition"))
      .map(_.elements().asScala.toSeq).getOrElse(Nil)
      .zip(partTypes).map { case (cell, t) => valueFromJson(t, cell) }
    def boundsFrom(field: String): Map[Int, Any] = {
      val o = n.get(field)
      if (o == null) Map.empty
      else {
        val ks = o.get("keys").elements().asScala.toSeq.map(_.asInt())
        val vs = o.get("values").elements().asScala.toSeq
        // bounds for field-ids outside the scan schema (e.g. stats kept
        // for a dropped column) have no type to decode with — skip them
        // rather than coerce to a wrongly-typed String value
        ks.zip(vs).flatMap { case (k, cell) =>
          schema.findType(k).map(t => k -> valueFromJson(t, cell))
        }.toMap
      }
    }
    DataFile(
      content = contentCode(n.get("content").asText()),
      filePath = n.get("file-path").asText(),
      fileFormat = n.get("file-format").asText(),
      partition = partition,
      recordCount = n.get("record-count").asLong(),
      fileSizeInBytes = n.get("file-size-in-bytes").asLong(),
      valueCounts = countMapFrom(n.get("value-counts")),
      nullValueCounts = countMapFrom(n.get("null-value-counts")),
      nanValueCounts = countMapFrom(n.get("nan-value-counts")),
      lowerBounds = boundsFrom("lower-bounds"),
      upperBounds = boundsFrom("upper-bounds"),
      columnSizes = countMapFrom(n.get("column-sizes")),
      splitOffsets = Option(n.get("split-offsets"))
        .map(_.elements().asScala.toSeq.map(_.asLong())).getOrElse(Nil),
      sortOrderId = Option(n.get("sort-order-id")).map(_.asInt()),
      specId = specId,
      equalityIds = Option(n.get("equality-ids"))
        .map(_.elements().asScala.toSeq.map(_.asInt())).getOrElse(Nil),
      referencedDataFile = Option(n.get("referenced-data-file")).map(_.asText()),
      contentOffset = Option(n.get("content-offset")).map(_.asLong()),
      contentSizeInBytes = Option(n.get("content-size-in-bytes")).map(_.asLong()))
  }

  // ---- scan tasks -------------------------------------------------------

  /** Serialize tasks with delete files DEDUPLICATED into one array and
    * referenced by index (ref ScanTasks delete_files +
    * delete_file_references) — a delete file applying to many data files
    * is shipped once regardless of fan-out. */
  def tasksToJson(tasks: Seq[FileScanTask], schema: Schema,
      specById: Int => PartitionSpec): ObjectNode = {
    val n = mapper.createObjectNode()
    val deleteIndex = scala.collection.mutable.LinkedHashMap[String, Int]()
    val deleteFiles = Seq.newBuilder[DataFile]
    tasks.foreach(_.deletes.foreach { d =>
      if (!deleteIndex.contains(d.filePath)) {
        deleteIndex(d.filePath) = deleteIndex.size
        deleteFiles += d
      }
    })
    val dArr = n.putArray("delete-files")
    deleteFiles.result().foreach(d =>
      dArr.add(dataFileToJson(d, schema, specById(d.specId))))
    val tArr = n.putArray("file-scan-tasks")
    tasks.foreach { t =>
      val tn = mapper.createObjectNode()
      tn.set[JsonNode]("data-file",
        dataFileToJson(t.file, schema, specById(t.file.specId)))
      if (t.deletes.nonEmpty) {
        val refs = tn.putArray("delete-file-references")
        t.deletes.foreach(d => refs.add(deleteIndex(d.filePath)))
      }
      if (t.residual != BTrue)
        tn.set[JsonNode]("residual-filter", exprToJson(unbind(t.residual)))
      tArr.add(tn)
    }
    n
  }

  def tasksFromJson(n: JsonNode, schema: Schema,
      specById: Int => PartitionSpec, caseSensitive: Boolean): Seq[FileScanTask] = {
    val deleteFiles = Option(n.get("delete-files"))
      .map(_.elements().asScala.toSeq).getOrElse(Nil)
      .map(d => dataFileFromJson(d, schema, specById))
      .toIndexedSeq
    Option(n.get("file-scan-tasks")).map(_.elements().asScala.toSeq).getOrElse(Nil)
      .map { tn =>
        val file = dataFileFromJson(tn.get("data-file"), schema, specById)
        val deletes = Option(tn.get("delete-file-references"))
          .map(_.elements().asScala.toSeq.map(i => deleteFiles(i.asInt()))).getOrElse(Nil)
        val residual = Option(tn.get("residual-filter"))
          .map(r => Binder.bind(schema, exprFromJson(r), caseSensitive))
          .getOrElse(BTrue)
        FileScanTask(file, deletes, residual)
      }
  }
}
