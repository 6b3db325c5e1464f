package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** One entry of a nested name mapping (ref: table/name_mapping.py:73
  * MappedField — `field-id`, `names`, recursive `fields`). A mapping
  * records the column names files carried AS OF REGISTRATION so id-less
  * external parquet resolves by name even after renames — including
  * renames of struct LEAVES, which a flat top-level map cannot express. */
final case class MappedField(
    fieldId: Option[Int],
    names: Seq[String],
    fields: Seq[MappedField] = Nil)

object NameMapping {

  private val mapper = new ObjectMapper()

  /** Mapping derived from the current schema: every field keeps its
    * current name; list/map children use the spec's standard names
    * (ref: name_mapping.py:285 create_mapping_from_schema). */
  def fromSchema(schema: Schema): Seq[MappedField] = schema.fields.map(fromField)

  private def fromField(f: NestedField): MappedField =
    MappedField(Some(f.id), Seq(f.name), childrenOf(f.fieldType))

  private def childrenOf(t: IceType): Seq[MappedField] = t match {
    case IStruct(fs) => fs.map(fromField)
    case IList(eid, el, _) =>
      Seq(MappedField(Some(eid), Seq("element"), childrenOf(el)))
    case IMap(kid, k, vid, v, _) =>
      Seq(MappedField(Some(kid), Seq("key"), childrenOf(k)),
        MappedField(Some(vid), Seq("value"), childrenOf(v)))
    case _ => Nil
  }

  /** Spec JSON: `[{"field-id": 1, "names": ["n"], "fields": [...]}]`. */
  def toJson(mapping: Seq[MappedField]): String =
    mapper.writeValueAsString(toNode(mapping))

  private def toNode(mapping: Seq[MappedField]): JsonNode = {
    val arr = mapper.createArrayNode()
    mapping.foreach { mf =>
      val n = mapper.createObjectNode()
      mf.fieldId.foreach(n.put("field-id", _))
      val names = n.putArray("names")
      mf.names.foreach(names.add)
      if (mf.fields.nonEmpty) n.set[JsonNode]("fields", toNode(mf.fields))
      arr.add(n)
    }
    arr
  }

  /** Parse spec-format JSON; a LEGACY flat `{"name": id}` object (our
    * pre-nested layout) still parses so existing tables keep resolving. */
  def fromJson(json: String): Seq[MappedField] = {
    val node = mapper.readTree(json)
    if (node.isArray) fromNode(node)
    else node.properties().asScala.toSeq
      .map(e => MappedField(Some(e.getValue.asInt()), Seq(e.getKey)))
  }

  private def fromNode(node: JsonNode): Seq[MappedField] =
    node.elements().asScala.toSeq.map { n =>
      MappedField(
        Option(n.get("field-id")).map(_.asInt()),
        Option(n.get("names")).map(_.elements().asScala.map(_.asText()).toSeq)
          .getOrElse(Nil),
        Option(n.get("fields")).map(fromNode).getOrElse(Nil))
    }

  /** First recorded name for `id` within one nesting scope. */
  def nameOf(scope: Seq[MappedField], id: Int): Option[String] =
    scope.find(_.fieldId.contains(id)).flatMap(_.names.headOption)

  /** Child scope for `id` (struct members, list/map children). */
  def childScope(scope: Seq[MappedField], id: Int): Seq[MappedField] =
    scope.find(_.fieldId.contains(id)).map(_.fields).getOrElse(Nil)

  /** Re-point top-level ids to new names, preserving children. */
  def updateTopLevel(mapping: Seq[MappedField], updates: Map[Int, String]): Seq[MappedField] = {
    val untouched = mapping.filterNot(_.fieldId.exists(updates.contains))
    val updated = updates.toSeq.map { case (id, name) =>
      mapping.find(_.fieldId.contains(id)) match {
        case Some(mf) => mf.copy(names = Seq(name))
        case None => MappedField(Some(id), Seq(name))
      }
    }
    untouched ++ updated
  }
}
