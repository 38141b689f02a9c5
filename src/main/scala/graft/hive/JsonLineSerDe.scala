package graft.hive

import java.util.Properties

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.hive.serde.serdeConstants
import org.apache.hadoop.hive.serde2.{AbstractSerDe, SerDeException, SerDeStats}
import org.apache.hadoop.hive.serde2.objectinspector.{
  ListObjectInspector, MapObjectInspector, ObjectInspector,
  PrimitiveObjectInspector, StructObjectInspector}
import org.apache.hadoop.hive.serde2.typeinfo.{
  ListTypeInfo, MapTypeInfo, PrimitiveTypeInfo, StructTypeInfo,
  TypeInfo, TypeInfoFactory, TypeInfoUtils}
import org.apache.hadoop.io.{Text, Writable}

/** A working Hive JSON SerDe for NDJSON external tables.
  *
  * The reference's generated DDL names
  * `org.apache.hive.hcatalog.data.JsonSerDe` (`CreateHQL.scala:98`) but
  * only ''renders'' the string — executing it requires the hcatalog jar
  * on every node, which this Spark distribution (and many) does not
  * ship. This class is a self-contained equivalent against the public
  * `hive-serde` API (`AbstractSerDe`), so the engine can register AND
  * scan/write the reference-shaped external JSON table through the real
  * Hive metastore + HiveTableScan path (exercised by `p09`):
  *
  *  - deserialize: one JSON document per line (Jackson), mapped onto the
  *    table's declared schema — string/bigint/int/double/float/boolean
  *    primitives, arrays, maps, nested structs; missing keys and JSON
  *    nulls read as NULL (the JsonSerDe contract);
  *  - serialize: the inverse walk over the row's ObjectInspector,
  *    emitting one compact JSON object per row (INSERT INTO works);
  *  - field lookup is exact-match first, then case-insensitive (Hive
  *    lower-cases identifiers; JSON keys are case-sensitive).
  *
  * Per-record Jackson parse cost matches the reference's own
  * line-at-a-time loop (`CreateHQL.scala:14-20`); at scale the serde
  * runs inside each task, so the path stays fully distributed.
  */
class JsonLineSerDe extends AbstractSerDe {

  private var typeInfo: StructTypeInfo = _
  private var inspector: ObjectInspector = _
  @transient private lazy val mapper = new ObjectMapper()

  override def initialize(conf: Configuration, tbl: Properties): Unit = {
    val cols = tbl.getProperty(serdeConstants.LIST_COLUMNS, "")
    val types = tbl.getProperty(serdeConstants.LIST_COLUMN_TYPES, "")
    val names = cols.split(",").filter(_.nonEmpty).toSeq.asJava
    val tis = TypeInfoUtils.getTypeInfosFromTypeString(types)
    typeInfo = TypeInfoFactory
      .getStructTypeInfo(names, tis).asInstanceOf[StructTypeInfo]
    validateSupported(typeInfo)
    inspector =
      TypeInfoUtils.getStandardJavaObjectInspectorFromTypeInfo(typeInfo)
  }

  /** Reject declared types outside the reference's inference lattice at
    * table-registration time — a decimal/date/timestamp/binary column
    * would otherwise surface downstream as a ClassCastException against
    * the standard Java ObjectInspector instead of a clear error. */
  private def validateSupported(ti: TypeInfo): Unit = ti match {
    case s: StructTypeInfo =>
      s.getAllStructFieldTypeInfos.asScala.foreach(validateSupported)
    case l: ListTypeInfo => validateSupported(l.getListElementTypeInfo)
    case m: MapTypeInfo =>
      validateSupported(m.getMapKeyTypeInfo)
      validateSupported(m.getMapValueTypeInfo)
    case p: PrimitiveTypeInfo =>
      import PrimitiveObjectInspector.PrimitiveCategory._
      p.getPrimitiveCategory match {
        case STRING | LONG | INT | DOUBLE | FLOAT | BOOLEAN => ()
        case cat => throw new SerDeException(
          s"JsonLineSerDe: unsupported primitive type $cat — the " +
            "supported set is string/bigint/int/double/float/boolean " +
            "(the inference lattice, SURVEY §1.2)")
      }
    case other => throw new SerDeException(
      s"JsonLineSerDe: unsupported type ${other.getTypeName}")
  }

  override def getObjectInspector: ObjectInspector = inspector

  override def getSerializedClass: Class[_ <: Writable] = classOf[Text]

  override def getSerDeStats: SerDeStats = new SerDeStats

  // ---- read path -----------------------------------------------------

  override def deserialize(blob: Writable): AnyRef = {
    val line = blob.asInstanceOf[Text].toString
    if (line.trim.isEmpty) null
    else convert(mapper.readTree(line), typeInfo)
  }

  private def field(node: JsonNode, name: String): JsonNode = {
    val exact = node.get(name)
    if (exact != null) exact
    else {
      val it = node.fieldNames()
      var found: JsonNode = null
      while (found == null && it.hasNext) {
        val k = it.next()
        if (k.equalsIgnoreCase(name)) found = node.get(k)
      }
      found
    }
  }

  private def convert(node: JsonNode, ti: TypeInfo): AnyRef = {
    if (node == null || node.isNull) return null
    ti match {
      case s: StructTypeInfo =>
        val names = s.getAllStructFieldNames
        val tis = s.getAllStructFieldTypeInfos
        val out = new java.util.ArrayList[AnyRef](names.size)
        var i = 0
        while (i < names.size) {
          out.add(convert(field(node, names.get(i)), tis.get(i)))
          i += 1
        }
        out
      case l: ListTypeInfo =>
        if (!node.isArray) null
        else {
          val out = new java.util.ArrayList[AnyRef](node.size)
          node.elements().asScala
            .foreach(e => out.add(convert(e, l.getListElementTypeInfo)))
          out
        }
      case m: MapTypeInfo =>
        if (!node.isObject) null
        else {
          val out = new java.util.LinkedHashMap[AnyRef, AnyRef]()
          node.fields().asScala.foreach { e =>
            out.put(e.getKey, convert(e.getValue, m.getMapValueTypeInfo))
          }
          out
        }
      case p: PrimitiveTypeInfo =>
        import PrimitiveObjectInspector.PrimitiveCategory._
        p.getPrimitiveCategory match {
          case STRING =>
            if (node.isValueNode) node.asText() else node.toString
          case LONG => if (node.isNumber || node.isTextual)
            java.lang.Long.valueOf(node.asLong()) else null
          case INT => if (node.isNumber || node.isTextual)
            java.lang.Integer.valueOf(node.asInt()) else null
          case DOUBLE => if (node.isNumber || node.isTextual)
            java.lang.Double.valueOf(node.asDouble()) else null
          case FLOAT => if (node.isNumber || node.isTextual)
            java.lang.Float.valueOf(node.asDouble().toFloat) else null
          case BOOLEAN =>
            if (node.isBoolean || node.isTextual)
              java.lang.Boolean.valueOf(node.asBoolean()) else null
          case cat =>
            // initialize() rejects these declared types up front; a
            // category reaching here means the guard was bypassed —
            // fail loudly rather than hand a String to a non-string
            // ObjectInspector.
            throw new SerDeException(
              s"JsonLineSerDe: unsupported primitive type $cat")
        }
      case _ => null
    }
  }

  // ---- write path ----------------------------------------------------

  override def serialize(obj: AnyRef, oi: ObjectInspector): Writable = {
    val node = toJson(obj, oi)
    new Text(mapper.writeValueAsString(node))
  }

  private def toJson(obj: AnyRef, oi: ObjectInspector): JsonNode = {
    if (obj == null) return mapper.nullNode()
    oi match {
      case s: StructObjectInspector =>
        val out: ObjectNode = mapper.createObjectNode()
        s.getAllStructFieldRefs.asScala.foreach { f =>
          out.set[JsonNode](f.getFieldName,
            toJson(s.getStructFieldData(obj, f), f.getFieldObjectInspector))
        }
        out
      case l: ListObjectInspector =>
        val out = mapper.createArrayNode()
        (0 until l.getListLength(obj)).foreach { i =>
          out.add(toJson(l.getListElement(obj, i),
            l.getListElementObjectInspector))
        }
        out
      case m: MapObjectInspector =>
        val out = mapper.createObjectNode()
        m.getMap(obj).asScala.foreach { case (k, v) =>
          out.set[JsonNode](String.valueOf(k),
            toJson(v.asInstanceOf[AnyRef], m.getMapValueObjectInspector))
        }
        out
      case p: PrimitiveObjectInspector =>
        p.getPrimitiveJavaObject(obj) match {
          case null => mapper.nullNode()
          case v: java.lang.Long => mapper.getNodeFactory.numberNode(v.longValue())
          case v: java.lang.Integer => mapper.getNodeFactory.numberNode(v.intValue())
          case v: java.lang.Double => mapper.getNodeFactory.numberNode(v.doubleValue())
          case v: java.lang.Float => mapper.getNodeFactory.numberNode(v.floatValue())
          case v: java.lang.Boolean => mapper.getNodeFactory.booleanNode(v.booleanValue())
          case v => mapper.getNodeFactory.textNode(String.valueOf(v))
        }
      case _ => mapper.nullNode()
    }
  }
}
