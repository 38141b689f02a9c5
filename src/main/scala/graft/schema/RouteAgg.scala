package graft.schema

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.StructType

/** Routing + schema inference in ONE pass over the input.
  *
  * The reference reads the content twice — once to validate, once to
  * infer (`HiveSchemaGenerator.scala:75,98`) — and SURVEY.md §4 calls that
  * out as the thing not to reproduce at 100 TB. This aggregator folds
  * both concerns into a single partial+final aggregation: each line is
  * parsed exactly once; valid JSON objects merge into the running schema,
  * everything else only bumps the invalid counter. Only O(schema)+2 longs
  * cross the wire per partition.
  */
final case class RouteStats(schemaJson: String, nValid: Long, nInvalid: Long) {
  def schema: Option[StructType] = SchemaInference.schemaFromJson(schemaJson)
}

final class RouteAgg(typed: Boolean)
    extends Aggregator[String, (JType, Long, Long), RouteStats] {

  override def zero: (JType, Long, Long) = (JNull, 0L, 0L)

  override def reduce(b: (JType, Long, Long), line: String): (JType, Long, Long) =
    JsonShape.of(line, typed) match {
      case Some(s: JStruct) => (JType.merge(b._1, s, typed), b._2 + 1, b._3)
      case _                => (b._1, b._2, b._3 + 1)
    }

  override def merge(a: (JType, Long, Long), b: (JType, Long, Long)): (JType, Long, Long) =
    (JType.merge(a._1, b._1, typed), a._2 + b._2, a._3 + b._3)

  override def finish(r: (JType, Long, Long)): RouteStats = {
    val json = JType.toDataType(r._1) match {
      case s: StructType if r._2 > 0 => s.json
      case _                         => SchemaInference.InvalidSchema
    }
    RouteStats(json, r._2, r._3)
  }

  override def bufferEncoder: Encoder[(JType, Long, Long)] =
    Encoders.tuple(JTypeCodec.encoder, Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[RouteStats] = Encoders.product[RouteStats]
}

object RouteAgg {
  /** `route_infer_agg(jsonCol)` → struct(schemaJson, nValid, nInvalid). */
  def route_infer_agg(col: Column, typed: Boolean = false): Column =
    org.apache.spark.sql.functions.udaf(new RouteAgg(typed)).apply(col)
}
