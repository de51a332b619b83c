package graft.sources

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * BigQuery JSON table schema ⇔ Spark StructType.
 *
 * The reference encodes schemas as recursive `{name, type, mode, fields}`
 * docs (`/root/reference/backend/jobs/workers/bigquery/bq_utils.py:10-40`):
 * RECORD → struct, mode REPEATED → array, nullable unless mode REQUIRED.
 */
object BqSchema {

  private def sparkType(bqType: String, fields: List[JValue]): DataType =
    bqType.toUpperCase match {
      case "STRING" => StringType
      case "BYTES" => BinaryType
      case "INTEGER" | "INT64" => LongType
      case "FLOAT" | "FLOAT64" | "DOUBLE" => DoubleType
      case "NUMERIC" | "BIGNUMERIC" => DecimalType(38, 9)
      case "BOOLEAN" | "BOOL" => BooleanType
      case "DATE" => DateType
      case "DATETIME" => TimestampNTZType
      case "TIMESTAMP" => TimestampType
      case "TIME" => StringType
      case "JSON" => StringType
      case "RECORD" | "STRUCT" => StructType(fields.map(field))
      case other => throw new IllegalArgumentException(s"Unsupported BigQuery type: $other")
    }

  private def field(v: JValue): StructField = {
    val JString(name) = v \ "name"
    val JString(tpe) = v \ "type"
    val mode = (v \ "mode") match { case JString(m) => m.toUpperCase; case _ => "NULLABLE" }
    val children = (v \ "fields") match { case JArray(fs) => fs; case _ => Nil }
    val base = sparkType(tpe, children)
    // REPEATED stays permissive (containsNull/nullable = true): BQ's own
    // contract is stricter (REPEATED is never NULL) but an importer schema
    // must tolerate nulls in parsed CSV/JSON input — strictness here would
    // turn bad rows into task failures instead of the bad-record budget
    val dt = if (mode == "REPEATED") ArrayType(base, containsNull = true) else base
    StructField(name, dt, nullable = mode != "REQUIRED")
  }

  /** Parse a BigQuery JSON schema document (array of field objects, or an
    * object with a "fields" array) to a StructType. */
  def toStructType(json: String): StructType = {
    val root = JsonMethods.parse(json)
    val fields = root match {
      case JArray(fs) => fs
      case obj: JObject => (obj \ "fields") match {
        case JArray(fs) => fs
        case _ => throw new IllegalArgumentException("schema object missing 'fields'")
      }
      case _ => throw new IllegalArgumentException("schema must be an array or object")
    }
    StructType(fields.map(field))
  }

  /** Reverse mapping (for export / introspection parity). */
  def fromStructType(schema: StructType): String = {
    def bqField(f: StructField): JValue = {
      val (dt, repeated) = f.dataType match {
        case ArrayType(inner, _) => (inner, true)
        case other => (other, false)
      }
      val (tpe, children) = dt match {
        case StringType => ("STRING", Nil)
        case BinaryType => ("BYTES", Nil)
        case LongType | IntegerType | ShortType | ByteType => ("INTEGER", Nil)
        case DoubleType | FloatType => ("FLOAT", Nil)
        case _: DecimalType => ("NUMERIC", Nil)
        case BooleanType => ("BOOLEAN", Nil)
        case DateType => ("DATE", Nil)
        case TimestampNTZType => ("DATETIME", Nil)
        case TimestampType => ("TIMESTAMP", Nil)
        case s: StructType => ("RECORD", s.fields.map(bqField).toList)
        case other => throw new IllegalArgumentException(s"Unsupported Spark type: $other")
      }
      val mode = if (repeated) "REPEATED" else if (f.nullable) "NULLABLE" else "REQUIRED"
      JObject(List(
        "name" -> JString(f.name),
        "type" -> JString(tpe),
        "mode" -> JString(mode)) ++
        (if (children.nonEmpty) List("fields" -> JArray(children)) else Nil))
    }
    JsonMethods.compact(JsonMethods.render(JArray(schema.fields.map(bqField).toList)))
  }
}
