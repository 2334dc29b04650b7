package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

/** BigQuery JSON table schema → Spark [[StructType]].
  *
  * The reference drives its whole warehouse off a BQ schema file
  * (reference bq_nvd/bq.py:24-82 recursively builds `SchemaField`s from
  * schema.json's 447 lines of nested RECORD/REPEATED fields). This is the
  * Spark-first re-expression: the same recursive walk, producing the Spark
  * type tree that `spark.read.schema(...).json` consumes directly, so the
  * semi-structured ingest is schema-driven rather than inference-driven —
  * at 100 TB you never want a second inference pass over the raw JSON.
  *
  * Semantics mirrored from BigQuery:
  *  - `mode` defaults to NULLABLE; REQUIRED → non-nullable; REPEATED wraps
  *    the field type in an array (a repeated RECORD is array<struct>);
  *  - `type` defaults to STRING; legacy and standard-SQL names both accepted
  *    (FLOAT/FLOAT64 → double, INTEGER/INT64 → long, BOOLEAN/BOOL, RECORD/
  *    STRUCT, NUMERIC → decimal(38,9) — BQ's fixed NUMERIC precision);
  *  - nested `fields` only apply to RECORD.
  */
object BqJsonSchema {

  def parseFile(path: String): StructType =
    parseString(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))

  def parseString(json: String): StructType = {
    val root = new ObjectMapper().readTree(json)
    require(root.isArray, s"BQ schema root must be a JSON array, got ${root.getNodeType}")
    StructType(root.elements().asScala.map(parseField).toSeq)
  }

  private def parseField(field: JsonNode): StructField = {
    val name = field.get("name").asText()
    val fieldType = Option(field.get("type")).map(_.asText().toUpperCase).getOrElse("STRING")
    val mode = Option(field.get("mode")).map(_.asText().toUpperCase).getOrElse("NULLABLE")

    val leaf: DataType = fieldType match {
      case "RECORD" | "STRUCT" =>
        val fields = Option(field.get("fields"))
          .map(_.elements().asScala.map(parseField).toSeq)
          .getOrElse(Seq.empty)
        StructType(fields)
      case "STRING"              => StringType
      case "TIMESTAMP"           => TimestampType
      case "FLOAT" | "FLOAT64"   => DoubleType
      case "BOOLEAN" | "BOOL"    => BooleanType
      case "INTEGER" | "INT64"   => LongType
      case "NUMERIC"             => DecimalType(38, 9)
      case "DATE"                => DateType
      case "BYTES"               => BinaryType
      case other =>
        throw new IllegalArgumentException(s"unsupported BQ field type: $other (field $name)")
    }

    mode match {
      // A missing repeated field deserializes as null rather than [];
      // elements themselves are non-null in BQ's model but JSON feeds can
      // carry explicit nulls, so keep containsNull lenient.
      case "REPEATED" => StructField(name, ArrayType(leaf, containsNull = true), nullable = true)
      case "REQUIRED" => StructField(name, leaf, nullable = false)
      case "NULLABLE" => StructField(name, leaf, nullable = true)
      case other =>
        throw new IllegalArgumentException(s"unsupported BQ field mode: $other (field $name)")
    }
  }
}
