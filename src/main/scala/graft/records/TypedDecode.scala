package graft.records

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** I2 as a library operator: materialize typed columns from registry-framed
  * raw bytes. Rows whose payload has no/unknown envelope keep `null` in the
  * typed column — the raw column is never dropped
  * (`IcebergRemoteStorageManager.java:252-266` fallback semantics).
  */
object TypedDecode {

  /** Append `outCol` (struct typed by `schemaId`'s registry schema) decoded
    * from `rawCol`. Runs as a narrow map — registry schemas are parsed once
    * per executor (the registry caches per-JVM). */
  def withDecoded(df: DataFrame, registry: SchemaRegistry, schemaId: Int,
                  rawCol: String = "value_raw", outCol: String = "value"): DataFrame = {
    val schema = registry.lookup(schemaId)
      .getOrElse(throw new IllegalArgumentException(s"unknown schema id $schemaId"))
    val sparkType = AvroLite.toSparkType(schema)
    val outSchema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(outCol, sparkType, nullable = true))
    val rawIdx = df.schema.fieldIndex(rawCol)
    val reg = registry
    val rdd = df.rdd.map { r =>
      val raw = r.getAs[Array[Byte]](rawIdx)
      val decoded = reg.decode(raw) match {
        case Some((id, v)) if id == schemaId => v
        case _ => null
      }
      Row.fromSeq(r.toSeq :+ decoded)
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
