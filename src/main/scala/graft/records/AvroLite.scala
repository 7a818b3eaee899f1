package graft.records

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Minimal Avro binary codec + Avro→Spark type conversion, written from the
  * public Avro 1.11 specification — the I2/I4/I12 surface of the reference
  * (`iceberg/data/RecordConverter.java:94-200`,
  * `AvroSchemaRegistryStructureProvider.java:33-92`) without the Avro
  * runtime dependency.
  *
  * Supported types (the reference's full converter matrix,
  * `RecordConverter.java:105-166`): record, array, map(string keys), string,
  * bytes, fixed, int, long, float, double, boolean, null, union[null,T],
  * decimal (bytes/fixed logical), date, time-millis, timestamp-millis,
  * timestamp-micros, uuid (string logical).
  */
object AvroLite {

  sealed trait Schema
  case object ANull extends Schema
  case object ABoolean extends Schema
  case object AInt extends Schema
  case object ALong extends Schema
  case object AFloat extends Schema
  case object ADouble extends Schema
  case object ABytes extends Schema
  case object AString extends Schema
  final case class AFixed(name: String, size: Int) extends Schema
  final case class ADecimal(precision: Int, scale: Int, fixedSize: Option[Int]) extends Schema
  case object ADate extends Schema
  case object ATimeMillis extends Schema
  case object ATimestampMillis extends Schema
  case object ATimestampMicros extends Schema
  case object AUuid extends Schema
  final case class AArray(items: Schema) extends Schema
  final case class AMap(values: Schema) extends Schema
  final case class AUnionNullable(inner: Schema) extends Schema
  final case class AField(name: String, schema: Schema)
  final case class ARecord(name: String, fields: Vector[AField]) extends Schema

  private val mapper = new ObjectMapper()

  def parseSchema(json: String): Schema = parseNode(mapper.readTree(json))

  private def parseNode(n: JsonNode): Schema = {
    if (n.isTextual) return primitive(n.asText())
    if (n.isArray) {
      val parts = (0 until n.size()).map(i => n.get(i))
      require(parts.size == 2 && parts.exists(p => p.isTextual && p.asText() == "null"),
        s"only [null, T] unions supported, got $n")
      val inner = parts.find(p => !(p.isTextual && p.asText() == "null")).get
      return AUnionNullable(parseNode(inner))
    }
    val t = n.get("type").asText()
    val logical = Option(n.get("logicalType")).map(_.asText())
    (t, logical) match {
      case ("bytes", Some("decimal")) =>
        ADecimal(n.get("precision").asInt(), Option(n.get("scale")).map(_.asInt()).getOrElse(0), None)
      case ("fixed", Some("decimal")) =>
        ADecimal(n.get("precision").asInt(), Option(n.get("scale")).map(_.asInt()).getOrElse(0),
          Some(n.get("size").asInt()))
      case ("int", Some("date"))                => ADate
      case ("int", Some("time-millis"))         => ATimeMillis
      case ("long", Some("timestamp-millis"))   => ATimestampMillis
      case ("long", Some("timestamp-micros"))   => ATimestampMicros
      case ("string", Some("uuid"))             => AUuid
      case ("fixed", _)                         => AFixed(n.get("name").asText(), n.get("size").asInt())
      case ("array", _)                         => AArray(parseNode(n.get("items")))
      case ("map", _)                           => AMap(parseNode(n.get("values")))
      case ("record", _) =>
        val fs = n.get("fields")
        ARecord(n.get("name").asText(),
          (0 until fs.size()).map { i =>
            AField(fs.get(i).get("name").asText(), parseNode(fs.get(i).get("type")))
          }.toVector)
      case (p, _) => primitive(p)
    }
  }

  private def primitive(t: String): Schema = t match {
    case "null" => ANull
    case "boolean" => ABoolean
    case "int" => AInt
    case "long" => ALong
    case "float" => AFloat
    case "double" => ADouble
    case "bytes" => ABytes
    case "string" => AString
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  /** Avro→Spark type mapping (I4 / SURVEY §1.3). */
  def toSparkType(s: Schema): DataType = s match {
    case ANull => NullType
    case ABoolean => BooleanType
    case AInt => IntegerType
    case ALong => LongType
    case AFloat => FloatType
    case ADouble => DoubleType
    case ABytes | AFixed(_, _) => BinaryType
    case AString | AUuid => StringType
    case ADecimal(p, sc, _) => DecimalType(p, sc)
    case ADate => DateType
    case ATimeMillis => IntegerType // millis-of-day (Spark has no TimeType)
    case ATimestampMillis | ATimestampMicros => TimestampType
    case AArray(items) => ArrayType(toSparkType(items))
    case AMap(values) => MapType(StringType, toSparkType(values))
    case AUnionNullable(inner) => toSparkType(inner)
    case ARecord(_, fields) =>
      StructType(fields.map(f => StructField(f.name, toSparkType(f.schema), nullable = isNullable(f.schema))))
  }

  private def isNullable(s: Schema): Boolean = s match {
    case AUnionNullable(_) | ANull => true
    case _ => false
  }

  // --- decode (I2) ----------------------------------------------------------

  /** Decode an Avro binary payload into Spark-compatible values (Row for
    * records, java.sql types for temporals). */
  def decode(schema: Schema, buf: ByteBuffer): Any = schema match {
    case ANull => null
    case ABoolean => buf.get() != 0
    case AInt => Varint.readVarint(buf)
    case ALong => Varint.readVarlong(buf)
    case AFloat =>
      buf.order(ByteOrder.LITTLE_ENDIAN); val v = buf.getFloat; buf.order(ByteOrder.BIG_ENDIAN); v
    case ADouble =>
      buf.order(ByteOrder.LITTLE_ENDIAN); val v = buf.getDouble; buf.order(ByteOrder.BIG_ENDIAN); v
    case ABytes => readBytes(buf)
    case AString => new String(readBytes(buf), "UTF-8")
    case AUuid => new String(readBytes(buf), "UTF-8")
    case AFixed(_, size) => { val b = new Array[Byte](size); buf.get(b); b }
    case ADecimal(p, s, fixedSize) =>
      val unscaled = fixedSize match {
        case Some(size) => { val b = new Array[Byte](size); buf.get(b); new java.math.BigInteger(b) }
        case None => new java.math.BigInteger(readBytes(buf))
      }
      new java.math.BigDecimal(unscaled, s)
    case ADate => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(Varint.readVarint(buf).toLong))
    case ATimeMillis => Varint.readVarint(buf)
    case ATimestampMillis => java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(Varint.readVarlong(buf)))
    case ATimestampMicros =>
      val us = Varint.readVarlong(buf)
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    case AArray(items) =>
      val out = Vector.newBuilder[Any]
      readBlocks(buf)(out += decode(items, buf))
      out.result()
    case AMap(values) =>
      val out = Map.newBuilder[String, Any]
      readBlocks(buf)(out += (new String(readBytes(buf), "UTF-8") -> decode(values, buf)))
      out.result()
    case AUnionNullable(inner) =>
      Varint.readVarlong(buf) match {
        case 0 => null
        case 1 => decode(inner, buf)
        case i => throw new IllegalArgumentException(s"union index $i out of range")
      }
    case ARecord(_, fields) => Row(fields.map(f => decode(f.schema, buf)): _*)
  }

  private def readBytes(buf: ByteBuffer): Array[Byte] = {
    val len = Varint.readVarint(buf)
    val b = new Array[Byte](len)
    buf.get(b)
    b
  }

  private def readBlocks(buf: ByteBuffer)(item: => Unit): Unit = {
    var count = Varint.readVarlong(buf)
    while (count != 0) {
      if (count < 0) { Varint.readVarlong(buf); count = -count } // block size, ignored
      var i = 0L
      while (i < count) { item; i += 1 }
      count = Varint.readVarlong(buf)
    }
  }

  // --- encode (I12) ---------------------------------------------------------

  def encode(schema: Schema, value: Any, out: ByteArrayOutputStream): Unit = schema match {
    case ANull => ()
    case ABoolean => out.write(if (value.asInstanceOf[Boolean]) 1 else 0)
    case AInt => Varint.writeVarint(value.asInstanceOf[Int], out)
    case ALong => Varint.writeVarlong(value.asInstanceOf[Long], out)
    case AFloat =>
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b.putFloat(value.asInstanceOf[Float]); out.write(b.array(), 0, 4)
    case ADouble =>
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.putDouble(value.asInstanceOf[Double]); out.write(b.array(), 0, 8)
    case ABytes => writeBytes(value.asInstanceOf[Array[Byte]], out)
    case AString | AUuid => writeBytes(value.asInstanceOf[String].getBytes("UTF-8"), out)
    case AFixed(_, size) =>
      val b = value.asInstanceOf[Array[Byte]]
      require(b.length == size, s"fixed size mismatch: ${b.length} != $size")
      out.write(b, 0, size)
    case ADecimal(_, s, fixedSize) =>
      val bd = value.asInstanceOf[java.math.BigDecimal].setScale(s)
      val unscaled = bd.unscaledValue().toByteArray
      fixedSize match {
        case Some(size) =>
          val padded = new Array[Byte](size)
          val sign: Byte = if (unscaled.head < 0) -1 else 0
          java.util.Arrays.fill(padded, sign)
          System.arraycopy(unscaled, 0, padded, size - unscaled.length, unscaled.length)
          out.write(padded, 0, size)
        case None => writeBytes(unscaled, out)
      }
    case ADate =>
      Varint.writeVarint(value.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt, out)
    case ATimeMillis => Varint.writeVarint(value.asInstanceOf[Int], out)
    case ATimestampMillis =>
      Varint.writeVarlong(value.asInstanceOf[java.sql.Timestamp].toInstant.toEpochMilli, out)
    case ATimestampMicros =>
      val i = value.asInstanceOf[java.sql.Timestamp].toInstant
      Varint.writeVarlong(i.getEpochSecond * 1000000L + i.getNano / 1000L, out)
    case AArray(items) =>
      val xs = value.asInstanceOf[Seq[Any]]
      if (xs.nonEmpty) {
        Varint.writeVarlong(xs.size.toLong, out)
        xs.foreach(x => encode(items, x, out))
      }
      Varint.writeVarlong(0L, out)
    case AMap(values) =>
      val m = value.asInstanceOf[scala.collection.Map[String, Any]]
      if (m.nonEmpty) {
        Varint.writeVarlong(m.size.toLong, out)
        m.foreach { case (k, v) => writeBytes(k.getBytes("UTF-8"), out); encode(values, v, out) }
      }
      Varint.writeVarlong(0L, out)
    case AUnionNullable(inner) =>
      if (value == null) Varint.writeVarlong(0L, out)
      else { Varint.writeVarlong(1L, out); encode(inner, value, out) }
    case ARecord(_, fields) =>
      val row = value.asInstanceOf[Row]
      fields.zipWithIndex.foreach { case (f, i) => encode(f.schema, row.get(i), out) }
  }

  private def writeBytes(b: Array[Byte], out: ByteArrayOutputStream): Unit = {
    Varint.writeVarint(b.length, out)
    out.write(b, 0, b.length)
  }
}
