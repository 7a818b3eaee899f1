package graft.records

import java.nio.ByteBuffer
import java.nio.file.{Files, Path, Paths}

/** The Confluent-compatible wire envelope (ref
  * `IcebergRemoteStorageManager.java:438-442`):
  * `magic 0x00 ‖ schemaId int32 BE ‖ avro binary` — shared by every
  * registry implementation (local directory, REST protocol client);
  * only schema RESOLUTION differs. */
trait RegistryEnvelope {
  def lookup(id: Int): Option[AvroLite.Schema]

  /** Decode a registry-framed payload; None when the id is unknown or the
    * envelope is malformed → caller keeps raw bytes
    * (`IcebergRemoteStorageManager.java:252-266` fallback). */
  def decode(payload: Array[Byte]): Option[(Int, Any)] = {
    if (payload == null || payload.length < 5 || payload(0) != 0) return None
    val id = ByteBuffer.wrap(payload, 1, 4).getInt()
    lookup(id).map { schema =>
      (id, AvroLite.decode(schema, ByteBuffer.wrap(payload, 5, payload.length - 5)))
    }
  }

  /** Re-serialize to the wire envelope (I12). */
  def encode(id: Int, value: Any): Array[Byte] = {
    val schema = lookup(id).getOrElse(throw new IllegalArgumentException(s"unknown schema id $id"))
    val out = new java.io.ByteArrayOutputStream()
    out.write(0)
    out.write(ByteBuffer.allocate(4).putInt(id).array(), 0, 4)
    AvroLite.encode(schema, value, out)
    out.toByteArray
  }
}

/** Local schema registry: a directory of `<id>.avsc` files — the offline
  * stand-in for the reference's Schema Registry client
  * (`AvroSchemaRegistryStructureProvider.java:33-92`); the protocol-level
  * client is [[RestSchemaRegistry]].
  */
final class SchemaRegistry(dirStr: String) extends RegistryEnvelope with Serializable {
  @transient private lazy val dir: Path = Paths.get(dirStr)
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, Option[AvroLite.Schema]]()

  def register(id: Int, schemaJson: String): Unit = {
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(s"$id.avsc"), schemaJson)
  }

  override def lookup(id: Int): Option[AvroLite.Schema] =
    cache.computeIfAbsent(id, { _ =>
      val p = dir.resolve(s"$id.avsc")
      if (Files.exists(p)) Some(AvroLite.parseSchema(Files.readString(p))) else None
    })
}

object SchemaRegistry {
  def apply(dir: String): SchemaRegistry = new SchemaRegistry(dir)
}
