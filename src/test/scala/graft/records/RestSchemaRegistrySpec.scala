package graft.records

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r2 missing item 5 — the registry REST protocol surface:
  * fetch-by-id path shape, forever-positive / never-negative caching,
  * basic-auth pass-through, and envelope interchangeability with the
  * local directory registry. */
class RestSchemaRegistrySpec extends AnyFunSuite {

  private val schemaJson =
    """{"type":"record","name":"Ev","fields":[
      |{"name":"id","type":"long"},{"name":"tag","type":"string"}]}""".stripMargin

  /** In-memory REST fake speaking `GET /schemas/ids/{id}` with the
    * Confluent response shape; records every request. */
  private final class FakeRest(known: Map[Int, String]) extends RegistryTransport {
    var requests: List[(String, Map[String, String])] = Nil
    var registered: Map[Int, String] = known
    override def get(path: String, headers: Map[String, String]): String = synchronized {
      requests ::= (path, headers)
      val m = "^/schemas/ids/(\\d+)$".r.findFirstMatchIn(path)
        .getOrElse(throw new RegistryHttpError(404, s"bad path $path"))
      val id = m.group(1).toInt
      registered.get(id) match {
        case Some(s) =>
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          val n = mapper.createObjectNode()
          n.put("schema", s)
          mapper.writeValueAsString(n)
        case None => throw new RegistryHttpError(404, s"Schema $id not found")
      }
    }
  }

  test("fetch-by-id hits GET /schemas/ids/{id}; schemas cache forever") {
    val rest = new FakeRest(Map(7 -> schemaJson))
    val reg = new RestSchemaRegistry(rest)
    assert(reg.lookup(7).isDefined)
    assert(reg.lookup(7).isDefined)
    assert(reg.lookup(7).isDefined)
    assert(rest.requests.size == 1, "schema ids are immutable: one wire call, then cache")
    assert(rest.requests.head._1 == "/schemas/ids/7")
    assert(reg.cachedSchemas == 1)
  }

  test("unknown id returns None and is NOT negative-cached (late registration works)") {
    val rest = new FakeRest(Map.empty)
    val reg = new RestSchemaRegistry(rest)
    assert(reg.lookup(9).isEmpty)
    assert(reg.lookup(9).isEmpty)
    assert(rest.requests.size == 2, "404s must re-ask the wire")
    rest.registered = Map(9 -> schemaJson) // registered later
    assert(reg.lookup(9).isDefined)
  }

  test("basic-auth userInfo becomes an Authorization header on every request") {
    val rest = new FakeRest(Map(1 -> schemaJson))
    val reg = new RestSchemaRegistry(rest, userInfo = Some("alice:s3cret"))
    reg.lookup(1)
    val auth = rest.requests.head._2("Authorization")
    assert(auth == "Basic " + java.util.Base64.getEncoder.encodeToString("alice:s3cret".getBytes))
  }

  test("wire envelope decode/encode is identical to the local directory registry") {
    val dir = java.nio.file.Files.createTempDirectory("graft-reg").toString
    val local = new SchemaRegistry(dir)
    local.register(5, schemaJson)
    val remote = new RestSchemaRegistry(new FakeRest(Map(5 -> schemaJson)))
    val payload = local.encode(5, org.apache.spark.sql.Row(42L, "x"))
    val viaLocal = local.decode(payload)
    val viaRemote = remote.decode(payload)
    assert(viaLocal.isDefined && viaRemote.isDefined)
    assert(viaLocal.get._1 == 5 && viaRemote.get._1 == 5)
    assert(viaLocal.get._2 == viaRemote.get._2)
    // and remote re-encode round-trips byte-identically
    assert(remote.encode(5, viaRemote.get._2).toSeq == payload.toSeq)
  }

  test("200 response without a schema field fails with the id, not an NPE") {
    val rest = new RegistryTransport {
      override def get(path: String, headers: Map[String, String]): String =
        """{"error_code":50001,"message":"backend store error"}"""
    }
    val reg = new RestSchemaRegistry(rest)
    val e = intercept[RegistryHttpError](reg.lookup(3))
    assert(e.statusCode == 502)
    assert(e.getMessage.contains("schema id 3"))
  }

  test("cache eviction at maxCachedSchemas keeps serving (clear + refill)") {
    val rest = new FakeRest((1 to 5).map(i => i -> schemaJson).toMap)
    val reg = new RestSchemaRegistry(rest, maxCachedSchemas = 2)
    (1 to 5).foreach(i => assert(reg.lookup(i).isDefined))
    assert(reg.cachedSchemas <= 2)
    assert(reg.lookup(1).isDefined) // refetch after eviction still works
  }
}
