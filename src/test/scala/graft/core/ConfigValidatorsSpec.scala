package graft.core

import graft.records.RegistryConfig
import graft.sources.{StorageBackend, StorageBackends}
import org.scalatest.funsuite.AnyFunSuite

/** Commons-validator parity (r7, VERDICT r6 task 5): URL shape, non-empty
  * password, and subclass checks fail FAST with errors naming key, value,
  * and rule — at the config boundary, not as a cast/parse blowup later.
  * Mirrors `commons/.../config/validators/{ValidUrl,NonEmptyPassword,
  * Subclass}.java` + their tests. */
class ConfigValidatorsSpec extends AnyFunSuite {
  import ConfigValidators._

  // --- ValidUrl -----------------------------------------------------------

  test("validUrl: http/https with host pass; other schemes and garbage fail") {
    validUrl("k", "http://host:8081")
    validUrl("k", "https://host/path?q=1")
    for (bad <- Seq("ftp://host", "host:8081", "http://", "ht tp://x", "//nohost", "http:relative"))
      assert(intercept[ConfigException](validUrl("k", bad))
        .getMessage.contains("k"), s"'$bad' must fail naming the key")
    val e = intercept[ConfigException](validUrl("reg.url", "ftp://host"))
    assert(e.getMessage.contains("http") && e.getMessage.contains("ftp://host"))
  }

  // --- NonEmptyPassword ---------------------------------------------------

  test("nonEmptyPassword: blank and empty rejected with the key name") {
    nonEmptyPassword("p", "s3cret")
    for (bad <- Seq("", "   ", null))
      assert(intercept[ConfigException](nonEmptyPassword("ssl.password", bad))
        .getMessage.contains("ssl.password value must not be empty"))
  }

  // --- Subclass -----------------------------------------------------------

  test("subclassOf: conforming passes, non-conforming names both classes") {
    subclassOf("cls", classOf[ValidTestProvider], classOf[StorageBackends.Provider])
    val e = intercept[ConfigException](
      subclassOf("cls", classOf[String], classOf[StorageBackends.Provider]))
    assert(e.getMessage.contains("java.lang.String") &&
      e.getMessage.contains("should be a subclass of") &&
      e.getMessage.contains("Provider"))
  }

  // --- integration: RegistryConfig ----------------------------------------

  test("RegistryConfig: malformed or non-http registry URL fails fast") {
    def parse(url: String) = RegistryConfig.parse(Map("schema.registry.url" -> url))
    parse("http://sr:8081") // sane baseline still parses
    for (bad <- Seq("ftp://sr:8081", "sr:8081", "http://sr:8081,not a url"))
      assert(intercept[IllegalArgumentException](parse(bad))
        .getMessage.contains("schema.registry.url"), s"'$bad' must name the key")
  }

  test("RegistryConfig: present-but-empty credentials/passwords fail fast") {
    def base = Map("schema.registry.url" -> "http://sr:8081")
    for ((k, extra) <- Seq(
      "basic.auth.user.info" ->
        Map("basic.auth.credentials.source" -> "USER_INFO", "basic.auth.user.info" -> " "),
      "bearer.auth.token" ->
        Map("bearer.auth.credentials.source" -> "STATIC_TOKEN", "bearer.auth.token" -> ""),
      "schema.registry.ssl.truststore.password" ->
        Map("schema.registry.ssl.truststore.password" -> "  ")))
      assert(intercept[IllegalArgumentException](RegistryConfig.parse(base ++ extra))
        .getMessage.contains(k), s"empty '$k' must fail naming the key")
  }

  // --- integration: StorageBackends.registerProvider -----------------------

  test("registerProvider: unknown class and non-Provider class fail descriptively") {
    val missing = intercept[ConfigException](
      StorageBackends.registerProvider("graft.core.NoSuchProviderClass"))
    assert(missing.getMessage.contains("graft.core.NoSuchProviderClass") &&
      missing.getMessage.contains("not found"))
    val wrong = intercept[ConfigException](
      StorageBackends.registerProvider("java.lang.StringBuilder"))
    assert(wrong.getMessage.contains("StringBuilder") &&
      wrong.getMessage.contains("should be a subclass of"))
    // conforming provider still registers and routes
    val scheme = StorageBackends.registerProvider(classOf[ValidTestProvider].getName)
    try {
      assert(scheme == "cfgtest")
      assert(StorageBackends.forRoot("cfgtest://bucket/p") != null)
    } finally StorageBackends.unregister("cfgtest")
  }
}

/** No-arg Provider used by the registerProvider round-trip above. */
final class ValidTestProvider extends StorageBackends.Provider {
  override def scheme: String = "cfgtest"
  override def create(root: String): StorageBackend =
    graft.sources.FileSystemStorage(
      java.nio.file.Files.createTempDirectory("cfgtest").toString)
}
