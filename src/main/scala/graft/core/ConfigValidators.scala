package graft.core

/** Config-value validators mirroring the reference's `commons` set
  * (`commons/src/main/java/io/aiven/kafka/tieredstorage/config/validators/
  * ValidUrl.java`, `NonEmptyPassword.java`, `Subclass.java`): fail fast at
  * CONFIG time with an error naming the key, the value, and the rule —
  * not later with a bare parse/cast exception from deep inside a job.
  * Used by [[graft.records.RegistryConfig]] (registry URLs + credentials)
  * and [[graft.sources.StorageBackends]] (provider registration). */
object ConfigValidators {

  final class ConfigException(msg: String) extends IllegalArgumentException(msg)

  private def fail(name: String, value: Any, rule: String): Nothing =
    throw new ConfigException(s"Invalid value '$value' for configuration $name: $rule")

  /** The value must parse as a URL with an http/https scheme and a host
    * (the reference's ValidUrl contract; rfc2396 shape). Null-free by
    * construction here — callers validate only present values. */
  def validUrl(name: String, value: String): Unit = {
    val uri =
      try new java.net.URI(value)
      catch { case _: java.net.URISyntaxException => fail(name, value, "must be a valid URL") }
    val scheme = Option(uri.getScheme).map(_.toLowerCase).getOrElse(
      fail(name, value, "must be a valid URL"))
    if (scheme != "http" && scheme != "https")
      fail(name, value, "URL must have scheme from the list [http, https]")
    if (uri.getHost == null) fail(name, value, "must be a valid URL")
  }

  /** A present password/secret must not be empty or blank (the
    * reference's NonEmptyPassword; absent values are fine — validate
    * only what the user actually set). */
  def nonEmptyPassword(name: String, value: String): Unit =
    if (value == null || value.trim.isEmpty)
      throw new ConfigException(s"$name value must not be empty")

  /** A class named in config must implement/extend `parent` (the
    * reference's Subclass) — checked BEFORE instantiation so the error
    * names the contract, not a ClassCastException site. */
  def subclassOf(name: String, cls: Class[_], parent: Class[_]): Unit =
    if (!parent.isAssignableFrom(cls))
      throw new ConfigException(
        s"$name: ${cls.getName} should be a subclass of ${parent.getCanonicalName}")
}
