package graft.sources

/** Scheme→backend routing: every job and source resolves its
  * [[StorageBackend]] from the ROOT STRING, so `s3://…`, `gs://…` or
  * `azure://…` roots ride the protocol stacks of [[S3Storage]] /
  * [[GcsStorage]] / [[AzureBlobStorage]] the moment a transport factory is
  * registered — the engine-side mirror of the reference's
  * `storage.backend.class` config indirection
  * (`core/.../config/RemoteStorageManagerConfig.java`: a class name in
  * config, instantiated reflectively, owns the bytes).
  *
  * Unschemed and `file:` roots resolve to [[FileSystemStorage]] with no
  * registration. Cloud schemes need a factory first, because the wire
  * transport is deployment-specific: a real deployment registers an SDK
  * binding at startup (`StorageBackends.registerProvider` with the class
  * name from its config — executors run the same registration via the
  * source's option, see [[graft.sources.v2.GraftSegments]]); the offline
  * test matrix registers the enforcing in-memory fakes. Registration is
  * JVM-global and thread-safe.
  */
object StorageBackends {

  /** What a `storage.backend.class`-style config names: a no-arg class
    * that binds one URI scheme to a transport. `create` receives the FULL
    * root (scheme included) so the provider carves bucket/container/prefix
    * itself. */
  trait Provider {
    def scheme: String
    def create(root: String): StorageBackend
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, String => StorageBackend]()

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://.*$".r

  def schemeOf(root: String): Option[String] = root match {
    case SchemeRe(s) => Some(s.toLowerCase)
    case _ => None
  }

  def register(scheme: String, factory: String => StorageBackend): Unit =
    registry.put(scheme.toLowerCase, factory)

  def unregister(scheme: String): Unit = registry.remove(scheme.toLowerCase)

  /** Reflectively load + register a [[Provider]] by class name (idempotent;
    * returns the scheme it bound). This is the reference's config shape:
    * deployments put a class name in config, not code. */
  def registerProvider(className: String): String = {
    val cls =
      try Class.forName(className)
      catch {
        case _: ClassNotFoundException =>
          throw new graft.core.ConfigValidators.ConfigException(
            s"storage provider class '$className' not found on the classpath")
      }
    // commons Subclass-validator parity: name the contract BEFORE
    // instantiating, instead of a bare ClassCastException later
    graft.core.ConfigValidators.subclassOf("storage provider class", cls, classOf[Provider])
    val p = cls.getDeclaredConstructor().newInstance().asInstanceOf[Provider]
    register(p.scheme, p.create)
    p.scheme
  }

  /** Resolve the backend for a root. Never caches — backends are cheap
    * handles over a transport; factories may share heavy state behind the
    * closure (HTTP pools, or one in-memory fake across instances). */
  def forRoot(root: String): StorageBackend = schemeOf(root) match {
    case None => FileSystemStorage(root)
    case Some("file") => FileSystemStorage(root.stripPrefix("file://"))
    case Some(s) =>
      val f = registry.get(s)
      require(f != null,
        s"no storage backend registered for scheme '$s' (root '$root'); " +
          "register one via StorageBackends.register/registerProvider")
      f(root)
  }
}
