package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog plugin: a NAMESPACE of tiered segment stores, so multi-store
  * deployments query by name instead of path —
  * {{{
  *   spark.sql.catalog.tiered            = graft.sources.v2.GraftSegmentsCatalog
  *   spark.sql.catalog.tiered.root       = /var/tiered        // parent dir
  *   spark.sql.catalog.tiered.rsaPublicKeyB64  = …
  *   spark.sql.catalog.tiered.rsaPrivateKeyB64 = …
  *   SELECT … FROM tiered.default.`store-a`                   // = root/store-a
  * }}}
  * Each child directory of `root` is one segment store = one table (the
  * object-store analogue of a topic namespace). Identification only —
  * listing/loading touch key STRINGS; no segment byte moves until a scan
  * runs. Third tier of the V2 integration: function registry → table
  * provider → catalog. */
class GraftSegmentsCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _
  private var pub: String = ""
  private var priv: String = ""

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog $name requires spark.sql.catalog.$name.root")
    pub = Option(options.get("rsaPublicKeyB64")).getOrElse("")
    priv = Option(options.get("rsaPrivateKeyB64")).getOrElse("")
  }

  override def name(): String = catalogName

  private def storeDirs(): Vector[String] = {
    val dir = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.isDirectory(dir)) Vector.empty
    else scala.util.Using.resource(java.nio.file.Files.list(dir)) { s =>
      s.iterator().asScala.filter(java.nio.file.Files.isDirectory(_))
        .map(_.getFileName.toString).filterNot(_.startsWith(".")).toVector.sorted
    }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireDefaultNs(namespace)
    storeDirs().map(Identifier.of(namespace, _)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    requireDefaultNs(ident.namespace())
    val store = java.nio.file.Paths.get(root, ident.name())
    if (!java.nio.file.Files.isDirectory(store))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name())
    new SegmentsTable(GraftSegments.SourceConf(store.toString, "", pub, priv))
  }

  /** Stores are created by the upload path (manifest-last per segment),
    * not by DDL — a catalog CREATE just materializes the directory. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform], properties: JMap[String, String]): Table = {
    requireDefaultNs(ident.namespace())
    val store = java.nio.file.Paths.get(root, ident.name())
    java.nio.file.Files.createDirectories(store)
    new SegmentsTable(GraftSegments.SourceConf(store.toString, "", pub, priv))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft-segments tables are not alterable")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "refusing to drop a segment store through the catalog; use RetentionJob")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("segment stores are not renameable")

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().sameElements(Array("default")) &&
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(root, ident.name()))

  // --- namespaces: the single flat "default" ------------------------------

  private def requireDefaultNs(ns: Array[String]): Unit =
    if (!ns.sameElements(Array("default")))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        Seq(catalogName) ++ ns.toSeq)

  override def listNamespaces(): Array[Array[String]] = Array(Array("default"))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else { requireDefaultNs(namespace); Array.empty }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    requireDefaultNs(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String], metadata: JMap[String, String]): Unit =
    throw new UnsupportedOperationException("single flat namespace")

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("single flat namespace")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("single flat namespace")
}
