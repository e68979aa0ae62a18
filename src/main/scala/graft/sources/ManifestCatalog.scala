package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.{ManifestUpsertSink, TableStore}

/** A DSv2 `TableCatalog` over a directory of manifest-lake tables — the
  * last step from "a connector you call with paths" to "tables you speak
  * SQL to":
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[ManifestCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.root", "/data/lake")
  *
  *   CREATE TABLE graft.events (id BIGINT, p STRING, seq BIGINT)
  *     TBLPROPERTIES (keyCol 'id', orderCol 'seq', buckets '8')
  *   INSERT INTO graft.events VALUES ...        -- the LWW MERGE, not an append
  *   SELECT * FROM graft.events
  *   SELECT * FROM graft.events VERSION AS OF 3 -- manifest time travel
  *   DROP TABLE graft.events
  * }}}
  *
  * Each table lives at `<root>/<name>` in the standard sink layout; the
  * catalog's only state of its own is a `_catalog.properties` file per
  * table (keyCol/orderCol/buckets + the declared schema DDL) written by
  * CREATE TABLE, so INSERT INTO — which cannot carry per-statement
  * options — finds its LWW order column, and an empty created table has
  * a schema before its first commit. Tables created by the Scala API or
  * `df.write.save(path)` under the root are visible too (the committed
  * manifest is the source of truth for keyCol/buckets; the properties
  * file only fills what the manifest cannot know). loadTable delegates
  * to [[ManifestSource]], so SQL reads get the same manifest resolution,
  * file skipping, and bucket pruning as every other surface, and writes
  * run the same committed MERGE protocol — a catalog table can never
  * behave differently from a path table. */
class ManifestCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  /** Maintenance verbs behind SQL `CALL` (see [[ManifestProcedures]]):
    * compaction, clustering, z-order, vacuum, restore, partition expiry
    * — the operator surface, no Scala required. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    ManifestProcedures.load(name => tableDir(Identifier.of(Array.empty, name)),
      normalize(ident).name)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    ManifestProcedures.names.map(Identifier.of(namespace, _)).toArray

  /** The one catalog function: the lake's canonical `bucket` transform,
    * which lets Spark resolve the connector's reported
    * `KeyGroupedPartitioning(bucket(n, key...))` and plan
    * STORAGE-PARTITIONED JOINS between same-layout tables (zero
    * shuffle; gated behind `spark.sql.sources.v2.bucketing.enabled`). */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (normalize(ident).name == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  private var catalogName: String = _
  private var root: String = _
  private lazy val store: TableStore = TableStore.forPath(root)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"catalog $name requires spark.sql.catalog.$name.root=<lake dir>"))
  }

  override def name(): String = catalogName

  /** Some statements (ALTER TABLE ... RENAME TO c.t2) hand the catalog a
    * target still qualified with the catalog's own name — strip it. */
  private def normalize(ident: Identifier): Identifier =
    if (ident.namespace.headOption.contains(catalogName))
      Identifier.of(ident.namespace.drop(1), ident.name)
    else ident

  private def tableDir(ident0: Identifier): String = {
    val ident = normalize(ident0)
    (root +: ident.namespace.toSeq :+ ident.name).mkString("/")
  }

  override def tableExists(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    store.exists(s"$dir/_manifest") || store.exists(s"$dir/_catalog.properties")
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = (root +: namespace.toSeq).mkString("/")
    store.listNames(dir)
      .filter(n => tableExists(Identifier.of(namespace, n)))
      .sorted.map(Identifier.of(namespace, _)).toArray
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `SELECT ... VERSION AS OF <v>` — manifest time travel through SQL. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version))

  /** `SELECT ... TIMESTAMP AS OF <t>` — Spark hands MICROseconds since
    * the epoch; the manifest's commit stamps are millis. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    load(ident, Some(graft.sinks.ManifestUpsertSink
      .versionAtTimestamp(tableDir(ident), timestamp / 1000L).toString))
  }

  private def load(ident: Identifier, versionAsOf: Option[String]): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    val props = readProps(dir)
    val opts = new util.HashMap[String, String]()
    opts.put("path", dir)
    props.foreach { case (k, v) => opts.put(k, v) }
    versionAsOf.foreach(opts.put("versionAsOf", _))
    val src = new ManifestSource
    val cism = new CaseInsensitiveStringMap(opts)
    val schema = src.inferSchema(cism)
    src.getTable(schema, Array.empty[Transform], opts)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "graft-manifest tables bucket by their key column; PARTITIONED BY is not supported")
    def prop(k: String): Option[String] =
      Option(properties.get(k)).orElse(Option(properties.get(s"option.$k")))
    val keyCol = prop("keyCol").getOrElse(throw new IllegalArgumentException(
      "CREATE TABLE requires TBLPROPERTIES (keyCol '<col>', orderCol '<col>')"))
    val orderCol = prop("orderCol").getOrElse(throw new IllegalArgumentException(
      "CREATE TABLE requires TBLPROPERTIES (orderCol '<col>') — the LWW order"))
    // keyCol may be a comma-separated composite spec — validate each
    // component against the declared schema
    for (k <- keyCol.split(",").map(_.trim))
      require(k.nonEmpty && schema.fieldNames.contains(k),
        s"key column '$k' (of keyCol '$keyCol') not in schema")
    require(schema.fieldNames.contains(orderCol), s"orderCol $orderCol not in schema")
    // optional date-partition layout: TBLPROPERTIES ('partCol'='event_date')
    val partLine = prop("partCol").map { p =>
      require(schema.fieldNames.contains(p), s"partCol $p not in schema")
      s"partCol=$p"
    }
    val lines = Seq(
      s"keyCol=$keyCol", s"orderCol=$orderCol",
      s"buckets=${prop("buckets").getOrElse("16")}") ++ partLine ++ Seq(
      s"schemaDDL=${schema.toDDL}")
    store.putString(tableDir(ident), "_catalog.properties", lines.mkString("\n"))
    loadTable(ident)
  }

  private def readProps(dir: String): Map[String, String] = {
    val p = s"$dir/_catalog.properties"
    if (!store.exists(p)) Map.empty
    else store.readString(p).linesIterator.filter(_.contains('='))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
  }

  /** `ALTER TABLE t RENAME COLUMN a TO b` / `ADD COLUMN c <type>` /
    * `DROP COLUMN c` — the sink's METADATA-ONLY schema evolution (a
    * committed header over the same files; zero data I/O for all
    * three). SQL reads serve the live state IMMEDIATELY — the
    * connector's scan folds rename vintages per row, null-fills
    * metadata-only added columns, and never reads dropped ones — and
    * the next `CALL system.compact('t')` materializes it physically
    * (the vectorized-scan optimization, not a read prerequisite).
    * Catalog properties (keyCol / orderCol / partCol / schemaDDL) are
    * re-spelled in step, so INSERTs keep finding their LWW order
    * column. Other ALTER changes refuse: they are maintenance commits
    * (CALL procedures), not catalog edits. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    def committedSink(m: ManifestUpsertSink.Manifest): ManifestUpsertSink = {
      val keyCol = m.keyCol.getOrElse(throw new UnsupportedOperationException(
        s"table at $dir predates the keyCol header — alter via the Scala API"))
      new ManifestUpsertSink(dir, keyCol, m.buckets.getOrElse(16), m.partCol)
    }
    changes.foreach {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "RENAME COLUMN supports top-level columns only")
        val oldName = r.fieldNames.head
        for (m <- ManifestUpsertSink.latestManifest(dir))
          committedSink(m)
            .renameColumn(org.apache.spark.sql.SparkSession.active, oldName, r.newName)
        // a created-but-never-written table has only its declared schema
        renameInProps(dir, oldName, r.newName)
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "ADD COLUMN supports top-level columns only")
        val name = a.fieldNames.head
        val ddl = a.dataType().sql
        for (m <- ManifestUpsertSink.latestManifest(dir))
          committedSink(m).addColumn(org.apache.spark.sql.SparkSession.active, name, ddl)
        addInProps(dir, name, ddl)
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          "ALTER COLUMN TYPE supports top-level columns only")
        val name = u.fieldNames.head
        for (m <- ManifestUpsertSink.latestManifest(dir))
          committedSink(m).widenColumn(org.apache.spark.sql.SparkSession.active,
            name, u.newDataType().sql)
        widenInProps(dir, name, u.newDataType())
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "DROP COLUMN supports top-level columns only")
        val name = d.fieldNames.head
        // the LWW order column is part of the write contract, not just
        // the schema: every INSERT routes through it
        for (oc <- readProps(dir).get("orderCol"))
          require(oc != name,
            s"cannot drop $name: it is the table's LWW order column (orderCol)")
        for (m <- ManifestUpsertSink.latestManifest(dir))
          committedSink(m).dropColumn(org.apache.spark.sql.SparkSession.active, name)
        dropInProps(dir, name)
      case c => throw new UnsupportedOperationException(
        s"ALTER TABLE ${c.getClass.getSimpleName}: unsupported — " +
          "recluster/restore/compact via CALL procedures")
    }
    loadTable(ident)
  }

  /** Re-spell `old` → `nu` across the catalog-properties file: the
    * keyCol spec (component-wise), orderCol, partCol, and the declared
    * schema DDL. No-op when the file is absent (Scala-API tables). */
  private def renameInProps(dir: String, old: String, nu: String): Unit = {
    val props = readProps(dir)
    if (props.isEmpty) return
    val updated = props.map {
      case ("keyCol", v) =>
        "keyCol" -> v.split(",").map(c => if (c.trim == old) nu else c.trim).mkString(",")
      case (k @ ("orderCol" | "partCol"), v) => k -> (if (v == old) nu else v)
      case ("schemaDDL", v) =>
        "schemaDDL" -> StructType(StructType.fromDDL(v).fields.map(f =>
          if (f.name == old) f.copy(name = nu) else f)).toDDL
      case kv => kv
    }
    store.putString(dir, "_catalog.properties",
      updated.map { case (k, v) => s"$k=$v" }.mkString("\n"))
  }

  /** Append `name type` to the declared schema DDL (nullable — a
    * metadata-only add is null-backed by definition). No-op when the
    * props file is absent (Scala-API tables). */
  private def addInProps(dir: String, name: String, typeDdl: String): Unit = {
    val props = readProps(dir)
    if (props.isEmpty) return
    val updated = props.map {
      case ("schemaDDL", v) =>
        val st = StructType.fromDDL(v)
        require(!st.fieldNames.contains(name),
          s"cannot add: column $name already exists in the declared schema")
        "schemaDDL" -> StructType(st.fields :+
          org.apache.spark.sql.types.StructField(name,
            org.apache.spark.sql.types.DataType.fromDDL(typeDdl),
            nullable = true)).toDDL
      case kv => kv
    }
    store.putString(dir, "_catalog.properties",
      updated.map { case (k, v) => s"$k=$v" }.mkString("\n"))
  }

  /** Respell `name`'s type in the declared schema DDL (the sink verb
    * already validated the widening against the committed stamp; a
    * never-written table has nothing physical to promote, so any
    * respell is safe there). No-op when the props file is absent. */
  private def widenInProps(dir: String,
      name: String, to: org.apache.spark.sql.types.DataType): Unit = {
    val props = readProps(dir)
    if (props.isEmpty) return
    val updated = props.map {
      case ("schemaDDL", v) =>
        "schemaDDL" -> StructType(StructType.fromDDL(v).fields.map(f =>
          if (f.name == name) f.copy(dataType = to) else f)).toDDL
      case kv => kv
    }
    store.putString(dir, "_catalog.properties",
      updated.map { case (k, v) => s"$k=$v" }.mkString("\n"))
  }

  /** Remove `name` from the declared schema DDL; refuses key/partition
    * columns (committed layout). No-op when the props file is absent. */
  private def dropInProps(dir: String, name: String): Unit = {
    val props = readProps(dir)
    if (props.isEmpty) return
    for (k <- props.get("keyCol"))
      require(!k.split(",").map(_.trim).contains(name),
        s"cannot drop $name: it is a key column of the table")
    for (p <- props.get("partCol"))
      require(p != name, s"cannot drop $name: it is the table's partition column")
    val updated = props.map {
      case ("schemaDDL", v) =>
        "schemaDDL" -> StructType(
          StructType.fromDDL(v).fields.filterNot(_.name == name)).toDDL
      case kv => kv
    }
    store.putString(dir, "_catalog.properties",
      updated.map { case (k, v) => s"$k=$v" }.mkString("\n"))
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val dir = tableDir(ident)
    store.walkFiles(dir).foreach(store.deleteFile)
    // remove emptied directories deepest-first
    def sweep(d: String): Unit = {
      store.listNames(d).foreach(n => sweep(s"$d/$n"))
      store.deleteDirIfEmpty(d)
    }
    sweep(dir)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val (oldDir, newDir) = (tableDir(oldIdent), tableDir(newIdent))
    if (!store.rename(oldDir, newDir))
      throw new IllegalStateException(s"could not move $oldDir to $newDir")
    // manifests and stats sidecars record ABSOLUTE data-file paths —
    // rewrite the moved table's prefix (a maintenance op on a table with
    // no concurrent writer, like every catalog DDL)
    val mdir = s"$newDir/_manifest"
    for (n <- store.listNames(mdir)
         if n.endsWith(".manifest") || n.endsWith(".stats"))
      store.putString(mdir, n,
        store.readString(s"$mdir/$n").replace(s"$oldDir/", s"$newDir/"))
  }
}
