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

  /** Declares column-DEFAULT support so `ALTER TABLE ADD COLUMN ... NOT
    * NULL DEFAULT <lit>` reaches the catalog (Spark gates the syntax on
    * this) and INSERTs fill omitted defaulted columns from the schema
    * metadata the connector serves. CREATE TABLE with DEFAULT still
    * refuses (see createTable) — the declared-schema roundtrip has
    * nowhere to keep it before the first commit. */
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog.TableCatalogCapability
      .SUPPORT_COLUMN_DEFAULT_VALUE)

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

  /** The table root for `ident` — the resolution the ANALYZE rule and
    * other extension hooks need from outside the catalog. */
  private[graft] def dirOf(ident: Identifier): String = tableDir(ident)

  private def tableDir(ident0: Identifier): String = {
    val ident = normalize(ident0)
    val base = (root +: ident.namespace.toSeq).mkString("/")
    // `t@dev` addresses BRANCH `dev` of table `t` (quote it: `` `t@dev` ``)
    // — a full table root of its own under the parent's `_branches/`, so
    // every verb (read, write, row-level, procedures) just works on it
    ident.name.split("@", 2) match {
      case Array(t, b) if t.nonEmpty && b.nonEmpty => s"$base/$t/_branches/$b"
      case _ => s"$base/${ident.name}"
    }
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
    if (ident.name.contains("@")) throw new IllegalArgumentException(
      s"'${ident.name}' addresses a BRANCH — branches are created with " +
        "CALL system.branch('<table>', '<name>'), not CREATE TABLE")
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
    // column DEFAULTs on CREATE TABLE refuse: the declared-schema DDL
    // roundtrip (_catalog.properties) cannot hold the default before the
    // first commit exists — adopt them post-creation via
    // ALTER TABLE ADD COLUMN ... NOT NULL DEFAULT <literal>
    for (f <- schema.fields)
      require(!f.metadata.contains(org.apache.spark.sql.catalyst.util
          .ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY),
        s"column ${f.name}: DEFAULT on CREATE TABLE is unsupported — " +
          "add defaulted columns via ALTER TABLE ADD COLUMN ... NOT NULL DEFAULT")
    // optional date-partition layout: TBLPROPERTIES ('partCol'='event_date')
    val partLine = prop("partCol").map { p =>
      require(schema.fieldNames.contains(p), s"partCol $p not in schema")
      s"partCol=$p"
    }
    // merge-on-read deletes: DELETEs commit deletion-vector sidecars
    // instead of copy-on-write bucket rewrites (see
    // ManifestUpsertSink.deleteKeysMergeOnRead)
    val morLine = prop("mergeOnRead").map { v =>
      require(v == "true" || v == "false", s"mergeOnRead must be true/false, got '$v'")
      s"mergeOnRead=$v"
    } ++ prop("dvMaxRowsPerBucket").map { v =>
      require(v.toLong > 0, s"dvMaxRowsPerBucket must be positive, got '$v'")
      s"dvMaxRowsPerBucket=$v"
    }
    val lines = Seq(
      s"keyCol=$keyCol", s"orderCol=$orderCol",
      s"buckets=${prop("buckets").getOrElse("16")}") ++ partLine ++ morLine ++ Seq(
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
    // each case PLANS the catalog-properties rewrite (running its
    // validations) BEFORE committing the sink-level DDL, then writes the
    // planned content after — so either both surfaces change or neither:
    // a props-side require firing after the manifest evolved would leave
    // half-applied state behind a reported failure
    changes.foreach {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "RENAME COLUMN supports top-level columns only")
        val oldName = r.fieldNames.head
        val plan = renamePropsPlan(dir, oldName, r.newName)
        for (m <- ManifestUpsertSink.latestManifest(dir))
          committedSink(m)
            .renameColumn(org.apache.spark.sql.SparkSession.active, oldName, r.newName)
        // a created-but-never-written table has only its declared schema
        plan.foreach(writeProps(dir, _))
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "ADD COLUMN supports top-level columns only")
        val dflt = Option(a.defaultValue()).flatMap(d => Option(d.getSql))
        // a plain metadata-only ADD COLUMN is null-backed: committing a
        // NOT NULL add would serve nulls for a column the user declared
        // non-null — refuse loudly. The supported non-null add is
        // `ADD COLUMN c <type> NOT NULL DEFAULT <literal>`: the fold
        // reads absent/null as the literal, which is exact ONLY when the
        // column admits no explicit null — so a NULLABLE default refuses
        // too (an inserted NULL would silently read as the default).
        if (dflt.isDefined)
          require(!a.isNullable,
            "a nullable DEFAULT is ambiguous under the metadata-only fold " +
              "(an explicit NULL would read as the default) — declare " +
              "ADD COLUMN c <type> NOT NULL DEFAULT <literal>")
        else
          require(a.isNullable,
            "metadata-only ADD COLUMN is null-backed — NOT NULL adds are " +
              "unsupported without a DEFAULT")
        require(a.position() == null,
          "ADD COLUMN FIRST/AFTER is unsupported — metadata-only adds " +
            "append at the end of the schema")
        val name = a.fieldNames.head
        val ddl = a.dataType().sql
        // the default lives in the manifest header: a created-but-never-
        // written table has no manifest to hold it, and dropping it
        // silently would serve nulls later — refuse until first write
        if (dflt.isDefined)
          require(ManifestUpsertSink.latestManifest(dir).nonEmpty,
            "ADD COLUMN ... DEFAULT needs a committed table (the default " +
              "lives in the manifest) — insert at least one row first")
        val plan = addPropsPlan(dir, name, a.dataType(), nullable = a.isNullable)
        for (m <- ManifestUpsertSink.latestManifest(dir))
          committedSink(m).addColumn(org.apache.spark.sql.SparkSession.active,
            name, ddl, dflt)
        plan.foreach(writeProps(dir, _))
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          "ALTER COLUMN TYPE supports top-level columns only")
        val name = u.fieldNames.head
        val plan = widenPropsPlan(dir, name, u.newDataType())
        for (m <- ManifestUpsertSink.latestManifest(dir))
          committedSink(m).widenColumn(org.apache.spark.sql.SparkSession.active,
            name, u.newDataType().sql)
        plan.foreach(writeProps(dir, _))
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "DROP COLUMN supports top-level columns only")
        val name = d.fieldNames.head
        // the LWW order column is part of the write contract, not just
        // the schema: every INSERT routes through it
        for (oc <- readProps(dir).get("orderCol"))
          require(oc != name,
            s"cannot drop $name: it is the table's LWW order column (orderCol)")
        val plan = dropPropsPlan(dir, name)
        for (m <- ManifestUpsertSink.latestManifest(dir))
          committedSink(m).dropColumn(org.apache.spark.sql.SparkSession.active, name)
        plan.foreach(writeProps(dir, _))
      case c => throw new UnsupportedOperationException(
        s"ALTER TABLE ${c.getClass.getSimpleName}: unsupported — " +
          "recluster/restore/compact via CALL procedures")
    }
    loadTable(ident)
  }

  private def writeProps(dir: String, content: String): Unit =
    store.putString(dir, "_catalog.properties", content)

  private def renderProps(props: Map[String, String]): String =
    props.map { case (k, v) => s"$k=$v" }.mkString("\n")

  /** Re-spell `old` → `nu` across the catalog-properties file: the
    * keyCol spec (component-wise), orderCol, partCol, and the declared
    * schema DDL. None when the file is absent (Scala-API tables). All
    * `*PropsPlan` helpers VALIDATE and render the new file content
    * without writing — alterTable commits the sink DDL in between, so a
    * failing validation aborts before either surface changes. */
  private def renamePropsPlan(dir: String, old: String, nu: String): Option[String] = {
    val props = readProps(dir)
    if (props.isEmpty) return None
    Some(renderProps(props.map {
      case ("keyCol", v) =>
        "keyCol" -> v.split(",").map(c => if (c.trim == old) nu else c.trim).mkString(",")
      case (k @ ("orderCol" | "partCol"), v) => k -> (if (v == old) nu else v)
      case ("schemaDDL", v) =>
        "schemaDDL" -> StructType(StructType.fromDDL(v).fields.map(f =>
          if (f.name == old) f.copy(name = nu) else f)).toDDL
      case kv => kv
    }))
  }

  /** Append `name type` to the declared schema DDL (nullable — a
    * metadata-only add is null-backed by definition). None when the
    * props file is absent (Scala-API tables). */
  private def addPropsPlan(dir: String, name: String,
      dataType: org.apache.spark.sql.types.DataType,
      nullable: Boolean = true): Option[String] = {
    val props = readProps(dir)
    if (props.isEmpty) return None
    Some(renderProps(props.map {
      case ("schemaDDL", v) =>
        val st = StructType.fromDDL(v)
        require(!st.fieldNames.contains(name),
          s"cannot add: column $name already exists in the declared schema")
        "schemaDDL" -> StructType(st.fields :+
          org.apache.spark.sql.types.StructField(name, dataType,
            nullable = nullable)).toDDL
      case kv => kv
    }))
  }

  /** Respell `name`'s type in the declared schema DDL (the sink verb
    * validates the widening against the committed stamp; a never-written
    * table has nothing physical to promote, so any respell is safe
    * there). None when the props file is absent. */
  private def widenPropsPlan(dir: String,
      name: String, to: org.apache.spark.sql.types.DataType): Option[String] = {
    val props = readProps(dir)
    if (props.isEmpty) return None
    Some(renderProps(props.map {
      case ("schemaDDL", v) =>
        "schemaDDL" -> StructType(StructType.fromDDL(v).fields.map(f =>
          if (f.name == name) f.copy(dataType = to) else f)).toDDL
      case kv => kv
    }))
  }

  /** Remove `name` from the declared schema DDL; refuses key/partition
    * columns (committed layout). None when the props file is absent. */
  private def dropPropsPlan(dir: String, name: String): Option[String] = {
    val props = readProps(dir)
    if (props.isEmpty) return None
    for (k <- props.get("keyCol"))
      require(!k.split(",").map(_.trim).contains(name),
        s"cannot drop $name: it is a key column of the table")
    for (p <- props.get("partCol"))
      require(p != name, s"cannot drop $name: it is the table's partition column")
    Some(renderProps(props.map {
      case ("schemaDDL", v) =>
        "schemaDDL" -> StructType(
          StructType.fromDDL(v).fields.filterNot(_.name == name)).toDDL
      case kv => kv
    }))
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
