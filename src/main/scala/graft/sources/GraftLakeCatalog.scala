package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.{SupportsRead, TableCapability}
import org.apache.spark.sql.connector.expressions.{Literal, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.rdd.RDD

/** [[VersionedLake]] tables BY NAME — a Spark V2 [[TableCatalog]]
  * over a warehouse directory (r14 verdict #6: the name-resolution
  * layer above the path-based `graftlake` format). Register and use:
  *
  * {{{
  * spark.sql.catalog.graft      = graft.sources.GraftLakeCatalog
  * spark.sql.catalog.graft.base = /warehouse/root
  *
  * CREATE TABLE graft.ns.t (id BIGINT, month STRING, x DOUBLE)
  *   PARTITIONED BY (month)                  -- identity: plain lake
  * CREATE TABLE graft.ns.h (id BIGINT, d DATE, x DOUBLE)
  *   PARTITIONED BY (months(d))              -- transform: HIDDEN lake
  * INSERT INTO graft.ns.t VALUES ...
  * DELETE FROM graft.ns.t WHERE month = '1997-02'
  * SELECT * FROM graft.ns.t VERSION AS OF 2  -- Spark-native travel
  * SELECT * FROM graft.ns.t TIMESTAMP AS OF '1970-01-01 00:00:02'
  * }}}
  *
  * The catalog is a THIN name→path map: `graft.ns.t` lives at
  * `<base>/ns/t`, and every loaded table is the SAME
  * [[GraftLakeTable]] the path-based format returns — one read path
  * (manifest-resolved schema, DV fold, column mapping, partition
  * pruning), one write path (the library commit protocol, OCC
  * included), one DELETE path (l23 DVs). `VERSION AS OF` /
  * `TIMESTAMP AS OF` resolve through [[TableCatalog.loadTable]]'s
  * versioned overloads to the same pins the `versionAsOf` /
  * `timestampAsOf` options set (Spark hands TIMESTAMP AS OF as
  * MICROseconds; commit stamps are millis).
  *
  * `PARTITIONED BY` maps the Iceberg way: an identity transform names
  * a plain partition column (recorded in `_log/_partcol` so later
  * loads need no option); `months(c)`/`days(c)`/`bucket(n, c)` DEFINE
  * hidden partitioning ([[HiddenPartitioning]]) — writers derive,
  * readers never see the internal column. CREATE seeds version 1 with
  * the schema-recording empty overwrite (the fresh-lake seed
  * discipline), so the first INSERT is an ordinary append.
  *
  * Namespaces ([[SupportsNamespaces]], r15) are the directory tree
  * itself — nested CREATE/SHOW/DROP NAMESPACE with no metadata store
  * (custom properties and LOCATION refuse loudly rather than drop
  * silently; non-empty needs CASCADE). Metadata tables (r15, the
  * Iceberg reserved-suffix convention): `cat.ns.t.history` /
  * `cat.ns.t.files` read [[VersionedLake.history]] /
  * [[VersionedLake.filesTable]] as read-only relations
  * ([[GraftLakeMetaTable]]). TRUNCATE TABLE rides
  * [[org.apache.spark.sql.connector.catalog.SupportsDelete]]'s
  * AlwaysTrue default into the same DV commit — one more version,
  * history intact.
  *
  * Deliberate refusals (each loud): ALTER TABLE (schema evolution is
  * a versioned COMMIT — [[VersionedLake.commitRenameColumn]] /
  * [[VersionedLake.commitDropColumn]] / merge-with-evolveSchema — not
  * catalog metadata); RENAME (the path IS the identity — coordinator
  * records and clones pin it); multi-transform partitioning;
  * identifier segments that would escape the warehouse (`..`,
  * embedded separators); a table INSIDE a table. DROP
  * deletes the lake directory (DESTRUCTIVE, like an unmanaged-catalog
  * drop of a managed table — history included). */
final class GraftLakeCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var base: String = _

  private def spark: SparkSession = SparkSession.active

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    base = Option(options.get("base")).map(_.stripSuffix("/")).getOrElse(
      throw new IllegalArgumentException(
        s"graftlake catalog '$name' needs a base directory: " +
          s"spark.sql.catalog.$name.base = /warehouse/root"))
  }

  override def name(): String = catalogName

  /** Identifier → warehouse path. Segments are path components, so
    * anything that could ESCAPE the warehouse base is refused loudly —
    * a backtick-quoted `..` or embedded-slash segment would otherwise
    * resolve (and DROP TABLE would recursively DELETE) a directory
    * outside `<base>` (r15 self-review). */
  private def validateSegment(s: String): Unit =
    require(s.nonEmpty && s != "." && s != ".." &&
        !s.contains("/") && !s.contains("\\"),
      s"invalid graftlake identifier segment '$s': segments map to " +
        "warehouse path components and cannot be empty, '.', '..', " +
        "or contain path separators")

  private def tablePath(ident: Identifier): String = {
    val segs = ident.namespace().toSeq :+ ident.name()
    segs.foreach(validateSegment)
    (base +: segs).mkString("/")
  }

  private def nsPath(namespace: Seq[String]): String = {
    namespace.foreach(validateSegment)
    (base +: namespace).mkString("/")
  }

  private def partColFile(path: String) =
    new Path(s"$path/_log/_partcol")

  private def readPartCol(path: String): Option[String] = {
    val f = fs(path)
    val p = partColFile(path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  /** A table is a `_log` WITH at least one committed version: marker
    * files alone (a create that crashed before its schema-seed commit)
    * are a PHANTOM, not a table — [[createTable]] clears such debris
    * and retries cleanly instead of throwing TableAlreadyExists at a
    * name nothing can load (r15 self-review). */
  private def isTable(path: String): Boolean =
    fs(base).exists(new Path(s"$path/_log")) &&
      VersionedLake.latestVersion(spark, path) > 0

  override def tableExists(ident: Identifier): Boolean =
    isTable(tablePath(ident))

  private def load(ident: Identifier, pinned: Option[Int]): Table = {
    val path = tablePath(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = pinned.getOrElse(VersionedLake.latestVersion(spark, path))
    val full = VersionedLake.readVersion(spark, path, v).schema
    // the format's schema rule: a hidden lake's internal column never
    // surfaces (GraftLakeSource.inferSchema — same read, same hiding)
    val schema =
      if (HiddenPartitioning.declared(spark, path)) {
        val pc = HiddenPartitioning.spec(spark, path).partCol
        StructType(full.fields.filterNot(_.name == pc))
      } else full
    new GraftLakeTable(path, pinned, readPartCol(path), schema)
  }

  override def loadTable(ident: Identifier): Table =
    if (tableExists(ident)) load(ident, None)
    else metaTable(ident).getOrElse(load(ident, None)) // load throws

  /** Iceberg-style METADATA TABLES: `cat.ns.t.history` /
    * `cat.ns.t.files` — the library's [[VersionedLake.history]] /
    * [[VersionedLake.filesTable]] frames as read-only SQL relations
    * (commit log and LATEST file inventory; driver-side manifest
    * metadata, version-count-sized — row data never reads). A REAL
    * table always wins the name (resolution tries it first), and the
    * inventory re-resolves latest at every scan like any un-pinned
    * relation. */
  private def metaTable(ident: Identifier): Option[Table] = {
    val ns = ident.namespace()
    if (ns.isEmpty ||
        !GraftLakeMetaTable.Kinds.contains(ident.name())) None
    else {
      val parent = Identifier.of(ns.dropRight(1), ns.last)
      if (!tableExists(parent)) None
      else Some(new GraftLakeMetaTable(tablePath(parent), ident.name()))
    }
  }

  /** `VERSION AS OF <v>` — Spark's native time-travel SQL. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = version.trim.toIntOption.getOrElse(
      throw new IllegalArgumentException(
        s"graftlake VERSION AS OF takes an integer version, got '$version'"))
    load(ident, Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds since epoch;
    * commit stamps ([[VersionedLake.versionAsOf]]) are millis. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = tablePath(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    load(ident, Some(VersionedLake.versionAsOf(spark, path,
      Math.floorDiv(timestamp, 1000L))))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String])
      : Table = {
    val path = tablePath(ident)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val parentSegs = ident.namespace().toSeq
    require(parentSegs.isEmpty ||
        !isTable((base +: parentSegs).mkString("/")),
      s"cannot create a table INSIDE table ${parentSegs.mkString(".")}" +
        " — tables are leaves (and nesting would shadow its " +
        "history/files metadata views)")
    require(partitions.length == 1,
      s"graftlake tables take exactly ONE partition transform " +
        s"(identity column, months(c), days(c), or bucket(n, c)); " +
        s"got ${partitions.length}")
    val f = fs(path)
    val ldir = new Path(s"$path/_log")
    // phantom debris from a crashed earlier create (markers, no seed
    // commit): clear it so the retry starts clean instead of tripping
    // on existing marker files — re-checking the version right before
    // the delete so a direct-library first commit that just landed is
    // refused as an existing table, never deleted
    if (f.exists(ldir)) {
      if (VersionedLake.latestVersion(spark, path) > 0)
        throw new TableAlreadyExistsException(ident)
      f.delete(ldir, true)
    }
    val dirExistedBefore = f.exists(new Path(path))
    f.mkdirs(new Path(path))
    def srcOf(refs: Array[org.apache.spark.sql.connector.expressions
        .NamedReference]): String = {
      require(refs.length == 1 && refs.head.fieldNames().length == 1,
        s"graftlake partition transforms take one top-level column")
      val c = refs.head.fieldNames().head
      require(schema.fieldNames.contains(c),
        s"partition source column $c is not in the table schema")
      c
    }
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    // the concrete Transform classes are private[sql]; the public
    // interface (name / references / arguments) carries everything.
    // A failed seed commit must not leave a PHANTOM (markers without
    // a version — unloadable yet blocking re-creation): on any
    // failure before version 1 exists, the marker debris is removed
    // and the error rethrown, so the create either yields a loadable
    // table or leaves no table at all.
    try partitions.head match {
      case id if id.name() == "identity" =>
        val pc = srcOf(id.references())
        require(schema.fields.exists(x =>
            x.name == pc && x.dataType == StringType),
          s"identity partition column $pc must be STRING (manifest " +
            "partition values are strings); use months/days/bucket " +
            "transforms for typed columns")
        // record the partition column so later loads need no option
        val out = f.create(partColFile(path), false)
        try out.write(s"$pc\n".getBytes("UTF-8")) finally out.close()
        VersionedLake.commitOverwrite(empty, pc, path) // schema seed
      case t: Transform if t.name() == "months" =>
        HiddenPartitioning.define(spark, path,
          HiddenPartitioning.Spec(srcOf(t.references()),
            HiddenPartitioning.Month))
        HiddenPartitioning.commitOverwrite(empty, path)
      case t: Transform if t.name() == "days" =>
        HiddenPartitioning.define(spark, path,
          HiddenPartitioning.Spec(srcOf(t.references()),
            HiddenPartitioning.Day))
        HiddenPartitioning.commitOverwrite(empty, path)
      case b if b.name() == "bucket" =>
        val n = b.arguments().collectFirst {
          case l: Literal[_] => l.value().toString.toInt
        }.getOrElse(throw new IllegalArgumentException(
          "bucket transform needs a bucket count: bucket(n, col)"))
        HiddenPartitioning.define(spark, path,
          HiddenPartitioning.Spec(srcOf(b.references()),
            HiddenPartitioning.Bucket(n)))
        HiddenPartitioning.commitOverwrite(empty, path)
      case other =>
        throw new UnsupportedOperationException(
          s"graftlake does not support the ${other.name()} partition " +
            "transform (identity, months, days, bucket)")
    } catch {
      case e: Throwable =>
        if (VersionedLake.latestVersion(spark, path) == 0) {
          f.delete(ldir, true)
          // the empty directory itself would otherwise surface as a
          // phantom NAMESPACE (r15 self-review); non-recursive delete
          // removes it only if we left nothing else there
          if (!dirExistedBefore)
            try { f.delete(new Path(path), false); () }
            catch { case _: Exception => () }
        }
        throw e
    }
    load(ident, None)
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"graftlake schema evolution is a versioned COMMIT, not catalog " +
        s"metadata: use VersionedLake.commitRenameColumn/commitDropColumn " +
        s"or a merge with evolveSchema on ${ident.toString}")

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val path = tablePath(ident)
    // a lake re-created at this path must not inherit the dead
    // history's txn replay-dedup set (r15 self-review: the per-JVM
    // cache would silently no-op its first txn-stamped commits)
    VersionedLake.forgetTxns(path)
    fs(base).delete(new Path(path), true)
  }

  /** Forget the txn caches of every lake under `p` (recursive) —
    * [[dropTable]]'s rule applied to a CASCADE namespace drop. Keys
    * are built from the same catalog path spellings the commits used
    * (never the FileSystem-qualified listing paths). */
  private def forgetTxnsUnder(p: String): Unit = {
    val f = fs(base)
    f.listStatus(new Path(p)).foreach { st =>
      if (st.isDirectory && st.getPath.getName != "_log") {
        val child = s"$p/${st.getPath.getName}"
        VersionedLake.forgetTxns(child)
        forgetTxnsUnder(child)
      }
    }
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graftlake tables cannot be renamed: the path is the table's " +
        "identity (coordinator records and clones pin it); copy with " +
        "CREATE TABLE + INSERT, or clone through the library")

  // ---- namespaces (SupportsNamespaces): directories that are not
  // tables. The mapping is the same THIN name→path rule as tables —
  // `graft.a.b` is `<base>/a/b` — so namespaces nest naturally, a
  // table's parent directories ARE its namespace, and the only state
  // is the directory tree itself (no namespace metadata store:
  // loadNamespaceMetadata returns an empty map, properties beyond
  // Spark's reserved ones are refused loudly rather than dropped).

  private def nsExists(namespace: Seq[String]): Boolean = {
    val p = nsPath(namespace)
    val f = fs(base)
    f.exists(new Path(p)) && f.getFileStatus(new Path(p)).isDirectory &&
      !isTable(p)
  }

  private def childDirs(path: String): Seq[org.apache.hadoop.fs.FileStatus] =
    fs(base).listStatus(new Path(path)).toSeq.filter(_.isDirectory)

  override def listNamespaces(): Array[Array[String]] =
    childDirs(base)
      .filterNot(st => isTable(st.getPath.toString))
      .map(st => Array(st.getPath.getName)).toArray

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    if (!nsExists(namespace.toSeq))
      throw new NoSuchNamespaceException(namespace)
    childDirs(nsPath(namespace.toSeq))
      .filterNot(st => isTable(st.getPath.toString))
      .map(st => namespace :+ st.getPath.getName).toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    // the ROOT namespace (empty) is the warehouse base: always exists
    if (namespace.nonEmpty && !nsExists(namespace.toSeq))
      throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap[String, String]()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String])
      : Unit = {
    require(!metadata.containsKey(SupportsNamespaces.PROP_LOCATION),
      "graftlake namespace location is always <base>/<namespace>: a " +
        "custom LOCATION cannot be honored")
    val reserved = Set(SupportsNamespaces.PROP_OWNER,
      SupportsNamespaces.PROP_COMMENT, SupportsNamespaces.PROP_COLLATION)
    val custom = metadata.keySet().iterator()
    while (custom.hasNext) {
      val k = custom.next()
      // Spark injects reserved props (owner/comment/...); anything
      // else would be silently lost — the directory IS the namespace
      require(reserved.contains(k),
        s"graftlake namespaces carry no metadata store: property '$k' " +
          "would be dropped (the directory is the namespace)")
    }
    if (nsExists(namespace.toSeq) ||
        isTable(nsPath(namespace.toSeq)))
      throw new NamespaceAlreadyExistsException(namespace)
    fs(base).mkdirs(new Path(nsPath(namespace.toSeq)))
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graftlake namespaces carry no metadata to alter (the " +
        "directory is the namespace)")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!nsExists(namespace.toSeq)) return false
    val p = nsPath(namespace.toSeq)
    if (!cascade && childDirs(p).nonEmpty)
      throw new NonEmptyNamespaceException(namespace)
    if (cascade) forgetTxnsUnder(p) // dropTable's txn rule, recursive
    fs(base).delete(new Path(p), true)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    // nsPath validates the segments: SHOW TABLES must not traverse
    // out of the warehouse either (r15 self-review — every path
    // construction site goes through the same guard)
    val dir = new Path(nsPath(namespace.toSeq))
    val f = fs(base)
    if (!f.exists(dir))
      throw new NoSuchNamespaceException(namespace)
    f.listStatus(dir).iterator
      .filter(st => st.isDirectory && isTable(st.getPath.toString))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }
}

private[sources] object GraftLakeMetaTable {

  /** Reserved metadata-view names (Iceberg's `t.history`/`t.files`
    * convention). A real table of the same name shadows the view —
    * the catalog resolves real tables first. */
  val Kinds: Set[String] = Set("history", "files")

  /** Pinned copies of the library frames' schemas (asserted equal to
    * the live frames in GraftLakeSourceSpec, so drift fails a spec,
    * not a user query). */
  val HistorySchema: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("op", StringType, nullable = true),
    StructField("txn", LongType, nullable = true),
    StructField("commit_ts", LongType, nullable = true),
    StructField("n_parts", IntegerType, nullable = false),
    StructField("has_dvs", BooleanType, nullable = false),
    StructField("n_constraints", IntegerType, nullable = false)))

  val FilesSchema: StructType = StructType(Seq(
    StructField("part", StringType, nullable = true),
    StructField("rel", StringType, nullable = true),
    StructField("kind", StringType, nullable = true),
    StructField("lo", LongType, nullable = true),
    StructField("hi", LongType, nullable = true),
    StructField("era", IntegerType, nullable = true),
    StructField("size_bytes", LongType, nullable = true)))
}

/** A read-only metadata view over one lake's commit log
  * ([[VersionedLake.history]]) or LATEST file inventory
  * ([[VersionedLake.filesTable]]) — the same [[V1Scan]] adapter shape
  * as the data table's scan, but over driver-side manifest metadata
  * (version-count-sized; row data never reads). No write capability:
  * every mutation verb refuses at analysis. */
private[sources] final class GraftLakeMetaTable(path: String,
                                                meta: String)
    extends Table with SupportsRead {

  override def name(): String = s"graftlake.`$path`.$meta"

  override def schema(): StructType = meta match {
    case "history" => GraftLakeMetaTable.HistorySchema
    case _         => GraftLakeMetaTable.FilesSchema
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new V1Scan {
      override def readSchema(): StructType = schema()
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T = {
        val s = context.sparkSession
        // latest re-resolves AT SCAN TIME, like any un-pinned relation
        val df = meta match {
          case "history" => VersionedLake.history(s, path)
          case _ => VersionedLake.filesTable(s, path,
            VersionedLake.latestVersion(s, path))
        }
        val rel = new BaseRelation with TableScan {
          override val sqlContext: SQLContext = context
          override val schema: StructType = readSchema()
          override def buildScan(): RDD[Row] = df.rdd
        }
        rel.asInstanceOf[T]
      }
    }
  }
}
