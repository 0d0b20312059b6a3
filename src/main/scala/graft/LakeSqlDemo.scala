package graft

import org.apache.spark.sql.SparkSession

import graft.sources.{GraftLakeSource, VersionedLake}

/** Fresh-JVM drive for the `graftlake` DataSource V2 surface
  * ([[graft.sources.GraftLakeSource]]): builds a small versioned lake,
  * then consumes it through PURE SQL — format resolution by short
  * name, `versionAsOf` time travel, and manifest-side partition
  * pruning from the pushed month filter (witnessed by the
  * live/read partition counters), including the r14 OR-union prune,
  * a format APPEND, and the r15 SQL DML surface: `INSERT INTO` the
  * un-pinned view (routes through the same commit path as the format
  * writer — OCC, constraints, staging), `DELETE FROM ... WHERE`
  * (SupportsDelete → the l23 deletion-vector commit: zero fresh data
  * files, a DV sidecar only), and the refusal walls — DML through a
  * time-travelled view, and UPDATE/MERGE INTO (library verbs), all
  * loud. Run:
  * `sbt 'runMain graft.LakeSqlDemo'` — expects
  * `DSV2_V1=3 DSV2_LATEST=3 DSV2_FEB_ID=4 DSV2_PARTS=3/1
  * DSV2_OR_N=2 DSV2_OR_PARTS=3/2 DSV2_W_N=4 DSV2_W_V=3
  * DSV2_INS_N=5 DSV2_INS_V=4 DSV2_DEL_N=4 DSV2_DEL_V=5
  * DSV2_DEL_FRESH=0 DSV2_DEL_DV=1 DSV2_TT_INS=refused
  * DSV2_TT_DEL=refused DSV2_UPD=refused DSV2_MERGE=refused
  * DSV2_CAT_N=2 DSV2_CAT_V2=1 DSV2_CAT_PIN_EQ=true
  * DSV2_CAT_ALTER=refused DSV2_NS_N=2 DSV2_NS_NONEMPTY=refused
  * DSV2_TRUNC_N=0 DSV2_TRUNC_HIST=2 DSV2_NS_AFTER=1
  * DSV2_HIST_N=4 DSV2_FILES_DV=2 DSV2_HIST_INS=refused` (the
  * truncate minted one DV per touched partition). */
object LakeSqlDemo {
  def main(args: Array[String]): Unit = {
    val wh =
      java.nio.file.Files.createTempDirectory("graftlake_wh").toString
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.sources.GraftLakeCatalog")
      .config("spark.sql.catalog.graft.base", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val lake =
      java.nio.file.Files.createTempDirectory("graftlake_demo").toString
    VersionedLake.reset(spark, lake)
    VersionedLake.commitOverwrite(
      Seq((1L, "1997-01", 10.0), (2L, "1997-02", 20.0),
        (3L, "1997-03", 30.0)).toDF("id", "month", "x"),
      "month", lake, commitTs = Some(1000L))
    VersionedLake.commitUpsert(
      Seq((4L, "1997-02", 40.0)).toDF("id", "month", "x"),
      "month", lake, commitTs = Some(2000L))
    spark.sql(s"""CREATE TEMPORARY VIEW lake_v1 USING graftlake
      OPTIONS (path '$lake', versionAsOf '1', partitionColumn 'month')""")
    spark.sql(s"""CREATE TEMPORARY VIEW lake_latest USING graftlake
      OPTIONS (path '$lake', partitionColumn 'month')""")
    val v1n = spark.sql("SELECT count(*) FROM lake_v1").head().getLong(0)
    val ln = spark.sql("SELECT count(*) FROM lake_latest").head().getLong(0)
    GraftLakeSource.lastScanParts.set(None)
    val febId = spark.sql(
      "SELECT max(id) FROM lake_latest WHERE month = '1997-02'")
      .head().getLong(0)
    val parts = GraftLakeSource.lastScanParts.get()
      .map { case (a, b) => s"$a/$b" }.getOrElse("none")
    // OR-union pruning (r14): two month equalities read two partitions
    GraftLakeSource.lastScanParts.set(None)
    val orN = spark.sql(
      """SELECT count(*) FROM lake_latest
        |WHERE month = '1997-01' OR month = '1997-03'""".stripMargin)
      .head().getLong(0)
    val orParts = GraftLakeSource.lastScanParts.get()
      .map { case (a, b) => s"$a/$b" }.getOrElse("none")
    // the format write path (r14): a plain df.write append through
    // graftlake, visible to the un-pinned view on its next scan
    Seq((5L, "1997-04", 50.0)).toDF("id", "month", "x")
      .write.format("graftlake").option("partitionColumn", "month")
      .mode("append").save(lake)
    val wN = spark.sql("SELECT count(*) FROM lake_latest")
      .head().getLong(0)
    val wV = VersionedLake.latestVersion(spark, lake)
    // SQL INSERT INTO the un-pinned view (r15): routes through the
    // same InsertableRelation commit path as the format writer
    spark.sql("INSERT INTO lake_latest VALUES (6, '1997-05', 60.0)")
    val insN = spark.sql("SELECT count(*) FROM lake_latest")
      .head().getLong(0)
    val insV = VersionedLake.latestVersion(spark, lake)
    // SQL DELETE FROM ... WHERE (r15): the l23 DV commit — matching
    // rows die by deletion vector, every data file carries forward
    spark.sql("DELETE FROM lake_latest WHERE month = '1997-02'")
    val delN = spark.sql("SELECT count(*) FROM lake_latest")
      .head().getLong(0)
    val delV = VersionedLake.latestVersion(spark, lake)
    val delEntries = VersionedLake.manifestFiles(spark, lake, delV)
    val delFresh = delEntries.count(e => e.kind == "data" &&
      !VersionedLake.manifestFiles(spark, lake, delV - 1)
        .exists(p => p.kind == "data" && p.rel == e.rel))
    val delDv = delEntries.count(_.kind == "dv")
    // the refusal walls, each loud: DML through a time-travelled view;
    // UPDATE / MERGE INTO (library verbs — no SupportsRowLevelOperations)
    def refused(sql: String): String =
      try { spark.sql(sql); "ACCEPTED" }
      catch { case _: Exception => "refused" }
    val ttIns = refused("INSERT INTO lake_v1 VALUES (7, '1997-06', 70.0)")
    val ttDel = refused("DELETE FROM lake_v1 WHERE id = 1")
    val upd = refused("UPDATE lake_latest SET x = 0.0 WHERE id = 1")
    val mrg = refused(
      """MERGE INTO lake_latest t USING (SELECT 1 AS id) s ON t.id = s.id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    // the V2 CATALOG (r15): the same tables BY NAME — CREATE/INSERT/
    // time-travel through Spark-native SQL, pin-equal to the
    // option-based format read on the same path
    spark.sql("""CREATE TABLE graft.demo.t
      (id BIGINT, month STRING, x DOUBLE) PARTITIONED BY (month)""")
    spark.sql("INSERT INTO graft.demo.t VALUES (1, '1997-01', 10.0)")
    spark.sql("INSERT INTO graft.demo.t VALUES (2, '1997-02', 20.0)")
    val catN = spark.sql("SELECT count(*) FROM graft.demo.t")
      .head().getLong(0)
    val catV2 = spark.sql("SELECT count(*) FROM graft.demo.t VERSION AS OF 2")
      .head().getLong(0)
    val catPinEq = catV2 == spark.read.format("graftlake")
      .option("versionAsOf", "2").load(s"$wh/demo/t").count()
    val catAlter = refused("ALTER TABLE graft.demo.t ADD COLUMN y DOUBLE")
    // namespaces (r15): directory-tree namespaces with the full SQL
    // lifecycle; TRUNCATE TABLE = one more DV commit, history intact
    spark.sql("CREATE NAMESPACE graft.demo2")
    val nsN = spark.sql("SHOW NAMESPACES IN graft").count()
    val nsNonEmpty = refused("DROP NAMESPACE graft.demo")
    val truncV0 = VersionedLake.latestVersion(spark, s"$wh/demo/t")
    spark.sql("TRUNCATE TABLE graft.demo.t")
    val truncN = spark.sql("SELECT count(*) FROM graft.demo.t")
      .head().getLong(0)
    val truncHist = VersionedLake.readVersion(spark, s"$wh/demo/t",
      truncV0).count()
    spark.sql("DROP NAMESPACE graft.demo2")
    val nsAfter = spark.sql("SHOW NAMESPACES IN graft").count()
    // metadata tables (r15): the commit log and latest inventory as
    // read-only SQL — t.history rows == live versions, t.files sees
    // the truncate's DV, INSERT INTO a view refuses
    val histN = spark.sql("SELECT count(*) FROM graft.demo.t.history")
      .head().getLong(0)
    val filesDv = spark.sql(
      "SELECT count(*) FROM graft.demo.t.files WHERE kind = 'dv'")
      .head().getLong(0)
    val histIns = refused(
      "INSERT INTO graft.demo.t.history VALUES (9,'x',9,9,9,false,0)")
    println(s"DSV2_V1=$v1n DSV2_LATEST=$ln DSV2_FEB_ID=$febId " +
      s"DSV2_PARTS=$parts DSV2_OR_N=$orN DSV2_OR_PARTS=$orParts " +
      s"DSV2_W_N=$wN DSV2_W_V=$wV " +
      s"DSV2_INS_N=$insN DSV2_INS_V=$insV DSV2_DEL_N=$delN " +
      s"DSV2_DEL_V=$delV DSV2_DEL_FRESH=$delFresh DSV2_DEL_DV=$delDv " +
      s"DSV2_TT_INS=$ttIns DSV2_TT_DEL=$ttDel DSV2_UPD=$upd " +
      s"DSV2_MERGE=$mrg " +
      s"DSV2_CAT_N=$catN DSV2_CAT_V2=$catV2 DSV2_CAT_PIN_EQ=$catPinEq " +
      s"DSV2_CAT_ALTER=$catAlter " +
      s"DSV2_NS_N=$nsN DSV2_NS_NONEMPTY=$nsNonEmpty " +
      s"DSV2_TRUNC_N=$truncN DSV2_TRUNC_HIST=$truncHist " +
      s"DSV2_NS_AFTER=$nsAfter " +
      s"DSV2_HIST_N=$histN DSV2_FILES_DV=$filesDv " +
      s"DSV2_HIST_INS=$histIns")
    spark.stop()
  }
}
