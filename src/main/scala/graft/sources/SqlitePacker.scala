package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Artifact sink with SQLite parity (SURVEY.md §2.1 S6–S10).
  *
  * The reference's deliverable is one indexed, compressed SQLite file
  * (reference: src/main.rs:191-208 DDL, main.rs:289-311 backup,
  * main.rs:312-325 zip). No sqlite library (JDBC or native) ships in
  * this environment, so the sink produces the artifact two ways:
  *
  *  - `pricecatcher.db` — a REAL queryable SQLite database file written
  *    directly from the public file format by [[SqliteFile]] (table
  *    b-trees; the ten reference indexes are recreated by load.sql —
  *    see SqliteFile's scope note). Rows stream through
  *    `toLocalIterator` — single-writer by design, like the reference:
  *    this is the *served* artifact, small relative to the lake; the
  *    100 TB data stays in parquet.
  *  - CSV + `schema.sql` (exact reference DDL incl. all ten indexes) +
  *    `load.sql` — the text-tooling path: any sqlite3 rebuilds the
  *    fully indexed database from it.
  *  - JDBC path (used iff org.sqlite.JDBC is ever on the classpath):
  *    auto-detected, see [[sqliteJdbcAvailable]].
  *
  * Everything is zipped with deflate like the reference (main.rs:320).
  */
object SqlitePacker {

  /** Exact DDL parity with reference src/main.rs:192-207. */
  val schemaSql: String =
    """CREATE TABLE IF NOT EXISTS prices (date VARCHAR(255), premise_code INTEGER, item_code INTEGER, price FLOAT);
      |CREATE INDEX IF NOT EXISTS idx_prices_premise_code ON prices (premise_code);
      |CREATE INDEX IF NOT EXISTS idx_prices_item_code ON prices (item_code);
      |CREATE TABLE IF NOT EXISTS premises (premise_code INTEGER, premise VARCHAR(255), address VARCHAR(255), premise_type VARCHAR(255), state VARCHAR(255), district VARCHAR(255));
      |CREATE UNIQUE INDEX IF NOT EXISTS idx_premises_premise_code ON premises (premise_code);
      |CREATE INDEX IF NOT EXISTS idx_premises_premise_type ON premises (premise_type);
      |CREATE INDEX IF NOT EXISTS idx_premises_state ON premises (state);
      |CREATE INDEX IF NOT EXISTS idx_premises_district ON premises (district);
      |CREATE TABLE IF NOT EXISTS items (item_code INTEGER, item VARCHAR(255), unit VARCHAR(255), item_group VARCHAR(255), item_category VARCHAR(255));
      |CREATE UNIQUE INDEX IF NOT EXISTS idx_items_item_code ON items (item_code);
      |CREATE INDEX IF NOT EXISTS idx_items_item_group ON items (item_group);
      |CREATE INDEX IF NOT EXISTS idx_items_item_category ON items (item_category);
      |""".stripMargin

  def sqliteJdbcAvailable: Boolean =
    try { Class.forName("org.sqlite.JDBC"); true }
    catch { case _: ClassNotFoundException => false }

  /** The reference's nine indexes (schemaSql above), as native index
    * b-trees in the .db artifact. keyCols are positions in the table's
    * column order. */
  private val indexDefs: Map[String, Seq[SqliteFile.IndexDef]] = Map(
    "prices" -> Seq(
      SqliteFile.IndexDef("idx_prices_premise_code",
        "CREATE INDEX idx_prices_premise_code ON prices (premise_code)", Seq(1)),
      SqliteFile.IndexDef("idx_prices_item_code",
        "CREATE INDEX idx_prices_item_code ON prices (item_code)", Seq(2))),
    "premises" -> Seq(
      SqliteFile.IndexDef("idx_premises_premise_code",
        "CREATE UNIQUE INDEX idx_premises_premise_code ON premises (premise_code)", Seq(0)),
      SqliteFile.IndexDef("idx_premises_premise_type",
        "CREATE INDEX idx_premises_premise_type ON premises (premise_type)", Seq(3)),
      SqliteFile.IndexDef("idx_premises_state",
        "CREATE INDEX idx_premises_state ON premises (state)", Seq(4)),
      SqliteFile.IndexDef("idx_premises_district",
        "CREATE INDEX idx_premises_district ON premises (district)", Seq(5))),
    "items" -> Seq(
      SqliteFile.IndexDef("idx_items_item_code",
        "CREATE UNIQUE INDEX idx_items_item_code ON items (item_code)", Seq(0)),
      SqliteFile.IndexDef("idx_items_item_group",
        "CREATE INDEX idx_items_item_group ON items (item_group)", Seq(3)),
      SqliteFile.IndexDef("idx_items_item_category",
        "CREATE INDEX idx_items_item_category ON items (item_category)", Seq(4))))

  /** Per-table CREATE statements stored in sqlite_master. */
  private val createTableSql = Map(
    "prices" -> ("CREATE TABLE prices (date VARCHAR(255), premise_code " +
      "INTEGER, item_code INTEGER, price FLOAT)"),
    "premises" -> ("CREATE TABLE premises (premise_code INTEGER, premise " +
      "VARCHAR(255), address VARCHAR(255), premise_type VARCHAR(255), " +
      "state VARCHAR(255), district VARCHAR(255))"),
    "items" -> ("CREATE TABLE items (item_code INTEGER, item VARCHAR(255), " +
      "unit VARCHAR(255), item_group VARCHAR(255), item_category " +
      "VARCHAR(255))"))

  /** Row → SQLite storage classes (INTEGER/REAL/TEXT/NULL). */
  private def sqlValues(r: org.apache.spark.sql.Row): Seq[Any] =
    r.toSeq.map {
      case null => null
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case f: Float => f.toDouble
      case v @ (_: Long | _: Double | _: String) => v
      case other => other.toString
    }

  /** Stringify engine types to the reference's storage forms (dates as
    * 10-char strings, main.rs:23). */
  private def stringified(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.DateType =>
          d.withColumn(f.name, date_format(col(f.name), "yyyy-MM-dd"))
        case _ => d
      }
    }

  /** Write the three-table artifact directory + zip; returns zip path. */
  def pack(outDir: String, prices: DataFrame, premises: DataFrame,
           items: DataFrame): Path = {
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    val tables = Seq("prices" -> prices, "premises" -> premises,
      "items" -> items)

    tables.foreach { case (name, df) =>
      stringified(df).coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(s"$outDir/$name.csv.d")
      // promote the single part file to a stable name
      val part = Files.list(Paths.get(s"$outDir/$name.csv.d")).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-")).get
      Files.move(part, dir.resolve(s"$name.csv"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      deleteRecursive(Paths.get(s"$outDir/$name.csv.d"))
    }

    // the real database file — queryable by any sqlite3 as-is, with the
    // reference's indexes as native b-trees
    val dbPath = dir.resolve("pricecatcher.db")
    SqliteFile.write(dbPath, tables.map { case (name, df) =>
      SqliteFile.TableDef(name, createTableSql(name),
        stringified(df).toLocalIterator().asScala.map(sqlValues),
        indexDefs.getOrElse(name, Nil))
    })

    Files.writeString(dir.resolve("schema.sql"), schemaSql)
    // load.sql bootstraps the DDL itself (reference flow: create tables +
    // indexes, then insert, main.rs:192-207 -> 289-311). Without it,
    // `.import` on a missing table silently consumes the CSV header as
    // column names and types everything TEXT.
    Files.writeString(dir.resolve("load.sql"),
      ".read schema.sql\n.mode csv\n" + tables.map { case (n, _) =>
        s".import --skip 1 $n.csv $n" }.mkString("\n") + "\nVACUUM;\n")

    // zip with deflate, matching the reference's packaging (main.rs:312-325)
    val zipPath = dir.resolve("pricecatcher.zip")
    val zos = new ZipOutputStream(new BufferedOutputStream(
      new FileOutputStream(zipPath.toFile)))
    try {
      zos.setLevel(9)
      (tables.map(_._1 + ".csv") ++
        Seq("pricecatcher.db", "schema.sql", "load.sql")).foreach { f =>
        zos.putNextEntry(new ZipEntry(f))
        Files.copy(dir.resolve(f), zos)
        zos.closeEntry()
      }
    } finally zos.close()
    zipPath
  }

  private def deleteRecursive(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursive)
    Files.deleteIfExists(p)
  }
}
