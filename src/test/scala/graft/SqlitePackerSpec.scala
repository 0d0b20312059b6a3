package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

import graft.sources.{SqliteFile, SqlitePacker}

/** Artifact-sink contract: CSVs carry headers, load.sql bootstraps the
  * DDL itself (a bare `.import` into a missing table silently consumes
  * the header as column names and types everything TEXT), the zip holds
  * all six files, the native pricecatcher.db round-trips through the
  * independent [[SqliteFile]] reader, and — when a sqlite3 binary is
  * present — both artifacts are verified by real sqlite3. */
class SqlitePackerSpec extends SparkSpec {
  import spark.implicits._

  test("SqliteFile round-trips records, multi-page b-trees, empty tables") {
    val path = Files.createTempFile("graft_sqlite", ".db")
    // enough rows to force leaf packing + an interior level; mixed types
    val wide = (1 to 3000).map(i =>
      Seq(i.toLong, s"name_$i" * 3, i * 0.5, null))
    val nPages = SqliteFile.write(path, Seq(
      SqliteFile.TableDef("big",
        "CREATE TABLE big (id INTEGER, name TEXT, score FLOAT, extra TEXT)",
        wide.iterator),
      SqliteFile.TableDef("empty", "CREATE TABLE empty (x INTEGER)",
        Iterator.empty),
      SqliteFile.TableDef("tiny", "CREATE TABLE tiny (v INTEGER)",
        Iterator(Seq(0L), Seq(1L), Seq(-77L), Seq(123456789012L)))))
    assert(nPages > 3, "3000 rows must span multiple pages")

    val master = SqliteFile.read(path, "sqlite_master")
    assert(master.map(_(1)) == Seq("big", "empty", "tiny"))
    assert(master.forall(_(0) == "table"))

    val big = SqliteFile.read(path, "big")
    assert(big.size == 3000)
    assert(big.head == Seq(1L, "name_1" * 3, 0.5, null))
    assert(big.last == Seq(3000L, "name_3000" * 3, 1500.0, null))
    // b-tree walk preserves rowid order
    assert(big.map(_(0).asInstanceOf[Long]) == (1L to 3000L))

    assert(SqliteFile.read(path, "empty").isEmpty)
    // integer serial-type edges: 0, 1, negative, >32-bit
    assert(SqliteFile.read(path, "tiny").map(_(0)) ==
      Seq(0L, 1L, -77L, 123456789012L))
    Files.delete(path)
  }

  test("SqliteFile index b-trees: complete, ordered, multi-level") {
    val path = Files.createTempFile("graft_sqlite_ix", ".db")
    // key design: text keys large enough to force interior index pages
    // (promoted-divider path), plus NULLs (class order: NULL first)
    val n = 4000
    val rows = (1 to n).map { i =>
      Seq(if (i % 97 == 0) null else s"key_${"%05d".format((i * 7919) % n)}",
        i.toLong)
    }
    SqliteFile.write(path, Seq(
      SqliteFile.TableDef("t",
        "CREATE TABLE t (k TEXT, v INTEGER)", rows.iterator,
        Seq(SqliteFile.IndexDef("idx_k",
          "CREATE INDEX idx_k ON t (k)", Seq(0)),
          SqliteFile.IndexDef("idx_empty_none", // empty-index path
            "CREATE INDEX idx_empty_none ON t (v)", Seq(1))))))

    val master = SqliteFile.read(path, "sqlite_master")
    assert(master.count(_(0) == "index") == 2)

    val entries = SqliteFile.readIndex(path, "idx_k")
    assert(entries.size == n, s"index must hold every row: ${entries.size}")
    // every (key, rowid) pair present exactly once
    val expected = rows.zipWithIndex.map { case (r, i) => (r(0), i + 1L) }
    assert(entries.map(e => (e(0), e(1))).toSet == expected.toSet)
    // in index order: NULLs first, then byte-ordered text; rowid breaks ties
    val keys = entries.map(_(0))
    val (nulls, texts) = keys.span(_ == null)
    assert(nulls.size == n / 97 && texts.forall(_ != null))
    assert(texts.map(_.asInstanceOf[String]) ==
      texts.map(_.asInstanceOf[String]).sorted)
    Files.delete(path)
  }

  test("SqliteFile overflow chains: >4KB rows and index keys round-trip") {
    val path = Files.createTempFile("graft_sqlite_ovf", ".db")
    // 16 KB string (multi-page chain), 9 KB blob, 5 KB index key —
    // all past the single-page budgets; filler rows force multi-leaf
    // b-trees so overflow cells coexist with ordinary packing
    val big16k = "x" * 16384 + "END"
    val blob = Array.tabulate[Byte](9000)(i => (i * 31).toByte)
    val longKey = "k" * 5000
    val rows = Seq(
      Seq(1L, big16k, null),
      Seq(2L, "short", blob),
      Seq(3L, longKey, null)) ++
      (4 to 300).map(i => Seq(i.toLong, s"filler_$i" * 40, null))
    SqliteFile.write(path, Seq(
      SqliteFile.TableDef("ovf",
        "CREATE TABLE ovf (id INTEGER, txt TEXT, b BLOB)", rows.iterator,
        Seq(SqliteFile.IndexDef("idx_txt",
          "CREATE INDEX idx_txt ON ovf (txt)", Seq(1))))))

    val got = SqliteFile.read(path, "ovf")
    assert(got.size == rows.size)
    assert(got(0)(1) == big16k)
    assert(java.util.Arrays.equals(
      got(1)(2).asInstanceOf[Array[Byte]], blob))
    assert(got(2)(1) == longKey)
    val entries = SqliteFile.readIndex(path, "idx_txt")
    assert(entries.size == rows.size)
    assert(entries.map(_(0)).contains(big16k))
    assert(entries.map(_(0)).contains(longKey))

    // real sqlite3 verdict when available: page-level integrity (would
    // flag orphaned/corrupt overflow chains) + content through chains
    if (Process(Seq("sh", "-c", "command -v sqlite3")).! == 0) {
      val res = Process(Seq("sqlite3", path.toString,
        "PRAGMA integrity_check;",
        "SELECT length(txt) FROM ovf WHERE id=1;",
        "SELECT substr(txt,16381,7) FROM ovf WHERE id=1;",
        "SELECT length(b) FROM ovf WHERE id=2;",
        "SELECT count(*) FROM ovf INDEXED BY idx_txt WHERE txt > '';")).!!.trim
      assert(res.linesIterator.toSeq ==
        Seq("ok", "16387", "xxxxEND", "9000", s"${rows.size}"), res)
    }
    Files.delete(path)
  }

  test("pack emits a self-bootstrapping artifact that loads in sqlite3") {
    val out = Files.createTempDirectory("packer_spec").toString
    val prices = Seq(("2001-01-01", 1L, 10L, 9.99), ("2001-01-02", 2L, 11L, 5.0))
      .toDF("date", "premise_code", "item_code", "price")
    val premises = Seq((1L, "P1", "addr", "t", "s", "d"), (2L, "P2", "addr", "t", "s", "d"))
      .toDF("premise_code", "premise", "address", "premise_type", "state", "district")
    val items = Seq((10L, "I1", "u", "g", "c"), (11L, "I2", "u", "g", "c"))
      .toDF("item_code", "item", "unit", "item_group", "item_category")
    val zip = SqlitePacker.pack(out, prices, premises, items)

    assert(Files.exists(zip))
    val load = Files.readString(Paths.get(s"$out/load.sql"))
    assert(load.linesIterator.next() == ".read schema.sql",
      "load.sql must bootstrap the DDL before importing")
    for (t <- Seq("prices", "premises", "items")) {
      val head = Files.readAllLines(Paths.get(s"$out/$t.csv")).get(0)
      assert(!head.exists(_.isDigit), s"$t.csv must start with a header: $head")
    }

    // end-to-end through a real sqlite3 if one is installed
    if (Process(Seq("sh", "-c", "command -v sqlite3")).! == 0) {
      val res = Process(
        Seq("sqlite3", ":memory:", ".read load.sql",
          "SELECT count(*) FROM prices;",
          "SELECT typeof(price) FROM prices LIMIT 1;"),
        new java.io.File(out)).!!.trim
      assert(res.linesIterator.toSeq == Seq("2", "real"), s"sqlite3 load gave: $res")
    }
  }
}
