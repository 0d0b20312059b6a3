package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

import graft.sources.SqlitePacker

/** Artifact-sink contract: CSVs carry headers, load.sql bootstraps the
  * DDL itself (a bare `.import` into a missing table silently consumes
  * the header as column names and types everything TEXT), the zip holds
  * all five files, and — when a sqlite3 binary is present — one
  * `.read load.sql` produces correctly-typed, queryable tables. */
class SqlitePackerSpec extends SparkSpec {
  import spark.implicits._

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
