package graft.model

import org.apache.spark.sql.types._

/** Fixed schemas for the engine.
  *
  * The reference declares a hard-coded star schema as SQLite DDL
  * (reference: src/main.rs:192-207) and never infers schemas. We mirror
  * that stance: every ingest path uses an explicit [[StructType]] — schema
  * inference on a 100 TB lake is both slow (it reads footers of every
  * file) and a correctness hazard (a single dirty file can widen a type).
  *
  * Types follow SURVEY.md §1.2: VARCHAR→StringType, INTEGER→LongType,
  * FLOAT→DoubleType; the reference's string `date` is a proper DateType
  * inside the engine and is stringified only at the sink boundary
  * (reference: src/main.rs:23 truncates to "YYYY-MM-DD").
  */
object Schemas {

  // -- PriceCatcher star schema (reference: src/main.rs:20,30,48) --------

  /** Fact table: one row per observed price (reference: src/main.rs:20).
    * Raw parquet carries `date` as a timestamp; the engine truncates to
    * day at ingest (P1, src/main.rs:23). */
  val pricesRaw: StructType = StructType(Seq(
    StructField("date", TimestampType, nullable = true),
    StructField("premise_code", LongType, nullable = true),
    StructField("item_code", LongType, nullable = true),
    StructField("price", DoubleType, nullable = true)))

  /** Dimension: premises (reference: src/main.rs:30). `premise_code`
    * arrives as *double* in the raw parquet and is rounded to long
    * (src/main.rs:36); non-numeric rows are dropped, not failed
    * (src/main.rs:44). */
  val premisesRaw: StructType = StructType(Seq(
    StructField("premise_code", DoubleType, nullable = true),
    StructField("premise", StringType, nullable = true),
    StructField("address", StringType, nullable = true),
    StructField("premise_type", StringType, nullable = true),
    StructField("state", StringType, nullable = true),
    StructField("district", StringType, nullable = true)))

  /** Dimension: items (reference: src/main.rs:48). */
  val itemsRaw: StructType = StructType(Seq(
    StructField("item_code", LongType, nullable = true),
    StructField("item", StringType, nullable = true),
    StructField("unit", StringType, nullable = true),
    StructField("item_group", StringType, nullable = true),
    StructField("item_category", StringType, nullable = true)))

  // -- Cleaned (engine-internal) schemas --------------------------------

  val prices: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("premise_code", LongType, nullable = false),
    StructField("item_code", LongType, nullable = false),
    StructField("price", DoubleType, nullable = false)))

  val premises: StructType = StructType(Seq(
    StructField("premise_code", LongType, nullable = false),
    StructField("premise", StringType, nullable = false),
    StructField("address", StringType, nullable = false),
    StructField("premise_type", StringType, nullable = false),
    StructField("state", StringType, nullable = false),
    StructField("district", StringType, nullable = false)))

  val items: StructType = StructType(Seq(
    StructField("item_code", LongType, nullable = false),
    StructField("item", StringType, nullable = false),
    StructField("unit", StringType, nullable = false),
    StructField("item_group", StringType, nullable = false),
    StructField("item_category", StringType, nullable = false)))
}

/** Typed row models for Dataset[T] paths where compile-time field checks
  * help (tests, streaming state logic). DataFrame is used where the
  * schema is dynamic. */
object Rows {
  case class Price(date: java.sql.Date, premise_code: Long,
                   item_code: Long, price: Double)
  case class Premise(premise_code: Long, premise: String, address: String,
                     premise_type: String, state: String, district: String)
  case class Item(item_code: Long, item: String, unit: String,
                  item_group: String, item_category: String)
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
}
