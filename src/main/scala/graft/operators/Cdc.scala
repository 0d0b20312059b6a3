package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC / changeset apply — the incremental-maintenance primitive the
  * reference's "rebuild the whole SQLite file every month" pipeline
  * (reference: src/main.rs:248-287 re-inserts every row) never needed,
  * and the first thing a 100 TB lake does need: applying a (small)
  * day's worth of inserts/updates/deletes to a (huge) snapshot without
  * rewriting unrelated data is the core of Delta/Iceberg MERGE; here it
  * is the engine-level join form of that statement.
  *
  * Semantics (strict CDC apply, one change per key — dedup upstream
  * with [[Dedup.latestPerGroup]] when the feed carries multiples):
  *   - snapshot row, no change       → kept as-is
  *   - 'U' on existing key           → kept with updated payload
  *   - 'D' on existing key           → dropped
  *   - 'I'                           → appended (caller guarantees the
  *                                     key is new; assert upstream with
  *                                     [[Quality.assertUnique]] over the
  *                                     union when that matters)
  *   - 'U'/'D' on missing key        → ignored (update-only semantics;
  *                                     upsert = route those to 'I')
  *
  * Scale shape: ONE equi-join snapshot ⋈ changes on the key — broadcast
  * when the changeset is small (the normal CDC regime: a day's changes
  * vs years of snapshot), shuffle otherwise, AQE decides; inserts ride
  * in as a union, no second pass over the snapshot. The snapshot is
  * never re-partitioned for the union (union is partition-wise).
  */
object Cdc {

  /** Apply `changes(keyCol, opCol, payload...)` to `snapshot`.
    * `updates` maps snapshot column → replacement expression over the
    * joined row (only for 'U' rows); insert rows are built by
    * `insertSelect` over the 'I' changes. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   key: String, opCol: String,
                   updates: Map[String, org.apache.spark.sql.Column],
                   insertSelect: DataFrame => DataFrame): DataFrame = {
    val mut = changes.filter(col(opCol) =!= "I")
    val joined = snapshot.join(mut, Seq(key), "left")
      .filter(col(opCol).isNull || col(opCol) === "U")
    val updated = snapshot.columns.foldLeft(joined) { (df, c) =>
      updates.get(c) match {
        case Some(repl) => df.withColumn(c,
          when(col(opCol) === "U", repl).otherwise(col(c)))
        case None => df
      }
    }.select(snapshot.columns.map(col).toSeq: _*)
    updated.unionByName(insertSelect(changes.filter(col(opCol) === "I")))
  }
}
