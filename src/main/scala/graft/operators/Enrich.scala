package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Star-schema enrichment join (SURVEY.md §2.3).
  *
  * The reference never executes this join — it only *prepares* it by
  * co-locating fact + dimensions with join-key indexes in one SQLite file
  * (reference: src/main.rs:194-206; README.md:6 states the merge is the
  * tool's purpose). The implied consumer query is fact ⋈ dim ⋈ dim.
  *
  * Scale design: dimensions are small (≈4k premises / ≈700 items in the
  * real dataset; `part`/`supplier` here) while the fact table is the
  * 100 TB side — so both joins MUST be broadcast-hash joins. We hint
  * `broadcast()` explicitly rather than rely on the 10 MB autoBroadcast
  * threshold: at production scale, dimension stats may be missing or the
  * frame may sit behind a transform that defeats size estimation, and a
  * silent fallback to sort-merge would shuffle the entire fact table
  * twice. Broadcast keeps the fact side's partitioning untouched — zero
  * shuffles end to end.
  */
object Enrich {

  /** fact ⋈ items ⋈ premises on their natural keys. */
  def enrich(fact: DataFrame, items: DataFrame, premises: DataFrame,
             itemKey: String = "item_code",
             premiseKey: String = "premise_code"): DataFrame =
    fact
      .join(broadcast(items), itemKey)
      .join(broadcast(premises), premiseKey)
}
