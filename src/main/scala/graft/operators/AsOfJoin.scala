package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, attach the most recent right row
  * with the same key and right_time <= left_time (backward), or the
  * earliest with right_time >= left_time (forward).
  *
  * Spark has no ASOF JOIN operator; the naive composition
  * (range-condition join + max-per-group) explodes to |matches per key
  * before t| rows per left row. This implementation is the scalable
  * union trick used by time-series engines:
  *
  *   1. union both sides into one frame (left rows carry their output
  *      payload; right rows carry their time, which is what gets
  *      matched — extendable to full right payloads via a struct),
  *   2. one hash shuffle + per-partition sort on (key, time, side) —
  *      right rows sort BEFORE left rows at equal time so `<=`
  *      semantics hold,
  *   3. `last(payload, ignoreNulls).over(unboundedPreceding..current)`
  *      carries the latest right payload forward,
  *   4. keep left rows.
  *
  * Cost: exactly one shuffle of |L|+|R| slim rows and one sort — the
  * same plan shape as a window dedup, independent of match fan-out.
  * (Preference order per the build rules: this is "(a) compose existing
  * ops" — no custom SparkPlan needed because the composition is already
  * optimal.)
  */
object AsOfJoin {

  /** Returns `leftCols` of each matched left row plus the matched right
    * time as `asOfOut`, and — when `rightCols` is non-empty — the
    * matched right row's columns. Left rows with no eligible right row
    * are dropped (inner semantics); null keys never match (equi-join
    * semantics — window partitioning would otherwise group nulls
    * together).
    *
    * Tie semantics: among right rows sharing the greatest eligible
    * time, the one with the LARGEST (rightCols...) tuple wins — the
    * carried struct is the final window sort key, so the order is total
    * whenever tied right rows differ in any carried column (identical
    * rows are interchangeable). Callers needing a different rule should
    * pre-dedup the right side to one row per (key, time).
    *
    * @param leftCols  columns of `left` to carry into the output
    * @param asOfOut   output column name for the matched right time
    * @param rightCols right columns to carry alongside the match */
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   leftCols: Seq[String],
                   asOfOut: String = "asof_time",
                   rightCols: Seq[String] = Nil): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      leftCols, asOfOut, rightCols, forward = false)

  /** Forward as-of: for each left row, the EARLIEST right row with the
    * same key and right_time >= left_time (the mirror of
    * [[asofBackward]]; same plan, the union is just walked in
    * descending time so the carried right row is the smallest eligible
    * time). Matches DuckDB `ASOF JOIN ... ON r.t >= l.t`. */
  def asofForward(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTime: String, rightTime: String,
                  leftCols: Seq[String],
                  asOfOut: String = "asof_time",
                  rightCols: Seq[String] = Nil): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      leftCols, asOfOut, rightCols, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       leftCols: Seq[String],
                       asOfOut: String,
                       rightCols: Seq[String],
                       forward: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType, TimestampType}
    // right columns are re-attached with withColumn, which OVERWRITES on
    // name collision — fail loudly instead of silently clobbering the
    // left payload (or the as-of output column)
    val clash = rightCols.intersect(leftCols :+ asOfOut)
    require(clash.isEmpty,
      s"rightCols ${clash.mkString(", ")} collide with leftCols/asOfOut — " +
        "alias the right side before the as-of join")
    val l0 = left.filter(col(leftKey).isNotNull)
    val lPayloadType = StructType(leftCols.map(c => l0.schema(c)))
    val rStructType = StructType(
      StructField("__rt0", TimestampType) +: rightCols.map(c => right.schema(c)))

    val r = right.filter(col(rightKey).isNotNull).select(
      col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      struct((col(rightTime).cast("timestamp").as("__rt0") +:
        rightCols.map(col)): _*).as("__r"),
      lit(null).cast(lPayloadType).as("__payload"))
    val l = l0.select(
      col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
      lit(1).as("__side"), lit(null).cast(rStructType).as("__r"),
      struct(leftCols.map(col): _*).as("__payload"))

    // right before left at equal time (inclusive bound semantics); __r
    // last so the order is total across right rows tied on (key, time);
    // forward walks descending time, so the carried right row is the
    // smallest time >= left time
    val tOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy(tOrder, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__c").isNotNull)
      .withColumn(asOfOut, col("__c.__rt0"))

    val withLeft = leftCols.foldLeft(carried)((d, c) =>
      d.withColumn(c, col(s"__payload.$c")))
    val withRight = rightCols.foldLeft(withLeft)((d, c) =>
      d.withColumn(c, col(s"__c.$c")))
    withRight.select(
      (leftCols.map(col) :+ col(asOfOut)) ++ rightCols.map(col): _*)
  }
}
