package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for: backward as-of join and
  * range (interval-containment) join. Both are expressed by composition so
  * Catalyst keeps whole-stage codegen and AQE in play — preference (a) of
  * the custom-operator ladder; no custom SparkPlan is needed because the
  * semantics decompose exactly onto window aggregation / equi-join.
  *
  * Scale notes (the reason these shapes and not the obvious ones):
  *  - A naive as-of join is a non-equi theta join -> BroadcastNestedLoopJoin,
  *    quadratic per key. The union-and-window form below is ONE hash shuffle
  *    on the key plus one sort; the running `last(mark)` is an incremental
  *    frame, so each partition streams in O(n) with O(1) state.
  *  - A naive range join is a cartesian filtered after the fact. Bucketing
  *    time into fixed-width buckets turns it into an equi-join on the bucket
  *    id; each range replicates to ceil(len/width)+1 buckets, so with
  *    width >= max range length the blow-up factor is at most 2.
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, attach the single most recent
    * right row with the same `keys` whose `rightTime` <= the left row's
    * `leftTime` (ties at the same instant DO match, like DuckDB/kdb ASOF
    * semantics). Left rows with no earlier right row keep null payloads
    * (LEFT semantics).
    *
    * Mechanics: right rows enter the union carrying their payload in a
    * non-null struct; a running `last(payload, ignoreNulls)` over
    * (keys ORDER BY time, side) — right rows sorting before left rows at
    * equal time — hands each left row its match. The struct keeps an
    * all-null right payload distinct from "no match".
    *
    * Requirements: `right` must be unique per (keys, rightTime) — pre-
    * aggregate if not, or the winner among equal-time rows is undefined;
    * `leftTime` and `rightTime` must be the same (orderable) type.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String): DataFrame = {
    val reserved = Seq("__t", "__side", "__mark", "__m")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"column names ${reserved.mkString("/")} are reserved by asofBackward")
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val clash = payloadCols.toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"right payload columns collide with left columns (rename first): $clash")
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        struct(payloadCols.map(col): _*).as("__mark")): _*)
    val markType = rTagged.schema("__mark").dataType
    val lTagged = left.select(
      left.columns.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(markType).as("__mark")): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__m", last(col("__mark"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Forward as-of join: for every left row, attach the single EARLIEST
    * right row with the same `keys` whose `rightTime` >= the left row's
    * `leftTime` (ties at the same instant DO match — DuckDB `ASOF ... ON
    * l.t <= r.t` semantics). The event-study direction: "the next
    * observation at or after this event", where [[asofBackward]] answers
    * "the latest observation at or before it".
    *
    * Mechanics mirror the backward form with the frame reversed: right
    * rows sort AFTER left rows at equal time (so the current-row frame
    * edge still sees a same-instant right), and a running
    * `first(payload, ignoreNulls)` over (keys ORDER BY time, side)
    * ROWS CURRENT..UNBOUNDED FOLLOWING hands each left row its match —
    * same single hash shuffle + one sort, O(n) per partition.
    *
    * Same requirements as asofBackward: `right` unique per
    * (keys, rightTime); time columns of one orderable type. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String): DataFrame = {
    val reserved = Seq("__t", "__side", "__mark", "__m")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"column names ${reserved.mkString("/")} are reserved by asofForward")
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val clash = payloadCols.toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"right payload columns collide with left columns (rename first): $clash")
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(1).as("__side"),
        struct(payloadCols.map(col): _*).as("__mark")): _*)
    val markType = rTagged.schema("__mark").dataType
    val lTagged = left.select(
      left.columns.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(0).as("__side"),
        lit(null).cast(markType).as("__mark")): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__m", first(col("__mark"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Nearest as-of join: for every left row, attach the right row with the
    * same `keys` whose `rightTime` is CLOSEST to the left row's `leftTime`
    * in either direction (pandas `merge_asof(direction='nearest')`). Ties
    * in distance resolve to the BACKWARD (at-or-before) match —
    * deterministic, and the convention that favors information already
    * known at event time. An optional `tolerance` (in the units of
    * `timeToLong`) discards matches farther than the bound, leaving null
    * payloads; `timeToLong` maps the time columns to a numeric axis
    * (default `cast("long")`; pass `unix_date` for DATE columns).
    *
    * Mechanics — ONE hash exchange, not two: both direction passes ride a
    * single union. Each side carries two tie-break columns (`__sb`: right
    * sorts before left at equal time, for the backward running `last`;
    * `__sf`: right sorts after left, for the forward running `first`), and
    * the two window specs share the `keys` hash partitioning, so Catalyst
    * plans one Exchange and two in-partition sorts. Composing
    * [[asofBackward]] + [[asofForward]] would shuffle the (growing) left
    * side twice; at 100 TB the second exchange is the bottleneck, the
    * second sort is not.
    *
    * Same requirements as asofBackward: `right` unique per
    * (keys, rightTime); time columns of one orderable type. */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  tolerance: Option[Long] = None,
                  timeToLong: Column => Column = _.cast("long")): DataFrame = {
    val reserved = Seq("__t", "__sb", "__sf", "__mark", "__mb", "__mf")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"column names ${reserved.mkString("/")} are reserved by asofNearest")
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val clash = payloadCols.toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"right payload columns collide with left columns (rename first): $clash")
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__sb"), lit(1).as("__sf"),
        struct(payloadCols.map(col): _*).as("__mark")): _*)
    val markType = rTagged.schema("__mark").dataType
    val lTagged = left.select(
      left.columns.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__sb"), lit(0).as("__sf"),
        lit(null).cast(markType).as("__mark")): _*)
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__sb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__sf"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__mb", last(col("__mark"), ignoreNulls = true).over(wb))
      .withColumn("__mf", first(col("__mark"), ignoreNulls = true).over(wf))
      .filter(col("__sb") === 1)
    val lt = timeToLong(col("__t"))
    val db0 = lt - timeToLong(col("__mb").getField(rightTime))
    val df0 = timeToLong(col("__mf").getField(rightTime)) - lt
    val db = tolerance.fold(db0)(t => when(db0 <= t, db0))
    val df = tolerance.fold(df0)(t => when(df0 <= t, df0))
    val useBack = db.isNotNull && (df.isNull || db <= df)
    matched.select(left.columns.map(col) ++ payloadCols.map { c =>
      when(useBack, col("__mb").getField(c))
        .when(df.isNotNull, col("__mf").getField(c)).as(c)
    }: _*)
  }

  /** `asofBackward` with a match-staleness bound: a matched right row older
    * than `maxAgeDays` (relative to the left row's date) is discarded — its
    * payload columns become null, as if no match existed. Time columns must
    * be DATEs. The standard "don't join yesterday's quote to a bar from two
    * years later" guard. */
  def asofBackwardMaxAge(left: DataFrame, right: DataFrame, keys: Seq[String],
                         leftTime: String, rightTime: String,
                         maxAgeDays: Int): DataFrame = {
    val joined = asofBackward(left, right, keys, leftTime, rightTime)
    val fresh = datediff(col(leftTime), col(rightTime)) <= maxAgeDays
    val payloadCols = right.columns.filterNot(keys.contains)
    payloadCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(fresh, col(c)))
    }
  }

  /** Range join: every (point, range) pair with the same join keys and
    * `rangeStart <= pointTs < rangeEnd` (half-open interval). All three
    * time expressions must be castable to LONG on a shared epoch (days,
    * seconds — caller's choice, e.g. `unix_date`).
    *
    * `bucketWidth` is the equi-join granularity: pick it at or above the
    * maximum range length so each range lands in at most 2 buckets. Empty
    * and inverted ranges (end <= start) are dropped. `keys` are
    * (pointColumn, rangeColumn) equality pairs; the two sides' column names
    * must be disjoint (rename before calling, as with any self-join).
    */
  def rangeJoinBucketed(points: DataFrame, pointTs: Column,
                        ranges: DataFrame, rangeStart: Column, rangeEnd: Column,
                        bucketWidth: Long,
                        keys: Seq[(Column, Column)] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = points.columns.toSet intersect ranges.columns.toSet
    require(overlap.isEmpty,
      s"point/range column names must be disjoint (rename before joining): $overlap")
    val p = points
      .withColumn("__pt", pointTs.cast("long"))
      .withColumn("__pb", floor(col("__pt") / bucketWidth))
    val r = ranges
      .withColumn("__rs", rangeStart.cast("long"))
      .withColumn("__re", rangeEnd.cast("long"))
      .filter(col("__re") > col("__rs"))
      .withColumn("__rb", explode(sequence(
        floor(col("__rs") / bucketWidth),
        floor((col("__re") - 1) / bucketWidth))))
    val cond = keys.foldLeft(col("__pb") === col("__rb")) {
      case (acc, (pk, rk)) => acc && pk === rk
    }
    p.join(r, cond)
      .filter(col("__pt") >= col("__rs") && col("__pt") < col("__re"))
      .drop("__pt", "__pb", "__rs", "__re", "__rb")
  }
}
