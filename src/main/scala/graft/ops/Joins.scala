package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal joins Spark's built-in operators don't express directly:
  * AS-OF ("the most recent right row at or before each left row's time")
  * and interval RANGE ("every right interval containing the left time").
  * Both are pipeline staples — attach the reference rate / model version /
  * last purchase in effect at event time; tag events with the promo or
  * incident window they landed in.
  *
  * Scale shapes (the reason these exist instead of a theta-join):
  *  - A naive `left JOIN right ON key = key AND lt >= rt` + window-max
  *    explodes every left row by its FULL key history before discarding
  *    all but one match. [[asofJoin]] instead UNIONs the two sides and
  *    takes one running `last()` over (key, time) — exactly one exchange
  *    of (left + right) on the key, one sort, zero row amplification:
  *    the sort-merge as-of. (DuckDB/Pandas expose the same operator as
  *    `ASOF JOIN` / `merge_asof`; this is its shuffle-native form.)
  *  - A keyless `lt BETWEEN start AND end` theta-join plans as a
  *    BroadcastNestedLoopJoin — O(|L|·|R|) compares and a broadcast of a
  *    whole side. [[rangeJoinBucketed]] quantizes time into fixed-width
  *    buckets so containment becomes an EQUI-join on the bucket id
  *    (+ the optional key), hash-partitioned like any other join; the
  *    exact predicate then prunes the superset. Explosion factor =
  *    interval length / bucketWidth, so pick bucketWidth on the order of
  *    the longest interval (factor stays ~1-2×).
  */
object Joins {

  private def requireCols(df: DataFrame, cols: Seq[String], side: String): Unit =
    cols.foreach(c => require(df.columns.contains(c),
      s"Joins: no column '$c' on the $side side (have: ${df.columns.mkString(", ")})"))

  private def orderable(t: DataType): Boolean = t match {
    case _: NumericType | TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  private def isTimestamp(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  /** Time column as seconds on a double axis (NTZ casts through the session
    * TZ consistently for BOTH sides, so differences are TZ-invariant). */
  private def secsOf(t: DataType, c: Column): Column =
    if (isTimestamp(t)) unix_micros(c.cast(TimestampType)).cast(DoubleType) / lit(1e6)
    else c.cast(DoubleType)

  /** AS-OF join: for every left row, the single most recent right row with
    * the same key whose time is ≤ the left time (`inclusive = false` for
    * strictly before). Left rows with no qualifying right row keep null
    * right columns (left-join semantics); null left key or time never
    * matches. Output = all left columns + `rightCols` (names must not
    * collide with left's).
    *
    * The right side must be UNIQUE per (key, time) for the match to be
    * well-defined — pass `tieBreak = Some(idCol)` to pre-reduce duplicates
    * to the max-`idCol` row per (key, time) (one partial-agg'd groupBy;
    * `idCol` should be unique per (key, time) or the reduction itself is
    * tie-ambiguous).
    *
    * `toleranceSec`: discard matches older than this many seconds (for
    * timestamp times) / units (for numeric times) before the left time —
    * "the last heartbeat, but only if fresher than 5 minutes".
    *
    * Scale: one exchange of (left + right) hash-partitioned on the key +
    * one sort — the same cost as a sort-merge equi-join of the two sides.
    * No row amplification at any history depth. A pathologically hot key
    * serializes its partition's sort (as-of needs the full per-key time
    * order; salting would split the history) — bound it upstream or
    * pre-filter the right side's history depth. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String],
      inclusive: Boolean = true,
      tieBreak: Option[String] = None,
      toleranceSec: Option[Double] = None): DataFrame = {
    requireCols(left, Seq(leftKey, leftTime), "left")
    requireCols(right, Seq(rightKey, rightTime) ++ rightCols ++ tieBreak, "right")
    require(rightCols.nonEmpty, "Joins.asofJoin: rightCols must be non-empty")
    require(rightCols.distinct.size == rightCols.size,
      s"Joins.asofJoin: duplicate rightCols in $rightCols")
    val collisions = rightCols.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"Joins.asofJoin: rightCols ${collisions.mkString(", ")} collide with left columns — alias them on the right first")
    val lkT = left.schema(leftKey).dataType
    val rkT = right.schema(rightKey).dataType
    require(lkT == rkT, s"Joins.asofJoin: key types differ ($leftKey: ${lkT.typeName} vs $rightKey: ${rkT.typeName})")
    val ltT = left.schema(leftTime).dataType
    val rtT = right.schema(rightTime).dataType
    require(ltT == rtT && orderable(ltT),
      s"Joins.asofJoin: time columns must share one orderable type, got ${ltT.typeName} vs ${rtT.typeName}")
    toleranceSec.foreach { t =>
      require(t >= 0, s"Joins.asofJoin: toleranceSec must be >= 0, got $t")
      require(ltT != DateType,
        "Joins.asofJoin: toleranceSec needs timestamp or numeric times, not date")
    }

    // right side: non-null (key, time) only — null key/time rows can never
    // be "the most recent at" anything, and dropping them up front keeps
    // null-keyed LEFT rows correct for free (their window partition then
    // contains no right rows at all)
    val r0 = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
    val r1 = tieBreak match {
      case Some(tb) =>
        r0.groupBy(col(rightKey), col(rightTime))
          .agg(max_by(struct(rightCols.map(col): _*), col(tb)).as("__p"))
          .select(col(rightKey), col(rightTime), col("__p.*"))
      case None => r0
    }
    val payload = struct(col(rightTime).as("__rt") +: rightCols.map(col): _*)
    val payloadT = r1.select(payload).schema.head.dataType
    val leftT = left.select(struct(left.columns.map(col): _*)).schema.head.dataType
    // side ordering at EQUAL time decides inclusivity: the window's frame is
    // "everything up to and including me", so a right row sorted BEFORE the
    // left row at the same timestamp is visible (inclusive), sorted after is
    // not (strict)
    val rightSide = if (inclusive) 0 else 2
    val lRows = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(payloadT).as("__r"))
    val rRows = r1.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(rightSide).as("__side"),
      lit(null).cast(leftT).as("__l"), payload.as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null left TIME rows sort nulls-first: before every right row, so they
    // match nothing — the semantics we want, with no special-casing
    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)
    val matched = toleranceSec match {
      case Some(tol) =>
        val age = secsOf(ltT, col("__t")) - secsOf(ltT, col("__m.__rt"))
        when(col("__m").isNotNull && age <= tol, col("__m"))
      case None => col("__m")
    }
    lRows.unionByName(rRows)
      .withColumn("__m", matchedRaw)
      .filter(col("__side") === 1)
      .withColumn("__m", matched)
      .select(col("__l.*") +: rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Interval RANGE join: every (left row, right interval) pair with
    * `start <= t < end` (half-open) and, when `keyCols` is set, equal keys.
    * Inner-join semantics: a left row inside N intervals yields N rows;
    * rows/intervals with null time bounds (or empty/inverted intervals)
    * match nothing. Output = all left columns + `rightCols`.
    *
    * `bucketWidth`: the time-quantization width — SECONDS for timestamp
    * columns, same-unit for numeric ones. Each interval is exploded to the
    * bucket ids it touches and the join becomes an equi-join on the bucket
    * (+ key); choose it on the order of the longest interval so the
    * explosion factor stays small. Exact integer bucket math (epoch micros
    * / floor division via pmod) — no double rounding at boundaries. */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame,
      leftTime: String, rightStart: String, rightEnd: String,
      rightCols: Seq[String], bucketWidth: Double,
      keyCols: Option[(String, String)] = None): DataFrame = {
    requireCols(left, leftTime +: keyCols.map(_._1).toSeq, "left")
    requireCols(right, Seq(rightStart, rightEnd) ++ rightCols ++ keyCols.map(_._2), "right")
    require(rightCols.nonEmpty, "Joins.rangeJoinBucketed: rightCols must be non-empty")
    require(bucketWidth > 0, s"Joins.rangeJoinBucketed: bucketWidth must be > 0, got $bucketWidth")
    val collisions = rightCols.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"Joins.rangeJoinBucketed: rightCols ${collisions.mkString(", ")} collide with left columns — alias them on the right first")
    val tT = left.schema(leftTime).dataType
    require(right.schema(rightStart).dataType == tT && right.schema(rightEnd).dataType == tT,
      s"Joins.rangeJoinBucketed: time columns must all be ${tT.typeName}")
    require(orderable(tT) && tT != DateType,
      s"Joins.rangeJoinBucketed: time must be timestamp or numeric, got ${tT.typeName}")
    val tsAxis = isTimestamp(tT)
    keyCols.foreach { case (lk, rk) =>
      require(left.schema(lk).dataType == right.schema(rk).dataType,
        s"Joins.rangeJoinBucketed: key types differ ($lk vs $rk)")
    }

    // exact integer bucketing: timestamps via epoch micros, numerics via
    // floor(x / width) in integer math (pmod keeps negatives correct)
    val widthL: Column =
      if (tsAxis) lit(math.round(bucketWidth * 1e6))
      else lit(math.max(1L, math.round(bucketWidth)))
    def ticks(c: Column): Column =
      if (tsAxis) unix_micros(c.cast(TimestampType)) else c.cast(LongType)
    def bucketOf(c: Column): Column = {
      val t = ticks(c)
      ((t - pmod(t, widthL)) / widthL).cast(LongType)
    }

    val keyedL = keyCols.map { case (lk, _) => col(lk).as("__jk") }.toSeq
    val keyedR = keyCols.map { case (_, rk) => col(rk).as("__jk") }.toSeq
    val l = left
      .filter(col(leftTime).isNotNull && keyCols.map(k => col(k._1).isNotNull).getOrElse(lit(true)))
      .select(struct(left.columns.map(col): _*).as("__l") +:
        bucketOf(col(leftTime)).as("__b") +: col(leftTime).as("__t") +: keyedL: _*)
    val r = right
      .filter(col(rightStart).isNotNull && col(rightEnd).isNotNull &&
        col(rightStart) < col(rightEnd) &&
        keyCols.map(k => col(k._2).isNotNull).getOrElse(lit(true)))
      .select(struct(rightCols.map(col): _*).as("__p") +:
        col(rightStart).as("__s") +: col(rightEnd).as("__e") +:
        explode(sequence(bucketOf(col(rightStart)), bucketOf(col(rightEnd)))).as("__b") +:
        keyedR: _*)
    val joinKeys = "__b" +: keyCols.map(_ => "__jk").toSeq
    l.join(r, joinKeys)
      .filter(col("__t") >= col("__s") && col("__t") < col("__e"))
      .select(col("__l.*") +: rightCols.map(c => col(s"__p.$c").as(c)): _*)
  }
}
