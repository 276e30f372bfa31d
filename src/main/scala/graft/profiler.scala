package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling + automatic constraint suggestion — the "where do the
  * bounds COME from" half of a validation engine (the reference assumes a
  * hand-written schema; production data-quality systems derive a first
  * suite from the data and let humans tighten it — the published
  * profile→suggest loop of Deequ / Great Expectations, re-expressed as
  * Spark aggregations).
  *
  * Two profile forms:
  *  - [[Profiler.profile]] — EXACT: per-column null counts, exact distinct
  *    counts, fixed-point (cents) numeric min/max, string length bounds.
  *    Exact multi-column distinct counts expand the scan (Spark plans one
  *    Expand projection per distinct aggregate), so this is the
  *    oracle-checkable form for bounded column sets.
  *  - [[Profiler.profileApprox]] — the 10^12-row path: identical shape with
  *    `approx_count_distinct` (HLL++, fixed-size sketch state), ONE pass,
  *    no Expand. Same min/max/null arithmetic (those are exact either way).
  *
  * All numeric bounds are reported in cents (×100, rounded, long) so the
  * profile row is integer-exact — the repo-wide fixed-point convention that
  * makes float-summation ambiguity impossible in oracle comparisons.
  */
object Profiler {

  private def cents(c: Column): Column = round(c * 100).cast(LongType)
  private val nullLong = lit(null).cast(LongType)

  /** Columns the profiler knows how to bound. Anything else (arrays, maps,
    * structs, binary) still gets n/nulls/distinct — bounds are null. */
  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  private[graft] def profileCols(df: DataFrame, columns: Seq[String]): Seq[String] = {
    val want = if (columns.nonEmpty) columns else df.columns.toSeq
    want.foreach { c =>
      require(df.columns.contains(c), s"profile: no such column '$c'")
    }
    want
  }

  /** Exact profile, one row per column:
    * (col_name, dtype, n, nulls, n_distinct, min_c, max_c, min_len, max_len).
    * Internally also carries raw (non-cents) numeric min/max for
    * [[Suggest]] — dropped from the public frame so the oracle surface
    * stays integer-only. Timestamps are bounded in epoch MICROS (exact). */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame =
    profileRaw(df, columns).drop("min_raw", "max_raw")

  /** Approximate-distinct profile: same shape/columns as [[profile]], with
    * `n_distinct` from HLL++ (`rsd` default 5%). One pass, no Expand — the
    * form a 10^12-row profiling job runs. */
  def profileApprox(df: DataFrame, columns: Seq[String] = Nil, rsd: Double = 0.05): DataFrame =
    assemble(df, profileCols(df, columns),
      c => approx_count_distinct(col(c), rsd)).drop("min_raw", "max_raw")

  /** Per-GROUP exact profile (the grouped-metrics form: one profile row per
    * (group value, column) — null group values are a group): same shape as
    * [[profile]] with the group column prepended. Distribution drift that a
    * whole-table profile averages away (one source going null-heavy) is
    * visible per group. Same Expand cost note as [[profile]]. */
  def profileBy(df: DataFrame, groupCol: String, columns: Seq[String] = Nil): DataFrame =
    assemble(df, groupedCols(df, groupCol, columns), c => countDistinct(col(c)),
      groupBy = Some(groupCol)).drop("min_raw", "max_raw")

  /** Per-group HLL profile — grouped, one pass, no Expand. */
  def profileApproxBy(df: DataFrame, groupCol: String, columns: Seq[String] = Nil,
      rsd: Double = 0.05): DataFrame =
    assemble(df, groupedCols(df, groupCol, columns),
      c => approx_count_distinct(col(c), rsd), groupBy = Some(groupCol))
      .drop("min_raw", "max_raw")

  private def groupedCols(df: DataFrame, groupCol: String, columns: Seq[String]): Seq[String] = {
    require(df.columns.contains(groupCol), s"profileBy: no such group column '$groupCol'")
    val want = if (columns.nonEmpty) columns
      else df.columns.toSeq.filterNot(_ == groupCol)
    require(!want.contains(groupCol), s"profileBy: cannot profile the group column '$groupCol'")
    profileCols(df, want)
  }

  private[graft] def profileRaw(df: DataFrame, columns: Seq[String] = Nil): DataFrame =
    assemble(df, profileCols(df, columns), c => countDistinct(col(c)))

  /** EXACT discrete quantiles, one row per (col_name, q_pct):
    * (col_name, dtype, q_pct, value_c). The value is the SQL-standard
    * `percentile_disc` — the smallest actual column value whose cumulative
    * distribution reaches q — so the result is always an element of the
    * column (never an interpolated float), reported in the repo's integer
    * conventions: cents for numerics, epoch MICROS for timestamps. Exactness
    * note: Spark surfaces the discrete percentile as a double; the cast back
    * to long is exact while |value| < 2^53, which cents/micros of any
    * real-world measure satisfy. Nulls are excluded (profile rows already
    * count them).
    *
    * Scale: Spark's exact percentile state is a per-partition value→count
    * map, so memory is O(column distinct count) per aggregation buffer. For
    * columns whose distinct count is unbounded at 10^12 rows, use
    * [[profileQuantilesApprox]] (fixed-size sketch, one pass). */
  def profileQuantiles(df: DataFrame, columns: Seq[String] = Nil,
      qPcts: Seq[Int] = Seq(25, 50, 75, 95)): DataFrame =
    assembleQuantiles(df, quantileCols(df, columns), checkPcts(qPcts), None)

  /** Per-GROUP exact discrete quantiles — [[profileQuantiles]] with the
    * group column prepended (null group values are a group): the form that
    * sees a single source's length distribution collapse while the corpus
    * median holds. */
  def profileQuantilesBy(df: DataFrame, groupCol: String, columns: Seq[String] = Nil,
      qPcts: Seq[Int] = Seq(25, 50, 75, 95)): DataFrame =
    assembleQuantiles(df, quantileCols(df, columns, exclude = Some(groupCol)),
      checkPcts(qPcts), Some(groupCol))

  /** Approximate-quantile twin (Greenwald-Khanna sketch via
    * `approx_percentile`): same output shape as [[profileQuantiles]], fixed
    * sketch memory regardless of distinct count — the 10^12-row form.
    * `accuracy` is the GK inverse-epsilon (10000 ⇒ rank error ≤ n/10000).
    * Returned values are still actual column elements, but the SELECTED
    * element may sit up to epsilon ranks off the exact discrete quantile —
    * use the exact form when the number feeds a semantic decision. */
  def profileQuantilesApprox(df: DataFrame, columns: Seq[String] = Nil,
      qPcts: Seq[Int] = Seq(25, 50, 75, 95), accuracy: Int = 10000): DataFrame = {
    val cols = quantileCols(df, columns)
    val pcts = checkPcts(qPcts)
    val schema = df.schema
    val qsArr = array(pcts.map(p => lit(p / 100.0)): _*)
    val aggs = cols.map { c =>
      percentile_approx(fixedPoint(schema(c).dataType, c), qsArr, lit(accuracy))
        .as(s"__q_$c")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.flatMap { c =>
      pcts.zipWithIndex.map { case (p, i) =>
        struct(lit(c).as("col_name"), lit(schema(c).dataType.typeName).as("dtype"),
          lit(p.toLong).as("q_pct"),
          col(s"__q_$c").getItem(i).cast(LongType).as("value_c"))
      }
    }
    one.select(explode(array(rows: _*)).as("q")).select("q.*")
  }

  private def checkPcts(qPcts: Seq[Int]): Seq[Int] = {
    require(qPcts.nonEmpty, "profileQuantiles: need at least one percentile")
    qPcts.foreach(p => require(p >= 0 && p <= 100,
      s"profileQuantiles: percentile must be in [0,100], got $p"))
    require(qPcts.distinct.size == qPcts.size,
      s"profileQuantiles: duplicate percentiles in $qPcts")
    qPcts
  }

  /** Quantile-bearing columns: numerics and timestamps only (a discrete
    * quantile of a string has no integer form). */
  private def quantileCols(df: DataFrame, columns: Seq[String],
      exclude: Option[String] = None): Seq[String] = {
    exclude.foreach { g =>
      require(df.columns.contains(g), s"profileQuantilesBy: no such group column '$g'")
      require(!columns.contains(g),
        s"profileQuantilesBy: cannot profile the group column '$g'")
    }
    val want0 = if (columns.nonEmpty) columns
      else df.columns.toSeq.filter { c =>
        val dt = df.schema(c).dataType
        (isNumeric(dt) || dt == TimestampType) && !exclude.contains(c)
      }
    want0.foreach { c =>
      require(df.columns.contains(c), s"profileQuantiles: no such column '$c'")
      val dt = df.schema(c).dataType
      require(isNumeric(dt) || dt == TimestampType,
        s"profileQuantiles: column '$c' is ${dt.typeName}, need numeric or timestamp")
    }
    want0
  }

  /** The column in its integer-exact domain: cents for numerics, epoch
    * micros for timestamps — the same convention as the profile bounds. */
  private def fixedPoint(dt: DataType, c: String): Column = dt match {
    case TimestampType => unix_micros(col(c))
    case _ => cents(col(c))
  }

  private def assembleQuantiles(df: DataFrame, cols: Seq[String], pcts: Seq[Int],
      groupBy: Option[String]): DataFrame = {
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.PercentileDisc
    val schema = df.schema
    // ONE PercentileDisc state per column with an ARRAY percentage (the SQL
    // WITHIN GROUP syntax only parses a scalar, which would build one
    // value->count map PER (column, q) — 4 percentiles would pay the
    // distinct-map memory and sort four times; probed 3.9x slower at 16M
    // rows). All percentiles of a column are picked from one sorted pass.
    val aggs: Seq[Column] = cols.map { c =>
      val pctArr = CreateArray(pcts.map(p => Literal((BigDecimal(p) / 100).toDouble)))
      GraftShim.column(
        PercentileDisc(GraftShim.expression(fixedPoint(schema(c).dataType, c)), pctArr)
          .toAggregateExpression()).as(s"__q_$c")
    }
    val one = groupBy match {
      case None => df.agg(aggs.head, aggs.tail: _*)
      case Some(g) => df.groupBy(col(g)).agg(aggs.head, aggs.tail: _*)
    }
    val rows = cols.flatMap { c =>
      pcts.zipWithIndex.map { case (p, i) =>
        struct(lit(c).as("col_name"), lit(schema(c).dataType.typeName).as("dtype"),
          lit(p.toLong).as("q_pct"),
          col(s"__q_$c").getItem(i).cast(LongType).as("value_c"))
      }
    }
    groupBy match {
      case None => one.select(explode(array(rows: _*)).as("q")).select("q.*")
      case Some(g) =>
        one.select(col(g), explode(array(rows: _*)).as("q")).select(col(g), col("q.*"))
    }
  }

  /** EXACT top-k most frequent values per column, ties broken by value
    * ascending: (col_name, value, cnt, rnk), rnk 1-based. Values are
    * rendered as strings so one frame carries every column type; restrict
    * to string/integral columns when the rendering must be oracle-stable
    * (float formatting differs across engines).
    *
    * Scale shape: ONE scan exploded to (col_name, value) pairs (rows ×
    * |columns|, the Expand analog), a partial-agg'd groupBy count, then the
    * two-phase [[graft.functions.BoundedMinRows]] bounded-heap top-k per
    * column — a column with 10^9 distinct values contributes
    * O(partitions · k) rows to its reducer, never a full per-column sort.
    * Nulls are excluded (the profile already counts them). */
  def topValues(df: DataFrame, columns: Seq[String] = Nil, k: Int = 10): DataFrame = {
    require(k > 0, s"topValues: k must be > 0, got $k")
    val cols = profileCols(df, columns)
    val pairs = df.select(explode(array(cols.map { c =>
      struct(lit(c).as("col_name"), col(c).cast(StringType).as("value"))
    }: _*)).as("p")).select("p.*").filter(col("value").isNotNull)
    val counted = pairs.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    import graft.functions.BoundedMinRows.bounded_min_rows
    counted.groupBy(col("col_name"))
      .agg(bounded_min_rows(
        struct((-col("cnt")).as("neg_cnt"), col("value").as("value")),
        struct(col("value").as("value"), col("cnt").as("cnt")), k).as("top"))
      .select(col("col_name"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("col_name"), col("t.value").as("value"), col("t.cnt").as("cnt"),
        (col("pos") + 1).cast(LongType).as("rnk"))
  }

  /** ONE-PASS approximate top-k frequent values per column via the
    * Misra-Gries summary ([[graft.functions.FreqSketch]]): same output
    * shape as [[topValues]] plus an `err` column — the summary's
    * self-certified maximum undercount (`err == 0` ⇒ the counts are EXACT,
    * guaranteed whenever a column's distinct count stays within
    * `capacity`). Unlike [[topValues]], NO per-value shuffle exists at any
    * scale: each map task ships one ≤`capacity`-counter summary per
    * column, so 10^12 rows move O(tasks · capacity) state instead of every
    * distinct value. Any value with true frequency > `err` is guaranteed
    * reported; sub-threshold survivors are partitioning-dependent once
    * evictions begin (treat them as a candidate set, or re-count exactly).
    * `capacity` defaults to 8·k. */
  def topValuesApprox(df: DataFrame, columns: Seq[String] = Nil, k: Int = 10,
      capacity: Int = -1): DataFrame = {
    require(k > 0, s"topValuesApprox: k must be > 0, got $k")
    val cap = if (capacity == -1) 8 * k else capacity
    require(cap >= k, s"topValuesApprox: capacity must be >= k, got $cap < $k")
    val cols = profileCols(df, columns)
    val pairs = df.select(explode(array(cols.map { c =>
      struct(lit(c).as("col_name"), col(c).cast(StringType).as("value"))
    }: _*)).as("p")).select("p.*").filter(col("value").isNotNull)
    import graft.functions.FreqSketch.freq_sketch
    pairs.groupBy(col("col_name"))
      .agg(freq_sketch(col("value"), cap).as("sk"))
      .select(col("col_name"),
        posexplode(slice(col("sk.items"), 1, k)).as(Seq("pos", "t")),
        col("sk.err").as("err"))
      .select(col("col_name"), col("t.value").as("value"), col("t.cnt").as("cnt"),
        (col("pos") + 1).cast(LongType).as("rnk"), col("err"))
  }

  /** One aggregation (global, or per `groupBy` key) → one row per group;
    * then explode into per-column rows. Struct fields are typed identically
    * across column kinds (nulls cast), so the exploded frame has one stable
    * schema. */
  private def assemble(df: DataFrame, cols: Seq[String],
      distinctAgg: String => Column, groupBy: Option[String] = None): DataFrame = {
    val schema = df.schema
    val aggs: Seq[Column] = cols.flatMap { c =>
      val dt = schema(c).dataType
      val base = Seq(
        sum(col(c).isNull.cast(LongType)).as(s"__nulls_$c"),
        distinctAgg(c).as(s"__nd_$c"))
      dt match {
        case t if isNumeric(t) => base ++ Seq(
          min(cents(col(c))).as(s"__min_$c"),
          max(cents(col(c))).as(s"__max_$c"),
          min(col(c).cast(DoubleType)).as(s"__rmin_$c"),
          max(col(c).cast(DoubleType)).as(s"__rmax_$c"))
        case StringType => base ++ Seq(
          min(length(col(c)).cast(LongType)).as(s"__minl_$c"),
          max(length(col(c)).cast(LongType)).as(s"__maxl_$c"))
        case TimestampType => base ++ Seq(
          min(unix_micros(col(c))).as(s"__min_$c"),
          max(unix_micros(col(c))).as(s"__max_$c"))
        case _ => base
      }
    }
    val one = groupBy match {
      case None => df.agg(count(lit(1)).as("__n"), aggs: _*)
      case Some(g) => df.groupBy(col(g)).agg(count(lit(1)).as("__n"), aggs: _*)
    }
    val rows = cols.map { c =>
      val dt = schema(c).dataType
      val (minC, maxC, rmin, rmax) = dt match {
        case t if isNumeric(t) =>
          (col(s"__min_$c"), col(s"__max_$c"),
            col(s"__rmin_$c"), col(s"__rmax_$c"))
        case TimestampType =>
          (col(s"__min_$c"), col(s"__max_$c"),
            lit(null).cast(DoubleType), lit(null).cast(DoubleType))
        case _ => (nullLong, nullLong,
          lit(null).cast(DoubleType), lit(null).cast(DoubleType))
      }
      val (minL, maxL) = dt match {
        case StringType => (col(s"__minl_$c"), col(s"__maxl_$c"))
        case _ => (nullLong, nullLong)
      }
      struct(
        lit(c).as("col_name"), lit(dt.typeName).as("dtype"),
        col("__n").as("n"), col(s"__nulls_$c").as("nulls"),
        col(s"__nd_$c").as("n_distinct"),
        minC.as("min_c"), maxC.as("max_c"),
        minL.as("min_len"), maxL.as("max_len"),
        rmin.as("min_raw"), rmax.as("max_raw"))
    }
    groupBy match {
      case None => one.select(explode(array(rows: _*)).as("p")).select("p.*")
      case Some(g) =>
        one.select(col(g), explode(array(rows: _*)).as("p")).select(col(g), col("p.*"))
    }
  }
}

/** One suggested rule, in its display form — `bound` strings use the same
  * integer/cents conventions as the profile so the frame is oracle-exact. */
final case class SuggestedRule(col_name: String, rule: String, bound: String)

/** One discovered cross-column ordering: `col_a kind col_b` holds on every
  * complete row — kind ∈ le (≤, some ties), lt (<, no ties), eq (always
  * equal). `n_complete` = rows with both sides non-null, `n_eq` = ties. */
final case class OrderingRule(
    col_a: String, col_b: String, kind: String, n_complete: Long, n_eq: Long)

/** Deterministic rule derivation from an exact profile (no sampling, no
  * RNG): the same input table always yields the same suite. The SUGGESTED
  * suite holds on its own training table BY CONSTRUCTION (bounds are the
  * observed extrema) — `v_suggest_apply` asserts that round trip, and the
  * intended workflow is: suggest on a trusted snapshot, review, then
  * validate every future ingest against the frozen suite.
  */
object Suggest {

  final case class SuggestResult(
      rules: Seq[SuggestedRule],
      rowChecks: Seq[RowConstraint],
      aggChecks: Seq[AggConstraint])

  /** Derive rules for `df`'s columns.
    *
    * Rules, in emission order per column:
    *  - `non_null`  — zero nulls observed → [[NonNull]]
    *  - `unique`    — zero nulls and n_distinct == n → [[Unique]] (salted
    *                  form is the caller's scale decision)
    *  - `enum`      — string column with ≤ `enumMaxK` distinct values →
    *                  [[EnumIn]] over the (sorted) observed set
    *  - `length`    — string column → [[LengthBounds]] at observed extrema
    *  - `range`     — numeric column → [[Range]] at observed extrema (raw
    *                  doubles for the constraint; cents in the display row)
    *
    * The enum value set is fetched per CANDIDATE column only (gated on the
    * profile's exact distinct count), with `limit(enumMaxK + 1)` capping
    * both the shuffle output and the driver collect — a high-cardinality
    * column can never pull its domain to the driver.
    *
    * Exact-distinct caveat at scale: this calls [[Profiler.profileRaw]]
    * (Expand-based exact distincts) because `unique`/`enum` decisions are
    * semantic claims an approximation could flip. A 10^12-row deployment
    * profiles a bounded trusted sample or accepts the Expand cost once.
    */
  def suggest(df: DataFrame, enumMaxK: Int = 8): SuggestResult = {
    require(enumMaxK >= 1, s"enumMaxK must be >= 1, got $enumMaxK")
    val prof = Profiler.profileRaw(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val rules = scala.collection.mutable.ArrayBuffer.empty[SuggestedRule]
    val rowChecks = scala.collection.mutable.ArrayBuffer.empty[RowConstraint]
    val aggChecks = scala.collection.mutable.ArrayBuffer.empty[AggConstraint]
    df.columns.foreach { c =>
      val r = prof(c)
      val dtype = r.getString(1)
      val n = r.getLong(2); val nulls = r.getLong(3); val nd = r.getLong(4)
      val nonNullCount = n - nulls
      if (n > 0 && nulls == 0) {
        rules += SuggestedRule(c, "non_null", "not null")
        rowChecks += NonNull(c)
      }
      if (n > 0 && nulls == 0 && nd == n) {
        rules += SuggestedRule(c, "unique", "distinct == rows")
        aggChecks += Unique(c)
      }
      if (dtype == "string" && nonNullCount > 0 && nd <= enumMaxK) {
        // bounded domain fetch: gated on the exact count, capped at K+1
        val values = df.select(col(c)).where(col(c).isNotNull)
          .distinct().orderBy(col(c)).limit(enumMaxK + 1)
          .collect().map(_.getString(0)).toSeq
        if (values.nonEmpty && values.size <= enumMaxK) {
          rules += SuggestedRule(c, "enum", values.mkString(","))
          rowChecks += EnumIn(c, values)
        }
      }
      if (dtype == "string" && nonNullCount > 0) {
        val minL = r.getLong(7); val maxL = r.getLong(8)
        rules += SuggestedRule(c, "length", s"[$minL,$maxL]")
        rowChecks += LengthBounds(c, Some(minL.toInt), Some(maxL.toInt))
      }
      val numeric = dtype != "string" && dtype != "timestamp" && !r.isNullAt(9)
      if (numeric && nonNullCount > 0) {
        val minC = r.getLong(5); val maxC = r.getLong(6)
        val rmin = r.getDouble(9); val rmax = r.getDouble(10)
        rules += SuggestedRule(c, "range", s"[$minC,$maxC]")
        rowChecks += Range(c, rmin, rmax)
      }
    }
    SuggestResult(rules.toSeq, rowChecks.toSeq, aggChecks.toSeq)
  }

  /** The rules as a DataFrame (bounded: ≤ 5 rules × columns) — the
    * oracle-checkable view. */
  def suggestDf(spark: SparkSession, df: DataFrame, enumMaxK: Int = 8): DataFrame = {
    import spark.implicits._
    suggest(df, enumMaxK).rules.toDF()
  }

  /** MINIMAL composite-key discovery: the column PAIRS from `candidateCols`
    * that uniquely identify rows while neither component does alone (a pair
    * containing a single-column key is redundant — [[suggest]] already
    * emits the single). SQL UNIQUE null semantics: uniqueness is judged
    * over rows where BOTH components are non-null (matching
    * [[UniqueTuple]]'s exemption), and a pair with zero complete rows is
    * never suggested (vacuous).
    *
    * Scale shape: ONE exact profile prunes the pair set — a pair can only
    * distinguish its complete rows if `nd(a)·nd(b)` reaches their count
    * (BigInt product: no overflow cliff at 10^12 distincts) — then ONE
    * aggregation counts all surviving pairs' distinct tuples (Expand-based
    * exact distincts, same documented cost note as [[suggest]]; candidate
    * sets are meant to be a handful of columns, giving O(k²) bounded
    * aggregates). Returned pairs are in `candidateCols` order. */
  def compositeKeys(df: DataFrame, candidateCols: Seq[String]): Seq[Seq[String]] = {
    require(candidateCols.size >= 2,
      s"compositeKeys: need at least 2 candidate columns, got $candidateCols")
    require(candidateCols.distinct.size == candidateCols.size,
      s"compositeKeys: duplicate columns in $candidateCols")
    // both discovery passes (single-column profile, surviving-pair tuple
    // counts) scan the candidate columns — and the caller's frame may be
    // arbitrarily expensive to recompute (v_suggest_composite derives it
    // through a window, so each unpersisted pass re-paid the full
    // shuffle+sort). Cache the k-column projection for the duration of the
    // call; both actions complete before return, so the persist/unpersist
    // pair is fully contained here.
    val proj = df.select(candidateCols.map(col): _*).persist()
    try {
      val prof = Profiler.profileRaw(proj, candidateCols).collect()
        .map(r => r.getString(0) -> r).toMap
      val n = prof(candidateCols.head).getLong(2)
      if (n == 0) return Nil
      def nulls(c: String) = prof(c).getLong(3)
      def nd(c: String) = prof(c).getLong(4)
      def singleUnique(c: String) = nulls(c) == 0 && nd(c) == n
      val nonUnique = candidateCols.filterNot(singleUnique)
      val pairs = nonUnique.combinations(2).toSeq.filter { case Seq(a, b) =>
        // a pair's complete-row count is at least n - nulls(a) - nulls(b);
        // fewer than that many combinations cannot distinguish them
        BigInt(nd(a)) * BigInt(nd(b)) >= BigInt(n) - nulls(a) - nulls(b)
      }
      if (pairs.isEmpty) return Nil
      val aggs = pairs.zipWithIndex.flatMap { case (Seq(a, b), i) =>
        val complete = col(a).isNotNull && col(b).isNotNull
        Seq(
          sum(complete.cast(LongType)).as(s"__n_$i"),
          countDistinct(when(complete, struct(col(a), col(b)))).as(s"__nd_$i"))
      }
      val row = proj.agg(aggs.head, aggs.tail: _*).head()
      pairs.zipWithIndex.collect {
        case (p, i)
            if row.getLong(2 * i) > 0 && row.getLong(2 * i + 1) == row.getLong(2 * i) =>
          p
      }
    } finally proj.unpersist()
  }

  /** Cross-column ORDERING discovery: for each comparable pair from `cols`
    * (both numeric, or the same orderable atomic type — [[ColOrder]]'s
    * comparability rule), decide whether `a <= b`, `b <= a`, or `a == b`
    * holds on EVERY complete row. Emission per pair (a before b in `cols`
    * order), mirroring SQL ordering-dependency discovery:
    *  - zero complete rows → nothing (vacuous)
    *  - neither side ever greater → `eq` (the strongest finding: the
    *    columns are equal wherever both exist)
    *  - `a > b` never happens → `a le/lt b` (lt when additionally no ties)
    *  - `b > a` never happens → `b le/lt a`
    *  - violations both ways → nothing
    * Incomparable pairs are skipped silently (discovery over a mixed
    * candidate list is expected); a fully incomparable list yields Nil.
    *
    * Scale shape: ONE aggregation of 4·O(k²) conditional counters judges
    * every pair — no shuffle of values, no per-pair scan, the same
    * single-pass profile shape as [[Suggest.compositeKeys]]. */
  def orderings(df: DataFrame, cols: Seq[String]): Seq[OrderingRule] = {
    require(cols.size >= 2, s"orderings: need >= 2 candidate columns, got $cols")
    require(cols.distinct.size == cols.size, s"orderings: duplicate columns in $cols")
    cols.foreach(c => require(df.columns.contains(c), s"orderings: no such column '$c'"))
    def comparable(x: DataType, y: DataType): Boolean = (x, y) match {
      case (_: NumericType, _: NumericType) => true
      case _ => x == y &&
        (x == StringType || x == TimestampType || x == DateType || x == BooleanType)
    }
    val pairs = cols.combinations(2).toSeq.filter { case Seq(a, b) =>
      comparable(df.schema(a).dataType, df.schema(b).dataType)
    }
    if (pairs.isEmpty) return Nil
    val aggs = pairs.zipWithIndex.flatMap { case (Seq(a, b), i) =>
      val complete = col(a).isNotNull && col(b).isNotNull
      Seq(
        coalesce(sum(complete.cast(LongType)), lit(0L)).as(s"__n_$i"),
        coalesce(sum((complete && col(a) > col(b)).cast(LongType)), lit(0L)).as(s"__gab_$i"),
        coalesce(sum((complete && col(b) > col(a)).cast(LongType)), lit(0L)).as(s"__gba_$i"),
        coalesce(sum((complete && col(a) === col(b)).cast(LongType)), lit(0L)).as(s"__eq_$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    pairs.zipWithIndex.flatMap { case (Seq(a, b), i) =>
      val n = row.getLong(4 * i); val gab = row.getLong(4 * i + 1)
      val gba = row.getLong(4 * i + 2); val eq = row.getLong(4 * i + 3)
      if (n == 0) None
      else if (gab == 0 && gba == 0) Some(OrderingRule(a, b, "eq", n, eq))
      else if (gab == 0) Some(OrderingRule(a, b, if (eq > 0) "le" else "lt", n, eq))
      else if (gba == 0) Some(OrderingRule(b, a, if (eq > 0) "le" else "lt", n, eq))
      else None
    }
  }

  /** The discovered orderings as a DataFrame — the oracle-checkable view. */
  def orderingsDf(spark: SparkSession, df: DataFrame, cols: Seq[String]): DataFrame = {
    import spark.implicits._
    orderings(df, cols).toDF()
  }

  /** Compile discovered orderings into [[ColOrder]] checks: le → `a <= b`,
    * lt → the strict form, eq → both directions (equality as two ≤). Every
    * returned check holds on the training table BY CONSTRUCTION. */
  def orderingChecks(rules: Seq[OrderingRule]): Seq[RowConstraint] = rules.flatMap {
    case OrderingRule(a, b, "eq", _, _) => Seq(ColOrder(a, b), ColOrder(b, a))
    case OrderingRule(a, b, "le", _, _) => Seq(ColOrder(a, b))
    case OrderingRule(a, b, "lt", _, _) => Seq(ColOrder(a, b, allowEqual = false))
    case r => throw new IllegalArgumentException(s"unknown ordering kind: $r")
  }

  /** The discovered composite keys in [[suggestDf]]'s rule shape
    * (col_name = "a,b", rule = composite_unique) — the oracle-checkable
    * view; compile the matching checks with [[UniqueTuple]]. */
  def compositeKeyDf(spark: SparkSession, df: DataFrame,
      candidateCols: Seq[String]): DataFrame = {
    import spark.implicits._
    compositeKeys(df, candidateCols)
      .map(p => SuggestedRule(p.mkString(","), "composite_unique", "distinct == rows"))
      .toDF()
  }

  /** Suggest, then run the suggested suite back over its own training
    * table — returns the violations frame, which is EMPTY by construction
    * (every bound is an observed extremum). The empty result is the
    * guarantee callers rely on when they freeze a suggested suite. */
  def applyToSelf(df: DataFrame, keyCol: String, enumMaxK: Int = 8): DataFrame = {
    val s = suggest(df, enumMaxK)
    val suite = ConstraintSuite(keyCol, s.rowChecks, s.aggChecks)
    suite.compile(df.schema) match {
      case Left(errs) =>
        throw new IllegalStateException(
          s"suggested suite failed its own compile: ${errs.map(_.msg).mkString("; ")}")
      case Right(cs) => cs.run(df).violations
    }
  }
}

/** Static schema-drift detection: compare an EXPECTED schema (frozen when
  * the suite was authored) against the actual table schema before any data
  * is scanned — the cheapest validation in the engine, and the one that
  * catches upstream writers changing shape. Pure driver-side function:
  * no job, no scan. */
object SchemaDiff {

  final case class SchemaChange(
      col_name: String, change: String, expected: String, actual: String)

  /** Changes, ordered by (column, change):
    *  - `removed`          — expected but absent
    *  - `added`            — present but not expected
    *  - `type_changed`     — both present, different data types
    *  - `nullability_relaxed` — expected non-nullable, actual nullable
    *    (the dangerous direction; tightening is compatible and not flagged)
    */
  def diff(expected: StructType, actual: StructType): Seq[SchemaChange] = {
    val exp = expected.fields.map(f => f.name -> f).toMap
    val act = actual.fields.map(f => f.name -> f).toMap
    val removed = expected.fields.filterNot(f => act.contains(f.name))
      .map(f => SchemaChange(f.name, "removed", f.dataType.typeName, ""))
    val added = actual.fields.filterNot(f => exp.contains(f.name))
      .map(f => SchemaChange(f.name, "added", "", f.dataType.typeName))
    val changed = expected.fields.flatMap { f =>
      act.get(f.name).toSeq.flatMap { a =>
        val t = if (f.dataType != a.dataType)
          Seq(SchemaChange(f.name, "type_changed", f.dataType.typeName, a.dataType.typeName))
        else Nil
        val nl = if (!f.nullable && a.nullable)
          Seq(SchemaChange(f.name, "nullability_relaxed", "required", "nullable"))
        else Nil
        t ++ nl
      }
    }
    (removed ++ added ++ changed).sortBy(c => (c.col_name, c.change))
  }

  def diffDf(spark: SparkSession, expected: StructType, actual: StructType): DataFrame = {
    import spark.implicits._
    diff(expected, actual).toDF()
  }
}

/** SUITE-drift detection — [[SchemaDiff]]'s counterpart one level up: the
  * validation SUITE is itself versioned config, and a quietly loosened
  * bound ships as silently as a quietly widened column. Compares two
  * suites check-by-check (id = identity, full parameterization = payload)
  * plus the suite-level knobs. Pure driver-side, no session needed for the
  * Seq form. */
object SuiteDiff {

  final case class SuiteChange(
      check_id: String, change: String, expected: String, actual: String)

  /** Changes ordered by (check_id, change):
    *  - `removed` / `added`  — check present on one side only (by id)
    *  - `params_changed`     — same id, different parameterization (e.g. a
    *    Range bound moved; a Unique gained salting)
    *  - suite-level rows under ids `(keyCol)` / `(nBuckets)`
    * Duplicate ids on a side (legal: two overlapping ranges on one column)
    * compare as multisets of parameterizations. */
  def diff(expected: ConstraintSuite, actual: ConstraintSuite): Seq[SuiteChange] = {
    def byId(s: ConstraintSuite): Map[String, Seq[Constraint]] =
      (s.rowChecks: Seq[Constraint]).concat(s.aggChecks)
        .groupBy(_.id).map { case (id, xs) => id -> xs }
    // STRUCTURAL equality (case-class ==), not toString: two equal suites
    // must not diff because one holds List and the other ArraySeq
    def multisetEq(e: Seq[Constraint], a: Seq[Constraint]): Boolean = {
      val rem = scala.collection.mutable.ArrayBuffer(a: _*)
      e.size == a.size && e.forall { x =>
        val i = rem.indexOf(x)
        if (i >= 0) { rem.remove(i); true } else false
      }
    }
    def show(cs: Seq[Constraint]): String =
      cs.map(_.toString).sorted.mkString("; ")
    val exp = byId(expected)
    val act = byId(actual)
    val checkChanges = (exp.keySet ++ act.keySet).toSeq.flatMap { id =>
      (exp.get(id), act.get(id)) match {
        case (Some(e), None) => Seq(SuiteChange(id, "removed", show(e), ""))
        case (None, Some(a)) => Seq(SuiteChange(id, "added", "", show(a)))
        case (Some(e), Some(a)) if !multisetEq(e, a) =>
          Seq(SuiteChange(id, "params_changed", show(e), show(a)))
        case _ => Nil
      }
    }
    val suiteLevel =
      (if (expected.keyCol != actual.keyCol)
        Seq(SuiteChange("(keyCol)", "params_changed", expected.keyCol, actual.keyCol))
      else Nil) ++
        (if (expected.nBuckets != actual.nBuckets)
          Seq(SuiteChange("(nBuckets)", "params_changed",
            expected.nBuckets.toString, actual.nBuckets.toString))
        else Nil)
    (checkChanges ++ suiteLevel).sortBy(c => (c.check_id, c.change))
  }

  /** True iff the suites are check-for-check identical (gate form). */
  def identical(expected: ConstraintSuite, actual: ConstraintSuite): Boolean =
    diff(expected, actual).isEmpty

  def diffDf(spark: SparkSession, expected: ConstraintSuite,
      actual: ConstraintSuite): DataFrame = {
    import spark.implicits._
    diff(expected, actual).toDF()
  }
}
