package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset RECONCILIATION: row accounting between two stages of a pipeline
  * ("did dedup lose rows it shouldn't have? did the rewrite duplicate
  * keys?"). The bidirectional, multiplicity-aware complement of the
  * one-directional [[graft.RefIntegrity]] foreign-key check.
  *
  * Scale shape: each side collapses to per-key counts FIRST (partial
  * aggregation map-side, so the shuffle carries one row per distinct key,
  * never the corpus), then ONE full-outer sort-merge join on the key hash.
  * No broadcasts required — both sides may be corpus-sized.
  */
object Reconcile {

  /** Per-key multiplicity compare of `left` vs `right` on `keyCol`:
    * one row per DISPOSITION —
    *  - `left_only`  — keys present only in left (rows lost downstream)
    *  - `right_only` — keys present only in right (rows invented)
    *  - `count_mismatch` — key in both, different multiplicities
    *  - `match` — key in both with identical multiplicities
    * with `n_keys` (distinct keys) and `n_rows_left`/`n_rows_right` (row
    * mass in each side carried by that disposition). NULL keys are excluded
    * on both sides (assert presence with NonNull upstream — a null key has
    * no identity to reconcile). Exact LONG arithmetic throughout. */
  def keyParity(left: DataFrame, right: DataFrame, keyCol: String): DataFrame = {
    def counted(df: DataFrame, out: String) =
      df.filter(col(keyCol).isNotNull)
        .groupBy(col(keyCol)).agg(count(lit(1)).as(out))
    val l = counted(left, "__n_l")
    val r = counted(right, "__n_r")
    val joined = l.join(r, Seq(keyCol), "full_outer")
      .select(
        when(col("__n_r").isNull, "left_only")
          .when(col("__n_l").isNull, "right_only")
          .when(col("__n_l") =!= col("__n_r"), "count_mismatch")
          .otherwise("match").as("disposition"),
        coalesce(col("__n_l"), lit(0L)).as("__n_l"),
        coalesce(col("__n_r"), lit(0L)).as("__n_r"))
    joined.groupBy(col("disposition")).agg(
      count(lit(1)).as("n_keys"),
      sum(col("__n_l")).as("n_rows_left"),
      sum(col("__n_r")).as("n_rows_right"))
  }

  /** Gate form: true iff the two sides carry EXACTLY the same key
    * multiset — no lost, invented, or re-multiplied keys. One job. */
  def identical(left: DataFrame, right: DataFrame, keyCol: String): Boolean =
    keyParity(left, right, keyCol)
      .filter(col("disposition") =!= "match").isEmpty

  /** CONTENT-level parity: [[keyParity]] catches lost / invented /
    * re-multiplied keys but is blind to a rewrite that keeps every key and
    * silently CHANGES row content. rowParity compares, per key, the full
    * MULTISET of row contents (all columns, canonicalized by sorted column
    * name so projection order never matters). Per-key dispositions:
    *  - `left_only` / `right_only` / `count_mismatch` — as [[keyParity]]
    *  - `content_mismatch` — key multiplicities AGREE but at least one row's
    *    content differs (the silent-rewrite case keyParity cannot see)
    *  - `match` — identical content multisets
    * Both frames must carry the same column SET. NULL keys excluded as in
    * [[keyParity]].
    *
    * Scale shape: row contents collapse to a 64-bit `xxhash64` fingerprint
    * AND per-(key, fingerprint) counts map-side, so the first shuffle
    * carries one row per DISTINCT (key, content) — never the corpus; the
    * per-key rollup and the final disposition agg ride the same key
    * partitioning. Column ordinals are interleaved into the hash so a null
    * field keeps its position (Spark's hash fold skips nulls; bare
    * `xxhash64(a, b)` would equate ("x", null) with (null, "x")). A 64-bit
    * collision can only turn a true `content_mismatch` into `match`
    * (never the reverse) at ~2^-64 per colliding pair. */
  def rowParity(left: DataFrame, right: DataFrame, keyCol: String): DataFrame =
    rowParityPerKey(left, right, keyCol)
      .groupBy(col("disposition")).agg(
        count(lit(1)).as("n_keys"),
        sum(col("n_rows_left")).as("n_rows_left"),
        sum(col("n_rows_right")).as("n_rows_right"))

  /** Per-COLUMN diff diagnostic — [[rowParity]] says THAT content changed;
    * columnDiff says WHERE: for every non-key column, the number of keys
    * whose value multiset for that column differs between the sides.
    * Compared keys are those present on BOTH sides with EQUAL multiplicity
    * (`n_keys_compared`, same for every column) — lost / invented /
    * re-multiplied keys are [[keyParity]]'s jurisdiction and would read as
    * all-columns-differ noise here. Output: one row per non-key column,
    * `(col_name, n_keys_compared, n_keys_differing)`.
    *
    * Scale shape: ONE aggregation per side computes, per key, an
    * order-independent multiset fingerprint for ALL columns at once — the
    * sum of per-value xxhash64, split into hi/lo 32-bit halves so the sums
    * stay exact LONGs under ANSI up to 2^31 rows per key (a wrapped 64-bit
    * sum would throw on overflow; XOR would let paired duplicates cancel).
    * Shuffle carries one row per distinct key; one equi-join; the final
    * per-column rollup is a single agg row unpivoted driver-free via
    * `stack`. Fingerprint equality is probabilistic the same way
    * [[rowParity]]'s is: a collision can only UNDER-report a diff. */
  def columnDiff(left: DataFrame, right: DataFrame, keyCol: String): DataFrame = {
    val cols = left.columns.filterNot(_ == keyCol).sorted
    require(right.columns.sorted.sameElements(left.columns.sorted),
      s"columnDiff: column sets differ — left ${left.columns.sorted.mkString(",")} " +
        s"vs right ${right.columns.sorted.mkString(",")}")
    require(cols.nonEmpty, "columnDiff: no non-key columns to compare")
    def summarized(df: DataFrame, suffix: String) = {
      val aggs = count(lit(1)).as(s"__n$suffix") +: cols.zipWithIndex.flatMap {
        case (c, i) =>
          // ordinal-salted so identical values in different columns get
          // independent fingerprints; shiftRightUnsigned/mask keep each
          // summand < 2^32
          val h = xxhash64(lit(i), col(c))
          Seq(sum(shiftrightunsigned(h, 32)).as(s"__hi_$i$suffix"),
            sum(h.bitwiseAND(lit(0xFFFFFFFFL))).as(s"__lo_$i$suffix"))
      }
      df.filter(col(keyCol).isNotNull)
        .groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    }
    val j = summarized(left, "_l").join(summarized(right, "_r"), Seq(keyCol))
      .filter(col("__n_l") === col("__n_r"))
    val flags = cols.indices.map { i =>
      sum(when(col(s"__hi_${i}_l") =!= col(s"__hi_${i}_r") ||
        col(s"__lo_${i}_l") =!= col(s"__lo_${i}_r"), 1L).otherwise(0L))
        .as(s"__d_$i")
    }
    val one = j.agg(count(lit(1)).as("__total"), flags: _*)
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) => s"'${c.replace("'", "''")}', __d_$i" }
      .mkString(", ")
    one.selectExpr("__total",
      s"stack(${cols.length}, $stackArgs) AS (col_name, __d)")
      .select(col("col_name"),
        coalesce(col("__total"), lit(0L)).as("n_keys_compared"),
        coalesce(col("__d"), lit(0L)).as("n_keys_differing"))
  }

  /** Bounded EXAMPLES of disagreement — the counts above gate a pipeline;
    * the first question after a red gate is "show me some". One row per
    * non-`match` key, `(keyCol, disposition, n_rows_left, n_rows_right)`,
    * the `maxExamples` SMALLEST keys (deterministic across reruns and
    * parallelism — a bare limit() would return an arbitrary task's rows).
    * Content compared as in [[rowParity]] (same fingerprint, same
    * dispositions). Scale shape: the ordered limit plans as
    * TakeOrderedAndProject (per-partition top-k, never a global sort), on
    * top of rowParity's collapsed per-key frame. */
  def diffExamples(left: DataFrame, right: DataFrame, keyCol: String,
      maxExamples: Int = 100): DataFrame = {
    require(maxExamples > 0, "maxExamples > 0")
    val perKey = rowParityPerKey(left, right, keyCol)
    perKey.filter(col("disposition") =!= "match")
      .orderBy(col(keyCol))
      .limit(maxExamples)
  }

  /** The per-key frame [[rowParity]] aggregates and [[diffExamples]]
    * samples: one row per key, `(keyCol, disposition, n_rows_left,
    * n_rows_right)`. */
  private def rowParityPerKey(left: DataFrame, right: DataFrame,
      keyCol: String): DataFrame = {
    val cols = left.columns.sorted
    require(right.columns.sorted.sameElements(cols),
      s"rowParity: column sets differ — left ${left.columns.sorted.mkString(",")} " +
        s"vs right ${right.columns.sorted.mkString(",")}")
    def cells(df: DataFrame, out: String) = {
      val fp = xxhash64(cols.zipWithIndex.flatMap {
        case (c, i) => Seq(lit(i), col(c)) }: _*)
      df.filter(col(keyCol).isNotNull)
        .groupBy(col(keyCol), fp.as("__fp"))
        .agg(count(lit(1)).as(out))
    }
    val joined = cells(left, "__n_l")
      .join(cells(right, "__n_r"), Seq(keyCol, "__fp"), "full_outer")
      .select(col(keyCol),
        coalesce(col("__n_l"), lit(0L)).as("__n_l"),
        coalesce(col("__n_r"), lit(0L)).as("__n_r"))
    joined.groupBy(col(keyCol)).agg(
      sum(col("__n_l")).as("__nl"),
      sum(col("__n_r")).as("__nr"),
      max(when(col("__n_l") =!= col("__n_r"), 1L).otherwise(0L)).as("__cell_diff"))
      .select(col(keyCol),
        when(col("__nl") === 0L, "right_only")
          .when(col("__nr") === 0L, "left_only")
          .when(col("__nl") =!= col("__nr"), "count_mismatch")
          .when(col("__cell_diff") === 1L, "content_mismatch")
          .otherwise("match").as("disposition"),
        col("__nl").as("n_rows_left"), col("__nr").as("n_rows_right"))
  }

  /** CONSERVATION check for a split step (e.g. dedup, quarantine,
    * sampling): every input key must land in EXACTLY ONE of the outputs,
    * with its multiplicity preserved — `outputs` must partition `input`.
    * Returns the keyParity frame of input vs the union of outputs; an
    * all-`match` result proves nothing was lost, duplicated across
    * outputs, or invented. Output schemas may differ from the input's —
    * only the key column is read. */
  def conservation(input: DataFrame, keyCol: String, outputs: Seq[DataFrame]): DataFrame = {
    require(outputs.nonEmpty, "conservation: need at least one output frame")
    val union = outputs.map(_.select(col(keyCol))).reduce(_.unionByName(_))
    keyParity(input.select(col(keyCol)), union, keyCol)
  }
}
