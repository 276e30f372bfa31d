package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** INTER-ROW sequence analysis: order-dependent invariants over a grouped,
  * time-ordered frame — the check family row-local leaves and whole-column
  * aggregates can't express ("each user's `ts` never goes backward along
  * `event_id`", "a version counter only ever increments").
  *
  * Ordering semantics with TIES in the order column: rows are sorted by
  * (order, value), so a group passes the non-strict check iff SOME
  * ordering of the tied rows is monotone — the only well-defined stance
  * when the order key doesn't totally order the group (and it makes the
  * result deterministic at any parallelism: equal (order, value) rows are
  * interchangeable). The strict form flags equal adjacent values too, so
  * ties in value always violate strictness.
  *
  * Scale shape: one hash exchange on the group + one sort — the price any
  * per-group sequential semantics costs (the per-key order IS the
  * semantics; salting would split the series). The breaks frame is
  * pay-per-defect: one row per violating group, never per row.
  */
object Sequential {

  private def orderableAtomic(t: DataType): Boolean = t match {
    case _: NumericType | TimestampType | TimestampNTZType | DateType |
         StringType | BooleanType => true
    case _ => false
  }

  /** Per-group monotonicity breaks of `valueCol` along `orderCol`:
    * one row per group with ≥1 break — (group, n_breaks, plus the FIRST
    * break in sort order: break_order, prev_value, value). Rows with a
    * null group/order/value are excluded from the series (assert presence
    * separately with NonNull — the leaf null-stance). */
  def monotonicBreaks(df: DataFrame, groupCol: String, orderCol: String,
      valueCol: String, strict: Boolean = false): DataFrame = {
    Seq(groupCol, orderCol, valueCol).foreach(c =>
      require(df.columns.contains(c), s"monotonicBreaks: no such column '$c'"))
    require(Seq(groupCol, orderCol, valueCol).distinct.size == 3,
      s"monotonicBreaks: group/order/value must be distinct columns")
    Seq(orderCol -> "order", valueCol -> "value").foreach { case (c, role) =>
      require(orderableAtomic(df.schema(c).dataType),
        s"monotonicBreaks: $role column '$c' is ${df.schema(c).dataType.typeName}, need an orderable atomic type")
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).asc, col(valueCol).asc)
    val bad =
      if (strict) col("__prev") >= col(valueCol)
      else col("__prev") > col(valueCol)
    df.filter(col(groupCol).isNotNull && col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(orderCol), col(valueCol))
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .filter(col("__prev").isNotNull && bad)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_breaks"),
        min_by(struct(col(orderCol).as("break_order"),
          col("__prev").as("prev_value"), col(valueCol).as("value")),
          struct(col(orderCol), col(valueCol))).as("__first"))
      .select(col(groupCol), col("n_breaks"), col("__first.*"))
  }

  /** Per-group pass-rate of a row predicate: (group, n, n_pass, pass_fp)
    * where `pass_fp` = rate ×10^6 as an EXACT floor-divided LONG (division
    * in DECIMAL(38,0) — hash-comparable across engines at any scale). One
    * partial-agg'd groupBy: two LONGs per group cross the wire. */
  def passRate(df: DataFrame, pred: Column, groupKey: Column): DataFrame =
    df.groupBy(groupKey.as("key"))
      .agg(count(lit(1)).as("n"), sum(pred.cast(LongType)).as("n_pass"))
      .withColumn("pass_fp", Constraints.intDivFp(col("n_pass"), col("n")))
}
