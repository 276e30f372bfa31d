package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline composition utilities — the "no silent caps" principle as an
  * operator: a filtering pipeline must be able to say exactly how many rows
  * each stage cost, or a mis-tuned gate silently eats the corpus.
  */
object Pipeline {

  /** Ordered, NAMED keep-gates with per-stage drop attribution. Every
    * dropped row is charged to the FIRST stage that rejected it (pipeline
    * semantics — later gates never see it), and every stage appears in the
    * audit even when it dropped nothing. A NULL gate value is a rejection
    * (unknown must not mean keep).
    *
    * Returns (survivors, audit): survivors = rows passing ALL gates; audit =
    * one row per stage plus a final "kept" row, as (stage, ord, n_rows).
    * Scale shape: the audit is ONE narrow scan (all gates evaluated in a
    * single projection, then a tiny groupBy over |stages|+1 keys) and the
    * survivor frame is one filter over the same scan — no joins, no wide
    * shuffles, each frame independently consumable. */
  def filterWithAudit(df: DataFrame, stages: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    require(stages.nonEmpty, "at least one stage")
    val names = stages.map(_._1)
    require(names.distinct.size == names.size, "stage names must be unique")
    require(!names.contains("kept"), "'kept' is the reserved survivor label")
    val keepAll = stages.map { case (_, c) => coalesce(c, lit(false)) }.reduce(_ && _)
    // first-failing-stage attribution: fold in reverse so stage 1 tests first
    val attributed = stages.reverse.foldLeft(lit("kept"): Column) {
      case (acc, (name, c)) => when(!coalesce(c, lit(false)), lit(name)).otherwise(acc)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val order = (names :+ "kept").zipWithIndex.toDF("stage", "ord")
      .select(col("stage"), col("ord").cast("int").as("ord"))
    val counts = df.select(attributed.as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_rows"))
    val audit = order.join(counts, Seq("stage"), "left")
      .select(col("stage"), col("ord"), coalesce(col("n_rows"), lit(0L)).as("n_rows"))
    (df.filter(keepAll), audit)
  }
}
