package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Violation TRIAGE: a 10^12-row run can emit 10^9 violation rows — nobody
  * reads those; the question is "what are the top failing PATTERNS per
  * check, and show me one example of each". The reference prints every
  * error it finds (span-annotated, one at a time); at cluster scale the
  * engine must summarize before a human enters the loop.
  *
  * Works over any violations frame shaped like the engine's
  * (`constraint_id`, `actual`, `doc_id`, ...) — row-local, cross-row, or
  * the union. `normalize=true` collapses digit runs in `actual` to `#` so
  * value-carrying messages ("size 17 != 5", "size 9 != 3") fold into ERROR
  * CLASSES ("size # != #") instead of one group per distinct value.
  *
  * Scale shape: two hash aggregations, both map-side partial — (check,
  * pattern) counts collapse before the first shuffle; the per-check top-k
  * rides [[graft.functions.BoundedMinRows]] (bounded heap, O(partitions·k)
  * rows to each reducer), so a check with 10^8 DISTINCT patterns never
  * serializes into one task's sort. No windows, no collects. Deterministic:
  * ties break by pattern; exemplars are per-group minima of `actual` and
  * `doc_id` independently (two cheap MINs, not an arg-min — the two values
  * may come from different rows, which triage doesn't care about). */
object Triage {

  /** Top-`k` most frequent `actual` patterns per `constraint_id`:
    * `(constraint_id, pattern, n, exemplar_actual, exemplar_doc_id)`,
    * count-descending (pattern-ascending on ties) within each check. */
  def topViolations(vios: DataFrame, k: Int = 10,
      normalize: Boolean = true): DataFrame = {
    require(k > 0, "k > 0")
    val pat: Column =
      if (normalize) regexp_replace(col("actual"), "[0-9]+", "#")
      else col("actual")
    val grouped = vios
      .groupBy(col("constraint_id"), pat.as("pattern"))
      .agg(count(lit(1)).as("n"),
        min(col("actual")).as("exemplar_actual"),
        min(col("doc_id")).as("exemplar_doc_id"))
    val sortKey = struct((-col("n")).as("neg_n"), col("pattern").as("p"))
    val payload = struct(col("pattern"), col("n"),
      col("exemplar_actual"), col("exemplar_doc_id"))
    grouped.groupBy(col("constraint_id"))
      .agg(graft.functions.BoundedMinRows.bounded_min_rows(sortKey, payload, k)
        .as("__top"))
      .select(col("constraint_id"), explode(col("__top")).as("__r"))
      .select(col("constraint_id"), col("__r.*"))
  }
}
