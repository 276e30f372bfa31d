package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-level span analysis for PRE-TOKENIZED corpora (the north-rule
  * payload): duplicated token spans across sequences, and benchmark
  * decontamination — flagging training sequences that share an n-token
  * window with an evaluation set.
  *
  * Scale shape: spans are 64-bit window hashes (custom
  * [[graft.functions.TokenNgramHashes]] kernel — one loop per row, deduped
  * in-row, never a string per window). Dedup is one explode + two-phase hash
  * agg on the hash key; decontamination broadcasts the benchmark's hash set
  * (benchmarks are ~10^5-10^7 spans — megabytes — against a 10^12-row
  * corpus, so the corpus is never shuffled at all: one narrow scan with a
  * broadcast-hash semi-join per exploded span, then a per-id agg).
  */
object Decontaminate {

  /** Distinct window hashes per row. */
  def spanHashes(tokens: Column, n: Int): Column =
    graft.functions.VecFunctions.token_ngram_hashes(tokens, n)

  /** Token spans (as 64-bit hashes) occurring in ≥ `minDocs` distinct
    * sequences — [[Dedup.duplicatedSpans]] for token arrays. Returns
    * (span_hash, n_docs). */
  def duplicatedTokenSpans(df: DataFrame, tokensCol: String,
      n: Int = 13, minDocs: Int = 2): DataFrame =
    df.select(explode(spanHashes(col(tokensCol), n)).as("span_hash"))
      .groupBy(col("span_hash")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Contamination report: for every corpus sequence sharing ≥ `minOverlap`
    * n-token windows with ANY benchmark sequence, the overlap count.
    * Returns (idCol, n_overlap). The 13-token default window is the
    * published decontamination convention for benchmark leakage. */
  def overlapReport(corpus: DataFrame, tokensCol: String, idCol: String,
      benchmark: DataFrame, benchTokensCol: String,
      n: Int = 13, minOverlap: Int = 1): DataFrame = {
    val benchSpans = benchmark
      .select(explode(spanHashes(col(benchTokensCol), n)).as("span_hash"))
      .distinct()
    corpus
      .select(col(idCol), explode(spanHashes(col(tokensCol), n)).as("span_hash"))
      .join(broadcast(benchSpans), Seq("span_hash"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** The corpus with contaminated sequences removed (schema preserved) —
    * BROADCAST anti-join against the flagged id set, keeping the promise
    * that the corpus side never shuffles (an unhinted anti-join could plan
    * as SMJ and shuffle all 10^12 rows). The flagged set is bounded by the
    * benchmark's reach — tiny in any sane setup; if your whole corpus is
    * contaminated, dedup is not your problem. */
  def dropContaminated(corpus: DataFrame, tokensCol: String, idCol: String,
      benchmark: DataFrame, benchTokensCol: String,
      n: Int = 13, minOverlap: Int = 1): DataFrame = {
    val flagged = overlapReport(corpus, tokensCol, idCol, benchmark, benchTokensCol,
      n, minOverlap).select(idCol)
    corpus.join(broadcast(flagged), Seq(idCol), "left_anti")
  }

  /** RESUMABLE [[dropContaminated]]: the flagged-id set — the one stage
    * that scans the whole corpus — is materialized through `stages`
    * ([[graft.StageRunner]]); a killed run resumes from the stored set and
    * pays only the final broadcast anti-join. Identical results to the
    * non-resumable form (the overlap report is deterministic). */
  def dropContaminatedResumable(corpus: DataFrame, tokensCol: String, idCol: String,
      benchmark: DataFrame, benchTokensCol: String, stages: graft.StageRunner,
      n: Int = 13, minOverlap: Int = 1): DataFrame = {
    val flagged = stages.stage("contaminated_ids",
        Seq("decontaminate", tokensCol, idCol, benchTokensCol, n, minOverlap)) {
      overlapReport(corpus, tokensCol, idCol, benchmark, benchTokensCol,
        n, minOverlap).select(idCol)
    }
    corpus.join(broadcast(flagged.select(idCol)), Seq(idCol), "left_anti")
  }
}
