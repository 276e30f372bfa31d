package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring — the Spark-native stand-in for
  * CCNet's KenLM perplexity filter (Wenzek et al. 2020): train a bounded
  * unigram model on a reference corpus, score every document by average
  * per-token log-likelihood, and gate on a threshold. Low-likelihood
  * documents (gibberish, boilerplate soup, wrong-language text) score far
  * below prose.
  *
  * Scale shape: training is explode -> two-phase hash agg (map-side
  * combine) -> TakeOrdered(V) — the only shuffle is on term keys, and the
  * driver holds just the top-V vocabulary (V ~ 10^4-10^5 at production
  * scale). Scoring is a ZERO-shuffle projection: the vocab rides to
  * executors inside [[graft.functions.UnigramLogProbFp]], so at 100 TB it
  * runs at scan speed. All scores are fixed-point integers (per-term
  * `round(ln(c/N)*1e6)`), order-independent and SQL-oracle-reproducible.
  */
object UnigramLM {

  /** Tokenization shared with the oracle: maximal `[a-z0-9]+` runs of the
    * lowercased text (same class the repetition kernel uses). */
  val tokenPattern = "[a-z0-9]+"
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(tokenPattern), lit(0))

  /** Trained model: top-V terms with corpus counts, plus the TOTAL token
    * count (including out-of-vocabulary tokens, which score as count 1). */
  case class Model(vocab: Map[String, Long], totalTokens: Long) {
    require(totalTokens > 0, "empty training corpus")
    def logProbFp(tokensCol: Column): Column =
      graft.functions.TextFunctions.unigram_logprob_fp(tokensCol, vocab, totalTokens)
  }

  /** Train on a corpus. Vocabulary ties at the V boundary break
    * deterministically by (count desc, term asc). */
  def train(df: DataFrame, textCol: String, vocabSize: Int): Model = {
    val toks = tokens(col(textCol))
    val total = df.select(sum(size(toks)).as("n")).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val vocab = df.select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("term")).limit(vocabSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Model(vocab, total)
  }

  /** Attach `logprob_fp` (fixed-point total log-likelihood) and `n_tok`
    * (scored token count) to every row. Documents with no tokens score
    * (0, 0); null text yields null columns. */
  def score(df: DataFrame, textCol: String, model: Model): DataFrame = {
    val st = model.logProbFp(tokens(col(textCol)))
    df.withColumn("logprob_fp", st("logprob_fp"))
      .withColumn("n_tok", st("n_tok"))
  }

  /** Interpolated-bigram model: unigram vocabulary + top-B bigram counts.
    * Token i scores `ln(0.5·c(prev,cur)/c(prev) + 0.5·c(cur)/N)` when the
    * predecessor is in-vocabulary; the first token and OOV-predecessor
    * tokens back off to the plain unigram — the next rung toward CCNet's
    * 5-gram KenLM, still fully SQL-oracle-reproducible (dyadic 0.5). */
  case class BigramModel(unigrams: Map[String, Long], bigrams: Map[String, Long],
      totalTokens: Long) {
    require(totalTokens > 0, "empty training corpus")
    def logProbFp(tokensCol: Column): Column =
      graft.functions.TextFunctions.bigram_logprob_fp(
        tokensCol, unigrams, bigrams, totalTokens)
  }

  /** Adjacent-word bigrams as U+0001-joined strings (in-row — token
    * occurrences never shuffle; only per-doc bigram instances explode into
    * the count agg). */
  private def bigramsCol(toks: Column): Column = {
    val m = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => concat(a, lit("\u0001"), b))
  }

  /** Train unigram + bigram vocabularies. Ties at either V boundary break
    * deterministically by (count desc, key asc). SCALE NOTE: the bigram
    * count agg shuffles one string per token occurrence — at corpus scale,
    * train on a REFERENCE SAMPLE (`Sampling.deterministicSample`) the way
    * CCNet trains its KenLM on Wikipedia, not on the full corpus; the model
    * only needs stable counts, and scoring (the full-corpus pass) stays a
    * zero-shuffle projection regardless. */
  def trainBigram(df: DataFrame, textCol: String, vocabSize: Int,
      bigramSize: Int): BigramModel = {
    val base = train(df, textCol, vocabSize)
    val bigrams = df.select(explode(bigramsCol(tokens(col(textCol)))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("bg")).limit(bigramSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    BigramModel(base.vocab, bigrams, base.totalTokens)
  }

  /** Attach bigram-interpolated `logprob_fp` and `n_tok`. */
  def scoreBigram(df: DataFrame, textCol: String, model: BigramModel): DataFrame = {
    val st = model.logProbFp(tokens(col(textCol)))
    df.withColumn("logprob_fp", st("logprob_fp"))
      .withColumn("n_tok", st("n_tok"))
  }

  /** Keep rows whose AVERAGE per-token log-likelihood is at least
    * `minAvgFp` (fixed-point, e.g. -9_000_000 = avg ln-prob >= -9.0), in
    * multiply-form so no division enters the plan. Tokenless rows drop. */
  def likelihoodGate(df: DataFrame, textCol: String, model: Model,
      minAvgFp: Long): DataFrame = {
    val scored = score(df, textCol, model)
    scored.filter(col("n_tok") > 0 &&
        col("logprob_fp") >= lit(minAvgFp) * col("n_tok"))
      .drop("logprob_fp", "n_tok")
  }
}
