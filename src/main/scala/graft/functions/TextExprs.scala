package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Repetition statistics for quality filtering (the MassiveText/Gopher
  * repetition signals, Rae et al. 2021 §A1.1): within-document duplicate
  * lines, most-frequent word n-grams, and characters covered by duplicated
  * n-grams. One custom expression computes every signal in a single pass
  * over the text — per-document, embarrassingly parallel, ZERO shuffles, so
  * at 100 TB the filter runs at scan speed alongside the other projection
  * kernels (contrast: an explode + groupBy(doc, ngram) formulation shuffles
  * the entire tokenized corpus).
  *
  * All outputs are exact INTEGER numerators/denominators, not floats —
  * fraction thresholds apply in multiply-form (`num * 10 <= den * 3`), which
  * keeps the operator bit-exact under reordering and lets a SQL oracle
  * reproduce it verbatim. Definitions (shared with the DuckDB oracle in
  * SparkEntry):
  *
  *  - lines: '\n'-separated segments with length > 0. A line INSTANCE is
  *    "duplicate" when its exact text occurs >= 2 times in the document;
  *    numerators count all such instances. Line characters are CODE POINTS
  *    (matching SQL `length()`/`len()`), not UTF-16 units.
  *  - words: maximal runs of code points whose SIMPLE lowercase mapping is
  *    ASCII `[a-z0-9]` (matching RE2 `[a-z0-9]+` over a per-code-point
  *    `lower(text)`, e.g. U+212A KELVIN SIGN tokenizes as `k`; locale/full
  *    case mappings like U+0130 are a documented residual).
  *  - n-gram (n=2,3,4 "top"): sliding window of n words joined by single
  *    spaces; char length INCLUDES the n-1 joining spaces. `topN_chars` =
  *    occurrences * char-length of the most frequent n-gram, ties broken by
  *    (count desc, char length desc, ngram asc).
  *  - n-gram (n=5,10 "coverage"): `dupN_cov_chars` = total word characters
  *    at positions covered by at least one window whose n-gram occurs >= 2
  *    times (true span coverage, overlaps counted once — the Gopher
  *    "fraction of characters in duplicated n-grams" semantic).
  */
/** The ONE word tokenizer shared by every text kernel (RepetitionStats,
  * WordCounts) and documented as the contract of the SQL oracles: maximal
  * runs of code points whose SIMPLE lowercase mapping is ASCII `[a-z0-9]`.
  * Kept in one place so a Unicode-mapping fix can never drift between
  * kernels that promise identical tokenization. */
private[functions] object TextTok {
  def foreachWord(text: String)(f: String => Unit): Unit = {
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = text.length
    while (i < n) {
      val cp = text.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) sb.append(lc.toChar)
      else if (sb.length > 0) { f(sb.toString); sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) f(sb.toString)
  }
}

case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionStats.schema

  def compute(s: UTF8String): InternalRow = {
    val text = s.toString
    // ---- line stats (single scan, '\n' separators, empty lines dropped)
    val lineCounts = new java.util.HashMap[String, Int]()
    val lines = new scala.collection.mutable.ArrayBuffer[String](16)
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == '\n') {
        if (i > start) {
          val l = text.substring(start, i)
          lines += l
          lineCounts.merge(l, 1, Integer.sum)
        }
        start = i + 1
      }
      i += 1
    }
    var nLines = 0L; var lineChars = 0L; var dupLines = 0L; var dupLineChars = 0L
    lines.foreach { l =>
      val cp = l.codePointCount(0, l.length) // code points, like SQL length()
      nLines += 1; lineChars += cp
      if (lineCounts.get(l) >= 2) { dupLines += 1; dupLineChars += cp }
    }
    // ---- word tokenization (shared TextTok contract, surrogate-safe)
    val words = new scala.collection.mutable.ArrayBuffer[String](64)
    TextTok.foreachWord(text)(words += _)
    val w = words.length
    var wordChars = 0L
    words.foreach(wordChars += _.length)

    def windows(k: Int): Array[String] = {
      if (w < k) return Array.empty
      val out = new Array[String](w - k + 1)
      val b = new java.lang.StringBuilder(32)
      var j = 0
      while (j + k <= w) {
        b.setLength(0)
        var m = 0
        while (m < k) { if (m > 0) b.append(' '); b.append(words(j + m)); m += 1 }
        out(j) = b.toString
        j += 1
      }
      out
    }
    def topChars(k: Int): Long = {
      val win = windows(k)
      if (win.isEmpty) return 0L
      val counts = new java.util.HashMap[String, Int](win.length * 2)
      win.foreach(g => counts.merge(g, 1, Integer.sum))
      var bestG: String = null
      var bestC = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val g = e.getKey; val c = e.getValue
        val better = bestG == null || c > bestC ||
          (c == bestC && (g.length > bestG.length ||
            (g.length == bestG.length && g.compareTo(bestG) < 0)))
        if (better) { bestG = g; bestC = c }
      }
      bestC.toLong * bestG.length
    }
    def dupCoverage(k: Int): Long = {
      val win = windows(k)
      if (win.isEmpty) return 0L
      val counts = new java.util.HashMap[String, Int](win.length * 2)
      win.foreach(g => counts.merge(g, 1, Integer.sum))
      val covered = new Array[Boolean](w)
      var j = 0
      while (j < win.length) {
        if (counts.get(win(j)) >= 2) {
          var m = j
          while (m < j + k) { covered(m) = true; m += 1 }
        }
        j += 1
      }
      var chars = 0L
      j = 0
      while (j < w) { if (covered(j)) chars += words(j).length; j += 1 }
      chars
    }
    InternalRow(nLines, dupLines, dupLineChars, lineChars, w.toLong, wordChars,
      topChars(2), topChars(3), topChars(4), dupCoverage(5), dupCoverage(10))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repStats", this, classOf[RepetitionStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object RepetitionStats {
  val fieldNames: Seq[String] = Seq(
    "n_lines", "dup_lines", "dup_line_chars", "line_chars",
    "n_words", "word_chars",
    "top2_chars", "top3_chars", "top4_chars",
    "dup5_cov_chars", "dup10_cov_chars")
  val schema: StructType =
    StructType(fieldNames.map(StructField(_, LongType, nullable = false)))
}

/** Per-document term frequencies in ONE pass: distinct words (same
  * tokenization as [[RepetitionStats]] — simple-lowercase code points in
  * `[a-z0-9]`) with their in-document counts, sorted by term for
  * determinism. The in-row aggregation is what keeps TF computation off the
  * shuffle: an explode→groupBy(doc, term) formulation shuffles every token
  * occurrence, this shuffles nothing. */
case class WordCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", IntegerType, nullable = false))),
    containsNull = false)

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val text = s.toString
    val counts = new java.util.TreeMap[String, Int]()
    TextTok.foreachWord(text)(w => counts.merge(w, 1, Integer.sum))
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var m = 0
    while (it.hasNext) {
      val e = it.next()
      out(m) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordCounts", this, classOf[WordCounts].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Fixed-point unigram log-likelihood over a token array — the scoring
  * kernel of the KenLM-style quality filter (CCNet's perplexity gate,
  * Wenzek et al. 2020, with a unigram model in place of the 5-gram KenLM).
  * The vocabulary (term -> corpus count) is a BOUNDED driver-side map
  * (top-V terms), embedded in the expression and shipped once per executor
  * via the codegen reference object — scoring is a zero-shuffle projection.
  *
  * Per token: `round(ln(count / total) * 1e6)` summed as a long
  * (out-of-vocabulary terms score with count 1). Fixed-point per-term
  * rounding makes the sum order-independent and lets a SQL oracle derive
  * the identical integer from the same corpus. Returns
  * struct(logprob_fp, n_tok); empty arrays yield (0, 0).
  */
case class UnigramLogProbFp(
    child: Expression, vocab: Map[String, Long], total: Long)
    extends UnaryExpression {
  require(total > 0, "total token count must be positive")
  override def dataType: DataType = StructType(Seq(
    StructField("logprob_fp", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false)))

  @transient private lazy val fpByTerm: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (t, c) =>
      m.put(UTF8String.fromString(t),
        java.lang.Long.valueOf(math.round(math.log(c.toDouble / total) * 1e6)))
    }
    m
  }
  @transient private lazy val oovFp: Long =
    math.round(math.log(1.0 / total) * 1e6)

  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow = {
    val n = a.numElements()
    var sum = 0L
    var scored = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val fp = fpByTerm.get(a.getUTF8String(i))
        sum += (if (fp == null) oovFp else fp.longValue())
        scored += 1
      }
      i += 1
    }
    InternalRow(sum, scored)
  }
  override def nullSafeEval(x: Any): Any =
    compute(x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramLp", this, classOf[UnigramLogProbFp].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Fixed-point INTERPOLATED-BIGRAM log-likelihood over a token array — the
  * deeper CCNet-style scorer. Token i scores
  * `ln(0.5 * c(prev,cur)/c(prev) + 0.5 * c(cur)/N)` when `prev` is IN the
  * unigram vocabulary; the first token, and any token whose predecessor is
  * out-of-vocabulary, backs off to the plain unigram `ln(c(cur)/N)` (an
  * OOV-prev denominator fallback would make the bigram term exceed 1 and
  * emit POSITIVE log-likelihoods — backoff, not fabricated context).
  * Out-of-vocabulary `cur` counts as 1; absent bigrams as 0. Per-term
  * values round to the 1e-6 grid and sum as a long. Both vocabularies are
  * BOUNDED driver-side maps shipped once per executor; scoring stays a
  * zero-shuffle projection with UTF8String-keyed lookups (no per-token
  * String/concat churn — the bigram map is two-level prev -> cur -> count)
  * and precomputed fixed-point unigram scores for the backoff path. The
  * 0.5 weight is dyadic so the arithmetic mirrors exactly in a SQL oracle.
  * Constructor bigram keys join prev and cur with U+0001. Returns
  * struct(logprob_fp, n_tok). */
case class BigramLogProbFp(
    child: Expression, unigrams: Map[String, Long], bigrams: Map[String, Long],
    total: Long) extends UnaryExpression {
  require(total > 0, "total token count must be positive")
  override def dataType: DataType = StructType(Seq(
    StructField("logprob_fp", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false)))

  // counts for the interpolated path
  @transient private lazy val uniCnt: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](unigrams.size * 2)
    unigrams.foreach { case (t, c) =>
      m.put(UTF8String.fromString(t), java.lang.Long.valueOf(c)) }
    m
  }
  // precomputed fixed-point unigram scores for the backoff path
  @transient private lazy val uniFp: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](unigrams.size * 2)
    unigrams.foreach { case (t, c) =>
      m.put(UTF8String.fromString(t),
        java.lang.Long.valueOf(math.round(math.log(c.toDouble / total) * 1e6))) }
    m
  }
  @transient private lazy val oovFp: Long =
    math.round(math.log(1.0 / total) * 1e6)
  // two-level prev -> cur -> count (constructor keys are U+0001-joined)
  @transient private lazy val biCnt
      : java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]] = {
    val m = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]()
    bigrams.foreach { case (k, c) =>
      val sep = k.indexOf('\u0001')
      require(sep > 0, s"malformed bigram key: $k")
      val prev = UTF8String.fromString(k.substring(0, sep))
      val cur = UTF8String.fromString(k.substring(sep + 1))
      m.computeIfAbsent(prev, _ => new java.util.HashMap[UTF8String, java.lang.Long]())
        .put(cur, java.lang.Long.valueOf(c))
    }
    m
  }

  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow = {
    val n = a.numElements()
    var sum = 0L
    var scored = 0L
    var prev: UTF8String = null
    var prevCnt: java.lang.Long = null
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val cur = a.getUTF8String(i)
        val cuBoxed = uniCnt.get(cur)
        if (prevCnt == null) {
          // first token or OOV predecessor: plain unigram (precomputed fp)
          val fp = if (cuBoxed == null) oovFp else uniFp.get(cur).longValue()
          sum += fp
        } else {
          val cu = if (cuBoxed == null) 1L else cuBoxed.longValue()
          val curMap = biCnt.get(prev)
          val cbBoxed = if (curMap == null) null else curMap.get(cur)
          val cb = if (cbBoxed == null) 0L else cbBoxed.longValue()
          val p = 0.5 * (cb.toDouble / prevCnt.longValue()) +
            0.5 * (cu.toDouble / total)
          sum += math.round(math.log(p) * 1e6)
        }
        scored += 1
        prev = cur
        prevCnt = cuBoxed
      }
      i += 1
    }
    InternalRow(sum, scored)
  }
  override def nullSafeEval(x: Any): Any =
    compute(x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramLp", this, classOf[BigramLogProbFp].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Fixed-point INTERPOLATED-TRIGRAM log-likelihood — one rung past
  * [[BigramLogProbFp]] toward CCNet's 5-gram KenLM. Token i scores by the
  * LONGEST available context:
  *  - trigram interpolation `ln(0.5·c3(p2,p1,cur)/c2(p2,p1) +
  *    0.25·c2(p1,cur)/c1(p1) + 0.25·c1(cur)/N)` when p1 is in-vocab and
  *    (p2,p1) is a known bigram — every ratio <= 1 (exact counts of kept
  *    keys, numerator's support nested in denominator's) and the dyadic
  *    weights sum to 1, so p stays in (0,1];
  *  - the bigram interpolation `0.5·c2/c1 + 0.5·c1/N` when only p1 is
  *    known (identical arithmetic to [[BigramLogProbFp]]'s middle path);
  *  - plain unigram backoff otherwise (first token / OOV predecessor).
  * Absent bigrams/trigrams count 0; OOV `cur` counts 1. Per-term values
  * round to the 1e-6 grid and sum as a long — order-independent and
  * SQL-oracle-reproducible (left-associated `a*x + b*y + c*z` exactly as
  * written). All maps are BOUNDED driver-side vocabularies shipped once
  * per executor (nested UTF8String-keyed lookups, no per-token concat);
  * scoring is a zero-shuffle projection. Constructor n-gram keys join
  * components with U+0001. Returns struct(logprob_fp, n_tok). */
case class TrigramLogProbFp(
    child: Expression, unigrams: Map[String, Long], bigrams: Map[String, Long],
    trigrams: Map[String, Long], total: Long) extends UnaryExpression {
  require(total > 0, "total token count must be positive")
  override def dataType: DataType = StructType(Seq(
    StructField("logprob_fp", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false)))

  @transient private lazy val uniCnt: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](unigrams.size * 2)
    unigrams.foreach { case (t, c) =>
      m.put(UTF8String.fromString(t), java.lang.Long.valueOf(c)) }
    m
  }
  @transient private lazy val uniFp: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](unigrams.size * 2)
    unigrams.foreach { case (t, c) =>
      m.put(UTF8String.fromString(t),
        java.lang.Long.valueOf(math.round(math.log(c.toDouble / total) * 1e6))) }
    m
  }
  @transient private lazy val oovFp: Long =
    math.round(math.log(1.0 / total) * 1e6)
  // two-level prev -> cur -> count
  @transient private lazy val biCnt
      : java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]] = {
    val m = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]()
    bigrams.foreach { case (k, c) =>
      val sep = k.indexOf('\u0001')
      require(sep > 0, s"malformed bigram key: $k")
      val prev = UTF8String.fromString(k.substring(0, sep))
      val cur = UTF8String.fromString(k.substring(sep + 1))
      m.computeIfAbsent(prev, _ => new java.util.HashMap[UTF8String, java.lang.Long]())
        .put(cur, java.lang.Long.valueOf(c))
    }
    m
  }
  // three-level p2 -> p1 -> cur -> count
  @transient private lazy val triCnt: java.util.HashMap[UTF8String,
      java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]] = {
    val m = new java.util.HashMap[UTF8String,
      java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]]()
    trigrams.foreach { case (k, c) =>
      val s1 = k.indexOf('\u0001')
      val s2 = k.indexOf('\u0001', s1 + 1)
      require(s1 > 0 && s2 > s1, s"malformed trigram key: $k")
      val p2 = UTF8String.fromString(k.substring(0, s1))
      val p1 = UTF8String.fromString(k.substring(s1 + 1, s2))
      val cur = UTF8String.fromString(k.substring(s2 + 1))
      m.computeIfAbsent(p2,
          _ => new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]())
        .computeIfAbsent(p1, _ => new java.util.HashMap[UTF8String, java.lang.Long]())
        .put(cur, java.lang.Long.valueOf(c))
    }
    m
  }

  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow = {
    val n = a.numElements()
    var sum = 0L
    var scored = 0L
    var p1: UTF8String = null // previous token
    var p1Cnt: java.lang.Long = null // its unigram count (null = OOV/none)
    var p2: UTF8String = null // the token before that
    var prefCnt: java.lang.Long = null // bigram count of (p2, p1), null = unknown
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val cur = a.getUTF8String(i)
        val cuBoxed = uniCnt.get(cur)
        if (p1Cnt == null) {
          sum += (if (cuBoxed == null) oovFp else uniFp.get(cur).longValue())
        } else {
          val cu = if (cuBoxed == null) 1L else cuBoxed.longValue()
          val curMap = biCnt.get(p1)
          val cbBoxed = if (curMap == null) null else curMap.get(cur)
          val cb = if (cbBoxed == null) 0L else cbBoxed.longValue()
          val p =
            if (prefCnt == null)
              0.5 * (cb.toDouble / p1Cnt.longValue()) + 0.5 * (cu.toDouble / total)
            else {
              val m1 = triCnt.get(p2)
              val m2 = if (m1 == null) null else m1.get(p1)
              val ctBoxed = if (m2 == null) null else m2.get(cur)
              val ct = if (ctBoxed == null) 0L else ctBoxed.longValue()
              0.5 * (ct.toDouble / prefCnt.longValue()) +
                0.25 * (cb.toDouble / p1Cnt.longValue()) + 0.25 * (cu.toDouble / total)
            }
          sum += math.round(math.log(p) * 1e6)
        }
        scored += 1
        // shift context: the NEW (p2, p1) is (old p1, cur)
        prefCnt = {
          val m = if (p1 == null) null else biCnt.get(p1)
          if (m == null) null else m.get(cur)
        }
        p2 = p1
        p1 = cur
        p1Cnt = cuBoxed
      }
      i += 1
    }
    InternalRow(sum, scored)
  }
  override def nullSafeEval(x: Any): Any =
    compute(x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trigramLp", this, classOf[TrigramLogProbFp].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** One node of the shared n-gram count trie backing [[NgramLogProbFp]]:
  * `count` is the exact corpus count of the path's n-gram if that n-gram
  * was KEPT in its level's bounded vocabulary, or -1 when the node exists
  * only as the prefix of a longer kept n-gram (its own count fell outside
  * the top-K — "unknown", which breaks the context chain there exactly the
  * way a NULL join against that level's vocabulary does in the oracle). */
private[functions] final class NgramTrieNode {
  var count: Long = -1L
  var children: java.util.HashMap[UTF8String, NgramTrieNode] = null
  def child(k: UTF8String): NgramTrieNode =
    if (children == null) null else children.get(k)
  def ensureChild(k: UTF8String): NgramTrieNode = {
    if (children == null) children = new java.util.HashMap[UTF8String, NgramTrieNode]()
    var n = children.get(k)
    if (n == null) { n = new NgramTrieNode; children.put(k, n) }
    n
  }
}

/** Fixed-point interpolated ORDER-N log-likelihood — the parameterized
  * generalization of [[UnigramLogProbFp]] / [[BigramLogProbFp]] /
  * [[TrigramLogProbFp]] to any n-gram order (order 5 = the published CCNet
  * filter shape, a 5-gram KenLM; Wenzek et al. 2020). `grams(j)` holds the
  * bounded (j+1)-gram vocabulary (U+0001-joined keys -> exact corpus
  * counts); `order = grams.length`.
  *
  * Token scoring dispatches on the LONGEST available context: L = the
  * largest j such that the context counts c_1(p_1), c_2(p_2,p_1), …,
  * c_j(p_j..p_1) are ALL known (a truncation hole at any level breaks the
  * chain there — same contiguity the per-level NULL-join checks give the
  * SQL oracle). The score is then
  * `ln( 0.5·r_L + 0.25·r_{L-1} + … + 0.5^L·r_1 + 0.5^L·c_1(cur)/N )`
  * left-associated highest-context-first, where
  * `r_j = c_{j+1}(p_j..p_1, cur) / c_j(p_j..p_1)` (absent numerators 0,
  * OOV `cur` counts 1). Every ratio <= 1 (kept counts are exact and the
  * numerator's support nests in the denominator's) and the dyadic weights
  * sum to 1, so p stays in (0,1]; the dyadic weights and fixed left
  * association make the IEEE arithmetic mirror exactly in SQL. L = 0
  * (first token / OOV predecessor) scores the plain unigram. Per-term
  * values round to the 1e-6 grid and sum as a long (order-independent).
  *
  * For orders 1-3 this reproduces the dedicated kernels bit-for-bit
  * (asserted in Round5Spec). All vocabularies live in ONE trie built
  * lazily from the expression's maps; scoring is a zero-shuffle
  * projection with O(order) pointer-walk lookups per token and zero
  * per-token allocation (context nodes roll forward — the new length-j
  * context node is the old length-(j-1) node's `cur` child).
  *
  * MODEL-SIZE budget: the maps serialize inside the expression and the
  * transient trie rebuilds per deserialized task instance, so total
  * entries across levels should stay in the low hundreds of thousands
  * (measured: ~250 k entries is comfortable; an 850 k-entry model
  * GC-froze a 16-core driver). A KenLM-scale model (tens of millions of
  * n-grams) needs an executor-shared representation — a broadcast
  * variable with a JVM-level cache, or an off-heap/file-backed store —
  * behind the same scoring contract; the bounded-vocabulary form here is
  * the CCNet-style filter at the sizes its published pipeline uses for
  * per-language reference models. Returns struct(logprob_fp, n_tok). */
case class NgramLogProbFp(
    child: Expression, grams: Seq[Map[String, Long]], total: Long)
    extends UnaryExpression {
  require(total > 0, "total token count must be positive")
  require(grams.nonEmpty, "need at least the unigram vocabulary")
  def order: Int = grams.length
  override def dataType: DataType = StructType(Seq(
    StructField("logprob_fp", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false)))

  @transient private lazy val scorer = new NgramScorer(grams, total)

  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow =
    scorer.score(a)
  override def nullSafeEval(x: Any): Any =
    compute(x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramLp", this, classOf[NgramLogProbFp].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** EXECUTOR-SHARED form of [[NgramLogProbFp]] — identical arithmetic, but
  * the vocabulary maps ride a Spark BROADCAST (shipped once per executor,
  * torrent-distributed) and the scoring trie builds ONCE PER EXECUTOR JVM
  * (soft-referenced cache keyed by broadcast id) instead of once per task.
  * This lifts the embedded form's measured model-size ceiling (~250 k
  * entries; an 850 k-entry embedded model GC-froze a 16-core driver) to
  * KenLM-class sizes bounded only by executor memory — the form a real
  * CCNet-scale reference model deploys with. Scoring is still a
  * zero-shuffle codegen'd projection. */
case class NgramLogProbFpBroadcast(
    child: Expression,
    model: org.apache.spark.broadcast.Broadcast[(Seq[Map[String, Long]], Long)])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("logprob_fp", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false)))

  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow =
    NgramScorer.cached(model).score(a)
  override def nullSafeEval(x: Any): Any =
    compute(x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramLpBc", this, classOf[NgramLogProbFpBroadcast].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** The order-N scoring core shared by the embedded and broadcast kernels:
  * trie + precomputed unigram backoff scores + the longest-context
  * dispatch loop. Built eagerly at construction; never serialized (each
  * kernel decides how the MAPS travel and when to build). */
private[functions] final class NgramScorer(grams: Seq[Map[String, Long]], total: Long) {
  require(total > 0, "total token count must be positive")
  require(grams.nonEmpty, "need at least the unigram vocabulary")
  val order: Int = grams.length

  private val root: NgramTrieNode = {
    val r = new NgramTrieNode
    var level = 0
    while (level < grams.length) {
      grams(level).foreach { case (k, c) =>
        val parts = k.split('\u0001')
        require(parts.length == level + 1,
          s"level-${level + 1} key with ${parts.length} components: $k")
        var node = r
        parts.foreach(p => node = node.ensureChild(UTF8String.fromString(p)))
        node.count = c
      }
      level += 1
    }
    r
  }
  // precomputed fixed-point unigram scores for the L=0 backoff path
  private val uniFp: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](grams.head.size * 2)
    grams.head.foreach { case (t, c) =>
      m.put(UTF8String.fromString(t),
        java.lang.Long.valueOf(math.round(math.log(c.toDouble / total) * 1e6))) }
    m
  }
  private val oovFp: Long =
    math.round(math.log(1.0 / total) * 1e6)

  def score(a: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow = {
    val maxCtx = order - 1
    // ctxNode(j) = trie node of the length-j context (p_j .. p_1); index 0 unused
    val ctxNode = new Array[NgramTrieNode](maxCtx + 1)
    var chain = 0 // longest j with ctxNode(1..j) all carrying known counts
    val n = a.numElements()
    var sum = 0L
    var scored = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val cur = a.getUTF8String(i)
        val curUni = root.child(cur)
        val curKnown = curUni != null && curUni.count >= 0
        if (chain == 0) {
          sum += (if (curKnown) uniFp.get(cur).longValue() else oovFp)
        } else {
          val cu = if (curKnown) curUni.count else 1L
          var w = 0.5
          var p = 0.0
          var j = chain
          while (j >= 1) {
            val ctx = ctxNode(j)
            val numNode = ctx.child(cur)
            val num = if (numNode == null || numNode.count < 0) 0L else numNode.count
            p += w * (num.toDouble / ctx.count)
            if (j > 1) w *= 0.5
            j -= 1
          }
          p += w * (cu.toDouble / total)
          sum += math.round(math.log(p) * 1e6)
        }
        scored += 1
        // roll the context forward: new length-j context ends at cur
        var j = maxCtx
        while (j >= 2) {
          val prev = ctxNode(j - 1)
          ctxNode(j) = if (prev == null) null else prev.child(cur)
          j -= 1
        }
        if (maxCtx >= 1) ctxNode(1) = curUni
        chain = 0
        while (chain < maxCtx && ctxNode(chain + 1) != null &&
            ctxNode(chain + 1).count >= 0) chain += 1
      }
      i += 1
    }
    InternalRow(sum, scored)
  }
}

private[graft] object NgramScorer {
  // once-per-JVM scorer per broadcast model: soft refs so an executor under
  // memory pressure can shed an idle model and rebuild on next use.
  // Keyed by (application id, broadcast id), NOT broadcast id alone:
  // broadcast ids are a per-SparkContext counter, so in a long-lived JVM
  // that restarts its session (notebook, test harness) a new context's
  // broadcast N would otherwise hit the old context's cached scorer and
  // silently score with the wrong model. (The Broadcast INSTANCE can't be
  // the key — each task deserializes its own wrapper, which would rebuild
  // per task and defeat the cache.)
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), java.lang.ref.SoftReference[NgramScorer]]()
  /** Build count — test observability for the once-per-JVM contract. */
  private[graft] val builds = new java.util.concurrent.atomic.AtomicLong(0)

  private def appId(): String = {
    val env = org.apache.spark.SparkEnv.get
    if (env == null) "" else env.conf.getAppId
  }

  def cached(
      bc: org.apache.spark.broadcast.Broadcast[(Seq[Map[String, Long]], Long)]): NgramScorer = {
    val key = (appId(), bc.id)
    val ref = cache.get(key)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) hit
    else cache.synchronized {
      val again = { val r = cache.get(key); if (r == null) null else r.get() }
      if (again != null) again
      else {
        val (grams, total) = bc.value
        val s = new NgramScorer(grams, total)
        builds.incrementAndGet()
        cache.put(key, new java.lang.ref.SoftReference(s))
        s
      }
    }
  }
}

object TextFunctions {
  import org.apache.spark.sql.GraftShim
  def repetition_stats(text: Column): Column =
    GraftShim.column(RepetitionStats(GraftShim.expression(text)))
  def word_counts(text: Column): Column =
    GraftShim.column(WordCounts(GraftShim.expression(text)))
  def unigram_logprob_fp(tokens: Column, vocab: Map[String, Long], total: Long): Column =
    GraftShim.column(UnigramLogProbFp(GraftShim.expression(tokens), vocab, total))
  def bigram_logprob_fp(tokens: Column, unigrams: Map[String, Long],
      bigrams: Map[String, Long], total: Long): Column =
    GraftShim.column(BigramLogProbFp(GraftShim.expression(tokens), unigrams, bigrams, total))
  def trigram_logprob_fp(tokens: Column, unigrams: Map[String, Long],
      bigrams: Map[String, Long], trigrams: Map[String, Long], total: Long): Column =
    GraftShim.column(TrigramLogProbFp(GraftShim.expression(tokens), unigrams, bigrams,
      trigrams, total))
  def ngram_logprob_fp(tokens: Column, grams: Seq[Map[String, Long]], total: Long): Column =
    GraftShim.column(NgramLogProbFp(GraftShim.expression(tokens), grams, total))
  def ngram_logprob_fp_broadcast(tokens: Column,
      model: org.apache.spark.broadcast.Broadcast[(Seq[Map[String, Long]], Long)]): Column =
    GraftShim.column(NgramLogProbFpBroadcast(GraftShim.expression(tokens), model))
}
