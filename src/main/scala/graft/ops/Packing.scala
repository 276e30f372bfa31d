package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One packed training context. `truncated` marks packs built from a single
  * over-length input (visible, never silent). */
final case class PackedSeq(
    pack_id: Long,
    doc_ids: Seq[String],
    tokens: Seq[Int],
    n_tok: Int,
    n_docs: Int,
    truncated: Boolean)

/** Sequence CHUNKING + PACKING — the standard shaping step between a
  * validated corpus and training shards: long documents split into
  * ≤`context`-token chunks, then chunks greedily packed into fixed-size
  * contexts so padding waste is bounded.
  *
  * Scale shape:
  *  - [[chunkLongSequences]] is a pure narrow projection + explode (no
  *    state, no shuffle) — expressible entirely in Catalyst.
  *  - [[packSequences]] is ONE hash repartition + a partition-local greedy
  *    fold (`mapPartitions` — justified: running bin fill is inherently
  *    sequential state, not expressible as a window function). Rows stream
  *    through the fold with O(one pack) memory; nothing per-partition is
  *    buffered.
  *
  * Determinism: rows route to packing partitions by hash(id) and are sorted
  * within partitions by a hash of (id, tokens) — partition CONTENT and ORDER
  * are pure functions of the data and `buckets` (duplicate-id rows with
  * different payloads included), so pack membership is identical at any
  * cluster parallelism and across reruns (the north rule's N vs 4N
  * reproducibility applies to the shaping step too). Pack ids are
  * content-derived (running hash over the full member list, plus a
  * deterministic duplicate-membership ordinal so legitimately repeated
  * packs stay distinct), never `spark_partition_id`/
  * `monotonically_increasing_id` (both partitioning-dependent).
  */
object Packing {

  /** Membership hash shared by both packers: running hash over all member
    * ids plus total token length, FOLDED WITH the members' token contents
    * (`tokMix`) — duplicate ids with DIFFERENT payloads (chunked docs,
    * re-crawled versions) are legal input, so an id-only hash would let two
    * packs with the same ids/length but different tokens collide, and they
    * need not be emitted consecutively (the consecutive-duplicate ordinal
    * below only covers packs whose full content is identical — those DO
    * sort adjacently). */
  private def contentHash(memberIds: Seq[String], nTok: Int, tokMix: Long): Long = {
    var h = 0xcbf29ce484222325L ^ tokMix
    memberIds.foreach { id =>
      h = graft.functions.HashMix.mix(h ^ graft.functions.HashMix.hashUtf8(
        org.apache.spark.unsafe.types.UTF8String.fromString(id)))
    }
    graft.functions.HashMix.mix(h ^ nTok)
  }

  /** Fold a member's token content into a pack's running token hash. */
  private def foldTokens(h0: Long, toks: Seq[Int]): Long = {
    var h = graft.functions.HashMix.mix(h0 ^ toks.length)
    toks.foreach(t => h = graft.functions.HashMix.mix(h ^ t))
    h
  }

  /** Split sequences longer than `context` into consecutive ≤`context`
    * chunks: (idCol, chunk_idx, tokens, n_tok). Short sequences pass
    * through as chunk 0. Null/empty token arrays are dropped (nothing to
    * train on); count them upstream if that matters. */
  def chunkLongSequences(df: DataFrame, tokensCol: String, idCol: String,
      context: Int): DataFrame = {
    require(context > 0, "context > 0")
    val toks = col(tokensCol)
    df.filter(toks.isNotNull && size(toks) > 0)
      .select(
        col(idCol),
        posexplode(transform(
          sequence(lit(0), ((size(toks) - 1) / context).cast(IntegerType)),
          i => slice(toks, i * context + 1, lit(context)))).as(Seq("chunk_idx", "tokens")))
      .select(col(idCol), col("chunk_idx"),
        col("tokens"), size(col("tokens")).as("n_tok"))
  }

  /** Greedily pack sequences (each ≤ `context` tokens after
    * [[chunkLongSequences]]) into contexts of at most `context` tokens,
    * optionally separated by `sep` (e.g. an EOS token) BETWEEN documents.
    * Inputs longer than `context` are emitted as single-doc packs truncated
    * to `context` with `truncated = true` — never silently dropped.
    *
    * `buckets` bounds packing locality: rows pack only with rows of their
    * id-hash class (one class per packing partition), so pack membership
    * never depends on cluster parallelism.
    * Expected waste per pack is O(mean sequence length / 2); for tighter
    * fill use [[packSequencesFFD]] (first-fit-decreasing, same determinism
    * guarantees, bounded extra memory). */
  def packSequences(df: DataFrame, tokensCol: String, idCol: String,
      context: Int, buckets: Int = 1024, sep: Option[Int] = None): Dataset[PackedSeq] = {
    require(context > 0 && buckets > 0, "context > 0, buckets > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val sepCost = if (sep.isDefined) 1 else 0
    // partition = one id-hash residue class (repartition(n, col) IS hash
    // partitioning — no second hash layer that would skew partition loads);
    // within-partition order ties break on the TOKEN content too, so
    // duplicate ids with different payloads (which real corpora and the
    // synthetic fixture both contain) still order deterministically.
    // Identical full rows remain interchangeable — harmless.
    val prepared = df
      .select(col(idCol).cast(StringType).as("id"),
        col(tokensCol).cast(ArrayType(IntegerType)).as("toks"))
      .filter(col("toks").isNotNull && size(col("toks")) > 0 && col("id").isNotNull)
      .withColumn("__h", xxhash64(col("id"), col("toks"), lit(0x9ac4L)))
      .repartition(buckets, col("id"))
      .sortWithinPartitions(col("__h"), col("id"))
      .select(col("id"), col("toks"))
      .as[(String, Seq[Int])]

    // pack id = running hash over member ids + token CONTENTS + total
    // length, then a duplicate-content ordinal mixed in: two DISTINCT packs
    // with identical full content (fully duplicated rows filling a bucket,
    // or duplicate over-length rows each emitting a truncated single-doc
    // pack) are legitimate and must not collide. Identical-CONTENT packs
    // are always emitted CONSECUTIVELY — the within-partition sort groups
    // identical rows adjacently and pack membership is a contiguous slice of
    // the sorted stream — so an O(1) consecutive-duplicate counter (no
    // per-partition map) makes pack_id a true unique key, deterministically:
    // the ordinal is a pure function of the sorted stream. (Same-id packs
    // with DIFFERENT payloads can recur non-consecutively — that is why the
    // token contents are in the hash, not handled by the ordinal.)
    prepared.mapPartitions { rows =>
      new Iterator[PackedSeq] {
        private val ids = scala.collection.mutable.ArrayBuffer.empty[String]
        private val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
        private val out = scala.collection.mutable.Queue.empty[PackedSeq] // ≤ 2 entries
        private var tokMix = 0L // running hash of member token CONTENTS
        private var lastContentHash = 0L
        private var dupOrdinal = 0
        private def packIdOf(base: Long): Long = {
          if (base == lastContentHash) dupOrdinal += 1
          else { lastContentHash = base; dupOrdinal = 0 }
          if (dupOrdinal == 0) base
          else graft.functions.HashMix.mix(base ^ dupOrdinal)
        }
        private def closePack(): Unit =
          if (ids.nonEmpty) {
            out.enqueue(PackedSeq(packIdOf(contentHash(ids.toSeq, buf.length, tokMix)),
              ids.toSeq, buf.toSeq, buf.length, ids.length, truncated = false))
            ids.clear(); buf.clear(); tokMix = 0L
          }
        private def fill(): Unit = {
          while (out.isEmpty && rows.hasNext) {
            val (id, toks) = rows.next()
            if (toks.length > context) {
              closePack() // emit the open pack first, keep stream order
              // hash the FULL token array, not the clipped prefix: two
              // same-id over-length rows differing only PAST the truncation
              // point sort non-adjacently (the sort hash covers all tokens),
              // so a prefix-only hash would recreate the collision the
              // content fold exists to prevent
              out.enqueue(PackedSeq(
                packIdOf(contentHash(Seq(id), context, foldTokens(0L, toks))),
                Seq(id), toks.take(context), context, 1, truncated = true))
            } else {
              val cost = toks.length + (if (ids.isEmpty) 0 else sepCost)
              if (buf.length + cost > context) closePack()
              if (ids.nonEmpty) sep.foreach(buf += _)
              ids += id
              buf ++= toks
              tokMix = foldTokens(tokMix, toks)
            }
          }
          if (out.isEmpty && !rows.hasNext) closePack()
        }
        override def hasNext: Boolean = { fill(); out.nonEmpty }
        override def next(): PackedSeq = { fill(); out.dequeue() }
      }
    }
  }

  /** LENGTH-AWARE packing: first-fit-decreasing over a bounded pool of open
    * bins. Rows sort within each bucket by token length DESC (content-hash
    * tie-breaks), each row drops into the FIRST open bin it fits (the
    * big-items-first classic that closes most of greedy's tail waste); when
    * no bin fits and the pool is at `openBins`, the fullest bin is emitted
    * to make room. Fill is ≥ the greedy packer's on mixed-length inputs at
    * the cost of O(openBins · context) ints of state — still streaming,
    * still O(1) in partition size, and still a pure function of the data:
    * the sorted stream is content-deterministic, so bin membership and the
    * per-partition bin birth ordinal (mixed into pack_id — FFD can emit
    * identical-membership bins non-consecutively, so the greedy packer's
    * consecutive-duplicate counter would not guarantee uniqueness here)
    * are identical at any parallelism. Same contract otherwise: over-length
    * inputs truncate VISIBLY, `sep` costs one token between documents. */
  def packSequencesFFD(df: DataFrame, tokensCol: String, idCol: String,
      context: Int, buckets: Int = 1024, sep: Option[Int] = None,
      openBins: Int = 64): Dataset[PackedSeq] = {
    require(context > 0 && buckets > 0 && openBins > 0,
      "context > 0, buckets > 0, openBins > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val sepCost = if (sep.isDefined) 1 else 0
    val prepared = df
      .select(col(idCol).cast(StringType).as("id"),
        col(tokensCol).cast(ArrayType(IntegerType)).as("toks"))
      .filter(col("toks").isNotNull && size(col("toks")) > 0 && col("id").isNotNull)
      .withColumn("__h", xxhash64(col("id"), col("toks"), lit(0x9ac4L)))
      .withColumn("__len", size(col("toks")))
      .repartition(buckets, col("id"))
      .sortWithinPartitions(desc("__len"), col("__h"), col("id"))
      .select(col("id"), col("toks"))
      .as[(String, Seq[Int])]

    prepared.mapPartitions { rows =>
      final class Bin(val birth: Long) {
        val ids = scala.collection.mutable.ArrayBuffer.empty[String]
        val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
        var tokMix = 0L
        def fits(n: Int): Boolean =
          buf.length + n + (if (ids.isEmpty) 0 else sepCost) <= context
        def add(id: String, toks: Seq[Int]): Unit = {
          if (ids.nonEmpty) sep.foreach(buf += _)
          ids += id
          buf ++= toks
          tokMix = foldTokens(tokMix, toks)
        }
        def emit(): PackedSeq =
          PackedSeq(
            graft.functions.HashMix.mix(contentHash(ids.toSeq, buf.length, tokMix) ^ birth),
            ids.toSeq, buf.toSeq, buf.length, ids.length, truncated = false)
      }
      new Iterator[PackedSeq] {
        private val bins = scala.collection.mutable.ArrayBuffer.empty[Bin]
        private val out = scala.collection.mutable.Queue.empty[PackedSeq]
        private var nextBirth = 0L
        private var flushed = false
        private def newBin(): Bin = {
          val b = new Bin(nextBirth); nextBirth += 1; bins += b; b
        }
        private def fill(): Unit = {
          while (out.isEmpty && rows.hasNext) {
            val (id, toks) = rows.next()
            if (toks.length > context) {
              // longest rows arrive first in desc order; truncated packs
              // also carry a birth ordinal for global uniqueness
              val birth = nextBirth; nextBirth += 1
              out.enqueue(PackedSeq(
                graft.functions.HashMix.mix(
                  contentHash(Seq(id), context, foldTokens(0L, toks)) ^ birth),
                Seq(id), toks.take(context), context, 1, truncated = true))
            } else {
              bins.find(_.fits(toks.length)) match {
                case Some(b) => b.add(id, toks)
                case None =>
                  if (bins.length >= openBins) {
                    // evict the FULLEST bin (ties: lowest index) — it is the
                    // least likely to accept future (smaller) rows anyway
                    val idx = bins.indices.maxBy(i => (bins(i).buf.length, -i))
                    out.enqueue(bins.remove(idx).emit())
                  }
                  newBin().add(id, toks)
              }
            }
          }
          if (out.isEmpty && !rows.hasNext && !flushed) {
            bins.foreach(b => out.enqueue(b.emit()))
            bins.clear()
            flushed = true
          }
        }
        override def hasNext: Boolean = { fill(); out.nonEmpty }
        override def next(): PackedSeq = { fill(); out.dequeue() }
      }
    }
  }
}
