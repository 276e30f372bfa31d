package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Shared tail of the corpus readSplits: given the (value, j) parse frame,
  * produce (valid rows, corrupt raw lines). One implementation so a
  * semantics fix can never drift between the CSV and JSONL sources.
  * Fields extract via getField (not a "j.$f" path string, which would
  * misparse dotted/backticked field names as nested paths). */
private[sources] object SourceSplit {
  def apply(parsed: DataFrame, schema: StructType, corruptCol: String)
      : (DataFrame, DataFrame) = {
    val valid = parsed
      .filter(col("j").isNotNull && col("j").getField(corruptCol).isNull)
      .select(schema.fieldNames.map(f => col("j").getField(f).as(f)).toSeq: _*)
    val corrupt = parsed
      .filter(col("j").isNull || col("j").getField(corruptCol).isNotNull)
      .select(col("value").as(corruptCol))
    (valid, corrupt)
  }
}

/** CSV corpus source — same contract as [[JsonCorpus]]: explicit schema,
  * malformed rows surface as counted corrupt lines. CSV's failure modes
  * differ from JSON's (wrong column COUNT, unclosed quotes, type
  * mismatches), but the pipeline-side rule is identical: never silently
  * drop a PARSEABLE line (truly blank / whitespace-only lines are skipped
  * by the CSV reader itself and are therefore outside the accounting on
  * both sides). */
object CsvCorpus {

  val CorruptCol = "_corrupt"

  /** Raw PERMISSIVE read with the corrupt-record column attached. NOTE
    * Spark's restriction: a query over this frame whose referenced columns
    * prune down to ONLY the corrupt column (e.g.
    * `filter(_corrupt.isNotNull).count()`) throws — use [[readSplit]],
    * whose two sides are built to avoid it. */
  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false, sep: String = ","): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    spark.read
      .schema(schema.add(CorruptCol, StringType, nullable = true))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .option("sep", sep)
      .csv(path)
  }

  /** (valid rows, corrupt raw lines). BOTH sides derive from ONE text scan
    * + `from_csv` parse, so they share a single corruption judgment and
    * neither trips Spark's only-corrupt-column pruning restriction
    * (`count()` is safe on either). The native CSV reader is deliberately
    * NOT used for the valid side: its column pruning skips parsing unneeded
    * fields, so `DROPMALFORMED.count()` counts malformed lines as valid —
    * a mode/pruning interaction that would make the two sides disagree.
    * With `header=true` the first line of every file is POSITIVELY
    * detected and excluded in the same single scan — never a whole-corpus
    * window sort, and no self-join whose two subtrees must split the input
    * identically (the previous design leaned on
    * `monotonically_increasing_id` reproducing across two scans of the same
    * files: true under today's planner, but an undocumented dependency on
    * split ordering that AQE or input-split drift could break, with the
    * failure mode of dropping a DATA line). A whitespace-only first line IS
    * the header (header-drop precedes the blank-line filter) — the header
    * row is whatever physically occupies line 1. Truly blank /
    * whitespace-only lines elsewhere are outside the accounting (the CSV
    * format has no row there). */
  def readSplit(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false, sep: String = ","): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val opts = Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol,
      "sep" -> sep)
    // blank/whitespace-only lines: skipped by the CSV reader, so skip them
    // here too (from_csv would otherwise parse them to all-null rows)
    val raw = spark.read.text(path).filter(col("value").rlike("\\S"))
    val headerless =
      if (header) {
        // a row is its file's first line iff it is the FIRST row of a split
        // whose byte offset is 0 (`_metadata.file_block_start`) — detected
        // per-partition by (file, block) transition tracking. FileScanRDD
        // delivers each split's rows contiguously and in file order within
        // a task, and a file's offset-0 split exists exactly once, so this
        // is a property of the DATA, not of planner split ordering. One
        // scan, no join, no shuffle.
        import spark.implicits._
        spark.read.text(path)
          .select(col("value"), col("_metadata.file_path").as("__f"),
            col("_metadata.file_block_start").as("__b"))
          .as[(String, String, Long)]
          .mapPartitions { it =>
            var prevFile: String = null
            var prevBlock = -1L
            it.flatMap { case (v, f, b) =>
              val first = b == 0L && (prevFile == null || f != prevFile || b != prevBlock)
              prevFile = f; prevBlock = b
              if (first) None else Some(v)
            }
          }
          .toDF("value")
          .filter(col("value").rlike("\\S"))
      } else raw
    val parsed = headerless.select(col("value"),
      from_csv(col("value"), schema.add(CorruptCol, StringType, nullable = true),
        opts).as("j"))
    SourceSplit(parsed, schema, CorruptCol)
  }
}

/** JSONL corpus source — the reference's NATIVE input form (tamasfe/verify
  * validates in-memory JSON/serde values; `verify/examples/schemars_json.rs`
  * parses JSON documents). The engine-side rule: parse with an EXPLICIT
  * schema and corrupt-record accounting, so a malformed line becomes a
  * counted, visible artifact — never a silent drop, and never a
  * schema-inference pass over 100 TB (inference reads the data twice and
  * types drift per partition).
  */
object JsonCorpus {

  val CorruptCol = "_corrupt"

  /** Raw PERMISSIVE read with the corrupt-record column attached. Same
    * pruning-restriction caveat as [[CsvCorpus.read]] — prefer
    * [[readSplit]] for anything that counts either side. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    spark.read
      .schema(schema.add(CorruptCol, StringType, nullable = true))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** (valid rows, corrupt raw lines). BOTH sides derive from ONE text scan
    * + `from_json` parse — a single corruption judgment, and neither side
    * can trip Spark's only-corrupt-column pruning restriction (`count()`
    * is safe on both). The native JSON reader is deliberately NOT used:
    * under column pruning (e.g. a bare count()) it skips field conversion,
    * so PERMISSIVE/DROPMALFORMED would judge a type-mismatched line VALID
    * for some queries and corrupt for others — the two sides would drift.
    * Whitespace-only lines are outside the accounting (the format has no
    * row there; filtered via a non-whitespace rlike, NOT trim(), which
    * strips only 0x20). */
  def readSplit(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val parsed = spark.read.text(path)
      .filter(col("value").rlike("\\S"))
      .select(col("value"),
        from_json(col("value"), schema.add(CorruptCol, StringType, nullable = true),
          java.util.Map.of("mode", "PERMISSIVE",
            "columnNameOfCorruptRecord", CorruptCol)).as("j"))
    SourceSplit(parsed, schema, CorruptCol)
  }
}
