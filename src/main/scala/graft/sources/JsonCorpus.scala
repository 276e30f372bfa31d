package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** CSV corpus source — same contract as [[JsonCorpus]]: explicit schema,
  * PERMISSIVE parse, malformed rows surface as counted corrupt lines.
  * CSV's failure modes differ from JSON's (wrong column COUNT, unclosed
  * quotes, type mismatches), but the pipeline-side rule is identical:
  * never silently drop a line. */
object CsvCorpus {

  val CorruptCol = "_corrupt"

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

  /** (valid rows, corrupt raw lines) — corrupt side via text scan +
    * from_csv for the same pruning-restriction reason as
    * [[JsonCorpus.readSplit]]. With `header=true` the first line of EVERY
    * file is dropped from both sides. */
  def readSplit(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false, sep: String = ","): (DataFrame, DataFrame) = {
    val valid = read(spark, path, schema, header, sep)
      .filter(col(CorruptCol).isNull).drop(CorruptCol)
    val opts = Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol,
      "sep" -> sep)
    val headerFilter =
      if (header) {
        // drop each file's first line (the CSV reader consumed it as header)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(input_file_name())
          .orderBy(monotonically_increasing_id())
        (df: DataFrame) => df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") > 1).drop("__rn")
      } else identity[DataFrame] _
    val parsed = headerFilter(spark.read.text(path))
      .select(col("value"),
        from_csv(col("value"), schema.add(CorruptCol, StringType, nullable = true),
          opts).as("j"))
    val corrupt = parsed
      .filter(col("j").isNull || col(s"j.$CorruptCol").isNotNull)
      .select(col("value").as(CorruptCol))
    (valid, corrupt)
  }
}

/** JSONL corpus source — the reference's NATIVE input form (tamasfe/verify
  * validates in-memory JSON/serde values; `verify/examples/schemars_json.rs`
  * parses JSON documents). The engine-side rule: parse with an EXPLICIT
  * schema and PERMISSIVE corrupt-record capture, so a malformed line becomes
  * a visible row (data columns null, raw line preserved) that the caller
  * counts — never a silent drop, and never a schema-inference pass over
  * 100 TB (inference reads the data twice and types drift per partition).
  */
object JsonCorpus {

  val CorruptCol = "_corrupt"

  /** Read newline-delimited JSON with `schema` + a corrupt-record column.
    * One narrow scan; JSON parsing is per-row and embarrassingly parallel. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    spark.read
      .schema(schema.add(CorruptCol, StringType, nullable = true))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** (valid rows without the corrupt column, corrupt raw lines).
    *
    * The corrupt side is derived from a TEXT scan + `from_json`, not from
    * the JSON scan: Spark refuses any JSON-scan plan whose referenced
    * columns prune down to only the corrupt record column (which is exactly
    * what `corrupt.count()` does), and the documented cache() workaround
    * would pin the whole parsed corpus. Whitespace-only lines are skipped
    * to mirror the JSON reader's behavior. */
  def readSplit(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    val valid = read(spark, path, schema).filter(col(CorruptCol).isNull).drop(CorruptCol)
    // NOT trim(): SQL trim strips only 0x20, so a tab-only line would be
    // counted corrupt while the JSON reader skips it — require a
    // non-whitespace char instead
    val parsed = spark.read.text(path)
      .filter(col("value").rlike("\\S"))
      .select(col("value"),
        from_json(col("value"), schema.add(CorruptCol, StringType, nullable = true),
          java.util.Map.of("mode", "PERMISSIVE",
            "columnNameOfCorruptRecord", CorruptCol)).as("j"))
    val corrupt = parsed
      .filter(col("j").isNull || col(s"j.$CorruptCol").isNotNull)
      .select(col("value").as(CorruptCol))
    (valid, corrupt)
  }
}
