package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Versioned storage for FROZEN suites — the config half of the loop
  * [[MetricsRepo]] closes for metrics: each accepted suite version is one
  * immutable draft-07 JSON document under `version=<seq>/suite.json` with a
  * crash-safe marker ([[MetricsRepo]]'s protocol: the marker is written
  * only after the document is fully on storage, so a killed append can
  * never serve a truncated schema as config). Tiny driver-side files —
  * no Spark jobs; the suite JSON is KB-scale config, not data.
  *
  * The intended gate, per docs/DEPLOY.md "Suites as versioned config":
  * {{{
  * val prev = SuiteRepo.loadLatest(spark, repo, keyCol, Some(schema))
  * val changes = prev.map(p => SuiteDiff.diff(p._2, candidate)).getOrElse(Nil)
  * // human or policy reviews `changes`, then:
  * SuiteRepo.append(spark, repo, candidate)
  * }}}
  */
object SuiteRepo {

  private def hfs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Render `suite` and append it as the next version. Returns the version
    * written. Unrenderable suites fail loudly ([[JsonSchemaRender.render]]'s
    * contract) — nothing is written.
    *
    * Concurrency: the version DOCUMENT is created with overwrite=false, so
    * two appenders that both computed v = latest+1 cannot silently swap
    * each other's bytes (the round-5 check-then-act race): the loser's
    * create fails and it RETRIES at the next version number. The marker is
    * still written only after the document is fully on storage. */
  def append(spark: SparkSession, dir: String, suite: ConstraintSuite,
      maxRetries: Int = 16): Long = {
    val json = JsonSchemaRender.render(suite).fold(
      es => throw new IllegalArgumentException(
        s"suite is not serializable: ${es.map(_.msg).mkString("; ")}"),
      identity)
    val fs = hfs(spark, dir)
    var v = latestVersion(spark, dir).map(_ + 1).getOrElse(0L)
    var attempts = 0
    while (true) {
      val doc = new Path(s"$dir/version=$v/suite.json")
      val created =
        try {
          val out = fs.create(doc, false) // exists ⇒ another appender won this v
          try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case e: java.io.IOException
              if Option(e.getMessage).exists(_.contains("exist")) => false
        }
      if (created) {
        fs.create(new Path(s"$dir/_committed_$v"), true).close()
        return v
      }
      attempts += 1
      if (attempts > maxRetries) throw new IllegalStateException(
        s"SuiteRepo.append: lost $maxRetries version races in $dir — " +
          "serialize appenders or raise maxRetries")
      v += 1
    }
    v // unreachable
  }

  /** Highest COMMITTED version, if any (marker-gated — a killed append's
    * uncommitted directory is invisible). */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val fs = hfs(spark, dir)
    val p = new Path(dir)
    if (!fs.exists(p)) return None
    val vs = fs.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("_committed_") =>
        n.stripPrefix("_committed_").toLong }
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Load one committed version through the standard loader. */
  def load(spark: SparkSession, dir: String, version: Long, keyCol: String,
      tableSchema: Option[StructType] = None, nBuckets: Int = 256,
      validateFormats: Boolean = true): ConstraintSuite = {
    val fs = hfs(spark, dir)
    require(fs.exists(new Path(s"$dir/_committed_$version")),
      s"suite version $version is not committed in $dir")
    val in = fs.open(new Path(s"$dir/version=$version/suite.json"))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    JsonSchema.parse(json, keyCol, nBuckets, tableSchema, validateFormats).fold(
      es => throw new IllegalStateException(
        s"stored suite version $version failed to parse: ${es.map(_.msg).mkString("; ")}"),
      identity)
  }

  /** Latest committed (version, suite), if the repo has any. */
  def loadLatest(spark: SparkSession, dir: String, keyCol: String,
      tableSchema: Option[StructType] = None, nBuckets: Int = 256,
      validateFormats: Boolean = true): Option[(Long, ConstraintSuite)] =
    latestVersion(spark, dir).map(v =>
      v -> load(spark, dir, v, keyCol, tableSchema, nBuckets, validateFormats))

  /** What changed between two stored versions — config review for a
    * version bump that already shipped. */
  def diff(spark: SparkSession, dir: String, fromV: Long, toV: Long,
      keyCol: String, tableSchema: Option[StructType] = None): Seq[SuiteDiff.SuiteChange] =
    SuiteDiff.diff(
      load(spark, dir, fromV, keyCol, tableSchema),
      load(spark, dir, toV, keyCol, tableSchema))
}
