package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** csvimport_zip (reference standard_methods/a_csvimport_zip.py:93-176):
  * iterate the members of a zip archive, csvimport each one, and chain the
  * resulting datasets (or keep them separate).
  *
  * Member selection mirrors the reference: either an explicit
  * `insideFilenames` member→dataset-name map, or include/exclude regexes;
  * `stripDirs` drops directory prefixes from names; `chaining` orders the
  * imports by filename or dataset name ('off' keeps them unchained).
  *
  * Scale shape — same as the reference: a zip is a single non-splittable
  * stream, so member extraction is serial (reference: analysis processes
  * members round-robin but each member is one stream); the PARSE of each
  * extracted member is fully distributed (ordinary CsvImport over an
  * uncompressed temp file, which Spark splits by ranges). Import many zips
  * in parallel jobs for archive-level parallelism.
  */
final case class CsvImportZipConfig(
    csv: CsvImportConfig = CsvImportConfig(),
    includeRe: String = "",
    excludeRe: String = "",
    insideFilenames: Map[String, String] = Map.empty,
    stripDirs: Boolean = false,
    chaining: String = "by_filename") // by_filename | by_dsname | off

object CsvImportZip {

  /** Import all selected members; returns (datasetName, result) in chain
    * order (oldest→newest when chaining).
    */
  def apply(spark: SparkSession, zipPath: String,
            cfg: CsvImportZipConfig = CsvImportZipConfig()): Seq[(String, CsvImportResult)] = {
    require(cfg.insideFilenames.isEmpty || (cfg.includeRe.isEmpty && cfg.excludeRe.isEmpty),
      "Don't specify both insideFilenames and regexes")
    val include = if (cfg.includeRe.isEmpty) ".".r else cfg.includeRe.r
    val exclude = if (cfg.excludeRe.isEmpty) "^$".r else cfg.excludeRe.r
    val tmp = Files.createTempDirectory("csvimport_zip")
    // the extracted copies feed lazy RDD reads, so they can't be deleted
    // here — register them (deepest first) for JVM-exit cleanup so a
    // long-lived session doesn't accumulate them forever
    tmp.toFile.deleteOnExit()
    val zf = new ZipFile(zipPath)
    try {
      val remaining = scala.collection.mutable.Map(cfg.insideFilenames.toSeq: _*)
      val selected = zf.entries().asScala.filterNot(_.isDirectory).flatMap { e =>
        val ffn = e.getName
        val fn = if (cfg.stripDirs) ffn.split('/').last else ffn
        if (cfg.insideFilenames.nonEmpty)
          remaining.remove(fn).map(ds => (e, ds, fn))
        else if (include.findFirstIn(ffn).isDefined && exclude.findFirstIn(ffn).isEmpty)
          Some((e, fn, fn))
        else None
      }.toSeq
      require(remaining.isEmpty,
        s"members not found in $zipPath: ${remaining.keySet}")
      // ambiguity guards: stripDirs can collapse distinct members onto one
      // name — silently importing "whichever the zip enumerates first" (or
      // crashing on the extracted-file collision) is never what the user
      // meant (reference keys members by their stripped name the same way)
      if (cfg.insideFilenames.nonEmpty && cfg.stripDirs) {
        val stripped = zf.entries().asScala.filterNot(_.isDirectory)
          .map(_.getName.split('/').last).toSeq
        val dupWanted = stripped.groupBy(identity)
          .filter { case (n, g) => g.size > 1 && cfg.insideFilenames.contains(n) }
        require(dupWanted.isEmpty,
          s"ambiguous members after stripDirs in $zipPath: ${dupWanted.keySet}")
      }
      val dupDs = selected.map(_._2).groupBy(identity).filter(_._2.size > 1)
      require(dupDs.isEmpty,
        s"duplicate dataset names in $zipPath (use stripDirs=false or rename): ${dupDs.keySet}")
      val ordered = cfg.chaining match {
        case "by_filename" => selected.sortBy(_._3)
        case "by_dsname"   => selected.sortBy(_._2)
        case "off"         => selected
        case other => throw new IllegalArgumentException(s"chaining $other")
      }
      ordered.map { case (entry, dsName, _) =>
        val out = tmp.resolve(dsName.replace('/', '_'))
        val in = zf.getInputStream(entry)
        try Files.copy(in, out) finally in.close()
        out.toFile.deleteOnExit()
        dsName -> CsvImport(spark, out.toString, cfg.csv)
      }
    } finally zf.close()
  }

  /** Union the member datasets with a `member` provenance column — the
    * reference's filename-labeled iteration over the member chain.
    */
  def unioned(results: Seq[(String, CsvImportResult)],
              memberCol: String = "member"): DataFrame = {
    require(results.nonEmpty,
      "csvimport_zip: no members matched — nothing to union")
    results.map { case (name, r) =>
      r.data.withColumn(memberCol, lit(name))
    }.reduce(_ unionByName _)
  }
}
