package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Internal stage = a plain file-drop directory (SURVEY.md §2.1 S2-S6).
  *
  * The reference's stage/file-format/PUT/LIST/COPY/RM surface
  * (`SCD-Configuration Setup.sql:66-92`, `SCD-Automation.sql:131-136`) maps
  * to a directory plus `spark.read.csv` with the reference's CSV dialect:
  * comma field delimiter, `\n` records, no header, fields optionally
  * enclosed by `'` (octal \047), compression auto-detected from the file
  * extension (`SCD-Configuration Setup.sql:66-71`).
  *
  * At scale the "stage" is an object-store prefix; LIST/RM go through the
  * Hadoop FileSystem API unchanged and COPY's per-file load-history
  * idempotence is Structured Streaming's processed-file checkpoint
  * (see [[graft.pipeline.ScdStream]]).
  */
class Stage(val dir: String) {
  private val path: Path = Paths.get(dir)
  Files.createDirectories(path)

  /** PUT: drop a local file into the stage (`SCD-Configuration
    * Setup.sql:82`). */
  def put(localFile: String): Unit = {
    val src = Paths.get(localFile)
    Files.copy(src, path.resolve(src.getFileName),
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** PUT from string content (test convenience). */
  def putContent(fileName: String, content: String): Unit =
    Files.write(path.resolve(fileName), content.getBytes("UTF-8"))

  /** LIST @stage (`SCD-Configuration Setup.sql:84,170,179`). */
  def list(): Seq[String] =
    if (!Files.exists(path)) Seq.empty
    else Files.list(path).iterator().asScala
      .filter(Files.isRegularFile(_)).map(_.toString).toSeq.sorted

  /** RM @stage (`SCD-Automation.sql:132`) / COPY's PURGE=TRUE
    * (`SCD-Configuration Setup.sql:90-92`). */
  def rm(files: Seq[String] = null): Unit = {
    val targets = Option(files).getOrElse(list())
    targets.foreach(f => Files.deleteIfExists(Paths.get(f)))
  }

  /** COPY INTO: read all staged files with the reference CSV dialect.
    * Returns an empty frame when the stage is empty. PURGE is the caller's
    * move (`rm(files)`) and must happen only after the frame has been
    * materialized — the read is lazy. */
  def readCsv(spark: SparkSession, schema: StructType): DataFrame =
    Stage.readCsv(spark, schema, list())

  /** COPY INTO from JSONL (newline-delimited JSON) — the de-facto
    * training-corpus interchange format (an extension beyond the
    * reference's CSV-only S1). See [[Stage.readJsonl]]. */
  def readJsonl(spark: SparkSession, schema: StructType): DataFrame =
    Stage.readJsonl(spark, schema, list())
}

object Stage {
  /** The reference CSV dialect (`SCD-Configuration Setup.sql:66-71`).
    * RECORD_DELIMITER='\n' is left to Spark's default universal newline
    * handling rather than an explicit `lineSep`: the reference's fixture
    * files are CRLF-terminated yet its documented golden outputs
    * (`SCD-Configuration Setup.sql:253-266`) show clean values, so stray
    * `\r` must not survive into the data. */
  val csvOptions: Map[String, String] = Map(
    "sep" -> ",",
    "header" -> "false",
    "quote" -> "'")

  def readCsv(spark: SparkSession, schema: StructType,
      files: Seq[String]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).options(csvOptions).csv(files: _*)

  /** The quarantine column appended by [[readJsonl]]: NULL for clean rows,
    * the raw malformed line otherwise. */
  val CorruptCol = "_corrupt"

  /** JSONL read with explicit schema and malformed-line quarantine.
    *
    * Schema is explicit — never inferred — for the same reason
    * [[readCsv]] takes one: inference is a second full scan of 100 TB and
    * a silently drifting contract. PERMISSIVE mode captures each
    * unparseable line whole in [[CorruptCol]] instead of failing the
    * load, so ingestion splits on `_corrupt IS NULL` into data +
    * quarantine (one bad crawl record must not kill a day's load; a
    * quarantine TABLE keeps it auditable). Compression is auto-detected
    * from the extension (`.gz`, `.zst`, …), matching the CSV path. */
  def readJsonl(spark: SparkSession, schema: StructType,
      files: Seq[String]): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withQuarantine = schema.add(CorruptCol,
      org.apache.spark.sql.types.StringType)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withQuarantine)
    else
      spark.read.schema(withQuarantine)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(files: _*)
  }
}
