package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus ingest — the wire format web-scale text corpora actually
  * arrive in (one JSON document per line, usually gzipped, always with
  * some malformed lines). The reference ingests CSV seeds only
  * (reference: the seeds directory's three CSVs, automate_pipeline.py:12);
  * this is the corresponding source for the LLM-pipeline side of the
  * engine.
  *
  * Design: text lines + `from_json`, NOT the DataFrameReader json path.
  * The json reader's corrupt-record capture cannot be split into a
  * quarantine branch without caching the parsed frame first (Spark
  * disallows plans whose only referenced column is the internal corrupt
  * column — UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — and
  * the documented workaround is `.cache()`, a non-starter as a hard
  * requirement at 100 TB). Parsing each line with `from_json` against the
  * DECLARED schema gives the same per-line semantics — null struct =
  * malformed line — with plain map-side filters on both branches: no
  * cache, no shuffle, no second read.
  *
  * Scale notes:
  *   - EXPLICIT schema, never inference: schema inference is a full extra
  *     pass over 100 TB before the first real job. Unknown fields are
  *     skipped by the parser; only declared fields materialize (and
  *     Catalyst prunes the from_json struct to the consumed fields).
  *   - Malformed lines are QUARANTINED, not dropped: silently discarding
  *     them (DROPMALFORMED) destroys the operational signal — a crawler
  *     bug should surface as a quarantine-rate spike, not as silently
  *     missing data — and failing the job on one bad line in terabyte N
  *     (FAILFAST) is worse.
  *   - Compression: .gz decodes transparently but is NOT splittable — one
  *     task per file, so 100 TB of .gz must arrive as many files (the
  *     standard crawl layout) or be re-coded to a splittable layout
  *     (zstd parquet after this ingest hop; the engine's warehouse side).
  */
object Jsonl {

  val corruptCol = "_corrupt_record"

  /** One pass, two frames: (clean rows in the declared schema, quarantined
    * raw lines). Blank lines are ignored like the native json reader
    * ignores them; every non-blank line lands in exactly one frame.
    *
    * The corrupt-record column is declared INSIDE the from_json schema
    * (supported there, unlike the standalone-query restriction on the
    * file reader's): PERMISSIVE mode would otherwise return a PARTIAL
    * struct for a line that fails mid-parse (fields before the error
    * populated, the rest null) — indistinguishable from a legitimately
    * sparse document. With the column declared, any parse error marks the
    * line, and the split is exact.
    */
  def readDocs(spark: SparkSession, path: String,
               schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not declare $corruptCol")
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(corruptCol,
        org.apache.spark.sql.types.StringType, nullable = true))
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"), from_json(col("value"), withCorrupt).as("r"))
    val bad = col("r").isNull || col("r").getField(corruptCol).isNotNull
    val clean = parsed.filter(!bad)
      .select(schema.fieldNames.map(f => col("r").getField(f).as(f)): _*)
    val quarantine = parsed.filter(bad)
      .select(col("value").as("raw_line"))
    (clean, quarantine)
  }

  /** Ingest summary — the health record an ingest job emits per batch:
    * clean/quarantined line counts and the clean corpus size. Two global
    * aggregates (one per branch), each a partial+final count — scales.
    */
  def ingestStats(spark: SparkSession, path: String,
                  schema: StructType, textCol: String): DataFrame = {
    val (clean, quarantine) = readDocs(spark, path, schema)
    clean.agg(
        count(lit(1)).as("n_clean"),
        sum(length(col(textCol)).cast("long")).as("n_chars"))
      .crossJoin(broadcast(
        quarantine.agg(count(lit(1)).as("n_quarantined"))))
  }
}

/** XML twin of [[Jsonl]] for element-per-line feeds (log streams and
  * API exports that emit one `<record .../>` element per line — the XML
  * shape that still arrives at ingest boundaries): same text + from_xml
  * + quarantine split. Spark 4 ships the XML source natively; the
  * element-per-line framing keeps the split exact and map-side like the
  * JSONL/CSV twins (whole-document XML with a rowTag needs the file
  * reader, whose corrupt-record capture has the same
  * corrupt-only-column restriction — for trusted whole-document files
  * use `spark.read.format("xml").option("rowTag", ...)` directly).
  *
  * from_xml differs from its json/csv siblings in HOW it reports
  * failure: no in-schema corrupt column — an unparseable element yields
  * a NULL struct, and a parseable element that fails to TYPE yields
  * null fields. Quarantine = null struct OR every declared field null
  * (a legitimate all-null record is indistinguishable from garbage at
  * the wire level, and belongs in quarantine either way).
  */
object Xml {

  def readRecords(spark: SparkSession, path: String,
                  schema: StructType): (DataFrame, DataFrame) = {
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"),
        from_xml(col("value"), schema,
          new java.util.HashMap[String, String]()).as("r"))
    val allNull = schema.fieldNames
      .map(f => col("r").getField(f).isNull)
      .reduce(_ && _)
    val bad = col("r").isNull || allNull
    val clean = parsed.filter(!bad)
      .select(schema.fieldNames.map(f => col("r").getField(f).as(f)): _*)
    val quarantine = parsed.filter(bad)
      .select(col("value").as("raw_line"))
    (clean, quarantine)
  }
}

/** CSV twin of [[Jsonl]] for delimited drops (exports, partner feeds —
  * the other wire format operational data arrives in): same
  * text + from_csv + in-schema corrupt column design, same exact
  * quarantine split, for the same reasons (the csv reader shares the
  * json reader's corrupt-only-column restriction, and bare PERMISSIVE
  * from_csv also returns partial rows on mid-parse failure). A line
  * exactly matching the declared header is dropped before parsing; a
  * reordered or renamed header is NOT silently accepted — it fails to
  * type and lands in quarantine, where a schema drift belongs.
  */
object Csv {

  /** One pass, two frames: (typed clean rows, quarantined raw lines).
    * A field-count mismatch or an untypeable value marks the line.
    */
  def readRows(spark: SparkSession, path: String, schema: StructType,
               delimiter: String = ","): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(Jsonl.corruptCol),
      s"schema must not declare ${Jsonl.corruptCol}")
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(Jsonl.corruptCol,
        org.apache.spark.sql.types.StringType, nullable = true))
    val headerLine = schema.fieldNames.mkString(delimiter)
    val opts = Map("delimiter" -> delimiter, "nullValue" -> "",
      "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Jsonl.corruptCol)
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0 && col("value") =!= headerLine)
      .select(col("value"),
        from_csv(col("value"), withCorrupt, opts).as("r"))
    val bad = col("r").isNull ||
      col("r").getField(Jsonl.corruptCol).isNotNull
    val clean = parsed.filter(!bad)
      .select(schema.fieldNames.map(f => col("r").getField(f).as(f)): _*)
    val quarantine = parsed.filter(bad)
      .select(col("value").as("raw_line"))
    (clean, quarantine)
  }
}
