package graft.sources

import graft.{Op, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Driver entries for the ingest sources. JSONL round-trips through the
  * filesystem (write the documents table as JSONL + one injected corrupt
  * file, read it back through the quarantine split), so the entry
  * exercises the real parser path end-to-end; file bytes make a DuckDB
  * replay path-dependent, hence rows-only (same precedent as
  * olist_seed_ingest for the CSV seeds).
  */
object SourceOps {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val ops: Seq[Op] = Seq(
    Op.noOracle("source_jsonl_ingest") { (s, d) =>
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_" +
        java.lang.Integer.toHexString(d.hashCode)
      Tables.documents(s, d).write.mode("overwrite").json(out)
      // one malformed line alongside the good parts — the quarantine path
      // must observe it without failing the read
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(out, "part-corrupt.json"),
        "{\"doc_id\": oops}\n")
      Jsonl.ingestStats(s, out, docSchema, "text")
    }
  )
}
