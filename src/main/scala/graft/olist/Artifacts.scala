package graft.olist

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.checks.Checks

/** dbt's on-disk run artifacts ([dbt]/artifacts/schemas/run/v5): after every
  * invocation dbt writes `target/run_results.json` (one entry per executed
  * node with status + test failure counts) and `target/manifest.json` (the
  * node graph). Downstream commands consume the files, not process memory:
  * `dbt retry` reloads the previous invocation's run_results.json
  * ([dbt]/task/retry.py RETRYABLE_STATUSES) and `--state` selection diffs
  * against a stored manifest. This module gives the engine the same
  * file-level contract so a retry can run in a FRESH process — the actual
  * operational scenario (the first invocation crashed or its orchestrator
  * pod was recycled).
  *
  * Format: the dbt field names (`unique_id`, `status`, `failures`,
  * `depends_on`) with the engine's `model.`/`test.` unique-id prefixes.
  * Tests are flattened to their own entries with `attached_node`, exactly
  * how dbt's build results interleave model and test nodes.
  */
object Artifacts {
  private val mapper = new ObjectMapper()

  private def statusOf(t: Checks.TestResult): String = t match {
    case Checks.Pass()   => "pass"
    case Checks.Warn(_)  => "warn"
    case Checks.Error(_) => "fail"
  }

  /** Serialize a `build`/`retry` outcome. One `model.<name>` entry per
    * node plus one `test.<name>` entry per attached test, in execution
    * order — a skipped/errored model keeps its entry so the retry reader
    * can find it.
    */
  def writeRunResults(path: String,
                      results: Seq[Catalog#NodeResult]): Unit = {
    val root = mapper.createObjectNode()
    val meta = root.putObject("metadata")
    meta.put("generated_at", java.time.Instant.now().toString)
    meta.put("engine", "graft")
    val arr = root.putArray("results")
    results.foreach { r =>
      val m = arr.addObject()
      m.put("unique_id", s"model.${r.name}")
      m.put("status", r.status)
      r.tests.foreach { case (tn, tr) =>
        val t = arr.addObject()
        t.put("unique_id", s"test.$tn")
        t.put("attached_node", s"model.${r.name}")
        t.put("status", statusOf(tr))
        t.put("failures", tr.failures)
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }

  /** Reload a previous invocation's results for `retry`. Test outcomes are
    * reattached to their `attached_node`; a `warn`/`fail` status maps back
    * to the Warn/Error ADT with the recorded failure count.
    */
  def readRunResults(path: String, catalog: Catalog): Seq[catalog.NodeResult] = {
    val root = mapper.readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val entries = root.get("results").elements()
    val models = scala.collection.mutable.LinkedHashMap[String,
      (String, scala.collection.mutable.ListBuffer[(String, Checks.TestResult)])]()
    while (entries.hasNext) {
      val e = entries.next()
      val uid = e.get("unique_id").asText()
      if (uid.startsWith("model.")) {
        models(uid.stripPrefix("model.")) =
          (e.get("status").asText(), scala.collection.mutable.ListBuffer())
      } else if (uid.startsWith("test.")) {
        val owner = e.get("attached_node").asText().stripPrefix("model.")
        val n = e.get("failures").asLong()
        val tr = e.get("status").asText() match {
          case "pass" => Checks.Pass()
          case "warn" => Checks.Warn(n)
          case _      => Checks.Error(n)
        }
        models(owner)._2 += (uid.stripPrefix("test.") -> tr)
      }
    }
    models.toSeq.map { case (name, (status, tests)) =>
      catalog.NodeResult(name, status, tests.toList)
    }
  }

  /** dbt's `target/manifest.json` essentials: per node the unique id,
    * dependency edges, materialization, tags and the analyzed-plan
    * fingerprint `state:modified` diffs against. Written after a successful
    * parse/run; a later CI invocation reads it as the `--state` baseline.
    */
  def writeManifest(path: String, catalog: Catalog): Unit = {
    val root = mapper.createObjectNode()
    val meta = root.putObject("metadata")
    meta.put("generated_at", java.time.Instant.now().toString)
    meta.put("engine", "graft")
    val nodes = root.putObject("nodes")
    val fps = catalog.manifest().fingerprints
    fps.keys.toSeq.sorted.foreach { name =>
      val m = catalog.model(name)
      val n = nodes.putObject(s"model.$name")
      n.put("name", name)
      val deps = n.putObject("depends_on").putArray("nodes")
      m.deps.foreach(d => deps.add(s"model.$d"))
      n.put("materialized", m.materialized.getClass.getSimpleName
        .stripSuffix("$"))
      val tags = n.putArray("tags")
      m.tags.toSeq.sorted.foreach(tags.add)
      n.put("fingerprint", fps(name))
      // column-level lineage (one hop): output column -> dep.column roots
      val cols = n.putObject("columns")
      catalog.columnLineage(name).toSeq.sortBy(_._1).foreach {
        case (cname, srcs) =>
          val lin = cols.putObject(cname).putArray("lineage")
          srcs.foreach(lin.add)
      }
    }
    // exposures: leaf nodes with dependency edges only (dbt writes them
    // beside models under their own `exposures` key)
    val exps = root.putObject("exposures")
    catalog.exposures.sortBy(_.name).foreach { e =>
      val n = exps.putObject(s"exposure.${e.name}")
      n.put("name", e.name)
      n.put("type", e.exposureType)
      n.put("owner", e.owner)
      n.put("maturity", e.maturity)
      e.url.foreach(n.put("url", _))
      val deps = n.putObject("depends_on").putArray("nodes")
      e.dependsOn.foreach(d => deps.add(s"model.$d"))
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }

  /** dbt's `docs generate` catalog ([dbt]/task/docs/generate.py →
    * target/catalog.json): for every relation that actually EXISTS in the
    * warehouse, its concrete column names/types and row count — the
    * as-built inventory, against the manifest's as-declared graph. Columns
    * come from the stored parquet footer (schema-only); `stats.row_count`
    * is one count aggregate per table, the same metadata query dbt's
    * adapter issues.
    */
  def writeCatalog(path: String, catalog: Catalog): Unit = {
    val root = mapper.createObjectNode()
    val meta = root.putObject("metadata")
    meta.put("generated_at", java.time.Instant.now().toString)
    meta.put("engine", "graft")
    val nodes = root.putObject("nodes")
    catalog.manifest().fingerprints.keys.toSeq.sorted
      .filter(catalog.warehouse.exists).foreach { name =>
        val df = catalog.warehouse.load(name)
        val n = nodes.putObject(s"model.$name")
        n.put("name", name)
        val cols = n.putObject("columns")
        df.schema.fields.zipWithIndex.foreach { case (f, i) =>
          val c = cols.putObject(f.name)
          c.put("type", f.dataType.simpleString)
          c.put("index", i)
          c.put("nullable", f.nullable)
        }
        n.putObject("stats").put("row_count", df.count())
      }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }

  /** Read a stored manifest back as the `state:modified` baseline — the
    * file-level form of the Manifest TSV, for interop with runs that wrote
    * JSON artifacts only.
    */
  def readManifestFingerprints(path: String): Manifest = {
    val root = mapper.readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val nodes = root.get("nodes")
    val it = nodes.fields()
    val fps = scala.collection.mutable.Map[String, String]()
    while (it.hasNext) {
      val e = it.next()
      val fp = e.getValue.get("fingerprint")
      if (fp != null) fps(e.getValue.get("name").asText()) = fp.asText()
    }
    Manifest(fps.toMap)
  }
}
