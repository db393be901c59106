package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{DocOps, Hashing, MarkupObjective, Objective, PyJson, TextUtils}
import graft.functions.GraftFunctions
import graft.model.Documents
import graft.sources.{Fetcher, Resources}

/** The slice of a fetched resource passed to the [[GrowthSpec.applyResource]]
  * hook — the reference hands the full `Resource` model to
  * `Document.apply_resource` (document.py:171-172); status/uri/head are
  * what hook implementations actually read. */
final case class ResourceView(uri: String, status: Int, head: String)

/** Growth (enrichment) configuration — the reference's
  * `ResourceGrowthProcessor` config (reference: datagrowth/processors/
  * resources/growth.py + processors/growth.py:95-116). `urlTemplate` has
  * positional `{}` slots filled from `argTemplates` resolved per
  * document against its content (`$`-paths).
  *
  * `toProperty` semantics (resources/growth.py:93-97 + 136-152):
  *   None               → derivatives[phase] ⊕= contribution
  *   "key"              → derivatives[phase][key] = contribution
  *   "properties/key"   → properties[key] = contribution
  *   "properties/"      → properties ⊕= contribution
  */
final case class GrowthSpec(
    growthPhase: String,
    urlTemplate: String,
    argTemplates: Seq[String] = Nil,
    objective: Objective = null,
    dependsOn: Option[String] = None,
    toProperty: Option[String] = None,
    method: String = "get",
    resourceLabel: String = "graft.httpresource",
    /** Markup twin of `objective`: resources whose Content-Type is
      * text/html, text/xml or application/xml extract through this
      * (extraction.py:182-200); JSON mimetypes keep using `objective`. */
    markupObjective: Option[MarkupObjective] = None,
    /** `apply_resource_to` + `Document.apply_resource` (datagrowth.yml:58,
      * growth.py:118-121, document.py:171-172): when `applyResourceTo`
      * is non-empty the hook runs once per document with the MAIN
      * resource, and may update exactly the listed document columns
      * (`reference`, `identity`, or the JSON fields). The reference's
      * test model sets `reference = resource.status`. */
    applyResourceTo: Seq[String] = Nil,
    applyResource: Option[(String, ResourceView) => Map[String, String]] = None)

/** The growth processor — the engine's distributed fan-out path: every
  * pending document produces a resource request, requests flow through
  * the cache-aware fetch kernel (mapPartitions, bounded concurrency),
  * contributions are extracted and reduced per document, and results
  * merge back into `derivatives`/`task_results` (or a property) via a
  * broadcast-free equi-join on document id. No driver-side collection:
  * this is the path that must survive 100 TB.
  */
object Growth {

  /** `filter_documents` (resources/growth.py:40-47): task not yet
    * successful AND optional dependency successful. */
  def pendingFilter(spec: GrowthSpec): Column = {
    val phaseSuccess = GraftFunctions.reach(col("task_results"),
      s"$$.${spec.growthPhase}.success")
    val base = phaseSuccess.isNull || phaseSuccess =!= "true"
    spec.dependsOn match {
      case Some(dep) =>
        // NULL-safe: a doc whose dependency has NOT run yields SQL NULL
        // here (reach on a missing key), and growWith filters on BOTH
        // this predicate and its negation — an un-coalesced NULL fails
        // both, silently dropping the document from the round instead
        // of parking it in `rest` (the prepareDatasetVersion
        // weedPredicate discipline)
        base && coalesce(
          GraftFunctions.reach(col("task_results"), s"$$.$dep.success") === "true",
          lit(false))
      case None => base
    }
  }

  /** Compile the URL template into a Column: `{}` slots interleave with
    * arg templates resolved against document content. */
  def urlColumn(spec: GrowthSpec, content: Column): Column = {
    val pieces = spec.urlTemplate.split("\\{\\}", -1)
    val args = spec.argTemplates.map(tpl =>
      graft.model.OutputTemplate.compile(content, graft.model.OutputTemplate.parse("\"" + tpl + "\"")))
    val parts = pieces.zipAll(args, "", lit("")).flatMap {
      case (piece, argCol) => Seq(lit(piece), argCol)
    }
    concat(parts.map(c => coalesce(c.cast(StringType), lit(""))): _*)
  }

  /** Run one growth phase over the documents frame. Returns the updated
    * frame plus the resources frame (for cache write-back). `auth`
    * carries per-resource credentials applied at send time only — the
    * resources frame (and thus the cache) stays credential-free
    * (reference auth_headers/auth_parameters per resource class,
    * generic.py:410-447).
    */
  def grow(docs: DataFrame, spec: GrowthSpec, fetcher: Fetcher,
           cache: DataFrame, cacheOnly: Boolean = false,
           maxConcurrency: Int = 32,
           auth: graft.sources.AuthConfig = graft.sources.AuthConfig.none): (DataFrame, DataFrame) =
    growWith(docs, spec, reqs => Resources.fetchWithCache(reqs, cache, fetcher,
      cacheOnly, maxConcurrency, auth))

  /** [[grow]] with the fetch kernel abstracted: `fetchKernel` maps the
    * deduped request frame (method, url, request_body) to the resources
    * frame. The seam that lets a DURABLE store own the round — pass
    * `store.fetch(_, fetcher, …)` ([[graft.sources.ResourceCache]]) and
    * the store reads its cache, checkpoints the fetch exactly-once, and
    * appends the round's misses; the plain overload above passes a
    * caller-supplied cache frame and leaves write-back to the caller. */
  def growWith(docs: DataFrame, spec: GrowthSpec,
               fetchKernel: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val pending = docs.filter(pendingFilter(spec))
    val rest = docs.filter(!pendingFilter(spec))

    val content = GraftFunctions.docContent(col("properties"), col("derivatives"), col("id"))
    val requests = pending.select(col("id").as("doc_id"),
        urlColumn(spec, content).as("url"))
      .withColumn("method", lit(spec.method))
      .withColumn("request_body", lit(null).cast(StringType))

    // Identical URLs dedupe into ONE fetch; results fan back per doc.
    val uniqueRequests = requests.select("method", "url", "request_body")
      .dropDuplicates("url")
    val resources = fetchKernel(uniqueRequests)

    val resourcesForJoin = resources.select(col("url").as("r_url"),
      col("uri").as("r_uri"), col("data_hash"), col("status"), col("head"), col("body"))
    val assoc = requests
      .join(resourcesForJoin, col("url") === col("r_url"), "left_outer")
      .select(col("doc_id"), col("status"), col("r_uri"), col("data_hash"),
        col("head"), col("body"))

    (rest.unionByName(mergeBatch(pending, assoc, spec)), resources)
  }

  /** Merge a (doc_id ↔ fetched resource) association frame into the
    * pending documents — the reference's `merge_batch`
    * (resources/growth.py:90-152): group resources per doc, extract
    * contributions by content type, reduce, write task_results and the
    * contribution target, run the `apply_resource` hook. Factored from
    * [[grow]] so multi-resource-per-document merges are testable
    * directly. `assoc` columns: doc_id, status, r_uri, data_hash, head,
    * body. */
  private[pipeline] def mergeBatch(pending: DataFrame, assoc: DataFrame,
                                   spec: GrowthSpec): DataFrame = {
    val objective = spec.objective
    val markupObjective = spec.markupObjective
    // Content-type dispatch per resource (Resource.content,
    // generic.py:186-198 → ExtractProcessor.transform): mimetype from
    // the response head; absent head/Content-Type defaults to JSON.
    val extractUdf = udf { (head: String, body: String) =>
      Objective.extractResponse(head, body, objective, markupObjective)
    }
    val resourceId = udf { (uri: String, hash: String) =>
      BigInt(Hashing.sha1Hex(uri + "|" + hash).take(15), 16).toLong
    }
    // Per-doc resource order: the reference iterates resources in
    // insertion (request) order (growth.py:103-105); a shuffle has no
    // such order, so the canonical order here is the sorted resource
    // uri — stable under any partitioning.
    val enriched = assoc
      .withColumn("contributions", extractUdf(col("head"), col("body")))
      .withColumn("rid", resourceId(col("r_uri"), col("data_hash")))
      .groupBy(col("doc_id"))
      .agg(
        min(when(Resources.successCol(col("status")), 1).otherwise(0)).as("all_success"),
        sort_array(collect_list(struct(col("r_uri").as("uri"), col("rid").as("rid"),
          col("status").as("status"), col("head").as("head"),
          col("contributions").as("contributions")))).as("res"))
      .select(col("doc_id"), col("all_success"),
        element_at(col("res"), 1).getField("rid").as("main_rid"),
        element_at(col("res"), 1).getField("uri").as("main_uri"),
        element_at(col("res"), 1).getField("status").as("main_status"),
        element_at(col("res"), 1).getField("head").as("main_head"),
        transform(col("res"), r => r.getField("rid")).as("rids"),
        flatten(transform(col("res"), r => r.getField("contributions"))).as("contributions"))

    val phase = spec.growthPhase
    val toProperty = spec.toProperty
    val resourceLabel = spec.resourceLabel
    val applyResourceTo = spec.applyResourceTo
    val applyResource = spec.applyResource
    val mergeResults = udf {
      (properties: String, taskResults: String, derivatives: String,
       allSuccess: Int, mainRid: Long, mainUri: String, mainStatus: Int,
       mainHead: String, rids: Seq[Long], contributions: Seq[String]) =>
        val m = PyJson.mapper
        // task_results[phase] = {success, resource, id, ids} (resources/utils.py:86-101)
        val tr = m.createObjectNode()
        tr.put("success", allSuccess == 1)
        tr.put("resource", resourceLabel)
        tr.put("id", mainRid)
        val idsArr = m.createArrayNode(); rids.foreach(idsArr.add)
        tr.set[com.fasterxml.jackson.databind.JsonNode]("ids", idsArr)
        val trJson = PyJson.dumps(tr, itemSep = ",", kvSep = ":", ensureAscii = false)
        val newTaskResults = DocOps.mergeShallow(taskResults, s"""{"$phase":$trJson}""")

        var newProps = properties
        var newDerivs = derivatives
        var newReference: String = null
        var newIdentity: String = null
        // apply_resource hook: main resource only, gated on
        // applyResourceTo, updates restricted to the listed fields
        // (growth.py:118-121 + document.py:171-172).
        if (applyResourceTo.nonEmpty) applyResource.foreach { hook =>
          val updates = hook(newProps, ResourceView(mainUri, mainStatus, mainHead))
          updates.filter { case (k, _) => applyResourceTo.contains(k) }.foreach {
            case ("reference", v) => newReference = v
            case ("identity", v) => newIdentity = v
            case ("properties", v) => newProps = v
            case ("derivatives", v) => newDerivs = v
            case (other, _) => throw new IllegalArgumentException(
              s"apply_resource cannot update column: $other")
          }
        }
        if (contributions.nonEmpty) {
          val contribution = contributions.head // reduce_contributions default: first
          toProperty match {
            case None =>
              newDerivs = DocOps.mergeShallow(newDerivs, s"""{"$phase":$contribution}""")
            case Some(tp) if !tp.contains("/") =>
              newDerivs = DocOps.mergeShallow(newDerivs, s"""{"$phase":{"$tp":$contribution}}""")
            case Some(tp) =>
              val Array(fieldName, propName) = tp.split("/", 2)
              require(fieldName == "properties", s"Unsupported contribution field: $fieldName")
              newProps =
                if (propName.isEmpty) DocOps.mergeShallow(newProps, contribution)
                else DocOps.mergeShallow(newProps, s"""{"$propName":$contribution}""")
          }
        }
        (newProps, newTaskResults, newDerivs, newReference, newIdentity)
    }

    val grown = pending.join(enriched, pending("id") === enriched("doc_id"), "left_outer")
      .withColumn("__m", when(col("doc_id").isNotNull,
        mergeResults(col("properties"), col("task_results"), col("derivatives"),
          col("all_success"), col("main_rid"), col("main_uri"), col("main_status"),
          col("main_head"), col("rids"), col("contributions"))))
      .withColumn("properties", when(col("__m").isNotNull, col("__m._1")).otherwise(col("properties")))
      .withColumn("task_results", when(col("__m").isNotNull, col("__m._2")).otherwise(col("task_results")))
      .withColumn("derivatives", when(col("__m").isNotNull, col("__m._3")).otherwise(col("derivatives")))
      .withColumn("reference",
        when(col("__m").isNotNull && col("__m._4").isNotNull, col("__m._4"))
          .otherwise(col("reference")))
      .withColumn("identity",
        when(col("__m").isNotNull && col("__m._5").isNotNull, col("__m._5"))
          .otherwise(col("identity")))
      .withColumn("modified_at", current_timestamp())
      .withColumn("pending_at", when(col("__m").isNotNull, lit(null).cast(TimestampType)).otherwise(col("pending_at")))
      .withColumn("finished_at", when(col("__m").isNotNull, current_timestamp()).otherwise(col("finished_at")))
      .select(Documents.columns.map(col): _*)
    grown
  }
}
