package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{DocOps, Hashing, Objective, PyJson}
import graft.functions.GraftFunctions
import graft.model.Documents
import graft.sources.{Fetcher, Resources}

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
    resourceLabel: String = "graft.httpresource")

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
        base && GraftFunctions.reach(col("task_results"), s"$$.$dep.success") === "true"
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
    * frame plus the resources frame (for cache write-back).
    */
  def grow(docs: DataFrame, spec: GrowthSpec, fetcher: Fetcher,
           cache: DataFrame, cacheOnly: Boolean = false,
           maxConcurrency: Int = 32): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
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
    val resources = Resources.fetchWithCache(uniqueRequests, cache, fetcher,
      cacheOnly, maxConcurrency)

    val objective = spec.objective
    val extractUdf = udf { (body: String) =>
      if (body == null) Array.empty[String] else objective.extractJson(body)
    }
    val resourceId = udf { (uri: String, hash: String) =>
      BigInt(Hashing.sha1Hex(uri + "|" + hash).take(15), 16).toLong
    }
    val resourcesForJoin = resources.select(col("url").as("r_url"),
      col("uri").as("r_uri"), col("data_hash"), col("status"), col("body"))
    val enriched = requests
      .join(resourcesForJoin, col("url") === col("r_url"), "left_outer")
      .select(col("doc_id"), col("status"), col("r_uri"), col("data_hash"), col("body"))
      .withColumn("contributions", extractUdf(col("body")))
      .withColumn("rid", resourceId(col("r_uri"), col("data_hash")))
      .groupBy(col("doc_id"))
      .agg(
        min(when(Resources.successCol(col("status")), 1).otherwise(0)).as("all_success"),
        first(col("rid")).as("main_rid"),
        collect_list(col("rid")).as("rids"),
        flatten(collect_list(col("contributions"))).as("contributions"))

    val phase = spec.growthPhase
    val toProperty = spec.toProperty
    val resourceLabel = spec.resourceLabel
    val mergeResults = udf {
      (properties: String, taskResults: String, derivatives: String,
       allSuccess: Int, mainRid: Long, rids: Seq[Long], contributions: Seq[String]) =>
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
        (newProps, newTaskResults, newDerivs)
    }

    val grown = pending.join(enriched, pending("id") === enriched("doc_id"), "left_outer")
      .withColumn("__m", when(col("doc_id").isNotNull,
        mergeResults(col("properties"), col("task_results"), col("derivatives"),
          col("all_success"), col("main_rid"), col("rids"), col("contributions"))))
      .withColumn("properties", when(col("__m").isNotNull, col("__m._1")).otherwise(col("properties")))
      .withColumn("task_results", when(col("__m").isNotNull, col("__m._2")).otherwise(col("task_results")))
      .withColumn("derivatives", when(col("__m").isNotNull, col("__m._3")).otherwise(col("derivatives")))
      .withColumn("modified_at", current_timestamp())
      .withColumn("pending_at", when(col("__m").isNotNull, lit(null).cast(TimestampType)).otherwise(col("pending_at")))
      .withColumn("finished_at", when(col("__m").isNotNull, current_timestamp()).otherwise(col("finished_at")))
      .select(Documents.columns.map(col): _*)

    (rest.unionByName(grown), resources)
  }
}
