package graft.pipeline

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.DataFrame
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.core.{Hashing, Objective, PyJson, Reach, Templates}
import graft.model.{CollectionOps, CollectionSpec, Documents}
import graft.sources.{FetchResponse, Fetcher}

/** How one seeding phase retrieves source data (the reference's
  * `retrieve_data` config, processors/input/seeding.py:128-131 +
  * resources/http/generic.py:225-254): a URL template with positional
  * `{}` slots filled from arg templates (`#`-paths resolve against the
  * processor call args, `$`-paths against batch content), fixed query
  * parameters, and `$.next`-style pagination up to `continuationLimit`.
  */
final case class RetrieveSpec(
    urlTemplate: String,
    argTemplates: Seq[String] = Nil,
    parameters: Seq[(String, String)] = Nil,
    method: String = "get",
    continuationLimit: Int = 1,
    nextPath: String = "$.next",
    /** Request-body JSON template (the reference's retrieve kwargs,
      * generic.py:225-243): `#`-paths resolve against the call
      * envelope, `$`-paths against batch content; the resolved payload
      * joins the cache key as its SHA-1 data hash. */
    bodyTemplate: Option[String] = None)

/** How phase output contributes to the batch (the reference's
  * `contribute_data`, seeding.py:85-114). */
final case class ContributeSpec(
    objective: Option[Objective] = None,
    mergeBase: String = "batch",
    mergeOn: Option[String] = None,
    compositionTo: Option[String] = None,
    callback: Option[(String, DataFrame) => Seq[String]] = None,
    /** Markup twin of `objective` — responses with an HTML/XML
      * Content-Type extract through it. */
    markupObjective: Option[graft.core.MarkupObjective] = None)

/** One seeding phase (seeding.py:124-141): strategy ∈
  * initial | replace | merge | back_fill. */
final case class PhaseSpec(
    phase: String,
    strategy: String,
    retrieve: RetrieveSpec = null,
    contribute: ContributeSpec = ContributeSpec(),
    batchSize: Int = 100,
    isPostInitialization: Boolean = false)

/** A driver-side record of one request (for assertions + cache export). */
final case class SeedResource(uri: String, dataHash: String, method: String, url: String,
                              status: Int, body: String)

/** The seeding pipeline — a faithful Spark-first re-expression of the
  * reference's `ResourceSeedingProcessor.__call__` driver loop
  * (processors/input/seeding.py:168-213): phases walk forward, a phase
  * whose iterator exhausts breaks back to re-run earlier phases
  * (draining nested pagination), merge/back_fill phases transform the
  * working batch, and every flushed batch upserts into the collection.
  *
  * Scale shape: seed pages are inherently sequential small batches
  * (reference batch_size 100), so the page loop runs on the driver with
  * a memoizing fetch; each batch then flows through the DISTRIBUTED
  * upsert (broadcast merge into the documents frame — CollectionOps.
  * upsert), and document state is localCheckpoint'ed between batches to
  * keep lineage bounded. The heavy fan-out path (per-document growth)
  * is Growth, not seeding.
  */
class SeedingProcessor(
    val spec: CollectionSpec,
    val phases: Seq[PhaseSpec],
    fetcher: Fetcher,
    cacheOnly: Boolean = false,
    preloadedCache: Map[(String, String), FetchResponse] = Map.empty) {

  require(phases.nonEmpty, "SeedingProcessor needs at least one phase")
  require(spec.identifier.nonEmpty, "SeedingProcessor expects a Collection with the identifier set")

  /** Driver-side response memoization (the reference's resource cache,
    * generic.py:117): keyed by (uri, data_hash). */
  val cache: mutable.LinkedHashMap[(String, String), FetchResponse] =
    mutable.LinkedHashMap(preloadedCache.toSeq: _*)
  /** Every request made (including cache hits), in order — mirrors the
    * reference tests' Resource.objects assertions. */
  val resources: mutable.Buffer[SeedResource] = mutable.Buffer.empty

  private def fetchOne(method: String, url: String, body: String = null): FetchResponse = {
    val uri = Hashing.uriFromUrl(url)
    val dataHash = Hashing.hashFromData(body)
    val key = (uri, dataHash)
    val resp = cache.get(key) match {
      case Some(r) if r.status >= 200 && r.status < 300 => r
      case _ if cacheOnly => FetchResponse(0, null, null)
      case _ =>
        val r = fetcher.fetch(method, url, body)
        if (r.status >= 200 && r.status < 300) cache(key) = r
        r
    }
    resources += SeedResource(uri, dataHash, method, url, resp.status, resp.body)
    resp
  }

  private def buildUrl(retrieve: RetrieveSpec, args: Seq[String]): String = {
    var url = retrieve.urlTemplate
    args.foreach { a => url = url.replaceFirst("\\{\\}", java.util.regex.Matcher.quoteReplacement(a)) }
    if (retrieve.parameters.nonEmpty) {
      val sep = if (url.contains('?')) "&" else "?"
      url + sep + retrieve.parameters.map { case (k, v) => s"$k=$v" }.mkString("&")
    } else url
  }

  /** Resolve arg templates: first `#`-paths against the call args/kwargs
    * envelope, then `$`-paths against a batch content (seeding.py:41-66). */
  private def resolveArgs(templates: Seq[String], callEnvelope: JsonNode,
                          content: Option[JsonNode]): Seq[String] =
    templates.map { tpl =>
      val text = PyJson.mapper.getNodeFactory.textNode(tpl)
      val afterHash = Templates.resolve(text, callEnvelope, '#')
      val afterDollar = content match {
        case Some(c) => Templates.resolve(afterHash, c, '$')
        case None => afterHash
      }
      Templates.renderArg(afterDollar)
    }

  /** Fetch one request series (initial request + pagination up to
    * continuation_limit — http/iterators.py:31-53), extract the
    * objective, return content dicts. */
  private def fetchSeries(retrieve: RetrieveSpec, contribute: ContributeSpec,
                          args: Seq[String], callEnvelope: JsonNode = null,
                          content: Option[JsonNode] = None): Seq[String] = {
    val body: String = retrieve.bodyTemplate.map { tpl =>
      var node: JsonNode = PyJson.parse(tpl)
      if (callEnvelope != null) node = Templates.resolve(node, callEnvelope, '#')
      content.foreach(c => node = Templates.resolve(node, c, '$'))
      PyJson.dumps(node, itemSep = ",", kvSep = ":", ensureAscii = false)
    }.orNull
    val out = mutable.Buffer[String]()
    var url: String = buildUrl(retrieve, args)
    var count = 0
    val limit = math.max(1, retrieve.continuationLimit)
    while (url != null && count < limit) {
      val resp = fetchOne(retrieve.method, url, body)
      count += 1
      if (resp.body != null) {
        out ++= Objective.extractResponse(resp.head, resp.body,
          contribute.objective.orNull, contribute.markupObjective)
        url = PyJson.tryParse(resp.body)
          .flatMap(tree => Reach.reach(retrieve.nextPath, tree))
          .filter(n => n.isTextual).map(_.textValue).orNull
      } else url = null
    }
    out.toSeq
  }

  /** `flush_buffer` merge strategy (seeding.py:87-114). */
  private def mergeBuffer(batch: Seq[String], buffer: Seq[String],
                          contribute: ContributeSpec): Seq[String] = {
    val mergeOn = contribute.mergeOn.getOrElse(spec.identifier.get)
    val popMergeOn = contribute.compositionTo.isDefined && !contribute.mergeOn.forall(spec.identifier.contains)
    def keyOf(json: String): Option[String] =
      PyJson.tryParse(json).flatMap(t => Reach.reach("$." + mergeOn, t)).map(Templates.renderArg)
    def compose(json: String): String = contribute.compositionTo match {
      case Some(to) =>
        val obj = PyJson.mapper.createObjectNode()
        obj.set[JsonNode](to, PyJson.parse(json))
        PyJson.dumps(obj, itemSep = ",", kvSep = ":", ensureAscii = false)
      case None => json
    }
    def applyInto(bases: Seq[String], overlays: Map[String, String]): Seq[String] =
      bases.map { base =>
        val overlaid = keyOf(base).flatMap(overlays.get) match {
          case Some(overlay) => graft.core.DocOps.mergeShallow(base, overlay)
          case None => base
        }
        if (popMergeOn) graft.core.DocOps.removeKeys(overlaid, Seq(mergeOn)) else overlaid
      }
    contribute.mergeBase match {
      case "batch" =>
        val overlays = buffer.flatMap(b => keyOf(b).map(_ -> compose(b))).toMap
        applyInto(batch, overlays)
      case "buffer" =>
        val overlays = batch.flatMap(b => keyOf(b).map(_ -> compose(b))).toMap
        applyInto(buffer, overlays)
      case other => throw new IllegalArgumentException(s"Unexpected merge base: $other")
    }
  }

  /** Run the seeding loop. `docs` is the current collection frame;
    * returns the final frame after all upsert batches. `onBatch` sees
    * each upserted frame (the reference yields batches). */
  def run(docs: DataFrame, args: Seq[String] = Nil,
          initial: Option[Seq[String]] = None,
          limit: Int = -2,
          onBatch: DataFrame => Unit = _ => ()): DataFrame = {
    if (limit == -1) return docs // "retry tasks only, no new seeds" (dataset.py:282-287)
    val callEnvelope: ObjectNode = {
      val o = PyJson.mapper.createObjectNode()
      val argArr = PyJson.mapper.createArrayNode()
      args.foreach(argArr.add)
      o.set[JsonNode]("args", argArr)
      o.set[JsonNode]("kwargs", PyJson.mapper.createObjectNode())
      o
    }
    val activePhases: Seq[PhaseSpec] =
      if (initial.isDefined) phases.filter(_.isPostInitialization)
      else {
        require(phases.head.strategy == "initial",
          "Expected first phase to have strategy 'initial' if no initial seeds are given")
        phases
      }

    var current = docs
    var batch: Seq[String] = initial.getOrElse(Nil)
    var buffer: Seq[String] = null // null ⇒ loop must run at least once
    val contents = mutable.Map[Int, Iterator[Seq[String]]]()
    var seededCount = 0L
    var done = false

    while (!done && (contents.nonEmpty || buffer == null)) {
      buffer = batch
      var brokeOut = false
      val phaseIt = activePhases.zipWithIndex.iterator
      while (phaseIt.hasNext && !brokeOut) {
        val (phase, phaseIndex) = phaseIt.next()
        val skip = contents.nonEmpty && phaseIndex < contents.keys.max
        if (!skip) phase.strategy match {
          case "initial" | "replace" =>
            if (!contents.contains(phaseIndex)) {
              val resolved = resolveArgs(phase.retrieve.argTemplates, callEnvelope, None) ++
                (if (phase.retrieve.argTemplates.isEmpty) args else Nil)
              val seeds = fetchSeries(phase.retrieve,
                phase.contribute, resolved, callEnvelope)
              contents(phaseIndex) = seeds.grouped(math.max(1, phase.batchSize))
            }
            if (contents(phaseIndex).hasNext) {
              buffer = contents(phaseIndex).next()
              batch = buffer
            } else {
              // Exhausted: force-flush whatever earlier phases buffered
              // this round, drop the iterator, retry earlier phases
              // (seeding.py:178-187).
              contents.remove(phaseIndex)
              batch = buffer
              brokeOut = true
            }
          case "merge" =>
            val merged = batch.flatMap { content =>
              val contentTree = PyJson.parse(content)
              val resolved = phase.retrieve.argTemplates.map { tpl =>
                val t = PyJson.mapper.getNodeFactory.textNode(tpl)
                val afterHash = Templates.resolve(t, callEnvelope, '#')
                Templates.renderArg(Templates.resolve(afterHash, contentTree, '$'))
              }
              fetchSeries(phase.retrieve, phase.contribute, resolved,
                callEnvelope, Some(contentTree))
            }
            buffer = merged
            batch = mergeBuffer(batch, buffer, phase.contribute)
          case "back_fill" =>
            val cb = phase.contribute.callback.get
            buffer = batch.flatMap(seed => cb(seed, current)).filter(_ != null)
            // Empty callback output skips the flush (seeding.py:199-201);
            // otherwise flush copies buffer → batch (seeding.py:85-86).
            if (buffer.nonEmpty) batch = buffer
          case other => throw new IllegalArgumentException(s"Unknown strategy: $other")
        }
      }
      if (batch.nonEmpty) {
        // batch_to_documents (seeding.py:116-123): skip identity-less
        // seeds, then distributed upsert on the collection identifier.
        val idPath = "$." + spec.identifier.get
        val withIdentity = batch.filter { json =>
          PyJson.tryParse(json).flatMap(t => Reach.reach(idPath, t)).exists(!_.isNull)
        }
        if (withIdentity.nonEmpty) {
          val updates = Documents.fromJsonSeq(current.sparkSession, withIdentity)
          current = CollectionOps.upsert(current, updates, spec.identifier.get, spec)
            .localCheckpoint(true) // bound lineage across micro-batches
          seededCount += withIdentity.size
          onBatch(current)
          // checked AFTER the batch flushes, so any non-negative limit
          // overshoots by up to one batch (limit=0 seeds the first
          // batch) — deliberate reference parity: collection.py:143-149
          // counts `count += len(documents)` and breaks only after
          // `count >= limit`
          if (limit >= 0 && seededCount >= limit) done = true
        }
        batch = Nil
      }
    }
    current
  }
}
