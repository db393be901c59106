package graft.core

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ObjectNode, LongNode}
import scala.jdk.CollectionConverters._

/** Pure JSON document operations mirroring the reference's Document model
  * (reference: datagrowth/datatypes/documents/db/document.py:102-169 and
  * datagrowth/utils/data.py:79-89). All functions take/return canonical
  * JSON strings so they can run inside scalar Catalyst expressions.
  */
object DocOps {

  private def parseObj(json: String): ObjectNode =
    if (json == null || json.isEmpty) PyJson.mapper.createObjectNode()
    else PyJson.tryParse(json) match {
      case Some(o: ObjectNode) => o
      case _ => PyJson.mapper.createObjectNode()
    }

  /** `override_dict(parent, child)` (utils/data.py:79-89): shallow merge,
    * child wins; insertion order = parent order, new child keys appended
    * (Python dict.update semantics — Jackson ObjectNode.set matches).
    */
  def mergeShallow(parentJson: String, childJson: String): String = {
    val parent = parseObj(parentJson)
    val child = parseObj(childJson)
    child.fields.asScala.foreach(e => parent.set[JsonNode](e.getKey, e.getValue))
    PyJson.dumps(parent, itemSep = ",", kvSep = ":", ensureAscii = false)
  }

  /** `Document.get_derivatives_content` (document.py:102-111): flatten
    * `derivatives` = {base: {key: value}} into {key: value}; on key clash
    * the FIRST base wins (the reference warns and skips).
    */
  def flattenDerivatives(derivativesJson: String): ObjectNode = {
    val out = PyJson.mapper.createObjectNode()
    val derivs = parseObj(derivativesJson)
    derivs.fields.asScala.foreach { base =>
      base.getValue match {
        case o: ObjectNode =>
          o.fields.asScala.foreach { e =>
            if (!out.has(e.getKey)) out.set[JsonNode](e.getKey, e.getValue)
          }
        case _ => // non-object derivative bases carry no content
      }
    }
    out
  }

  /** `Document.content` (document.py:113-126): properties minus
    * `_`-prefixed keys, plus `_id`, overlaid with flattened derivatives
    * (existing keys keep their position, Python dict.update semantics).
    * `id < 0` means "no id" (unsaved document) — `_id` is still emitted
    * by the reference as None; we emit JSON null for parity.
    */
  def content(propertiesJson: String, derivativesJson: String, id: java.lang.Long): String = {
    val props = parseObj(propertiesJson)
    val out = PyJson.mapper.createObjectNode()
    props.fields.asScala.foreach { e =>
      if (!e.getKey.startsWith("_")) out.set[JsonNode](e.getKey, e.getValue)
    }
    if (id == null) out.putNull("_id") else out.set[JsonNode]("_id", LongNode.valueOf(id))
    flattenDerivatives(derivativesJson).fields.asScala.foreach { e =>
      out.set[JsonNode](e.getKey, e.getValue)
    }
    PyJson.dumps(out, itemSep = ",", kvSep = ":", ensureAscii = false)
  }

  /** Remove a set of top-level keys from a JSON object (used for task
    * invalidation: drop task_results[task] / derivatives[task]). */
  def removeKeys(json: String, keys: Seq[String]): String = {
    val obj = parseObj(json)
    keys.foreach(obj.remove)
    PyJson.dumps(obj, itemSep = ",", kvSep = ":", ensureAscii = false)
  }

  /** Top-level keys of a JSON object (driver-side helpers + tests). */
  def keys(json: String): Seq[String] = parseObj(json).fieldNames.asScala.toSeq

  /** `$`-path → dependent task names, from the document's `tasks` config
    * (reference `get_property_dependencies`, datatypes/storage.py:100-105;
    * tasks = {name: {"checks": [...], "depends_on": [...]}}).
    */
  def propertyDependencies(tasksJson: String): Map[String, Seq[String]] = {
    val tasks = parseObj(tasksJson)
    val deps = scala.collection.mutable.LinkedHashMap[String, List[String]]()
    tasks.fields.asScala.foreach { t =>
      t.getValue match {
        case o: ObjectNode if o.get("depends_on") != null && o.get("depends_on").isArray =>
          o.get("depends_on").elements.asScala.foreach { d =>
            if (d.isTextual && d.textValue.startsWith("$")) {
              val k = d.textValue
              deps(k) = deps.getOrElse(k, Nil) :+ t.getKey
            }
          }
        case _ =>
      }
    }
    deps.toMap
  }

  /** The updated (properties, task_results, derivatives, invalidated)
    * after applying `updateJson` to a document — `Document.update`
    * (document.py:73-99): tasks whose `$`-path dependency value changes
    * between the current properties and the incoming update content are
    * invalidated (task_result + derivative dropped, doc back to pending),
    * then properties are shallow-merged (update wins).
    */
  def applyUpdate(propertiesJson: String, tasksJson: String, taskResultsJson: String,
                  derivativesJson: String, updateJson: String): (String, String, String, Boolean) = {
    val current = parseObj(propertiesJson)
    val update = parseObj(updateJson)
    // Python != : 1 == 1.0 (and True == 1) are EQUAL, so a numerically
    // identical update must NOT invalidate the task — Jackson node
    // equality type-splits them and would re-queue an unchanged doc.
    // An explicit JSON null loads as Python None, indistinguishable
    // from a missing key, so both normalize to absent before comparing.
    def depValue(path: String, node: ObjectNode): Option[JsonNode] =
      Reach.reach(path, node).filterNot(_.isNull)
    val invalidTasks = propertyDependencies(tasksJson).collect {
      case (path, taskNames) if !((depValue(path, current),
          depValue(path, update)) match {
        case (Some(a), Some(b)) => PyJson.pyEquals(a, b)
        case (None, None) => true
        case _ => false
      }) => taskNames
    }.flatten.toSeq.distinct
    val results = parseObj(taskResultsJson)
    val derivs = parseObj(derivativesJson)
    var invalidated = false
    invalidTasks.foreach { t =>
      if (results.has(t)) { results.remove(t); invalidated = true }
      if (derivs.has(t)) { derivs.remove(t); invalidated = true }
    }
    update.fields.asScala.foreach(e => current.set[JsonNode](e.getKey, e.getValue))
    (PyJson.dumps(current, itemSep = ",", kvSep = ":", ensureAscii = false),
      PyJson.dumps(results, itemSep = ",", kvSep = ":", ensureAscii = false),
      PyJson.dumps(derivs, itemSep = ",", kvSep = ":", ensureAscii = false),
      invalidated)
  }
}
