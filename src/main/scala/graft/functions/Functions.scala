package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}

import graft.core.{Hashing, Reach}

/** `reach(json, path)` as a native Catalyst expression — a scalar string
  * getter with the reference's dotted-key-fallback semantics (reference:
  * datagrowth/utils/data.py:10-76), which `get_json_object` cannot
  * express. Strings render raw, other values as JSON text (so it is
  * comparable with `get_json_object`/DuckDB `json_extract_string` for
  * standard paths).
  */
case class ReachExpression(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_reach"
  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val out = Reach.reachString(path.toString, json.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `reach_array(json, path, objectValues)`: resolves the path and returns
  * the elements of the resulting array (or the values of the resulting
  * object when objectValues — reference `extract_from_object_values`,
  * extraction.py:143-144) as JSON-rendered strings. The node-selection
  * step of the extraction objective (`"@"`).
  */
case class ReachArrayExpression(left: Expression, right: Expression, objectValues: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_reach_array"
  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val out = Reach.reachArray(path.toString, json.toString, objectValues)
    if (out == null) null
    else new GenericArrayData(out.map(s => if (s == null) null else UTF8String.fromString(s)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `doc_content(properties, derivatives, id)` — the reference's
  * `Document.content` projection (document.py:113-126): `_`-keys
  * stripped, `_id` injected, flattened derivatives overlaid (first base
  * wins per key). Null id renders `_id: null` (unsaved doc).
  */
case class DocContentExpression(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_doc_content"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val props = first.eval(input)
    if (props == null) return null
    val derivs = second.eval(input)
    val id = third.eval(input)
    val out = graft.core.DocOps.content(
      props.toString,
      if (derivs == null) null else derivs.toString,
      if (id == null) null else java.lang.Long.valueOf(id.asInstanceOf[Long]))
    UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

/** `json_merge(parent, child)` — shallow dict merge, child wins
  * (reference `override_dict`, utils/data.py:79-89 / Python
  * `dict.update` in `Document.update`, document.py:94). */
case class JsonMergeExpression(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_merge"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null && b == null) return null
    val out = graft.core.DocOps.mergeShallow(
      if (a == null) null else a.toString,
      if (b == null) null else b.toString)
    UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Column-level API + one-time session registration. All graft entry
  * points call [[register]] (idempotent) so the functions are usable both
  * from the Scala DSL (via `call_function`) and in `spark.sql` text.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_reach",
      exprs => ReachExpression(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_reach_array",
      exprs => ReachArrayExpression(exprs(0), exprs(1), objectValues = false), "built-in")
    reg.createOrReplaceTempFunction("graft_reach_values",
      exprs => ReachArrayExpression(exprs(0), exprs(1), objectValues = true), "built-in")
    reg.createOrReplaceTempFunction("graft_doc_content",
      exprs => DocContentExpression(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_json_merge",
      exprs => JsonMergeExpression(exprs(0), exprs(1)), "built-in")
    // Cache-key canonicalization (cold path — plain UDFs are fine here).
    spark.udf.register("graft_hash_from_data", (json: String) => Hashing.hashFromData(json))
    spark.udf.register("graft_signature_hash",
      (uri: String, data: String) => Hashing.signatureHash(uri, data))
    spark.udf.register("graft_uri_from_url", (url: String) => Hashing.uriFromUrl(url))
    spark.udf.register("graft_sha1", (s: String) => Hashing.sha1Hex(s))
  }

  def reach(json: Column, path: String): Column =
    call_function("graft_reach", json, lit(path))
  def reachArray(json: Column, path: String): Column =
    call_function("graft_reach_array", json, lit(path))
  def reachValues(json: Column, path: String): Column =
    call_function("graft_reach_values", json, lit(path))
  def docContent(properties: Column, derivatives: Column, id: Column): Column =
    call_function("graft_doc_content", properties, derivatives, id)
  def jsonMerge(parent: Column, child: Column): Column =
    call_function("graft_json_merge", parent, child)
  def hashFromData(json: Column): Column = call_function("graft_hash_from_data", json)
  def signatureHash(uri: Column, data: Column): Column =
    call_function("graft_signature_hash", uri, data)
  def uriFromUrl(url: Column): Column = call_function("graft_uri_from_url", url)
}
