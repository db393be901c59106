package graft.core

/** Layered, namespaced key-value configuration — the reference's
  * `ConfigurationType` (reference: datagrowth/configuration/types.py:
  * 16-260). Lookup order for `get(key)` (types.py:92-140):
  *   1. the instance's private/shielded value `_key`;
  *   2. the instance's user-input variable `$key`;
  *   3. plain instance value `key`;
  *   4. defaults: fully-namespaced `key` as given;
  *   5. defaults: `<namespace>_key` for each namespace, then
  *      `<globalPrefix>_key`;
  *   6. ConfigurationNotFound.
  * Keys travel with components and across process boundaries —
  * immutable and serializable here (executors receive copies).
  */
final case class Configuration(
    values: Map[String, Any] = Map.empty,
    namespace: Seq[String] = Nil,
    privateKeys: Set[String] = Configuration.DefaultPrivate,
    defaults: Map[String, Any] = Configuration.Defaults) extends Serializable {

  /** `update` semantics (types.py:80-90): private-listed keys get
    * shielded with `_`, others stored as given. */
  def withValues(updates: Map[String, Any]): Configuration = {
    val merged = updates.foldLeft(values) { case (acc, (key, value)) =>
      val shielded = if (key.startsWith("_")) key else "_" + key
      if (privateKeys.contains(shielded)) acc + (shielded -> value)
      else acc + (key -> value)
    }
    copy(values = merged)
  }

  def supplement(extra: Map[String, Any]): Configuration =
    withValues(extra.filter { case (k, _) => getOption(Configuration.cleanKey(k)).isEmpty })

  def getOption(rawKey: String): Option[Any] = {
    val key = Configuration.cleanKey(rawKey).toLowerCase
    values.get("_" + key)
      .orElse(values.get("$" + key))
      .orElse(values.get(key))
      .orElse(defaults.get(key))
      .orElse {
        val spaces = if (namespace.contains(Configuration.GlobalPrefix)) namespace
          else namespace :+ Configuration.GlobalPrefix
        spaces.iterator.map(ns => defaults.get(s"${ns}_$key")).collectFirst {
          case Some(v) => v
        }
      }
  }

  def get(key: String): Any = getOption(key).getOrElse(
    throw new Configuration.ConfigurationNotFound(
      s"Tried to retrieve '$key' in config and namespace '$namespace', without results."))

  def getString(key: String): String = get(key).toString
  def getInt(key: String): Int = get(key) match {
    case i: Int => i; case l: Long => l.toInt; case s: String => s.toInt
    case other => throw new IllegalArgumentException(s"Not an int: $other")
  }
  def getBoolean(key: String): Boolean = get(key) match {
    case b: Boolean => b; case s: String => s.toBoolean
    case other => throw new IllegalArgumentException(s"Not a boolean: $other")
  }

  /** `to_dict` (types.py:200-221): plain keys always; `_`-keys only when
    * protected (non-private) or private requested. */
  def toMap(protectedKeys: Boolean = false, includePrivate: Boolean = false): Map[String, Any] =
    values.filter {
      case (k, _) if !k.startsWith("_") => true
      case (k, _) => (includePrivate && privateKeys.contains(k)) ||
        (protectedKeys && !privateKeys.contains(k))
    }
}

object Configuration {
  val GlobalPrefix = "global"

  class ConfigurationNotFound(msg: String) extends RuntimeException(msg)

  /** `clean_key` (types.py:222-233). */
  def cleanKey(key: String): String =
    if (key.startsWith("$") || key.startsWith("_")) key.substring(1) else key

  val DefaultPrivate: Set[String] = Set("_defaults", "_namespace", "_private")

  /** The reference's package defaults (datagrowth/datagrowth.yml). */
  val Defaults: Map[String, Any] = Map(
    "global_batch_size" -> 100,
    "global_max_batch_size" -> 100,
    "global_datetime_format" -> "%Y%m%d%H%M%S%f",
    "global_cache_only" -> false,
    "global_sample_size" -> 0,
    "global_async" -> true,
    "http_resource_timeout" -> 30,
    "http_resource_continuation_limit" -> 1,
    "http_resource_interval_duration" -> 0,
    "http_resource_backoff_delays" -> Seq(2, 4, 8, 16),
    "http_resource_concat_args_size" -> 0,
    "http_resource_concat_args_symbol" -> "|",
    "extract_processor_extract_from_object_values" -> false,
    "growth_processor_growth_phase" -> "",
    "growth_processor_depends_on" -> "",
    "growth_processor_to_property" -> "",
    "growth_processor_apply_resource_to" -> Seq.empty[String])

  def apply(namespace: String, values: Map[String, Any]): Configuration =
    Configuration(namespace = Seq(namespace)).withValues(values)
}
