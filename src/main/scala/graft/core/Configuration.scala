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
    // the REGISTRY snapshot, not the static map: defaults an app
    // registered at startup (DefaultsRegistry.registerDefaults — the
    // reference's register_defaults) resolve in every Configuration
    // created afterwards; the captured snapshot keeps instances
    // immutable and serializable
    defaults: Map[String, Any] = DefaultsRegistry.snapshot) extends Serializable {

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
    // direct hit first, raw key as given: the reference's attribute
    // protocol — `config.batchSize` reads __dict__["batchSize"]
    // (stored as-is by update) BEFORE __getattr__ falls back to the
    // lowercased `_key`/`$key`/defaults chain (types.py:110,235-237);
    // without this probe a value stored under a non-lowercase key is
    // permanently unretrievable
    values.get(rawKey)
      .orElse(values.get("_" + key))
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

  /** The reference's package defaults (datagrowth/datagrowth.yml),
    * flattened from ConfigLoaders.PackageDefaults — ONE nested source
    * of truth for both the static map and the loader's allowlist. */
  val Defaults: Map[String, Any] = ConfigLoaders.flattenDefaults(
    ConfigLoaders.PackageDefaults)._1

  def apply(namespace: String, values: Map[String, Any]): Configuration =
    Configuration(namespace = Seq(namespace)).withValues(values)

  /** `create_config` (types.py:352-369): a fresh namespaced
    * configuration over the current registered defaults. */
  def createConfig(namespace: String, values: Map[String, Any]): Configuration =
    Configuration(namespace = Seq(namespace),
      privateKeys = Set("_private", "_namespace", "_defaults"))
      .withValues(values)

  /** `from_dict` (types.py:157-196): rebuild a configuration from its
    * serialized map form — `_namespace` and `_private` are REQUIRED
    * (they carry resolution behavior, and silently defaulting them
    * would change lookup results). */
  def fromDict(config: Map[String, Any],
               defaults: Option[Map[String, Any]] = None): Configuration = {
    require(config.contains("_namespace"),
      "_namespace needs to be specified in the configuration.")
    require(config.contains("_private"),
      "_private needs to be specified in the configuration.")
    val ns = config("_namespace") match {
      case s: String => Seq(s)
      case xs: Seq[_] => xs.map(_.toString)
      case other => Seq(other.toString)
    }
    val priv = config("_private") match {
      case xs: Iterable[_] => xs.map(_.toString).toSet
      case other => Set(other.toString)
    }
    Configuration(namespace = ns,
      privateKeys = DefaultPrivate ++ priv,
      defaults = defaults.getOrElse(DefaultsRegistry.snapshot))
      .withValues(config -- Seq("_namespace", "_private", "_defaults"))
  }

  /** `load_config` (serializers.py:12-30): coerce a raw map (which
    * must carry `_namespace`/`_private`) or a ready Configuration into
    * the typed form and hand it to `f` — the decorator's Scala shape. */
  def loadConfig[T](config: Any)(f: Configuration => T): T = config match {
    case c: Configuration => f(c)
    case m: Map[_, _] if m.nonEmpty =>
      f(fromDict(m.map { case (k, v) => k.toString -> (v: Any) }))
    case _ => throw new IllegalArgumentException(
      "loadConfig expects a non-empty config map or a Configuration.")
  }
}
