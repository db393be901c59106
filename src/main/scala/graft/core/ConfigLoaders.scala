package graft.core

/** Layered default-configuration loading + runtime defaults
  * registration — the reference's configuration bootstrap surface
  * (reference: datagrowth/configuration/loaders.py:14-260,
  * types.py:371-389). Two capabilities the immutable
  * `Configuration.Defaults` map alone could not offer:
  *
  *  1. [[DefaultsRegistry.registerDefaults]] — an application registers
  *     its OWN namespace defaults at startup (the reference's
  *     `register_defaults`, called from an app-ready hook); every
  *     `Configuration` created afterwards resolves them.
  *  2. [[ConfigLoaders.buildDefaultConfiguration]] — the layered merge
  *     of package defaults ← framework settings (plain compat keys
  *     below proper namespaced ones) ← project file ← environment,
  *     with an ALLOWLIST drawn from package defaults plus
  *     project-file-inferred keys: unknown keys are dropped and
  *     reported, never silently admitted (loaders.py:40-47).
  */
object ConfigLoaders {

  final class InvalidConfigurationError(msg: String)
    extends IllegalArgumentException(msg)

  /** The merged flat configuration plus the warnings the merge emitted
    * (dropped unknown keys, each labeled with its source layer). */
  final case class LoadResult(configuration: Map[String, Any],
                              warnings: Seq[String])

  val EnvPrefix = "GRAFT"

  /** Historic un-namespaced settings names mapped to their proper
    * namespaced keys — accepted for compatibility but at LOWER
    * precedence than the proper form (loaders.py:17-27). */
  val PlainCompatibilityKeys: Map[String, String] = Map(
    s"${EnvPrefix}_DATETIME_FORMAT" -> "global_datetime_format",
    s"${EnvPrefix}_DATA_DIR" -> "global_data_dir",
    s"${EnvPrefix}_MAX_BATCH_SIZE" -> "global_max_batch_size",
    s"${EnvPrefix}_BIN_DIR" -> "shell_resource_bin_dir")

  /** Package defaults in NESTED (namespace → key → value) form — the
    * full reference default file mirrored under this repo's
    * established key names (reference: datagrowth/datagrowth.yml);
    * [[flattenDefaults]] of this map IS `Configuration.Defaults`. */
  val PackageDefaults: Map[String, Map[String, Any]] = Map(
    "global" -> Map(
      "batch_size" -> 100,
      "max_batch_size" -> 100,
      "datetime_format" -> "%Y%m%d%H%M%S%f",
      "cache_only" -> false,
      "sample_size" -> 0,
      "async" -> true,
      "data_dir" -> null,
      "purge_immediately" -> false),
    "http_resource" -> Map(
      "timeout" -> 30,
      "user_agent" -> null,
      "continuation_limit" -> 1,
      "interval_duration" -> 0,
      "backoff_delays" -> Seq(2, 4, 8, 16),
      "concat_args_size" -> 0,
      "concat_args_symbol" -> "|",
      "allow_redirects" -> true),
    "shell_resource" -> Map(
      "interval_duration" -> 0,
      "bin_dir" -> null),
    "tika_resource" -> Map(
      "force_data_file_to_payload" -> true),
    "extract_processor" -> Map(
      "extract_from_object_values" -> false),
    "transform_processor" -> Map(
      "extract_from_object_values" -> false),
    "growth_processor" -> Map(
      "growth_phase" -> "",
      "depends_on" -> "",
      "to_property" -> "",
      "apply_resource_to" -> Seq.empty[String]),
    "micro_service" -> Map(
      "connections" -> Map("tika" -> Map(
        "protocol" -> "http",
        "host" -> "localhost:9998",
        "path" -> "/rmeta/text"))))

  /** namespace→key nesting to `namespace_key` flat keys
    * (loaders.py:84-93); non-map namespace values are reported. */
  def flattenDefaults(nested: Map[String, Any]): (Map[String, Any], Seq[String]) = {
    val warnings = Seq.newBuilder[String]
    val flat = Map.newBuilder[String, Any]
    nested.foreach {
      case (ns, values: Map[_, _]) =>
        values.foreach { case (k, v) =>
          flat += s"${ns.toLowerCase}_${k.toString.toLowerCase}" -> v
        }
      case (ns, _) =>
        warnings += s"package defaults: ignoring non-namespace key '$ns'"
    }
    (flat.result(), warnings.result())
  }

  /** Allowed keys a PROJECT file contributes beyond the package
    * defaults (loaders.py:96-112): a 1-segment path is an implicit
    * `global_` key; deeper paths contribute their first two segments
    * as `namespace_key` (anything below stays a nested value). */
  def inferProjectAllowedKeys(project: Map[String, Any]): Set[String] = {
    val inferred = Set.newBuilder[String]
    def walk(node: Any, path: Vector[String]): Unit = node match {
      case m: Map[_, _] =>
        m.foreach { case (k, v) => walk(v, path :+ k.toString.toLowerCase) }
      case _ if path.isEmpty => ()
      case _ if path.length == 1 => inferred += s"global_${path.head}"
      case _ => inferred += path.take(2).mkString("_")
    }
    walk(project, Vector.empty)
    inferred.result()
  }

  /** Environment strings coerced by the DEFAULT value's type
    * (loaders.py:50-68): bool by truthy literal, int/double by parse
    * (falling back to the raw string), containers by JSON. The coerced
    * value always carries the default's EXACT runtime type — an Int
    * default never yields a boxed Long. A NUMERIC override outside the
    * Int default's range is a configuration ERROR and throws (the
    * reference's ints are unbounded, so it would accept the value —
    * here the honest move is to surface the mismatch at load time, not
    * to silently keep a String where every reader expects an Int). A
    * non-numeric string still falls back raw, reference-style. */
  def coerceEnvValue(value: String, defaultValue: Any): Any = defaultValue match {
    case _: Boolean =>
      Set("1", "true", "yes", "on").contains(value.trim.toLowerCase)
    case _: Int =>
      try {
        val l = value.trim.toLong
        if (l >= Int.MinValue && l <= Int.MaxValue) l.toInt
        else throw new IllegalArgumentException(
          s"environment override '$value' is numeric but outside Int range " +
            "for an Int-typed default — use a smaller value or widen the " +
            "default to Long")
      } catch {
        case _: NumberFormatException =>
          // a numeric string too large even for Long is STILL a numeric
          // out-of-range override, not an opaque raw string — without
          // this check 2^63 silently slipped past the fail-fast the
          // in-Long-range branch enforces
          if (value.trim.matches("[+-]?\\d+"))
            throw new IllegalArgumentException(
              s"environment override '$value' is numeric but outside Int range " +
                "for an Int-typed default — use a smaller value or widen the " +
                "default to Long")
          else value
      }
    case _: Long =>
      try value.trim.toLong catch {
        case _: NumberFormatException =>
          if (value.trim.matches("[+-]?\\d+"))
            throw new IllegalArgumentException(
              s"environment override '$value' is numeric but outside Long " +
                "range for a Long-typed default")
          else value
      }
    case _: Double =>
      try value.trim.toDouble catch { case _: NumberFormatException => value }
    case _: Float =>
      try value.trim.toFloat catch { case _: NumberFormatException => value }
    case _: Seq[_] | _: Map[_, _] | null =>
      try jsonToScala(PyJson.parse(value)) catch { case _: Exception => value }
    case _ => value
  }

  private def jsonToScala(node: com.fasterxml.jackson.databind.JsonNode): Any = {
    import scala.jdk.CollectionConverters._
    if (node.isArray) node.elements().asScala.map(jsonToScala).toSeq
    else if (node.isObject)
      node.fields().asScala.map(e => e.getKey -> jsonToScala(e.getValue)).toMap
    else if (node.isBoolean) node.asBoolean()
    else if (node.isIntegralNumber) node.asLong() match {
      case l if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case l => l
    }
    else if (node.isNumber) node.asDouble()
    else if (node.isNull) null
    else node.asText()
  }

  /** Nested (or flat) configuration normalized against the allowlist
    * (loaders.py:115-160): each path tries its explicit
    * `namespace_key` form first, then the implicit `global_` prefix;
    * unmatched paths are dropped with a warning naming the source. */
  def normalizeNamespaced(config: Map[String, Any], allowed: Set[String],
                          source: String): (Map[String, Any], Seq[String]) = {
    val warnings = Seq.newBuilder[String]
    val out = Map.newBuilder[String, Any]
    def walk(node: Any, path: Vector[String]): Unit = node match {
      case m: Map[_, _] if path.length < 2 =>
        m.foreach { case (k, v) => walk(v, path :+ k.toString.toLowerCase) }
      case v =>
        val joined = path.mkString("_")
        if (allowed.contains(joined)) out += joined -> v
        else if (allowed.contains(s"global_$joined")) out += s"global_$joined" -> v
        else warnings += s"$source: ignoring unknown configuration key '${path.mkString(".")}'"
    }
    walk(config, Vector.empty)
    (out.result(), warnings.result())
  }

  /** Framework settings (`GRAFT_*` names) split into proper namespaced
    * overrides and plain-compat overrides, allowlist-checked. The
    * reserved `GRAFT_DEFAULT_CONFIGURATION` is REJECTED (it would
    * bypass the layered merge — loaders.py raises the same way). */
  private def settingsLayers(settings: Map[String, Any], allowed: Set[String])
      : (Map[String, Any], Map[String, Any], Seq[String]) = {
    if (settings.contains(s"${EnvPrefix}_DEFAULT_CONFIGURATION"))
      throw new InvalidConfigurationError(
        s"${EnvPrefix}_DEFAULT_CONFIGURATION is not a valid setting: " +
          "register defaults through DefaultsRegistry.registerDefaults or a project file")
    val warnings = Seq.newBuilder[String]
    val plain = Map.newBuilder[String, Any]
    val proper = Map.newBuilder[String, Any]
    settings.foreach { case (name, value) =>
      if (PlainCompatibilityKeys.contains(name)) {
        val key = PlainCompatibilityKeys(name)
        if (allowed.contains(key)) plain += key -> value
        else warnings += s"settings: ignoring unknown configuration key '$name' (normalized to '$key')"
      } else if (name.startsWith(s"${EnvPrefix}_")) {
        val key = name.stripPrefix(s"${EnvPrefix}_").toLowerCase
        if (allowed.contains(key)) proper += key -> value
        else if (allowed.contains(s"global_$key")) proper += s"global_$key" -> value
        else warnings += s"settings: ignoring unknown configuration key '$name'"
      }
    }
    (plain.result(), proper.result(), warnings.result())
  }

  /** The layered default-configuration build (loaders.py:163-260).
    * Precedence, lowest first: package defaults, plain-compat
    * settings, proper namespaced settings, project file, environment.
    * The allowlist = flattened package defaults ∪ project-inferred
    * keys; environment values coerce by the default value's type. */
  def buildDefaultConfiguration(
      packageDefaults: Map[String, Any] = PackageDefaults,
      projectConfig: Map[String, Any] = Map.empty,
      env: Map[String, String] = sys.env,
      settings: Map[String, Any] = Map.empty): LoadResult = {
    val warnings = Seq.newBuilder[String]
    val (flatDefaults, wDefaults) = flattenDefaults(packageDefaults)
    warnings ++= wDefaults
    val allowed = flatDefaults.keySet ++ inferProjectAllowedKeys(projectConfig)
    val (plainSettings, properSettings, wSettings) = settingsLayers(settings, allowed)
    warnings ++= wSettings
    val (projectLayer, wProject) = normalizeNamespaced(projectConfig, allowed, "project file")
    warnings ++= wProject
    val envLayer = Map.newBuilder[String, Any]
    env.foreach { case (name, raw) =>
      if (name.startsWith(s"${EnvPrefix}_") &&
          name != s"${EnvPrefix}_DEFAULT_CONFIGURATION") {
        val key = name.stripPrefix(s"${EnvPrefix}_").toLowerCase
        val resolved =
          if (allowed.contains(key)) Some(key)
          else if (allowed.contains(s"global_$key")) Some(s"global_$key")
          else PlainCompatibilityKeys.get(name).filter(allowed.contains)
        resolved match {
          case Some(k) =>
            val merged = flatDefaults ++ plainSettings ++ properSettings ++ projectLayer
            envLayer += k -> coerceEnvValue(raw, merged.getOrElse(k, null))
          case None =>
            warnings += s"env: ignoring unknown configuration key '$name'"
        }
      }
    }
    LoadResult(
      flatDefaults ++ plainSettings ++ properSettings ++ projectLayer ++ envLayer.result(),
      warnings.result())
  }
}

/** Mutable GLOBAL defaults registry — the reference's
  * `register_defaults` (types.py:371-389): applications extend the
  * package defaults at startup (a "ready" hook) under their own
  * namespace, and every [[Configuration]] created afterwards resolves
  * the registered keys through its defaults chain. Thread-safe;
  * executors receive the snapshot CAPTURED when a Configuration is
  * created (configs are immutable and serializable — registration is
  * a driver-side bootstrap act, not a distributed one). */
object DefaultsRegistry {
  @volatile private var current: Map[String, Any] = Configuration.Defaults

  def registerDefaults(namespace: String,
                       configuration: Map[String, Any]): Unit = synchronized {
    current = current ++ configuration.map { case (k, v) =>
      s"${namespace.toLowerCase}_${k.toLowerCase}" -> v
    }
  }

  /** Replace the whole default set (the loader's bootstrap hand-off):
    * `DefaultsRegistry.install(ConfigLoaders.buildDefaultConfiguration(...))`. */
  def install(result: ConfigLoaders.LoadResult): Unit = synchronized {
    current = result.configuration
  }

  def snapshot: Map[String, Any] = current

  /** Test hook: back to the immutable package defaults. */
  private[graft] def reset(): Unit = synchronized {
    current = Configuration.Defaults
  }
}
