package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference loader cases
  * (tests/django_project/configuration/test_loaders.py) plus the
  * register_defaults runtime-registration surface (types.py:371). */
class ConfigLoadersSpec extends AnyFunSuite {

  test("hierarchy and implicit global mapping: env beats settings, project beats settings") {
    val settings = Map(
      "GRAFT_ASYNC" -> false,
      "GRAFT_SHELL_RESOURCE_BIN_DIR" -> "/settings/proper/bin",
      "GRAFT_BIN_DIR" -> "/settings/plain/bin")
    val project = Map("shell_resource" -> Map("bin_dir" -> "/project/bin"))
    val out = ConfigLoaders.buildDefaultConfiguration(
      projectConfig = project,
      env = Map("GRAFT_ASYNC" -> "true"),
      settings = settings)
    assert(out.configuration("global_async") === true,
      "env wins over settings, implicit global_ prefix applied")
    assert(out.configuration("shell_resource_bin_dir") === "/project/bin",
      "project file wins over settings")
  }

  test("plain compat settings have lower precedence than proper namespaced settings") {
    val project = Map("shell_resource" -> Map("interval_duration" -> 0))
    val out = ConfigLoaders.buildDefaultConfiguration(
      projectConfig = project,
      env = Map.empty,
      settings = Map(
        "GRAFT_BIN_DIR" -> "/settings/plain/bin",
        "GRAFT_SHELL_RESOURCE_BIN_DIR" -> "/settings/proper/bin"))
    assert(out.configuration("shell_resource_bin_dir") === "/settings/proper/bin")
  }

  test("unknown keys are ignored and warned with their source") {
    val out = ConfigLoaders.buildDefaultConfiguration(
      env = Map("GRAFT_UNKNOWN" -> "env-unknown"),
      settings = Map("GRAFT_UNKNOWN" -> "settings-unknown"))
    assert(!out.configuration.contains("global_unknown"))
    assert(!out.configuration.contains("unknown"))
    val text = out.warnings.mkString("\n")
    assert(text.contains("env:") && text.contains("settings:"),
      s"both layers must report the drop, got: $text")
  }

  test("project keys extend the allowlist") {
    val out = ConfigLoaders.buildDefaultConfiguration(
      projectConfig = Map("unknown_namespace" -> Map("value" -> 1)))
    assert(out.configuration("unknown_namespace_value") === 1)
  }

  test("missing default key disables proper and plain overrides") {
    val slimDefaults = Map[String, Any](
      "global" -> Map("async" -> true),
      "http_resource" -> Map("user_agent" -> null),
      "shell_resource" -> Map("interval_duration" -> 0))
    val out = ConfigLoaders.buildDefaultConfiguration(
      packageDefaults = slimDefaults,
      env = Map.empty,
      settings = Map(
        "GRAFT_SHELL_RESOURCE_BIN_DIR" -> "/settings/proper/bin",
        "GRAFT_BIN_DIR" -> "/settings/plain/bin",
        "GRAFT_ASYNC" -> false))
    assert(!out.configuration.contains("shell_resource_bin_dir"))
    assert(out.configuration("global_async") === false)
    val text = out.warnings.mkString("\n")
    assert(text.contains("GRAFT_SHELL_RESOURCE_BIN_DIR") && text.contains("GRAFT_BIN_DIR"))
  }

  test("GRAFT_DEFAULT_CONFIGURATION in settings is rejected") {
    intercept[ConfigLoaders.InvalidConfigurationError] {
      ConfigLoaders.buildDefaultConfiguration(
        settings = Map("GRAFT_DEFAULT_CONFIGURATION" ->
          Map("global_async" -> false)))
    }
  }

  test("env values coerce by the default value's type") {
    val out = ConfigLoaders.buildDefaultConfiguration(env = Map(
      "GRAFT_GLOBAL_BATCH_SIZE" -> "250",
      "GRAFT_GLOBAL_CACHE_ONLY" -> "Yes",
      "GRAFT_HTTP_RESOURCE_BACKOFF_DELAYS" -> "[1, 2, 3]",
      "GRAFT_HTTP_RESOURCE_CONCAT_ARGS_SYMBOL" -> "&"))
    assert(out.configuration("global_batch_size") === 250)
    assert(out.configuration("global_cache_only") === true)
    assert(out.configuration("http_resource_backoff_delays") === Seq(1, 2, 3))
    assert(out.configuration("http_resource_concat_args_symbol") === "&")
  }

  test("env coercion keeps the default's exact type: out-of-Int-range overrides fail fast") {
    // an Int default must never surface a boxed Long (downstream
    // asInstanceOf[Int]/getInt would throw) — and a NUMERIC value that
    // cannot be represented is a configuration error that must surface
    // at load time, not be silently kept as a String where every
    // reader expects an Int
    val e = intercept[IllegalArgumentException] {
      ConfigLoaders.buildDefaultConfiguration(env = Map(
        "GRAFT_GLOBAL_BATCH_SIZE" -> "3000000000"))
    }
    assert(e.getMessage.contains("outside Int range"))
    // ... including numerics too large even for LONG (2^63): toLong's
    // NumberFormatException must not smuggle them past the fail-fast
    val e2 = intercept[IllegalArgumentException] {
      ConfigLoaders.coerceEnvValue("9223372036854775808", 5)
    }
    assert(e2.getMessage.contains("outside Int range"))
    val e3 = intercept[IllegalArgumentException] {
      ConfigLoaders.coerceEnvValue("9223372036854775808", 5L)
    }
    assert(e3.getMessage.contains("outside Long range"))
    // a NON-numeric string still falls back raw, reference-style
    assert(ConfigLoaders.coerceEnvValue("not-a-number", 5) === "not-a-number")
    val ok = ConfigLoaders.buildDefaultConfiguration(env = Map(
      "GRAFT_GLOBAL_BATCH_SIZE" -> "2147483647"))
    assert(ok.configuration("global_batch_size") === Int.MaxValue)
    assert(ok.configuration("global_batch_size").isInstanceOf[Int])
  }

  test("flattenDefaults reproduces Configuration.Defaults exactly") {
    val (flat, warnings) = ConfigLoaders.flattenDefaults(
      ConfigLoaders.PackageDefaults)
    assert(flat === Configuration.Defaults)
    assert(warnings.isEmpty)
  }

  test("registerDefaults: later configurations resolve app namespaces; earlier snapshots do not") {
    DefaultsRegistry.reset()
    try {
      val before = Configuration(namespace = Seq("my_app"))
      DefaultsRegistry.registerDefaults("my_app", Map(
        "page_size" -> 25, "Retries" -> 3))
      val after = Configuration(namespace = Seq("my_app"))
      assert(after.get("page_size") === 25, "namespace-prefixed default resolves")
      assert(after.get("retries") === 3, "keys lowercase on registration")
      intercept[Configuration.ConfigurationNotFound](before.get("page_size"))
      // registration does not disturb package defaults
      assert(after.getInt("batch_size") === 100)
    } finally DefaultsRegistry.reset()
  }

  test("install hands the loader result to new configurations") {
    DefaultsRegistry.reset()
    try {
      DefaultsRegistry.install(ConfigLoaders.buildDefaultConfiguration(
        env = Map("GRAFT_GLOBAL_BATCH_SIZE" -> "7")))
      assert(Configuration(namespace = Seq("x")).getInt("batch_size") === 7)
    } finally DefaultsRegistry.reset()
  }

  test("fromDict requires _namespace and _private; loadConfig coerces maps") {
    intercept[IllegalArgumentException](
      Configuration.fromDict(Map("a" -> 1, "_private" -> Seq.empty)))
    intercept[IllegalArgumentException](
      Configuration.fromDict(Map("a" -> 1, "_namespace" -> "n")))
    val c = Configuration.fromDict(Map(
      "_namespace" -> "http_resource", "_private" -> Seq("_secret"),
      "secret" -> "s3cr3t", "timeout" -> 5))
    assert(c.get("timeout") === 5)
    assert(c.get("secret") === "s3cr3t", "private keys readable on the instance")
    assert(!c.toMap().contains("_secret"), "but shielded from plain serialization")
    assert(c.getInt("continuation_limit") === 1, "namespace defaults resolve")
    val viaLoad = Configuration.loadConfig(Map(
      "_namespace" -> "global", "_private" -> Seq.empty[String], "batch_size" -> 9))(
      cfg => cfg.getInt("batch_size"))
    assert(viaLoad === 9)
    intercept[IllegalArgumentException](
      Configuration.loadConfig(Map.empty[String, Any])(identity))
  }
}
