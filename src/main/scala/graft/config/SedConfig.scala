package graft.config

import java.nio.file.{Files, Path, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import scala.jdk.CollectionConverters._

/** Layered configuration (`sed/core/config.py:19-141`): merge
  * folder > user > system > default config files, deep-merging nested
  * sections (higher layers win per-key). The reference reads YAML or
  * JSON; this engine reads JSON natively (Jackson ships on the Spark
  * classpath) and `.yaml`/`.yml` through the dependency-free subset
  * converter [[YamlShim]], so real sed config files load unmodified.
  */
object SedConfig {

  private val mapper = new ObjectMapper()

  /** Deep merge: keys of `overlay` win; nested objects merge recursively
    * (`sed/core/config.py` `complete_dictionary` semantics).
    */
  def deepMerge(base: JsonNode, overlay: JsonNode): JsonNode = {
    if (!base.isObject || !overlay.isObject) return overlay
    val out = base.deepCopy[ObjectNode]()
    overlay.properties().asScala.foreach { e =>
      val k = e.getKey
      if (out.has(k)) out.set[JsonNode](k, deepMerge(out.get(k), e.getValue))
      else out.set[JsonNode](k, e.getValue)
    }
    out
  }

  /** Parse one config file: `.yaml`/`.yml` via [[YamlShim]], else JSON. */
  def parse(path: Path): JsonNode = {
    val text = Files.readString(path)
    val name = path.getFileName.toString.toLowerCase(java.util.Locale.ROOT)
    if (name.endsWith(".yaml") || name.endsWith(".yml")) YamlShim.parse(text)
    else mapper.readTree(text)
  }

  def parseString(json: String): JsonNode = mapper.readTree(json)

  /** Layered load: paths ordered lowest-priority first (default, system,
    * user, folder); missing files are skipped like the reference's
    * optional layers.
    */
  def load(paths: Seq[String]): JsonNode =
    paths.map(Paths.get(_)).filter(Files.exists(_)).map(parse)
      .foldLeft(mapper.createObjectNode(): JsonNode)(deepMerge)

  /** Config write-back (`sed/core/config.py:175` `save_config`): merge
    * `config` over any existing file content (existing keys not present
    * in `config` survive — `complete_dictionary` semantics) unless
    * `overwrite`, then write YAML (`.yaml`/`.yml` via [[YamlShim.emit]])
    * or pretty-printed JSON by suffix. This is how fitted calibrations
    * persist to `sed_config.yaml` for reuse across sessions.
    */
  def save(config: JsonNode, path: String, overwrite: Boolean = false): Unit = {
    val p = Paths.get(path)
    val existing: JsonNode =
      if (Files.exists(p) && !overwrite) parse(p) else mapper.createObjectNode()
    val merged = deepMerge(existing, config)
    val name = path.toLowerCase(java.util.Locale.ROOT)
    val text =
      if (name.endsWith(".yaml") || name.endsWith(".yml")) YamlShim.emit(merged)
      else mapper.writerWithDefaultPrettyPrinter().writeValueAsString(merged)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, text)
  }

  /** Build a nested `{outer: {inner: fields}}` node — the shape every
    * `Processor.save*` method persists.
    */
  def section(outer: String, inner: String, fields: JsonNode): JsonNode = {
    val root = mapper.createObjectNode()
    root.putObject(outer).set[JsonNode](inner, fields)
    root
  }

  /** Dotted-path accessors with defaults, the config-consumption style
    * the processor uses (`"dataframe.x_column"` etc.).
    */
  def getString(cfg: JsonNode, path: String, default: String = null): String = {
    val n = at(cfg, path)
    if (n == null) Option(default).getOrElse(
      throw new NoSuchElementException(s"config key $path missing"))
    else n.asText()
  }

  def getDouble(cfg: JsonNode, path: String, default: Double = Double.NaN): Double = {
    val n = at(cfg, path)
    if (n == null) {
      if (default.isNaN) throw new NoSuchElementException(s"config key $path missing")
      default
    } else n.asDouble()
  }

  def getInt(cfg: JsonNode, path: String, default: Int = Int.MinValue): Int = {
    val n = at(cfg, path)
    if (n == null) {
      if (default == Int.MinValue) throw new NoSuchElementException(s"config key $path missing")
      default
    } else n.asInt()
  }

  def getBoolean(cfg: JsonNode, path: String, default: Boolean = false): Boolean = {
    val n = at(cfg, path)
    if (n == null) default else n.asBoolean()
  }

  /** Numeric-array accessor (calibration coeffs, adc_range, …). */
  def getDoubles(cfg: JsonNode, path: String): Seq[Double] = {
    val n = at(cfg, path)
    if (n == null || !n.isArray) Nil
    else {
      val out = Seq.newBuilder[Double]
      n.forEach(c => out += c.asDouble())
      out.result()
    }
  }

  /** Subtree at a dotted path, if present. */
  def node(cfg: JsonNode, path: String): Option[JsonNode] = Option(at(cfg, path))

  private def at(cfg: JsonNode, path: String): JsonNode = {
    val r = path.split('.').foldLeft(cfg: JsonNode) { (n, k) =>
      if (n == null) null else n.get(k)
    }
    // an explicit `key: null` (Python None round-tripped through YAML)
    // behaves like an absent key: the typed accessors would otherwise
    // coerce NullNode to the literal "null" / 0.0 / 0 / false and feed
    // garbage downstream with no error
    if (r != null && r.isNull) null else r
  }

  /** `"@alias"` indirection for axis arguments
    * (`sed/core/processor.py:2102-2104`): `"@energy"` resolves through
    * `dataframe.<alias>_column`.
    */
  def resolveAxis(cfg: JsonNode, axis: String): String =
    if (axis.startsWith("@"))
      getString(cfg, s"dataframe.${axis.drop(1)}_column")
    else axis
}
