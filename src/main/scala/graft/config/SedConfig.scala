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
    val name = path.getFileName.toString.toLowerCase
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

  private def at(cfg: JsonNode, path: String): JsonNode =
    path.split('.').foldLeft(cfg: JsonNode) { (n, k) =>
      if (n == null) null else n.get(k)
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
