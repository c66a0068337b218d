package graft.config

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** Minimal YAML → Jackson `JsonNode` converter covering the subset the
  * reference's config files use (`sed/core/config.py:19-141` loads YAML;
  * e.g. `sed/config/mpes_example_config.yaml`):
  *
  *  - indentation-nested block mappings
  *  - block sequences (`- item`)
  *  - flow sequences/mappings (`[a, [b, c]]`, `{k: v}`), arbitrarily nested
  *  - scalars: single-/double-quoted strings, ints, floats (incl.
  *    `4.125e-12`), `True/False/true/false`, `None/null/~`, bare strings
  *  - `#` comments (full-line and trailing, quote-aware)
  *  - anchors/aliases (`&name` / `*name`, on scalars, flow values, block
  *    maps and sequence items; PyYAML's define-before-use rule) and merge
  *    keys (`<<: *base`, `<<: [*a, *b]` — explicit keys win, earlier
  *    merge sources take precedence over later ones)
  *
  * Not YAML-complete by design (no tags, multi-line block scalars, or
  * multi-document streams — none appear in sed configs); unsupported
  * syntax falls back to a string scalar rather than failing, which
  * matches how the configs are consumed (typed accessors in [[SedConfig]]
  * coerce on read).
  */
object YamlShim {

  private val F = JsonNodeFactory.instance

  def parse(text: String): JsonNode = {
    val lines = text.linesIterator.toIndexedSeq
      .map(stripComment)
      .zipWithIndex
      .filter { case (l, _) => l.trim.nonEmpty }
      .map { case (l, i) => Line(indentOf(l), l.trim, i) }
    if (lines.isEmpty) F.objectNode()
    else parseBlock(lines, 0, lines.head.indent,
      collection.mutable.Map.empty[String, JsonNode])._1
  }

  private final case class Line(indent: Int, text: String, num: Int)
  private type Anchors = collection.mutable.Map[String, JsonNode]

  private val AnchorRe = "^&([A-Za-z0-9_-]+)\\s*(.*)$".r
  private val AliasRe = "^\\*([A-Za-z0-9_-]+)$".r

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  /** Remove a trailing `# comment` that is not inside quotes. */
  private def stripComment(l: String): String = {
    var i = 0
    var quote: Char = 0
    while (i < l.length) {
      val c = l.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') quote = c
      else if (c == '#' && (i == 0 || l.charAt(i - 1) == ' ')) return l.substring(0, i)
      i += 1
    }
    l
  }

  /** Parse the block starting at `start` whose lines share `indent`;
    * returns (node, index of first line past the block).
    */
  private def parseBlock(
      lines: IndexedSeq[Line], start: Int, indent: Int, anchors: Anchors,
  ): (JsonNode, Int) = {
    if (lines(start).text.startsWith("- ") || lines(start).text == "-")
      parseSeq(lines, start, indent, anchors)
    else parseMap(lines, start, indent, anchors)
  }

  private def parseSeq(
      lines: IndexedSeq[Line], start: Int, indent: Int, anchors: Anchors,
  ): (JsonNode, Int) = {
    val arr = F.arrayNode()
    var i = start
    while (i < lines.length && lines(i).indent == indent && (
      lines(i).text.startsWith("- ") || lines(i).text == "-")) {
      var item = lines(i).text.drop(1).trim
      // `- &name` introducing an anchored block item
      var anchorName: Option[String] = None
      item match {
        case AnchorRe(n, rest) if rest.isEmpty => anchorName = Some(n); item = ""
        case _                                 =>
      }
      if (item.isEmpty && i + 1 < lines.length && lines(i + 1).indent > indent) {
        val (child, next) = parseBlock(lines, i + 1, lines(i + 1).indent, anchors)
        anchorName.foreach(anchors(_) = child)
        arr.add(child); i = next
      } else if (item.isEmpty) {
        val n = F.nullNode()
        anchorName.foreach(anchors(_) = n)
        arr.add(n); i += 1
      } else {
        arr.add(scalarOrFlow(item, anchors)); i += 1
      }
    }
    (arr, i)
  }

  private def parseMap(
      lines: IndexedSeq[Line], start: Int, indent: Int, anchors: Anchors,
  ): (JsonNode, Int) = {
    val obj = F.objectNode()
    // merge-key sources accumulate and apply after the block closes, so
    // explicit keys win regardless of where `<<` sits in the mapping
    val mergeSources = collection.mutable.ArrayBuffer[ObjectNode]()
    var i = start
    while (i < lines.length && lines(i).indent == indent && !lines(i).text.startsWith("- ")) {
      val l = lines(i)
      val ci = keyColon(l.text)
      require(ci > 0, s"YAML line ${l.num + 1}: expected 'key: value', got '${l.text}'")
      val key = unquote(l.text.substring(0, ci).trim)
      var rest = l.text.substring(ci + 1).trim
      // `key: &name ...` anchors whatever value follows (inline or block)
      var anchorName: Option[String] = None
      rest match {
        case AnchorRe(n, r) => anchorName = Some(n); rest = r.trim
        case _              =>
      }
      val value: JsonNode =
        if (rest.nonEmpty) {
          i += 1
          scalarOrFlow(rest, anchors)
        } else if (i + 1 < lines.length && lines(i + 1).indent > indent) {
          val (child, next) = parseBlock(lines, i + 1, lines(i + 1).indent, anchors)
          i = next
          child
        } else {
          i += 1
          F.nullNode() // `key:` with no value
        }
      anchorName.foreach(anchors(_) = value)
      if (key == "<<") value match {
        case o: ObjectNode => mergeSources += o
        case a: ArrayNode  =>
          a.forEach {
            case o: ObjectNode => mergeSources += o
            case other => throw new IllegalArgumentException(
              s"YAML line ${l.num + 1}: merge key source must be a mapping, got $other")
          }
        case other => throw new IllegalArgumentException(
          s"YAML line ${l.num + 1}: merge key source must be a mapping, got $other")
      }
      else obj.set[JsonNode](key, value)
    }
    mergeSources.foreach { src =>
      val it = src.fieldNames()
      while (it.hasNext) {
        val k = it.next()
        if (!obj.has(k)) obj.set[JsonNode](k, src.get(k).deepCopy())
      }
    }
    (obj, i)
  }

  /** Index of the key-terminating colon (outside quotes, followed by
    * space/EOL), or -1.
    */
  private def keyColon(s: String): Int = {
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') quote = c
      else if (c == ':' && (i == s.length - 1 || s.charAt(i + 1) == ' ')) return i
      i += 1
    }
    -1
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '\'' && s.last == '\'') || (s.head == '"' && s.last == '"')))
      s.substring(1, s.length - 1)
    else s

  private val IntRe = "^[+-]?\\d+$".r
  private val FloatRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$".r

  private def scalarOrFlow(s: String, anchors: Anchors): JsonNode = s.head match {
    case '[' => flowSeq(s, anchors)
    case '{' => flowMap(s, anchors)
    case '*' => s match {
      case AliasRe(n) => anchors.getOrElse(n,
        throw new IllegalArgumentException(s"undefined YAML alias *$n"))
        .deepCopy[JsonNode]()
      case _ => scalar(s)
    }
    case '&' => s match {
      // inline anchored value inside a flow collection: `[&a 1, *a]`
      case AnchorRe(n, rest) if rest.nonEmpty =>
        val v = scalarOrFlow(rest.trim, anchors)
        anchors(n) = v
        v
      case _ => scalar(s)
    }
    case _   => scalar(s)
  }

  private def scalar(raw: String): JsonNode = {
    val s = raw.trim
    if (s.head == '\'' || s.head == '"') F.textNode(unquote(s))
    else s match {
      case "true" | "True" | "TRUE"    => F.booleanNode(true)
      case "false" | "False" | "FALSE" => F.booleanNode(false)
      case "null" | "None" | "~"       => F.nullNode()
      case IntRe()                     => F.numberNode(s.toLong)
      case FloatRe(_, _)               => F.numberNode(s.toDouble)
      case _                           => F.textNode(s)
    }
  }

  /** Split a flow body on top-level commas (quote- and bracket-aware). */
  private def splitFlow(body: String): Seq[String] = {
    val parts = collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    body.foreach { c =>
      if (quote != 0) { if (c == quote) quote = 0; cur.append(c) }
      else c match {
        case '\'' | '"'        => quote = c; cur.append(c)
        case '[' | '{'         => depth += 1; cur.append(c)
        case ']' | '}'         => depth -= 1; cur.append(c)
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case _                 => cur.append(c)
      }
    }
    if (cur.toString.trim.nonEmpty) parts += cur.toString
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def flowSeq(s: String, anchors: Anchors): ArrayNode = {
    require(s.last == ']', s"unterminated flow sequence: $s")
    val arr = F.arrayNode()
    splitFlow(s.substring(1, s.length - 1))
      .foreach(p => arr.add(scalarOrFlow(p, anchors)))
    arr
  }

  private def flowMap(s: String, anchors: Anchors): ObjectNode = {
    require(s.last == '}', s"unterminated flow mapping: $s")
    val obj = F.objectNode()
    splitFlow(s.substring(1, s.length - 1)).foreach { p =>
      val ci = keyColon(p)
      require(ci > 0, s"bad flow mapping entry: $p")
      obj.set[JsonNode](unquote(p.substring(0, ci).trim),
        scalarOrFlow(p.substring(ci + 1).trim, anchors))
    }
    obj
  }
}
