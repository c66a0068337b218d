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
  *
  * Not YAML-complete by design (no anchors/aliases, tags, multi-line
  * block scalars, or multi-document streams — none appear in sed
  * configs); unsupported syntax falls back to a string scalar rather
  * than failing, which matches how the configs are consumed (typed
  * accessors in [[SedConfig]] coerce on read).
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
    else parseBlock(lines, 0, lines.head.indent)._1
  }

  private final case class Line(indent: Int, text: String, num: Int)

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
  private def parseBlock(lines: IndexedSeq[Line], start: Int, indent: Int): (JsonNode, Int) = {
    if (lines(start).text.startsWith("- ") || lines(start).text == "-")
      parseSeq(lines, start, indent)
    else parseMap(lines, start, indent)
  }

  private def parseSeq(lines: IndexedSeq[Line], start: Int, indent: Int): (JsonNode, Int) = {
    val arr = F.arrayNode()
    var i = start
    while (i < lines.length && lines(i).indent == indent && (
      lines(i).text.startsWith("- ") || lines(i).text == "-")) {
      val item = lines(i).text.drop(1).trim
      if (item.isEmpty) {
        val (child, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
        arr.add(child); i = next
      } else {
        arr.add(scalarOrFlow(item)); i += 1
      }
    }
    (arr, i)
  }

  private def parseMap(lines: IndexedSeq[Line], start: Int, indent: Int): (JsonNode, Int) = {
    val obj = F.objectNode()
    var i = start
    while (i < lines.length && lines(i).indent == indent && !lines(i).text.startsWith("- ")) {
      val l = lines(i)
      val ci = keyColon(l.text)
      require(ci > 0, s"YAML line ${l.num + 1}: expected 'key: value', got '${l.text}'")
      val key = unquote(l.text.substring(0, ci).trim)
      val rest = l.text.substring(ci + 1).trim
      if (rest.nonEmpty) {
        obj.set[JsonNode](key, scalarOrFlow(rest))
        i += 1
      } else if (i + 1 < lines.length && lines(i + 1).indent > indent) {
        val (child, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
        obj.set[JsonNode](key, child)
        i = next
      } else {
        obj.set[JsonNode](key, F.nullNode()) // `key:` with no value
        i += 1
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

  private def scalarOrFlow(s: String): JsonNode = s.head match {
    case '[' => flowSeq(s)
    case '{' => flowMap(s)
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

  private def flowSeq(s: String): ArrayNode = {
    require(s.last == ']', s"unterminated flow sequence: $s")
    val arr = F.arrayNode()
    splitFlow(s.substring(1, s.length - 1)).foreach(p => arr.add(scalarOrFlow(p)))
    arr
  }

  private def flowMap(s: String): ObjectNode = {
    require(s.last == '}', s"unterminated flow mapping: $s")
    val obj = F.objectNode()
    splitFlow(s.substring(1, s.length - 1)).foreach { p =>
      val ci = keyColon(p)
      require(ci > 0, s"bad flow mapping entry: $p")
      obj.set[JsonNode](unquote(p.substring(0, ci).trim),
        scalarOrFlow(p.substring(ci + 1).trim))
    }
    obj
  }
}
