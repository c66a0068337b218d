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

  // ------------------------------------------------------------------
  // emitter (the write-back half of `sed/core/config.py:175` save_config
  // — fitted calibrations persist to sed_config.yaml)
  // ------------------------------------------------------------------

  /** Serialize a Jackson tree as block-style YAML readable by [[parse]]
    * (and by PyYAML): nested block mappings, scalar/nested sequences as
    * flow lists (`[1, 2]`, `[[a], [b]]`), strings quoted only when a
    * bare scalar would re-parse as something else. Guaranteed
    * round-trip-or-throw: `parse(emit(n)) == n` for any tree in the
    * supported subset (ints, doubles, booleans, nulls, strings, arrays,
    * objects) — a string scalar containing a line break (which the
    * line-oriented [[parse]] could not re-read) fails the emit loudly
    * instead of silently corrupting the file.
    */
  def emit(node: JsonNode): String = {
    val sb = new StringBuilder
    if (node.isObject && node.size() > 0) emitMap(node, 0, sb)
    else sb.append(emitInline(node)).append('\n')
    sb.toString
  }

  private def emitMap(obj: JsonNode, indent: Int, sb: StringBuilder): Unit = {
    val pad = " " * indent
    obj.properties().forEach { e =>
      val k = quoteIfNeeded(e.getKey)
      val v = e.getValue
      if (v.isObject && v.size() > 0) {
        sb.append(pad).append(k).append(":\n")
        emitMap(v, indent + 2, sb)
      } else if (v.isArray && v.size() > 0 && !isFlowable(v)) {
        sb.append(pad).append(k).append(":\n")
        // [[parse]] requires sequence items deeper than their key
        emitBlockSeq(v, indent + 2, sb)
      } else {
        sb.append(pad).append(k).append(": ").append(emitInline(v)).append('\n')
      }
    }
  }

  private def emitBlockSeq(arr: JsonNode, indent: Int, sb: StringBuilder): Unit = {
    val pad = " " * indent
    arr.forEach { v =>
      if (v.isObject && v.size() > 0) {
        sb.append(pad).append("-\n")
        emitMap(v, indent + 2, sb)
      } else sb.append(pad).append("- ").append(emitInline(v)).append('\n')
    }
  }

  /** Arrays of scalars / nested scalar arrays render as flow lists. */
  private def isFlowable(n: JsonNode): Boolean =
    !n.isObject && (!n.isArray || {
      var ok = true
      n.forEach(c => ok &&= isFlowable(c))
      ok
    })

  private def emitInline(n: JsonNode): String =
    if (n.isNull || n.isMissingNode) "null"
    else if (n.isBoolean) String.valueOf(n.booleanValue())
    else if (n.isIntegralNumber) n.numberValue().toString
    else if (n.isNumber) {
      val d = n.doubleValue()
      if (d.isNaN) ".nan"
      else if (d.isInfinite) { if (d > 0) ".inf" else "-.inf" }
      else {
        val s = d.toString
        if (s.contains('.') || s.contains('e') || s.contains('E')) s
        else s + ".0" // keep floatness through the re-parse
      }
    }
    else if (n.isTextual) quoteIfNeeded(n.textValue())
    else if (n.isArray) {
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      n.forEach(c => parts += emitInline(c))
      parts.mkString("[", ", ", "]")
    }
    else if (n.isObject && n.size() == 0) "{}"
    else { // inline object (only reached for flow contexts)
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      n.properties().forEach(e =>
        parts += s"${quoteIfNeeded(e.getKey)}: ${emitInline(e.getValue)}")
      parts.mkString("{", ", ", "}")
    }

  /** YAML-1.1 boolean-like words: the shim's own [[scalar]] reads them as
    * strings, but PyYAML `safe_load` turns a bare `yes`/`off` into a bool —
    * quote them so the emitted file means the same thing to both readers.
    */
  private val Yaml11Bools = Set(
    "yes", "Yes", "YES", "no", "No", "NO",
    "on", "On", "ON", "off", "Off", "OFF")

  /** Single-quote a string whose bare form would re-parse as a number /
    * bool / null / flow collection, or that contains YAML structure
    * characters. A string containing a line break is REJECTED: the shim's
    * line-oriented parser cannot re-read a multi-line quoted scalar, so
    * emitting one would silently break the `parse(emit(n)) == n`
    * guarantee that calibration persistence relies on — failing the write
    * beats corrupting a saved calibration.
    */
  private def quoteIfNeeded(s: String): String = {
    if (s.exists(c => c == '\n' || c == '\r'))
      throw new IllegalArgumentException(
        "YamlShim.emit: string scalars must not contain line breaks " +
          s"(got ${s.length} chars with a \\n/\\r); flatten the value or " +
          "store it as a list of lines")
    val needsQuote = s.isEmpty ||
      s != s.trim ||
      "[{&*#'\"%@`!|>".contains(s.head) || s.head == '-' ||
      s.contains(": ") || s.endsWith(":") || s.contains(" #") ||
      Yaml11Bools.contains(s) ||
      s == "<<" || // a literal "<<" key/value must not become a merge tag
      // flow-list safety: quotes/commas/brackets confuse splitFlow
      s.exists(c => "'\",[]{}".indexOf(c.toInt) >= 0) ||
      (scalar(s) match { case t if t.isTextual && t.textValue() == s => false
                         case _ => true })
    if (needsQuote) "'" + s.replace("'", "''") + "'" else s
  }

  def parse(text: String): JsonNode = {
    val lines = text.linesIterator.toIndexedSeq
      .map(stripComment)
      .zipWithIndex
      .filter { case (l, _) => l.trim.nonEmpty }
      .map { case (l, i) => Line(indentOf(l), l.trim, i) }
    if (lines.isEmpty) F.objectNode()
    else {
      val (node, next) = parseBlock(lines, 0, lines.head.indent,
        collection.mutable.Map.empty[String, JsonNode])
      // a dedent to an INTERMEDIATE indent ends every open block without
      // consuming the line — dropping it silently would vanish config
      // keys with no diagnostic (PyYAML errors here too)
      require(next >= lines.length,
        s"YAML parse stopped at line ${lines(next).num + 1} " +
          s"('${lines(next).text}'): misindented block?")
      node
    }
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
      val rawKey = l.text.substring(0, ci).trim
      val key = unquote(rawKey)
      // merge applies to the BARE tag only: a quoted '<<' is a literal
      // key (PyYAML semantics — and what [[emit]] writes for one)
      val isMerge = rawKey == "<<"
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
      if (isMerge) value match {
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
    if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1).replace("''", "'") // YAML '' escape
    else if (s.length >= 2 && s.head == '"' && s.last == '"')
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
      // YAML 1.1/1.2 non-finite floats — [[emit]] writes these forms;
      // without the cases they'd round-trip as STRINGS whose asDouble()
      // is silently 0.0
      case ".nan" | ".NaN" | ".NAN"    => F.numberNode(Double.NaN)
      case ".inf" | "+.inf" | ".Inf" | "+.Inf" =>
        F.numberNode(Double.PositiveInfinity)
      case "-.inf" | "-.Inf"           => F.numberNode(Double.NegativeInfinity)
      case IntRe()                     =>
        // canonicalize to IntNode when in range (Jackson node equality
        // is class-sensitive: IntNode(1) != LongNode(1), and the JSON
        // reader produces IntNode — round-trips must agree). Digits past
        // Long.MaxValue keep the documented degrade-to-string contract
        // instead of NumberFormatException-ing the whole layered load.
        try {
          val l = s.toLong
          if (l >= Int.MinValue && l <= Int.MaxValue) F.numberNode(l.toInt)
          else F.numberNode(l)
        } catch { case _: NumberFormatException => F.textNode(s) }
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
