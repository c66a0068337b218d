package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → training-text extraction: the first stage of every web-corpus
  * pipeline (CommonCrawl-style HTML in, plain text out). Dependency-free
  * single-pass tokenizer; all three surfaces (`plain_text`, `title`,
  * `links`) are native codegen expressions, so extraction is a map-only
  * projection that fuses into the parquet scan — no UDF, no shuffle, the
  * only plan shape that survives a 100 TB crawl.
  *
  * Extraction semantics (deliberately small and exactly specified, so the
  * driver gate can oracle it arithmetically):
  *
  *  - tags are parsed with quote-aware attribute scanning (`>` inside a
  *    quoted attribute value does not close the tag);
  *  - `<!-- … -->` comments and `<!doctype>`/`<?…?>` directives drop;
  *  - raw-text elements `script`, `style`, `title`, `noscript`,
  *    `template` drop their entire content (scan to the matching
  *    case-insensitive `</name`), so embedded markup inside scripts
  *    cannot leak into the text;
  *  - block-level tags (`p`, `div`, `h1`–`h6`, `li`, `br`, `tr`, … — see
  *    [[Html.BlockTags]]) emit a line break; inline tags (`a`, `b`,
  *    `span`, …) emit nothing, so `ab<b>cd</b>` stays `abcd`;
  *  - character references decode: the XML named five plus `&nbsp;`
  *    (→ regular space) and decimal/hex numeric forms; malformed
  *    references stay literal;
  *  - whitespace normalizes per line: runs collapse to one space, lines
  *    trim, empty lines drop, lines join with `\n`.
  */
object Html {

  /** Tags that start/end a visual block — each boundary becomes one line
    * break in the extracted text.
    */
  val BlockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "br", "caption", "center",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li",
    "main", "nav", "ol", "option", "p", "pre", "section", "select",
    "table", "tbody", "td", "tfoot", "th", "thead", "tr", "ul")

  /** Elements whose raw content is dropped wholesale. `title` is dropped
    * from the text flow (it is metadata, surfaced via [[title]]).
    */
  val RawTextTags: Set[String] = Set(
    "script", "style", "title", "noscript", "template")

  private def wrap(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.resolvedExpression(c)

  /** Plain text extracted from an HTML document (see object doc for the
    * exact semantics). Null-safe; map-only codegen.
    */
  def extractText(html: Column): Column = wrap(HtmlTextExpr(ex(html)))

  /** Content of the first `<title>` element, whitespace-collapsed and
    * entity-decoded; NULL when the document has no title.
    */
  def title(html: Column): Column = wrap(HtmlTitleExpr(ex(html)))

  /** `href` attribute values of `<a>` tags, in document order,
    * entity-decoded, empty hrefs dropped. Feed to [[UrlOps]] for
    * canonicalization / blocklisting.
    */
  def links(html: Column): Column = wrap(HtmlLinksExpr(ex(html)))

  /** One-call projection: `plain_text`, `html_title`, `n_links` columns
    * derived from `htmlCol`. Pure map-side expressions.
    */
  def htmlColumns(df: DataFrame, htmlCol: String): DataFrame =
    df.withColumns(Map(
      "plain_text" -> extractText(col(htmlCol)),
      "html_title" -> title(col(htmlCol)),
      "n_links" -> size(links(col(htmlCol))).cast("long"),
    ))

  // ------------------------------------------------------------------
  // tokenizer core (shared by the three expressions)
  // ------------------------------------------------------------------

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == ':'

  /** Decode one character reference starting at `i` (s(i) == '&').
    * Returns (decoded-string-or-null, next-index). Null means "not a
    * reference — emit the `&` literally and advance by one".
    */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = {
      var j = i + 1
      val lim = math.min(s.length, i + 12) // longest supported: &#x10FFFF;
      while (j < lim && s.charAt(j) != ';') j += 1
      if (j < s.length && j < lim && s.charAt(j) == ';') j else -1
    }
    if (semi < 0) return (null, i + 1)
    val body = s.substring(i + 1, semi)
    val decoded: String = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case _ if body.length >= 2 && body.charAt(0) == '#' =>
        try {
          val cp =
            if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
              Integer.parseInt(body.substring(2), 16)
            else Integer.parseInt(body.substring(1), 10)
          if (cp >= 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
            new String(Character.toChars(cp))
          else null
        } catch { case _: NumberFormatException => null }
      case _ => null
    }
    if (decoded == null) (null, i + 1) else (decoded, semi + 1)
  }

  /** Scan a tag starting at `i` (s(i) == '<', s(i+1) is '/', '!', '?' or a
    * name char). Returns (tagNameLowercase or "" for directives,
    * isClosing, indexAfterTag). Attribute values in quotes may contain
    * `>` without closing the tag. An unterminated tag swallows the rest
    * of the input.
    */
  private def scanTag(s: String, i: Int): (String, Boolean, Int) = {
    val n = s.length
    var j = i + 1
    val closing = j < n && s.charAt(j) == '/'
    if (closing) j += 1
    val nameStart = j
    while (j < n && isNameChar(s.charAt(j))) j += 1
    val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
    // scan to the closing '>' honoring quoted attribute values
    var quote: Char = 0
    while (j < n) {
      val c = s.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return (name, closing, j + 1)
      j += 1
    }
    (name, closing, n)
  }

  /** Index just past the raw-text element `name` opened before `from`:
    * finds the case-insensitive `</name` and skips to its `>`; if the
    * close tag never appears, the element swallows the rest (browser
    * behavior). Returns (contentEnd, indexAfterCloseTag).
    */
  private def rawTextEnd(s: String, from: Int, name: String): (Int, Int) = {
    val n = s.length
    val probe = "</" + name
    var j = from
    while (j + probe.length <= n) {
      if (s.regionMatches(true, j, probe, 0, probe.length)) {
        val after = j + probe.length
        // must be followed by ws, '>' or '/' to count as the close tag
        if (after >= n || s.charAt(after) == '>' || isWs(s.charAt(after)) ||
          s.charAt(after) == '/') {
          var k = after
          while (k < n && s.charAt(k) != '>') k += 1
          return (j, math.min(k + 1, n))
        }
      }
      j += 1
    }
    (n, n)
  }

  /** Whitespace-collapse + trim (single line; used for title). */
  private def collapse(raw: String): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    var pendingSpace = false
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (isWs(c)) pendingSpace = true
      else {
        if (pendingSpace && sb.length() > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Core tokenizer. Emits decoded text characters into `onText`, block
    * boundaries into `onBlock`, (tagName, attrString) for every open
    * tag into `onOpenTag` (attrString = raw slice between name and `>`),
    * dropped raw-text element content into `onRawText`, and close-tag
    * names into `onCloseTag`.
    */
  private def walk(
      s: String,
      onText: String => Unit,
      onBlock: () => Unit,
      onOpenTag: (String, String) => Unit,
      onRawText: (String, String) => Unit,
      onCloseTag: String => Unit = _ => (),
  ): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(false, i, "<!--", 0, 4)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (s.charAt(i + 1) == '/' || s.charAt(i + 1) == '!' ||
          s.charAt(i + 1) == '?' || isNameChar(s.charAt(i + 1)))) {
          val start = i
          val (name, closing, after) = scanTag(s, i)
          i = after
          if (!closing && RawTextTags.contains(name)) {
            // self-closing raw-text tag (<script/>) has no content
            val selfClosed = after >= 2 && after <= n &&
              s.charAt(after - 1) == '>' && after - 2 >= start &&
              s.charAt(after - 2) == '/'
            if (!selfClosed) {
              val (contentEnd, next) = rawTextEnd(s, after, name)
              onRawText(name, s.substring(after, contentEnd))
              i = next
            } else onRawText(name, "")
          } else if (!closing && name.nonEmpty) {
            // raw attribute slice: past the name up to (excl.) the '>'
            val attrFrom = {
              var k = start + 1
              if (k < n && s.charAt(k) == '/') k += 1
              while (k < after && isNameChar(s.charAt(k))) k += 1
              k
            }
            val attrTo = if (after > start && after <= n &&
              s.charAt(after - 1) == '>') after - 1 else after
            onOpenTag(name, s.substring(math.min(attrFrom, attrTo), attrTo))
          } else if (closing && name.nonEmpty) onCloseTag(name)
          if (BlockTags.contains(name)) onBlock()
        } else { onText("<"); i += 1 }
      } else if (c == '&') {
        val (dec, next) = decodeEntity(s, i)
        onText(if (dec == null) "&" else dec)
        i = next
      } else {
        // batch the plain run up to the next special char
        var j = i
        while (j < n && s.charAt(j) != '<' && s.charAt(j) != '&') j += 1
        onText(s.substring(i, j))
        i = j
      }
    }
  }

  /** Plain-text extraction (see object doc). */
  def computeText(html: String): String = {
    val out = new java.lang.StringBuilder(html.length / 2 + 8)
    var pendingNewline = false
    var pendingSpace = false
    def emit(t: String): Unit = {
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        if (isWs(c)) pendingSpace = true
        else {
          if (out.length() > 0) {
            if (pendingNewline) out.append('\n')
            else if (pendingSpace) out.append(' ')
          }
          pendingNewline = false
          pendingSpace = false
          out.append(c)
        }
        i += 1
      }
    }
    walk(html, emit, () => pendingNewline = true, (_, _) => (), (_, _) => ())
    out.toString
  }

  /** First `<title>` content, collapsed; null when absent. */
  def computeTitle(html: String): String = {
    var found: String = null
    walk(html, _ => (), () => (), (_, _) => (),
      (name, content) => if (name == "title" && found == null)
        found = collapse(decodeAll(content)))
    found
  }

  /** `href` values of `<a>` tags in document order (entity-decoded,
    * empties dropped).
    */
  def computeLinks(html: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    walk(html, _ => (), () => (),
      (name, attrs) => if (name == "a") {
        val href = attrValue(attrs, "href")
        if (href != null && href.nonEmpty) out += href
      },
      (_, _) => ())
    out.toArray
  }

  /** Text contents of every `<tag>` element, in document order — the
    * generic XML-ish field extractor that covers sitemap `<loc>`, RSS
    * `<link>`/`<title>`, Atom `<id>`, … Entity-decoded and
    * whitespace-collapsed; nested same-name elements concatenate into
    * the outer capture (malformed for these formats, so not worth a
    * stack). Empty captures are kept (an empty `<loc></loc>` is a real,
    * if broken, entry).
    */
  def computeTagTexts(html: String, tag: String): Array[String] = {
    val want = tag.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cap = new java.lang.StringBuilder()
    walk(
      html,
      t => if (depth > 0) cap.append(t),
      () => (),
      (name, _) => if (name == want) { if (depth == 0) cap.setLength(0); depth += 1 },
      // raw-text elements (title, script, …) bypass the open/close
      // callbacks — capture them here so e.g. RSS <title> still extracts
      (name, content) => if (name == want) out += collapse(decodeAll(content)),
      name => if (name == want && depth > 0) {
        depth -= 1
        if (depth == 0) out += collapse(cap.toString)
      },
    )
    out.toArray
  }

  /** Decode every character reference in a raw slice. */
  private def decodeAll(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') {
        val (dec, next) = decodeEntity(s, i)
        sb.append(if (dec == null) "&" else dec)
        i = next
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Array of the text contents of `tag` elements (see
    * [[computeTagTexts]]); map-only codegen.
    */
  def tagTexts(html: Column, tag: String): Column =
    wrap(HtmlTagTextsExpr(ex(html), tag))

  /** HTML → Markdown conversion (structure-preserving extraction —
    * headings, emphasis, links, list items survive as Markdown syntax
    * while everything else follows [[computeText]] semantics):
    *
    *  - `h1`–`h6` → `#`…`######` prefixes; `li` → `- ` (ordered lists
    *    also render dashed — documented simplification);
    *  - `b`/`strong` → `**`, `i`/`em` → `*`, `code` → `` ` `` (markers
    *    hug whatever whitespace the source had — collapse happens at the
    *    text layer, markers are emitted as ordinary characters);
    *  - `a href` → `[text](url)`; `img` → `![alt](src)`;
    *  - stray close tags without a matching open emit nothing; an open
    *    emphasis left unclosed at EOF stays unclosed (no auto-repair);
    *  - block breaks, raw-text drops, entity decode and whitespace
    *    collapse are identical to [[computeText]].
    */
  def computeMarkdown(html: String): String = {
    val out = new java.lang.StringBuilder(html.length / 2 + 8)
    var pendingNewline = false
    var pendingSpace = false
    def emitChars(t: String): Unit = {
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        if (isWs(c)) pendingSpace = true
        else {
          if (out.length() > 0) {
            if (pendingNewline) out.append('\n')
            else if (pendingSpace) out.append(' ')
          }
          pendingNewline = false
          pendingSpace = false
          out.append(c)
        }
        i += 1
      }
    }
    // markers ride the same whitespace machinery as text (flush a pending
    // break, then append verbatim — a trailing marker space only emits if
    // real text follows)
    def marker(m: String): Unit = emitChars(m)
    val hrefs = scala.collection.mutable.Stack.empty[String]
    var bold = 0
    var ital = 0
    var codeSpan = 0
    // the tokenizer fires onBlock right AFTER onOpenTag for block tags;
    // a heading/li handler emits its own line break before the marker,
    // so that one following onBlock must not re-break the line
    var suppressNextBlock = false
    walk(
      html,
      emitChars,
      () => {
        if (suppressNextBlock) suppressNextBlock = false
        else pendingNewline = true
      },
      (name, attrs) => name match {
        case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
          pendingNewline = true
          marker("#" * (name.charAt(1) - '0'))
          pendingSpace = true
          suppressNextBlock = true
        case "li" =>
          pendingNewline = true
          marker("-")
          pendingSpace = true
          suppressNextBlock = true
        case "b" | "strong" => marker("**"); bold += 1
        case "i" | "em" => marker("*"); ital += 1
        case "code" => marker("`"); codeSpan += 1
        case "a" =>
          hrefs.push(Option(attrValue(attrs, "href")).getOrElse(""))
          marker("[")
        case "img" =>
          val alt = Option(attrValue(attrs, "alt")).getOrElse("")
          val src = Option(attrValue(attrs, "src")).getOrElse("")
          marker(s"![$alt]($src)")
        case _ => ()
      },
      (_, _) => (),
      onCloseTag = {
        case "b" | "strong" if bold > 0 => marker("**"); bold -= 1
        case "i" | "em" if ital > 0 => marker("*"); ital -= 1
        case "code" if codeSpan > 0 => marker("`"); codeSpan -= 1
        case "a" if hrefs.nonEmpty => marker("](" + hrefs.pop() + ")")
        case _ => ()
      },
    )
    out.toString
  }

  /** Markdown view of an HTML document (see [[computeMarkdown]]). */
  def toMarkdown(html: Column): Column = wrap(HtmlMarkdownExpr(ex(html)))

  /** Value of attribute `key` inside a raw attribute slice; handles
    * quoted and unquoted forms; null when absent. Entity references in
    * the value decode (href="a&amp;b").
    */
  private def attrValue(attrs: String, key: String): String = {
    val n = attrs.length
    var i = 0
    while (i < n) {
      // skip ws
      while (i < n && isWs(attrs.charAt(i))) i += 1
      if (i >= n) return null
      // read attr name
      val nameStart = i
      while (i < n && !isWs(attrs.charAt(i)) && attrs.charAt(i) != '=' &&
        attrs.charAt(i) != '/') i += 1
      val name = attrs.substring(nameStart, i).toLowerCase(java.util.Locale.ROOT)
      if (i >= n || nameStart == i) { i += 1 }
      else {
        while (i < n && isWs(attrs.charAt(i))) i += 1
        var value: String = null
        if (i < n && attrs.charAt(i) == '=') {
          i += 1
          while (i < n && isWs(attrs.charAt(i))) i += 1
          if (i < n) {
            val q = attrs.charAt(i)
            if (q == '"' || q == '\'') {
              val vStart = i + 1
              var j = vStart
              while (j < n && attrs.charAt(j) != q) j += 1
              value = attrs.substring(vStart, j)
              i = math.min(j + 1, n)
            } else {
              val vStart = i
              while (i < n && !isWs(attrs.charAt(i))) i += 1
              value = attrs.substring(vStart, i)
            }
          } else value = ""
        }
        if (name == key) {
          if (value == null) return null
          // decode entities in the value
          val sb = new java.lang.StringBuilder(value.length)
          var k = 0
          while (k < value.length) {
            if (value.charAt(k) == '&') {
              val (dec, next) = decodeEntity(value, k)
              sb.append(if (dec == null) "&" else dec)
              k = next
            } else { sb.append(value.charAt(k)); k += 1 }
          }
          return sb.toString
        }
      }
    }
    null
  }
}

/** Codegen kernel: HTML → normalized plain text (see [[Html]]). */
case class HtmlTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs a string input, got $other")
    }

  override def nullSafeEval(t: Any): Any =
    UTF8String.fromString(Html.computeText(t.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Html.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$helper.computeText($t.toString()));")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlTextExpr =
    copy(child = newChild)
}

/** Codegen kernel: HTML → Markdown (see [[Html.computeMarkdown]]). */
case class HtmlMarkdownExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs a string input, got $other")
    }

  override def nullSafeEval(t: Any): Any =
    UTF8String.fromString(
      Html.computeMarkdown(t.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Html.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$helper.computeMarkdown($t.toString()));")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlMarkdownExpr =
    copy(child = newChild)
}

/** Codegen kernel: first `<title>` content; null when absent. */
case class HtmlTitleExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs a string input, got $other")
    }

  override def nullSafeEval(t: Any): Any = {
    val r = Html.computeTitle(t.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Html.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val tmp = ctx.freshName("graftTitle")
    nullSafeCodeGen(ctx, ev, t => s"""
      String $tmp = $helper.computeTitle($t.toString());
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($tmp); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlTitleExpr =
    copy(child = newChild)
}

/** Codegen kernel: text contents of the named element
  * (see [[Html.computeTagTexts]]); `tag` is fixed at plan time.
  */
case class HtmlTagTextsExpr(child: Expression, tag: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs a string input, got $other")
    }

  override def nullSafeEval(t: Any): Any = {
    val vals = Html.computeTagTexts(t.asInstanceOf[UTF8String].toString, tag)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      vals.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Html.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val tagRef = ctx.addReferenceObj("graftTag", tag, "java.lang.String")
    val vals = ctx.freshName("graftVals")
    val arr = ctx.freshName("graftArr")
    val idx = ctx.freshName("graftI")
    nullSafeCodeGen(ctx, ev, t => s"""
      String[] $vals = $helper.computeTagTexts($t.toString(), $tagRef);
      Object[] $arr = new Object[$vals.length];
      for (int $idx = 0; $idx < $vals.length; $idx++) {
        $arr[$idx] =
          org.apache.spark.unsafe.types.UTF8String.fromString($vals[$idx]);
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlTagTextsExpr =
    copy(child = newChild)
}

/** Codegen kernel: `<a href>` values in document order. */
case class HtmlLinksExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs a string input, got $other")
    }

  override def nullSafeEval(t: Any): Any = {
    val links = Html.computeLinks(t.asInstanceOf[UTF8String].toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      links.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Html.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val links = ctx.freshName("graftLinks")
    val arr = ctx.freshName("graftArr")
    val idx = ctx.freshName("graftI")
    nullSafeCodeGen(ctx, ev, t => s"""
      String[] $links = $helper.computeLinks($t.toString());
      Object[] $arr = new Object[$links.length];
      for (int $idx = 0; $idx < $links.length; $idx++) {
        $arr[$idx] =
          org.apache.spark.unsafe.types.UTF8String.fromString($links[$idx]);
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlLinksExpr =
    copy(child = newChild)
}
