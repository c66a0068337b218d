package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemming (Porter 1980, "An algorithm for suffix stripping") —
  * the classic IR token normalizer (`caresses`→`caress`,
  * `relational`→`relat`, `dependent`→`depend`), used ahead of
  * TF-IDF/BM25 indexing and vocabulary analysis so inflected forms
  * collapse. Faithful implementation of the five published steps over
  * lowercase ASCII words; tokens with non-alphabetic characters pass
  * through unchanged (URLs, numbers, code identifiers should not be
  * stemmed). Map-only codegen kernel.
  */
case class PorterStemExpr(child: Expression) extends UnaryExpression {

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
    UTF8String.fromString(PorterStemExpr.stem(t.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = PorterStemExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$helper.stem($t.toString()));")
  }

  override protected def withNewChildInternal(newChild: Expression): PorterStemExpr =
    copy(child = newChild)
}

object PorterStemExpr {

  /** Stem one word (lowercased internally; non-alphabetic input passes
    * through). Words of length ≤ 2 are returned unchanged per the paper.
    */
  def stem(raw: String): String = {
    if (raw.isEmpty || !raw.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) return raw
    val w = raw.toLowerCase(java.util.Locale.ROOT)
    if (w.length <= 2) return w
    var b = w
    b = step1a(b)
    b = step1b(b)
    b = step1c(b)
    b = step2(b)
    b = step3(b)
    b = step4(b)
    b = step5(b)
    b
  }

  // a letter at position i is a consonant unless a/e/i/o/u, or y
  // preceded by a consonant
  private def isCons(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(s, i - 1)
    case _ => true
  }

  /** m = number of VC sequences in the stem. */
  private def measure(s: String): Int = {
    var m = 0
    var i = 0
    val n = s.length
    while (i < n && isCons(s, i)) i += 1 // leading C*
    while (i < n) {
      while (i < n && !isCons(s, i)) i += 1 // V+
      if (i < n) { m += 1; while (i < n && isCons(s, i)) i += 1 } // C+
      else return m
    }
    m
  }

  private def containsVowel(s: String): Boolean =
    s.indices.exists(i => !isCons(s, i))

  private def endsDoubleCons(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      isCons(s, s.length - 1)

  /** *o: stem ends cvc where the final c is not w/x/y. */
  private def endsCvc(s: String): Boolean = {
    val n = s.length
    n >= 3 && isCons(s, n - 3) && !isCons(s, n - 2) && isCons(s, n - 1) &&
      !"wxy".contains(s.charAt(n - 1))
  }

  private def stemOf(s: String, suffix: String): String =
    s.substring(0, s.length - suffix.length)

  /** Replace `suffix` by `rep` when the remaining stem has m > `minM`. */
  private def replace(s: String, suffix: String, rep: String, minM: Int): Option[String] =
    if (s.endsWith(suffix)) {
      val st = stemOf(s, suffix)
      if (measure(st) > minM) Some(st + rep) else Some(s)
    } else None

  private def step1a(s: String): String =
    if (s.endsWith("sses")) stemOf(s, "es")
    else if (s.endsWith("ies")) stemOf(s, "es")
    else if (s.endsWith("ss")) s
    else if (s.endsWith("s")) stemOf(s, "s")
    else s

  private def step1b(s: String): String = {
    if (s.endsWith("eed")) {
      if (measure(stemOf(s, "eed")) > 0) stemOf(s, "d") else s
    } else {
      val stripped =
        if (s.endsWith("ed") && containsVowel(stemOf(s, "ed")))
          Some(stemOf(s, "ed"))
        else if (s.endsWith("ing") && containsVowel(stemOf(s, "ing")))
          Some(stemOf(s, "ing"))
        else None
      stripped match {
        case None => s
        case Some(st) =>
          if (st.endsWith("at") || st.endsWith("bl") || st.endsWith("iz"))
            st + "e"
          else if (endsDoubleCons(st) &&
            !"lsz".contains(st.charAt(st.length - 1)))
            st.substring(0, st.length - 1)
          else if (measure(st) == 1 && endsCvc(st)) st + "e"
          else st
      }
    }
  }

  private def step1c(s: String): String =
    if (s.endsWith("y") && containsVowel(stemOf(s, "y")))
      stemOf(s, "y") + "i"
    else s

  private val Step2Rules = Seq(
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"))

  private def step2(s: String): String =
    Step2Rules.collectFirst {
      case (suf, rep) if s.endsWith(suf) => replace(s, suf, rep, 0).get
    }.getOrElse(s)

  private val Step3Rules = Seq(
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""))

  private def step3(s: String): String =
    Step3Rules.collectFirst {
      case (suf, rep) if s.endsWith(suf) => replace(s, suf, rep, 0).get
    }.getOrElse(s)

  private val Step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(s: String): String = {
    // "ion" strips only after s or t
    if (s.endsWith("ion")) {
      val st = stemOf(s, "ion")
      if (st.nonEmpty && (st.endsWith("s") || st.endsWith("t")) &&
        measure(st) > 1) return st
    }
    Step4Suffixes.collectFirst {
      case suf if s.endsWith(suf) && measure(stemOf(s, suf)) > 1 =>
        stemOf(s, suf)
      case suf if s.endsWith(suf) => s // matched but m too small: stop
    }.getOrElse(s)
  }

  private def step5(s: String): String = {
    // 5a: drop final e when m > 1, or m == 1 and not *o
    var b = s
    if (b.endsWith("e")) {
      val st = stemOf(b, "e")
      val m = measure(st)
      if (m > 1 || (m == 1 && !endsCvc(st))) b = st
    }
    // 5b: m > 1 and *d and *L -> single letter
    if (measure(b) > 1 && endsDoubleCons(b) && b.endsWith("l"))
      b = b.substring(0, b.length - 1)
    b
  }
}
