package graft

import graft.binning.{BinAxis, EdgesAxis, UniformAxis}

/** Renders the engine's bin-index semantics as ANSI/DuckDB SQL so each
  * `SparkEntry.queries` entry and its `oracleSql` twin derive from the same
  * axis object — the off-by-half / edge-inclusivity conventions
  * (SURVEY.md §7.4 risk 1) are encoded once.
  */
object OracleSql {

  /** Round-trippable SQL literal for a Double. */
  def d(v: Double): String = {
    val s = java.lang.Double.toString(v)
    if (v < 0) s"($s)" else s
  }

  /** SQL for the *rounded* scaled position `j` on a uniform axis
    * (pre-clamp); mirrors [[graft.binning.Binning.uniformBinIndex]].
    */
  def uniformJ(colSql: String, ax: UniformAxis): String =
    s"ROUND(($colSql - ${d(ax.edgeLo)}) * ${d(ax.delta)}, 11)"

  /** WHERE predicate keeping in-range events for a uniform axis. */
  def uniformKeep(jSql: String, ax: UniformAxis): String =
    s"$jSql >= 0 AND $jSql <= ${ax.nBins}"

  /** Final clamped BIGINT bin index from a `j` expression. */
  def uniformIdx(jSql: String, ax: UniformAxis): String =
    s"CAST(LEAST(FLOOR($jSql), ${ax.nBins - 1}) AS BIGINT)"

  /** CASE-chain bin index for explicit edges; mirrors
    * [[graft.binning.Binning.edgesBinIndex]] (last edge inclusive, out of
    * range → NULL).
    */
  def edgesIdx(colSql: String, ax: EdgesAxis): String = {
    val e = ax.edges
    val n = e.length - 1
    val branches = (0 until n).map { k =>
      s"WHEN $colSql < ${d(e(k + 1))} THEN CAST($k AS BIGINT)"
    }
    s"""CASE WHEN $colSql = ${d(e(n))} THEN CAST(${n - 1} AS BIGINT)
       |WHEN $colSql < ${d(e(0))} OR $colSql > ${d(e(n))} THEN NULL
       |${branches.mkString(" ")}
       |END""".stripMargin.replace("\n", " ")
  }

  /** Full sparse-histogram oracle for a set of axes over `table`:
    * `SELECT bin_<c0>…, count(*) AS cnt GROUP BY all bins`, dropping
    * out-of-range events exactly as the kernel does.
    */
  def histogramSql(table: String, axes: Seq[BinAxis], extraWhere: Option[String] = None): String = {
    val js = axes.zipWithIndex.map {
      case (u: UniformAxis, i) => Some(s"j$i" -> uniformJ(u.column, u))
      case _                   => None
    }
    val jSelect = js.flatten.map { case (nm, sql) => s"$sql AS $nm" }
    val idxSelect = axes.zipWithIndex.map {
      case (u: UniformAxis, i) => s"${uniformIdx(s"j$i", u)} AS bin_${u.column}"
      case (e: EdgesAxis, _)   => s"${edgesIdx(e.column, e)} AS bin_${e.column}"
    }
    val keep = axes.zipWithIndex.map {
      case (u: UniformAxis, i) => uniformKeep(s"j$i", u)
      case (e: EdgesAxis, _)   => s"${edgesIdx(e.column, e)} IS NOT NULL"
    }
    val binNames = axes.map(ax => s"bin_${ax.column}")
    val passthrough = axes.collect { case e: EdgesAxis => e.column }
    val innerCols = (passthrough ++ jSelect).distinct
    val inner =
      if (jSelect.isEmpty) table
      else s"(SELECT *, ${jSelect.mkString(", ")} FROM $table${extraWhere.map(w => s" WHERE $w").getOrElse("")})"
    val outerWhere = keep.mkString(" AND ")
    s"""SELECT ${binNames.mkString(", ")}, count(*) AS cnt FROM (
       |  SELECT ${idxSelect.mkString(", ")} FROM $inner WHERE $outerWhere
       |) GROUP BY ${binNames.mkString(", ")}""".stripMargin.replace("\n", " ")
  }
}
