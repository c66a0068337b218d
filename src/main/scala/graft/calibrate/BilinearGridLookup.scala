package graft.calibrate

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the per-event bilinear lookup into a
  * broadcast deformation-field grid (T8, `sed/calibrator/momentum.py:
  * 2035-2071`) — the codegen upgrade over the v0 Scala UDF (SURVEY.md §4
  * item 2): no ScalaUDF boxing/closure dispatch, stays inside whole-stage
  * codegen, and the grid travels once per executor as a broadcast
  * (referenced from generated code via a lazily-unwrapped mutable slot,
  * not serialized into the plan).
  *
  * Semantics match `scipy.ndimage.map_coordinates(order=1,
  * mode="nearest")`: grid coordinates `r = (x − xOff)·xScale`,
  * `c = (y − yOff)·yScale`, edge-clamped 4-point interpolation.
  */
case class BilinearGridLookup(
    left: Expression, // x
    right: Expression, // y
    bcGrid: Broadcast[Array[Double]], // row-major rows × cols
    rows: Int,
    cols: Int,
    xOff: Double,
    xScale: Double,
    yOff: Double,
    yScale: Double,
) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("bilinear lookup needs double inputs")
  }

  @transient private lazy val grid: Array[Double] = bcGrid.value

  override def nullSafeEval(xAny: Any, yAny: Any): Any = {
    val x = xAny.asInstanceOf[Double]
    val y = yAny.asInstanceOf[Double]
    BilinearGridLookup.interp(grid, rows, cols,
      (x - xOff) * xScale, (y - yOff) * yScale)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // unwrap the broadcast once per task into a mutable slot
    val bcRef = ctx.addReferenceObj("bcGrid", bcGrid,
      classOf[Broadcast[Array[Double]]].getName)
    val gridVar = ctx.addMutableState("double[]", "grid",
      v => s"$v = (double[]) $bcRef.value();")
    val helper = BilinearGridLookup.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""${ev.value} = $helper.interp($gridVar, $rows, $cols,
         |  ($x - ${xOff}D) * ${xScale}D, ($y - ${yOff}D) * ${yScale}D);
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BilinearGridLookup =
    copy(left = newLeft, right = newRight)
}

object BilinearGridLookup {

  /** Edge-clamped 4-point bilinear interpolation on a row-major grid;
    * shared by interpreted eval and generated code.
    */
  def interp(grid: Array[Double], rows: Int, cols: Int, r: Double, c: Double): Double = {
    val rc = math.min(math.max(r, 0.0), rows - 1.0)
    val cc = math.min(math.max(c, 0.0), cols - 1.0)
    val r0 = math.min(rc.toInt, rows - 2)
    val c0 = math.min(cc.toInt, cols - 2)
    val fr = rc - r0
    val fc = cc - c0
    val base = r0 * cols + c0
    grid(base) * (1 - fr) * (1 - fc) +
      grid(base + cols) * fr * (1 - fc) +
      grid(base + 1) * (1 - fr) * fc +
      grid(base + cols + 1) * fr * fc
  }
}
