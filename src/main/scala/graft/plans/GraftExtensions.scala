package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.geom.{GeneralClipAreaMicro, HausdorffDistance, PointInRing,
  PolygonClipArea}

/** SparkSessionExtensions injector: registers graft's native expressions
  * into the session's function registry so plain SQL can call them:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT graft_hausdorff(a.pts, b.pts) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.hausdorffFunction)
    ext.injectFunction(GraftExtensions.pointInRingFunction)
    ext.injectFunction(GraftExtensions.clipAreaFunction)
    ext.injectFunction(GraftExtensions.generalClipAreaFunction)
  }
}

object GraftExtensions {
  val hausdorffFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hausdorff"),
    new ExpressionInfo(classOf[HausdorffDistance].getName, "graft_hausdorff"),
    (args: Seq[Expression]) => HausdorffDistance(args(0), args(1)))

  val pointInRingFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_point_in_ring"),
    new ExpressionInfo(classOf[PointInRing].getName, "graft_point_in_ring"),
    (args: Seq[Expression]) => PointInRing(args(0), args(1), args(2)))

  val clipAreaFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_clip_area"),
    new ExpressionInfo(classOf[PolygonClipArea].getName, "graft_clip_area"),
    (args: Seq[Expression]) => PolygonClipArea(args(0), args(1)))

  /** graft_general_clip_area_micro(subject, clip): signed-fan general
    * (concave x concave) intersection area in integer micro-units. */
  val generalClipAreaFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_general_clip_area_micro"),
    new ExpressionInfo(classOf[GeneralClipAreaMicro].getName,
      "graft_general_clip_area_micro"),
    (args: Seq[Expression]) => GeneralClipAreaMicro(args(0), args(1)))
}
