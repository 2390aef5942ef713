package graft.functions

import graft.etl.Geo
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd static entry point used by both interpreted and generated
  * code paths of [[GeohashEncode]]. Returns null for out-of-range
  * coordinates (the reference only derives a geohash for plausible
  * lat/lon pairs, load-s3.ts:186-193). */
object GeohashCodegen {
  def encode(lat: Double, lon: Double, precision: Int): UTF8String = {
    if (lat.isNaN || lon.isNaN || lat < -90 || lat > 90 ||
      lon < -180 || lon > 180 || precision <= 0 || precision > 12) null
    else UTF8String.fromString(Geo.encode(lat, lon, precision))
  }
}

/** Native Catalyst expression for geohash encoding (SURVEY.md §7.3
  * stretch goal): unlike the UDF in [[graft.etl.Geo]], this
  * participates in WholeStageCodegen — `doGenCode` emits a direct
  * static call with no boxing, no Scala closure dispatch, and no
  * codegen fence, so a scan→derive→write pipeline stays one fused
  * stage. Null semantics: any null input → null (TernaryExpression
  * null-intolerant default), out-of-range → null.
  */
case class GeohashEncode(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression {

  // inputs are cast to (double, double, int) at registration
  // (GraftFunctions.all) — AbstractDataType is private[sql], so
  // ExpectsInputTypes is not implementable outside the sql package
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_geohash"

  override def nullSafeEval(lat: Any, lon: Any, p: Any): Any =
    GeohashCodegen.encode(lat.asInstanceOf[Double],
      lon.asInstanceOf[Double], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la, lo, p) => {
      s"""
         |${ev.value} = graft.functions.GeohashCodegen.encode($la, $lo, $p);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
