package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Signed random projection (SRP — "SimHash for vectors") as a native
  * Catalyst expression: LSH band buckets for cosine similarity over an
  * embedding column.
  *
  * Each output element is one BAND: `bitsPerBand` sign bits, bit j set
  * iff `dot(r_j, v) > 0` for a deterministic pseudo-random Rademacher
  * (±1) hyperplane `r_j` derived from (seed, global bit index, dim) by
  * a splitmix64 finalizer — no stored hyperplane matrix, any worker
  * regenerates the same planes. Two vectors at angle θ agree per bit
  * with probability 1 − θ/π (Goemans–Williamson), so equal band values
  * mark likely-similar pairs and banding turns threshold similarity
  * search into an equi-join on (band, bucket) — the sub-quadratic
  * alternative to an all-pairs nested-loop join.
  */
object SrpCodegen {
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def bands(vec: ArrayData, bitsPerBand: Int, nBands: Int, seed: Long): ArrayData = {
    val d = vec.numElements()
    val out = new Array[Long](nBands)
    var band = 0
    var bit = 0 // global bit index: every hyperplane distinct across bands
    while (band < nBands) {
      var bucket = 0L
      var b = 0
      while (b < bitsPerBand) {
        val base = mix(seed + 0x9e3779b97f4a7c15L * (bit + 1))
        var acc = 0.0
        var i = 0
        while (i < d) {
          val h = mix(base + 0xc2b2ae3d27d4eb4fL * (i + 1))
          if ((h & 1L) == 1L) acc += vec.getDouble(i) else acc -= vec.getDouble(i)
          i += 1
        }
        if (acc > 0) bucket |= (1L << b)
        b += 1
        bit += 1
      }
      out(band) = bucket
      band += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_srp_bands(vec, bitsPerBand, nBands, seed)` → array<long> of
  * nBands band-bucket values. Scalars must be foldable (bound at
  * registration); vec is cast to array<double> by the registry. */
case class SrpBands(child: Expression, bitsPerBand: Int, nBands: Int, seed: Long)
  extends UnaryExpression {

  require(bitsPerBand >= 1 && bitsPerBand <= 63, "bitsPerBand in [1,63]")
  require(nBands >= 1, "nBands >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_srp_bands"

  // null-ELEMENT poisoning (the DotProduct/IntDot convention): a null
  // element must yield NULL band keys (which never equi-join), not be
  // silently read as 0.0 and land the row in plausible-but-wrong LSH
  // buckets — the review-caught divergence from the composed form
  override def nullable: Boolean = true

  override def nullSafeEval(vec: Any): Any = {
    val v = vec.asInstanceOf[ArrayData]
    if (DotCodegen.anyNull(v)) null
    else SrpCodegen.bands(v, bitsPerBand, nBands, seed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if (graft.functions.DotCodegen.anyNull($c)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} =
          graft.functions.SrpCodegen.bands($c, $bitsPerBand, $nBands, ${seed}L);
      }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
