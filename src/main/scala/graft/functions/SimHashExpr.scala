package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash document fingerprinting as a native Catalyst expression.
  *
  * 64-bit SimHash over a token array: each token is hashed with
  * FNV-1a-64 (self-contained, engine-independent), each hash votes ±1
  * per bit position, and the result sets bit i iff the vote sum is
  * positive. Near-duplicate documents then differ in few bits, so
  * hamming distance (`bit_count(a ^ b)` — a builtin) gives an O(1)
  * per-pair similarity test after a single scan: the cheap alternative
  * to MinHash when one 64-bit sketch per doc must fit in memory at
  * 100 TB corpus scale.
  */
object SimHashCodegen {
  def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = fnv64(tokens.getUTF8String(t).getBytes)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }
}

case class SimHash(child: Expression)
  extends UnaryExpression {

  // input must be array<string> (ensured by the Column wrappers)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(tokens: Any): Any =
    SimHashCodegen.simhash(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashCodegen.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
