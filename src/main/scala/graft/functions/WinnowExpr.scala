package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed rolling-hash document fingerprints as a native Catalyst
  * expression — the MOSS algorithm (Schleimer, Wilkerson, Aiken,
  * SIGMOD'03, public): Rabin–Karp rolling hashes of every byte
  * k-gram, then the minimum hash of each window of `w` consecutive
  * k-gram hashes (rightmost minimum on ties). The selected distinct
  * hashes are the document's fingerprint set, with the paper's
  * guarantee: any shared substring of length ≥ w + k − 1 produces at
  * least one shared fingerprint, and no shared substring shorter than
  * k produces any.
  *
  * The k-gram hash is a base-257 polynomial in wrapping 64-bit
  * arithmetic (O(1) per slide), passed through the splitmix64
  * finalizer so window minima are uniform rather than biased toward
  * low byte values. Everything is engine-independent integer math —
  * deterministic across partitionings and runs — and the expression
  * is codegen'd (one static call), so fingerprinting a 100 TB corpus
  * stays inside WholeStageCodegen like the SimHash/MinHash siblings.
  */
object WinnowCodegen {
  private final val Base = 257L

  private def mix(v: Long): Long = {
    var x = v
    x ^= (x >>> 30); x *= 0xbf58476d1ce4e5b9L
    x ^= (x >>> 27); x *= 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return ArrayData.toArrayData(Array.empty[Long])
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var bk = 1L // Base^(k-1), for removing the outgoing byte
    var i = 0
    while (i < k - 1) { bk *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    hashes(0) = mix(h)
    var p = 1
    while (p < m) {
      h = (h - (bytes(p - 1) & 0xffL) * bk) * Base + (bytes(p + k - 1) & 0xffL)
      hashes(p) = mix(h)
      p += 1
    }
    val out = new java.util.HashSet[Long]()
    if (m <= w) {
      var mi = 0
      var j = 1
      while (j < m) { if (hashes(j) <= hashes(mi)) mi = j; j += 1 }
      out.add(hashes(mi))
    } else {
      var mi = 0
      var j = 1
      while (j < w) { if (hashes(j) <= hashes(mi)) mi = j; j += 1 }
      out.add(hashes(mi))
      var r = w
      while (r < m) {
        val lo = r - w + 1
        if (mi < lo) {
          // previous minimum slid out: rescan the window, keeping the
          // rightmost minimum (<=) per the winnowing tie rule
          mi = lo
          var t = lo + 1
          while (t <= r) { if (hashes(t) <= hashes(mi)) mi = t; t += 1 }
        } else if (hashes(r) <= hashes(mi)) {
          mi = r
        }
        out.add(hashes(mi))
        r += 1
      }
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    java.util.Arrays.sort(arr)
    ArrayData.toArrayData(arr)
  }
}

case class Winnow(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 2 && w >= 1, "winnow requires k >= 2 and w >= 1")

  // input must be string (ensured by the registry's Cast)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(text: Any): Any =
    WinnowCodegen.winnow(text.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowCodegen.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
