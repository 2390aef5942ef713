package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-permutation MinHash signature in ONE pass over the shingle array.
  *
  * The composed formulation (k separate `array_min(transform(...))`
  * columns) traverses the array and re-hashes every shingle k times.
  * Here each shingle is byte-hashed ONCE (FNV-1a-64) and the k
  * "permutations" are cheap bit-mix finalizations of that base hash
  * (splitmix64 with per-seed constants) — 64× fewer byte traversals
  * for k=32. At 100 TB corpus scale the signature pass is the dominant
  * dedup cost, so this is the difference between one scan and k scans.
  */
object MinHashCodegen {
  /** splitmix64 finalizer — full-avalanche mix of base hash × seed. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def signature(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = SimHashCodegen.fnv64(shingles.getUTF8String(i).getBytes)
        var s = 0
        while (s < k) {
          val h = mix(base + 0x9e3779b97f4a7c15L * (s + 1))
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `graft_minhash(tokens_or_shingles, k)` → array<long> of k minima.
  * k must be a foldable int (bound at registration). */
case class MinHashSignature(child: Expression, k: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  // an EMPTY shingle array yields NULL, not [Long.MaxValue × k]: the
  // composed array_min(transform(...)) form returns NULL per band for
  // empty input, and NULL band keys never equi-join — whereas a
  // shared MaxValue signature would cluster every empty document as a
  // near-duplicate of every other (review finding). Unreachable via
  // shingles(), which never emits an empty array.
  override def nullable: Boolean = true

  override def nullSafeEval(shingles: Any): Any = {
    val a = shingles.asInstanceOf[ArrayData]
    if (a.numElements() == 0) null
    else MinHashCodegen.signature(a, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() == 0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.MinHashCodegen.signature($c, $k);
      }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
