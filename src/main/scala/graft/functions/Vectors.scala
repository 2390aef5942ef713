package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, composed from
  * codegen'd higher-order builtins (`zip_with` + `aggregate`) — no
  * UDF, so similarity search stays inside WholeStageCodegen.
  *
  * All math is done in double precision (the float arrays are
  * upcast first) and rounded once at the end; two engines computing
  * dot/(|a|·|b|) agree to ~1e-15, so round-6 values are stable across
  * Spark and the DuckDB oracle.
  */
object Vectors {

  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Oracle-stable cosine: double math, rounded to 6 places. */
  def cosine6(a: Column, b: Column): Column =
    round(cosine(toDouble(a), toDouble(b)), 6)

  /** Cosine from pre-computed per-row norms: in an all-pairs join the
    * naive form recomputes |a| and |b| once PER PAIR (3 array passes
    * per pair); precompute a `norm(...)` column on each side and pay
    * one pass per pair. Same arithmetic (dot / (na*nb)) → same
    * round-6 values as `cosine6`. */
  def cosine6WithNorms(a: Column, an: Column, b: Column, bn: Column): Column =
    round(dot(toDouble(a), toDouble(b)) / (an * bn), 6)

  /** The per-row norm column to pair with [[cosine6WithNorms]]. */
  def normCol(a: Column): Column = norm(toDouble(a))
}
