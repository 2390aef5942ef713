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
}
