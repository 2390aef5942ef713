package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geohash encoding (SURVEY.md §2.3 F6) — the reference's only
  * non-builtin row function: `geohash.encode(lat, lon, 8)` into the
  * derived `Residence_Addresses_GeoHash` column, computed only when
  * both coordinates are present (load-s3.ts:186-193; precision 8 per
  * load-s3.ts:190).
  *
  * The algorithm is the standard public geohash: interleave lon/lat
  * range-bisection bits, 5 bits per base-32 character. Pure Scala
  * (~25 LoC, no deps), exposed as a UDF here and as a codegen'd
  * Catalyst Expression in `graft.functions.GeohashExpr` (idiomatic
  * fast path — the UDF stays as the reference implementation for
  * differential testing).
  */
object Geo {

  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash encode. Caller guarantees finite lat/lon. */
  def encode(lat: Double, lon: Double, precision: Int): String = {
    val sb = new java.lang.StringBuilder(precision)
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var even = true; var bit = 0; var ch = 0
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(base32.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Null-safe string-input encode, mirroring the reference's "only
    * when both lat AND lon parse" guard. Lat/lon arrive as TEXT in the
    * voter schema (Voter.prisma:33-34). */
  def encodeStrings(lat: String, lon: String, precision: Int): String = {
    if (lat == null || lon == null) return null
    try {
      val la = lat.trim.toDouble
      val lo = lon.trim.toDouble
      if (la.isNaN || lo.isNaN || la < -90 || la > 90 || lo < -180 || lo > 180) null
      else encode(la, lo, precision)
    } catch { case _: NumberFormatException => null }
  }

  private val geohashUdf =
    udf((lat: String, lon: String, p: Int) => encodeStrings(lat, lon, p))

  /** Column form over the TEXT lat/lon columns, precision 8 — the UDF
    * reference twin, kept for differential testing against
    * [[geohash8Native]] (which the load path uses). */
  def geohash8(lat: Column, lon: Column): Column =
    geohashUdf(lat, lon, lit(8))

  /** Codegen'd form of [[geohash8]] over the TEXT lat/lon columns:
    * `try_cast` to double (junk/empty → NULL — the same null-on-junk
    * contract as [[encodeStrings]]'s parse-and-catch: both paths
    * bottom out in `Double.parseDouble` on the trimmed string, and
    * the special literals try_cast additionally accepts, ±"inf"/NaN,
    * encode to NULL anyway via the range guard) feeding the native
    * `GeohashEncode` expression. Keeps the voter load's derive stage
    * — batch AND streaming — inside WholeStageCodegen instead of
    * fencing every row through a Scala closure; bit-identical output
    * is asserted by the differential test in GeohashSpec. */
  def geohash8Native(lat: Column, lon: Column): Column =
    graft.functions.GraftFunctions.geohash(
      lat.try_cast(org.apache.spark.sql.types.DoubleType),
      lon.try_cast(org.apache.spark.sql.types.DoubleType), 8)

  /** Geohash cell cover of a lat/lon box: the distinct precision-p
    * prefixes of every cell intersecting the box. Filtering a geohash
    * column with `startswith(any cover prefix)` turns a spatial box
    * query into prefix ranges — sargable against parquet min/max
    * stats and geohash-prefix partitioning; the 100 TB answer to the
    * reference's 251 B-tree indexes for geo lookups. Cover size is
    * bounded by the cell grid at precision p; keep p small (≤4) for
    * box filters. */
  def coverBox(minLat: Double, maxLat: Double, minLon: Double,
      maxLon: Double, precision: Int): Seq[String] = {
    // cell sizes halve per bit; at precision p: 5p bits, lon gets ceil.
    // Iterate CELL INDICES of the box's corners (inclusive), never
    // stepped coordinates — stepping by a cell size from an unaligned
    // box minimum skips the final row/column of cells (a silent
    // false-negative filter; caught in review).
    val bits = 5 * precision
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    val dLat = 180.0 / (1L << latBits)
    val dLon = 360.0 / (1L << lonBits)
    def clampLat(x: Double) = math.min(90.0 - 1e-12, math.max(-90.0, x))
    def clampLon(x: Double) = math.min(180.0 - 1e-12, math.max(-180.0, x))
    val iLat0 = math.floor((clampLat(minLat) + 90.0) / dLat).toLong
    val iLat1 = math.floor((clampLat(maxLat) + 90.0) / dLat).toLong
    val iLon0 = math.floor((clampLon(minLon) + 180.0) / dLon).toLong
    val iLon1 = math.floor((clampLon(maxLon) + 180.0) / dLon).toLong
    val out = Seq.newBuilder[String]
    var i = iLat0
    while (i <= iLat1) {
      var j = iLon0
      while (j <= iLon1) {
        out += encode(-90.0 + (i + 0.5) * dLat, -180.0 + (j + 0.5) * dLon,
          precision)
        j += 1
      }
      i += 1
    }
    out.result().distinct
  }

  /** Predicate: geohash column falls inside the box's cell cover. */
  def inBox(geohash: Column, minLat: Double, maxLat: Double,
      minLon: Double, maxLon: Double, precision: Int): Column =
    coverBox(minLat, maxLat, minLon, maxLon, precision)
      .map(p => geohash.startsWith(p))
      .reduce(_ || _)
}
