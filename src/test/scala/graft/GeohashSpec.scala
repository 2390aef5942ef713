package graft

import graft.etl.Geo
import org.scalatest.funsuite.AnyFunSuite

class GeohashSpec extends AnyFunSuite {

  // Known vectors (FIXTURES.md §B.4, standard public geohash vectors,
  // precision 8 per reference load-s3.ts:190)
  test("known vectors at precision 8") {
    assert(Geo.encode(57.64911, 10.40744, 8) === "u4pruydq")
    assert(Geo.encode(37.8324, 112.5584, 8) === "ww8p1r4t")
    assert(Geo.encode(38.897, -77.036, 8) === "dqcjr0bp")
    assert(Geo.encode(-33.8688, 151.2093, 8) === "r3gx2f77")
  }

  test("longer precision extends the same prefix") {
    assert(Geo.encode(57.64911, 10.40744, 11) === "u4pruydqqvj")
    assert(Geo.encode(57.64911, 10.40744, 11).startsWith(
      Geo.encode(57.64911, 10.40744, 8)))
  }

  test("string inputs: both-present guard and junk → null") {
    assert(Geo.encodeStrings("57.64911", "10.40744", 8) === "u4pruydq")
    assert(Geo.encodeStrings(null, "10.4", 8) === null)
    assert(Geo.encodeStrings("57.6", null, 8) === null)
    assert(Geo.encodeStrings("abc", "10.4", 8) === null)
    assert(Geo.encodeStrings("95.0", "10.4", 8) === null) // out of range
  }

  test("fixed-point quantization formula == bisection (the DuckDB oracle's arithmetic)") {
    // replica of the generated etl_geohash oracle SQL: quantize both
    // axes to 20 fixed-point bits, interleave lon/lat, base32-encode
    def fixedPoint(lat: Double, lon: Double): String = {
      val ilat = math.min(math.floor((lat + 90.0) / 180.0 * 1048576).toLong, 1048575L)
      val ilon = math.min(math.floor((lon + 180.0) / 360.0 * 1048576).toLong, 1048575L)
      var bits = 0L
      var i = 0
      while (i < 20) {
        bits += (((ilon >> i) & 1L) << (2 * i + 1)) + (((ilat >> i) & 1L) << (2 * i))
        i += 1
      }
      val b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
      (0 until 8).map(j => b32(((bits >> (35 - 5 * j)) & 31L).toInt)).mkString
    }
    // the fixture family: the full 0.1° grid the etl_geohash query uses
    for (k <- 0 until 1800) {
      val lat = k.toDouble / 10.0 - 90.0
      val lon = (k * 7 % 3600).toDouble / 10.0 - 180.0
      assert(fixedPoint(lat, lon) === Geo.encode(lat, lon, 8),
        s"grid mismatch at ($lat,$lon)")
    }
    // exact dyadic cell boundaries (floor and the >=mid branch must
    // take the same side) and the range edges
    for (lat <- Seq(-90.0, -67.5, -45.0, -22.5, 0.0, 22.5, 45.0, 67.5, 89.9, 90.0);
         lon <- Seq(-180.0, -90.0, -45.0, 0.0, 45.0, 90.0, 179.9, 180.0))
      assert(fixedPoint(lat, lon) === Geo.encode(lat, lon, 8),
        s"boundary mismatch at ($lat,$lon)")
    // random coordinates (generic equivalence away from boundaries)
    val rnd = new scala.util.Random(11)
    (1 to 5000).foreach { _ =>
      val lat = rnd.nextDouble() * 180.0 - 90.0
      val lon = rnd.nextDouble() * 360.0 - 180.0
      assert(fixedPoint(lat, lon) === Geo.encode(lat, lon, 8),
        s"random mismatch at ($lat,$lon)")
    }
  }

  test("geohash8Native == geohash8 UDF on strings, junk, nulls, specials") {
    // the load path now derives through the codegen'd form; the UDF
    // stays as the reference twin — they must agree row-for-row on
    // the string-input contract (parse, trim, junk→null, range guard)
    val spark = TestSpark.spark
    import spark.implicits._
    val fixtures: Seq[(Option[String], Option[String])] = Seq(
      (Some("57.64911"), Some("10.40744")),
      (Some(" 37.8324 "), Some("  112.5584")), // whitespace-padded
      (Some("-33.8688"), Some("151.2093")),
      (Some("1e1"), Some("-1.5e2")),           // scientific notation
      (Some(""), Some("10.4")),                // empty → null
      (Some("abc"), Some("10.4")),             // junk → null
      (Some("95.0"), Some("10.4")),            // lat out of range
      (Some("45.0"), Some("181.0")),           // lon out of range
      (Some("NaN"), Some("10.4")),             // special literal
      (Some("Infinity"), Some("10.4")),
      (None, Some("10.4")), (Some("45.0"), None), (None, None))
    val df = fixtures.toDF("lat", "lon")
      .select(Geo.geohash8Native($"lat", $"lon").as("native"),
        Geo.geohash8($"lat", $"lon").as("ref"))
    val disagree = df.filter(!($"native" <=> $"ref")).count()
    assert(disagree === 0, df.collect().mkString("\n"))
    // and the happy-path values are the known vectors
    val vals = df.select($"native").collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(vals(0) === "u4pruydq" && vals(1) === "ww8p1r4t")
    assert(vals.drop(4).forall(_ == null))
  }

  test("property: precision p is a prefix of precision p+1") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val lat = rnd.nextDouble() * 179.98 - 89.99
      val lon = rnd.nextDouble() * 359.98 - 179.99
      (1 to 10).foreach { p =>
        assert(Geo.encode(lat, lon, p + 1).startsWith(Geo.encode(lat, lon, p)),
          s"prefix break at ($lat,$lon,$p)")
      }
    }
  }
}
