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
