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
