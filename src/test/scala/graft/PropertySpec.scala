package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (ScalaCheck) for the primitives whose
  * correctness rests on an algebraic guarantee rather than an
  * example: winnowing's shared-substring theorem and the two-phase
  * prefix sum's equivalence to the sequential form.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def passes(prop: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def fps(s: String): Set[Long] = {
    val a = graft.functions.WinnowCodegen.winnow(UTF8String.fromString(s), 8, 4)
    (0 until a.numElements()).map(a.getLong).toSet
  }

  test("winnow theorem: any shared >=11-char substring shares a fingerprint") {
    val lowerStr = Gen.stringOfN(12, Gen.alphaLowerChar)
    val prop = Prop.forAll(lowerStr, lowerStr, lowerStr,
      Gen.choose(11, 40)) { (pre, post, seed, len) =>
      // build a shared run of exactly `len` chars (>= w+k-1 = 11)
      val shared = Iterator.continually(seed).flatten.take(len).mkString
      val a = pre + shared + post.reverse
      val b = post + shared + pre.reverse
      fps(a).intersect(fps(b)).nonEmpty
    }
    passes(prop)
  }

  test("winnow: deterministic and empty below k") {
    val anyStr = Gen.asciiPrintableStr
    passes(Prop.forAll(anyStr) { s =>
      fps(s) == fps(s) && (s.getBytes.length >= 8 || fps(s).isEmpty)
    })
  }

  test("winnow: disjoint byte alphabets never share fingerprints") {
    val lo = Gen.stringOfN(30, Gen.alphaLowerChar)
    val hi = Gen.stringOfN(30, Gen.numChar)
    passes(Prop.forAll(lo, hi) { (a, b) =>
      fps(a).intersect(fps(b)).isEmpty
    }, n = 50)
  }

  test("band join: random bands/values match the naive non-equi join") {
    import spark.implicits._
    val gen = for {
      nBands <- Gen.choose(1, 5)
      edges <- Gen.listOfN(nBands * 2, Gen.choose(0.0, 100.0))
      vals <- Gen.listOfN(40, Gen.choose(-10.0, 110.0))
      width <- Gen.oneOf(1L, 7L, 25L)
    } yield (edges, vals, width)
    val prop = Prop.forAll(gen) { case (edges, vals, width) =>
      // pair consecutive sorted edges into [lo, hi) bands (may touch
      // or be degenerate when duplicates collapse an interval)
      val bands = edges.sorted.grouped(2).collect {
        case List(lo, hi) => (s"b$lo", lo, hi)
      }.toSeq
      val bandsDf = bands.toDF("band", "lo", "hi")
      val factDf = vals.toDF("v")
      val got = ops.Relational
        .bandJoin(factDf, col("v"), bandsDf, "lo", "hi", width)
        .select("v", "band").collect()
        .map(r => (r.getDouble(0), r.getString(1))).sorted.toSeq
      val want = (for {
        v <- vals
        (b, lo, hi) <- bands if v >= lo && v < hi
      } yield (v, b)).sorted
      got == want
    }
    passes(prop, n = 10)
  }

  test("prefix sum: random data/buckets match the sequential scan") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 300)
      groups <- Gen.choose(1, 4)
      width <- Gen.oneOf(1L, 3L, 16L, 1000L)
      vals <- Gen.listOfN(n, Gen.choose(0L, 50L))
    } yield (groups, width, vals)
    val prop = Prop.forAll(gen) { case (groups, width, vals) =>
      val rows = vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, s"g${i % groups}", v)
      }
      val df = rows.toDF("id", "grp", "v")
      val got = ops.PrefixSum
        .runningSum(df, Seq("grp"), "id", "v", "cum", width)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum")))
        .toMap
      // sequential reference: running sum per group in id order
      val want = rows.groupBy(_._2).values.flatMap { g =>
        g.sortBy(_._1).scanLeft((-1L, 0L)) { case ((_, acc), (id, _, v)) =>
          (id, acc + v)
        }.drop(1)
      }.toMap
      got == want
    }
    passes(prop, n = 8)
  }

  test("multi-column prefix sums: one pass equals N chained passes") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 200)
      groups <- Gen.choose(1, 3)
      width <- Gen.oneOf(1L, 7L, 64L)
      vals <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 9L)))
    } yield (groups, width, vals)
    val prop = Prop.forAll(gen) { case (groups, width, vals) =>
      val rows = vals.zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, s"g${i % groups}", a, b)
      }
      val df = rows.toDF("id", "grp", "a", "b")
      val got = ops.PrefixSum.runningSums(df, Seq("grp"), "id",
          Seq("a" -> "ca", "b" -> "cb"), width)
        .collect()
        .map(r => (r.getAs[Long]("id"),
          (r.getAs[Long]("ca"), r.getAs[Long]("cb")))).toMap
      val chained = ops.PrefixSum.runningSum(
          ops.PrefixSum.runningSum(df, Seq("grp"), "id", "a", "ca", width),
          Seq("grp"), "id", "b", "cb", width)
        .collect()
        .map(r => (r.getAs[Long]("id"),
          (r.getAs[Long]("ca"), r.getAs[Long]("cb")))).toMap
      got == chained
    }
    passes(prop, n = 6)
  }
}
