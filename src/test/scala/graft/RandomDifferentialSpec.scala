package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random differential tests for the round-7 operators: one
  * Spark job per property over a collision-dense random input, graded
  * against an INDEPENDENT in-memory sequential model (not another
  * Spark plan), so a shared-plan bug cannot self-confirm. Fixed seeds
  * keep failures reproducible.
  */
class RandomDifferentialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fuzzy edit-1 join on random collision-dense strings == brute force") {
    val rnd = new scala.util.Random(42)
    // short strings over a 3-letter alphabet → dense edit-1 structure,
    // plus empties and duplicates
    val words = Seq.fill(200)(
      (0 until rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val distinct = words.distinct.sorted
    val expected = (for {
      a <- distinct; b <- distinct if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    val got = ops.DedupOps.fuzzyJoinEdit1On(words.toDF("w"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(expected.nonEmpty)
    assert(got == expected,
      s"missed ${(expected -- got).size} / invented ${(got -- expected).size}")
  }

  test("CDC merge-on-read on a random change stream == sequential replay") {
    val rnd = new scala.util.Random(7)
    val nKeys = 30
    val base = (0L until nKeys).map(k => k -> rnd.nextInt(1000).toDouble).toMap
    // random change stream over a key space that overlaps the base
    // AND extends past it (inserts), with deletes mixed in
    val changes = (1 to 400).map { seq =>
      (rnd.nextInt(nKeys + 10).toLong,
        if (rnd.nextInt(5) == 0) "D" else "U",
        rnd.nextInt(1000).toDouble,
        rnd.nextInt(50).toLong, // chg_micros with many ties → seq breaks
        seq.toLong)
    }
    // independent model: fold the stream in (chg_micros, seq) order
    val finalByKey = changes.groupBy(_._1).map { case (k, cs) =>
      k -> cs.maxBy(c => (c._4, c._5))
    }
    val expected = ((0L until nKeys).flatMap { k =>
      finalByKey.get(k) match {
        case None => Some((k, base(k), "base"))
        case Some((_, "U", bal, _, _)) => Some((k, bal, "cdc"))
        case _ => None // winning delete
      }
    } ++ finalByKey.collect {
      case (k, (_, "U", bal, _, _)) if k >= nKeys => (k, bal, "cdc")
    }).toSet
    val baseDf = base.toSeq.toDF("c_custkey", "c_acctbal")
    val chgDf = changes.toDF("c_custkey", "op", "acctbal", "chg_micros", "seq")
      .withColumn("pri", lit(1))
    // merge-on-read form: base lifted to priority-0 records + rank
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_custkey"))
      .orderBy(col("pri").desc, col("chg_micros").desc, col("seq").desc)
    val mor = baseDf.select(col("c_custkey"), lit("U").as("op"),
        col("c_acctbal").as("acctbal"), lit(0).as("pri"),
        lit(0L).as("chg_micros"), lit(0L).as("seq"))
      .unionByName(chgDf.select(col("c_custkey"), col("op"), col("acctbal"),
        col("pri"), col("chg_micros"), col("seq")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "U")
      .select(col("c_custkey"), col("acctbal"),
        when(col("pri") === 1, lit("cdc")).otherwise(lit("base")).as("origin"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(mor == expected,
      s"MOR missed ${(expected -- mor).size} / invented ${(mor -- expected).size}")
    // and the shared full-outer merge rule agrees too
    val wL = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_custkey"))
      .orderBy(col("chg_micros").desc, col("seq").desc)
    val latest = chgDf.withColumn("rn", row_number().over(wL))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("op").as("d_op"), col("acctbal").as("d_bal"))
    val joined = ops.CdcOps.mergeLatestWithBase(baseDf, latest)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(joined == expected, "full-outer merge diverged from replay")
  }

  test("gapfill on a random sparse series == in-memory interpolation") {
    val rnd = new scala.util.Random(11)
    val base = java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
    // 3 users, each with known values at random distinct hours
    val rows = for {
      u <- 0 to 2
      h <- rnd.shuffle((0 to 120).toList).take(12 + u)
    } yield (u.toLong, java.sql.Timestamp.valueOf(base.plusHours(h)),
      (rnd.nextInt(400) / 100.0))
    val ev = rows.toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val got = ops.EventOps.gapfillOn(ev).collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getDouble(2), r.getBoolean(3)))
    // independent model (decimal-exact hourly sums, linear fill)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val hourly = rs.groupBy(r => r._2.toLocalDateTime.withMinute(0)
          .withSecond(0).withNano(0))
        .map { case (h, vs) =>
          h -> vs.map(v => BigDecimal(v._3).setScale(2)).sum.toDouble }
      val hours = hourly.keys.toSeq.sortBy(_.toString)
      val (mn, mx) = (hours.head, hours.last)
      val slots = Iterator.iterate(mn)(_.plusHours(1))
        .takeWhile(!_.isAfter(mx)).toSeq
      val expected = slots.map { h =>
        hourly.get(h) match {
          case Some(v) => (h, v, false)
          case None =>
            val prevH = hours.filter(_.isBefore(h)).last
            val nextH = hours.filter(_.isAfter(h)).head
            val (pv, nv) = (hourly(prevH), hourly(nextH))
            val pos = java.time.Duration.between(prevH, h).toHours.toDouble
            val len = java.time.Duration.between(prevH, nextH).toHours.toDouble
            (h, pv + (nv - pv) * pos / len, true)
        }
      }
      val gotU = got.filter(_._1 == u).sortBy(_._2.toString)
        .map(r => (r._2, r._3, r._4)).toSeq
      assert(gotU == expected, s"user $u gapfill diverged from replay")
    }
  }

  test("native as-of join on random tied/null-laden frames == replay") {
    val rnd = new scala.util.Random(99)
    val base = java.time.LocalDateTime.of(2024, 6, 1, 0, 0)
    def ts(step: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(base.plusMinutes(step))
    // coarse minute grid forces exact left-right time ties AND
    // duplicate right times per key (the tie-break path); ~10% null
    // keys/times exercise the never-match rule
    val left = (1 to 200).map { i =>
      (if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(rnd.nextInt(8)),
        if (rnd.nextInt(10) == 0) null else ts(rnd.nextInt(50)),
        i.toLong)
    }
    val right = (1 to 150).map { j =>
      (if (rnd.nextInt(12) == 0) null else java.lang.Long.valueOf(rnd.nextInt(8)),
        if (rnd.nextInt(12) == 0) null else ts(rnd.nextInt(50)),
        (1000 + j).toLong)
    }
    val lDf = left.toDF("k", "t", "lid")
      .withColumn("t", col("t").cast("timestamp_ntz"))
    val rDf = right.toDF("rk", "rt", "rid")
      .withColumn("rt", col("rt").cast("timestamp_ntz"))

    def replay(tolMicros: Option[Long]): Map[Long, Option[Long]] =
      left.map { case (k, t, lid) =>
        lid -> (if (k == null || t == null) None
        else right.filter { case (rk, rt, _) =>
          rk != null && rt != null && rk == k && !rt.after(t) &&
            tolMicros.forall(tol =>
              (t.getTime - rt.getTime) * 1000L <= tol)
        }.sortBy { case (_, rt, rid) => (rt.getTime, rid) }
          .lastOption.map(_._3))
      }.toMap

    for (tol <- Seq(None, Some(5L * 60L * 1000000L))) {
      val got = graft.plans.AsOf.join(lDf, rDf,
          leftKey = "k", leftTime = "t",
          rightKey = "rk", rightTime = "rt", rightTieBreak = "rid",
          toleranceMicros = tol)
        .select(col("lid"), col("rid")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val expected = replay(tol)
      assert(got.keySet == expected.keySet)
      val diffs = expected.keys.filter(k => got(k) != expected(k))
      assert(diffs.isEmpty,
        s"tol=$tol: ${diffs.take(5).map(k => s"$k: ${got(k)} vs ${expected(k)}")}")
    }
  }

  test("streaming sessionization on random gap-tied events == strict replay") {
    val rnd = new scala.util.Random(5)
    val base = java.time.LocalDateTime.of(2024, 2, 1, 0, 0)
    // per-user cumulative gaps drawn to land ON the 30-min boundary
    // often: the session_window tie rule (exact gap EXTENDS, strictly
    // more starts a new session) is the empirically-probed semantics
    // the oracle encodes — stress it, don't avoid it
    var eid = 0L
    val rows = (0L to 4L).flatMap { u =>
      var t = rnd.nextInt(3600)
      (1 to 40).map { _ =>
        t += (rnd.nextInt(4) match {
          case 0 => 1800          // exactly the gap: same session
          case 1 => 1801          // one past: new session
          case 2 => rnd.nextInt(1800)
          case _ => 1800 + rnd.nextInt(3600)
        })
        eid += 1
        (eid, java.sql.Timestamp.valueOf(base.plusSeconds(t)), u,
          "view", 1.0, "{}")
      }
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type",
        "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    // the streaming reader expects a FILE named events.parquet (like
    // the fixtures), so stage the single part file under that name
    val dir = java.nio.file.Files.createTempDirectory("graft-ss")
    val staging = dir.resolve("stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = staging.toFile.listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, dir.resolve("events.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)

    val got = streaming.StreamingSessions.sessionCounts(spark, dir.toString)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = rows.groupBy(_._3).map { case (u, es) =>
      val times = es.map(_._2.getTime / 1000L).sorted
      val sessions = 1 + times.zip(times.tail)
        .count { case (a, b) => b - a > 1800L }
      u -> (sessions.toLong, es.size.toLong)
    }
    assert(got == expected,
      s"diff: ${expected.keys.filter(k => got.get(k) != expected.get(k))
        .map(k => s"$k: ${got.get(k)} vs ${expected(k)}")}")
  }

  test("prefix-filter Jaccard on random token sets == in-memory brute force") {
    val rnd = new scala.util.Random(23)
    // small token universe → heavy prefix collisions; variable sizes
    val universe = (0 until 12).map(i => s"t$i")
    val docs = (0 until 60).map { id =>
      (id.toLong, rnd.shuffle(universe.toList)
        .take(2 + rnd.nextInt(8)).toArray)
    }
    val expected = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      inter = sa.toSet.intersect(sb.toSet).size
      j = inter.toDouble / (sa.length + sb.length - inter)
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= 0.5
    } yield (a, b)).toSet
    val got = ops.DedupOps.jaccardPrefixPairsOn(docs.toDF("doc_id", "sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    assert(got == expected,
      s"missed ${(expected -- got).size} / invented ${(got -- expected).size}")
  }

  test("qsketch on random streams under random shard merges holds the " +
      "rank band (r8)") {
    // adversarial-ish inputs: heavy duplication, skewed magnitudes,
    // random shard boundaries and merge orders — the sketch's rank
    // guarantee must hold for EVERY combination, graded against exact
    // sorted data (an independent sequential model)
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 5) {
      val n = 2000 + rnd.nextInt(20000)
      val data = Array.fill(n) {
        rnd.nextInt(4) match {
          case 0 => rnd.nextInt(10).toDouble // heavy collisions
          case 1 => rnd.nextDouble() * 1e6
          case 2 => -rnd.nextDouble() * 1e3 // negatives
          case _ => rnd.nextGaussian() * 100
        }
      }
      val sorted = data.sorted
      // under heavy ties a value OCCUPIES a rank interval
      // [count(<v), count(≤v)] — the sketch's guarantee is that this
      // interval intersects the q band, not that its upper end does
      // (a 25%-duplicated value can legitimately span several percent)
      def rankLo(v: Double): Double = sorted.count(_ < v).toDouble / n
      def rankHi(v: Double): Double = sorted.count(_ <= v).toDouble / n
      // random shard split + scrambled merge order
      val nShards = 1 + rnd.nextInt(12)
      val cuts = (Array(0, n) ++ Array.fill(nShards - 1)(rnd.nextInt(n)))
        .distinct.sorted
      val shards = cuts.sliding(2).map { case Array(a, b) =>
        val s = new graft.functions.QSketch(512)
        (a until b).foreach(i => s.update(data(i)))
        s
      }.toSeq
      val merged = new graft.functions.QSketch(512)
      rnd.shuffle(shards).foreach(merged.merge)
      assert(merged.n === n.toLong, s"trial $trial: mass lost")
      for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
        val est = merged.quantile(q)
        val eps = 0.02 + 1.0 / n
        assert(rankLo(est) <= q + eps && rankHi(est) >= q - eps,
          s"trial $trial n=$n q=$q est=$est " +
            s"interval=[${rankLo(est)}, ${rankHi(est)}]")
      }
    }
  }

  test("mg sketch on random zipf streams under random merges: never " +
      "overcounts, undercount bounded, heavy hitters present (r8)") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val m = 8 + rnd.nextInt(24)
      val n = 5000 + rnd.nextInt(10000)
      // zipf-ish: key j with weight ~ 1/(j+1)
      val keys = Array.fill(n) {
        var j = 0
        while (j < 200 && rnd.nextDouble() > 0.3) j += 1
        s"k$j"
      }
      val exact = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val nShards = 1 + rnd.nextInt(8)
      val cuts = (Array(0, n) ++ Array.fill(nShards - 1)(rnd.nextInt(n)))
        .distinct.sorted
      val shards = cuts.sliding(2).map { case Array(a, b) =>
        val s = new graft.functions.MGSketch(m)
        (a until b).foreach(i => s.update(keys(i)))
        s
      }.toSeq
      val merged = new graft.functions.MGSketch(m)
      rnd.shuffle(shards).foreach(merged.merge)
      assert(merged.n === n.toLong)
      assert(merged.counters.size <= m)
      val bound = n.toLong / (m + 1) + 1
      merged.counters.foreach { case (k, c) =>
        assert(c <= exact(k), s"trial $trial: overcount on $k")
        assert(exact(k) - c <= bound, s"trial $trial: undercount on $k")
      }
      // every guaranteed heavy hitter (freq > n/(m+1)) is present
      exact.filter(_._2 > bound).keys.foreach { k =>
        assert(merged.counters.contains(k),
          s"trial $trial: guaranteed heavy hitter $k evicted")
      }
    }
  }
}
