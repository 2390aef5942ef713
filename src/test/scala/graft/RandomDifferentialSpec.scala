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

  test("asof nearest on random interleaved streams == brute force") {
    val rnd = new scala.util.Random(13)
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // dense ts collisions across 8 keys → live ties in BOTH the
    // equal-ts and the equal-distance sense
    val left = (1 to 150).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(50)))
    val right = (1 to 150).map(i =>
      ((i + 1000).toLong, rnd.nextInt(8).toLong, rnd.nextInt(50)))
    val evDf = left.map { case (id, u, s) => (id, u, t(s)) }
      .toDF("event_id", "user_id", "ts")
    val ordDf = right.map { case (id, u, s) => (u, t(s), id) }
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
    val expected = left.map { case (id, u, s) =>
      val cands = right.filter(_._2 == u)
      val bwd = cands.filter(_._3 <= s).sortBy(c => (c._3, c._1)).lastOption
      val fwd = cands.filter(_._3 > s).sortBy(c => (c._3, c._1)).headOption
      id -> ((bwd, fwd) match {
        case (Some(b), f) if f.isEmpty || (s - b._3) <= (f.get._3 - s) =>
          Some((b._1, (s - b._3).toLong))
        case (_, Some(f)) => Some((f._1, -(f._3 - s).toLong))
        case _ => None
      })
    }.toMap
    val got = ops.EventOps.asofJoinNearestOn(evDf, ordDf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4)))))
      .toMap
    assert(got == expected,
      s"diff: ${(expected.toSet -- got.toSet).take(3)} vs ${(got.toSet -- expected.toSet).take(3)}")
  }

  test("search eval P@10/R@10/MRR on random corpora == sequential reference") {
    val rnd = new scala.util.Random(23)
    val vocab = ops.TextOps.EvalQueries.flatMap(t => Seq(t._2, t._3)) ++
      Seq("alpha", "beta", "gamma", "delta")
    val docs: Seq[(Long, String)] = (1L to 60L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(25))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // sequential reference: the exact bm25 arithmetic (ln + two-term
    // sum + HALF_UP round 6), full rank, phrase relevance, metrics
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val nDocs = docs.size.toDouble
    val sumLen = toks.values.map(_.size).sum.toDouble
    val allTerms = vocab.take(12).toSet
    val tf: Map[(Long, String), Int] = toks.toSeq.flatMap { case (id, ts) =>
      ts.filter(allTerms).groupBy(identity).map { case (t, g) =>
        (id, t) -> g.size } }.toMap
    val df: Map[String, Int] = tf.keys.toSeq.groupBy(_._2)
      .map { case (t, ks) => t -> ks.size }
    val expected = ops.TextOps.EvalQueries.map { case (qid, t1, t2) =>
      val scored = docs.flatMap { case (id, _) =>
        val parts = Seq(t1, t2).flatMap { t =>
          tf.get((id, t)).map { f =>
            val idf = math.log((nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
            val norm = 1.2 * (0.25 + 0.75 *
              (toks(id).size.toLong * docs.size).toDouble / sumLen)
            idf * (f * 2.2) / (f + norm)
          }
        }
        if (parts.isEmpty) None
        else Some(id -> BigDecimal(parts.sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val ranked = scored.sortBy { case (id, s) => (-s, id) }
        .zipWithIndex.map { case ((id, _), i) => (id, i + 1L) }
      val rel = ranked.map { case (id, r) =>
        (r, (" " + docs.find(_._1 == id).get._2 + " ")
          .contains(s" $t1 $t2 ")) }
      val nRel = rel.count(_._2).toLong
      val hits = rel.count { case (r, v) => v && r <= 10L }.toLong
      val firstRel = rel.filter(_._2).map(_._1).minOption
      (qid, nRel, hits, hits.toDouble / 10.0,
        if (nRel > 0) Some(hits.toDouble / nRel.toDouble) else None,
        firstRel.map(1.0 / _.toDouble).getOrElse(0.0))
    }
    import spark.implicits._
    val got = ops.TextOps.searchEvalOn(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getDouble(5))).toSeq
    assert(got == expected,
      s"diff: ${expected.diff(got).take(2)} vs ${got.diff(expected).take(2)}")
    // random-fixture non-vacuity: at least one query with a partial
    // P@10 and at least one miss-at-top (0 < rr < 1) must occur —
    // BOTH are asserted (review finding: the rr arm was promised in
    // this comment but never checked, so an all-rr=1 fixture would
    // grade a constant)
    assert(expected.exists(e => e._4 > 0.0 && e._4 < 1.0))
    assert(expected.exists(e => e._6 > 0.0 && e._6 < 1.0),
      "no query misses at the top — the MRR arm grades a constant")
  }

  test("hybrid search eval on random corpora+embeddings == sequential reference") {
    // grades searchEvalHybridOn end to end: the shared BM25 chain,
    // the per-query cosine arm (incl. the missing-embedding NULLS
    // LAST path — doc 7 has no vector), the three tie-broken rank
    // windows, the round-9 RRF fuse, and both metric tails
    val rnd = new scala.util.Random(29)
    val vocab = ops.TextOps.EvalQueries.flatMap(t => Seq(t._2, t._3)) ++
      Seq("alpha", "beta", "gamma", "delta")
    val docs: Seq[(Long, String)] = (1L to 60L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(25))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val vecs: Map[Long, Array[Float]] = docs.map { case (id, _) =>
      val v = Array.fill(6)((rnd.nextInt(19) - 9).toFloat)
      v(rnd.nextInt(6)) = (rnd.nextInt(9) + 1).toFloat // never 0-vector
      id -> v
    }.toMap - 7L // one pool doc WITHOUT an embedding
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // sequential reference
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val nDocs = docs.size.toDouble
    val sumLen = toks.values.map(_.size).sum.toDouble
    val allTerms = vocab.take(12).toSet
    val tf: Map[(Long, String), Int] = toks.toSeq.flatMap { case (id, ts) =>
      ts.filter(allTerms).groupBy(identity).map { case (t, g) =>
        (id, t) -> g.size } }.toMap
    val df: Map[String, Int] = tf.keys.toSeq.groupBy(_._2)
      .map { case (t, ks) => t -> ks.size }
    val expected = ops.TextOps.EvalQueries.map { case (qid, t1, t2) =>
      val scored = docs.flatMap { case (id, _) =>
        val parts = Seq(t1, t2).flatMap { t =>
          tf.get((id, t)).map { f =>
            val idf = math.log((nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
            val norm = 1.2 * (0.25 + 0.75 *
              (toks(id).size.toLong * docs.size).toDouble / sumLen)
            idf * (f * 2.2) / (f + norm)
          }
        }
        if (parts.isEmpty) None
        else Some(id -> BigDecimal(parts.sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val bmRnk = scored.sortBy { case (id, s) => (-s, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val semRnk = scored.map { case (id, _) =>
        id -> vecs.get(id).map(v => cos6(vecs(qid), v)) }
        .sortBy { case (id, c) => (c.isEmpty, -c.getOrElse(0.0), id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val rrfRnk = scored.map { case (id, _) =>
        id -> round9(1.0 / (60 + bmRnk(id)) + 1.0 / (60 + semRnk(id))) }
        .sortBy { case (id, s) => (-s, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val rel = scored.map { case (id, _) =>
        id -> (" " + docs.find(_._1 == id).get._2 + " ")
          .contains(s" $t1 $t2 ") }.toMap
      val nRel = rel.values.count(identity).toLong
      def arm(rnk: Map[Long, Long]) = {
        val hits = rel.count { case (id, v) => v && rnk(id) <= 10L }.toLong
        val first = rel.collect { case (id, true) => rnk(id) }.minOption
        (hits.toDouble / 10.0,
          if (nRel > 0) Some(hits.toDouble / nRel.toDouble) else None,
          first.map(1.0 / _.toDouble).getOrElse(0.0))
      }
      (qid, nRel, arm(bmRnk), arm(rrfRnk))
    }
    import spark.implicits._
    val embDf = vecs.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val got = ops.TextOps.searchEvalHybridOn(
        docs.toDF("doc_id", "text"), embDf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          r.getDouble(4)),
        (r.getDouble(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)),
          r.getDouble(7)))).toSeq
    assert(got == expected,
      s"diff: ${expected.diff(got).take(2)} vs ${got.diff(expected).take(2)}")
    // non-vacuity on the random fixture: the two rankers must
    // actually disagree somewhere, else the fusion arm grades nothing
    assert(expected.exists(e => e._3._1 != e._4._1),
      "BM25 and RRF agree on P@10 for every query — the fusion arm " +
        "is vacuous on this fixture")
  }

  test("auto semantic verdict on random bucket frames == brute force") {
    // independent of SRP: the banding frames are RANDOM assignments,
    // and the reference recomputes candidates / counts / max cosine
    // sequentially — this grades the candidate join, the distinct,
    // the per-vector aggregate and the admit-reporting left join in
    // isolation from the hashing chain (which the known-vector and
    // oracle gates cover)
    val rnd = new scala.util.Random(41)
    val snapIds = (0L until 32L).toSeq
    val batchIds = (100L until 112L).toSeq
    val vecs: Map[Long, Array[Float]] = (snapIds ++ batchIds).map { id =>
      val v = Array.fill(4)((rnd.nextInt(19) - 9).toFloat)
      v(rnd.nextInt(4)) = (rnd.nextInt(9) + 1).toFloat // never the 0-vector
      id -> v
    }.toMap
    def randBuckets(ids: Seq[Long]) = ids.flatMap { id =>
      (0 until 5).map(b => (id, b.toLong, rnd.nextInt(4).toLong))
    }
    val sb = randBuckets(snapIds)
    val bb = randBuckets(batchIds)
    val threshold = 0.3
    val expected: Map[Long, (Long, Long, Option[Double])] =
      batchIds.map { b =>
        val myBuckets = bb.filter(_._1 == b).map(t => (t._2, t._3)).toSet
        val cands = sb.filter(t => myBuckets.contains((t._2, t._3)))
          .map(_._1).distinct
        val cos = cands.map(a => cos6(vecs(a), vecs(b)))
        b -> ((cands.size.toLong, cos.count(_ >= threshold).toLong,
          if (cos.isEmpty) None else Some(cos.max)))
      }.toMap
    import spark.implicits._
    val embDf = vecs.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val got = ops.DedupOps.semanticAppendAutoOn(embDf,
        batchIds.toDF("vec_id"),
        sb.toDF("vec_id", "band", "bucket"),
        bb.toDF("vec_id", "band", "bucket"), threshold)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got == expected,
      s"diff: ${(expected.toSet -- got.toSet).take(3)} vs ${(got.toSet -- expected.toSet).take(3)}")
    // non-vacuity of the random fixture: rejects AND zero-candidate
    // admits both occur
    assert(expected.values.exists(_._2 > 0L), "no random reject fired")
  }

  /** The exact arithmetic [[graft.functions.Vectors.cosine6]] performs:
    * left-to-right double accumulation of float-widened products,
    * dot/(|a|·|b|), then BigDecimal HALF_UP at scale 6 (Spark round). */
  private def cos6(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("MMR greedy on random embeddings == sequential reference") {
    val rnd = new scala.util.Random(99)
    val vecs: Seq[(Long, Array[Float])] =
      ((0L until 3L) ++ (10L until 40L)).map { id =>
        val v = Array.fill(4)((rnd.nextInt(21) - 10).toFloat)
        v(0) = (rnd.nextInt(10) + 1).toFloat // no zero vectors
        id -> v
      }
    val byId = vecs.toMap
    val queries = vecs.map(_._1).filter(_ < 8)
    val corpus = vecs.map(_._1).filter(_ >= 10)
    val expected = queries.flatMap { q =>
      val rel = corpus.map(n => n -> cos6(byId(q), byId(n)))
        .sortBy { case (n, r) => (-r, n) }
      var sel = List((q, 1L, rel.head._1, rel.head._2, rel.head._2))
      var remaining = rel.tail
      for (k <- 2 to 5 if remaining.nonEmpty) {
        val scored = remaining.map { case (n, r) =>
          val msim = sel.map(s => cos6(byId(n), byId(s._3))).max
          (n, r, r - msim)
        }
        val (n, r, m) = scored.minBy { case (n, _, m) => (-m, n) }
        sel = sel :+ ((q, k.toLong, n, r, m))
        remaining = remaining.filter(_._1 != n)
      }
      sel
    }.toSet
    val got = ops.SimilarityOps.mmrDiversifyOn(
      vecs.map { case (id, v) => (id, v) }.toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == expected,
      s"diff: ${(expected -- got).take(3)} vs ${(got -- expected).take(3)}")
  }

  test("forget apply on a random duplicate-dense corpus == sequential model") {
    val rnd = new scala.util.Random(5)
    val B = 1048576L
    val Off = 1000002L
    val docsSeq = (0L until 60L).map { id =>
      (id, (0 until 1 + rnd.nextInt(40))
        .map(_ => "w" + rnd.nextInt(6)).mkString(" "))
    }
    val df = docsSeq.toDF("doc_id", "text")
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    def sha(s: String): String = hex(
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")))
    def md5hex(s: String): String = hex(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")))
    // sequential model over corpus = docs ∪ (+Off copies of id%5==0)
    val corpus = docsSeq ++ docsSeq.filter(_._1 % 5 == 0)
      .map { case (id, t) => (id + Off, t) }
    def tomb(id: Long) = id % 4 == 0
    val postAll = corpus.flatMap { case (id, t) =>
      t.split(" ", -1).filter(_.nonEmpty).distinct.map(id -> _) }
    val postAfter = postAll.count(p => !tomb(p._1))
    val grp = corpus.groupBy { case (_, t) => sha(t.toLowerCase.trim) }
    val exRew = grp.toSeq.flatMap { case (h, members) =>
      val ids = members.map(_._1)
      val canon = ids.min
      val surv = ids.filter(!tomb(_))
      if (tomb(canon) && surv.nonEmpty) Some((h, canon, surv.min)) else None
    }
    val exVanish = grp.count { case (_, m) => m.forall(x => tomb(x._1)) }
    val blocks = corpus.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      (0 to (ws.length - 1) / 16).map { i =>
        (md5hex(ws.slice(i * 16, i * 16 + 16).mkString(" ")),
          id * B + i, tomb(id))
      }
    }
    val pgrp = blocks.groupBy(_._1)
    val paRew = pgrp.toSeq.flatMap { case (pk, ms) =>
      val win = ms.map(_._2).min
      val surv = ms.filter(!_._3).map(_._2)
      if (tomb(win / B) && surv.nonEmpty) Some((pk, win, surv.min)) else None
    }
    val paVanish = pgrp.count { case (_, ms) => ms.forall(_._3) }
    val expected = (Set(
      ("10_postings", "", postAll.size.toLong, postAfter.toLong),
      ("20_exact_clusters", "", grp.size.toLong,
        (grp.size - exVanish).toLong),
      ("40_para_clusters", "", pgrp.size.toLong,
        (pgrp.size - paVanish).toLong)) ++
      exRew.map { case (h, o, n) => ("30_exact_rewired", h, o, n) } ++
      paRew.map { case (p, o, n) => ("50_para_rewired", p, o, n) })
    // engine path: same artifact construction the planted spec uses
    val c = ops.DedupOps.forgetCorpusOn(df)
    val em = ops.DedupOps.forgetExactMembersOn(c)
    val eMap = em.groupBy(col("norm"))
      .agg(min(col("doc_id")).as("canonical"))
    val pm = ops.DedupOps.forgetParaMembersOn(c)
    val pw = pm.groupBy(col("pk")).agg(min(col("key")).as("winner"))
    val got = ops.DedupOps.forgetApplyOn(c,
      ops.DedupOps.forgetPostingsOn(c), em, eMap, pm, pw)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(exRew.nonEmpty && paRew.nonEmpty, "model must be non-vacuous")
    assert(got == expected,
      s"diff: ${(expected -- got).take(3)} vs ${(got -- expected).take(3)}")
  }

  test("KS statistic on random tied samples == sequential ECDF sweep") {
    val rnd = new scala.util.Random(31)
    // dense value collisions → live ties in the CDF and the argmax
    val rows = (1 to 400).map(_ =>
      (rnd.nextInt(40).toLong, if (rnd.nextBoolean()) "R" else "N"))
    val df = rows.toDF("v", "f")
    val n1 = rows.count(_._2 == "R").toLong
    val n2 = rows.count(_._2 == "N").toLong
    val expected = rows.map(_._1).distinct.sorted.map { v =>
      val c1 = rows.count(r => r._2 == "R" && r._1 <= v).toLong
      val c2 = rows.count(r => r._2 == "N" && r._1 <= v).toLong
      (math.abs(c1 * n2 - c2 * n1), v)
    }.maxBy { case (dn, v) => (dn, -v) } // max dn, tie → smallest v
    val r = ops.Analytics.ksTestOn(df).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((n1, n2)))
    assert((r.getLong(2), r.getLong(3)) == expected,
      s"got (${r.getLong(2)}, ${r.getLong(3)}), want $expected")
    val ks = BigDecimal(expected._1.toDouble / (n1 * n2).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == ks)
  }

  test("grid DBSCAN on random lattice points == sequential model") {
    val rnd = new scala.util.Random(77)
    // clumpy points on a small lattice → real clusters, borders, noise
    val pts = (1 to 250).map { i =>
      val cx = rnd.nextInt(12).toLong * 4
      (i.toLong, cx + rnd.nextInt(3), rnd.nextInt(8).toLong)
    }
    val df = pts.toDF("rec_id", "lat10", "lon10")
    // sequential model: cell pops → Chebyshev-1 mass → core cells →
    // BFS components (min-cell-id label) → border/noise
    val cells = pts.groupBy(p => (p._2, p._3)).view.mapValues(_.size).toMap
    def nbrs(c: (Long, Long)) = for {
      da <- -1L to 1L; db <- -1L to 1L
    } yield (c._1 + da, c._2 + db)
    def mass(c: (Long, Long)) = nbrs(c).map(cells.getOrElse(_, 0)).sum
    val core = cells.keySet.filter(mass(_) >= 3)
    def cid(c: (Long, Long)) = c._1 * 3600 + c._2
    var labels = core.map(c => c -> cid(c)).toMap
    var changed = true
    while (changed) {
      changed = false
      for (c <- core; n <- nbrs(c) if core(n) && labels(n) < labels(c)) {
        labels = labels.updated(c, labels(n)); changed = true
      }
    }
    val expected = pts.map { case (id, la, lo) =>
      val c = (la, lo)
      id -> (if (core(c)) ("core", labels(c))
      else {
        val coreNbrs = nbrs(c).filter(n => n != c && core(n))
        if (coreNbrs.nonEmpty) ("border", coreNbrs.map(labels).min)
        else ("noise", -1L)
      })
    }.toMap
    val got = ops.Analytics.geoDbscanOn(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(expected.values.map(_._1).toSet ==
      Set("core", "border", "noise"), "random model must be non-vacuous")
    assert(got == expected,
      s"diff: ${(expected.toSet -- got.toSet).take(3)} vs ${(got.toSet -- expected.toSet).take(3)}")
  }

  test("ppl tertiles on a random corpus == sequential scoring model") {
    val rnd = new scala.util.Random(21)
    val langs = Array("aa", "bb", "cc")
    val docsSeq = (0L until 80L).map { id =>
      (id, "s0",
        (0 until rnd.nextInt(12)).map(_ => "w" + rnd.nextInt(5)).mkString(" "),
        langs(rnd.nextInt(3)))
    }
    val df = docsSeq.toDF("doc_id", "source", "text", "lang")
    // model: integer-exact bigram LM over the whole corpus
    val toks = docsSeq.map { case (id, _, t, l) =>
      (id, l, t.split(" ", -1).filter(_.nonEmpty).toSeq) }
    val scoreable = toks.filter(_._3.length >= 2)
    val bgs = scoreable.flatMap { case (id, l, ts) =>
      ts.sliding(2).map(p => (id, l, p.head, p.head + " " + p(1))).toSeq }
    val c2 = bgs.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val c1 = bgs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val v = scoreable.flatMap(_._3).distinct.size.toLong
    def bitlen(q: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(q)
    val scored = scoreable.map { case (id, l, ts) =>
      val sps = ts.sliding(2).map { p =>
        bitlen((c1(p.head) + v) / (c2(p.head + " " + p(1)) + 1)) }.toSeq
      val avg = BigDecimal(sps.sum.toDouble / sps.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, l, sps.length.toLong, avg)
    }
    val expected = scored.groupBy(_._2).toSeq.flatMap { case (l, rows) =>
      val ranked = rows.sortBy(r => (r._4, r._1)).zipWithIndex
      val n = rows.length
      ranked.map { case ((id, _, nb, avg), i) =>
        (l, i.toLong * 3 / n + 1, id, nb, avg) }
    }.groupBy(r => (r._1, r._2)).map { case ((l, tile), rows) =>
      (l, tile, rows.size.toLong, rows.map(_._4).sum,
        rows.map(_._5).min, rows.map(_._5).max)
    }.toSet
    val got = ops.TextOps.pplBucketsOn(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(got == expected,
      s"diff: ${(expected -- got).take(3)} vs ${(got -- expected).take(3)}")
  }

  test("index append on random split corpora == sequential full rebuild") {
    val rnd = new scala.util.Random(61)
    // 'vector' is held OUT of the random vocab and planted into one
    // batch doc only, so a query term with NO base-side df row is
    // always exercised (the union-merge's missing side)
    val vocab = (ops.TextOps.EvalQueries.flatMap(t => Seq(t._2, t._3)) ++
      Seq("alpha", "beta", "gamma")).filterNot(_ == "vector")
    val docs: Seq[(Long, String)] = (1L to 80L).map { id =>
      val body = Seq.fill(2 + rnd.nextInt(20))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      id -> (if (id == 28L) body + " vector vector" else body)
    }
    val allTerms = ops.TextOps.EvalQueries
      .flatMap(t => Seq(t._2, t._3)).distinct
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val base = docs.filter(_._1 % 10 < 8)
    val batch = docs.filter(_._1 % 10 >= 8)
    // frozen-side inputs computed SEQUENTIALLY (not by the engine):
    // full-vocab df over base + the (n, suml) header
    val dfBase: Map[String, Long] = base.flatMap { case (id, _) =>
      toks(id).distinct }.groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    val nBase = base.size.toLong
    val sumlBase = base.map { case (id, _) => toks(id).size.toLong }.sum
    // sequential reference: FULL-corpus stats (df/N/ΣL over
    // base+batch in one pass), score batch docs, rank, top-10 —
    // merged ≡ rebuilt is the judged property
    val nDocs = docs.size.toLong
    val sumLen = docs.map { case (id, _) => toks(id).size.toLong }.sum
    val tfB: Map[(Long, String), Int] = batch.flatMap { case (id, _) =>
      toks(id).filter(allTerms.contains).groupBy(identity)
        .map { case (t, g) => (id, t) -> g.size } }.toMap
    val dfFull: Map[String, Long] = docs.flatMap { case (id, _) =>
      toks(id).distinct.filter(allTerms.contains) }.groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    val expected = ops.TextOps.EvalQueries.flatMap { case (qid, t1, t2) =>
      val scored = batch.flatMap { case (id, _) =>
        val parts = Seq(t1, t2).flatMap { t =>
          tfB.get((id, t)).map { f =>
            val df = dfFull(t).toDouble
            val idf = math.log((nDocs.toDouble - df + 0.5) /
              (df + 0.5) + 1.0)
            val norm = 1.2 * (0.25 + 0.75 *
              (toks(id).size.toLong * nDocs).toDouble / sumLen.toDouble)
            (idf * (f * 2.2) / (f + norm), f.toLong)
          }
        }
        if (parts.isEmpty) None
        else Some((id, toks(id).size,
          BigDecimal(parts.map(_._1).sum)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          parts.map(_._2).sum))
      }
      scored.sortBy { case (id, _, s, _) => (-s, id) }.take(10)
        .zipWithIndex.map { case ((id, len, s, tft), i) =>
          (qid, (i + 1).toLong, id, len, tft, s) }
    }.sortBy(t => (t._1, t._2))
    val dfSnap = dfBase.toSeq.toDF("term", "df")
    val statsSnap = Seq((nBase, sumlBase)).toDF("n", "suml")
    val qts = ops.TextOps.EvalQueries
      .flatMap { case (id, a, b) => Seq((id, a), (id, b)) }
      .toDF("query_id", "term")
    val got = ops.TextOps.searchIndexAppendOn(dfSnap, statsSnap,
        batch.toDF("doc_id", "text"), qts, allTerms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected,
      s"diff: ${expected.diff(got).take(2)} vs ${got.diff(expected).take(2)}")
    // non-vacuity: some scored term must be missing from the base
    // vocabulary (df_base absent → the union-merge's missing side)
    val batchOnly = allTerms.filter(t =>
      !dfBase.contains(t) && tfB.keys.exists(_._2 == t))
    assert(batchOnly.nonEmpty,
      "fixture never exercises a batch-only term — reseed")
  }

  test("t-closeness EMD on random classes == sequential reference") {
    val rnd = new scala.util.Random(17)
    // balances cross zero so band −1 (floor semantics on negatives)
    // is exercised; class sizes vary; some classes hug one tail
    val rows: Seq[(Int, String, Double)] = (1 to 400).map { _ =>
      val nk = rnd.nextInt(5)
      val seg = s"S${rnd.nextInt(3)}"
      val bal = (rnd.nextInt(8000) - 1000) +
        (if (nk == 0) 0 else nk * 700) + rnd.nextDouble()
      (nk, seg, math.floor(bal * 100) / 100)
    }
    val band = (b: Double) => math.floor(b / 1000.0).toLong
    val globalBands = rows.map(r => band(r._3)).distinct.sorted
    val m = globalBands.size
    val n = rows.size.toLong
    val gcum: Map[Long, Long] = {
      var acc = 0L
      globalBands.map { b =>
        acc += rows.count(r => band(r._3) == b); b -> acc }.toMap
    }
    val expected = rows.groupBy(r => (r._1, r._2)).toSeq.map {
      case ((nk, seg), cls) =>
        val nc = cls.size.toLong
        var acc = 0L
        val num = globalBands.map { b =>
          acc += cls.count(r => band(r._3) == b)
          math.abs(acc * n - gcum(b) * nc)
        }.sum
        val emd = BigDecimal(num.toDouble /
          (nc.toDouble * n.toDouble * (m - 1).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (nk, seg, nc, emd, emd <= 0.05)
    }.sortBy(t => (t._1, t._2))
    val got = ops.EtlParity.tClosenessOn(
        rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == expected,
      s"diff: ${expected.diff(got).take(2)} vs ${got.diff(expected).take(2)}")
    // both verdicts must occur or the threshold arm grades a constant
    assert(expected.exists(_._5) && expected.exists(!_._5),
      "single-sided verdict fixture — reseed")
  }

  test("video near-dup on random hash frames == sequential model") {
    val rnd = new scala.util.Random(83)
    // small hash space → dense sharing; a few hashes exceed the
    // 64-source cap; singleton videos must vanish from the output
    val frames: Seq[(String, Long)] = (1 to 90).map(i => f"v$i%02d")
      .flatMap { src =>
        Seq.fill(15 + rnd.nextInt(25))(
          (src, (rnd.nextInt(60) + 1).toLong)) :+
          ((src, 777L)) // the boilerplate frame everyone shares
      }
    val ds = frames.distinct
    val sizes = ds.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val capped = ds.groupBy(_._2).toSeq.flatMap { case (h, g) =>
      g.map(_._1).distinct.sorted.take(64).map(s => (s, h)) }
    val shared = (for {
      (sa, h) <- capped; (sb, h2) <- capped
      if h == h2 && sa < sb
    } yield ((sa, sb), 1)).groupBy(_._1)
      .map { case (p, g) => p -> g.size.toLong }
    val expected = shared.toSeq.map { case ((sa, sb), c) =>
      val (na, nb) = (sizes(sa), sizes(sb))
      val jac = BigDecimal(c.toDouble / (na + nb - c).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (sa, sb, c, na, nb, jac,
        if (jac >= 0.03) "neardup" else "distinct")
    }.sortBy(t => (t._1, t._2))
    val got = ops.MultimodalOps.videoNearDupOn(
        frames.toDF("source", "dhash"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getString(6)))
      .toSeq
    assert(got == expected,
      s"diff: ${expected.diff(got).take(2)} vs ${got.diff(expected).take(2)}")
    // both verdicts must occur, and the cap must actually bite:
    // 777 is shared by 90 > 64 sources, so an UNCAPPED pair count
    // must differ from the capped model's on some pair
    assert(expected.exists(_._7 == "neardup") &&
      expected.exists(_._7 == "distinct"))
    val uncappedShared = (for {
      (sa, h) <- ds; (sb, h2) <- ds
      if h == h2 && sa < sb
    } yield ((sa, sb), 1)).groupBy(_._1)
      .map { case (p, g) => p -> g.size.toLong }
    assert(uncappedShared != shared,
      "cap never bit — the boilerplate-hash guard grades nothing")
  }

  test("audio ingest gate on random fingerprints == sequential model") {
    val rnd = new scala.util.Random(37)
    val nfs = Seq(8L, 12L, 16L)
    def blocks(afp: Long, nf: Long): Seq[(Int, Long)] = {
      val bw = ((nf - 1 + 3) / 4).toInt
      (0 until 4).map(b => b -> ((afp >>> (b * bw)) & ((1L << bw) - 1)))
    }
    // random families + random batch probes in a SMALL bit space so
    // near-collisions are dense
    val fams = (1 to 60).map { i =>
      val nf = nfs(rnd.nextInt(3))
      (nf, rnd.nextLong() & ((1L << (nf - 1).toInt) - 1), i.toLong)
    }.distinct
    val frozen = fams.flatMap { case (nf, afp, kid) =>
      blocks(afp, nf).map { case (blk, v) => (nf, blk, v, afp, kid) } }
      // the engine's frozen side is bucket-capped upstream; replay
      // the same keep-lowest rule at cap 32 per (nf, blk, val)
      .groupBy(t => (t._1, t._2, t._3))
      .toSeq.flatMap { case (_, g) => g.sortBy(_._5).take(32) }
    val batch = (1 to 40).map { i =>
      val nf = nfs(rnd.nextInt(3))
      (100L + i, nf, rnd.nextLong() & ((1L << (nf - 1).toInt) - 1))
    }
    val expected = batch.map { case (mid, nf, afp) =>
      val bb = blocks(afp, nf).toSet
      val cands = frozen.filter { case (fnf, blk, v, _, _) =>
        fnf == nf && bb.contains((blk, v)) }
        .map { case (_, _, _, fafp, kid) => (fafp, kid) }.distinct
      val hams = cands.map { case (fafp, _) =>
        java.lang.Long.bitCount(afp ^ fafp).toLong }
      val nd = hams.count(_ <= 3L).toLong
      (mid, cands.size.toLong, nd,
        if (hams.isEmpty) None else Some(hams.min),
        if (nd > 0) "reject" else "admit")
    }.sortBy(_._1)
    val got = ops.MultimodalOps.audioAppendOn(
        frozen.toDF("nf", "blk", "val", "fam_afp", "keep_id"),
        batch.toDF("media_id", "nf", "afp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getString(4))).toSeq
    assert(got == expected,
      s"diff: ${expected.diff(got).take(2)} vs ${got.diff(expected).take(2)}")
    assert(expected.exists(_._5 == "reject") &&
      expected.exists(_._5 == "admit"),
      "single-sided verdict fixture — reseed")
  }

  test("LPA + modularity on random graphs == sequential model") {
    val rnd = new scala.util.Random(29)
    // a planted 3-community graph with random cross-community noise
    // edges — communities must be findable but imperfect
    val comm = (0L until 30L).map(v => v -> (v / 10L)).toMap
    val undirected = scala.collection.mutable.Set[(Long, Long)]()
    for (c <- 0 to 2; _ <- 1 to 40) {
      val a = c * 10 + rnd.nextInt(10); val b = c * 10 + rnd.nextInt(10)
      if (a != b) undirected += ((math.min(a, b).toLong, math.max(a, b).toLong))
    }
    for (_ <- 1 to 8) {
      val a = rnd.nextInt(30); val b = rnd.nextInt(30)
      if (a != b && comm(a) != comm(b))
        undirected += ((math.min(a, b).toLong, math.max(a, b).toLong))
    }
    val sym = undirected.toSeq.flatMap(e => Seq(e, e.swap))
    val nbrs: Map[Long, Seq[Long]] = sym.groupBy(_._2)
      .map { case (d, es) => d -> es.map(_._1) }
    // sequential synchronous LPA, same iteration count and the
    // (count desc, label asc) tie-break
    var labels: Map[Long, Long] = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to ops.Analytics.LpaIters) {
      labels = nbrs.map { case (v, ns) =>
        val counts = ns.map(labels).groupBy(identity)
          .map { case (l, g) => l -> g.size }
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val e = sym.size.toLong
    val byComm = labels.groupBy(_._2)
    val num = byComm.map { case (lab, members) =>
      val nodes = members.keySet
      val intra = sym.count { case (s, d) =>
        nodes.contains(s) && labels(d) == lab }
      // .toSeq before mapping: Map#keys is set-like, and mapping it
      // straight to degree values DEDUPLICATES equal degrees before
      // the sum (caught by the engine disagreeing — the engine was
      // right)
      val dsum = members.keys.toSeq.map(v => nbrs(v).size.toLong).sum
      intra * e - dsum * dsum
    }.sum
    val expected = (labels.size.toLong, byComm.size.toLong, e / 2,
      BigDecimal(num.toDouble / (e.toDouble * e.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val edges = sym.toDF("src", "dst")
    val gotLabels = ops.Analytics.lpaLabelsOn(edges)
    val lmap = gotLabels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lmap == labels, s"LPA labeling diverges: " +
      s"${labels.toSet.diff(lmap.toSet).take(3)}")
    val got = ops.Analytics.modularityOn(edges, gotLabels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).head
    assert(got == expected, s"modularity diverges: $got vs $expected")
    // the noise edges must leave Q strictly between 0 and the
    // perfect-3-community bound, or the fixture grades a constant
    assert(expected._4 > 0.0 && expected._4 < 0.67)
    assert(expected._2 >= 2, "LPA collapsed to one community — reseed")
  }
}
