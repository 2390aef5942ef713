package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input sweep: every parameterized operator core must
  * handle an EMPTY corpus, an empty-text document, and a one-token
  * document without throwing — returning an empty or sane frame.
  *
  * This failure class is real in this codebase's history: Spark's
  * `sequence(1, stop)` THROWS on a negative span where DuckDB's
  * `range` returns empty (the shingles() inclusive-stop fix, caught in
  * review), and `array_sort`/window/aggregate edge cases differ
  * between engines precisely on degenerate rows. A 100 TB pipeline
  * always contains empty and near-empty documents; crashing the job
  * on them is not an option.
  */
class DegenerateInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String, String, Long)])
      : DataFrame =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  private val emptyDocs = docs(Nil)
  private val edgeDocs = docs(Seq(
    (1L, "", "en", "s1", 0L),          // empty text
    (2L, "one", "en", "s1", 3L),       // single token
    (3L, " ", "en", "s2", 1L)))        // whitespace only

  private val docCores: Seq[(String, DataFrame => DataFrame)] = Seq(
    "incrementalOn" -> ops.DedupOps.incrementalOn,
    "corpusDiffOn" -> ops.DedupOps.corpusDiffOn,
    "substringDedupOn" -> ops.DedupOps.substringDedupOn,
    "contaminationOn" -> ops.DedupOps.contaminationOn,
    "minhashLshOn" -> ((d: DataFrame) => ops.DedupOps.minhashLshOn(d)),
    "simhashNearDupOn" -> ((d: DataFrame) => ops.DedupOps.simhashNearDupOn(d)),
    "winnowNearDupOn" ->
      ((d: DataFrame) => ops.DedupOps.winnowNearDupOn(spark, d)),
    "bloomIncrementalOn" ->
      ((d: DataFrame) => ops.DedupOps.bloomIncrementalOn(d)),
    "repetitionOn" -> ops.TextOps.repetitionOn,
    "oovRateOn" -> ops.TextOps.oovRateOn,
    "dupNgramsOn" -> ops.TextOps.dupNgramsOn,
    "corpusMixOn" -> ops.TextOps.corpusMixOn,
    "corpusCleanOn" -> ops.TextOps.corpusCleanOn,
    "lmScoreOn" -> ops.TextOps.lmScoreOn,
    "packSequencesOn" ->
      ((d: DataFrame) => ops.TextOps.packSequencesOn(d, budget = 64)),
    "corpusShuffleOn" ->
      ((d: DataFrame) => ops.TextOps.corpusShuffleOn(d, seed = 1L)),
    "tfidfTopkOn" -> ops.TextOps.tfidfTopkOn,
    "textChunksOn" -> ops.TextOps.textChunksOn,
    "corpusOverlapOn" -> ops.TextOps.corpusOverlapOn,
    "jaccardPrefixPairsOn" -> ((d: DataFrame) =>
      ops.DedupOps.jaccardPrefixPairsOn(d.select(
        org.apache.spark.sql.functions.col("doc_id"),
        ops.DedupOps.shingles(
          org.apache.spark.sql.functions.col("text")).as("sh")))),
    "pplBucketsOn" -> ops.TextOps.pplBucketsOn,
    "forgetApplyOn" -> ((d: DataFrame) => {
      import org.apache.spark.sql.functions.{col, min}
      val corpus = ops.DedupOps.forgetCorpusOn(d)
      val em = ops.DedupOps.forgetExactMembersOn(corpus)
      val eMap = em.groupBy(col("norm"))
        .agg(min(col("doc_id")).as("canonical"))
      val pm = ops.DedupOps.forgetParaMembersOn(corpus)
      val pw = pm.groupBy(col("pk")).agg(min(col("key")).as("winner"))
      ops.DedupOps.forgetApplyOn(corpus,
        ops.DedupOps.forgetPostingsOn(corpus), em, eMap, pm, pw)
    }),
  )

  test("document cores survive an empty corpus") {
    docCores.foreach { case (name, fn) =>
      val n = try fn(emptyDocs).count() catch {
        case e: Throwable => fail(s"$name threw on EMPTY input: $e")
      }
      assert(n >= 0, name)
    }
  }

  test("document cores survive empty-text / one-token / whitespace docs") {
    docCores.foreach { case (name, fn) =>
      val n = try fn(edgeDocs).count() catch {
        case e: Throwable => fail(s"$name threw on edge docs: $e")
      }
      assert(n >= 0, name)
    }
  }

  private def emb(rows: Seq[(Long, Seq[Float], Int)]): DataFrame =
    rows.toDF("vec_id", "embedding", "label")

  test("embedding cores survive empty and single-vector inputs") {
    val cores: Seq[(String, DataFrame => DataFrame)] = Seq(
      "thresholdJoinOn" ->
        ((d: DataFrame) => ops.SimilarityOps.thresholdJoinOn(d, 0.9)),
      "centroidDriftOn" -> ops.SimilarityOps.centroidDriftOn,
      "mmrDiversifyOn" -> ops.SimilarityOps.mmrDiversifyOn,
      "semanticAppendOn" -> ((d: DataFrame) => {
        import org.apache.spark.sql.functions.col
        ops.DedupOps.semanticAppendOn(d,
          ops.SimilarityOps.srpBandsFrame(
            d.filter(col("vec_id") % 10 < 8), 8, 64, 42L),
          ops.SimilarityOps.srpBandsFrame(
            d.filter(col("vec_id") % 10 >= 8), 8, 64, 42L), 0.4)
      }),
      "semanticAppendAutoOn" -> ((d: DataFrame) => {
        import org.apache.spark.sql.functions.col
        ops.DedupOps.semanticAppendAutoOn(d,
          d.filter(col("vec_id") % 10 >= 8),
          ops.SimilarityOps.srpBandsFrame(
            d.filter(col("vec_id") % 10 < 8), 4, 6, 42L),
          ops.SimilarityOps.srpBandsFrame(
            d.filter(col("vec_id") % 10 >= 8), 4, 6, 42L),
          ops.DedupOps.SemAutoThreshold)
      }),
    )
    val single = emb(Seq((7L, Seq.fill(64)(0.25f), 0)))
    cores.foreach { case (name, fn) =>
      assert(fn(emb(Nil)).count() >= 0, s"$name on empty")
      assert(fn(single).count() >= 0, s"$name on single vector")
    }
  }

  test("fuzzy-join core survives empty, single, and empty-string names") {
    import org.apache.spark.sql.functions.col
    def names(ws: Seq[String]) = ws.toDF("w")
    assert(ops.DedupOps.fuzzyJoinEdit1On(names(Nil)).count() == 0)
    assert(ops.DedupOps.fuzzyJoinEdit1On(names(Seq("solo"))).count() == 0)
    // empty strings stay in (matching the all-pairs oracle) but must
    // not reach sequence(1, 0) deletion generation
    val got = ops.DedupOps.fuzzyJoinEdit1On(names(Seq("", "ab", "ac")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("ab", "ac")))
    // ("", one-char) sits at distance 1 and must be FOUND, via the
    // one-char word's deletion variant = the empty word's identity
    val withEmpty = ops.DedupOps.fuzzyJoinEdit1On(names(Seq("", "x")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(withEmpty.toSeq == Seq(("", "x")))
  }

  test("pagerank core survives empty and single-edge graphs") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ops.Analytics.pagerankOn(empty).count() == 0)
    // one undirected edge = two directed rows; both nodes rank equally
    val pair = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = ops.Analytics.pagerankOn(pair).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 2)
    assert(got.map(_._2).distinct.length == 1,
      "symmetric 2-node graph must rank both nodes equally")
  }

  test("triangle core: known graphs count exactly; empty graph survives") {
    def sym(e: Seq[(Long, Long)]) =
      (e ++ e.map(_.swap)).toDF("src", "dst")
    // K4: 4 triangles, 6 edges, every node degree 3 -> 12 wedges,
    // global cc = 3*4/12 = 1.0
    val k4 = sym(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
    val r = ops.Analytics.trianglesOn(k4).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 6L, 12L, 4L)))
    assert(r.getDouble(4) === 1.0)
    // square (4-cycle): 4 wedges, zero triangles, cc 0
    val sq = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    val rs = ops.Analytics.trianglesOn(sq).head()
    assert(rs.getLong(3) === 0L && rs.getLong(2) === 4L)
    assert(rs.getDouble(4) === 0.0)
    // hub star (one high-degree node): wedges but no triangles — the
    // orientation must not blow up or miscount around the hub
    val star = sym((2L to 9L).map(i => (1L, i)))
    val rst = ops.Analytics.trianglesOn(star).head()
    assert(rst.getLong(3) === 0L && rst.getLong(2) === 28L)
    // empty graph: zeros and a NULL coefficient, no division crash
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val re = ops.Analytics.trianglesOn(empty).head()
    assert(re.getLong(0) === 0L && re.getLong(3) === 0L && re.isNullAt(4))
  }

  test("bfs core: known graphs level exactly; empty graph survives") {
    def sym(e: Seq[(Long, Long)]) =
      (e ++ e.map(_.swap)).toDF("src", "dst")
    // path 1-2-3-4-5-6-7: seeds are the 5 lowest ids (1..5, all at
    // dist 0); 6 is 1 hop from seed 5, 7 is 2 hops via 6 — histogram
    // {0: 5, 1: 1, 2: 1}
    val path = sym((1L to 6L).map(i => (i, i + 1)))
    val got = ops.Analytics.bfsOn(path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 5L), (1L, 1L), (2L, 1L)))
    // two components: the 5 lowest ids (1, 2, 3, 10, 11) are all
    // seeds, the far pair (20, 21) is unreachable -> dist -1
    val split = sym(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)))
    val g2 = ops.Analytics.bfsOn(split).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(g2(-1L) === 2L, s"far pair must be unreached: $g2")
    assert(g2(0L) === 5L, s"five seeds at dist 0: $g2")
    // long path: node 10 is 5 hops from the nearest seed (5) — beyond
    // the 4-hop bound, so it reports -1, not 5
    val long = sym((1L to 9L).map(i => (i, i + 1)))
    val g3 = ops.Analytics.bfsOn(long).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(g3(-1L) === 1L && g3(4L) === 1L, s"4-hop cutoff: $g3")
    // empty graph: empty histogram, no crash
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ops.Analytics.bfsOn(empty).count() === 0L)
  }

  test("containment: prefix-in-doc caught where symmetric Jaccard scores low") {
    import org.apache.spark.sql.functions.col
    val big = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8)
      .trim
    val prefix = big.substring(0, 120) // every shingle anchor lands inside
    val other = "unrelated words that share no character shingles with " +
      "either document in this tiny corpus whatsoever"
    val docs = Seq((1L, big), (2L, prefix), (3L, other))
      .toDF("doc_id", "text")
    val got = ops.DedupOps.containmentOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the prefix is contained in the full doc; the asymmetric measure
    // divides by |A| and flags it — Jaccard divides by the union and
    // scores the same pair low (that is the primitive's point)
    assert(got === Seq((2L, 1L)), s"got $got")
    val jac = docs.filter(col("doc_id") < 3L)
      .agg(org.apache.spark.sql.functions.collect_list(
        ops.DedupOps.shingles(col("text")))).head.getSeq[Seq[String]](0)
    val (a, b) = (jac(0).toSet, jac(1).toSet)
    val j = (a & b).size.toDouble / (a | b).size
    assert(j < 0.5, s"fixture not asymmetric enough: jaccard $j")
    // empty corpus survives
    assert(ops.DedupOps.containmentOn(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).count() === 0L)
  }

  test("temperature mix: exact weights on perfect squares; empty survives") {
    // token counts 4 and 9 -> w = sqrt(4e8) = 20000, sqrt(9e8) = 30000:
    // p = 0.4 / 0.6 EXACTLY, epochs = 0.4*13/4 = 1.3 and 0.6*13/9
    val docs = Seq(
      (1L, "a b c d", "s1"),
      (2L, "a b c d e f g h i", "s2"))
      .toDF("doc_id", "text", "source")
    val got = ops.TextOps.temperatureMixOn(docs).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got === Seq(("s1", 4L, 0.4, 1.3), ("s2", 9L, 0.6, 0.866667)))
    // a NON-square count exercises the isqrt lattice correction:
    // isqrt(5e8) = 22360 (22360^2 = 499969600 <= 5e8 < 22361^2)
    val ns = Seq((1L, "a b c d e", "s1")).toDF("doc_id", "text", "source")
    val solo = ops.TextOps.temperatureMixOn(ns).collect()
    assert(solo.head.getDouble(3) === 1.0 && solo.head.getDouble(4) === 1.0)
    // empty corpus: empty mixture, no crash
    val empty = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(ops.TextOps.temperatureMixOn(empty).count() === 0L)
  }

  test("quantile grade tail survives an empty sketch frame") {
    import org.apache.spark.sql.functions.col
    val monthly = Seq.empty[(java.sql.Timestamp, Array[Byte])]
      .toDF("month", "sk")
      .withColumn("month", col("month").cast("timestamp_ntz"))
    val orders = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    assert(ops.OlapOps.quantileGradeFromMonthly(monthly, orders).count() == 0)
  }

  test("mg sketch aggregator yields no rows for an empty frame") {
    import org.apache.spark.sql.functions._
    val build = udaf(new graft.functions.MGSketchAgg(4))
    val empty = Seq.empty[(String, String)].toDF("g", "k")
    assert(empty.groupBy(col("g")).agg(build(col("k"))).count() == 0)
    // null keys are skipped, not NPEs
    val withNulls = Seq(("a", null: String), ("a", "x")).toDF("g", "k")
    val bytes = withNulls.groupBy(col("g")).agg(build(col("k")).as("sk"))
      .collect().head.getAs[Array[Byte]](1)
    val sk = graft.functions.MGSketch.deserialize(bytes)
    assert(sk.n == 1L && sk.counters.toMap == Map("x" -> 1L))
  }

  test("gapfill core survives empty input and single-event users") {
    import org.apache.spark.sql.functions.col
    val empty = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    assert(ops.EventOps.gapfillOn(empty).count() == 0)
    val one = Seq((5L, java.sql.Timestamp.valueOf("2024-01-02 03:04:05"), 2.5))
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val rows = ops.EventOps.gapfillOn(one).collect()
    // mn == mx → exactly one scaffold slot, known, not interpolated
    assert(rows.length == 1 && !rows(0).getBoolean(3) &&
      rows(0).getDouble(2) == 2.5)
  }
}
