package graft.ops

import graft.Tables
import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.7 X3):
  * brute-force cosine top-k as the exact baseline, an exact threshold
  * self-join plus its SRP-LSH bucketed scale path, and an IVF-style
  * partitioned variant as the top-k scale path.
  *
  * Scale design: the query/centroid side is always the small side and
  * is explicitly `broadcast()` — the big side streams through in one
  * scan with no shuffle until the final per-query top-k window (which
  * shuffles only |queries|·|candidates-per-query| rows after the
  * in-partition filter). IVF replaces the all-pairs scan with
  * centroid-bucketed search: cluster once via a map-side argmax over
  * the (bounded, driver-known) centroid array — zero shuffle — then
  * search only matching clusters.
  */
object SimilarityOps {

  /** Exact brute-force top-5 neighbors for each of the 10 query
    * vectors (vec_id < 10) — the oracle-able ANN baseline. */
  def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        Vectors.normCol(col("embedding")).as("qn"))
    val v = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ve"),
        Vectors.normCol(col("embedding")).as("vn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    v.crossJoin(broadcast(q))
      .withColumn("cosine",
        Vectors.cosine6WithNorms(col("qe"), col("qn"), col("ve"), col("vn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  private[graft] val MmrShortlist = 50
  private[graft] val MmrK = 5

  /** MMR RESULT DIVERSIFICATION (`sim_mmr_diversify`) — Maximal
    * Marginal Relevance (Carbonell & Goldstein, SIGIR'98), the
    * standard RAG re-ranking step between retrieval and the context
    * window: from each query's exact top-[[MmrShortlist]] shortlist,
    * greedily select [[MmrK]] results maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` with λ = 1/2 — scaled by
    * 2 to `rel − maxsim` (a monotone transform, same argmax, no 0.5
    * multiplications whose rounding could diverge). All cosines are
    * the round-6 cross-engine primitive; the greedy comparisons are
    * IEEE subtractions of identical rounded doubles, so both engines
    * order identically (ties → smallest neighbor_id).
    *
    * Scale shape: the shortlist stage is the [[cosineTopK]] scan
    * (bounded query side broadcast, corpus-linear, per-query top-k
    * window) and the intra-shortlist pair sims are ONE k-bounded
    * self-join on the pinned shortlist — both distributed. The
    * greedy selection itself runs DRIVER-SIDE over the collected
    * |q|·k relevance rows and |q|·k² sim rows (bounded by
    * CONSTRUCTION, independent of corpus size — the 16-centroid /
    * 256-histogram collect class): that is how a serving system
    * re-ranks (in the server, after retrieval), and it replaces
    * [[MmrK]]−1 rounds of tiny shuffle stages (measured 5.2 s of
    * pure stage-dispatch overhead at sf0.1) with microseconds of
    * exact arithmetic on the same round-6 doubles the oracle uses. */
  def mmrDiversify(s: SparkSession, d: String): DataFrame =
    mmrDiversifyOn(Tables.embeddings(s, d))

  /** Core of [[mmrDiversify]], parameterized for the planted spec. */
  private[graft] def mmrDiversifyOn(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val q = e.filter(col("vec_id") < NswQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        Vectors.normCol(col("embedding")).as("qn"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ve"),
        Vectors.normCol(col("embedding")).as("vn"))
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("neighbor_id"))
    // ONE corpus scan: the shortlist (with embeddings) pins, the
    // pair-sim self-join reads the pin
    val short = c.crossJoin(broadcast(q))
      .withColumn("rel",
        Vectors.cosine6WithNorms(col("qe"), col("qn"), col("ve"), col("vn")))
      .withColumn("rn", row_number().over(wRel))
      .filter(col("rn") <= MmrShortlist)
      .select(col("query_id"), col("neighbor_id"), col("rel"),
        col("ve"), col("vn"))
      .localCheckpoint(true) // |q|·k rows — bounded by construction
    val ps = short.as("a").join(short.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.neighbor_id") =!= col("b.neighbor_id"))
      .select(col("a.query_id").as("query_id"),
        col("a.neighbor_id").as("d"), col("b.neighbor_id").as("s2"),
        Vectors.cosine6WithNorms(col("a.ve"), col("a.vn"),
          col("b.ve"), col("b.vn")).as("sim"))
    // bounded collects: |q|·k rels, |q|·k² sims (corpus-independent)
    val rels = short.select(col("query_id"), col("neighbor_id"),
        col("rel")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sims = ps.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        r.getDouble(3))).toMap
    val out = rels.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      val cands = rows.map(r => (r._2, r._3))
        .sortBy { case (nid, rel) => (-rel, nid) }
      val sel = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, Double, Double)] // (q, rank, nid, rel, mmr)
      val remaining = scala.collection.mutable.LinkedHashSet(cands: _*)
      cands.headOption.foreach { case (nid, rel) =>
        sel += ((qid, 1L, nid, rel, rel)); remaining.remove((nid, rel))
      }
      for (k <- 2 to MmrK if remaining.nonEmpty) {
        // argmax of rel − max_{s∈S} sim, ties → smallest neighbor_id;
        // pure IEEE subtraction/compare of the round-6 doubles the
        // oracle replays — engine-identical by construction
        val scoredC = remaining.toSeq.map { case (nid, rel) =>
          val msim = sel.map(s => sims((qid, nid, s._3))).max
          (nid, rel, rel - msim)
        }
        val (nid, rel, mmr) = scoredC.minBy { case (n, _, m) => (-m, n) }
        sel += ((qid, k.toLong, nid, rel, mmr))
        remaining.remove((nid, rel))
      }
      sel.toSeq
    }.sortBy(r => (r._1, r._2))
    import spark.implicits._
    out.toDF("query_id", "rank", "neighbor_id", "rel", "mmr")
      .orderBy(col("query_id"), col("rank"))
  }

  /** Unrolled greedy-MMR oracle: the [[mmrDiversify]] selection
    * replayed step by step in DuckDB (the ccCtesSql unrolling
    * discipline — greedy selection is [[MmrK]] fixed steps, so the
    * unroll is exact, not an approximation). */
  private[ops] def mmrOracleSql: String = {
    val steps = (2 to MmrK).map { k =>
      s"""m$k AS MATERIALIZED (
         |  SELECT sh.query_id, sh.neighbor_id, sh.rel,
         |    MAX(p.sim) AS msim
         |  FROM short sh
         |  JOIN ps p ON p.query_id = sh.query_id
         |    AND p.neighbor_id = sh.neighbor_id
         |  JOIN sel${k - 1} s ON s.query_id = p.query_id
         |    AND s.neighbor_id = p.s2
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${k - 1} x
         |    WHERE x.query_id = sh.query_id
         |      AND x.neighbor_id = sh.neighbor_id)
         |  GROUP BY 1, 2, 3),
         |s$k AS (
         |  SELECT query_id, neighbor_id, rel, rel - msim AS mmr,
         |    CAST($k AS BIGINT) AS rank
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY rel - msim DESC, neighbor_id) AS rnm FROM m$k)
         |  WHERE rnm = 1),
         |sel$k AS (SELECT query_id, neighbor_id FROM sel${k - 1}
         |  UNION ALL SELECT query_id, neighbor_id FROM s$k)""".stripMargin
    }.mkString(",\n")
    val unions = (2 to MmrK)
      .map(k => s"UNION ALL SELECT * FROM s$k").mkString(" ")
    s"""WITH q AS (SELECT vec_id AS query_id,
       |    CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id < $NswQueries),
       |c AS (SELECT vec_id AS neighbor_id,
       |    CAST(embedding AS DOUBLE[]) AS ve
       |  FROM embeddings WHERE vec_id >= 10),
       |rel AS MATERIALIZED (SELECT query_id, neighbor_id,
       |    round(list_cosine_similarity(qe, ve), 6) AS rel
       |  FROM q CROSS JOIN c),
       |short AS MATERIALIZED (SELECT query_id, neighbor_id, rel, rn
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel DESC, neighbor_id) AS rn FROM rel)
       |  WHERE rn <= $MmrShortlist),
       |ps AS MATERIALIZED (
       |  SELECT a.query_id, a.neighbor_id, b.neighbor_id AS s2,
       |    round(list_cosine_similarity(ca.ve, cb.ve), 6) AS sim
       |  FROM short a JOIN short b ON a.query_id = b.query_id
       |    AND a.neighbor_id <> b.neighbor_id
       |  JOIN c ca ON ca.neighbor_id = a.neighbor_id
       |  JOIN c cb ON cb.neighbor_id = b.neighbor_id),
       |s1 AS (SELECT query_id, neighbor_id, rel, rel AS mmr,
       |    CAST(1 AS BIGINT) AS rank
       |  FROM short WHERE rn = 1),
       |sel1 AS (SELECT query_id, neighbor_id FROM s1),
       |$steps
       |SELECT query_id, rank, neighbor_id, rel, mmr FROM (
       |  SELECT * FROM s1 $unions) t
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Threshold similarity self-join on a bounded id range — the exact
    * all-pairs form, kept as the ground truth the LSH path is graded
    * against (recall test in ScalaTest). */
  def thresholdJoin(s: SparkSession, d: String): DataFrame =
    thresholdJoinOn(Tables.embeddings(s, d).filter(col("vec_id") < 300), 0.3)

  /** Exact all-pairs threshold join over an arbitrary embedding set
    * (O(n²): only for bounded inputs / oracles). */
  def thresholdJoinOn(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("ae"),
      Vectors.normCol(col("embedding")).as("an"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("be"),
      Vectors.normCol(col("embedding")).as("bn"))
    a.join(broadcast(b), col("a_id") < col("b_id"))
      .withColumn("cosine",
        Vectors.cosine6WithNorms(col("ae"), col("an"), col("be"), col("bn")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** X3 scale path for THRESHOLD similarity (the shape LSH/IVF didn't
    * cover): signed-random-projection LSH over the FULL embedding
    * table — band the SRP signature, equi-join band buckets, verify
    * only candidates with exact cosine. No cross product anywhere.
    *
    * Scaling honesty: SRP-LSH cost is ~n^(1+ρ), ρ =
    * ln(1/p₁)/ln(1/p₂) with p = 1 − arccos(cos θ)/π per bit. At true
    * near-dup thresholds (cos ≥ 0.8 ⇒ p₁ ≈ 0.80 vs background
    * p₂ = 0.5) ρ ≈ 0.33 — strongly sub-quadratic. The demo threshold
    * 0.4 is deliberately near the hard end (ρ ≈ 0.66): band width 8 /
    * 64 bands keeps recall ≈ 0.8 at the boundary (≈ 0.95 by 0.5)
    * while candidate volume stays ≈ 2^-8-per-band on the random mass.
    * Recall vs the exact form is asserted in ScalaTest; rows-only
    * check here (SRP internals aren't SQL-expressible). */
  def thresholdLsh(s: SparkSession, d: String): DataFrame =
    thresholdLshOn(Tables.embeddings(s, d), 0.4)

  /** Self-tuned SRP-LSH parameters for corpus size `n` — the piece
    * that makes the LSH path's sub-quadratic claim hold ACROSS scales
    * rather than at one tuned size. Fixed (bits, bands) stop being
    * sub-quadratic as n grows: candidate mass on the random
    * background is ≈ L·C(n,2)/2^b, so with b pinned it is Θ(n²).
    * The standard LSH prescription re-tunes both with n:
    *
    *  - `b = log2(n / (2·avgBucket))` keeps expected RANDOM collision
    *    mass per band ≈ avgBucket·n — linear in n by construction;
    *  - `L = ln(1/(1−recall)) / p₁^…`, sized so boundary-similarity
    *    pairs (per-bit agree prob `p₁ = 1 − arccos(threshold)/π`,
    *    per-band `p₁^b`) are caught with `targetRecall`.
    *
    * Substituting b(n) gives total candidates ≈ n^(1+ρ),
    * ρ = ln(1/p₁)/ln 2 — the textbook exponent. The parameters grow
    * as b = Θ(log n), L = Θ(n^ρ): at threshold 0.3 (ρ ≈ 0.745,
    * deliberately the hard end) n = 2 000 tunes to (7, 98) — the
    * hand-picked demo values were (7, 96) — while n = 10⁹ tunes to
    * (≈26, ≈10⁶)… which is the honest cost of 0.3-threshold LSH; at
    * realistic near-dup thresholds (0.8 ⇒ ρ ≈ 0.33) the same n = 10⁹
    * needs only (≈26, ≈360). Returned L is capped by `maxBands` as a
    * compute rail; hitting the cap degrades recall, not correctness
    * (every emitted pair is still exact-cosine-verified). */
  def srpAutoParams(n: Long, threshold: Double,
      targetRecall: Double = 0.93, avgBucket: Int = 8,
      maxBands: Int = 4096): (Int, Int) = {
    require(n > 0 && threshold > 0.0 && threshold < 1.0)
    val p1bit = 1.0 - math.acos(threshold) / math.Pi
    val b = math.max(4, math.ceil(
      math.log(n.toDouble / (2.0 * avgBucket)) / math.log(2.0))).toInt
    val p1 = math.pow(p1bit, b)
    val l = math.ceil(math.log1p(-targetRecall) / math.log1p(-p1)).toInt
    (b, math.min(maxBands, math.max(1, l)))
  }

  /** [[thresholdLshOn]] with [[srpAutoParams]]-tuned (bits, bands).
    * `knownN` is the manifest-style corpus cardinality
    * ([[graft.Tables.cardinality]] — parquet footer metadata, zero
    * jobs); callers that don't have one fall back to a `count()`
    * scan. Deterministic either way (both are the same
    * data-determined number), so rows-only grading is stable across
    * runs and across the two sizing paths. */
  def thresholdLshAuto(emb: DataFrame, threshold: Double,
      targetRecall: Double = 0.93, seed: Long = 42L,
      knownN: Option[Long] = None): DataFrame = {
    val n = knownN.getOrElse(emb.count())
    // tune + record through the ONE helper (srpAutoTuned) so the
    // generated-oracle splice protocol cannot drift between the 0.3
    // (semanticLsh) and 0.8 (semanticAppendAuto) paths
    val (bits, bands) = srpAutoTuned(n, threshold, targetRecall, seed)
    thresholdLshOn(emb, threshold, bits, bands, seed)
  }

  /** [[srpAutoParams]] + the oracle-splice recording
    * [[thresholdLshAuto]] performs — for callers that consume the
    * tuned geometry directly (the semantic ingest gate signs frozen
    * and probe splits separately, so it can't go through
    * thresholdLshOn). Same cache, same exactly-one-entry protocol. */
  private[ops] def srpAutoTuned(n: Long, threshold: Double,
      targetRecall: Double = 0.93, seed: Long = 42L): (Int, Int) = {
    val (bits, bands) = srpAutoParams(n, threshold, targetRecall)
    autoParamsCache.put((n, threshold), (bits, bands, seed))
    (bits, bands)
  }

  // keyed by (cardinality, threshold): n is the per-table discriminator
  // AND the pure determinant of the tuned geometry, so two tables of
  // the same n necessarily share params — ambiguity-free by
  // construction (ADVICE r5: a threshold-only key let a second table's
  // geometry silently overwrite the first's)
  private val autoParamsCache = scala.collection.concurrent.TrieMap
    .empty[(Long, Double), (Int, Int, Long)]
  private[graft] def clearSrpParamsCache(): Unit = autoParamsCache.clear()

  /** Tuned SRP geometry for oracle splicing — declines (None) when
    * tables of more than one cardinality have been tuned at this
    * threshold this session, matching the kmeans/pq exactly-one-entry
    * protocol: a generated oracle must never splice wrong-table
    * geometry. */
  private[ops] def tunedSrpParams(threshold: Double): Option[(Int, Int, Long)] = {
    val hits = autoParamsCache.collect {
      case ((_, t), v) if t == threshold => v
    }.toSeq.distinct
    if (hits.size == 1) Some(hits.head) else None
  }

  /** SQL replay of [[graft.functions.SrpCodegen]] — CTE body from the
    * `embeddings` table to `cand` (distinct candidate id pairs), for
    * the given band geometry. Both splitmix derivations (per-bit
    * plane seed, per-(bit, dim) Rademacher sign) run as stepped
    * MATERIALIZED HUGEINT CTEs; the float accumulator is DuckDB's
    * native `list_dot_product`, which accumulates SEQUENTIALLY in
    * index order and so matches the Scala loop's IEEE addition order
    * exactly (acc - v == acc + (-1.0·v) bit-for-bit; verified
    * 0-difference against the explicit ordered list_reduce fold over
    * the real corpus, and ~50× cheaper — the fold was the sf1
    * bottleneck, r11). Dim-agnostic, unlike the fold's hardcoded
    * range(1, 65). That accumulation order is an UNPINNED DuckDB
    * implementation detail (ADVICE r11: a future FMA/SIMD
    * reassociation would break every SRP hash confusingly), so the
    * CTE chain carries a standing sentinel: `accchk` re-computes a
    * ~1/64 md5-sampled vec subset × 8 bits with the explicit ordered
    * fold and the banding is gated on zero bit-exact divergence — an
    * accumulation-order change now fails as "SRP oracle returned 0
    * rows, accchk tripped", not a silent hash drift. */
  private[ops] def srpCtesSql(bits: Int, bands: Int, seed: Long): String =
    srpCtesSql(bits, bands, seed, vecSample = "", auxTable = "")

  /** `vecSample` + `auxTable` switch on the SCALED form: the float
    * accumulator fold (the DuckDB-prohibitive part at 10× data) runs
    * only over an md5-sampled vec subset and is compared against the
    * Spark-dumped (vec_id, band, bucket) aux table; `bucketsx` then
    * reads the aux gated on zero symmetric difference (the
    * DedupOps.winnowScaledSql mechanism). */
  private[ops] def srpCtesSql(bits: Int, bands: Int, seed: Long,
      vecSample: String, auxTable: String): String =
    srpCtesSql(bits, bands, seed, vecSample, auxTable, withCand = true)

  /** `withCand = false` stops after `bucketsx` — for scaled oracles
    * that must also SAMPLE the bucket-join stage (the tuned semantic
    * geometry's full candidate mass is itself oracle-prohibitive at
    * sf1). */
  private[ops] def srpCtesSql(bits: Int, bands: Int, seed: Long,
      vecSample: String, auxTable: String, withCand: Boolean): String = {
    val C1 = java.lang.Long.parseUnsignedLong("bf58476d1ce4e5b9", 16)
    val C2 = java.lang.Long.parseUnsignedLong("94d049bb133111eb", 16)
    val gold = java.lang.Long.parseUnsignedLong("9e3779b97f4a7c15", 16)
    val p2c = java.lang.Long.parseUnsignedLong("c2b2ae3d27d4eb4f", 16)
    val M64 = "18446744073709551616"
    def u(x: Long) = java.lang.Long.toUnsignedString(x)
    def wm(e: String, c: Long): String = {
      val lo = java.lang.Long.remainderUnsigned(c, 4294967296L)
      val hi = java.lang.Long.divideUnsigned(c, 4294967296L)
      s"((($e) % 4294967296 * $lo + (((($e) % 4294967296) * $hi + " +
        s"(($e) // 4294967296) * $lo) % 4294967296) * 4294967296) % $M64)"
    }
    val total = bits * bands
    val seedAdds = "[" +
      (1 to total).map(b => u(seed + gold * b)).mkString(",") + "]"
    val powInBand = "[" + (0 until bits).map(b => u(1L << b)).mkString(",") + "]"
    require(vecSample.isEmpty == auxTable.isEmpty,
      "vecSample and auxTable come together (scaled form) or not at all")
    val accsWhere =
      if (vecSample.isEmpty) "" else s" WHERE $vecSample"
    val bucketsDerived =
      s"""  SELECT vec_id, bit // $bits AS band,
         |    CAST(SUM(CASE WHEN acc > 0
         |      THEN ($powInBand)[(bit % $bits) + 1] ELSE 0 END) AS BIGINT)
         |      AS bucket
         |  FROM accs WHERE (SELECT n_bad FROM accchk) = 0
         |  GROUP BY vec_id, bit // $bits""".stripMargin
    val candSql = if (!withCand) "" else
      s""",
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
         |  FROM bucketsx x JOIN bucketsx y
         |    ON x.band = y.band AND x.bucket = y.bucket
         |      AND x.vec_id < y.vec_id)""".stripMargin
    val bucketsSql = if (vecSample.isEmpty)
      s"""bucketsx AS MATERIALIZED (
         |$bucketsDerived)""".stripMargin
    else {
      val vs = vecSample
      s"""bchk AS MATERIALIZED (
         |$bucketsDerived),
         |auxb AS MATERIALIZED (
         |  SELECT vec_id, CAST(band AS BIGINT) AS band, bucket
         |  FROM $auxTable),
         |mism AS MATERIALIZED (
         |  SELECT * FROM (SELECT vec_id, band, bucket FROM bchk
         |    EXCEPT SELECT vec_id, band, bucket FROM auxb WHERE $vs) t1
         |  UNION ALL
         |  SELECT * FROM (SELECT vec_id, band, bucket FROM auxb WHERE $vs
         |    EXCEPT SELECT vec_id, band, bucket FROM bchk) t2),
         |bucketsx AS MATERIALIZED (
         |  SELECT vec_id, band, bucket FROM auxb
         |  WHERE (SELECT COUNT(*) FROM mism) = 0)""".stripMargin
    }
    s"""bits0 AS MATERIALIZED (
       |  SELECT bit, CAST(($seedAdds)[bit + 1] AS HUGEINT) AS x
       |  FROM (SELECT unnest(range(0, $total)) AS bit)),
       |sb1 AS MATERIALIZED (SELECT bit, xor(x, x // 1073741824) AS x FROM bits0),
       |sb2 AS MATERIALIZED (SELECT bit, ${wm("x", C1)} AS x FROM sb1),
       |sb3 AS MATERIALIZED (SELECT bit, xor(x, x // 134217728) AS x FROM sb2),
       |sb4 AS MATERIALIZED (SELECT bit, ${wm("x", C2)} AS x FROM sb3),
       |pbase AS MATERIALIZED (SELECT bit, xor(x, x // 2147483648) AS base FROM sb4),
       |pi0 AS MATERIALIZED (
       |  SELECT bit, i,
       |    (base + CAST(${wm("CAST(i + 1 AS HUGEINT)", p2c)} AS HUGEINT)) % $M64 AS x
       |  FROM (SELECT bit, base, unnest(range(0, 64)) AS i FROM pbase)),
       |pm1 AS MATERIALIZED (SELECT bit, i, xor(x, x // 1073741824) AS x FROM pi0),
       |pm2 AS MATERIALIZED (SELECT bit, i, ${wm("x", C1)} AS x FROM pm1),
       |pm3 AS MATERIALIZED (SELECT bit, i, xor(x, x // 134217728) AS x FROM pm2),
       |pm4 AS MATERIALIZED (SELECT bit, i, ${wm("x", C2)} AS x FROM pm3),
       |signs AS MATERIALIZED (
       |  SELECT bit, i,
       |    CASE WHEN xor(x, x // 2147483648) % 2 = 1
       |      THEN 1.0 ELSE -1.0 END AS sgn
       |  FROM pm4),
       |slists AS MATERIALIZED (
       |  SELECT bit, list(sgn ORDER BY i) AS sl FROM signs GROUP BY bit),
       |vecs AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       |accs AS MATERIALIZED (
       |  SELECT v.vec_id, s.bit, list_dot_product(v.ve, s.sl) AS acc
       |  FROM vecs v CROSS JOIN slists s$accsWhere),
       |accchk AS MATERIALIZED (
       |  SELECT COUNT(*) AS n_bad FROM (
       |    SELECT list_dot_product(v.ve, s.sl) AS fast,
       |      list_reduce(list_transform(range(1, len(v.ve) + 1),
       |        i -> v.ve[i] * s.sl[i]), (a, b) -> a + b) AS slow
       |    FROM vecs v CROSS JOIN slists s
       |    WHERE md5(CAST(v.vec_id AS VARCHAR)) <= '04' AND s.bit < 8)
       |  WHERE fast <> slow),
       |$bucketsSql$candSql""".stripMargin
  }

  /** Static oracle for `sim_threshold_lsh` (fixed 8×64 geometry,
    * seed 42, threshold 0.4): SRP candidates + exact round-6 cosine
    * verification — a full cross-engine replay of the LSH path. */
  private[ops] def thresholdLshOracleSql: String =
    s"""WITH ${srpCtesSql(8, 64, 42L)}
       |SELECT c.a_id, c.b_id,
       |  round(list_cosine_similarity(a.ve, b.ve), 6) AS cosine
       |FROM cand c JOIN vecs a ON a.vec_id = c.a_id
       |JOIN vecs b ON b.vec_id = c.b_id
       |WHERE round(list_cosine_similarity(a.ve, b.ve), 6) >= 0.4
       |ORDER BY a_id, b_id""".stripMargin

  /** SCALED `sim_threshold_lsh` oracle (see [[srpCtesSql]]'s scaled
    * form): sampled accumulator replay vs `aux_srp_t04`. */
  private[ops] def thresholdLshScaledSql(sample: String): String =
    s"""WITH ${srpCtesSql(8, 64, 42L, sample, "aux_srp_t04")}
       |SELECT c.a_id, c.b_id,
       |  round(list_cosine_similarity(a.ve, b.ve), 6) AS cosine
       |FROM cand c JOIN vecs a ON a.vec_id = c.a_id
       |JOIN vecs b ON b.vec_id = c.b_id
       |WHERE round(list_cosine_similarity(a.ve, b.ve), 6) >= 0.4
       |ORDER BY a_id, b_id""".stripMargin

  /** The (vec_id, band, bucket) SRP banding frame — the scaled-oracle
    * aux dump, ONE definition shared with [[thresholdLshOn]]. */
  private[graft] def srpBandsFrame(emb: DataFrame, bitsPerBand: Int,
      nBands: Int, seed: Long): DataFrame =
    fanOut(emb).select(col("vec_id"),
      posexplode(graft.functions.GraftFunctions.srpBands(col("embedding"),
        bitsPerBand, nBands, seed)).as(Seq("band", "bucket")))

  /** Core of [[thresholdLsh]], parameterized for tests and reuse. */
  def thresholdLshOn(emb: DataFrame, threshold: Double,
      bitsPerBand: Int = 8, nBands: Int = 64, seed: Long = 42L): DataFrame = {
    val e = fanOut(emb).select(col("vec_id"), col("embedding"),
      Vectors.normCol(col("embedding")).as("nrm"))
    val bands = e.select(col("vec_id"),
      posexplode(graft.functions.GraftFunctions.srpBands(col("embedding"),
        bitsPerBand, nBands, seed)).as(Seq("band", "bucket")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
    // Verify BEFORE dedup: the raw candidate stream is the big frame
    // (every band a pair collides in emits a row — ~L×background mass),
    // and verification is one codegen'd cosine per row, so filtering
    // first means the distinct() shuffle only carries the threshold
    // survivors — orders of magnitude smaller than the candidate
    // stream at low thresholds. Same output: cosine is deterministic
    // per (a,b), so dedup before or after scoring yields identical
    // rows. The embedding lookups carry NO broadcast hint: the lookup
    // side is the corpus itself, which only the planner/AQE size check
    // may broadcast (it will at demo scale; at 100 TB these are
    // shuffle joins of the linear candidate stream — correct).
    cand
      .join(e.select(col("vec_id").as("a_id"),
        col("embedding").as("ae"), col("nrm").as("an")), Seq("a_id"))
      .join(e.select(col("vec_id").as("b_id"),
        col("embedding").as("be"), col("nrm").as("bn")), Seq("b_id"))
      .withColumn("cosine",
        Vectors.cosine6WithNorms(col("ae"), col("an"), col("be"), col("bn")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
      .distinct()
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Per-row centroid scoring, map-side (zero shuffle). The centroid
    * set is bounded by construction — it is k-means output, k = 16
    * here, always driver-sized — so instead of
    * `crossJoin(broadcast(cent))` + a `row_number` window (which
    * shuffles k×|corpus| rows just to take each vector's argmax) the
    * centroids are collected ONCE into a sorted array literal and
    * every row folds over it inside the projection. Returns the
    * scored array sorted (cosine desc, centroid_id asc) — the same
    * total order the window form used — so:
    * assignment = `element_at(result, 1).cid`,
    * probe set  = `slice(result, 1, nprobe)`.
    * The assignment stage becomes a narrow map over the scan: no
    * Exchange at all before the first downstream aggregation.
    *
    * The fixed 16-centroid set is collected ONCE per corpus snapshot:
    * keyed by the input's content fingerprint (the kmeansCache
    * protocol), so repeated query construction — bench reps, Verify,
    * the plan-invariant walker — pays the collect job once, and a
    * republished embeddings table forces a re-collect instead of
    * serving stale centroids. */
  private val centroidCache = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.sql.Column]
  private def fixedCentroidScores(s: SparkSession, d: String)
      : org.apache.spark.sql.Column = {
    val fp = graft.ArtifactStore.fingerprint(s, s"$d/embeddings.parquet")
    // the CACHED value is the scores Column itself: a pure,
    // session-independent literal expression tree whose construction
    // (16 × 64-double typedLits + sort lambda) costs ~0.25 s per build
    centroidCache.getOrElseUpdate(fp,
      centroidScoresLocal(centroids(s, d).collect().toSeq.map { r =>
        (r.getLong(0), r.getSeq[Float](1).toSeq.map(_.toDouble))
      }, col("embedding")))
  }

  /** Centroid scoring over a driver-side centroid list (see
    * [[fixedCentroidScores]] for the stored-table path; the k-means
    * trainer passes its computed double centroids directly). */
  private def centroidScoresLocal(cents: Seq[(Long, Seq[Double])],
      vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val lits = cents.sortBy(_._1).map { case (cid, ce) =>
      struct(lit(cid).as("cid"), typedLit(ce).as("ce"))
    }
    val scored = transform(array(lits: _*), c =>
      struct(Vectors.cosine6(vec, c.getField("ce")).as("cos"),
        c.getField("cid").as("cid")))
    array_sort(scored, (l, r) =>
      when(l.getField("cos") > r.getField("cos"), -1)
        .when(l.getField("cos") < r.getField("cos"), 1)
        .when(l.getField("cid") < r.getField("cid"), -1)
        .when(l.getField("cid") > r.getField("cid"), 1)
        .otherwise(0).cast("int"))
  }

  /** The fixed 16-centroid set (vec_id < 16 — deterministic stand-ins
    * for k-means output) as (centroid_id, ce). The real trainer is
    * [[kmeansFit]]; the IVF queries keep the fixed set so their
    * oracles stay one SQL statement, and the trainer's own trajectory
    * is graded by `sim_kmeans_sizes` + the exact differential test. */
  private def centroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("ce"))

  /** IVF build step: assign every vector to its nearest of 16 fixed
    * centroids. At scale this is THE layout step: cluster assignment
    * is a map-side argmax over the centroid array (see
    * [[centroidScores]] — no crossJoin, no window, zero shuffle), and
    * the table is then repartitioned by `centroid_id` so a probe
    * touches only matching partitions. The only Exchange in this
    * query is the tiny 16-group count at the end. */
  def ivfAssign(s: SparkSession, d: String): DataFrame = {
    val scores = fixedCentroidScores(s, d)
    Tables.embeddings(s, d)
      .withColumn("centroid_id", element_at(scores, 1).getField("cid"))
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("centroid_id"))
  }

  /** The IVF pruned-search shape shared by [[ivfProbe]] (fixed
    * centroids) and [[ivfTrained]] (k-means output): map-side
    * assignment of every vector to its nearest centroid, map-side
    * probe selection (each query's `nprobe` closest clusters), then
    * top-3 exact scoring over only the matching clusters. `scores` is
    * a [[centroidScores]]/[[centroidScoresLocal]] column, so both
    * stages stay narrow — the only wide op is the final per-query
    * top-k window over the pruned candidate set. */
  private def probeSearch(e: DataFrame,
      scores: org.apache.spark.sql.Column, nprobe: Int = 2,
      candFilter: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    // map-side assignment of all (PRE-FILTERED) vectors to their
    // nearest centroid — candFilter is the filtered-search predicate,
    // applied before anything else so excluded vectors are never
    // assigned, scored, or ranked
    val assigned = e.filter(candFilter)
      .withColumn("centroid_id", element_at(scores, 1).getField("cid"))
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    // queries probe their nprobe nearest clusters — also map-side
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(slice(scores, 1, nprobe)).as("pc"))
      .select(col("query_id"), col("qe"), col("pc.cid").as("centroid_id"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", Vectors.cosine6(col("qe"), col("embedding")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF probe (scale path): top-3 neighbors per query searching only
    * the query's 2 closest clusters. Demonstrates the pruned-search
    * plan; oracled by [[probeOracleSql]] over the fixed centroid set,
    * with recall vs the exact baseline additionally asserted in
    * ScalaTest. */
  def ivfProbe(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    probeSearch(e, fixedCentroidScores(s, d))
  }

  /** FILTERED vector search — the production case plain top-k
    * skips: "nearest neighbors among the vectors satisfying a
    * metadata predicate" (tenant, language, license, date range).
    * This is the PRE-FILTER strategy: the predicate applies before
    * assignment, scoring, or ranking, so k results are guaranteed
    * from the eligible pool (post-filtering a fixed-k result set
    * under-fills k when the predicate is selective — the classic
    * failure). The predicate here is a deterministic tenant
    * stand-in (vec_id ≡ 1 mod 3, ~1/3 selectivity); at scale the
    * tenant key is a partition/bucket column of the posting layout
    * and the same filter prunes I/O instead of rows. Everything else
    * is the graded [[ivfProbe]] pruned-search shape. */
  def ivfFilteredTopk(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    probeSearch(e, fixedCentroidScores(s, d),
      candFilter = col("vec_id") % 3 === 1)
  }

  /** Trainer → index composition: the full IVF read path with TRAINED
    * centroids — [[kmeansFit]] output feeds the same map-side
    * assignment + 2-probe search the fixed-centroid queries grade.
    * Closes the loop the `vec_id < 16` stand-ins deliberately leave
    * open (their rationale: keep the IVF oracles one SQL statement —
    * an iterative trainer is not). Fully deterministic end to end —
    * fixed-point integer k-means updates make the trained centroids
    * engine-independent constants — which is what lets
    * [[generatedOracles]] splice them into a VALUES-table oracle for a
    * real cross-engine hash grade; recall vs the exact brute-force
    * top-k is additionally asserted in ScalaTest. */
  def ivfTrained(s: SparkSession, d: String): DataFrame =
    probeSearch(Tables.embeddings(s, d),
      centroidScoresLocal(trainedKmeans(s, d).centroids, col("embedding")))

  /** The trained-artifact pattern, now backed by the content-addressed
    * [[graft.ArtifactStore]]: an IVF index is built once PER CORPUS
    * SNAPSHOT, persisted as parquet, and SERVED — a cold JVM with a
    * warm store reads the model instead of retraining, and republished
    * input (new fingerprint) forces a rebuild instead of serving stale
    * centroids. The in-JVM map is keyed by the CONTENT fingerprint
    * (not the path — ADVICE r4) and holds plain Scala data, so it is
    * session-independent by construction. Deterministic trainer ⇒ the
    * artifact is a pure function of the table. */
  private val kmeansCache = scala.collection.concurrent.TrieMap
    .empty[String, KmeansModel]
  private[graft] def clearKmeansMemoryCache(): Unit = kmeansCache.clear()
  private def trainedKmeans(s: SparkSession, d: String): KmeansModel = {
    val input = s"$d/embeddings.parquet"
    val fp = graft.ArtifactStore.fingerprint(s, input)
    kmeansCache.getOrElseUpdate(fp, modelFromDf(
      graft.ArtifactStore.parquet(s, "kmeans16", input) {
        modelToDf(s, kmeansFitFull(Tables.embeddings(s, d)))
      }))
  }

  /** Long-format parquet encoding of a [[KmeansModel]]: section
    * "traj" carries (iter, cid, n); "snap" carries each assignment
    * snapshot's (iter, cid, pos, v); "cent" (iter 0) the final
    * centroids. Doubles round-trip bit-exactly through parquet, so
    * serve-from-store and fresh-train are indistinguishable. */
  private def modelToDf(s: SparkSession, m: KmeansModel): DataFrame = {
    import s.implicits._
    val traj = m.trajectory.map { case (it, cid, n) =>
      ("traj", it, cid, n, -1, 0.0) }
    val cent = m.centroids.flatMap { case (cid, ce) =>
      ce.zipWithIndex.map { case (v, pos) => ("cent", 0, cid, 0L, pos, v) } }
    val snap = m.assignSnapshots.flatMap { case (it, cents) =>
      cents.flatMap { case (cid, ce) =>
        ce.zipWithIndex.map { case (v, pos) => ("snap", it, cid, 0L, pos, v) } } }
    (traj ++ cent ++ snap).toDF("section", "iter", "cid", "n", "pos", "v")
  }

  private def modelFromDf(df: DataFrame): KmeansModel = {
    val rows = df.collect() // model-sized: k·dim·(iters+1) + k·iters rows
    val traj = rows.filter(_.getString(0) == "traj")
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    def cents(section: String, it: Int): Seq[(Long, Seq[Double])] = rows
      .filter(r => r.getString(0) == section && r.getInt(1) == it)
      .groupBy(_.getLong(2)).toSeq
      .map { case (cid, rs) =>
        (cid, rs.sortBy(_.getInt(4)).map(_.getDouble(5)).toSeq) }
      .sortBy(_._1)
    val snaps = rows.filter(_.getString(0) == "snap").map(_.getInt(1))
      .distinct.sorted.toSeq.map(it => (it, cents("snap", it)))
    KmeansModel(traj, cents("cent", 0), snaps)
  }

  /** Exact top-5 via the bounded [[graft.functions.TopKAggregator]]:
    * partial-aggregates k candidates per partition instead of window-
    * sorting every score — the X3 shape that survives 100 TB candidate
    * volume. Same oracle as the window formulation. */
  def cosineTopKAgg(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        Vectors.normCol(col("embedding")).as("qn"))
    val v = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ve"),
        Vectors.normCol(col("embedding")).as("vn"))
    val topk = udaf(new graft.functions.TopKAggregator(5))
    v.crossJoin(broadcast(q))
      .withColumn("cosine",
        Vectors.cosine6WithNorms(col("qe"), col("qn"), col("ve"), col("vn")))
      .groupBy(col("query_id"))
      .agg(topk(col("cosine"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("sc.id").as("neighbor_id"), col("sc.score").as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ------------------------------------------ graph ANN: NSW (r11)

  private[graft] val NswDegree = 8 // per-node out-degree
  // beam 24 × 4 hops: recall vs exact top-10 measured 0.90 / 0.90 /
  // 0.70 at sf0.001/0.01/0.1 on the near-uniform fixture embeddings —
  // the hard case (no cluster structure to navigate). The serving
  // budget is O(hops·beam·degree) scores per query, corpus-size-free.
  private[graft] val NswBeam = 24 // beam width (≥ NswK)
  private[graft] val NswHops = 4 // greedy expansion rounds
  // insert walks start from the same entry set but only need to LAND
  // in the right neighborhood, not rank a serving answer — link
  // recall measured 0.96 at 4 hops and ~the same at 2 (see OpsSpec);
  // 2 hops halve the per-batch maintenance cost
  private[graft] val NswAppendHops = 2
  private[graft] val NswK = 10 // results per query
  private[graft] val NswQueries = 8L // bounded query side: vec_id < 8

  // candidate clusters per node for the bucketed build: each node
  // scores only members of its NswBuildProbes nearest IVF cells
  // (3/16 of a uniform corpus instead of all of it; at 100 TB the
  // cell count grows ~√n and the per-node candidate set stays
  // cell-sized). Edge recall vs the exact build is pinned in
  // ScalaTest; search recall over the bucketed graph is re-measured
  // in SCALE.md.
  private[graft] val NswBuildProbes = 3

  /** NSW graph BUILD — BUCKETED (VERDICT r11 #1, retiring the
    * engine's last all-pairs job): each node's top-[[NswDegree]]
    * round-6-cosine neighbors are now drawn from an IVF-bucketed
    * candidate set instead of the full corpus. Every node is
    * map-side-assigned to its nearest of the 16 fixed centroids (the
    * [[ivfProbe]] assignment, zero shuffle), each node probes its
    * [[NswBuildProbes]] nearest cells, and candidates are the
    * members of the probed cells — one equi-join on `centroid_id`,
    * never a corpus×corpus crossJoin. Top-d per node rides the
    * bounded [[graft.functions.TopKAggregator]] (partial-aggregates
    * d candidates per partition — the pair stream is never
    * window-sorted). Build cost is Σ_cell |probes into cell|·|cell|
    * — at 100 TB the cell count scales with the corpus and the per-
    * node work stays cell-sized, the same shape as the LSH-banded
    * dedup builds. [[nswBuildExact]] remains as the sf≤0.01
    * test-side control that pins the bucketed graph's edge recall. */
  private[graft] def nswBuild(emb: DataFrame): DataFrame = {
    // the 16 fixed centroids are corpus rows (vec_id < 16):
    // driver-sized collect, folded into a literal scores expression —
    // the fixedCentroidScores shape without the (session, dir) key,
    // so the build stays callable from tests and aux dumps on any
    // embedding frame
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding")).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq.map(_.toDouble)))
    val scores = centroidScoresLocal(cents, col("embedding"))
    val members = emb
      .withColumn("centroid_id", element_at(scores, 1).getField("cid"))
      .select(col("vec_id").as("dst"), col("embedding").as("be"),
        Vectors.normCol(col("embedding")).as("bn"), col("centroid_id"))
    val probes = fanOut(emb)
      .select(col("vec_id").as("src"), col("embedding").as("ae"),
        Vectors.normCol(col("embedding")).as("an"),
        explode(slice(scores, 1, NswBuildProbes)).as("pc"))
      .select(col("src"), col("ae"), col("an"),
        col("pc").getField("cid").as("centroid_id"))
    val topd = udaf(new graft.functions.TopKAggregator(NswDegree))
    probes.join(members, Seq("centroid_id"))
      .filter(col("src") =!= col("dst"))
      .withColumn("c",
        Vectors.cosine6WithNorms(col("ae"), col("an"), col("be"), col("bn")))
      .groupBy(col("src"))
      .agg(topd(col("c"), col("dst")).as("top"))
      .select(col("src"), explode(col("top")).as("sc"))
      .select(col("src"), col("sc.id").as("dst"))
  }

  /** Centroid-seeded NSW entry set (VERDICT r11 #6): for each trained
    * centroid, the corpus node nearest to it under (round-6 cosine
    * desc, vec_id asc) — entry points spread across the corpus's
    * cluster structure instead of an arbitrary id prefix. One
    * map-side scoring pass (16 literal centroids per node) + a
    * 16-group argmax (partial-aggregable struct-max, map-side
    * combine) — no shuffle wider than 16 groups, scale-free. */
  private[graft] def centroidEntryCandidates(emb: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame = {
    val lits = cents.sortBy(_._1).map { case (cid, ce) =>
      struct(lit(cid).as("cid"), typedLit(ce).as("ce")) }
    emb.select(col("vec_id").as("node"), col("embedding"),
        explode(array(lits: _*)).as("c"))
      .select(col("node"), col("c").getField("cid").as("cid"),
        Vectors.cosine6(col("embedding"), col("c").getField("ce"))
          .as("cos"))
      .groupBy(col("cid"))
      .agg(max(struct(col("cos").as("cos"),
        (-col("node")).as("negnode"))).as("m"))
      .select((-col("m").getField("negnode")).cast("long").as("node"))
      .distinct()
  }

  /** The exact all-pairs build — TEST-SIDE CONTROL ONLY (never on a
    * serve or dump path): pins the bucketed build's edge recall at
    * sf ≤ 0.01 in ScalaTest, exactly the role VERDICT r11 #1
    * prescribed for it. */
  private[graft] def nswBuildExact(emb: DataFrame): DataFrame = {
    val a = fanOut(emb).select(col("vec_id").as("src"),
      col("embedding").as("ae"), Vectors.normCol(col("embedding")).as("an"))
    val b = emb.select(col("vec_id").as("dst"),
      col("embedding").as("be"), Vectors.normCol(col("embedding")).as("bn"))
    val topd = udaf(new graft.functions.TopKAggregator(NswDegree))
    a.crossJoin(b)
      .filter(col("src") =!= col("dst"))
      .withColumn("c",
        Vectors.cosine6WithNorms(col("ae"), col("an"), col("be"), col("bn")))
      .groupBy(col("src"))
      .agg(topd(col("c"), col("dst")).as("top"))
      .select(col("src"), explode(col("top")).as("sc"))
      .select(col("src"), col("sc.id").as("dst"))
  }

  /** GRAPH-SHAPED ANN (VERDICT r10 #4): fixed-beam greedy search over
    * the artifact-served NSW graph — the dominant production ANN
    * family (bounded-degree neighbor graph + beam walk), completing
    * the inventory next to IVF, PQ and SRP-LSH.
    *
    * Search is fully deterministic and oracle-replayable: the entry
    * set is the [[NswBeam]] smallest vec_ids, each hop expands the
    * current beam's out-edges, scores candidates with the round-6
    * cosine, and keeps the best [[NswBeam]] per query under
    * (score desc, vec_id) — [[NswHops]] hops unrolled into ONE lazy
    * plan (equi-joins on node id; the 8-row query side broadcasts).
    * The beam is monotone (each hop's candidate set includes the
    * current beam), so the final top-[[NswK]] is the beam's head.
    * Per-query wall cost is O(hops · beam · degree) score
    * evaluations regardless of corpus size — the property that makes
    * graph ANN the serving-path winner at 100 TB; recall vs exact
    * top-k is asserted in ScalaTest. */
  def nswTopk(s: SparkSession, d: String): DataFrame = {
    val (v, undirected) = nswServeArtifacts(s, d)
    val q = v.filter(col("node") < NswQueries)
      .select(col("node").as("query_id"), col("ve").as("qe"),
        col("vn").as("qn"))
    nswWalkLocal(s, v, undirected, q)
  }

  /** Spark's `round(x, 6)` for doubles, replicated exactly for the
    * driver-held walk: NaN/±Inf pass through, everything else rounds
    * HALF_UP over the exact binary value (RoundBase's DoubleType
    * path). The [[nswWalkLocal]] ≡ [[nswSearchOn]] differential spec
    * pins the parity. */
  private def round6Local(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The SERVING-PATH beam walk with a DRIVER-HELD frontier (r15
    * optimization, guide §8's "decide with small rows" discipline):
    * the frontier is CONSTANT-bounded for serving ([[NswQueries]] = 8
    * queries × [[NswBeam]] = 24 ≤ 192 rows; expansions ≤ ·2·degree),
    * so instead of per-hop corpus-frame JOINS (each hop paid an
    * expand join + a score join + a dedup exchange + a window
    * exchange — 26–30 AQE stage-jobs, 1.7–2.5 s per serve at sf0.1),
    * the walk holds the beam on the driver and issues per hop exactly
    * two POINT-LOOKUP scans with pushed `In` filters: the adjacency
    * rows of the frontier (`src IN (...)`, degree-bounded result) and
    * the not-yet-cached candidate vectors (`node IN (...)`). At
    * 100 TB this is the production graph-ANN serving shape (DiskANN /
    * HNSW walk = bounded point reads against the index, never
    * corpus-frame joins), and the pushed filters prune to the
    * row-groups holding the requested ids.
    *
    * Arithmetic parity with [[nswSearchOn]] is exact: dot products
    * accumulate left-to-right in double over the stored float arrays
    * (the [[graft.functions.DotCodegen.dotFF]] loop), norms come from
    * the SAME stored `vn` column, and rounding replicates Spark's
    * `round(_, 6)` ([[round6Local]]) — the differential spec asserts
    * frame equality against the DataFrame walk, and the DuckDB walk
    * oracle gates every serve. Tombstone exclusion stays a
    * DataFrame anti-join on the final beam (the tombstone set is
    * data-sized and is never collected). */
  private[graft] def nswWalkLocal(s: SparkSession, v: DataFrame,
      undirected: DataFrame, q: DataFrame, hops: Int = NswHops,
      exclude: Option[DataFrame] = None): DataFrame = {
    import scala.collection.mutable
    val qRows = q.select(col("query_id"), col("qe"), col("qn")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val entryIds = v.orderBy(col("node")).limit(NswBeam)
      .select(col("node")).collect().map(_.getLong(0)).toSeq
    val vecs = mutable.LongMap.empty[(Array[Float], Double)]
    def fetch(ids: Seq[Long]): Unit = {
      val missing = ids.distinct.filterNot(vecs.contains)
      if (missing.nonEmpty)
        v.filter(col("node").isin(missing: _*))
          .select(col("node"), col("ve"), col("vn")).collect()
          .foreach(r => vecs(r.getLong(0)) =
            (r.getSeq[Float](1).toArray, r.getDouble(2)))
    }
    def dotFF(a: Array[Float], b: Array[Float]): Double = {
      var sAcc = 0.0; var i = 0
      while (i < a.length) { sAcc += a(i).toDouble * b(i).toDouble; i += 1 }
      sAcc
    }
    def prune(qid: Long, qe: Array[Float], qn: Double,
        cands: Seq[Long]): Seq[(Long, Double)] =
      cands.distinct.filter(_ != qid)
        .map { id =>
          val (ve, vn) = vecs(id); (id, round6Local(dotFF(qe, ve) / (qn * vn)))
        }
        .sortBy { case (id, sc) => (-sc, id) }.take(NswBeam)
    fetch(entryIds)
    var beams: Seq[(Long, Seq[(Long, Double)])] = qRows.toSeq.map {
      case (qid, qe, qn) => qid -> prune(qid, qe, qn, entryIds)
    }
    for (_ <- 1 to hops) {
      val frontier = beams.flatMap(_._2.map(_._1)).distinct
      val adj = mutable.LongMap.empty[mutable.Buffer[Long]]
      undirected.filter(col("src").isin(frontier: _*))
        .select(col("src"), col("dst")).collect()
        .foreach(r => adj.getOrElseUpdate(r.getLong(0),
          mutable.Buffer.empty) += r.getLong(1))
      val candAll = beams.flatMap { case (_, beam) =>
        beam.map(_._1) ++
          beam.flatMap(b => adj.getOrElse(b._1, mutable.Buffer.empty))
      }.distinct
      fetch(candAll)
      val beamIndex = beams.toMap
      beams = qRows.toSeq.map { case (qid, qe, qn) =>
        val beam = beamIndex(qid)
        val cands = beam.map(_._1) ++
          beam.flatMap(b => adj.getOrElse(b._1, mutable.Buffer.empty))
        qid -> prune(qid, qe, qn, cands)
      }
    }
    import s.implicits._
    val beamDF = beams.flatMap { case (qid, beam) =>
      beam.map { case (id, sc) => (qid, id, sc) }
    }.toDF("query_id", "node", "score")
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("node"))
    val served = exclude.map(t =>
      beamDF.join(t, Seq("node"), "left_anti")).getOrElse(beamDF)
    served.withColumn("rank", row_number().over(wq).cast("long"))
      .filter(col("rank") <= NswK)
      .select(col("query_id"), col("rank"), col("node").as("vec_id"),
        col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The symmetrized (undirected) form of a directed top-d edge set —
    * the WALK's view of the graph (see [[nswSearch]]'s doc for why
    * navigability needs it). */
  private def symEdges(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"),
        col("src").as("dst")))
      .distinct()

  /** The serve path's loop-invariant relations for the FULL-corpus
    * snapshot graph — (normed vectors, symmetrized edges) — shared by
    * [[nswTopk]] (serving) and [[nswDelete]] (merge-on-read: the
    * delete NEVER rewrites them).
    *
    * VERDICT r11 #3: both are content-addressed ARTIFACTS (the
    * ivf_layout discipline), not per-construction localCheckpoints: a
    * serving tier materializes its index once per corpus snapshot and
    * every session/bench rep after that is a scan, not an
    * executor-storage materialization. Artifact FILE COUNT is sized
    * to content, not to the builder's shuffle parallelism: a
    * 32-partition distinct would write 32 tiny files that every hop
    * of the walk re-lists and re-opens (5× per query — measured +1 s
    * serve cost at bench scale). ~400k rows ≈ 128 MB per file for
    * these schemas; at 100 TB the same rule yields a normal
    * multi-file layout. */
  private def nswServeArtifacts(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val input = s"$d/embeddings.parquet"
    val emb = Tables.embeddings(s, d)
    // v2: the bucketed build (VERDICT r11 #1) — the version bump is
    // the ArtifactStore contract for a build-logic change, or a warm
    // store would silently serve all-pairs-built graphs
    val edges = graft.ArtifactStore.parquet(s, "nsw_graph", input,
      version = 2) { nswBuild(emb) }
    val n = Tables.cardinality(s, d, "embeddings")
    def parts(rows: Long): Int = math.max(1, (rows / 400000L).toInt)
    val undirected = graft.ArtifactStore.parquet(s, "nsw_undirected",
      input, version = 3) {
      symEdges(edges).repartition(parts(2L * NswDegree * n), col("src"))
    }
    val v = graft.ArtifactStore.parquet(s, "emb_normed", input,
      version = 2) {
      emb.select(col("vec_id").as("node"), col("embedding").as("ve"),
        Vectors.normCol(col("embedding")).as("vn"))
        .repartition(parts(n))
    }
    (v, undirected)
  }

  /** Test adapter over [[nswSearchOn]]: derives the undirected edge
    * set and the normed vector table inline (localCheckpointed —
    * test inputs are sf ≤ 0.01-sized; the SERVE path in [[nswTopk]]
    * scans artifacts instead). The stored graph is directed (each
    * node's top-d); the WALK treats it as undirected (src↔dst), the
    * standard NSW navigability fix — a node is reachable through
    * anyone who chose it as a neighbor, not only through its own
    * choices (directed-only recall measured 0.61 at sf0.001;
    * undirected ≥ 0.9). */
  private[graft] def nswSearch(emb: DataFrame, edges: DataFrame): DataFrame = {
    val undirected = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    val v = emb.select(col("vec_id").as("node"),
      col("embedding").as("ve"), Vectors.normCol(col("embedding")).as("vn"))
      .localCheckpoint(true)
    val q = emb.filter(col("vec_id") < NswQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        Vectors.normCol(col("embedding")).as("qn"))
    nswSearchOn(v, undirected, q)
  }

  /** The beam walk itself, over pre-materialized loop-invariant
    * inputs: `v` = the normed vector table (node, ve, vn),
    * `undirected` = the symmetrized edge set, `q` = the bounded query
    * side (query_id, qe, qn). Per-hop state (the frontier) is
    * |q|·beam rows and IS localCheckpointed — that truncates the
    * otherwise hop-deep lineage at query-sized cost; the
    * corpus-sized relations are scans of whatever the caller serves
    * (artifacts in [[nswTopk]] — VERDICT r11 #3). */
  private[graft] def nswSearchOn(v: DataFrame, undirected: DataFrame,
      q: DataFrame, entriesOpt: Option[DataFrame] = None,
      hops: Int = NswHops, broadcastQ: Boolean = true,
      exclude: Option[DataFrame] = None): DataFrame = {
    // broadcastQ: the serving query side (8 rows) is hinted; a
    // MAINTENANCE batch (a corpus fraction in nswAppend) must not be
    // — it shuffle-joins on query_id like any other big side (AQE
    // still broadcasts it while it is small)
    val qSide = if (broadcastQ) broadcast(q) else q
    def scored(cands: DataFrame): DataFrame =
      cands.join(v, Seq("node"))
        .join(qSide, Seq("query_id"))
        .filter(col("node") =!= col("query_id"))
        .select(col("query_id"), col("node"),
          Vectors.cosine6WithNorms(col("qe"), col("qn"),
            col("ve"), col("vn")).as("score"))
    // beam prune: window row_number, NOT the TopKAggregator — A/B
    // measured the udaf form ~0.7 s slower per query at bench scale
    // (ObjectHashAggregate breaks whole-stage codegen on the tiny
    // frontier; the aggregator wins only on unbounded candidate
    // streams like the BUILD, where partial aggregation prunes a
    // shuffle that would otherwise carry the full pair stream)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("node"))
    def topB(f: DataFrame): DataFrame =
      f.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= NswBeam).drop("rn")
    // ONE exchange per hop (r15, guide §2.4): score the candidate set
    // FIRST (dup rows score identically — cosine is a function of the
    // pair), then a single repartition by query_id feeds BOTH the
    // (query_id, node) dedup aggregate and the beam window without
    // further shuffles (HashPartitioning(query_id) satisfies both
    // required distributions). The old shape paid a distinct exchange
    // on (query_id, node) PLUS a window exchange on query_id per hop.
    def dedupTopB(scoredAll: DataFrame): DataFrame =
      topB(scoredAll.repartition(col("query_id"))
        .groupBy(col("query_id"), col("node"))
        .agg(min(col("score")).as("score")))
    val entries = entriesOpt.getOrElse(
      v.orderBy(col("node")).limit(NswBeam).select(col("node")))
    // the frontier is |queries|·beam rows — checkpointing it EVERY
    // SECOND hop truncates the otherwise exponentially-replayed
    // lineage (each hop references f twice, so k unchecked hops cost
    // 2^k re-derives — fully lazy measured 3.5 s at sf0.1) while
    // halving the eager-job count of the per-hop form (2.0 s); the
    // every-2 cadence measured 1.3–1.7 s. coalesce(4): the
    // query-sized frontier doesn't need 32 tasks per stage.
    def pin(f: DataFrame): DataFrame = f.coalesce(4).localCheckpoint(true)
    var f = pin(topB(scored(
      q.select(col("query_id")).crossJoin(entries))))
    for (h <- 1 to hops) {
      val exp = f.select(col("query_id"), col("node"))
        .join(undirected.withColumnRenamed("src", "node"), Seq("node"))
        .select(col("query_id"), col("dst").as("node"))
      val cands = f.select(col("query_id"), col("node"))
        .unionByName(exp)
      f = dedupTopB(scored(cands))
      if (h % 2 == 0) f = pin(f)
    }
    // tombstone merge-on-read ([[nswDelete]]): deleted nodes stay
    // ROUTABLE all walk long (they were in the frontier above) but
    // can never be RETURNED — one anti-join on the final beam, ranks
    // recomputed over the survivors. The tombstone set shuffles like
    // any other join side; AQE broadcasts it while it is small.
    val served = exclude.map(t =>
      f.join(t, Seq("node"), "left_anti")).getOrElse(f)
    served.withColumn("rank", row_number().over(wq).cast("long"))
      .filter(col("rank") <= NswK)
      .select(col("query_id"), col("rank"), col("node").as("vec_id"),
        col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** NSW DELTA MAINTENANCE (VERDICT r11 #4) — the graph-index leg of
    * the incremental triptych: a new vector batch (vec_id ≡ 8,9 mod
    * 10, the [[ivfAppend]] split) is inserted into the FROZEN
    * snapshot graph by beam-searching it — each new node's
    * top-[[NswDegree]] walk results become its edges, appended as a
    * delta edge set; the snapshot graph, its symmetrized serve form
    * and the snapshot's normed vectors are content-addressed
    * artifacts that the insert NEVER rewrites. This is how production
    * graph-ANN systems grow (HNSW insert = search-then-link): cost is
    * O(|batch| · hops·beam·degree) score evaluations — linear in the
    * batch, corpus-size-free per node — vs a full rebuild's pass over
    * every corpus pair bucket.
    *
    * Output is the full delta adjacency (src = new node, rank ≤
    * degree, dst = frozen-graph neighbor, round-6 score), hash-graded
    * end to end: the oracle independently re-derives the frozen
    * bucketed build over the snapshot slice AND replays every batch
    * node's walk ([[nswAppendOracleSql]]). Link quality (delta edges
    * vs exact top-d for the new nodes) is recall-floored in ScalaTest
    * with a corrupted-graph control proving the output depends on the
    * graph actually searched. */
  def nswAppend(s: SparkSession, d: String): DataFrame = {
    val input = s"$d/embeddings.parquet"
    val emb = Tables.embeddings(s, d)
    val snap = ivfSnapshot(emb)
    val edges = graft.ArtifactStore.parquet(s, "nsw_snap_graph",
      input) { nswBuild(snap) }
    val n = Tables.cardinality(s, d, "embeddings")
    def parts(rows: Long): Int = math.max(1, (rows / 400000L).toInt)
    val undirected = graft.ArtifactStore.parquet(s, "nsw_snap_undirected",
      input) {
      edges.select(col("src"), col("dst"))
        .unionByName(edges.select(col("dst").as("src"),
          col("src").as("dst")))
        .distinct()
        .repartition(parts(2L * NswDegree * n), col("src"))
    }
    val v = graft.ArtifactStore.parquet(s, "emb_snap_normed", input) {
      snap.select(col("vec_id").as("node"), col("embedding").as("ve"),
        Vectors.normCol(col("embedding")).as("vn"))
        .repartition(parts(n))
    }
    val q = ivfBatch(emb)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        Vectors.normCol(col("embedding")).as("qn"))
    nswSearchOn(v, undirected, q, hops = NswAppendHops,
        broadcastQ = false)
      .filter(col("rank") <= NswDegree)
      .select(col("query_id").as("src"), col("rank"),
        col("vec_id").as("dst"), col("score"))
      .orderBy(col("src"), col("rank"))
  }

  /** NSW TOMBSTONE DELETE — the second leg of the graph-index
    * maintenance triptych ([[nswAppend]] grows it, this tombstones
    * it, [[nswCompact]] folds it), mirroring [[ivfDelete]]'s
    * merge-on-read contract on the SAME deletion split
    * (vec_id ≡ 3 mod 10): the frozen graph, its symmetrized serve
    * form and the normed vector table are NEVER rewritten — the
    * delete is a tombstone set applied at read time. Deleted nodes
    * remain ROUTABLE waypoints for the whole walk (the
    * DiskANN/FreshDiskANN delete discipline: a deleted point keeps
    * navigating until compaction rewires around it — dropping it
    * from the frontier would sever paths and silently cost recall)
    * but can never be RETURNED: one anti-join on the final beam,
    * ranks recomputed over the survivors, top-[[NswK]] served.
    *
    * Scale: the delete itself is O(|tombstones|) metadata — no
    * corpus-sized job runs at delete time, and the serve-path
    * overhead is a single anti-join of a query-sized beam against
    * the tombstone set (AQE broadcasts it while small). Hash-graded
    * end to end: the oracle replays the full build + walk and applies
    * the same final-beam exclusion ([[nswDeleteOracleSql]]). */
  def nswDelete(s: SparkSession, d: String): DataFrame = {
    val input = s"$d/embeddings.parquet"
    val (v, undirected) = nswServeArtifacts(s, d)
    val tombs = graft.ArtifactStore.parquet(s, "nsw_tombstones", input) {
      Tables.embeddings(s, d).filter(col("vec_id") % 10 === 3)
        .select(col("vec_id").as("node"))
    }
    val q = v.filter(col("node") < NswQueries)
      .select(col("node").as("query_id"), col("ve").as("qe"),
        col("vn").as("qn"))
    nswWalkLocal(s, v, undirected, q, exclude = Some(tombs))
  }

  /** NSW COMPACTION — the triptych closer: the merge-on-read view
    * ([[nswDelete]]'s tombstoned graph) is rewritten as a fresh
    * bucketed build over the SURVIVING nodes only, and the tombstone
    * set resets — the [[ivfCompact]] lifecycle on the graph index.
    * Unlike IVF compaction (a partition-layout fold that preserves
    * results exactly), graph compaction REWIRES: tombstoned nodes
    * vanish as routing waypoints and survivors re-link among
    * themselves, so served results may legitimately differ from the
    * merge-on-read path — the graded contract is therefore the
    * compacted search itself (deterministic, full build + walk
    * replay in the oracle) plus a ScalaTest floor on result overlap
    * vs the merge-on-read view and a no-tombstone invariant. The
    * query side stays the SAME external query set as
    * [[nswTopk]]/[[nswDelete]] (all vec_id < [[NswQueries]]),
    * tombstoned or not — queries are vectors, not graph members.
    *
    * Scale: one bucketed rebuild over the survivors (the linear-ish
    * [[nswBuild]] shape), paid once per compaction cycle and
    * artifact-amortized, exactly like the IVF fold. */
  def nswCompact(s: SparkSession, d: String): DataFrame = {
    val input = s"$d/embeddings.parquet"
    val emb = Tables.embeddings(s, d)
    val live = emb.filter(col("vec_id") % 10 =!= 3)
    val edges = graft.ArtifactStore.parquet(s, "nsw_compact_graph",
      input) { nswBuild(live) }
    val n = Tables.cardinality(s, d, "embeddings")
    def parts(rows: Long): Int = math.max(1, (rows / 400000L).toInt)
    val undirected = graft.ArtifactStore.parquet(s,
      "nsw_compact_undirected", input) {
      symEdges(edges).repartition(parts(2L * NswDegree * n), col("src"))
    }
    val v = graft.ArtifactStore.parquet(s, "emb_compact_normed", input) {
      live.select(col("vec_id").as("node"), col("embedding").as("ve"),
        Vectors.normCol(col("embedding")).as("vn"))
        .repartition(parts(n))
    }
    val q = emb.filter(col("vec_id") < NswQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        Vectors.normCol(col("embedding")).as("qn"))
    nswWalkLocal(s, v, undirected, q)
  }

  /** Int8 scalar quantization — the storage path for a 100 TB
    * embedding corpus (4× smaller than float32, 8× than float64):
    * per-vector symmetric scale to [-127,127], then quantized cosine.
    * The query grades the quantization pipeline end-to-end: top-1
    * neighbor per query under quantized scores, which the oracle
    * reproduces with identical integer arithmetic. */
  /** Per-vector symmetric int8 quantization: scale to [-127,127]. */
  private def quantize(v: org.apache.spark.sql.Column) = {
    val vd = Vectors.toDouble(v)
    val maxAbs = array_max(transform(vd, x => abs(x)))
    transform(vd, x => round(x * 127.0 / maxAbs).cast("long"))
  }
  /** Integer dot product / squared norm — exact, engine-independent.
    * Native fused expressions ([[graft.functions.IntDotProduct]] /
    * [[graft.functions.IntNorm2]]): same 64-bit arithmetic as the old
    * composed `aggregate(zip_with(...))` forms (oracles untouched) but
    * zero per-pair array allocation — the candidate stream is the
    * evaluation count, so the constant factor is the whole cost. */
  private def idot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    Vectors.idot(a, b)
  private def inorm(a: org.apache.spark.sql.Column) =
    Vectors.inorm2(a)
  /** Quantized cosine: exact integer dot/norms, ONE final double
    * expression rounded to 6 dp (the engine-parity discipline). */
  private def qcosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    round(idot(a, b).cast("double") /
      (sqrt(inorm(a).cast("double")) * sqrt(inorm(b).cast("double"))), 6)

  def quantizedTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), quantize(col("embedding")).as("qq"))
    val v = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), quantize(col("embedding")).as("vq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id"))
    v.crossJoin(broadcast(q))
      .withColumn("qcos", qcosine(col("qq"), col("vq")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("neighbor_id"), col("qcos"))
      .orderBy(col("query_id"))
  }

  /** IVF pruning × int8 quantized scoring — the two scale levers
    * COMPOSED, the full production read path for a 100 TB embedding
    * corpus: the index prunes which partitions are read (2 of 16
    * clusters per query), quantization shrinks what each partition
    * holds and scores (4× vs float32, integer arithmetic). Assignment
    * and probe selection run on float centroids (the index is built
    * once at full precision); candidate scoring is fully quantized.
    * Every stage is deterministic (round-6 float assignment, exact
    * integer scoring), so unlike `ivfProbe` this composition IS
    * SQL-expressible and oracle-graded end to end. */
  def ivfQuantized(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val scores = fixedCentroidScores(s, d)
    // map-side assignment (float centroids) + int8 quantized storage
    val assigned = e
      .withColumn("centroid_id", element_at(scores, 1).getField("cid"))
      .select(col("vec_id"), quantize(col("embedding")).as("vq"),
        col("centroid_id"))
    quantizedProbeRank(assigned, quantizedProbes(e, scores))
  }

  /** Map-side probe selection shared by the quantized twins: each
    * query (vec_id < 10) probes its 2 nearest clusters, carrying its
    * int8-quantized vector. */
  private def quantizedProbes(e: DataFrame, scores: Column): DataFrame =
    probesFor(e.filter(col("vec_id") < 10), scores)

  /** Probe selection over ANY query frame carrying (vec_id,
    * embedding) — shared with the streaming serving twin
    * ([[graft.streaming.StreamingSearch]]): the centroid-score
    * expression is a pure literal tree, so it applies to a streamed
    * micro-batch exactly as to a batch scan (the bandBuckets
    * one-definition discipline). */
  private[graft] def probesFor(queries: DataFrame,
      scores: Column): DataFrame =
    queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(slice(scores, 1, 2)).as("pc"))
      .select(col("query_id"), quantize(col("qe")).as("qq"),
        col("pc.cid").as("centroid_id"))

  /** The probe-selection score expression for `d`'s corpus snapshot,
    * exposed for the streaming twin. */
  private[graft] def servingCentroidScores(s: SparkSession,
      d: String): Column = fixedCentroidScores(s, d)

  /** Candidate scoring shared by the batch tails and the streaming
    * twin: drop self-matches, score with the fused integer cosine.
    * Takes the already-joined (candidates ⋈ probes) frame so batch
    * (broadcast the bounded probe side) and stream (the probe side IS
    * the micro-batch) can orient the join for their execution model
    * while sharing the scoring semantics. */
  private[graft] def servingScore(joined: DataFrame): DataFrame =
    joined.filter(col("vec_id") =!= col("query_id"))
      .withColumn("qcos", qcosine(col("qq"), col("vq")))

  /** The rank tail shared by [[ivfQuantized]], [[ivfPrunedLayout]],
    * and the streaming twin's post-sink grade: per-query top-3 under
    * (qcos desc, vec_id). Any ranking/tie-break change MUST flow
    * through here to reach all three. */
  private[graft] def servingRank(scored: DataFrame): DataFrame = {
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("qcos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Shared probe→score→rank tail of [[ivfQuantized]] and
    * [[ivfPrunedLayout]]. */
  private def quantizedProbeRank(candidates: DataFrame,
      probes: DataFrame): DataFrame =
    servingRank(servingScore(
      candidates.join(broadcast(probes), Seq("centroid_id"))))

  /** [[ivfQuantized]] served from a PARTITIONED layout — the query
    * that makes "probe = pruned I/O" executable instead of prose
    * (SCALE.md §Similarity). The assigned+quantized table is
    * materialized ONCE per corpus snapshot as a content-addressed
    * artifact partitioned by `centroid_id` (hive-style dirs, exactly
    * the bucketed-by-centroid layout a 100 TB corpus would carry);
    * the probe set — union of every query's 2 nearest clusters — is
    * driver-known (|queries|·nprobe ids, bounded by k=16), so the
    * read is an `IN (literal ids)` scan that prunes at the PARTITION
    * level: a 2-of-16 probe reads ~1/8th of the stored bytes before
    * a single row is deserialized. Plan-asserted in
    * PlanInvariantsSpec (non-empty PartitionFilters on the layout
    * scan); same rows as [[ivfQuantized]], same oracle. */
  /** The artifact-served IVF layout (assigned + int8-quantized,
    * hive-partitioned by cluster) — the stored index both the batch
    * pruned read and the streaming serving twin probe. ONE builder,
    * one content address: the online path serves the same bytes the
    * offline path built. */
  private[graft] def servingLayout(s: SparkSession, d: String): DataFrame = {
    val scores = fixedCentroidScores(s, d)
    graft.ArtifactStore.parquet(s, "ivf_layout",
        s"$d/embeddings.parquet", version = 1,
        partitionColumns = Seq("centroid_id")) {
      Tables.embeddings(s, d)
        .withColumn("centroid_id",
          element_at(scores, 1).getField("cid").cast("int"))
        .select(col("vec_id"), quantize(col("embedding")).as("vq"),
          col("centroid_id"))
    }
  }

  def ivfPrunedLayout(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val scores = fixedCentroidScores(s, d)
    // layout artifact: assignment is the same map-side argmax, storage
    // is int8-quantized, the partition column is the cluster id
    val layout = servingLayout(s, d)
    // probe selection on the tiny query side (same 2-probe rule);
    // centroid_id cast to int to match the partition column type
    val probes = quantizedProbes(e, scores)
      .withColumn("centroid_id", col("centroid_id").cast("int"))
    // the probed cluster set is driver-sized by construction
    // (≤ min(|queries|·2, k)): collecting it turns partition pruning
    // into a literal predicate the scan evaluates against directory
    // names, not data. A pure function of the corpus snapshot, so
    // cached per fingerprint — one scan job per snapshot, not one
    // per query construction (bench reps, Verify, the plan walkers).
    val fp = graft.ArtifactStore.fingerprint(s, s"$d/embeddings.parquet")
    val probedClusters = probedClusterCache.getOrElseUpdate(fp,
      probes.select(col("centroid_id")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted)
    val pruned = layout
      .filter(col("centroid_id").isin(probedClusters.map(Int.box): _*))
    quantizedProbeRank(pruned, probes)
  }

  private val probedClusterCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Int]]

  // ------------------- incremental IVF maintenance (r11) -----------

  /** The snapshot/new-batch split — the `dedup_incremental`
    * convention: the published corpus is vec_id ≡ 0‥7 (mod 10), the
    * arriving batch is ≡ 8,9. */
  private def ivfSnapshot(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 10 < 8)
  private def ivfBatch(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 10 >= 8)

  private val appendModelCache =
    scala.collection.concurrent.TrieMap.empty[String, KmeansModel]
  private[graft] def clearAppendModelCache(): Unit = appendModelCache.clear()

  /** Centroids trained on the SNAPSHOT slice only, frozen thereafter
    * — the model an incremental pipeline trained when it published
    * the snapshot and must NOT retrain per arriving batch. Served
    * from the artifact store per corpus fingerprint; recorded for the
    * generated oracle (the kmeans16 protocol). */
  private def appendModel(s: SparkSession, d: String): KmeansModel = {
    val input = s"$d/embeddings.parquet"
    val fp = graft.ArtifactStore.fingerprint(s, input)
    appendModelCache.getOrElseUpdate(fp, modelFromDf(
      graft.ArtifactStore.parquet(s, "ivf_append_model", input) {
        modelToDf(s, kmeansFitFull(ivfSnapshot(Tables.embeddings(s, d))))
      }))
  }

  /** INCREMENTAL INDEX MAINTENANCE (VERDICT r10 #5): a new vector
    * batch is assigned to the FROZEN snapshot-trained centroids and
    * appended to the served posting layout as a delta partition set —
    * no retraining, no base rewrite: the `dedup_incremental`
    * discipline applied to the ANN index, the only maintenance shape
    * that survives 100 TB ingest (a per-batch rebuild rescans the
    * corpus; this touches only the batch).
    *
    * Output is the per-centroid maintenance reconciliation: posting
    * counts of the served (base ∪ delta) layout split by origin, and
    * `n_mismatch` — the cardinality of the symmetric difference
    * between the SERVED posting set (read back from the two stored
    * artifacts) and a full REBUILD under the same frozen centroids.
    * The append contract is n_mismatch = 0 everywhere; the oracle
    * pins that expectation as a constant while independently
    * replaying every count from the spliced centroids, so a Spark
    * append/rebuild divergence (or a stale/corrupt artifact read)
    * breaks the hash. Append ≡ rebuild is additionally set-equality
    * tested in ScalaTest with a wrong-centroids control proving the
    * mismatch column can fire. */
  def ivfAppend(s: SparkSession, d: String): DataFrame = {
    val input = s"$d/embeddings.parquet"
    val emb = Tables.embeddings(s, d)
    val cents = appendModel(s, d).centroids
    val base = graft.ArtifactStore.parquet(s, "ivf_append_base", input,
      partitionColumns = Seq("centroid_id")) {
      ivfAssignTo(ivfSnapshot(emb), cents)
    }
    val delta = graft.ArtifactStore.parquet(s, "ivf_append_delta", input,
      partitionColumns = Seq("centroid_id")) {
      ivfAssignTo(ivfBatch(emb), cents)
    }
    ivfAppendReconcile(base, delta, ivfAssignTo(emb, cents))
  }

  /** INDEX DELETE MAINTENANCE — the other half of [[ivfAppend]]'s
    * story: a delete batch (dedup removals, takedowns, GDPR erasure —
    * here vec_id ≡ 3 mod 10) is TOMBSTONED against the served posting
    * layout, no partition rewrite: serving anti-joins postings with
    * the tombstone set at read time (merge-on-read, the
    * [[CdcOps]] MoR discipline applied to the ANN index). At 100 TB
    * the tombstone set shuffles on vec_id like any other join side —
    * no broadcast hint; AQE broadcasts it while it is small, and a
    * periodic compaction (the [[LayoutOps]] rewrite) folds tombstones
    * into the base when it is not.
    *
    * Output is the per-centroid delete reconciliation: postings
    * before, tombstones landing in the centroid, live postings after,
    * and `n_mismatch` — the symmetric difference between the
    * MoR-served live set and a full REBUILD over the surviving
    * vectors under the same frozen centroids. The MoR contract is
    * n_mismatch = 0 everywhere; the oracle pins that constant while
    * independently replaying every count from the spliced centroids
    * (a stale artifact, a tombstone leak, or an assign drift breaks
    * the hash), and the ScalaTest control injects a wrong tombstone
    * set to prove the column fires. */
  def ivfDelete(s: SparkSession, d: String): DataFrame = {
    val input = s"$d/embeddings.parquet"
    val emb = Tables.embeddings(s, d)
    val cents = appendModel(s, d).centroids
    // the served layout: the SAME content-addressed artifacts
    // ivfAppend maintains (shared fingerprint, so whichever query
    // runs first builds them; the store serves both)
    val base = graft.ArtifactStore.parquet(s, "ivf_append_base", input,
      partitionColumns = Seq("centroid_id")) {
      ivfAssignTo(ivfSnapshot(emb), cents)
    }
    val delta = graft.ArtifactStore.parquet(s, "ivf_append_delta", input,
      partitionColumns = Seq("centroid_id")) {
      ivfAssignTo(ivfBatch(emb), cents)
    }
    val tombs = graft.ArtifactStore.parquet(s, "ivf_tombstones", input) {
      emb.filter(col("vec_id") % 10 === 3).select(col("vec_id"))
    }
    val served = base.select(col("vec_id"), col("centroid_id"))
      .unionByName(delta.select(col("vec_id"), col("centroid_id")))
    val rebuild = ivfAssignTo(emb.filter(col("vec_id") % 10 =!= 3), cents)
    ivfDeleteReconcile(served, tombs, rebuild)
  }

  /** INDEX COMPACTION — the third leg of the maintenance triptych
    * ([[ivfAppend]] grows the index, [[ivfDelete]] tombstones it,
    * compaction FOLDS the accumulated state back into one base): the
    * merge-on-read view (base ∪ delta − tombstones) is rewritten as a
    * fresh partitioned artifact, after which readers drop the
    * anti-join and the tombstone set resets. At 100 TB this is the
    * periodic background rewrite every LSM-shaped store runs — cost
    * is one linear pass over live postings, amortized across the
    * batches since the last fold, and it bounds the serve-time
    * overhead MoR accrues (the [[graft.ops.LayoutOps]] compaction
    * story applied to the index).
    *
    * Output is the per-centroid compaction report: postings in (by
    * origin), tombstones applied, postings out, and `n_mismatch` —
    * the symmetric difference between the compacted artifact READ
    * BACK from the store and the MoR view it replaces. Compaction
    * must be invisible to readers: n_mismatch = 0 is the contract,
    * pinned by the generated oracle (which independently replays
    * every count from the spliced frozen centroids) and control-fired
    * in ScalaTest. */
  def ivfCompact(s: SparkSession, d: String): DataFrame = {
    val input = s"$d/embeddings.parquet"
    val emb = Tables.embeddings(s, d)
    val cents = appendModel(s, d).centroids
    val base = graft.ArtifactStore.parquet(s, "ivf_append_base", input,
      partitionColumns = Seq("centroid_id")) {
      ivfAssignTo(ivfSnapshot(emb), cents)
    }
    val delta = graft.ArtifactStore.parquet(s, "ivf_append_delta", input,
      partitionColumns = Seq("centroid_id")) {
      ivfAssignTo(ivfBatch(emb), cents)
    }
    val tombs = graft.ArtifactStore.parquet(s, "ivf_tombstones", input) {
      emb.filter(col("vec_id") % 10 === 3).select(col("vec_id"))
    }
    val mor = base.unionByName(delta)
      .join(tombs.select(col("vec_id"), lit(1L).as("__del")),
        Seq("vec_id"), "left")
    val compacted = graft.ArtifactStore.parquet(s, "ivf_compacted", input,
      partitionColumns = Seq("centroid_id")) {
      mor.filter(col("__del").isNull)
        .select(col("vec_id"), col("vq"), col("centroid_id"))
    }
    ivfCompactReconcile(mor, compacted)
  }

  /** Reconciliation tail of [[ivfCompact]], parameterized for the
    * ScalaTest control (inject a divergent compacted set to prove
    * `n_mismatch` fires). `mor` carries the pre-fold view with the
    * tombstone flag (`__del`) and origin split (vec_id mod — the
    * fixture convention, re-derived here from the id so the reconcile
    * needs no extra column plumbing). */
  private[graft] def ivfCompactReconcile(mor: DataFrame,
      compacted: DataFrame): DataFrame = {
    val live = mor.filter(col("__del").isNull)
      .select(col("vec_id"), col("centroid_id"))
    val cp = compacted.select(col("vec_id"), col("centroid_id"))
    val mism = cp.except(live).unionByName(live.except(cp))
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_mismatch"))
    mor.groupBy(col("centroid_id"))
      .agg(
        sum(when(col("vec_id") % 10 < 8, 1L).otherwise(0L)).as("n_in_base"),
        sum(when(col("vec_id") % 10 >= 8, 1L).otherwise(0L))
          .as("n_in_delta"),
        sum(when(col("__del").isNotNull, 1L).otherwise(0L))
          .as("n_tombstoned"),
        sum(when(col("__del").isNull, 1L).otherwise(0L)).as("n_out"))
      .join(mism, Seq("centroid_id"), "left")
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("n_in_base"), col("n_in_delta"), col("n_tombstoned"),
        col("n_out"), coalesce(col("n_mismatch"), lit(0L)).as("n_mismatch"))
      .orderBy(col("centroid_id"))
  }

  /** Reconciliation tail of [[ivfDelete]], parameterized for the
    * ScalaTest control (inject a divergent tombstone set to prove
    * `n_mismatch` fires). */
  private[graft] def ivfDeleteReconcile(served: DataFrame,
      tombs: DataFrame, rebuild: DataFrame): DataFrame = {
    // merge-on-read: flag tombstoned postings, never rewrite them
    val flagged = served.join(
      tombs.select(col("vec_id"), lit(1L).as("__del")), Seq("vec_id"), "left")
    val live = flagged.filter(col("__del").isNull)
      .select(col("vec_id"), col("centroid_id"))
    val rb = rebuild.select(col("vec_id"), col("centroid_id"))
    val mism = live.except(rb).unionByName(rb.except(live))
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_mismatch"))
    flagged.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_before"),
        sum(coalesce(col("__del"), lit(0L))).as("n_deleted"))
      .join(mism, Seq("centroid_id"), "left")
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("n_before"), col("n_deleted"),
        (col("n_before") - col("n_deleted")).as("n_live"),
        coalesce(col("n_mismatch"), lit(0L)).as("n_mismatch"))
      .orderBy(col("centroid_id"))
  }

  /** Map-side assignment to a frozen centroid set + int8-quantized
    * storage — the ivf_layout projection, shared by base build, delta
    * append and the rebuild control. */
  private[graft] def ivfAssignTo(emb: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame =
    emb.withColumn("centroid_id",
        element_at(centroidScoresLocal(cents, col("embedding")), 1)
          .getField("cid").cast("int"))
      .select(col("vec_id"), quantize(col("embedding")).as("vq"),
        col("centroid_id"))

  /** Reconciliation tail of [[ivfAppend]], parameterized for the
    * ScalaTest control (inject a divergent delta to prove
    * `n_mismatch` fires). */
  private[graft] def ivfAppendReconcile(base: DataFrame, delta: DataFrame,
      rebuild: DataFrame): DataFrame = {
    val served = base
      .select(col("vec_id"), col("centroid_id"), lit("base").as("src"))
      .unionByName(delta
        .select(col("vec_id"), col("centroid_id"), lit("delta").as("src")))
    val rb = rebuild.select(col("vec_id"), col("centroid_id"))
    val sv = served.select(col("vec_id"), col("centroid_id"))
    val mism = sv.except(rb).unionByName(rb.except(sv))
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_mismatch"))
    served.groupBy(col("centroid_id"))
      .agg(
        sum(when(col("src") === "base", 1L).otherwise(0L)).as("n_base"),
        sum(when(col("src") === "delta", 1L).otherwise(0L)).as("n_appended"),
        count(lit(1)).as("n_total"))
      .join(mism, Seq("centroid_id"), "left")
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("n_base"), col("n_appended"), col("n_total"),
        coalesce(col("n_mismatch"), lit(0L)).as("n_mismatch"))
      .orderBy(col("centroid_id"))
  }

  // ------------------- ANN recall/cost evaluation (r11) ------------

  /** Probe-count levels swept by [[annRecallEval]]. 16 = every
    * centroid, i.e. the EXACT search — it doubles as the ground
    * truth, which keeps the whole evaluation one equi-join pipeline
    * (no brute-force cross join, no bounded-pair allowlist entry). */
  private[graft] val RecallProbeLevels = Seq(1, 2, 4, 16)
  private[graft] val RecallK = 10

  /** RECALL/COST CURVE of the trained IVF index — the nprobe tuning
    * loop a production ANN deployment actually runs: for each probe
    * count, how much of the exact top-k does the pruned search
    * recover (`n_hits` of `n_queries`·k), and what does it cost
    * (`n_candidates` scored)? Everything is an exact integer — no
    * float recall ratio to diverge cross-engine; the consumer divides.
    *
    * The probes=16 level probes every centroid, so its candidate set
    * is the full corpus and its top-k IS the exact baseline: ground
    * truth falls out of the same pipeline as the measurements (its
    * n_hits must read n_queries·k — a self-check the oracle grades).
    *
    * Scale: assignment is the map-side argmax (zero shuffle); the
    * probe side is |queries|·Σlevels rows — broadcast by
    * construction (bounded query set, the sim_pq_topk convention);
    * candidate scoring is one equi-join on centroid_id; the only
    * wide ops are the per-(level, query) top-k window and the final
    * 4-group count. Evaluating recall on a SAMPLE of queries against
    * the full index is exactly how the tuning loop runs at 100 TB —
    * the corpus is never cross-joined. */
  def annRecallEval(s: SparkSession, d: String): DataFrame =
    // a pure function of the embeddings snapshot (4 report rows) —
    // tuned once per snapshot, then served (the kmeans16 protocol)
    graft.ArtifactStore.parquet(s, "ann_recall_eval",
      s"$d/embeddings.parquet", version = 1) {
      annRecallEvalOn(s, d)
    }.orderBy(col("probes"))

  /** Build path of [[annRecallEval]]. */
  private def annRecallEvalOn(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val scores = centroidScoresLocal(trainedKmeans(s, d).centroids,
      col("embedding"))
    val assigned = e
      .withColumn("centroid_id", element_at(scores, 1).getField("cid"))
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        scores.as("cs"))
      .select(col("query_id"), col("qe"),
        explode(array(RecallProbeLevels.map(lit): _*)).as("probes"),
        col("cs"))
      .select(col("query_id"), col("qe"), col("probes"),
        explode(expr("slice(cs, 1, probes)")).as("pc"))
      .select(col("probes"), col("query_id"), col("qe"),
        col("pc.cid").as("centroid_id"))
    val wTop = Window.partitionBy(col("probes"), col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val cand = assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", Vectors.cosine6(col("qe"), col("embedding")))
    val topK = cand.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= RecallK)
      .select(col("probes"), col("query_id"), col("vec_id"))
    val exact = topK.filter(col("probes") === 16)
      .select(col("query_id"), col("vec_id"))
    val hits = topK.join(exact, Seq("query_id", "vec_id"))
      .groupBy(col("probes")).agg(count(lit(1)).as("n_hits"))
    cand.groupBy(col("probes"))
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_candidates"))
      .join(hits, Seq("probes"))
      .select(col("probes").cast("int").as("probes"), col("n_queries"),
        col("n_candidates"), col("n_hits"))
      .orderBy(col("probes"))
  }

  /** Deterministic distributed k-means (Lloyd) — the trainer that
    * produces IVF's centroid set ([[centroids]]'s fixed 16 are
    * deterministic stand-ins for exactly this output). The 100 TB
    * shape, stage by stage:
    *
    *  - ASSIGN is the map-side argmax of [[centroidScoresLocal]]:
    *    zero shuffle, centroids ride along as a literal array (k is
    *    the IVF fanout — driver-sized by construction).
    *  - UPDATE shuffles only (k × dim) partial sums per partition:
    *    vectors are pre-quantized to fixed-point longs
    *    (round(x·10⁶)), so per-(cluster, dim) sums are EXACT
    *    integers — no float-summation order dependence anywhere in
    *    the trajectory. Each new centroid coordinate is one IEEE
    *    division of exact integers, so every iteration's centroids
    *    AND cluster sizes are identical across engines,
    *    partitionings and retries — the same fixed-point discipline
    *    the money aggregates use (ops/package.scala). Long sums
    *    overflow only past ~9·10¹² members per cluster at 10⁶ scale.
    *  - Fixed iteration count (no convergence action): the standard
    *    choice for layout jobs, where a few Lloyd rounds capture
    *    most of the distortion drop and a fixpoint isn't required.
    *
    * Returns the per-iteration (iter, centroid_id, n_assigned)
    * trajectory and the final centroids. Empty clusters keep their
    * previous centroid. Differential-tested against a single-node
    * reference implementation of the same arithmetic. */
  def kmeansFit(emb: DataFrame, k: Int = 16, iters: Int = 3,
      quantScale: Long = 1000000L)
      : (Seq[(Int, Long, Long)], Seq[(Long, Seq[Double])]) = {
    val m = kmeansFitFull(emb, k, iters, quantScale)
    (m.trajectory, m.centroids)
  }

  /** Trained-model record: the per-iteration (iter, centroid_id,
    * n_assigned) trajectory, the final centroids, and — the piece the
    * generated oracles need — the centroid snapshot each iteration's
    * ASSIGN step ran against (iter 1 assigns against the seeds, iter i
    * against the end-of-iter-(i-1) centroids). Every field is a pure,
    * engine-independent function of the input table thanks to the
    * fixed-point update arithmetic. */
  final case class KmeansModel(
      trajectory: Seq[(Int, Long, Long)],
      centroids: Seq[(Long, Seq[Double])],
      assignSnapshots: Seq[(Int, Seq[(Long, Seq[Double])])])

  /** [[kmeansFit]] plus the per-iteration assignment snapshots. */
  def kmeansFitFull(emb: DataFrame, k: Int = 16, iters: Int = 3,
      quantScale: Long = 1000000L): KmeansModel = {
    val qe = fanOut(emb).select(col("vec_id"), col("embedding"),
        transform(col("embedding"),
          x => round(x.cast("double") * quantScale).cast("long")).as("qv"))
      .localCheckpoint(true) // read once per iteration
    // deterministic seeding: the k lowest vec_ids
    var cents: Seq[(Long, Seq[Double])] =
      qe.orderBy(col("vec_id")).limit(k).collect().toSeq.map { r =>
        (r.getLong(0),
          r.getSeq[Long](2).toSeq.map(_.toDouble / quantScale))
      }.sortBy(_._1)
    val trajectory = Seq.newBuilder[(Int, Long, Long)]
    val snapshots = Seq.newBuilder[(Int, Seq[(Long, Seq[Double])])]
    for (it <- 1 to iters) {
      snapshots += ((it, cents))
      val assigned = qe.withColumn("cid",
        element_at(centroidScoresLocal(cents, col("embedding")), 1)
          .getField("cid"))
      // exact integer partial sums: k×dim rows per partition combine
      // map-side, k×dim total rows reach the driver
      val sums = assigned
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "q")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCid = sums.groupBy(_.getLong(0))
      cents = cents.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val n = rows.head.getLong(3)
            trajectory += ((it, cid, n))
            val coords = rows.sortBy(_.getInt(1))
              .map(r => r.getLong(2).toDouble / (n.toDouble * quantScale))
            (cid, coords.toSeq)
          case None => // empty cluster: keep previous centroid
            trajectory += ((it, cid, 0L))
            (cid, old)
        }
      }
    }
    KmeansModel(trajectory.result(), cents, snapshots.result())
  }

  /** The k-means trajectory as a graded query: (iter, centroid_id,
    * n_assigned) per Lloyd round. Iterative k-means is not one SQL
    * statement, but each round's ASSIGNMENT is — so the generated
    * oracle splices every iteration's centroid snapshot (deterministic
    * constants, fixed-point update) and has DuckDB replay the argmax
    * counts per round; the ScalaTest differential check additionally
    * replays the full update arithmetic single-node. */
  def kmeansSizes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    trainedKmeans(s, d).trajectory
      .toDF("iter", "centroid_id", "n_assigned")
      .orderBy(col("iter"), col("centroid_id"))
  }

  // --- PCA: distributed power iteration (r8) ----------------------

  /** Trained PCA record: corpus size, dimension, the exact per-dim
    * integer sums Σ round(x·10⁶) (the centering constants), and the
    * top principal component as fixed-point 10⁶-scaled longs. Every
    * field is an engine-independent pure function of the input table
    * (exact integer reductions; driver-side IEEE normalization on
    * exact inputs), which is what lets the generated oracle splice it. */
  final case class PcaModel(n: Long, dim: Int,
      sums: Seq[Long], component: Seq[Long]) {
    /** Σ sums_i·comp_i — the centering offset of the n-scaled
      * projection (nproj = n·dot − this). */
    def centerDot: Long =
      sums.zip(component).map { case (s, c) => s * c }.sum
  }

  private val pcaCache =
    scala.collection.concurrent.TrieMap.empty[String, PcaModel]
  private[graft] def clearPcaMemoryCache(): Unit = pcaCache.clear()

  /** Top principal component by distributed POWER ITERATION over the
    * centered covariance — dimensionality-reduction's training step as
    * a first-class operator (embedding whitening/compression is a
    * standard training-data-pipeline stage). Iteration t computes
    * u = Aᵀ(A v_t) for the CENTERED data matrix A without ever
    * materializing A or the d×d covariance:
    *
    *  - centered integer rows c_i = n·q_i − Σq_i (scale n·10⁶) make
    *    centering EXACT — no float mean subtraction;
    *  - per-row scalar w = Σ c_i·v_i is one narrow long-exact map
    *    (max |w| ≈ 64·(2n·10⁶)·10⁶ ≈ 10¹⁷ at the 2 000-row fixture —
    *    long-safe; at larger n drop to DECIMAL like stage 2);
    *  - u_j = Σ_rows w·c_j shuffles only d partial sums per partition
    *    via DECIMAL(38,0) exact aggregation (values reach ~10³⁰);
    *  - the driver normalizes the d exact integers to the next
    *    fixed-point unit vector (deterministic IEEE on exact inputs,
    *    the kmeans discipline), sign-canonicalized so the first
    *    nonzero coordinate is positive.
    *
    * AᵀA is PSD, so the iteration converges monotonically toward the
    * dominant eigenvector; the oracle never depends on convergence
    * quality because it splices the ACTUAL trained component. Scale:
    * each iteration is one narrow projection + one d-row-per-partition
    * partial aggregate — corpus-linear, model-sized driver traffic. */
  def pcaFit(emb: DataFrame, iters: Int = 8,
      quantScale: Long = 1000000L): PcaModel = {
    val qe = fanOut(emb).select(
        transform(col("embedding"),
          x => round(x.cast("double") * quantScale).cast("long")).as("qv"))
      .localCheckpoint(true) // read once per iteration
    val n = qe.count()
    require(n > 0, "pcaFit on an empty table")
    val sums = qe.select(posexplode(col("qv")).as(Seq("pos", "q")))
      .groupBy(col("pos")).agg(sum(col("q")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1).map(_._2).toSeq
    val dim = sums.length
    // FAIL-LOUD overflow guard on the stage-1 long arithmetic (review
    // finding): the per-row scalar w = Σ(n·q_i − sums_i)·comp_i is
    // plain Long math, bounded by dim · 2n·maxQ · quantScale with
    // maxQ the actual max |q_i| of THIS corpus. Past ~7e4 rows at 64
    // dims that bound crosses Long.MaxValue and the iteration would
    // train a silently wrong component the spliced-constant oracle
    // still replays consistently — corruption the grade cannot see.
    // A larger corpus must widen stage 1 to DECIMAL like stage 2.
    val maxQ = qe.select(max(aggregate(col("qv"), lit(0L),
      (acc, x) => greatest(acc, abs(x))))).head().getLong(0)
    require(BigInt(dim) * 2 * n * maxQ * quantScale <=
      BigInt(Long.MaxValue),
      s"pcaFit stage-1 long bound exceeded (n=$n, dim=$dim, " +
        s"maxQ=$maxQ, scale=$quantScale): switch the projection " +
        "stage to DECIMAL(38,0) before training at this size")
    var comp: Seq[Long] = Seq.fill(dim)(quantScale) // deterministic start
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    for (_ <- 1 to iters) {
      val centered = zip_with(col("qv"), typedLit(sums),
        (q, s) => lit(n) * q - s)
      val w = aggregate(
        zip_with(centered, typedLit(comp), (c, v) => c * v),
        lit(0L), (acc, x) => acc + x)
      val u = qe.select(w.as("w"), posexplode(centered).as(Seq("pos", "c")))
        .groupBy(col("pos"))
        .agg(sum(col("w").cast(dec) * col("c").cast(dec)).as("u"))
        .collect().map(r => r.getInt(0) -> BigDecimal(r.getDecimal(1)))
        .sortBy(_._1).map(_._2.toBigInt)
      val uu = u.map(_.toDouble)
      val norm = math.sqrt(uu.map(x => x * x).sum)
      comp =
        if (norm == 0.0) comp // degenerate zero-variance input: keep
        else uu.map(x => math.round(x / norm * quantScale)).toSeq
    }
    val canonical = comp.find(_ != 0L) match {
      case Some(lead) if lead < 0L => comp.map(-_)
      case _ => comp
    }
    PcaModel(n, dim, sums, canonical)
  }

  /** Serve-or-train through the artifact store + content-fingerprint
    * JVM cache — the [[trainedKmeans]] protocol verbatim. */
  private def trainedPca(s: SparkSession, d: String): PcaModel = {
    val input = s"$d/embeddings.parquet"
    val fp = graft.ArtifactStore.fingerprint(s, input)
    pcaCache.getOrElseUpdate(fp, {
      import s.implicits._
      val served = graft.ArtifactStore.parquet(s, "pca_pc1", input) {
        val m = pcaFit(Tables.embeddings(s, d))
        (Seq(("meta", -1, m.n), ("meta", -2, m.dim.toLong)) ++
          m.sums.zipWithIndex.map { case (v, i) => ("sum", i, v) } ++
          m.component.zipWithIndex.map { case (v, i) => ("comp", i, v) })
          .toDF("section", "pos", "v")
      }
      val rows = served.collect() // model-sized: 2·dim + 2 rows
      def sec(name: String): Seq[Long] = rows
        .filter(_.getString(0) == name)
        .sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      val meta = rows.filter(_.getString(0) == "meta")
        .map(r => r.getInt(1) -> r.getLong(2)).toMap
      PcaModel(meta(-1), meta(-2).toInt, sec("sum"), sec("comp"))
    })
  }

  /** Graded PCA query: per-label statistics of every embedding's
    * projection onto the trained top principal component — the
    * "how separable are my labels along the dominant variance
    * direction" diagnostic. The n-scaled projection
    * nproj = n·(Σ q_i·comp_i) − Σ sums_i·comp_i is EXACT long
    * arithmetic end to end; the only float ops are one division per
    * output cell (by the spliced n·10¹² denominator) + round(6), so
    * the generated oracle replays bit-for-bit. */
  def pcaProject(s: SparkSession, d: String): DataFrame = {
    val m = trainedPca(s, d)
    val denom = m.n.toDouble * 1.0e12 // n · quantScale²
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * 1000000L).cast("long"))
    val dot = aggregate(
      zip_with(qv, typedLit(m.component), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val nproj = lit(m.n) * dot - lit(m.centerDot)
    Tables.embeddings(s, d)
      .select(col("label"), nproj.as("nproj"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("nproj").cast(dec)).cast("double") /
          (count(lit(1)).cast("double") * lit(denom)), 6).as("mean_p1"),
        round(min(col("nproj")).cast("double") / lit(denom), 6).as("min_p1"),
        round(max(col("nproj")).cast("double") / lit(denom), 6).as("max_p1"))
      .orderBy(col("label"))
  }

  // --------------------------- hybrid retrieval (RRF fusion, r8) ---

  private val RrfK = 60
  private val RrfTopN = 50
  private val RrfTerms = Seq("vector", "scan")

  /** HYBRID retrieval with reciprocal-rank fusion — the RAG-stack
    * composition every retrieval pipeline runs: a keyword ranker
    * (distinct-query-term match count over `documents`) and a vector
    * ranker (round-6 cosine to the vec_id=0 query embedding, the
    * fixture's doc_id↔vec_id alignment) each produce a top-50, and
    * candidates fuse by RRF score Σ 1/(k + rank), k=60 (Cormack et
    * al.'s constant) — rank-based fusion needs no score calibration
    * between rankers, which is why it is the default hybrid combiner.
    *
    * Determinism: ranks are ints from fully tie-broken orderings,
    * the score is a sum of two exact int-ratio doubles evaluated in
    * the same expression shape the oracle uses, rounded 9.
    *
    * Scale shape: each ranker's top-50 is `orderBy().limit()` —
    * TakeOrdered, a distributed partial top-k, NOT a global sort —
    * and rank assignment happens DRIVER-side over the 50 survivors
    * (dim-sized, the centroid-collect discipline; a degenerate
    * one-partition window over them would be the same 50 rows with a
    * shuffle). Fusion is a full-outer join of two 50-row local
    * frames. */
  def hybridSearchRrf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val matches = RrfTerms
      .map(t => array_contains(TextOps.tokens(col("text")), t).cast("int"))
      .reduce(_ + _)
    // TakeOrdered preserves the sort on collect; ranks = positions
    val kwRanked = Tables.documents(s, d)
      .select(col("doc_id"), matches.as("m"))
      .filter(col("m") > 0)
      .orderBy(col("m").desc, col("doc_id"))
      .limit(RrfTopN)
      .collect().toIndexedSeq.zipWithIndex
      .map { case (r, i) => (r.getLong(0), i + 1) }
      .toDF("doc_id", "kw_rank")

    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"),
        Vectors.normCol(col("embedding")).as("qn"))
    val semRanked = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        Vectors.cosine6WithNorms(col("qe"), col("qn"),
          col("embedding"), Vectors.normCol(col("embedding"))).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id"))
      .limit(RrfTopN)
      .collect().toIndexedSeq.zipWithIndex
      .map { case (r, i) => (r.getLong(0), i + 1) }
      .toDF("doc_id", "sem_rank")

    kwRanked.join(semRanked, Seq("doc_id"), "full_outer")
      .withColumn("score", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("kw_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank")), lit(0.0)), 9))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
      .select(col("doc_id"), col("score"),
        coalesce(col("kw_rank"), lit(0)).as("kw_rank"),
        coalesce(col("sem_rank"), lit(0)).as("sem_rank"))
  }

  private def hybridRrfOracleSql: String = {
    val matchSql = RrfTerms
      .map(t => s"CAST(list_contains(string_split(text, ' '), '$t') AS INT)")
      .mkString(" + ")
    s"""WITH kw AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY m DESC, doc_id)
       |      AS kw_rank
       |  FROM (SELECT doc_id, $matchSql AS m FROM documents) t
       |  WHERE m > 0),
       |kw50 AS (SELECT doc_id, kw_rank FROM kw WHERE kw_rank <= $RrfTopN),
       |sem AS (
       |  SELECT v.vec_id AS doc_id,
       |    ${cos.format("v.embedding", "q.embedding")} AS cosine
       |  FROM embeddings v, embeddings q
       |  WHERE q.vec_id = 0 AND v.vec_id <> 0),
       |semr AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id)
       |      AS sem_rank FROM sem),
       |sem50 AS (SELECT doc_id, sem_rank FROM semr
       |  WHERE sem_rank <= $RrfTopN)
       |SELECT doc_id,
       |  round(COALESCE(CAST(1 AS DOUBLE) / ($RrfK + kw_rank), 0.0)
       |    + COALESCE(CAST(1 AS DOUBLE) / ($RrfK + sem_rank), 0.0), 9)
       |    AS score,
       |  CAST(COALESCE(kw_rank, 0) AS INT) AS kw_rank,
       |  CAST(COALESCE(sem_rank, 0) AS INT) AS sem_rank
       |FROM kw50 FULL OUTER JOIN sem50 USING (doc_id)
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  }

  /** Product-quantization model: codebook m holds the 16 (dense code
    * id → 8-dim centroid) entries for embedding dims [m·8, m·8+8).
    * 64 float32 dims compress to 8 byte-sized codes — 32× — which is
    * what lets a 100 TB embedding corpus's index fit the page cache. */
  final case class PqModel(codebooks: Seq[Seq[(Long, Seq[Double])]])

  /** Deterministic PQ trainer: a spherical Lloyd step per SUBSPACE,
    * all 8 subspaces trained in the SAME pass — one assignment
    * projection computes every subspace's argmax code map-side, and
    * one aggregate shuffles only the (m × code × pos) fixed-point
    * partial sums (8·16·8 = 1024 rows per partition, corpus-size
    * independent). Same exactness discipline as [[kmeansFitFull]]:
    * integer partial sums at 10⁶ scale, one IEEE division per
    * coordinate per round — centroids are engine-independent
    * constants, which is what lets [[pqGeneratedOracles]] splice them
    * into a real cross-engine VALUES-table grade. Seeds per subspace:
    * the k lowest vec_ids' subvectors (the kmeans seeding rule).
    * Empty codes keep their previous centroid. */
  def pqFit(emb: DataFrame, m: Int = 8, subDim: Int = 8, k: Int = 16,
      iters: Int = 2, quantScale: Long = 1000000L): PqModel = {
    val qe = fanOut(emb).select(col("vec_id"), col("embedding"),
        transform(col("embedding"),
          x => round(x.cast("double") * quantScale).cast("long")).as("qv"))
      .localCheckpoint(true) // read once per iteration
    val seedRows = qe.orderBy(col("vec_id")).limit(k).collect()
      .sortBy(_.getLong(0))
    var books: Seq[Seq[(Long, Seq[Double])]] = (0 until m).map { mi =>
      seedRows.zipWithIndex.map { case (r, i) =>
        (i.toLong, r.getSeq[Long](2).toSeq
          .slice(mi * subDim, (mi + 1) * subDim)
          .map(_.toDouble / quantScale))
      }.toSeq
    }
    for (_ <- 1 to iters) {
      val codeCols = (0 until m).map { mi =>
        element_at(centroidScoresLocal(books(mi),
          slice(col("embedding"), mi * subDim + 1, subDim)), 1)
          .getField("cid").as(s"c$mi")
      }
      val coded = qe.select(col("vec_id") +: col("qv") +: codeCols: _*)
      val sums = coded.select(explode(array((0 until m).map(mi =>
          struct(lit(mi).as("m"), col(s"c$mi").as("code"),
            slice(col("qv"), mi * subDim + 1, subDim).as("sq"))): _*))
          .as("p"))
        .select(col("p.m").as("m"), col("p.code").as("code"),
          posexplode(col("p.sq")).as(Seq("pos", "q")))
        .groupBy(col("m"), col("code"), col("pos"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .collect() // model-sized: m·k·subDim rows
      val byKey = sums.groupBy(r => (r.getInt(0), r.getLong(1)))
      books = books.zipWithIndex.map { case (cb, mi) =>
        cb.map { case (code, old) =>
          byKey.get((mi, code)) match {
            case Some(rows) =>
              val n = rows.head.getLong(4)
              (code, rows.sortBy(_.getInt(2))
                .map(r => r.getLong(3).toDouble / (n.toDouble * quantScale))
                .toSeq)
            case None => (code, old)
          }
        }
      }
    }
    PqModel(books)
  }

  private def pqToDf(s: SparkSession, model: PqModel): DataFrame = {
    import s.implicits._
    model.codebooks.zipWithIndex.flatMap { case (cb, mi) =>
      cb.flatMap { case (code, ce) => ce.zipWithIndex.map {
        case (v, pos) => (mi, code, pos, v) } }
    }.toDF("m", "code", "pos", "v")
  }

  private def pqFromDf(df: DataFrame): PqModel = {
    val rows = df.collect() // model-sized: m·k·subDim rows
    PqModel(rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (_, rs) =>
      rs.groupBy(_.getLong(1)).toSeq.sortBy(_._1).map { case (code, cs) =>
        (code, cs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq) }
    })
  }

  private val pqCache = scala.collection.concurrent.TrieMap
    .empty[String, PqModel]
  private[graft] def clearPqMemoryCache(): Unit = pqCache.clear()
  private def trainedPq(s: SparkSession, d: String): PqModel = {
    val input = s"$d/embeddings.parquet"
    val fp = graft.ArtifactStore.fingerprint(s, input)
    pqCache.getOrElseUpdate(fp, pqFromDf(
      graft.ArtifactStore.parquet(s, "pq8x16", input) {
        pqToDf(s, pqFit(Tables.embeddings(s, d)))
      }))
  }

  /** PQ top-3 — the production TWO-STAGE ANN read path:
    *
    *  1. ADC SHORTLIST: encode is a map-side projection (8
    *     literal-codebook argmaxes, zero shuffle, the exchange-free
    *     IVF-assignment shape); each query scores the RECONSTRUCTED
    *     vectors (`concat(codebook_m[code_m])`) — a linear scan over a
    *     corpus that stores 8 bytes/vector instead of 256 — and keeps
    *     the top 50 by PQ cosine.
    *  2. EXACT RE-RANK: only the shortlist (queries × 50 rows, bounded)
    *     joins back to the full-precision vectors for an exact round-6
    *     cosine, which orders the final top-3. Compressed scan decides
    *     WHAT to fetch; full precision decides the ORDER — recall is
    *     then the shortlist's containment rate, 0.77–0.93 on the
    *     worst-case uniform-random corpus (vs ~0.1 for raw ADC rank).
    *
    * Codebooks come from the content-addressed artifact store
    * ([[trainedPq]]), so the trainer runs once per corpus snapshot;
    * the generated oracle splices them as VALUES and DuckDB
    * independently replays encode, reconstruction, shortlist and
    * re-rank end to end. Recall vs exact top-k is additionally
    * asserted in ScalaTest. */
  def pqTopk(s: SparkSession, d: String): DataFrame = {
    val model = trainedPq(s, d)
    val e = Tables.embeddings(s, d)
    val codeCols = (0 until 8).map { mi =>
      element_at(centroidScoresLocal(model.codebooks(mi),
        slice(col("embedding"), mi * 8 + 1, 8)), 1)
        .getField("cid").cast("int").as(s"c$mi")
    }
    val recon = concat((0 until 8).map(mi =>
      element_at(typedLit(model.codebooks(mi).map(_._2)),
        col(s"c$mi") + 1)): _*)
    // the 8-subspace code assignment is THE PQ index — in production
    // it is a stored structure, not a per-query computation, so it
    // gets the content-addressed artifact treatment (codes are a pure
    // function of the corpus: the trained codebooks are themselves
    // corpus-deterministic). Reconstruction stays at read time (a
    // dictionary lookup); only the expensive 256-way × 8 scoring scan
    // is amortized.
    val coded = graft.ArtifactStore.parquet(s, "pq_codes",
        s"$d/embeddings.parquet") {
      e.select(col("vec_id") +: codeCols: _*)
    }
      .withColumn("rv", recon)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // Shortlist selection is a BOUNDED partial aggregate
    // ([[graft.functions.TopKAggregator]], k=50 per query), not a
    // row_number window: the window formulation shuffles and sorts the
    // whole corpus×queries candidate stream, the aggregator keeps 50
    // candidates per query per partition and merges k-vs-k — the same
    // swap `sim_cosine_topk_agg` demonstrates, and the shape that
    // survives 100 TB candidate volume (VERDICT r6 #5). Tie semantics
    // match the window exactly (score desc, id asc, scores
    // pre-rounded by cosine6). `qe` rejoins from the tiny broadcast
    // query side rather than riding through the aggregate.
    val topShort = udaf(new graft.functions.TopKAggregator(50))
    val shortlist = coded.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("pq_cosine", Vectors.cosine6(col("qe"), col("rv")))
      .groupBy(col("query_id"))
      .agg(topShort(col("pq_cosine"), col("vec_id")).as("top"))
      .select(col("query_id"), explode(col("top")).as("sc"))
      .select(col("query_id"), col("sc.id").as("neighbor_id"),
        col("sc.score").as("pq_cosine"))
      .join(broadcast(q), Seq("query_id"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    shortlist
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ve")), Seq("neighbor_id"))
      .withColumn("cosine", Vectors.cosine6(col("qe"), col("ve")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine"), col("pq_cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-distribution drift between corpus snapshots — the
    * monitoring check a production embedding pipeline runs per
    * release: has any label's centroid moved? Snapshots are simulated
    * from one table (the corpus_diff convention): A = vec_id%10<8,
    * B = vec_id%10>=2 (membership change drives the drift). Centroids
    * use the k-means fixed-point discipline — per-(label, dim) sums of
    * round(x·10⁶) longs are EXACT integers, one IEEE division per
    * coordinate — so both snapshots' centroids are engine-independent
    * and the round-6 cosine between them hash-matches the oracle.
    *
    * Scale shape: each snapshot is one scan → one (label × dim) hash
    * aggregate (64 rows per label per partition map-combined); the
    * centroid join is label-count-sized. Nothing pairwise. */
  def centroidDrift(s: SparkSession, d: String): DataFrame =
    centroidDriftOn(Tables.embeddings(s, d))

  /** Core of [[centroidDrift]], parameterized for tests and reuse. */
  def centroidDriftOn(emb: DataFrame): DataFrame = {
    def cent(f: DataFrame): DataFrame = f
      .select(col("label"), posexplode(transform(col("embedding"),
        x => round(x.cast("double") * 1000000L).cast("long")))
        .as(Seq("pos", "q")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .withColumn("v", col("s").cast("double") /
        (col("n").cast("double") * lit(1000000.0)))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
        p => p.getField("v")).as("cv"), max(col("n")).as("n"))
    val a = cent(emb.filter(col("vec_id") % 10 < 8))
      .select(col("label"), col("cv").as("cv_a"), col("n").as("n_a"))
    val b = cent(emb.filter(col("vec_id") % 10 >= 2))
      .select(col("label"), col("cv").as("cv_b"), col("n").as("n_b"))
    // FULL outer: a label present in only one snapshot is the most
    // drastic drift event of all — it must appear in the report (count
    // 0 on the missing side, NULL drift), not silently vanish
    a.join(b, Seq("label"), "full_outer")
      .withColumn("drift_cosine",
        when(col("cv_a").isNotNull && col("cv_b").isNotNull,
          Vectors.cosine6(col("cv_a"), col("cv_b"))))
      .select(col("label"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"), col("drift_cosine"))
      .orderBy(col("label"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_centroid_drift" -> centroidDrift,
    "sim_pq_topk" -> pqTopk, // generated oracle (spliced codebooks)
    "sim_kmeans_sizes" -> kmeansSizes, // generated oracle (spliced snapshots)
    "sim_pca_project" -> pcaProject, // generated oracle (spliced component)
    "search_hybrid_rrf" -> hybridSearchRrf,
    "sim_quantized_top1" -> quantizedTopK,
    "sim_cosine_topk" -> cosineTopK,
    "sim_cosine_topk_agg" -> cosineTopKAgg,
    "sim_mmr_diversify" -> ((s, d) => mmrDiversify(s, d)),
    "sim_threshold_join" -> thresholdJoin,
    "sim_threshold_lsh" -> thresholdLsh, // oracle: full SRP SQL replay

    "sim_ivf_assign" -> ivfAssign,
    "sim_ivf_probe" -> ivfProbe,
    "sim_filtered_topk" -> ivfFilteredTopk,
    "sim_ivf_trained" -> ivfTrained, // generated oracle (spliced centroids)
    "sim_ivf_quantized" -> ivfQuantized,
    "sim_ivf_pruned_layout" -> ivfPrunedLayout,
    "sim_ivf_append" -> ivfAppend, // generated oracle (frozen centroids)
    "sim_ivf_delete" -> ivfDelete, // generated oracle (frozen centroids)
    "sim_ann_recall_eval" -> annRecallEval, // generated oracle (kmeans16)
    "sim_ivf_compact" -> ivfCompact, // generated oracle (frozen centroids)
    "sim_nsw_topk" -> nswTopk, // oracle: full graph + walk replay
    "sim_nsw_append" -> nswAppend, // oracle: frozen build + batch walks
    "sim_nsw_delete" -> nswDelete, // oracle: full walk + tombstone MoR
    "sim_nsw_compact" -> nswCompact, // oracle: survivor build + walk
  )

  // private[ops]: TextOps's search_eval_hybrid oracle scores the same
  // round-6 cosine arm — ONE definition of the idiom (r15)
  private[ops] val cos = "round(list_cosine_similarity(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[])), 6)"

  /** Shortest round-trip decimal for a double (Java `Double.toString`):
    * DuckDB parses it back to the bit-identical IEEE value, so spliced
    * centroid constants carry no precision loss. */
  private def dlit(x: Double): String = x.toString

  /** The pruned-search oracle shape shared by `sim_ivf_probe` and
    * `sim_ivf_trained` (mirrors [[probeSearch]]: argmax assignment,
    * 2-probe selection, top-3 exact round-6 scoring). `centroidCte` is
    * the body of the `c(centroid_id, ce)` CTE — a table filter for the
    * fixed set, a spliced VALUES relation for the trained set. */
  private def probeOracleSql(centroidCte: String,
      candWhere: String = ""): String =
    s"""WITH c AS ($centroidCte),
       |assigned AS (SELECT e.vec_id, c.centroid_id, row_number() OVER (
       |  PARTITION BY e.vec_id ORDER BY
       |    ${cos.format("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |  FROM embeddings e CROSS JOIN c$candWhere),
       |a1 AS (SELECT vec_id, centroid_id FROM assigned WHERE rn = 1),
       |probes AS (SELECT e.vec_id AS query_id, e.embedding AS qe,
       |  c.centroid_id,
       |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    ${cos.format("e.embedding", "c.ce")} DESC, c.centroid_id) AS prn
       |  FROM embeddings e CROSS JOIN c WHERE e.vec_id < 10),
       |p2 AS (SELECT query_id, qe, centroid_id FROM probes WHERE prn <= 2),
       |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id,
       |  ${cos.format("p.qe", "ev.embedding")} AS cosine
       |  FROM p2 p JOIN a1 a ON a.centroid_id = p.centroid_id
       |  JOIN embeddings ev ON ev.vec_id = a.vec_id
       |  WHERE a.vec_id <> p.query_id),
       |r AS (SELECT query_id, neighbor_id, cosine, row_number() OVER (
       |  PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM cand)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
       |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** Trainer-derived oracles, GENERATED once a training run has
    * populated [[kmeansCache]] (the Verify protocol runs every query
    * before dumping `oracleSql`, so the constants exist by dump time —
    * the `etl_geohash` generated-SQL precedent). The splice is sound
    * because the fixed-point integer update makes every snapshot an
    * engine-independent constant of the input table; DuckDB then
    * independently replays each round's ASSIGNMENT (argmax over the
    * spliced snapshot) and the full pruned search, so the check is a
    * real cross-engine grade, not an echo of Spark's output. Empty
    * when zero tables are trained (nothing to splice) or several are
    * (ambiguous — dev sessions mixing SFs stay rows-only). */
  private def generatedOracles: Map[String, String] =
    kmeansCache.readOnlySnapshot().toMap match {
      case m if m.size == 1 =>
        val model = m.head._2
        val centVals = model.centroids
          .map { case (cid, ce) =>
            s"($cid, [${ce.map(dlit).mkString(", ")}])" }
          .mkString(",\n    ")
        val snapVals = model.assignSnapshots
          .flatMap { case (it, cents) => cents.map { case (cid, ce) =>
            s"($it, $cid, [${ce.map(dlit).mkString(", ")}])" } }
          .mkString(",\n    ")
        Map(
          "sim_ivf_trained" -> probeOracleSql(
            s"""SELECT * FROM (VALUES
               |    $centVals) AS t(centroid_id, ce)""".stripMargin),
          // full independent replay of the recall/cost sweep:
          // assignment argmax, per-level probe prefixes, candidate
          // scoring, top-k, and hits against the probes=16 (exact)
          // level — every output an exact integer
          "sim_ann_recall_eval" ->
            s"""WITH c AS (SELECT * FROM (VALUES
               |    $centVals) AS t(centroid_id, ce)),
               |a AS (SELECT vec_id, embedding, centroid_id FROM (
               |  SELECT e.vec_id, e.embedding, c.centroid_id,
               |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
               |      ${cos.format("e.embedding", "c.ce")} DESC,
               |      c.centroid_id) AS rn
               |  FROM embeddings e CROSS JOIN c) t WHERE rn = 1),
               |q AS (SELECT e.vec_id AS query_id, e.embedding AS qe,
               |    c.centroid_id,
               |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
               |      ${cos.format("e.embedding", "c.ce")} DESC,
               |      c.centroid_id) AS crank
               |  FROM embeddings e CROSS JOIN c WHERE e.vec_id < 10),
               |lv AS (SELECT unnest([1, 2, 4, 16]) AS probes),
               |pr AS (SELECT lv.probes, q.query_id, q.qe, q.centroid_id
               |  FROM q JOIN lv ON q.crank <= lv.probes),
               |cand AS MATERIALIZED (SELECT pr.probes, pr.query_id,
               |    a.vec_id, ${cos.format("pr.qe", "a.embedding")} AS cosine
               |  FROM pr JOIN a ON a.centroid_id = pr.centroid_id
               |  WHERE a.vec_id <> pr.query_id),
               |topk AS MATERIALIZED (SELECT probes, query_id, vec_id
               |  FROM (SELECT probes, query_id, vec_id, row_number()
               |      OVER (PARTITION BY probes, query_id
               |        ORDER BY cosine DESC, vec_id) AS rk FROM cand) t
               |  WHERE rk <= $RecallK),
               |ex AS (SELECT query_id, vec_id FROM topk WHERE probes = 16),
               |hits AS (SELECT t.probes, COUNT(*) AS n_hits FROM topk t
               |  JOIN ex ON ex.query_id = t.query_id
               |    AND ex.vec_id = t.vec_id
               |  GROUP BY t.probes),
               |cost AS (SELECT probes, COUNT(DISTINCT query_id)
               |    AS n_queries, COUNT(*) AS n_candidates
               |  FROM cand GROUP BY probes)
               |SELECT CAST(cost.probes AS INT) AS probes,
               |  CAST(n_queries AS BIGINT) AS n_queries,
               |  CAST(n_candidates AS BIGINT) AS n_candidates,
               |  CAST(n_hits AS BIGINT) AS n_hits
               |FROM cost JOIN hits ON hits.probes = cost.probes
               |ORDER BY probes""".stripMargin,
          "sim_kmeans_sizes" ->
            s"""WITH c AS (SELECT * FROM (VALUES
               |    $snapVals) AS t(iter, centroid_id, ce)),
               |scored AS (SELECT c.iter, c.centroid_id, e.vec_id,
               |  row_number() OVER (PARTITION BY c.iter, e.vec_id ORDER BY
               |    ${cos.format("e.embedding", "c.ce")} DESC, c.centroid_id)
               |    AS rn
               |  FROM embeddings e CROSS JOIN c),
               |n AS (SELECT iter, centroid_id, COUNT(*) AS cnt FROM scored
               |  WHERE rn = 1 GROUP BY iter, centroid_id)
               |SELECT g.iter AS iter, CAST(g.centroid_id AS BIGINT)
               |    AS centroid_id,
               |  CAST(COALESCE(n.cnt, 0) AS BIGINT) AS n_assigned
               |FROM (SELECT DISTINCT iter, centroid_id FROM c) g
               |LEFT JOIN n ON n.iter = g.iter
               |  AND n.centroid_id = g.centroid_id
               |ORDER BY iter, centroid_id""".stripMargin)
      case _ => Map.empty
    }

  /** Generated oracle for `sim_ivf_append` (the kmeans16 splice
    * protocol, from the snapshot-trained frozen model): DuckDB
    * independently replays the argmax assignment of EVERY vector to
    * the spliced centroids and derives all three counts from the
    * vec_id-mod split; `n_mismatch` is the pinned append-≡-rebuild
    * contract constant — a Spark-side divergence (or stale artifact
    * read) surfaces as a nonzero value and breaks the hash. */
  private def appendGeneratedOracle: Map[String, String] =
    appendModelCache.readOnlySnapshot().toMap match {
      case m if m.size == 1 =>
        val centVals = m.head._2.centroids
          .map { case (cid, ce) =>
            s"($cid, [${ce.map(dlit).mkString(", ")}])" }
          .mkString(",\n    ")
        Map("sim_ivf_append" ->
          s"""WITH c AS (SELECT * FROM (VALUES
             |    $centVals) AS t(centroid_id, ce)),
             |a AS (SELECT vec_id, centroid_id FROM (
             |  SELECT e.vec_id, c.centroid_id, row_number() OVER (
             |    PARTITION BY e.vec_id ORDER BY
             |      ${cos.format("e.embedding", "c.ce")} DESC, c.centroid_id)
             |    AS rn
             |  FROM embeddings e CROSS JOIN c) t WHERE rn = 1)
             |SELECT CAST(centroid_id AS BIGINT) AS centroid_id,
             |  CAST(COUNT(*) FILTER (WHERE vec_id % 10 < 8) AS BIGINT)
             |    AS n_base,
             |  CAST(COUNT(*) FILTER (WHERE vec_id % 10 >= 8) AS BIGINT)
             |    AS n_appended,
             |  COUNT(*) AS n_total,
             |  CAST(0 AS BIGINT) AS n_mismatch
             |FROM a GROUP BY centroid_id ORDER BY centroid_id""".stripMargin,
          // same independent assignment replay; the delete split and
          // the MoR-≡-rebuild contract constant derive the rest
          "sim_ivf_delete" ->
          s"""WITH c AS (SELECT * FROM (VALUES
             |    $centVals) AS t(centroid_id, ce)),
             |a AS (SELECT vec_id, centroid_id FROM (
             |  SELECT e.vec_id, c.centroid_id, row_number() OVER (
             |    PARTITION BY e.vec_id ORDER BY
             |      ${cos.format("e.embedding", "c.ce")} DESC, c.centroid_id)
             |    AS rn
             |  FROM embeddings e CROSS JOIN c) t WHERE rn = 1)
             |SELECT CAST(centroid_id AS BIGINT) AS centroid_id,
             |  COUNT(*) AS n_before,
             |  CAST(COUNT(*) FILTER (WHERE vec_id % 10 = 3) AS BIGINT)
             |    AS n_deleted,
             |  COUNT(*) - CAST(COUNT(*) FILTER (WHERE vec_id % 10 = 3)
             |    AS BIGINT) AS n_live,
             |  CAST(0 AS BIGINT) AS n_mismatch
             |FROM a GROUP BY centroid_id ORDER BY centroid_id""".stripMargin,
          // the compaction report from the same assignment replay:
          // origin split, tombstones applied, survivors, and the
          // pinned compaction-is-invisible contract
          "sim_ivf_compact" ->
          s"""WITH c AS (SELECT * FROM (VALUES
             |    $centVals) AS t(centroid_id, ce)),
             |a AS (SELECT vec_id, centroid_id FROM (
             |  SELECT e.vec_id, c.centroid_id, row_number() OVER (
             |    PARTITION BY e.vec_id ORDER BY
             |      ${cos.format("e.embedding", "c.ce")} DESC, c.centroid_id)
             |    AS rn
             |  FROM embeddings e CROSS JOIN c) t WHERE rn = 1)
             |SELECT CAST(centroid_id AS BIGINT) AS centroid_id,
             |  CAST(COUNT(*) FILTER (WHERE vec_id % 10 < 8) AS BIGINT)
             |    AS n_in_base,
             |  CAST(COUNT(*) FILTER (WHERE vec_id % 10 >= 8) AS BIGINT)
             |    AS n_in_delta,
             |  CAST(COUNT(*) FILTER (WHERE vec_id % 10 = 3) AS BIGINT)
             |    AS n_tombstoned,
             |  CAST(COUNT(*) FILTER (WHERE vec_id % 10 <> 3) AS BIGINT)
             |    AS n_out,
             |  CAST(0 AS BIGINT) AS n_mismatch
             |FROM a GROUP BY centroid_id ORDER BY centroid_id""".stripMargin)
      case _ => Map.empty
    }

  /** Same generated-oracle protocol for the PQ codebooks: once one
    * table's PQ model is trained (Verify runs every query before
    * dumping `oracleSql`), DuckDB replays encode (per-subspace argmax
    * over the spliced codebook), reconstruction (ordered flatten of
    * the code lookups) and the ADC search — a full independent replay,
    * not an echo of Spark's output. */
  private def pqGeneratedOracles: Map[String, String] =
    pqCache.readOnlySnapshot().toMap match {
      case mm if mm.size == 1 =>
        val vals = mm.head._2.codebooks.zipWithIndex.flatMap {
          case (cb, mi) => cb.map { case (code, ce) =>
            s"($mi, $code, [${ce.map(dlit).mkString(", ")}])" } }
          .mkString(",\n    ")
        Map("sim_pq_topk" ->
          s"""WITH cb AS (SELECT * FROM (VALUES
             |    $vals) AS t(m, code, ce)),
             |subs AS (SELECT e.vec_id, cb.m, cb.code,
             |  ${cos.format("e.embedding[cb.m*8+1 : cb.m*8+8]", "cb.ce")}
             |    AS cos
             |  FROM embeddings e CROSS JOIN cb),
             |enc AS (SELECT vec_id, m, code FROM (SELECT *,
             |    row_number() OVER (PARTITION BY vec_id, m
             |      ORDER BY cos DESC, code) AS rn FROM subs)
             |  WHERE rn = 1),
             |recon AS (SELECT enc.vec_id,
             |    flatten(list(cb2.ce ORDER BY enc.m)) AS rv
             |  FROM enc JOIN cb cb2 ON cb2.m = enc.m AND cb2.code = enc.code
             |  GROUP BY enc.vec_id),
             |q AS (SELECT vec_id AS query_id, embedding AS qe
             |  FROM embeddings WHERE vec_id < 10),
             |cand AS (SELECT q.query_id, r.vec_id AS neighbor_id,
             |  round(list_cosine_similarity(CAST(q.qe AS DOUBLE[]), rv), 6)
             |    AS pq_cosine
             |  FROM q CROSS JOIN recon r WHERE r.vec_id <> q.query_id),
             |sl AS (SELECT query_id, neighbor_id, pq_cosine,
             |  row_number() OVER (PARTITION BY query_id
             |    ORDER BY pq_cosine DESC, neighbor_id) AS srank FROM cand),
             |rr AS (SELECT s.query_id, s.neighbor_id, s.pq_cosine,
             |  round(list_cosine_similarity(CAST(q2.qe AS DOUBLE[]),
             |    CAST(ev.embedding AS DOUBLE[])), 6) AS cosine
             |  FROM sl s JOIN embeddings ev ON ev.vec_id = s.neighbor_id
             |  JOIN q q2 ON q2.query_id = s.query_id
             |  WHERE s.srank <= 50),
             |rk AS (SELECT query_id, neighbor_id, cosine, pq_cosine,
             |  row_number() OVER (PARTITION BY query_id
             |    ORDER BY cosine DESC, neighbor_id) AS rank FROM rr)
             |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
             |  cosine, pq_cosine
             |FROM rk WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)
      case _ => Map.empty
    }

  def oracles: Map[String, String] =
    staticOracles ++ generatedOracles ++ pqGeneratedOracles ++
      pcaGeneratedOracles ++ appendGeneratedOracle

  /** Generated oracle for `sim_pca_project` — same exactly-one-model
    * protocol as [[generatedOracles]]: the trained component, corpus
    * size, centering offset and denominator are spliced as constants;
    * DuckDB then independently replays the exact-integer projection
    * (n·Σ q_i·c_i − K in HUGEINT) and the per-label statistics with
    * the identical one-division-then-round(6) float tail. */
  private def pcaGeneratedOracles: Map[String, String] =
    pcaCache.readOnlySnapshot().toMap match {
      case m if m.size == 1 =>
        val model = m.head._2
        val compVals = model.component.zipWithIndex
          .map { case (q, i) => s"(${i + 1}, $q)" }.mkString(", ")
        val a = dlit(model.n.toDouble * 1.0e12)
        Map("sim_pca_project" ->
          s"""WITH c AS (SELECT * FROM (VALUES
             |    $compVals) AS t(pos, q)),
             |p AS (SELECT e.vec_id, e.label,
             |    ${model.n} * SUM(CAST(round(CAST(e.embedding[e.pos]
             |        AS DOUBLE) * 1000000) AS BIGINT) * c.q)
             |      - ${model.centerDot} AS nproj
             |  FROM (SELECT vec_id, label, embedding,
             |      unnest(range(1, len(embedding) + 1)) AS pos
             |    FROM embeddings) e
             |  JOIN c ON c.pos = e.pos
             |  GROUP BY e.vec_id, e.label)
             |SELECT label, COUNT(*) AS n_vecs,
             |  round(CAST(SUM(CAST(nproj AS HUGEINT)) AS DOUBLE)
             |    / (CAST(COUNT(*) AS DOUBLE) * $a), 6) AS mean_p1,
             |  round(CAST(MIN(nproj) AS DOUBLE) / $a, 6) AS min_p1,
             |  round(CAST(MAX(nproj) AS DOUBLE) / $a, 6) AS max_p1
             |FROM p GROUP BY label ORDER BY label""".stripMargin)
      case _ => Map.empty
    }

  /** Keys whose DuckDB SQL is GENERATED by splicing trained
    * constants (kmeans snapshots / PQ codebooks) rather than
    * hand-written — the provenance marker CatalogDump and the
    * oracle-catalog audit read. Present in [[oracles]] only after a
    * training run has populated exactly one cache entry. */
  private[graft] val generatedOracleKeys: Set[String] =
    Set("sim_kmeans_sizes", "sim_ivf_trained", "sim_pq_topk",
      "sim_pca_project", "sim_ivf_append", "sim_ivf_delete",
      "sim_ann_recall_eval", "sim_ivf_compact")

  /** DuckDB replay of [[nswTopk]] end to end: the bounded-degree
    * graph re-derived from the BUCKETED candidate rule (nearest-of-16
    * assignment, [[NswBuildProbes]]-cell probes, top-d per node over
    * probed-cell members — the [[nswBuild]] semantics), then the
    * [[NswHops]]-hop beam walk unrolled as CTE levels — each level
    * deduplicates carried scores (deterministic per (query, node), so
    * DISTINCT is exact), prunes to the beam under (score desc, node),
    * and the final level's top-[[NswK]] is the answer. `sample` ≠
    * empty switches on the SCALED form: edge derivation replays only
    * md5-sampled source nodes against the Spark-dumped
    * `aux_nsw_edges` with the zero-symmetric-difference gate (the
    * ScaledOracles mechanism) — the assignment pass stays full (it is
    * linear, n×16) because sampled sources need every candidate's
    * cell; the walk always replays in full, and f0 carries the mism
    * gate too so ANY sampled divergence yields ZERO rows (the
    * winnowScaledSql loud-failure contract — ADVICE r11 #2; gating
    * only edgesx would degrade the walk to entry-set top-k and still
    * emit rows). */
  private[ops] def nswOracleSql(sample: String = ""): String =
    nswWalkOracleSql(gPred = "", qPred = s"vec_id < $NswQueries",
      outK = NswK, outSrc = "query_id", outDst = "vec_id",
      sample = sample, auxTable = "aux_nsw_edges")

  /** DuckDB replay of [[nswAppend]]: the FROZEN graph re-derived over
    * the snapshot slice only (same bucketed rule), then every BATCH
    * node's insertion walk — identical machinery to [[nswOracleSql]],
    * different graph membership / query side / output arity. */
  private[ops] def nswAppendOracleSql(sample: String = ""): String =
    nswWalkOracleSql(gPred = "vec_id % 10 < 8",
      qPred = "vec_id % 10 >= 8",
      outK = NswDegree, outSrc = "src", outDst = "dst",
      sample = sample, auxTable = "aux_nsw_snap_edges",
      hops = NswAppendHops)

  /** DuckDB replay of [[nswDelete]]: the FULL-corpus walk (identical
    * to [[nswOracleSql]] — same graph, same entries, same hops), with
    * the tombstone split excluded from the final beam before the
    * serving rank — independently re-deriving the merge-on-read
    * contract end to end. */
  private[ops] def nswDeleteOracleSql(sample: String = ""): String =
    nswWalkOracleSql(gPred = "", qPred = s"vec_id < $NswQueries",
      outK = NswK, outSrc = "query_id", outDst = "vec_id",
      sample = sample, auxTable = "aux_nsw_edges",
      outWhere = "node % 10 <> 3")

  /** DuckDB replay of [[nswCompact]]: bucketed build + walk re-derived
    * over the SURVIVING nodes only (gPred restricts graph membership,
    * centroids and entries alike — exactly the compacted build's
    * inputs); the query side stays the full external query set. */
  private[ops] def nswCompactOracleSql(sample: String = ""): String =
    nswWalkOracleSql(gPred = "vec_id % 10 <> 3",
      qPred = s"vec_id < $NswQueries",
      outK = NswK, outSrc = "query_id", outDst = "vec_id",
      sample = sample, auxTable = "aux_nsw_compact_edges")

  /** Shared generator for the NSW walk oracles: `gPred` restricts
    * GRAPH membership (build inputs, entries — empty = whole corpus),
    * `qPred` selects the query side, `outK`/`outSrc`/`outDst` shape
    * the final projection. `sample` ≠ empty switches the edge
    * derivation to the sampled-vs-aux form (see [[nswOracleSql]]'s
    * doc for the gating contract). */
  private def nswWalkOracleSql(gPred: String, qPred: String,
      outK: Int, outSrc: String, outDst: String,
      sample: String, auxTable: String,
      hops: Int = NswHops, outWhere: String = ""): String = {
    val gWhere = if (gPred.isEmpty) "" else s" WHERE $gPred"
    val cosQ = "round(list_cosine_similarity(q.qe, vv.ve), 6)"
    // the bucketed candidate rule, shared by both forms: nearest-of-16
    // cell assignment for every node + each node's NswBuildProbes
    // probe cells (rn orders by round-6 cosine desc, centroid id —
    // the centroidScoresLocal tie rule)
    val bucketCtes =
      s"""cent AS MATERIALIZED (
         |  SELECT vec_id AS cid, ve AS ce FROM gvecs WHERE vec_id < 16),
         |crank AS MATERIALIZED (
         |  SELECT v.vec_id, c.cid, row_number() OVER (
         |    PARTITION BY v.vec_id
         |    ORDER BY round(list_cosine_similarity(v.ve, c.ce), 6) DESC,
         |      c.cid) AS rn
         |  FROM gvecs v CROSS JOIN cent c),
         |asg AS MATERIALIZED (SELECT vec_id, cid FROM crank WHERE rn = 1),
         |prb AS MATERIALIZED (
         |  SELECT vec_id, cid FROM crank WHERE rn <= $NswBuildProbes)"""
        .stripMargin
    def bucketEdges(srcWhere: String) =
      s"""  SELECT src, dst FROM (
         |    SELECT p.vec_id AS src, m.vec_id AS dst, row_number() OVER (
         |      PARTITION BY p.vec_id
         |      ORDER BY round(list_cosine_similarity(a.ve, b.ve), 6) DESC,
         |        m.vec_id) AS rn
         |    FROM prb p JOIN asg m ON m.cid = p.cid
         |      AND m.vec_id <> p.vec_id
         |    JOIN vecs a ON a.vec_id = p.vec_id
         |    JOIN vecs b ON b.vec_id = m.vec_id$srcWhere) t
         |  WHERE rn <= $NswDegree""".stripMargin
    val edgeCtes = if (sample.isEmpty)
      s"""$bucketCtes,
         |edgesx AS MATERIALIZED (
         |${bucketEdges("")})""".stripMargin
    else
      s"""$bucketCtes,
         |chk AS MATERIALIZED (
         |${bucketEdges(s"\n    WHERE ${sample.replace("vec_id", "p.vec_id")}")}),
         |auxe AS MATERIALIZED (SELECT src, dst FROM $auxTable),
         |mism AS MATERIALIZED (
         |  SELECT * FROM (SELECT src, dst FROM chk
         |    EXCEPT SELECT src, dst FROM auxe
         |    WHERE ${sample.replace("vec_id", "src")}) t1
         |  UNION ALL
         |  SELECT * FROM (SELECT src, dst FROM auxe
         |    WHERE ${sample.replace("vec_id", "src")}
         |    EXCEPT SELECT src, dst FROM chk) t2),
         |edgesx AS MATERIALIZED (
         |  SELECT src, dst FROM auxe
         |  WHERE (SELECT COUNT(*) FROM mism) = 0)""".stripMargin
    val f0Gate = if (sample.isEmpty) ""
    else "\n    AND (SELECT COUNT(*) FROM mism) = 0"
    val hopCtes = (1 to hops).map { h =>
      s"""f$h AS MATERIALIZED (
         |  SELECT query_id, node, score FROM (
         |    SELECT query_id, node, score, row_number() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, node) AS rn
         |    FROM (SELECT DISTINCT query_id, node, score FROM (
         |      SELECT query_id, node, score FROM f${h - 1}
         |      UNION ALL
         |      SELECT f.query_id, g.dst AS node, $cosQ AS score
         |      FROM f${h - 1} f
         |      JOIN edgesu g ON g.src = f.node
         |      JOIN vecs vv ON vv.vec_id = g.dst
         |      JOIN q ON q.query_id = f.query_id
         |      WHERE g.dst <> f.query_id) u) du) t
         |  WHERE rn <= $NswBeam)""".stripMargin
    }.mkString(",\n")
    s"""WITH vecs AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve
       |  FROM embeddings),
       |gvecs AS MATERIALIZED (
       |  SELECT vec_id, ve FROM vecs$gWhere),
       |$edgeCtes,
       |edgesu AS MATERIALIZED (
       |  SELECT src, dst FROM edgesx
       |  UNION SELECT dst, src FROM edgesx),
       |q AS MATERIALIZED (
       |  SELECT vec_id AS query_id, ve AS qe FROM vecs
       |  WHERE $qPred),
       |entries AS MATERIALIZED (
       |  SELECT vec_id AS node FROM gvecs ORDER BY vec_id LIMIT $NswBeam),
       |f0 AS MATERIALIZED (
       |  SELECT query_id, node, score FROM (
       |    SELECT q.query_id, e.node,
       |      round(list_cosine_similarity(q.qe, vv.ve), 6) AS score,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round(list_cosine_similarity(q.qe, vv.ve), 6) DESC,
       |          e.node) AS rn
       |    FROM q CROSS JOIN entries e
       |    JOIN vecs vv ON vv.vec_id = e.node
       |    WHERE e.node <> q.query_id) t
       |  WHERE rn <= $NswBeam$f0Gate),
       |$hopCtes
       |SELECT query_id AS $outSrc, CAST(rank AS BIGINT) AS rank,
       |  node AS $outDst, score
       |FROM (SELECT query_id, node, score, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, node) AS rank
       |  FROM f$hops${if (outWhere.isEmpty) "" else s" WHERE $outWhere"}) t
       |WHERE rank <= $outK ORDER BY $outSrc, rank""".stripMargin
  }

  private def topkOracle: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
       |  FROM embeddings WHERE vec_id < 10),
       |v AS (SELECT vec_id AS neighbor_id, embedding AS ve
       |  FROM embeddings WHERE vec_id >= 10),
       |scored AS (SELECT query_id, neighbor_id,
       |  ${cos.format("qe", "ve")} AS cosine FROM q CROSS JOIN v),
       |r AS (SELECT query_id, neighbor_id, cosine, row_number() OVER (
       |  PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
       |  AS rank FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val staticOracles: Map[String, String] = Map(
    "sim_threshold_lsh" -> thresholdLshOracleSql,
    "sim_nsw_topk" -> nswOracleSql(),
    "sim_nsw_append" -> nswAppendOracleSql(),
    "sim_nsw_delete" -> nswDeleteOracleSql(),
    "sim_nsw_compact" -> nswCompactOracleSql(),
    "search_hybrid_rrf" -> hybridRrfOracleSql,
    "sim_centroid_drift" ->
      // same fixed-point centroids: exact integer sums of round(x·1e6),
      // one double division per coordinate, round-6 cosine
      """WITH pa AS (SELECT label, pos,
        |    SUM(CAST(round(CAST(embedding[pos] AS DOUBLE) * 1000000)
        |      AS BIGINT)) AS s,
        |    COUNT(*) AS n
        |  FROM (SELECT label, embedding,
        |      unnest(range(1, len(embedding) + 1)) AS pos
        |    FROM embeddings WHERE vec_id % 10 < 8)
        |  GROUP BY label, pos),
        |ca AS (SELECT label,
        |    list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
        |      ORDER BY pos) AS cv,
        |    MAX(n) AS n FROM pa GROUP BY label),
        |pb AS (SELECT label, pos,
        |    SUM(CAST(round(CAST(embedding[pos] AS DOUBLE) * 1000000)
        |      AS BIGINT)) AS s,
        |    COUNT(*) AS n
        |  FROM (SELECT label, embedding,
        |      unnest(range(1, len(embedding) + 1)) AS pos
        |    FROM embeddings WHERE vec_id % 10 >= 2)
        |  GROUP BY label, pos),
        |cb AS (SELECT label,
        |    list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
        |      ORDER BY pos) AS cv,
        |    MAX(n) AS n FROM pb GROUP BY label)
        |SELECT COALESCE(ca.label, cb.label) AS label,
        |  CAST(COALESCE(ca.n, 0) AS BIGINT) AS n_a,
        |  CAST(COALESCE(cb.n, 0) AS BIGINT) AS n_b,
        |  CASE WHEN ca.cv IS NOT NULL AND cb.cv IS NOT NULL
        |    THEN round(list_cosine_similarity(ca.cv, cb.cv), 6)
        |  END AS drift_cosine
        |FROM ca FULL OUTER JOIN cb ON ca.label = cb.label
        |ORDER BY label""".stripMargin,
    "sim_ivf_probe" -> probeOracleSql(
      """SELECT vec_id AS centroid_id, embedding AS ce
        |  FROM embeddings WHERE vec_id < 16""".stripMargin),
    // the same pruned-search replay with the tenant predicate applied
    // at the assignment stage (pre-filter: excluded vectors are never
    // assigned, scored, or ranked)
    "sim_filtered_topk" -> probeOracleSql(
      """SELECT vec_id AS centroid_id, embedding AS ce
        |  FROM embeddings WHERE vec_id < 16""".stripMargin,
      candWhere = " WHERE e.vec_id % 3 = 1"),
    "sim_quantized_top1" ->
      """WITH qe AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed
        |  FROM embeddings),
        |mx AS (SELECT vec_id, ed,
        |  list_max(list_transform(ed, y -> abs(y))) AS m FROM qe),
        |qz AS (SELECT vec_id,
        |  list_transform(ed, x -> CAST(round(x * 127.0 / m) AS BIGINT)) AS z
        |  FROM mx),
        |q AS (SELECT vec_id AS query_id, z AS qq FROM qz WHERE vec_id < 10),
        |v AS (SELECT vec_id AS neighbor_id, z AS vq FROM qz WHERE vec_id >= 10),
        |scored AS (SELECT query_id, neighbor_id,
        |  round(list_dot_product(qq, vq) /
        |    (sqrt(list_dot_product(qq, qq)) * sqrt(list_dot_product(vq, vq))), 6)
        |    AS qcos
        |  FROM q CROSS JOIN v),
        |r AS (SELECT query_id, neighbor_id, qcos, row_number() OVER (
        |  PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rn
        |  FROM scored)
        |SELECT query_id, neighbor_id, qcos FROM r WHERE rn = 1
        |ORDER BY query_id""".stripMargin,
    "sim_cosine_topk_agg" -> topkOracle,
    "sim_mmr_diversify" -> mmrOracleSql,
    "sim_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
         |  FROM embeddings WHERE vec_id < 10),
         |v AS (SELECT vec_id AS neighbor_id, embedding AS ve
         |  FROM embeddings WHERE vec_id >= 10),
         |scored AS (SELECT query_id, neighbor_id,
         |  ${cos.format("qe", "ve")} AS cosine FROM q CROSS JOIN v),
         |r AS (SELECT query_id, neighbor_id, cosine, row_number() OVER (
         |  PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
         |  AS rank FROM scored)
         |SELECT query_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "sim_threshold_join" ->
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${cos.format("a.embedding", "b.embedding")} AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE a.vec_id < 300 AND b.vec_id < 300
         |  AND ${cos.format("a.embedding", "b.embedding")} >= 0.3
         |ORDER BY a_id, b_id""".stripMargin,
    "sim_ivf_assign" ->
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS ce
         |  FROM embeddings WHERE vec_id < 16),
         |scored AS (SELECT e.vec_id, c.centroid_id,
         |  ${cos.format("e.embedding", "c.ce")} AS cosine
         |  FROM embeddings e CROSS JOIN c),
         |best AS (SELECT vec_id, centroid_id, row_number() OVER (
         |  PARTITION BY vec_id ORDER BY cosine DESC, centroid_id) AS rn
         |  FROM scored)
         |SELECT centroid_id, COUNT(*) AS n_members FROM best
         |WHERE rn = 1 GROUP BY centroid_id ORDER BY centroid_id""".stripMargin,
    "sim_ivf_quantized" -> ivfQuantizedOracleSql,
    // identical semantics over the partitioned layout: pruning only
    // removes clusters no probe joins with, so the oracle is shared
    "sim_ivf_pruned_layout" -> ivfQuantizedOracleSql,
  )

  /** Shared by `sim_ivf_quantized` and `sim_ivf_pruned_layout`:
    * [[ivfQuantized]] and [[ivfPrunedLayout]] compute the same rows —
    * the partitioned layout changes WHERE candidate bytes live (and
    * how few are read), not which candidates score. */
  private def ivfQuantizedOracleSql: String =
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS ce
         |  FROM embeddings WHERE vec_id < 16),
         |ed AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed
         |  FROM embeddings),
         |mx AS (SELECT vec_id, ed,
         |  list_max(list_transform(ed, y -> abs(y))) AS m FROM ed),
         |qz AS (SELECT vec_id,
         |  list_transform(ed, x -> CAST(round(x * 127.0 / m) AS BIGINT)) AS z
         |  FROM mx),
         |assigned AS (SELECT e.vec_id, c.centroid_id, row_number() OVER (
         |  PARTITION BY e.vec_id ORDER BY
         |    ${cos.format("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
         |  FROM embeddings e CROSS JOIN c),
         |a1 AS (SELECT vec_id, centroid_id FROM assigned WHERE rn = 1),
         |probes AS (SELECT e.vec_id AS query_id, c.centroid_id,
         |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |    ${cos.format("e.embedding", "c.ce")} DESC, c.centroid_id) AS prn
         |  FROM embeddings e CROSS JOIN c WHERE e.vec_id < 10),
         |p2 AS (SELECT query_id, centroid_id FROM probes WHERE prn <= 2),
         |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id,
         |  round(list_dot_product(zq.z, zv.z) /
         |    (sqrt(list_dot_product(zq.z, zq.z)) *
         |     sqrt(list_dot_product(zv.z, zv.z))), 6) AS qcos
         |  FROM p2 p JOIN a1 a ON a.centroid_id = p.centroid_id
         |  JOIN qz zq ON zq.vec_id = p.query_id
         |  JOIN qz zv ON zv.vec_id = a.vec_id
         |  WHERE a.vec_id <> p.query_id),
         |r AS (SELECT query_id, neighbor_id, qcos, row_number() OVER (
         |  PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rank
         |  FROM cand)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, qcos
         |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
}
