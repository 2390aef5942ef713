package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.4 A3 + §2.7 X1/X2): exact
  * hash dedup, first-wins keyed dedup, character-shingle Jaccard
  * near-dup, and MinHash+LSH banding as the 100 TB-scale path.
  *
  * Reference parity: the reference dedups at the sink via the
  * `LALVOTERID` unique index (`ON CONFLICT DO NOTHING`,
  * `load.ts:357-360`), keeping the FIRST inserted row. `firstWins`
  * reproduces exactly that semantics as a window; `exactDedup` is the
  * content-hash generalization used in corpus cleaning.
  *
  * Scale notes: exact dedup and first-wins are one shuffle on the key.
  * The all-pairs Jaccard join is intentionally bounded (id < 200 —
  * it is the *oracle* for the LSH path, not the scale path). MinHash
  * LSH is the scale path: signatures are computed in one explode +
  * groupBy pass, banding turns all-pairs into equi-join buckets, and
  * only bucket-mates are verified — no cross product anywhere.
  */
object DedupOps {

  /** Character 15-gram shingles at stride 5, as a distinct array.
    * The sequence stop is `greatest(len-14, 1)` INCLUSIVE: a ≤15-char
    * text yields one (short) shingle rather than sequence(1,0,...),
    * which THROWS in Spark ("Illegal sequence boundaries") while
    * DuckDB's exclusive range() returned empty — both a crash and an
    * engine divergence (caught in review). The oracle mirrors the
    * inclusive stop with range(1, stop+1, 5). */
  def shingles(text: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - 14, lit(1)), lit(5)),
      i => substring(text, i, lit(15))))

  private[ops] val shinglesSql =
    "list_distinct([%s[i:i+14] for i in range(1, greatest(len(%s)-14, 1)+1, 5)])"

  /** Exact-Jaccard between two distinct shingle arrays, as a double
    * (int/int division — engine-independent). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      (size(a) + size(b) - size(array_intersect(a, b)))

  /** X1: exact dedup on normalized content — keep the smallest doc_id
    * per distinct normalized text. The shuffle key is the SHA-256 of
    * the normalized text, NOT the text itself: grouping by the raw
    * body makes the entire corpus the shuffle payload (38 s at sf0.1;
    * 100 TB shuffled at 100 TB), while the digest — unhexed to true
    * 32-byte binary; `sha2` itself returns a 64-char hex string — is
    * fixed-width with identical grouping semantics (collisions are
    * 2^-128-improbable). The oracle groups by the equivalent digest
    * (hex vs binary key is a bijection, and the key itself is not
    * output). */
  def exactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(unhex(sha2(lower(trim(col("text"))), 256)).as("norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** A3 first-wins dedup: earliest event per (user_id, event_type),
    * exactly the reference's keep-first-inserted sink semantics. */
  def firstWins(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_dropped", count(lit(1)).over(
        Window.partitionBy(col("user_id"), col("event_type"))) - 1)
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("n_dropped"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** X2 oracle form: exact shingle-Jaccard near-dup pairs on a bounded
    * id range (the ground truth the LSH path is tested against). */
  def jaccardNearDup(s: SparkSession, d: String): DataFrame = {
    val t0 = Tables.documents(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
    // fan the STREAM side out before shingling: the 200-doc slice sits
    // in one parquet row group = one task, which serialized all ~20k
    // pair verifications (array_intersect over ~2k-shingle arrays)
    // onto one core (measured 1.3 s / 4 tasks at sf0.1). The exchange
    // ships (doc_id, text) — raw text, 3× narrower than the shingle
    // array — and the shingle projection + pair verify run post-
    // exchange on every core. Build side stays scan-rooted (no
    // exchange before the broadcast). Results are join-order
    // independent; the final orderBy pins the output.
    val t = fanOut(t0).select(col("doc_id"), shingles(col("text")).as("sh"))
    val a = t.select(col("doc_id").as("a_id"), col("sh").as("sa"))
    val b = t0.select(col("doc_id").as("b_id"),
      shingles(col("text")).as("sb"))
    a.join(broadcast(b), col("a_id") < col("b_id"))
      // materialize the intersection size once — the composed form
      // evaluates array_intersect up to 4× per pair
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("inter")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** EXACT threshold-Jaccard self-join via PREFIX FILTERING (the
    * AllPairs/PPJoin family — Bayardo et al., WWW'07 pattern): the
    * deterministic counterpart to [[minhashLsh]]. LSH trades recall
    * for scale; the prefix filter keeps 100 % recall and still never
    * forms all pairs:
    *
    *  1. global token order = (corpus frequency asc, token) — rarest
    *    first. No global rank is materialized (a partition-less
    *    window is a scale bug); the (tf, tok) TUPLE is the order.
    *  2. each doc keeps only its PREFIX: the first
    *    |x| − ⌈τ·|x|⌉ + 1 tokens in that order. A pair with
    *    Jaccard ≥ τ must share ≥ ⌈τ·max(|A|,|B|)⌉ tokens, so two
    *    docs sharing NO prefix token cannot qualify — dropping the
    *    rest of the tokens loses no true pair.
    *  3. candidates = equi-join of prefixes on the token (rare tokens
    *    → tiny buckets), with the SIZE filter τ·|A| ≤ |B| ≤ |A|/τ
    *    cutting length-incompatible pairs before the dedup;
    *  4. exact Jaccard verification on the candidate set only.
    *
    * Graded on the same bounded slice family as the other exact pair
    * oracles (doc_id < 300 keeps the DuckDB all-pairs oracle
    * feasible); the spec proves full-table equality against the
    * brute-force join and the plan walk proves no cartesian — the
    * candidate stage is a token equi-join at every scale. */
  def jaccardPrefixJoin(s: SparkSession, d: String): DataFrame =
    jaccardPrefixPairsOn(
      Tables.documents(s, d).filter(col("doc_id") < 300)
        .select(col("doc_id"), shingles(col("text")).as("sh")))

  /** The prefix-filter pipeline over any (doc_id, sh) frame — exposed
    * so the spec can prove full-corpus equality against brute force
    * (the graded wrapper bounds the slice only for oracle
    * feasibility, not for the algorithm's sake). */
  def jaccardPrefixPairsOn(docs: DataFrame, Tau: Double = 0.5): DataFrame = {
    val toks = docs.select(col("doc_id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("tok"))
    // corpus frequency as a COUNT WINDOW over the token partition, not
    // groupBy + join-back: the join formulation exploded the corpus
    // twice and paid three exchanges (toks by tok, freq's partial-agg
    // exchange, the doc_id rank window); the unordered count-over-
    // partition needs no sort and shares the one tok exchange, so the
    // pref build is one explode and two exchanges. Identical tf (the
    // per-token row count IS the corpus frequency).
    // (also probed in r15: a collect_list + array_sort + slice
    // formulation of the per-doc ranking measured 2× SLOWER —
    // non-codegen ObjectHashAggregate — so the row_number window stays)
    // SKEW NOTE, probed AGAIN in r16 (VERDICT r15 #3): a hot token
    // buffers its whole group in this window's task, and neither
    // partial aggregation nor AQE skew-split can reach a window. Both
    // escape shapes were measured and REJECTED on two scale factors:
    //  - groupBy(tok).count + plain join-back (partial agg + AQE
    //    skewJoin jurisdiction): dedup_eval_pr 2.6→3.0 s at sf0.1,
    //    8.0→10.4 s at sf1 — the tf build's second corpus explode
    //    costs more than the window saves at every measured SF;
    //  - the same with a deterministic ×8 salt on the attach join:
    //    8.0→15.0 s at sf1 (the salted 8×domain tf broadcast).
    // The window buffer spills gracefully (ExternalAppendOnlyUnsafe-
    // RowArray), so the hot token costs one long-running task, not an
    // OOM; past the measured SFs the production move is materializing
    // the prefix index once (the offline AllPairs shape), not a
    // different tf attach. Numbers in OPTIMIZATION_r16.md.
    // (r16, third probed-and-rejected variant: eagerly pinning this
    // prefix index — the offline-AllPairs materialization shape — so
    // the candidate self-join reads it instead of recomputing both
    // sides measured FLAT at sf0.1 and 2× WORSE at sf1, 6.6→13.3 s
    // steady; the checkpoint write + stats-less RDD rescans cost more
    // than the recompute it saves at every measured SF. Lineage
    // stays.)
    val pref = toks
      .withColumn("tf", count(lit(1)).over(Window.partitionBy(col("tok"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("tf"), col("tok"))))
      .filter(col("rk") <= col("sz") - ceil(col("sz") * Tau) + 1)
      .select(col("doc_id"), col("sz"), col("tok"), col("rk"))
    // positional filter (the PPJoin refinement, Xiao et al. WWW'08):
    // a pair with Jaccard ≥ τ has overlap O ≥ τ/(1+τ)·(|A|+|B|), and
    // from a shared token at prefix ranks (ra, rb) the overlap is
    // bounded by 1 + min(|A|−ra, |B|−rb) — if even that bound misses
    // the required overlap on EVERY shared prefix token, the pair
    // cannot qualify. Lossless: for a true pair the bound holds at
    // its first shared prefix token (kept by the ANY-row-passes
    // distinct), and the float threshold τ/(1+τ) rounds BELOW the
    // rational, so rounding only ever keeps extra candidates (the
    // brute-force equality spec guards this). Measured at sf1 this
    // cut the candidate volume ~50× — the verify stage (arrays
    // shuffled per pair) was the super-linear cost without it.
    val reqOverlap = (col("a.sz") + col("b.sz")) * lit(Tau / (1.0 + Tau))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.sz") >= ceil(col("a.sz") * Tau) &&
          col("b.sz") * Tau <= col("a.sz") &&
          (lit(1) + least(col("a.sz") - col("a.rk"),
            col("b.sz") - col("b.rk"))) >= reqOverlap)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("a_id"), col("sh").as("sa")), Seq("a_id"))
      .join(docs.select(col("doc_id").as("b_id"), col("sh").as("sb")), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("inter")), 6))
      .filter(col("jaccard") >= Tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** EXACT edit-distance-1 fuzzy join via DELETION NEIGHBORHOODS (the
    * FastSS / SymSpell blocking technique) — the string-similarity
    * member of the exact-join family ([[jaccardPrefixJoin]] is the
    * set member, `sim_threshold_join` the vector member). Each
    * string's candidate key set is itself plus every single-character
    * deletion; two strings within edit distance 1 ALWAYS share a key
    * (substitution → both delete the differing position; insert/
    * delete → the longer one's deletion equals the shorter one's
    * identity), so the equi-join on keys is complete — and a
    * levenshtein verify on candidates removes the false positives
    * (e.g. transpositions share keys at distance 2). Neighborhood
    * size is O(len) per string and every bucket is bounded by the
    * alphabet (≤ |Σ|+1 strings share a deletion), so the join never
    * goes quadratic — the SymSpell scale-out shape. Graded over the
    * customer-name slice (single-digit neighbors make a dense,
    * deterministic pair set); oracle = all-pairs levenshtein. */
  def fuzzyJoinEdit1(s: SparkSession, d: String): DataFrame =
    fuzzyJoinEdit1On(
      Tables.customer(s, d).filter(col("c_custkey") < 1000)
        .select(col("c_name").as("w")))

  /** The deletion-neighborhood core over any single-column `w` frame
    * (exposed for the brute-force spec and the degenerate sweep).
    * Length-0 strings stay IN (the oracle's all-pairs levenshtein has
    * no length filter, and ("", one-char) pairs sit at distance 1 —
    * found via the 1-char word's deletion variant = the empty word's
    * identity); only the DELETION generation is guarded, because
    * `sequence(1, 0)` counts DOWN in Spark and would emit junk
    * variants for the empty string. */
  def fuzzyJoinEdit1On(raw: DataFrame): DataFrame = {
    val names = raw.distinct()
    val variants = names.select(col("w"), explode(concat(
        array(col("w")),
        expr("""CASE WHEN length(w) = 0 THEN slice(array(w), 1, 0)
          |ELSE transform(sequence(1, length(w)),
          |  i -> concat(substring(w, 1, i - 1),
          |              substring(w, i + 1, length(w)))) END""".stripMargin)))
        .as("v"))
    variants.as("a")
      .join(variants.as("b"),
        col("a.v") === col("b.v") && col("a.w") < col("b.w"))
      .select(col("a.w").as("word_a"), col("b.w").as("word_b"))
      .distinct()
      .filter(levenshtein(col("word_a"), col("word_b")) <= 1)
      .select(col("word_a"), col("word_b"),
        levenshtein(col("word_a"), col("word_b")).cast("long").as("dist"))
      .orderBy(col("word_a"), col("word_b"))
  }

  /** X2 scale path: MinHash signatures + LSH banding over the full
    * corpus. k=32 hashes, 8 bands × 4 rows; candidates = pairs sharing
    * a band bucket; final filter is exact Jaccard ≥ 0.5 on candidates
    * only. Oracled by a full SQL replay of the signature pipeline
    * (`minhashOracleSql` re-derives every xxhash64/splitmix64 value in
    * HUGEINT arithmetic); recall vs `jaccardNearDup` is additionally
    * asserted in ScalaTest.
    */
  def minhashLsh(s: SparkSession, d: String): DataFrame =
    minhashLshOn(Tables.documents(s, d))

  /** Default per-(band,bucket) membership cap: far above anything a
    * healthy corpus produces at these band widths, low enough that a
    * degenerate bucket cannot go quadratic. */
  val defaultMaxBucket = 256

  /** Core of [[minhashLsh]], parameterized for tests and reuse.
    *
    * `maxBucket` bounds bucket membership: web corpora routinely carry
    * thousands of byte-identical boilerplate copies, which land in ONE
    * bucket per band and would re-create the all-pairs blowup inside
    * it (5k copies ⇒ 12.5M candidate pairs). Buckets are truncated to
    * the `maxBucket` smallest doc_ids (deterministic) and the dropped
    * membership count is published as the `graft_lsh_bucket_overflow`
    * observed metric so operators see what was skipped. Mass-identical
    * content is exact-dedup's job (X1 runs first in a real pipeline);
    * the cap keeps the near-dup pass robust when it hasn't. */
  def minhashLshOn(docsRaw: DataFrame, numHashes: Int = 32,
      rowsPerBand: Int = 4,
      maxBucket: Int = defaultMaxBucket): DataFrame =
    verifyJaccard(
      lshCandidatePairs(docsRaw, numHashes, rowsPerBand, maxBucket),
      docsRaw)

  /** The CANDIDATE stage of [[minhashLshOn]] — banded buckets (capped
    * by the [[defaultMaxBucket]] rule) self-joined into distinct
    * `(a_id, b_id)` pairs, BEFORE exact verification. Extracted so
    * [[dedupEvalPr]] grades the exact generator the production query
    * serves (the `search_eval_prk` discipline: an eval that rebuilds
    * its own candidate pipeline can silently drift from the one it
    * claims to judge). */
  private[graft] def lshCandidatePairs(docsRaw: DataFrame,
      numHashes: Int = 32, rowsPerBand: Int = 4,
      maxBucket: Int = defaultMaxBucket): DataFrame = {
    val wBucket = Window.partitionBy(col("band"), col("bucket"))
      .orderBy(col("doc_id"))
    val bands = bandBuckets(fanOut(docsRaw), numHashes, rowsPerBand)
      .withColumn("__rank", row_number().over(wBucket))
      .observe("graft_lsh_bucket_overflow",
        sum(when(col("__rank") > maxBucket, 1L).otherwise(0L)).as("dropped"))
      .filter(col("__rank") <= maxBucket)
      .drop("__rank")
    // candidates: pairs sharing any band bucket (equi-join, no cross product)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  /** The (doc_id, band, bucket) projection shared by [[minhashLshOn]]
    * and its streaming twin ([[graft.streaming.StreamingDedup]]) — ONE
    * definition of signature + banding, so batch and stream cannot
    * drift (the LoadPipeline.derive discipline).
    *
    * Signature in ONE array pass via the native graft_minhash
    * expression (each shingle byte-hashed once, k splitmix
    * finalizations). The explode × seeds + groupBy formulation
    * shuffled |docs|·|shingles|·k rows (9 s at sf0.1); the k-column
    * array_min form still traversed the array k times (3.3 s); this
    * is a single narrow projection — streaming-safe (no shuffle, no
    * repartition; callers fan out batch inputs themselves).
    * Band bucket = xxhash64 of the band's `rowsPerBand` minhashes; one
    * output row per (doc, band) via posexplode of the bucket array. */
  def bandBuckets(docs: DataFrame, numHashes: Int = 32,
      rowsPerBand: Int = 4): DataFrame = {
    val sigs = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.minhash(
        shingles(col("text")), numHashes).as("sig"))
    val bucketCols = (0 until numHashes / rowsPerBand).map { b =>
      xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col("sig").getItem(i)): _*)
    }
    sigs.select(col("doc_id"),
      posexplode(array(bucketCols: _*)).as(Seq("band", "bucket")))
  }

  /** Per-(doc, seed) minhash signature rows — the SAME native
    * expression every query path computes ([[bandBuckets]] hashes
    * these into buckets; [[dedupEvalPrOn]] compares them pairwise),
    * exposed for the scaled-oracle aux dump (`aux_minhash_sigs`).
    * `s` is 1-based to match the oracle chain's seed index. */
  def minhashSigRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(graft.functions.GraftFunctions.minhash(
        shingles(col("text")), 32)).as(Seq("i", "sig")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("s"),
        col("sig"))

  /** DEDUP QUALITY EVALUATION (`dedup_eval_pr`) — the offline
    * precision/recall job a near-dup stack runs before trusting its
    * approximate detector (the [[graft.ops.SimilarityOps]]
    * `sim_ann_recall_eval` discipline on the dedup family, closing
    * the one approximation in the catalog that had no graded quality
    * eval): ground truth = EXACT shingle-Jaccard ≥ 0.5 pairs over
    * the full corpus via the 100 %-recall prefix-filter join
    * ([[jaccardPrefixPairsOn]] — never all-pairs); the judged
    * detector = the SAME banded-MinHash candidate generator
    * `dedup_minhash_lsh` serves ([[lshCandidatePairs]], one
    * definition). Two graded stages:
    *
    *  - `band`: did the 8×4 banding surface the pair? (the recall a
    *    production LSH pass actually gets; precision here is the
    *    verify-stage workload factor — FPs cost exact-Jaccard
    *    verifies, not wrong results)
    *  - `minhash_est`: does the 32-hash agreement fraction ≥ 0.5
    *    predict the pair? (the estimator's own quality, judged over
    *    the POOL = truth ∪ candidates. A pair outside the pool CAN
    *    reach 16/32 scattered agreements without any full band of 4,
    *    so pool-restricted precision is an upper bound — the same
    *    documented offline-eval restriction as `search_eval_prk`'s
    *    term-matching pool; recall is exact, truth ⊆ pool by
    *    construction)
    *
    * Output per stage: predicted/true/true-positive counts and
    * round-6 precision/recall.
    *
    * Scale shape: truth is the prefix-filter equi-join (rarest-token
    * buckets), candidates the capped bucket equi-join — both
    * never-all-pairs; signatures for the estimate are computed ONLY
    * for pool members (semi-join first, |pool|-bounded); the tail is
    * one global aggregate over the pool. The DuckDB oracle replays
    * the full xxhash64/splitmix64 signature chain in HUGEINT
    * arithmetic plus the shingle-join exact truth — an estimator or
    * banding divergence fails the hash gate. */
  def dedupEvalPr(s: SparkSession, d: String): DataFrame =
    dedupEvalPrOn(Tables.documents(s, d))

  /** Core of [[dedupEvalPr]] over any (doc_id, text) frame. */
  private[graft] def dedupEvalPrOn(docsRaw: DataFrame): DataFrame = {
    val withSh = docsRaw.select(col("doc_id"), shingles(col("text")).as("sh"))
    val truth = jaccardPrefixPairsOn(withSh)
      .select(col("a_id"), col("b_id"), lit(1L).as("is_true"))
    val cand = lshCandidatePairs(docsRaw)
      .select(col("a_id"), col("b_id"), lit(1L).as("is_cand"))
    // PIN the judged pool (r15): without it the full-outer frame is
    // re-derived at EVERY reference — est reads it once and each
    // sigs side re-reads it twice through poolIds, so the truth
    // prefix-filter join and the LSH candidate pipeline executed ~5×
    // per serve (17 jobs / 4.1 s steady at sf0.1). The pool is
    // pair-sized (truth ∪ capped candidates — the CC edge-frame cost
    // class, never corpus-sized), so an eager localCheckpoint is the
    // established lineage cut.
    val pool = truth.join(cand, Seq("a_id", "b_id"), "full_outer")
      .na.fill(0L, Seq("is_true", "is_cand"))
      .localCheckpoint(true)
    // signatures ONLY for docs that appear in a judged pair: the
    // semi-join prunes the corpus to pool members before any
    // re-hashing happens. NO broadcast hints — the pool is
    // DATA-bounded (truth ∪ capped candidates), not literal-bounded:
    // on a dup-heavy corpus it can grow with n, and a forced
    // broadcast would be the driver-OOM shape the corpus-broadcast
    // guard exists to catch. AQE picks the broadcast at runtime when
    // the pool measures small (the normal case).
    val poolIds = pool.select(col("a_id").as("doc_id"))
      .union(pool.select(col("b_id").as("doc_id"))).distinct()
    // pinned for the same reason: both est sides read sigs, and the
    // 32-hash signature projection is the expensive per-row work
    val sigs = docsRaw
      .join(poolIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.minhash(
          shingles(col("text")), 32).as("sig"))
      .localCheckpoint(true)
    val est = pool
      .join(sigs.select(col("doc_id").as("a_id"),
        col("sig").as("sig_a")), Seq("a_id"))
      .join(sigs.select(col("doc_id").as("b_id"),
        col("sig").as("sig_b")), Seq("b_id"))
      .withColumn("m", aggregate(
        zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v))
      // est ≥ 0.5 ⇔ matches ≥ 16 of 32 — integer compare, no float
      .withColumn("is_est", when(col("m") * 2 >= 32, 1L).otherwise(0L))
    val tot = est.agg(
      sum(col("is_cand")).as("cand_pred"),
      sum(col("is_true")).as("n_true"),
      sum(col("is_cand") * col("is_true")).as("cand_tp"),
      sum(col("is_est")).as("est_pred"),
      sum(col("is_est") * col("is_true")).as("est_tp"))
    val stages = tot.select(explode(array(
      struct(lit("band").as("stage"), col("cand_pred").as("n_pred"),
        col("n_true"), col("cand_tp").as("n_tp")),
      struct(lit("minhash_est").as("stage"), col("est_pred").as("n_pred"),
        col("n_true"), col("est_tp").as("n_tp")))).as("r"))
      .select(col("r.stage"), col("r.n_pred"), col("r.n_true"),
        col("r.n_tp"))
    stages.select(col("stage"),
      coalesce(col("n_pred"), lit(0L)).as("n_pred"),
      coalesce(col("n_true"), lit(0L)).as("n_true"),
      coalesce(col("n_tp"), lit(0L)).as("n_tp"))
      .withColumn("precision",
        when(col("n_pred") > 0L,
          round(col("n_tp").cast("double") / col("n_pred"), 6))
          .otherwise(lit(0.0)))
      .withColumn("recall",
        when(col("n_true") > 0L,
          round(col("n_tp").cast("double") / col("n_true"), 6))
          .otherwise(lit(0.0)))
      .orderBy(col("stage"))
  }

  /** INCREMENTAL LSH INGEST GATE (`dedup_lsh_append`) — the dedup
    * index joins the maintenance discipline (ivf/nsw/cc triptychs):
    * the corpus's banded MinHash buckets are a FROZEN artifact built
    * once per snapshot (doc_id ≡ 0‥7 mod 10, capped per bucket by
    * the [[defaultMaxBucket]] rule), and an ingest batch (≡ 8,9) is
    * checked for near-duplicates of EXISTING content by signing only
    * the batch (the map-side [[bandBuckets]] projection), capping the
    * probe buckets the same way (overflow published as
    * `graft_lsh_append_overflow`), and equi-joining probe against
    * frozen on (band, bucket). Exact Jaccard ≥ 0.5 verifies the
    * candidate pairs. Output: (a_id = corpus doc, b_id = incoming
    * doc, jaccard) — the admit/reject signal an ingest loop consults
    * before the batch enters the corpus.
    *
    * Scale: batch-time cost is |batch| signature projections + one
    * hash join against the bucket artifact + a candidate-sized exact
    * verify — the corpus is never re-signed, never re-banded. The
    * full-corpus pass ([[minhashLshOn]]) remains the
    * snapshot-(re)build path, exactly like the IVF trainer. */
  /** ONE definition of the per-(band, bucket) cap both ingest gates
    * share (review finding: it was written out four times): rank by
    * `orderCol`, publish the overflow as the observed metric, keep
    * the first [[defaultMaxBucket]]. NOTE the snapshot-side metrics
    * fire on the run that BUILDS the frozen artifact; a warm serve
    * scans the store and does not re-observe them — steady-state
    * monitoring reads the build run's metrics, not the serve's. */
  private def cappedBuckets(df: DataFrame, orderCol: String,
      metric: String): DataFrame = {
    val wB = Window.partitionBy(col("band"), col("bucket"))
      .orderBy(col(orderCol))
    df.withColumn("__rank", row_number().over(wB))
      .observe(metric,
        sum(when(col("__rank") > defaultMaxBucket, 1L).otherwise(0L))
          .as("dropped"))
      .filter(col("__rank") <= defaultMaxBucket)
      .drop("__rank")
  }

  def lshAppend(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val input = s"$d/documents.parquet"
    // snapshot-side cap overflow is published like every other capped
    // path (probe side, minhashLshOn, simhash) — a silently truncated
    // snapshot bucket is a recall loss the operator must be able to
    // see at build time (advisor finding)
    val frozen = graft.ArtifactStore.parquet(s, "lsh_snap_buckets",
      input) {
      cappedBuckets(
        bandBuckets(fanOut(docs.filter(col("doc_id") % 10 < 8))),
        "doc_id", "graft_lsh_snap_overflow")
    }
    val probe = cappedBuckets(
      bandBuckets(fanOut(docs.filter(col("doc_id") % 10 >= 8))),
      "doc_id", "graft_lsh_append_overflow")
    val cand = frozen.as("x").join(probe.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    verifyJaccard(cand, docs).orderBy(col("a_id"), col("b_id"))
  }

  /** Exact-Jaccard verification of an (a_id, b_id) candidate frame
    * against the corpus — the shared tail of [[minhashLshOn]] and the
    * streaming twin. The shingle transform is computed AFTER each
    * verify join, so it evaluates on the candidate-sized join output,
    * not once more per branch over the whole corpus (review finding) —
    * with the (small) candidate side broadcast under AQE, the corpus
    * text never shuffles here either. */
  def verifyJaccard(cand: DataFrame, docsRaw: DataFrame,
      minJaccard: Double = 0.5): DataFrame =
    cand
      .join(docsRaw.select(col("doc_id").as("a_id"), col("text").as("ta")),
        Seq("a_id"))
      .join(docsRaw.select(col("doc_id").as("b_id"), col("text").as("tb")),
        Seq("b_id"))
      .withColumn("sa", shingles(col("ta")))
      .withColumn("sb", shingles(col("tb")))
      .withColumn("jaccard", round(jaccard(col("sa"), col("sb")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))

  /** SimHash near-dup pairs over the FULL corpus via the native
    * `graft_simhash` expression + Manku-style block buckets.
    *
    * One 64-bit sketch per doc (single codegen'd scan), split into
    * `maxHamming + 1` equal blocks. By pigeonhole, two sketches within
    * `maxHamming` differing bits must agree EXACTLY on at least one
    * block — so candidate pairs come from equi-joins on (block index,
    * block value), and are then verified with `bit_count(xor)`.
    * Random 16-bit blocks collide at 2^-16, so candidate volume stays
    * ~n²/65536 per block on NON-duplicate mass; byte-identical mass
    * (identical sketches, one bucket per block) is what the per-bucket
    * cap guards — same cap + `graft_simhash_bucket_overflow` observed
    * metric as MinHash LSH, because the "n²/65536" argument says
    * nothing about a corpus full of literal duplicates (exact dedup's
    * job, X1 runs first in a real pipeline). Recall is exact whenever
    * no bucket overflows (overflow = 0 ⇒ pigeonhole guarantee holds). */
  def simhashNearDup(s: SparkSession, d: String): DataFrame =
    simhashNearDupOn(Tables.documents(s, d))

  /** The (doc_id, sketch) SimHash frame of [[simhashNearDupOn]] —
    * exposed for the scaled-oracle aux dump (`aux_simhash`). */
  private[ops] def simhashSketches(docs: DataFrame): DataFrame =
    fanOut(docs).select(col("doc_id"),
      graft.functions.GraftFunctions.simhash(split(col("text"), " "))
        .as("sketch"))

  /** Core of [[simhashNearDup]]; `maxHamming + 1` must divide 64. */
  def simhashNearDupOn(docs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = defaultMaxBucket): DataFrame = {
    val nBlocks = maxHamming + 1
    require(64 % nBlocks == 0, s"block count $nBlocks must divide 64")
    val width = 64 / nBlocks
    // width=64 (maxHamming=0): (1L << 64) wraps to 1 in Java, so the
    // mask expression would be 0 and every key would collide into one
    // all-pairs bucket — use the full mask explicitly
    val mask = if (width == 64) -1L else (1L << width) - 1
    val t = simhashSketches(docs).withColumnRenamed("sketch", "sh")
    val blockCols = (0 until nBlocks).map(i =>
      shiftrightunsigned(col("sh"), i * width).bitwiseAND(lit(mask)))
    val wBucket = Window.partitionBy(col("blk"), col("key"))
      .orderBy(col("doc_id"))
    val blocks = t.select(col("doc_id"), col("sh"),
      posexplode(array(blockCols: _*)).as(Seq("blk", "key")))
      .withColumn("__rank", row_number().over(wBucket))
      .observe("graft_simhash_bucket_overflow",
        sum(when(col("__rank") > maxBucket, 1L).otherwise(0L)).as("dropped"))
      .filter(col("__rank") <= maxBucket)
      .drop("__rank")
    blocks.as("x").join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("x.sh").as("sa"),
        col("y.doc_id").as("b_id"), col("y.sh").as("sb"))
      .distinct()
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Connected components over an undirected candidate-pair graph —
    * the last stage of a real dedup pipeline: pairwise near-dup
    * verdicts (LSH/SimHash/Jaccard) become duplicate CLUSTERS, each
    * labeled by its minimum doc_id, so "keep one per cluster" is a
    * simple `doc_id === cluster_id` filter even when similarity is
    * only transitive (A~B, B~C, A≁C).
    *
    * Algorithm: min-label propagation. Each round every vertex takes
    * the min label over itself and its neighbors — one equi-join
    * (messages) + one groupBy-min (combine), both shuffling only the
    * vertex/edge frames (candidate-pair-sized, NOT corpus-sized;
    * map-side combine applies to the min). Converges in O(diameter)
    * rounds; near-dup graphs are star-like (diameter ≲ 5) because
    * every member of a cluster pairs with most others, so the bound
    * is tight in practice and `maxIter` is a safety rail, not a
    * tuning knob. Lineage is cut with an eager localCheckpoint per
    * round — iterative self-joins otherwise stack plans until
    * analysis itself dominates.
    *
    * Determinism: labels only ever decrease and the fixpoint (min id
    * reachable) is unique, so output is engine-independent — the
    * oracle is a DuckDB recursive CTE over the same pair list. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val fwd = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    // labels only ever decrease, so the sum of labels is a monotone
    // convergence witness: a round changed some label iff the (exact,
    // decimal) sum got strictly smaller. One node-sized aggregate per
    // round replaces the old join+count convergence probe.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0)
    // A null sum is ambiguous: empty label frame (empty pair graph —
    // legitimately converged) OR decimal overflow (non-ANSI sum
    // returns null past 38 digits), which must FAIL, not silently
    // exit the loop with half-propagated labels. Disambiguate with an
    // emptiness probe paid only on the null path (i.e. ~never).
    def checkedSum(df: DataFrame): java.math.BigDecimal = {
      val s = labelSum(df)
      if (s == null && !df.isEmpty)
        throw new ArithmeticException(
          "connectedComponents convergence witness overflowed " +
            "decimal(38,0) — label sum exceeds 38 digits")
      s
    }
    var curSum = checkedSum(labels)
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      // two propagation hops per round: labels are monotone, so
      // composing hops before the checkpoint+convergence probe is
      // semantics-free — it halves the number of jobs the iterative
      // stage pays (each round is one lazy two-hop plan, one
      // checkpoint, one sum) while rounds-to-converge ~ diameter/2
      val hop1 = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
        .union(labels)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
      val next = edges.join(hop1, edges("src") === hop1("id"))
        .select(col("dst").as("id"), col("label"))
        .union(hop1)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      val nextSum = checkedSum(next)
      // both sums null = empty label frame (empty pair graph): converged
      changed = nextSum != null && curSum != null &&
        nextSum.compareTo(curSum) < 0
      curSum = nextSum
      // reassignment drops the only reference to the superseded
      // round's checkpoint; the ContextCleaner then frees its blocks
      // on driver GC (Dataset.unpersist cannot release localCheckpoint
      // storage), so live state is O(1) rounds, not O(maxIter)
      labels = next
      iter += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"(= ${2 * maxIter} propagation hops; graph diameter exceeds " +
          "that — raise maxIter)")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** The (doc_id, cluster_id) map of the exact-Jaccard near-dup
    * graph — the ONE pair-source → components composition shared by
    * [[clusters]], [[canonicalByQuality]] and [[leakageSafeSplit]]
    * (so swapping the pair source for `minhashLshOn` at scale is one
    * edit, not three).
    *
    * Materialized once per corpus snapshot through the
    * content-addressed [[graft.ArtifactStore]] (VERDICT r4 #5): the
    * cluster map is an ARTIFACT with three consumers (cluster report,
    * canonical selection, leakage-safe split), not a per-query
    * computation. Consumers get a plain parquet scan —
    * session-independent, so the ADVICE r4 hazards of the old
    * per-JVM DataFrame cache (localCheckpoint frames bound to the
    * building session; republished data served stale) are gone: a
    * republish changes the input fingerprint and forces a rebuild.
    * Safe to materialize: label propagation is deterministic (unique
    * min-reachable-id fixpoint). */
  private def nearDupComponents(s: SparkSession, d: String): DataFrame =
    graft.ArtifactStore.parquet(s, "neardup_components",
      s"$d/documents.parquet") {
      connectedComponents(jaccardNearDup(s, d).select(col("a_id"), col("b_id")))
    }

  /** Duplicate clustering end-to-end: the exact-Jaccard near-dup
    * pairs (the SQL-expressible graph) → connected components →
    * (doc_id, cluster_id, cluster_size). In the full-scale pipeline
    * the SAME operator consumes `minhashLsh` output instead. */
  def clusters(s: SparkSession, d: String): DataFrame = {
    val comp = nearDupComponents(s, d)
    val sizes = comp.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** Full-corpus duplicate clustering from the MinHash-LSH candidate
    * stream — the TEXT twin of the composition closure
    * `dedup_semantic_lsh` provides for embeddings: [[clusters]]
    * narrates "at scale the SAME operator consumes `minhashLsh`
    * output instead"; this query IS that pipeline, end to end, over
    * the full corpus (no bounded id slice). Oracled by a full SQL
    * replay (`clustersLshOracleSql`: the MinHash signature replay
    * composed with the recursive-CTE components), and the ScalaTest
    * recall check additionally asserts every exactly-clustered pair
    * of the bounded oracle form is co-clustered here too. */
  def clustersLsh(s: SparkSession, d: String): DataFrame = {
    // the LSH cluster map gets the [[nearDupComponents]] treatment:
    // iterative CC over the candidate stream is batch maintenance,
    // content-addressed once per corpus snapshot (was the suite's
    // slowest row at 1.9 s warm recomputing 5 CC rounds per run)
    val comp = graft.ArtifactStore.parquet(s, "lsh_components",
        s"$d/documents.parquet") {
      connectedComponents(
        minhashLsh(s, d).select(col("a_id"), col("b_id")))
    }
    val sizes = comp.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** Quality-aware canonical selection: WHICH duplicate to keep.
    * Min-id ([[clusters]], [[exactDedup]]) is the arbitrary-but-
    * deterministic default; a production cleanup keeps the
    * BEST-QUALITY member of each near-dup family — dropping a clean
    * original in favor of a truncated or boilerplate-padded copy
    * loses training signal. Composition: the near-dup cluster map ×
    * the `text_quality_score` blend → per-cluster argmax (score desc,
    * doc_id tie-break). Per-cluster output stays cluster-sized; the
    * argmax is a window partitioned by cluster_id — parallel across
    * clusters, and a cluster is by construction small. The score
    * arithmetic is the shared int-derived-double `qualityBlend`
    * expression tree, so the oracle reproduces it exactly. */
  def canonicalByQuality(s: SparkSession, d: String): DataFrame = {
    val comp = nearDupComponents(s, d)
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), TextOps.docQuality(col("text")).as("score"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("score").desc, col("doc_id"))
    comp.join(scored, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"),
        min(when(col("rn") === 1, col("doc_id"))).as("keep_id"),
        round(max(when(col("rn") === 1, col("score"))), 6).as("keep_score"))
      .select(col("cluster_id"), col("keep_id"), col("cluster_size"),
        col("keep_score"))
      .orderBy(col("cluster_id"))
  }

  /** Benchmark-contamination check: what fraction of the training
    * corpus shares a character 15-gram with a held-out probe set
    * (eval/benchmark documents)? The standard pre-training hygiene
    * scan, run before any eval claim. Probe set here = every 97th
    * doc_id (a stand-in for a benchmark suite); at real scale the
    * probe side is a fixed benchmark corpus — small and bounded —
    * which is why its distinct shingle set is `broadcast()`: the
    * corpus side then streams map-side through the hash join with no
    * shuffle of the 100 TB side at all. The only wide ops are
    * corpus-side `distinct` on (hit doc_id) — a 1-column shuffle —
    * and the final per-source count. */
  def contamination(s: SparkSession, d: String): DataFrame =
    contaminationOn(Tables.documents(s, d))

  /** Core of [[contamination]], parameterized for tests and reuse. */
  def contaminationOn(docs: DataFrame): DataFrame = {
    val probeShingles = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(shingles(col("text"))).as("sh"))
      .distinct()
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val hits = corpus
      .select(col("doc_id").as("hit_id"),
        explode(shingles(col("text"))).as("sh"))
      .join(broadcast(probeShingles), Seq("sh"))
      .select(col("hit_id")).distinct()
    corpus.join(hits, corpus("doc_id") === hits("hit_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hit_id").isNotNull, 1L).otherwise(0L))
          .as("n_contaminated"))
      .withColumn("contaminated_frac",
        col("n_contaminated").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("source"))
  }

  /** Winnowing near-dup detection (MOSS): rolling-hash fingerprint
    * sets via the codegen'd `graft_winnow` expression (k=8 byte-grams,
    * window 4 — guarantee: any ≥11-char shared substring yields a
    * shared fingerprint), then the same bucket-join shape as MinHash
    * LSH: explode (doc, fingerprint), drop stop-fingerprints that
    * occur in more than 64 docs (boilerplate — the standard winnowing
    * guard against degenerate buckets), equi-join on the fingerprint,
    * and keep pairs sharing ≥ 2 distinct fingerprints AND a minimum
    * FRACTION of the smaller document's fingerprint set (the MOSS
    * similarity score). The fraction filter is the precision guard:
    * over shared-vocabulary text an absolute ≥2-fingerprint rule is
    * effectively all-pairs (any two long docs share a couple of
    * common 8-gram runs), so the emitted pair set — not the join —
    * went near-quadratic; requiring overlap proportional to document
    * size keeps output mass tied to genuine near-dups. Sub-quadratic
    * candidate generation is unchanged (pairs only form inside
    * fingerprint buckets; fingerprints shuffle as longs, never text).
    * Oracled by a full SQL replay of every stage (k-gram polynomial
    * hash, window minima, bucket join — see `winnowOracleSql`).
    *
    * The fingerprint frame — the rolling hash over the full text, the
    * pipeline's dominant cost — is a per-corpus-snapshot artifact
    * (VERDICT r7 #2): content-addressed on the documents listing and
    * served as a plain parquet scan, so a cold JVM (the driver bench)
    * pays the hash once per snapshot, not once per session, exactly
    * like centroids/PQ/BPE merges. */
  def winnowNearDup(s: SparkSession, d: String): DataFrame = {
    val fps = graft.ArtifactStore.parquet(s, "winnow_fps",
      s"$d/documents.parquet", version = 1) {
      winnowFingerprints(Tables.documents(s, d))
    }
    winnowPairs(fps)
  }

  /** The (doc_id, nfp, fp) fingerprint frame of [[winnowNearDup]].
    *
    * Plan shape: the winnow expression is the expensive part (a
    * rolling hash over the full text), so it must run ONCE per doc.
    * `array_distinct` dedups fingerprints inside the projection
    * (per-doc dups are the only possible dups, so this replaces a
    * full row-level `distinct()` shuffle), and the per-doc set size
    * `nfp` rides along through the explode (no separate count join).
    * The result — linear in the corpus, text-free — is materialized
    * (artifact store or localCheckpoint) so the three downstream
    * consumers (stop-fingerprint census + both self-join sides) read
    * the materialization instead of re-evaluating the hash. */
  private[ops] def winnowFingerprints(docs: DataFrame): DataFrame =
    fanOut(docs)
      .select(col("doc_id"),
        array_distinct(graft.functions.GraftFunctions.winnow(
          lower(trim(col("text"))), 8, 4)).as("fpa"))
      .select(col("doc_id"), size(col("fpa")).as("nfp"),
        explode(col("fpa")).as("fp"))

  /** Core of [[winnowNearDup]], parameterized for tests and reuse over
    * an arbitrary in-session docs frame (no stable input listing to
    * content-address, so the fingerprint materialization is a
    * localCheckpoint instead of a store artifact). */
  def winnowNearDupOn(s: SparkSession, docs: DataFrame,
      minShared: Int = 2, minOverlapFrac: Double = 0.25): DataFrame =
    winnowPairs(winnowFingerprints(docs).localCheckpoint(true),
      minShared, minOverlapFrac)

  /** Bucket-join + MOSS-score filter over a materialized
    * (doc_id, nfp, fp) fingerprint frame. */
  private def winnowPairs(fps: DataFrame, minShared: Int = 2,
      minOverlapFrac: Double = 0.25): DataFrame = {
    val keep = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2 && col("nd") <= 64)
      .select(col("fp"))
    val bucketed = fps.join(keep, Seq("fp"))
    bucketed.select(col("fp"), col("doc_id").as("a_id"), col("nfp").as("na"))
      .join(bucketed.select(col("fp"), col("doc_id").as("b_id"),
        col("nfp").as("nb")), Seq("fp"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"),
        min(col("na")).as("na"), min(col("nb")).as("nb"))
      .filter(col("n_shared") >= minShared &&
        col("n_shared") >=
          lit(minOverlapFrac) * least(col("na"), col("nb")))
      .select(col("a_id"), col("b_id"), col("n_shared"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** SemDeDup-style semantic deduplication: embedding-cosine pairs →
    * duplicate clusters → keep the minimum id per cluster. The pair
    * stage here is the bounded exact form (same vec_id < 300 /
    * cosine ≥ 0.3 slice as `sim_threshold_join`, which is what makes
    * the recursive-CTE oracle feasible); the full-scale pipeline
    * swaps in `SimilarityOps.thresholdLsh` candidates — the clustering
    * and keep-rule are IDENTICAL either way, which is the point:
    * semantic dedup is pair-generation ∘ connectedComponents ∘
    * min-id filter, all three already scale-pathed. Singletons (no
    * near-dup) keep themselves: cluster_id = own id, size 1. */
  def semantic(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).filter(col("vec_id") < 300)
    // r15 optimization: the pair graph's node universe is bounded by
    // the LITERAL slice (vec_id < 300 ⇒ ≤ 300 nodes, ≤ 300·299/2
    // pairs — a constant in the plan, not data), so the min-label
    // fixpoint is computed by a driver union-find over ONE bounded
    // collect instead of the distributed label-propagation loop: the
    // iterative CC paid ~8 AQE stage-jobs + a checkpoint + a
    // convergence aggregate PER ROUND, every bench rep — measured 75
    // jobs / 3.4–4.8 s steady-state at sf0.1, vs ~15 jobs / ~1 s with
    // the bounded form. Fixpoint (min reachable id per node) is
    // identical and unique, so the DuckDB recursive-CTE oracle is
    // unchanged. The CORPUS-sized path ([[semanticLsh]] et al.) keeps
    // the distributed [[connectedComponents]] — this variant is only
    // legal where the slice bound is a literal.
    semanticOnComponents(emb, boundedComponents(s,
      SimilarityOps.thresholdJoinOn(emb, 0.3).select(col("a_id"), col("b_id")),
      maxNodes = 300))
  }

  /** Driver union-find connected components for LITERAL-BOUNDED pair
    * graphs (see [[semantic]]): collects the pair list (guarded by
    * `maxNodes`² — a constant bound from the caller's slice literal,
    * never data-dependent), unions with path compression, labels each
    * node with the MINIMUM id reachable in its component — exactly
    * [[connectedComponents]]' fixpoint — and returns the same
    * (doc_id, cluster_id) frame as a local relation. */
  private[graft] def boundedComponents(s: SparkSession, pairs: DataFrame,
      maxNodes: Long): DataFrame = {
    val rows = pairs.select(col("a_id").cast("long"), col("b_id").cast("long"))
      .collect()
    require(rows.length <= maxNodes * maxNodes,
      s"boundedComponents: ${rows.length} pairs exceed the declared " +
        s"$maxNodes-node bound — use connectedComponents for data-sized graphs")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      // min-id root: the representative IS the component's min label
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val labels = parent.keys.toSeq.sorted.map(n => (n, find(n)))
    import s.implicits._
    labels.toDF("doc_id", "cluster_id")
  }

  // ------------------------------------------------ containment (r9)

  /** Document-frequency cutoff for the containment inverted join:
    * shingles shared by more than this many docs carry no
    * discriminative signal and would quadratically dominate the
    * shingle-keyed self-join (a stopword shingle's df² pair mass is
    * the hot key of this workload). The cutoff is part of the graded
    * SEMANTICS — containment is measured over kept shingles — so the
    * oracle applies the identical rule. */
  private val ContainMaxDf = 50L

  /** CONTAINMENT detection — the ASYMMETRIC near-dup primitive every
    * symmetric measure misses: |A∩B| ∕ |A| ≥ 0.9 flags A as
    * (near-)contained in B — truncated copies, quoted excerpts,
    * doc-in-doc concatenations — where Jaccard divides by the UNION
    * and scores a small-doc-inside-big-doc pair near zero (Broder's
    * containment vs resemblance distinction). Pipeline: distinct char
    * shingles per doc ([[shingles]]), df-cutoff, shingle-keyed
    * inverted self-join (sub-quadratic: Σ df² with df ≤ cutoff,
    * never all-pairs), pair-intersection counts, and an INTEGER
    * threshold test 10·|A∩B| ≥ 9·|A| — no float division anywhere.
    * Proper containments require |A| < |B|; exact-dup pairs
    * (|A| = |B|) are emitted once under the id tie-break. At 100 TB
    * the same inverted join runs banded (the minhashLsh discipline);
    * this exact form IS the oracle-gradable semantics. */
  def containment(s: SparkSession, d: String): DataFrame =
    // like the cluster map and the winnow fingerprints: the pair
    // table is a per-corpus-snapshot derived artifact — the inverted
    // join is paid once at ingest, every consumer serves the stored
    // pairs; the scan re-applies the catalog's ORDER BY
    graft.ArtifactStore.parquet(s, "containment_pairs",
        s"$d/documents.parquet") {
      containmentOn(Tables.documents(s, d))
    }.orderBy(col("contained_id"), col("container_id"))

  /** Core of [[containment]], parameterized for tests and reuse. */
  def containmentOn(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(shingles(col("text"))).as("sh"))
    val rare = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= ContainMaxDf).select(col("sh"))
    val kept = sh.join(rare, Seq("sh"))
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    kept.select(col("sh"), col("doc_id").as("a_id"))
      .join(kept.select(col("sh"), col("doc_id").as("b_id")), Seq("sh"))
      .filter(col("a_id") =!= col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("n_a")),
        Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("n_b")),
        Seq("b_id"))
      .filter(col("inter") * 10L >= col("n_a") * 9L &&
        (col("n_a") < col("n_b") ||
          (col("n_a") === col("n_b") && col("a_id") < col("b_id"))))
      .select(col("a_id").as("contained_id"), col("b_id").as("container_id"),
        col("inter"), col("n_a"), col("n_b"))
      .orderBy(col("contained_id"), col("container_id"))
  }

  /** Clustering + keep-rule shared by [[semantic]] (exact pairs) and
    * [[semanticLsh]] (LSH candidate pairs): connected components over
    * the pair graph, singletons keep themselves, min-id per cluster
    * is kept. */
  def semanticOnPairs(emb: DataFrame, pairs: DataFrame): DataFrame =
    semanticOnComponents(emb, connectedComponents(pairs))

  /** [[semanticOnPairs]] with the components already computed —
    * lets [[semantic]] swap in the bounded driver CC while the
    * corpus-sized callers keep the distributed loop. */
  private[graft] def semanticOnComponents(emb: DataFrame,
      components: DataFrame): DataFrame = {
    val comp = components.withColumnRenamed("doc_id", "vec_id")
    val assigned = emb.select(col("vec_id"))
      .join(comp, Seq("vec_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("vec_id")))
    val sizes = assigned.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, Seq("cluster_id"))
      .withColumn("kept",
        (col("vec_id") === col("cluster_id")).cast("long"))
      .select(col("vec_id"), col("cluster_id"), col("cluster_size"),
        col("kept"))
      .orderBy(col("vec_id"))
  }

  /** The full-scale composition [[semantic]]'s docstring narrates,
    * actually wired (VERDICT r2 #3): SRP-LSH candidate pairs
    * (`SimilarityOps.thresholdLshAuto` — band buckets sized to the
    * corpus by `srpAutoParams`, so the sub-quadratic claim holds
    * across scales, + exact cosine verification, over the WHOLE
    * embedding table) → the SAME `connectedComponents` + min-id
    * keep-rule. At the sf0.1 corpus (n = 2 000) the auto-tuning
    * lands on 7 bits × 98 bands — ~0.93 boundary recall at the 0.3
    * threshold per the SRP collision formula. Hash-oracled via the
    * generated SRP-geometry SQL (see the oracle splice below);
    * cluster-recall vs the exact form on the bounded slice is
    * asserted in ScalaTest. */
  def semanticLsh(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // band sizing from footer-metadata cardinality (VERDICT r3 #5):
    // no count() scan of the corpus just to tune the LSH parameters.
    // Constructing the pairs frame is LAZY — it also records the
    // tuned SRP geometry for the generated oracle, which must happen
    // on the serve path too (the oracle splice is a pure function of
    // the corpus cardinality, not of whether the store was warm).
    val pairs =
      semanticLshPairs(emb, Some(Tables.cardinality(s, d, "embeddings")))
    // the cluster map is a per-corpus-snapshot derived artifact — the
    // winnow-fingerprint / dedup_clusters / triangle-summary
    // discipline: signatures + banding + components are paid once at
    // ingest, every consumer (and every bench rep) serves the stored
    // assignment. The stored frame is deterministic (min-id labels);
    // the scan re-applies the catalog's ORDER BY.
    graft.ArtifactStore.parquet(s, "semantic_lsh_clusters",
        s"$d/embeddings.parquet") {
      semanticOnPairs(emb, pairs)
    }.orderBy(col("vec_id"))
  }

  /** Candidate stage of [[semanticLsh]], shared with the recall test. */
  def semanticLshPairs(emb: DataFrame, knownN: Option[Long] = None): DataFrame =
    SimilarityOps.thresholdLshAuto(emb, 0.3, knownN = knownN)
      .select(col("a_id"), col("b_id"))

  /** SEMANTIC (EMBEDDING) INGEST GATE (`dedup_semantic_append`,
    * VERDICT r12 #3) — the [[lshAppend]] discipline applied to the
    * one dedup family that still rebuilt per snapshot: the corpus's
    * SRP band-buckets (fixed 8-bit × 64-band geometry, seed 42 — the
    * `sim_threshold_lsh` static geometry, so the oracle is a full
    * cross-engine SRP replay, not rows-only) are a FROZEN
    * content-addressed artifact over the snapshot split (vec_id ≡
    * 0‥7 mod 10), capped per (band, bucket) by [[defaultMaxBucket]]
    * with snapshot-side overflow observed; an ingest batch (≡ 8,9)
    * is signed ALONE, capped the same way (probe overflow observed),
    * and equi-joined against the frozen buckets on (band, bucket).
    * Exact round-6 cosine ≥ 0.4 verifies the candidates. Output:
    * (a_id = corpus vec, b_id = incoming vec, cosine) — the
    * admit/reject signal before the batch enters the corpus.
    *
    * Batch-time cost is |batch| SRP signings + one hash join against
    * the bucket artifact + a candidate-sized exact verify — the
    * corpus is never re-signed, never re-banded. This closes the
    * SCALE.md "residual-risk asymmetry": the semantic family now has
    * a bounded, hash-graded incremental path alongside the
    * full-corpus [[semanticLsh]] snapshot (re)build. */
  def semanticAppend(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val input = s"$d/embeddings.parquet"
    val frozen = graft.ArtifactStore.parquet(s, "srp_snap_buckets",
      input) {
      cappedBuckets(SimilarityOps.srpBandsFrame(
        emb.filter(col("vec_id") % 10 < 8), 8, 64, 42L),
        "vec_id", "graft_srp_snap_overflow")
    }
    val probe = cappedBuckets(SimilarityOps.srpBandsFrame(
      emb.filter(col("vec_id") % 10 >= 8), 8, 64, 42L),
      "vec_id", "graft_srp_append_overflow")
    semanticAppendOn(emb, frozen, probe, 0.4)
  }

  /** PRODUCTION-GEOMETRY SEMANTIC INGEST GATE
    * (`dedup_semantic_append_auto`, VERDICT r13 #4) — the
    * [[semanticAppend]] machinery at the geometry a production
    * near-dup gate actually runs: threshold 0.8 (ρ =
    * ln(1/p₁)/ln 2 ≈ 0.33 — the realistic end of the SRP exponent
    * table, vs the 0.4 demo gate's ρ ≈ 0.66) with (bits, bands)
    * auto-tuned to the corpus cardinality by
    * [[SimilarityOps.srpAutoTuned]], so the candidate-mass asymptote
    * is n^1.33 instead of the fixed-geometry n². The fixture carries
    * NO true cross-split pair at cosine ≥ 0.8 (that is what makes 0.8
    * the honest production threshold), so the graded output is the
    * per-vector INGEST VERDICT a production gate emits rather than a
    * would-be-empty pair list: for every batch vector, the post-cap
    * candidate count, the ≥-threshold duplicate count, and the exact
    * max cosine over its candidates (NULL when no bucket collides).
    * max_cosine keeps the exact-verify chain hash-graded POINTWISE on
    * every batch vector even though no candidate clears 0.8; the
    * reject path (n_dups > 0) is exercised by a planted spec with an
    * identical vector on both sides of the split. Geometry is a pure
    * function of the corpus cardinality, so the generated oracle
    * splices it (the `dedup_semantic_lsh` protocol); the frozen
    * artifact's address covers the data (and thereby n), and the
    * builder version must bump if the sizing rule changes. */
  def semanticAppendAuto(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val (frozen, probe) = semanticAutoFrames(s, d)
    semanticAppendAutoOn(emb, emb.filter(col("vec_id") % 10 >= 8),
      frozen, probe, SemAutoThreshold)
  }

  /** ONE construction of the auto gate's (frozen, probe) bucket
    * frames — split predicates, seed, tuned geometry, bucket caps —
    * shared by [[semanticAppendAuto]] and the scale probe's
    * [[semanticAutoCandidateMass]] (review finding, r15: a
    * copy-pasted construction would let the production path drift
    * while the mass gate kept measuring the old frames and stayed
    * green). */
  private def semanticAutoFrames(s: SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val emb = Tables.embeddings(s, d)
    val input = s"$d/embeddings.parquet"
    val n = Tables.cardinality(s, d, "embeddings")
    val (bits, bands) = SimilarityOps.srpAutoTuned(n, SemAutoThreshold)
    val frozen = graft.ArtifactStore.parquet(s, "srp_auto_snap_buckets",
      input) {
      cappedBuckets(SimilarityOps.srpBandsFrame(
        emb.filter(col("vec_id") % 10 < 8), bits, bands, 42L),
        "vec_id", "graft_srp_auto_snap_overflow")
    }
    val probe = cappedBuckets(SimilarityOps.srpBandsFrame(
      emb.filter(col("vec_id") % 10 >= 8), bits, bands, 42L),
      "vec_id", "graft_srp_auto_append_overflow")
    (frozen, probe)
  }

  private[graft] val SemAutoThreshold = 0.8

  /** The auto gate's distinct cross-split candidate count at `d` —
    * the quantity whose 10×-step growth IS the n^(1+ρ) exponent the
    * tuned geometry prices (measured r14: 64,258 at sf0.1 →
    * 1,373,937 at sf1 = 21.4× ≈ n^1.33). Exposed for
    * [[graft.ScaleProbeSpec]]'s mass gate (VERDICT r14 #5): an
    * `srpAutoParams` sizing-rule regression must fail a gate on the
    * MASS, not wait to surface as wall-clock noise. Same frames as
    * [[semanticAppendAuto]] (tuned geometry, capped buckets both
    * sides, distinct pairs). */
  private[graft] def semanticAutoCandidateMass(s: SparkSession,
      d: String): Long = {
    val (frozen, probe) = semanticAutoFrames(s, d)
    frozen.as("x").join(probe.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
      .distinct().count()
  }

  /** Core of [[semanticAppendAuto]], parameterized for the planted
    * reject-path spec. `batch` is the full incoming-vector frame (a
    * vector whose every bucket capped out must still be REPORTED as
    * an admit — the verdict is per batch vector, not per collision).
    *
    * Ordering note: unlike [[semanticAppendOn]] (verify before
    * distinct — correct at L = 64 bands where the raw collision
    * stream is the big frame), the per-vector counts NEED the
    * distinct pair set, and the tuned geometry's band count is small
    * (L = Θ(n^0.33): 12 bands at n = 2 000), so the distinct shuffle
    * carries little band amplification — distinct-first is the right
    * order here and the only one that counts candidates correctly. */
  private[graft] def semanticAppendAutoOn(emb: DataFrame, batch: DataFrame,
      frozen: DataFrame, probe: DataFrame, threshold: Double): DataFrame = {
    val cand = frozen.as("x").join(probe.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
      .distinct()
    val e = emb.select(col("vec_id"), col("embedding"),
      graft.functions.Vectors.normCol(col("embedding")).as("nrm"))
    val agg = cand
      .join(e.select(col("vec_id").as("a_id"), col("embedding").as("ae"),
        col("nrm").as("an")), Seq("a_id"))
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("be"),
        col("nrm").as("bn")), Seq("b_id"))
      .withColumn("cosine", graft.functions.Vectors.cosine6WithNorms(
        col("ae"), col("an"), col("be"), col("bn")))
      .groupBy(col("b_id"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("cosine") >= threshold, 1L).otherwise(0L))
          .as("n_dups"),
        max(col("cosine")).as("max_cosine"))
    batch.select(col("vec_id").as("b_id"))
      .join(agg, Seq("b_id"), "left")
      .select(col("b_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("max_cosine"))
      .orderBy(col("b_id"))
  }

  /** Core of [[semanticAppend]], parameterized on the frozen/probe
    * bucket frames so the spec can drive the wrong-bucket control
    * (shifted probe buckets must change the answer — the equi-join
    * is load-bearing, not decorative). */
  private[graft] def semanticAppendOn(emb: DataFrame, frozen: DataFrame,
      probe: DataFrame, threshold: Double): DataFrame = {
    // Verify BEFORE dedup (the thresholdLshOn-measured ordering): a
    // pair colliding in many of the 64 bands emits that many raw
    // candidate rows, and a distinct() on the raw stream shuffles the
    // FULL L-amplified candidate mass; one codegen'd cosine per raw
    // row is cheaper, and the distinct then carries only threshold
    // survivors. The r13 sf1 probe measured the distinct-first form
    // at 14.4× for the 10× step (the shuffle, not the math, was the
    // super-linear term); this form reads ~5×.
    val cand = frozen.as("x").join(probe.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
    val e = emb.select(col("vec_id"), col("embedding"),
      graft.functions.Vectors.normCol(col("embedding")).as("nrm"))
    cand
      .join(e.select(col("vec_id").as("a_id"), col("embedding").as("ae"),
        col("nrm").as("an")), Seq("a_id"))
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("be"),
        col("nrm").as("bn")), Seq("b_id"))
      .withColumn("cosine", graft.functions.Vectors.cosine6WithNorms(
        col("ae"), col("an"), col("be"), col("bn")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
      .distinct()
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Incremental dedup: clean a NEW batch against an already-published
    * corpus snapshot — the steady-state form of exact dedup once a
    * pipeline runs continuously (the ETL twin is
    * `etl/Dedup.againstExisting`). Batch = doc_id ≡ 8,9 (mod 10);
    * snapshot = the rest. Two stages, both keyed on the 32-byte md5
    * fingerprint (never the text): first-wins WITHIN the batch
    * (fp-partitioned window), then anti-join style membership against
    * the snapshot's distinct fingerprint set. Emits the per-source
    * funnel: how many batch docs were dropped as in-batch dups, as
    * already-published, and how many are genuinely new. */
  def incremental(s: SparkSession, d: String): DataFrame =
    incrementalOn(Tables.documents(s, d))

  /** Core of [[incremental]], parameterized for tests and reuse. */
  def incrementalOn(docs: DataFrame): DataFrame = {
    val fp = TextOps.normalizedFp(col("text"))
    val existing = docs.filter(col("doc_id") % 10 < 8)
      .select(fp.as("fp")).distinct()
      .withColumn("published", lit(1L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id"))
    docs.filter(col("doc_id") % 10 >= 8)
      .withColumn("fp", fp)
      .withColumn("rn", row_number().over(w))
      .join(existing, Seq("fp"), "left")
      .withColumn("stage",
        when(col("rn") > 1, "dropped_in_batch")
          .when(col("published") === 1L, "dropped_published")
          .otherwise("new"))
      .groupBy(col("source"), col("stage"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("stage"))
  }

  /** Snapshot diff — the dataset-versioning report every managed
    * corpus publishes per release: which documents were added, removed,
    * changed (same id, different content fingerprint) or unchanged
    * between the published snapshot and the current batch, counted per
    * source. Snapshots are simulated deterministically from one table
    * (the [[incremental]] convention): published = doc_id%10 in [0,8),
    * current = doc_id%10 in [1,10) with every doc_id%5==1 document
    * carrying revised text.
    *
    * Scale shape: two filtered scans (two real snapshots at scale),
    * one full-outer HASH join on the id key, one aggregate. Content
    * comparison joins 16-byte fingerprints, never text. */
  def corpusDiff(s: SparkSession, d: String): DataFrame =
    corpusDiffOn(Tables.documents(s, d))

  /** Core of [[corpusDiff]], parameterized for tests and reuse. */
  def corpusDiffOn(docs: DataFrame): DataFrame = {
    val a = docs.filter(col("doc_id") % 10 < 8)
      .select(col("doc_id"), col("source").as("source_a"),
        TextOps.normalizedFp(col("text")).as("fp_a"))
    val b = docs.filter(col("doc_id") % 10 >= 1)
      .withColumn("btext",
        when(col("doc_id") % 5 === 1, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("source").as("source_b"),
        TextOps.normalizedFp(col("btext")).as("fp_b"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged"))
      .groupBy(coalesce(col("source_a"), col("source_b")).as("source"),
        col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("status"))
  }

  /** Exact-substring duplicate spans (the ExactSubstr pipeline of Lee
    * et al., "Deduplicating Training Data Makes Language Models
    * Better"): flag every 50-token window (stride 25) whose exact
    * content occurs more than once in the corpus — including
    * self-repeats — and report, per source, how many documents carry
    * flagged spans, the span count, and how many token POSITIONS the
    * merged spans cover (overlapping windows are not double-counted:
    * coverage is a distinct-position count per document).
    *
    * Scale shape: windows are a narrow transform+explode
    * (≈ tokens/25 rows); duplicate detection is ONE shuffle — a
    * count-over-window partitioned by the 16-byte window hash — so the
    * corpus is tokenized and hashed exactly once (the aggregate+join
    * formulation re-executes the window stream per branch; measured,
    * not assumed — the corpus_overlap lesson). Corpus-linear, the
    * suffix-array's sub-quadratic stand-in (a true distributed suffix
    * array pays a sort of every suffix; stride-windowing is the
    * standard approximation and finds any repeated run ≥ 74 tokens,
    * probabilistically shorter ones when aligned). Position coverage
    * explodes only FLAGGED windows — duplicate-mass-sized, not
    * corpus-sized. */
  def substringDedup(s: SparkSession, d: String): DataFrame =
    substringDedupOn(Tables.documents(s, d))

  /** Core of [[substringDedup]], parameterized for tests and reuse. */
  def substringDedupOn(docs: DataFrame): DataFrame = {
    val wins = docs.select(col("doc_id"), col("source"),
        TextOps.tokensNonEmpty(col("text")).as("t"))
      .filter(size(col("t")) >= 50)
      .select(col("doc_id"), col("source"),
        explode(transform(
          sequence(lit(1), size(col("t")) - 49, lit(25)),
          i => struct(i.as("start"),
            md5(concat_ws(" ", slice(col("t"), i, lit(50))))
              .as("wh")))).as("w"))
      .select(col("doc_id"), col("source"),
        col("w.start").as("start"), col("w.wh").as("wh"))
    val wDup = org.apache.spark.sql.expressions.Window
      .partitionBy(col("wh"))
    wins
      .withColumn("cnt", count(lit(1)).over(wDup))
      .filter(col("cnt") > 1)
      .select(col("doc_id"), col("source"), col("start"),
        explode(sequence(col("start"), col("start") + 49)).as("pos"))
      .groupBy(col("doc_id"), col("source"))
      .agg(countDistinct(col("pos")).as("tokens_flagged"),
        sum(when(col("pos") === col("start"), 1L).otherwise(0L))
          .as("n_spans"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_affected"),
        sum(col("n_spans")).as("n_spans"),
        sum(col("tokens_flagged")).as("tokens_flagged"))
      .orderBy(col("source"))
  }

  /** Bloom-prefiltered incremental dedup: the membership check of
    * [[incremental]] restructured so the NEW-batch side — the side
    * that is corpus-sized in a steady-state pipeline — mostly never
    * shuffles. A Bloom filter over the published snapshot's
    * fingerprints (driver-built sketch, broadcast once; ~1.2 GB per
    * 10⁹ snapshot docs at 1% fpp, the same driver-side-sketch shape
    * as CountMin) splits the batch map-side: "definitely new" rows
    * (no false negatives exist) bypass the anti-join entirely, and
    * only suspected dups — true dups plus the fpp·|batch| false
    * positives — pay the fingerprint shuffle for the exact check.
    * The result is therefore EXACTLY the plain anti-join (false
    * positives are weeded out by it), which is what makes this
    * oracle-able; the `graft_bloom_prefilter` observed metric
    * publishes how many rows needed the exact check. Membership is
    * the codegen'd [[graft.functions.BloomContains]] expression
    * probing the broadcast filter — no UDF in the corpus hot path
    * (asserted by PlanInvariantsSpec). Beyond a few billion snapshot
    * docs a single sketch outgrows one broadcast — that fallback is
    * [[bloomIncrementalShardedOn]], which hash-splits the fingerprint
    * space into N filters probed one at a time. */
  def bloomIncremental(s: SparkSession, d: String): DataFrame =
    bloomIncrementalOn(Tables.documents(s, d))

  /** Core of [[bloomIncremental]], parameterized for tests.
    *
    * Both sides are materialized once (localCheckpoint of the narrow
    * fingerprint frames — text never persists): the snapshot subtree
    * feeds three consumers (count for sizing, the Bloom aggregation,
    * the exact anti-join) and the flagged batch feeds the two union
    * branches; without the checkpoint each consumer re-scans and
    * re-hashes its corpus-sized input. */
  def bloomIncrementalOn(docs: DataFrame, fpp: Double = 0.01): DataFrame = {
    val s = docs.sparkSession
    val fp = TextOps.normalizedFp(col("text"))
    val snapshot = docs.filter(col("doc_id") % 10 < 8).select(fp.as("fp"))
      .localCheckpoint(true)
    // sketch over the NON-NULL fingerprints only: stat.bloomFilter
    // NPEs on a null (ADVICE r3), and a null fp can never match the
    // exact anti-join anyway, so dropping it is semantics-free
    val nonNull = snapshot.filter(col("fp").isNotNull)
    val snapCount = nonNull.count()
    if (snapCount == 0L) {
      // empty snapshot: nothing can be a duplicate — the whole batch
      // is definitely-new (stat.bloomFilter NPEs on zero rows, and a
      // sketch over nothing answers nothing anyway)
      return docs.filter(col("doc_id") % 10 >= 8)
        .select(col("doc_id"), fp.as("fp"))
        .orderBy(col("doc_id"))
    }
    val bf = nonNull.stat.bloomFilter("fp", snapCount, fpp)
    val bfB = s.sparkContext.broadcast(bf)
    // codegen'd broadcast probe; coalesce supplies the operator's null
    // policy (a null fp is definitely absent — no filter contains null)
    val batch = docs.filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), fp.as("fp"))
      .withColumn("might", coalesce(
        graft.functions.GraftFunctions.bloomContains(bfB, col("fp")),
        lit(false)))
      .localCheckpoint(true)
      .observe("graft_bloom_prefilter",
        sum(when(col("might"), 1L).otherwise(0L)).as("exact_checked"),
        count(lit(1)).as("batch_rows"))
    val definitelyNew = batch.filter(!col("might"))
      .select(col("doc_id"), col("fp"))
    val confirmedNew = batch.filter(col("might"))
      .select(col("doc_id"), col("fp"))
      .join(snapshot, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
    definitelyNew.unionByName(confirmedNew).orderBy(col("doc_id"))
  }

  /** Sharded-sketch fallback for [[bloomIncrementalOn]] — the
    * documented rail past a few billion snapshot docs, where one
    * Bloom filter outgrows a single broadcast (~1.2 GB per 10⁹ docs
    * at 1% fpp; the broadcast ceiling is 8 GB and executor memory is
    * shared). The fingerprint space is hash-split into `shards`
    * filters by the fingerprint's leading hex byte (the fp is an md5,
    * so the first byte is uniform — no second hash needed, and the
    * routing is the same cheap expression on both build and probe
    * sides). The build shuffles fingerprints by shard so each build
    * task fills exactly one size/shards filter; probing then runs
    * one shard at a time — broadcast shard i, flag shard-i batch
    * rows, EAGERLY materialize (localCheckpoint), destroy the
    * broadcast — so peak filter memory per executor is size/shards
    * in BOTH phases. Result is provably identical to [[bloomIncrementalOn]]
    * and to the plain anti-join (unit-tested): sharding changes which
    * filter answers a probe, never the answer's guarantees. */
  def bloomIncrementalShardedOn(docs: DataFrame, fpp: Double = 0.01,
      shards: Int = 4): DataFrame = {
    require(shards > 0 && shards <= 256, "shard count must route on one hex byte")
    val s = docs.sparkSession
    val fp = TextOps.normalizedFp(col("text"))
    val shardOf = pmod(conv(substring(col("fp"), 1, 2), 16, 10).cast("int"),
      lit(shards))
    val snapshot = docs.filter(col("doc_id") % 10 < 8).select(fp.as("fp"))
      .localCheckpoint(true)
    val nonNull = snapshot.filter(col("fp").isNotNull)
    val perShard = math.max(nonNull.count() / shards, 1L)
    // build = one fingerprint shuffle routed BY SHARD, then each
    // build task fills exactly ONE size/N filter — so executor-side
    // build memory is size/N, matching the probe phase's rail. (The
    // earlier tree-merge formulation carried an N-filter array as the
    // aggregation zero: its serialized zero and per-task live state
    // were the FULL sketch size — the very regime sharding exists to
    // escape.) HashPartitioner on the shard int is identity routing:
    // partition index == shard. Each build task WRITES its filter to
    // shared storage and ships back only the shard index (ADVICE r4:
    // collect()ing the filters put the full aggregate sketch — the
    // multi-GB thing this fallback exists to avoid — on the driver
    // heap); the probe loop then loads/broadcasts ONE filter at a
    // time, so no process ever holds more than size/N of sketch.
    import org.apache.spark.util.sketch.BloomFilter
    val shardDir = s"${graft.ArtifactStore.root}/_bloom_shards/" +
      java.util.UUID.randomUUID().toString
    def shardPath(i: Int) = new org.apache.hadoop.fs.Path(s"$shardDir/shard-$i.bloom")
    val hconf = s.sessionState.newHadoopConf()
    // ship the DRIVER's resolved fs conf to the build tasks: a bare
    // executor-side `new Configuration()` misses spark.hadoop.*-
    // propagated settings (fs.defaultFS, credentials — the common
    // cloud setup), so build tasks would write file:// on their own
    // local disks while the driver reads a shared filesystem
    val fsConfB = s.sparkContext.broadcast {
      val it = hconf.iterator(); val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      b.result()
    }
    // shard files are scratch, not an artifact: every probe below is
    // eagerly materialized (localCheckpoint), so the dir is deletable
    // the moment `probed` exists — and the delete sits in a finally so
    // a failed build or probe iteration can't leak the shards under
    // the artifact root permanently (ADVICE r5)
    val probed = try {
      val built = nonNull.select(col("fp"))
        .as(org.apache.spark.sql.Encoders.STRING).rdd
        .map(f => (Integer.parseInt(f.substring(0, 2), 16) % shards, f))
        .partitionBy(new org.apache.spark.HashPartitioner(shards))
        .mapPartitionsWithIndex { (shard, it) =>
          val bf = BloomFilter.create(perShard, fpp)
          it.foreach { case (_, f) => bf.putString(f) }
          val p = new org.apache.hadoop.fs.Path(s"$shardDir/shard-$shard.bloom")
          val c = new org.apache.hadoop.conf.Configuration(false)
          fsConfB.value.foreach { case (k, v) => c.set(k, v) }
          val fs = p.getFileSystem(c)
          val out = fs.create(p, true)
          try bf.writeTo(out) finally out.close()
          Iterator(shard)
        }.collect()
      require(built.sorted.sameElements(0 until shards),
        s"bloom shard build produced ${built.length}/$shards filters")
      fsConfB.destroy()
      def loadShard(i: Int): BloomFilter = {
        val p = shardPath(i)
        val in = p.getFileSystem(hconf).open(p)
        try BloomFilter.readFrom(in) finally in.close()
      }
      val batch = docs.filter(col("doc_id") % 10 >= 8)
        .select(col("doc_id"), fp.as("fp"))
        .withColumn("shard", shardOf)
        .localCheckpoint(true)
      // sequential shard probes: only one shard's filter is live at a
      // time — loaded from storage, broadcast, probed, destroyed (the
      // eager checkpoint materializes the probe before the destroy);
      // null-fp rows skip probing entirely
      (0 until shards).map { i =>
        val bcI = s.sparkContext.broadcast(loadShard(i))
        val flagged = batch.filter(col("shard") === i)
          .withColumn("might",
            graft.functions.GraftFunctions.bloomContains(bcI, col("fp")))
          .select(col("doc_id"), col("fp"), col("might"))
          .localCheckpoint(true)
        bcI.destroy()
        flagged
      }.reduce(_ unionByName _)
        .unionByName(batch.filter(col("fp").isNull)
          .select(col("doc_id"), col("fp"), lit(false).as("might")))
    } finally {
      new org.apache.hadoop.fs.Path(shardDir).getFileSystem(hconf)
        .delete(new org.apache.hadoop.fs.Path(shardDir), true)
    }
    val definitelyNew = probed.filter(!col("might"))
      .select(col("doc_id"), col("fp"))
    val confirmedNew = probed.filter(col("might"))
      .select(col("doc_id"), col("fp"))
      .join(snapshot, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
    definitelyNew.unionByName(confirmedNew).orderBy(col("doc_id"))
  }

  /** Leakage-safe train/eval split: the split unit is the DUPLICATE
    * CLUSTER, not the document. Splitting a deduplicated-but-not-
    * clustered corpus document-wise leaks near-identical text across
    * the train/eval boundary (the standard benchmark-contamination
    * failure); here every document inherits its cluster's split, so a
    * near-dup family lands wholly in train or wholly in eval.
    *
    * Pipeline: near-dup pairs → [[connectedComponents]] (pair-graph-
    * sized, not corpus-sized) → left-join the cluster map onto the
    * corpus (singletons are their own cluster) → split by md5 prefix
    * of cluster_id (deterministic ~80/20, the house hash-sampling
    * mechanism) → per-split rollup plus the leakage invariant
    * computed IN-PLAN: the number of clusters whose members straddle
    * splits, which must be 0 by construction and is graded by the
    * oracle. All stages are corpus-linear or pair-graph-sized. The
    * pair stage here is [[jaccardNearDup]]'s bounded oracle form
    * (what makes the recursive-CTE oracle feasible); at scale it is
    * [[minhashLshOn]] candidates, exactly as in [[clusters]]. */
  def leakageSafeSplit(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val comp = nearDupComponents(s, d)
    val lab = docs.join(comp, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(substring(md5(col("cluster_id").cast("string")), 1, 2) < "cd",
          "train").otherwise("eval")) // P(hex byte < 0xcd) = 205/256 ≈ 80%
    // the single-row invariant joins on a constant key (equi-join →
    // broadcast hash), not crossJoin (→ nested-loop, which the plan
    // invariant suite rightly rejects)
    val straddle = lab.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("nsp"))
      .agg(sum(when(col("nsp") > 1, 1L).otherwise(0L)).as("n_straddling"))
      .withColumn("__k", lit(1))
    lab.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      .withColumn("__k", lit(1))
      .join(broadcast(straddle), Seq("__k"))
      .select(col("split"), col("n_docs"), col("n_clusters"),
        col("n_straddling"))
      .orderBy(col("split"))
  }

  // ------------------------------------------ paragraph-level dedup

  /** Fixed block width (words) for [[paragraphDedup]]. Real pipelines
    * split on structural boundaries (newlines, HTML blocks); the
    * fixture corpus is a single-line word stream, so the block
    * grammar is positional — the dedup semantics are identical. */
  private[graft] val ParaWords = 16

  /** PARAGRAPH-LEVEL DEDUPLICATION — the C4/RefinedWeb operation the
    * doc-level families don't cover: boilerplate repeats *inside*
    * otherwise-unique documents (nav bars, license headers, quoted
    * replies), so the dedup unit is the paragraph, and the document
    * survives with its duplicated paragraphs removed rather than
    * being dropped whole.
    *
    * Pipeline: each document splits into fixed-width word blocks
    * (one `transform` over the split array — no groupBy to rebuild
    * blocks); the globally-first occurrence of each distinct block
    * wins (row_number over the block text, ordered by (doc_id, blk)
    * — the [[firstWins]] rule at paragraph grain); every document is
    * reassembled from its surviving blocks in order. Output per doc:
    * block count, dropped count, and the deduplicated text.
    *
    * Scale: two hash shuffles, both on high-cardinality keys — the
    * block text (the window) and doc_id (the reassembly) — each
    * linear in corpus size; no join, no all-pairs stage. A degenerate
    * mass-duplicate block (the LSH-cap scenario) costs one skewed
    * window partition, not a quadratic join — row_number over a hot
    * key is a sort within one partition, and AQE's skew handling
    * applies. The reassembly concat is bounded by the document
    * length. */
  def paragraphDedup(s: SparkSession, d: String): DataFrame =
    // pure function of the documents snapshot → content-addressed and
    // SERVED (the tfidf/clusters_lsh discipline): paragraph dedup runs
    // at ingest, consumers read the deduplicated table
    graft.ArtifactStore.parquet(s, "paragraph_dedup",
      s"$d/documents.parquet", version = 1) {
      paragraphDedupOn(Tables.documents(s, d))
    }.orderBy(col("doc_id"))

  /** Core of [[paragraphDedup]], parameterized for the spec. */
  private[graft] def paragraphDedupOn(docs: DataFrame): DataFrame = {
    val blocks = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, (size(ws) - 1) div $ParaWords),
           |  i -> array_join(slice(ws, i * $ParaWords + 1, $ParaWords),
           |                  ' '))""".stripMargin)).as(Seq("blk", "para")))
    val w = Window.partitionBy(col("para"))
      .orderBy(col("doc_id"), col("blk"))
    val ranked = blocks.withColumn("__rn", row_number().over(w))
    val kept = ranked.filter(col("__rn") === 1)
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("blk"), col("para"))))
        .as("ps"))
      .select(col("doc_id"),
        array_join(expr("transform(ps, x -> x.para)"), " ").as("kept_text"))
    ranked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("__rn") > 1, 1L).otherwise(0L)).as("n_dropped"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"), col("n_dropped"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------ exact-substring span removal

  /** Window width (tokens) for [[substringRemove]]. Lee et al. use 50
    * BPE tokens over web-scale corpora; the fixture documents run
    * 10–100 words, so the graded width is 12 — the semantics (any
    * ≥ k-token substring that occurs twice anywhere in the corpus
    * loses every occurrence but its first) are width-independent. */
  private[graft] val SubRemK = 12

  /** EXACT-SUBSTRING DEDUPLICATION WITH SPAN REMOVAL — the method of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better"): any k-token substring that appears more than
    * once in the corpus is removed at every occurrence except the
    * globally first, and each document is REWRITTEN with its
    * duplicated spans cut out. This is the grain between
    * [[paragraphDedup]] (disjoint fixed blocks — misses duplicates
    * that straddle a block boundary or sit at a different offset) and
    * [[substringDedupOn]] (the strided flag REPORT — stride 25 misses
    * unaligned duplicates and nothing is rewritten): stride-1 windows
    * catch every duplicated k-gram at any alignment, and the output
    * is the cleaned corpus itself plus per-doc accounting.
    *
    * Pipeline: every doc explodes into its overlapping k-token
    * windows (one `transform` over the split array); the globally
    * first occurrence of each distinct window text wins (row_number
    * over the window text, ordered (doc_id, pos) — the [[firstWins]]
    * rule at span grain); each LOSING window marks its k covered
    * token positions; a token survives iff no losing window covers
    * it; docs reassemble from surviving tokens in order.
    *
    * Scale: the window text is the one wide shuffle key — kept as raw
    * text here so the DuckDB oracle replays string equality exactly;
    * at 100 TB the key is a 128-bit content hash (collision-safe, 16
    * bytes instead of ~80) and the reference implementation derives
    * the duplicate set from a suffix array — the Spark-native
    * equivalent stays this same shape: one linear window-key shuffle
    * (row_number, map-side-combinable), a coverage explode bounded by
    * k × |losing windows|, one anti-join on (doc_id, position), one
    * doc_id reassembly shuffle. No pair join anywhere; a
    * mass-duplicated window (boilerplate in millions of docs) is one
    * skewed window partition — AQE territory, never a quadratic. */
  def substringRemove(s: SparkSession, d: String): DataFrame =
    // pure function of the documents snapshot → content-addressed and
    // SERVED (the paragraph_dedup discipline): span removal runs at
    // ingest, consumers read the rewritten table
    graft.ArtifactStore.parquet(s, "substring_remove",
      s"$d/documents.parquet", version = 1) {
      substringRemoveOn(Tables.documents(s, d))
    }.orderBy(col("doc_id"))

  /** Core of [[substringRemove]], parameterized for the spec. */
  private[graft] def substringRemoveOn(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val wins = toks.filter(size(col("ws")) >= SubRemK)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(ws) - $SubRemK),
           |  i -> array_join(slice(ws, i + 1, $SubRemK), ' '))"""
          .stripMargin)).as(Seq("pos", "win")))
    val w = Window.partitionBy(col("win"))
      .orderBy(col("doc_id"), col("pos"))
    val losers = wins.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
    val covered = losers
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + $SubRemK - 1)")).as("ti"))
      .distinct()
    val tokens = toks
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("ti", "tok")))
    val kept = tokens.join(covered, Seq("doc_id", "ti"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("ti"), col("tok"))))
        .as("ts"))
      .select(col("doc_id"),
        array_join(expr("transform(ts, x -> x.tok)"), " ").as("kept_text"))
    tokens.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"))
      .join(covered.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_removed")), Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------ right-to-be-forgotten cascade

  /** Composite (doc_id, blk) encoding for the paragraph-winner legs
    * of [[forgetReport]]: lexicographic argmin as one integer min.
    * blk is bounded by doc length / [[ParaWords]] — the require in
    * [[forgetReportOn]] fails loud before the encoding could wrap.
    * At 100 TB the same leg is a struct argmin (min of (doc_id, blk)
    * pairs); the integer form keeps the DuckDB replay a plain MIN. */
  private[graft] val ForgetBlkBase = 1048576L

  /** RIGHT-TO-BE-FORGOTTEN CASCADE REPORT (`corpus_forget_report`) —
    * the deletion-side composition the maintenance triptychs
    * (ivf/nsw append-delete-compact) imply but don't show: when a
    * tombstone set of documents (doc_id ≡ 3 mod 10, the shared
    * deletion split) must be purged, every DERIVED artifact the
    * engine serves has to account for the cascade. One graded report,
    * one row per artifact family:
    *
    *  - `10_docs` / `11_tokens`: raw purge mass (docs, tokens);
    *  - `20_postings`: inverted-index posting rows to drop (the
    *    layout_inverted (doc, distinct-term) projection — same
    *    definition, so report and index cannot drift);
    *  - `30_exact_clusters`: exact-dup groups (the dedup_exact
    *    sha-256 key) that VANISH (every member purged) vs groups
    *    whose canonical doc (min doc_id) was purged but a survivor
    *    remains — the canonical REASSIGNS (rewired);
    *  - `40_paragraphs`: distinct paragraph blocks (the
    *    dedup_paragraph grammar) whose content disappears entirely
    *    vs blocks whose first-wins WINNER was purged and a later
    *    occurrence takes over.
    *
    * The rewired counts are the operationally scary part of a purge:
    * they are rows in SERVED artifacts whose values change without
    * their own inputs being deleted — exactly what an incremental
    * purge job must rewrite beyond the tombstoned rows themselves.
    *
    * Scale: every leg is one linear scan + one hash aggregate on the
    * family's own key (digest / term / paragraph text) with
    * conditional-min/filter measures folded into the same aggregate —
    * no joins, no windows, no pair stage; the five single-row funnels
    * union driver-side. */
  def forgetReport(s: SparkSession, d: String): DataFrame =
    forgetReportOn(Tables.documents(s, d))

  /** Core of [[forgetReport]], parameterized for the spec. */
  private[graft] def forgetReportOn(docs: DataFrame): DataFrame = {
    val del = col("doc_id") % 10 === 3
    def shape(stage: String, df: DataFrame): DataFrame =
      df.select(lit(stage).as("stage"), col("n_before"),
        col("n_purged"), col("n_rewired"))
    val s1 = shape("10_docs", docs.agg(
      count(lit(1)).as("n_before"),
      sum(when(del, 1L).otherwise(0L)).as("n_purged"))
      .withColumn("n_rewired", lit(0L)))
    val toks = docs.select(del.as("d"),
      size(TextOps.tokensNonEmpty(col("text"))).cast("long").as("nt"))
    val s2 = shape("11_tokens", toks.agg(
      sum(col("nt")).as("n_before"),
      sum(when(col("d"), col("nt")).otherwise(0L)).as("n_purged"))
      .withColumn("n_rewired", lit(0L)))
    val posts = docs.select(col("doc_id"), del.as("d"),
      explode(array_distinct(TextOps.tokensNonEmpty(col("text"))))
        .as("term"))
    val s3 = shape("20_postings", posts.agg(
      count(lit(1)).as("n_before"),
      sum(when(col("d"), 1L).otherwise(0L)).as("n_purged"))
      .withColumn("n_rewired", lit(0L)))
    val groups = docs
      .groupBy(unhex(sha2(lower(trim(col("text"))), 256)).as("norm"))
      .agg(min(col("doc_id")).as("first_all"),
        min(when(!del, col("doc_id"))).as("first_surv"))
    val s4 = shape("30_exact_clusters", groups.agg(
      count(lit(1)).as("n_before"),
      sum(when(col("first_surv").isNull, 1L).otherwise(0L))
        .as("n_purged"),
      sum(when(col("first_surv").isNotNull &&
          col("first_surv") =!= col("first_all"), 1L).otherwise(0L))
        .as("n_rewired")))
    val blocks = docs
      .select(col("doc_id"), del.as("d"),
        split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("d"), posexplode(expr(
        s"""transform(sequence(0, (size(ws) - 1) div $ParaWords),
           |  i -> array_join(slice(ws, i * $ParaWords + 1, $ParaWords),
           |                  ' '))""".stripMargin)).as(Seq("blk", "para")))
      // the assert_true rider makes the encoding bound a PLAN-level
      // invariant (fails the job loud on overflow) at zero cost on
      // the happy path — no eager construction-time action
      .withColumn("key",
        col("doc_id") * ForgetBlkBase + col("blk") +
          coalesce(assert_true(col("blk") < lit(ForgetBlkBase),
            lit(s"forgetReport: blk overflows base $ForgetBlkBase"))
            .cast("long"), lit(0L)))
    val paras = blocks
      .groupBy(col("para"))
      .agg(min(col("key")).as("first_all"),
        min(when(!col("d"), col("key"))).as("first_surv"))
    val s5 = shape("40_paragraphs", paras.agg(
      count(lit(1)).as("n_before"),
      sum(when(col("first_surv").isNull, 1L).otherwise(0L))
        .as("n_purged"),
      sum(when(col("first_surv").isNotNull &&
          col("first_surv") =!= col("first_all"), 1L).otherwise(0L))
        .as("n_rewired")))
    s1.unionByName(s2).unionByName(s3).unionByName(s4)
      .unionByName(s5)
      .orderBy(col("stage"))
  }

  /** Deterministic duplicate layer for the forget-APPLY corpus: every
    * doc_id ≡ 0 (mod 5) gains an exact copy at doc_id + offset. The
    * fixture's documents carry no exact-duplicate texts at any SF
    * (verified by digest-grouping all three), so a purge over the raw
    * table could never exercise the canonical-reassignment path —
    * this layer is a pure function of the table (the er_resolve
    * SynthVoters discipline: the oracle recomputes it with one
    * UNION ALL), and the offset is ≡ 2 (mod 4) so the `% 4 == 0`
    * tombstone split hits originals and copies INDEPENDENTLY: the
    * cascade's three cases (drop, vanish, rewire) all occur at every
    * SF (25/25/251 exact rewires at sf0.001/0.01/0.1). */
  private[graft] val ForgetCopyOff = 1000002L
  private[graft] def forgetCorpusOn(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + ForgetCopyOff).as("doc_id"),
          col("text")))

  /** The tombstone split of the forget-apply corpus. `% 4`, not the
    * report's `% 10 == 3`: the duplicate layer's ids are what carry
    * rewire coverage, and ≡ 2 (mod 4) offset × `% 4 == 0` is the
    * smallest split where a canonical can die while its copy
    * survives AND vice versa. */
  private[graft] val forgetTomb: Column = col("doc_id") % 4 === 0

  private[graft] def forgetPostingsOn(corpus: DataFrame): DataFrame =
    fanOut(corpus).select(col("doc_id"),
      explode(array_distinct(TextOps.tokensNonEmpty(col("text"))))
        .as("term"))

  private[graft] def forgetExactMembersOn(corpus: DataFrame): DataFrame =
    fanOut(corpus).select(
      sha2(lower(trim(col("text"))), 256).as("norm"), col("doc_id"))

  private[graft] def forgetParaMembersOn(corpus: DataFrame): DataFrame =
    fanOut(corpus)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, (size(ws) - 1) div $ParaWords),
           |  i -> array_join(slice(ws, i * $ParaWords + 1, $ParaWords),
           |                  ' '))""".stripMargin)).as(Seq("blk", "para")))
      .select(md5(col("para")).as("pk"),
        (col("doc_id") * ForgetBlkBase + col("blk") +
          coalesce(assert_true(col("blk") < lit(ForgetBlkBase),
            lit(s"forgetApply: blk overflows base $ForgetBlkBase"))
            .cast("long"), lit(0L))).as("key"))

  /** EXECUTED RIGHT-TO-BE-FORGOTTEN CASCADE (`corpus_forget_apply`,
    * VERDICT r12 #2) — [[forgetReport]] counts what a purge must
    * touch; this operator PERFORMS it on frozen serving artifacts and
    * emits the post-purge state, graded by an oracle that REBUILDS
    * the same artifacts from scratch on the survivors — the
    * `graph_cc_incremental` proof discipline (incremental ≡ rebuild)
    * applied to compliance deletion.
    *
    * Serving artifacts (content-addressed, built once per snapshot):
    * the inverted-posting projection (doc, distinct term), the
    * exact-dup membership + canonical map (sha-256 of normalized
    * text → min doc_id — the dedup_exact rule), and the paragraph
    * first-wins membership + winner map (md5 paragraph fingerprint →
    * min integer-encoded (doc, blk) key; grouping by the 128-bit
    * fingerprint instead of the text is the dedup_exact digest-key
    * discipline — the corpus body never becomes a shuffle payload).
    *
    * Batch-time purge, bounded by tombstone mass + affected-group
    * membership — the corpus is never re-scanned:
    *  - postings: tombstone semi-join counts the dropped rows;
    *  - canonicals: groups whose canonical is tombstoned (map ⋈
    *    tombstones — affected-fraction rows) re-derive their min
    *    over SURVIVING members of those groups only; groups with no
    *    survivor vanish;
    *  - paragraph winners: identical shape on the winner map, the
    *    owning doc recovered from the key by integer division.
    *
    * Output: per-family before/after funnel rows (key = '') plus ONE
    * ROW PER REWIRED ARTIFACT ENTRY — (family key, old value, new
    * value) — the rows a serving index must rewrite without their
    * own inputs being deleted, i.e. exactly what the report called
    * the operationally scary part. The oracle knows nothing of the
    * artifacts: it rebuilds both states from the corpus directly, so
    * a hash match PROVES the incremental rewrite equals a from-
    * scratch survivor rebuild. */
  def forgetApply(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val input = s"$d/documents.parquet"
    val corpus = forgetCorpusOn(docs)
    val postings = graft.ArtifactStore.parquet(s, "forget_postings",
      input)(forgetPostingsOn(corpus))
    val exactMembers = graft.ArtifactStore.parquet(s,
      "forget_exact_members", input)(forgetExactMembersOn(corpus))
    val exactMap = graft.ArtifactStore.parquet(s, "forget_exact_map",
      input)(exactMembers.groupBy(col("norm"))
        .agg(min(col("doc_id")).as("canonical")))
    val paraMembers = graft.ArtifactStore.parquet(s,
      "forget_para_members", input)(forgetParaMembersOn(corpus))
    val paraWinners = graft.ArtifactStore.parquet(s,
      "forget_para_winners", input)(paraMembers.groupBy(col("pk"))
        .agg(min(col("key")).as("winner")))
    forgetApplyOn(corpus, postings, exactMembers, exactMap,
      paraMembers, paraWinners)
  }

  /** Core of [[forgetApply]], parameterized on the artifact frames so
    * the spec can drive it with planted artifacts (and corrupt one to
    * prove the output reads the store, not the corpus). */
  private[graft] def forgetApplyOn(corpus: DataFrame,
      postings: DataFrame, exactMembers: DataFrame, exactMap: DataFrame,
      paraMembers: DataFrame, paraWinners: DataFrame): DataFrame = {
    // the tombstone id set joins five downstream stages — pin it once
    // (tombstone-fraction of the corpus id column; a production purge
    // job materializes its tombstone manifest exactly once)
    val tombIds = corpus.filter(forgetTomb).select(col("doc_id"))
      .localCheckpoint(true)
    def one(df: DataFrame): DataFrame = df.withColumn("__k", lit(1))
    // postings: dropped rows = tombstone semi-join; after = before − dropped
    val s1 = one(postings.agg(count(lit(1)).as("old_id")))
      .join(one(postings.join(tombIds, Seq("doc_id"), "left_semi")
        .agg(count(lit(1)).as("dr"))), Seq("__k"))
      .select(lit("10_postings").as("stage"), lit("").as("key"),
        col("old_id"), (col("old_id") - col("dr")).as("new_id"))
    // exact canonicals: affected = canonical tombstoned; of those,
    // groups with a surviving member REWIRE to the surviving min,
    // the rest vanish — nothing outside the affected groups is read
    val affE = exactMap.join(
      tombIds.withColumnRenamed("doc_id", "canonical"),
      Seq("canonical"), "left_semi")
    val rewE = exactMembers.join(affE, Seq("norm"))
      .join(tombIds, Seq("doc_id"), "left_anti")
      .groupBy(col("norm"), col("canonical"))
      .agg(min(col("doc_id")).as("new_id"))
    val s2 = one(exactMap.agg(count(lit(1)).as("old_id")))
      .join(one(affE.agg(count(lit(1)).as("na"))), Seq("__k"))
      .join(one(rewE.agg(count(lit(1)).as("nr"))), Seq("__k"))
      .select(lit("20_exact_clusters").as("stage"), lit("").as("key"),
        col("old_id"),
        (col("old_id") - (col("na") - col("nr"))).as("new_id"))
    val s3 = rewE.select(lit("30_exact_rewired").as("stage"),
      col("norm").as("key"), col("canonical").as("old_id"),
      col("new_id"))
    // paragraph winners: same shape; owning doc = key div base
    val affP = paraWinners
      .withColumn("doc_id", expr(s"winner DIV $ForgetBlkBase"))
      .join(tombIds, Seq("doc_id"), "left_semi").drop("doc_id")
    val rewP = paraMembers.join(affP, Seq("pk"))
      .withColumn("doc_id", expr(s"key DIV $ForgetBlkBase"))
      .join(tombIds, Seq("doc_id"), "left_anti")
      .groupBy(col("pk"), col("winner"))
      .agg(min(col("key")).as("new_id"))
    val s4 = one(paraWinners.agg(count(lit(1)).as("old_id")))
      .join(one(affP.agg(count(lit(1)).as("na"))), Seq("__k"))
      .join(one(rewP.agg(count(lit(1)).as("nr"))), Seq("__k"))
      .select(lit("40_para_clusters").as("stage"), lit("").as("key"),
        col("old_id"),
        (col("old_id") - (col("na") - col("nr"))).as("new_id"))
    val s5 = rewP.select(lit("50_para_rewired").as("stage"),
      col("pk").as("key"), col("winner").as("old_id"), col("new_id"))
    s1.unionByName(s2).unionByName(s3).unionByName(s4).unionByName(s5)
      .orderBy(col("stage"), col("key"))
  }

  // ------------------------------------------ composed entity resolution

  private val ErSlice = 1000L // bounded record slice (the fuzzy-join slice)
  /** Fellegi–Sunter-shaped fixed-point agreement weights (10⁶ lattice,
    * exact integers — no float log-odds to diverge cross-engine). The
    * threshold sits strictly between the best non-match composite
    * (name + city agree, geo disagrees: 2.5M) and the true-dup
    * composite (all three agree: 4.5M). */
  private val ErWName = 2000000L
  private val ErWNameMiss = -1000000L
  private val ErWCity = 1000000L
  private val ErWCityMiss = -500000L
  private val ErWGeo = 1500000L
  private val ErWGeoMiss = -500000L
  private val ErThreshold = 3000000L
  /** Per-geocell membership cap for ER blocking pass 2 — the
    * [[defaultMaxBucket]] discipline. A dense urban cell (one
    * decidegree cell of a megacity holds millions of records at real
    * scale) would otherwise self-join quadratically; the cap bounds
    * it at C(cap,2) pairs and publishes the dropped membership as the
    * `graft_er_cell_overflow` observed metric. */
  val erMaxCell = 256

  /** COMPOSED ENTITY RESOLUTION over the voter domain (VERDICT r9 #4)
    * — the primitives this module already grades, assembled the way
    * record linkage actually ships: BLOCK (two passes) → SCORE
    * (multi-field weighted agreement) → THRESHOLD → CLUSTER
    * ([[connectedComponents]]) → SURVIVE (canonical per cluster).
    *
    * Records are voter-shaped rows derived from `customer` (the
    * SynthVoters discipline — a pure function of the table, so the
    * oracle recomputes everything from `customer` directly): per
    * customer a base record, plus for every 7th a second-source twin
    * whose name carries a one-character deletion at a key-dependent
    * position (same city + geocode), for every 21st a THIRD variant
    * deleted at a different position (same city + geocode), and for
    * every 11th an impostor with the SAME name but different city and
    * shifted geocode. The two twins are edit-2 from each other, so
    * their cluster only forms via transitivity through the base —
    * clustering is load-bearing, not decorative. The impostor scores
    * 1.0M (name alone) and must stay out.
    *
    * Blocking pass 1 is the FastSS deletion neighborhood on the name
    * ([[fuzzyJoinEdit1On]]'s key scheme — complete for edit ≤ 1,
    * buckets alphabet-bounded). Pass 2 blocks on the decidegree
    * geocode cell — the "zip-code block" of classical record linkage
    * (a name-prefix or phonetic pass would be vacuous here: the
    * synthetic names share one long prefix and one phonetic class, so
    * the cell key is the pass that carries real selectivity; per-cell
    * membership is capped at [[erMaxCell]] exactly like
    * [[defaultMaxBucket]], with dropped membership published as the
    * `graft_er_cell_overflow` observed metric). Candidates = the
    * DISTINCT union of both passes — either pass alone misses matches
    * the other finds.
    *
    * Scoring is exact-integer: levenshtein ≤ 1 on names, equality on
    * city and cell, fixed-point weights summed and thresholded — the
    * Fellegi–Sunter shape with the log-likelihood ratios pinned to
    * the 10⁶ lattice. Survivorship: the cluster label IS the minimum
    * rec_id (the [[connectedComponents]] fixpoint), i.e. the base
    * record wins; its name is served as the canonical form.
    *
    * Scale: both blocking passes are equi-joins with bounded buckets
    * (FastSS: ≤ |Σ|+1 per key; cells: capped at [[erMaxCell]] — a
    * dense cell truncates to the cap's smallest rec_ids and reports
    * the overflow, never goes quadratic), scoring is
    * a narrow projection per candidate, and the cluster stage is the
    * shared iterative min-label propagation — each stage is the
    * already-graded scale path, composed. The resolved-entity table
    * is a per-corpus-snapshot derivative (record linkage runs at
    * ingest, consumers read the resolved table), so it is
    * content-addressed and SERVED — the kcore/LPA batch-maintenance
    * discipline; the live composition stays exercised by the
    * brute-force spec through [[erResolveOn]]. */
  def erResolve(s: SparkSession, d: String): DataFrame =
    graft.ArtifactStore.parquet(s, "er_resolve",
      s"$d/customer.parquet", version = 1) {
      erResolveOn(erRecords(s, d))
    }.orderBy(col("cluster_id"))

  /** Voter-shaped ER corpus: a pure function of `customer` (see
    * [[erResolve]]). rec_id = custkey·10 + source-seq, so the base
    * record holds the minimum id of its cluster. */
  /** ONE definition of the [[erRecords]] synthesis replay (CTE pair
    * `c0`/`recs` from `customer` to voter-shaped records) — shared by
    * the er_resolve oracle and Analytics' geo_dbscan oracle, so the
    * record synthesis cannot drift between its two consumers. */
  private[graft] def erRecsCtesSql: String =
    s"""c0 AS MATERIALIZED (
       |  SELECT c_custkey AS k, c_name AS nm, c_mktsegment AS city,
       |    c_custkey % 1800 AS lat10, c_custkey * 7 % 3600 AS lon10
       |  FROM customer WHERE c_custkey < $ErSlice),
       |recs AS MATERIALIZED (
       |  SELECT k * 10 AS rec_id, nm AS name, city, lat10, lon10 FROM c0
       |  UNION ALL
       |  SELECT k * 10 + 1,
       |    substr(nm, 1, CAST(k % length(nm) + 1 AS INT) - 1) ||
       |      substr(nm, CAST(k % length(nm) + 1 AS INT) + 1, length(nm)),
       |    city, lat10, lon10 FROM c0 WHERE k % 7 = 0
       |  UNION ALL
       |  SELECT k * 10 + 2,
       |    substr(nm, 1, CAST(k % (length(nm) - 2) + 3 AS INT) - 1) ||
       |      substr(nm, CAST(k % (length(nm) - 2) + 3 AS INT) + 1, length(nm)),
       |    city, lat10, lon10 FROM c0 WHERE k % 21 = 0
       |  UNION ALL
       |  SELECT k * 10 + 3, nm, city || '-X', lat10 + 1, lon10
       |  FROM c0 WHERE k % 11 = 0)""".stripMargin

  private[graft] def erRecords(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_custkey") < ErSlice)
      .select(col("c_custkey").as("k"), col("c_name").as("nm"),
        col("c_mktsegment").as("city"))
      .withColumn("lat10", col("k") % 1800)
      .withColumn("lon10", col("k") * 7 % 3600)
    def delAt(nm: Column, pos: Column): Column =
      concat(nm.substr(lit(1), (pos - 1).cast("int")),
        nm.substr((pos + 1).cast("int"), length(nm)))
    val base = c.select((col("k") * 10).as("rec_id"), col("nm").as("name"),
      col("city"), col("lat10"), col("lon10"))
    val twin = c.filter(col("k") % 7 === 0)
      .select((col("k") * 10 + 1).as("rec_id"),
        delAt(col("nm"), col("k") % length(col("nm")) + 1).as("name"),
        col("city"), col("lat10"), col("lon10"))
    val twin2 = c.filter(col("k") % 21 === 0)
      .select((col("k") * 10 + 2).as("rec_id"),
        delAt(col("nm"), col("k") % (length(col("nm")) - 2) + 3).as("name"),
        col("city"), col("lat10"), col("lon10"))
    val impostor = c.filter(col("k") % 11 === 0)
      .select((col("k") * 10 + 3).as("rec_id"), col("nm").as("name"),
        concat(col("city"), lit("-X")).as("city"),
        (col("lat10") + 1).as("lat10"), col("lon10"))
    base.unionByName(twin).unionByName(twin2).unionByName(impostor)
  }

  /** Geocell blocking pass of [[erResolveOn]], capped at `maxCell`
    * members per (lat10, lon10) cell: the `maxCell` smallest rec_ids
    * survive (deterministic), the dropped membership count is
    * published as `graft_er_cell_overflow`. Split out so the cap is
    * testable at the layer where it acts — the scoring stage kills
    * most over-cap pairs anyway, so only the candidate volume (the
    * thing that goes quadratic) shows the cap. */
  private[graft] def erCellBlock(recs: DataFrame,
      maxCell: Int = erMaxCell): DataFrame = {
    val wCell = Window.partitionBy(col("lat10"), col("lon10"))
      .orderBy(col("rec_id"))
    val cells = recs.select(col("rec_id"), col("lat10"), col("lon10"))
      .withColumn("__rank", row_number().over(wCell))
      .observe("graft_er_cell_overflow",
        sum(when(col("__rank") > maxCell, 1L).otherwise(0L)).as("dropped"))
      .filter(col("__rank") <= maxCell)
      .drop("__rank")
    cells.as("a").join(cells.as("b"),
        col("a.lat10") === col("b.lat10") &&
          col("a.lon10") === col("b.lon10") &&
          col("a.rec_id") < col("b.rec_id"))
      .select(col("a.rec_id").as("a_id"), col("b.rec_id").as("b_id"))
  }

  /** Core of [[erResolve]], parameterized for the brute-force spec. */
  private[graft] def erResolveOn(recs0: DataFrame,
      maxCell: Int = erMaxCell): DataFrame = {
    val recs = recs0.localCheckpoint(true) // blocking passes + scoring + survivorship read it
    // pass 1: FastSS deletion keys on the name (complete for edit ≤ 1)
    val vars = recs.select(col("rec_id"), explode(concat(
        array(col("name")),
        expr("""transform(sequence(1, length(name)),
          |  i -> concat(substring(name, 1, i - 1),
          |              substring(name, i + 1, length(name))))""".stripMargin)))
        .as("v"))
    val cand1 = vars.as("a").join(vars.as("b"),
        col("a.v") === col("b.v") && col("a.rec_id") < col("b.rec_id"))
      .select(col("a.rec_id").as("a_id"), col("b.rec_id").as("b_id"))
    // pass 2: geocode-cell block, capped per cell (see [[erMaxCell]])
    val cand2 = erCellBlock(recs, maxCell)
    val cand = cand1.unionByName(cand2).distinct()
    // score candidates: fixed-point multi-field agreement, threshold
    val a = recs.select(col("rec_id").as("a_id"), col("name").as("na"),
      col("city").as("ca"), col("lat10").as("xa"), col("lon10").as("ya"))
    val b = recs.select(col("rec_id").as("b_id"), col("name").as("nb"),
      col("city").as("cb"), col("lat10").as("xb"), col("lon10").as("yb"))
    val matched = cand.join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("score",
        when(levenshtein(col("na"), col("nb")) <= 1, lit(ErWName))
          .otherwise(lit(ErWNameMiss)) +
        when(col("ca") === col("cb"), lit(ErWCity))
          .otherwise(lit(ErWCityMiss)) +
        when(col("xa") === col("xb") && col("ya") === col("yb"),
          lit(ErWGeo)).otherwise(lit(ErWGeoMiss)))
      .filter(col("score") >= ErThreshold)
      .select(col("a_id"), col("b_id"))
    // cluster + survive: label = min rec_id = the base record
    val comp = connectedComponents(matched)
      .select(col("doc_id").as("rec_id"), col("cluster_id"))
    comp.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
      .join(recs.select(col("rec_id").as("cluster_id"),
        col("name").as("canonical_name")), Seq("cluster_id"))
      .select(col("cluster_id"), col("n_members"), col("canonical_name"))
      .orderBy(col("cluster_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_resolve" -> erResolve,
    "dedup_paragraph" -> paragraphDedup,
    "dedup_substring_remove" -> substringRemove,
    "corpus_forget_report" -> forgetReport,
    "corpus_forget_apply" -> forgetApply,
    "dedup_exact" -> exactDedup,
    "dedup_incremental" -> incremental,
    "corpus_diff" -> corpusDiff,
    "text_substring_dedup" -> substringDedup,
    "dedup_bloom_incremental" -> bloomIncremental,
    "split_leakage_safe" -> leakageSafeSplit,
    "dedup_first_wins" -> firstWins,
    "dedup_containment" -> containment,
    "dedup_semantic" -> semantic,
    "dedup_semantic_lsh" -> semanticLsh, // generated oracle (SRP replay)
    "dedup_semantic_append" -> semanticAppend, // oracle: split-capped SRP replay
    "dedup_semantic_append_auto" -> semanticAppendAuto, // generated oracle (tuned SRP)
    "dedup_canonical_quality" -> canonicalByQuality,
    "dedup_jaccard_neardup" -> jaccardNearDup,
    "dedup_jaccard_prefix" -> jaccardPrefixJoin,
    "fuzzy_join_edit1" -> fuzzyJoinEdit1,
    "dedup_minhash_lsh" -> minhashLsh, // oracle: full SQL replay (minhashOracleSql)
    "dedup_eval_pr" -> dedupEvalPr, // oracle: signature replay + shingle-join truth
    "dedup_lsh_append" -> lshAppend, // oracle: split-capped replay
    "dedup_simhash" -> simhashNearDup, // oracle: full SQL replay (simhashOracleSql)
    "dedup_winnow" -> winnowNearDup, // oracle: full SQL replay (winnowOracleSql)
    "dedup_clusters" -> clusters,
    "dedup_clusters_lsh" -> clustersLsh, // oracle: full SQL replay (clustersLshOracleSql)
    "text_contamination" -> contamination,
  )

  /** Full SQL replay of the winnow pipeline — kills the "rolling-hash
    * internals aren't SQL" excuse. Every stage of
    * [[graft.functions.WinnowCodegen]] is replayed in DuckDB exactly:
    *
    *  - k-gram hashes as the DIRECT base-257 polynomial over the
    *    UTF-8 bytes (congruent mod 2⁶⁴ to the rolling form — modular
    *    arithmetic is ring-homomorphic), with 257^j as literal
    *    constants and one `% 2^64` on the HUGEINT sum. Bytes come
    *    from hex(encode(text)) pairs via strpos on a hex alphabet.
    *  - splitmix64 in HUGEINT limb arithmetic: xor() works on
    *    HUGEINT, `// 2^s` is a logical shift for non-negative values,
    *    and the two wrapping 64×64 multiplies decompose into 32-bit
    *    limbs against the constant's halves (validated bit-exact
    *    against the JVM on boundary values).
    *  - the winnow window: the rightmost-tie rule affects which
    *    POSITION is selected but never the selected VALUE, so the
    *    fingerprint SET is exactly DISTINCT(windowed MIN) — with the
    *    minima taken over SIGNED longs (Scala Long compare), hence
    *    the unsigned→signed CAST before the window.
    *  - the pair stage mirrors [[winnowNearDupOn]] verbatim
    *    (2 ≤ docs-per-fp ≤ 64 bucket cap, n_shared ≥ 2 and
    *    ≥ 0.25·min(|fpa|,|fpb|)).
    *
    * MATERIALIZED CTEs keep DuckDB from inlining the hash chain into
    * an exponential expression tree. */
  private def winnowChainSql(docsSrc: String, fpsName: String): String = {
    val C1 = java.lang.Long.parseUnsignedLong("bf58476d1ce4e5b9", 16)
    val C2 = java.lang.Long.parseUnsignedLong("94d049bb133111eb", 16)
    def wrapMul(expr: String, c: Long): String = wrapMulSql(expr, c)
    def byteAt(bi: String): String = hexByteSql("hx", bi)
    val pows = Iterator.iterate(1L)(_ * 257L).take(8).toSeq
    val poly = (0 until 8).map(j =>
      s"CAST(${byteAt(s"p+$j")} AS HUGEINT) * ${pows(7 - j)}")
      .mkString(" + ")
    s"""b AS MATERIALIZED (
       |  SELECT doc_id, hex(encode(lower(trim(text)))) AS hx,
       |         octet_length(encode(lower(trim(text)))) AS n
       |  FROM $docsSrc),
       |kg AS MATERIALIZED (
       |  SELECT doc_id, p, (($poly) % $M64) AS h0
       |  FROM (SELECT doc_id, hx, n, unnest(range(1, n - 8 + 2)) AS p
       |        FROM b WHERE n >= 8)),
       |s1 AS MATERIALIZED (SELECT doc_id, p, xor(h0, h0 // 1073741824) AS x FROM kg),
       |s2 AS MATERIALIZED (SELECT doc_id, p, ${wrapMul("x", C1)} AS x FROM s1),
       |s3 AS MATERIALIZED (SELECT doc_id, p, xor(x, x // 134217728) AS x FROM s2),
       |s4 AS MATERIALIZED (SELECT doc_id, p, ${wrapMul("x", C2)} AS x FROM s3),
       |mx AS MATERIALIZED (
       |  SELECT doc_id, p, CAST(CASE WHEN h < 9223372036854775808
       |    THEN h ELSE h - $M64 END AS BIGINT) AS h
       |  FROM (SELECT doc_id, p, xor(x, x // 2147483648) AS h FROM s4)),
       |wmin AS (
       |  SELECT doc_id, p,
       |    MIN(h) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wh,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS m
       |  FROM mx),
       |$fpsName AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, wh AS fp FROM wmin WHERE p >= LEAST(4, m))""".stripMargin
  }

  private val winnowTailSql: String =
    s"""sized AS (SELECT doc_id, fp,
       |  COUNT(*) OVER (PARTITION BY doc_id) AS nfp FROM fps),
       |keep AS (SELECT fp FROM fps GROUP BY fp
       |  HAVING COUNT(*) BETWEEN 2 AND 64),
       |bk AS (SELECT s.* FROM sized s JOIN keep USING (fp)),
       |pairs AS (
       |  SELECT a.doc_id AS a_id, b2.doc_id AS b_id, COUNT(*) AS n_shared,
       |         MIN(a.nfp) AS na, MIN(b2.nfp) AS nb
       |  FROM bk a JOIN bk b2 ON a.fp = b2.fp AND a.doc_id < b2.doc_id
       |  GROUP BY 1, 2)
       |SELECT a_id, b_id, CAST(n_shared AS BIGINT) AS n_shared
       |FROM pairs
       |WHERE n_shared >= 2 AND n_shared >= 0.25 * LEAST(na, nb)
       |ORDER BY a_id, b_id""".stripMargin

  private def winnowOracleSql: String =
    s"""WITH ${winnowChainSql("documents", "fps")},
       |$winnowTailSql""".stripMargin

  /** SCALED winnow oracle (the sf1 sweep's replay-cost fix, VERDICT
    * r10 #3): the per-byte rolling-hash chain — the DuckDB-prohibitive
    * part at 10× data — replays only a deterministic md5-selected doc
    * sample and is compared against the Spark-dumped fingerprint
    * table (`aux_winnow_fps`); the ENTIRE downstream pair pipeline
    * then runs from that aux table. Any sampled-signature divergence
    * empties `fps` (the gate), failing the row-count compare loudly.
    * Full replay remains the sf ≤ 0.1 gate. */
  private[ops] def winnowScaledSql(sample: String): String =
    s"""WITH ${winnowChainSql(s"documents WHERE $sample", "fps_chk")},
       |auxw AS MATERIALIZED (SELECT doc_id, fp FROM aux_winnow_fps),
       |mism AS MATERIALIZED (
       |  SELECT * FROM (SELECT doc_id, fp FROM fps_chk
       |    EXCEPT SELECT doc_id, fp FROM auxw WHERE $sample) t1
       |  UNION ALL
       |  SELECT * FROM (SELECT doc_id, fp FROM auxw WHERE $sample
       |    EXCEPT SELECT doc_id, fp FROM fps_chk) t2),
       |fps AS MATERIALIZED (
       |  SELECT doc_id, fp FROM auxw
       |  WHERE (SELECT COUNT(*) FROM mism) = 0),
       |$winnowTailSql""".stripMargin

  /** Shared SQL helpers for the hash-replay oracles: wrapping 64×64
    * multiply against a CONSTANT via 32-bit limbs in HUGEINT, and hex
    * byte extraction (both validated bit-exact against the JVM). */
  private val M64 = "18446744073709551616"
  private def wrapMulSql(expr: String, c: Long): String = {
    val cLo = java.lang.Long.remainderUnsigned(c, 4294967296L)
    val cHi = java.lang.Long.divideUnsigned(c, 4294967296L)
    s"((($expr) % 4294967296 * $cLo + (((($expr) % 4294967296) * $cHi + " +
      s"(($expr) // 4294967296) * $cLo) % 4294967296) * 4294967296) % $M64)"
  }
  private def hexByteSql(hexCol: String, bi: String): String =
    s"((strpos('0123456789ABCDEF', $hexCol[2*($bi)-1:2*($bi)-1]) - 1) * 16 + " +
      s"strpos('0123456789ABCDEF', $hexCol[2*($bi):2*($bi)]) - 1)"
  private val pow2Sql =
    "[" + (0 until 64).map(i => s"CAST(${java.lang.Long.toUnsignedString(1L << i)} AS HUGEINT)")
      .mkString(",") + "]"

  /** Full SQL replay of the SimHash near-dup pipeline: FNV-1a-64 per
    * token as a `list_reduce` fold over the token's bytes (the
    * wrapping prime multiply via [[wrapMulSql]]), the ±1 bit votes as
    * a (doc × 64) aggregate, Manku 16-bit block keys from the unsigned
    * sketch, the 256-cap per bucket (row_number by doc_id — the same
    * deterministic cap rule), distinct candidate pairs, and
    * `bit_count(xor)` hamming verification. Replays
    * [[graft.functions.SimHashCodegen]] bit-exactly. */
  private def simhashOracleSql: String = simhashOracleSql("", spliceAux = false)

  private def simhashOracleSql(docsWhere: String, spliceAux: Boolean): String = {
    val fnvBasis = java.lang.Long.parseUnsignedLong("cbf29ce484222325", 16)
    val fnvPrime = java.lang.Long.parseUnsignedLong("100000001b3", 16)
    val tokBytes = s"[ ${hexByteSql("th", "i")} " +
      "for i in range(1, CAST(length(th)/2 AS BIGINT) + 1) ]"
    val fnvStep = wrapMulSql("xor(a, CAST(b AS HUGEINT))", fnvPrime)
    val docsSrc = if (docsWhere.isEmpty) "documents"
      else s"documents WHERE $docsWhere"
    // scaled mode: compare the sampled chain's sketches against the
    // Spark-dumped aux_simhash table (signed BIGINT sketches), then
    // feed the block stage from the (unsigned-restored) aux gated on
    // zero symmetric difference — the winnowScaledSql mechanism
    val blockSrc = if (!spliceAux) "sh" else "shx"
    val spliceSql = if (!spliceAux) "" else
      s""",
         |chk AS MATERIALIZED (
         |  SELECT doc_id, CAST(CASE WHEN shu < 9223372036854775808
         |    THEN shu ELSE shu - $M64 END AS BIGINT) AS sk
         |  FROM sh),
         |auxs AS MATERIALIZED (SELECT doc_id, sketch AS sk FROM aux_simhash),
         |mism AS MATERIALIZED (
         |  SELECT * FROM (SELECT doc_id, sk FROM chk
         |    EXCEPT SELECT doc_id, sk FROM auxs WHERE $docsWhere) t1
         |  UNION ALL
         |  SELECT * FROM (SELECT doc_id, sk FROM auxs WHERE $docsWhere
         |    EXCEPT SELECT doc_id, sk FROM chk) t2),
         |shx AS MATERIALIZED (
         |  SELECT doc_id,
         |    (CAST(sk AS HUGEINT) + $M64) % $M64 AS shu
         |  FROM auxs WHERE (SELECT COUNT(*) FROM mism) = 0)""".stripMargin
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM $docsSrc),
       |th AS MATERIALIZED (
       |  SELECT doc_id, hex(encode(tok)) AS th FROM toks),
       |hashes AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(
       |      CAST(${java.lang.Long.toUnsignedString(fnvBasis)} AS HUGEINT),
       |      $tokBytes),
       |      (a, b) -> $fnvStep) AS h
       |  FROM th),
       |bits AS MATERIALIZED (
       |  SELECT doc_id, i,
       |    SUM(CASE WHEN (h // ($pow2Sql)[i+1]) % 2 = 1
       |        THEN 1 ELSE -1 END) AS v
       |  FROM (SELECT doc_id, h, unnest(range(0, 64)) AS i FROM hashes) t
       |  GROUP BY doc_id, i),
       |sh AS MATERIALIZED (
       |  SELECT doc_id,
       |    SUM(CASE WHEN v > 0 THEN ($pow2Sql)[i+1]
       |        ELSE CAST(0 AS HUGEINT) END) AS shu
       |  FROM bits GROUP BY doc_id)$spliceSql,
       |blocks AS MATERIALIZED (
       |  SELECT doc_id, shu, blk,
       |    CAST((shu // ($pow2Sql)[blk*16+1]) % 65536 AS BIGINT) AS key
       |  FROM (SELECT doc_id, shu, unnest(range(0, 4)) AS blk FROM $blockSrc) t),
       |capped AS MATERIALIZED (
       |  SELECT doc_id, shu, blk, key FROM (
       |    SELECT *, row_number() OVER (PARTITION BY blk, key
       |      ORDER BY doc_id) AS rn
       |    FROM blocks) WHERE rn <= $defaultMaxBucket),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a_id, x.shu AS sa,
       |    y.doc_id AS b_id, y.shu AS sb
       |  FROM capped x JOIN capped y
       |    ON x.blk = y.blk AND x.key = y.key AND x.doc_id < y.doc_id)
       |SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** Full SQL replay of the MinHash-LSH pipeline (shared by the
    * `dedup_minhash_lsh` oracle and, with a recursive-CTE clustering
    * tail, `dedup_clusters_lsh`). Replays, bit-exactly:
    *
    *  - FNV-1a-64 of every distinct shingle (list_reduce byte fold);
    *  - the k=32 "permutations" as splitmix64 of base + GOLDEN·s,
    *    with the wrapping GOLDEN·s products spliced as constants;
    *  - SIGNED per-seed minima via the sign-flip isomorphism
    *    (signed order = unsigned order of x XOR 2⁶³, implemented as
    *    +2⁶³ mod 2⁶⁴ — self-inverse);
    *  - Spark's `xxhash64(sig[4b..4b+3])` band buckets: XXH64's
    *    hashLong chain (seed 42) UNROLLED into 7 materialized CTE
    *    steps per value — a single list_reduce lambda expands the
    *    fmix self-references into a 580 KB expression that DuckDB
    *    evaluates per element (~300 s); the stepped form runs in
    *    seconds (the CTE tables are (docs × 8 bands) rows);
    *  - the 256-cap per (band, bucket), distinct candidate pairs, and
    *    exact-Jaccard verification on the ROUNDED value (Spark
    *    filters on the rounded column). */
  private def minhashCtesSql: String = minhashCtesSql("", spliceAux = false)

  /** `docsWhere` restricts the signature-chain input (scaled oracle:
    * a deterministic md5 doc sample); `spliceAux` swaps the capped
    * bucket frame for the Spark-dumped `aux_minhash_buckets` table,
    * gated on the sampled chain matching it exactly (zero symmetric
    * difference), and verifies candidates against FULL-corpus shingle
    * sets. */
  private def minhashCtesSql(docsWhere: String, spliceAux: Boolean): String = {
    val fnvBasis = java.lang.Long.parseUnsignedLong("cbf29ce484222325", 16)
    val fnvPrime = java.lang.Long.parseUnsignedLong("100000001b3", 16)
    val C1 = java.lang.Long.parseUnsignedLong("bf58476d1ce4e5b9", 16)
    val C2 = java.lang.Long.parseUnsignedLong("94d049bb133111eb", 16)
    val gold = java.lang.Long.parseUnsignedLong("9e3779b97f4a7c15", 16)
    val p1 = java.lang.Long.parseUnsignedLong("9E3779B185EBCA87", 16)
    val p2 = java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)
    val p3 = java.lang.Long.parseUnsignedLong("165667B19E3779F9", 16)
    val p4 = java.lang.Long.parseUnsignedLong("85EBCA77C2B2AE63", 16)
    val p5 = java.lang.Long.parseUnsignedLong("27D4EB2F165667C5", 16)
    val h63 = "9223372036854775808"
    def u(x: Long) = java.lang.Long.toUnsignedString(x)
    def rotl(e: String, r: Int): String = {
      val loMod = u(1L << (64 - r)); val mul = u(1L << r)
      s"((($e) % $loMod) * $mul + ($e) // $loMod)"
    }
    val adds = "[" + (1 to 32).map(s => u(gold * s)).mkString(",") + "]"
    val tokBytes = s"[ ${hexByteSql("th", "i")} " +
      "for i in range(1, CAST(length(th)/2 AS BIGINT) + 1) ]"
    val fnvStep = wrapMulSql("xor(a, CAST(b AS HUGEINT))", fnvPrime)
    val keep = "doc_id, band, v1, v2, v3, v4"
    val xxSteps = (1 to 4).flatMap { j =>
      val prev = if (j == 1) "x0" else s"x${j - 1}g"
      val h0 = s"(st + ${u(p5 + 8L)}) % $M64"
      Seq(
        s"x${j}a AS MATERIALIZED (SELECT $keep, xor($h0, " +
          s"${wrapMulSql(rotl(wrapMulSql(s"v$j", p2), 31), p1)}) AS st FROM $prev)",
        s"x${j}b AS MATERIALIZED (SELECT $keep, " +
          s"(${wrapMulSql(rotl("st", 27), p1)} + ${u(p4)}) % $M64 AS st FROM x${j}a)",
        s"x${j}c AS MATERIALIZED (SELECT $keep, xor(st, st // ${u(1L << 33)}) AS st FROM x${j}b)",
        s"x${j}d AS MATERIALIZED (SELECT $keep, ${wrapMulSql("st", p2)} AS st FROM x${j}c)",
        s"x${j}e AS MATERIALIZED (SELECT $keep, xor(st, st // ${u(1L << 29)}) AS st FROM x${j}d)",
        s"x${j}f AS MATERIALIZED (SELECT $keep, ${wrapMulSql("st", p3)} AS st FROM x${j}e)",
        s"x${j}g AS MATERIALIZED (SELECT $keep, xor(st, st // ${u(1L << 32)}) AS st FROM x${j}f)")
    }.mkString(",\n")
    val docsSrc = if (docsWhere.isEmpty) "documents"
      else s"documents WHERE $docsWhere"
    val h63u = "9223372036854775808"
    val cappedSql = if (!spliceAux)
      s"""capped AS MATERIALIZED (
         |  SELECT doc_id, band, bucket FROM (
         |    SELECT doc_id, band, st AS bucket,
         |      row_number() OVER (PARTITION BY band, st ORDER BY doc_id) AS rn
         |    FROM x4g) WHERE rn <= $defaultMaxBucket)""".stripMargin
    else
      s"""chk AS MATERIALIZED (
         |  SELECT doc_id, CAST(band AS BIGINT) AS band,
         |    CAST(CASE WHEN st < $h63u THEN st ELSE st - $M64 END AS BIGINT)
         |      AS bucket
         |  FROM x4g),
         |auxm AS MATERIALIZED (
         |  SELECT doc_id, CAST(band AS BIGINT) AS band, bucket
         |  FROM aux_minhash_buckets),
         |mism AS MATERIALIZED (
         |  SELECT * FROM (SELECT doc_id, band, bucket FROM chk
         |    EXCEPT SELECT doc_id, band, bucket FROM auxm WHERE $docsWhere) t1
         |  UNION ALL
         |  SELECT * FROM (SELECT doc_id, band, bucket FROM auxm WHERE $docsWhere
         |    EXCEPT SELECT doc_id, band, bucket FROM chk) t2),
         |capped AS MATERIALIZED (
         |  SELECT doc_id, band, bucket FROM (
         |    SELECT doc_id, band, bucket,
         |      row_number() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS rn
         |    FROM auxm WHERE (SELECT COUNT(*) FROM mism) = 0)
         |  WHERE rn <= $defaultMaxBucket)""".stripMargin
    val shvSql = if (!spliceAux) "" else
      s""",
         |shv AS MATERIALIZED (
         |  SELECT doc_id, ${shinglesSql.format("text", "text")} AS sha
         |  FROM documents)""".stripMargin
    val verifySrc = if (spliceAux) "shv" else "sh"
    s"""sh AS MATERIALIZED (
       |  SELECT doc_id, ${shinglesSql.format("text", "text")} AS sha
       |  FROM $docsSrc),
       |shex AS MATERIALIZED (
       |  SELECT doc_id, hex(encode(s)) AS th
       |  FROM (SELECT doc_id, unnest(sha) AS s FROM sh)),
       |base AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(${u(fnvBasis)} AS HUGEINT), $tokBytes),
       |      (a, b) -> $fnvStep) AS base
       |  FROM shex),
       |seeded AS MATERIALIZED (
       |  SELECT doc_id, s, (base + ($adds)[s]) % $M64 AS x
       |  FROM (SELECT doc_id, base, unnest(range(1, 33)) AS s FROM base) t),
       |mm1 AS MATERIALIZED (SELECT doc_id, s, xor(x, x // 1073741824) AS x FROM seeded),
       |mm2 AS MATERIALIZED (SELECT doc_id, s, ${wrapMulSql("x", C1)} AS x FROM mm1),
       |mm3 AS MATERIALIZED (SELECT doc_id, s, xor(x, x // 134217728) AS x FROM mm2),
       |mm4 AS MATERIALIZED (SELECT doc_id, s, ${wrapMulSql("x", C2)} AS x FROM mm3),
       |hsx AS MATERIALIZED (SELECT doc_id, s, xor(x, x // 2147483648) AS h FROM mm4),
       |sig AS MATERIALIZED (
       |  SELECT doc_id, s, (MIN((h + $h63) % $M64) + $h63) % $M64 AS sig
       |  FROM hsx GROUP BY doc_id, s),
       |x0 AS MATERIALIZED (
       |  SELECT doc_id, (s - 1) // 4 AS band,
       |    list(sig ORDER BY s)[1] AS v1, list(sig ORDER BY s)[2] AS v2,
       |    list(sig ORDER BY s)[3] AS v3, list(sig ORDER BY s)[4] AS v4,
       |    CAST(42 AS HUGEINT) AS st
       |  FROM sig GROUP BY doc_id, (s - 1) // 4),
       |$xxSteps,
       |$cappedSql$shvSql,
       |candm AS MATERIALIZED (
       |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM capped x JOIN capped y
       |    ON x.band = y.band AND x.bucket = y.bucket
       |      AND x.doc_id < y.doc_id),
       |verified AS MATERIALIZED (
       |  SELECT c.a_id, c.b_id,
       |    round(CAST(len(list_intersect(sa.sha, sb.sha)) AS DOUBLE) /
       |      (len(sa.sha) + len(sb.sha) - len(list_intersect(sa.sha, sb.sha))),
       |      6) AS jaccard
       |  FROM candm c JOIN $verifySrc sa ON sa.doc_id = c.a_id
       |  JOIN $verifySrc sb ON sb.doc_id = c.b_id)""".stripMargin
  }

  private def minhashOracleSql: String =
    s"""WITH $minhashCtesSql
       |SELECT a_id, b_id, jaccard FROM verified
       |WHERE jaccard >= 0.5 ORDER BY a_id, b_id""".stripMargin

  /** Oracle for [[dedupEvalPr]]: the [[minhashCtesSql]] signature/
    * banding replay (sh, sig, candm — the judged detector), an
    * EXACT truth CTE from the shared-shingle equi-join (a pair with
    * zero shared shingles has Jaccard 0, so the join loses no true
    * pair — the prefix-filter join's completeness argument in SQL
    * form), the truth ∪ candidates pool, per-pair signature
    * agreement, and the two-stage P/R tail. */
  /** Shared truth/pool/estimate/metrics tail of the eval oracle —
    * ONE definition for the full and scaled forms, parameterized by
    * the shingle-set CTE (`sh` full / `shv` spliced) and the
    * signature CTE (`sig` chain / `gsig` gated dump). */
  private def dedupEvalPrTailSql(shSrc: String, sigSrc: String): String =
    s"""szs AS (SELECT doc_id, len(sha) AS sz FROM $shSrc),
       |shx AS (SELECT doc_id, unnest(sha) AS s FROM $shSrc),
       |intr AS MATERIALIZED (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
       |  FROM shx a JOIN shx b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |tr AS MATERIALIZED (
       |  SELECT a_id, b_id FROM intr
       |  JOIN szs sa ON sa.doc_id = a_id
       |  JOIN szs sb ON sb.doc_id = b_id
       |  WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6)
       |    >= 0.5),
       |pool AS MATERIALIZED (
       |  SELECT COALESCE(t.a_id, c.a_id) AS a_id,
       |    COALESCE(t.b_id, c.b_id) AS b_id,
       |    CASE WHEN t.a_id IS NOT NULL THEN 1 ELSE 0 END AS is_true,
       |    CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END AS is_cand
       |  FROM tr t FULL JOIN candm c
       |    ON t.a_id = c.a_id AND t.b_id = c.b_id),
       |estm AS MATERIALIZED (
       |  SELECT p.a_id, p.b_id, p.is_true, p.is_cand,
       |    SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS m
       |  FROM pool p JOIN $sigSrc sa ON sa.doc_id = p.a_id
       |  JOIN $sigSrc sb ON sb.doc_id = p.b_id AND sb.s = sa.s
       |  GROUP BY 1, 2, 3, 4),
       |ag AS (SELECT
       |    SUM(is_cand) AS cand_pred, SUM(is_true) AS n_true,
       |    SUM(is_cand * is_true) AS cand_tp,
       |    SUM(CASE WHEN m * 2 >= 32 THEN 1 ELSE 0 END) AS est_pred,
       |    SUM(CASE WHEN m * 2 >= 32 THEN is_true ELSE 0 END) AS est_tp
       |  FROM estm),
       |st AS (
       |  SELECT 'band' AS stage,
       |    CAST(COALESCE(cand_pred, 0) AS BIGINT) AS n_pred,
       |    CAST(COALESCE(n_true, 0) AS BIGINT) AS n_true,
       |    CAST(COALESCE(cand_tp, 0) AS BIGINT) AS n_tp FROM ag
       |  UNION ALL
       |  SELECT 'minhash_est',
       |    CAST(COALESCE(est_pred, 0) AS BIGINT),
       |    CAST(COALESCE(n_true, 0) AS BIGINT),
       |    CAST(COALESCE(est_tp, 0) AS BIGINT) FROM ag)
       |SELECT stage, n_pred, n_true, n_tp,
       |  CASE WHEN n_pred > 0
       |    THEN round(CAST(n_tp AS DOUBLE) / n_pred, 6)
       |    ELSE 0.0 END AS precision,
       |  CASE WHEN n_true > 0
       |    THEN round(CAST(n_tp AS DOUBLE) / n_true, 6)
       |    ELSE 0.0 END AS recall
       |FROM st ORDER BY stage""".stripMargin

  private def dedupEvalPrOracleSql: String =
    s"""WITH $minhashCtesSql,
       |${dedupEvalPrTailSql("sh", "sig")}""".stripMargin

  /** SCALED eval oracle for the sf1 sweep: truth replays in FULL
    * (the shingle-join exact pass is pure relational SQL — cheap at
    * sf1, unlike the per-byte hash chain), candidates splice the
    * gated `aux_minhash_buckets` dump via [[minhashCtesSql]]'s
    * spliceAux mechanism, and the estimate stage splices a FULL
    * `aux_minhash_sigs` dump gated by zero symmetric difference
    * against the sampled chain's `sig` CTE (signed/unsigned
    * conversion follows the chk pattern) — any sampled divergence
    * empties `gsig`, zeroing the estimate row and failing the hash
    * compare loudly. */
  private[ops] def dedupEvalPrScaledSql(sample: String): String = {
    val h63u = "9223372036854775808"
    s"""WITH ${minhashCtesSql(sample, spliceAux = true)},
       |sigchk AS MATERIALIZED (
       |  SELECT doc_id, CAST(s AS BIGINT) AS s,
       |    CAST(CASE WHEN sig < $h63u THEN sig ELSE sig - $M64 END
       |      AS BIGINT) AS sig
       |  FROM sig),
       |auxsig AS MATERIALIZED (
       |  SELECT doc_id, CAST(s AS BIGINT) AS s, sig
       |  FROM aux_minhash_sigs),
       |sigmism AS MATERIALIZED (
       |  SELECT * FROM (SELECT doc_id, s, sig FROM sigchk
       |    EXCEPT SELECT doc_id, s, sig FROM auxsig WHERE $sample) t1
       |  UNION ALL
       |  SELECT * FROM (SELECT doc_id, s, sig FROM auxsig
       |      WHERE $sample
       |    EXCEPT SELECT doc_id, s, sig FROM sigchk) t2),
       |gsig AS MATERIALIZED (
       |  SELECT doc_id, s, sig FROM auxsig
       |  WHERE (SELECT COUNT(*) FROM sigmism) = 0),
       |${dedupEvalPrTailSql("shv", "gsig")}""".stripMargin
  }

  /** Oracle for [[lshAppend]]: the same signature chain, then
    * PER-SPLIT capped bucket frames (rank within the snapshot's
    * buckets and within the batch's buckets independently — exactly
    * the frozen-index + probe discipline), the snapshot×batch
    * bucket join, and the exact-Jaccard verify. `spliceAux` follows
    * the [[minhashCtesSql]] scaled mechanism: the raw bucket frame
    * is the gated `aux_minhash_buckets` dump instead of the derived
    * chain, and shingle verification reads the full corpus. */
  /** Static oracle for `dedup_semantic_append`: the full SRP replay
    * ([[SimilarityOps.srpCtesSql]], fixed 8×64 geometry, seed 42)
    * stopped at `bucketsx`, then the split-capped frozen/probe
    * bucket frames, the cross-split candidate join, and the exact
    * round-6 cosine verify — the [[lshAppendOracleSql]] shape for
    * embeddings. */
  private def semanticAppendOracleSql: String =
    semanticAppendOracleSql("", "")

  /** Scaled (sf1) form of the `dedup_semantic_append` oracle: the SRP
    * accumulator fold replays over the md5-sampled vec subset against
    * the shared `aux_srp_t04` dump (the `sim_threshold_lsh` aux —
    * same geometry, same banding frame definition), and the capped
    * split + cross-join + cosine-verify tail replays in FULL from the
    * gated dump — the [[lshAppendScaledSql]] mechanism. */
  private[graft] def semanticAppendScaledSql(sample: String): String =
    semanticAppendOracleSql(sample, "aux_srp_t04")

  /** Shared SRP-replay head for both ingest-gate oracles: the chain
    * to `bucketsx` at the given geometry, then the split-capped
    * frozen/probe frames and the distinct cross-split candidate
    * join. */
  private def semanticAppendCandCtes(bits: Int, bands: Int, seed: Long,
      vecSample: String, auxTable: String): String = {
    def cap(name: String, pred: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, band, bucket FROM (
         |    SELECT vec_id, band, bucket, row_number() OVER (
         |      PARTITION BY band, bucket ORDER BY vec_id) AS rn
         |    FROM bucketsx WHERE $pred) t
         |  WHERE rn <= $defaultMaxBucket)""".stripMargin
    s"""${SimilarityOps.srpCtesSql(bits, bands, seed, vecSample, auxTable,
      withCand = false)},
       |${cap("scapx", "vec_id % 10 < 8")},
       |${cap("bcapx", "vec_id % 10 >= 8")},
       |candx AS MATERIALIZED (
       |  SELECT DISTINCT s.vec_id AS a_id, b.vec_id AS b_id
       |  FROM scapx s JOIN bcapx b
       |    ON s.band = b.band AND s.bucket = b.bucket)""".stripMargin
  }

  private def semanticAppendOracleSql(vecSample: String,
      auxTable: String): String =
    s"""WITH ${semanticAppendCandCtes(8, 64, 42L, vecSample, auxTable)}
       |SELECT c.a_id, c.b_id,
       |  round(list_cosine_similarity(a.ve, b.ve), 6) AS cosine
       |FROM candx c JOIN vecs a ON a.vec_id = c.a_id
       |JOIN vecs b ON b.vec_id = c.b_id
       |WHERE round(list_cosine_similarity(a.ve, b.ve), 6) >= 0.4
       |ORDER BY a_id, b_id""".stripMargin

  /** `dedup_semantic_append_auto` oracle at a spliced tuned geometry:
    * the same replay head, then the per-batch-vector verdict
    * aggregate (candidate count, ≥-threshold duplicate count, exact
    * max cosine) left-joined onto the full batch-vector list so
    * zero-collision vectors report as admits. */
  private def semanticAppendAutoOracleSql(bits: Int, bands: Int,
      seed: Long, vecSample: String, auxTable: String): String =
    s"""WITH ${semanticAppendCandCtes(bits, bands, seed, vecSample,
      auxTable)},
       |scoredx AS MATERIALIZED (
       |  SELECT c.b_id,
       |    round(list_cosine_similarity(a.ve, b.ve), 6) AS cosine
       |  FROM candx c JOIN vecs a ON a.vec_id = c.a_id
       |  JOIN vecs b ON b.vec_id = c.b_id),
       |aggx AS (SELECT b_id, COUNT(*) AS n_candidates,
       |    SUM(CASE WHEN cosine >= $SemAutoThreshold THEN 1 ELSE 0 END)
       |      AS n_dups,
       |    MAX(cosine) AS max_cosine
       |  FROM scoredx GROUP BY b_id)
       |SELECT v.vec_id AS b_id,
       |  CAST(COALESCE(a.n_candidates, 0) AS BIGINT) AS n_candidates,
       |  CAST(COALESCE(a.n_dups, 0) AS BIGINT) AS n_dups,
       |  a.max_cosine
       |FROM (SELECT vec_id FROM vecs WHERE vec_id % 10 >= 8) v
       |LEFT JOIN aggx a ON a.b_id = v.vec_id
       |ORDER BY b_id""".stripMargin

  /** Generated (tuned-geometry-spliced) oracle for
    * `dedup_semantic_append_auto` — empty until the session ran the
    * query (the Verify protocol runs every query before dumping). */
  private def semanticAppendAutoGeneratedOracle: Map[String, String] =
    SimilarityOps.tunedSrpParams(SemAutoThreshold).map {
      case (bits, bands, seed) =>
        "dedup_semantic_append_auto" ->
          semanticAppendAutoOracleSql(bits, bands, seed, "", "")
    }.toMap

  /** SCALED (sf1) form: sampled accumulator replay vs the
    * `aux_srp_auto` dump at the tuned geometry, relational tail in
    * full from the gated dump — the [[semanticAppendScaledSql]]
    * mechanism. */
  private[ops] def semanticAppendAutoScaledOracle(
      sample: String): Map[String, String] =
    SimilarityOps.tunedSrpParams(SemAutoThreshold).map {
      case (bits, bands, seed) =>
        "dedup_semantic_append_auto" ->
          semanticAppendAutoOracleSql(bits, bands, seed, sample,
            "aux_srp_auto")
    }.toMap

  private def lshAppendOracleSql(docsWhere: String,
      spliceAux: Boolean): String = {
    val h63u = "9223372036854775808"
    val M64 = "18446744073709551616"
    val rawSql = if (!spliceAux)
      s"""rawb AS MATERIALIZED (
         |  SELECT doc_id, band, st AS bucket FROM x4g)""".stripMargin
    else
      s"""rawb AS MATERIALIZED (
         |  SELECT doc_id, band, bucket FROM auxm
         |  WHERE (SELECT COUNT(*) FROM mism) = 0)""".stripMargin
    val verifySrc = if (spliceAux) "shv" else "sh"
    def cap(name: String, pred: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT doc_id, band, bucket FROM (
         |    SELECT doc_id, band, bucket, row_number() OVER (
         |      PARTITION BY band, bucket ORDER BY doc_id) AS rn
         |    FROM rawb WHERE $pred)
         |  WHERE rn <= $defaultMaxBucket)""".stripMargin
    s"""WITH ${minhashCtesSql(docsWhere, spliceAux)},
       |$rawSql,
       |${cap("scapx", "doc_id % 10 < 8")},
       |${cap("bcapx", "doc_id % 10 >= 8")},
       |candx AS MATERIALIZED (
       |  SELECT DISTINCT s.doc_id AS a_id, b.doc_id AS b_id
       |  FROM scapx s JOIN bcapx b
       |    ON s.band = b.band AND s.bucket = b.bucket),
       |verifiedx AS MATERIALIZED (
       |  SELECT c.a_id, c.b_id,
       |    round(CAST(len(list_intersect(sa.sha, sb.sha)) AS DOUBLE) /
       |      (len(sa.sha) + len(sb.sha) -
       |        len(list_intersect(sa.sha, sb.sha))), 6) AS jaccard
       |  FROM candx c JOIN $verifySrc sa ON sa.doc_id = c.a_id
       |  JOIN $verifySrc sb ON sb.doc_id = c.b_id)
       |SELECT a_id, b_id, jaccard FROM verifiedx
       |WHERE jaccard >= 0.5 ORDER BY a_id, b_id""".stripMargin
  }

  /** [[minhashCtesSql]] + the `dedup_clusters` recursive-CTE
    * clustering tail over the verified LSH pairs — the full-corpus
    * composition, now cross-engine-replayed end to end. */
  private def clustersLshOracleSql: String =
    s"""WITH RECURSIVE $minhashCtesSql,
       |pairsx AS (SELECT a_id, b_id FROM verified WHERE jaccard >= 0.5),
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairsx
       |          UNION SELECT b_id, a_id FROM pairsx),
       |walk(id, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
       |comp AS (SELECT id AS doc_id, min(label) AS cluster_id
       |         FROM walk GROUP BY id)
       |SELECT c.doc_id, c.cluster_id,
       |  CAST(count(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
       |    AS cluster_size
       |FROM comp c ORDER BY doc_id""".stripMargin

  /** SCALED minhash-LSH oracle: sampled signature-chain replay
    * against `aux_minhash_buckets` + the full relational tail (see
    * [[winnowScaledSql]] for the mechanism). */
  private[ops] def minhashScaledSql(sample: String): String =
    s"""WITH ${minhashCtesSql(sample, spliceAux = true)}
       |SELECT a_id, b_id, jaccard FROM verified
       |WHERE jaccard >= 0.5 ORDER BY a_id, b_id""".stripMargin

  /** SCALED lshAppend oracle: sampled chain replay vs
    * `aux_minhash_buckets` + the full per-split relational tail. */
  private[ops] def lshAppendScaledSql(sample: String): String =
    lshAppendOracleSql(sample, spliceAux = true)

  /** SCALED simhash oracle: sampled FNV/vote-chain replay against
    * `aux_simhash` + the full block/verify tail. */
  private[ops] def simhashScaledSql(sample: String): String =
    simhashOracleSql(sample, spliceAux = true)

  /** SCALED clusters-LSH oracle: the scaled minhash CTEs + the same
    * recursive-CTE clustering tail as [[clustersLshOracleSql]]. */
  private[ops] def clustersLshScaledSql(sample: String): String =
    s"""WITH RECURSIVE ${minhashCtesSql(sample, spliceAux = true)},
       |pairsx AS (SELECT a_id, b_id FROM verified WHERE jaccard >= 0.5),
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairsx
       |          UNION SELECT b_id, a_id FROM pairsx),
       |walk(id, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
       |comp AS (SELECT id AS doc_id, min(label) AS cluster_id
       |         FROM walk GROUP BY id)
       |SELECT c.doc_id, c.cluster_id,
       |  CAST(count(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
       |    AS cluster_size
       |FROM comp c ORDER BY doc_id""".stripMargin

  /** Generated oracle for `dedup_semantic_lsh`: the [[SimilarityOps]]
    * SRP replay at the auto-tuned (bits, bands) — recorded when the
    * query ran; they are a pure function of the corpus cardinality,
    * so the splice is an engine-independent constant — with the
    * threshold-0.3 cosine verification and the `semanticOnPairs`
    * tail: recursive-CTE connected components over the verified
    * pairs, singletons keeping themselves, min-id labels, kept flag.
    * Empty until a session has run the query (the Verify protocol
    * runs every query before dumping `oracleSql`). */
  /** Unrolled min-label iterations for the clustering tail. The old
    * transitive-closure walk (`walk(id, label)` accumulating every
    * reachable label per node) is quadratic in CLUSTER size — at sf1
    * the 0.3-threshold similarity graph percolates into one
    * 20k-node component and the walk wanted ~4·10⁸ rows (r11: the
    * sweep burned 35+ min on it). The engine's own
    * [[connectedComponents]] is iterative min-label propagation, so
    * the oracle now replays THAT shape: per iteration each node takes
    * the min of its own label, its neighbors' labels, and its label's
    * label (the Shiloach–Vishkin hook + jump, O(log n) iterations —
    * 32 covers any fixture by orders of magnitude). Aggregation is
    * illegal in a DuckDB recursive CTE, so the iterations are
    * UNROLLED as plain chained CTEs; the convergence gate (last two
    * iterations must be identical) empties `comp` on shortfall,
    * collapsing every vector to a singleton — a loud hash break,
    * never a silent wrong answer. Cost: 2·|pairs| join rows per
    * iteration — linear, cluster-structure-independent. */
  private val SemCcIters = 32

  private val semanticLshTailAfterPairsSql: String = {
    val steps = (1 to SemCcIters).map { k =>
      s"""l$k AS MATERIALIZED (
         |  SELECT l.id, least(l.label,
         |      coalesce(nm.m, l.label), coalesce(pj.label, l.label))
         |    AS label
         |  FROM l${k - 1} l
         |  LEFT JOIN (SELECT e.src AS id, MIN(x.label) AS m
         |             FROM edges e JOIN l${k - 1} x ON x.id = e.dst
         |             GROUP BY e.src) nm ON nm.id = l.id
         |  LEFT JOIN l${k - 1} pj ON pj.id = l.label)""".stripMargin
    }.mkString(",\n")
    s"""edges AS MATERIALIZED (
       |  SELECT a_id AS src, b_id AS dst FROM pairsx
       |  UNION SELECT b_id, a_id FROM pairsx),
       |l0 AS MATERIALIZED (
       |  SELECT vec_id AS id, vec_id AS label FROM vecs),
       |$steps,
       |conv AS (SELECT COUNT(*) AS c FROM
       |  (SELECT id, label FROM l$SemCcIters
       |   EXCEPT SELECT id, label FROM l${SemCcIters - 1}) t),
       |comp AS (SELECT id, label AS cluster_id FROM l$SemCcIters
       |         WHERE (SELECT c FROM conv) = 0),
       |assigned AS (
       |  SELECT v.vec_id, COALESCE(c.cluster_id, v.vec_id) AS cluster_id
       |  FROM vecs v LEFT JOIN comp c ON c.id = v.vec_id),
       |sizes AS (SELECT cluster_id, COUNT(*) AS n
       |          FROM assigned GROUP BY cluster_id)
       |SELECT a.vec_id, a.cluster_id, CAST(s.n AS BIGINT) AS cluster_size,
       |  CAST(CASE WHEN a.vec_id = a.cluster_id THEN 1 ELSE 0 END
       |    AS BIGINT) AS kept
       |FROM assigned a JOIN sizes s USING (cluster_id)
       |ORDER BY vec_id""".stripMargin
  }

  private val semanticLshTailSql: String =
    s"""pairsx AS (
       |  SELECT c.a_id, c.b_id
       |  FROM cand c JOIN vecs a ON a.vec_id = c.a_id
       |  JOIN vecs b ON b.vec_id = c.b_id
       |  WHERE round(list_cosine_similarity(a.ve, b.ve), 6) >= 0.3),
       |$semanticLshTailAfterPairsSql""".stripMargin

  private def semanticLshGeneratedOracle: Map[String, String] =
    SimilarityOps.tunedSrpParams(0.3).map { case (bits, bands, seed) =>
      "dedup_semantic_lsh" ->
        s"""WITH RECURSIVE ${SimilarityOps.srpCtesSql(bits, bands, seed)},
           |$semanticLshTailSql""".stripMargin
    }.toMap

  /** SCALED `dedup_semantic_lsh` oracle. The tuned geometry's FULL
    * candidate join is itself oracle-prohibitive at sf1 (~10⁸ pairs
    * from ~800 auto-tuned bands — it exhausted DuckDB's spill disk),
    * so this one samples BOTH expensive stages against Spark dumps:
    *
    *  1. SRP codes: sampled accumulator replay vs `aux_srp_sem`
    *     (the standard scaled-chain gate);
    *  2. bucket→pair generation + cosine filter: for an md5-sampled
    *     ~3% of (band, bucket) groups, every derivable ≥-threshold
    *     pair must appear in the Spark-dumped verified pair set
    *     (`aux_sem_pairs`) — one-directional by design: aux extras
    *     from UNSAMPLED buckets are expected;
    *  3. truth of the dump: EVERY aux pair must re-pass the round-6
    *     cosine threshold (full check — pair-count-sized, cheap);
    *  4. the clustering tail replays in FULL from the gated pairs.
    *
    * Any violation of 1–3 empties `pairsx`, collapsing every vector
    * to a singleton cluster — a loud hash break. */
  private[ops] def semanticLshScaledOracle(sample: String): Map[String, String] =
    SimilarityOps.tunedSrpParams(0.3).map { case (bits, bands, seed) =>
      val bucketSample =
        "substr(md5(CAST(band AS VARCHAR) || '_' || " +
          "CAST(bucket AS VARCHAR)),1,2) < '08'"
      "dedup_semantic_lsh" ->
        s"""WITH RECURSIVE ${SimilarityOps.srpCtesSql(bits, bands, seed,
              sample, "aux_srp_sem", withCand = false)},
           |bsample AS MATERIALIZED (
           |  SELECT band, bucket FROM (
           |    SELECT DISTINCT band, bucket FROM auxb) t
           |  WHERE $bucketSample),
           |candchk AS MATERIALIZED (
           |  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
           |  FROM auxb x JOIN bsample s
           |    ON x.band = s.band AND x.bucket = s.bucket
           |  JOIN auxb y ON y.band = x.band AND y.bucket = x.bucket
           |    AND x.vec_id < y.vec_id),
           |pairchk AS MATERIALIZED (
           |  SELECT c.a_id, c.b_id FROM candchk c
           |  JOIN vecs a ON a.vec_id = c.a_id
           |  JOIN vecs b ON b.vec_id = c.b_id
           |  WHERE round(list_cosine_similarity(a.ve, b.ve), 6) >= 0.3),
           |auxp AS MATERIALIZED (SELECT a_id, b_id FROM aux_sem_pairs),
           |pmism AS MATERIALIZED (
           |  SELECT * FROM (SELECT a_id, b_id FROM pairchk
           |    EXCEPT SELECT a_id, b_id FROM auxp) t),
           |pbad AS MATERIALIZED (
           |  SELECT p.a_id FROM auxp p
           |  JOIN vecs a ON a.vec_id = p.a_id
           |  JOIN vecs b ON b.vec_id = p.b_id
           |  WHERE round(list_cosine_similarity(a.ve, b.ve), 6) < 0.3),
           |pairsx AS (
           |  SELECT a_id, b_id FROM auxp
           |  WHERE (SELECT COUNT(*) FROM mism) = 0
           |    AND (SELECT COUNT(*) FROM pmism) = 0
           |    AND (SELECT COUNT(*) FROM pbad) = 0),
           |${semanticLshTailAfterPairsSql}""".stripMargin
    }.toMap

  def oracles: Map[String, String] =
    staticOracles ++ semanticLshGeneratedOracle ++
      semanticAppendAutoGeneratedOracle

  /** Keys whose DuckDB SQL is GENERATED (auto-tuned SRP geometry
    * spliced from the session's exactly-one tuning) — provenance
    * marker for CatalogDump and the oracle-catalog audit. */
  private[graft] val generatedOracleKeys: Set[String] =
    Set("dedup_semantic_lsh", "dedup_semantic_append_auto")

  private val staticOracles: Map[String, String] = Map(
    "dedup_winnow" -> winnowOracleSql,
    "dedup_eval_pr" -> dedupEvalPrOracleSql,
    "dedup_lsh_append" -> lshAppendOracleSql("", spliceAux = false),
    "dedup_semantic_append" -> semanticAppendOracleSql,
    // same positional block grammar, same global first-wins rule,
    // same in-order reassembly (string_agg ORDER BY blk ≡ the sorted
    // transform join)
    "dedup_paragraph" ->
      s"""WITH base AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |blocks AS (
         |  SELECT doc_id, unnest([{'blk': i,
         |      'para': array_to_string(
         |        ws[i*$ParaWords+1 : i*$ParaWords+$ParaWords], ' ')}
         |    for i in range(0, (len(ws) - 1) // $ParaWords + 1)]) AS s
         |  FROM base),
         |b2 AS (SELECT doc_id, s.blk AS blk, s.para AS para FROM blocks),
         |ranked AS (SELECT doc_id, blk, para,
         |  row_number() OVER (PARTITION BY para ORDER BY doc_id, blk)
         |    AS rn FROM b2)
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_paras,
         |  CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped,
         |  COALESCE(string_agg(para, ' ' ORDER BY blk)
         |    FILTER (WHERE rn = 1), '') AS kept_text
         |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same stride-1 window grammar (1-based inclusive slice ≡ the
    // 0-based transform), same global first-wins rule, same
    // coverage-removal + in-order reassembly
    "dedup_substring_remove" ->
      s"""WITH toks AS MATERIALIZED (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |wins AS MATERIALIZED (
         |  SELECT doc_id, i - 1 AS pos,
         |    array_to_string(ws[i:i+${SubRemK - 1}], ' ') AS win
         |  FROM (SELECT doc_id, ws,
         |      unnest(range(1, len(ws) - $SubRemK + 2)) AS i
         |    FROM toks WHERE len(ws) >= $SubRemK)),
         |losers AS MATERIALIZED (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos, row_number() OVER (
         |      PARTITION BY win ORDER BY doc_id, pos) AS rn FROM wins) t
         |  WHERE rn > 1),
         |covered AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, pos + r.range AS ti
         |  FROM losers CROSS JOIN range(0, $SubRemK) r),
         |tokens AS MATERIALIZED (
         |  SELECT doc_id, i - 1 AS ti, ws[i] AS tok
         |  FROM (SELECT doc_id, ws,
         |      unnest(range(1, len(ws) + 1)) AS i FROM toks)),
         |flag AS (
         |  SELECT t.doc_id, t.ti, t.tok, c.ti IS NOT NULL AS cov
         |  FROM tokens t LEFT JOIN covered c
         |    ON c.doc_id = t.doc_id AND c.ti = t.ti)
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(COUNT(*) FILTER (WHERE cov) AS BIGINT) AS n_removed,
         |  COALESCE(string_agg(tok, ' ' ORDER BY ti)
         |    FILTER (WHERE NOT cov), '') AS kept_text
         |FROM flag GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // full replay of the ER composition: record synthesis from
    // customer, both blocking passes, fixed-point scoring, the shared
    // recursive-CTE min-label clustering, and survivorship
    "er_resolve" ->
      s"""WITH RECURSIVE $erRecsCtesSql,
         |vars AS MATERIALIZED (
         |  SELECT rec_id, unnest([name] ||
         |    [substr(name, 1, i - 1) || substr(name, i + 1, length(name))
         |     for i in range(1, length(name) + 1)]) AS v
         |  FROM recs),
         |cells AS MATERIALIZED (
         |  SELECT rec_id, lat10, lon10 FROM (
         |    SELECT rec_id, lat10, lon10, row_number() OVER
         |      (PARTITION BY lat10, lon10 ORDER BY rec_id) AS rk
         |    FROM recs) t WHERE rk <= $erMaxCell),
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT a_id, b_id FROM (
         |    SELECT a.rec_id AS a_id, b.rec_id AS b_id
         |    FROM vars a JOIN vars b ON a.v = b.v AND a.rec_id < b.rec_id
         |    UNION
         |    SELECT a.rec_id, b.rec_id
         |    FROM cells a JOIN cells b ON a.lat10 = b.lat10
         |      AND a.lon10 = b.lon10 AND a.rec_id < b.rec_id) u),
         |pairs AS MATERIALIZED (
         |  SELECT c.a_id, c.b_id
         |  FROM cand c JOIN recs a ON a.rec_id = c.a_id
         |    JOIN recs b ON b.rec_id = c.b_id
         |  WHERE (CASE WHEN levenshtein(a.name, b.name) <= 1
         |           THEN $ErWName ELSE $ErWNameMiss END)
         |      + (CASE WHEN a.city = b.city
         |           THEN $ErWCity ELSE $ErWCityMiss END)
         |      + (CASE WHEN a.lat10 = b.lat10 AND a.lon10 = b.lon10
         |           THEN $ErWGeo ELSE $ErWGeoMiss END) >= $ErThreshold),
         |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |          UNION SELECT b_id, a_id FROM pairs),
         |walk(id, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
         |comp AS (SELECT id AS rec_id, min(label) AS cluster_id
         |         FROM walk GROUP BY id)
         |SELECT comp.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  r.name AS canonical_name
         |FROM comp JOIN recs r ON r.rec_id = comp.cluster_id
         |GROUP BY comp.cluster_id, r.name
         |ORDER BY cluster_id""".stripMargin,
    // the identical pipeline — same shingle grammar, same df cutoff
    // (part of the graded semantics), same integer threshold test
    "dedup_containment" ->
      s"""WITH shx AS (
         |  SELECT doc_id, unnest(${shinglesSql.format("text", "text")}) AS s
         |  FROM documents),
         |rare AS (SELECT s FROM shx GROUP BY s
         |         HAVING COUNT(*) <= $ContainMaxDf),
         |kept AS (SELECT shx.doc_id, shx.s FROM shx JOIN rare USING (s)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
         |ix AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id AS contained_id, b_id AS container_id,
         |  inter, sa.n AS n_a, sb.n AS n_b
         |FROM ix JOIN sizes sa ON sa.doc_id = a_id
         |JOIN sizes sb ON sb.doc_id = b_id
         |WHERE inter * 10 >= sa.n * 9
         |  AND (sa.n < sb.n OR (sa.n = sb.n AND a_id < b_id))
         |ORDER BY contained_id, container_id""".stripMargin,
    "dedup_simhash" -> simhashOracleSql,
    "dedup_minhash_lsh" -> minhashOracleSql,
    "dedup_clusters_lsh" -> clustersLshOracleSql,
    "corpus_diff" ->
      // same snapshot simulation: A = %10<8, B = %10>=1 with %5==1 revised
      """WITH a AS (SELECT doc_id, source AS source_a,
        |    md5(lower(trim(text))) AS fp_a
        |  FROM documents WHERE doc_id % 10 < 8),
        |b AS (SELECT doc_id, source AS source_b,
        |    md5(lower(trim(CASE WHEN doc_id % 5 = 1
        |      THEN text || ' rev2' ELSE text END))) AS fp_b
        |  FROM documents WHERE doc_id % 10 >= 1),
        |j AS (SELECT COALESCE(a.source_a, b.source_b) AS source,
        |  CASE WHEN a.fp_a IS NULL THEN 'added'
        |       WHEN b.fp_b IS NULL THEN 'removed'
        |       WHEN a.fp_a <> b.fp_b THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT source, status, COUNT(*) AS n_docs
        |FROM j GROUP BY source, status ORDER BY source, status""".stripMargin,
    "text_substring_dedup" ->
      // same 50-token stride-25 windows; coverage = distinct positions
      """WITH toks AS (SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |t50 AS (SELECT * FROM toks WHERE len(t) >= 50),
        |st AS (SELECT doc_id, source, t,
        |    unnest(range(1, len(t) - 49 + 1, 25)) AS i FROM t50),
        |wins AS (SELECT doc_id, source, i AS start,
        |    md5(array_to_string(t[i:i+49], ' ')) AS wh FROM st),
        |dup AS (SELECT wh FROM wins GROUP BY wh HAVING COUNT(*) > 1),
        |pos AS (SELECT w.doc_id, w.source, w.start,
        |    unnest(range(w.start, w.start + 50)) AS pos
        |  FROM wins w JOIN dup USING (wh)),
        |perdoc AS (SELECT doc_id, source,
        |    COUNT(DISTINCT pos) AS tokens_flagged,
        |    SUM(CASE WHEN pos = start THEN 1 ELSE 0 END) AS n_spans
        |  FROM pos GROUP BY doc_id, source)
        |SELECT source, COUNT(*) AS n_docs_affected,
        |  CAST(SUM(n_spans) AS BIGINT) AS n_spans,
        |  CAST(SUM(tokens_flagged) AS BIGINT) AS tokens_flagged
        |FROM perdoc GROUP BY source ORDER BY source""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY sha256(lower(trim(text)))
        |ORDER BY keep_id""".stripMargin,
    // the same five per-family aggregates: sha-256 groups, the
    // layout_inverted posting projection, the ParaWords block
    // grammar with the integer-encoded (doc_id, blk) argmin
    // from-scratch survivor rebuild — knows nothing of the frozen
    // artifacts; hash equality proves incremental purge ≡ rebuild
    "corpus_forget_apply" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $ForgetCopyOff, text FROM documents
         |  WHERE doc_id % 5 = 0),
         |posts AS (
         |  SELECT doc_id % 4 = 0 AS d FROM (
         |    SELECT doc_id, unnest(list_distinct(
         |      list_filter(string_split(text, ' '), x -> x <> '')))
         |    FROM corpus) t),
         |s1 AS (
         |  SELECT '10_postings' AS stage, '' AS key,
         |    CAST(COUNT(*) AS BIGINT) AS old_id,
         |    CAST(COUNT(*) FILTER (WHERE NOT d) AS BIGINT) AS new_id
         |  FROM posts),
         |grp AS (
         |  SELECT sha256(lower(trim(text))) AS h, MIN(doc_id) AS fa,
         |    MIN(doc_id) FILTER (WHERE doc_id % 4 <> 0) AS fs
         |  FROM corpus GROUP BY 1),
         |s2 AS (
         |  SELECT '20_exact_clusters' AS stage, '' AS key,
         |    CAST(COUNT(*) AS BIGINT) AS old_id,
         |    CAST(COUNT(*) FILTER (WHERE fs IS NOT NULL) AS BIGINT)
         |      AS new_id
         |  FROM grp),
         |s3 AS (
         |  SELECT '30_exact_rewired' AS stage, h AS key,
         |    fa AS old_id, fs AS new_id
         |  FROM grp WHERE fs IS NOT NULL AND fs <> fa),
         |base AS (
         |  SELECT doc_id, doc_id % 4 = 0 AS d,
         |    string_split(text, ' ') AS ws FROM corpus),
         |blocks AS (
         |  SELECT s.para AS para, d,
         |    doc_id * $ForgetBlkBase + s.blk AS key
         |  FROM (SELECT doc_id, d, unnest([{'blk': i,
         |      'para': array_to_string(
         |        ws[i*$ParaWords+1 : i*$ParaWords+$ParaWords], ' ')}
         |    for i in range(0, (len(ws) - 1) // $ParaWords + 1)]) AS s
         |  FROM base)),
         |pgrp AS (
         |  SELECT md5(para) AS pk, MIN(key) AS fa,
         |    MIN(key) FILTER (WHERE NOT d) AS fs
         |  FROM blocks GROUP BY 1),
         |s4 AS (
         |  SELECT '40_para_clusters' AS stage, '' AS key,
         |    CAST(COUNT(*) AS BIGINT) AS old_id,
         |    CAST(COUNT(*) FILTER (WHERE fs IS NOT NULL) AS BIGINT)
         |      AS new_id
         |  FROM pgrp),
         |s5 AS (
         |  SELECT '50_para_rewired' AS stage, pk AS key,
         |    fa AS old_id, fs AS new_id
         |  FROM pgrp WHERE fs IS NOT NULL AND fs <> fa)
         |SELECT * FROM s1 UNION ALL SELECT * FROM s2
         |UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
         |UNION ALL SELECT * FROM s5 ORDER BY stage, key""".stripMargin,
    "corpus_forget_report" ->
      s"""WITH s1 AS (
         |  SELECT '10_docs' AS stage,
         |    CAST(COUNT(*) AS BIGINT) AS n_before,
         |    CAST(COUNT(*) FILTER (WHERE doc_id % 10 = 3) AS BIGINT)
         |      AS n_purged,
         |    CAST(0 AS BIGINT) AS n_rewired
         |  FROM documents),
         |toks AS (
         |  SELECT doc_id % 10 = 3 AS d,
         |    len(list_filter(string_split(text, ' '), x -> x <> ''))
         |      AS nt
         |  FROM documents),
         |s2 AS (
         |  SELECT '11_tokens' AS stage,
         |    CAST(SUM(nt) AS BIGINT) AS n_before,
         |    CAST(COALESCE(SUM(nt) FILTER (WHERE d), 0) AS BIGINT)
         |      AS n_purged,
         |    CAST(0 AS BIGINT) AS n_rewired
         |  FROM toks),
         |posts AS (
         |  SELECT doc_id % 10 = 3 AS d,
         |    unnest(list_distinct(
         |      list_filter(string_split(text, ' '), x -> x <> '')))
         |      AS term
         |  FROM documents),
         |s3 AS (
         |  SELECT '20_postings' AS stage,
         |    CAST(COUNT(*) AS BIGINT) AS n_before,
         |    CAST(COUNT(*) FILTER (WHERE d) AS BIGINT) AS n_purged,
         |    CAST(0 AS BIGINT) AS n_rewired
         |  FROM posts),
         |grp AS (
         |  SELECT MIN(doc_id) AS first_all,
         |    MIN(doc_id) FILTER (WHERE doc_id % 10 <> 3) AS first_surv
         |  FROM documents GROUP BY sha256(lower(trim(text)))),
         |s4 AS (
         |  SELECT '30_exact_clusters' AS stage,
         |    CAST(COUNT(*) AS BIGINT) AS n_before,
         |    CAST(COUNT(*) FILTER (WHERE first_surv IS NULL) AS BIGINT)
         |      AS n_purged,
         |    CAST(COUNT(*) FILTER (WHERE first_surv IS NOT NULL
         |      AND first_surv <> first_all) AS BIGINT) AS n_rewired
         |  FROM grp),
         |base AS (
         |  SELECT doc_id, doc_id % 10 = 3 AS d,
         |    string_split(text, ' ') AS ws FROM documents),
         |blocks AS (
         |  SELECT doc_id, d, s.blk AS blk, s.para AS para,
         |    doc_id * $ForgetBlkBase + s.blk AS key
         |  FROM (SELECT doc_id, d, unnest([{'blk': i,
         |      'para': array_to_string(
         |        ws[i*$ParaWords+1 : i*$ParaWords+$ParaWords], ' ')}
         |    for i in range(0, (len(ws) - 1) // $ParaWords + 1)]) AS s
         |  FROM base)),
         |pgrp AS (
         |  SELECT MIN(key) AS first_all,
         |    MIN(key) FILTER (WHERE NOT d) AS first_surv
         |  FROM blocks GROUP BY para),
         |s5 AS (
         |  SELECT '40_paragraphs' AS stage,
         |    CAST(COUNT(*) AS BIGINT) AS n_before,
         |    CAST(COUNT(*) FILTER (WHERE first_surv IS NULL) AS BIGINT)
         |      AS n_purged,
         |    CAST(COUNT(*) FILTER (WHERE first_surv IS NOT NULL
         |      AND first_surv <> first_all) AS BIGINT) AS n_rewired
         |  FROM pgrp)
         |SELECT * FROM s1 UNION ALL SELECT * FROM s2
         |UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
         |UNION ALL SELECT * FROM s5 ORDER BY stage""".stripMargin,
    "dedup_first_wins" ->
      """SELECT user_id, event_type, event_id,
        |  CAST(n_total - 1 AS BIGINT) AS n_dropped FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_total
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "dedup_jaccard_neardup" ->
      s"""WITH t AS (SELECT doc_id,
         |  ${shinglesSql.format("text", "text")} AS sh
         |  FROM documents WHERE doc_id < 200)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
         |    AS jaccard
         |FROM t a JOIN t b ON a.doc_id < b.doc_id
         |WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
         |    >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,
    "fuzzy_join_edit1" ->
      """WITH w AS (SELECT DISTINCT c_name AS w FROM customer
        |  WHERE c_custkey < 1000)
        |SELECT a.w AS word_a, b.w AS word_b,
        |  CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
        |FROM w a JOIN w b ON a.w < b.w
        |WHERE levenshtein(a.w, b.w) <= 1
        |ORDER BY word_a, word_b""".stripMargin,
    // the prefix filter is exact, so its oracle is the SAME all-pairs
    // statement on its slice — completeness of the candidate stage is
    // graded, not assumed
    "dedup_jaccard_prefix" ->
      s"""WITH t AS (SELECT doc_id,
         |  ${shinglesSql.format("text", "text")} AS sh
         |  FROM documents WHERE doc_id < 300)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
         |    AS jaccard
         |FROM t a JOIN t b ON a.doc_id < b.doc_id
         |WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
         |    >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,
    // same cluster CTE as dedup_clusters, then the quality argmax:
    // keep the best-scoring member (score desc, doc_id tie-break)
    "dedup_canonical_quality" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM (SELECT doc_id, ${shinglesSql.format("text", "text")} AS sh
         |        FROM documents WHERE doc_id < 200) a
         |  JOIN (SELECT doc_id, ${shinglesSql.format("text", "text")} AS sh
         |        FROM documents WHERE doc_id < 200) b
         |    ON a.doc_id < b.doc_id
         |  WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
         |    >= 0.5),
         |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |          UNION SELECT b_id, a_id FROM pairs),
         |walk(id, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
         |comp AS (SELECT id AS doc_id, min(label) AS cluster_id
         |         FROM walk GROUP BY id),
         |scored AS (SELECT c.cluster_id, d.doc_id,
         |    least(CAST(len(string_split(d.text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.6
         |  + least(CAST(len(regexp_extract_all(d.text, '\\b(the)\\b')) AS DOUBLE) / 10.0, 1.0) * 0.4
         |    AS score
         |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
         |r AS (SELECT cluster_id, doc_id, score, row_number() OVER (
         |  PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rn
         |  FROM scored)
         |SELECT cluster_id,
         |  MIN(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
         |  CAST(COUNT(*) AS BIGINT) AS cluster_size,
         |  round(MAX(CASE WHEN rn = 1 THEN score END), 6) AS keep_score
         |FROM r GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    // same near-dup pair graph, clustered by a recursive CTE: walk
    // labels along (symmetric) edges, min reachable id = cluster id
    "dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM (SELECT doc_id, ${shinglesSql.format("text", "text")} AS sh
         |        FROM documents WHERE doc_id < 200) a
         |  JOIN (SELECT doc_id, ${shinglesSql.format("text", "text")} AS sh
         |        FROM documents WHERE doc_id < 200) b
         |    ON a.doc_id < b.doc_id
         |  WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
         |    >= 0.5),
         |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |          UNION SELECT b_id, a_id FROM pairs),
         |walk(id, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
         |comp AS (SELECT id AS doc_id, min(label) AS cluster_id
         |         FROM walk GROUP BY id)
         |SELECT c.doc_id, c.cluster_id,
         |  CAST(count(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
         |    AS cluster_size
         |FROM comp c ORDER BY doc_id""".stripMargin,
    "dedup_bloom_incremental" ->
      // LEFT JOIN + IS NULL, not NOT IN: a NULL fingerprint anywhere
      // in the snapshot would make NOT IN return zero rows, while
      // Spark's left_anti keeps non-matching rows (same reason the
      // dedup_incremental oracle uses LEFT JOIN)
      """WITH existing AS (
        |  SELECT DISTINCT md5(lower(trim(text))) AS fp
        |  FROM documents WHERE doc_id % 10 < 8),
        |batch AS (
        |  SELECT doc_id, md5(lower(trim(text))) AS fp
        |  FROM documents WHERE doc_id % 10 >= 8)
        |SELECT b.doc_id, b.fp
        |FROM batch b LEFT JOIN existing e ON e.fp = b.fp
        |WHERE e.fp IS NULL
        |ORDER BY b.doc_id""".stripMargin,
    "split_leakage_safe" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM (SELECT doc_id, ${shinglesSql.format("text", "text")} AS sh
         |        FROM documents WHERE doc_id < 200) a
         |  JOIN (SELECT doc_id, ${shinglesSql.format("text", "text")} AS sh
         |        FROM documents WHERE doc_id < 200) b
         |    ON a.doc_id < b.doc_id
         |  WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
         |    >= 0.5),
         |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |          UNION SELECT b_id, a_id FROM pairs),
         |walk(id, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
         |comp AS (SELECT id AS doc_id, min(label) AS cluster_id
         |         FROM walk GROUP BY id),
         |lab AS (
         |  SELECT d.doc_id,
         |    COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         |    CASE WHEN substring(md5(CAST(COALESCE(c.cluster_id, d.doc_id)
         |        AS VARCHAR)), 1, 2) < 'cd'
         |      THEN 'train' ELSE 'eval' END AS split
         |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
         |strad AS (
         |  SELECT CAST(SUM(CASE WHEN nsp > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_straddling
         |  FROM (SELECT cluster_id, COUNT(DISTINCT split) AS nsp
         |        FROM lab GROUP BY cluster_id) t)
         |SELECT l.split, COUNT(*) AS n_docs,
         |  CAST(COUNT(DISTINCT l.cluster_id) AS BIGINT) AS n_clusters,
         |  s.n_straddling
         |FROM lab l CROSS JOIN strad s
         |GROUP BY l.split, s.n_straddling
         |ORDER BY l.split""".stripMargin,
    "dedup_incremental" ->
      """WITH existing AS (
        |  SELECT DISTINCT md5(lower(trim(text))) AS fp
        |  FROM documents WHERE doc_id % 10 < 8),
        |batch AS (
        |  SELECT doc_id, source, md5(lower(trim(text))) AS fp,
        |    row_number() OVER (PARTITION BY md5(lower(trim(text)))
        |      ORDER BY doc_id) AS rn
        |  FROM documents WHERE doc_id % 10 >= 8)
        |SELECT b.source,
        |  CASE WHEN b.rn > 1 THEN 'dropped_in_batch'
        |       WHEN e.fp IS NOT NULL THEN 'dropped_published'
        |       ELSE 'new' END AS stage,
        |  COUNT(*) AS n_docs
        |FROM batch b LEFT JOIN existing e ON e.fp = b.fp
        |GROUP BY 1, 2 ORDER BY source, stage""".stripMargin,
    // same recursive-CTE clustering as dedup_clusters, but the edge
    // list is the exact cosine pair slice from sim_threshold_join
    "dedup_semantic" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE a.vec_id < 300 AND b.vec_id < 300
        |    AND round(list_cosine_similarity(
        |      CAST(a.embedding AS DOUBLE[]),
        |      CAST(b.embedding AS DOUBLE[])), 6) >= 0.3),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |walk(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
        |comp AS (SELECT id, min(label) AS cluster_id FROM walk GROUP BY id),
        |assigned AS (
        |  SELECT e.vec_id, COALESCE(c.cluster_id, e.vec_id) AS cluster_id
        |  FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
        |  WHERE e.vec_id < 300)
        |SELECT a.vec_id, a.cluster_id,
        |  CAST(count(*) OVER (PARTITION BY a.cluster_id) AS BIGINT)
        |    AS cluster_size,
        |  CAST(a.vec_id = a.cluster_id AS BIGINT) AS kept
        |FROM assigned a ORDER BY a.vec_id""".stripMargin,
    "text_contamination" ->
      s"""WITH probes AS (
         |  SELECT DISTINCT unnest(${shinglesSql.format("text", "text")}) AS sh
         |  FROM documents WHERE doc_id % 97 = 0),
         |corpus AS (
         |  SELECT doc_id, source, ${shinglesSql.format("text", "text")} AS shs
         |  FROM documents WHERE doc_id % 97 <> 0),
         |hits AS (
         |  SELECT DISTINCT c.doc_id
         |  FROM (SELECT doc_id, unnest(shs) AS sh FROM corpus) c
         |  JOIN probes USING (sh))
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_contaminated,
         |  CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS contaminated_frac
         |FROM corpus LEFT JOIN hits h USING (doc_id)
         |GROUP BY source ORDER BY source""".stripMargin,
  )
}
