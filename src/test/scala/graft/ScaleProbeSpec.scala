package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empirical scaling probe (VERDICT r4 #7, upgraded to sf1 per
  * VERDICT r9 #1): SCALE.md argues 100× viability by plan shape; this
  * spec MEASURES a real 10× step. The heavy-hitter queries run at
  * sf0.1 (600k lineitem) and sf1 (6M lineitem, derived by
  * [[ScaleDataGen]]'s key-shifted replication — per-copy
  * distributions preserved exactly, so linear-with-constants plans
  * must scale ~10×) and must grow wall-time ≤ 15× — near-linear with
  * generous noise headroom, but far below the ~100× a quadratic
  * stage would show. A future edit that accidentally reintroduces an
  * all-pairs stage fails this spec loudly instead of surviving as a
  * "looks fine at toy scale" plan.
  *
  * Method: min of 2 runs per point (co-tenant noise is additive, min
  * is the robust estimator; run 1 at sf1 also pays any cold artifact
  * builds, which the min excludes — the serve path is the production
  * read path), sf0.1 times floored at 0.4 s so fixed JVM/scheduler/
  * micro-batch overhead — which does NOT scale with data — can't
  * manufacture a big ratio from a tiny denominator.
  *
  * This spec is NOT env-gated (VERDICT r9 #1): it runs in the default
  * suite. Cost control: sf1 is built once and served from
  * `ScaleDataGen.defaultDir` (cold build ~70 s, then free), and each
  * query runs 2+2 times. The measured table lives in SCALE.md §"sf1
  * scaling probe". */
class ScaleProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val targets = Seq(
    "dedup_clusters_lsh", "dedup_semantic_lsh", "dedup_winnow",
    // round-5 additions: the new corpus-pass-heavy operators
    "corpus_overlap", "text_substring_dedup", "text_tfidf_topk",
    "sim_pq_topk",
    // round-6 (VERDICT r5 #7): the rest of the bench top-10 —
    // including the flagship E2E pipeline, the composed quantized IVF
    // read (plus its partition-pruned layout twin), the bounded exact
    // oracle twin (bounded by construction, so its ratio should read
    // ~flat), and one streaming query (micro-batch machinery
    // dominates at these SFs; the probe proves the cost is fixed
    // overhead, not data growth)
    "sim_ivf_quantized", "sim_ivf_pruned_layout", "etl_load_report",
    "dedup_semantic", "corpus_clean", "stream_sessionize",
    // round-7: the corpus-linear newcomers (CDC rank-merge over the
    // full order stream + base; OHLC over all events; the one-scan
    // profiler with its countDistinct Expand; monthly→quarterly HLL
    // re-aggregation) and the streaming CDC twin (fixed micro-batch
    // overhead must dominate, not data growth). The bounded-slice
    // newcomers (prefix/fuzzy joins, gapfill, BPE) are flat by
    // construction and served/bounded — not probed.
    "cdc_read_mor", "events_resample_ohlc", "profile_table",
    "agg_hll_union", "stream_cdc_upsert",
    // round-10: the r9 driver-tail members not already covered —
    // full-corpus Manku block bucketing and the DPP build+probe —
    // plus the corpus-linear r10 newcomer (bounded query side × full
    // embedding scan; the bounded-slice newcomers er_resolve and the
    // unigram trainer are flat by construction and not probed)
    "dedup_simhash", "scan_dpp_prune", "mm_crossmodal_topk",
    // round-11: the corpus-heavy newcomers — the NSW beam search
    // (bench's heaviest serve path; graph build is artifact-logged
    // separately) and paragraph dedup's two linear shuffles on the
    // serve/build split (artifact-served, so the probed path is the
    // read; the bounded report queries — recall sweep, PSI, the
    // maintenance reconciliations — are flat by construction and not
    // probed)
    "sim_nsw_topk", "dedup_paragraph",
    // round-13: the corpus-heavy newcomers — the LM-chain composition
    // (perplexity tertiles: score + bucketed rank), the full-corpus
    // exact CDF sweep (KS), the five-artifact purge execution, and
    // the SRP batch-signing ingest gate; the bounded-by-construction
    // newcomers (MMR's k²-bounded re-rank, scene cuts' per-video
    // windows, nearest-asof's one sorted frame, DBSCAN's
    // density-thresholded CC) are flat by design and not probed
    "corpus_ppl_buckets", "stat_ks_test", "corpus_forget_apply",
    "dedup_semantic_append",
    // round-14: the production-geometry ingest gate (auto-tuned SRP at
    // threshold 0.8 — candidate mass and signing both scale ~n^1.33,
    // and this entry is the measured proof the tuned exponent sits
    // far below the fixed-geometry 0.4 gate's ~7×/step; VERDICT r13
    // #4), plus text_lm_score now that it serves the shared
    // lm_scored_docs artifact (the probed path is the read)
    "dedup_semantic_append_auto", "text_lm_score",
    // the offline ranking-eval job: two linear corpus passes + 6
    // bounded-query window ranks + the phrase-judgment text join
    "search_eval_prk",
    // round-15: the side-by-side ranker eval (adds one embedding
    // equi-join + a third rank window to the prk shape) and the media
    // ingest gate (cap-bounded band join over the frozen dHash
    // families; the probed path is the batch probe against the warm
    // artifact)
    "search_eval_hybrid", "mm_phash_append",
    // round-15 continuation: the dedup-quality eval (TWO full exact
    // corpus passes — prefix-filter truth + banding — plus the
    // pool-bounded estimate tail) and the incremental index gate
    // (batch-only tokenize against the frozen df/header artifacts;
    // the probed path is the batch serve). mm_video_neardup is not
    // probed: per-video hash sets are medium-bounded and the pair
    // join is cap-bounded — flat by construction, the scene-cuts
    // class
    "dedup_eval_pr", "search_index_append",
    // the audio ingest gate (cap-bounded band join over the frozen
    // fingerprint families — the mm_phash_append class; batch-side
    // RIFF parse is the only decode)
    "mm_audio_append")
  private val maxRatio = 15.0
  private val smallFloorSec = 0.4

  /** Entries whose super-linear step is PRICED, not accidental, and
    * whose sf0.1 denominator sits so low that hot-JVM variance alone
    * swings the ratio across 15× (r14: dedup_semantic_append read
    * 0.61–1.3 s at sf0.1 against a stable ~9 s at sf1 — 7× to 15.5×
    * from denominator noise). For these the ratio bound is relaxed to
    * the floor-implied ceiling and the REAL regression guard is an
    * absolute sf1 wall ceiling on the stable numerator: the 0.4-demo
    * gate's candidate mass is the documented textbook n^1.66
    * (SCALE.md r13), steady ~9 s at sf1 — if sf1 breaches the
    * ceiling, the ordering/caps regressed beyond the priced exponent
    * (the r13 distinct-before-verify bug read 18.3 s and would trip
    * it). The production-geometry twin (dedup_semantic_append_auto,
    * ρ ≈ 0.33) stays under the standard 15× gate — flat, measured
    * 0.7× in r14.
    *
    * The sf1 wall ceiling is MACHINE-RELATIVE (ADVICE r14): the raw
    * 15 s constant would trip on a slower/contended runner without a
    * regression and let one pass on a faster box. It scales by the
    * MEDIAN of the same run's measured walls for [[calibrationRefs]]
    * — stable bounded-by-construction queries — over their recorded
    * reference walls, clamped to [0.5, 4] so a degenerate calibration
    * reading can neither nullify nor quadruple the gate. A median of
    * three (not one query, as originally) survives optimizing any ONE
    * of them: the r15 dedup_semantic union-find rewrite dropped the
    * single calibration query's sf1 wall 2.26 → 0.4 s, clamped the
    * factor to 0.5 and deterministically tripped this gate on an
    * UNCHANGED dedup_semantic_append — a calibration failure, not a
    * regression. If one of the three is deliberately optimized,
    * re-pin its reference in the same commit; the median holds the
    * gate honest in the meantime. */
  private val pricedExponentCaps: Map[String, (Double, Double)] = Map(
    "dedup_semantic_append" -> ((25.0, 15.0)) // (maxRatio, sf1 wall s)
  )
  // sf1 reference walls from the r11 probe table (SCALE.md), all three
  // reproduced within noise in every later round's full probe: flat
  // single-pass or cap-bounded serve shapes with multi-second walls.
  private val calibrationRefs: Map[String, Double] = Map(
    "dedup_winnow" -> 1.72,
    "sim_ivf_quantized" -> 1.74,
    "sim_pq_topk" -> 0.93)

  private def time(name: String, sfDir: String, reps: Int): Double = {
    val fn = SparkEntry.queries(name)
    (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  test("heavy hitters scale near-linearly from sf0.1 to sf1") {
    val sf1 = ScaleDataGen.ensure(spark)
    // warm JIT/codegen/streams on the smallest SF first
    targets.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    val rows = targets.map { n =>
      val small = time(n, "/root/testdata/sf0.1", 2)
      val big = time(n, sf1, 2)
      val ratio = big / math.max(small, smallFloorSec)
      val exponent = math.log(math.max(ratio, 1.0)) / math.log(10.0)
      info(f"$n%-22s sf0.1=$small%6.2f s  sf1=$big%6.2f s  " +
        f"ratio=$ratio%5.1f×  exponent≈$exponent%.2f")
      (n, small, big, ratio)
    }
    val calibRatios = rows.collect {
      case (n, _, big, _) if calibrationRefs.contains(n) =>
        big / calibrationRefs(n)
    }.sorted
    val calib =
      if (calibRatios.isEmpty) 1.0
      else math.min(math.max(calibRatios(calibRatios.size / 2), 0.5), 4.0)
    info(f"machine calibration factor: $calib%.2f (median over " +
      s"${calibrationRefs.keys.toSeq.sorted.mkString(", ")})")
    rows.foreach { case (n, _, big, ratio) =>
      pricedExponentCaps.get(n) match {
        case Some((capRatio, capWall)) =>
          assert(ratio <= capRatio && big <= capWall * calib,
            s"$n: sf1=$big s, ratio ${ratio}× — beyond the PRICED " +
              s"exponent (SCALE.md; wall ceiling $capWall×$calib " +
              "machine-calibrated) — the ordering/caps regressed")
        case None =>
          assert(ratio <= maxRatio,
            s"$n grew ${ratio}× for 10× data — a super-linear stage crept in")
      }
    }
  }

  test("auto gate candidate MASS stays inside the priced n^1.4 envelope") {
    // VERDICT r14 #5: the n^1.33 exponent was measured by hand in
    // r14 (64,258 → 1,373,937 distinct cross-split candidates for the
    // sf0.1 → sf1 step = 21.4×); this encodes it — an srpAutoParams
    // sizing-rule regression now fails a MASS gate (deterministic,
    // no wall-clock noise) instead of silently fattening the verify
    // join. Bound 25× ≈ n^1.4 for the 10× step.
    val sf1 = ScaleDataGen.ensure(spark)
    val m01 = ops.DedupOps.semanticAutoCandidateMass(
      spark, "/root/testdata/sf0.1")
    val m1 = ops.DedupOps.semanticAutoCandidateMass(spark, sf1)
    val ratio = m1.toDouble / m01
    info(f"candidate mass sf0.1=$m01 sf1=$m1 ratio=$ratio%.1f×")
    assert(m01 > 0, "sf0.1 candidate mass is zero — the gate is vacuous")
    assert(ratio <= 25.0,
      f"auto-gate candidate mass grew $ratio%.1f× for 10× data — " +
        "the tuned-geometry sizing rule regressed past its priced " +
        "n^1.4 envelope (SCALE.md)")
  }
}
