package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SCALED oracles for the sf1 sweep (VERDICT r10 #3).
  *
  * Seven catalog queries replay per-byte / per-shingle hash chains in
  * the DuckDB oracle (minhash / simhash / winnow / SRP families);
  * full replay at 10× data is oracle-cost-prohibitive (one LSH replay
  * burned > 20 CPU-minutes at sf1 — DuckDB cost, not engine cost).
  * These scaled forms keep the result HASH-verified at sf1 by
  * splitting the verification:
  *
  *  - the scalar hash chain replays over a DETERMINISTIC md5-prefix
  *    sample of ids (~3%) and is compared against the Spark-dumped
  *    signature table (`.aux/aux_*.parquet`, written by
  *    [[graft.Verify]] under `SPARK_GRAFT_SCALED_ORACLES=1`) with a
  *    zero-symmetric-difference gate — any sampled divergence empties
  *    the final result, failing the row-count compare loudly;
  *  - the ENTIRE downstream relational pipeline (banding, bucket
  *    caps, candidate joins, exact verification, clustering) replays
  *    in full from the dumped signatures.
  *
  * So the relational logic is end-to-end verified at sf1 and the
  * scalar chains are statistically verified there; full chain replay
  * remains the gate at sf ≤ 0.1 (the driver's `oracle_sql.json` is
  * untouched — these live in `oracle_sql_scaled.json`, consumed only
  * by `verify_local.py --scaled`). The sample predicates are
  * DuckDB-side only (both arms of the symmetric difference are
  * DuckDB-computed), so no cross-engine md5 agreement is needed. */
object ScaledOracles {

  /** ~3.1% deterministic sample (md5 prefix < 0x08 of 0x100). */
  private val DocSample =
    "substr(md5(CAST(doc_id AS VARCHAR)),1,2) < '08'"
  private val VecSample =
    "substr(md5(CAST(vec_id AS VARCHAR)),1,2) < '08'"

  /** Aux signature frames to dump next to the scaled SQL. Each is the
    * SAME projection the engine's query path computes (shared
    * function, so dump and query cannot drift). Keys are the view
    * names the scaled SQL references. */
  def aux: Map[String, (SparkSession, String) => DataFrame] = {
    val base = Map[String, (SparkSession, String) => DataFrame](
      "aux_winnow_fps" -> ((s, d) =>
        DedupOps.winnowFingerprints(Tables.documents(s, d))),
      "aux_minhash_buckets" -> ((s, d) =>
        DedupOps.bandBuckets(fanOut(Tables.documents(s, d)))),
      "aux_minhash_sigs" -> ((s, d) =>
        DedupOps.minhashSigRows(fanOut(Tables.documents(s, d)))),
      "aux_simhash" -> ((s, d) =>
        DedupOps.simhashSketches(Tables.documents(s, d))),
      "aux_srp_t04" -> ((s, d) =>
        SimilarityOps.srpBandsFrame(Tables.embeddings(s, d), 8, 64, 42L)),
      "aux_nsw_edges" -> ((s, d) =>
        SimilarityOps.nswBuild(Tables.embeddings(s, d))),
      // the frozen snapshot graph nswAppend inserts into
      "aux_nsw_snap_edges" -> ((s, d) =>
        SimilarityOps.nswBuild(Tables.embeddings(s, d)
          .filter(org.apache.spark.sql.functions.col("vec_id") % 10 < 8))),
      // the compacted (survivor-only) graph nswCompact rebuilds
      "aux_nsw_compact_edges" -> ((s, d) =>
        SimilarityOps.nswBuild(Tables.embeddings(s, d)
          .filter(org.apache.spark.sql.functions.col("vec_id") % 10 =!= 3))))
    // tuned geometry exists only after the session ran semanticLsh —
    // the generated-oracle protocol (Verify runs queries first)
    val sem = SimilarityOps.tunedSrpParams(0.3).toSeq.flatMap {
      case (bits, bands, seed) => Seq(
        "aux_srp_sem" -> ((s: SparkSession, d: String) =>
          SimilarityOps.srpBandsFrame(Tables.embeddings(s, d),
            bits, bands, seed)),
        // the verified pair set (the tuned bucket join's full output
        // is itself oracle-prohibitive at sf1 — see the scaled
        // semantic oracle's 4-stage split)
        "aux_sem_pairs" -> ((s: SparkSession, d: String) =>
          DedupOps.semanticLshPairs(Tables.embeddings(s, d))))
    }
    // the production-geometry ingest gate's banding frame (tuned at
    // the 0.8 threshold — recorded when the session ran the query)
    val semAuto = SimilarityOps.tunedSrpParams(DedupOps.SemAutoThreshold)
      .toSeq.map { case (bits, bands, seed) =>
        "aux_srp_auto" -> ((s: SparkSession, d: String) =>
          SimilarityOps.srpBandsFrame(Tables.embeddings(s, d),
            bits, bands, seed))
      }
    base ++ sem ++ semAuto
  }

  /** Scaled SQL per query; same output schema and (on a healthy
    * engine) same result as the full-replay oracle. */
  def oracles: Map[String, String] = Map(
    "dedup_winnow" -> DedupOps.winnowScaledSql(DocSample),
    "dedup_minhash_lsh" -> DedupOps.minhashScaledSql(DocSample),
    // truth replays in full (relational shingle join); candidates
    // splice aux_minhash_buckets, the estimate splices the gated
    // aux_minhash_sigs dump
    "dedup_eval_pr" -> DedupOps.dedupEvalPrScaledSql(DocSample),
    // shares aux_minhash_buckets (same signature chain; per-split
    // re-capping happens oracle-side over the gated dump)
    "dedup_lsh_append" -> DedupOps.lshAppendScaledSql(DocSample),
    // the streaming twin shares the batch oracle verbatim (same
    // SparkEntry wiring as the full form)
    "stream_dedup_neardup" -> DedupOps.minhashScaledSql(DocSample),
    "dedup_clusters_lsh" -> DedupOps.clustersLshScaledSql(DocSample),
    "dedup_simhash" -> DedupOps.simhashScaledSql(DocSample),
    "sim_threshold_lsh" -> SimilarityOps.thresholdLshScaledSql(VecSample),
    // shares aux_srp_t04 (same 8×64 geometry; split capping happens
    // oracle-side over the gated dump)
    "dedup_semantic_append" -> DedupOps.semanticAppendScaledSql(VecSample),
    // the walk replays in full; only the edge derivation samples
    "sim_nsw_topk" -> SimilarityOps.nswOracleSql(VecSample),
    "sim_nsw_append" -> SimilarityOps.nswAppendOracleSql(VecSample),
    // delete shares sim_nsw_topk's aux (same frozen graph, MoR filter)
    "sim_nsw_delete" -> SimilarityOps.nswDeleteOracleSql(VecSample),
    "sim_nsw_compact" -> SimilarityOps.nswCompactOracleSql(VecSample)
  ) ++ DedupOps.semanticLshScaledOracle(VecSample) ++
    DedupOps.semanticAppendAutoScaledOracle(VecSample)
}
