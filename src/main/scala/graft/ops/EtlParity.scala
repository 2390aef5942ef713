package graft.ops

import graft.Tables
import graft.etl.{Geo, Normalize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity scalar/coercion operators demonstrated over the
  * testdata tables so the DuckDB oracle can grade them (the voter TSV
  * fixtures exercise the same code paths in ScalaTest).
  *
  * Mapping: P2 empty→NULL, P3 int coercion with junk→NULL, P4 date
  * parse from `MM/dd/yyyy` text, F1/F2 `NN--ST--*` filename grammar,
  * F5 first-occurrence suffix strip, F6 geohash (rows-only — DuckDB
  * has no geohash; graded by known-vector unit tests).
  */
object EtlParity {

  /** P2: empty/whitespace strings → NULL. Values are synthesized from
    * part rows so every SF has hits. */
  def nullNormalize(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("raw",
        when(col("p_size") < 10, lit("  ")).otherwise(col("p_brand")))
      .withColumn("val", Normalize.emptyToNull(col("raw")))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n"),
        count(col("val")).as("n_nonnull"),
        sum(when(col("val").isNull, 1).otherwise(0)).cast("long").as("n_null"))
      .orderBy(col("p_type"))

  /** P3/F7: int coercion where junk → NULL (JS Number() NaN analog). */
  def intCoercion(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("raw",
        when(col("p_partkey") % 3 === 0, col("p_size").cast("string"))
          .otherwise(col("p_type")))
      .withColumn("parsed", col("raw").try_cast("int"))
      .agg(count(lit(1)).as("n"),
        count(col("parsed")).as("n_parsed"),
        sum(col("parsed")).cast("long").as("sum_parsed"))

  /** P4/F8: `MM/dd/yyyy` text → DATE round-trip on order dates. */
  def dateCoercion(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("txt", date_format(col("o_orderdate"), "MM/dd/yyyy"))
      .withColumn("parsed", to_date(col("txt"), "MM/dd/yyyy"))
      .groupBy(year(col("parsed")).as("yr"))
      .agg(count(lit(1)).as("n"),
        min(col("parsed")).cast("string").as("first_date"),
        max(col("parsed")).cast("string").as("last_date"))
      .orderBy(col("yr"))

  /** F1/F2/O1: filename grammar `NN--ST--rest.tab` — build names from
    * nation rows, parse them back, numeric sort. */
  def filenameGrammar(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .withColumn("filename",
        format_string("%02d--%s--VM2Uniform--2024-01-15.tab",
          col("n_nationkey"), col("n_name")))
      .select(col("filename"),
        split(col("filename"), "--").getItem(0).cast("int").as("file_number"),
        split(col("filename"), "--").getItem(1).as("state_token"))
      .orderBy(col("file_number"))

  /** F5: strip only the FIRST " (EST.)" occurrence (JS replace). */
  def estMarkerStrip(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("city_raw",
        when(col("c_custkey") % 4 === 0, concat(col("c_name"), lit(" (EST.)")))
          .when(col("c_custkey") % 4 === 1,
            concat(col("c_name"), lit(" (EST.) x (EST.)")))
          .otherwise(col("c_name")))
      .select(col("c_custkey"), col("city_raw"),
        Normalize.stripEstMarker(col("city_raw")).as("city"))
      .orderBy(col("c_custkey"))

  /** F6: geohash-8 over synthesized coordinates. Uses the native
    * codegen'd expression; equivalence with the UDF reference
    * implementation is unit-tested, and the DuckDB oracle recomputes
    * the hash in pure SQL via [[geohashSql]]'s fixed-point bit
    * interleave (DuckDB has no geohash builtin). */
  def geohashDerive(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("lat", (col("c_custkey") % 1800).cast("double") / 10.0 - 90.0)
      .withColumn("lon", (col("c_custkey") * 7 % 3600).cast("double") / 10.0 - 180.0)
      .select(col("c_custkey"), col("lat"), col("lon"),
        graft.functions.GraftFunctions.geohash(col("lat"), col("lon"), 8)
          .as("geohash"))
      .orderBy(col("c_custkey"))

  /** PII redaction — the scrub step a voter-file/PII pipeline (the
    * reference's whole domain) runs before data leaves the trust
    * boundary, and a training-data pipeline runs before text reaches
    * a tokenizer. Contact strings are synthesized deterministically
    * from customer keys so every SF has hits, then redacted by three
    * chained `regexp_replace` passes (phone → email → residual long
    * digit runs). All regexes are RE2-safe (no backrefs/lookaround) so
    * the DuckDB oracle runs the identical patterns. The collapse of
    * `n_distinct_scrubbed` vs `n_distinct_raw` is the anonymization
    * signal: every contact in a segment becomes the same masked
    * string. Pure codegen'd projection + one aggregate — no UDFs. */
  def piiScrub(s: SparkSession, d: String): DataFrame = {
    val phoneRe = "[0-9]{3}-[0-9]{4}"
    val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    val idRe = "[0-9]{4,}"
    Tables.customer(s, d)
      .withColumn("contact", concat(col("c_name"), format_string(
        " ph:%03d-%04d mail:user%d@example.com",
        col("c_custkey") % 1000, col("c_custkey") % 10000, col("c_custkey"))))
      .withColumn("s1", regexp_replace(col("contact"), phoneRe, "[PHONE]"))
      .withColumn("s2", regexp_replace(col("s1"), emailRe, "[EMAIL]"))
      .withColumn("scrubbed", regexp_replace(col("s2"), idRe, "[ID]"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"),
        sum(regexp_count(col("contact"), lit(phoneRe))).as("n_phones"),
        sum(regexp_count(col("s1"), lit(emailRe))).as("n_emails"),
        sum(regexp_count(col("s2"), lit(idRe))).as("n_ids"),
        countDistinct(col("contact")).as("n_distinct_raw"),
        countDistinct(col("scrubbed")).as("n_distinct_scrubbed"))
      .orderBy(col("c_mktsegment"))
  }

  /** Data-quality EXPECTATIONS suite (the Deequ/Great-Expectations
    * shape; the reference's count-reconciliation A4 generalized to
    * declarative constraints): uniqueness, completeness, range, and
    * referential-integrity checks evaluated as ONE aggregate over
    * each table plus one anti-join per foreign key, emitted as a
    * (rule, violations, passed) report — the artifact a pipeline
    * publishes next to every load. Scale shape: the single-table
    * rules share one partial-agg pass; each FK check is a key-only
    * anti-join (broadcastable build side when the parent is a dim). */
  def qualityExpectations(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val single = o.agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_orderkey")).as("nd"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("nn"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpos"),
      sum(when(col("o_orderdate") < lit("1992-01-01").cast("timestamp_ntz") ||
        col("o_orderdate") >= lit("1999-01-01").cast("timestamp_ntz"), 1L)
        .otherwise(0L)).as("oor"))
    val fkLineitem = Tables.lineitem(s, d).select(col("l_orderkey"))
      .join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("lineitem_fk_orders").as("rule"), col("violations"))
    val fkCustomer = o.select(col("o_custkey"))
      .join(Tables.customer(s, d).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("orders_fk_customer").as("rule"), col("violations"))
    single.select(expr(
        """stack(4,
          |  'orderkey_unique',     n - nd,
          |  'orderkey_not_null',   nn,
          |  'totalprice_positive', nonpos,
          |  'orderdate_in_range',  oor) AS (rule, violations)""".stripMargin))
      .unionByName(fkLineitem)
      .unionByName(fkCustomer)
      .withColumn("passed", col("violations") === 0)
      .orderBy(col("rule"))
  }

  /** k-anonymity audit over a quasi-identifier tuple — the
    * training-data governance twin of [[qualityExpectations]]: any
    * combination of quasi-identifiers shared by fewer than k
    * individuals re-identifies them, so the release gate reports
    * every equivalence class below k. One partial-agg shuffle on the
    * quasi-identifier tuple; at 100 TB the report is
    * |distinct quasi-tuples| rows, and the k floor is the policy
    * input. (The scrub itself is `etl_pii_scrub`; this is the CHECK
    * that the scrubbed release actually satisfies the policy.) */
  def kAnonymity(s: SparkSession, d: String): DataFrame = {
    val K = 5L
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"))
      .withColumn("meets_k", col("class_size") >= K)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** l-diversity audit — the companion gate [[kAnonymity]] does not
    * cover: a class can satisfy k (enough members) while every member
    * shares ONE sensitive value, so the release still leaks the
    * attribute. Per quasi-identifier equivalence class, the count of
    * DISTINCT sensitive values (account balance banded at the $1000
    * grain) must reach l.
    *
    * The band is floor(acctbal/1000): both engines evaluate the same
    * IEEE division of the same 2-decimal doubles — exact multiples of
    * 1000 are exactly-representable doubles, so floor is never within
    * rounding distance of flipping — and floor-division semantics
    * (not truncation) keep negative balances in band −1, identically
    * in both engines. Same plan shape as the k gate: one partial-agg
    * shuffle at the quasi-tuple grain (the distinct-count adds
    * Spark's Expand ×2 at the CLASS grain, not the corpus grain). */
  def lDiversity(s: SparkSession, d: String): DataFrame = {
    val L = 3L
    Tables.customer(s, d)
      .withColumn("band", floor(col("c_acctbal") / 1000.0))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("band")).as("distinct_sensitive"))
      .withColumn("meets_l", col("distinct_sensitive") >= L)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** t-closeness audit — the third member of the release-gate triad
    * ([[kAnonymity]]: classes big enough; [[lDiversity]]: sensitive
    * values varied enough; this: the class's sensitive DISTRIBUTION
    * close enough to the global one — a class can pass k and l while
    * skewing overwhelmingly toward one tail, which still leaks).
    * Per quasi-identifier class, Earth Mover's Distance between the
    * class and global distributions of the ORDERED sensitive
    * attribute (acctbal at the same $1000 band grain as the l gate):
    * EMD = Σᵢ |cumP − cumQ| / (m−1) over the m global bands (Li et
    * al., ICDE'07 — the ordered-attribute form).
    *
    * Exactness: every cumulative is an integer count, and the
    * per-band term is written over the COMMON denominator —
    * |cum_c·N − cumg·N_c| — so the whole sum is exact BIGINT; ONE
    * IEEE division by the double product N_c·N·(m−1) (same literal
    * association order in both engines) + the final 6-round ends it.
    * (At 100 TB the n² products take the `stat_ks_test` DECIMAL
    * widening; BIGINT is exact at every graded SF.)
    *
    * Scale shape: the global band histogram is VALUE-DOMAIN-bounded
    * (~11 bands at this grain) — collected once, cumsum'd at the
    * driver and re-entered as a literal struct array, so the plan
    * has NO global window and NO cross join: the dense class×band
    * grid is a narrow explode of that literal per class row, the
    * per-class cumsum is a window PARTITIONED by class (m rows
    * each), and everything else is the k/l gates' one partial-agg
    * shuffle at the quasi-tuple grain. */
  def tCloseness(s: SparkSession, d: String): DataFrame =
    tClosenessOn(Tables.customer(s, d))

  /** Core of [[tCloseness]] over any (c_nationkey, c_mktsegment,
    * c_acctbal) frame — parameterized for the hand-computed spec. */
  private[graft] def tClosenessOn(custRaw: DataFrame): DataFrame = {
    val T = 0.05
    val cust = custRaw
      .withColumn("band", floor(col("c_acctbal") / 1000.0).cast("long"))
    val g = cust.groupBy(col("band")).agg(count(lit(1)).as("gc"))
      .orderBy(col("band")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    require(g.length >= 2,
      "t-closeness: need at least 2 global sensitive bands — EMD's " +
        "m-1 normalizer is undefined on a constant attribute")
    val n = g.map(_._2).sum
    val m = g.length
    val cums = g.map(_._2).scanLeft(0L)(_ + _).tail
    val bandLit = array(g.zip(cums).map { case ((b, _), cg) =>
      struct(lit(b).as("band"), lit(cg).as("cumg")) }: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("band"))
    cust.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        explode(bandLit).as("bd"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        col("bd.band").as("band"), col("bd.cumg").as("cumg"))
      .join(cust.groupBy(col("c_nationkey"), col("c_mktsegment"),
          col("band"))
        .agg(count(lit(1)).as("ncb")),
        Seq("c_nationkey", "c_mktsegment", "band"), "left")
      .na.fill(0L, Seq("ncb"))
      .withColumn("cumc", sum(col("ncb")).over(w))
      .withColumn("term",
        abs(col("cumc") * n - col("cumg") * col("class_size")))
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        col("class_size"))
      .agg(round(sum(col("term")).cast("double") /
        (col("class_size").cast("double") * lit(n.toDouble) *
          lit((m - 1).toDouble)), 6).as("emd"))
      .withColumn("meets_t", col("emd") <= T)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** Differentially-private counts (ε = 1, sensitivity 1) — the
    * RELEASE side of the privacy family ([[kAnonymity]] and
    * [[lDiversity]] audit; this perturbs): per equivalence class,
    * count + Laplace(1) noise via the inverse CDF,
    * noise = −sgn(u−½)·ln(1−2|u−½|).
    *
    * Real DP draws u from a CSPRNG; a GRADEABLE engine needs a
    * deterministic draw, so u comes from the catalog's md5 route
    * (`sample_systematic`): the first 48 md5 bits of the class key,
    * centered to (h+½)/2⁴⁸ so u ∈ (0,1) strictly — ln(0) is
    * unreachable by construction. Everything up to the ln is EXACT in
    * double (h+½ has ≤49 significant bits; /2⁴⁸ is a power-of-two
    * scale; 1−2|u−½| is representable at ≤53 bits), so both engines
    * hand ln the identical argument; the final 6-digit round absorbs
    * the one step that is only correctly-rounded-ish per libm (the
    * z-score/sqrt precedent). One partial-agg shuffle; the noise is a
    * narrow per-row map over class-grain rows. */
  def dpCount(s: SparkSession, d: String): DataFrame = {
    val u = (col("h").cast("double") + lit(0.5)) / lit(281474976710656.0)
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("tc"))
      .withColumn("h", conv(substring(md5(concat(
          col("c_nationkey").cast("string"), lit("|"),
          col("c_mktsegment"))), 1, 12), 16, 10).cast("long"))
      .withColumn("noisy_count", round(
        col("tc") + when(u < 0.5, lit(1.0)).otherwise(lit(-1.0)) *
          log(lit(1.0) - lit(2.0) * abs(u - lit(0.5))), 6))
      .select(col("c_nationkey"), col("c_mktsegment"), col("noisy_count"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** Winsorization audit — the robust-stats cleanup every feature
    * pipeline runs before a mean can be trusted: per market (nation),
    * cap balances at the EXACT interpolated p05/p95 (the
    * `agg_percentiles` ↔ quantile_cont parity), count what each tail
    * capped, and report the winsorized mean WITHOUT ever summing
    * capped doubles row-by-row: the middle mass is an exact DECIMAL
    * sum, the two tails contribute n_tail·cap as single products, and
    * the three addends combine in one fixed left-associated
    * expression — so no partition-order float accumulation exists
    * anywhere. Caps are a 25-row broadcast; one conditional-agg
    * shuffle at the group grain. */
  def winsorize(s: SparkSession, d: String): DataFrame = {
    val caps = Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(percentile(col("c_acctbal"), lit(0.05)).as("p05"),
        percentile(col("c_acctbal"), lit(0.95)).as("p95"))
    Tables.customer(s, d)
      .join(broadcast(caps), Seq("c_nationkey"))
      .groupBy(col("c_nationkey"), col("p05"), col("p95"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("c_acctbal") < col("p05"), 1L).otherwise(0L))
          .as("n_low"),
        sum(when(col("c_acctbal") > col("p95"), 1L).otherwise(0L))
          .as("n_high"),
        sum(when(col("c_acctbal") >= col("p05") &&
            col("c_acctbal") <= col("p95"), col("c_acctbal").cast(D18_2)))
          .cast("double").as("mid_sum"))
      .select(col("c_nationkey"), col("n"), col("n_low"), col("n_high"),
        round(col("p05"), 9).as("p05"), round(col("p95"), 9).as("p95"),
        round((col("mid_sum") + col("n_low") * col("p05") +
          col("n_high") * col("p95")) / col("n"), 9).as("winsorized_mean"))
      .orderBy(col("c_nationkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_winsorize" -> winsorize,
    "quality_expectations" -> qualityExpectations,
    "privacy_k_anonymity" -> kAnonymity,
    "privacy_l_diversity" -> lDiversity,
    "privacy_t_closeness" -> tCloseness,
    "privacy_dp_count" -> dpCount,
    "etl_null_normalize" -> nullNormalize,
    "etl_int_coercion" -> intCoercion,
    "etl_date_coercion" -> dateCoercion,
    "etl_filename_grammar" -> filenameGrammar,
    "etl_est_marker_strip" -> estMarkerStrip,
    "etl_geohash" -> geohashDerive, // oracled via generated bit-interleave SQL
    "etl_pii_scrub" -> piiScrub,
    // the reference's flagship pipeline end-to-end (TSV scan →
    // normalize → geohash → first-wins dedup → reconcile), on
    // deterministic customer-derived fixtures (etl/SynthVoters.scala)
    "etl_load_report" -> (graft.etl.SynthVoters.loadReport _),
  )

  /** Geohash-8 in pure SQL, generated term-by-term. The bisection
    * bit sequence of a coordinate IS its fixed-point quantization:
    * bit k (MSB-first) of floor((lat+90)/180 · 2²⁰) equals the k-th
    * lat bisection decision, so geohash = base32 of the lon/lat bit
    * interleave — all integer arithmetic after two quantizations.
    *
    * Double-rounding safety (why the two engines can't disagree):
    * both compute the SAME lat/lon doubles from integer keys (same
    * IEEE expression), and the quantization x = (v+90)/180·2²⁰
    * carries ≤ ~1e-9 of accumulated rounding error, while for this
    * fixture family (coordinates on a 0.1° grid) the exact x is
    * either ≥ 3.8e-7 away from every integer or EXACTLY integral
    * (0.1°-grid values that are dyadic land on cell boundaries, where
    * floor and the bisection's `>= mid` branch agree and the double
    * arithmetic is exact). So floor() is never ambiguous. */
  private def geohashSql: String = {
    val interleave = (0 until 20).map { i =>
      s"((((ilon >> $i) & 1) << ${2 * i + 1}) + (((ilat >> $i) & 1) << ${2 * i}))"
    }.mkString(" + ")
    val chars = (0 until 8).map { j =>
      s"substr('0123456789bcdefghjkmnpqrstuvwxyz', " +
        s"CAST(((bits >> ${35 - 5 * j}) & 31) AS INT) + 1, 1)"
    }.mkString(" || ")
    s"""WITH g AS (
       |  SELECT c_custkey,
       |    CAST(c_custkey % 1800 AS DOUBLE) / 10 - 90.0 AS lat,
       |    CAST(c_custkey * 7 % 3600 AS DOUBLE) / 10 - 180.0 AS lon
       |  FROM customer),
       |q AS (
       |  SELECT c_custkey, lat, lon,
       |    LEAST(CAST(floor((lat + 90.0) / 180.0 * 1048576) AS BIGINT),
       |      1048575) AS ilat,
       |    LEAST(CAST(floor((lon + 180.0) / 360.0 * 1048576) AS BIGINT),
       |      1048575) AS ilon
       |  FROM g),
       |b AS (SELECT c_custkey, lat, lon, $interleave AS bits FROM q)
       |SELECT c_custkey, lat, lon, $chars AS geohash
       |FROM b ORDER BY c_custkey""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // same caps (quantile_cont = the engine's exact interpolated
    // percentile), same decimal middle mass, same fixed-order
    // three-addend mean tree
    "etl_winsorize" ->
      """WITH caps AS (SELECT c_nationkey,
        |    quantile_cont(c_acctbal, 0.05) AS p05,
        |    quantile_cont(c_acctbal, 0.95) AS p95
        |  FROM customer GROUP BY 1)
        |SELECT c.c_nationkey, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN c_acctbal < p05 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN c_acctbal > p95 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_high,
        |  round(p05, 9) AS p05, round(p95, 9) AS p95,
        |  round((CAST(SUM(CASE WHEN c_acctbal >= p05 AND c_acctbal <= p95
        |      THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
        |    + SUM(CASE WHEN c_acctbal < p05 THEN 1 ELSE 0 END) * p05
        |    + SUM(CASE WHEN c_acctbal > p95 THEN 1 ELSE 0 END) * p95)
        |    / COUNT(*), 9) AS winsorized_mean
        |FROM customer c JOIN caps ON caps.c_nationkey = c.c_nationkey
        |GROUP BY c.c_nationkey, p05, p95
        |ORDER BY c.c_nationkey""".stripMargin,
    // identical noise tree: same 48-bit md5 draw, same centered
    // uniform, same inverse-CDF expression, same final 6-digit round
    "privacy_dp_count" ->
      """WITH c AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS tc
        |  FROM customer GROUP BY 1, 2),
        |h AS (SELECT *, ('0x' || substr(md5(
        |    CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment),
        |    1, 12))::BIGINT AS hv FROM c),
        |u AS (SELECT *, (CAST(hv AS DOUBLE) + 0.5) / 281474976710656.0
        |  AS uu FROM h)
        |SELECT c_nationkey, c_mktsegment,
        |  round(tc + (CASE WHEN uu < 0.5 THEN 1.0 ELSE -1.0 END) *
        |    ln(1.0 - 2.0 * abs(uu - 0.5)), 6) AS noisy_count
        |FROM u ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "privacy_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  COUNT(*) AS class_size,
        |  COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
        |    AS distinct_sensitive,
        |  COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) >= 3
        |    AS meets_l
        |FROM customer GROUP BY 1, 2
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "privacy_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  COUNT(*) AS class_size,
        |  COUNT(*) >= 5 AS meets_k
        |FROM customer GROUP BY 1, 2
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    // the identical exact-integer EMD chain: global band cumsums,
    // dense class×band grid, common-denominator BIGINT terms, ONE
    // double division in the same association order, round 6
    "privacy_t_closeness" ->
      """WITH g AS (SELECT CAST(floor(c_acctbal / 1000.0) AS BIGINT)
        |    AS band, COUNT(*) AS gc FROM customer GROUP BY 1),
        |gt AS (SELECT band, SUM(gc) OVER (ORDER BY band) AS cumg,
        |    (SELECT CAST(SUM(gc) AS BIGINT) FROM g) AS n,
        |    (SELECT COUNT(*) FROM g) AS m FROM g),
        |cls AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS nc
        |  FROM customer GROUP BY 1, 2),
        |cb AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
        |    COUNT(*) AS ncb FROM customer GROUP BY 1, 2, 3),
        |grid AS (SELECT cls.c_nationkey, cls.c_mktsegment, cls.nc,
        |    gt.band, gt.cumg, gt.n, gt.m, COALESCE(cb.ncb, 0) AS ncb
        |  FROM cls CROSS JOIN gt
        |  LEFT JOIN cb ON cb.c_nationkey = cls.c_nationkey
        |    AND cb.c_mktsegment = cls.c_mktsegment
        |    AND cb.band = gt.band),
        |cum AS (SELECT *, SUM(ncb) OVER (
        |    PARTITION BY c_nationkey, c_mktsegment ORDER BY band)
        |    AS cumc FROM grid),
        |emd AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(nc AS BIGINT) AS class_size,
        |    round(CAST(SUM(abs(cumc * n - cumg * nc)) AS DOUBLE) /
        |      (CAST(nc AS DOUBLE) * n * (m - 1)), 6) AS emd
        |  FROM cum GROUP BY c_nationkey, c_mktsegment, nc, n, m)
        |SELECT c_nationkey, c_mktsegment, class_size, emd,
        |  emd <= 0.05 AS meets_t
        |FROM emd ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "quality_expectations" ->
      """SELECT rule, violations, violations = 0 AS passed FROM (
        |  SELECT 'orderkey_unique' AS rule,
        |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
        |      AS violations FROM orders
        |  UNION ALL SELECT 'orderkey_not_null',
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM orders
        |  UNION ALL SELECT 'totalprice_positive',
        |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM orders
        |  UNION ALL SELECT 'orderdate_in_range',
        |    CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
        |      OR o_orderdate >= TIMESTAMP '1999-01-01'
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'lineitem_fk_orders', CAST(COUNT(*) AS BIGINT)
        |    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |    WHERE o.o_orderkey IS NULL
        |  UNION ALL SELECT 'orders_fk_customer', CAST(COUNT(*) AS BIGINT)
        |    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |    WHERE c.c_custkey IS NULL)
        |ORDER BY rule""".stripMargin,
    "etl_geohash" -> geohashSql,
    // Recomputes SynthVoters' per-state report from `customer`
    // directly: rows_in = base + %7 duplicates, rows_loaded = distinct
    // keys (keys are state-local by construction), expected_lines =
    // the file's true line count (+5000 for the deliberately-inflated
    // AK manifest row), reconciled = within the default 1000 tolerance.
    "etl_load_report" ->
      """WITH c AS (SELECT c_custkey,
        |  CASE c_nationkey % 5 WHEN 0 THEN 'AK' WHEN 1 THEN 'CA'
        |    WHEN 2 THEN 'NY' WHEN 3 THEN 'TX' ELSE 'WA' END AS state
        |  FROM customer),
        |allrows AS (SELECT state, c_custkey FROM c
        |  UNION ALL SELECT state, c_custkey FROM c WHERE c_custkey % 7 = 0),
        |agg AS (SELECT state, COUNT(*) AS rows_in,
        |    COUNT(DISTINCT c_custkey) AS rows_loaded
        |  FROM allrows GROUP BY state)
        |SELECT state, rows_in, rows_loaded,
        |  CAST(rows_in - rows_loaded AS BIGINT) AS dups_dropped,
        |  CAST(rows_in + CASE WHEN state = 'AK' THEN 5000 ELSE 0 END
        |    AS BIGINT) AS expected_lines,
        |  (rows_loaded >= rows_in
        |    + CASE WHEN state = 'AK' THEN 5000 ELSE 0 END - 1000
        |   AND rows_loaded <= rows_in
        |    + CASE WHEN state = 'AK' THEN 5000 ELSE 0 END + 1000)
        |    AS reconciled
        |FROM agg ORDER BY state""".stripMargin,
    "etl_null_normalize" ->
      """SELECT p_type, COUNT(*) AS n,
        |  COUNT(CASE WHEN p_size < 10 THEN NULL ELSE p_brand END) AS n_nonnull,
        |  CAST(SUM(CASE WHEN p_size < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        |FROM part GROUP BY p_type ORDER BY p_type""".stripMargin,
    "etl_int_coercion" ->
      """SELECT COUNT(*) AS n,
        |  COUNT(TRY_CAST(CASE WHEN p_partkey % 3 = 0
        |    THEN CAST(p_size AS VARCHAR) ELSE p_type END AS INT)) AS n_parsed,
        |  CAST(SUM(TRY_CAST(CASE WHEN p_partkey % 3 = 0
        |    THEN CAST(p_size AS VARCHAR) ELSE p_type END AS INT)) AS BIGINT)
        |    AS sum_parsed
        |FROM part""".stripMargin,
    "etl_date_coercion" ->
      """SELECT CAST(year(parsed) AS INT) AS yr, COUNT(*) AS n,
        |  CAST(MIN(parsed) AS VARCHAR) AS first_date,
        |  CAST(MAX(parsed) AS VARCHAR) AS last_date
        |FROM (SELECT CAST(strptime(strftime(o_orderdate, '%m/%d/%Y'),
        |  '%m/%d/%Y') AS DATE) AS parsed FROM orders) t
        |GROUP BY 1 ORDER BY yr""".stripMargin,
    "etl_filename_grammar" ->
      """SELECT filename,
        |  CAST(split_part(filename, '--', 1) AS INT) AS file_number,
        |  split_part(filename, '--', 2) AS state_token
        |FROM (SELECT printf('%02d--%s--VM2Uniform--2024-01-15.tab',
        |  n_nationkey, n_name) AS filename FROM nation) t
        |ORDER BY file_number""".stripMargin,
    "etl_est_marker_strip" ->
      """SELECT c_custkey, city_raw,
        |  CASE WHEN strpos(city_raw, ' (EST.)') > 0 THEN
        |    substr(city_raw, 1, strpos(city_raw, ' (EST.)') - 1) ||
        |    substr(city_raw, strpos(city_raw, ' (EST.)') + 7)
        |  ELSE city_raw END AS city
        |FROM (SELECT c_custkey,
        |  CASE WHEN c_custkey % 4 = 0 THEN c_name || ' (EST.)'
        |       WHEN c_custkey % 4 = 1 THEN c_name || ' (EST.) x (EST.)'
        |       ELSE c_name END AS city_raw
        |  FROM customer) t
        |ORDER BY c_custkey""".stripMargin,
    "etl_pii_scrub" ->
      """WITH raw AS (SELECT c_mktsegment,
        |  c_name || printf(' ph:%03d-%04d mail:user%d@example.com',
        |    c_custkey % 1000, c_custkey % 10000, c_custkey) AS contact
        |  FROM customer),
        |st AS (SELECT c_mktsegment, contact,
        |  regexp_replace(contact, '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS s1
        |  FROM raw),
        |st2 AS (SELECT *, regexp_replace(s1,
        |  '[a-z0-9]+@[a-z]+\.[a-z]+', '[EMAIL]', 'g') AS s2 FROM st),
        |st3 AS (SELECT *, regexp_replace(s2,
        |  '[0-9]{4,}', '[ID]', 'g') AS scrubbed FROM st2)
        |SELECT c_mktsegment, COUNT(*) AS n_rows,
        |  CAST(SUM(len(regexp_extract_all(contact, '[0-9]{3}-[0-9]{4}')))
        |    AS BIGINT) AS n_phones,
        |  CAST(SUM(len(regexp_extract_all(s1, '[a-z0-9]+@[a-z]+\.[a-z]+')))
        |    AS BIGINT) AS n_emails,
        |  CAST(SUM(len(regexp_extract_all(s2, '[0-9]{4,}')))
        |    AS BIGINT) AS n_ids,
        |  COUNT(DISTINCT contact) AS n_distinct_raw,
        |  COUNT(DISTINCT scrubbed) AS n_distinct_scrubbed
        |FROM st3 GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  )
}
