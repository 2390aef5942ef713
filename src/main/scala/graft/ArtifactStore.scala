package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Content-addressed artifact store (VERDICT r4 #5): trained/derived
  * artifacts (k-means centroids, near-dup cluster maps) materialized
  * as parquet under `<root>/<name>/<input-fingerprint>/`, read if
  * present, rebuilt if absent. Production pipelines materialize such
  * artifacts once per corpus snapshot and SERVE them; a per-JVM map
  * only approximates that (and ADVICE r4: a cached
  * localCheckpoint-backed DataFrame is bound to the session that
  * built it, and data republished at the same path silently serves
  * stale results).
  *
  * Both problems end here: the store returns a plain parquet scan —
  * session-independent by construction — and the address is a content
  * fingerprint of the INPUT (parquet file listing: name, length,
  * mtime), so republished input changes the address and forces a
  * rebuild instead of serving stale artifacts. The testdata dirs are
  * read-only, so artifacts live under a writable root
  * (`SPARK_GRAFT_ARTIFACTS_DIR`, default under java.io.tmpdir), keyed
  * exactly the way `<sf>/_artifacts/<name>/` would be on a writable
  * warehouse.
  */
object ArtifactStore {

  def root: String = sys.env.get("SPARK_GRAFT_ARTIFACTS_DIR")
    .orElse(sys.props.get("graft.artifacts.dir")) // test isolation hook
    .getOrElse(System.getProperty("java.io.tmpdir") + "/graft_artifacts")

  private val buildCount = new java.util.concurrent.atomic.AtomicLong

  /** Number of artifact builds this JVM has performed — lets tests
    * prove the serve path reads the store rather than retraining. */
  def builds: Long = buildCount.get

  /** Fingerprint of an input table: digest over the sorted
    * (full path, length, mtime) triples of its parquet file listing —
    * driver-side footer-level metadata, zero Spark jobs (the same
    * listing-cost class as [[Tables.cardinality]]). The FULL path
    * (not the basename) is digested: partitioned layouts write
    * identically-named part files into different partition dirs, and
    * a basename digest would collide across a partition-dir
    * rename/swap, serving an artifact built from the old layout. At
    * 100 TB the equivalent key is the catalog's snapshot id. */
  def fingerprint(spark: SparkSession, inputPath: String): String = {
    val p = new org.apache.hadoop.fs.Path(inputPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val entries = Seq.newBuilder[String]
    if (fs.getFileStatus(p).isDirectory) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        entries += s"${f.getPath.toUri.getPath}:${f.getLen}:${f.getModificationTime}"
      }
    } else {
      val f = fs.getFileStatus(p)
      entries += s"${f.getPath.toUri.getPath}:${f.getLen}:${f.getModificationTime}"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(entries.result().sorted.mkString("\n").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Serve-or-build: if the artifact for (name, version,
    * fingerprint(input)) exists, return a scan over it; else run
    * `build`, persist, scan. The build cost is paid once per corpus
    * snapshot per store — a cold JVM with a warm store serves without
    * retraining — and is logged explicitly so bench wall-time
    * attribution stays honest.
    *
    * `version` is the BUILDER's version and is part of the address:
    * the fingerprint keys the input data only, so an edit to the
    * build logic (trainer iterations, components algorithm, schema)
    * MUST bump the caller's version or a warm store silently serves
    * artifacts computed by the old code.
    *
    * Publication is atomic: the build lands in a temp sibling and is
    * RENAMEd into the address, so a concurrent reader in another JVM
    * never observes a half-written or mid-overwrite directory (an
    * in-place overwrite deletes part files under live scans). If a
    * racing builder won the rename, its identical (deterministic)
    * output is served and the loser's temp dir is dropped.
    *
    * `partitionColumns` makes the artifact a PARTITIONED layout
    * (hive-style dirs): readers filtering on those columns with
    * literal predicates get partition-pruned I/O — the IVF
    * probe-reads-only-its-clusters path. */
  def parquet(spark: SparkSession, name: String, inputPath: String,
      version: Int = 1, partitionColumns: Seq[String] = Nil)
      (build: => DataFrame): DataFrame = {
    val dir = parquetDir(spark, name, inputPath, version, partitionColumns)(build)
    // session-keyed RELATION cache (the Tables.relationCache idiom):
    // the address is a content fingerprint, so the directory's
    // contents are immutable once published — re-resolving the source
    // (listing + footer schema inference, ~100 ms driver latency per
    // call) on every serve is pure waste. The cached object is the
    // resolved logical plan; every action over it still scans the
    // artifact parquet.
    relationCache.getOrElseUpdate((spark, dir), spark.read.parquet(dir))
  }

  private val relationCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** [[parquet]], but returning the RESOLVED artifact directory — for
    * callers that need the address itself (e.g. an optimizer rule
    * parameterized by the MV location). This is the one public way to
    * learn the address: hand-reconstructing root + name + version +
    * fingerprint duplicates the store's private path scheme and
    * re-runs the fingerprint after the build, so an input republish
    * between the two calls silently points at a missing/stale dir
    * (ADVICE r9). */
  def parquetDir(spark: SparkSession, name: String, inputPath: String,
      version: Int = 1, partitionColumns: Seq[String] = Nil)
      (build: => DataFrame): String =
    serveOrBuild(spark, name, inputPath, version) { tmp =>
      val w = build.write.mode("overwrite")
      (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*)
       else w).parquet(tmp.toString)
      // the parquet committer wrote tmp/_SUCCESS itself
    }

  /** Serve-or-build for a NON-parquet directory artifact (e.g. a
    * deterministic TSV fixture corpus): `build` populates the temp
    * dir however it likes; the store adds the `_SUCCESS` marker and
    * publishes with the same content address + atomic rename as
    * [[parquet]]. Returns the artifact dir path. */
  def directory(spark: SparkSession, name: String, inputPath: String,
      version: Int = 1)(build: String => Unit): String =
    serveOrBuild(spark, name, inputPath, version) { tmp =>
      val fs = tmp.getFileSystem(spark.sessionState.newHadoopConf())
      fs.mkdirs(tmp)
      build(tmp.toString)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), true).close()
    }

  /** Serve-or-build for a BUCKETED table artifact: the data lives as
    * a content-addressed parquet dir like [[parquet]], but bucketing
    * is CATALOG metadata — Spark only trusts a bucket layout declared
    * in a table's bucket spec (the bucket id rides each file's name;
    * a plain `read.parquet` over the same files ignores it). So the
    * build writes through `bucketBy(...).sortBy(...).saveAsTable`
    * into the store's temp dir (then drops the external table —
    * metadata only, the files and their bucket-id names survive the
    * publish rename), and EVERY serve registers a session-local
    * external table over the published dir with the matching
    * CLUSTERED BY spec. A cold JVM over a warm store pays one DDL
    * statement, never a rewrite — exactly a warehouse re-attaching a
    * bucketed table to its storage. The builder's `version` must bump
    * if key/buckets/schema change, same contract as [[parquet]]. */
  def bucketedTable(spark: SparkSession, name: String, inputPath: String,
      key: String, buckets: Int, version: Int = 1)
      (build: => DataFrame): DataFrame = {
    val df = build // analysis only until the write below runs
    val table = s"graft_${name}_v${version}_${fingerprint(spark, inputPath)}"
    // the FILES are authoritative, the catalog entry is derived:
    // serve-or-build always goes through the store (honoring the
    // current root and the _SUCCESS marker — a catalog-first check
    // would serve a previous root's files into an isolated test run,
    // or a dangling LOCATION after a store wipe; review finding)
    val dir = directory(spark, name, inputPath, version) { tmp =>
      // unique per racing builder: same-name temp tables would
      // collide in the shared session catalog
      val bt = table + "_build_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", tmp).saveAsTable(bt)
      spark.sql(s"DROP TABLE `$bt`")
    }
    val stale = spark.catalog.tableExists(table) && {
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location
      new org.apache.hadoop.fs.Path(loc).toUri.getPath !=
        new org.apache.hadoop.fs.Path(dir).toUri.getPath
    }
    if (stale) spark.sql(s"DROP TABLE `$table`")
    if (stale || !spark.catalog.tableExists(table))
      spark.sql(
        s"""CREATE TABLE `$table` (${df.schema.toDDL})
           |USING parquet
           |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
           |LOCATION '$dir'""".stripMargin)
    spark.table(table)
  }

  /** The shared serve-or-build protocol: compute the content address,
    * serve it if complete, else run `buildInto` against a temp sibling
    * (which must leave a `_SUCCESS` marker inside) and atomically
    * rename it into the address. Returns the address dir. */
  private def serveOrBuild(spark: SparkSession, name: String,
      inputPath: String, version: Int)
      (buildInto: org.apache.hadoop.fs.Path => Unit): String = {
    val dir = s"$root/$name/v$version-${fingerprint(spark, inputPath)}"
    val dest = new org.apache.hadoop.fs.Path(dir)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) {
      buildCount.incrementAndGet()
      val t0 = System.nanoTime()
      val tmp = new org.apache.hadoop.fs.Path(
        s"$dir.tmp-${java.util.UUID.randomUUID()}")
      // a failed build must not leak its partial temp dir under the
      // artifact root (every retry creates a fresh UUID sibling)
      try buildInto(tmp)
      catch { case e: Throwable => fs.delete(tmp, true); throw e }
      fs.mkdirs(dest.getParent)
      // re-check: a racing builder may have completed while we built
      val success = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
      if (fs.exists(success)) {
        fs.delete(tmp, true)
      } else {
        // A dest WITHOUT _SUCCESS is an unreadable partial from a
        // crashed build and must be cleared before the rename (or tmp
        // would nest inside it). But a racing winner can publish
        // between ANY completeness check and a delete — and deleting
        // a complete artifact out from under live readers is the one
        // forbidden transition (review finding). So the stale dir is
        // MOVED ASIDE with an atomic rename, never deleted in place:
        // worst case the move catches a just-published complete
        // artifact, which the next rename immediately replaces with
        // this build's byte-identical deterministic output — readers
        // only ever observe one complete artifact or the other.
        val aside = new org.apache.hadoop.fs.Path(
          s"$dir.aside-${java.util.UUID.randomUUID()}")
        val moved = fs.exists(dest) && fs.rename(dest, aside)
        if (fs.exists(dest)) {
          // could not clear the address: either a racing winner
          // re-published right after our move (serve theirs), or the
          // move itself failed (fail loudly, not a confusing
          // missing-path read downstream)
          fs.delete(tmp, true)
          if (moved) fs.delete(aside, true)
          if (!fs.exists(success))
            throw new java.io.IOException(
              s"artifact publish failed: cannot clear stale dir at $dest")
        } else if (!fs.rename(tmp, dest)) {
          fs.delete(tmp, true)
          // a false rename is only benign when a racing builder won;
          // if the address is still incomplete, restore a complete
          // moved-aside artifact if that is what the move caught,
          // else report the failure (ADVICE r5)
          if (!fs.exists(success)) {
            if (moved && fs.exists(
                new org.apache.hadoop.fs.Path(aside, "_SUCCESS"))) {
              // the restore must not fail silently: a false rename
              // here leaves NO artifact at the address and the
              // downstream read dies with the confusing missing-path
              // error this dance exists to prevent (ADVICE r7)
              if (!fs.rename(aside, dest))
                throw new java.io.IOException(
                  s"artifact publish failed: could not restore the " +
                    s"moved-aside complete artifact $aside -> $dest")
            } else {
              if (moved) fs.delete(aside, true)
              throw new java.io.IOException(
                s"artifact publish failed: rename $tmp -> $dest returned " +
                  "false and no completed artifact exists at the address")
            }
          } else if (moved) fs.delete(aside, true)
        } else if (moved) fs.delete(aside, true)
      }
      System.err.println(
        f"[artifact] built $name -> $dir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // A builder that crashed between move-aside and restore leaks its
    // .aside-UUID sibling forever (ADVICE r7), and one hard-killed
    // MID-BUILD (kill -9/OOM — the in-process catch never ran) leaks
    // its half-written .tmp-UUID dir — sweep both stale classes on
    // every serve. Age-gated: a FRESH sibling may belong to an
    // in-flight build/publish in another JVM (deleting a live tmp
    // fails that build; deleting a live aside turns a recoverable
    // rename race into a hard failure). An aside's dance completes in
    // seconds; a tmp lives for one build — 15 min covers both here
    // (size the gate to the longest expected build at 100 TB).
    try {
      val parent = dest.getParent
      if (fs.exists(parent)) {
        val prefixes =
          Seq(dest.getName + ".aside-", dest.getName + ".tmp-")
        val cutoff = System.currentTimeMillis() - 15 * 60 * 1000
        fs.listStatus(parent).foreach { st =>
          if (prefixes.exists(st.getPath.getName.startsWith) &&
              st.getModificationTime < cutoff)
            fs.delete(st.getPath, true)
        }
      }
    } catch { case _: java.io.IOException => () } // sweep is best-effort
    dir
  }
}
