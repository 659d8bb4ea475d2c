package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical machinery shared by the persisted BAND indexes — the
  * MinHash-LSH text index ([[LshIndex]]) and the SRP dense-embedding
  * index ([[SrpIndex]]). Both store (id, band, bkey) rows under a
  * `bucket = bkey & (N-1)` partition column and answer batch probes by
  * a bucket-pruned equi-join, so the bucket layout, probe pruning,
  * fragmentation stats and compaction rewrite are one implementation;
  * what differs per index — the signature projection (shingle+minhash
  * vs signed-random-projection), the sidecar schema, and the exact
  * verify criterion (Jaccard vs cosine) — stays in the owning object.
  * The split mirrors [[IndexManifest]] (one generational lifecycle for
  * every index family in the library).
  */
private[pipeline] object BandIndexOps {

  /** Bucket fan-out must be a power of two: the bucket is the low bits
    * of the 64-bit band key, so membership in a bucket is a bitmask —
    * stable under any future fan-out *growth* by splitting. */
  def requirePow2(numBuckets: Int): Unit =
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two, got $numBuckets")

  /** The bucket column of a band-key column under fan-out N. */
  def bucketOf(bkey: Column, numBuckets: Int): Column =
    bkey.bitwiseAND(lit((numBuckets - 1).toLong)).cast("int")

  /** Land band rows inside the partitioned layout. `append` lands new
    * files inside existing bucket=… dirs, so probes see old + new rows
    * with the same pruning. */
  def writeRows(rows: DataFrame, path: String, mode: String): Unit =
    rows.repartition(col("bucket"))
      .write.partitionBy("bucket").mode(mode).parquet(path)

  /** Bucket-pruned candidate join: probe band rows (band, bkey, bucket,
    * `newCol`) against the on-disk index, emitting distinct
    * (`newCol`, `oldCol`) id pairs. The probe relation is eagerly
    * materialized via localCheckpoint — it feeds BOTH the touched-bucket
    * collect and the band join, and checkpointed blocks are
    * ContextCleaner-reclaimed (safe inside ingest LOOPS, where `.cache()`
    * plan entries would accrete until an explicit unpersist). The
    * touched-bucket collect is bounded by the index's fan-out (≤ a few
    * hundred), never the batch. `broadcastProbe` ships the batch's band
    * rows to the index scan — the daily-ingest shape where Δ ≪ corpus;
    * pass false for corpus-sized backfills (degrades to the shuffle-hash
    * equi-join the from-scratch candidate paths use). */
  def probeJoin(spark: SparkSession, path: String, probeRows: DataFrame,
      idCol: String, newCol: String, oldCol: String,
      broadcastProbe: Boolean, materializeProbe: Boolean = true): DataFrame = {
    // `materializeProbe = false` when the caller already holds the band
    // rows materialized (the ingest loop signs each batch ONCE and
    // reuses the rows here and in the append) — a second localCheckpoint
    // would copy the blocks for nothing
    val probe = if (materializeProbe) probeRows.localCheckpoint(true) else probeRows
    val touched = probe.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    val lists = spark.read.parquet(path)
      .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
    val probeSide = if (broadcastProbe) broadcast(probe) else probe.hint("shuffle_hash")
    lists.join(probeSide, Seq("band", "bkey", "bucket"))
      .filter(col(idCol) =!= col(newCol))
      .select(col(newCol), col(idCol).as(oldCol))
      .distinct()
  }

  /** Corpus × corpus candidate pairs between TWO persisted band indexes —
    * dataset-vs-dataset near-dup discovery (train-vs-benchmark
    * contamination sweeps, snapshot-vs-snapshot dedup) WITHOUT
    * re-signing either corpus: both sides are scans of already-persisted
    * 8-byte-key band rows, equi-joined on (band, bkey). At 10⁹-document
    * corpora the signature I/O is O(|indexA| + |indexB|) — the
    * alternative re-shingles/re-projects one whole corpus to probe it
    * against the other's index, O(corpus · signature cost), which is the
    * entire term persisting keys was built to delete (the same argument
    * as [[rebucketRows]]). Shuffle-hash join, never broadcast: both
    * sides are corpus-sized by definition (the Δ≪corpus broadcast shape
    * is [[probeJoin]]'s). Bucket fan-outs may differ between the two
    * indexes (bucket is derived from bkey and does not join); the hash
    * FAMILIES must match — the family wrappers verify both sidecars
    * before calling this. Emits distinct (aCol, bCol) id pairs; id
    * namespaces are the caller's contract (cross-corpus ids are
    * naturally disjoint). */
  def crossIndexCandidates(spark: SparkSession, pathA: String, pathB: String,
      idCol: String, aCol: String, bCol: String): DataFrame = {
    val a = spark.read.parquet(pathA)
      .select(col("band"), col("bkey"), col(idCol).as(aCol))
    val b = spark.read.parquet(pathB)
      .select(col("band"), col("bkey"), col(idCol).as(bCol))
    a.hint("shuffle_hash").join(b, Seq("band", "bkey"))
      .select(col(aCol), col(bCol))
      .distinct()
  }

  /** Per-bucket row/id/file counts + the bucket's share of the index —
    * the fragmentation signal for [[compactRows]] (every append lands
    * one new file per touched bucket; after thousands of ingest steps a
    * probe of one bucket opens thousands of files) and the skew signal
    * (degenerate signatures — empty docs, zero vectors — show as a hot
    * bucket). One scan of the key columns; payload-free. */
  def stats(spark: SparkSession, path: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = spark.read.parquet(path)
      // input_file_name() is non-deterministic and must be PROJECTED
      // before it can feed an aggregate
      .select(col("bucket"), col(idCol), input_file_name().as("__file"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(idCol)).as("n_docs"),
        countDistinct(col("__file")).as("n_files"))
    rows
      .withColumn("share_bp", (col("n_rows") * 10000L /
        sum(col("n_rows")).over(Window.partitionBy())).cast("long"))
      .orderBy(col("bucket"))
  }

  /** Compact a fragmented index's band rows into `destPath`: each
    * bucket's accreted small files are shuffled onto one task and
    * rewritten coalesced. Rows are `.distinct()`ed — the one legal
    * duplicate source is a torn ingest replay (a batch appended twice
    * before its marker landed), and (id, band) is unique within any
    * single append, so dedup removes exactly that residue. Sidecar
    * reinstall and marker copy-over are the caller's (they are
    * index-family-specific). destPath must not exist. */
  def compactRows(spark: SparkSession, srcPath: String, destPath: String,
      cols: Seq[String]): Unit = {
    spark.read.parquet(srcPath)
      .select(cols.map(col): _*)
      .distinct()
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("errorifexists").parquet(destPath)
  }

  /** One step of a streaming ingest novelty gate (the q56 shape),
    * generic over the index family: keep only the batch rows with no
    * exact-verified near-dup already kept, then accrete BOTH stores —
    * the kept-payload table (`keptDir`, what the verify join reads) and
    * the band index (`indexPath`). First call bootstraps both. Returns
    * the number of rows kept.
    *
    * Dedup is greedy-sequential (the production ingest contract): a
    * batch's rows are judged against everything kept BEFORE the batch,
    * never against each other — the kept set is a deterministic function
    * of batch order, and a dropped row can never shadow a later one
    * (only kept representatives are indexed).
    *
    * IDEMPOTENT per `batchId` (the foreachBatch replay contract —
    * Structured Streaming re-executes a micro-batch after a failure or
    * restart from checkpoint, so a two-store update that blindly appends
    * would double-count on replay):
    *  - a committed batch leaves an `_ingested/batch-<id>` marker inside
    *    the index dir, written LAST; a replay that finds it returns the
    *    recorded kept count without touching either store;
    *  - the novelty corpus explicitly EXCLUDES the batch's own ids
    *    (`kept ∖ batch` — the "kept BEFORE the batch" contract made
    *    literal), so recomputing the decision is correct even when a
    *    torn previous attempt already appended this batch somewhere;
    *  - the index append and the kept rows (an OVERWRITTEN per-batch
    *    partition `batch=<id>`) land concurrently, the marker strictly
    *    LAST — every torn combination replays safely. The only
    *    torn-replay residue is duplicate band rows in the index —
    *    harmless for novelty (candidates are `.distinct()`ed, and a
    *    same-batch candidate cannot exact-verify because its payload is
    *    not in the kept corpus) and removable by the family's compact.
    *    The kept table — the store the greedy semantics read — is exact.
    *
    * THE BATCH IS SIGNED ONCE (r07): its band rows are projected and
    * materialized a single time and reused by BOTH the novelty probe and
    * the index write — the probe-then-append flow previously ran the
    * family's signature projection (shingle+minhash / SRP) twice per
    * micro-batch, which at the documented "daily ingest of ΔN docs costs
    * O(ΔN) signature work" accounting was a silent 2×. Band rows are a
    * pure deterministic function of the payload, so the written rows are
    * identical to a fresh projection of the kept subset (q56's
    * index_consistent gate and both families' append-equivalence specs
    * pin exactly this identity end-to-end).
    *
    * Family-specific seams: `payloadCols` (the kept table's schema, id
    * first); `defaultBuckets` (fan-out for a fresh index) with
    * `sidecarBuckets` (fan-out recorded by an existing sidecar — appends
    * must sign at the INDEX's fan-out, not the parameter's);
    * `signRows(docs, buckets)` (the family's signature projection →
    * (id, band, bkey, bucket)); `installMeta(buckets)` (sidecar install,
    * bootstrap only, AFTER the data lands — the torn-write contract);
    * `verifyMeta()` (family check before an append); and
    * `novelFromRows(batch, keptBefore, batchBandRows)` → novel batch
    * rows (probe + exact verify + anti-join over the pre-signed rows,
    * e.g. [[LshIndex.novelDocsFromRows]] / [[SrpIndex.novelVecsFromRows]]). */
  def ingestNovel(spark: SparkSession, indexPath: String, keptDir: String,
      batch: DataFrame, batchId: Long, payloadCols: Seq[String],
      metaDir: String, defaultBuckets: Int, sidecarBuckets: () => Int,
      signRows: (DataFrame, Int) => DataFrame,
      installMeta: Int => Unit, verifyMeta: () => Unit,
      novelFromRows: (DataFrame, DataFrame, DataFrame) => DataFrame): Long = {
    val idCol = payloadCols.head
    val ixP = new org.apache.hadoop.fs.Path(indexPath)
    val fs = ixP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$indexPath/_ingested/batch-$batchId")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val recorded =
        try Some(in.readLong())
        catch { case _: java.io.EOFException => None } // torn marker
        finally in.close()
      recorded match {
        case Some(n) => return n
        case None =>
          // A marker that exists but carries no count is a crash between
          // its create and its writeLong — and the marker is written
          // AFTER both store writes, so the batch's kept partition is on
          // disk and authoritative. Recover the count from it and heal
          // the marker; without this, every replay of the batch would
          // die on the same EOF and wedge the ingest loop permanently.
          val n = spark.read.parquet(s"$keptDir/batch=$batchId").count()
          val out = fs.create(marker, true)
          try out.writeLong(n) finally out.close()
          return n
      }
    }
    val keptP = new org.apache.hadoop.fs.Path(keptDir)
    // Bootstrap is decided on a COMMITTED SIDECAR's presence, not the
    // dir's: the sidecar is written LAST by every family's build, so a
    // crash between bootstrap's band-row write and its sidecar commit
    // leaves the dir present but sidecar-less — dir-existence would then
    // route every replay down the append path, where readVerifiedMeta
    // throws forever (a permanent wedge). Two refinements over a bare
    // exists() check:
    //  - "committed" means part-files exist under the sidecar dir — a
    //    crash DURING the sidecar write leaves $metaDir/ holding only
    //    _temporary, which exists() would misread as an installed
    //    sidecar and wedge on the append path all the same;
    //  - a sidecar-less dir qualifies for the self-healing bootstrap
    //    OVERWRITE only when its content is recognizably a torn band
    //    index (bucket=… partition dirs / write temp litter). Anything
    //    else — a mistyped path pointing at some unrelated dataset —
    //    must refuse loudly, not be destroyed by the overwrite.
    val metaP = new org.apache.hadoop.fs.Path(s"$indexPath/$metaDir")
    val hasCommittedSidecar = fs.exists(metaP) &&
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$metaP/part-*")).nonEmpty
    val isBootstrap = !hasCommittedSidecar
    if (isBootstrap && fs.exists(ixP)) {
      val foreign = fs.listStatus(ixP).map(_.getPath.getName)
        .filterNot(n => n.startsWith("bucket=") || n == metaDir ||
          n == "_temporary" || n.startsWith("_SUCCESS") || n.startsWith("."))
      require(foreign.isEmpty,
        s"$indexPath exists without a committed $metaDir sidecar and holds " +
          s"non-band-index content (${foreign.take(3).mkString(", ")}…) — " +
          "refusing to overwrite; pass an empty/new path or a torn index dir")
    }
    // sign the batch ONCE at the effective fan-out (the existing
    // sidecar's on append — fan-out is an index property, not a call
    // parameter); materialized so the probe and the append read the
    // same physical rows without recomputing the projection
    val buckets = if (isBootstrap) defaultBuckets else sidecarBuckets()
    val bandRows = signRows(batch, buckets).localCheckpoint(true)
    val nv0 =
      if (isBootstrap) batch
      else {
        val keptBefore =
          if (fs.exists(keptP))
            spark.read.parquet(keptDir).select(payloadCols.map(col): _*)
              .join(batch.select(col(idCol)), Seq(idCol), "left_anti")
          else batch.select(payloadCols.map(col): _*).limit(0)
        novelFromRows(batch, keptBefore, bandRows)
      }
    // materialize BEFORE mutating either store: the novelty decision must
    // be taken against the pre-batch state, and the index append below
    // must not re-evaluate the probe over a half-updated kept table
    val nv = nv0.localCheckpoint(true)
    // index rows of the KEPT subset = the pre-signed batch rows filtered
    // to kept ids (identical to a fresh projection — determinism)
    val keptRows = bandRows.join(nv.select(col(idCol)), Seq(idCol))
    // the two store writes both read materialized blocks and are
    // independent of each other — overlap them (guide §2.6). The
    // replay contract is unchanged: the marker still lands strictly
    // LAST, so any torn combination of the two writes replays into an
    // overwritten kept partition plus (at worst) duplicate band rows —
    // the same harmless residue as the sequential order, analyzed in
    // the scaladoc above.
    // (kept table: one file per ingest step — one small parquet per
    // batch instead of one per task; per-batch overwrite = replay-safe)
    val keptWriteF = graft.spark.Par.overlapped(
      nv.coalesce(1).write.mode("overwrite").parquet(s"$keptDir/batch=$batchId"))
    try {
      if (isBootstrap) {
        writeRows(keptRows, indexPath, "overwrite")
        installMeta(buckets)
      } else {
        verifyMeta()
        writeRows(keptRows, indexPath, "append")
      }
    } catch { case e: Throwable =>
      // a failed index write must not leave the kept write ORPHANED:
      // the streaming replay of this batch would overwrite the same
      // batch=<id> partition while the orphan is still committing —
      // two jobs colliding on one output dir. Wait it out (suppressing
      // its own error so the index failure stays primary), THEN rethrow.
      graft.spark.Par.quietly(keptWriteF)
      throw e
    }
    keptWriteF()
    val n = nv.count()
    val out = fs.create(marker, true)
    try out.writeLong(n) finally out.close()
    n
  }

  /** Re-bucket an index's band rows into `destPath` at a NEW fan-out —
    * the capacity-growth half of the lifecycle (compaction is the
    * defragmentation half). Because the band KEY is stored and the
    * bucket is a pure function of it (`bkey & (N-1)`), growing the
    * fan-out recomputes one column and rewrites the layout: NO
    * re-shingling / re-projection of the corpus — O(index) work, not
    * O(corpus · signature cost), the entire point of persisting keys
    * rather than buckets alone. Rows are `.distinct()`ed in the same
    * pass (torn-replay residue removed, as in [[compactRows]]). The
    * sidecar reinstall (same family, new bucket count) and marker
    * copy-over are the caller's. destPath must not exist. */
  def rebucketRows(spark: SparkSession, srcPath: String, destPath: String,
      newBuckets: Int, idCol: String): Unit = {
    requirePow2(newBuckets)
    spark.read.parquet(srcPath)
      .select(col(idCol), col("band"), col("bkey"))
      .withColumn("bucket", bucketOf(col("bkey"), newBuckets))
      .distinct()
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("errorifexists").parquet(destPath)
  }

  /** Copy a replay-marker dir (e.g. `_ingested`) from one generation to
    * the next so a resumed ingest loop keeps its idempotency history
    * across compaction. No-op when absent. */
  def copyMarkers(spark: SparkSession, srcPath: String, destPath: String,
      markerDir: String): Unit = {
    val src = new org.apache.hadoop.fs.Path(s"$srcPath/$markerDir")
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(src))
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
        new org.apache.hadoop.fs.Path(s"$destPath/$markerDir"),
        false, spark.sparkContext.hadoopConfiguration)
    ()
  }
}

/** Access-ordered LRU of VERIFIED sidecar reads keyed by the sidecar
  * dir's on-disk identity (every data file's path, mtime and length) —
  * an ingest loop probes + appends the SAME index per batch, and each
  * verified read costs a parquet job + collect, pure fixed cost at any
  * corpus size. A rebuilt/overwritten sidecar changes its file status,
  * so stale entries can never be returned. Eviction is per-entry
  * (`removeEldestEntry`), never wholesale — the BloomProbeHelper rule;
  * 64 live indexes per JVM is far beyond any real ingest loop. */
private[pipeline] final class SidecarCache[M](maxEntries: Int = 64) {
  private val memo =
    new java.util.LinkedHashMap[Seq[(String, Long, Long)], M](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Seq[(String, Long, Long)], M]): Boolean =
        size() > maxEntries
    }

  /** The verified value for the sidecar at `dir`, loading (and caching)
    * via `load` on miss. `fs`/`dir` must point at the sidecar dir whose
    * part-files define the cache identity. */
  def getOrLoad(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path)(load: => M): M = {
    val key = fs.listStatus(dir).filter(_.getPath.getName.startsWith("part-"))
      .map(s => (s.getPath.toString, s.getModificationTime, s.getLen))
      .sortBy(_._1).toSeq
    memo.synchronized {
      val hit = memo.get(key)
      if (hit != null) return hit
    }
    val v = load
    memo.synchronized { memo.put(key, v); () }
    v
  }
}
