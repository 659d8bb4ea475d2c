package graft.pipeline

import graft.core.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Document fingerprinting by winnowing over a Rabin–Karp rolling hash
  * (Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for
  * Document Fingerprinting", SIGMOD 2003 — the MOSS scheme).
  *
  * Pipeline: normalize (keep ASCII alphanumerics, case-folded) →
  * k-gram polynomial rolling hashes (O(1) per position) → per hash a
  * Murmur3 fmix64 whitening (the raw polynomial hash is too structured
  * for fair min-selection) → winnow: in every window of `w` consecutive
  * k-gram hashes select the minimum (rightmost occurrence on ties),
  * record each selected position once → the fingerprint set is the
  * distinct selected hash values.
  *
  * Guarantee (SIGMOD 2003, Theorem in §3): two documents sharing a
  * contiguous run of ≥ w + k − 1 normalized characters share at least
  * one fingerprint; density converges to 2/(w+1) of k-gram positions.
  *
  * This is the rolling-hash fingerprint the reference crate's whole-value
  * hashing (/root/reference/src/km_bloom_filter.rs:272–285) cannot
  * express: the reference fingerprints a value as one opaque hash; this
  * operator fingerprints *substructure* so near-duplicates collide.
  *
  * Scale shape: fingerprints per doc are O(len·2/(w+1)); the candidate
  * join is inverted-index (explode → self-join on fingerprint), never
  * an n² product, with a document-frequency cap on hot fingerprints
  * (boilerplate spans shared by thousands of docs would otherwise
  * create quadratic pair blowups — same guard as the minhash band join).
  */
object Winnowing {

  /** Default gram size. The SIGMOD 2003 rule: pick k above the length of
    * idiomatic strings that recur across UNRELATED documents. k=8
    * (~1.5 English words) pairs most of a templated corpus — measured on
    * the sf0.1 documents table it marked 7.1M of 12.5M possible pairs as
    * candidates; k=16 (~3 words, noise threshold t=w+k−1=23 chars) cuts
    * that to the genuinely-near-dup set while still detecting any shared
    * run of ≥ 23 normalized chars. */
  final val DefaultK = 16

  /** Default window: guarantee threshold t = w + k − 1, density 2/(w+1). */
  final val DefaultW = 8

  /** Polynomial rolling-hash base: odd ⇒ invertible mod 2^64, so a
    * k-gram's hash depends on all k characters. */
  private final val Base = 1000003L

  /** Keep only ASCII alphanumerics, upper→lower by +32 (pure ASCII
    * arithmetic — no locale/Unicode case-folding, so the DuckDB mirror
    * `LOWER(REGEXP_REPLACE(text,'[^a-zA-Z0-9]','','g'))` is exact). */
  def normalize(s: String): Array[Char] = {
    val out = new Array[Char](s.length)
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') { out(n) = c; n += 1 }
      else if (c >= 'A' && c <= 'Z') { out(n) = (c + 32).toChar; n += 1 }
      i += 1
    }
    java.util.Arrays.copyOfRange(out, 0, n)
  }

  /** Whitened k-gram rolling hashes: h(i+1) = (h(i) − c_i·Base^{k−1})·Base
    * + c_{i+k}, wrapping u64, then fmix64 per emitted position. */
  def kgramHashes(cs: Array[Char], k: Int): Array[Long] = {
    require(k >= 1, "k-gram size must be >= 1")
    val n = cs.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    var pow = 1L
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    val out = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + cs(i); i += 1 }
    out(0) = Hashing.fmix64(h)
    i = 1
    while (i < n) {
      h = (h - cs(i - 1) * pow) * Base + cs(i + k - 1)
      out(i) = Hashing.fmix64(h)
      i += 1
    }
    out
  }

  /** Winnow: for each window of `w` consecutive k-gram hashes select the
    * minimum (unsigned; rightmost on ties), record each selected
    * *position* once. O(n) monotone deque: pushing i evicts back entries
    * with hash ≥ hash(i), so the front is always the rightmost minimum
    * of the live window. Shorter-than-w inputs yield the single overall
    * minimum (the degenerate one-window case). */
  def winnow(hashes: Array[Long], w: Int): Array[Long] = {
    require(w >= 1, "window size must be >= 1")
    val n = hashes.length
    if (n == 0) return Array.emptyLongArray
    val deque = new Array[Int](n) // indices, increasing position + strictly increasing hash
    var head = 0
    var tail = 0 // exclusive
    // selected positions are strictly increasing (the deque front index
    // never moves left), so append to a primitive buffer and sort+dedupe
    // once at the end — no per-selection boxing on the hot UDF path.
    // Worst case (strictly decreasing hashes) selects one NEW position
    // per window, so size n, not the 2/(w+1) expected density.
    val selected = new Array[Long](n)
    var nSel = 0
    var lastPos = -1
    var i = 0
    while (i < n) {
      while (tail > head &&
        java.lang.Long.compareUnsigned(hashes(deque(tail - 1)), hashes(i)) >= 0) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1 || i == n - 1) { // full window, or final partial window of a short doc
        val pos = deque(head)
        if (pos != lastPos) { selected(nSel) = hashes(pos); nSel += 1; lastPos = pos }
      }
      i += 1
    }
    val sorted = java.util.Arrays.copyOfRange(selected, 0, nSel)
    java.util.Arrays.sort(sorted)
    var o = 0
    var s = 0
    while (s < nSel) {
      if (o == 0 || sorted(s) != sorted(o - 1)) { sorted(o) = sorted(s); o += 1 }
      s += 1
    }
    java.util.Arrays.copyOfRange(sorted, 0, o)
  }

  /** Fingerprint set of a document: sorted distinct winnowed hashes.
    * Deterministic pure function of the text; empty iff the normalized
    * text has fewer than k characters. */
  def fingerprints(text: String, k: Int = DefaultK, w: Int = DefaultW): Array[Long] =
    winnow(kgramHashes(normalize(text), k), w)

  /** Number of k-gram positions (normalized length − k + 1, floored at
    * 0) — the denominator of the fingerprint-density diagnostic. */
  def kgramCount(text: String, k: Int = DefaultK): Int =
    math.max(0, normalize(text).length - k + 1)

  def fingerprintsUdf(k: Int = DefaultK, w: Int = DefaultW): UserDefinedFunction =
    udf((text: String) => if (text == null) Array.emptyLongArray else fingerprints(text, k, w))

  /** [[kgramCount]] as a codegen'd column (no UDF round-trip):
    * max(0, normalizedLen − (k − 1)). */
  def kgramCountCol(s: Column, k: Int = DefaultK): Column =
    greatest(lit(0), normalizedLenCol(s) - lit(k - 1))

  /** Candidate near-duplicate pairs (doc_a < doc_b) sharing ≥ 1 winnow
    * fingerprint. Inverted-index self-join on the fingerprint value —
    * the same scale shape as the minhash band join: explode is map-side,
    * the join shuffles on the 64-bit fingerprint, and fingerprints whose
    * document frequency exceeds `maxDf` are dropped before the self-join
    * (hot boilerplate guard; candidates lost this way are by definition
    * shared by > maxDf docs and are better handled by exact grouping). */
  def candidates(docs: DataFrame, k: Int = DefaultK, w: Int = DefaultW, maxDf: Long = 1000L): DataFrame =
    candidatesFromFps(
      docs.select(col("doc_id"), fingerprintsUdf(k, w)(col("text")).as("fps")), maxDf)

  /** Same join over a precomputed (doc_id, fps: array<long>) relation —
    * lets callers compute the fingerprint UDF once and share it with
    * density/coverage diagnostics (the UDF pass dominates on long docs).
    *
    * Sizing note (applies to every inverted-index pair join here and in
    * TextPipeline): shuffle partitions must track DATA VOLUME, not core
    * count — at 500k docs the band join measured 70s with partitions ==
    * cores (per-task join state spills) vs 4.8s with 4x that; set
    * spark.sql.adaptive.coalescePartitions.initialPartitionNum high and
    * let AQE coalesce down (see graft.tools.DedupBench, BENCH.md). */
  def candidatesFromFps(docFps: DataFrame, maxDf: Long = 1000L): DataFrame = {
    val fp = docFps.select(col("doc_id"), explode(col("fps")).as("fp"))
    val rare = fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2) // df=1 can't pair
      .select(col("fp"))
    // no broadcast hint on the allow-list join: at corpus scale the
    // distinct-fingerprint table is NOT broadcastable (O(total content));
    // AQE broadcasts it when it measures small, shuffles otherwise. The
    // self-join is sort-merge so the exploded relation is exchanged once
    // and reused on both sides.
    val pruned = fp.join(rare, "fp").hint("merge")
    pruned.as("a").join(pruned.as("b"), "fp")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** TELEMETRY for the hot-fingerprint cap: what [[candidatesFromFps]]
    * silently dropped. One row of FOUR columns —
    *   n_hot_fps              fingerprints with df > maxDf,
    *   n_hot_incidences       Σ df over them ((doc, hot-fp) pairs — a doc
    *                          touching 3 hot fps counts 3×),
    *   n_dropped_pair_slots   Σ df·(df−1)/2 (upper bound on candidate
    *                          pairs the cap suppressed; a pair sharing
    *                          both a hot and a rare fingerprint is still
    *                          found via the rare one),
    *   n_docs_touching_hot    DISTINCT docs touching any hot fp — "how
    *                          much of the corpus is boilerplate-affected".
    * Access columns BY NAME (the shape grew in round 3). Two passes over
    * `docFps` (the hot aggregate and the distinct-doc semi-join) — pass
    * a CACHED docFps, as the q30 gate already does. A 100 TB run should
    * log this next to its candidate count: large numbers mean boilerplate
    * spans are being excluded BY POLICY, not silently missed. */
  def dfCapStats(docFps: DataFrame, maxDf: Long = 1000L): DataFrame = {
    val incidences = docFps.select(col("doc_id"), explode(col("fps")).as("fp"))
    val hot = incidences
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
    val hotAgg = hot.agg(
      count(lit(1)).as("n_hot_fps"),
      // (doc, hot-fp) INCIDENCES — a doc touching 3 hot fps counts 3×
      coalesce(sum(col("df")), lit(0L)).as("n_hot_incidences"),
      // DIV keeps the arithmetic in longs (the `/` operator widens to
      // double, which loses exactness past 2^53 pair slots)
      coalesce(sum(expr("df * (df - 1) DIV 2")), lit(0L)).as("n_dropped_pair_slots"))
    // DISTINCT docs that touch any hot fingerprint — the "how much of my
    // corpus is boilerplate-affected" number a 100 TB run actually wants
    // (hot fps are rare by definition of the cap: broadcast them)
    val docsTouching = incidences
      .join(broadcast(hot.select(col("fp"))), Seq("fp"), "left_semi")
      .agg(countDistinct(col("doc_id")).as("n_docs_touching_hot"))
    hotAgg.crossJoin(docsTouching)
  }

  /** Doc pairs sharing at least one 3-word shingle whose normalized
    * length is ≥ w + k − 1 characters — every such pair shares a
    * contiguous normalized run of that length (a shingle is contiguous
    * text in both docs), so the SIGMOD 2003 guarantee says `candidates`
    * MUST cover it. Used as the self-validating coverage gate in q30. */
  private final val AsciiAlnum =
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  /** Normalized length as a codegen'd column: total chars minus the
    * chars left after translate() strips the 62 ASCII alphanumerics —
    * equals LENGTH(REGEXP_REPLACE(s,'[^a-zA-Z0-9]','','g')) without the
    * per-value regex (measured ~5x cheaper on the shingle relation). */
  def normalizedLenCol(s: Column): Column =
    length(s) - length(translate(s, AsciiAlnum, ""))

  def guaranteedPairs(docs: DataFrame, k: Int = DefaultK, w: Int = DefaultW): DataFrame = {
    val minLen = w + k - 1
    val longSh = TextPipeline.docShingles(docs)
      .filter(normalizedLenCol(col("sh")) >= minLen)
    val h = longSh.hint("merge")
    h.as("a").join(h.as("b"), "sh")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }
}
