package graft

import graft.spark.{functions => gf, Transcripts}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): prints ONE JSON line with
  *   - per-query wall seconds for every SparkEntry query at SPARK_GRAFT_CPUS
  *   - the north-rule scaling evidence: the flagship sketch-build job run
  *     at local[N/4] and local[N] on the SAME pre-partitioned input,
  *     reported as turns/sec at both + efficiency = tpHi / (4 · tpLo).
  *     (No real cluster in the sandbox — two parallelism levels stand in
  *     for N vs 4N executors, per driver instruction; see BENCH.md.)
  *
  * BUDGETED (round 6): the round-5 official artifact was rc=124 — the
  * driver's outer timeout killed the process mid-ladder and NO JSON was
  * emitted, because the protocol (3 query rounds × 57 queries + unbounded
  * >40%-spread re-runs + a 5-round ladder with per-round warm-ups) had no
  * notion of a deadline. The protocol is now phased against a wall-clock
  * budget (`SPARK_GRAFT_BENCH_BUDGET_SECS`, default 660 s — sized well
  * under any plausible outer timeout, sbt/JVM startup included):
  *   guaranteed phases — one timed round of every query, the bench-input
  *     materialization, one full ladder round (with warm-ups + hw burns),
  *     and the single-core kernel calibration;
  *   budget-funded extras, in noise-robustness order — query rounds 2–3
  *     and ladder rounds 2–3 temporally interleaved, then outlier re-runs
  *     CAPPED at the 8 widest-spread queries × 1 run (round 5's uncapped
  *     rule re-ran 43 queries × 2), then the udaf-path comparison point.
  * Every extra run is guarded per-item (`remaining > reserve + 2×` the
  * item's own fastest observed time), min-of-N is preserved where rounds
  * complete, and the JSON line ALWAYS prints, carrying `query_runs` /
  * `ladder_rounds` / `elapsed_secs` / `budget_secs` so the artifact is
  * honest about how much protocol the window funded.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // library-recommended: partition shuffles by data volume, not core
      // count (AQE coalesces down on small inputs; see BENCH.md's 70s vs
      // 4.8s band-join measurement). The ladder section disables AQE and
      // is unaffected.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "128")
      // shuffle spill to tmpfs: local mode has no cluster network, and
      // rotating-disk I/O would serialize the scaling measurement
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The scaling workload: the SHARDED sketch build (SURVEY §7.5 — the
    * only shape that works at 10^12 turns, where one filter would be
    * petabytes). Rows are co-located by shard first, so every shard's
    * buffer is allocated exactly ONCE cluster-wide and final merges are
    * spread across all reducers — a naive global agg allocates a full-size
    * buffer per partition and funnels every merge into one reducer, which
    * inverts scaling. Shard count is fixed (independent of parallelism)
    * for fairness across the two measured levels. Returns elapsed secs. */
  private val NumShards = 256

  /** Native-expression build (production path): raw columns shuffle, the
    * aggregate hashes values straight from the InternalRow. */
  private def sketchBuild(spark: SparkSession, inputPath: String, capacity: Long): Double = {
    import graft.spark.catalyst._
    val capPerShard = math.max(1000L, capacity / NumShards)
    val t = spark.read.parquet(inputPath)
      .select(col("conv_id"), col("turn_idx"), col("tool"),
        pmod(xxhash64(col("conv_id")), lit(NumShards)).as("shard"))
      .repartition(col("shard"))
    val t0 = System.nanoTime()
    t.groupBy(col("shard")).agg(
        bloomAggNative(capPerShard, 0.001)(col("conv_id"), col("turn_idx")).as("bloom"),
        hllAggNative(col("conv_id")).as("hll"),
        cmsAggNative(0.001, 0.01)(col("tool")).as("cms"))
      // force full evaluation without shipping 256 blobs to the driver
      .select(sum(length(col("bloom"))) + sum(length(col("hll"))) + sum(length(col("cms"))))
      .collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** udaf/Aggregator path (kept for comparison in the bench output). */
  private def sketchBuildUdaf(spark: SparkSession, inputPath: String, capacity: Long): Double = {
    val capPerShard = math.max(1000L, capacity / NumShards)
    val t = spark.read.parquet(inputPath)
      .select(
        pmod(xxhash64(col("conv_id")), lit(NumShards)).as("shard"),
        gf.sketchKey(col("conv_id"), col("turn_idx")).as("turn_key"),
        gf.sketchKey(col("conv_id")).as("conv_key"),
        gf.sketchKey(col("tool")).as("tool_key"))
      .repartition(col("shard"))
    val t0 = System.nanoTime()
    t.groupBy(col("shard")).agg(
        gf.bloomAgg(capPerShard, 0.001)(col("turn_key")).as("bloom"),
        gf.hllAgg(col("conv_key")).as("hll"),
        gf.cmsAgg(0.001, 0.01)(col("tool_key")).as("cms"))
      .select(sum(length(col("bloom"))) + sum(length(col("hll"))) + sum(length(col("cms"))))
      .collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Raw-JVM arithmetic burn at `n` threads — calibrates how much CPU
    * scaling THIS BOX can deliver at all (the sandbox VM advertises 32
    * CPUs but sustains ~18 effective cores under load), so the job's
    * efficiency can be read against the hardware ceiling. */
  private def burnSecs(n: Int): Double = {
    val t0 = System.nanoTime()
    val threads = (0 until n).map { _ =>
      new Thread(() => {
        var x = 0L
        var j = 0L
        while (j < 1500000000L) { x += j * j; j += 1 }
        if (x == 42L) print("")
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - wall0) / 1e9
    // default sized from evidence: round 4's official run (~11 min of
    // work + sbt startup) fit the driver's window; round 5's ~18 min did
    // not. 660 s of work + ~40 s sbt ≈ 11.7 min total — funds a full
    // second query/ladder round (the round-6 540 s pilot finished at
    // 519.7 s with only round 1 complete) while keeping ≥3 min of margin
    // under the tightest window any round has survived.
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SECS", "660").toDouble
    // teardown + print headroom; nothing new starts inside the reserve
    val reserve = 20.0
    def remaining: Double = budget - elapsed

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpusHi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Target ~30M ladder turns REGARDLESS of the input SF: big enough
    // that the ~0.8s fixed per-job cost (planning + stage launch + final
    // collect) stays well under the parallel work at every level — at
    // 20M it alone capped 4→16 efficiency near 0.81 (t(n) = c + W/n with
    // c ≈ 0.8 s measured), and a fixed expansion factor run against a
    // smaller SF dir (3M turns at sf0.01) makes the fixed cost DOMINATE
    // and fakes a scaling failure. The expansion is derived from the
    // actual input count; env overrides stay available.
    val targetTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "30000000").toLong
    // measured parallelism levels: two N-vs-4N pairs (4→16, 8→32)
    val levels = Seq(4, 8, 16, 32).filter(_ <= cpusHi) match {
      case ls if ls.size >= 2 => ls
      case _ => Seq(math.max(1, cpusHi / 4), cpusHi)
    }

    // ---- phase 1 (guaranteed): one timed round of every query at cpusHi
    // on the raw sf dir. Extra rounds are budget-funded below; rounds are
    // INTERLEAVED across queries (q1..qN, q1..qN, ...) so an ambient load
    // spike on this shared VM hits every query equally instead of
    // poisoning whichever query it lands on. The emitted JSON carries the
    // min per query and the completed round count as "query_runs".
    val maxQueryRounds = 3
    val sortedQueries = SparkEntry.queries.toSeq.sortBy(_._1)
    val querySamples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val gcSamples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    var spark = session(cpusHi)
    def timeQuery(name: String, fn: (SparkSession, String) => DataFrame): Unit = {
      // each run guarded separately: one transient failure must not
      // discard another run's valid timing
      val secs = try {
        val g0 = gcMillis()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        gcSamples(name) ::= (gcMillis() - g0) / 1e3
        s
      } catch { case _: Throwable => -1.0 }
      if (secs >= 0) querySamples(name) ::= secs
    }
    // a query's cost guess for deadline guards: its own fastest observed
    // run, or a conservative default before it has one
    def qEst(name: String): Double = {
      val s = querySamples(name)
      if (s.isEmpty) 15.0 else s.min
    }
    // the guaranteed phases after the query suite (input materialization,
    // ladder round 1 with warm-ups, calibration) need ~200 s in a quiet
    // window and gate on remaining > reserve + 280 (all-or-nothing rule
    // below); round 1 stops early enough to leave them room — the north
    // rule needs the scaling pair more than it needs the last few
    // queries of a starved round
    val ladderReserve = 310.0
    var queryRoundsDone = 0
    var aborted = false
    for ((name, fn) <- sortedQueries) {
      if (!aborted && remaining > reserve + ladderReserve + 1.5 * qEst(name))
        timeQuery(name, fn)
      else aborted = true
    }
    if (!aborted) queryRoundsDone = 1
    spark.stop()

    // ---- phase 2 (guaranteed, budget permitting): materialize the
    // expanded bench input once (64 files so every parallelism level gets
    // full scan parallelism). ~30–60 s — skipped (with the whole ladder)
    // only when the window is so starved that attempting it would blow
    // straight through the budget.
    val benchInput = "/tmp/graft_bench_input.parquet"
    // ALL-OR-NOTHING: materializing the 30M-turn input only pays off if
    // at least the 4→16 pair can still run after it (~60 s quiet
    // materialization + ~150 s for two warmed levels; a loaded window
    // multiplies both). A window that materialized and then had no
    // budget left for any level burned minutes for zero scaling
    // evidence — observed once under a neighbor burst: 340 s of write,
    // ladder_rounds 0, and a 189 s budget overshoot.
    val ladderFeasible = remaining > reserve + 280
    var turns = 0L
    if (ladderFeasible) {
      spark = session(cpusHi)
      val base = Transcripts.load(spark, sfDir)
      val baseTurns = base.count()
      val expand = sys.env.get("SPARK_GRAFT_BENCH_EXPAND").map(_.toInt)
        .getOrElse(math.max(1, math.ceil(targetTurns.toDouble / baseTurns).toInt))
      turns = baseTurns * expand
      base.crossJoin(spark.range(0, expand).toDF("rep"))
        .withColumn("conv_id", concat(col("conv_id"), lit("r"), col("rep")))
        .drop("rep")
        .repartition(64)
        .write.mode("overwrite").parquet(benchInput)
      spark.stop()
    }

    // ---- phase 3 (guaranteed): ladder round 1 — identical job + input
    // per level, warm-up (JIT + codegen cache, both JVM-wide so later
    // rounds skip it) and the hw-ceiling burn INTERLEAVED with the job it
    // normalizes (ambient load varies minute-to-minute; a ceiling measured
    // in a separate window can make eff_over_hw lie in either direction).
    val samples = scala.collection.mutable.Map.empty[Int, List[Double]]
      .withDefaultValue(Nil)
    val burnSamples = scala.collection.mutable.Map.empty[Int, List[Double]]
      .withDefaultValue(Nil)
    def lEst(cpus: Int): Double = {
      val s = samples(cpus)
      if (s.isEmpty) 20.0 else s.min
    }
    def ladderRound(first: Boolean): Boolean = {
      var complete = true
      // round 1 runs the north-rule pair FIRST (4, 16) so a mid-round
      // budget cut still leaves a reportable 4→16 efficiency instead of
      // a useless lone level
      val order =
        if (first) Seq(4, 16, 8, 32).filter(levels.contains) else levels
      for (cpus <- order) {
        val need = (if (first) 2.5 else 1.5) * lEst(cpus) + 2.0
        if (remaining > reserve + need) {
          spark = session(cpus)
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          if (first) sketchBuild(spark, benchInput, turns) // warm-up
          samples(cpus) ::= sketchBuild(spark, benchInput, turns)
          spark.stop()
          burnSamples(cpus) ::= burnSecs(cpus)
        } else complete = false
      }
      complete
    }
    var ladderRoundsDone =
      if (ladderFeasible && ladderRound(first = true)) 1 else 0

    // ---- phase 4 (guaranteed, cheap ~8 s): single-thread burn +
    // single-core kernel baseline. The reference crate is single-threaded
    // by construction (&mut self), so one core is its ceiling — report the
    // same 3-sketch per-row work as a pure in-memory loop for context.
    if (remaining > 10)
      burnSamples(1) = (1 to 2).map(_ => burnSecs(1)).toList
    val kernelRps = if (remaining <= 5) -1.0 else {
      val rows = 5000000
      def pass(): Double = {
        val bloom = graft.core.KMBloomSketch(rows.toLong, 0.001)
        val hll = graft.core.HLLSketch()
        val cms = graft.core.CMSSketch(0.001, 0.01)
        val t0 = System.nanoTime()
        var i = 0
        while (i < rows) {
          val h1 = graft.core.Hashing.xxHash64Long(i.toLong, 0L)
          val h2 = graft.core.Hashing.murmur3_64Long(i.toLong, 0L)
          bloom.insertHashes(h1, h2)
          hll.updateHash(h1)
          cms.updateHash(h1)
          i += 1
        }
        rows / ((System.nanoTime() - t0) / 1e9)
      }
      pass() // warm-up
      pass()
    }

    // ---- phase 5 (budget-funded extras, noise-robustness order):
    // query rounds 2..3 and ladder rounds 2..3 temporally interleaved —
    // min-of-N with the rounds spread across the window is the protocol
    // that absorbed every previous round's neighbor-load bursts.
    spark = session(cpusHi)
    def queryRound(): Boolean = {
      var complete = true
      for ((name, fn) <- sortedQueries) {
        if (remaining > reserve + 1.5 * qEst(name)) timeQuery(name, fn)
        else complete = false
      }
      complete
    }
    // laps are attempted regardless of whether round 1 COMPLETED — a
    // starved phase 1 (queryRoundsDone=0) must not permanently disable
    // retries when the ladder left budget on the table; queryRoundsDone
    // counts complete rounds only.
    for (lap <- 2 to maxQueryRounds) {
      if (remaining > reserve + 30) {
        if (queryRound()) queryRoundsDone += 1
        if (ladderFeasible && ladderRoundsDone == lap - 1 && remaining > reserve + 30) {
          spark.stop()
          if (ladderRound(first = false)) ladderRoundsDone = lap
          spark = session(cpusHi)
        }
      }
    }
    // outlier re-runs, CAPPED: the 8 widest-spread queries get ONE more
    // run each (a re-run can only lower a query's reported min). Round
    // 5's uncapped >40%-spread rule re-ran 43 queries × 2 in a noisy
    // window and blew the driver's outer timeout.
    val outlierSpread = 0.4
    val requeried =
      if (queryRoundsDone < 2) Seq.empty
      else sortedQueries.filter { case (name, _) =>
        val s = querySamples(name)
        s.size >= 2 && (s.max - s.min) / math.max(s.min, 1e-9) > outlierSpread
      }.sortBy { case (name, _) =>
        val s = querySamples(name)
        -(s.max - s.min) / math.max(s.min, 1e-9)
      }.take(8)
    // the emitted "requeried" list must name the re-runs that actually
    // EXECUTED, not the candidates — the artifact's honesty contract
    val rerun = scala.collection.mutable.ListBuffer.empty[String]
    for ((name, fn) <- requeried)
      if (remaining > reserve + 1.5 * qEst(name)) { timeQuery(name, fn); rerun += name }
    // one comparison point: Aggregator/udaf path at max parallelism
    val udafSecs =
      if (ladderFeasible && remaining > reserve + 45) {
        sketchBuildUdaf(spark, benchInput, turns) // warm-up
        (1 to 2).map(_ => sketchBuildUdaf(spark, benchInput, turns)).min
      } else -1.0
    spark.stop()

    // ---- emit. Every aggregate below tolerates missing samples (a level
    // the budget never reached reports -1 and its eff pair is omitted).
    val queryTimes = sortedQueries.map { case (name, _) =>
      name -> (if (querySamples(name).isEmpty) -1.0 else querySamples(name).min)
    }
    // GC seconds OF THE FASTEST RUN per query — the diagnosis channel for
    // artifact-window drift: a min run that is 2× slower than last round
    // WITH proportional GC time points at memory pressure/neighbor load,
    // one without GC points at the code.
    val queryGc = sortedQueries.map { case (name, _) =>
      val pairs = querySamples(name).zip(gcSamples(name))
      name -> (if (pairs.isEmpty) -1.0 else pairs.minBy(_._1)._2)
    }
    val measuredLevels = levels.filter(samples(_).nonEmpty)
    val jobSecs = measuredLevels.map(c => c -> samples(c).min).toMap
    val burn = (measuredLevels :+ 1).filter(burnSamples(_).nonEmpty)
      .map(c => c -> burnSamples(c).min).toMap

    def eff(lo: Int, hi: Int, secs: Map[Int, Double]): Double =
      (turns / secs(hi)) / ((hi.toDouble / lo) * (turns / secs(lo)))
    def hwEff(lo: Int, hi: Int): Double =
      // burn does fixed work per thread: speedup(n) = n·t1/tn
      (hi * burn(1) / burn(hi)) / ((hi.toDouble / lo) * (lo * burn(1) / burn(lo)))

    val effPairs = Seq((4, 16), (8, 32)).filter { case (lo, hi) =>
      jobSecs.contains(lo) && jobSecs.contains(hi) &&
        burn.contains(lo) && burn.contains(hi) && burn.contains(1) }
    // eff_over_hw is FIRST-CLASS (not prose): job efficiency divided by
    // what raw arithmetic scales to on this box at the same pair — the
    // north-rule ≥0.8 claim should be read against this where the VM
    // itself stops scaling (the 8→32 pair on this shared VM).
    val pairs = effPairs.map { case (lo, hi) =>
      val e = eff(lo, hi, jobSecs)
      val hw = hwEff(lo, hi)
      f""""eff_${lo}_to_$hi":$e%.3f,"hw_ceiling_${lo}_to_$hi":$hw%.3f""" +
        f""","eff_over_hw_${lo}_to_$hi":${e / hw}%.3f"""
    }.mkString(",")
    val levelJson = measuredLevels.map { c =>
      f""""local_$c":{"secs":${jobSecs(c)}%.3f,"turns_per_sec":${turns / jobSecs(c)}%.0f}"""
    }.mkString(",")
    val bestEff =
      if (effPairs.isEmpty) -1.0
      else effPairs.map { case (lo, hi) => eff(lo, hi, jobSecs) }.max

    val total = queryTimes.map(_._2).filter(_ > 0).sum
    val qs = queryTimes.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val qgc = queryGc.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val requeriedJson = rerun.map("\"" + _ + "\"").mkString("[", ",", "]")
    val scaling = Seq(
      s""""turns":$turns""",
      levelJson,
      pairs,
      f""""scaling_efficiency":$bestEff%.3f""",
      s""""ladder_rounds":$ladderRoundsDone""",
      f""""udaf_path_secs_at_$cpusHi":$udafSecs%.3f""",
      f""""single_core_kernel_rows_per_sec":$kernelRps%.0f""",
      """"note":"N-to-4N parallelism on one shared VM; hw_ceiling = what raw arithmetic scales to on this box""""
    ).filter(_.nonEmpty).mkString("{", ",", "}")
    println(
      f"""{"metric":"sketch-build throughput + query suite","value":$total%.3f,"unit":"sec","query_runs":$queryRoundsDone,"queries":$qs,"query_gc_secs":$qgc,"requeried":$requeriedJson,"budget_secs":$budget%.0f,"elapsed_secs":$elapsed%.1f,"sf":"$sfDir","scaling":$scaling}""")
  }
}
