package graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, GroupBy, Joins, Margins, Pq, Reshape, RollingOps, Sampling, SelectionOps, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main — mirrors the reference harness's op set
  * (BASELINE.md: grouped sum/mean/min/max/count; rolling
  * sum/mean/min/max window=50; cumsum/cummax; crosstab), sec/op on
  * `SPARK_GRAFT_SF_DIR`. Inputs are cached (the reference times ops
  * over in-memory arrays, post-JIT), each op runs twice and the warm
  * time is reported; results are forced through the noop sink so
  * column pruning cannot elide the measured work.
  */
object Bench {

  /** Dispatch (round-10 verdict item 1 — the official recording is
    * the ONLY artifact that kept shipping ghost regressions, three
    * rounds running, because all six groups shared one JVM and one
    * machine window):
    *
    *   - `SPARK_GRAFT_GROUPS` set → [[record]] measures just those
    *     groups in THIS JVM (the isolation/reproduction knob, and the
    *     shape the orchestrator's children run).
    *   - unset (the official protocol) → [[orchestrated]] runs every
    *     group in its OWN fresh JVM, sequentially, each launch gated
    *     on machine idleness and each result gated on the child's
    *     canary + per-row spread flags, with polluted groups retried
    *     instead of recorded. `SPARK_GRAFT_ORCHESTRATE=false` forces
    *     the legacy one-process full recording for A/B comparison.
    *   - `SPARK_GRAFT_OPS` (comma list of row names) restricts a
    *     group run to just those rows — the per-ROW adjudication knob
    *     (round 12: sampling one suspect row previously cost a full
    *     group run per fresh-JVM sample). Adjudication-only, never an
    *     official artifact: the headline total and the warm universe
    *     change under filtering.
    */
  def main(args: Array[String]): Unit = {
    if (sys.env.get("SPARK_GRAFT_GROUPS").isEmpty &&
        sys.env.getOrElse("SPARK_GRAFT_ORCHESTRATE", "true") != "false")
      orchestrated()
    else record()
  }

  private def record(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // knob for A/B runs; measured ~equal on/off at this scale, so the
    // scale-correct default (on) stands
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // tz-less parquet timestamps (timestamp[us]) read as TIMESTAMP
      // (LTZ, UTC session) not TIMESTAMP_NTZ: matches the DuckDB
      // oracle's naive-as-UTC reading and keeps unix_micros legal
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- host fingerprint (round-12 verdict item 7) ----
    // r10-r12 cross-round adjudications leaned on ad-hoc probes
    // (single-thread canary ratios, parallel efficiency, disk
    // bandwidth) reconstructed forensically per round. These fixed
    // synthetic probes land in every artifact so host comparisons are
    // mechanical manifest reads:
    //   st_canary — seconds for a fixed single-thread integer loop
    //   par_eff32 — single-thread time / 32-way concurrent time of the
    //               same per-thread workload (1.0 = perfect scaling;
    //               r12's host measured ~0.67)
    //   mem_gbps  — 8-thread streaming-read bandwidth over a 512 MB
    //               heap array (the dimension whose saturation
    //               inflated r12's x30 rows 2-4.5x)
    //   disk_mbps — 128 MB fsync'd sequential write to java.io.tmpdir
    // Probes run FIRST, before any Spark fixture, so they read the
    // host, not this JVM under its own load (~4 s total).
    val host: Map[String, Double] = {
      def work(iters: Long): Long = {
        var x = 88172645463325252L; var i = 0L
        while (i < iters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
        x
      }
      def timeIt(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val sink = new java.util.concurrent.atomic.AtomicLong()
      val iters = 200000000L
      sink.addAndGet(work(iters / 10)) // JIT warm
      val st = (1 to 3).map(_ => timeIt(sink.addAndGet(work(iters)))).min
      val tPar = timeIt {
        val ts = (1 to 32).map(_ =>
          new Thread(() => { sink.addAndGet(work(iters)); () }))
        ts.foreach(_.start()); ts.foreach(_.join())
      }
      val memGbps = {
        val arr = new Array[Long](64 << 20) // 512 MB
        java.util.Arrays.fill(arr, 3L)
        val chunk = arr.length / 8
        val passes = 4
        val t = timeIt {
          val ts = (0 until 8).map(k => new Thread(() => {
            var p = 0; var s = 0L
            while (p < passes) {
              var i = k * chunk; val hi = (k + 1) * chunk
              while (i < hi) { s += arr(i); i += 1 }
              p += 1
            }
            sink.addAndGet(s); ()
          }))
          ts.foreach(_.start()); ts.foreach(_.join())
        }
        arr.length.toDouble * 8 * passes / t / 1e9
      }
      val diskMbps = try {
        val f = java.io.File.createTempFile("graft-disk-", ".probe")
        val buf = new Array[Byte](8 << 20)
        val t = timeIt {
          val os = new java.io.FileOutputStream(f)
          try { (1 to 16).foreach(_ => os.write(buf)); os.getFD.sync() }
          finally os.close()
        }
        f.delete()
        128.0 / t
      } catch { case _: Exception => -1.0 }
      // sched_lat_ms — median latency of a trivial 32-task job (15
      // runs, first 3 discarded as scheduler/JIT warm): the per-job
      // dispatch cost that a many-small-stages shape is bound on,
      // invisible to the four probes above. Added by the round-14
      // fuzzy_join-control adjudication: the row (31 jobs of <= 0.6 s
      // over 20 k rows) read 2.8–4.7 s across healthy AND volatile
      // fingerprint classes on bytecode identical to the r11/r12 era
      // that read 1.4–1.6 s — the discriminating dimension was never
      // in the fingerprint. Runs last (after the CPU/mem/disk probes,
      // still before any fixture); ~0.5 s.
      // (15 full warm jobs first: in a cold JVM the scheduler path's
      // own JIT dominates the first dozen jobs — a 3-job discard read
      // 116 ms where the steady state is ~25 ms)
      val schedLatMs = try {
        def lat(): Double = {
          val t0 = System.nanoTime()
          spark.sparkContext.parallelize(0 until 32, 32).count()
          (System.nanoTime() - t0) / 1e9
        }
        (1 to 15).foreach(_ => lat())
        val ts = (1 to 15).map(_ => lat()).sorted
        ts(ts.size / 2) * 1000
      } catch { case _: Exception => -1.0 }
      Map("st_canary" -> st, "par_eff32" -> st / math.max(tPar, 1e-9),
        "mem_gbps" -> memGbps, "disk_mbps" -> diskMbps,
        "sched_lat_ms" -> schedLatMs)
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").persist()
    val ev = spark.read.parquet(s"$sfDir/events.parquet").persist()
    // integral time axis for bucket ops: long-nanos events stay raw
    // (6h in nanos), timestamp events go through unix_micros (6h in
    // micros) — the eventsUs/PlanAudit branch
    def tsIntOf(d: DataFrame): Column = d.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => unix_micros(col("ts"))
    }
    def sixHoursOf(d: DataFrame): Long = d.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => 21600000000000L
      case _ => 21600000000L
    }
    val orders = spark.read.parquet(s"$sfDir/orders.parquet").persist()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").persist()
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").persist()
    li.count(); ev.count(); orders.count(); docs.count(); embs.count()

    // the reference's headline lever is GroupBy reuse ("the majority
    // of run-time ... is in the factorization step"): pre-partition by
    // the keys once and persist, so timed ops skip the shuffle
    val liGb = new GroupBy(li, Seq(col("l_returnflag"), col("l_linestatus"))).persisted
    val evOps = new RollingOps(new GroupBy(ev, Seq(col("user_id"))).persisted)
    val nUsers = ev.agg(max(col("user_id"))).head().getLong(0) + 1

    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // ---- storage/spill audit (round-14 verdict item 3) ----
    // The r14 driver window read 8-12x "regressions" on untouched
    // skew/sort rows; the hypothesized mechanism was block-manager
    // residue (per-invocation localCheckpoint blocks from earlier
    // groups) shrinking execution memory exactly when 32 concurrent
    // sorts want buffers. Every row now records (a) the resident
    // block-manager bytes IMMEDIATELY BEFORE its timed samples and
    // (b) the spill its samples incurred — so a residue-vs-engine
    // adjudication is a manifest read, not a forensic reconstruction.
    // Spill deltas ride the async listener bus; jobs are blocking so
    // the counts are complete by the time the row's last sample
    // returns (same-thread actions), modulo a final-task race that is
    // noise at audit granularity.
    val spillMemB = new java.util.concurrent.atomic.AtomicLong()
    val spillDiskB = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            spillMemB.addAndGet(m.memoryBytesSpilled)
            spillDiskB.addAndGet(m.diskBytesSpilled)
          }
        }
      })
    def storageMb(): (Double, Double) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.memSize).sum / 1048576.0,
        infos.map(_.diskSize).sum / 1048576.0)
    }
    // name -> (storage MB pre (mem, disk), spill MB over samples (mem, disk))
    final case class Audit(storageMemMb: Double, storageDiskMb: Double,
      spillMemMb: Double, spillDiskMb: Double)
    val audits = scala.collection.mutable.LinkedHashMap[String, Audit]()
    def audited[T](name: String)(body: => T): T = {
      val (sm, sd) = storageMb()
      val (m0, d0) = (spillMemB.get(), spillDiskB.get())
      val r = body
      audits(name) = Audit(sm, sd,
        (spillMemB.get() - m0) / 1048576.0,
        (spillDiskB.get() - d0) / 1048576.0)
      r
    }
    // residue drain between groups: dead fixture/checkpoint blocks
    // release via the ASYNC ContextCleaner only after their RDDs are
    // GC'd — without a collection point, one group's blocks survive
    // into the next group's measurement window (the exact mechanism
    // suspected in the r14 32-core skew-row collapse). An explicit GC
    // at each group boundary makes "no group measures under another's
    // residue" (the round-5 design intent) actually hold for
    // checkpoint blocks, not just explicit unpersists.
    def drainResidue(): Unit = {
      System.gc()
      Thread.sleep(300)
    }

    // SPARK_GRAFT_EXPLAIN_DIR (diagnostic, unset in official runs):
    // write each measured row's `explain("formatted")` to
    // <dir>/<row>.txt before its warm pass — the plan evidence the
    // optimization rounds commit (plans/r14/). Reuses the exact
    // builder the timing loop forces, so the committed plan IS the
    // measured plan; explain never executes the query, so timings are
    // unaffected (and the knob stays off in official recordings).
    val explainDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    def dumpPlan(name: String, df: DataFrame): Unit = explainDir.foreach { d =>
      try {
        val dir = new java.io.File(d); dir.mkdirs()
        val w = new java.io.PrintWriter(new java.io.File(dir, s"$name.txt"))
        try w.write(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        finally w.close()
      } catch { case e: Exception =>
        System.err.println(s"[bench] explain dump failed for $name: $e") }
    }

    // ---- self-diagnosing measurement (VERDICT r6 item 1) ----
    // Round 6's official recording was polluted by external process
    // interference spanning its first two secondary groups, and
    // min/median-only output could not show it — three other artifacts
    // had to be cross-referenced. Every row now carries its RAW
    // samples, each group carries a 1-minute loadavg sentinel taken
    // immediately before measurement (interference shows up as a
    // sentinel far above this JVM's own core budget), and any row
    // whose samples span >1.5x is re-measured (two extra samples,
    // median of all) and flagged if the spread persists — so a
    // polluted recording diagnoses itself instead of masquerading as
    // the round's numbers.
    final case class Meas(name: String, value: Double, samples: Seq[Double],
      flagged: Boolean)
    // suspect = relative spread >1.5x AND absolute spread >0.2s: light
    // rows (~0.1s) jitter past 1.5x on JIT/GC residue alone, and their
    // min already rejects that one-sided noise — the absolute floor
    // keeps re-measurement focused on rows where a burst could
    // actually move the recorded number. With 3+ samples the check is
    // ONE-OUTLIER-TOLERANT: a single high sample (first-call warm
    // residue, one GC pause) cannot move a min- or median-based value,
    // so it must not flag the row — real interference spans samples
    // (r8's polluted skew row read [3.6, 24.6, 29.9, 35.9, 25.1]:
    // still suspect after dropping its worst). 2-sample rows keep the
    // plain check so they re-measure and the extended set decides.
    def spread1(ts: Seq[Double]): Boolean =
      ts.max / math.max(ts.min, 1e-9) > SpreadRel && ts.max - ts.min > SpreadAbsSec
    def suspect(ts: Seq[Double]): Boolean =
      spread1(ts) && (ts.size <= 2 || spread1(ts.sorted.dropRight(1)))
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      catch { case _: Exception => -1.0 }
    val sentinels = scala.collection.mutable.LinkedHashMap[String, Double]()

    def remeasure(name: String, samples0: Seq[Double], pick: Seq[Double] => Double,
        timed: () => Double): Meas = {
      if (!suspect(samples0)) Meas(name, pick(samples0), samples0, flagged = false)
      else {
        // suspect row: two fresh samples, then the SAME statistic over
        // the extended set (a heavy row's median-of-5 rejects a
        // two-sample burst that median-of-3 cannot; a light row's min
        // stays a min, so values remain comparable round-over-round).
        // Still-disagreeing samples flag the row: its value must not
        // be quoted without the samples
        val all = samples0 ++ Seq.fill(EscalationSamples)(timed())
        Meas(name, pick(all), all, flagged = suspect(all))
      }
    }

    val ops: Seq[(String, () => DataFrame)] = Seq(
      "gb_sum" -> (() => liGb.sum(Seq(col("l_quantity"), col("l_extendedprice")))),
      "gb_mean" -> (() => liGb.mean(Seq(col("l_quantity"), col("l_discount")))),
      "gb_min" -> (() => liGb.min(Seq(col("l_extendedprice"), col("l_shipdate")))),
      "gb_max" -> (() => liGb.max(Seq(col("l_extendedprice"), col("l_shipdate")))),
      "gb_count" -> (() => liGb.count(Seq(col("l_quantity")))),
      "rolling_sum" -> (() => evOps.rollingSum(col("value"), col("ts"), 50,
        minPeriods = Some(1))),
      "rolling_mean" -> (() => evOps.rollingMean(col("value"), col("ts"), 50,
        minPeriods = Some(1))),
      "rolling_max" -> (() => evOps.rollingMax(col("value"), col("ts"), 50,
        minPeriods = Some(1))),
      "rolling_min" -> (() => evOps.rollingMin(col("value"), col("ts"), 50,
        minPeriods = Some(1))),
      "cumsum" -> (() => evOps.cumsum(col("value"), col("ts"))),
      "cummax" -> (() => evOps.cummax(col("value"), col("ts"))),
      // DEFAULT path — the fast double-sum twin since round 11
      // (verdict item 3: users shouldn't pay the decimal-exact 4.6x
      // for oracle bit-equality they didn't ask for). Was the exact
      // path in r10 and earlier; compare r11 gb_corr to r10
      // gb_corr_fast, and gb_corr_exact to r10 gb_corr.
      "gb_corr" -> (() => liGb.corr(col("l_quantity"), col("l_extendedprice"))),
      // the determinism-contract twin: decimal accumulation, bit-
      // identical under any partitioning — what the oracle gate uses
      "gb_corr_exact" -> (() => liGb.corr(col("l_quantity"),
        col("l_extendedprice"), exact = true)),
      "rolling_var" -> (() => evOps.rollingVar(col("value"), col("ts"), 50,
        minPeriods = Some(1))),
      // window pair moments on THEIR fast-double default (round-12:
      // the grouped cov/corr twin treatment extended to the window
      // forms — the oracle gate passes exact = true explicitly)
      "rolling_corr" -> (() => evOps.rollingCorr(col("value"),
        pmod(col("event_id"), lit(89L)).cast("double"), col("ts"), 50,
        minPeriods = Some(1))),
      "ffill" -> (() => evOps.ffill(col("value"), col("ts"))),
      "interp" -> (() => evOps.interpolate(
        when(col("event_type") === "error", lit(null)).otherwise(col("value")),
        col("ts"))),
      "resample" -> (() => graft.operators.Resample.resample(
        new GroupBy(ev, Seq(col("user_id"))), tsIntOf(ev), sixHoursOf(ev),
        Seq(graft.operators.AggSpec("sum", col("value"), "s", exact = true),
          graft.operators.AggSpec("count", col("value"), "n")))),
      // ewm is the one per-key SEQUENTIAL op (linear recurrence →
      // sorted fold, not a window): this row prices that shape
      "ewm_mean" -> (() => evOps.ewmMean(col("value"), col("ts"), 0.25)),
      "crosstab" -> (() => Reshape.crosstab(orders, Seq(col("o_orderstatus")),
        col("o_orderpriority"), margins = Margins.All, fillZero = true)),
      // LLM-pipeline extension ops — the surface where the real 100 TB
      // risk lives; benched on their production (non-oracle) paths.
      // Ops that persist per-build intermediates (dedup_minhash,
      // pipeline_e2e) live in their own group below: each build caches a
      // NEW signature table that only the ContextCleaner releases, and in
      // round 4 that churn spanned adjacent ops' timed runs (gb_count
      // 6x, rolling_sum 4.8x transients).
      "lsh_topk" -> (() => Similarity.lshTopK(embs,
        embs.filter(col("vec_id") < 100), col("vec_id"), col("embedding"),
        10, planes = 10, nProbe = 4)),
      // PQ at production shape (8 subspaces x 16 codes): fit is
      // 2 fused Lloyd passes, ADC is the coded full scan
      "pq_adc_topk" -> (() => {
        val model = Pq.fit(embs, col("vec_id"), col("embedding"),
          dim = 64, m = 8, ksub = 16, iters = 2)
        Pq.adcTopK(embs, embs.filter(col("vec_id") < 100),
          col("vec_id"), col("embedding"), 10, model)
      }),
      "join_asof" -> (() => Joins.asof(
        ev.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), col("ts"), col("event_id")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id").as("p_id"),
            col("value").as("p_value")),
        Seq("user_id"), "ts", "ts",
        rightVals = Seq("purchase_id" -> "p_id", "purchase_value" -> "p_value")))
    )

    // Ops that persist a per-build intermediate (minHashPairs caches its
    // signature table), measured in their own group AFTER the
    // reference-mirror loop so block-manager churn from cache
    // accumulation cannot pollute the headline rows (the prodDedupOps
    // pattern below).
    val persistOps: Seq[(String, () => DataFrame)] = Seq(
      "dedup_minhash" -> (() => Dedup.minHashPairs(docs, col("doc_id"),
        col("text"))),
      // the suppression-verdict form vs its pair-enumeration
      // equivalent: minHashKeep claims to be cheaper than pairs +
      // anti-join when only the verdict is needed (bounded aggs/joins
      // on (band, bucket), no pair materialization) — these two rows
      // measure that claim head-to-head on identical inputs
      "dedup_minhash_keep" -> (() => Dedup.minHashKeep(docs, col("doc_id"),
        col("text"), ord = col("doc_id"))),
      "dedup_minhash_keep_pairs" -> (() => {
        val drop = Dedup.minHashPairs(docs, col("doc_id"), col("text"))
          .select(col("idb").as("doc_id")).distinct()
        docs.select(col("doc_id")).join(drop, Seq("doc_id"), "left_anti")
      }),
      // composed pipeline (quality filter → near-dup removal → join →
      // grouped agg): catches composition regressions — recomputation,
      // partitioning lost between stages — that single-op rows hide
      "pipeline_e2e" -> (() => {
        val good = docs
          .select(col("doc_id"), col("text"),
            TextFunctions.qualityScore(col("text"), col("n_chars")).as("q"))
          .filter(col("q") > 0.3)
        val dupIds = Dedup.minHashPairs(good, col("doc_id"), col("text"),
          threshold = 0.5).select(col("idb").as("doc_id")).distinct()
        val kept = good.join(dupIds, Seq("doc_id"), "left_anti")
        val joined = ev.join(kept,
          pmod(col("doc_id"), lit(nUsers)) === col("user_id"))
        new GroupBy(joined, Seq(col("event_type")))
          .sum(Seq(col("value").as("sum_value")))
      })
    )

    // The reference reports post-JIT times ("after all numba JIT
    // compilations", BASELINE.md). Parity here needs more than one warm
    // pass: HotSpot C2 compiles the generated code only after enough
    // invocations, so round-1's single-warm runs still charged 2-4s of
    // JIT to the first timed ops — and round-2's per-op interleaved
    // warm/measure still charged the FIRST op background-JIT residue its
    // same-shape peers escaped (gb_sum 1.11s vs gb_mean 0.19s). Warm
    // every op before timing ANY op: by the first measurement the whole
    // plan/codegen universe is compiled and quiesced.
    // isolation knob (VERDICT r8 item 7): SPARK_GRAFT_GROUPS=skew (or
    // a comma list of main,persist,prodDedup,zipf,skew,x10) measures
    // only those groups so a suspect row can be reproduced with no
    // other group's fixtures, JIT churn, or cache residue in the
    // process. Unset = the full recording (the official artifact).
    val groupsOn = sys.env.get("SPARK_GRAFT_GROUPS")
      .map(_.split(",").map(_.trim).toSet)
    def groupOn(g: String): Boolean = groupsOn.forall(_.contains(g))
    // per-row adjudication filter (scaladoc at main): unset = all rows
    val opsOn = sys.env.get("SPARK_GRAFT_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def opOn(n: String): Boolean = opsOn.forall(_.contains(n))
    // SPARK_GRAFT_TIME_OPS (round-14 verdict item 2 — the per-ROW
    // retry knob): the group still BUILDS AND WARMS every row — so the
    // warm universe, sibling persist caches (the keep-vs-pairs
    // coupling documented in OPTIMIZATION_r14.md "A/B validity"), and
    // JIT state match the full protocol — but only the listed rows are
    // TIMED. The orchestrator uses this to re-measure just a polluted
    // attempt's flagged rows at ~warm-pass cost instead of re-running
    // the whole group (two consecutive driver windows ran out of
    // budget after attempt 1 and never reached x10). Like
    // SPARK_GRAFT_OPS it marks the artifact and nulls the headline
    // total; UNLIKE it, the values are group-comparable by
    // construction.
    val timeOpsOn = sys.env.get("SPARK_GRAFT_TIME_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def timeOn(n: String): Boolean = timeOpsOn.forall(_.contains(n))

    // ---- drift canary (round-9 verdict item 3) ----
    // round 9 documented 20-30% UNIFORM machine drift between
    // recordings, which made round-over-round absolutes incomparable
    // and forced same-session A/B adjudication. A fixed trivial op —
    // the gb_sum fixture — is timed FIRST and LAST in every recording
    // (its fixtures build unconditionally, so isolated
    // SPARK_GRAFT_GROUPS runs carry the same canary as the official
    // artifact): cross-round comparisons divide by the canary mean
    // (the `queries_norm` block in the file artifact), and a
    // first/last disagreement exposes drift WITHIN a recording.
    def canaryBuild(): DataFrame = liGb.sum(Seq(col("l_quantity")))
    def timeCanary(): Double = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      force(canaryBuild())
      (System.nanoTime() - t0) / 1e9
    }.min
    // The first canary runs in an otherwise-cold JVM where background
    // C2 compilation of shared Spark infrastructure keeps improving
    // the op for MINUTES — smoke-measured on an idle machine, no warm
    // schedule closes the gap (first 0.12-0.15 vs last 0.066-0.071 at
    // sf0.01 across 3/8-force and self-quiescing warms alike). So:
    // the END-state reading (reproducible ±5% across recordings,
    // every recording ends equally deep-JITted) is the normalization
    // basis; the first reading is a within-run diagnostic only — its
    // expected shape is "moderately above last", and a first reading
    // far BELOW last, or a last reading far above other recordings'
    // lasts, exposes interference/drift.
    (1 to 8).foreach(_ => force(canaryBuild()))
    val canaryFirst = timeCanary()

    // ---- scale-matched shuffle sentinel (round-12 verdict item 1) ----
    // Scaling exponents conflate plan scaling with the HOST's
    // memory-pressure response: on r12's bandwidth-degraded host, x1
    // rows rode the penalty ~1x while x30 working sets rode it
    // 2-4.5x, inflating every heavy exponent on byte-identical
    // bytecode (fuzzy 0.63/0.735 certified on r10's host read
    // 0.91/0.91 on r12's). The sentinel is a canonical fixed
    // shuffle+agg whose TRUE exponent is 1.0 by construction: row
    // count AND distinct keys scale with mult, so map-side combine
    // cannot shrink it and the shuffle/sort working set is
    // proportional to scale. Its measured exponent e_s captures the
    // host's response at matched working sets; the artifact reports
    // sentinel-normalized exponents alongside raw:
    //   e_norm = e_raw - (e_s - 1)
    // The x1 reading runs in EVERY child (a comparable cross-child
    // probe); the xMult reading runs only in children that run the
    // x10 group — the same JVM and window as the heavy rows the
    // normalization corrects. DESIGN.md "Sentinel normalization"
    // validates the rule against the r10/r12 pair.
    //
    // e_ref, NOT an ideal 1.0: at bench scale the sentinel's x1 run
    // carries a meaningful fixed-overhead fraction, so even a healthy
    // host reads e_s < 1 (amortization) — normalizing to 1.0 would
    // INFLATE healthy-host exponents by that amortization. The
    // committed reference (tools/sentinel_ref.json, keyed by xMult,
    // recorded with the measuring host's fingerprint) is the sentinel
    // exponent on a certified-healthy host: there the correction is
    // zero by construction, and on a degraded host it subtracts
    // exactly the measured scale-response excess.
    def sentinelBuild(mult: Int): DataFrame = {
      val n = 2000000L * mult
      spark.range(n).select(
        pmod(col("id") * 2654435761L, lit(n / 2)).as("k"),
        md5(col("id").cast("string")).as("payload"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), max(col("payload")).as("mx"))
    }
    def timeSentinel(mult: Int, runs: Int): Double = {
      force(sentinelBuild(mult)) // warm (plan + codegen compile)
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        force(sentinelBuild(mult))
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val sentinelX1 = timeSentinel(1, 3)

    val mainOps = ops.filter(o => opOn(o._1))
    if (groupOn("main"))
      // v3.3: ONE warm force per op (was two). The warm pass itself is
      // load-bearing (the v3.0 detour, BenchProtocolSpec) but the
      // SECOND force of these known-sub-second rows bought nothing the
      // min-of-3 statistic doesn't already reject — dropping it funds
      // driver-budget headroom (round-14 verdict item 2: "drop the
      // second warm pass for sub-second rows").
      mainOps.foreach { case (name, build) =>
        dumpPlan(name, build()); force(build()) }
    sentinels("main") = loadavg()
    val results = (if (groupOn("main")) mainOps.filter(o => timeOn(o._1))
                   else Seq.empty).map {
      case (name, build) =>
      def timed(): Double = {
        val t0 = System.nanoTime()
        force(build())
        (System.nanoTime() - t0) / 1e9
      }
      audited(name) {
        val samples = Seq(timed(), timed(), timed())
        // light rows keep min (JIT/GC noise is one-sided upward); the
        // spread check still re-measures and flags an unstable row
        remeasure(name, samples, _.min, () => timed())
      }
    }

    // hot-key skew fixture: one user holds 80% of 10M left rows — the
    // shape that serializes a per-key window on a single task (at this
    // size the hot partition is ~8.8M rows: minutes of one-core sort at
    // 100 TB shapes, seconds here). The split row runs the same asof
    // with sliceWidth sub-partitioning the hot key's timeline (~64
    // slices); output equality is proven in JoinsSpec, this measures
    // that the skew no longer bounds wall time. (The split path costs
    // ~3 extra small shuffles, so it only pays once the hot partition
    // dominates — which is exactly the regime it exists for.)
    val nHot = 10000000L
    def hotKey = when(col("id") % 5 =!= 0, 0L)
      .otherwise(pmod(col("id"), lit(997L)))
    // persist() here only MARKS for caching — materialization (the
    // count) happens immediately before this group's measureGroup, and
    // the blocks are freed right after, so no group measures under
    // another group's block-manager residue (round 5's heavy rows did:
    // five fixture sets were resident before the first secondary
    // measurement, and the recorded prefix_30k reading was ~5× off two
    // fresh runs)
    val hotLeft = spark.range(nHot).select(hotKey.as("user_id"),
      (col("id") * 1000L).as("ts"), col("id").as("event_id")).persist()
    val hotRight = spark.range(nHot / 10).select(hotKey.as("user_id"),
      (col("id") * 10000L + 7L).as("ts"),
      (col("id") % 100).cast("double").as("p_value")).persist()
    def hotAsof(width: Option[Long]) = Joins.asof(hotLeft, hotRight,
      Seq("user_id"), "ts", "ts", rightVals = Seq("p_value" -> "p_value"),
      sliceWidth = width)
    // the two dedup ops whose r03 defaults were scale-unsafe, on their
    // production paths, in their own measured group so their shuffle
    // churn cannot pollute the main loop's timings. The ngram cap is
    // 100 here, not the 5000 default: the synthetic corpus has a ~900-
    // bigram vocabulary with median doc-freq 285/5000 docs — EVERY
    // shingle is boilerplate, so the default cap never engages and the
    // join degenerates to the quadratic shape the cap exists to
    // prevent (sum(df^2) = 73M capless vs 2.4k at cap 100). Real
    // corpora hold near-dup signal in rare shingles; cap 100 makes the
    // bench measure that production shape.
    val prodDedupOps: Seq[(String, () => DataFrame)] = Seq(
      "dedup_ngram" -> (() => Dedup.ngramJaccardPairs(docs, col("doc_id"),
        col("text"), maxDocFreq = Some(100))),
      "emb_dup_pairs" -> (() => Dedup.embeddingPairs(embs, col("vec_id"),
        col("embedding"), threshold = 0.4)),
      // word-granularity segment dedup: maximal segment volume per
      // document, the worst case for the claim/join-back machinery
      "dedup_segments" -> (() => Dedup.dedupSegments(docs, col("doc_id"),
        col("text"), ord = col("doc_id"), sep = " ")),
      // fixed eval set, scaling train corpus — the realistic
      // decontamination shape (broadcast gram probe)
      "decontaminate" -> (() => Dedup.contamination(docs, col("doc_id"),
        col("text"), docs.filter(col("doc_id") % 20 === 0), col("text"),
        n = 5)),
      // pairs -> transitive clusters -> representative: the iterative
      // star rounds dominate (the driver loop's convergence checks are
      // part of the op's honest cost)
      "dedup_clusters" -> (() => Dedup.dedupByClusters(docs,
        col("doc_id"), col("doc_id"),
        Dedup.minHashPairs(docs, col("doc_id"), col("text")),
        col("ida"), col("idb"))),
      // the bloom variant of the same screen — timed INCLUDING the
      // sketch build job, the honest end-to-end cost to compare
      // against the exact broadcast-join row above
      "decontaminate_bloom" -> (() => Dedup.contaminationFlags(docs,
        col("doc_id"), col("text"),
        Dedup.evalGramBloom(docs.filter(col("doc_id") % 20 === 0),
          col("text"), n = 5, fpp = 1e-4), n = 5)),
      "pack_sequences" -> (() => Sampling.packSequences(docs,
        col("doc_id"), TextFunctions.tokenCountWs(col("text")),
        maxTokens = 2048L, ord = col("doc_id"))),
      // the whole row-local text-prep family fused into ONE projection
      // pass (quality, script fractions, script language-ID, PII
      // stats, dedup normalization, fingerprint): measures that the
      // signals stay inside a single WholeStageCodegen scan — the
      // 100 TB text-prep cost is one read of the corpus, not six
      "text_signals" -> (() => docs.select(col("doc_id"),
        TextFunctions.qualityScore(col("text"), length(col("text"))).as("q"),
        TextFunctions.scriptFractions(col("text")).as("sf"),
        TextFunctions.langIdScript(col("text")).as("lang"),
        TextFunctions.piiStats(col("text")).as("pii"),
        TextFunctions.normalizeForDedup(col("text")).as("norm"),
        TextFunctions.fingerprint(col("text")).as("fp"))),
      // training-context chunking at production window size
      "chunk_tokens" -> (() => TextFunctions.chunkByTokens(docs,
        col("doc_id"), col("text"), size = 512, overlap = 64)),
      // lexical retrieval end to end INCLUDING the one-pass stats job
      "bm25_topk" -> (() => graft.operators.Similarity.bm25TopK(docs,
        col("doc_id"), col("text"), Seq("spark", "window", "merge"),
        k = 100)),
      // SemDeDup end to end INCLUDING centroid training (two Lloyd
      // iterations, 16 clusters) — the honest cost of the published
      // recipe; pair volume is within-cluster only
      "semdedup" -> (() => Dedup.semDedup(embs, col("vec_id"),
        col("embedding"), col("vec_id"),
        graft.operators.Similarity.ivfCentroids(embs, col("vec_id"),
          col("embedding"), nCentroids = 16, iters = 2),
        threshold = 0.4)),
      // fuzzy (near-dup) decontamination: fixed eval set, broadcast
      // band buckets — compare with the exact-gram `decontaminate` row
      "decontaminate_fuzzy" -> (() => Dedup.contaminationFuzzy(docs,
        col("doc_id"), col("text"), docs.filter(col("doc_id") % 20 === 0),
        col("doc_id"), col("text"))),
      // vocab build + full-corpus encode: tokenize → count → top-V →
      // broadcast lookup → per-doc reassembly
      "vocab_encode" -> (() => {
        val v = graft.operators.Vocab.buildVocab(docs, col("text"),
          maxSize = 30000, minCount = 2)
        graft.operators.Vocab.encodeTokens(docs, col("doc_id"),
          col("text"), v)
      }),
      // incremental ingest screen: batch vs prior snapshot on the
      // normalized-text hash (shuffled anti-join — the 100 TB shape)
      "dedup_incremental" -> (() => {
        val key = md5(TextFunctions.normalizeForDedup(col("text")))
        graft.operators.Snapshot.dedupAgainst(
          docs.filter(col("doc_id") % 2 === 0), key,
          docs.filter(col("doc_id") % 3 === 0), key)
      }),
      // snapshot diff: two full corpus fingerprints through one
      // full-outer equijoin
      "corpus_diff" -> (() => graft.operators.Snapshot.corpusDiff(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 5 =!= 0),
        col("doc_id"), md5(col("text")))),
      // unigram-LM quality scoring end to end INCLUDING the reference
      // count pass and the total-tokens action (the honest one-shot
      // cost; a standing pipeline amortizes the counts across batches)
      "lm_score" -> (() => {
        val counts = graft.operators.LangModel.unigramCounts(
          docs.filter(col("doc_id") % 2 === 0), col("text"))
        graft.operators.LangModel.scoreByUnigram(docs, col("doc_id"),
          col("text"), counts,
          graft.operators.LangModel.totalTokens(counts))
      }),
      // DSIR importance weights end to end INCLUDING both bucket-model
      // builds and the two total actions (the honest one-shot cost;
      // a standing pipeline reuses the broadcast-sized models)
      "dsir_weights" -> (() => {
        val tgt = docs.filter(col("doc_id") % 4 === 0)
        val raw = docs.filter(col("doc_id") % 4 =!= 0)
        val tc = graft.operators.Dsir.bucketCounts(tgt, col("text"), 4096)
        val rc = graft.operators.Dsir.bucketCounts(raw, col("text"), 4096)
        graft.operators.Dsir.logImportanceWeights(raw, col("doc_id"),
          col("text"), tc, graft.operators.Dsir.totalOf(tc),
          rc, graft.operators.Dsir.totalOf(rc), 4096)
      }),
      // 3 PageRank rounds over a 2M-edge synthetic link graph (200k
      // nodes, range-generated — generation is a codegen'd projection,
      // negligible next to the per-round join+agg being measured)
      "pagerank_2m" -> (() => graft.operators.GraphOps.pageRank(
        spark.range(2000000L).select((col("id") % 200000L).as("src"),
          ((col("id") * 31L + 7L) % 200000L).as("dst")),
        iterations = 3, numVertices = Some(200000L))),
      // BPE merge learning, 6 rounds — the per-round driver argmax
      // actions and vocab-sized rewrites are the op's honest cost
      "bpe_merges" -> (() => graft.operators.Vocab.learnBpeMerges(docs,
        col("text"), rounds = 6)),
      // blocked fuzzy self-ER over part names + their 5th-char typos.
      // DELIBERATE blocking-contract control: part names start with
      // one of EIGHT colors, so the prefix block degenerates to ~8
      // giant buckets — the worst case the contract documents. The
      // _diverse row below is the production shape.
      "fuzzy_join" -> (() => {
        val p = spark.read.parquet(s"$sfDir/part.parquet")
        val l = p.select(col("p_partkey").as("id"), col("p_name").as("name"))
        val r = p.select((col("p_partkey") + 1000000L).as("id"),
          concat(substring(col("p_name"), 1, 4), lit("x"),
            substring(col("p_name"), 6, 100000)).as("name"))
        Joins.fuzzyJoin(l, col("id"), col("name"), r, col("id"), col("name"),
          maxDist = 1)
      }),
      // the same op on prefix-DIVERSE names (hash-prefixed) at 10× the
      // rows: realistic entity names block into small buckets, so the
      // pair volume — and the cost — is a tiny fraction of the control
      "fuzzy_join_diverse" -> (() => {
        val n = 200000L
        def names(off: Long) = spark.range(n).select(
          (col("id") + off).as("id"),
          concat(md5(col("id").cast("string")),
            lit(" entity "), (col("id") % 97).cast("string")).as("name"))
        val l = names(0)
        val r = names(0).select((col("id") + 1000000L).as("id"),
          concat(substring(col("name"), 1, 6), lit("x"),
            substring(col("name"), 8, 100000)).as("name"))
        Joins.fuzzyJoin(l, col("id"), col("name"), r, col("id"), col("name"),
          maxDist = 1)
      }),
      // scalable twin of the degenerate-blocking control: 8 color
      // prefixes over range-generated names (the part table cannot
      // grow), so the WORST blocking shape gets its own exponent row.
      // Typo at char 10 (inside the hash region for every prefix) —
      // a same-prefix substitution, the routed paths' bread and butter
      "fuzzy_join_hotblock" -> (() => {
        val n = 200000L
        def names(off: Long) = spark.range(n).select(
          (col("id") + off).as("id"),
          concat(element_at(typedLit(Seq("almond", "beige", "coral",
            "denim", "ebony", "forest", "gold", "honey")),
            (col("id") % 8 + 1).cast("int")),
            lit(" "), md5(col("id").cast("string"))).as("name"))
        val l = names(0)
        val r = names(0).select((col("id") + 1000000000L).as("id"),
          concat(substring(col("name"), 1, 9), lit("!"),
            substring(col("name"), 11, 100000)).as("name"))
        Joins.fuzzyJoin(l, col("id"), col("name"), r, col("id"), col("name"),
          maxDist = 1)
      }),
      "suppress_rare" -> (() => graft.operators.Privacy.suppressRare(
        docs.select(col("doc_id"), col("lang"), col("source"),
          (col("n_chars") % 20).as("size_bin")),
        Seq(col("lang"), col("source"), col("size_bin")), k = 3)),
      // quality-classifier training end to end (featurization + 3 GD
      // rounds; per round one broadcast join + two aggs, dim-bounded
      // driver traffic) — the honest cost of closing the fastText
      // curation loop on this corpus
      "quality_train" -> (() => graft.operators.QualityModel.trainQuality(
        docs, col("doc_id"), col("text"), col("lang") === "en",
        dim = 4096, iters = 3, lr = 0.5)),
      // bigram stupid-backoff scoring INCLUDING both count passes and
      // the total action — compare with the unigram lm_score row
      "lm_score_bigram" -> (() => {
        val ref = docs.filter(col("doc_id") % 2 === 0)
        val uni = graft.operators.LangModel.unigramCounts(ref, col("text"))
        val bi = graft.operators.LangModel.bigramCounts(ref, col("text"))
        graft.operators.LangModel.scoreByBigram(docs, col("doc_id"),
          col("text"), bi, uni,
          graft.operators.LangModel.totalTokens(uni))
      }),
      // image content near-dup end to end: synthesize P5 rasters
      // (codegen'd projection), REAL pixel decode + dHash in
      // mapPartitions, pigeonhole hamming pair join
      "mm_phash" -> (() => {
        val base = col("doc_id")
        val raster = array_join(transform(sequence(lit(0), lit(287)),
          i => lpad(hex(pmod(base * 7 +
            floor(base / lit(251)).cast("long") * 29 + i * 13 +
            base * i * i, lit(256))), 2, "0")), "")
        val bin = docs.select(col("doc_id"),
          concat(encode(lit("P5\n18 16\n255\n"), "US-ASCII"),
            unhex(raster)).as("bytes"))
        val hashed = graft.operators.Multimodal.imageDHash(bin,
          col("doc_id"), col("bytes")).toDF()
        Dedup.hammingPairs(hashed.filter(col("valid")), col("id"),
          col("dhash"), maxDistance = 6)
      }))

    // prefix-filter fixture: the sf documents corpus is anti-Zipfian
    // (~900-bigram vocabulary, every shingle boilerplate), so the
    // doc-freq cap already collapses its join and prefix filtering's
    // extra stages cannot pay there. Its design regime is EXACTNESS
    // REQUIRED on a corpus with hot boilerplate + rare signal — this
    // fixture: every doc opens with the same boilerplate run (df = N
    // shingles, the quadratic trap) and continues with doc-unique
    // tokens; every 10th doc has a near-dup neighbor sharing its rare
    // tail. Plain exact must join the boilerplate posting lists
    // (cost ∝ N², ~600M rows at 10k docs); prefix filtering indexes
    // only each doc's rarest shingles, so candidates ≈ the true dup
    // pairs, exactly — measured 4× at 10k docs, and still ~5 s at 30k
    // where the plain form's 9× join volume (~85 s) is not worth
    // benching. Output equality is spec-proven (PipelineSpec).
    def zipfCorpus(n: Long) = spark.range(n).select(col("id").as("doc_id"),
      concat(
        lit("terms of service apply to this document "),
        expr("concat_ws(' ', transform(sequence(0, 29), " +
          "j -> concat('u', CAST(id - (CASE WHEN id % 10 = 1 THEN 1 ELSE 0 END) " +
          "AS STRING), '_', CAST(j AS STRING))))"),
        expr("concat(' t', CAST(id % 10 AS STRING))")).as("text"))
    val zipf10k = zipfCorpus(10000).persist()
    val zipf30k = zipfCorpus(30000).persist()
    val zipfOps: Seq[(String, () => DataFrame)] = Seq(
      "ngram_exact_quad_10k" -> (() => Dedup.ngramJaccardPairs(zipf10k,
        col("doc_id"), col("text"), threshold = 0.6, maxDocFreq = None)),
      "ngram_exact_prefix_10k" -> (() => Dedup.ngramJaccardPairs(zipf10k,
        col("doc_id"), col("text"), threshold = 0.6, maxDocFreq = None,
        prefixFilter = true)),
      "ngram_exact_prefix_30k" -> (() => Dedup.ngramJaccardPairs(zipf30k,
        col("doc_id"), col("text"), threshold = 0.6, maxDocFreq = None,
        prefixFilter = true)))

    def hotRolling(width: Option[Long]) =
      new RollingOps(new GroupBy(hotLeft, Seq(col("user_id"))))
        .rollingSum(col("event_id").cast("double"), col("ts"), 50,
          minPeriods = Some(1), sliceWidth = width)
    // positional selection on the same hot key: unsplit head(5) sorts
    // the ~8.8M-row hot partition in one task; the split path counts
    // per slice (hash agg), prunes every slice whose prefix offset
    // already reaches 5, and sorts only the first ~160k-row slice
    def hotHead(width: Option[Long]) =
      new SelectionOps(new GroupBy(hotLeft, Seq(col("user_id"))))
        .head(5, Seq(col("ts")), sliceWidth = width)
    val skewOps: Seq[(String, () => DataFrame)] = Seq(
      "asof_hotkey" -> (() => hotAsof(None)),
      "asof_hotkey_split" -> (() => hotAsof(Some(160000000L))),
      "rolling_hotkey" -> (() => hotRolling(None)),
      "rolling_hotkey_split" -> (() => hotRolling(Some(160000000L))),
      "sel_hotkey" -> (() => hotHead(None)),
      "sel_hotkey_split" -> (() => hotHead(Some(160000000L))))

    // second scale point: 10× documents/embeddings/events synthesized
    // from the sf tables (copy i of a doc rewrites every token, so
    // near-dup DENSITY stays constant and only volume grows; embeddings
    // rotate by i — norm-preserving, direction-changing; events shift
    // the user-id space, so per-key density is constant and key count
    // grows xMult×). Gives the 100 TB extrapolation two points per op.
    // SPARK_GRAFT_X (default 10, the driver shape) raises the second
    // point — e.g. 30 for a one-off wider extrapolation run; the
    // embedding rotation supports xMult <= dim (64).
    val xMult = sys.env.getOrElse("SPARK_GRAFT_X", "10").toInt
    require(xMult >= 1 && xMult <= 64,
      s"SPARK_GRAFT_X must be in [1, 64] (the embedding rotation " +
        s"supports at most dim=64 positions), got $xMult")
    val xs = s"_x$xMult"
    val docs10 = (0 until xMult).map { i =>
      docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        (if (i == 0) col("text")
         else regexp_replace(col("text"), "(^| )", "$1v" + i + ":"))
          .as("text"))
    }.reduce(_ unionByName _).persist()
    val embs10 = (0 until xMult).map { i =>
      embs.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        (if (i == 0) col("embedding")
         else expr(s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), " +
           s"slice(embedding, 1, $i))")).as("embedding"))
    }.reduce(_ unionByName _).persist()
    val ev10 = (0 until xMult).map { i =>
      ev.select((col("event_id") + lit(i * 100000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(i * 10000000L)).as("user_id"),
        col("event_type"), col("value"))
    }.reduce(_ unionByName _).persist()
    val x10Ops: Seq[(String, () => DataFrame)] = Seq(
      s"dedup_minhash$xs" -> (() => Dedup.minHashPairs(docs10, col("doc_id"),
        col("text"))),
      s"dedup_minhash_keep$xs" -> (() => Dedup.minHashKeep(docs10,
        col("doc_id"), col("text"), ord = col("doc_id"))),
      s"dedup_minhash_keep_pairs$xs" -> (() => {
        val drop = Dedup.minHashPairs(docs10, col("doc_id"), col("text"))
          .select(col("idb").as("doc_id")).distinct()
        docs10.select(col("doc_id")).join(drop, Seq("doc_id"), "left_anti")
      }),
      s"dedup_ngram$xs" -> (() => Dedup.ngramJaccardPairs(docs10, col("doc_id"),
        col("text"), maxDocFreq = Some(100))),
      s"dedup_segments$xs" -> (() => Dedup.dedupSegments(docs10,
        col("doc_id"), col("text"), ord = col("doc_id"), sep = " ")),
      s"dedup_clusters$xs" -> (() => Dedup.dedupByClusters(docs10,
        col("doc_id"), col("doc_id"),
        Dedup.minHashPairs(docs10, col("doc_id"), col("text")),
        col("ida"), col("idb"))),
      s"decontaminate$xs" -> (() => Dedup.contamination(docs10,
        col("doc_id"), col("text"), docs.filter(col("doc_id") % 20 === 0),
        col("text"), n = 5)),
      s"decontaminate_bloom$xs" -> (() => Dedup.contaminationFlags(docs10,
        col("doc_id"), col("text"),
        Dedup.evalGramBloom(docs.filter(col("doc_id") % 20 === 0),
          col("text"), n = 5, fpp = 1e-4), n = 5)),
      s"pack_sequences$xs" -> (() => Sampling.packSequences(docs10,
        col("doc_id"), TextFunctions.tokenCountWs(col("text")),
        maxTokens = 2048L, ord = col("doc_id"))),
      s"emb_dup_pairs$xs" -> (() => Dedup.embeddingPairs(embs10, col("vec_id"),
        col("embedding"), threshold = 0.4)),
      s"lsh_topk$xs" -> (() => Similarity.lshTopK(embs10,
        embs10.filter(col("vec_id") < 100), col("vec_id"), col("embedding"),
        10, planes = 10, nProbe = 4)),
      s"join_asof$xs" -> (() => Joins.asof(
        ev10.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), col("ts"), col("event_id")),
        ev10.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id").as("p_id"),
            col("value").as("p_value")),
        Seq("user_id"), "ts", "ts",
        rightVals = Seq("purchase_id" -> "p_id", "purchase_value" -> "p_value"))),
      s"decontaminate_fuzzy$xs" -> (() => Dedup.contaminationFuzzy(docs10,
        col("doc_id"), col("text"), docs.filter(col("doc_id") % 20 === 0),
        col("doc_id"), col("text"))),
      s"vocab_encode$xs" -> (() => {
        val v = graft.operators.Vocab.buildVocab(docs10, col("text"),
          maxSize = 30000, minCount = 2)
        graft.operators.Vocab.encodeTokens(docs10, col("doc_id"),
          col("text"), v)
      }),
      // cluster count scales WITH the corpus (the SemDeDup recipe:
      // constant expected cluster size) — a fixed K would grow the
      // within-cluster pair volume quadratically, which is the wrong
      // plan at any scale, not a property of this operator
      s"semdedup$xs" -> (() => Dedup.semDedup(embs10, col("vec_id"),
        col("embedding"), col("vec_id"),
        graft.operators.Similarity.ivfCentroids(embs10, col("vec_id"),
          col("embedding"),
          nCentroids = math.min(16 * xMult,
            graft.operators.Similarity.MaxCentroids), iters = 2),
        threshold = 0.4)),
      s"dsir_weights$xs" -> (() => {
        val tgt = docs10.filter(col("doc_id") % 4 === 0)
        val raw = docs10.filter(col("doc_id") % 4 =!= 0)
        val tc = graft.operators.Dsir.bucketCounts(tgt, col("text"), 4096)
        val rc = graft.operators.Dsir.bucketCounts(raw, col("text"), 4096)
        graft.operators.Dsir.logImportanceWeights(raw, col("doc_id"),
          col("text"), tc, graft.operators.Dsir.totalOf(tc),
          rc, graft.operators.Dsir.totalOf(rc), 4096)
      }),
      // edge volume and node count both scale xMult× (constant degree)
      s"pagerank_2m$xs" -> (() => graft.operators.GraphOps.pageRank(
        spark.range(2000000L * xMult)
          .select((col("id") % (200000L * xMult)).as("src"),
            ((col("id") * 31L + 7L) % (200000L * xMult)).as("dst")),
        iterations = 3, numVertices = Some(200000L * xMult))),
      s"quality_train$xs" -> (() => graft.operators.QualityModel.trainQuality(
        docs10, col("doc_id"), col("text"),
        pmod(col("doc_id"), lit(2)) === 0, dim = 4096, iters = 3, lr = 0.5)),
      s"lm_score_bigram$xs" -> (() => {
        val ref = docs10.filter(col("doc_id") % 2 === 0)
        val uni = graft.operators.LangModel.unigramCounts(ref, col("text"))
        val bi = graft.operators.LangModel.bigramCounts(ref, col("text"))
        graft.operators.LangModel.scoreByBigram(docs10, col("doc_id"),
          col("text"), bi, uni,
          graft.operators.LangModel.totalTokens(uni))
      }),
      // corpus AND query batch scale xMult× (query cost is the scan;
      // fixed queries would hide the per-candidate term)
      s"pq_adc_topk$xs" -> (() => {
        val model = Pq.fit(embs10, col("vec_id"), col("embedding"),
          dim = 64, m = 8, ksub = 16, iters = 2)
        Pq.adcTopK(embs10, embs10.filter(col("vec_id") < 100L * xMult),
          col("vec_id"), col("embedding"), 10, model)
      }),
      // fixed-query-batch twin (round-10 verdict item 4): the stock
      // row above scales corpus AND query batch together, so its
      // exponent (r10: 0.997) conflates the two terms — against work
      // that grows xMult² it is really ~0.5. This row pins the batch
      // at the x1 row's 100 queries so the exponent isolates the
      // CORPUS term — the one the 100 TB claim needs (a production
      // query batch does not grow with the corpus). Scaling base is
      // the stock pq_adc_topk x1 row: at xMult = 1 the two builds are
      // the same query (100L * 1 = 100), so the alias in the scaling
      // table below is exact, not an approximation.
      s"pq_adc_topk_fixedq$xs" -> (() => {
        val model = Pq.fit(embs10, col("vec_id"), col("embedding"),
          dim = 64, m = 8, ksub = 16, iters = 2)
        Pq.adcTopK(embs10, embs10.filter(col("vec_id") < 100L),
          col("vec_id"), col("embedding"), 10, model)
      }),
      // per-key history length scales (userbase fixed per copy but ids
      // shifted -> same-size keys, xMult x more of them): the fold's
      // per-key sequential cost stays flat, the shuffle volume scales
      s"ewm_mean$xs" -> (() => new RollingOps(new GroupBy(ev10,
        Seq(col("user_id")))).ewmMean(col("value"), col("ts"), 0.25)),
      s"resample$xs" -> (() => graft.operators.Resample.resample(
        new GroupBy(ev10, Seq(col("user_id"))), tsIntOf(ev10), sixHoursOf(ev10),
        Seq(graft.operators.AggSpec("sum", col("value"), "s", exact = true),
          graft.operators.AggSpec("count", col("value"), "n")))),
      s"interp$xs" -> (() => new RollingOps(new GroupBy(ev10,
        Seq(col("user_id")))).interpolate(
          when(col("event_type") === "error", lit(null)).otherwise(col("value")),
          col("ts"))),
      // window-family scaling rows (round-12 verdict item 5): the
      // r12 fast-double default flipped the rolling pair-moment path;
      // without exponent rows a future decimal-style regression on
      // the window path would be invisible to the scaling table.
      // Expected ~1.0 raw — WindowExec is linear per key, key count
      // scales xMult x at constant per-key history
      s"rolling_var$xs" -> (() => new RollingOps(new GroupBy(ev10,
        Seq(col("user_id")))).rollingVar(col("value"), col("ts"), 50,
        minPeriods = Some(1))),
      s"rolling_corr$xs" -> (() => new RollingOps(new GroupBy(ev10,
        Seq(col("user_id")))).rollingCorr(col("value"),
        pmod(col("event_id"), lit(89L)).cast("double"), col("ts"), 50,
        minPeriods = Some(1))),
      // the round-9 fuzzyJoin redesign's scaling row (round-9 verdict
      // item 1: the op had fixture A/B evidence but no exponent).
      // Scales the production (prefix-diverse) shape: rows AND the
      // typo'd right side both grow xMult x, blocks stay small, so
      // the adaptive stats + routing overhead must amortize
      "fuzzy_join_diverse" + xs -> (() => {
        val n = 200000L * xMult
        def names(off: Long) = spark.range(n).select(
          (col("id") + off).as("id"),
          concat(md5(col("id").cast("string")),
            lit(" entity "), (col("id") % 97).cast("string")).as("name"))
        val l = names(0)
        val r = names(0).select((col("id") + 1000000000L).as("id"),
          concat(substring(col("name"), 1, 6), lit("x"),
            substring(col("name"), 8, 100000)).as("name"))
        Joins.fuzzyJoin(l, col("id"), col("name"), r, col("id"), col("name"),
          maxDist = 1)
      }),
      // the degenerate-blocking control at xMult x: 8 giant blocks
      // whose pair volume grows quadratically — the shape the routed
      // (deletion/q-gram) paths must keep LINEAR
      "fuzzy_join_hotblock" + xs -> (() => {
        val n = 200000L * xMult
        def names(off: Long) = spark.range(n).select(
          (col("id") + off).as("id"),
          concat(element_at(typedLit(Seq("almond", "beige", "coral",
            "denim", "ebony", "forest", "gold", "honey")),
            (col("id") % 8 + 1).cast("int")),
            lit(" "), md5(col("id").cast("string"))).as("name"))
        val l = names(0)
        val r = names(0).select((col("id") + 1000000000L).as("id"),
          concat(substring(col("name"), 1, 9), lit("!"),
            substring(col("name"), 11, 100000)).as("name"))
        Joins.fuzzyJoin(l, col("id"), col("name"), r, col("id"), col("name"),
          maxDist = 1)
      }))

    // persist/prod-dedup/skew/x10 groups — sampling protocol v3.2
    // (round-12 verdict item 2, budget fit): ONE warm pass, then two
    // timed samples per row. v2 (1 warm + 2-3 timed, heavy-row
    // median-of-3) cost ~4x each group's row sum; the r12 driver
    // window blew its 2700 s budget at -290 s with x10 left pending
    // (BENCH_r12.json). Dropping the third sample (~25%) funds
    // pending_n = 0. The warm pass STAYS: a warm-less variant (v3.0,
    // measured r13) charged first-of-family rows their whole
    // plan/codegen/C2 ramp in BOTH samples — fuzzy_join read 2.3x its
    // r12 steady state ([3.88, 3.19] vs post-warm 1.38) and pagerank's
    // escalated median mixed the ramp into the value — fake
    // regressions that would cost an adjudication cycle each. Post-
    // warm, min-of-2 sits within a few % of v2's median-of-3; suspect
    // rows still escalate (+2 samples, heavy rows report the median
    // over 4+ — the burst case that motivated v2's median-of-3
    // triggers escalation exactly when samples disagree). Cross-round
    // reads use queries_norm either way (DESIGN.md "Sampling protocol
    // v3.2").
    def measureGroup(groupName: String,
        group0: Seq[(String, () => DataFrame)]): Seq[Meas] = {
      // group boundary: collect the previous group's dead blocks so
      // this group never measures under checkpoint/cache residue (doc
      // at drainResidue)
      drainResidue()
      val group = group0.filter(o => opOn(o._1))
      group.foreach { case (name, build) =>
        dumpPlan(name, build()); force(build()) }
      sentinels(groupName) = loadavg()
      group.filter(o => timeOn(o._1)).map { case (name, build) =>
        def timed(): Double = {
          val t0 = System.nanoTime()
          force(build())
          (System.nanoTime() - t0) / 1e9
        }
        audited(name) {
        val samples = Seq.fill(TimedSamples)(timed())
        // 2 agreeing samples: min (the spread gate bounds them within
        // 1.5x/0.2s of each other, so min ~ median); escalated heavy
        // rows: median over the extended set
        def pick(ts: Seq[Double]): Double =
          if (ts.size >= 3 && ts.min > HeavyRowFloorSec) ts.sorted.apply(ts.size / 2)
          else ts.min
        if (samples.min <= HeavyRowFloorSec) {
          // LIGHT rows, v3.1 corroboration rule: under v3 the first
          // sample carries the op's own plan/codegen compile BY
          // DESIGN, and in a heavy group's fresh JVM the C2 tail can
          // span sample 2 as well — the r13 builder recording burned
          // two x10 retries on exactly that shape (emb_dup_pairs_x10
          // [1.53, 0.43, 0.33, 0.31]: spread-flagged, yet the min is
          // solid). A light row's reported statistic is the MIN, so
          // the trust condition is that the min is REPRODUCED: >= 2
          // samples within 1.2x of it. Escalate once (+2 samples) if
          // not; flag only if still uncorroborated — one-sided slow
          // samples are expected warm-up, a min nobody reproduced is
          // not a number. (Real interference keeps failing this:
          // r8's polluted [3.6, 24.6, 29.9, 35.9, 25.1] has a lone
          // min — flagged.) Heavy rows keep the spread rule: their
          // medians use every sample, so outliers there must flag.
          // The corroboration band matches the spread rule's own 1.5x
          // (+50 ms absolute slack for ~0.1 s rows): a first cut at
          // 1.2x flagged honest sub-second scatter like join_asof_x10
          // [2.63, 1.22, 1.14, 0.93] — 25-35% run-to-run spread is
          // normal for light rows in a 60M-row-fixture JVM, and the
          // reported min is still reproduced there.
          def corroborated(ts: Seq[Double]): Boolean =
            ts.count(_ <= ts.min * LightCorroborationRel +
              LightCorroborationAbsSec) >= 2
          val all = if (corroborated(samples)) samples
                    else samples ++ Seq.fill(EscalationSamples)(timed())
          Meas(name, all.min, all, flagged = !corroborated(all))
        } else remeasure(name, samples, pick, () => timed())
        }
      }
    }
    // each group's fixtures materialize immediately before its
    // measurement and are freed (blocking) right after — no group
    // measures under another's cache residue
    val persistResults =
      if (groupOn("persist")) measureGroup("persist", persistOps) else Seq.empty
    val prodDedupResults =
      if (groupOn("prodDedup")) measureGroup("prodDedup", prodDedupOps)
      else Seq.empty
    val zipfResults = if (groupOn("zipf")) {
      zipf10k.count(); zipf30k.count()
      val r = measureGroup("zipf", zipfOps)
      zipf10k.unpersist(true); zipf30k.unpersist(true)
      r
    } else Seq.empty
    val skewResults = if (groupOn("skew")) {
      hotLeft.count(); hotRight.count()
      val r = measureGroup("skew", skewOps)
      hotLeft.unpersist(true); hotRight.unpersist(true)
      r
    } else Seq.empty
    // the xMult sentinel reading runs in the same JVM, against the
    // same materialized fixtures, immediately before the x10 rows —
    // the host state whose memory-pressure response it corrects for
    var sentinelXM: Option[Double] = None
    val x10Results = if (groupOn("x10")) {
      docs10.count(); embs10.count(); ev10.count()
      if (xMult > 1) sentinelXM = Some(timeSentinel(xMult, 2))
      val r = measureGroup("x10", x10Ops)
      docs10.unpersist(true); embs10.unpersist(true); ev10.unpersist(true)
      r
    } else Seq.empty

    val all = results ++ persistResults ++ prodDedupResults ++ zipfResults ++
      skewResults ++ x10Results
    val canaryLast = timeCanary()
    // normalization basis: the end-state reading (see the canary
    // comment above — first carries background-JIT inflation)
    val canaryBase = canaryLast
    def fmt(d: Double): String = ((d * 10000).round / 10000.0).toString
    val qs = all.map(m => "\"" + m.name + "\":" + fmt(m.value))
      .mkString("{", ",", "}")
    // headline "total" op set: main loop + dedup_minhash + pipeline_e2e
    // (NOT the keep-vs-pairs rows). The set grew with the main loop —
    // r11 split gb_corr into fast/exact, r12 added rolling_var and
    // rolling_corr — so raw totals are directly comparable only to
    // rounds sharing the op set (r12+); cross-round reads use the
    // per-row queries_norm block, never the total (r12 advice item 3)
    val total = (results ++ persistResults.filter(m =>
      m.name == "dedup_minhash" || m.name == "pipeline_e2e")).map(_.value).sum
    // scaling exponent per xMult op: log(t_xMult / t_x1) / log(xMult)
    // — 1.0 = linear, <1 sublinear (fixed overheads amortizing), >1
    // superlinear (a plan that would not survive 100 TB)
    val byName = all.map(m => m.name -> m.value).toMap
    // x1 base-row aliases: rows whose xN build intentionally differs
    // from the stock op only in what SCALES (the fixedq twin pins the
    // query batch) share the stock op's x1 time — exact at xMult = 1
    val scalingAlias = Map("pq_adc_topk_fixedq" -> "pq_adc_topk")
    // the combined pq_adc_topk row grows corpus AND query batch
    // together, so its ratio is a labeled THROUGHPUT row, not an
    // exponent — the fixedq twin is the certified corpus-scaling row
    // (round-12 verdict item 4); it stays in queries/samples either way
    val scalingExclude = Set("pq_adc_topk")
    // (name, exponent, tM): the xMult runtime rides along for the
    // overhead-dominated floor (doc at OverheadFloorSec)
    val scalingRows: Seq[(String, Double, Double)] = x10Results.flatMap { m =>
      val name0 = m.name.stripSuffix(xs)
      val base = scalingAlias.getOrElse(name0, name0)
      if (scalingExclude.contains(name0)) None
      else byName.get(base).filter(_ => m.value > 0).map { t1 =>
        (name0, math.log10(m.value / t1) / math.log10(xMult.toDouble), m.value)
      }
    }
    val scalingVals: Seq[(String, Double)] = scalingRows.map(r => r._1 -> r._2)
    val overheadDominated = scalingRows.collect {
      case (n, _, tM) if tM < OverheadFloorSec => n }
    def expJson(vs: Seq[(String, Double)]): String = vs.map { case (n, e) =>
      "\"" + n + "\":" + (e * 10000).round / 10000.0
    }.mkString("{", ",", "}")
    val scaling = expJson(scalingVals)
    // sentinel-normalized exponents (doc at sentinelBuild): subtract
    // the host's measured scale-response EXCESS over the certified
    // reference host, e_norm = e_raw - (e_s - e_ref)
    val sentinelExp = sentinelXM.map(tM =>
      math.log10(tM / sentinelX1) / math.log10(xMult.toDouble))
    val sentinelRefPath = sys.env.getOrElse("SPARK_GRAFT_SENTINEL_REF",
      "tools/sentinel_ref.json")
    val sentinelRef: Option[Double] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(sentinelRefPath)), "UTF-8")
      // flat {"10": e, "30": e, ...} — a one-key regex read keeps
      // record() free of a JSON dependency
      val m = ("\"" + xMult + "\"\\s*:\\s*(-?[0-9.]+)").r
        .findFirstMatchIn(txt)
      m.map(_.group(1).toDouble)
    } catch { case _: Exception => None }
    // normalization REQUIRES a committed reference for this xMult:
    // defaulting a missing ref to 1.0 silently inflated every
    // normalized exponent by the sentinel's own amortization (~0.3)
    // — exactly the ideal-1.0 failure e_ref exists to avoid (r13
    // advice item 1). With no ref the norm column is omitted, the raw
    // column stands, and the note says why.
    val scalingNorm = (for { es <- sentinelExp; ref <- sentinelRef } yield
      expJson(scalingVals.map { case (n, e) => n -> (e - (es - ref)) })
    ).getOrElse("{}")
    val scalingNormNote =
      if (sentinelExp.isDefined && sentinelRef.isEmpty)
        s""","scaling_norm_note":"no committed sentinel reference for x$xMult in $sentinelRefPath - normalization omitted, raw scaling stands""""
      else ""
    // mechanical excursion bracket (r13 verdict item 3, doc at
    // SentinelExcursionBand): when e_s departs e_ref, norm is a lower
    // bound and raw an upper bound — the artifact emits the bounds
    // itself so the next excursion adjudicates without hand-derived
    // DESIGN.md prose.
    val excursionOpt: Option[Boolean] =
      for { es <- sentinelExp; ref <- sentinelRef }
        yield math.abs(es - ref) > SentinelExcursionBand
    val excursionJson = excursionOpt.map(b =>
      s""","sentinel_excursion":$b""").getOrElse("")
    val scalingBoundsJson = (for {
      es <- sentinelExp; ref <- sentinelRef
      if math.abs(es - ref) > SentinelExcursionBand
    } yield ",\"scaling_bounds\":" + scalingVals.map { case (n, e) =>
      val norm = e - (es - ref)
      "\"" + n + "\":[" + fmt(math.min(e, norm)) + "," +
        fmt(math.max(e, norm)) + "]"
    }.mkString("{", ",", "}")).getOrElse("")
    val overheadJson =
      if (scalingRows.isEmpty) ""
      else ",\"scaling_overhead_dominated\":" +
        overheadDominated.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sentinelJson2 = "{\"x1\":" + fmt(sentinelX1) +
      sentinelXM.map(tM => ",\"x" + xMult + "\":" + fmt(tM)).getOrElse("") +
      sentinelExp.map(es => ",\"exponent\":" + fmt(es)).getOrElse("") +
      sentinelRef.map(r => ",\"ref\":" + fmt(r)).getOrElse("") + "}"
    val hostJson = host.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val samplesJson = all.map(m =>
      "\"" + m.name + "\":[" + m.samples.map(fmt).mkString(",") + "]")
      .mkString("{", ",", "}")
    val sentinelJson = sentinels.map { case (g, l) => "\"" + g + "\":" + l }
      .mkString("{", ",", "}")
    val flaggedJson = all.filter(_.flagged).map("\"" + _.name + "\"")
      .mkString("[", ",", "]")
    // The driver captures only a bounded tail of stdout, and round 7's
    // full self-diagnosing line (67 rows x raw samples + sentinels)
    // outgrew it -> BENCH_r07.json recorded parsed:null. The complete
    // artifact now goes to a FILE; the final stdout line stays compact
    // (total + per-row values + flags) so the driver can always parse
    // it. The file keeps samples/sentinels/scaling for the audit trail.
    // drift-normalized values: value / canary end-state — the unit is
    // "canary multiples", comparable across recordings on drifting
    // hardware (the canary protocol, DESIGN.md)
    val qsNorm = all.map(m => "\"" + m.name + "\":" +
      fmt(m.value / math.max(canaryBase, 1e-9))).mkString("{", ",", "}")
    val canaryJson =
      s"""{"first":${fmt(canaryFirst)},"last":${fmt(canaryLast)}}"""
    // SPARK_GRAFT_OPS adjudication runs must be distinguishable from
    // official artifacts (r12 advice item 2): the filter lands in the
    // artifact, the headline total is nulled (it is computed over a
    // filtered row set), and the default output path changes so a
    // filtered run cannot silently overwrite BENCH_full_builder.json
    val opsFilterJson = opsOn.map(s =>
      s.toSeq.sorted.map("\"" + _ + "\"").mkString(",\"ops_filter\":[", ",", "]"))
      .getOrElse("")
    // a TIME_OPS run is group-comparable per row but its headline
    // total would cover only the timed subset — null it, and mark the
    // artifact (mirrors the SPARK_GRAFT_OPS contract)
    val timeOpsJson = timeOpsOn.map(s =>
      s.toSeq.sorted.map("\"" + _ + "\"")
        .mkString(",\"time_ops_filter\":[", ",", "]"))
      .getOrElse("")
    val totalJson =
      if (opsOn.isDefined || timeOpsOn.isDefined) "null" else fmt(total)
    val auditJson = audits.map { case (n, a) =>
      "\"" + n + "\":{\"storage_mem_mb\":" + fmt(a.storageMemMb) +
        ",\"storage_disk_mb\":" + fmt(a.storageDiskMb) +
        ",\"spill_mem_mb\":" + fmt(a.spillMemMb) +
        ",\"spill_disk_mb\":" + fmt(a.spillDiskMb) + "}"
    }.mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":$totalJson,"unit":"sec","queries":$qs,"canary":$canaryJson,"host":$hostJson,"host_class":"${hostClassOf(host)}","scale_sentinel":$sentinelJson2,"queries_norm":$qsNorm,"scaling":$scaling,"scaling_norm":$scalingNorm$scalingNormNote$excursionJson$scalingBoundsJson$overheadJson,"samples":$samplesJson,"audit":$auditJson,"loadavg_1m":$sentinelJson,"flagged":$flaggedJson$opsFilterJson$timeOpsJson,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (opsOn.isDefined) "BENCH_opsfilter_builder.json"
      else if (timeOpsOn.isDefined) "BENCH_timeops_builder.json"
      else "BENCH_full_builder.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      fullJson.getBytes("UTF-8"))
    catch { case e: Exception =>
      // fall back to stdout (earlier, non-final line) if the cwd is
      // unwritable — the compact final line below is still parseable
      System.err.println(s"bench: could not write $outPath: $e")
      println(fullJson)
    }
    // final stdout line budget: the driver captures a bounded tail
    // (~2,000 chars) and must parse THIS line, so it is compressed
    // hard — 3-decimal values, flagged as a count, basename paths —
    // and if the row set still outgrows the budget, the x10 scaling
    // rows drop from the line first (they live in the file artifact
    // with their raw samples either way)
    def compactLine(ms: Seq[Meas]): String = {
      def fmt3(d: Double): String = ((d * 1000).round / 1000.0).toString
      val q = ms.map(m => "\"" + m.name + "\":" + fmt3(m.value))
        .mkString("{", ",", "}")
      val t = if (opsOn.isDefined || timeOpsOn.isDefined) "null"
              else fmt3(total)
      s"""{"metric":"total","value":$t,"unit":"sec","queries":$q,"canary":[${fmt3(canaryFirst)},${fmt3(canaryLast)}],"flagged_n":${all.count(_.flagged)},"sf":"${new java.io.File(sfDir).getName}","detail":"${new java.io.File(outPath).getName}"}"""
    }
    val line0 = compactLine(all)
    println(if (line0.length <= 1900) line0
            else compactLine(all.filterNot(_.name.endsWith(xs))))
    spark.stop()
  }

  // ---------------------------------------------------------------
  // Official-protocol orchestrator (round-10 verdict item 1).
  //
  // Why: r8/r9/r10 each shipped an official artifact with ghost
  // regressions (r10: pagerank_2m 11.1 s official vs 2.99 s judge-
  // isolated on identical code) that cost a verdict cycle each to
  // re-adjudicate. The clean recordings — the builder's re-records
  // and the judge's own runs — were ALWAYS the group-at-a-time
  // fresh-JVM shape. This makes that shape THE official protocol:
  //
  //   1. per group, WAIT for machine idleness before launching
  //      (instantaneous runnable-thread gate from /proc/loadavg
  //      field 4 — unlike the 1-minute average it does not drag the
  //      previous group's decaying load into the decision);
  //   2. launch the group in a fresh child JVM (same java, same
  //      module opens and heap, same classpath) with
  //      SPARK_GRAFT_GROUPS=<group> — no other group's fixtures, JIT
  //      churn, block-manager residue, or GC debt in the process;
  //   3. gate the child's result: zero per-row spread flags, and the
  //      child's end-state canary within CANARY_BAND of the cleanest
  //      accepted canary (all children time the identical fixture in
  //      equally-deep-JITted end states — r9 measured ±5% across
  //      recordings, so a >35% excursion is machine, not code);
  //   4. a gated-out group RETRIES (fresh JVM, after a cooldown) up
  //      to MAX_ATTEMPTS instead of being recorded; only if every
  //      attempt fails is the least-polluted attempt recorded, with
  //      every row flagged so it cannot masquerade as a clean number;
  //   5. after all groups: any group accepted EARLY against a then-
  //      weaker reference is re-checked against the final (cleanest)
  //      canary and re-run once if now out of band — so a polluted
  //      FIRST group cannot anchor the recording;
  //   6. the merged artifact carries the full gate manifest: per-
  //      attempt canaries, pre-launch load, verdicts, thresholds.
  //
  // The in-run 1-minute loadavg sentinel is recorded but NOT a gate:
  // r10 calibration showed it inseparable (clean x10 group 20.3 vs
  // polluted 27.8 — the bench's own task/GC threads dominate it).
  // The canary-drift bound and the one-outlier-tolerant row-spread
  // rule are the discriminators that actually separated clean from
  // polluted in r8-r10 adjudications.
  // ---------------------------------------------------------------

  private val AllGroups = Seq("main", "persist", "prodDedup", "zipf", "skew", "x10")
  private val MaxAttempts = 3
  // Canary gate, recalibrated on the round-11 attempt log (DESIGN.md
  // "Canary gate calibration"): across all nine r11 recordings the
  // row-spread rule caught EVERY genuinely polluted attempt —
  // including prodDedup attempt 1, whose canary ratio was only 1.10x
  // (under external load 12.4) — while the old hard 1.35x canary
  // reject produced the round's one false positive (prodDedup attempt
  // 2: zero row flags, heavy rows equal to the judge's isolated
  // values, canary 1.40x against a reference canary from a quieter
  // window). So row flags stay the PRIMARY discriminator; the canary
  // is a backstop that rejects a row-clean attempt only past
  // RowCleanBand (2.0x — observed polluted canaries sat at 6.1x, the
  // observed false reject at 1.40x), and a row-clean ratio inside
  // (CanaryBand, RowCleanBand] is accepted with an excursion note
  // (per-child queries_norm normalizes residual drift either way).
  private val CanaryBand = 1.35     // annotate row-clean excursions above this...
  private val RowCleanBand = 2.0    // ...reject even row-clean attempts above this
  private val PreGateRunnable = 2       // foreign runnable threads tolerated
  private val PreGateTimeoutMs = 180000L
  private val CooldownMs = 20000L

  // ---- sampling-protocol constants, pinned by BenchProtocolSpec ----
  // The v3.0 detour (DESIGN.md "Round-16 official recording" item 1)
  // proved the warm pass is load-bearing by measurement: dropping it
  // charged first-of-family rows their whole plan/codegen/C2 ramp in
  // BOTH samples (fuzzy_join read 2.3x steady state — a fake
  // regression costing an adjudication cycle). These constants ARE
  // the protocol: measureGroup and the spread/corroboration rules
  // read them, the manifest's "protocol" string embeds the version,
  // and BenchProtocolSpec fails if any value changes without
  // ProtocolVersion (and DESIGN.md "Sampling protocol") bumping.
  // v3.3 (round 15): main group warms each op ONCE (was twice; the
  // min-of-3 statistic already rejects first-sample residue), and
  // flagged-only attempts salvage via per-row TIME_OPS retries instead
  // of full-group re-runs. Sample counts and flag rules unchanged.
  private[graft] val ProtocolVersion = "v3.3"
  private[graft] val TimedSamples = 2       // per row, after the group warm pass
  private[graft] val EscalationSamples = 2  // extra samples for suspect rows
  private[graft] val SpreadRel = 1.5        // heavy-row spread: max/min beyond this...
  private[graft] val SpreadAbsSec = 0.2     // ...AND max-min beyond this => suspect
  private[graft] val HeavyRowFloorSec = 2.0 // escalated rows at/above report median
  private[graft] val LightCorroborationRel = 1.5   // light-row min must be reproduced
  private[graft] val LightCorroborationAbsSec = 0.05 // within rel x min + abs

  // Scaling-artifact interpretation thresholds (round-14, verdict
  // items 3 and 5):
  // - a row whose xMult runtime never clears OverheadFloorSec is
  //   fixed-overhead dominated — its exponent measures JVM/stage
  //   latency, not data scaling (r13: emb_dup_pairs x30 = 0.61 s read
  //   a meaningless -0.009). The x1 time alone cannot separate these
  //   (emb_dup_pairs x1 0.63 s vs dedup_minhash x1 0.62 s whose x30
  //   grew to 3.4 s) — what certifies an exponent is that the xM run
  //   actually outgrew fixed overhead. Flagged rows stay in `scaling`
  //   but are excluded from certification reading.
  // - when the sentinel's own exponent departs the committed
  //   reference by more than SentinelExcursionBand, the normalized
  //   exponent over-corrects ops with smaller working sets than the
  //   3.4 GB-shuffle sentinel (r13: diverse raw 0.801, norm 0.419,
  //   truth bracketed between). Healthy windows agree with the
  //   reference to ~±0.002 (r13: 0.6273/0.6287 vs 0.628); 0.05 is
  //   ~25x that agreement yet far under the smallest real excursion
  //   observed (+0.38).
  private[graft] val OverheadFloorSec = 1.0
  private[graft] val SentinelExcursionBand = 0.05

  // Host-class match (round-14, verdict item 6): the fingerprint
  // bands observed r10–r13, tabulated in DESIGN.md "Host classes".
  // Stamped into every artifact so adjudications stop re-deriving
  // "healthy vs volatile" from folklore. Bands key on the two probes
  // that predicted row inflation in practice: st_canary (r12's
  // bandwidth-starved host read 1.5x single-thread) and par_eff32
  // (the volatile fleet class swung 0.43–0.74 within minutes while
  // healthy windows held >= 0.8).
  private[graft] def hostClassOf(h: Map[String, Double]): String = {
    val st = h.getOrElse("st_canary", Double.NaN)
    val pe = h.getOrElse("par_eff32", Double.NaN)
    if (st.isNaN || pe.isNaN) "unknown"
    else if (st <= 0.55 && pe >= 0.80) "fleet-healthy"
    else if (st <= 0.55 && pe >= 0.55) "fleet-loaded"
    else "fleet-volatile"
  }

  private final case class Row(group: String, name: String, value: Double,
    samples: Seq[Double], flagged: Boolean)
  private final case class Attempt(group: String, idx: Int,
    preLoad: Double, preRunnable: Int, exit: Int,
    canaryFirst: Double, canaryLast: Double, sentinel: Double,
    rows: Seq[Row], flagged: Seq[String], reasons: Seq[String],
    notes: Seq[String], durSec: Double, artifact: String,
    host: Map[String, Double] = Map.empty,
    scaleSentinel: Map[String, Double] = Map.empty) {
    def ok: Boolean = reasons.isEmpty
  }

  private def orchestrated(): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    import scala.jdk.CollectionConverters._

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val xMult = sys.env.getOrElse("SPARK_GRAFT_X", "10").toInt
    val xs = s"_x$xMult"
    // history-fed per-group cost estimates (round-12 verdict item 2):
    // r12's est(g) bootstrapped from nothing and underestimated early
    // groups badly enough that the budget was spent before the last
    // two (x10 pending, arithmetic at -290 s). The orchestrator now
    // reads the previous recording's per-group durations from a small
    // history file (written back at the end of every run) and scales
    // them by THIS host's observed/estimated ratio as groups complete.
    val estPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_EST",
      "bench-history.json")
    val estHist: Map[String, Double] =
      try {
        JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(estPath)), "UTF-8")) match {
          case o: JObject => o.obj.collect {
            case (k, JDouble(d))  => k -> d
            case (k, JInt(i))     => k -> i.toDouble
            case (k, JDecimal(d)) => k -> d.toDouble
          }.toMap
          case _ => Map.empty
        }
      } catch { case _: Exception => Map.empty }
    // SPARK_GRAFT_ORCH_GROUPS restricts the orchestrated group list —
    // a smoke/debug knob for the PROTOCOL itself (SPARK_GRAFT_GROUPS
    // would bypass orchestration entirely); the official artifact
    // always runs the full list. Groups run main-first (the headline
    // group, and the canary reference anchor), then cheapest-first by
    // history (round-12 verdict item 2): when the budget degrades
    // mid-run anyway, the maximum number of groups is already
    // recorded and the forced pending lands on the single most
    // expensive group — the one a per-group adjudication re-run can
    // reproduce in isolation.
    val Groups: Seq[String] = {
      val g0 = sys.env.get("SPARK_GRAFT_ORCH_GROUPS")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(AllGroups)
      val (mains, rest) = g0.partition(_ == "main")
      mains ++ rest.sortBy(g => estHist.getOrElse(g, Double.MaxValue))
    }
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-bench-").toFile

    // Total wall budget (round-11 verdict item 1b): the r11 official
    // run burned ~28 minutes on gated prodDedup retries and was then
    // killed by the driver's wall-clock limit mid-x10 — with five
    // finished per-group artifacts lost in the temp dir. The budget
    // makes the protocol degrade instead of dying: when the remaining
    // budget cannot fund a retry PLUS one attempt for every group
    // still waiting, retries stop and the least-polluted attempt is
    // recorded with flags; a group the budget cannot fund at all is
    // recorded as "pending". Every decision lands in the manifest.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "2700").toDouble
    val startNanos = System.nanoTime()
    def remainingSec: Double =
      budgetSec - (System.nanoTime() - startNanos) / 1e9
    // per-attempt cost estimate, best evidence first: the group's own
    // last attempt THIS run; else its history duration scaled by this
    // host's observed median (observed / history) ratio over completed
    // groups; else the costliest attempt observed so far +25%; else
    // 150 s. The host scale is what makes a slower-than-history
    // machine degrade EARLY (before the reserve goes negative) instead
    // of after (r12's failure shape).
    val lastDurSec = scala.collection.mutable.Map[String, Double]()
    // groups whose best duration evidence is a truncated (killed) or
    // failed attempt: their lastDurSec is a LOWER bound on the true
    // cost, good enough as an in-run launch-gate floor but poison for
    // bench-history.json — writing it back would make the next run
    // underestimate exactly the group that needed more budget (r13
    // advice item 3). Cleared when a finished exit-0 attempt lands.
    val durTainted = scala.collection.mutable.Set[String]()
    def hostScale: Double = {
      val ratios = lastDurSec.toSeq.flatMap { case (g, d) =>
        estHist.get(g).filter(_ > 0).map(d / _)
      }.sorted
      if (ratios.isEmpty) 1.0 else ratios(ratios.size / 2)
    }
    def estSec(g: String): Double = lastDurSec.getOrElse(g,
      estHist.get(g).map(_ * hostScale).getOrElse(
        if (lastDurSec.nonEmpty) lastDurSec.values.max * 1.25 else 150.0))
    val budgetNotes = scala.collection.mutable.LinkedHashMap[String, String]()

    // child launch ingredients: same JVM binary, same module opens /
    // heap / -D flags, same classpath as THIS process (sbt's forked
    // run passes the real classpath on the command line)
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    val cp = sys.props("java.class.path")

    def loadavgParts(): (Double, Int) =
      try {
        val parts = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")
        (parts(0).toDouble, parts(3).split("/")(0).toInt)
      } catch { case _: Exception => (-1.0, -1) }

    // pre-launch idleness gate: median instantaneous runnable count
    // over 5 samples (2 s apart), excluding this thread. Waits up to
    // PreGateTimeoutMs for a quiet window, then launches regardless
    // (the post-run gates decide; refusing to launch would burn an
    // attempt without producing evidence).
    def preGate(maxWaitMs: Long): (Double, Int) = {
      val deadline = System.nanoTime() + maxWaitMs * 1000000L
      var res = (-1.0, Int.MaxValue)
      var done = false
      while (!done) {
        val samples = (1 to 5).map { _ =>
          Thread.sleep(2000); loadavgParts()
        }
        val runnables = samples.map(s => math.max(0, s._2 - 1)).sorted
        val medianRun = runnables(runnables.size / 2)
        res = (samples.last._1, medianRun)
        done = medianRun <= PreGateRunnable || System.nanoTime() > deadline
      }
      res
    }

    def num(v: JValue): Double = v match {
      case JDouble(d)  => d
      case JInt(i)     => i.toDouble
      case JLong(l)    => l.toDouble
      case JDecimal(d) => d.toDouble
      case _           => Double.NaN
    }

    def runChild(group: String, idx: Int, minCanary: Double,
        preWaitMs: Long = PreGateTimeoutMs,
        timeOps: Option[Seq[String]] = None): Attempt = {
      val (preLoad, preRun) = preGate(preWaitMs)
      val out = new java.io.File(tmpDir, s"$group-a$idx.json")
      val log = new java.io.File(tmpDir, s"$group-a$idx.log")
      val pb = new ProcessBuilder(
        (Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")).asJava)
      pb.directory(new java.io.File(sys.props("user.dir")))
      pb.redirectErrorStream(true)
      pb.redirectOutput(log)
      pb.environment().put("SPARK_GRAFT_GROUPS", group)
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", out.getPath)
      pb.environment().put("SPARK_GRAFT_ORCHESTRATE", "false")
      // per-row retry (round-14 verdict item 2): the child warms the
      // full group but times only these rows — group-comparable values
      // at a fraction of a full attempt's budget
      timeOps.foreach(ts =>
        pb.environment().put("SPARK_GRAFT_TIME_OPS", ts.mkString(",")))
      System.err.println(s"[bench] $group attempt $idx: launching" +
        timeOps.map(ts => s" [row-retry: ${ts.mkString("+")}]").getOrElse("") +
        s" (pre-gate load=$preLoad runnable=$preRun)")
      val t0 = System.nanoTime()
      // hard child timeout (round-12 verdict item 2): a child may not
      // spend past the remaining budget plus a small grace — the r12
      // driver run went to -290 s because overruns were unbounded.
      // A killed child leaves no artifact, so it gates out below and
      // the budget arithmetic at every later decision stays funded.
      val proc = pb.start()
      val graceSec = 60.0
      val timeoutMs = math.max(60000L,
        ((remainingSec + graceSec) * 1000).toLong)
      val finished = proc.waitFor(timeoutMs,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      val timedOut = !finished
      if (timedOut) { proc.destroyForcibly(); proc.waitFor() }
      val exit = proc.exitValue()
      val durSec = (System.nanoTime() - t0) / 1e9
      if (timeOps.isDefined) {
        // a row-retry's duration covers the full warm but a subset of
        // the timed loop — neither a full-attempt cost nor a taint;
        // keep it out of the estimate machinery entirely
      } else if (!timedOut && exit == 0) {
        lastDurSec(group) = durSec
        durTainted -= group
      } else {
        // truncated/failed duration: keep only as a floor for in-run
        // estimates, and mark the group so it never reaches history
        durTainted += group
        lastDurSec(group) = math.max(durSec, lastDurSec.getOrElse(group, durSec))
      }

      val reasons = Seq.newBuilder[String]
      if (exit != 0) reasons += s"exit=$exit"
      if (timedOut) reasons += "budget-timeout"
      val parsed: Option[(Seq[Row], Seq[String], Double, Double, Double,
          Map[String, Double], Map[String, Double])] =
        try {
          val root = JsonMethods.parse(
            new String(java.nio.file.Files.readAllBytes(out.toPath), "UTF-8"))
            .asInstanceOf[JObject]
          def field(n: String): JValue =
            root.obj.collectFirst { case (k, v) if k == n => v }
              .getOrElse(JNothing)
          val samples = field("samples").asInstanceOf[JObject].obj.map {
            case (k, JArray(vs)) => k -> vs.map(num)
            case (k, _)          => k -> Nil
          }.toMap
          val flagged = field("flagged") match {
            case JArray(vs) => vs.collect { case JString(s) => s }
            case _          => Nil
          }
          val rows = field("queries").asInstanceOf[JObject].obj.map {
            case (k, v) => Row(group, k, num(v),
              samples.getOrElse(k, Nil), flagged.contains(k))
          }
          val canary = field("canary").asInstanceOf[JObject].obj
            .map { case (k, v) => k -> num(v) }.toMap
          val sentinel = field("loadavg_1m") match {
            case o: JObject if o.obj.nonEmpty => o.obj.map(f => num(f._2)).max
            case _                            => -1.0
          }
          def numMap(n: String): Map[String, Double] = field(n) match {
            case o: JObject => o.obj.map { case (k, v) => k -> num(v) }.toMap
            case _          => Map.empty
          }
          Some((rows, flagged, canary.getOrElse("first", Double.NaN),
            canary.getOrElse("last", Double.NaN), sentinel,
            numMap("host"), numMap("scale_sentinel")))
        } catch { case e: Exception =>
          reasons += s"artifact-unparseable(${e.getClass.getSimpleName})"
          None
        }
      val (rows, flagged, cFirst, cLast, sentinel, hostMap, scaleSent) =
        parsed.getOrElse((Nil, Nil, Double.NaN, Double.NaN, -1.0,
          Map.empty[String, Double], Map.empty[String, Double]))
      if (flagged.nonEmpty) reasons += s"flagged=${flagged.mkString("+")}"
      // recalibrated canary backstop (constants doc above): reject a
      // row-clean attempt only past RowCleanBand; annotate inside
      // (CanaryBand, RowCleanBand]
      val notes = Seq.newBuilder[String]
      if (!cLast.isNaN && minCanary < Double.MaxValue) {
        if (cLast > RowCleanBand * minCanary)
          reasons += f"canary-drift(${cLast}%.4f > $RowCleanBand x $minCanary%.4f)"
        else if (cLast > CanaryBand * minCanary && flagged.isEmpty)
          notes += f"canary-excursion(${cLast}%.4f vs ref $minCanary%.4f; rows clean)"
      }
      if (cLast.isNaN && parsed.isDefined) reasons += "canary-missing"
      val a = Attempt(group, idx, preLoad, preRun, exit, cFirst, cLast,
        sentinel, rows, flagged, reasons.result(), notes.result(), durSec,
        out.getName, hostMap, scaleSent)
      System.err.println(s"[bench] $group attempt $idx: " +
        (if (a.ok) f"clean (canary ${cLast}%.4f" +
           (if (a.notes.nonEmpty) s"; ${a.notes.mkString("; ")}" else "") + ")"
         else s"polluted [${a.reasons.mkString("; ")}]") +
        f" [${durSec}%.0f s, budget ${remainingSec}%.0f s left]")
      a
    }

    var minCanary = Double.MaxValue
    val attemptLog = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Attempt]]()
    val chosen = scala.collection.mutable.LinkedHashMap[String, Attempt]()

    // ---- per-row retry machinery (round-14 verdict item 2) ----
    // an attempt disqualified ONLY by row-spread flags (exit 0, canary
    // in band, artifact parsed) is salvageable row by row
    def onlyFlagged(a: Attempt): Boolean =
      a.reasons.nonEmpty && a.reasons.forall(_.startsWith("flagged="))
    // cost of a row-retry child: the group's fixture/warm overhead
    // (attempt duration minus its timed loop) + a full sample-and-
    // escalation budget for just the retried rows, +25% margin
    def rowRetryEst(a: Attempt): Double = {
      val rowSum = a.rows.map(_.value).sum
      val retrySum = a.rows.filter(r => a.flagged.contains(r.name))
        .map(_.value).sum
      val overhead = math.max(a.durSec - (TimedSamples + 1) * rowSum, 30.0)
      (overhead + rowSum +
        (TimedSamples + EscalationSamples) * retrySum) * 1.25
    }
    // merge a row-retry child into its base attempt: re-measured rows
    // replace their originals (values, samples, flags); the merged
    // attempt is clean only when nothing stays flagged and the retry
    // child passed its own canary gate
    def mergedRowRetry(base: Attempt, rr: Attempt): Attempt = {
      val byName = rr.rows.map(r => r.name -> r).toMap
      val rows2 = base.rows.map(r => byName.getOrElse(r.name, r))
      val flagged2 = rows2.filter(_.flagged).map(_.name)
      val reasons2 =
        (if (flagged2.nonEmpty) Seq(s"flagged=${flagged2.mkString("+")}")
         else Nil) ++ rr.reasons.filterNot(_.startsWith("flagged="))
      base.copy(rows = rows2, flagged = flagged2, reasons = reasons2,
        notes = base.notes :+
          s"row-retry(a${rr.idx}: ${byName.keys.toSeq.sorted.mkString("+")})")
    }

    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "BENCH_full_builder.json")
    def fmt(d: Double): String =
      if (d.isNaN) "null" else ((d * 10000).round / 10000.0).toString
    def fmt3(d: Double): String =
      if (d.isNaN) "null" else ((d * 1000).round / 1000.0).toString

    // ---- merged-artifact writer, flushed INCREMENTALLY (round-11
    // verdict item 1a: the r11 run died mid-x10 with five finished
    // groups in the temp dir and rc=124/parsed=null as the round's
    // only bench evidence). Called after EVERY group decision and
    // every pass-2 update, so a kill at any point leaves a parsed
    // artifact: decided groups carry their rows, undecided groups are
    // listed in "pending" and marked "status":"pending" in the
    // manifest. The final call additionally prints the compact line.
    def writeMerged(finalWrite: Boolean): Unit = {
      val decided = Groups.filter(chosen.contains)
      val pending = Groups.filterNot(chosen.contains)
      val allRows: Seq[Row] = decided.flatMap(g => chosen(g).rows)
      val byName = allRows.map(r => r.name -> r.value).toMap
      val canaryLastOf: Map[String, Double] =
        decided.map(g => g -> chosen(g).canaryLast).toMap
      // headline total: main loop + dedup_minhash + pipeline_e2e. The
      // main-loop op set grew in r11 (gb_corr fast/exact split) and
      // r12 (+rolling_var, rolling_corr), so raw totals compare only
      // to rounds sharing the set (r12+); cross-round reads use the
      // per-row queries_norm block (r12 advice item 3)
      val total = allRows.filter(r => r.group == "main" ||
        r.name == "dedup_minhash" || r.name == "pipeline_e2e").map(_.value).sum
      val qs = allRows.map(r => "\"" + r.name + "\":" + fmt(r.value))
        .mkString("{", ",", "}")
      // per-row normalization by the OWN group's end-state canary
      // (each child is its own drift reference)
      val qsNorm = allRows.map { r =>
        val c = canaryLastOf.getOrElse(r.group, Double.NaN)
        "\"" + r.name + "\":" +
          (if (c.isNaN || c <= 0) "null" else fmt(r.value / c))
      }.mkString("{", ",", "}")
      val scalingAlias = Map("pq_adc_topk_fixedq" -> "pq_adc_topk")
      // combined pq_adc_topk grows corpus AND query batch — a labeled
      // throughput row, never an exponent (round-12 verdict item 4);
      // pq_adc_topk_fixedq is the certified corpus-scaling row
      val scalingExclude = Set("pq_adc_topk")
      // (name, exponent, tM) — tM feeds the overhead-dominated floor
      val scalingRows: Seq[(String, Double, Double)] =
        allRows.filter(_.name.endsWith(xs)).flatMap { r =>
          val name0 = r.name.stripSuffix(xs)
          val base = scalingAlias.getOrElse(name0, name0)
          if (scalingExclude.contains(name0)) None
          else byName.get(base).filter(_ => r.value > 0).map { t1 =>
            (name0, math.log10(r.value / t1) / math.log10(xMult.toDouble),
              r.value)
          }
        }
      val scalingVals: Seq[(String, Double)] = scalingRows.map(r => r._1 -> r._2)
      val overheadDominated = scalingRows.collect {
        case (n, _, tM) if tM < OverheadFloorSec => n }
      def expJson(vs: Seq[(String, Double)]): String = vs.map { case (n, e) =>
        "\"" + n + "\":" + (e * 10000).round / 10000.0
      }.mkString("{", ",", "}")
      val scaling = expJson(scalingVals)
      // sentinel normalization (doc at sentinelBuild in record()): the
      // x10 child's own scale-matched shuffle sentinel supplies e_s
      // and the committed reference e_ref (the child embeds both);
      // e_norm = e_raw - (e_s - e_ref). The x10 child is the right
      // source: the same JVM and window as every xMult exponent row.
      val sentMap: Map[String, Double] = chosen.get("x10")
        .map(_.scaleSentinel).getOrElse(Map.empty)
      val sentExp: Option[Double] = sentMap.get("exponent")
      // no committed reference for this xMult => omit the norm column
      // (never default ref to 1.0 — r13 advice item 1; doc at the
      // record()-path twin of this block)
      val sentRef: Option[Double] = sentMap.get("ref")
      val scalingNorm = (for { es <- sentExp; ref <- sentRef } yield
        expJson(scalingVals.map { case (n, e) => n -> (e - (es - ref)) })
      ).getOrElse("{}")
      val scalingNormNote =
        if (sentExp.isDefined && sentRef.isEmpty)
          s""","scaling_norm_note":"no committed sentinel reference for x$xMult - normalization omitted, raw scaling stands""""
        else ""
      // mechanical excursion bracket (r13 verdict item 3; doc at
      // SentinelExcursionBand): bounds emitted by the instrument, not
      // hand-derived in DESIGN.md prose
      val excursionJson = (for { es <- sentExp; ref <- sentRef } yield
        s""","sentinel_excursion":${math.abs(es - ref) > SentinelExcursionBand}"""
      ).getOrElse("")
      val scalingBoundsJson = (for {
        es <- sentExp; ref <- sentRef
        if math.abs(es - ref) > SentinelExcursionBand
      } yield ",\"scaling_bounds\":" + scalingVals.map { case (n, e) =>
        val norm = e - (es - ref)
        "\"" + n + "\":[" + fmt(math.min(e, norm)) + "," +
          fmt(math.max(e, norm)) + "]"
      }.mkString("{", ",", "}")).getOrElse("")
      val overheadJson =
        if (scalingRows.isEmpty) ""
        else ",\"scaling_overhead_dominated\":" +
          overheadDominated.map("\"" + _ + "\"").mkString("[", ",", "]")
      val sentinel2Json = sentMap.toSeq.sortBy(_._1).map { case (k, v) =>
        "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      // host fingerprint: the main child's probes (first decided child
      // as the fallback) — per-attempt fingerprints stay in the
      // per-group artifacts under manifest.logs
      val hostMap: Map[String, Double] = chosen.get("main")
        .orElse(chosen.values.headOption).map(_.host).getOrElse(Map.empty)
      val hostJson = hostMap.toSeq.sortBy(_._1).map { case (k, v) =>
        "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      val samplesJson = allRows.map(r =>
        "\"" + r.name + "\":[" + r.samples.map(fmt).mkString(",") + "]")
        .mkString("{", ",", "}")
      val sentinelJson = decided.map(g =>
        "\"" + g + "\":" + fmt(chosen(g).sentinel)).mkString("{", ",", "}")
      val flaggedRows = allRows.filter(_.flagged).map(_.name)
      val flaggedJson = flaggedRows.map("\"" + _ + "\"")
        .mkString("[", ",", "]")
      val pendingJson = pending.map("\"" + _ + "\"").mkString("[", ",", "]")
      // degraded-window redirect (r13 verdict item 4): an artifact
      // carrying pending groups or flagged rows points its reader at
      // the clean same-round artifact machine-readably, instead of
      // leaving pending_n + flags as the file's last word. Explicit
      // env override first; else BENCH_r{N}.json redirects to its
      // builder twin when that file exists in the cwd (the builder
      // records before the driver's round-end run).
      val authoritative: Option[String] =
        if (pending.isEmpty && flaggedRows.isEmpty) None
        else sys.env.get("SPARK_GRAFT_AUTHORITATIVE").orElse {
          "^BENCH_r(\\d+)\\.json$".r
            .findFirstMatchIn(new java.io.File(outPath).getName)
            .map(m => s"BENCH_r${m.group(1)}_builder.json")
            .filter(p => new java.io.File(p).isFile)
        }
      // the cross-recording canary: first from the main child, last =
      // the cleanest end-state canary across children (the reference
      // every group was gated against)
      val firstChild: Option[Attempt] =
        chosen.get("main").orElse(chosen.values.headOption)
      val cFirst = firstChild.map(_.canaryFirst).getOrElse(Double.NaN)
      val cRef = if (minCanary == Double.MaxValue) Double.NaN else minCanary
      val canaryJson = s"""{"first":${fmt(cFirst)},"last":${fmt(cRef)}}"""
      val manifest = {
        val gates = s"""{"protocol":"per-group-fresh-jvm/$ProtocolVersion",""" +
          s""""canary_band":$CanaryBand,"row_clean_band":$RowCleanBand,""" +
          s""""canary_rule":"row flags primary; canary rejects row-clean only past row_clean_band, annotates past canary_band (r11 calibration, DESIGN.md)",""" +
          s""""budget_sec":${budgetSec.toLong},""" +
          s""""pre_gate_runnable":$PreGateRunnable,""" +
          s""""pre_gate_timeout_sec":${PreGateTimeoutMs / 1000},""" +
          s""""max_attempts":$MaxAttempts,"cooldown_sec":${CooldownMs / 1000},""" +
          s""""row_flag_rule":"heavy rows: spread>1.5x && >0.2s one-outlier-tolerant; light rows (v3.2): min corroborated by >=2 samples within 1.5x+0.05s",""" +
          s""""in_run_sentinel":"diagnostic only - r10 calibration: clean 20.3 vs polluted 27.8, inseparable"}"""
        val groupsJson = Groups.map { g =>
          val as = attemptLog.getOrElse(g,
            scala.collection.mutable.ArrayBuffer.empty[Attempt]).map { a =>
            s"""{"attempt":${a.idx},"pre_load":${fmt(a.preLoad)},""" +
              s""""pre_runnable":${a.preRunnable},"exit":${a.exit},""" +
              s""""canary_first":${fmt(a.canaryFirst)},""" +
              s""""canary_last":${fmt(a.canaryLast)},""" +
              s""""sentinel":${fmt(a.sentinel)},""" +
              s""""dur_sec":${fmt(a.durSec)},""" +
              s""""verdict":"${(if (a.ok) "clean" +
                  (if (a.notes.nonEmpty) " (" + a.notes.mkString("; ") + ")"
                   else "")
                else a.reasons.mkString("; ")).replace("\"", "'")}"}"""
          }.mkString("[", ",", "]")
          val status = chosen.get(g) match {
            case Some(a) =>
              s""""status":"recorded","recorded_attempt":${a.idx},""" +
                s""""recorded_clean":${a.reasons.isEmpty}"""
            case None => s""""status":"pending""""
          }
          val bn = budgetNotes.get(g).map(n =>
            s""","budget_note":"${n.replace("\"", "'")}"""").getOrElse("")
          // a pending or flagged group carries the redirect per-group
          // too (r13 verdict item 4's "or per-group superseded_by")
          val gDegraded = !chosen.contains(g) ||
            chosen(g).rows.exists(_.flagged)
          val sup = if (gDegraded) authoritative.map(p =>
            s""","superseded_by":"$p"""").getOrElse("") else ""
          s"""{"group":"$g","attempts":$as,$status$bn$sup}"""
        }.mkString("[", ",", "]")
        val estJson = Groups.map(g =>
          "\"" + g + "\":" + fmt(estSec(g))).mkString("{", ",", "}")
        s"""{"gates":$gates,"groups":$groupsJson,""" +
          s""""canary_ref":${fmt(cRef)},""" +
          authoritative.map(p => s""""authoritative":"$p",""").getOrElse("") +
          s""""est_source":"$estPath","host_scale":${fmt(hostScale)},""" +
          s""""est_sec":$estJson,""" +
          s""""elapsed_sec":${fmt(budgetSec - remainingSec)},""" +
          s""""logs":"${tmpDir.getPath}"}"""
      }
      val fullJson =
        s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"canary":$canaryJson,"host":$hostJson,"host_class":"${hostClassOf(hostMap)}","scale_sentinel":$sentinel2Json,"queries_norm":$qsNorm,"scaling":$scaling,"scaling_norm":$scalingNorm$scalingNormNote$excursionJson$scalingBoundsJson$overheadJson,"samples":$samplesJson,"loadavg_1m":$sentinelJson,"flagged":$flaggedJson,"pending":$pendingJson,"sf":"$sfDir","manifest":$manifest}"""
      // atomic replace: write a temp sibling then move over the target,
      // so a kill DURING a flush can't leave a truncated artifact
      try {
        val target = java.nio.file.Paths.get(outPath).toAbsolutePath
        val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
        java.nio.file.Files.write(tmp, fullJson.getBytes("UTF-8"))
        try java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
          java.nio.file.Files.move(tmp, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      } catch { case e: Exception =>
        System.err.println(s"bench: could not write $outPath: $e")
        if (finalWrite) println(fullJson)
      }
      if (finalWrite) {
        def compactLine(rs: Seq[Row]): String = {
          val q = rs.map(r => "\"" + r.name + "\":" + fmt3(r.value))
            .mkString("{", ",", "}")
          s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":$q,"canary":[${fmt3(cFirst)},${fmt3(cRef)}],"flagged_n":${flaggedRows.size},"pending_n":${pending.size},"sf":"${new java.io.File(sfDir).getName}","detail":"${new java.io.File(outPath).getName}"}"""
        }
        val line0 = compactLine(allRows)
        println(if (line0.length <= 1900) line0
                else compactLine(allRows.filterNot(_.name.endsWith(xs))))
      }
    }

    // pass 1: each group until an attempt passes the gates, under the
    // wall budget (doc at budgetSec above)
    for ((g, gi) <- Groups.zipWithIndex) {
      val buf = attemptLog.getOrElseUpdate(g,
        scala.collection.mutable.ArrayBuffer.empty[Attempt])
      // reserve: one attempt for every group still waiting after this
      def reserveSec: Double = Groups.drop(gi + 1).map(estSec).sum
      if (remainingSec < estSec(g)) {
        // cannot fund one full attempt: leave the group pending rather
        // than launch into a guaranteed overrun (r12 launched skew
        // with est > remaining and drove the arithmetic to -290 s) —
        // the flushed artifact says so instead of an rc=124 hole
        budgetNotes(g) = f"pending: budget exhausted before first attempt " +
          f"(${remainingSec}%.0f s left, est ${estSec(g)}%.0f s)"
        System.err.println(s"[bench] $g: ${budgetNotes(g)}")
      } else {
        var accepted: Option[Attempt] = None
        // best row-retry-merged partial (some rows salvaged): a better
        // degraded record than an all-flagged raw attempt
        var partial: Option[Attempt] = None
        var i = 1
        var budgetStop = false
        while (accepted.isEmpty && i <= MaxAttempts && !budgetStop) {
          if (i > 1 && remainingSec < estSec(g) + reserveSec) {
            // a retry would eat the waiting groups' budget: degrade to
            // recording the least-polluted attempt instead of dying
            // at the driver's wall limit mid-protocol
            budgetNotes(g) = f"retries stopped by budget after attempt ${i - 1} " +
              f"(${remainingSec}%.0f s left, est ${estSec(g)}%.0f s + " +
              f"reserve ${reserveSec}%.0f s)"
            System.err.println(s"[bench] $g: ${budgetNotes(g)}")
            budgetStop = true
          } else {
            // budget-capped pre-gate wait: never spend the waiting
            // groups' reserve idling for a quiet window
            val slackMs = ((remainingSec - estSec(g) - reserveSec) * 1000).toLong
            val preWait = math.max(10000L, math.min(PreGateTimeoutMs, slackMs))
            val a = runChild(g, i, minCanary, preWait)
            buf += a
            i += 1
            var cur = a
            // per-row retries (doc at rowRetryEst): an attempt whose
            // ONLY gate failure is row-spread flags re-measures just
            // those rows — the r12-r14 driver windows could never fund
            // full-group retries and shipped flagged rows three rounds
            // running; a row-retry costs ~warm-pass money
            while (!cur.ok && onlyFlagged(cur) && i <= MaxAttempts &&
                   remainingSec >
                     rowRetryEst(cur) + reserveSec + CooldownMs / 1000.0) {
              Thread.sleep(CooldownMs)
              val rr = runChild(g, i, minCanary, preWait,
                timeOps = Some(cur.flagged))
              buf += rr
              cur = mergedRowRetry(cur, rr)
              i += 1
            }
            if (cur.ok) {
              accepted = Some(cur)
              if (!cur.canaryLast.isNaN)
                minCanary = math.min(minCanary, cur.canaryLast)
            } else {
              if (!(cur eq a)) partial = Some(cur)
              if (i <= MaxAttempts &&
                  remainingSec > estSec(g) + reserveSec + CooldownMs / 1000.0)
                Thread.sleep(CooldownMs)
            }
          }
        }
        chosen(g) = accepted.orElse(partial).getOrElse {
          // every attempt failed (or budget stopped retries): record
          // the least-polluted one with EVERY row flagged — a polluted
          // group must not masquerade. A row-retry partial is the
          // preferred degraded record: its per-row flags are accurate
          // (salvaged rows clean, unsalvaged rows flagged).
          val best = buf.filter(_.rows.nonEmpty)
            .sortBy(a => if (a.canaryLast.isNaN) Double.MaxValue
                         else a.canaryLast)
            .headOption.getOrElse(buf.last)
          best.copy(rows = best.rows.map(_.copy(flagged = true)))
        }
      }
      writeMerged(finalWrite = false)
    }
    // pass 2 (fixed point — r11 advice item 4): recompute the cleanest
    // accepted canary over ALL decided groups, re-check every decided
    // group against it, re-run once per group; an accepted re-run can
    // itself lower the reference, so iterate until no group is out of
    // band (bounded: each group re-runs at most once). The re-check
    // band is RowCleanBand — accepted attempts are row-clean by
    // construction, so the row-clean backstop is the operative bound.
    val rerun = scala.collection.mutable.Set[String]()
    var p2changed = true
    while (p2changed) {
      p2changed = false
      minCanary = chosen.values
        .filter(a => a.reasons.isEmpty && !a.canaryLast.isNaN)
        .map(_.canaryLast).foldLeft(Double.MaxValue)(math.min)
      for (g <- Groups if chosen.contains(g) && !rerun(g) && !p2changed) {
        val a = chosen(g)
        if (a.reasons.isEmpty && !a.canaryLast.isNaN &&
            minCanary < Double.MaxValue &&
            a.canaryLast > RowCleanBand * minCanary) {
          rerun += g
          if (remainingSec < estSec(g)) {
            budgetNotes(g) = budgetNotes.get(g).map(_ + "; ").getOrElse("") +
              f"post-hoc canary re-check skipped by budget (${remainingSec}%.0f s left)"
            System.err.println(s"[bench] $g: ${budgetNotes(g)}")
            // a canary-out-of-band group whose re-run the budget cannot
            // fund must NOT masquerade as clean (r12 advice item 1:
            // BENCH_X30_r12's main group read canary 4.26x the final
            // reference yet recorded_clean:true because this branch
            // left reasons empty) — flag its rows and set the reason,
            // exactly like the pass-1 all-attempts-failed fallback;
            // the budget_note stays as the explanation
            chosen(g) = a.copy(
              rows = a.rows.map(_.copy(flagged = true)),
              reasons = Seq("post-hoc-canary-drift; re-check budget-skipped"))
            writeMerged(finalWrite = false)
          } else {
            System.err.println(s"[bench] $g: accepted canary " +
              f"${a.canaryLast}%.4f now out of band vs final reference " +
              f"$minCanary%.4f - re-running once")
            val retry = runChild(g, attemptLog(g).size + 1, minCanary)
            attemptLog(g) += retry
            chosen(g) =
              if (retry.ok) retry
              else a.copy(rows = a.rows.map(_.copy(flagged = true)),
                reasons = Seq("post-hoc-canary-drift; retry also polluted"))
            writeMerged(finalWrite = false)
            p2changed = true
          }
        }
      }
    }
    writeMerged(finalWrite = true)
    // write back this run's per-group durations (raw seconds on THIS
    // host; a future run on a different host corrects via hostScale)
    // so the next recording's estimates are history-fed from the start
    try {
      // tainted groups keep their prior history value (or stay absent)
      // — a killed child's truncated duration must not become the
      // group's cost estimate (r13 advice item 3)
      val merged = estHist ++ lastDurSec.filterNot(kv => durTainted(kv._1))
      val json = merged.toSeq.sortBy(_._1).map { case (g, d) =>
        "\"" + g + "\":" + fmt(d) }.mkString("{", ",", "}")
      java.nio.file.Files.write(java.nio.file.Paths.get(estPath),
        json.getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"bench: could not write $estPath: $e")
    }
  }
}
