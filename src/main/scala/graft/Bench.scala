package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** One rep's executor-side footprint, snapshotted from a
    * [[RepProbe]] after the listener bus drains: the three quantities
    * that separate "the query got slower" from "the host got slower" —
    * GC time (memory pressure), shuffle volume (did the PLAN change?),
    * and the longest single task (straggler vs uniform slowdown).
    */
  private[graft] final case class RepMetrics(
      gcMs: Long, shuffleReadMb: Double, shuffleWriteMb: Double,
      maxTaskMs: Long) {
    def json: String = String.format(java.util.Locale.ROOT,
      """{"gc_ms":%d,"shuffle_read_mb":%.1f,"shuffle_write_mb":%.1f,"max_task_ms":%d}""",
      Long.box(gcMs), Double.box(shuffleReadMb), Double.box(shuffleWriteMb),
      Long.box(maxTaskMs))
  }

  /** Task-end accumulator for one rep (reset between reps). Registered
    * once on the shared queue; counters are atomic because task-end
    * events arrive on the bus thread while the timing loop runs on main.
    */
  private[graft] final class RepProbe
      extends org.apache.spark.scheduler.SparkListener {
    private val gc = new java.util.concurrent.atomic.AtomicLong
    private val sr = new java.util.concurrent.atomic.AtomicLong
    private val sw = new java.util.concurrent.atomic.AtomicLong
    private val mt = new java.util.concurrent.atomic.AtomicLong

    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        gc.addAndGet(m.jvmGCTime)
        sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
      if (e.taskInfo != null)
        mt.accumulateAndGet(e.taskInfo.duration, math.max(_, _))
    }

    def reset(): Unit = { gc.set(0); sr.set(0); sw.set(0); mt.set(0) }

    def snapshot(): RepMetrics = RepMetrics(gc.get,
      sr.get / 1048576.0, sw.get / 1048576.0, mt.get)
  }

  /** Cells whose finite reps disagree by >3× — the recurring
    * driver-window spike shape (`ts_daily_active_users` r17-r19): one
    * rep stalls, the others floor. These get their per-rep metrics
    * emitted so the spike is attributable (GC? shuffle? straggler?)
    * instead of re-litigated as "host noise" each round.
    */
  private[graft] def spikeCells(repTimes: Map[String, Seq[Double]]): Set[String] =
    repTimes.collect {
      case (n, ts) if {
        val f = ts.filterNot(_.isInfinite)
        f.size >= 2 && f.max > 3 * f.min
      } => n
    }.toSet

  /** Median of the finite reps (upper-mid on even counts, like the
    * suspect threshold's registry median).
    */
  private[graft] def repMedian(ts: Seq[Double]): Double = {
    val f = ts.filterNot(_.isInfinite).sorted
    if (f.isEmpty) Double.PositiveInfinity else f(f.size / 2)
  }

  /** Cells worth one more rep after the sweep: above 5× the registry
    * median AND above an absolute 2 s floor (a sub-2s cell can never
    * move a headline enough to matter; re-running it only adds noise).
    * Failed (infinite) cells are errors, not stalls.
    */
  private[graft] def suspectCells(first: Map[String, Double]): Set[String] = {
    val finite = first.values.filterNot(_.isInfinite).toSeq.sorted
    val median = if (finite.isEmpty) 0.0 else finite(finite.size / 2)
    val threshold = math.max(median * 5, 2.0)
    first.collect {
      case (name, t) if !t.isInfinite && t > threshold => name
    }.toSet
  }

  /** Of the re-timed cells, the ones whose re-run beat the first
    * measurement by >2× — i.e. the first number was host noise, not the
    * query's cost. These are reported as `stalled_cells`.
    */
  private[graft] def stalledCells(first: Map[String, Double],
                                  corrected: Map[String, Double]): Seq[String] =
    corrected.keys.toSeq.sorted
      .filter(n => first(n) > 2 * corrected(n))

  /** Median per-query ratio of this run vs the committed cross-round
    * anchor (BENCH_ANCHOR.json). The stall detector by design ignores
    * UNIFORM inflation (every cell 1.3× is invisible to a 5×-median
    * outlier rule — the BENCH_r15 adjudication); the anchor ratio makes
    * it visible: a clean host reads ≈1.0, a uniformly loaded host reads
    * as its inflation factor. None when fewer than 10 cells are shared
    * (subset runs, renamed queries) — a tiny overlap is noise, not a
    * calibration.
    */
  private[graft] def anchorMedianRatio(current: Map[String, Double],
                                       anchor: Map[String, Double]): Option[Double] = {
    val ratios = current.collect {
      case (n, t) if !t.isInfinite && anchor.get(n).exists(_ > 0) => t / anchor(n)
    }.toSeq.sorted
    if (ratios.size < 10) None else Some(ratios(ratios.size / 2))
  }

  /** Anchor timings, keyed by query — empty when the file is absent or
    * was recorded at a different scale factor than this run.
    */
  private[graft] def loadAnchor(path: java.nio.file.Path, sfDir: String): Map[String, Double] =
    try {
      if (!java.nio.file.Files.exists(path)) Map.empty
      else {
        val txt = new String(java.nio.file.Files.readAllBytes(path),
          java.nio.charset.StandardCharsets.UTF_8)
        val sfRe = """"sf":\s*"([^"]+)"""".r
        val sfOk = sfRe.findFirstMatchIn(txt)
          .exists(m => sfDir.stripSuffix("/").endsWith(m.group(1)))
        val qStart = txt.indexOf("\"queries\"")
        if (!sfOk || qStart < 0) Map.empty
        else {
          // the queries object holds only name:number pairs, so it ends
          // at the first closing brace after its opening one
          val body = txt.substring(qStart, txt.indexOf("}", qStart) max qStart)
          val re = """"([a-z0-9_]+)":\s*([0-9][0-9.eE+-]*)""".r
          re.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Per-query repetitions, reporting the MIN: single-shot timings on a
    // contended host swing up to ~6x on identical code (r3->r4 bench
    // "regressions" were byte-identical builds), and the min is the
    // standard noise-robust estimator of a query's true cost.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like Verify: the events TIMESTAMP→epoch-nanos canonicalization
      // (Tables.canonicalEventTime) is wall-clock arithmetic under the
      // session time zone — an unpinned zone would time a DIFFERENT query
      // than the one Verify checks.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up outside the timed loop: build every table plan (populates
    // the Tables plan cache) and run one tiny scan so JVM/codegen/session
    // warm-up isn't attributed to whichever query happens to run first
    Tables.all.foreach(n => Tables.read(spark, sfDir, n))
    Tables.read(spark, sfDir, "region").count()
    // warm the WRITE path too (parquet committer classes, temp-dir
    // creation, fs metadata): a cold first write costs whole seconds and
    // min-of-2 absorbs it only if at most one rep is cold
    val wuDir = graft.util.TempDirs.create("bench_warmup")
    Tables.read(spark, sfDir, "region").write
      .mode("overwrite").parquet(wuDir.resolve("wu.parquet").toString)
    spark.read.parquet(wuDir.resolve("wu.parquet").toString).count()
    // dev-only subset filter (the driver never sets it): comma-separated
    // query names to time, e.g. SPARK_GRAFT_BENCH_ONLY=stream_dedup_keys
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    // Ops that rewrite real files each run: their first rep pays the cold
    // write path (fs cache, committer state) with host-dependent spreads
    // that min-of-2 does not reliably absorb — run one UNTIMED warm rep
    // first so every timed rep measures the warm cost the ±20% noise
    // budget assumes.
    val writeHeavy = Set(
      "op_zorder_layout", "op_zorder3_layout", "sink_dynamic_partition_overwrite",
      "op_insert_append", "src_csv_roundtrip", "src_jsonl_roundtrip",
      "src_orc_roundtrip", "src_partitioned_roundtrip",
      "src_schema_merge_roundtrip",
      "sink_compact_small_files", "sink_mv_incremental_refresh",
      "sink_compact_merge_dedup", "sink_mv_sketch_refresh")
    val probe = new RepProbe
    spark.sparkContext.addSparkListener(probe)
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, RepMetrics) = {
      probe.reset()
      val t0 = System.nanoTime()
      // NonFatal: a genuine OOM/linkage error must crash the bench with
      // its own stack trace, not leave a corrupted JVM mis-timing the
      // rest of the sweep behind a silent -1 cell
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case scala.util.control.NonFatal(_) => false }
      val t = if (ok) (System.nanoTime() - t0) / 1e9 else Double.PositiveInfinity
      // the listener bus is async: drain before snapshotting so the
      // rep's own task-end events are all attributed to this rep
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      (t, probe.snapshot())
    }
    // per-cell rep vectors (time + executor metrics): min stays the
    // headline estimator; the vectors feed the r20 additions — the
    // median-of-3 noise policy and the spike diagnostics
    val repData =
      scala.collection.mutable.LinkedHashMap[String, Vector[(Double, RepMetrics)]]()
    selected.foreach { case (name, fn) =>
      if (writeHeavy(name)) {
        // NonFatal only: swallowing an OOM/linkage error here would leave
        // a corrupted JVM to crash the timed reps with no sign of the cause
        try fn(spark, sfDir).count()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"warm rep failed for $name: $e") }
        // drain before the first timed rep's probe.reset(): the warm
        // rep's straggler task-end events would otherwise land after the
        // reset and be attributed to rep 1's RepMetrics, skewing the
        // spike-attribution diagnostics (GC/shuffle/max-task)
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      }
      // A failed repetition records +Infinity, NOT its elapsed time — a
      // fast-crashing rep must never win the min and masquerade as the
      // best timing. A query whose reps ALL fail serializes as -1 plus an
      // entry in "errors" (Infinity is not valid JSON).
      var v = (1 to reps).map(_ => timeOnce(fn)).toVector
      // noise policy (r20): cells above 1 s get a THIRD rep and report a
      // median alongside the min, so cross-round comparisons of the
      // expensive cells can gate on the noise-robust median instead of
      // relitigating each round's ±30% host window
      val finite = v.map(_._1).filterNot(_.isInfinite)
      if (finite.nonEmpty && finite.min > 1.0 && v.size < 3)
        v = v :+ timeOnce(fn)
      repData(name) = v
    }
    val firstPass: Map[String, Double] =
      repData.map { case (n, v) => n -> v.map(_._1).min }.toMap
    // Stall-proofing: a contended host inflates even min-of-N uniformly
    // (BENCH_r14: 44x on sub-second queries — a 198 s artifact the judge
    // re-ran at 64 s on identical code). A cell above 5x the registry
    // MEDIAN after the full sweep gets ONE more rep, minutes after its
    // first ones — a transient stall won't cover both windows, while a
    // genuinely heavy query re-times heavy and keeps its cost. Raw and
    // corrected totals are both reported, with the re-timed cells listed,
    // so a loaded-host artifact identifies itself in the JSON. The
    // suspect/stalled decisions are pure functions, spec'd in BenchSpec.
    val suspect = suspectCells(firstPass)
    val results = firstPass.map { case (name, t) =>
      if (suspect(name)) {
        val r = timeOnce(selected(name))
        repData(name) = repData(name) :+ r // reps feed spike diagnostics
        name -> math.min(t, r._1)
      } else name -> t
    }
    val stalled = stalledCells(firstPass, results)
    // Control cell (ADVICE r15: make the adaptive protocol auditable):
    // re-time the MEDIAN cell — a deterministic NON-suspect — after the
    // suspects' extra reps. Its recheck/first ratio shows host drift
    // independent of the stall correction: a clean host rechecks ≈1×, a
    // drifting host shows it here, so readers can separate "the adaptive
    // rep corrected a stall" from "the whole sweep ran hot". Per-cell rep
    // counts are derivable: base_reps everywhere, +1 for retimed_cells.
    val finiteSorted = firstPass.toSeq.filterNot(_._2.isInfinite)
      .sortBy { case (n, t) => (t, n) }
    val controlJson = if (finiteSorted.isEmpty) "null" else {
      val (cName, cFirst) = finiteSorted(finiteSorted.size / 2)
      val cRe = timeOnce(selected(cName))._1
      val cReJson = if (cRe.isInfinite) "-1" else cRe.toString
      s"""{"name":"$cName","first":$cFirst,"recheck":$cReJson}"""
    }
    val failed = results.collect { case (k, v) if v.isInfinite => k }.toSeq.sorted
    val qs = results.map { case (k, v) =>
      s"\"" + k + "\":" + (if (v.isInfinite) "-1" else v.toString)
    }.mkString("{", ",", "}")
    val total = results.values.filterNot(_.isInfinite).sum
    val rawTotal = firstPass.values.filterNot(_.isInfinite).sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val stalledJson = stalled.map("\"" + _ + "\"").mkString("[", ",", "]")
    val retimedJson = suspect.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val anchor = loadAnchor(java.nio.file.Paths.get("BENCH_ANCHOR.json"), sfDir)
    val anchorJson = anchorMedianRatio(results, anchor)
      .map(r => String.format(java.util.Locale.ROOT, "%.3f", Double.box(r)))
      .getOrElse("null")
    val protocolJson =
      s""""base_reps":$reps,"retimed_cells":$retimedJson,"stalled_cells":$stalledJson,"control":$controlJson,"anchor_median_ratio":$anchorJson"""
    def fmt3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // r20 noise policy: median-of-N alongside the min for every cell
    // that earned a third rep (>1 s) — cross-round comparisons of the
    // expensive cells gate on this, not the min
    val mediansJson = repData.toSeq
      .collect { case (n, v) if v.size >= 3 => n -> repMedian(v.map(_._1)) }
      .sortBy(_._1)
      .map { case (n, m) =>
        "\"" + n + "\":" + (if (m.isInfinite) "-1" else fmt3(m)) }
      .mkString("{", ",", "}")
    // r20 spike diagnostics: any cell whose reps disagree >3× emits its
    // per-rep times AND executor metrics (GC / shuffle / max task), so a
    // driver-window spike is attributable instead of shrugged off
    val spikes = spikeCells(repData.view.mapValues(_.map(_._1)).toMap)
    val spikesJson = spikes.toSeq.sorted.map { n =>
      val v = repData(n)
      val ts = v.map { case (t, _) => if (t.isInfinite) "-1" else fmt3(t) }
        .mkString("[", ",", "]")
      val ms = v.map(_._2.json).mkString("[", ",", "]")
      s""""$n":{"rep_sec":$ts,"rep_metrics":$ms}"""
    }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","raw_total":$rawTotal,$protocolJson,"medians3":$mediansJson,"spikes":$spikesJson,"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // The full per-query line exceeds a tail-capture window at 150+
    // queries, so a capture that keeps only the LAST few KB beheads it
    // into unparseable JSON (every BENCH_r{5..10} landed "parsed": null).
    // Persist the full line to a file, print it first for whole-log
    // readers, and END output with a compact self-contained summary —
    // same keys, slowest queries only — that any tail capture parses.
    val outPath = java.nio.file.Paths.get("target/bench_out.json")
    java.nio.file.Files.createDirectories(outPath.getParent)
    java.nio.file.Files.write(outPath,
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(full)
    // ALL cells, slowest first, values at 3 decimals (~9 KB for 289
    // queries): the r21 judge's PERF comparison had n_common = 0 because
    // this line used to keep only the top 25 — per-query round-over-round
    // ratios and the geomean need every cell (VERDICT r21 item 2).
    // Locale.ROOT: the f-interpolator's %.3f is locale-sensitive and a
    // comma decimal separator would make this "always parseable" line
    // invalid JSON
    val slowest = results.toSeq.filterNot(_._2.isInfinite)
      .sortBy { case (k, v) => (-v, k) }
      .map { case (k, v) =>
        "\"" + k + "\":" +
          String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      }.mkString("{", ",", "}")
    // the compact line must SURVIVE a tail-capture window even on a
    // mass-failure round: BENCH_r16's 50-name errors array pushed this
    // line past the window and beheaded it into unparseable JSON at the
    // exact moment parseability mattered most. Cap the inline list;
    // truncation is self-describing (len(errors) < n_errors), and the
    // full list lives in the full line / the file.
    val errCap = 12
    val errsCapped = failed.take(errCap).map("\"" + _ + "\"").mkString("[", ",", "]")
    // spike names (capped like errors) so a tail capture still names the
    // cells whose full diagnostics live in the file's "spikes" object
    val spikesCapped = spikes.toSeq.sorted.take(errCap)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","raw_total":$rawTotal,$protocolJson,"n_queries":${results.size},"queries":$slowest,"full_json":"${outPath}","n_errors":${failed.size},"errors":$errsCapped,"n_spikes":${spikes.size},"spiked_cells":$spikesCapped,"sf":"$sfDir"}""")
    spark.stop()
  }
}
