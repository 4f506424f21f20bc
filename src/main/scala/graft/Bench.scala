package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.Transcripts
import graft.index.{DocIds, IndexBuilder, IndexConfig}
import graft.query.Searcher

/** Benchmark main (driver contract): prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  * plus extra top-level metric keys (build throughput, BM25 p50).
  *
  * Headline workload = the north-rule pipeline: (1) full index build over
  * the seed-42 transcript corpus (turns/sec), (2) warm BM25 top-k p50
  * over the reference query set, (3) the engine over the driver's
  * documents table, (4) a few representative relational/pipeline ops at
  * the given sf.
  */
object Bench {

  val transcriptQueries: Seq[String] = Seq(
    "zanzibar", "zanzibar quasar lattice", "cinnabar monolith archipelago",
    "perihelion vellum", "the", "the a of", "the zanzibar",
    "t100 t2000 t30000", "one have t999", "definitely-notavocab-word",
    "The, A; OF!", "t10 t11 t12 t13", "t1 t500000x the", "t7 t77 t777 t7777",
    "as at be one", "t42", "t4242", "with that was t33", "t3 t30 t300", "have t5000"
  )

  def percentile(xs: Seq[Double], p: Double): Double = {
    if (xs.isEmpty) return 0.0
    val s = xs.sorted
    s(math.min(s.length - 1, math.max(0, (p * s.length).toInt)))
  }

  final case class WorkloadRun(turns: Long, buildSec: Double, lat: Seq[Double],
      build: Metrics.Snapshot, batchQps: Double = 0.0, distributedQps: Double = 0.0)

  /** Build + query workload; the build region (gen+dedup+assign+index) is
    * metered for shuffle bytes + executor CPU seconds.
    */
  def transcriptWorkload(spark: SparkSession, nConvs: Long, partitions: Int,
      rounds: Int = 2): WorkloadRun = {
    val dir = sys.props.get("graft.bench.dir") match {
      case Some(base) =>
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base)),
          "graft-bench-index").toString
      case None => java.nio.file.Files.createTempDirectory("graft-bench-index").toString
    }
    // SPARK_GRAFT_POSITIONS=false: no-positional-postings comparison
    // point for the scaling ladder (BASELINE.md round-3 — isolates the
    // positional payload's DRAM cost from the engine's scaling behavior)
    val cfg = IndexConfig(numBuckets = 4, numShards = 8, partitions = partitions,
      storePositions = sys.env.getOrElse("SPARK_GRAFT_POSITIONS", "true").toBoolean)
    val t0 = System.nanoTime()
    var tAssign = 0L
    val (report, buildMetrics) = Metrics.measure(spark.sparkContext) {
      val docs = DocIds.dedupAndAssign(Transcripts.generate(spark, nConvs), partitions)
      tAssign = System.nanoTime()
      val r = new IndexBuilder(spark, dir, s"bench-$nConvs", cfg).build(docs)
      docs.unpersist(blocking = false)
      r
    }
    val buildSec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[bench] cores=$partitions gen+dedup+assign=${(tAssign - t0) / 1e9}%.1f " +
      f"build=${(System.nanoTime() - tAssign) / 1e9}%.1f " +
      f"shufW=${buildMetrics.shuffleWriteBytes / 1e6}%.0fMB cpu=${buildMetrics.cpuSec}%.0fs " +
      f"spill=${buildMetrics.spillBytes / 1e6}%.0fMB cells=" +
      new IndexBuilder(spark, dir, s"bench-$nConvs", cfg).allManifests
        .map(m => f"${m.cell}:${m.wallSec}%.1f").sorted.mkString(","))
    // serving-deployment budget: the bench driver runs 16g, so admit up
    // to ~4 GB estimated heap for the in-process index (the default 1 GB
    // targets generic drivers; p50 without the local path is the ~100 ms
    // Spark job-scheduling floor, reported in BASELINE.md either way)
    val searcher = new Searcher(spark, dir, cfg.numShards)
      .warm(maxLocalBlockBytes = 4L << 30)
    searcher.search("warmup the", 10)
    var lat = Seq.empty[Double]
    for (r <- 1 to rounds) {
      lat = transcriptQueries.map { q =>
        val t1 = System.nanoTime()
        searcher.search(q, 10)
        (System.nanoTime() - t1) / 1e9
      }
    }
    // batched QPS shape (one job for the whole set)
    val tb = System.nanoTime()
    searcher.searchMany(transcriptQueries, 10)
    val batchSec = (System.nanoTime() - tb) / 1e9
    System.err.println(f"[bench] batched ${transcriptQueries.size} queries in $batchSec%.2f s " +
      f"(${transcriptQueries.size / batchSec}%.1f qps)")
    // the LARGE-index serving path: a Searcher whose index does NOT fit
    // the driver budget keeps everything distributed (executor-cached
    // blocks, one job per batch) — measured with the in-process path
    // disabled so per-round numbers cover both serving modes
    // (result-identity of the two paths is test-pinned in EngineSpec)
    val distributed = new Searcher(spark, dir, cfg.numShards).warm(maxLocalBlockBytes = 0)
    distributed.searchMany(transcriptQueries, 10) // warm the block cache
    val td = System.nanoTime()
    distributed.searchMany(transcriptQueries, 10)
    val distSec = (System.nanoTime() - td) / 1e9
    System.err.println(f"[bench] distributed batched ${transcriptQueries.size} queries in " +
      f"$distSec%.2f s (${transcriptQueries.size / distSec}%.1f qps)")
    WorkloadRun(report.n, buildSec, lat, buildMetrics,
      batchQps = transcriptQueries.size / batchSec,
      distributedQps = transcriptQueries.size / distSec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // corpus sized so the timed build runs ≥60 s at the recorded
    // throughput: the ~6 s fixed driver cost (stage scheduling + parquet
    // commits) must be <10% of the measurement, and the host's 2-7×
    // co-tenant noise averages out over a longer window (round-2 review:
    // 180k turns / ~21 s under-defended the recorded number)
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "150000").toLong
    // tmpfs for shuffle + the throwaway bench index (a real deployment
    // has NVMe/remote storage scaled with executors; this box has one
    // disk). Falls back to defaults if /dev/shm is unavailable.
    val shm = new java.io.File("/dev/shm")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (shm.isDirectory && shm.canWrite) {
      builder.config("spark.local.dir", "/dev/shm/graft-bench-spark")
      sys.props("graft.bench.dir") = "/dev/shm/graft-bench-index"
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    // median-of-3 per entry: a single draw of a multi-job cold path is
    // the most scheduling-noise-sensitive number in the sweep (round-6
    // verdict — 8 single-draw q_* entries recorded a 3-6x co-tenant
    // spike); the median of three consecutive runs rejects one bad draw
    def time(name: String, reps: Int = 3)(body: => Unit): Unit = {
      val ts = new Array[Double](reps)
      var i = 0
      while (i < reps) {
        val t0 = System.nanoTime()
        try body catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e"); results(name) = -1.0; return
        }
        ts(i) = (System.nanoTime() - t0) / 1e9
        i += 1
      }
      java.util.Arrays.sort(ts)
      results(name) = ts(reps / 2)
    }

    // JVM/codegen warmup: a miniature end-to-end build so the timed run
    // measures steady-state throughput, not JIT compilation.
    transcriptWorkload(spark, 200L, cpus.toInt, rounds = 1)

    // 1) transcript index build + BM25 query p50 (the north-rule pipeline).
    // The host shows 2-7x co-tenant variance on identical runs
    // (BASELINE.md), so the recorded build number is a MEDIAN of `reps`
    // independent builds, not one draw. 5 reps (round-4: up from 3) so
    // one contended draw cannot drag the median — BASELINE.md's
    // representative claim IS this median (round-3 review ask #2).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val runs = (1 to reps).map(_ => transcriptWorkload(spark, nConvs, cpus.toInt))
    val turns = runs.head.turns
    val buildSec = percentile(runs.map(_.buildSec), 0.5) // median build wall
    val lat = runs.flatMap(_.lat)                        // all query latencies
    results("transcript_index_build") = buildSec
    results("transcript_bm25_all20") = percentile(runs.map(_.lat.sum), 0.5)

    // 1b) CROSS-SEGMENT serving (pre-compaction shape): a 2-segment
    // streaming index served by the warm in-process MultiSearcher —
    // the cross-segment counterpart of bm25_batch_qps / bm25_p50_ms
    // (round-4 review "What's missing #6").
    var msWarmQps = 0.0
    var msWarmP50Ms = 0.0
    try {
      import org.apache.spark.sql.functions.col
      val msIdx = sys.props.get("graft.bench.dir") match {
        case Some(base) => java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(base), "graft-bench-msidx").toString
        case None => java.nio.file.Files.createTempDirectory("graft-bench-msidx").toString
      }
      val msConvs = math.max(2000L, nConvs / 5)
      val half = f"conv-${msConvs / 2}%08d"
      val cfgMs = graft.index.IndexConfig(numBuckets = 2, partitions = cpus.toInt)
      val corpus = Transcripts.generate(spark, msConvs)
      graft.streaming.StreamingIngest.appendSegment(spark,
        corpus.filter(col("conv_id") < half), msIdx, 0L, cfgMs)
      graft.streaming.StreamingIngest.appendSegment(spark,
        corpus.filter(col("conv_id") >= half), msIdx, 1L, cfgMs)
      val ms = new graft.query.MultiSearcher(spark, msIdx)
        .warm(maxLocalBlockBytes = 4L << 30)
      val specs = transcriptQueries.map(q => graft.query.BoolQuerySpec(query = q))
      ms.searchManyBool(specs, 10) // warmup
      val tq0 = System.nanoTime()
      val msRounds = 3
      for (_ <- 1 to msRounds) ms.searchManyBool(specs, 10)
      msWarmQps = msRounds * specs.size / ((System.nanoTime() - tq0) / 1e9)
      val msLat = transcriptQueries.map { q =>
        val t1 = System.nanoTime()
        ms.search(q, 10)
        (System.nanoTime() - t1) / 1e9
      }
      msWarmP50Ms = percentile(msLat, 0.5) * 1000
      System.err.println(f"[bench] cross-segment warm: $msWarmQps%.1f qps batched, " +
        f"p50 $msWarmP50Ms%.2f ms (${msConvs} convs, 2 segments)")
    } catch { case e: Throwable => System.err.println(s"[bench] ms-warm failed: $e") }

    // 1c) multi-index fan-out (round-7 review "What's wrong #2"): N
    // named indexes under one root searched as 'idx-*' — the per-index
    // top-k jobs submit CONCURRENTLY on the shared session, so the wall
    // is ~max(per-index) + merge, not N × single-index time.
    var idxFanN = 0
    var idxFanSec = 0.0
    var idxSingleSec = 0.0
    try {
      val root = sys.props.get("graft.bench.dir") match {
        case Some(base) => java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(base), "graft-bench-indices").toString
        case None => java.nio.file.Files.createTempDirectory("graft-bench-indices").toString
      }
      import org.apache.spark.sql.functions.col
      idxFanN = 6
      val convsPer = 1500L
      val corpusI = Transcripts.generate(spark, idxFanN * convsPer).cache()
      val cfgI = graft.index.IndexConfig(numBuckets = 1, partitions = cpus.toInt)
      for (i <- 0 until idxFanN) {
        val lo = f"conv-${i * convsPer}%08d"
        val hi = f"conv-${(i + 1) * convsPer}%08d"
        val part = DocIds.assign(
          corpusI.filter(col("conv_id") >= lo && col("conv_id") < hi), cpus.toInt)
        new IndexBuilder(spark, s"$root/idx-$i", s"bench-idx-$i", cfgI).build(part)
      }
      corpusI.unpersist(blocking = false)
      val indices = new graft.query.Indices(spark, root, cfgI.numShards)
      indices.search("idx-*", "the zanzibar", 10).collect() // warm searcher state
      indices.search("idx-0", "the zanzibar", 10).collect()
      def med3(body: => Unit): Double = {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }.sorted
        ts(1)
      }
      idxSingleSec = med3(indices.search("idx-0", "the zanzibar", 10).collect())
      idxFanSec = med3(indices.search("idx-*", "the zanzibar", 10).collect())
      System.err.println(f"[bench] multi-index fan-out: idx-* over $idxFanN indexes " +
        f"$idxFanSec%.2f s vs single $idxSingleSec%.2f s " +
        f"(serial estimate ${idxFanN * idxSingleSec}%.2f s)")
    } catch { case e: Throwable => System.err.println(s"[bench] indices fan-out failed: $e") }

    // 2) engine + representative ops over the driver's sf tables.
    // q_bm25_topk/q_bm25_and measure QUERY cost: the documents index they
    // share is built once here, outside any timed region (round-1 bench
    // recorded 8.3 s of cold build inside q_bm25_topk).
    SparkEntry.queries("q_bm25_topk")(spark, sfDir).count()
    // the multi-index entries share a memoized two-index root over the
    // documents table — build it outside the timed region too, so the
    // timings below measure the cross-index merge, not the index build
    try SparkEntry.queries("q_multi_index_stats")(spark, sfDir).count()
    catch { case e: Throwable => System.err.println(s"[bench] multi-index warmup failed: $e") }
    for (name <- Seq("q_bm25_topk", "q_bm25_and", "q_bm25_phrase", "q_bm25_prefix",
        "q_bm25_fuzzy", "q_bm25_filtered", "q_bm25_terms", "q_bm25_should",
        "q_bm25_range_numeric", "q_bm25_field", "q_bm25_multimatch",
        "q_bm25_multimatch_best", "q_bm25_field_phrase", "q_facet_terms_range",
        "q_facet_stats",
        "q_facet_lang", "q_facet_histogram", "q_stats_field",
        "q_sort_by_field", "q_tf", "q_df", "q_agg_lineitem",
        "q_join_broadcast", "q_minhash_lsh", "q_simhash_pairs", "q_ann_cosine",
        "q_ann_lsh", "q_langid", "q_quality", "q_dedup_exact", "q_window_rank",
        // round-7 operators
        "q_bm25_regexp", "q_bm25_match_fuzzy", "q_dis_max", "q_nested_aggs",
        "q_phrase_suggest",
        // round-8 operators
        "q_collapse", "q_decay_recency", "q_composite_after", "q_pipeline_agg",
        "q_dis_max_shared",
        // round-8 stretch operators
        "q_boosting", "q_span_first", "q_min_score", "q_suggest_completion",
        "q_percolate", "q_explain", "q_termvectors", "q_scroll_all",
        // round-8 multi-index merges (root built in the warmup above)
        "q_multi_index", "q_multi_index_facet", "q_multi_index_stats",
        "q_multi_index_percentiles", "q_multi_index_cardinality")) {
      time(name) { SparkEntry.queries(name)(spark, sfDir).count() }
    }

    val total = results.values.filter(_ >= 0).sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val turnsPerSec = turns / buildSec
    val p50ms = percentile(lat, 0.5) * 1000
    val p95ms = percentile(lat, 0.95) * 1000
    val medCpu = percentile(runs.map(_.build.cpuSec), 0.5)
    val medShuf = percentile(runs.map(_.build.shuffleWriteBytes.toDouble), 0.5)
    // build_cpu_us_per_turn: the noise-robust companion to wall
    // throughput — executor CPU is what the co-tenant host cannot steal
    // silently (wall swings 2-7×; CPU/turn stays within ~±15%)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
      s""","build_turns":$turns,"build_turns_per_sec":$turnsPerSec,"build_reps":$reps""" +
      s""","build_turns_per_sec_all":${runs.map(r => r.turns / r.buildSec).mkString("[", ",", "]")}""" +
      s""","build_cpu_sec":$medCpu,"build_cpu_us_per_turn":${medCpu * 1e6 / turns}""" +
      s""","build_shuffle_write_bytes":${medShuf.toLong}""" +
      s""","bm25_p50_ms":$p50ms,"bm25_p95_ms":$p95ms""" +
      s""","bm25_batch_qps":${percentile(runs.map(_.batchQps), 0.5)}""" +
      s""","bm25_distributed_qps":${percentile(runs.map(_.distributedQps), 0.5)}""" +
      s""","ms_warm_qps":$msWarmQps,"ms_warm_p50_ms":$msWarmP50Ms""" +
      s""","indices_fanout_n":$idxFanN,"indices_fanout_sec":$idxFanSec""" +
      s""","indices_single_sec":$idxSingleSec""" +
      s""","cores":$cpus}"""
    // Belt and braces for the harness: the JSON goes to stdout (forked,
    // unprefixed — build.sbt outputStrategy) AND to a well-known file.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft-bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception => System.err.println(s"[bench] write $outFile failed: $e") }
    println(json)
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/dev/shm/graft-bench-spark"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/dev/shm/graft-bench-index"))
  }
}
