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

  /** Build + query workload; returns (turns, buildSec, querySecs). */
  def transcriptWorkload(spark: SparkSession, nConvs: Long, partitions: Int,
      rounds: Int = 2): (Long, Double, Seq[Double]) = {
    val dir = sys.props.get("graft.bench.dir") match {
      case Some(base) =>
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base)),
          "graft-bench-index").toString
      case None => java.nio.file.Files.createTempDirectory("graft-bench-index").toString
    }
    val cfg = IndexConfig(numBuckets = 4, numShards = 8, partitions = partitions)
    val t0 = System.nanoTime()
    val docs = DocIds.dedupAndAssign(Transcripts.generate(spark, nConvs), partitions)
    val tAssign = System.nanoTime()
    val report = new IndexBuilder(spark, dir, s"bench-$nConvs", cfg).build(docs)
    docs.unpersist(blocking = false)
    val buildSec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[bench] cores=$partitions gen+dedup+assign=${(tAssign - t0) / 1e9}%.1f " +
      f"build=${(System.nanoTime() - tAssign) / 1e9}%.1f cells=" +
      new IndexBuilder(spark, dir, s"bench-$nConvs", cfg).allManifests
        .map(m => f"${m.cell}:${m.wallSec}%.1f").sorted.mkString(","))
    val searcher = new Searcher(spark, dir, cfg.numShards).warm()
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
    (report.n, buildSec, lat)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "20000").toLong
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
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      try body catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: $e"); results(name) = -1.0; return
      }
      results(name) = (System.nanoTime() - t0) / 1e9
    }

    // JVM/codegen warmup: a miniature end-to-end build so the timed run
    // measures steady-state throughput, not JIT compilation.
    transcriptWorkload(spark, 200L, cpus.toInt, rounds = 1)

    // 1) transcript index build + BM25 query p50 (the north-rule pipeline)
    val (turns, buildSec, lat) = transcriptWorkload(spark, nConvs, cpus.toInt)
    results("transcript_index_build") = buildSec
    results("transcript_bm25_all20") = lat.sum

    // 2) engine + representative ops over the driver's sf tables
    for (name <- Seq("q_bm25_topk", "q_bm25_and", "q_tf", "q_df", "q_agg_lineitem",
        "q_join_broadcast", "q_minhash_lsh", "q_simhash_pairs", "q_ann_cosine",
        "q_ann_lsh", "q_langid", "q_quality", "q_dedup_exact", "q_window_rank")) {
      time(name) { SparkEntry.queries(name)(spark, sfDir).count() }
    }

    val total = results.values.filter(_ >= 0).sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val turnsPerSec = turns / buildSec
    val p50ms = percentile(lat, 0.5) * 1000
    val p95ms = percentile(lat, 0.95) * 1000
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
      s""","build_turns":$turns,"build_turns_per_sec":$turnsPerSec""" +
      s""","bm25_p50_ms":$p50ms,"bm25_p95_ms":$p95ms,"cores":$cpus}""")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/dev/shm/graft-bench-spark"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/dev/shm/graft-bench-index"))
  }
}
