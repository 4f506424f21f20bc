package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE.md protocol): run the IDENTICAL
  * build+query job at local[8] (N) and local[32] (4N) on the same input;
  * efficiency = throughput(32) / (4 × throughput(8)). Sandbox proxy for
  * the north rule's N vs 4N executor criterion (no real cluster here).
  *
  * Each invocation measures ONE parallelism level so every measurement
  * gets a fresh JVM (same-JVM back-to-back runs inherit GC debt and page
  * cache from the previous run — measured 2-15× phase variance).
  * `tools/scaling.sh` runs both and combines.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)).getOrElse(32)
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "240000").toLong
    // shuffle/spill on tmpfs: the scaling criterion measures COMPUTE
    // scaling (a real cluster scales disk/network spindles with
    // executors; this box has one disk, which would otherwise be the
    // constant-resource bottleneck that no code change can scale)
    val localDir = s"/dev/shm/graft-spark-$cores"
    sys.props("graft.bench.dir") = localDir + "-index"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup on a miniature corpus, then the timed run
    Bench.transcriptWorkload(spark, 200L, cores, rounds = 1)
    val r = Bench.transcriptWorkload(spark, nConvs, cores)
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(localDir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(localDir + "-index"))
    // cpu_sec + shuffle bytes: the engine-side numbers — CPU-seconds per
    // turn should be ~flat across parallelism if the plan scales; wall
    // efficiency on this shared box additionally reflects SMT/bandwidth
    // ceilings (BASELINE.md).
    println(s"""{"metric":"scaling_point","cores":$cores,"turns":${r.turns},""" +
      s""""build_sec":${r.buildSec},"build_turns_per_sec":${r.turns / r.buildSec},""" +
      s""""build_cpu_sec":${r.build.cpuSec},"cpu_us_per_turn":${r.build.cpuSec * 1e6 / r.turns},""" +
      s""""shuffle_write_bytes":${r.build.shuffleWriteBytes},""" +
      s""""shuffle_bytes_per_turn":${r.build.shuffleWriteBytes.toDouble / r.turns},""" +
      s""""spill_bytes":${r.build.spillBytes},""" +
      s""""avg_query_sec":${r.lat.sum / r.lat.length},""" +
      s""""p50_query_sec":${Bench.percentile(r.lat, 0.5)},"nConvs":$nConvs}""")
  }
}
