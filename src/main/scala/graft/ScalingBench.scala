package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE.md protocol): run the IDENTICAL
  * build+query job at local[8] (N) and local[32] (4N) on the same input;
  * efficiency = throughput(32) / (4 × throughput(8)). Sandbox proxy for
  * the north rule's N vs 4N executor criterion (no real cluster here).
  */
object ScalingBench {
  private def run(cores: Int, nConvs: Long): (Double, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (turns, buildSec, lat) = Bench.transcriptWorkload(spark, nConvs, cores)
    spark.stop()
    // SparkSession.stop keeps the JVM; clear the default so the next
    // builder creates a fresh context with the new master.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    (turns / buildSec, lat.sum / lat.length)
  }

  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "40000").toLong
    val (lo, hi) = (8, 32)
    val (thLo, qLo) = run(lo, nConvs)
    val (thHi, qHi) = run(hi, nConvs)
    val eff = thHi / (4.0 * thLo)
    println(s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio",""" +
      s""""build_turns_per_sec_local$lo":$thLo,"build_turns_per_sec_local$hi":$thHi,""" +
      s""""avg_query_sec_local$lo":$qLo,"avg_query_sec_local$hi":$qHi,"nConvs":$nConvs}""")
  }
}
