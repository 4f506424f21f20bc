package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Cluster-resource accounting for the bench/scaling protocol: total
  * shuffle bytes written/read and executor CPU seconds across all tasks
  * in a measured region. Wall-clock alone can't separate "the code
  * doesn't scale" from "the host is bandwidth-saturated/co-tenanted";
  * CPU-seconds-per-unit-work and shuffle volume are the engine-side
  * numbers that a host can't fake (VERDICT r1 "Next round" #2c).
  */
final class TaskMetricsListener extends SparkListener {
  val shuffleWriteBytes = new AtomicLong(0L)
  val shuffleReadBytes = new AtomicLong(0L)
  val cpuTimeNs = new AtomicLong(0L)
  val spillBytes = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      shuffleWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shuffleReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      cpuTimeNs.addAndGet(m.executorCpuTime)
      spillBytes.addAndGet(m.diskBytesSpilled)
    }
  }

  def snapshot: Metrics.Snapshot = Metrics.Snapshot(
    shuffleWriteBytes.get(), shuffleReadBytes.get(), cpuTimeNs.get() / 1e9, spillBytes.get())
}

object Metrics {
  final case class Snapshot(
      shuffleWriteBytes: Long, shuffleReadBytes: Long, cpuSec: Double, spillBytes: Long) {
    def -(o: Snapshot): Snapshot = Snapshot(
      shuffleWriteBytes - o.shuffleWriteBytes, shuffleReadBytes - o.shuffleReadBytes,
      cpuSec - o.cpuSec, spillBytes - o.spillBytes)
  }

  /** Measure `body`, returning (result, metrics delta over the region). */
  def measure[T](sc: SparkContext)(body: => T): (T, Snapshot) = {
    val l = new TaskMetricsListener
    sc.addSparkListener(l)
    try {
      val r = body
      // listener events are posted asynchronously; drain before reading
      org.apache.spark.sql.GraftSqlBridge.waitListenerBus(sc)
      (r, l.snapshot)
    } finally sc.removeSparkListener(l)
  }
}
