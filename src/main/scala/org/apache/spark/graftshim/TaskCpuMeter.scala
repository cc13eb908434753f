package org.apache.spark.graftshim

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Accumulates executor task CPU time across all completed tasks —
  * the host-noise-immune bench metric (round-10 verdict, next-round
  * #1): a noisy host steals wall-clock from runnable threads but not
  * on-CPU nanoseconds, and task CPU additionally excludes GC/JIT
  * threads (unlike the JVM process CPU delta, which the background-
  * load A/B showed swinging ±30% with self-contention effects).
  *
  * Lives under org.apache.spark because reading a consistent snapshot
  * requires draining the async listener bus, and
  * `SparkContext.listenerBus.waitUntilEmpty` is `private[spark]` —
  * same shim technique as sql.graftshim.ColumnBridge.
  */
class TaskCpuMeter private (sc: SparkContext) extends SparkListener {
  private val total = new AtomicLong(0L)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      total.addAndGet(m.executorCpuTime + m.executorDeserializeCpuTime): Unit
    }
  }

  /** Drain pending task-end events, then read the accumulated ns.
    * Per-query cost: one bounded wait on an (almost always empty)
    * queue — never a Spark job.
    */
  def snapshotNs(): Long = {
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: Throwable => () }
    total.get()
  }
}

object TaskCpuMeter {
  def attach(sc: SparkContext): TaskCpuMeter = {
    val m = new TaskCpuMeter(sc)
    sc.addSparkListener(m)
    m
  }

  /** Drain the shared listener bus without attaching anything —
    * lets tests observe QueryExecutionListener callbacks
    * deterministically (the execution-listener bus rides the same
    * async LiveListenerBus).
    */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: Throwable => () }
}
