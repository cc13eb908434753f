package graft

import graft.operators.{CheckpointOrphans, GraftMemo}

/** Unit pins for the round-13 memo rework (round-12 ADVICE):
  * compute-outside-lock, LRU release discipline, and the
  * release-after-materialization path for fingerprint-bypass
  * checkpoints.
  */
class MemoSpec extends SparkSpec {

  test("GraftMemo: a key computes once; hits return the same value") {
    val memo = new GraftMemo[String, Int](cap = 4)
    val computed = new java.util.concurrent.atomic.AtomicInteger(0)
    def v = { computed.incrementAndGet(); 42 }
    assert(memo.get("k")(v) === 42)
    assert(memo.get("k")(v) === 42)
    assert(computed.get() === 1)
  }

  test("GraftMemo: LRU eviction releases exactly the eldest entry") {
    val released = scala.collection.mutable.ArrayBuffer[Int]()
    val memo = new GraftMemo[String, Int](cap = 2, release = released += _)
    memo.get("a")(1)
    memo.get("b")(2)
    memo.get("a")(1) // touch a — b becomes the LRU victim
    memo.get("c")(3) // evicts b
    assert(released.toSeq === Seq(2))
    // a and c still mapped (no recompute)
    val computed = new java.util.concurrent.atomic.AtomicInteger(0)
    memo.get("a") { computed.incrementAndGet(); 99 }
    memo.get("c") { computed.incrementAndGet(); 99 }
    assert(computed.get() === 0)
  }

  test("GraftMemo: dead entries purge on access and are not served") {
    var dead = false
    val memo = new GraftMemo[String, Int](cap = 4, dead = _ => dead)
    assert(memo.get("k")(1) === 1)
    dead = true
    assert(memo.get("k")(2) === 2) // purged, recomputed
  }

  test("GraftMemo: different keys compute CONCURRENTLY (not under one lock)") {
    val memo = new GraftMemo[String, Int](cap = 4)
    // each compute parks until BOTH computes have started: possible
    // only if the map lock is not held across the compute
    val both = new java.util.concurrent.CountDownLatch(2)
    def slow(v: Int): Int = {
      both.countDown()
      assert(both.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "computes serialized behind the map lock")
      v
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(() => memo.get("a")(slow(1)): Integer)
      val fb = pool.submit(() => memo.get("b")(slow(2)): Integer)
      assert(fa.get(15, java.util.concurrent.TimeUnit.SECONDS) === 1)
      assert(fb.get(15, java.util.concurrent.TimeUnit.SECONDS) === 2)
    } finally pool.shutdownNow()
  }

  test("GraftMemo: a throwing compute is retried on the next access") {
    val memo = new GraftMemo[String, Int](cap = 4)
    var attempts = 0
    def flaky = {
      attempts += 1
      if (attempts == 1) sys.error("transient")
      7
    }
    intercept[RuntimeException](memo.get("k")(flaky))
    assert(memo.get("k")(flaky) === 7)
  }

  test("CheckpointOrphans: adopted checkpoint blocks release after first materialization") {
    val df = spark.range(64).toDF("x").localCheckpoint(true)
    val rdd = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.head
    assert(rdd.getStorageLevel !== org.apache.spark.storage.StorageLevel.NONE,
      "fixture must start with live checkpoint blocks")
    val adopted = CheckpointOrphans.adopt(df)
    assert(adopted.count() === 64L)
    // the execution-listener bus is async — drain, then poll briefly
    org.apache.spark.graftshim.TaskCpuMeter.drain(spark.sparkContext)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (rdd.getStorageLevel !=
        org.apache.spark.storage.StorageLevel.NONE &&
        System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(rdd.getStorageLevel ===
      org.apache.spark.storage.StorageLevel.NONE,
      "adopted checkpoint blocks must be unpersisted after the query completes")
  }

  test("GraftMemo: an in-flight entry is never evicted (no duplicate compute, no orphan)") {
    val released = scala.collection.mutable.ArrayBuffer[Int]()
    val memo = new GraftMemo[String, Int](cap = 1, release = released += _)
    val started = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val fa = pool.submit(() => memo.get("slow") {
        started.countDown()
        assert(gate.await(10, java.util.concurrent.TimeUnit.SECONDS))
        1
      }: Integer)
      assert(started.await(10, java.util.concurrent.TimeUnit.SECONDS))
      // over-cap inserts while "slow" is in flight: the in-flight cell
      // must survive (only DONE entries are eviction candidates)
      memo.get("b")(2)
      memo.get("c")(3) // evicts b (done), not slow (in flight)
      gate.countDown()
      assert(fa.get(10, java.util.concurrent.TimeUnit.SECONDS) === 1)
      assert(released.toSeq === Seq(2))
      // "slow" is still mapped: a hit, not a duplicate compute
      val computed = new java.util.concurrent.atomic.AtomicInteger(0)
      assert(memo.get("slow") { computed.incrementAndGet(); 99 } === 1)
      assert(computed.get() === 0)
    } finally pool.shutdownNow()
  }
}
