package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ANN model memoizer's structural contracts (ADVICE r15): build-once
  * per (key, snapshot), rebuild-in-place when the snapshot moves, and the
  * size BOUND — at most one artifact per logical key, so a session that
  * rewrites a dataset forever cannot grow the cache.
  */
class SnapshotMemoizerSpec extends AnyFunSuite {

  test("builds once per (key, snapshot); serves the cached value after") {
    val m = new SnapshotMemoizer[String]
    var builds = 0
    def build(v: String): String = { builds += 1; v }
    assert(m.get("ivf:16:/data", "snapA")(build("m1")) == "m1")
    assert(m.get("ivf:16:/data", "snapA")(build("m2")) == "m1")
    assert(builds == 1, "same snapshot must never rebuild")
  }

  test("a moved snapshot rebuilds IN PLACE — superseded value evicted, size bounded") {
    val m = new SnapshotMemoizer[String]
    var builds = 0
    def build(v: String): String = { builds += 1; v }
    m.get("pq:8:/data", "snap1")(build("v1"))
    for (i <- 2 to 50) // 49 in-place rewrites of the same dataset
      assert(m.get("pq:8:/data", s"snap$i")(build(s"v$i")) == s"v$i")
    assert(builds == 50, "every snapshot move must retrain")
    assert(m.size == 1,
      s"one logical key must hold exactly one artifact, held ${m.size}")
    // a stale snapshot NEVER serves the old model (re-keying is by value,
    // not append): asking for snap1 again retrains rather than resurrect
    assert(m.get("pq:8:/data", "snap1")(build("fresh")) == "fresh")
  }

  test("distinct logical keys are independent") {
    val m = new SnapshotMemoizer[String]
    m.get("ivf:16:/a", "s")("a16")
    m.get("ivf:64:/a", "s")("a64")
    m.get("ivf:16:/b", "s")("b16")
    assert(m.size == 3)
    assert(m.get("ivf:16:/a", "s")(fail("must not rebuild")) == "a16")
  }

  test("concurrent callers of one key build exactly once") {
    val m = new SnapshotMemoizer[String]
    val builds = new java.util.concurrent.atomic.AtomicInteger
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 32).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            m.get("k", "s") { builds.incrementAndGet(); Thread.sleep(5); "v" }
        })
      }
      assert(tasks.map(_.get()).distinct == Seq("v"))
      assert(builds.get == 1, s"raced ${builds.get} builds for one key")
    } finally pool.shutdown()
  }

  test("a slow build of one key does not stall a DIFFERENT key in the same bin") {
    // Liveness (verdict r16): "Aa" and "BB" have identical hashCode
    // (2112), so they land in the same ConcurrentHashMap bin — under the
    // old build-under-compute form, key "BB" would block for key "Aa"'s
    // whole (multi-second Spark training) build.
    assert("Aa".hashCode == "BB".hashCode)
    val m = new SnapshotMemoizer[String]
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    try {
      val slow = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = m.get("Aa", "s") {
          started.countDown()
          assert(release.await(30, java.util.concurrent.TimeUnit.SECONDS))
          "slow"
        }
      })
      assert(started.await(30, java.util.concurrent.TimeUnit.SECONDS))
      // While Aa is mid-build, a same-bin key must complete immediately.
      val t0 = System.nanoTime()
      assert(m.get("BB", "s")("fast") == "fast")
      val waitedMs = (System.nanoTime() - t0) / 1e6
      release.countDown()
      assert(slow.get() == "slow")
      assert(waitedMs < 5000,
        f"same-bin get stalled $waitedMs%.0f ms behind another key's build")
    } finally pool.shutdown()
  }

  test("a builder that throws is retried on the next get") {
    val m = new SnapshotMemoizer[String]
    var attempts = 0
    intercept[IllegalStateException](m.get("k", "s") {
      attempts += 1; throw new IllegalStateException("train failed")
    })
    assert(m.get("k", "s") { attempts += 1; "ok" } == "ok")
    assert(attempts == 2, "a failed build must not poison the key")
    assert(m.get("k", "s")(fail("must not rebuild after success")) == "ok")
  }
}
