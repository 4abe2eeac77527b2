package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Unit + property tests for the connector kernel: offset algebra and
  * JSON serde (≙ dis/JsonUtils.scala, dis/OffsetRange.scala), rate
  * allocation (≙ dis/DirectDISInputDStream.scala:129-161), backoff
  * (≙ dis/DISDataConsumer.scala:87-100), consumer cache
  * (≙ dis/DISDataConsumer.scala:261-406). */
class KernelSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  // ---- OffsetRange algebra ----

  test("OffsetRange count = until - from; empty when equal") {
    assert(OffsetRange("s", 0, 100, 200).count === 100)
    assert(OffsetRange("s", 0, 5, 5).isEmpty)
    assertThrows[IllegalArgumentException](OffsetRange("s", 0, 10, 5))
  }

  test("partitionOffsets JSON round-trip, sorted deterministically") {
    val offsets = Map(("b", 1) -> 23L, ("a", 0) -> 5L, ("b", 0) -> -1L, ("a", 2) -> -2L)
    val json = Offsets.partitionOffsetsJson(offsets)
    assert(json === """{"a":{"0":5,"2":-2},"b":{"0":-1,"1":23}}""")
    assert(Offsets.partitionOffsets(json) === offsets)
  }

  test("partitionOffsets rejects malformed JSON with a helpful message") {
    val e = intercept[IllegalArgumentException](Offsets.partitionOffsets("""{"s":[1,2]}"""))
    assert(e.getMessage.contains("""{"streamA":{"0":23,"1":-1}"""))
  }

  test("partitionRanges parses [from,until] pairs incl. sentinels") {
    val rs = Offsets.partitionRanges("""{"s":{"0":[100,200],"1":[-2,-1]}}""")
    assert(rs === Seq(OffsetRange("s", 0, 100, 200), OffsetRange("s", 1, -2, -1)))
  }

  test("sentinel resolution: -1 latest, -2 earliest, negatives rejected") {
    assert(Offsets.resolve(Offsets.Latest, 3L, 99L) === 99L)
    assert(Offsets.resolve(Offsets.Earliest, 3L, 99L) === 3L)
    assert(Offsets.resolve(42L, 3L, 99L) === 42L)
    assertThrows[IllegalArgumentException](Offsets.resolve(-3L, 0L, 0L))
  }

  test("property: offsets JSON round-trips for arbitrary maps") {
    val genEntry = for {
      s <- Gen.oneOf("s1", "s2", "s3")
      p <- Gen.choose(0, 64)
      o <- Gen.oneOf(Gen.choose(0L, Long.MaxValue / 2), Gen.oneOf(-1L, -2L))
    } yield (s, p) -> o
    check(Prop.forAll(Gen.mapOf(genEntry)) { m =>
      Offsets.partitionOffsets(Offsets.partitionOffsetsJson(m)) == m
    })
  }

  // ---- Rate allocation / admission control ----

  test("lag-proportional allocation splits the budget by lag share") {
    val lags = Map(("s", 0) -> 900L, ("s", 1) -> 100L)
    val a = RateAllocator.allocate(lags, Some(100L), None)
    assert(a(("s", 0)) === 90L)
    assert(a(("s", 1)) === 10L)
  }

  test("allocation floors at 1 record per partition (reference quirk: floors may exceed budget)") {
    val lags = (0 until 10).map(p => ("s", p) -> 1L).toMap
    val a = RateAllocator.allocate(lags, Some(3L), None)
    assert(a.values.forall(_ === 1L)) // 10 × 1 > 3: documented behavior
  }

  test("static per-partition cap applies after the proportional split") {
    val lags = Map(("s", 0) -> 1000L, ("s", 1) -> 1000L)
    val a = RateAllocator.allocate(lags, Some(1000L), Some(100L))
    assert(a.values.forall(_ === 100L))
  }

  test("no budget and no cap = unbounded") {
    val a = RateAllocator.allocate(Map(("s", 0) -> 7L), None, None)
    assert(a(("s", 0)) === Long.MaxValue)
  }

  test("property: allocation ≤ budget + #partitions (floor slack), each ≥ 1") {
    val genLags = Gen.nonEmptyMap(for {
      p <- Gen.choose(0, 32); lag <- Gen.choose(0L, 1000000L)
    } yield ("s", p) -> lag)
    check(Prop.forAll(genLags, Gen.choose(1L, 100000L)) { (lags, budget) =>
      val a = RateAllocator.allocate(lags, Some(budget), None)
      a.values.forall(_ >= 1L) && a.values.sum <= budget + lags.size
    })
  }

  test("clamp never passes latest and never regresses current") {
    val current = Map(("s", 0) -> 10L, ("s", 1) -> 5L)
    val latest = Map(("s", 0) -> 100L, ("s", 1) -> 5L)
    val end = RateAllocator.clamp(current, latest, Map(("s", 0) -> 20L, ("s", 1) -> 20L))
    assert(end(("s", 0)) === 30L)
    assert(end(("s", 1)) === 5L)
  }

  // ---- Backoff ----

  test("poll-retry backoff: 100ms × 1.5 capped at 5000ms") {
    val e = Backoff.pollRetry().execution()
    val seq = (1 to 12).map(_ => e.nextBackOff())
    assert(seq.take(4) === Seq(100L, 150L, 225L, 337L))
    assert(seq.last === 5000L)
    assert(seq.forall(_ <= 5000L))
  }

  test("backoff stops after the elapsed budget") {
    val e = new Backoff(100L, 2.0, 1000L, maxElapsedMs = 250L).execution()
    assert(e.nextBackOff() === 100L)
    assert(e.nextBackOff() === 200L)
    assert(e.nextBackOff() === Backoff.Stop)
  }

  // ---- Consumer cache ----

  private class FakeClient extends StreamClient {
    var closed = 0
    override def listStreams(): Seq[String] = Seq("s")
    override def partitionsFor(stream: String): Seq[Int] = Seq(0)
    override def earliestOffset(stream: String, partition: Int): Long = 0L
    override def latestOffset(stream: String, partition: Int): Long = 0L
    override def fetch(stream: String, partition: Int, fromOffset: Long, maxRecords: Int): Seq[StreamRecord] = Seq.empty
    override def append(stream: String, partition: Int, key: Array[Byte], value: Array[Byte]): Long = 0L
    override def commit(stream: String, groupId: String, offsets: Map[Int, Long]): Unit = ()
    override def committed(stream: String, groupId: String): Map[Int, Long] = Map.empty
    override def close(): Unit = closed += 1
  }

  private def consumer(p: Int) = new PartitionConsumer("g", "s", p, new FakeClient)

  test("cache reuses a released consumer for the same key") {
    val cache = new ReaderCache()
    val c1 = cache.acquire(ReaderCache.Key("g", "c", "s", 0), reattempt = false)(consumer(0))
    cache.release(c1)
    val c2 = cache.acquire(ReaderCache.Key("g", "c", "s", 0), reattempt = false)(consumer(0))
    assert(c1 eq c2)
    cache.release(c2)
  }

  test("concurrent acquire on an in-use key returns an uncached instance") {
    val cache = new ReaderCache()
    val c1 = cache.acquire(ReaderCache.Key("g", "c", "s", 0), reattempt = false)(consumer(0))
    val c2 = cache.acquire(ReaderCache.Key("g", "c", "s", 0), reattempt = false)(consumer(0))
    assert(c1 ne c2)
    cache.release(c2) // uncached one closes on release
    cache.release(c1)
    val c3 = cache.acquire(ReaderCache.Key("g", "c", "s", 0), reattempt = false)(consumer(0))
    assert(c3 eq c1) // the cached one survived
  }

  test("task reattempt invalidates the cached consumer") {
    val cache = new ReaderCache()
    val c1 = cache.acquire(ReaderCache.Key("g", "c", "s", 0), reattempt = false)(consumer(0))
    cache.release(c1)
    val c2 = cache.acquire(ReaderCache.Key("g", "c", "s", 0), reattempt = true)(consumer(0))
    assert(c1 ne c2)
    cache.release(c2)
  }

  test("eviction removes eldest not-in-use entries beyond capacity") {
    val cache = new ReaderCache(initialCapacity = 2, maxCapacity = 2)
    val held = cache.acquire(ReaderCache.Key("g", "c", "s", 0), reattempt = false)(consumer(0))
    (1 to 5).foreach { p =>
      val c = cache.acquire(ReaderCache.Key("g", "c", "s", p), reattempt = false)(consumer(p))
      cache.release(c)
    }
    assert(cache.size <= 3) // held one cannot be evicted; spill is bounded
    assert(cache.containsKey(ReaderCache.Key("g", "c", "s", 0))) // in-use never evicted
    cache.release(held)
  }

  // ---- PartitionConsumer semantics ----

  private class ScriptedClient(records: Map[Long, StreamRecord]) extends FakeClient {
    override def fetch(stream: String, partition: Int, fromOffset: Long, maxRecords: Int): Seq[StreamRecord] =
      records.keys.filter(_ >= fromOffset).toSeq.sorted.take(maxRecords).map(records)
  }

  private def rec(offset: Long) =
    StreamRecord("s", 0, offset, null, s"v$offset".getBytes, 1000L)

  test("sequential get with seek-repair on position mismatch") {
    val c = new PartitionConsumer("g", "s", 0, new ScriptedClient(
      (0L to 5L).map(o => o -> rec(o)).toMap), pollTimeoutMs = 100L)
    assert(c.get(0).offset === 0)
    assert(c.get(1).offset === 1)
    assert(c.get(4).offset === 4) // seek
    assert(c.get(5).offset === 5)
  }

  test("gap in offsets: hard error by default, skip with allowNonConsecutiveOffsets") {
    val gappy = Map(0L -> rec(0), 3L -> rec(3))
    val strict = new PartitionConsumer("g", "s", 0, new ScriptedClient(gappy), pollTimeoutMs = 100L)
    assert(strict.get(0).offset === 0)
    val e = intercept[IllegalStateException](strict.get(1))
    assert(e.getMessage.contains("allowNonConsecutiveOffsets"))

    val tolerant = new PartitionConsumer("g", "s", 0, new ScriptedClient(gappy),
      pollTimeoutMs = 100L, allowNonConsecutiveOffsets = true)
    assert(tolerant.get(0).offset === 0)
    assert(tolerant.get(1).offset === 3) // skipped the gap
  }

  test("get returns null after poll timeout on empty partition") {
    val c = new PartitionConsumer("g", "s", 0, new FakeClient, pollTimeoutMs = 50L)
    assert(c.get(0) === null)
  }

  test("line index: anchor-seek fetch across 256-line boundaries, incremental latest, truncation rescan") {
    val root = java.nio.file.Files.createTempDirectory("lineindex-")
    val client = new FileStreamClient(root)
    client.createStream("s", 1)
    (0 until 700).foreach(i => client.append("s", 0, null, s"v$i".getBytes("UTF-8")))
    assert(client.latestOffset("s", 0) === 700L)
    // fetch offsets straddling both anchor boundaries (256, 512)
    for (from <- Seq(0L, 255L, 256L, 257L, 511L, 512L, 640L, 699L)) {
      val got = client.fetch("s", 0, from, 3)
      assert(got.map(_.offset) === (from until math.min(from + 3, 700L)),
        s"fetch from $from")
      assert(new String(got.head.value, "UTF-8") === s"v$from")
    }
    assert(client.fetch("s", 0, 700L, 5) === Seq.empty)
    // appends after an index build are picked up incrementally
    client.append("s", 0, null, "tail".getBytes("UTF-8"))
    assert(client.latestOffset("s", 0) === 701L)
    assert(new String(client.fetch("s", 0, 700L, 1).head.value, "UTF-8") === "tail")
    // a replaced (shorter) file triggers a full rescan, not stale counts
    val f = root.resolve("s").resolve("p0.jsonl")
    val keep = java.nio.file.Files.readAllLines(f).subList(0, 10)
    java.nio.file.Files.write(f, String.join("\n", keep).concat("\n").getBytes("UTF-8"))
    assert(client.latestOffset("s", 0) === 10L)
    assert(new String(client.fetch("s", 0, 9L, 1).head.value, "UTF-8") === "v9")
  }
}
