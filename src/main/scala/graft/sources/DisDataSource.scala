package graft.sources

import java.{util => ju}

import scala.jdk.CollectionConverters._

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Spark DSv2 connector for the partitioned message stream — the
  * engine's re-expression of the reference's three entry points
  * (SURVEY §3): batch reads over explicit offset ranges
  * (`DISUtils.createRDD`, dis/DISUtils.scala:57-78,240-303), the direct
  * micro-batch streaming source (`createDirectStream` /
  * `DirectDISInputDStream`, dis/DirectDISInputDStream.scala:50-406) and
  * the producer sink (dis/DISSink.scala:23-55).
  *
  * Usage:
  * {{{
  *   spark.read.format("dis")
  *     .option("client.root", dir).option("stream", "s")
  *     .option("offsetRanges", """{"s":{"0":[100,200],"1":[-2,-1]}}""")
  *     .load()
  *   spark.readStream.format("dis")
  *     .option("client.root", dir).option("stream", "s")
  *     .option("startingOffsets", "earliest")
  *     .option("maxRecordsPerTrigger", "1000").load()
  *   df.writeStream.format("dis").option(...).start()
  * }}}
  */
class DisTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "dis"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Dis.schema
  override def getTable(schema: StructType, partitioning: Array[Transform], properties: ju.Map[String, String]): Table =
    new DisTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = true
}

object Dis {
  /** Parse a numeric option with an error that names the option. */
  def longOption(options: Map[String, String], key: String): Option[Long] =
    options.get(key).map { v =>
      try v.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"option '$key' must be a number, got '$v'")
      }
    }

  /** Fixed record schema, Kafka-source-compatible (SURVEY §1.1):
    * the reference's ConsumerRecord fields as columns. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  /** Reference-connector options this engine's client boundary cannot
    * honor — payload serialization modes, payload encryption, and
    * credential/config providers belong to the remote service SDK
    * (dis/DISUtils.scala:324-334). Silently ignoring them would make a
    * migrated job read garbage or skip encryption without warning, so
    * they are rejected by name at table construction. Boolean feature
    * flags explicitly set to their disabled default (false/0/no/off)
    * are accepted: the connector's behavior already matches, and a
    * migrated job should not fail over a no-op line. */
  val unsupportedOptions: Set[String] = Set(
    "body.serialize.type",
    "data.encrypt.enabled",
    "data.password",
    "config.provider.class",
    "trusted.jks.enabled")

  private val booleanFeatureFlags = Set("data.encrypt.enabled", "trusted.jks.enabled")
  private val disabledValues = Set("false", "0", "no", "off")

  /** Throw a named error for any explicitly-unsupported option that
    * actually requests unimplemented behavior (keys pre-normalized to
    * lower case). */
  def rejectUnsupported(options: Map[String, String]): Unit = {
    val bad = options.keySet.intersect(unsupportedOptions).filter { k =>
      !(booleanFeatureFlags.contains(k) &&
        disabledValues.contains(options(k).trim.toLowerCase(ju.Locale.ROOT)))
    }
    if (bad.nonEmpty) {
      throw new IllegalArgumentException(
        s"unsupported option(s) ${bad.toSeq.sorted.mkString("'", "', '", "'")}: " +
          "payload serialization/encryption and config providers are not " +
          "implemented by this connector; remove the option(s) instead of " +
          "relying on them silently")
    }
  }

  def stream(options: Map[String, String]): String =
    options.getOrElse("stream", throw new IllegalArgumentException("option 'stream' is required"))

  /** Explicit partition assignment from the `assign` option
    * (`{"stream":[0,2]}`) — the Assign consumer strategy (reference
    * dis/ConsumerStrategy.scala:186-213): consume exactly these
    * partitions of exactly these streams, batch AND streaming. Mutually
    * exclusive with `stream`/`subscribePattern`, same as Kafka's
    * exactly-one-of rule — a job setting both has two conflicting
    * sources of truth, so it fails loudly instead of guessing. */
  def assignment(options: Map[String, String]): Option[Map[String, Seq[Int]]] =
    options.get("assign").map { json =>
      require(!options.contains("subscribepattern") && !options.contains("stream"),
        "options 'assign' and 'stream'/'subscribePattern' are mutually " +
          "exclusive: pass exactly one subscription mode")
      Offsets.streamPartitions(json)
    }

  /** Readable partitions of `stream` under the active subscription
    * mode: the assigned subset when `assign` is set (validated against
    * the service so a typo'd partition fails loudly instead of reading
    * nothing forever), otherwise everything the service reports —
    * which keeps per-trigger partition elasticity. An assigned subset
    * is intentionally NOT elastic: the contract is "exactly these". */
  def partitionsFor(client: StreamClient, stream: String, options: Map[String, String]): Seq[Int] =
    assignment(options) match {
      case Some(assigned) =>
        val want = assigned.getOrElse(stream, Seq.empty)
        val have = client.partitionsFor(stream).toSet
        val missing = want.filterNot(have)
        require(missing.isEmpty,
          s"assigned partition(s) ${missing.mkString(",")} do not exist in stream '$stream' " +
            s"(existing: ${have.toSeq.sorted.mkString(",")})")
        want
      case None => client.partitionsFor(stream)
    }

  /** Subscribed streams: explicit `stream`, every service stream
    * matching `subscribePattern` (O16 SubscribePattern analog,
    * dis/ConsumerStrategy.scala:132-171), or the keys of an explicit
    * `assign` map. Pattern resolution happens at planning time, so
    * streams created later are picked up by the next trigger — same
    * elasticity as partitions. */
  def streamsFor(client: StreamClient, options: Map[String, String]): Seq[String] =
    assignment(options) match {
      case Some(assigned) => assigned.keys.toSeq.sorted
      case None => options.get("subscribepattern") match {
        case Some(pattern) =>
          val re = pattern.r
          val matched = client.listStreams().filter(s => re.pattern.matcher(s).matches())
          require(matched.nonEmpty ||
            options.get("allowemptysubscription").exists(_.toBoolean),
            s"subscribePattern '$pattern' matched no streams")
          matched
        case None => Seq(stream(options))
      }
    }
  def groupId(options: Map[String, String]): String =
    options.getOrElse("groupid", "graft-default-group") // keys pre-normalized to lower case

  /** Normalize option keys to lower case once (CaseInsensitiveStringMap
    * semantics preserved when options travel to executors as a plain Map). */
  def normalize(options: Map[String, String]): Map[String, String] =
    options.map { case (k, v) => k.toLowerCase(ju.Locale.ROOT) -> v }
}

class DisTable(options: Map[String, String]) extends Table with SupportsRead with SupportsWrite {
  private val opts = Dis.normalize(options)
  Dis.rejectUnsupported(opts)
  override def name(): String =
    s"dis:${opts.getOrElse("stream", opts.getOrElse("subscribepattern", opts.getOrElse("assign", "?")))}"
  override def schema(): StructType = Dis.schema
  override def capabilities(): ju.Set[TableCapability] = ju.EnumSet.of(
    TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
    TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
    TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder =
    new DisScanBuilder(opts ++ Dis.normalize(scanOptions.asScala.toMap))
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder =
    new DisWriteBuilder(opts ++ Dis.normalize(info.options().asScala.toMap), info.schema())
}

class DisScanBuilder(options: Map[String, String]) extends ScanBuilder {
  override def build(): Scan = new DisScan(options)
}

class DisScan(options: Map[String, String]) extends Scan {
  override def readSchema(): StructType = Dis.schema
  override def description(): String =
    s"DisScan(${options.getOrElse("stream", options.getOrElse("subscribepattern", "?"))})"
  override def toBatch: Batch = new DisBatch(options)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new DisMicroBatchStream(options)
}

/** Batch scan over explicit or sentinel-resolved offset ranges —
  * O1/O2 (dis/DISUtils.scala:57-78, 240-303). Sentinels are resolved
  * driver-side against the admin surface of the client, then one
  * InputPartition per range (O7, dis/DISRDD.scala:83-87). */
class DisBatch(options: Map[String, String]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val client = StreamClient.forOptions(options)
    try {
      val ranges: Seq[OffsetRange] = options.get("offsetranges") match {
        case Some(json) =>
          Offsets.partitionRanges(json).map { r =>
            OffsetRange(r.stream, r.partition,
              Offsets.resolve(r.fromOffset, client.earliestOffset(r.stream, r.partition),
                client.latestOffset(r.stream, r.partition)),
              Offsets.resolve(r.untilOffset, client.earliestOffset(r.stream, r.partition),
                client.latestOffset(r.stream, r.partition)))
          }
        case None =>
          val streams = Dis.streamsFor(client, options)
          val starting = DisMicroBatchStream.resolveOffsets(
            client, streams, options.getOrElse("startingoffsets", "earliest"), options)
          val ending = DisMicroBatchStream.resolveOffsets(
            client, streams, options.getOrElse("endingoffsets", "latest"), options)
          starting.toSeq.sortBy(_._1).map { case ((s, p), from) =>
            OffsetRange(s, p, from, math.max(ending.getOrElse((s, p), from), from))
          }
      }
      val hosts = ExecutorLocator.sortedExecutors()
      // Range splitting: the reference never splits a partition's range
      // (1 task per stream partition, dis/DISRDD.scala:83-87) — at
      // 100 TB a single partition's backlog must fan out across tasks.
      // maxRecordsPerPartition chunks each [from,until) range; chunks
      // share the partition's preferred executor (consumer-cache
      // affinity is per (group,stream,partition)).
      val maxPerTask = Dis.longOption(options, "maxrecordsperpartition")
      val split: OffsetRange => Seq[OffsetRange] = r => maxPerTask match {
        case Some(m) if m > 0 && r.count > m =>
          (r.fromOffset until r.untilOffset by m).map { from =>
            OffsetRange(r.stream, r.partition, from, math.min(from + m, r.untilOffset))
          }
        case _ => Seq(r)
      }
      val fixed = ExecutorLocator.fixedHosts(options)
      ranges.filter(_.count > 0L).flatMap(split).map { r =>
        DisInputPartition(r, options,
          ExecutorLocator.preferredFor(r.stream, r.partition, hosts, fixed))
          .asInstanceOf[InputPartition]
      }.toArray
    } finally client.close()
  }
  override def createReaderFactory(): PartitionReaderFactory = new DisReaderFactory(options)
}

/** One reader task per stream partition (O7), with cache-affinity
  * preferred locations (O10, dis/DISRDD.scala:146-180). */
final case class DisInputPartition(
    range: OffsetRange,
    options: Map[String, String],
    preferred: Array[String]) extends InputPartition {
  override def preferredLocations(): Array[String] = preferred
}

/** Location strategies (reference dis/LocationStrategy.scala:36-84):
  * PreferConsistent (default) — deterministic executor choice per
  * partition so the executor-side consumer cache keeps hitting: sort
  * executors, index = floorMod(hash(stream, partition), n), same trick
  * as dis/DISRDD.scala:162-180. PreferFixed — explicit per-partition
  * hosts from the `preferFixed` JSON option, falling back to
  * consistent for unmapped partitions (reference fixed-map fallback,
  * dis/LocationStrategy.scala:69-74). PreferBrokers has no analog: the
  * stream service does not run on Spark hosts (the reference itself
  * rejects it for RDDs, dis/DISUtils.scala:63-72). */
object ExecutorLocator {
  def sortedExecutors(): Array[String] =
    SparkSession.getActiveSession.map(_.sparkContext) match {
      case Some(sc) if !sc.isLocal =>
        sc.statusTracker.getExecutorInfos.map(_.host()).distinct.sorted
      case _ => Array.empty // local mode / no session: no preference
    }

  /** The per-partition fixed-host map from `preferFixed`, if set. */
  def fixedHosts(options: Map[String, String]): Map[(String, Int), String] =
    options.get("preferfixed").map(Offsets.partitionHosts).getOrElse(Map.empty)

  def preferredFor(stream: String, partition: Int, hosts: Array[String],
      fixed: Map[(String, Int), String] = Map.empty): Array[String] =
    fixed.get((stream, partition)) match {
      case Some(host) => Array(host)
      case None if hosts.isEmpty => Array.empty
      case None =>
        Array(hosts(java.lang.Math.floorMod((stream, partition).hashCode(), hosts.length)))
    }
}

/** Streaming micro-batch source — the DirectDISInputDStream analog.
  * Offset discovery + partition elasticity per trigger (O5,
  * dis/DirectDISInputDStream.scala:185-220), lag-proportional admission
  * control (O6, :129-161) via SupportsAdmissionControl, commit-on-
  * progress (O17, :286-365) via `commit()`. Checkpoint recovery is
  * Structured Streaming's offset WAL (replaces O18). */
class DisMicroBatchStream(options: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  private val client = StreamClient.forOptions(options)
  private def streams: Seq[String] = Dis.streamsFor(client, options)
  private val maxPerTrigger = Dis.longOption(options, "maxrecordspertrigger")
  private val maxRatePerPartition = Dis.longOption(options, "maxratepertrigger")
    .orElse(Dis.longOption(options, "maxrateperpartition"))
  // per-partition cap overrides (PerPartitionConfig analog,
  // dis/PerPartitionConfig.scala:30-46): `{"stream":{"0":100}}` caps
  // partition 0 at 100 records/trigger while others keep the uniform cap
  private val ratePerPartitionOverrides: Map[(String, Int), Long] =
    options.get("maxrateperpartitionoverrides")
      .map(Offsets.partitionOffsets).getOrElse(Map.empty)
  ratePerPartitionOverrides.foreach { case ((s, p), cap) =>
    require(cap > 0, s"maxRatePerPartitionOverrides: cap for $s-$p must be positive, got $cap")
  }
  // backpressure (O6 analog): proportional controller on measured
  // trigger throughput; budget = min(static, adaptive)
  private val rateController: Option[RateController] =
    if (options.get("backpressureenabled").exists(_.toBoolean))
      Some(new RateController(
        targetTriggerMs = options.get("targettriggerms").map(_.toLong).getOrElse(1000L),
        initialRatePerSec = options.get("backpressureinitialrate").map(_.toDouble)))
    else None

  // Trigger.AvailableNow: freeze the target offsets once, then let
  // rate-limited triggers advance toward them (the wrapper-free path
  // Spark asks connectors to provide).
  @volatile private var availableNowTarget: Option[Map[(String, Int), Long]] = None
  // last latest-offsets snapshot, reused by reportLatestOffset so each
  // trigger scans partition metadata once, not twice
  @volatile private var lastLatest: Map[(String, Int), Long] = null

  private def fetchLatest(): Map[(String, Int), Long] =
    streams.flatMap(s => Dis.partitionsFor(client, s, options)
      .map(p => (s, p) -> client.latestOffset(s, p))).toMap

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(fetchLatest())

  override def reportLatestOffset(): Offset =
    DisSourceOffset(Option(lastLatest).getOrElse(fetchLatest()))

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset =
    DisSourceOffset(DisMicroBatchStream.resolveOffsets(
      client, streams, options.getOrElse("startingoffsets", "earliest"), options))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startMap = DisSourceOffset.from(start).offsets
    val latest = availableNowTarget.getOrElse(fetchLatest())
    lastLatest = latest
    // partition elasticity: new partitions enter at their earliest offset
    // (dis/DirectDISInputDStream.scala:190-196); revoked ones drop out.
    val current = latest.map { case (tp, _) =>
      tp -> startMap.getOrElse(tp, client.earliestOffset(tp._1, tp._2))
    }
    val staticBudget = limit match {
      case rows: ReadMaxRows => Some(rows.maxRows())
      case _                 => maxPerTrigger
    }
    val now = System.currentTimeMillis()
    val adaptive = rateController.flatMap(_.nextBudget(now))
    val budget = (staticBudget, adaptive) match {
      case (Some(a), Some(b)) => Some(math.min(a, b))
      case (a, b)             => a.orElse(b)
    }
    val lags = current.map { case (tp, cur) => tp -> math.max(latest(tp) - cur, 0L) }
    val allocation = RateAllocator.allocate(lags, budget, maxRatePerPartition,
      ratePerPartitionOverrides)
    val end = RateAllocator.clamp(current, latest, allocation)
    rateController.foreach(_.admitted(
      end.map { case (tp, e) => e - current.getOrElse(tp, e) }.sum, now))
    DisSourceOffset(end)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val startMap = DisSourceOffset.from(start).offsets
    val endMap = DisSourceOffset.from(end).offsets
    val hosts = ExecutorLocator.sortedExecutors()
    val fixed = ExecutorLocator.fixedHosts(options)
    endMap.toSeq.sortBy(_._1).flatMap { case ((s, p), until) =>
      val from = startMap.getOrElse((s, p), client.earliestOffset(s, p))
      if (until > from) {
        Some(DisInputPartition(OffsetRange(s, p, from, until), options,
          ExecutorLocator.preferredFor(s, p, hosts, fixed)).asInstanceOf[InputPartition])
      } else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new DisReaderFactory(options)

  override def deserializeOffset(json: String): Offset =
    DisSourceOffset(Offsets.partitionOffsets(json))

  /** Commit-on-progress: push the trigger's end offsets back to the
    * consumer group (O17 analog; opt-in like the reference's explicit
    * commitAsync). */
  override def commit(end: Offset): Unit = {
    if (options.get("commitontrigger").exists(_.toBoolean)) {
      val byStream = DisSourceOffset.from(end).offsets.groupBy(_._1._1)
      byStream.foreach { case (s, offs) =>
        client.commit(s, Dis.groupId(options), offs.map { case ((_, p), o) => p -> o })
      }
    }
    // drain ranges queued via DisAdmin.commitOnNextTrigger — the
    // reference's enqueue-then-drain-at-next-compute contract
    // (dis/DirectDISInputDStream.scala:286-328); independent of the
    // commitOnTrigger auto-commit above
    DisAdmin.drainQueued(client, options.getOrElse("client.root", ""), Dis.groupId(options))
  }

  override def stop(): Unit = client.close()
}

object DisMicroBatchStream {
  /** Resolve a startingOffsets/endingOffsets option value:
    * "earliest" | "latest" | JSON with -1/-2 sentinels
    * (O2/O16 semantics, dis/ConsumerStrategy.scala:485-513). Partition
    * scope honors an `assign` subset in `options`. */
  def resolveOffsets(client: StreamClient, streams: Seq[String], spec: String,
      options: Map[String, String] = Map.empty): Map[(String, Int), Long] =
    streams.flatMap { stream =>
      val parts = Dis.partitionsFor(client, stream, options)
      spec.trim.toLowerCase(ju.Locale.ROOT) match {
        case "earliest" => parts.map(p => (stream, p) -> client.earliestOffset(stream, p))
        case "latest"   => parts.map(p => (stream, p) -> client.latestOffset(stream, p))
        case _ =>
          val given = Offsets.partitionOffsets(spec)
          parts.map { p =>
            val o = given.get((stream, p))
              .map(Offsets.resolve(_, client.earliestOffset(stream, p), client.latestOffset(stream, p)))
              .getOrElse(client.earliestOffset(stream, p))
            (stream, p) -> o
          }
      }
    }.toMap
}

/** Streaming offset: JSON dialect `{"stream":{"0":23}}` — same as the
  * reference's partitionOffsets codec (O23, dis/JsonUtils.scala:44-63)
  * and Spark's Kafka source. */
final case class DisSourceOffset(offsets: Map[(String, Int), Long]) extends Offset {
  override def json(): String = Offsets.partitionOffsetsJson(offsets)
}

object DisSourceOffset {
  def from(offset: Offset): DisSourceOffset = offset match {
    case o: DisSourceOffset => o
    case o => DisSourceOffset(Offsets.partitionOffsets(o.json()))
  }
}

class DisReaderFactory(options: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DisPartitionReader(partition.asInstanceOf[DisInputPartition])
}

/** Executor-side sequential range reader [from, until) — O11
  * (dis/DISRDD.scala:187-264): acquires a cached consumer, task-
  * completion releases it; `get` enforces offset continuity unless
  * allowNonConsecutiveOffsets (O12). */
class DisPartitionReader(partition: DisInputPartition) extends PartitionReader[InternalRow] {
  private val opts = partition.options
  private val range = partition.range
  private val reattempt = Option(TaskContext.get()).exists(_.attemptNumber() > 0)
  private val consumer = ReaderCache.global.acquire(
    ReaderCache.Key(Dis.groupId(opts), opts.getOrElse("client.root", ""),
      range.stream, range.partition), reattempt) {
    new PartitionConsumer(
      Dis.groupId(opts), range.stream, range.partition,
      StreamClient.forOptions(opts),
      fetchBatchSize = opts.get("fetchbatchsize").map(_.toInt).getOrElse(1024),
      pollTimeoutMs = opts.get("polltimeoutms").map(_.toLong).getOrElse(10000L),
      allowNonConsecutiveOffsets = opts.get("allownonconsecutiveoffsets").exists(_.toBoolean))
  }
  private var nextOffset = range.fromOffset
  private var current: StreamRecord = _

  override def next(): Boolean = {
    if (nextOffset >= range.untilOffset) return false
    current = consumer.get(nextOffset)
    if (current == null) {
      if (opts.get("failondataloss").forall(_.toBoolean)) {
        throw new IllegalStateException(
          s"Offset $nextOffset unavailable in ${range.stream}-${range.partition} " +
            s"(range [${range.fromOffset},${range.untilOffset})). " +
            "Set failOnDataLoss=false to skip missing data.")
      }
      return false
    }
    if (current.offset >= range.untilOffset) return false // gap skipped past range end
    nextOffset = current.offset + 1
    true
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(6)
    row.update(0, current.key)
    row.update(1, current.value)
    row.update(2, UTF8String.fromString(current.stream))
    row.update(3, current.partition)
    row.update(4, current.offset)
    row.update(5, current.timestampMs * 1000L) // ms → µs for TimestampType
    row
  }

  override def close(): Unit = ReaderCache.global.release(consumer)
}
