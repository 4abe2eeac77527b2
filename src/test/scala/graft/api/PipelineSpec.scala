package graft.api

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.ops.Tables
import graft.sources.FileStreamClient
import graft.streaming.StreamingQueries

/** End-to-end training-data pipeline over the public operator surface —
  * the composition a real corpus build runs, proving the operators
  * chain without impedance mismatches:
  *
  *   clean → quality filter → language filter → near-dup pairs →
  *   duplicate clusters → keep one doc per cluster → deterministic
  *   sample → pack into training sequences.
  */
class PipelineSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("clean → filter → dedup → cluster → keep-first → sample → pack composes") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"), col("lang"))

    // 1. quality + language gates (cheap per-row filters first)
    val scored = Graft.qualityScore(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("text"), col("lang")), "doc_id")
    val kept = scored.filter(col("quality") > 0.3 && col("n_words") >= 5)
    val keptN = kept.count()
    assert(keptN > 100, s"quality gate too aggressive: $keptN")

    // 2. near-dup pairs → connected clusters → canonical keeper per cluster
    val pairs = Graft.minhashDupes(kept, "doc_id", "text", 0.8)
    val clusters = Graft.dupClusters(pairs, "id_a", "id_b")
    val deduped = kept
      .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val canonical = Graft.dedupKeepFirst(deduped, Seq("cluster_id"), "doc_id")
    val canonN = canonical.count()
    val pairN = pairs.count()
    assert(canonN < keptN || pairN == 0, "dedup removed nothing despite dup pairs")
    // every cluster contributes exactly one doc
    assert(canonical.select(col("cluster_id")).distinct().count() === canonN)

    // 3. deterministic stratified sample by language
    val sampled = Graft.hashSample(canonical, "lang", "doc_id",
      Map("en" -> 1.0, "de" -> 0.5, "es" -> 0.5, "fr" -> 0.5))
    val sampledN = sampled.count()
    assert(sampledN > 0 && sampledN <= canonN)

    // 4. pack into 512-token training sequences
    val packed = Graft.packSequences(
      Graft.tokenCounts(sampled, "doc_id", "text")
        .select(col("doc_id"), col("ws_tokens").as("n_tokens")),
      "doc_id", "n_tokens", 512L)
    val rows = packed.orderBy(col("doc_id")).collect()
    assert(rows.length === sampledN)
    // offsets are a consistent prefix sum: each doc starts where the
    // previous ended, and sequence ids never decrease
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) === a.getLong(2) + a.getLong(1), "offset gap")
        assert(b.getLong(3) >= a.getLong(3), "seq_id decreased")
      case _ =>
    }
    // the stream covers every token exactly once
    val totalTokens = rows.map(_.getLong(1)).sum
    assert(rows.last.getLong(2) + rows.last.getLong(1) === totalTokens)
  }

  test("round-8 curation composes: span/LM quality gates → decontaminate → " +
      "token-budget mixture") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))

    // 1. char-level duplication + LM-typicality gates (both non-vacuous:
    //    the span gate kills the exact-dup families, the LM gate cuts
    //    the top decile of surprisal)
    val spanScores = Graft.dupSpans(docs, "doc_id", "text", 20)
    val lm = Graft.lmScore(docs, "doc_id", "text")
    val lmCut = lm.agg(expr("percentile_approx(bits_per_token, 0.9)")).collect()(0).getDouble(0)
    val gated = docs
      .join(spanScores.filter(col("dup_frac") <= 0.8).select(col("doc_id")), "doc_id")
      .join(lm.filter(col("bits_per_token") <= lmCut).select(col("doc_id")), "doc_id")
    val nDocs = docs.count()
    val nGated = gated.count()
    assert(nGated > 0 && nGated < nDocs, s"gates vacuous: $nGated of $nDocs")

    // 2. decontaminate the survivors against a held-out benchmark slice
    val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val train = gated.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val decon = Graft.decontaminate(train, "doc_id", "text", bench, "text", 4)
    assert(decon.count() === train.count(), "decontaminate lost or invented docs")
    val clean = train.join(
      decon.filter(col("contaminated") === 0).select(col("doc_id")), "doc_id")

    // 3. token-budget mixture over derived domains
    val domains = clean.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 0, "web").otherwise("code").as("domain"),
      size(filter(split(col("text"), " "), t => t =!= "")).cast("long").as("n_tokens"))
    val budgets = Map("web" -> 400L, "code" -> 150L)
    val mixed = Graft.tokenBudgetSample(domains, "doc_id", "domain", "n_tokens", budgets)
    val perDomain = mixed.filter(col("kept") === 1)
      .groupBy(col("domain")).agg(sum(col("n_tokens")).as("toks"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perDomain.nonEmpty)
    perDomain.foreach { case (d, (toks, n)) =>
      assert(toks <= budgets(d), s"$d over budget: $toks")
      assert(n > 0, s"$d kept nothing")
    }
    // maximality: the cheapest unkept doc of each domain would not fit
    mixed.filter(col("kept") === 0)
      .groupBy(col("domain")).agg(min(col("cum_tokens")).as("c"))
      .collect().foreach { r =>
        assert(r.getLong(1) > budgets(r.getString(0)),
          s"${r.getString(0)} cut a doc that fit the budget")
      }
  }

  test("round-8 second-pass curation composes: domain filter → PII redact → " +
      "line dedup → compression gate → bloom decontaminate → epoch shards") {
    import spark.implicits._
    // synthetic corpus with every hazard the chain must handle: blocked
    // domains, injected PII, cross-doc repeated lines, low-entropy spam
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" mail u"), col("doc_id").cast("string"), lit("@x.io")))
            .otherwise(lit(""))).as("text"),
        concat(lit("https://site"), pmod(col("doc_id"), lit(10)).cast("string"),
          lit(".com/d/"), col("doc_id").cast("string")).as("url"))

    // 1. domain blocklist (site0.com is the spam domain: 10% of docs)
    val flagged = Graft.domainFilter(docs, "doc_id", "url",
      Seq("site0.com").toDF("domain"), "domain")
    val allowed = docs.join(
      flagged.filter(col("blocked") === 0).select(col("doc_id")), "doc_id")
    val nAll = docs.count()
    val nAllowed = allowed.count()
    assert(nAllowed < nAll && nAllowed > nAll / 2, s"blocklist: $nAllowed of $nAll")

    // 2. PII redaction — and the redaction must SURVIVE the rest of the
    //    chain: no later operator reintroduces raw text
    val redacted = Graft.piiRedact(allowed, "doc_id", "text")
      .select(col("doc_id"), col("redacted").as("text"))
    assert(redacted.filter(col("text").rlike("@")).count() === 0, "emails survived")

    // 3. corpus-level line dedup on the redacted text
    val lined = redacted.select(col("doc_id"),
      replace(col("text"), lit(" scan "), lit("\n")).as("text"))
    val deduped = Graft.lineDedup(lined, "doc_id", "text", "\n")
      .select(col("doc_id"), col("cleaned").as("text"))
    val removed = Graft.lineDedup(lined, "doc_id", "text", "\n")
      .agg(sum(col("n_removed"))).collect()(0).getLong(0)
    assert(removed > 0, "line dedup found nothing on a repetitive corpus")

    // 4. compression-ratio gate (drop the most machine-like decile)
    val ratios = Graft.compressionRatio(deduped, "doc_id", "text")
    val cut = ratios.agg(expr("percentile_approx(ratio, 0.1)")).collect()(0).getDouble(0)
    val survivors = deduped.join(
      ratios.filter(col("ratio") >= cut).select(col("doc_id")), "doc_id")
    val nSurv = survivors.count()
    assert(nSurv > 0 && nSurv < nAllowed, s"compression gate vacuous: $nSurv")

    // 5. bloom decontamination against a benchmark slice — and it must
    //    agree with the exact gate inside the pipeline too
    val bench = survivors.filter(pmod(col("doc_id"), lit(97)) === 0)
    val train = survivors.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val deconB = Graft.decontaminateBloom(train, "doc_id", "text", bench, "text", 4, 0.2)
    val deconE = Graft.decontaminate(train, "doc_id", "text", bench, "text", 4)
    assert(deconB.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      deconE.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      "bloom and exact decontamination diverged mid-pipeline")
    val clean = train.join(
      deconB.filter(col("contaminated") === 0).select(col("doc_id")), "doc_id")

    // 6. epoch shuffle into training shards: a permutation of exactly
    //    the clean set, dense positions per shard
    val shards = Graft.epochShuffle(clean, "doc_id", 4)
    val out = shards.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).sorted.toSeq ===
      clean.collect().map(_.getLong(0)).sorted.toSeq, "shards lost/invented docs")
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
        s"shard $s positions not dense")
    }
  }

  test("round-8 third-pass curation composes: NB spam gate → cross-corpus dedup → " +
      "leakage-safe split → per-split sample → BPE tokenize → pack") {
    import spark.implicits._
    // plant separable spam: every 4th doc gets a spam-vocab suffix
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(4)) === 0,
            lit(" buy click free winner offer buy free click offer winner"))
            .otherwise(lit(""))).as("text"),
        when(pmod(col("doc_id"), lit(4)) === 0, "spam").otherwise("good").as("cls"))

    // 1. train the NB gate on half the corpus, score the rest, keep 'good'
    val train = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val rest = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val model = Graft.nbTrain(train, "cls", "text", 512)
    val scored = Graft.nbScore(rest, "doc_id", "text", model, 512)
    val labeled = scored.join(docs.select(col("doc_id"), col("cls")), "doc_id")
    val acc = labeled.filter(col("pred_label") === col("cls")).count().toDouble /
      labeled.count()
    assert(acc >= 0.9, s"NB gate accuracy $acc on planted spam")
    val kept = rest.join(
      scored.filter(col("pred_label") === "good").select(col("doc_id")), "doc_id")

    // 2. cross-corpus dedup against the already-admitted half: any kept
    //    doc near-duplicating an admitted one is dropped
    val dupes = Graft.crossNearDup(kept, train, "doc_id", "text", 0.8)
    val admitted = kept.join(dupes.select(col("new_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    assert(admitted.count() <= kept.count())

    // 3. leakage-safe split keyed by a coarse domain group (doc_id mod 50):
    //    near-dups in a group can never straddle train/eval
    val grouped = admitted.withColumn("grp", pmod(col("doc_id"), lit(50)))
    val split = Graft.splitByGroup(grouped, "grp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).cache()
    assert(split.select("grp", "split").distinct().count() ===
      split.select("grp").distinct().count(), "a group straddled splits")

    // 4. deterministic eval subset: exactly k docs per split (or the
    //    whole split when smaller)
    val sampled = Graft.sampleKPerStratum(split, "split", "doc_id", 20)
    val perSplit = sampled.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSplit.values.forall(_ <= 20))

    // 5. BPE trained on the train split only; encode the val docs
    val trainSplit = split.filter(col("split") === "train")
    val merges = graft.ops.Bpe.train(trainSplit, "text", 30)
    assert(merges.nonEmpty)
    val encoded = graft.ops.Bpe.encode(
      split.filter(col("split") === "val"), "doc_id", "text", merges)
    // round-trip safety inside the pipeline
    val rt = encoded.join(split.select(col("doc_id"), col("text")), "doc_id")
      .filter(replace(col("bpe_tokens"), lit(" "), lit("")) =!=
              replace(col("text"), lit(" "), lit("")))
    assert(rt.count() === 0, "BPE round-trip broke inside the pipeline")

    // 6. pack the encoded val docs into training sequences
    val packed = Graft.packSequences(
      encoded.select(col("doc_id"), col("n_tokens")), "doc_id", "n_tokens", 256)
    val total = encoded.agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    val lastOff = packed.agg(max(col("stream_off") + col("n_tokens")))
      .collect()(0).getLong(0)
    assert(lastOff === total, "packing lost tokens")
    split.unpersist()
  }

  test("round-9 curation composes: URL gate → Gopher rules → winnow dedup → " +
      "perplexity buckets → entropy floor → mixture weights → authority rank") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))

    // 1. URL canonicalization + domain blocklist on synthesized URLs
    val withUrl = docs.withColumn("url",
      concat(lit("HTTP://u@Site"), pmod(col("doc_id"), lit(13)), lit(".COM:80/p")))
    val urlGated = Graft.domainFilter(withUrl, "doc_id", "url",
      Seq("site3.com", "site7.com").toDF("d"), "d")
      .filter(col("blocked") === 0L).select("doc_id")
      .join(withUrl, "doc_id")
    assert(urlGated.count() < docs.count(), "blocklist dropped nothing")

    // 2. Gopher rule gate (fixture-tuned bounds) — keep survivors
    val gated = Graft.qualityGate(urlGated, "doc_id", "text",
      minWords = 20, maxWords = 95, minMeanLen = 4.0, maxMeanLen = 7.0,
      minStopHits = 1)
      .filter(col("keep") === 1L).select("doc_id")
      .join(urlGated, "doc_id").localCheckpoint(true) // truncate lineage:
    // the chained self-referencing operators below would otherwise
    // multiply the plan tree past what explainString can render
    val nGated = gated.count()
    assert(nGated > 0 && nGated < docs.count())

    // 3. winnowing near-dup candidates: shared fingerprints between
    //    different docs, verified by exact jaccard, losers dropped
    val fps = Graft.winnow(gated, "doc_id", "text", 8, 4)
    val cand = fps.as("a").join(fps.as("b"),
        $"a.fp" === $"b.fp" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b")).distinct()
    val verified = Graft.ngramJaccard(
      gated.select(col("doc_id"), col("text")), "doc_id", "text", 8, 0.75)
    val losers = verified.select(greatest(col("id_a"), col("id_b")).as("doc_id")).distinct()
    val deduped = gated.join(losers, Seq("doc_id"), "left_anti").localCheckpoint(true)
    val nDeduped = deduped.count()

    // 4. per-language perplexity buckets; drop the tail third
    val buckets = Graft.perplexityBuckets(deduped, "doc_id", "text", "lang")
    val headMid = deduped.join(
      buckets.filter(col("bucket") =!= "tail").select("doc_id"), "doc_id").localCheckpoint(true)
    assert(headMid.count() < nDeduped, "tail third not dropped")

    // 5. entropy floor: drop degenerate (low-entropy) docs
    val ent = Graft.tokenEntropy(headMid, "doc_id", "text")
    val kept = headMid.join(
      ent.filter(col("entropy") >= 2.0).select("doc_id"), "doc_id").localCheckpoint(true)
    assert(kept.count() > 0)

    // 6. mixture weights over the surviving corpus
    val mix = Graft.mixtureWeights(kept, "source", "text",
      alpha = 0.5, budgetTokens = 100000L)
    val wsum = mix.agg(sum(col("weight"))).collect()(0).getDouble(0)
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum to $wsum")

    // 7. source authority from a doc-source bipartite co-occurrence
    //    graph (every kept doc links its source both ways)
    val e0 = kept.select(concat(lit("d"), col("doc_id")).as("src"),
      col("source").as("dst"))
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val ranks = Graft.pageRank(edges, "src", "dst", 2, 0.85)
    val topSource = ranks.filter(!col("node").startsWith("d"))
      .orderBy(col("rank").desc).limit(1).collect()
    assert(topSource.nonEmpty && topSource(0).getDouble(1) > 0)
  }

  test("round-9 crawl chain composes: HTML extract → link-graph pageRank → " +
      "cluster dedup → context-window chunks") {
    // A synthetic 60-page crawl: page i carries its id only inside a
    // <script> block (stripped with the block), body text identical
    // within each of 20 three-page families, and two outbound links
    // i → (2i+1) mod n, i → (i+7) mod n.
    val n = 60
    val pages = spark.range(n).select(col("id").as("page_id"),
      concat(
        lit("<html><body><script>var page = "), col("id"), lit(";</script><p>family "),
        pmod(col("id"), lit(20)),
        lit(" lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
        lit(" tempor incididunt ut labore</p><a href=\"https://crawl.test/p/"),
        pmod(col("id") * 2 + 1, lit(n.toLong)),
        lit("\">next</a><a href=\"https://crawl.test/p/"),
        pmod(col("id") + 7, lit(n.toLong)),
        lit("\">hop</a></body></html>")).as("html"))

    // 1. the SAME pages yield text for curation and edges for authority
    val text = Graft.htmlExtract(pages, "page_id", "html")
    val links = Graft.anchorLinks(pages, "page_id", "html")
    assert(text.filter(col("n_links") === 2).count() === n)
    assert(links.count() === 2L * n)
    // the page id lives only in the stripped script block: extracted
    // text is identical within a family
    assert(text.select(col("text")).distinct().count() === 20)

    // 2. link-graph authority over the parsed targets
    val edges = links.select(col("page_id").as("src"),
      regexp_extract(col("href"), "(\\d+)$", 1).cast("long").as("dst"))
    val pr = Graft.pageRank(edges, "src", "dst", iters = 3)
    assert(pr.count() === n)
    val prSum = pr.agg(sum(col("rank"))).collect()(0).getDouble(0)
    assert(math.abs(prSum - 1.0) < 1e-6, s"rank mass $prSum")

    // 3. near-dup cluster dedup: exactly one canonical page per family
    //    (cross-family jaccard ~0.78 sits under the 0.8 verify bar)
    val pairs = Graft.minhashDupes(text, "page_id", "text", 0.8)
    val dedup = Graft.clusterDedup(text, "page_id", pairs, "id_a", "id_b")
    val kept = dedup.filter(col("kept"))
    assert(kept.count() === 20)
    // canonical = min page id of each family = pages 0..19
    assert(kept.select(col("page_id")).collect().map(_.getLong(0)).sorted
      === (0L until 20L).toArray)

    // 4. context-window chunks over the kept corpus: 18 tokens at
    //    width 8 / stride 4 → 4 chunks per page, tail clipped to 6
    val chunks = Graft.chunkWindows(
      text.join(kept.select("page_id"), "page_id"), "page_id", "text", 8, 4)
    assert(chunks.count() === 20L * 4)
    val perDoc = chunks.filter(col("page_id") === 0)
      .orderBy(col("chunk_no")).collect()
    assert(perDoc.map(_.getLong(2)).toSeq === Seq(8L, 8L, 8L, 6L))
    // stride overlap: chunk c starts at token c*4
    assert(perDoc(1).getString(3).startsWith(
      perDoc(0).getString(3).split(" ").drop(4).mkString(" ")))
  }

  test("streaming pipeline: dis source → fingerprint64 dedup → dis sink, " +
      "duplicate-free and complete across a restart") {
    // The O18+O22 composition a streaming corpus build runs: documents
    // arrive on a dis stream (with duplicates, as crawls produce), the
    // query admits each content fingerprint once, admitted docs land on
    // a second dis stream. The query is stopped after draining half the
    // input and restarted from its checkpoint; duplicates of
    // already-admitted docs that arrive AFTER the restart can only be
    // rejected by dedup state recovered from the checkpoint, and
    // already-read source offsets must not be re-emitted.
    val root = Files.createTempDirectory("pipe-stream-")
    val client = new FileStreamClient(root)
    client.createStream("docs", 2)
    client.createStream("out", 2)
    val checkpoint = Files.createTempDirectory("pipe-ckpt-").toString

    val docs = Tables.documents(spark, dir)
      .orderBy(col("doc_id")).limit(60)
      .select(col("doc_id"), col("text")).cache()
    // synthetic event time: doc i at base + i seconds — the whole feed
    // spans 1 minute, far inside the 2 h watermark horizon, so nothing
    // is late-dropped and every duplicate must be killed by STATE
    val base = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime * 1000L
    def produce(ids: DataFrame => DataFrame, dupIds: Seq[Long]): Unit =
      ids(docs).unionAll(docs.filter(col("doc_id").isin(dupIds: _*)))
        .select(
          to_json(struct(col("doc_id"),
            (lit(base) + col("doc_id") * 1000000L).as("ts_us"), col("text"))).as("value"),
          pmod(col("doc_id"), lit(2)).cast("int").as("partition"))
        .coalesce(1)
        .write.format("dis")
        .option("client.root", root.toString).option("stream", "docs")
        .mode("append").save()

    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ts_us", LongType),
      StructField("text", StringType)))
    def runOnce(): Unit = {
      val parsed = spark.readStream.format("dis")
        .option("client.root", root.toString).option("stream", "docs")
        .option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "20") // several micro-batches per run
        .load()
        .select(from_json(col("value").cast("string"), docSchema).as("d"))
        .select(col("d.*"))
        .withColumn("ts", timestamp_micros(col("ts_us")))
      val q = StreamingQueries.dedupDocsByFingerprint(parsed)
        .select(to_json(struct(col("doc_id"), col("fp64"))).as("value"))
        .writeStream.format("dis")
        .option("client.root", root.toString).option("stream", "out")
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }

    // phase A: first 30 docs, 10 of them sent twice (intra-run dupes)
    produce(_.filter(col("doc_id") < 30), (0L until 10L))
    runOnce()

    // phase B: remaining docs, plus 15 phase-A docs RE-SENT after the
    // restart — only checkpoint-recovered state can reject these
    produce(_.filter(col("doc_id") >= 30 && col("doc_id") < 60), (5L until 20L))
    runOnce()

    val sunk = spark.read.format("dis")
      .option("client.root", root.toString).option("stream", "out")
      .load()
      .select(from_json(col("value").cast("string"),
        StructType(Seq(StructField("doc_id", LongType), StructField("fp64", LongType)))).as("d"))
      .select(col("d.fp64"))
      .collect().map(_.getLong(0))

    val expected = docs.select(xxhash64(col("text"))).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(sunk.length === sunk.distinct.length,
      s"sink holds duplicated fingerprints: ${sunk.length} rows, ${sunk.distinct.length} distinct")
    assert(sunk.toSet === expected,
      s"sink incomplete or polluted: ${sunk.length} vs ${expected.size} expected")
  }
}
