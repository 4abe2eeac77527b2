package graft.api

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VecMath.float_dot

/** Corpus structuring, classification & profiling — one slice of the [[Graft]] facade, split from a single
  * 3,300-line object purely to keep source files reviewable. All
  * operators remain accessible ONLY as `Graft.<op>` (the self-type
  * pins the mixin to the facade object); see [[Graft]] for the API
  * conventions and SparkEntry for the graded fixture bindings. */
trait GraftStructureOps { this: Graft.type =>

  // ---------- sequence packing (training-data prep) ----------

  /** Concat-and-chunk sequence packing — the standard pretraining data
    * layout: documents are laid end-to-end in `id` order and the token
    * stream is cut into fixed `budget`-token sequences. Returns, per
    * document: its exclusive running token offset (`stream_off`), the
    * sequence it starts in (`seq_id`), its offset inside that sequence
    * (`seq_off`), and how many sequences it spans (`n_seqs` — a doc
    * crossing a boundary is split across sequences, exactly like the
    * GPT-style pack-then-chunk pipeline).
    *
    * The global prefix sum is computed in the same distributed two-pass
    * shape as the engine's running-max: per-chunk sums (hash agg over
    * an id-range chunk key), an exploded constant-size prefix, and a
    * within-chunk window — no global single-partition window at any
    * data-sized step. Chunk boundaries come from an approximate
    * quantile sketch of `id` (one bounded driver action), so chunks
    * stay row-balanced under ANY id distribution — uniform-width
    * chunking would collapse a skewed id space into one chunk. The
    * boundaries only decide chunking, never values: the prefix sum is
    * exact and deterministic regardless of the sketch. `id` must be
    * non-negative and UNIQUE (ids define the pack order; duplicate ids
    * would make the within-chunk order, and thus offsets, ambiguous). */
  def packSequences(df: DataFrame, id: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    // chunk count scales with the cluster (graft.ops.Chunking) so the
    // within-chunk window isn't capped at constant parallelism; the
    // sketch's relative error shrinks with the quantile step so
    // adjacent boundaries don't collapse
    val n = graft.ops.Chunking.chunkCount(df.sparkSession)
    val boundaries = df.stat.approxQuantile(id,
      (1 until n).map(_ / n.toDouble).toArray, math.min(0.01, 0.25 / n)).distinct.sorted
    val nChunks = boundaries.length + 1L
    // O(log n) codegen'd binary search — a fold of n comparisons would
    // grow the expression tree with the cluster size
    val chunkCol = graft.functions.SortedBucket.sorted_bucket(col(id), boundaries)
    val chunked = df.select(col(id), col(tokensCol))
      .withColumn("__chunk", chunkCol)
    val chunkSum = chunked.groupBy(col("__chunk"))
      .agg(sum(col(tokensCol)).as("__csum"))
    val prefix = chunkSum
      .select(col("__chunk").as("__src"),
        explode(sequence(col("__chunk") + 1, lit(nChunks - 1))).as("__chunk"),
        col("__csum"))
      .filter(col("__chunk") > col("__src"))
      .groupBy(col("__chunk")).agg(sum(col("__csum")).as("__psum"))
    val wIn = Window.partitionBy(col("__chunk")).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    chunked.join(broadcast(prefix), Seq("__chunk"), "left")
      .withColumn("__insum", coalesce(sum(col(tokensCol)).over(wIn), lit(0L)))
      .withColumn("stream_off", coalesce(col("__psum"), lit(0L)) + col("__insum"))
      .withColumn("seq_id", expr(s"stream_off div $budget"))
      .withColumn("seq_off", pmod(col("stream_off"), lit(budget)))
      .withColumn("n_seqs",
        expr(s"(seq_off + `$tokensCol` - 1) div $budget") + 1L)
      .select(col(id), col(tokensCol), col("stream_off"), col("seq_id"),
        col("seq_off"), col("n_seqs"))
  }

  /** Stride-overlapped token-window chunking — the context-window prep
    * that turns documents into training/retrieval chunks (RAG indexing,
    * long-doc pretraining): chunk `c` covers tokens
    * `[c·stride, c·stride + width)`, consecutive chunks overlap by
    * `width − stride`, and the LAST chunk starts before the text runs
    * out, so every token lands in ≥1 chunk and no empty chunks are
    * emitted (chunk count = 1 + ⌈max(n−width, 0)/stride⌉; token-less
    * docs produce no rows). Output:
    * (id, chunk_no 0-based, chunk_tokens, chunk_text).
    *
    * Scale shape: a per-row generator — tokenization is projected to an
    * attribute ONCE per document (the HOF re-evaluation trap), the
    * chunk index explodes from a bounded `sequence`, and the slice runs
    * on the duplicated attribute; shuffle-free, output ≈ n/stride rows
    * per doc. */
  def chunkWindows(df: DataFrame, id: String, text: String,
      width: Int = 256, stride: Int = 128): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(stride >= 1 && stride <= width,
      s"stride must be in [1, width], got $stride (width $width)")
    val toks = df.select(col(id), tokens(col(text)).as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
      .filter(col("__n") > 0)
      // sequence(0, nch-1) — nch >= 1 exactly because __n > 0 rows were
      // kept (sequence runs DESCENDING on start > stop, never empty)
      .withColumn("__nch", lit(1L) +
        ((greatest(col("__n") - width, lit(0L)) + (stride - 1)) / stride).cast("long"))
    toks.select(col(id), col("__t"),
        explode(sequence(lit(0L), col("__nch") - 1)).as("__c"))
      .select(col(id), col("__c").as("chunk_no"),
        slice(col("__t"), (col("__c") * stride + 1).cast("int"), lit(width)).as("__w"))
      .select(col(id), col("chunk_no"),
        size(col("__w")).cast("long").as("chunk_tokens"),
        array_join(col("__w"), " ").as("chunk_text"))
  }

  // ---------- sessionization / events ----------

  /** Gap-based sessions per key (batch). Output: key, session_start,
    * session_end (= last event + gap), n_events. */
  def sessionize(df: DataFrame, key: String, ts: String, gap: String = "30 minutes"): DataFrame =
    df.groupBy(session_window(col(ts), gap), col(key))
      .agg(count(lit(1)).as("n_events"))
      .select(col(key),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Leakage-safe train/val/test split: every row of a GROUP lands in
    * the same split (near-duplicates clustered into one group can never
    * straddle train and eval — the split analog of decontamination).
    * Splits are (name, fraction) with fractions summing to 1; the
    * bucket is the same overflow-safe integer LCG as [[hashSample]],
    * so assignment is reproducible across engines, partitionings and
    * retries, and is a pure codegen'd projection — no shuffle. */
  def splitByGroup(df: DataFrame, groupCol: String,
                   splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val bucket = pmod(
      pmod(col(groupCol), lit(2147483648L)) * lit(1103515245L) + lit(12345L),
      lit(10000L))
    val cum = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 10000) }.tail
    val assign = splits.init.zip(cum.init).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), hi)) =>
        when(bucket < hi, name).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** Exactly-k-per-stratum deterministic sample: the k rows with the
    * smallest LCG hash in each stratum (ties on the id column), i.e. a
    * reproducible reservoir. One shuffle (the per-stratum window);
    * degenerate strata dominate the partition they hash to — for a
    * single monster stratum at 100 TB, pre-filter with [[hashSample]]
    * at a rate that leaves ~10k candidates, then apply this exactly. */
  def sampleKPerStratum(df: DataFrame, stratumCol: String, idCol: String,
                        k: Int): DataFrame = {
    val key = pmod(
      pmod(col(idCol), lit(2147483648L)) * lit(1103515245L) + lit(12345L),
      lit(2147483648L))
    val w = Window.partitionBy(col(stratumCol)).orderBy(key.asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  // ---------- quality classification ----------

  /** (label, f) hashed-token feature rows of a labeled text frame:
    * one row per token occurrence, f = polyHash(token) mod numFeatures.
    * The char loop lives in a mapPartitions kernel (the interpreted-HOF
    * formulation costs ~100×, BASELINE.md); Spark's partial hash agg
    * downstream bounds any shuffle at labels × numFeatures keys. */
  private def tokenFeatures(df: DataFrame, label: String, text: String,
                            numFeatures: Int): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("label", StringType), StructField("f", LongType))))
    df.select(col(label).cast("string"), coalesce(col(text), lit("")))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val lab = r.getString(0)
          val toks = r.getString(1).split(" ")
          toks.iterator.filter(_.nonEmpty).map { t =>
            Row(lab, java.lang.Math.floorMod(polyHash(t), numFeatures.toLong))
          }
        }
      }(enc)
  }

  /** Multinomial Naive Bayes over hashed token features — the
    * fastText-shaped quality/language classifier a curation pipeline
    * trains on a labeled slice and scores the whole crawl with.
    *
    * Model rows: (label, feature, logprob) for seen features with
    * add-one smoothing lp = ln((count+1)/(total+numFeatures)); plus
    * per label the class log-prior at feature = -1, the
    * unseen-feature default ln(1/(total+numFeatures)) at feature = -2,
    * and the hash width itself at feature = -3 (logprob = numFeatures)
    * so [[nbScore]] can reject a mismatched `numFeatures` instead of
    * silently scoring with the wrong hash space (or crashing on a
    * smaller one). polyHash keeps every step SQL-replicable
    * (production: xxhash64).
    *
    * Scale: one explode + hash agg; map-side partial aggregation
    * bounds the shuffle at labels × numFeatures keys regardless of
    * corpus size, and the model is ≤ labels × (numFeatures+3) rows by
    * construction — always broadcastable. */
  def nbTrain(df: DataFrame, label: String, text: String,
              numFeatures: Int = 1024): DataFrame = {
    val feats = tokenFeatures(df, label, text, numFeatures)
    val counts = feats.groupBy("label", "f")
      .agg(count(lit(1)).cast("double").as("c"))
    val totals = feats.groupBy("label")
      .agg(count(lit(1)).cast("double").as("n"))
    val priors = df.groupBy(col(label).cast("string").as("label"))
      .agg(count(lit(1)).cast("double").as("d"))
      .withColumn("docs", sum(col("d")).over(Window.partitionBy()))
    val seen = counts.join(totals, "label").select(
      col("label"), col("f").as("feature"),
      log((col("c") + 1d) / (col("n") + numFeatures.toDouble)).as("logprob"))
    val defaults = totals.select(
      col("label"), lit(-2L).as("feature"),
      log(lit(1d) / (col("n") + numFeatures.toDouble)).as("logprob"))
    val priorRows = priors.select(
      col("label"), lit(-1L).as("feature"),
      log(col("d") / col("docs")).as("logprob"))
    val widthRows = totals.select(
      col("label"), lit(-3L).as("feature"),
      lit(numFeatures.toDouble).as("logprob"))
    seen.unionByName(defaults).unionByName(priorRows).unionByName(widthRows)
  }

  /** Scores each document against an [[nbTrain]] model: predicted
    * label = argmax over labels of prior + Σ_token lp(label, f(token)),
    * ties broken on the lexicographically smaller label. Output:
    * (id, pred_label, score) with score rounded to 4 dp.
    *
    * The model is collected and broadcast — bounded at
    * labels × (numFeatures+3) rows by construction — so scoring is a
    * per-row kernel: a wide input (the 100 TB crawl) is touched
    * exactly once wherever it already lives, shuffle-free; only a
    * narrow input (a single test-scale split) is first spread across
    * the cluster ([[graft.ops.Spread.widen]]). NULL text scores by
    * prior alone, like the empty document it is.
    *
    * `numFeatures` must match the width the model was trained with —
    * checked against the feature = -3 sentinel rows [[nbTrain]]
    * records (a smaller value would crash mid-load, a larger one would
    * silently score with mismatched hashes). */
  def nbScore(df: DataFrame, id: String, text: String, model: DataFrame,
              numFeatures: Int = 1024): DataFrame = {
    val rows = model.collect() // bounded: labels × (numFeatures+3)
    val trainedWidths = rows.filter(_.getLong(1) == -3L).map(_.getDouble(2)).distinct
    require(trainedWidths.forall(_ == numFeatures.toDouble),
      s"nbScore numFeatures=$numFeatures but the model was trained with " +
        s"numFeatures=${trainedWidths.mkString(",")}")
    val labels = rows.map(_.getString(0)).distinct.sorted
    val li = labels.zipWithIndex.toMap
    val priors = new Array[Double](labels.length)
    val lps = Array.fill(labels.length)(new Array[Double](numFeatures))
    rows.foreach { r =>
      val i = li(r.getString(0))
      if (r.getLong(1) == -2L) java.util.Arrays.fill(lps(i), r.getDouble(2))
    }
    rows.foreach { r =>
      val i = li(r.getString(0)); val f = r.getLong(1)
      if (f == -1L) priors(i) = r.getDouble(2)
      else if (f >= 0L) lps(i)(f.toInt) = r.getDouble(2)
    }
    val bc = df.sparkSession.sparkContext.broadcast((labels, priors, lps))
    val enc = Encoders.row(StructType(Seq(
      StructField(id, LongType), StructField("pred_label", StringType),
      StructField("raw_score", DoubleType))))
    val scored = graft.ops.Spread.widen(
        df.select(col(id), coalesce(col(text), lit(""))))
      .mapPartitions { it =>
        val (labs, pri, lp) = bc.value
        it.map { r =>
          val toks = r.getString(1).split(" ")
          val fs = toks.iterator.filter(_.nonEmpty)
            .map(t => java.lang.Math.floorMod(polyHash(t), numFeatures.toLong).toInt)
            .toArray
          var best = 0; var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < labs.length) {
            var s = pri(i)
            var j = 0
            while (j < fs.length) { s += lp(i)(fs(j)); j += 1 }
            if (s > bestScore) { best = i; bestScore = s }
            i += 1
          }
          Row(r.getLong(0), labs(best), bestScore)
        }
      }(enc)
    scored.select(col(id), col("pred_label"),
      round(col("raw_score"), 4).as("score"))
  }

  /** Near-duplicate pairs BETWEEN two corpora (new crawl × admitted
    * corpus) — the batch cross-dedup that keeps a recurring crawl from
    * re-admitting documents it already holds. MinHash signatures per
    * side, LSH band equi-join across sides (shuffle ∝ docs × bands,
    * never |new|×|ref|), exact-Jaccard verify on candidates only.
    * Output: (new_id, ref_id, jaccard ≥ threshold). */
  def crossNearDup(newDf: DataFrame, refDf: DataFrame, id: String,
                   text: String, threshold: Double = 0.8): DataFrame =
    graft.ops.DedupQueries.crossDupesOn(newDf, refDf, id, text, threshold)

  // ---------- data profiling ----------

  /** Single-pass column profiling — the "what did this crawl deliver"
    * table a pipeline runs before and after every curation stage.
    * Output, one row per profiled column: (column, n_rows, n_nulls,
    * n_distinct, min_num, max_num, min_str, max_str); numeric columns
    * fill the `_num` stats (cast to double), string columns the
    * `_str` ones.
    *
    * Exact distinct counts plan through Spark's Expand (input ×
    * profiled-columns before partial agg) — fine up to a handful of
    * columns; [[profileApprox]] is the single-pass HLL variant for
    * wide scans at 100 TB. */
  def profile(df: DataFrame, numCols: Seq[String], strCols: Seq[String]): DataFrame =
    profileWith(df, numCols, strCols, c => count_distinct(col(c)))

  /** [[profile]] with approx_count_distinct (HLL, rsd 2% by default):
    * no Expand — one partial-agg pass whatever the column count.
    * Spark's 5% default lets a single estimate miss by 8%+ (observed
    * on the sf0.001 fixture); per-row update cost scales with the
    * register count ∝ 1/rsd² (measured 0.49/1.12/2.76 s at rsd
    * 5/2/1% on sf0.1 events), so 2% is the accuracy/cost knee. */
  def profileApprox(df: DataFrame, numCols: Seq[String], strCols: Seq[String],
                    rsd: Double = 0.02): DataFrame =
    profileWith(df, numCols, strCols, c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame, numCols: Seq[String], strCols: Seq[String],
                          distinctOf: String => Column): DataFrame = {
    val all = numCols ++ strCols
    // Counts and min/max run as two separate keyless passes: putting a
    // var-length min(string) buffer in the same aggregate as the
    // multi-distinct Expand forces the whole 5×-expanded stream through
    // SortAggregate (two full sorts — measured 1.27 s vs 0.4 s at
    // sf0.1). Split, the Expand pass is all fixed-width counts →
    // HashAggregate; the min/max pass is keyless (no sort) and cheap.
    val countAggs = Seq(count(lit(1)).as("__total")) ++ all.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"), distinctOf(c).as(s"__nd_$c")) }
    val rangeAggs = all.flatMap { c =>
      if (numCols.contains(c))
        Seq(min(col(c)).cast("double").as(s"__min_$c"),
            max(col(c)).cast("double").as(s"__max_$c"))
      else
        Seq(min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(countAggs.head, countAggs.tail: _*)
      .crossJoin(df.agg(rangeAggs.head, rangeAggs.tail: _*)) // 1×1 rows
    val branches = all.map { c =>
      val isNum = numCols.contains(c)
      s"'$c', `__nn_$c`, `__nd_$c`, " +
        (if (isNum) s"`__min_$c`, `__max_$c`, CAST(NULL AS STRING), CAST(NULL AS STRING)"
         else s"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), `__min_$c`, `__max_$c`")
    }
    one.select(col("__total"),
        expr(s"stack(${all.size}, ${branches.mkString(", ")}) AS " +
          "(column, __nn, n_distinct, min_num, max_num, min_str, max_str)"))
      .select(col("column"), col("__total").as("n_rows"),
        (col("__total") - col("__nn")).as("n_nulls"), col("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }

  // ---------- URL canonicalization ----------

  /** URL canonicalization — the normalize-before-dedup step of a crawl
    * frontier (two fetches of the "same" page must collapse to one
    * corpus row): lowercase scheme+host, strip userinfo, drop default
    * ports (http:80, https:443), default the path to "/", drop the
    * fragment, and rewrite the query with tracking parameters removed
    * (utm_*, fbclid, gclid) and the survivors sorted so parameter
    * order never splits a dedup key. Unparseable URLs normalize to ""
    * — data, not exceptions. Output: (id, scheme, host, norm_url).
    *
    * Scale shape: a pure per-row codegen'd projection — regexes plus
    * array sort over a handful of query params; shuffle-free, so it
    * composes with exact dedup on `norm_url` as the key. ASCII params
    * sort identically everywhere; non-ASCII param bytes would need a
    * binary collation note. */
  def urlNormalize(df: DataFrame, id: String, url: String): DataFrame = {
    val u = coalesce(col(url), lit(""))
    val scheme = lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(u,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/?#]+)", 1))
    val host = regexp_extract(hostport, "^([^:]*)", 1)
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val rawPath = regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(rawPath === "", "/").otherwise(rawPath)
    val params = filter(split(regexp_extract(u, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)"))
    val qnorm = array_join(array_sort(params), "&")
    val norm = when(scheme === "" || host === "", "")
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(qnorm =!= "", concat(lit("?"), qnorm)).otherwise(lit(""))))
    df.select(col(id), scheme.as("scheme"), host.as("host"),
      norm.as("norm_url"))
  }

  // ---------- HTML main-content extraction ----------

  /** Crawl-to-corpus HTML → text extraction (the trafilatura-class
    * first step of every web-scale pipeline): strips comments,
    * `<script>`/`<style>` blocks WITH their contents, then all
    * remaining tags; decodes the core named entities (`&amp;` last,
    * so double-encoded text decodes exactly one level); collapses
    * whitespace. Also reports the outbound link count (`<a` tags seen
    * before stripping) — the fan-out signal link-graph builders
    * ([[pageRank]]) consume. Null HTML → empty text, 0 links.
    *
    * The regex chain is restricted to the Java/RE2-identical subset
    * (the [[piiRedact]] rule: no backrefs, no lookaround) so an
    * external SQL engine replays it byte-for-byte. Everything is a
    * codegen'd per-row projection — shuffle-free, corpus scanned
    * exactly once wherever it already lives. Output:
    * (id, text, n_links). */
  def htmlExtract(df: DataFrame, id: String, html: String): DataFrame = {
    val h = coalesce(col(html), lit(""))
    val noComments = regexp_replace(h, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComments, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    df.select(col(id),
      trim(regexp_replace(decoded, "\\s+", " ")).as("text"),
      size(regexp_extract_all(h, lit("(?i)<a[\\s>]"), lit(0))).cast("long").as("n_links"))
  }

  /** Outbound-link extraction — the companion to [[htmlExtract]] that
    * feeds the link graph ([[pageRank]], [[urlDomains]], crawl
    * frontier scheduling): one row per `<a>` block carrying a
    * double-quoted `href`, with the block's 1-based position among
    * ALL `<a>` blocks of the document (`link_no` keeps gaps where
    * href-less anchors sat, so it is a stable document position).
    * Anchor text is the block's inner content with tags stripped and
    * whitespace collapsed — entities stay raw; run an
    * [[htmlExtract]]-style decode downstream if needed. Output:
    * (id, link_no, href, anchor).
    *
    * Scale shape: per-row regex extraction + one generator (posexplode
    * over the match array) — shuffle-free, output bounded by the
    * document's anchor count, and the href/anchor projections run on
    * the exploded ATTRIBUTE (computed once per anchor, never re-parsing
    * the document per link). */
  def anchorLinks(df: DataFrame, id: String, html: String): DataFrame = {
    val h = coalesce(col(html), lit(""))
    val blocks = regexp_extract_all(h, lit("(?is)<a\\b[^>]*>.*?</a>"), lit(0))
    df.select(col(id), posexplode(blocks).as(Seq("__p", "__a")))
      .select(col(id), (col("__p") + 1).cast("long").as("link_no"),
        regexp_extract(col("__a"), "(?is)href=\"([^\"]*)\"", 1).as("href"),
        trim(regexp_replace(regexp_replace(
          regexp_extract(col("__a"), "(?is)^<a\\b[^>]*>(.*)</a>$", 1),
          "<[^>]+>", " "), "\\s+", " ")).as("anchor"))
      .filter(col("href") =!= "")
  }

  // ---------- readability ----------

  /** Flesch reading-ease — the classic rule-based readability gate
    * (a quality-scoring sibling of [[lmScore]]'s statistical one):
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with
    * sentences counted as runs of [.!?] (min 1) and syllables
    * approximated as vowel-group runs [aeiouy]+ per lowercased text,
    * plus one for each vowel-less word so no word counts zero. Docs
    * with no words get a NULL score. Output: (id, n_words,
    * n_sentences, n_syllables, flesch rounded to 4 dp).
    *
    * The rounding is floor(x·10⁴ + 0.5)/10⁴ on the double, NOT
    * decimal-perceived round(): Flesch values are decimal-rational
    * (small-int ratios × 1.015/84.6) and routinely land EXACTLY on the
    * .00005 tie, where decimal-string rounding (Spark round) and
    * binary rounding (DuckDB/C round) disagree — pure double
    * arithmetic is the only formulation every engine computes
    * identically.
    *
    * Pure per-row codegen'd projection — regex counts only,
    * shuffle-free, linear in input bytes. */
  def readability(df: DataFrame, id: String, text: String): DataFrame = {
    val t = coalesce(col(text), lit(""))
    val lowered = lower(t)
    val nWords = size(tokens(t)).cast("long")
    val nSentences = greatest(
      size(regexp_extract_all(t, lit("[.!?]+"), lit(0))).cast("long"), lit(1L))
    val nSyllables = (
      size(regexp_extract_all(lowered, lit("[aeiouy]+"), lit(0))).cast("long") +
      size(filter(tokens(lowered), w => !w.rlike("[aeiouy]"))).cast("long"))
    df.select(col(id), nWords.as("n_words"), nSentences.as("n_sentences"),
      nSyllables.as("n_syllables"),
      when(nWords > 0L,
        floor((lit(206.835)
          - lit(1.015) * nWords.cast("double") / nSentences.cast("double")
          - lit(84.6) * nSyllables.cast("double") / nWords.cast("double"))
          * 10000d + 0.5d).cast("double") / 10000d)
        .as("flesch"))
  }

  // ---------- frequency mining ----------

  /** Exact heavy hitters via Misra–Gries candidates + exact recount —
    * the vocabulary/stopword/boilerplate-token miner that must never
    * full-shuffle the token stream. Returns every word whose EXACT
    * corpus count ≥ max(minCount, ⌊n/k⌋+1) (n = total tokens), as
    * (word, cnt).
    *
    * Why exact: a per-partition Misra–Gries summary of k counters
    * undercounts any word by < n_p/k, so by pigeonhole every word with
    * global count > n/k survives in at least one partition's summary —
    * the candidate set provably contains all qualifying words. The
    * effective threshold is clamped to ⌊n/k⌋+1 so the guarantee always
    * holds regardless of the caller's minCount.
    *
    * Scale shape: pass 1 is a map-only kernel emitting ≤ k candidate
    * words + one token-count sentinel per partition (the tiny result is
    * cached, never the corpus); pass 2 recounts ONLY candidate tokens —
    * a broadcast semi-join drops everything else map-side, and partial
    * aggregation bounds the shuffle at candidates × partitions. The
    * token stream itself is never shuffled. */
  def heavyHitters(df: DataFrame, text: String, k: Int,
                   minCount: Long): DataFrame = {
    require(k > 0, "k must be positive")
    val enc = Encoders.row(StructType(Seq(
      StructField("w", StringType), StructField("np", LongType))))
    val summaries = df.select(coalesce(col(text), lit("")).as("t"))
      .mapPartitions { rows =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        var np = 0L
        rows.foreach { r =>
          val toks = r.getString(0).split(" ")
          var i = 0
          while (i < toks.length) {
            val w = toks(i)
            if (w.nonEmpty) {
              np += 1
              counters.get(w) match {
                case Some(c) => counters.update(w, c + 1)
                case None =>
                  if (counters.size < k) counters.update(w, 1L)
                  else { // decrement-all step of Misra–Gries
                    val dead = scala.collection.mutable.ArrayBuffer.empty[String]
                    counters.foreach { case (cw, cc) =>
                      if (cc == 1L) dead += cw else counters.update(cw, cc - 1)
                    }
                    dead.foreach(counters.remove)
                  }
              }
            }
            i += 1
          }
        }
        counters.keysIterator.map(w => Row(w, 0L)) ++ Iterator(Row(null, np))
      }(enc)
      .persist() // bounded: ≤ (k+1) rows per partition
    val n = summaries.agg(sum(col("np"))).head.getLong(0)
    val threshold = math.max(minCount, n / k + 1)
    val candidates = summaries.filter(col("w").isNotNull)
      .select(col("w")).distinct()
    df.select(explode(tokens(coalesce(col(text), lit("")))).as("w"))
      .join(broadcast(candidates), "w")
      .groupBy(col("w").as("word"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("word"), col("cnt"))
  }

  /** Count-Min-sketch heavy hitters (Cormode & Muthukrishnan 2005) —
    * the sketch flavor next to [[heavyHitters]]'s exact Misra–Gries
    * path: token counts are approximated by a depth×width counter
    * grid (est = min over depth rows, one-sided ≥-exact error), and
    * every candidate whose ESTIMATE clears the relative threshold is
    * returned as (word, est). The whole pipeline is exact integer
    * arithmetic over the engine-replicable 31-bit poly hash + LCG row
    * hashes, so the sketch — error and all — replays in ANSI SQL.
    *
    * Scale shape: the sketch build is ONE aggregation whose key space
    * is depth·width (bounded; map-side combine collapses the token
    * stream before the shuffle). Candidate estimation broadcast-joins
    * the 4096-cell sketch to the distinct-token table. The threshold
    * is relative (est·denom ≥ N) so the operator is corpus-size-free. */
  def cmsHeavyHitters(df: DataFrame, text: String,
                      width: Int = 1024, depth: Int = 4,
                      denom: Long = 100L): DataFrame = {
    require(depth >= 1 && depth <= CmsA.length, s"depth must be 1..${CmsA.length}")
    require(width == 1024, "width is fixed at 1024: the bucket extraction " +
      "takes the TOP 10 bits of the 31-bit row hash (see CmsA)")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def polyFold(c: Column): Column = ColumnBridge.column(
      graft.functions.PolyFold(ColumnBridge.expression(c)))
    // word counts FIRST: the token stream collapses in one map-side-
    // combinable keyed agg, and everything after (hashing, sketch,
    // estimate) is vocabulary-sized, never corpus-sized
    val wc = df.select(explode(tokens(coalesce(col(text), lit("")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("__h", polyFold(col("w")))
    // row-i bucket = TOP 10 bits of (h·A_i + B_i) mod 2³¹: the top
    // bits genuinely mix per multiplier, where low-bit extraction
    // would make every row the same function of h mod width (the
    // classic LCG low-bit trap — all depth rows collapse to one;
    // caught in round 15). h < 2³¹ and A < 2³¹ keep h·A < 2⁶²,
    // exact in int64.
    def buckets(h: Column): Column = array((0 until depth).map(i =>
      struct(lit(i).as("i"),
        expr(s"pmod(__h * ${CmsA(i)}L + ${CmsB(i)}L, 2147483648L) div 2097152L")
          .as("b"))): _*)
    val ib = wc.select(col("w"), col("cnt"), explode(buckets(col("__h"))).as("ib"))
    val sketch = ib.groupBy(col("ib.i").as("i"), col("ib.b").as("b"))
      .agg(sum(col("cnt")).as("c"))
    val total = wc.agg(sum(col("cnt")).as("n"))
    ib.join(broadcast(sketch),
        col("ib.i") === col("i") && col("ib.b") === col("b"))
      .groupBy(col("w").as("word"))
      .agg(min(col("c")).as("est"))
      .crossJoin(broadcast(total))
      .filter(col("est") * lit(denom) >= col("n"))
      .select(col("word"), col("est"))
  }

  /** Distinct odd multipliers/offsets of the CMS row-hash family
    * bucket_i(x) = ((x·A_i + B_i) mod 2³¹) div 2²¹ — classic public
    * LCG constants, all < 2³¹ so products stay exact in int64. */
  private val CmsA = Array(1103515245L, 214013L, 69069L, 1664525L)
  private val CmsB = Array(12345L, 2531011L, 1L, 1013904223L)

  /** Winnowing document fingerprints (the MOSS scheme): hash every
    * k-char gram ([[polyHash]] arithmetic, O(len) rolling update),
    * slide a window of w gram-hashes, keep each window's minimum, and
    * emit the distinct selected hashes as (id, fp) rows. Guarantee:
    * any shared substring of length ≥ k+w−1 between two documents
    * yields at least one shared fingerprint, while ~1/w of grams are
    * kept — the standard plagiarism/near-dup index at a fraction of
    * the gram volume. Docs shorter than k+w−1 chars emit nothing (no
    * full window).
    *
    * Scale shape: a pure per-row kernel (rolling hash + monotonic
    * deque, O(len) per doc, zero shuffle); the (id, fp) output is the
    * posting-list input to an equi-join based match step, exactly like
    * the MinHash band index. */
  def winnow(df: DataFrame, id: String, text: String,
             k: Int = 8, w: Int = 4): DataFrame = {
    require(k > 0 && w > 0, "k and w must be positive")
    val projected = df.select(col(id), coalesce(col(text), lit("")).as("t"))
    val enc = Encoders.row(StructType(Seq(
      projected.schema.head, StructField("fp", LongType))))
    projected.mapPartitions { rows =>
      rows.flatMap { r =>
        val idVal = if (r.isNullAt(0)) null else r.get(0)
        val s = r.getString(1)
        val nGrams = s.length - k + 1
        if (nGrams < w) Iterator.empty
        else {
          // rolling position-weighted gram hashes: acc_i = Σ_j (j+1)·c_{i+j}
          val hs = new Array[Long](nGrams)
          var acc = 0L // position-weighted sum of current gram
          var csum = 0L // plain char sum of current gram
          var j = 0
          while (j < k) {
            acc += (j + 1).toLong * s.charAt(j).toLong
            csum += s.charAt(j).toLong
            j += 1
          }
          hs(0) = java.lang.Math.floorMod(acc * 48271L, 2147483647L)
          var i = 1
          while (i < nGrams) {
            val outc = s.charAt(i - 1).toLong
            val inc = s.charAt(i + k - 1).toLong
            acc = acc - csum + k.toLong * inc
            csum = csum - outc + inc
            hs(i) = java.lang.Math.floorMod(acc * 48271L, 2147483647L)
            i += 1
          }
          // sliding-window minima via monotonic deque; distinct per doc
          val seen = scala.collection.mutable.HashSet.empty[Long]
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          val deque = new java.util.ArrayDeque[Int]()
          var p = 0
          while (p < nGrams) {
            while (!deque.isEmpty && hs(deque.peekLast()) >= hs(p))
              deque.pollLast()
            deque.addLast(p)
            if (deque.peekFirst() <= p - w) deque.pollFirst()
            if (p >= w - 1) {
              val m = hs(deque.peekFirst())
              if (seen.add(m)) out += Row(idVal, m)
            }
            p += 1
          }
          out.iterator
        }
      }
    }(enc)
  }

}
