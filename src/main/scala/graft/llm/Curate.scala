package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Numeric.dround
import graft.functions.TextHashes.rollHash
import graft.io.Sources.table

/** Dataset-curation operators: the assembly steps a pretraining data
  * pipeline runs AFTER per-doc scoring (TextOps) and dedup (Dedup) —
  * deterministic splits, domain-mixture resampling, sequence packing,
  * and the end-to-end curated-corpus composition.
  *
  * All randomness is CONTENT-HASH derived (FNV-1a/64 over the text via
  * the native codegen'd `roll_hash`), never `rand()`: assignments are
  * reproducible across runs, stable under repartitioning/re-ingestion
  * (a doc keeps its split when the corpus around it changes), and —
  * decisive here — independently replayable by the DuckDB oracle, which
  * re-folds the same FNV in HUGEINT arithmetic (the pattern proven on
  * `ts_fingerprint_roll`). `rand(seed)` would be none of those: Spark
  * seeds per-partition, so the output depends on the physical split.
  *
  * Scale shapes (100 TB posture):
  *  - split/mixture are pure scan→project/filter — ZERO shuffle, and the
  *    per-lang mixture report is a map-side-combined 5-group agg;
  *  - packing windows per SHARD (hash-assigned), not globally: a global
  *    token-order prefix sum would be a single-partition sort at scale;
  *    per-shard windows are embarrassingly parallel and the shard count
  *    is the scale knob (8 here, thousands on a cluster);
  *  - the curated composition is one scan + one hash-partition window
  *    (dedup survivor) + a 5-group agg — no join anywhere.
  */
object Curate {

  type Q = (SparkSession, String) => DataFrame

  // -------------------------------------------------------------------
  // Shared FNV replay for the oracle twins: signed 64-bit fp per doc,
  // identical to the engine's roll_hash (ts_fingerprint_roll pattern).
  // -------------------------------------------------------------------
  // single-sourced FNV replay (TextHashes.fnvFoldSql — shared with the
  // TextOps and Multimodal twins)
  private val fnvCte =
    s"""WITH h AS (SELECT *, ${graft.functions.TextHashes.fnvFoldSql("text")} AS hu FROM documents),
       | f AS (SELECT *, ${graft.functions.TextHashes.fnvSignedSql("hu")} AS fp
       |   FROM h)""".stripMargin

  /** Non-negative hash bucket in [0, m): engine side of the oracle's
    * `((fp % m) + m) % m`. */
  private def bucket(m: Long) = pmod(rollHash(col("text")), lit(m))

  // -------------------------------------------------------------------
  // ds_split: deterministic train/val/test assignment (80/10/10) by
  // content-hash bucket. Filtering a split is a scan-local predicate —
  // at 100 TB each epoch reads its split with zero shuffle, and the
  // assignment survives re-sharding of the input files.
  // -------------------------------------------------------------------
  /** The assignment projection alone — stateless, so it runs unchanged
    * on a stream (no watermark, no state store; see
    * `StreamingCurateSpec` for batch/stream parity). */
  def splitAssign(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), bucket(1000L).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 800, "train")
          .when(col("bucket") < 900, "val")
          .otherwise("test"))

  private val dsSplit: Q = (s, d) =>
    splitAssign(table(s, d, "documents")).orderBy("doc_id")

  // -------------------------------------------------------------------
  // ds_mixture: weighted per-language downsampling toward a target
  // domain mixture — keep P(doc) = weight(lang), decided by a second
  // content-hash bucket so the SAME docs survive on every run/cluster.
  // The report aggregates kept/total per lang; the keep decision itself
  // is a scan-local predicate a writer would apply streaming.
  // -------------------------------------------------------------------
  private[llm] val mixtureWeights: Seq[(String, Int)] = Seq(
    // per-10k keep thresholds: en full, zh 0.8, es 0.5, fr 0.25, de 0.1
    "en" -> 10000, "zh" -> 8000, "es" -> 5000, "fr" -> 2500, "de" -> 1000)

  private val dsMixture: Q = (s, d) => {
    val thr = mixtureWeights.tail.foldLeft(
      when(col("lang") === mixtureWeights.head._1, mixtureWeights.head._2)) {
      case (acc, (l, t)) => acc.when(col("lang") === l, t)
    }.otherwise(0)
    table(s, d, "documents")
      .select(col("lang"), (bucket(10000L) < thr).as("keep"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        sum(col("keep").cast("long")).as("n_kept"))
      .select(col("lang"), col("n_total"), col("n_kept"),
        dround(col("n_kept").cast("double") / col("n_total"), 4).as("kept_ratio"))
      .orderBy("lang")
  }

  // -------------------------------------------------------------------
  // ds_temperature: temperature-based language rebalancing (Conneau &
  // Lample's multilingual sampling, q_l ∝ p_l^α) at α = 1/2 — the knob
  // every multilingual pretraining mix turns so high-resource
  // languages stop drowning low-resource ones. Downsample-only
  // deterministic form: the rarest language keeps everything and
  // language l keeps rate_l = √(n_min / n_l), so the post-sample count
  // √(n_l·n_min) is the geometric-mean flattening of the distribution.
  // α = 1/2 deliberately: the rate is a sqrt of an integer ratio —
  // IEEE-exact on BOTH engines — where a general p^α would ride
  // pow/exp, whose cross-engine rounding is NOT guaranteed (the
  // dq_drift ln is the only transcendental this library trusts).
  // Keep/drop is the content-hash bucket against the 1e-6-quantized
  // rate (the ds_mixture discipline: reproducible, no RNG). Scale:
  // one |langs|-row aggregate broadcast back over one scan.
  // -------------------------------------------------------------------
  private val dsTemperature: Q = (s, d) => {
    val docs = table(s, d, "documents")
    val byLang = docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
    val nMin = byLang.agg(min(col("n_total")).as("n_min"))
    val rates = byLang.crossJoin(broadcast(nMin))
      .select(col("lang"), col("n_total"),
        dround(sqrt(col("n_min").cast("double") / col("n_total")) * 1e6, 0)
          .cast("long").as("rate_micro"))
    docs.select(col("lang"), bucket(1000000L).as("b"))
      .join(broadcast(rates), Seq("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"), first(col("rate_micro")).as("rate_micro"),
        sum(when(col("b") < col("rate_micro"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("lang"), col("n_total"), col("rate_micro"), col("n_kept"),
        dround(col("n_kept").cast("double") / col("n_total"), 4).as("kept_ratio"))
      .orderBy("lang")
  }

  // -------------------------------------------------------------------
  // ds_pack: GPT-style sequence packing — concatenate docs in a
  // deterministic order and cut fixed token-budget sequences; a doc
  // belongs to the sequence its cumulative offset starts in. Sharded:
  // the prefix sum runs per content-hash shard (parallel), never over a
  // global order (single-partition sort at scale). Report = per-sequence
  // doc count and token sum.
  // -------------------------------------------------------------------
  private val packBudget = 2048L
  private val packShards = 8L

  private val dsPack: Q = (s, d) => {
    val base = table(s, d, "documents").select(
      col("doc_id"),
      bucket(packShards).as("shard"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"cum_before div $packBudget"))
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy("shard", "seq_id")
  }

  // -------------------------------------------------------------------
  // ds_curated: the end-to-end corpus assembly — quality window
  // (TextOps heuristics), language-ID agreement (marker-vote prediction
  // must match the labeled lang: drops unidentifiable docs, e.g. the zh
  // slice this marker set cannot vote for), and exact-dedup
  // survivorship (min doc_id per content hash, as dd_exact) — composed
  // in ONE pipeline: scan → project → window → filter → 5-group agg.
  // -------------------------------------------------------------------
  /** The shared curation core: quality window + langid agreement +
    * exact-dedup survivorship, as a filtered per-doc relation. */
  private def curatedDocs(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
    val nTokens = size(split(col("text"), " ")).cast("long")
    val nStop = graft.functions.ArrayFns.tokensInSetCount(col("text"), TextOps.stopwords)
    val ratio = nStop.cast("double") / nTokens
    val scored = docs.select(
      col("doc_id"), col("lang"), col("n_chars"), col("text"),
      TextOps.qualityOk(col("n_chars"), ratio).as("q_ok"))
    val pred = TextOps.markers.foldLeft(scored) { case (df, (n, set)) =>
      df.withColumn(n, graft.functions.ArrayFns.tokensInSetCount(col("text"), set))
    }.withColumn("lang_pred",
      TextOps.langArgmax(col("s_en"), col("s_es"), col("s_fr"), col("s_de")))
    val survivor = col("doc_id") ===
      min(col("doc_id")).over(Window.partitionBy(md5(col("text").cast("binary"))))
    pred
      .withColumn("is_survivor", survivor)
      .where(col("q_ok") && col("lang_pred") === col("lang") && col("is_survivor"))
  }

  private val dsCurated: Q = (s, d) =>
    curatedDocs(s, d)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")

  // -------------------------------------------------------------------
  // ds_curated2: the curation composition extended with the LM
  // perplexity cut — the CCNet recipe end to end (heuristic quality →
  // langid agreement → dedup survivor → model-based fluency filter).
  // The perplexity relation is ts_perplexity's own pipeline (broadcast
  // LM, integer costs), joined per doc; the cut applies to the ROUNDED
  // avg_nats, so the filter boundary is engine-exact. Per-lang nat
  // totals ride as the integer sum of 1e-4-quantized values — no float
  // accumulation across partitions anywhere.
  // -------------------------------------------------------------------
  private val perplexityCut = 9.0
  private val dsCurated2: Q = (s, d) => {
    val ppl = TextOps.queries("ts_perplexity")(s, d)
      .select(col("doc_id"), col("avg_nats"))
    curatedDocs(s, d)
      .join(ppl, Seq("doc_id"))
      .where(col("avg_nats") <= perplexityCut)
      .select(col("lang"), col("n_chars"),
        dround(col("avg_nats") * 10000, 0).cast("long").as("nats_q"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        sum(col("nats_q")).as("sum_nats_q"))
      .select(col("lang"), col("n_docs"), col("sum_chars"),
        dround(col("sum_nats_q").cast("double") / 10000 / col("n_docs"), 4)
          .as("avg_nats"))
      .orderBy("lang")
  }

  // -------------------------------------------------------------------
  // ds_decontam: eval-set decontamination — flag train-split docs that
  // share any 3-token shingle with the held-out test split (the overlap
  // that inflates benchmark scores when it leaks into training). Reuses
  // ds_split's hash assignment (the eval set IS the test split) and
  // Dedup.shingleRows (native scan-local shingles3, zero shuffle). Shingles
  // join hashed (xxhash64): the shuffle carries 8-byte keys, not token
  // triples; a cross-string collision (~n²/2⁶⁴, ≈1e-11 at gate scale)
  // is the same accepted bound as Dedup's hashed-token merge walk. At
  // production scale the eval side is a benchmark suite — tiny — so the
  // distinct eval-shingle relation broadcasts and the train side never
  // shuffles at all (AQE picks this up from the size estimate).
  // -------------------------------------------------------------------
  private val dsDecontam: Q = (s, d) => {
    val withBucket = table(s, d, "documents")
      .select(col("doc_id"), col("text"), bucket(1000L).as("bucket"))
    val train = withBucket.filter(col("bucket") < 800).select("doc_id", "text")
    val heldOut = withBucket.filter(col("bucket") >= 900).select("doc_id", "text")
    val evalSh = Dedup.shingleRows(heldOut)
      .select(xxhash64(col("sh")).as("shh")).distinct()
    val trainSh = Dedup.shingleRows(train)
      .select(col("doc_id"), xxhash64(col("sh")).as("shh")).distinct()
    trainSh.join(evalSh, Seq("shh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_shingles"))
      .orderBy("doc_id")
  }

  // -------------------------------------------------------------------
  // ds_decontam_bloom: the same decontamination, restructured for the
  // 100 TB regime where even the hashed-shingle semi-join is too much
  // shuffle: the eval side's distinct shingle hashes are folded into a
  // BLOOM FILTER (distributed treeAggregate build; ~1.2 MB per million
  // eval shingles at 1% fpp) that ships with the plan, and the train
  // side probes it SCAN-LOCALLY through the native codegen'd
  // `bloom_might_contain` — only true hits plus the fpp-bounded false
  // positives ever reach the exact confirm join, so the train-side
  // shuffle shrinks from "every distinct train shingle" to "≈ the
  // contamination". The confirm join then removes the false positives,
  // which is what makes this gateable: the result is BIT-IDENTICAL to
  // ds_decontam, so the exact twin's oracle applies verbatim — the
  // bloom is pure pruning, invisible in the answer, exactly like
  // Spark's own InjectRuntimeFilter rewrite (j9_bloom_prune's
  // optimizer-driven cousin, here applied explicitly so the filter
  // crosses the build/probe boundary of OUR pipeline shape).
  // -------------------------------------------------------------------
  private val dsDecontamBloom: Q = (s, d) => {
    val withBucket = table(s, d, "documents")
      .select(col("doc_id"), col("text"), bucket(1000L).as("bucket"))
    val train = withBucket.filter(col("bucket") < 800).select("doc_id", "text")
    val heldOut = withBucket.filter(col("bucket") >= 900).select("doc_id", "text")
    val evalSh = Dedup.shingleRows(heldOut)
      .select(xxhash64(col("sh")).as("shh")).distinct().persist()
    // the filter build runs over ONE partition: a treeAggregate over
    // the default width ships one partial bloom PER PARTITION (32 ×
    // filter bytes — measured to exceed the train-side saving at small
    // scale), while the distinct eval-hash set is benchmark-suite
    // sized and fits a single task by design
    val bloom = graft.functions.BloomFns.buildLong(
      evalSh.coalesce(1), "shh", evalSh.count(), 0.01)
    // the bloom probe sits BELOW the distinct: the prune must run in
    // the scan stage, before the (doc_id, shh) dedup shuffles anything
    val trainSh = Dedup.shingleRows(train)
      .select(col("doc_id"), xxhash64(col("sh")).as("shh"))
      .filter(graft.functions.BloomFns.mightContainLong(col("shh"), bloom))
      .distinct()
    val out = trainSh.join(evalSh, Seq("shh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_shingles"))
      .orderBy("doc_id")
    out
  }

  // -------------------------------------------------------------------
  // ds_sample: deterministic per-stratum sampling — the k docs with the
  // SMALLEST content hash per language. Statistically a uniform sample
  // (the hash is uniform and content-derived), but reproducible across
  // runs, clusters, and input layouts, unlike rand()/TABLESAMPLE. The
  // per-stratum top-k is a window over the hash order — at scale this
  // is a partial top-k per partition then a k-sized merge per stratum
  // (Spark's WindowGroupLimit pushes the rank filter below the sort),
  // never a full sort of the corpus.
  // -------------------------------------------------------------------
  private val samplePerLang = 20
  private val dsSample: Q = (s, d) => {
    val ranked = table(s, d, "documents")
      .select(col("doc_id"), col("lang"), rollHash(col("text")).as("fp"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("fp"), col("doc_id"))))
    ranked.filter(col("rk") <= samplePerLang)
      .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"))
      .orderBy("lang", "rk")
  }

  // -------------------------------------------------------------------
  // ds_weighted: weighted-priority sampling (Efraimidis–Spirakis A-ES):
  // keep the k docs with the largest u^(1/w), here w = n_chars, so
  // inclusion probability is proportional to document length — the
  // sampler a token-budgeted pretraining mix uses when long documents
  // should be seen proportionally to the tokens they contribute. The
  // "random" u is content-hash derived (ds_split discipline): stable
  // under repartitioning and replayable by the oracle. Ranking happens
  // on ln(u)/w QUANTIZED to integer nano-units with doc_id tiebreak, so
  // the cross-engine order is integer-exact, never a float knife-edge.
  // The global top-k runs in TWO phases: a salted per-group top-k
  // first — Spark's InferWindowGroupLimit pushes THAT k-filter below
  // the sort (measured: the rule declines an EMPTY partition spec, so
  // a naive global rank window would drag the whole corpus through one
  // task) — then the true global rank over the ≤ salts·k survivors.
  // The global top-k is a subset of the union of per-salt top-ks, so
  // the result is identical and the full corpus never converges on a
  // single task: the scalable global-top-k shape.
  // -------------------------------------------------------------------
  private val weightedK = 50
  private val weightedSalts = 64L
  private val dsWeighted: Q = (s, d) => {
    val u = (bucket(1000000L) + lit(1)).cast("double") / lit(1000001d)
    val key = dround(log(u) / col("n_chars").cast("double") * lit(1e9), 0).cast("long")
    val scored = table(s, d, "documents")
      .select(col("doc_id"), col("n_chars"), key.as("priority_q"))
    // phase 1: rank filtered over the BARE rank attribute (a cast in
    // between would defeat the optimizer's pattern match)
    val perSalt = scored
      .withColumn("rk1", row_number().over(
        Window.partitionBy(pmod(col("doc_id"), lit(weightedSalts)))
          .orderBy(col("priority_q").desc, col("doc_id"))))
      .filter(col("rk1") <= weightedK)
      .drop("rk1")
    perSalt
      .withColumn("rk", row_number().over(
        Window.orderBy(col("priority_q").desc, col("doc_id"))))
      .filter(col("rk") <= weightedK)
      .select(col("doc_id"), col("n_chars"), col("priority_q"),
        col("rk").cast("long").as("rk"))
      .orderBy("rk")
  }

  // -------------------------------------------------------------------
  // ds_dsir: Data Selection via Importance Resampling (Xie et al. 2023,
  // arXiv:2302.03169) — score every raw document by the log-likelihood
  // ratio of a TARGET domain's hashed-unigram LM over the RAW corpus
  // LM, keep the positively-weighted docs. Feature space = 64 FNV
  // buckets (the paper's hashed n-grams; unigrams here), add-1
  // smoothed. Scale shape: ONE token-level shuffle builds the 64-bucket
  // count pair (map-side combined into ≤64 rows/partition); scoring is
  // then SCAN-LOCAL — the 64-entry log-ratio LUT broadcasts as a
  // one-row map column and each doc folds its own tokens against it
  // (`aggregate` HOF, no explode, no join on the corpus side). At
  // 100 TB the LM-estimation pass can itself run on a hash-sample; the
  // scoring pass is embarrassingly parallel either way.
  // Float discipline: the ONLY cross-engine float op chain is
  // ln(ratio-of-shared-integers) per bucket, immediately quantized to
  // integer 1e-4 nats; per-doc scores are INTEGER sums of those — no
  // float accumulation, so group order cannot perturb the hash (the
  // ts_perplexity sum_cost_q pattern).
  // -------------------------------------------------------------------
  private val dsirB = 64L
  private val dsirScale = 10000L
  private val dsirTarget = "src0"

  private val dsDsir: Q = (s, d) => {
    val toks = split(col("text"), " ")
    def bucketOf(w: Column): Column = pmod(rollHash(w), lit(dsirB))
    val docs = table(s, d, "documents")
    val counts = docs
      .select(col("source"), explode(toks).as("w"))
      .groupBy(bucketOf(col("w")).as("b"))
      .agg(
        sum(when(col("source") === dsirTarget, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("source") =!= dsirTarget, 1L).otherwise(0L)).as("n_r"))
    val tots = counts.agg(
      sum("n_t").as("tot_t"), sum("n_r").as("tot_r"))
    val lut = counts.crossJoin(broadcast(tots))
      .select(col("b"),
        round(log(((col("n_t") + 1).cast("double") * (col("tot_r") + dsirB)) /
            ((col("n_r") + 1).cast("double") * (col("tot_t") + dsirB)))
          * dsirScale).cast("long").as("lr_q"))
    val lutRow = lut.agg(
      map_from_entries(collect_list(struct(col("b"), col("lr_q")))).as("m"))
    docs.crossJoin(broadcast(lutRow))
      .select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tokens"),
        aggregate(toks, lit(0L), (acc, w) =>
          acc + coalesce(element_at(col("m"), bucketOf(w)), lit(0L)))
          .as("score_q"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        dround(col("score_q").cast("double") / dsirScale, 4).as("logw"),
        when(col("score_q") > 0, "keep").otherwise("drop").as("dsir_flag"))
      .orderBy("doc_id")
  }

  // -------------------------------------------------------------------
  // ds_shuffle: reproducible per-epoch training order — every epoch
  // a DIFFERENT but fully deterministic global permutation, because
  // training-data order must reshuffle between epochs yet replay
  // bit-identically on reruns and across clusters. The epoch-salted
  // content hash is the sort key (never `rand()` — the module-header
  // rationale); docs are sharded by the same hash and positioned by a
  // per-(epoch, shard) window, the ds_pack scale shape: no global
  // sort, shard count is the parallelism knob, and a training reader
  // streams shard files in (shard, pos) order.
  // -------------------------------------------------------------------
  private val shuffleShards = 8L
  private val dsShuffle: Q = (s, d) => {
    val docs = table(s, d, "documents").select(col("doc_id"), col("text"))
    Seq(0, 1).map { e =>
      val h = rollHash(concat(lit(s"ep$e:"), col("text")))
      docs.select(lit(e).as("epoch"), col("doc_id"),
        pmod(h, lit(shuffleShards)).as("shard"), h.as("hk"))
    }.reduce(_ unionByName _)
      .withColumn("pos", row_number().over(
        Window.partitionBy("epoch", "shard")
          .orderBy(col("hk"), col("doc_id"))).cast("long"))
      .select(col("epoch"), col("doc_id"), col("shard"), col("pos"))
      .orderBy("epoch", "shard", "pos")
  }

  /** ds_tokens: per-(source, lang) token accounting — the budget sheet
    * every mixture decision reads first (how many tokens does each
    * component actually hold, what share of the corpus is that, and
    * how fast does the cumulative share saturate when components are
    * taken largest-first). One corpus scan + one (source, lang) agg;
    * the share/cumulative windows run over the AGGREGATED relation
    * (|sources|×|langs| rows — constant width), never the corpus, so
    * the single-partition window is a non-issue at any scale. */
  private val dsTokens: Q = (s, d) => {
    val agg = table(s, d, "documents")
      .select(col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val tot = Window.partitionBy(lit(1))
    val cum = Window.orderBy(desc("n_tokens"), asc("source"), asc("lang"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg.select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
      dround(col("n_tokens").cast("double") / sum(col("n_tokens")).over(tot), 4)
        .as("token_share"),
      dround(sum(col("n_tokens")).over(cum).cast("double")
        / sum(col("n_tokens")).over(tot), 4).as("cum_share"))
      .orderBy(desc("n_tokens"), asc("source"), asc("lang"))
  }

  /** ds_curriculum: curriculum-learning order — docs phased easy →
    * medium → hard by perplexity terciles (fluency as the canonical
    * text-difficulty proxy), with a reproducible shuffled order inside
    * each (phase, shard) so loaders stream phase-major without any
    * global sort. The tercile cuts are EXACT interpolated percentiles
    * rounded to 1e-4 on BOTH sides (the a15_equidepth last-ulp rule)
    * and broadcast back; phase assignment is a scan-local
    * count-of-cuts-below; order inside a shard is the content-hash +
    * doc_id window of the ds_shuffle discipline — windows stay
    * per-(phase, shard), never global. */
  private val dsCurriculum: Q = (s, d) => {
    val ppl = TextOps.queries("ts_perplexity")(s, d).select(col("doc_id"), col("avg_nats"))
    val docs = table(s, d, "documents")
      .select(col("doc_id"), rollHash(col("text")).as("fp"))
    val base = ppl.join(docs, "doc_id")
    val cuts = base.agg(expr(
      "transform(percentile(avg_nats, array(CAST(1 AS DOUBLE) / 3, CAST(2 AS DOUBLE) / 3)), c -> floor(c * 10000 + 0.5) / 10000)")
      .as("cuts"))
    val ph = base.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("fp"),
        size(filter(col("cuts"), c => col("avg_nats") > c)).as("pr"),
        pmod(col("fp"), lit(8L)).as("shard"))
    val w = Window.partitionBy("pr", "shard").orderBy(col("fp"), col("doc_id"))
    ph.select(col("doc_id"),
      when(col("pr") === 0, "easy").when(col("pr") === 1, "medium")
        .otherwise("hard").as("phase"),
      col("shard").cast("long").as("shard"),
      row_number().over(w).cast("long").as("pos"))
      .orderBy("doc_id")
  }

  // -------------------------------------------------------------------
  // ds_shards: training-export shard manifest — the handoff record
  // between curation and the training reader (the WebDataset /
  // streaming-loader pattern): docs assign to shards by content hash
  // (stable under re-ingestion, zero shuffle for the assignment), and
  // the manifest row per shard carries the integrity facts a reader
  // verifies before an epoch: doc count, token and char totals, and a
  // MEMBERSHIP DIGEST (md5 over the numerically-sorted doc-id list) —
  // one missing or duplicated doc flips the digest, which is the
  // property plain counts can't give. One count-width shuffle on the
  // shard id; at 100 TB the shard count is the write-parallelism knob
  // and the digest rides the same agg.
  // -------------------------------------------------------------------
  private val exportShards = 16L

  private val dsShards: Q = (s, d) =>
    table(s, d, "documents")
      .select(col("doc_id"), bucket(exportShards).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"), col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        md5(concat_ws(",",
          expr("transform(array_sort(collect_list(doc_id)), x -> cast(x as string))"))
          .cast("binary")).as("members_md5"))
      .orderBy("shard")

  val queries: Map[String, Q] = Map(
    "ds_shards" -> dsShards,
    "ds_curriculum" -> dsCurriculum,
    "ds_tokens" -> dsTokens,
    "ds_shuffle" -> dsShuffle,
    "ds_dsir" -> dsDsir,
    "ds_split" -> dsSplit,
    "ds_mixture" -> dsMixture,
    "ds_temperature" -> dsTemperature,
    "ds_pack" -> dsPack,
    "ds_curated" -> dsCurated,
    "ds_curated2" -> dsCurated2,
    "ds_decontam" -> dsDecontam,
    "ds_decontam_bloom" -> dsDecontamBloom,
    "ds_sample" -> dsSample,
    "ds_weighted" -> dsWeighted)

  private def sqlMixtureThr: String =
    mixtureWeights.map { case (l, t) => s"WHEN '$l' THEN $t" }
      .mkString("CASE lang ", " ", " ELSE 0 END")

  /** The exact decontamination twin — shared by ds_decontam and its
    * bloom-accelerated variant, whose results are identical by design. */
  private def decontamSql: String = {
    val sh3 = "list_transform(generate_series(1, len(tk)-2), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])"
    s"""$fnvCte,
       | sp AS (SELECT doc_id, string_split(text, ' ') AS tk,
       |          ((fp % 1000) + 1000) % 1000 AS bucket FROM f),
       | trs AS (SELECT DISTINCT doc_id, sh
       |         FROM (SELECT doc_id, tk FROM sp WHERE bucket < 800), UNNEST($sh3) AS u(sh)),
       | evs AS (SELECT DISTINCT sh
       |         FROM (SELECT tk FROM sp WHERE bucket >= 900), UNNEST($sh3) AS u(sh))
       |SELECT doc_id, count(*) AS n_hit_shingles
       |FROM trs JOIN evs USING (sh)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // shard manifest re-derived: same FNV bucket, same numeric sort,
    // same comma-joined md5 digest
    "ds_shards" ->
      s"""$fnvCte,
         | a AS (SELECT doc_id, ((fp % $exportShards) + $exportShards) % $exportShards AS shard,
         |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, n_chars
         |  FROM f)
         |SELECT shard, count(*) AS n_docs,
         | CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         | CAST(sum(n_chars) AS BIGINT) AS n_chars,
         | md5(array_to_string(
         |   list_transform(list_sort(list(doc_id)), x -> x::VARCHAR), ',')) AS members_md5
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin,
    // perplexity re-derived via the shared CTE chain, FNV fold replayed,
    // cuts via quantile_cont rounded identically, window re-ranked
    "ds_curriculum" ->
      s"""WITH ${graft.llm.TextOps.perplexityCtes},
         | h2 AS (SELECT doc_id, ${graft.functions.TextHashes.fnvFoldSql("text")} AS hu FROM documents),
         | f2 AS (SELECT doc_id, ${graft.functions.TextHashes.fnvSignedSql("hu")} AS fp FROM h2),
         | b AS (SELECT p.doc_id, p.avg_nats, f2.fp FROM ppl p JOIN f2 USING (doc_id)),
         | cuts AS (SELECT
         |   floor(quantile_cont(avg_nats, (CAST(1 AS DOUBLE) / 3)) * 10000 + 0.5) / 10000 AS c1,
         |   floor(quantile_cont(avg_nats, (CAST(2 AS DOUBLE) / 3)) * 10000 + 0.5) / 10000 AS c2 FROM b),
         | ph AS (SELECT doc_id, fp,
         |   ((CASE WHEN avg_nats > c1 THEN 1 ELSE 0 END)
         |    + (CASE WHEN avg_nats > c2 THEN 1 ELSE 0 END)) AS pr,
         |   ((fp % 8) + 8) % 8 AS shard
         |  FROM b, cuts)
         |SELECT doc_id,
         | CASE WHEN pr = 0 THEN 'easy' WHEN pr = 1 THEN 'medium' ELSE 'hard' END AS phase,
         | CAST(shard AS BIGINT) AS shard,
         | CAST(row_number() OVER (PARTITION BY pr, shard ORDER BY fp, doc_id) AS BIGINT) AS pos
         |FROM ph ORDER BY doc_id""".stripMargin,
    "ds_tokens" ->
      """WITH a AS (SELECT source, lang, count(*) AS n_docs,
        |   sum(len(string_split(text, ' '))) AS n_tokens
        | FROM documents GROUP BY source, lang)
        |SELECT source, lang, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
        | round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 4) AS token_share,
        | round(CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, source, lang
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   / sum(n_tokens) OVER (), 4) AS cum_share
        |FROM a ORDER BY n_tokens DESC, source, lang""".stripMargin,
    // Both epochs' salted folds re-derived from raw text; the shard
    // window replays as a row_number over the same (hash, doc_id)
    // order.
    "ds_shuffle" -> {
      def ep(e: Int) = {
        val fold = graft.functions.TextHashes.fnvFoldSql(s"'ep$e:' || text")
        s"""SELECT $e AS epoch, doc_id,
           |  ${graft.functions.TextHashes.fnvSignedSql(s"($fold)")} AS hk
           |FROM documents""".stripMargin
      }
      s"""WITH u AS (${ep(0)} UNION ALL ${ep(1)}),
         | sh AS (SELECT epoch, doc_id, hk,
         |          ((hk % $shuffleShards) + $shuffleShards) % $shuffleShards AS shard
         |        FROM u)
         |SELECT epoch, doc_id, shard,
         | CAST(row_number() OVER (PARTITION BY epoch, shard
         |        ORDER BY hk, doc_id) AS BIGINT) AS pos
         |FROM sh ORDER BY epoch, shard, pos""".stripMargin
    },
    // Independent replay: per-token FNV → bucket, the bucket-count
    // pair, the quantized log-ratio LUT, and the per-doc INTEGER score
    // are all re-derived from raw text; the engine's HOF fold and the
    // oracle's explode/group-by meet on the same integers.
    "ds_dsir" ->
      s"""WITH t AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
         |           FROM documents),
         | h AS (SELECT doc_id, source, ${graft.functions.TextHashes.fnvFoldSql("w")} AS hu FROM t),
         | fb AS (SELECT doc_id, source,
         |          ((${graft.functions.TextHashes.fnvSignedSql("hu")} % $dsirB) + $dsirB) % $dsirB AS b
         |        FROM h),
         | c AS (SELECT b,
         |         CAST(sum(CASE WHEN source = '$dsirTarget' THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         |         CAST(sum(CASE WHEN source <> '$dsirTarget' THEN 1 ELSE 0 END) AS BIGINT) AS n_r
         |       FROM fb GROUP BY b),
         | tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS tot_t,
         |                CAST(sum(n_r) AS BIGINT) AS tot_r FROM c),
         | lut AS (SELECT b,
         |           CAST(round(ln(((n_t + 1)::DOUBLE * (tot_r + $dsirB))
         |                       / ((n_r + 1)::DOUBLE * (tot_t + $dsirB))) * $dsirScale)
         |                AS BIGINT) AS lr_q
         |         FROM c CROSS JOIN tot),
         | sc AS (SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |          CAST(sum(coalesce(lut.lr_q, 0)) AS BIGINT) AS score_q
         |        FROM fb LEFT JOIN lut USING (b) GROUP BY fb.doc_id)
         |SELECT d.doc_id, d.source, sc.n_tokens,
         | round(sc.score_q::DOUBLE / $dsirScale, 4) AS logw,
         | CASE WHEN sc.score_q > 0 THEN 'keep' ELSE 'drop' END AS dsir_flag
         |FROM documents d JOIN sc ON sc.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "ds_split" ->
      s"""$fnvCte
         |SELECT doc_id, ((fp % 1000) + 1000) % 1000 AS bucket,
         |  CASE WHEN ((fp % 1000) + 1000) % 1000 < 800 THEN 'train'
         |       WHEN ((fp % 1000) + 1000) % 1000 < 900 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM f ORDER BY doc_id""".stripMargin,
    "ds_mixture" ->
      s"""$fnvCte
         |SELECT lang, count(*) AS n_total,
         |  CAST(sum(CASE WHEN ((fp % 10000) + 10000) % 10000 < $sqlMixtureThr
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  round(sum(CASE WHEN ((fp % 10000) + 10000) % 10000 < $sqlMixtureThr
         |           THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS kept_ratio
         |FROM f GROUP BY lang ORDER BY lang""".stripMargin,
    // the √(n_min/n_l) rate, its 1e-6 quantization, and the hash-bucket
    // keep rule re-derived from scratch (sqrt/division IEEE-exact both
    // engines; round() is the dround(·,0) twin)
    "ds_temperature" ->
      s"""$fnvCte,
         | bl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_total FROM f GROUP BY lang),
         | mn AS (SELECT min(n_total) AS n_min FROM bl),
         | r AS (SELECT lang, n_total,
         |     CAST(round(sqrt(n_min::DOUBLE / n_total) * 1e6) AS BIGINT) AS rate_micro
         |   FROM bl CROSS JOIN mn)
         |SELECT f.lang, r.n_total, r.rate_micro,
         |  CAST(sum(CASE WHEN ((f.fp % 1000000) + 1000000) % 1000000 < r.rate_micro
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  round(sum(CASE WHEN ((f.fp % 1000000) + 1000000) % 1000000 < r.rate_micro
         |           THEN 1 ELSE 0 END)::DOUBLE / r.n_total, 4) AS kept_ratio
         |FROM f JOIN r ON r.lang = f.lang
         |GROUP BY f.lang, r.n_total, r.rate_micro ORDER BY f.lang""".stripMargin,
    "ds_pack" ->
      s"""$fnvCte,
         | t AS (SELECT doc_id, ((fp % $packShards) + $packShards) % $packShards AS shard,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM f),
         | c AS (SELECT shard, n_tokens,
         |         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // $packBudget
         |           AS BIGINT) AS seq_id
         |       FROM t)
         |SELECT shard, seq_id, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM c GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin,
    "ds_sample" ->
      s"""$fnvCte
         |SELECT lang, rk, doc_id FROM (
         |  SELECT lang, doc_id,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY fp, doc_id) AS BIGINT) AS rk
         |  FROM f)
         |WHERE rk <= $samplePerLang ORDER BY lang, rk""".stripMargin,
    // A-ES priorities re-derived: the same FNV bucket → uniform u →
    // quantized ln(u)/w key, ranked in DuckDB's own window engine
    "ds_weighted" ->
      s"""$fnvCte,
         | k AS (SELECT doc_id, n_chars,
         |         CAST(round(ln((((fp % 1000000) + 1000000) % 1000000 + 1)::DOUBLE
         |              / 1000001) / n_chars * 1e9) AS BIGINT) AS priority_q
         |       FROM f)
         |SELECT doc_id, n_chars, priority_q, rk FROM (
         |  SELECT *, CAST(row_number() OVER (ORDER BY priority_q DESC, doc_id)
         |       AS BIGINT) AS rk FROM k)
         |WHERE rk <= $weightedK ORDER BY rk""".stripMargin,
    // shingle twin joins on the STRING shingle (DuckDB has no xxhash64);
    // identical result unless the engine's 64-bit shingle hashing
    // collides across distinct shingles — the documented ~1e-11 bound
    "ds_decontam" -> decontamSql,
    // the bloom is pure pruning (false positives die in the confirm
    // join), so the exact twin applies VERBATIM — that identity is the
    // gate: a leaked false positive or an over-pruning filter both
    // diverge from the exact result
    "ds_decontam_bloom" -> decontamSql,
    "ds_curated" ->
      s"""WITH $curatedCte
         |SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
    // the composed CCNet-style pipeline: the shared curation CTE joined
    // to the shared perplexity CTE chain, cut on the rounded avg_nats,
    // nat totals summed as 1e-4-quantized BIGINTs
    "ds_curated2" ->
      s"""WITH ${TextOps.perplexityCtes},
         | $curatedCte,
         | cut AS (SELECT k.lang, k.n_chars,
         |           CAST(round(p.avg_nats * 10000) AS BIGINT) AS nats_q
         |         FROM kept k JOIN ppl p USING (doc_id)
         |         WHERE p.avg_nats <= $perplexityCut)
         |SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  round(CAST(sum(nats_q) AS DOUBLE) / 10000 / count(*), 4) AS avg_nats
         |FROM cut GROUP BY lang ORDER BY lang""".stripMargin)

  /** Shared curation CTE ending in `kept(doc_id, lang, n_chars)` —
    * quality window, langid agreement, dedup survivorship; composed by
    * both curated twins. */
  private def curatedCte: String = {
    val stop = TextOps.sqlCountIn(TextOps.stopwords)
    val marks = TextOps.markers.map { case (n, set) =>
      s"${TextOps.sqlCountIn(set)} AS $n" }.mkString(", ")
    s"""scored AS (SELECT doc_id, lang, n_chars, text,
       |    (n_chars BETWEEN 100 AND 2000
       |     AND ($stop::DOUBLE / len(string_split(text, ' '))) BETWEEN 0.05 AND 0.6) AS q_ok,
       |    $marks,
       |    (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS is_survivor
       |  FROM documents),
       | pred AS (SELECT *,
       |    CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
       |         WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
       |         WHEN s_fr >= s_de THEN 'fr' ELSE 'de' END AS lang_pred
       |  FROM scored),
       | kept AS (SELECT doc_id, lang, n_chars FROM pred
       |          WHERE q_ok AND lang_pred = lang AND is_survivor)""".stripMargin
  }
}
