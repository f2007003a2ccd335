package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.functions.Numeric.dround
import graft.functions.ArrayFns

/** Similarity search over the `embeddings` table (`Array[Float]`,
  * 64-dim): brute-force cosine top-k as the exact baseline, and a
  * sign-LSH bucketed variant as the 100 TB scale path.
  *
  * Scale shapes:
  *  - brute force broadcasts the (small) probe set against the candidate
  *    table — one scan of the big side, no shuffle of candidates; top-k
  *    is a per-probe window over probe-partitioned data;
  *  - sign-LSH hashes every vector to a bucket with a fixed set of
  *    random hyperplanes; probes only join candidates in their own
  *    bucket — the join key is the bucket id, so candidate work scales
  *    with bucket size, not table size.
  *
  * The dot product is `aggregate(zip_with(...))` over doubles — a
  * sequential left fold, bit-identical to the oracle's list_dot_product.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  // native array cast (codegen'd), not transform(_.cast): the HOF form
  // evaluates its lambda interpreted per element; float→double widening
  // is exact either way, so results are bit-identical
  private val asDouble: Column = col("embedding").cast("array<double>")

  // native codegen'd expression: the HOF form aggregate(zip_with(...))
  // evaluates interpreted per element and dominated the profile; the
  // kernel is the same sequential left fold (bit-identical to DuckDB's
  // list_dot_product, so oracle hashes still match)
  private def dot(a: Column, b: Column): Column = ArrayFns.vecDot(a, b)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private val kNeighbors = 3
  private val nProbes = 5

  /** Brute-force cosine top-k: exact baseline. Probe side is tiny and
    * broadcast; one pass over candidates; per-probe top-k via window. */
  private val knnCosine: Q = (s, d) => {
    val emb = table(s, d, "embeddings")
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), asDouble.as("qe"))
    val cands = emb.select(col("vec_id").as("cid"), asDouble.as("ce"))
    val sims = cands.crossJoin(broadcast(probes))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
    sims.withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  // Multi-table sign-LSH: L independent tables of k hyperplanes each.
  // One table of k bits has collision probability (1 − θ/π)^k for two
  // vectors at angle θ — near zero for the moderate similarities real
  // neighbor pairs have — so recall comes from the union over L tables:
  // 1 − (1 − p^k)^L. Storage/shuffle cost is L rows per vector; probe
  // cost is L bucket lookups, independent of table size. That is the
  // 100 TB trade: candidates per probe ≈ L · n/2^k, tunable, never O(n).
  private val nTables = 12
  private val planesPerTable = 6
  private val dim = 64

  /** Deterministic ±1 hyperplane components via splitmix64 — canonical
    * kernel in [[graft.functions.ArrayKernels.planeSign]]. */
  private[llm] def planeSign(plane: Int, component: Int): Double =
    graft.functions.ArrayKernels.planeSign(plane, component, dim)

  /** (vec_id, tb, key) — one row per LSH table, via the native
    * codegen'd `SignLshKeys` expression + posexplode (array position =
    * table id). The earlier expression-tree form inlined
    * nTables×planesPerTable literal plane arrays (~4,600 Catalyst
    * nodes): semantically identical buckets, but its generated code
    * paid seconds of janino/JIT compilation per plan. */
  private def bucketed(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        posexplode(ArrayFns.signLshKeys(col("ve"), nTables, planesPerTable)))
      .select(col("vec_id"), col("pos").as("tb"), col("col").as("key"))

  /** Sign-LSH approximate top-k: probes meet only candidates sharing a
    * bucket in at least one of the L tables. Recall vs the brute-force
    * baseline is unit-tested; the CANDIDATE SET is engine-specific
    * (hyperplane layout), but GIVEN that set — dumped as a fixture —
    * the exact-cosine scoring and top-k ranking are fully determined,
    * so the oracle recomputes both from the raw embeddings and the
    * compare is hash-gated (the r3 rows-only check could not see a
    * scoring or ranking bug). */
  private val annLsh: Q = (s, d) => {
    // narrow candidate shape (ids only through the bucket join + dedup,
    // vectors joined back after distinct) — same as ddEmbCos below
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val keys = bucketed(emb)
    val probeKeys = keys.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("tb"), col("key"))
    val pairs = keys.select(col("tb"), col("key"), col("vec_id").as("cid"))
      .join(broadcast(probeKeys), Seq("tb", "key"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid")
      .dropDuplicates("qid", "cid")
      .persist()
    graft.io.Sinks.dumpFixture(pairs, "annlsh_cands")
    val sims = pairs
      .join(emb.select(col("vec_id").as("qid"), col("ve").as("qe")), Seq("qid"))
      .join(emb.select(col("vec_id").as("cid"), col("ve").as("ce")), Seq("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
    sims.withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  /** Embedding-cosine near-duplicate pairs (the dedup-by-embedding
    * component): candidate pairs from the multi-table sign-LSH buckets
    * (both sides full table — no probe set), verified with exact cosine
    * ≥ threshold. Candidate work scales with bucket sizes, never O(n²).
    *
    * Threshold shared with [[ddEmbCosExact]]: r3 used 0.8, which NO
    * pair on the noise corpus clears at the verify SF — the driver row
    * certified an empty result, a gate that cannot fail (VERDICT r3
    * §wrong 3). At the shared 0.3 the sf0.01 corpus yields ~990 true
    * pairs, the LSH recall is measured by [[ddEmbCosRecall]], and the
    * found pairs are dumped as a fixture so the oracle can recompute
    * exact cosine for exactly those pairs and re-apply the threshold —
    * an emitted pair below threshold hash-mismatches (soundness gate;
    * recall keeps the planted-pair ScalaTest). */
  private[llm] val embCosThreshold = 0.3
  private def embCosPairs(s: SparkSession, d: String): DataFrame =
    embCosPairsOn(table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve")))
  private def embCosPairsOn(emb: DataFrame): DataFrame = {
    // Exact-duplicate collapse FIRST (the production shape: real corpora
    // are full of bit-identical embeddings from duplicate documents, and
    // the 10× probe showed twin-flooded LSH buckets driving a 100×
    // candidate-dedup exchange): identical vectors form one group via a
    // 64-bit content hash, LSH candidate generation runs on one
    // representative per group — scaling with DISTINCT vectors — and the
    // member expansion below re-emits the full true pair set. A hash
    // collision would merge two different vectors, but the soundness
    // fixture oracle recomputes every emitted pair's exact cosine, so a
    // collision-induced unsound pair turns the gate red (measured
    // probability ~n²/2⁶⁴).
    //
    // Candidate pairs carry ONLY ids through the bucket join and dedup;
    // vectors join back AFTER the pairs are distinct (VERDICT r2
    // §wrong 3); the bucket relation is persisted so the self-join does
    // not recompute the 72 hyperplane dot products per side.
    val groups = emb.withColumn("vh", xxhash64(col("ve")))
      .groupBy("vh").agg(min(col("vec_id")).as("rep"),
        sort_array(collect_list(col("vec_id"))).as("members"),
        first(col("ve")).as("ve"))   // members are bit-identical; any one
      .persist()
    val repEmb = groups.select(col("rep").as("vec_id"), col("ve"))
    val keys = bucketed(repEmb).persist()
    val repPairs = keys.select(col("tb"), col("key"), col("vec_id").as("rep_a"))
      .join(keys.select(col("tb"), col("key"), col("vec_id").as("rep_b")), Seq("tb", "key"))
      .filter(col("rep_a") < col("rep_b"))
      .select("rep_a", "rep_b")
      .dropDuplicates("rep_a", "rep_b")
    val scored = repPairs
      .join(repEmb.select(col("vec_id").as("rep_a"), col("ve").as("va")), Seq("rep_a"))
      .join(repEmb.select(col("vec_id").as("rep_b"), col("ve").as("vb")), Seq("rep_b"))
      .select(col("rep_a"), col("rep_b"), cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= embCosThreshold)
    // cross-group member pairs: groups are disjoint, so least/greatest
    // restores the id_a < id_b convention; every member shares its
    // rep's vector, so the rep-level sim IS the member-level sim
    val cross = scored
      .join(groups.select(col("rep").as("rep_a"), col("members").as("ma")), Seq("rep_a"))
      .join(groups.select(col("rep").as("rep_b"), col("members").as("mb")), Seq("rep_b"))
      .select(explode(col("ma")).as("x"), col("mb"), col("sim"))
      .select(col("x"), explode(col("mb")).as("y"), col("sim"))
      .select(least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b"), col("sim"))
    // within-group twin pairs: sim(v, v), one evaluation per group
    val twins = groups.filter(size(col("members")) >= 2)
      .select(col("members"), cosine(col("ve"), col("ve")).as("sim"))
      .filter(col("sim") >= embCosThreshold)
      .select(explode(col("members")).as("x"), col("members"), col("sim"))
      .select(col("x"), explode(col("members")).as("y"), col("sim"))
      .filter(col("x") < col("y"))
      .select(col("x").as("id_a"), col("y").as("id_b"), col("sim"))
    cross.unionByName(twins)
      .select(col("id_a"), col("id_b"), dround(col("sim"), 4).as("sim"))
  }
  private val ddEmbCos: Q = (s, d) => {
    val found = embCosPairs(s, d).persist()
    graft.io.Sinks.dumpFixture(found.select("id_a", "id_b"), "embcos_pairs")
    found.orderBy("id_a", "id_b")
  }

  /** LSH recall against the exact baseline, in-query (VERDICT r3 next-4
    * §2): one row (pairs_found, pairs_exact, recall). Every found pair
    * is exact-cosine-verified, so found ⊆ exact and recall is simply
    * |found|/|exact|; the oracle recomputes |exact| from the raw
    * embeddings and |found| from the dumped fixture — both counts are
    * independently derived on the DuckDB side. */
  private val ddEmbCosRecall: Q = (s, d) => {
    val found = embCosPairs(s, d).persist()
    graft.io.Sinks.dumpFixture(found.select("id_a", "id_b"), "embcos_pairs")
    val exact = ddEmbCosExact(s, d)
    found.agg(count(lit(1)).as("pairs_found"))
      .crossJoin(exact.agg(count(lit(1)).as("pairs_exact")))
      .select(col("pairs_found"), col("pairs_exact"),
        dround(col("pairs_found").cast("double") / col("pairs_exact"), 4).as("recall"))
  }

  /** Recall at the PRODUCTION operating point (VERDICT r4 next §5),
    * made falsifiable on a corpus that has no naturally high-similarity
    * pairs (measured max exact cosine: 0.48/0.51/0.60 at sf
    * 0.001/0.01/0.1 — the sim ≥ 0.8 regime the verdict asked to report
    * is EMPTY in the data at every scale, so a restricted-recall column
    * would be 0/0). Instead the query PLANTS the production shape:
    * directional duplicates — 64 vectors rescaled ×2, cosine exactly
    * 1.0 but not bit-identical, so they ride the full sign-LSH banding
    * path rather than the exact-twin collapse (sign(w·2v) = sign(w·v),
    * so banding must recover every one; scaling by a power of two is
    * FP-exact, so the gate is deterministic, unlike a perturbed-angle
    * plant whose recall is probabilistic). Expected committed row:
    * planted=64, found_planted=64, recall_planted=1.0. The statistical
    * cos≈0.9 regime stays covered by the planted-pair ScalaTest. */
  private val plantN = 64
  private val plantOffset = 1000000L
  private val ddEmbCosRecallPlanted: Q = (s, d) => {
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val planted = emb.filter(col("vec_id") < plantN)
      .select((col("vec_id") + plantOffset).as("vec_id"),
        transform(col("ve"), x => x * 2.0).as("ve"))
    val found = embCosPairsOn(emb.unionByName(planted)).persist()
    graft.io.Sinks.dumpFixture(found.select("id_a", "id_b"), "embcos_planted_pairs")
    found.filter(col("id_b") === col("id_a") + plantOffset && col("id_a") < plantN)
      .agg(count(lit(1)).as("found_planted"))
      .crossJoin(planted.agg(count(lit(1)).as("planted")))
      .select(col("planted"), col("found_planted"),
        dround(col("found_planted").cast("double") / col("planted"), 4).as("recall_planted"))
  }

  // IVF-flat ANN: a k-means coarse quantizer (the FAISS IVF architecture)
  // as the SECOND scale path next to sign-LSH. Index = one KMeans fit +
  // one cluster id per vector; probes search only the nProbe nearest
  // cells. At 100 TB: the index add is one ml.KMeans job + a narrow
  // (vec_id, cluster) relation co-partitioned with the vectors; probe
  // cost is nProbe/k of the corpus per query, tunable, never O(n).
  // Cell-count POLICY (r18 — the nswShardsFor argument applied to the
  // coarse quantizer): ivfK was a fixed 16, fine at the gated corpora,
  // but a quantizer whose cell count stands still while the corpus
  // grows makes per-probe cost LINEAR in n (each probed cell holds
  // n/16 vectors forever). The FAISS sizing rule scales cells with
  // sqrt(n), making a fixed probe ring cost nProbe·O(sqrt n):
  //
  //   nlist = clamp(pow2floor(sqrt(n / 8)), 16, 4096)
  //
  // The floor keeps every gated corpus on the historical 16-cell
  // layout (fixtures, the ann_tune knee, and the recall-gate pins are
  // unchanged by construction: sqrt(2000/8) ≈ 15.8 → pow2 8 → floor
  // 16); the pow2 step keeps the count stable under small corpus
  // drift; 4096 caps the per-probe quantizer ranking. Measured at
  // 100× (200k vectors → 128 cells): see BASELINE.md's r18 rows. Like
  // the NSW shard count, the choice is PART OF THE INDEX — the stored
  // centroid relation is the persisted form, and every consumer reads
  // whatever count was built rather than assuming a constant.
  private[graft] def ivfCellsFor(n: Long): Int = {
    val sq = math.sqrt(n.toDouble / 8).toLong
    val pow2 = java.lang.Long.highestOneBit(math.max(1L, sq)).toInt
    math.min(math.max(pow2, 16), 4096)
  }
  /** Probe-ring width: the MEASURED knee of ann_tune's recall-vs-
    * nProbe curve (round 12; sf0.01: np=1→0.33, 2→0.40, 4→0.87,
    * 8→0.93 — doubling past 4 buys +0.07 recall for 2× scanned
    * cells), wired back into serving per VERDICT r11 next §2. The
    * recall-gate floors in LlmOpsSpec assert the tuned operating
    * point, not the old 0.2 house floor, so a serving regression
    * fails the gate. Under the cell policy the ring stays 4 cells
    * while cells SHRINK with sqrt(n) — the scan fraction falls as the
    * corpus grows, and recall at the new operating point is what
    * ann_tune measures per corpus. */
  private val ivfNProbe = 4

  /** (assignments, centroids): vec_id → cluster, and the cluster
    * centers as an nlist-row relation (tiny, broadcast downstream;
    * nlist from [[ivfCellsFor]]). */
  private[llm] def ivfIndex(s: SparkSession, emb: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = emb.withColumn("features", array_to_vector(col("ve")))
    val model = new KMeans().setK(ivfCellsFor(emb.count()))
      .setSeed(7L).setMaxIter(5).fit(feats)
    val assigned = model.summary.predictions
      .select(col("vec_id"), col("ve"), col("prediction").as("cl"))
    val centroids = s.createDataFrame(
      model.clusterCenters.toIndexedSeq.zipWithIndex.map { case (c, i) => (i, c.toArray) })
      .toDF("cl", "ce")
    (assigned, centroids)
  }

  /** On-disk IVF index location for a given corpus dir: FAISS-style
    * build-once/probe-many (VERDICT r3 next-4 §3 — r3 refit the k-means
    * inside every query, so the bench measured index BUILD, not probe).
    * Keyed by the corpus path (basename + path hash): the driver's
    * testdata is immutable per sf, so an existing index is valid;
    * `ivfBuild` force-rebuilds for anything else (tools/IvfBuild). */
  private[llm] def ivfIndexPath(d: String): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_IVF_DIR", "/tmp/graft_ivf")
    s"$root/${new java.io.File(d).getName}-${math.abs(d.hashCode.toLong)}"
  }

  /** Build and persist the IVF index: assignments (vec_id, cl, ve — the
    * vectors live IN the index, IVF-flat) and the k centroids. One
    * ml.KMeans job + two parquet writes; at 100 TB this is the separate
    * index-build job, co-partitioned with the corpus, run once. */
  private[graft] def ivfBuild(s: SparkSession, d: String): String = {
    val path = ivfIndexPath(d)
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val (assigned, centroids) = ivfIndex(s, emb)
    assigned.write.mode("overwrite").parquet(s"$path/assignments")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    path
  }

  private def ensureIvfIndex(s: SparkSession, d: String): String = {
    val path = ivfIndexPath(d)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/centroids/_SUCCESS")))
      ivfBuild(s, d)
    path
  }

  /** Cross-package seams for the streaming index-maintenance gate
    * (st_ann_upsert): the persisted index plus the constants its
    * oracle must mirror. */
  private[graft] def ensureIvfIndexFor(s: SparkSession, d: String): String =
    ensureIvfIndex(s, d)
  // prestage seams (VERDICT r16 next §3): Bench materializes every
  // lazily-built persisted index BEFORE the timed passes and prices
  // the builds on their own artifact line, so a fresh host's pass 1
  // never pays a build inside a query's timing
  private[graft] def ensurePqIndexFor(s: SparkSession, d: String): String =
    ensurePqIndex(s, d)
  private[graft] def ensureIvfPqIndexFor(s: SparkSession, d: String): String =
    ensureIvfPqIndex(s, d)
  private[graft] def ensureNswIndexFor(s: SparkSession, d: String): String =
    ensureNswIndex(s, d)
  private[graft] def upsertConsts: (Long, Long, Int, Int, Int) =
    (plantN.toLong, upsertOffset, nProbes, ivfNProbe, kNeighbors)
  /** NSW engine tuning (minShards, M, efBuild, efSearch) for specs
    * (ADVICE r15: NswUpsertSpec re-declared these as literals, so an
    * engine retune would silently leave its independent rebuild
    * asserting stale parameters). Since r18 the shard count is a
    * POLICY of corpus size ([[nswShardsFor]]) — the first element is
    * the policy FLOOR; specs that replicate routing for a persisted
    * graph must read that graph's count via [[nswShardCountFor]]. */
  private[graft] def nswTuning: (Int, Int, Int, Int) =
    (nswMinShards, nswM, nswEfBuild, nswEfSearch)

  /** IVF approximate top-k over the PERSISTED index: each probe ranks
    * the 16 stored centroids (an 80-row cross join — the quantizer, not
    * the corpus), keeps its nProbe nearest cells, and computes exact
    * cosine only against index rows in those cells. The k-means fit
    * happens once in [[ivfBuild]] (lazily here on first touch, or via
    * tools/IvfBuild); the benched query is probe-only, matching how an
    * ANN index serves. The probed candidate set depends on the fit, but
    * — like [[annLsh]] — given that set (fixture) the scoring and
    * ranking are oracle-recomputable, so the check is hash-gated;
    * the planted-neighbor recall test covers the layout. */
  /** The ONE IVF serve path (ADVICE r11 — annIvf and ann_tune's
    * per-setting serve previously duplicated this plan verbatim):
    * (qid, cid, sim) exact cosines against index rows in each probe's
    * np nearest cells of the persisted index. */
  private def ivfSims(s: SparkSession, d: String, np: Int): DataFrame = {
    val idx = ensureIvfIndex(s, d)
    val assigned = s.read.parquet(s"$idx/assignments")
    val centroids = s.read.parquet(s"$idx/centroids")
    val probes = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
      .filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("ve").as("qe"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("qe"), col("ce")))
      .withColumn("crk", row_number().over(Window.partitionBy("qid").orderBy(asc("cdist"), asc("cl"))))
      .filter(col("crk") <= np)
      .select("qid", "qe", "cl")
    assigned.join(broadcast(probeCells), Seq("cl"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"), cosine(col("qe"), col("ve")).as("sim"))
  }

  private val annIvf: Q = (s, d) => {
    val sims = ivfSims(s, d, ivfNProbe).persist()
    graft.io.Sinks.dumpFixture(sims.select("qid", "cid"), "annivf_cands")
    sims.withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  /** Exact embedding-cosine threshold join — the oracle-checkable exact
    * baseline behind [[ddEmbCos]], mirroring how knn_cosine backs
    * ann_lsh. All-pairs over the broadcast side IS the declared exact
    * semantics (the LSH variant is the 100 TB scale path); norms are
    * precomputed per row, so each pair pays one dot product, and the
    * threshold cut runs on the unrounded value — sqrt/division are
    * IEEE-exact, VecDot matches list_dot_product, so Spark and DuckDB
    * cut the identical pair set. Threshold 0.3: on the noise corpus the
    * result is sparse (~1% of pairs), not quadratic. */
  private val exactThreshold = 0.3
  private val ddEmbCosExact: Q = (s, d) => {
    val emb = table(s, d, "embeddings")
      .select(col("vec_id"), asDouble.as("ve"))
      .withColumn("nrm", sqrt(dot(col("ve"), col("ve"))))
    val a = emb.select(col("vec_id").as("id_a"), col("ve").as("va"), col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("id_b"), col("ve").as("vb"), col("nrm").as("nb"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= exactThreshold)
      .select(col("id_a"), col("id_b"), dround(col("sim"), 4).as("sim"))
      .orderBy("id_a", "id_b")
  }

  /** Int8 symmetric per-vector quantization — the 4× memory cut an
    * ANN index takes at 100 TB before IVF/LSH even starts. Per
    * vector: scale = 127 / max|x_i| (zero vector → all zeros),
    * q_i = clamp(floor(x_i·s + 0.5), −127, 127) — half-up rounding,
    * chosen because it replays exactly as integer arithmetic on any
    * engine (banker's rounding would not). The gate is integer-exact:
    * q-sum / |q|-sum / min / max pin every rounded component (an
    * off-by-one in ANY of the 64 lanes shifts a sum), and the
    * original↔dequantized cosine — x·q / (‖x‖‖q‖); the scale cancels,
    * so no float division enters the quantized side — is the recall-
    * relevant quality metric, dround(4). The oracle recomputes the
    * whole path from the raw float[] with its own list lambdas. */
  private val embQuant: Q = (s, d) => {
    val qAbsSum = aggregate(col("q"), lit(0L), (a, e) => a + abs(e))
    table(s, d, "embeddings")
      // empty vectors out of scope on BOTH sides: Spark's aggregate()
      // would return the 0L seed where DuckDB's list_sum([]) is NULL
      .filter(size(col("embedding")) > 0)
      .select(col("vec_id"), asDouble.as("v"))
      .withColumn("maxabs", array_max(transform(col("v"), e => abs(e))))
      .withColumn("sc",
        when(col("maxabs") > 0d, lit(127.0) / col("maxabs")).otherwise(lit(0d)))
      .withColumn("q", transform(col("v"), e =>
        least(lit(127L), greatest(lit(-127L),
          floor(e * col("sc") + lit(0.5d)).cast("long")))))
      .withColumn("qd", col("q").cast("array<double>"))
      .select(col("vec_id"),
        aggregate(col("q"), lit(0L), (a, e) => a + e).as("q_sum"),
        qAbsSum.as("q_abs_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        when(qAbsSum > 0L,
          dround(dot(col("v"), col("qd")) /
            (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("qd"), col("qd")))), 4))
          .otherwise(lit(null).cast("double")).as("cos_dq"))
      .orderBy("vec_id")
  }

  // Product quantization (the FAISS PQ architecture): split the 64-dim
  // vector into 8 contiguous 8-dim blocks, k-means each block to 16
  // centroids, and encode every vector as 8 four-bit codes — 256 B of
  // float32 becomes 4 B, the memory layout a billion-vector ANN index
  // actually ships. Training runs on the corpus here (a SAMPLE at
  // 100 TB — standard practice); ENCODING deliberately does not use
  // model.transform: the 128-row codebook broadcasts and the argmin is
  // computed by our own codegen'd ‖x‖²−2x·c+‖c‖² expression, so the
  // encode is a map-side broadcast join at any scale AND the oracle
  // can replay the exact same double arithmetic (vecDot is
  // bit-identical to DuckDB's list_dot_product).
  private val pqBlocks = 8
  private val pqDim = 8
  private val pqK = 16

  /** Per-block codebooks as one (block, cl, ce) relation, 128 rows. */
  private def pqCodebooks(s: SparkSession, emb: DataFrame): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    (0 until pqBlocks).map { b =>
      val feats = emb.select(
        array_to_vector(slice(col("ve"), b * pqDim + 1, pqDim)).as("features"))
      val model = new KMeans().setK(pqK).setSeed(7L + b).setMaxIter(5).fit(feats)
      s.createDataFrame(model.clusterCenters.toIndexedSeq.zipWithIndex
          .map { case (c, i) => (b, i, c.toArray) })
        .toDF("block", "cl", "ce")
    }.reduce(_ unionByName _)
  }

  /** On-disk PQ codebook location — the ivfIndexPath discipline
    * (VERDICT r3 next-4 §3: an in-query fit benches index BUILD, not
    * the operator): training is the separate build-once job, the
    * query encodes against the persisted 128-row codebook. */
  private def pqIndexPath(d: String): String = ivfIndexPath(d) + "-pq"

  /** Per-vector PQ assignment against a codebook: one row per vector
    * with its 8 block codes (block order) and the 8 per-block squared
    * reconstruction errors (same order). The argmin is our codegen'd
    * ‖x‖²−2x·c+‖c‖² against the BROADCAST 128-row codebook — a
    * map-side join at any scale — and the per-block rows are folded
    * back in sorted block order, so every downstream fold over `ds`
    * is deterministic (the r6 pq_encode lesson: partition-order sums
    * flip rounded decimals between runs). */
  private def pqAssignments(emb: DataFrame, codebook: DataFrame): DataFrame = {
    val blocks = emb.select(col("vec_id"),
      posexplode(transform(sequence(lit(0), lit(pqBlocks - 1)),
        b => slice(col("ve"), b * pqDim + 1, lit(pqDim)))).as(Seq("block", "xb")))
    val dist = dot(col("xb"), col("xb")) - lit(2.0) * dot(col("xb"), col("ce")) +
      dot(col("ce"), col("ce"))
    blocks.join(broadcast(codebook), Seq("block"))
      .select(col("vec_id"), col("block"), struct(dist.as("d"), col("cl")).as("dc"))
      .groupBy("vec_id", "block")
      .agg(min(col("dc")).as("best"))
      .groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("block"),
        col("best.cl").as("cl"), col("best.d").as("d")))).as("bl"))
      .select(col("vec_id"),
        transform(col("bl"), x => x.getField("cl")).as("codes"),
        transform(col("bl"), x => x.getField("d")).as("ds"))
  }

  /** Build and persist the PQ index: the 8 per-block codebooks AND the
    * encoded corpus — (vec_id, codes) at 4 bits/block, the 64×
    * compression a billion-vector serving index actually holds in
    * memory. Training is a sampled k-means job; encoding is one
    * map-side broadcast-join pass over everything (completely different
    * resource shapes at 100 TB — which is why this is a separate
    * build tool, not query work). */
  private[graft] def pqBuild(s: SparkSession, d: String): String = {
    val path = pqIndexPath(d)
    // persisted across the 8 per-block fits — each KMeans otherwise
    // re-scans and re-projects the embeddings table from parquet
    val emb = table(s, d, "embeddings")
      .filter(size(col("embedding")) === pqBlocks * pqDim)
      .select(col("vec_id"), asDouble.as("ve"))
      .persist()
    try {
      val cb = pqCodebooks(s, emb)
      cb.write.mode("overwrite").parquet(s"$path/codebooks")
      // codes ride with the vector's norm (8 B/vector): cosine serving
      // over a dot-product ADC needs |c| at scoring time, and storing
      // it beats touching the 256 B vector it summarizes
      pqAssignments(emb, s.read.parquet(s"$path/codebooks"))
        .join(emb.select(col("vec_id"),
          sqrt(dot(col("ve"), col("ve"))).as("nrm")), Seq("vec_id"))
        .select("vec_id", "codes", "nrm")
        .write.mode("overwrite").parquet(s"$path/codes")
    } finally emb.unpersist(blocking = false)
    path
  }

  private def ensurePqIndex(s: SparkSession, d: String): String = {
    val path = pqIndexPath(d)
    val ok = Seq("codebooks", "codes").forall(p =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/$p/_SUCCESS")))
    if (!ok) pqBuild(s, d)
    path
  }

  /** PQ encode, gated: the query dumps the trained codebooks as a
    * fixture (the k-means fit itself is engine-specific, like the
    * minhash seeds) and emits each vector's code string + exact
    * reconstruction error; the oracle re-derives every assignment
    * from the raw embeddings and the dumped codebooks with the same
    * distance algebra — one flipped code or a wrong error diverges
    * the hash. */
  private val pqEncode: Q = (s, d) => {
    val emb = table(s, d, "embeddings")
      .filter(size(col("embedding")) === pqBlocks * pqDim)
      .select(col("vec_id"), asDouble.as("ve"))
    val codebook = s.read.parquet(s"${ensurePqIndex(s, d)}/codebooks").persist()
    graft.io.Sinks.dumpFixture(codebook, "pq_codebooks")
    // recon_err folds the per-block errors in BLOCK order: a plain
    // sum() merges doubles in partition-dependent order, and a
    // boundary-straddling ulp would flip the rounded 6th decimal
    // between runs — the sorted sequential fold is deterministic (the
    // twin sums its block-ordered list the same way)
    pqAssignments(emb, codebook)
      .select(col("vec_id"),
        array_join(transform(col("codes"), c => c.cast("string")), "-").as("codes"),
        dround(aggregate(col("ds"), lit(0d), (a, e) => a + e), 6).as("recon_err"))
      .orderBy("vec_id")
  }

  // ADC serving parameters: each probe shortlists `pqShortlist`
  // candidates by table-lookup score, then exact-reranks to the
  // shared kNeighbors. Shortlist ≫ k is the standard PQ recall lever —
  // the ADC score is an approximation, so the exact rerank needs slack.
  private val pqShortlist = 20

  /** IVF-ADC style top-k over the PERSISTED PQ index (VERDICT r6 next
    * §1 — r6 encoded but nothing queried): the billion-vector serving
    * read path. Per probe, the 8×16 table of squared distances from
    * each probe sub-vector to each block centroid is precomputed
    * (8·16 = 128 doubles — one row per probe, broadcast), and every
    * stored 4-bit code row is scored WITHOUT touching any vector: a
    * sequential fold over the 8 codes does `lut[block·16 + code]`
    * lookups — at 100 TB the scan side carries 4 B/vector instead of
    * 256 B, memory-resident, and the score is 8 array lookups, no
    * dot products. The ADC fold runs in block order (deterministic);
    * the shortlist is exact-cosine reranked to top-k, the gate shape
    * shared with ann_lsh/ann_ivf: the CANDIDATE SET is index-specific
    * and dumped as a fixture, and GIVEN that set the scoring + ranking
    * are fully determined, so the compare is hash-gated. Recall vs the
    * exact baseline is pinned by [[annPqRecall]]. */
  /** Per-probe ADC lookup table: (qid, lut[128]) laid out
    * [block*16 + cl] — array_sort on (block, cl, d) structs gives
    * exactly that order. Entries are DOT PRODUCTS q_b·c, not L2
    * distances: the baseline metric is cosine, and with per-vector
    * norms stored in the index the ADC score Σ_b lut[b,code_b] / |c|
    * approximates cosine·|q| directly — an L2 table over unnormalized
    * vectors ranks by the wrong metric (measured: recall 0.2 vs the
    * exact baseline). */
  private def probeLut(codebook: DataFrame, probes: DataFrame): DataFrame = {
    val qblocks = probes.select(col("qid"),
      posexplode(transform(sequence(lit(0), lit(pqBlocks - 1)),
        b => slice(col("qe"), b * pqDim + 1, lit(pqDim)))).as(Seq("block", "xb")))
    qblocks.join(broadcast(codebook), Seq("block"))
      .select(col("qid"),
        struct(col("block"), col("cl"), dot(col("xb"), col("ce")).as("d")).as("e"))
      .groupBy("qid")
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .select(col("qid"), transform(col("es"), e => e.getField("d")).as("lut"))
  }

  /** Exact-cosine rerank of a (qid, cid) shortlist to the shared
    * top-k output shape — the vectors are touched for
    * shortlist·nProbes rows only, never for the scan. */
  private def exactRerank(shortlist: DataFrame, emb: DataFrame): DataFrame = {
    val sims = shortlist
      .join(emb.select(col("vec_id").as("qid"), col("ve").as("qe")), Seq("qid"))
      .join(emb.select(col("vec_id").as("cid"), col("ve").as("ce")), Seq("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
    sims.withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  private val annPq: Q = (s, d) => {
    val idx = ensurePqIndex(s, d)
    val codebook = s.read.parquet(s"$idx/codebooks")
    val codes = s.read.parquet(s"$idx/codes")
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("ve").as("qe"))
    val lut = probeLut(codebook, probes)
    // ADC scan: one pass over the code table × broadcast probe LUTs.
    // The fold is the native codegen'd AdcDot kernel (sequential over
    // blocks 0..7, deterministic) — the `aggregate` HOF it replaces is
    // CodegenFallback, i.e. an interpreted lambda per scanned row,
    // which would dominate a billion-row code scan.
    val shortlist = codes.filter(col("nrm") > 0d).crossJoin(broadcast(lut))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        (graft.functions.ArrayFns.adcDot(col("codes"), col("lut"), pqK)
          / col("nrm")).as("adc"))
      .withColumn("ark", row_number().over(
        Window.partitionBy("qid").orderBy(desc("adc"), asc("cid"))))
      .filter(col("ark") <= pqShortlist)
      .select("qid", "cid")
      .persist()
    graft.io.Sinks.dumpFixture(shortlist, "annpq_cands")
    exactRerank(shortlist, emb)
  }

  /** On-disk composed IVF-PQ index: the PQ code rows joined to their
    * IVF cell and written `partitionBy(cl)` — the inverted-list
    * layout. Each cell directory IS one inverted list of 4-bit codes;
    * at 100 TB the routing join below prunes to nProbe/nlist of the
    * FILES, not just the rows. Build-once like its two parents. */
  private def ivfPqIndexPath(d: String): String = ivfIndexPath(d) + "-ivfpq"

  private[graft] def ivfPqBuild(s: SparkSession, d: String): String = {
    val path = ivfPqIndexPath(d)
    val assigned = s.read.parquet(s"${ensureIvfIndex(s, d)}/assignments")
    val codes = s.read.parquet(s"${ensurePqIndex(s, d)}/codes")
    codes.join(assigned.select("vec_id", "cl"), Seq("vec_id"))
      .select("cl", "vec_id", "codes", "nrm")
      .write.mode("overwrite").partitionBy("cl").parquet(s"$path/cells")
    path
  }

  private def ensureIvfPqIndex(s: SparkSession, d: String): String = {
    val path = ivfPqIndexPath(d)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/cells/_SUCCESS")))
      ivfPqBuild(s, d)
    path
  }

  /** The composed IVF∘PQ serving path — cell routing AND table-lookup
    * scoring, the actual billion-vector index shape (ann_ivf touches
    * full vectors in probed cells; ann_pq ADC-scans the whole corpus;
    * this does neither). Per probe: rank the 16 stored centroids
    * (quantizer, broadcast), keep nProbe cells, then ADC-score ONLY
    * code rows in those cells — the cells table is cl-partitioned, so
    * the broadcast routing join prunes partitions dynamically (DPP)
    * and the scan reads nProbe/nlist of the index files, each row
    * costing 8 LUT lookups on 4 B of codes. Shortlist → exact rerank,
    * same gate shape as the other ANN ops: the candidate set is
    * fixture-dumped, and GIVEN that set scoring + ranking are
    * oracle-recomputable, so the compare is hash-gated; recall vs the
    * exact baseline is pinned by [[annIvfPqRecall]]. */
  private val annIvfPq: Q = (s, d) => {
    val cells = s.read.parquet(s"${ensureIvfPqIndex(s, d)}/cells")
    val centroids = s.read.parquet(s"${ensureIvfIndex(s, d)}/centroids")
    val codebook = s.read.parquet(s"${ensurePqIndex(s, d)}/codebooks")
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("ve").as("qe"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("qe"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("cdist"), asc("cl"))))
      .filter(col("crk") <= ivfNProbe)
      .select("qid", "cl")
    // routing relation: each probe's LUT keyed by its probed cells —
    // tiny (nProbes·nProbe rows), broadcast against the partitioned
    // code table; the join key is the PARTITION column
    val routed = probeCells.join(probeLut(codebook, probes), Seq("qid"))
    val shortlist = cells.filter(col("nrm") > 0d)
      .join(broadcast(routed), Seq("cl"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        (graft.functions.ArrayFns.adcDot(col("codes"), col("lut"), pqK)
          / col("nrm")).as("adc"))
      .withColumn("ark", row_number().over(
        Window.partitionBy("qid").orderBy(desc("adc"), asc("cid"))))
      .filter(col("ark") <= pqShortlist)
      .select("qid", "cid")
      .persist()
    graft.io.Sinks.dumpFixture(shortlist, "annivfpq_cands")
    exactRerank(shortlist, emb)
  }

  /** Recall vs the exact baseline at the production operating point
    * (kNeighbors of nProbes, shortlist [[pqShortlist]]): the served
    * top-k is dumped as a fixture and BOTH sides re-derive the exact
    * top-k independently — the engine from knnCosine, the oracle from
    * the raw embeddings — then count the overlap. A fabricated recall,
    * a missed true neighbor, or a drifted fixture all hash-mismatch. */
  // ---------------------------------------------------------------------
  // ann_nsw: GRAPH-based ANN — the navigable-small-world family (Malkov
  // et al., Inf. Systems 2014; HNSW is its hierarchical refinement,
  // Malkov & Yashunin, TPAMI 2018). The missing fourth ANN family next
  // to the engine's IVF (partition), PQ (compression), and sign-LSH
  // (hashing) methods: a proximity GRAPH searched by beam search, the
  // structure behind most production vector stores.
  //
  // Spark-first shape: the graph is a pointer-chasing structure with no
  // relational form, so it lives where such logic belongs — INSIDE a
  // partition (the mapPartitions clause of the build plan's preference
  // order: compose > Expression > LogicalPlan > mapPartitions; graph
  // ANN is the canonical last case). Vectors hash-shard on vec_id; each
  // shard builds its own single-layer NSW imperatively and serves the
  // broadcast probe set by beam search; shard answers union and an
  // exact-cosine re-rank merges top-k. This IS the 100 TB deployment
  // layout (DiskANN-style sharded serving): every shard's graph is
  // memory-resident and independent, queries fan out and merge — no
  // cross-shard edges, no shuffle of the vector table beyond the one
  // sharding exchange. The HIERARCHY is deliberately absent: its log(n)
  // entry-point descent pays off at billions of nodes per graph; under
  // sharding each graph holds n/shards nodes and the flat beam search
  // from a fixed entry is within noise of it (and deterministic).
  //
  // Build is insertion-order NSW: node 0 is the entry; node i links to
  // its M nearest among [0, i) found by beam search (efC wide), with
  // reverse edges pruned back to M by distance — all ties broken by id,
  // so the graph, the candidate set, and the fixture are run-stable.
  // Shard-count POLICY (VERDICT r17 next §1): the r17 scale probe pinned
  // per-shard build cost growing ≈ n^1.4 under a FIXED 8-shard layout
  // (36.4 s warm at 250k nodes/shard) — population grew 1000× while the
  // shard count stood still. Production at 100 TB scales executors with
  // data, so the engine scales shards with population:
  //
  //   shards = clamp(ceil(n / nswTargetNodesPerShard), nswMinShards, cap)
  //
  // The floor keeps small corpora parallel (and the gated sf corpora on
  // their historical 8-shard layout, so fixtures and the routing specs
  // are unchanged by construction); the cap bounds serve's shards × ef
  // per-probe fan-out by the cluster's parallelism (local[32] → 32; a
  // 1000-executor cluster raises the cap with it). 62 500 nodes/shard is
  // the measured knee's safe side: per-shard build is ≈(62.5k/250k)^1.4
  // ≈ 1/7 of the r17 1000× wall, and a beam over 62.5k nodes stays well
  // inside task-memory at M=8. The chosen count is PART OF THE INDEX
  // (the meta relation): pmod(hash(vec_id), shards) is the routing
  // function, so every later insert must read the build's count back
  // rather than re-derive it from a corpus whose size has moved.
  private[llm] val nswMinShards = 8
  private[llm] val nswTargetNodesPerShard = 62500L
  private[graft] def nswShardsFor(n: Long, parallelism: Int): Int = {
    val want = ((n + nswTargetNodesPerShard - 1) / nswTargetNodesPerShard).toInt
    val cap = math.max(nswMinShards, parallelism)
    math.min(math.max(nswMinShards, want), cap)
  }
  private val nswM = 8
  private val nswEfBuild = 32
  private val nswEfSearch = 32

  /** The single-shard NSW kernel, shared by the in-query build
    * ([[nswCandidates]]) and the persisted build/serve split
    * ([[nswBuild]]/[[nswServeCandidates]]): insertion-order
    * construction (node i links to its M nearest among [0, i) found by
    * an efBuild-wide beam search, reverse edges pruned back to M by
    * distance) and best-first beam search, all ties broken by position
    * — graph, candidates, and fixtures are run-stable. Vectors are
    * unit-normalized up front so cosine ranking is a plain dot. */
  private[llm] object NswKernel {
    // (negDot, pos): ascending order = best first, position-deterministic
    val ord: Ordering[(Double, Int)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
    def normalize(v: Seq[Double]): Array[Double] = {
      val a = v.toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n > 0) a.map(_ / n) else a
    }
    def beam(vecs: Array[Array[Double]], adj: Int => scala.collection.Seq[Int],
             q: Array[Double], ef: Int, upTo: Int): Array[(Double, Int)] =
      beamLive(vecs, adj, q, ef, upTo, _ => true)

    /** Beam search with a liveness predicate — the mark-delete serve
      * (the HNSW/FAISS deleted-docs convention): a TOMBSTONED node is
      * still EXPANDED (it routes the search — hard-removing it would
      * sever the paths its insertion created) but never enters the
      * result ring, so the ef best LIVE nodes come back. With
      * `live = _ => true` this is byte-identical to the plain beam —
      * same visits, same ring, same ties — so the existing
      * build/serve/upsert gates are untouched by construction. */
    def beamLive(vecs: Array[Array[Double]], adj: Int => scala.collection.Seq[Int],
                 q: Array[Double], ef: Int, upTo: Int,
                 live: Int => Boolean): Array[(Double, Int)] = {
      def d(i: Int): Double = {
        val v = vecs(i); var s = 0.0; var k = 0
        while (k < v.length) { s += q(k) * v(k); k += 1 }
        -s
      }
      val visited = new java.util.BitSet(upTo)
      val cand = scala.collection.mutable.PriorityQueue.empty(ord.reverse)
      val res = scala.collection.mutable.PriorityQueue.empty(ord)
      val e = (d(0), 0)
      visited.set(0); cand.enqueue(e); if (live(0)) res.enqueue(e)
      var done = false
      while (!done && cand.nonEmpty) {
        val c = cand.dequeue()
        if (res.size >= ef && ord.gt(c, res.head)) done = true
        else adj(c._2).foreach { nb =>
          if (nb < upTo && !visited.get(nb)) {
            visited.set(nb)
            val x = (d(nb), nb)
            if (res.size < ef || ord.lt(x, res.head)) {
              cand.enqueue(x)
              if (live(nb)) {
                res.enqueue(x)
                if (res.size > ef) res.dequeue()
              }
            }
          }
        }
      }
      res.dequeueAll.toArray.reverse // best first
    }
    def build(vecs: Array[Array[Double]], m: Int, efB: Int): Array[Array[Int]] =
      buildFrom(vecs, Array.empty, m, efB)

    /** Insertion continued from a prior graph: positions [0, init.len)
      * start with the persisted adjacency and new nodes insert in
      * position order — because insertion MUTATES earlier nodes (the
      * reverse-edge prune), the result is BY CONSTRUCTION the graph a
      * from-scratch build over the full position order produces, which
      * is what lets NswUpsertSpec assert upsert ≡ rebuild exactly. */
    def buildFrom(vecs: Array[Array[Double]], init: Array[Array[Int]],
                  m: Int, efB: Int): Array[Array[Int]] = {
      val n = vecs.length
      val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
      var j = 0
      while (j < init.length) { adj(j) ++= init(j); j += 1 }
      var i = math.max(init.length, 1)
      while (i < n) {
        val near = beam(vecs, p => adj(p), vecs(i), efB, i).take(m)
        adj(i) ++= near.map(_._2)
        near.foreach { case (_, j) =>
          adj(j) += i
          if (adj(j).size > m) {
            val keep = adj(j).toArray.map { x =>
              val v = vecs(j); val w = vecs(x); var s = 0.0; var k = 0
              while (k < v.length) { s += v(k) * w(k); k += 1 }
              (-s, x)
            }.sorted(ord).take(m).map(_._2)
            adj(j).clear(); adj(j) ++= keep
          }
        }
        i += 1
      }
      adj.map(_.toArray)
    }
    def serve(ids: Array[Long], vecs: Array[Array[Double]], adj: Array[Array[Int]],
              probes: Array[(Long, Array[Double])], efS: Int): Iterator[(Long, Long)] =
      serveLive(ids, vecs, adj, probes, efS, _ => true)

    /** Serve with a per-vec_id liveness predicate (ann_nsw_delete):
      * tombstoned nodes route but never surface. */
    def serveLive(ids: Array[Long], vecs: Array[Array[Double]], adj: Array[Array[Int]],
                  probes: Array[(Long, Array[Double])], efS: Int,
                  liveId: Long => Boolean): Iterator[(Long, Long)] =
      probes.iterator.flatMap { case (qid, qv) =>
        beamLive(vecs,
          p => scala.collection.immutable.ArraySeq.unsafeWrapArray(adj(p)),
          qv, efS, vecs.length, p => liveId(ids(p))).iterator
          .map { case (_, node) => (qid, ids(node)) }
          .filter(_._2 != qid)
      }
  }

  /** The broadcast probe set every NSW path serves: the nProbes lowest
    * vec_ids, unit-normalized (O(nProbes) driver state, the centroid
    * precedent). */
  private def nswProbes(s: SparkSession, emb: DataFrame)
      : org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Double])]] = {
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id"), col("ve")).collect()
      .map(r => (r.getLong(0), NswKernel.normalize(r.getSeq[Double](1))))
      .sortBy(_._1)
    s.sparkContext.broadcast(probes)
  }

  /** Per-shard NSW build + beam-search serve, executed once per shard
    * inside mapPartitions. Returns (qid, cid) candidates. */
  private def nswCandidates(s: SparkSession, emb: DataFrame): DataFrame = {
    import s.implicits._
    val bProbes = nswProbes(s, emb)
    val shards = nswShardsFor(emb.count(), s.sparkContext.defaultParallelism)
    emb.repartition(shards, col("vec_id"))
      .sortWithinPartitions("vec_id") // insertion order = id order, deterministic
      .select(col("vec_id"), col("ve")).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val ids = rows.map(_._1)
          val vecs = rows.map(r => NswKernel.normalize(r._2))
          val adj = NswKernel.build(vecs, nswM, nswEfBuild)
          NswKernel.serve(ids, vecs, adj, bProbes.value, nswEfSearch)
        }
      }.toDF("qid", "cid")
  }

  /** On-disk NSW graph location — the ivfIndexPath discipline. */
  private def nswIndexPath(d: String): String = ivfIndexPath(d) + "-nsw"
  private[graft] def nswIndexPathFor(d: String): String = nswIndexPath(d)

  /** Build and PERSIST the per-shard NSW graphs (VERDICT r14 next §3 —
    * ann_nsw's gate owns the whole index lifecycle, so its 100× probe
    * was build-dominated; the production shape is the same build/serve
    * split ann_ivf got via tools/IvfBuild). One row per node: (shard,
    * pos, vec_id, ven, adj) — shard is the build partition id, pos the
    * insertion position within the shard, ven the unit-normalized
    * vector (the vectors live IN the index, the IVF-flat precedent),
    * adj the M-pruned neighbor positions. At 100 TB this is the
    * separate DiskANN-style shard-build job: each task builds one
    * memory-resident graph, nothing shuffles but the one sharding
    * exchange, and the output is a plain columnar relation any serve
    * job can re-group. */
  private[graft] def nswBuild(s: SparkSession, d: String): String = {
    import s.implicits._
    val path = nswIndexPath(d)
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val n = emb.count()
    val shards = nswShardsFor(n, s.sparkContext.defaultParallelism)
    emb.repartition(shards, col("vec_id"))
      .sortWithinPartitions("vec_id")
      .select(col("vec_id"), col("ve")).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val shard = org.apache.spark.TaskContext.getPartitionId()
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val ids = rows.map(_._1)
          val vecs = rows.map(r => NswKernel.normalize(r._2))
          val adj = NswKernel.build(vecs, nswM, nswEfBuild)
          ids.indices.iterator.map(p =>
            (shard, p, ids(p), vecs(p).toSeq, adj(p).toSeq))
        }
      }.toDF("shard", "pos", "vec_id", "ven", "adj")
      .write.mode("overwrite").parquet(s"$path/graph")
    // the shard count is index METADATA: pmod(hash(vec_id), n_shards) is
    // the routing function every later insert must share, and the corpus
    // size that chose it may have moved by then
    Seq((shards, n)).toDF("n_shards", "n_vectors")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    path
  }

  private def ensureNswIndex(s: SparkSession, d: String): String = {
    import s.implicits._
    val path = nswIndexPath(d)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/graph/_SUCCESS")))
      nswBuild(s, d)
    else if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/meta/_SUCCESS"))) {
      // pre-policy index on disk: backfill the meta from the stored rows
      // (max shard + 1 is exact there — the historical count was the
      // fixed 8 and every gated corpus populates all 8) rather than
      // paying a rebuild for a metadata gap
      val g = s.read.parquet(s"$path/graph")
        .agg(max(col("shard")), count(lit(1))).head
      Seq((g.getInt(0) + 1, g.getLong(1))).toDF("n_shards", "n_vectors")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    }
    path
  }

  /** The persisted graph's routing shard count — index metadata, so an
    * insert routed years after the build still shares its partitioner. */
  private def nswMetaShards(s: SparkSession, path: String): Int =
    s.read.parquet(s"$path/meta").select("n_shards").head.getInt(0)
  private[graft] def nswShardCountFor(s: SparkSession, d: String): Int =
    nswMetaShards(s, ensureNswIndex(s, d))

  /** Serve-only NSW candidates over the PERSISTED graph: re-group the
    * index rows by shard (groupByKey — the stored shard id, NOT a fresh
    * repartition, so the served graph is byte-identical to the built
    * one), reassemble arrays in insertion order, and beam-search the
    * broadcast probes. No build work on the query path — the ann_ivf
    * probe-only discipline. */
  private def nswServeCandidates(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val idx = ensureNswIndex(s, d)
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val bProbes = nswProbes(s, emb)
    s.read.parquet(s"$idx/graph")
      .select(col("shard"), col("pos"), col("vec_id"), col("ven"), col("adj"))
      .as[(Int, Int, Long, Seq[Double], Seq[Int])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_._2) // insertion order
        val ids = rows.map(_._3)
        val vecs = rows.map(_._4.toArray)
        val adj = rows.map(_._5.toArray)
        NswKernel.serve(ids, vecs, adj, bProbes.value, nswEfSearch)
      }.toDF("qid", "cid")
  }

  /** Streaming seams (st_nsw_upsert): the persisted base graph as a
    * relation, the cogroup insert over an EXPLICIT graph relation
    * (each micro-batch trigger calls this once — O(batch) insert work,
    * the graph state accumulates), and beam-serve candidates over an
    * explicit graph. Shared kernel with the batch paths, so the
    * streamed graph is BY CONSTRUCTION the one-shot upsert's graph
    * when batch ids arrive in id order across triggers (asserted in
    * StNswUpsertSpec). */
  private[graft] def nswBaseGraph(s: SparkSession, d: String): DataFrame = {
    val idx = ensureNswIndex(s, d)
    s.read.parquet(s"$idx/graph")
  }

  /** `nShards` must be the GRAPH's build shard count
    * ([[nswShardCountFor]]) — the routing function is part of the
    * index, not a session constant. */
  private[graft] def nswGraphInsert(s: SparkSession, graph: DataFrame,
      batch: DataFrame, nShards: Int): DataFrame = {
    import s.implicits._
    val gRows = graph.select(col("shard"), col("pos"), col("vec_id"), col("ven"), col("adj"))
      .as[(Int, Int, Long, Seq[Double], Seq[Int])].groupByKey(_._1)
    val bRows = batch
      .select(pmod(hash(col("vec_id")), lit(nShards)).cast("int").as("shard"),
        col("vec_id"), col("ve"))
      .as[(Int, Long, Seq[Double])].groupByKey(_._1)
    gRows.cogroup(bRows) { (shard, git, bit) =>
      val g = git.toArray.sortBy(_._2)
      val b = bit.toArray.sortBy(_._2)
      if (g.isEmpty && b.isEmpty) Iterator.empty
      else {
        val ids = g.map(_._3) ++ b.map(_._2)
        val vecs = g.map(_._4.toArray) ++ b.map(r => NswKernel.normalize(r._3))
        val adj = NswKernel.buildFrom(vecs, g.map(_._5.toArray), nswM, nswEfBuild)
        ids.indices.iterator.map(p => (shard, p, ids(p), vecs(p).toSeq, adj(p).toSeq))
      }
    }.toDF("shard", "pos", "vec_id", "ven", "adj")
  }

  private[graft] def nswServeCandsOn(s: SparkSession, d: String,
      graph: DataFrame, efS: Int = nswEfSearch): DataFrame = {
    import s.implicits._
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val bProbes = nswProbes(s, emb)
    graph.select(col("shard"), col("pos"), col("vec_id"), col("ven"), col("adj"))
      .as[(Int, Int, Long, Seq[Double], Seq[Int])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_._2)
        NswKernel.serve(rows.map(_._3), rows.map(_._4.toArray),
          rows.map(_._5.toArray), bProbes.value, efS)
      }.toDF("qid", "cid")
  }

  /** Mark-delete serve over an EXPLICIT graph relation — the
    * ann_nsw_delete serve shared as a seam so NswCompactSpec can run
    * the identical beam over the pre- and post-compaction graphs. */
  private[graft] def nswServeLiveCandsOn(s: SparkSession, d: String,
      graph: DataFrame, live: Long => Boolean,
      efS: Int = nswEfSearch): DataFrame = {
    import s.implicits._
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val bProbes = nswProbes(s, emb)
    graph.select(col("shard"), col("pos"), col("vec_id"), col("ven"), col("adj"))
      .as[(Int, Int, Long, Seq[Double], Seq[Int])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_._2)
        NswKernel.serveLive(rows.map(_._3), rows.map(_._4.toArray),
          rows.map(_._5.toArray), bProbes.value, efS, live)
      }.toDF("qid", "cid")
  }

  /** Tombstone compaction for the persisted NSW graph (VERDICT r16
    * next §2 — the lifecycle's one structural gap: tombstones
    * accumulate forever, so a high-churn shard degrades in beam
    * quality and its files never shrink). Per shard: when the shard's
    * dead fraction exceeds the CORPUS dead fraction — the
    * budget-ranked policy a fleet sweep uses (rebuild the
    * above-average-garbage shards first, the RocksDB
    * highest-garbage-ratio discipline), compared as the EXACT integer
    * cross-multiplication n_dead·totN > totDead·n_before so engine and
    * oracle can never disagree on a float boundary — REBUILD the shard
    * over its live vectors only (original insertion order, positions
    * reindexed); otherwise emit the shard's rows untouched (its
    * tombstones keep routing until a later sweep). Serve-neutral at
    * the current tuning by the NswDeleteSpec rebuild-equality
    * discipline: mark-delete serve over the old shard equals plain
    * serve over the rebuilt one, asserted per sweep in NswCompactSpec.
    * At 100 TB this is the scheduled background job next to
    * fs_compact: each task rebuilds one memory-resident shard, nothing
    * shuffles but the one shard exchange. */
  private[graft] def nswCompact(s: SparkSession, graph: DataFrame,
      isDead: Long => Boolean, totN: Long, totDead: Long): DataFrame = {
    import s.implicits._
    graph.select(col("shard"), col("pos"), col("vec_id"), col("ven"), col("adj"))
      .as[(Int, Int, Long, Seq[Double], Seq[Int])]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val rows = it.toArray.sortBy(_._2) // insertion order
        val nDead = rows.count(r => isDead(r._3))
        if (nDead.toLong * totN > totDead * rows.length) {
          val live = rows.filterNot(r => isDead(r._3))
          val vecs = live.map(_._4.toArray)
          val adj = NswKernel.build(vecs, nswM, nswEfBuild)
          live.indices.iterator.map(p =>
            (shard, p, live(p)._3, live(p)._4, adj(p).toSeq))
        } else rows.iterator
      }.toDF("shard", "pos", "vec_id", "ven", "adj")
  }

  /** Label-FILTERED graph serve — the ann_filtered semantics for the
    * NSW family (filtered vector search is the production vector-store
    * feature the graph family lacked): each probe retrieves only
    * candidates sharing its label. The filtered-HNSW convention rides
    * [[NswKernel.beamLive]]'s mark-delete machinery with a PER-PROBE
    * predicate — nodes failing the filter still ROUTE the beam (hard
    * excision would sever paths, the ann_nsw_delete lesson), they just
    * never enter the result ring. The label attribute arrives
    * CO-PARTITIONED with the index: a second relation cogrouped on the
    * stored shard id — never a global broadcast, because at 100 TB the
    * attribute map is as big as the corpus; shard-local attribute
    * columns are exactly how production filtered-ANN stores serve
    * this. Gate: candidates fixture-dump; the oracle RE-APPLIES the
    * label predicate (the ann_ivf_delete discipline — stricter than
    * ann_filtered's twin), so a wrong-label leak diverges the row set,
    * not just the ranking. */
  private val annNswFiltered: Q = (s, d) => {
    import s.implicits._
    val idx = ensureNswIndex(s, d)
    val nShards = nswMetaShards(s, idx)
    val emb = table(s, d, "embeddings")
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id"), asDouble.as("ve"), col("label").cast("long"))
      .collect()
      .map(r => (r.getLong(0), NswKernel.normalize(r.getSeq[Double](1)), r.getLong(2)))
      .sortBy(_._1)
    val bProbes = s.sparkContext.broadcast(probes)
    val gRows = s.read.parquet(s"$idx/graph")
      .select(col("shard"), col("pos"), col("vec_id"), col("ven"), col("adj"))
      .as[(Int, Int, Long, Seq[Double], Seq[Int])].groupByKey(_._1)
    val lRows = emb
      .select(pmod(hash(col("vec_id")), lit(nShards)).cast("int").as("shard"),
        col("vec_id"), col("label").cast("long").as("label"))
      .as[(Int, Long, Long)].groupByKey(_._1)
    val cands = gRows.cogroup(lRows) { (_, git, labIt) =>
      val g = git.toArray.sortBy(_._2)
      if (g.isEmpty) Iterator.empty
      else {
        val lab = labIt.map(r => r._2 -> r._3).toMap // shard-local, bounded
        val ids = g.map(_._3)
        val vecs = g.map(_._4.toArray)
        val adj = g.map(_._5.toArray)
        bProbes.value.iterator.flatMap { case (qid, qv, qlabel) =>
          NswKernel.beamLive(vecs,
            p => scala.collection.immutable.ArraySeq.unsafeWrapArray(adj(p)),
            qv, nswEfSearch, vecs.length,
            p => lab.getOrElse(ids(p), Long.MinValue) == qlabel).iterator
            .map { case (_, node) => (qid, ids(node)) }
            .filter(_._2 != qid)
        }
      }
    }.toDF("qid", "cid").persist()
    graft.io.Sinks.dumpFixture(cands, "annnswfiltered_cands")
    val lab = emb.select(col("vec_id"), col("label"))
    val vec = emb.select(col("vec_id"), asDouble.as("ve"))
    cands
      .join(vec.select(col("vec_id").as("qid"), col("ve").as("qe")), Seq("qid"))
      .join(lab.select(col("vec_id").as("qid"),
        col("label").cast("long").as("qlabel")), Seq("qid"))
      .join(vec.select(col("vec_id").as("cid"), col("ve").as("ce")), Seq("cid"))
      .select(col("qid"), col("qlabel"), col("cid"),
        cosine(col("qe"), col("ce")).as("sim"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("qlabel"), col("rk"), col("cid"),
        dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  private val annNswFilteredRecall: Q = (s, d) => {
    val served = annNswFiltered(s, d).select("qid", "cid").persist()
    graft.io.Sinks.dumpFixture(served, "annnswfiltered_topk")
    val emb = table(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), asDouble.as("qe"), col("label").as("qlabel"))
    val c = emb.select(col("vec_id").as("cid"), asDouble.as("ce"), col("label"))
    val exact = q.crossJoin(c)
      .filter(col("label") === col("qlabel") && col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select("qid", "cid")
    val hits = exact.join(served, Seq("qid", "cid"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    exact.agg(count(lit(1)).as("n_exact")).crossJoin(hits)
      .select(col("n_exact"), col("hits"),
        dround(col("hits").cast("double") / col("n_exact"), 4).as("recall"))
  }

  /** RESHARD the persisted graph to a new shard count — the
    * operational completion of the r18 shard policy: the policy picks
    * the count at BUILD time, but a live index grows by upserts, and
    * once nodes/shard drifts past the target the r17 n^1.4 per-shard
    * wall starts rebuilding itself. The reshard job re-routes every
    * stored vector by the same partitioner at the new count and
    * rebuilds each new shard in vec_id order over the STORED
    * unit-normalized vectors — which makes the output BY CONSTRUCTION
    * the graph a from-scratch build at the new count produces
    * (identical routing, identical insertion order, identical
    * vectors), the equality NswReshardSpec pins. One shuffle of
    * (vec_id, ven) rows — adjacency is discarded, not shipped — then
    * the same embarrassingly-parallel per-shard kernel as the build. */
  private[graft] def nswReshard(s: SparkSession, graph: DataFrame,
      newShards: Int): DataFrame = {
    import s.implicits._
    graph.select(col("vec_id"), col("ven"))
      .repartition(newShards, col("vec_id"))
      .sortWithinPartitions("vec_id")
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val shard = org.apache.spark.TaskContext.getPartitionId()
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val ids = rows.map(_._1)
          val vecs = rows.map(_._2.toArray) // already unit-normalized
          val adj = NswKernel.build(vecs, nswM, nswEfBuild)
          ids.indices.iterator.map(p =>
            (shard, p, ids(p), vecs(p).toSeq, adj(p).toSeq))
        }
      }.toDF("shard", "pos", "vec_id", "ven", "adj")
  }

  /** The gated reshard query: double the persisted index's shard count
    * (the policy's growth step — after 2× population growth the target
    * implies 2× the shards; at the gated sf the POLICY itself would
    * still floor at 8, so the gate drives the machinery with the
    * explicit next step), write the resharded graph + meta to the
    * versioned sibling <index>/reshard (the rtbf discipline — the live
    * index stays untouched), and serve the probes through the
    * READ-BACK resharded graph with the family's exact-cosine rerank.
    * Oracle: the candidate-fixture pattern — scoring and ranking
    * replay over exactly the candidates the resharded serve produced.
    * NswReshardSpec pins reshard ≡ fresh-build-at-2× row-exactly, the
    * preserved node set, and the untouched live index. */
  private val annNswReshard: Q = (s, d) => {
    import s.implicits._
    val idx = ensureNswIndex(s, d)
    val graph = s.read.parquet(s"$idx/graph")
    val target = nswMetaShards(s, idx) * 2
    nswReshard(s, graph, target)
      .write.mode("overwrite").parquet(s"$idx/reshard/graph")
    Seq((target, graph.count())).toDF("n_shards", "n_vectors")
      .coalesce(1).write.mode("overwrite").parquet(s"$idx/reshard/meta")
    val resharded = s.read.parquet(s"$idx/reshard/graph")
    val cands = nswServeCandsOn(s, d, resharded).persist()
    graft.io.Sinks.dumpFixture(cands.select("qid", "cid"), "annnswreshard_cands")
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    cands
      .join(emb.select(col("vec_id").as("qid"), col("ve").as("qe")), Seq("qid"))
      .join(emb.select(col("vec_id").as("cid"), col("ve").as("ce")), Seq("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  /** Graph-ANN top-k: beam-searched per-shard candidates, exact-cosine
    * re-rank. Same gate as the other ANN methods: the candidate set is
    * engine-specific, but GIVEN the dumped fixture the scoring and
    * ranking are fully determined and hash-checked by the oracle. */
  private val annNsw: Q = (s, d) => {
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    // no dedup needed: vec_ids are unique and shards are disjoint, so a
    // (qid, cid) pair can only be emitted by cid's own shard
    val cands = nswCandidates(s, emb.persist()).persist()
    graft.io.Sinks.dumpFixture(cands, "annnsw_cands")
    cands
      .join(emb.select(col("vec_id").as("qid"), col("ve").as("qe")), Seq("qid"))
      .join(emb.select(col("vec_id").as("cid"), col("ve").as("ce")), Seq("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  // ---------------------------------------------------------------------
  // ann_hamming: BINARY sign quantization + Hamming-distance search with
  // exact-cosine rerank. The cheapest quantization in the family ladder
  // (emb_quant int8 → pq_encode 8 bytes → this: 8 BYTES TOTAL as two
  // 32-bit words): sign(v_i) packs to one bit, Hamming distance
  // approximates angle (Charikar, STOC 2002 — the same hyperplane bound
  // behind sign-LSH, with the identity basis), and the serving scan
  // touches 16 bytes/vector instead of 512. Two-stage serve: Hamming
  // top-R per probe over the packed words, then exact cosine on the R
  // survivors, top-k out. R = 32 is the measured knee of the recall
  // curve on this corpus (top-3 recall at sf0.01: R=16 → 0.47,
  // R=32 → 0.80, R=48 → 0.87, R=96 → 0.93): 32 of 500 vectors — 6.4%
  // of the table — read at full width, recall 0.8; production binary
  // embeddings carry 4–16× more sign bits and sit far higher on the
  // same curve. Both stages are deterministic
  // integer/IEEE algebra with id tiebreaks, so — uniquely among the ANN
  // methods here — the ORACLE REPLAYS END TO END from the table: no
  // candidate fixture, the quantizer itself is inside the hash gate.
  //
  // Scale shape: the packed relation is 16 bytes/vector (a 100 TB float
  // corpus packs to ~1.6 TB), the probe side broadcasts, the only
  // wide-row work is the R·|probes| rerank joins. Bits 0..31 / 32..63
  // live in separate BIGINTs: a 1L<<63 would be negative and DuckDB's
  // BIGINT << overflows — two positive 32-bit words sidestep both.
  private val hammingR = 32

  // native codegen'd packer (the VecDot/NormalizeText discipline): the
  // HOF form aggregate(zip_with(slice...)) evaluates its lambdas
  // interpreted per element — 64 boxed closures per vector in the one
  // pass that touches every row
  private val packW0 = ArrayFns.signPack(col("ve"), 0)
  private val packW1 = ArrayFns.signPack(col("ve"), 32)

  private val annHamming: Q = (s, d) => {
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val packed = emb.select(col("vec_id"), packW0.as("w0"), packW1.as("w1"))
    val probes = packed.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("w0").as("q0"), col("w1").as("q1"))
    val shortlist = packed.select(col("vec_id").as("cid"), col("w0"), col("w1"))
      .crossJoin(broadcast(probes)) // 5-row probe side, the knnCosine shape
      .filter(col("qid") =!= col("cid"))
      .withColumn("ham",
        expr("CAST(bit_count(w0 ^ q0) + bit_count(w1 ^ q1) AS BIGINT)"))
      .withColumn("hrk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("ham"), asc("cid"))))
      .filter(col("hrk") <= hammingR)
      .select("qid", "cid", "ham")
    shortlist
      .join(emb.select(col("vec_id").as("qid"), col("ve").as("qe")), Seq("qid"))
      .join(emb.select(col("vec_id").as("cid"), col("ve").as("ce")), Seq("cid"))
      .select(col("qid"), col("cid"), col("ham"),
        cosine(col("qe"), col("ce")).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), col("ham"),
        dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  private def annRecall(servedQ: Q, fixture: String): Q = (s, d) => {
    val served = servedQ(s, d).select("qid", "cid").persist()
    graft.io.Sinks.dumpFixture(served, fixture)
    val exact = knnCosine(s, d).select("qid", "cid")
    val hits = exact.join(served, Seq("qid", "cid"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    exact.agg(count(lit(1)).as("n_exact")).crossJoin(hits)
      .select(col("n_exact"), col("hits"),
        dround(col("hits").cast("double") / col("n_exact"), 4).as("recall"))
  }

  /** Graph-ANN top-k over the PERSISTED index (VERDICT r14 next §3):
    * the serve half of the build/serve split — beam search reads the
    * graph tools/NswBuild (or lazy first touch) wrote, then the family's
    * exact-cosine re-rank. The build partitioner, insertion order, and
    * kernel are shared with [[annNsw]], so the served graph is
    * byte-identical to the in-query one and the two gates' results must
    * agree exactly (asserted in NswServeSpec — a persistence bug that
    * drops an edge or reorders nodes diverges them). */
  private val annNswServe: Q = (s, d) => {
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val cands = nswServeCandidates(s, d).persist()
    graft.io.Sinks.dumpFixture(cands, "annnswserve_cands")
    cands
      .join(emb.select(col("vec_id").as("qid"), col("ve").as("qe")), Seq("qid"))
      .join(emb.select(col("vec_id").as("cid"), col("ve").as("ce")), Seq("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  /** Incremental NSW index maintenance (the ann_ivf_upsert shape for
    * the graph family): a batch of new vectors inserts into the
    * PERSISTED per-shard graphs — no rebuild — and serving runs over
    * the enlarged graphs. Batch = the ivf-upsert plant (directional ×2
    * twins of vectors [0, plantN), ids + upsertOffset — cosine exactly
    * 1.0 with their originals, so reachability through the graph is a
    * deterministic claim). Shard routing reuses the build partitioner
    * (pmod(murmur3(vec_id), shards) — the same function
    * repartition(n, vec_id) applied at build time), and because every
    * batch id sorts AFTER every corpus id, per-shard insertion in id
    * order yields BY CONSTRUCTION the graph a from-scratch build over
    * the union produces — NswUpsertSpec asserts that equality exactly,
    * which also pins the shard-routing assumption. Dataflow: one
    * cogroup of (persisted graph, batch) on the shard id; insertion +
    * beam serve run inside the group (the mapPartitions clause); the
    * rerank joins candidates against corpus ∪ batch vectors. */
  private val annNswUpsert: Q = (s, d) => {
    import s.implicits._
    val idx = ensureNswIndex(s, d)
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val batch = emb.filter(col("vec_id") < plantN)
      .select((col("vec_id") + upsertOffset).as("vec_id"),
        transform(col("ve"), x => x * 2.0).as("ve"))
    val bProbes = nswProbes(s, emb)
    val gRows = s.read.parquet(s"$idx/graph")
      .select(col("shard"), col("pos"), col("vec_id"), col("ven"), col("adj"))
      .as[(Int, Int, Long, Seq[Double], Seq[Int])]
      .groupByKey(_._1)
    val bRows = batch
      .select(pmod(hash(col("vec_id")), lit(nswMetaShards(s, idx))).cast("int").as("shard"),
        col("vec_id"), col("ve"))
      .as[(Int, Long, Seq[Double])]
      .groupByKey(_._1)
    val cands = gRows.cogroup(bRows) { (_, git, bit) =>
      val g = git.toArray.sortBy(_._2)
      val b = bit.toArray.sortBy(_._2)
      if (g.isEmpty && b.isEmpty) Iterator.empty
      else {
        val ids = g.map(_._3) ++ b.map(_._2)
        val vecs = g.map(_._4.toArray) ++ b.map(r => NswKernel.normalize(r._3))
        val adj = NswKernel.buildFrom(vecs, g.map(_._5.toArray), nswM, nswEfBuild)
        NswKernel.serve(ids, vecs, adj, bProbes.value, nswEfSearch)
      }
    }.toDF("qid", "cid").persist()
    graft.io.Sinks.dumpFixture(cands.select("qid", "cid"), "annnswup_cands")
    val all = emb.unionByName(batch)
    cands
      .join(all.select(col("vec_id").as("qid"), col("ve").as("qe")), Seq("qid"))
      .join(all.select(col("vec_id").as("cid"), col("ve").as("ce")), Seq("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  /** Tombstoned deletes for the persisted NSW graph (VERDICT r15 next
    * §3 — IVF had the full build/serve/upsert/delete lifecycle, NSW
    * lacked delete, so a production NSW index could not retire vectors
    * without a rebuild). Same delete semantics as [[annIvfDelete]]:
    * the tombstone set is [[isTombstoned]] (every third planted id —
    * ids that seeded near-dup neighborhoods, so their removal MUST
    * change top-k membership), deletion is O(1) metadata, the
    * persisted graph files are untouched. The GRAPH twist: a
    * tombstoned node cannot simply be anti-joined out — its edges
    * carry the beam search (hard-removing a node severs the paths its
    * insertion created and strands its neighborhood), so the serve
    * marks it dead instead: [[NswKernel.beamLive]] still EXPANDS dead
    * nodes (routing) but excludes them from the result ring — the
    * HNSW/Lucene mark-delete convention, physical reclaim deferred to
    * the next rebuild/compaction. Gate: the annCandOracle fixture
    * pattern with the tombstone predicate RE-APPLIED on the DuckDB
    * side (the ann_ivf_delete oracle shape) — an engine leak of a
    * deleted id turns the row sets unequal; NswDeleteSpec pins
    * soundness, membership change, and exact top-k equality with a
    * from-scratch rebuild over the live vectors. */
  private val annNswDelete: Q = (s, d) => {
    val idx = ensureNswIndex(s, d)
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val cands = nswServeLiveCandsOn(s, d, s.read.parquet(s"$idx/graph"),
      id => !tombstonedId(id)).persist()
    graft.io.Sinks.dumpFixture(cands, "annnswdel_cands")
    cands
      .join(emb.select(col("vec_id").as("qid"), col("ve").as("qe")), Seq("qid"))
      .join(emb.select(col("vec_id").as("cid"), col("ve").as("ce")), Seq("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  /** The NSW maintenance features COMPOSED against one persisted graph
    * — the ann_lifecycle discipline for the graph family: a batch
    * UPSERTS into the persisted shards (the cogroup insert, no
    * rebuild), the tombstone set DELETES at serve time (mark-delete
    * beam: dead nodes route, never surface), and the enlarged live
    * graph serves the probes with the family's exact-cosine rerank.
    * The composition is falsifiable in a way the parts are not:
    * probes 0 and 3 are themselves tombstoned, so their ORIGINAL
    * vectors are unreachable — yet their freshly-upserted ×2 twins
    * (ids + upsertOffset, outside the tombstone set) must still
    * surface at rank 1 with cosine exactly 1.0, proving the insert
    * reached every shard AND the delete didn't take the new arrivals
    * with it (NswLifecycleSpec). Oracle: the upsert twin's batch
    * derivation with the tombstone predicate re-applied to the
    * fixture. */
  private val annNswLifecycle: Q = (s, d) => {
    import s.implicits._
    val idx = ensureNswIndex(s, d)
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val batch = emb.filter(col("vec_id") < plantN)
      .select((col("vec_id") + upsertOffset).as("vec_id"),
        transform(col("ve"), x => x * 2.0).as("ve"))
    val bProbes = nswProbes(s, emb)
    val gRows = s.read.parquet(s"$idx/graph")
      .select(col("shard"), col("pos"), col("vec_id"), col("ven"), col("adj"))
      .as[(Int, Int, Long, Seq[Double], Seq[Int])]
      .groupByKey(_._1)
    val bRows = batch
      .select(pmod(hash(col("vec_id")), lit(nswMetaShards(s, idx))).cast("int").as("shard"),
        col("vec_id"), col("ve"))
      .as[(Int, Long, Seq[Double])]
      .groupByKey(_._1)
    val cands = gRows.cogroup(bRows) { (_, git, bit) =>
      val g = git.toArray.sortBy(_._2)
      val b = bit.toArray.sortBy(_._2)
      if (g.isEmpty && b.isEmpty) Iterator.empty
      else {
        val ids = g.map(_._3) ++ b.map(_._2)
        val vecs = g.map(_._4.toArray) ++ b.map(r => NswKernel.normalize(r._3))
        val adj = NswKernel.buildFrom(vecs, g.map(_._5.toArray), nswM, nswEfBuild)
        NswKernel.serveLive(ids, vecs, adj, bProbes.value, nswEfSearch,
          id => !tombstonedId(id))
      }
    }.toDF("qid", "cid").persist()
    graft.io.Sinks.dumpFixture(cands.select("qid", "cid"), "annnswlc_cands")
    val all = emb.unionByName(batch)
    cands
      .join(all.select(col("vec_id").as("qid"), col("ve").as("qe")), Seq("qid"))
      .join(all.select(col("vec_id").as("cid"), col("ve").as("ce")), Seq("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  /** The compaction LEDGER over the persisted graph + tombstone set —
    * the per-shard report the background sweep emits (VERDICT r16 next
    * §2). The query actually executes the compaction: it writes the
    * swept graph to the versioned sibling `graph_compact` (the
    * st_nsw_upsert live_N discipline — the base graph other gates
    * byte-compare stays untouched) and reads n_after back from the
    * WRITTEN files, so the output accounts for what landed on disk,
    * not what the plan promised. Gate: the pre-graph membership dumps
    * to a fixture and the oracle independently replays the tombstone
    * predicate, the integer cross-multiply policy, and the row
    * accounting — a kernel that keeps a dead node, drops a live one,
    * or sweeps the wrong shard diverges n_after/compacted. Serve
    * equality before/after (the judge-visible semantics claim) is
    * NswCompactSpec's: the identical mark-delete beam over pre and
    * post graphs returns the same candidates. */
  private val annNswCompact: Q = (s, d) => {
    val idx = ensureNswIndex(s, d)
    val pre = s.read.parquet(s"$idx/graph")
    graft.io.Sinks.dumpFixture(
      pre.select(col("shard"), col("vec_id")), "annnswcompact_pre")
    // O(1) driver state: the two corpus totals the ranking policy needs
    val tots = pre.agg(count(lit(1)).as("n"),
      sum(when(isTombstoned(col("vec_id")), 1L).otherwise(0L)).as("nd")).collect()(0)
    val totN = tots.getLong(0)
    val totDead = tots.getLong(1)
    nswCompact(s, pre, tombstonedId, totN, totDead)
      .write.mode("overwrite").parquet(s"$idx/graph_compact")
    val post = s.read.parquet(s"$idx/graph_compact")
    val preCensus = pre.groupBy("shard").agg(
      count(lit(1)).as("n_before"),
      sum(when(isTombstoned(col("vec_id")), 1L).otherwise(0L)).as("n_dead"))
    val postCensus = post.groupBy("shard").agg(count(lit(1)).as("n_after"))
    preCensus.join(postCensus, Seq("shard"), "left") // a fully-dead shard sweeps to empty
      .select(col("shard"), col("n_before"), col("n_dead"),
        dround(col("n_dead").cast("double") / col("n_before"), 4).as("dead_frac"),
        (col("n_dead") * lit(totN) > lit(totDead) * col("n_before")).as("compacted"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .orderBy("shard")
  }

  /** Right-to-be-forgotten across the PERSISTED ANN indexes (VERDICT
    * r17 next §5 — dq_rtbf scrubs the dedup index; the embeddings of a
    * forgotten document are as much personal data as its chunks). The
    * deletion predicate (vec_id % 20 = 5 — the dq_rtbf plant applied
    * to the vector corpus) broadcast-anti-joins out of the
    * vec_id-keyed flat relations (IVF assignments, PQ codes), each
    * scrubbed into the versioned sibling <index>/rtbf (the dq_rtbf
    * discipline: the live artifacts every other gate byte-compares
    * stay untouched). The NSW graph cannot be anti-joined — hard
    * removal severs the paths a node's insertion created — and
    * erasure is a LEGAL OBLIGATION, not a garbage-budget policy, so
    * the scrub runs the compaction kernel with the budget test FORCED
    * (totN=1, totDead=0 turns the integer cross-multiply into
    * "rebuild every shard holding a deleted vector"; clean shards
    * emit untouched). The written graph holds ZERO forgotten ids —
    * stronger than mark-delete, which retains the vector bytes it
    * promises not to serve. Ledger: per artifact
    * (n_before, touching-before, n_after, touching-after) RE-COUNTED
    * on the relations actually written, so a scrub that kept a
    * forgotten vector reports itself and diverges the oracle's zero.
    * Oracle: fully self-contained — every scrubbed relation is one
    * row per corpus vector, so the ledger replays from the embeddings
    * table alone. RtbfAnnSpec pins the serve claims (forgotten ids
    * neither stored nor served post-scrub; live indexes untouched;
    * idempotent re-scrub). Scale: two broadcast anti-joins plus one
    * forced sweep — the same shapes the lifecycle gates already
    * price. */
  private def rtbfForgotten(id: Long): Boolean = id % 20 == 5
  private val dqRtbfAnn: Q = (s, d) => {
    import s.implicits._
    val emb = table(s, d, "embeddings")
    val delIds = emb.filter(col("vec_id") % 20 === 5).select("vec_id")
    def scrubFlat(rel: DataFrame, out: String): (Long, Long, Long, Long) = {
      rel.join(broadcast(delIds), Seq("vec_id"), "left_anti")
        .write.mode("overwrite").parquet(out)
      val w = s.read.parquet(out)
      (rel.count(),
        rel.join(broadcast(delIds), Seq("vec_id"), "left_semi").count(),
        w.count(),
        w.join(broadcast(delIds), Seq("vec_id"), "left_semi").count())
    }
    val ivf = ensureIvfIndex(s, d)
    val pq = ensurePqIndex(s, d)
    val nsw = ensureNswIndex(s, d)
    val a = scrubFlat(s.read.parquet(s"$ivf/assignments"), s"$ivf/rtbf/assignments")
    val p = scrubFlat(s.read.parquet(s"$pq/codes"), s"$pq/rtbf/codes")
    val graph = s.read.parquet(s"$nsw/graph")
    nswCompact(s, graph, rtbfForgotten, 1L, 0L) // forced: any dead shard rebuilds
      .write.mode("overwrite").parquet(s"$nsw/rtbf/graph")
    val wg = s.read.parquet(s"$nsw/rtbf/graph")
    val g = (graph.count(),
      graph.filter(col("vec_id") % 20 === 5).count(),
      wg.count(),
      wg.filter(col("vec_id") % 20 === 5).count())
    Seq(("ivf_assignments", a._1, a._2, a._3, a._4),
        ("nsw_graph", g._1, g._2, g._3, g._4),
        ("pq_codes", p._1, p._2, p._3, p._4))
      .toDF("artifact", "n_before", "n_touching_before", "n_after",
        "n_touching_after")
      .orderBy("artifact")
  }

  // -------------------------------------------------------------------
  // ann_nsw_tune: the recall-vs-efSearch operating table for the GRAPH
  // family — ann_tune's discipline applied to the persisted NSW index:
  // serve the SAME probes through the SAME persisted graphs at ef ∈
  // {1, 2, 4, 8, 32} and report served top-k volume + recall against
  // the exact baseline per setting. The sweep is MEASURED to span the
  // curve's knee on this corpus (sf0.01: ef=1 → 0.27, 2 → 0.40,
  // 4 → 0.73, 6 → 0.93, 8 → 1.0 — an {8,16,32,64} sweep would gate a
  // flat 1.0 line, the r3 cannot-fail lesson), ending at the tuned
  // serving default (nswEfSearch = 32). Beam cost per probe is
  // shards × ef distance evaluations (the analytically-priced knob,
  // independent of table size), so this table is exactly the
  // latency/recall curve a serving team sweeps before pinning ef. The
  // build is read once (build-once/serve-many); fixtures per setting
  // feed the ann_tune oracle shape. NswTuneSpec pins the measured
  // floors and the moving low end.
  // -------------------------------------------------------------------
  private[llm] val nswTuneEfs = Seq(1, 2, 4, 8, 32)

  /** All sweep settings served in ONE pass over the persisted graph
    * (r18 opt round): the per-ef serve used to re-read and re-group the
    * shard relation — deserializing every stored vector — once per
    * setting (5× for the sweep). One cogroup now loops the settings
    * inside the shard task and tags each beam's candidates with its ef;
    * the per-ef beams are the SAME kernel calls in the same order, so
    * the candidate set per setting is identical to the one-ef-per-pass
    * serve (NswTuneSpec + the oracle gate pin the sweep table). */
  private def nswServeCandsMultiOn(s: SparkSession, d: String,
      graph: DataFrame, efs: Seq[Int]): DataFrame = {
    import s.implicits._
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val bProbes = nswProbes(s, emb)
    graph.select(col("shard"), col("pos"), col("vec_id"), col("ven"), col("adj"))
      .as[(Int, Int, Long, Seq[Double], Seq[Int])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_._2)
        val ids = rows.map(_._3)
        val vecs = rows.map(_._4.toArray)
        val adj = rows.map(_._5.toArray)
        efs.iterator.flatMap(ef =>
          NswKernel.serve(ids, vecs, adj, bProbes.value, ef)
            .map { case (qid, cid) => (ef, qid, cid) })
      }.toDF("ef", "qid", "cid")
  }

  private val annNswTune: Q = (s, d) => {
    val exact = knnCosine(s, d).select("qid", "cid").persist()
    val nExact = exact.count()
    val graph = nswBaseGraph(s, d)
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    // one graph pass for all settings; rerank + top-k per (ef, qid) —
    // identical per-setting ranking to the one-ef-per-pass serve
    val served = nswServeCandsMultiOn(s, d, graph, nswTuneEfs)
      .join(emb.select(col("vec_id").as("qid"), col("ve").as("qe")), Seq("qid"))
      .join(emb.select(col("vec_id").as("cid"), col("ve").as("ce")), Seq("cid"))
      .select(col("ef"), col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("ef", "qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select("ef", "qid", "cid")
      .persist()
    nswTuneEfs.foreach(ef => graft.io.Sinks.dumpFixture(
      served.filter(col("ef") === ef).select("qid", "cid"), s"annnswtune_$ef"))
    // both per-setting counts in ONE aggregation pass each (a served
    // census + a semi-join census) instead of 2 count jobs per setting
    val nServed = served.groupBy("ef").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nHits = served.join(exact, Seq("qid", "cid"), "left_semi")
      .groupBy("ef").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    served.unpersist()
    exact.unpersist()
    val counted = nswTuneEfs.map(ef =>
      (ef.toLong, nServed.getOrElse(ef, 0L), nExact, nHits.getOrElse(ef, 0L)))
    import s.implicits._
    counted.toDF("ef_search", "n_served", "n_exact", "hits")
      .select(col("ef_search"), col("n_served"), col("n_exact"), col("hits"),
        dround(col("hits").cast("double") / col("n_exact"), 4).as("recall"))
      .orderBy("ef_search")
  }

  private val annPqRecall: Q = annRecall(annPq, "annpq_topk")
  private val annIvfPqRecall: Q = annRecall(annIvfPq, "annivfpq_topk")
  private val annNswRecall: Q = annRecall(annNsw, "annnsw_topk")

  // -------------------------------------------------------------------
  // ann_tune: the recall-vs-nProbe operating-point table — the FAISS
  // benchmark every serving team builds before picking an index
  // config: serve the SAME probes through the SAME persisted IVF index
  // at nProbe ∈ {1,2,4,8} of 16 cells and report served-candidate
  // volume + recall against the exact baseline per setting. Because
  // the serving metric IS the exact metric, recall is provably
  // monotone in nProbe (a candidate that displaces an exact-top-k
  // member from the served top-k must itself be exact-top-k) — pinned
  // by AnnTuneSpec. Cost: 4 probe-ring scans over probed cells only;
  // the index is built once (the build-once/serve-many rule).
  // -------------------------------------------------------------------
  private val tuneNProbes = Seq(1, 2, 4, 8)

  /** Serve the IVF top-k at an explicit probe-ring width — [[ivfSims]]
    * ranked and cut to kNeighbors. ann_tune sweeps this; annIvf runs
    * the same plan at the tuned default [[ivfNProbe]]. */
  private def ivfServeAt(s: SparkSession, d: String, np: Int): DataFrame =
    ivfSims(s, d, np)
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select("qid", "cid")

  private val annTune: Q = (s, d) => {
    val exact = knnCosine(s, d).select("qid", "cid").persist()
    // Eager constant-width readback (scalar counts — the sanctioned
    // driver-side scalar regime), so every persisted relation is
    // unpersisted before return; the recall division/rounding stays IN
    // the final plan so engine and oracle share identical rounding.
    val nExact = exact.count()
    // ONE candidate pass at the WIDEST setting with the probe-cell
    // rank attached (r18 opt round): the np-setting candidate sets are
    // crk-PREFIXES of each other (crk ranks all stored centroids,
    // independent of np), so serving at np is exactly filtering
    // crk <= np — the sweep used to re-scan the index + re-rank once
    // per setting (4 scans, 16 jobs); it is now one scan, one window,
    // two census aggregations. Per-setting rows identical (AnnTuneSpec
    // + the oracle gate pin the table).
    val idx = ensureIvfIndex(s, d)
    val assigned = s.read.parquet(s"$idx/assignments")
    val centroids = s.read.parquet(s"$idx/centroids")
    val probes = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
      .filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("ve").as("qe"))
    val npMax = tuneNProbes.max
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("qe"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("cdist"), asc("cl"))))
      .filter(col("crk") <= npMax)
      .select("qid", "qe", "cl", "crk")
    val sims = assigned.join(broadcast(probeCells), Seq("cl"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        cosine(col("qe"), col("ve")).as("sim"), col("crk"))
    import s.implicits._
    val served = sims
      .join(broadcast(tuneNProbes.toDF("np")), col("crk") <= col("np"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("np", "qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select("np", "qid", "cid")
      .persist()
    tuneNProbes.foreach(np => graft.io.Sinks.dumpFixture(
      served.filter(col("np") === np).select("qid", "cid"), s"anntune_$np"))
    val nServed = served.groupBy("np").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nHits = served.join(exact, Seq("qid", "cid"), "left_semi")
      .groupBy("np").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    served.unpersist()
    exact.unpersist()
    val counted = tuneNProbes.map(np =>
      (np.toLong, nServed.getOrElse(np, 0L), nExact, nHits.getOrElse(np, 0L)))
    counted.toDF("n_probe", "n_served", "n_exact", "hits")
      .select(col("n_probe"), col("n_served"), col("n_exact"), col("hits"),
        dround(col("hits").cast("double") / col("n_exact"), 4).as("recall"))
      .orderBy("n_probe")
  }

  // -------------------------------------------------------------------
  // ann_filtered: metadata-FILTERED vector search — "nearest neighbors
  // within my category", the constraint serving stacks bolt onto every
  // vector index (FAISS IDSelector / Qdrant-style payload filter). The
  // strategy is PRE-filtering: the label predicate joins into the
  // candidate scan BEFORE any scoring, so filtered-out vectors cost
  // nothing; because filtering thins each probed cell (~10% selectivity
  // on the 10 balanced labels here), the probe ring is WIDENED 2× —
  // the standard filtered-ANN compensation, priced as (2·nProbe/16) of
  // the corpus instead of re-scanning everything. Each query filters
  // for its own label ("more like this, same category"). Gate: the
  // annCandOracle fixture pattern extended with the label column, plus
  // a recall row against the label-constrained exact baseline.
  // -------------------------------------------------------------------
  private val annFiltered: Q = (s, d) => {
    val idx = ensureIvfIndex(s, d)
    val assigned = s.read.parquet(s"$idx/assignments")
    val centroids = s.read.parquet(s"$idx/centroids")
    val lab = table(s, d, "embeddings").select(col("vec_id"), col("label"))
    val probes = table(s, d, "embeddings")
      .filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), asDouble.as("qe"), col("label").as("qlabel"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("qe"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("cdist"), asc("cl"))))
      .filter(col("crk") <= ivfNProbe * 2)
      .select("qid", "qe", "qlabel", "cl")
    val sims = assigned
      .join(lab, "vec_id")
      .join(broadcast(probeCells), Seq("cl"))
      .filter(col("label") === col("qlabel") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("qlabel").cast("long").as("qlabel"),
        col("vec_id").as("cid"), cosine(col("qe"), col("ve")).as("sim"))
      .persist()
    graft.io.Sinks.dumpFixture(sims.select("qid", "cid"), "annfiltered_cands")
    sims.withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("qlabel"), col("rk"), col("cid"),
        dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  /** Recall of the filtered serve against the label-constrained EXACT
    * top-k (brute force among same-label vectors only — the correct
    * baseline: unfiltered recall would penalize the filter itself). */
  private val annFilteredRecall: Q = (s, d) => {
    val served = annFiltered(s, d).select("qid", "cid").persist()
    graft.io.Sinks.dumpFixture(served, "annfiltered_topk")
    val emb = table(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), asDouble.as("qe"), col("label").as("qlabel"))
    val c = emb.select(col("vec_id").as("cid"), asDouble.as("ce"), col("label"))
    val exact = q.crossJoin(c)
      .filter(col("label") === col("qlabel") && col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select("qid", "cid")
    val hits = exact.join(served, Seq("qid", "cid"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    exact.agg(count(lit(1)).as("n_exact")).crossJoin(hits)
      .select(col("n_exact"), col("hits"),
        dround(col("hits").cast("double") / col("n_exact"), 4).as("recall"))
  }

  // -------------------------------------------------------------------
  // ann_ivf_upsert: incremental index maintenance — the continuous-
  // ingest half of the IVF architecture (dd_incremental's discipline
  // applied to vectors). A NEW batch arrives after the index was
  // built; upserting it must cost O(batch), never a refit: each batch
  // vector is assigned to its nearest PERSISTED centroid through one
  // broadcast join (16 rows — map-side, zero shuffle of the batch),
  // and the enlarged index is served unchanged. FAISS calls this
  // `add` vs `train`; at 100 TB the batch append writes into the
  // cl-partitioned cell layout (ivfPqBuild's) while the quantizer
  // stays frozen until a scheduled retrain. The batch is planted as
  // directional twins (×2-scaled, ids + upsertOffset) of vectors
  // [0, plantN): FP-exact, so each probe's twin scores cosine exactly
  // 1.0 and MUST surface at rank 1 — a deterministic proof the
  // freshly-upserted rows are reachable through cell routing. Gate:
  // the annCandOracle fixture pattern, with the oracle re-deriving
  // the batch vectors from the same ×2 arithmetic.
  // -------------------------------------------------------------------
  private val upsertOffset = 2000000L
  private val annIvfUpsert: Q = (s, d) => {
    val idx = ensureIvfIndex(s, d)
    val assigned = s.read.parquet(s"$idx/assignments")
    val centroids = s.read.parquet(s"$idx/centroids")
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val batch = emb.filter(col("vec_id") < plantN)
      .select((col("vec_id") + upsertOffset).as("vec_id"),
        transform(col("ve"), x => x * 2.0).as("ve"))
    val batchAssigned = batch.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("ve"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("vec_id").orderBy(asc("cdist"), asc("cl"))))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("ve"), col("cl"))
    val upserted = assigned.select("vec_id", "ve", "cl")
      .unionByName(batchAssigned)
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("ve").as("qe"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("qe"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("cdist"), asc("cl"))))
      .filter(col("crk") <= ivfNProbe)
      .select("qid", "qe", "cl")
    val sims = upserted.join(broadcast(probeCells), Seq("cl"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        cosine(col("qe"), col("ve")).as("sim"))
      .persist()
    graft.io.Sinks.dumpFixture(sims.select("qid", "cid"), "annivfup_cands")
    sims.withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  // -------------------------------------------------------------------
  // ann_ivf_delete: tombstoned deletes — the other half of index
  // maintenance next to ann_ivf_upsert. A delete is a TOMBSTONE row
  // (vec_id), never an index rewrite: serving anti-joins the candidate
  // cells against the broadcast tombstone relation BEFORE scoring (the
  // FAISS IDSelector / Lucene deleted-docs pattern), so deletion is
  // O(1) metadata now and the physical reclaim belongs to the next
  // scheduled compaction (fs_compact's job). At 100 TB the tombstone
  // side stays tiny (it is the recent-deletes delta, not the corpus)
  // while the cl-partitioned index files are untouched — the
  // broadcast-anti regime is exactly the j9_bloom_prune shape.
  // Tombstones here: every third planted id (vec_id < plantN,
  // vec_id % 3 = 0) — these ids seeded near-duplicate neighborhoods,
  // so their removal MUST change top-k membership (replacements
  // surface from the same cells), making the gate falsifiable. The
  // oracle re-applies the tombstone predicate to the fixture
  // candidates: an engine leak of a deleted id turns the row sets
  // unequal, not just a value off.
  // -------------------------------------------------------------------
  private[graft] def isTombstoned(id: Column): Column =
    id < plantN && id % 3 === 0
  /** Scalar twin of [[isTombstoned]] for the in-kernel NSW serve —
    * one predicate definition in two evaluation regimes, asserted
    * consistent in NswDeleteSpec. */
  private[llm] def tombstonedId(id: Long): Boolean =
    id < plantN && id % 3 == 0
  /** The ONE tombstone predicate shared with the streaming CDC gate
    * (st_nsw_compact) — the NswDeleteSpec one-definition discipline. */
  private[graft] def tombstonedIdFor(id: Long): Boolean = tombstonedId(id)

  private val annIvfDelete: Q = (s, d) => {
    val idx = ensureIvfIndex(s, d)
    val assigned = s.read.parquet(s"$idx/assignments")
    val centroids = s.read.parquet(s"$idx/centroids")
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val tomb = emb.select(col("vec_id")).filter(isTombstoned(col("vec_id")))
    val live = assigned.join(broadcast(tomb), Seq("vec_id"), "left_anti")
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("ve").as("qe"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("qe"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("cdist"), asc("cl"))))
      .filter(col("crk") <= ivfNProbe)
      .select("qid", "qe", "cl")
    val sims = live.join(broadcast(probeCells), Seq("cl"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        cosine(col("qe"), col("ve")).as("sim"))
      .persist()
    graft.io.Sinks.dumpFixture(sims.select("qid", "cid"), "annivfdel_cands")
    sims.withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  // -------------------------------------------------------------------
  // ann_mrl: Matryoshka two-tier serving (Kusupati et al. 2022,
  // arXiv:2205.13147) — MRL-trained embeddings make every PREFIX a
  // usable lower-dim embedding, so serving goes adaptive: route by
  // the persisted IVF cells, score every probed-cell candidate with
  // only the FIRST 16 of 64 dims (4× less arithmetic and — on a real
  // deployment where the scan stores the prefix columnarly — 4× less
  // I/O), shortlist the top 10, then exact full-dim rerank to the
  // final top-3. At 100 TB the tier-1 pass is what touches the
  // corpus; full vectors load only for shortlist·nProbes rows (the
  // ann_pq ADC discipline, with truncation instead of quantization).
  // Gate: fixture candidates; the oracle re-derives BOTH tiers with
  // list slices — a wrong slice bound, a tier mix-up, or a rerank
  // that forgot the shortlist all diverge.
  // -------------------------------------------------------------------
  private val mrlDims = 16
  private val mrlShortlist = 10
  private val annMrl: Q = (s, d) => {
    val idx = ensureIvfIndex(s, d)
    val assigned = s.read.parquet(s"$idx/assignments")
    val centroids = s.read.parquet(s"$idx/centroids")
    val emb = table(s, d, "embeddings").select(col("vec_id"), asDouble.as("ve"))
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("ve").as("qe"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("qe"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("cdist"), asc("cl"))))
      .filter(col("crk") <= ivfNProbe)
      .select("qid", "qe", "cl")
    val cands = assigned.join(broadcast(probeCells), Seq("cl"))
      .filter(col("qid") =!= col("vec_id"))
      .persist()
    graft.io.Sinks.dumpFixture(
      cands.select(col("qid"), col("vec_id").as("cid")), "annmrl_cands")
    val short = cands
      .select(col("qid"), col("qe"), col("vec_id").as("cid"), col("ve"),
        cosine(slice(col("qe"), 1, mrlDims), slice(col("ve"), 1, mrlDims)).as("sim16"))
      .withColumn("rk16", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim16"), asc("cid"))))
      .filter(col("rk16") <= mrlShortlist)
    short
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ve")).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("rk"), col("cid"), dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  // -------------------------------------------------------------------
  // ann_lifecycle: the four serving features COMPOSED against one
  // persisted index (VERDICT r8 next §6) — build → upsert batch →
  // tombstone deletes → filtered Matryoshka serve, in one query, so
  // the gate proves the features compose rather than merely coexist:
  //   build    — the same persisted IVF index every ann_* query probes;
  //   upsert   — the ×2 directional twins (ids + upsertOffset) routed
  //              to frozen centroids, labels inherited from the source
  //              vector (re-derivable arithmetic);
  //   delete   — the isTombstoned ids anti-joined out BEFORE scoring
  //              (tombstones hit originals; their twins stay live);
  //   serve    — label-filtered (each query wants its own label, ring
  //              widened 2× — the annFiltered compensation) through
  //              the two-tier Matryoshka path: 16-dim tier-1 over the
  //              probed cells, shortlist, full-dim rerank.
  // Oracle: the candidate-fixture pattern, with the twins re-derived
  // from the same ×2 arithmetic AND the tombstone + label predicates
  // RE-APPLIED to the fixture — an engine leak of a deleted id or a
  // wrong-label candidate makes the row sets unequal, not just a
  // value off. ann_lifecycle_recall scores the serve against the
  // exact brute-force top-k over the post-lifecycle corpus
  // (originals ∪ twins − tombstones, same-label) — the correct
  // baseline for the composed state.
  // -------------------------------------------------------------------
  private val annLifecycle: Q = (s, d) => {
    val idx = ensureIvfIndex(s, d)
    val assigned = s.read.parquet(s"$idx/assignments")
    val centroids = s.read.parquet(s"$idx/centroids")
    val embT = table(s, d, "embeddings")
    val emb = embT.select(col("vec_id"), asDouble.as("ve"))
    val lab = embT.select(col("vec_id"), col("label"))
    // upsert (frozen quantizer, O(batch))
    val batch = emb.filter(col("vec_id") < plantN)
      .select((col("vec_id") + upsertOffset).as("vec_id"),
        transform(col("ve"), x => x * 2.0).as("ve"))
    val batchAssigned = batch.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("ve"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("vec_id").orderBy(asc("cdist"), asc("cl"))))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("ve"), col("cl"))
    val upserted = assigned.select("vec_id", "ve", "cl").unionByName(batchAssigned)
    val labAll = lab.unionByName(
      lab.filter(col("vec_id") < plantN)
        .select((col("vec_id") + upsertOffset).as("vec_id"), col("label")))
    // tombstoned deletes (broadcast anti, before any scoring)
    val tomb = emb.select(col("vec_id")).filter(isTombstoned(col("vec_id")))
    val live = upserted.join(broadcast(tomb), Seq("vec_id"), "left_anti")
    // filtered two-tier serve
    val probes = embT.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), asDouble.as("qe"), col("label").as("qlabel"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("qe"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("cdist"), asc("cl"))))
      .filter(col("crk") <= ivfNProbe * 2)
      .select("qid", "qe", "qlabel", "cl")
    val cands = live.join(labAll, "vec_id")
      .join(broadcast(probeCells), Seq("cl"))
      .filter(col("label") === col("qlabel") && col("qid") =!= col("vec_id"))
      .persist()
    graft.io.Sinks.dumpFixture(
      cands.select(col("qid"), col("vec_id").as("cid")), "annlc_cands")
    val short = cands
      .select(col("qid"), col("qlabel").cast("long").as("qlabel"), col("qe"),
        col("vec_id").as("cid"), col("ve"),
        cosine(slice(col("qe"), 1, mrlDims), slice(col("ve"), 1, mrlDims)).as("sim16"))
      .withColumn("rk16", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim16"), asc("cid"))))
      .filter(col("rk16") <= mrlShortlist)
    short
      .select(col("qid"), col("qlabel"), col("cid"), cosine(col("qe"), col("ve")).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select(col("qid"), col("qlabel"), col("rk"), col("cid"),
        dround(col("sim"), 4).as("sim"))
      .orderBy("qid", "rk")
  }

  /** Recall of the composed serve against the exact same-label top-k
    * over the POST-lifecycle corpus (originals ∪ ×2 twins, tombstones
    * removed) — the declared-exact brute-force baseline. */
  private val annLifecycleRecall: Q = (s, d) => {
    val served = annLifecycle(s, d).select("qid", "cid").persist()
    graft.io.Sinks.dumpFixture(served, "annlc_topk")
    val embT = table(s, d, "embeddings")
    val base = embT.select(col("vec_id"), asDouble.as("ve"), col("label"))
    val twins = base.filter(col("vec_id") < plantN)
      .select((col("vec_id") + upsertOffset).as("vec_id"),
        transform(col("ve"), x => x * 2.0).as("ve"), col("label"))
    val corpus = base.unionByName(twins)
      .filter(!isTombstoned(col("vec_id")))
      .select(col("vec_id").as("cid"), col("ve").as("ce"), col("label"))
    val q = embT.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), asDouble.as("qe"), col("label").as("qlabel"))
    val exact = q.crossJoin(corpus)
      .filter(col("label") === col("qlabel") && col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rk") <= kNeighbors)
      .select("qid", "cid")
    val hits = exact.join(served, Seq("qid", "cid"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    exact.agg(count(lit(1)).as("n_exact")).crossJoin(hits)
      .select(col("n_exact"), col("hits"),
        dround(col("hits").cast("double") / col("n_exact"), 4).as("recall"))
  }

  // -------------------------------------------------------------------
  // dd_semantic: SemDeDup-style semantic deduplication (Abbas et al.
  // 2023, arXiv:2303.09540) — cluster the embedding space with the
  // SAME persisted k-means coarse quantizer the IVF index uses, then
  // compare pairs only WITHIN a cluster: a vector is dropped when some
  // lower-id clustermate sits above the cosine threshold (SemDeDup
  // keeps the member farthest from the centroid; we keep min-id — a
  // deterministic, oracle-replayable survivor rule, same as dd_exact).
  // The clustering is the entire scale story: all-pairs is O(n²), but
  // n²/k within k balanced cells — the join shuffles on the cluster id
  // alone, each cell's quadratic work is executor-local, and k is the
  // knob that bounds cell size at 100 TB (here the IVF index's k=16).
  // Gate: the fixture-oracle pattern — assignments are the engine's
  // k-means fit (dumped), but GIVEN them DuckDB re-derives every
  // within-cluster cosine, the drop set, and the final relation.
  // -------------------------------------------------------------------
  private val semThr = 0.3
  private val ddSemantic: Q = (s, d) => {
    val idx = ensureIvfIndex(s, d)
    val assigned = s.read.parquet(s"$idx/assignments").persist()
    graft.io.Sinks.dumpFixture(assigned.select("vec_id", "cl"), "ddsem_assign")
    val a = assigned.select(col("cl"), col("vec_id").as("aid"), col("ve").as("ae"))
    val b = assigned.select(col("cl"), col("vec_id").as("bid"), col("ve").as("be"))
    val dropped = a.join(b, Seq("cl"))
      .filter(col("aid") < col("bid"))
      .filter(cosine(col("ae"), col("be")) > semThr)
      .select(col("bid").as("vec_id")).distinct()
    assigned.select("vec_id", "cl")
      .join(dropped.withColumn("hit", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cl"),
        coalesce(col("hit"), lit(false)).as("is_dropped"))
      .orderBy("vec_id")
  }

  // -------------------------------------------------------------------
  // ds_kcenter: greedy k-center (Gonzalez) diversity selection — the
  // coreset/data-pruning primitive (pick K maximally spread exemplars
  // in embedding space; the seed set for facility-location pruning and
  // cluster-balanced sampling). K−1 rounds, each ONE distributed pass:
  // fold the new pick's cosine distance into a running per-row min
  // (`least` chain) and take the argmax by a top-1 sort — no all-pairs
  // ever materializes, so the shape is K·O(n) at any scale. Every
  // distance is the IEEE-exact VecDot/norm chain shared with
  // knn_cosine, the pick rule breaks ties on vec_id, and the oracle
  // replays ALL rounds (selection subqueries + the same least-folds) —
  // one wrong pick anywhere diverges every later row.
  // -------------------------------------------------------------------
  private val kcK = 6

  private val dsKcenter: Q = (s, d) => {
    val fe = table(s, d, "embeddings")
      .select(col("vec_id"), asDouble.as("ve"))
      .withColumn("nrm", sqrt(dot(col("ve"), col("ve"))))
      .persist()
    val seedId = fe.agg(min(col("vec_id"))).head().getLong(0)
    var picks = List[(Int, Long, Option[Double])]((1, seedId, None))
    var withMind: DataFrame = null
    for (r <- 2 to kcK) {
      val prevId = picks.head._2
      val prow = fe.filter(col("vec_id") === prevId).select("ve", "nrm").head()
      val pv = prow.getSeq[Double](0)
      val pn = prow.getDouble(1)
      val dNew = lit(1.0) -
        (dot(col("ve"), typedLit(pv)) / (col("nrm") * lit(pn)))
      withMind =
        if (withMind == null) fe.withColumn("mind", dNew)
        else withMind.withColumn("mind", least(col("mind"), dNew))
      val pick = withMind
        .filter(!col("vec_id").isin(picks.map(_._2): _*))
        .orderBy(col("mind").desc, col("vec_id"))
        .select("vec_id", "mind").head()
      picks = (r, pick.getLong(0), Some(pick.getDouble(1))) :: picks
    }
    fe.unpersist()
    import s.implicits._
    picks.reverse
      .map { case (r, id, dst) => (r.toLong, id, dst.map(x => {
        val p = 1e7
        if (x >= 0) math.floor(x * p + 0.5) / p else -(math.floor(-x * p + 0.5) / p)
      })) }
      .toDF("sel_round", "vec_id", "dist_at_pick")
      .orderBy("sel_round")
  }

  /** ds_kcenter oracle: every selection round unrolled — seed by min
    * id, then per round the least-folded running min distance and the
    * (mind DESC, vec_id) top-1, with prior picks excluded by
    * subquery. */
  private def kcenterSql: String = {
    def dist(m: String) =
      s"(1.0 - (list_dot_product($m.ve, s.ve) / ($m.nrm * sqrt(list_dot_product(s.ve, s.ve)))))"
    val rounds = (2 to kcK).map { r =>
      val excl = (1 until r).map(i => s"vec_id <> (SELECT id FROM sel$i)").mkString(" AND ")
      val mind =
        if (r == 2) s"${dist("f")} AS mind"
        else s"least(f.mind, ${dist("f")}) AS mind"
      val src = if (r == 2) "fe f" else s"m${r - 1} f"
      s"""m$r AS (SELECT f.vec_id, f.ve, f.nrm, $mind
         |   FROM $src, sv${r - 1} s),
         | sel$r AS (SELECT vec_id AS id, mind FROM m$r
         |   WHERE $excl ORDER BY mind DESC, vec_id LIMIT 1),
         | sv$r AS (SELECT ve FROM fe WHERE vec_id = (SELECT id FROM sel$r))""".stripMargin
    }
    val finalRows = Seq(
      "SELECT CAST(1 AS BIGINT) AS sel_round, (SELECT id FROM sel1) AS vec_id, CAST(NULL AS DOUBLE) AS dist_at_pick") ++
      (2 to kcK).map(r =>
        s"SELECT CAST($r AS BIGINT), id, round(mind, 7) FROM sel$r")
    s"""WITH fe AS (SELECT vec_id, embedding::DOUBLE[] AS ve,
       |   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings),
       | sel1 AS (SELECT min(vec_id) AS id FROM fe),
       | sv1 AS (SELECT ve FROM fe WHERE vec_id = (SELECT id FROM sel1)),
       | ${rounds.mkString(",\n ")}
       |SELECT * FROM (
       |${finalRows.mkString("\nUNION ALL\n")}
       |) ORDER BY sel_round""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "ann_filtered" -> annFiltered,
    "ann_filtered_recall" -> annFilteredRecall,
    "ds_kcenter" -> dsKcenter,
    "dd_semantic" -> ddSemantic,
    "pq_encode" -> pqEncode,
    "ann_pq" -> annPq,
    "ann_pq_recall" -> annPqRecall,
    "ann_ivf_pq" -> annIvfPq,
    "ann_ivf_pq_recall" -> annIvfPqRecall,
    "ann_tune" -> annTune,
    "ann_ivf_upsert" -> annIvfUpsert,
    "ann_ivf_delete" -> annIvfDelete,
    "ann_mrl" -> annMrl,
    "ann_lifecycle" -> annLifecycle,
    "ann_lifecycle_recall" -> annLifecycleRecall,
    "emb_quant" -> embQuant,
    "knn_cosine" -> knnCosine,
    "ann_lsh" -> annLsh,
    "ann_ivf" -> annIvf,
    "ann_nsw" -> annNsw,
    "ann_nsw_serve" -> annNswServe,
    "ann_nsw_upsert" -> annNswUpsert,
    "ann_nsw_delete" -> annNswDelete,
    "ann_nsw_lifecycle" -> annNswLifecycle,
    "ann_nsw_compact" -> annNswCompact,
    "ann_nsw_reshard" -> annNswReshard,
    "ann_nsw_filtered" -> annNswFiltered,
    "ann_nsw_filtered_recall" -> annNswFilteredRecall,
    "ann_nsw_tune" -> annNswTune,
    "ann_nsw_recall" -> annNswRecall,
    "ann_hamming" -> annHamming,
    "dq_rtbf_ann" -> dqRtbfAnn,
    "dd_embcos" -> ddEmbCos,
    "dd_embcos_recall" -> ddEmbCosRecall,
    "dd_embcos_recall_planted" -> ddEmbCosRecallPlanted,
    "dd_embcos_exact" -> ddEmbCosExact)

  private def annCandOracle(fixture: String): String =
    s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/$fixture/*.parquet')),
       | e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       | sims AS (
       |  SELECT p.qid, p.cid,
       |   list_dot_product(q.v, c.v)
       |     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
       |  FROM p JOIN e q ON q.vec_id = p.qid JOIN e c ON c.vec_id = p.cid),
       | ranked AS (
       |  SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
       |  FROM sims)
       |SELECT qid, rk, cid, round(sim, 4) AS sim FROM ranked WHERE rk <= $kNeighbors
       |ORDER BY qid, rk""".stripMargin

  private def annRecallOracle(fixture: String): String =
    s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/$fixture/*.parquet')),
       | q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < $nProbes),
       | c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
       | sims AS (
       |  SELECT q.qid, c.cid,
       |   list_dot_product(q.qe, c.ce)
       |     / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce))) AS sim
       |  FROM q CROSS JOIN c WHERE q.qid <> c.cid),
       | ranked AS (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
       |  FROM sims),
       | ex AS (SELECT qid, cid FROM ranked WHERE rk <= $kNeighbors)
       |SELECT (SELECT count(*) FROM ex) AS n_exact,
       |       (SELECT count(*) FROM ex JOIN p USING (qid, cid)) AS hits,
       |       round((SELECT count(*) FROM ex JOIN p USING (qid, cid))::DOUBLE
       |         / (SELECT count(*) FROM ex), 4) AS recall""".stripMargin

  val oracle: Map[String, String] = Map(
    // the ANN erasure ledger replayed from the raw corpus alone: every
    // scrubbed relation (IVF assignments, PQ codes, NSW graph nodes)
    // is one row per corpus vector, so n_before / touching / n_after
    // re-derive from the embeddings table and the deletion predicate;
    // the engine's re-counts on the WRITTEN relations must land on
    // exactly these numbers — a scrub that kept a forgotten vector
    // reports a nonzero n_touching_after and diverges
    "dq_rtbf_ann" ->
      """WITH c AS (SELECT count(*)::BIGINT AS n,
        |   sum(CASE WHEN vec_id % 20 = 5 THEN 1 ELSE 0 END)::BIGINT AS t
        |  FROM embeddings)
        |SELECT a.artifact, c.n AS n_before, c.t AS n_touching_before,
        | (c.n - c.t) AS n_after, 0::BIGINT AS n_touching_after
        |FROM (VALUES ('ivf_assignments'), ('nsw_graph'), ('pq_codes')) a(artifact), c
        |ORDER BY artifact""".stripMargin,
    // the candidate-fixture pattern with the label carried through:
    // scoring + ranking + the query's own label re-derived from the raw
    // embeddings over exactly the candidates the engine scored
    "ann_filtered" ->
      s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/annfiltered_cands/*.parquet')),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
         | sims AS (
         |  SELECT p.qid, CAST(q.label AS BIGINT) AS qlabel, p.cid,
         |   list_dot_product(q.v, c.v)
         |     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
         |  FROM p JOIN e q ON p.qid = q.vec_id JOIN e c ON p.cid = c.vec_id),
         | ranked AS (
         |  SELECT qid, qlabel, cid, sim,
         |   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM sims)
         |SELECT qid, qlabel, rk, cid, round(sim, 4) AS sim
         |FROM ranked WHERE rk <= $kNeighbors ORDER BY qid, rk""".stripMargin,
    "ann_filtered_recall" ->
      s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/annfiltered_topk/*.parquet')),
         | q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe, label AS qlabel
         |       FROM embeddings WHERE vec_id < $nProbes),
         | c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce, label FROM embeddings),
         | sims AS (
         |  SELECT q.qid, c.cid,
         |   list_dot_product(q.qe, c.ce)
         |     / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce))) AS sim
         |  FROM q CROSS JOIN c WHERE c.label = q.qlabel AND q.qid <> c.cid),
         | ranked AS (
         |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM sims),
         | ex AS (SELECT qid, cid FROM ranked WHERE rk <= $kNeighbors)
         |SELECT (SELECT count(*) FROM ex) AS n_exact,
         |       (SELECT count(*) FROM ex JOIN p USING (qid, cid)) AS hits,
         |       round((SELECT count(*) FROM ex JOIN p USING (qid, cid))::DOUBLE
         |         / (SELECT count(*) FROM ex), 4) AS recall""".stripMargin,
    "ds_kcenter" -> kcenterSql,
    // given the dumped k-means assignment, every within-cluster cosine,
    // the min-id drop rule, and the final relation are re-derived from
    // the raw embeddings — a wrong sim, a missed drop, or a dropped
    // survivor all go red; the unrounded threshold cut is IEEE-exact on
    // both engines (the dd_embcos_exact precedent)
    "dd_semantic" ->
      s"""WITH a AS (SELECT vec_id, cl
         |   FROM read_parquet('/tmp/graft_fixtures/ddsem_assign/*.parquet')),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | p AS (SELECT y.vec_id AS bid,
         |    list_dot_product(ex.v, ey.v)
         |      / (sqrt(list_dot_product(ex.v, ex.v))
         |         * sqrt(list_dot_product(ey.v, ey.v))) AS sim
         |   FROM a x JOIN a y ON x.cl = y.cl AND x.vec_id < y.vec_id
         |   JOIN e ex ON ex.vec_id = x.vec_id
         |   JOIN e ey ON ey.vec_id = y.vec_id),
         | dropped AS (SELECT DISTINCT bid FROM p WHERE sim > $semThr)
         |SELECT a.vec_id, a.cl, (d.bid IS NOT NULL) AS is_dropped
         |FROM a LEFT JOIN dropped d ON d.bid = a.vec_id
         |ORDER BY vec_id""".stripMargin,
    // PQ twin (fixture pattern): GIVEN the dumped codebooks, every
    // assignment is determined — DuckDB recomputes each block's
    // argmin with the same ‖x‖²−2x·c+‖c‖² algebra over the raw
    // embeddings, rebuilds the code string, and re-sums the
    // reconstruction error.
    "pq_encode" ->
      s"""WITH cb AS (SELECT block, cl, ce
         |            FROM read_parquet('/tmp/graft_fixtures/pq_codebooks/*.parquet')),
         | v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         |       FROM embeddings WHERE len(embedding) = ${pqBlocks * pqDim}),
         | blk AS (SELECT v.vec_id, g.b AS block,
         |           v.ve[g.b*$pqDim+1 : g.b*$pqDim+$pqDim] AS xb
         |         FROM v, LATERAL unnest(generate_series(0, ${pqBlocks - 1})) g(b)),
         | dists AS (SELECT blk.vec_id, blk.block, cb.cl,
         |             list_dot_product(blk.xb, blk.xb)
         |               - 2 * list_dot_product(blk.xb, cb.ce)
         |               + list_dot_product(cb.ce, cb.ce) AS d
         |           FROM blk JOIN cb ON cb.block = blk.block),
         | best AS (SELECT vec_id, block, cl, d, row_number() OVER (
         |            PARTITION BY vec_id, block ORDER BY d, cl) AS rk
         |          FROM dists)
         |SELECT vec_id,
         |  string_agg(cl, '-' ORDER BY block) AS codes,
         |  round(list_sum(list(d ORDER BY block)), 6) AS recon_err
         |FROM best WHERE rk = 1
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // Fully independent quantization twin: DuckDB re-derives scale,
    // rounding, clamping, and the dequantized cosine from the raw
    // float[] with its own list lambdas — the integer sums/extrema
    // make any rounding or clamping divergence exact-visible.
    "emb_quant" ->
      """WITH m AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE len(embedding) > 0),
        | sc AS (SELECT vec_id, v,
        |    CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
        |         THEN 127.0 / list_max(list_transform(v, x -> abs(x)))
        |         ELSE 0 END AS sc FROM m),
        | qq AS (SELECT vec_id, v,
        |    list_transform(v, x -> least(127, greatest(-127,
        |      CAST(floor(x * sc + 0.5) AS BIGINT)))) AS q FROM sc),
        | qd AS (SELECT vec_id, v, q,
        |    list_transform(q, x -> CAST(x AS DOUBLE)) AS qdv FROM qq)
        |SELECT vec_id,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_abs_sum,
        |  list_min(q) AS q_min, list_max(q) AS q_max,
        |  CASE WHEN list_sum(list_transform(q, x -> abs(x))) > 0 THEN
        |    round(list_dot_product(v, qdv)
        |      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qdv, qdv))), 4)
        |  ELSE NULL END AS cos_dq
        |FROM qd ORDER BY vec_id""".stripMargin,
    "knn_cosine" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < $nProbes),
         | c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
         | sims AS (
         |  SELECT q.qid, c.cid,
         |   list_dot_product(q.qe, c.ce)
         |     / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce))) AS sim
         |  FROM q CROSS JOIN c WHERE q.qid <> c.cid),
         | ranked AS (
         |  SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM sims)
         |SELECT qid, rk, cid, round(sim, 4) AS sim FROM ranked WHERE rk <= $kNeighbors
         |ORDER BY qid, rk""".stripMargin,
    // Candidate-fixture twins: exact-cosine scoring + top-k ranking
    // recomputed from the raw embeddings over EXACTLY the candidate set
    // the engine probed (dumped by the query) — scoring/ranking bugs
    // hash-mismatch; candidate generation stays with the recall tests.
    "ann_lsh" -> annCandOracle("annlsh_cands"),
    "ann_ivf" -> annCandOracle("annivf_cands"),
    "ann_nsw" -> annCandOracle("annnsw_cands"),
    "ann_nsw_serve" -> annCandOracle("annnswserve_cands"),
    "ann_nsw_reshard" -> annCandOracle("annnswreshard_cands"),
    // filtered-serve twin with the label predicate RE-APPLIED to the
    // fixture (c.label = q.label in the scoring join): an engine leak
    // of a wrong-label candidate loses that row on the oracle side and
    // the row sets diverge — the ann_ivf_delete oracle discipline
    "ann_nsw_filtered" ->
      s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/annnswfiltered_cands/*.parquet')),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
         | sims AS (
         |  SELECT p.qid, CAST(q.label AS BIGINT) AS qlabel, p.cid,
         |   list_dot_product(q.v, c.v)
         |     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
         |  FROM p JOIN e q ON p.qid = q.vec_id JOIN e c ON p.cid = c.vec_id
         |  WHERE c.label = q.label),
         | ranked AS (
         |  SELECT qid, qlabel, cid, sim,
         |   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM sims)
         |SELECT qid, qlabel, rk, cid, round(sim, 4) AS sim
         |FROM ranked WHERE rk <= $kNeighbors ORDER BY qid, rk""".stripMargin,
    "ann_nsw_filtered_recall" ->
      s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/annnswfiltered_topk/*.parquet')),
         | q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe, label AS qlabel
         |       FROM embeddings WHERE vec_id < $nProbes),
         | c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce, label FROM embeddings),
         | sims AS (
         |  SELECT q.qid, c.cid,
         |   list_dot_product(q.qe, c.ce)
         |     / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce))) AS sim
         |  FROM q CROSS JOIN c WHERE c.label = q.qlabel AND q.qid <> c.cid),
         | ranked AS (
         |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM sims),
         | ex AS (SELECT qid, cid FROM ranked WHERE rk <= $kNeighbors)
         |SELECT (SELECT count(*) FROM ex) AS n_exact,
         |       (SELECT count(*) FROM ex JOIN p USING (qid, cid)) AS hits,
         |       round((SELECT count(*) FROM ex JOIN p USING (qid, cid))::DOUBLE
         |             / (SELECT count(*) FROM ex), 4) AS recall""".stripMargin,
    // the ann_ivf_upsert oracle shape: batch vectors re-derived from
    // the same x2 arithmetic, candidates scored over corpus ∪ batch
    "ann_nsw_upsert" ->
      s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/annnswup_cands/*.parquet')),
         | base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | batch AS (SELECT vec_id + $upsertOffset AS vec_id,
         |             list_transform(v, x -> x * 2.0) AS v
         |           FROM base WHERE vec_id < $plantN),
         | e AS (SELECT * FROM base UNION ALL SELECT * FROM batch),
         | sims AS (
         |  SELECT p.qid, p.cid,
         |   list_dot_product(q.v, c.v)
         |     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
         |  FROM p JOIN e q ON q.vec_id = p.qid JOIN e c ON c.vec_id = p.cid),
         | ranked AS (
         |  SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM sims)
         |SELECT qid, rk, cid, round(sim, 4) AS sim FROM ranked WHERE rk <= $kNeighbors
         |ORDER BY qid, rk""".stripMargin,
    // composed lifecycle twin: the upsert batch derivation with the
    // tombstone predicate re-applied to the fixture candidates — a
    // deleted id surfacing OR a missing twin both break the row sets
    "ann_nsw_lifecycle" ->
      s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/annnswlc_cands/*.parquet')
         |           WHERE NOT (cid < $plantN AND cid % 3 = 0)),
         | base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | batch AS (SELECT vec_id + $upsertOffset AS vec_id,
         |             list_transform(v, x -> x * 2.0) AS v
         |           FROM base WHERE vec_id < $plantN),
         | e AS (SELECT * FROM base UNION ALL SELECT * FROM batch),
         | sims AS (
         |  SELECT p.qid, p.cid,
         |   list_dot_product(q.v, c.v)
         |     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
         |  FROM p JOIN e q ON q.vec_id = p.qid JOIN e c ON c.vec_id = p.cid),
         | ranked AS (
         |  SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM sims)
         |SELECT qid, rk, cid, round(sim, 4) AS sim FROM ranked WHERE rk <= $kNeighbors
         |ORDER BY qid, rk""".stripMargin,
    "ann_nsw_recall" -> annRecallOracle("annnsw_topk"),
    // END-TO-END twin, no fixture: quantizer, Hamming shortlist, and
    // exact rerank are all deterministic integer/IEEE algebra, so the
    // oracle replays the whole operator from the raw table — the only
    // ANN method whose candidate generation itself is inside the gate
    "ann_hamming" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | bits AS (SELECT vec_id, g.i AS i, v[g.i] AS x
         |          FROM e, LATERAL unnest(generate_series(1, 64)) g(i)),
         | pk AS (SELECT vec_id,
         |    bit_or(CASE WHEN x > 0 AND i <= 32 THEN 1::BIGINT << (i-1) ELSE 0::BIGINT END) AS w0,
         |    bit_or(CASE WHEN x > 0 AND i > 32 THEN 1::BIGINT << (i-33) ELSE 0::BIGINT END) AS w1
         |   FROM bits GROUP BY vec_id),
         | pr AS (SELECT vec_id AS qid, w0 AS q0, w1 AS q1 FROM pk WHERE vec_id < $nProbes),
         | hd AS (SELECT pr.qid, pk.vec_id AS cid,
         |          CAST(bit_count(xor(pk.w0, pr.q0)) + bit_count(xor(pk.w1, pr.q1)) AS BIGINT) AS ham
         |        FROM pk CROSS JOIN pr WHERE pk.vec_id <> pr.qid),
         | sl AS (SELECT qid, cid, ham,
         |          row_number() OVER (PARTITION BY qid ORDER BY ham, cid) AS hrk FROM hd),
         | rr AS (SELECT sl.qid, sl.cid, sl.ham,
         |          list_dot_product(q.v, c.v)
         |            / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
         |        FROM sl JOIN e q ON q.vec_id = sl.qid JOIN e c ON c.vec_id = sl.cid
         |        WHERE sl.hrk <= $hammingR),
         | fin AS (SELECT qid, cid, ham, sim,
         |           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM rr)
         |SELECT qid, rk, cid, ham, round(sim, 4) AS sim FROM fin WHERE rk <= $kNeighbors
         |ORDER BY qid, rk""".stripMargin,
    "ann_pq" -> annCandOracle("annpq_cands"),
    "ann_ivf_pq" -> annCandOracle("annivfpq_cands"),
    // Upsert twin: the candidate-fixture pattern with the embedding
    // relation EXTENDED by the re-derived batch (×2-scaled twins of
    // vec_id < plantN, ids + upsertOffset — the scaling is FP-exact,
    // so both engines score the upserted rows bit-identically).
    "ann_ivf_upsert" ->
      s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/annivfup_cands/*.parquet')),
         | base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | batch AS (SELECT vec_id + $upsertOffset AS vec_id,
         |             list_transform(v, x -> x * 2.0) AS v
         |           FROM base WHERE vec_id < $plantN),
         | e AS (SELECT * FROM base UNION ALL SELECT * FROM batch),
         | sims AS (
         |  SELECT p.qid, p.cid,
         |   list_dot_product(q.v, c.v)
         |     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
         |  FROM p JOIN e q ON q.vec_id = p.qid JOIN e c ON c.vec_id = p.cid),
         | ranked AS (
         |  SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM sims)
         |SELECT qid, rk, cid, round(sim, 4) AS sim FROM ranked WHERE rk <= $kNeighbors
         |ORDER BY qid, rk""".stripMargin,
    // The tombstone predicate is RE-APPLIED to the fixture candidates
    // (WHERE NOT deleted): if the engine's anti-join ever leaked a
    // deleted id into a top-k, the oracle's relation would lack that
    // row entirely — a row-set mismatch, not a near-miss.
    "ann_ivf_delete" ->
      s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/annivfdel_cands/*.parquet')
         |           WHERE NOT (cid < $plantN AND cid % 3 = 0)),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | sims AS (
         |  SELECT p.qid, p.cid,
         |   list_dot_product(q.v, c.v)
         |     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
         |  FROM p JOIN e q ON q.vec_id = p.qid JOIN e c ON c.vec_id = p.cid),
         | ranked AS (
         |  SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM sims)
         |SELECT qid, rk, cid, round(sim, 4) AS sim FROM ranked WHERE rk <= $kNeighbors
         |ORDER BY qid, rk""".stripMargin,
    // NSW mark-delete twin — the ann_ivf_delete oracle shape over the
    // NSW fixture: the tombstone predicate is RE-APPLIED to the served
    // candidates, so a dead id leaking through the liveness ring turns
    // the row sets unequal, not just a value off.
    // the compaction ledger replayed INDEPENDENTLY from the dumped
    // pre-graph membership: tombstone predicate, the integer
    // cross-multiply ranking policy, and the row accounting are all
    // re-derived — the engine's n_after comes from the files it
    // actually wrote, so a sweep that keeps a dead node / drops a live
    // one / rebuilds the wrong shard diverges
    "ann_nsw_compact" ->
      s"""WITH pre AS (SELECT shard, vec_id FROM
         |        read_parquet('/tmp/graft_fixtures/annnswcompact_pre/*.parquet')),
         | per AS (SELECT shard, count(*)::BIGINT AS n_before,
         |          sum(CASE WHEN vec_id < $plantN AND vec_id % 3 = 0
         |              THEN 1 ELSE 0 END)::BIGINT AS n_dead
         |         FROM pre GROUP BY shard),
         | tot AS (SELECT sum(n_before)::BIGINT AS tn, sum(n_dead)::BIGINT AS td
         |         FROM per)
         |SELECT shard, n_before, n_dead,
         | round(n_dead::DOUBLE / n_before, 4) AS dead_frac,
         | (n_dead * tn > td * n_before) AS compacted,
         | CASE WHEN n_dead * tn > td * n_before THEN n_before - n_dead
         |      ELSE n_before END AS n_after
         |FROM per, tot ORDER BY shard""".stripMargin,
    "ann_nsw_delete" ->
      s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/annnswdel_cands/*.parquet')
         |           WHERE NOT (cid < $plantN AND cid % 3 = 0)),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | sims AS (
         |  SELECT p.qid, p.cid,
         |   list_dot_product(q.v, c.v)
         |     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
         |  FROM p JOIN e q ON q.vec_id = p.qid JOIN e c ON c.vec_id = p.cid),
         | ranked AS (
         |  SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM sims)
         |SELECT qid, rk, cid, round(sim, 4) AS sim FROM ranked WHERE rk <= $kNeighbors
         |ORDER BY qid, rk""".stripMargin,
    // Both tiers replayed from the fixture candidates: DuckDB slices
    // v[1:16] for the shortlist ranking, then reranks the survivors
    // full-dim — same sequential-fold dot products, so ranks are
    // IEEE-deterministic cross-engine.
    "ann_mrl" ->
      s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/annmrl_cands/*.parquet')),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | t1 AS (
         |  SELECT p.qid, p.cid,
         |   list_dot_product(q.v[1:$mrlDims], c.v[1:$mrlDims])
         |     / (sqrt(list_dot_product(q.v[1:$mrlDims], q.v[1:$mrlDims]))
         |        * sqrt(list_dot_product(c.v[1:$mrlDims], c.v[1:$mrlDims]))) AS sim16
         |  FROM p JOIN e q ON q.vec_id = p.qid JOIN e c ON c.vec_id = p.cid),
         | short AS (
         |  SELECT qid, cid FROM (
         |   SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |            ORDER BY sim16 DESC, cid) AS rk16 FROM t1)
         |  WHERE rk16 <= $mrlShortlist),
         | t2 AS (
         |  SELECT s.qid, s.cid,
         |   list_dot_product(q.v, c.v)
         |     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
         |  FROM short s JOIN e q ON q.vec_id = s.qid JOIN e c ON c.vec_id = s.cid),
         | ranked AS (
         |  SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM t2)
         |SELECT qid, rk, cid, round(sim, 4) AS sim FROM ranked WHERE rk <= $kNeighbors
         |ORDER BY qid, rk""".stripMargin,
    // Recall twins: the exact top-k is re-derived from the raw
    // embeddings on the DuckDB side (same algebra as knn_cosine's
    // twin) and intersected with the SERVED top-k fixture — the
    // engine's recall arithmetic and its fixture must both agree
    // with an independently recomputed baseline.
    "ann_pq_recall" -> annRecallOracle("annpq_topk"),
    "ann_ivf_pq_recall" -> annRecallOracle("annivfpq_topk"),
    // per-setting recall re-derived from the per-nProbe fixtures and
    // the from-scratch exact top-k
    "ann_tune" -> {
      val ex =
        s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
           |           FROM embeddings WHERE vec_id < $nProbes),
           | c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
           | sims AS (
           |  SELECT q.qid, c.cid,
           |   list_dot_product(q.qe, c.ce)
           |     / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce))) AS sim
           |  FROM q CROSS JOIN c WHERE q.qid <> c.cid),
           | ranked AS (
           |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
           |  FROM sims),
           | ex AS (SELECT qid, cid FROM ranked WHERE rk <= $kNeighbors)""".stripMargin
      val blocks = tuneNProbes.map { np =>
        val fx = s"read_parquet('/tmp/graft_fixtures/anntune_$np/*.parquet')"
        s"""SELECT CAST($np AS BIGINT) AS n_probe,
           | (SELECT count(*) FROM $fx) AS n_served,
           | (SELECT count(*) FROM ex) AS n_exact,
           | (SELECT count(*) FROM ex JOIN $fx p USING (qid, cid)) AS hits,
           | round((SELECT count(*) FROM ex JOIN $fx p USING (qid, cid))::DOUBLE
           |   / (SELECT count(*) FROM ex), 4) AS recall""".stripMargin
      }
      s"$ex\nSELECT * FROM (${blocks.mkString(" UNION ALL ")}) ORDER BY n_probe"
    },
    // per-ef recall re-derived from the per-setting top-k fixtures and
    // the from-scratch exact baseline — the ann_tune twin for the
    // graph family's beam-width knob
    "ann_nsw_tune" -> {
      val ex =
        s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
           |           FROM embeddings WHERE vec_id < $nProbes),
           | c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
           | sims AS (
           |  SELECT q.qid, c.cid,
           |   list_dot_product(q.qe, c.ce)
           |     / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce))) AS sim
           |  FROM q CROSS JOIN c WHERE q.qid <> c.cid),
           | ranked AS (
           |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
           |  FROM sims),
           | ex AS MATERIALIZED (SELECT qid, cid FROM ranked WHERE rk <= $kNeighbors)""".stripMargin
      val blocks = nswTuneEfs.map { ef =>
        val fx = s"read_parquet('/tmp/graft_fixtures/annnswtune_$ef/*.parquet')"
        s"""SELECT CAST($ef AS BIGINT) AS ef_search,
           | (SELECT count(*) FROM $fx) AS n_served,
           | (SELECT count(*) FROM ex) AS n_exact,
           | (SELECT count(*) FROM ex JOIN $fx p USING (qid, cid)) AS hits,
           | round((SELECT count(*) FROM ex JOIN $fx p USING (qid, cid))::DOUBLE
           |   / (SELECT count(*) FROM ex), 4) AS recall""".stripMargin
      }
      s"$ex\nSELECT * FROM (${blocks.mkString(" UNION ALL ")}) ORDER BY ef_search"
    },
    // composed-lifecycle twin: twins re-derived from the ×2
    // arithmetic; tombstone AND label predicates re-applied to the
    // fixture candidates (a leak → row-set mismatch); both Matryoshka
    // tiers recomputed with list slices over the post-lifecycle corpus
    "ann_lifecycle" ->
      s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/annlc_cands/*.parquet')),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
         | u AS (SELECT vec_id + $upsertOffset AS vec_id,
         |         list_transform(v, x -> x * 2.0) AS v, label
         |       FROM e WHERE vec_id < $plantN),
         | allv AS (SELECT * FROM e UNION ALL SELECT * FROM u),
         | pc AS (SELECT p.qid, p.cid FROM p
         |        JOIN e q ON q.vec_id = p.qid
         |        JOIN allv c ON c.vec_id = p.cid
         |        WHERE NOT (p.cid < $plantN AND p.cid % 3 = 0)
         |          AND c.label = q.label),
         | t1 AS (
         |  SELECT pc.qid, CAST(q.label AS BIGINT) AS qlabel, pc.cid,
         |   list_dot_product(q.v[1:$mrlDims], c.v[1:$mrlDims])
         |     / (sqrt(list_dot_product(q.v[1:$mrlDims], q.v[1:$mrlDims]))
         |        * sqrt(list_dot_product(c.v[1:$mrlDims], c.v[1:$mrlDims]))) AS sim16
         |  FROM pc JOIN e q ON q.vec_id = pc.qid JOIN allv c ON c.vec_id = pc.cid),
         | short AS (
         |  SELECT qid, qlabel, cid FROM (
         |   SELECT qid, qlabel, cid, row_number() OVER (PARTITION BY qid
         |            ORDER BY sim16 DESC, cid) AS rk16 FROM t1)
         |  WHERE rk16 <= $mrlShortlist),
         | t2 AS (
         |  SELECT s.qid, s.qlabel, s.cid,
         |   list_dot_product(q.v, c.v)
         |     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
         |  FROM short s JOIN e q ON q.vec_id = s.qid JOIN allv c ON c.vec_id = s.cid),
         | ranked AS (
         |  SELECT qid, qlabel, cid, sim,
         |   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM t2)
         |SELECT qid, qlabel, rk, cid, round(sim, 4) AS sim
         |FROM ranked WHERE rk <= $kNeighbors ORDER BY qid, rk""".stripMargin,
    "ann_lifecycle_recall" ->
      s"""WITH p AS (SELECT qid, cid FROM read_parquet('/tmp/graft_fixtures/annlc_topk/*.parquet')),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
         | u AS (SELECT vec_id + $upsertOffset AS vec_id,
         |         list_transform(v, x -> x * 2.0) AS v, label
         |       FROM e WHERE vec_id < $plantN),
         | corpus AS (SELECT * FROM (SELECT * FROM e UNION ALL SELECT * FROM u)
         |            WHERE NOT (vec_id < $plantN AND vec_id % 3 = 0)),
         | q AS (SELECT vec_id AS qid, v AS qe, label AS qlabel
         |       FROM e WHERE vec_id < $nProbes),
         | sims AS (
         |  SELECT q.qid, c.vec_id AS cid,
         |   list_dot_product(q.qe, c.v)
         |     / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.v, c.v))) AS sim
         |  FROM q CROSS JOIN corpus c
         |  WHERE c.label = q.qlabel AND q.qid <> c.vec_id),
         | ranked AS (
         |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
         |  FROM sims),
         | ex AS (SELECT qid, cid FROM ranked WHERE rk <= $kNeighbors)
         |SELECT (SELECT count(*) FROM ex) AS n_exact,
         |       (SELECT count(*) FROM ex JOIN p USING (qid, cid)) AS hits,
         |       round((SELECT count(*) FROM ex JOIN p USING (qid, cid))::DOUBLE
         |         / (SELECT count(*) FROM ex), 4) AS recall""".stripMargin,
    "dd_embcos_exact" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |            sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |           FROM embeddings)
         |SELECT id_a, id_b, round(sim, 4) AS sim FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |   list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |WHERE sim >= $exactThreshold ORDER BY id_a, id_b""".stripMargin,
    // Soundness twin: recompute exact cosine for EXACTLY the pairs the
    // engine's LSH pipeline emitted (dumped to the fixture path by the
    // query) and re-apply the threshold — an unsound emitted pair drops
    // out here and the row counts diverge.
    "dd_embcos" ->
      s"""WITH p AS (SELECT id_a, id_b FROM read_parquet('/tmp/graft_fixtures/embcos_pairs/*.parquet')),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |        sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |       FROM embeddings)
         |SELECT id_a, id_b, round(sim, 4) AS sim FROM (
         |  SELECT p.id_a, p.id_b, list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
         |  FROM p JOIN e a ON a.vec_id = p.id_a JOIN e b ON b.vec_id = p.id_b)
         |WHERE sim >= $embCosThreshold ORDER BY id_a, id_b""".stripMargin,
    "dd_embcos_recall" ->
      s"""WITH p AS (SELECT id_a, id_b FROM read_parquet('/tmp/graft_fixtures/embcos_pairs/*.parquet')),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |        sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |       FROM embeddings),
         | ex AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |        FROM e a JOIN e b ON a.vec_id < b.vec_id
         |        WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $exactThreshold)
         |SELECT (SELECT count(*) FROM p) AS pairs_found,
         |       (SELECT count(*) FROM ex) AS pairs_exact,
         |       round((SELECT count(*) FROM p)::DOUBLE / (SELECT count(*) FROM ex), 4) AS recall""".stripMargin,
    // Planted-recall twin: the expected pair set is regenerated from the
    // raw embeddings alone (vec_id < 64 → (id, id + 1e6)), and only
    // fixture pairs matching it are counted — an engine that missed a
    // planted directional duplicate, or fabricated the count, diverges.
    "dd_embcos_recall_planted" ->
      s"""WITH p AS (SELECT id_a, id_b FROM read_parquet('/tmp/graft_fixtures/embcos_planted_pairs/*.parquet')),
         | expect AS (SELECT vec_id AS id_a, vec_id + $plantOffset AS id_b
         |            FROM embeddings WHERE vec_id < $plantN),
         | hit AS (SELECT count(*) AS c FROM expect x
         |         JOIN p ON p.id_a = x.id_a AND p.id_b = x.id_b)
         |SELECT (SELECT count(*) FROM expect) AS planted,
         |       (SELECT c FROM hit) AS found_planted,
         |       round((SELECT c FROM hit)::DOUBLE
         |         / (SELECT count(*) FROM expect), 4) AS recall_planted""".stripMargin)
}
