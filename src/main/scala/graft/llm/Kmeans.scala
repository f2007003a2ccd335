package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sources.table

/** Distributed k-means (Lloyd's algorithm) over the embedding corpus —
  * the clustering stage a pretraining pipeline runs for cluster-based
  * curation (SemDeDup's cluster-then-dedup, cluster-balanced sampling,
  * topic bucketing) and the same fit that backs the IVF coarse
  * quantizer ([[Similarity]]); here it is a FIRST-CLASS, oracle-gated
  * training loop rather than an engine-specific index artifact.
  *
  * Scale shape (the ml_lr_train discipline, see [[Classifier]]): the
  * model — K×D centroid values — lives on the DRIVER between
  * iterations; each Lloyd round is ONE scan over the quantized
  * embedding relation with a map-side-combined groupBy(k) aggregate of
  * constant width (K × (D+2) integer columns). No row ever shuffles:
  * the only exchange is the K-row partial-aggregate merge. Per-
  * iteration cost at 100 TB is a single pass + a constant-width
  * reduce, exactly like gradient descent, and the quantized embedding
  * relation is persisted once across all T rounds.
  *
  * Cross-engine determinism: embeddings are quantized ONCE to integer
  * micro-units (floor(x·1e6) per dimension), so every distance is an
  * exact BIGINT sum of squared integer differences — assignment
  * (argmin with k-ascending tie-break) is immune to partitioning and
  * summation order on both engines. Centroid update divides exact
  * integer dimension sums by the exact member count with an explicit
  * floor(double-division) evaluated identically on the Spark driver
  * and in DuckDB; the division is exact by construction (|sum| ≤
  * n·2e6 ≪ 2^53, and a non-integer quotient sits ≥ 1/n from the
  * nearest integer — far outside double rounding error at oracle
  * scale). Empty clusters deterministically carry the previous
  * centroid forward on both engines. The oracle replays the ENTIRE
  * loop — hash-shard init, every assignment round, every centroid
  * update — as generated CTE chains; one wrong assignment anywhere
  * diverges every later iteration's n_k/wcss/c_sum.
  *
  * Output: one row per (iteration, cluster) with the post-assignment
  * member count, the quantized within-cluster sum of squares
  * (sum(dist div 1000) — the div-1000 keeps 64-dim · 4e12-unit
  * distances inside BIGINT headroom at any corpus size), and the
  * updated centroid's dimension-sum checksum (an error in any single
  * centroid dimension flips it).
  */
object Kmeans {

  type Q = (SparkSession, String) => DataFrame

  private[graft] val K = 4  // clusters
  private val T = 5         // Lloyd iterations
  private[graft] val D = 64 // embedding dimensions

  /** Exact squared L2 distance between the quantized embedding and a
    * centroid literal: BIGINT end to end. */
  private def sqDist(eq: Column, c: Array[Long]): Column =
    aggregate(
      zip_with(eq, typedlit(c.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** The floor-division mean, shared verbatim with the oracle's
    * `CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT)`. */
  private[graft] def floorMean(s: Long, n: Long): Long =
    math.floor(s.toDouble / n).toLong

  /** Quantize the raw embedding relation to (vec_id, eq: array<long>)
    * — the 1e-6 integer micro-units every distance computes over. */
  private[graft] def quantized(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1000000.0)).cast("long")).as("eq"))

  private def dimSumCols: Seq[Column] =
    (1 to D).map(i => sum(element_at(col("eq"), i)).as(s"s$i"))

  /** Hash-shard init stats: one row per vec_id % K shard with count and
    * per-dim integer sums. */
  private[graft] def shardStats(df: DataFrame): Array[org.apache.spark.sql.Row] =
    df.withColumn("k", col("vec_id") % K)
      .groupBy("k")
      .agg(count(lit(1)).as("n_k"), dimSumCols: _*)
      .collect()

  /** One assignment pass: argmin over the centroid literals with
    * (dist, k) tie-break, then the constant-width per-cluster stats
    * reduce (count, div-1000 wcss, per-dim sums). */
  private[graft] def assignStats(batch: DataFrame,
      cents: Map[Int, Array[Long]]): Array[org.apache.spark.sql.Row] = {
    val dists = (0 until K).map(k => sqDist(col("eq"), cents(k)).as(s"d$k"))
    val withD = batch.select(col("vec_id") +: col("eq") +: dists: _*)
      .withColumn("dist", least((0 until K).map(k => col(s"d$k")): _*))
    // argmin with ascending-k tie-break (matches ORDER BY dist, k)
    val kCol = (0 until K - 1).foldRight(lit(K - 1): Column) { (k, rest) =>
      when(col(s"d$k") === col("dist"), lit(k)).otherwise(rest)
    }
    withD.withColumn("k", kCol)
      .groupBy("k")
      .agg(count(lit(1)).as("n_k"),
        expr("CAST(sum(dist div 1000) AS BIGINT)").as("w") +: dimSumCols: _*)
      .collect()
  }

  private val mlKmeans: Q = (s, d) => lloyd(s, quantized(s, d))

  /** rows → per-cluster floor-division-mean centroids, previous
    * centroid carried for clusters absent from `rows`. */
  private[graft] def toCentroids(rows: Array[org.apache.spark.sql.Row],
      prev: Map[Int, Array[Long]]): Map[Int, Array[Long]] = {
    val byK = rows.map(r => r.getAs[Number]("k").intValue() -> r).toMap
    (0 until K).map { k =>
      byK.get(k) match {
        case Some(r) =>
          val n = r.getAs[Long]("n_k")
          k -> Array.tabulate(D)(i => floorMean(r.getAs[Long](s"s${i + 1}"), n))
        // At init (prev empty — a vec_id % K residue class with no
        // members) there is nothing to carry over, so the seed is the
        // explicit zero centroid (ADVICE r11): deterministic, oracle-
        // replayable, and never a NoSuchElementException on sparse-id
        // relations fed through the lloyd seam.
        case None => k -> prev.getOrElse(k, Array.fill(D)(0L))
      }
    }.toMap
  }

  /** The Lloyd loop over a pre-quantized (vec_id, eq: array<long>)
    * relation — seam for the planted-blob spec. */
  private[llm] def lloyd(s: SparkSession, eqIn: DataFrame): DataFrame = {
    val eq = eqIn.persist()
    // Init: hash-shard means — centroid k = per-dimension mean of the
    // vec_id % K shard (deterministic, well-spread, SQL-replayable).
    var cents = toCentroids(shardStats(eq), Map.empty)
    val out = collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
    for (t <- 1 to T) {
      val stats = assignStats(eq, cents)
      val byK = stats.map(r => r.getAs[Number]("k").intValue() -> r).toMap
      val newCents = toCentroids(stats, cents)
      for (k <- 0 until K) {
        val (nk, w) = byK.get(k)
          .map(r => (r.getAs[Long]("n_k"), r.getAs[Long]("w")))
          .getOrElse((0L, 0L))
        out += ((t.toLong, k.toLong, nk, w, newCents(k).sum))
      }
      cents = newCents
    }
    eq.unpersist()
    import s.implicits._
    out.toSeq.toDF("iter", "k", "n_k", "wcss_q", "c_sum").orderBy("iter", "k")
  }

  // ------------------------------------------------------------------
  // Oracle: the full Lloyd loop unrolled — init CTE, then per
  // iteration a cross-join assignment (exact integer distances, argmin
  // by (dist, k)), the per-(k,dim) floor-division mean, the empty-
  // cluster carryover, and the per-cluster stats row.
  // ------------------------------------------------------------------
  private def centroidCtes(t: Int, src: String): String =
    s"""m$t AS (SELECT k, generate_subscripts(eq,1) AS dim, unnest(eq) AS v FROM $src),
       |g$t AS (SELECT k, dim, CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
       |        FROM m$t GROUP BY k, dim),
       |cr$t AS (SELECT k, list(cv ORDER BY dim) AS cq FROM g$t GROUP BY k),
       |c$t AS (SELECT p.k, COALESCE(cr.cq, p.cq) AS cq
       |        FROM c${t - 1} p LEFT JOIN cr$t cr ON cr.k = p.k)""".stripMargin

  private def kmeansSql: String = {
    val parts = collection.mutable.ArrayBuffer[String]()
    parts += s"""e AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)) AS eq
       | FROM embeddings),
       |m0 AS (SELECT vec_id % $K AS k, generate_subscripts(eq,1) AS dim, unnest(eq) AS v FROM e),
       |g0 AS (SELECT k, dim, CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
       |       FROM m0 GROUP BY k, dim),
       |c0 AS (SELECT k, list(cv ORDER BY dim) AS cq FROM g0 GROUP BY k)""".stripMargin
    for (t <- 1 to T) {
      parts += s"""d$t AS (SELECT e.vec_id, e.eq, c.k,
         |  CAST(list_sum(list_transform(range(1,${D + 1}),
         |    i -> (e.eq[i]-c.cq[i])*(e.eq[i]-c.cq[i]))) AS BIGINT) AS dist
         | FROM e CROSS JOIN c${t - 1} c),
         |a$t AS (SELECT vec_id, eq, k, dist FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, k ASC) AS rn
         |  FROM d$t) WHERE rn = 1)""".stripMargin
      parts += centroidCtes(t, s"a$t")
      parts += s"""s$t AS (SELECT k, COUNT(*) AS n_k,
         |  CAST(SUM(dist // 1000) AS BIGINT) AS wcss_q FROM a$t GROUP BY k),
         |o$t AS (SELECT $t AS iter, c.k, COALESCE(s.n_k, 0) AS n_k,
         |  COALESCE(s.wcss_q, 0) AS wcss_q, CAST(list_sum(c.cq) AS BIGINT) AS c_sum
         | FROM c$t c LEFT JOIN s$t s ON s.k = c.k)""".stripMargin
    }
    val union = (1 to T).map(t => s"SELECT * FROM o$t").mkString(" UNION ALL ")
    s"""WITH ${parts.mkString(",\n")}
       |SELECT CAST(iter AS BIGINT) AS iter, CAST(k AS BIGINT) AS k,
       |  CAST(n_k AS BIGINT) AS n_k, wcss_q, c_sum
       |FROM ($union) ORDER BY iter, k""".stripMargin
  }

  def queries: Map[String, Q] = Map("ml_kmeans" -> mlKmeans)
  def oracle: Map[String, String] = Map("ml_kmeans" -> kmeansSql)

  // ------------------------------------------------------------------
  // st_kmeans oracle (the streaming mini-batch variant lives in
  // streaming/StreamQueries; the math and its replay stay in this
  // file): B sequential batches, batch t assigned against the
  // centroids AFTER batch t−1 (batch 0 against its own hash-shard
  // means), centroids updated from CUMULATIVE exact integer sufficient
  // statistics — floorMean over everything assigned so far, which is
  // exactly what the driver's running (n, Σ) state computes.
  // ------------------------------------------------------------------
  private[graft] val B = 4 // micro-batches; membership (vec_id div 4) % B

  private[graft] def streamKmeansSql: String = {
    val parts = collection.mutable.ArrayBuffer[String]()
    parts += s"""e AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)) AS eq
       | FROM embeddings)""".stripMargin
    for (t <- 0 until B)
      parts += s"b$t AS (SELECT vec_id, eq FROM e WHERE (vec_id // 4) % $B = $t)"
    // init: hash-shard means of batch 0
    parts += s"""m0 AS (SELECT vec_id % $K AS k, generate_subscripts(eq,1) AS dim, unnest(eq) AS v FROM b0),
       |g0 AS (SELECT k, dim, CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
       |       FROM m0 GROUP BY k, dim),
       |c0 AS (SELECT k, list(cv ORDER BY dim) AS cq FROM g0 GROUP BY k)""".stripMargin
    for (t <- 0 until B) {
      val used = if (t == 0) "c0" else s"cc${t - 1}"
      parts += s"""d$t AS (SELECT b.vec_id, b.eq, c.k,
         |  CAST(list_sum(list_transform(range(1,${D + 1}),
         |    i -> (b.eq[i]-c.cq[i])*(b.eq[i]-c.cq[i]))) AS BIGINT) AS dist
         | FROM b$t b CROSS JOIN $used c),
         |a$t AS (SELECT vec_id, eq, k, dist FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, k ASC) AS rn
         |  FROM d$t) WHERE rn = 1)""".stripMargin
      val cumUnion = (0 to t).map(i => s"SELECT k, eq FROM a$i").mkString(" UNION ALL ")
      parts += s"""au$t AS ($cumUnion),
         |mm$t AS (SELECT k, generate_subscripts(eq,1) AS dim, unnest(eq) AS v FROM au$t),
         |gg$t AS (SELECT k, dim, CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
         |        FROM mm$t GROUP BY k, dim),
         |ccr$t AS (SELECT k, list(cv ORDER BY dim) AS cq FROM gg$t GROUP BY k),
         |cc$t AS (SELECT p.k, COALESCE(cr.cq, p.cq) AS cq
         |        FROM $used p LEFT JOIN ccr$t cr ON cr.k = p.k),
         |s$t AS (SELECT k, COUNT(*) AS n_k,
         |  CAST(SUM(dist // 1000) AS BIGINT) AS wcss_q FROM a$t GROUP BY k),
         |o$t AS (SELECT $t AS batch, c.k, COALESCE(s.n_k, 0) AS n_k,
         |  COALESCE(s.wcss_q, 0) AS wcss_q, CAST(list_sum(c.cq) AS BIGINT) AS c_sum
         | FROM cc$t c LEFT JOIN s$t s ON s.k = c.k)""".stripMargin
    }
    val union = (0 until B).map(t => s"SELECT * FROM o$t").mkString(" UNION ALL ")
    s"""WITH ${parts.mkString(",\n")}
       |SELECT CAST(batch AS BIGINT) AS batch, CAST(k AS BIGINT) AS k,
       |  CAST(n_k AS BIGINT) AS n_k, wcss_q, c_sum
       |FROM ($union) ORDER BY batch, k""".stripMargin
  }
}
