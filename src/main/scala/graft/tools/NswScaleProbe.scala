package graft.tools

import org.apache.spark.sql.functions._

/** NSW scale probe (VERDICT r16 next §2 + §6; r17 next §1): the graph
  * family's scale story says per-probe serve work is shards × ef —
  * true PER PROBE, but beam PATH LENGTH grows with shard population.
  * The r17 rows measured the FIXED 8-shard layout out to 1000× (2M
  * vectors → 250k nodes/shard, build ≈ n^1.4 per shard); since r18 the
  * build picks shards from population (62.5k-node target, parallelism
  * cap — at 1000× on local[32] that is 32 shards → 62.5k nodes/shard),
  * and this probe verifies the policy flattens the build curve while
  * keeping steady serve within the fan-out budget. Compaction is
  * priced at 1× and 100× (and 1000× with `compact1000`):
  *
  *   - corpora: sf0.1 (250 nodes/shard), 100× (/tmp/sf10emb, the
  *     EmbScaleProbe replication — 25k/shard), 1000× (/tmp/sfemb1000
  *     — 250k/shard). Replication offsets vec_id by i·10⁶ per copy, so
  *     the probe set (vec_id < nProbes) and the tombstone plant
  *     (vec_id < 64) stay copy-0-only and CONSTANT across scales —
  *     the measured growth isolates shard population.
  *   - per corpus: explicit graph build (the NswBuild job), two serve
  *     passes over the persisted graph (second = steady state), and
  *     the ann_nsw_compact sweep at 1× and 100× (at 1000× pass
  *     `compact1000` to include it — the sweep rebuilds the
  *     above-average-garbage shards, so its cost is ~half a build).
  *
  * Run: sbt 'runMain graft.tools.NswScaleProbe [compact1000]' */
object NswScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"

    def replicate(out: String, copies: Int): Unit =
      if (!new java.io.File(out + "/embeddings.parquet").exists) {
        new java.io.File(out).mkdirs()
        val emb = spark.read.parquet(s"$src/embeddings.parquet")
        (0 until copies).map(i =>
          emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
          .reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
        println(s"built $out (${copies}x embeddings)")
      }
    replicate("/tmp/sf10emb", 100)
    replicate("/tmp/sfemb1000", 1000)

    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; clear(); (System.nanoTime() - t0) / 1e9
    }

    val rows = Seq(
      (src, "sf0.1", 1, true),
      ("/tmp/sf10emb", "100x", 100, true),
      ("/tmp/sfemb1000", "1000x", 1000, args.contains("compact1000")))
    val serveSteady = rows.map { case (dir, label, copies, doCompact) =>
      // fresh build every probe run: drop any prior index for this dir
      val idx = graft.llm.Similarity.nswIndexPathFor(dir)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
      val build = time(graft.llm.Similarity.nswBuild(spark, dir))
      // steady state = min of three passes (the Bench discipline): a
      // single pass pair measured serve2 > serve1 at 100×/1000× —
      // post-build GC/JIT tails land on EITHER pass, min absorbs them
      val serves = (1 to 3).map(_ =>
        time(graft.SparkEntry.queries("ann_nsw_serve")(spark, dir)
          .write.format("noop").mode("overwrite").save()))
      val compacts = if (doCompact) (1 to 3).map(_ =>
        time(graft.SparkEntry.queries("ann_nsw_compact")(spark, dir)
          .write.format("noop").mode("overwrite").save())) else Seq.empty
      val compact = if (doCompact) f"${compacts.min}%.2f" else "-"
      // the r18 policy picks the shard count from population — report
      // the count the build actually chose (read from the index meta)
      val shards = graft.llm.Similarity.nswShardCountFor(spark, dir)
      val perShard = copies * 2000 / shards
      println(f"[nsw-scale] $label%-7s shards=$shards%-3d nodes/shard=$perShard%-7d " +
        f"build=$build%8.2f s  serve=${serves.min}%7.2f s " +
        f"(samples ${serves.map(x => f"$x%.2f").mkString("/")})  " +
        f"compact=$compact s")
      (perShard, serves.min)
    }
    // the growth-law line: steady serve vs shard population
    serveSteady.sliding(2).foreach { case Seq((n0, s0), (n1, s1)) =>
      println(f"[nsw-scale] population x${n1 / n0}%-4d -> steady serve x${s1 / s0}%.2f")
    case _ => ()
    }
    spark.stop()
  }
}
