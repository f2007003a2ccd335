package graft.tools

import org.apache.spark.sql.functions._

/** r18 operator scale probe — the 100×/1000× house rule applied to
  * this round's additions:
  *
  *   - `ann_nsw_reshard`: the RESHARD JOB alone (one (vec_id, ven)
  *     shuffle + the per-shard rebuild at 2× the stored count, written
  *     to the versioned sibling) and the full gated query (job +
  *     serve + rerank), at sf0.1 / 100× / 1000×. The claim under
  *     test: reshard ≈ a fresh build at the new count minus the
  *     source scan — at 1000× that is the policy's 32 → 64 shards,
  *     31k nodes/shard, so the rebuild should come in well UNDER the
  *     36.4 s 32-shard build (smaller shards, 64 tasks over 32
  *     cores).
  *   - `dq_rtbf_ann`: the full erasure sweep at sf0.1 / 100× (the
  *     1000× IVF/PQ index builds are priced by their own tools; the
  *     sweep's graph leg is the compact probe's shape). Claim: wall
  *     is the forced NSW sweep + two broadcast anti-joins — index
  *     builds excluded via ensure* prestage.
  *
  * Corpora are NswScaleProbe's replications (/tmp/sf10emb,
  * /tmp/sfemb1000 — run it first if absent). min-of-3 per the bench
  * discipline (one-shot pairs are unreliable on this host).
  *
  * Run: sbt 'runMain graft.tools.R18ScaleProbe [rtbf1000]' */
object R18ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; clear(); (System.nanoTime() - t0) / 1e9
    }
    def minOf3(f: => Unit): (Double, Seq[Double]) = {
      val xs = (1 to 3).map(_ => time(f))
      (xs.min, xs)
    }

    val dirs = Seq(("/root/testdata/sf0.1", "sf0.1"),
      ("/tmp/sf10emb", "100x"), ("/tmp/sfemb1000", "1000x"))
    dirs.foreach { case (dir, label) =>
      if (!new java.io.File(dir + "/embeddings.parquet").exists)
        println(s"[r18-scale] $label: $dir missing - run NswScaleProbe first")
      else {
        graft.llm.Similarity.ensureNswIndexFor(spark, dir) // prestage, untimed
        val idx = graft.llm.Similarity.nswIndexPathFor(dir)
        val n0 = graft.llm.Similarity.nswShardCountFor(spark, dir)
        // the reshard JOB alone: shuffle + rebuild + write
        val (job, jobXs) = minOf3 {
          graft.llm.Similarity.nswReshard(
              spark, spark.read.parquet(s"$idx/graph"), n0 * 2)
            .write.mode("overwrite").parquet(s"$idx/reshard/graph")
        }
        // the full gated query (job + serve + rerank)
        val (full, fullXs) = minOf3 {
          graft.SparkEntry.queries("ann_nsw_reshard")(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        println(f"[r18-scale] reshard $label%-6s $n0%2d->${n0 * 2}%-3d shards  " +
          f"job=$job%7.2f s (${jobXs.map(x => f"$x%.2f").mkString("/")})  " +
          f"gated=$full%7.2f s (${fullXs.map(x => f"$x%.2f").mkString("/")})")
      }
    }

    val rtbfDirs = Seq(("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf10emb", "100x")) ++
      (if (args.contains("rtbf1000")) Seq(("/tmp/sfemb1000", "1000x")) else Seq.empty)
    rtbfDirs.foreach { case (dir, label) =>
      if (new java.io.File(dir + "/embeddings.parquet").exists) {
        // prestage every index the sweep reads, untimed (the Bench rule)
        graft.llm.Similarity.ensureIvfIndexFor(spark, dir)
        graft.llm.Similarity.ensurePqIndexFor(spark, dir)
        graft.llm.Similarity.ensureNswIndexFor(spark, dir)
        clear()
        val (t, xs) = minOf3 {
          graft.SparkEntry.queries("dq_rtbf_ann")(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        println(f"[r18-scale] rtbf_ann $label%-6s sweep=$t%7.2f s " +
          f"(${xs.map(x => f"$x%.2f").mkString("/")})")
      }
    }
    spark.stop()
  }
}
