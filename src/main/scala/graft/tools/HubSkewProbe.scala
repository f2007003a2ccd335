package graft.tools
import org.apache.spark.sql.functions._

/** Hub-skew graph probe (VERDICT r9 next §3): every gated graph
  * fixture is uniform (out-degree exactly 3), but real crawl graphs
  * are power-law — one hub page with ~n/10 in-links is the classic
  * PageRank straggler (its contribution list lands on one reducer if
  * nothing combines it earlier). This probe plants exactly that shape
  * and runs the SAME loop cores the gated queries use
  * ([[graft.ops.Graph.pagerankLoop]] / [[graft.ops.Graph.bfsLevels]] /
  * [[graft.ops.Graph.colorScc]]) on a uniform graph and on
  * uniform+hub at the same n, so the delta isolates the skew cost.
  *
  * Expected shape, and why no salting is needed here: the hub's
  * n/10-wide (dst=0, contrib) rows hit a partial HashAggregate in the
  * same stage as the rank⋈edges join — each of the 32 map tasks
  * combines its hub rows to ONE row before the shuffle, so at most
  * `tasks` hub rows ever move. BFS's `distinct()` collapses the
  * duplicated dst the same way. SCC's label updates are min-aggregates
  * — same partial-combine family. If the deltas below ever stop being
  * flat, the salting machinery in ops/Skew.scala is the lever.
  *
  * Run: `sbt 'runMain graft.tools.HubSkewProbe [n...]'` (default
  * 50000 500000). */
object HubSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(50000L, 500000L)
    for (n <- sizes) {
      val nodes = spark.range(n).select(col("id").as("doc_id"), lit(n).as("n_nodes"))
      val docs = nodes.select("doc_id")
      val uniform = nodes
        .select(col("doc_id").as("src"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("j"))
        .select(col("src"), pmod(col("src") * 31 + col("j") * 17 + 7, lit(n)).as("dst"))
      // the hub: every 10th node ALSO links to node 0 → n/10 in-edges
      val hub = nodes.filter(pmod(col("doc_id"), lit(10L)) === 0L)
        .select(col("doc_id").as("src"), lit(0L).as("dst"))
      for ((label, edges) <- Seq("uniform" -> uniform,
          "hub" -> uniform.unionByName(hub))) {
        val e = edges.persist(); e.count()
        def run(what: String)(f: => Long): Unit = {
          val t0 = System.nanoTime()
          val out = f
          println(f"$what%-12s $label%-8s n=$n%-7d wall=${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$out")
        }
        run("pagerank") {
          graft.ops.Graph.pagerankLoop(nodes, e, 5)
            .agg(count(lit(1))).head.getLong(0)
        }
        run("bfs") {
          graft.ops.Graph.bfsLevels(docs,
            docs.filter(pmod(col("doc_id"), lit(101L)) === 0L), e)
            .agg(count(lit(1))).head.getLong(0)
        }
        run("scc") {
          graft.ops.Graph.colorScc(docs, e.filter(col("src") =!= col("dst")))
            .agg(count(lit(1))).head.getLong(0)
        }
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
