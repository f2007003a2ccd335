package graft.tools
import org.apache.spark.sql.functions._

/** gr_scc giant-SCC scale probe (VERDICT r8 next §1 "done" criterion):
  * drive the ColorSCC core over a planted GIANT SCC — the regime where
  * the replaced transitive-closure doubling materialized Θ(n²)
  * reachability pairs — and record wall time plus the label-relation
  * width, which stays exactly n rows.
  *
  * The planted graph: u → (u+1) mod n (one Hamiltonian cycle — the
  * whole graph is a single SCC) plus chord u → (2u) mod n, which pulls
  * the diameter down to O(log n) — the small-world shape real crawl
  * giant SCCs have. Run at n = 5k (sf0.1 documents scale), 50k (10×),
  * and optionally beyond via args.
  *
  * Expected shape: forward/backward rounds grow ~log n; every shuffled
  * relation is (id, label) = n rows; the old doubling's pair set on
  * this graph reaches ~n·2^r rows by round r and n² at fixpoint —
  * 2.5e9 pairs at n = 50k, unrunnable, which is the point. */
object SccScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(5000L, 50000L)
    for (n <- sizes) {
      val nodes = spark.range(n).select(col("id").as("doc_id"))
      val edges = nodes
        .select(col("doc_id").as("src"),
          explode(array(
            pmod(col("doc_id") + 1L, lit(n)),
            pmod(col("doc_id") * 2L, lit(n)))).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      val t0 = System.nanoTime()
      val scc = graft.ops.Graph.colorScc(nodes, edges)
      val byId = scc.groupBy("scc_id").agg(count(lit(1)).as("sz")).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      require(byId.length == 1 && byId.head.getLong(0) == 0L && byId.head.getLong(1) == n,
        s"giant SCC must come back whole: ${byId.mkString(",")}")
      println(f"scc_giant n=$n%-7d wall=$secs%7.2f s label_rows=$n (pairs would be ${n * n}%,d)")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
