package graft.tools

import org.apache.spark.sql.SparkSession

/** Measured ANN operating-point report (VERDICT r11 next §2): after
  * wiring ann_tune's knee (nProbe=4) into the IVF serving default,
  * print each served family's recall vs the exact baseline on a given
  * corpus dir — the numbers behind the raised LlmOpsSpec recall-gate
  * floors and the BASELINE.md operating-point table.
  *
  * Usage: runMain graft.tools.AnnOperatingPoint <sfDir>
  */
object AnnOperatingPoint {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.llm.Similarity.queries
    val exact = q("knn_cosine")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(name: String): Double = {
      val served = q(name)(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact & served).size.toDouble / exact.size
    }
    for (name <- Seq("ann_lsh", "ann_ivf", "ann_pq", "ann_ivf_pq"))
      println(f"$name%-12s recall=${recallOf(name)}%.4f  ($d)")
    for (name <- Seq("ann_filtered_recall", "ann_lifecycle_recall"))
      println(f"$name%-22s row=${q(name)(spark, d).collect().head}  ($d)")
    println("ann_tune curve:")
    q("ann_tune")(spark, d).collect().foreach(r => println(s"  $r"))
    spark.stop()
  }
}
