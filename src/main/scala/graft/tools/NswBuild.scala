package graft.tools

import org.apache.spark.sql.SparkSession

/** Explicit NSW graph build (the IvfBuild pattern, VERDICT r14 next
  * §3): constructs the per-shard navigable-small-world graphs over
  * `<sfDir>/embeddings.parquet` and persists them where `ann_nsw_serve`
  * beam-searches. The serve path also builds lazily on first touch;
  * this tool exists so an operator can (re)build out-of-band — at
  * 100 TB graph build and serve are separate jobs with separate
  * resource shapes (build is CPU-bound per shard; serve is a broadcast
  * fan-out + merge).
  *
  * Usage: runMain graft.tools.NswBuild <sfDir>
  */
object NswBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val path = graft.llm.Similarity.nswBuild(spark, sfDir)
    println(f"[nsw-build] $path built in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
