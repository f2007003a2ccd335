package graft.tools

import org.apache.spark.sql.SparkSession

/** Explicit PQ codebook build (the FAISS-style "train" job): fits the
  * 8 per-block quantizers over `<sfDir>/embeddings.parquet` and
  * persists the 128-row codebook where `pq_encode` reads it. The
  * query path also builds lazily on first touch; this tool exists so
  * an operator can (re)build out-of-band — including force-rebuilding
  * a stale codebook for a changed corpus dir — because at 100 TB
  * training (a sampled k-means job) and encoding (a map-side
  * broadcast join over everything) have completely different
  * resource shapes.
  *
  * Usage: runMain graft.tools.PqBuild <sfDir>
  */
object PqBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val path = graft.llm.Similarity.pqBuild(spark, sfDir)
    println(f"[pq-build] $path built in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
