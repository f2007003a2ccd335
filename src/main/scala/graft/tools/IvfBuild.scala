package graft.tools

import org.apache.spark.sql.SparkSession

/** Explicit IVF index build (the FAISS-style "train + add" job): fits
  * the coarse quantizer over `<sfDir>/embeddings.parquet` and persists
  * assignments + centroids where `ann_ivf` probes them. The query path
  * also builds lazily on first touch; this tool exists so an operator
  * can (re)build out-of-band — at 100 TB index build and probe are
  * separate jobs with separate resource shapes.
  *
  * Usage: runMain graft.tools.IvfBuild <sfDir>
  */
object IvfBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val path = graft.llm.Similarity.ivfBuild(spark, sfDir)
    println(f"[ivf-build] $path built in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
