package graft.tools

import org.apache.spark.sql.SparkSession

/** Explicit incremental-dedup index build (VERDICT r6 §3): one full
  * scan of the curated corpus under `<sfDir>/documents.parquet` that
  * persists the exact layer's 16-byte content-hash relation and the
  * near layer's banded token-hash signatures where `dd_incremental`
  * probes them. The query path also builds lazily on first touch; this
  * tool exists because at 100 TB the index build (a full-corpus scan +
  * write, run once per corpus version) and the per-batch probe
  * (O(batch) joins against the index) have completely different
  * resource shapes — the PqBuild/IvfBuild discipline.
  *
  * Usage: runMain graft.tools.DedupIndexBuild <sfDir>
  */
object DedupIndexBuild {
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
    val path = graft.llm.Dedup.dedupIndexBuild(spark, sfDir)
    println(f"[dedup-index-build] $path built in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
