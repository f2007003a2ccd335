package graft.tools
import org.apache.spark.sql.functions._

/** Unigram-LM trainer economics probe (the bpe_train_rich merges/s
  * analog): run the init + EM loop over the md5-derived rich corpus
  * (10k distinct 12-hex words at sf0.1, 16-symbol alphabet — the same
  * corpus bpe_train_rich trains on) and report per-round wall time and
  * E-step segmentation throughput. The E-step is scan-local (one
  * Catalyst-compiled fold per word against a broadcast LUT), so the
  * per-round cost tracks the DISTINCT-WORD table, not corpus bytes —
  * the number that matters at 100 TB, where the word table is ~10⁷
  * rows regardless of corpus size. */
object UnigramScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val words = graft.io.Sources.table(spark, sf, "events")
      .select(substring(md5(col("event_id").cast("string")), 1, 12).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val nWords = words.count()
    for (rounds <- Seq(1, 2)) {
      val t0 = System.nanoTime()
      val v = graft.llm.Unigram.trainOn(words, rounds)
      val nPieces = v.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"unigram rich: words=$nWords pieces=$nPieces em_rounds=$rounds " +
        f"wall=$secs%6.2f s words_segmented_per_s=${nWords * rounds / secs}%,.0f")
    }
    spark.stop()
  }
}
