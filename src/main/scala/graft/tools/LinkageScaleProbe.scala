package graft.tools

import org.apache.spark.sql.functions._

/** 100×/1000× scale probe for dd_linkage's blocking join (round 13):
  * the operator's scale claim is candidates = Σ block², never n² — with
  * md5-uniform keys and an 8-char blocking prefix (4 hex chars = 65536
  * blocks), block sizes stay ~n/65536 and the join is linear-ish in n.
  * The probe builds the SAME key derivation over synthetic id ranges
  * (keys derive from ids only — no text involved), runs the blocked
  * join + exact verify, and reports wall-clock, candidate volume, and
  * found pairs at n = 50k / 500k / 5M ids.
  *
  * Run: `sbt 'runMain graft.tools.LinkageScaleProbe'` */
object LinkageScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (n <- Seq(50000L, 500000L, 5000000L)) {
      val base = spark.range(n).select(col("id").as("doc_id"),
        concat(lit("ent-"), substring(
          md5(concat(lit("key-"), col("id").cast("string")).cast("binary")),
          1, 12)).as("k"))
      val donors = base.select((col("doc_id") + 1).as("doc_id"), col("k").as("dk"))
      val keys = base.join(donors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 3 && col("dk").isNotNull,
            concat(substring(col("dk"), 1, 9), lit("z"), substring(col("dk"), 11, 6)))
            .otherwise(col("k")).as("k"))
      val a = keys.select(col("doc_id").as("doc_a"), col("k").as("key_a"),
        substring(col("k"), 1, 8).as("blk"))
      val b = keys.select(col("doc_id").as("doc_b"), col("k").as("key_b"),
        substring(col("k"), 1, 8).as("blk"))
      val cand = a.join(b, Seq("blk")).filter(col("doc_a") < col("doc_b"))
      val t0 = System.nanoTime()
      val nCand = cand.count()
      val tCand = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val found = cand
        .filter(levenshtein(col("key_a"), col("key_b")) <= 2).count()
      val sec = (System.nanoTime() - t1) / 1e9
      val expected = n / 7 // ids ≡ 3 (mod 7) with an existing donor
      println(f"n=$n%8d  candidates=$nCand%10d (${tCand}%5.1f s)  " +
        f"pairs=$found%8d (expected ~$expected%d)  verify=${sec}%5.1f s")
    }
    spark.stop()
  }
}
