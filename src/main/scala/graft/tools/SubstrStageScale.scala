package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.ArrayFns

/** 1000×-scale stage-size probe for the dd_substr family (VERDICT r13
  * next §5): dd_linkage's candidate arithmetic was validated at 5M
  * keys; this does the same for the most load-bearing dedup path. The
  * probe measures the EXACT row count of every pre-extension stage —
  * sel (positioned fingerprints), banded (df-band 2..32 + occ ≤ 64
  * survivors), pairs (the fph self-join), groups (distinct (doc_a,
  * doc_b) extension tasks) and the max seeds handed to one extension
  * call — on the SubstrScaleProbe adversarial corpus (every doc has
  * exactly one 10%-insert mutant, so nothing bands out: worst-case
  * pairing) at several sizes, demonstrating the growth law directly.
  * On this corpus every stage is provably LINEAR in doc count: fps per
  * doc are corpus-size-independent (winnow density ~L/2.5), each
  * shared fp has df exactly 2 ⇒ one pair, and the df-band/occ caps are
  * the knob that keeps a production corpus in the same regime (an fp
  * in > 32 docs or > 64 occurrences never reaches the self-join, so
  * per-fp pair fanout is bounded by construction — the boilerplate
  * cap). Measured linearity at 0.5/1/2M docs licenses the arithmetic
  * extrapolation to the 5M-doc (1000× the sf0.1 gate corpus) row in
  * BASELINE.md without budgeting a 50 GB shuffle on this host.
  *
  * Run: `sbt 'runMain graft.tools.SubstrStageScale [nBase...]'`
  * (default 250000 500000 1000000 → 0.5M/1M/2M docs). */
object SubstrStageScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(250000, 500000, 1000000)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"docs"}%9s ${"n_sel"}%13s ${"n_banded"}%13s ${"n_pairs"}%13s " +
      f"${"n_groups"}%11s ${"max_seeds"}%9s ${"sec"}%7s")
    for (nBase <- sizes) {
      // the SubstrScaleProbe corpus, built in-memory (no parquet round
      // trip needed — the probe counts, it does not extend)
      val base = spark.range(nBase).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(79)),
          i => concat(lit("d"), col("id"), lit("t"), i)), " ").as("text"))
      val mutant = spark.range(nBase).select((col("id") + nBase).as("doc_id"),
        array_join(flatten(transform(sequence(lit(0), lit(79)),
          i => when((i + 1) % 10 === 0,
              array(concat(lit("d"), col("id") , lit("t"), i),
                concat(lit("x"), col("id"), lit("i"), i)))
            .otherwise(array(concat(lit("d"), col("id"), lit("t"), i))))), " ")
          .as("text"))
      val docs = base.unionByName(mutant)
      val t0 = System.nanoTime()
      // substrSpansImpl's stages verbatim (diagnostic copy — the gated
      // implementation stays the source of truth)
      val sel = docs
        .select(col("doc_id"),
          explode(array_distinct(
            ArrayFns.winnowSel(col("text"), withPositions = true))).as("pf"))
        .select(col("doc_id"),
          expr("CAST(substr(pf, 1, 8) AS BIGINT)").as("pos"),
          xxhash64(expr("substr(pf, 10)")).as("fph"))
        .persist()
      val nSel = sel.count()
      val band = sel.groupBy("fph")
        .agg(countDistinct(col("doc_id")).as("nd"), count(lit(1)).as("occ"))
        .filter(col("nd").between(2, 32) && col("occ") <= 64)
        .select("fph")
      val banded = sel.join(band, Seq("fph"), "left_semi").persist()
      val nBanded = banded.count()
      val seeds = banded.select(col("doc_id").as("doc_a"), col("pos").as("ap"), col("fph"))
        .join(banded.select(col("doc_id").as("doc_b"), col("pos").as("bp"), col("fph")), Seq("fph"))
        .filter(col("doc_a") < col("doc_b"))
      val nPairs = seeds.count()
      val g = seeds.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ns"))
        .agg(count(lit(1)).as("groups"), max(col("ns")).as("mx")).head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"${2L * nBase}%9d $nSel%13d $nBanded%13d $nPairs%13d " +
        f"${g.getLong(0)}%11d ${g.getLong(1)}%9d $sec%7.1f")
      sel.unpersist(blocking = false)
      banded.unpersist(blocking = false)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
