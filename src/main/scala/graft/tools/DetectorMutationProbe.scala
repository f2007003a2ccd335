package graft.tools

import org.apache.spark.sql.functions._

/** Winnow-vs-minhash-vs-substr complementarity probe (VERDICT r11 next
  * §5): which near-dup detector catches which EDIT CLASS, at what
  * cost — the question a real curation user asks when ordering the
  * dedup stages. Plants nBase unique documents plus one mutated copy
  * each (ids offset by 1e6) under graded edit rates, runs all three
  * pair detectors through their production seams, and reports planted-
  * pair recall + wall-clock per (edit class, rate). Deterministic
  * corpus, no RNG. The findings live as a guidance note in
  * `llm/Dedup.scala` and a table in BASELINE.md.
  *
  * Edit classes:
  *  - insert:  a fresh token spliced after every ⌈1/rate⌉ tokens
  *  - delete:  every ⌈1/rate⌉-th token dropped
  *  - substitute: every ⌈1/rate⌉-th token replaced with a fresh one
  *  - reorder: the 4 quarter-blocks of tokens emitted as 2,1,4,3
  *  - prefix:  a 40-char unique prefix prepended (pure position shift)
  *
  * Run: `sbt 'runMain graft.tools.DetectorMutationProbe'` */
object DetectorMutationProbe {
  private val nBase = 200
  private val tokensPerDoc = 80
  private val offset = 1000000L

  private def baseTokens(k: Int): Vector[String] =
    (0 until tokensPerDoc).map(i => s"d${k}t$i").toVector

  private def mutate(tks: Vector[String], k: Int, edit: String, rate: Double): String = {
    val every = math.max(1, math.ceil(1.0 / rate).toInt)
    val out = edit match {
      case "insert" =>
        tks.zipWithIndex.flatMap { case (t, i) =>
          if ((i + 1) % every == 0) Seq(t, s"x${k}i$i") else Seq(t) }
      case "delete" =>
        tks.zipWithIndex.collect { case (t, i) if (i + 1) % every != 0 => t }
      case "substitute" =>
        tks.zipWithIndex.map { case (t, i) =>
          if ((i + 1) % every == 0) s"x${k}s$i" else t }
      case "reorder" =>
        val q = tks.length / 4
        tks.slice(q, 2 * q) ++ tks.slice(0, q) ++ tks.slice(3 * q, 4 * q) ++
          tks.slice(2 * q, 3 * q)
      case "prefix" =>
        Vector(s"UNIQUE-PREFIX-FOR-DOC-$k-0123456789-SHIFT") ++ tks
    }
    out.mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val scenarios =
      (for (e <- Seq("insert", "delete", "substitute"); r <- Seq(0.05, 0.15, 0.30))
        yield (e, r)) ++ Seq(("reorder", 0.0), ("prefix", 0.0))

    println(f"${"edit"}%-12s ${"rate"}%5s  ${"minhash"}%13s  ${"winnow"}%13s  ${"substr"}%13s   (recall of $nBase planted pairs; seconds)")
    for ((edit, rate) <- scenarios) {
      val rows = (0 until nBase).flatMap { k =>
        val tks = baseTokens(k)
        Seq((k.toLong, tks.mkString(" ")),
          (k.toLong + offset, mutate(tks, k, edit, rate)))
      }
      val docs = rows.toDF("doc_id", "text").persist()
      docs.count()
      def recallOf(name: String, pairs: org.apache.spark.sql.DataFrame,
          a: String, b: String): (Double, Double) = {
        val t0 = System.nanoTime()
        val got = pairs.select(col(a), col(b)).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val caught = (0 until nBase).count(k =>
          got.contains((k.toLong, k.toLong + offset)))
        spark.sharedState.cacheManager.clearCache()
        docs.persist(); docs.count()
        (caught.toDouble / nBase, secs)
      }
      val (rm, tm) = recallOf("minhash",
        graft.llm.Dedup.minhashPairsImpl(docs, 64L), "doc_a", "doc_b")
      val (rw, tw) = recallOf("winnow",
        graft.llm.Dedup.winnowPairsImpl(docs), "da", "db")
      val (rs, ts) = recallOf("substr",
        graft.llm.Dedup.substrSpansImpl(docs).select("doc_a", "doc_b").distinct(),
        "doc_a", "doc_b")
      println(f"$edit%-12s $rate%5.2f  $rm%6.2f $tm%5.1f s  $rw%6.2f $tw%5.1f s  $rs%6.2f $ts%5.1f s")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
