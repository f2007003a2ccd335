package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Curation suite invariants that the oracle hash gate cannot see:
  * shuffle-free plans for the scan-local ops, partition-completeness of
  * the packing, and the filter semantics of the curated composition. */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("ds_split assigns every doc exactly once, roughly 80/10/10") {
    val df = Curate.queries("ds_split")(spark, sf).cache()
    val total = df.count()
    assert(total == graft.io.Sources.table(spark, sf, "documents").count())
    val bySplit = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // content-hash buckets are uniform-ish; sf0.001 has 50 docs, so the
    // bands are loose — the point is all three splits are non-degenerate
    assert(bySplit("train") > total / 2, bySplit)
    assert(bySplit("val") < total / 2 && bySplit("test") < total / 2, bySplit)
    df.unpersist()
  }

  test("ds_split plan has no exchange (scan-local assignment)") {
    val df = Curate.queries("ds_split")(spark, sf)
    df.collect()
    // the trailing orderBy is presentation for the oracle; the
    // assignment itself (project) must not shuffle — the only exchange
    // allowed is the sort's range partitioning (no hash exchange means
    // no hidden aggregation/join in the assignment path)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("ds_mixture keeps at most the target share and full en slice") {
    val rows = Curate.queries("ds_mixture")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val weights = Curate.mixtureWeights.toMap
    rows.foreach { case (lang, (total, kept)) =>
      assert(kept <= total)
      // en threshold 10000 = keep everything, deterministically
      if (lang == "en") assert(kept == total, s"en: $kept/$total")
      // de threshold 1000: a 50-doc corpus slice should lose most docs
      if (lang == "de") assert(kept < total, s"de: $kept/$total")
      assert(weights.contains(lang) || kept == 0)
    }
  }

  test("ds_pack partitions all docs into budget-aligned sequences") {
    val seqs = Curate.queries("ds_pack")(spark, sf).collect()
    val nDocs = seqs.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == graft.io.Sources.table(spark, sf, "documents").count())
    // every sequence except possibly each shard's last must have started
    // a new doc past the budget boundary: its token sum plus anything
    // before it exceeds seq_id * budget — weak but structural: seq_ids
    // per shard are contiguous from 0
    seqs.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("seq_id")).sorted
      assert(ids.head == 0 && ids.zipWithIndex.forall { case (id, i) => id == i },
        ids.mkString(","))
    }
  }

  test("ds_sample is a pushed-down per-stratum top-k, deterministic") {
    val df = Curate.queries("ds_sample")(spark, sf)
    val rows = df.collect()
    df.collect() // re-execute: identical (content-hash order, no rand)
    assert(rows.sameElements(df.collect()))
    // every stratum returns at most k, ranks contiguous from 1
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val rks = rs.map(_.getAs[Long]("rk")).sorted
      assert(rks.head == 1L && rks.last == rks.length && rks.length <= 20)
    }
    // the rank filter must be pushed below the sort (WindowGroupLimit):
    // partial top-k per partition, never a full per-stratum sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("ds_decontam matches a from-scratch shingle-overlap recomputation") {
    val flagged = Curate.queries("ds_decontam")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_hit_shingles")).toMap
    // independent recomputation: plain Scala sets over collected text,
    // no Spark expressions shared with the query under test
    val docs = graft.io.Sources.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    def bucket(t: String): Long = {
      val h = graft.functions.TextHashKernels.rollingHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      ((h % 1000) + 1000) % 1000
    }
    val evalSh = docs.collect { case (_, t) if bucket(t) >= 900 => shingles(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val expected = docs.collect {
      case (id, t) if bucket(t) < 800 && (shingles(t) & evalSh).nonEmpty =>
        id -> (shingles(t) & evalSh).size.toLong
    }.toMap
    assert(flagged == expected)
  }

  test("bloom expression: zero false negatives, fpp-bounded false positives") {
    import spark.implicits._
    val present = (1L to 5000L).map(_ * 7L)
    val df = present.toDF("h")
    val bytes = graft.functions.BloomFns.buildLong(df, "h", 5000L, 0.01)
    val hits = df.filter(graft.functions.BloomFns
      .mightContainLong(col("h"), bytes)).count()
    assert(hits == 5000L, "bloom false negative — structurally impossible")
    // absent probes: fp rate must be within a loose multiple of the
    // requested 1% (the bound is probabilistic; 4x covers the variance)
    val absent = (1L to 20000L).map(_ * 7L + 3L).toDF("h")
    val fp = absent.filter(graft.functions.BloomFns
      .mightContainLong(col("h"), bytes)).count()
    assert(fp < 20000L * 0.04, s"fp rate ${fp / 20000.0}")
  }

  test("ds_decontam_bloom is bit-identical to the exact ds_decontam") {
    val exact = Curate.queries("ds_decontam")(spark, sf).collect().toSeq
    val bloom = Curate.queries("ds_decontam_bloom")(spark, sf).collect().toSeq
    assert(bloom == exact)
  }

  test("ds_curated keeps only dedup survivors with agreeing langid") {
    val rows = Curate.queries("ds_curated")(spark, sf).collect()
    val langs = rows.map(_.getString(0)).toSet
    // zh has no marker set: lang_pred can never be 'zh', so the curated
    // corpus must drop the slice entirely
    assert(!langs.contains("zh"), langs)
    assert(langs.nonEmpty)
    val curated = rows.map(_.getAs[Long]("n_docs")).sum
    val total = graft.io.Sources.table(spark, sf, "documents").count()
    assert(curated > 0 && curated < total, s"$curated of $total")
  }

  test("ds_curated2 is a strict refinement of ds_curated under the LM cut") {
    val base = Curate.queries("ds_curated")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    val cut = Curate.queries("ds_curated2")(spark, sf).collect()
    cut.foreach { r =>
      val lang = r.getString(0)
      // the perplexity filter can only REMOVE docs per language
      assert(r.getAs[Long]("n_docs") <= base(lang), s"$lang grew: $r")
      // surviving mean fluency must sit at or under the cut
      assert(r.getAs[Double]("avg_nats") <= 9.0, r.toString)
    }
    assert(cut.nonEmpty)
  }

  test("ds_weighted: k rows, contiguous ranks, ordered by quantized priority") {
    val rows = Curate.queries("ds_weighted")(spark, sf).collect()
    assert(rows.length == 50)
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to 50L))
    val prios = rows.map(_.getAs[Long]("priority_q")).toSeq
    assert(prios == prios.sorted.reverse, "not ranked by priority desc")
    // A-ES keys are ln(u)/w with u<1: strictly negative in nano-units
    assert(prios.forall(_ < 0))
  }

  test("ds_weighted phase-1 top-k is pushed below the sort (WindowGroupLimit)") {
    val df = Curate.queries("ds_weighted")(spark, sf)
    df.collect()
    // the salted per-group rank must plan a WindowGroupLimit — the
    // naive empty-partition global window measurably does not, and
    // would drag the whole corpus through one sort task
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("ds_weighted favors long documents (length-proportional inclusion)") {
    val picked = Curate.queries("ds_weighted")(spark, sf).collect()
      .map(_.getAs[Long]("n_chars"))
    val corpus = graft.io.Sources.table(spark, sf, "documents")
      .select(avg(col("n_chars"))).head.getDouble(0)
    // with w = n_chars the sampled mean length must sit clearly above
    // the corpus mean (sf0.001: 50 of 500 docs — a weak but stable bar)
    assert(picked.sum.toDouble / picked.length > corpus,
      s"sample mean ${picked.sum.toDouble / picked.length} vs corpus $corpus")
  }

  test("ds_temperature: rarest language keeps all; rates flatten toward the geometric mean") {
    val rows = Curate.queries("ds_temperature")(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("rate_micro"),
          r.getAs[Long]("n_kept"))).toMap
    val nMin = rows.values.map(_._1).min
    rows.foreach { case (lang, (n, rate, kept)) =>
      // the α=1/2 rule verbatim: rate = round(√(n_min/n_l)·1e6)
      assert(rate == math.round(math.sqrt(nMin.toDouble / n) * 1e6),
        s"$lang rate $rate")
      assert(kept <= n)
      // the hash bucket tracks the rate closely even at sf0.001 counts
      assert(math.abs(kept.toDouble / n - rate / 1e6) < 0.15,
        s"$lang kept ${kept.toDouble / n} vs rate ${rate / 1e6}")
    }
    val rarest = rows.minBy(_._2._1)
    assert(rarest._2._2 == 1000000L && rarest._2._3 == rarest._2._1,
      s"rarest language must keep everything: $rarest")
    // flattening: post-sample counts are ordered like the originals but
    // with strictly smaller relative spread (√-compression)
    val (pre, post) = (rows.values.map(_._1.toDouble), rows.values.map(_._3.toDouble))
    assert(pre.max / pre.min > post.max / post.min,
      s"spread must shrink: pre ${pre.max / pre.min} post ${post.max / post.min}")
  }
}
