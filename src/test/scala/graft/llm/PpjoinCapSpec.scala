package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** dd_ppjoin_capped (the collision-list cap, VERDICT r14 next §4): the
  * oracle gate hash-replays the whole capped pipeline; pinned here is
  * what the hash cannot ASSERT — the cap's declared semantics against
  * an independent plain-Scala truth set: soundness (every emitted pair
  * is truly ≥ τ), the measured recall trade (viral pairwise edges are
  * traded for linear star edges — pair-level recall drops, CONNECTIVITY
  * recall stays 1.0), and that the planted corpus actually exercises
  * the cap (uncapped collision lists exceed it; capped ones cannot). */
class PpjoinCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  // the engine's default — read THROUGH the engine (the NswUpsertSpec
  // constants rule), so a retune retunes the independent replay too
  private val cap = Dedup.ppjoinDfCapDefault
  private val tau = 0.9

  // independent replay: planted corpus -> distinct shingle-hash sets
  private lazy val sets: Map[Long, Set[Long]] = {
    val docs = graft.io.Sources.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.map { case (id, text0) =>
      val text = if (id % 10 == 3) Dedup.ppjoinViral else text0
      val toks = text.split(" ")
      val shs: Set[Long] = toks.sliding(3).filter(_.length == 3)
        .map(_.mkString(" "))
        .map(s => graft.functions.TextHashKernels.fnv64(
          org.apache.spark.unsafe.types.UTF8String.fromString(s))).toSet
      (id, shs)
    }.toMap
  }

  private def jac(a: Set[Long], b: Set[Long]): Double = {
    val i = (a & b).size
    i.toDouble / (a.size + b.size - i)
  }

  private lazy val truth: Set[(Long, Long)] = {
    val ids = sets.keys.toArray.sorted.filter(sets(_).nonEmpty)
    (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      a = sets(ids(i)); b = sets(ids(j))
      if math.min(a.size, b.size) * 10 >= math.max(a.size, b.size) * 9
      if jac(a, b) >= tau
    } yield (ids(i), ids(j))).toSet
  }

  private lazy val emitted: Set[(Long, Long)] =
    Dedup.queries("dd_ppjoin_capped")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("sound: every emitted pair is truly >= tau; the trade is real") {
    assert(emitted.nonEmpty && truth.nonEmpty)
    val bogus = emitted -- truth
    assert(bogus.isEmpty, s"emitted pairs below tau: ${bogus.take(5)}")
    // the declared recall trade: the viral class's quadratic pairwise
    // edges are withheld (star edges are linear in the class size)
    assert(emitted.size < truth.size,
      "cap traded nothing - the corpus no longer exercises it")
    info(f"pair-level recall ${emitted.size.toDouble / truth.size}%.3f " +
      s"(${emitted.size}/${truth.size}) - connectivity recall asserted 1.0 below")
  }

  test("zero connectivity loss: star edges keep every truth component intact") {
    def components(edges: Set[(Long, Long)]): Map[Long, Set[Long]] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      edges.flatMap(e => Seq(e._1, e._2)).groupBy(find).map {
        case (r, m) => (r, m.toSet)
      }
    }
    val ct = components(truth).values.toSet
    val ce = components(emitted).values.toSet
    assert(ct == ce, "capped output merges or splits a truth component")
  }

  test("non-default caps work end to end: the knob changes the trade, soundly") {
    // graft.ppjoin.dfCap is a deployment knob the hash gate can't cover
    // (the DuckDB twin interpolates the default — ADVICE r15); pin the
    // knob's semantics here instead. Effectively-uncapped (2^30): no
    // prefix token is hot, so the full truth set — including the viral
    // class's quadratic C(n/10, 2) pairs — is emitted exactly. A tight
    // cap (4): still sound, and never emits MORE than the default cap
    // (the trade is monotone in the cap).
    def runAt(c: Int): Set[(Long, Long)] = {
      spark.conf.set("graft.ppjoin.dfCap", c.toString)
      try Dedup.queries("dd_ppjoin_capped")(spark, sf)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.conf.unset("graft.ppjoin.dfCap")
    }
    val uncapped = runAt(1 << 30)
    assert(uncapped == truth,
      s"uncapped run is not the lossless join: only-engine ${(uncapped -- truth).take(3)}, " +
        s"only-truth ${(truth -- uncapped).take(3)}")
    val viralClass = sets.keys.count(_ % 10 == 3)
    val viralPairs = truth.count { case (a, b) => a % 10 == 3 && b % 10 == 3 }
    assert(viralPairs == viralClass.toLong * (viralClass - 1) / 2,
      "the uncapped truth set must carry the full viral quadratic")
    val tight = runAt(4)
    assert((tight -- truth).isEmpty, "tight cap emitted a pair below tau")
    assert(tight.size <= emitted.size,
      s"cap 4 emitted ${tight.size} pairs > default cap's ${emitted.size}")
    info(s"pairs: uncapped ${uncapped.size}, default-cap ${emitted.size}, cap-4 ${tight.size}")
  }

  test("the cap bites: uncapped prefix collision lists exceed it") {
    // plain-Scala prefix replay: (df asc, hash asc) order, prefix
    // p = sz - ceil(0.9 sz) + 1, width = docs carrying the token in
    // their prefix
    val df = sets.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val widths = scala.collection.mutable.Map[Long, Int]().withDefaultValue(0)
    sets.foreach { case (_, tk) =>
      if (tk.nonEmpty) {
        val sz = tk.size
        val p = sz - (9 * sz + 9) / 10 + 1
        tk.toArray.sortBy(h => (df(h), h)).take(p).foreach(h => widths(h) += 1)
      }
    }
    val maxW = widths.values.max
    assert(maxW > cap,
      s"max prefix collision list $maxW <= cap $cap - the plant is dead")
    // and the viral class alone explains it: the hot tokens are exactly
    // as wide as the planted class
    val viralClass = sets.keys.count(_ % 10 == 3)
    assert(maxW == viralClass, s"hot width $maxW != viral class $viralClass")
    info(s"hot tokens ${widths.count(_._2 > cap)}, max width $maxW, cap $cap")
  }
}
