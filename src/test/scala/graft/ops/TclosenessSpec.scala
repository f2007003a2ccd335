package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** dq_tcloseness (Li et al., ICDE 2007 — the skew attack l-diversity
  * misses): the oracle gate hash-replays the whole ladder; pinned here
  * is the rule's internal consistency against an independent
  * plain-Scala variational-distance replay, that both statuses are
  * live, and that the THIRD rung genuinely adds signal — some group
  * passes l-diversity yet fails t-closeness. */
class TclosenessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // sf0.01: the measured 20-ok/18-violating split (sf0.001's smaller
  // per-user event counts push every group's distribution past t)
  private val sf = "/root/testdata/sf0.01"

  private lazy val rows =
    Quality.queries("dq_tcloseness")(spark, sf).collect()

  test("status is exactly the integer rule over the displayed distance's numerator") {
    // independent replay: per-user profile from raw events
    val ev = graft.io.Sources.table(spark, sf, "events")
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
    val byUser = ev.groupBy(_._2).toSeq // toSeq: mapping a Map would
    // collapse same-(QI, sensitive) users into one entry
    val prof = byUser.map { case (_, es) =>
      val dom = es.groupBy(_._4).view.mapValues(_.size).toSeq
        .sortBy { case (t, c) => (-c, t) }.head._1
      val sens = es.maxBy(e => (e._3.getTime, e._3.getNanos, e._1))._4
      val vol = es.length / 5
      ((dom, vol), sens)
    }.toSeq
    val global = prof.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val bigN = prof.size.toLong
    val expect = prof.groupBy(_._1).map { case (qi, ms) =>
      val n = ms.size.toLong
      val cs = ms.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val num = global.map { case (v, cg) =>
        math.abs(cs.getOrElse(v, 0L) * bigN - cg * n)
      }.sum
      (qi, if (num * 5 > 2 * 2 * n * bigN) "violating" else "ok")
    }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qi = (r.getAs[String]("dom"), r.getAs[Long]("vol").toInt)
      assert(expect(qi) == r.getAs[String]("status"),
        s"group $qi: engine ${r.getAs[String]("status")}, replay ${expect(qi)}")
    }
  }

  test("both statuses live; the ladder adds signal over l-diversity") {
    val st = rows.map(_.getAs[String]("status")).toSet
    assert(st == Set("ok", "violating"), s"statuses $st - the gate gates nothing")
    val ldiv = Quality.queries("dq_ldiversity")(spark, sf).collect()
      .map(r => ((r.getAs[String]("dom"), r.getAs[Long]("vol")),
        r.getAs[String]("status"))).toMap
    val tclose = rows.map(r => ((r.getAs[String]("dom"), r.getAs[Long]("vol")),
      r.getAs[String]("status"))).toMap
    assert(ldiv.keySet == tclose.keySet, "the two audits see different groups")
    val skewCaught = tclose.exists { case (qi, s) =>
      s == "violating" && ldiv(qi) == "ok"
    }
    assert(skewCaught,
      "no group is l-diverse yet t-far - the third rung added nothing here")
  }
}
