package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** w15_anomaly / ts_entropy / tx_sft_render invariants beyond the
  * oracle hash: flag-state coverage, self-exclusion of the anomaly
  * frame, entropy bounds against the 27-symbol alphabet, and exact
  * template-offset arithmetic. */
class WindowAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("w15: all three flag states occur; zscore present iff warm") {
    val rows = Events.queries("w15_anomaly")(spark, sf).collect()
    val flags = rows.map(_.getAs[String]("w15_flag")).toSet
    assert(flags == Set("anomaly", "normal", "cold"))
    rows.foreach { r =>
      val warm = r.getAs[String]("w15_flag") != "cold"
      assert(warm == !r.isNullAt(r.fieldIndex("zscore")), r.toString)
      if (r.getAs[String]("w15_flag") == "anomaly")
        assert(math.abs(r.getAs[Double]("zscore")) > 2.0 - 1e-4)
    }
    // a row's own value must not enter its frame: the first event of
    // every user is always cold (empty trailing frame)
    val firsts = graft.io.Sources.table(spark, sf, "events")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")))
      .filter(col("rk") === 1).select("event_id")
      .collect().map(_.getLong(0)).toSet
    rows.filter(r => firsts(r.getAs[Long]("event_id")))
      .foreach(r => assert(r.getAs[String]("w15_flag") == "cold"))
  }

  test("ts_entropy: H in (0, ln 27]; flag threshold honored") {
    val rows = graft.llm.TextOps.queries("ts_entropy")(spark, sf).collect()
    val hMax = math.log(27.0) + 1e-9
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_nats")
      assert(h > 0 && h <= hMax, r.toString)
      val fl = r.getAs[String]("entropy_flag")
      if (h < 2.8 - 1e-4) assert(fl == "low")
      if (h > 2.8 + 1e-4) assert(fl == "ok")
    }
  }

  test("w16_markov: per-state probabilities sum to 1; start mass = user count") {
    val rows = Events.queries("w16_markov")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byFrom = rows.groupBy(_.getAs[String]("from_type"))
    byFrom.foreach { case (f, rs) =>
      val mass = rs.map(_.getAs[Double]("p_trans")).sum
      assert(math.abs(mass - 1.0) < 1e-2, s"$f mass $mass") // dround(4) per cell
    }
    val nUsers = graft.io.Sources.table(spark, sf, "events")
      .select("user_id").distinct().count()
    val startMass = byFrom("start").map(_.getAs[Long]("n_trans")).sum
    assert(startMass == nUsers) // exactly one sequence head per user
  }

  test("tx_sft_render: offsets exactly delimit the assistant span") {
    val rows = graft.llm.TextOps.queries("tx_sft_render")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val render = r.getAs[String]("render")
      val ms = r.getAs[Long]("mask_start").toInt
      val ml = r.getAs[Long]("mask_len").toInt
      assert(ms + ml == render.length)
      val resp = render.substring(ms)
      assert(resp.length == ml)
      assert(render.startsWith("<|user|>\n"))
      assert(render.contains("\n<|assistant|>\n"))
      // the masked span is exactly what follows the assistant tag
      assert(render.endsWith("\n<|assistant|>\n" + resp))
    }
  }
}
