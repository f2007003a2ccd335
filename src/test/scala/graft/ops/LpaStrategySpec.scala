package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The r19 LPA labels-side strategy branch (broadcast under the node
  * threshold, shuffle over it — Graph.lpaBroadcastLabels) must be
  * RESULT-INVISIBLE: both paths run the same (count desc, label asc)
  * argmax, only join strategy and adjacency layout differ. Forcing the
  * threshold to 0 exercises the shuffle path on the gate corpus and
  * pins equality with the default (broadcast) path — the focused test
  * the strategy branch ships with. */
class LpaStrategySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String): Array[String] = {
    val rows = Graph.queries(name)(spark, sf).collect()
    rows.map(_.toString).sorted
  }

  test("gr_lpa and gr_lpa_conv: shuffle-path labels equal broadcast-path labels") {
    for (name <- Seq("gr_lpa", "gr_lpa_conv")) {
      val viaBroadcast = run(name) // default threshold: broadcast path
      spark.conf.set("graft.lpa.broadcastMaxNodes", "0")
      try {
        val viaShuffle = run(name)
        assert(viaBroadcast.sameElements(viaShuffle),
          s"$name: strategy branch changed the result")
      } finally spark.conf.unset("graft.lpa.broadcastMaxNodes")
    }
  }
}
