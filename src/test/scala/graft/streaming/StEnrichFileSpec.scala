package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** st_enrich_file (VERDICT r12 next §3): the value equality against the
  * batch CASE-ladder twin is under the driver's hash gate; what the
  * gate cannot see is the SHAPE claims — that the file-stream source
  * actually split the landing directory into multiple micro-batches
  * (maxFilesPerTrigger=2 over 4 staged files), and that the output
  * arrived through the idempotent batch_id-partitioned sink rather
  * than one monolithic write. Both are observable in the sink layout,
  * pinned here. */
class StEnrichFileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file-stream source splits the landing dir into >= 2 micro-batches") {
    val out = StreamQueries.queries("st_enrich_file")(spark, "/root/testdata/sf0.001")
    val rows = out.count()
    assert(rows > 0)
    val sink = new java.io.File(
      s"/dev/shm/graft_stream/pid_${ProcessHandle.current().pid()}/stenrichfile/out")
    assert(sink.isDirectory, s"sink dir missing: $sink")
    val batches = Option(sink.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(batches.length >= 2,
      s"expected >= 2 micro-batch partitions, found ${batches.map(_.getName).mkString(", ")}")
    // the batches partition the input: their union is the full events
    // table (no batch lost, none duplicated by the idempotent sink)
    val n = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "events").count()
    assert(rows == n, s"sink rows $rows != events rows $n")
  }
}
