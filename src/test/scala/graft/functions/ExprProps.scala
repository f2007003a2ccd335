package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property checks pinning the round-3 native kernels against
  * independent straight-line reference implementations:
  *
  *  - `countTokensInSet` (the fused split+membership kernel behind
  *    ts_quality/ts_langid) must agree with `String.split(" ", -1)` +
  *    set membership on arbitrary texts — including empty strings,
  *    consecutive/leading/trailing spaces, and multi-byte UTF-8;
  *  - `signLshKeys` (the loop kernel that replaced the literal
  *    plane-array expression tree) must reproduce the original
  *    per-plane dot-product formula bit-for-bit — the LSH bucket
  *    layout is load-bearing for dd_embcos/ann_lsh results.
  */
object ExprProps extends Properties("nativeExprs") {

  private val wordGen = Gen.oneOf("the", "a", "of", "und", "der", "fox", "naïve", "日本", "x1", "")
  private val textGen = for {
    words <- Gen.listOf(wordGen)
    sep <- Gen.oneOf(" ", "  ", " ")
  } yield words.mkString(sep)
  private val setGen = Gen.someOf(Seq("the", "a", "of", "und", "der")).map(_.toSeq)

  property("countTokensInSet == split-based reference count") =
    forAll(textGen, setGen) { (text, set) =>
      val expected = text.split(" ", -1).count(set.contains)
      val actual = TextHashKernels.countTokensInSet(
        UTF8String.fromString(text), set.map(UTF8String.fromString).toArray)
      actual == expected.toLong
    }

  property("shingles3 == sliding-window reference over split(-1) tokens") =
    forAll(textGen) { text =>
      val toks = text.split(" ", -1)
      val expected =
        if (toks.length < 3) Seq.empty[String]
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      val actual = TextHashKernels.shingles3(UTF8String.fromString(text))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.asInstanceOf[UTF8String].toString).toSeq
      actual == expected
    }

  private val vecGen = Gen.listOfN(64, Gen.choose(-3.0, 3.0)).map(_.toArray)
  private val nTables = 12
  private val planesPerTable = 6

  property("signLshKeys == per-plane dot-product formula") =
    forAll(vecGen) { v =>
      val keys = ArrayKernels.signLshKeys(
        new GenericArrayData(v), nTables, planesPerTable).toLongArray()
      (0 until nTables).forall { tb =>
        var key = 0L
        for (p <- 0 until planesPerTable) {
          val plane = tb * planesPerTable + p
          var dot = 0.0
          for (i <- v.indices) dot += v(i) * ArrayKernels.planeSign(plane, i, v.length)
          if (dot >= 0) key |= (1L << p)
        }
        keys(tb) == key
      }
    }
}
