package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

/** The fused NormalizeText kernel must be byte-identical to the regex
  * chain trim(collapse(strip(lower(t)))) it replaced — checked by a
  * JVM-regex reimplementation of the chain over adversarial and random
  * inputs (the CharEntropy equivalence discipline). */
object NormalizeSpec extends Properties("NormalizeText") {

  private def regexChain(s: String): String =
    s.toLowerCase
      .replaceAll("[^a-z0-9 ]", "")
      .replaceAll(" +", " ")
      .trim

  private def kernel(s: String): String =
    NormalizeKernels.normalize(UTF8String.fromString(s)).toString

  property("hand-picked adversarial cases") = {
    Seq(
      "", " ", "   ", "a", " a ", "A.B", "a . b", "..a..", "a,b  c!!d",
      "Hello,  World! 123", "tabs\tand\nnewlines", "trailing space ",
      " leading", "UPPER lower 0123456789", "a  b   c    d",
      "éüñ non-ascii dropped", "mixed É a É b", "1.5% of $100",
      // ADVICE r9: code points whose LOWERCASE maps into [a-z0-9] must
      // survive like the lower()-first oracle chain — Kelvin sign
      // U+212A → 'k', dotted capital İ U+0130 → 'i' (+ a combining dot
      // the strip then drops), Å sign U+212B → 'å' (dropped)
      "Kelvin", "İstanbul", "aK bİ", "Å unit",
      "K", "x İ y")
      .forall(s => kernel(s) == regexChain(s))
  }

  private val alpha = Gen.oneOf(('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
    Seq(' ', ' ', ' ', '.', ',', '!', '\t', '\n', '%', 'é', '→', 'K', 'İ'))
  private val strs = Gen.listOf(alpha).map(_.mkString)

  property("random hostile strings agree with the regex chain") =
    forAll(strs) { s => kernel(s) == regexChain(s) }
}
