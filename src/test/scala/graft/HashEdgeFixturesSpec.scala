package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-edge fixtures for the text-hash kernels. The SAME constants
  * are asserted by tools/check_oracle.py against its Python ports at gate
  * time — if either side's tokenization drifts (Java trim vs space trim,
  * limit 0 vs limit -1 split, the [""] empty-input token), exactly one side
  * moves and both gates fail loudly.
  *
  * Pinned behaviors:
  *  - SimhashKernel: JAVA trim (all chars <= 0x20) then Java `\s+` split
  *    limit 0 — the empty string yields ONE empty token, so simhash64("")
  *    is the empty-token fingerprint, never 0 (only NULL maps to 0).
  *  - ShingleKernel: SPACE-ONLY trim then split limit -1 (interior/leading
  *    empties kept) — "\tfoo  bar " keeps the leading empty token and its
  *    " foo" shingle.
  */
class HashEdgeFixturesSpec extends AnyFunSuite {

  private val simhashFixtures = Seq(
    "" -> 1623186167237621560L,
    " " -> 1623186167237621560L,
    "\tfoo  bar " -> 36172837473223106L,
    "ab" -> 2328396192264757248L,
    "x y x y" -> 2306265226510696449L,
    "  leading" -> -7380553930011554175L,
    "trailing  " -> -5496704393787668268L,
    "one" -> 804238397367804588L)

  private val shingleFixtures = Seq(
    "" -> Seq.empty[String],
    " " -> Seq.empty[String],
    "\tfoo  bar " -> Seq(" foo", "foo bar"),
    "ab" -> Seq("a b"),
    "x y x y" -> Seq("x y", "y x"),
    "  leading" -> Seq.empty[String],
    "trailing  " -> Seq.empty[String],
    "one" -> Seq.empty[String])

  test("SimhashKernel matches the cross-engine edge fixtures") {
    simhashFixtures.foreach { case (text, expected) =>
      assert(expr.SimhashKernel.simhash64(UTF8String.fromString(text)) === expected,
        s"simhash64(${text.replace("\t", "\\t")})")
    }
  }

  test("ShingleKernel matches the cross-engine edge fixtures (n=2)") {
    shingleFixtures.foreach { case (text, expected) =>
      val arr = expr.ShingleKernel.shingles(UTF8String.fromString(text), 2)
      val got = (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      assert(got === expected, s"shingles(${text.replace("\t", "\\t")}, 2)")
    }
  }
}
