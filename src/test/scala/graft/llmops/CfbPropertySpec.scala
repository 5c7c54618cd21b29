package graft.llmops

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property test: arbitrary stream sets survive a [[CfbWriter]] →
  * [[Cfb]] round trip byte-exactly. Generated sizes straddle every
  * storage-path boundary — empty, one mini sector, non-multiples of 64,
  * the 4096-byte cutoff itself, and multi-sector regular chains — the
  * places off-by-one chain walking would corrupt silently.
  */
class CfbPropertySpec extends AnyFunSuite {

  // max 30 chars: the distinct-suffix digit below must stay within the
  // CFB 31-char name limit
  private val nameGen: Gen[String] = for {
    len <- Gen.choose(1, 30)
    cs <- Gen.listOfN(len, Gen.alphaNumChar)
  } yield cs.mkString

  private val sizeGen: Gen[Int] = Gen.oneOf(
    Gen.const(0), Gen.choose(1, 63), Gen.const(64), Gen.choose(65, 4095),
    Gen.const(4096), Gen.choose(4097, 20000))

  private val streamsGen: Gen[List[(String, Array[Byte])]] = for {
    n <- Gen.choose(1, 8)
    names <- Gen.listOfN(n, nameGen)
    sizes <- Gen.listOfN(n, sizeGen)
    seed <- Gen.choose(1L, Long.MaxValue)
  } yield {
    // distinct names (CFB directory keys); deterministic content per seed
    val distinct = names.zipWithIndex.map { case (nm, i) => s"$nm$i" }
    var x = seed | 1
    def next(): Byte = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x & 0xFF).toByte
    }
    distinct.zip(sizes).map { case (nm, sz) =>
      nm -> Array.fill(sz)(next())
    }
  }

  test("CFB round trip is byte-exact for arbitrary stream sets") {
    val prop = Prop.forAll(streamsGen) { streams =>
      val parts = Cfb.streams(CfbWriter.build(streams)).get
      parts.keySet == streams.map(_._1).toSet &&
        streams.forall { case (nm, data) =>
          java.util.Arrays.equals(parts(nm), data)
        }
    }
    val result = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
