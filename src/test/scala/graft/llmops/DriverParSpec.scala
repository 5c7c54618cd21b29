package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** [[DriverPar.parMap]] is the planning pass shared by every
  * multi-file container reader — these cases pin the contract the
  * readers rely on: input order, original exception types,
  * first-in-order failure, and actual latency hiding (the whole point:
  * a 100k-shard plan must not serialize 100k filesystem round-trips on
  * the driver).
  */
class DriverParSpec extends AnyFunSuite {

  test("preserves input order index-for-index") {
    val in = (0 until 257).map(i => s"item-$i")
    val out = DriverPar.parMap(in)(s => s.reverse)
    assert(out == in.map(_.reverse).toVector)
  }

  test("empty input short-circuits") {
    assert(DriverPar.parMap(Seq.empty[Int])(_ * 2).isEmpty)
  }

  test("parallelism 1 degrades to the serial loop") {
    val order = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = DriverPar.parMap(0 until 16, parallelism = 1) { i =>
      order += i; i * i
    }
    assert(out == (0 until 16).map(i => i * i).toVector)
    assert(order.toSeq == (0 until 16))
  }

  test("hides per-item latency: 32 x 100ms completes well under serial") {
    // serial would be >= 3.2 s; the pool runs all 32 at once. The
    // 1.6 s bound leaves 16x headroom over one batch's 100 ms — only
    // an actually-serial regression can trip it.
    val t0 = System.nanoTime()
    val out = DriverPar.parMap(0 until 32, parallelism = 32) { i =>
      Thread.sleep(100); i
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(out == (0 until 32).toVector)
    assert(elapsedMs < 1600L,
      s"planning pass took ${elapsedMs}ms for 32 x 100ms items — serial?")
  }

  test("rethrows the ORIGINAL exception of the first failure in input order") {
    val e = intercept[IllegalArgumentException] {
      DriverPar.parMap(0 until 10) { i =>
        if (i == 3) throw new IllegalArgumentException(s"bad shard $i")
        if (i == 7) throw new IllegalArgumentException(s"bad shard $i")
        i
      }
    }
    assert(e.getMessage == "bad shard 3")
  }

  test("refusal contract unchanged: reader requires surface as-is") {
    // mirrors the readers' require(...) refusals — an
    // IllegalArgumentException from inside f must not arrive wrapped
    val e = intercept[IllegalArgumentException] {
      DriverPar.parMap(Seq("a", "b")) { s =>
        require(s != "b", s"shard $s does not open with a valid header")
        s
      }
    }
    assert(e.getMessage.contains("does not open with a valid header"))
  }
}
