package graft.oracle

/** DuckDB SQL generator for Spark's `xxhash64` (XXH64, seed 42,
  * little-endian) over ASCII strings — the missing piece that lets the
  * production-hash query paths (xxhash64 simhash, seeded minhash) be
  * oracle-gated instead of rows-only checked.
  *
  * Wrapping 64-bit arithmetic is expressed in HUGEINT with explicit
  * `mod 2^64` reductions; wrapping multiplies use the 32-bit split
  * `(lo·b + ((hi·b) mod 2^32)·2^32) mod 2^64` (each partial product
  * ≤ 2^96, well inside HUGEINT); rotations split into disjoint
  * shifted halves. The 32-byte stripe loop is a recursive CTE (depth =
  * ⌈len/32⌉, 0 for word-sized tokens); the ≤31-byte tail — up to three
  * 8-byte words, one 4-byte word, up to three bytes — is unrolled as
  * guarded CTE stages with staged subquery aliases so no subexpression
  * is textually repeated more than thrice.
  *
  * Validated token-for-token against `functions.xxhash64` on 319
  * strings (lengths 0–100, incl. 31/32/33/63/64 boundaries) and the
  * seeded two-argument form on 256 (string, int) pairs.
  *
  * ASCII assumption: byte i of the UTF-8 encoding is read as
  * `ord(substr(t, i, 1))`, exact for code points < 128 — the same
  * assumption every md5-portable oracle in this file family makes.
  */
object XxHash64Sql {

  private val M = "18446744073709551616::HUGEINT"
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"

  /** (a * b) mod 2^64 for a, b < 2^64, via the 32-bit split. */
  private def mulmod(a: String, b: String): String =
    s"((($a) % 4294967296) * $b::HUGEINT + (((($a) // 4294967296) * " +
      s"$b::HUGEINT) % 4294967296) * 4294967296) % $M"

  /** rotl64: disjoint high/low halves summed (equivalent to `|`). */
  private def rotl(x: String, r: Int): String = {
    val hi = (BigInt(1) << r).toString
    val lo = (BigInt(1) << (64 - r)).toString
    s"((($x) * $hi::HUGEINT) % $M + ($x) // $lo::HUGEINT)"
  }

  /** Little-endian n-byte load of ascii string `t` at 1-based pos `p`. */
  private def le(t: String, p: String, nBytes: Int): String =
    (0 until nBytes).map { j =>
      s"ord(substr($t, ($p) + $j, 1))::HUGEINT * ${BigInt(1) << (8 * j)}::HUGEINT"
    }.mkString("(", " + ", ")")

  /** XXH64 round with zero accumulator: mulmod(rotl(lane·P2, 31), P1). */
  private def round0(lane: String): String =
    mulmod(rotl("(" + mulmod(lane, P2) + ")", 31), P1)

  /** Stripe-merge stage over alias `h` and lane alias `v`. */
  private def mergeStage(v: String): String =
    s"(${mulmod(s"xor(h, (${round0(v)}))", P1)} + $P4::HUGEINT) % $M"

  private def w8Stage(name: String, prev: String, wIdx: Int): String = {
    val lane = le("t", s"ns*32 + ${8 * wIdx} + 1", 8)
    val cond = s"bl >= ns*32 + ${8 * (wIdx + 1)}"
    val inner = s"SELECT t, bl, ns, h, CASE WHEN $cond THEN $lane ELSE 0::HUGEINT END AS lw FROM $prev"
    val mid = s"SELECT t, bl, ns, h, ${mulmod("lw", P2)} AS m1 FROM ($inner)"
    val mid2 = s"SELECT t, bl, ns, h, ${mulmod(rotl("m1", 31), P1)} AS k1 FROM ($mid)"
    val mid3 = s"SELECT t, bl, ns, h, xor(h, k1) AS hx FROM ($mid2)"
    val stepped = s"(${mulmod(rotl("hx", 27), P1)} + $P4::HUGEINT) % $M"
    s"  $name AS (SELECT t, bl, ns, CASE WHEN $cond THEN $stepped ELSE h END AS h FROM ($mid3))"
  }

  private def w4Stage(name: String, prev: String): String = {
    val off = "(ns*32 + ((bl - ns*32) // 8) * 8)"
    val lane = le("t", "o4 + 1", 4)
    val inner = s"SELECT t, bl, ns, h, $off AS o4 FROM $prev"
    val mid = s"SELECT t, bl, ns, h, o4, CASE WHEN bl >= o4 + 4 THEN $lane ELSE 0::HUGEINT END AS lw FROM ($inner)"
    val mid2 = s"SELECT t, bl, ns, h, o4, xor(h, ${mulmod("lw", P1)}) AS hx FROM ($mid)"
    val stepped = s"(${mulmod(rotl("hx", 23), P2)} + $P3::HUGEINT) % $M"
    s"  $name AS (SELECT t, bl, ns, CASE WHEN bl >= o4 + 4 THEN $stepped ELSE h END AS h FROM ($mid2))"
  }

  private def b1Stage(name: String, prev: String, bIdx: Int): String = {
    val off = "(ns*32 + ((bl - ns*32) // 8) * 8 + CASE WHEN bl >= ns*32 + " +
      "((bl - ns*32) // 8) * 8 + 4 THEN 4 ELSE 0 END)"
    val inner = s"SELECT t, bl, ns, h, $off AS ob FROM $prev"
    val byte = s"ord(substr(t, ob + $bIdx + 1, 1))::HUGEINT"
    val mid = s"SELECT t, bl, ns, h, ob, CASE WHEN bl >= ob + ${bIdx + 1} THEN $byte ELSE 0::HUGEINT END AS bv FROM ($inner)"
    val mid2 = s"SELECT t, bl, ns, h, ob, xor(h, ${mulmod("bv", P5)}) AS hx FROM ($mid)"
    val stepped = mulmod(rotl("hx", 11), P1)
    s"  $name AS (SELECT t, bl, ns, CASE WHEN bl >= ob + ${bIdx + 1} THEN $stepped ELSE h END AS h FROM ($mid2))"
  }

  /** CTE chain computing XXH64(t, seed) of every DISTINCT string in a
    * preceding CTE `xk_in(t)`. Final CTE: `xk_h(t, h)` with h HUGEINT in
    * [0, 2^64). Must be spliced into a `WITH RECURSIVE` list.
    */
  def kernel(seed: String = "42"): String = {
    val s = s"$seed::HUGEINT"
    val lanes =
      s"""          SELECT t, bl, ns, k, v1, v2, v3, v4,
            ${le("t", "k*32 + 1", 8)} AS l1,
            ${le("t", "k*32 + 9", 8)} AS l2,
            ${le("t", "k*32 + 17", 8)} AS l3,
            ${le("t", "k*32 + 25", 8)} AS l4
          FROM xk_str WHERE k < ns"""
    val xs =
      s"""        SELECT t, bl, ns, k,
          (v1 + ${mulmod("l1", P2)}) % $M AS x1,
          (v2 + ${mulmod("l2", P2)}) % $M AS x2,
          (v3 + ${mulmod("l3", P2)}) % $M AS x3,
          (v4 + ${mulmod("l4", P2)}) % $M AS x4
        FROM (
$lanes)"""
    val rs =
      s"""      SELECT t, bl, ns, k,
        ${rotl("x1", 31)} AS r1,
        ${rotl("x2", 31)} AS r2,
        ${rotl("x3", 31)} AS r3,
        ${rotl("x4", 31)} AS r4
      FROM (
$xs)"""
    val parts = Seq.newBuilder[String]
    parts += "  xk_tok AS (SELECT DISTINCT t FROM xk_in)"
    parts += "  xk_len AS (SELECT t, strlen(t) AS bl, (strlen(t) // 32) AS ns FROM xk_tok)"
    parts +=
      s"""  xk_str AS (
    SELECT t, bl, ns, 0 AS k,
      ($s + $P1::HUGEINT + $P2::HUGEINT) % $M AS v1,
      ($s + $P2::HUGEINT) % $M AS v2,
      $s % $M AS v3,
      ($s - $P1::HUGEINT + $M) % $M AS v4
    FROM xk_len
    UNION ALL
    SELECT t, bl, ns, k + 1,
      ${mulmod("r1", P1)},
      ${mulmod("r2", P1)},
      ${mulmod("r3", P1)},
      ${mulmod("r4", P1)}
    FROM (
$rs))"""
    parts += "  xk_v AS (SELECT t, bl, ns, v1, v2, v3, v4 FROM xk_str WHERE k = ns)"
    parts += s"  xk_g0 AS (SELECT t, bl, ns, v1, v2, v3, v4, CASE WHEN ns > 0 THEN (" +
      s"${rotl("v1", 1)} + ${rotl("v2", 7)} + ${rotl("v3", 12)} + ${rotl("v4", 18)}" +
      s") % $M ELSE ($s + $P5::HUGEINT) % $M END AS h FROM xk_v)"
    Seq("v1", "v2", "v3", "v4").zipWithIndex.foreach { case (v, i) =>
      parts += s"  xk_g${i + 1} AS (SELECT t, bl, ns, v1, v2, v3, v4, " +
        s"CASE WHEN ns > 0 THEN ${mergeStage(v)} ELSE h END AS h FROM xk_g$i)"
    }
    parts += s"  xk_hl AS (SELECT t, bl, ns, (h + bl) % $M AS h FROM xk_g4)"
    parts += w8Stage("xk_w1", "xk_hl", 0)
    parts += w8Stage("xk_w2", "xk_w1", 1)
    parts += w8Stage("xk_w3", "xk_w2", 2)
    parts += w4Stage("xk_w4", "xk_w3")
    parts += b1Stage("xk_b1", "xk_w4", 0)
    parts += b1Stage("xk_b2", "xk_b1", 1)
    parts += b1Stage("xk_b3", "xk_b2", 2)
    parts += s"  xk_a1 AS (SELECT t, ${mulmod("xor(h, h // 8589934592)", P2)} AS h FROM xk_b3)"
    parts += s"  xk_a2 AS (SELECT t, ${mulmod("xor(h, h // 536870912)", P3)} AS h FROM xk_a1)"
    parts += "  xk_h AS (SELECT t, xor(h, h // 4294967296) AS h FROM xk_a2)"
    parts.result().mkString(",\n")
  }

  /** CTE chain extending [[kernel]]'s `xk_h` with Spark's seeded
    * two-argument form `xxhash64(t, lit(i))` for an IntegerType literal:
    * `XXH64.hashInt(i, seed = XXH64(t, 42))` — the 4-byte fold (validated
    * against pyspark on 208 (string, int) pairs; the LongType form would
    * be an 8-byte fold with different constants). Seeds are 0 ≤ i < 2^31
    * so `input & 0xFFFFFFFF` = i. Final CTE: `xk_hs(t, i, h)`.
    */
  def seededKernel(nSeeds: Int): String = {
    val base = s"SELECT t, h AS sd, i FROM xk_h, range(0, $nSeeds) si(i)"
    val st0 = s"SELECT t, i, (sd + $P5::HUGEINT + 4) % $M AS h0 FROM ($base)"
    val st1 = s"SELECT t, i, xor(h0, ${mulmod("i::HUGEINT", P1)}) AS hx FROM ($st0)"
    val st2 = s"SELECT t, i, (${mulmod(rotl("hx", 23), P2)} + $P3::HUGEINT) % $M AS h FROM ($st1)"
    Seq(
      s"  xk_s0 AS ($st2)",
      s"  xk_s1 AS (SELECT t, i, ${mulmod("xor(h, h // 8589934592)", P2)} AS h FROM xk_s0)",
      s"  xk_s2 AS (SELECT t, i, ${mulmod("xor(h, h // 536870912)", P3)} AS h FROM xk_s1)",
      "  xk_hs AS (SELECT t, i, xor(h, h // 4294967296) AS h FROM xk_s2)"
    ).mkString(",\n")
  }

  /** Reinterpret an unsigned HUGEINT column expression in [0, 2^64) as a
    * signed BIGINT (Java Long two's complement) — required wherever the
    * engine compares or orders the hash as a Long.
    */
  def signed(h: String): String =
    s"CAST(CASE WHEN ($h) >= 9223372036854775808::HUGEINT " +
      s"THEN ($h) - $M ELSE ($h) END AS BIGINT)"
}
