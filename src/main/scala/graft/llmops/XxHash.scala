package graft.llmops

/** xxHash32/64 — the checksum primitives of the lz4 frame format and the
  * zstd frame format (RFC 8878 §3.1.1 uses the low 32 bits of XXH64).
  * Straight implementations of the public xxHash spec; verified in the
  * codec specs against checksums produced by the reference `lz4`/`zstd`
  * command-line tools.
  */
object XxHash {

  private final val P32_1 = 0x9E3779B1 // 2654435761
  private final val P32_2 = 0x85EBCA77 // 2246822519
  private final val P32_3 = 0xC2B2AE3D // 3266489917
  private final val P32_4 = 0x27D4EB2F // 668265263
  private final val P32_5 = 0x165667B1 // 374761393

  private def rd32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  def xxh32(b: Array[Byte], off: Int, len: Int, seed: Int): Int = {
    var i = off
    val end = off + len
    var h = 0
    if (len >= 16) {
      var a1 = seed + P32_1 + P32_2
      var a2 = seed + P32_2
      var a3 = seed
      var a4 = seed - P32_1
      val limit = end - 16
      while (i <= limit) {
        a1 = Integer.rotateLeft(a1 + rd32(b, i) * P32_2, 13) * P32_1
        a2 = Integer.rotateLeft(a2 + rd32(b, i + 4) * P32_2, 13) * P32_1
        a3 = Integer.rotateLeft(a3 + rd32(b, i + 8) * P32_2, 13) * P32_1
        a4 = Integer.rotateLeft(a4 + rd32(b, i + 12) * P32_2, 13) * P32_1
        i += 16
      }
      h = Integer.rotateLeft(a1, 1) + Integer.rotateLeft(a2, 7) +
        Integer.rotateLeft(a3, 12) + Integer.rotateLeft(a4, 18)
    } else h = seed + P32_5
    h += len
    while (i + 4 <= end) {
      h = Integer.rotateLeft(h + rd32(b, i) * P32_3, 17) * P32_4
      i += 4
    }
    while (i < end) {
      h = Integer.rotateLeft(h + (b(i) & 0xff) * P32_5, 11) * P32_1
      i += 1
    }
    h ^= h >>> 15
    h *= P32_2
    h ^= h >>> 13
    h *= P32_3
    h ^= h >>> 16
    h
  }

  private final val P64_1 = 0x9E3779B185EBCA87L
  private final val P64_2 = 0xC2B2AE3D27D4EB4FL
  private final val P64_3 = 0x165667B19E3779F9L
  private final val P64_4 = 0x85EBCA77C2B2AE63L
  private final val P64_5 = 0x27D4EB2F165667C5L

  private def rd64(b: Array[Byte], i: Int): Long =
    (rd32(b, i) & 0xFFFFFFFFL) | ((rd32(b, i + 4) & 0xFFFFFFFFL) << 32)

  private def round64(acc: Long, lane: Long): Long =
    java.lang.Long.rotateLeft(acc + lane * P64_2, 31) * P64_1

  def xxh64(b: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    var i = off
    val end = off + len
    var h = 0L
    if (len >= 32) {
      var a1 = seed + P64_1 + P64_2
      var a2 = seed + P64_2
      var a3 = seed
      var a4 = seed - P64_1
      val limit = end - 32
      while (i <= limit) {
        a1 = round64(a1, rd64(b, i))
        a2 = round64(a2, rd64(b, i + 8))
        a3 = round64(a3, rd64(b, i + 16))
        a4 = round64(a4, rd64(b, i + 24))
        i += 32
      }
      h = java.lang.Long.rotateLeft(a1, 1) + java.lang.Long.rotateLeft(a2, 7) +
        java.lang.Long.rotateLeft(a3, 12) + java.lang.Long.rotateLeft(a4, 18)
      h = (h ^ round64(0L, a1)) * P64_1 + P64_4
      h = (h ^ round64(0L, a2)) * P64_1 + P64_4
      h = (h ^ round64(0L, a3)) * P64_1 + P64_4
      h = (h ^ round64(0L, a4)) * P64_1 + P64_4
    } else h = seed + P64_5
    h += len
    while (i + 8 <= end) {
      h = java.lang.Long.rotateLeft(h ^ round64(0L, rd64(b, i)), 27) * P64_1 + P64_4
      i += 8
    }
    if (i + 4 <= end) {
      h = java.lang.Long.rotateLeft(h ^ ((rd32(b, i) & 0xFFFFFFFFL) * P64_1), 23) *
        P64_2 + P64_3
      i += 4
    }
    while (i < end) {
      h = java.lang.Long.rotateLeft(h ^ ((b(i) & 0xffL) * P64_5), 11) * P64_1
      i += 1
    }
    h ^= h >>> 33
    h *= P64_2
    h ^= h >>> 29
    h *= P64_3
    h ^= h >>> 32
    h
  }
}
