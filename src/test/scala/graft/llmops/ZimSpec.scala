package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ZimSpec extends SparkTestBase {

  private def fixture(codec: String): Array[Byte] = {
    val content = (0 until 20).map { i =>
      ("A", f"page$i%03d", s"Page $i",
        if (i % 4 == 0) "text/html" else "text/plain",
        (if (i % 4 == 0) s"<html><body><p>Body of page $i</p></body></html>"
         else s"Plain body of page $i").getBytes("UTF-8"))
    } :+ (("I", "logo.png", "Logo", "image/png",
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)))
    val redirects = Seq(
      ("A", "start", "Start here", ("A", "page000")),
      ("A", "zzz_alias", "Alias", ("A", "page007")))
    ZimWriter.write(content, redirects, codec, blobsPerCluster = 6)
  }

  private def tmpFile(bytes: Array[Byte]): String = {
    val f = java.nio.file.Files.createTempFile("graft-zim", ".zim")
    java.nio.file.Files.write(f, bytes)
    f.toString
  }

  test("write+read round-trips content across all three cluster codecs") {
    for (codec <- Seq("none", "xz", "zstd")) {
      val path = tmpFile(fixture(codec))
      val rows = Zim.readEntries(spark, path)
        .filter(col("content").isNotNull)
        .select(col("namespace"), col("url"), col("title"), col("mime"),
          col("content"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), new String(r.getAs[Array[Byte]](4), "UTF-8")))
        .sortBy(_._2)
      assert(rows.length == 21, codec)
      assert(rows.count(_._4 == "text/html") == 5, codec)
      val p7 = rows.find(_._2 == "page007").get
      assert(p7._5 == "Plain body of page 7", codec)
      assert(p7._3 == "Page 7", codec)
      val logo = rows.find(_._2 == "logo.png").get
      assert(logo._1 == "I" && logo._4 == "image/png", codec)
    }
  }

  test("redirects resolve one hop and carry null content") {
    val path = tmpFile(fixture("zstd"))
    val red = Zim.readEntries(spark, path)
      .filter(col("mime") === "redirect")
      .select(col("url"), col("redirect_url"), col("content"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.get(2)))
      .sortBy(_._1)
    assert(red.map(t => (t._1, t._2)).toSeq ==
      Seq(("start", "A/page000"), ("zzz_alias", "A/page007")))
    assert(red.forall(_._3 == null))
  }

  test("articleText extracts html and decodes plain, drops assets") {
    val path = tmpFile(fixture("zstd"))
    val texts = Zim.articleText(Zim.readEntries(spark, path))
      .select(col("url"), col("page_text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(texts.size == 20) // logo + redirects dropped
    assert(texts("page001") == "Plain body of page 1")
    assert(texts("page004").contains("Body of page 4"))
    assert(!texts("page004").contains("<html"))
  }

  test("trailing md5 verifies; a flipped byte fails it") {
    val bytes = fixture("xz")
    val good = tmpFile(bytes)
    assert(Zim.verifyChecksum(spark, good))
    val bad = bytes.clone()
    bad(200) = (bad(200) ^ 0x01).toByte
    assert(!Zim.verifyChecksum(spark, tmpFile(bad)))
  }

  test("bad magic and oversize entry counts refuse up front") {
    val bytes = fixture("zstd")
    val badMagic = bytes.clone(); badMagic(0) = 'X'.toByte
    val e1 = intercept[IllegalArgumentException] {
      Zim.readEntries(spark, tmpFile(badMagic))
    }
    assert(e1.getMessage.contains("bad magic"))
    val tooMany = bytes.clone()
    // entryCount u32 at offset 24 → 8M (above the driver budget)
    tooMany(24) = 0; tooMany(25) = 0; tooMany(26) = 0x80.toByte; tooMany(27) = 0
    val e2 = intercept[IllegalArgumentException] {
      Zim.readEntries(spark, tmpFile(tooMany))
    }
    assert(e2.getMessage.contains("driver budget"))
  }

  test("a corrupt cluster drops only its own blobs") {
    val bytes = fixture("zstd")
    val path = tmpFile(bytes)
    val all = Zim.readEntries(spark, path)
      .filter(col("content").isNotNull).count()
    assert(all == 21)
    // find the first cluster's span via the directory and mangle its body
    val conf = spark.sparkContext.hadoopConfiguration
    val (h, _, _, clusterPtrs, _) = Zim.readDirectory(conf, path)
    assert(h.clusterCount >= 2)
    val bad = bytes.clone()
    val c0 = clusterPtrs(0).toInt
    var i = c0 + 1
    while (i < c0 + 9) { bad(i) = (bad(i) ^ 0x5a).toByte; i += 1 }
    val badPath = tmpFile(bad)
    val left = Zim.readEntries(spark, badPath)
      .filter(col("content").isNotNull).count()
    assert(left < all && left > 0)
  }
}
