package graft.llmops

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{BytesWritable, LongWritable, SequenceFile, Text}
import org.apache.hadoop.io.SequenceFile.CompressionType
import org.apache.hadoop.io.compress.{DefaultCodec, GzipCodec, SnappyCodec}
import org.apache.spark.sql.functions._

class SeqFileSpec extends SparkTestBase {

  private def kv(n: Int): Seq[(String, String)] =
    (0 until n).map(i => (f"key$i%05d", s"value body $i " + ("x" * (i % 40))))

  private def hadoopWrite(path: String, pairs: Seq[(String, String)],
      ct: CompressionType,
      codec: org.apache.hadoop.io.compress.CompressionCodec): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.setInt("io.seqfile.compress.blocksize", 1024) // several blocks
    val opts = Seq(
      SequenceFile.Writer.file(new Path(path)),
      SequenceFile.Writer.keyClass(classOf[Text]),
      SequenceFile.Writer.valueClass(classOf[Text]),
      // Hadoop 3.x defaults the sync interval to megabytes; fixtures
      // need real mid-file syncs for the split/blast-radius cases
      SequenceFile.Writer.syncInterval(512)) ++
      (if (ct == CompressionType.NONE)
        Seq(SequenceFile.Writer.compression(CompressionType.NONE))
      else Seq(SequenceFile.Writer.compression(ct, codec)))
    val w = SequenceFile.createWriter(conf, opts: _*)
    try pairs.foreach { case (k, v) => w.append(new Text(k), new Text(v)) }
    finally w.close()
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-seq").toString + "/f.seq"

  private def readBack(path: String): Seq[(String, String)] =
    SeqFile.readText(spark, path, rangeBytes = 4096)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  test("Hadoop-written uncompressed Text/Text reads back via ranged splits") {
    val pairs = kv(500)
    val path = tmp()
    hadoopWrite(path, pairs, CompressionType.NONE, null)
    assert(readBack(path) == pairs)
    val h = SeqFile.readHeader(spark.sparkContext.hadoopConfiguration, path)
    assert(h.keyClass == "org.apache.hadoop.io.Text" && !h.recordCompressed)
  }

  test("Hadoop RECORD compression (DefaultCodec and GzipCodec) reads back") {
    for (codec <- Seq(new DefaultCodec(), new GzipCodec())) {
      val pairs = kv(300)
      val path = tmp()
      hadoopWrite(path, pairs, CompressionType.RECORD, codec)
      assert(readBack(path) == pairs, codec.getClass.getName)
    }
  }

  test("Hadoop BLOCK compression (DefaultCodec) reads back") {
    val pairs = kv(400)
    val path = tmp()
    hadoopWrite(path, pairs, CompressionType.BLOCK, new DefaultCodec())
    val h = SeqFile.readHeader(spark.sparkContext.hadoopConfiguration, path)
    assert(h.blockCompressed)
    assert(readBack(path) == pairs)
  }

  test("Hadoop BLOCK compression (SnappyCodec) reads back") {
    val pairs = kv(400)
    val path = tmp()
    hadoopWrite(path, pairs, CompressionType.BLOCK, new SnappyCodec())
    assert(readBack(path) == pairs)
  }

  test("our writer round-trips through Hadoop's own Reader (all layouts)") {
    val pairs = kv(250)
    val payloads = pairs.map { case (k, v) =>
      (k.getBytes("UTF-8"), v.getBytes("UTF-8")) }
    for (mode <- Seq("none", "record", "block")) {
      val path = tmp()
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(path).getParent)
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        SeqFileWriter.write(payloads, compression = mode))
      val conf = spark.sparkContext.hadoopConfiguration
      val r = new SequenceFile.Reader(conf,
        SequenceFile.Reader.file(new Path(path)))
      val k = new Text(); val v = new Text()
      val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      try while (r.next(k, v)) got += ((k.toString, v.toString))
      finally r.close()
      assert(got.sortBy(_._1).toSeq == pairs, mode)
      // and our own reader agrees
      assert(readBack(path) == pairs, mode)
    }
  }

  test("LongWritable/BytesWritable payloads surface correctly") {
    val path = tmp()
    val conf = spark.sparkContext.hadoopConfiguration
    val w = SequenceFile.createWriter(conf,
      SequenceFile.Writer.file(new Path(path)),
      SequenceFile.Writer.keyClass(classOf[LongWritable]),
      SequenceFile.Writer.valueClass(classOf[BytesWritable]))
    try (0 until 50).foreach { i =>
      w.append(new LongWritable(i.toLong * 3),
        new BytesWritable(Array[Byte](i.toByte, (i + 1).toByte)))
    } finally w.close()
    val rows = SeqFile.readRecords(spark, path, rangeBytes = 4096)
      .select(col("key"), col("value")).collect()
      .map(r => (r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
    assert(rows.length == 50)
    val sorted = rows.sortBy(r => java.nio.ByteBuffer.wrap(r._1).getLong)
    sorted.zipWithIndex.foreach { case ((k, v), i) =>
      assert(java.nio.ByteBuffer.wrap(k).getLong == i.toLong * 3)
      assert(v.toSeq == Seq(i.toByte, (i + 1).toByte))
    }
  }

  test("structural corruption drops only its own sync region") {
    val pairs = kv(800)
    val path = tmp()
    hadoopWrite(path, pairs, CompressionType.NONE, null)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    // find the second sync escape (-1 + sync) and wreck the record
    // length right after it — uncompressed SequenceFiles carry no CRC,
    // so only STRUCTURAL damage is detectable (a flipped value byte is
    // silent by format design)
    val sync = SeqFile.readHeader(
      spark.sparkContext.hadoopConfiguration, path).sync
    def isEscape(i: Int): Boolean =
      bytes(i) == -1 && bytes(i + 1) == -1 && bytes(i + 2) == -1 &&
        bytes(i + 3) == -1 && (0 until 16).forall(k =>
          bytes(i + 4 + k) == sync(k))
    val escapes = (100 until bytes.length - 24).filter(isEscape)
    assert(escapes.length >= 3)
    val hit = escapes(1) + 20
    (0 until 4).foreach(k => bytes(hit + k) = 0x7f.toByte)
    val f2 = tmp()
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(f2).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(f2), bytes)
    val left = readBack(f2)
    assert(left.length < pairs.length)
    // most regions survive: the blast radius is one sync interval
    assert(left.length > pairs.length / 2)
    assert(left.forall(pairs.contains))
  }

  test("bad magic and unknown versions refuse up front") {
    val path = tmp()
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "NOPE not a sequence file".getBytes)
    val e = intercept[IllegalArgumentException] {
      SeqFile.readHeader(spark.sparkContext.hadoopConfiguration, path)
    }
    assert(e.getMessage.contains("bad magic"))
    val v5 = "SEQ".getBytes ++ Array[Byte](5) ++ new Array[Byte](40)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), v5)
    val e2 = intercept[IllegalArgumentException] {
      SeqFile.readHeader(spark.sparkContext.hadoopConfiguration, path)
    }
    assert(e2.getMessage.contains("version"))
  }

  test("vlong coding matches WritableUtils for the interesting range") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val _ = conf
    for (v <- Seq(0L, 1L, -1L, 127L, 128L, -112L, -113L, 255L, 65535L,
        1L << 30, -(1L << 30), Long.MaxValue, Long.MinValue)) {
      val out = new java.io.ByteArrayOutputStream()
      SeqFileWriter.vlong(out, v)
      val dob = new org.apache.hadoop.io.DataOutputBuffer()
      org.apache.hadoop.io.WritableUtils.writeVLong(dob, v)
      assert(out.toByteArray.toSeq ==
        dob.getData.take(dob.getLength).toSeq, s"v=$v")
    }
  }
}
