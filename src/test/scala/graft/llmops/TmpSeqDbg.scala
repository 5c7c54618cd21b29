import org.apache.hadoop.io._
import org.apache.hadoop.fs.Path
object T {
  def main(a: Array[String]): Unit = {
    val pairs = (0 until 5).map(i => (s"k$i".getBytes, s"v$i".getBytes))
    for (mode <- Seq("none", "record", "block")) {
      val bytes = graft.llmops.SeqFileWriter.write(pairs, compression = mode)
      val p = java.nio.file.Files.createTempFile("dbg", ".seq")
      java.nio.file.Files.write(p, bytes)
      val conf = new org.apache.hadoop.conf.Configuration()
      try {
        val r = new SequenceFile.Reader(conf, SequenceFile.Reader.file(new Path(p.toString)))
        val k = new Text(); val v = new Text()
        var n = 0
        while (r.next(k, v)) n += 1
        r.close()
        println(s"$mode OK n=$n")
      } catch { case e: Throwable => println(s"$mode FAIL ${e}") }
    }
  }
}
