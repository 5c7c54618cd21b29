package graft.llmops

import graft.SparkTestBase
import java.nio.file.Files

class NpySpec extends SparkTestBase {

  test("interop: numpy-written npy and npz read back exactly") {
    val dir = Files.createTempDirectory("graft-npy").toString
    val script =
      s"""import numpy as np
         |a = np.arange(12, dtype=np.int64).reshape(3, 4) * 7
         |f = (np.arange(6, dtype=np.float32) / 8.0).reshape(2, 3)
         |d = np.array([1.5, -2.25, 3e10])
         |np.save('$dir/a.npy', a)
         |np.savez('$dir/z.npz', f=f, d=d)
         |""".stripMargin
    val p = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(true).start()
    assert(p.waitFor() == 0)
    val a = Npy.rows(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/a.npy")))
    assert(a.length == 3)
    assert(a(1).toSeq == Seq(28.0, 35.0, 42.0, 49.0))
    val members = Npy.npzMembers(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/z.npz"))).toMap
    assert(members.keySet == Set("f.npy", "d.npy"))
    val f = Npy.rows(members("f.npy"))
    assert(f.length == 2 && f(0)(1) == 0.125)
    val d = Npy.rows(members("d.npy"))
    assert(d.length == 1 && d(0).toSeq == Seq(1.5, -2.25, 3e10))
  }

  test("rank-3/4 arrays flatten to leading-axes rows of the last axis") {
    val dir = Files.createTempDirectory("graft-npy").toString
    val script =
      s"""import numpy as np
         |t3 = np.arange(24, dtype=np.int64).reshape(2, 3, 4)
         |t4 = (np.arange(16, dtype=np.float32) / 4.0).reshape(2, 2, 2, 2)
         |np.save('$dir/t3.npy', t3)
         |np.save('$dir/t4.npy', t4)
         |""".stripMargin
    val p = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(true).start()
    assert(p.waitFor() == 0)
    val t3 = Npy.rows(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/t3.npy")))
    assert(t3.length == 6 && t3.forall(_.length == 4))
    assert(t3(5).toSeq == Seq(20.0, 21.0, 22.0, 23.0))
    val t4 = Npy.rows(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/t4.npy")))
    assert(t4.length == 8 && t4.forall(_.length == 2))
    assert(t4(7).toSeq == Seq(3.5, 3.75))
  }

  test("interop: numpy float16 arrays decode exactly") {
    val dir = Files.createTempDirectory("graft-npy").toString
    val script =
      s"""import numpy as np
         |h = (np.arange(40, dtype=np.float16) / 16.0).reshape(5, 8)
         |edge = np.array([np.inf, -np.inf, 2.0**-24, 6.1035156e-05,
         |                 -0.0999755859375], dtype=np.float16)
         |np.save('$dir/h.npy', h)
         |np.save('$dir/edge.npy', edge)
         |""".stripMargin
    val p = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(true).start()
    assert(p.waitFor() == 0)
    val h = Npy.rows(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/h.npy")))
    assert(h.length == 5)
    (0 until 5).foreach(r => (0 until 8).foreach(c =>
      assert(h(r)(c) == (r * 8 + c) / 16.0)))
    val e = Npy.rows(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/edge.npy"))).head
    assert(e(0).isPosInfinity && e(1).isNegInfinity)
    assert(e(2) == math.pow(2, -24)) // the smallest f16 subnormal
    assert(e(3) == 6.103515625e-05) // the smallest f16 normal
    assert(e(4) == -0.0999755859375)
  }

  test("interop: our writer's files load in numpy verbatim") {
    val dir = Files.createTempDirectory("graft-npy").toString
    Files.write(java.nio.file.Paths.get(s"$dir/l.npy"),
      Npy.writeNpyLongs(Array(5L, -6L, 1L << 40)))
    Files.write(java.nio.file.Paths.get(s"$dir/m.npz"),
      Npy.writeNpz(Seq("v.npy" ->
        Npy.writeNpyFloats(Seq(Array(1.5f, 2.5f), Array(-0.5f, 0f))))))
    val script =
      s"""import numpy as np, sys
         |l = np.load('$dir/l.npy')
         |assert l.dtype == np.int64 and list(l) == [5, -6, 1 << 40], l
         |z = np.load('$dir/m.npz')
         |v = z['v']
         |assert v.shape == (2, 2) and v.dtype == np.float32
         |assert v[0, 0] == 1.5 and v[1, 0] == -0.5
         |print('OK')
         |""".stripMargin
    val p = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0 && out.contains("OK"), out)
  }

  test("embedding roundtrip: parquet floats → npy → exact bits back") {
    val ss = spark
    import org.apache.spark.sql.functions._
    val vecs = ss.read.parquet(s"$sf0001/embeddings.parquet")
      .orderBy("vec_id").limit(50)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val npy = Npy.writeNpyFloats(vecs.toSeq)
    val back = Npy.rows(npy)
    assert(back.length == vecs.length)
    vecs.zip(back).foreach { case (orig, got) =>
      orig.zip(got).foreach { case (o, g) =>
        assert(o.toDouble == g) // <f4 roundtrip is bit-exact
      }
    }
  }

  test("arrays(): DataFrame explode over npz with member names") {
    val ss = spark
    import ss.implicits._
    val npz = Npy.writeNpz(Seq(
      "x.npy" -> Npy.writeNpyLongs(Array(10L, 20L)),
      "y.npy" -> Npy.writeNpyFloats(Seq(Array(1f, 2f), Array(3f, 4f)))))
    val bare = Npy.writeNpyLongs(Array(7L))
    val out = Npy.arrays(
      Seq((1L, npz), (2L, bare), (3L, Array[Byte](1, 2, 3)))
        .toDF("id", "content"), "id", "content")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getSeq[Double](3)))
    assert(out.count(_._1 == 1L) == 3) // x: 1 row, y: 2 rows
    assert(out.filter(t => t._1 == 1L && t._2 == "y.npy")
      .map(_._4).toSet == Set(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    assert(out.filter(_._1 == 2L).head._4 == Seq(7.0))
    assert(!out.exists(_._1 == 3L)) // junk vanishes
  }

  test("refusals: fortran order, big-endian, bad magic") {
    val good = Npy.writeNpyLongs(Array(1L))
    val fortran = new String(good, "ISO-8859-1")
      .replace("False", "True ").getBytes("ISO-8859-1")
    intercept[IllegalArgumentException] { Npy.rows(fortran) }
    val be = new String(good, "ISO-8859-1")
      .replace("<i8", ">i8").getBytes("ISO-8859-1")
    intercept[IllegalArgumentException] { Npy.rows(be) }
    intercept[IllegalArgumentException] {
      Npy.rows("not numpy at all".getBytes)
    }
  }
}
