package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Product quantization: encode shape and determinism, exact
  * reconstruction when the corpus IS the codebook, and ADC top-k recall
  * against brute force on clustered data — measured, not assumed.
  */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic clustered fixture: `perCluster` points around each of
    * `clusters` well-separated anchors in `dim` dims. Cluster structure is
    * what PQ must preserve: same-cluster points agree on most sub-codes.
    */
  private def clustered(clusters: Int, perCluster: Int, dim: Int) = {
    val rows = for {
      c <- 0 until clusters
      p <- 0 until perCluster
    } yield {
      val id = (c * perCluster + p).toLong
      // anchor: +/-10 pattern per cluster from its bits; jitter < 1
      val vec = Array.tabulate(dim) { d =>
        val anchor = if (((c >> (d % 4)) & 1) == 1) 10f else -10f
        anchor + ((id * 31 + d * 7) % 13).toFloat / 13f
      }
      (id, vec.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("pqEncode: one code row per vector, numSubspaces codes in range") {
    val df = clustered(4, 10, 16)
    val codes = Similarity.pqEncode(df, "vec_id", "embedding",
      numSubspaces = 4, numCentroids = 8)
    val got = codes.collect()
    assert(got.length === 40)
    got.foreach { r =>
      val cs = r.getSeq[Int](r.fieldIndex("codes"))
      assert(cs.length === 4)
      assert(cs.forall(c => c >= 0 && c < 8))
    }
  }

  test("codebook rows encode to themselves: sampled vectors get exact sub-codes") {
    val df = clustered(4, 4, 16)
    val codes = Similarity.pqEncode(df, "vec_id", "embedding",
        numSubspaces = 4, numCentroids = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // with numCentroids = corpus size the codebook IS the corpus: every
    // vector's nearest sub-centroid is its own subvector (distance 0),
    // so codes reconstruct the vector exactly — all 16 code arrays differ
    assert(codes.values.toSeq.distinct.length === 16)
  }

  test("encode is deterministic across runs (hash-sampled codebook)") {
    val df = clustered(3, 7, 8)
    val a = Similarity.pqEncode(df, "vec_id", "embedding", 4, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Similarity.pqEncode(df, "vec_id", "embedding", 4, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a === b)
  }

  test("pqTopK recall vs brute-force cosine on clustered corpus") {
    val df = clustered(8, 8, 16) // 64 vectors, 8 tight clusters
    val queries = df.filter($"vec_id" % 8 === 0) // one query per cluster
    val k = 3
    val pq = Similarity.pqTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k,
        numSubspaces = 4, numCentroids = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k)
      .select("query_key", "neighbor_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq intersect bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"PQ recall $recall vs brute force (pq=$pq bf=$bf)")
    // every query got exactly k ranked neighbors
    assert(pq.size === bf.size)
  }

  test("ivfPqTopK: probed-cell candidates, ADC ranking, recall vs brute force") {
    val df = clustered(8, 8, 16)
    val queries = df.filter($"vec_id" % 8 === 1)
    val k = 3
    val got = Similarity.ivfPqTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k,
        nCentroids = 8, nProbe = 4, numSubspaces = 4, pqCentroids = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // self never returned; ranks dense 1..k per query
    got.foreach { case (q, n, _) => assert(q !== n) }
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to k))
    }
    // pruned search still finds most true neighbors on clustered data
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k)
      .select("query_key", "neighbor_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = got.map(t => (t._1, t._2)).toSet
    val recall = (pairs intersect bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF-PQ recall $recall (got=$pairs bf=$bf)")
  }

  test("ivfAdcTopK: residual encoding lifts recall over raw-vector codes at equal nProbe") {
    val df = clustered(8, 8, 16)
    // clean coarse quantizer (one centroid per cluster — what pqTrain
    // converges to in production): the residual benefit is conditional
    // on the coarse cells being sane, so the comparison isolates the
    // ENCODING change instead of coarse-sampling luck
    val anchors = (0 until 8).map { c =>
      (c, Array.tabulate(16)(d =>
        if (((c >> (d % 4)) & 1) == 1) 10.0 else -10.0).toSeq)
    }.toDF("j", "cent_vec")
    val queries = df.filter($"vec_id" % 8 === 1)
    val k = 3
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k)
      .select("query_key", "neighbor_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val pairs = res.select("query_key", "neighbor_key")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (pairs intersect bf).size.toDouble / bf.size
    }
    // starve the code budget (4 subspaces × 4 centroids): raw-vector
    // codes must spend it on the ±10 anchor structure; residual codes
    // only quantize the sub-1.0 jitter around each cell centroid
    val raw = recallOf(Similarity.ivfPqTopK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", k,
      nCentroids = 8, nProbe = 4, numSubspaces = 4, pqCentroids = 4,
      coarseCentroids = Some(anchors)))
    val residual = recallOf(Similarity.ivfAdcTopK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", k,
      nCentroids = 8, nProbe = 4, numSubspaces = 4, pqCentroids = 4,
      coarseCentroids = Some(anchors)))
    assert(residual >= raw + 0.2,
      s"residual recall $residual must measurably beat raw-code recall $raw")
    assert(residual >= 0.8, s"residual recall too low: $residual")
    // shape contract: self never returned, ranks dense 1..k
    val got = Similarity.ivfAdcTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k,
        nCentroids = 8, nProbe = 4, numSubspaces = 4, pqCentroids = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    got.foreach { case (q, n, _) => assert(q !== n) }
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to k))
    }
    // determinism: two runs agree bit-for-bit
    val again = Similarity.ivfAdcTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k,
        nCentroids = 8, nProbe = 4, numSubspaces = 4, pqCentroids = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.sortBy(t => (t._1, t._3)).toSeq ===
      again.sortBy(t => (t._1, t._3)).toSeq)
    // checkpointDir knob: durable parquet snapshots of the corpus-side
    // intermediates (batch fault tolerance) with bit-identical results
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivf-ckpt").toString
    val durable = Similarity.ivfAdcTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k,
        nCentroids = 8, nProbe = 4, numSubspaces = 4, pqCentroids = 16,
        checkpointDir = Some(ckpt))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(durable.sortBy(t => (t._1, t._3)).toSeq ===
      got.sortBy(t => (t._1, t._3)).toSeq)
    val snaps = new java.io.File(ckpt).listFiles().map(_.getName)
    assert(snaps.exists(_.startsWith("graft-snap-ivfadc-cell-")))
    assert(snaps.exists(_.startsWith("graft-snap-ivfadc-resid-")))
  }

  test("ivfAdcTopKRerank: exact re-rank on the residual shortlist lifts recall further") {
    val df = clustered(8, 8, 16)
    val anchors = (0 until 8).map { c =>
      (c, Array.tabulate(16)(d =>
        if (((c >> (d % 4)) & 1) == 1) 10.0 else -10.0).toSeq)
    }.toDF("j", "cent_vec")
    val queries = df.filter($"vec_id" % 8 === 1)
    val k = 3
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k)
      .select("query_key", "neighbor_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val pairs = res.select("query_key", "neighbor_key")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (pairs intersect bf).size.toDouble / bf.size
    }
    val adc = recallOf(Similarity.ivfAdcTopK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", k,
      nCentroids = 8, nProbe = 4, numSubspaces = 4, pqCentroids = 4,
      coarseCentroids = Some(anchors)))
    val rr = recallOf(Similarity.ivfAdcTopKRerank(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", k, kShortlist = 12,
      nCentroids = 8, nProbe = 4, numSubspaces = 4, pqCentroids = 4,
      coarseCentroids = Some(anchors)))
    assert(rr >= adc, s"re-rank recall $rr must not trail ADC-only $adc")
    assert(rr >= 0.9, s"re-ranked residual recall too low: $rr")
    // dense ranks, never self
    val got = Similarity.ivfAdcTopKRerank(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k, kShortlist = 12,
        nCentroids = 8, nProbe = 4, numSubspaces = 4, pqCentroids = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    got.foreach { case (q, n, _) => assert(q !== n) }
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to k))
    }
    assertThrows[IllegalArgumentException] {
      Similarity.ivfAdcTopKRerank(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, kShortlist = 3)
    }
  }

  test("pqTrain: Lloyd refinement cuts quantization error, holds recall") {
    val df = clustered(8, 8, 16)
    // the hash sample picks 16 arbitrary corpus rows; Lloyd moves them
    // toward the cluster means — the objective it provably decreases
    val sampled = Similarity.pqTrain(df, "vec_id", "embedding",
      numSubspaces = 4, numCentroids = 16, iters = 0)
    val trained = Similarity.pqTrain(df, "vec_id", "embedding",
      numSubspaces = 4, numCentroids = 16, iters = 8)
    val eSampled = Similarity.pqQuantizationError(
      df, "vec_id", "embedding", sampled, 4)
    val eTrained = Similarity.pqQuantizationError(
      df, "vec_id", "embedding", trained, 4)
    assert(eTrained <= eSampled * 0.9,
      s"trained codebook should cut quantization error >= 10%: " +
        s"$eTrained vs $eSampled")

    val queries = df.filter($"vec_id" % 8 === 0)
    val k = 3
    def recallOf(cb: org.apache.spark.sql.DataFrame): Double = {
      val pq = Similarity.pqTopK(df, "vec_id", "embedding",
          queries, "vec_id", "embedding", k,
          numSubspaces = 4, numCentroids = 16, codebook = Some(cb))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding",
          queries, "vec_id", "embedding", k)
        .select("query_key", "neighbor_key")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (pq intersect bf).size.toDouble / bf.size
    }
    val rs = recallOf(sampled)
    val rt = recallOf(trained)
    assert(rt >= rs, s"trained recall $rt must not trail sampled $rs")
    assert(rt >= 0.6, s"trained recall too low: $rt")
  }

  test("pqTrain with iters = 0 IS the hash-sampled codebook") {
    val df = clustered(4, 8, 16)
    val queries = df.filter($"vec_id" % 8 === 2)
    val viaDefault = Similarity.pqTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", 3, 4, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaTrain0 = Similarity.pqTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", 3, 4, 16,
        codebook = Some(Similarity.pqTrain(df, "vec_id", "embedding",
          numSubspaces = 4, numCentroids = 16, iters = 0)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaDefault === viaTrain0)
  }

  test("ivfPqTopK accepts trained coarse + PQ codebooks") {
    val df = clustered(8, 8, 16)
    val queries = df.filter($"vec_id" % 8 === 3)
    val k = 3
    // coarse = k-means on the FULL vectors (numSubspaces = 1)
    val coarse = Similarity.pqTrain(df, "vec_id", "embedding",
      numSubspaces = 1, numCentroids = 8, iters = 8)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding",
      numSubspaces = 4, numCentroids = 16, iters = 8)
    val got = Similarity.ivfPqTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k,
        nCentroids = 8, nProbe = 4, numSubspaces = 4, pqCentroids = 16,
        coarseCentroids = Some(coarse), pqCodebook = Some(cb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to k))
    }
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k)
      .select("query_key", "neighbor_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got.map(t => (t._1, t._2)).toSet intersect bf).size.toDouble /
      bf.size
    assert(recall >= 0.6, s"trained IVF-PQ recall too low: $recall")
  }

  test("ivfPqTopKRerank: exact re-rank lifts recall over ADC-only at same nProbe") {
    val df = clustered(8, 8, 16)
    val queries = df.filter($"vec_id" % 8 === 5)
    val k = 3
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", k)
      .select("query_key", "neighbor_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // coarse PQ (4 subspaces × 8 centroids) so ADC ordering inside a
    // cluster degrades to code ties; all cells probed so coarse pruning
    // is not the limiter — the delta isolates the re-rank stage
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val got = res.select("query_key", "neighbor_key")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got intersect bf).size.toDouble / bf.size
    }
    val adc = recallOf(Similarity.ivfPqTopK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", k,
      nCentroids = 8, nProbe = 8, numSubspaces = 4, pqCentroids = 8))
    val rr = recallOf(Similarity.ivfPqTopKRerank(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", k, kShortlist = 16,
      nCentroids = 8, nProbe = 8, numSubspaces = 4, pqCentroids = 8))
    assert(rr >= adc, s"re-rank recall $rr must not trail ADC-only $adc")
    assert(rr >= 0.9, s"re-rank recall too low with full probes: $rr")
  }

  test("ivfPqTopKRerank: dense ranks, no self, shortlist >= k enforced") {
    val df = clustered(4, 8, 16)
    val queries = df.filter($"vec_id" < 2)
    val got = Similarity.ivfPqTopKRerank(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", 3, kShortlist = 8,
        nCentroids = 8, nProbe = 4, numSubspaces = 4, pqCentroids = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    got.foreach { case (q, n, _) => assert(q !== n) }
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === Seq(1, 2, 3))
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKRerank(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", 5, kShortlist = 3)
    }
  }

  test("a hot coarse cell never hash-partitions the corpus (probe broadcast)") {
    // adversarial skew: every vector in ONE tight cluster — coarse
    // assignment puts the whole corpus in a single cell. The candidate
    // join must broadcast the probe list, not hash-exchange corpus rows
    // on the 1-active-key cent_id domain (which would make one task scan
    // everything)
    val rows = (0L until 64L).map { id =>
      (id, Array.tabulate(16)(d => 10f + ((id * 31 + d * 7) % 13).toFloat / 13f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 2)
    val res = Similarity.ivfPqTopK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", 3,
      nCentroids = 8, nProbe = 2, numSubspaces = 4, pqCentroids = 8)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(cent_id"),
      s"cent_id must never be a hash-exchange key:\n$plan")
    // and the skewed search still returns dense ranks
    val got = res.collect().map(r => (r.getLong(0), r.getInt(2)))
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq === Seq(1, 2, 3))
    }
  }

  test("ivfCentroidsFor follows sqrt(n) within clamps") {
    assert(Similarity.ivfCentroidsFor(0) === 16)
    assert(Similarity.ivfCentroidsFor(100) === 16) // sqrt=10, clamped up
    assert(Similarity.ivfCentroidsFor(1000000) === 1000)
    assert(Similarity.ivfCentroidsFor(100000000) === 10000)
    assert(Similarity.ivfCentroidsFor(Long.MaxValue) === 65536) // clamped
  }

  test("indivisible vector length fails loudly instead of dropping dimensions") {
    val df = Seq((1L, Seq.fill(10)(1.0f)), (2L, Seq.fill(10)(2.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.pqEncode(df, "vec_id", "embedding",
        numSubspaces = 3, numCentroids = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("not divisible")), ex.getMessage)
  }

  /** [[clustered]] with 3× the jitter: same-cluster points sit near
    * cosine 0.985 — clearly BELOW a 0.999 dedup threshold — while still
    * clustering cleanly, so only planted copies collapse.
    */
  private def semCorpus(clusters: Int, perCluster: Int, dim: Int) = {
    val rows = for {
      c <- 0 until clusters
      p <- 0 until perCluster
    } yield {
      val id = (c * perCluster + p).toLong
      val vec = Array.tabulate(dim) { d =>
        val anchor = if (((c >> (d % 4)) & 1) == 1) 10f else -10f
        anchor + ((id * 31 + d * 7) % 13).toFloat * 3f / 13f
      }
      (id, vec.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("semDedup: exact and near copies collapse to one survivor, distinct points stay") {
    val base = semCorpus(4, 8, 16)
    // plant copies: +1000 exact, +2000 imperceptible jitter (cos ≳
    // 0.9999), +3000 strong distortion (must survive at tau = 0.999)
    val exact = base.withColumn("vec_id", $"vec_id" + 1000)
    val near = base
      .withColumn("embedding", transform($"embedding",
        (x, i) => x * (lit(1.0f) + lit(0.0005f) * (i % 3 - lit(1)))))
      .withColumn("vec_id", $"vec_id" + 2000)
    val far = base
      .withColumn("embedding", transform($"embedding",
        (x, i) => x * (lit(1.0f) + lit(0.3f) * (i % 3 - lit(1)))))
      .withColumn("vec_id", $"vec_id" + 3000)
    val corpus = base.unionByName(exact).unionByName(near).unionByName(far)
    val got = Similarity.semDedup(corpus, "vec_id", "embedding",
        tau = 0.999, nClusters = 8)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(got.size === 128)
    for (id <- 0L until 32L) {
      // the base id is the minimum of its duplicate component → kept;
      // its exact and near copies are dropped; the far copy survives
      assert(got(id), s"base $id must survive")
      assert(!got(id + 1000), s"exact copy of $id must drop")
      assert(!got(id + 2000), s"near copy of $id must drop")
      assert(got(id + 3000), s"distorted copy of $id must survive")
    }
  }

  test("semDedup returns null/empty-embedding rows kept, never drops them") {
    val base = semCorpus(4, 8, 16)
    val nulled = base.filter($"vec_id" < 2)
      .withColumn("vec_id", $"vec_id" + 5000)
      .withColumn("embedding",
        lit(null).cast("array<float>"))
    val empty = base.filter($"vec_id" === 3)
      .withColumn("vec_id", $"vec_id" + 6000)
      .withColumn("embedding",
        array().cast("array<float>"))
    val corpus = base.unionByName(nulled).unionByName(empty)
    val got = Similarity.semDedup(corpus, "vec_id", "embedding",
        tau = 0.999, nClusters = 8)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    // an unembeddable document cannot be proven a duplicate → kept,
    // and it MUST appear in the output (the contract covers every row)
    assert(got.size === base.count() + 3)
    assert(got(5000L) && got(5001L) && got(6003L))
  }

  test("semDedup default cell count follows the sqrt-n rule, not a literal") {
    // 2048 rows: 16 cells would put ~128 rows per cell and Σ|cell|²
    // ≈ 16·128² = 262k candidate pairs; √n ≈ 45 cells caps it at
    // ~45·46² ≈ 95k — the gap that grows quadratically with the corpus.
    // The auto default must actually spread assignments past 16 cells.
    val corpus = semCorpus(clusters = 16, perCluster = 128, dim = 8)
    val out = Similarity.semDedup(corpus, "vec_id", "embedding", tau = 0.9999)
    assert(out.count() === 2048)
    val cellsUsed = out.select("cent_id").distinct().count()
    val expected = Similarity.ivfCentroidsFor(2048) // 45
    assert(expected > 16)
    assert(cellsUsed > 16, s"default stuck at a literal: $cellsUsed cells")
    assert(cellsUsed <= expected)
  }

  test("semDedup on pqTrain centroids: the trained-codebook path dedups identically") {
    val base = semCorpus(4, 8, 16)
    val exact = base.withColumn("vec_id", $"vec_id" + 1000)
    val corpus = base.unionByName(exact)
    // full-vector k-means (numSubspaces = 1) — the SemDeDup paper's
    // clustering — then dedup scoped by those Lloyd cells
    val cb = Similarity.pqTrain(corpus, "vec_id", "embedding",
      numSubspaces = 1, numCentroids = 4, iters = 4)
    val got = Similarity.semDedup(corpus, "vec_id", "embedding",
        tau = 0.999, centroids = Some(cb))
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(got.size === 64)
    for (id <- 0L until 32L) {
      assert(got(id), s"base $id must survive")
      assert(!got(id + 1000), s"exact copy of $id must drop")
    }
  }

  test("pqTopK never returns the query itself and ranks 1..k densely") {
    val df = clustered(4, 8, 16)
    val queries = df.filter($"vec_id" < 2)
    val got = Similarity.pqTopK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", 4,
        numSubspaces = 4, numCentroids = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    got.foreach { case (q, n, _) => assert(q !== n) }
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to 4))
    }
  }

  // ---- native kernel ↔ dataflow equivalence (r18) --------------------------
  // The embedded-codebook kernels must be BIT-identical to the crossJoin/
  // explode/HOF dataflow forms they replace — same ascending folds, same
  // min_by(struct) tie-breaks — or the oracle replay breaks.

  /** Codebook-shaped frame (j, cent_vec) off a deterministic sample. */
  private def codebookOf(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val sampled = df
      .select(col("vec_id").alias("ck"), col("embedding").alias("cent_vec"))
      .withColumn("__r", pmod(Similarity.portable60(col("ck")), lit(1000000L)))
      .orderBy(col("__r"), col("ck")).limit(k)
    val wc = Window.partitionBy(pmod(col("__r"), lit(1)))
      .orderBy(col("__r"), col("ck"))
    sampled.withColumn("j", row_number().over(wc) - 1)
      .select(col("j"), col("cent_vec"))
  }

  test("native PQ encode is bit-identical to the dataflow form") {
    val df = clustered(4, 12, 16) // float vectors exercise the cast path
    val cb = codebookOf(df, 8)
    val native = Similarity.pqEncodeWith(df, "vec_id", "embedding", cb, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val dataflow = Similarity
      .pqEncodeWithDataflow(df, "vec_id", "embedding", cb, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native === dataflow)
    assert(native.nonEmpty)
  }

  test("native query tables are bit-identical to the dataflow form") {
    val df = clustered(4, 6, 16)
    val cb = codebookOf(df, 8)
    val queries = df.filter($"vec_id" < 4)
    val native = Similarity
      .pqQueryTables(queries, "vec_id", "embedding", cb, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Seq[Double]](1)).toMap
    val dataflow = Similarity
      .pqQueryTablesDataflow(queries, "vec_id", "embedding", cb, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Seq[Double]](1)).toMap
    assert(native === dataflow) // exact doubles, not approximate
    assert(native.nonEmpty)
  }

  test("native ADC sum is bit-identical to the HOF fold, nulls included") {
    val rows = Seq(
      (1L, Seq(Seq(0.5, 1.5), Seq(2.25, 0.125)), Seq(0, 1)),
      (2L, Seq(Seq(0.5, 1.5), Seq(2.25, 0.125)), Seq(1, 0)),
      (3L, Seq(Seq(0.5, 1.5), Seq(2.25, 0.125)), Seq(0, 5)), // OOB code
      (4L, Seq(Seq(0.5, 1.5)), Seq(0, 1, 0))                 // length mismatch
    ).toDF("id", "tab", "codes")
    val both = rows.select(col("id"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.expressions.PqAdistExpr(
            org.apache.spark.sql.graft.ColumnBridge.expressionEager(col("tab")),
            org.apache.spark.sql.graft.ColumnBridge.expressionEager(col("codes"))))
          .alias("native"),
        Similarity.pqAdistHof(col("tab"), col("codes")).alias("hof"))
      .collect()
    both.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null parity for id ${r.getLong(0)}")
      if (!r.isNullAt(1)) assert(r.getDouble(1) === r.getDouble(2))
    }
    assert(both.count(!_.isNullAt(1)) === 2)
  }

  test("native quantizeInt8 is bit-identical to the HOF form, edge cases included") {
    val rows = Seq(
      (1L, Seq(1.0f, -2.5f, 127.0f, 0.1f)),
      (2L, Seq(0.0f, 0.0f)),              // zero vector → scale 0, zero codes
      (3L, Seq(-0.0f, 0.0f)),             // signed zero
      (4L, Seq(Float.NaN, 1.0f)),         // NaN is greatest in greatest()
      (5L, Seq.empty[Float])              // empty → scale 0, empty codes
    ).toDF("id", "embedding")
    val both = rows.select(col("id"),
        Similarity.quantizeInt8(col("embedding")).alias("n"),
        Similarity.quantizeInt8Hof(col("embedding")).alias("h"))
      .selectExpr("id", "n.scale AS ns", "h.scale AS hs",
        "n.codes AS nc", "h.codes AS hc")
      .collect()
    both.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"scale null parity id ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) === 0
          || (r.getDouble(1).isNaN && r.getDouble(2).isNaN),
          s"scale id ${r.getLong(0)}")
      assert(r.getSeq[Integer](3) === r.getSeq[Integer](4),
        s"codes id ${r.getLong(0)}")
    }
  }

  test("collectCentroidTable refuses irregular tables (fallback stays reachable)") {
    // non-consecutive ids
    val gap = Seq((0, Seq(1.0, 2.0)), (2, Seq(3.0, 4.0)))
      .toDF("j", "cent_vec")
    assert(Similarity.collectCentroidTable(gap, "j", "cent_vec").isEmpty)
    // ragged dims
    val ragged = Seq((0, Seq(1.0, 2.0)), (1, Seq(3.0)))
      .toDF("j", "cent_vec")
    assert(Similarity.collectCentroidTable(ragged, "j", "cent_vec").isEmpty)
    // clean table collects with its offset
    val ok = Seq((1, Seq(1.0, 2.0)), (2, Seq(3.0, 4.0)))
      .toDF("j", "cent_vec")
    val got = Similarity.collectCentroidTable(ok, "j", "cent_vec")
    assert(got === Some((1,
      IndexedSeq(IndexedSeq(1.0, 2.0), IndexedSeq(3.0, 4.0)))))
  }
}
