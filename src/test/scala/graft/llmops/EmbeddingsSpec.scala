package graft.llmops

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Deterministic fake endpoint: vector = [len, firstChar, constant]. Static
  * state records calls/failures — executors share the test JVM in local
  * mode, so the operator's executor-side behavior is observable.
  */
object FakeEndpoint {
  val batchSizes = new ConcurrentLinkedQueue[Int]()
  val failuresLeft = new AtomicInteger(0)

  def reset(failures: Int = 0): Unit = {
    batchSizes.clear()
    failuresLeft.set(failures)
  }

  def embed(text: String): Array[Float] =
    Array(text.length.toFloat, text.headOption.map(_.toFloat).getOrElse(0f), 1f)
}

class FakeClient extends EmbeddingClient {
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    if (FakeEndpoint.failuresLeft.getAndDecrement() > 0)
      throw new RuntimeException("simulated endpoint throttle")
    FakeEndpoint.batchSizes.add(texts.length)
    texts.map(FakeEndpoint.embed)
  }
}

/** A client whose batches containing the poison text always fail. */
class PoisonClient(poison: String) extends EmbeddingClient {
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.contains(poison)) throw new RuntimeException("poison batch")
    FakeEndpoint.batchSizes.add(texts.length)
    texts.map(FakeEndpoint.embed)
  }
}

class EmbeddingsSpec extends SparkTestBase {
  import spark.implicits._

  test("embedColumn batches rows per partition and embeds each text") {
    FakeEndpoint.reset()
    val df = (1 to 10).map(i => (i.toLong, "t" * i)).toDF("id", "text")
      .repartition(1)
    val out = Embeddings.embedColumn(df, "text", new FakeClient, batchSize = 4)
    // no orderBy before collect: a sort samples the RDD first and would
    // re-invoke the client (the scaladoc's lazy-eval warning, verified here)
    val got = out.select("id", "embedding").as[(Long, Seq[Float])].collect()
      .sortBy(_._1)
    assert(got.length === 10)
    got.foreach { case (id, vec) =>
      assert(vec === Seq(id.toFloat, 't'.toFloat, 1f))
    }
    // 10 rows in one partition at batchSize 4 → batches of 4, 4, 2
    val sizes = FakeEndpoint.batchSizes.toArray.toSeq.asInstanceOf[Seq[Int]].sorted
    assert(sizes === Seq(2, 4, 4))
  }

  test("null texts never reach the client and embed as NULL") {
    FakeEndpoint.reset()
    val df = Seq((1L, "a"), (2L, null), (3L, "ccc")).toDF("id", "text")
      .repartition(1)
    val out = Embeddings.embedColumn(df, "text", new FakeClient, batchSize = 10)
    val got = out.select("id", "embedding").collect().sortBy(_.getLong(0))
    assert(got(0).getSeq[Float](1) === Seq(1f, 'a'.toFloat, 1f))
    assert(got(1).isNullAt(1))
    assert(got(2).getSeq[Float](1) === Seq(3f, 'c'.toFloat, 1f))
    // only the 2 non-null texts were sent, in one batch
    assert(FakeEndpoint.batchSizes.toArray.toSeq === Seq(2))
  }

  test("transient failures are retried with backoff until the batch succeeds") {
    FakeEndpoint.reset(failures = 2)
    val df = Seq((1L, "x"), (2L, "yy")).toDF("id", "text").repartition(1)
    val out = Embeddings.embedColumn(df, "text", new FakeClient,
      batchSize = 10, maxRetries = 3, backoffMs = 1L)
      .orderBy("id")
    val got = out.select("embedding").as[Seq[Float]].collect()
    assert(got.toSeq === Seq(Seq(1f, 'x'.toFloat, 1f), Seq(2f, 'y'.toFloat, 1f)))
    // two failed attempts burned, third succeeded
    assert(FakeEndpoint.failuresLeft.get() <= 0)
  }

  test("a batch that exhausts retries fails the task under FailTask") {
    FakeEndpoint.reset(failures = 100)
    val df = Seq((1L, "x")).toDF("id", "text").repartition(1)
    val ex = intercept[Exception] {
      Embeddings.embedColumn(df, "text", new FakeClient,
        batchSize = 10, maxRetries = 2, backoffMs = 1L).collect()
    }
    assert(ex.getMessage.contains("throttle") ||
      Option(ex.getCause).exists(_.getMessage.contains("throttle")))
  }

  test("NullVectors policy: the dead batch embeds NULL, other batches survive") {
    FakeEndpoint.reset()
    // batchSize 2 over one partition: batches (a,poison), (c,d) — first dies
    val df = Seq((1L, "a"), (2L, "poison"), (3L, "c"), (4L, "d"))
      .toDF("id", "text").repartition(1)
    val out = Embeddings.embedColumn(df, "text", new PoisonClient("poison"),
      batchSize = 2, maxRetries = 2, backoffMs = 1L,
      onFailure = Embeddings.NullVectors)
      .orderBy("id")
    val got = out.select("id", "embedding").collect()
    assert(got(0).isNullAt(1), "row sharing the poison batch gets NULL")
    assert(got(1).isNullAt(1), "poison row gets NULL")
    assert(got(2).getSeq[Float](1) === Seq(1f, 'c'.toFloat, 1f))
    assert(got(3).getSeq[Float](1) === Seq(1f, 'd'.toFloat, 1f))
  }

  test("embedInto wires embedColumn as the input side of VectorStore.upsert") {
    FakeEndpoint.reset()
    val dir = java.nio.file.Files.createTempDirectory("graft_embed_store").toString
    val store = new VectorStore(spark, dir + "/vectors")
    val docs = Seq((1L, "alpha"), (2L, "bravo"), (3L, null))
      .toDF("vec_id", "text")
    Embeddings.embedInto(store, docs, "vec_id", "text", new FakeClient,
      batchSize = 2)
    val stored = store.table().orderBy("vec_id").collect()
    // the NULL-text row was filtered before upsert
    assert(stored.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(stored(0).getSeq[Float](stored(0).fieldIndex("embedding"))
      === Seq(5f, 'a'.toFloat, 1f))
    // re-embedding upserts by key, not append
    Embeddings.embedInto(store, Seq((2L, "bravo-v2")).toDF("vec_id", "text"),
      "vec_id", "text", new FakeClient, batchSize = 2)
    val after = store.table().orderBy("vec_id").collect()
    assert(after.length === 2)
    assert(after(1).getSeq[Float](after(1).fieldIndex("embedding")).head === 8f)
  }
}
