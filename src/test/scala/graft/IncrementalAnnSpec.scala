package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.IncrementalAnn

/** Incrementally maintained IVF index: per-batch assignment of changed
  * vectors only, search equal to the batch operator over the same corpus,
  * retrain signal from cell imbalance.
  */
class IncrementalAnnSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16

  /** Deterministic unit vector near one of `centers` axis clusters. */
  private def vec(cluster: Int, jitterSeed: Int): Array[Float] = {
    val v = Array.fill(dims)(0.01f * (((jitterSeed * 31 + cluster) % 7) - 3))
    v(cluster % dims) = 1.0f
    v
  }

  private def corpusDf(rows: Seq[(String, Array[Float])]): DataFrame =
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("doc_id", "emb")
      .select(col("doc_id"), col("emb").cast("array<float>").as("emb"))

  test("incremental refreshes reach the same search results as one batch assignment over the full corpus") {
    val batch1 = (0 until 40).map(i => (f"a$i%03d", vec(i % 4, i)))
    val batch2 = (0 until 20).map(i => (f"b$i%03d", vec(i % 4, 100 + i)))
    val all = batch1 ++ batch2
    val queries = Seq(("q0", vec(0, 999)), ("q1", vec(1, 998)), ("q2", vec(2, 997)))

    // one index trained on the full corpus, shared by both paths
    val index = IncrementalAnn.train(corpusDf(all), "emb", "doc_id",
      nlist = 4, nprobe = 2, trainSample = 64)
    // incremental: two refreshes
    var store = IncrementalAnn.emptyStore(spark)
    store = IncrementalAnn.refresh(index, store, corpusDf(batch1), "emb", "doc_id")
    store = IncrementalAnn.refresh(index, store, corpusDf(batch2), "emb", "doc_id")
    assert(store.count() == all.size)
    // batch: assign everything at once
    val storeBatch = IncrementalAnn.refresh(index, IncrementalAnn.emptyStore(spark),
      corpusDf(all), "emb", "doc_id")

    def results(s: DataFrame) =
      IncrementalAnn.search(index, s, corpusDf(queries), "emb", "doc_id", k = 5)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(3))).toSet
    assert(results(store) == results(storeBatch))
    // sanity: each query's top hit is from its own cluster
    val top = IncrementalAnn.search(index, store, corpusDf(queries), "emb", "doc_id", k = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(top.size == 3)
  }

  test("property: random upsert/delete streams keep the store equal to batch assignment of the surviving corpus") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val seedCorpus = (0 until 32).map(i => (f"s$i%02d", vec(i % 4, i)))
    val index = IncrementalAnn.train(corpusDf(seedCorpus), "emb", "doc_id",
      nlist = 4, nprobe = 2, trainSample = 64)
    val upGen = for {
      key <- Gen.chooseNum(0, 11).map(i => f"k$i%02d")
      cl <- Gen.chooseNum(0, 3)
      j <- Gen.chooseNum(0, 99)
    } yield (key, vec(cl, j))
    val batchGen = for {
      ups <- Gen.chooseNum(0, 5).flatMap(n => Gen.listOfN(n, upGen))
      dels <- Gen.chooseNum(0, 2).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0, 11).map(i => f"k$i%02d")))
    } yield (ups.groupBy(_._1).map(_._2.head).toSeq, dels.distinct)

    (0 until 4).foreach { caseId =>
      val stream = Gen.listOfN(4, batchGen)
        .pureApply(Gen.Parameters.default, Seed(2000L + caseId))
      var corpus = Map.empty[String, Array[Float]]
      var store = IncrementalAnn.emptyStore(spark)
      stream.foreach { case (ups, dels) =>
        val upserts = ups.filterNot { case (k, _) => dels.contains(k) }
        corpus = corpus -- dels ++ upserts
        store = IncrementalAnn.remove(store, dels.toDF("doc_id"), "doc_id")
        if (upserts.nonEmpty)
          store = IncrementalAnn.refresh(index, store, corpusDf(upserts), "emb", "doc_id")
        // store == batch assignment of the surviving corpus, row for row
        val got = store.select("id", "cell").collect()
          .map(r => r.getString(0) -> r.getInt(1)).toMap
        val want =
          if (corpus.isEmpty) Map.empty[String, Int]
          else IncrementalAnn.refresh(index, IncrementalAnn.emptyStore(spark),
            corpusDf(corpus.toSeq), "emb", "doc_id")
            .select("id", "cell").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
        assert(got == want, s"case $caseId diverged: ${got.size} vs ${want.size}")
      }
    }
  }

  test("index and store persistence: JSON quantizer round-trips bit-exactly; parquet store resumes without retrain/reassign") {
    val corpus = (0 until 40).map(i => (f"p$i%02d", vec(i % 4, i)))
    val index = IncrementalAnn.train(corpusDf(corpus), "emb", "doc_id",
      nlist = 4, nprobe = 2, trainSample = 64)
    val dir = tmpDir("annpersist")
    try {
      IncrementalAnn.saveIndex(index, s"$dir/index.json")
      val loaded = IncrementalAnn.loadIndex(s"$dir/index.json")
      assert(loaded.nprobe == index.nprobe)
      assert(loaded.centroids.map(_.toSeq).toSeq == index.centroids.map(_.toSeq).toSeq)
      val store = IncrementalAnn.refresh(index, IncrementalAnn.emptyStore(spark),
        corpusDf(corpus), "emb", "doc_id")
      IncrementalAnn.saveStore(store, s"$dir/store")
      val restored = IncrementalAnn.loadStore(spark, s"$dir/store")
      assert(restored.count() == 40)
      // a refresh against the RESTORED store with the RELOADED index
      // behaves exactly like the live pair
      val next = IncrementalAnn.refresh(loaded, restored,
        corpusDf(Seq(("pnew", vec(2, 777)))), "emb", "doc_id")
      assert(next.count() == 41)
      val q = corpusDf(Seq(("q", vec(2, 888))))
      val live = IncrementalAnn.search(index,
        IncrementalAnn.refresh(index, store, corpusDf(Seq(("pnew", vec(2, 777)))), "emb", "doc_id"),
        q, "emb", "doc_id", 3).collect().map(r => (r.getString(1), r.getInt(3))).toSet
      val fromDisk = IncrementalAnn.search(loaded, next, q, "emb", "doc_id", 3)
        .collect().map(r => (r.getString(1), r.getInt(3))).toSet
      assert(live == fromDisk)
      // saveStore over an existing dir replaces it atomically-enough
      IncrementalAnn.saveStore(next, s"$dir/store")
      assert(IncrementalAnn.loadStore(spark, s"$dir/store").count() == 41)
    } finally rmrf(dir)
  }

  test("updates re-assign, deletes drop; imbalance flags drift and retrain restores balance") {
    val balanced = (0 until 40).map(i => (f"d$i%03d", vec(i % 4, i)))
    val index = IncrementalAnn.train(corpusDf(balanced), "emb", "doc_id",
      nlist = 4, nprobe = 2, trainSample = 64)
    var store = IncrementalAnn.refresh(index, IncrementalAnn.emptyStore(spark),
      corpusDf(balanced), "emb", "doc_id")
    assert(IncrementalAnn.imbalance(index, store) <= 2.0) // roughly balanced

    // UPDATE: move d000 into cluster 1 — its stored cell must change
    val oldCell = store.filter(col("id") === "d000").select("cell").collect()(0).getInt(0)
    store = IncrementalAnn.refresh(index, store, corpusDf(Seq(("d000", vec(1, 555)))),
      "emb", "doc_id")
    assert(store.count() == 40) // replaced, not duplicated
    val newCell = store.filter(col("id") === "d000").select("cell").collect()(0).getInt(0)
    assert(newCell != oldCell)

    // DELETE
    store = IncrementalAnn.remove(store, Seq("d001").toDF("doc_id"), "doc_id")
    assert(store.count() == 39)
    assert(store.filter(col("id") === "d001").count() == 0)

    // DRIFT: a flood of new vectors all in one cluster skews the store;
    // imbalance flags it, retrain + one re-assignment restores balance
    val flood = (0 until 120).map(i => (f"f$i%03d", vec(0, 7000 + i)))
    store = IncrementalAnn.refresh(index, store, corpusDf(flood), "emb", "doc_id")
    assert(IncrementalAnn.imbalance(index, store) > 2.0, "drift not flagged")
    val currentCorpus = store.select(col("id").as("doc_id"), col("vec").as("emb"))
    val index2 = IncrementalAnn.train(currentCorpus, "emb", "doc_id",
      nlist = 4, nprobe = 2, trainSample = 256)
    val store2 = IncrementalAnn.refresh(index2, IncrementalAnn.emptyStore(spark),
      currentCorpus, "emb", "doc_id")
    assert(IncrementalAnn.imbalance(index2, store2) <
      IncrementalAnn.imbalance(index, store), "retrain did not improve balance")
  }
}
