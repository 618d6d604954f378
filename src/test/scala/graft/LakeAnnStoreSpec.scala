package graft

import org.apache.spark.sql.functions._
import graft.ops.{IncrementalAnn, LakeAnnStore}

/** The lake-backed ANN assignment store must match the in-memory
  * incremental path (proved equal to batch assignment in round 3) at
  * every step, and its search must equal the in-memory search — while
  * reading only the probed cells' partitions.
  */
class LakeAnnStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8

  /** Deterministic unit-ish vectors around two poles + noise dims. */
  private def vec(pole: Int, jitter: Int): Seq[Float] =
    (0 until dims).map { d =>
      val base = if (d == 0) (if (pole == 0) 1.0f else -1.0f) else 0.1f * ((d + jitter) % 3)
      base + 0.01f * jitter
    }

  private def toVecDf(rows: Seq[(String, Seq[Float])]) =
    rows.toDF("id", "vec").select(col("id"), col("vec").cast("array<float>").as("vec"))

  test("lake-backed refresh equals the in-memory incremental store at every step; search results identical and cell-pruned") {
    val dir = tmpDir("lakeann")
    try {
      val index = IncrementalAnn.IvfIndex(
        Array(Array.tabulate(dims)(d => if (d == 0) 1.0 else 0.1),
          Array.tabulate(dims)(d => if (d == 0) -1.0 else 0.1)), nprobe = 1)
      val lake = LakeAnnStore.create(spark, s"$dir/s", index, numPids = 8)
      var mem = IncrementalAnn.emptyStore(spark)
      var wm = 0L

      def applyBatch(s: LakeAnnStore, ups: Seq[(String, Seq[Float])],
                     dels: Seq[String] = Nil): Unit = {
        wm += 1
        mem = IncrementalAnn.remove(mem, dels.toDF("id"), "id")
        if (ups.nonEmpty)
          mem = IncrementalAnn.refresh(index, mem, toVecDf(ups), "vec", "id")
        s.refresh(toVecDf(ups), dels.toDF("id"), wm)
        val got = s.snapshot().collect().map(r => (r.getString(0), r.getInt(1))).toSet
        val want = mem.collect().map(r => (r.getString(0), r.getInt(1))).toSet
        assert(got == want, s"assignment divergence at wm=$wm")
        assert(s.watermark == wm)
      }

      applyBatch(lake, Seq("p0a" -> vec(0, 1), "p0b" -> vec(0, 2), "p1a" -> vec(1, 1)))
      applyBatch(lake, Seq("p1b" -> vec(1, 2), "p0c" -> vec(0, 3)))
      // UPDATE across cells: p0c flips pole → old-cell tombstone + new row
      applyBatch(lake, Seq("p0c" -> vec(1, 3)))
      // DELETE
      applyBatch(lake, Seq.empty, dels = Seq("p1a"))

      // search parity vs the in-memory path, for queries near both poles
      val qs = toVecDf(Seq("q0" -> vec(0, 9), "q1" -> vec(1, 9)))
      def normalize(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "corpus_id", "rank").collect()
          .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      val gotSearch = normalize(lake.search(qs, "vec", "id", k = 2))
      val wantSearch = normalize(IncrementalAnn.search(index, mem, qs, "vec", "id", k = 2))
      assert(gotSearch == wantSearch, s"got=$gotSearch want=$wantSearch")
      // pruning: with nprobe=1 the two queries probe one cell each — the
      // probed pid set must be a strict subset of the store's partitions
      val probedPids = lake.vecStore.pidsOf(Seq(Tuple1(0), Tuple1(1)).toDF("cell"))
      assert(probedPids.size <= 2 && probedPids.size < lake.vecStore.numPids)

      // compaction + reload: content and search unchanged
      lake.maintain(vacuumGraceMs = 0L)
      val re = LakeAnnStore.load(spark, s"$dir/s")
      assert(re.watermark == wm)
      assert(normalize(re.search(qs, "vec", "id", k = 2)) == wantSearch)

      // imbalance signal reads only (id, cell)
      assert(re.imbalance() >= 1.0)

      // retrain + reassign: swapped-pole centroids relabel every cell,
      // content (ids) preserved, search still finds the near pole
      val swapped = IncrementalAnn.IvfIndex(index.centroids.reverse, nprobe = 1)
      re.reassign(swapped)
      val after = re.snapshot().collect().map(r => (r.getString(0), r.getInt(1))).toMap
      assert(after.keySet == mem.collect().map(_.getString(0)).toSet)
      val relabelled = mem.collect().map(r => r.getString(0) -> (1 - r.getInt(1))).toMap
      assert(after == relabelled, s"after=$after want=$relabelled")
      assert(normalize(re.search(qs, "vec", "id", k = 2)) == wantSearch)
    } finally rmrf(dir)
  }
}
