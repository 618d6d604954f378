package graft

import org.apache.spark.sql.functions._
import graft.ops.DimStore

/** Persistent dim store: CAS-serialized id minting (the stateful
  * lookup-or-create, grapher entity-creation analogue).
  */
class DimStoreSpec extends SparkSpec {
  import spark.implicits._

  test("lookupOrCreate mints ids once and reuses them") {
    val dir = tmpDir("dimstore")
    try {
      val init = Seq(("france", 1L), ("japan", 2L)).toDF("country", "entity_id")
      val store = DimStore.create(spark, s"$dir/d", "country", "entity_id", Some(init))
      val fact = Seq("france", "brazil", "brazil", "japan").toDF("country")
      val (withIds, dim2) = store.lookupOrCreate(fact)
      assert(withIds.filter(col("entity_id").isNull).count() == 0)
      assert(dim2.count() == 3)
      val brazil = dim2.filter(col("country") === "brazil").collect()(0).getLong(1)
      assert(brazil == 3L, s"expected next id 3, got $brazil")
      // second call with the same keys mints nothing (version unchanged)
      val v = store.currentVersion
      store.lookupOrCreate(fact)
      assert(store.currentVersion == v, "no-op lookup must not commit a new version")
    } finally rmrf(dir)
  }

  test("two concurrent writers mint disjoint ids (CAS serializes the mint)") {
    val dir = tmpDir("dimstore2")
    try {
      val store = DimStore.create(spark, s"$dir/d", "country", "entity_id")
      val keysA = (0 until 30).map(i => s"a_$i") :+ "shared"
      val keysB = (0 until 30).map(i => s"b_$i") :+ "shared"
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = Seq(keysA, keysB).map { ks =>
        new Thread(() => {
          try {
            val s2 = DimStore.load(spark, s"$dir/d", "country", "entity_id")
            s2.lookupOrCreate(ks.toDF("country"))
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(60000))
      assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
      val dim = store.dim().collect().map(r => r.getString(0) -> r.getLong(1))
      // every key got exactly one id; ids are globally unique; "shared"
      // (minted by whichever writer won) appears once
      assert(dim.map(_._1).distinct.length == dim.length, "duplicate keys in dim")
      assert(dim.map(_._2).distinct.length == dim.length,
        s"duplicate ids minted: ${dim.sortBy(_._2).mkString(",")}")
      assert(dim.length == 61, s"expected 61 keys, got ${dim.length}")
      assert(dim.map(_._2).sorted.toSeq == (1L to 61L), "ids must be dense 1..61")
    } finally rmrf(dir)
  }
}
