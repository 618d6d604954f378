package graft

import org.apache.spark.sql.functions._
import graft.gen.WalGen
import graft.lake.LakeTable
import graft.merge.CdcMerge
import graft.model.Schemas
import graft.ops.{Catalog, TableIO, TableMeta}

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("catalog finds parquet tables and lake tables across channels") {
    val dir = tmpDir("cat")
    try {
      // channel/namespace/table layout: one plain parquet, one LakeTable
      val plain = Seq((1, "x"), (2, "y")).toDF("id", "v")
      TableIO.writeParquet(plain, s"$dir/garden/demo/plain.parquet", TableMeta("plain"))
      val t = LakeTable.create(spark, s"$dir/grapher/demo/convs", Schemas.transcript, 2)
      val cfg = WalGen.Config(numEvents = 500, numConvs = 10)
      CdcMerge.apply(t, WalGen.events(spark, cfg, 0, 500).toDF(), 0L)

      val cat = new Catalog(spark, dir)
      val all = cat.entries
      assert(all.size == 2, all.mkString("; "))
      val lake = cat.findOne(table = "convs")
      assert(lake.isLake && lake.channel == "grapher" && lake.namespace == "demo")
      assert(cat.load(lake).count() == WalGen.oracleState(cfg).size)
      val p = cat.findOne(table = "plain", channel = "garden")
      assert(!p.isLake && cat.load(p).count() == 2)
      assert(cat.find(channel = "garden").size == 1)
      intercept[IllegalArgumentException](cat.findOne(table = "nope"))
    } finally rmrf(dir)
  }

  test("published catalog: frame-indexed search over the published index, channel subsetting, token swap isolation") {
    val dir = tmpDir("pubcat")
    try {
      val plain = Seq((1, "x"), (2, "y")).toDF("id", "v")
      TableIO.writeParquet(plain, s"$dir/garden/demo/plain.parquet", graft.ops.TableMeta("plain"))
      val t = LakeTable.create(spark, s"$dir/grapher/demo/convs", Schemas.transcript, 2)
      val cfg = WalGen.Config(numEvents = 500, numConvs = 10)
      CdcMerge.apply(t, WalGen.events(spark, cfg, 0, 500).toDF(), 0L)

      // publish v1, then open WITHOUT walking the tree
      val cat = new Catalog(spark, dir)
      val v1 = cat.publish(version = 1L)
      val reader = graft.ops.PublishedCatalog.open(spark, dir)
      assert(reader.version == v1)
      assert(reader.index.count() == 2)
      // frame search: substring table match, exact channel
      assert(reader.find(table = "conv").count() == 1)
      val (path, isLake) = reader.findOne(table = "convs", channel = "grapher")
      assert(isLake && reader.load(path, isLake).count() == WalGen.oracleState(cfg).size)
      // channel subset loads only that channel's frame
      val gardenOnly = graft.ops.PublishedCatalog.open(spark, dir, channels = Seq("garden"))
      assert(gardenOnly.index.count() == 1)
      intercept[IllegalArgumentException](
        graft.ops.PublishedCatalog.open(spark, dir, channels = Seq("nope")))
      // a new table is INVISIBLE until re-published (index, not listing)
      TableIO.writeParquet(plain, s"$dir/garden/demo/late.parquet", graft.ops.TableMeta("late"))
      assert(graft.ops.PublishedCatalog.open(spark, dir).index.count() == 2)
      val v2 = cat.publish(version = 2L)
      val reader2 = graft.ops.PublishedCatalog.open(spark, dir)
      assert(reader2.version == v2 && reader2.index.count() == 3)
      // the old reader's pinned frames still read (version-suffixed files)
      assert(reader.index.count() == 2)
    } finally rmrf(dir)
  }

  test("published versions are immutable: re-publishing a version is refused; the default version never collides") {
    val dir = tmpDir("pubimm")
    try {
      val plain = Seq((1, "x")).toDF("id", "v")
      TableIO.writeParquet(plain, s"$dir/garden/demo/plain.parquet", graft.ops.TableMeta("plain"))
      val cat = new Catalog(spark, dir)
      cat.publish(version = 5L)
      val reader = graft.ops.PublishedCatalog.open(spark, dir)
      // an explicit re-publish of version 5 would overwrite the frames the
      // held token points at — refused loudly
      val e = intercept[IllegalArgumentException](cat.publish(version = 5L))
      assert(e.getMessage.contains("already published"), e.getMessage)
      assert(reader.index.count() == 1) // held token unharmed
      // back-to-back default publishes (same-millisecond race in the old
      // currentTimeMillis default) get DISTINCT monotone versions
      val va = cat.publish()
      val vb = cat.publish()
      assert(va != 5L && vb > va, s"va=$va vb=$vb")
      assert(graft.ops.PublishedCatalog.open(spark, dir).version == vb)
    } finally rmrf(dir)
  }

  test("publishCas: concurrent publishers each land their entry (cross-process token CAS, no lost update)") {
    val dir = tmpDir("pubcas")
    try {
      import graft.ops.PublishedCatalog
      // seed a published base the racers must carry forward
      PublishedCatalog.publish(spark, dir, Seq(("garden", "ns", "base", "/p/base", false)), 1L)
      // N racers, barrier-released together, each merging ONE distinct
      // entry against whatever is current — bypasses every in-process lock,
      // so this is exactly the two-process interleaving
      val n = 4
      val barrier = new java.util.concurrent.CyclicBarrier(n)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until n).map { i =>
        new Thread(() => {
          try {
            barrier.await()
            PublishedCatalog.publishCas(spark, dir,
              cur => cur :+ (("sql", "", s"t$i", s"/p/t$i", true)))
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(120000))
      assert(errs.isEmpty, errs.toArray.mkString("; "))
      val r = PublishedCatalog.open(spark, dir)
      // every racer's entry landed AND the base survived: no lost update
      val tables = r.index.select("table").collect().map(_.getString(0)).toSet
      assert(tables == (0 until n).map(i => s"t$i").toSet + "base", tables)
      // the token chain is dense from the seed: one version per winner
      assert(r.version == 1L + n, s"version ${r.version}")
    } finally rmrf(dir)
  }

  test("a publisher dead between frames and token CAS does not wedge the root") {
    val dir = tmpDir("puborphan")
    try {
      import graft.ops.PublishedCatalog
      PublishedCatalog.publish(spark, dir, Seq(("garden", "ns", "base", "/p/base", false)), 1L)
      // simulate the crash: frames for version 2 exist (uid-suffixed), but
      // the token CAS never ran — version 2 was never readable
      val idx = java.nio.file.Paths.get(dir, "_index")
      Seq(("sql", "", "ghost", "/p/ghost", true))
        .toDF("channel", "namespace", "table", "path", "is_lake")
        .coalesce(1).write.parquet(idx.resolve("channel-sql-2-udeadbeef.parquet").toString)
      // the next CAS publish takes version 2 anyway (fresh uid, no clobber
      // of the orphan) instead of retrying against the orphan forever
      val v = PublishedCatalog.publishCas(spark, dir,
        cur => cur :+ (("sql", "", "live", "/p/live", true)))
      assert(v == 2L)
      val r = PublishedCatalog.open(spark, dir)
      val tables = r.index.select("table").collect().map(_.getString(0)).toSet
      assert(tables == Set("base", "live"), tables) // ghost never became visible
    } finally rmrf(dir)
  }

  test("legacy catalog.json (pre-token-chain) stays readable; the next publish upgrades to the chain") {
    val dir = tmpDir("publeg")
    try {
      import graft.ops.PublishedCatalog
      // hand-write the ROUND-3 on-disk form: unsuffixed frame + single
      // catalog.json token, no token-*.json chain
      val idx = java.nio.file.Paths.get(dir, "_index")
      java.nio.file.Files.createDirectories(idx)
      Seq(("garden", "ns", "old", "/p/old", false))
        .toDF("channel", "namespace", "table", "path", "is_lake")
        .coalesce(1).write.parquet(idx.resolve("channel-garden-3.parquet").toString)
      java.nio.file.Files.write(idx.resolve("catalog.json"),
        """{"version":3,"channels":["garden"]}""".getBytes("UTF-8"))
      val r = PublishedCatalog.open(spark, dir)
      assert(r.version == 3L && r.index.count() == 1)
      // CAS publish continues the chain from the legacy version
      val v = PublishedCatalog.publishCas(spark, dir,
        cur => cur :+ (("sql", "", "neu", "/p/neu", true)))
      assert(v == 4L)
      val r2 = PublishedCatalog.open(spark, dir)
      assert(r2.version == 4L && r2.index.count() == 2)
    } finally rmrf(dir)
  }

  test("publishing an empty catalog yields an empty index, not an error") {
    val dir = tmpDir("emptycat")
    try {
      new Catalog(spark, dir).publish(version = 1L)
      val r = graft.ops.PublishedCatalog.open(spark, dir)
      assert(r.index.count() == 0)
      assert(r.find(table = "anything").count() == 0)
      intercept[IllegalArgumentException](r.findOne(table = "anything"))
    } finally rmrf(dir)
  }
}
