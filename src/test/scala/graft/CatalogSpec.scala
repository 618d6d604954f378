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
}
