package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Dedup + similarity semantics on planted duplicates: LSH must surface the
  * planted near-dup pairs, and verification scores must match
  * driver-computed references.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def mkDoc(seed: Int, words: Int): String =
    (0 until words).map(i => s"w${graft.util.DetHash.nextLong(seed * 1000003L + i, 50L)}")
      .mkString(" ")

  test("exact dedup keeps min key per identical text") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val out = DedupOps.exactDuplicates(docs, "text", "doc_id")
      .orderBy("keeper").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 2L)
    assert(DedupOps.dropExactDuplicates(docs, "text", "doc_id").count() == 2)
  }

  test("minhash LSH finds planted near-duplicates, skips dissimilar") {
    val base = (0 until 40).map(i => (i.toLong, mkDoc(i, 60)))
    // plant: doc 100 = copy of doc 0 with one word changed (high jaccard)
    val nearDup = (100L, base(0)._2.split(" ").updated(3, "CHANGED").mkString(" "))
    val docs = (base :+ nearDup).toDF("doc_id", "text")
    val pairs = DedupOps.minhashLshPairs(docs, "text", "doc_id",
      bands = 8, rowsPerBand = 4, minJaccard = 0.5).collect()
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 100L),
      s"planted pair not found; got ${pairs.mkString(", ")}")
    // all reported pairs genuinely exceed the threshold (exact verify ran)
    assert(pairs.forall(_.getDouble(2) >= 0.5))
  }

  test("dropMinhashNearDuplicates keeps one representative per cluster") {
    val base = (0 until 20).map(i => (i.toLong, mkDoc(i + 31, 60)))
    val dup1 = (100L, base(2)._2.split(" ").updated(1, "X").mkString(" "))
    val dup2 = (101L, base(2)._2.split(" ").updated(2, "Y").mkString(" "))
    val docs = (base ++ Seq(dup1, dup2)).toDF("doc_id", "text")
    val out = DedupOps.dropMinhashNearDuplicates(docs, "text", "doc_id", minJaccard = 0.5)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(2L) && !kept.contains(100L) && !kept.contains(101L),
      s"kept=$kept")
    assert(kept.size == 20) // all originals except the two planted dups
  }

  test("simhash: planted near-dup within hamming radius, random docs far") {
    val base = (0 until 30).map(i => (i.toLong, mkDoc(i + 77, 80)))
    val nearDup = (200L, base(5)._2.split(" ").updated(10, "Z").mkString(" "))
    val docs = (base :+ nearDup).toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(docs, "text", "doc_id",
      maxHamming = 12, bands = 13).collect()
    assert(pairs.exists(r => r.getLong(0) == 5L && r.getLong(1) == 200L),
      s"planted simhash pair not found; got ${pairs.mkString(", ")}")
  }

  test("simhash banding contract: radius beyond pigeonhole is rejected; wide radius needs more bands") {
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    // maxHamming >= bands would silently under-report pairs → must throw
    intercept[IllegalArgumentException] {
      DedupOps.simhashPairs(docs, "text", "doc_id", maxHamming = 8, bands = 4)
    }
    // a planted pair at Hamming distance up to 8 is found reliably with 9 bands
    val base = (0 until 25).map(i => (i.toLong, mkDoc(i + 501, 80)))
    val words = base(3)._2.split(" ")
    val far = (300L, words.updated(5, "A").updated(20, "B").updated(40, "C").mkString(" "))
    val all = (base :+ far).toDF("doc_id", "text")
    val sigs = all.select(col("doc_id"), DedupOps.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = java.lang.Long.bitCount(sigs(3L) ^ sigs(300L))
    assert(d <= 8, s"planted pair drifted to Hamming $d; tighten the edit")
    val pairs = DedupOps.simhashPairs(all, "text", "doc_id", maxHamming = 8, bands = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((3L, 300L)), s"Hamming-$d pair missed with 9 bands: ${pairs.mkString(",")}")
    // MULTI-PROBE alternative: same radius with 5 wide bands (1-bit probes
    // extend the exhaustive radius to 2*bands-1 = 9) — same pair found
    val probedPairs = DedupOps.simhashPairs(all, "text", "doc_id",
      maxHamming = 8, bands = 5, multiProbe = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(probedPairs.contains((3L, 300L)),
      s"Hamming-$d pair missed by multi-probe: ${probedPairs.mkString(",")}")
    // and the contract still rejects radii beyond the probe guarantee
    intercept[IllegalArgumentException] {
      DedupOps.simhashPairs(docs, "text", "doc_id", maxHamming = 10, bands = 5, multiProbe = true)
    }
    // GENERALIZED probes: probeBits=2 with 4 wide bands is exhaustive to
    // bands*(p+1)-1 = 11 — the same Hamming-8 pair, exact-oracle checked
    // against a brute-force pass over every signature pair
    val probed2 = DedupOps.simhashPairs(all, "text", "doc_id",
      maxHamming = 8, bands = 4, probeBits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = sigs.keys.toSeq.combinations(2).map(_.sorted).collect {
      case Seq(a, b) if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 8 => (a, b)
    }.toSet
    assert(probed2 == brute,
      s"probeBits=2 must be EXHAUSTIVE to radius 11: missed ${brute -- probed2}, extra ${probed2 -- brute}")
    // the cap on probe expansion is loud, not silent
    intercept[IllegalArgumentException] {
      DedupOps.simhashPairs(docs, "text", "doc_id", maxHamming = 3, bands = 2, probeBits = 3)
    }
  }

  test("embedding cosine near-dup: planted perturbed twins recovered with recall >= 0.8") {
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f)))
    // 20 planted twins: v' = v + small noise → cosine ≈ 0.995
    val twins = (0 until 20).map(i =>
      (1000L + i, base(i)._2.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)))
    val df = (base ++ twins).toDF("vec_id", "embedding")
    val pairs = DedupOps.embeddingCosinePairs(df, "embedding", "vec_id",
      minCosine = 0.9, planes = 8, tables = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0 until 20).count(i => pairs.contains((i.toLong, 1000L + i)))
    assert(found >= 16, s"recall ${found / 20.0} < 0.8: $pairs")
    // verification is exact: every reported pair genuinely exceeds the threshold
    val cos = DedupOps.embeddingCosinePairs(df, "embedding", "vec_id",
      minCosine = 0.9, planes = 8, tables = 8).select("cosine").collect()
    assert(cos.forall(_.getDouble(0) >= 0.9))
  }

  test("LSH-routed ngram jaccard matches the exact quadratic baseline on planted dups") {
    val base = (0 until 30).map(i => (i.toLong, "en", mkDoc(i + 900, 60)))
    val d1 = (500L, "en", base(4)._3.split(" ").updated(2, "Q").mkString(" "))
    val d2 = (501L, "en", base(9)._3.split(" ").updated(7, "R").mkString(" "))
    val docs = (base ++ Seq(d1, d2)).toDF("doc_id", "lang", "text")
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"),
        r.getAs[Double]("jaccard"))).toSet
    val lshRouted = key(DedupOps.ngramJaccardPairs(docs, "text", "doc_id",
      Seq("lang"), n = 3, minJaccard = 0.3).collect())
    val exact = key(DedupOps.ngramJaccardPairsExact(docs, "text", "doc_id",
      Seq("lang"), n = 3, minJaccard = 0.3).collect())
    assert(exact.nonEmpty && lshRouted == exact,
      s"LSH-routed=$lshRouted exact=$exact")
  }

  test("shingles guard: documents shorter than n tokens yield empty sets, not ANSI errors") {
    val docs = Seq((1L, ""), (2L, "one"), (3L, "one two"), (4L, "one two three four"))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), size(TextOps.shingles(col("text"), 3)).as("n"))
      .orderBy("doc_id").collect().map(_.getInt(1))
    assert(out.toSeq == Seq(0, 0, 0, 2))
    // end-to-end: minhash LSH over a corpus containing short docs must not crash
    val pairs = DedupOps.minhashLshPairs(docs, "text", "doc_id", minJaccard = 0.5)
    assert(pairs.count() == 0)
  }

  test("ngram jaccard pairs within blocks match driver-computed jaccard") {
    val docs = Seq(
      (1L, "en", "a b c d e f"),
      (2L, "en", "a b c d e g"),   // high overlap with 1
      (3L, "en", "p q r s t u"),
      (4L, "de", "a b c d e f")    // same text but different block → no pair
    ).toDF("doc_id", "lang", "text")
    val pairs = DedupOps.ngramJaccardPairs(docs, "text", "doc_id", Seq("lang"),
      n = 3, minJaccard = 0.3).collect()
    assert(pairs.length == 1)
    val r = pairs(0)
    assert(r.getAs[Long]("key_a") == 1L && r.getAs[Long]("key_b") == 2L)
    // shingles(1)={abc,bcd,cde,def}, shingles(2)={abc,bcd,cde,deg} → J=3/5
    assert(math.abs(r.getAs[Double]("jaccard") - 0.6) < 1e-12)
  }

  test("ANN: LSH top-k achieves recall vs brute force on clustered vectors") {
    val rnd = new scala.util.Random(42)
    // 3 clusters of 30 vectors each in 64 dims
    val vecs = (0 until 90).map { i =>
      val c = i % 3
      val center = Array.tabulate(64)(d => if (d % 3 == c) 1.0f else 0.0f)
      (i.toLong, center.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 3)
    val brute = SimilarityOps.bruteForceTopK(df, "embedding", "vec_id",
      queries, "embedding", "vec_id", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps.lshTopK(df, "embedding", "vec_id",
      queries, "embedding", "vec_id", k = 5, planes = 6, tables = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"LSH recall $recall too low")
    // brute-force cosine matches a driver-side computation for one pair
    val a = vecs(0)._2.map(_.toDouble); val b = vecs(3)._2.map(_.toDouble)
    val expected = a.zip(b).map { case (x, y) => x * y }.sum /
      (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val cos = queries.filter(col("vec_id") === 0)
      .crossJoin(df.filter(col("vec_id") === 3).select(col("embedding").as("e2")))
      .select(SimilarityOps.cosine(col("embedding"), col("e2"))).collect()(0).getDouble(0)
    assert(math.abs(cos - expected) < 1e-9)
  }

  test("ANN: IVF top-k finds the planted nearest neighbor; probes a strict cell subset") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 120).map(i => (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f)))
    val df = base.toDF("vec_id", "embedding")
    // queries = perturbed twins of 4 corpus vectors → true top-1 is the original
    val queries = (0 until 4).map(i =>
      (1000L + i, base(i)._2.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.ivfTopK(df, "embedding", "vec_id",
      queries, "embedding", "vec_id", k = 3, nlist = 8, nprobe = 3)
      .collect()
    val top1 = out.filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until 4).count(i => top1.get(1000L + i).contains(i.toLong))
    assert(hits >= 3, s"IVF recall@1 ${hits / 4.0} < 0.75: ${top1.mkString(",")}")
    // every reported cosine is exact (verified scoring, not approximated)
    assert(out.forall(r => r.getDouble(2) <= 1.0 + 1e-9 && r.getDouble(2) >= -1.0 - 1e-9))
  }

  test("embedding cosine near-dup: dims inferred — recall >= 0.8 on a 48-d corpus") {
    val rnd = new scala.util.Random(13)
    val base = (0 until 60).map(i =>
      (i.toLong, Array.fill(48)((rnd.nextFloat() - 0.5f) * 2f)))
    val twins = (0 until 20).map(i =>
      (1000L + i, base(i)._2.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)))
    val df = (base ++ twins).toDF("vec_id", "embedding")
    // no dims passed: hyperplanes must span all 48 dimensions (a hardcoded
    // 64 would zero-pad; a hardcoded 32 would ignore a third of the signal)
    val pairs = DedupOps.embeddingCosinePairs(df, "embedding", "vec_id",
      minCosine = 0.9, planes = 8, tables = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0 until 20).count(i => pairs.contains((i.toLong, 1000L + i)))
    assert(found >= 16, s"48-d recall ${found / 20.0} < 0.8: $pairs")
  }

  test("ANN: IVF tie-break — identical centroids (all cells tie) still route query to its twin at nprobe=1") {
    // A degenerate corpus where every vector is identical makes ALL
    // centroids equal, so every cell ties at every assignment/probe. The
    // contract: assignment and probing prefer the SAME cell on ties —
    // inconsistent tie-breaks would assign the corpus to one cell and
    // probe another, returning ZERO candidates at nprobe=1.
    val v = Array.tabulate(16)(d => (d + 1).toFloat / 16f)
    val corpus = (0 until 50).map(i => (i.toLong, v.clone())).toDF("vec_id", "embedding")
    val query = Seq((999L, v.clone())).toDF("vec_id", "embedding")
    val out = SimilarityOps.ivfTopK(corpus, "embedding", "vec_id",
      query, "embedding", "vec_id", k = 1, nlist = 4, nprobe = 1)
      .collect()
    assert(out.length == 1, s"tie-broken probe found no candidates: ${out.mkString(",")}")
    assert(out(0).getLong(0) == 999L && math.abs(out(0).getDouble(2) - 1.0) < 1e-9)
  }

  test("ANN: IVF recall@1 >= 0.9 on a 10x harder planted set at the same nprobe") {
    val rnd = new scala.util.Random(17)
    val base = (0 until 120).map(i => (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f)))
    val df = base.toDF("vec_id", "embedding")
    // 10 queries perturbed 10x harder than the original planted set (0.5
    // vs 0.05 noise amplitude) — the true neighbor is still the original
    val queries = (0 until 10).map(i =>
      (1000L + i, base(i)._2.map(x => x + (rnd.nextFloat() - 0.5f) * 0.5f)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.ivfTopK(df, "embedding", "vec_id",
      queries, "embedding", "vec_id", k = 3, nlist = 8, nprobe = 3)
      .collect()
    val top1 = out.filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until 10).count(i => top1.get(1000L + i).contains(i.toLong))
    assert(hits >= 9, s"IVF recall@1 ${hits / 10.0} < 0.9 on the hard set: ${top1.mkString(",")}")
    // the distributed-refinement path (posexplode per-cell means over the
    // whole corpus) must preserve recall when run explicitly
    val refined = SimilarityOps.ivfTopK(df, "embedding", "vec_id",
      queries, "embedding", "vec_id", k = 3, nlist = 8, nprobe = 3,
      distributedIters = 1).collect()
    val rTop1 = refined.filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rHits = (0 until 10).count(i => rTop1.get(1000L + i).contains(i.toLong))
    assert(rHits >= 9, s"refined IVF recall@1 ${rHits / 10.0} < 0.9")
  }

  test("multimodal decode: schema + modality-dependent metadata") {
    val docs = Seq((0L, "image", "abcdef"), (1L, "audio", "hello world"),
      (2L, "video", "0123456789")).toDF("id", "modality", "t")
      .withColumn("payload", encode(col("t"), "utf-8"))
    val out = MultimodalOps.decode(docs, "id", "payload", "modality").collect()
      .sortBy(_.media_id)
    assert(out(0).width.contains(16 + 6 % 64) && out(0).sample_rate.isEmpty)
    assert(out(1).sample_rate.contains(8000 + (11 % 3) * 4000) && out(1).width.isEmpty)
    assert(out(2).n_frames.contains(1 + 10 % 30))
    val frames = MultimodalOps.sampleFrames(
      MultimodalOps.decode(docs, "id", "payload", "modality").toDF(), stride = 5)
    assert(frames.filter(col("media_id") === 2).count() == 3) // frames 0,5,10 of 11
  }

  test("multimodal decode: REAL PNG/JPEG header parsing beats the stub") {
    // driver-side round trips, including >127 byte values (sign handling)
    assert(MultimodalOps.imageDims(MultimodalOps.pngHeader(640, 480)).contains((640, 480)))
    assert(MultimodalOps.imageDims(MultimodalOps.pngHeader(70000, 3)).contains((70000, 3)))
    assert(MultimodalOps.imageDims(MultimodalOps.jpegHeader(1920, 1080)).contains((1920, 1080)))
    assert(MultimodalOps.imageDims("not an image".getBytes).isEmpty)
    assert(MultimodalOps.imageDims(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    // distributed: real containers decode to their true dims, the
    // unrecognized payload falls back to the deterministic stub
    val rows = Seq(
      (0L, "image", MultimodalOps.pngHeader(320, 200)),
      (1L, "image", MultimodalOps.jpegHeader(64, 32)),
      (2L, "image", "plain bytes".getBytes("UTF-8")))
    val docs = spark.createDataFrame(rows).toDF("id", "modality", "payload")
    val out = MultimodalOps.decode(docs, "id", "payload", "modality").collect()
      .sortBy(_.media_id)
    assert(out(0).width.contains(320) && out(0).height.contains(200))
    assert(out(1).width.contains(64) && out(1).height.contains(32))
    assert(out(2).width.contains(16 + 11 % 64)) // stub fallback
  }

  test("multimodal decode: REAL WAV sample decode (RMS/peak over PCM)") {
    import MultimodalOps._
    // square wave: RMS == amplitude exactly, stereo interleave covered
    val mono = wavBytes(8000, 1, Array.tabulate(100)(i => if (i % 2 == 0) 500 else -500).map(_.toShort))
    val wm = wavFeatures(mono).get
    assert(wm == WavInfo(8000, 1, 100, 12L, 500.0, 500))
    val stereo = wavBytes(44100, 2, Array.tabulate(441)(i => if (i % 2 == 0) 12345 else -12345).map(_.toShort))
    val ws = wavFeatures(stereo).get
    assert(ws.channels == 2 && ws.nSamples == 441 && ws.durationMs == 10L &&
      ws.rms == 12345.0 && ws.peak == 12345)
    // mixed amplitudes: rms is the real quadratic mean, peak the real max
    val mixed = wavFeatures(wavBytes(16000, 1, Array[Short](3, -4, 0, 0))).get
    assert(mixed.rms == math.sqrt(25.0 / 4) && mixed.peak == 4)
    // an extra chunk before fmt/data must be skipped (word-aligned walk)
    val withJunk = {
      val w = wavBytes(8000, 1, Array[Short](7, -7))
      val junk = java.nio.ByteBuffer.allocate(8 + 3 + 1).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .put("LIST".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3, 0)).array()
      w.take(12) ++ junk ++ w.drop(12)
    }
    assert(wavFeatures(withJunk).map(_.peak).contains(7))
    // non-WAV / torn payloads refuse instead of inventing features
    assert(wavFeatures("RIFFnope".getBytes).isEmpty)
    assert(wavFeatures(mono.dropRight(5)).isEmpty) // torn data chunk
    assert(wavFeatures(null).isEmpty)
    // adversarial chunk length near Int.MaxValue: the int sum i+8+len
    // wraps negative — must return None, not crash the task
    val evil = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(16).put("WAVE".getBytes("US-ASCII"))
      .put("JUNK".getBytes("US-ASCII")).putInt(0x7ffffff7).putInt(0).array()
    assert(wavFeatures(evil).isEmpty)
    assert(wavFormat(evil).isEmpty)
    // header-only parse agrees with the full decode on format facts
    assert(wavFormat(stereo).contains((44100, 2)))
  }

  test("multimodal decode: REAL BMP pixel decode (stride + bottom-up flip)") {
    import MultimodalOps._
    // width 9 -> stride 28 exercises row padding; R varies by TOP-origin y
    val bmp = bmp24(9, 4, (x, y) => (10 + y, 20 + x, 3))
    val s = bmpStats(bmp).get
    assert(s.width == 9 && s.height == 4)
    assert(s.sumR == 9L * (4 * 10 + 6))         // sum over y of (10+y), x9 cols
    assert(s.sumG == 4L * (9 * 20 + 36))        // sum over x of (20+x), x4 rows
    assert(s.sumB == 9L * 4 * 3)
    assert(s.topRowSumR == 9L * 10)             // y=0 row — unflipped would be 9*13
    assert(imageDims(bmp).contains((9, 4)))     // BMP dims in the shared dims parser
    assert(bmpStats("BMnope".getBytes).isEmpty)
    assert(bmpStats(bmp.dropRight(3)).isEmpty)  // torn pixel array
    // adversarial headers: width that overflows 3*w in int; Int.MinValue
    // height (no positive abs) — both must refuse, not crash or fake stats
    def patched(at: Int, v: Int): Array[Byte] = {
      val c = bmp.clone()
      java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(at, v)
      c
    }
    assert(bmpStats(patched(18, 0x2aaaaaab)).isEmpty) // 3*width wraps negative
    assert(bmpStats(patched(22, Int.MinValue)).isEmpty)
    // decode() integration: WAV audio rows get their REAL sample rate
    val rows = Seq((0L, "audio", wavBytes(22050, 1, Array[Short](1, -1))))
    val docs = spark.createDataFrame(rows).toDF("id", "modality", "payload")
    val out = MultimodalOps.decode(docs, "id", "payload", "modality").collect()
    assert(out(0).sample_rate.contains(22050))
  }

  test("multimodal decode: REAL PNG/JPEG pixel decode via the JDK reader; GIF dims; junk refusal") {
    import MultimodalOps._
    // PNG is lossless: the gradient round-trips value-for-value
    val png = pngBytes(9, 4, (x, y) => (10 + y, 20 + x, 3))
    val s = imagePixelStats(png).get
    assert(s.width == 9 && s.height == 4)
    assert(s.sumR == 9L * (4 * 10 + 6) && s.sumG == 4L * (9 * 20 + 36) && s.sumB == 9L * 4 * 3)
    assert(s.topRowSumR == 9L * 10)
    assert(imageDims(png).contains((9, 4)))
    // the BMP fast path and the ImageIO path agree on the same pixels
    assert(imagePixelStats(bmp24(9, 4, (x, y) => (10 + y, 20 + x, 3))).contains(s))
    // JPEG: lossy, so assert a REAL decode happened (dims + plausible sums)
    val img = new java.awt.image.BufferedImage(16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val j = imagePixelStats(bos.toByteArray).get
    assert(j.width == 16 && j.height == 8)
    assert(math.abs(j.sumR - 16L * 8 * 0x80) <= 16L * 8 * 2) // near-uniform gray survives DCT
    // junk and truncation refuse without crashing
    assert(imagePixelStats("not an image at all".getBytes).isEmpty)
    assert(imagePixelStats(png.take(20)).isEmpty)
    assert(imagePixelStats(null).isEmpty)
    // decompression-bomb guard: a header claiming a giant raster is refused
    // BEFORE any allocation (an OOM there is an Error no catch would stop)
    assert(imagePixelStats(pngHeader(60000, 60000)).isEmpty)
    val bombGif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x50, 0xc3.toByte, 0x50, 0xc3.toByte) ++ Array.fill(50)(0.toByte)
    assert(gifFrameStats(bombGif).isEmpty) // 50000x50000 logical screen
    // deliberate allowlist: only formats with a known header parse decode —
    // a TIFF payload (JRE ships a reader) is refused by the gate
    val tiffish = Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0) ++ Array.fill(64)(0.toByte)
    assert(imagePixelStats(tiffish).isEmpty)
  }

  test("multimodal video: REAL animated-GIF frame decode (count, order, exact gray sums)") {
    import MultimodalOps._
    // 3 frames, gray(f,x,y) = 5 + 7f + x + y (max 5+14+10 < 256, palette-exact)
    val gif = gifBytes(6, 5, 3, (f, x, y) => 5 + 7 * f + x + y)
    assert(imageDims(gif).contains((6, 5)))
    val frames = gifFrameStats(gif).get
    assert(frames.length == 3)
    def expectedGray(f: Int): Long = // sum over x,y of (5 + 7f + x + y)
      6L * 5 * (5 + 7 * f) + 5L * (6 * 5 / 2) + 6L * (5 * 4 / 2)
    frames.zipWithIndex.foreach { case (st, f) =>
      assert(st.width == 6 && st.height == 5)
      assert(st.sumR == expectedGray(f) && st.sumG == st.sumR && st.sumB == st.sumR,
        s"frame $f: got ${st.sumR}, want ${expectedGray(f)}")
    }
    assert(gifFrameStats("GIF89a-but-not-really".getBytes).isEmpty)
    assert(gifFrameStats(null).isEmpty)
    // the allocation-free block-walk count agrees with the full decode
    assert(gifFrameCount(gif).contains(3))
    assert(gifFrameCount(gifBytes(4, 3, 1, (_, x, y) => x + y)).contains(1))
    assert(gifFrameCount(gif.dropRight(4)).isEmpty) // torn: no trailer reached
    assert(gifFrameCount("GIF89a-but-not-really".getBytes).isEmpty)
    // decode() integration: a GIF video payload gets its REAL frame count
    val vdf = Seq((9L, "video", gif)).toDF("id", "modality", "payload")
    val vout = MultimodalOps.decode(vdf, "id", "payload", "modality").collect().head
    assert(vout.n_frames.contains(3) && vout.width.contains(6) && vout.height.contains(5))
    // operator: first/last sums catch order, n_frames from the container
    val df = Seq((7L, gif)).toDF("id", "payload")
    val out = videoFrameStats(df, "id", "payload").collect().head
    assert(out.n_frames.contains(3))
    assert(out.first_frame_sum.contains(3 * expectedGray(0)))
    assert(out.last_frame_sum.contains(3 * expectedGray(2)))
  }

  test("multimodal containers: REAL MP3 frame walk (tables, duration, torn/hostile refusal)") {
    import MultimodalOps._
    // 44100 Hz, 128 kbps, stereo, 7 frames: frameLen = 144*128000/44100 = 417
    val mp3 = mp3Bytes(44100, 128, 2, 7)
    assert(mp3.length == 417 * 7)
    val i = mp3Info(mp3).get
    assert(i.sampleRate == 44100 && i.channels == 2 && i.bitrateKbps == 128)
    assert(i.nFrames == 7 && i.durationMs == 7L * 1152 * 1000 / 44100)
    // mono, exact-division rate: 32000 Hz @ 64 kbps → frameLen 288
    val m = mp3Info(mp3Bytes(32000, 64, 1, 3)).get
    assert(m.channels == 1 && m.nFrames == 3 && m.durationMs == 3L * 1152 * 1000 / 32000)
    // header-only fast path agrees
    assert(mp3Format(mp3).contains((44100, 2)))
    // ID3v2 prefix skipped (syncsafe size), ID3v1 trailer tolerated
    val id3v2 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++ new Array[Byte](10)
    assert(mp3Info(id3v2 ++ mp3).map(_.nFrames).contains(7))
    val id3v1 = Array[Byte]('T', 'A', 'G') ++ new Array[Byte](125)
    assert(mp3Info(mp3 ++ id3v1).map(_.nFrames).contains(7))
    // torn final frame / desynced stream / junk refuse without crashing
    assert(mp3Info(mp3.dropRight(5)).isEmpty)
    assert(mp3Info(mp3 ++ Array[Byte](1, 2, 3)).isEmpty)
    assert(mp3Info("not audio".getBytes).isEmpty)
    assert(mp3Info(null).isEmpty)
    // hostile ID3 size: non-syncsafe bytes and a tag past the payload end
    assert(mp3Info(Array[Byte]('I', 'D', '3', 4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f) ++ mp3).isEmpty)
    val badSyncsafe = id3v2.clone(); badSyncsafe(9) = 0x80.toByte
    assert(mp3Info(badSyncsafe ++ mp3).isEmpty)
    // free-form bitrate (idx 0) and reserved sample-rate idx refuse
    val freeBr = mp3.clone(); freeBr(2) = (freeBr(2) & 0x0f).toByte
    assert(mp3Info(freeBr).isEmpty)
  }

  test("multimodal containers: REAL OGG page walk with CRC validation") {
    import MultimodalOps._
    val ogg = oggBytes(16000, 2, 48000L, 3) // 1 ident + 3 content pages
    val i = oggInfo(ogg).get
    assert(i.sampleRate == 16000 && i.channels == 2)
    assert(i.nSamples == 48000L && i.durationMs == 3000L && i.nPages == 4)
    // a single flipped BODY byte breaks that page's CRC → whole stream refused
    val corrupt = ogg.clone()
    corrupt(ogg.length - 1) = (corrupt(ogg.length - 1) ^ 0x01).toByte
    assert(oggInfo(corrupt).isEmpty)
    // torn: truncated final page / missing EOS flag / junk
    assert(oggInfo(ogg.dropRight(3)).isEmpty)
    assert(oggInfo(ogg ++ Array[Byte](0, 0)).isEmpty) // bytes after EOS
    assert(oggInfo("OggSnope".getBytes).isEmpty)
    assert(oggInfo(null).isEmpty)
    // a corrupt byte is caught by the CRC check (not the ident parse)…
    val noIdent = oggBytes(8000, 1, 100L, 1)
    noIdent(28) = 'x'.toByte // clobber the ident packet_type inside page 0
    assert(oggInfo(noIdent).isEmpty)
    // …and a VALID-CRC page that simply isn't a Vorbis ident is refused by
    // the ident check itself (re-CRC the clobbered page 0: 27+1+30 bytes)
    val crc = oggCrc(noIdent, 0, 58, 22)
    noIdent(22) = crc.toByte; noIdent(23) = (crc >> 8).toByte
    noIdent(24) = (crc >> 16).toByte; noIdent(25) = (crc >> 24).toByte
    assert(oggInfo(noIdent).isEmpty)
  }

  test("multimodal containers: header-only oggFormat parses page-0 ident only") {
    import MultimodalOps._
    val ogg = oggBytes(22050, 1, 1000L, 2)
    assert(oggFormat(ogg).contains((22050, 1)))
    // page-0 CRC validated; LATER-page corruption is not scanned — that is
    // the point of the header-only probe (the full walk still refuses)
    val lateCorrupt = ogg.clone()
    lateCorrupt(ogg.length - 1) = (lateCorrupt(ogg.length - 1) ^ 0x01).toByte
    assert(oggFormat(lateCorrupt).contains((22050, 1)) && oggInfo(lateCorrupt).isEmpty)
    // page-0 body corruption breaks its CRC → refused
    val earlyCorrupt = ogg.clone()
    earlyCorrupt(30) = (earlyCorrupt(30) ^ 0x01).toByte
    assert(oggFormat(earlyCorrupt).isEmpty)
    assert(oggFormat(null).isEmpty && oggFormat("OggSnope".getBytes).isEmpty)
    assert(oggFormat(ogg.take(20)).isEmpty)
  }

  test("multimodal containers: REAL MP4 box walk (dims, duration, stts sum)") {
    import MultimodalOps._
    val mp4 = mp4Bytes(640, 360, timescale = 30000, durationTicks = 1001L * 240,
      sttsCounts = Seq(100, 140))
    val i = mp4Info(mp4).get
    assert(i.width == 640 && i.height == 360 && i.brand == "isom")
    assert(i.nFrames == 240) // summed across BOTH stts entries
    assert(i.durationMs == 1001L * 240 * 1000 / 30000)
    // decode() integration: video rows get MP4 dims + frame count
    val vdf = Seq((3L, "video", mp4)).toDF("id", "modality", "payload")
    val vout = MultimodalOps.decode(vdf, "id", "payload", "modality").collect().head
    assert(vout.width.contains(640) && vout.height.contains(360) && vout.n_frames.contains(240))
    // audio decode() integration for MP3/OGG sample rates
    val adf = Seq((4L, "audio", mp3Bytes(48000, 64, 1, 2)),
                  (5L, "audio", oggBytes(44100, 2, 441L, 1))).toDF("id", "modality", "payload")
    val aout = MultimodalOps.decode(adf, "id", "payload", "modality").collect()
      .map(r => r.media_id -> r.sample_rate).toMap
    assert(aout(4L).contains(48000) && aout(5L).contains(44100))
    // torn / hostile: truncated box, crafted 64-bit largesize, missing moov
    assert(mp4Info(mp4.dropRight(9)).isEmpty)
    val evil = mp4.clone()
    evil(0) = 0; evil(1) = 0; evil(2) = 0; evil(3) = 1 // ftyp claims largesize…
    assert(mp4Info(evil).isEmpty) // …but the 64-bit size field is garbage
    assert(mp4Info(mp4.take(24)).isEmpty) // ftyp alone: no moov
    assert(mp4Info("ftypnope".getBytes).isEmpty)
    assert(mp4Info(null).isEmpty)
    // a malformed child-box size UNDER mdia (nested-walk result was
    // discarded pre-round-5) is a torn payload like every other level
    val badMinf = mp4.clone()
    val minfAt = badMinf.indexOfSlice("minf".getBytes("US-ASCII"))
    badMinf(minfAt - 4) = 0x7f.toByte // minf size → huge: overruns mdia
    assert(mp4Info(badMinf).isEmpty)
    val badStts = mp4.clone()
    val sttsAt = badStts.indexOfSlice("stts".getBytes("US-ASCII"))
    badStts(sttsAt - 4) = 0x7f.toByte // stts size → huge: overruns stbl
    assert(mp4Info(badStts).isEmpty)
  }

  test("multimodal resize: REAL NN resize matches the integer closed form; passthrough within bound") {
    import MultimodalOps._
    val png = pngBytes(20, 10, (x, y) => (10 + y, 20 + x, 3))
    val df = Seq((1L, png)).toDF("id", "payload")
    val out = resizeImages(df, "id", "payload", maxSide = 8).collect().head
    assert(out.width.contains(20) && out.height.contains(10))
    assert(out.out_width.contains(8) && out.out_height.contains(4)) // ceil(10*8/20)=4
    val rs = imagePixelStats(out.payload).get
    // NN: out(x,y) = src((x*20)/8, (y*10)/4) → r = 10 + (y*10)/4
    val wantR = (0 until 4).map(y => 8L * (10 + (y * 10) / 4)).sum
    val wantG = (0 until 8).map(x => 4L * (20 + (x * 20) / 8)).sum
    assert(rs.sumR == wantR && rs.sumG == wantG && rs.sumB == 8L * 4 * 3,
      s"got (${rs.sumR},${rs.sumG},${rs.sumB}) want ($wantR,$wantG,${8L * 4 * 3})")
    // already small: payload passes through untouched
    val small = resizeImages(df, "id", "payload", maxSide = 64).collect().head
    assert(small.out_width.contains(20) && small.out_height.contains(10))
    assert(small.payload.sameElements(png))
    // junk keeps its row with null features
    val junk = resizeImages(Seq((2L, "nope".getBytes)).toDF("id", "payload"),
      "id", "payload", maxSide = 8).collect().head
    assert(junk.out_width.isEmpty && junk.payload == null)
  }

  test("quality: Gopher-style repetition signals match hand-computed closed forms") {
    // doc 1: "ab\ncd\nab\nab" — 4 lines, lines {ab, cd}, dup lines 2/4;
    //   chars: all 8, distinct 4 → dup_line_char_frac 0.5
    //   tokens (whitespace): ["ab", "cd", "ab", "ab"] → 2-grams:
    //   ["ab cd","cd ab","ab ab"] all distinct → dup_gram_frac 0
    //   top gram: each count 1, len 5 → 5/11 chars (text len 11)
    // doc 2: "x y x y x y" — 1 line; grams: [x y, y x, x y, y x, x y]
    //   → 5 grams, 2 distinct → dup 3/5; top = "x y"×3 ×len3 = 9/11
    val docs = Seq(
      (1L, "ab\ncd\nab\nab"),
      (2L, "x y x y x y"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = ops.QualityOps.repetitionSignals(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(out(1L) == ((4, 0.5, 0.5, 3, 0.0, 5.0 / 11)), out(1L))
    assert(out(2L) == ((1, 0.0, 0.0, 5, 3.0 / 5, 9.0 / 11)), out(2L))
    assert(out(3L) == ((1, 0.0, 0.0, 0, 0.0, 0.0)), out(3L)) // empty text: all-zero, no div-by-zero
    // filter form: doc 2 is gram-repetitive, doc 1 line-repetitive
    val kept = ops.QualityOps.dropRepetitive(docs, "doc_id", "text",
      maxDupLineFrac = 0.4, maxDupGramFrac = 0.5, n = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L), kept)
    val keptLoose = ops.QualityOps.dropRepetitive(docs, "doc_id", "text",
      maxDupLineFrac = 0.6, maxDupGramFrac = 0.7, n = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptLoose == Set(1L, 2L, 3L))
  }

  test("chunking: sliding token windows and greedy context packing match hand-computed forms") {
    // 10 tokens a0..a9, chunkSize 4, overlap 1 → stride 3:
    // starts 0,3,6,9 → chunks [a0..a3],[a3..a6],[a6..a9],[a9]
    val doc = (0 until 10).map("a" + _).mkString(" ")
    val df = Seq((1L, doc), (2L, "x y"), (3L, "   ")).toDF("doc_id", "text")
    val chunks = ops.ChunkOps.chunkByTokens(df, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(c => (c._1, c._2))
    assert(chunks.map(c => (c._1, c._2, c._4)).toSeq ==
      Seq((1L, 0, 4), (1L, 1, 4), (1L, 2, 4), (1L, 3, 1), (2L, 0, 2)), chunks.toSeq)
    assert(chunks(0)._3 == "a0 a1 a2 a3" && chunks(1)._3 == "a3 a4 a5 a6" &&
      chunks(3)._3 == "a9" && chunks(4)._3 == "x y")
    // whitespace-only doc 3 yields no chunks (and no crash)
    assert(!chunks.exists(_._1 == 3L))

    // packing: one shard (ids 1,3,5 % 2 = 1; 2,4 % 2 = 0), target 5 tokens
    //   shard 1 in id order: id1 n=3 cum=3 pack (3-3)/5=0; id3 n=4 cum=7
    //   pack (7-4)/5=0; id5 n=2 cum=9 pack (9-2)/5=1
    //   shard 0: id2 n=6 cum=6 pack 0; id4 n=1 cum=7 pack (7-1)/5=1
    val pdf = Seq(
      (1L, "t t t"), (2L, "t t t t t t"), (3L, "t t t t"), (4L, "t"), (5L, "t t")
    ).toDF("doc_id", "text")
    val packs = ops.ChunkOps.packGreedy(pdf, "doc_id", "text", targetTokens = 5, shards = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(packs(1L) == ((1L, 0L, 3L, 3L)), packs(1L))
    assert(packs(3L) == ((1L, 0L, 4L, 7L)), packs(3L))
    assert(packs(5L) == ((1L, 1L, 2L, 9L)), packs(5L))
    assert(packs(2L) == ((0L, 0L, 6L, 6L)), packs(2L))
    assert(packs(4L) == ((0L, 1L, 1L, 7L)), packs(4L))
  }

  test("decontamination: n-gram overlap vs an eval set, threshold + drop") {
    val evalSet = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta unrelated tail"), // shares 2 distinct 3-grams
      (2L, "x y gamma delta epsilon"),               // shares 1 ("gamma delta epsilon")
      (3L, "totally different words here"),          // shares none
      (4L, "short")                                  // < n tokens: no grams, no crash
    ).toDF("doc_id", "text")
    val scores = ops.DedupOps.contaminationScores(train, evalSet, "text", "doc_id",
      n = 3, minOverlap = 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores == Map(1L -> 2L, 2L -> 1L), scores)
    val kept = ops.DedupOps.dropContaminated(train, evalSet, "text", "doc_id",
      n = 3, minOverlap = 2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L)) // only the overlap>=2 doc dropped
  }

  test("hashSplit: deterministic portable split with validated weights") {
    val df = spark.range(0, 2000).toDF("id")
    val a = ops.TableOps.hashSplit(df, "id", Seq(("train", 80), ("val", 10), ("test", 10)))
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 buckets are uniform: 2000 keys land within a loose tolerance
    assert(math.abs(counts("train") - 1600L) < 200, counts)
    assert(counts("val") + counts("test") + counts("train") == 2000L)
    // same rows, same labels on a re-run (no sampling nondeterminism)
    val b = ops.TableOps.hashSplit(df, "id", Seq(("train", 80), ("val", 10), ("test", 10)))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // a different salt migrates rows; the same salt never does
    val c = ops.TableOps.hashSplit(df, "id", Seq(("train", 80), ("val", 10), ("test", 10)),
      salt = "other")
    assert(c.exceptAll(a).count() > 0)
    intercept[IllegalArgumentException](
      ops.TableOps.hashSplit(df, "id", Seq(("train", 70), ("val", 10))))
  }

  test("sampleMixture: per-stratum rates hold, deterministic, rate edges exact") {
    val df = spark.range(0, 4000)
      .select(col("id"), (when(col("id") % 2 === 0, "en").otherwise("fr")).as("lang"))
    val out = ops.TableOps.sampleMixture(df, "id", "lang", Seq("en" -> 0.25), 0.9)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("en") - 500L) < 100, counts)  // 2000 * 0.25
    assert(math.abs(counts("fr") - 1800L) < 100, counts) // 2000 * 0.9
    // deterministic: identical row set on re-run
    val again = ops.TableOps.sampleMixture(df, "id", "lang", Seq("en" -> 0.25), 0.9)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // rate 1.0 keeps everything, rate 0.0 keeps nothing
    assert(ops.TableOps.sampleMixture(df, "id", "lang", Nil, 1.0).count() == 4000)
    assert(ops.TableOps.sampleMixture(df, "id", "lang", Nil, 0.0).count() == 0)
    // a sampled stratum is a SUBSET of a higher-rate sample (nested by
    // construction: same hash, bigger threshold)
    val half = ops.TableOps.sampleMixture(df, "id", "lang", Nil, 0.5)
    val most = ops.TableOps.sampleMixture(df, "id", "lang", Nil, 0.8)
    assert(half.exceptAll(most).isEmpty)
    intercept[IllegalArgumentException](
      ops.TableOps.sampleMixture(df, "id", "lang", Nil, 1.5))
  }

  test("lmPerplexityScore: hand-computed add-one bigram NLL; filter keeps no-evidence docs") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: (a b)x2, (b a)
      (2L, "a b"),     // bigram: (a b)
      (3L, "x")        // no bigram — absent from scores, KEPT by the filter
    ).toDF("doc_id", "text")
    // corpus: C(a b)=3, C(b a)=1; C1(a)=3, C1(b)=1; V={a,b,x}=3
    // P(a b)=(3+1)/(3+3)=2/3, P(b a)=(1+1)/(1+3)=1/2
    val out = ops.QualityOps.lmPerplexityScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 3 && out(1L)._2 == r6((2 * -math.log(2.0 / 3) - math.log(0.5)) / 3))
    assert(out(2L)._1 == 1 && out(2L)._2 == r6(-math.log(2.0 / 3)))
    val kept = ops.QualityOps.dropHighPerplexity(docs, "doc_id", "text", maxNll = 0.45)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L)) // doc1 filtered; doc3 has no evidence → kept
  }

  test("url extraction + domain blocklist") {
    val docs = Seq(
      (1L, "intro https://a.example.org/x?q=1 mid http://b.example.net end"),
      (2L, "no urls at all"),
      (3L, "https://a.example.org plain and https://sub.b.example.net/deep/path")
    ).toDF("doc_id", "text")
    val doms = docs.select(col("doc_id"), TextOps.domains(col("text")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(doms(1L) == List("a.example.org", "b.example.net"))
    assert(doms(2L) == Nil)
    assert(doms(3L) == List("a.example.org", "sub.b.example.net"))
    val kept = TextOps.dropBlockedDomains(docs, "text", Seq("b.example.net"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L)) // exact host match: subdomain survives
  }

  test("langid + quality + fingerprint are deterministic and sane") {
    val docs = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze und der vogel")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), TextOps.langId(col("text")).as("lang"),
      TextOps.qualityScore(col("text")).as("q"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "en" && out(1).getString(1) == "de")
    assert(out(0).getDouble(2) > 0 && out(0).getDouble(2) <= 1.0)
    // fingerprint stable across evaluation
    val fp2 = docs.select(TextOps.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fp2.toSeq == out.map(_.getLong(3)).toSeq)
  }
}
