package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

import graft.ingest.Tables
import graft.ops.{Dedup, DecodedImage, MediaAsset, Multimodal, Similarity,
  Sketches}
import graft.serve.Serve

/** Unit coverage for serving, dedup, similarity and multimodal plumbing. */
class OpsSpec extends TestBase {

  private lazy val counts =
    graft.agg.Windows.tumblingCounts(Tables.events(spark, sf("sf0.001")))

  test("serve: range scan bounds are [start, end) (OP-37)") {
    import spark.implicits._
    val all = counts.select("window_end").as[Long].collect().sorted
    val (s, e) = (all(1), all(all.length - 2))
    val got = Serve.rangeScan(counts, s, e)
      .select("window_end").as[Long].collect()
    assert(got.head == s && got.last < e && got.sameElements(got.sorted))
  }

  test("serve: recent-N returns newest N (OP-41)") {
    import spark.implicits._
    val all = counts.select("window_end").as[Long].collect().sorted
    val got = Serve.recent(counts, 5).select("window_end").as[Long].collect()
    assert(got.toSeq == all.takeRight(5).reverse.toSeq)
  }

  test("serve: summary totals match direct aggregation (OP-36)") {
    import spark.implicits._
    val row = Serve.summary(counts).collect()(0)
    val n = counts.count()
    val total = counts.agg(sum("cnt")).as[Long].collect()(0)
    assert(row.getAs[Long]("window_count") == n)
    assert(row.getAs[Long]("total_tweets") == total)
    assert(row.getAs[Long]("duration_seconds") ==
      row.getAs[Long]("max_window_end") - row.getAs[Long]("min_window_end"))
  }

  test("dedup: exact finds planted duplicates") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(docs).orderBy("keeper_id")
      .select("keeper_id", "dup_count").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (3L, 1L)))
  }

  test("dedup: minhash est_jaccard high for near-identical docs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "X" else s"w$i")
      .mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, "totally different words here now"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashLsh(docs)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.exists { case (a, b, j) => a == 1L && b == 2L && j > 0.5 })
    assert(!got.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("dedup: wide simhash finds a planted near-dup, skips unrelated") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "X" else s"w$i")
      .mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup),
      (3L, (1 to 60).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.simhashPairsWide(docs, maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    graft.ops.Reuse.freeAll(spark)
    assert(got.contains((1L, 2L)))
    assert(!got.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("dedup: short docs (<n tokens) yield zero shingles, not a crash") {
    import spark.implicits._
    // 0/1/2-token docs under trigram shingling: sequence(1, size-2) would
    // be the DESCENDING [1,0] without the guard and throw under ANSI slice.
    val docs = Seq((1L, ""), (2L, "one"), (3L, "two tokens"),
      (4L, "now three tokens"), (5L, "a b c d"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleHashes(docs, "doc_id", "text")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(!sh.contains(1L) && !sh.contains(2L) && !sh.contains(3L))
    assert(sh(4L) == 1L && sh(5L) == 2L)
    // the whole jaccard pipeline survives short docs
    assert(Dedup.ngramJaccard(docs).count() == 0)
  }

  test("dedup: shingles per doc are capped at MaxShinglesPerDoc") {
    import spark.implicits._
    val long = (1 to Dedup.MaxShinglesPerDoc + 100)
      .map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, long)).toDF("doc_id", "text")
    val n = Dedup.shingleHashes(docs, "doc_id", "text").count()
    assert(n == Dedup.MaxShinglesPerDoc,
      s"expected cap ${Dedup.MaxShinglesPerDoc}, got $n")
  }

  test("dedup: benchmarkOverlap flags a benchmark copy, not fresh text") {
    import spark.implicits._
    val benchText = (1 to 30).map(i => s"b$i").mkString(" ")
    val bench = Seq((1L, benchText)).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, benchText),                                   // exact leak
      (11L, (1 to 30).map(i => s"c$i").mkString(" ")),    // clean
      (12L, "too short"),                                 // 0 shingles
      // half its trigrams come from the benchmark text
      (13L, ((1 to 16).map(i => s"b$i") ++
        (1 to 14).map(i => s"d$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.benchmarkOverlap(corpus, bench)
      .select("doc_id", "n_sh", "n_shared", "contaminated")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(10L) == ((10L, 28L, 28L, 1L))) // full overlap → flagged
    assert(got(11L)._3 == 0L && got(11L)._4 == 0L)
    assert(got(12L) == ((12L, 0L, 0L, 0L)))   // no shingles, frac 0
    // doc 13: 28 shingles, b-prefix contributes 14 shared → 0.5 < 0.8
    assert(got(13L)._3 == 14L && got(13L)._4 == 0L)
  }

  test("sketches: bloom decontamination — no false negatives, exact " +
      "card arithmetic, measured fpr on the real corpus (ext102)") {
    import spark.implicits._
    // Planted fixture: a full benchmark copy, a clean doc, a half-leak.
    val benchText = (1 to 30).map(i => s"b$i").mkString(" ")
    val bench = Seq((1L, benchText)).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, benchText),
      (11L, (1 to 30).map(i => s"c$i").mkString(" ")),
      (13L, ((1 to 16).map(i => s"b$i") ++
        (1 to 14).map(i => s"d$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val card = Sketches.bloomContaminationAudit(corpus, bench)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    val (nDocs, fExact, fBloom, fPos, probes, nonmem, fp, bitsSet, fppm) =
      card
    assert(nDocs == 3L && fExact == 1L) // only the full copy flags exact
    // structural one-sidedness: bloom flags ⊇ exact flags
    assert(fBloom >= fExact && fPos == fBloom - fExact)
    assert(probes == 28L + 28L + 28L && nonmem == probes - 28L - 14L)
    assert(fp >= 0L && fp <= nonmem)
    assert(fppm == (if (nonmem == 0) 0L else fp * 1000000L / nonmem))
    // ≤ k positions per member key, deduped
    assert(bitsSet > 0L && bitsSet <= 28L * Sketches.BloomK)
    // Member probes ALWAYS hit: every benchmark shingle's k positions
    // are set by construction.
    val benchH = Dedup.benchmarkShingles(bench)
    val bits = Sketches.bloomBits(benchH)
      .as[Long].collect().toSet
    val memberPos = benchH.select((0 until Sketches.BloomK).map(j =>
      Sketches.bloomPos(col("h"), j)): _*)
      .collect().flatMap(r => (0 until Sketches.BloomK).map(r.getLong))
    assert(memberPos.forall(bits))
    // Realism: on the sf0.001 documents the audit prices a nonzero
    // probe volume and a sane fpr (deliberately measurable geometry).
    val d = graft.ingest.Tables.documents(spark, sf("sf0.001"))
    val real = Sketches.bloomContaminationAudit(
      d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(real._5 > 0L && real._3 >= real._2)
    assert(real._9 >= 0L && real._9 < 1000000L)
  }

  test("skew: salted join equals the plain join row-for-row (ext114)") {
    import spark.implicits._
    // hot key 1 (8 rows) + singletons; dim has 1:1 keys
    val big = ((1 to 8).map(i => (1L, i.toLong)) ++
      Seq((2L, 100L), (3L, 200L))).toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "unused"))
      .toDF("k", "name")
    val got = graft.ops.Skew.saltedJoin(big, small, "k", col("v"), 4)
      .select("k", "v", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val plain = big.join(small, "k")
      .select("k", "v", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(got == plain && got.size == 10)
    // every big row appears exactly once (no replica double-match)
    assert(got.map(r => (r._1, r._2)).distinct.size == 10)
  }

  test("skew: measured salt count tracks the hot key's skew factor and " +
      "spreads it evenly; auto join equals the plain join (r8 item 5)") {
    import spark.implicits._
    // 90%-hot-key frame: key 1 carries 90 of 100 rows over 11 keys →
    // skew factor ceil(90 * 11 / 100) = 10
    val big = ((1 to 90).map(i => (1L, i.toLong)) ++
      (2 to 11).map(k => (k.toLong, 1000L + k))).toDF("k", "v")
    val salts = graft.ops.Skew.measuredNumSalts(big, "k")
    assert(salts == 10)
    // a uniform frame needs no replication at all
    val uniform = (1 to 50).map(i => (i.toLong, i.toLong)).toDF("k", "v")
    assert(graft.ops.Skew.measuredNumSalts(uniform, "k") == 1)
    // the cap clamps runaway skew; empty input is a no-op
    assert(graft.ops.Skew.measuredNumSalts(big, "k", maxSalts = 4) == 4)
    assert(graft.ops.Skew.measuredNumSalts(
      big.filter(col("k") < 0), "k") == 1)
    // the hot key's rows actually spread: with 10 salts over a
    // high-cardinality discriminator no reducer holds more than ~2x
    // the even share (90/10 = 9)
    val spread = big.filter(col("k") === 1L)
      .groupBy(pmod(hash(col("v")), lit(salts)).as("salt"))
      .agg(count(lit(1)).as("c"))
      .agg(max("c"), countDistinct("salt")).as[(Long, Long)].head()
    assert(spread._1 <= 18L && spread._2 >= 5L, spread.toString)
    // end to end: auto-salted join == plain join
    val small = (1 to 11).map(k => (k.toLong, s"n$k")).toDF("k", "name")
    val auto = graft.ops.Skew.saltedJoinAuto(big, small, "k", col("v"))
      .select("k", "v", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val plain = big.join(small, "k")
      .select("k", "v", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(auto == plain && auto.size == 100)
  }

  test("similarity: kmeans-IVF results stay inside the query's bucket") {
    import spark.implicits._
    // Two well-separated clusters of 4 vectors each, INTERLEAVED by id
    // (seeds are the k lowest vec_ids — ids 0 and 1 must span the
    // clusters or Lloyd's cannot separate them); k=2, so k-means must
    // recover them and IVF search must never cross clusters.
    def v(base: Float, j: Int) = Array(base + j * 0.01f, base - j * 0.01f)
    val emb = ((0 until 4).map(j => (2L * j, v(1.0f, j))) ++
      (0 until 4).map(j => (2L * j + 1, v(-1.0f, j))))
      .toDF("vec_id", "embedding")
    val withBucket = emb.join(Similarity.kmeansBuckets(emb, k = 2, iters = 2),
      "vec_id")
    val buckets = withBucket.select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    assert(buckets.filterKeys(_ % 2 == 0).values.toSet.size == 1)
    assert(buckets.filterKeys(_ % 2 == 1).values.toSet.size == 1)
    assert(buckets(0L) != buckets(1L), "clusters collapsed into one bucket")
    val res = Similarity.ivfTopK(withBucket, withBucket, 2, bucket = "bucket")
      .select("q_id", "t_id").as[(Long, Long)].collect()
    assert(res.nonEmpty)
    assert(res.forall { case (q, t) => buckets(q) == buckets(t) },
      "IVF returned a candidate outside the query's bucket")
  }

  test("dedup: keepRepresentatives drops the larger id of each pair") {
    import spark.implicits._
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "z"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 4L)).toDF("id_a", "id_b")
    val kept = Dedup.keepRepresentatives(docs, pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }

  test("ingest: typed Dataset[TweetEvent] surface compiles and reads") {
    import spark.implicits._
    val lines = Seq(
      """{"id":7,"text":"hi #a","timestamp_ms":"1704067200000","entities":{"hashtags":[{"text":"a"}],"user_mentions":[]},"user":{"followers_count":3,"screen_name":"u"},"retweeted_status":null}""")
    val ds = Tables.tweetEvents(
      Tables.tweetsFromJsonLines(lines.toDF("value")))
    val ev = ds.collect().head
    assert(ev.id == 7 && ev.hashtags == Seq("a") && ev.followerCount == 3)
  }

  test("skew: salted two-phase aggregate equals plain groupBy") {
    import spark.implicits._
    // 90% of rows on one hot key
    val rows = (0 until 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong, i * 0.5))
    val df = rows.toDF("key", "rid", "w")
    val salted = graft.ops.Skew
      .saltedCountSum(df, col("key"), col("w"), col("rid"))
      .orderBy("key")
      .as[(String, Long, Double)].collect().toSeq
    val plain = df.groupBy("key")
      .agg(count("*").as("cnt"),
        sum(col("w").cast("decimal(18,6)")).cast("double").as("ws"))
      .orderBy("key").as[(String, Long, Double)].collect().toSeq
    assert(salted == plain)
  }

  test("dedup: simhash hamming 0 for identical docs") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "unrelated content entirely different")).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(docs)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got.contains((1L, 2L, 0L)))
  }

  test("similarity: self-similarity rank-1 when query kept in corpus") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.99f, 0.1f, 0f)),
      (3L, Array(0f, 1f, 0f)), (4L, Array(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.bruteTopK(vecs, vecs.filter($"vec_id" === 1), 2)
      .orderBy("rank").select("t_id", "rank").as[(Long, Long)]
      .collect().toSeq
    // nearest to (1,0,0) is (0.99,0.1,0); orthogonal vectors tie at
    // cos 0 and the id tie-break picks 3
    assert(got == Seq((2L, 1L), (3L, 2L)))
  }

  /** In-memory PNG fixture: a w×h image split vertically — left half
    * one solid color, right half another — encoded with the JDK. */
  private def pngBytes(w: Int, h: Int, left: Int, right: Int):
      Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y, if (x * 2 >= w) right else left)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    out.toByteArray
  }

  test("multimodal: ImageIO decoder reads REAL PNG bytes — dimensions, " +
      "channels, pixel-derived features; corrupt bytes drop") {
    import spark.implicits._
    implicit val s = spark
    val red = 0xff0000; val blue = 0x0000ff; val white = 0xffffff
    val assets = Seq(
      MediaAsset(1L, "image", pngBytes(20, 10, red, blue), "image/png"),
      MediaAsset(2L, "image", pngBytes(8, 8, white, white), "image/png"),
      MediaAsset(3L, "image", "not an image".getBytes("UTF-8"),
        "image/png")).toDS()
    val got = Multimodal.decodeImages(assets).collect()
      .sortBy(_.asset_id)
    // corrupt asset 3 dropped, real PNGs decoded with true dimensions
    assert(got.map(_.asset_id).toSeq == Seq(1L, 2L))
    val a1 = got(0); val a2 = got(1)
    assert(a1.width == 20 && a1.height == 10 && a1.channels == 3)
    assert(a2.width == 8 && a2.height == 8)
    def close(x: Float, want: Double) = math.abs(x - want) < 1e-3
    // asset 1 = half pure red, half pure blue: mean R = mean B = 0.5,
    // mean G = 0 — a pixel checksum only a real decode can produce
    assert(close(a1.feature(0), 0.5) && close(a1.feature(1), 0.0) &&
      close(a1.feature(2), 0.5))
    // quadrant lumas: left quadrants pure red (0.299), right pure blue
    // (0.114); brightness fraction 0 (both lumas < 0.5)
    assert(close(a1.feature(3), 0.299) && close(a1.feature(4), 0.114) &&
      close(a1.feature(5), 0.299) && close(a1.feature(6), 0.114) &&
      close(a1.feature(7), 0.0))
    // asset 2 all white: every mean 1.0, all pixels bright
    assert(a2.feature.forall(f => close(f, 1.0)))
    // deterministic across runs
    val again = Multimodal.decodeImages(assets).collect()
      .sortBy(_.asset_id)
    assert(got.zip(again).forall { case (x, y) =>
      x.width == y.width && x.feature.sameElements(y.feature) })
  }

  test("multimodal -> dedup composition: decoded image features feed " +
      "embedding near-dup; the duplicated image is found, the distinct " +
      "one is not") {
    import spark.implicits._
    implicit val s = spark
    val red = 0xff0000; val blue = 0x0000ff; val green = 0x00ff00
    val assets = Seq(
      MediaAsset(1L, "image", pngBytes(20, 10, red, blue), "image/png"),
      MediaAsset(2L, "image", pngBytes(20, 10, red, blue), "image/png"),
      MediaAsset(3L, "image", pngBytes(20, 10, green, green), "image/png")
    ).toDS()
    // the cross-modal pipeline: real decode -> pooled feature as the
    // embedding column -> the ext16 banded near-dup detector unchanged
    val emb = Multimodal.decodeImages(assets)
      .select(col("asset_id").as("vec_id"), col("feature").as("embedding"))
    val pairs = Similarity.cosineNearDupPairs(emb)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the duplicated image pair, got $pairs")
    graft.ops.Reuse.freeAll(spark)
  }

  test("multimodal: a real codec drops into the decoder seam without " +
      "plan changes (injected fake; batch shape and schema survive)") {
    import spark.implicits._
    implicit val s = spark
    val assets = Multimodal.assetsFromDocuments(
      Tables.documents(spark, sf("sf0.001")).limit(20))
      .repartition(4).as[MediaAsset]
    // A "real" codec stand-in that also proves the kernel is BATCHED:
    // it observes each partition's iterator exactly once and stamps
    // every row with its batch's size (iterator-in/iterator-out — a
    // per-row seam could not know it).
    val fake = new Multimodal.ImageDecoder {
      def decodeBatch(batch: Iterator[MediaAsset]) = {
        val rows = batch.toVector
        rows.iterator.map(a =>
          DecodedImage(a.asset_id, 640, 480, rows.size, Array(1f)))
      }
    }
    val dflt = Multimodal.decodeImages(assets) // ImageIO default
    val real = Multimodal.decodeImages(assets, fake)
    // schema fixed by the seam, not the decoder
    assert(real.schema == dflt.schema)
    // plan shape identical: swap the kernel, keep the physical plan
    def shape(d: org.apache.spark.sql.Dataset[_]) =
      d.queryExecution.executedPlan.treeString
        .replaceAll("#\\d+", "#n").replaceAll("@[0-9a-f]+", "@x")
        .replaceAll("plan_id=\\d+", "plan_id=n")
    assert(shape(real) == shape(dflt))
    val got = real.collect()
    assert(got.length == 20 && got.forall(_.width == 640))
    // channels carries the observed batch size: rows stamped with batch
    // size sz must come in whole batches of sz => one iterator per
    // partition, not per row (a per-row kernel would stamp 1 everywhere
    // while 20 rows over 4 partitions make batches of ~5)
    assert(got.forall(_.channels > 1))
    got.groupBy(_.channels).foreach { case (sz, g) =>
      assert(g.size % sz == 0, s"partial batch of size $sz: ${g.size} rows")
    }
  }

  test("multimodal: frame sampling emits ceil(n/stride) frames per asset") {
    import spark.implicits._
    val assets = Multimodal.assetsFromDocuments(
      Tables.documents(spark, sf("sf0.001")).limit(5))
    val got = Multimodal.sampleFrames(assets, 16, 8)
      .groupBy("asset_id").agg(count("*").as("frames"))
    val want = assets
      .select(col("asset_id"),
        (expr("(length(bytes) - 1) div 16") + 1).as("want"))
    assert(got.join(want, "asset_id")
      .filter(col("frames") =!= col("want")).count() == 0)
  }

  private def gifBytes(colors: Seq[Int], w: Int = 4, h: Int = 4)
      : Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = im.createGraphics()
      g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, w, h)
      g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(im, null, null),
        null)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    baos.toByteArray
  }

  test("multimodal: animated-GIF frames decode for REAL through the " +
      "ImageIO seam; undecodable bytes take the byte-window fallback " +
      "(r8 item 2)") {
    import spark.implicits._
    implicit val s = spark
    val textBytes = ("x" * 40).getBytes("UTF-8")
    val assets = Seq(
      MediaAsset(1L, "video", gifBytes(Seq(0x000000, 0xffffff)),
        "image/gif"),
      MediaAsset(2L, "video", textBytes, "video/mp4")).toDS()
    val got = Multimodal.sampleFramesDecoded(assets).collect()
      .sortBy(f => (f.asset_id, f.frame_no))
    // asset 1: TWO real frames with true dimensions and pixel-derived
    // features (all-black then all-white — only a real decode knows)
    val frames = got.filter(_.asset_id == 1L)
    assert(frames.length == 2 && frames.forall(f =>
      f.decoded && f.width == 4 && f.height == 4))
    def close(x: Float, want: Double) = math.abs(x - want) < 1e-3
    assert(frames(0).feature.forall(f => close(f, 0.0)))
    assert(frames(1).feature.forall(f => close(f, 1.0)))
    // asset 2: no JDK reader — byte-window pseudo-frames, flagged, at
    // sampleFrames' stride arithmetic (ceil(40/16) = 3 windows)
    val fb = got.filter(_.asset_id == 2L)
    assert(fb.length == 3 && fb.forall(f =>
      !f.decoded && f.width == 0 && f.height == 0))
    assert(fb(0).feature.forall(f => close(f, ('x'.toInt & 0xff) / 255.0)))
    // `every` strides over REAL frames: every=2 keeps frame 0 only
    val strided = Multimodal.sampleFramesDecoded(assets, every = 2)
      .filter(col("asset_id") === 1L).collect()
    assert(strided.map(_.frame_no).toSeq == Seq(0L))
    // sample-AWARE decode (r9 item 3): every=2 on a 4-frame animation
    // reads exactly frames {0, 2} through the seam — decode work is
    // bounded by frames READ, not frames stored — and the output is
    // identical to filtering the decode-all path
    val four = Seq(MediaAsset(4L, "video",
      gifBytes(Seq(0x000000, 0x404040, 0x808080, 0xffffff)),
      "image/gif")).toDS()
    val readIdx = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Int]())
    Multimodal.GifFrameDecoder.decodeProbe = Some(i => readIdx.add(i))
    val sampled =
      try Multimodal.sampleFramesDecoded(four, every = 2)
        .collect().sortBy(_.frame_no)
      finally Multimodal.GifFrameDecoder.decodeProbe = None
    assert(sampled.map(_.frame_no).toSeq == Seq(0L, 2L))
    import scala.jdk.CollectionConverters._
    assert(readIdx.asScala.sorted == Seq(0, 2),
      s"expected exactly frame reads {0, 2}, saw ${readIdx.asScala}")
    val allFrames = Multimodal.sampleFramesDecoded(four).collect()
      .sortBy(_.frame_no).filter(_.frame_no % 2 == 0)
    assert(sampled.map(f => (f.frame_no, f.width, f.height, f.decoded,
        f.feature.toSeq)).toSeq ==
      allFrames.map(f => (f.frame_no, f.width, f.height, f.decoded,
        f.feature.toSeq)).toSeq)
    // single-frame PNG bytes decode as a 1-frame container (the seam
    // is format-agnostic: one reader loop, no GIF special-casing)
    val png = Seq(MediaAsset(3L, "image",
      pngBytes(6, 6, 0xffffff, 0xffffff), "image/png")).toDS()
    val pf = Multimodal.sampleFramesDecoded(png).collect()
    assert(pf.length == 1 && pf.head.decoded && pf.head.width == 6)
  }

  test("bloom semi-join: parity law (probe-filtered join == plain " +
      "join, full row set), structural no-false-negatives, ledger " +
      "consistency, empty dim rejects everything (ext168)") {
    import graft.ops.Sketches
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val dim = Tables.orders(spark, sf("sf0.001"))
      .filter(col("o_totalprice") > 400000)
    def joined(fact: org.apache.spark.sql.DataFrame) =
      fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber")
    val plain = joined(li)
    val pruned = joined(Sketches.bloomSemiJoin(li, dim,
      col("l_orderkey"), col("o_orderkey")))
    assert(plain.count() > 0, "fixture is vacuous")
    assert(pruned.exceptAll(plain).isEmpty &&
      plain.exceptAll(pruned).isEmpty,
      "bloom-pruned join differs from the plain join")
    val l = Sketches.bloomSemiJoinLedger(li, dim,
      col("l_orderkey"), col("o_orderkey")).collect().head
    val (factRows, dimKeys, matched, passed, falsePassed, falseNeg) =
      (l.getLong(0), l.getLong(1), l.getLong(2), l.getLong(3),
        l.getLong(4), l.getLong(5))
    assert(falseNeg == 0L, "a member key failed its own bits")
    assert(passed == matched + falsePassed && passed <= factRows)
    assert(l.getAs[Long]("fpr_ppm") >= 0L &&
      l.getAs[Long]("fpr_ppm") < 1000000L)
    assert(l.getAs[Long]("bits_set") <= 3L * dimKeys)
    // empty dim: all-zero bitset rejects every probe
    assert(Sketches.bloomSemiJoin(li, dim.filter(lit(false)),
      col("l_orderkey"), col("o_orderkey")).count() == 0L)
    // the distributed bit-OR fold == the relational bit set, bit for bit
    val (words, bitsSet) = Sketches.dimBitWords(dim,
      col("o_orderkey"), 32768L, 3)
    val relBits = Sketches.bloomBits(dim.select(
        graft.ops.Hashing.portableHash32(
          concat(lit("bsj:"), col("o_orderkey").cast("string"))).as("h")))
      .collect().map(_.getLong(0)).toSet
    assert(bitsSet == relBits.size.toLong)
    assert((0L until 32768L).forall(b =>
      (((words((b / 64).toInt) >> (b % 64).toInt) & 1L) == 1L)
        == relBits.contains(b)),
      "treeAggregate words differ from the relational bit set")
    // mismatched key types break the string-rendering hash parity the
    // no-false-negative law rests on ("5" vs "5.0") — rejected loudly
    // in BOTH entry points, and the ledger hashes the same raw keys
    // as the filter it prices (r14 ADVICE)
    val exJ = intercept[IllegalArgumentException] {
      Sketches.bloomSemiJoin(li, dim, col("l_orderkey"),
        col("o_orderkey").cast("double"))
    }
    assert(exJ.getMessage.contains("SAME data type"))
    val exL = intercept[IllegalArgumentException] {
      Sketches.bloomSemiJoinLedger(li, dim,
        col("l_orderkey").cast("string"), col("o_orderkey"))
    }
    assert(exL.getMessage.contains("SAME data type"))
    // string keys (previously nulled out by the ledger's long cast)
    // now measure the real filter: parity ledger vs filter count
    val lStr = Sketches.bloomSemiJoinLedger(li,
      dim, col("l_orderkey").cast("string"),
      col("o_orderkey").cast("string")).collect().head
    val passStr = Sketches.bloomSemiJoin(li, dim,
      col("l_orderkey").cast("string"),
      col("o_orderkey").cast("string")).count()
    assert(lStr.getAs[Long]("passed") == passStr,
      s"ledger passed ${lStr.getAs[Long]("passed")} != filter $passStr")
    assert(lStr.getAs[Long]("false_neg") == 0L)
    graft.ops.Reuse.freeAll(spark)
  }

  test("bm25 stored index: a term-partitioned store prunes to the " +
      "query's posting lists and serves the identical ranking " +
      "(ext165 serving claim)") {
    import graft.ops.TextOps
    val docs = Tables.documents(spark, sf("sf0.001"))
    val store = java.nio.file.Files
      .createTempDirectory("graft-bm25idx").toString + "/index"
    TextOps.bm25IndexPartials(docs)
      .write.partitionBy("term").parquet(store)
    val terms = Seq("spark", "window", "join")
    val served = TextOps.bm25FromIndex(
      spark.read.parquet(store), terms)
    val direct = TextOps.bm25TopK(docs, terms)
    assert(served.collect().toSeq == direct.collect().toSeq &&
      direct.count() > 0,
      "partitioned-store serve differs from the text scan")
    // the hits scan carries the term filter as a PARTITION filter —
    // layout pruning, not a post-scan predicate
    val plan = spark.read.parquet(store)
      .filter(col("term").isin(terms: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [term"),
      s"term filter did not reach partition pruning:\n$plan")
    graft.ops.Reuse.freeAll(spark)
  }

  test("hybrid retrieval from stores: BOTH legs served from persisted " +
      "artifacts (IVF-PQ triple + posting index round-tripped through " +
      "parquet) == the recompute form, and the lexical leg never " +
      "touches corpus text (r14 verdict item 2)") {
    val S = graft.ops.Similarity
    import graft.ops.TextOps
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val docs = Tables.documents(spark, sf("sf0.001"))
    val qIds = (0L until 8L).toSeq
    // build-once artifacts, persisted the way a serving node stores them
    val cents = S.kmeansCentroids(emb)
    val cb = S.pqCodebooks(emb).localCheckpoint(true)
    val coded = S.ivfPqCodedCorpus(emb, cb,
      S.kmeansProbeBuckets(emb, probes = 1)
        .filter(col("probe_rank") === 1).select("vec_id", "bucket"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-hybrid").toString
    cents.write.parquet(s"$root/cents")
    cb.write.parquet(s"$root/cb")
    coded.write.parquet(s"$root/coded")
    TextOps.bm25IndexPartials(docs).write.parquet(s"$root/index")
    val served = S.hybridFromStores(qIds,
      spark.read.parquet(s"$root/cents"),
      spark.read.parquet(s"$root/cb"),
      spark.read.parquet(s"$root/coded"),
      emb, spark.read.parquet(s"$root/index"))
    // the recompute form: same algorithm over the in-session artifacts
    val queries = emb.filter(col("vec_id").isin(qIds: _*))
    val expect = S.rrfFuse(Seq(
      S.ivfPqSearch(queries, cents, cb, coded, emb, 10),
      TextOps.bm25PerQuery(docs,
        docs.filter(col("doc_id").isin(qIds: _*)), 10)), 5)
    assert(expect.count() > 0, "fixture is vacuous")
    assert(served.except(expect).isEmpty && expect.except(served).isEmpty,
      "stored-artifact hybrid differs from the recompute form")
    // serve-path claim: the lexical leg's plan reads ONLY the posting
    // store — corpus text is never rescanned
    graft.ops.Reuse.freeAll(spark)
    val lexPlan = TextOps.bm25PerQueryFromIndex(
        spark.read.parquet(s"$root/index"), qIds)
      .queryExecution.executedPlan.toString
    assert(!lexPlan.contains("documents"),
      s"lexical serve leg rescans corpus text:\n$lexPlan")
    graft.ops.Reuse.freeAll(spark)
  }

  test("blockHash60 kernel: hand-computed bits, tie -> 0, empty -> 0, " +
      "codegen path == kernel (ext164)") {
    import graft.functions.{BlockHash60, BlockHashImpl}
    // [1,2,3,4]: byte i lands in block i*60/4 = {0,15,30,45}; total 10,
    // n 4 — bit set iff v*4 > 10, i.e. v=3 (blk 30) and v=4 (blk 45).
    assert(BlockHashImpl.blockHash60(Array[Byte](1, 2, 3, 4)) ==
      ((1L << 30) | (1L << 45)))
    // every 2-byte block {0, 200}: block mean == global mean — the
    // STRICT compare leaves every bit 0
    val tie = Array.tabulate[Byte](120)(i =>
      if (i % 2 == 0) 0 else 200.toByte)
    assert(BlockHashImpl.blockHash60(tie) == 0L)
    // first half 10s, second half 200s: exactly bits 30..59
    val step = Array.tabulate[Byte](120)(i =>
      if (i < 60) 10 else 200.toByte)
    assert(BlockHashImpl.blockHash60(step) == (((1L << 30) - 1) << 30))
    assert(BlockHashImpl.blockHash60(Array.empty[Byte]) == 0L)
    // DataFrame/codegen path agrees with the direct kernel call
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3, 4)), (2L, tie), (3L, step))
      .toDF("asset_id", "bytes")
    val got = df.select(col("asset_id"), BlockHash60(col("bytes")))
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got == Seq((1L << 30) | (1L << 45), 0L, ((1L << 30) - 1) << 30))
  }

  test("phash recall audit: pigeonhole-bucketed candidates == exact " +
      "all-pairs Hamming, non-vacuous on the real corpus (ext164)") {
    val assets = Multimodal.assetsFromDocuments(
      Tables.documents(spark, sf("sf0.01")))
    val h = Multimodal.phashBytes(assets)
    def brute(maxHam: Int) = h.toDF("id_a", "ph_a")
      .join(h.toDF("id_b", "ph_b"), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHam)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    def bucketed(maxHam: Int, nChunks: Int) =
      Multimodal.phashPairs(assets, maxHam, nChunks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
    // the synthetic-bytes radius (the ext164 query's configuration)
    val wide = bucketed(11, 12)
    assert(wide == brute(11), "12x5-bit bucketing lost a pair <= 11")
    assert(wide.nonEmpty, "audit is vacuous — no near-dup pairs at all")
    // the image-radius production form
    assert(bucketed(3, 4) == brute(3))
    // losslessness precondition is enforced, not assumed
    intercept[IllegalArgumentException] {
      Multimodal.phashPairs(assets, maxHamming = 4, nChunks = 4) }
    intercept[IllegalArgumentException] {
      Multimodal.phashPairs(assets, maxHamming = 3, nChunks = 7) }
    // ext171 ledger consistency: survivors == the pair relation's
    // count at the same regime, candidate volume bounds respected
    val led = Multimodal.phashCandidateLedger(assets).collect().head
    assert(led.getAs[Long]("survivors") == brute(3).size.toLong,
      "ledger survivors != radius-3 pair count")
    assert(led.getAs[Long]("cand_pairs") <= led.getAs[Long]("join_rows"),
      "distinct candidates exceed join volume")
    assert(led.getAs[Long]("cand_pairs") >= led.getAs[Long]("survivors"))
    assert(led.getAs[Long]("n_assets") > 0 &&
      led.getAs[Long]("max_bucket") <= led.getAs[Long]("n_assets"))
    graft.ops.Reuse.freeAll(spark)
  }

  test("phash over REAL pixels: near-identical PNGs land within a few " +
      "bits, the inverted image scatters, undecodable bytes take the " +
      "byte fallback (ext164)") {
    import spark.implicits._
    implicit val s = spark
    def grayPng(w: Int, h: Int, mut: java.awt.image.BufferedImage => Unit)
        : Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (x * 255) / (w - 1)
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      mut(im)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", out)
      out.toByteArray
    }
    val base = grayPng(40, 24, _ => ())
    val nearDup = grayPng(40, 24, im => { // 3 perturbed pixels
      im.setRGB(0, 0, 0xffffff); im.setRGB(39, 23, 0)
      im.setRGB(20, 12, 0x808080) })
    val inverted = grayPng(40, 24, im =>
      for (y <- 0 until 24; x <- 0 until 40)
        im.setRGB(x, y, ~im.getRGB(x, y) & 0xffffff))
    val assets = Seq(
      MediaAsset(1L, "image", base, "image/png"),
      MediaAsset(2L, "image", nearDup, "image/png"),
      MediaAsset(3L, "image", inverted, "image/png"),
      MediaAsset(4L, "audio", "just text bytes".getBytes("UTF-8"),
        "application/octet-stream")).toDS()
    val got = Multimodal.phashImages(assets).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L)._2 && got(2L)._2 && got(3L)._2 && !got(4L)._2)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(got(1L)._1, got(2L)._1) <= 3,
      s"near-identical images at hamming ${ham(got(1L)._1, got(2L)._1)}")
    assert(ham(got(1L)._1, got(3L)._1) > 30,
      s"inverted image only at hamming ${ham(got(1L)._1, got(3L)._1)}")
    // the undecodable row's fallback IS the byte blockhash
    assert(got(4L)._1 == graft.functions.BlockHashImpl.blockHash60(
      "just text bytes".getBytes("UTF-8")))
  }

  test("repetition metrics flag repeated text, pass diverse text (ext29)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam"),   // one 2-gram repeated 4x
      (2L, "a b c d e"),                  // all distinct
      (3L, "x")                           // too short for 2-grams
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.repetition(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got(0) == ((1L, 4L, 1L, 0.75, 1.0)))  // 4 grams, 1 distinct
    assert(got(1) == ((2L, 4L, 4L, 0.0, 0.2)))   // no repetition
    assert(got(2) == ((3L, 0L, 0L, 0.0, 1.0)))   // defined on short docs
  }

  test("connected components: chains close transitively, clusters stay " +
      "separate (ext27)") {
    import spark.implicits._
    // 1-2-3-4 is one chain (diameter 3: forces >1 propagation round),
    // 10-11 a second cluster, 20-21/21-22 a triangle-free vee.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L)).toDF("id_a", "id_b")
    val got = graft.ops.Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components refine keepRepresentatives: one keeper per " +
      "cluster survives") {
    import spark.implicits._
    val docs = (1L to 30L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = graft.ops.Components.connectedComponents(pairs)
    // cluster-exact kept corpus: every doc not in a pair graph, plus the
    // min-id representative of each cluster
    val dropExact = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    val keptExact = docs.join(dropExact, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(keptExact == ((1L to 30L).toSet -- Set(2L, 3L, 11L)))
  }

  test("tfidf: rare terms outrank common ones; scores exact (ext38)") {
    import spark.implicits._
    val docs = Seq((1L, "apple banana banana"), (2L, "apple cherry"),
      (3L, "apple date")).toDF("doc_id", "text")
    val got = graft.ops.TextOps.tfidfTopK(docs, 2)
      .select("doc_id", "term", "tf", "score", "rank")
      .as[(Long, String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5).toSeq).toMap
    // N=3; df(apple)=3 -> idf_q 1_000_000; df(banana)=1 -> 3_000_000.
    assert(got(1L) == Seq((1L, "banana", 2L, 6000000L, 1L),
      (1L, "apple", 1L, 1000000L, 2L)))
    assert(got(2L).head._2 == "cherry") // rarer term first in doc 2
    graft.ops.Reuse.freeAll(spark)
  }

  test("weighted sample ranks by hash/weight within stratum (ext39)") {
    import spark.implicits._
    val docs = (1L to 20L)
      .map(i => (i, "g", 1L + (i % 7) * 100L)).toDF("doc_id", "g", "w")
    val got = graft.ops.Sampling
      .weightedTopK(docs, Seq("g"), col("doc_id"), col("w"), 5)
      .select("doc_id").as[Long].collect().toSeq
    val want = (1L to 20L)
      .sortBy(i => (graft.ops.Hashing.portableHash32Local(s"wsamp:$i")
        .toDouble / (1L + (i % 7) * 100L), i))
      .take(5)
    assert(got == want) // rank order == driver-recomputed priority order
  }

  test("inverted index: exact df with bounded ascending postings (ext40)") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "b"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.invertedIndex(docs, 2).orderBy("term")
      .as[(String, Long, String)].collect().toSeq
    // df counts ALL docs (b=3) while postings cap at k=2, ascending.
    assert(got == Seq(("a", 1L, "1"), ("b", 3L, "1,2"), ("c", 1L, "2")))
  }

  test("bigram stats: pair counts and quantized conditionals (ext41)") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "z"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.bigramStats(docs, 10)
      .as[(String, String, Long, Long)].collect().toSeq
    // prefix totals: a->3 (ab,ab,ac), b->1 (ba); "z" yields no bigram.
    assert(got == Seq(
      ("a", "b", 2L, 666666L),   // floor(1e6 * 2/3)
      ("a", "c", 1L, 333333L),
      ("b", "a", 1L, 1000000L)))
    graft.ops.Reuse.freeAll(spark)
  }

  test("lm quality: bigram counts, zero-bigram docs, flags (ext42)") {
    import spark.implicits._
    // LM from all docs: every prefix here has a single continuation, so
    // all seen pairs score 1e6; doc 4 has no bigram at all.
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x y z"), (4L, "q"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.lmQuality(docs, threshold = 500000L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1000000L, 1L),   // ab, ba, ab
      (2L, 1L, 1000000L, 1L),
      (3L, 2L, 1000000L, 1L),   // xy, yz
      (4L, 0L, 0L, 0L)))        // single token: no bigram, not fluent
    graft.ops.Reuse.freeAll(spark)
  }

  test("lm quality: mixed continuations quantize exactly (ext42)") {
    import spark.implicits._
    // a continues to b twice and to c once: p(b|a)=2/3, p(c|a)=1/3.
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = graft.ops.TextOps.lmQuality(docs, threshold = 500000L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 666666L, 1L), (2L, 1L, 666666L, 1L), (3L, 1L, 333333L, 0L)))
    graft.ops.Reuse.freeAll(spark)
  }

  test("driver contract: entry returns rows; every query has oracle SQL " +
    "or a declared rows-only check") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
    // Column-name contract: oracle keys must be declared queries.
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracle SQL without a query: $undeclared")
  }

  test("driver contract: no oracle-checked query returns a top-level " +
    "complex column (the comparator can only sort/hash scalars)") {
    // The driver's pandas comparator crashes on array cells (r4: ext43,
    // ext50) — array/map/struct outputs must be joined to strings or
    // exploded to scalar rows before registration.
    val dir = sf("sf0.001")
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      SparkEntry.queries(name)(spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"comparator-unsafe output columns: ${offenders.mkString(", ")}")
    graft.ops.Reuse.freeAll(spark)
  }

  test("chunking: spans, overlap, short tail, boundary cases (ext53)") {
    import spark.implicits._
    def doc(id: Long, n: Int) = (id, (1 to n).map(i => s"t$i").mkString(" "))
    // 100 tokens -> 4 chunks; 33 -> 2 (one past boundary); 32 -> 1
    // (exact boundary); 5 -> 1 (short doc).
    val docs = Seq(doc(1, 100), doc(2, 33), doc(3, 32), doc(4, 5))
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.chunkWithOverlap(docs, 32, 8)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "tok_start", "tok_end", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    val spans = got.map(r => (r._1, r._2, r._3, r._4))
    assert(spans == Seq(
      (1L, 0L, 1L, 32L), (1L, 1L, 25L, 56L), (1L, 2L, 49L, 80L),
      (1L, 3L, 73L, 100L),
      (2L, 0L, 1L, 32L), (2L, 1L, 25L, 33L),
      (3L, 0L, 1L, 32L),
      (4L, 0L, 1L, 5L)))
    // Consecutive chunks share exactly `overlap` tokens; every token of
    // every doc is covered.
    spans.groupBy(_._1).values.foreach { g =>
      g.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, _, e1), (_, _, s2, _)) => assert(e1 - s2 + 1 >= 8)
        case _ => ()
      }
      assert(g.map(_._3).min == 1L)
    }
    assert(spans.filter(_._1 == 1L).flatMap(s => s._3 to s._4).toSet ==
      (1L to 100L).toSet)
    // chunk_text is exactly the token slice.
    assert(got.find(r => r._1 == 1L && r._2 == 3L).get._5 ==
      (73 to 100).map(i => s"t$i").mkString(" "))
    assert(got.find(r => r._1 == 4L).get._5 ==
      (1 to 5).map(i => s"t$i").mkString(" "))
  }

  test("chunking: per-doc cap binds at MaxChunksPerDoc on both engine " +
      "sides (r5 ADVICE — the oracle's range() bound is this constant)") {
    import spark.implicits._
    val cap = graft.ops.TextOps.MaxChunksPerDoc
    // Long enough that the UNCAPPED chunk count (ceil((n-32)/24)+1)
    // would exceed the cap: n = 32 + 24·(cap+5) tokens.
    val n = 32 + 24 * (cap + 5)
    val docs = Seq((1L, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.chunkWithOverlap(docs, 32, 8)
      .orderBy("chunk_id")
      .select("chunk_id", "tok_start", "tok_end")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == cap, s"expected exactly $cap chunks, got ${got.size}")
    assert(got.last._1 == cap - 1L)
    // the truncated tail is dropped, not clamped into the last chunk
    assert(got.last._3 == (cap - 1) * 24 + 32)
    // boilerplate's 16-token chunker inherits the same bound — and the
    // capped tail is REPORTED, not silent (r6 ADVICE): n_toks_dropped
    // counts exactly the tokens past cap·16.
    val bp = graft.ops.TextOps.boilerplateRemoval(docs, chunkTokens = 16)
      .select("n_chunks", "n_toks_dropped").as[(Long, Long)].collect()
    assert(bp.toSeq == Seq((cap.toLong, (n - cap * 16).toLong)))
    // an uncapped doc reports 0 dropped tokens
    val small = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(graft.ops.TextOps.boilerplateRemoval(small, chunkTokens = 16)
      .select("n_toks_dropped").as[Long].collect().toSeq == Seq(0L))
  }

  test("boilerplate removal: repeated spans dropped in every host doc, " +
      "unique spans kept in order, all-boilerplate doc empties (ext59)") {
    import spark.implicits._
    // An 8-token boilerplate span planted in docs 1, 2 and 3 (as its own
    // chunk-aligned span); docs keep their unique tails; doc 3 is ONLY
    // boilerplate; doc 4 shares nothing.
    val bp = (1 to 8).map(i => s"bp$i").mkString(" ")
    def uniq(seed: Int) = (1 to 8).map(i => s"u${seed}x$i").mkString(" ")
    val docs = Seq(
      (1L, s"$bp ${uniq(1)}"),
      (2L, s"$bp ${uniq(2)}"),
      (3L, bp),
      (4L, s"${uniq(4)} ${uniq(40)}"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.boilerplateRemoval(docs, chunkTokens = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 0L, uniq(1)),
      (2L, 2L, 1L, 0L, uniq(2)),
      (3L, 1L, 1L, 0L, ""),
      (4L, 2L, 0L, 0L, s"${uniq(4)} ${uniq(40)}")))
  }

  test("winnowing: shared >= k+w-1 substring shares a fingerprint; " +
      "density < 1; short-doc edges (ext55)") {
    import spark.implicits._
    // Docs 1 and 2 share the 6-token run "p q r s t u" (k+w-1 = 3+4-1=6
    // => the winnowing guarantee applies); doc 3 is disjoint; doc 4 has
    // exactly one trigram; doc 5 has two (m=2 < w: one window over
    // both); doc 6 is below k tokens.
    val docs = Seq(
      (1L, "a b c p q r s t u d e f g h i j"),
      (2L, "x y p q r s t u z w"),
      (3L, "m n o mm nn oo mmm nnn"),
      (4L, "one two three"),
      (5L, "one two three four"),
      (6L, "hi there"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.winnowingFingerprints(docs)
      .as[(Long, Long)].collect().toSeq
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "guaranteed shared fingerprint missing")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
    // Density: doc 1 has 14 trigram positions, w=4 keeps far fewer.
    assert(byDoc(1L).size < 14 && byDoc(1L).size >= 3)
    assert(byDoc(4L).size == 1 && byDoc(5L).size == 1)
    assert(!byDoc.contains(6L))
    // m=2 < w: the single window's fp is the min of both hashes.
    val h5 = docs.filter(col("doc_id") === 5)
      .select(explode(graft.ops.TextOps.shingles(
        graft.ops.TextOps.tokens(col("text")))).as("s"))
      .select(graft.ops.Hashing.portableHash32(col("s")))
      .as[Long].collect()
    assert(byDoc(5L) == Set(h5.min))
  }

  test("leak spans: exact positions of benchmark n-grams (ext50)") {
    import spark.implicits._
    val bench = Seq((1L, "secret eval question here")).toDF("doc_id", "text")
    // Doc 10 embeds the benchmark trigrams "secret eval question" (pos 3)
    // and "eval question here" (pos 4); doc 11 is clean.
    val corpus = Seq(
      (10L, "aa bb secret eval question here cc"),
      (11L, "clean doc with no leaks at all"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.benchmarkLeakSpans(corpus, bench)
      .orderBy("doc_id")
      .as[(Long, Long, Seq[Long])].collect().toSeq
    assert(got == Seq(
      (10L, 2L, Seq(3L, 4L)),
      (11L, 0L, Seq())))
    graft.ops.Reuse.freeAll(spark)
  }

  test("quality keeper: best member survives, not min id (ext47 shape)") {
    import spark.implicits._
    // One 3-member cluster (1-2, 2-3) plus a pair (10-11). Quality rises
    // with n_words, so the longest doc wins regardless of id order.
    val docs = Seq(
      (1L, "the a"), (2L, "the a of and the a of and"), (3L, "the a of"),
      (10L, "the the the the"), (11L, "the"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = graft.ops.Components.connectedComponents(pairs)
    val scored = graft.ops.TextOps.quality(docs)
      .select(col("doc_id"), col("quality_score"))
    val got = clusters.join(scored, clusters("id") === scored("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n"),
        max(struct(col("quality_score").as("q"),
          negate(col("doc_id")).as("nid"))).as("m"))
      .select(col("cluster_id"), negate(col("m.nid")).as("keeper_id"),
        col("n"))
      .as[(Long, Long, Long)].collect().toSet
    // Cluster 1: doc 2 has most words -> highest quality. Cluster 10:
    // doc 10 (4 stopwords) beats doc 11.
    assert(got == Set((1L, 2L, 3L), (10L, 10L, 2L)))
    graft.ops.Reuse.freeAll(spark)
  }

  test("span corruption: sentinels, span merging, invariants (ext46)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h"), (2L, "x"), (3L, "p q r"))
      .toDF("doc_id", "text")
    // Force a deterministic-but-known masking by using den large enough
    // to study invariants rather than a fixed pattern: rate 500/1000.
    val got = graft.ops.TextOps.spanCorruption(docs, rate = 500)
      .orderBy("doc_id")
      .as[(Long, String, String, Long, Long, Long)].collect().toSeq
    got.foreach { case (_, input, target, nTok, nMask, nSpans) =>
      val inToks = input.split(" ").filter(_.nonEmpty)
      val sentinelsIn = inToks.filter(_.startsWith("<X"))
      // One sentinel per span, numbered 0..n-1 in order, same set in
      // input and target; token conservation: unmasked + masked = all.
      assert(sentinelsIn.toSeq ==
        (0 until nSpans.toInt).map(s => s"<X$s>"))
      val tToks = target.split(" ").filter(_.nonEmpty)
      assert(tToks.count(_.startsWith("<X")) == nSpans)
      assert(tToks.length == nSpans + nMask)
      assert(inToks.length == nTok - nMask + nSpans)
      assert(nSpans <= nMask && (nMask == 0L) == (nSpans == 0L))
    }
    // Reconstruction: replacing each sentinel in input by its span
    // tokens from target yields the original text.
    val byId = docs.as[(Long, String)].collect().toMap
    got.foreach { case (id, input, target, _, _, nSpans) =>
      var text = input
      val spans = ("<X(\\d+)>".r.findAllMatchIn(target).toSeq
        .map(_.start) :+ target.length)
      (0 until nSpans.toInt).foreach { s =>
        val seg = target.substring(spans(s), spans(s + 1)).trim
        val toks = seg.split(" ").drop(1).mkString(" ")
        text = text.replace(s"<X$s>", toks)
      }
      assert(text.replaceAll(" +", " ").trim ==
        byId(id).replaceAll(" +", " ").trim, s"doc $id")
    }
    graft.ops.Reuse.freeAll(spark)
  }

  test("random projection: deterministic, dims, sign structure (ext43)") {
    import spark.implicits._
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f, 2.0f)),
      (2L, Seq(1.0f, 0.0f, 2.0f)),     // identical vector
      (3L, Seq(-1.0f, 0.0f, -2.0f)))   // negated vector
      .toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.randomProject(embs, 4)
      .orderBy("vec_id").as[(Long, Seq[Long])].collect().toSeq
    assert(got.forall(_._2.size == 4))
    assert(got(0)._2 == got(1)._2)                  // same input, same proj
    assert(got(2)._2 == got(0)._2.map(-_))          // linear: negation flips
    // Repartitioned input produces the identical projection (plan-time
    // literals, no per-row state).
    val again = graft.ops.Similarity.randomProject(embs.repartition(7), 4)
      .orderBy("vec_id").as[(Long, Seq[Long])].collect().toSeq
    assert(again == got)
  }

  test("oov rate: relative threshold flags the tail type; instances " +
      "counted, ppm floored (ext80)") {
    import spark.implicits._
    // types: a x30, b x30, z x1 -> total 61, thr = 61 DIV 30 = 2, so
    // only z (cnt 1) is rare.
    val docs = Seq(
      (1L, Seq.fill(30)("a").mkString(" ")),
      (2L, (Seq.fill(30)("b") :+ "z").mkString(" "))).toDF("doc_id", "text")
    val got = graft.ops.TextOps.oovRate(docs)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 30L, 0L, 0L),
      (2L, 31L, 1L, 1000000L / 31L)))
    graft.ops.Reuse.freeAll(spark)
    // denom = 1 (below the mean itself): z still rare (thr = 61 DIV 3
    // = 20), a/b at 30 stay common.
    val loose = graft.ops.TextOps.oovRate(docs, denom = 1)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(loose == got)
    graft.ops.Reuse.freeAll(spark)
    // the against-form over a stored rare set matches the batch form
    val rare = graft.ops.TextOps.rareTokens(docs)
    val against = graft.ops.TextOps.oovRateAgainst(docs, rare)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(against == got)
    graft.ops.Reuse.freeAll(spark)
  }

  test("pack efficiency: chunk counts, waste and gain per budget " +
      "(ext78)") {
    import spark.implicits._
    // docs of 5, 7 and 12 tokens
    val docs = Seq((1L, 5L), (2L, 7L), (3L, 12L)).toDF("doc_id", "n")
    val got = graft.ops.Packing
      .packEfficiency(docs, col("n"), Seq(4L, 8L))
      .orderBy("ctx")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // ctx=4: padded = 2+2+3 = 7 chunks (28 slots, 24 toks -> waste
    // 4/28), concat = ceil(24/4) = 6, gain = 1/7
    // ctx=8: padded = 1+1+2 = 4 chunks (32 slots -> waste 8/32),
    // concat = 3, gain = 1/4
    assert(got == Seq(
      (4L, 3L, 24L, 7L, 6L, 4L * 1000000L / 28L, 1000000L / 7L),
      (8L, 3L, 24L, 4L, 3L, 8L * 1000000L / 32L, 1000000L / 4L)))
  }

  test("length bucketing: log2 buckets, per-bucket max, pad-to-bucket " +
      "vs pad-to-global waste hand-checked (ext161)") {
    import spark.implicits._
    // token counts 1, 2, 3, 9: buckets bitlen -> 1:{1}, 2:{2,3}, 4:{9}
    val docs = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"),
      (4L, "a b c d e f g h i")).toDF("doc_id", "text")
    val got = graft.ops.Packing
      .lengthBucketing(docs, size(split(col("text"), " ")))
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 1L, 9L, 0L, 8L, 0L, 888888L),
      (2L, 2L, 5L, 3L, 9L, 1L, 13L, 166666L, 722222L),
      (4L, 1L, 9L, 9L, 9L, 0L, 0L, 0L, 0L)), s"got $got")
    graft.ops.Reuse.freeAll(spark)
  }

  test("pii: planted emails/ips/phones/ids counted per pattern on raw " +
      "text; ordered scrub leaves no residual matches and keeps clean " +
      "text byte-identical (ext92)") {
    import spark.implicits._
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or 10.0.255.7 now", "a"),
      (2L, "call +14155550123 acct 123456789012 end", "a"),
      (3L, "clean text with no private data", "b"),
      (4L, "two mails x@y.io a@b.org one ip 1.2.3.4", "b")
    ).toDF("doc_id", "text", "source")
    val card = TextOps.piiAudit(docs, Seq("source")).orderBy("source")
      .collect()
    val a = card(0); val b = card(1)
    assert(a.getAs[Long]("hits_email") == 1L)
    assert(a.getAs[Long]("hits_ipv4") == 1L)
    assert(a.getAs[Long]("hits_phone") == 1L)
    // counting is per pattern on RAW text: the phone's digit tail is 11
    // digits, so `idnum` sees it too, plus the account number
    assert(a.getAs[Long]("hits_idnum") == 2L)
    assert(a.getAs[Long]("docs_flagged") == 2L)
    assert(b.getAs[Long]("hits_email") == 2L)
    assert(b.getAs[Long]("hits_ipv4") == 1L)
    assert(b.getAs[Long]("docs_flagged") == 1L)
    // the ordered scrub is idempotent-by-construction: a second audit
    // over the scrubbed corpus finds nothing (phone consumed the digit
    // run before idnum looked)
    val scrubbed = docs.select(col("doc_id"),
      TextOps.scrub(col("text")).as("text"), col("source"))
    val resid = TextOps.piiAudit(scrubbed, Seq("source")).collect()
    TextOps.PiiPatterns.foreach { case (n, _) =>
      assert(resid.forall(_.getAs[Long](s"hits_$n") == 0L), s"residual $n")
    }
    // PII-free text passes through the whole chain untouched
    val clean = scrubbed.filter($"doc_id" === 3L)
      .select("text").as[String].head()
    assert(clean == "clean text with no private data")
    // doc 2's scrub: phone placeholder precedes idnum's
    val d2 = scrubbed.filter($"doc_id" === 2L)
      .select("text").as[String].head()
    assert(d2 == "call <PHONE> acct <IDNUM> end")
  }

  test("pii redaction surgery: per-stage applied counts, ordered chain " +
      "consumes overlaps, clean doc byte-identical (ext128)") {
    import spark.implicits._
    import graft.ops.TextOps
    val docs = Seq(
      // one of each class; the email's local part carries a 9-digit run
      (1L, "u123456789@x.com then +14155550123 on 10.0.0.1 acct 987654321"),
      // PII-free: must come back byte-identical with all-zero counts
      (2L, "plain text, nothing sensitive here"),
      // digits ONLY inside an email: the audit's independent idnum count
      // would see them; the ordered surgery must NOT (email ate them)
      (3L, "mail me at a987654321b@host.org thanks")
    ).toDF("doc_id", "text")
    val out = TextOps.redactPii(docs).orderBy("doc_id").collect()

    val d1 = out(0)
    assert(d1.getAs[Long]("n_redact_email") == 1L)
    assert(d1.getAs[Long]("n_redact_phone") == 1L)
    assert(d1.getAs[Long]("n_redact_ipv4") == 1L)
    // phone/email consumed their digit runs; only the bare acct remains
    assert(d1.getAs[Long]("n_redact_idnum") == 1L)
    assert(d1.getAs[Long]("n_redactions") == 4L)
    assert(d1.getAs[String]("clean_text") ==
      "<EMAIL> then <PHONE> on <IPV4> acct <IDNUM>")
    assert(d1.getAs[Long]("len_raw") ==
      "u123456789@x.com then +14155550123 on 10.0.0.1 acct 987654321".length)
    assert(d1.getAs[Long]("len_clean") ==
      "<EMAIL> then <PHONE> on <IPV4> acct <IDNUM>".length)

    val d2 = out(1)
    assert(d2.getAs[Long]("n_redactions") == 0L)
    assert(d2.getAs[String]("clean_text") ==
      "plain text, nothing sensitive here")
    assert(d2.getAs[Long]("len_raw") == d2.getAs[Long]("len_clean"))

    val d3 = out(2)
    assert(d3.getAs[Long]("n_redact_email") == 1L)
    assert(d3.getAs[Long]("n_redact_idnum") == 0L,
      "idnum matched digits the email stage should have consumed")
    assert(d3.getAs[String]("clean_text") == "mail me at <EMAIL> thanks")

    // surgery counts == what the chain applied: a second pass over the
    // clean text redacts nothing
    val again = TextOps.redactPii(
      docs.sparkSession.createDataFrame(
        docs.sparkSession.sparkContext.parallelize(out.toIndexedSeq.map(r =>
          org.apache.spark.sql.Row(r.getAs[Long]("doc_id"),
            r.getAs[String]("clean_text")))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))))
      .agg(sum("n_redactions")).collect()(0).getLong(0)
    assert(again == 0L, "redaction not idempotent")
  }
}
