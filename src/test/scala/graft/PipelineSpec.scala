package graft

import org.apache.spark.sql.functions._
import graft.functions.Fnv1a64
import graft.operators.{Dedup, Multimodal, Similarity}

/** Specs for the C-group (training-data pipeline) operators — these are
  * the oracles for the rows-only gate queries.
  */
class FingerprintSpec extends SparkFunSuite {
  import spark.implicits._

  test("fnv1a64 expression matches the reference JVM implementation") {
    val docs = Tables.documents(spark, sf).limit(50)
    val got = docs.select($"doc_id", Fnv1a64.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Fnv1a64.hashString(r.getString(1))).toMap
    assert(got == want)
  }

  test("fnv1a64 known vectors (public FNV-1a test values)") {
    // fnv1a64("") = offset basis; fnv1a64("a") = 0xaf63dc4c8601ec8c
    assert(Fnv1a64.hashString("") == 0xcbf29ce484222325L)
    assert(Fnv1a64.hashString("a") == 0xaf63dc4c8601ec8cL)
    assert(Fnv1a64.hashString("foobar") == 0x85944171f73967e8L)
  }

  test("fnv1a64 null-safe and codegen/interpreted agree") {
    val df = Seq(Some("x"), None, Some("")).toDF("s")
    val rows = df.select(Fnv1a64.fingerprint($"s")).collect()
    assert(rows(0).getLong(0) == Fnv1a64.hashString("x"))
    assert(rows(1).isNullAt(0))
    assert(rows(2).getLong(0) == 0xcbf29ce484222325L)
  }
}

class DedupSpec extends SparkFunSuite {

  private def planted(df: Array[(Long, Long)], delta: Long): Int =
    df.count { case (a, b) => b - a == delta }

  lazy val corpus = DedupQueries.corpus(spark, sf).cache()
  lazy val nExact = Tables.documents(spark, sf)
    .filter(col("doc_id") % 10 === 0).count().toInt
  lazy val nNear = Tables.documents(spark, sf)
    .filter(col("doc_id") % 10 === 5).count().toInt

  test("dedup_exact finds every planted exact duplicate, nothing twice") {
    val res = Dedup.exact(corpus, "doc_id", "text")
    val nDocs = corpus.count()
    val dupGroups = res.filter(col("n_copies") >= 2).count()
    assert(res.agg(sum("n_copies")).collect()(0).getLong(0) == nDocs)
    assert(dupGroups >= nExact) // at least the planted groups
  }

  test("minhash recovers all planted pairs with sane estimates") {
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text", 0.5)
      .select("doc_a", "doc_b", "est_jaccard").collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(planted(keys, 1000000L) == nExact, "exact-copy recall")
    assert(planted(keys, 2000000L) == nNear, "near-copy recall")
    // exact copies estimate 1.0
    pairs.filter(r => r.getLong(1) - r.getLong(0) == 1000000L)
      .foreach(r => assert(r.getDouble(2) == 1.0))
  }

  test("containment catches a quoted doc that jaccard misses") {
    import spark.implicits._
    val quoted = "this exact paragraph is reproduced verbatim inside the longer document"
    val filler = (1 to 30).map(i => s"unrelated sentence number $i talking about other things").mkString(" ")
    val docs = Seq(
      (1L, quoted),                 // the short original
      (2L, s"$filler $quoted"),     // long doc quoting it wholesale
      (3L, "completely different content with nothing shared at all")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    // the short doc is contained in the long one...
    assert(cont.exists { case (a, b, c) => a == 1L && b == 2L && c >= 0.9 })
    // ...but NOT vice versa (asymmetric), and doc 3 pairs with nobody
    assert(!cont.exists { case (a, b, _) => a == 2L && b == 1L })
    assert(!cont.exists { case (a, b, _) => a == 3L || b == 3L })
    // jaccard at the same bar misses the quote entirely
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9).count()
    assert(jac == 0L)
  }

  test("keepBest keeps the best-quality member per cluster, not the min id") {
    import spark.implicits._
    // quality = doc_id % 7 as a double: deterministic, and for planted
    // pairs (d, d+1M) quality differs whenever 1M % 7 != 0 (it isn't)
    val q = (col("doc_id") % 7).cast("double")
    val res = Dedup.keepBest(corpus, "doc_id", "text", q, threshold = 0.5)
    val byCluster = res.select("cluster_id", "keeper", "n_members", "best_quality")
      .as[(Long, Long, Long, Double)].collect()
    // every corpus doc is in exactly one cluster (keeper rows partition it)
    assert(byCluster.map(_._3).sum == corpus.count())
    // clusters and membership from the plain clustering
    val clusters = Dedup.minhashClusters(corpus, "doc_id", "text", 0.5)
      .as[(Long, Long)].collect().groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    byCluster.filter(_._3 >= 2).foreach { case (cid, keeper, _, bq) =>
      val members = clusters(cid)
      val want = members.map(id => (-(id % 7).toDouble, id)).min._2
      assert(keeper == want, s"cluster $cid keeper")
      assert(bq == (want % 7).toDouble)
    }
    // at least the planted exact-dup clusters exist and often keep the
    // HIGHER id (1M-shifted copy wins when (d+1M)%7 > d%7) — proving
    // the selection is by quality, not min id
    assert(byCluster.exists { case (cid, keeper, n, _) => n >= 2 && keeper != cid })
  }

  test("keepBestWithClusters on precomputed labels equals keepBest") {
    val q = (col("doc_id") % 7).cast("double")
    val direct = Dedup.keepBest(corpus, "doc_id", "text", q, threshold = 0.5)
    val labels = Dedup.minhashClusters(corpus, "doc_id", "text", 0.5)
    val reused = Dedup.keepBestWithClusters(corpus, "doc_id", labels, q)
    assert(direct.exceptAll(reused).count() == 0 &&
      reused.exceptAll(direct).count() == 0)
  }

  test("simhash recovers planted pairs within hamming 3") {
    val keys = Dedup.simhashPairs(corpus, "doc_id", "text", 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(planted(keys, 1000000L) == nExact)
    // near copies shift the token multiset; hamming<=3 keeps most but
    // legitimately drops heavily-shifted short docs
    assert(planted(keys, 2000000L) >= (nNear * 0.7).toInt)
  }

  test("ngram jaccard: planted exact pairs at 1.0, near pairs high") {
    val rows = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = rows.filter(t => t._2 - t._1 == 1000000L)
    val near = rows.filter(t => t._2 - t._1 == 2000000L)
    assert(exact.length == nExact)
    exact.foreach(t => assert(t._3 == 1.0))
    assert(near.length == nNear)
    near.foreach(t => assert(t._3 > 0.7))
  }

  test("embedding LSH recovers planted near-identical vectors") {
    val vecs = DedupQueries.vecCorpus(spark, sf)
    val nPlanted = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 10 === 0).count().toInt
    val keys = Similarity.embeddingPairs(vecs, 0.99)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(planted(keys, 1000000L) >= (nPlanted * 0.9).toInt)
  }
}

class SimilaritySpec extends SparkFunSuite {

  test("brute-force top-k: k rows per probe, cosine descending, in [-1,1]") {
    val res = VectorQueries.queries("ann_bruteforce")(spark, sf).collect()
    val byProbe = res.groupBy(_.getLong(0))
    byProbe.foreach { case (p, rows) =>
      assert(rows.length == 5, s"probe $p")
      val cos = rows.sortBy(_.getLong(3)).map(_.getDouble(2)).toSeq
      assert(cos == cos.sorted.reverse)
      cos.foreach(c => assert(c >= -1.0001 && c <= 1.0001))
    }
  }

  test("LSH top-k hits are a subset ranking of true cosine order") {
    // every LSH result's cosine must equal the brute-force cosine for
    // the same (probe, vec) — the bucketing only restricts candidates.
    val bf = VectorQueries.queries("ann_bruteforce")(spark, sf)
      .select("probe_id", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = VectorQueries.queries("ann_lsh")(spark, sf)
      .select("probe_id", "vec_id", "cos").collect()
    var overlap = 0
    lsh.foreach { r =>
      bf.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(math.abs(c - r.getDouble(2)) < 1e-12); overlap += 1
      }
    }
    assert(overlap > 0, "LSH found none of the true top-5")
  }
}

class MultimodalSpec extends SparkFunSuite {

  test("typed mapPartitions path equals the columnar path exactly") {
    val payloads = MultimodalQueries.payloads(spark, sf)
    val colPath = Multimodal.extractMeta(payloads)
      .orderBy("doc_id").collect().toSeq
    val typedPath = Multimodal.extractMetaTyped(spark, payloads).toDF()
      .select("doc_id", "n_bytes", "sha_hex", "width", "height", "n_frames")
      .orderBy("doc_id").collect().toSeq
    assert(colPath == typedPath)
  }

  test("frame sampling fans out every 7th frame index per payload") {
    val meta = Multimodal.extractMeta(MultimodalQueries.payloads(spark, sf))
    val frames = Multimodal.sampleFrames(meta, 7)
    val check = meta.select("doc_id", "n_frames").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counts = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == check.keySet)
    counts.foreach { case (id, n) =>
      assert(n == (check(id) + 6) / 7, s"doc $id")
    }
  }

  test("payload plumbing survives repartitioning (batch-shape invariance)") {
    val payloads = MultimodalQueries.payloads(spark, sf).repartition(7)
    val n = Multimodal.extractMetaTyped(spark, payloads).count()
    assert(n == 500)
  }

  test("ImageIoDecoder decodes REAL image bytes; unknown formats fall back to the stub") {
    import spark.implicits._
    // real encoded images, generated in-memory with the same JDK codecs
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => img.setRGB(x, 0, x * 31))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"encode $fmt")
      bos.toByteArray
    }
    val png = encode("png", 640, 480)
    val bmp = encode("bmp", 31, 17)
    val gif = encode("gif", 8, 8)
    val notAnImage = Array.tabulate[Byte](100)(_.toByte)
    val payloads = Seq(
      (1L, png), (2L, bmp), (3L, gif), (4L, notAnImage)
    ).toDF("doc_id", "payload").repartition(2)

    val out = Multimodal.extractMetaTyped(spark, payloads,
        new Multimodal.ImageIoDecoder())
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).width == 640L && out(1L).height == 480L && out(1L).n_frames == 1L)
    assert(out(2L).width == 31L && out(2L).height == 17L)
    assert(out(3L).width == 8L && out(3L).height == 8L)
    // no JDK reader claims the junk payload -> deterministic stub values
    val (sw, sh, sf_) = Multimodal.decodeStub(4L, 100L)
    assert(out(4L).width == sw && out(4L).height == sh && out(4L).n_frames == sf_)
    // the non-decode columns are decoder-independent
    assert(out(1L).n_bytes == png.length.toLong)
  }

  test("decoder seam: open once per partition, decode per row, close at task end") {
    val sc = spark.sparkContext
    val opens = sc.longAccumulator("opens")
    val decodes = sc.longAccumulator("decodes")
    val closes = sc.longAccumulator("closes")
    class CountingDecoder extends Multimodal.MediaDecoder {
      override def open(): Unit = opens.add(1)
      override def decode(docId: Long, payload: Array[Byte]): Multimodal.MediaDecoded = {
        decodes.add(1)
        Multimodal.StubMediaDecoder.decode(docId, payload)
      }
      override def close(): Unit = closes.add(1)
    }
    val payloads = MultimodalQueries.payloads(spark, sf).repartition(5)
    val out = Multimodal.extractMetaTyped(spark, payloads, new CountingDecoder)
    assert(out.count() == 500)
    assert(opens.value == 5, s"open per partition, got ${opens.value}")
    assert(closes.value == 5, s"close per task, got ${closes.value}")
    assert(decodes.value == 500, s"decode per row, got ${decodes.value}")
    // swapping the decoder changes nothing else: stub output unchanged
    val viaSeam = Multimodal.extractMetaTyped(spark, payloads).toDF()
      .orderBy("doc_id").collect().toSeq
    val columnar = Multimodal.extractMeta(payloads)
      .orderBy("doc_id").collect().toSeq
    assert(viaSeam == columnar)
  }
}
