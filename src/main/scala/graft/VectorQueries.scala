package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** SURVEY.md §2 C6-C7 — similarity search over the embeddings table.
  * C6 is the exact baseline with a DuckDB oracle (dot products fold
  * left-to-right in double on both engines — bit-identical cosines);
  * C7 (LSH) carries a full oracle too: the seeded hyperplanes are
  * inlined into the SQL at build time (like the minhash coefficients
  * in [[DedupOracles]]), and sign-of-dot signatures are exact because
  * the dot folds identically. C7b (IVF) closes the same way with one
  * extra step: training is bit-deterministic ([[IvfIndex.train]]), so
  * the TRAINED centroids are inlined as SQL literals and the oracle
  * re-derives cell assignment (argmin of the same left-to-right
  * squared-diff fold, first-index tie-break), probe cells (top-nProbe
  * by (dist, cell)), and in-cell cosine top-k — fully independently.
  */
object VectorQueries {

  private def Q(f: (SparkSession, String) => DataFrame) = f

  private[graft] val IvfNList = 16
  private[graft] val IvfNProbe = 4

  /** One model per data dir, memoized: the gate's query run and its
    * oracle build see the identical object (training is deterministic
    * anyway — the memo just avoids re-clustering).
    */
  private val ivfModels =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.IvfIndex.Model]
  private[graft] def ivfModel(s: SparkSession, d: String): graft.operators.IvfIndex.Model =
    ivfModels.getOrElseUpdate(d,
      graft.operators.IvfIndex.train(Tables.embeddings(s, d), nList = IvfNList))

  /** Distributed-trained coarse quantizer (round 10): the
    * [[graft.operators.IvfIndex.trainDistributed]] path gated
    * end-to-end at nList=32 — exact-decimal means keep the training
    * bit-deterministic, so its centroids inline into a DuckDB oracle
    * exactly like the driver-trained model's.
    */
  private[graft] val IvfDistNList = 32
  private val ivfDistModels =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.IvfIndex.Model]
  private[graft] def ivfDistModel(s: SparkSession, d: String): graft.operators.IvfIndex.Model =
    ivfDistModels.getOrElseUpdate(d,
      graft.operators.IvfIndex.trainDistributed(Tables.embeddings(s, d),
        nList = IvfDistNList))

  /** Two-level quantizer (round 10): k1 × k2 super/sub cells — the
    * assignment-cost shape for nList ≈ √n at corpus scale (k1 + k2
    * distances per vector instead of k1·k2). Both levels train through
    * the decimal-exact distributed machinery, so the whole model
    * inlines into a DuckDB oracle.
    */
  private[graft] val Ivf2K1 = 4
  private[graft] val Ivf2K2 = 4
  private[graft] val Ivf2NProbe1 = 2
  private[graft] val Ivf2NProbe = 4
  private val ivf2Models =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.IvfIndex.Model2]
  private[graft] def ivf2Model(s: SparkSession, d: String): graft.operators.IvfIndex.Model2 =
    ivf2Models.getOrElseUpdate(d,
      graft.operators.IvfIndex.trainTwoLevel(Tables.embeddings(s, d),
        k1 = Ivf2K1, k2 = Ivf2K2))

  // m=16 subspaces (4 dims each) x 16 centroids: the recall sweep on
  // this corpus gave 0.18 (m=4,k=16) / 0.46 (m=8,k=64) / 0.48
  // (m=16,k=16) / 0.6 (m=16,k=64) vs exact L2 — m=16,k=16 is the
  // operating point: best recall per inlined-codebook byte
  private[graft] val PqM = 16
  private[graft] val PqK = 16

  /** ADC shortlist size for the rerank gate: 4×k — the small refine
    * multiple production FAISS uses (`IndexRefineFlat` k_factor).
    */
  private[graft] val RerankShortlist = 20

  // MRL serving knobs: prefix = 8 of 64 dims (8× cheaper shortlist
  // scan), shortlist = 10·k — the adaptive-retrieval ratio from the
  // Matryoshka paper's retrieval experiments
  private[graft] val MrlDim = 8
  private[graft] val MrlShortlist = 50
  private val pqModels =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.PqIndex.PqModel]
  private[graft] def pqModel(s: SparkSession, d: String): graft.operators.PqIndex.PqModel =
    pqModels.getOrElseUpdate(d,
      graft.operators.PqIndex.train(Tables.embeddings(s, d), dim = 64,
        m = PqM, k = PqK))

  /** Residual codebooks (round 9): same m×k budget, trained on
    * vec − cell-centroid — the FAISS IVFPQ default. PqStudy (nProbe=4,
    * recall@5 vs exact L2, sf0.1): residual >= raw at every swept
    * (m,k) — 0.15 vs 0.13 (m=8,k=16), 0.230 vs 0.225 (16,16), 0.375
    * vs 0.365 (16,64) — but raw wins on the 200-vector sf0.01 corpus:
    * near-random data has little cluster structure for residuals to
    * exploit, so the advantage is corpus-dependent here and the
    * operator ships as a VARIANT, not a replacement (SURVEY §12).
    */
  private val pqResModels =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.PqIndex.PqModel]
  private[graft] def pqResModel(s: SparkSession, d: String): graft.operators.PqIndex.PqModel =
    pqResModels.getOrElseUpdate(d,
      graft.operators.PqIndex.trainResidual(Tables.embeddings(s, d),
        ivfModel(s, d), dim = 64, m = PqM, k = PqK))

  /** OPQ model (round 13): trained rotation (Ge et al. 2013 — OPQ-P
    * eigenvalue-allocation init + fixed NP alternations, all on the
    * deterministic sorted sample) + codebooks trained in the rotated
    * space. Rotation AND codebooks inline into the oracle with the
    * exact-literal transport; the rotation replays as a fixed-order
    * fold per output dim.
    */
  private[graft] val OpqIters = 4
  private val opqModels =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.OpqIndex.OpqModel]
  private[graft] def opqModel(s: SparkSession, d: String): graft.operators.OpqIndex.OpqModel =
    opqModels.getOrElseUpdate(d,
      graft.operators.OpqIndex.train(Tables.embeddings(s, d), dim = 64,
        m = PqM, k = PqK, iters = OpqIters))

  /** IVF trained in the OPQ-ROTATED space (round 13): ann_ivfopq's
    * coarse quantizer — assignment and probing must happen where the
    * OPQ codebooks live. Same deterministic training; rotated vectors
    * are a fixed-order fold of deterministic inputs, so these
    * centroids inline into the oracle like every other model.
    */
  private val ivfRotModels =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.IvfIndex.Model]
  private[graft] def ivfRotModel(s: SparkSession, d: String): graft.operators.IvfIndex.Model =
    ivfRotModels.getOrElseUpdate(d, {
      val om = opqModel(s, d)
      graft.operators.IvfIndex.train(
        Tables.embeddings(s, d).select(graft.operators.OpqIndex
          .rotate(col("embedding"), om.rotation).as("embedding")),
        nList = IvfNList)
    })

  /** SQ8 ranges (round 12): per-dim exact min/max — one order-
    * independent aggregate, so the trained ranges inline into the
    * oracle with the same bit-exact transport as the PQ codebooks.
    */
  private val sqModels =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.ScalarQuant.SqModel]
  private[graft] def sqModel(s: SparkSession, d: String): graft.operators.ScalarQuant.SqModel =
    sqModels.getOrElseUpdate(d,
      graft.operators.ScalarQuant.train(Tables.embeddings(s, d), dim = 64))

  /** The operator's 16 seeded hyperplanes for the 64-dim test
    * embeddings, as a DuckDB signature expression over DOUBLE[] column
    * `dv`: bit j = (dot(dv, plane_j) > 0) << j. Double literals use
    * Java's shortest round-trip toString; DuckDB parses them to the
    * identical bits.
    */
  private[graft] def sigBitsSql: String =
    Similarity.hyperplanes(16, 64).zipWithIndex.map { case (p, j) =>
      val lit = p.mkString("[", ",", "]")
      s"CASE WHEN list_inner_product(dv, $lit) > 0 THEN ${1 << j} ELSE 0 END"
    }.mkString(" + ")

  /** ann_range radius²: ~the 2-5% d2 quantile of probe-candidate
    * pairs on both SF corpora (min ≈ 1.1, median ≈ 2.0) — a real but
    * selective neighborhood, non-empty at both SFs. 1.5 is exactly
    * representable, so the literal parses to identical bits on both
    * engines and the d2 ≤ r² decision replays bit-for-bit.
    */
  private[graft] val RangeR2 = 1.5

  private def probes(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") % 50 === 0)

  // SemDeDup cosine threshold: pairwise cosines on this corpus put the
  // 99.9th percentile at ~0.38 (max 0.51), so 0.35 marks a real but
  // small semantic-duplicate set — the gate is non-trivial in both
  // directions (some dropped, most kept)
  private[graft] val SemTau = 0.35

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C6 (oracle): brute-force exact cosine top-5 per probe. Probes
    // broadcast; corpus scanned once; per-probe top-k via window rank.
    "ann_bruteforce" -> Q { (s, d) =>
      Similarity.bruteForceTopK(
        Tables.embeddings(s, d), probes(s, d), k = 5)
        .orderBy("probe_id", "rk")
    },

    // C7 (oracle): LSH-bucketed approximate top-5. Only same-band
    // corpus vectors are scored — the plan that survives a corpus too
    // large to scan per probe.
    "ann_lsh" -> Q { (s, d) =>
      Similarity.lshTopK(
        Tables.embeddings(s, d), probes(s, d), k = 5)
        .orderBy("probe_id", "rk")
    },

    // C7b (oracle): IVF — k-means coarse quantizer, probes scan their
    // nProbe nearest cells only; the trained centroids are inlined
    // into the DuckDB oracle below, which re-derives everything else.
    "ann_ivf" -> Q { (s, d) =>
      graft.operators.IvfIndex.topK(Tables.embeddings(s, d), probes(s, d),
        ivfModel(s, d), k = 5, nProbe = IvfNProbe).orderBy("probe_id", "rk")
    },

    // C7c (oracle, round 10): IVF with the DISTRIBUTED-trained
    // quantizer — exact-decimal means make cluster-side k-means
    // bit-deterministic (order-independent sums), so the gate closes
    // the same way ann_ivf's does: trained centroids inline into the
    // oracle, which re-derives every cell/probe/rank decision.
    "ann_ivf_dist" -> Q { (s, d) =>
      graft.operators.IvfIndex.topK(Tables.embeddings(s, d), probes(s, d),
        ivfDistModel(s, d), k = 5, nProbe = IvfNProbe)
        .orderBy("probe_id", "rk")
    },

    // C7e (oracle, round 12): radius search — FAISS range_search on
    // the IVF index: ALL neighbors within squared L2 r², not a fixed
    // top-k. No per-probe window at all — the r² cut is a scan-stage
    // predicate over probed-cell candidates, so the output never
    // shuffles. d2 folds bit-exactly (SqDistExpr), so the threshold
    // decision replays identically in the oracle.
    "ann_range" -> Q { (s, d) =>
      graft.operators.IvfIndex.rangeSearch(Tables.embeddings(s, d),
        probes(s, d), ivfModel(s, d), r2 = RangeR2, nProbe = IvfNProbe)
        .orderBy("probe_id", "vec_id")
    },

    // C7d (oracle, round 10): TWO-LEVEL IVF — super-cells then
    // sub-cells (hierarchical k-means / the inverted-multi-index
    // idea): assignment pays k1 + k2 distances instead of k1·k2, the
    // cost shape nList ≈ √n needs at corpus scale. Both trained
    // levels inline into the oracle, which replays super-cell argmin,
    // in-cell argmin, two-stage probing, and the in-cell cosine
    // top-k — every tie by (distance, index) on both engines.
    "ann_ivf2" -> Q { (s, d) =>
      graft.operators.IvfIndex.topK2(Tables.embeddings(s, d), probes(s, d),
        ivf2Model(s, d), k = 5, nProbe1 = Ivf2NProbe1, nProbe = Ivf2NProbe)
        .orderBy("probe_id", "rk")
    },

    // C29d (oracle, round 11): IVF2-PQ — the inverted-multi-index +
    // ADC composition, FAISS's actual 10¹⁰-vector serving shape: the
    // two-level quantizer bounds WHICH vectors are scored (at k1+k2 ≈
    // 2√k assignment distances instead of k), PQ bounds the COST of
    // scoring each one (m table reads over 16-byte codes). Both
    // trained models inline into one oracle that replays super/sub
    // argmin, two-stage probing, codes, LUTs, and the fixed-order ADC
    // add.
    "ann_ivf2pq" -> Q { (s, d) =>
      graft.operators.PqIndex.topKIvf2(Tables.embeddings(s, d), probes(s, d),
        ivf2Model(s, d), pqModel(s, d), k = 5, nProbe1 = Ivf2NProbe1,
        nProbe = Ivf2NProbe).orderBy("probe_id", "rk")
    },

    // C29h (oracle, round 12): Matryoshka prefix-dim serving
    // (Kusupati et al. 2022) — shortlist on the first 8 of 64 dims
    // (exact prefix L2, no trained model at all), exact full-dim
    // rerank of only the shortlist. The cheapest ANN rung: an 8×
    // cheaper scan bought with a prefix slice instead of a codebook.
    "ann_mrl" -> Q { (s, d) =>
      Similarity.mrlTopK(Tables.embeddings(s, d), probes(s, d), k = 5,
        mrlDim = MrlDim, shortlist = MrlShortlist)
        .orderBy("probe_id", "rk")
    },

    // C29 (oracle, round 8): product quantization — the compressed-
    // domain ADC scan (Jégou et al. 2011): corpus collapses to m-byte
    // codes, probes carry m×k lookup tables, every candidate costs m
    // table reads and a fixed-order 3-add. Trained codebooks inline
    // into the oracle like ann_ivf's centroids.
    "ann_pq" -> Q { (s, d) =>
      graft.operators.PqIndex.topK(Tables.embeddings(s, d), probes(s, d),
        pqModel(s, d), k = 5).orderBy("probe_id", "rk")
    },

    // C29i (oracle, round 13): OPQ — the trained orthogonal rotation
    // before the subspace split (Ge et al. 2013; FAISS OPQMatrix),
    // the PQ family's remaining rung past rerank: same 16-byte ADC
    // budget, codebooks spent where the rotated variance actually is.
    // The rotation is one map-side projection per scan; everything
    // downstream is ann_pq's coded-corpus shape. Rotation + codebooks
    // inline into the oracle; the per-dim rotation fold replays
    // bit-exactly.
    "ann_opq" -> Q { (s, d) =>
      graft.operators.OpqIndex.topK(Tables.embeddings(s, d), probes(s, d),
        opqModel(s, d), k = 5).orderBy("probe_id", "rk")
    },

    // C29i2 (oracle, round 13): IVF-OPQ — FAISS's OPQ16,IVF16,PQ16
    // index string: the coarse quantizer trained AND probed in the
    // rotated space, ADC over the OPQ codebooks. Rotation, rotated
    // IVF centroids and codebooks all inline into one oracle.
    "ann_ivfopq" -> Q { (s, d) =>
      graft.operators.OpqIndex.topKIvf(Tables.embeddings(s, d),
        probes(s, d), ivfRotModel(s, d), opqModel(s, d), k = 5,
        nProbe = IvfNProbe).orderBy("probe_id", "rk")
    },

    // C29b (oracle, round 8): IVF-PQ — the full FAISS composition:
    // probed cells bound WHICH vectors are scored, codes bound the
    // scoring cost. Both trained models inline into one oracle.
    "ann_ivfpq" -> Q { (s, d) =>
      graft.operators.PqIndex.topKIvf(Tables.embeddings(s, d), probes(s, d),
        ivfModel(s, d), pqModel(s, d), k = 5, nProbe = IvfNProbe)
        .orderBy("probe_id", "rk")
    },

    // C29e (oracle, round 12): IVF-PQ shortlist → EXACT rerank — the
    // round-12 corpus study's own conclusion operationalized (ADC is
    // a shortlist stage; tools/ann_corpus_r12.json): ADC over probed-
    // cell codes proposes `RerankShortlist` candidates per probe, a
    // broadcast semi-join re-reads raw vectors for ONLY those ids,
    // and the final top-k ranks by exact squared L2 (d2 asc, vec_id).
    // The oracle replays the whole chain: codes/LUTs/ADC shortlist
    // from the shared CTEs, then the identical exact-distance fold.
    "ann_ivfpq_rerank" -> Q { (s, d) =>
      graft.operators.PqIndex.topKIvfRerank(Tables.embeddings(s, d),
        probes(s, d), ivfModel(s, d), pqModel(s, d), k = 5,
        shortlist = RerankShortlist, nProbe = IvfNProbe)
        .orderBy("probe_id", "rk")
    },

    // C29f (oracle, round 12): SQ8 scalar quantization — FAISS
    // IndexScalarQuantizer: each dim quantizes independently to one
    // byte against a trained [min, max]; 4× compression with near-
    // exact ranking (every dim keeps 256 levels, unlike PQ's shared
    // codebook entries). Training is one min/max aggregate, not
    // k-means. The oracle inlines the ranges bit-exactly and replays
    // encode (floor-clamp), midpoint reconstruction, and the exact
    // left-to-right distance fold.
    "ann_sq8" -> Q { (s, d) =>
      graft.operators.ScalarQuant.topK(Tables.embeddings(s, d), probes(s, d),
        sqModel(s, d), k = 5).orderBy("probe_id", "rk")
    },

    // C29g (oracle, round 12): IVF-SQ8 — FAISS IndexIVFScalarQuantizer:
    // the coarse quantizer bounds WHICH vectors are scored, SQ8 bounds
    // the I/O of scoring each one (d bytes, never raw floats). Same
    // two-broadcast candidate shape as ann_ivfpq.
    "ann_ivfsq" -> Q { (s, d) =>
      graft.operators.ScalarQuant.topKIvf(Tables.embeddings(s, d),
        probes(s, d), ivfModel(s, d), sqModel(s, d), k = 5,
        nProbe = IvfNProbe).orderBy("probe_id", "rk")
    },

    // C29c (oracle, round 9): residual IVF-PQ — codes quantize
    // vec − cell-centroid (FAISS IVFPQ's by_residual): residuals
    // concentrate near the origin, so the same 16-byte code budget
    // buys materially higher recall. Probe LUTs are per probed CELL
    // (the probe's residual is cell-relative); both trained models
    // inline into the oracle bit-exactly.
    "ann_ivfpq_residual" -> Q { (s, d) =>
      graft.operators.PqIndex.topKIvfResidual(Tables.embeddings(s, d),
        probes(s, d), ivfModel(s, d), pqResModel(s, d), k = 5,
        nProbe = IvfNProbe).orderBy("probe_id", "rk")
    },

    // C31 (oracle, round 9): SemDeDup (Abbas et al. 2023) — semantic
    // dedup INSIDE k-means cells: the coarse quantizer bounds the
    // pairwise-cosine work to Σ|cell|², min-id-wins keeps one
    // representative per neighborhood. Reuses the ann_ivf quantizer;
    // the oracle re-derives cells from the inlined centroids and
    // replays the keep rule.
    "dedup_semantic" -> Q { (s, d) =>
      graft.operators.SemDedup.flag(Tables.embeddings(s, d),
        ivfModel(s, d), tau = SemTau).orderBy("vec_id")
    },

    // C34 (oracle, round 9): kNN label propagation — classify each
    // probe by majority vote of its 5 nearest labeled neighbors,
    // vote ties toward the smallest label. The standard
    // weak-labeling / eval-probing step over an embedded corpus.
    "ann_knn_classify" -> Q { (s, d) =>
      Similarity.knnClassify(Tables.embeddings(s, d), probes(s, d), k = 5)
        .orderBy("probe_id")
    },

    // C15 (oracle): per-vector stats — dim, L2 norm, sum of components.
    // Pure codegen'd HOF arithmetic in the scan stage, zero shuffle;
    // the norm is the same left-to-right double fold the ANN oracle
    // already proved bit-identical across engines.
    "vec_stats" -> Q { (s, d) =>
      val v = transform(col("embedding"), x => x.cast("double"))
      Tables.embeddings(s, d).select(
        col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("dim"),
        sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x)).as("l2_norm"),
        aggregate(v, lit(0.0), (a, x) => a + x).as("comp_sum"))
        .orderBy("vec_id")
    },

    // C53 (round 14): PCA top-direction projection — exact integer
    // moments in one 64-key shuffle, driver power iteration (fixed 64
    // rounds, deterministic sign rule), the learned direction
    // transported as E-notation literals into BOTH engines, and the
    // projection the shared left-associative unrolled dot — the
    // trained-model-literal pattern (see operators/Pca.scala).
    "vec_pca_project" -> Q { (s, d) =>
      val w = pcaModel(s, d)
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          expr(graft.operators.Pca.projSql("embedding", w, 0)).as("proj"))
        .orderBy("vec_id")
    },

    // C49 (round 14): HYBRID retrieval — reciprocal-rank fusion
    // (Cormack et al. 2009) of a lexical BM25 ranking over documents
    // and a vector cosine ranking over embeddings, joined on the
    // fixture's parallel key (vec_id ≡ doc_id; at sf0.1 only a prefix
    // of docs has embeddings — the realistic hybrid case, which the
    // FULL OUTER fusion is the answer to). RRF contribution is the
    // INTEGER 10⁶ div (60 + rank) — no float sum ordering to defend;
    // ranks come from the two proven double-scoring replays (BM25's
    // fixed-order total, cosine's left-to-right fold). Each list is
    // top-50, bounded — the fusion runs on ≤100 rows however big the
    // corpus; the heavy work is the two independently-scalable
    // retrievals themselves.
    "ann_hybrid_rrf" -> Q { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val lex = graft.operators.Bm25.rank(Tables.documents(s, d),
          "doc_id", "text", RrfPhrases, 50)
        .select(col("doc_id"), row_number().over(
            Window.orderBy(col("bm25").desc, col("doc_id")))
          .cast("long").as("rank_lex")) // 50-row bounded window
      val emb = Tables.embeddings(s, d)
      val vec = Similarity.bruteForceTopKWindow(emb,
          emb.filter(col("vec_id") === 0), 50)
        .select(col("vec_id").as("doc_id"), col("rk").as("rank_vec"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          expr("coalesce(1000000 div (60 + rank_lex), 0) + " +
            "coalesce(1000000 div (60 + rank_vec), 0)"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(20)
        .select(col("doc_id"),
          coalesce(col("rank_lex"), lit(0L)).as("rank_lex"),
          coalesce(col("rank_vec"), lit(0L)).as("rank_vec"),
          col("rrf"))
    }
  )

  /** The fixed query phrases for C49's lexical side (text_bm25's
    * phrase list — the fusion reuses the proven scoring replay).
    */
  private[graft] val RrfPhrases =
    Seq("hash join", "window merge", "scan filter")

  /** C49 oracle: the BM25 rank subquery ([[graft.operators.Bm25
    * .rankSql]]), the ann_bruteforce cosine stack for probe vec_id=0,
    * row-number ranks, FULL OUTER fusion, integer RRF.
    */
  private def hybridRrfSql: String =
    s"""WITH lexq AS (${graft.operators.Bm25.rankSql(RrfPhrases, 50)}),
       |lexr AS (
       | SELECT doc_id,
       |  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_lex
       | FROM lexq),
       |p AS (SELECT CAST(embedding AS DOUBLE[]) AS pv
       |      FROM embeddings WHERE vec_id = 0),
       |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
       |      FROM embeddings WHERE vec_id <> 0),
       |scored AS (
       | SELECT vec_id,
       |  list_inner_product(pv, cv) /
       |   (sqrt(list_inner_product(pv, pv)) *
       |    sqrt(list_inner_product(cv, cv))) AS cos
       | FROM c, p),
       |vecr AS (
       | SELECT vec_id AS doc_id, rk AS rank_vec FROM (
       |  SELECT vec_id, cos,
       |   row_number() OVER (ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored) WHERE rk <= 50),
       |fused AS (
       | SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
       |  l.rank_lex, v.rank_vec,
       |  coalesce(1000000 // (60 + l.rank_lex), 0) +
       |  coalesce(1000000 // (60 + v.rank_vec), 0) AS rrf
       | FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id)
       |SELECT doc_id, CAST(coalesce(rank_lex, 0) AS BIGINT) AS rank_lex,
       | CAST(coalesce(rank_vec, 0) AS BIGINT) AS rank_vec,
       | CAST(rrf AS BIGINT) AS rrf
       |FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  /** IVF oracle, built when (a) a SparkSession is live and (b) the gate
    * dir is known (Verify sets graft.oracle.sfDir) — then the model for
    * that dir is trained (or recalled from the memo) and its centroids
    * become SQL literals. Outside that context the entry is omitted and
    * the gate falls back to the rows-only check.
    *
    * The SQL mirrors the operator decision-for-decision:
    *  - dist to each centroid = list_inner_product(diff, diff) where
    *    diff folds (dv[i] - c[i]) left-to-right — bit-identical to
    *    [[graft.operators.IvfIndex.assignCell]]'s aggregate fold;
    *  - corpus cell = argmin with FIRST index winning ties
    *    (row_number ORDER BY d2, ci — Spark's array_position-of-min);
    *  - probe cells = top-nProbe by (d2, ci) — Spark's array_sort over
    *    (d, i) structs;
    *  - candidate scoring + top-k identical to the ann_lsh oracle.
    */
  /** The assignment CTE chain for a given trained model — shared by
    * the driver-trained and distributed-trained gates (identical
    * decision replay; only the centroid literals differ).
    */
  private def assignCtesFor(m: graft.operators.IvfIndex.Model): String = {
    val dim = m.centroids.head.size
    val cents = m.centroids.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ",", "]")}::DOUBLE[])" }
      .mkString(",\n   ")
    val diff = s"list_transform(range(1, ${dim + 1}), i -> dv[i] - cv[i])"
    s"""WITH dv AS (
       | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
       |), cents AS (
       | SELECT * FROM (VALUES
       |   $cents) AS t(ci, cv)
       |), dists AS (
       | SELECT vec_id, ci,
       |  list_inner_product($diff, $diff) AS d2
       | FROM dv CROSS JOIN cents
       |), assigned AS (
       | SELECT vec_id, ci AS cell FROM (
       |  SELECT vec_id, ci,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY d2, ci) AS rn
       |  FROM dists) WHERE rn = 1
       |)""".stripMargin
  }

  /** IVF top-k oracle for a given model's centroid literals. */
  private def ivfTopKSqlFor(m: graft.operators.IvfIndex.Model): String =
    s"""${assignCtesFor(m)}, pcells AS (
       | SELECT vec_id AS probe_id, ci AS cell FROM (
       |  SELECT vec_id, ci,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY d2, ci) AS rn
       |  FROM dists WHERE vec_id % 50 = 0) WHERE rn <= $IvfNProbe
       |)$ivfOracleTail""".stripMargin

  /** The shared candidates → cosine top-5 oracle tail (expects CTEs
    * `dv`, `assigned`, `pcells` in scope) — one definition for the
    * flat and two-level IVF oracles, so the scoring/tie-break replay
    * cannot silently diverge between them.
    */
  private def ivfOracleTail: String =
    """, cand AS (
      | SELECT p.probe_id, c.vec_id
      | FROM assigned c JOIN pcells p
      |  ON c.cell = p.cell AND c.vec_id <> p.probe_id
      |), scored AS (
      | SELECT cand.probe_id, cand.vec_id,
      |  list_inner_product(p.dv, c.dv) /
      |   (sqrt(list_inner_product(p.dv, p.dv)) * sqrt(list_inner_product(c.dv, c.dv))) AS cos
      | FROM cand
      |  JOIN dv p ON p.vec_id = cand.probe_id
      |  JOIN dv c ON c.vec_id = cand.vec_id
      |), ranked AS (
      | SELECT probe_id, vec_id, cos,
      |  row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rk
      | FROM scored)
      |SELECT probe_id, vec_id, cos, CAST(rk AS BIGINT) AS rk FROM ranked
      |WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin

  /** Two-level oracle: both centroid levels as VALUES literals; the
    * replay mirrors assignCell2/probeCells2 decision-for-decision —
    * super-cell argmin (d2, ci), in-cell argmin (d2, global id),
    * nProbe1 super-cells then nProbe global cells by (d2, g).
    */
  private def ivf2TopKSqlFor(m: graft.operators.IvfIndex.Model2): String =
    s"""WITH dv AS (
       | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
       |)${ivf2CellCtes(m)}$ivfOracleTail""".stripMargin

  /** The two-level cell-decision CTE chain (expects `dv` in scope;
    * yields `assigned` + `pcells` over GLOBAL cell ids) — shared by
    * the ann_ivf2 oracle and the ann_ivf2pq composition's, so the
    * two gates replay identical quantizer decisions.
    */
  private def ivf2CellCtes(m: graft.operators.IvfIndex.Model2): String = {
    val dim = m.level1.centroids.head.size
    val c1Rows = m.level1.centroids.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ",", "]")}::DOUBLE[])" }
      .mkString(",\n   ")
    val c2Rows = (for {
      (subM, c1) <- m.sub.zipWithIndex
      (c, j) <- subM.centroids.zipWithIndex
    } yield s"(${m.bases(c1) + j}, $c1, ${c.mkString("[", ",", "]")}::DOUBLE[])")
      .mkString(",\n   ")
    val diff = s"list_transform(range(1, ${dim + 1}), i -> dv[i] - cv[i])"
    s""", c1t AS (
       | SELECT * FROM (VALUES
       |   $c1Rows) AS t(ci, cv)
       |), c2t AS (
       | SELECT * FROM (VALUES
       |   $c2Rows) AS t(g, c1, cv)
       |), d1 AS (
       | SELECT vec_id, ci, list_inner_product($diff, $diff) AS d2
       | FROM dv CROSS JOIN c1t
       |), a1 AS (
       | SELECT vec_id, ci AS c1 FROM (
       |  SELECT vec_id, ci,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY d2, ci) AS rn
       |  FROM d1) WHERE rn = 1
       |), d2l AS (
       | SELECT v.vec_id, t.g,
       |  list_inner_product(
       |   list_transform(range(1, ${dim + 1}), i -> v.dv[i] - t.cv[i]),
       |   list_transform(range(1, ${dim + 1}), i -> v.dv[i] - t.cv[i])) AS d2
       | FROM dv v JOIN a1 ON a1.vec_id = v.vec_id
       |  JOIN c2t t ON t.c1 = a1.c1
       |), assigned AS (
       | SELECT vec_id, g AS cell FROM (
       |  SELECT vec_id, g,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY d2, g) AS rn
       |  FROM d2l) WHERE rn = 1
       |), p1 AS (
       | SELECT vec_id, ci AS c1 FROM (
       |  SELECT vec_id, ci,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY d2, ci) AS rn
       |  FROM d1 WHERE vec_id % 50 = 0) WHERE rn <= $Ivf2NProbe1
       |), pd2 AS (
       | SELECT p.vec_id, t.g,
       |  list_inner_product(
       |   list_transform(range(1, ${dim + 1}), i -> v.dv[i] - t.cv[i]),
       |   list_transform(range(1, ${dim + 1}), i -> v.dv[i] - t.cv[i])) AS d2
       | FROM p1 p
       |  JOIN dv v ON v.vec_id = p.vec_id
       |  JOIN c2t t ON t.c1 = p.c1
       |), pcells AS (
       | SELECT vec_id AS probe_id, g AS cell FROM (
       |  SELECT vec_id, g,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY d2, g) AS rn
       |  FROM pd2) WHERE rn <= $Ivf2NProbe
       |)""".stripMargin
  }

  /** BIT-EXACT double-literal transport, not text: DuckDB 1.0's
    * literal parser is off by one ulp on some double strings —
    * including EXACT decimal expansions (observed live: 30/1024
    * centroid components mis-parsed) — which matters whenever the
    * literal feeds an OUTPUT column. Each component ships as its
    * IEEE-754 fields and is rebuilt with sign * mantissa * 2^e: the
    * mantissa (< 2^53) and the power of two are exactly representable
    * and the multiplies are pure exponent shifts, so ANY engine
    * recovers the identical bits (validated 1024/1024 against this
    * DuckDB).
    */
  private def exactLit(x: Double): String = {
    val bits = java.lang.Double.doubleToLongBits(x)
    if (x == 0.0) "0.0"
    else {
      val sign = if (bits < 0) -1 else 1
      val expF = ((bits >> 52) & 0x7FFL).toInt
      val frac = bits & 0xFFFFFFFFFFFFFL
      val (mant, e) =
        if (expF == 0) (frac, -1074) else (frac | (1L << 52), expF - 1075)
      s"($sign * $mant::DOUBLE * pow(2.0, $e))"
    }
  }

  private def ivfOracle: Map[String, String] = (for {
    s <- SparkSession.getActiveSession
    d <- sys.props.get("graft.oracle.sfDir")
  } yield {
    val m = ivfModel(s, d)
    val assignCtes = assignCtesFor(m)
    val ivfSql = ivfTopKSqlFor(m)
    // same quantizer, SemDeDup keep rule: lower-id in-cell neighbors
    // within tau are counted per victim; keep = none exist. Cell and
    // the tau comparison are DECISIONS (ranking-robust to literal
    // transport, like ann_ivf's), the outputs are integers.
    val semSql =
      s"""$assignCtes, pairs AS (
         | SELECT b.vec_id AS b_id, count(*) AS n_dup_lower
         | FROM assigned a
         |  JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  JOIN dv va ON va.vec_id = a.vec_id
         |  JOIN dv vb ON vb.vec_id = b.vec_id
         | WHERE list_inner_product(va.dv, vb.dv) /
         |  (sqrt(list_inner_product(va.dv, va.dv)) *
         |   sqrt(list_inner_product(vb.dv, vb.dv))) >= $SemTau
         | GROUP BY 1
         |)
         |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
         | coalesce(p.n_dup_lower, 0) AS n_dup_lower,
         | CAST(coalesce(p.n_dup_lower, 0) = 0 AS BIGINT) AS keep
         |FROM assigned a LEFT JOIN pairs p ON p.b_id = a.vec_id
         |ORDER BY a.vec_id""".stripMargin
    // radius search: same cell-decision replay, exact d2 as an OUTPUT
    // column via the explicit left-to-right fold, r² cut instead of a
    // rank window
    val dim = m.centroids.head.size
    val rangeSql =
      s"""$assignCtes, pcells AS (
         | SELECT vec_id AS probe_id, ci AS cell FROM (
         |  SELECT vec_id, ci,
         |   row_number() OVER (PARTITION BY vec_id ORDER BY d2, ci) AS rn
         |  FROM dists WHERE vec_id % 50 = 0) WHERE rn <= $IvfNProbe
         |), ex AS (
         | SELECT pc.probe_id, a.vec_id,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |   list_transform(range(1, ${dim + 1}),
         |    i -> (p.dv[i] - c.dv[i]) * (p.dv[i] - c.dv[i]))),
         |   (acc, x) -> acc + x) AS d2
         | FROM assigned a
         |  JOIN pcells pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
         |  JOIN dv p ON p.vec_id = pc.probe_id
         |  JOIN dv c ON c.vec_id = a.vec_id
         |)
         |SELECT probe_id, vec_id, d2 FROM ex WHERE d2 <= $RangeR2
         |ORDER BY probe_id, vec_id""".stripMargin
    Map("ann_ivf" -> ivfSql,
      "ann_ivf_dist" -> ivfTopKSqlFor(ivfDistModel(s, d)),
      "ann_ivf2" -> ivf2TopKSqlFor(ivf2Model(s, d)),
      "ann_range" -> rangeSql,
      "dedup_semantic" -> semSql)
  }).getOrElse(Map.empty)

  /** DuckDB replica of the PQ pipeline — same lazy binding as
    * [[ivfOracle]] (needs the session + sfDir to train the codebooks
    * it inlines). Decision-for-decision: per-subspace codes via
    * row_number(ORDER BY dd, ci) argmin, probe LUTs as sj/ci-ordered
    * nested lists, ADC as the SAME fixed left-to-right 4-term add.
    */
  private def pqOracle: Map[String, String] = (for {
    s <- SparkSession.getActiveSession
    d <- sys.props.get("graft.oracle.sfDir")
  } yield {
    val m = pqModel(s, d)
    val dsub = m.dSub
    def exact(x: Double): String = exactLit(x)
    val cents = (for {
      (cb, j) <- m.subCentroids.zipWithIndex
      (c, ci) <- cb.zipWithIndex
    } yield s"($j, $ci, ${c.map(exact).mkString("[", ",", "]")}::DOUBLE[])")
      .mkString(",\n   ")
    // explicit left-to-right fold, NOT list_inner_product: the ADC
    // distance is an OUTPUT column here, and list_inner_product's
    // accumulation rounds differently in the last ulp (fused multiply-
    // add), which the hash gate would catch — the fold reproduces
    // Spark's aggregate() bit-for-bit
    val diff =
      s"list_transform(range(1, ${dsub + 1}), i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))"
    val adc = (1 to m.m)
      .map(j => s"p.lut[$j][c.codes[$j] + 1]").mkString(" + ")
    // shared CTE chain: per-vector codes + per-probe LUTs
    val pqCtes =
      s"""dv AS (
         | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
         |), sc AS (
         | SELECT * FROM (VALUES
         |   $cents) AS t(sj, ci, cv)
         |), slices AS (
         | SELECT vec_id, s.sj,
         |  list_slice(dv, s.sj * $dsub + 1, (s.sj + 1) * $dsub) AS sv
         | FROM dv CROSS JOIN (SELECT DISTINCT sj FROM sc) s
         |), dd AS (
         | SELECT vec_id, slices.sj, ci,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $diff), (a, x) -> a + x) AS dd
         | FROM slices JOIN sc ON sc.sj = slices.sj
         |), codes AS (
         | SELECT vec_id, list(code ORDER BY sj) AS codes FROM (
         |  SELECT vec_id, sj, ci AS code FROM (
         |   SELECT vec_id, sj, ci,
         |    row_number() OVER (PARTITION BY vec_id, sj ORDER BY dd, ci) AS rn
         |   FROM dd) WHERE rn = 1)
         | GROUP BY vec_id
         |), plut0 AS (
         | SELECT vec_id AS probe_id, sj, list(dd ORDER BY ci) AS l
         | FROM dd WHERE vec_id % 50 = 0 GROUP BY 1, 2
         |), plut AS (
         | SELECT probe_id, list(l ORDER BY sj) AS lut FROM plut0 GROUP BY 1
         |)""".stripMargin
    val rankTail =
      s""", ranked AS (
         | SELECT probe_id, vec_id, ad2,
         |  row_number() OVER (PARTITION BY probe_id ORDER BY ad2, vec_id) AS rk
         | FROM scored)
         |SELECT probe_id, vec_id, ad2, CAST(rk AS BIGINT) AS rk FROM ranked
         |WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin
    // IVF coarse-quantizer CTEs (cell decisions only — ranking-robust,
    // same transport as the ann_ivf oracle)
    val im = ivfModel(s, d)
    val idim = im.centroids.head.size
    val icents = im.centroids.zipWithIndex
      .map { case (c, i) => s"($i, ${c.map(exact).mkString("[", ",", "]")}::DOUBLE[])" }
      .mkString(",\n   ")
    val idiff = s"list_transform(range(1, ${idim + 1}), i -> dv[i] - icv[i])"
    val ivfCtes =
      s""", ic AS (
         | SELECT * FROM (VALUES
         |   $icents) AS t(ici, icv)
         |), idist AS (
         | SELECT vec_id, ici, list_inner_product($idiff, $idiff) AS id2
         | FROM dv CROSS JOIN ic
         |), assigned AS (
         | SELECT vec_id, ici AS cell FROM (
         |  SELECT vec_id, ici,
         |   row_number() OVER (PARTITION BY vec_id ORDER BY id2, ici) AS rn
         |  FROM idist) WHERE rn = 1
         |), pcells AS (
         | SELECT vec_id AS probe_id, ici AS cell FROM (
         |  SELECT vec_id, ici,
         |   row_number() OVER (PARTITION BY vec_id ORDER BY id2, ici) AS rn
         |  FROM idist WHERE vec_id % 50 = 0) WHERE rn <= $IvfNProbe
         |)""".stripMargin
    // residual-PQ chain (round 9): corpus codes from the residual vs
    // the vector's OWN cell; probe LUTs PER PROBED CELL. Same exact
    // transport, same argmin/fold/add disciplines as the raw chain.
    val rm = pqResModel(s, d)
    val rcents = (for {
      (cb, j) <- rm.subCentroids.zipWithIndex
      (c, ci) <- cb.zipWithIndex
    } yield s"($j, $ci, ${c.map(exact).mkString("[", ",", "]")}::DOUBLE[])")
      .mkString(",\n   ")
    val resv = s"list_transform(range(1, ${idim + 1}), i -> dv[i] - icv[i])"
    val resCtes =
      s""", rsc AS (
         | SELECT * FROM (VALUES
         |   $rcents) AS t(sj, ci, cv)
         |), crv AS (
         | SELECT a.vec_id, a.cell, $resv AS rv
         | FROM assigned a JOIN dv USING (vec_id) JOIN ic ON ic.ici = a.cell
         |), cslices AS (
         | SELECT vec_id, s.sj,
         |  list_slice(rv, s.sj * $dsub + 1, (s.sj + 1) * $dsub) AS sv
         | FROM crv CROSS JOIN (SELECT DISTINCT sj FROM rsc) s
         |), cdd AS (
         | SELECT vec_id, cslices.sj, ci,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $diff), (a, x) -> a + x) AS dd
         | FROM cslices JOIN rsc ON rsc.sj = cslices.sj
         |), rcodes AS (
         | SELECT vec_id, list(code ORDER BY sj) AS codes FROM (
         |  SELECT vec_id, sj, ci AS code FROM (
         |   SELECT vec_id, sj, ci,
         |    row_number() OVER (PARTITION BY vec_id, sj ORDER BY dd, ci) AS rn
         |   FROM cdd) WHERE rn = 1)
         | GROUP BY vec_id
         |), prv AS (
         | SELECT pc.probe_id, pc.cell, $resv AS rv
         | FROM pcells pc JOIN dv ON dv.vec_id = pc.probe_id
         |  JOIN ic ON ic.ici = pc.cell
         |), pslices AS (
         | SELECT probe_id, cell, s.sj,
         |  list_slice(rv, s.sj * $dsub + 1, (s.sj + 1) * $dsub) AS sv
         | FROM prv CROSS JOIN (SELECT DISTINCT sj FROM rsc) s
         |), pdd AS (
         | SELECT probe_id, cell, pslices.sj, ci,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $diff), (a, x) -> a + x) AS dd
         | FROM pslices JOIN rsc ON rsc.sj = pslices.sj
         |), rplut0 AS (
         | SELECT probe_id, cell, sj, list(dd ORDER BY ci) AS l
         | FROM pdd GROUP BY 1, 2, 3
         |), rplut AS (
         | SELECT probe_id, cell, list(l ORDER BY sj) AS lut
         | FROM rplut0 GROUP BY 1, 2
         |)""".stripMargin
    Map(
      "ann_pq" ->
        s"""WITH $pqCtes, scored AS (
           | SELECT p.probe_id, c.vec_id, $adc AS ad2
           | FROM codes c CROSS JOIN plut p WHERE c.vec_id <> p.probe_id
           |)$rankTail""".stripMargin,
      "ann_ivfpq" ->
        s"""WITH $pqCtes$ivfCtes, scored AS (
           | SELECT p.probe_id, c.vec_id, $adc AS ad2
           | FROM assigned a
           |  JOIN pcells pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
           |  JOIN codes c ON c.vec_id = a.vec_id
           |  JOIN plut p ON p.probe_id = pc.probe_id
           |)$rankTail""".stripMargin,
      // IVF2-PQ: the same PQ codes/LUTs scored inside the TWO-LEVEL
      // quantizer's probed global cells (cell decisions replayed by
      // the shared ivf2CellCtes chain — identical to ann_ivf2's)
      "ann_ivf2pq" ->
        s"""WITH $pqCtes${ivf2CellCtes(ivf2Model(s, d))}, scored AS (
           | SELECT p.probe_id, c.vec_id, $adc AS ad2
           | FROM assigned a
           |  JOIN pcells pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
           |  JOIN codes c ON c.vec_id = a.vec_id
           |  JOIN plut p ON p.probe_id = pc.probe_id
           |)$rankTail""".stripMargin,
      // shortlist-R ADC (same scored CTE as ann_ivfpq) → exact-L2
      // rerank: the exact distance is an OUTPUT column, so it folds
      // with the explicit left-to-right reduce (the SqDistExpr order:
      // (p[i]-c[i])², accumulated from 0.0), not list_inner_product
      "ann_ivfpq_rerank" ->
        s"""WITH $pqCtes$ivfCtes, scored AS (
           | SELECT p.probe_id, c.vec_id, $adc AS ad2
           | FROM assigned a
           |  JOIN pcells pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
           |  JOIN codes c ON c.vec_id = a.vec_id
           |  JOIN plut p ON p.probe_id = pc.probe_id
           |), sl AS (
           | SELECT probe_id, vec_id FROM (
           |  SELECT probe_id, vec_id,
           |   row_number() OVER (PARTITION BY probe_id ORDER BY ad2, vec_id) AS rn
           |  FROM scored) WHERE rn <= $RerankShortlist
           |), ex AS (
           | SELECT sl.probe_id, sl.vec_id,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |   list_transform(range(1, ${idim + 1}),
           |    i -> (p.dv[i] - c.dv[i]) * (p.dv[i] - c.dv[i]))),
           |   (a, x) -> a + x) AS d2
           | FROM sl
           |  JOIN dv p ON p.vec_id = sl.probe_id
           |  JOIN dv c ON c.vec_id = sl.vec_id
           |), rranked AS (
           | SELECT probe_id, vec_id, d2,
           |  row_number() OVER (PARTITION BY probe_id ORDER BY d2, vec_id) AS rk
           | FROM ex)
           |SELECT probe_id, vec_id, d2, CAST(rk AS BIGINT) AS rk FROM rranked
           |WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,
      "ann_ivfpq_residual" ->
        s"""WITH dv AS (
           | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
           |)$ivfCtes$resCtes, scored AS (
           | SELECT p.probe_id, a.vec_id, $adc AS ad2
           | FROM assigned a
           |  JOIN rplut p ON p.cell = a.cell AND a.vec_id <> p.probe_id
           |  JOIN rcodes c ON c.vec_id = a.vec_id
           |)$rankTail""".stripMargin)
  }).getOrElse(Map.empty)

  /** DuckDB replica of the SQ8 pipeline — same lazy binding as
    * [[pqOracle]]. The trained ranges ship bit-exactly (they feed the
    * ad2 OUTPUT column); the replay mirrors the operator decision-for-
    * decision: floor-clamp encode, midpoint reconstruction with the
    * same two roundings (mul then add), and the explicit left-to-right
    * squared-diff fold (the SqDistExpr order), not list_inner_product.
    */
  /** ann_opq oracle (round 13): the trained 64×64 rotation inlines as
    * a VALUES table of row vectors; each corpus/probe vector rotates
    * through the IDENTICAL fixed-order fold the Spark side uses (per
    * output dim: products j = 1..64 left to right, one rounding per
    * multiply and add, seeded 0.0), then the standard codes/LUT/ADC
    * chain runs over the OPQ codebooks — same argmin, fold and add
    * disciplines as [[pqOracle]].
    */
  private def opqOracle: Map[String, String] = (for {
    s <- SparkSession.getActiveSession
    d <- sys.props.get("graft.oracle.sfDir")
  } yield {
    val om = opqModel(s, d)
    val m = om.pq
    val dim = om.dim
    val dsub = m.dSub
    val rRows = om.rotation.zipWithIndex
      .map { case (row, i) =>
        s"($i, ${row.map(exactLit).mkString("[", ",", "]")}::DOUBLE[])"
      }
      .mkString(",\n   ")
    val cents = (for {
      (cb, j) <- m.subCentroids.zipWithIndex
      (c, ci) <- cb.zipWithIndex
    } yield s"($j, $ci, ${c.map(exactLit).mkString("[", ",", "]")}::DOUBLE[])")
      .mkString(",\n   ")
    val diff =
      s"list_transform(range(1, ${dsub + 1}), i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))"
    val adc = (1 to m.m)
      .map(j => s"p.lut[$j][c.codes[$j] + 1]").mkString(" + ")
    val rotFold =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |   list_transform(range(1, ${dim + 1}), i -> r.rrow[i] * dv0.dv[i])),
         |   (a_, x_) -> a_ + x_)""".stripMargin
    // rotated-space IVF (ann_ivfopq): centroids trained on rotated
    // vectors, cell decisions replayed over the rotated dv
    val rim = ivfRotModel(s, d)
    val ricents = rim.centroids.zipWithIndex
      .map { case (c, i) =>
        s"($i, ${c.map(exactLit).mkString("[", ",", "]")}::DOUBLE[])"
      }
      .mkString(",\n   ")
    val ridiff = s"list_transform(range(1, ${dim + 1}), i -> dv[i] - icv[i])"
    val rIvfCtes =
      s""", ic AS (
         | SELECT * FROM (VALUES
         |   $ricents) AS t(ici, icv)
         |), idist AS (
         | SELECT vec_id, ici, list_inner_product($ridiff, $ridiff) AS id2
         | FROM dv CROSS JOIN ic
         |), assigned AS (
         | SELECT vec_id, ici AS cell FROM (
         |  SELECT vec_id, ici,
         |   row_number() OVER (PARTITION BY vec_id ORDER BY id2, ici) AS rn
         |  FROM idist) WHERE rn = 1
         |), pcells AS (
         | SELECT vec_id AS probe_id, ici AS cell FROM (
         |  SELECT vec_id, ici,
         |   row_number() OVER (PARTITION BY vec_id ORDER BY id2, ici) AS rn
         |  FROM idist WHERE vec_id % 50 = 0) WHERE rn <= $IvfNProbe
         |)""".stripMargin
    val opqCtes =
      s"""dv0 AS (
         | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
         |), rt AS (
         | SELECT * FROM (VALUES
         |   $rRows) AS t(ri, rrow)
         |), dv AS (
         | SELECT vec_id, list(rv ORDER BY ri) AS dv FROM (
         |  SELECT dv0.vec_id, r.ri, $rotFold AS rv
         |  FROM dv0 CROSS JOIN rt r) GROUP BY vec_id
         |), sc AS (
         | SELECT * FROM (VALUES
         |   $cents) AS t(sj, ci, cv)
         |), slices AS (
         | SELECT vec_id, s.sj,
         |  list_slice(dv, s.sj * $dsub + 1, (s.sj + 1) * $dsub) AS sv
         | FROM dv CROSS JOIN (SELECT DISTINCT sj FROM sc) s
         |), dd AS (
         | SELECT vec_id, slices.sj, ci,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $diff), (a, x) -> a + x) AS dd
         | FROM slices JOIN sc ON sc.sj = slices.sj
         |), codes AS (
         | SELECT vec_id, list(code ORDER BY sj) AS codes FROM (
         |  SELECT vec_id, sj, ci AS code FROM (
         |   SELECT vec_id, sj, ci,
         |    row_number() OVER (PARTITION BY vec_id, sj ORDER BY dd, ci) AS rn
         |   FROM dd) WHERE rn = 1)
         | GROUP BY vec_id
         |), plut0 AS (
         | SELECT vec_id AS probe_id, sj, list(dd ORDER BY ci) AS l
         | FROM dd WHERE vec_id % 50 = 0 GROUP BY 1, 2
         |), plut AS (
         | SELECT probe_id, list(l ORDER BY sj) AS lut FROM plut0 GROUP BY 1
         |)""".stripMargin
    val rankTail =
      s""", ranked AS (
         | SELECT probe_id, vec_id, ad2,
         |  row_number() OVER (PARTITION BY probe_id ORDER BY ad2, vec_id) AS rk
         | FROM scored)
         |SELECT probe_id, vec_id, ad2, CAST(rk AS BIGINT) AS rk FROM ranked
         |WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin
    Map(
      "ann_opq" ->
        s"""WITH $opqCtes, scored AS (
           | SELECT p.probe_id, c.vec_id, $adc AS ad2
           | FROM codes c CROSS JOIN plut p WHERE c.vec_id <> p.probe_id
           |)$rankTail""".stripMargin,
      "ann_ivfopq" ->
        s"""WITH $opqCtes$rIvfCtes, scored AS (
           | SELECT p.probe_id, c.vec_id, $adc AS ad2
           | FROM assigned a
           |  JOIN pcells pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
           |  JOIN codes c ON c.vec_id = a.vec_id
           |  JOIN plut p ON p.probe_id = pc.probe_id
           |)$rankTail""".stripMargin)
  }).getOrElse(Map.empty)

  private def sqOracle: Map[String, String] = (for {
    s <- SparkSession.getActiveSession
    d <- sys.props.get("graft.oracle.sfDir")
  } yield {
    val m = sqModel(s, d)
    val dim = m.dim
    val mnLit = m.mins.map(exactLit).mkString("[", ",", "]")
    val wLit = m.widths.map(exactLit).mkString("[", ",", "]")
    val sqCtes =
      s"""dv AS (
         | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
         |), sq AS (
         | SELECT $mnLit::DOUBLE[] AS mn, $wLit::DOUBLE[] AS w
         |), codes AS (
         | SELECT vec_id, list_transform(range(1, ${dim + 1}), i ->
         |   CASE WHEN sq.w[i] = 0 THEN 0
         |        ELSE CAST(least(greatest(floor((dv[i] - sq.mn[i]) / sq.w[i]),
         |                                 0), 255) AS INTEGER) END) AS codes
         | FROM dv CROSS JOIN sq
         |)""".stripMargin
    val fold =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |   list_transform(range(1, ${dim + 1}),
         |    i -> (p.dv[i] - (sq.mn[i] + (c.codes[i] + 0.5) * sq.w[i]))
         |       * (p.dv[i] - (sq.mn[i] + (c.codes[i] + 0.5) * sq.w[i])))),
         |   (a, x) -> a + x)""".stripMargin
    val rankTail =
      s""", ranked AS (
         | SELECT probe_id, vec_id, ad2,
         |  row_number() OVER (PARTITION BY probe_id ORDER BY ad2, vec_id) AS rk
         | FROM scored)
         |SELECT probe_id, vec_id, ad2, CAST(rk AS BIGINT) AS rk FROM ranked
         |WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin
    val im = ivfModel(s, d)
    Map(
      "ann_sq8" ->
        s"""WITH $sqCtes, scored AS (
           | SELECT p.vec_id AS probe_id, c.vec_id,
           |  $fold AS ad2
           | FROM codes c CROSS JOIN sq CROSS JOIN dv p
           | WHERE p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id
           |)$rankTail""".stripMargin,
      // IVF-SQ8: cell/probe decisions replay via the shared ann_ivf
      // chain (text-literal centroids — cells are decisions, ranking-
      // robust), then the identical SQ8 scoring inside probed cells
      "ann_ivfsq" ->
        s"""${assignCtesFor(im)}, pcells AS (
           | SELECT vec_id AS probe_id, ci AS cell FROM (
           |  SELECT vec_id, ci,
           |   row_number() OVER (PARTITION BY vec_id ORDER BY d2, ci) AS rn
           |  FROM dists WHERE vec_id % 50 = 0) WHERE rn <= $IvfNProbe
           |), sq AS (
           | SELECT $mnLit::DOUBLE[] AS mn, $wLit::DOUBLE[] AS w
           |), codes AS (
           | SELECT vec_id, list_transform(range(1, ${dim + 1}), i ->
           |   CASE WHEN sq.w[i] = 0 THEN 0
           |        ELSE CAST(least(greatest(floor((dv[i] - sq.mn[i]) / sq.w[i]),
           |                                 0), 255) AS INTEGER) END) AS codes
           | FROM dv CROSS JOIN sq
           |), scored AS (
           | SELECT pc.probe_id, a.vec_id,
           |  $fold AS ad2
           | FROM assigned a
           |  JOIN pcells pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
           |  JOIN codes c ON c.vec_id = a.vec_id
           |  JOIN dv p ON p.vec_id = pc.probe_id
           |  CROSS JOIN sq
           |)$rankTail""".stripMargin)
  }).getOrElse(Map.empty)

  /** One trained direction per data dir, memoized — gate and oracle
    * see the identical weights (training is deterministic anyway).
    */
  private val pcaModels =
    scala.collection.concurrent.TrieMap.empty[String, Array[Double]]
  private[graft] def pcaModel(s: SparkSession, d: String): Array[Double] =
    pcaModels.getOrElseUpdate(d,
      graft.operators.Pca.topDirection(Tables.embeddings(s, d), dim = 64))

  private def pcaOracle: Map[String, String] = (for {
    s <- SparkSession.getActiveSession
    d <- sys.props.get("graft.oracle.sfDir")
  } yield {
    val w = pcaModel(s, d)
    Map("vec_pca_project" ->
      s"""WITH e AS (
         | SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dv
         | FROM embeddings)
         |SELECT vec_id, label,
         | ${graft.operators.Pca.projSql("dv", w, 1)} AS proj
         |FROM e ORDER BY vec_id""".stripMargin)
  }).getOrElse(Map.empty)

  def oracles: Map[String, String] =
    ivfOracle ++ pqOracle ++ sqOracle ++ opqOracle ++ pcaOracle ++ Map(
    "ann_hybrid_rrf" -> hybridRrfSql,
    "ann_lsh" ->
      s"""WITH dv AS (
         | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
         |), sigs AS (
         | SELECT vec_id, dv, $sigBitsSql AS sig FROM dv
         |), banded AS (
         | SELECT vec_id, dv, unnest([sig % 256, 256 + sig // 256]) AS bh FROM sigs
         |), pb AS (
         | SELECT vec_id AS probe_id, bh FROM banded WHERE vec_id % 50 = 0
         |), cand AS (
         | SELECT DISTINCT p.probe_id, c.vec_id
         | FROM banded c JOIN pb p ON c.bh = p.bh AND c.vec_id <> p.probe_id
         |), scored AS (
         | SELECT cand.probe_id, cand.vec_id,
         |  list_inner_product(p.dv, c.dv) /
         |   (sqrt(list_inner_product(p.dv, p.dv)) * sqrt(list_inner_product(c.dv, c.dv))) AS cos
         | FROM cand
         |  JOIN dv p ON p.vec_id = cand.probe_id
         |  JOIN dv c ON c.vec_id = cand.vec_id
         |), ranked AS (
         | SELECT probe_id, vec_id, cos,
         |  row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rk
         | FROM scored)
         |SELECT probe_id, vec_id, cos, CAST(rk AS BIGINT) AS rk FROM ranked
         |WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,

    // MRL replay: prefix fold (first MrlDim elements) for the
    // shortlist, full fold for the rerank — both the explicit
    // left-to-right SqDistExpr order from 0.0; shortlist membership
    // ties by (pd2, vec_id) mirror the TopK (−score, id) rule
    "ann_mrl" ->
      s"""WITH dv AS (
         | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
         |p AS (SELECT vec_id AS probe_id, dv AS pv FROM dv
         |      WHERE vec_id % 50 = 0),
         |pre AS (
         | SELECT p.probe_id, c.vec_id,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |   list_transform(range(1, ${MrlDim + 1}),
         |    i -> (p.pv[i] - c.dv[i]) * (p.pv[i] - c.dv[i]))),
         |   (a, x) -> a + x) AS pd2
         | FROM dv c, p WHERE c.vec_id <> p.probe_id),
         |sl AS (
         | SELECT probe_id, vec_id FROM (
         |  SELECT probe_id, vec_id,
         |   row_number() OVER (PARTITION BY probe_id
         |    ORDER BY pd2, vec_id) AS rn
         |  FROM pre) WHERE rn <= $MrlShortlist),
         |ex AS (
         | SELECT sl.probe_id, sl.vec_id,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |   list_transform(range(1, 65),
         |    i -> (p.pv[i] - c.dv[i]) * (p.pv[i] - c.dv[i]))),
         |   (a, x) -> a + x) AS d2
         | FROM sl JOIN p ON p.probe_id = sl.probe_id
         |  JOIN dv c ON c.vec_id = sl.vec_id),
         |ranked AS (
         | SELECT probe_id, vec_id, d2,
         |  row_number() OVER (PARTITION BY probe_id
         |   ORDER BY d2, vec_id) AS rk
         | FROM ex)
         |SELECT probe_id, vec_id, d2, CAST(rk AS BIGINT) AS rk FROM ranked
         |WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,

    "ann_bruteforce" ->
      """WITH p AS (
        | SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
        | FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |scored AS (
        | SELECT probe_id, vec_id,
        |  list_inner_product(pv, cv) /
        |   (sqrt(list_inner_product(pv, pv)) * sqrt(list_inner_product(cv, cv))) AS cos
        | FROM c, p WHERE vec_id <> probe_id),
        |ranked AS (
        | SELECT probe_id, vec_id, cos,
        |  row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rk
        | FROM scored)
        |SELECT probe_id, vec_id, cos, rk FROM ranked
        |WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,

    "ann_knn_classify" ->
      """WITH p AS (
        | SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
        | FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |scored AS (
        | SELECT probe_id, vec_id,
        |  list_inner_product(pv, cv) /
        |   (sqrt(list_inner_product(pv, pv)) * sqrt(list_inner_product(cv, cv))) AS cos
        | FROM c, p WHERE vec_id <> probe_id),
        |nn AS (
        | SELECT probe_id, vec_id FROM (
        |  SELECT probe_id, vec_id,
        |   row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rk
        |  FROM scored) WHERE rk <= 5),
        |votes AS (
        | SELECT nn.probe_id, CAST(e.label AS BIGINT) AS label,
        |  count(*) AS n_votes
        | FROM nn JOIN embeddings e USING (vec_id) GROUP BY 1, 2)
        |SELECT probe_id, label AS pred_label, n_votes FROM (
        | SELECT probe_id, label, n_votes,
        |  row_number() OVER (PARTITION BY probe_id
        |   ORDER BY n_votes DESC, label) AS rk
        | FROM votes) WHERE rk = 1 ORDER BY probe_id""".stripMargin,

    "vec_stats" ->
      """WITH v AS (
        | SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dv,
        |        len(embedding) AS dim
        | FROM embeddings)
        |SELECT vec_id, label, CAST(dim AS BIGINT) AS dim,
        | sqrt(list_inner_product(dv, dv)) AS l2_norm,
        | list_inner_product(dv, list_transform(dv, x -> 1.0)) AS comp_sum
        |FROM v ORDER BY vec_id""".stripMargin
  )
}
