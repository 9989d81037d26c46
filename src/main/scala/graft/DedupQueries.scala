package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** SURVEY.md §2 C1-C5 — the dedup family as gate queries. The test
  * corpus has no natural duplicates, so each query plants them
  * deterministically: exact copies (doc_id+1M for doc_id%10=0) and
  * near copies with the first two words dropped (doc_id+2M for
  * doc_id%10=5). The same construction is mirrored in the C1 oracle;
  * C2-C4 are rows-only (signature algorithms aren't SQL-expressible)
  * with ScalaTest oracles asserting planted-pair recall.
  */
object DedupQueries {

  private def Q(f: (SparkSession, String) => DataFrame) = f

  /** Base docs + planted exact and near duplicates. */
  def corpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val exact = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val near = docs.filter(col("doc_id") % 10 === 5)
      .select((col("doc_id") + 2000000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+\\S+\\s+", "").as("text"))
    docs.unionByName(exact).unionByName(near)
  }

  /** Embeddings + planted near-dup vectors (first component nudged). */
  def vecCorpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d).select("vec_id", "embedding")
    val near = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"),
        expr("transform(embedding, (x, i) -> CASE WHEN i = 0 THEN CAST(x + 0.01 AS FLOAT) ELSE x END)")
          .as("embedding"))
    base.unionByName(near)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C1 (oracle): exact dedup via content-hash groupBy — 16 bytes/row
    // shuffle, equivalent to GROUP BY text.
    "dedup_exact" -> Q { (s, d) =>
      Dedup.exact(corpus(s, d), "doc_id", "text").orderBy("keeper")
    },

    // C2 (rows-only): MinHash+LSH near-dup clusters — LSH pairs then
    // distributed min-propagation connected components.
    "dedup_minhash" -> Q { (s, d) =>
      Dedup.minhashClusters(corpus(s, d), "doc_id", "text", threshold = 0.5)
        .orderBy("doc_id")
    },

    // C2b (rows-only): the underlying candidate-pair view.
    "dedup_minhash_pairs" -> Q { (s, d) =>
      Dedup.minhashPairs(corpus(s, d), "doc_id", "text", threshold = 0.5)
        .orderBy("doc_a", "doc_b")
    },

    // C3 (rows-only): 64-bit SimHash, hamming <= 3 via 4-band pigeonhole.
    "dedup_simhash" -> Q { (s, d) =>
      Dedup.simhashPairs(corpus(s, d), "doc_id", "text", maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    },

    // C4 (rows-only): exact char-5-gram Jaccard, prefix-filtered
    // candidates (guaranteed recall at the threshold).
    "dedup_ngram_jaccard" -> Q { (s, d) =>
      Dedup.ngramJaccardPairs(corpus(s, d), "doc_id", "text", threshold = 0.4)
        .orderBy("doc_a", "doc_b")
    },

    // C5 (rows-only): embedding cosine near-dups via hyperplane LSH.
    "dedup_embedding" -> Q { (s, d) =>
      Similarity.embeddingPairs(vecCorpus(s, d), threshold = 0.99)
        .orderBy("vec_a", "vec_b")
    },

    // C13 (rows-only): reproducible ~20% sample keyed on doc_id —
    // byte-identical across runs/retries (spec-checked).
    "sample_docs" -> Q { (s, d) =>
      graft.operators.Sampling.deterministicSample(
        Tables.documents(s, d).select("doc_id", "lang"),
        col("doc_id"), 0.2).orderBy("doc_id")
    },

    // C14 (rows-only): train/val/test split assignment by keyed hash.
    "split_assign" -> Q { (s, d) =>
      graft.operators.Sampling.splitAssign(
        Tables.documents(s, d).select("doc_id"),
        col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """WITH corpus AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
        | UNION ALL
        | SELECT doc_id + 2000000, regexp_replace(text, '^\S+\s+\S+\s+', '')
        | FROM documents WHERE doc_id % 10 = 5
        |)
        |SELECT min(doc_id) AS keeper, count(*) AS n_copies
        |FROM corpus GROUP BY text ORDER BY keeper""".stripMargin
  )
}
