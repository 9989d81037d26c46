package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 phrase-relevance ranking — the search-side scoring a corpus
  * engine runs for retrieval, contamination triage ("which docs look
  * like this benchmark prompt"), and relevance-weighted sampling.
  * Terms are word BIGRAMS (phrases), the right unit when unigram
  * document frequency saturates (every doc contains every common
  * word — exactly this corpus's shape, and the web's for stopwords).
  *
  * Determinism contract (SURVEY §11): BM25's free constants are fixed
  * at k1 = 1, b = 3/4 — both DYADIC — so the per-term weight
  *   idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * reduces over avgdl = T/N to the exact-integer rational
  *   idf · (8·tf·T) / (4·tf·T + T + 3·dl·N)
  * with idf the dyadic floor(log2(N / df)) = length(bin(N div df))−1.
  * ONE IEEE division + ONE multiply per (doc, term) — no libm log, no
  * accumulated float error — and the final doc score sums the ≤
  * |phrases| term scores in FIXED expression order (a coalesce chain,
  * not an unordered aggregate), so every rank is bit-reproducible and
  * the DuckDB oracle replays it exactly. Integer envelope: 8·tf·T
  * must fit a long — at corpus scale (T ≳ 2⁵⁵ grams) promote the
  * ratio to doubles before multiplying; the RANKING this quantized
  * idf produces deviates from libm-BM25 only within idf plateaus
  * (documented, same tradeoff as text_lm_score).
  *
  * Scale shape: the gram stream is filtered to the |phrases| query
  * terms INSIDE the scan stage (selective, codegen'd), so the only
  * shuffle is the (doc, gram) tf partial-agg over matching docs; df
  * and the 1-row corpus stats are bounded broadcasts; top-k is a
  * TakeOrdered, never a global sort.
  */
object Bm25 {

  /** Word-bigram stream of a token array column. */
  private def bigrams(tk: Column): Column =
    transform(sequence(lit(1), size(tk) - 1),
      i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1)))

  /** Rank docs against bigram `phrases`; returns the top `k` rows
    * (doc_id, dl, s1..sn, bm25) by (bm25 desc, id asc). Docs matching
    * no phrase are excluded (score 0 — retrieval semantics).
    */
  def rank(docs: DataFrame, idCol: String, textCol: String,
           phrases: Seq[String], k: Int = 20): DataFrame = {
    require(phrases.nonEmpty && phrases.size <= 16)
    val base = docs
      .select(col(idCol),
        split(lower(trim(col(textCol))), "\\s+").as("tk"))
      .withColumn("dl", (size(col("tk")) - 1).cast("long"))
      .filter(col("dl") >= 1)
    val stats = base.agg(count(lit(1)).as("n_docs"), sum("dl").as("t_grams"))
    val tf = base
      .select(col(idCol), col("dl"), explode(bigrams(col("tk"))).as("gram"))
      .filter(col("gram").isin(phrases: _*)) // scan-stage selectivity
      .groupBy(col(idCol), col("dl"), col("gram"))
      .agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy("gram").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfRel), "gram")
      .crossJoin(broadcast(stats)) // 1 row
      .withColumn("idf",
        length(bin(expr("n_docs div df"))).cast("long") - 1L)
      .withColumn("score",
        col("idf").cast("double") *
          ((col("tf") * 8L * col("t_grams")).cast("double") /
            (col("tf") * 4L * col("t_grams") + col("t_grams") +
              col("dl") * 3L * col("n_docs")).cast("double")))
    val pivots = phrases.zipWithIndex.map { case (p, i) =>
      sum(when(col("gram") === p, col("score"))).as(s"s${i + 1}")
    }
    val total = phrases.indices
      .map(i => coalesce(col(s"s${i + 1}"), lit(0.0)))
      .reduceLeft(_ + _) // FIXED left-to-right order, not an agg
    scored.groupBy(col(idCol), col("dl"))
      .agg(pivots.head, pivots.tail: _*)
      .withColumn("bm25", total)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** The DuckDB replay of [[rank]] over the `documents` table —
    * shared by the text_bm25 oracle (k=20) and the hybrid-retrieval
    * fusion oracle (k=50 subquery). Same bigram stream, same integer
    * rational per (doc, gram), same fixed-order coalesce total.
    */
  def rankSql(phrases: Seq[String], k: Int): String = {
    val inList = graft.SqlLit.list(phrases)
    val pivots = phrases.zipWithIndex.map { case (p, i) =>
      s"sum(CASE WHEN gram = ${graft.SqlLit.str(p)} THEN score END)" +
        s" AS s${i + 1}"
    }.mkString(",\n       | ")
    val total = phrases.indices
      .map(i => s"coalesce(s${i + 1}, 0.0)").mkString(" + ")
    s"""WITH base AS (
       | SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
       | FROM documents),
       |b2 AS (
       | SELECT doc_id, CAST(len(tk) - 1 AS BIGINT) AS dl, tk
       | FROM base WHERE len(tk) >= 2),
       |st AS (
       | SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(dl) AS BIGINT) AS t_grams FROM b2),
       |g AS (
       | SELECT doc_id, dl, tk[i] || ' ' || tk[i + 1] AS gram
       | FROM b2, unnest(range(1, len(tk))) AS u(i)),
       |tf AS (
       | SELECT doc_id, dl, gram, CAST(count(*) AS BIGINT) AS tf
       | FROM g WHERE gram IN ($inList) GROUP BY 1, 2, 3),
       |dfq AS (
       | SELECT gram, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |sc AS (
       | SELECT tf.doc_id, tf.dl, tf.gram,
       |  CAST(length(bin(n_docs // df)) - 1 AS DOUBLE) *
       |   (CAST(8 * tf * t_grams AS DOUBLE) /
       |    CAST(4 * tf * t_grams + t_grams + 3 * dl * n_docs AS DOUBLE))
       |  AS score
       | FROM tf JOIN dfq USING (gram) CROSS JOIN st),
       |pv AS (
       | SELECT doc_id, dl,
       | $pivots
       | FROM sc GROUP BY 1, 2)
       |SELECT doc_id, dl, ${phrases.indices.map(i => s"s${i + 1}")
          .mkString(", ")}, $total AS bm25
       |FROM pv ORDER BY bm25 DESC, doc_id LIMIT $k""".stripMargin
  }
}
