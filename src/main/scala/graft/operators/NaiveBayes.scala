package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes document classifier over hashed token
  * features — the in-engine supervised scoring step a training-data
  * pipeline uses for domain/quality/language classification (the
  * fastText-linear-classifier niche: CCNet trains one to pick
  * Wikipedia-like text; quality filters score billions of docs with
  * one). Everything is Spark relational algebra — no driver-side
  * model object, no MLlib dependency.
  *
  * Determinism contract (the SURVEY §11 discipline): log-likelihoods
  * are DYADIC — floor(log2 x) = length(bin(x)) − 1, integers end to
  * end — so scores are exact BIGINTs, the argmax is reproducible on
  * any engine, and the DuckDB oracle replays training AND scoring
  * bit-for-bit. This quantizes the classic real-valued NB
  * log-likelihood (a documented deviation, like text_lm_score): with
  * Laplace smoothing,
  *   score(d, c) = Σ_t∈d floor(log2(cnt(b(t), c) + 1))
  *               − |d| · floor(log2(tot_c + B))
  *               + floor(log2(docs_c))
  * where b(t) is the md5 feature bucket (portable: first 8 hex digits
  * of md5("tok:seed") mod B — the Sampling.portableBucket kernel) and
  * B the bucket count. Missing (bucket, class) pairs contribute
  * floor(log2(0 + 1)) = 0, so the per-class sum needs only the SPARSE
  * observed pairs — the join below exploits exactly that.
  *
  * Scale shape (100 TB corpus, 1000 executors):
  *  - TRAIN is one shuffle of (bucket, label) partial counts —
  *    map-side combine collapses each partition to ≤ B·|classes|
  *    rows before the exchange; text never shuffles.
  *  - The MODEL is a bounded relation (≤ B·|classes| rows, B chosen
  *    ~4k-64k) — broadcast to every executor, never collected.
  *  - SCORING is embarrassingly parallel: explode tokens in the scan
  *    stage, hash-join the broadcast model, one (doc_id, label)
  *    partial-agg shuffle of integer pairs, then a per-doc argmax
  *    window partitioned BY doc_id (no global window).
  *  - The doc × classes frame is a bounded crossJoin (|classes| rows
  *    broadcast), the same justified pattern as StatTests' contingency
  *    densification.
  */
object NaiveBayes {

  /** Portable feature bucket: first 8 hex digits of md5("tok:seed")
    * as an integer, mod nBuckets — decodable positionally by any
    * engine with md5 (the Sampling.portableBucket kernel with a
    * parametric modulus).
    */
  def featureBucket(tok: Column, seed: Long, nBuckets: Int): Column =
    pmod(conv(substring(md5(concat_ws(":", tok, lit(seed))), 1, 8), 16, 10)
      .cast("long"), lit(nBuckets.toLong))

  /** Lowercased whitespace tokens; empty/blank text → empty array
    * (Spark's split of "" would yield [""]).
    */
  def tokensOf(text: Column): Column =
    when(length(trim(text)) === 0, typedlit(Seq.empty[String]))
      .otherwise(split(lower(trim(text)), "\\s+"))

  /** floor(log2 x) for x ≥ 0 via minimal-binary length — no libm. */
  private def log2floor(c: Column): Column =
    length(bin(c)).cast("long") - 1L

  /** Trained model as two bounded relations. */
  final case class Model(
      counts: DataFrame,  // (bucket, label, cnt) — sparse, ≤ B·|classes|
      classes: DataFrame, // (label, n_docs, tot_tokens)
      nBuckets: Int, seed: Long)

  /** One-shuffle training pass: hashed-token counts per class + class
    * document/token totals.
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            seed: Long = 11L, nBuckets: Int = 4096): Model = {
    val toks = docs
      .select(col(labelCol).as("label"),
        explode(tokensOf(col(textCol))).as("tok"))
      .select(col("label"), featureBucket(col("tok"), seed, nBuckets).as("bucket"))
    val counts = toks.groupBy("bucket", "label")
      .agg(count(lit(1)).as("cnt"))
    val perDoc = docs.select(col(labelCol).as("label"),
      size(tokensOf(col(textCol))).cast("long").as("n"))
    val classes = perDoc.groupBy("label")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("tot_tokens"))
    Model(counts, classes, nBuckets, seed)
  }

  /** Score + argmax. Output: one row per input doc —
    * (idCol, n_tokens, pred, score); ties broken by smallest label
    * (deterministic).
    */
  def classify(model: Model, docs: DataFrame, idCol: String,
               textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(tokensOf(col(textCol))).as("tok"))
      .select(col(idCol),
        featureBucket(col("tok"), model.seed, model.nBuckets).as("bucket"))
    // sparse per-(doc, class) evidence: absent pairs add log2(1) = 0
    val hits = toks
      .join(broadcast(model.counts), "bucket")
      .groupBy(col(idCol), col("label"))
      .agg(sum(log2floor(col("cnt") + 1L)).as("hsum"))
    val base = docs
      .select(col(idCol), size(tokensOf(col(textCol))).cast("long").as("n_tokens"))
      .crossJoin(broadcast(model.classes)) // bounded: |classes| rows
      .join(hits, Seq(idCol, "label"), "left")
      .withColumn("score",
        coalesce(col("hsum"), lit(0L)) +
          log2floor(col("n_docs")) -
          col("n_tokens") *
            log2floor(coalesce(col("tot_tokens"), lit(0L)) + model.nBuckets.toLong))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("label").asc)
    base.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("n_tokens"), col("label").as("pred"),
        col("score"))
  }
}
