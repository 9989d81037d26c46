package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the real
  * token-budget unit a training pipeline plans in, replacing the
  * regex proxy in [[TextFunctions.bpeCount]].
  *
  * Two halves:
  *
  *  - '''apply''' ([[tokenCount]] / [[BpeTokensExpr]]): greedy
  *    merge-table encoding as a codegen'd Catalyst expression. The
  *    algorithm is the standard one: repeatedly find the
  *    lowest-rank merge whose pair is adjacent in the token list and
  *    merge its leftmost occurrence, until no merge applies. Per-word
  *    results are memoized in a bounded executor-side cache —
  *    natural-language word frequency is Zipfian, so the hit rate
  *    approaches 1 and the effective cost is O(distinct words), not
  *    O(word occurrences), WITHOUT the shuffle a distinct-words +
  *    join-back formulation would pay. Nothing leaves the scan stage.
  *
  *  - '''train''' ([[train]]): learns a merge table from a corpus.
  *    One distributed word-frequency aggregation (map-side combine;
  *    only (word, count) pairs shuffle), then the classic in-memory
  *    merge loop over the bounded top-`maxVocab` word-frequency
  *    table on the driver — the same bounded-sample pattern as IVF
  *    k-means training. Deterministic: ties in pair count break
  *    lexicographically, ties in word count break on the word.
  *
  * The gated query uses [[DemoMerges]], a fixed embedded merge table
  * standing in for a public vocabulary file (no network egress in
  * this environment); the DuckDB oracle re-applies the IDENTICAL
  * table with a recursive CTE, so the gate proves the apply
  * algorithm end-to-end. `train` is spec-proven against a
  * hand-computed corpus and by encode-consistency.
  */
object Bpe {

  /** Fixed demo merge table (rank = position). A stand-in for a
    * published vocab: layered English merges so real chains fire
    * (t+h -> th, th+e -> the; i+n -> in, in+g -> ing; w+i, wi+th).
    */
  val DemoMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "e" -> "n", "a" -> "t",
    "o" -> "r", "e" -> "s", "s" -> "t", "a" -> "r", "o" -> "u",
    "l" -> "e", "i" -> "s", "i" -> "t", "a" -> "l", "in" -> "g",
    "e" -> "d", "t" -> "o", "o" -> "f", "c" -> "h", "s" -> "e",
    "n" -> "t", "t" -> "i", "d" -> "e", "l" -> "l", "r" -> "o",
    "u" -> "r", "h" -> "e", "m" -> "e", "b" -> "e", "a" -> "s",
    "w" -> "i", "wi" -> "th", "e" -> "a", "o" -> "m", "u" -> "s",
    "l" -> "o", "c" -> "o", "co" -> "m", "p" -> "r", "e" -> "t",
    "u" -> "n", "q" -> "u", "qu" -> "e", "s" -> "u", "su" -> "m")

  /** Split a word into its code points (DuckDB's substring(w, i, 1)
    * counts code points, so the two sides must agree above BMP).
    */
  private[functions] def codePoints(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Encode one word: merge the leftmost occurrence of the
    * lowest-rank adjacent pair until no merge applies.
    */
  def encodeWord(word: String, rank: Map[(String, String), Int]): List[String] = {
    var toks = codePoints(word).toList
    var done = false
    while (!done && toks.lengthCompare(1) > 0) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      var rest = toks
      while (rest.tail.nonEmpty) {
        val r = rank.getOrElse((rest.head, rest.tail.head), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
        rest = rest.tail
      }
      if (bestIdx < 0) done = true
      else {
        val (pre, post) = toks.splitAt(bestIdx)
        toks = pre ::: (post.head + post.tail.head) :: post.tail.tail
      }
    }
    toks
  }

  /** Train a merge table: distributed word-frequency aggregation,
    * then the classic merge loop over the bounded driver-side
    * frequency table (the one justified `.collect()` — `maxVocab`
    * rows of (word, count), same pattern as IVF k-means training).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 65536): Seq[(String, String)] = {
    val t = lower(trim(col(textCol)))
    val freq = docs
      .where(length(t) > 0)
      .select(explode(split(t, "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainInMemory(freq.toSeq, numMerges)
  }

  /** The in-memory merge loop, exposed for the spec's hand-computed
    * corpus. Stops early when no pair occurs at least twice (weighted).
    */
  def trainInMemory(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var vocab: Seq[(List[String], Long)] =
      wordFreq.map { case (w, c) => (codePoints(w).toList, c) }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (toks, c) =>
        toks.lazyZip(toks.tail).foreach { (a, b) =>
          counts((a, b)) = counts.getOrElse((a, b), 0L) + c
        }
      }
      val live = counts.filter(_._2 >= 2L)
      if (live.isEmpty) exhausted = true
      else {
        // Deterministic argmax: count desc, then pair lexicographic.
        val best = live.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (toks, c) => (mergeAll(toks, best), c) }
        m += 1
      }
    }
    merges.result()
  }

  /** Merge every left-to-right non-overlapping occurrence of `pair`. */
  private def mergeAll(toks: List[String], pair: (String, String)): List[String] =
    toks match {
      case a :: b :: rest if (a, b) == pair => (a + b) :: mergeAll(rest, pair)
      case a :: rest                        => a :: mergeAll(rest, pair)
      case Nil                              => Nil
    }

  /** Count BPE tokens of a whole document under `merges` (lowercased,
    * whitespace-pretokenized, per-word greedy encode). Codegen'd.
    */
  def tokenCount(text: Column, merges: Seq[(String, String)] = DemoMerges): Column =
    graftShim.column(BpeTokensExpr(graftShim.expression(text), merges))
}

/** Runtime kernel: holds the rank table and the bounded memo cache.
  * Shipped to executors as a codegen reference object; the memo is a
  * ConcurrentHashMap because one instance may serve several tasks.
  */
class BpeKernel(merges: Seq[(String, String)]) extends Serializable {
  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap
  @transient private lazy val memo = new ConcurrentHashMap[String, java.lang.Long]()
  private val MemoCap = 1 << 20 // bound executor memory on adversarial vocab

  private def wordTokens(w: String): Long = {
    val hit = memo.get(w)
    if (hit != null) hit.longValue()
    else {
      val n = Bpe.encodeWord(w, rank).length.toLong
      if (memo.size < MemoCap) memo.put(w, n)
      n
    }
  }

  /** Whole-document count: lower, trim, split on whitespace, sum the
    * per-word memoized encodes. Empty/blank text counts 0 tokens.
    */
  def countTokens(text: UTF8String): Long = {
    // Locale.ROOT: a locale-sensitive lowercase (e.g. Turkish dotted I)
    // would diverge from Spark's locale-independent lower() used for
    // n_words and from the DuckDB oracle (ADVICE r9)
    val t = text.toString.toLowerCase(java.util.Locale.ROOT).trim
    if (t.isEmpty) 0L
    else {
      var sum = 0L
      t.split("\\s+").foreach(w => sum += wordTokens(w))
      sum
    }
  }
}

case class BpeTokensExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens requires a string input, got ${child.dataType}")
  override def prettyName: String = "bpe_tokens"

  @transient private lazy val kernel = new BpeKernel(merges)

  override protected def nullSafeEval(input: Any): Any =
    kernel.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeKernel", kernel, classOf[BpeKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokensExpr =
    copy(child = newChild)
}
