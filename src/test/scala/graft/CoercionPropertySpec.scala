package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Fnv1a64
import org.apache.spark.unsafe.types.UTF8String

/** Property-style tests for the pure kernels (raw scalacheck Gen — the
  * scalatest bridge isn't on the classpath). The Column versions are
  * exercised in EtlSpec/FingerprintSpec; these pin the algebraic
  * properties the reference relies on, over generated inputs.
  */
class CoercionPropertySpec extends SparkFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("uint32 mask semantics match Python's `& 0xFFFFFFFF` (main.py:89)") {
    samples(Gen.long).foreach { x =>
      val masked = x & 0xFFFFFFFFL
      assert(masked >= 0L && masked <= 4294967295L)
      assert((masked & 0xFFFFFFFFL) == masked) // idempotent
      assert(((x - masked) % 4294967296L) == 0L) // congruent mod 2^32
    }
  }

  test("fnv1a64 on arbitrary strings matches byte-at-a-time reference") {
    def ref(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    samples(Gen.asciiPrintableStr).foreach { s =>
      assert(Fnv1a64.hash(UTF8String.fromString(s)) == ref(s))
    }
    // non-ascii: multi-byte UTF-8 sequences hash byte-wise too
    val multi = "héllo wörld — 你好"
    assert(Fnv1a64.hashString(multi) == ref(multi))
  }

  test("fused MinHash128 equals the declarative Column tree on random unicode") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // strings mixing whitespace runs, multibyte chars, and short/empty
    // shapes — the substring/byte-boundary edge cases
    // "𝄞" (U+1D11E) is a surrogate pair — the 4-byte-UTF-8 edge
    val gen = Gen.listOf(Gen.oneOf(
      Gen.const("a"), Gen.const("Z"), Gen.const("7"), Gen.const(" "),
      Gen.const("\t"), Gen.const("é"), Gen.const("語"),
      Gen.const(new String(Character.toChars(0x1D11E)))))
      .map(_.mkString)
    val docs = samples(gen, 200).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    val both = docs.select(
      graft.functions.MinHash128.signature(col("text")).as("fused"),
      graft.operators.Dedup.minhashSignature(
        graft.operators.Dedup.shingleHashes(col("text"))).as("ref"))
    assert(both.filter(col("fused") =!= col("ref")).count() == 0)
  }

  test("fused SimHash64 equals the documented token semantics on random unicode") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.const(' '), Gen.const('\n'),
      Gen.const('ß'), Gen.const('中')))
      .map(_.mkString)
    val docs = samples(gen, 200).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    // reference: per-token FNV votes over filter(split(lower, \s+))
    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val votes = (0 until 64).map { b =>
      aggregate(toks, lit(0L), (acc, t) =>
        acc + when(Fnv1a64.fingerprint(t).bitwiseAND(lit(1L << b)) =!= 0L, 1L)
          .otherwise(-1L))
    }
    val ref = votes.zipWithIndex.map { case (v, b) =>
      when(v >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val both = docs.select(
      graft.functions.SimHash64.simhash(col("text")).as("fused"), ref.as("ref"))
    assert(both.filter(col("fused") =!= col("ref")).count() == 0)
  }

  test("value-based type inference is total and matches main.py:39-54") {
    import graft.sources.{ChType, SchemaMapper}
    samples(Gen.long).foreach { l =>
      val t = SchemaMapper.fromValue(l)
      if (l < 0) assert(t == ChType.Int32)
      else if (l <= 4294967295L) assert(t == ChType.UInt32)
      else assert(t == ChType.UInt64)
    }
    samples(Gen.double).foreach { d =>
      assert(SchemaMapper.fromValue(d) == ChType.Float64)
    }
    samples(Gen.asciiStr).foreach { s =>
      assert(SchemaMapper.fromValue(s) == ChType.Str)
    }
  }
}
