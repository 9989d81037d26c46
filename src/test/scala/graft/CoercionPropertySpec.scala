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
