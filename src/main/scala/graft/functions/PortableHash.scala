package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/**
 * Driver/executor-side twin of [[ScalarFunctions.md5Long]]: the same
 * portable 60-bit md5-prefix hash as a pure Scala function, for code
 * that runs outside Catalyst (typed folds, simhash UDF, hyperplane
 * generation). Keeping one definition of "the hash" on both sides is
 * what makes LSH bucketing reproducible between the column path, the
 * typed path, and the external SQL oracle.
 */
object PortableHash {

  // MessageDigest is not thread-safe and getInstance() allocates; a
  // thread-local instance keeps the per-token hash path (simhash over
  // millions of tokens) allocation-free.
  private val md5Digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** First 15 hex chars of md5, parsed base-16 → non-negative 60-bit
    * long (= top 60 bits of the digest). */
  def md5Long(s: String): Long = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // first 15 hex chars = first 7.5 bytes, big-endian
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /**
   * 60-bit SimHash over a token multiset: per token take the portable
   * hash, accumulate +1/-1 per bit, emit the sign bits. Hamming-close
   * signatures ⇒ similar token distributions (Charikar 2002, public).
   */
  def simhash60(tokens: Iterable[String]): Long = {
    val w = new Array[Int](60)
    tokens.foreach { t =>
      val h = md5Long(t)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) w(j) += 1 else w(j) -= 1
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (w(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Mersenne prime 2³¹−1: modulus of the MinHash permutation family. */
  val MinhashP = 2147483647L

  /**
   * Deterministic per-seed (a, b) of the universal hash family
   * hᵢ(x) = (aᵢ·x + bᵢ) mod p applied to the 31-bit base hash
   * (md5Long & (2³¹−1)). One md5 per shingle plus numHashes cheap
   * multiply-adds replaces numHashes md5 calls — the dominant MinHash
   * cost at corpus scale. Constants derive from md5 of the seed index
   * so any engine regenerates them bit-for-bit:
   * a = md5_60("a:i") mod (p−1) + 1, b = md5_60("b:i") mod p.
   * 31-bit operands keep a·x+b < 2⁶² — no 64-bit overflow in Spark
   * and no overflow ERROR in the DuckDB oracle (which, unlike the
   * JVM, refuses to wrap BIGINT arithmetic).
   */
  def minhashParams(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { i =>
      (md5Long(s"a:$i") % (MinhashP - 1) + 1, md5Long(s"b:$i") % MinhashP)
    }

  /** [[simhash60]] over a catalyst ArrayData of UTF8Strings — the
    * entry point [[SimHash60Expr]]'s generated code calls directly
    * (no Seq materialization, no UDF serialization boundary). */
  def simhash60FromArrayData(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val w = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Long(arr.getUTF8String(i).toString)
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) w(j) += 1 else w(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (w(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
