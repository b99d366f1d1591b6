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

  def md5Hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** First 15 hex chars of md5, parsed base-16 → non-negative 60-bit long. */
  def md5Long(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

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
}
