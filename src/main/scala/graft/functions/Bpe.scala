package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic greedy byte-pair-encoding over a fixed merges table —
 * the "count REAL tokens" upgrade for the chunking / packing /
 * budget-selection family (reference measures whitespace tokens
 * throughout, e.g. processors/mlb/batch_processor.py token budgeting;
 * a trained-tokenizer count is what an LLM data pipeline actually
 * budgets against).
 *
 * Encoding semantics (the classic priority walk, à la the original
 * subword-nmt / GPT-2 encoder loop, defined here exactly so the
 * DuckDB oracle can replay it):
 *   1. whitespace-pretokenize (`\s+`, empties dropped, case kept);
 *   2. each word starts as its codepoint sequence;
 *   3. repeatedly: find the APPLICABLE merge pair with the LOWEST
 *      rank, replace all its leftmost-non-overlapping occurrences,
 *      until no merge applies. A merge may CREATE a lower-rank pair
 *      (e.g. (e,y) firing enables (k,ey)); the per-step min-rank
 *      re-scan picks it up — a single sweep in rank order would not.
 *   4. document token stream = concatenation of per-word token lists.
 *
 * Scale shape: the merges table is a driver-side object shipped to
 * executors ONCE via [[Broadcast]] (a production 50k-merge vocab is
 * ~1 MB — broadcast, never a join side), and encoding is a map-only
 * native expression ([[graft.plans.BpeEncodeExpr]]) inside
 * WholeStageCodegen — no shuffle at any corpus size, no UDF closure
 * per row.
 */
object Bpe {

  /** Merge rules in rank order (rank = index). A deliberately small
    * demonstration vocab tuned to the synthetic `documents` corpus:
    * common engine words merge fully (table/scan/query/...), rare
    * ones stay split — the realistic BPE outcome. Includes the
    * ordering edge cases the spec pins: (k,ey) ranks ABOVE the (e,y)
    * merge that enables it, and "fast" requires (s,t) before (f,a)
    * despite list order. */
  val defaultMerges: Seq[(String, String)] = Seq(
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("k", "ey"),
    ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
    ("o", "r"), ("e", "r"), ("or", "d"), ("ord", "er"),
    ("i", "n"), ("w", "in"), ("d", "o"), ("win", "do"), ("windo", "w"),
    ("e", "y"),
    ("s", "t"), ("f", "a"), ("fa", "st"),
    ("g", "g"), ("a", "gg"),
    ("r", "o"), ("ro", "w"),
    ("h", "a"), ("ha", "s"), ("has", "h"),
    ("b", "a"), ("ba", "t"), ("c", "h"), ("bat", "ch"),
    ("q", "u"), ("qu", "er"), ("quer", "y"),
    ("st", "r"), ("e", "a"), ("str", "ea"), ("strea", "m"),
    ("or", "t"), ("s", "ort"),
    ("j", "o"), ("jo", "in"),
    ("c", "o"), ("co", "l"), ("u", "m"), ("col", "um"), ("colum", "n"),
    ("d", "a"), ("da", "ta"),
    ("t", "h"), ("th", "e"),
    ("a", "r"), ("p", "ar"), ("par", "t"), ("s", "par"), ("spar", "k"))

  def defaultVocab: BpeVocab = BpeVocab(defaultMerges)

  /** BPE token array of `c` under the broadcast vocab (map-only
    * native expression; array<string>). */
  def bpeTokens(c: Column, vocab: Broadcast[BpeVocab]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.BpeEncodeExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), vocab))

  /** BPE token count — the budget-measurement drop-in for
    * [[TextFunctions.tokenCount]]. */
  def bpeTokenCount(c: Column, vocab: Broadcast[BpeVocab]): Column =
    org.apache.spark.sql.functions.size(bpeTokens(c, vocab))

  /** Per-WORD token lists (array<array<string>>) — the decode-capable
    * encoding: the flat [[bpeTokens]] stream concatenates per-word
    * lists and so LOSES word boundaries (this vocab has no GPT-2-style
    * word-start marker); keeping the nesting preserves them. Same
    * pretokenizer (`\s+`, empties dropped), same per-word encoder —
    * flattening this equals the flat form (spec-pinned). The encode
    * expression runs interpreted inside the lambda (higher-order
    * functions don't codegen), still map-only per row. */
  def bpeTokensPerWord(c: Column, vocab: Broadcast[BpeVocab]): Column = {
    import org.apache.spark.sql.functions._
    transform(
      filter(split(trim(c), "\\s+"), w => w =!= ""),
      w => bpeTokens(w, vocab))
  }

  /** DETOKENIZE a per-word encoding: each word is the concatenation
    * of its subword pieces (merges only ever concatenate adjacent
    * pieces of the same word, so concatenation inverts them exactly),
    * words joined by single spaces. Losslessness contract:
    * `bpeDecode(bpeTokensPerWord(text)) == whitespace-normalized
    * text` — whitespace runs are the tokenizer's ONLY loss, by
    * design of the pretokenizer (t53 pins this corpus-wide). */
  def bpeDecode(nested: Column): Column = {
    import org.apache.spark.sql.functions._
    array_join(transform(nested, ws => array_join(ws, "")), " ")
  }
}

/**
 * GPT-2-style BYTE-LEVEL BPE (Radford et al. 2019, public method: the
 * `bytes_to_unicode` printable remap + byte-level merges). Codepoint
 * BPE ([[Bpe]]) has an unbounded base alphabet and cannot represent
 * arbitrary bytes — a web corpus contains text in every script; the
 * byte-level form's base vocabulary is EXACTLY 256 symbols, each byte
 * remapped to a printable codepoint (printable latin-1 bytes map to
 * themselves; the 68 others to 256+n in byte order — so 0x20 becomes
 * 'Ġ', the famous GPT-2 space marker), and any string whatsoever
 * encodes losslessly.
 *
 * Pretokenizer: segments matching `\s*\S+|\s+` — every word CARRIES
 * ITS LEADING WHITESPACE (the Ġ-prefix convention) and a trailing
 * whitespace run survives as its own segment, so concatenating
 * decoded segments reproduces the input EXACTLY, whitespace runs
 * included (the loss [[Bpe]]'s `\s+` pretokenizer accepts by design).
 *
 * Same scale shape as [[Bpe]]: broadcast merges table, map-only
 * encode through the same [[graft.plans.BpeEncodeExpr]] native
 * expression (the vocab's `byteLevel` flag only swaps the initial
 * symbol split and the pretokenizer — the priority merge walk is
 * identical).
 */
object ByteBpe {

  /** bytes_to_unicode: byte value → its printable symbol (one
    * codepoint each). */
  val byteToChar: Array[String] = {
    val printable =
      ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (printable(b)) new String(Character.toChars(b))
      else { val c = new String(Character.toChars(256 + n)); n += 1; c }
    }.toArray
  }

  private val charToByte: java.util.HashMap[Integer, java.lang.Byte] = {
    val m = new java.util.HashMap[Integer, java.lang.Byte](512)
    byteToChar.zipWithIndex.foreach { case (s, b) =>
      m.put(s.codePointAt(0), b.toByte)
    }
    m
  }

  /** The full symbol remap of a string's UTF-8 bytes — used to author
    * merges over multi-byte characters and to generate oracle SQL
    * literals from the SAME table the engine runs. */
  def sym(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => byteToChar(b & 0xff)).mkString

  /** One symbol token per UTF-8 byte of the segment. */
  def symbolTokens(segment: String): ArrayBuffer[String] = {
    val bytes = segment.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val buf = new ArrayBuffer[String](bytes.length)
    var i = 0
    while (i < bytes.length) { buf += byteToChar(bytes(i) & 0xff); i += 1 }
    buf
  }

  /** Inverse of the remap: token stream → bytes → UTF-8 string.
    * Lossless for any input (spec-pinned on multi-byte fixtures). */
  def decode(tokens: Seq[String]): String = {
    val out = new java.io.ByteArrayOutputStream()
    tokens.foreach { t =>
      var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        val b = charToByte.get(cp)
        require(b != null, s"not a byte-level BPE symbol: U+${cp.toHexString}")
        out.write(b.toInt)
        i += Character.charCount(cp)
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Decode column form (array<string> of byte-level tokens → text).
    * A UDF is acceptable here: decode is an evaluation/round-trip
    * surface (byte remap + UTF-8 decode has no builtin), never the
    * hot encode path. */
  def byteBpeDecode(c: Column): Column = {
    val f = org.apache.spark.sql.functions.udf((toks: Seq[String]) => decode(toks))
    f(c)
  }

  /** Byte-level demo merges over the synthetic corpus + the t61
    * multilingual suffix: Ġ-prefixed whole-word merges (the GPT-2
    * shape), word-initial merges, and CROSS-BYTE merges that fuse the
    * two UTF-8 bytes of é/ü and the three of € into single tokens —
    * the representational case codepoint BPE cannot express at all. */
  val defaultMerges: Seq[(String, String)] = {
    // per-BYTE symbols of the multi-byte fixture chars (NOT sym(),
    // which would remap the remapped chars' own UTF-8 bytes again)
    val ea = "é".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => byteToChar(b & 0xff)) // Ã, ©
    val ue = "ü".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => byteToChar(b & 0xff)) // Ã, ¼
    val eu = "€".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => byteToChar(b & 0xff)) // â, chr(256+36), ¬
    Seq(
      ("Ġ", "t"), ("Ġt", "h"), ("Ġth", "e"),
      ("t", "h"), ("th", "e"),
      ("i", "n"), ("e", "r"), ("o", "r"), ("a", "n"), ("an", "d"),
      ("Ġ", "a"), ("Ġa", "n"), ("Ġan", "d"),
      ("Ġ", "s"), ("Ġ", "c"), ("Ġ", "f"),
      (ea(0), ea(1)), // 0xC3 0xA9 = é as one token
      (ue(0), ue(1)), // 0xC3 0xBC = ü
      ("c", "a"), ("ca", "f"), ("caf", sym("é")),
      ("Ġc", "a"), ("Ġca", "f"), ("Ġcaf", sym("é")),
      (eu(0), eu(1)), (eu(0) + eu(1), eu(2)), // € fuses byte-by-byte
      ("1", "0"), ("10", "0"),
      ("Ġ", "1"), ("Ġ1", "0"), ("Ġ10", "0"))
  }

  def defaultVocab: BpeVocab = BpeVocab(defaultMerges, byteLevel = true)
}

/** The broadcastable merges table + the encoder loop. Plain
  * serializable data; the rank map rebuilds lazily per executor. */
case class BpeVocab(
    merges: Seq[(String, String)], byteLevel: Boolean = false) {
  require(merges.distinct.size == merges.size, "duplicate merge pair")

  // NUL cannot appear inside a merge symbol, so it is a safe flat-key
  // separator; kept as an ESCAPE (not a raw byte) so the source stays
  // text for diff/grep tooling
  private val PairSep = "\u0000"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    // flat NUL-separated keys: one hash lookup per adjacent pair in
    // the hot loop, no tuple allocation
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) => m.put(a + PairSep + b, r) }
    m
  }

  private def charTokens(word: String): ArrayBuffer[String] = {
    val buf = new ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      buf += word.substring(i, i + n)
      i += n
    }
    buf
  }

  /** Priority-BPE encode of one pretokenized word (byte-level vocabs
    * start from the 256-symbol byte remap instead of codepoints). */
  def encodeWord(word: String): ArrayBuffer[String] = {
    var toks = if (byteLevel) ByteBpe.symbolTokens(word) else charTokens(word)
    var done = toks.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.get(toks(i) + PairSep + toks(i + 1))
        if (r != null && r < bestRank) {
          bestRank = r; bestA = toks(i); bestB = toks(i + 1)
        }
        i += 1
      }
      if (bestA == null) done = true
      else {
        val out = new ArrayBuffer[String](toks.length)
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == bestA && toks(j + 1) == bestB) {
            out += bestA + bestB; j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out
        done = toks.length < 2
      }
    }
    toks
  }

  /** Pretokenize + encode; the full document token stream. Codepoint
    * vocabs drop whitespace (`\s+` split); byte-level vocabs use the
    * LOSSLESS `\s*\S+|\s+` segmenter — every word carries its leading
    * whitespace (the Ġ-prefix convention) and trailing whitespace
    * survives as its own segment, so concatenating decoded tokens
    * reproduces the input exactly. */
  def encode(text: String): ArrayBuffer[String] = {
    val out = ArrayBuffer.empty[String]
    if (byteLevel) {
      val m = BpeVocab.SegmentRe.matcher(text)
      while (m.find()) out ++= encodeWord(m.group())
    } else {
      val t = text.trim
      if (t.nonEmpty) t.split("\\s+").foreach { w => if (w.nonEmpty) out ++= encodeWord(w) }
    }
    out
  }

  /** Codegen entry point: UTF8String in, catalyst array of UTF8String
    * out (called from [[graft.plans.BpeEncodeExpr]] generated code). */
  def encodeUtf8(text: UTF8String): GenericArrayData = {
    val toks = encode(text.toString)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }
}

object BpeVocab {
  /** The byte-level lossless segmenter: `\s*\S+|\s+`. */
  private[functions] val SegmentRe =
    java.util.regex.Pattern.compile("\\s*\\S+|\\s+")
}
