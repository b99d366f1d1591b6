package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * WordPiece tokenization (Wu et al. 2016 / the BERT tokenizer, public
 * method) — the THIRD tokenizer family next to BPE ([[Bpe]]) and
 * unigram-LM ([[graft.operators.UnigramLm]]): greedy
 * LONGEST-MATCH-FIRST segmentation against a fixed piece inventory,
 * where non-initial pieces carry the `##` continuation prefix and a
 * word with NO valid segmentation collapses to a single `[UNK]`
 * token (the all-or-nothing BERT rule — partial matches are
 * discarded, never emitted).
 *
 * Unlike BPE's priority merge walk or unigram's Viterbi, WordPiece
 * encoding needs no scores at all — one set lookup per candidate
 * prefix, longest first — which is why BERT serving stacks use it.
 *
 * Scale shape: identical to [[Bpe]] — the piece set ships once per
 * executor via [[Broadcast]] and encoding is the map-only native
 * expression [[graft.plans.WordPieceEncodeExpr]] inside
 * WholeStageCodegen; no shuffle at any corpus size.
 */
object WordPiece {

  val Unk = "[UNK]"

  /** Demo inventory tuned to the synthetic corpus + the t64 fixture:
    * every letter as a word-initial single, every letter EXCEPT `z`
    * as a `##` continuation (so a non-initial `z` forces `[UNK]`),
    * plus multi-char pieces that make frequent corpus words segment
    * the way a trained BERT vocab would. */
  val defaultPieces: Seq[String] = {
    val letters = ('a' to 'z').map(_.toString)
    val initials = letters
    val continuations = letters.filterNot(_ == "z").map("##" + _)
    val multis = Seq(
      "tab", "##le", "scan", "join", "hash", "row", "batch",
      "quer", "cust", "##omer", "the", "wind", "##ow",
      "str", "##eam", "fast", "data", "##base", "zebra",
      "##er", "##ing", "filt", "sort", "merge", "group")
    initials ++ continuations ++ multis
  }

  def defaultVocab: WordPieceVocab = WordPieceVocab(defaultPieces)

  /** WordPiece token array of `c` under the broadcast vocab (map-only
    * native expression; array<string>). */
  def wordPieceTokens(c: Column, vocab: Broadcast[WordPieceVocab]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.WordPieceEncodeExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), vocab))
}

/** The broadcastable piece inventory + the greedy encoder. */
case class WordPieceVocab(pieces: Seq[String]) {
  require(pieces.distinct.size == pieces.size, "duplicate piece")

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.size * 2)
    pieces.foreach(s.add)
    s
  }

  /** Longest piece BODY length in codepoints (`##` prefix excluded). */
  @transient private lazy val maxBodyLen: Int =
    pieces.map { p =>
      val b = if (p.startsWith("##")) p.substring(2) else p
      b.codePointCount(0, b.length)
    }.max

  /** Greedy longest-match-first encode of one pretokenized word. */
  def encodeWord(word: String): ArrayBuffer[String] = {
    val out = ArrayBuffer.empty[String]
    if (word.isEmpty) return out
    // codepoint boundaries (surrogate-safe, the house discipline)
    val bnd = {
      val b = new ArrayBuffer[Int](word.length + 1)
      var i = 0
      while (i < word.length) { b += i; i += Character.charCount(word.codePointAt(i)) }
      b += word.length
      b
    }
    val L = bnd.length - 1
    var i = 0
    while (i < L) {
      var j = math.min(L, i + maxBodyLen)
      var found: String = null
      while (j > i && found == null) {
        val body = word.substring(bnd(i), bnd(j))
        val cand = if (i == 0) body else "##" + body
        if (set.contains(cand)) found = cand else j -= 1
      }
      if (found == null) { // all-or-nothing: the WHOLE word is [UNK]
        out.clear()
        out += WordPiece.Unk
        return out
      }
      out += found
      i = j
    }
    out
  }

  /** Whitespace-pretokenize (`\s+`, empties dropped — the [[Bpe]]
    * discipline) + encode; the full document token stream. */
  def encode(text: String): ArrayBuffer[String] = {
    val out = ArrayBuffer.empty[String]
    val t = text.trim
    if (t.nonEmpty) t.split("\\s+").foreach { w => if (w.nonEmpty) out ++= encodeWord(w) }
    out
  }

  /** Codegen entry point (the [[BpeVocab.encodeUtf8]] shape). */
  def encodeUtf8(text: UTF8String): GenericArrayData = {
    val toks = encode(text.toString)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }
}
