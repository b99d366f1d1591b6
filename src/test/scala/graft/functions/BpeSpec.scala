package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pinned expectations + invariants for the greedy-priority BPE
  * encoder ([[Bpe]] / [[graft.plans.BpeEncodeExpr]]). The pinned
  * words cover the semantics the DuckDB oracle must reproduce:
  * rank-priority ordering, merge-created lower-rank pairs, and
  * leftmost-non-overlapping merge-all. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val v = Bpe.defaultVocab

  test("pinned encodings: priority ordering and created pairs") {
    // plain bottom-up merges
    assert(v.encodeWord("table").toSeq === Seq("table"))
    assert(v.encodeWord("scan").toSeq === Seq("scan"))
    // (k,ey) ranks ABOVE (e,y) yet only applies after it fires —
    // the priority re-scan must pick up the created pair
    assert(v.encodeWord("key").toSeq === Seq("key"))
    // "fast": (s,t) rank 22 fires before (f,a) rank 23, then (fa,st)
    assert(v.encodeWord("fast").toSeq === Seq("fast"))
    // partial merges stay split like real BPE on rare words
    assert(v.encodeWord("filter").toSeq === Seq("f", "i", "l", "t", "er"))
    assert(v.encodeWord("group").toSeq === Seq("g", "ro", "u", "p"))
    // leftmost-non-overlapping merge-all: st|st|st, not st|s|t|st
    assert(v.encodeWord("ststst").toSeq === Seq("st", "st", "st"))
    // unknown characters pass through as singletons
    assert(v.encodeWord("zzz").toSeq === Seq("z", "z", "z"))
  }

  test("document encode: whitespace pretokenization and edge cases") {
    assert(v.encode("fast key  table").toSeq === Seq("fast", "key", "table"))
    assert(v.encode("").isEmpty)
    assert(v.encode("   ").isEmpty)
    // concatenating tokens of each word reconstructs the word: BPE
    // never drops or invents characters
    for (w <- Seq("customer", "stream", "spark", "query", "keykey", "aggag"))
      assert(v.encodeWord(w).mkString === w)
  }

  test("expression path equals driver-side encode and stays map-only") {
    val docs = Seq((1L, "fast key table"), (2L, ""), (3L, "query stream zz"))
      .toDF("doc_id", "text")
    val bcast = spark.sparkContext.broadcast(v)
    val got = docs.select(col("doc_id"), Bpe.bpeTokens(col("text"), bcast).as("t"),
        Bpe.bpeTokenCount(col("text"), bcast).as("n"))
      .orderBy("doc_id")
      .as[(Long, Seq[String], Int)].collect()
    assert(got(0) === ((1L, Seq("fast", "key", "table"), 3)))
    assert(got(1) === ((2L, Seq.empty[String], 0)))
    assert(got(2) === ((3L, Seq("query", "stream", "z", "z"), 4)))
    // narrow plan: tokenization must never shuffle
    val plan = docs.select(Bpe.bpeTokens(col("text"), bcast))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"BPE encode plan shuffles:\n$plan")
  }

  test("per-word encode flattens to the flat stream; decode inverts to normalized text") {
    val bcast = spark.sparkContext.broadcast(v)
    val docs = Seq(
      (1L, "fast key table"),
      (2L, "  query\t\tstream zz  "),   // mixed whitespace runs
      (3L, ""),                          // empty doc
      (4L, "one"),                       // single word
      (5L, "Spark sort join column"))    // case kept, full merges
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Bpe.bpeTokensPerWord(col("text"), bcast).as("nested"),
        Bpe.bpeTokens(col("text"), bcast).as("flat"),
        regexp_replace(trim(col("text")), "\\s+", " ").as("norm"))
      .withColumn("decoded", Bpe.bpeDecode(col("nested")))
      .select("doc_id", "nested", "flat", "decoded", "norm")
      .orderBy("doc_id")
      .as[(Long, Seq[Seq[String]], Seq[String], String, String)].collect()
    got.foreach { case (id, nested, flat, decoded, norm) =>
      assert(nested.flatten === flat,
        s"doc $id: per-word encode must flatten to the flat stream")
      assert(decoded === norm,
        s"doc $id: decode must invert to whitespace-normalized text")
    }
    // word-boundary preservation the FLAT stream cannot offer: 'ta'+'b'
    // ('tab' unfinished merge chains aside) — adjacent words must not
    // merge across the boundary in the nested form
    val tricky = Seq((1L, "ta b")).toDF("doc_id", "text")
      .select(Bpe.bpeDecode(Bpe.bpeTokensPerWord(col("text"), bcast)))
      .as[String].head()
    assert(tricky === "ta b", "decode must preserve word boundaries")
  }
}

/** WordPiece ([[WordPiece]], the BERT tokenizer) — greedy
  * longest-match-first, ## continuations, the all-or-nothing [UNK]
  * rule, and the codegen expression path. */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val v = WordPiece.defaultVocab

  test("greedy longest-match: whole-word pieces beat char chains; continuations carry ##") {
    assert(v.encodeWord("table").toSeq === Seq("tab", "##le"))
    assert(v.encodeWord("join").toSeq === Seq("join"))
    assert(v.encodeWord("query").toSeq === Seq("quer", "##y"))
    assert(v.encodeWord("customer").toSeq === Seq("cust", "##omer"))
    assert(v.encodeWord("window").toSeq === Seq("wind", "##ow"))
    // longest FIRST: 'datab…' prefers the 4-char 'data' over 'd'
    assert(v.encodeWord("database").toSeq === Seq("data", "##base"))
    // unknown words degrade to char pieces, never fail while ## singles exist
    assert(v.encodeWord("xq").toSeq === Seq("x", "##q"))
  }

  test("all-or-nothing [UNK]: a dead-end discards partial matches") {
    // 'buzz': b ##u then ##z missing → the WHOLE word is one [UNK]
    assert(v.encodeWord("buzz").toSeq === Seq("[UNK]"))
    // word-initial z is fine ('zebra' is even a whole-word piece)
    assert(v.encodeWord("zebra").toSeq === Seq("zebra"))
    assert(v.encodeWord("z").toSeq === Seq("z"))
    assert(v.encode("the buzz zebra").toSeq === Seq("the", "[UNK]", "zebra"))
  }

  test("expression path equals driver-side encode and stays shuffle-free") {
    val docs = Seq((1L, "table query buzz"), (2L, "")).toDF("doc_id", "text")
    val bcast = spark.sparkContext.broadcast(v)
    val got = docs.select(col("doc_id"),
        WordPiece.wordPieceTokens(col("text"), bcast).as("t"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    assert(got(0)._2 === Seq("tab", "##le", "quer", "##y", "[UNK]"))
    assert(got(1)._2 === Seq.empty[String])
    val plan = docs.select(WordPiece.wordPieceTokens(col("text"), bcast))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"WordPiece encode plan shuffles:\n$plan")
  }
}

/** Byte-level BPE ([[ByteBpe]], GPT-2 bytes_to_unicode): the 256-way
  * remap, hand-pinned encodes with the Ġ space marker, and the
  * LOSSLESS round-trip on inputs codepoint BPE cannot represent. */
class ByteBpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val v = ByteBpe.defaultVocab

  test("bytes_to_unicode is a bijection onto printable codepoints") {
    assert(ByteBpe.byteToChar.length === 256)
    assert(ByteBpe.byteToChar.distinct.length === 256)
    // every symbol is one codepoint and never whitespace/control
    ByteBpe.byteToChar.foreach { s =>
      val cp = s.codePointAt(0)
      assert(Character.charCount(cp) === s.length)
      assert(!Character.isWhitespace(cp) && !Character.isISOControl(cp))
    }
    // the famous anchors: space → Ġ, printable ASCII identity
    assert(ByteBpe.byteToChar(0x20) === "Ġ")
    assert(ByteBpe.byteToChar('a'.toInt) === "a")
    assert(ByteBpe.byteToChar('~'.toInt) === "~")
  }

  test("pinned encodes: Ġ-prefixed words, cross-byte merges, OOV bytes") {
    // " the" merges through the space marker; word-initial 'the' too
    assert(v.encode(" the").toSeq === Seq("Ġthe"))
    assert(v.encode("the").toSeq === Seq("the"))
    // é is TWO bytes (0xC3 0xA9) fused by the (Ã,©) merge, then the
    // word-level chain caf+é completes — ONE token (in symbol space,
    // é renders as its two remapped bytes Ã©) for a word codepoint
    // BPE's demo vocab cannot even represent
    assert(v.encode(" café").toSeq === Seq(ByteBpe.sym(" café")))
    assert(v.encode("café").toSeq === Seq(ByteBpe.sym("café")))
    // € is THREE bytes fused byte-by-byte into one token
    assert(v.encode("€").toSeq === Seq(ByteBpe.sym("€")))
    // an unmerged multi-byte char stays as its byte symbols
    assert(v.encode("ñ").toSeq === ByteBpe.symbolTokens("ñ").toSeq)
  }

  test("round-trip is LOSSLESS on whitespace runs and multi-byte text") {
    val fixtures = Seq(
      "the quick  fox", // double space — codepoint BPE loses this
      "  leading and trailing  ",
      "tabs\t\tand\nnewlines",
      "café über 100€",
      "mixed ASCII + ñ, 한국어, 日本語, emoji 😀 end",
      "", " ", "\n")
    fixtures.foreach { t =>
      val decoded = ByteBpe.decode(v.encode(t).toSeq)
      assert(decoded === t,
        s"round-trip must be exact for <${t.replace("\n", "\\n").replace("\t", "\\t")}>")
    }
  }

  test("expression path equals driver-side encode; decode column inverts it") {
    val bcast = spark.sparkContext.broadcast(v)
    val docs = Seq(
      (1L, "the café  test"), (2L, ""), (3L, " über 100€ "))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Bpe.bpeTokens(col("text"), bcast).as("t"))
      .withColumn("decoded", ByteBpe.byteBpeDecode(col("t")))
      .orderBy("doc_id")
      .as[(Long, Seq[String], String)].collect()
    got.foreach { case (id, toks, decoded) =>
      val expect = docs.filter(col("doc_id") === id).as[(Long, String)].head()._2
      assert(toks === v.encode(expect).toSeq, s"doc $id expression != driver")
      assert(decoded === expect, s"doc $id decode must invert exactly")
    }
    // still a narrow, shuffle-free plan
    val plan = docs.select(Bpe.bpeTokens(col("text"), bcast))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
