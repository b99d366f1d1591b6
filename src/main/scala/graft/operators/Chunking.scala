package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sliding-window token chunking — the long-document → overlapping-
 * context-window step of an LLM training/embedding pipeline (each
 * document becomes chunks of `chunkTokens` tokens — whitespace by
 * default, or real tokenizer tokens via the `tokenizer` parameter —
 * starting every `stride` tokens, so consecutive chunks overlap by
 * `chunkTokens - stride`).
 *
 * Scale shape: a map-only narrow pipeline — tokenize once, explode a
 * `sequence()` of chunk starts, `slice` the token array per start. No
 * shuffle at any size; output volume is the only cost, bounded by
 * ceil(n/stride) chunks per document (the overlap factor
 * chunkTokens/stride bounds the blow-up: tokens are emitted at most
 * that many times).
 *
 * Case is preserved (unlike [[graft.functions.TextFunctions.tokens]],
 * which lowercases for similarity hashing): chunk text feeds training,
 * not fingerprinting. Empty documents produce zero chunks; a final
 * partial chunk (fewer than `chunkTokens` tokens) is emitted so every
 * token lands in at least one chunk.
 */
object Chunking {

  /** Default tokenizer: case-preserving whitespace split. Swap in
    * [[graft.functions.Bpe.bpeTokens]] (partially applied over a
    * broadcast vocab) to chunk by REAL tokenizer tokens — the chunk
    * grid then matches what a training run would see. Any
    * `Column => Column` producing array<string> works; the windowing
    * below is tokenizer-agnostic and stays map-only either way. */
  val whitespaceTokens: Column => Column =
    c => filter(split(trim(c), "\\s+"), t => length(t) > 0)

  def slidingTokenChunks(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int,
      tokenizer: Column => Column = whitespaceTokens): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(stride > 0 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens], got $stride (chunkTokens $chunkTokens)")
    val rawToks: Column = tokenizer(col(textCol))
    // two selects so the token array is an ATTRIBUTE where it is
    // referenced twice (sequence bound + slice) — same CollapseProject
    // boundary reasoning as Dedup.shingled
    df.select(col(idCol), rawToks.as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0),
          greatest(size(col("__toks")) - 1, lit(0)), lit(stride))).as("__start"))
      // empty doc: sequence(0, 0) still emits start 0 — drop it here
      .filter(col("__start") < size(col("__toks")))
      .select(col(idCol),
        (col("__start") / stride).cast("int").as("chunk_idx"),
        col("__start").cast("int").as("token_start"),
        slice(col("__toks"), col("__start") + 1, lit(chunkTokens)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"), col("token_start"),
        size(col("__chunk")).cast("int").as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }
}
