package graft.functions

/**
 * Pure-Scala fuzzy string scorers — a re-implementation of the scoring
 * semantics the reference uses for player/team reconciliation
 * (rapidfuzz `ratio`/`token_sort_ratio`/`partial_ratio`; call sites at
 * reference `processors/names/helpers.py:157-202`,
 * `processors/names/names.py:131-179`,
 * `processors/reconcile_players.py:444-469` with thresholds 70/85/90).
 *
 * These run inside `flatMapGroups` over per-team candidate sets (each
 * a roster of tens of names), never as a cartesian join — see
 * [[graft.operators.FuzzyJoin]]. Scores are 0–100 like rapidfuzz.
 */
object Fuzzy {

  /** Classic Levenshtein (insert/delete/substitute, all cost 1). */
  def levenshtein(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var curr = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      curr(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(b.length)
  }

  /** InDel distance (insert/delete cost 1, substitution = 2) — the
    * distance rapidfuzz `ratio` is defined over. */
  def indelDistance(a: String, b: String): Int = {
    // LCS-based: indel = |a| + |b| - 2*LCS
    val lcsLen = {
      var prev = new Array[Int](b.length + 1)
      var curr = new Array[Int](b.length + 1)
      var i = 1
      while (i <= a.length) {
        var j = 1
        while (j <= b.length) {
          curr(j) =
            if (a.charAt(i - 1) == b.charAt(j - 1)) prev(j - 1) + 1
            else math.max(prev(j), curr(j - 1))
          j += 1
        }
        val t = prev; prev = curr; curr = t
        java.util.Arrays.fill(curr, 0)
        i += 1
      }
      prev(b.length)
    }
    a.length + b.length - 2 * lcsLen
  }

  /** rapidfuzz `ratio`: (1 - indel/(|a|+|b|)) * 100. */
  def ratio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) 100.0
    else (1.0 - indelDistance(a, b).toDouble / total) * 100.0
  }

  /** rapidfuzz `token_sort_ratio`: ratio over whitespace tokens sorted
    * lexicographically and re-joined. */
  def tokenSortRatio(a: String, b: String): Double = {
    def norm(s: String) =
      s.toLowerCase.split("\\s+").filter(_.nonEmpty).sorted.mkString(" ")
    ratio(norm(a), norm(b))
  }

  /** rapidfuzz `partial_ratio`: best ratio of the shorter string
    * against every length-|s| window of the longer INCLUDING the
    * truncated boundary alignments (windows that hang off either end
    * of the longer string — rapidfuzz scores those against the
    * clipped substring, which matters for prefix/suffix matches near
    * the 85 threshold). */
  def partialRatio(a: String, b: String): Double = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return if (l.isEmpty) 100.0 else 0.0
    if (s.length == l.length) return ratio(s, l)
    var best = 0.0
    // alignment offset i of s against l, from hanging off the left
    // (window clipped at 0) to hanging off the right (clipped at |l|)
    var i = -(s.length - 1)
    while (i <= l.length - 1) {
      val from = math.max(0, i)
      val until = math.min(l.length, i + s.length)
      val r = ratio(s, l.substring(from, until))
      if (r > best) best = r
      i += 1
    }
    best
  }

  /** rapidfuzz `token_set_ratio` (public MIT fuzz.py algorithm): split
    * both into token SETS; any-token-containment scores 100; otherwise
    * the best of (diff-vs-diff with the common prefix credited) and
    * (sect vs sect+diff) ratios. */
  def tokenSetRatio(a: String, b: String): Double = {
    val ta = a.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val tb = b.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    if (ta.isEmpty && tb.isEmpty) return 100.0
    if (ta.isEmpty || tb.isEmpty) return 0.0
    val inter = ta.intersect(tb)
    val diffAb = (ta -- tb).toSeq.sorted.mkString(" ")
    val diffBa = (tb -- ta).toSeq.sorted.mkString(" ")
    if (inter.nonEmpty && (diffAb.isEmpty || diffBa.isEmpty)) return 100.0
    val sectLen = inter.toSeq.sorted.mkString(" ").length
    val sep = if (sectLen > 0) 1 else 0
    val sectAbLen = sectLen + sep + diffAb.length
    val sectBaLen = sectLen + sep + diffBa.length
    // sect_ab vs sect_ba: the shared sect prefix is free, so the indel
    // distance is exactly the diff-vs-diff distance
    val diffDist = indelDistance(diffAb, diffBa)
    val result = 1.0 - diffDist.toDouble / (sectAbLen + sectBaLen)
    // sect vs sect_ab / sect vs sect_ba: one separator + the whole diff
    val sectAb = 1.0 - (sep + diffAb.length).toDouble / (sectLen + sectAbLen)
    val sectBa = 1.0 - (sep + diffBa.length).toDouble / (sectLen + sectBaLen)
    math.max(result, math.max(sectAb, sectBa)) * 100.0
  }

  /** rapidfuzz `partial_token_sort_ratio`: partial over the
    * token-sorted forms. */
  def partialTokenSortRatio(a: String, b: String): Double = {
    def norm(s: String) =
      s.toLowerCase.split("\\s+").filter(_.nonEmpty).sorted.mkString(" ")
    partialRatio(norm(a), norm(b))
  }

  /** rapidfuzz `partial_token_set_ratio`: any shared token aligns
    * perfectly under partial → 100; else partial over the diffs. */
  def partialTokenSetRatio(a: String, b: String): Double = {
    val ta = a.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val tb = b.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    if (ta.isEmpty && tb.isEmpty) return 100.0
    if (ta.intersect(tb).nonEmpty) return 100.0
    partialRatio((ta -- tb).toSeq.sorted.mkString(" "), (tb -- ta).toSeq.sorted.mkString(" "))
  }

  private def tokenRatio(a: String, b: String): Double =
    math.max(tokenSortRatio(a, b), tokenSetRatio(a, b))

  private def partialTokenRatio(a: String, b: String): Double =
    math.max(partialTokenSortRatio(a, b), partialTokenSetRatio(a, b))

  /**
   * rapidfuzz `WRatio` (public MIT fuzz.py algorithm — the round-2
   * simplified max over-scored pairs in [85.5, 94.4] against the ≥90
   * gate at `processors/reconcile_players.py:455`):
   *
   *  - similar lengths (ratio < 1.5): max(ratio, token_ratio · 0.95)
   *  - moderate mismatch (< 8): also partial_ratio · 0.9 and
   *    partial_token_ratio · 0.95 · 0.9
   *  - extreme mismatch (≥ 8): partial scale drops to 0.6
   */
  def wRatio(a: String, b: String): Double = {
    val len1 = a.length
    val len2 = b.length
    if (len1 == 0 || len2 == 0) return 0.0
    val lenRatio = math.max(len1, len2).toDouble / math.min(len1, len2)
    val base = ratio(a, b)
    val UNBASE = 0.95
    if (lenRatio < 1.5) math.max(base, tokenRatio(a, b) * UNBASE)
    else {
      val partialScale = if (lenRatio < 8) 0.9 else 0.6
      math.max(base, math.max(
        partialRatio(a, b) * partialScale,
        partialTokenRatio(a, b) * UNBASE * partialScale))
    }
  }

  /** rapidfuzz `utils.default_process`: lowercase, replace
    * non-alphanumerics with spaces, trim. The token_* scorers apply
    * it by default in rapidfuzz — required for parity wherever the
    * reference calls them without an explicit processor
    * (`map_ncaa_to_cube.py:169-171`). */
  def defaultProcess(s: String): String =
    s.toLowerCase.map(c => if (Character.isLetterOrDigit(c)) c else ' ').trim

  /** token_sort_ratio with rapidfuzz's default processing applied. */
  def tokenSortRatioProcessed(a: String, b: String): Double =
    tokenSortRatio(defaultProcess(a), defaultProcess(b))
}
