package graft.pbp.names

import graft.functions.Fuzzy

/**
 * Roster-name variation matching (reference
 * `processors/pbp_parser/names/helpers.py:6-202`): the ~20-variant
 * generator, name-part parser, per-team variation lookup, and the
 * `match_name` cascade (exact lower → normalized → generated
 * variations → token_sort ≥ 70 → partial_ratio on last name ≥ 85).
 *
 * All pure functions; the Spark integration is the same broadcast
 * pattern as [[PlayerMap]] (per-team lookups are roster-sized).
 */
object NameVariants {

  /** "Last, First" → "First Last" (helpers.py:6-12). */
  def formatName(name: String): String = {
    if (name == null) return null
    if (name.contains(",")) {
      val Array(last, first) = name.split(",", 2)
      s"${first.trim} ${last.trim}"
    } else name.trim
  }

  /** Lowercase, strip non-word chars, collapse spaces (helpers.py:15-19;
    * Python `\w` is unicode-aware → UNICODE_CHARACTER_CLASS). */
  def normalizeName(name: String): String = {
    if (name == null || name.isEmpty) return ""
    val stripped = java.util.regex.Pattern
      .compile("[^\\w\\s]", java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)
      .matcher(name.toLowerCase).replaceAll("")
    stripped.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  private val NumPrefix = "^#?(\\d+)\\s+(.+)$".r

  /** (first, last, jersey) from a raw name (helpers.py:22-53):
    * optional "#12 " prefix, "Last, First" flip, single-word
    * heuristic (short/initial → first name, else last name). */
  def parseNameParts(raw: String): (String, String, Option[String]) = {
    if (raw == null || raw.trim.isEmpty) return ("", "", None)
    var name = raw.trim
    val number = NumPrefix.findFirstMatchIn(name) match {
      case Some(m) => name = m.group(2); Some(m.group(1))
      case None => None
    }
    val (first0, last0) =
      if (name.contains(",")) {
        val parts = name.split(",", 2)
        (if (parts.length > 1) parts(1).trim else "", parts(0).trim)
      } else {
        val parts = name.split("\\s+").filter(_.nonEmpty)
        parts.length match {
          case 0 => return ("", "", number)
          case 1 =>
            val w = parts(0)
            if (w.matches("^[A-Z]\\.$") || w.length <= 2)
              return (w.stripSuffix("."), "", number)
            else return ("", w, number)
          case _ => (parts(0), parts.drop(1).mkString(" "))
        }
      }
    (first0.stripSuffix("."), last0.stripSuffix("."), number)
  }

  /** The variation generator (helpers.py:56-112) — exact emission
    * order, first-occurrence dedup. */
  def generateNameVariations(first: String, last: String,
      number: Option[String] = None): Seq[String] = {
    val fn = Option(first).getOrElse("").trim
    val ln = Option(last).getOrElse("").trim
    if (fn.isEmpty && ln.isEmpty) return Seq.empty
    val fInit = if (fn.nonEmpty) fn.head.toString else ""
    val lInit = if (ln.nonEmpty) ln.head.toString else ""
    val fNorm = normalizeName(fn)
    val lNorm = normalizeName(ln)

    val v = scala.collection.mutable.ArrayBuffer.empty[String]
    if (fn.nonEmpty && ln.nonEmpty) {
      v += s"$fn $ln"; v += s"${fn.toLowerCase} ${ln.toLowerCase}"
      v += s"$ln, $fn"; v += s"${ln.toLowerCase}, ${fn.toLowerCase}"
    }
    if (fInit.nonEmpty && ln.nonEmpty) {
      v += s"$fInit. $ln"; v += s"$fInit $ln"
      v += s"${fInit.toLowerCase}. ${ln.toLowerCase}"
      v += s"${fInit.toLowerCase} ${ln.toLowerCase}"
    }
    if (fn.nonEmpty && lInit.nonEmpty) {
      v += s"$fn $lInit."; v += s"$fn $lInit"
      v += s"${fn.toLowerCase} ${lInit.toLowerCase}."
    }
    if (fInit.nonEmpty && lInit.nonEmpty) {
      v += s"$fInit. $lInit."; v += s"$fInit.$lInit."; v += s"$fInit$lInit"
    }
    if (ln.nonEmpty) { v += ln; v += ln.toLowerCase }
    if (fn.length >= 3 && ln.length >= 3) {
      v += s"${fn.take(3)} ${ln.take(3)}"
      v += s"${fn.take(3).toLowerCase} ${ln.take(3).toLowerCase}"
    }
    number.foreach { n =>
      if (ln.nonEmpty) { v += s"#$n $ln"; v += s"$n $ln" }
      v += s"#$n"; v += n
    }
    if (fNorm.nonEmpty && lNorm.nonEmpty) v += s"$fNorm $lNorm"
    else if (lNorm.nonEmpty) v += lNorm
    v.distinct.toSeq
  }

  /** Per-team variation lookup: every variation key (lowercased) →
    * (canonical name, player id); first writer wins
    * (helpers.py:114-154). */
  def buildNameLookup(
      roster: Seq[(String, String, String, Option[String])] // (team, name, id, number)
  ): Map[String, Map[String, (String, String)]] = {
    val lookup = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.LinkedHashMap[String, (String, String)]]
    roster.foreach { case (team, canonical, pid, number) =>
      if (team != null && canonical != null && pid != null) {
        val m = lookup.getOrElseUpdate(team,
          scala.collection.mutable.LinkedHashMap.empty)
        val formatted = formatName(canonical)
        val (first, last, parsedNum) = parseNameParts(formatted)
        val variations = generateNameVariations(first, last, number.orElse(parsedNum)) ++
          Seq(canonical, formatted)
        variations.foreach { v =>
          if (v != null && v.trim.nonEmpty) {
            val key = v.trim.toLowerCase
            if (!m.contains(key)) m += key -> ((canonical, pid))
          }
        }
      }
    }
    lookup.view.mapValues(_.toMap).toMap
  }

  /** Ordered variation keys per team (extractOne candidate order =
    * insertion order). */
  def orderedKeys(
      roster: Seq[(String, String, String, Option[String])]): Map[String, Vector[String]] = {
    val keys = scala.collection.mutable.Map.empty[String, Vector[String]]
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    roster.foreach { case (team, canonical, pid, number) =>
      if (team != null && canonical != null && pid != null) {
        val formatted = formatName(canonical)
        val (first, last, parsedNum) = parseNameParts(formatted)
        (generateNameVariations(first, last, number.orElse(parsedNum)) ++
          Seq(canonical, formatted)).foreach { v =>
          if (v != null && v.trim.nonEmpty) {
            val key = v.trim.toLowerCase
            if (!seen.contains((team, key))) {
              seen += ((team, key))
              keys(team) = keys.getOrElse(team, Vector.empty) :+ key
            }
          }
        }
      }
    }
    keys.toMap
  }

  /** The match_name cascade (helpers.py:157-202). */
  def matchName(
      name: String, team: String,
      lookup: Map[String, Map[String, (String, String)]],
      ordered: Map[String, Vector[String]],
      threshold: Double = 70.0): Option[(String, String)] = {
    if (name == null || team == null || name.isEmpty || team.isEmpty) return None
    val teamLookup = lookup.getOrElse(team, return None)
    if (teamLookup.isEmpty) return None

    val nameLower = name.trim.toLowerCase
    teamLookup.get(nameLower).foreach(r => return Some(r))
    teamLookup.get(normalizeName(name)).foreach(r => return Some(r))

    val (first, last, number) = parseNameParts(name)
    generateNameVariations(first, last, number).foreach { v =>
      teamLookup.get(v.trim.toLowerCase).foreach(r => return Some(r))
    }

    val candidates = ordered.getOrElse(team, teamLookup.keys.toVector)
    def extractOne(target: String, scorer: (String, String) => Double,
        cutoff: Double): Option[String] = {
      var best = -1.0; var bestKey: String = null
      candidates.foreach { k =>
        val s = scorer(target, k)
        if (s > best) { best = s; bestKey = k }
      }
      if (best >= cutoff) Option(bestKey) else None
    }

    extractOne(nameLower, Fuzzy.tokenSortRatioProcessed, threshold)
      .flatMap(teamLookup.get)
      .orElse {
        if (last.nonEmpty)
          extractOne(last.toLowerCase, Fuzzy.partialRatio, 85.0).flatMap(teamLookup.get)
        else None
      }
  }
}
