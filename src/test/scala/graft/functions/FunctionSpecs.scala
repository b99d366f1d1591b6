package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/**
 * Fuzzy-scorer fixtures pinned to rapidfuzz's documented semantics
 * (indel `ratio`, `token_sort_ratio`, windowed `partial_ratio` —
 * reference call sites `processors/names/helpers.py:157-202` with
 * thresholds 70/85). Expected values are hand-computed from the
 * definitions: ratio = (1 - indel/(|a|+|b|)) · 100,
 * indel = |a|+|b| - 2·LCS. Property sweeps use a seeded RNG (the
 * offline build has no scalatest-scalacheck bridge).
 */
class FuzzySpec extends AnyFunSuite {

  test("levenshtein basics") {
    assert(Fuzzy.levenshtein("kitten", "sitting") === 3)
    assert(Fuzzy.levenshtein("", "abc") === 3)
    assert(Fuzzy.levenshtein("abc", "abc") === 0)
  }

  test("indel distance is LCS-based (substitution costs 2)") {
    assert(Fuzzy.indelDistance("abcd", "abed") === 2) // LCS=3
    assert(Fuzzy.indelDistance("ab", "ba") === 2) // LCS=1
    assert(Fuzzy.indelDistance("abc", "abc") === 0)
  }

  test("ratio matches hand-computed rapidfuzz values") {
    // "smith" vs "smyth": LCS=4, indel=2, total=10 → 80.0
    assert(Fuzzy.ratio("smith", "smyth") === 80.0)
    assert(Fuzzy.ratio("", "") === 100.0)
  }

  test("token_sort_ratio is order-invariant: reversed token order scores 100") {
    assert(Fuzzy.tokenSortRatio("jack kelly", "kelly jack") === 100.0)
    assert(Fuzzy.tokenSortRatio("John Smith", "smith john") === 100.0)
  }

  test("token_sort_ratio near-miss crosses the 70 gate correctly") {
    // sorted: "jon smith" vs "john smith": LCS=9, total=19, indel=1 → 94.74
    val s = Fuzzy.tokenSortRatio("smith jon", "john smith")
    assert(math.abs(s - (1.0 - 1.0 / 19) * 100) < 1e-9)
    assert(s >= 70.0)
  }

  test("partial_ratio finds an interior window") {
    assert(Fuzzy.partialRatio("smith", "john smith jr") === 100.0)
    assert(Fuzzy.partialRatio("abc", "abc") === 100.0)
  }

  test("partial_ratio scores truncated boundary alignments (ADVICE r1 fix)") {
    // s="abcd", l="cdexxx". Full-length windows max out at 50
    // ("cdex": LCS=2, indel=4, total=8). The clipped left-boundary
    // window "cd" scores ratio("abcd","cd") = (1 - 2/6)·100 = 66.67 —
    // reachable only with boundary alignments.
    val s = Fuzzy.partialRatio("abcd", "cdexxx")
    assert(math.abs(s - (1.0 - 2.0 / 6) * 100) < 1e-9)
  }

  test("wRatio: similar lengths take token_ratio scaled by 0.95") {
    // rapidfuzz WRatio on a pure token permutation is 95.0, NOT 100 —
    // the round-2 simplified max over-scored this to 100
    assert(Fuzzy.wRatio("john smith", "smith john") === 95.0)
  }

  test("wRatio: moderate length mismatch scales partial_ratio by 0.9") {
    // a embedded verbatim in b: partial=100, len_ratio=3.25 ∈ [1.5, 8)
    // → 0.9·100; partial_token_set=100 → 0.95·0.9·100 = 85.5; ratio =
    // (1 - 9/17)·100 = 47.06 → WRatio = 90
    assert(Fuzzy.wRatio("abcd", "abcd xyz abcd") === 90.0)
  }

  test("wRatio: token_set credit for shared tokens (hand-executed rapidfuzz)") {
    // "john smith" vs "john doe": sect="john", diffs "smith"/"doe".
    // token_set = max(1-8/18, 1-6/14, 1-4/12)·100 = 66.67;
    // token_sort = (1-10/18)·100 = 44.44; ratio = (1-8/18)·100 = 55.56
    // → WRatio = 66.67·0.95 = 63.33
    val expected = (1.0 - 4.0 / 12) * 100 * 0.95
    assert(math.abs(Fuzzy.wRatio("john smith", "john doe") - expected) < 1e-9)
    assert(math.abs(Fuzzy.tokenSetRatio("john smith", "john doe") -
      (1.0 - 4.0 / 12) * 100) < 1e-9)
  }

  test("wRatio divergence from the round-2 simplified max around the 90 gate") {
    // best partial window scores in the low 90s; the simplified max
    // would pass the ≥90 reconcile gate, real WRatio scales partial by
    // 0.9 and correctly rejects
    val a = "abcdefghij"
    val b = "abcdefghix 1234567890123"
    val simplified = math.max(Fuzzy.ratio(a, b),
      math.max(Fuzzy.tokenSortRatio(a, b), Fuzzy.partialRatio(a, b)))
    assert(simplified >= 90.0)
    assert(Fuzzy.wRatio(a, b) < 90.0)
  }

  test("tokenSetRatio: subset tokens score 100; empty handling") {
    assert(Fuzzy.tokenSetRatio("john", "john smith jr") === 100.0)
    assert(Fuzzy.tokenSetRatio("", "") === 100.0)
    assert(Fuzzy.tokenSetRatio("a", "") === 0.0)
    assert(Fuzzy.partialTokenSetRatio("john x", "y john") === 100.0)
  }

  test("wRatio: extreme length mismatch drops partial scale to 0.6") {
    // |b|/|a| = 40/4 = 10 ≥ 8 → partial 100·0.6 = 60, partial_token
    // 100·0.95·0.6 = 57 → 60
    val b = "abcd" + ("x" * 36)
    assert(Fuzzy.wRatio("abcd", b) === 60.0)
  }

  test("property sweep: ratio symmetric, bounded, 100 on equality") {
    val rnd = new Random(42)
    def str() = rnd.alphanumeric.take(rnd.nextInt(12)).mkString.toLowerCase
    (1 to 300).foreach { _ =>
      val a = str(); val b = str()
      val r = Fuzzy.ratio(a, b)
      assert(r >= 0.0 && r <= 100.0)
      assert(math.abs(r - Fuzzy.ratio(b, a)) < 1e-9)
      assert(Fuzzy.ratio(a, a) === 100.0)
      val lev = Fuzzy.levenshtein(a, b)
      val ind = Fuzzy.indelDistance(a, b)
      assert(ind >= lev && ind <= 2 * lev)
    }
  }
}

class ScalarFunctionsSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("ipToFloat: 6.2 innings = 6 and two thirds") {
    val out = Seq(6.2, 6.1, 6.0, 0.2).toDF("ip")
      .select(round(ScalarFunctions.ipToFloat(col("ip")), 4).as("f"))
      .as[Double].collect()
    assert(out === Array(6.6667, 6.3333, 6.0, 0.6667))
  }

  test("property sweep: floatToIp(ipToFloat(ip)) round-trips whole.0/.1/.2 notation") {
    val ips = for (whole <- 0 to 20; thirds <- 0 to 2) yield whole + thirds / 10.0
    val rts = ips.toDF("ip")
      .select(col("ip"),
        ScalarFunctions.floatToIp(ScalarFunctions.ipToFloat(col("ip"))).as("rt"))
      .as[(Double, Double)].collect()
    rts.foreach { case (ip, rt) => assert(math.abs(rt - ip) < 1e-9, s"ip=$ip") }
  }

  test("safeDiv guards zero and null denominators") {
    val out = Seq((1.0, 2.0), (1.0, 0.0)).toDF("n", "d")
      .select(ScalarFunctions.safeDiv(col("n"), col("d")).as("q")).as[Double].collect()
    assert(out === Array(0.5, 0.0))
  }

  test("normName strips punctuation, folds &, collapses whitespace") {
    val out = Seq("  Texas A&M   (HOU) ").toDF("x")
      .select(ScalarFunctions.normName(col("x"))).as[String].collect().head
    assert(out === "texas a and m hou")
  }

  test("flipLastFirst") {
    val out = Seq("Kelly, Jack", "Plain Name").toDF("x")
      .select(ScalarFunctions.flipLastFirst(col("x"))).as[String].collect()
    assert(out === Array("Jack Kelly", "Plain Name"))
  }

  test("md5Long matches an independently computed value") {
    val got = Seq("hello").toDF("x")
      .select(ScalarFunctions.md5Long(col("x"))).as[Long].collect().head
    assert(got === PortableHash.md5Long("hello"))
    assert(got === java.lang.Long.parseLong(
      PortableHash.md5Hex("hello").substring(0, 15), 16))
  }

  test("cleanPositions: whitelist, count suffixes, ordered dedup, reference quirks") {
    import graft.functions.ScalarFunctions.cleanPositions
    val rows = Seq(
      "SS-2B(12) ss", "of . lf rf(3)", "1B, C", "nan", "", "util dh-P",
      "IF/OF", "3B", "xyz qq").zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("i", "raw")
    val got = rows.select(col("i"), cleanPositions(col("raw")).as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(0L) === Some("SS, 2B"))
    assert(got(1L) === Some("OF, LF, RF"))
    assert(got(2L) === Some("C")) // '1B,' keeps its comma and fails the whitelist (reference quirk)
    assert(got(3L) === None) // 'nan'
    assert(got(4L) === None) // empty
    assert(got(5L) === Some("DH, P")) // 'UTIL' is not 'UT'
    assert(got(6L) === None) // '/' is not a separator in the reference
    assert(got(7L) === Some("3B"))
    assert(got(8L) === None)
    // null in, null out
    val n = Seq((1L, null.asInstanceOf[String])).toDF("i", "raw")
      .select(cleanPositions(col("raw"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("normalizeDivision: numeric to ncaa_N, passthrough otherwise") {
    import graft.functions.ScalarFunctions.normalizeDivision
    val rows = Seq("1", "2", "3", "3.0", "1.7", "ncaa_2", "4", "x7", "")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("i", "raw")
    val got = rows.select(col("i"), normalizeDivision(col("raw")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) === "ncaa_1" && got(1L) === "ncaa_2" && got(2L) === "ncaa_3")
    assert(got(3L) === "ncaa_3") // float form truncates, as int(float(x)) does
    assert(got(4L) === "ncaa_1") // 1.7 -> 1 (truncation toward zero, reference semantics)
    assert(got(5L) === "ncaa_2") // already prefixed: untouched
    assert(got(6L) === "4") // numeric but out of range: passthrough
    assert(got(7L) === "x7" && got(8L) === "")
    val n = Seq((1L, null.asInstanceOf[String])).toDF("i", "raw")
      .select(normalizeDivision(col("raw"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("htmlToText: blocks drop, tags strip, entities decode once, whitespace collapses") {
    import graft.functions.TextFunctions.htmlToText
    def x(h: String): String =
      Seq(Tuple1(h)).toDF("h").select(htmlToText(col("h"))).as[String].head()
    assert(x("<p>hello <b>bold</b> world</p>") === "hello bold world")
    // script/style bodies vanish even with attributes, newlines, and
    // mixed case; comments vanish across lines
    assert(x("<SCRIPT type='x'>\nvar a = '<p>not text</p>';\n</SCRIPT>ok") === "ok")
    assert(x("<style\n media='all'>p { color: red }\n</style>ok") === "ok")
    assert(x("a<!-- multi\nline\ncomment -->b") === "a b")
    // entities: one decode pass, &amp; LAST → double-encoded stays literal
    assert(x("1 &lt; 2 &amp;&amp; 3 &gt; 2") === "1 < 2 && 3 > 2")
    assert(x("&amp;lt;") === "&lt;")
    assert(x("say &quot;hi&#39;s&quot;&nbsp;now") === "say \"hi's\" now")
    // whitespace collapse + trim
    assert(x("  <div>\n  a\t\tb  </div>  ") === "a b")
    assert(x("") === "")
    assert(x("no markup at all") === "no markup at all")
  }
}

/** URL canonicalization edge cases the t47 oracle's corpus sweep
  * can't isolate: rule-by-rule fixtures plus idempotence. */
class UrlFunctionsSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlFunctions.normalizeUrl(col("u"))).as[String].collect().toSeq

  test("normalizeUrl: case, ports, fragments, tracking params, sort, empty path") {
    assert(norm(
      "HTTP://WWW.Ex.COM:80/p?utm_source=x&b=2&a=1#frag", // all rules at once
      "https://host.org:443",                             // default port + empty path
      "https://host.org:8443/a",                          // non-default port kept
      "http://h.io/p?utm_campaign=z&fbclid=1&gclid",      // query empties out
      "ftp://Files.IO/data#sec",                          // other scheme untouched ports
      "  http://t.co/x  "                                 // trim
    ) === Seq(
      "http://www.ex.com/p?a=1&b=2",
      "https://host.org/",
      "https://host.org:8443/a",
      "http://h.io/p",
      "ftp://files.io/data",
      "http://t.co/x"))
  }

  test("normalizeUrl: non-absolute input passes through trimmed; idempotent on its output") {
    assert(norm(" not a url ", "www.host.com/p") === Seq("not a url", "www.host.com/p"))
    val once = norm("HTTPS://A.B:443/x?b=2&a=1&utm_x=9#f")
    assert(norm(once.head) === once, "normalizeUrl must be idempotent")
  }

  test("normalizeUrl seeded fuzz: idempotent, host recovered, output absolute") {
    val rnd = new Random(77)
    val schemes = Seq("http", "HTTPS", "ftp", "Http")
    val hosts = Seq("Ex.COM", "a.b.c.ORG", "X-1.io", "WWW.Deep.Sub.NET")
    val ports = Seq("", ":80", ":443", ":8080", ":1")
    val paths = Seq("", "/", "/a", "/a/b.html", "/p%20q")
    val queries = Seq("", "?b=2&a=1", "?utm_source=z", "?z&y=1&utm_campaign=c&x=0", "?a=1&a=0")
    val frags = Seq("", "#f", "#a/b?c=1")
    val urls = Seq.fill(80) {
      def p[A](xs: Seq[A]) = xs(rnd.nextInt(xs.size))
      s"${p(schemes)}://${p(hosts)}${p(ports)}${p(paths)}${p(queries)}${p(frags)}"
    }
    val once = norm(urls: _*)
    val twice = norm(once: _*)
    assert(once === twice, "normalizeUrl must be idempotent on every fuzzed URL")
    once.zip(urls).foreach { case (n, u) =>
      assert(n.matches("^[a-z][a-z0-9+.-]*://.*"), s"not absolute: $u -> $n")
      assert(!n.contains("#"), s"fragment survived: $u -> $n")
      assert(!n.contains("utm_"), s"tracking param survived: $u -> $n")
    }
    // host always recovered lowercase, port-free
    val gotHosts = urls.toDF("u").select(UrlFunctions.urlHost(col("u")))
      .as[String].collect().toSeq
    gotHosts.zip(urls).foreach { case (h, u) =>
      val want = u.split("://")(1).split("[/?#]")(0).split(":")(0).toLowerCase
      assert(h === want, s"host of $u: got $h want $want")
    }
  }

  test("urlHost extracts the lowercase port-free host") {
    val hosts = Seq("HTTP://WWW.Ex.COM:8080/p", "https://a.b.c/", "ftp://X.Y")
      .toDF("u").select(UrlFunctions.urlHost(col("u"))).as[String].collect().toSeq
    assert(hosts === Seq("www.ex.com", "a.b.c", "x.y"))
  }

  test("normalizePercentEncoding: unreserved decode, reserved uppercase, invalid pass-through") {
    def pe(ss: String*): Seq[String] = ss.toDF("s")
      .select(UrlFunctions.normalizePercentEncoding(col("s"))).as[String].collect().toSeq
    assert(pe(
      "%41%62%30%2D%2e%5F%7e",  // A b 0 - . _ ~ : all unreserved → decoded
      "%2Fa%2f%3d",             // / (x2) = : reserved → kept, hex uppercased
      "a%zz%4",                 // invalid escapes → untouched
      "trailing%",              // bare % → untouched
      "%20plus%2Bok",           // space reserved; + reserved
      "plain"                   // no escapes
    ) === Seq("Ab0-._~", "%2Fa%2F%3D", "a%zz%4", "trailing%", "%20plus%2Bok", "plain"))
    // idempotent on every output
    val once = pe("%41%2f%zz%", "x%7Ey%3a")
    assert(pe(once: _*) === once)
  }

  test("normalizeUrl: percent-encoding variants collapse to one dedup key") {
    // %41 ≡ A and %2f ≡ %2F must normalize identically; %2F vs / must NOT
    val ns = norm(
      "http://h.io/p%41th?k=%76",
      "http://h.io/pAth?k=v",
      "http://h.io/a%2fb",
      "http://h.io/a%2Fb",
      "http://h.io/a/b")
    assert(ns(0) === ns(1), "unreserved escapes must decode")
    assert(ns(2) === ns(3), "hex case must normalize")
    assert(ns(3) !== ns(4), "reserved %2F must stay distinct from /")
  }

  test("registrableDomain: longest-suffix match, fallbacks, megasite collapse") {
    val sfx = Seq("com", "org", "uk", "co.uk", "io", "github.io")
    def rd(hs: String*): Seq[String] = hs.toDF("h")
      .select(UrlFunctions.registrableDomain(col("h"), sfx)).as[String].collect().toSeq
    assert(rd(
      "www.example.com",      // com → example.com
      "a.b.example.co.uk",    // LONGEST match co.uk (not uk) → example.co.uk
      "deep.user.github.io",  // github.io beats io → user.github.io
      "plain.io",             // io → plain.io (already eTLD+1)
      "localhost",            // no dot, no match → itself
      "com",                  // bare suffix → itself (no label in front)
      "x.unknowntld"          // no matching suffix → itself
    ) === Seq("example.com", "example.co.uk", "user.github.io",
      "plain.io", "localhost", "com", "x.unknowntld"))
    // the quota-evasion scenario: N per-user subdomains → ONE group
    val evaders = (1 to 50).map(i => s"user$i.megasite.com")
    assert(rd(evaders: _*).distinct === Seq("megasite.com"),
      "per-user subdomains must collapse to one registrable domain")
  }
}

class TopKAggSpec extends AnyFunSuite {
  import graft.plans.TopKAgg

  test("TopKAgg equals sort-take on random inputs, including score ties") {
    val agg = new TopKAgg(5)
    val rnd = new Random(7)
    (1 to 200).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(20))((rnd.nextInt(10) / 10.0, rnd.nextInt(50).toLong))
      var buf = agg.zero
      xs.foreach(x => buf = agg.reduce(buf, x))
      val got = agg.finish(buf).map(s => (s.score, s.id))
      val want = xs.sortBy { case (s, id) => (-s, id) }.take(5)
      assert(got === want, s"xs=$xs")
    }
  }

  test("merge is order-insensitive") {
    val agg = new TopKAgg(3)
    val xs = Seq((0.5, 1L), (0.9, 2L), (0.9, 3L), (0.1, 4L), (0.7, 5L))
    val (l, r) = xs.splitAt(2)
    def fold(s: Seq[(Double, Long)]) = s.foldLeft(agg.zero)(agg.reduce)
    val m1 = agg.finish(agg.merge(fold(l), fold(r))).map(_.id)
    val m2 = agg.finish(agg.merge(fold(r), fold(l))).map(_.id)
    val all = agg.finish(fold(xs)).map(_.id)
    assert(m1 === all); assert(m2 === all)
    assert(all === Seq(2L, 3L, 5L))
  }
}
