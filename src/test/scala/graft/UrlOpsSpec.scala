package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** Laws for the r15 URL family (E66-E69, C42) that the oracle
  * hash-compare can't express: canonicalizer edge cases outside the
  * planted residue classes, RFC 3986 resolution corners, and the
  * PageRank lattice's conservation bound.
  */
class UrlOpsSpec extends SparkSpec {

  // ----- E66 urlCanonOne edges -----

  test("url canon: envelope — non-URL, non-http scheme, IPv6, empty host") {
    assert(UrlOps.urlCanonOne("just words")._1 == "not_url")
    assert(UrlOps.urlCanonOne("mailto:a@b.c")._1 == "not_url") // no ://
    assert(UrlOps.urlCanonOne("ftp://h/x")._1 == "non_http")
    assert(UrlOps.urlCanonOne("javascript://alert(1)")._1 == "non_http")
    assert(UrlOps.urlCanonOne("https://[2001:db8::1]/x")._1 == "unsupported_host")
    assert(UrlOps.urlCanonOne("https:///path-no-host")._1 == "unsupported_host")
  }

  test("url canon: userinfo drops, default port drops, real port keeps") {
    val (st, canon, _, host, _, _) =
      UrlOps.urlCanonOne("https://user:pw@Site.Example.COM.:443/a?x=1#f")
    assert(st == "ok" && host == "site.example.com")
    assert(canon == "https://site.example.com/a?x=1")
    assert(UrlOps.urlCanonOne("http://h.example/x")._2 == "http://h.example/x")
    assert(UrlOps.urlCanonOne("http://h.example:8080/x")._2 ==
      "http://h.example:8080/x")
    // the OTHER scheme's default port is a real port, not a default
    assert(UrlOps.urlCanonOne("http://h.example:443/x")._2 ==
      "http://h.example:443/x")
  }

  test("url canon: query params — empty drop, trackers drop, survivors sort; emptied query drops '?'") {
    assert(UrlOps.urlCanonOne("https://h.example/p?b=2&&a=1&")._2 ==
      "https://h.example/p?a=1&b=2")
    assert(UrlOps.urlCanonOne(
      "https://h.example/p?UTM_Source=x&gclid=1&fbclid=2&msclkid=3")._2 ==
      "https://h.example/p")
    // empty path → '/', bare '?' drops
    assert(UrlOps.urlCanonOne("https://h.example?")._2 == "https://h.example/")
  }

  test("url canon: registered-domain heuristic (2LD list vs plain, short hosts)") {
    assert(UrlOps.urlCanonOne("https://a.b.site.co.uk/")._5 == "site.co.uk")
    assert(UrlOps.urlCanonOne("https://deep.a.site.example.net/")._5 ==
      "example.net")
    assert(UrlOps.urlCanonOne("https://localhost/")._5 == "localhost")
    assert(UrlOps.urlCanonOne("https://co.uk/")._5 == "co.uk") // 2 labels: host itself
  }

  // ----- E68 resolution corners -----

  test("resolve: dot segments clamp at root; nested ..; trailing context") {
    assert(UrlOps.removeDotSegments("/a/b/../c") == "/a/c")
    assert(UrlOps.removeDotSegments("/a/../../x") == "/x") // clamped
    assert(UrlOps.removeDotSegments("/./a/./b") == "/a/b")
    val base = "https://h.example/d1/d2/page.html"
    assert(UrlOps.resolveUrl(base, "../../../up") ==
      Some(("parent", "https://h.example/up")))
    assert(UrlOps.resolveUrl(base, "x/./y") ==
      Some(("relative", "https://h.example/d1/d2/x/y")))
  }

  test("resolve: fragment-only and non-http schemes drop; case-odd absolute passes") {
    val base = "https://h.example/p/"
    assert(UrlOps.resolveUrl(base, "#sec").isEmpty)
    assert(UrlOps.resolveUrl(base, "mailto:x@y.z").isEmpty)
    assert(UrlOps.resolveUrl(base, "javascript:void(0)").isEmpty)
    assert(UrlOps.resolveUrl(base, "HTTPS://Other.Example/X") ==
      Some(("absolute", "HTTPS://Other.Example/X")))
    assert(UrlOps.resolveUrl(base, "//cdn.example/z") ==
      Some(("protocol_relative", "https://cdn.example/z")))
  }

  test("links: script-string and comment anchors are not links; non-HTML quarantines") {
    val html =
      """<!DOCTYPE html><html><head>
        |<script> var a = "<a href='/no1'>x</a>"; </script>
        |<!-- <a href="/no2">y</a> -->
        |</head><body><a href="/yes">z</a></body></html>""".stripMargin
    val links = UrlOps.htmlLinksOne("https://h.example/", html)
    assert(links == Seq((1L, "root_relative", "https://h.example/yes")))
    assert(UrlOps.htmlLinksOne("https://h.example/", "plain text") ==
      Seq((0L, "not_html", null)))
  }

  // ----- E71 robots.txt edges -----

  private def robotsBest(rules: Seq[UrlOps.RobotsRule], path: String):
      (Int, Int, String) =
    rules.filter(r =>
        java.util.regex.Pattern.compile(r.re).matcher(path).find())
      .foldLeft((-1, 1, null: String)) { (acc, r) =>
        if (r.len > acc._1 || (r.len == acc._1 && r.allow > acc._2))
          (r.len, r.allow, r.pattern)
        else acc
      }

  test("robots: exact agent group beats *, other agents' groups are ignored; no group → allow-all") {
    val mine = UrlOps.parseRobots(UrlOps.robotsPayload(3), "graftbot")
    assert(mine.map(_.pattern) == Seq("/d3/", "/d3/open", "/priv$", "/w*z"))
    val star = UrlOps.parseRobots(UrlOps.robotsPayload(3), "unknownbot")
    assert(star.map(_.pattern) == Seq("/ok/"))
    assert(UrlOps.parseRobots("# empty file\n", "graftbot").isEmpty)
  }

  test("robots: $ anchors exactly, Allow wins length ties, empty Disallow drops, comments strip, agent case-insensitive") {
    val txt =
      """User-agent: GRAFTBOT
        |Disallow: /a$
        |Allow: /b # trailing comment
        |Disallow: /b
        |Disallow:
        |Disallow: /c*d$
        |""".stripMargin
    val rules = UrlOps.parseRobots(txt, "graftbot")
    assert(rules.map(_.pattern) == Seq("/a$", "/b", "/b", "/c*d$"))
    assert(robotsBest(rules, "/a") == ((3, 0, "/a$")), "$ must match the exact path")
    assert(robotsBest(rules, "/ax")._3 == null, "$ must not match a longer path")
    assert(robotsBest(rules, "/b/x") == ((2, 1, "/b")), "Allow wins the length tie")
    assert(robotsBest(rules, "/cXYd") == ((5, 0, "/c*d$")), "wildcard spans, $ still anchors")
    assert(robotsBest(rules, "/cXYdZ")._3 == null, "anchored wildcard must not match past the end")
  }

  test("robots: regex metacharacters in patterns are literal") {
    val rules = UrlOps.parseRobots(
      "User-agent: graftbot\nDisallow: /p?q=(1)\n", "graftbot")
    assert(robotsBest(rules, "/p?q=(1)x")._2 == 0, "the literal path must match")
    assert(robotsBest(rules, "/pq1")._3 == null, "metacharacters must not act as regex")
  }

  // ----- E72 charset custody -----

  test("charset sniff: validator agrees with the JDK strict decoder on random and mutated payloads") {
    val rnd = new scala.util.Random(42)
    val seeds: Seq[Array[Byte]] = Seq(
      "plain ascii".getBytes("UTF-8"),
      "café € 💖".getBytes("UTF-8"),
      Array.fill(8)(rnd.nextInt(256).toByte))
    val cases = (0 until 3000).map { _ =>
      val base = seeds(rnd.nextInt(seeds.length)).clone()
      // mutate 0-2 random bytes, sometimes truncate
      (0 until rnd.nextInt(3)).foreach { _ =>
        base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte }
      if (rnd.nextBoolean()) base.take(1 + rnd.nextInt(base.length)) else base
    }
    cases.foreach { b =>
      val mine = graft.operators.UrlOps.utf8Chars(b)
      val jdk: Long =
        try {
          val s = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
            .decode(java.nio.ByteBuffer.wrap(b)).toString
          s.codePointCount(0, s.length).toLong
        } catch { case _: java.nio.charset.CharacterCodingException => -1L }
      assert(mine == jdk,
        s"validator=${mine} jdk=${jdk} on ${b.map(x => f"${x & 0xff}%02x").mkString(" ")}")
    }
  }

  test("charset sniff: BOM custody and degenerate payloads") {
    import graft.operators.UrlOps.sniffCharset
    val bom = Array(0xef, 0xbb, 0xbf).map(_.toByte)
    assert(sniffCharset(bom ++ "hi".getBytes("UTF-8")) == (("utf-8-bom", 5L, 2L)))
    // BOM followed by rot: the whole payload falls back to latin-1
    assert(sniffCharset(bom ++ Array(0x80.toByte)) == (("latin-1", 4L, 4L)))
    assert(sniffCharset(Array.emptyByteArray) == (("utf-8", 0L, 0L)))
    assert(sniffCharset(Array(0xef, 0xbb).map(_.toByte)) == (("latin-1", 2L, 2L)),
      "a 2-byte BOM prefix is not a BOM")
  }

  // ----- E69 PageRank lattice laws -----

  test("host rank: integer-lattice mass conservation and positivity") {
    val out = UrlOps.hostRank(tables).select(col("host"), col("rank_6"),
      col("out_deg"), col("in_deg")).collect()
    val n = out.length.toLong
    assert(n > 0)
    val mass = out.map(_.getLong(1)).sum
    // every floor division loses < 1 micro-unit per floor site; with
    // ~3 floors per node per round the loss is far under 1% of 10^6,
    // and mass can never be created
    assert(mass <= 1000000L, s"mass above 1: $mass")
    assert(mass >= 990000L, s"lattice loss too large: $mass")
    assert(out.forall(_.getLong(1) > 0L), "a rank hit zero")
    // dangling hosts (others/cdns) must outrank pure sources (sites):
    // sites have in_deg 0, so their rank is the damped base only
    val siteMax = out.filter(_.getLong(3) == 0L).map(_.getLong(1)).max
    val sinkMin = out.filter(_.getLong(3) > 0L).map(_.getLong(1)).min
    assert(sinkMin > siteMax,
      s"in-linked host ranked below a pure source: $sinkMin <= $siteMax")
  }

  test("host rank: rounds monotone toward fixpoint (round 8 ≈ round 9 within lattice step)") {
    val r8 = UrlOps.hostRank(tables, rounds = 8).select("host", "rank_6")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r9 = UrlOps.hostRank(tables, rounds = 9).select("host", "rank_6")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r8.keySet == r9.keySet)
    val maxDelta = r8.map { case (h, v) => math.abs(v - r9(h)) }.max
    // the damping contracts the iteration by ≥0.85/round, so by round
    // 8 successive iterates agree to ~0.85⁸ of the initial spread —
    // tens of micro-units on this graph (5e-5 of total mass)
    assert(maxDelta <= 50L, s"not converged at round 8: maxDelta=$maxDelta")
  }
}
