package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Parity gates for the URL/domain family: the regex parse is replayed
  * against `java.net.URI` (an independent parser, not our regexes run
  * twice), canonicalization against a naive in-memory canonicalizer
  * built on those URI parts, and the aggregate entries against
  * invariants (group-of-4 collapse, shard affinity, kept+dropped
  * conservation).
  */
class UrlQueriesSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s
  }

  private def q(name: String) =
    graft.QueryCatalog.all.find(_.name == name).get

  /** The derivation replayed in plain Scala — the same arithmetic as
    * UrlQueries.withRawUrl / the DuckDB CTE, used here only to know
    * which raw string each doc_id must carry.
    */
  private def rawUrl(docId: Long): String = {
    val p = docId / 4
    val scheme = if (p % 3 == 0) "https" else "http"
    val tld = Seq("com", "org", "co.uk", "io", "ck")((p % 5).toInt)
    val hostCore =
      (if (p % 2 == 0) "cdn." else "") + s"site${p % 23}.$tld"
    val hostFull = (if (docId % 2 == 0) "www." else "") + hostCore
    val hostRaw =
      if (docId % 5 == 0) hostFull.toUpperCase(java.util.Locale.ROOT)
      else hostFull
    val port =
      if (docId % 7 == 0) { if (p % 3 == 0) ":443" else ":80" } else ""
    val query =
      if (docId % 2 == 0) s"?id=$p&utm_source=feed"
      else s"?utm_campaign=x&id=$p"
    val frag = if (docId % 11 == 0) s"#sec${docId % 3}" else ""
    s"$scheme://$hostRaw$port/doc/$p$query$frag"
  }

  private def naiveCanonical(raw: String): String = {
    val u = new java.net.URI(raw)
    val host = u.getHost.toLowerCase(java.util.Locale.ROOT)
      .replaceFirst("^www\\.", "")
    val defaultPort = (u.getScheme == "http" && u.getPort == 80) ||
      (u.getScheme == "https" && u.getPort == 443)
    val portPart =
      if (u.getPort < 0 || defaultPort) "" else ":" + u.getPort
    val keep = Option(u.getQuery).map(_.split("&").toSeq).getOrElse(Nil)
      .filter(p => p.nonEmpty && !p.matches("^(utm_[a-z]+|fbclid)=.*"))
      .sorted
    u.getScheme + "://" + host + portPart + u.getPath +
      (if (keep.nonEmpty) "?" + keep.mkString("&") else "")
  }

  private def naiveRegDomain(canonHost: String): String = {
    // independent replay of the FULL PSL algorithm over the bundled
    // rules: exception beats everything, then most labels wins (a
    // wildcard's `*` counts as a label); registrable = one more label
    // + the prevailing suffix
    val rules = PublicSuffixes.all.toSet
    val l = canonHost.split("\\.")
    val last2 = l.takeRight(2).mkString(".")
    val last3 = l.takeRight(3).mkString(".")
    if (l.length >= 3 && PublicSuffixes.excThree.contains(last3)) last3
    else if (l.length >= 2 && PublicSuffixes.excTwo.contains(last2)) last2
    else if (l.length >= 3 && (rules(last3) ||
        PublicSuffixes.wildTwoParents.contains(last2)))
      l.takeRight(4).mkString(".")
    else if (l.length >= 2 && (rules(last2) ||
        PublicSuffixes.wildOneParents.contains(l.last)))
      last3
    else last2
  }

  private lazy val docIds: Seq[Long] = {
    import spark.implicits._
    graft.model.Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect().toSeq.sorted
  }

  test("ta_url_parse agrees with java.net.URI on every derived URL") {
    val got = q("ta_url_parse").fn(spark, sf).collect()
    assert(got.length == docIds.length)
    for (r <- got) {
      val raw = r.getAs[String]("raw_url")
      assert(raw == rawUrl(r.getAs[Long]("doc_id")),
        s"raw derivation drifted for doc ${r.getAs[Long]("doc_id")}")
      // java.net.URI needs a lowercase-scheme absolute URI — ours are.
      val u = new java.net.URI(raw)
      assert(r.getAs[String]("scheme") == u.getScheme)
      assert(r.getAs[String]("host") == u.getHost.toLowerCase(java.util.Locale.ROOT))
      val port = Option(r.getAs[Integer]("port")).map(_.toInt).getOrElse(-1)
      assert(port == u.getPort,
        s"port mismatch on $raw: got $port, URI says ${u.getPort}")
      assert(r.getAs[String]("path") == u.getPath)
      assert(r.getAs[String]("query_string") == u.getQuery)
      assert(Option(r.getAs[String]("fragment")) == Option(u.getFragment))
    }
  }

  test("td_url_canonical_dedup replays the naive canonicalizer") {
    val expect = docIds.map(id => naiveCanonical(rawUrl(id)))
      .groupBy(identity).view
      .mapValues(_.size).toMap
    val firsts = docIds.groupBy(id => naiveCanonical(rawUrl(id)))
      .view.mapValues(_.min).toMap
    val got = q("td_url_canonical_dedup").fn(spark, sf).collect()
    assert(got.length == expect.size,
      s"distinct canonical count: got ${got.length}, expect ${expect.size}")
    for (r <- got) {
      val c = r.getAs[String]("canonical_url")
      assert(expect(c).toLong == r.getAs[Long]("n_raw"), s"n_raw for $c")
      assert(firsts(c) == r.getAs[Long]("first_doc"), s"first_doc for $c")
    }
    // The designed collapse: any FULL group of 4 consecutive ids maps
    // to one canonical URL (all raw variety is canonicalization noise).
    val full = docIds.groupBy(_ / 4).filter(_._2.size == 4)
    assert(full.nonEmpty, "fixture has no full group of 4 — derivation broken")
    for ((_, ids) <- full)
      assert(ids.map(id => naiveCanonical(rawUrl(id))).distinct.size == 1)
  }

  test("registered-domain extraction: PSL dim semantics + broadcast plan") {
    import spark.implicits._
    assert(naiveRegDomain("cdn.site7.co.uk") == "site7.co.uk")
    assert(naiveRegDomain("site3.io") == "site3.io")
    // PSL-rule edge vectors straight through the broadcast-dim join
    val vectors = Seq(
      "cdn.site7.co.uk" -> "site7.co.uk", // 2-level rule
      "www2.example.com" -> "example.com", // no rule: last two labels
      "district.k12.ca.us" -> "district.k12.ca.us", // 3-level rule, 4 labels
      "school.district.k12.ca.us" -> "district.k12.ca.us", // deep host
      "college.vic.edu.au" -> "college.vic.edu.au", // 3-level beats edu.au
      "plain.edu.au" -> "plain.edu.au", // 2-level rule
      "k12.ca.us" -> "k12.ca.us", // host IS a bare 3-level suffix
      "co.uk" -> "co.uk", // host IS a bare 2-level suffix
      "localhost" -> "localhost", // single label
      // WILDCARD rules: *.ck makes every X.ck a public suffix
      "foo.bar.ck" -> "foo.bar.ck",
      "deep.foo.bar.ck" -> "foo.bar.ck",
      "bar.ck" -> "bar.ck", // host IS a bare wildcard suffix
      // EXCEPTION rules: !www.ck punctures *.ck — www.ck registrable
      "www.ck" -> "www.ck",
      "a.www.ck" -> "www.ck",
      // 2-label-parent wildcard *.kawasaki.jp and its exception
      "shop.foo.kawasaki.jp" -> "shop.foo.kawasaki.jp",
      "foo.kawasaki.jp" -> "foo.kawasaki.jp",
      "kawasaki.jp" -> "kawasaki.jp", // the parent alone: no rule
      "city.kawasaki.jp" -> "city.kawasaki.jp",
      "sub.city.kawasaki.jp" -> "city.kawasaki.jp",
      // multi-level unknown TLD: no rule anywhere → last two labels
      "deep.multi.unknown.example" -> "unknown.example",
    )
    val dimmed = UrlQueries.withRegDomain(
      vectors.map(_._1).toDF("h"), org.apache.spark.sql.functions.col("h"))
    val gotVec = dimmed.collect()
      .map(r => r.getAs[String]("h") -> r.getAs[String]("reg_domain")).toMap
    for ((h, want) <- vectors)
      assert(gotVec(h) == want, s"regDomain($h): got ${gotVec(h)}, want $want")
    // every vector agrees with the independent replay too
    for ((h, want) <- vectors if h != "localhost")
      assert(naiveRegDomain(h) == want, s"naive($h)")
    // the dim must join as a BROADCAST (the 100-TB plan): no shuffle
    val plan = dimmed.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"PSL dim should broadcast-join, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"PSL dim must not sort-merge-join:\n$plan")
    val got = q("ta_domain_stats").fn(spark, sf).collect()
    val expect = docIds
      .map { id =>
        val u = new java.net.URI(rawUrl(id))
        naiveRegDomain(u.getHost.toLowerCase(java.util.Locale.ROOT).replaceFirst("^www\\.", ""))
      }
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got.map(_.getAs[String]("reg_domain")).toSet == expect.keySet)
    for (r <- got)
      assert(r.getAs[Long]("n_docs") == expect(r.getAs[String]("reg_domain")).toLong)
    // Ordering contract: n_docs descending, domain ascending on ties.
    val keys = got.map(r => (-r.getAs[Long]("n_docs"), r.getAs[String]("reg_domain")))
    assert(keys.sameElements(keys.sorted), "ta_domain_stats order contract")
  }

  test("parse/canonicalize crawl-URI edge cases the fixture never emits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{nullif, regexp_extract, lit}
    val urls = Seq(
      // userinfo + NON-default port (must survive canonicalization —
      // a different origin) + utm + fragment
      "http://user:pw@Site1.example.com:8080/a/b?id=1&utm_source=x#f",
      // userinfo + www strip + param sort
      "https://token@www.site2.co.uk/p?b=2&a=1",
      // plain
      "http://plain.io/x?id=3",
      // DEFAULT port with matching scheme: dropped
      "https://sec.org:443/y?id=4",
      // query directly after authority, no path
      "http://bare.com?id=5",
      // '@' inside the query must not steal the host
      "http://mail.net/u?ref=a@b.com",
      // '?' only inside the fragment: NO query
      "http://spa.app/p#!/view?id=6",
      // no query at all: no trailing '?'
      "http://noq.org/just/path",
      // an URL EMBEDDED in the query (crawl redirect): the anchored
      // path regex must NOT fall through to the inner '://' and
      // invent '/y' as the outer path
      "http://h.com?u=http://x.com/y",
    ).toDF("u")
    val got = urls.select(
      UrlQueries.urlHost($"u").as("host"),
      nullif(regexp_extract($"u", UrlQueries.PortRe, 1), lit(""))
        .cast("int").as("port"),
      UrlQueries.canonicalUrl($"u").as("canon"),
    ).collect()
    assert(got(0).getAs[String]("host") == "site1.example.com")
    assert(got(0).getAs[Integer]("port") == 8080)
    assert(got(0).getAs[String]("canon") ==
      "http://site1.example.com:8080/a/b?id=1",
      s"userinfo/utm/fragment drop, NON-default port survives: ${got(0)}")
    assert(got(1).getAs[String]("host") == "www.site2.co.uk")
    assert(got(1).getAs[Integer]("port") == null)
    assert(got(1).getAs[String]("canon") == "https://site2.co.uk/p?a=1&b=2",
      "www strip + param sort")
    assert(got(2).getAs[String]("canon") == "http://plain.io/x?id=3")
    assert(got(3).getAs[String]("canon") == "https://sec.org/y?id=4",
      "scheme-default port must drop")
    assert(got(4).getAs[String]("host") == "bare.com",
      "authority must terminate at '?' when there is no path")
    assert(got(4).getAs[String]("canon") == "http://bare.com?id=5")
    assert(got(5).getAs[String]("host") == "mail.net",
      "an '@' inside the query must not be read as userinfo")
    assert(got(6).getAs[String]("canon") == "http://spa.app/p",
      "a '?' inside the fragment is not a query")
    assert(got(7).getAs[String]("canon") == "http://noq.org/just/path",
      "no query => no trailing '?'")
    assert(got(8).getAs[String]("host") == "h.com")
    assert(got(8).getAs[String]("canon") == "http://h.com?u=http://x.com/y",
      "embedded URL in the query must not donate its path to the outer URL")
  }

  test("ta_url_psl_classes: every fixture host resolves per the naive PSL") {
    val got = q("ta_url_psl_classes").fn(spark, sf).collect()
    assert(got.map(_.getAs[String]("host")).toSet ==
      UrlQueries.PslHosts.toSet,
      "the fixture must exercise every PSL-class host")
    for (r <- got) {
      val h = r.getAs[String]("host")
      val want = if (h == "localhost") "localhost" else naiveRegDomain(h)
      assert(r.getAs[String]("reg_domain") == want,
        s"reg_domain($h): got ${r.getAs[String]("reg_domain")}, want $want")
    }
    assert(got.map(_.getAs[Long]("n_docs")).sum == docIds.length.toLong)
  }

  test("ta_url_surt replays the naive SURT over java.net.URI parts") {
    def naiveSurt(raw: String): String = {
      val u = new java.net.URI(raw)
      val host = u.getHost.toLowerCase(java.util.Locale.ROOT)
        .replaceFirst("^www\\.", "")
      val default = (u.getScheme == "http" && u.getPort == 80) ||
        (u.getScheme == "https" && u.getPort == 443)
      val port = if (u.getPort < 0 || default) "" else ":" + u.getPort
      val keep = Option(u.getQuery).map(_.split("&").toSeq).getOrElse(Nil)
        .filter(p => p.nonEmpty && !p.matches("^(utm_[a-z]+|fbclid)=.*"))
        .sorted
      host.split("\\.").reverse.mkString(",") + port + ")" + u.getPath +
        (if (keep.nonEmpty) "?" + keep.mkString("&") else "")
    }
    val want = docIds.groupBy(id => naiveSurt(rawUrl(id)))
    val got = q("ta_url_surt").fn(spark, sf).collect()
    assert(got.length == want.size, "distinct urlkey count diverged")
    for (r <- got) {
      val k = r.getAs[String]("urlkey")
      assert(want.contains(k), s"unexpected urlkey $k")
      assert(r.getAs[Long]("n_raw") == want(k).size.toLong, s"count at $k")
      assert(r.getAs[Long]("first_doc") == want(k).min, s"first_doc at $k")
    }
  }

  test("robots filter replays RFC 9309 prefix semantics, and fires") {
    val rules = UrlQueries.RobotsRules.groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    def naiveBlocked(id: Long): Boolean = {
      val u = new java.net.URI(rawUrl(id))
      val dom = naiveRegDomain(u.getHost.toLowerCase(java.util.Locale.ROOT)
        .replaceFirst("^www\\.", ""))
      rules.get(dom).exists(_.exists(u.getPath.startsWith))
    }
    val expectBlocked = docIds.count(naiveBlocked)
    val got = q("td_robots_filter").fn(spark, sf).collect()
    assert(got.map(_.getAs[Long]("n_disallowed")).sum == expectBlocked.toLong,
      "disallowed count must match the naive RFC 9309 replay")
    assert(got.map(r => r.getAs[Long]("n_allowed") +
      r.getAs[Long]("n_disallowed")).sum == docIds.length.toLong,
      "allowed + disallowed must conserve the corpus")
    assert(expectBlocked > 0,
      "robots rules never fire on the fixture — rules stale vs derivation")
  }

  test("robots-from-crawl: expression parse == independent line parser, and fires") {
    import spark.implicits._
    // adversarial bodies beyond the fixture's cases
    val extra = Seq(
      "USER-AGENT: graft-crawler\nDISALLOW: /x\n", // case-insensitive fields
      "User-agent: graft-crawlerX\nDisallow: /y\n", // UA token is not ours
      "User-agent: *\nDisallow:\n\nUser-agent: *\nDisallow: /z\n", // empty + rule across two * groups
      "justtext no colon\n\nUser-agent: *\nDisallow: /q\n", // garbage group ignored
      "User-agent: graft-crawler\nUser-agent: otherbot\nDisallow: /shared\n", // multi-UA group
      "User-agent: otherbot\nDisallow: /a\n\nUser-agent: graft-crawler\nDisallow: /b\n", // ours second
    )
    val bodies = UrlQueries.RobotsCrawl.map(_._2) ++
      UrlQueries.RobotsAllowCrawl.map(_._2) ++ extra ++ Seq(
        // case-insensitive UA + Allow field casing
        "USER-AGENT: GRAFT-CRAWLER\nALLOW: /ok\nDISALLOW: /no\n",
        // allow in the unmatched group must NOT leak
        "User-agent: otherbot\nAllow: /other\n\nUser-agent: *\nDisallow: /d\n",
        // indented rule lines (RFC 9309 permits leading whitespace)
        "  User-agent: *\n\tDisallow: /indent\n",
        // whitespace before the colon
        "User-agent : graft-crawler\nDisallow : /spacedcolon\n",
        // trailing junk after the value is discarded, not rule-dropping
        "User-agent: * # the default group\nDisallow: /junk # legacy\n",
        // lone-\r line endings (old-Mac robots files exist)
        "User-agent: *\rDisallow: /cr\r\r\rUser-agent: otherbot\rDisallow: /\r")
    val got = bodies.toDF("body")
      .select(UrlQueries.robotsRules($"body").as("r"))
      .selectExpr("r.dis", "r.alw")
      .as[(Seq[String], Seq[String])].collect().toSeq
    val want = bodies.map(b =>
      UrlQueries.robotsEffectiveRules(UrlQueries.CrawlerUa, b))
    assert(got.map(t => (t._1.toList, t._2.toList)) ==
      want.map(t => (t._1.toList, t._2.toList)),
      s"expression parse diverged from the line parser:\n got=$got\nwant=$want")
    // EVERY firing rule is observable at this sf (500 docs, p<125):
    // blocked pages p in {2, 5, 6, 120, 121, 124}, 4 docs each — a
    // parse bug dropping any single rule changes this count
    val res = q("td_robots_filter2").fn(spark, sf).collect()
    assert(res.map(_.getAs[Long]("n_disallowed")).sum == 24L,
      "expected pages of p in {2,5,6,120,121,124} (4 docs each) disallowed")
    // longest-match gate: page 0 survives the mixed-case specific
    // group pick, 116 survives its longer Allow, 8 survives the
    // allow=disallow tie; 115/1/123 stay blocked
    val res2 = q("td_robots_allow").fn(spark, sf).collect()
    assert(res2.map(_.getAs[Long]("n_disallowed")).sum == 12L,
      "expected pages of p in {115,1,123} (4 docs each) disallowed")
  }

  test("blocklist filter conserves documents per source") {
    import spark.implicits._
    val perSource = graft.model.Tables.documents(spark, sf)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val got = q("td_blocklist_filter").fn(spark, sf).collect()
    assert(got.map(_.getAs[String]("source")).toSet == perSource.keySet)
    for (r <- got)
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        perSource(r.getAs[String]("source")))
    assert(got.map(_.getAs[Long]("n_dropped")).sum > 0,
      "blocklist never fires on the fixture — list stale vs derivation")
  }

  test("domain cap sampling replays the naive k-smallest-hash reservoir") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String =
      md.digest(s"cap:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    val byDomain = docIds.groupBy { id =>
      val u = new java.net.URI(rawUrl(id))
      naiveRegDomain(u.getHost.toLowerCase(java.util.Locale.ROOT)
        .replaceFirst("^www\\.", ""))
    }
    val expect = byDomain.flatMap { case (dom, ids) =>
      ids.sortBy(id => (h(id), id)).take(UrlQueries.DomainCap).zipWithIndex
        .map { case (id, i) => (dom, id) -> (i + 1) }
    }
    val got = q("td_domain_cap_sample").fn(spark, sf).collect()
    assert(got.length == expect.size,
      s"kept-row count: got ${got.length}, expect ${expect.size}")
    for (r <- got) {
      val key = (r.getAs[String]("reg_domain"), r.getAs[Long]("doc_id"))
      assert(expect.get(key).contains(r.getAs[Int]("pick_rank")),
        s"row $r disagrees with the naive reservoir")
    }
    // the cap binds somewhere, or the fixture stopped exercising it
    assert(byDomain.exists(_._2.size > UrlQueries.DomainCap),
      "no domain exceeds the cap — fixture too small to test capping")
  }

  test("politeness sharding: every domain maps to exactly one shard") {
    val got = q("td_url_host_shard").fn(spark, sf).collect()
    val distinctDomains = docIds.map { id =>
      val u = new java.net.URI(rawUrl(id))
      naiveRegDomain(u.getHost.toLowerCase(java.util.Locale.ROOT).replaceFirst("^www\\.", ""))
    }.distinct.size
    assert(got.map(_.getAs[Long]("n_domains")).sum == distinctDomains.toLong,
      "shard domain counts must partition the distinct-domain set")
    assert(got.map(_.getAs[Long]("n_docs")).sum == docIds.length.toLong)
    assert(got.forall { r =>
      val s = r.getAs[Long]("shard"); s >= 0 && s < 16
    })
  }
}
