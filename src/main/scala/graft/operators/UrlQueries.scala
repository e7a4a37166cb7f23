package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables

/** URL/domain operators — the first stage of every crawl-derived
  * training pipeline (CCNet, RefinedWeb, Dolma all begin by parsing,
  * canonicalizing, and domain-filtering `WARC-Target-URI`s before any
  * text processing runs). The reference ETL's analogue is its per-API
  * source addressing (building-inspector.js:50-83 builds page URLs by
  * string concatenation); this family generalizes that to the
  * crawl-archive world the WARC source (sources/Warc.scala) feeds.
  *
  * The `documents` table carries no URL column, so each entry derives
  * a deterministic raw URL per row from (doc_id) arithmetic — the same
  * device the multimodal family uses to fabricate binary payloads —
  * and the DuckDB oracle re-derives the identical string. The derived
  * URLs are deliberately MESSY in exactly the ways crawl URLs are:
  * mixed-case hosts, optional `www.`, explicit default ports, tracking
  * params (`utm_*`) in varying positions, fragments — and groups of 4
  * raw variants share one canonical form, so canonicalization has real
  * work to do and the dedup entry has real duplicates to find.
  *
  * Scale shape: every entry is a single projection over the scan plus
  * at most one hash aggregate on a derived key (canonical URL,
  * registered domain, shard). No joins except the blocklist
  * broadcast (a real blocklist — UT1 is ~4 M domains — still
  * broadcasts at ~100 MB; past that it becomes a bucketed semi-join on
  * the same key). All string work is builtin-function (regexp_extract /
  * filter / array_sort — whole-stage codegen), no UDFs.
  */
object UrlQueries {

  /** Deterministic messy raw URL per document row.
    *
    * The TLD cycle includes `ck` — a WILDCARD public suffix (`*.ck`),
    * so the main URL family's registered-domain consumers exercise
    * the wildcard rule class on every run, not only the dedicated
    * `ta_url_psl_classes` fixture (a `cdn.siteN.ck` host keeps its
    * cdn label: `siteN.ck` is itself a public suffix there).
    *
    * P = doc_id div 4 groups four consecutive docs onto one canonical
    * URL; everything canonical-RELEVANT (scheme, host labels, tld,
    * path, the id param) derives from P, everything canonicalization
    * must REMOVE (www, case, default port, tracking params, param
    * order, fragment) derives from doc_id — so each full group of 4
    * collapses to a single canonical form.
    */
  private def withRawUrl(docs: DataFrame): DataFrame = {
    val p = expr("doc_id div 4")
    val scheme = when(p % 3 === 0, "https").otherwise("http")
    val tld = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("io"), lit("ck")),
      (p % 5 + 1).cast("int"))
    val hostCore = concat(
      when(p % 2 === 0, "cdn.").otherwise(""),
      lit("site"), (p % 23).cast("string"), lit("."), tld)
    val hostFull = concat(
      when(col("doc_id") % 2 === 0, "www.").otherwise(""), hostCore)
    val hostRaw =
      when(col("doc_id") % 5 === 0, upper(hostFull)).otherwise(hostFull)
    val port = when(col("doc_id") % 7 === 0,
      when(p % 3 === 0, ":443").otherwise(":80")).otherwise("")
    val pid = p.cast("string")
    val query = when(col("doc_id") % 2 === 0,
      concat(lit("?id="), pid, lit("&utm_source=feed")))
      .otherwise(concat(lit("?utm_campaign=x&id="), pid))
    val frag = when(col("doc_id") % 11 === 0,
      concat(lit("#sec"), (col("doc_id") % 3).cast("string")))
      .otherwise(lit(""))
    docs.withColumn("raw_url", concat(
      scheme, lit("://"), hostRaw, port, lit("/doc/"), pid, query, frag))
  }

  /** DuckDB CTE producing the identical (documents.*, raw_url) rows. */
  private val RawUrlCte =
    """p0 AS (
      |  SELECT doc_id, text, lang, source, n_chars, doc_id // 4 AS p
      |  FROM documents),
      |h0 AS (
      |  SELECT *,
      |         CASE WHEN p % 3 = 0 THEN 'https' ELSE 'http' END AS scheme0,
      |         (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END ||
      |          CASE WHEN p % 2 = 0 THEN 'cdn.' ELSE '' END ||
      |          'site' || CAST(p % 23 AS VARCHAR) || '.' ||
      |          (['com','org','co.uk','io','ck'])[CAST(p % 5 AS INT) + 1]
      |         ) AS hostfull
      |  FROM p0),
      |u AS (
      |  SELECT doc_id, text, lang, source, n_chars,
      |         scheme0 || '://' ||
      |         CASE WHEN doc_id % 5 = 0 THEN upper(hostfull) ELSE hostfull END ||
      |         CASE WHEN doc_id % 7 = 0
      |              THEN (CASE WHEN scheme0 = 'https' THEN ':443' ELSE ':80' END)
      |              ELSE '' END ||
      |         '/doc/' || CAST(p AS VARCHAR) ||
      |         CASE WHEN doc_id % 2 = 0
      |              THEN '?id=' || CAST(p AS VARCHAR) || '&utm_source=feed'
      |              ELSE '?utm_campaign=x&id=' || CAST(p AS VARCHAR) END ||
      |         CASE WHEN doc_id % 11 = 0
      |              THEN '#sec' || CAST(doc_id % 3 AS VARCHAR)
      |              ELSE '' END AS raw_url
      |  FROM h0)""".stripMargin

  // Generic URL-component regexes — ONE definition each, shared
  // verbatim (modulo string escaping) between the Spark columns and
  // every DuckDB oracle via the *Sql mirrors below, so the parse is
  // pinned as STRING semantics, not as our derivation run backwards.
  // Both engines' regexp_extract return '' on no match.
  // Host/port skip an optional userinfo (`user:pw@host`) and
  // terminate the authority at '/', '?', or '#' — an authority can be
  // followed directly by a query (`http://h?x=1`) and an '@' inside
  // the query must not steal the host. The query regex lazily skips
  // ONLY pre-'#' characters so a '?' inside a fragment
  // (`#!/view?id=1`, fragment routing) does not invent a query.
  // IPv6 bracket hosts are out of scope (the [^:] class splits
  // them) — crawl-corpus URIs are hostnames.
  private val SchemeRe = "^([a-z]+)://"
  private val HostRe = "^[a-z]+://(?:[^/?#@]*@)?([^/:?#@]+)"
  private[operators] val PortRe =
    "^[a-z]+://(?:[^/?#@]*@)?[^/:?#@]+:([0-9]+)"
  // Anchored like the other component regexes: an unanchored '://'
  // search would fall through to a URL EMBEDDED in the query string
  // (http://h.com?u=http://x.com/y — common in crawl redirects) and
  // invent the inner URL's path for the outer one.
  private val PathRe = "^[a-z]+://(?:[^/?#@]*@)?[^/?#]*(/[^?#]*)"
  private val QueryRe = "^[^#]*?\\?([^#]*)"
  private val FragRe = "#(.*)$"

  // The runtime regex text is valid RE2 as-is; single quotes make it
  // a DuckDB string literal (standard SQL: no backslash escaping).
  private def sqlLit(re: String): String = "'" + re + "'"
  private val SchemeReSql = sqlLit(SchemeRe)
  private val HostReSql = sqlLit(HostRe)
  private val PortReSql = sqlLit(PortRe)
  private val PathReSql = sqlLit(PathRe)
  private val QueryReSql = sqlLit(QueryRe)
  private val FragReSql = sqlLit(FragRe)

  private[operators] def urlScheme(u: Column) = regexp_extract(u, SchemeRe, 1)
  private[operators] def urlHost(u: Column) = lower(regexp_extract(u, HostRe, 1))
  private[operators] def urlPath(u: Column) = regexp_extract(u, PathRe, 1)
  private[operators] def urlQuery(u: Column) = regexp_extract(u, QueryRe, 1)

  /** Canonical host (lowercased, leading www. stripped) — the ONE
    * definition behind every domain-keyed entry, with its SQL mirror.
    */
  private def canonHost(u: Column): Column =
    regexp_replace(urlHost(u), "^www\\.", "")
  private def canonHostSql(c: String): String =
    s"regexp_replace(lower(regexp_extract($c, $HostReSql, 1)), '^www\\.', '')"

  /** Query params that survive canonicalization: non-empty, non-
    * tracking, sorted — shared by [[canonicalUrl]] and [[urlSurt]].
    */
  private def keptParams(u: Column): Column =
    array_sort(filter(split(urlQuery(u), "&"),
      x => x =!= "" && !x.rlike("^(utm_[a-z]+|fbclid)=")))

  /** `:port` only when NOT the scheme default (80/http, 443/https —
    * a non-default port is a different origin and must survive).
    */
  private def nonDefaultPort(u: Column): Column = {
    val scheme = urlScheme(u)
    val port = regexp_extract(u, PortRe, 1)
    when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
  }

  /** Canonical URL: lowercase host, strip leading www., drop the
    * default port, drop fragment and tracking params, sort the
    * surviving params.
    */
  private[operators] def canonicalUrl(u: Column): Column = {
    val keep = keptParams(u)
    concat(urlScheme(u), lit("://"), canonHost(u), nonDefaultPort(u),
      urlPath(u),
      when(size(keep) > 0, concat(lit("?"), array_join(keep, "&")))
        .otherwise(lit("")))
  }

  /** SURT (Sort-friendly URI Reordering Transform) key of a raw URL —
    * the form CDX(J) indexes and wayback machines sort on
    * (`com,example)/path?q`): the SAME canonicalization as
    * [[canonicalUrl]] (lowercased www-stripped host, default port
    * dropped, tracking params dropped, survivors sorted, fragment
    * gone, scheme gone) with the host labels REVERSED and
    * comma-joined so one registrable domain's captures sort together;
    * a surviving non-default port rides between host and `)`.
    */
  private[operators] def urlSurt(u: Column): Column = {
    val keep = keptParams(u)
    concat(
      array_join(reverse(split(canonHost(u), "\\.")), ","),
      nonDefaultPort(u), lit(")"), urlPath(u),
      when(size(keep) > 0, concat(lit("?"), array_join(keep, "&")))
        .otherwise(lit("")))
  }

  /** DuckDB canonical-URL expression over a raw-url column `c` —
    * mirrors [[canonicalUrl]] term by term (shared regex literals,
    * same default-port rule, same empty-segment guard).
    */
  private def canonSql(c: String): String = {
    val port = s"regexp_extract($c, $PortReSql, 1)"
    val scheme = s"regexp_extract($c, $SchemeReSql, 1)"
    val keep =
      s"""list_sort(list_filter(string_split(regexp_extract($c, $QueryReSql, 1), '&'),
         |  x -> x <> '' AND NOT regexp_matches(x, '^(utm_[a-z]+|fbclid)=')))""".stripMargin
    s"""$scheme || '://' ||
       |${canonHostSql(c)} ||
       |CASE WHEN $port = '' OR ($scheme = 'http' AND $port = '80')
       |          OR ($scheme = 'https' AND $port = '443')
       |     THEN '' ELSE ':' || $port END ||
       |regexp_extract($c, $PathReSql, 1) ||
       |CASE WHEN len($keep) > 0
       |     THEN '?' || array_to_string($keep, '&')
       |     ELSE '' END""".stripMargin
  }

  /** DuckDB SURT expression over a raw-url column `c` — mirrors
    * [[urlSurt]] term by term (shared regex literals, same default-
    * port rule, same tracking-param filter).
    */
  private def surtSql(c: String): String = {
    val port = s"regexp_extract($c, $PortReSql, 1)"
    val scheme = s"regexp_extract($c, $SchemeReSql, 1)"
    val keep =
      s"""list_sort(list_filter(string_split(regexp_extract($c, $QueryReSql, 1), '&'),
         |  x -> x <> '' AND NOT regexp_matches(x, '^(utm_[a-z]+|fbclid)=')))""".stripMargin
    s"""array_to_string(list_reverse(string_split(${canonHostSql(c)}, '.')), ',') ||
       |CASE WHEN $port = '' OR ($scheme = 'http' AND $port = '80')
       |          OR ($scheme = 'https' AND $port = '443')
       |     THEN '' ELSE ':' || $port END ||
       |')' ||
       |regexp_extract($c, $PathReSql, 1) ||
       |CASE WHEN len($keep) > 0
       |     THEN '?' || array_to_string($keep, '&')
       |     ELSE '' END""".stripMargin
  }

  /** Registered domain via the bundled PSL broadcast dims
    * ([[PublicSuffixes]]), full PSL semantics: EXCEPTION rules win
    * (`!www.ck` — the rule itself is the registrable domain), then the
    * matching rule with the most labels (a wildcard's `*` counts, so
    * `*.kawasaki.jp` sits in the 3-label tier with exact 3-label
    * rules — both yield the same suffix when both match, so the tiers
    * merge into one branch each); registrable domain = one more label
    * + the matched suffix; a host with no matching rule keeps its last
    * two labels; a single-label host ('localhost') stays itself; a
    * host that IS a bare suffix stays itself (try_element_at is NULL
    * past either end and concat_ws skips NULLs; regDomainSql mirrors
    * every case). Six broadcast hash joins of tiny dims — at 100 TB
    * the dims ship once per executor and the derivation stays a
    * per-row map stage; the full ~9k-row PSL swaps in as the same
    * dims, each rule class in its list.
    */
  private[operators] def withRegDomain(
      df: DataFrame, host: Column, out: String = "reg_domain",
      rules: PslRules = PublicSuffixes.default): DataFrame = {
    val spark = df.sparkSession
    val lbl = split(host, "\\.")
    def el(i: Int): Column = try_element_at(lbl, lit(i))
    val last2 = concat_ws(".", el(-2), el(-1))
    val last3 = concat_ws(".", el(-3), el(-2), el(-1))
    val last4 = concat_ws(".", el(-4), el(-3), el(-2), el(-1))
    df
      // join keys are NULL when the host has too few labels: a 2-label
      // host must not probe the 3-level rules with its own 2 labels.
      // Wildcard rules join on the rule's PARENT suffix (the labels
      // UNDER the wildcard's `*`): `*.ck` keys on el(-1),
      // `*.kawasaki.jp` on last2 — with a labels-enough guard so the
      // `*` itself has a label to bind (the suffix needs one more
      // label than the parent).
      .withColumn("_psl_k2", when(size(lbl) >= 2, last2))
      .withColumn("_psl_k3", when(size(lbl) >= 3, last3))
      .withColumn("_psl_kw2", when(size(lbl) >= 3, last2))
      .withColumn("_psl_kw1", when(size(lbl) >= 2, el(-1)))
      // per-CLASS-and-LEVEL dims, not a combined list: each key joins
      // only rules of its own class and level — the same structure as
      // regDomainSql's IN lists, so a rule landing in the wrong list
      // fails the same way on both engines instead of silently
      // matching here only
      .join(broadcast(rules.dimExcThree(spark, "_psl_exc3")),
        col("_psl_k3") === col("_psl_exc3"), "left")
      .join(broadcast(rules.dimExcTwo(spark, "_psl_exc2")),
        col("_psl_k2") === col("_psl_exc2"), "left")
      .join(broadcast(rules.dimThree(spark, "_psl_sfx3")),
        col("_psl_k3") === col("_psl_sfx3"), "left")
      .join(broadcast(rules.dimWildTwo(spark, "_psl_w2")),
        col("_psl_kw2") === col("_psl_w2"), "left")
      .join(broadcast(rules.dimTwo(spark, "_psl_sfx2")),
        col("_psl_k2") === col("_psl_sfx2"), "left")
      .join(broadcast(rules.dimWildOne(spark, "_psl_w1")),
        col("_psl_kw1") === col("_psl_w1"), "left")
      .withColumn(out,
        when(size(lbl) < 2, host)
          // exception rule = the registrable domain itself, matched as
          // a SUFFIX of the host (PSL: `!www.ck` governs a.www.ck too)
          .when(col("_psl_exc3").isNotNull, last3)
          .when(col("_psl_exc2").isNotNull, last2)
          // 3-label suffix tier: exact 3-label rule OR a wildcard with
          // a 2-label parent (suffix = wildcard label + parent = last3)
          .when(col("_psl_sfx3").isNotNull || col("_psl_w2").isNotNull,
            last4)
          // 2-label suffix tier: exact 2-label rule OR `*.<tld>`
          .when(col("_psl_sfx2").isNotNull || col("_psl_w1").isNotNull,
            last3)
          .otherwise(last2))
      .drop("_psl_k2", "_psl_k3", "_psl_kw2", "_psl_kw1",
        "_psl_exc3", "_psl_exc2", "_psl_sfx3", "_psl_w2", "_psl_sfx2",
        "_psl_w1")
  }

  /** DuckDB registered-domain expression over a host expression —
    * mirrors [[withRegDomain]] case by case against the SAME rule
    * lists ([[PublicSuffixes]]' `*Sql` literals); a NULL label
    * concatenation falls through each IN just as a NULL join key
    * misses the dim (the wildcard branches guard the extra-label
    * requirement explicitly, as the join keys do).
    */
  private[operators] def regDomainSql(host: String): String =
    s"""CASE WHEN lbl[-2] IS NULL THEN lbl[-1]
       |     WHEN lbl[-3] || '.' || lbl[-2] || '.' || lbl[-1]
       |          IN (${PublicSuffixes.excThreeSql})
       |     THEN lbl[-3] || '.' || lbl[-2] || '.' || lbl[-1]
       |     WHEN lbl[-2] || '.' || lbl[-1] IN (${PublicSuffixes.excTwoSql})
       |     THEN lbl[-2] || '.' || lbl[-1]
       |     WHEN lbl[-3] || '.' || lbl[-2] || '.' || lbl[-1]
       |          IN (${PublicSuffixes.threeLevelSql})
       |          OR (lbl[-3] IS NOT NULL AND lbl[-2] || '.' || lbl[-1]
       |              IN (${PublicSuffixes.wildTwoParentsSql}))
       |     THEN coalesce(lbl[-4] || '.', '') ||
       |          lbl[-3] || '.' || lbl[-2] || '.' || lbl[-1]
       |     WHEN lbl[-2] || '.' || lbl[-1] IN (${PublicSuffixes.twoLevelSql})
       |          OR lbl[-1] IN (${PublicSuffixes.wildOneParentsSql})
       |     THEN coalesce(lbl[-3] || '.', '') || lbl[-2] || '.' || lbl[-1]
       |     ELSE lbl[-2] || '.' || lbl[-1] END""".stripMargin
      .replace("lbl", s"string_split($host, '.')")

  // ---------------------------------------------------------------
  // 1. Generic URL parsing: one projection, six regexp_extracts, all
  //    whole-stage codegen. At 100 TB this is the map stage right
  //    after the WARC scan — zero shuffles.
  private val urlParse = Q(
    "ta_url_parse",
    (s, d) => {
      import s.implicits._
      withRawUrl(Tables.documents(s, d))
        .select(
          $"doc_id", $"raw_url",
          urlScheme($"raw_url").as("scheme"),
          urlHost($"raw_url").as("host"),
          nullif(regexp_extract($"raw_url", PortRe, 1), lit(""))
            .cast("int").as("port"),
          urlPath($"raw_url").as("path"),
          urlQuery($"raw_url").as("query_string"),
          nullif(regexp_extract($"raw_url", FragRe, 1), lit(""))
            .as("fragment"),
        )
        .orderBy($"doc_id")
    },
    Some(s"""WITH $RawUrlCte
            |SELECT doc_id, raw_url,
            |       regexp_extract(raw_url, $SchemeReSql, 1) AS scheme,
            |       lower(regexp_extract(raw_url, $HostReSql, 1)) AS host,
            |       CAST(nullif(regexp_extract(raw_url, $PortReSql, 1), '') AS INT) AS port,
            |       regexp_extract(raw_url, $PathReSql, 1) AS path,
            |       regexp_extract(raw_url, $QueryReSql, 1) AS query_string,
            |       nullif(regexp_extract(raw_url, $FragReSql, 1), '') AS fragment
            |FROM u
            |ORDER BY doc_id""".stripMargin),
  )

  // ---------------------------------------------------------------
  // 2. Canonicalize + first-seen dedup: the URL-level dedup every
  //    crawl pipeline runs before any content dedup (a page fetched
  //    as http/https × with/without tracking params is one document).
  //    One hash aggregate on the canonical key — at 100 TB the same
  //    groupBy, hash-partitioned on canonical_url.
  private val urlDedup = Q(
    "td_url_canonical_dedup",
    (s, d) => {
      import s.implicits._
      withRawUrl(Tables.documents(s, d))
        .select($"doc_id", canonicalUrl($"raw_url").as("canonical_url"))
        .groupBy($"canonical_url")
        .agg(count(lit(1)).as("n_raw"), min($"doc_id").as("first_doc"))
        .orderBy($"canonical_url")
    },
    Some(s"""WITH $RawUrlCte
            |SELECT ${canonSql("raw_url")} AS canonical_url,
            |       count(*) AS n_raw,
            |       min(doc_id) AS first_doc
            |FROM u
            |GROUP BY 1
            |ORDER BY canonical_url""".stripMargin),
  )

  // ---------------------------------------------------------------
  // 3. Registered-domain corpus profile: docs / distinct pages / chars
  //    per registered domain — the table a domain-mixing or
  //    domain-quality policy is computed FROM (RefinedWeb's per-domain
  //    caps, Dolma's domain stats). distinct canonical rides the same
  //    shuffle key as the group.
  private val domainStats = Q(
    "ta_domain_stats",
    (s, d) => {
      import s.implicits._
      val host = canonHost($"raw_url")
      withRegDomain(withRawUrl(Tables.documents(s, d)), host)
        .select(
          $"reg_domain",
          canonicalUrl($"raw_url").as("canon"),
          $"n_chars")
        .groupBy($"reg_domain")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct($"canon").as("n_pages"),
          sum($"n_chars").as("total_chars"))
        .orderBy($"n_docs".desc, $"reg_domain")
    },
    Some(s"""WITH $RawUrlCte,
            |dom AS (
            |  SELECT ${regDomainSql(
      canonHostSql("raw_url"))} AS reg_domain,
            |         ${canonSql("raw_url")} AS canon,
            |         n_chars
            |  FROM u)
            |SELECT reg_domain,
            |       count(*) AS n_docs,
            |       count(DISTINCT canon) AS n_pages,
            |       CAST(sum(n_chars) AS BIGINT) AS total_chars
            |FROM dom
            |GROUP BY reg_domain
            |ORDER BY n_docs DESC, reg_domain""".stripMargin),
  )

  // ---------------------------------------------------------------
  // 4. Domain blocklist filter: broadcast left join against a
  //    blocklist dim (stand-in for UT1/adult+spam lists), kept/dropped
  //    counts per source. The dim is literal here; at scale it is a
  //    ~100 MB table read — still a broadcast, same plan.
  private val Blocklist =
    Seq("site7.co.uk", "site13.com", "site3.io", "site20.org", "site21.co.uk")

  /** The blocklist as a SQL IN-list — interpolated so the oracle and
    * the broadcast dim share the ONE definition above.
    */
  private val BlocklistSql = Blocklist.map(d => s"'$d'").mkString(",")

  private val blocklistFilter = Q(
    "td_blocklist_filter",
    (s, d) => {
      import s.implicits._
      val host = canonHost($"raw_url")
      val bl = Blocklist.toDF("domain").withColumn("banned", lit(1))
      withRegDomain(withRawUrl(Tables.documents(s, d)), host)
        .select($"source", $"reg_domain")
        .join(broadcast(bl), $"reg_domain" === $"domain", "left")
        .groupBy($"source")
        .agg(
          count(when($"banned".isNull, 1)).as("n_kept"),
          count($"banned").as("n_dropped"))
        .orderBy($"source")
    },
    Some(s"""WITH $RawUrlCte,
            |dom AS (
            |  SELECT source,
            |         ${regDomainSql(
      canonHostSql("raw_url"))} AS reg_domain
            |  FROM u)
            |SELECT source,
            |       count(*) - count(*) FILTER (WHERE reg_domain IN ($BlocklistSql)) AS n_kept,
            |       count(*) FILTER (WHERE reg_domain IN ($BlocklistSql)) AS n_dropped
            |FROM dom
            |GROUP BY source
            |ORDER BY source""".stripMargin),
  )

  // ---------------------------------------------------------------
  // 5. Politeness sharding: every URL of a registered domain lands on
  //    ONE shard (crawl-fetch and per-domain processing both need
  //    this affinity). Shard = md5 of the domain — stable across
  //    engines and partition counts, unlike hash()/xxhash64 whose
  //    seeds differ per engine. Output is the 16-row shard profile;
  //    the assignment itself is the repartition key at scale.
  private val hostShard = Q(
    "td_url_host_shard",
    (s, d) => {
      import s.implicits._
      val host = canonHost($"raw_url")
      withRegDomain(withRawUrl(Tables.documents(s, d)), host)
        .select($"reg_domain")
        .withColumn("shard",
          expr("md5_prefix_long(6, reg_domain) % 16"))
        .groupBy($"shard")
        .agg(
          countDistinct($"reg_domain").as("n_domains"),
          count(lit(1)).as("n_docs"))
        .orderBy($"shard")
    },
    Some(s"""WITH $RawUrlCte,
            |dom AS (
            |  SELECT ${regDomainSql(
      canonHostSql("raw_url"))} AS reg_domain
            |  FROM u)
            |SELECT CAST('0x' || substr(md5(reg_domain), 1, 6) AS BIGINT) % 16 AS shard,
            |       count(DISTINCT reg_domain) AS n_domains,
            |       count(*) AS n_docs
            |FROM dom
            |GROUP BY shard
            |ORDER BY shard""".stripMargin),
  )

  // ---------------------------------------------------------------
  // 6. Per-domain cap sampling (RefinedWeb's anti-domination device:
  //    no registered domain may contribute more than K documents).
  //    Selection is the K smallest salted-md5 values per domain — a
  //    deterministic reservoir, reproducible across engines and
  //    partitionings, no rand(). One shuffle on the domain key; the
  //    per-domain rank is a window sort bounded by the largest
  //    domain. At 100 TB the same selection runs as a bounded-heap
  //    partial aggregate (keep the K smallest (hash, doc) pairs
  //    map-side, merge heaps — the ta_stable_sample/KmvDistinct
  //    pattern), so the window never sees a whole mega-domain; the
  //    hash-rank SEMANTICS are identical, which is what the oracle
  //    pins here.
  private[operators] val DomainCap = 5

  private val domainCapSample = Q(
    "td_domain_cap_sample",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val host = canonHost($"raw_url")
      val w = Window.partitionBy($"reg_domain").orderBy($"h", $"doc_id")
      withRegDomain(withRawUrl(Tables.documents(s, d)), host)
        .select($"doc_id", $"reg_domain")
        .withColumn("h",
          expr("md5(concat('cap:', CAST(doc_id AS STRING)))"))
        .withColumn("pick_rank", row_number().over(w))
        .filter($"pick_rank" <= DomainCap)
        .select($"reg_domain", $"doc_id", $"pick_rank")
        .orderBy($"reg_domain", $"pick_rank")
    },
    Some(s"""WITH $RawUrlCte,
            |dom AS (
            |  SELECT doc_id,
            |         ${regDomainSql(
      canonHostSql("raw_url"))} AS reg_domain
            |  FROM u),
            |r AS (
            |  SELECT reg_domain, doc_id,
            |         CAST(row_number() OVER (PARTITION BY reg_domain
            |           ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id)
            |           AS INT) AS pick_rank
            |  FROM dom)
            |SELECT reg_domain, doc_id, pick_rank
            |FROM r
            |WHERE pick_rank <= $DomainCap
            |ORDER BY reg_domain, pick_rank""".stripMargin),
  )

  // ---------------------------------------------------------------
  // 7. PSL rule-class coverage: registered-domain extraction over a
  //    fixture host set that exercises EVERY public-suffix rule class
  //    (exact 2/3-label, wildcard `*.ck` and `*.kawasaki.jp`,
  //    exception `!www.ck` and `!city.kawasaki.jp` — at the suffix
  //    itself, one label above, and deep), plus the no-rule and
  //    single-label fallbacks. Hosts derive from doc_id (one shared
  //    literal list, interpolated into the oracle — the
  //    Blocklist/BlocklistSql device), so the entry is the same
  //    broadcast-dim map stage as every other reg-domain consumer;
  //    the oracle replays regDomainSql over the same derivation.
  private[operators] val PslHosts: Seq[String] = Seq(
    "cdn.site1.co.uk", // exact 2-label rule
    "school.district.k12.ca.us", // exact 3-label rule, deep host
    "foo.bar.ck", // wildcard *.ck: suffix bar.ck
    "bar.ck", // host IS a bare wildcard suffix
    "www.ck", // exception !www.ck: registrable despite *.ck
    "a.www.ck", // exception governs deeper hosts too
    "shop.foo.kawasaki.jp", // wildcard *.kawasaki.jp: suffix foo.kawasaki.jp
    "foo.kawasaki.jp", // bare 2-label-parent wildcard suffix
    "kawasaki.jp", // the wildcard PARENT alone matches no rule
    "city.kawasaki.jp", // exception !city.kawasaki.jp
    "sub.city.kawasaki.jp", // 3-label exception under a deeper host
    "deep.multi.unknown.example", // no rule: last two labels
    "localhost", // single label stays itself
  )

  private val PslHostsSql = PslHosts.map(h => s"'$h'").mkString(",")

  private val pslClasses = Q(
    "ta_url_psl_classes",
    (s, d) => {
      import s.implicits._
      val host = element_at(
        array(PslHosts.map(lit): _*),
        (col("doc_id") % PslHosts.size + 1).cast("int"))
      withRegDomain(
        Tables.documents(s, d).withColumn("host", host), $"host")
        .groupBy($"host", $"reg_domain")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"host")
    },
    Some(s"""WITH ph AS (
            |  SELECT ([$PslHostsSql])[CAST(doc_id % ${PslHosts.size} AS INT) + 1]
            |           AS host
            |  FROM documents)
            |SELECT host, ${regDomainSql("host")} AS reg_domain,
            |       count(*) AS n_docs
            |FROM ph
            |GROUP BY 1, 2
            |ORDER BY host""".stripMargin),
  )

  // ---------------------------------------------------------------
  // 8. robots.txt politeness filter: the crawl-side compliance op —
  //    a URL is dropped when ANY of its registered domain's Disallow
  //    prefixes matches its path (RFC 9309 prefix semantics; CCBot
  //    honors exactly this before fetching). The rules ship as ONE
  //    literal list (Blocklist/BlocklistSql device) pre-grouped to a
  //    (domain, prefix-array) broadcast dim, so the check is one
  //    broadcast join plus an in-row exists() — no per-rule row
  //    explosion and no doc-level regroup; at 100 TB a real
  //    robots corpus (one row per crawled domain) broadcasts or
  //    becomes a bucketed join on the same key.
  private[operators] val RobotsRules: Seq[(String, String)] = Seq(
    "site1.com" -> "/doc/1", // prefix semantics: /doc/1, /doc/1*, ...
    "site7.co.uk" -> "/doc/", // whole path space disallowed
    "site7.co.uk" -> "/never/", // second rule per domain: any-match
    "site3.io" -> "/private/", // never matches the fixture → all kept
    "cdn.site4.ck" -> "/doc/4", // wildcard-PSL domain keeps its label
  )

  private val RobotsRulesSql = RobotsRules
    .map { case (d, p) => s"('$d','$p')" }.mkString(",")

  // the oracle matches with starts_with (not LIKE), so prefixes are
  // plain strings on both engines; this lint keeps that true if a rule
  // with a quote ever tried to break the VALUES literal
  require(RobotsRules.forall { case (d, p) =>
      !d.contains("'") && !p.contains("'") },
    "robots rules must not contain quotes (they interpolate into SQL)")

  private val robotsFilter = Q(
    "td_robots_filter",
    (s, d) => {
      import s.implicits._
      val host = canonHost($"raw_url")
      val dim = RobotsRules.groupBy(_._1).view
        .mapValues(_.map(_._2)).toSeq
        .toDF("r_dom", "r_prefixes")
      withRegDomain(withRawUrl(Tables.documents(s, d)), host)
        .select($"source", $"reg_domain", urlPath($"raw_url").as("path"))
        .join(broadcast(dim), $"reg_domain" === $"r_dom", "left")
        .withColumn("blocked",
          coalesce(exists($"r_prefixes", p => startswith($"path", p)),
            lit(false)))
        .groupBy($"source")
        .agg(
          count(when(!$"blocked", 1)).as("n_allowed"),
          count(when($"blocked", 1)).as("n_disallowed"))
        .orderBy($"source")
    },
    Some(s"""WITH $RawUrlCte,
            |rules(r_dom, r_prefix) AS (VALUES $RobotsRulesSql),
            |dom AS (
            |  SELECT source,
            |         ${regDomainSql(
      canonHostSql("raw_url"))} AS reg_domain,
            |         regexp_extract(raw_url, $PathReSql, 1) AS path
            |  FROM u),
            |b AS (
            |  SELECT source,
            |         EXISTS(SELECT 1 FROM rules r
            |                WHERE r.r_dom = dom.reg_domain
            |                  AND starts_with(dom.path, r.r_prefix))
            |           AS blocked
            |  FROM dom)
            |SELECT source,
            |       count(*) FILTER (WHERE NOT blocked) AS n_allowed,
            |       count(*) FILTER (WHERE blocked) AS n_disallowed
            |FROM b
            |GROUP BY source
            |ORDER BY source""".stripMargin),
  )

  // ---------------------------------------------------------------
  // 8b. SURT urlkey over the MESSY corpus: pipe_warc_cdx2 computes
  //     SURT from clean archive URIs; this entry runs the SAME shared
  //     device ([[urlSurt]]) over raw crawl URLs with every mess the
  //     fixture encodes (uppercase hosts, www, default and non-default
  //     ports, tracking params in both positions, fragments) and
  //     first-seen-dedups on the key — the urlkey-level collapse a
  //     wayback-style index performs. Groups of 4 raw variants share
  //     one SURT, so the counts prove the canonicalization, and the
  //     oracle replays the transform with its own list machinery.
  //     One projection + one hash aggregate on the key — the
  //     td_url_canonical_dedup scale shape.
  private val urlSurtKey = Q(
    "ta_url_surt",
    (s, d) => {
      import s.implicits._
      withRawUrl(Tables.documents(s, d))
        .select($"doc_id", urlSurt($"raw_url").as("urlkey"))
        .groupBy($"urlkey")
        .agg(count(lit(1)).as("n_raw"), min($"doc_id").as("first_doc"))
        .orderBy($"urlkey")
    },
    Some(s"""WITH $RawUrlCte
            |SELECT ${surtSql("raw_url")} AS urlkey,
            |       count(*) AS n_raw,
            |       min(doc_id) AS first_doc
            |FROM u
            |GROUP BY 1
            |ORDER BY urlkey""".stripMargin),
  )

  // ---------------------------------------------------------------
  // 9. robots.txt rules DERIVED FROM THE CRAWL (what td_robots_filter
  //    proves the JOIN for, this proves end to end): robots.txt
  //    fetches are rendered as WARC response records (target URI
  //    http://<host>/robots.txt — the RFC 9309 address) into a mixed
  //    archive next to page fetches, the read side parses
  //    User-agent/Disallow groups OUT of the payloads with codegen
  //    expressions (group selection per RFC 9309 §2.2.1: the group
  //    naming this crawler wins over `*`; multiple matching groups
  //    combine; an empty Disallow value contributes no rule =
  //    allow-all; comment/Crawl-delay lines ignored), builds the
  //    (domain, prefix-array) dim from the archive itself, and applies
  //    the same broadcast filter join. The oracle replays the filter
  //    from EFFECTIVE rules computed by an independent line-structured
  //    parser over the same fixture texts ([[robotsEffectivePrefixes]]
  //    — colon-split fields, not the regexes), so a wrong group pick,
  //    a swallowed rule, or a mis-handled empty Disallow diverges.
  //
  //    100-TB shape: the robots corpus is one row per crawled domain
  //    (~100M rows ≈ a few GB) — parse stays per-row map work after
  //    the archive scan; the dim then broadcasts when it fits (a
  //    UA-filtered subset usually does) and otherwise becomes a
  //    bucketed semi-join on reg_domain, the same key the page side
  //    already groups by. Nothing here is fixture-shaped except the
  //    literal robots texts.
  private[operators] val CrawlerUa = "graft-crawler"

  /** Fixture robots.txt bodies, one per crawled domain — every
    * group-selection case, each OBSERVABLE at the gate's scale:
    * domains with p ≡ r (mod 115), r < 10 carry page ids r and r+115
    * even at sf0.01, and every rule below fires on at least one of
    * them, so a parse bug that drops or misattributes ANY single rule
    * (or mis-picks a group) changes the counts:
    *
    *  - site2.co.uk — specific-UA group (blocks only /doc/2 → page 2)
    *    beats a block-all `*` group (which would also block page 117);
    *  - site6.org — `*` fallback, MULTI-rule group (pages 6 and 121)
    *    with a comment and a Crawl-delay line to ignore;
    *  - site3.io — EMPTY Disallow in the specific group = allow-all,
    *    overriding a block-all `*` group (pages 3/118 stay allowed);
    *  - site20.org — no group matches this crawler at all (page 66
    *    stays allowed despite the otherbot block-all);
    *  - site5.com — TWO groups naming this crawler: their rules
    *    combine (pages 5 and 120, one rule each);
    *  - cdn.site9.ck — CRLF line endings on a wildcard-PSL domain
    *    (blocks /doc/12 → page 124, the cdn-carrying capture).
    */
  private[operators] val RobotsCrawl: Seq[(String, String)] = Seq(
    "site2.co.uk" -> ("User-agent: graft-crawler\nDisallow: /doc/2\n\n" +
      "User-agent: *\nDisallow: /\n"),
    "site6.org" -> ("# crawl policy\nUser-agent: *\nCrawl-delay: 2\n" +
      "Disallow: /doc/6\nDisallow: /doc/12\n"),
    "site3.io" -> ("User-agent: graft-crawler\nDisallow:\n\n" +
      "User-agent: *\nDisallow: /\n"),
    "site20.org" -> "User-agent: otherbot\nDisallow: /\n",
    "site5.com" -> ("User-agent: graft-crawler\nDisallow: /doc/5\n\n" +
      "User-agent: graft-crawler\nDisallow: /doc/12\n"),
    "cdn.site9.ck" -> "User-agent: graft-crawler\r\nDisallow: /doc/12\r\n",
  )

  /** The EFFECTIVE (Disallow, Allow) prefixes of `ua` under a
    * robots.txt body — the oracle's independent replay of the
    * Spark-side expression parse: line-structured colon-split fields
    * (the regex devices of the query side appear nowhere here),
    * blank-line-separated groups, specific-UA-beats-`*` selection
    * with CASE-INSENSITIVE UA tokens (RFC 9309 §2.2.1), empty values
    * dropped.
    */
  private[operators] def robotsEffectiveRules(
      ua: String, content: String): (Seq[String], Seq[String]) = {
    val groups = content.replace("\r\n", "\n").replace('\r', '\n')
      .split("\n{2,}").toSeq
    def fieldVals(g: String, field: String): Seq[String] =
      g.split("\n").toSeq.flatMap { l =>
        val i = l.indexOf(':')
        if (i <= 0) None
        else {
          val name = l.substring(0, i).trim
            .toLowerCase(java.util.Locale.ROOT)
          // the value is the first whitespace-free token; trailing
          // junk (`# comment`) is discarded — mirrors the expression
          // side's `(\S*).*$`
          if (name == field)
            Some(l.substring(i + 1).trim.takeWhile(!_.isWhitespace))
          else None
        }
      }
    def withUa(t: String) = groups.filter(g =>
      fieldVals(g, "user-agent")
        .map(_.toLowerCase(java.util.Locale.ROOT)).contains(t))
    val mine = withUa(ua.toLowerCase(java.util.Locale.ROOT))
    val chosen = if (mine.nonEmpty) mine else withUa("*")
    def vals(field: String) =
      chosen.flatMap(g => fieldVals(g, field)).filter(_.nonEmpty).distinct
    (vals("disallow"), vals("allow"))
  }

  /** Effective Disallow prefixes only (the `td_robots_filter2`
    * oracle's view).
    */
  private[operators] def robotsEffectivePrefixes(
      ua: String, content: String): Seq[String] =
    robotsEffectiveRules(ua, content)._1

  /** The Spark-side robots.txt parse as ONE column device: payload
    * text → struct(dis, alw) of effective Disallow/Allow prefix
    * arrays for [[CrawlerUa]]. All builtin higher-order/regexp
    * functions (whole-stage codegen), no UDF: normalize CRLF, split
    * blank-line groups, pick the groups naming this crawler (UA
    * token match CASE-INSENSITIVE per RFC 9309 §2.2.1; else the `*`
    * groups), extract non-empty rule values per field, dedupe.
    * UrlQueriesSpec replays it against [[robotsEffectiveRules]] on
    * the fixtures AND adversarial bodies.
    */
  private[operators] def robotsRules(txt: Column): Column = {
    // line-grammar notes, kept equivalent with robotsEffectiveRules
    // BY CONSTRUCTION (the spec replays both on adversarial bodies):
    //  - lone-\r line endings normalize along with \r\n, and the `d`
    //    (UNIX_LINES) regex flag pins ^/$ to \n ONLY — Java's default
    //    multiline terminators include \r and U+2028/2029, which the
    //    oracle's split-on-\n parser would never see;
    //  - `[ \t]*` leading the line: RFC 9309 permits indented rule
    //    lines and the oracle's colon-split trims names;
    //  - the VALUE is the first whitespace-run-free token; `.*$` then
    //    discards anything after it (trailing `# comment` junk), the
    //    oracle mirrors with takeWhile(!isWhitespace).
    def uaHas(g: Column, ua: String): Column = array_contains(
      transform(
        regexp_extract_all(g,
          lit("(?imd)^[ \t]*user-agent[ \t]*:[ \t]*(\\S+).*$"), lit(1)),
        t => lower(t)),
      ua)
    val groups = split(regexp_replace(txt, "\r\n?", "\n"), "\n{2,}")
    val mine = filter(groups, g => uaHas(g, CrawlerUa))
    val star = filter(groups, g => uaHas(g, "*"))
    val chosen = when(size(mine) > 0, mine).otherwise(star)
    def prefixes(field: String): Column = array_distinct(filter(
      flatten(transform(chosen, g => regexp_extract_all(g,
        lit(s"(?imd)^[ \t]*$field[ \t]*:[ \t]*(\\S*).*$$"), lit(1)))),
      p => p =!= ""))
    struct(prefixes("disallow").as("dis"), prefixes("allow").as("alw"))
  }

  /** Effective Disallow prefixes only — the `td_robots_filter2`
    * any-match device ([[robotsRules]]' dis field).
    */
  private[operators] def robotsPrefixes(txt: Column): Column =
    robotsRules(txt).getField("dis")

  private val RobotsCrawlRulesSql: String = {
    val rules = RobotsCrawl.flatMap { case (dom, txt) =>
      robotsEffectivePrefixes(CrawlerUa, txt).map(dom -> _)
    }
    require(rules.nonEmpty, "the robots fixture must yield some rules")
    require(rules.forall { case (d, p) =>
        !d.contains("'") && !p.contains("'") },
      "robots rules must not contain quotes (they interpolate into SQL)")
    rules.map { case (d, p) => s"('$d','$p')" }.mkString(",")
  }

  /** Shared gate shell for the crawl-derived robots filters: write
    * ONE mixed archive (page fetches next to the fixture's robots.txt
    * fetches — the shape a crawl segment actually has), parse the
    * rules dim back out of the payloads ([[robotsRules]] — in-row
    * builtin work over the few robots rows), broadcast-join the URL
    * corpus on registered domain, and profile allowed/disallowed per
    * source under the given blocked decision over (path, rules
    * struct). The two gates differ ONLY in fixture and decision.
    */
  private def robotsCrawlGate(
      s: SparkSession, d: String, fixture: Seq[(String, String)],
      tmpPrefix: String,
      blocked: (Column, Column) => Column): DataFrame = {
    import s.implicits._
    val base = EventQueries.gateTempDir(tmpPrefix)
    try {
      val dir = s"$base/warc"
      val docs = Tables.documents(s, d)
      val robotsDf = fixture.zipWithIndex
        .map { case ((dom, txt), i) => (i.toLong, dom, txt) }
        .toDF("doc_id", "host", "body")
      graft.sources.Warc.render(docs)
        .unionAll(graft.sources.Warc.renderRobots(robotsDf))
        .write.format("warc").option("compression", "none")
        .mode("overwrite").save(dir)
      val dim = s.read.format("warc")
        .option("chunkBytes", (256 * 1024).toString)
        .load(dir)
        .filter($"target_uri".endsWith("/robots.txt"))
        .select(
          regexp_extract($"target_uri",
            "^http://([^/]+)/robots\\.txt$", 1).as("r_dom"),
          robotsRules($"payload".cast("string")).as("r"))
      val host = canonHost($"raw_url")
      withRegDomain(withRawUrl(docs), host)
        .select($"source", $"reg_domain", urlPath($"raw_url").as("path"))
        .join(broadcast(dim), $"reg_domain" === $"r_dom", "left")
        .withColumn("blocked",
          coalesce(blocked($"path", $"r"), lit(false)))
        .groupBy($"source")
        .agg(
          count(when(!$"blocked", 1)).as("n_allowed"),
          count(when($"blocked", 1)).as("n_disallowed"))
        .orderBy($"source")
        .localCheckpoint()
    } finally EventQueries.deleteRecursively(base)
  }

  /** The oracle shell matching [[robotsCrawlGate]]: a rules
    * declaration CTE plus a blocked-decision SQL expression over the
    * `dom` relation (reg_domain, path).
    */
  private def robotsOracleSql(
      rulesDecl: String, blockedExpr: String): String =
    s"""WITH $RawUrlCte,
       |$rulesDecl,
       |dom AS (
       |  SELECT source,
       |         ${regDomainSql(canonHostSql("raw_url"))} AS reg_domain,
       |         regexp_extract(raw_url, $PathReSql, 1) AS path
       |  FROM u),
       |b AS (
       |  SELECT source, $blockedExpr AS blocked
       |  FROM dom)
       |SELECT source,
       |       count(*) FILTER (WHERE NOT blocked) AS n_allowed,
       |       count(*) FILTER (WHERE blocked) AS n_disallowed
       |FROM b
       |GROUP BY source
       |ORDER BY source""".stripMargin

  private val robotsFromCrawl = Q(
    "td_robots_filter2",
    (s, d) => robotsCrawlGate(s, d, RobotsCrawl, "graft-robots-crawl",
      (path, r) =>
        exists(r.getField("dis"), p => startswith(path, p))),
    Some(robotsOracleSql(
      s"rules(r_dom, r_prefix) AS (VALUES $RobotsCrawlRulesSql)",
      """EXISTS(SELECT 1 FROM rules r
        |                WHERE r.r_dom = dom.reg_domain
        |                  AND starts_with(dom.path, r.r_prefix))""".stripMargin)),
  )

  // ---------------------------------------------------------------
  // 10. robots.txt ALLOW rules, longest-match precedence (RFC 9309
  //     §2.2.2 — what real robots files lean on: a broad Disallow
  //     punctured by Allow carve-outs): per URL the MOST SPECIFIC
  //     matching rule wins (most octets), and an allow/disallow TIE
  //     goes to allow. Rules come from the crawl archive exactly as
  //     in td_robots_filter2 (shared [[robotsRules]] parse — now both
  //     fields), the decision is in-row arithmetic (longest matching
  //     prefix per class via filter/transform/array_max — no rule-row
  //     explosion), and the oracle recomputes both maxima with
  //     correlated subqueries over the independent line parser's
  //     effective rules. The fixture makes every semantic observable:
  //     an Allow carve-out inside a broad Disallow, an allow=disallow
  //     tie (allow wins), a longer-allow-beats-shorter-disallow, a
  //     case-INSENSITIVE UA group header, and group selection with
  //     a block-all `*` fallback.
  private[operators] val RobotsAllowCrawl: Seq[(String, String)] = Seq(
    // mixed-case UA token must still match (RFC 9309: case-insensitive);
    // wrong group selection (falling to *) would also block page 0
    "site0.com" -> ("User-Agent: Graft-Crawler\nDisallow: /doc/11\n\n" +
      "User-agent: *\nDisallow: /\n"),
    // allow longer than the disallow it punctures: /doc/116 allowed,
    // /doc/1 stays blocked; the empty Allow line is ignored
    "site1.org" ->
      "User-agent: *\nDisallow: /doc/1\nAllow: /doc/116\nAllow:\n",
    // exact tie (/doc/8 vs /doc/8) -> allow wins; /doc/123 blocked
    "site8.io" -> ("User-agent: graft-crawler\nDisallow: /doc/8\n" +
      "Allow: /doc/8\nDisallow: /doc/123\n"),
  )

  private val RobotsAllowRulesSql: String = {
    val rules = RobotsAllowCrawl.flatMap { case (dom, txt) =>
      val (dis, alw) = robotsEffectiveRules(CrawlerUa, txt)
      dis.map(p => (dom, p, false)) ++ alw.map(p => (dom, p, true))
    }
    require(rules.exists(_._3) && rules.exists(!_._3),
      "the allow fixture must yield rules of both classes")
    require(rules.forall { case (d, p, _) =>
        !d.contains("'") && !p.contains("'") },
      "robots rules must not contain quotes (they interpolate into SQL)")
    rules.map { case (d, p, a) =>
      s"('$d','$p',${if (a) "TRUE" else "FALSE"})"
    }.mkString(",")
  }

  /** RFC 9309 §2.2.2 decision over parsed rule arrays: longest
    * matching rule wins, ties go to allow — so blocked iff the
    * longest matching Disallow is STRICTLY longer than the longest
    * matching Allow (−1 when a class matches nothing).
    */
  private[operators] def robotsBlockedLongestMatch(
      path: Column, dis: Column, alw: Column): Column = {
    def maxLen(arr: Column): Column = coalesce(
      array_max(transform(filter(arr, p => startswith(path, p)),
        p => length(p))),
      lit(-1))
    maxLen(dis) > maxLen(alw)
  }

  private val robotsAllow = Q(
    "td_robots_allow",
    (s, d) => robotsCrawlGate(s, d, RobotsAllowCrawl, "graft-robots-allow",
      (path, r) => robotsBlockedLongestMatch(path,
        r.getField("dis"), r.getField("alw"))),
    Some(robotsOracleSql(
      s"rules(r_dom, r_prefix, r_allow) AS (VALUES $RobotsAllowRulesSql)",
      """coalesce((SELECT max(length(r.r_prefix)) FROM rules r
        |                   WHERE r.r_dom = dom.reg_domain
        |                     AND NOT r.r_allow
        |                     AND starts_with(dom.path, r.r_prefix)), -1)
        |         >
        |         coalesce((SELECT max(length(r.r_prefix)) FROM rules r
        |                   WHERE r.r_dom = dom.reg_domain
        |                     AND r.r_allow
        |                     AND starts_with(dom.path, r.r_prefix)), -1)""".stripMargin)),
  )

  def all: Seq[Q] =
    Seq(urlParse, urlDedup, domainStats, blocklistFilter, hostShard,
      domainCapSample, pslClasses, urlSurtKey, robotsFilter,
      robotsFromCrawl, robotsAllow)
}
