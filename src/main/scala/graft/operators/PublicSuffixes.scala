package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One parsed public-suffix rule set — the three PSL rule classes in
  * the shapes the registered-domain derivation joins support
  * (UrlQueries.withRegDomain):
  *
  *  - EXACT rules ([[twoLevel]]/[[threeLevel]]): registrations live
  *    one label above the suffix;
  *  - WILDCARD rules ([[wildOneParents]]/[[wildTwoParents]], keyed by
  *    the rule's PARENT suffix — `*.ck` is stored as parent `ck`):
  *    EVERY label directly under the parent is a public suffix;
  *  - EXCEPTION rules ([[excTwo]]/[[excThree]]): the named domain is
  *    NOT a public suffix despite a covering wildcard; the rule
  *    itself IS the registrable domain.
  *
  * [[oneLevel]] records exact single-label rules (`com`, `uk` — most
  * of a real PSL snapshot by count) for auditability, but the
  * derivation ignores them: an unmatched host keeps its last two
  * labels, which is exactly the 1-label-exact outcome, so carrying
  * them as a dim would buy nothing. The class-invariant lints run at
  * construction — a rule in the wrong list fails loudly HERE, never
  * as a silent regDomain divergence.
  */
final case class PslRules(
    twoLevel: Seq[String],
    threeLevel: Seq[String],
    wildOneParents: Seq[String],
    wildTwoParents: Seq[String],
    excTwo: Seq[String],
    excThree: Seq[String],
    oneLevel: Seq[String] = Seq.empty) {

  def all: Seq[String] = twoLevel ++ threeLevel

  /** SQL IN-list literals for DuckDB oracle mirrors. */
  def twoLevelSql: String = twoLevel.map(s => s"'$s'").mkString(",")
  def threeLevelSql: String = threeLevel.map(s => s"'$s'").mkString(",")
  def wildOneParentsSql: String =
    wildOneParents.map(s => s"'$s'").mkString(",")
  def wildTwoParentsSql: String =
    wildTwoParents.map(s => s"'$s'").mkString(",")
  def excTwoSql: String = excTwo.map(s => s"'$s'").mkString(",")
  def excThreeSql: String = excThree.map(s => s"'$s'").mkString(",")

  /** Per-level suffix dims as one-column DataFrames for broadcast
    * joins — split by label count so each join key can only match
    * rules of its own level, structurally mirroring the oracle's IN
    * lists. A few hundred curated rows — or the full PSL's ~9k — are
    * both far under any broadcast threshold.
    */
  def dimTwo(spark: SparkSession, col: String): DataFrame = {
    import spark.implicits._
    twoLevel.toDF(col)
  }
  def dimThree(spark: SparkSession, col: String): DataFrame = {
    import spark.implicits._
    threeLevel.toDF(col)
  }
  def dimWildOne(spark: SparkSession, col: String): DataFrame = {
    import spark.implicits._
    wildOneParents.toDF(col)
  }
  def dimWildTwo(spark: SparkSession, col: String): DataFrame = {
    import spark.implicits._
    wildTwoParents.toDF(col)
  }
  def dimExcTwo(spark: SparkSession, col: String): DataFrame = {
    import spark.implicits._
    excTwo.toDF(col)
  }
  def dimExcThree(spark: SparkSession, col: String): DataFrame = {
    import spark.implicits._
    excThree.toDF(col)
  }

  require(oneLevel.forall(!_.contains(".")),
    "every oneLevel public-suffix rule must be a single label")
  require(twoLevel.forall(_.count(_ == '.') == 1),
    "every twoLevel public-suffix rule must have exactly 2 labels")
  require(threeLevel.forall(_.count(_ == '.') == 2),
    "every threeLevel public-suffix rule must have exactly 3 labels")
  require(all.distinct.size == all.size, "duplicate public-suffix rules")
  require(wildOneParents.forall(!_.contains(".")),
    "every wildOne parent must be a single label (the rule is *.<parent>)")
  require(wildTwoParents.forall(_.count(_ == '.') == 1),
    "every wildTwo parent must have exactly 2 labels")
  // an exception rule only means anything against a covering wildcard:
  // `!www.ck` punctures `*.ck`, so its parent MUST be a wildcard parent
  require(excTwo.forall(e => wildOneParents.contains(e.split("\\.")(1))),
    "every 2-label exception must puncture a wildOne rule")
  require(excThree.forall(e =>
      wildTwoParents.contains(e.split("\\.", 2)(1))),
    "every 3-label exception must puncture a wildTwo rule")
  // a wildcard parent that is ALSO an exact rule would make precedence
  // between the classes observable — keep the lists disjoint so the
  // merged same-label-count branches in withRegDomain stay equivalent
  require(!wildTwoParents.exists(twoLevel.contains),
    "wildTwo parents must not duplicate exact twoLevel rules")
  require(!excThree.exists(threeLevel.contains) &&
      !excTwo.exists(twoLevel.contains),
    "exception rules must not duplicate exact rules")
}

/** The bundled public-suffix rules (a curated subset of
  * publicsuffix.org, public domain data) plus [[parseList]], a loader
  * for the published list FORMAT — so a full ~9k-rule snapshot drops
  * in as the same class-split dims through a TESTED code path
  * (PslLoaderSpec), not a claim. The curated [[default]] stays the
  * rule set every catalogue entry and oracle mirror uses; the
  * object-level members forward to it so existing call sites read
  * unchanged.
  */
object PublicSuffixes {

  /** Parse publicsuffix.org list text (the published format: one rule
    * per line up to the first whitespace, `//` comment lines — the
    * ICANN/PRIVATE section markers are comments — blank lines
    * ignored, `*.` wildcard prefix, `!` exception prefix) into the
    * class-split [[PslRules]] shape, running every class-invariant
    * lint. Rule shapes beyond what the derivation's join keys cover
    * (exact rules of 4+ labels, wildcards with 3+-label parents — the
    * private section's `*.compute.amazonaws.com` family, nested `*`)
    * ABORT with the offending rule and line number: a silently
    * dropped rule would mis-derive every domain under it.
    */
  def parseList(text: String): PslRules = {
    val one = Seq.newBuilder[String]
    val two = Seq.newBuilder[String]
    val three = Seq.newBuilder[String]
    val w1 = Seq.newBuilder[String]
    val w2 = Seq.newBuilder[String]
    val e2 = Seq.newBuilder[String]
    val e3 = Seq.newBuilder[String]
    // a UTF-8 BOM on line 1 would otherwise become a garbage rule char
    for ((raw, i) <- text.stripPrefix("\uFEFF").linesIterator.zipWithIndex) {
      // "the rule is the line up to the first whitespace"
      val line = raw.takeWhile(!_.isWhitespace)
      def fail(why: String): Nothing = throw new IllegalArgumentException(
        s"PSL line ${i + 1}: '${if (line.nonEmpty) line else raw.trim}' $why")
      // an INDENTED rule must abort, not silently vanish as a "blank"
      // line — the published format has no indented rules, and a
      // silently dropped rule mis-derives every domain under it
      if (line.isEmpty && raw.exists(!_.isWhitespace))
        fail("starts with whitespace — not the published list format")
      if (line.nonEmpty && !line.startsWith("//")) {
        val (kind, body) =
          if (line.startsWith("!")) ("exc", line.substring(1))
          else if (line.startsWith("*.")) ("wild", line.substring(2))
          else ("exact", line)
        if (body.isEmpty) fail("has no labels")
        val labels = body.split("\\.", -1)
        if (labels.exists(_.isEmpty)) fail("has an empty label")
        if (body.contains("*")) fail(
          "has a non-leading wildcard — the published list has none " +
            "and the derivation's per-level keys cannot express it")
        kind match {
          case "exact" => labels.length match {
            case 1 => one += body
            case 2 => two += body
            case 3 => three += body
            case n => fail(s"is an exact rule with $n labels — beyond " +
              "the derivation's 3-level join keys")
          }
          case "wild" => labels.length match {
            case 1 => w1 += body
            case 2 => w2 += body
            case n => fail(s"is a wildcard with a $n-label parent — " +
              "beyond the derivation's 2-level wildcard keys")
          }
          case "exc" => labels.length match {
            case 2 => e2 += body
            case 3 => e3 += body
            case n => fail(s"is an exception with $n labels — beyond " +
              "the derivation's exception keys")
          }
        }
      }
    }
    PslRules(two.result(), three.result(), w1.result(), w2.result(),
      e2.result(), e3.result(), one.result())
  }

  /** The curated default rule set (every oracle mirror interpolates
    * ITS lists — swapping [[default]] means regenerating oracles, so
    * a parsed snapshot is passed explicitly to withRegDomain instead).
    */
  val default: PslRules = PslRules(
    twoLevel = Seq(
      // uk
      "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
      "ac.uk", "gov.uk", "nhs.uk", "police.uk",
      // au
      "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
      // jp
      "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
      "gr.jp", "lg.jp",
      // nz
      "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz",
      "geek.nz", "gen.nz", "kiwi.nz", "maori.nz",
      // za
      "co.za", "net.za", "org.za", "ac.za", "gov.za", "edu.za", "web.za",
      // br
      "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
      "art.br", "blog.br", "eco.br", "emp.br",
      // in
      "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
      "ac.in", "edu.in", "res.in", "gov.in", "mil.in",
      // cn
      "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
      // latam
      "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
      "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
      "com.co", "net.co", "org.co", "edu.co", "gov.co",
      "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe",
      "com.ve", "com.uy", "com.ec", "gob.ec", "com.bo", "gob.bo",
      "com.py", "gov.py", "gob.cl", "gov.cl",
      // tr
      "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "k12.tr",
      "av.tr", "bel.tr",
      // sg/hk/tw/my/id/kr/th/vn/ph
      "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
      "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
      "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
      "com.my", "net.my", "org.my", "edu.my", "gov.my",
      "co.id", "net.id", "or.id", "ac.id", "web.id", "sch.id", "go.id",
      "mil.id",
      "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
      "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
      "seoul.kr", "busan.kr",
      "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th", "mi.th",
      "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
      "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
      "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph",
      "ngo.ph",
      // south asia
      "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "fam.pk",
      "biz.pk", "web.pk",
      "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd", "mil.bd",
      "com.np", "net.np", "org.np", "edu.np", "gov.np", "mil.np",
      "com.lk", "net.lk", "org.lk", "edu.lk", "gov.lk",
      // mena
      "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg", "eun.eg",
      "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
      "pub.sa", "sch.sa",
      "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae",
      "com.kw", "com.qa", "com.om", "com.bh", "com.jo", "com.lb",
      "com.sy", "com.ye",
      // africa
      "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "sch.ng",
      "name.ng", "i.ng", "mobi.ng",
      "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
      "info.ke", "mobi.ke",
      "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
      "co.tz", "or.tz", "go.tz", "ac.tz", "ne.tz", "sc.tz",
      "co.ug", "or.ug", "ac.ug", "sc.ug", "go.ug", "ne.ug", "com.ug",
      "org.ug",
      "co.zw", "org.zw", "gov.zw", "ac.zw", "co.zm", "com.zm",
      // il / ua / ru (exact entries only)
      "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
      "idf.il", "k12.il",
      "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
      "kiev.ua", "lviv.ua",
      "ac.ru", "edu.ru", "gov.ru",
      // europe misc
      "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
      "waw.pl", "wroc.pl", "krakow.pl",
      "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
      "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
      "org.pt", "publ.pt",
      "com.ro", "org.ro", "store.ro", "tm.ro", "nt.ro", "nom.ro",
      "info.ro", "rec.ro", "arts.ro", "firm.ro",
      "co.hu", "org.hu", "info.hu",
      // us states (registrations live at <name>.<st>.us)
      "ca.us", "ny.us", "tx.us", "fl.us", "wa.us", "ma.us", "il.us",
      "pa.us", "oh.us", "mi.us",
    ),
    threeLevel = Seq(
      // US k12 / community-college / library namespaces
      "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.fl.us", "k12.wa.us",
      "k12.ma.us", "k12.il.us", "k12.pa.us", "k12.oh.us", "k12.mi.us",
      "cc.ca.us", "cc.ny.us", "cc.tx.us",
      "lib.ca.us", "lib.ny.us", "lib.tx.us",
      // AU state education namespaces
      "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au",
      "sa.edu.au", "tas.edu.au", "vic.edu.au", "wa.edu.au",
    ),
    // the PSL's remaining whole-ccTLD wildcards (`*.ck` …)
    wildOneParents = Seq("ck", "er", "fk", "jm", "kh", "mm", "pg"),
    // the Japanese ordinance-designated-city namespaces
    wildTwoParents = Seq(
      "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
      "sapporo.jp", "sendai.jp", "yokohama.jp",
    ),
    excTwo = Seq("www.ck"),
    excThree = Seq(
      "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
      "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
      "city.yokohama.jp",
    ),
  )

  // Forwarders: every pre-loader call site (queries, oracle mirrors,
  // specs) reads the curated default through the original names.
  def twoLevel: Seq[String] = default.twoLevel
  def threeLevel: Seq[String] = default.threeLevel
  def wildOneParents: Seq[String] = default.wildOneParents
  def wildTwoParents: Seq[String] = default.wildTwoParents
  def excTwo: Seq[String] = default.excTwo
  def excThree: Seq[String] = default.excThree
  def all: Seq[String] = default.all

  val twoLevelSql: String = default.twoLevelSql
  val threeLevelSql: String = default.threeLevelSql
  val wildOneParentsSql: String = default.wildOneParentsSql
  val wildTwoParentsSql: String = default.wildTwoParentsSql
  val excTwoSql: String = default.excTwoSql
  val excThreeSql: String = default.excThreeSql

  def dimTwo(spark: SparkSession, col: String): DataFrame =
    default.dimTwo(spark, col)
  def dimThree(spark: SparkSession, col: String): DataFrame =
    default.dimThree(spark, col)
  def dimWildOne(spark: SparkSession, col: String): DataFrame =
    default.dimWildOne(spark, col)
  def dimWildTwo(spark: SparkSession, col: String): DataFrame =
    default.dimWildTwo(spark, col)
  def dimExcTwo(spark: SparkSession, col: String): DataFrame =
    default.dimExcTwo(spark, col)
  def dimExcThree(spark: SparkSession, col: String): DataFrame =
    default.dimExcThree(spark, col)
}
