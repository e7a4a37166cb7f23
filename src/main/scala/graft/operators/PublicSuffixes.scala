package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bundled public-suffix table — a curated subset of the public
  * suffix list (publicsuffix.org, public domain data) carrying ALL
  * THREE PSL rule classes:
  *
  *  - EXACT rules ([[twoLevel]]/[[threeLevel]]): the widely-registered
  *    ccTLD second-level namespaces plus the exact third-level rules
  *    (US k12/cc/lib, AU state edu);
  *  - WILDCARD rules (`*.ck` — [[wildOneParents]]/[[wildTwoParents]],
  *    keyed by the rule's PARENT suffix): EVERY label directly under
  *    the parent is a public suffix;
  *  - EXCEPTION rules (`!www.ck` — [[excTwo]]/[[excThree]]): the named
  *    domain is NOT a public suffix despite a covering wildcard; its
  *    public suffix is the rule minus its leftmost label, so the rule
  *    itself IS the registrable domain.
  *
  * Registered-domain derivation joins these as BROADCAST dims
  * (UrlQueries.withRegDomain) with the PSL's precedence — exception
  * beats everything, then most labels wins (a wildcard counts its `*`
  * as a label, so `*.P` ties with an exact rule of |P|+1 labels and
  * both yield the SAME suffix, making their order immaterial);
  * registrable domain = one label + the matched suffix; unmatched
  * hosts keep their last two labels. The full PSL (~9k rows) is a
  * drop-in replacement: every rule class lands in the matching list
  * (wildcard parents here cover 1- and 2-label parents, which is every
  * wildcard in the published list).
  *
  * Kept as ONE definition shared by the Spark dims and the DuckDB
  * oracle literal lists (the `*Sql` mirrors) — the
  * Blocklist/BlocklistSql device.
  */
object PublicSuffixes {

  /** Exact two-label public suffixes (registrations live at level 3). */
  val twoLevel: Seq[String] = Seq(
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
  )

  /** Exact three-label public suffixes (registrations at level 4). */
  val threeLevel: Seq[String] = Seq(
    // US k12 / community-college / library namespaces
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.fl.us", "k12.wa.us",
    "k12.ma.us", "k12.il.us", "k12.pa.us", "k12.oh.us", "k12.mi.us",
    "cc.ca.us", "cc.ny.us", "cc.tx.us",
    "lib.ca.us", "lib.ny.us", "lib.tx.us",
    // AU state education namespaces
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au",
    "sa.edu.au", "tas.edu.au", "vic.edu.au", "wa.edu.au",
  )

  /** Wildcard rules with a one-label parent (`*.ck` → parent `ck`):
    * any `X.ck` is a public suffix. These are the PSL's remaining
    * whole-ccTLD wildcards (the historical `*.bd`-style entries that
    * were later expanded to exact lists).
    */
  val wildOneParents: Seq[String] = Seq(
    "ck", "er", "fk", "jm", "kh", "mm", "pg",
  )

  /** Wildcard rules with a two-label parent (`*.kawasaki.jp` → parent
    * `kawasaki.jp`): any `X.kawasaki.jp` is a public suffix. The PSL's
    * Japanese ordinance-designated-city namespaces.
    */
  val wildTwoParents: Seq[String] = Seq(
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
  )

  /** Two-label exception rules (`!www.ck`): the rule itself is the
    * registrable domain (its public suffix is the rule minus the
    * leftmost label). Each must puncture a [[wildOneParents]] rule.
    */
  val excTwo: Seq[String] = Seq("www.ck")

  /** Three-label exception rules (`!city.kawasaki.jp`), puncturing the
    * [[wildTwoParents]] wildcards.
    */
  val excThree: Seq[String] = wildTwoParents.map("city." + _)

  def all: Seq[String] = twoLevel ++ threeLevel

  /** SQL IN-list literals for the DuckDB oracle mirrors. */
  val twoLevelSql: String = twoLevel.map(s => s"'$s'").mkString(",")
  val threeLevelSql: String = threeLevel.map(s => s"'$s'").mkString(",")
  val wildOneParentsSql: String = wildOneParents.map(s => s"'$s'").mkString(",")
  val wildTwoParentsSql: String = wildTwoParents.map(s => s"'$s'").mkString(",")
  val excTwoSql: String = excTwo.map(s => s"'$s'").mkString(",")
  val excThreeSql: String = excThree.map(s => s"'$s'").mkString(",")

  /** Per-level suffix dims as one-column DataFrames for broadcast
    * joins — split by label count so each join key can only match
    * rules of its own level, structurally mirroring the oracle's two
    * IN lists. A few hundred rows each — at the full PSL's ~9k rows
    * still far under any broadcast threshold. Both lists are lint-
    * checked for label count at class init: a rule in the wrong list
    * fails loudly here, not as a silent regDomain divergence.
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
