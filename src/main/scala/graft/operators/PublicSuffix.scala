package graft.operators

/** Snapshot SUBSET of the Public Suffix List (publicsuffix.org — public
  * data) for [[Urls.registeredDomain]]'s eTLD+1 derivation: without it,
  * `bbc.co.uk` and `news.co.uk` would collapse to the meaningless
  * "co.uk" in per-domain caps and blocklists. The full list is ~9k
  * rules and changes monthly; this snapshot carries the high-traffic
  * ccTLD second-level registries, the common private-registry suffixes
  * a crawler treats as registrant boundaries (github.io, blogspot.com,
  * …), the PSL wildcard TLDs, and the `!www.ck`-style exceptions — a
  * deployment regenerates these tables from a current PSL snapshot
  * (same shapes, longer lists). Unknown TLDs take the PSL default rule
  * (`*` — the last label is the suffix), which IS the last-2-label
  * fallback the planted q98/q101 contract pins.
  *
  * The tables are driver constants that ride the plan as typed literals
  * — the broadcast-lookup shape without a join, so the derivation stays
  * pure in-scan Column arithmetic like the rest of [[Urls]]. */
object PublicSuffix {

  /** Two-label public suffixes: `<label>.<tld>` registries. */
  val TwoLabel: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "me.uk",
    "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "co.za", "net.za", "org.za", "web.za", "gov.za", "ac.za",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "gen.nz", "maori.nz", "school.nz",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.id", "or.id", "ac.id", "go.id", "web.id", "sch.id",
    "co.th", "in.th", "or.th", "ac.th", "go.th",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "nom.pe",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy",
    "com.ve", "net.ve", "org.ve", "co.ve", "gob.ve",
    "com.do", "net.do", "org.do", "edu.do", "gob.do",
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd",
    "com.lk", "net.lk", "org.lk", "edu.lk", "gov.lk",
    "com.kw", "net.kw", "org.kw", "edu.kw", "gov.kw",
    "com.qa", "net.qa", "org.qa", "edu.qa", "gov.qa",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    "co.tz", "or.tz", "ne.tz", "go.tz", "ac.tz", "sc.tz",
    "co.ug", "or.ug", "ne.ug", "go.ug", "ac.ug", "sc.ug",
    // private registries: the registrant boundary a crawler cares about
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "appspot.com", "netlify.app", "vercel.app", "web.app",
    "firebaseapp.com", "azurewebsites.net", "cloudfront.net",
    "amazonaws.com", "pages.dev", "workers.dev", "wordpress.com",
    "tumblr.com", "fastly.net", "windows.net", "readthedocs.io")

  /** Three-label public suffixes. */
  val ThreeLabel: Seq[String] = Seq(
    "s3.amazonaws.com", "elb.amazonaws.com", "compute.amazonaws.com",
    "blob.core.windows.net", "cdn.cloudflare.net")

  /** PSL wildcard TLDs (`*.<tld>` — every second-level label under them
    * is itself a public suffix, e.g. `anything.ck`). */
  val WildcardTlds: Seq[String] = Seq("ck", "er", "fj", "gu", "kh", "mm")

  /** PSL exception rules (`!` entries): hosts registrable DESPITE a
    * covering wildcard. */
  val Exceptions: Seq[String] = Seq("www.ck")
}
