package graft.text

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt (RFC 9309) crawl-politeness filtering — the layer a
  * responsible training-data pipeline applies between the crawl and
  * the corpus: a host's `robots.txt` declares which paths a named
  * crawler may fetch, and documents landed from disallowed paths
  * should not survive curation. Semantics follow RFC 9309 (the
  * Robots Exclusion Protocol, Koster et al. 2022) as implemented by
  * the major crawlers:
  *
  *  - the file is groups of `User-agent:` lines followed by
  *    `Allow:`/`Disallow:` rules; consecutive agent lines share one
  *    group; directive names are case-insensitive; `#` starts a
  *    comment; unknown directives (Crawl-delay, Sitemap) are ignored;
  *  - group selection: the group whose agent token is the LONGEST
  *    case-insensitive prefix of the crawler's product token wins;
  *    `*` matches any crawler at specificity 0; groups tying on
  *    specificity merge their rules; no matching group → allow all;
  *  - rule matching: a pattern matches when it glob-matches a PREFIX
  *    of the URL path (+ `?query` when present) — `*` spans any run,
  *    a trailing `$` anchors the match to the path end;
  *  - decision: the longest matching pattern wins; an allow/disallow
  *    tie at equal length → allow; no matching rule → allow; an
  *    empty rule value is ignored (so `Disallow:` alone allows all).
  *
  * ==Scale shape==
  * Rule extraction is a per-host flatMap over the (small relative to
  * the corpus) robots table; the verdict is one equi-join on host —
  * broadcastable when the robots table is, AQE-planned otherwise —
  * a codegen'd match filter, and a map-side-combinable
  * `max(struct(specificity, allow))` per document. No window, no
  * per-document parsing: each host's file parses once however many
  * million documents it served. */
object Robots {

  /** One rule of the selected group. */
  final case class Rule(pattern: String, allow: Boolean)

  /** Glob-prefix match per RFC 9309: `*` spans any character run,
    * trailing `$` anchors to the end; otherwise the pattern needs to
    * match only a prefix of `path`. Shared interpreted/codegen
    * kernel (public static for generated code). */
  def matchesPath(pattern: UTF8String, path: UTF8String): Boolean =
    matches(pattern.toString, path.toString)

  def matches(p: String, s: String): Boolean = {
    val anchored = p.nonEmpty && p.charAt(p.length - 1) == '$'
    val pat = if (anchored) p.substring(0, p.length - 1) else p
    var pi = 0; var si = 0
    var starPi = -1; var starSi = -1
    while (true) {
      if (pi == pat.length && !anchored) return true
      if (si == s.length) {
        while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
        return pi == pat.length
      }
      if (pi < pat.length && pat.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (pi < pat.length && pat.charAt(pi) == s.charAt(si)) {
        pi += 1; si += 1
      } else if (starPi >= 0) {
        // backtrack: let the last '*' swallow one more char
        pi = starPi + 1; starSi += 1; si = starSi
      } else return false
    }
    false // unreachable
  }

  /** Parse one robots.txt body and return the rules of the group(s)
    * selected for `agent` (see object scaladoc for the selection and
    * merge semantics). Null-safe: null body → no rules (allow all). */
  def parseRules(body: String, agent: String): Seq[Rule] = {
    if (body == null) return Nil
    val a = agent.toLowerCase(Locale.ROOT)
    selectedGroups(body, a).flatMap(_._1)
  }

  /** Crawl-delay (seconds) of the group selected for `agent` — the
    * one widely-honored extension directive (Bing/Yandex; not RFC
    * 9309, hence Option): None when the selected groups declare none
    * or the value does not parse. Groups merging on a specificity
    * tie take the MAXIMUM declared delay (the polite resolution). */
  def crawlDelay(body: String, agent: String): Option[Double] = {
    if (body == null) return None
    val ds = selectedGroups(body, agent.toLowerCase(Locale.ROOT))
      .flatMap(_._2)
    if (ds.isEmpty) None else Some(ds.max)
  }

  /** The groups selected for lowercased product token `a`: their
    * (rules, crawl-delay) contents, merged across a specificity
    * tie. Shared by [[parseRules]] and [[crawlDelay]]. */
  private def selectedGroups(body: String, a: String)
      : Seq[(Seq[Rule], Option[Double])] = {
    if (body == null) return Nil
    val groups = Seq.newBuilder[(Seq[String], Seq[Rule], Option[Double])]
    var agents = Seq.newBuilder[String]
    var rules = Seq.newBuilder[Rule]
    var delay: Option[Double] = None
    var inAgents = false
    var sawGroup = false
    def closeGroup(): Unit = {
      if (sawGroup) groups += ((agents.result(), rules.result(), delay))
      agents = Seq.newBuilder[String]; rules = Seq.newBuilder[Rule]
      delay = None
    }
    body.split("\n").foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val c = line.indexOf(':')
      if (c > 0) {
        val name = line.substring(0, c).trim.toLowerCase(Locale.ROOT)
        val value = line.substring(c + 1).trim
        name match {
          case "user-agent" =>
            if (!inAgents) closeGroup()
            inAgents = true; sawGroup = true
            if (value.nonEmpty) agents += value.toLowerCase(Locale.ROOT)
          case "allow" | "disallow" if sawGroup =>
            inAgents = false
            if (value.nonEmpty) rules += Rule(value, name == "allow")
          case "crawl-delay" if sawGroup =>
            inAgents = false
            try delay = Some(value.toDouble)
            catch { case _: NumberFormatException => () }
          case _ => inAgents = false // unknown directive: ignored
        }
      }
    }
    closeGroup()
    val all = groups.result()
    // specificity of a group for `a`: longest token that prefixes the
    // product token; '*' scores 0; no token matches → the group is out
    def spec(tokens: Seq[String]): Int = {
      var best = -1
      tokens.foreach { t =>
        val s = if (t == "*") 0
                else if (a.startsWith(t)) t.length
                else -1
        if (s > best) best = s
      }
      best
    }
    val scored = all.map { case (ts, rs, d) => (spec(ts), rs, d) }
      .filter(_._1 >= 0)
    if (scored.isEmpty) Nil
    else {
      val best = scored.map(_._1).max
      scored.filter(_._1 == best).map { case (_, rs, d) => (rs, d) }
    }
  }

  /** Column API: does `pattern` glob-prefix-match `path`? */
  def robotsMatch(pattern: Column, path: Column): Column =
    ColumnBridge.column(RobotsMatch(
      ColumnBridge.expression(pattern), ColumnBridge.expression(path)))

  /** The longest-match decision over one host's selected rules:
    * longest matching pattern wins, allow wins ties, no match →
    * allow. Shared by the join spelling ([[verdicts]]) via its
    * `max(struct)` equivalent and by the compiled-rules spelling. */
  def decide(rules: Seq[Rule], pathq: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (matches(r.pattern, pathq)) {
        val l = r.pattern.length
        if (l > bestLen || (l == bestLen && r.allow)) {
          bestLen = l; bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  /** Compile a BOUNDED robots table to a driver-side host → rules
    * map — the STREAMING spelling of [[verdicts]]: a stream cannot
    * take the join + per-doc aggregate (append mode forbids the
    * agg), but a stateless per-row decision against a broadcast map
    * can run in any micro-batch with no shuffle. Robots tables for
    * an ingest stream are the hosts being crawled — bounded — and
    * the `maxHosts` guard fails loudly (the PageRank
    * driver-edge-limit posture) instead of silently collecting an
    * unbounded frame; unbounded tables belong to the batch join
    * spelling. The guard is BYTE-bounded too (`maxBytes`, default
    * 256 MiB of robots bodies): a million hosts × multi-KB bodies
    * is GBs on the driver, and a row count alone would not see it —
    * both bounds are checked in one pre-scan aggregate. */
  def compileRules(robots: DataFrame, agent: String,
                   hostCol: String = "host",
                   bodyCol: String = "robots_txt",
                   maxHosts: Int = 1 << 20,
                   maxBytes: Long = 256L << 20): Map[String, Seq[Rule]] = {
    val sz = robots.agg(
        count(lit(1)).as("n"),
        coalesce(sum(octet_length(col(bodyCol).cast("string"))),
                 lit(0L)).as("bytes"))
      .collect()(0)
    val (n, bytes) = (sz.getLong(0), sz.getLong(1))
    require(n <= maxHosts,
      s"robots table has $n hosts > compileRules bound $maxHosts; " +
      "use the join spelling (Robots.verdicts) for unbounded tables")
    require(bytes <= maxBytes,
      s"robots bodies total $bytes bytes > compileRules bound " +
      s"$maxBytes; use the join spelling (Robots.verdicts) instead")
    robots
      .select(col(hostCol).cast("string"), col(bodyCol).cast("string"))
      .collect()
      .flatMap { r =>
        val h = r.getString(0)
        if (h == null) None
        else Some(h.toLowerCase(Locale.ROOT) ->
                  parseRules(r.getString(1), agent))
      }
      .toMap
  }

  /** Column API over a compiled rule map: `robots_allowed(host,
    * pathq)` as a stateless codegen'd predicate — stream-safe, no
    * join, no shuffle; unknown and NULL hosts are allowed (RFC
    * default, applied via the coalesce wrapper). */
  def allowedColumn(host: Column, pathq: Column,
                    rules: Map[String, Seq[Rule]]): Column =
    coalesce(
      ColumnBridge.column(RobotsAllowed(
        ColumnBridge.expression(host), ColumnBridge.expression(pathq),
        rules)),
      lit(true))

  /** Robots table `(hostCol, bodyCol)` → one row per selected rule:
    * `(host, pattern, allow)`. Each host's file parses exactly once,
    * regardless of how many corpus documents it served. */
  def rulesOf(robots: DataFrame, agent: String,
              hostCol: String = "host",
              bodyCol: String = "robots_txt"): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots
      .select(col(hostCol).cast("string"), col(bodyCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (h, b) =>
        if (h == null) Nil
        else parseRules(b, agent)
          .map(r => (h.toLowerCase(Locale.ROOT), r.pattern, r.allow))
      }
      .toDF("host", "pattern", "allow")
  }

  /** Verdict per document: `docs` + a `robots_allowed` boolean.
    * `idCol` must uniquely key `docs` (the verdict aggregate groups
    * on it). Hosts with no robots row, documents whose path matches
    * no rule, and null/hostless URLs are ALLOWED (RFC default). */
  def verdicts(docs: DataFrame, robots: DataFrame, agent: String,
               urlCol: String = "url",
               idCol: String = "doc_id"): DataFrame = {
    val rules = rulesOf(robots, agent)
    val path = coalesce(parse_url(col(urlCol), lit("PATH")), lit(""))
    val query = parse_url(col(urlCol), lit("QUERY"))
    val pathq = concat(
      when(length(path) === 0, lit("/")).otherwise(path),
      when(query.isNotNull, concat(lit("?"), query)).otherwise(lit("")))
    val keyed = docs
      .withColumn("__robots_host",
        lower(parse_url(col(urlCol), lit("HOST"))))
      .withColumn("__robots_pathq", pathq)
    val verdict = keyed
      .select(col(idCol), col("__robots_host"), col("__robots_pathq"))
      .filter(col("__robots_host").isNotNull)
      .join(rules, col("__robots_host") === rules("host"))
      .filter(robotsMatch(col("pattern"), col("__robots_pathq")))
      .groupBy(col(idCol))
      .agg(max(struct(
        length(col("pattern")).as("spec"),
        col("allow").cast("int").as("a"))).as("__robots_v"))
    keyed
      .join(verdict, Seq(idCol), "left")
      .withColumn("robots_allowed",
        coalesce(col("__robots_v.a") === 1, lit(true)))
      .drop("__robots_v", "__robots_host", "__robots_pathq")
  }

  /** The filter form: only documents the named crawler may keep. */
  def filterAllowed(docs: DataFrame, robots: DataFrame, agent: String,
                    urlCol: String = "url",
                    idCol: String = "doc_id"): DataFrame =
    verdicts(docs, robots, agent, urlCol, idCol)
      .filter(col("robots_allowed"))
      .drop("robots_allowed")

  /** `Sitemap:` directive values of a robots body as an array —
    * RFC 9309 §2.2.4's one standardized "other record": GLOBAL (not
    * group-scoped, so this is line extraction, not group selection),
    * case-insensitive directive name, `#` comments stripped, values
    * are absolute URLs by spec and pass through verbatim. This is
    * how a crawler DISCOVERS a site's sitemaps ([[graft.sources
    * .Sitemap]] then parses them; [[graft.pipelines.Frontier.plan]]
    * schedules the entries) — without it the sitemap stack only
    * works on sitemaps someone already knew about. Pure builtin
    * split/filter expressions: codegen'd, map-shaped, no UDF. */
  /** X-Robots-Tag HTTP-header tokens — the header-level complement
    * of the `<meta name=robots>` tag (it governs NON-HTML responses
    * a meta tag can't reach: PDFs, images, feeds): lowercased,
    * comma-split, trimmed. Directive-with-value forms
    * (`unavailable_after: <date>`) stay one token and so can't fake
    * a bare directive; callers test membership (`noindex`,
    * `nofollow`) remembering `none` implies both (Google's
    * documented semantics). Agent-scoped prefixes (`googlebot:
    * noindex`) likewise stay inside their token — a generic pipeline
    * honors only unscoped directives, the conservative reading.
    * Pure builtin expressions: codegen'd, map-shaped. */
  def xRobotsTokens(header: Column): Column =
    filter(transform(split(lower(coalesce(header, lit(""))), ","),
                     t => trim(t)),
           t => length(t) > 0)

  def sitemapDirectives(body: Column): Column = {
    val lines = split(coalesce(body, lit("")), "\r?\n")
    val vals = transform(lines, l => {
      val noComment = regexp_replace(l, "#.*$", "")
      when(lower(ltrim(noComment)).rlike("^sitemap\\s*:"),
           trim(regexp_replace(ltrim(noComment),
                               "(?i)^sitemap\\s*:", "")))
        .otherwise(lit(null))
    })
    filter(vals, v => v.isNotNull && length(v) > 0)
  }
}

/** `robots_allowed(host, pathq)` against a compiled host → rules map
  * ([[Robots.compileRules]]): the stateless streaming spelling of the
  * robots verdict. Null-propagating like every kernel here; the RFC
  * default (null host → allowed) is applied by
  * [[Robots.allowedColumn]]'s `coalesce(..., true)` wrapper. */
case class RobotsAllowed(left: Expression, right: Expression,
                         rules: Map[String, Seq[Robots.Rule]])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_allowed requires (string, string), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allowed"

  /** Kernel shared by interpreted and generated code (public for the
    * generated call site). */
  def allowedOf(host: UTF8String, pathq: UTF8String): Boolean = {
    val h = host.toString.toLowerCase(Locale.ROOT)
    rules.get(h) match {
      case Some(rs) => Robots.decide(rs, pathq.toString)
      case None => true
    }
  }

  override def nullSafeEval(host: Any, pathq: Any): Any =
    allowedOf(host.asInstanceOf[UTF8String],
              pathq.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("robotsAllowed", this,
      classOf[RobotsAllowed].getName)
    defineCodeGen(ctx, ev, (h, p) => s"$self.allowedOf($h, $p)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsAllowed =
    copy(left = newLeft, right = newRight)
}

/** `robots_match(pattern, path)` — RFC 9309 glob-prefix rule match
  * as a codegen'd predicate (see [[Robots.matches]]). */
case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_match requires (string, string), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_match"

  override def nullSafeEval(pattern: Any, path: Any): Any =
    Robots.matchesPath(pattern.asInstanceOf[UTF8String],
                       path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, s) => s"graft.text.Robots.matchesPath($p, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsMatch =
    copy(left = newLeft, right = newRight)
}
