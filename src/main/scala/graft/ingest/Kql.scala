package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal Kusto CSL front end covering the reference's published query
  * shapes — its shipped test file posts `OmyaData | take 100` and
  * `TelemetryData | count` to `POST /query` (reference
  * `tests/test.http:49,62`, proxied at `src/main.go:88-116,247`) — plus
  * the operators an ADX user reaches next: `where` (incl. `in`/`!in`
  * literal lists and inclusive `between (lo .. hi)`) / `project` /
  * `project-away` / `project-keep` / `project-rename` / `extend` (with
  * +,-,*,/ arithmetic) / `summarize` (count/sum/avg/min/max/dcount,
  * with `by` keys including `bin(...)`) / `top` / `distinct` /
  * `sort by` / `limit` / `join` / `mv-expand` / `parse`.
  *
  * TEMPORAL tier (the queries the reference's hour-partitioned layout
  * exists to serve, `/root/reference/README.md:5`): `datetime(...)`
  * literals, timespan literals (`1h`, `5m`, `30s`, `1d`, `250ms`),
  * `now()`, `ago(1h)`, and `bin(ts, 1h)` — so the canonical ADX
  * telemetry query `T | where ts > ago(1h) | summarize count() by
  * bin(ts, 5m)` translates. `bin` on a timespan floors the timestamp
  * onto the grid with exact epoch-µs integer arithmetic (`u - pmod(u,
  * width)`), which Catalyst folds into the scan-adjacent projection;
  * `bin` on a number is the numeric floor `x - pmod(x, n)`.
  *
  * Translation is to a Spark [[DataFrame]], never to SQL text: a CSL
  * pipeline is already a linear logical plan (table, then a chain of
  * operators), so each stage maps 1:1 onto a DataFrame transform and
  * Catalyst sees exactly the plan the query describes — `where` becomes a
  * pushable Filter, `project` a pruning Project, `take` a CollectLimit,
  * `join`'s right side a full sub-pipeline (its own scan + transforms)
  * that the optimizer is free to broadcast. There is no interpreter in
  * the data path, so a translated query scales identically to its
  * hand-written DataFrame twin.
  *
  * ADX semantics preserved here:
  *   - `count` emits one row with the ADX column name `Count`.
  *   - `sort by` defaults to DESCENDING (ADX default), `asc` to override.
  *   - `contains` / `startswith` / `endswith` are case-INsensitive;
  *     `_cs` variants are case-sensitive — matching ADX's operator table.
  *   - `take` and `limit` are synonyms, `order by` aliases `sort by`.
  *   - `join` defaults to ADX's `innerunique` (left side deduplicated on
  *     the keys before an inner join); keys merge using-join style, so
  *     the key column appears once (ADX keeps a suffixed right copy —
  *     the one deliberate divergence, Spark-first column hygiene).
  *   - `summarize ... by bin(ts, w)` names the key after the binned
  *     column, as ADX does.
  *   - `mv-expand` drops rows whose array is null/empty (ADX default).
  *   - `parse` is `kind=simple`: literals must match from the start;
  *     captured columns are strings, empty on no-match.
  *
  * Everything expressible here is read-only by construction — the
  * gateway's query route leans on that to keep CSL inside the
  * reference's query-only contract.
  */
object Kql {

  /** Shape test for dialect dispatch at the gateway: a CSL query is a
    * bare table identifier optionally followed by `| stage` pipes. No
    * SQL statement begins with a bare non-keyword identifier, so a text
    * matching this shape cannot be valid SQL and the dispatch is
    * unambiguous (and vice versa: `SELECT ...` never matches).
    */
  def looksLikeCsl(text: String): Boolean =
    try {
      tokenize(text) match {
        case Vector(TIdent(t)) => !sqlStarters(t.toLowerCase)
        case TIdent(t) +: TSym("|") +: _ => !sqlStarters(t.toLowerCase)
        case _ => false
      }
    } catch { case _: IllegalArgumentException => false }

  /** Translate a CSL pipeline to a DataFrame over the session catalog.
    * Throws IllegalArgumentException with a position-free message on any
    * construct outside the supported subset (the gateway surfaces it as
    * an HTTP 400, like the reference's proxied ADX errors).
    */
  def translate(s: SparkSession, text: String): DataFrame =
    translate(s, text, None)

  /** [[translate]] with an injectable `now` instant: `now()` and
    * `ago(...)` evaluate against it instead of `current_timestamp()`,
    * making temporal queries deterministic for tests and replays.
    */
  def translate(s: SparkSession, text: String,
      now: Option[java.time.Instant]): DataFrame =
    new Translator(s, now).pipeline(splitPipes(tokenize(text)))

  // SQL statement-leading keywords: a pipeline can't start with these, a
  // SQL text always does — the dispatch hinge for looksLikeCsl
  private val sqlStarters = Set(
    "select", "with", "values", "table", "from", "explain", "describe",
    "desc", "show", "set", "reset", "use", "insert", "update", "delete",
    "merge", "create", "drop", "alter", "truncate", "cache", "uncache",
    "refresh", "analyze", "grant", "revoke", "msck", "load", "declare",
    "begin", "commit", "rollback", "start", "call", "optimize", "vacuum")

  // ------------------------------------------------------------ tokens

  private sealed trait Tok
  private final case class TIdent(v: String) extends Tok
  private final case class TNum(v: String) extends Tok
  private final case class TStr(v: String) extends Tok
  private final case class TSym(v: String) extends Tok
  /** Timespan literal (`1h`, `30s`, `250ms`), normalized to epoch-µs. */
  private final case class TSpan(us: Long) extends Tok
  /** `datetime(...)` literal, normalized to epoch-µs UTC. */
  private final case class TDate(us: Long) extends Tok

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"CSL: $msg")

  private val twoCharSyms = Set("==", "!=", "<=", ">=", "<>")

  // ADX timespan suffixes → µs per unit (d/h/m/s/ms subset)
  private val spanUnits = Map(
    "d" -> 86400000000L, "h" -> 3600000000L, "m" -> 60000000L,
    "s" -> 1000000L, "ms" -> 1000L)

  // yyyy-MM-dd[ |T HH:mm[:ss[.fraction]]][Z] — the ADX datetime() forms
  private val dtRe =
    """(\d{4})-(\d{2})-(\d{2})(?:[ T](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,7}))?)?)?Z?""".r

  /** `datetime(...)` body → epoch-µs UTC, or a clear 400 on any form
    * outside the documented grammar (bad month/day values surface from
    * java.time with the same IllegalArgumentException contract).
    */
  private def datetimeMicros(raw: String): Long = {
    val body = raw.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'")
    body match {
      case dtRe(y, mo, d, h, mi, se, frac) =>
        try {
          val ldt = java.time.LocalDateTime.of(y.toInt, mo.toInt, d.toInt,
            Option(h).map(_.toInt).getOrElse(0),
            Option(mi).map(_.toInt).getOrElse(0),
            Option(se).map(_.toInt).getOrElse(0))
          // fraction is left-aligned decimal; keep µs, drop the 100 ns digit
          val fracUs = Option(frac)
            .map(f => f.padTo(6, '0').take(6).toLong).getOrElse(0L)
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + fracUs
        } catch {
          case e: java.time.DateTimeException =>
            fail(s"invalid datetime '$body': ${e.getMessage}")
        }
      case _ =>
        fail(s"unsupported datetime literal '$body' " +
          "(use datetime(yyyy-MM-dd[ HH:mm:ss[.f]]))")
    }
  }

  private def tokenize(text: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = text.length
    var i = 0
    // '-' before a digit is a numeric sign only in unary position (start
    // of expression or after an operator); after an ident/number/')' it
    // is the arithmetic/`project-away` symbol
    var prev: Option[Tok] = None
    def emit(t: Tok): Unit = { out += t; prev = Some(t) }
    def unaryCtx: Boolean = prev match {
      case None => true
      case Some(TSym(")")) => false
      case Some(TSym(_)) => true
      case _ => false
    }
    while (i < n) {
      val c = text(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val j = i
        while (i < n && (text(i).isLetterOrDigit || text(i) == '_')) i += 1
        val word = text.substring(j, i)
        // datetime(...) lexes as ONE literal token: its body ('-', ':',
        // spaces) would otherwise shatter into arithmetic symbols
        if (word == "datetime" && i < n && text(i) == '(') {
          val close = text.indexOf(')', i + 1)
          if (close < 0) fail("unterminated datetime literal")
          val body = text.substring(i + 1, close)
          i = close + 1
          emit(TDate(datetimeMicros(body)))
        } else emit(TIdent(word))
      } else if (c.isDigit ||
          (c == '-' && i + 1 < n && text(i + 1).isDigit && unaryCtx)) {
        val j = i
        i += 1
        // at most one decimal point, and only digit-adjacent — so the
        // between-range `1..5` lexes as 1, '.', '.', 5, not "1..5"
        var seenDot = false
        while (i < n && (text(i).isDigit ||
            (text(i) == '.' && !seenDot && i + 1 < n && text(i + 1).isDigit))) {
          if (text(i) == '.') seenDot = true
          i += 1
        }
        val num = text.substring(j, i)
        // a unit suffix glued to the number is a timespan literal (1h,
        // 30s, 250ms); any other letter run here is malformed anyway
        val uj = i
        while (i < n && text(i).isLetter) i += 1
        val unit = text.substring(uj, i)
        if (unit.isEmpty) emit(TNum(num))
        else spanUnits.get(unit) match {
          case Some(usPer) => emit(TSpan(math.round(num.toDouble * usPer)))
          case None => fail(s"unknown timespan unit '$unit' in '$num$unit'")
        }
      } else if (c == '"' || c == '\'') {
        val q = c
        val sb = new StringBuilder
        i += 1
        while (i < n && text(i) != q) {
          if (text(i) == '\\' && i + 1 < n) { sb += text(i + 1); i += 2 }
          else { sb += text(i); i += 1 }
        }
        if (i >= n) fail("unterminated string literal")
        i += 1
        emit(TStr(sb.toString))
      } else {
        val two = if (i + 1 < n) text.substring(i, i + 2) else ""
        if (twoCharSyms(two)) { emit(TSym(two)); i += 2 }
        else if ("|(),<>=!+-*/.".indexOf(c) >= 0) { emit(TSym(c.toString)); i += 1 }
        else fail(s"unexpected character '$c'")
      }
    }
    out.result()
  }

  // top-level split only: '|' inside string literals is already consumed
  // by the tokenizer, and '|' inside parens belongs to a join's
  // sub-pipeline, so only depth-0 TSym("|") is a stage boundary
  private def splitPipes(toks: Vector[Tok]): Vector[Vector[Tok]] = {
    val stages = Vector.newBuilder[Vector[Tok]]
    var cur = Vector.newBuilder[Tok]
    var depth = 0
    toks.foreach {
      case TSym("|") if depth == 0 =>
        stages += cur.result(); cur = Vector.newBuilder[Tok]
      case t =>
        t match {
          case TSym("(") => depth += 1
          case TSym(")") => depth -= 1
          case _ => ()
        }
        cur += t
    }
    stages += cur.result()
    val out = stages.result()
    if (out.exists(_.isEmpty)) fail("empty pipeline stage")
    out
  }

  private def splitOn(toks: Vector[Tok], sep: Tok): Vector[Vector[Tok]] = {
    val parts = Vector.newBuilder[Vector[Tok]]
    var cur = Vector.newBuilder[Tok]
    var depth = 0
    toks.foreach {
      case t if t == sep && depth == 0 =>
        parts += cur.result(); cur = Vector.newBuilder[Tok]
      case t =>
        t match {
          case TSym("(") => depth += 1
          case TSym(")") => depth -= 1
          case _ => ()
        }
        cur += t
    }
    parts += cur.result()
    val out = parts.result()
    if (out.exists(_.isEmpty)) fail("empty list item")
    out
  }

  // ------------------------------------------------------- translator

  /** Stage/expression translation, bound to a session (for `join`'s
    * right-side table resolution) and a `now` column (for `ago`/`now`).
    */
  private final class Translator(s: SparkSession,
      nowOverride: Option[java.time.Instant]) {

    private val nowTs: Column =
      nowOverride.map(i => lit(java.sql.Timestamp.from(i)))
        .getOrElse(current_timestamp())

    def pipeline(stages: Vector[Vector[Tok]]): DataFrame = {
      val source = stages.head match {
        case Vector(TIdent(t)) => s.table(t)
        case _ => fail("a CSL query must start with a table name")
      }
      stages.tail.foldLeft(source)(applyStage)
    }

    // ---------------------------------------------------------- stages

    private def applyStage(df: DataFrame, st: Vector[Tok]): DataFrame =
      st match {
        case Vector(TIdent(op), TNum(k)) if op == "take" || op == "limit" =>
          df.limit(k.toInt)
        case Vector(TIdent("count")) =>
          df.agg(count(lit(1)).as("Count"))
        case TIdent("where") +: rest =>
          df.filter(parsePredicate(rest))
        // the project-* family tokenizes as ident '-' ident
        case TIdent("project") +: TSym("-") +: TIdent("away") +: rest =>
          df.drop(parseNameList(rest): _*)
        case TIdent("project") +: TSym("-") +: TIdent("keep") +: rest =>
          // ADX keeps the TABLE's column order, not the list's
          val keep = parseNameList(rest).toSet
          df.select(df.columns.filter(keep).map(col).toSeq: _*)
        case TIdent("project") +: TSym("-") +: TIdent("rename") +: rest =>
          // project-rename new = old, ...: renames in place, keeps the rest
          parseRenameItems(rest).foldLeft(df) { case (d, (to, from)) =>
            d.withColumnRenamed(from, to)
          }
        case TIdent("project") +: rest =>
          df.select(parseProjection(rest): _*)
        case TIdent("summarize") +: rest =>
          applySummarize(df, rest)
        case TIdent("extend") +: rest =>
          parseExtendItems(rest).foldLeft(df) { case (d, (name, e)) =>
            d.withColumn(name, e)
          }
        case TIdent("top") +: TNum(k) +: TIdent("by") +: rest =>
          // ADX `top N by key [asc|desc]`, default DESCENDING — orderBy +
          // limit compiles to TakeOrderedAndProject (per-partition heap)
          df.orderBy(parseSortKeys(rest): _*).limit(k.toInt)
        case Vector(TIdent("distinct"), TSym("*")) =>
          df.distinct()
        case TIdent("distinct") +: rest =>
          df.select(parseNameList(rest).map(col): _*).distinct()
        case TIdent(op) +: TIdent("by") +: rest if op == "sort" || op == "order" =>
          df.orderBy(parseSortKeys(rest): _*)
        case TIdent("join") +: rest =>
          applyJoin(df, rest)
        case TIdent("mv") +: TSym("-") +: TIdent("expand") +: rest =>
          rest match {
            // ADX default: a null/empty array contributes no rows
            case Vector(TIdent(c)) => df.withColumn(c, explode(col(c)))
            case _ => fail("mv-expand takes exactly one array column")
          }
        case TIdent("parse") +: rest =>
          applyParse(df, rest)
        case TIdent(op) +: _ =>
          fail(s"unsupported operator '$op'")
        case _ =>
          fail("malformed pipeline stage")
      }

    // ------------------------------------------------------------ join
    //   join := ['kind' '=' ident] ('(' pipeline ')' | table)
    //           'on' ident (',' ident)*
    //   Right side is a FULL sub-pipeline; equality keys only (the ADX
    //   `$left.x == $right.y` form is out of subset). Keys merge
    //   using-join style.

    private def applyJoin(df: DataFrame, toks: Vector[Tok]): DataFrame = {
      var rem = toks
      val kind = rem match {
        case TIdent("kind") +: TSym("=") +: TIdent(k) +: t => rem = t; k
        case _ => "innerunique" // the ADX default
      }
      val (rightToks, afterRight) = rem match {
        case TSym("(") +: t =>
          var depth = 1
          var idx = 0
          while (idx < t.length && depth > 0) {
            t(idx) match {
              case TSym("(") => depth += 1
              case TSym(")") => depth -= 1
              case _ => ()
            }
            idx += 1
          }
          if (depth != 0) fail("unbalanced parens in join right side")
          (t.take(idx - 1), t.drop(idx))
        case TIdent(tbl) +: t => (Vector[Tok](TIdent(tbl)), t)
        case _ => fail("join needs a right side: (pipeline) or a table name")
      }
      val keys = afterRight match {
        case TIdent("on") +: keyToks => parseNameList(keyToks)
        case _ => fail("join requires `on key[, key]` (equality keys only)")
      }
      val right = pipeline(splitPipes(rightToks))
      kind match {
        case "inner" => df.join(right, keys, "inner")
        // ADX innerunique: left side deduplicated on the keys first
        // (which left row survives is arbitrary — same as ADX)
        case "innerunique" => df.dropDuplicates(keys).join(right, keys, "inner")
        case "leftouter" => df.join(right, keys, "left")
        case "rightouter" => df.join(right, keys, "right")
        case "fullouter" => df.join(right, keys, "full")
        case "leftanti" | "anti" => df.join(right, keys, "left_anti")
        case "leftsemi" => df.join(right, keys, "left_semi")
        case other => fail(s"unsupported join kind '$other'")
      }
    }

    // ----------------------------------------------------------- parse
    //   parse := ['kind' '=' 'simple'] column 'with' item+
    //   item  := string-literal | '*' | ident (a captured column)
    //   kind=simple compiles to ONE anchored regex: literals are quoted,
    //   '*' skips non-greedily, captures are non-greedy except a trailing
    //   capture (which takes the rest). Captured columns are strings,
    //   empty when the pattern does not match — regexp_extract semantics
    //   on both engines.

    private def applyParse(df: DataFrame, toks: Vector[Tok]): DataFrame = {
      val (srcCol, patToks) = toks match {
        case TIdent("kind") +: TSym("=") +: TIdent("simple") +: TIdent(c) +:
            TIdent("with") +: p => (c, p)
        case TIdent("kind") +: TSym("=") +: TIdent(k) +: _ =>
          fail(s"unsupported parse kind '$k' (only kind=simple)")
        case TIdent(c) +: TIdent("with") +: p => (c, p)
        case _ => fail("parse must be `parse [kind=simple] col with pattern`")
      }
      if (patToks.isEmpty) fail("parse needs a pattern")
      val sb = new StringBuilder("^")
      val names = Vector.newBuilder[String]
      patToks.zipWithIndex.foreach { case (t, ix) =>
        val isLast = ix == patToks.length - 1
        t match {
          case TStr(v) => sb ++= java.util.regex.Pattern.quote(v)
          case TSym("*") => sb ++= (if (isLast) ".*" else ".*?")
          case TIdent(nm) =>
            names += nm
            sb ++= (if (isLast) "(.*)" else "(.*?)")
          case other =>
            fail(s"parse pattern items must be literals, columns, or *, got $other")
        }
      }
      val pat = sb.toString
      names.result().zipWithIndex.foldLeft(df) { case (d, (nm, gi)) =>
        d.withColumn(nm, regexp_extract(col(srcCol), pat, gi + 1))
      }
    }

    // ------------------------------------------------------- summarize
    //   summarize := aggItem (',' aggItem)* ['by' byItem (',' byItem)*]
    //   aggItem   := [ident '='] aggCall
    //   aggCall   := count '(' ')' | (sum|avg|min|max|dcount) '(' arith ')'
    //   byItem    := ident | ident '=' arith | bin '(' col ',' width ')'
    //   Default ADX-style output names: count_ / sum_x / avg_x / ...;
    //   a bin() key is named after its column (ADX behavior).
    //   `dcount` is translated to the EXACT distinct count (ADX's is an
    //   HLL estimate) — exactness keeps the result oracle-comparable; the
    //   approximate twin is q_agg_approx_distinct.

    private def applySummarize(df: DataFrame, toks: Vector[Tok]): DataFrame = {
      val byIdx = toks.indexOf(TIdent("by"))
      val (aggToks, keys) =
        if (byIdx < 0) (toks, Vector.empty[Column])
        else (toks.take(byIdx), parseByItems(toks.drop(byIdx + 1)))
      val aggs = splitOn(aggToks, TSym(",")).map(parseAggItem)
      if (aggs.isEmpty) fail("summarize needs at least one aggregate")
      val grouped =
        if (keys.isEmpty) df.groupBy()
        else df.groupBy(keys: _*)
      grouped.agg(aggs.head, aggs.tail: _*)
    }

    private def parseByItems(toks: Vector[Tok]): Vector[Column] =
      splitOn(toks, TSym(",")).map {
        case Vector(TIdent(a)) => col(a)
        case TIdent(alias) +: TSym("=") +: e if e.nonEmpty =>
          parseArithToks(e).as(alias)
        // `by bin(ts, 1h)` keeps the column's name, matching ADX
        case bt @ (TIdent("bin") +: TSym("(") +: TIdent(c0) +: _) =>
          parseArithToks(bt).as(c0)
        case other =>
          fail(s"by keys must be a column, `alias = expr`, or bin(col, width), got $other")
      }

    private def parseAggItem(toks: Vector[Tok]): Column = toks match {
      case TIdent(alias) +: TSym("=") +: callToks =>
        parseAggCall(callToks).as(alias)
      case callToks =>
        parseAggCall(callToks) // carries its ADX default name
    }

    private def parseAggCall(toks: Vector[Tok]): Column = toks match {
      case Vector(TIdent("count"), TSym("("), TSym(")")) =>
        count(lit(1)).as("count_")
      case TIdent(fn) +: TSym("(") +: inner :+ TSym(")") =>
        val defaultName = inner match {
          case Vector(TIdent(c)) => s"${fn}_$c"
          case _ => s"${fn}_"
        }
        val arg = parseArithToks(inner)
        val agg = fn match {
          case "sum" => sum(arg)
          case "avg" => avg(arg)
          case "min" => min(arg)
          case "max" => max(arg)
          case "dcount" => count_distinct(arg)
          case other => fail(s"unsupported aggregate '$other'")
        }
        agg.as(defaultName)
      case _ => fail("aggregates must be `[alias =] fn(expr)`")
    }

    // ---------------------------------------------------------- extend
    //   extend := item (',' item)* ; item := ident '=' arith

    private def parseExtendItems(toks: Vector[Tok]): Vector[(String, Column)] =
      splitOn(toks, TSym(",")).map {
        case TIdent(name) +: TSym("=") +: expr if expr.nonEmpty =>
          (name, parseArithToks(expr))
        case _ => fail("extend items must be `name = expression`")
      }

    // ------------------------------------------------------- predicate
    //   orExpr  := andExpr ('or' andExpr)*
    //   andExpr := term ('and' term)*
    //   term    := '(' orExpr ')' | 'not' term | operand CMP operand

    private def parsePredicate(toks: Vector[Tok]): Column = {
      val c = new Cur(toks)
      val e = parseOr(c)
      if (!c.done) fail("trailing tokens after predicate")
      e
    }

    private def parseOr(c: Cur): Column = {
      var l = parseAnd(c)
      while (c.peek.contains(TIdent("or"))) { c.next(); l = l || parseAnd(c) }
      l
    }

    private def parseAnd(c: Cur): Column = {
      var l = parseTerm(c)
      while (c.peek.contains(TIdent("and"))) { c.next(); l = l && parseTerm(c) }
      l
    }

    private def parseTerm(c: Cur): Column = c.peek match {
      case Some(TSym("(")) =>
        c.next(); val e = parseOr(c); c.expect(TSym(")")); e
      case Some(TIdent("not")) =>
        c.next(); !parseTerm(c)
      case _ =>
        val l = parseArith(c)
        c.next() match {
          case TSym("==") | TSym("=") => l === parseArith(c)
          case TSym("!=") | TSym("<>") => l =!= parseArith(c)
          case TSym("<") => l < parseArith(c)
          case TSym("<=") => l <= parseArith(c)
          case TSym(">") => l > parseArith(c)
          case TSym(">=") => l >= parseArith(c)
          // ADX: bare string operators are case-INsensitive, _cs exact
          case TIdent("contains") => lower(l).contains(lower(operand(c)))
          case TIdent("contains_cs") => l.contains(operand(c))
          case TIdent("startswith") => lower(l).startsWith(lower(operand(c)))
          case TIdent("startswith_cs") => l.startsWith(operand(c))
          case TIdent("endswith") => lower(l).endsWith(lower(operand(c)))
          case TIdent("endswith_cs") => l.endsWith(operand(c))
          // ADX `x in (a, b, c)` / `x !in (...)` — literal lists only
          case TIdent("in") => l.isin(parseLitList(c): _*)
          case TSym("!") if c.peek.contains(TIdent("in")) =>
            c.next(); !l.isin(parseLitList(c): _*)
          case TIdent("between") =>
            // ADX: `x between (lo .. hi)`, bounds inclusive
            c.expect(TSym("("))
            val lo = parseArith(c)
            c.expect(TSym(".")); c.expect(TSym("."))
            val hi = parseArith(c)
            c.expect(TSym(")"))
            l >= lo && l <= hi
          case t => fail(s"unsupported comparison $t")
        }
    }

    /** Parenthesized literal list for `in`: '(' lit (',' lit)* ')'. */
    private def parseLitList(c: Cur): Seq[Any] = {
      c.expect(TSym("("))
      val items = Seq.newBuilder[Any]
      var done = false
      while (!done) {
        items += (c.next() match {
          case TNum(v) => if (v.contains('.')) v.toDouble else v.toLong
          case TStr(v) => v
          case t => fail(s"in-list items must be literals, got $t")
        })
        c.next() match {
          case TSym(",") => ()
          case TSym(")") => done = true
          case t => fail(s"expected ',' or ')' in list, got $t")
        }
      }
      items.result()
    }

    // ------------------------------------------------------ arithmetic
    //   arith := mul (('+'|'-') mul)* ; mul := atom (('*'|'/') atom)*
    //   atom  := '(' arith ')' | fnCall | column | literal
    //   fnCall := bin(x, width) | ago(span) | now()

    private def parseArithToks(toks: Vector[Tok]): Column = {
      val c = new Cur(toks)
      val e = parseArith(c)
      if (!c.done) fail("trailing tokens after expression")
      e
    }

    private def parseArith(c: Cur): Column = {
      var l = parseMul(c)
      var cont = true
      while (cont) c.peek match {
        case Some(TSym("+")) => c.next(); l = l + parseMul(c)
        case Some(TSym("-")) => c.next(); l = l - parseMul(c)
        case _ => cont = false
      }
      l
    }

    private def parseMul(c: Cur): Column = {
      var l = parseAtom(c)
      var cont = true
      while (cont) c.peek match {
        case Some(TSym("*")) => c.next(); l = l * parseAtom(c)
        case Some(TSym("/")) => c.next(); l = l / parseAtom(c)
        case _ => cont = false
      }
      l
    }

    private def parseAtom(c: Cur): Column = (c.peek, c.peek2) match {
      case (Some(TSym("(")), _) =>
        c.next(); val e = parseArith(c); c.expect(TSym(")")); e
      case (Some(TIdent(fn)), Some(TSym("("))) => parseFnCall(c, fn)
      case _ => operand(c)
    }

    private def parseFnCall(c: Cur, fn: String): Column = {
      c.next(); c.next() // consume ident and '('
      fn match {
        case "now" =>
          c.expect(TSym(")"))
          nowTs
        case "ago" =>
          val d = c.next() match {
            case TSpan(us) => us
            case t => fail(s"ago() takes a timespan literal, got $t")
          }
          c.expect(TSym(")"))
          nowTs - lit(java.time.Duration.of(d,
            java.time.temporal.ChronoUnit.MICROS))
        case "bin" =>
          val x = parseArith(c)
          c.expect(TSym(","))
          val out = c.next() match {
            case TSpan(us) =>
              if (us <= 0) fail("bin() width must be positive")
              // exact epoch-µs floor onto the grid — integer arithmetic,
              // so row-group stats and pushdown survive the projection
              val u = unix_micros(x.cast("timestamp"))
              timestamp_micros(u - pmod(u, lit(us)))
            case TNum(v) =>
              val width: Column =
                if (v.contains('.')) lit(v.toDouble) else lit(v.toLong)
              x - pmod(x, width)
            case t => fail(s"bin() width must be a timespan or number, got $t")
          }
          c.expect(TSym(")"))
          out
        case other => fail(s"unsupported function '$other'")
      }
    }

    private def operand(c: Cur): Column = c.next() match {
      case TIdent("true") => lit(true)
      case TIdent("false") => lit(false)
      case TIdent(name) => col(name)
      case TNum(v) =>
        if (v.contains('.')) lit(v.toDouble) else lit(v.toLong)
      case TStr(v) => lit(v)
      case TDate(us) => timestamp_micros(lit(us))
      // a bare timespan in arithmetic is a day-time interval, so
      // `ago(1h) + 30m` and `ts > now() - 1d` type-check as timestamps
      case TSpan(us) => lit(java.time.Duration.of(us,
        java.time.temporal.ChronoUnit.MICROS))
      case t => fail(s"expected a column, number, string, datetime, or timespan, got $t")
    }

    // ------------------------------------------------------ projection
    //   project := item (',' item)*
    //   item    := ident | ident '=' ident        (ADX rename form)

    private def parseProjection(toks: Vector[Tok]): Seq[Column] = {
      val items = splitOn(toks, TSym(","))
      if (items.isEmpty) fail("project needs at least one column")
      items.map {
        case Vector(TIdent(a)) => col(a)
        case Vector(TIdent(alias), TSym("="), TIdent(src)) => col(src).as(alias)
        case _ => fail("project items must be `col` or `alias = col`")
      }
    }

    // --------------------------------------------------------- sort by
    //   keys := key (',' key)* ; key := ident ['asc' | 'desc']
    //   ADX default order is DESCENDING.

    private def parseSortKeys(toks: Vector[Tok]): Seq[Column] =
      splitOn(toks, TSym(",")).map {
        case Vector(TIdent(a)) => col(a).desc
        case Vector(TIdent(a), TIdent("desc")) => col(a).desc
        case Vector(TIdent(a), TIdent("asc")) => col(a).asc
        case _ => fail("sort keys must be `col [asc|desc]`")
      }

    /** project-rename items: `new = old` pairs. */
    private def parseRenameItems(toks: Vector[Tok]): Vector[(String, String)] =
      splitOn(toks, TSym(",")).map {
        case Vector(TIdent(to), TSym("="), TIdent(from)) => (to, from)
        case _ => fail("project-rename items must be `newName = oldName`")
      }

    /** Comma-separated bare column names (project-away, distinct, on). */
    private def parseNameList(toks: Vector[Tok]): Vector[String] =
      splitOn(toks, TSym(",")).map {
        case Vector(TIdent(a)) => a
        case other => fail(s"expected a column name, got $other")
      }
  }

  // ------------------------------------------------------------ cursor

  private final class Cur(toks: Vector[Tok]) {
    private var i = 0
    def peek: Option[Tok] = toks.lift(i)
    def peek2: Option[Tok] = toks.lift(i + 1)
    def next(): Tok =
      { val t = toks.lift(i).getOrElse(fail("unexpected end of expression")); i += 1; t }
    def done: Boolean = i >= toks.length
    def expect(t: Tok): Unit = if (next() != t) fail(s"expected $t")
  }
}
