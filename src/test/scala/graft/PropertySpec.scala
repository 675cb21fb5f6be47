package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.ingest.Ingest
import graft.ingest.Ingest.TimeSeriesData

/** Property-based invariants (SURVEY.md §5.2 item 3), driven by
  * ScalaCheck generators over small Spark jobs: parquet round-trip
  * fidelity, state-register monotonicity / permutation-invariance, and
  * dedup idempotence. Sample counts are small — each case is a Spark
  * job — but inputs are adversarial (random sizes, duplicate keys,
  * permutations), which fixed fixtures can't cover.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, samples: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(samples)
        .withInitialSeed(Seed(42L)),
      prop)
    assert(res.passed, s"$name failed: $res")
  }

  private val rowGen: Gen[TimeSeriesData] = for {
    ts <- Gen.chooseNum(1600000000000L, 1700000000000L)
    off <- Gen.chooseNum(-12L, 12L)
    pid <- Gen.stringOfN(8, Gen.alphaNumChar)
    seq <- Gen.chooseNum(0L, 1000L)
    proj <- Gen.oneOf("p1", "p2", "p3")
    v <- Gen.chooseNum(-1000.0, 1000.0)
    r <- Gen.oneOf("r1", "r2")
    q <- Gen.chooseNum(0L, 3L)
  } yield TimeSeriesData(ts, off, pid, seq, proj, v, r, q)

  test("parquet round-trip preserves data for arbitrary batches (A4/A5)") {
    val prop = Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val out = Files.createTempDirectory("graft_prop_rt").toString
      val df = Ingest.withPartitionColumns(
        rows.toDF(), lit("prop-src"), col("timestamp"))
      Ingest.writeBatch(df, out)
      Ingest.writeBatch(df, out) // overwrite idempotence under the property too
      val back = spark.read.parquet(out)
        .select("timestamp", "timeOffsetHours", "pointId", "sequence",
          "project", "value", "res", "quality")
        .as[TimeSeriesData].collect().sortBy(r => (r.timestamp, r.pointId, r.value))
      val expect = rows.sortBy(r => (r.timestamp, r.pointId, r.value))
      back.toSeq == expect
    }
    check("parquet-roundtrip", prop, samples = 6)
  }

  test("packShards two-level prefix sum equals the sequential cut on arbitrary corpora") {
    // adversarial shapes the fixture corpus can't produce: tiny corpora
    // (fewer docs than buckets), giant single docs straddling many
    // shards, zero-token docs, sparse/duplicate-free id spaces
    val docGen = for {
      nTok <- Gen.frequency(5 -> Gen.chooseNum(0L, 400L),
        1 -> Gen.chooseNum(3000L, 9000L))
    } yield nTok
    val corpusGen = Gen.nonEmptyListOf(docGen).map(_.take(200))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong * 7L, t) })
    val prop = Prop.forAll(corpusGen) { docs =>
      val df = docs.toDF("doc_id", "n_tok")
      val got = graft.ops.Curation.packShards(df,
          df.agg(max("doc_id").as("max_id")))
        .select("doc_id", "shard_id")
        .as[(Long, Long)].collect().toMap
      // sequential single-pass reference
      var cum = 0L
      val want = docs.sortBy(_._1).map { case (id, t) =>
        val start = cum; cum += t; id -> start / 2048L
      }.toMap
      got == want
    }
    check("pack-shards-prefix-sum", prop, samples = 8)
  }

  test("maxTimestamp register is permutation-invariant and monotonic across batches (A8)") {
    val batchesGen = Gen.nonEmptyListOf(Gen.nonEmptyListOf(rowGen)).map(_.take(4))
    val prop = Prop.forAll(batchesGen) { batches =>
      // ledger rows: (timestamp, timeGenerated, arrivalSeq) with arrival
      // order fixed at generation time
      val ledgerRows = batches.zipWithIndex.flatMap { case (b, i) =>
        b.map(r => (r.timestamp, 1000L + i, i.toLong))
      }
      def registers(rows: Seq[(Long, Long, Long)]): (Long, Long) = {
        val df = rows.toDF("timestamp", "timeGenerated", "arrivalSeq")
        val row = Ingest.stateRegisters(df).collect().head
        (row.getLong(0), row.getLong(1))
      }
      val inOrder = registers(ledgerRows)
      val permuted = registers(scala.util.Random.shuffle(ledgerRows))
      // monotonic: the register after k batches never decreases in k
      val prefixes = batches.indices.map { k =>
        registers(ledgerRows.filter(_._3 <= k))._1
      }
      inOrder == permuted &&
        prefixes.zip(prefixes.tail).forall { case (a, b) => a <= b } &&
        inOrder._1 == ledgerRows.map(_._1).max
    }
    check("register-monotonicity", prop, samples = 6)
  }

  test("dedup is idempotent and keeps exactly one row per key (A5/q_dedup_ids)") {
    // generator biased toward duplicate keys: ids drawn from a small range
    val dupRowsGen = Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0L, 20L)
      v <- Gen.chooseNum(0.0, 100.0)
    } yield (id, v))
    val prop = Prop.forAll(dupRowsGen) { rows =>
      val df = rows.toDF("event_id", "value")
      val once = df.dropDuplicates("event_id")
      val twice = once.dropDuplicates("event_id")
      val onceRows = once.collect().map(_.getLong(0)).sorted.toSeq
      val twiceRows = twice.collect().map(_.getLong(0)).sorted.toSeq
      onceRows == twiceRows &&
        onceRows == rows.map(_._1).distinct.sorted &&
        once.count() == rows.map(_._1).distinct.size
    }
    check("dedup-idempotence", prop, samples = 8)
  }

  test("greedy merge fold equals the local greedy reference on random inputs") {
    // the production expr builder (shared by q_phrase_rewrite and
    // q_bpe_train) vs a direct sequential reimplementation — the same
    // semantics the DuckDB oracles express via islands + run parity
    val tokGen = Gen.oneOf("a", "b", "c", "d")
    val caseGen = for {
      n <- Gen.chooseNum(0, 12)
      toks <- Gen.listOfN(n, tokGen)
      nP <- Gen.chooseNum(0, 6)
      phrases <- Gen.listOfN(nP,
        for { x <- tokGen; y <- tokGen } yield s"$x $y")
    } yield (toks, phrases.distinct)
    val prop = Prop.forAll(caseGen) { case (toks, phrases) =>
      val local = {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i < toks.length - 1 && phrases.contains(toks(i) + " " + toks(i + 1))) {
            out += toks(i) + "_" + toks(i + 1); i += 2
          } else { out += toks(i); i += 1 }
        }
        out.toSeq
      }
      val got = Seq((toks, phrases)).toDF("syms", "ph")
        .select(expr(graft.ops.Text.greedyFoldExpr(
          "array_contains(ph, concat(element_at(syms, i), ' ', element_at(syms, i + 1)))",
          "concat(element_at(syms, i), '_', element_at(syms, i + 1))")).as("p"))
        .as[Seq[String]].head()
      got == local
    }
    check("greedy fold", prop, 40)
  }

  test("TopKAggregator merge is order-insensitive and equals a direct sort") {
    // pure aggregator-algebra property: any partitioning of the input
    // into reduce/merge trees must give the same top-K as sorting
    val agg = new graft.functions.TopKAggregator(3)
    // NaN and infinities included: the buffer order must be a TOTAL
    // order (Double.compare ranks NaN above +Inf), or NaN keys make the
    // result depend on arrival order
    val rowsGen = Gen.nonEmptyListOf(for {
      v <- Gen.frequency(
        8 -> Gen.chooseNum(-100.0, 100.0),
        1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))
      id <- Gen.chooseNum(0L, 50L)
    } yield (v, id))
    val prop = Prop.forAll(rowsGen, Gen.chooseNum(1, 5)) { (rows, splits) =>
      // the aggregator's contract is top-K over DISTINCT pairs, so the
      // sort-based twin distincts while the input keeps its duplicates —
      // a duplicated pair must not occupy two of the K slots. The twin
      // must use the AGGREGATOR's value-equivalence (NaN ≡ NaN), not
      // Scala tuple ==, whose primitive NaN != NaN would keep NaN
      // duplicates the aggregator rightly merges and makes any list
      // containing a NaN entry compare unequal to itself
      def sameVal(a: Double, b: Double) = a == b || (a.isNaN && b.isNaN)
      def samePairs(x: Seq[(Double, Long)], y: Seq[(Double, Long)]) =
        x.size == y.size && x.zip(y).forall {
          case (p, q) => sameVal(p._1, q._1) && p._2 == q._2
        }
      val expect = rows.foldLeft(List.empty[(Double, Long)]) { (acc, p) =>
        if (acc.exists(e => sameVal(e._1, p._1) && e._2 == p._2)) acc
        else acc :+ p
      }.sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2)
      }.take(3)
      // arbitrary partitioning: reduce each slice, then merge in order
      val slices = rows.grouped(math.max(1, rows.size / splits)).toList
      val merged = slices.map(_.foldLeft(agg.zero)(agg.reduce))
        .reduceLeft(agg.merge)
      val rev = slices.reverse.map(_.foldLeft(agg.zero)(agg.reduce))
        .reduceLeft(agg.merge) // commuted merge order
      samePairs(agg.finish(merged), expect) && samePairs(agg.finish(rev), expect)
    }
    check("topk-merge-algebra", prop, samples = 30)
  }

  test("SimHashAggregator is split-invariant and equals the direct bit-balance formula") {
    val agg = graft.functions.SimHashAggregator
    def direct(hs: List[Long]): Long = {
      val bal = new Array[Long](64)
      hs.foreach(h => (0 until 64).foreach(j => bal(j) += ((h >>> j) & 1L) * 2L - 1L))
      (0 until 64).foldLeft(0L)((s, j) => if (bal(j) > 0) s | (1L << j) else s)
    }
    val hsGen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    val prop = Prop.forAll(hsGen, Gen.chooseNum(1, 5)) { (hs, splits) =>
      val slices = hs.grouped(math.max(1, hs.size / splits)).toList
      val merged = slices.map(_.foldLeft(agg.zero)(agg.reduce)).reduceLeft(agg.merge)
      val rev = slices.reverse.map(_.foldLeft(agg.zero)(agg.reduce)).reduceLeft(agg.merge)
      agg.finish(merged) == direct(hs) && agg.finish(rev) == direct(hs)
    }
    check("simhash-merge-algebra", prop, samples = 30)
  }

  test("BloomAggregator never yields a false negative under any split") {
    val m = 4096
    val agg = new graft.functions.BloomAggregator(m, 3)
    def contains(bits: Array[Long], key: Long): Boolean =
      (0 until 3).forall { i =>
        val p = ((key >>> (12 * i)) % m).toInt
        (bits(p / 64) >>> (p % 64) & 1L) == 1L
      }
    val keysGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, (1L << 48) - 1))
    val prop = Prop.forAll(keysGen, Gen.chooseNum(1, 4)) { (keys, splits) =>
      val slices = keys.grouped(math.max(1, keys.size / splits)).toList
      val bits = slices.map(_.foldLeft(agg.zero)(agg.reduce))
        .reduceLeft(agg.merge)
      keys.forall(contains(bits, _))
    }
    check("bloom-no-false-negative", prop, samples = 30)
  }

  test("KQL predicate grammar is equivalent to its DataFrame denotation on random trees") {
    import org.apache.spark.sql.Column
    // a random predicate AST rendered BOTH as CSL text and as the Column
    // it should denote: the translated filter must select exactly the
    // same rows. Exercises precedence, parens, not, in/!in, between, and
    // typed comparisons — the parser paths a fixed fixture can't sweep.
    sealed trait P
    case class Cmp(c: String, op: String, lit: String) extends P
    case class InL(c: String, vals: List[String], neg: Boolean) extends P
    case class Btw(c: String, lo: Long, hi: Long) extends P
    case class AndP(a: P, b: P) extends P
    case class OrP(a: P, b: P) extends P
    case class NotP(a: P) extends P

    val ops = Seq("==", "!=", "<", "<=", ">", ">=")
    val cmpGen: Gen[P] = for {
      pair <- Gen.oneOf(
        Gen.chooseNum(-5L, 5L).map(v => ("a", v.toString)),
        Gen.chooseNum(-4, 4).map(v => ("b", s"$v.5")),
        Gen.oneOf("x", "y", "zz").map(v => ("s", s"'$v'")))
      op <- Gen.oneOf(ops)
    } yield Cmp(pair._1, op, pair._2)
    val inGen: Gen[P] = for {
      vals <- Gen.nonEmptyListOf(Gen.oneOf("x", "y", "zz")).map(_.distinct)
      neg <- Gen.oneOf(true, false)
    } yield InL("s", vals, neg)
    val btwGen: Gen[P] = for {
      lo <- Gen.chooseNum(-5L, 3L)
      span <- Gen.chooseNum(0L, 4L)
    } yield Btw("a", lo, lo + span)
    def pGen(depth: Int): Gen[P] =
      if (depth <= 0) Gen.oneOf(cmpGen, inGen, btwGen)
      else Gen.frequency(
        3 -> cmpGen, 1 -> inGen, 1 -> btwGen,
        2 -> Gen.zip(pGen(depth - 1), pGen(depth - 1)).map(t => AndP(t._1, t._2)),
        2 -> Gen.zip(pGen(depth - 1), pGen(depth - 1)).map(t => OrP(t._1, t._2)),
        1 -> pGen(depth - 1).map(NotP))

    def csl(p: P): String = p match {
      case Cmp(c, op, l) => s"$c $op $l"
      case InL(c, vs, neg) =>
        s"$c ${if (neg) "!in" else "in"} (${vs.map(v => s"'$v'").mkString(", ")})"
      case Btw(c, lo, hi) => s"$c between ($lo .. $hi)"
      case AndP(a, b) => s"(${csl(a)}) and (${csl(b)})"
      case OrP(a, b) => s"(${csl(a)}) or (${csl(b)})"
      case NotP(a) => s"not (${csl(a)})"
    }
    def colOf(p: P): Column = p match {
      case Cmp(c, op, l) =>
        val lc: Column =
          if (l.startsWith("'")) lit(l.stripPrefix("'").stripSuffix("'"))
          else if (l.contains('.')) lit(l.toDouble) else lit(l.toLong)
        op match {
          case "==" => col(c) === lc
          case "!=" => col(c) =!= lc
          case "<" => col(c) < lc
          case "<=" => col(c) <= lc
          case ">" => col(c) > lc
          case ">=" => col(c) >= lc
        }
      case InL(c, vs, neg) =>
        val e = col(c).isin(vs: _*); if (neg) !e else e
      case Btw(c, lo, hi) => col(c) >= lo && col(c) <= hi
      case AndP(a, b) => colOf(a) && colOf(b)
      case OrP(a, b) => colOf(a) || colOf(b)
      case NotP(a) => !colOf(a)
    }

    val rows = for {
      id <- 0L until 60L
    } yield (id, id % 11 - 5, (id % 9 - 4) + 0.5, Seq("x", "y", "zz", "w")((id % 4).toInt))
    val df = rows.toDF("id", "a", "b", "s")
    df.createOrReplaceTempView("kql_prop")

    val prop = Prop.forAll(pGen(2)) { p =>
      val got = graft.ingest.Kql.translate(spark,
        s"kql_prop | where ${csl(p)} | project id")
        .as[Long].collect().sorted.toSeq
      val want = df.filter(colOf(p)).select("id").as[Long].collect().sorted.toSeq
      got == want
    }
    check("kql-predicate-equivalence", prop, samples = 40)
  }

  test("KQL arithmetic grammar is equivalent to its Column denotation on random trees") {
    import org.apache.spark.sql.Column
    // random arithmetic ASTs rendered with MINIMAL parentheses — a
    // child keeps parens only where standard precedence/left-
    // associativity requires them — so strings like `a + b * c` and
    // `a - (b - c)` arise naturally and the parser must rebuild exactly
    // the AST that produced them. Division/modulo by zero are legal
    // inputs: both sides are Spark, so the null/NaN semantics agree by
    // construction and the property checks the PARSE, not the divisor.
    sealed trait E
    case class LitE(v: Long) extends E
    case class ColE(c: String) extends E
    case class BinE(op: String, a: E, b: E) extends E
    def prec(op: String): Int = op match {
      case "+" | "-" => 1
      case _ => 2 // * / %
    }
    val leafGen: Gen[E] = Gen.oneOf(
      Gen.chooseNum(-7L, 7L).map(LitE),
      Gen.oneOf("a", "id").map(ColE))
    def eGen(depth: Int): Gen[E] =
      if (depth <= 0) leafGen
      else Gen.frequency(
        2 -> leafGen,
        5 -> (for {
          op <- Gen.oneOf("+", "-", "*", "/", "%")
          x <- eGen(depth - 1)
          // ANSI mode: /0 and %0 THROW (identically on both sides, but
          // an exception is not a comparable result) — divisors are
          // nonzero literals
          y <- if (op == "/" || op == "%")
            Gen.oneOf(Gen.chooseNum(1L, 7L), Gen.chooseNum(-7L, -1L)).map(LitE(_): E)
          else eGen(depth - 1)
        } yield BinE(op, x, y)))
    def render(e: E): String = e match {
      case LitE(v) => v.toString
      case ColE(c) => c
      case BinE(op, a, b) =>
        val l = a match {
          case BinE(lo, _, _) if prec(lo) < prec(op) => s"(${render(a)})"
          case _ => render(a)
        }
        val r = b match {
          case BinE(ro, _, _) if prec(ro) <= prec(op) => s"(${render(b)})"
          case _ => render(b)
        }
        s"$l $op $r"
    }
    def colOf(e: E): Column = e match {
      case LitE(v) => lit(v)
      case ColE(c) => col(c)
      case BinE("+", a, b) => colOf(a) + colOf(b)
      case BinE("-", a, b) => colOf(a) - colOf(b)
      case BinE("*", a, b) => colOf(a) * colOf(b)
      case BinE("/", a, b) => colOf(a) / colOf(b)
      case BinE("%", a, b) => colOf(a) % colOf(b)
      case _ => fail("unreachable")
    }
    val rows = (0L until 40L).map(id => (id, id % 11 - 5))
    val df = rows.toDF("id", "a")
    df.createOrReplaceTempView("kql_arith_prop")
    val prop = Prop.forAll(eGen(3)) { e =>
      val got = graft.ingest.Kql.translate(spark,
        s"kql_arith_prop | extend m = ${render(e)} | project id, m")
        .collect().map(r => (r.getLong(0), r.get(1))).sortBy(_._1).toSeq
      val want = df.select(col("id"), colOf(e).as("m"))
        .collect().map(r => (r.getLong(0), r.get(1))).sortBy(_._1).toSeq
      got == want
    }
    check("kql-arith-equivalence", prop, samples = 40)
  }
}
