package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, StatefulOpClusteredDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native as-of join — the canonical "operator Spark lacks whole-operator
  * semantics for" (SURVEY.md §2 q_asof_join): every left row is matched
  * to the LATEST right row with `rightTime <= leftTime` within the same
  * equi-key group; rows with no such match are dropped (inner as-of, the
  * semantics of DuckDB's `ASOF JOIN`, which is the oracle).
  *
  * Built as the full custom-operator ladder (preference order (c) of the
  * project brief): marker predicate → `Rule[LogicalPlan]` rewrite →
  * custom logical node → `SparkStrategy` → `BinaryExecNode`, registered
  * either via `graft.GraftExtensions` or per-session through the public
  * `ExperimentalMethods` (`Asof.ensureInstalled`).
  *
  * Tie contract: among right rows sharing the same (key, time), which
  * payload wins is UNSPECIFIED (sort order below the time column is not
  * constrained) — pre-aggregate the right side to one row per (key,
  * time) when payload determinism matters, as the bundled queries do.
  *
  * Scale shape: both sides hash-partition on the key and sort by
  * (key, time) — one shuffle each, same as a sort-merge equi-join — then
  * a single forward merge pass per partition holds exactly ONE buffered
  * right row at a time. The window/union formulation of the same query
  * materializes and sorts the unioned stream; this exec never widens the
  * data and its memory is O(1) per partition beyond the sorts.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    joinType: JoinType) extends BinaryNode {
  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }
  override def maxRows: Option[Long] = left.maxRows // <= one row per left row
  // the default binary-node estimate is the PRODUCT of the children —
  // a cartesian-sized guess that would veto broadcast joins above us.
  // Output rows <= left rows, each widened by at most one right row.
  override def stats: Statistics =
    Statistics(sizeInBytes = left.stats.sizeInBytes + right.stats.sizeInBytes)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Marker predicate `asof_le(leftTime, rightTime[, tolerance])`: carries
  * the as-of pair (and an optional max look-back, pandas
  * `merge_asof(tolerance=...)` semantics: match only right rows with
  * `leftTime - tolerance <= rightTime <= leftTime`) through analysis
  * inside an ordinary join condition. Unevaluable on purpose — if the
  * rewrite rule is not installed the query fails loudly at execution
  * instead of silently returning every pair with `rightTime <= leftTime`.
  */
case class AsOfLE(children: Seq[Expression])
    extends Expression with Unevaluable with Predicate {
  def left: Expression = children(0)
  def right: Expression = children(1)
  def tolerance: Option[Expression] = children.drop(2).headOption
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  override def prettyName: String = "asof_le"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsOfLE = copy(children = newChildren)
}

/** Shared extractor: a `Join(Inner | LeftOuter)` whose condition splits
  * into cross-side equalities plus exactly one [[AsOfLE]] marker, with
  * both time expressions long-typed on their own side.
  */
object AsOfJoinPattern extends PredicateHelper {
  def unapply(plan: LogicalPlan): Option[(LogicalPlan, LogicalPlan,
      Seq[Expression], Seq[Expression], Expression, Expression, Option[Long], JoinType)] =
    plan match {
      case Join(l, r, jt @ (Inner | LeftOuter), Some(cond), _)
          if cond.exists(_.isInstanceOf[AsOfLE]) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val (markers, others) = conjuncts.partition(_.isInstanceOf[AsOfLE])
        val keyPairs = others.map {
          case EqualTo(a, b)
              if a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet) =>
            Some((a, b))
          case EqualTo(a, b)
              if b.references.subsetOf(l.outputSet) && a.references.subsetOf(r.outputSet) =>
            Some((b, a))
          case _ => None
        }
        markers match {
          case Seq(m: AsOfLE)
              if m.left.references.subsetOf(l.outputSet) &&
                m.right.references.subsetOf(r.outputSet) &&
                m.left.dataType == LongType && m.right.dataType == LongType &&
                m.tolerance.forall(t => t.foldable && t.dataType == LongType) &&
                keyPairs.nonEmpty && keyPairs.forall(_.isDefined) =>
            val tol = m.tolerance.map(_.eval().asInstanceOf[Long])
            Some((l, r, keyPairs.map(_.get._1), keyPairs.map(_.get._2),
              m.left, m.right, tol, jt))
          case _ => None
        }
      case _ => None
    }
}

/** Rewrites a marker join into [[AsOfJoin]]. ONLY safe in a
  * post-optimization batch (`experimental.extraOptimizations`, used by
  * [[Asof.ensureInstalled]]): installed mid-optimization it would freeze
  * pushdown/pruning below the opaque node and skip float-key
  * normalization. The extensions path therefore does NOT inject this
  * rule — [[AsOfJoinStrategy]] matches the intact Join at planning time
  * instead, after every optimizer batch has run.
  */
object RewriteAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case AsOfJoinPattern(l, r, lk, rk, lt, rt, tol, jt) =>
      AsOfJoin(l, r, lk, rk, lt, rt, tol, jt)
  }
}

/** Plans both forms: the [[AsOfJoin]] node (post-optimizer rewrite path)
  * and the still-intact marker Join (extensions path — extraction at
  * planning time sees the fully optimized, normalized join).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, jt) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, jt, planLater(l), planLater(r)) :: Nil
    case AsOfJoinPattern(l, r, lk, rk, lt, rt, tol, jt) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, jt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned on the keys (exact distribution,
  * so AQE cannot coalesce the two sides apart), both inputs sorted by
  * (key, time); one forward merge pass per partition keeps the single
  * latest qualifying right row per key.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    joinType: JoinType,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }

  override def requiredChildDistribution: Seq[Distribution] = {
    val n = conf.numShufflePartitions
    StatefulOpClusteredDistribution(leftKeys, n) ::
      StatefulOpClusteredDistribution(rightKeys, n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val ltExpr = leftTime
    val rtExpr = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val ltBound = BindReferences.bindReference(ltExpr, leftOut)
      val rtBound = BindReferences.bindReference(rtExpr, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // bind against `allOut`, whose right-side attributes are already
      // nullability-adjusted for LeftOuter (see `output`): binding against
      // the raw `rightOut` would compile a projection that reads a
      // non-nullable right attribute without a null check, so the
      // null-padded `nullRight` row would yield 0/garbage instead of NULL
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // single-row right-side state: the latest right row (and its key)
        // whose time is <= the current left row's time
        private var matchedRight: InternalRow = null
        private var matchedKey: UnsafeRow = null
        private var matchedTime: Long = 0L
        private val minTol = tolerance.getOrElse(Long.MaxValue)
        private var pendingRight: InternalRow = null // lookahead, not yet consumed
        private var outRow: InternalRow = null

        private val nullRight = new GenericInternalRow(rightOut.size)
        private val emitUnmatched = joinType == LeftOuter
        // parked lookahead's key/time, computed ONCE when parked (not per
        // left row while the right side waits ahead of the left cursor)
        private var pendingKey: UnsafeRow = null
        private var pendingTime: Long = 0L

        private def park(): Boolean = { // returns false if row is unmatched junk
          val rk = rKeyProj(pendingRight)
          val rtRaw = rtBound.eval(pendingRight)
          if (rk.anyNull || rtRaw == null) { pendingRight = null; false }
          else {
            pendingRight = pendingRight.copy() // sorter reuses row buffers
            pendingKey = rk.copy()
            pendingTime = rtRaw.asInstanceOf[Long]
            true
          }
        }

        private def advance(): Unit = {
          outRow = null
          while (outRow == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyProj(l)
            val ltRaw = ltBound.eval(l)
            var matched = false
            // SQL join semantics: NULL keys and NULL times never match
            // (the natural ordering WOULD compare two NULL keys equal)
            if (!lk.anyNull && ltRaw != null) {
              val lt = ltRaw.asInstanceOf[Long]
              var rightAhead = false
              while (!rightAhead && (pendingRight != null || rIter.hasNext)) {
                if (pendingRight == null) {
                  pendingRight = rIter.next()
                  if (!park()) { /* discarded null-key/time row */ }
                }
                if (pendingRight != null) {
                  val c = keyOrd.compare(pendingKey, lk)
                  if (c < 0) {
                    pendingRight = null // key already behind every future left row
                  } else if (c == 0 && pendingTime <= lt) {
                    matchedRight = pendingRight
                    matchedKey = pendingKey
                    matchedTime = pendingTime
                    pendingRight = null
                  } else {
                    rightAhead = true
                  }
                }
              }
              // tolerance: the retained latest match may have aged out of
              // the look-back window as the left cursor advanced
              if (matchedKey != null && keyOrd.compare(matchedKey, lk) == 0 &&
                  lt - matchedTime <= minTol) {
                outRow = resultProj(joined(l, matchedRight))
                matched = true
              }
            }
            if (!matched && emitUnmatched) {
              // left-outer: unmatched left rows (incl. NULL keys/times)
              // survive with a null-padded right side
              outRow = resultProj(joined(l, nullRight))
            }
          }
        }

        override def hasNext: Boolean = {
          if (outRow == null) advance()
          outRow != null
        }
        override def next(): InternalRow = {
          if (outRow == null) advance()
          if (outRow == null) throw new NoSuchElementException("empty as-of iterator")
          val r = outRow
          outRow = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public surface: the marker function plus per-session installation via
  * the public `ExperimentalMethods` (for sessions not built with
  * `graft.GraftExtensions`). Idempotent.
  */
object Asof {
  def ensureInstalled(s: SparkSession): Unit = s.synchronized {
    // synchronized: extraOptimizations/extraStrategies are bare vars on
    // the shared session — an unsynchronized read-modify-write could drop
    // a concurrently installed third-party rule
    val reg = s.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("asof_le")))
      reg.createOrReplaceTempFunction(
        "asof_le", exprs => AsOfLE(exprs), "built-in")
    if (!s.experimental.extraOptimizations.contains(RewriteAsOfJoin))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ RewriteAsOfJoin
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  /** `asof_le(leftTime, rightTime)` join-condition marker. */
  def asof_le(leftTime: Column, rightTime: Column): Column =
    call_function("asof_le", leftTime, rightTime)

  /** Tolerance form: match only right rows within `tolerance` time units
    * before the left row (pandas `merge_asof(tolerance=...)`).
    */
  def asof_le(leftTime: Column, rightTime: Column, tolerance: Long): Column =
    call_function("asof_le", leftTime, rightTime,
      org.apache.spark.sql.functions.lit(tolerance))
}
