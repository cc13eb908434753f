package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Native as-of join: a whole-operator Catalyst extension — custom
  * `LogicalPlan` node, `SparkStrategy`, and `SparkPlan` — registered
  * through `GraftExtensions.injectPlannerStrategy` (SURVEY §2.6;
  * preference level (c) of the charter's custom-operator ladder).
  *
  * The union+window form in `operators/AsofJoin.scala` expresses
  * backward/forward as-of declaratively; this node instead gives the
  * optimizer a first-class operator with the textbook merge plan:
  *
  *  - `requiredChildDistribution` = ClusteredDistribution(keys) on
  *    BOTH children — EnsureRequirements co-partitions the two inputs
  *    exactly as it would a sort-merge join (and AQE may satisfy it
  *    from an existing exchange);
  *  - `requiredChildOrdering` = (keys…, time) ascending on both — the
  *    sorts are per-partition, never global;
  *  - execution is a single forward pass: `zipPartitions` over the
  *    co-partitioned inputs with a monotone right-side cursor. Each
  *    right row is examined once per partition, state is ONE buffered
  *    candidate row — O(|L|+|R|) time, O(1) memory beyond the sort,
  *    versus the union+window form's |L|+|R|-row window frames.
  *
  * At 100 TB both plans shuffle the same bytes; the exec node wins on
  * the merge (no window-function state machine, no union schema
  * widening with null payload columns) and composes with downstream
  * operators that want the (keys)-clustered, (keys, time)-sorted
  * output it declares via `outputPartitioning`/`outputOrdering`.
  *
  * Matching semantics (pinned by AsofExecSpec against the
  * union+window oracle and DuckDB's native ASOF JOIN):
  *
  *  - BACKWARD inclusive — each left row gets the payload of the LAST
  *    right row with equal keys and `rightTime <= leftTime`, nulls
  *    when none.
  *  - FORWARD inclusive — the FIRST right row with equal keys and
  *    `rightTime >= leftTime` (the time-to-next-event mirror; the
  *    cursor stops at the first candidate instead of consuming to the
  *    last, still one monotone pass).
  *  - TOLERANCE (pandas merge_asof staleness bound) — with
  *    `toleranceUs = Some(d)`, a candidate further than `d` time
  *    units from the left row is nulled. Only the NEAREST candidate
  *    is ever considered (anything older/further is further out of
  *    tolerance by monotonicity), so the merge is unchanged — the
  *    bound is a per-row check, not a scan. Requires a LongType time
  *    column (exact integer micros in every registered query).
  *
  * Key equality is null-safe (the hash partitioner co-locates null
  * keys, and the merge's natural ordering treats them as equal — same
  * contract as `GROUP BY`); null times sort first, so in BACKWARD
  * mode a null-time right row is "before everything" for its key (a
  * null-time LEFT row can therefore only match a null-time right
  * row), while in FORWARD mode a null time on either side never
  * matches — "first right row at-or-after NULL" would otherwise
  * resolve to the key's earliest row, inverting the semantics
  * (DuckDB ASOF's `>=` on NULL matches nothing). Null times never
  * satisfy a tolerance bound in either mode. Tie-break among right
  * rows with equal
  * (keys, time) is the caller's contract: the registered queries
  * pre-aggregate the right side to one row per (keys, time)
  * (latest-wins arg-max), so no tie can reach the operator.
  */
object AsofJoinPlan {

  /** Backward inclusive as-of join through the native operator.
    * Same contract as `AsofJoin.backward`: payload columns of the
    * latest right row with `right(rightTime) <= left(leftTime)` per
    * `keys`, attached as `prefix<name>` (null when none precedes, or
    * when the match is staler than `toleranceUs`).
    * Requires the session to carry `GraftExtensions` (the strategy is
    * injected, not global).
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String], prefix: String = "asof_",
               toleranceUs: Option[Long] = None): DataFrame =
    build(left, right, keys, leftTime, rightTime, payload, prefix,
      forwardDir = false, toleranceUs)

  /** Forward inclusive as-of join through the native operator: the
    * EARLIEST right row with `right(rightTime) >= left(leftTime)` per
    * `keys` (null when none follows, or when the match is further
    * ahead than `toleranceUs`).
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTime: String, rightTime: String,
              payload: Seq[String], prefix: String = "asof_",
              toleranceUs: Option[Long] = None): DataFrame =
    build(left, right, keys, leftTime, rightTime, payload, prefix,
      forwardDir = true, toleranceUs)

  private def build(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTime: String, rightTime: String,
                    payload: Seq[String], prefix: String,
                    forwardDir: Boolean, toleranceUs: Option[Long]): DataFrame = {
    val lp = ColumnBridge.analyzed(
      left.select(left.columns.map(left.col).toIndexedSeq: _*))
    // fresh exprIds on the right so self-joins (both sides scanning the
    // same source) never carry conflicting references into the node
    val rp0 = ColumnBridge.analyzed(right)
    val rp = Project(
      rp0.output.map(a => Alias(a, a.name)(exprId = NamedExpression.newExprId)),
      rp0)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of column '$name' not in ${p.output.map(_.name)}"))
    val lt = attr(lp, leftTime)
    val rt = attr(rp, rightTime)
    toleranceUs.foreach { _ =>
      require(lt.dataType == LongType && rt.dataType == LongType,
        s"as-of tolerance needs LongType times, got ${lt.dataType}/${rt.dataType}")
    }
    val pay = payload.map(attr(rp, _))
    val matchOut = pay.map(a =>
      AttributeReference(prefix + a.name, a.dataType, nullable = true)())
    val node = AsofJoinNode(lp, rp,
      keys.map(attr(lp, _)), keys.map(attr(rp, _)),
      lt, rt, pay, matchOut, forwardDir, toleranceUs)
    ColumnBridge.ofRows(left.sparkSession, node)
  }
}

/** Logical as-of join. Fully resolved at construction (attributes are
  * taken from the analyzed children); `matchOutput` carries the
  * operator's fresh output attributes in the node so exprIds stay
  * stable across optimizer copies.
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], matchOutput: Seq[Attribute],
    forward: Boolean = false, toleranceUs: Option[Long] = None)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ matchOutput
  // matchOutput is born here, not read from the children — without
  // this, CheckAnalysis counts it as missing input
  override def producedAttributes: AttributeSet = AttributeSet(matchOutput)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] to [[AsofJoinExec]]; injected via
  * `GraftExtensions` so only opted-in sessions see it.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, pay, mo, fwd, tol) =>
      AsofJoinExec(lk, rk, lt, rt, pay, mo, fwd, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned, per-partition-sorted merge
  * with a monotone right cursor (see [[AsofJoinPlan]] scaladoc for
  * directions, tolerance, and the scale argument).
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    payload: Seq[Expression], matchOutput: Seq[Attribute],
    forward: Boolean, toleranceUs: Option[Long],
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ matchOutput

  override def producedAttributes: AttributeSet = AttributeSet(matchOutput)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // left rows pass through in order — downstream operators may reuse
  // both the clustering and the (keys, time) sort
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val payB = payload
    val out = output
    val nPay = matchOutput.length
    val fwd = forward
    val tol = toleranceUs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val payProj = UnsafeProjection.create(payB, rOut)
      val outProj = UnsafeProjection.create(out, out)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullMatch = new GenericInternalRow(nPay)
      val joined = new JoinedRow

      // |candTime - lTime| <= tol, null times never in tolerance
      def tolOk(candTime: UnsafeRow, lTime: UnsafeRow): Boolean =
        tol.forall { d =>
          !candTime.isNullAt(0) && !lTime.isNullAt(0) &&
            math.abs(lTime.getLong(0) - candTime.getLong(0)) <= d
        }

      new Iterator[InternalRow] {
        // the one right row read but not yet consumed (projection
        // buffers are reused, so the stored copies are owned)
        private var pendKey: UnsafeRow = _
        private var pendTime: UnsafeRow = _
        private var pendPay: UnsafeRow = _
        private var havePend = false
        private var started = false
        // backward only — latest consumed right row: the as-of
        // candidate for its key
        private var lastKey: UnsafeRow = _
        private var lastTime: UnsafeRow = _
        private var lastPay: UnsafeRow = _

        private def readRight(): Unit =
          if (rIter.hasNext) {
            val r = rIter.next()
            pendKey = rKeyProj(r).copy()
            pendTime = rTimeProj(r).copy()
            pendPay = payProj(r).copy()
            havePend = true
          } else havePend = false

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          if (!started) { readRight(); started = true }
          var advancing = true
          if (fwd) {
            // consume right rows strictly before (lKey, lTime); the
            // pending row is then the first at-or-after candidate
            while (havePend && advancing) {
              val c = keyOrd.compare(pendKey, lKey)
              if (c < 0 || (c == 0 && timeOrd.compare(pendTime, lTime) < 0))
                readRight()
              else advancing = false
            }
          } else {
            // consume right rows at-or-before (lKey, lTime); the last
            // consumed with this key is the candidate
            while (havePend && advancing) {
              val c = keyOrd.compare(pendKey, lKey)
              if (c < 0 || (c == 0 && timeOrd.compare(pendTime, lTime) <= 0)) {
                lastKey = pendKey
                lastTime = pendTime
                lastPay = pendPay
                readRight()
              } else advancing = false
            }
          }
          val m: InternalRow =
            if (fwd) {
              // null-time guard: a null left time sorts FIRST, so the
              // cursor consumes nothing and the pending row would be
              // the key's EARLIEST right row — matching it would
              // invert "first right row at-or-after". DuckDB ASOF's
              // `right >= NULL` matches nothing; mirror that.
              if (havePend && !lTime.isNullAt(0) && !pendTime.isNullAt(0) &&
                keyOrd.compare(pendKey, lKey) == 0 &&
                tolOk(pendTime, lTime)) pendPay
              else nullMatch
            } else {
              if (lastKey != null && keyOrd.compare(lastKey, lKey) == 0 &&
                tolOk(lastTime, lTime)) lastPay
              else nullMatch
            }
          outProj(joined(l, m))
        }
      }
    }
  }
}
