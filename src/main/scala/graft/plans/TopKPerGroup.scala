package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator Catalyst extension (SURVEY §2 E-block,
  * extension path (c)): top-k rows per group by a numeric column.
  *
  * Why not `row_number().over(partitionBy(g).orderBy(o))`: the window
  * sorts EVERY group's full row set (shuffle of all rows + per-group
  * sort) and only then discards all but k. This operator keeps a
  * bounded k-heap per group in each input partition (LocalTopKExec —
  * map-side, no sort), shuffles at most k rows per (group, partition),
  * and merges heaps after the exchange (FinalTopKExec). At 100 TB the
  * shuffle shrinks from |rows| to ≤ k·groups·partitions.
  *
  * Ordering: value DESC, tie-break id ASC — fully deterministic so the
  * result is oracle-checkable.
  */
final case class TopKPerGroup(k: Int, groupCols: Seq[Attribute],
    orderCol: Expression, tieCol: Expression, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

/** Shared bounded-heap pass used by both phases.
  *
  * Memory bound (round-4 advice 3a): the heap map holds at most
  * `maxGroups` distinct groups × k rows. What happens to a row whose
  * group is NOT in a full map depends on the phase:
  *
  *  - Local phase (`spill = false`): the row PASSES THROUGH unchanged
  *    (streamed, never buffered). Local heaps are only an optimization
  *    — FinalTopKExec re-filters everything — so forwarding extra rows
  *    is correct, it just ships more over the exchange for the
  *    overflow groups (the same rows a plain window would ship).
  *  - Final phase (`spill = true`): the row is spilled to a local temp
  *    file (length-framed UnsafeRow bytes) and the file is re-processed
  *    recursively after the input is exhausted. Spilled groups are by
  *    construction disjoint from in-map groups (a group already in the
  *    map keeps updating its bounded heap), so each pass retires up to
  *    `maxGroups` groups and the recursion terminates in
  *    ⌈|groups|/maxGroups⌉ sequential disk passes — the same
  *    hash-then-sort-of fallback contract as ObjectHashAggregateExec,
  *    so a high-cardinality group key (A92 user_id at 100 TB) degrades
  *    to extra disk passes instead of an executor OOM.
  */
private[plans] object TopKHeap {
  def topK(iter: Iterator[InternalRow], k: Int, groupCols: Seq[Expression],
      orderCol: Expression, tieCol: Expression, inputAttrs: Seq[Attribute],
      maxGroups: Int = Int.MaxValue, spill: Boolean = false): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(groupCols, inputAttrs)
    val toUnsafe = UnsafeProjection.create(inputAttrs.map(_.dataType).toArray)
    val orderBound = BindReferences.bindReference(orderCol, inputAttrs)
    val tieBound = BindReferences.bindReference(tieCol, inputAttrs)
    val numFields = inputAttrs.length
    // min-heap: worst element on top — "worse" = lower value, or equal
    // value with larger tie id.
    val ord = Ordering.by[(Double, Long, InternalRow), (Double, Long)] {
      case (v, t, _) => (v, -t)
    }
    val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[(Double, Long, InternalRow)]]()
    var spillFile: java.io.File = null
    var spillOut: java.io.DataOutputStream = null
    var spilled = 0L
    lazy val writeBuffer = new Array[Byte](4096)

    def writeSpill(row: InternalRow): Unit = {
      if (spillOut == null) {
        spillFile = java.io.File.createTempFile("graft-topk-spill", ".bin")
        spillFile.deleteOnExit()
        spillOut = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(spillFile), 1 << 16))
      }
      val u = row match {
        case ur: UnsafeRow => ur
        case other => toUnsafe(other)
      }
      spillOut.writeInt(u.getSizeInBytes)
      u.writeToStream(spillOut, writeBuffer)
      spilled += 1
    }

    def readSpill(): Iterator[InternalRow] = {
      spillOut.close()
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        new java.io.FileInputStream(spillFile), 1 << 16))
      val f = spillFile
      new Iterator[InternalRow] {
        private var nextLen = try in.readInt() catch { case _: java.io.EOFException => -1 }
        override def hasNext: Boolean = nextLen >= 0 || { in.close(); f.delete(); false }
        override def next(): InternalRow = {
          val bytes = new Array[Byte](nextLen)
          in.readFully(bytes)
          val row = new UnsafeRow(numFields)
          row.pointTo(bytes, nextLen)
          nextLen = try in.readInt() catch { case _: java.io.EOFException => -1 }
          row
        }
      }
    }

    // Pass-through rows must stream (buffering them would re-create the
    // memory hazard the cap exists to prevent), so the whole pass is a
    // lazy iterator: absorb rows until one must pass through, yield it,
    // resume; after input exhausts, emit heap contents, then recurse on
    // any spill.
    val passedThrough = new Iterator[InternalRow] {
      private var pending: InternalRow = null
      private def advance(): Unit = {
        while (pending == null && iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null && heaps.size() >= maxGroups) {
            if (spill) writeSpill(row) else pending = row.copy()
          } else {
            if (heap == null) {
              heap = scala.collection.mutable.PriorityQueue.empty(ord.reverse) // min on top
              heaps.put(key.copy(), heap)
            }
            // NULL order sorts worst (-inf = NULLS LAST under DESC), NULL
            // tie last among equals — matches row_number semantics, no NPE.
            val vRaw = orderBound.eval(row)
            val tRaw = tieBound.eval(row)
            val v = if (vRaw == null) Double.NegativeInfinity
              else vRaw.asInstanceOf[Number].doubleValue()
            val t = if (tRaw == null) Long.MaxValue
              else tRaw.asInstanceOf[Number].longValue()
            if (heap.size < k) heap.enqueue((v, t, row.copy()))
            else {
              val worst = heap.head
              if (v > worst._1 || (v == worst._1 && t < worst._2)) {
                heap.dequeue(); heap.enqueue((v, t, row.copy()))
              }
            }
          }
        }
      }
      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): InternalRow = { advance(); val r = pending; pending = null; r }
    }

    def heapRows: Iterator[InternalRow] =
      scala.jdk.CollectionConverters.IteratorHasAsScala(heaps.values().iterator()).asScala
        .flatMap(_.iterator.map(_._3))

    passedThrough ++ heapRows ++ (if (spilled == 0) Iterator.empty else {
      // lazily recurse once this pass's input is exhausted
      new Iterator[InternalRow] {
        private lazy val rest =
          topK(readSpill(), k, groupCols, orderCol, tieCol, inputAttrs, maxGroups, spill)
        override def hasNext: Boolean = rest.hasNext
        override def next(): InternalRow = rest.next()
      }
    })
  }
}

/** Map-side phase: bounded heaps per input partition, no distribution
  * requirement, no sort. Groups past the in-memory cap pass through
  * unchanged (the exchange + final phase handles them).
  */
final case class LocalTopKExec(k: Int, groupCols: Seq[Attribute],
    orderCol: Expression, tieCol: Expression, maxGroups: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKHeap.topK(_, k, groupCols, orderCol, tieCol, child.output,
        maxGroups, spill = false))
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** Reduce-side phase: requires co-located groups (EnsureRequirements
  * inserts the hash exchange), merges the per-partition heaps.
  */
final case class FinalTopKExec(k: Int, groupCols: Seq[Attribute],
    orderCol: Expression, tieCol: Expression, maxGroups: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  // Empty groupCols = GLOBAL top-k: every partition's local winners
  // must meet in one partition or each would emit its own k rows.
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupCols.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupCols) :: Nil
  // We only drop rows, so the exchange's hash partitioning on the group
  // columns survives — a downstream groupBy(groupCols) (perGroupRanked)
  // reuses it instead of inserting a second exchange.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKHeap.topK(_, k, groupCols, orderCol, tieCol, child.output,
        maxGroups, spill = true))
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** Plans the logical node as Final(Local(child)). The per-partition
  * group cap is read from `spark.graft.topk.maxGroupsPerPartition`
  * (default 65536 groups ≈ k×65536 buffered rows) at planning time
  * and frozen into the physical nodes.
  */
object TopKStrategy extends SparkStrategy {
  val MaxGroupsKey = "spark.graft.topk.maxGroupsPerPartition"
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, o, t, child) =>
      val cap = math.max(1, org.apache.spark.sql.internal.SQLConf.get
        .getConfString(MaxGroupsKey, "65536").toInt)
      FinalTopKExec(k, g, o, t, cap, LocalTopKExec(k, g, o, t, cap, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Column-API entry: top `k` rows per `groupCols` by `orderCol`
    * (numeric, DESC), ties broken by `tieCol` ASC (must be unique for
    * deterministic output).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tieCol: String, k: Int): DataFrame = {
    // Belt and braces: GraftExtensions injects the strategy at session
    // build, but sessions graft didn't build (a host's own session)
    // get it via the public experimental hook.
    val session = df.sparkSession
    if (!session.experimental.extraStrategies.contains(TopKStrategy))
      session.experimental.extraStrategies =
        session.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n).getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val plan = TopKPerGroup(k, groupCols.map(attr),
      attr(orderCol), attr(tieCol), analyzed)
    classicDataset(df.sparkSession, plan)
  }

  /** [[perGroup]] plus a 1-based rank column `rnCol` (LongType) under
    * (orderCol DESC, tieCol ASC) — the scale-safe replacement for
    * `row_number().over(Window.partitionBy(group).orderBy(...))`.
    *
    * The heap phases leave ≤ k rows per group, so ranking is a grouped
    * sort over k·|groups| rows: `sort_array(collect_list(struct))` +
    * `posexplode`. No Window node anywhere in the plan, and the
    * aggregate reuses FinalTopKExec's hash partitioning on the group
    * columns (outputPartitioning passthrough) — one exchange total of
    * ≤ k·partitions rows per group, vs. a window shuffling and sorting
    * EVERY candidate row of a group on one reducer.
    */
  def perGroupRanked(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tieCol: String, k: Int, rnCol: String = "rn"): DataFrame = {
    import org.apache.spark.sql.functions._
    val top = perGroup(df, groupCols, orderCol, tieCol, k)
    val payload = df.columns.filterNot(groupCols.contains).toSeq
    // Struct sort order: _o = -order (asc = order desc), then _t = tie
    // asc; payload rides along. Spark normalizes -0.0 to 0.0 in sorts,
    // so negation agrees with desc() ordering on doubles.
    val packed = top.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(
        negate(col(orderCol)).as("_o") +: col(tieCol).as("_t") +:
          payload.map(c => col(c).as(c)): _*))).as("_sorted"))
    packed
      .select(groupCols.map(col) :+ posexplode(col("_sorted")): _*)
      .select(groupCols.map(col) ++
        Seq((col("pos") + 1).cast("long").as(rnCol)) ++
        payload.map(c => col("col").getField(c).as(c)): _*)
  }

  private def classicDataset(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.graftglue.Glue.ofRows(spark, plan)
}
