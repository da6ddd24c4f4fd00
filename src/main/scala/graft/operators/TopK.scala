package graft.operators

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k aggregation — the scale-correct replacement for
  * `row_number().over(Window.partitionBy(query))`: the window form
  * shuffles EVERY scored row to one reducer per query (Q reducers hold
  * corpus-sized partitions at 1000 executors), while this Aggregator
  * keeps a ≤k buffer map-side, so the shuffle carries at most
  * partitions × queries × k rows and the per-query merge is O(k).
  *
  * Ordering contract matches the window formulation exactly:
  * sim DESC, then neighbor_id ASC on ties — results are deterministic
  * and byte-identical to the window version.
  */
object TopK {

  /** One scored candidate. */
  final case class Scored(sim: Double, neighbor_id: Long)

  private def better(a: Scored, b: Scored): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.neighbor_id < b.neighbor_id)

  /** Insert into a descending-sorted, ≤k vector. O(k) per insert with
    * an early reject for candidates worse than the current k-th.
    */
  private def insert(buf: Vector[Scored], v: Scored, k: Int): Vector[Scored] = {
    if (buf.length >= k && better(buf.last, v)) return buf
    val i = buf.indexWhere(b => better(v, b)) match {
      case -1 => buf.length
      case x  => x
    }
    val out = (buf.take(i) :+ v) ++ buf.drop(i)
    if (out.length > k) out.take(k) else out
  }

  final class TopKAggregator(k: Int)
      extends Aggregator[Scored, Vector[Scored], Seq[Scored]] {
    override def zero: Vector[Scored] = Vector.empty
    override def reduce(b: Vector[Scored], a: Scored): Vector[Scored] =
      insert(b, a, k)
    override def merge(b1: Vector[Scored], b2: Vector[Scored]): Vector[Scored] =
      b2.foldLeft(b1)((acc, v) => insert(acc, v, k))
    override def finish(r: Vector[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Vector[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** (query_id, rank, neighbor_id, sim) — top k of `scored`, which must
    * have columns (query_id, neighbor_id, sim).
    *
    * `neighbor_id` must be an INTEGRAL column (byte/short/int/long; it
    * is widened to long in the output — the aggregator buffer is typed
    * `Scored(sim: Double, neighbor_id: Long)`). String or other id
    * types are rejected with a clear error rather than silently
    * miscast; all Similarity entry points inherit this requirement.
    */
  /** Fail-loud guard for the integral-id contract every bounded
    * aggregator here shares: ids ride the capped buffers as longs, so a
    * string id would silently cast to null, null pairs would fall to
    * the `a < b` filters, and an operator would return an EMPTY result
    * with no error. Matches on DataType instances, not simpleString
    * names (byte/short render as tinyint/smallint — name lists rot).
    */
  private[operators] def requireIntegral(df: DataFrame, colName: String,
      who: String): Unit = {
    import org.apache.spark.sql.types._
    val t = df.schema(colName).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
      s"$who requires an integral '$colName' column, got " +
        s"${t.simpleString}; map ids to integers upstream")
  }

  /** CARDINALITY BOUNDARY: a typed Aggregator plans as
    * `ObjectHashAggregateExec`, which abandons its hash map for a
    * SORT-BASED fallback once a task sees more distinct group keys
    * than `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * (default 128) — fine for the intended shape (few queries, the
    * broadcast side of an NN join), but grouping by a CORPUS-sized key
    * turns the "bounded map-side partial agg" into an external sort of
    * every scored row (measured: 1M-group × 100M-row argmax ran 20+
    * minutes of pure sort/spill at ScaleSmoke scale). For per-corpus
    * argmax (k = 1, group count = corpus), use [[max1PerQuery]] — a
    * declarative `max(struct)` that stays in codegen HashAggregate at
    * any cardinality.
    */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    requireIntegral(scored, "neighbor_id", "topKPerQuery")
    val agg = udaf(new TopKAggregator(k))
    scored
      .groupBy(col("query_id"))
      .agg(agg(col("sim"), col("neighbor_id").cast("long")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.neighbor_id").as("neighbor_id"), col("col.sim").as("sim"))
  }

  /** `topKPerQuery(_, 1)` with the same ordering contract (sim DESC,
    * neighbor_id ASC on ties) as a DECLARATIVE aggregate:
    * `max(struct(sim, -neighbor_id))` compares lexicographically, so
    * the max struct carries the highest sim and, among ties, the
    * smallest id (negation flips the tie direction). `Max` is a
    * DeclarativeAggregate; the struct buffer is not hash-agg mutable,
    * so it plans as whole-stage-codegen `SortAggregate` — a partial
    * primitive-key sort per task feeding streamed maxes, with NO
    * per-row object serde and NO cardinality cliff (ObjectHashAgg's
    * fallback re-sorts through its typed-buffer machinery, which is
    * the 20-min path). Output: (query_id, rank=1, neighbor_id, sim),
    * byte-identical to the aggregator form (parity pinned by
    * `TopKSpec`).
    */
  def max1PerQuery(scored: DataFrame): DataFrame = {
    requireIntegral(scored, "neighbor_id", "max1PerQuery")
    scored
      .groupBy(col("query_id"))
      .agg(max(struct(col("sim"),
        (-col("neighbor_id").cast("long")).as("nn"))).as("m"))
      .select(col("query_id"), lit(1).as("rank"),
        (-col("m.nn")).as("neighbor_id"), col("m.sim").as("sim"))
  }

  /** Bounded collect: accumulates at most `cap`+1 members per group, so
    * a degenerate group's aggregation buffer is O(cap) — never
    * group-sized. The memory-safe building block for capped LSH/cluster
    * buckets: a group exceeding `cap` yields a truncated cap+1 list,
    * which the caller's size filter drops (members of oversized groups
    * are never needed — that is what the cap MEANS). A plain
    * `collect_list` + size filter computes the same result but
    * materializes the whole degenerate group first: >cap identical
    * boilerplate docs — or sentinel-signature short docs — in one
    * bucket would hold every member (vectors included) in a single
    * buffer before the filter discards it.
    */
  final class BoundedCollect[T](cap: Int)(
      implicit bufEnc: Encoder[Vector[T]], outEnc: Encoder[Seq[T]])
      extends Aggregator[T, Vector[T], Seq[T]] {
    override def zero: Vector[T] = Vector.empty
    override def reduce(b: Vector[T], a: T): Vector[T] =
      if (b.length > cap) b else b :+ a
    override def merge(b1: Vector[T], b2: Vector[T]): Vector[T] = {
      if (b1.length > cap) b1
      else if (b2.length > cap) b2
      else {
        val c = b1 ++ b2
        if (c.length > cap + 1) c.take(cap + 1) else c
      }
    }
    override def finish(r: Vector[T]): Seq[T] = r
    override def bufferEncoder: Encoder[Vector[T]] = bufEnc
    override def outputEncoder: Encoder[Seq[T]] = outEnc
  }

  /** The [[BoundedCollect]] aggregator as a ready-to-apply column
    * function — one entry point so call sites don't repeat the
    * encoder plumbing.
    */
  def boundedCollect[T](cap: Int)(implicit tt: TypeTag[T],
      vt: TypeTag[Vector[T]], st: TypeTag[Seq[T]])
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BoundedCollect[T](cap)(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[T]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[T]]()))

  /** One (hash, id) candidate for bounded smallest-k selection. */
  final case class HashId(h: Long, id: Long)

  private def smaller(a: HashId, b: HashId): Boolean =
    a.h < b.h || (a.h == b.h && a.id < b.id)

  private def insertAsc(buf: Vector[HashId], v: HashId, k: Int): Vector[HashId] = {
    if (buf.length >= k && smaller(buf.last, v)) return buf
    val i = buf.indexWhere(b => smaller(v, b)) match {
      case -1 => buf.length
      case x  => x
    }
    val out = (buf.take(i) :+ v) ++ buf.drop(i)
    if (out.length > k) out.take(k) else out
  }

  /** Bounded k-smallest by EXACT Long ordering (h ASC, id ASC) — the
    * integer twin of [[TopKAggregator]]: keeps 60-bit hash keys in Long
    * space end-to-end, so the selected set and ranks are replicable
    * bit-for-bit by any engine ordering the same integers (a
    * double-typed score would round away hash bits above 2^53).
    */
  final class SmallestKAggregator(k: Int)
      extends Aggregator[HashId, Vector[HashId], Seq[HashId]] {
    override def zero: Vector[HashId] = Vector.empty
    override def reduce(b: Vector[HashId], a: HashId): Vector[HashId] =
      insertAsc(b, a, k)
    override def merge(b1: Vector[HashId], b2: Vector[HashId]): Vector[HashId] =
      b2.foldLeft(b1)((acc, v) => insertAsc(acc, v, k))
    override def finish(r: Vector[HashId]): Seq[HashId] = r
    override def bufferEncoder: Encoder[Vector[HashId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[HashId]]()
    override def outputEncoder: Encoder[Seq[HashId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashId]]()
  }

  /** (group, rank, id) — the k rows with the smallest (h, id) per
    * group, exact Long ordering. The scale-correct replacement for
    * `row_number().over(Window.partitionBy(group).orderBy(h, id))`:
    * the window shuffles every row into one reducer per group (a
    * stratum of a 100 TB corpus in ONE task), this aggregation keeps a
    * ≤k buffer map-side so the shuffle carries at most
    * partitions × groups × k rows. `keyed` must have columns
    * (group, h, id) with integral h and id.
    */
  def smallestKPerGroup(keyed: DataFrame, k: Int): DataFrame = {
    for (c <- Seq("h", "id")) requireIntegral(keyed, c, "smallestKPerGroup")
    val agg = udaf(new SmallestKAggregator(k))
    keyed
      .groupBy(col("group"))
      .agg(agg(col("h").cast("long"), col("id").cast("long")).as("top"))
      .select(col("group"), posexplode(col("top")))
      .select(col("group"), (col("pos") + 1).as("rank"), col("col.id").as("id"))
  }
}
