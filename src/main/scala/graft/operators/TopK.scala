package graft.operators

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
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val idType = scored.schema("neighbor_id").dataType
    // match on DataType instances, not simpleString names (byte/short
    // render as tinyint/smallint — name lists rot)
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"topKPerQuery requires an integral neighbor_id column, got " +
        s"${idType.simpleString}; map ids to integers upstream")
    val agg = udaf(new TopKAggregator(k))
    scored
      .groupBy(col("query_id"))
      .agg(agg(col("sim"), col("neighbor_id").cast("long")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.neighbor_id").as("neighbor_id"), col("col.sim").as("sim"))
  }
}
