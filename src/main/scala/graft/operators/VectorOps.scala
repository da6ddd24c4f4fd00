package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector utilities for training-data pipelines: symmetric
  * int8 quantization (the standard 4× storage/bandwidth compression
  * before ANN indexing) and its inverse.
  *
  * Engine-exact by construction: the scale is `max(|x|)/127` — max is
  * order-independent even in floating point (unlike a sum/norm), each
  * element quantizes independently in double precision, and round()
  * half-away-from-zero matches across engines — so the quantized
  * output is bit-identical on any partitioning and replicable in plain
  * SQL (see the q_quantize oracle). Narrow maps, zero shuffles.
  */
object VectorOps {

  /** Per-vector symmetric int8 quantization. Output: the input columns
    * plus `scale` (double) and `q` (array<long> in [-127, 127]).
    * All-zero vectors quantize to zeros with scale 0; null vectors stay
    * null. The scale is computed in its own projection so the transform
    * lambda references an ATTRIBUTE — an inline scale would re-run
    * array_max per element (O(d²) per row).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df
      .select(col(idCol), col(vecCol),
        (array_max(transform(col(vecCol), x => abs(x.cast("double"))))
          / 127.0).as("scale"))
      .select(col(idCol), col("scale"),
        when(col("scale") === 0,
          transform(col(vecCol), _ => lit(0L)))
          .otherwise(transform(col(vecCol),
            x => round(x.cast("double") / col("scale")).cast("long")))
          .as("q"))

  /** Inverse: reconstruct approximate floats from (q, scale) columns. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => (x.cast("double") * scale).cast("float"))
}
