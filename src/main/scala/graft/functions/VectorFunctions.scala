package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding storage primitives. At 100 TB the embedding column IS the
  * dataset — int8 scalar quantization cuts it 4× with ~0.4% max error per
  * component (half a quantization step of scale/127), which leaves
  * cosine rankings intact for retrieval-style workloads.
  *
  * All arithmetic runs in doubles with explicit casts so the DuckDB
  * oracle reproduces results bitwise (float ops differ across engines;
  * double ops don't).
  */
object VectorFunctions {

  /** Per-vector symmetric scale: max |x|. */
  def quantScale(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast("double"))))

  /** int8-quantized vector: round(x / scale * 127) per component.
    * Zero vectors quantize to zeros (scale 0 guarded). */
  def quantizeI8(emb: Column): Column = {
    val s = quantScale(emb)
    transform(emb, x =>
      when(s === 0.0, lit(0))
        .otherwise(round(x.cast("double") / s * 127).cast("int"))
        .cast("tinyint"))
  }

  /** Reconstruct doubles from the quantized form. */
  def dequantizeI8(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale / 127.0)
}
