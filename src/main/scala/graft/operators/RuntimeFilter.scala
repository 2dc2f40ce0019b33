package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{BinaryType, ByteType, IntegerType, LongType, ShortType}

/** Explicit runtime-filter (semi-join reduction) for big⋈small joins.
  *
  * At 100 TB the dominant join cost is shuffling the big side; rows that
  * can never match still pay the full scan→shuffle price. The standard
  * fix is a runtime filter: build a compact membership sketch of the
  * small side's keys, broadcast it, and drop non-matching big-side rows
  * BEFORE the shuffle. Spark 4's AQE can inject these automatically
  * (spark.sql.optimizer.runtime.bloomFilter.enabled); this operator makes
  * the pattern explicit and controllable — e.g. to filter at the scan of
  * a pre-joined staging table, or when statistics defeat the planner.
  *
  * The sketch is built DISTRIBUTED by `DataFrame.stat.bloomFilter`
  * (internally a BloomFilterAggregate — only the ~1 MB bitset reaches the
  * driver, never rows) and shipped as a broadcast variable. False
  * positives are fine: the join afterwards is still exact; the filter
  * only prunes guaranteed non-matches.
  */
object RuntimeFilter {

  /** Join types for which pruning non-matching LARGE rows preserves the
    * result. Outer-on-the-large-side types (left/full) and left_anti
    * must keep those rows, so the prefilter would corrupt them. */
  private val safeJoinTypes =
    Set("inner", "left_semi", "leftsemi", "right", "right_outer", "cross")

  /** `large ⋈ small` equi-join with a bloom prefilter on the large side.
    * `expectedKeys`/`fpp` size the sketch (1M keys @ 3% ≈ 900 KB). */
  def bloomJoin(
      large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String,
      joinType: String = "inner",
      expectedKeys: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    require(safeJoinTypes.contains(joinType.toLowerCase),
      s"bloomJoin supports ${safeJoinTypes.mkString("/")} — a '$joinType' " +
        "join must keep non-matching large-side rows, which the prefilter drops")
    bloomPrefilter(large, small, largeKey, smallKey, expectedKeys, fpp)
      .join(small, col(largeKey) === col(smallKey), joinType)
  }

  /** The bloom prefilter alone (for semi-join reduction ahead of an
    * aggregation or a later join). Superset of the true semi-join by the
    * sketch's false-positive rate.
    *
    * The probe is Spark's native `BloomFilterMightContain` expression —
    * the same one AQE's injected runtime filters use — not a Scala UDF:
    * it participates in whole-stage codegen (the filter stays inside the
    * scan's codegen span instead of materializing rows to call a closure)
    * and deserializes the sketch once per task. The serialized sketch
    * rides in the plan as a BinaryType literal, exactly like the
    * scalar-subquery result in Spark's own InjectRuntimeFilter rewrite.
    * Probe/build consistency: `stat.bloomFilter` inserts the raw long
    * (putLong) and BloomFilterMightContain calls mightContainLong on the
    * raw value expression — neither side re-hashes, so the sketch built
    * here is probed in the same key space. */
  def bloomPrefilter(
      large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    // the probe is Long-typed; a non-integral key column would be silently
    // cast to null and every row dropped — reject it up front
    for ((df, k) <- Seq((large, largeKey), (small, smallKey))) {
      val dt = df.schema(k).dataType
      require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
        s"bloom filter key '$k' must be integral, got $dt")
    }
    val bf = small.stat.bloomFilter(col(smallKey).cast("long"), expectedKeys, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val probe = CatalystBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      CatalystBridge.expression(col(largeKey).cast("long"))))
    large.filter(probe)
  }
}
