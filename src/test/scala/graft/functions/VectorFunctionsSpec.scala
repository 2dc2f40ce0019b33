package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.Tables.load(spark, sf001, "embeddings")

  test("quantize→dequantize error bounded by half a quantization step") {
    val checked = emb.select(
      VectorFunctions.quantScale($"embedding").as("s"),
      $"embedding",
      VectorFunctions.quantizeI8($"embedding").as("q"))
      .select($"s",
        aggregate(
          zip_with(
            VectorFunctions.dequantizeI8($"q", $"s"),
            transform($"embedding", x => x.cast("double")),
            (a, b) => abs(a - b)),
          lit(0.0), (acc, v) => greatest(acc, v)).as("max_err"))
    val bad = checked.filter($"max_err" > $"s" / 127.0).count()
    assert(bad === 0)
  }

  test("cosine similarity survives int8 quantization (>0.99)") {
    val both = emb.select($"vec_id", $"embedding",
      VectorFunctions.quantScale($"embedding").as("s"),
      VectorFunctions.quantizeI8($"embedding").as("q"))
      .select(Similarity.cosine(
        transform($"embedding", x => x.cast("double")),
        VectorFunctions.dequantizeI8($"q", $"s")).as("cos"))
    val worst = both.agg(min($"cos")).head.getDouble(0)
    assert(worst > 0.99, s"worst reconstruction cosine $worst")
  }

  test("zero vectors quantize to zeros") {
    val z = Seq((1L, Array.fill(4)(0f))).toDF("vec_id", "embedding")
    val q = z.select(VectorFunctions.quantizeI8($"embedding")).head.getSeq[Byte](0)
    assert(q.forall(_ === 0))
  }
}
