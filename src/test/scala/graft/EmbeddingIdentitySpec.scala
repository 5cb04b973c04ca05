package graft

import graft.vector.EmbeddingIdentityCols._
import org.apache.spark.sql.functions._

/** Embedding identity parse (reference src/types/embedding_identity.rs). */
class EmbeddingIdentitySpec extends SparkSpec {
  import spark.implicits._

  private def frames(ms: Seq[Map[String, String]]) =
    ms.zipWithIndex.map { case (m, i) => (i.toLong, m) }
      .toDF("id", "extraMetadata")

  test("parse edges: trim, case, empty-filter, u32 range, normalized map") {
    val out = summary(frames(Seq(
      Map(ProviderKey -> " OpenAI ", DimensionKey -> " 768 ",
        NormalizedKey -> "YES"),
      Map(ModelKey -> "BGE-Large ", DimensionKey -> "0",
        NormalizedKey -> "maybe"),
      Map(ProviderKey -> "", ModelKey -> ""), // both empty -> no identity
      Map(NormalizedKey -> "true"),           // no provider/model -> none
      Map(ProviderKey -> "x", DimensionKey -> "99999999999"))), // overflow
      "extraMetadata").collect()
    assert(out.length == 3)
    assert(out.forall(_.getString(5) == "mixed"))
    val openai = out.find(_.getString(0) == "openai").get
    assert(openai.getString(1) == null && openai.getLong(2) == 768L &&
      openai.getBoolean(3))
    val bge = out.find(r => r.isNullAt(0) && !r.isNullAt(1)).get
    assert(bge.getString(1) == "BGE-Large" && bge.isNullAt(2) && bge.isNullAt(3))
    val x = out.find(_.getString(0) == "x").get
    assert(x.isNullAt(2), "u32 overflow dimension is dropped")
  }

  test("single identity and the Unknown (empty) case") {
    val one = summary(frames(Seq(
      Map(ProviderKey -> "openai", ModelKey -> "m"),
      Map(ProviderKey -> "OPENAI", ModelKey -> "m"))), "extraMetadata")
      .collect()
    assert(one.length == 1 && one.head.getString(5) == "single" &&
      one.head.getLong(4) == 2L)
    assert(summary(frames(Seq(Map(), Map(NormalizedKey -> "1"))),
      "extraMetadata").isEmpty)
  }
}
