package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding vector-space identity (reference:
  * src/types/embedding_identity.rs — per-frame metadata keys
  * embedding_identity.rs:8-11, parse rules from_extra_metadata
  * embedding_identity.rs:30-70, identity counts + Unknown/Single/Mixed
  * summary embedding_identity.rs:73-82).
  *
  * Parse rules, mirrored exactly: provider is trimmed, empty-filtered,
  * ASCII-lowercased; model is trimmed and empty-filtered with case
  * preserved; a frame HAS an identity iff provider or model survives;
  * dimension must parse as u32 (optional leading '+', digits only,
  * ≤ 4294967295) and be > 0; normalized maps true/1/yes → true,
  * false/0/no → false, anything else → null.
  *
  * Production-safe compat detection prefers provider+model over bare
  * dimension (multiple models share a dimension) — the summary groups on
  * the full identity tuple. One metadata-map scan + one map-side-
  * combinable group-by; 100 TB-safe.
  */
object EmbeddingIdentityCols {

  val ProviderKey = "memvid.embedding.provider"
  val ModelKey = "memvid.embedding.model"
  val DimensionKey = "memvid.embedding.dimension"
  val NormalizedKey = "memvid.embedding.normalized"

  private val MaxU32 = 4294967295L

  def provider(meta: Column): Column =
    lower(nullif(trim(try_element_at(meta, lit(ProviderKey))), lit("")))

  def model(meta: Column): Column =
    nullif(trim(try_element_at(meta, lit(ModelKey))), lit(""))

  def dimension(meta: Column): Column = {
    val raw = trim(try_element_at(meta, lit(DimensionKey)))
    val parsed = when(raw.rlike("^\\+?[0-9]+$"), raw.try_cast("bigint"))
    when(parsed.between(1L, MaxU32), parsed)
  }

  def normalized(meta: Column): Column = {
    val v = lower(trim(try_element_at(meta, lit(NormalizedKey))))
    when(v.isin("true", "1", "yes"), lit(true))
      .when(v.isin("false", "0", "no"), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** Identity counts over a frame table's metadata-map column, with the
    * collection-level summary kind attached ('single' when exactly one
    * distinct identity, 'mixed' otherwise; the Unknown case is the empty
    * result — no frame carries an identity).
    * @return (provider, model, dimension, normalized, n, summary_kind)
    */
  def summary(frames: DataFrame, metaCol: String): DataFrame = {
    val meta = col(metaCol)
    val groups = frames
      .select(provider(meta).as("provider"), model(meta).as("model"),
        dimension(meta).as("dimension"), normalized(meta).as("normalized"))
      .filter(col("provider").isNotNull || col("model").isNotNull)
      .groupBy(col("provider"), col("model"), col("dimension"),
        col("normalized"))
      .agg(count(lit(1)).as("n"))
    val kind = groups.agg(count(lit(1)).as("__g"))
      .select(when(col("__g") === 1, lit("single")).otherwise(lit("mixed"))
        .as("summary_kind"))
    groups.crossJoin(broadcast(kind))
      .orderBy(col("provider").asc_nulls_last, col("model").asc_nulls_last,
        col("dimension").asc_nulls_last, col("normalized").asc_nulls_last)
  }
}
