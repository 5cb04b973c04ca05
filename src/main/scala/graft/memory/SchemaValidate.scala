package graft.memory

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate-schema validation of memory cards (reference:
  * src/types/schema.rs — ValueType.matches :52-68 (number = f64 parse,
  * datetime = i64 parse or 'T'/'-' containment, boolean = the six
  * true/false/yes/no/1/0 words, entity_ref = non-empty, enum =
  * case-insensitive membership), SchemaRegistry::validate :440-474
  * with its precedence — unknown predicate (strict only) → domain →
  * range — and the non-strict allow-unknown rule).
  *
  * The registry is a TABLE (predicate, range_type, enum_vals, domain)
  * broadcast-joined into the card stream; validation is one narrow
  * projection, no shuffle beyond the broadcast. A12's inference
  * (MemoryCards.inferSchemas) proposes schemas; this enforces them —
  * together they are the schema lifecycle.
  */
object SchemaValidate {

  /** per-card status: 'ok' | 'unknown_predicate' | 'invalid_domain' |
    * 'invalid_range', reference precedence order. Cards need columns
    * (slot, value, entity_kind); schemas (predicate, range_type,
    * enum_vals: array<string>, domain: array<string>). */
  def validate(cards: DataFrame, schemas: DataFrame,
               strict: Boolean): DataFrame = {
    val j = cards.join(broadcast(schemas),
      cards("slot") === schemas("predicate"), "left")
    val v = col("value")
    val rangeOk: Column =
      when(col("range_type").isin("string", "any"), lit(true))
        .when(col("range_type") === "number", v.try_cast("double").isNotNull)
        .when(col("range_type") === "datetime",
          v.try_cast("bigint").isNotNull || v.contains("T") || v.contains("-"))
        .when(col("range_type") === "boolean",
          lower(v).isin("true", "false", "yes", "no", "1", "0"))
        .when(col("range_type") === "entity_ref", length(v) > 0)
        .when(col("range_type") === "enum",
          size(filter(col("enum_vals"), e => lower(e) === lower(v))) > 0)
        .otherwise(lit(false))
    val domainOk: Column =
      size(col("domain")) === 0 || array_contains(col("domain"),
        col("entity_kind"))
    val status =
      when(col("predicate").isNull,
        if (strict) lit("unknown_predicate") else lit("ok"))
        .when(!domainOk, lit("invalid_domain"))
        .when(!rangeOk, lit("invalid_range"))
        .otherwise(lit("ok"))
    j.select(cards("*"), status.as("status"))
  }
}
