package graft.memory

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured-memory ("memory card") operations over a cards table
  * (entity, slot, value, kind, relation, ts, cardId, sourceFrameId) —
  * reference: src/types/memory_card.rs (card model, VersionRelation
  * Sets/Updates/Extends/Retracts at :73-87) and src/types/memories_track.rs
  * (get_current :365-380, get_at_time :381-398, aggregate_slot :409-435,
  * count_occurrences :436-450, entities/slots :482-493).
  *
  * Scale: the SlotIndex hash index (memories_track.rs:33-120) maps to
  * partitioning by (entity, slot); every operation below is a single
  * window or partial-aggregated groupBy on that key.
  */
object MemoryCards {

  private def latestWindow =
    Window.partitionBy(col("entity"), col("slot"))
      .orderBy(col("ts").desc, col("cardId").desc)

  /** newest card per (entity, slot); a latest 'retracts' relation hides the
    * slot entirely (memory_card.rs:84 Retracts semantics). */
  def getCurrent(cards: DataFrame): DataFrame =
    cards.withColumn("__rn", row_number().over(latestWindow))
      .filter(col("__rn") === 1 && col("relation") =!= "retracts")
      .drop("__rn")

  /** as-of view: newest card per (entity, slot) with ts <= t (J9) */
  def getAtTime(cards: DataFrame, t: Column): DataFrame =
    getCurrent(cards.filter(col("ts") <= t))

  /** all historical values of each (entity, slot), newest first (A8) */
  def aggregateSlot(cards: DataFrame): DataFrame =
    cards.groupBy("entity", "slot")
      .agg(count(lit(1)).as("n_versions"),
        array_join(
          transform(
            reverse(array_sort(collect_list(
              struct(col("ts"), col("cardId"), col("value"))))),
            s => s.getField("value")), ",").as("values_newest_first"))

  /** cards whose value contains `needle`, counted per (entity, slot) (A9) */
  def countOccurrences(cards: DataFrame, needle: String): DataFrame =
    cards.filter(col("value").contains(needle))
      .groupBy("entity", "slot").agg(count(lit(1)).as("n"))

  def entities(cards: DataFrame): DataFrame =
    cards.select("entity").distinct()

  def slotsForEntity(cards: DataFrame, entity: String): DataFrame =
    cards.filter(col("entity") === entity).select("slot").distinct()

  /** per-slot observed type histogram + cardinality → inferred predicate
    * schema (reference infer_schemas src/memvid/memory.rs:434-494). */
  def inferSchemas(cards: DataFrame): DataFrame = {
    val v = col("value")
    val vType = when(v.rlike("^-?[0-9]+$"), "integer")
      .when(v.rlike("^-?[0-9]*\\.[0-9]+$"), "number")
      .when(lower(v).isin("true", "false"), "boolean")
      .when(v.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}"), "datetime")
      .otherwise("string")
    cards.withColumn("vtype", vType)
      .groupBy("slot")
      .agg(count(lit(1)).as("n_cards"),
           countDistinct(col("entity")).as("n_entities"),
           countDistinct(col("value")).as("n_values"),
           sum(when(col("vtype") === "integer", 1L).otherwise(0L)).as("n_integer"),
           sum(when(col("vtype") === "number", 1L).otherwise(0L)).as("n_number"),
           sum(when(col("vtype") === "boolean", 1L).otherwise(0L)).as("n_boolean"),
           sum(when(col("vtype") === "datetime", 1L).otherwise(0L)).as("n_datetime"),
           sum(when(col("vtype") === "string", 1L).otherwise(0L)).as("n_string"))
  }
}
