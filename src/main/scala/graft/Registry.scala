package graft

/** Aggregates every operator family's query definitions. SparkEntry exposes
  * these through the driver contract (queries / oracleSql).
  */
object Registry {
  def all: Map[String, QueryDef] =
    graft.queries.Relational.defs ++
    graft.queries.TextSearch.defs ++
    graft.queries.SearchQueries.defs ++
    graft.queries.VectorQueries.defs ++
    graft.queries.DedupQueries.defs ++
    graft.queries.MemoryGraphQueries.defs ++
    graft.queries.MiscQueries.defs ++
    graft.queries.PipelineQueries.defs ++
    graft.queries.AnalyticsQueries.defs ++
    graft.queries.IngestQueries.defs ++
    graft.queries.MediaQueries.defs ++
    graft.queries.StoreQueries.defs ++
    graft.queries.ServeQueries.defs
}
