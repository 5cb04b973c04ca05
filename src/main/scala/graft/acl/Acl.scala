package graft.acl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-hit ACL filtering (reference: AclContext / AclEnforcementMode
  * src/types/acl.rs:26-40; applied post-search at
  * src/memvid/search/mod.rs:267-276; impl src/memvid/acl.rs).
  *
  * Rules are a (principal, uriPrefix, allow) table — broadcast-joined
  * against hits: at scale the rules table is tiny and the hit set is the
  * top-k, so enforcement is a narrow broadcast join, never a shuffle.
  */
object Acl {

  sealed trait Mode
  /** annotate hits with `acl_allowed` but keep them */
  case object Audit extends Mode
  /** drop disallowed hits */
  case object Enforce extends Mode

  /** Per-request caller context the `Graft` facade threads through
    * search()/ask() (reference: AclContext + AclEnforcementMode carried on
    * the request, src/types/acl.rs:26-58; applied post-retrieval at
    * src/memvid/search/mod.rs:267-276 and src/memvid/ask.rs:372-380). */
  final case class Request(rules: DataFrame, principal: String, mode: Mode,
                           defaultAllow: Boolean = false)

  /** most-specific-prefix wins; no matching rule → defaultAllow */
  def apply(hits: DataFrame, uriCol: Column, rules: DataFrame, principal: String,
            mode: Mode, defaultAllow: Boolean = false): DataFrame = {
    val r = rules.filter(col("principal") === principal)
      .select(col("uriPrefix"), col("allow"))
    val joined = hits.withColumn("__uri", uriCol)
      .join(broadcast(r), col("__uri").startsWith(col("uriPrefix")), "left")
      .groupBy(hits.columns.map(col) :+ col("__uri"): _*)
      .agg(max_by(col("allow"), length(col("uriPrefix"))).as("__match"))
      .withColumn("acl_allowed", coalesce(col("__match"), lit(defaultAllow)))
      .drop("__uri", "__match")
    mode match {
      case Audit   => joined
      case Enforce => joined.filter(col("acl_allowed")).drop("acl_allowed")
    }
  }
}
