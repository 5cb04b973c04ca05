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

  /** What the `Graft` facade threads through search()/ask() — either ACL
    * model, applied post-retrieval exactly where the reference applies it
    * (src/memvid/search/mod.rs:267-276, src/memvid/ask.rs:372-380). */
  sealed trait Check { def mode: Mode }

  /** rule-table model: (principal, uriPrefix, allow) rows, longest prefix
    * wins (the Audit/Enforce pair gated in acl_audit/acl_enforce) */
  final case class Request(rules: DataFrame, principal: String, mode: Mode,
                           defaultAllow: Boolean = false) extends Check

  /** the reference's metadata contract: caller [[Context]] evaluated
    * against per-frame policy metadata (src/memvid/acl.rs; gated in
    * acl_metadata_enforce). Deny-by-default on missing/invalid policy. */
  final case class MetadataCheck(ctx: Context, mode: Mode) extends Check

  // -------------------------------------------------------------------
  // Metadata-contract evaluation — the reference's ACTUAL ACL model
  // (src/memvid/acl.rs:60-258): per-frame metadata carries the policy
  // (tenant, visibility, read roles/groups/principals as JSON string
  // arrays; src/types/acl.rs:6-19) and the caller's AclContext is
  // evaluated against it. Deny-by-default on missing/invalid metadata;
  // strict cross-tenant isolation; `public` visibility short-circuits;
  // `restricted` requires a principal/role/group intersection. The
  // prefix-rules form above is the complementary rule-table model; this
  // is the contract the reference ships.
  // -------------------------------------------------------------------

  /** caller identity (reference AclContext, src/types/acl.rs:33-48);
    * values are normalized like the reference's normalize_scalar —
    * trim, legacy JSON-string unwrap, lowercase, empty → absent */
  final case class Context(tenantId: String, subjectId: Option[String] = None,
                           roles: Seq[String] = Nil, groupIds: Seq[String] = Nil)

  /** frame-metadata keys (src/types/acl.rs:6-19) */
  val TenantKey = "acl_tenant_id"
  val VisibilityKey = "acl_visibility"
  val ReadRolesKey = "acl_read_roles"
  val ReadGroupsKey = "acl_read_groups"
  val ReadPrincipalsKey = "acl_read_principals"

  /** reference normalize_scalar (acl.rs:259-276) as a Column: trim,
    * unwrap a legacy JSON-quoted scalar ("\"restricted\"" — bindings
    * that stringified values), trim again, lowercase; empty → NULL.
    * get_json_object returns NULL for non-JSON input, which coalesces
    * back to the trimmed raw — the same accept-either behavior.
    * (Known corner: a JSON OBJECT value round-trips differently than
    * serde's from_str::<String> failure — both engines here treat it
    * via the same get_json_object/json_extract_string path, and policy
    * values are scalars by contract.) */
  private def normScalar(c: Column): Column = {
    val t = trim(c)
    val unwrapped = trim(coalesce(get_json_object(t, "$"), t))
    val lowered = lower(unwrapped)
    when(c.isNull || lowered === "", lit(null).cast("string")).otherwise(lowered)
  }

  /** anchored match for "JSON array whose elements are all strings" —
    * only meaningful on text already known to parse as a JSON array */
  private val AllStringElementsRe =
    """^\s*\[\s*(("([^"\\]|\\.)*")(\s*,\s*"([^"\\]|\\.)*")*)?\s*\]\s*$"""

  private def normScalarS(s: String): Option[String] = {
    val t = if (s == null) "" else s.trim
    val un = if (t.length >= 2 && t.head == '"' && t.last == '"')
      t.substring(1, t.length - 1).trim else t
    val l = un.toLowerCase(java.util.Locale.ROOT)
    if (l.isEmpty) None else Some(l)
  }

  /** Per-row ACL decision over a map<string,string> metadata column:
    * 'allow' | 'cross_tenant' | 'restricted' | 'missing_metadata'
    * (the reference's AclDecision + stats classification, acl.rs:56-94,
    * 179-216). Pure column expressions — evaluates inside the scan at
    * any scale; the context is a handful of broadcast literals. */
  /** the parsed form of one JSON-list policy key — what
    * [[applyMetadata]] factors into a projected column so the decision
    * tree carries ONE reference per key instead of three copies of the
    * (non-cheap) from_json (CollapseProject keeps a projection whose
    * producer is non-cheap and multiply-referenced, so the factoring
    * survives optimization; measured round 18: first-run plan+codegen
    * 4.3 s → the factored tree compiles in roughly half that) */
  private def parsedList(meta: Column, key: String): Column =
    from_json(element_at(meta, key), org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType))

  def metadataDecision(meta: Column, ctx: Context): Column =
    metadataDecisionWith(meta, ctx, parsedList(meta, _))

  private def metadataDecisionWith(meta: Column, ctx: Context,
                                   arrOf: String => Column): Column = {
    val ctxTenant = normScalarS(ctx.tenantId)
      .getOrElse(throw new IllegalArgumentException(
        "acl context tenant_id is required (normalizes to empty)"))
    val ctxSubject = ctx.subjectId.flatMap(normScalarS)
    val ctxRoles = ctx.roles.flatMap(normScalarS(_))
    val ctxGroups = ctx.groupIds.flatMap(normScalarS(_))

    val tenant = normScalar(element_at(meta, TenantKey))
    val vis = normScalar(element_at(meta, VisibilityKey))

    def listRaw(key: String): Column = element_at(meta, key)
    def listArr(key: String): Column = arrOf(key)
    // a missing key is an empty list; a present key must parse as a JSON
    // STRING array whose every element normalizes non-empty (acl.rs:
    // parse_acl_list = serde from_str::<Vec<String>> — any failure is a
    // metadata error, not an empty set). from_json alone is too lenient:
    // it coerces [1,2] to ["1","2"] and objects to their JSON text, which
    // the reference rejects — a fail-open divergence. For a VALID JSON
    // array (listArr non-null guarantees that), "every element is a
    // string" is a regular property of the raw text: each element is a
    // quoted token whose interior is (non-quote-non-backslash | escape)*,
    // so the rlike below is exact, not a heuristic.
    def listValid(key: String): Column =
      listRaw(key).isNull ||
        (listArr(key).isNotNull &&
          listRaw(key).rlike(AllStringElementsRe) &&
          !exists(listArr(key), e => normScalar(e).isNull))
    def listNorm(key: String): Column =
      when(listRaw(key).isNull, array().cast("array<string>"))
        .otherwise(transform(listArr(key), e => normScalar(e)))

    val parsedOk = tenant.isNotNull && vis.isin("public", "restricted") &&
      listValid(ReadRolesKey) && listValid(ReadGroupsKey) && listValid(ReadPrincipalsKey)
    val principalHit = ctxSubject match {
      case Some(subj) => array_contains(listNorm(ReadPrincipalsKey), subj)
      case None => lit(false)
    }
    val roleHit =
      if (ctxRoles.isEmpty) lit(false)
      else arrays_overlap(listNorm(ReadRolesKey), typedlit(ctxRoles))
    val groupHit =
      if (ctxGroups.isEmpty) lit(false)
      else arrays_overlap(listNorm(ReadGroupsKey), typedlit(ctxGroups))

    when(!coalesce(parsedOk, lit(false)), lit("missing_metadata"))
      .when(tenant =!= lit(ctxTenant), lit("cross_tenant"))
      .when(vis === "public", lit("allow"))
      .when(principalHit || roleHit || groupHit, lit("allow"))
      .otherwise(lit("restricted"))
  }

  /** Apply the metadata contract to a hit page (reference
    * apply_acl_to_search_hits, acl.rs:96-137): Audit annotates every hit
    * with `acl_decision`/`acl_allowed`; Enforce keeps allowed hits and
    * RE-RANKS the survivors densely (`acl_rank` = 1..n in `rankBy`
    * order — hit.rank = index + 1 there). The hit page is bounded
    * (top-k), so the Enforce window is bounded too. */
  def applyMetadata(hits: DataFrame, metaCol: Column, ctx: Context,
                    mode: Mode, rankBy: Seq[Column]): DataFrame = {
    // factor each list key's from_json into ONE projected column (see
    // [[parsedList]]) — the decision references each three times
    // (validity, all-strings check, normalization), and inlined copies
    // triple the tree Catalyst analyzes and janino compiles
    val arrCols = Seq(ReadRolesKey -> "__acl_arr_r",
      ReadGroupsKey -> "__acl_arr_g", ReadPrincipalsKey -> "__acl_arr_p")
    val withArr = arrCols.foldLeft(hits) { case (df, (k, c)) =>
      df.withColumn(c, parsedList(metaCol, k))
    }
    val names = arrCols.toMap
    val d = metadataDecisionWith(metaCol, ctx, k => col(names(k)))
    val dropCols = arrCols.map(_._2)
    mode match {
      case Audit =>
        withArr.withColumn("acl_decision", d)
          .withColumn("acl_allowed", col("acl_decision") === "allow")
          .drop(dropCols: _*)
      case Enforce =>
        // bounded-collect rank (r20): every Enforce caller feeds a
        // bounded hit page (≤ offset+topK serving pages / a fixture
        // constant), so the dense 1..n re-rank is the page enumerated in
        // `rankBy` order — the former unpartitioned row_number Window
        // moved the page to a single partition (the "No Partition
        // Defined" WindowExec warning near the driver-parsed bench tail)
        // for the same assignment over the same total order.
        val sorted = withArr.withColumn("__d", d).filter(col("__d") === "allow")
          .drop("__d").drop(dropCols: _*)
          .orderBy(rankBy: _*)
        val rows = sorted.collect()
        val schema = org.apache.spark.sql.types.StructType(
          sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
            "acl_rank", org.apache.spark.sql.types.IntegerType, nullable = false))
        val ranked = rows.iterator.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1)) }.toArray
        hits.sparkSession.createDataFrame(
          java.util.Arrays.asList(ranked: _*), schema)
    }
  }

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
