package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{CdcColumns, CdcMerge, SchemaEvolution}
import graft.sources.TableCatalog._

/** CDC operator queries (SURVEY.md §2a rows 1-8) over the `events`
  * table viewed as an op-log on `user_id` entities.
  *
  * Op mapping (SURVEY.md §3): signup→2 insert, purchase→0 upsert,
  * click/view→4 update, error with props.k<10→1 delete, other
  * errors→4. Sequence = (ts, event_id). This reproduces the
  * reference's `gwcbi___operation`/`gwcbi___seqval_hex` semantics on
  * public synthetic data.
  */
object Cdc {

  type Q = (SparkSession, String) => DataFrame

  /** props is a JSON-ish string `{"k": N}`; extract N. */
  private def kCol: Column =
    regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int")

  private def opCol: Column =
    when(col("event_type") === "signup", 2)
      .when(col("event_type") === "purchase", 0)
      .when(col("event_type").isin("click", "view"), 4)
      .when(col("event_type") === "error" && kCol < 10, 1)
      .otherwise(4)

  /** Shared oracle fragment computing the same op code in DuckDB. */
  private val opSql: String =
    """CASE WHEN event_type = 'signup' THEN 2
      |     WHEN event_type = 'purchase' THEN 0
      |     WHEN event_type IN ('click','view') THEN 4
      |     WHEN event_type = 'error' AND CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) < 10 THEN 1
      |     ELSE 4 END""".stripMargin

  /** The shared CDC fixture: events coded with operation + seqval
    * columns (public so the Derby round-trip spec replays the exact
    * frame behind the oracle-checked cdc_* queries).
    */
  def codedEvents(s: SparkSession, d: String): DataFrame =
    events(s, d).withColumn(CdcColumns.OperationCol, opCol)
      .withColumn(CdcColumns.SeqValCol,
        lpad(lower(hex(col("event_id"))), 16, "0"))

  // ---- cdc_union_batches: multi-batch read unioned by name ----
  val unionBatches: Q = (s, d) => {
    val e = events(s, d)
    val b1 = e.filter(col("event_id") % 2 === 0)
    val b2 = e.filter(col("event_id") % 2 =!= 0)
    SchemaEvolution.unionEvolved(Seq(b1, b2))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
  }

  val unionBatchesOracle: String =
    """SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
      |FROM events WHERE event_id % 2 = 0
      |UNION ALL
      |SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
      |FROM events WHERE event_id % 2 <> 0""".stripMargin

  // ---- cdc_drop_internal: internal-column management ----
  val dropInternal: Q = (s, d) => {
    val withInternal = codedEvents(s, d)
      .withColumn("gwcbi___connector", lit("graft-test"))
      .withColumn("gwcbi___payload_ts", lit(0L))
    CdcColumns.dropInternal(withInternal)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col(CdcColumns.OperationCol), col(CdcColumns.SeqValCol))
  }

  val dropInternalOracle: String =
    s"""SELECT event_id, user_id, event_type,
       |  $opSql AS gwcbi___operation,
       |  lower(lpad(to_hex(event_id), 16, '0')) AS gwcbi___seqval_hex
       |FROM events""".stripMargin

  // ---- cdc_metadata_cols: provenance columns ----
  val metadataCols: Q = (s, d) =>
    CdcColumns.withBatchMeta(region(s, d), "fp-20260101", 1754006400L)

  val metadataColsOracle: String =
    """SELECT r_regionkey, r_name,
      |  'fp-20260101' AS gwcdac__fingerprintfolder,
      |  '1754006400' AS gwcdac__timestampfolder
      |FROM region""".stripMargin

  // ---- cdc_merge_latest: latest-wins per key (single shuffle) ----
  val mergeLatest: Q = (s, d) => {
    val e = events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts"))
    CdcMerge.latestByKey(e, Seq("user_id"), Seq("ts", "event_id"))
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"), col("ts").as("last_ts"))
  }

  val mergeLatestOracle: String =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
      |  value AS last_value, CAST(ts AS TIMESTAMP) AS last_ts
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
      |WHERE rn = 1""".stripMargin

  // ---- cdc_apply_operations: full ins/upd/del micro-batch apply ----
  val applyOperations: Q = (s, d) => {
    val coded = codedEvents(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("ts"), col(CdcColumns.OperationCol))
    CdcMerge.applyOperations(coded, Seq("user_id"), Seq("ts", "event_id"))
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("value").as("last_value"), col("ts").as("last_ts"))
  }

  val applyOperationsOracle: String =
    s"""WITH coded AS (
       |  SELECT user_id, event_id, value, ts, $opSql AS op FROM events),
       |upserts AS (
       |  SELECT user_id, event_id, value, ts,
       |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM coded WHERE op <> 1)
       |SELECT user_id, event_id AS last_event_id, value AS last_value,
       |  CAST(ts AS TIMESTAMP) AS last_ts
       |FROM upserts
       |WHERE rn = 1 AND user_id NOT IN (SELECT user_id FROM coded WHERE op = 1)""".stripMargin

  // ---- cdc_dedup_batch: raw-log exact dedup (doubled input) ----
  val dedupBatch: Q = (s, d) => {
    val e = events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
    CdcMerge.dedupRaw(e.union(e))
  }

  val dedupBatchOracle: String =
    """SELECT DISTINCT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
      |FROM (SELECT * FROM events UNION ALL SELECT * FROM events) t""".stripMargin

  // ---- cdc_schema_evolution: fingerprint change adds columns ----
  val schemaEvolution: Q = (s, d) => {
    val e = events(s, d)
    val oldFp = e.filter(col("event_id") < 500)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val newFp = e.filter(col("event_id") >= 500)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
    SchemaEvolution.unionEvolved(Seq(oldFp, newFp))
  }

  val schemaEvolutionOracle: String =
    """SELECT event_id, user_id, event_type,
      |  CAST(NULL AS DOUBLE) AS value, CAST(NULL AS TIMESTAMP) AS ts
      |FROM events WHERE event_id < 500
      |UNION ALL
      |SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
      |FROM events WHERE event_id >= 500""".stripMargin

  // ---- cdc_incremental_filter: read past the savepoint only ----
  val incrementalFilter: Q = (s, d) =>
    events(s, d)
      .filter(col("ts") > lit("2024-01-20 00:00:00").cast("timestamp"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))

  val incrementalFilterOracle: String =
    """SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00'""".stripMargin

  // ---- cdc_updates_ordered: every update in apply order (the
  //      reference's jdbcApplyLatestUpdatesOnly=false mode) ----
  val updatesOrdered: Q = (s, d) => {
    val coded = codedEvents(s, d)
      .select(col("user_id"), col("event_id"), col("value"), col("ts"),
        col(CdcColumns.OperationCol))
    CdcMerge.updatesOrdered(coded, Seq("user_id"), Seq("ts", "event_id"))
      .select(col("user_id"), col("event_id"), col("value"), col("apply_order"))
  }

  val updatesOrderedOracle: String =
    s"""WITH coded AS (
       |  SELECT user_id, event_id, value, ts, $opSql AS op FROM events)
       |SELECT user_id, event_id, value,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
       |    ORDER BY ts ASC, event_id ASC) AS BIGINT) AS apply_order
       |FROM coded WHERE op = 4""".stripMargin

  // ---- cdc_snapshot_diff: derive a CDC feed from two snapshots ----
  // v1 = events below 8000 with original values; v2 = events from
  // 2000 up, values doubled where event_id % 3 == 0. The diff must
  // label: < 2000 deletes, >= 8000 inserts, %3 rows in the overlap
  // updates.
  val snapshotDiff: Q = (s, d) => {
    val base = events(s, d).select(col("event_id"), col("user_id"), col("value"))
    val v1 = base.filter(col("event_id") < 8000)
    val v2 = base.filter(col("event_id") >= 2000)
      .withColumn("value",
        when(col("event_id") % 3 === 0, col("value") * 2).otherwise(col("value")))
    graft.cdc.SnapshotDiff.diff(v1, v2, Seq("event_id"))
  }

  val snapshotDiffOracle: String =
    """WITH v1 AS (SELECT event_id, user_id, value FROM events WHERE event_id < 8000),
      |v2 AS (SELECT event_id, user_id,
      |         CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END AS value
      |       FROM events WHERE event_id >= 2000)
      |SELECT COALESCE(v2.event_id, v1.event_id) AS event_id,
      |  COALESCE(v2.user_id, v1.user_id) AS user_id,
      |  COALESCE(v2.value, v1.value) AS value,
      |  CASE WHEN v1.event_id IS NULL THEN 2
      |       WHEN v2.event_id IS NULL THEN 1
      |       ELSE 4 END AS gwcbi___operation
      |FROM v1 FULL OUTER JOIN v2 ON v1.event_id = v2.event_id
      |WHERE v1.event_id IS NULL OR v2.event_id IS NULL
      |   OR v1.user_id <> v2.user_id OR v1.value <> v2.value""".stripMargin

  val queries: Map[String, Q] = Map(
    "cdc_union_batches" -> unionBatches,
    "cdc_drop_internal" -> dropInternal,
    "cdc_metadata_cols" -> metadataCols,
    "cdc_merge_latest" -> mergeLatest,
    "cdc_apply_operations" -> applyOperations,
    "cdc_dedup_batch" -> dedupBatch,
    "cdc_schema_evolution" -> schemaEvolution,
    "cdc_incremental_filter" -> incrementalFilter,
    "cdc_updates_ordered" -> updatesOrdered,
    "cdc_snapshot_diff" -> snapshotDiff)

  val oracles: Map[String, String] = Map(
    "cdc_union_batches" -> unionBatchesOracle,
    "cdc_drop_internal" -> dropInternalOracle,
    "cdc_metadata_cols" -> metadataColsOracle,
    "cdc_merge_latest" -> mergeLatestOracle,
    "cdc_apply_operations" -> applyOperationsOracle,
    "cdc_dedup_batch" -> dedupBatchOracle,
    "cdc_schema_evolution" -> schemaEvolutionOracle,
    "cdc_incremental_filter" -> incrementalFilterOracle,
    "cdc_updates_ordered" -> updatesOrderedOracle,
    "cdc_snapshot_diff" -> snapshotDiffOracle)
}
