package graft.service

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.storage.StorageLevel

import graft.model.{Layer, LoadResponse, QueueMessage}
import graft.sinks.Warehouse
import graft.sources.GeoJsonZipSource

/** The extract-load pipeline (reference
  * `src/service/extract-load-service.ts:242-345`), Spark-first.
  *
  * One request = one archive load:
  *   1. pre-clean the dataset's rows (A1; partition delete),
  *   2. streamed ZIP/GeoJSON expansion with the geometry transform (P7)
  *      FUSED into the parse loop (one Jackson parse + one serialize per
  *      feature — never parse-serialize-reparse),
  *   3. per-layer writes to `content_*` tables (partitioned by dataset
  *      id, dynamic overwrite),
  *   4. header metadata → `dataset` row (K8) and `extension_file` rows
  *      (K9; ids are a per-dataset dense sequence in archive entry
  *      order — the reference's DB sequence is opaque, so the contract
  *      here is ours),
  *   5. stats refresh (A3; computed from the cached parse, one shuffle),
  *   6. success/failure response (K10).
  *
  * Spark-action budget per load: ONE aggregation over the cached parse
  * (layer/kind counts — replaces the reference-era per-layer isEmpty
  * probes), ONE small header collect (rows ≈ entries per archive,
  * bounded by archive layout, not data volume), one write per non-empty
  * layer, one stats agg, two metadata writes, one response append.
  *
  * Failure anywhere → failure response; a replay overwrites the same
  * partitions, which is how the reference's transaction-rollback intent
  * is preserved at Spark scale (no cross-table ACID needed).
  */
class ExtractLoadEngine(spark: SparkSession, warehouseRoot: String) {
  import spark.implicits._

  val warehouse = new Warehouse(spark, warehouseRoot)

  // ---- A2: per-stage wall-clock metrics ---------------------------------
  // The reference times every stage (`console.time` at
  // `extract-load-service.ts:301,322,327-336,360,...`); same points here:
  // pre_clean (A1), parse_count (the one counts action), write_features
  // (all layer writes), metadata (K8/K9), stats (A3), process_files total.
  private val timings = scala.collection.mutable.LinkedHashMap[String, Double]()

  /** Stage wall times (seconds) of the most recent load on this engine. */
  def lastStageTimings: Map[String, Double] = timings.synchronized(timings.toMap)

  private def timed[T](stage: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally timings.synchronized {
      timings(stage) =
        timings.getOrElse(stage, 0.0) + (System.nanoTime() - t0) / 1e9
    }
  }

  def processRequest(msg: QueueMessage): LoadResponse = {
    // failures route through the terminal error translation
    // (ErrorMapping.toResponse = error-handler-middleware.ts:13-22 +
    // the typed-DB bridge), so a unique-key violation publishes the
    // reference's 400/"already exists" form instead of a generic 500
    val resp =
      try {
        msg.data.data_type match {
          case "osw" =>
            processOswDataset(msg)
            LoadResponse(msg.messageId, msg.messageType,
              "Data loaded successfully", success = true)
          case _ => // flex/pathways (:269-274)
            LoadResponse(msg.messageId, msg.messageType,
              "Error loading the data : Method not implemented.",
              success = false, status = 500)
        }
      } catch {
        case e: Exception =>
          val er = ErrorMapping.toResponse(e)
          LoadResponse(msg.messageId, msg.messageType,
            s"Error loading the data : ${er.message}",
            success = false, status = er.status)
      }
    warehouse.appendResponses(Seq(resp).toDF())
    resp
  }

  def processOswDataset(msg: QueueMessage): Unit = timed("process_files") {
    val datasetId = msg.data.tdei_dataset_id
    val userId = msg.data.user_id
    timings.synchronized(timings.clear())

    // A1: idempotent pre-clean across every table.
    timed("pre_clean")(warehouse.deleteDatasetRecords(datasetId))

    // 2. streamed source with the geometry transform fused in.
    val parsed = GeoJsonZipSource.read(spark, msg.data.file_upload_path, transform = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE action: per-(layer, kind) counts. Presence of any header row
      // ⇔ at least one valid .geojson entry; feature counts decide which
      // layer tables get a write.
      val counts: Map[(String, String), Long] = timed("parse_count")(parsed
        .groupBy($"layer", $"kind").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap)
      if (!counts.keys.exists(_._2 == "header"))
        throw new RuntimeException("No valid .geojson files found in dataset archive.")
      val featureCount: String => Long = l => counts.getOrElse((l, "feature"), 0L)

      val features = parsed.filter($"kind" === "feature")

      // Header rows: one per entry — bounded by archive layout (a few
      // entries per ZIP), safe to collect.
      val headers = parsed.filter($"kind" === "header")
        .select($"entry_path", $"entry_seq", $"layer", $"header")
        .collect()
        .sortBy(_.getAs[Int]("entry_seq"))

      // Extension-file id allocation: dense per-dataset sequence in entry
      // order (driver-side; the reference memoizes the DB-generated id,
      // `extract-load-service.ts:59,123,456-458`).
      val extEntries = headers.filter(_.getAs[String]("layer") == "extension")
      val extIds: Map[String, Int] =
        extEntries.zipWithIndex.map { case (r, i) => r.getString(0) -> (i + 1) }.toMap

      // 3. per-layer feature writes (K1–K7) — no isEmpty probes: the
      // single counts aggregation already told us which layers are live.
      Layer.all.foreach { layer =>
        if (featureCount(layer.name) > 0) {
          val slice = features.filter($"layer" === layer.name)
          val out =
            if (layer == Layer.Extension) {
              val idMap = typedLit(extIds)
              slice.select(
                lit(datasetId).as("tdei_dataset_id"),
                element_at(idMap, $"entry_path").as("ext_file_id"),
                $"feature",
                lit(userId).as("requested_by"))
            } else
              slice.select(
                lit(datasetId).as("tdei_dataset_id"),
                $"feature",
                lit(userId).as("requested_by"))
          timed("write_features")(warehouse.writeFeatures(layer.table, out))
        }
      }

      // 4a. dataset metadata row (K8): last entry per layer wins, matching
      // the reference's sequential per-entry UPDATEs.
      val infoByLayer: Map[String, String] =
        headers.filter(_.getAs[String]("layer") != "extension").map { r =>
          r.getAs[String]("layer") -> additionalInfo(r.getAs[String]("header"))
        }.toMap // toMap keeps the LAST value per key

      val metaCols = Layer.routingOrder.map { l =>
        lit(infoByLayer.get(l.name).orNull).cast(StringType).as(l.metaColumn.get)
      }
      val datasetRow = spark.range(1).select(
        (metaCols :+ lit(datasetId).as("tdei_dataset_id")): _*)
      timed("metadata")(warehouse.upsertByDataset("dataset", datasetRow))

      // 4b. extension_file rows (K9): name = basename sans extension.
      if (extEntries.nonEmpty) {
        val rows = extEntries.map { r =>
          val path = r.getString(0)
          (extIds(path), baseNameNoExt(path),
            additionalInfo(r.getAs[String]("header")), userId)
        }.toSeq
        val extDf = rows.toDF("id", "name", "file_meta", "requested_by")
          .withColumn("tdei_dataset_id", lit(datasetId))
        timed("metadata")(warehouse.upsertByDataset("extension_file", extDf))
      }

      // 5. stats refresh (A3) — from the cached parse, not a table re-read.
      if (Layer.all.exists(l => featureCount(l.name) > 0))
        timed("stats")(updateStats(datasetId, features))
    } finally parsed.unpersist()
  }

  /** Header map minus `features`/`type` (`extract-load-service.ts:494-502`),
    * serialized as the JSON written to the dataset-info columns.
    */
  private[service] def additionalInfo(headerJson: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(headerJson)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.remove("features"); node.remove("type")
    mapper.writeValueAsString(node)
  }

  /** `path.parse(file_name).name` (`extract-load-service.ts:531`). */
  private[service] def baseNameNoExt(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  /** Anchor position of a feature: the first (lon, lat) pair in its
    * coordinates tree at any nesting depth — the basis for the stats
    * bbox (SURVEY A3: count + min/max lon/lat). Regex over the
    * coordinates JSON: skip leading '['s, capture the first two
    * numbers.
    */
  private def anchor(featureJson: org.apache.spark.sql.Column) = {
    val coords = get_json_object(featureJson, "$.geometry.coordinates")
    // number class includes exponent signs ("1.0E-5"); try_cast because a
    // geometry-less/malformed feature yields "" and ANSI cast would fail
    // the whole stats job for one bad row
    val num = "[-+0-9.eE]+"
    val lon = regexp_extract(coords,
      s"^\\[+\\s*($num)", 1).try_cast("double")
    val lat = regexp_extract(coords,
      s"^\\[+\\s*$num\\s*,\\s*($num)", 1).try_cast("double")
    (lon, lat)
  }

  /** A3 replacement: the reference calls an opaque stored procedure
    * (`content.tdei_update_osw_stats`); this engine's contract is a
    * per-dataset aggregation — feature counts per layer table and
    * geometry type, plus the bounding box of feature anchor positions.
    * One shuffle (the groupBy), partial aggregation map-side, computed
    * from the already-cached parsed features.
    */
  private def updateStats(datasetId: String,
      features: org.apache.spark.sql.Dataset[graft.sources.ParsedRecord]): Unit = {
    val tableByLayer = typedLit(Layer.all.map(l => l.name -> l.table).toMap)
    val (lon, lat) = anchor($"feature")
    val stats = features
      .select(element_at(tableByLayer, $"layer").as("layer_table"),
        get_json_object($"feature", "$.geometry.type").as("geometry_type"),
        lon.as("__lon"), lat.as("__lat"))
      .groupBy($"layer_table", $"geometry_type")
      .agg(count(lit(1)).as("feature_count"),
        min($"__lon").as("min_lon"), max($"__lon").as("max_lon"),
        min($"__lat").as("min_lat"), max($"__lat").as("max_lat"))
      .withColumn("tdei_dataset_id", lit(datasetId))
    warehouse.upsertByDataset("stats", stats)
  }

  /** Legacy entry: stats from the stored tables (used when refreshing
    * without a load in hand, mirroring the stored-proc call shape).
    */
  def updateStats(datasetId: String): Unit = {
    val perLayer = Layer.all.map(_.table).distinct.flatMap { t =>
      if (warehouse.partitionExists(t, datasetId)) {
        val (lon, lat) = anchor($"feature")
        Some(spark.read.schema(warehouse.tableSchema(t)).parquet(warehouse.partitionPath(t, datasetId))
          .select(lit(t).as("layer_table"),
            get_json_object($"feature", "$.geometry.type").as("geometry_type"),
            lon.as("__lon"), lat.as("__lat")))
      } else None
    }
    if (perLayer.isEmpty) return
    val all = perLayer.reduce(_ unionAll _)
    val stats = all
      .groupBy($"layer_table", $"geometry_type")
      .agg(count(lit(1)).as("feature_count"),
        min($"__lon").as("min_lon"), max($"__lon").as("max_lon"),
        min($"__lat").as("min_lat"), max($"__lat").as("max_lat"))
      .withColumn("tdei_dataset_id", lit(datasetId))
    warehouse.upsertByDataset("stats", stats)
  }
}
