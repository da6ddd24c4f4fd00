package graft.service

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.GeoFunctions
import graft.model.{Layer, LoadResponse, QueueMessage}
import graft.sinks.Warehouse
import graft.sources.GeoJsonZipSource

/** The extract-load pipeline (reference
  * `src/service/extract-load-service.ts:242-345`), Spark-first.
  *
  * One request = one archive load:
  *   1. pre-clean the dataset's rows (A1; partition delete),
  *   2. binaryFile scan → lazy ZIP/GeoJSON expansion → `ParsedRecord`s,
  *   3. per-layer `process_geometry` + write to `content_*` tables
  *      (partitioned by dataset id, dynamic overwrite),
  *   4. header metadata → `dataset` row (K8) and `extension_file` rows
  *      (K9; ids are a per-dataset dense sequence in archive entry
  *      order — the reference's DB sequence is opaque, so the contract
  *      here is ours),
  *   5. stats refresh (A3; the stored proc body is external to the
  *      reference, so the schema below is this engine's contract),
  *   6. success/failure response (K10).
  *
  * Failure anywhere → failure response; a replay overwrites the same
  * partitions, which is how the reference's transaction-rollback intent
  * is preserved at Spark scale (no cross-table ACID needed).
  */
final class ExtractLoadEngine(spark: SparkSession, warehouseRoot: String) {
  import spark.implicits._

  val warehouse = new Warehouse(spark, warehouseRoot)

  def processRequest(msg: QueueMessage): LoadResponse = {
    val result =
      try {
        msg.data.data_type match {
          case "osw" => processOswDataset(msg); Right(())
          case _     => Left("Method not implemented.") // flex/pathways (:269-274)
        }
      } catch { case e: Exception => Left(e.getMessage) }
    val resp = result match {
      case Right(_) =>
        LoadResponse(msg.messageId, msg.messageType, "Data loaded successfully", success = true)
      case Left(err) =>
        LoadResponse(msg.messageId, msg.messageType, s"Error loading the data : $err", success = false)
    }
    warehouse.appendResponses(Seq(resp).toDF())
    resp
  }

  def processOswDataset(msg: QueueMessage): Unit = {
    val datasetId = msg.data.tdei_dataset_id
    val userId = msg.data.user_id

    // A1: idempotent pre-clean across every table.
    warehouse.deleteDatasetRecords(datasetId)

    val parsed = GeoJsonZipSource.read(spark, msg.data.file_upload_path)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (parsed.isEmpty)
        throw new RuntimeException("No valid .geojson files found in dataset archive.")

      val features = parsed.filter($"kind" === "feature")
        .withColumn("feature", GeoFunctions.process_geometry($"feature", $"layer"))

      // Extension-file id allocation: dense per-dataset sequence in entry
      // order (driver-side; the set of entries per archive is small).
      val extEntries = parsed
        .filter($"kind" === "header" && $"layer" === "extension")
        .select($"entry_path", $"entry_seq", $"header")
        .collect()
        .sortBy(r => r.getAs[Int]("entry_seq"))
      val extIds: Map[String, Int] =
        extEntries.zipWithIndex.map { case (r, i) => r.getString(0) -> (i + 1) }.toMap

      // 3. per-layer feature writes (K1–K7).
      Layer.all.foreach { layer =>
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
        // Stale partitions were removed by the pre-clean, so empty layers
        // need no write at all.
        if (!slice.isEmpty) warehouse.writeFeatures(layer.table, out)
      }

      // 4a. dataset metadata row (K8): last entry per layer wins, matching
      // the reference's sequential per-entry UPDATEs.
      val headers = parsed.filter($"kind" === "header").collect()
        .sortBy(_.entry_seq)
      val infoByLayer: Map[String, String] =
        headers.filter(_.layer != "extension").map { r =>
          r.layer -> additionalInfo(r.header)
        }.toMap // toMap keeps the LAST value per key

      val metaCols = Layer.routingOrder.map { l =>
        lit(infoByLayer.get(l.name).orNull).as(l.metaColumn.get)
      }
      val datasetRow = spark.range(1).select(
        (metaCols :+ lit(datasetId).as("tdei_dataset_id")): _*)
      warehouse.upsertByDataset("dataset", datasetRow)

      // 4b. extension_file rows (K9): name = basename sans extension.
      if (extEntries.nonEmpty) {
        val rows = extEntries.map { r =>
          val path = r.getString(0)
          (extIds(path), baseNameNoExt(path), additionalInfo(r.getString(2)), userId)
        }.toSeq
        val extDf = rows.toDF("id", "name", "file_meta", "requested_by")
          .withColumn("tdei_dataset_id", lit(datasetId))
        warehouse.upsertByDataset("extension_file", extDf)
      }

      // 5. stats refresh (A3).
      updateStats(datasetId)
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

  /** A3 replacement: the reference calls an opaque stored procedure
    * (`content.tdei_update_osw_stats`); this engine's contract is a
    * per-dataset aggregation over all layer tables — feature counts per
    * layer and per geometry type. One shuffle (the groupBy), partial
    * aggregation map-side.
    */
  def updateStats(datasetId: String): Unit = {
    // Read each table's partition directory for this dataset directly —
    // partition pruning at the path level, no full-table listing.
    val perLayer = Layer.all.map(_.table).distinct.flatMap { t =>
      if (warehouse.partitionExists(t, datasetId))
        Some(spark.read.parquet(warehouse.partitionPath(t, datasetId))
          .select(lit(t).as("layer_table"),
            get_json_object($"feature", "$.geometry.type").as("geometry_type")))
      else None
    }
    if (perLayer.isEmpty) return
    val all = perLayer.reduce(_ unionAll _)
    val stats = all
      .groupBy($"layer_table", $"geometry_type")
      .agg(count(lit(1)).as("feature_count"))
      .withColumn("tdei_dataset_id", lit(datasetId))
    warehouse.upsertByDataset("stats", stats)
  }
}
