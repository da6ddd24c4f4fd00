package graft.model

/** Core data model of the extract-load engine.
  *
  * Mirrors the job envelope / routing registry of the reference
  * (`src/service/extract-load-service.ts:22-29,74-128` and
  * `README.md:59-71`), re-expressed as Scala case classes that Spark
  * encodes natively (`Dataset[ExtractLoadRequest]`).
  */

/** Payload of one extract-load job (`extract-load-service.ts:22-29`). */
final case class ExtractLoadRequest(
    data_type: String,          // "osw" | "flex" | "pathways"
    file_upload_path: String,   // URL/path of the dataset ZIP
    tdei_dataset_id: String,
    user_id: String
)

/** Bus envelope (`README.md:59-71`). */
final case class QueueMessage(
    messageId: String,
    messageType: String,
    data: ExtractLoadRequest
)

/** Success/failure response published after a job
  * (`extract-load-service.ts:854-861`), carrying the translated HTTP
  * status of the terminal error handler
  * (`error-handler-middleware.ts:13-22` — the reference surfaces the
  * typed status on its HTTP plane; the engine's single publication
  * plane carries it on the response row, 200 on success).
  */
final case class LoadResponse(
    messageId: String,
    messageType: String,
    message: String,
    success: Boolean,
    status: Int = 200
)

/** Layer routing registry.
  *
  * The reference routes each ZIP entry by *substring* match on the entry
  * path, first match wins, in exactly this order
  * (`extract-load-service.ts:74-82`); everything else is an "extension"
  * layer. Each layer maps to a target table and (for non-extension
  * layers) a dataset-metadata column (`:89-118`).
  */
final case class Layer(
    name: String,          // routing kind: nodes/edges/points/...
    pathToken: String,     // substring matched against the entry path
    table: String,         // content.* target table
    metaColumn: Option[String] // content.dataset column for header info
)

object Layer {
  val Nodes    = Layer("nodes", "nodes", "node", Some("node_info"))
  val Edges    = Layer("edges", "edges", "edge", Some("event_info"))
  val Points   = Layer("points", "points", "extension_point", Some("ext_point_info"))
  val Lines    = Layer("lines", "lines", "extension_line", Some("ext_line_info"))
  val Polygons = Layer("polygons", "polygons", "extension_polygon", Some("ext_polygon_info"))
  val Zones    = Layer("zones", "zones", "zone", Some("zone_info"))
  val Extension = Layer("extension", "", "extension", None)

  /** Routing order is semantically significant — preserve it exactly. */
  val routingOrder: Seq[Layer] =
    Seq(Nodes, Edges, Points, Lines, Polygons, Zones)

  val all: Seq[Layer] = routingOrder :+ Extension

  /** Route an entry path to its layer (`extract-load-service.ts:74-82`). */
  def route(entryPath: String): Layer =
    routingOrder.find(l => entryPath.contains(l.pathToken)).getOrElse(Extension)
}
