package graft.api

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** JSON result serialization — the engine-side form of the reference's
  * response path (rows→dicts→JSONResponse, /root/reference/waddle/_server.py:43,
  * SURVEY.md §2.1 S6) and its sorted-keys canonicalization
  * (`json.dumps(..., sort_keys=True)`, /root/reference/waddle/_run.py:46-47,
  * §2.8 F3).
  *
  * Canonical form = struct fields ordered by column name, so two plans
  * producing the same logical rows serialize identically — the property
  * the reference gets from sort_keys. `to_json` is codegen'd; no driver
  * loop touches row data.
  */
object Json {

  /** One canonical JSON object string per row (columns sorted by name). */
  def canonicalRows(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    val sortedCols = df.columns.sorted.toIndexedSeq.map(col)
    df.select(to_json(struct(sortedCols: _*)).as("json")).as[String]
  }

  /** Whole result as a single JSON array string — the response-body shape.
    * Driver-side concat is bounded by the result size the caller already
    * chose to return (every API query here is LIMIT-capped, SURVEY §2.6).
    */
  def responseBody(df: DataFrame, limit: Int = 10000): String =
    canonicalRows(df.limit(limit)).collect().mkString("[", ",", "]")

  /** Small driver-side JSON object with string values — for metadata
    * columns (runs.env); caller passes keys pre-sorted for the canonical
    * sorted-keys form.
    */
  def jsonObject(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) =>
      val esc = v.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      s""""$k":"$esc""""
    }.mkString("{", ",", "}")
}
