package graft.sources

import java.io.FileInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7 — GPX track source (lib/process_gpx_data.py:76-102).
  *
  * GPX files are tiny (10³-10⁴ points), so they're parsed driver-side
  * with StAX (no spark-xml dependency available) and turned into a
  * DataFrame with the reference's column contract:
  * `time` (UTC timestamp), `latitude`, `longitude`, `altitude` —
  * the gpx_converter `gpx_to_dataframe()` shape.
  */
object Gpx {

  final case class Point(time: java.sql.Timestamp, latitude: Double,
                         longitude: Double, altitude: Double)

  /** Parse one GPX file's trkpt stream. */
  def parseFile(path: String): Seq[Point] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    // CHARACTERS events can otherwise split at parser buffer boundaries
    // in large files, silently corrupting a parsed number
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    val in = new FileInputStream(path)
    try {
      val r = f.createXMLStreamReader(in)
      val out = Seq.newBuilder[Point]
      var lat = 0.0; var lon = 0.0; var ele = 0.0
      var time: java.sql.Timestamp = null
      var inPt = false
      val text = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "trkpt" =>
                inPt = true; ele = 0.0; time = null
                lat = r.getAttributeValue(null, "lat").toDouble
                lon = r.getAttributeValue(null, "lon").toDouble
              case _ => text.setLength(0)
            }
          case XMLStreamConstants.CHARACTERS if inPt =>
            text.append(r.getText) // accumulate until END_ELEMENT
          case XMLStreamConstants.END_ELEMENT =>
            val s = text.toString.trim
            r.getLocalName match {
              case "trkpt" =>
                inPt = false
                out += Point(time, lat, lon, ele)
              case "ele" if inPt && s.nonEmpty => ele = s.toDouble
              case "time" if inPt && s.nonEmpty =>
                time = java.sql.Timestamp.from(
                  java.time.OffsetDateTime.parse(s).toInstant)
              case _ =>
            }
            text.setLength(0)
          case _ =>
        }
      }
      out.result()
    } finally in.close()
  }

  /** Load GPX files into the reference's DataFrame contract, tagged
    * with the source file (per-file processing downstream, A13 union). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    paths.map { p =>
      parseFile(p).toDF("time", "latitude", "longitude", "altitude")
        .withColumn("file", lit(p))
    }.reduce(_ unionByName _)
  }
}
