package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** The can_ids JSON schema registry — pure Scala (no Spark), parsed
  * with Jackson (already on the Spark classpath).
  *
  * Replicates the reference loader and generated ctypes parsers:
  *  - loader re-keys modules by `signature`, topics by `id`
  *    (lib/canparser.py:36-50);
  *  - field layout from `bytes` slots skipping nulls, `_H` slots
  *    skipped, `_L` names stripped; types u8/uint8_t, u16/uint16_t
  *    (little-endian), bitfield = 1 bit of a shared byte
  *    (lib/canparser_generator.py:77-101), with ctypes
  *    `_pack_=1` offset assignment (consecutive bitfields pack
  *    LSB-first into one byte);
  *  - quirk Q3: the declared size used for payload-length validation
  *    over-counts packed bitfields (1 byte each —
  *    lib/canparser_generator.py:112-115), so some real frames are
  *    always rejected (e.g. MCS19.START_STAGES);
  *  - quirk Q1: the units applied to the b-th decoded field are looked
  *    up at raw slot index b (lib/canparser.py:98-100), which
  *    misaligns after any `_L/_H` pair collapses;
  *  - unit scaling rules (lib/canparser_generator.py:56-75): "%" →
  *    ×1/255 label "%"; "" → unchanged; otherwise split into
  *    (non-digit, digit) runs: scale = 1/digits, label = non-digit
  *    part with "/" removed.
  */
object CanSchema {

  sealed trait FieldKind
  case object U8 extends FieldKind
  case object U16LE extends FieldKind
  /** bit index within the byte at `byteOffset` (ctypes LE: LSB first) */
  final case class Bit(bit: Int) extends FieldKind

  /** One decoded output field with its resolved byte layout + scaling. */
  final case class FieldSpec(
      name: String, byteOffset: Int, kind: FieldKind,
      scale: Double, unitLabel: String)

  final case class Topic(
      name: String, id: Int,
      /** raw 8 byte slots: (name, type, units) or None */
      slots: Vector[Option[(String, String, String)]]) {

    /** Decoded field list in ctypes declaration order, with offsets
      * assigned by the `_pack_=1` little-endian layout algorithm. */
    lazy val fields: Vector[FieldSpec] = {
      val decoded = slots.flatten.filterNot(_._1.endsWith("_H"))
      var offset = 0
      var bitPos = -1 // -1 = no open bitfield byte
      val out = Vector.newBuilder[FieldSpec]
      decoded.zipWithIndex.foreach { case ((rawName, typ, _), i) =>
        val name = if (rawName.endsWith("_L")) rawName.dropRight(2) else rawName
        // Q1: units come from raw slot index i (not this field's slot)
        val unitsOrdinal = slots(i) match {
          case Some((_, _, u)) => u
          case None => throw new IllegalStateException(
            s"units ordinal lookup hit a null slot (field $name index $i) — " +
              "the reference would raise here too (lib/canparser.py:100)")
        }
        val (label, scale) = unitScale(unitsOrdinal)
        typ match {
          case "u8" | "uint8_t" =>
            if (bitPos >= 0) { offset += 1; bitPos = -1 }
            out += FieldSpec(name, offset, U8, scale, label); offset += 1
          case "u16" | "uint16_t" =>
            if (bitPos >= 0) { offset += 1; bitPos = -1 }
            out += FieldSpec(name, offset, U16LE, scale, label); offset += 2
          case "bitfield" =>
            if (bitPos > 7) { offset += 1; bitPos = -1 } // byte full (8 bits used)
            if (bitPos < 0) bitPos = 0
            out += FieldSpec(name, offset, Bit(bitPos), scale, label)
            bitPos += 1
          case other =>
            throw new IllegalArgumentException(s"unknown field type: $other")
        }
      }
      out.result()
    }

    /** Q3 — declared size for payload-length validation: 1 byte per
      * u8/bitfield, 2 per u16 (sum of sizeof, not packed size). */
    lazy val declaredSize: Int =
      slots.flatten.filterNot(_._1.endsWith("_H")).map(_._2 match {
        case "u16" | "uint16_t" => 2
        case _ => 1
      }).sum
  }

  final case class Module(name: String, signature: Int, topics: Map[Int, Topic])

  final case class Schema(version: String, modules: Map[Int, Module]) {
    /** every (module, topic) pair */
    def allTopics: Seq[(Module, Topic)] =
      modules.values.toSeq.sortBy(_.signature)
        .flatMap(m => m.topics.values.toSeq.sortBy(_.id).map(m -> _))
    /** exhaustive wide-matrix column list MODULE__TOPIC__FIELD
      * (lib/canparser.py:237-239) */
    def wideColumns: Seq[String] = allTopics.flatMap { case (m, t) =>
      t.fields.map(f => s"${m.name}__${t.name}__${f.name}")
    }
  }

  /** apply_units (lib/canparser_generator.py:56-75). Returns
    * (label, scale). */
  def unitScale(units: String): (String, Double) =
    if (units == "%") ("%", 1.0 / 255)
    else if (units == "") ("", 1.0)
    else {
      // itertools.groupby(key=str.isdigit) runs
      val runs = splitDigitRuns(units)
      val scale = 1.0 / runs(1).toDouble
      (runs(0).replace("/", ""), scale)
    }

  private def splitDigitRuns(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var cur = new StringBuilder
    var curDigit: Option[Boolean] = None
    s.foreach { c =>
      val d = c.isDigit
      if (curDigit.contains(d) || curDigit.isEmpty) { cur.append(c) }
      else { out += cur.toString; cur = new StringBuilder; cur.append(c) }
      curDigit = Some(d)
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** Load a can_ids JSON file (lib/canparser.py:36-50). */
  def load(path: String): Schema =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  def parse(json: String): Schema = {
    val root = new ObjectMapper().readTree(json)
    val modules = root.get("modules").elements().asScala.map { m =>
      val topics = m.get("topics").elements().asScala.map { t =>
        val slots = t.get("bytes").elements().asScala.map { b =>
          if (b == null || b.isNull) None
          else Some((b.get("name").asText(), b.get("type").asText(),
            b.get("units").asText()))
        }.toVector
        val topic = Topic(t.get("name").asText(), t.get("id").asInt(), slots)
        topic.id -> topic
      }.toMap
      val mod = Module(m.get("name").asText(), m.get("signature").asInt(), topics)
      mod.signature -> mod
    }.toMap
    Schema(Option(root.get("version")).map(_.asText()).getOrElse(""), modules)
  }
}
