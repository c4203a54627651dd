package graft.sources

/** Synthetic can_ids schema used by the correctness-gate queries and
  * specs. Deliberately exercises the replicated reference quirks:
  *  - a `_L/_H` 16-bit pair (collapses, triggering the Q1
  *    units-ordinal misalignment for every later field);
  *  - packed bitfields (Q3: declared size 6 > real packed size 5, so
  *    only 6-byte frames are admitted);
  *  - the `%` (×1/255), `X/100` (×0.01) and empty unit-scale rules.
  *
  * Field layout (ctypes `_pack_=1`, little-endian):
  *   SIGNATURE u8 @0 ×1 "";  CURR u16le @1 ×0.01 "A" (slot1 "A/100");
  *   DUTY u8 @3 — Q1 reads slot2 (CURR_H "V/100") → ×0.01 "V";
  *   FLAG1 bit0 @4 — Q1 reads slot3 ("%") → ×1/255 "%";
  *   FLAG2 bit1 @4 — Q1 reads slot4 ("") → ×1 "".
  */
object CanFixtures {

  val json: String =
    """{
      "version": "test-0.1",
      "modules": [
        { "name": "MOD17", "description": "gate-test module", "signature": 17,
          "topics": [
            { "name": "SENSOR", "description": "gate-test topic", "id": 33,
              "bytes": [
                {"name": "SIGNATURE", "type": "uint8_t", "units": ""},
                {"name": "CURR_L", "type": "uint16_t", "units": "A/100"},
                {"name": "CURR_H", "type": "uint16_t", "units": "V/100"},
                {"name": "DUTY", "type": "uint8_t", "units": "%"},
                {"name": "FLAG1", "type": "bitfield", "units": ""},
                {"name": "FLAG2", "type": "bitfield", "units": ""},
                null, null ] } ] } ] }"""

  lazy val schema: CanSchema.Schema = CanSchema.parse(json)

  /** [[json]] plus a MAB19-shaped module for the Q5 mab20-workaround
    * gate (can_ids_2020.json signature 230: topic 64 STATE
    * (SIGNATURE/STATE/ERROR), topic 65 PUMPS (SIGNATURE/PUMPS) — the
    * reference forces signature 230 for topics 64/65 and truncates
    * topic 65's payload to 2 bytes, lib/canparser.py:127-133). */
  val jsonMab: String =
    """{
      "version": "test-mab-0.1",
      "modules": [
        { "name": "MOD17", "description": "gate-test module", "signature": 17,
          "topics": [
            { "name": "SENSOR", "description": "gate-test topic", "id": 33,
              "bytes": [
                {"name": "SIGNATURE", "type": "uint8_t", "units": ""},
                {"name": "CURR_L", "type": "uint16_t", "units": "A/100"},
                {"name": "CURR_H", "type": "uint16_t", "units": "V/100"},
                {"name": "DUTY", "type": "uint8_t", "units": "%"},
                {"name": "FLAG1", "type": "bitfield", "units": ""},
                {"name": "FLAG2", "type": "bitfield", "units": ""},
                null, null ] } ] },
        { "name": "MAB19", "description": "mab workaround module", "signature": 230,
          "topics": [
            { "name": "STATE", "description": "boat state", "id": 64,
              "bytes": [
                {"name": "SIGNATURE", "type": "uint8_t", "units": ""},
                {"name": "STATE", "type": "uint8_t", "units": ""},
                {"name": "ERROR", "type": "uint8_t", "units": ""},
                null, null, null, null, null ] },
            { "name": "PUMPS", "description": "pump flags", "id": 65,
              "bytes": [
                {"name": "SIGNATURE", "type": "uint8_t", "units": ""},
                {"name": "PUMPS", "type": "uint8_t", "units": ""},
                null, null, null, null, null, null ] } ] } ] }"""

  lazy val schemaMab: CanSchema.Schema = CanSchema.parse(jsonMab)
}
