package graft.time

import java.sql.Timestamp

/** One turn of a multi-turn agent transcript.
  *
  * Authoritative input shape from BASELINE.json#input_hint:
  * (conv_id:string, turn_idx:int32, role:string, text:string, tool:string, ts:timestamp).
  * `tool` is null for turns that are not tool calls.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)
