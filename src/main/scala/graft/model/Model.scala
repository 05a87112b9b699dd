package graft.model

import java.sql.Timestamp

/** Core typed records of the engine (SURVEY.md §1.1).
  *
  * `Turn` is the primary input row, shape fixed by BASELINE.json:input_hint:
  * (conv_id string, turn_idx int32, role string, text string, tool string?, ts timestamp).
  * It plays the role of the reference's structured log line
  * (cf. /root/reference/logadempirical/logparser/Drain.py:295-317).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp
)

/** A parsed turn: text matched against the template dictionary.
  * Mirrors a `_structured.csv` row (Drain.py:211-216): EventId, EventTemplate,
  * ParameterList.
  */
final case class ParsedTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp,
    event_id: String,
    event_template: String,
    parameters: Seq[String]
)

/** Template dictionary entry (mirrors `_templates.csv`, Drain.py:218-224). */
final case class Template(
    event_id: String,
    event_template: String,
    occurrences: Long
)

/** A session / window instance: ordered event sequence + label
  * (mirrors logdeep/dataset/session.py:159-166).
  */
final case class SessionWindow(
    session_id: String,
    events: Seq[String],
    labels: Seq[Int],
    label: Int
)
