package graft.model

import java.sql.Timestamp

/** Character span into the RAW payload (0-based, end-exclusive). */
case class Span(start: Int, end: Int)

/** One transcript turn — the input row shape fixed by the harness
  * (`BASELINE.json` `input_hint`): Iceberg-style transcript table of
  * multi-turn conversation / agent transcripts.
  */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Extraction output for one turn.
  *
  * Mirrors the role of the reference's `OcrResult` + extracted-fields record
  * (reference `pipeline.py:374-423`, `pipeline.py:2587-2613`): full extracted
  * text, parallel span offsets, which path ("engine") produced it, a
  * confidence, and status/metrics columns instead of stringly-typed
  * underscore keys.
  */
case class ExtractedTurn(
    conv_id: String,
    turn_idx: Int,
    path: String,
    text: String,
    spans: Seq[Span],
    confidence: Double,
    status: String,
    blocks_total: Int,
    blocks_kept: Int)

/** Generator row: input turn + analytically-computed golden expectation.
  * Goldens are computed at generation time, never by running the reference
  * (see FIXTURES.md §3).
  */
case class GenTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    expected_text: String,
    expected_path: String,
    expected_status: String,
    expected_spans: Seq[Span])
