"""Custom stateful streaming operator (SURVEY.md T4):
``applyInPandasWithState`` change detector.

The reference compares each incoming batch against the latest stored
snapshot per product (reference postgres_storage.py:1283-1413). The
true streaming form keeps that "latest snapshot" as OPERATOR STATE
instead of a table round-trip: state per key = last seen value;
every micro-batch emits change rows and updates state. This is the
``applyInPandasWithState`` shape the brief calls out for custom
stateful operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, event_id bigint, value double, prev_value double,"
    " change_type string"
)
STATE_SCHEMA = "last_value double"


def _detect_changes(key, pdf_iter, state: GroupState):
    import pandas as pd

    (user_id,) = key
    last_value = state.get[0] if state.exists else None
    out = []
    # Materialize ALL Arrow chunks before sorting: chunk-local sorts
    # would process groups spanning several batches out of event order
    # and emit wrong change sequences. A group's rows per micro-batch
    # are bounded (per-user event volume), so the concat is safe.
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        for _, row in pdf.iterrows():
            if row["value"] is None or row["value"] != row["value"]:
                # NULL value: no defined comparison — skip the row and
                # keep state, mirroring the batch twin's SQL semantics
                # (NULL compares emit no change row)
                continue
            v = float(row["value"])
            if last_value is None:
                change = "first_seen"
            elif v > last_value:
                change = "increase"
            elif v < last_value:
                change = "decrease"
            else:
                change = "no_change"
            if change != "no_change":
                out.append(
                    (int(row["user_id"]), int(row["event_id"]), v, last_value, change)
                )
            last_value = v
    state.update((last_value,))
    if out:
        yield pd.DataFrame(
            out,
            columns=["user_id", "event_id", "value", "prev_value", "change_type"],
        )


def stateful_change_detector(events: DataFrame) -> DataFrame:
    """Per-user stateful change stream: emits increase/decrease/
    first_seen rows; state = last value per user, carried across
    micro-batches (exactly the reference's latest-snapshot compare,
    minus the database)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _detect_changes,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
