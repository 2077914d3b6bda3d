"""Streaming EQL: the sequence automaton over a live event stream.

ES runs EQL against indices as data arrives; the Structured-Streaming
twin keeps ONE automaton state per join key in the state store
(``applyInPandasWithState`` — RocksDB/HDFS-backed on a cluster, so state
cardinality scales with distinct keys, not event volume) and emits each
completed sequence as an append-mode row.

The automaton is the SAME deterministic single-slot machine as the batch
front-end (plans/eql.py — one pending prefix per length, deepest
extension wins, ``until`` clears, completion consumes), applied to each
micro-batch's events in (ts, id) order, resuming from the persisted
state. A single ``availableNow`` batch therefore reproduces the batch
result exactly (pinned by test); across micro-batches, events are
processed in ARRIVAL order per batch — an event arriving later than a
younger already-processed event is seen late, the same caveat as any
at-arrival stream processor (pair with a watermarked, ordered source
when the input can reorder).

State is a JSON blob (one small list per pending prefix) — schema-stable
across sequence lengths, checkpoint-recoverable, and tiny: O(L · ids).
"""

from __future__ import annotations

import json
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tweets_elastic_spark.plans.eql import EqlQuery, _stage_pred, parse_eql

__all__ = ["streaming_eql_sequence"]


def streaming_eql_sequence(
    events_stream: DataFrame,
    query: str | EqlQuery,
    *,
    timestamp_field: str = "ts",
    event_category_field: str = "event_type",
    id_field: str = "event_id",
) -> DataFrame:
    eq = parse_eql(query) if isinstance(query, str) else query
    if eq.kind != "sequence":
        raise ValueError(
            "streaming_eql_sequence needs a sequence query; run plain "
            "event queries as an ordinary streaming filter"
        )
    L = len(eq.stages)
    preds = [_stage_pred(s, event_category_field) for s in eq.stages]
    if eq.until is not None:
        preds.append(_stage_pred(eq.until, event_category_field))
    any_stage = preds[0]
    for p in preds[1:]:
        any_stage = any_stage | p

    ts_type = events_stream.schema[timestamp_field].dataType.simpleString()
    tscol: Column = F.col(timestamp_field)
    if ts_type.startswith("timestamp"):
        tscol = tscol.cast("timestamp")

    gnames = [f"__k{i}" for i in range(len(eq.by))]
    stage_by = eq.stages[0].by is not None
    if stage_by:
        # per-stage join keys (r11): same candidate-key fan-out as the
        # batch engine (plans/eql.py), computed BEFORE the stateful
        # grouping so the state layout is unchanged — the unified key
        # rides as ONE extra string grouping column (fields joined on
        # \x1f; the batch side compares array<string>, equal whenever
        # values are \x1f-free — documented).
        by_lists = [s.by for s in eq.stages]
        if eq.until is not None:
            by_lists.append(eq.until.by)

        def skey(fields):
            return F.concat_ws(
                "\x1f", *[F.col(f).cast("string") for f in fields])

        def svalid(fields):
            v = F.lit(True)
            for f in fields:
                v = v & F.col(f).isNotNull()
            return v

        scols = [
            F.when(p & svalid(fl), skey(fl)).alias(f"__s{j}")
            for j, (p, fl) in enumerate(zip(preds, by_lists))
        ]
        ev = events_stream.filter(any_stage).select(
            *[F.col(kf).alias(kn) for kf, kn in zip(eq.by, gnames)],
            tscol.cast("double").alias("tsd"),
            F.col(id_field).cast("bigint").alias("eid"),
            *scols,
        )
        cand = F.array_distinct(F.filter(
            F.array(*[F.col(f"__s{j}") for j in range(len(by_lists))]),
            lambda x: x.isNotNull(),
        ))
        ev = ev.select("*", F.explode(cand).alias("__sk"))
        ev = ev.select(
            *gnames, "tsd", "eid", "__sk",
            *[(F.col(f"__s{j}").isNotNull()
               & (F.col(f"__s{j}") == F.col("__sk"))).alias(f"m{j}")
              for j in range(len(by_lists))],
        )
        knames = gnames + ["__sk"]
    else:
        ev = events_stream.filter(any_stage).select(
            *[F.col(kf).alias(kn) for kf, kn in zip(eq.by, gnames)],
            tscol.cast("double").alias("tsd"),
            F.col(id_field).cast("bigint").alias("eid"),
            *[p.alias(f"m{i}") for i, p in enumerate(preds)],
        )
        knames = gnames
    for kn in gnames:
        ev = ev.filter(F.col(kn).isNotNull())

    maxspan = eq.maxspan_s
    has_until = eq.until is not None
    n_m = len(preds)  # plain int — the closure must not capture Columns
    key_types = {
        f.name: f.dataType.simpleString()
        for f in events_stream.schema.fields
    }
    stage_key_names = list(eq.stages[0].by) if stage_by else []
    out_schema = (
        ", ".join([f"{kf} {key_types[kf]}" for kf in eq.by]
                  + [f"{nm} string" for nm in stage_key_names])
        + (", " if eq.by or stage_key_names else "")
        + "first_ts double, last_ts double, "
        + ", ".join(f"id{i + 1} long" for i in range(L))
    )
    by_fields = list(eq.by) + stage_key_names
    n_stage_keys = len(stage_key_names)

    def step(key: tuple, pdfs: Iterable[pd.DataFrame],
             state: GroupState) -> Iterable[pd.DataFrame]:
        # slots[j] = [first_ts, [ids...]] for the pending prefix of
        # length j+1, or None — the exact batch-automaton state
        slots = (
            json.loads(state.get[0]) if state.exists else [None] * (L - 1)
        )
        if n_stage_keys:
            # the last key element is the \x1f-joined per-stage key;
            # split it back into its output fields
            key = key[:-1] + tuple(key[-1].split("\x1f"))
        emits: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["tsd", "eid"])
            m_cols = [pdf[f"m{i}"].to_numpy() for i in range(n_m)]
            tsds = pdf["tsd"].to_numpy()
            eids = pdf["eid"].to_numpy()
            for r in range(len(pdf)):
                tsd, eid = float(tsds[r]), int(eids[r])
                if has_until and bool(m_cols[L][r]):
                    slots = [None] * (L - 1)
                    continue
                ext = -1
                for j in range(L - 1, 0, -1):  # deepest extension wins
                    prev = slots[j - 1]
                    if (bool(m_cols[j][r]) and prev is not None
                            and (maxspan is None
                                 or tsd - prev[0] <= maxspan)):
                        ext = j
                        break
                if ext == -1 and bool(m_cols[0][r]):
                    ext = 0
                if ext == -1:
                    continue
                if ext == 0:
                    slots[0] = [tsd, [eid]]
                elif ext == L - 1:
                    fts, ids = slots[L - 2]
                    emits.append((*key, fts, tsd, *ids, eid))
                    slots[L - 2] = None
                else:
                    fts, ids = slots[ext - 1]
                    slots[ext] = [fts, ids + [eid]]
                    slots[ext - 1] = None
        if all(s is None for s in slots):
            # no pending prefix: evict rather than store a tombstone, so
            # the state store does not grow with the number of distinct
            # keys ever seen (the slots rebuild from scratch on the key's
            # next stage-1 event — exactly the fresh-key path)
            if state.exists:
                state.remove()
        else:
            state.update((json.dumps(slots),))
        cols = by_fields + ["first_ts", "last_ts"] + [
            f"id{i + 1}" for i in range(L)
        ]
        yield pd.DataFrame(emits, columns=cols)

    matched = ev.groupBy(*knames).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType="js string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return matched


def streaming_eql_sequence_watermarked(
    events_stream: DataFrame,
    query: str | EqlQuery,
    *,
    delay: str = "10 minutes",
    timestamp_field: str = "ts",
    event_category_field: str = "event_type",
    id_field: str = "event_id",
) -> DataFrame:
    """Event-time-correct streaming EQL: out-of-order events are buffered
    in the per-key state and the automaton only consumes events whose
    timestamp the WATERMARK has passed — consumed in (ts, id) order, so a
    late-but-within-`delay` event lands in its true position (the
    at-arrival variant above would have missed sequences it completes
    retroactively). The trade: matches emit with up to `delay` latency,
    and per-key state additionally holds the <= delay-window buffer
    (bounded by the key's event rate × delay — the standard watermark
    state bound). Same single-slot automaton, same append-mode output.
    """
    eq = parse_eql(query) if isinstance(query, str) else query
    if eq.kind != "sequence":
        raise ValueError("streaming_eql_sequence_watermarked needs a "
                         "sequence query")
    ts_type = events_stream.schema[timestamp_field].dataType.simpleString()
    if not ts_type.startswith("timestamp"):
        raise ValueError(
            "watermarked EQL needs a timestamp-typed event-time column "
            f"(got {ts_type!r} for {timestamp_field!r})"
        )
    stream = events_stream.withWatermark(timestamp_field, delay)

    L = len(eq.stages)
    preds = [_stage_pred(s, event_category_field) for s in eq.stages]
    if eq.until is not None:
        preds.append(_stage_pred(eq.until, event_category_field))
    any_stage = preds[0]
    for p in preds[1:]:
        any_stage = any_stage | p

    gnames = [f"__k{i}" for i in range(len(eq.by))]
    stage_by = eq.stages[0].by is not None
    # the watermarked column itself must reach the stateful operator
    # (the event-time attribute is what makes getCurrentWatermarkMs
    # available); tsd is its double rendering for the automaton
    base_cols = [
        F.col(timestamp_field).alias("__et"),
        F.col(timestamp_field).cast("timestamp").cast("double")
        .alias("tsd"),
        F.col(id_field).cast("bigint").alias("eid"),
    ]
    if stage_by:
        # per-stage join keys (r11): the candidate-key fan-out is a
        # narrow projection+explode, so the event-time attribute (__et)
        # rides through untouched and the watermark semantics are
        # unchanged — same layout as streaming_eql_sequence
        by_lists = [s.by for s in eq.stages]
        if eq.until is not None:
            by_lists.append(eq.until.by)

        def skey(fields):
            return F.concat_ws(
                "\x1f", *[F.col(f).cast("string") for f in fields])

        def svalid(fields):
            v = F.lit(True)
            for f in fields:
                v = v & F.col(f).isNotNull()
            return v

        scols = [
            F.when(p & svalid(fl), skey(fl)).alias(f"__s{j}")
            for j, (p, fl) in enumerate(zip(preds, by_lists))
        ]
        ev = stream.filter(any_stage).select(
            *[F.col(kf).alias(kn) for kf, kn in zip(eq.by, gnames)],
            *base_cols, *scols,
        )
        cand = F.array_distinct(F.filter(
            F.array(*[F.col(f"__s{j}") for j in range(len(by_lists))]),
            lambda x: x.isNotNull(),
        ))
        ev = ev.select("*", F.explode(cand).alias("__sk"))
        ev = ev.select(
            *gnames, "__et", "tsd", "eid", "__sk",
            *[(F.col(f"__s{j}").isNotNull()
               & (F.col(f"__s{j}") == F.col("__sk"))).alias(f"m{j}")
              for j in range(len(by_lists))],
        )
        knames = gnames + ["__sk"]
    else:
        ev = stream.filter(any_stage).select(
            *[F.col(kf).alias(kn) for kf, kn in zip(eq.by, gnames)],
            *base_cols,
            *[p.alias(f"m{i}") for i, p in enumerate(preds)],
        )
        knames = gnames
    for kn in gnames:
        ev = ev.filter(F.col(kn).isNotNull())

    maxspan = eq.maxspan_s
    has_until = eq.until is not None
    n_m = len(preds)
    key_types = {
        f.name: f.dataType.simpleString()
        for f in events_stream.schema.fields
    }
    stage_key_names = list(eq.stages[0].by) if stage_by else []
    out_schema = (
        ", ".join([f"{kf} {key_types[kf]}" for kf in eq.by]
                  + [f"{nm} string" for nm in stage_key_names])
        + (", " if eq.by or stage_key_names else "")
        + "first_ts double, last_ts double, "
        + ", ".join(f"id{i + 1} long" for i in range(L))
    )
    by_fields = list(eq.by) + stage_key_names
    n_stage_keys = len(stage_key_names)

    def step(key: tuple, pdfs: Iterable[pd.DataFrame],
             state: GroupState) -> Iterable[pd.DataFrame]:
        if state.exists:
            slots, buffered = json.loads(state.get[0])
        else:
            slots, buffered = [None] * (L - 1), []
        if n_stage_keys:
            key = key[:-1] + tuple(key[-1].split("\x1f"))
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                buffered.append(
                    [float(row.tsd), int(row.eid)]
                    + [bool(getattr(row, f"m{i}")) for i in range(n_m)]
                )
        wm_s = state.getCurrentWatermarkMs() / 1000.0
        buffered.sort(key=lambda r: (r[0], r[1]))
        ready = [r for r in buffered if r[0] <= wm_s]
        buffered = [r for r in buffered if r[0] > wm_s]
        emits: list[tuple] = []
        for r in ready:
            tsd, eid = r[0], r[1]
            m = r[2:]
            if has_until and m[L]:
                slots = [None] * (L - 1)
                continue
            ext = -1
            for j in range(L - 1, 0, -1):
                prev = slots[j - 1]
                if (m[j] and prev is not None
                        and (maxspan is None or tsd - prev[0] <= maxspan)):
                    ext = j
                    break
            if ext == -1 and m[0]:
                ext = 0
            if ext == -1:
                continue
            if ext == 0:
                slots[0] = [tsd, [eid]]
            elif ext == L - 1:
                fts, ids = slots[L - 2]
                emits.append((*key, fts, tsd, *ids, eid))
                slots[L - 2] = None
            else:
                fts, ids = slots[ext - 1]
                slots[ext] = [fts, ids + [eid]]
                slots[ext - 1] = None
        if maxspan is not None:
            # prune prefixes the watermark has expired: every event a
            # future trigger consumes has tsd > wm_s, so a prefix with
            # fts + maxspan < wm_s can never be extended again —
            # batch-semantics-safe eviction. Without this, a key that
            # starts-but-never-finishes a sequence holds its state row
            # forever.
            slots = [
                s if s is not None and wm_s - s[0] <= maxspan else None
                for s in slots
            ]
        if all(s is None for s in slots) and not buffered:
            # idle key (no pending prefix, nothing awaiting the
            # watermark): evict its state row entirely
            if state.exists:
                state.remove()
        else:
            state.update((json.dumps([slots, buffered]),))
            # wake this key when the watermark passes its earliest
            # buffered event, or when its oldest pending prefix expires
            # — without a timeout, buffered events would only flush (and
            # expired prefixes only evict) when the key happens to
            # receive MORE data: a liveness/state-growth bug for idle keys
            want_ms = int(buffered[0][0] * 1000) + 1 if buffered else None
            if maxspan is not None:
                live = [s[0] for s in slots if s is not None]
                if live:
                    exp_ms = int((min(live) + maxspan) * 1000) + 1
                    want_ms = (exp_ms if want_ms is None
                               else min(want_ms, exp_ms))
            if want_ms is not None:
                state.setTimeoutTimestamp(
                    max(want_ms, int(wm_s * 1000) + 1)
                )
        cols = by_fields + ["first_ts", "last_ts"] + [
            f"id{i + 1}" for i in range(L)
        ]
        yield pd.DataFrame(emits, columns=cols)

    return ev.groupBy(*knames).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType="js string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
