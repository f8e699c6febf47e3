"""Atomic multi-table transactions over txlog tables.

Closes the "single-table transactions only" gap: :func:`tx_multi`
appends to ANY number of txlog tables such that either every table's
commit becomes visible or none does — across crashes at any point.
The design is the catalog-commit shape (Iceberg REST-catalog
multi-table commits; Delta's coordinated-commits direction), rebuilt
on this module's own primitives:

1. **Stage + provisionally commit per table.** Each participant gets a
   normal optimistic log commit (same version race, same claimers)
   whose payload carries ``{"multi": {"coordinator", "txid"}}``.
   Provisional commits occupy a version but are INVISIBLE to readers
   (``txlog._snapshot_files`` skips them while unresolved).
2. **Publish ONE coordinator record.** The transaction's atomic commit
   point is a put-if-absent write of
   ``<coordinator>/_multitx/<txid>.json``. The instant it lands, every
   participant's provisional commit is committed — readers of any
   table resolve through the same record, so there is no state where
   table A shows the transaction and a crash left table B without it.
3. **Abort is a tombstone on the SAME filename.** ``tx_multi_abort``
   put-if-absent-writes ``{"aborted": true}`` to the identical path, so
   commit-vs-abort is arbitrated by the scheme's
   :class:`~.txlog.CommitClaimer` — exactly one wins, no precedence
   rules, no torn outcomes.

Crash matrix: die before any commit → nothing visible, staged files
are vacuum debris. Die between table commits → some tables hold
pending commits; nothing visible; a retry with the same ``txn`` id
reuses them (per-table ``txn`` dedup) and finishes; or an operator
runs :func:`tx_multi_abort` to kill the orphan. Die after the record
→ everything visible; retry returns the recorded versions.

Safety interlocks in txlog: checkpoints refuse to fold an unresolved
multi commit (``_write_checkpoint``), and ``tx_vacuum`` neither
truncates the log nor deletes provisional files while one is pending
— an aborted transaction's files become ordinary vacuum debris.

100 TB posture: the coordinator record is one KB-sized JSON per
transaction; participants pay exactly what a plain ``tx_write`` pays
(driver-side renames + small JSON I/O, data moves executor-side).
Readers pay one existence probe per UNRESOLVED commit in replay
range, and terminal resolutions are cached process-wide.

Scope: ``append`` (default), ``overwrite``, and ``merge`` per
participant (``modes=``; merge since round 11). Overwrite carries
single-table overwrite's own semantics — a whole-snapshot
replacement, last-writer-wins, no conflict check to lose — made
atomic across tables by the same coordinator record; replay applies
the reset at the commit's version position once resolved, so no
reader ever sees table A's new snapshot with table B's old one.

``merge`` runs the exact single-table MERGE body per participant
(stats-pruned copy-on-write upsert, CDF sidecar per the table's
``cdf.enabled``, the full conflict checks) and commits it
provisionally; the coordinator record makes every table's merge
visible at once. Cross-table serializability comes from two guards in
``txlog._commit_rewrite`` / ``_concurrent_append_conflicts`` that
treat PENDING multi commits as conflicts: a single-table rewrite
overlapping a pending transaction's removed files aborts loudly
(instead of committing a rewrite that would double-apply the moment
the record lands), and a key-targeted rewrite sees pending adds in
its key range exactly like post-anchor appends. The price: while a
multi merge is pending, overlapping rewrites on its participants are
blocked until it resolves (commit or abort) — the same table-level
courtesy Delta's coordinated commits demand, and bounded by the same
operator controls (:func:`tx_multi_abort`, ``tx_multi_pending``). A
conflict raised mid-transaction leaves the finished participants
provisional and NOTHING visible; retrying with the same ``txn``
resumes them and re-prepares the conflicted merge on the new
snapshot, or :func:`tx_multi_abort` kills the attempt.

Reference parity: the reference engine (master/master.go) has no
storage transactions at all; this extends the round-7/8 txlog family.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from .sinks import hadoop_fs
from .txlog import (
    _apply_column_mapping,
    _check_append_schema,
    _check_constraints,
    _check_writer_features,
    _collect_stats,
    _commit_rewrite,
    _commit_with_retries,
    _committed_txns,
    _list_commits,
    _load,
    _multi_record_path,
    _multi_status,
    _merge_keys,
    _phys_map,
    _prepare_merge,
    _prepare_merge_into,
    _read_small,
    _replay,
    _Snapshot,
    _stage_and_place,
    _write_atomic,
    _PAD,
)


class MultiTxAborted(RuntimeError):
    """The transaction's coordinator slot holds an abort tombstone."""


def _read_record(spark, coordinator: str, txid: str) -> dict | None:
    fs, p = hadoop_fs(spark, _multi_record_path(coordinator, txid))
    if not fs.exists(p):
        return None
    return json.loads(_read_small(spark, fs, p).decode("utf-8"))


def tx_multi(
    writes: "dict[str, DataFrame]",
    coordinator: str,
    txn: str | None = None,
    stats_cols=None,
    max_retries: int = 20,
    modes: "dict[str, str] | None" = None,
    merge_keys: "dict[str, str | list[str]] | None" = None,
    merge_clauses: "dict[str, dict] | None" = None,
) -> "dict[str, int]":
    """Atomically commit each DataFrame to its table: all become
    visible together, or none do. Returns {table path: version}.

    ``coordinator`` is the directory whose ``_multitx/`` holds the
    commit records — use one coordinator per related table group (a
    "catalog"); participants may live on any filesystem. ``txn``
    makes crash-retries idempotent AND exactly-once: a retry resumes
    half-done table commits and republishing is a no-op; omit it and
    a fresh txid is drawn (a retry after a mid-flight crash would
    then leave the first attempt pending until aborted).
    ``stats_cols`` records per-file [min,max] in each participant's
    commit, same as :func:`~.txlog.tx_write`.

    ``modes`` maps a table path to ``'append'`` (default),
    ``'overwrite'``, or ``'merge'`` — e.g. atomically replacing a
    dimension snapshot while appending its fact deltas, or upserting
    an entity table and its by-key index together. Overwrite keeps
    single-table overwrite's last-writer-wins semantics; merge runs
    the single-table MERGE body (stats-pruned rewrite, CDF per the
    table's ``cdf.enabled``, full conflict checks) per participant —
    both made cross-table atomic by the coordinator record (the
    module docstring's scope and serializability notes). A merge
    participant needs its upsert key in ``merge_keys={table: col}``
    (a composite key passes a LIST) and the table must exist.

    ``merge_clauses={table: {"when_matched": [...],
    "when_not_matched": [...], "when_not_matched_by_source": [...]}}``
    upgrades that participant's body to the full conditional ``MERGE
    INTO`` (round 15 — the exact clause semantics, pruning, and
    conflict scope of single-table :func:`~.txlog.tx_merge` with
    clauses), so a cross-table conditional upsert commits atomically.
    A conflict raises with the transaction still pending and nothing
    visible: retry with the same ``txn`` to resume, or
    :func:`tx_multi_abort`."""
    if not writes:
        raise ValueError("tx_multi needs at least one table")
    for p, m in (modes or {}).items():
        if m not in ("append", "overwrite", "merge"):
            raise ValueError(
                f"modes[{p!r}] must be append|overwrite|merge, got {m!r}"
            )
        if m == "merge" and not (merge_keys or {}).get(p):
            raise ValueError(
                f"modes[{p!r}]='merge' needs merge_keys[{p!r}] (the "
                "upsert key column)"
            )
    for p, cl in (merge_clauses or {}).items():
        if (modes or {}).get(p) != "merge":
            raise ValueError(
                f"merge_clauses[{p!r}] needs modes[{p!r}]='merge'"
            )
        bad = set(cl) - {
            "when_matched", "when_not_matched",
            "when_not_matched_by_source",
        }
        if bad:
            raise ValueError(
                f"merge_clauses[{p!r}] has unknown key(s) "
                f"{sorted(bad)} (allowed: when_matched, "
                "when_not_matched, when_not_matched_by_source)"
            )
    spark = next(iter(writes.values())).sparkSession
    txid = txn or uuid.uuid4().hex

    if (rec := _read_record(spark, coordinator, txid)) is not None:
        if rec.get("aborted"):
            raise MultiTxAborted(f"transaction {txid!r} was aborted")
        return dict(rec["tables"])  # idempotent replay of a success

    table_txn = f"multi:{txid}"
    versions: dict[str, int] = {}
    # deterministic participant order so concurrent retries of the
    # same txn converge instead of deadlocking on different prefixes
    for path in sorted(writes):
        if (prior := _committed_txns(spark, path).get(table_txn)) is not None:
            versions[path] = prior  # resumed from a crashed attempt
            continue
        mode = (modes or {}).get(path, "append")
        part_by = None
        try:
            psnap = _replay(spark, path)
        except FileNotFoundError:
            psnap = None
        if psnap is not None:
            # same writer-feature + CHECK-constraint guards as every
            # single-table write (merge validates inside its prepare)
            _check_writer_features(psnap.properties, path)
            if mode != "merge":
                _check_constraints(
                    writes[path], psnap.properties, path,
                    f"tx_multi participant ({mode})",
                )
        if mode == "merge":
            if psnap is None:
                raise FileNotFoundError(
                    f"modes[{path!r}]='merge' but the table does not "
                    "exist; merge needs live rows to upsert into"
                )
            # the exact single-table MERGE body (validation, pruning,
            # survivor staging, CDF sidecar, writer-feature stamps);
            # only the commit differs: it carries the multi marker, so
            # it stays invisible until the coordinator record lands.
            # Conditional clauses route through the conditional body
            # (round 15, VERDICT r14 #2: a cross-table conditional
            # upsert is expressible atomically)
            cl = (merge_clauses or {}).get(path)
            if cl is not None:
                prep = _prepare_merge_into(
                    spark, path, writes[path],
                    _merge_keys((merge_keys or {})[path]),
                    list(cl.get("when_matched") or []),
                    list(cl.get("when_not_matched") or []),
                    list(cl.get("when_not_matched_by_source") or []),
                    None, psnap,
                )
                reval = prep["revalidate"]
            else:
                prep = _prepare_merge(
                    spark, path, writes[path], (merge_keys or {})[path],
                    None, psnap, ctx="tx_multi participant (merge)",
                )
                reval = prep["revalidate"]
            extra = dict(prep["extra"] or {})
            extra["multi"] = {"coordinator": coordinator, "txid": txid}
            versions[path] = _commit_rewrite(
                spark, path, prep["added"], prep["touched"],
                prep["snap_version"], table_txn, "merge",
                max_retries=max_retries, stats=prep["stats"],
                blooms=prep["blooms"],
                conflict_keys=prep["conflict_keys"], extra=extra,
                revalidate=reval, planned_rt=prep["planned_rt"],
            )
            continue
        if mode == "append":
            # same schema-on-write + partition-inheritance contract as
            # tx_write (txlog.py); overwrites reset layout like tx_write
            _check_append_schema(writes[path], path, "enforce")
            part_by = psnap.partition_by if psnap is not None else None
        schema_json = writes[path].schema.json()
        stage_df = writes[path]
        if psnap is not None and _phys_map(psnap.schema):
            # column-mapped participant: stage under PHYSICAL names,
            # record the logical schema (same contract as tx_write)
            stage_df, schema_json = _apply_column_mapping(
                writes[path], psnap.schema
            )
        added = _stage_and_place(stage_df, path, part_by)
        stat_cols = set(stats_cols or [])
        if stat_cols:
            # stats key on PHYSICAL names on mapped tables (identity
            # otherwise — same rule as tx_write)
            pm = _phys_map(schema_json)
            stat_cols = {pm.get(c, c) for c in stat_cols}
        if part_by:
            stat_cols.update(part_by)
        pseudo = _Snapshot(
            eps={}, mor=[], dv=[], blooms=[], version=-1, schema=schema_json,
            evolved=False, properties={}, partition_by=part_by,
            stats={}, txns={},
        )
        stats = (
            _collect_stats(
                spark, path, added, sorted(stat_cols),
                pseudo if part_by else None,
            )
            if stat_cols and added
            else None
        )
        fs = hadoop_fs(spark, path)[0]

        def build(
            next_v: int, added=added, stats=stats, mode=mode,
            schema_json=schema_json, part_by=part_by,
        ) -> dict:
            payload = {
                "version": next_v,
                "action": mode,
                "add": added,
                "remove": [],
                "txn": table_txn,
                "multi": {"coordinator": coordinator, "txid": txid},
                "schema": schema_json,
            }
            if part_by:
                payload["partition_by"] = part_by
            if stats:
                payload["stats"] = stats
            return payload

        versions[path] = _commit_with_retries(
            spark, path, fs, build, table_txn, max_retries
        )

    # the atomic commit point: one put-if-absent record resolves every
    # participant's provisional commit at once
    fs = hadoop_fs(spark, coordinator)[0]
    record = {"txid": txid, "tables": versions}
    if not _write_atomic(
        spark,
        fs,
        _multi_record_path(coordinator, txid),
        json.dumps(record).encode(),
    ):
        rec = _read_record(spark, coordinator, txid)
        if rec is None or rec.get("aborted"):
            raise MultiTxAborted(
                f"transaction {txid!r} was aborted before publish; its "
                "provisional commits are dead and its files are vacuum debris"
            )
        return dict(rec["tables"])  # a concurrent retry published first
    return versions


def tx_multi_abort(spark: SparkSession, coordinator: str, txid: str) -> bool:
    """Kill a pending transaction (e.g. its writer is known dead).
    True = the abort tombstone won the coordinator slot (or one was
    already there); False = too late, the transaction committed first.
    Racing the writer is safe either way: the slot is put-if-absent,
    so exactly one outcome exists."""
    if _write_atomic(
        spark,
        hadoop_fs(spark, coordinator)[0],
        _multi_record_path(coordinator, txid),
        json.dumps({"txid": txid, "aborted": True}).encode(),
    ):
        return True
    rec = _read_record(spark, coordinator, txid)
    return bool(rec and rec.get("aborted"))


def tx_multi_status(spark: SparkSession, coordinator: str, txid: str) -> dict:
    """{'status': committed|aborted|pending, 'tables': {...}|None}."""
    rec = _read_record(spark, coordinator, txid)
    if rec is None:
        return {"status": "pending", "tables": None}
    if rec.get("aborted"):
        return {"status": "aborted", "tables": None}
    return {"status": "committed", "tables": dict(rec["tables"])}


def tx_multi_pending(spark: SparkSession, path: str) -> "list[dict]":
    """Operator visibility: this table's provisional commits whose
    transactions are still unresolved — each blocks checkpoint folding
    and log truncation until its writer finishes or an operator
    aborts it."""
    out = []
    for v, kind in _list_commits(spark, path):
        if kind != "commit":
            continue
        c = _load(spark, path, f"{v:0{_PAD}d}.json")
        m = c.get("multi")
        if m and _multi_status(spark, m["coordinator"], m["txid"]) == "pending":
            out.append(
                {
                    "version": v,
                    "txid": m["txid"],
                    "coordinator": m["coordinator"],
                    "n_added": len(c.get("add", [])),
                }
            )
    return out
