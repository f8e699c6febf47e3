"""SQL DML front door for the transactional table (round 13, VERDICT
r12 #6): ``tx_sql(spark, "UPDATE t SET ... WHERE ...")`` parses a
small, explicit grammar and dispatches to the existing Python fronts
(tx_update / tx_delete_where / tx_write / tx_merge / tx_compact /
tx_optimize_zorder / tx_vacuum / the ALTER family) — so a SQL-only
client can drive the full ACID surface without learning the Python
API, and every statement keeps the fronts' commit-time semantics
(conflict revalidation, constraints, CDF, deletion vectors) because
it IS the same code path. Statements name tables registered with
:func:`tx_register_table` (or inline ``txtable.`/abs/path```), and
reads go through freshly-resolved :func:`tx_view` snapshots, so a
SELECT after a DML sees the new version.

Deliberately NOT a SQL engine: SELECT/WITH statements are handed to
Spark SQL unchanged (over refreshed snapshot views — Catalyst owns
query planning); only the DML/DDL statements Spark cannot run against
this log format are parsed here, and anything outside the grammar
refuses loudly with the supported shape in the message. Statement
text inside string literals containing the bare keyword ``WHERE`` is
the known parse limitation (documented, refused nowhere silently —
the residual expression still goes through Spark SQL's parser, which
raises on garbage).

Reference model: Delta Lake's SQL surface (UPDATE/DELETE/MERGE/
OPTIMIZE/VACUUM/ALTER TABLE), public docs. The reference repo
(/root/reference) has no SQL or storage surface — extension E7+."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .txlog import (
    tx_add_constraint,
    tx_compact,
    tx_delete_where,
    tx_drop_column,
    tx_drop_constraint,
    tx_merge,
    tx_optimize_zorder,
    tx_read,
    tx_rename_column,
    tx_set_partitioning,
    tx_update,
    tx_vacuum,
    tx_view,
    tx_write,
)

#: registered SQL name -> table path (session-scoped, like temp views)
_TABLES: "dict[str, str]" = {}

_INLINE_RE = re.compile(r"^txtable\.`([^`]+)`$")


def tx_register_table(
    spark: SparkSession, name: str, path: str
) -> DataFrame:
    """Bind SQL name ``name`` to the transactional table at ``path``
    (and register its current snapshot as a temp view, so plain
    ``spark.sql`` SELECTs work immediately). DML through
    :func:`tx_sql` re-resolves the snapshot after each commit."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"invalid table name {name!r}")
    _TABLES[name] = path
    return tx_view(spark, path, name)


def _path_of(token: str) -> "tuple[str, str | None]":
    """(table path, registered name or None) for a statement's table
    token — a registered name, or the inline ``txtable.`/path```
    escape (Delta's ``delta.`path``` convention)."""
    m = _INLINE_RE.match(token)
    if m:
        return m.group(1), None
    if token in _TABLES:
        return _TABLES[token], token
    raise KeyError(
        f"unknown table {token!r}: register it with "
        "tx_register_table(spark, name, path) or use the inline form "
        "txtable.`/abs/path`"
    )


def _refresh(spark, path: str, name: "str | None") -> None:
    if name is not None:
        tx_view(spark, path, name)


def _split_top(s: str, sep: str = ",") -> "list[str]":
    """Split on ``sep`` at paren/quote depth zero (assignment lists
    may contain function calls and quoted strings)."""
    out, cur, depth, q = [], [], 0, None
    for ch in s:
        if q is not None:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [x.strip() for x in out if x.strip()]


_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(\S+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(\S+)(?:\s+WHERE\s+(.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(INTO|OVERWRITE)\s+(\S+)\s+"
    r"(SELECT\b.*|VALUES\b.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(\S+)\s+USING\s+(\(.*\)|\S+)"
    r"(?:\s+(?:AS\s+)?(\w+))?\s+ON\s+(.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(\S+)"
    r"(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*$",
    re.IGNORECASE,
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+(\S+)"
    r"(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_RENAME_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\S+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+"
    r"(\w+)\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_DROP_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\S+)\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_ADD_CONSTRAINT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\S+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+"
    r"CHECK\s*\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_DROP_CONSTRAINT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\S+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_PARTITION_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\S+)\s+SET\s+PARTITIONED\s+BY\s*"
    r"\(([^)]*)\)\s*;?\s*$",
    re.IGNORECASE,
)
_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+TABLE\s+(\S+)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+"
    r"(\d+)\s*;?\s*$",
    re.IGNORECASE,
)
_DESCRIBE_RE = re.compile(
    r"^\s*DESCRIBE\s+DETAIL\s+(\S+)\s*;?\s*$", re.IGNORECASE
)
_MERGE_ON_RE = re.compile(
    r"^\s*(?:\w+\.)?(\w+)\s*(?:=\s*(?:\w+\.)?(\w+)\s*)?$"
)


def _parse_assignments(raw: str) -> "dict[str, str]":
    out: "dict[str, str]" = {}
    for item in _split_top(raw):
        m = re.match(r"^(\w+)\s*=\s*(\S.*)$", item, re.DOTALL)
        if not m:
            raise ValueError(
                f"cannot parse SET assignment {item!r} "
                "(expected: col = <spark-sql expression>)"
            )
        out[m.group(1)] = m.group(2).strip()
    if not out:
        raise ValueError("UPDATE needs at least one SET assignment")
    return out


def tx_sql(spark: SparkSession, sql: str):
    """Run one statement. DML/DDL returns the committed version (int;
    VACUUM returns the deleted-file list, OPTIMIZE may return None
    when there was nothing to do); SELECT/WITH/VALUES return the
    DataFrame from Spark SQL over freshly-resolved snapshot views."""
    m = _UPDATE_RE.match(sql)
    if m:
        path, name = _path_of(m.group(1))
        v = tx_update(
            spark, path, m.group(3) or "true",
            _parse_assignments(m.group(2)),
        )
        _refresh(spark, path, name)
        return v
    m = _DELETE_RE.match(sql)
    if m:
        path, name = _path_of(m.group(1))
        v = tx_delete_where(spark, path, m.group(2) or "true")
        _refresh(spark, path, name)
        return v
    m = _INSERT_RE.match(sql)
    if m:
        mode = "append" if m.group(1).upper() == "INTO" else "overwrite"
        path, name = _path_of(m.group(2))
        body = m.group(3)
        df = spark.sql(body)
        if body.lstrip()[:6].upper() == "VALUES":
            # VALUES yields col1/col2/... — bind by POSITION to the
            # table's current logical schema with the standard INSERT
            # coercion (cast each value to the target column's type)
            target = tx_read(spark, path).schema
            if len(df.columns) != len(target):
                raise ValueError(
                    f"INSERT VALUES arity {len(df.columns)} != table "
                    f"arity {len(target)} ({target.names})"
                )
            from pyspark.sql import functions as F

            df = df.select(
                *[
                    F.col(c).cast(f.dataType).alias(f.name)
                    for c, f in zip(df.columns, target)
                ]
            )
        v = tx_write(df, path, mode=mode)
        _refresh(spark, path, name)
        return v
    m = _MERGE_RE.match(sql)
    if m:
        path, name = _path_of(m.group(1))
        src_token = m.group(2)
        if src_token.startswith("("):
            raise ValueError(
                "MERGE USING takes a registered view or temp-view "
                "NAME (register the subquery as a temp view first); "
                "subqueries are not part of this grammar"
            )
        on = _MERGE_ON_RE.match(m.group(4))
        if not on or (on.group(2) and on.group(1) != on.group(2)):
            raise ValueError(
                f"cannot parse MERGE ON {m.group(4)!r}: supported "
                "shapes are ON <key_col> or ON t.<k> = s.<k> with the "
                "same column name both sides (tx_merge upserts by one "
                "key column)"
            )
        v = tx_merge(spark.table(src_token), path, on.group(1))
        _refresh(spark, path, name)
        return v
    m = _OPTIMIZE_RE.match(sql)
    if m:
        path, name = _path_of(m.group(1))
        if m.group(2):
            cols = [c.strip() for c in m.group(2).split(",") if c.strip()]
            v = tx_optimize_zorder(spark, path, cols)
        else:
            v = tx_compact(spark, path, max_input_files=64)
        _refresh(spark, path, name)
        return v
    m = _VACUUM_RE.match(sql)
    if m:
        path, name = _path_of(m.group(1))
        hours = float(m.group(2)) if m.group(2) else None
        deleted = tx_vacuum(spark, path, retain_hours=hours)
        _refresh(spark, path, name)
        return deleted
    m = _ALTER_RENAME_RE.match(sql)
    if m:
        path, name = _path_of(m.group(1))
        v = tx_rename_column(spark, path, m.group(2), m.group(3))
        _refresh(spark, path, name)
        return v
    m = _ALTER_DROP_RE.match(sql)
    if m:
        path, name = _path_of(m.group(1))
        v = tx_drop_column(spark, path, m.group(2))
        _refresh(spark, path, name)
        return v
    m = _ALTER_ADD_CONSTRAINT_RE.match(sql)
    if m:
        path, name = _path_of(m.group(1))
        v = tx_add_constraint(spark, path, m.group(2), m.group(3))
        _refresh(spark, path, name)
        return v
    m = _ALTER_DROP_CONSTRAINT_RE.match(sql)
    if m:
        path, name = _path_of(m.group(1))
        v = tx_drop_constraint(spark, path, m.group(2))
        _refresh(spark, path, name)
        return v
    m = _ALTER_PARTITION_RE.match(sql)
    if m:
        path, name = _path_of(m.group(1))
        specs = [c.strip() for c in m.group(2).split(",") if c.strip()]
        v = tx_set_partitioning(spark, path, specs)
        _refresh(spark, path, name)
        return v
    m = _RESTORE_RE.match(sql)
    if m:
        from .txlog import tx_restore

        path, name = _path_of(m.group(1))
        v = tx_restore(spark, path, version=int(m.group(2)))
        _refresh(spark, path, name)
        return v
    m = _DESCRIBE_RE.match(sql)
    if m:
        import json as _json

        from .txlog import tx_detail

        path, _name = _path_of(m.group(1))
        det = tx_detail(spark, path)
        # one-row frame, complex fields JSON-stringified (DESCRIBE is
        # a human/report surface; exact types live on tx_detail)
        flat = {
            k: (v if isinstance(v, (int, bool))
                else v if isinstance(v, str)
                else _json.dumps(v))  # None -> "null", lists/dicts -> JSON
            for k, v in det.items()
        }
        return spark.createDataFrame([flat])
    head = sql.lstrip()[:10].upper()
    if head.startswith(("SELECT", "WITH", "VALUES", "TABLE")):
        # reads: re-resolve every registered snapshot so the query
        # sees the CURRENT version, then let Catalyst own the plan
        for nm, p in _TABLES.items():
            tx_view(spark, p, nm)
        return spark.sql(sql)
    raise ValueError(
        f"unsupported statement {sql.strip().split(None, 1)[0]!r}: "
        "tx_sql speaks UPDATE / DELETE FROM / INSERT INTO|OVERWRITE "
        "(SELECT or VALUES) / MERGE INTO ... USING <view> ON <key> / "
        "OPTIMIZE [ZORDER BY (...)] / VACUUM [RETAIN n HOURS] / "
        "ALTER TABLE (RENAME COLUMN | DROP COLUMN | ADD CONSTRAINT "
        "... CHECK (...) | DROP CONSTRAINT | SET PARTITIONED BY "
        "(...)) / RESTORE TABLE ... VERSION AS OF n / "
        "DESCRIBE DETAIL / SELECT|WITH|VALUES|TABLE"
    )
