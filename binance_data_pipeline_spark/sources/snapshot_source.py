"""Spark DataSource over snapshot tables — batch and streaming reads
through the standard `spark.read` / `spark.readStream` surface.

The reference's consumers poll object storage and reprocess whole
prefixes (airflow/dags/ingest_binance_last_3_days.py re-lists 3 days
every run); `operators/snapshot_tail` already replaces that with a
pull-loop over the manifest change feed. This module lifts the same
feed into Spark's OWN source API (the Python DataSource API, Spark 4):

    from binance_data_pipeline_spark.sources.snapshot_source import (
        register_snapshot_source)
    register_snapshot_source(spark)

    # batch: the manifest-resolved live set (optionally a pinned version)
    spark.read.format("snapshot_table").option("path", t).load()

    # streaming: one micro-batch per committed version range
    spark.readStream.format("snapshot_table").option("path", t).load()

Design, mapped onto the API's contract:

- OFFSETS ARE VERSIONS: ``{"v": N}`` = "delivered through version N".
  ``latestOffset`` lists the manifest dir (KB-scale metadata, no data
  files); the engine checkpoints offsets, so restart resumes exactly
  after the last committed batch — exactly-once composes with any
  idempotent sink, with no cursor machinery of ours.
- PARTITIONS ARE NEW FILES: a batch's input partitions are precisely
  the parquet files of the data dirs added in ``(start.v, end.v]`` (the
  ``snapshot_changes`` contract), one partition per file; executors
  read their file directly via Arrow and yield RecordBatches — data
  never touches the driver, parallelism = new-file count.
- REWRITE CROSSINGS REFUSE: a range where the old live set is not a
  subset of the new (overwrite / rollback / compaction / DML) makes
  dir-diff stop meaning row inserts; the reader raises with the resync
  instruction instead of silently double-counting — the same loud
  contract as ``snapshot_changes`` (Delta's streaming source makes the
  same demand of its users via ignoreChanges).
- SCHEMA IS PINNED AT STREAM START from a live data file's parquet
  footer; later files are column-aligned to it (missing columns read
  as NULL, extra columns dropped) so one stream keeps one schema.

Driver-side manifest work uses pyarrow.fs directly (no SparkSession is
available inside a DataSource), so the source works on any filesystem
pyarrow can mount (local, HDFS, S3). Retention: streams resume from
checkpointed versions — vacuum the table with ``keep_hours`` at least
your longest expected stream downtime, or a resumed stream finds its
anchor version reaped and must restart from a fresh bootstrap.

For ad-hoc incremental pulls without a streaming query, keep using
``snapshot_tail``; for the scan-path fast reads (manifest stats / bloom
dir-skipping), ``read_snapshot_range`` / ``snapshot_lookup`` remain the
entry points — this source is the interop tier, not a replacement.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["SnapshotDataSource", "register_snapshot_source"]

_V_WIDTH = 11


def _fs_of(path: str):
    from pyarrow import fs as pafs

    if "://" in path:
        f, p = pafs.FileSystem.from_uri(path)
        return f, p
    return pafs.LocalFileSystem(), path


def _list_versions(table: str) -> list[int]:
    from pyarrow import fs as pafs

    f, root = _fs_of(table.rstrip("/"))
    sel = pafs.FileSelector(f"{root}/versions", allow_not_found=True)
    out = []
    for info in f.get_file_info(sel):
        name = info.base_name
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def _head_version(table: str) -> int | None:
    """O(1) head lookup via the writer's `_HEAD` hint file (see
    operators/snapshots.py): read the hint, probe forward past any
    stale-low value, fall back to the full listing for legacy tables.
    Matters here because the streaming reader polls latestOffset every
    trigger — with the hint, a 10k-commit table costs one read + one
    negative stat per poll instead of a 10k-entry listing."""
    from pyarrow import fs as pafs

    f, root = _fs_of(table.rstrip("/"))
    try:
        with f.open_input_stream(f"{root}/versions/_HEAD") as s:
            v = int(s.read(32).decode("ascii").strip())
        if v >= 0 and f.get_file_info(
            f"{root}/versions/v{v:011d}"
        ).type != pafs.FileType.NotFound:
            while f.get_file_info(
                f"{root}/versions/v{v + 1:011d}"
            ).type != pafs.FileType.NotFound:
                v += 1
            return v
    except Exception:
        pass
    versions = _list_versions(table)
    return versions[-1] if versions else None


def _live_dirs(table: str, version: int) -> list[str]:
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    f, root = _fs_of(table.rstrip("/"))

    def vrows(v: int, kind: str = "versions") -> list[tuple]:
        # (path, action, base) per manifest row; legacy manifests have
        # no action/base columns (always full listings)
        vdir = f"{root}/{kind}/v{v:0{_V_WIDTH}d}"
        files = [
            i.path
            for i in f.get_file_info(pafs.FileSelector(vdir))
            if i.base_name.endswith(".parquet")
        ]
        out = []
        for fp in files:
            pf = pq.ParquetFile(fp, filesystem=f)
            names = pf.schema_arrow.names
            cols = [c for c in ("path", "action", "base") if c in names]
            t = pf.read(columns=cols)
            d = {c: t.column(c).to_pylist() for c in cols}
            n = t.num_rows
            nulls = [None] * n
            out.extend(
                zip(d["path"], d.get("action", nulls), d.get("base", nulls))
            )
        return out

    # mirror of snapshots._live_state: a manifest is a CHECKPOINT (full
    # live listing; base == own version or legacy) or a DELTA resolved
    # against checkpoint base + every delta in between
    rows = vrows(version)
    base = version
    for _p, _a, b in rows:
        if b is not None:
            base = int(b)
        break
    if base == version:
        return [p for p, a, _b in rows if (a or "add") != "remove"]
    # a vacuum-written sidecar checkpoint inside [base, version] is the
    # full listing when the chain's older manifests were reaped
    sel = pafs.FileSelector(f"{root}/ckpts", allow_not_found=True)
    side = [
        int(i.base_name[1:])
        for i in f.get_file_info(sel)
        if i.base_name.startswith("v") and i.base_name[1:].isdigit()
        and base <= int(i.base_name[1:]) <= version
    ]
    live: dict[str, bool] = {}
    start = base
    if side:
        start = max(side)
        for p, a, _b in vrows(start, kind="ckpts"):
            if (a or "add") != "remove":
                live[p] = True
        start += 1
    for v in range(start, version + 1):
        for p, a, _b in vrows(v):
            if (a or "add") == "remove":
                live.pop(p, None)
            else:
                live[p] = True
    return list(live)


def _dir_files(data_dir: str) -> list[str]:
    from pyarrow import fs as pafs

    f, root = _fs_of(data_dir.rstrip("/"))
    return sorted(
        i.path
        for i in f.get_file_info(pafs.FileSelector(root, recursive=True))
        if i.is_file and i.base_name.endswith(".parquet")
    )


def _added_files(table: str, from_v: int | None, to_v: int) -> list[str]:
    """Files of the dirs added in (from_v, to_v] — refuses rewrite
    crossings, the snapshot_changes contract."""
    new = _live_dirs(table, to_v)
    if from_v is None:
        old: set[str] = set()
    else:
        old = set(_live_dirs(table, from_v))
        if not old <= set(new):
            raise ValueError(
                f"snapshot_table stream over {table}: versions "
                f"{from_v}..{to_v} cross a rewrite (overwrite/rollback/"
                "compact/DML) — dir diff is not a row change feed there; "
                "restart the stream with a fresh checkpoint (full "
                "re-bootstrap) or consume via snapshot_tail with key_cols"
            )
    return [fp for d in new if d not in old for fp in _dir_files(d)]


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _read_file_aligned(path: str, field_names: list[str], schema_pa):
    """One executor's work: read its parquet file via Arrow and yield
    RecordBatches column-aligned to the pinned stream schema (missing
    columns as NULL, extra columns dropped, types cast)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f, p = _fs_of(path)
    pf = pq.ParquetFile(p, filesystem=f)
    for batch in pf.iter_batches():
        cols = []
        for name in field_names:
            typ = schema_pa.field(name).type
            if name in batch.schema.names:
                cols.append(batch.column(name).cast(typ))
            else:
                cols.append(pa.nulls(batch.num_rows, type=typ))
        yield pa.RecordBatch.from_arrays(cols, names=field_names)


class _SnapshotBatchReader(DataSourceReader):
    def __init__(self, table: str, version: int | None, schema_pa):
        self._table = table
        self._version = version
        self._schema_pa = schema_pa

    def partitions(self):
        versions = _list_versions(self._table)
        v = versions[-1] if self._version is None else self._version
        if v not in versions:
            raise ValueError(f"version {v} not in {self._table} (have {versions})")
        return [
            _FilePartition(fp)
            for d in _live_dirs(self._table, v)
            for fp in _dir_files(d)
        ]

    def read(self, partition):
        yield from _read_file_aligned(
            partition.path, self._schema_pa.names, self._schema_pa
        )


class _SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, table: str, starting_version: int | None, schema_pa):
        self._table = table
        self._schema_pa = schema_pa
        versions = _list_versions(table)
        if not versions:
            raise ValueError(f"{table} has no committed snapshots")
        # default: bootstrap the whole current table as the first batch
        # (offset "before everything"); starting_version=N skips history
        # and starts the feed strictly after N
        self._initial = (
            {"v": None} if starting_version is None else {"v": int(starting_version)}
        )

    def initialOffset(self) -> dict:
        return self._initial

    def latestOffset(self) -> dict:
        return {"v": _head_version(self._table)}

    def partitions(self, start: dict, end: dict):
        if start.get("v") == end.get("v"):
            return []
        files = _added_files(self._table, start.get("v"), int(end["v"]))
        return [_FilePartition(fp) for fp in files]

    def read(self, partition):
        yield from _read_file_aligned(
            partition.path, self._schema_pa.names, self._schema_pa
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine's checkpoint


class SnapshotDataSource(DataSource):
    """``format("snapshot_table")``: batch reads of the manifest-resolved
    live set (``option("version", N)`` pins a snapshot) and streaming
    reads of the version-delta change feed (``option("starting_version",
    N)`` skips the bootstrap). See the module docstring for contracts."""

    def __init__(self, options):
        super().__init__(options)
        table = options.get("path")
        if not table:
            raise ValueError("snapshot_table requires .option('path', <table>)")
        self._table = table
        self._schema_pa = self._head_schema()

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def _head_schema(self):
        import pyarrow as pa
        import pyarrow.parquet as pq

        versions = _list_versions(self._table)
        if not versions:
            raise ValueError(f"{self._table} has no committed snapshots")
        opt_v = self.options.get("version")
        v = int(opt_v) if opt_v is not None else versions[-1]
        def _engine_type(t):
            # Spark writes INT96 timestamps by default; pyarrow decodes
            # those as NANOSECOND, which the JVM Arrow bridge refuses
            # ([UNSUPPORTED_ARROWTYPE]) — pin microseconds and let the
            # per-batch cast in _read_file_aligned align every file
            if pa.types.is_timestamp(t) and t.unit == "ns":
                return pa.timestamp("us", tz=t.tz)
            return t

        for d in _live_dirs(self._table, v):
            files = _dir_files(d)
            if files:
                f, p = _fs_of(files[0])
                sch = pq.ParquetFile(p, filesystem=f).schema_arrow
                # every field nullable: later dirs may lack a column
                # (aligned as NULL), and parquet footers mark literal
                # columns required — a non-null declared schema would
                # NPE the engine's row projection on those fills
                return pa.schema(
                    [
                        pa.field(fld.name, _engine_type(fld.type), nullable=True)
                        for fld in sch
                    ]
                )
        raise ValueError(f"{self._table} has no data files at version {v}")

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(self._schema_pa)

    def reader(self, schema) -> DataSourceReader:
        opt_v = self.options.get("version")
        return _SnapshotBatchReader(
            self._table,
            int(opt_v) if opt_v is not None else None,
            self._schema_pa,
        )

    def streamReader(self, schema) -> DataSourceStreamReader:
        sv = self.options.get("starting_version")
        return _SnapshotStreamReader(
            self._table,
            int(sv) if sv is not None else None,
            self._schema_pa,
        )


def register_snapshot_source(spark) -> None:
    """Register ``format("snapshot_table")`` on this session.

    The engine pickles the DataSource class into its Python workers; a
    by-REFERENCE pickle would require this package on every worker's
    sys.path. This module is deliberately self-contained (pyspark +
    pyarrow only), so we register it for pickle-BY-VALUE and the source
    works from any vanilla session with no package distribution."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SnapshotDataSource)
