"""Jar-free Kafka source for Structured Streaming — the Python
DataSource API (Spark 4) over the wire-protocol client in
``kafka_wire.py``.

Closes the reference's S3 leg (producer/kafka_to_s3_bronze.py:20-27:
earliest-offset consume of the raw-trades topic) END TO END inside this
sandbox: ``spark.readStream.format("kafka_wire")`` emits records in the
EXACT schema Spark's own Kafka connector emits
(``streaming/ingest.py::KAFKA_SOURCE_SCHEMA``), so the downstream chain
(``kafka_records_to_raw`` → ``bronze_stream`` → partitioned sink) is
byte-identical whichever source feeds it. On a real cluster you'd use
the spark-sql-kafka connector jar (scale features: SSL, consumer
groups, partition rebalancing); this source is the jar-free interop
tier that lets every test and local pipeline run against a real socket.

Contract, mapped onto the DataSource API:

- OFFSETS ARE KAFKA OFFSETS: the stream offset is ``{"<partition>":
  next_unread_offset}`` — exactly the connector's checkpoint shape.
  ``latestOffset`` polls ListOffsets v1 (no record transfer) and
  optionally rate-limits with ``maxOffsetsPerTrigger`` (the reference's
  1000-msg flush bound), distributing the budget across partitions
  proportionally to lag like the real connector. The Python API gives
  the reader no view of the checkpointed position, so by default the
  FIRST micro-batch of each driver incarnation is uncapped (the first
  poll must return the log end to stay monotone); set ``rateCursorDir``
  (a driver-local dir, e.g. inside the checkpoint location) and the
  reader persists its own cursor in ``commit()`` so restarts against a
  backlog plan CAPPED catch-up batches — see ``_KafkaWireStreamReader``.
- PARTITIONS ARE KAFKA PARTITIONS: one input partition per topic
  partition per micro-batch; each executor fetches ITS offset range
  over its own socket connection (Fetch v4, CRC-verified batches) —
  records never pass through the driver.
- EXACT RANGES: a fetch may start mid-batch (after a rate-limited
  trigger); the broker returns the containing batch and the client
  filters to ``[start, end)``, so replays after restart are exact and
  the checkpointed offsets compose to exactly-once with an idempotent
  sink (upgrade over the reference's commit-after-put at-least-once).

Kafka protocol references: kafka.apache.org/protocol (public spec);
precedent for the jar-free pattern: ``sources/snapshot_source.py``.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

# module-top (not inline) imports: these ride the by-value pickle into
# the engine's Python workers — a runtime relative import inside read()
# would need the package installed on every worker
from .kafka_wire import (
    kafka_fetch,
    kafka_list_offsets,
    kafka_offset_commit,
    kafka_partitions,
    kafka_produce,
)

__all__ = ["KafkaWireDataSource", "register_kafka_wire_source"]

DEFAULT_TOPIC = "binance_trades_raw"


def _parse_bootstrap(bootstrap: str) -> tuple[str, int]:
    host, _, port = bootstrap.rpartition(":")
    if not host or not port.isdigit():
        raise ValueError(f"bad bootstrap {bootstrap!r} (want host:port)")
    return host, int(port)


class _RangePartition(InputPartition):
    def __init__(self, host: str, port: int, topic: str, partition: int,
                 start: int, end: int):
        self.host, self.port = host, port
        self.topic, self.partition = topic, partition
        self.start, self.end = start, end


def _fetch_range(part: _RangePartition):
    """One executor's work: fetch [start, end) from its Kafka partition
    and yield rows in the connector's record schema."""
    from datetime import datetime, timezone

    offset = part.start
    while offset < part.end:
        _hwm, records = kafka_fetch(
            part.host, part.port, part.topic, part.partition, offset
        )
        if not records:
            raise ValueError(
                f"kafka_wire: fetch of {part.topic}/{part.partition} at "
                f"{offset} returned no records but end={part.end} — log "
                "truncated below the checkpointed offset?"
            )
        for off, key, value, ts_ms in records:
            if off >= part.end:
                return
            if off < offset:
                continue
            yield (
                key,
                value,
                part.topic,
                part.partition,
                off,
                datetime.fromtimestamp(ts_ms / 1000.0, tz=timezone.utc),
                0,  # timestampType: CreateTime
            )
        offset = records[-1][0] + 1


class _KafkaWireStreamReader(DataSourceStreamReader):
    def __init__(self, host: str, port: int, topic: str,
                 starting_offsets: str, max_per_trigger: int | None,
                 cursor_dir: str | None = None,
                 commit_group: str | None = None):
        self._host, self._port, self._topic = host, port, topic
        self._starting = starting_offsets
        self._max = max_per_trigger
        self._cursor_dir = cursor_dir
        self._commit_group = commit_group
        self._mirror_warned: set[str] = set()  # once-per-type mirror warnings
        # Rate-limit anchor: the last offsets handed to the engine.
        # None until the first poll. The engine chains micro-batch
        # ranges from our PREVIOUS latestOffset return (observed: it
        # even calls latestOffset before initialOffset), so a return
        # that ever goes BACKWARD re-delivers committed offsets. Two
        # consequences, both enforced below: (1) returns are clamped
        # monotone non-decreasing; (2) the FIRST poll of an incarnation
        # must be the true log end — the reader cannot see the
        # checkpointed position, and log end is the only value provably
        # >= it. So WITHOUT a cursor dir, maxOffsetsPerTrigger applies
        # from the second micro-batch of each driver incarnation only.
        # WITH ``rateCursorDir``, the reader persists its own cursor in
        # commit() (called strictly AFTER the engine checkpoints the
        # batch, so the cursor is always <= the checkpointed position)
        # and reloads it here — a restart against a large backlog then
        # plans capped catch-up batches instead of one unbounded one
        # (the jar connector's SupportsAdmissionControl behavior). A
        # stale cursor (crash between engine checkpoint and our write)
        # only costs empty micro-batches until the anchor catches up:
        # fetch ranges always come from the ENGINE's start, never ours.
        self._last_end: dict[str, int] | None = self._load_cursor()

    def _cursor_path(self) -> str | None:
        return f"{self._cursor_dir}/offsets.json" if self._cursor_dir else None

    def _load_cursor(self) -> dict[str, int] | None:
        import json
        import os

        p = self._cursor_path()
        if p is None or not os.path.exists(p):
            return None
        with open(p) as fh:
            return {str(k): int(v) for k, v in json.load(fh).items()}

    def _save_cursor(self, end: dict) -> None:
        import json
        import os
        import uuid as _uuid

        p = self._cursor_path()
        if p is None:
            return
        # MONOTONE merge, never a plain overwrite: commit(end) reports
        # the PREVIOUS batch's end after latestOffset already persisted
        # a newer poll — letting it regress the file would poison the
        # next incarnation's anchor (the engine chains batch starts from
        # the reader's previous return; a regressed return = replay)
        prev = getattr(self, "_saved", None) or self._load_cursor() or {}
        norm = {
            str(k): max(int(v), int(prev.get(str(k), 0)))
            for k, v in end.items()
        }
        for k, v in prev.items():
            norm.setdefault(str(k), int(v))
        if norm == prev:
            return  # idle polls / stale commits: don't churn the file
        os.makedirs(self._cursor_dir, exist_ok=True)
        tmp = f"{p}.{_uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as fh:
            json.dump(norm, fh)
        os.replace(tmp, p)  # atomic: readers see old or new, never torn
        self._saved = norm

    def _bounds(self, earliest: bool) -> dict[str, int]:
        parts = kafka_partitions(self._host, self._port, self._topic)
        return {
            str(p): kafka_list_offsets(
                self._host, self._port, self._topic, p, earliest=earliest
            )
            for p in parts
        }

    def initialOffset(self) -> dict:
        # must NOT touch the rate-limit anchor: the engine may call this
        # after latestOffset, and resetting the anchor downward would
        # regress the offset chain (= replay)
        return self._bounds(earliest=self._starting != "latest")

    def latestOffset(self) -> dict:
        latest = self._bounds(earliest=False)
        cur = self._last_end
        if cur is not None:
            # topic partition-set change across polls. Kafka topics only
            # ever GAIN partitions; a partition disappearing from
            # metadata means the topic was deleted/recreated — offsets
            # are meaningless, fail loudly instead of silently replaying
            # or skipping (the jar connector errors here too).
            gone = sorted(set(cur) - set(latest))
            if gone:
                raise ValueError(
                    f"kafka_wire: partitions {gone} of topic "
                    f"{self._topic!r} vanished from broker metadata — "
                    "topics cannot shrink, so the topic was deleted or "
                    "recreated; restart the stream with a fresh "
                    "checkpoint"
                )
            # new partitions start at their earliest offset (= 0 for a
            # freshly created partition), the connector's drain-all
            # posture — records produced to them are picked up, not lost
            for p in latest:
                if p not in cur:
                    cur = dict(cur)
                    cur[p] = kafka_list_offsets(
                        self._host, self._port, self._topic, int(p),
                        earliest=True,
                    )
            self._last_end = cur
            if self._max is not None:
                lags = {p: latest[p] - cur.get(p, 0) for p in latest}
                total = sum(max(v, 0) for v in lags.values())
                if total > self._max:
                    # distribute the budget proportionally to lag (the
                    # connector's rate-limit policy), remainder to the
                    # laggiest partitions first
                    scale = self._max / total
                    take = {p: int(max(lag, 0) * scale) for p, lag in lags.items()}
                    rem = self._max - sum(take.values())
                    for p in sorted(lags, key=lags.get, reverse=True):
                        if rem <= 0:
                            break
                        if take[p] < max(lags[p], 0):
                            take[p] += 1
                            rem -= 1
                    latest = {p: cur.get(p, 0) + take[p] for p in latest}
            # monotone clamp — see the anchor comment in __init__
            latest = {p: max(v, cur.get(p, 0)) for p, v in latest.items()}
        self._last_end = dict(latest)
        # persist per POLL, not just per commit(): the engine's commit
        # callback fires at the NEXT batch's start, so a run that stops
        # after its last batch would otherwise leave the cursor a batch
        # behind — and a single-batch run would never write it at all.
        # A cursor at most one PLANNED batch ahead of the checkpoint is
        # safe: fetch ranges always come from the engine's start, so a
        # crash before the batch commits only means the next
        # incarnation's first capped batch covers that batch again.
        self._save_cursor(latest)
        return latest

    def partitions(self, start: dict, end: dict):
        out = []
        for p, e in end.items():
            s = start.get(p, 0)
            if e < s:
                # the offset chain regressed: our latestOffset returned
                # less than the engine's restored position. With the
                # monotone cursor this only happens on external
                # tampering (a hand-edited/copied rateCursorDir) — fail
                # LOUDLY: silently skipping would make the engine chain
                # the NEXT batch from the regressed end and re-deliver
                # committed offsets (observed engine behavior)
                raise ValueError(
                    f"kafka_wire: batch end {e} < start {s} for "
                    f"{self._topic}/{p} — the rate cursor regressed "
                    "below the stream's checkpointed position (stale or "
                    "foreign rateCursorDir?). The regressed range is "
                    "already in the engine's offset WAL: restart the "
                    "stream with a FRESH checkpoint and delete the "
                    "cursor dir with it"
                )
            if e > s:
                out.append(_RangePartition(
                    self._host, self._port, self._topic, int(p), int(s), int(e)
                ))
        return out

    def read(self, partition):
        yield from _fetch_range(partition)

    def commit(self, end: dict) -> None:
        # offsets live in the engine's checkpoint; the sidecar cursor
        # only re-arms the rate limiter across driver incarnations
        self._save_cursor(end)
        if self._commit_group:
            # mirror the ENGINE-committed position to the broker
            # (OffsetCommit as a simple consumer) so external lag
            # tooling sees progress, like the jar connector's
            # kafka.group.id. commit(end) fires strictly AFTER the
            # engine checkpoints the batch, so the broker never gets
            # ahead of the checkpoint; it can lag one batch (the
            # engine calls commit at the NEXT batch's start — the jar
            # connector's commits are asynchronous too). Best-effort
            # by design: a broker hiccup must not fail the stream,
            # exactly-once rests on the checkpoint alone.
            try:
                kafka_offset_commit(
                    self._host, self._port, self._commit_group,
                    self._topic, {int(p): int(v) for p, v in end.items()},
                )
            except Exception as e:
                # truly best-effort: a truncated broker response raises
                # struct.error, a malformed one AssertionError — none of
                # these may fail the streaming query (exactly-once rests
                # on the engine checkpoint, not this mirror). But a
                # PERMANENTLY broken mirror must stay diagnosable
                # (ADVICE r11): warn once per exception type, so a
                # programming error shows up in lag monitoring instead
                # of being swallowed on every batch.
                key = type(e).__name__
                if key not in self._mirror_warned:
                    self._mirror_warned.add(key)
                    import warnings

                    warnings.warn(
                        f"kafka offset-commit mirror failed ({key}: {e}); "
                        "stream continues, broker-visible lag will not "
                        "advance until the mirror recovers",
                        RuntimeWarning,
                        stacklevel=2,
                    )


class _KafkaWireBatchReader(DataSourceReader):
    """Batch read of the whole topic (earliest..latest at plan time)."""

    def __init__(self, host: str, port: int, topic: str):
        self._host, self._port, self._topic = host, port, topic

    def partitions(self):
        out = []
        for p in kafka_partitions(self._host, self._port, self._topic):
            lo = kafka_list_offsets(self._host, self._port, self._topic, p, earliest=True)
            hi = kafka_list_offsets(self._host, self._port, self._topic, p)
            if hi > lo:
                out.append(_RangePartition(self._host, self._port, self._topic, p, lo, hi))
        return out

    def read(self, partition):
        yield from _fetch_range(partition)


class _ProduceCommit(WriterCommitMessage):
    def __init__(self, counts: dict):
        self.counts = counts  # partition -> records produced


def _murmur2(data: bytes) -> int:
    """Kafka's 32-bit murmur2 (seed 0x9747b28c) — the hash behind the
    Java client's DefaultPartitioner, reimplemented from the public
    algorithm so records keyed by this sink land on the SAME partition
    a Java producer (or the jar sink) would pick for the same key.
    Returns the unsigned 32-bit hash; callers mask to positive."""
    length = len(data)
    m = 0x5BD1E995
    h = (0x9747B28C ^ length) & 0xFFFFFFFF
    base = length & ~3
    for i in range(0, base, 4):
        k = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) | (data[i + 3] << 24)
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> 24
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
    extra = length & 3
    if extra >= 3:
        h ^= data[base + 2] << 16
    if extra >= 2:
        h ^= data[base + 1] << 8
    if extra >= 1:
        h ^= data[base]
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def _produce_rows(rows, host, port, topic, n_partitions, batch_size=500):
    """One task's produce leg: route each row to a Kafka partition
    (explicit ``partition`` column wins, else murmur2(key) — Kafka's
    DefaultPartitioner, so keyed routing is co-partitioned with Java
    clients — else round robin), frame RecordBatch v2 batches, produce.
    Returns per-partition counts for the commit message. Mirrors the
    jar sink's row contract: ``value`` required (binary or string),
    ``key``/``partition`` optional."""
    import time

    buf: dict[int, list] = {}
    counts: dict[int, int] = {}
    rr = 0

    def flush(p):
        if buf.get(p):
            kafka_produce(host, port, topic, p, buf[p])
            counts[p] = counts.get(p, 0) + len(buf[p])
            buf[p] = []

    now_ms = int(time.time() * 1000)
    for row in rows:
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        value = d.get("value")
        if value is None:
            raise ValueError("kafka_wire sink: every row needs a non-null 'value'")
        if isinstance(value, str):
            value = value.encode()
        else:
            value = bytes(value)
        key = d.get("key")
        if isinstance(key, str):
            key = key.encode()
        elif key is not None:
            key = bytes(key)
        if d.get("partition") is not None:
            p = int(d["partition"]) % n_partitions
        elif key is not None:
            # Kafka's DefaultPartitioner: toPositive(murmur2(key)) % N
            p = (_murmur2(key) & 0x7FFFFFFF) % n_partitions
        else:
            p, rr = rr % n_partitions, rr + 1
        buf.setdefault(p, []).append((key, value, now_ms))
        if len(buf[p]) >= batch_size:
            flush(p)
    for p in list(buf):
        flush(p)
    return counts


class _KafkaWireWriter(DataSourceWriter, DataSourceStreamWriter):
    """Batch AND streaming produce. Delivery is AT-LEAST-ONCE: records
    hit the broker inside write() and a task retry re-produces (exactly
    the reference consumer's commit-after-put posture, and the jar
    sink's documented semantics without Kafka transactions); dedup
    downstream by envelope identity, as the bronze chain already does."""

    def __init__(self, host: str, port: int, topic: str, n_partitions: int):
        self._host, self._port = host, port
        self._topic, self._n = topic, n_partitions

    def write(self, iterator):
        counts = _produce_rows(
            iterator, self._host, self._port, self._topic, self._n
        )
        return _ProduceCommit(counts)

    def commit(self, messages, batchId=None):  # noqa: N803 — engine signature
        pass  # records are already on the broker (at-least-once)

    def abort(self, messages, batchId=None):  # noqa: N803
        pass


class KafkaWireDataSource(DataSource):
    """``format("kafka_wire")``: jar-free Kafka reads AND writes over
    the public wire protocol. Options: ``bootstrap`` (host:port,
    required), ``topic`` (default binance_trades_raw),
    ``startingOffsets`` (earliest|latest, streaming reads),
    ``maxOffsetsPerTrigger`` (streaming reads), ``rateCursorDir``
    (driver-local dir persisting the rate cursor so the limit also
    caps the first batch after a restart), ``commitToBroker`` (a
    consumer-group id; when set, engine-committed offsets are mirrored
    to the broker via OffsetCommit so external lag tooling sees the
    stream's progress — the jar connector's ``kafka.group.id``),
    ``partitions`` (sink routing width; default = broker metadata). Sink rows follow
    the jar sink's contract: ``value`` required (binary|string),
    ``key``/``partition`` optional; delivery at-least-once (no Kafka
    transactions — the reference's own posture; bronze dedups by
    envelope identity downstream)."""

    def __init__(self, options):
        super().__init__(options)
        bootstrap = options.get("bootstrap")
        if not bootstrap:
            raise ValueError("kafka_wire requires .option('bootstrap', 'host:port')")
        self._host, self._port = _parse_bootstrap(bootstrap)
        self._topic = options.get("topic", DEFAULT_TOPIC)

    @classmethod
    def name(cls) -> str:
        return "kafka_wire"

    def schema(self) -> str:
        # the Structured Streaming Kafka integration contract — identical
        # to streaming/ingest.py::KAFKA_SOURCE_SCHEMA so either source
        # feeds the same downstream chain
        return (
            "key BINARY, value BINARY, topic STRING, partition INT, "
            "offset LONG, timestamp TIMESTAMP, timestampType INT"
        )

    def reader(self, schema) -> DataSourceReader:
        return _KafkaWireBatchReader(self._host, self._port, self._topic)

    def streamReader(self, schema) -> DataSourceStreamReader:
        mx = self.options.get("maxoffsetspertrigger")
        return _KafkaWireStreamReader(
            self._host,
            self._port,
            self._topic,
            self.options.get("startingoffsets", "earliest"),
            int(mx) if mx is not None else None,
            cursor_dir=self.options.get("ratecursordir"),
            commit_group=self.options.get("committobroker"),
        )

    def _make_writer(self) -> _KafkaWireWriter:
        n = self.options.get("partitions")
        n_partitions = (
            int(n)
            if n is not None
            else max(len(kafka_partitions(self._host, self._port, self._topic)), 1)
        )
        return _KafkaWireWriter(self._host, self._port, self._topic, n_partitions)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        if overwrite:
            raise ValueError("kafka_wire sink: a log cannot be overwritten — use append")
        return self._make_writer()

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return self._make_writer()


def register_kafka_wire_source(spark) -> None:
    """Register ``format("kafka_wire")`` on this session. Both this
    module and ``kafka_wire`` are pickled BY VALUE into the engine's
    Python workers (stdlib-only dependencies), so the source runs from
    any vanilla session with no package distribution to workers."""
    import sys

    from pyspark import cloudpickle

    from . import kafka_wire

    cloudpickle.register_pickle_by_value(kafka_wire)
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(KafkaWireDataSource)
