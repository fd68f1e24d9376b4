"""REST row-service connector on Spark 4's Python DataSource API.

The reference ships service-backed connectors (Kafka/ES-style sources
and sinks registered through its ``TableFactory`` SPI — e.g.
``KafkaTableSourceSinkFactory``, ``Elasticsearch6UpsertTableSink``);
the sandbox has no live Kafka/Elasticsearch, so this module supplies
the same *contract* against a real network service we can run:
a thread-safe HTTP row service (stdlib ``http.server``) plus a
``DataSource`` implementation that exercises every connector trait on
Spark's public Python DataSource API (SPARK-44076):

- **batch reads** split into N contiguous index-range
  ``InputPartition`` s fetched by executors in parallel (the count is
  snapshotted at plan time, so the union is exact and the service
  does O(N) total slicing work — not one full log scan per split);
- **filter pushdown** (``DataSourceReader.pushFilters``): the
  comparison/null/IN/prefix filter classes are compiled into query
  parameters and evaluated server-side; everything else is returned
  to Spark, which keeps a residual Filter node — same split the
  SQLite connector makes JVM-side (``sources/sqlite.py``);
- **streaming reads** under the Kafka offset contract: monotone
  ``latest`` offset, replayable ``[start, end)`` range fetch, either
  driver-prefetched (``SimpleDataSourceStreamReader``) or split into
  executor-side range partitions (``DataSourceStreamReader``) — the
  scale path, one range slice per executor;
- **exactly-once batch + streaming writes** by two-phase commit:
  tasks stage rows under a unique id, the driver's ``commit()``
  atomically publishes the staged ids; aborted/retried attempts leave
  only garbage staging buffers, never visible rows. The streaming
  writer keys the stage id by (epoch, partition) and the server
  de-dupes republished epochs, so a replayed micro-batch lands once.

Everything crosses the wire as JSON lines; doubles survive exactly
because Python's ``json`` renders shortest-round-trip reprs.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

# ---------------------------------------------------------------------------
# the row service
# ---------------------------------------------------------------------------


class _ServiceState:
    """Row log + staged write buffers, guarded by one lock."""

    def __init__(self, schema_ddl: str, rows: list[dict]):
        self.lock = threading.Lock()
        self.schema_ddl = schema_ddl
        self.rows: list[dict] = list(rows)
        self.staged: dict[str, list[dict]] = {}
        self.committed_epochs: set[str] = set()
        self.pushed_filter_hits = 0  # how many /rows requests carried filters
        # async-lookup instrumentation: how many /rows requests are
        # being served RIGHT NOW and the high-water mark — lets a test
        # prove a client really overlaps in-flight lookups
        # (AsyncLookupJoinRunner's capacity contract) instead of
        # trusting the client's own bookkeeping.
        self.inflight = 0
        self.max_inflight = 0


def _matches(row: dict, preds: list[dict]) -> bool:
    for p in preds:
        v = row.get(p["col"])
        op, ref = p["op"], p.get("val")
        if op == "isnull":
            if v is not None:
                return False
        elif op == "notnull":
            if v is None:
                return False
        elif v is None:
            return False
        elif op == "eq":
            if not v == ref:
                return False
        elif op == "gt":
            if not v > ref:
                return False
        elif op == "ge":
            if not v >= ref:
                return False
        elif op == "lt":
            if not v < ref:
                return False
        elif op == "le":
            if not v <= ref:
                return False
        elif op == "in":
            if v not in ref:
                return False
        elif op == "prefix":
            if not str(v).startswith(ref):
                return False
        else:  # unknown op ⇒ refuse, never silently drop a predicate
            raise ValueError(f"unknown pushdown op {op!r}")
    return True


class _Handler(BaseHTTPRequestHandler):
    state: _ServiceState  # set by start_row_service

    def log_message(self, *a):  # silence per-request stderr lines
        pass

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _ndjson(self, rows):
        body = "\n".join(json.dumps(r) for r in rows).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/x-ndjson")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        st = self.state
        url = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(url.query)
        if url.path == "/meta":
            with st.lock:
                self._json(
                    {
                        "schema": st.schema_ddl,
                        "count": len(st.rows),
                        "pushed_filter_hits": st.pushed_filter_hits,
                        "max_inflight": st.max_inflight,
                    }
                )
        elif url.path == "/latest":
            with st.lock:
                self._json({"offset": len(st.rows)})
        elif url.path == "/rows":
            preds = [json.loads(f) for f in q.get("f", [])]
            # optional simulated external-system latency (sleep OUTSIDE
            # the lock, so concurrent requests really overlap) — used by
            # the async-lookup tests to make in-flight overlap visible
            sleep_ms = int(q.get("sleep_ms", ["0"])[0])
            with st.lock:
                st.inflight += 1
                st.max_inflight = max(st.max_inflight, st.inflight)
            try:
                if sleep_ms:
                    time.sleep(sleep_ms / 1000.0)
                with st.lock:
                    if preds:
                        st.pushed_filter_hits += 1
                    if "start" in q:  # contiguous range slice: O(slice)
                        start = int(q["start"][0])
                        end = int(q["end"][0])
                        base = st.rows[start:end]
                    else:  # legacy modulo split: O(log) per request
                        split = int(q.get("split", ["0"])[0])
                        of = int(q.get("of", ["1"])[0])
                        base = [
                            r
                            for i, r in enumerate(st.rows)
                            if i % of == split
                        ]
                    rows = [r for r in base if _matches(r, preds)]
            finally:
                with st.lock:
                    st.inflight -= 1
            self._ndjson(rows)
        elif url.path == "/range":
            start = int(q["start"][0])
            end = int(q["end"][0])
            with st.lock:
                rows = st.rows[start:end]
            self._ndjson(rows)
        else:
            self._json({"error": "not found"}, 404)

    def do_POST(self):
        st = self.state
        url = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(url.query)
        n = int(self.headers.get("Content-Length", "0"))
        body = self.rfile.read(n).decode() if n else ""
        rows = [json.loads(ln) for ln in body.splitlines() if ln.strip()]
        if url.path == "/append":
            with st.lock:
                st.rows.extend(rows)
                self._json({"offset": len(st.rows)})
        elif url.path == "/stage":
            sid = q["id"][0]
            with st.lock:
                # task retries overwrite their own buffer — last attempt wins
                st.staged[sid] = rows
            self._json({"staged": sid, "n": len(rows)})
        elif url.path == "/commit":
            ids = json.loads(body)["ids"]
            epoch = q.get("epoch", [None])[0]
            with st.lock:
                if epoch is not None and epoch in st.committed_epochs:
                    for i in ids:  # drop the replayed stage buffers
                        st.staged.pop(i, None)
                    self._json({"offset": len(st.rows), "dedup": True})
                    return
                missing = [i for i in ids if i not in st.staged]
                if missing:
                    self._json({"error": f"unknown stage ids {missing}"}, 409)
                    return
                for i in ids:
                    st.rows.extend(st.staged.pop(i))
                for sid in list(st.staged):  # drop losing task attempts
                    st.staged.pop(sid)
                if epoch is not None:
                    st.committed_epochs.add(epoch)
                self._json({"offset": len(st.rows)})
        elif url.path == "/abort":
            ids = json.loads(body).get("ids", [])
            with st.lock:
                for i in ids:
                    st.staged.pop(i, None)
            self._json({"aborted": len(ids)})
        else:
            self._json({"error": "not found"}, 404)


def start_row_service(
    schema_ddl: str, rows: list[dict]
) -> tuple[ThreadingHTTPServer, str]:
    """Serve ``rows`` on an ephemeral localhost port; returns
    (server, base_url). Caller owns shutdown()."""
    state = _ServiceState(schema_ddl, rows)
    handler = type("_BoundHandler", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read().decode())


def _get_ndjson(url: str) -> list[dict]:
    with urllib.request.urlopen(url) as r:
        return [
            json.loads(ln)
            for ln in r.read().decode().splitlines()
            if ln.strip()
        ]


def _post(url: str, obj=None, ndjson: list[dict] | None = None):
    if ndjson is not None:
        body = "\n".join(json.dumps(r) for r in ndjson).encode()
    else:
        body = json.dumps(obj or {}).encode()
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read().decode())


# ---------------------------------------------------------------------------
# filter compilation (driver side)
# ---------------------------------------------------------------------------

_OPS = {
    EqualTo: "eq",
    GreaterThan: "gt",
    GreaterThanOrEqual: "ge",
    LessThan: "lt",
    LessThanOrEqual: "le",
}


def _compile_filter(f: Filter) -> dict | None:
    """Filter → serializable predicate the service evaluates, or None
    when the class/column shape is not supported (left to Spark)."""
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:  # nested columns stay Spark-side
        return None
    col = attr[0]
    for cls, op in _OPS.items():
        if isinstance(f, cls):
            v = f.value
            if isinstance(v, (int, float, str, bool)):
                return {"col": col, "op": op, "val": v}
            return None
    if isinstance(f, IsNull):
        return {"col": col, "op": "isnull"}
    if isinstance(f, IsNotNull):
        return {"col": col, "op": "notnull"}
    if isinstance(f, In):
        vals = list(f.value)
        if all(isinstance(v, (int, float, str, bool)) for v in vals):
            return {"col": col, "op": "in", "val": vals}
        return None
    if isinstance(f, StringStartsWith):
        return {"col": col, "op": "prefix", "val": f.value}
    return None


def _row_tuple(schema: StructType, d: dict) -> tuple:
    return tuple(d.get(f.name) for f in schema.fields)


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------


class RestPartition(InputPartition):
    def __init__(self, start: int, end: int, preds: list[dict]):
        self.start = start
        self.end = end
        self.preds = preds


class RestBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.url = options["url"]
        self.nparts = int(options.get("numpartitions", "4"))
        self.preds: list[dict] = []

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        rest = []
        for f in filters:
            c = _compile_filter(f)
            if c is None:
                rest.append(f)
            else:
                self.preds.append(c)
        return rest

    def partitions(self):
        # contiguous index ranges (count snapshotted at plan time):
        # k partitions cost the service O(N) total, not k full scans
        # the way a modulo split would — the same page-by-index shape
        # a production endpoint serves cheaply
        n = _get(f"{self.url}/meta")["count"]
        step = (n + self.nparts - 1) // self.nparts if n else 0
        parts = []
        for i in range(self.nparts):
            lo = min(i * step, n)
            hi = min(lo + step, n)
            parts.append(RestPartition(lo, hi, self.preds))
        return parts

    def read(self, part: RestPartition):
        if part.end <= part.start:
            return
        qs = [("start", str(part.start)), ("end", str(part.end))] + [
            ("f", json.dumps(p)) for p in part.preds
        ]
        rows = _get_ndjson(f"{self.url}/rows?{urllib.parse.urlencode(qs)}")
        for d in rows:
            yield _row_tuple(self.schema, d)


class RestRangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RestScalableStreamReader(DataSourceStreamReader):
    """Executor-side range reads — the Kafka-partition-style scale
    path: each micro-batch's [start, latest) is split into up to
    ``numpartitions`` contiguous slices, one fetch per executor."""

    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.url = options["url"]
        self.nparts = int(options.get("numpartitions", "4"))

    def initialOffset(self):  # noqa: N802
        return {"offset": 0}

    def latestOffset(self):  # noqa: N802
        return {"offset": _get(f"{self.url}/latest")["offset"]}

    def partitions(self, start, end):
        lo, hi = start["offset"], end["offset"]
        if hi <= lo:
            return [RestRangePartition(lo, lo)]
        n = min(self.nparts, hi - lo)
        step = (hi - lo + n - 1) // n
        return [
            RestRangePartition(s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, part: RestRangePartition):
        if part.end <= part.start:
            return
        rows = _get_ndjson(
            f"{self.url}/range?start={part.start}&end={part.end}"
        )
        for d in rows:
            yield _row_tuple(self.schema, d)

    def commit(self, end):
        pass


class RestSimpleStreamReader(SimpleDataSourceStreamReader):
    """Driver-prefetch variant for low-rate streams; replay goes
    through the same /range fetch, so a restarted query re-reads a
    planned-but-unfinished batch byte-identically."""

    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.url = options["url"]

    def initialOffset(self):  # noqa: N802
        return {"offset": 0}

    def read(self, start):
        lo = start["offset"]
        hi = _get(f"{self.url}/latest")["offset"]
        rows = (
            _get_ndjson(f"{self.url}/range?start={lo}&end={hi}")
            if hi > lo
            else []
        )
        return (
            iter([_row_tuple(self.schema, d) for d in rows]),
            {"offset": hi},
        )

    def readBetweenOffsets(self, start, end):  # noqa: N802
        rows = _get_ndjson(
            f"{self.url}/range?start={start['offset']}&end={end['offset']}"
        )
        return iter([_row_tuple(self.schema, d) for d in rows])


class _StageCommit(WriterCommitMessage):
    def __init__(self, sids: list[str]):
        self.sids = sids


_STAGE_CHUNK_ROWS = 10_000


def _stage_chunks(url: str, schema: StructType, it, base: str) -> list[str]:
    """Stream the partition to the service in bounded chunks — memory
    stays O(chunk), not O(partition). Each chunk gets its own stage
    id (``<base>-c<k>``); a retried task attempt uses a different
    base, so a partial loser's chunks are never in the winner's
    commit list (they linger as staged garbage only — the same
    storage-bloat-only contract as the SQLite 2PC writer)."""
    names = [f.name for f in schema.fields]
    sids: list[str] = []
    buf: list[dict] = []

    def _flush() -> None:
        sid = f"{base}-c{len(sids)}"
        _post(f"{url}/stage?id={sid}", ndjson=buf)
        sids.append(sid)
        buf.clear()

    for r in it:
        buf.append(dict(zip(names, tuple(r))))
        if len(buf) >= _STAGE_CHUNK_ROWS:
            _flush()
    if buf or not sids:  # empty partition still stages one empty chunk
        _flush()
    return sids


class RestBatchWriter(DataSourceWriter):
    """Two-phase commit: write() stages under per-task chunk ids,
    commit() publishes exactly the listed ids atomically server-side."""

    def __init__(self, schema: StructType, options, overwrite: bool):
        if overwrite:
            raise ValueError("rest sink is append-only")
        self.schema = schema
        self.url = options["url"]

    def write(self, it):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        base = f"task-{ctx.partitionId()}-{ctx.taskAttemptId()}"
        return _StageCommit(_stage_chunks(self.url, self.schema, it, base))

    def commit(self, messages):
        ids = [s for m in messages for s in m.sids]
        _post(f"{self.url}/commit", obj={"ids": ids})

    def abort(self, messages):
        ids = [s for m in messages if m is not None for s in m.sids]
        _post(f"{self.url}/abort", obj={"ids": ids})


class RestStreamWriter(DataSourceStreamWriter):
    """Streaming sink with epoch-keyed stages; the service de-dupes
    committed epochs, so a replayed micro-batch publishes once.

    The dedup key is ``<queryname>-<batchId>`` — batch ids restart at
    0 for every new query, so they only identify a batch *within* a
    query. Pass a stable ``queryname`` option to keep exactly-once
    across query restarts; without one, a fresh per-run id is
    generated (exactly-once within the run, at-least-once across
    restarts — the same downgrade an unset Kafka transactional.id
    causes)."""

    def __init__(self, schema: StructType, options):
        import uuid

        self.schema = schema
        self.url = options["url"]
        self.qid = options.get("queryname") or uuid.uuid4().hex

    def write(self, it):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        base = f"epoch-p{ctx.partitionId()}-a{ctx.taskAttemptId()}"
        return _StageCommit(_stage_chunks(self.url, self.schema, it, base))

    def commit(self, messages, batchId):  # noqa: N803
        ids = [s for m in messages for s in m.sids]
        _post(
            f"{self.url}/commit?epoch={self.qid}-{batchId}",
            obj={"ids": ids},
        )

    def abort(self, messages, batchId):  # noqa: N803
        ids = [s for m in messages if m is not None for s in m.sids]
        _post(f"{self.url}/abort", obj={"ids": ids})


class RestDataSource(DataSource):
    """``spark.read.format("flinkrest").option("url", ...)`` — see
    module docstring. Options: ``url`` (required), ``numpartitions``
    (batch/scalable-stream split count), ``mode=scalable`` to pick the
    executor-side stream reader."""

    @classmethod
    def name(cls):
        return "flinkrest"

    def schema(self):
        return _get(f"{self.options['url']}/meta")["schema"]

    def reader(self, schema: StructType):
        return RestBatchReader(schema, self.options)

    def streamReader(self, schema: StructType):  # noqa: N802
        if self.options.get("mode") == "scalable":
            return RestScalableStreamReader(schema, self.options)
        # PySparkNotImplementedError (not the builtin) is the documented
        # signal that makes Spark fall back to simpleStreamReader()
        from pyspark.errors import PySparkNotImplementedError

        raise PySparkNotImplementedError(
            errorClass="NOT_IMPLEMENTED",
            messageParameters={"feature": "streamReader"},
        )

    def simpleStreamReader(self, schema: StructType):  # noqa: N802
        return RestSimpleStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return RestBatchWriter(schema, self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):  # noqa: N802
        return RestStreamWriter(schema, self.options)


_REGISTERED: set[str] = set()


def register(spark) -> None:
    """Idempotent per-app registration of the ``flinkrest`` format."""
    key = spark.sparkContext.applicationId
    if key not in _REGISTERED:
        spark.dataSource.register(RestDataSource)
        # default-off runtime flag gating DataSourceReader.pushFilters
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        _REGISTERED.add(key)
