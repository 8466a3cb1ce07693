"""Custom Python data source (Spark 4 DataSource API).

The reference reads plain text files (main.go:50-68); real pipelines
also ingest from systems with no built-in connector. Spark 4's Python
DataSource API makes a first-class, partition-parallel source out of
~40 lines of Python — demonstrated here with a deterministic synthetic
corpus generator (the same word distribution logic a fixture would
use), exposing proper ``partitions()`` so Spark schedules one task per
partition instead of funneling through the driver.

Scale posture: each InputPartition is read independently on an
executor (the generator state is the partition object itself — nothing
driver-side after planning), so a production adaptation (an HTTP
paginated API, a proprietary scanner) parallelizes by partitioning its
key range exactly like this. Rows stream out of ``read()`` as tuples;
Arrow batching happens in the runner.

Serialization note: the classes are defined INSIDE the factory so
cloudpickle ships them to executors BY VALUE — a module-level class
pickles by reference and the executor worker would have to import this
package, which the external driver's sys.path bootstrap does not
guarantee (observed: ModuleNotFoundError from a /tmp-rooted driver).
"""

from __future__ import annotations

_WORDS = tuple(
    "spark scan table join hash row batch value part key "
    "filter sort window group query fast slow big small data".split()
)


def make_datasource(words: tuple[str, ...] = _WORDS):
    """Build the DataSource class with every dependency captured in the
    closure (pickled by value — see module note)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class CorpusPartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class SyntheticCorpusReader(DataSourceReader):
        def __init__(self, options):
            self.n_docs = int(options.get("n_docs", 100))
            self.n_parts = int(options.get("partitions", 4))
            self.words_per_doc = int(options.get("words_per_doc", 20))

        def partitions(self):
            step = (self.n_docs + self.n_parts - 1) // self.n_parts
            return [
                CorpusPartition(i, min(i + step, self.n_docs))
                for i in range(0, self.n_docs, step)
            ]

        def read(self, partition):
            # Deterministic affine word picks — reproducible across
            # runs and engines, no RNG state to serialize.
            for doc_id in range(partition.start, partition.end):
                picked = [
                    words[(doc_id * 31 + j * 17) % len(words)]
                    for j in range(self.words_per_doc)
                ]
                yield (doc_id, " ".join(picked), len(picked))

    class SyntheticCorpusDataSource(DataSource):
        """spark.read.format("synthetic_corpus").option("n_docs", N)"""

        @classmethod
        def name(cls) -> str:
            return "synthetic_corpus"

        def schema(self) -> str:
            return "doc_id bigint, text string, n_words int"

        def reader(self, schema) -> DataSourceReader:
            return SyntheticCorpusReader(self.options)

        def simpleStreamReader(self, schema):
            return SyntheticCorpusStreamReader(self.options)

    class SyntheticCorpusStreamReader(SimpleDataSourceStreamReader):
        """Micro-batch form of the same deterministic generator: the
        offset is the next doc_id, each batch emits up to ``batch_docs``
        documents, and ``readBetweenOffsets`` replays any committed
        range exactly (the affine formula IS the WAL) — giving the
        source exactly-once replay semantics with zero external state,
        which is precisely the contract a production stream source must
        implement against its upstream's offsets (Kafka offsets, change
        streams, paginated cursors)."""

        def __init__(self, options):
            self.n_docs = int(options.get("n_docs", 100))
            self.batch = int(options.get("batch_docs", 50))
            self.words_per_doc = int(options.get("words_per_doc", 20))

        def initialOffset(self):
            return {"doc": 0}

        def _rows(self, start: int, end: int):
            # Materialized list under a LIST-ITERATOR (see read()):
            # the runner's prefetch cache copy.copy()s the rows for
            # replay, and generators don't copy.
            return [
                (
                    doc_id,
                    " ".join(
                        words[(doc_id * 31 + j * 17) % len(words)]
                        for j in range(self.words_per_doc)
                    ),
                    self.words_per_doc,
                )
                for doc_id in range(start, end)
            ]

        def read(self, start):
            s = start["doc"]
            e = min(s + self.batch, self.n_docs)
            # iter(list): the runner needs BOTH copy.copy (replay of a
            # prefetched batch) and next() (the terminal empty-batch
            # check when the offset stops advancing) — a bare list
            # satisfies only the first, a generator neither.
            return (iter(self._rows(s, e)), {"doc": e})

        def readBetweenOffsets(self, start, end):
            return iter(self._rows(start["doc"], end["doc"]))

    return SyntheticCorpusDataSource


def make_arrow_datasource(words: tuple[str, ...] = _WORDS):
    """Arrow-batched variant of the synthetic-corpus STREAM source
    (format ``synthetic_corpus_arrow``), on the full
    ``DataSourceStreamReader`` API: the driver plans offsets and
    partitions; each executor-side ``read(partition)`` yields ONE
    pyarrow RecordBatch built vectorized with numpy — no per-row tuple
    materialization, no row-by-row Arrow conversion in the runner.
    This is the connector posture for production volumes: the simple
    reader's row-tuple path costs ~76 us/doc of pure conversion
    overhead (measured, round 5: 5.6 s for a 200-doc stream), all of
    which the RecordBatch path deletes.

    Offset/replay contract (identical to the simple reader): offsets
    are ``{"doc": next_doc_id}``; ``partitions(start, end)`` splits
    the committed range, and the affine word formula IS the WAL, so
    any range replays exactly. ``latestOffset`` advances by
    ``batch_docs`` per micro-batch up to ``n_docs``.

    Same by-value pickling posture as the other factories."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class CorpusRange(InputPartition):
        def __init__(self, start: int, end: int, words_per_doc: int):
            self.start = start
            self.end = end
            self.words_per_doc = words_per_doc

    class ArrowCorpusStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.n_docs = int(options.get("n_docs", 100))
            self.batch = int(options.get("batch_docs", 50))
            self.words_per_doc = int(options.get("words_per_doc", 20))
            self.n_parts = int(options.get("partitions", 2))
            self._latest = 0

        def initialOffset(self):
            return {"doc": 0}

        def latestOffset(self):
            self._latest = min(self._latest + self.batch, self.n_docs)
            return {"doc": self._latest}

        def partitions(self, start, end):
            s, e = start["doc"], end["doc"]
            step = max(1, (e - s + self.n_parts - 1) // self.n_parts)
            return [
                CorpusRange(i, min(i + step, e), self.words_per_doc)
                for i in range(s, e, step)
            ]

        def read(self, partition):
            import numpy as np
            import pyarrow as pa

            ids = np.arange(partition.start, partition.end, dtype=np.int64)
            j = np.arange(partition.words_per_doc, dtype=np.int64)
            idx = (ids[:, None] * 31 + j[None, :] * 17) % len(words)
            warr = np.array(words)
            texts = [" ".join(row) for row in warr[idx]]
            yield pa.record_batch(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(texts, type=pa.string()),
                    pa.array(
                        np.full(len(ids), partition.words_per_doc),
                        type=pa.int32(),
                    ),
                ],
                names=["doc_id", "text", "n_words"],
            )

        def commit(self, end):
            pass  # the affine formula is the WAL; nothing to GC

    class ArrowCorpusDataSource(DataSource):
        """spark.readStream.format("synthetic_corpus_arrow")"""

        @classmethod
        def name(cls) -> str:
            return "synthetic_corpus_arrow"

        def schema(self) -> str:
            return "doc_id bigint, text string, n_words int"

        def streamReader(self, schema):
            return ArrowCorpusStreamReader(self.options)

    return ArrowCorpusDataSource


def register(spark) -> None:
    """Register the reader/stream sources, once per session.

    Idempotent via a session-local flag — NOT a blanket
    ``try/except Exception`` at the call sites, which would also mask
    a genuine registration failure (bad schema, pickling error) and
    turn it into a confusing downstream "unknown data source"
    (ADVICE r9)."""
    if getattr(spark, "_mrwc_sources_registered", False):
        return
    spark.dataSource.register(make_datasource())
    spark.dataSource.register(make_arrow_datasource())
    spark.dataSource.register(make_versioned_stream_source())
    spark._mrwc_sources_registered = True


def register_sink(spark) -> None:
    """Same once-per-session posture for the jsonl_manifest sink."""
    if getattr(spark, "_mrwc_sink_registered", False):
        return
    spark.dataSource.register(make_sink_datasource())
    spark._mrwc_sink_registered = True


def manifest_files(path: str) -> list[str]:
    """The committed file list of a ``jsonl_manifest`` sink directory:
    every part file named by ``_MANIFEST.json`` (batch commits) and
    ``_MANIFEST-*.json`` (per-micro-batch stream commits). This is the
    ONLY correct read path for the sink — a ``part-*`` glob would also
    pick up orphans from failed/speculative task attempts and files a
    replayed batch superseded, defeating the two-phase commit on read.
    Driver-side and bounded: manifests are per-commit metadata, not
    data."""
    import glob
    import json
    import os

    out: list[str] = []
    for man in sorted(glob.glob(os.path.join(path, "_MANIFEST*.json"))):
        with open(man) as fh:
            m = json.load(fh)
        out.extend(os.path.join(path, f["path"]) for f in m["files"])
    return out


def manifest_total_rows(path: str) -> int:
    """Sum of committed row counts across all manifests (0 if none)."""
    import glob
    import json
    import os

    total = 0
    for man in glob.glob(os.path.join(path, "_MANIFEST*.json")):
        with open(man) as fh:
            total += json.load(fh)["total_rows"]
    return total


def make_sink_datasource():
    """Python DataSource WRITER (the other half of the Spark 4
    connector API): a JSON-lines sink with a two-phase commit — each
    task writes one part file and returns a commit message (path, row
    count); the driver-side commit() materializes _MANIFEST.json only
    after every task succeeded, and abort() removes the orphans. This
    is the task-commit protocol every real sink (object stores,
    warehouses without transactions) must implement; files are staged
    under task-unique names so speculative/retried tasks can never
    corrupt a committed manifest.

    Same by-value pickling posture as the reader above."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class JsonlCommit(WriterCommitMessage):
        def __init__(self, path: str, n_rows: int):
            self.path = path
            self.n_rows = n_rows

    class JsonlManifestWriter(DataSourceWriter):
        def __init__(self, options):
            self.path = options.get("path")

        def write(self, iterator):
            import json
            import os

            from pyspark import TaskContext

            ctx = TaskContext.get()
            # task-unique staging name: partition id + attempt number,
            # so a retried task never collides with its zombie
            fname = f"part-{ctx.partitionId():05d}-{ctx.taskAttemptId()}.jsonl"
            os.makedirs(self.path, exist_ok=True)
            full = os.path.join(self.path, fname)
            # Stage under a .staging suffix and promote atomically on
            # task success: a task that crashes mid-write produces no
            # commit message, so neither commit() nor abort() would
            # ever clean its partial file — the rename keeps such
            # wreckage out of the part-* namespace entirely (readers
            # additionally trust only _MANIFEST-listed files).
            staging = full + ".staging"
            n = 0
            with open(staging, "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict()) + "\n")
                    n += 1
            os.replace(staging, full)
            return JsonlCommit(full, n)

        def commit(self, messages):
            import json
            import os

            manifest = {
                "files": [
                    {"path": os.path.basename(m.path), "n_rows": m.n_rows}
                    for m in messages
                ],
                "total_rows": sum(m.n_rows for m in messages),
            }
            with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
                json.dump(manifest, fh)

        def abort(self, messages):
            import os

            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)

    from pyspark.sql.datasource import DataSourceStreamWriter

    class JsonlStreamWriter(DataSourceStreamWriter):
        """Micro-batch form of the same sink: per-batch task staging
        (taskAttemptId-unique file names are already unique ACROSS
        batches), then a per-batch manifest committed with the batch
        id — so a replayed batch overwrites its own manifest instead
        of double-counting, which is the idempotent-commit contract
        exactly-once streaming sinks implement against checkpointed
        batch ids."""

        def __init__(self, options):
            self.path = options.get("path")
            self._task = JsonlManifestWriter(options)

        def write(self, iterator):
            return self._task.write(iterator)

        def commit(self, messages, batchId):
            import json
            import os

            manifest = {
                "batch_id": batchId,
                "files": [
                    {"path": os.path.basename(m.path), "n_rows": m.n_rows}
                    for m in messages
                ],
                "total_rows": sum(m.n_rows for m in messages),
            }
            fn = os.path.join(self.path, f"_MANIFEST-{batchId:05d}.json")
            with open(fn, "w") as fh:
                json.dump(manifest, fh)

        def abort(self, messages, batchId):
            self._task.abort(messages)

    class JsonlManifestSink(DataSource):
        """df.write.format("jsonl_manifest").option("path", P).save()"""

        @classmethod
        def name(cls) -> str:
            return "jsonl_manifest"

        def writer(self, schema, overwrite: bool):
            return JsonlManifestWriter(self.options)

        def streamWriter(self, schema, overwrite: bool):
            return JsonlStreamWriter(self.options)

    return JsonlManifestSink


def make_versioned_stream_source():
    """Streaming SOURCE over a versioned table (sources/versioned.py)
    — the Delta streaming-source recipe: the offset IS the table
    version, each micro-batch is the rows the commits in
    ``(start_v, end_v]`` ADDED, and manifests are immutable so any
    committed range replays exactly (exactly-once without external
    state). The driver plans one InputPartition per added data file
    (KB-scale manifest metadata); executors read their file with
    pyarrow and yield RecordBatches — partition-parallel like every
    production table-source.

    Options: ``path`` (table root, required); ``ignoreChanges``
    ("true"/"false", default false) — a commit that REMOVES files
    (merge/delete/optimize/purge) breaks append-only streaming, so it
    raises unless set, in which case the commit's added files are
    re-emitted raw (Delta's documented ignoreChanges semantics:
    downstream must tolerate re-delivered rows); metadata-only
    commits (expectations, DV-only deletes, renames) contribute
    nothing. Tables using column mapping are refused (physical names
    in files; a streaming projection layer is future surface).

    CHANGE-DATA-FEED mode (``readChangeFeed=true`` + ``key=<col>`` —
    the Delta CDF ``readStream`` posture): rows are per-commit CHANGE
    EVENTS (key, change_type, old_*, new_*) instead of table rows.
    cdc-enabled merge/delete commits serve their write-time change
    files verbatim; create/append commits synthesize pure inserts
    from their own added files; optimize/purge commits contribute
    nothing when provably row-identical (no drop-mode expectation in
    force, or the commit's metrics record zero drop violations) and
    REFUSE otherwise — same contracts as the batch feed
    (versioned.py read_changes_log), which the drained stream
    hash-matches. ``startingVersion=N`` starts the feed AFTER commit
    N (default: the table's create). Rename/drop/rollback commits in
    range refuse: a rewound lineage needs a fresh stream.

    Same by-value pickling posture as the other factories."""
    import json as _json
    import os as _os

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    _ARROW_DDL = {
        "int64": "bigint",
        "int32": "int",
        "double": "double",
        "float": "float",
        "string": "string",
        "large_string": "string",
        "bool": "boolean",
        "date32[day]": "date",
    }

    class FilePartition(InputPartition):
        def __init__(self, full_path: str, fields: list, kind: str = "data",
                     key: str | None = None):
            self.full_path = full_path
            self.fields = fields  # [(name, arrow_type_str)]
            self.kind = kind      # "data" | "cdc" | "insert"
            self.key = key

    class VersionedStreamReader(DataSourceStreamReader):
        def __init__(self, options, fields, data_fields=None):
            self.path = options["path"]
            self.snap_dir = _os.path.join(self.path, "_snapshots")
            self.cdf = (
                str(options.get("readChangeFeed", "false")).lower() == "true"
            )
            self.key = options.get("key")
            self.data_fields = data_fields or fields
            self.start_version = int(options.get("startingVersion", -1))
            self.ignore_changes = (
                str(options.get("ignoreChanges", "false")).lower() == "true"
            )
            # rate limit (Delta's maxFilesPerTrigger analog, at commit
            # granularity): each micro-batch after the first advances
            # at most this many versions, bounding per-trigger state
            # growth on a long backlog; 0/absent = drain to latest.
            # For CONTINUOUS triggers — Trigger.AvailableNow snapshots
            # latestOffset once for Python sources, so the whole drain
            # is one batch there regardless of the limit.
            self.max_versions = int(options.get("maxVersionsPerBatch", 0))
            self.fields = fields
            # Highest offset Spark itself has surfaced to this reader
            # (initialOffset on a FRESH query, partitions() planning a
            # range, commit()). The rate limiter advances only from
            # this point — never from its own previous latestOffset
            # answer — so repeated polls without a planned batch can't
            # outrun the limit. While unseeded (None — Spark calls the
            # argument-less latestOffset BEFORE initialOffset, and
            # after a driver restart initialOffset is never called),
            # the answer is the RAW latest: one unbounded catch-up
            # batch, but never an offset BELOW Spark's checkpointed
            # position — offset regression re-emits committed versions
            # as duplicates, the failure mode that actually corrupts a
            # downstream sink (ADVICE r9). The limit therefore bounds
            # every batch after the first; this is the strongest
            # contract the argument-less Python latestOffset admits.
            self._known: int | None = None

        def _versions(self):
            out = []
            for f in _os.listdir(self.snap_dir):
                if f.startswith("v") and f.endswith(".json") and "checkpoint" not in f:
                    out.append(int(f[1:-5]))
            return sorted(out)

        def initialOffset(self):
            # only called on a fresh query (no checkpoint): the start
            # version is now a genuine floor the limiter may advance
            # from
            self._known = self.start_version
            return {"version": self.start_version}

        def latestOffset(self):
            vs = self._versions()
            latest = vs[-1] if vs else -1
            if self.max_versions > 0 and self._known is not None:
                latest = min(latest, self._known + self.max_versions)
            if self._known is not None:
                latest = max(latest, self._known)  # never regress
            return {"version": latest}

        def partitions(self, start, end):
            # Spark plans (start, end]: both bounds are authoritative —
            # seed/advance the limiter's floor from the planned range
            # (this is where a restarted reader learns the checkpointed
            # position)
            hi = max(start["version"], end["version"])
            if self._known is None or hi > self._known:
                self._known = hi
            parts = []
            for v in range(start["version"] + 1, end["version"] + 1):
                with open(_os.path.join(self.snap_dir, f"v{v:05d}.json")) as fh:
                    m = _json.load(fh)
                if self.cdf:
                    parts.extend(self._cdf_parts(v, m))
                    continue
                adds = m.get("add")
                if adds is None:  # legacy full manifest: the create
                    adds = m.get("files") or []
                removes = m.get("remove") or []
                if removes and not self.ignore_changes:
                    raise ValueError(
                        f"commit v{v} ({m.get('operation')}) removes "
                        "files: not an append-only stream; set "
                        "ignoreChanges=true to re-emit rewritten rows"
                    )
                for rel in adds:
                    full = (
                        rel
                        if _os.path.isabs(rel)
                        else _os.path.join(self.path, rel)
                    )
                    parts.append(FilePartition(full, self.fields))
            return parts

        def _expectations_at(self, m: dict, v: int) -> dict:
            """Rules in force at commit ``v``: once expectations exist
            every later manifest carries the key (the same protocol
            invariant as column-mapping metadata), so the newest
            manifest on the parent chain bearing it is authoritative."""
            while True:
                if "expectations" in m:
                    return m["expectations"] or {}
                if "files" in m or m.get("parent") is None:
                    return {}
                v = m["parent"]
                with open(
                    _os.path.join(self.snap_dir, f"v{v:05d}.json")
                ) as fh:
                    m = _json.load(fh)

        def _cdf_parts(self, v: int, m: dict) -> list:
            """Change-event partitions for one commit — the streaming
            twin of versioned.py read_changes_log's per-commit logic
            (kept contract-identical: the drained stream hash-matches
            the batch feed; pinned in tests)."""
            op = m.get("operation")
            if op in ("set_expectation", "drop_expectation"):
                return []  # metadata-only
            if op in ("optimize", "purge_dvs", "compact"):
                rules = self._expectations_at(m, v)
                drops = [
                    n for n, r in rules.items() if r.get("mode") == "drop"
                ]
                if not drops:
                    return []  # provably row-identical rewrite
                metrics = m.get("expectation_metrics")
                if metrics is not None and all(
                    int((metrics.get(n) or {}).get("violations", 1)) == 0
                    for n in drops
                ):
                    return []
                raise ValueError(
                    f"commit v{v} ({op}) may have dropped rows through "
                    "a drop-mode expectation: the change feed cannot "
                    "serve it incrementally (read the batch snapshot "
                    "diff instead)"
                )
            if op in ("merge", "delete", "delete_keys_mor"):
                cdc = m.get("cdc")
                if cdc is None:
                    raise ValueError(
                        f"commit v{v} ({op}) was written without "
                        "cdc=True: its changes are not in the log"
                    )
                return [
                    FilePartition(
                        p if _os.path.isabs(p)
                        else _os.path.join(self.path, p),
                        self.fields, kind="cdc",
                    )
                    for p in cdc
                ]
            if op in ("create", "append"):
                adds = m.get("add")
                if adds is None:
                    # legacy full manifest (a pre-delta create records
                    # "files", not "add") — mirror the non-CDF path
                    # above or the feed silently emits ZERO insert
                    # events for the base data (ADVICE r10)
                    adds = m.get("files") or []
                return [
                    FilePartition(
                        p if _os.path.isabs(p)
                        else _os.path.join(self.path, p),
                        self.fields, kind="insert", key=self.key,
                    )
                    for p in adds
                ]
            raise ValueError(
                f"commit v{v} ({op}) is not servable as a change feed "
                "(rename/drop/rollback/legacy): start a fresh stream "
                "from a newer version"
            )

        def read(self, partition):
            import pyarrow as pa
            import pyarrow.parquet as pq

            t = pq.read_table(partition.full_path)
            n = t.num_rows
            cols, names = [], []
            if partition.kind == "insert":
                # a data file served as pure-insert change events:
                # key + 'insert' + null old_* + new_* from the file
                for name, typ in partition.fields:
                    if name == partition.key and name in t.column_names:
                        cols.append(t.column(name).combine_chunks())
                    elif name == "change_type":
                        cols.append(
                            pa.array(["insert"] * n, type=pa.string())
                        )
                    elif (
                        name.startswith("new_")
                        and name[4:] in t.column_names
                    ):
                        cols.append(t.column(name[4:]).combine_chunks())
                    else:  # old_* and schema-evolved gaps: NULLs
                        cols.append(
                            pa.nulls(n, type=pa.type_for_alias(typ))
                        )
                    names.append(name)
            else:  # "data" rows, or "cdc" change files served verbatim
                for name, typ in partition.fields:
                    if name in t.column_names:
                        cols.append(t.column(name).combine_chunks())
                    else:  # schema-evolved older file: surface NULLs
                        cols.append(
                            pa.nulls(n, type=pa.type_for_alias(typ))
                        )
                    names.append(name)
            for batch in pa.table(cols, names=names).to_batches():
                yield batch

        def commit(self, end):
            # manifests are immutable — nothing to GC; track the
            # committed point so the rate limit advances from reality
            v = end["version"] if isinstance(end, dict) else -1
            if self._known is None or v > self._known:
                self._known = v

    class VersionedStreamSource(DataSource):
        """spark.readStream.format("versioned_stream").option("path", ...)"""

        @classmethod
        def name(cls) -> str:
            return "versioned_stream"

        def _fields(self):
            import pyarrow.parquet as pq

            path = self.options["path"]
            snap_dir = _os.path.join(path, "_snapshots")
            vs = sorted(
                int(f[1:-5])
                for f in _os.listdir(snap_dir)
                if f.startswith("v") and f.endswith(".json")
                and "checkpoint" not in f
            )
            if not vs:
                raise ValueError(f"no snapshots at {path}")
            # Column-mapping guard, authoritative WITHOUT importing the
            # engine package (this method can run inside Spark's
            # data-source plan worker, where only stdlib + this closure
            # are importable — the module's pickling posture). Protocol
            # invariant (versioned.py _commit_delta): once mapping
            # metadata exists, EVERY later manifest carries the
            # "schema" KEY (explicit null = a rollback downgrade), so
            # the newest manifest on the PARENT CHAIN bearing the key
            # is the mapping in force. The pre-r10 walk stopped at the
            # first add-bearing commit, letting a renamed-then-appended
            # table stream physical column names (ADVICE r9).
            v = vs[-1]
            while True:
                with open(_os.path.join(snap_dir, f"v{v:05d}.json")) as fh:
                    m = _json.load(fh)
                if "schema" in m:
                    if m["schema"]:
                        raise ValueError(
                            "versioned_stream does not support "
                            "column-mapped tables (files store "
                            "physical names)"
                        )
                    break  # explicit downgrade: identity mapping
                if "files" in m or m.get("parent") is None:
                    break  # base reached, no mapping ever set
                v = m["parent"]
            # resolve the LATEST add-bearing commit's first added file
            # (widest schema under additive evolution; metadata-only
            # commits add nothing)
            for v in reversed(vs):
                with open(_os.path.join(snap_dir, f"v{v:05d}.json")) as fh:
                    m = _json.load(fh)
                adds = m.get("add") or m.get("files") or []
                if adds:
                    rel = adds[0]
                    full = rel if _os.path.isabs(rel) else _os.path.join(path, rel)
                    sch = pq.read_schema(full)
                    return [(f.name, str(f.type)) for f in sch]
            raise ValueError(f"no data files at {path}")

        def _cdf(self) -> bool:
            return (
                str(self.options.get("readChangeFeed", "false")).lower()
                == "true"
            )

        def _feed_fields(self, data_fields: list) -> list:
            key = self.options.get("key")
            if not key:
                raise ValueError(
                    "readChangeFeed=true requires the 'key' option "
                    "(the table's unique merge key)"
                )
            ktype = dict(data_fields).get(key)
            if ktype is None:
                raise ValueError(f"key column {key!r} not in table schema")
            non_key = [(n, t) for n, t in data_fields if n != key]
            return (
                [(key, ktype), ("change_type", "string")]
                + [(f"old_{n}", t) for n, t in non_key]
                + [(f"new_{n}", t) for n, t in non_key]
            )

        def schema(self) -> str:
            fields = self._fields()
            if self._cdf():
                fields = self._feed_fields(fields)
            return ", ".join(
                f"{name} {_ARROW_DDL.get(typ, typ)}"
                for name, typ in fields
            )

        def streamReader(self, schema):
            data_fields = self._fields()
            fields = (
                self._feed_fields(data_fields) if self._cdf() else data_fields
            )
            return VersionedStreamReader(
                self.options, fields, data_fields=data_fields
            )

    return VersionedStreamSource
