"""Custom PySpark DataSource (Spark 4 Python Data Source API).

`SynthDocsDataSource` is a deterministic synthetic-corpus source: given
``n`` (doc count) and ``parts`` (split count), it generates documents
whose words are md5-derived from (doc_id, word_idx) — so the exact
same rows can be replayed by a DuckDB oracle from generate_series +
md5, giving the custom-source plumbing a hash-exact correctness gate.

Why this exists: the reference ingests from an external SaaS API
(Google Sheets, /root/reference/main.py:96-117) — the general problem
is "a source Spark has no built-in connector for". The Spark-4-native
answer is the Python Data Source API: declare schema + partitions,
and each executor pulls only its split (here: a doc_id range; in a
real connector: a page/offset range of the remote API). Partitions are
the unit of parallelism and retry, exactly like an InputSplit of a
file source. Rows cross into the JVM via Arrow batches.

This is an integration-boundary API, not a throughput path — bulk data
should land in parquet/JSONL and use the native scans (io/readers.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

try:  # Spark >= 4.0
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        DataSourceStreamReader,
                                        InputPartition)
    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older Spark
    HAVE_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options=None):
            self.options = options or {}

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class DataSourceStreamReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value

SYNTHDOCS_SCHEMA = "doc_id BIGINT, n_words INT, text STRING"

# Word length (md5 hex prefix) and words-per-doc band. A doc's word
# count is 5 + (h48(doc_id) % 20) — deterministic and size-skewed
# enough to exercise uneven partitions.
WORD_HEX = 6
WORDS_MIN, WORDS_MOD = 5, 20


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def synth_doc(doc_id: int) -> tuple[int, int, str]:
    """The generator contract, shared by the executor-side reader and
    the test suite: words are 6-hex-char md5 prefixes of 'doc_id:i'."""
    n_words = WORDS_MIN + _h48(str(doc_id)) % WORDS_MOD
    words = (hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:WORD_HEX]
             for i in range(n_words))
    return doc_id, n_words, " ".join(words)


def synthdocs_oracle_sql(n: int) -> str:
    """DuckDB SQL generating the identical rows (bit-exact md5s)."""
    return f"""
    SELECT doc_id,
           CAST({WORDS_MIN} + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                              1, 12))::BIGINT
                               % {WORDS_MOD} AS INT) AS n_words,
           array_to_string(
               list_transform(
                   generate_series(
                       0, {WORDS_MIN - 1}
                          + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 12))::BIGINT % {WORDS_MOD}),
                   i -> substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                   || CAST(i AS VARCHAR)), 1, {WORD_HEX})),
               ' ') AS text
    FROM generate_series(0, {n - 1}) t(doc_id)
    """


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        """Contiguous doc_id ranges — each executor generates only its
        slice, no driver-side materialization (the same split scheme a
        paged-API connector uses with page offsets)."""
        per = max(1, -(-self.n // self.parts))  # ceil
        return [_RangePartition(lo, min(lo + per, self.n))
                for lo in range(0, self.n, per)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield synth_doc(doc_id)


class SynthDocsStreamReader(DataSourceStreamReader):
    """Micro-batch streaming reader over the same synthetic corpus:
    the offset is simply the next unread doc_id, serialized as a dict
    per the API's JSON-offset contract. Each latestOffset() call
    advances availability by ``batch_rows`` docs (so a bounded corpus
    drains over ceil(n/batch_rows) micro-batches — the shape a paged
    API or a Kafka topic with a rate limit produces), and
    partitions(start, end) splits each micro-batch's range exactly
    like the batch reader splits the whole corpus. Offsets make the
    source replayable: a restarted query re-requests the same
    [start, end) range and gets identical rows."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))
        self.batch_rows = int(options.get("batch_rows", max(1, self.n // 4)))
        self._available = 0

    def initialOffset(self) -> dict:
        return {"next_doc": 0}

    def latestOffset(self) -> dict:
        self._available = min(self._available + self.batch_rows, self.n)
        return {"next_doc": self._available}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["next_doc"], end["next_doc"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        per = max(1, -(-(hi - lo) // self.parts))
        return [_RangePartition(a, min(a + per, hi))
                for a in range(lo, hi, per)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield synth_doc(doc_id)

    def commit(self, end: dict) -> None:
        pass  # nothing to release; offsets are pure arithmetic


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SYNTHDOCS_SCHEMA

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def streamReader(self, schema) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(self.options)


def register_synthdocs(spark) -> bool:
    """Register the source on a session (idempotent). Returns False on
    Sparks predating the Python Data Source API."""
    if not HAVE_DATASOURCE_API:
        return False
    spark.dataSource.register(SynthDocsDataSource)
    return True


# --------------------------------------------------------------------------
# Writer side: a JSONL directory sink with two-phase (task/driver) commit
# --------------------------------------------------------------------------

try:  # Spark >= 4.0
    from pyspark.sql.datasource import (DataSourceStreamWriter,
                                        DataSourceWriter,
                                        WriterCommitMessage)
except ImportError:  # pragma: no cover - older Spark
    class DataSourceWriter:  # type: ignore[no-redef]
        pass

    class DataSourceStreamWriter:  # type: ignore[no-redef]
        pass

    class WriterCommitMessage:  # type: ignore[no-redef]
        pass


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path, self.n_rows = path, n_rows


class JsonlSinkWriter(DataSourceWriter):
    """Executor-side writer: each task streams its partition's rows to
    a private ``part-<task-attempt>.jsonl`` file and reports it in a
    commit message. The driver's commit() publishes a ``_SUCCESS``
    manifest naming every committed file — readers that honor the
    manifest never see output from failed/speculative attempts, which
    is exactly the two-phase commit contract file committers implement.
    abort() removes the orphan files."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires a 'path' option")

    def write(self, iterator) -> "_JsonlCommit":
        import json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        fname = os.path.join(
            self.path, f"part-{ctx.partitionId()}-{ctx.taskAttemptId()}.jsonl")
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(fname, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages) -> None:
        import json
        import os

        manifest = {
            "files": sorted(os.path.basename(m.path) for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming flavor: same per-task part files, but commit() runs
    once per micro-batch and publishes ``_SUCCESS-<batchId>`` naming
    that epoch's files. A restarted query that replays batch N
    re-commits the same manifest name, so readers keyed on the
    manifests see each epoch exactly once — the same batch_id-keyed
    idempotence contract as the foreachBatch parquet sink
    (streaming/events.py), implemented inside the connector."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires a 'path' option")

    def write(self, iterator) -> "_JsonlCommit":
        import json
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        fname = os.path.join(
            self.path,
            f"part-{ctx.partitionId()}-{uuid.uuid4().hex[:12]}.jsonl")
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(fname, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        manifest = {
            "batch_id": batchId,
            "files": sorted(os.path.basename(m.path)
                            for m in messages if m is not None),
            "n_rows": sum(m.n_rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, f"_SUCCESS-{batchId}"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.path)
            except OSError:
                pass


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonlsink").option("path", dir).save()`` —
    the write-side counterpart of SynthDocsDataSource, completing the
    custom-connector surface (batch read / stream read / batch write).
    In a real connector write() would POST its partition to the remote
    API and commit() would finalize the upload session."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def schema(self) -> str:  # pragma: no cover - required by ABC
        return SYNTHDOCS_SCHEMA

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> JsonlStreamWriter:
        return JsonlStreamWriter(self.options)


def register_jsonlsink(spark) -> bool:
    if not HAVE_DATASOURCE_API:
        return False
    spark.dataSource.register(JsonlSinkDataSource)
    return True
