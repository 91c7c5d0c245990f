"""Custom source + sink via Spark 4's Python DataSource API.

Two halves, both registered under short names with
``spark.dataSource.register``:

- ``synthdocs`` (reader): a deterministic generator of the interleaved
  (doc_id, spans) corpus shape — every document derives closed-form
  from md5(doc_id), so partition P can generate ITS id-range without
  touching any other partition's state (per-partition independence is
  what makes a generating source scale: 1000 executors each emit
  their slice with zero coordination, the same property the bench's
  crossJoin amplifier exploits).  ``partitions()`` returns one
  ``InputPartition`` per id-range; ``read()`` yields Arrow
  RecordBatches (the vectorized path — tuples-per-row would bounce
  through pickle row by row).
- ``jsonlsink`` (writer): a commit-protocol JSONL sink.  Each task
  writes ``part-<uuid>.jsonl.tmp`` and returns the name in its
  WriterCommitMessage; ``commit()`` renames the listed files into
  place and writes ``_SUCCESS`` — so a failed/speculative task's
  orphan .tmp is never visible (exactly the manifest discipline of
  sources/checkpoint.py, scaled down).

Cited reference behavior: the reference reads fixture PDFs from disk
and enqueues jobs (mimeograph.coffee:131-165); a self-describing
generating source replaces its fixture loader for tests/benches, and
the sink mirrors its atomic output contract.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SYNTH_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)

_WORDS = (
    "spark", "window", "vector", "batch", "merge", "scan", "join",
    "table", "stream", "filter",
)


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def synth_doc(i: int) -> dict:
    """Closed-form document i: 1-4 spans, ~1/3 media, text from the
    fixed word list — pure function of i (no RNG state to thread)."""
    doc_id = f"{i:010d}"
    spans = []
    for k in range(1 + _h(f"{i}:ns") % 4):
        if _h(f"{i}:{k}:kind") % 3 == 0:
            spans.append(
                {
                    "kind": "media",
                    "text": None,
                    "media_ref": f"m:{_h(f'{i}:{k}:ref'):08x}",
                    "offset": k,
                }
            )
        else:
            words = [
                _WORDS[_h(f"{i}:{k}:{j}") % len(_WORDS)]
                for j in range(3 + _h(f"{i}:{k}:nw") % 5)
            ]
            spans.append(
                {
                    "kind": "text",
                    "text": " ".join(words),
                    "media_ref": None,
                    "offset": k,
                }
            )
    return {"doc_id": doc_id, "spans": spans}


@dataclass
class _IdRange(InputPartition):
    start: int
    end: int


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = max(1, int(options.get("n_parts", 8)))

    def partitions(self):
        chunk = -(-self.n_docs // self.n_parts)  # ceil-div
        return [
            _IdRange(start=s, end=min(s + chunk, self.n_docs))
            for s in range(0, self.n_docs, chunk)
        ]

    def read(self, partition: _IdRange):
        import pyarrow as pa

        span_t = pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
        rows = [synth_doc(i) for i in range(partition.start, partition.end)]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([r["doc_id"] for r in rows], pa.string()),
                pa.array([r["spans"] for r in rows], pa.list_(span_t)),
            ],
            names=["doc_id", "spans"],
        )


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SynthDocsReader(self.options)


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_name: str
    rows: int


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool = False):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> _FileCommit:
        os.makedirs(self.path, exist_ok=True)
        tmp = f"part-{uuid.uuid4().hex}.jsonl.tmp"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(recursive=True)) + "\n")
                n += 1
        return _FileCommit(tmp_name=tmp, rows=n)

    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)
        # rename the NEW parts into place FIRST (uuid names, so they
        # can never collide with the old set), and only then delete
        # old committed files not in the new set: a crash anywhere in
        # commit() leaves at least one full generation readable —
        # delete-first had a window with zero readable data.  Old-data
        # purity (a failed job leaves the previous output untouched)
        # still holds: tasks only ever write .tmp names, and nothing
        # is renamed before the job-level commit is entered.
        total = 0
        new_names = set()
        for m in messages:
            if m is None:
                continue
            final = m.tmp_name[: -len(".tmp")]
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, final),
            )
            new_names.add(final)
            total += m.rows
        if self.overwrite:
            for name in os.listdir(self.path):
                if (
                    name.endswith(".jsonl")
                    and name.startswith("part-")
                    and name not in new_names
                ):
                    os.unlink(os.path.join(self.path, name))
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(json.dumps({"rows": total}))

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.unlink(os.path.join(self.path, m.tmp_name))
            except FileNotFoundError:
                pass


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return JsonlSinkWriter(self.options, overwrite=overwrite)


def register(spark) -> None:
    """Register both data sources on the session (idempotent)."""
    spark.dataSource.register(SynthDocsDataSource)
    spark.dataSource.register(JsonlSinkDataSource)
