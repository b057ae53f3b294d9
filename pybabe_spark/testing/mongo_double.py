"""In-memory Mongo contract double — a real Python DataSource V2.

Registers under the format name ``mongodb`` (the same name the official
mongo-spark-connector uses), so ``pull_mongo`` / ``push_mongo``
(pybabe_spark/sources/connectors.py) execute their FULL contract —
``spec`` → ``$match`` server-side filtering, partitioned reads,
``id_col`` → ``_id`` mapping, ``drop_collection`` → overwrite — against
an in-memory store, with no Mongo server, network, or jar. Reference
semantics anchor: pybabe/mongo.py:5-56.

Usage (per session)::

    from pybabe_spark.testing.mongo_double import MongoDouble, STORE
    spark.dataSource.register(MongoDouble)
    STORE[("db", "coll")] = [{"_id": 1, "name": "a"}, ...]

Execution shape mirrors a real V2 connector: the reader captures the
``$match``-filtered records at PLAN time on the driver (shipped with
the pickled partitions, like a connector pushing the filter to the
server before splitting); the writer collects each task's rows into a
picklable commit message and the driver-side ``commit()`` applies them
atomically — overwrite replaces the collection, append extends it.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import MutableMapping
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType


class _FileStore(MutableMapping):
    """{(database, collection): [record dicts]} persisted to one JSON
    file. Python DataSource hooks (schema/reader/writer-commit) execute
    in separate Python worker processes, so the store cannot live in
    this module's memory — a file is the lightest cross-process state
    that keeps the double dependency-free."""

    def __init__(self, path: str | None = None):
        # PYBABE_MONGO_DOUBLE_PATH isolates parallel test runs
        # (pytest-xdist, concurrent CI jobs) that would otherwise share
        # the per-uid default and see each other's stale collections
        self.path = path or os.environ.get(
            "PYBABE_MONGO_DOUBLE_PATH"
        ) or os.path.join(
            tempfile.gettempdir(),
            f"pybabe_mongo_double_{os.getuid()}.json",
        )

    def _load(self) -> dict[tuple[str, str], list[dict]]:
        try:
            with open(self.path, encoding="utf-8") as f:
                raw = json.load(f)
        except (OSError, ValueError):
            return {}
        return {tuple(k.split("\x00", 1)): v for k, v in raw.items()}

    def _save(self, data: dict) -> None:
        # write-temp + atomic rename: Spark's Python worker processes
        # read this file concurrently with the test process's writes — a
        # reader must never observe a truncated in-place write (which
        # _load would silently turn into an empty store, and a later
        # save would then persist, dropping collections)
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(self.path) or ".", suffix=".tmp"
        )
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump({"\x00".join(k): v for k, v in data.items()}, f)
            os.replace(tmp, self.path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    def __getitem__(self, key):
        return self._load()[key]

    def __setitem__(self, key, value):
        data = self._load()
        data[key] = value
        self._save(data)

    def __delitem__(self, key):
        data = self._load()
        del data[key]
        self._save(data)

    def __iter__(self):
        return iter(self._load())

    def __len__(self):
        return len(self._load())


#: collection store shared across the test process and the DataSource's
#: worker processes
STORE = _FileStore()

_OPS = {
    "$gt": lambda a, b: a is not None and a > b,
    "$gte": lambda a, b: a is not None and a >= b,
    "$lt": lambda a, b: a is not None and a < b,
    "$lte": lambda a, b: a is not None and a <= b,
    "$ne": lambda a, b: a != b,
    "$in": lambda a, b: a in b,
}


def _matches(rec: dict, spec: dict) -> bool:
    """The ``$match`` subset the connector contract exercises: field
    equality plus {$gt,$gte,$lt,$lte,$ne,$in} comparison operators."""
    for field, cond in spec.items():
        val = rec.get(field)
        if isinstance(cond, dict):
            for op, arg in cond.items():
                if op not in _OPS:
                    raise ValueError(f"mongo double: unsupported op {op}")
                if not _OPS[op](val, arg):
                    return False
        elif val != cond:
            return False
    return True


_PY_DDL = {int: "bigint", float: "double", bool: "boolean", str: "string"}


def _infer_ddl(records: list[dict]) -> str:
    """Schema from the union of record keys, first-seen order, simple
    scalar mapping — the double's analog of connector schema inference."""
    fields: dict[str, str] = {}
    null_only: set[str] = set()  # "string" placeholder from nulls only
    for rec in records:
        for k, v in rec.items():
            if v is None:
                if k not in fields:
                    fields[k] = "string"
                    null_only.add(k)
            elif k not in fields or k in null_only:
                fields[k] = _PY_DDL.get(type(v), "string")
                null_only.discard(k)
    if not fields:
        fields = {"_id": "bigint"}
    return ", ".join(f"`{k}` {t}" for k, t in fields.items())


class _Partition(InputPartition):
    def __init__(self, records: list[dict]):
        self.records = records


class _Reader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        db = options.get("database")
        coll = options.get("collection")
        records = list(STORE.get((db, coll), []))
        pipeline = options.get("aggregation.pipeline")
        if pipeline:
            for stage in json.loads(pipeline):
                if "$match" in stage:
                    records = [
                        r for r in records if _matches(r, stage["$match"])
                    ]
                else:
                    raise ValueError(
                        f"mongo double: unsupported pipeline stage {stage}"
                    )
        self._schema = schema
        # two partitions proves the partitioned-read path without
        # pretending to be a partitioner
        mid = (len(records) + 1) // 2
        self._parts = [_Partition(records[:mid]), _Partition(records[mid:])]

    def partitions(self) -> list[InputPartition]:
        return self._parts

    def read(self, partition: _Partition) -> Iterator[tuple]:
        names = self._schema.fieldNames()
        for rec in partition.records:
            yield tuple(rec.get(n) for n in names)


class _Commit(WriterCommitMessage):
    def __init__(self, rows: list[dict]):
        self.rows = rows


class _Writer(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self._db = options.get("database")
        self._coll = options.get("collection")
        self._overwrite = overwrite

    def write(self, iterator: Iterator[Row]) -> _Commit:
        return _Commit([row.asDict() for row in iterator])

    def commit(self, messages) -> None:
        rows = [r for m in messages if m is not None for r in m.rows]
        key = (self._db, self._coll)
        if self._overwrite:
            STORE[key] = rows
        else:
            STORE[key] = list(STORE.get(key, [])) + rows


class MongoDouble(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mongodb"

    def schema(self) -> str:
        db = self.options.get("database")
        coll = self.options.get("collection")
        return _infer_ddl(STORE.get((db, coll), []))

    def reader(self, schema: StructType) -> _Reader:
        return _Reader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> _Writer:
        return _Writer(self.options, overwrite)
