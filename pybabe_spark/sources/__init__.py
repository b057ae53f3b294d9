from pybabe_spark.sources.io import (
    INGEST_ID,
    guess_format,
    pull,
    push,
    read_table,
    with_ingest_id,
)

__all__ = [
    "INGEST_ID",
    "guess_format",
    "pull",
    "push",
    "read_table",
    "with_ingest_id",
]
