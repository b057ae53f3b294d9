#!/usr/bin/env python
"""Word count — the reference's flagship example
(pybabe examples/wordcount.py:7-11), Spark-first.

The reference pulls an RFC over HTTP, flatMaps to (word, 1), reduces,
and prints the top 10. Same chain here; the source defaults to the
local testdata documents table so the example runs offline (pass a URL
to pull any remote text file, e.g. https://www.ietf.org/rfc/rfc1149.txt).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from pybabe_spark import Babe, get_spark


def wordcount(source: str | None = None):
    spark = get_spark("wordcount")
    if source:
        a = Babe.pull(spark, source, format="txt")
    else:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = Babe.from_df(docs.select(F.col("text")))
    (
        a.split("text", " ")
        .groupBy("text", {"count": ("count", "text")})
        .maxN("count", 10)
        .push("/tmp/wordcount_top10.csv", single_file=True)
    )
    print(open_csv("/tmp/wordcount_top10.csv"))


def open_csv(path: str) -> str:
    import glob
    import os

    part = sorted(glob.glob(os.path.join(path, "part-*")))[0]
    return open(part).read()


if __name__ == "__main__":
    wordcount(sys.argv[1] if len(sys.argv) > 1 else None)
