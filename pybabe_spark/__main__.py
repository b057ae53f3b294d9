"""CLI: one-shot pull → push format conversion.

Parity with the reference's module entrypoint (pybabe/__main__.py:6-14:
``pull(--input) .push(--output)``), plus the obvious extras a Spark
engine makes free (format/separator overrides, partitioned output).

    python -m pybabe_spark --input data.csv.gz --output out.parquet
    python -m pybabe_spark --input logs/*.tsv --output by_day/ \
        --partition-by day
"""

from __future__ import annotations

import argparse
from typing import Sequence


def main(argv: Sequence[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="pybabe_spark")
    parser.add_argument("--input", required=True, help="input path/glob/URI")
    parser.add_argument("--output", required=True, help="output path")
    parser.add_argument("--input-format", default=None)
    parser.add_argument("--output-format", default=None)
    parser.add_argument("--separator", default=None)
    parser.add_argument("--no-header", action="store_true")
    parser.add_argument("--partition-by", nargs="*", default=None)
    parser.add_argument("--master", default="local[*]")
    args = parser.parse_args(argv)

    from pybabe_spark.session import get_spark
    from pybabe_spark.sources.io import pull, push

    spark = get_spark("pybabe_spark-cli", master=args.master)
    df = pull(
        spark,
        args.input,
        format=args.input_format,
        separator=args.separator,
        header=not args.no_header,
    )
    push(
        df,
        args.output,
        format=args.output_format,
        partition_by=args.partition_by,
    )


if __name__ == "__main__":
    main()
