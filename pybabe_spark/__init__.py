"""pybabe_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of fdouetteau/PyBabe.

Reference semantics (cited as ``pybabe/<file>:<lines>`` in docstrings) are
re-expressed Spark-first: the DataFrame/Catalyst plan is the IR; operators
are thin compositions of built-in functions, with Pandas-UDF escape hatches
only where built-ins genuinely cannot express the semantics.

Public surface:

- :class:`pybabe_spark.plans.facade.Babe` — fluent facade mirroring
  ``Babe().pull(...).op(...).push(...)`` chains.
- :mod:`pybabe_spark.operators` — operator functions over DataFrames.
- :mod:`pybabe_spark.sources` — pull/push format+protocol dispatch.
- :mod:`pybabe_spark.functions` — scalar enrichment (time, text, geo, UA).
- :mod:`pybabe_spark.streaming` — Structured Streaming extensions.
"""

from pybabe_spark.session import get_spark
from pybabe_spark.plans.facade import Babe

__all__ = ["Babe", "get_spark"]
__version__ = "0.6.0"
