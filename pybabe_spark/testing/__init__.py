"""Contract doubles for external services (test/laptop use).

Production connectors (``pybabe_spark.sources.connectors``) target real
cluster-deployed services; the doubles here execute the same connector
contracts in-memory so the wiring — option plumbing, pushdown,
write-commit protocol — runs end-to-end without network or jars.
"""
