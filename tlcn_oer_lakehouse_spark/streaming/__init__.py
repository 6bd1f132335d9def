"""Structured Streaming ingest + windowed aggregation.

The reference has NO streaming path (SURVEY §2.9) — its "streaming" is
scheduled batch MERGE.  This package adds the unified batch/streaming
capability: a file-source ingest that feeds the same MERGE sink the
batch path uses, and event-time window operators (tumbling / sliding /
session) whose batch-mode twins are oracle-verified in queries/windows.py.
"""
