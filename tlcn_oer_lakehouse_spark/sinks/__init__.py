"""Sinks: physical write paths (merge tables, export formats)."""
