"""End-to-end medallion pipelines (bronze → silver → gold)."""
