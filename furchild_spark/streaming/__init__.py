"""Structured Streaming layer: continuous bronze ingest + windowed rollups
sharing the batch engine's merge materializer (see ingest.py)."""
