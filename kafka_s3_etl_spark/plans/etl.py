"""Reference-parity ETL query catalog (SURVEY.md section 2b M6):
Kafka value serialization, CSV ingest semantics, JSON->XML rendering.

Filled in milestone M6."""

from __future__ import annotations
