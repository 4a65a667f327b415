"""Structured Streaming query catalog (SURVEY.md section 2b M7):
kafka->s3 pipeline, event-time windows, streaming dedup, late data.

Filled in milestone M7."""

from __future__ import annotations
