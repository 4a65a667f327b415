"""LLM-data-pipeline query catalog (SURVEY.md section 2b M8): dedup,
similarity search, text analysis, multimodal plumbing, UDF surface.

Filled in milestone M8."""

from __future__ import annotations
