"""Structured Streaming surface. The reference has NO streaming (SURVEY.md
§2.7); this layer exposes the engine's operators on streams — windowed
aggregation with watermarks, streaming dedup, streaming upsert — as the
natural extension of the same capability surface."""
