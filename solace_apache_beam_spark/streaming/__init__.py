"""Streaming pipelines: the sample pipelines of the reference expressed
as Structured Streaming jobs over the "solace" source (SURVEY.md §3)."""
