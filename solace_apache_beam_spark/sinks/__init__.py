"""Sinks (SURVEY.md §2.6): windowed-file text sink, warehouse append,
console/log."""
