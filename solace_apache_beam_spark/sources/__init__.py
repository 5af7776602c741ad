"""Sources: the custom "solace"-shaped streaming/batch DataSource and
its replayable file-backed test broker (no real Solace in the sandbox —
SURVEY.md §7 M2)."""
