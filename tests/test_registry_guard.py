"""Registry rotation-list guard (round-7 self-review fix #4): a typo in
`_PRIORITY` must fail LOUDLY — `_ordered` would otherwise silently drop
the name, the query would fall to tail enumeration order, and its
driver gate row would silently go stale past the ~50-query snapshot
cutoff."""

from __future__ import annotations

import pytest


def test_priority_names_all_registered():
    from solace_apache_beam_spark import registry

    qs = registry.all_queries()  # must not raise
    assert set(registry._PRIORITY) <= set(qs)
    # rotation names enumerate first, in order
    assert list(qs)[: len(registry._PRIORITY)] == list(registry._PRIORITY)


def test_priority_typo_fails_loudly(monkeypatch):
    from solace_apache_beam_spark import registry

    monkeypatch.setattr(
        registry, "_PRIORITY", registry._PRIORITY + ("no_such_query_typo",)
    )
    # explicit RuntimeError, not assert: python -O strips asserts,
    # which would silently restore the failure this guards against
    with pytest.raises(RuntimeError, match="no_such_query_typo"):
        registry.all_queries()
