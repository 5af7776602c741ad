"""Streaming observability: the reader-stats surfacing path
(SolaceReaderStats S14 → Spark's StreamingQueryListener + df.observe).

The reference dumps per-reader counters as JSON every 120 s of advance
time (SolaceReaderStats.java:137-155). The Spark-native equivalents:

- the source's own counters land in ``<broker>/.reader_stats.json``
  per plan/commit (sources/solace.py);
- per-batch engine metrics (rows, duration, state rows, watermark) and
  ``df.observe`` aggregates arrive through StreamingQueryListener
  progress events — this module collects them into plain dicts so
  pipelines/tests can assert on them.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class ProgressCollector(StreamingQueryListener):
    """Collects one record per finished microbatch:
    (query name, batch id, input rows, observed-metric dicts)."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.batches.append(
            {
                "name": p.name,
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "observed": {
                    k: v.asDict() for k, v in (p.observedMetrics or {}).items()
                },
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def totals(self, name: str, gauges: frozenset | set | tuple = ()) -> dict:
        """Aggregate view for one query: total input rows + observed
        metrics combined across microbatches by their declared
        semantics. Numeric metrics are SUMMED by default — the right
        fold for monotone per-batch counters (df.observe aggregates are
        per-batch; last-wins would undercount a counter whose events
        span batches). Metrics named in ``gauges`` — either by bare key
        (``"backlog"``) or qualified by observation name
        (``"my_obs.backlog"``) — keep the LAST batch's value instead:
        summing a current-size / per-run-total gauge across batches
        silently inflates it. Non-numeric values always keep the
        latest. Only monotone counters should be observed undeclared."""
        gauges = set(gauges)
        rows = [b for b in self.batches if b["name"] == name]
        observed: dict = {}
        for b in rows:
            for obs_name, metrics in b["observed"].items():
                acc = observed.setdefault(obs_name, {})
                for k, v in metrics.items():
                    is_gauge = k in gauges or f"{obs_name}.{k}" in gauges
                    # bools are EXCLUDED from summing (isinstance(True,
                    # int) is True): a flag like max(x IS NULL) must
                    # keep the latest value, not accumulate to an int
                    if (
                        not is_gauge
                        and isinstance(v, (int, float))
                        and not isinstance(v, bool)
                        and isinstance(acc.get(k), (int, float))
                        and not isinstance(acc.get(k), bool)
                    ):
                        acc[k] = acc[k] + v
                    else:
                        acc[k] = v
        return {
            "num_input_rows": sum(b["num_input_rows"] for b in rows),
            "observed": observed,
        }
