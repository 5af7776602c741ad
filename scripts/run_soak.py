"""Streaming soak: drain N messages across K queues through the
windowed word-count pipeline and report sustained throughput plus full
delivery accounting.

The committed throughput contract is the >=1,000 msg/s floor test
(tests/test_streaming_source.py::test_streaming_throughput_floor); this
script is the heavier, re-runnable version of the round-3 ad-hoc soak
recorded in BASELINE.md — 100k messages, 4 queues, one JVM, local[32].

    python scripts/run_soak.py [n_messages] [n_queues]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solace_apache_beam_spark.session import get_spark
from solace_apache_beam_spark.sources import fake_broker
from solace_apache_beam_spark.streaming.pipelines import (
    open_stream,
    windowed_word_count,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    queues = [f"q{i}" for i in range(1, k + 1)]
    per_q = n // k

    work = tempfile.mkdtemp(prefix="soak_")
    broker = os.path.join(work, "broker")
    for q in queues:
        fake_broker.create_queue(broker, q)
        fake_broker.publish(
            broker, q, [f"tok{i % 97} {q} msg {i}" for i in range(per_q)]
        )

    spark = get_spark("soak")
    stream = open_stream(spark, broker, queues)
    query = (
        windowed_word_count(stream)
        .writeStream.format("memory")
        .queryName("soak")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work, "cp"))
        .start()
    )
    t0 = time.monotonic()
    query.processAllAvailable()
    elapsed = time.monotonic() - t0
    query.stop()

    consumed = sum(fake_broker.delivered_watermark(broker, q) for q in queues)
    leaked = len(spark.sparkContext._jsc.getPersistentRDDs())
    out = {
        "messages": per_q * k,
        "queues": k,
        "drain_s": round(elapsed, 2),
        "msg_per_s": round(per_q * k / elapsed),
        "consumed": consumed,
        "cached_rdds_at_shutdown": leaked,
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
