"""CLI entry point: run any registered query against a data directory.

    python -m solace_apache_beam_spark --list
    python -m solace_apache_beam_spark QUERY [--sf-dir DIR] [--out PATH]
        [--cpus N] [--show N]
    python -m solace_apache_beam_spark --demo-stream [--cpus N]
    python -m solace_apache_beam_spark --demo-semantic [--cpus N]

Writes parquet when --out is given, otherwise prints the first --show
rows. The same registry the driver/bench use backs the CLI, so every
operator in COVERAGE.md is runnable from a shell. --demo-stream runs
the streaming surface end-to-end without any external broker: a
file-backed fake broker is populated, the "solace" DataSource reads
it, and the windowed wordcount plus the replay-exact sessionizer
(dedupe_by high-water marks, DELIVERY.md) print their results.
--demo-semantic runs the growing-corpus SEMANTIC dedup loop: vectors
stream from the fake broker in two microbatch epochs, each screened
against the persisted LSH vector index, and unique survivors join the
index — the exact and scaled copies in the last epoch match EARLIER
INCOMING vectors, not the base corpus, proving the index grew."""

from __future__ import annotations

import argparse
import sys


def _demo_stream(cpus: int) -> int:
    import tempfile

    from solace_apache_beam_spark.session import get_spark
    from solace_apache_beam_spark.sources import fake_broker
    from solace_apache_beam_spark.streaming.pipelines import (
        open_stream,
        windowed_word_count,
    )
    from solace_apache_beam_spark.streaming.stateful import sessionize

    base_us = 1_700_000_000_000_000
    work = tempfile.mkdtemp(prefix="solace_demo_")
    broker = f"{work}/broker"
    for q in ("orders", "clicks"):
        fake_broker.create_queue(broker, q)
    # two bursts >gap apart on each queue -> one closed session each
    fake_broker.publish(
        broker,
        "orders",
        ["alpha beta", "beta gamma", "alpha alpha"],
        sender_timestamp_us=[base_us, base_us + 1_000_000, base_us + 2_000_000],
    )
    fake_broker.publish(
        broker,
        "clicks",
        ["gamma delta", "delta"],
        sender_timestamp_us=[base_us + 5_000_000, base_us + 6_000_000],
    )
    for q in ("orders", "clicks"):
        fake_broker.publish(
            broker, q, ["closer"], sender_timestamp_us=[base_us + 600_000_000]
        )

    spark = get_spark("demo-stream", cpus=cpus)
    stream = open_stream(spark, broker, ["orders", "clicks"])
    wc = (
        windowed_word_count(stream)
        .writeStream.format("memory")
        .queryName("demo_wordcount")
        .outputMode("update")
        .option("checkpointLocation", f"{work}/cp_wc")
        .start()
    )
    sess = (
        sessionize(
            open_stream(spark, broker, ["orders", "clicks"]),
            gap_seconds=30,
            dedupe_by=("destination", "message_id"),
        )
        .writeStream.format("memory")
        .queryName("demo_sessions")
        .outputMode("append")
        .option("checkpointLocation", f"{work}/cp_sess")
        .start()
    )
    wc.processAllAvailable()
    sess.processAllAvailable()
    wc.stop()
    sess.stop()
    print("== windowed wordcount (10 s event-time windows) ==")
    spark.sql(
        "SELECT * FROM demo_wordcount ORDER BY window_start, word"
    ).show(50, truncate=False)
    print("== closed sessions (30 s gap, replay-exact via hwm map) ==")
    spark.sql(
        "SELECT * FROM demo_sessions ORDER BY key, session_start"
    ).show(50, truncate=False)
    print(f"broker + checkpoints under {work} (safe to delete)")
    return 0


def _demo_semantic(cpus: int) -> int:
    import tempfile

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from solace_apache_beam_spark.llm.similarity import build_vector_index
    from solace_apache_beam_spark.session import get_spark
    from solace_apache_beam_spark.sources import fake_broker
    from solace_apache_beam_spark.streaming.ingestion import (
        make_semantic_ingestion_screen,
    )
    from solace_apache_beam_spark.streaming.pipelines import open_stream

    def vec(slot: int, scale: float = 1.0) -> list:
        v = [0.0] * 16
        v[slot % 16] = scale
        return v

    work = tempfile.mkdtemp(prefix="solace_demo_sem_")
    broker = f"{work}/broker"
    fake_broker.create_queue(broker, "vectors")
    # 6 messages at max 3 records/batch = 2 epochs: epoch 0 = one base
    # dup + two fresh; epoch 1 = one fresh, an EXACT copy of epoch-0's
    # 101, and a SCALED copy of epoch-0's 102 (cosine match, not
    # equality) — both resolve against the GROWN index
    msgs = [
        (100, vec(2)),         # dup of base slot 2
        (101, vec(8)),         # unique
        (102, vec(9)),         # unique
        (103, vec(10)),        # unique
        (101_0, vec(8)),       # exact copy of INCOMING 101 -> grown hit
        (104, vec(9, 0.5)),    # scaled copy of INCOMING 102 -> grown hit
    ]
    fake_broker.publish(
        broker,
        "vectors",
        [f"{i}|" + ",".join(str(x) for x in v) for i, v in msgs],
    )

    spark = get_spark("demo-semantic", cpus=cpus)
    base = build_vector_index(
        spark.createDataFrame(
            [Row(doc_id=c, embedding=vec(c)) for c in range(8)]
        ),
        "embedding",
        "doc_id",
        n_planes=4,
        n_tables=2,
    )
    screen = make_semantic_ingestion_screen(
        spark,
        base,
        f"{work}/status",
        f"{work}/grown",
        f"{work}/book",
        doc_col="doc_id",
        vec_col="embedding",
        threshold=0.4,
        n_planes=4,
        n_tables=2,
    )
    body = F.split("payload", "\\|", 2).getItem(1)
    stream = open_stream(
        spark, broker, ["vectors"], max_records_per_batch=3
    ).select(
        "destination",
        "message_id",
        F.split("payload", "\\|", 2).getItem(0).cast("long").alias("doc_id"),
        F.transform(F.split(body, ","), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    q = (
        stream.writeStream.foreachBatch(screen)
        .option("checkpointLocation", f"{work}/cp")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    print("== semantic ingestion statuses (grown-index matches have ==")
    print("== match_id >= 100: the loop dedups against ITS OWN keeps) ==")
    spark.read.parquet(f"{work}/status").orderBy("doc_id").show(
        20, truncate=False
    )
    print(f"broker + index + checkpoints under {work} (safe to delete)")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="solace_apache_beam_spark", description=__doc__
    )
    parser.add_argument("query", nargs="?", help="registered query name")
    parser.add_argument("--list", action="store_true", help="list queries and exit")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--out", default=None, help="write result parquet here")
    parser.add_argument("--cpus", type=int, default=8)
    parser.add_argument("--show", type=int, default=20)
    parser.add_argument(
        "--demo-stream",
        action="store_true",
        help="run the broker->source->stateful streaming demo and exit",
    )
    parser.add_argument(
        "--demo-semantic",
        action="store_true",
        help="run the growing-corpus semantic dedup loop demo and exit",
    )
    args = parser.parse_args(argv)

    if args.demo_stream:
        return _demo_stream(args.cpus)
    if args.demo_semantic:
        return _demo_semantic(args.cpus)

    from solace_apache_beam_spark.registry import all_queries

    queries = all_queries()
    if args.list or not args.query:
        for name in sorted(queries):
            print(name)
        return 0
    if args.query not in queries:
        print(f"unknown query: {args.query} (use --list)", file=sys.stderr)
        return 2

    from solace_apache_beam_spark.session import get_spark

    spark = get_spark("cli", cpus=args.cpus)
    df = queries[args.query](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
