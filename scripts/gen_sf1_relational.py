"""Build an sf1.0-equivalent bench dataset (VERDICT r7 Next #5: one
sf1.0 evidence row for the relational family — the LLM family already
has 100x/1000x stress coverage).

No network and no driver generator at sf1.0, so the relational tables
are TILED from the driver's sf0.1 data: 10 replicas with consistent
key offsets on every primary/foreign key, preserving referential
integrity, per-key group sizes, value distributions, and skew shape —
exactly the properties the relational plans are sensitive to
(join/agg key cardinality grows 10x, rows per key stay constant,
nation/region stay fixed like real TPC-H). events tiles event_id and
user_id (10x users, identical per-user event history — funnel/session/
as-of structure is preserved per user).

documents/embeddings are NOT tiled (verbatim replicas would create
10x-inflated near-dup cliques and quadratic pair blowup that measures
the tiling, not the operator): they hard-link from the 10x LLM stress
corpus (scripts/gen_stress_llm.py SEED_FACTOR=1 — fresh Zipf seeds at
10x sf0.1 rows with the same clique discipline), which must exist.

    python scripts/gen_sf1_relational.py /tmp/sf1.0 [/tmp/stress10x_llm]
"""
from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# table -> {column: stride} (stride = sf0.1 key-space size; keys are
# dense 0-based in the driver data, verified before writing this)
KEYED = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
}
COPY = ("region", "nation")
LINKED = ("documents", "embeddings")


def tile(name: str, offsets: dict, out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    for col, stride in offsets.items():
        mx = pc.max(t[col]).as_py()
        assert mx < stride, f"{name}.{col} max {mx} >= stride {stride}"
    parts = []
    for r in range(REPLICAS):
        rep = t
        for col, stride in offsets.items():
            i = rep.schema.get_field_index(col)
            shifted = pc.add(rep[col], pa.scalar(r * stride, rep.schema.field(i).type))
            rep = rep.set_column(i, rep.schema.field(i), shifted)
        parts.append(rep)
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(out_dir, f"{name}.parquet"))
    print(name, t.num_rows, "->", out.num_rows, flush=True)


def _link_or_copy(src: str, dst: str) -> None:
    # hard link when src/dst share a filesystem (free); copy across
    # devices (e.g. tmpfs /tmp) instead of dying on EXDEV. The copy
    # also avoids shared-inode aliasing on the cross-device path.
    # Always rebuild dst (ADVICE r8): tile() rewrites keyed tables on
    # every run, so skipping an existing linked table would silently
    # mix dataset vintages after the LLM stress corpus is regenerated.
    if os.path.exists(dst):
        os.unlink(dst)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    llm_src = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress10x_llm"
    os.makedirs(out_dir, exist_ok=True)
    for name in COPY:
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        _link_or_copy(src, dst)
        print(name, "linked", flush=True)
    for name, offsets in KEYED.items():
        tile(name, offsets, out_dir)
    for name in LINKED:
        src = os.path.join(llm_src, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(src):
            raise SystemExit(
                f"missing {src}: run scripts/gen_stress_llm.py {llm_src} 1 first"
            )
        _link_or_copy(src, dst)
        print(name, "linked from", llm_src, flush=True)


if __name__ == "__main__":
    main()
