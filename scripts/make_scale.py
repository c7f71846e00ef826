#!/usr/bin/env python3
"""Deterministic sfN scale-up of the driver's sf0.1 testdata (builder-side
validation tooling; NOT part of the Spark library). Generalizes
make_sf1.py — same replication scheme, parameterized factor:

  python3 scripts/make_scale.py <factor> [dst_dir] [table,table,...]

The optional third arg restricts generation to the named tables (e.g.
`events` alone for the billion-row event-family probe, where the other
tables would waste disk).

factor 10 reproduces make_sf1.py's output exactly (same replica counts,
same offsets, same ORDER BY); factor 100 builds an sf10-equivalent
(100x the driver's sf0.1: 128M events, 500k documents, 200k embeddings,
~60M lineitem). Replicates each sf0.1 table R times with key-column
offsets of (max(key)+1)*i so every replica is a disjoint key population
with the same per-key history shape, value distributions, and skew as the
source data; foreign keys offset consistently so every join keeps its
sf0.1 semantics at Rx the cardinality. events replicates at 12.8*factor
copies (the sf1 convention that makes the events parquet large enough for
the segmented-carry auto-gate to fire on its own).

Pure SQL transforms over the source parquet (no randomness):
byte-for-byte reproducible. Output: <dst_dir>/<table>.parquet
(default /root/repo/testdata-sf{factor/10}, gitignored).
"""
import duckdb
import os
import shutil
import sys


SRC = "/root/testdata/sf0.1"


def spec(factor):
    # table -> (replicas, {col: (referenced table, referenced col)})
    ev = (128 * factor) // 10  # 128 at factor 10, matching make_sf1.py
    return {
        "region":     (1,      {}),
        "nation":     (1,      {}),
        "customer":   (factor, {"c_custkey": ("customer", "c_custkey")}),
        "supplier":   (factor, {"s_suppkey": ("supplier", "s_suppkey")}),
        "part":       (factor, {"p_partkey": ("part", "p_partkey")}),
        "orders":     (factor, {"o_orderkey": ("orders", "o_orderkey"),
                                "o_custkey": ("customer", "c_custkey")}),
        "lineitem":   (factor, {"l_orderkey": ("orders", "o_orderkey"),
                                "l_partkey": ("part", "p_partkey"),
                                "l_suppkey": ("supplier", "s_suppkey")}),
        "events":     (ev,     {"event_id": ("events", "event_id"),
                                "user_id": ("events", "user_id")}),
        "documents":  (factor, {"doc_id": ("documents", "doc_id")}),
        "embeddings": (factor, {"vec_id": ("embeddings", "vec_id")}),
    }


def main():
    factor = int(sys.argv[1])
    dst = sys.argv[2] if len(sys.argv) > 2 else (
        f"/root/repo/testdata-sf{factor // 10}" if factor % 10 == 0
        else f"/root/repo/testdata-x{factor}")
    tables = spec(factor)
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        unknown = only - set(tables)
        if unknown:
            sys.exit(f"unknown tables: {sorted(unknown)}")
        tables = {t: v for t, v in tables.items() if t in only}
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('MAKE_SCALE_THREADS', 16)}")
    # The replica-major ORDER BY buffers the whole table in the sort: at
    # factor 1000 that's a 1.28B-row / ~64 GB sort, which OOMs the box
    # when anything else is running. Cap DuckDB's memory and, for large
    # replica counts, generate in replica-range CHUNKS instead — each
    # chunk is its own parquet file under <table>.parquet/ (Spark reads
    # the directory transparently), sorted within itself, so the overall
    # layout is still replica-major with the same per-replica time
    # clustering, and no sort ever exceeds chunk size.
    con.execute(f"SET memory_limit = "
                f"'{os.environ.get('MAKE_SCALE_MEM', '24GB')}'")
    con.execute(f"SET temp_directory = '{dst}/.duckdb_tmp'")
    chunk_rows = int(os.environ.get("MAKE_SCALE_CHUNK_ROWS", 100_000_000))

    offsets = {}
    for tbl, col in {v for _, keys in tables.values() for v in keys.values()}:
        mx = con.execute(
            f"SELECT max({col}) FROM '{SRC}/{tbl}.parquet'").fetchone()[0]
        offsets[(tbl, col)] = int(mx) + 1

    for tbl, (reps, keys) in tables.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{tbl}.parquet'").fetchall()]
        proj = ", ".join(
            f"{c} + {offsets[keys[c]]}::BIGINT * i AS {c}" if c in keys else c
            for c in cols)
        out = f"{dst}/{tbl}.parquet"
        n_src = con.execute(
            f"SELECT count(*) FROM '{SRC}/{tbl}.parquet'").fetchone()[0]
        reps_per_chunk = max(1, chunk_rows // max(1, n_src))
        if reps > reps_per_chunk:
            # a previous run with a different factor/chunk size may have
            # left chunk files here; the '*.parquet' glob would sweep
            # them in and silently corrupt the dataset and its count
            if os.path.isdir(out):
                shutil.rmtree(out)
            os.makedirs(out)
            for ci, lo in enumerate(range(0, reps, reps_per_chunk)):
                hi = min(lo + reps_per_chunk, reps)
                con.execute(f"""
                    COPY (SELECT {proj}
                          FROM '{SRC}/{tbl}.parquet', range({lo}, {hi}) r(i)
                          ORDER BY i)
                    TO '{out}/chunk-{ci:04d}.parquet'
                    (FORMAT PARQUET, COMPRESSION SNAPPY)
                """)
                print(f"  {tbl} chunk {ci}: replicas [{lo}, {hi})",
                      flush=True)
            glob_sql = f"'{out}/*.parquet'"
            sz = sum(os.path.getsize(os.path.join(out, f))
                     for f in os.listdir(out))
        else:
            con.execute(f"""
                COPY (SELECT {proj}
                      FROM '{SRC}/{tbl}.parquet', range({reps}) r(i)
                      ORDER BY i)
                TO '{out}' (FORMAT PARQUET, COMPRESSION SNAPPY)
            """)
            glob_sql = f"'{out}'"
            sz = os.path.getsize(out)
        n = con.execute(f"SELECT count(*) FROM {glob_sql}").fetchone()[0]
        assert n == n_src * reps, (
            f"{tbl}: generated {n} rows, expected {n_src} * {reps} = "
            f"{n_src * reps} — stale chunks or a partial write")
        print(f"{tbl}: {reps}x -> {n} rows, {sz/1e6:.1f} MB", flush=True)

    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
