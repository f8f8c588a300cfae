#!/usr/bin/env python3
"""Build a K-times replicated copy of a testdata sf dir for SCALING probes.

The driver only benches sf0.1; this tool manufactures a larger corpus from
it (default 5x, i.e. an "sf0.5-equivalent") so a nonlinearity the small
fixtures cannot see shows up in a once-per-round probe (SCALING.md).

Replication keeps the star schema FK-consistent: every fact/dim id column
is shifted by replica * 10^7 IN THE SAME WAY on both sides of each join
(orders.o_custkey shifts with customer.c_custkey, lineitem.l_orderkey with
orders.o_orderkey, ...), so per-replica join fan-out is identical to the
source and total volume scales by K. nation/region stay single copies
(fixed dims); event timestamps keep their range (denser stream, same
window count — state cardinality is unchanged while input volume grows,
which is the realistic shape). Bounded gate slices (vec_id < 8 queries,
< 250 recall fixtures) deliberately stay bounded — corpus-proportional
paths are what the probe measures. Events timestamps are written as
regular microsecond TIMESTAMP (Tables.events handles both encodings).

With --salt, every replica's DOCUMENT TEXTS are made unique by prefixing
each whitespace token with a per-replica tag (r<replica>x): token count,
length distribution and per-doc structure are preserved, but replicas
share no shingles. The plain replica probe makes an 80%-duplicate corpus,
so MinHash/Jaccard runtimes there measure OUTPUT growth (pair count
explodes); the salted probe isolates CANDIDATE-GENERATION scaling —
record both rows in SCALING.md.

Usage: python3 tools/make_scale_probe.py [K] [src_dir] [out_dir] [--salt]
"""
import sys

import duckdb

ARGS = [a for a in sys.argv[1:] if a != "--salt"]
SALT = "--salt" in sys.argv[1:]
K = int(ARGS[0]) if len(ARGS) > 0 else 5
SRC = ARGS[1] if len(ARGS) > 1 else "/root/testdata/sf0.1"
OUT = ARGS[2] if len(ARGS) > 2 else f"/tmp/sfprobe_{K}x" + ("_salted" if SALT else "")
SHIFT = 10_000_000

# table -> columns to shift per replica (BIGINT id/fk columns)
SHIFTED = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = {"region", "nation"}  # single copy


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    # events.ts must land as an instant (parquet isAdjustedToUTC=true ->
    # Spark TIMESTAMP): a plain TIMESTAMP writes NTZ, which time-arithmetic
    # functions reject. UTC keeps the TIMESTAMPTZ cast shift-free.
    con.sql("SET TimeZone='UTC'")
    for t, shifted in SHIFTED.items():
        src = f"{SRC}/{t}.parquet"
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        copies = 1 if t in DIMS else K
        selects = []
        for r in range(copies):
            proj = ", ".join(
                f"{c} + {r * SHIFT} AS {c}" if c in shifted and r > 0
                else (f"CAST(ts AS TIMESTAMPTZ) AS ts" if c == "ts" else
                      # unique texts, same token count/length shape: tag every
                      # token so replicas share no shingles (replica 0 = source)
                      f"regexp_replace(text, '(\\S+)', 'r{r}x\\1', 'g') AS text"
                      if SALT and t == "documents" and c == "text" and r > 0
                      else c)
                for c in cols)
            selects.append(f"SELECT {proj} FROM '{src}'")
        q = " UNION ALL ".join(selects)
        con.sql(f"COPY ({q}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({copies} copies)")
    print(f"probe dir: {OUT}")


if __name__ == "__main__":
    main()
