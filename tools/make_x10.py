#!/usr/bin/env python3
"""Builder-side synthetic scale-up corpus (reproduces BASELINE.md's
"Measured scaling" section).

Usage: python3 tools/make_x10.py <srcSfDir> <dstDir> [factor=10]

Replicates the fact tables x<factor> with offset keys; documents get
per-copy-distinct tokens (zero cross-copy shingle overlap, so dedup
volume stays linear and honest); embeddings beyond copy 0 are
hash-derived uniform vectors (replicated embeddings would make every
copy a near-dup and blow the pair queries up quadratically for the
wrong reason). Dims (customer/supplier/part/nation/region) copy
unchanged. Timestamps are NOT offset: every window gets <factor>x rows
— the harder shuffle test — and window counts stay comparable.

Then: SPARK_GRAFT_SF_DIR=<dstDir> sbt 'runMain graft.Bench'
"""
import os
import sys

import duckdb

OFF = 1_000_000_000


def main(src, dst, factor=10):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    g = f"generate_series(0, {factor - 1}) g(i)"
    con.execute(f"""
COPY (SELECT event_id + i*{OFF} AS event_id, ts, user_id, event_type, value, props
      FROM read_parquet('{src}/events.parquet'), {g})
TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
COPY (SELECT l_orderkey + i*{OFF} AS l_orderkey, l_partkey, l_suppkey, l_linenumber,
             l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,
             l_linestatus, l_shipdate
      FROM read_parquet('{src}/lineitem.parquet'), {g})
TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
COPY (SELECT o_orderkey + i*{OFF} AS o_orderkey, o_custkey, o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{src}/orders.parquet'), {g})
TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
    # n_chars recomputed for rewritten copies (token suffixes lengthen the
    # text) so length-weighted queries (q_sample_weighted, q_pack_bins) see
    # consistent lengths at scale, same as both engines do at sf parity
    con.execute(f"""
COPY (SELECT doc_id + i*{OFF} AS doc_id,
             CASE WHEN i = 0 THEN text
                  ELSE regexp_replace(text, '(\\S+)', '\\1' || CAST(i AS VARCHAR), 'g')
             END AS text,
             lang, source,
             CASE WHEN i = 0 THEN n_chars
                  ELSE length(regexp_replace(text, '(\\S+)', '\\1' || CAST(i AS VARCHAR), 'g'))
             END AS n_chars
      FROM read_parquet('{src}/documents.parquet'), {g})
TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    # stride = 64*factor so (vec_id, i) pairs never alias: with a fixed
    # stride of 640, factor >= 12 made copy (v, i) bitwise-equal to
    # (v-1, i+10) — exactly the cross-copy duplicates this scheme avoids
    stride = 64 * factor
    con.execute(f"""
COPY (SELECT vec_id + i*{OFF} AS vec_id,
             CASE WHEN i = 0 THEN embedding
                  ELSE list_transform(generate_series(1, 64),
                       d -> CAST((hash(vec_id*{stride} + i*64 + d) % 1000) / 1000.0 - 0.5 AS FLOAT))
             END AS embedding,
             label
      FROM read_parquet('{src}/embeddings.parquet'), {g})
TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    for t in ["customer", "supplier", "part", "nation", "region"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    for t in ["events", "lineitem", "orders", "documents", "embeddings"]:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
