#!/usr/bin/env python3
"""Build a ~10x scale-up ("sf1") of the driver's sf0.1 test data for
scaling-slope measurement. Dev tool only — the shipped Scala library
has no Python dependency, and this NEVER writes to /root/testdata.

Usage: python3 tools/make_sf1.py [out_dir]   (default target/sf1)

Construction (documented in README's slope table): each fact-side
table is replicated 10x with key shifts chosen so every join stays
key-consistent and no cross-copy collisions exist; dimension tables
(part, nation, region, supplier) keep their size, as dimensions do at
scale. Content is DECORRELATED across copies where identity matters:

- orders/lineitem/customer: orderkey/custkey shifted per copy; the
  fact view's join graph is preserved copy-by-copy. partkeys are NOT
  shifted (products are a dimension), so per-product row counts grow
  10x — exactly how a real fact table deepens.
- documents: doc_id shifted; every whitespace token gets a per-copy
  suffix (copy 0 keeps the original text), so near-dup structure
  WITHIN a copy matches sf0.1 and NO cross-copy near-dups exist —
  dedup candidate counts scale linearly by construction, which is the
  honest null hypothesis a slope measurement needs (10 exact replicas
  would inflate pair counts 100x by data construction, not algorithm
  behavior).
- embeddings: vec_id shifted; each copy's vectors are ROTATED by
  copy-index positions (list slicing) — random vectors decorrelate
  under rotation, so ANN bucket occupancy scales linearly instead of
  collapsing every copy into one bucket.
- events: event_id and user_id shifted; timestamps kept, so windowed
  densities grow with user count (the rolling/sessionize scaling
  axis).

Determinism: pure key arithmetic + rotation, no randomness; running
twice produces identical files.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
# Shifts are round numbers far above the sf0.1 max key of each table.
SHIFT_OK = 10_000_000      # orderkey (max ~6,000,000 at sf0.1)
SHIFT_CK = 100_000         # custkey (max ~15,000)
SHIFT_DOC = 100_000        # doc_id (max ~5,000)
SHIFT_VEC = 100_000        # vec_id (max ~20,000)
SHIFT_EV = 10_000_000      # event_id (max ~1,000,000)
SHIFT_USER = 100_000       # user_id (max ~15,000)


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def copy_union(body: str) -> str:
        return " UNION ALL ".join(
            f"SELECT {body.format(i=i)} FROM src" for i in range(COPIES))

    def build(name: str, body: str | None) -> None:
        con.execute(
            f"CREATE OR REPLACE VIEW src AS FROM '{SRC}/{name}.parquet'")
        sel = copy_union(body) if body else "SELECT * FROM src"
        # One file, one row group per ~128MB: unlike the driver's
        # single-row-group files this parallelizes naturally, but the
        # bench still sets graft.load.repartition for comparability.
        con.execute(
            f"COPY ({sel}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{out_dir}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    # Dimensions: unchanged size.
    for dim in ["region", "nation", "part", "supplier"]:
        build(dim, None)

    build("customer",
          "c_custkey + {i} * " + str(SHIFT_CK) + " AS c_custkey, "
          "c_name, c_nationkey, c_acctbal, c_mktsegment")
    build("orders",
          "o_orderkey + {i} * " + str(SHIFT_OK) + " AS o_orderkey, "
          "o_custkey + {i} * " + str(SHIFT_CK) + " AS o_custkey, "
          "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    build("lineitem",
          "l_orderkey + {i} * " + str(SHIFT_OK) + " AS l_orderkey, "
          "l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
          "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
    build("documents",
          "doc_id + {i} * " + str(SHIFT_DOC) + " AS doc_id, "
          "CASE WHEN {i} = 0 THEN text "
          "     ELSE regexp_replace(text, '(\\S+)', '\\1x{i}', 'g') END AS text, "
          "lang, source, "
          # n_chars must track the REWRITTEN text: copying it through
          # would leave a stale precomputed length for copies 1-9 and
          # skew every length-derived slope (parity vs the oracle would
          # still hold — both read the same file — but the measurement
          # axis would be subtly wrong).
          "CASE WHEN {i} = 0 THEN n_chars "
          "     ELSE length(regexp_replace(text, '(\\S+)', '\\1x{i}', 'g')) "
          "END AS n_chars")
    build("embeddings",
          "vec_id + {i} * " + str(SHIFT_VEC) + " AS vec_id, "
          "CASE WHEN {i} = 0 THEN embedding "
          "     ELSE embedding[1 + {i}:] || embedding[:{i}] END AS embedding, "
          "label")
    build("events",
          "event_id + {i} * " + str(SHIFT_EV) + " AS event_id, ts, "
          "user_id + {i} * " + str(SHIFT_USER) + " AS user_id, "
          "event_type, value, props")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "target/sf1")
