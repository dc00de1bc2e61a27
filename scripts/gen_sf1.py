"""Generate a 10x scale-up of sf0.1 for the scaling-slope smoke (VERDICT
r10 task 6): fact tables (orders, lineitem, events, documents, embeddings)
replicated 10x with deterministic key offsets; dimension tables copied
as-is (the realistic shape — facts grow 10x, dims don't, and the pinned-8
plans must keep broadcasting them).

Written to /tmp/secco_testdata_sf1 (NOT the read-only /root/testdata, not
the repo). This data has NO oracle claim — it exists purely to measure
wall-time ratios sf1/sf0.1 for the pinned-8 headliners, catching
super-linear surprises no plan read can.

Replication choices that keep the measured slope honest:
- documents: each copy's text is passed through a per-copy VOCABULARY
  SHIFT CIPHER (word -> vocab[(idx + 3*copy) mod V]; V=31 is prime and
  3*copy < 31, so every copy's mapping is a derangement of every other's)
  — copies share NO shingles with each other or the original, so the LSH
  near-dup pair count scales ~linearly with the corpus while word-length
  and frequency structure is preserved. Verbatim copies would make every
  doc a 10-member duplicate clique (quadratic pairs); a word ROTATION
  (the first attempt) is subtler but equally wrong: rotating changes only
  the ~2 shingles crossing the wrap point, so every copy stays a
  Jaccard≈0.9 near-dup of the original and the measured slope is the
  replication artifact, not the engine (r11 review finding).
- embeddings: vectors copied verbatim (vec_id offset) — kNN cost is
  corpus-linear regardless of vector values, and ties rank by vec_id.
- events/orders/lineitem: id offsets preserve join keys within each copy;
  dim foreign keys (custkey, suppkey, partkey, user_id) are left alone so
  per-key fan-in grows 10x (the realistic skew direction for a growing
  fact table).

Usage: python scripts/gen_sf1.py [out_dir]   (idempotent via _DONE marker)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/secco_testdata_sf1"
COPIES = 10
# offsets: one above the sf0.1 max key, rounded to a readable decade
OFF_ORDER = 1_000_000
OFF_EVENT = 1_000_000
OFF_DOC = 100_000
OFF_VEC = 100_000

DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    marker = os.path.join(OUT, "_DONE")
    if os.path.exists(marker):
        print(f"already generated at {OUT}")
        return
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count() or 8}")
    for t in DIMS:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.sql(f"CREATE VIEW copies AS SELECT i AS c FROM generate_series(0, {COPIES - 1}) t(i)")
    facts = {
        "orders": f"SELECT o_orderkey + c * {OFF_ORDER} AS o_orderkey, "
                  "o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
                  "o_orderpriority "
                  f"FROM read_parquet('{SRC}/orders.parquet'), copies",
        "lineitem": f"SELECT l_orderkey + c * {OFF_ORDER} AS l_orderkey, "
                    "l_partkey, l_suppkey, l_linenumber, l_quantity, "
                    "l_extendedprice, l_discount, l_tax, l_returnflag, "
                    "l_linestatus, l_shipdate "
                    f"FROM read_parquet('{SRC}/lineitem.parquet'), copies",
        "events": f"SELECT event_id + c * {OFF_EVENT} AS event_id, ts, "
                  "user_id, event_type, value, props "
                  f"FROM read_parquet('{SRC}/events.parquet'), copies",
        "documents": f"""
            WITH src AS (SELECT * FROM read_parquet('{SRC}/documents.parquet')),
            words AS (
              SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS word
              FROM (SELECT doc_id, string_split(text, ' ') AS w FROM src)),
            vocab AS (
              SELECT word, row_number() OVER (ORDER BY word) - 1 AS vid
              FROM (SELECT DISTINCT word FROM words)),
            vtot AS (SELECT count(*) AS v FROM vocab),
            rebuilt AS (
              SELECT w.doc_id, copies.c,
                     string_agg(v2.word, ' ' ORDER BY w.pos) AS text
              FROM words w
              JOIN vocab v1 USING (word)
              CROSS JOIN copies CROSS JOIN vtot
              JOIN vocab v2 ON v2.vid = (v1.vid + 3 * copies.c) % vtot.v
              GROUP BY w.doc_id, copies.c)
            SELECT r.doc_id + r.c * {OFF_DOC} AS doc_id, r.text,
                   s.lang, s.source, length(r.text) AS n_chars
            FROM rebuilt r JOIN src s USING (doc_id)""",
        "embeddings": f"SELECT vec_id + c * {OFF_VEC} AS vec_id, embedding, "
                      f"label FROM read_parquet('{SRC}/embeddings.parquet'), copies",
    }
    for t, q in facts.items():
        con.sql(f"COPY ({q}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    with open(marker, "w") as f:
        f.write("ok")
    print(f"generated at {OUT}")


if __name__ == "__main__":
    main()
