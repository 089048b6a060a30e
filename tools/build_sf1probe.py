"""Build the synthetic sf1 (10x sf0.1) slice used by tools/scale_probe.py.

Only the three tables the top-cost queries read are scaled; the rest are
symlinked from sf0.1. Replica construction preserves each workload's
OUTPUT shape — naive replication would silently change the problem:

- documents: replica k applies a per-replica letter cipher (rot-k) to
  the 45-char title region — Levenshtein distances are PRESERVED within
  a replica (bijective char substitution) and pushed past the linkage
  threshold across replicas, so entity_linkage output scales exactly
  linearly (261 -> 2610) instead of exploding 891x as with naive
  replicas; the tail replaces every 3rd word with a replica-unique
  token so trigram-shingle similarity breaks across replicas and
  setsim_join output also scales 10x.
- lineitem: orderkeys offset per replica over the SAME part catalog —
  10x graph edges on a fixed vertex set, the densifying (hard)
  direction for pagerank.
- embeddings: base + strong deterministic jitter (0.6 relative norm),
  so replicas stay in-distribution without being trivial near-dups.
- orders (fixture v2, round 7): orderkeys offset IN LOCKSTEP with
  lineitem (same k*1e6) and custkeys offset per replica, so
  orders-joining workloads (hits_purchase_graph's customer->part
  edges, elo's order-year join) see a TRUE 10x edge set — with orders
  symlinked, replica lineitems silently dropped out of the join and
  the r6 hits probe measured a fixture artifact (-0.09 exponent), not
  the operator (VERDICT r6 item 4).
- events (fixture v2, round 7): event_id/user_id offset per replica,
  same timestamps — 10x events-per-day and 10x distinct users, the
  growth direction for the rolling-HLL / CMS register-maintenance
  probes (VERDICT r6 item 5). Earlier SCALE.md rows that read events
  at "sf1" were documented fixed-cost checks, now superseded.

Usage: python tools/build_sf1probe.py [out_dir]   (default .sf1probe)
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main() -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = sys.argv[1] if len(sys.argv) > 1 else ".sf1probe"
    src = "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    con.execute(f"""
    COPY (
      SELECT l_orderkey + k * 1000000 AS l_orderkey, l_partkey, l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{src}/lineitem.parquet')
      CROSS JOIN range(10) t(k)
    ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)

    con.execute(f"""
    COPY (
      SELECT doc_id + k * 1000000 AS doc_id,
             CASE WHEN k = 0 THEN text ELSE
               translate(substr(text, 1, 45),
                         'abcdefghijklmnopqrstuvwxyz',
                         substr(repeat('abcdefghijklmnopqrstuvwxyz', 2), (k % 26) + 1, 26))
               ||
               array_to_string(
                 list_transform(list_zip(string_split(substr(text, 46), ' '),
                                         range(1, len(string_split(substr(text, 46), ' ')) + 1)),
                                z -> CASE WHEN z[2] % 3 = 0
                                     THEN 'r' || k::VARCHAR || 'q' || z[2]::VARCHAR
                                     ELSE z[1] END),
                 ' ')
             END AS text,
             lang, source, n_chars
      FROM read_parquet('{src}/documents.parquet')
      CROSS JOIN range(10) t(k)
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)

    tbl = pq.read_table(f"{src}/embeddings.parquet")
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.array(tbl.column("vec_id").to_pylist())
    labels = tbl.column("label").to_pylist()
    rows_id, rows_vec, rows_lab = [], [], []
    for k in range(10):
        rng = np.random.RandomState(1000 + k)
        if k == 0:
            v = vecs
        else:
            noise = rng.standard_normal(vecs.shape).astype(np.float32)
            noise /= np.linalg.norm(noise, axis=1, keepdims=True)
            v = vecs + 0.6 * np.linalg.norm(vecs, axis=1, keepdims=True) * noise
        rows_id.append(ids + k * 1000000)
        rows_vec.append(v)
        rows_lab.extend(labels)
    allv = np.concatenate(rows_vec)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.concatenate(rows_id)),
            "embedding": pa.array(
                [list(map(float, r)) for r in allv],
                type=tbl.schema.field("embedding").type,
            ),
            "label": pa.array(rows_lab, type=tbl.schema.field("label").type),
        }),
        f"{out}/embeddings.parquet",
    )

    # fixture v2: orders scale in lockstep with lineitem (same k*1e6
    # orderkey offset; custkeys offset so cust->part edges are genuinely
    # new per replica), events scale with fresh event/user ids.
    for t in ("orders", "events"):
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.islink(dst):
            os.unlink(dst)
    con.execute(f"""
    COPY (
      SELECT o_orderkey + k * 1000000 AS o_orderkey,
             o_custkey + k * 1000000 AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{src}/orders.parquet')
      CROSS JOIN range(10) t(k)
    ) TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT event_id + k * 1000000 AS event_id, ts,
             user_id + k * 1000000 AS user_id,
             event_type, value, props
      FROM read_parquet('{src}/events.parquet')
      CROSS JOIN range(10) t(k)
    ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)

    for t in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{src}/{t}.parquet", dst)
    print(f"built {out}")


if __name__ == "__main__":
    main()
