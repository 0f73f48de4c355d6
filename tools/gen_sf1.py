#!/usr/bin/env python3
"""Dev tool: synthesize an sf1-scale dataset (~10x sf0.1) for bench
spot-checks of the scale claims. NOT gate data — the driver's gates run
on /root/testdata; this exists because memory/shuffle cliffs don't show
at sf0.1 (VERDICT r3, next-round item 8).

Replication is deterministic and DUP-RATE-PRESERVING: each replica r
offsets ids and makes its content dissimilar from other replicas
(token prefixes / vector rotation), so duplicate/near-dup structure per
replica matches sf0.1 instead of exploding quadratically across
replicas.

Usage: python3 tools/gen_sf1.py [outDir=/tmp/sf1] [replicas=10]
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({reps})) AS rep")

    # lineitem: offset the order key per replica, keep everything else
    con.execute(f"""
      COPY (
        SELECT l_orderkey + rep * 100000000 AS l_orderkey,
               l.* EXCLUDE (l_orderkey)
        FROM '{SRC}/lineitem.parquet' l CROSS JOIN r
      ) TO '{out}/lineitem.parquet' (FORMAT parquet)""")

    # documents: replica 0 verbatim; replicas 1..n-1 prefix every token so
    # shingle sets never collide across replicas (within-replica dup
    # structure is preserved exactly)
    con.execute(f"""
      COPY (
        SELECT doc_id + rep * 10000000 AS doc_id, source, lang,
               CASE WHEN rep = 0 THEN text
                    ELSE array_to_string(list_transform(
                      string_split(text, ' '),
                      t -> 'r' || CAST(rep AS VARCHAR) || '_' || t), ' ')
               END AS text,
               n_chars
        FROM '{SRC}/documents.parquet' CROSS JOIN r
      ) TO '{out}/documents.parquet' (FORMAT parquet)""")

    # embeddings: rotate the vector by rep positions — cosine structure
    # within a replica is preserved, cross-replica pairs decorrelate
    con.execute(f"""
      COPY (
        SELECT vec_id + rep * 10000000 AS vec_id, label,
               CASE WHEN rep = 0 THEN embedding
                    ELSE embedding[rep + 1:] || embedding[1:rep]
               END AS embedding
        FROM '{SRC}/embeddings.parquet' CROSS JOIN r
      ) TO '{out}/embeddings.parquet' (FORMAT parquet)""")

    # events: distinct user/event id space per replica, same time axis
    # (10x the concurrent users -> 10x join/window state). ts passes
    # through as-is: the driver writes timestamp[us] since round 5, and
    # Q.events dispatches on the read schema, so the probe data should
    # exercise the same encoding the gates see.
    con.execute(f"""
      COPY (
        SELECT event_id + rep * 1000000000 AS event_id,
               user_id + rep * 1000000 AS user_id,
               ts,
               e.* EXCLUDE (event_id, user_id, ts)
        FROM '{SRC}/events.parquet' e CROSS JOIN r
      ) TO '{out}/events.parquet' (FORMAT parquet)""")

    # small dims: copy through (queries only filter/join on them)
    for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)")
    for t in ["lineitem", "documents", "embeddings", "events"]:
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
