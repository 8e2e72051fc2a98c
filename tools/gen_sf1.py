#!/usr/bin/env python3
"""Synthesize a 10x scale corpus ("sf1") from the driver's sf0.1 tables,
for the scale-trend bench run (VERDICT r6 missing #2). The driver's own
generator is not available, so sf1 is 10 structure-preserving copies of
sf0.1, built so every per-copy invariant the operators depend on is
EXACTLY preserved and nothing couples copies:

- customer/orders: copy k shifts c_custkey/o_custkey by k*C where
  C = max(c_custkey)+1. o_orderkey is remapped to
  (okey % C) + k*C + 10*C*okey, which is unique across copies and makes
  the citation graph's dst = okey' % (10*C) land inside copy k — the
  sf1 graph is 10 disjoint shifted copies of the sf0.1 graph, so
  superstep work per iteration scales exactly 10x with identical
  convergence behavior. lineitem.l_orderkey gets the same remap (FK
  integrity for the join queries).
- documents: copy k suffixes every TOKEN with "_k" — an injective token
  rename, so each copy's shingle/minhash/simhash structure is isomorphic
  to sf0.1's (identical within-copy Jaccard values, df histogram, pair
  graph) with ZERO cross-copy shingle overlap: postings, candidates and
  survivors scale exactly 10x.
- embeddings: copy k applies a seeded coordinate permutation + sign
  flips — dot products and norms within a copy are invariant (identical
  near-dup pairs per copy), cross-copy directions are ~random (no
  planted cross-copy near-dups). Copy 0 is the identity, so the ANN
  query side (vec_id < 10) stays 10 queries probing a 10x corpus.
- events: copy k shifts event_id/user_id; timestamps unchanged (window
  keys get 10x rows, same key cardinality in time).
- region/nation/supplier/part: copied as-is (dims).

Deterministic (seed fixed per copy); writes /tmp/sf1/*.parquet.
"""
import duckdb
import random
import os

import sys
SRC = "/root/testdata/sf0.1"
# optional args: K DST  (default 10 copies -> /tmp/sf1; e.g. "100 /tmp/sf10"
# builds the 100x corpus for the second slope point)
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

C = con.execute(f"SELECT max(c_custkey)+1 FROM '{SRC}/customer.parquet'").fetchone()[0]
D = con.execute(f"SELECT max(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]
V = con.execute(f"SELECT max(vec_id)+1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
E = con.execute(f"SELECT max(event_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
U = con.execute(f"SELECT max(user_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
print(f"C={C} D={D} V={V} E={E} U={U}")

def copies(sql_for_k, out):
    union = "\nUNION ALL\n".join(sql_for_k(k) for k in range(K))
    con.execute(f"COPY ({union}) TO '{DST}/{out}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{out}.parquet'").fetchone()[0]
    print(f"{out}: {n} rows")

# dims: verbatim
for t in ["region", "nation", "supplier", "part"]:
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

copies(lambda k: f"""
  SELECT c_custkey + {k * C} AS c_custkey,
         * EXCLUDE (c_custkey)
  FROM '{SRC}/customer.parquet'""", "customer")

copies(lambda k: f"""
  SELECT (o_orderkey % {C}) + {k * C} + {K * C}::BIGINT * o_orderkey AS o_orderkey,
         o_custkey + {k * C} AS o_custkey,
         * EXCLUDE (o_orderkey, o_custkey)
  FROM '{SRC}/orders.parquet'""", "orders")

copies(lambda k: f"""
  SELECT (l_orderkey % {C}) + {k * C} + {K * C}::BIGINT * l_orderkey AS l_orderkey,
         * EXCLUDE (l_orderkey)
  FROM '{SRC}/lineitem.parquet'""", "lineitem")

copies(lambda k: f"""
  SELECT event_id + {k * E} AS event_id,
         user_id + {k * U} AS user_id,
         * EXCLUDE (event_id, user_id)
  FROM '{SRC}/events.parquet'""", "events")

# documents: suffix every token with _k (injective rename per copy)
copies(lambda k: f"""
  SELECT doc_id + {k * D} AS doc_id,
         list_aggregate(list_transform(string_split(text, ' '), t -> t || '_{k}'), 'string_agg', ' ') AS text,
         * EXCLUDE (doc_id, text)
  FROM '{SRC}/documents.parquet'""", "documents")

# embeddings: per-copy seeded coordinate permutation + sign flips
dims = con.execute(f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1").fetchone()[0]
def perm_sql(k):
    if k == 0:
        return f"SELECT vec_id, embedding FROM '{SRC}/embeddings.parquet'"
    rng = random.Random(1000 + k)
    perm = list(range(dims)); rng.shuffle(perm)
    sign = [rng.choice([-1.0, 1.0]) for _ in range(dims)]
    comps = ", ".join(f"{sign[i]}*embedding[{perm[i]+1}]" for i in range(dims))
    return (f"SELECT vec_id + {k * V} AS vec_id, "
            f"list_transform([{comps}], x -> CAST(x AS FLOAT)) AS embedding "
            f"FROM '{SRC}/embeddings.parquet'")
copies(perm_sql, "embeddings")

print("done ->", DST)
