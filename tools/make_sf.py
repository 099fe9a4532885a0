"""Synthesize a larger scale factor from /root/testdata/sf0.1 for the
SCALING evidence run (VERDICT r7 #3): correctness is proven at sf0.01
against DuckDB; this dataset exists to measure how each headliner's wall
time GROWS with data volume, so the synthesis must preserve the
*structure* that drives cost, not the exact values:

- **Relational tables** (customer/supplier/part/orders/lineitem/events):
  K copies with per-table key OFFSETS applied consistently on both sides
  of every FK (l_orderkey and o_orderkey shift together, etc.), so join
  fan-outs, group cardinalities, and per-key depths all scale the TPC-H
  way — more keys, not deeper keys. Dates/timestamps keep their range
  (densification), exactly like TPC-H SF scaling.
- **region/nation**: fixed dimensions, copied as-is (25 nations at every
  SF, like TPC-H).
- **documents**: copy 0 pristine; copy i>0 passes every whitespace token
  through the injective rename ``t -> t + str(i)``. A bijective token
  map preserves the shingle-overlap structure EXACTLY within a copy
  (MinHash/SimHash/C4 candidate volumes scale linearly with copies) and
  shares zero tokens across copies — the near-dup rate stays
  proportional instead of every row gaining 9 artificial twins.
- **embeddings**: copy i>0 jitters each unit vector with seeded Gaussian
  noise (sigma = 0.3x per-dim std, perturbation norm ~0.3 « median NN
  distance 1.09) and renormalizes — cluster structure (and therefore
  IVF cell occupancy) is preserved; points per cell scale linearly.

Output: spark-warehouse/sf<K/10>/ next to the repo root (gitignored —
~200 MB at sf1). Usage: python tools/make_sf.py [K]   (default K=10)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: key columns to offset, per table: {column: keyspace-source table}
#: (the offset for copy i is i * (max(key in source table) + 1), applied
#: to the key's OWNING table and every FK referencing it)
_KEYED = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
}


#: name columns DERIVED from a key in the source data ("Customer#%09d"):
#: regenerated from the offset key per copy, because copying them verbatim
#: would hold every name-based blocking key's selectivity CONSTANT while
#:  rows grow — r8 found exactly that: join_fuzzy_blocked measured a fake
#: alpha=1.84 because its name-prefix blocks had 10 identical copies of
#: every name (real TPC-H blocks stay <=10 rows at every SF).
_DERIVED_NAMES = {
    "customer": {"c_name": ("Customer#", "c_custkey")},
    "supplier": {"s_name": ("Supplier#", "s_suppkey")},
}


def _scale_relational(con, table: str, k: int, out_dir: str) -> int:
    keyed = _KEYED[table]
    derived = _DERIVED_NAMES.get(table, {})
    spans = {
        col: con.sql(
            f"select max({src_col}) + 1 from "
            f"read_parquet('{SRC}/{src_tbl}.parquet')"
        ).fetchone()[0]
        for col, (src_tbl, src_col) in keyed.items()
    }
    cols = [
        d[0]
        for d in con.sql(
            f"describe select * from read_parquet('{SRC}/{table}.parquet')"
        ).fetchall()
    ]
    selects = []
    for i in range(k):
        parts = []
        for c in cols:
            if c in keyed:
                parts.append(f"{c} + {i * spans[c]} as {c}")
            elif c in derived:
                prefix, key = derived[c]
                parts.append(
                    f"'{prefix}' || lpad(cast({key} + {i * spans[key]} "
                    f"as varchar), 9, '0') as {c}"
                )
            else:
                parts.append(c)
        proj = ", ".join(parts)
        selects.append(
            f"select {proj} from read_parquet('{SRC}/{table}.parquet')"
        )
    union = " union all ".join(selects)
    out = os.path.join(out_dir, f"{table}.parquet")
    con.sql(f"copy ({union}) to '{out}' (format parquet)")
    return con.sql(f"select count(*) from read_parquet('{out}')").fetchone()[0]


def _scale_documents(k: int, out_dir: str) -> int:
    t = pq.read_table(f"{SRC}/documents.parquet")
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    span = max(doc_ids) + 1
    out_ids: list[int] = []
    out_text: list[str] = []
    out_lang: list[str] = []
    out_src: list[str] = []
    out_n: list[int] = []
    for i in range(k):
        sfx = str(i)
        for did, txt, lg, srcn in zip(doc_ids, texts, langs, sources):
            nt = (
                txt
                if i == 0
                else " ".join(w + sfx for w in txt.split(" "))
            )
            out_ids.append(did + i * span)
            out_text.append(nt)
            out_lang.append(lg)
            out_src.append(srcn)
            out_n.append(len(nt))
    tbl = pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
            "source": pa.array(out_src, pa.string()),
            "n_chars": pa.array(out_n, pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))
    return len(tbl)


def _scale_embeddings(k: int, out_dir: str) -> int:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.asarray(t.column("label").to_pylist(), dtype=np.int32)
    span = int(ids.max()) + 1
    sigma = 0.3 * float(emb.std(axis=0).mean())
    all_ids, all_emb, all_lab = [ids], [emb], [labels]
    for i in range(1, k):
        rng = np.random.default_rng(42_000 + i)
        jittered = emb + rng.normal(0.0, sigma, emb.shape).astype(np.float32)
        jittered /= np.linalg.norm(jittered, axis=1, keepdims=True)
        all_ids.append(ids + i * span)
        all_emb.append(jittered.astype(np.float32))
        all_lab.append(labels)
    ids_k = np.concatenate(all_ids)
    emb_k = np.concatenate(all_emb)
    lab_k = np.concatenate(all_lab)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids_k),
            "embedding": pa.array(
                list(emb_k), pa.list_(pa.float32())
            ),
            "label": pa.array(lab_k),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    return len(tbl)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf = 0.1 * k
    out_dir = os.path.join(
        REPO, "spark-warehouse", f"sf{sf:g}"
    )
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    counts: dict[str, int] = {}
    for table in ("region", "nation"):
        con.sql(
            f"copy (select * from read_parquet('{SRC}/{table}.parquet')) "
            f"to '{os.path.join(out_dir, table + '.parquet')}' "
            f"(format parquet)"
        )
        counts[table] = con.sql(
            f"select count(*) from "
            f"read_parquet('{os.path.join(out_dir, table + '.parquet')}')"
        ).fetchone()[0]
    for table in _KEYED:
        counts[table] = _scale_relational(con, table, k, out_dir)
    counts["documents"] = _scale_documents(k, out_dir)
    counts["embeddings"] = _scale_embeddings(k, out_dir)
    print({"out_dir": out_dir, "k": k, "rows": counts})


if __name__ == "__main__":
    main()
