#!/usr/bin/env python3
"""Deterministic 10x expander for the driver testdata: sf0.1 -> sf1.

Usage: python3 tools/expand_testdata.py [<srcDir> <dstDir> [factor]]
       (defaults: /root/testdata/sf0.1 -> testdata-derived/sf1, 10x)

Scale rehearsal for the 100-TB claims (VERDICT r6 #1): every oracle'd
query re-verifies at 10x sf0.1, with a mass-duplicate hot-bucket slice
that pushes LSH band buckets far past maxBucket to exercise
BoundedCollectAgg saturation under real hot keys.

Design (all pure functions of the input — no RNG, no clock):
- replica 0 is the IDENTITY: sf0.1 is a subset of sf1.
- documents: replica k rewrites doc_id += k*ID_STRIDE and applies a
  per-replica vocabulary-substitution cipher (md5-chosen ~30% of the
  corpus vocab maps to fresh words "<w>q<k>"). A token-level map
  preserves exact- and near-dup structure WITHIN a replica exactly
  (images of equal token streams are equal), while cross-replica
  3-shingle Jaccard drops to ~0.7^3/(2-0.7^3) ~ 0.2 < the 0.5
  near-dup threshold, so replicas are novel documents sharing the
  corpus' statistical shape; vocabulary grows sublinearly (Heaps-ish).
- hot-dup slice: HOT_BASES base texts x HOT_COPIES exact copies at
  doc_id >= HOT_ID0, source="hotdup". Every minhash/simhash band
  bucket for these has ~HOT_COPIES+10 members >> maxBucket=100, so the
  capped collectors saturate (eval to NULL -> bucket dropped) — the
  deterministic, order-independent semantics both engines replay.
- embeddings: vec_id stride; coordinate (vec_id % dim) gets a tiny
  deterministic per-replica float32 nudge, breaking exact-distance
  ties without moving neighborhoods.
- events: event_id stride; ts += k microseconds (stays timestamp[ns]
  — the parquet NANOS annotation the oracle SQL's CAST(ts AS
  TIMESTAMP)/epoch_ns(ts) depends on — and breaks window-order ties
  at us precision); user_id kept so hot users get 10x hotter (skew).
- orders/lineitem: o_orderkey/l_orderkey stride together so every
  join stays consistent within a replica; dims (region nation
  customer supplier part) unchanged — dims grow sublinearly in real
  warehouses, and each customer simply owns factor-x more orders.
"""
import hashlib
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "testdata-derived", "sf1")
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

ID_STRIDE = 1_000_000        # > any sf0.1 id; replica k ids live in [k*S, k*S+n)
ORDER_STRIDE = 10_000_000    # > max o_orderkey (149999)
# hot-dup doc_ids start ABOVE every replica band (replica k ids live in
# [k*ID_STRIDE, k*ID_STRIDE + n)), whatever the factor — at factor 100
# the old fixed 50M start collided with replicas 50..99 and produced
# 5000 duplicate doc_ids in the sf10 tier (caught by the q_llm_mm_ppm
# join-explosion row-count mismatch)
HOT_ID0 = max(50_000_000, (FACTOR + 1) * ID_STRIDE)
HOT_BASES = 20               # distinct duplicated contents
HOT_COPIES = 250             # copies per content: 2.5x past maxBucket=100
SUB_RATE = 76                # substitute words whose md5 % 256 < 76 (~30%)


def md5int(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def sub_map(vocab, k):
    """Per-replica word-substitution cipher: ~30% of vocab -> fresh words."""
    if k == 0:
        return {}
    return {w: f"{w}q{k}" for w in vocab if md5int(f"{w}|{k}") % 256 < SUB_RATE}


def expand_documents(src_path, dst_path):
    df = pq.read_table(src_path).to_pandas()
    vocab = sorted({w for t in df.text for w in t.split(" ")})
    out = []
    for k in range(FACTOR):
        r = df.copy()
        r["doc_id"] = r.doc_id + k * ID_STRIDE
        m = sub_map(vocab, k)
        if m:
            r["text"] = r.text.map(
                lambda t: " ".join(m.get(w, w) for w in t.split(" ")))
        r["n_chars"] = r.text.str.len().astype("int64")
        out.append(r)
    # mass-duplicate hot-bucket slice: exact copies, ids disjoint
    base = df.iloc[:HOT_BASES]
    hot = base.loc[base.index.repeat(HOT_COPIES)].reset_index(drop=True)
    hot["doc_id"] = HOT_ID0 + np.arange(len(hot), dtype="int64")
    hot["source"] = "hotdup"
    hot["n_chars"] = hot.text.str.len().astype("int64")
    out.append(hot)
    allr = pd.concat(out, ignore_index=True)
    write(dst_path, pa.Table.from_pandas(allr, preserve_index=False),
          row_group_size=10_000)


def expand_embeddings(src_path, dst_path):
    t = pq.read_table(src_path)
    df = t.to_pandas()
    dim = len(df.embedding.iloc[0])
    out = []
    for k in range(FACTOR):
        r = df.copy()
        vecs = np.stack(r.embedding.to_numpy()).astype(np.float32)
        if k > 0:
            nudge = np.float32(k) * np.float32(1e-3)
            rows = np.arange(len(r))
            vecs[rows, (df.vec_id.to_numpy() % dim)] += nudge
        r["embedding"] = list(vecs)
        r["vec_id"] = r.vec_id + k * ID_STRIDE
        out.append(r)
    allr = pd.concat(out, ignore_index=True)
    tbl = pa.Table.from_pandas(allr, preserve_index=False)
    # keep list<float32> exactly as the source schema has it
    tbl = tbl.cast(pa.schema([
        pa.field("vec_id", pa.int64()),
        pa.field("embedding", t.schema.field("embedding").type),
        pa.field("label", pa.int32())]))
    write(dst_path, tbl, row_group_size=10_000)


def expand_events(src_path, dst_path):
    t = pq.read_table(src_path)
    # preserve the source ts unit EXACTLY (the driver has shipped both
    # timestamp[ns] and timestamp[us] tiers across rounds; the oracle's
    # epoch_ns(ts) and Spark's parquet reader are both unit-agnostic,
    # so the only invariant that matters is expanded == source schema)
    ts_type = t.schema.field("ts").type
    assert ts_type in (pa.timestamp("ns"), pa.timestamp("us")), t.schema
    df = t.to_pandas()
    out = []
    for k in range(FACTOR):
        r = df.copy()
        r["event_id"] = r.event_id + k * ID_STRIDE
        if k > 0:
            r["ts"] = r.ts + pd.to_timedelta(k, unit="us")
        out.append(r)
    allr = pd.concat(out, ignore_index=True)
    tbl = pa.Table.from_pandas(allr, preserve_index=False)
    if tbl.schema.field("ts").type != ts_type:
        tbl = tbl.set_column(
            tbl.schema.get_field_index("ts"), "ts",
            tbl.column("ts").cast(ts_type))
    write(dst_path, tbl, row_group_size=100_000)


def expand_keyed(src_path, dst_path, key_cols, stride, row_group_size):
    df = pq.read_table(src_path).to_pandas()
    out = []
    for k in range(FACTOR):
        r = df.copy()
        for c in key_cols:
            r[c] = r[c] + k * stride
        out.append(r)
    write(dst_path, pa.Table.from_pandas(
        pd.concat(out, ignore_index=True), preserve_index=False),
        row_group_size=row_group_size)


def write(path, tbl, row_group_size):
    pq.write_table(tbl, path, row_group_size=row_group_size)
    print(f"  {os.path.basename(path)}: {tbl.num_rows} rows, "
          f"{os.path.getsize(path) / 1e6:.1f} MB")


def main():
    os.makedirs(DST, exist_ok=True)
    print(f"expanding {SRC} -> {DST} ({FACTOR}x)")
    expand_documents(f"{SRC}/documents.parquet", f"{DST}/documents.parquet")
    expand_embeddings(f"{SRC}/embeddings.parquet", f"{DST}/embeddings.parquet")
    expand_events(f"{SRC}/events.parquet", f"{DST}/events.parquet")
    expand_keyed(f"{SRC}/orders.parquet", f"{DST}/orders.parquet",
                 ["o_orderkey"], ORDER_STRIDE, 100_000)
    expand_keyed(f"{SRC}/lineitem.parquet", f"{DST}/lineitem.parquet",
                 ["l_orderkey"], ORDER_STRIDE, 200_000)
    for dim in ("region", "nation", "customer", "supplier", "part"):
        tbl = pq.read_table(f"{SRC}/{dim}.parquet")
        write(f"{DST}/{dim}.parquet", tbl, row_group_size=100_000)
    print("done (deterministic: re-running overwrites with identical bytes)")


if __name__ == "__main__":
    main()
