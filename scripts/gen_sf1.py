#!/usr/bin/env python3
"""Generate the sf1 BENCH fixture (documents + embeddings only) as a
10x vocabulary-renaming replication of the read-only sf0.1 tables —
local tooling for the PLANS.md scaling-curve measurements, never read
by the engine or the oracle gate.

Why renaming replication: each replica k applies a per-replica word
bijection w -> w<k> to a deterministic ~half of the vocabulary, so a
replica is an ISOMORPHIC copy of sf0.1 (within-replica near-dup
structure, word-frequency shape, doc lengths all preserved exactly up
to the suffix chars) while cross-replica shingle Jaccard collapses
(any 3-gram containing a renamed word breaks; ~7/8 of trigrams do).
Duplicate RATE per corpus size therefore stays constant — the correct
null hypothesis when measuring how dedup cost scales with corpus size.
Embeddings replicate by dimension rotation (norms and within-replica
dot structure preserved) with per-replica label blocks, so the IVF
cell SIZE stays constant while nlist grows with the corpus — how a
production index actually scales.

Usage: python3 scripts/gen_sf1.py [outDir] [replicas]
       (defaults: benchdata/sf1, 10 — e.g. `benchdata/sf10 100` builds
       the 100x fixture for the sf10 scaling rows)
"""
import sys, os, hashlib
import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "benchdata/sf1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(OUT, exist_ok=True)

docs = duckdb.sql(f"SELECT * FROM '{SRC}/documents.parquet'").df()
emb = duckdb.sql(f"SELECT * FROM '{SRC}/embeddings.parquet'").df()
n_docs, n_vecs = len(docs), len(emb)
n_labels = int(emb["label"].max()) + 1


def rename_word(w: str, k: int) -> str:
    if k == 0:
        return w
    # deterministic ~half of the vocab is renamed per replica; the
    # renamed halves differ across replicas (hash salted by k). The
    # suffix separator '~' is absent from the source vocabulary's word
    # alphabet, so a rename can never collide with an existing word
    # (a bare "{w}{k}" suffix could map distinct "w" and "w1" to the
    # same token, breaking the per-replica bijection).
    h = hashlib.md5(f"{k}:{w}".encode()).digest()[0]
    return f"{w}~r{k}" if h % 2 == 0 else w


doc_parts = []
for k in range(REPLICAS):
    d = docs.copy()
    d["doc_id"] = d["doc_id"] + k * n_docs
    if k > 0:
        vocab = {}
        def rw(w, k=k):
            if w not in vocab:
                vocab[w] = rename_word(w, k)
            return vocab[w]
        d["text"] = d["text"].map(
            lambda t: " ".join(rw(w) for w in t.split(" ")))
    d["n_chars"] = d["text"].str.len().astype(docs["n_chars"].dtype)
    doc_parts.append(d)
docs1 = pd.concat(doc_parts, ignore_index=True)

emb_parts = []
for k in range(REPLICAS):
    e = emb.copy()
    e["vec_id"] = e["vec_id"] + k * n_vecs
    if k > 0:
        e["embedding"] = e["embedding"].map(lambda v, k=k: np.roll(v, k))
    e["label"] = e["label"] + k * n_labels
    emb_parts.append(e)
emb1 = pd.concat(emb_parts, ignore_index=True)

con = duckdb.connect()
con.register("d1", docs1)
con.register("e1", emb1)
con.sql(f"COPY (SELECT doc_id, text, lang, source, n_chars FROM d1) TO '{OUT}/documents.parquet' (FORMAT PARQUET)")
con.sql(f"COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, label FROM e1) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)")
print(f"wrote {len(docs1)} docs, {len(emb1)} embeddings to {OUT}")
