#!/usr/bin/env python3
"""Synthesize a larger scale factor of the driver's test schema for the
scaling-exponent audit (dev tooling only — the shipped Scala library never
touches Python). Writes to a SCRATCH dir; never touches /root/testdata.

Usage: python3 tools/gen_scale.py <outDir> [factor]

`factor` (default 10) scales every grow-with-sf table off /root/testdata/sf0.1,
giving an effective sf = 0.1 * factor.

Recipe per table (matches the observed sf0.001/0.01/0.1 recipe in TESTDATA.md
data — verified empirically in round 13):

- region/nation: fixed dims, copied verbatim.
- customer/supplier/part/orders/lineitem/events: replicate-with-key-offset.
  Every copy keeps its rows intact (all cross-column correlations preserved);
  only the keys shift by copy*N so join/group cardinalities scale linearly
  exactly as the driver's own sf ladder does (users 150→1500 at 0.01→0.1,
  same date windows at all sfs — densities grow, windows don't).
- documents: generated FRESH from the empirical recipe (31-word vocab,
  uniform 10..100 words, lang mix en~41%/4 others~15%, source src0..19,
  ~9.5% of docs in near-dup groups created by mutating 1..3 words of a
  prior doc, ~0.16% exact dups). Replicate-with-offset would be wrong here:
  10 exact copies of every doc would explode LSH buckets quadratically —
  a data-distribution change, not an engine-scaling measurement.
- embeddings: generated FRESH — 10 L2-normalized Gaussian clusters in 64-d
  (per-dim within-label sigma ≈0.125 measured at sf0.1), labels 0..9.

Determinism: seeded numpy RNG per table.
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def replicate_offset(name, out_dir, factor, offsets):
    """Concat `factor` copies, shifting each key column in `offsets` by
    copy * (max+1 of that column in the source)."""
    t = pq.read_table(f"{SRC}/{name}.parquet")
    bases = {c: int(pa.compute.max(t.column(c)).as_py()) + 1 for c in offsets}
    copies = []
    for k in range(factor):
        cols = {}
        for c in t.column_names:
            col = t.column(c)
            if c in offsets and k > 0:
                col = pa.compute.add(col, k * bases[c])
            cols[c] = col
        copies.append(pa.table(cols))
    pq.write_table(pa.concat_tables(copies), f"{out_dir}/{name}.parquet")
    print(f"  {name}: {t.num_rows} x {factor} = {t.num_rows * factor}")


def gen_documents(out_dir, factor, rng):
    vocab = np.array(  # the exact 31-word vocab observed at sf0.1
        "a agg batch big column customer data dup fast filter group hash "
        "join key line merge order part query row scan slow small sort "
        "spark stream table the value vector window".split())
    assert len(vocab) == 31
    n = 5000 * factor
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    texts = []
    for i in range(n):
        r = rng.random()
        if i > 0 and r < 0.0016:  # exact dup of a recent doc
            texts.append(texts[rng.integers(max(0, i - 500), i)])
        elif i > 0 and r < 0.095:  # near-dup: mutate 1..3 words
            words = texts[rng.integers(max(0, i - 500), i)].split(" ")
            for _ in range(rng.integers(1, 4)):
                words[rng.integers(0, len(words))] = vocab[rng.integers(0, 31)]
            texts.append(" ".join(words))
        else:
            ln = rng.integers(10, 101)
            texts.append(" ".join(vocab[rng.integers(0, 31, ln)]))
    tab = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": texts,
        "lang": langs[rng.choice(5, n, p=lang_p)],
        "source": [f"src{k}" for k in rng.integers(0, 20, n)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tab, f"{out_dir}/documents.parquet")
    print(f"  documents: {n} generated")


def gen_embeddings(out_dir, factor, rng):
    n, d = 2000 * factor, 64
    centroids = rng.normal(size=(10, d))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n)
    vecs = centroids[labels] + rng.normal(scale=0.125, size=(n, d))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tab, f"{out_dir}/embeddings.parquet")
    print(f"  embeddings: {n} generated")


def main():
    out_dir = sys.argv[1]
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    for t in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{out_dir}/{t}.parquet")
    replicate_offset("customer", out_dir, factor, ["c_custkey"])
    replicate_offset("supplier", out_dir, factor, ["s_suppkey"])
    replicate_offset("part", out_dir, factor, ["p_partkey"])
    replicate_offset("orders", out_dir, factor, ["o_orderkey", "o_custkey"])
    replicate_offset("lineitem", out_dir, factor,
                     ["l_orderkey", "l_partkey", "l_suppkey"])
    replicate_offset("events", out_dir, factor, ["event_id", "user_id"])
    gen_documents(out_dir, factor, rng)
    gen_embeddings(out_dir, factor, rng)
    print(f"wrote effective sf{0.1 * factor:g} to {out_dir}")


if __name__ == "__main__":
    main()
