"""Deterministic large-SF driver-shaped tables (round-5 VERDICT #3).

The driver ships sf0.001/0.01/0.1; the dedup/ANN/text queries had
never run above sf0.1 and they are the superlinear ones. /root/testdata
is read-only, so this tool synthesizes ~sf1-scale `events`,
`documents`, `embeddings` parquet tables with the SAME SCHEMA and
similar value distributions (vocab extracted from the real sf0.1
documents; langs/sources/event types matched), fully seeded — no
external data. The oracle gate then compares Spark vs DuckDB on the
same files, so correctness never depends on the generator matching the
driver's distributions exactly; the scale does.

Planted structure (so dedup queries exercise their row-producing
paths): ~1% exact duplicate documents, ~1% near-duplicates (3-word
substitutions), ~100 near-identical embedding pairs.

Usage: python tools/make_bigsf.py [outdir] [events_n docs_n emb_n]
Defaults: /tmp/tstoken_sfbig 1_000_000 50_000 8_000
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

SEED = 20260818


def load_vocab() -> list[str]:
    import duckdb

    con = duckdb.connect()
    words = con.execute(
        "SELECT DISTINCT unnest(string_split(text, ' ')) w "
        "FROM '/root/testdata/sf0.1/documents.parquet' ORDER BY w"
    ).fetchdf()["w"].tolist()
    return [w for w in words if w]


def make_documents(n: int, rng: np.random.Generator) -> pd.DataFrame:
    vocab = np.array(load_vocab())
    langs = np.array(["en", "fr", "de", "es", "zh"])
    lang_p = np.array([0.40, 0.15, 0.15, 0.15, 0.15])
    n_words = rng.integers(35, 80, size=n)
    texts: list[str] = []
    for i in range(n):
        texts.append(" ".join(
            vocab[rng.integers(0, len(vocab), size=n_words[i])]))
    # exact duplicates: the last 1% copy an earlier doc verbatim
    n_dup = n // 100
    dup_src = rng.integers(0, n - n_dup, size=n_dup)
    for j, s in enumerate(dup_src):
        texts[n - n_dup + j] = texts[s]
    # near-duplicates: the 1% before that copy with 3 substitutions
    n_near = n // 100
    near_src = rng.integers(0, n - 2 * n_near, size=n_near)
    for j, s in enumerate(near_src):
        w = texts[s].split(" ")
        for pos in rng.integers(0, len(w), size=3):
            w[pos] = vocab[rng.integers(0, len(vocab))]
        texts[n - 2 * n_near + j] = " ".join(w)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(langs, size=n, p=lang_p),
        "source": [f"src{i}" for i in rng.integers(0, 20, size=n)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def make_embeddings(n: int, rng: np.random.Generator) -> pd.DataFrame:
    dim, n_labels = 64, 10
    labels = rng.integers(0, n_labels, size=n)
    mu = rng.standard_normal((n_labels, dim)) * 0.33  # weak clusters
    vec = mu[labels] + rng.standard_normal((n, dim))
    # ~100 planted near-identical pairs (vec + small noise)
    n_pairs = 100
    src = rng.integers(0, n - n_pairs, size=n_pairs)
    vec[n - n_pairs:] = vec[src] + 0.05 * rng.standard_normal(
        (n_pairs, dim))
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in vec],
        "label": labels.astype(np.int32),
    })


def make_events(n: int, rng: np.random.Generator) -> pd.DataFrame:
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = int(140 * 24 * 3600 * 1e6)
    ts = np.sort(rng.integers(0, span_us, size=n)).astype("timedelta64[us]")
    types = np.array(["view", "click", "purchase", "signup", "error"])
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": t0 + ts,
        "user_id": rng.integers(0, 2000, size=n).astype(np.int64),
        "event_type": types[rng.integers(0, len(types), size=n)],
        "value": np.round(rng.exponential(100.0, size=n), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n)],
    })


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tstoken_sfbig"
    events_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    docs_n = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    emb_n = int(sys.argv[4]) if len(sys.argv) > 4 else 8_000
    os.makedirs(out, exist_ok=True)
    marker = os.path.join(out, "_MANIFEST.json")
    manifest = {"seed": SEED, "events": events_n, "documents": docs_n,
                "embeddings": emb_n}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == manifest:
                print(json.dumps({"reused": out, **manifest}))
                return
    rng = np.random.default_rng(SEED)
    # one shared rng, fixed generation ORDER -> deterministic bytes
    make_documents(docs_n, rng).to_parquet(
        os.path.join(out, "documents.parquet"), index=False)
    make_embeddings(emb_n, rng).to_parquet(
        os.path.join(out, "embeddings.parquet"), index=False)
    make_events(events_n, rng).to_parquet(
        os.path.join(out, "events.parquet"), index=False)
    with open(marker, "w") as f:
        json.dump(manifest, f)
    print(json.dumps({"wrote": out, **manifest}))


if __name__ == "__main__":
    main()
