"""Deterministic synthetic data for the tokenized-sequence pipeline.

Shapes per FIXTURES.md F1/F2 and BASELINE.json input_hint:

* sequences(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)
  - doc_id = "{source}/{shard:04d}/{seq:012d}-{epoch}", ~1% malformed
  - skewed source distribution (one source ~60% of rows) to exercise
    AQE / salting
* lookup(join_key, _index, _id, _score, payload:struct) mirroring the
  ES hit envelope of spec/filters/fixtures/request_x_1.json:13-60;
  ~90% of (source, shard) keys present; some keys duplicated k>1 to
  exercise the scalar-vs-array merge rule (dsl_executor.rb:58).

Fully seeded (numpy PCG64, no wall-clock) and written via pyarrow —
generation itself never touches Spark so benchmarks measure the
engine, not the generator.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SOURCES = ["web", "books", "code", "wiki", "news", "forum", "legal", "patents"]
# heavy skew: web carries ~60% of rows (FIXTURES.md F1)
SOURCE_WEIGHTS = np.array([0.60, 0.10, 0.08, 0.06, 0.05, 0.05, 0.03, 0.03])
VOCAB = 50257
SHARDS_PER_SOURCE = 16
EPOCHS = [1700000000, 1700086400, 1700172800]


def gen_sequences(
    n_rows: int,
    seed: int = 42,
    malformed_frac: float = 0.01,
    mean_tok: int = 64,
    seq_start: int = 0,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    src_idx = rng.choice(len(SOURCES), size=n_rows, p=SOURCE_WEIGHTS)
    shard = rng.integers(0, SHARDS_PER_SOURCE, size=n_rows)
    seq = np.arange(seq_start, seq_start + n_rows, dtype=np.int64)
    epoch = np.asarray(EPOCHS)[rng.integers(0, len(EPOCHS), size=n_rows)]

    # Zipf-ish token lengths clipped to [1, 2048] (FIXTURES.md F1)
    n_tok = np.minimum(
        2048, np.maximum(1, (rng.pareto(1.5, size=n_rows) * mean_tok * 0.5 + 1).astype(np.int32))
    ).astype(np.int32)
    total = int(n_tok.sum())
    values = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(values)).cast(
        pa.list_(pa.int32())
    )

    srcs = np.asarray(SOURCES)[src_idx]
    doc_ids = np.array(
        [
            f"{s}/{sh:04d}/{q:012d}-{e}"
            for s, sh, q, e in zip(srcs, shard, seq, epoch)
        ],
        dtype=object,
    )
    bad = rng.random(n_rows) < malformed_frac
    n_bad = int(bad.sum())
    if n_bad:
        doc_ids[bad] = np.array(
            [f"CORRUPT::{i}::{rng.integers(1 << 30)}" for i in range(n_bad)], dtype=object
        )

    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(srcs, type=pa.string()),
        }
    )


def gen_lookup(seed: int = 42, match_frac: float = 0.90, max_dup: int = 10) -> pa.Table:
    """Snapshot lookup table keyed by "{source}/{shard:04d}".

    Mirrors the hit envelope + _source of request_x_1.json:13-60.
    A deterministic subset of keys appears k>1 times (array-merge path).
    """
    rng = np.random.default_rng(seed + 1)
    keys, idxs, ids, scores = [], [], [], []
    payload_rows = []
    row_id = 0
    for s in SOURCES:
        for sh in range(SHARDS_PER_SOURCE):
            if rng.random() >= match_frac:
                continue
            key = f"{s}/{sh:04d}"
            k = int(rng.integers(1, max_dup + 1)) if rng.random() < 0.2 else 1
            for j in range(k):
                keys.append(key)
                idxs.append(f"logstash-2014.08.{26 + (row_id % 3):02d}")
                ids.append(f"doc-{row_id:06d}")
                scores.append(round(float(rng.random() * 10), 4))
                payload_rows.append(
                    {
                        "response": int(rng.choice([200, 301, 404, 500])),
                        "bytes": int(rng.integers(100, 100000)),
                        "clientip": f"66.249.{rng.integers(0, 256)}.{rng.integers(0, 256)}",
                        "timestamp_ms": 1409000000000 + int(rng.integers(0, 10**9)),
                        "verb": str(rng.choice(["GET", "POST", "PUT"])),
                        "geoip": {
                            "ip": f"66.249.{rng.integers(0, 256)}.{rng.integers(0, 256)}",
                            "city_name": str(rng.choice(["Mountain View", "Paris", "Tokyo"])),
                            "location": [
                                float(np.round(rng.random() * 360 - 180, 4)),
                                float(np.round(rng.random() * 180 - 90, 4)),
                            ],
                        },
                    }
                )
                row_id += 1
    payload_type = pa.struct(
        [
            ("response", pa.int32()),
            ("bytes", pa.int64()),
            ("clientip", pa.string()),
            ("timestamp_ms", pa.int64()),
            ("verb", pa.string()),
            (
                "geoip",
                pa.struct(
                    [
                        ("ip", pa.string()),
                        ("city_name", pa.string()),
                        ("location", pa.list_(pa.float64())),
                    ]
                ),
            ),
        ]
    )
    return pa.table(
        {
            "join_key": pa.array(keys, type=pa.string()),
            "_index": pa.array(idxs, type=pa.string()),
            "_id": pa.array(ids, type=pa.string()),
            "_score": pa.array(scores, type=pa.float64()),
            "payload": pa.array(payload_rows, type=payload_type),
        }
    )


def write_dataset(
    out_dir: str, n_rows: int, seed: int = 42, rows_per_file: int = 250_000, **kw
) -> tuple[str, str]:
    """Write sequences (possibly multi-file for parallel scan) + lookup."""
    seq_dir = os.path.join(out_dir, "sequences")
    os.makedirs(seq_dir, exist_ok=True)
    written = 0
    part = 0
    while written < n_rows:
        chunk = min(rows_per_file, n_rows - written)
        # per-part seed keeps generation deterministic AND chunked
        tbl = gen_sequences(chunk, seed=seed + 1000 * part, seq_start=written, **kw)
        pq.write_table(tbl, os.path.join(seq_dir, f"part-{part:05d}.parquet"))
        written += chunk
        part += 1
    lookup_path = os.path.join(out_dir, "lookup.parquet")
    pq.write_table(gen_lookup(seed=seed), lookup_path)
    return seq_dir, lookup_path
