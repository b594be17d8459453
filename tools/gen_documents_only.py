"""Documents-only stress corpus generator for dedup saturation probes.

Mirrors tools/gen_bench_data.py's documents table (same vocabulary,
length distribution, and dup-plant structure) without paying for the
star-schema tables — the MinHash/LSH saturation probes read ONLY
documents.parquet. NOT byte-identical to gen_bench_data.py at the same
sf (that generator's rng has consumed the upstream tables' draws);
deterministic under its own seed, which is all a stress probe needs.

Usage:
    python tools/gen_documents_only.py SF OUT_DIR [--vocab uniform|zipf] [--seed N]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.gen_bench_data import LANG_P, LANGS, _make_vocab  # noqa: E402


def main(sf: float, out_dir: str, seed: int = 42, vocab_mode: str = "uniform") -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_doc = int(50_000 * sf) or 1
    vocab, vocab_p = _make_vocab(vocab_mode, rng)
    pool = (
        rng.choice(len(vocab), int(n_doc * 46) + 128, p=vocab_p)
        if vocab_p is not None
        else None
    )
    cursor = 0
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.005:
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 10 and r < 0.035:
            base = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(max(1, len(base) // 20)):
                base[int(rng.integers(0, len(base)))] = str(
                    vocab[int(rng.integers(0, len(vocab)))]
                )
            texts.append(" ".join(base))
        else:
            n_w = int(rng.integers(15, 71))
            if pool is not None:
                if cursor + n_w > len(pool):
                    pool = rng.choice(len(vocab), len(pool), p=vocab_p)
                    cursor = 0
                idx = pool[cursor : cursor + n_w]
                cursor += n_w
            else:
                idx = rng.integers(0, len(vocab), n_w)
            texts.append(" ".join(vocab[idx]))
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(n_doc), pa.int64()),
            "text": texts,
            "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
            "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
            "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))
    print(f"wrote {n_doc} docs to {out_dir}/documents.parquet")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:]]
    mode = "uniform"
    seed = 42
    if "--vocab" in argv:
        i = argv.index("--vocab")
        mode = argv[i + 1]
        del argv[i : i + 2]
    if "--seed" in argv:
        i = argv.index("--seed")
        seed = int(argv[i + 1])
        del argv[i : i + 2]
    main(float(argv[0]), argv[1], seed=seed, vocab_mode=mode)
