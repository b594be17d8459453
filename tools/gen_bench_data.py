#!/usr/bin/env python
"""Generate bench-scale synthetic testdata matching the driver tables.

The driver ships sf0.001/0.01/0.1 parquet (TESTDATA.md); scale claims
above sf0.1 need a bigger dataset, and /root/testdata is read-only —
so this tool regenerates the SAME star schema + events/documents/
embeddings tables at an arbitrary scale factor, with distributions
fitted to the shipped data (measured from sf0.1: row ratios, value
ranges, category sets, near-dup plant rate, 30-day event window,
31-word document vocabulary). Seeded and deterministic.

NOT a byte-replica of the driver generator — row VALUES differ — but
row counts, schemas, key relationships (FK fan-outs), duplicate/cluster
structure, and value ranges match, which is what bench slopes measure.

Usage:
    python tools/gen_bench_data.py 1.0 /tmp/sf1.0
    python tools/gen_bench_data.py 1.0 /tmp/sf1.0-zipf --vocab zipf

`--vocab zipf` swaps the 31-word uniform vocabulary (which SATURATES
the 3-gram space — mean gram df ~68 at sf1.0, the adversarial case
that motivated the pair-key candidate scheme) for a 50,000-word
Zipf(1.07) vocabulary: heavy-tailed like natural text, mean gram df
~1, the regime where the classic single-gram prefix join is the
predicted winner. Document length / dup-plant structure identical.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark batch part line column order small sort fast value scan a hash "
    "slow group agg filter query big key window row table stream merge data "
    "vector join customer the supplier"
).split()  # 31 words, matching the shipped documents vocabulary size

LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.5, 0.125, 0.125, 0.125, 0.125]
SEGMENTS = ["BUILDING", "FURNITURE", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
ADJ = ["large", "hot", "blue", "red", "small", "green", "dim", "cold"]
NOUN = ["ring", "bolt", "screw", "nut", "washer", "plate", "rod", "cap"]

EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
DAY_US = 86_400_000_000


_MANIFEST: dict[str, dict] = {}  # per-table row counts + file digests


def _write(d: str, name: str, table: pa.Table) -> None:
    path = os.path.join(d, f"{name}.parquet")
    pq.write_table(table, path)
    _MANIFEST[name] = {
        "rows": table.num_rows,
        "sha256": _file_sha256(path),
        "bytes": os.path.getsize(path),
    }
    print(f"{name}: {table.num_rows} rows")


def _file_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _make_vocab(mode: str, rng: np.random.Generator):
    """(word array, draw pmf or None-for-uniform) for a vocabulary mode."""
    if mode == "zipf":
        v = 50_000
        p = np.arange(1, v + 1, dtype="float64") ** -1.07
        p /= p.sum()
        return np.array([f"w{i:05d}" for i in range(v)]), p
    if mode != "uniform":
        raise ValueError(f"unknown vocab mode {mode!r}")
    return np.array(VOCAB), None


def write_manifest(out_dir: str, sf: float, seed: int, vocab_mode: str = "uniform") -> None:
    """Provenance manifest (VERDICT r5 ask #3): the r4→r5 sf1.0
    regeneration silently changed the document mix (generator-code
    evolution under the same seed) and a cross-round slope comparison
    cost a re-profile instead of a diff. The manifest pins WHAT corpus a
    measurement ran on — generator digest + seed + per-table row counts
    and file digests — and bench.py echoes it into BENCH/SCALING
    artifacts so slope tables are comparable-or-flagged by inspection."""
    manifest = {
        "generator": os.path.basename(__file__),
        "generator_sha256": _file_sha256(os.path.abspath(__file__)),
        "seed": seed,
        "sf": sf,
        "vocab_mode": vocab_mode,
        "tables": dict(sorted(_MANIFEST.items())),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"manifest.json: generator {manifest['generator_sha256'][:12]} seed {seed}")


def main(sf: float, out_dir: str, seed: int = 42, vocab_mode: str = "uniform") -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf / 1.0) or 1
    n_supp = int(10_000 * sf) or 1
    n_part = int(200_000 * sf) or 1
    n_ord = int(1_500_000 * sf) or 1
    n_li_per = rng.integers(1, 8, n_ord)  # avg ~4 lineitems/order
    n_ev = int(1_000_000 * sf) or 1
    n_users = int(15_000 * sf) or 1
    n_doc = int(50_000 * sf) or 1
    n_emb = int(20_000 * sf) or 1

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": regions,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{ADJ[i % len(ADJ)]} {NOUN[(i // len(ADJ)) % len(NOUN)]}"
            for i in rng.integers(0, 64, n_part)
        ],
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 999.9, n_part), 2),
    }))

    odate_days = rng.integers(0, 2405, n_ord)  # 1995-01-01 .. 2001-08-01
    odate = (
        np.datetime64("1995-01-01", "us").astype("int64") + odate_days * DAY_US
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    li_order = np.repeat(np.arange(n_ord), n_li_per)
    n_li = len(li_order)
    li_linenum = np.concatenate([np.arange(1, k + 1) for k in n_li_per])
    qty = rng.integers(1, 51, n_li).astype("float64")
    price_per = rng.uniform(900, 2100, n_li)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(li_order, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(li_linenum, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * price_per, 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(
            odate[li_order] + rng.integers(1, 96, n_li) * DAY_US, pa.timestamp("us")
        ),
    }))

    ev_ts = EPOCH_2024 + rng.integers(0, 30 * DAY_US, n_ev)
    ev_ts.sort()
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ev_ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.uniform(0, 500, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 15-70 words from the selected vocabulary, ~3% near-dup
    # copies of an earlier doc (a few words swapped) + ~0.5% exact dups —
    # the plant structure the dedup family's runtime depends on
    vocab, vocab_p = _make_vocab(vocab_mode, rng)
    # non-uniform draws come from one vectorized pre-drawn pool: a
    # per-doc rng.choice against a 50k-entry pmf re-scans the cdf every
    # call (minutes at sf10), one bulk draw is a single pass
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
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    # embeddings: 10 unit-norm label centroids + noise; ~2% planted
    # near-identical copies (the embedding-cosine dedup workload)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(0, 0.25, (n_emb, 64))
    dup_idx = rng.choice(n_emb, max(1, n_emb // 50), replace=False)
    src_idx = rng.choice(n_emb, len(dup_idx), replace=True)
    vecs[dup_idx] = vecs[src_idx] + rng.normal(0, 0.001, (len(dup_idx), 64))
    labels[dup_idx] = labels[src_idx]
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype("float32")], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))

    write_manifest(out_dir, sf, seed, vocab_mode)


def backfill_manifest(out_dir: str, sf: float, seed: int = 42) -> None:
    """Write a manifest for an ALREADY-generated dir (hash existing files
    instead of regenerating — regeneration would risk silently changing
    the corpus under previously-recorded slope measurements, the exact
    failure the manifest exists to catch). Marked `backfilled` so a
    reader knows the generator digest is the one current at manifest
    time, not necessarily at generation time."""
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        path = os.path.join(out_dir, f"{name}.parquet")
        _MANIFEST[name] = {
            "rows": pq.ParquetFile(path).metadata.num_rows,
            "sha256": _file_sha256(path),
            "bytes": os.path.getsize(path),
        }
    write_manifest(out_dir, sf, seed)
    with open(os.path.join(out_dir, "manifest.json")) as f:
        m = json.load(f)
    m["backfilled"] = True
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(m, f, indent=2)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--backfill":
        d = sys.argv[2]
        backfill_manifest(d, float(os.path.basename(d.rstrip("/")).removeprefix("sf")))
    else:
        # consume --vocab's VALUE as part of the option (both
        # `--vocab zipf` and `--vocab=zipf`), so it is never mistaken
        # for the positional out_dir
        argv = sys.argv[1:]
        mode = "uniform"
        args: list[str] = []
        i = 0
        while i < len(argv):
            a = argv[i]
            if a == "--vocab":
                if i + 1 >= len(argv):
                    raise SystemExit("--vocab requires a value (uniform|zipf)")
                mode = argv[i + 1]
                i += 2
            elif a.startswith("--vocab="):
                mode = a.split("=", 1)[1]
                i += 1
            elif a.startswith("--"):
                raise SystemExit(f"unknown option {a}")
            else:
                args.append(a)
                i += 1
        if mode not in ("uniform", "zipf"):
            raise SystemExit(f"--vocab must be uniform or zipf, got {mode!r}")
        sf = float(args[0]) if args else 1.0
        out = args[1] if len(args) > 1 else f"/tmp/sf{args[0] if args else '1.0'}"
        main(sf, out, vocab_mode=mode)
