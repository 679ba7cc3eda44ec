"""Self-similar documents/embeddings tables above sf0.1, for the
scale bench (tools/bench_scale.py → BENCH_SCALE.json).

The driver's testdata stops at sf0.1 (5,000 docs / 2,000 vectors);
the heavy extension paths (LSH, SRP near-dup, curation chain) have
plan-shape arguments for 100× but no MEASUREMENT above sf0.1. This
generator produces larger instances of the SAME data family so
sf0.1→sf1 scaling exponents are meaningful:

* text: words drawn from the sf0.1 corpus's own vocabulary with its
  empirical word frequencies; doc length uniform over the corpus's
  observed [min,max] word count; per-doc lang from the empirical
  lang mix; ``source`` uniform over the same 20 sources.
* duplicate structure at CONSTANT fractions (what keeps dedup output
  ~linear in N, as a real crawl's is): ~0.16% exact copies of an
  earlier doc, ~4.5% near-dups (an earlier doc with 1-3 words
  mutated) — matching the rates measured in the driver's sf0.1
  (8/5000 exact dups, 225 shared-100-char-prefix pairs).
* embeddings: iid N(0, 0.125^2) float32 per component (the driver
  data's measured shape: pairwise cosine ~N(0, 1/sqrt(64))), labels
  uniform 0..9.

IMPORTANT for exponents: compare runs on THIS generator's sf0.1'
against THIS generator's sf1' (both written by the same code), never
driver-sf0.1 against generated-sf1 — generator differences would
pollute the exponent.

Usage::

    python tools/gen_scale_data.py --out /tmp/sfscale/sf0.1 --docs 5000 --vecs 2000
    python tools/gen_scale_data.py --out /tmp/sfscale/sf1   --docs 50000 --vecs 20000
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF_DOCS = "/root/testdata/sf0.1/documents.parquet"

EXACT_DUP_FRAC = 0.0016
NEAR_DUP_FRAC = 0.045
DIMS = 64
N_SOURCES = 20
COMP_STD = 0.125


def _corpus_stats():
    """Vocabulary + empirical word/lang frequencies from the driver's
    sf0.1 documents — the generated corpus is the same family, just
    bigger."""
    t = pq.read_table(REF_DOCS, columns=["text", "lang"])
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    from collections import Counter

    wc: Counter = Counter()
    lens = []
    for s in texts:
        ws = s.split(" ")
        lens.append(len(ws))
        wc.update(ws)
    vocab = sorted(wc)
    freqs = np.array([wc[w] for w in vocab], dtype=float)
    lc = Counter(langs)
    lang_names = sorted(lc)
    lang_p = np.array([lc[x] for x in lang_names], dtype=float)
    return (
        vocab,
        freqs / freqs.sum(),
        min(lens),
        max(lens),
        lang_names,
        lang_p / lang_p.sum(),
    )


def gen_documents(n_docs: int, seed: int = 42):
    vocab, word_p, min_w, max_w, langs, lang_p = _corpus_stats()
    rng = np.random.default_rng(seed)
    varr = np.array(vocab)
    # pre-draw the whole word stream at once (one vectorized choice
    # instead of n_docs small ones)
    n_words = rng.integers(min_w, max_w + 1, size=n_docs)
    stream = rng.choice(len(varr), size=int(n_words.sum()), p=word_p)
    kinds = rng.random(n_docs)
    dup_src = rng.integers(0, np.maximum(1, np.arange(n_docs)))
    texts: list[str] = []
    off = 0
    for i in range(n_docs):
        k = int(n_words[i])
        words = varr[stream[off : off + k]]
        off += k
        if i > 10 and kinds[i] < EXACT_DUP_FRAC:
            texts.append(texts[int(dup_src[i])])
            continue
        if i > 10 and kinds[i] < NEAR_DUP_FRAC:
            base = texts[int(dup_src[i])].split(" ")
            n_mut = 1 + int(kinds[i] * 1000) % 3
            for j in range(n_mut):
                base[(i * 7 + j * 13) % len(base)] = words[j % k]
            texts.append(" ".join(base))
            continue
        texts.append(" ".join(words))
    lang_col = np.array(langs)[rng.choice(len(langs), size=n_docs, p=lang_p)]
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
            "source": pa.array(
                [f"src{i % N_SOURCES}" for i in range(n_docs)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n_vecs: int, seed: int = 43):
    rng = np.random.default_rng(seed)
    E = np.clip(
        rng.normal(0.0, COMP_STD, size=(n_vecs, DIMS)), -0.58, 0.58
    ).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(list(E), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=n_vecs).astype(np.int32), pa.int32()
            ),
        }
    )


REF_EVENTS = "/root/testdata/sf0.1/events.parquet"

#: sf0.1 shape: 100k events / 1.5k users / 30-day span. Scaling rows
#: and users TOGETHER keeps per-user event density constant — the
#: horizontal-growth regime (more entities, same per-entity activity)
#: where per-key windows/sessions/join fan-outs stay fixed-size and a
#: healthy operator scales ~linearly. The time span stays constant.
EVENTS_PER_USER = 100_000 / 1_500


def gen_events(n_events: int, seed: int = 44):
    """Self-similar events table: empirical type mix and value
    distribution resampled from the driver's sf0.1 events, uniform
    timestamps over the same 30-day span, users scaled with rows."""
    import pyarrow.compute as pc

    ref = pq.read_table(REF_EVENTS, columns=["ts", "event_type", "value"])
    rng = np.random.default_rng(seed)
    n_users = max(1, int(round(n_events / EVENTS_PER_USER)))
    lo = pc.min(ref["ts"]).value
    hi = pc.max(ref["ts"]).value
    types = ref["event_type"].to_numpy(zero_copy_only=False)
    values = ref["value"].to_numpy()
    ts = np.sort(rng.integers(lo, hi, size=n_events))
    return pa.table(
        {
            "event_id": pa.array(range(n_events), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n_events), pa.int64()
            ),
            "event_type": pa.array(
                types[rng.integers(0, len(types), size=n_events)], pa.string()
            ),
            "value": pa.array(
                values[rng.integers(0, len(values), size=n_events)],
                pa.float64(),
            ),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n_events)],
                pa.string(),
            ),
        }
    )


REF_SF_DIR = "/root/testdata/sf0.1"

#: (table, scaling key columns) — key offsets keep the k replicas
#: DISJOINT in every key domain, so join fan-outs and selectivities
#: are exactly the sf0.1 ones at k x rows: self-similar "horizontal"
#: growth, the same regime the docs/events generators use. Dimension
#: tables (region, nation) stay constant, as TPC-H itself scales.
_TPCH_FACTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}
_TPCH_DIMS = ("region", "nation")


def gen_tpch(out_dir: str, ratio: int) -> dict:
    """Replicate the driver's sf0.1 TPC-H-ish tables ``ratio`` times
    with per-replica key offsets (non-key columns copied verbatim, so
    every value distribution — dates, prices, statuses — is exactly
    the reference one). ratio=1 writes a byte-equal copy: compare
    THIS generator's k=1 against THIS generator's k=10."""
    import pyarrow.compute as pc

    # one shared offset per key DOMAIN (custkey appears in customer
    # and orders; orderkey in orders and lineitem) so references stay
    # intact across tables within a replica
    domains = {}
    tabs = {}
    for name, keys in _TPCH_FACTS.items():
        tabs[name] = pq.read_table(os.path.join(REF_SF_DIR, f"{name}.parquet"))
        for k in keys:
            dom = k.split("_", 1)[1]  # custkey / orderkey / ...
            hi = pc.max(tabs[name][k]).as_py()
            domains[dom] = max(domains.get(dom, 0), hi + 1)
    counts = {}
    for name, keys in _TPCH_FACTS.items():
        t = tabs[name]
        reps = []
        for i in range(ratio):
            r = t
            for k in keys:
                off = i * domains[k.split("_", 1)[1]]
                if off:
                    r = r.set_column(
                        r.schema.get_field_index(k),
                        k,
                        pc.add(r[k], off),
                    )
            reps.append(r)
        out = pa.concat_tables(reps)
        pq.write_table(
            out, os.path.join(out_dir, f"{name}.parquet"), row_group_size=65536
        )
        counts[name] = out.num_rows
    for name in _TPCH_DIMS:
        t = pq.read_table(os.path.join(REF_SF_DIR, f"{name}.parquet"))
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        counts[name] = t.num_rows
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--vecs", type=int, required=True)
    ap.add_argument("--events", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--tpch-ratio", type=int, default=0,
        help="replicate the sf0.1 TPC-H tables this many times "
        "(key-offset disjoint copies; 0 = skip)",
    )
    ap.add_argument(
        "--exact-dup-frac", type=float, default=None,
        help="override EXACT_DUP_FRAC (high-dup-mass dedup fixtures)",
    )
    ap.add_argument(
        "--near-dup-frac", type=float, default=None,
        help="override NEAR_DUP_FRAC (high-dup-mass dedup fixtures)",
    )
    args = ap.parse_args()
    global EXACT_DUP_FRAC, NEAR_DUP_FRAC
    if args.exact_dup_frac is not None:
        EXACT_DUP_FRAC = args.exact_dup_frac
    if args.near_dup_frac is not None:
        NEAR_DUP_FRAC = args.near_dup_frac
    os.makedirs(args.out, exist_ok=True)
    docs = gen_documents(args.docs, args.seed)
    pq.write_table(
        docs, os.path.join(args.out, "documents.parquet"), row_group_size=65536
    )
    emb = gen_embeddings(args.vecs, args.seed + 1)
    pq.write_table(
        emb, os.path.join(args.out, "embeddings.parquet"), row_group_size=65536
    )
    n_ev = 0
    if args.events:
        ev = gen_events(args.events, args.seed + 2)
        pq.write_table(
            ev, os.path.join(args.out, "events.parquet"), row_group_size=65536
        )
        n_ev = ev.num_rows
    tpch = gen_tpch(args.out, args.tpch_ratio) if args.tpch_ratio else {}
    print(
        f"wrote {args.out}: documents={docs.num_rows}"
        f" embeddings={emb.num_rows} events={n_ev} tpch={tpch}"
    )


if __name__ == "__main__":
    main()

