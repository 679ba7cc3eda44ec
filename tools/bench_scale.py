"""Compose BENCH_SCALE.json from two bench runs at different scales.

Reads the per-query detail JSONs saved from ``bench.py`` runs over
the tools/gen_scale_data.py corpora (self-similar 10x instances) and
records per-query scaling exponents::

    exponent = log(t_hi / t_lo) / log(scale_hi / scale_lo)

Exponent ~1.0 = linear (perfect), <=1.3 = the round's acceptance
bar (near-linear; constant factors and fixed overheads allowed),
>1.3 = investigate candidate blowup / quadratic creep. Exponents
well BELOW 1 usually mean the lower scale was overhead-dominated
(fixed JVM/job-submission cost), not sublinear algorithms.

Usage::

    python tools/bench_scale.py --lo /tmp/sfscale/detail_sf01.json \
        --hi /tmp/sfscale/detail_sf1.json --ratio 10 \
        --out BENCH_SCALE.json
"""

from __future__ import annotations

import argparse
import json
import math


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", required=True)
    ap.add_argument("--hi", required=True)
    ap.add_argument("--ratio", type=float, default=10.0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--bar", type=float, default=1.3)
    ap.add_argument(
        "--merge-into",
        default=None,
        help="existing cross-round ledger (BENCH_SCALE.json): fresh "
        "rows REPLACE same-name entries there, summary fields are "
        "recomputed over the merge, and --out is written FROM the "
        "merged result — so a per-round snapshot can never re-carry a "
        "stale row from the live file (the r13 dedup_semantic_text "
        "bookkeeping slip: the r12 re-measure landed only in the "
        "per-round file while the manual merge into the ledger was "
        "missed, and the next snapshot re-published the obsolete row)",
    )
    ap.add_argument(
        "--round",
        type=int,
        default=None,
        help="stamp measured_round on every fresh row (merge hygiene)",
    )
    args = ap.parse_args()
    with open(args.lo) as fh:
        lo = json.load(fh)
    with open(args.hi) as fh:
        hi = json.load(fh)
    qs = {}
    worst = None
    # slow-host suspects from either input ride into the composed
    # entry: an exponent built on an episode-inflated timing is not
    # evidence of quadratic creep, and downstream analysis needs to
    # see that in the artifact, not in a stderr line long gone
    sus_lo = set(lo.get("suspects") or [])
    sus_hi = set(hi.get("suspects") or [])
    for name, t_lo in sorted(lo["queries"].items()):
        t_hi = hi["queries"].get(name)
        if t_hi is None:
            continue
        # clamp sub-resolution timings: a 0.0 on either side would
        # raise (ZeroDivisionError / math domain) and abort the whole
        # composition on one degenerate entry
        exp = math.log(max(t_hi, 1e-3) / max(t_lo, 1e-3)) / math.log(args.ratio)
        qs[name] = {
            "sec_lo": t_lo,
            "sec_hi": t_hi,
            "exponent": round(exp, 3),
            "near_linear": exp <= args.bar,
        }
        if name in sus_lo or name in sus_hi:
            qs[name]["slow_host_suspect"] = sorted(
                (["lo"] if name in sus_lo else [])
                + (["hi"] if name in sus_hi else [])
            )
        if args.round is not None:
            qs[name]["measured_round"] = args.round
        if worst is None or exp > qs[worst]["exponent"]:
            worst = name
    if args.merge_into:
        with open(args.merge_into) as fh:
            ledger = json.load(fh)
        merged = dict(ledger.get("queries") or {})
        merged.update(qs)  # fresh rows replace stale same-name rows
        qs = merged
        worst = max(qs, key=lambda n: qs[n]["exponent"])
        ledger["queries"] = qs
        ledger["worst"] = worst
        ledger["all_near_linear"] = all(
            q.get("near_linear", True) for q in qs.values()
        )
        with open(args.merge_into, "w") as fh:
            json.dump(ledger, fh, indent=1)
            fh.write("\n")
    out = {
        "metric": "scaling_exponent",
        "ratio": args.ratio,
        "bar": args.bar,
        "sf_lo": lo.get("sf"),
        "sf_hi": hi.get("sf"),
        "queries": qs,
        "worst": worst,
        "all_near_linear": all(q["near_linear"] for q in qs.values()),
        "note": (
            "self-similar corpora from tools/gen_scale_data.py "
            "(constant dup fractions, iid embeddings); exponents "
            "compare the SAME generator at both scales"
        ),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: v["exponent"] for k, v in qs.items()}))
    print("all_near_linear:", out["all_near_linear"], "worst:", worst)


if __name__ == "__main__":
    main()
