"""Standing-store maintenance driver: the lifecycle operations a
long-lived deployment runs BETWEEN streaming triggers, from the
command line.

The streaming runners (``streaming/dedup.py`` / ``streaming/
similarity.py``) keep bucket/cell-partitioned indexes and a delta
label store on disk forever — the reference's online feature store is
the component that outlives every job (`src/lambda/
StreamingIngestAggFeatures/lambda_function.py:25-32`), and this repo's
file-backed twins accumulate small files and outgrow their pinned
bucket moduli the same way any keyed store does. This CLI is the
operator-facing surface over the maintenance primitives:

* ``compact-index``    — per-bucket small-file compaction of an
  ``ibucket=``-partitioned dedup index (exact / LSH band / hamming
  band / the substring runner's ``(id, pos, sh)`` window-occurrence
  index — the largest standing artifact, O(tokens) rows accreting one
  file per bucket per trigger — / the BM25 runner's ``postings`` and
  ``docs`` stores): ``compact_banded_index``.
* ``rebucket-index``   — GROW the pinned modulus online (16 → 4096
  without a rebuild): ``rebucket_banded_index``; ``--keys`` names the
  index's probe keys (``sh`` for the substring occurrence index,
  ``term`` / ``doc_id`` for the BM25 postings / docs stores —
  mid-replay adoption pinned in tests/test_streaming_retrieval.py).
* ``compact-vec-index`` — per-cell compaction of the embedding
  index: ``compact_embedding_index``.
* ``compact-bm25-stats`` — fold the BM25 runner's per-trigger
  (N, T) stats ledger into one horizon-carrying entry
  (``streaming/retrieval.py::compact_bm25_stats``; the horizon stops
  a post-compaction batch retry from double-counting).
* ``retrain-centroids`` — retrain the embedding index's centroids on
  its own vectors (sampled seeded k-means) and atomically re-cell the
  layout: ``recell_embedding_index``. Live runners adopt the flipped
  layout at their next trigger (per-batch ``_meta`` check); a flip
  landing mid-batch fails that trigger loudly and the retry routes
  correctly.
* ``recode-pq``        — retrain the IVF-PQ code index's centroids on
  the exact store's vectors, rebuild the seeded codebooks, atomically
  re-cell + re-code (``streaming/similarity_pq.py::recode_pq_index``);
  live runners adopt the flipped ``pq_version`` at their next trigger.
* ``compact-store``    — fold the cluster label store's deltas into a
  fresh full compaction: ``compact_cluster_store``.
* ``rebucket-store``   — grow the label store's modulus online:
  ``rebucket_cluster_store``.
* ``vacuum-store``     — reclaim history superseded by the newest
  compaction: ``vacuum_cluster_store``.
* ``forget``           — erase keys from a standing index
  (right-to-be-forgotten): key-only tombstones + physical purge of
  the touched leaves (``streaming/forget.py::forget_index_keys``);
  ``--scrub-outputs`` also erases the ids from a runner's committed
  batch artifacts.
* ``forget-store``     — erase documents from the cluster label store
  (touched clusters re-derived from surviving members' fingerprints,
  ``fps/`` scrubbed, corrected state compacted in atomically) and,
  with ``--index``, from its hamming discovery index; ``--vacuum``
  reclaims the erased ids' historical label rows immediately
  (``forget_cluster_store``).

Every subcommand prints ONE JSON manifest line (the orchestrator
contract shared with ``cli.py`` / ``curate_cli.py``). All operations
run quiesced — between triggers of the runner that owns the path —
exactly as their docstrings require; each is atomic via the
``_SUCCESS``-gated swap machinery, so a crash mid-operation heals on
the next runner start (``heal_swap_leftovers`` /
``heal_compaction_swap``).

Run::

    python -m amazon_sagemaker_feature_store_streaming_aggregation_spark.maintain_cli \
        rebucket-index --path /data/lsh_index --keys band,bhash --factor 4
"""

from __future__ import annotations

import argparse
import json
from collections.abc import Sequence


def parse_args(argv: Sequence[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="amazon_sagemaker_feature_store_streaming_aggregation_spark.maintain_cli",
        description="standing-store maintenance: compaction, online "
        "re-bucketing, vacuum",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    ci = sub.add_parser("compact-index", help="per-bucket small-file "
                        "compaction of an ibucket= index")
    ci.add_argument("--path", required=True)
    ci.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)
    ci.add_argument("--min-files", type=int, default=2)

    ri = sub.add_parser("rebucket-index", help="grow an ibucket= "
                        "index's pinned modulus online")
    ri.add_argument("--path", required=True)
    ri.add_argument("--keys", required=True,
                    help="comma-separated probe key columns, e.g. "
                    "band,bhash (LSH), band,bv (hamming), text_hash "
                    "(exact), sh (substring occurrence index)")
    ri.add_argument("--factor", type=int, default=2)

    cv = sub.add_parser("compact-vec-index", help="per-cell compaction "
                        "of a cell= embedding index")
    cv.add_argument("--path", required=True)
    cv.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)
    cv.add_argument("--min-files", type=int, default=2)

    cb = sub.add_parser(
        "compact-bm25-stats",
        help="fold the BM25 index's per-trigger stats ledger into one "
             "horizon-carrying entry (quiesced; atomic swap)",
    )
    cb.add_argument("--path", required=True,
                    help="the BM25 runner's index_dir (holds stats/)")

    rc = sub.add_parser(
        "retrain-centroids",
        help="retrain the embedding index's centroids on its own "
        "vectors (sampled seeded k-means) and atomically re-cell "
        "the layout",
    )
    rc.add_argument("--path", required=True, help="cell= embedding index")
    rc.add_argument("--centroids", required=True,
                    help="the centroid table dir the runner reads")
    rc.add_argument("--cells", type=int, default=None,
                    help="new cell count (default: auto_cells(N))")
    rc.add_argument("--id-col", default="vec_id")
    rc.add_argument("--seed", type=int, default=7)
    rc.add_argument("--max-iter", type=int, default=10)
    rc.add_argument("--sample-fraction", type=float, default=None,
                    help="train k-means on a deterministic sample "
                    "(the 100 TB path); re-assignment is always full")

    rq = sub.add_parser(
        "recode-pq",
        help="retrain the IVF-PQ index's centroids on the exact "
        "store's vectors, rebuild the seeded codebooks and atomically "
        "re-cell + re-code the layout",
    )
    rq.add_argument("--path", required=True, help="cell= PQ code index")
    rq.add_argument("--vecs", required=True, help="bucketed exact store")
    rq.add_argument("--centroids", required=True)
    rq.add_argument("--codebooks", required=True)
    rq.add_argument("--cells", type=int, default=None)
    rq.add_argument("--m", type=int, default=4)
    rq.add_argument("--codes", type=int, default=16)
    rq.add_argument("--id-col", default="vec_id")
    rq.add_argument("--seed", type=int, default=7)
    rq.add_argument("--max-iter", type=int, default=10)
    rq.add_argument("--sample-fraction", type=float, default=None)

    cs = sub.add_parser("compact-store", help="fold cluster-store "
                        "deltas into a fresh compaction")
    cs.add_argument("--path", required=True)
    cs.add_argument("--id-col", default="doc_id")

    rs = sub.add_parser("rebucket-store", help="grow the cluster "
                        "store's pinned modulus online")
    rs.add_argument("--path", required=True)
    rs.add_argument("--id-col", default="doc_id")
    rs.add_argument("--factor", type=int, default=2)

    vs = sub.add_parser("vacuum-store", help="reclaim store history "
                        "superseded by the newest compaction")
    vs.add_argument("--path", required=True)

    fi = sub.add_parser(
        "forget",
        help="erase keys from a standing index (right-to-be-forgotten): "
        "key-only tombstones + physical purge of the touched leaves",
    )
    fi.add_argument("--path", required=True,
                    help="ibucket= or cell= partitioned index")
    fi.add_argument("--ids", required=True,
                    help="comma-separated keys to erase")
    fi.add_argument("--key-col", default="doc_id",
                    help="the index's key column (doc_id / vec_id / "
                    "text_hash)")
    fi.add_argument("--part-col", default="ibucket",
                    help="partition column: ibucket (banded) or cell "
                    "(embedding)")
    fi.add_argument("--no-purge", action="store_true",
                    help="tombstone only; physical purge happens at the "
                    "next compaction (bulk-takedown amortization)")
    fi.add_argument("--scrub-outputs", default=None,
                    help="also scrub from this runner out_dir's committed "
                    "batch artifacts (pairs/bands/fps/vecs/marks/wins)")
    fi.add_argument("--scrub-ids", default=None,
                    help="DOCUMENT ids for --scrub-outputs when --ids is "
                    "in a different key domain (e.g. --key-col text_hash "
                    "erases by content hash, but artifacts are keyed by "
                    "doc id); defaults to --ids when the domains match")

    fs_ = sub.add_parser(
        "forget-store",
        help="erase documents from the cluster label store (touched "
        "clusters re-derived, fps scrubbed) and its discovery index",
    )
    fs_.add_argument("--path", required=True, help="cluster store root")
    fs_.add_argument("--index", default=None,
                     help="the store's hamming discovery index (erased "
                     "with the same ids when given)")
    fs_.add_argument("--ids", required=True)
    fs_.add_argument("--id-col", default="doc_id")
    fs_.add_argument("--hash-col", default="fp")
    fs_.add_argument("--max-hamming", type=int, default=3)
    fs_.add_argument("--bands", type=int, default=4)
    fs_.add_argument("--n-bits", type=int, default=64)
    fs_.add_argument("--vacuum", action="store_true",
                     help="vacuum the store afterwards so the erased "
                     "ids' historical label rows are physically gone")

    args = p.parse_args(argv)
    if getattr(args, "factor", 2) < 2:
        p.error("--factor must be >= 2")
    return args


def _parse_ids(s: str) -> list:
    """Comma-list → typed keys (integral strings become ints so the
    engine-side isin/anti-join literals match long id columns)."""
    out = []
    for x in s.split(","):
        x = x.strip()
        if not x:
            continue
        out.append(int(x) if x.lstrip("-").isdigit() else x)
    return out


def main(argv: Sequence[str] | None = None) -> int:
    args = parse_args(argv)

    from .session import get_spark

    spark = get_spark("store-maintenance")
    out: dict = {"cmd": args.cmd, "path": args.path}
    if args.cmd == "compact-index":
        from .streaming.dedup import compact_banded_index

        files = compact_banded_index(
            spark, args.path,
            target_bytes=args.target_bytes, min_files=args.min_files,
        )
        out["files_per_bucket"] = {str(k): v for k, v in files.items()}
    elif args.cmd == "rebucket-index":
        from .streaming.dedup import rebucket_banded_index

        keys = [k.strip() for k in args.keys.split(",") if k.strip()]
        out["n_buckets"] = rebucket_banded_index(
            spark, args.path, keys, factor=args.factor
        )
    elif args.cmd == "compact-vec-index":
        from .streaming.similarity import compact_embedding_index

        files = compact_embedding_index(
            spark, args.path,
            target_bytes=args.target_bytes, min_files=args.min_files,
        )
        out["files_per_cell"] = {str(k): v for k, v in files.items()}
    elif args.cmd == "compact-bm25-stats":
        from .streaming.retrieval import compact_bm25_stats

        out.update(compact_bm25_stats(spark, args.path))
    elif args.cmd == "retrain-centroids":
        from .streaming.similarity import recell_embedding_index

        out.update(
            recell_embedding_index(
                spark, args.path, args.centroids,
                n_cells=args.cells, id_col=args.id_col, seed=args.seed,
                max_iter=args.max_iter,
                sample_fraction=args.sample_fraction,
            )
        )
        out["centroids"] = args.centroids
    elif args.cmd == "recode-pq":
        from .streaming.similarity_pq import recode_pq_index

        out.update(
            recode_pq_index(
                spark, args.path, args.vecs, args.centroids,
                args.codebooks, n_cells=args.cells, m=args.m,
                n_codes=args.codes, id_col=args.id_col, seed=args.seed,
                max_iter=args.max_iter,
                sample_fraction=args.sample_fraction,
            )
        )
    elif args.cmd == "compact-store":
        from .streaming.dedup import compact_cluster_store

        out["compacted_through"] = compact_cluster_store(
            spark, args.path, id_col=args.id_col
        )
    elif args.cmd == "rebucket-store":
        from .streaming.dedup import rebucket_cluster_store

        out["n_buckets"] = rebucket_cluster_store(
            spark, args.path, factor=args.factor, id_col=args.id_col
        )
    elif args.cmd == "vacuum-store":
        from .streaming.dedup import vacuum_cluster_store

        out["removed"] = vacuum_cluster_store(spark, args.path)
    elif args.cmd == "forget":
        from .streaming.forget import forget_index_keys, scrub_batch_outputs

        # argument validation BEFORE any mutation: failing after the
        # tombstones/purge landed would exit without the manifest and
        # leave the operator unsure whether the erasure happened
        if (
            args.scrub_outputs
            and args.scrub_ids is None
            and args.key_col == "text_hash"
        ):
            raise SystemExit(
                "forget --scrub-outputs with --key-col text_hash needs "
                "--scrub-ids: the artifacts are keyed by document id, "
                "not by the content hash being erased (matching hash "
                "values against id columns would silently scrub nothing)"
            )
        ids = _parse_ids(args.ids)
        out.update(
            forget_index_keys(
                spark, args.path, ids,
                key_col=args.key_col, part_col=args.part_col,
                purge=not args.no_purge,
            )
        )
        if args.scrub_outputs:
            out["scrubbed_batches"] = scrub_batch_outputs(
                spark, args.scrub_outputs,
                _parse_ids(args.scrub_ids) if args.scrub_ids else ids,
            )
    elif args.cmd == "forget-store":
        from .streaming.forget import forget_cluster_store, forget_index_keys

        ids = _parse_ids(args.ids)
        out.update(
            forget_cluster_store(
                spark, args.path, ids,
                id_col=args.id_col, hash_col=args.hash_col,
                max_hamming=args.max_hamming, bands=args.bands,
                n_bits=args.n_bits,
            )
        )
        if args.index:
            out["index"] = forget_index_keys(
                spark, args.index, ids, key_col=args.id_col
            )
        if args.vacuum:
            from .streaming.dedup import vacuum_cluster_store

            out["vacuumed"] = vacuum_cluster_store(spark, args.path)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
