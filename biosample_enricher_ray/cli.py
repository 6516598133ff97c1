"""Command-line entry points (reference analog: /root/reference/biosample_enricher/cli.py
subcommand registry + cli_metrics.py evaluate flow).

Owns the Ray session (guarded init; the library never inits). Subcommands:

  validate    checkpointed constraint-suite run over parquet fragments → reports
  profile     column-stats profile only (null rate, HLL distinct, TDigest)
  dedup       exact / minhash near-dup over a parquet table
  gen-corpus  deterministic synthetic pages corpus (tests/benchmarks)

Usage: python -m biosample_enricher_ray.cli <subcommand> [options]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    # (the benign 'Failed to hash the schemas' warning is silenced by the
    # package __init__, which every process imports)


def cmd_validate(args: argparse.Namespace) -> int:
    import pyarrow.parquet as pq
    import ray

    from .pipelines.report import write_report
    from .pipelines.validate import default_pages_checks, default_pages_profile
    from .state.checkpoint import run_validation

    _init_ray(args.num_cpus)
    paths = sorted(glob.glob(args.input))
    if not paths:
        print(f"no parquet fragments match {args.input}", file=sys.stderr)
        return 2
    if args.suite:
        from .stages.suite import compile_suite

        checks = compile_suite(args.suite)
    else:
        lang_ref = dom_ref = None
        if args.lang_dim:
            lang_ref = ray.put(pq.read_table(args.lang_dim)["lang"].combine_chunks())
        if args.domain_dim:
            dom_ref = ray.put(pq.read_table(args.domain_dim)["domain"].combine_chunks())
        checks = default_pages_checks(lang_dim_ref=lang_ref, domain_dim_ref=dom_ref)
    result = run_validation(
        paths,
        args.out,
        checks,
        default_pages_profile(),
        files_per_partition=args.files_per_partition,
        max_concurrent_partitions=args.max_concurrent_partitions,
        resume=not args.no_resume,
    )
    report_paths = write_report(result, os.path.join(args.out, "report"))
    print(json.dumps({
        "n_rows": result.n_rows,
        "n_violations": result.total_violations,
        "passed": result.passed(),
        "report": report_paths["markdown"],
    }))
    return 0 if result.passed() or args.allow_violations else 1


def cmd_profile(args: argparse.Namespace) -> int:
    import ray.data

    from .pipelines.report import profile_table
    from .pipelines.validate import records_dataset, summarize_records
    from .stages.validator import ProfileSpec

    _init_ray(args.num_cpus)
    paths = sorted(glob.glob(args.input))
    ds = ray.data.read_parquet(paths)
    columns = args.columns.split(",") if args.columns else ds.schema().names
    spec = ProfileSpec(
        columns=columns,
        distinct_columns=args.distinct.split(",") if args.distinct else [],
        length_columns=args.lengths.split(",") if args.lengths else [],
    )
    res = summarize_records(records_dataset(ds, [], spec, path_column=None))
    out = profile_table(res)
    print(out.to_string(index=False))
    if args.out:
        out.to_csv(args.out, index=False)
    return 0


def cmd_dedup(args: argparse.Namespace) -> int:
    import ray.data

    from .stages.dedup import exact_dedup_groups, minhash_lsh_candidates

    _init_ray(args.num_cpus)
    paths = sorted(glob.glob(args.input))
    ds = ray.data.read_parquet(paths, columns=[args.id_column, args.text_column])
    if args.method == "exact":
        out = exact_dedup_groups(ds, args.text_column, args.id_column).to_pandas()
        dups = out[out["n"] > 1]
        print(json.dumps({"distinct": len(out), "dup_groups": len(dups),
                          "dup_rows": int((dups["n"] - 1).sum())}))
    else:
        pairs = minhash_lsh_candidates(
            ds, args.text_column, args.id_column,
            jaccard_threshold=args.threshold,
        ).to_pandas()
        print(json.dumps({"candidate_pairs": len(pairs)}))
        out = pairs
    if args.out:
        out.to_parquet(args.out, index=False)
    return 0


def cmd_gen_corpus(args: argparse.Namespace) -> int:
    from .sources.synthetic import CorpusSpec, write_corpus_parallel, write_dims

    if args.num_cpus:
        _init_ray(args.num_cpus)
    spec = CorpusSpec(n_rows=args.rows, n_files=args.files, seed=args.seed)
    paths = write_corpus_parallel(args.out, spec)
    write_dims(args.out)
    print(json.dumps({"files": len(paths), "rows": args.rows, "dir": args.out}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="biosample_enricher_ray")
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", parents=[common],
                       help="checkpointed constraint-suite run")
    v.add_argument("--input", required=True, help="parquet glob")
    v.add_argument("--out", required=True, help="checkpoint/output dir")
    v.add_argument("--lang-dim", default=None)
    v.add_argument("--domain-dim", default=None)
    v.add_argument("--suite", default=None,
                   help="YAML suite spec (overrides the default check suite)")
    v.add_argument("--files-per-partition", type=int, default=4)
    v.add_argument("--max-concurrent-partitions", type=int, default=2)
    v.add_argument("--no-resume", action="store_true")
    v.add_argument("--allow-violations", action="store_true")
    v.set_defaults(fn=cmd_validate)

    pr = sub.add_parser("profile", parents=[common], help="column-stats profile")
    pr.add_argument("--input", required=True)
    pr.add_argument("--columns", default=None)
    pr.add_argument("--distinct", default=None)
    pr.add_argument("--lengths", default=None)
    pr.add_argument("--out", default=None)
    pr.set_defaults(fn=cmd_profile)

    d = sub.add_parser("dedup", parents=[common], help="exact or minhash dedup")
    d.add_argument("--input", required=True)
    d.add_argument("--method", choices=["exact", "minhash"], default="exact")
    d.add_argument("--id-column", default="doc_id")
    d.add_argument("--text-column", default="text")
    d.add_argument("--threshold", type=float, default=0.8)
    d.add_argument("--out", default=None)
    d.set_defaults(fn=cmd_dedup)

    g = sub.add_parser("gen-corpus", parents=[common], help="synthetic pages corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--rows", type=int, default=100_000)
    g.add_argument("--files", type=int, default=8)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_gen_corpus)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
