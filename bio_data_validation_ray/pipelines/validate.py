"""The flagship pipeline: validate a directory of transcript Parquet shards.

Lifecycle (engine mapping of orchestrator.py:287-468, see SURVEY.md §3.4):

  driver: RuleRegistry (version + sha256 hash)
    -> resume filter: drop shards already committed in the lineage store
    -> stage A (DRV): declared-schema check, short-circuit on failure
       (orchestrator.py:366-371)
    -> stage B (one scan): map_batches(ValidateBatch) -> compact union stream
       {violations, conversation segments, sketch partials}; materialized once
       (it is orders of magnitude smaller than the input) and branched
    -> stage C: segment sort + vectorized merge -> conversation rules;
       exact re-check only for flagged conversations
    -> stage D: sketch reduce -> aggregate rules + drift vs baseline digests
    -> stage E: severity counts -> per-shard verdicts + global decision
       (policy_engine.py:145-182)
    -> sinks: violations.parquet, lineage commits, run_summary.json

The raw input is scanned exactly once (plus a tiny filtered re-read for
conversations that need the exact fallback). Nothing here calls ray.init().
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .. import drift as drift_mod
from ..policy import (SeverityCounts, decide, needs_review, passed,
                      select_top_issues)
from ..registry import RuleRegistry, transcript_registry
from ..schema import check_schema
from ..stages.convstage import (
    MergeSegments,
    conv_violations,
    exact_conv_frame,
    merge_segments_frame,
)
from ..sources.writers import write_parquet_idempotent
from ..stages.rowstage import ValidateBatch
from ..stages.statstage import ShardStats, agg_violations, reduce_sketches
from ..state.checkpoint import Lineage

VIO_COLS = ["shard", "conv_id", "turn_idx", "rule_id", "rule_version",
            "severity", "column", "offending_value"]
VIO_SCHEMA = pa.schema(
    [
        ("shard", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("rule_id", pa.string()),
        ("rule_version", pa.string()),
        ("severity", pa.string()),
        ("column", pa.string()),
        ("offending_value", pa.string()),
    ]
)
SEG_COLS = ["shard", "conv_id", "seg_turn_lo", "seg_turn_hi", "seg_n",
            "seg_dup", "seg_min_ts", "seg_max_ts", "seg_mono_ok"]


def vio_frame_to_table(df: pd.DataFrame) -> pa.Table:
    """Violation frame -> Arrow table with the declared schema, vectorized
    (from_pandas handles NaN/pd.NA -> null and integral-float -> int casts
    without a per-row Python loop)."""
    if len(df) == 0:
        return pa.Table.from_pydict({f.name: [] for f in VIO_SCHEMA}, schema=VIO_SCHEMA)
    arrays = []
    for f in VIO_SCHEMA:
        if f.name in df.columns:
            arrays.append(pa.array(df[f.name], type=f.type, from_pandas=True))
        else:
            arrays.append(pa.nulls(len(df), f.type))
    return pa.Table.from_arrays(arrays, schema=VIO_SCHEMA)


def _concat_vio_frames(frames) -> pd.DataFrame:
    """Concat violation frames without pandas' empty/all-NA dtype
    FutureWarning: skip empty frames and normalize the nullable turn_idx
    dtype up front so no column needs dtype exclusion logic."""
    norm = []
    for f in frames:
        if not len(f):
            continue
        f = f.copy()
        if "turn_idx" in f.columns:
            f["turn_idx"] = pd.array(f["turn_idx"], dtype="Int32")
        norm.append(f)
    if not norm:
        return pd.DataFrame(columns=VIO_COLS)
    if len(norm) == 1:
        return norm[0].reset_index(drop=True)
    return pd.concat(norm, ignore_index=True)


def list_shards(input_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(input_dir, "*.parquet")))


def _near_dup_violation(registry, files: list[str]) -> pd.DataFrame:
    """Evaluate a registry ``near_dup`` spec over ``files`` with the
    distributed MinHash+LSH pipeline, returning the one ``__all__``
    violation row when pairs exist — shared by validate_dir's agg stage
    and validate_resumable's final merge (which previously never ran it,
    silently dropping the rule in resumable mode). Ids are content hashes,
    so exact copies collapse (those are DUP_001's job) and only genuine
    near-duplicates pair up."""
    import ray.data as rd

    nd_spec = next((s for s in registry.agg_rules() if s.kind == "near_dup"),
                   None)
    if nd_spec is None or not files:
        return pd.DataFrame(columns=VIO_COLS)
    from ..functions.dedup import content_hash_batch, minhash_near_dups

    col = nd_spec.column or "text"
    nd_ds = rd.read_parquet(files, columns=[col]).map_batches(
        lambda b: content_hash_batch(b.dropna(subset=[col]), col=col)
        .rename(columns={"content_hash": "doc_id"})[["doc_id", col]],
        batch_format="pandas",
    )
    nd_pairs = minhash_near_dups(
        nd_ds, col=col, id_col="doc_id",
        threshold=nd_spec.params.get("threshold", 0.9),
        bucket_cap=nd_spec.params.get("bucket_cap", 512),
    )
    if not len(nd_pairs):
        return pd.DataFrame(columns=VIO_COLS)
    return pd.DataFrame({
        "shard": ["__all__"], "conv_id": [None],
        "turn_idx": pd.array([None], dtype="Int32"),
        "rule_id": [nd_spec.rule_id],
        "rule_version": [nd_spec.version],
        "severity": [nd_spec.severity], "column": [col],
        "offending_value": [f"near_dup_pairs={len(nd_pairs)}"],
    })


def validate_dir(
    input_dir: str,
    *,
    registry: RuleRegistry | None = None,
    run_dir: str | None = None,
    baseline_json: str | None = None,
    resume: bool = True,
    batch_size: int | None = None,
    concurrency=None,
    write_violations: bool = True,
    files: list[str] | None = None,
    violations_subdir: str = "violations",
    max_pending_files: int | None = None,
    conv_stage: bool = True,
    agg_stage: bool = True,
    segments_out: str | None = None,
    driver_cap: int = 5_000_000,
    policy: str | dict | None = None,
    strict: bool = False,
    feedback_path: str | None = None,
) -> dict:
    """Run the full validation suite over ``input_dir``'s Parquet shards and
    return the run report (JSON-serializable). For crash-resumable
    chunked-commit execution over very large inputs, use
    ``validate_resumable`` (which drives this in per-pass file groups)."""
    import ray.data as rd

    from ..policy import thresholds_of

    t0 = time.time()
    thresholds = thresholds_of(policy)
    registry = registry or transcript_registry()
    fb = _load_feedback(feedback_path)  # fail-fast on a malformed file
    report: dict = {
        "validation_id": uuid.uuid4().hex,
        "input_dir": input_dir,
        "ruleset_metadata": registry.metadata(),
        "policy": policy if isinstance(policy, str) else
                  ("custom" if policy else "default"),
        "stages": {},
    }

    files = files if files is not None else list_shards(input_dir)
    lineage = Lineage(run_dir, registry.ruleset_hash) if run_dir else None
    committed: dict[str, dict] = lineage.committed() if (lineage and resume) else {}
    pending = [f for f in files if os.path.basename(f) not in committed]
    if max_pending_files is not None:
        pending = pending[:max_pending_files]
    report["shards_total"] = len(files)
    report["shards_skipped_committed"] = len(files) - len(pending)

    if not pending:
        # prefer the run's persisted GLOBAL decision: dataset-level causes
        # ('__all__' agg rules such as near_dup, cross-shard conversation
        # rules, drift) never appear in any single shard's committed
        # decision, so deriving from the per-shard worst alone could
        # resume a globally-rejected run as accepted
        worst = None
        if run_dir:
            sp = os.path.join(run_dir, "run_summary.json")
            if os.path.exists(sp):
                try:
                    with open(sp) as fh:
                        summ = json.load(fh)
                    dec = (summ.get("final_decision")
                           if isinstance(summ, dict) else None)
                    meta = summ.get("ruleset_metadata") \
                        if isinstance(summ, dict) else None
                    if (isinstance(meta, dict)
                            and meta.get("rules_hash") == registry.ruleset_hash
                            and isinstance(dec, str) and dec
                            and dec != "incomplete"):
                        worst = dec.removesuffix("_from_checkpoint")
                except (json.JSONDecodeError, OSError):
                    # any other malformation falls through the isinstance
                    # guards above — a corrupt summary must degrade to the
                    # per-shard fallback, never crash the resume
                    pass
        if worst is None:
            # fallback: worst COMMITTED per-shard decision — a resume over
            # a run whose shards were rejected must not report "accepted"
            # just because nothing is left to scan
            decisions = {rec.get("decision") for rec in committed.values()}
            if "rejected" in decisions:
                worst = "rejected"
            elif "conditional_accept" in decisions:
                worst = "conditional_accept"
            else:
                worst = "accepted"
        report["final_decision"] = f"{worst}_from_checkpoint"
        report["committed"] = committed
        report["execution_time_s"] = round(time.time() - t0, 3)
        return report

    # ---- stage A: declared-schema check (DRV, short-circuit) ----
    # EVERY pending file's footer is probed (metadata-only reads, thread
    # pool), not just the first: a malformed later shard must fail here
    # with the clean rejection, not as an opaque task error mid-scan.
    # Identical schemas dedupe, so check_schema runs once per distinct
    # schema, not per file.
    t_schema = time.time()
    from concurrent.futures import ThreadPoolExecutor as _TPE

    with _TPE(max_workers=16) as ex:
        schemas = list(ex.map(
            lambda f: (f, pq.ParquetFile(f).schema_arrow), pending))
    distinct: dict[str, tuple] = {}
    for f, actual in schemas:
        distinct.setdefault(str(actual), (f, actual))
    sc = None
    bad_file = None
    for f, actual in distinct.values():
        sc_f = check_schema(actual)
        if sc is None or not sc_f.passed:
            sc, bad_file = sc_f, f
        if not sc_f.passed:
            break
    report["stages"]["schema"] = {
        "passed": sc.passed,
        "issues": [vars(i) for i in sc.issues],
        "files_probed": len(pending),
        "distinct_schemas": len(distinct),
        "time_s": round(time.time() - t_schema, 4),
    }
    if not sc.passed:
        report["stages"]["schema"]["failed_file"] = os.path.basename(
            bad_file)
        report["final_decision"] = "rejected"
        report["rejection_reason"] = "schema_validation_failed"
        report["execution_time_s"] = round(time.time() - t0, 3)
        _write_summary(run_dir, report)
        return report

    # ---- stage B: the single scan ----
    t_scan = time.time()
    # Whole files per block + whole-block batches: batch boundaries align to
    # shard files, so conversations written contiguously stay within one
    # ValidateBatch call and only genuinely shard-spanning conversations take
    # the exact-fallback path. The scanner batch_size stops pyarrow from
    # slicing files into 10k-row record batches (each would become a block).
    # Read-task count is CPU-aware: one task per file pays ~10ms of driver
    # scheduling each, which serializes at thousands of files; packing a few
    # files per task keeps the driver off the critical path.
    import ray as _ray

    ncpu = (
        int(_ray.cluster_resources().get("CPU", 8))
        if _ray.is_initialized() else 8
    )
    n_read_tasks = min(len(pending), max(64, 4 * ncpu))
    read_kwargs: dict = {"include_paths": True,
                         "override_num_blocks": n_read_tasks}
    try:
        ds = rd.read_parquet(pending, batch_size=1_000_000, **read_kwargs)
        ds.schema()  # force plan validation so a bad kwarg fails here
    except Exception:
        ds = rd.read_parquet(pending, **read_kwargs)
    # ValidateBatch state (compiled rules) is light, so the scan runs as
    # elastic stateless tasks (instance pickled once, reused per task) —
    # an actor pool here would cap read parallelism at the pool size.
    # Pass concurrency explicitly to get a bounded actor pool instead
    # (the right call when rules carry heavy state, e.g. model weights).
    vb = ValidateBatch(registry=registry)
    mb_kwargs: dict = {}
    if concurrency:
        mb_kwargs["concurrency"] = concurrency
    out = ds.map_batches(
        vb,
        batch_format="pyarrow",
        batch_size=batch_size,
        **mb_kwargs,
    ).materialize()
    report["stages"]["scan"] = {"time_s": round(time.time() - t_scan, 3)}

    def pick(kind: str, cols: list[str]):
        return out.map_batches(
            lambda t, k=kind, c=cols: t.filter(pc.equal(t["kind"], k)).select(c),
            batch_format="pyarrow",
        )

    # Driver mode: when the compact derived stream is small (the single-node
    # common case) collect it ONCE and do everything else in pandas — every
    # extra Ray execution costs ~0.5-1s of launch latency, which is pure
    # serial time. The distributed branches below are the 100 TB path.
    t_collect = time.time()
    driver_mode = out.count() <= driver_cap
    # Collect as ARROW (zero-copy-ish concat of the materialized blocks) and
    # convert to pandas PER KIND/projection: the full-frame to_pandas paid
    # for payload-bytes and string-object conversion on every row of every
    # column, most of which each consumer never touches.
    out_tbl = None
    if driver_mode:
        import ray as _ray2

        from ..stages.rowstage import OUT_SCHEMA as _OUT_SCHEMA

        # a zero-row input shard can surface as a SCHEMALESS empty block
        # (the fused read->map never runs on it); zero-row tables carry no
        # data, so drop them before the concat instead of letting a blank
        # schema poison it
        tbls = [t for t in _ray2.get(out.to_arrow_refs()) if t.num_rows]
        out_tbl = (pa.concat_tables(tbls) if tbls
                   else pa.Table.from_pydict(
                       {f.name: [] for f in _OUT_SCHEMA},
                       schema=_OUT_SCHEMA))

    def kind_df(kind: str, cols: list[str]) -> pd.DataFrame:
        return (
            out_tbl.filter(pc.equal(out_tbl["kind"], kind))
            .select(cols)
            .to_pandas()
        )

    report["stages"]["collect"] = {"time_s": round(time.time() - t_collect, 3),
                                   "driver_mode": driver_mode}

    # strict mode (orchestrator.py:376-381): a CRITICAL row-rule violation
    # rejects immediately — the expensive conversation/aggregate stages are
    # skipped, mirroring the reference's rules-stage short-circuit
    if strict:
        if driver_mode:
            n_crit = int(pc.sum(pc.and_(
                pc.equal(out_tbl["kind"], "violation"),
                pc.equal(out_tbl["severity"], "CRITICAL"),
            )).as_py() or 0)
        else:
            n_crit = pick("violation", VIO_COLS).filter(
                lambda r: r["severity"] == "CRITICAL"
            ).count()
        if n_crit:
            report["final_decision"] = "rejected"
            report["rejection_reason"] = "critical_rule_violations"
            report["critical_violations"] = int(n_crit)
            report["passed"] = False
            report["execution_time_s"] = round(time.time() - t0, 3)
            _write_summary(run_dir, report)
            return report

    # ---- stage D (first: sketches are needed for drift + shard row counts) --
    t_stats = time.time()
    if driver_mode:
        sk = kind_df("sketch", ["shard", "sketch_name", "payload"])
    else:
        sk = pick("sketch", ["shard", "sketch_name", "payload"]).to_pandas()
    stats = reduce_sketches(sk)
    report["stages"]["stats"] = {
        "time_s": round(time.time() - t_stats, 3),
        "summary": stats["__all__"].summary(),
    }

    # ---- stage C: conversation rules via segment merge ----
    # Two physical plans, same semantics:
    #  - driver path (derived stream is small, the common case in tests and
    #    single-node benches): collect the compact segments once and merge
    #    vectorized in pandas — zero extra Ray executions;
    #  - distributed path (conversation count too large for one machine):
    #    range-sort the segments and finalize interior conversations
    #    per-batch, stitching only each batch's first/last conversation.
    t_conv = time.time()
    vio_conv_ds = None
    if segments_out is not None:
        # persist the compact segment partials (chunked-pass mode: the
        # global conversation merge happens once at the end, over every
        # committed pass's segments — see validate_resumable)
        os.makedirs(os.path.dirname(segments_out) or ".", exist_ok=True)
        if driver_mode:
            tmp = segments_out + f".tmp{os.getpid()}"
            pq.write_table(
                out_tbl.filter(pc.equal(out_tbl["kind"], "segment"))
                .select(SEG_COLS), tmp
            )
            os.replace(tmp, segments_out)
        else:
            write_parquet_idempotent(pick("segment", SEG_COLS),
                                     segments_out, prefix="seg")
    if not conv_stage:
        exact_ids: list[str] = []
        extras = pd.DataFrame(columns=VIO_COLS)
        rowdup_spec = next(
            (s for s in registry.group_rules() if s.kind == "row_dup"), None
        )
        report["stages"]["conversation"] = {"deferred_to_final_merge": True}
    elif driver_mode:
        seg_df = kind_df("segment", SEG_COLS)
        all_res = merge_segments_frame(seg_df)
        flagged = all_res.loc[all_res["needs_exact"], ["conv_id", "shards"]]
        exact_ids = sorted(flagged["conv_id"])
        conv_shards = dict(zip(flagged["conv_id"], flagged["shards"]))
        exact_res, exact_rowdups = (
            _exact_pass(pending, exact_ids, conv_shards)
            if exact_ids else (None, None)
        )
        driver_results = all_res[~all_res["needs_exact"]]
    else:
        (driver_results, vio_conv_ds, exact_ids, conv_shards,
         exact_res, exact_rowdups) = _conv_merge_distributed(
            pick("segment", SEG_COLS), pending, registry
        )
    if conv_stage:
        if exact_res is not None:
            driver_results = pd.concat(
                [driver_results, exact_res], ignore_index=True
            )
        extras = conv_violations(driver_results, registry)
        rowdup_spec = next(
            (s for s in registry.group_rules() if s.kind == "row_dup"), None
        )
        extras = _append_rowdup_violations(
            extras, exact_rowdups, driver_results, rowdup_spec
        )
        report["stages"]["conversation"] = {
            "time_s": round(time.time() - t_conv, 3),
            "exact_fallback_convs": len(exact_ids),
        }

    # ---- stage D (rest): aggregate rules + drift ----
    agg_vio = (
        agg_violations(stats, registry) if agg_stage
        else pd.DataFrame(columns=VIO_COLS)
    )
    drift_report = {}
    if baseline_json and agg_stage:
        spec = next((s for s in registry.agg_rules() if s.kind == "drift"), None)
        baseline = drift_mod.baseline_from_json(baseline_json)["text_len"]
        drift_report = drift_mod.score_partitions(
            {s: st.tdigest for s, st in stats.items()},
            baseline,
            ks_threshold=spec.params["ks_threshold"] if spec else 0.2,
            psi_threshold=spec.params["psi_threshold"] if spec else 0.2,
        )
        if spec:
            drifted = [s for s, v in drift_report.items() if v["drifted"]]
            agg_vio = pd.concat(
                [
                    agg_vio,
                    pd.DataFrame(
                        {
                            "shard": drifted,
                            "conv_id": None,
                            "turn_idx": pd.array([None] * len(drifted), dtype="Int32"),
                            "rule_id": spec.rule_id,
                            "rule_version": spec.version,
                            "severity": spec.severity,
                            "column": spec.column,
                            "offending_value": [
                                f"ks={drift_report[s]['ks']},psi={drift_report[s]['psi']}"
                                for s in drifted
                            ],
                        }
                    ),
                ],
                ignore_index=True,
            )
    report["drift"] = drift_report

    # ---- optional DUP_004 near-duplicate rule (rule_validator.py:307-322):
    # the reference emits a near-dup PAIR COUNT (all-pairs Levenshtein capped
    # at 5000 uniques); here the registry can carry a `near_dup` spec and the
    # MinHash+LSH pipeline produces the count distributed, with per-bucket
    # caps instead of an input-size cap. Not in the default suite (it adds a
    # scan); ids are content hashes, so exact copies collapse (those are
    # DUP_001's job) and only genuine near-duplicates pair up. ----
    if agg_stage:
        ndv = _near_dup_violation(registry, pending)
        if len(ndv):
            agg_vio = pd.concat([agg_vio, ndv], ignore_index=True)

    # ---- violations sink + severity counts ----
    t_vio = time.time()
    extras_all = _concat_vio_frames([extras, agg_vio])
    if driver_mode:
        vio_rows = kind_df("violation", VIO_COLS)
        if exact_ids and rowdup_spec:
            # within-batch DUP_001 detections for exact-fallback convs are
            # superseded by the exact pass (it sees the whole conversation)
            eset = set(exact_ids)
            drop = (vio_rows["rule_id"] == rowdup_spec.rule_id) & vio_rows[
                "conv_id"
            ].isin(eset)
            vio_rows = vio_rows[~drop]
        all_vio = _concat_vio_frames([vio_rows, extras_all])
        if write_violations and run_dir:
            vdir = os.path.join(run_dir, violations_subdir)
            os.makedirs(vdir, exist_ok=True)
            pq.write_table(
                vio_frame_to_table(all_vio), os.path.join(vdir, "part-0.parquet")
            )
        counts_df = (
            all_vio.groupby(["shard", "severity"], as_index=False)
            .size()
            .rename(columns={"size": "count()"})
        )
    else:
        vio_row_ds = pick("violation", VIO_COLS)
        if exact_ids and rowdup_spec:
            eset = frozenset(exact_ids)
            rid = rowdup_spec.rule_id

            def _drop_superseded(t: pa.Table) -> pa.Table:
                keep = pc.invert(
                    pc.and_(
                        pc.equal(t["rule_id"], rid),
                        pc.is_in(t["conv_id"], value_set=pa.array(list(eset))),
                    )
                )
                return t.filter(keep)

            vio_row_ds = vio_row_ds.map_batches(
                _drop_superseded, batch_format="pyarrow"
            )
        import ray.data as _rd

        vio_all = (
            vio_row_ds if vio_conv_ds is None else vio_row_ds.union(vio_conv_ds)
        )
        if len(extras_all):
            vio_all = vio_all.union(_rd.from_arrow(vio_frame_to_table(extras_all)))
        vio_all = vio_all.materialize()
        if write_violations and run_dir:
            write_parquet_idempotent(
                vio_all, os.path.join(run_dir, violations_subdir),
                prefix="vio",
            )
        from ..stages.keyed_reduce import combine_low_card

        counts_df = combine_low_card(
            vio_all, ["shard", "severity"], {"count()": ("rule_id", "count")}
        )
    report["stages"]["violations"] = {
        "time_s": round(time.time() - t_vio, 3),
        "total": int(counts_df["count()"].sum()) if len(counts_df) else 0,
    }

    # ---- stage E: policy verdicts ----
    # a zero-row shard emits no sketch rows, but it was scanned and MUST
    # get a verdict + lineage commit — otherwise a resumable run over a
    # directory containing one empty shard can never reach completion
    scanned_names = {os.path.basename(f) for f in pending}
    for s in scanned_names - set(stats):
        stats[s] = ShardStats()
    shard_names = sorted(
        s for s in stats.keys() if s != "__all__"
    )
    per_shard: dict[str, dict] = {}
    global_counts = SeverityCounts()
    sev_map = {"CRITICAL": "critical", "ERROR": "error",
               "WARNING": "warning", "INFO": "info"}
    # one groupby, then O(1) per-shard lookups (a per-shard boolean filter
    # over the counts frame is O(shards^2) driver time at 50k shards)
    by_shard = (dict(tuple(counts_df.groupby("shard")))
                if len(counts_df) else {})
    empty_counts = counts_df.iloc[0:0]
    for shard in shard_names + ["__all__"]:
        sub = by_shard.get(shard, empty_counts)
        kw = {"critical": 0, "error": 0, "warning": 0, "info": 0}
        if len(sub):
            for sev, n in zip(sub["severity"], sub["count()"]):
                kw[sev_map[sev]] += int(n)
        c = SeverityCounts(**kw)
        if shard == "__all__":
            global_counts = global_counts + c  # dataset-level (agg) violations
            continue
        global_counts = global_counts + c
        per_shard[shard] = {
            "severity_counts": vars(c),
            "passed": passed(c),
            "decision": decide(c, thresholds),
            "rows_scanned": stats[shard].content_rows,
        }
    report["per_shard"] = per_shard
    report["severity_counts"] = vars(global_counts)
    report["final_decision"] = decide(global_counts, thresholds)
    report["requires_review"] = needs_review(global_counts, thresholds)
    report["passed"] = passed(global_counts)
    report["rationale"] = _rationale(report["final_decision"], global_counts,
                                     thresholds)

    # top issues for human review: severity- and novelty-prioritized,
    # capped at 20 — the driver-side analog of HumanReviewCoordinator's
    # active-learning selection (human_review_coordinator.py:319-434); it
    # flags, never decides. Rule rarity comes from the RUN-WIDE per-rule
    # counts (one extra zero-shuffle combine in distributed mode), not the
    # driver sample, so a rare rule surfaces even if the sample is
    # dominated by a hot one.
    if driver_mode:
        sample = all_vio
        rule_totals = (all_vio.groupby("rule_id").size().to_dict()
                       if len(all_vio) else {})
    else:
        sample = vio_all.limit(2000).to_pandas()
        from ..stages.keyed_reduce import combine_low_card as _clc

        rt = _clc(vio_all, ["rule_id"], {"n": ("rule_id", "count")})
        rule_totals = (dict(zip(rt["rule_id"], rt["n"].astype(int)))
                       if len(rt) else {})
    _attach_top_issues(report, sample, rule_totals, fb)

    # ---- lineage commits (idempotent, per shard) ----
    wall = time.time() - t0
    total_rows = max(1, stats["__all__"].content_rows)
    if lineage:
        from concurrent.futures import ThreadPoolExecutor

        vio_by_shard = (
            counts_df.groupby("shard")["count()"].sum().to_dict()
            if len(counts_df) else {}
        )

        from ..sketches import dumps as _sk_dumps
        from ..state.checkpoint import write_stats_bundle

        # persist every shard's mergeable sketches in ONE atomic bundle
        # BEFORE any lineage commit (committed shard => sketches durable),
        # so a resumed run can still evaluate dataset-level (aggregate/
        # drift) rules EXACTLY over all shards
        write_stats_bundle(
            lineage.dir,
            {shard.replace("/", "_"): _sk_dumps(stats[shard])
             for shard in shard_names},
        )

        def _commit(shard: str):
            st = stats[shard]
            lineage.commit(
                shard,
                rows_scanned=st.content_rows,
                rules_evaluated=len(registry.rules),
                violations=int(vio_by_shard.get(shard, 0)),
                wall_time_s=wall * st.content_rows / total_rows,
                extra={
                    "decision": per_shard[shard]["decision"],
                    "severity_counts": per_shard[shard]["severity_counts"],
                },
            )

        with ThreadPoolExecutor(max_workers=16) as ex:
            list(ex.map(_commit, shard_names))
    report["rows_scanned"] = stats["__all__"].content_rows
    report["execution_time_s"] = round(wall, 3)
    report["turns_per_sec"] = round(stats["__all__"].content_rows / max(wall, 1e-9), 1)
    _write_summary(run_dir, report)
    return report


def _conv_merge_distributed(seg, source_files: list[str], registry):
    """Distributed conversation merge over a segment Dataset — the 100 TB
    path shared by ``validate_dir`` (single-run) and ``validate_resumable``
    (final merge over every committed pass's persisted segments).

    Range-sorts by (conv_id, seg_turn_lo), finalizes interior conversations
    vectorized per batch (``MergeSegments``), and stitches only each batch's
    first/last conversation on the driver (2 convs per batch — compact at any
    scale). Returns ``(boundary_results, vio_conv_ds, exact_ids, conv_shards,
    exact_res, exact_rowdups)`` where ``vio_conv_ds`` holds the interior
    conversations' violation rows and STAYS a Dataset; everything the driver
    touches is O(batches + flagged convs), never O(conversations)."""
    merged = (
        seg.sort(["conv_id", "seg_turn_lo"])
        .map_batches(MergeSegments, batch_format="pandas", concurrency=2,
                     max_restarts=0)
        .materialize()
    )
    from ..stages.convstage import RESULT_COLUMNS

    conv_res = merged.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "conv_result")).select(RESULT_COLUMNS),
        batch_format="pyarrow",
    )
    boundary = merged.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "segment")).select(SEG_COLS),
        batch_format="pyarrow",
    ).to_pandas()
    boundary_res = merge_segments_frame(boundary)

    interior_exact = conv_res.map_batches(
        lambda t: t.filter(pc.equal(t["needs_exact"], True)).select(
            ["conv_id", "shards"]
        ),
        batch_format="pyarrow",
    ).to_pandas()
    # an all-empty Dataset can reach pandas without columns — guard
    if "conv_id" not in interior_exact.columns:
        interior_exact = pd.DataFrame(columns=["conv_id", "shards"])
    bflag = boundary_res.loc[boundary_res["needs_exact"], ["conv_id", "shards"]]
    flagged = pd.concat([interior_exact, bflag], ignore_index=True)
    exact_ids = sorted(set(flagged["conv_id"]))
    conv_shards = dict(zip(flagged["conv_id"], flagged["shards"]))
    exact_res, exact_rowdups = (
        _exact_pass(source_files, exact_ids, conv_shards)
        if exact_ids else (None, None)
    )

    # interior conversation violations stay distributed (vectorized per batch)
    vio_conv_ds = conv_res.map_batches(
        lambda df, r=registry: vio_frame_to_table(
            conv_violations(df[~df["needs_exact"]], r)
        ),
        batch_format="pandas",
    )
    driver_results = boundary_res[~boundary_res["needs_exact"]]
    return (driver_results, vio_conv_ds, exact_ids, conv_shards,
            exact_res, exact_rowdups)


def _filtered_read(pending: list[str], conv_ids: list[str], columns: list[str],
                   file_convs: dict[str, list[str]] | None = None):
    """Column-pruned, conv-filtered re-read -> pandas with a shard column.

    ``file_convs`` (shard basename -> conv ids needing that file, derived
    from the segment results) prunes the read to only the files that contain
    flagged conversations, each with its own small filter list — the re-read
    cost scales with the flagged data, not the input. Files read directly
    with pyarrow on a thread pool (pyarrow releases the GIL); falls back to
    a distributed Ray read with predicate pushdown when no pruning map is
    available and the file count is large."""
    import ray.data as rd

    idset = set(conv_ids)
    if file_convs is not None or len(pending) <= 64:
        from concurrent.futures import ThreadPoolExecutor

        by_base = {os.path.basename(p): p for p in pending}
        if file_convs is None:
            jobs = [(p, list(idset)) for p in pending]
        else:
            jobs = [
                (by_base[base], ids)
                for base, ids in file_convs.items()
                if base in by_base and ids
            ]

        def read_one(job):
            p, ids = job
            t = pq.read_table(p, columns=columns,
                              filters=[("conv_id", "in", ids)])
            if not t.num_rows:
                return None
            df = t.to_pandas()
            df["shard"] = os.path.basename(p)
            return df

        with ThreadPoolExecutor(max_workers=min(16, max(1, len(jobs)))) as ex:
            frames = [f for f in ex.map(read_one, jobs) if f is not None]
        if not frames:
            return pd.DataFrame(columns=columns + ["shard"])
        return pd.concat(frames, ignore_index=True)
    try:
        ds = rd.read_parquet(
            pending, columns=columns,
            filter=pc.field("conv_id").isin(conv_ids), include_paths=True,
        )
        frames = ds.to_pandas()
    except Exception:
        ds = rd.read_parquet(pending, columns=columns, include_paths=True)
        frames = ds.map_batches(
            lambda df: df[df["conv_id"].isin(idset)], batch_format="pandas"
        ).to_pandas()
    if len(frames) == 0:
        return pd.DataFrame(columns=columns + ["shard"])
    frames["shard"] = frames["path"].map(os.path.basename)
    return frames[frames["conv_id"].isin(idset)].drop(columns=["path"])


def _exact_pass(pending: list[str], conv_ids: list[str],
                conv_shards: dict[str, str] | None = None):
    """Exact conversation re-check for flagged conversations. Two stages so
    the common case never touches ``text``:
      A. key columns only (conv_id, turn_idx, ts) -> uniqueness, contiguity,
         monotonicity, shard-referential.
      B. only for convs that actually have duplicate keys: re-read with
         content columns to decide whole-row duplicates.
    ``conv_shards`` (conv -> comma-joined shard basenames from the segment
    merge) prunes both reads to only the files holding flagged convs."""

    def prune(ids: list[str]) -> dict[str, list[str]] | None:
        if conv_shards is None:
            return None
        fc: dict[str, list[str]] = {}
        for c in ids:
            for base in str(conv_shards.get(c, "")).split(","):
                if base:
                    fc.setdefault(base, []).append(c)
        return fc

    frames = _filtered_read(
        pending, conv_ids, ["conv_id", "turn_idx", "ts"], prune(conv_ids)
    )
    results, _ = exact_conv_frame(frames)
    dup_convs = sorted(results.loc[results["dup_turns"] > 0, "conv_id"])
    if not dup_convs:
        return results, pd.DataFrame(columns=["conv_id", "turn_idx"])
    full = _filtered_read(
        pending, dup_convs,
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"], prune(dup_convs),
    )
    _, rowdups = exact_conv_frame(full)
    return results, rowdups


def _append_rowdup_violations(extras, exact_rowdups, results, rowdup_spec):
    """Violation rows for whole-row duplicates found by the exact pass,
    attributed to each conversation's main shard."""
    if exact_rowdups is None or not len(exact_rowdups) or rowdup_spec is None:
        return extras
    shard_of = dict(zip(results["conv_id"], results["main_shard"]))
    return pd.concat(
        [
            extras,
            pd.DataFrame(
                {
                    "shard": exact_rowdups["conv_id"].map(shard_of),
                    "conv_id": exact_rowdups["conv_id"],
                    "turn_idx": exact_rowdups["turn_idx"],
                    "rule_id": rowdup_spec.rule_id,
                    "rule_version": rowdup_spec.version,
                    "severity": rowdup_spec.severity,
                    "column": None,
                    "offending_value": "exact_duplicate_row",
                }
            ),
        ],
        ignore_index=True,
    )


def _rationale(decision: str, c, thresholds: dict | None = None) -> str:
    """Human-readable decision rationale (policy_engine.py:210-280 analog);
    the cited thresholds are the ones actually in effect for the run."""
    from ..policy import DEFAULT_THRESHOLDS

    t = thresholds or DEFAULT_THRESHOLDS
    if decision == "rejected":
        if c.critical:
            return f"rejected: {c.critical} critical issue(s)"
        return (f"rejected: {c.error} errors "
                f"(threshold {t['reject_errors']})")
    if decision == "conditional_accept":
        if c.error:
            return f"conditional accept: {c.error} error(s) require remediation"
        return (f"conditional accept: {c.warning} warnings "
                f"(threshold {t['conditional_warnings']})")
    return "accepted: no blocking issues"


def _load_feedback(feedback_path: str | None):
    """Parse the reviewer-feedback store UP FRONT — a malformed
    ``--feedback`` file must fail in milliseconds before the expensive
    scan, not at report-assembly time after the whole run."""
    if not feedback_path:
        return None
    from ..state.feedback import FeedbackStore

    return FeedbackStore.load(feedback_path)


def _attach_top_issues(report: dict, sample, rule_totals: dict,
                       fb) -> None:
    """Shared report tail for validate_dir / validate_resumable: feedback
    metrics + the severity/novelty-prioritized review selection."""
    if fb is not None:
        report["review_feedback"] = fb.metrics()
    report["top_issues"] = select_top_issues(sample, rule_totals, cap=20,
                                             feedback=fb)


def _write_summary(run_dir: str | None, report: dict) -> None:
    if not run_dir:
        return
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "run_summary.json"), "w") as fh:
        json.dump(report, fh, indent=2, default=str)


def write_sorted_output(input_dir: str, out_dir: str) -> None:
    """Materialize the validated pass-through view, globally sorted by
    (conv_id, turn_idx) — the stable order for the per-turn text byte-equality
    parity check (north_star; reference analog: validators never mutate data,
    bio_rules.py derived cols excepted — which this engine never emits)."""
    import ray.data as rd

    ds = rd.read_parquet(list_shards(input_dir))
    write_parquet_idempotent(ds.sort(["conv_id", "turn_idx"]), out_dir)


def content_hash_of_dir(d: str) -> tuple[int, int]:
    """(hash-sum, rows) of (conv_id, turn_idx, text) for parity checks —
    must equal the pipeline's content_hash_sum over the same rows."""
    import ray.data as rd

    from ..stages.rowstage import ValidateBatch as _VB

    from ..sketches import _hash64

    ds = rd.read_parquet(list_shards(d), columns=["conv_id", "turn_idx", "text"])
    total, rows = 0, 0
    vb = _VB.__new__(_VB)
    vb.text_col = "text"
    for t in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        enc = t["conv_id"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        uniq = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        conv_hash = _hash64(uniq)[codes]
        turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        s, n = vb._content_hash(conv_hash, turn, t)
        total = (total + s) % (1 << 64)
        rows += n
    return total, rows


def _prune_uncommitted_group_artifacts(
    run_dir: str, seg_dir: str, committed: set[str]
) -> None:
    """Drop rows belonging to shards with no committed lineage record from
    every per-pass group artifact (atomic rewrite; corrupt/partial files from
    a mid-write crash are deleted — their shards are uncommitted by the
    write-before-commit ordering)."""

    def _filter_file(path: str) -> None:
        try:
            t = pq.read_table(path)
        except Exception:
            os.remove(path)
            return
        if "shard" not in t.column_names:
            return
        import pyarrow.compute as _pc

        mask = _pc.is_in(
            t["shard"], value_set=pa.array(sorted(committed), type=pa.string())
        )
        kept = t.filter(_pc.fill_null(mask, False))
        if kept.num_rows == t.num_rows:
            return
        if kept.num_rows == 0:
            os.remove(path)
            return
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(kept, tmp)
        os.replace(tmp, path)

    for f in _seg_part_files(seg_dir):
        _filter_file(f)
    for f in glob.glob(os.path.join(run_dir, "violations", "group-*", "*.parquet")):
        _filter_file(f)


def _seg_part_files(seg_dir: str) -> list[str]:
    """Per-pass segment artifacts are one FILE per group in driver mode but a
    DIRECTORY of part files when the pass ran the distributed branch
    (write_parquet); expand to the underlying part files either way."""
    parts: list[str] = []
    for p in sorted(glob.glob(os.path.join(seg_dir, "group-*.parquet"))):
        if os.path.isdir(p):
            parts.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
        else:
            parts.append(p)
    return parts


def validate_resumable(
    input_dir: str,
    *,
    run_dir: str,
    registry: RuleRegistry | None = None,
    baseline_json: str | None = None,
    files_per_pass: int = 64,
    max_passes: int | None = None,
    policy: str | dict | None = None,
    feedback_path: str | None = None,
    **kw,
) -> dict:
    """Crash-resumable chunked execution: pending shards are processed in
    groups of ``files_per_pass``; each pass commits lineage records (with
    row-local severity counts), per-shard sketches, and its compact segment
    partials. Cross-shard semantics stay EXACT under chunking:

    - conversation rules (uniqueness / contiguity / ts order / shard
      referential) are NOT decided per pass — the persisted segments of
      every committed pass merge globally in the final step, so a
      conversation split across passes is still checked whole;
    - dataset-level rules (aggregate stats, drift) evaluate once over the
      merged per-shard sketches;
    - whole-row duplicate counts are corrected for conversations that the
      global merge flags (their per-pass detections are superseded by the
      exact re-check).

    A killed run resumes from the last committed pass and produces a final
    report identical to an uninterrupted one. ``max_passes`` exists for
    tests (simulate a crash after N passes).
    """
    import pyarrow.dataset as pads

    from ..policy import thresholds_of
    from ..sketches import loads as _sk_loads
    from ..stages.statstage import ShardStats, agg_violations

    t0 = time.time()
    thresholds = thresholds_of(policy)
    registry = registry or transcript_registry()
    fb = _load_feedback(feedback_path)  # fail-fast on a malformed file
    lineage = Lineage(run_dir, registry.ruleset_hash)
    all_files = list_shards(input_dir)
    committed = lineage.committed()
    pending = [f for f in all_files if os.path.basename(f) not in committed]
    seg_dir = os.path.join(run_dir, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    # Resume hygiene: a crash during a pass's per-shard commit loop leaves
    # that pass's group artifacts (violations/group-*/, segments/group-*.pq)
    # on disk while some of its shards have NO lineage record. Those shards
    # reprocess under a NEW group id, so any stale rows they left behind
    # would exist twice — double-counting violations and double-subtracting
    # in the DUP_001 correction. Artifacts are written BEFORE lineage
    # commits, so committed shards always keep theirs; prune the rest.
    _prune_uncommitted_group_artifacts(run_dir, seg_dir, set(committed))

    n_pass = 0
    while pending:
        if max_passes is not None and n_pass >= max_passes:
            break
        group = pending[:files_per_pass]
        pending = pending[files_per_pass:]
        import hashlib as _hl

        gid = _hl.sha1("|".join(os.path.basename(f) for f in group).encode()) \
            .hexdigest()[:12]
        rep = validate_dir(
            input_dir,
            registry=registry,
            run_dir=run_dir,
            resume=False,
            files=group,
            conv_stage=False,
            agg_stage=False,
            policy=policy,  # per-pass lineage decisions use the SAME
            # thresholds as the final report, not the defaults
            segments_out=os.path.join(seg_dir, f"group-{gid}.parquet"),
            violations_subdir=os.path.join("violations", f"group-{gid}"),
            **kw,
        )
        if rep.get("rejection_reason") in ("schema_validation_failed",
                                           "critical_rule_violations"):
            # short-circuit, nothing committed for this group: the run IS
            # rejected — swallowing a strict-mode critical rejection here
            # would report 'incomplete' and reprocess/re-reject the same
            # group on every resume, never completing and never rejecting
            return rep
        n_pass += 1

    committed = lineage.committed()
    complete = len(committed) == len(all_files)

    # ---- per-shard row-local counts + merged sketches from lineage ----
    from ..policy import SeverityCounts, decide, needs_review, passed

    from ..state.checkpoint import load_stats_blobs

    shard_counts: dict[str, SeverityCounts] = {}
    rows_scanned = 0
    stats_all = ShardStats()
    per_shard_digests = {}
    per_shard_stats: dict[str, ShardStats] = {}
    stats_blobs = load_stats_blobs(lineage.dir)
    n_unreadable_bundles = int(stats_blobs.pop("__unreadable_bundles__", b"0"))
    for shard, rec in sorted(committed.items()):
        shard_counts[shard] = SeverityCounts(
            **{k: int(v) for k, v in rec.get("severity_counts", {}).items()}
        )
        rows_scanned += rec["rows_scanned"]
        blob = stats_blobs.get(shard.replace("/", "_"))
        if blob is not None:
            st = _sk_loads(blob)
            per_shard_digests[shard] = st.tdigest
            per_shard_stats[shard] = st
            stats_all.merge(st)

    # ---- global conversation merge over every committed pass's segments ----
    # Same dual physical plan as validate_dir's stage C: the compact segment
    # partials either fit on the driver (vectorized pandas merge, zero extra
    # Ray executions) or exceed ``driver_cap`` and route through the shared
    # distributed branch (sort + MergeSegments + boundary stitch) — the
    # driver then touches only per-batch boundary convs and exact-fallback
    # convs, never the full conversation set.
    seg_files = _seg_part_files(seg_dir)
    committed_files = [
        f for f in all_files if os.path.basename(f) in committed
    ]
    driver_cap = kw.get("driver_cap", 5_000_000)
    n_seg = sum(pq.ParquetFile(f).metadata.num_rows for f in seg_files)
    vio_conv_ds = None
    if n_seg <= driver_cap:
        # pandas concat aligns columns BY NAME, so per-pass segment files
        # written under slightly different column orders still merge (an
        # Arrow concat_tables would hard-fail on any schema drift)
        seg_all = (
            pd.concat([pq.read_table(f).to_pandas() for f in seg_files],
                      ignore_index=True)
            if seg_files else pd.DataFrame(columns=SEG_COLS)
        )
        res = merge_segments_frame(seg_all)
        flagged = res.loc[res["needs_exact"], ["conv_id", "shards"]]
        exact_ids = sorted(flagged["conv_id"])
        conv_shards = dict(zip(flagged["conv_id"], flagged["shards"]))
        exact_res, exact_rowdups = (
            _exact_pass(committed_files, exact_ids, conv_shards)
            if exact_ids else (None, None)
        )
        results = res[~res["needs_exact"]]
    else:
        import ray.data as rd

        (results, vio_conv_ds, exact_ids, conv_shards,
         exact_res, exact_rowdups) = _conv_merge_distributed(
            rd.read_parquet(seg_files), committed_files, registry
        )
    if exact_res is not None:
        results = pd.concat([results, exact_res], ignore_index=True)
    conv_vio = conv_violations(results, registry)
    rowdup_spec = next(
        (s for s in registry.group_rules() if s.kind == "row_dup"), None
    )
    conv_vio = _append_rowdup_violations(
        conv_vio, exact_rowdups, results, rowdup_spec
    )

    # correction: per-pass within-batch DUP_001 detections for flagged convs
    # are superseded by the exact re-check above — subtract them from the
    # counts AND remove them from the on-disk per-pass artifacts (consumers
    # read run_dir/violations back; leaving both the superseded rows and
    # the exact-pass conv-final rows would double-represent duplicates).
    # Crash-safety protocol (order matters):
    #   1. scan the committed files for superseded rows, keyed per
    #      (shard, conv_id); merge into dup_corrections.json — conv_ids
    #      already recorded there are NOT re-counted, so a re-merge after
    #      any crash point converges to the same totals;
    #   2. persist the merged JSON via tmp+os.replace (atomic);
    #   3. rewrite each violation file via tmp+os.replace (atomic) — a
    #      crash mid-rewrite leaves whole old/new files, never truncated
    #      parquet, and step 1 of the next merge finishes the removal
    #      without double-counting.
    if exact_ids and rowdup_spec:
        vio_root = os.path.join(run_dir, "violations")
        corr_path = os.path.join(vio_root, "dup_corrections.json")
        # {shard: {conv_id: n_removed}}; legacy flat {shard: n} totals from
        # older runs are folded in under a conv_id key that cannot collide.
        by_conv: dict[str, dict[str, int]] = {}
        if os.path.exists(corr_path):
            with open(corr_path) as fh:
                raw = json.load(fh)
            if raw.get("format") == "by_conv":
                by_conv = {s: {c: int(n) for c, n in m.items()}
                           for s, m in raw["by_conv"].items()}
            else:  # legacy flat {shard: total}
                by_conv = {s: {"\x00legacy": int(n)} for s, n in raw.items()}
        vfiles = glob.glob(os.path.join(vio_root, "group-*", "*.parquet"))
        if vfiles:
            dset = pads.dataset(vfiles)
            flt = ((pads.field("rule_id") == rowdup_spec.rule_id)
                   & pads.field("conv_id").isin(exact_ids))
            prior = dset.to_table(
                columns=["shard", "conv_id", "rule_id", "severity"],
                filter=flt,
            ).to_pandas()
            for (shard, conv), grp in prior.groupby(["shard", "conv_id"]):
                m = by_conv.setdefault(shard, {})
                # a conv_id already recorded was counted by a prior merge
                # whose file rewrite may not have completed — don't re-add
                if conv not in m:
                    m[conv] = len(grp)
            if by_conv:
                os.makedirs(vio_root, exist_ok=True)
                tmp = corr_path + f".tmp{os.getpid()}"
                with open(tmp, "w") as fh:
                    json.dump({"format": "by_conv", "by_conv": by_conv}, fh)
                os.replace(tmp, corr_path)
            if len(prior):
                eset = pa.array(sorted(set(exact_ids)))
                for vf in vfiles:
                    t = pq.read_table(vf)
                    m = pc.fill_null(pc.and_(
                        pc.equal(t["rule_id"], rowdup_spec.rule_id),
                        pc.is_in(t["conv_id"], value_set=eset),
                    ), False)
                    if pc.any(m).as_py():
                        vtmp = vf + f".tmp{os.getpid()}"
                        pq.write_table(t.filter(pc.invert(m)), vtmp)
                        os.replace(vtmp, vf)
        prior_counts = {s: sum(m.values()) for s, m in by_conv.items()}
        for shard, n in prior_counts.items():
            sub = SeverityCounts(**{rowdup_spec.severity.lower(): int(n)})
            c = shard_counts.get(shard, SeverityCounts())
            shard_counts[shard] = SeverityCounts(
                critical=c.critical - sub.critical,
                error=c.error - sub.error,
                warning=c.warning - sub.warning,
                info=c.info - sub.info,
            )

    # attribute global conversation violations to shards (interior convs'
    # violations — the distributed branch's Dataset — contribute via a small
    # per-(shard, severity) combine; only those compact counts hit the driver)
    sev_key = {"CRITICAL": "critical", "ERROR": "error",
               "WARNING": "warning", "INFO": "info"}
    conv_count_frames = []
    if len(conv_vio):
        conv_count_frames.append(
            conv_vio.groupby(["shard", "severity"], as_index=False)
            .size().rename(columns={"size": "n"})
        )
    if vio_conv_ds is not None:
        from ..stages.keyed_reduce import combine_low_card

        vio_conv_ds = vio_conv_ds.materialize()
        interior_counts = combine_low_card(
            vio_conv_ds, ["shard", "severity"], {"n": ("rule_id", "count")}
        )
        if len(interior_counts):
            conv_count_frames.append(interior_counts)
    for frame in conv_count_frames:
        for _, r in frame.iterrows():
            c = shard_counts.get(r["shard"], SeverityCounts())
            kw2 = vars(c).copy()
            kw2[sev_key[r["severity"]]] += int(r["n"])
            shard_counts[r["shard"]] = SeverityCounts(**kw2)
    if run_dir and (len(conv_vio) or vio_conv_ds is not None):
        fdir = os.path.join(run_dir, "violations", "conv-final")
        # always start from an empty directory: a re-merge can switch
        # between the distributed and driver branches (e.g. driver_cap
        # changed), and stale conv-*.parquet parts from a prior
        # distributed write would double-count conversation violations
        shutil.rmtree(fdir, ignore_errors=True)
        os.makedirs(fdir, exist_ok=True)
        if vio_conv_ds is not None:
            write_parquet_idempotent(vio_conv_ds, fdir, prefix="conv")
        if len(conv_vio):
            pq.write_table(
                vio_frame_to_table(conv_vio),
                os.path.join(fdir, "part-0.parquet"),
            )

    # ---- drift vs baseline: attributed to the drifted SHARD's counts (and
    # hence its per-shard decision), matching validate_dir's violation-row
    # attribution — not just the global total ----
    drift_report = {}
    if baseline_json and per_shard_digests:
        spec = next((s for s in registry.agg_rules() if s.kind == "drift"), None)
        baseline = drift_mod.baseline_from_json(baseline_json)["text_len"]
        drift_report = drift_mod.score_partitions(
            per_shard_digests, baseline,
            ks_threshold=spec.params["ks_threshold"] if spec else 0.2,
            psi_threshold=spec.params["psi_threshold"] if spec else 0.2,
        )
        if spec:
            for s, v in drift_report.items():
                if v["drifted"]:
                    c = shard_counts.get(s, SeverityCounts())
                    kw2 = vars(c).copy()
                    kw2[sev_key[spec.severity]] += 1
                    shard_counts[s] = SeverityCounts(**kw2)

    # ---- dataset-level rules, exactly once ----
    total = SeverityCounts()
    for c in shard_counts.values():
        total = total + c
    agg_extra = (
        agg_violations({**per_shard_stats, "__all__": stats_all}, registry)
        if stats_all.content_rows else pd.DataFrame(columns=VIO_COLS)
    )
    # near_dup is a whole-dataset scan rule: it runs here over every
    # committed file (validate_dir's agg stage is disabled per pass, so
    # without this the rule would silently never fire in resumable mode)
    ndv = _near_dup_violation(registry, committed_files)
    if len(ndv):
        agg_extra = _concat_vio_frames([agg_extra, ndv])
    for _, row in agg_extra.iterrows():
        kw2 = vars(total).copy()
        kw2[sev_key[row["severity"]]] += 1
        total = SeverityCounts(**kw2)

    per_shard = {
        s: {
            "severity_counts": vars(c),
            "decision": decide(c, thresholds),
            "passed": passed(c),
            "rows_scanned": committed[s]["rows_scanned"],
        }
        for s, c in sorted(shard_counts.items())
    }
    report = {
        "validation_id": uuid.uuid4().hex,
        "mode": "resumable",
        "input_dir": input_dir,
        "ruleset_metadata": registry.metadata(),
        "policy": policy if isinstance(policy, str) else
                  ("custom" if policy else "default"),
        "shards_total": len(all_files),
        "shards_committed": len(committed),
        "passes_this_run": n_pass,
        "complete": complete,
        "per_shard": per_shard,
        "severity_counts": vars(total),
        "rows_scanned": rows_scanned,
        "exact_fallback_convs": len(exact_ids),
        "unreadable_stats_bundles": n_unreadable_bundles,
        "drift": drift_report,
        "aggregate_violations": agg_extra.to_dict("records"),
        "stats_summary": stats_all.summary() if stats_all.content_rows else {},
        "execution_time_s": round(time.time() - t0, 3),
    }
    if complete:
        report["final_decision"] = decide(total, thresholds)
        report["passed"] = passed(total)
        report["requires_review"] = needs_review(total, thresholds)
        report["rationale"] = _rationale(report["final_decision"], total,
                                         thresholds)
    else:
        report["final_decision"] = "incomplete"

    # top issues for human review, at parity with validate_dir: a bounded
    # sample from the committed violation artifacts, rule rarity from one
    # single-column scan over them (violations are o(data) by construction
    # — the full-row sample stays capped, only rule_id is read in full)
    vio_files = glob.glob(os.path.join(run_dir, "violations", "**",
                                       "*.parquet"), recursive=True)
    sample = pd.DataFrame()
    rule_totals: dict[str, int] = {}
    if vio_files:
        vdset = pads.dataset(vio_files)
        rule_totals = {
            str(k): int(v) for k, v in
            vdset.to_table(columns=["rule_id"]).column(0)
            .to_pandas().value_counts().items()
        }
        sample = vdset.head(2000).to_pandas()
    _attach_top_issues(report, sample, rule_totals, fb)
    _write_summary(run_dir, report)
    return report
