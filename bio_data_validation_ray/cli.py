"""CLI entry point — the analog of the reference's ``validate-bio validate``
command (src/cli/commands/validate.py:88-163) with its exit-code contract
(0 = accepted, 1 = rejected/conditional; validate_bio.py:47-51) and
text/json output formatters (src/cli/formatters/).

Usage:
    python -m bio_data_validation_ray.cli validate <input_dir>
        [--run-dir DIR] [--rules RULES.yml] [--baseline BASELINE.json]
        [--format text|json] [--no-resume] [--strict]

Owns its Ray session (scripts own sessions; library code never does).
"""

from __future__ import annotations

import argparse
import os
import json
import sys


def _fmt_text(report: dict) -> str:
    lines = [
        f"validation {report.get('validation_id', '?')}",
        f"  input:     {report.get('input_dir')}",
        f"  ruleset:   v{report['ruleset_metadata']['rules_version']} "
        f"(hash {report['ruleset_metadata']['rules_hash']})",
        f"  decision:  {report.get('final_decision')}",
        f"  rationale: {report.get('rationale', '')}",
    ]
    sc = report.get("severity_counts")
    if sc:
        lines.append(
            "  issues:    "
            + ", ".join(f"{k}={v}" for k, v in sc.items() if v)
        )
    if report.get("rows_scanned") is not None:
        lines.append(
            f"  scanned:   {report['rows_scanned']} turns in "
            f"{report.get('execution_time_s')}s "
            f"({report.get('turns_per_sec')} turns/s)"
        )
    for shard, v in sorted(report.get("per_shard", {}).items()):
        lines.append(
            f"    {shard}: {v['decision']} "
            f"({', '.join(f'{k}={n}' for k, n in v['severity_counts'].items() if n)}"
            f" rows={v['rows_scanned']})"
        )
    for issue in report.get("top_issues", [])[:10]:
        lines.append(
            f"  [{issue['severity']}] {issue['rule_id']} "
            f"conv={issue.get('conv_id')} turn={issue.get('turn_idx')} "
            f"value={issue.get('offending_value')}"
        )
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="bio_data_validation_ray")
    ap.add_argument("--config", default=None, metavar="PATH",
                    help="YAML config file supplying flag defaults "
                         "(default: $BDVR_CONFIG or ~/.bdvr/config.yml; "
                         "explicit flags always win)")
    sub = ap.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("validate", help="validate a directory of Parquet shards")
    v.add_argument("input_dir")
    v.add_argument("--run-dir", default=None)
    v.add_argument("--rules", default=None, help="YAML ruleset path")
    v.add_argument("--baseline", default=None, help="baseline digests JSON path")
    v.add_argument("--format", choices=["text", "json", "markdown", "html"],
                   default=None)
    v.add_argument("--no-resume", action="store_true")
    v.add_argument("--resumable", action="store_true",
                   help="chunked per-pass commits (crash-resumable); "
                        "requires --run-dir")
    v.add_argument("--files-per-pass", type=int, default=None)
    v.add_argument("--strict", action="store_true",
                   help="reject immediately on CRITICAL row violations "
                        "(reference rules-stage short-circuit)")
    v.add_argument("--clean-out", default=None,
                   help="after validation, export the surviving rows "
                        "(conversation + row exclusions, duplicates "
                        "collapsed) as parquet to this directory; "
                        "requires --run-dir")
    v.add_argument("--mlflow-dir", default=None, metavar="DIR",
                   help="also log run metrics/params in MLflow file-store "
                        "layout under DIR (reference push_to_mlflow.py "
                        "semantics; no mlflow package needed)")
    v.add_argument("--feedback", default=None, metavar="PATH",
                   help="reviewer-feedback JSON (state/feedback.py): "
                        "consistently reviewed patterns rank below novel "
                        "ones in top_issues")
    v.add_argument("--policy", default=None,
                   choices=["default", "strict", "lenient", "production"],
                   help="decision-table preset (decision_tables.py:258-298 "
                        "analog)")
    v.add_argument("--num-cpus", type=int, default=None)
    b = sub.add_parser("baseline",
                       help="build drift-baseline digests from a CLEAN "
                            "reference directory")
    b.add_argument("input_dir")
    b.add_argument("-o", "--out", required=True)
    b.add_argument("--num-cpus", type=int, default=None)
    d = sub.add_parser(
        "dedup",
        help="duplicate mining over a parquet table (exact groups or "
             "near-dup pairs; integer id column required for pair methods)",
    )
    d.add_argument("input", help="parquet file or directory")
    d.add_argument("-o", "--out", required=True, help="output parquet path")
    d.add_argument("--method", default="minhash",
                   choices=["exact", "minhash", "simhash", "simhash-exact",
                            "ngram", "embedding"])
    d.add_argument("--col", default="text",
                   help="text column (or embedding column for --method "
                        "embedding)")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--threshold", type=float, default=0.8,
                   help="jaccard (minhash/ngram) or cosine (embedding) "
                        "threshold")
    d.add_argument("--max-hamming", type=int, default=3,
                   help="simhash hamming radius")
    d.add_argument("--ngram", type=int, default=3, help="word n-gram size")
    d.add_argument("--num-cpus", type=int, default=None)
    c = sub.add_parser(
        "curate",
        help="composed curation: quality filter + duplicate "
             "canonicalization; writes per-doc verdicts, prints stage counts",
    )
    c.add_argument("input", help="parquet file or directory of documents")
    c.add_argument("-o", "--out", required=True,
                   help="output directory for verdict parquet")
    c.add_argument("--col", default="text")
    c.add_argument("--min-tokens", type=int, default=5)
    c.add_argument("--max-chars", type=int, default=50_000)
    c.add_argument("--min-alpha-pct", type=int, default=50)
    c.add_argument("--max-digit-pct", type=int, default=30)
    c.add_argument("--no-terminal-punct-rule", action="store_true")
    c.add_argument("--num-cpus", type=int, default=None)
    srv = sub.add_parser(
        "serve",
        help="HTTP service surface: submit/poll/fetch validation runs "
             "(reference routes.py analog on the stdlib http.server)")
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8099)
    srv.add_argument("--reports-dir", default="/tmp/bdvr_reports")
    srv.add_argument("--num-cpus", type=int, default=None)
    g = sub.add_parser("config",
                       help="show or edit the CLI config file (the "
                            "reference's setup/info command analog)")
    g.add_argument("action", choices=["show", "set"])
    g.add_argument("key", nargs="?",
                   help="dotted path for set, e.g. output.format")
    g.add_argument("value", nargs="?", help="value for set (YAML scalar)")
    args = ap.parse_args(argv)

    from .config import load_config, parse_scalar

    cfg = load_config(args.config)
    if cfg.load_error:
        print(f"warning: config {cfg.config_path} unreadable "
              f"({cfg.load_error}); using defaults", file=sys.stderr)

    if args.cmd == "config":
        if args.action == "show":
            print(json.dumps({"config_path": str(cfg.config_path),
                              "exists": cfg.config_path.exists(),
                              "effective": cfg.to_dict()}, indent=2))
            return 0
        if not args.key or args.value is None:
            print("error: config set requires KEY VALUE", file=sys.stderr)
            return 2
        cfg.set(*args.key.split("."), parse_scalar(args.value))
        print(f"set {args.key} = {args.value} in {cfg.config_path}")
        return 0

    # flag > config file > built-in default (reference config.py contract)
    num_cpus = (args.num_cpus if args.num_cpus is not None
                else cfg.get("performance", "num_cpus"))
    if args.cmd == "validate":
        args.format = args.format or cfg.get("output", "format",
                                             default="text")
        args.policy = args.policy or cfg.get("validation", "policy",
                                             default="default")
        args.run_dir = args.run_dir or cfg.get("output", "run_dir")
        args.rules = args.rules or cfg.get("validation", "rules")
        args.baseline = args.baseline or cfg.get("validation", "baseline")
        args.strict = args.strict or bool(cfg.get("validation", "strict"))
        if args.files_per_pass is None:
            args.files_per_pass = int(cfg.get("validation", "files_per_pass",
                                              default=64))

    if args.cmd == "validate":
        # missing/empty input must be a hard error, not an accepted empty
        # run — and it must fire BEFORE Ray starts (a typo'd path should
        # not pay multi-second session startup)
        import glob as _g

        if not _g.glob(os.path.join(args.input_dir, "*.parquet")):
            print(f"error: no parquet shards under {args.input_dir}",
                  file=sys.stderr)
            return 2

    import ray

    if not ray.is_initialized():
        # `ray job submit` / cluster runs: RAY_GRAFT_ADDRESS=auto attaches
        # to the running cluster (num_cpus is a local-mode knob and is not
        # passed); default stays a self-contained local session.
        address = os.environ.get("RAY_GRAFT_ADDRESS", "local")
        kwargs = dict(
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if address == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(address=address, **kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    if args.cmd == "serve":
        from .api import serve

        httpd = serve(args.host, args.port, reports_dir=args.reports_dir)
        print(f"serving on http://{args.host}:{httpd.server_address[1]} "
              f"(reports in {args.reports_dir})", flush=True)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.validation_state.close()
            ray.shutdown()
        return 0

    if args.cmd == "curate":
        import glob as _glob

        import ray.data as rd

        from .pipelines.curate import curate_documents

        paths = (
            sorted(_glob.glob(os.path.join(args.input, "*.parquet")))
            if os.path.isdir(args.input) else [args.input]
        )
        counts = curate_documents(
            rd.read_parquet(paths), col=args.col, out_dir=args.out,
            min_tokens=args.min_tokens, max_chars=args.max_chars,
            min_alpha_pct=args.min_alpha_pct,
            max_digit_pct=args.max_digit_pct,
            require_terminal_punct=not args.no_terminal_punct_rule,
        )
        print(json.dumps({
            "out": args.out,
            "stages": {(r["stage"] or "kept"): int(r["n"])
                       for r in counts.to_dict("records")},
        }))
        ray.shutdown()
        return 0

    if args.cmd == "dedup":
        import glob as _glob

        import pyarrow as pa
        import pyarrow.parquet as _pq
        import ray.data as rd

        from .functions import dedup as dd

        paths = (
            sorted(_glob.glob(os.path.join(args.input, "*.parquet")))
            if os.path.isdir(args.input) else [args.input]
        )
        ds = rd.read_parquet(paths)
        if args.method == "exact":
            out = dd.exact_dedup_groups(ds, id_col=args.id_col, col=args.col)
        elif args.method == "minhash":
            out = dd.minhash_near_dups(ds, col=args.col, id_col=args.id_col,
                                       threshold=args.threshold)
        elif args.method == "simhash":
            out = dd.simhash_near_dups(ds, col=args.col, id_col=args.id_col,
                                       max_hamming=args.max_hamming)
        elif args.method == "simhash-exact":
            out = dd.simhash_exact_dups(ds, col=args.col, id_col=args.id_col)
        elif args.method == "ngram":
            out = dd.ngram_jaccard_dups(ds, col=args.col, id_col=args.id_col,
                                        n=args.ngram,
                                        threshold=args.threshold)
        else:
            out = dd.embedding_near_dups(ds, id_col=args.id_col,
                                         vec_col=args.col,
                                         threshold=args.threshold)
        _pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                        args.out)
        print(json.dumps({"method": args.method, "rows": int(len(out)),
                          "out": args.out}))
        ray.shutdown()
        return 0

    if args.cmd == "baseline":
        from .drift import build_baseline

        baseline = build_baseline(args.input_dir)
        with open(args.out, "w") as fh:
            fh.write(baseline)
        print(f"baseline digests written to {args.out}")
        ray.shutdown()
        return 0

    from .pipelines.validate import validate_dir
    from .registry import from_yaml

    registry = None
    if args.rules:
        with open(args.rules) as fh:
            registry = from_yaml(fh.read())
    baseline_json = None
    if args.baseline:
        with open(args.baseline) as fh:
            baseline_json = fh.read()

    if args.resumable:
        if not args.run_dir:
            print("error: --resumable requires --run-dir", file=sys.stderr)
            return 2
        from .pipelines.validate import validate_resumable

        report = validate_resumable(
            args.input_dir,
            registry=registry,
            run_dir=args.run_dir,
            baseline_json=baseline_json,
            files_per_pass=args.files_per_pass,
            policy=args.policy,
        )
    else:
        report = validate_dir(
            args.input_dir,
            registry=registry,
            run_dir=args.run_dir,
            baseline_json=baseline_json,
            resume=(not args.no_resume
                    and bool(cfg.get("validation", "resume", default=True))),
            policy=args.policy,
            strict=args.strict,
            feedback_path=args.feedback,
        )
    if args.clean_out:
        if not args.run_dir:
            print("error: --clean-out requires --run-dir", file=sys.stderr)
            return 2
        vdir = os.path.join(args.run_dir, "violations")
        if not os.path.isdir(vdir):
            # schema-rejected / short-circuited runs produce no violations
            # table; exporting would silently keep everything — refuse
            print("error: no violations artifact (run rejected early?); "
                  "not exporting", file=sys.stderr)
        else:
            import pandas as pd

            from .pipelines.export import write_clean_output

            report["clean_export"] = write_clean_output(
                args.input_dir, args.clean_out,
                violations=pd.read_parquet(vdir),
            )
    if getattr(args, "mlflow_dir", None):
        from .state.mlflow_export import export_run

        report["mlflow_run"] = export_run(report, args.mlflow_dir)
    if args.format == "json":
        print(json.dumps(report, indent=2, default=str))
    elif args.format == "markdown":
        from .report import render_markdown

        md = render_markdown(report)
        print(md)
        if args.run_dir:
            with open(os.path.join(args.run_dir, "report.md"), "w") as fh:
                fh.write(md)
    elif args.format == "html":
        from .report import render_html

        doc = render_html(report)
        print(doc)
        if args.run_dir:
            with open(os.path.join(args.run_dir, "report.html"), "w") as fh:
                fh.write(doc)
    else:
        print(_fmt_text(report))
    ray.shutdown()
    decision = report.get("final_decision", "rejected")
    return 0 if decision in ("accepted", "accepted_from_checkpoint") else 1


if __name__ == "__main__":
    sys.exit(main())
