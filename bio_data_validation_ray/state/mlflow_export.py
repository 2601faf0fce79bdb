"""MLflow metrics export for a validation run — the engine twin of the
reference's ``scripts/metrics/push_to_mlflow.py`` (which MlflowClient-logs
validation pass rates / durations after a run).

No MLflow client exists in this environment, and none is needed: MLflow's
default backend ("file store") is a documented plain-file layout —
``<root>/<experiment_id>/<run_id>/{meta.yaml, metrics/<name>,
params/<name>, tags/<name>}`` with one ``"<timestamp_ms> <value> <step>"``
line per metric point — so the export writes that layout directly and any
stock ``mlflow ui`` / ``MlflowClient(tracking_uri="file:...")`` can read
it. If a real ``mlflow`` package is importable the client path is used
instead (import-gated, never required).

Everything logged comes from the run report ``validate_dir`` returns:
severity counts, per-stage wall times, rows scanned, decision, ruleset
version/hash — the same facts the reference pushes.
"""

from __future__ import annotations

import os
import time
import uuid


def _slug(name: str) -> str:
    return "".join(c if c.isalnum() or c in "-_. " else "_" for c in name)


def _write(path: str, text: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(text)


def _flat_metrics(report: dict) -> dict[str, float]:
    out: dict[str, float] = {}
    for sev, n in (report.get("severity_counts") or {}).items():
        out[f"violations_{sev}"] = float(n)
    for stage, info in (report.get("stages") or {}).items():
        if isinstance(info, dict) and "time_s" in info:
            out[f"stage_{stage}_time_s"] = float(info["time_s"])
    summary = (report.get("stages") or {}).get("stats", {}).get("summary", {})
    if "rows" in summary:
        out["rows_scanned"] = float(summary["rows"])
    if "execution_time_s" in report:
        out["execution_time_s"] = float(report["execution_time_s"])
    if "turns_per_sec" in report:
        out["turns_per_sec"] = float(report["turns_per_sec"])
    return out


def _params(report: dict) -> dict[str, str]:
    meta = report.get("ruleset_metadata") or {}
    p = {
        "policy": str(report.get("policy", "")),
        "input_dir": str(report.get("input_dir", "")),
        "rules_version": str(meta.get("rules_version", "")),
        "rules_hash": str(meta.get("rules_hash", "")),
        "n_rules": str(meta.get("n_rules", "")),
    }
    return {k: v for k, v in p.items() if v}


def _yaml_name(experiment: str) -> str:
    """YAML-safe scalar for the experiment name. Simple names stay plain
    (what stock mlflow writes); anything that could corrupt meta.yaml —
    newlines, ': ', '#', leading symbols, edge whitespace — gets JSON
    double-quoting, which is valid YAML."""
    import json
    import re

    if re.fullmatch(r"[A-Za-z0-9_][A-Za-z0-9 _.\-/]*", experiment) \
            and not experiment.endswith(" "):
        return experiment
    return json.dumps(experiment)


def _experiment_id(root: str, experiment: str) -> str:
    """Stable file-store experiment id per NAME: reuse the existing
    experiment dir whose meta.yaml carries this name, else allocate the
    next integer id — two different experiment names must not merge into
    one id (the client path keeps them separate; so must this one).
    Lookup parses the ``name:`` line exactly (a run_name: or substring
    hit must not match) and allocation claims the directory with
    ``os.makedirs(exist_ok=False)`` in a retry loop so two concurrent
    exporters can never race onto one id."""
    wanted = (f"name: {_yaml_name(experiment)}",
              f"name: {experiment}")  # quoted (current) + legacy unquoted
    while True:
        taken = []
        if os.path.isdir(root):
            for d in sorted(os.listdir(root)):
                if not d.isdigit():
                    continue
                # a dir without meta.yaml is CLAIMED (another exporter
                # between makedirs and its meta write, or a crash) — it
                # counts as taken so the allocator skips past it instead
                # of retrying the same id forever
                taken.append(int(d))
                meta = os.path.join(root, d, "meta.yaml")
                if not os.path.isfile(meta):
                    continue
                with open(meta) as fh:
                    if any(line.rstrip("\n") in wanted for line in fh):
                        return d
        cand = str(max(taken) + 1 if taken else 0)
        exp_dir = os.path.join(root, cand)
        try:
            os.makedirs(exp_dir, exist_ok=False)
        except FileExistsError:
            continue  # lost the race — rescan (the winner may own our name)
        _write(os.path.join(exp_dir, "meta.yaml"),
               f"artifact_location: file:{os.path.abspath(exp_dir)}\n"
               f"experiment_id: '{cand}'\n"
               "lifecycle_stage: active\n"
               f"name: {_yaml_name(experiment)}\n")
        return cand


def export_run(report: dict, root: str,
               experiment: str = "bio_data_validation_ray") -> str:
    """Log one validation run's metrics/params/tags under ``root`` in
    MLflow file-store layout (or via the mlflow client if importable).
    Returns the run directory (file path) / run_id (client path)."""
    # scope the gate to the IMPORT alone: an ImportError raised from
    # inside mlflow's own calls (lazy optional deps) must surface, not
    # silently fall through and double-log the run into the file store
    try:  # optional real client — absent in this container by design
        import mlflow  # noqa: F401
    except ImportError:
        mlflow = None
    if mlflow is not None:
        mlflow.set_tracking_uri(f"file:{os.path.abspath(root)}")
        mlflow.set_experiment(experiment)
        with mlflow.start_run() as run:
            mlflow.log_metrics(_flat_metrics(report))
            mlflow.log_params(_params(report))
            mlflow.set_tag("decision", report.get("final_decision", ""))
            return run.info.run_id

    exp_id = _experiment_id(root, experiment)
    run_id = report.get("validation_id") or uuid.uuid4().hex
    now_ms = int(time.time() * 1000)
    exp_dir = os.path.join(root, exp_id)
    run_dir = os.path.join(exp_dir, run_id)
    art = os.path.join(run_dir, "artifacts")
    # experiment meta.yaml is written once at id allocation (_experiment_id)
    _write(os.path.join(run_dir, "meta.yaml"),
           f"artifact_uri: file:{os.path.abspath(art)}\n"
           f"end_time: {now_ms}\n"
           f"experiment_id: '{exp_id}'\n"
           "lifecycle_stage: active\n"
           f"run_id: {run_id}\n"
           f"run_uuid: {run_id}\n"
           f"run_name: validation-{run_id[:8]}\n"
           "source_type: LOCAL\n"
           f"start_time: {now_ms}\n"
           "status: FINISHED\n"
           "user_id: bio_data_validation_ray\n")
    for name, val in _flat_metrics(report).items():
        _write(os.path.join(run_dir, "metrics", _slug(name)),
               f"{now_ms} {val} 0\n")
    for name, val in _params(report).items():
        _write(os.path.join(run_dir, "params", _slug(name)), str(val))
    _write(os.path.join(run_dir, "tags", "decision"),
           str(report.get("final_decision", "")))
    os.makedirs(art, exist_ok=True)
    return run_dir
