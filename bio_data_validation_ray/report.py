"""Markdown run-report renderer — the engine's analog of the reference's
HTML/Markdown report generator (report_generator.py:136-708): decision
banner, executive summary, per-rule issue table, per-shard verdicts, top
issues for review, and actionable recommendations
(report_generator.py:307-365), rendered driver-side from the run report
dict (run_summary.json). Pure string formatting — no template engine, no
scan, safe to call on any completed report."""

from __future__ import annotations

DECISION_TITLES = {
    "accepted": "✅ Validation Passed",
    "accepted_from_checkpoint": "✅ Validation Passed (from checkpoint)",
    "conditional_accept": "⚠️ Validation Passed with Warnings",
    "rejected": "❌ Validation Failed",
    "rejected_from_checkpoint": "❌ Validation Failed (from checkpoint)",
    "conditional_accept_from_checkpoint":
        "⚠️ Validation Passed with Warnings (from checkpoint)",
    "incomplete": "⏳ Validation Incomplete",
}


def _recommendations(report: dict) -> list[str]:
    """Actionable next steps keyed off the decision + severity counts
    (report_generator.py:307-365 semantics)."""
    sev = report.get("severity_counts", {})
    decision = report.get("final_decision", "incomplete")
    recs: list[str] = []
    if decision == "rejected":
        recs.append("**Priority: address critical and error-level issues "
                    "before proceeding.**")
        if sev.get("critical"):
            recs.append(f"Fix {sev['critical']} critical issue(s) that "
                        "prevent data processing")
        if sev.get("error"):
            recs.append(f"Resolve {sev['error']} data quality error(s)")
        if report.get("rejection_reason") == "schema_validation_failed":
            recs.append("The declared schema check failed — fix column "
                        "names/types before any rule evaluation will run")
    elif decision == "conditional_accept":
        recs.append("**Data can be used with caution. Review warnings "
                    "before publication.**")
        if sev.get("warning"):
            recs.append(f"Review {sev['warning']} warning(s) to improve "
                        "data quality")
    elif decision.startswith("accepted"):
        recs.append("**Data passes all validation checks and is ready for "
                    "analysis.**")
    else:
        recs.append("Run is incomplete — resume with the same run_dir to "
                    "process the remaining shards.")
    if report.get("requires_review"):
        recs.append("Issue volume crossed the human-review thresholds — "
                    "see the top-issues table below")
    if report.get("exact_fallback_convs"):
        recs.append(f"{report['exact_fallback_convs']} conversation(s) "
                    "needed the exact cross-shard re-check (split or "
                    "duplicated turns)")
    drifted = [s for s, v in (report.get("drift") or {}).items()
               if v.get("drifted")]
    if drifted:
        recs.append(f"Distribution drift detected in shard(s): "
                    f"{', '.join(sorted(drifted)[:5])}")
    return recs


def render_markdown(report: dict) -> str:
    """Run report dict -> Markdown document."""
    decision = report.get("final_decision", "incomplete")
    sev = report.get("severity_counts", {})
    meta = report.get("ruleset_metadata", {})
    lines = [
        f"# {DECISION_TITLES.get(decision, f'Decision: {decision}')}",
        "",
        f"- **validation id**: `{report.get('validation_id', '?')}`",
        f"- **input**: `{report.get('input_dir', '?')}`",
        f"- **ruleset**: v{meta.get('rules_version', '?')} "
        f"(`{meta.get('rules_hash', '?')}`, {meta.get('n_rules', '?')} rules)",
        f"- **rows scanned**: {report.get('rows_scanned', 0):,} across "
        f"{report.get('shards_total', '?')} shard(s)",
        f"- **wall time**: {report.get('execution_time_s', '?')} s",
        "",
        "## Summary",
        "",
        "| severity | count |",
        "|---|---|",
    ]
    for k in ("critical", "error", "warning", "info"):
        lines.append(f"| {k} | {sev.get(k, 0)} |")
    if report.get("rationale"):
        lines += ["", f"> {report['rationale']}"]

    per_shard = report.get("per_shard") or {}
    if per_shard:
        lines += ["", "## Per-shard verdicts", "",
                  "| shard | decision | critical | error | warning | rows |",
                  "|---|---|---|---|---|---|"]
        for shard, v in sorted(per_shard.items()):
            c = v.get("severity_counts", {})
            lines.append(
                f"| {shard} | {v.get('decision')} | {c.get('critical', 0)} "
                f"| {c.get('error', 0)} | {c.get('warning', 0)} "
                f"| {v.get('rows_scanned', 0):,} |"
            )

    top = report.get("top_issues") or []
    if top:
        lines += ["", "## Top issues for review "
                      "(severity-prioritized, capped)", "",
                  "| rule | severity | key | value |", "|---|---|---|---|"]
        for i in top:
            key = i.get("conv_id") or i.get("shard") or ""
            if i.get("turn_idx") is not None:
                key = f"{key}:{i['turn_idx']}"
            val = str(i.get("offending_value", ""))[:60]
            lines.append(f"| {i.get('rule_id')} | {i.get('severity')} "
                         f"| {key} | {val} |")

    lines += ["", "## Recommendations", ""]
    lines += [f"- {r}" for r in _recommendations(report)]
    lines.append("")
    return "\n".join(lines)


def write_markdown(report: dict, path: str) -> str:
    md = render_markdown(report)
    with open(path, "w") as fh:
        fh.write(md)
    return path


_HTML_STYLE = """
body{font-family:system-ui,sans-serif;max-width:60rem;margin:2rem auto;
     padding:0 1rem;color:#1a1a2e}
table{border-collapse:collapse;margin:.5rem 0}
td,th{border:1px solid #ccd;padding:.25rem .6rem;text-align:left}
th{background:#eef}
blockquote{border-left:4px solid #88a;margin:0;padding:.2rem .8rem;
           color:#445}
code{background:#f0f0f6;padding:0 .2rem}
"""


def render_html(report: dict) -> str:
    """Dependency-free HTML rendering of the same report (the reference
    renders HTML via Jinja2, report_generator.py:136-183; this converts the
    Markdown structure directly — headings, tables, lists, quotes)."""
    import html as _html

    out = ["<!doctype html><html><head><meta charset='utf-8'>",
           f"<style>{_HTML_STYLE}</style></head><body>"]
    in_table = False
    in_list = False

    def close_blocks():
        nonlocal in_table, in_list
        if in_table:
            out.append("</table>")
            in_table = False
        if in_list:
            out.append("</ul>")
            in_list = False

    def inline(s: str) -> str:
        e = _html.escape(s)
        for mark, tag in (("**", "strong"), ("`", "code")):
            while e.count(mark) >= 2:
                e = e.replace(mark, f"<{tag}>", 1).replace(mark, f"</{tag}>", 1)
        return e

    for line in render_markdown(report).splitlines():
        if line.startswith("|"):
            cells = [c.strip() for c in line.strip("|").split("|")]
            if all(set(c) <= {"-"} for c in cells):
                continue  # separator row
            tag = "td" if in_table else "th"
            if not in_table:
                out.append("<table>")
                in_table = True
            out.append("<tr>" + "".join(
                f"<{tag}>{inline(c)}</{tag}>" for c in cells) + "</tr>")
        elif line.startswith("- "):
            if not in_list:
                close_blocks()
                out.append("<ul>")
                in_list = True
            out.append(f"<li>{inline(line[2:])}</li>")
        elif line.startswith("#"):
            close_blocks()
            level = len(line) - len(line.lstrip("#"))
            out.append(f"<h{level}>{inline(line[level:].strip())}</h{level}>")
        elif line.startswith("> "):
            close_blocks()
            out.append(f"<blockquote>{inline(line[2:])}</blockquote>")
        elif line.strip():
            close_blocks()
            out.append(f"<p>{inline(line)}</p>")
        else:
            close_blocks()
    close_blocks()
    out.append("</body></html>")
    return "\n".join(out)


def write_html(report: dict, path: str) -> str:
    doc = render_html(report)
    with open(path, "w") as fh:
        fh.write(doc)
    return path
