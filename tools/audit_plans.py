"""Physical-plan audit: dump .explain(formatted) for representative queries
and flag anti-patterns (row-at-a-time Python, missing pushdown, unexpected
shuffle counts). Writes PLANS.md. Driver-side only — no jobs execute.

    python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    # name -> expectations
    ("q1_pricing_summary", {"max_exchanges": 2, "pushed_filter": True}),
    ("anti_join_repeats", {"broadcast_join": True}),
    ("intersect_kway", {"broadcast_join": True}),
    ("pair_policy_strict", {"max_exchanges": 2}),
    ("dedup_exact", {}),
    ("minhash_dedup_pairs", {}),
    ("cosine_topk", {"broadcast_join": True}),
    ("token_stats", {"max_exchanges": 0}),
    ("scrub_pii", {"max_exchanges": 0, "no_python": True}),
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from kneaddata_spark.pipeline import annotate, broadcast_models
    from kneaddata_spark.plans.entry_queries import QUERIES
    from kneaddata_spark.session import get_spark

    spark = get_spark(app="planaudit", cores=8)
    sections, problems = [], []

    # the flagship QC pipeline plan
    from kneaddata_spark.synth import clips_spark_df

    clips = clips_spark_df(spark, 100, n_partitions=4)
    qc_plan = plan_of(annotate(clips, *broadcast_models(spark)))
    checks = []
    if "BatchEvalPython" in qc_plan:
        problems.append("qc_pipeline: BatchEvalPython (row-at-a-time python!)")
    checks.append(f"ArrowEvalPython nodes: {qc_plan.count('ArrowEvalPython (')} (want 1)")
    checks.append(f"Exchange nodes: {qc_plan.count('Exchange (')} (want 0 — map-only)")
    sections.append(("qc_pipeline (annotate)", qc_plan, checks))

    for name, exp in AUDIT:
        df = QUERIES[name](spark, sf)
        p = plan_of(df)
        checks = []
        # shuffles only — BroadcastExchange is the cheap path, not a shuffle
        n_ex = len(re.findall(r"\(\d+\) Exchange\b", p))
        checks.append(f"Shuffle exchanges: {n_ex}  (broadcast exchanges: "
                      f"{len(re.findall(r'BroadcastExchange', p)) // 2})")
        if "max_exchanges" in exp and n_ex > exp["max_exchanges"]:
            problems.append(f"{name}: {n_ex} exchanges > {exp['max_exchanges']}")
        if exp.get("pushed_filter"):
            ok = "PushedFilters: [" in p and not re.search(r"PushedFilters: \[\]", p)
            checks.append(f"PushedFilters present: {ok}")
            if not ok:
                problems.append(f"{name}: no pushed filters")
        if exp.get("broadcast_join"):
            ok = "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
            checks.append(f"Broadcast join: {ok}")
            if not ok:
                problems.append(f"{name}: expected broadcast join")
        if exp.get("no_python") and ("EvalPython" in p or "MapInPandas" in p):
            problems.append(f"{name}: python in plan")
        codegen_ids = {m for m in re.findall(r"codegen id : (\d+)", p)}
        checks.append(f"WholeStageCodegen spans: {len(codegen_ids)}")
        sections.append((name, p, checks))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("# Physical plan audit (`tools/audit_plans.py`)\n\n")
        f.write("Checks: no `BatchEvalPython` anywhere; the QC hot path is one "
                "`ArrowEvalPython` and zero `Exchange`; scans show `PushedFilters`/"
                "pruned `ReadSchema`; membership joins broadcast.\n\n")
        if problems:
            f.write("## PROBLEMS\n\n" + "\n".join(f"- {p}" for p in problems) + "\n\n")
        else:
            f.write("All expectations hold.\n\n")
        for name, p, checks in sections:
            f.write(f"## {name}\n\n" + "".join(f"- {c}\n" for c in checks))
            f.write("\n```\n" + p.strip()[:4000] + "\n```\n\n")
    print("PROBLEMS:" if problems else "all plan expectations hold")
    for p in problems:
        print(" -", p)
    spark.stop()


if __name__ == "__main__":
    main()
