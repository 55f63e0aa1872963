"""Generate docs/PLANS.md: the formatted physical plan of every
headline query at sf0.1 — the direct evidence for the scale-posture
claims (pushdown, broadcasts, exchange counts, codegen).

Run: python scripts/explain_audit.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from mercurygate_spark.queries import all_queries  # noqa: E402
from mercurygate_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="explain_audit", cpus=8)
    queries = all_queries()
    out = [
        "# Physical plans — headline + scale-critical queries (auto-generated)",
        "",
        f"`python scripts/explain_audit.py` against `{SF_DIR}`. These are",
        "the plans the engine stakes its scale claims on; the invariants",
        "are pinned by tests/test_plans.py.",
        "",
    ]
    # Beyond the bench headline set: the operators whose plan SHAPE is
    # the scale argument (broadcast sketches, two-phase salted agg,
    # sampled IVF, Bloom prefilter) — evidence for the 100 TB posture.
    scale_showcase = [
        "agg_count_min_sketch",
        "dedup_bloom_prefilter",
        "agg_salted_skew",
        "join_skew_isolated",
        "dedup_connected_components",
        "sim_cosine_ivf_sampled",
        # round-7 additions whose plan shape IS the claim
        "join_bucketed_colocated",   # zero-exchange co-located SMJ
        "text_edit_distance_pairs",  # blocked quadratic stays equi-join
        "dedup_ngram_containment",   # shingle-equi join, no cartesian
        "agg_funnel_steps_n",        # one partitioning lineage, n steps
        # graph_pagerank is NOT showcased: its executed plan truncates
        # to a post-checkpoint scan (lineage truncation working as
        # intended) and shows none of the iteration shape; that shape
        # is pinned instead by
        # tests/test_plans.py::test_pagerank_iteration_shape_pre_checkpoint
        "text_bm25_score",           # query-filter before tf agg, tiny frames broadcast
        "window_gaps_islands",       # single user_id partitioning lineage
        # closing-session additions whose plan shape IS the claim
        "join_spatial_grid",         # grid-cell equi join, no theta/cartesian
        "agg_sequence_pattern",      # one groupBy, in-group sort, no Window
        "window_interval_coverage",  # one sort partitioning, two window passes
        "agg_theta_set_algebra",     # constant-size sketch set algebra
        "sample_poisson_bootstrap",  # map-side explode(R) + grouped sum
        "text_bpe_merge_step",       # zip-shift pairs, TakeOrderedAndProject
        "dq_mad_outliers",           # two median passes, stats broadcast back
        # round-11 wave additions whose plan shape IS the claim
        "text_gopher_filter",        # zero-exchange scan-only rule projection
        "sim_knn_graph",             # bucket-equi self-join + WindowGroupLimit
        "sim_range_search",          # bucket-equi candidates, radius filter, no window
        "text_gopher_repetition",    # map-side gram fanout, one count reduce
        "sample_prototype_rank",     # (labels x dims) scalar reduce, centroid broadcast
    ]
    for name in HEADLINE + scale_showcase:
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree + the scan details; trim codegen ids noise
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(HEADLINE) + len(scale_showcase)} plans)")


if __name__ == "__main__":
    main()
