"""Registry of driver-checkable queries.

Two tiers:

- ``QUERIES``/``ORACLES`` — the **driver contract** (exposed through
  ``__spark_entry__``). The correctness driver verifies at most 50 queries
  per round (r01 recorded rows for exactly the first 50 registry entries),
  so this tier is capped at 50 entries chosen to cover every operator
  family in SURVEY.md §2 plus the LLM-pipeline extensions. Every entry has
  a DuckDB oracle: deterministic operators are hash-checked value-by-value;
  model-derived operators (k-means ANN, stub embeddings) register an
  *invariant projection* — the query runs the full operator pipeline, then
  emits exactly-checkable facts (self-hit rank, recall ≥ floor, arity,
  norms) that the oracle reproduces, which is strictly stronger than a
  rows-only check.
- ``EXTRA_QUERIES``/``EXTRA_ORACLES`` — additional variants (alternate
  physical strategies, redundant relational demos, superseded shapes) kept
  oracle-tested locally in ``tests/test_queries_oracle.py`` and available
  to ``bench.py``, but not spent against the driver's 50-row budget.

Column-name discipline: every computed column is aliased identically in the
Spark code and the oracle SQL (the driver hash compares columns by name).
Output schemas stay scalar-typed — the driver canonicalizer sorts rows by
every column and cannot hash array/struct cells.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
EXTRA_QUERIES: dict[str, QueryFn] = {}
EXTRA_ORACLES: dict[str, str] = {}

DRIVER_QUERY_BUDGET = 50

# --- Driver-tier rotation ledger (COVERAGE.md "Driver-tier rotation
# policy"). The driver tier is a rotating 50-slot window: every operator
# family spends at least one round with a hard driver row, then may yield
# its slot to a family that has none. Rotation is recorded HERE, not by
# editing every @register site: names in DRIVER_PROMOTED take a driver
# slot regardless of their registration's extra=True; names in
# DRIVER_DEMOTED move to the extra tier (still oracle-tested in
# tests/test_queries_oracle.py under the identical value-hash discipline,
# and still available to bench.py).
#
# Round 7: promote the 20 queued families still without a driver row
# (VERDICT r6 item 1 / COVERAGE.md r7 rotation plan) — this COMPLETES the
# rotation program: after this round every registered family has a hard
# driver CORRECTNESS row on record. The 16 r6 promotions (all green in
# CORRECTNESS_r06) rotate back to the extra tier (they register extra=True
# statically, so dropping them from PROMOTED suffices). Four extra slots
# come from multi-round-green rows whose families keep other driver
# coverage: asof_last_order (as-of keeps the promoted asof_nearest_order),
# ann_lsh_search (ANN-LSH keeps the promoted ann_lsh_multiprobe),
# near_dup_jaccard (dedup keeps exact-prefix + retain-best + the promoted
# incremental/winnow/prefix-filter rows), events_json_filter (JSON/semi-
# structured keeps the r4-green VARIANT row's family; relational keeps
# pricing_summary + orders_grouping_sets).
DRIVER_PROMOTED = frozenset(
    {
        # the four r6-new families
        "record_linkage_customers",
        "decayed_event_type_scores",
        "cooccurrence_capped_triangles",
        "cooccurrence_budget_audit",
        # never-driver-seen operator families
        "ann_lsh_multiprobe",
        "asof_nearest_order",
        "incremental_dedup",
        "winnow_dup_candidates",
        "prefix_filter_jaccard",
        "association_rules",
        "udaf_event_median",
        "udtf_token_positions",
        "cusum_level_shifts",
        "ewma_purchase_values",
        "sq8_search",
        "jl_projection_audit",
        "node2vec_biased_walks",
        "graph_skipgram_pairs",
        "copurchase_ktruss",
        "corpus_drift_js",
    }
)
DRIVER_DEMOTED = frozenset(
    {
        # statically-driver rows rotated out in r5/r6 (stay demoted)
        "frequent_event_itemsets",
        "sequential_event_patterns",
        "coverage_exemplar_stochastic",
        "trend_mann_kendall",
        "knn_pagerank",
        "opq_adc_recall",
        "bpe_merges",
        "heavy_hitter_tokens",
        "versioned_layout_audit",
        "copurchase_als_recs",
        "stream_query_serving",
        "repeated_spans",
        "semdedup_prune",
        "kmv_orderkey_overlap",
        "cms_token_freq",
        "mixture_resample",
        # r7: four more multi-round-green rows yield slots (see above)
        "asof_last_order",
        "ann_lsh_search",
        "near_dup_jaccard",
        "events_json_filter",
    }
)
assert not (DRIVER_PROMOTED & DRIVER_DEMOTED)


def register(
    name: str, oracle: str | None = None, *, extra: bool = False
) -> Callable[[QueryFn], QueryFn]:
    if name in DRIVER_PROMOTED:
        extra = False
    elif name in DRIVER_DEMOTED:
        extra = True

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES or name in EXTRA_QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        queries, oracles = (EXTRA_QUERIES, EXTRA_ORACLES) if extra else (QUERIES, ORACLES)
        queries[name] = fn
        if oracle is not None:
            oracles[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {**QUERIES, **EXTRA_QUERIES}


def all_oracles() -> dict[str, str]:
    return {**ORACLES, **EXTRA_ORACLES}


# import for side effect: populate the registry. Imports are unconditional —
# a broken query module must fail loudly, not silently shrink the driver
# contract (an ImportError here means the registry is wrong, full stop).
from vector_db_spark.queries import vector  # noqa: E402,F401  isort: skip
from vector_db_spark.queries import relational  # noqa: E402,F401  isort: skip
from vector_db_spark.queries import text  # noqa: E402,F401  isort: skip
from vector_db_spark.queries import indexing  # noqa: E402,F401  isort: skip
from vector_db_spark.queries import pquant  # noqa: E402,F401  isort: skip
from vector_db_spark.queries import stream  # noqa: E402,F401  isort: skip
from vector_db_spark.queries import multimodal  # noqa: E402,F401  isort: skip
from vector_db_spark.queries import curation  # noqa: E402,F401  isort: skip
from vector_db_spark.queries import chunking  # noqa: E402,F401  isort: skip
from vector_db_spark.queries import sketches  # noqa: E402,F401  isort: skip
from vector_db_spark.queries import timeseries  # noqa: E402,F401  isort: skip
from vector_db_spark.queries import lifecycle  # noqa: E402,F401  isort: skip
from vector_db_spark.queries import pysource  # noqa: E402,F401  isort: skip

assert len(QUERIES) <= DRIVER_QUERY_BUDGET, (
    f"{len(QUERIES)} driver queries registered, budget is {DRIVER_QUERY_BUDGET}; "
    "move variants to extra=True"
)

# rotation names must resolve: a typo'd ledger entry would otherwise no-op
# silently and leave the intended query in the wrong tier — the same
# fail-loudly policy as the unconditional module imports above
_unknown_rotation = (DRIVER_PROMOTED | DRIVER_DEMOTED) - QUERIES.keys() - EXTRA_QUERIES.keys()
assert not _unknown_rotation, (
    f"rotation ledger names not in the registry: {sorted(_unknown_rotation)}"
)
