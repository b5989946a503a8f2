"""Deduplication operators for large-scale training-data pipelines.

North-star extensions (the reference has no dedup surface). Every operator
is DataFrame-in/DataFrame-out, built from shuffle-conscious primitives:

- **exact**: hash-groupBy on a content fingerprint — one shuffle on the
  16-byte digest, survivor = min id per group.
- **MinHash + LSH**: shingle → per-seed min-hash signature → band-bucket
  join. The candidate join is an equi-join on (band, band_key) — no O(n²)
  pair enumeration ever materializes; only same-bucket pairs shuffle.
- **SimHash**: 16-bit locality-sensitive fingerprint (functions.text).
- **n-gram Jaccard verify**: exact similarity for candidate pairs only.
- **embedding cosine**: near-dup by semantic similarity; brute self-join
  for small corpora, hyperplane-LSH blocking at scale
  (vector_db_spark.operators.similarity).

Hashes are md5-based so every step is reproducible in any engine — the
oracle queries in queries/text.py hash-match DuckDB end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_db_spark.caching import tracked_cache
from vector_db_spark.functions.distance import cosine_similarity
from vector_db_spark.functions.text import (
    doc_fingerprint,
    shingles,
    token_count,
    tokens,
    winnow_fingerprints,
)
from vector_db_spark.io import ensure_parallelism


def _t_lo(threshold: float) -> int:
    """Threshold floored to 6dp fixed point (×1e6). Candidate-stage bounds
    (prefix lengths, size pre-cuts) use this UNDER-estimate in exact
    integer arithmetic: the stage can only get more permissive, so the
    zero-miss completeness guarantee survives any float representation of
    ``threshold``; the exact verify stage discards the few extras."""
    import math

    return int(math.floor(threshold * 1_000_000))


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    prefix_tokens: int | None = None,
) -> DataFrame:
    """Keep the lowest-id document per content fingerprint. Adds
    ``fingerprint`` and ``group_size``; survivors only."""
    fp = df.withColumn("fingerprint", doc_fingerprint(text_col, prefix_tokens))
    return (
        fp.groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("group_size"))
        .join(fp.select(id_col, text_col), id_col)
    )


def shingle_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) distinct — the exploded unit of MinHash and Jaccard.

    Distinctness is per document (a shingle *set*), so it is computed with
    ``array_distinct`` BEFORE the explode — map-side, no shuffle. A naive
    ``explode().distinct()`` would shuffle the entire exploded corpus.

    The input is spread across cores first (``ensure_parallelism``): the
    md5-heavy signature stage downstream must never run on one scan split."""
    df = ensure_parallelism(df)
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(tokens(text_col), n))).alias("shingle"),
    )


def minhash_wide(
    sh: DataFrame, id_col: str = "doc_id", n_hashes: int = 8
) -> DataFrame:
    """(id, sig array<string>): all ``n_hashes`` minima, computed as ONE
    wide aggregation over the shingle table (one shuffle, map-side partial
    mins, one row per doc). Not a seed×shingle explode, which would blow
    the pre-shuffle data up n_hashes× at 100 TB.

    Hash family: each md5 digest is sliced into four independent 32-bit
    hex words (hash i ← word i%4 of ``md5(i//4 || ':' || shingle)``), so
    ``n_hashes`` minima cost ⌈n/4⌉ digests per shingle instead of n —
    md5 dominates the signature stage, and any engine reproduces the
    slicing exactly (lexicographic min over fixed-width hex = numeric
    min)."""
    n_seeds = (n_hashes + 3) // 4
    digests = sh.select(
        F.col(id_col),
        *[
            F.md5(F.concat_ws(":", F.lit(s), F.col("shingle"))).alias(f"__h{s}")
            for s in range(n_seeds)
        ],
    )
    aggs = [
        F.min(F.substring(F.col(f"__h{i // 4}"), (i % 4) * 8 + 1, 8)).alias(f"__mh_{i}")
        for i in range(n_hashes)
    ]
    return (
        digests.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"__mh_{i}") for i in range(n_hashes)]).alias("sig"),
        )
    )


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", n_hashes: int = 8
) -> DataFrame:
    """Long form (id, hash_idx, minhash) of :func:`minhash_wide` — the
    interchange layout (one row per signature cell)."""
    return minhash_wide(sh, id_col, n_hashes).select(
        F.col(id_col),
        F.posexplode("sig").alias("hash_idx", "minhash"),
    )


def band_keys(
    wide: DataFrame, id_col: str = "doc_id", n_bands: int = 4
) -> DataFrame:
    """(id, band, band_key): LSH band digests derived map-side from the
    wide signature row (md5 of the comma-joined band slice) — no
    re-aggregation of an exploded signature, zero extra shuffles.

    ``n_bands`` must divide the signature width: a non-divisor silently
    leaves trailing signature cells un-banded, and n_bands > n_hashes
    degenerates the band width to 0 — every band would slice the SAME
    first cell, turning the threshold curve into "docs agreeing on one
    minhash" with exploding candidate volume. The width is data-carried
    (``sig`` is an array column), so the check is an in-expression
    assert_true rather than a plan-time raise."""
    width = F.when(
        F.assert_true(
            (F.size("sig") % n_bands == 0) & (F.size("sig") >= n_bands),
            F.concat(
                F.lit(f"n_bands={n_bands} must divide the signature width "),
                F.size("sig").cast("string"),
            ),
        ).isNull(),
        (F.size("sig") / n_bands).cast("int"),
    )
    return wide.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.md5(F.concat_ws(",", F.slice("sig", b * width + 1, width))),
            )
        ).alias("band", "band_key"),
    )


def lsh_candidate_pairs(
    wide: DataFrame, id_col: str = "doc_id", n_bands: int = 4
) -> DataFrame:
    """Band the wide signature (n_hashes/n_bands cells per band), bucket by
    the band digest, emit same-bucket pairs (a < b). Docs agreeing on ALL
    hashes of any band become candidates — the standard LSH guarantee. The
    only shuffle is the (band, band_key) equi-join itself."""
    # self-joined below: without the cache the minhash lineage runs twice
    banded = tracked_cache(band_keys(wide, id_col, n_bands), "dedup.lsh.banded")
    a = banded.select(F.col(id_col).alias("doc_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(
    sh: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    *,
    broadcast: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs only, via per-doc shingle
    SETS: cut the shingle stream to candidate docs (semi-join), regroup
    each surviving doc's shingles into one array, then score every pair
    with ``array_intersect`` — |A∪B| falls out of the two set sizes.

    One small shuffle total (the per-candidate-doc regroup) plus the pair
    scoring joins — no (doc, shingle)-keyed corpus join, no per-pair
    aggregation shuffle. Per-doc arrays are bounded by document length,
    the same bound the exploded form already carried per group.

    ``broadcast`` picks the physical strategy for the candidate-pair
    joins: True hints the pair/doc-cut tables onto the broadcast side
    (candidate pairs are tiny in the self-dedup shape), False leaves
    them un-hinted so Catalyst/AQE route a corpus-shaped candidate set
    through plain shuffle equi-joins instead of dying on the 8 GB
    broadcast ceiling — callers with a size probe (``incremental_dedup``)
    pass the probe's verdict through."""
    hint = F.broadcast if broadcast else (lambda d: d)
    cand_docs = (
        pairs.select(F.col("doc_a").alias(id_col))
        .unionByName(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sets = (
        sh.join(hint(cand_docs), id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("__sh"))
    )
    a = sets.select(F.col(id_col).alias("doc_a"), F.col("__sh").alias("__sa"))
    b = sets.select(F.col(id_col).alias("doc_b"), F.col("__sh").alias("__sb"))
    n_common = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    return (
        a.join(hint(pairs), "doc_a")
        .join(hint(b), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                n_common
                / (F.size("__sa") + F.size("__sb") - n_common),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
    threshold: float = 0.5,
    max_broadcast_pairs: int = 100_000,
) -> DataFrame:
    """The full MinHash+LSH near-dup pipeline: shingle → sign → band →
    candidate join → exact Jaccard verify. Never enumerates O(n²) pairs.

    The shingle table feeds the signatures AND both sides of the verify
    join — cached so it materializes once (at cluster scale: persist to
    Parquet instead; same plan shape).

    The verify-stage broadcasts assume the candidate-pair set is small
    (Σ bucket² keeps it so on healthy corpora) — but a degenerate corpus
    (boilerplate-heavy, near-identical shards) concentrates one bucket
    and the pair set grows toward n². Same guard as ``incremental_dedup``:
    a ``limit(max+1)`` probe on the (cached) candidate table — O(probe),
    and the verify re-reads the cache it warmed — drops the broadcast
    hints past ``max_broadcast_pairs`` so the verify degrades to shuffle
    equi-joins instead of broadcasting an n²-shaped pair table."""
    sh = tracked_cache(shingle_table(df, text_col, id_col, n), "dedup.neardup.sh")
    wide = minhash_wide(sh, id_col, n_hashes)
    # candidates are consumed twice by the verify (doc cut + pair join)
    cands = tracked_cache(
        lsh_candidate_pairs(wide, id_col, n_bands), "dedup.neardup.cands"
    )
    small = (
        cands.limit(max_broadcast_pairs + 1).count() <= max_broadcast_pairs
    )
    return jaccard_verify(sh, cands, id_col, threshold, broadcast=small)


def dedup_retain_best(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """The dedup **end-game**: near-duplicate *pairs* are not a cleaned
    corpus — transitively-connected duplicates form clusters, and exactly
    one document per cluster should survive. Pipeline:

        MinHash+LSH pairs → connected components → keep best per component

    Components come from hash-min label propagation
    (:func:`~vector_db_spark.operators.knn_graph.components_from_edges`) —
    iterative joins, never a driver-side union-find, so transitive chains
    (A~B~C with A≁C) still collapse to ONE survivor, which the greedy
    drop-greater-id pair cut cannot guarantee. Survivor = highest
    :func:`quality_score`, ties to the smallest id — the "keep the best
    copy" policy of a training-data prep job (greedy min-id keeps whatever
    enumerated first).

    Returns one row per surviving document: ``(id, component,
    cluster_size, quality)``; ``component`` is the min id of the duplicate
    cluster, singletons survive trivially with ``cluster_size = 1``.
    Deterministic end-to-end: reproducible in any engine with recursive
    SQL (see queries/text.py::dedup_retain_best)."""
    from vector_db_spark.functions.text import quality_score
    from vector_db_spark.operators.knn_graph import components_from_edges
    from pyspark.sql import Window

    id_type = dict(df.dtypes)[id_col]
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        # components_from_edges (and the coalesce fallback below) cast ids
        # to long; a string/uuid id would cast to NULL, collapsing the
        # ENTIRE corpus into one NULL component and surviving exactly one
        # document — silent near-total data loss. Pre-map ids instead.
        raise ValueError(
            f"{id_col!r} must be an integral column (got {id_type}): map "
            "string ids to a dense long (e.g. global_row_number) first"
        )
    pairs = near_dup_pairs_minhash(
        df, text_col, id_col, n=n, n_hashes=n_hashes, n_bands=n_bands, threshold=threshold
    )
    comp = components_from_edges(pairs.select("doc_a", "doc_b"), "doc_a", "doc_b")
    labeled = (
        df.select(F.col(id_col), quality_score(text_col).alias("quality"))
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("component", F.coalesce("component", F.col(id_col).cast("long")))
    )
    w = Window.partitionBy("component")
    ranked = labeled.select(
        id_col,
        "component",
        "quality",
        F.count("*").over(w).alias("cluster_size"),
        F.row_number()
        .over(w.orderBy(F.desc("quality"), F.asc(id_col)))
        .alias("__rk"),
    )
    return ranked.filter(F.col("__rk") == 1).select(
        id_col, "component", "cluster_size", "quality"
    )


def incremental_dedup(
    existing: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
    threshold: float = 0.5,
    prefix_tokens: int | None = None,
    max_broadcast_batch: int = 100_000,
) -> DataFrame:
    """Dedup an **incoming batch against an already-indexed corpus** — the
    production shape of corpus maintenance (a daily crawl landing on a
    100 TB store), where re-running full-corpus dedup per batch would be
    absurd. One row per incoming document:

        (id, dup_exact_of, dup_near_of, near_jaccard, is_new)

    ``dup_exact_of`` = min existing id with an identical content
    fingerprint; ``dup_near_of`` = the existing id with the highest n-gram
    Jaccard ≥ ``threshold`` among LSH candidates (ties to the smallest id);
    ``is_new`` = neither matched. Ids must be disjoint across the two
    inputs (they share one id space in a real corpus).

    Scale posture — the batch is *usually* small and the corpus is not,
    so in the common shape every join puts the batch on the broadcast
    side and the corpus side **streams map-side with zero shuffle**:
    fingerprints probe a broadcast batch-fp table; band keys are derived
    map-side on the corpus stream and probe broadcast batch band keys;
    Jaccard verification touches only candidate docs (semi-join cut, as
    in :func:`jaccard_verify`). That smallness is ENFORCED, not trusted
    (the knn_join guard pattern, operators/knn.py): the batch row count
    is probed with a ``limit(max+1).count()`` — O(threshold), never a
    full count of an unbounded input — and past ``max_broadcast_batch``
    rows (a backfill, a merged crawl) every batch-side hint is dropped so
    the fp/band/verify joins run as plain shuffle equi-joins under
    Catalyst/AQE instead of dying on the 8 GB broadcast ceiling with an
    opaque OOM. Both routes produce identical rows (parity-tested); the
    routed form costs the shuffles the broadcast form avoided — measured
    at a corpus-shaped batch in SCALE.md wave-15. At cluster scale the
    corpus signature/band table would be a *persisted* incremental index
    (written once per batch append, exactly like the IVF corpus) — the
    plan shape here is identical, minus the re-derivation."""
    small = (
        incoming.select(id_col).limit(max_broadcast_batch + 1).count()
        <= max_broadcast_batch
    )
    hint = F.broadcast if small else (lambda d: d)
    fp = doc_fingerprint(text_col, prefix_tokens)
    ex_fp = existing.select(F.col(id_col).alias("__ex_id"), fp.alias("fingerprint"))
    in_fp = incoming.select(F.col(id_col), fp.alias("fingerprint"))
    exact = (
        ex_fp.join(hint(in_fp), "fingerprint")
        .groupBy(id_col)
        .agg(F.min("__ex_id").alias("dup_exact_of"))
    )

    in_sh = tracked_cache(
        shingle_table(incoming, text_col, id_col, n), "dedup.incremental.in_sh"
    )
    # the corpus shingle stream feeds its band keys AND the Jaccard verify
    # and is deliberately NOT cached: recomputing the map-side explode
    # pipelines straight into each consumer, while materializing it costs
    # more than the recompute (measured). A real deployment replaces the
    # band-key recompute entirely with the persisted signature index.
    ex_sh = shingle_table(existing, text_col, id_col, n)
    in_bands = band_keys(minhash_wide(in_sh, id_col, n_hashes), id_col, n_bands)
    ex_bands = band_keys(minhash_wide(ex_sh, id_col, n_hashes), id_col, n_bands)
    cand = (
        ex_bands.select(F.col(id_col).alias("doc_b"), "band", "band_key")
        .join(
            hint(in_bands.select(F.col(id_col).alias("doc_a"), "band", "band_key")),
            ["band", "band_key"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    # candidate volume scales with the batch side, so the verify joins
    # inherit the same routing verdict as the fp/band probes
    near = jaccard_verify(
        in_sh.unionByName(ex_sh), cand, id_col, threshold, broadcast=small
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_a").orderBy(F.desc("jaccard"), F.asc("doc_b"))
    near_best = (
        near.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("doc_a").alias(id_col),
            F.col("doc_b").alias("dup_near_of"),
            F.col("jaccard").alias("near_jaccard"),
        )
    )
    return (
        incoming.select(id_col)
        .join(exact, id_col, "left")
        .join(near_best, id_col, "left")
        .select(
            id_col,
            "dup_exact_of",
            "dup_near_of",
            "near_jaccard",
            (F.col("dup_exact_of").isNull() & F.col("dup_near_of").isNull()).alias(
                "is_new"
            ),
        )
    )


def winnow_fp_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """(id, fp) — one row per winnowing-selected k-gram hash. Selection and
    per-doc dedup (``array_distinct``) happen map-side before the explode;
    the table is ~2/(w+1) of the k-gram count, not all of it."""
    df = ensure_parallelism(df)
    return df.select(
        F.col(id_col),
        F.explode(winnow_fingerprints(text_col, k, w)).alias("fp"),
    )


def winnow_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 8,
    w: int = 4,
    min_shared: int = 5,
    max_df: int = 50,
) -> DataFrame:
    """Copy-detection candidate pairs à la MOSS: docs sharing ≥
    ``min_shared`` winnowing fingerprints. The pair join is an equi-join on
    the fingerprint hash — volume Σ df(fp)², never n².

    ``max_df`` drops fingerprints appearing in more than that many docs
    before the self-join (one count aggregation + broadcast-able filter).
    This is the skew guard: boilerplate k-grams (headers, license text)
    otherwise concentrate the join on a handful of hot keys AND flood the
    output with semantically meaningless matches — the same df-cut every
    production copy-detector applies."""
    fps = winnow_fp_table(df, text_col, id_col, k=k, w=w)
    rare = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("fp")
    )
    # cache: the cut table feeds both sides of the self-join
    fps = tracked_cache(fps.join(rare, "fp", "left_semi"), "dedup.winnow.fps")
    a = fps.select(F.col(id_col).alias("doc_a"), "fp")
    b = fps.select(F.col(id_col).alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def embedding_near_dup_blocked(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    *,
    n_tables: int | None = None,
    n_bits: int | None = None,
    corpus_count: int | None = None,
) -> DataFrame:
    """Cosine near-dup pairs with hyperplane-LSH blocking — the 100 TB
    path. Candidate pairs are ids sharing a bucket in any of the L seeded
    hyperplane tables (an equi-join on (table_idx, bucket), volume
    Σ bucket_size² — never n²); cosine is verified only within candidates.
    Approximate by construction: recall for a pair at cosine s is
    1-(1-p(s)^h)^L with p(s)=1-acos(s)/π — near-1 for true near-dups
    (s ≥ 0.9), deliberately lossy for weak similarities. The exact
    ``embedding_near_dup_pairs`` below is the recall baseline.

    GEOMETRY FOLLOWS THE CORPUS by default: when neither ``n_tables``
    nor ``n_bits`` is passed, both are derived from the corpus count via
    :func:`similarity.derive_lsh_geometry` (h ≈ log₂(n/target_bucket),
    L grown to hold the near-dup recall floor) — one cheap count()
    (pass ``corpus_count`` to skip it). The round-5 scale campaign
    measured why static defaults are a trap: fixed h=4 was 11.5× wall at
    10× data and "unusable by construction" at 200 k vectors. The derived
    geometry GROWS with the corpus (already (5, 5) at n=2000), so callers
    that must stay bit-identical to a pinned oracle (the registered
    ``embedding_near_dup`` query) pass ``n_tables``/``n_bits`` explicitly
    — passing either knob pins that knob and derives nothing.

    The recall floor is NOT silently tradable on this default path:
    geometry derivation runs strict. When the floor needs more tables
    than the budget allows (past ~300 k vectors at floor 0.9), the
    blocker AUTO-ESCALATES to multi-probe — one join side expands to
    every Hamming-distance-1 bucket (``expand_probe_buckets``), the
    geometry re-derives against the multiprobe collision probability
    P(d≤1) = p^h + h·p^(h−1)(1−p), and if even that cannot hold the
    floor the call RAISES instead of quietly missing near-dups."""
    from vector_db_spark.operators import similarity as _sim
    from vector_db_spark.operators.similarity import (
        derive_strict_geometry,
        expand_probe_buckets,
        hyperplane_lsh_buckets,
    )

    use_multiprobe = False
    if n_tables is None and n_bits is None:
        n = corpus_count if corpus_count is not None else df.count()
        n_tables, n_bits, use_multiprobe = derive_strict_geometry(
            n, threshold=threshold
        )
    buckets = hyperplane_lsh_buckets(
        df,
        vec_col,
        id_col,
        n_tables=n_tables if n_tables is not None else _sim.N_TABLES,
        n_bits=n_bits if n_bits is not None else _sim.N_BITS,
    )
    a = buckets.select(F.col(id_col).alias("id_a"), "table_idx", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "table_idx", "bucket")
    if use_multiprobe:
        # one side only: probing is symmetric at d≤1 (y ∈ probes(x) ⟺
        # x ∈ probes(y)), so expanding A alone finds every unordered
        # pair the analytic recall accounts for, at (1+h)× — not
        # (1+h)² — candidate volume.
        a = expand_probe_buckets(a, n_bits if n_bits is not None else _sim.N_BITS)
    cand = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()  # a pair can collide in several tables
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", F.round(cosine_similarity("va", "vb"), 6))
        .filter(F.col("cos_sim") > threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_budget: int | None = None,
    corpus_count: int | None = None,
    benchmark_count: int | None = None,
) -> DataFrame:
    """SEMANTIC train/benchmark decontamination — the embedding-space twin
    of ``decontaminate_ngrams``: flag every corpus vector whose cosine to
    ANY benchmark vector reaches ``threshold`` (paraphrased benchmark
    leakage that n-gram overlap misses). One row per corpus vector:
    ``(id, max_benchmark_sim, contaminated)``.

    Scale posture: benchmark suites are SMALL by nature (10³-10⁴ rows),
    so the benchmark side broadcasts and the corpus is scored in ONE
    map-side pass (corpus × |benchmark| cosine evaluations, partial-agg
    max per id — the corpus never shuffles, no candidate explosion). At
    benchmark sizes where corpus×|B| row-visits stop being a scan-cost
    multiple, use :func:`embedding_decontaminate_blocked` instead — the
    broadcast form is deliberately exact because decontamination is a
    recall-critical cut: a missed leak poisons an eval. MEASURED
    (SCALE.md wave-14c): at 194 k corpus × 5.4 k benchmark this exact
    form is 1.05 B cosines = 763 s on local[32] while the blocked form
    covers the same corpus in 6.1 s — when the suite grows with the
    corpus, the wall is real.

    The one-row-per-distinct-corpus-id contract holds even for an EMPTY
    benchmark (an upstream filter that matched nothing): that case
    short-circuits to an all-clean verdict table — ``max_benchmark_sim``
    NULL, ``contaminated`` false — so a pipeline keeping ``~contaminated``
    rows keeps the whole corpus instead of silently dropping it. The
    common (non-empty) path stays the single cross-score + aggregation:
    no extra corpus pass rides the hot path for the edge case.

    ``pair_budget`` is the preflight-then-run guard (same pattern as the
    co-occurrence wedge budget): when set, the corpus×|B| cosine bill is
    priced BEFORE any scoring — pass ``corpus_count``/``benchmark_count``
    when you already hold them to skip the count jobs — and an
    over-budget call raises naming the bill and the blocked alternative,
    never an hours-long surprise (the wave-14c wall)."""
    if pair_budget is not None:
        nc = corpus_count if corpus_count is not None else corpus.count()
        nb = benchmark_count if benchmark_count is not None else benchmark.count()
        if nc * nb > pair_budget:
            raise ValueError(
                f"exact decontamination prices at {nc:,}×{nb:,} = "
                f"{nc * nb:,} cosine evaluations (> pair_budget "
                f"{pair_budget:,}; measured ~1.4M cosines/s/core at dim "
                "64, SCALE.md wave-14c) — use "
                "embedding_decontaminate_blocked, shrink the benchmark, "
                "or raise the budget"
            )
    empty = (
        benchmark_count == 0
        if benchmark_count is not None
        else benchmark.isEmpty()
    )
    if empty:
        return corpus.select(id_col).distinct().select(
            id_col,
            F.lit(None).cast("double").alias("max_benchmark_sim"),
            F.lit(False).alias("contaminated"),
        )
    b = F.broadcast(benchmark.select(F.col(vec_col).alias("__bv")))
    return (
        corpus.select(id_col, vec_col)
        .join(b)
        .select(
            id_col,
            F.round(cosine_similarity(vec_col, "__bv"), 6).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.max("__s").alias("max_benchmark_sim"))
        .select(
            id_col,
            "max_benchmark_sim",
            F.coalesce(
                F.col("max_benchmark_sim") >= threshold, F.lit(False)
            ).alias("contaminated"),
        )
    )


def embedding_decontaminate_multi(
    corpus: DataFrame,
    suites: dict[str, DataFrame],
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_budget: int | None = None,
    corpus_count: int | None = None,
    suite_counts: dict[str, int] | None = None,
) -> DataFrame:
    """Per-suite SEMANTIC decontamination in one corpus pass — the
    embedding-space twin of ``decontaminate_ngrams_multi``: every corpus
    vector reports, for EACH held-out suite, its max cosine to that
    suite and a ``>= threshold`` contamination flag. One row per
    (corpus id, suite): ``(id, suite, max_benchmark_sim, contaminated)``
    — the full audit table, so per-suite thresholds and drop-vs-mask
    policies stay downstream decisions.

    Spark shape: the suites are tagged and unioned into one broadcast
    (suite, vector) table, so the corpus is cross-scored in ONE
    map-side pass regardless of suite count, and the per-suite max
    falls out of the (id, suite) partial aggregation — the corpus
    never shuffles, exactly the single-suite plan with a second
    grouping key. ``pair_budget`` prices the corpus × Σ|suite| cosine
    bill before any scoring (the wave-14c guard); pass
    ``corpus_count``/``suite_counts`` to skip the count jobs. An EMPTY
    suite still yields its all-clean verdict rows (NULL sim, false) —
    the same keep-the-corpus contract the single form documents."""
    if not suites:
        raise ValueError("embedding_decontaminate_multi needs at least one suite")
    counts = dict(suite_counts or {})
    for name, sdf in suites.items():
        if name not in counts:
            counts[name] = sdf.count()
    if pair_budget is not None:
        nc = corpus_count if corpus_count is not None else corpus.count()
        total_b = sum(counts.values())
        if nc * total_b > pair_budget:
            raise ValueError(
                f"exact multi-suite decontamination prices at {nc:,}×"
                f"{total_b:,} = {nc * total_b:,} cosine evaluations "
                f"(> pair_budget {pair_budget:,}) — use the blocked form "
                "per suite, shrink the suites, or raise the budget"
            )
    tagged = None
    for name, sdf in suites.items():
        if counts[name] == 0:
            continue
        one = sdf.select(
            F.lit(name).alias("suite"), F.col(vec_col).alias("__bv")
        )
        tagged = one if tagged is None else tagged.unionByName(one)
    parts = []
    if tagged is not None:
        parts.append(
            corpus.select(id_col, vec_col)
            .join(F.broadcast(tagged))
            .select(
                id_col,
                "suite",
                F.round(cosine_similarity(vec_col, "__bv"), 6).alias("__s"),
            )
            .groupBy(id_col, "suite")
            .agg(F.max("__s").alias("max_benchmark_sim"))
            .select(
                id_col,
                "suite",
                "max_benchmark_sim",
                F.coalesce(
                    F.col("max_benchmark_sim") >= threshold, F.lit(False)
                ).alias("contaminated"),
            )
        )
    empty_names = [n for n in suites if counts[n] == 0]
    if empty_names:
        ids = corpus.select(id_col).distinct()
        names = F.explode(
            F.array(*[F.lit(n) for n in sorted(empty_names)])
        ).alias("suite")
        parts.append(
            ids.select(
                id_col,
                names,
            ).select(
                id_col,
                "suite",
                F.lit(None).cast("double").alias("max_benchmark_sim"),
                F.lit(False).alias("contaminated"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def embedding_decontaminate_blocked(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    threshold: float = 0.9,
    n_tables: int | None = None,
    n_bits: int | None = None,
    corpus_count: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The LSH-blocked scale path of :func:`embedding_decontaminate`, for
    benchmark suites too large to broadcast-score exactly: BOTH sides are
    bucketed by the seeded hyperplanes and a corpus vector is cosine-
    verified only against benchmark vectors sharing a bucket in any
    table (candidate volume Σ per-bucket corpus×benchmark, never
    corpus×|B|). Output rows exist only for corpus ids with ≥ 1 bucket
    collision — collision-free ids are analytically below the recall
    floor at the contamination threshold, i.e. reported clean.

    Approximate by construction with the SAME recall analytics as
    near-dup blocking (decontamination anchors at s ≥ threshold, the
    easy regime for hyperplane LSH); geometry defaults derive from the
    corpus count STRICT with auto-multiprobe escalation, exactly like
    :func:`embedding_near_dup_blocked` — a floor the table budget cannot
    hold raises rather than silently missing leaks."""
    from vector_db_spark.operators import similarity as _sim
    from vector_db_spark.operators.similarity import (
        derive_strict_geometry,
        expand_probe_buckets,
        hyperplane_lsh_buckets,
    )

    use_multiprobe = False
    if n_tables is None and n_bits is None:
        n = corpus_count if corpus_count is not None else corpus.count()
        n_tables, n_bits, use_multiprobe = derive_strict_geometry(
            n, threshold=threshold
        )
    nt = n_tables if n_tables is not None else _sim.N_TABLES
    nb = n_bits if n_bits is not None else _sim.N_BITS
    cb = hyperplane_lsh_buckets(corpus, vec_col, id_col, n_tables=nt, n_bits=nb)
    bb = hyperplane_lsh_buckets(benchmark, vec_col, id_col, n_tables=nt, n_bits=nb)
    if use_multiprobe:
        # benchmark side expands (it is the smaller side): d≤1 probing is
        # symmetric, so one-side expansion realizes the multiprobe recall
        bb = expand_probe_buckets(
            bb.select(F.col(id_col), "table_idx", "bucket"), nb
        )
    cand = (
        cb.select(F.col(id_col).alias("__cid"), "table_idx", "bucket")
        .join(
            bb.select(F.col(id_col).alias("__bid"), "table_idx", "bucket"),
            ["table_idx", "bucket"],
        )
        .select("__cid", "__bid")
        .distinct()
    )
    cv = corpus.select(F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv"))
    bv = benchmark.select(F.col(id_col).alias("__bid"), F.col(vec_col).alias("__bv"))
    return (
        cand.join(cv, "__cid")
        .join(bv, "__bid")
        .select(
            F.col("__cid").alias(id_col),
            F.round(cosine_similarity("__cv", "__bv"), 6).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.max("__s").alias("max_benchmark_sim"))
        .select(
            id_col,
            "max_benchmark_sim",
            # NULL-safe like the exact twin: a candidate set whose every
            # cosine is NULL (null/zero-norm partners) must read clean,
            # not NULL — `~contaminated` filters drop NULL rows silently
            F.coalesce(
                F.col("max_benchmark_sim") >= threshold, F.lit(False)
            ).alias("contaminated"),
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Cosine near-dup pairs by brute self-join — exact, O(n²) scored but
    nothing materialized beyond the passing pairs. The recall baseline for
    ``embedding_near_dup_blocked``; never register this shape against a
    corpus-sized table pair."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine_similarity("va", "vb"), 6))
        .filter(F.col("cos_sim") > threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def ngram_position_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 8
) -> DataFrame:
    """(id, pos, gram): every token-position n-gram digest, map-side.

    The positional twin of :func:`shingle_table` — positions are KEPT (no
    ``array_distinct``) because span detection needs to know *where* a
    repeated n-gram occurs, not just that it occurs. Output rows ≈ total
    corpus tokens; the explode is a pure projection."""
    # tokens(...) let-bound via the outer transform so the tokenizer regex
    # runs once per row, not once per gram position (the O(L²) trap
    # documented at functions/text.winnow_fingerprints)
    grams = F.element_at(
        F.transform(
            F.array(tokens(text_col)),
            lambda t: F.when(
                F.size(t) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - n),  # size-n+1 starts
                    lambda p: F.md5(F.concat_ws(" ", F.slice(t, p + 1, n))),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
        1,
    )
    return df.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gram")
    )


def repeated_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-span detection — the Spark-idiomatic
    equivalent of exact substring deduplication (Lee et al., "Deduplicating
    Training Data Makes Language Models Better": suffix-array repeated
    sequences; here fixed-width token n-grams hash-grouped across the
    corpus — what a suffix array finds at every length ≥ n, the n-gram
    grid finds as runs of flagged starts).

    A position is flagged when the n-gram STARTING there appears in
    ≥ ``min_docs`` distinct documents; overlapping flagged windows merge
    into spans (gaps-and-islands over start positions, window-local).
    One row per doc:

        (id, n_tokens, n_rep_starts, n_spans, rep_token_frac)

    where ``rep_token_frac`` is the fraction of the doc's tokens covered
    by repeated spans — the quantity a cleaning pipeline thresholds on.

    Scale posture: the explode is rows ≈ corpus tokens (the same budget
    the shingle/MinHash stage already pays); repeated-gram detection is
    ONE aggregation on the gram digest with a distinct-doc count
    (map-side partial), and the flag join is an equi-join on the digest.
    The islands pass shuffles only flagged positions (a small fraction of
    the corpus by construction) keyed by doc. No suffix array, no global
    sort, no driver state."""
    pos_tab = ngram_position_table(df, text_col, id_col, n)
    repeated = (
        pos_tab.groupBy("gram")
        .agg(F.count_distinct(id_col).alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("gram")
    )
    flagged = pos_tab.join(repeated, "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        flagged.withColumn("__prev", F.lag("pos").over(w))
        .withColumn(
            "__new_island",
            (F.col("__prev").isNull() | (F.col("pos") > F.col("__prev") + n - 1)).cast(
                "int"
            ),
        )
        .withColumn("__island", F.sum("__new_island").over(w))
        .groupBy(id_col, "__island")
        .agg((F.max("pos") - F.min("pos") + n).alias("__covered"))
    )
    per_doc = islands.groupBy(id_col).agg(
        F.sum("__covered").alias("__rep_tokens"),
        F.count("*").alias("n_spans"),
    )
    starts = flagged.groupBy(id_col).agg(F.count("*").alias("n_rep_starts"))
    return (
        # token_count, not size(tokens(...)): blank text must report 0
        # tokens here, consistent with the accounting packing uses —
        # size(split('')) is 1 and would skew rep_token_frac denominators
        df.select(F.col(id_col), token_count(text_col).cast("long").alias("n_tokens"))
        .join(starts, id_col, "left")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_rep_starts", F.lit(0)).cast("long").alias("n_rep_starts"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            # n_tokens == 0 (blank/whitespace-only text) must yield 0.0,
            # matching the oracle's CASE — the raw division is NULL on
            # non-ANSI (which F.least SKIPS, misreporting 1.0) and raises
            # DIVIDE_BY_ZERO under Spark 4's ANSI default.
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.least(
                        F.coalesce("__rep_tokens", F.lit(0)) / F.col("n_tokens"),
                        F.lit(1.0),
                    ),
                    6,
                )
            )
            .alias("rep_token_frac"),
        )
    )


def semantic_dedup(
    assigned: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """SemDeDup (Abbas et al.): cluster-then-dedup over embeddings. Input
    rows carry a cluster assignment (any clustering — IVF/k-means here);
    within each cluster, a row is PRUNED when a lower-id cluster-mate has
    cosine similarity ≥ ``threshold`` (keep-first-by-id — deterministic,
    engine-reproducible). One row per input vector:

        (id, cluster_id, max_sim_lower, pruned)

    Scale posture: the pairwise compare is BLOCKED by the cluster — the
    self-join is an equi-join on ``cluster_col`` (Σ cluster² pair volume,
    the SemDeDup design point: clusters are small relative to the corpus,
    so this never approaches n²). Mega-cluster skew shares the IVF
    answer: AQE skew-join split, or re-cluster with larger k."""
    a = assigned.select(
        F.col(cluster_col),
        F.col(id_col).alias("__ida"),
        F.col(vec_col).alias("__va"),
    )
    b = assigned.select(
        F.col(cluster_col),
        F.col(id_col).alias("__idb"),
        F.col(vec_col).alias("__vb"),
    )
    sims = (
        a.join(b, cluster_col)
        .filter(F.col("__idb") < F.col("__ida"))
        .select(
            cluster_col,
            F.col("__ida").alias(id_col),
            F.round(cosine_similarity("__va", "__vb"), 6).alias("__sim"),
        )
        .groupBy(cluster_col, id_col)
        .agg(F.max("__sim").alias("max_sim_lower"))
    )
    return (
        assigned.select(id_col, cluster_col)
        .join(sims, [id_col, cluster_col], "left")
        .select(
            id_col,
            cluster_col,
            F.coalesce("max_sim_lower", F.lit(-1.0)).alias("max_sim_lower"),
            (F.coalesce("max_sim_lower", F.lit(-1.0)) >= threshold).alias("pruned"),
        )
    )


# --- SimHash Hamming near-dup (Charikar '02 / Manku et al. WWW'07) -----------


def simhash60(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc 60-bit SimHash: bit j is the majority vote of bit j across
    the doc's token hashes (60 bits = the repo's 15-md5-nibble idiom —
    sign-safe in an int64 on every engine). Near-identical token multisets
    land within small Hamming distance, which band blocking exploits.

    Arrow kernel with a per-batch vocabulary cache: token hashes are
    md5-derived, and Zipf means the cache hits almost always, so the
    per-token cost is one dict lookup plus a 60-lane numpy bit-count —
    map-only, zero shuffle. The DuckDB oracle reproduces the value
    bit-for-bit from the same md5 construction (ties: 2·Σbit ≥ n ⇒ 1)."""
    import hashlib
    import re
    from typing import Iterator

    import numpy as np
    import pandas as pd

    ws = re.compile(r"\s+")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, np.ndarray] = {}

        def tok_bits(tok: str) -> np.ndarray:
            got = cache.get(tok)
            if got is None:
                h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
                got = cache[tok] = np.array(
                    [(h >> j) & 1 for j in range(60)], dtype=np.int64
                )
            return got

        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks = ws.split(text.strip().lower()) if text and text.strip() else []
                if not toks:
                    out.append(0)
                    continue
                votes = np.zeros(60, dtype=np.int64)
                for t in toks:
                    votes += tok_bits(t)
                bits = (2 * votes >= len(toks)).astype(np.uint64)
                out.append(int((bits << np.arange(60, dtype=np.uint64)).sum()))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return df.select(id_col, text_col).mapInPandas(kernel, f"{id_col} long, simhash long")


def simhash_near_dup_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    hamming_max: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Exact Hamming-≤k near-dup pairs via pigeonhole band blocking (the
    Manku/Google web-dedup design): split the 60-bit SimHash into
    ``n_bands`` bands; two hashes within Hamming ``hamming_max`` ≤
    ``n_bands``−1 differ in at most n_bands−1 bands, so at least one band
    matches EXACTLY — candidates are an equi-join on (band_idx,
    band_value), never an all-pairs scan. A codegen'd ``bit_count(xor)``
    verify keeps only true pairs, so the output is exact (the pigeonhole
    guarantee makes blocking complete, not approximate).

    Shuffle budget: Σ bucket² over band-value buckets — at corpus scale a
    df-cut on pathological band values (boilerplate-heavy shards) is the
    knob, same as the winnowing path. Requires ``hamming_max < n_bands``.
    """
    if hamming_max >= n_bands:
        raise ValueError("pigeonhole completeness needs hamming_max < n_bands")
    width = 60 // n_bands
    sh = simhash60(docs, id_col=id_col, text_col=text_col)
    bands = sh.select(
        F.col(id_col),
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width)
                    % F.lit(2**width)
                    for i in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_value"),
    )
    a = bands.select(
        "band_idx", "band_value",
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"),
    )
    b = bands.select(
        "band_idx", "band_value",
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"),
    )
    return (
        a.join(b, ["band_idx", "band_value"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_max)
        .distinct()
    )


def prefix_filter_jaccard_pairs(
    items: DataFrame,
    *,
    id_col: str = "doc_id",
    item_col: str = "shingle",
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT set-Jaccard ≥ ``threshold`` pairs via prefix filtering
    (AllPairs/PPJoin, Bayardo et al. WWW'07) — the deterministic
    complement to MinHash LSH: no bands, no probability of a missed
    pair, the same equi-join shuffle shape. Input is a distinct
    ``(id, item)`` set table (``shingle_table`` or token sets).

    The filter: order every doc's set by ascending global document
    frequency (rarest first, item as tie-break); for Jaccard ≥ θ the
    required overlap ``⌈θ/(1+θ)·(|A|+|B|)⌉ ≥ 1`` forces A and B to share
    an item among each one's first ``|S| − ⌈θ·|S|⌉ + 1`` items — so
    candidates are an equi-join on PREFIX items only. Rare-first
    ordering makes prefixes low-df, which is what keeps
    Σ df(prefix-item)² small; the verify is the exact map-side
    ``array_intersect`` of the two full sets.

    Returns ``(doc_a, doc_b, jaccard)`` with round-6 scores. Engine-
    deterministic end to end (frequency order + item tie-break), so the
    full output value-hash-oracles."""
    toks = items.select(
        F.col(id_col), F.col(item_col).alias("tok")
    )
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("__df"))
    ranked = (
        toks.join(dfreq, "tok")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__df", "tok"))),
                lambda s: s.tok,
            ).alias("__set")
        )
        .withColumn("__sz", F.size("__set"))
        # prefix length: |S| - ceil(θ|S|) + 1, with ceil in CONSERVATIVE
        # fixed point — raw float ceil(θ·|S|) lands one too high whenever
        # the double product creeps past the exact integer (0.55·20 =
        # 11.000000000000002 → ceil 12), shortening the prefix and
        # breaking the zero-miss guarantee. flooring θ to 6dp before the
        # exact integer ceil can only LENGTHEN the prefix (extra
        # candidates, killed by the exact verify) — completeness holds.
        # __sz casts to long BEFORE the multiply: t_lo·|S| is int32*int32
        # otherwise, and a doc with >~2^31/t_lo items wraps (non-ANSI) or
        # raises ARITHMETIC_OVERFLOW (Spark 4 ANSI default).
        .withColumn(
            "__plen",
            F.col("__sz")
            - F.floor(
                (F.lit(_t_lo(threshold)) * F.col("__sz").cast("long") + 999_999)
                / 1_000_000
            ).cast("int")
            + 1,
        )
    )
    # feeds the prefix explode AND both set lookups
    ranked = tracked_cache(ranked, "dedup.prefix_filter.ranked")
    # candidate generation joins BARE ids + sizes — the full set arrays
    # never ride the exploded prefix shuffle
    pref = ranked.select(
        F.col(id_col),
        "__sz",
        F.explode(F.slice("__set", 1, F.col("__plen"))).alias("tok"),
    )
    a = pref.select(F.col(id_col).alias("doc_a"), F.col("__sz").alias("__za"), "tok")
    b = pref.select(F.col(id_col).alias("doc_b"), F.col("__sz").alias("__zb"), "tok")
    cand = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        # size filter: |A| ≥ θ|B| is necessary for J ≥ θ (cheap pre-cut);
        # integer compare against the FLOORED fixed-point θ — the raw
        # float product drops the boundary-legal pair (|A|=11, |B|=20 at
        # θ=0.55: 11 >= 11.000000000000002 is false)
        .filter(
            (F.col("__za").cast("long") * 1_000_000
             >= F.lit(_t_lo(threshold)) * F.col("__zb").cast("long"))
            & (F.col("__zb").cast("long") * 1_000_000
               >= F.lit(_t_lo(threshold)) * F.col("__za").cast("long"))
        )
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sets_a = ranked.select(
        F.col(id_col).alias("doc_a"), F.col("__set").alias("__sa"),
        F.col("__sz").alias("__za"),
    )
    sets_b = ranked.select(
        F.col(id_col).alias("doc_b"), F.col("__set").alias("__sb"),
        F.col("__sz").alias("__zb"),
    )
    n_common = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    return (
        cand.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .withColumn(
            "jaccard",
            F.round(n_common / (F.col("__za") + F.col("__zb") - n_common), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    items: DataFrame,
    *,
    id_col: str = "doc_id",
    item_col: str = "shingle",
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT *directional* containment pairs: every ``(doc_a, doc_b)`` with
    ``|A ∩ B| / |A| ≥ threshold`` (doc_a's shingle set mostly inside
    doc_b's) — the asymmetric near-dup test Jaccard misses: a paragraph
    quoted inside a much larger page scores near-zero Jaccard but
    containment ≈ 1. The subset-document signal a training-data curation
    pass removes before token counting inflates the small copy's weight.

    Prefix filter, one-sided (the AllPairs bound specialized to
    containment): order A's items rare-first by global document frequency
    (item tie-break). If C(a,b) ≥ θ then A shares ≥ ⌈θ|A|⌉ items with B,
    so at least one of A's first ``|A| − ⌈θ|A|⌉ + 1`` items is in B —
    candidates are an equi-join of a's PREFIX items against the FULL
    postings table (bare ids ride the shuffle; sets attach after the
    pair dedup). Zero misses by the pigeonhole above; the verify is the
    exact map-side ``array_intersect``. Join volume is
    Σ_{t ∈ prefixes} df(t) — rare-first prefixes keep df low; the
    ``|B| ≥ θ|A|`` size pre-cut drops tiny-into-huge false candidates
    before the set arrays attach.

    Returns ``(doc_a, doc_b, containment)``, round-6, a ≠ b, both
    directions independently (mutual containment ⇒ two rows). Engine-
    deterministic end to end — the DuckDB oracle computes ALL-PAIRS
    ground truth, so a green row proves completeness."""
    toks = items.select(F.col(id_col), F.col(item_col).alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("__df"))
    ranked = (
        toks.join(dfreq, "tok")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__df", "tok"))),
                lambda s: s.tok,
            ).alias("__set")
        )
        .withColumn("__sz", F.size("__set"))
        # one-sided prefix: |A| - ceil(θ|A|) + 1 items suffice (pigeonhole);
        # conservative fixed-point ceil — see prefix_filter_jaccard_pairs
        # for the float-boundary miss this prevents (and for why __sz
        # casts to long before the int32-literal multiply)
        .withColumn(
            "__plen",
            F.col("__sz")
            - F.floor(
                (F.lit(_t_lo(threshold)) * F.col("__sz").cast("long") + 999_999)
                / 1_000_000
            ).cast("int")
            + 1,
        )
    )
    # feeds the prefix explode, full postings, both set lookups
    ranked = tracked_cache(ranked, "dedup.containment.ranked")
    pref_a = ranked.select(
        F.col(id_col).alias("doc_a"),
        F.col("__sz").alias("__za"),
        F.explode(F.slice("__set", 1, F.col("__plen"))).alias("tok"),
    )
    posts_b = ranked.select(
        F.col(id_col).alias("doc_b"),
        F.col("__sz").alias("__zb"),
        F.explode("__set").alias("tok"),
    )
    cand = (
        pref_a.join(posts_b, "tok")
        .filter(F.col("doc_a") != F.col("doc_b"))
        # |A∩B| ≥ θ|A| and |A∩B| ≤ |B|  ⇒  |B| ≥ θ|A| (necessary, cheap);
        # integer compare against floored fixed-point θ — boundary-exact
        .filter(
            F.col("__zb").cast("long") * 1_000_000
            >= F.lit(_t_lo(threshold)) * F.col("__za").cast("long")
        )
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sets_a = ranked.select(
        F.col(id_col).alias("doc_a"), F.col("__set").alias("__sa"), F.col("__sz").alias("__za")
    )
    sets_b = ranked.select(F.col(id_col).alias("doc_b"), F.col("__set").alias("__sb"))
    n_common = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    return (
        cand.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .withColumn("containment", F.round(n_common / F.col("__za"), 6))
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )
