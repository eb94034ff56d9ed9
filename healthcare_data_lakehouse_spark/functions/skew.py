"""Skew-mitigation join utilities.

Skewed join keys are the classic 100 TB failure mode: one hot key pins one
reducer while the fleet idles. Two remedies ship here:

* **AQE skew-join splitting** — on by default in this engine's sessions
  (``spark.sql.adaptive.skewJoin.enabled``); handles skew transparently for
  sort-merge joins. Prefer it.
* **Explicit salting** (this module) — for the cases AQE can't see
  (broadcast-ineligible small side joined on a hot key, or deterministic
  plans wanted): the fact side gets a uniform random-ish salt derived from
  a unique column (deterministic, not ``rand()``, so retries/oracles
  reproduce); the dimension side is replicated ``n_salts`` times; the join
  key becomes (key, salt), spreading each hot key over ``n_salts``
  reducers. Results are identical to the unsalted join — only the shuffle
  layout changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_salt",
    "replicate_for_salt",
    "salted_join",
    "salted_self_pair_join",
    "plain_self_pair_join",
    "block_population_stats",
    "auto_self_pair_join",
    "co_occurrence_pairs",
]


def co_occurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    out_a: str = "u",
    out_b: str = "v",
) -> DataFrame:
    """Distinct unordered item pairs co-occurring under a group key, via
    ONE group fold + bounded in-group pair explode (r14, guide §2.4).

    Exactly the rows of ``df.a JOIN df.b ON group AND a.item < b.item``
    + distinct, but the self-join twin pays a second exchange of the
    whole table plus the join build and materializes sum(d^2) rows
    before the distinct; here the postings fold once per group
    (map-side partial collect_set also absorbs duplicate rows) and the
    pair explode is bounded by the group population. Use when per-group
    populations are bounded (TPC-H orders: <= 7 lineitems); for
    unbounded or hot groups keep a join so AQE can split skew
    (:func:`auto_self_pair_join`)."""
    grouped = df.groupBy(group_col).agg(
        F.collect_set(item_col).alias("xs")
    )
    # filter form, not sort+slice: slice copies a sub-array per element
    # (measured allocation-heavy on the dfcap rewrite); the filter scan
    # is the same O(d^2) comparisons without the copies, and b > a
    # orders the pair without sorting the postings
    pairs = grouped.select(
        F.expr(
            "explode(flatten(transform(xs, x -> "
            "transform(filter(xs, y -> y > x), "
            "y -> struct(x AS a, y AS b)))))"
        ).alias("pr")
    )
    return pairs.select(
        F.col("pr.a").alias(out_a), F.col("pr.b").alias(out_b)
    ).distinct()


def with_salt(df: DataFrame, unique_col: str, n_salts: int) -> DataFrame:
    """Deterministic salt in [0, n_salts): a stable hash of a unique
    column, NOT rand() — reruns and oracle comparisons reproduce."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts))
    )


def replicate_for_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Explode the (small) side across every salt value."""
    return df.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_unique_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``on`` with an ``n_salts``-way salted
    key, defeating hot-key reducer skew. Semantically identical to
    ``fact.join(dim, on, how)`` for 1:1/N:1 dimension joins."""
    f = with_salt(fact, fact_unique_col, n_salts)
    d = replicate_for_salt(dim, n_salts)
    return f.join(d, [on, "_salt"], how).drop("_salt")


def salted_self_pair_join(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Self-join candidate generation with hot-key salting.

    Produces exactly the pairs of ``df.alias('a').join(df.alias('b'),
    keys).filter(a.id < b.id)`` — every unordered pair sharing the key
    appears once — but spreads each hot key's probe side over ``n_salts``
    reducers: side A gets a deterministic salt from its unique ``id_col``,
    side B is replicated across all salts, and the join key becomes
    (keys..., _salt). Pair (x, y) surfaces once, at x's salt (the reverse
    orientation lands at y's salt and is dropped by the ``<`` filter).

    The quadratic candidate volume of a hot key is inherent to blocked
    candidate generation; what salting fixes is its PLACEMENT — |hot|/n x
    |hot| work per reducer instead of |hot|^2 on one. Output columns:
    every non-key column of ``df`` suffixed ``_a`` / ``_b`` plus the keys.
    """
    payload = [c for c in df.columns if c not in keys]
    a = with_salt(df, id_col, n_salts).select(
        *keys, "_salt", *[F.col(c).alias(f"{c}_a") for c in payload]
    )
    b = replicate_for_salt(df, n_salts).select(
        *keys, "_salt", *[F.col(c).alias(f"{c}_b") for c in payload]
    )
    return (
        a.join(b, [*keys, "_salt"])
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        .drop("_salt")
    )


def plain_self_pair_join(
    df: DataFrame, keys: list[str], id_col: str
) -> DataFrame:
    """Unsalted twin of :func:`salted_self_pair_join` with IDENTICAL
    output columns (non-key columns suffixed ``_a``/``_b`` plus the
    keys), so a planner can swap the two without touching downstream
    expressions."""
    payload = [c for c in df.columns if c not in keys]
    a = df.select(*keys, *[F.col(c).alias(f"{c}_a") for c in payload])
    b = df.select(*keys, *[F.col(c).alias(f"{c}_b") for c in payload])
    return a.join(b, list(keys)).filter(
        F.col(f"{id_col}_a") < F.col(f"{id_col}_b")
    )


def block_population_stats(df: DataFrame, keys: list[str]) -> tuple:
    """(max, mean, n_blocks) of the per-key block populations — one
    scalar aggregate over the blocking table (the same statistic
    ``dedup_simhash_block_population`` reports as a query). Cost: one
    groupBy-count over the key table, negligible next to the candidate
    join it gates."""
    row = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.max("c").alias("mx"),
            F.avg("c").alias("mn"),
            F.count(F.lit(1)).alias("n_blocks"),
        )
        .first()
    )
    return row.mx, row.mn, row.n_blocks


def auto_self_pair_join(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    n_salts: int = 8,
    skew_bound: float = 6.0,
) -> tuple[DataFrame, dict]:
    """Skew-aware planner for blocked self-pair candidate generation
    (VERDICT r11 ask #5): measure the block-population skew (max/mean
    count per key) and pick :func:`salted_self_pair_join` when it
    exceeds ``skew_bound``, else :func:`plain_self_pair_join`.

    The default bound 6.0 is the regression ceiling
    ``tests/test_llm_dedup_scale.py`` pins for the SimHash block index
    (measured max ~3x mean at sf0.1); beyond it a single reducer owns a
    quadratic hot block and salting's |hot|/n_salts placement wins.
    Both paths emit identical rows and columns — only the shuffle
    layout differs — so the decision is a pure physical-plan choice,
    and callers can surface it (ratio + chosen path) for oracle
    checking. The one driver-side action is the scalar stats aggregate
    (3 numbers), the same threshold-gating pattern as the dedup
    union-find."""
    mx, mn, n_blocks = block_population_stats(df, keys)
    ratio = float(mx) / float(mn) if mn else 0.0
    decision = {
        "max_pop": mx,
        "mean_pop": mn,
        "n_blocks": n_blocks,
        "ratio": ratio,
        "chosen": "salted" if ratio > skew_bound else "unsalted",
        "skew_bound": skew_bound,
    }
    if ratio > skew_bound:
        pairs = salted_self_pair_join(df, keys, id_col, n_salts)
    else:
        pairs = plain_self_pair_join(df, keys, id_col)
    return pairs, decision
