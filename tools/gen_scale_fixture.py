"""Scale-fixture generator for the sf1.0 spot-bench (VERDICT r10 ask #1).

The driver ships read-only fixtures at sf <= 0.1 (`TESTDATA.md`); measuring
the scale exponent needs one decade more data. This generator reproduces the
driver tables' schemas and distributions — verified against the shipped
parquet at all three SFs (row-count ratios, value domains, the documents
near-dup planting recipe, the unit-norm weakly-clustered embeddings,
microsecond timestamps per the shipped footers) — at an arbitrary SF into a
SCRATCH directory (never `/root/testdata`, which is read-only).

Distribution recipes mirrored from the shipped data:
  - rows: customer 150k/sf-unit, supplier 10k, part 200k, orders 1.5M,
    lineitem 6M, events 1M; documents max(500, 50k*sf),
    embeddings max(500, 20k*sf); events draw from 15k*sf distinct users.
  - lineitem: qty ~ U{1..50}, extendedprice = qty * U(900, 2100),
    discount ~ U{0.00..0.10}, tax ~ U{0.00..0.08}, shipdate =
    orderdate + U{1..95} days, orderkeys uniform (Poisson-ish ~4
    lines/order, linenumber cycles 1..7).
  - part: 8x8 "adj noun" names, Brand#0..24, 6 types,
    retailprice = 900 + (key % 1000) * 0.1.
  - events: ts ~ U(Jan 2024, 30 days) at microsecond precision, value ~
    Exp(mean 50), props = {"k": U{0..99}}. All timestamps are
    timestamp[us], matching the shipped parquet footers.
  - documents: 10..100 words from the 30-word vocab; lang en 40% /
    {zh,es,fr,de} 15% each; source = src{i%20}; ~5% planted dups copying a
    random earlier base doc, of which ~3% byte-exact and the rest with the
    ' dup' marker appended (matches 250 marked + 8 exact at sf0.1).
  - embeddings: x = normalize(N(0, 1/64 I) + mu_label), ||mu_label|| = 0.07
    (observed per-label centroid norm ~0.07, intra std ~1/8, norms 1.0).

Vocabulary modes (VERDICT r11 ask #4). The shipped fixture's 30-word
closed vocabulary saturates the 3-shingle space as the corpus grows
(PERF_r11.md: avg shingle df 10.1 -> 99.5 at 10x), driving ARTIFICIAL
quadratic candidate growth in shingle-keyed dedup — a generator artifact,
not an operator property. Two open modes replace it for scale work; both
only change the word source, keeping doc lengths, languages, sources, and
the planted-dup recipe identical (the default stays "closed" —
`tests/test_scale_fixture.py` pins closed-mode fidelity against the
shipped parquet):

* ``vocab="open"`` — Zipf-Mandelbrot ranks, P(k) ~ 1/(k+2.7)^1.07 over a
  2M-type lexicon ("w{rank}"): the standard empirical fit for natural
  text (top type ~3% of tokens, like "the"; realized type count grows
  Heaps-like). This is the real-corpus regime the shingle-family ratios
  are graded on.
* ``vocab="stress"`` — pure Zipf(a=1.5) over an unbounded lexicon: the
  head word carries ~38% of tokens, so a single stop-shingle ("w1 w1
  w1") lands in ~90% of documents. Deliberately adversarial: it models
  boilerplate/stop-shingle document frequency pushed to the limit, the
  regime that blows up RAW shingle self-joins (measured 332 s /
  ratio 123x on dedup_ngram_jaccard_pairs, r12) and that the df-capped
  candidate generation (functions/dedup.py max_df) exists for.

Usage: python tools/gen_scale_fixture.py SF OUTDIR [SEED]
       [closed|open|stress]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ORDERSTATUS = ["O", "P", "F"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]

DAY_US = 86_400_000_000


def _write(out: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, out / f"{name}.parquet")
    print(f"  {name}: {table.num_rows} rows")


def generate(
    sf: float, outdir: str, seed: int = 42, vocab: str = "closed"
) -> None:
    if vocab not in ("closed", "open", "stress"):
        raise ValueError(
            f"vocab must be 'closed', 'open' or 'stress', got {vocab!r}"
        )
    rng = np.random.default_rng(seed)
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS),
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(
            np.round(rng.uniform(-999.99, 9999.99, n_cust), 2)),
        "c_mktsegment": pa.array(
            np.array(MKTSEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(
            np.round(rng.uniform(-999.99, 9999.99, n_supp), 2)),
    }))
    pk = np.arange(n_part)
    name_idx = rng.integers(0, 64, n_part)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": pa.array(
            [f"{ADJ[i // 8]} {NOUN[i % 8]}" for i in name_idx]),
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(900.0 + (pk % 1000) * 0.1, 2)),
    }))

    # orders: dates uniform over 1995-01-01 .. 2001-08-01 (day-aligned us)
    d0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    d1 = np.datetime64("2001-08-01").astype("datetime64[us]").astype(np.int64)
    odate_us = d0 + rng.integers(0, (d1 - d0) // DAY_US + 1, n_ord) * DAY_US
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(ORDERSTATUS)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000.0, 500_000.0, n_ord), 2)),
        "o_orderdate": pa.array(odate_us, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: uniform orderkeys sorted so linenumber can cycle per order
    lok = np.sort(rng.integers(0, n_ord, n_li))
    # occurrence index within each run of equal orderkeys, cycled 1..7
    starts = np.flatnonzero(np.r_[True, lok[1:] != lok[:-1]])
    occ = np.arange(n_li) - np.repeat(starts, np.diff(np.r_[starts, n_li]))
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    ship_us = (
        odate_us[lok] + rng.integers(1, 96, n_li) * DAY_US
    )
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array((occ % 7 + 1).astype(np.int32)),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(
            np.round(qty * rng.uniform(900.0, 2100.0, n_li), 2)),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, n_li) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2)),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(ship_us, pa.timestamp("us")),
    }))

    # events: microsecond timestamps, matching the shipped footers
    t0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    span_us = 30 * 86_400 * 1_000_000
    _write(out, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(
            t0 + rng.integers(0, span_us, n_ev), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.exponential(50.0, n_ev), 2)),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))

    # documents: base word salads + ~5% planted dups (3% of those exact,
    # the rest with the ' dup' marker appended), scattered doc ids.
    lens = rng.integers(10, 101, n_doc)
    texts: list[str] = []
    if vocab == "closed":
        words = np.array(DOC_VOCAB)
        for ln in lens:
            texts.append(" ".join(words[rng.integers(0, len(words), ln)]))
    else:
        # Open lexicons, ASCII by construction ("w" + digits) so the
        # phash oracle's char-as-byte invariant holds.
        n_tok = int(lens.sum())
        if vocab == "open":
            # Zipf-Mandelbrot via inverse-CDF over 2M ranked types:
            # P(k) ~ 1/(k+q)^s with s=1.07, q=2.7 (the classic natural-
            # text fit) — top type ~3% of tokens, Heaps-like type growth.
            V, s, q = 2_000_000, 1.07, 2.7
            w = 1.0 / np.power(np.arange(1, V + 1) + q, s)
            cdf = np.cumsum(w)
            cdf /= cdf[-1]
            all_words = np.searchsorted(cdf, rng.random(n_tok)) + 1
        else:  # stress
            # unbounded Zipf(1.5): head word ~38% of tokens — the
            # stop-shingle adversary (see module docstring)
            all_words = rng.zipf(1.5, n_tok)
        pos = 0
        for ln in lens:
            texts.append(
                " ".join(f"w{r}" for r in all_words[pos:pos + ln])
            )
            pos += ln
    n_dup = int(round(n_doc * 0.05))
    dup_ids = rng.choice(np.arange(1, n_doc), size=n_dup, replace=False)
    for i in dup_ids:
        src = int(rng.integers(0, i))
        texts[i] = (
            texts[src] if rng.random() < 0.03 else texts[src] + " dup"
        )
    langs = np.array(LANGS)[
        rng.choice(5, size=n_doc, p=LANG_P)
    ]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{i % 20}" for i in range(n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-norm, 10 weak Gaussian clusters (centroid norm 0.07)
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    mus = rng.normal(0, 1, (10, 64))
    mus = 0.07 * mus / np.linalg.norm(mus, axis=1, keepdims=True)
    vecs = rng.normal(0, 1.0 / 8.0, (n_emb, 64)) + mus[labels]
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        np.float32
    )
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    vocab_mode = sys.argv[4] if len(sys.argv) > 4 else "closed"
    print(f"generating sf={sf} -> {outdir} (seed {seed}, vocab {vocab_mode})")
    generate(sf, outdir, seed, vocab_mode)
