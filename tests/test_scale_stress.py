"""Scale-stress of the dedup/curation path above the hot-bucket cap.

VERDICT r5 asked for the cap's first empirical test at realistic
volume: a generated corpus ~10x the sf0.1 documents table (500 rows),
skewed the way real boilerplate corpora are — one mega-bucket far over
LSH_MAX_BUCKET plus a Zipfian long tail — run through the LSH pair
generation and the full curation pipeline, asserting the pair count
stays near the O(n * cap) budget instead of the O(n^2) blowup, and
that the pipeline completes without any driver-side materialization
(curate_documents collects nothing; every stage is a DataFrame
transform).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dex_data_ingestor_spark.operators import neardup as ND
from dex_data_ingestor_spark.operators.corpus import curate_documents

N_HOT = 2000          # identical-band mega-bucket, ~8x LSH_MAX_BUCKET
N_TAIL = 4000         # Zipfian unique docs
CAP = ND.LSH_MAX_BUCKET


def _zipf_doc(rng: random.Random, vocab: int = 2000, words: int = 40) -> str:
    """Zipf-ish token stream: token ranks drawn with p(r) ~ 1/r via
    inverse-CDF on a truncated harmonic series."""
    out = []
    for _ in range(words):
        u = rng.random()
        # inverse of the (approximate) harmonic CDF: rank ~ vocab**u
        rank = max(1, int(vocab ** u))
        out.append(f"tok{rank}")
    return " ".join(out)


@pytest.fixture(scope="module")
def skewed_corpus(spark):
    rng = random.Random(20260813)
    boiler = " ".join(f"boilerplate{i}" for i in range(60))
    rows = [(i, boiler, "en") for i in range(N_HOT)]
    rows += [
        (N_HOT + i, _zipf_doc(rng), "en") for i in range(N_TAIL)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).repartition(8)


@pytest.mark.slow
def test_hot_bucket_pairs_bounded_at_scale(spark, skewed_corpus):
    """2000 identical docs put 2000 members in each band bucket; the
    tiling must emit near O(n*cap) pairs, not n^2/2 per band."""
    wide = ND.minhash_signatures_wide(skewed_corpus, "doc_id", "text")
    buckets = ND.lsh_band_buckets_wide(wide, "doc_id")
    pairs = ND.lsh_candidate_pairs(buckets, "doc_id")
    hot_pairs = pairs.filter(
        (F.col("a_id") < N_HOT) & (F.col("b_id") < N_HOT)
    ).count()
    uncapped_estimate = N_HOT * (N_HOT - 1) // 2  # per band, 2 bands dedup
    # per grouping ~ n*cap/2 pairs; two groupings before dedup -> the
    # union stays under n*cap, far under the uncapped all-pairs count
    assert hot_pairs <= N_HOT * CAP, (hot_pairs, N_HOT * CAP)
    assert hot_pairs < uncapped_estimate / 3, (hot_pairs, uncapped_estimate)
    # connectivity at scale: every hot doc appears in some pair
    members = pairs.filter(F.col("a_id") < N_HOT).select(
        F.explode(F.array("a_id", "b_id")).alias("id")
    ).filter(F.col("id") < N_HOT).distinct().count()
    assert members == N_HOT


@pytest.mark.slow
def test_curation_pipeline_end_to_end_at_scale(spark, skewed_corpus):
    """Full curate_documents over the skewed 6000-doc corpus: the
    mega-cluster collapses to its min-id survivor via the exact-dedup
    stage + capped LSH losers, the Zipfian tail mostly survives, and
    nothing in the plan materializes on the driver."""
    curated = curate_documents(
        skewed_corpus, min_words=5, near_dup=True
    )
    ids = [r.doc_id for r in curated.select("doc_id").collect()]
    # exactly one boilerplate survivor, and it is the min id
    hot_survivors = [i for i in ids if i < N_HOT]
    assert hot_survivors == [0]
    # the unique tail is not collateral damage (identical short docs
    # in the tail may legitimately dedup; the bulk must survive)
    assert len(ids) > N_TAIL * 0.5
    # survivor rule is deterministic: re-running yields the same set
    again = [
        r.doc_id
        for r in curate_documents(
            skewed_corpus, min_words=5, near_dup=True
        ).select("doc_id").collect()
    ]
    assert sorted(ids) == sorted(again)


@pytest.mark.slow
def test_span_dedup_boilerplate_corpus_at_scale(spark):
    """VERDICT r6 #5: the span family above toy size. A 3000-doc
    corpus where HALF the docs embed the same 400-char license header
    runs through strip_repeated_substrings end-to-end; asserts

    - the shuffled explode stays inside the hash/winnow budget
      (winnow=10 emits < 0.5x — expected ~0.18x — of the one-row-per-
      character exact explode, 8-byte keys either way), recording the
      amplification factor for the round notes;
    - exactly one header survives corpus-wide (the min-(id,pos)
      occurrence); every other copy's doc loses ~the header length;
    - output is byte-deterministic across re-runs.
    """
    import random
    import string

    from dex_data_ingestor_spark.operators.corpus import (
        _window_keys,
        strip_repeated_substrings,
    )

    rng = random.Random(20260814)
    header = "".join(
        rng.choice(string.ascii_letters + string.digits + " ")
        for _ in range(400)
    )
    n_docs, n_boiler = 3000, 1500

    def body(seed, n=300):
        r = random.Random(seed)
        return "".join(
            r.choice(string.ascii_letters + string.digits + " ")
            for _ in range(n)
        )

    rows = [
        (i, (header + body(i)) if i < n_boiler else body(i, 700))
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    LN, W = 20, 10
    base = df.select(
        "doc_id", F.col("text").alias("__t"), F.length("text").alias("__n")
    ).filter(F.length("__t") >= LN)
    n_exact = _window_keys(base, "doc_id", LN, True, 1).count()
    n_winn = _window_keys(base, "doc_id", LN, True, W).count()
    amplification = n_exact / n_winn
    # expected ~(W+1)/2 = 5.5x fewer shuffled rows; assert > 2x with
    # plenty of slack for structured (non-uniform-hash) text
    assert n_winn < 0.5 * n_exact, (n_winn, n_exact)
    print(f"winnow explode reduction: {amplification:.1f}x "
          f"({n_exact} -> {n_winn} rows)")

    out = {r.doc_id: r.text for r in strip_repeated_substrings(
        df, min_len=LN, winnow=W).collect()}
    # doc 0 keeps the header; every other boilerplate doc loses it to
    # within the winnow boundary tolerance
    assert out[0].startswith(header)
    for d in (1, 2, n_boiler - 1):
        assert len(out[d]) <= 300 + 2 * (W - 1)
        assert header not in out[d]
    # non-boilerplate docs pass through byte-identical
    for d in (n_boiler, n_docs - 1):
        assert out[d] == rows[d][1]

    again = {r.doc_id: r.text for r in strip_repeated_substrings(
        df, min_len=LN, winnow=W).collect()}
    assert out == again


@pytest.mark.slow
def test_bloom_prefilter_selectivity_at_scale(spark):
    """Bloom prune on a contamination-shaped workload at stress size:
    8,000 train docs vs 200 eval docs with a planted 1% overlap. The
    recorded numbers are the scale contract: the prefilter passes
    every true-overlap gram (superset), keeps under ~2x the true
    match count (FP-bounded at ~12 bits/key), and therefore cuts the
    rows entering the train-side distinct exchange by >10x."""
    import random
    import string

    def doc(seed, n_words=60):
        rng = random.Random(90_000 + seed)
        return " ".join(
            "".join(rng.choice(string.ascii_lowercase) for _ in range(6))
            for _ in range(n_words)
        )

    eval_rows = [(100_000 + i, doc(100_000 + i)) for i in range(200)]
    train_rows = [(i, doc(i)) for i in range(8_000)]
    # plant overlap: 1% of train docs embed an eval doc's phrase
    for i in range(0, 8_000, 100):
        planted = eval_rows[(i // 100) % 200][1].split()[:12]
        train_rows[i] = (i, " ".join(planted) + " " + train_rows[i][1])

    from dex_data_ingestor_spark.operators.bloom import (
        bloom_bitmap,
        bloom_prefilter,
    )
    from dex_data_ingestor_spark.operators.neardup import _grams_from_words

    def grams(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return df.select(
            F.explode(
                _grams_from_words(F.split(F.col("text"), r"\s+"), 3)
            ).alias("gram")
        )

    ev = grams(eval_rows).distinct()
    tr = grams(train_rows)
    bm = bloom_bitmap(ev, "gram")

    n_train = tr.count()
    n_true = tr.join(ev, "gram", "left_semi").count()
    n_kept = bloom_prefilter(tr, bm, "gram").count()

    assert n_true > 0
    assert n_kept >= n_true                      # superset, always
    assert n_kept <= max(2 * n_true, n_true + n_train // 50)  # FP-bounded
    assert n_train / n_kept > 10                 # the shuffle-rows saving


# =========================================================================
# Market-metrics family under hot-key skew (VERDICT r8 #6: stress the
# heavy families the way the LSH family was stressed)
# =========================================================================

N_TICKS = 60_000          # ~60x the sf0.001 events fixture
HOT_SHARE = 0.9           # one instrument carries 90% of the tape


@pytest.fixture(scope="module")
def skewed_tape(spark, tmp_path_factory):
    """A trade tape the way real tapes skew: one hot instrument with
    90% of ticks (every exchange sees this on the index symbol), a
    Zipfian tail over 200 others, tick values spanning the magnitudes
    that stress the exact-arithmetic seams (micro-prices ~1e-3 and
    ~1.5e8 notionals whose v_units*dur_us terms push the TWAP
    numerator far past 2^53)."""
    import datetime

    rng = random.Random(20260815)
    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(N_TICKS):
        if rng.random() < HOT_SHARE:
            etype, user = "hot_sym", 1
        else:
            r = max(1, int(200 ** rng.random()))
            etype, user = f"sym{r}", r
        # mixed magnitudes, always > 0 (q_twap's documented precondition)
        mag = rng.choice((1e-3, 1.0, 97.5, 1.5e8))
        value = mag * (1.0 + rng.random())
        ts = base + datetime.timedelta(
            seconds=rng.uniform(0, 72 * 3600)
        )
        rows.append((i, ts, user, etype, value, None))
    path = tmp_path_factory.mktemp("tape")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).repartition(8).write.parquet(str(path / "events.parquet"))
    return str(path)


@pytest.mark.slow
def test_market_metrics_hot_key_parity_at_scale(spark, skewed_tape):
    """The exact-integer market metrics must hold BITWISE oracle
    parity on a 60k-tick hot-key tape — the regime where a partial
    aggregation bug, a non-associative accumulation, or an okey
    packing overflow would first show (the shipped fixtures are
    uniform and 60x smaller)."""
    import duckdb

    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skewed_tape}/events.parquet/*.parquet')"
    )
    for name in ("q_twap", "q_ohlc_bars", "q_realized_var", "q_drawdown"):
        df = QUERIES[name](spark, skewed_tape)
        problems = compare(df, con, ORACLE_SQL[name])
        assert not problems, (name, problems)
    con.close()


@pytest.mark.slow
def test_market_metrics_plans_hold_under_skew(spark, skewed_tape):
    """The one-exchange-per-family plan claims must survive the hot
    key: skew changes task runtimes, never the plan shape — a second
    exchange appearing here would mean the window and the aggregate
    stopped sharing their partitioning."""
    import re

    from dex_data_ingestor_spark.plans.testbed import QUERIES

    for name in ("q_twap", "q_realized_var"):
        df = QUERIES[name](spark, skewed_tape)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        n_ex = len(re.findall(r"\bExchange hashpartitioning", plan))
        assert n_ex == 1, (name, n_ex, plan)
    # OHLC: one partial-aggregated exchange on the group key
    df = QUERIES["q_ohlc_bars"](spark, skewed_tape)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1, plan
    assert "partial_" in plan.lower() or "HashAggregate" in plan, plan


# =========================================================================
# LM quality-scorer family under hot-vocabulary skew
# =========================================================================


@pytest.mark.slow
def test_lm_scorers_hot_vocab_parity_at_scale(spark, tmp_path):
    """q_unigram_logloss / q_bigram_logloss on a 6000-doc corpus (12x
    the fixture) with a pathological vocabulary: one boilerplate token
    in EVERY document (a single hashed feature holding ~15% of all
    mass) plus a Zipfian tail wide enough to exercise bucket
    collisions. Pins (a) bitwise oracle parity in the collision+skew
    regime and (b) the bounded-model-state claim: the hashed LM table
    can never exceed 65536 rows however the corpus skews — THE
    property that makes the model broadcastable at 100 TB."""
    import duckdb

    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    rng = random.Random(20260816)
    rows = []
    for i in range(6000):
        toks = ["everydocboiler"] * 6 + [
            f"tok{max(1, int(5000 ** rng.random()))}" for _ in range(34)
        ]
        rng.shuffle(toks)
        text = " ".join(toks)
        rows.append((i, text, "en", "web", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).repartition(8).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    for name in ("q_unigram_logloss", "q_bigram_logloss"):
        df = QUERIES[name](spark, str(tmp_path))
        problems = compare(df, con, ORACLE_SQL[name])
        assert not problems, (name, problems)
    # bounded model state, independent of corpus size or skew
    n_feat = con.sql(
        "SELECT COUNT(DISTINCT f) FROM (SELECT "
        "('0x' || substr(md5(w), 1, 8))::BIGINT % 65536 AS f "
        "FROM (SELECT unnest(string_split_regex(trim(text), "
        "'[ \\t\\n\\f\\r]+')) AS w FROM documents))"
    ).fetchone()[0]
    con.close()
    assert n_feat <= 65536


# =========================================================================
# Session / product-analytics family under hot-user skew
# =========================================================================


@pytest.fixture(scope="module")
def skewed_clickstream(spark, tmp_path_factory):
    """A clickstream the way real products skew: one hot user (a bot
    or a shared account) with 90% of 60k events in rapid-fire bursts,
    a Zipfian tail over ~500 real users, equal-timestamp ties (retry
    double-submits, broken by event_id), and a deterministic BOUNDARY
    strand for one user: consecutive events spaced at exactly the
    sessionize gap (1800 s, strict > rule -> same session), one
    microsecond past it (new session), and exactly the debounce gap
    (86400 s, strict > -> same burst). Spans 8 weeks so retention has
    a real cohort grid."""
    import datetime

    rng = random.Random(20260815)
    base = datetime.datetime(2024, 1, 1)
    types = ("view", "click", "purchase", "scroll", "refresh")
    rows = []
    for i in range(N_TICKS):
        if rng.random() < HOT_SHARE:
            user = 1
            # bursts: dense sub-second traffic inside a few hot hours
            ts = base + datetime.timedelta(
                hours=rng.randrange(0, 8 * 7 * 24, 7),
                microseconds=rng.randrange(0, 3600_000_000),
            )
        else:
            user = 2 + max(1, int(500 ** rng.random()))
            ts = base + datetime.timedelta(
                seconds=rng.uniform(0, 8 * 7 * 86400)
            )
        etype = types[min(4, int(5 ** rng.random()) - 1 + rng.randrange(3))]
        rows.append((i, ts, user, etype, rng.uniform(0.0, 500.0), None))
    # equal-timestamp ties: duplicate 200 hot-user rows with new ids
    ties = [
        (N_TICKS + j, r[1], r[2], r[3], r[4], None)
        for j, r in enumerate(rows[:200])
    ]
    # boundary strand, user 9999: exact-gap chains
    t0 = base + datetime.timedelta(days=10)
    strand, t, eid = [], t0, N_TICKS + 10_000
    for step_us in (
        1_800_000_000,      # == sessionize gap -> SAME session
        1_800_000_000,      # chain of exact gaps stays one island
        1_800_000_001,      # 1 us past -> NEW session
        86_400_000_000,     # == debounce gap -> same burst
        86_400_000_001,     # 1 us past -> new burst
    ):
        t = t + datetime.timedelta(microseconds=step_us)
        strand.append((eid, t, 9999, "view", 1.0, None))
        eid += 1
    rows = rows + ties + [(N_TICKS + 9_999, t0, 9999, "view", 1.0, None)]
    rows += strand
    path = tmp_path_factory.mktemp("clickstream")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).repartition(8).write.parquet(str(path / "events.parquet"))
    return str(path)


@pytest.mark.slow
def test_session_family_hot_user_parity_at_scale(spark, skewed_clickstream):
    """Sessionize/funnel/retention/rolling-DAU/salted-agg/debounce
    must hold BITWISE oracle parity on the 60k-event hot-user tape —
    the regime where tie-break instability, gap-boundary drift, or a
    non-associative salted partial would first show (the shipped
    fixtures are uniform and 60x smaller)."""
    import duckdb

    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skewed_clickstream}/events.parquet/*.parquet')"
    )
    for name in (
        "q_sessionize", "q_funnel", "q_retention",
        "q_rolling_dau", "q_salted_agg", "q_debounce",
    ):
        df = QUERIES[name](spark, skewed_clickstream)
        problems = compare(df, con, ORACLE_SQL[name])
        assert not problems, (name, problems)
    # the exact-gap strand resolved per the strict-> rule: the two
    # exact-1800s steps stay in session 1, the +1us step opens
    # session 2, and each 24h-scale step opens a new session -> 4
    # sessions; debounce (24 h gap, same strict rule) keeps the
    # exact-86400s step in burst 1 and only the +1us step opens
    # burst 2.
    sess = con.sql(
        "SELECT COUNT(*) FROM (" + ORACLE_SQL["q_sessionize"]
        + ") WHERE user_id = 9999"
    ).fetchone()[0]
    assert sess == 4, sess
    bursts = con.sql(
        "SELECT COUNT(*) FROM (" + ORACLE_SQL["q_debounce"]
        + ") WHERE user_id = 9999"
    ).fetchone()[0]
    assert bursts == 2, bursts
    con.close()


@pytest.mark.slow
def test_session_family_plans_hold_under_skew(spark, skewed_clickstream):
    """The single-exchange plan claims for the window-family queries
    must survive the hot user: skew changes task runtimes, never the
    plan shape."""
    import re

    from dex_data_ingestor_spark.plans.testbed import QUERIES

    for name in ("q_sessionize", "q_debounce"):
        df = QUERIES[name](spark, skewed_clickstream)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        n_ex = len(re.findall(r"\bExchange hashpartitioning", plan))
        assert n_ex == 1, (name, n_ex, plan)


# =========================================================================
# Vector / ANN family under hot-cell skew
# =========================================================================

N_CLUMP = 1500        # near-identical clump -> one mega duplicate group
N_VTAIL = 4500        # random-direction tail
VEC_DIM = 64          # matches the fixture tables / _IVF_DIM


@pytest.fixture(scope="module")
def skewed_embeddings(spark, tmp_path_factory):
    """An embedding corpus the way real encoder output skews: one
    near-identical clump of 1500 vectors (a boilerplate page embedded
    1500 times — pairwise cosine ~1.0, all landing in ONE IVF cell:
    the semantic-dedup hot-cell regime the docstring warns about), a
    4500-vector random-direction tail (12x the sf0.01 table), plus
    the failure rows every real corpus carries — NULL embeddings and
    all-zero vectors from crashed encoder shards — riding along to
    prove the usable_embeddings gate at scale. Components stay unit-
    scale (the documented exact-integer input domain) and are
    generated as exact float32 values so the FLOAT[] parquet round
    trip is lossless on both engines."""
    import numpy as np

    rng = np.random.default_rng(20260815)
    base_dir = rng.standard_normal(VEC_DIM)
    base_dir /= np.linalg.norm(base_dir)
    rows = []
    vid = 0
    # vec_id 0 is the query vector for the topk/ANN queries: a tail
    # vector, deliberately NOT in the clump so top-k has real ranking
    # work to do
    q = np.float32(rng.standard_normal(VEC_DIM))
    rows.append((vid, [float(x) for x in q], 0))
    vid += 1
    for _ in range(N_CLUMP):
        v = np.float32(base_dir + 1e-3 * rng.standard_normal(VEC_DIM))
        rows.append((vid, [float(x) for x in v], int(rng.integers(0, 4))))
        vid += 1
    for _ in range(N_VTAIL):
        v = np.float32(rng.standard_normal(VEC_DIM))
        # Zipfian label blocks: label r with p(r) ~ 1/r over 10 labels
        label = max(1, int(10 ** rng.random())) - 1
        rows.append((vid, [float(x) for x in v], label))
        vid += 1
    # encoder-failure rows: NULL and all-zero embeddings
    for _ in range(12):
        rows.append((vid, None, 0))
        vid += 1
    for _ in range(12):
        rows.append((vid, [0.0] * VEC_DIM, 1))
        vid += 1
    path = tmp_path_factory.mktemp("vecs")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(8).write.parquet(str(path / "embeddings.parquet"))
    return str(path)


@pytest.mark.slow
def test_vector_family_hot_cell_parity_at_scale(spark, skewed_embeddings):
    """q_vector_topk / q_ann_ivf / q_semdedup / q_similarity_topk must
    hold BITWISE oracle parity on the 6000-vector hot-cell corpus —
    the regime where a tie-break instability inside the ~1.1M-pair
    clump (thousands of cosines rounding to the same 9dp value), a
    hot-cell partial-aggregation bug, or an unguarded NULL/zero-norm
    row would first show (the shipped fixtures are uniform, 12x
    smaller, and carry no failure rows)."""
    import duckdb

    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{skewed_embeddings}/embeddings.parquet/*.parquet')"
    )
    for name in (
        "q_vector_topk", "q_ann_ivf", "q_semdedup", "q_similarity_topk",
    ):
        df = QUERIES[name](spark, skewed_embeddings)
        problems = compare(df, con, ORACLE_SQL[name])
        assert not problems, (name, problems)
    con.close()


@pytest.mark.slow
def test_semdedup_hot_cell_collapses_clump(spark, skewed_embeddings):
    """The 1500-vector clump is one duplicate group: semantic dedup
    must keep exactly its min-id member, the BLAS twin must pin the
    IDENTICAL survivor set under skew (the fast path's per-cell
    matmul sees a 1500x64 block here, not the 10-row fixture cells),
    and the pair stage must stay keyed on the cell — no cartesian /
    nested-loop join may appear in the executed plan."""
    from dex_data_ingestor_spark.operators.vector import (
        seeded_centroids,
        semantic_dedup,
        semantic_dedup_fast,
        usable_embeddings,
    )
    from dex_data_ingestor_spark.io import load_table
    from dex_data_ingestor_spark.plans.testbed import (
        _IVF_DIM,
        _IVF_NCELLS,
        _IVF_SEED,
        _SEMDEDUP_THRESHOLD,
    )

    em = usable_embeddings(load_table(spark, skewed_embeddings, "embeddings"))
    cents = seeded_centroids(_IVF_DIM, _IVF_NCELLS, seed=_IVF_SEED)
    slow = semantic_dedup(
        em, "vec_id", "embedding", cents, threshold=_SEMDEDUP_THRESHOLD
    )
    fast = semantic_dedup_fast(
        em, "vec_id", "embedding", cents, threshold=_SEMDEDUP_THRESHOLD
    )
    slow_ids = {r.vec_id for r in slow.select("vec_id").collect()}
    fast_ids = {r.vec_id for r in fast.select("vec_id").collect()}
    assert slow_ids == fast_ids
    # clump ids are 1..N_CLUMP; pairwise cosine ~1.0 >> threshold, so
    # the whole clump is connected through its min id -> exactly the
    # min id survives
    clump_survivors = slow_ids & set(range(1, N_CLUMP + 1))
    assert clump_survivors == {1}, sorted(clump_survivors)[:5]
    # zero-norm and NULL rows were gated out, never deduped in
    assert not any(i >= 1 + N_CLUMP + N_VTAIL for i in slow_ids)
    plan = slow._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


# =========================================================================
# Lakehouse (snapshots.py) under long-history / many-file load
# =========================================================================

N_COMMITS = 36


@pytest.mark.slow
def test_lakehouse_long_history_parity_at_scale(spark, tmp_path):
    """36 mixed commits (MERGE / DELETE / rollback / full rewrite) —
    a year of daily batches in miniature — replayed against an exact
    driver-side model: HEAD, three time-travel probes (including one
    straddling a rollback), and a distant-range CDF must all match
    the model verbatim, and the version log must list every commit.
    The shipped tests exercise each op 1-2 commits deep; a long
    chain is where carry-forward state (constraints, merge keys,
    rollback data-dir reuse) would first drift."""
    import random as pyrandom

    from dex_data_ingestor_spark import snapshots as S

    root = str(tmp_path / "tbl")
    rng = pyrandom.Random(20260815)

    def to_df(state: dict[int, int]):
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(state.items())], "k long, v long"
        )

    # version -> exact expected content
    states: dict[int, dict[int, int]] = {}
    state = {k: 0 for k in range(400)}
    m = S.snapshot_write(to_df(state), root)
    states[m["version"]] = dict(state)

    for round_no in range(1, N_COMMITS):
        op = rng.random()
        if op < 0.6:  # MERGE a skewed batch (hot keys + inserts)
            batch = {
                rng.randrange(0, 1200): round_no for _ in range(50)
            }
            m = S.snapshot_merge(
                spark, root, to_df(batch), keys=["k"]
            )
            state = {**state, **batch}
        elif op < 0.8:  # DELETE by predicate
            mod = rng.choice((7, 11, 13))
            m = S.snapshot_delete(spark, root, f"v % {mod} = 0")
            state = {k: v for k, v in state.items() if v % mod != 0}
        elif op < 0.9 and len(states) > 2:  # rollback to a past version
            target = rng.choice(sorted(states)[:-1])
            m = S.snapshot_rollback(root, to_version=target)
            state = dict(states[target])
        else:  # full rewrite (compaction-style content replacement)
            m = S.snapshot_write(to_df(state), root, op="write")
        states[m["version"]] = dict(state)

    assert len(S.snapshot_versions(root)) == len(states)

    def table_state(df) -> dict[int, int]:
        return {r.k: r.v for r in df.collect()}

    # HEAD and three probes (early, straddling the chain's middle,
    # and the most recent non-HEAD version)
    assert table_state(S.snapshot_read(spark, root)) == state
    versions = sorted(states)
    for probe in (versions[1], versions[len(versions) // 2], versions[-2]):
        assert table_state(
            S.snapshot_read(spark, root, version=probe)
        ) == states[probe], probe

    # CDF across half the history == the model diff
    lo = versions[len(versions) // 2]
    old, new = states[lo], state
    want = {}
    for k in old.keys() | new.keys():
        if k not in old:
            want[k] = "added"
        elif k not in new:
            want[k] = "removed"
        elif old[k] != new[k]:
            want[k] = "changed"
    feed = {
        r.k: r.status
        for r in S.snapshot_changes(
            spark, root, from_version=lo, keys=["k"]
        ).collect()
    }
    assert feed == want


@pytest.mark.slow
def test_lakehouse_stat_pruning_at_file_count(spark, tmp_path):
    """64-file range-clustered snapshot (8x the shipped pruning
    test): a point-range scan must read a handful of files, not a
    fraction that merely rounds down — at 100 TB the manifest prune
    IS the difference between a metadata operation and a full scan.
    Out-of-range scans stay schema-stable at zero files."""
    from pyspark.sql import functions as F

    from dex_data_ingestor_spark import snapshots as S

    root = str(tmp_path / "tbl")
    df = (
        spark.range(0, 256_000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 1009).alias("v"),
        )
        .repartitionByRange(64, "k")
    )
    m = S.snapshot_write_with_stats(df, root, stats_cols=["k"])
    assert len(m["files"]) == 64
    # a 2000-wide window spans 4000 ids per file -> at most 2 files
    pruned = S.snapshot_scan_pruned(spark, root, "k", 100_000, 101_000)
    assert len(pruned.inputFiles()) <= 2, len(pruned.inputFiles())
    got = pruned.filter(F.col("k").between(100_000, 101_000)).count()
    assert got == 1001
    empty = S.snapshot_scan_pruned(spark, root, "k", 10**9, 10**9 + 1)
    assert empty.columns == ["k", "v"] and empty.count() == 0


# =========================================================================
# Structured Streaming twins under hot-key skew
# =========================================================================


@pytest.mark.slow
def test_streaming_ohlc_hot_key_parity_and_bounded_state(
    spark, skewed_tape, tmp_path
):
    """The streaming OHLC twin drained over the 60k-tick hot-key tape
    (8 micro-batches, each spanning the FULL time range — every batch
    delivers late data for every open bar) must emit exactly the
    batch q_ohlc_bars series, and its state-store row count must
    equal the number of BARS, not scale with ticks — per-key state
    bounded by output cardinality is the claim that survives a 100x
    tape."""
    from dex_data_ingestor_spark.plans.testbed import QUERIES
    from dex_data_ingestor_spark.streaming.jobs import (
        events_stream_from_parquet,
        ohlc_bars,
    )

    stream = events_stream_from_parquet(
        spark, f"{skewed_tape}/events.parquet", max_files_per_trigger=1
    )
    q = (
        ohlc_bars(stream)
        .writeStream.format("memory")
        .queryName("t_ohlc_skew")
        .option("checkpointLocation", str(tmp_path / "ckpt_ohlc_skew"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    progress = q.lastProgress
    cols = (
        "bar_start", "event_type", "open_px", "high_px", "low_px",
        "close_px", "n_ticks", "volume_units",
    )
    got = {
        tuple(r[c] for c in cols)
        for r in spark.sql("select * from t_ohlc_skew").collect()
    }
    want = {
        tuple(r[c] for c in cols)
        for r in QUERIES["q_ohlc_bars"](spark, skewed_tape).collect()
    }
    assert got == want and len(got) > 0
    state_rows = progress["stateOperators"][0]["numRowsTotal"]
    assert state_rows == len(want), (state_rows, len(want))


@pytest.mark.slow
def test_stateful_running_totals_hot_user_at_scale(
    spark, skewed_clickstream, tmp_path
):
    """applyInPandasWithState over the 60k-event hot-user clickstream
    (one user holds ~90% of all events, delivered across 8
    micro-batches): the final per-user state must equal the batch
    aggregate bit-for-bit on counts and to fixed precision on the
    float sum, and state rows must equal the number of USERS — the
    hot key grows a partition's input, never the state."""
    from pyspark.sql import functions as F

    from dex_data_ingestor_spark.io import load_table
    from dex_data_ingestor_spark.streaming.jobs import (
        events_stream_from_parquet,
        running_totals_stateful,
    )

    stream = events_stream_from_parquet(
        spark, f"{skewed_clickstream}/events.parquet",
        max_files_per_trigger=1,
    )
    q = (
        running_totals_stateful(stream)
        .writeStream.format("memory")
        .queryName("t_state_skew")
        .option("checkpointLocation", str(tmp_path / "ckpt_state_skew"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    import math

    final = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            """select user_id, n_events, total_value from (
                 select *, row_number() over (
                   partition by user_id order by n_events desc) rn
                 from t_state_skew) where rn = 1"""
        ).collect()
    }
    batch = {
        r.user_id: (r.n, r.total)
        for r in load_table(spark, skewed_clickstream, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert final.keys() == batch.keys() and len(final) > 400
    for uid, (n, total) in batch.items():
        fn, ftotal = final[uid]
        # counts exact; float totals to high relative precision only —
        # per-batch pandas pairwise summation then cross-batch
        # accumulation orders differently from the batch sum, so
        # bitwise equality is not the contract here (the hot user
        # folds ~54k doubles through 8 different partial orders)
        assert fn == n, (uid, fn, n)
        assert math.isclose(ftotal, total, rel_tol=1e-9), (
            uid, ftotal, total,
        )
    # the hot user accumulated ~90% of 60k events through one state row
    hot_n, _ = final[1]
    assert hot_n > 0.8 * N_TICKS, hot_n


# =========================================================================
# Multimodal decode under dirty-corpus load
# =========================================================================


@pytest.mark.slow
def test_multimodal_decode_dirty_corpus_at_scale(spark):
    """3000 binary payloads the way a real crawl arrives — valid
    images mixed with corrupt headers, truncated bodies, NULLs, and
    decode-bomb headers claiming absurd dimensions — through the
    image_stats kernel in one distributed pass: EXACTLY the valid
    rows decode, every poison row quarantines with a recorded reason,
    no task dies, and the decoded moments match a driver-side numpy
    replay on a sample. One bad file killing a scan is the multimodal
    failure mode this family's docstrings promise away; this is the
    promise executed at volume."""
    import random as pyrandom
    import zlib

    import numpy as np

    from dex_data_ingestor_spark.operators.multimodal import (
        decode_media,
        encode_ppm,
        image_stats,
    )

    def png_chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + crc.to_bytes(4, "big")
        )

    rng = pyrandom.Random(20260815)
    nrng = np.random.default_rng(20260815)
    rows = []
    n_valid = 0
    for i in range(3000):
        kind = rng.random()
        if kind < 0.8:  # valid PPM, varied dims
            h, w = rng.randrange(2, 9), rng.randrange(2, 9)
            arr = nrng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            rows.append((i, bytearray(encode_ppm(arr))))
            n_valid += 1
        elif kind < 0.87:  # corrupt: random bytes
            rows.append((i, bytearray(rng.randbytes(rng.randrange(1, 64)))))
        elif kind < 0.92:  # truncated PPM: header promises more pixels
            rows.append((i, bytearray(b"P6 64 64 255\n" + b"\x00" * 10)))
        elif kind < 0.96:  # NULL payload
            rows.append((i, None))
        else:  # PNG decode bomb: 1e9 x 1e9 header, tiny body
            bomb = (
                b"\x89PNG\r\n\x1a\n"
                + png_chunk(
                    b"IHDR",
                    (10**9).to_bytes(4, "big") * 2
                    + bytes([8, 2, 0, 0, 0]),
                )
                + png_chunk(b"IDAT", zlib.compress(b"\x00" * 16))
                + png_chunk(b"IEND", b"")
            )
            rows.append((i, bytearray(bomb)))
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary"
    ).repartition(8)
    out = image_stats(df).collect()
    assert len(out) == 3000
    by_id = {r.doc_id: r for r in out}
    decoded_ids = {r.doc_id for r in out if r.decoded}
    assert len(decoded_ids) == n_valid
    # every quarantine row carries a reason; no decoded row does
    for r in out:
        if r.decoded:
            assert r.error is None and r.width and r.height
        else:
            assert r.error, r
    # moments spot-check: driver-side numpy replay of 20 sampled rows
    for i in sorted(decoded_ids)[:20]:
        arr = decode_media(bytes(rows[i][1]))
        px = arr.astype(np.float64)
        assert abs(by_id[i].mean_px - px.mean()) < 1e-9
        assert abs(by_id[i].std_px - px.std()) < 1e-9


# =========================================================================
# Exact-stats family under hot-key skew (r9: q_stats_agg /
# q_outlier_events / q_quantiles rebuilt on exact integer moments and
# order statistics — stress the one-giant-group regime where the
# moment magnitudes and the rank window are furthest from the shipped
# fixtures, plus NULL holes for the pairwise-complete semantics)
# =========================================================================


@pytest.fixture(scope="module")
def skewed_stats_tape(spark, tmp_path_factory):
    """60k events, one hot event_type with 90% of rows, values across
    1e-3..1e6 (inside the documented moment domain — the 1.5e8 tape
    above is deliberately OUTSIDE it, see the overflow test), with
    NULL value / NULL user_id holes so var-n and pairwise-n differ."""
    import datetime

    rng = random.Random(20260816)
    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(N_TICKS):
        etype = "hot" if rng.random() < HOT_SHARE else f"t{rng.randint(1, 40)}"
        mag = rng.choice((1e-3, 1.0, 311.7, 1e6))
        value = None if rng.random() < 0.02 else mag * (1.0 + rng.random())
        user = None if rng.random() < 0.03 else rng.randint(1, 500)
        ts = base + datetime.timedelta(seconds=rng.uniform(0, 72 * 3600))
        rows.append((i, ts, user, etype, value, None))
    path = tmp_path_factory.mktemp("stats_tape")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).repartition(8).write.parquet(str(path / "events.parquet"))
    return str(path)


@pytest.mark.slow
def test_exact_stats_hot_key_parity_at_scale(spark, skewed_stats_tape):
    """Bitwise oracle parity for the exact-stats family on the 60k
    hot-key tape: a 54k-row group pushes nv*ssu toward 1e34 (the
    _det_to_double regime, far past 2^53) and exercises average-free
    rank interpolation over a group 60x the fixture's."""
    import duckdb

    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skewed_stats_tape}/events.parquet/*.parquet')"
    )
    for name in ("q_stats_agg", "q_outlier_events", "q_quantiles"):
        problems = compare(
            QUERIES[name](spark, skewed_stats_tape), con, ORACLE_SQL[name]
        )
        assert not problems, (name, problems)
    con.close()


@pytest.mark.slow
def test_stats_moments_overflow_loudly_out_of_domain(spark, tmp_path):
    """The stats moment domain (sufficient bound: |value|*1e6 *
    rows-per-group < 3e18, q_stats_agg docstring) is enforced by ANSI
    decimal overflow, not silent wraparound. 100k rows of value 3e8 in
    one group put nv*ssu at ~9e38 > DECIMAL(38) — the query must
    RAISE there rather than emit corrupt moments. (The 1.5e8 market
    tape above happens to squeak inside the NECESSARY bound because
    its magnitudes are mixed — the sufficient bound is what the
    docstring promises, so the violation here is constructed, not
    sampled.)"""
    from pyspark.sql import functions as SF

    from dex_data_ingestor_spark.plans.testbed import QUERIES

    path = str(tmp_path / "wide")
    (
        spark.range(100_000)
        .select(
            SF.col("id").alias("event_id"),
            SF.lit("2024-03-01 00:00:00").cast("timestamp_ntz").alias("ts"),
            (SF.col("id") % 500).alias("user_id"),
            SF.lit("hot").alias("event_type"),
            SF.lit(3.0e8).alias("value"),
            SF.lit(None).cast("string").alias("props"),
        )
        .repartition(8)
        .write.parquet(path + "/events.parquet")
    )
    with pytest.raises(
        Exception,
        match="(?i)overflow|out of range|cannot be represented|NUMERIC_VALUE",
    ):
        QUERIES["q_stats_agg"](spark, path).collect()


# =========================================================================
# Matview family (added r10 — the family that went driver-red in r9
# gets the same hot-key stress treatment as the rest)
# =========================================================================


@pytest.mark.slow
def test_matview_long_maintenance_chain_never_drifts(spark):
    """The 100 TB claim under test: a maintained roll-up equals a
    from-scratch recompute EXACTLY after an arbitrarily long chain of
    refreshes — 25 rounds of skewed churn (one hot group holds ~90%
    of rows; every round deletes, updates, and inserts) over values
    chosen to drift under float accumulation (0.1 is not dyadic; the
    1e9-magnitude rows make naive double sums lose the 0.1 tails
    entirely). Equality is checked EVERY round, bitwise on the
    DECIMAL(38,6) sums — one ULP of drift anywhere in the chain fails
    the round it appears."""
    from dex_data_ingestor_spark.operators import matview as MV

    def row(k):
        g = "hot" if k % 10 else f"cold{k % 7}"
        # non-dyadic small tails beside 1e9 spikes: poison for a
        # float running sum, exact for the decimal path
        v = 0.1 + (k % 13) * 0.01 + (1.0e9 if k % 97 == 0 else 0.0)
        return (k, g, v)

    n = 6000
    fact = {k: row(k) for k in range(n)}
    schema = "k long, g string, v double"
    base = MV.grouped_sums(
        spark.createDataFrame(list(fact.values()), schema), ["g"], ["v"]
    )
    next_key = n
    for rnd in range(25):
        # churn: delete 40 keys, update 80 (both images), insert 60
        dels = [k for k in range(rnd * 40, rnd * 40 + 40) if k in fact]
        upds = [
            k
            for k in range(2000 + rnd * 80, 2000 + rnd * 80 + 80)
            if k in fact and k not in dels
        ]
        removed = [fact[k] for k in dels] + [fact[k] for k in upds]
        added = []
        for k in upds:
            kk, g, v = fact[k]
            fact[k] = (kk, g, v + 0.1)
            added.append(fact[k])
        for _ in range(60):
            fact[next_key] = row(next_key)
            added.append(fact[next_key])
            next_key += 1
        for k in dels:
            del fact[k]
        base = MV.maintain_grouped_sums(
            base,
            spark.createDataFrame(removed, schema),
            spark.createDataFrame(added, schema),
            ["g"],
            ["v"],
        )
        # sever the 25-round lineage so the plan does not grow
        # unboundedly (exactly what a snapshot-stored aggregate does
        # between refreshes at scale)
        base = base.localCheckpoint()
        want = MV.grouped_sums(
            spark.createDataFrame(list(fact.values()), schema),
            ["g"],
            ["v"],
        )
        got = {r.g: (r.n_rows, r.sum_v) for r in base.collect()}
        exp = {r.g: (r.n_rows, r.sum_v) for r in want.collect()}
        assert got == exp, f"drift at round {rnd}"


# =========================================================================
# Graph + packing/tokenization families (added r10: the last two heavy
# families without a skew stress; oracle parity under engineered skew,
# the exact-stats pattern)
# =========================================================================


@pytest.mark.slow
def test_pagerank_hub_graph_parity_at_scale(spark, tmp_path):
    """PageRank on an extreme-skew trade graph: one hub customer
    trading with 2,000 suppliers and one hub supplier serving 3,000
    customers (star in-degree ~100x the fixture's max), plus a long
    tail with duplicate order lines (exercising the DISTINCT pair
    dedup). All-integer updates mean skew can only break the
    PLUMBING (the dst-keyed shuffles, checkpoint truncation), never
    the values — so bitwise oracle parity on this graph certifies
    the loop end-to-end under hub pressure."""
    import duckdb

    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    rng = random.Random(20260815)
    orders, lineitem = [], []
    ok = 0
    # hub customer 1: 2000 orders, each to a distinct supplier
    for s in range(1, 2001):
        ok += 1
        orders.append((ok, 1))
        lineitem.append((ok, s))
    # hub supplier 9999: 3000 customers' orders land on it
    for c in range(2, 3002):
        ok += 1
        orders.append((ok, c))
        lineitem.append((ok, 9999))
    # Zipfian tail with duplicate lines per order
    for _ in range(8000):
        ok += 1
        c = max(2, int(3000 ** rng.random()))
        s = max(1, int(2000 ** rng.random()))
        orders.append((ok, c))
        for _ in range(rng.randint(1, 3)):
            lineitem.append((ok, s))
    sf = str(tmp_path)
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).repartition(8).write.parquet(sf + "/orders.parquet")
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_suppkey long"
    ).repartition(8).write.parquet(sf + "/lineitem.parquet")

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet/*.parquet')"
        )
    problems = compare(QUERIES["q_pagerank"](spark, sf), con,
                       ORACLE_SQL["q_pagerank"])
    con.close()
    assert not problems, problems


@pytest.mark.slow
def test_packing_token_budget_hot_lang_parity_at_scale(spark, tmp_path):
    """Sequence packing + token-budget selection on a corpus 10x the
    sf0.1 table with a 90%-hot language, mass token-count TIES (the
    deterministic (n_tokens DESC, doc_id) tiebreak is the seam skew
    data stresses — r8's q_token_budget red lived in this window),
    and giant outlier docs that exhaust the budget within a few rows.
    Bitwise oracle parity for the window family under that skew."""
    import duckdb

    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    rng = random.Random(20260816)
    rows = []
    for i in range(5000):
        lang = "en" if i % 10 else f"l{i % 4}"
        if i % 50 == 0:
            words = 5000  # giant doc: blows the 20k budget fast
        else:
            words = 200 + (i % 7) * 25  # dense tie bands
        text = " ".join(
            f"w{rng.randint(0, 50)}" for _ in range(words)
        )
        rows.append((i, text, lang, f"src{i % 3}", len(text)))
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
        "source string, n_chars long"
    ).repartition(16).write.parquet(sf + "/documents.parquet")

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    for name in ("q_seq_packing", "q_token_budget", "q_mix_weights"):
        problems = compare(QUERIES[name](spark, sf), con,
                           ORACLE_SQL[name])
        assert not problems, (name, problems)
    con.close()


@pytest.mark.slow
def test_pipeline_hourly_cron_equals_rebuild_hot_token(spark, tmp_path):
    """Pipelines-family skew stress (the family the r10 continuation
    session changed: full-first-day recompute windows + NTZ-safe
    bounds). A 30k-event tape with one token at ~90% share and
    non-dyadic values, driven through the HOURLY cron the reference
    actually runs (etl_job_till_now every hour over 3 days, including
    partial-day windows and the midnight boundary), must equal ONE
    full catch-up bitwise for BOTH daily facts — replace-clobber of a
    hot day by an hour slice is exactly what the old windows did."""
    import datetime as dtm
    import random

    import pandas as pd

    from dex_data_ingestor_spark.io import load_table
    from dex_data_ingestor_spark.plans.pipelines import (
        DexWarehouse,
        etl_job_till_now,
    )

    rng = random.Random(77)
    base = dtm.datetime(2024, 3, 1)
    rows = []
    for i in range(30_000):
        uid = 7 if rng.random() < 0.9 else rng.randrange(50)
        ts = base + dtm.timedelta(
            seconds=rng.randrange(3 * 24 * 3600),
            microseconds=rng.randrange(1_000_000),
        )
        # non-dyadic tails beside spikes: poison for a float fold,
        # exact under the decimal discipline
        val = rng.choice([0.1, 0.3, 1e6 + 0.7, 42.42, None])
        rows.append((i, ts, uid, "swap", val, "{}"))
    # one tick at exactly midnight of day 2: the sliver case
    rows.append((30_000, base + dtm.timedelta(days=1), 7, "swap", 5.5, "{}"))
    sf = tmp_path / "sf"
    sf.mkdir()
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(sf / "events.parquet")
    events = load_table(spark, str(sf), "events")

    # A: hourly cron over the full span (72 windows + a tail hour)
    wh_a = DexWarehouse(spark, str(tmp_path / "wh_a"))
    now = base
    end = base + dtm.timedelta(days=3, hours=1)
    while now <= end:
        for task in ("sync_token_daily_stats", "sync_yield_stats"):
            etl_job_till_now(wh_a, task, events, now)
        now += dtm.timedelta(hours=3)

    # B: one catch-up at the final instant
    wh_b = DexWarehouse(spark, str(tmp_path / "wh_b"))
    for task in ("sync_token_daily_stats", "sync_yield_stats"):
        etl_job_till_now(wh_b, task, events, end)

    for table, cols in (
        ("fact_token_daily_stats",
         ["token_id", "date", "volume", "txns_count"]),
        ("fact_yield_stats", ["token_id", "date", "apy", "tvl"]),
    ):
        a = sorted(
            (tuple(r) for r in wh_a.read(table).select(*cols).collect()),
            key=repr,
        )
        b = sorted(
            (tuple(r) for r in wh_b.read(table).select(*cols).collect()),
            key=repr,
        )
        assert a == b and len(a) > 0, table


@pytest.mark.slow
def test_winnowed_span_path_large_doc_mega_dup(spark):
    """VERDICT r12 #4: the winnowed span path (q_dup_substrings_
    winnowed's engine side) above toy size — its XXH64 selection chain
    was new in r12 and exercised only at sf<=0.1. A large-doc/mega-dup
    corpus (docs ~5k chars, half embedding the same 2.5k-char block)
    checks three things the small SFs cannot:

    - the argmin KEY semantics hold at large positions: the engine
      selects per-window argmin by the (hash, pos) struct — signed
      64-bit hash first, position breaking ties upward. Replayed
      independently in Python over the engine's own winnow=1 hash
      rows for sample docs (the same independence the oracle's
      h*2**63+p HUGEINT key has at driver SFs);
    - emitted-row volume scales LINEARLY in corpus size (the
      winnowed explode is ~2/(w+1) of positions, content-defined —
      a mega-dup must not densify selection);
    - wall time scales ~linearly too (generous 4x bound for 2x data
      on a shared box), and the mega-dup block is detected in every
      copy at span granularity.
    """
    import random
    import string
    import time

    from dex_data_ingestor_spark.operators.corpus import (
        _window_keys,
        repeated_substring_spans,
    )

    rng = random.Random(20260816)
    alpha = string.ascii_letters + string.digits + " "
    block = "".join(rng.choice(alpha) for _ in range(2500))

    def body(seed, n):
        r = random.Random(seed)
        return "".join(r.choice(alpha) for _ in range(n))

    def corpus(n_docs):
        rows = []
        for i in range(n_docs):
            if i % 2 == 0:
                t = body(1000 + i, 1200) + block + body(2000 + i, 1300)
            else:
                t = body(3000 + i, 5000)
            rows.append((i, t))
        return spark.createDataFrame(
            rows, "doc_id long, text string"
        ).repartition(8)

    LN, W = 20, 10
    small, big = corpus(150), corpus(300)

    def base(df):
        return df.select(
            "doc_id", F.col("text").alias("__t")
        ).filter(F.length("__t") >= LN)

    # --- argmin key replay on sample docs ------------------------------
    sample = base(small).filter(F.col("doc_id").isin(0, 1, 2))
    exact = (
        _window_keys(sample, "doc_id", LN, True, 1)
        .collect()
    )
    by_doc: dict[int, dict[int, int]] = {}
    for r in exact:
        by_doc.setdefault(r.doc_id, {})[r.pos] = r.key
    got = (
        _window_keys(sample, "doc_id", LN, True, W)
        .select("doc_id", "pos")
        .collect()
    )
    got_sel = {d: set() for d in by_doc}
    for r in got:
        got_sel[r.doc_id].add(r.pos)
    for d, hashes in by_doc.items():
        m = len(hashes)
        want = set()
        for j in range(1, max(m - (W - 1), 1) + 1):
            # argmin by (signed hash, pos), ties to smallest pos —
            # the h*2**63+p single-key ordering
            win = [(hashes[p], p) for p in range(j, min(j + W, m + 1))]
            want.add(min(win)[1])
        assert got_sel[d] == want, (
            d, sorted(got_sel[d] ^ want)[:10]
        )

    # --- linear volume + wall time -------------------------------------
    n_small = _window_keys(base(small), "doc_id", LN, True, W).count()
    n_big = _window_keys(base(big), "doc_id", LN, True, W).count()
    ratio = n_big / n_small
    assert 1.8 < ratio < 2.2, (n_small, n_big)
    # selection density stays in the winnowing band (~2/(w+1)=0.18)
    # despite the mega-dup — content-defined sampling must not
    # densify on repeats
    positions_small = sum(
        len(h) for h in by_doc.values()
    ) / 3 * 150  # approx: sampled docs are representative
    assert n_small < 0.4 * positions_small

    t0 = time.monotonic()
    repeated_substring_spans(small, min_len=LN, winnow=W).count()
    t_small = time.monotonic() - t0
    t0 = time.monotonic()
    out_big = repeated_substring_spans(big, min_len=LN, winnow=W)
    rows_big = {r.doc_id: r for r in out_big.collect()}
    t_big = time.monotonic() - t0
    assert t_big < 4 * max(t_small, 0.5), (t_small, t_big)

    # --- mega-dup detected in every copy -------------------------------
    # every even doc embeds the block; all but the corpus-wide first
    # occurrence must report a dup span covering ~the block length
    # (boundaries within w-1 chars per the winnowing tolerance)
    for d in range(2, 300, 2):
        r = rows_big.get(d)
        assert r is not None, d
        assert r.dup_chars >= 2500 - (LN + W - 2), (d, r)
    # odd (unique) docs: no mega-span — tolerate only incidental
    # short-gram collisions
    for d in range(1, 300, 2):
        r = rows_big.get(d)
        assert r is None or r.dup_chars < 200, (d, r)
