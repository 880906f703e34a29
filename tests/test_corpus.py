"""Corpus curation pipeline + IVF refinement + multimodal transforms."""

from pyspark.sql import functions as F

from dex_data_ingestor_spark.io import load_table
from dex_data_ingestor_spark.operators.corpus import corpus_stats, curate_documents
from dex_data_ingestor_spark.operators import vector as V
from dex_data_ingestor_spark.operators.multimodal import (
    attach_fake_payload,
    resize_images,
    sample_frames,
)


def test_curation_pipeline_filters_and_dedups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    curated = curate_documents(
        docs, allowed_langs=("en",), min_words=5, near_dup=True
    ).cache()
    n = curated.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    assert 0 < n <= n_en
    # survivors carry stats columns and unique ids
    assert {"quality_score", "n_words", "n_tokens"} <= set(curated.columns)
    assert curated.select("doc_id").distinct().count() == n
    # deterministic: same input -> same survivor set
    again = curate_documents(docs, allowed_langs=("en",), min_words=5)
    assert sorted(r.doc_id for r in curated.select("doc_id").collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )
    stats = corpus_stats(curated).collect()[0]
    assert stats.n_docs == n and stats.total_words > 0


def test_curation_near_dup_is_conservative(spark, sf_dir):
    """Disabling near-dup keeps a superset of the near-dup survivors."""
    docs = load_table(spark, sf_dir, "documents")
    with_nd = {
        r.doc_id
        for r in curate_documents(docs, near_dup=True).select("doc_id").collect()
    }
    without_nd = {
        r.doc_id
        for r in curate_documents(docs, near_dup=False).select("doc_id").collect()
    }
    assert with_nd <= without_nd


def test_kmeans_refine_improves_cohesion(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    seeds = V.seeded_centroids(dim=64, ncells=4)
    refined = V.kmeans_refine(em, "embedding", seeds, iterations=2)
    assert len(refined) == 4 and len(refined[0]) == 64

    import math

    def cohesion(cents):
        assigned = V.ivf_assign(em, "embedding", cents)
        scores = []
        for i, c in enumerate(cents):
            cell = assigned.filter(F.col("cell") == i)
            if cell.count() == 0:
                continue
            cn = math.sqrt(sum(x * x for x in c)) or 1.0
            s = cell.select(
                F.avg(
                    V.dot(
                        V._as_double_array(F.col("embedding")), V._query_lit(c)
                    )
                    / (V.norm(V._as_double_array(F.col("embedding"))) * cn)
                ).alias("m")
            ).collect()[0].m
            scores.append(s)
        return sum(scores) / len(scores)

    # refined centroids are at least as cohesive as the raw seeds
    assert cohesion(refined) >= cohesion(seeds) - 1e-9


def test_l2_normalize(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings").limit(20)
    out = em.select("vec_id", V.l2_normalize("embedding"))
    norms = out.select(
        F.round(V.norm(F.col("unit_vec")), 6).alias("n")
    ).collect()
    assert all(abs(r.n - 1.0) < 1e-5 for r in norms)


def test_resize_and_frame_sample_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_fake_payload(docs, "doc_id", "text")
    resized = resize_images(media, 128, 128).collect()
    assert len(resized) == 20
    for r in resized[:5]:
        # fake text payloads are undecodable -> fallback path keeps the
        # ORIGINAL metadata (height 256 from attach_fake_payload) so
        # stand-ins never claim resized dimensions
        assert r.media_meta.height == 256 and r.media_meta.format == "fake"
        assert len(r.payload) <= max(16, (128 * 128) // 64)
    frames = sample_frames(media, every_n_bytes=64)
    fc = frames.groupBy("doc_id").count().collect()
    assert len(fc) == 20 and all(r["count"] >= 1 for r in fc)
    # frame fan-out matches payload size
    one = media.orderBy("doc_id").first()
    import math

    expect = math.ceil(len(one.payload) / 64)
    got = frames.filter(F.col("doc_id") == one.doc_id).count()
    assert got == expect


def test_span_dedup_marks_later_occurrences_only(spark):
    from dex_data_ingestor_spark.operators.corpus import span_dedup_stats

    boiler = " ".join(f"w{i}" for i in range(10))  # one exact 10-word span
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, f"{boiler} {uniq_a}"),  # first occurrence of boiler
            (2, f"{boiler} {uniq_b}"),  # repeat -> 1 dup span of 2
            (3, uniq_b[: len(uniq_b)]),  # whole doc unique vs doc2? same span!
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in span_dedup_stats(df, "doc_id", "text", 10).collect()
    }
    assert out[1]["n_dup_spans"] == 0 and out[1]["n_spans"] == 2
    assert out[2]["n_dup_spans"] == 1 and out[2]["dup_frac"] == 0.5
    # doc3 repeats doc2's uniq_b span (first occurrence is doc2's pos 1)
    assert out[3]["n_dup_spans"] == 1


def test_repetition_stats_degenerate_and_short_docs(spark):
    from dex_data_ingestor_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # 4 trigrams, 1 distinct
            (2, "all words here are unique tokens"),  # no repeats
            (3, "too short"),  # < n words -> zero grams, rep 0.0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert out[1]["n_grams"] == 4 and out[1]["n_distinct_grams"] == 1
    assert out[1]["rep_frac"] == 0.75
    assert out[2]["rep_frac"] == 0.0
    assert out[3]["n_grams"] == 0 and out[3]["rep_frac"] == 0.0


def test_contamination_split_is_content_hash_consistent(spark, sf_dir):
    from dex_data_ingestor_spark.functions.scalars import md5_int64
    from dex_data_ingestor_spark.operators.corpus import contamination_by_lang

    docs = load_table(spark, sf_dir, "documents")
    out = contamination_by_lang(docs, "doc_id", "text", "lang", n=3)
    rows = out.collect()
    corpus_langs = {
        r["lang"] for r in docs.select("lang").distinct().collect()
    }
    assert rows and {r["lang"] for r in rows} <= corpus_langs
    for r in rows:
        assert 0 <= r["n_contaminated"] <= r["n_eval_grams"]
        assert abs(
            r["contamination_rate"]
            - r["n_contaminated"] / r["n_eval_grams"]
        ) < 1e-12


def test_curation_repetition_and_span_gates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = curate_documents(
        docs, allowed_langs=("en",), near_dup=False
    ).count()
    gated = curate_documents(
        docs,
        allowed_langs=("en",),
        near_dup=False,
        max_repetition=0.05,
        max_dup_span_frac=0.5,
    )
    n_gated = gated.count()
    assert 0 < n_gated <= base
    # the gates compose with the stats columns still attached
    assert "quality_score" in gated.columns


def test_verify_pairs_jaccard_kills_false_positive_candidates(spark):
    """Candidate pairs survive only with exact Jaccard >= threshold —
    a band-collision pair with disjoint gram sets must not reject a
    unique doc (ADVICE r2 on stream_neardup_ingest)."""
    from dex_data_ingestor_spark.operators.neardup import (
        shingles,
        verify_pairs_jaccard,
    )

    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4"),
            (2, "w1 w2 w3 w4 w5"),   # true near-dup of 1 (jaccard 2/3)
            (3, "x1 x2 x3 x4"),      # disjoint: a false-positive cand
        ],
        "doc_id long, text string",
    )
    grams = shingles(docs, "doc_id", "text", 3)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "a_id long, b_id long"
    )
    out = {
        (r.a_id, r.b_id): r.jaccard
        for r in verify_pairs_jaccard(pairs, grams, grams, 0.5).collect()
    }
    assert set(out) == {(1, 2)}
    assert abs(out[(1, 2)] - 2 / 3) < 1e-12


def test_repeated_substring_spans_golden(spark):
    """Hand-constructed corpus with known repeats: a 30-char block
    shared across two docs merges to exactly one span covering the
    block; an intra-doc 25-char double occurrence yields two spans;
    a unique doc emits no row."""
    import random
    import string

    from dex_data_ingestor_spark.operators.corpus import (
        repeated_substring_spans,
    )

    def filler(seed, n):
        rng = random.Random(seed)
        return "".join(rng.choice(string.ascii_letters + string.digits)
                       for _ in range(n))

    block = "SHARED-BOILERPLATE-BLOCK-30CH!"      # 30 chars
    chunk = "INTRA-DOC-REPEAT-CHUNK-25"           # 25 chars
    assert len(block) == 30 and len(chunk) == 25
    u = {i: filler(i, 40) for i in range(1, 8)}
    rows = [
        (1, u[1] + block + u[2]),
        (2, u[3] + block + u[4]),
        (3, u[5]),                                # unique -> no row
        (4, u[6] + chunk + u[7] + chunk + filler(8, 30)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           repeated_substring_spans(df, min_len=20).collect()}

    assert set(out) == {1, 2, 4}
    # docs 1 and 2: one merged span = exactly the 30-char block
    for d in (1, 2):
        assert out[d].n_spans == 1
        assert out[d].dup_chars == 30
        assert abs(out[d].dup_frac - 30 / (40 + 30 + 40)) < 1e-9
    # doc 4: both 25-char occurrences, merged separately
    assert out[4].n_spans == 2
    assert out[4].dup_chars == 50


def test_strip_repeated_substrings_golden(spark):
    """First-occurrence-wins span removal: doc 1 keeps the shared
    block (first by (id, pos)), doc 2 loses exactly the block, a
    byte-identical copy of doc 1 vanishes entirely, unique and short
    docs pass through byte-identical."""
    import random
    import string

    from dex_data_ingestor_spark.operators.corpus import (
        strip_repeated_substrings,
    )

    def filler(seed, n):
        rng = random.Random(100 + seed)
        return "".join(rng.choice(string.ascii_letters + string.digits)
                       for _ in range(n))

    block = "SHARED-BOILERPLATE-BLOCK-30CH!"  # 30 chars
    u = {i: filler(i, 40) for i in range(1, 6)}
    doc1 = u[1] + block + u[2]
    rows = [
        (1, doc1),
        (2, u[3] + block + u[4]),
        (3, doc1),          # exact copy of doc 1 -> removed entirely
        (4, u[5]),          # unique -> unchanged
        (5, "short text"),  # < 20 chars -> unchanged
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in
           strip_repeated_substrings(df, min_len=20).collect()}

    assert set(out) == {1, 2, 4, 5}       # doc 3 is gone
    assert out[1] == doc1                  # first occurrence intact
    assert out[2] == u[3] + u[4]           # exactly the block removed
    assert out[4] == u[5]
    assert out[5] == "short text"


def test_scrub_contaminated_spans_golden(spark):
    """Bucket-engineered corpus: a train doc sharing a 30-char block
    with a test doc loses exactly that block; clean train docs pass
    byte-identical; test/val docs never appear in the output."""
    import hashlib
    import random
    import string

    from dex_data_ingestor_spark.operators.corpus import (
        scrub_contaminated_spans,
    )

    def bucket(text):  # mirrors functions.scalars.md5_int64 % 100
        return int(hashlib.md5(text.encode()).hexdigest()[:8], 16) % 100

    def filler(seed, n):
        rng = random.Random(1000 + seed)
        return "".join(rng.choice(string.ascii_letters + string.digits)
                       for _ in range(n))

    def engineer(make, pred):
        for k in range(10_000):
            t = make(k)
            if pred(bucket(t)):
                return t
        raise AssertionError("no bucket hit")

    block = "EVAL-SET-BOILERPLATE-BLOCK-30!"
    assert len(block) == 30
    u1 = filler(1, 40)
    test_doc = engineer(
        lambda k: filler(50 + k, 35) + block + filler(900 + k, 35),
        lambda b: b >= 90,
    )
    train_dirty = engineer(
        lambda k: u1 + block + filler(200 + k, 40),
        lambda b: b < 80,
    )
    train_clean = engineer(
        lambda k: filler(300 + k, 60), lambda b: b < 80
    )
    val_doc = engineer(
        lambda k: filler(400 + k, 60), lambda b: 80 <= b < 90
    )
    rows = [(1, train_dirty), (2, train_clean), (3, test_doc), (4, val_doc)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in
           scrub_contaminated_spans(df, min_len=20).collect()}

    assert set(out) == {1, 2}             # only the train split emits
    assert out[1] == train_dirty.replace(block, "")  # block excised
    assert out[2] == train_clean          # clean doc byte-identical


def test_span_family_hash_path_equals_raw_path(spark, sf_dir):
    """VERDICT r6 #2 property: with the 64-bit hash as the shuffled
    key, detected spans are a SUPERSET of the raw-string path's spans
    (collisions only merge/add), and in practice — 64-bit keys over
    corpus-sized gram sets — bit-identical. Proven on the real
    documents table at the test SF for both the stats and the
    materialization operators."""
    from dex_data_ingestor_spark.operators.corpus import (
        repeated_substring_spans,
        strip_repeated_substrings,
    )

    docs = load_table(spark, sf_dir, "documents")

    raw = {r.doc_id: (r.n_spans, r.dup_chars, r.dup_frac)
           for r in repeated_substring_spans(
               docs, min_len=20, hash_grams=False).collect()}
    hashed = {r.doc_id: (r.n_spans, r.dup_chars, r.dup_frac)
              for r in repeated_substring_spans(
                  docs, min_len=20, hash_grams=True).collect()}
    assert set(hashed) >= set(raw)     # collisions can only ADD docs
    assert hashed == raw               # ... and in practice are absent

    raw_s = {r.doc_id: r.text for r in strip_repeated_substrings(
        docs, min_len=20, hash_grams=False).collect()}
    hash_s = {r.doc_id: r.text for r in strip_repeated_substrings(
        docs, min_len=20, hash_grams=True).collect()}
    assert hash_s == raw_s


def test_xxh64_sql_twin_matches_spark(spark):
    """The q_dup_substrings_winnowed oracle (r12, VERDICT r11 #8)
    replays Spark's seeded xxhash64 in DuckDB SQL so the winnowed
    SELECTION is cross-engine exact. Pin the hash twin bit-for-bit on
    random printable 20-char grams: plans/testbed._xxh64_20_ctes must
    equal F.xxhash64 on every gram (one silent bit of divergence would
    shift argmin selections and surface as an unexplainable driver
    hash-mismatch two rounds later)."""
    import random
    import string

    import duckdb

    from dex_data_ingestor_spark.plans.testbed import _xxh64_20_ctes

    rng = random.Random(7)
    grams = [
        "".join(rng.choices(string.printable[:95], k=20))
        for _ in range(300)
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g AS SELECT * FROM (VALUES "
        + ",".join("(?)" for _ in grams) + ") t(gram)",
        grams,
    )
    frag, final = _xxh64_20_ctes("g", "gram AS g0")
    duck = dict(
        con.sql(f"WITH {frag} SELECT g0, h FROM {final}").fetchall()
    )
    sp = dict(
        spark.createDataFrame([(x,) for x in grams], ["gram"])
        .select("gram", F.xxhash64("gram").alias("h"))
        .collect()
    )
    assert duck == sp


def test_winnowed_oracle_parity_on_synthetic_corpus(spark, tmp_path):
    """The q_dup_substrings_winnowed ORACLE itself, pinned bitwise on
    an adversarial synthetic corpus (the fixture corpus exercises it
    through the driver; this test keeps the pairing honest against
    engine OR oracle edits in between): planted cross-doc repeats at
    the detection boundary (len = min_len + w - 1), an exact full
    duplicate, heavy intra-doc repetition (tie-prone identical grams),
    short docs (< min_len and < min_len + w - 1, the truncated-window
    case), and non-printable ASCII (tabs/newlines/control chars — the
    byte-level hash must not care)."""
    import random
    import string

    import duckdb

    from dex_data_ingestor_spark.operators.corpus import (
        repeated_substring_spans,
    )
    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL
    from tests.oracle_check import compare

    rng = random.Random(42)
    alpha = string.ascii_letters + string.digits + " \t\n" + "\x01\x07"

    def blob(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    repeat29 = blob(29)   # min_len + w - 1: guaranteed detected
    repeat60 = blob(60)
    boiler = blob(35)
    docs = [
        (1, blob(50) + repeat29 + blob(40)),
        (2, blob(30) + repeat29 + blob(60)),
        (3, blob(20) + repeat60 + blob(20) + repeat60 + blob(10)),
        (4, boiler * 8),                      # tie-heavy intra-doc
        (5, blob(120)),                       # clean
        (6, "short doc"),                     # < min_len
        (7, blob(25)),                        # one truncated window
        (8, blob(44) + repeat60 + blob(17)),
        (9, None),                            # NULL text
    ]
    # an exact full duplicate of doc 8
    docs.append((10, docs[7][1]))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pq = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(pq)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    got = repeated_substring_spans(
        df, "doc_id", "text", min_len=20, winnow=10
    )
    problems = compare(
        got, con, ORACLE_SQL["q_dup_substrings_winnowed"]
    )
    assert not problems, problems
    # sanity: the planted repeats actually produced span rows
    rows = {r.doc_id for r in got.collect()}
    assert {1, 2, 3, 8, 10} <= rows and 5 not in rows and 6 not in rows


def test_winnowed_spans_tolerance_properties(spark):
    """VERDICT r6 #4 property, exact vs winnowed settings: winnowed
    dup positions are a SUBSET of exact dup positions (selection only
    drops candidates), every planted repeat of length >=
    min_len + winnow - 1 is still detected, and per-span boundary
    error is < winnow chars on each side."""
    import random
    import string

    from dex_data_ingestor_spark.operators.corpus import (
        repeated_substring_spans,
    )

    def filler(seed, n):
        rng = random.Random(7000 + seed)
        return "".join(rng.choice(string.ascii_letters + string.digits)
                       for _ in range(n))

    W = 10
    LN = 20
    # planted repeats comfortably over the LN + W - 1 = 29 guarantee
    block = filler(999, 64)            # 64-char shared block
    chunk = filler(998, 40)            # 40-char intra-doc repeat
    rows = [
        (1, filler(1, 50) + block + filler(2, 50)),
        (2, filler(3, 50) + block + filler(4, 50)),
        (3, filler(5, 120)),                       # unique
        (4, filler(6, 30) + chunk + filler(7, 35) + chunk + filler(8, 30)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    exact = {r.doc_id: r for r in repeated_substring_spans(
        df, min_len=LN, winnow=1).collect()}
    winn = {r.doc_id: r for r in repeated_substring_spans(
        df, min_len=LN, winnow=W).collect()}

    # detection: all long-repeat docs found, no false docs
    assert set(winn) == set(exact) == {1, 2, 4}
    for d, w_row in winn.items():
        e_row = exact[d]
        # subset property: winnowed coverage never exceeds exact
        assert w_row.dup_chars <= e_row.dup_chars
        # boundary tolerance: < W lost chars per span side
        assert w_row.n_spans == e_row.n_spans
        assert w_row.dup_chars > e_row.dup_chars - 2 * W * e_row.n_spans

    # shuffle budget: winnowed explode emits ~2/(W+1) of the positions
    from dex_data_ingestor_spark.operators.corpus import _window_keys

    base = df.select(
        "doc_id", F.col("text").alias("__t"),
        F.length("text").alias("__n"),
    ).filter(F.length("__t") >= LN)
    n_exact = _window_keys(base, "doc_id", LN, True, 1).count()
    n_winn = _window_keys(base, "doc_id", LN, True, W).count()
    assert n_winn < 0.5 * n_exact      # generous bound over 2/(W+1)


def test_winnowed_strip_residue_bound(spark):
    """strip_repeated_substrings under winnowing: an exact full copy
    of an earlier doc shrinks to a <= 2*(winnow-1)-char residue (the
    boundary-precision trade of the strided path); untouched docs
    remain byte-identical."""
    import random
    import string

    from dex_data_ingestor_spark.operators.corpus import (
        strip_repeated_substrings,
    )

    def filler(seed, n):
        rng = random.Random(8000 + seed)
        return "".join(rng.choice(string.ascii_letters + string.digits)
                       for _ in range(n))

    W = 10
    doc1 = filler(1, 150)
    rows = [(1, doc1), (2, doc1), (3, filler(2, 150))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in strip_repeated_substrings(
        df, min_len=20, winnow=W).collect()}

    assert out[1] == doc1                     # first occurrence intact
    assert out[3] == rows[2][1]               # unique doc untouched
    residue = out.get(2, "")
    assert len(residue) <= 2 * (W - 1)        # copy ~vanishes


def test_chunk_documents_overlap_and_coverage(spark):
    """Chunking invariants: chunks start every `stride` chars, overlap
    by chunk_size - stride, concatenating each chunk's leading
    `stride` chars rebuilds the document, short docs emit one chunk,
    empty docs emit none."""
    from dex_data_ingestor_spark.operators.corpus import chunk_documents

    rows = [
        (1, "".join(chr(ord("a") + (i % 26)) for i in range(500))),
        (2, "tiny"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_size=200, stride=150).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)

    assert set(by_doc) == {1, 2}
    c1 = by_doc[1]
    assert len(c1) == 4                       # ceil(500/150)
    assert [r.chunk_start for r in c1] == [1, 151, 301, 451]
    # overlap: each chunk re-covers the previous one's tail 50 chars
    for a, b in zip(c1, c1[1:]):
        assert a.chunk_text[150:] == b.chunk_text[:50]
    # coverage: stride-prefixes concatenate back to the document
    rebuilt = "".join(r.chunk_text[:150] for r in c1)
    assert rebuilt == rows[0][1]
    assert by_doc[2][0].chunk_text == "tiny" and len(by_doc[2]) == 1

    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_size=100, stride=150)


def test_curation_strip_gate_composes(spark):
    """curate_documents(strip_substrings_min_len=...) excises shared
    boilerplate BEFORE stats/dedup: two docs that differ only by a
    license header collapse to one survivor (the header strip makes
    them exact duplicates); the header survives once, in the lowest
    doc id; a full duplicate vanishes at the strip stage; winnowed
    (w>1) survivors are a subset of the exact-gate survivors' ids
    plus possibly-extra docs (strip-less tolerance), and the gate-off
    run keeps a superset of gate-on ids."""
    import random
    import string

    def filler(seed, n):
        rng = random.Random(4200 + seed)
        words = []
        while sum(len(w) + 1 for w in words) < n:
            words.append("".join(rng.choice(string.ascii_lowercase)
                                 for _ in range(rng.randint(3, 9))))
        return " ".join(words)

    header = ("LICENSE HEADER the of and to in is a an " * 3).strip()
    body1 = "the quick brown fox " + filler(1, 400)
    body2 = "the lazy grey wolf " + filler(2, 400)
    rows = [
        (1, header + " " + body1, "en"),
        (2, header + " " + body2, "en"),   # same header, distinct body
        (3, header + " " + body1, "en"),   # full dup of doc 1
        (4, filler(4, 400) + " the of and to is in a an the of", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    gated = curate_documents(
        df, allowed_langs=("en",), min_quality=0.0, min_words=5,
        near_dup=False, strip_substrings_min_len=20,
    )
    out = {r.doc_id: r for r in gated.collect()}
    # doc 3 vanishes at the strip stage (entirely later-occurrence);
    # docs 2 keeps only its body; doc 1 keeps the header (first
    # occurrence) — so 1, 2, 4 survive with stats over stripped text
    assert set(out) == {1, 2, 4}
    n_words_doc2 = out[2].n_words
    assert n_words_doc2 < len(rows[1][1].split())  # header words gone

    # gate off keeps a superset of ids (doc 3 still falls — to the
    # exact sha-dedup stage instead of the strip stage)
    ungated = {
        r.doc_id
        for r in curate_documents(
            df, allowed_langs=("en",), min_quality=0.0, min_words=5,
            near_dup=False,
        ).select("doc_id").collect()
    }
    assert set(out) <= ungated

    # winnowed scale path composes too and stays deterministic
    w1 = curate_documents(
        df, allowed_langs=("en",), min_quality=0.0, min_words=5,
        near_dup=False, strip_substrings_min_len=20, span_winnow=5,
    )
    w2 = curate_documents(
        df, allowed_langs=("en",), min_quality=0.0, min_words=5,
        near_dup=False, strip_substrings_min_len=20, span_winnow=5,
    )
    ids1 = sorted(r.doc_id for r in w1.select("doc_id").collect())
    assert ids1 == sorted(r.doc_id for r in w2.select("doc_id").collect())
    assert set(ids1) <= ungated


def test_curation_strip_materialized_equals_inline(spark, sf_dir, tmp_path):
    """The materialize-then-curate switch (the 100 TB shape: pay the
    strip once instead of once per dedup branch) returns the same
    survivor set and stats as the single-statement composition, and
    leaves the stripped corpus on disk as a readable artifact."""
    docs = load_table(spark, sf_dir, "documents")
    kw = dict(
        allowed_langs=("en",), min_quality=0.3, min_words=5,
        near_dup=True, strip_substrings_min_len=20,
    )
    inline = {
        (r.doc_id, r.n_words, r.quality_score)
        for r in curate_documents(docs, strip_materialize_dir=None, **kw)
        .select("doc_id", "n_words", "quality_score").collect()
    }
    mat_dir = str(tmp_path / "stripped")
    materialized = {
        (r.doc_id, r.n_words, r.quality_score)
        for r in curate_documents(
            docs, strip_materialize_dir=mat_dir, **kw
        ).select("doc_id", "n_words", "quality_score").collect()
    }
    assert inline == materialized
    artifact = spark.read.parquet(mat_dir)
    assert set(artifact.columns) == {"doc_id", "__stripped"}
    assert artifact.count() > 0


def test_leakage_safe_split_keeps_clusters_together(spark):
    """The guard property itself: a near-dup pair whose two texts hash
    to DIFFERENT per-doc buckets (the straddle q_hash_split permits)
    must share one split here, every cluster member rides its min-id
    representative, and singletons keep plain content-hash behavior."""
    from dex_data_ingestor_spark.functions.scalars import md5_int64
    from dex_data_ingestor_spark.operators.corpus import leakage_safe_split

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again near the riverbank every single morning")
    # find a suffix making the variant's OWN hash bucket differ from
    # base's while staying a >=0.5-Jaccard near-dup (tiny tail edit)
    probe = spark.createDataFrame(
        [(0, base)] + [(i, base + f" tail{i}") for i in range(1, 9)],
        "doc_id long, text string",
    ).select("doc_id", (md5_int64(F.col("text")) % 100).alias("b"))
    buckets = {r.doc_id: r.b for r in probe.collect()}
    variant_id = next(i for i in range(1, 9) if buckets[i] != buckets[0])
    variant = base + f" tail{variant_id}"

    docs = spark.createDataFrame(
        [(1, base), (2, variant), (3, "an entirely unrelated document "
                                      "about spark physical planning")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in leakage_safe_split(docs).collect()}
    assert set(out) == {1, 2, 3}
    # the pair clusters: both ride doc 1's text hash => same split
    assert out[1].rep_id == 1 and out[2].rep_id == 1
    assert out[1].bucket == out[2].bucket
    assert out[1].split == out[2].split
    # per-doc hashing WOULD have separated them (the leak this closes)
    assert buckets[0] != buckets[variant_id]
    # singleton: its own representative, its own content hash
    assert out[3].rep_id == 3


def test_leakage_split_property_random_corpora(spark):
    """Property sweep over seeded-random corpora with planted near-dup
    families: (1) every Jaccard pair shares a split; (2) the family
    respects the representative's bucket; (3) buckets stay in [0,100)
    and the three split labels partition them."""
    import random

    from dex_data_ingestor_spark.operators.corpus import leakage_safe_split
    from dex_data_ingestor_spark.operators.neardup import (
        ngram_jaccard_pairs,
    )

    for seed in (11, 37):
        rng = random.Random(seed)
        rows = []
        doc_id = 0
        for fam in range(6):
            base_words = [f"s{seed}f{fam}w{i}" for i in range(12)]
            members = rng.randint(1, 3)
            for m in range(members):
                words = list(base_words)
                if m:  # near-dup: perturb one tail word
                    words[-1] = f"alt{m}"
                rows.append((doc_id, " ".join(words)))
                doc_id += 1
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in leakage_safe_split(df).collect()}
        assert set(out) == {r[0] for r in rows}
        pairs = ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.5).collect()
        for p in pairs:
            assert out[p.a_id].split == out[p.b_id].split, (seed, p)
            assert out[p.a_id].bucket == out[p.b_id].bucket
        for r in out.values():
            assert 0 <= r.bucket < 100
            assert r.split in ("train", "val", "test")
