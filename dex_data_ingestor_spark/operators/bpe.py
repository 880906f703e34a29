"""Byte-pair-encoding tokenizer training and application.

The tokenizer-training step of an LLM data pipeline, Spark-first:

- ``word_frequencies``: ONE corpus-wide shuffle folds the (possibly
  100 TB) text into a word -> count table. Everything after operates
  on that vocabulary-sized table — the classic BPE observation that
  merge learning needs word SHAPES and their counts, not the corpus.
- ``learn_bpe_merges``: the canonical iterative loop (Sennrich et al.
  2016, "Neural Machine Translation of Rare Words with Subword
  Units"): per round, count adjacent symbol pairs weighted by word
  frequency, take the most frequent pair, fuse it inside every word's
  symbol array. Each round is a small job over the vocab table
  (explode pairs -> groupBy -> take 1 -> transform arrays); the only
  driver state is the learned merge list itself — O(n_merges), model
  state like the IVF centroids, never data.
- ``apply_bpe``: encode a document column with a learned merge list —
  a single narrow pass (no shuffle): split to words, split words to
  symbols, replay the merges in learned order via HOF array fusion.

Determinism: pair selection tie-breaks by (count DESC, left symbol,
right symbol), so the learned vocabulary is byte-reproducible across
runs and partitionings — the same auditability bar as the dedup
survivor rules. No SQL oracle exists for the LOOP (iterative
algorithms are the driver contract's rows-only category), but the
end state is pinned by golden tests on corpora with hand-derivable
merge sequences.

Scale notes: rounds are sequential by nature (each merge depends on
the last), which is why production tokenizers train on a SAMPLE of
the corpus; ``word_frequencies`` accepts any pre-sampled frame.
``merge_batch`` amortizes the per-round job cost by accepting up to
k symbol-disjoint merges from one ranking (interfering pairs skip to
the next recount) — k=1 stays exact classic BPE. Each
round localCheckpoints the vocab table (the graph.py iterative
pattern) so analysis cost stays constant and no recompute can replay
the whole merge chain. Encoding auto-switches engines: small merge
lists stay pure-expression (codegen); realistic vocabularies
(hundreds+ merges) use an Arrow-batched pandas UDF, because stacking
one HOF layer per merge grows the expression tree linearly until the
analyzer/codegen breaks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from dex_data_ingestor_spark.functions.scalars import WS

#: End-of-word sentinel (classic BPE): lets merges distinguish "est"
#: inside a word from "est" at the end. Chosen outside the split
#: alphabet of any whitespace tokenization.
EOW = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """``(word, freq)`` over the corpus — the ONE corpus-sized shuffle
    of BPE training (map-side partial counts fold most of it before
    the exchange)."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    w = F.explode(F.split(F.trim(t), WS)).alias("word")
    return (
        df.select(w)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """A word's initial symbol array: its characters plus the
    end-of-word sentinel."""
    return F.concat(
        F.split(word, ""), F.array(F.lit(EOW))
    )


def _fuse_pair(symbols: Column, left: str, right: str) -> Column:
    """Replace every adjacent (left, right) in ``symbols`` with the
    fused symbol, left-to-right non-overlapping (the BPE rule:
    ``a a a`` under merge (a,a) -> ``aa a``). Pure HOF fold — no
    Python, no explode: the accumulator array is rebuilt element by
    element, skipping a right symbol that was just consumed."""
    fused = left + right
    # F.get (0-based, NULL out of bounds) not element_at: ANSI mode
    # throws on out-of-range element_at and CaseWhen branches are not
    # reliably lazy, so the empty-accumulator first step must be
    # NULL-safe, and slice lengths clamped non-negative.
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
                F.array(F.lit(fused)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe_merges(
    word_freq: DataFrame,
    n_merges: int,
    min_pair_count: int = 2,
    merge_batch: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a ``(word, freq)`` table.

    Per round: explode each distinct word's adjacent symbol pairs
    weighted by the word's frequency, aggregate pair counts, pick the
    (count DESC, left, right) maximum, and fuse it inside every
    word's symbol array. Stops early when no pair reaches
    ``min_pair_count``. Returns the ordered merge list — the model.

    ``merge_batch`` > 1 learns up to that many merges per Spark job
    (the standard batched variant that makes production vocab sizes
    tractable — 50k merges at k=1 is 50k sequential jobs): the round's
    top-k ranking is filtered greedily, accepting a pair only if its
    symbols (and its fused output symbol) are disjoint from every
    pair already accepted this round; interfering pairs are SKIPPED,
    not merged — their counts are stale the moment an earlier
    acceptance fuses a shared symbol, so they wait for the next
    round's recount (the invalidation rule). k=1 is exact classic
    BPE. k>1 matches the sequential sequence whenever no pair
    CREATED by an accepted merge would outrank a later acceptance
    (guaranteed on interference-free corpora, the common case for
    natural-language tails; the golden tests pin both an exact-parity
    corpus and an interference skip).
    """
    # localCheckpoint per round (the graph.py iterative pattern):
    # truncates the lineage so round N's analysis cost is constant
    # instead of reprocessing N nested fuse layers, and a lost
    # partition can never trigger a recompute through the whole merge
    # chain. On a real cluster set a checkpoint dir and use
    # checkpoint() for fault tolerance instead.
    spark = word_freq.sparkSession
    snap = _persistent_rdd_ids(spark)
    vocab = word_freq.select(
        _initial_symbols(F.col("word")).alias("symbols"),
        F.col("freq").cast("long").alias("freq"),
    ).localCheckpoint(eager=True)
    owned = _persistent_rdd_ids(spark) - snap
    if merge_batch < 1:
        raise ValueError(f"merge_batch must be >= 1: {merge_batch}")
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pairs = vocab.select(
            F.explode(
                F.when(
                    F.size("symbols") >= 2,
                    F.zip_with(
                        F.slice(
                            F.col("symbols"),
                            1,
                            F.size("symbols") - 1,
                        ),
                        F.slice(F.col("symbols"), 2, F.size("symbols")),
                        lambda a, b: F.struct(
                            a.alias("l"), b.alias("r")
                        ),
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<l:string,r:string>>"
                ))
            ).alias("p"),
            "freq",
        )
        k = min(merge_batch, n_merges - len(merges))
        top = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.l"), F.col("p.r"))
            .limit(k)
            .collect()
        )
        # greedy symbol-disjoint acceptance down the ranking; a pair
        # touching any symbol an earlier acceptance reads OR produces
        # has a stale count after that fusion — skip it (it is
        # recounted next round), never merge on stale numbers
        accepted: list[tuple[str, str]] = []
        used: set[str] = set()
        for row in top:
            if row["n"] < min_pair_count:
                break
            left, right = row["p"]["l"], row["p"]["r"]
            if left in used or right in used:
                continue
            accepted.append((left, right))
            used.update((left, right, left + right))
        if not accepted:
            break
        merges.extend(accepted)
        fused_col = F.col("symbols")
        for left, right in accepted:
            # in-order chained fusion == applying them sequentially
            fused_col = _fuse_pair(fused_col, left, right)
        snap = _persistent_rdd_ids(spark)
        vocab = vocab.select(
            fused_col.alias("symbols"), "freq"
        ).localCheckpoint(eager=True)
        fresh = _persistent_rdd_ids(spark) - snap
        # the new checkpoint is materialized (eager) — release the
        # prior round's blocks or executor storage accumulates
        # O(n_rounds) cached vocabulary copies over a long run.
        # NOTE Dataset.unpersist() is a NO-OP for localCheckpoints
        # (it only consults the SQL CacheManager, which never sees
        # the checkpoint RDD — verified empirically), so the release
        # must happen at the RDD level via the JVM's persistent-RDD
        # registry (_release_rdds).
        _release_rdds(spark, owned)
        owned = fresh
    _release_rdds(spark, owned)
    return merges


def _persistent_rdd_ids(spark) -> set[int]:
    """Ids of currently-persisted RDDs (JVM registry). Used to track
    exactly which RDD a localCheckpoint pinned, since the Dataset
    API offers no handle to it."""
    jsc = spark.sparkContext._jsc  # noqa: SLF001
    return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}


def _release_rdds(spark, ids: set[int]) -> None:
    """Unpersist the given RDD ids (non-blocking). Snapshot-diff
    attribution: in an app running concurrent jobs, an id that
    appeared during our checkpoint window could in principle belong
    to another job — callers only pass ids captured across an
    eagerly-materialized localCheckpoint, where the window is one
    synchronous call."""
    jsc = spark.sparkContext._jsc  # noqa: SLF001
    m = jsc.getPersistentRDDs()
    for k in list(m.keySet().toArray()):
        if int(k) in ids:
            m.get(k).unpersist(False)


#: Above this many merges the expression engine's one-HOF-per-merge
#: tree risks analyzer blowup / codegen method limits — switch to the
#: pandas kernel.
MAX_EXPR_MERGES = 48


def _encode_words_python(words, merges: list[tuple[str, str]]):
    """Reference BPE encode (rank loop): repeatedly merge the
    lowest-rank adjacent pair until none applies — equivalent to
    replaying merges in learned order, which the engine-parity test
    pins against the expression path."""
    rank = {pair: i for i, pair in enumerate(merges)}
    out: list[str] = []
    for w in words:
        sym = list(w) + [EOW]
        while len(sym) > 1:
            best = None
            for i in range(len(sym) - 1):
                r = rank.get((sym[i], sym[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                break
            left, right = merges[best[0]]
            fused, j, merged = left + right, 0, []
            while j < len(sym):
                if (
                    j + 1 < len(sym)
                    and sym[j] == left
                    and sym[j + 1] == right
                ):
                    merged.append(fused)
                    j += 2
                else:
                    merged.append(sym[j])
                    j += 1
            sym = merged
        out.extend(sym)
    return out


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
    engine: str = "auto",
) -> DataFrame:
    """Encode ``text_col`` with a learned merge list: one NARROW pass
    (zero shuffles) producing an ``array<string>`` token column.

    ``engine='expr'``: words split to characters + end-of-word
    sentinel, merges replayed in learned order via per-word HOF folds
    — pure JVM, right for SMALL merge lists. ``engine='pandas'``: an
    Arrow-batched pandas UDF runs the classic rank-loop encoder —
    right for realistic vocabularies, where stacking one HOF layer
    per merge would grow the expression tree linearly until analysis
    or codegen breaks. ``'auto'`` switches at MAX_EXPR_MERGES; the
    two engines are parity-tested against each other."""
    if engine == "auto":
        engine = "expr" if len(merges) <= MAX_EXPR_MERGES else "pandas"
    if engine not in ("expr", "pandas"):
        raise ValueError(f"unknown engine {engine!r}")
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    if engine == "pandas":
        from pyspark.sql import types as T
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(T.ArrayType(T.StringType()))
        def _encode(texts):
            import re

            import pandas as pd

            # the shared explicit whitespace class (scalars.WS —
            # \x0B excluded: RE2 \s never matched it and the
            # expression path now uses the same class); Python
            # str.split() would break on ALL Unicode whitespace
            # (U+00A0, U+2028, ...), silently changing tokenization
            # the moment 'auto' crosses MAX_EXPR_MERGES. Match the
            # expression path (and word_frequencies) exactly.
            ascii_ws = re.compile(r"[ \t\n\f\r]+")
            return pd.Series(
                [
                    _encode_words_python(
                        [w for w in ascii_ws.split(s or "") if w],
                        merges,
                    )
                    for s in texts
                ]
            )

        return df.withColumn(out_col, _encode(t))
    words = F.filter(F.split(F.trim(t), WS), lambda w: w != "")
    # project the word array first (HOF lambdas re-evaluate argument
    # expressions per element — the r2 shingle lesson)
    out = df.withColumn("__words", words)
    sym = F.transform(F.col("__words"), lambda w: _initial_symbols(w))
    out = out.withColumn("__sym", sym)
    enc = F.col("__sym")

    # closure FACTORY, not a default-arg lambda: PySpark infers HOF
    # arity from the lambda signature, so `lambda s, lr=(l, r)` would
    # be treated as the binary (element, index) form and bind lr to
    # the INT index column
    def _fuser(left: str, right: str):
        return lambda s: _fuse_pair(s, left, right)

    for left, right in merges:
        enc = F.transform(enc, _fuser(left, right))
    return (
        out.withColumn(out_col, F.flatten(enc))
        .drop("__words", "__sym")
    )
