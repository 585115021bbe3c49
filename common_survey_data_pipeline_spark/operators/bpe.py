"""Distributed BPE tokenizer training and corpus encoding.

Byte-pair-encoding training (Sennrich et al. 2016, the algorithm behind
GPT-2/RoBERTa vocabularies) is the canonical *iterate-until-K* corpus
job: count adjacent symbol pairs, merge the most frequent pair
everywhere, repeat. The key production insight (shared by the original
subword-nmt code and HF tokenizers) is that training never needs the
corpus after one pass — it operates on the **word-frequency table**
(``word → count``), which is vocabulary-sized, so the per-iteration
work is a map + one pair-keyed aggregation over the vocab, not a corpus
scan.

Spark shape (the ``pagerank`` iterate-with-lineage-cut pattern,
``operators/graph.py:180-200``):

- ONE corpus pass builds the word-frequency table (hash groupBy,
  map-side combinable).
- Each of the K iterations is one narrow map (pair extraction) + one
  pair-keyed aggregation + a driver-side ``take(1)`` of the argmax pair
  (a 1-row ``TakeOrderedAndProject`` — bounded by construction), then a
  narrow map applying the merge. ``localCheckpoint`` cuts lineage every
  iteration so plan depth stays O(1), exactly like pagerank.
- Encoding with a learned merge list is a SINGLE narrow map over the
  corpus: the K merges fold into one nested ``replace`` expression
  evaluated inside whole-stage codegen — no UDF, no shuffle, no
  iteration at encode time.

Symbol-sequence representation: a word's working split is the string
``"|s1||s2||...||sn|"`` — every symbol owns BOTH its delimiters, so
applying merge ``(a, b)`` is the literal replace
``"|a||b|" → "|ab|"``. Because adjacent pair occurrences share no
characters under this encoding, engine-standard left-to-right
non-overlapping ``replace`` implements exactly BPE's greedy leftmost
merge application, and the same SQL runs verbatim in the DuckDB oracle
(``workload.py::_bpe_oracle_ctes`` chains one materialized CTE triple
per iteration). ``|`` is safe as a delimiter for whitespace-tokenized
words (tokens contain no ``|``; a defensive filter drops any that do).

Pair counting follows the reference implementations: adjacency counts
are *overlapping* (``zip(word, word[1:])`` — "aaa" counts ("a","a")
twice) while application is greedy non-overlapping; ties on count break
lexicographically on (w1, w2), making the merge list a pure function of
the corpus (hash-stable across engines and partitionings).

100 TB shape: the corpus is read once; the vocab table (≤ ~10⁸ rows for
web-scale text) lives distributed across the K iterations; per
iteration only one 1-row argmax crosses to the driver. Training is
DELTA-MAINTAINED (VERDICT r8 item 3): the pair-count table persists
across iterations, and each merge recounts pairs only for the words
that CONTAIN the merged pair — subtract those words' old pair counts,
add their new ones, fold the signed delta into the table. Per
iteration that leaves one narrow contains-scan over the vocab (to find
affected words), a pair explode+agg over AFFECTED words only (the term
that dominated the recount loop, now proportional to affected-word
volume), and a pair-table-sized merge — never a full-vocab explode.
:func:`_train_recount` keeps the naive one-agg-per-round loop as the
property-test twin (delta ≡ recount on adversarial corpora,
``tests/test_bpe.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.functions import text as T

__all__ = [
    "bpe_train",
    "bpe_train_to_vocab",
    "bpe_merges_df",
    "bpe_encoded_token_freqs",
    "bpe_encode",
    "write_tokenizer",
    "read_tokenizer",
]

MERGE_SCHEMA = "step int, w1 string, w2 string, n bigint"


def _word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """word → occurrence count, the only corpus-sized pass in training."""
    return (
        docs.select(F.explode(T.tokens(F.col(text_col))).alias("w"))
        .where(~F.col("w").contains("|"))  # delimiter-safety guard
        .groupBy("w")
        .agg(F.sum(F.lit(1)).cast("long").alias("freq"))
    )


def _initial_seq(word: Column) -> Column:
    """``"abc"`` → ``"|a||b||c|"`` — each character a delimited symbol."""
    return F.regexp_replace(word, "(.)", "|$1|")


def _seq_symbols(seq: Column) -> Column:
    """Parse ``"|a||bc|"`` back to ``["a", "bc"]``."""
    return F.split(seq.substr(F.lit(2), F.length(seq) - 2), r"\|\|")


def _pair_counts(vocab: DataFrame, sign: int = 1) -> DataFrame:
    """Adjacent-pair counts ``(w1, w2, n)`` of a ``(seq, freq)`` frame —
    overlapping adjacency (the reference-implementation convention),
    weighted by word frequency. ``sign=-1`` emits negated counts, the
    subtraction half of a delta."""
    syms = _seq_symbols(F.col("seq"))
    return (
        vocab.select(
            F.explode(
                F.when(
                    F.size(syms) >= 2,
                    F.zip_with(
                        F.slice(syms, 1, F.size(syms) - 1),
                        F.slice(syms, 2, F.size(syms) - 1),
                        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<w1:string,w2:string>>")
                )
            ).alias("p"),
            "freq",
        )
        .groupBy("p.w1", "p.w2")
        .agg((F.lit(sign) * F.sum("freq")).alias("n"))
    )


def _apply_merge(vocab: DataFrame, w1: str, w2: str) -> DataFrame:
    """One merge as the literal delimited replace (see module doc)."""
    return vocab.select(
        F.replace(
            F.col("seq"), F.lit(f"|{w1}||{w2}|"), F.lit(f"|{w1}{w2}|")
        ).alias("seq"),
        "freq",
    )


#: vocab size above which delta maintenance beats the full recount —
#: the `tools_scalebench.py --bpe-delta` probe puts the crossover
#: between 50k (tie) and 200k (delta wins) noise words; below it the
#: full-vocab explode is cheap and the delta's per-round pair-table
#: merge + checkpoint write costs more than it saves (measured ~1.8×
#: at the sf0.1 bench vocab). Since round 10 the same threshold also
#: gates the DRIVER regime: below it the word-frequency table is a
#: model-sized artifact (≤100k rows × ~16 B ≈ 2 MB — the same bounded-
#: by-construction class as the PQ ``train_cap`` codebook samples), so
#: ``auto`` collects it ONCE and runs the per-merge loop in local
#: Python instead of paying K Spark job round-trips on vocab-sized
#: data (guide §1.2: fix the distributed algorithm before the
#: per-task work — here the ideal plan has ONE distributed pass,
#: the corpus word count, and the K-iteration loop is pure
#: model-sized bookkeeping).
DELTA_MIN_VOCAB = 100_000


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 32,
    strategy: str = "auto",
) -> list[tuple[int, str, str, int]]:
    """Train ``k`` BPE merges on the corpus; returns the ordered merge
    list ``[(step, w1, w2, pair_freq), ...]`` (1-indexed steps). Stops
    early if the vocabulary runs out of adjacent pairs (every word
    fully merged) — the returned list is then shorter than ``k``.

    ``strategy``: ``"driver"`` collects the (bounded) word-frequency
    table once and runs the merge loop in local Python with
    incrementally maintained pair counts (:func:`_train_driver` — the
    subword-nmt shape; ONE distributed pass total, zero per-iteration
    Spark jobs); ``"recount"`` re-aggregates all pairs from the whole
    vocab every round (one full-vocab explode + hash agg per round,
    exactly one job via the lazy checkpoint — the oracle/property
    twin); ``"delta"`` maintains the pair table across rounds
    (:func:`_train_delta` — the at-scale plan, per-round cost tracks
    AFFECTED words, not vocab size); ``"auto"`` (default) counts the
    word vocabulary once and picks driver below ``DELTA_MIN_VOCAB``
    and delta at/above it — the cost-based-dispatch pattern of
    ``embedding_neardup_pairs(strategy="auto")``. All paths produce
    the identical merge list (property-pinned driver ≡ delta ≡
    recount on adversarial and random corpora).

    The merge list is small by construction (k rows) — it is the
    *model*, pulled to the driver the way any trained artifact is.
    """
    if k < 1:
        raise ValueError(f"bpe_train: k must be >= 1, got {k}")
    if strategy not in ("auto", "driver", "delta", "recount"):
        raise ValueError(
            f"bpe_train: unknown strategy {strategy!r} "
            "(expected auto | driver | delta | recount)"
        )
    vocab = (
        _word_freqs(docs, text_col)
        .select(_initial_seq(F.col("w")).alias("seq"), "freq")
        .localCheckpoint(eager=False)
    )
    if strategy == "auto":
        # one count on the (lazily checkpointed) vocab — it doubles as
        # the checkpoint's materialization, so round 1 reads it warm
        strategy = (
            "delta" if vocab.count() >= DELTA_MIN_VOCAB else "driver"
        )
    if strategy == "delta":
        return _train_delta(vocab, k)
    if strategy == "driver":
        return _train_driver(vocab, k)
    return _train_recount(vocab, k)


def bpe_train_to_vocab(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1024,
    min_freq: int = 1,
    strategy: str = "auto",
    max_merges: int = 1_000_000,
) -> list[tuple[int, str, str, int]]:
    """Train BPE merges until the TOKEN VOCABULARY reaches
    ``vocab_size`` — the way real tokenizer specs are written (GPT-2:
    50,257 tokens; not "N merges") — with a ``min_freq`` floor
    (training stops at the first best pair rarer than it, the
    subword-nmt ``--min-frequency`` contract). VERDICT r9 item 5.

    Vocabulary accounting (the HF-trainers convention): |vocab| =
    |initial alphabet| + |distinct merge-output tokens|. The alphabet
    is the distinct single-character symbols of the initial
    word-frequency table — ONE count over the vocab-sized table, never
    a second corpus pass — and each merge contributes its output
    ``w1+w2`` to a driver-side set (merge outputs are ≥ 2 chars, so
    they never collide with the alphabet; two different merges CAN
    produce the same token — ("a","bc") and ("ab","c") — hence a set,
    not a counter). Training stops AFTER recording the merge that
    reaches the target.

    Merge selection, delta maintenance, tie-breaks, and the
    ``strategy`` dispatch are exactly :func:`bpe_train`'s — the merge
    list this returns is a prefix of what ``bpe_train(k=∞)`` would
    produce, property-pinned delta ≡ recount in ``tests/test_bpe.py``,
    and the k-mode path is untouched. ``max_merges`` is a runaway
    backstop for targets the corpus cannot reach (alphabet already ≥
    ``vocab_size`` returns zero merges)."""
    if vocab_size < 1:
        raise ValueError(
            f"bpe_train_to_vocab: vocab_size must be >= 1, got {vocab_size}"
        )
    if min_freq < 1:
        raise ValueError(
            f"bpe_train_to_vocab: min_freq must be >= 1, got {min_freq}"
        )
    if strategy not in ("auto", "driver", "delta", "recount"):
        raise ValueError(
            f"bpe_train_to_vocab: unknown strategy {strategy!r} "
            "(expected auto | driver | delta | recount)"
        )
    vocab = (
        _word_freqs(docs, text_col)
        .select(_initial_seq(F.col("w")).alias("seq"), "freq")
        .localCheckpoint(eager=False)
    )
    n_words = vocab.count()  # materializes the checkpoint (as in bpe_train)
    alpha = (
        vocab.select(F.explode(_seq_symbols(F.col("seq"))).alias("s"))
        .agg(F.count_distinct("s").alias("a"))
        .first()["a"]
    )
    if alpha >= vocab_size:
        return []
    if strategy == "auto":
        strategy = "delta" if n_words >= DELTA_MIN_VOCAB else "driver"
    new_tokens: set[str] = set()

    def reached(merges: list[tuple[int, str, str, int]]) -> bool:
        _, w1, w2, _ = merges[-1]
        new_tokens.add(w1 + w2)
        return alpha + len(new_tokens) >= vocab_size

    train = {
        "delta": _train_delta,
        "driver": _train_driver,
        "recount": _train_recount,
    }[strategy]
    return train(vocab, max_merges, min_freq=min_freq, stop=reached)


def _train_delta(
    vocab: DataFrame, k: int, min_freq: int = 1, stop=None
) -> list[tuple[int, str, str, int]]:
    """DELTA-MAINTAINED pair counts: the pair table is built once from
    the initial vocab, then per merge only the words CONTAINING the
    merged pair are recounted — their old pairs subtracted, their new
    pairs added, the signed delta folded in and zero rows dropped.
    Recounting affected words wholesale (old seq vs new seq) sidesteps
    every classic incremental-adjacency bug (overlapping "aaa" runs,
    merges at word edges): the delta is exact by construction, and
    :func:`_train_recount` pins delta ≡ recount in the property tests.

    Per iteration: ONE job — the 1-row argmax ``take(1)`` over the
    maintained pair table, whose lazy ``localCheckpoint`` materializes
    as a side effect. Inside that job: two narrow ``contains`` scans
    of the checkpointed vocab (the affected frame feeds both delta
    halves), a pair explode+agg over affected words ONLY, and a
    pair-table merge (union + sum + drop zeros). The full-vocab
    explode that dominates the recount loop is gone; lineage is cut
    every round (the pagerank pattern). Per-iteration cost tracks
    affected-word volume — `tools_scalebench.py --bpe-delta`, flat
    across 16× vocab where recount grows."""
    pairs = _pair_counts(vocab).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, k + 1):
        best = pairs.orderBy(
            F.col("n").desc(), F.col("w1"), F.col("w2")
        ).take(1)
        if not best:
            break  # vocabulary fully merged before k steps
        w1, w2, n = best[0]["w1"], best[0]["w2"], int(best[0]["n"])
        if n < min_freq:
            break  # min-frequency floor: the rare pair is NOT recorded
        merges.append((step, w1, w2, n))
        if stop is not None and stop(merges):
            break  # target reached; the reaching merge IS recorded
        # delta: recount ONLY the words containing the merged pair
        affected = vocab.where(F.col("seq").contains(f"|{w1}||{w2}|"))
        delta = _pair_counts(affected, sign=-1).unionByName(
            _pair_counts(_apply_merge(affected, w1, w2))
        )
        pairs = (
            pairs.unionByName(delta)
            .groupBy("w1", "w2")
            .agg(F.sum("n").alias("n"))
            .where(F.col("n") > 0)
            .localCheckpoint(eager=False)
        )
        vocab = _apply_merge(vocab, w1, w2).localCheckpoint(eager=False)
    return merges


def _train_driver(
    vocab: DataFrame, k: int, min_freq: int = 1, stop=None
) -> list[tuple[int, str, str, int]]:
    """BOUNDED-VOCAB training loop: collect the word-frequency table
    once (its size is pre-checked against ``DELTA_MIN_VOCAB`` by the
    ``auto`` dispatch — a model-sized artifact, not a corpus pull) and
    run the per-merge loop in local Python with incrementally
    maintained pair counts — the subword-nmt/HF-trainers shape. The
    distributed loops pay one Spark job PER MERGE on vocab-sized data
    (32 merges = 32 scheduler round-trips dominating wall-clock when
    the vocab is ~10⁴ rows, guide §1.2); here the only cluster work is
    the corpus word count that built ``vocab``.

    Exactness contract (property-pinned driver ≡ recount ≡ delta):

    * pair counts are overlapping adjacency weighted by word freq —
      identical to :func:`_pair_counts`;
    * argmax order is (n DESC, w1 ASC, w2 ASC); Python's per-codepoint
      string comparison equals Spark's UTF8String binary order because
      UTF-8 byte order preserves codepoint order;
    * merge application is greedy leftmost non-overlapping — the tuple
      scan below is exactly the ``"|w1||w2|" → "|w1w2|"`` string
      replace (symbols are '|'-free, so matches never span symbol
      boundaries);
    * per-merge maintenance recounts AFFECTED words wholesale (old
      pair multiset out, new in — the `_train_delta` trick, immune to
      the classic overlapping-run/edge-merge adjacency bugs);
    * argmax uses a lazy max-heap (stale entries re-keyed or dropped
      at pop time; every live pair always has an entry carrying its
      current count) so per-iteration cost tracks affected volume.
    """
    import heapq
    from collections import Counter

    words: list[tuple[list[str], int]] = []
    for row in vocab.select("seq", "freq").collect():
        seq = row["seq"]
        words.append((seq[1:-1].split("||"), int(row["freq"])))

    counts: Counter = Counter()
    occ: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, freq) in enumerate(words):
        for p in zip(syms, syms[1:]):
            counts[p] += freq
            occ.setdefault(p, set()).add(wi)

    heap = [(-n, w1, w2) for (w1, w2), n in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, k + 1):
        best = None
        while heap:
            negn, w1, w2 = heap[0]
            live = counts.get((w1, w2), 0)
            if live <= 0:
                heapq.heappop(heap)
            elif -negn != live:
                # stale-high entry: re-key in place with the live count
                heapq.heapreplace(heap, (-live, w1, w2))
            else:
                best = (w1, w2, live)
                break
        if best is None:
            break  # vocabulary fully merged before k steps
        w1, w2, n = best
        if n < min_freq:
            break  # min-frequency floor: the rare pair is NOT recorded
        merges.append((step, w1, w2, n))
        if stop is not None and stop(merges):
            break  # target reached; the reaching merge IS recorded
        merged = w1 + w2
        for wi in occ.get((w1, w2), set()).copy():
            syms, freq = words[wi]
            old = Counter(zip(syms, syms[1:]))
            new_syms: list[str] = []
            i, length = 0, len(syms)
            while i < length:
                if i < length - 1 and syms[i] == w1 and syms[i + 1] == w2:
                    new_syms.append(merged)
                    i += 2
                else:
                    new_syms.append(syms[i])
                    i += 1
            words[wi] = (new_syms, freq)
            new = Counter(zip(new_syms, new_syms[1:]))
            for p in set(old) | set(new):
                d = new[p] - old[p]
                if d == 0:
                    continue
                counts[p] += d * freq
                if counts[p] <= 0:
                    del counts[p]
                else:
                    heapq.heappush(heap, (-counts[p], p[0], p[1]))
                if new[p] == 0:
                    s = occ.get(p)
                    if s is not None:
                        s.discard(wi)
                elif old[p] == 0:
                    occ.setdefault(p, set()).add(wi)
    return merges


def _train_recount(
    vocab: DataFrame, k: int, min_freq: int = 1, stop=None
) -> list[tuple[int, str, str, int]]:
    """The small-vocab training loop — re-aggregate ALL pairs from the
    whole vocab every iteration (one full-vocab explode + hash agg per
    round, each round exactly one job via the lazy checkpoint). The
    delta path's property-test twin and the auto strategy's
    below-crossover choice; output contract identical to
    :func:`_train_delta` (including the ``min_freq`` floor and the
    ``stop`` predicate)."""
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, k + 1):
        best = _pair_counts(vocab).orderBy(
            F.col("n").desc(), F.col("w1"), F.col("w2")
        ).take(1)
        if not best:
            break
        w1, w2, n = best[0]["w1"], best[0]["w2"], int(best[0]["n"])
        if n < min_freq:
            break
        merges.append((step, w1, w2, n))
        if stop is not None and stop(merges):
            break
        vocab = _apply_merge(vocab, w1, w2).localCheckpoint(eager=False)
    return merges


def bpe_merges_df(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    k: int = 32,
) -> DataFrame:
    """:func:`bpe_train` exported as a DataFrame (the driver-contract
    form): one row per learned merge, ordered by ``step``."""
    return spark.createDataFrame(
        bpe_train(docs, text_col, k), MERGE_SCHEMA
    )


def _fold_merges(seq: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Apply a learned merge list IN ORDER as one nested literal-replace
    expression — a single whole-stage-codegen map, no UDF, no loop at
    execution time."""
    for _, w1, w2, _ in merges:
        seq = F.replace(seq, F.lit(f"|{w1}||{w2}|"), F.lit(f"|{w1}{w2}|"))
    return seq


def bpe_encoded_token_freqs(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Encode the corpus under a learned merge list and return the
    resulting token-frequency table ``(token, n)`` — the distributional
    summary data teams inspect after tokenizer training (and the form
    with an exact SQL oracle). Runs on the word-frequency table, so the
    corpus is touched once and the K merges apply as ONE narrow map
    over vocabulary-sized data."""
    wf = _word_freqs(docs, text_col)
    enc = wf.select(
        _fold_merges(_initial_seq(F.col("w")), merges).alias("seq"), "freq"
    )
    return (
        enc.select(F.explode(_seq_symbols(F.col("seq"))).alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").alias("n"))
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Per-row corpus encoding: adds ``out_col`` = the document's BPE
    token sequence (``array<string>``, word-internal merges only, word
    boundaries preserved — the subword-nmt contract). One narrow map:
    whitespace-tokenize, run every word through the folded merge
    replaces, re-split, flatten. No UDF, no shuffle — encode is
    embarrassingly parallel at any corpus size."""
    words = T.tokens(F.col(text_col))
    encoded_word = lambda w: _seq_symbols(_fold_merges(_initial_seq(w), merges))  # noqa: E731
    return df.withColumn(
        out_col,
        F.flatten(
            F.transform(
                F.filter(words, lambda w: ~w.contains("|")),
                encoded_word,
            )
        ),
    )


def write_tokenizer(spark: SparkSession, merges: list[tuple[int, str, str, int]], table: str) -> None:
    """Persist a trained merge list as a catalog table — the tokenizer
    IS its ordered merge list, so this is the whole artifact (the
    band-table / IVF-index lifecycle pattern: train once, encode
    forever). The merge count lands in table properties for quick
    provenance checks."""
    spark.createDataFrame(merges, MERGE_SCHEMA).write.mode(
        "overwrite"
    ).saveAsTable(table)
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ('bpe.k'='{len(merges)}')"
    )


def read_tokenizer(spark: SparkSession, table: str) -> list[tuple[int, str, str, int]]:
    """Load a persisted merge list in training order. Merge ORDER is
    load-bearing (later merges consume earlier merges' outputs), so
    the read sorts by step and the k-rows property is validated —
    a truncated artifact must fail loudly, not encode differently."""
    rows = spark.table(table).orderBy("step").collect()
    merges = [(r["step"], r["w1"], r["w2"], int(r["n"])) for r in rows]
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }
    stored_k = props.get("bpe.k")
    if stored_k is not None and int(stored_k) != len(merges):
        raise ValueError(
            f"tokenizer table {table!r} claims {stored_k} merges but "
            f"holds {len(merges)} rows — truncated or corrupted artifact"
        )
    if [m[0] for m in merges] != list(range(1, len(merges) + 1)):
        raise ValueError(
            f"tokenizer table {table!r} has non-contiguous merge steps — "
            "the merge list is ordered and dense by construction"
        )
    return merges
