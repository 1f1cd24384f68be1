"""Ranked full-text search over the document corpus — the engine-native
replacement for the reference's Meilisearch query path.

The reference's most user-visible query is a typo-tolerant RANKED top-10
search with conjunctive tenant filters
(``/root/reference/apps/web/app/api/search/route.ts:23-40``: Meili
``index.search(query, {limit: 10, filter})`` with ``userId = X`` /
``organizationId = Y`` filter clauses; the index document shape is built at
``apps/web/lib/server/pdf.ts:147-184``). Round 2 shipped the index
*projection* (K8) and keyword *matching* (T3) but no relevance scoring;
this module closes that gap with two operators:

* ``ranked_search`` — multi-term BM25 top-10 per query with a deterministic
  tie-break and conjunctive (source, lang) tenant filters standing in for
  the route's (userId, organizationId) pair. BM25 is closed-form
  arithmetic, so the whole operator is built-in DataFrame ops (no Python on
  the hot path) and the DuckDB oracle recomputes every score independently.
* ``fuzzy_search`` — Meili's default typo tolerance (edit distance 1),
  implemented symspell-style: deletion-neighborhood keys bucket the
  dictionary so candidate generation is an equi-join (never a cross join),
  then an exact Levenshtein verify. The oracle brute-forces Levenshtein
  over the full vocabulary, so the neighborhood construction is checked for
  completeness, not just precision.

Scale shape (100 TB corpus): the token-frequency table (postings) is the
explode+groupBy product a real index build materializes once; document
frequency and per-term IDF are vocabulary-sized aggregates broadcast into
the postings join, so scoring is map-side arithmetic and only (query, doc)
survivors reach the top-k window (WindowGroupLimit prunes per partition).
The symspell key table is ~(1 + word_len) rows per vocabulary word —
vocabulary-sized, not corpus-sized — and the query side is tiny, so the
candidate join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from janet_spark.queries_relational import t

_BM25_K1 = 1.2
_BM25_B = 0.75
_TOP_K = 10

# (q_id, query text, source filter, lang filter) — the conjunctive filter
# pair mirrors route.ts's userId/orgId clauses: a hit must satisfy BOTH.
_SEARCH_QUERIES = [
    (1, "merge sort algorithm", "src7", "en"),
    (2, "spark data pipeline", "src18", "en"),
    (3, "the table scan query", "src6", "en"),
]

_TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(col: F.Column) -> F.Column:
    """Lowercased alnum tokens; split artifacts ('' at boundaries) removed."""
    return F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), _TOKEN_SPLIT),
        lambda x: x != "",
    )


def _queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _SEARCH_QUERIES, "q_id int, q_text string, f_source string, f_lang string"
    )


def _index_relations(docs: DataFrame):
    """The three shared index relations every search-family operator is
    built from — postings tf(doc, term, tf), doc lengths dl(doc, dl), and
    doc frequency df(term, df) — plus corpus stats. In a production index
    build these materialize ONCE as bucketed tables (DEPLOYMENT.md); here
    the postings frame persists because three consumers (dl, df, the
    scoring join) would otherwise each re-run the corpus explode+groupBy.
    dl is derived from the postings (sum of per-term counts == token
    count), not from a second pass over the exploded tokens."""
    toks = docs.select(
        "doc_id", "source", "lang", F.explode(_tokens(F.col("text"))).alias("tok")
    )
    # source/lang ride along (functionally dependent on doc_id) so the
    # tenant filter needs no extra join against the docs table
    tf = toks.groupBy("doc_id", "source", "lang", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return tf, dl, stats, df_t


def _bm25_topk(
    tf: DataFrame, dl: DataFrame, term_idf: DataFrame, top_k: int = _TOP_K
) -> DataFrame:
    """Shared BM25 scoring tail: broadcast the (tiny) per-(query, term) idf
    table into the corpus-sized postings, sum per-doc contributions, and
    WindowGroupLimit the top-10. `term_idf` columns:
    (q_id, f_source, f_lang, tok, idf, avgdl). Explicit aliases because
    term_idf usually descends from the same postings lineage as tf (the
    vocabulary is derived from it), which would otherwise make the join
    columns ambiguous self-references."""
    p = tf.alias("__p")
    ti = term_idf.alias("__ti")
    matched = p.join(
        F.broadcast(ti),
        (F.col("__p.tok") == F.col("__ti.tok"))
        & (F.col("__p.source") == F.col("__ti.f_source"))
        & (F.col("__p.lang") == F.col("__ti.f_lang")),
    ).select("q_id", "doc_id", "tf", "idf", "avgdl")
    # dl joins AFTER the term match pruned the doc set: AQE sees the small
    # matched side and broadcasts it, so the corpus-sized dl never shuffles
    contrib = matched.join(dl, "doc_id").withColumn(
        "contrib",
        F.col("idf")
        * F.col("tf")
        * (_BM25_K1 + 1)
        / (
            F.col("tf")
            + _BM25_K1 * ((1 - _BM25_B) + _BM25_B * F.col("dl") / F.col("avgdl"))
        ),
    )
    scored = contrib.groupBy("q_id", "doc_id").agg(
        F.round(F.sum("contrib"), 4).alias("score")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("q_id", "rank", "doc_id", "score")
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------------------
# the parameterized facade (round-4 verdict "What's missing" #1): arbitrary
# user queries, not module constants. The four registered queries below are
# fixtures of this function.
# ---------------------------------------------------------------------------

_EXPANSION_DAMP = 0.5  # score multiplier per expansion step (typo OR prefix)


def _query_terms(queries: DataFrame) -> DataFrame:
    """(q_id, f_source, f_lang, term, is_last): distinct query terms
    tagged with whether the term is the LAST token of its query text
    ("sort sort" keeps is_last=1 via max) — prefix expansion applies to
    the last term only, Meili's search-as-you-type rule."""
    toks = queries.select(
        "q_id",
        "f_source",
        "f_lang",
        F.size(_tokens(F.col("q_text"))).alias("n"),
        F.posexplode(_tokens(F.col("q_text"))).alias("j", "term"),
    )
    return toks.groupBy("q_id", "f_source", "f_lang", "term").agg(
        F.max((F.col("j") == F.col("n") - 1).cast("int")).alias("is_last")
    )


_EXP_COLS = ["q_id", "f_source", "f_lang", "tok", "dist", "df"]


def _exact_expansion(terms: DataFrame, df_t: DataFrame) -> DataFrame:
    """term = vocabulary word, dist 0. The tiny term table broadcasts
    into the vocabulary-sized df join."""
    return df_t.join(
        F.broadcast(terms), F.col("tok") == F.col("term")
    ).select("q_id", "f_source", "f_lang", "tok", F.lit(0).alias("dist"), "df")


def _typo_expansion(terms: DataFrame, df_t: DataFrame) -> DataFrame:
    """symspell edit-distance-1: vocabulary and terms explode to their
    deletion-neighborhood keys, candidates come from the key EQUI-join
    (never a cross join or LIKE scan against the vocabulary), and exact
    Levenshtein verifies (deletion keys overgenerate). dist ∈ {0, 1} —
    the word's own key set includes itself, so exact hits surface here
    too and a separate exact branch is unnecessary."""
    term_keys = terms.select(
        "q_id",
        "f_source",
        "f_lang",
        "term",
        F.explode(F.expr(_DELETES_EXPR.format(w="term"))).alias("key"),
    )
    vocab_keys = df_t.select(
        "tok", "df", F.explode(F.expr(_DELETES_EXPR.format(w="tok"))).alias("key")
    )
    return (
        vocab_keys.join(F.broadcast(term_keys), "key")
        .select("q_id", "f_source", "f_lang", "term", "tok", "df")
        .distinct()
        .withColumn("dist", F.levenshtein("term", "tok"))
        .filter(F.col("dist") <= 1)
        .select(*_EXP_COLS)
    )


def _prefix_expansion(terms: DataFrame, df_t: DataFrame) -> DataFrame:
    """search-as-you-type: every vocabulary word the LAST term properly
    prefixes, dist 1. The vocabulary explodes to (word, prefix) keys —
    vocabulary-sized × avg word length, never corpus-sized — and the
    broadcast term table equi-joins those keys (no LIKE scan)."""
    vocab_prefix = df_t.select(
        "tok", "df", F.explode(F.expr(_PREFIXES_EXPR.format(w="tok"))).alias("key")
    )
    return (
        vocab_prefix.join(
            F.broadcast(terms.filter(F.col("is_last") == 1)),
            F.col("key") == F.col("term"),
        )
        .filter(F.col("tok") != F.col("term"))  # proper prefix; exact separate
        .select("q_id", "f_source", "f_lang", "tok", F.lit(1).alias("dist"), "df")
    )


def search(
    docs: DataFrame,
    queries: DataFrame,
    *,
    typo: bool = True,
    prefix: bool = True,
    damp: float = _EXPANSION_DAMP,
    top_k: int = _TOP_K,
) -> DataFrame:
    """Ranked tenant-filtered full-text search over `docs` for ARBITRARY
    user queries — the user-facing API the reference serves per keystroke
    (apps/web/app/api/search/route.ts:23-40: Meili index.search(query,
    {limit: 10, filter}); the Playwright test types 'cobra',
    apps/web/tests/pdfs.spec.ts:32-35).

    `queries`: (q_id int, q_text string, f_source string, f_lang string)
    — one row per live query; the (f_source, f_lang) pair is the
    conjunctive tenant filter standing in for the route's
    (userId, organizationId) clauses. `typo` adds Meili's default
    edit-distance-1 tolerance on every term; `prefix` adds last-term
    prefix matching (search-as-you-type). Each matched vocabulary word
    scores BM25 with idf damped `damp`^dist (exact-before-typo/-prefix
    ranking); per (query, word) the best expansion wins (min dist).
    Returns (q_id, rank, doc_id, score) top-`top_k` per query.

    Scale shape: every expansion is a broadcast equi-join against a
    vocabulary-derived key table (deletion keys / prefix keys — each
    vocabulary-sized, never corpus-sized), the scoring tail broadcasts
    the tiny per-(query, term) idf table into the corpus-sized postings,
    and WindowGroupLimit prunes top-k per partition. In production the
    three index relations materialize once as bucketed tables
    (DEPLOYMENT.md) and every keystroke pays only the query tail."""
    tf, dl, stats, df_t = _index_relations(docs)
    terms = _query_terms(queries)
    branches = []
    if typo:
        branches.append(_typo_expansion(terms, df_t))  # includes exact (dist 0)
    else:
        branches.append(_exact_expansion(terms, df_t))
    if prefix:
        branches.append(_prefix_expansion(terms, df_t))
    expansion = branches[0]
    for b in branches[1:]:
        expansion = expansion.unionByName(b)
    expanded = expansion.groupBy("q_id", "f_source", "f_lang", "tok").agg(
        F.min("dist").alias("dist"), F.first("df").alias("df")
    )
    term_idf = expanded.crossJoin(F.broadcast(stats)).select(
        "q_id",
        "f_source",
        "f_lang",
        "tok",
        (
            F.pow(F.lit(damp), F.col("dist"))
            * F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
        ).alias("idf"),
        "avgdl",
    )
    return _bm25_topk(tf, dl, term_idf, top_k=top_k)


def search_text(
    spark: SparkSession,
    docs: DataFrame,
    q_text: str,
    f_source: str,
    f_lang: str = "en",
    **kwargs,
) -> DataFrame:
    """One-keystroke convenience over `search`: a single query string +
    tenant filter pair, exactly what the reference's route handler
    receives per request."""
    queries = spark.createDataFrame(
        [(1, q_text, f_source, f_lang)],
        "q_id int, q_text string, f_source string, f_lang string",
    )
    return search(docs, queries, **kwargs)


def q_ranked_search(spark, sf_dir):
    """BM25 top-10 per query (k1=1.2, b=0.75), idf = ln(1 + (N-df+.5)/(df+.5)).

    Index-wide statistics (N, avgdl, df) are computed over the FULL corpus
    and the tenant filter applies at query time — Meili's model (the index
    is shared; ``filter`` narrows hits, not statistics). Ties break on
    (rounded score DESC, doc_id ASC) so the ordering is engine-portable.
    Fixture of the parameterized `search` facade: exact matching only."""
    docs = t(spark, sf_dir, "documents")
    return search(docs, _queries_df(spark), typo=False, prefix=False)


def _queries_values_sql() -> str:
    rows = ", ".join(
        f"({q}, '{text}', '{src}', '{lang}')"
        for q, text, src, lang in _SEARCH_QUERIES
    )
    return f"queries(q_id, q_text, f_source, f_lang) AS (VALUES {rows})"


_DUCK_TOKENS = (
    "list_filter(regexp_split_to_array(lower(coalesce({col}, '')), "
    f"'{_TOKEN_SPLIT}'), x -> x != '')"
)

ORACLE_RANKED_SEARCH = f"""
WITH {_queries_values_sql()},
toks AS (
  SELECT doc_id, source, lang,
         unnest({_DUCK_TOKENS.format(col='text')}) AS tok
  FROM documents
),
tf AS (
  SELECT doc_id, source, lang, tok, count(*) AS tf FROM toks GROUP BY ALL
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT avg(dl) FROM dl) AS avgdl
),
dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
terms AS (
  SELECT DISTINCT q_id, f_source, f_lang,
         unnest({_DUCK_TOKENS.format(col='q_text')}) AS tok
  FROM queries
),
term_idf AS (
  SELECT t.q_id, t.f_source, t.f_lang, t.tok,
         ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf, s.avgdl
  FROM terms t JOIN dft d USING (tok) CROSS JOIN stats s
),
contrib AS (
  SELECT ti.q_id, f.doc_id,
         ti.idf * f.tf * ({_BM25_K1} + 1)
           / (f.tf + {_BM25_K1} * ((1 - {_BM25_B}) + {_BM25_B} * l.dl / ti.avgdl))
           AS c
  FROM term_idf ti
  JOIN tf f ON f.tok = ti.tok AND f.source = ti.f_source AND f.lang = ti.f_lang
  JOIN dl l ON l.doc_id = f.doc_id
),
scored AS (
  SELECT q_id, doc_id, round(sum(c), 4) AS score FROM contrib GROUP BY 1, 2
)
SELECT q_id, cast(row_number() OVER w AS int) AS rank, doc_id, score
FROM scored
WINDOW w AS (PARTITION BY q_id ORDER BY score DESC, doc_id ASC)
QUALIFY row_number() OVER w <= {_TOP_K}
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# typo tolerance: symspell-style edit-distance-1 lookup
# ---------------------------------------------------------------------------

# misspellings of corpus vocabulary, one per single-edit class — 'spak'
# (deletion of 'spark'), 'tabble' (insertion into 'table'), 'quary' /
# 'merje' (substitutions) — plus 'window' exact: distance-0 hits must
# surface too, like Meili's exact-before-typo ranking rule. (Plain
# Levenshtein counts a transposition like 'sprak' as distance 2, so
# swapped-letter typos are deliberately out of scope at max distance 1.)
_FUZZY_TERMS = ["merje", "spak", "tabble", "window", "quary"]
_FUZZY_TOP_K = 5

# word + every single-character deletion of it: the symspell key set for
# max edit distance 1 (two words within distance 1 ALWAYS share a key —
# equal, insertion: the shorter IS a deletion of the longer, substitution:
# deleting the substituted position from both yields the same string)
_DELETES_EXPR = (
    "array_union(array({w}), "
    "transform(sequence(1, length({w})), "
    "i -> concat(substr({w}, 1, i - 1), substr({w}, i + 1, length({w})))))"
)


def q_fuzzy_search(spark, sf_dir):
    """Edit-distance-1 dictionary lookup, symspell-style: the corpus
    vocabulary explodes into deletion-neighborhood keys (≤ word_len + 1 per
    word), query terms likewise, candidates come from the key equi-join
    (bucketed — NO cross join reaches the vocabulary), and an exact
    Levenshtein pass verifies (deletion keys overgenerate: 'ab'/'ba' share
    key 'a' at distance 2). Top-5 per term by (distance ASC, corpus
    frequency DESC, word ASC) — frequency-ranked suggestions, Meili's typo
    behavior. The oracle brute-forces Levenshtein over the whole
    vocabulary, so a missing neighborhood key would surface as a missing
    row, checking completeness of the bucketing."""
    docs = t(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    dict_keys = vocab.select(
        "word", "freq", F.explode(F.expr(_DELETES_EXPR.format(w="word"))).alias("key")
    )
    q = spark.createDataFrame([(s,) for s in _FUZZY_TERMS], "term string")
    q_keys = q.select(
        "term", F.explode(F.expr(_DELETES_EXPR.format(w="term"))).alias("key")
    )
    cand = (
        dict_keys.join(F.broadcast(q_keys), "key")
        .select("term", "word", "freq")
        .distinct()
    )
    verified = cand.withColumn(
        "dist", F.levenshtein("term", "word").cast("int")
    ).filter(F.col("dist") <= 1)
    w = Window.partitionBy("term").orderBy(
        F.asc("dist"), F.desc("freq"), F.asc("word")
    )
    return (
        verified.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _FUZZY_TOP_K)
        .select("term", "rank", F.col("word").alias("match_word"), "dist", "freq")
        .orderBy("term", "rank")
    )


def _fuzzy_terms_values_sql() -> str:
    rows = ", ".join(f"('{s}')" for s in _FUZZY_TERMS)
    return f"terms(term) AS (VALUES {rows})"


ORACLE_FUZZY_SEARCH = f"""
WITH {_fuzzy_terms_values_sql()},
vocab AS (
  SELECT tok AS word, count(*) AS freq FROM (
    SELECT unnest({_DUCK_TOKENS.format(col='text')}) AS tok FROM documents
  ) GROUP BY 1
),
cand AS (
  SELECT t.term, v.word, v.freq,
         cast(levenshtein(t.term, v.word) AS int) AS dist
  FROM terms t CROSS JOIN vocab v
  WHERE levenshtein(t.term, v.word) <= 1
)
SELECT term, cast(row_number() OVER w AS int) AS rank, word AS match_word,
       dist, freq
FROM cand
WINDOW w AS (PARTITION BY term ORDER BY dist ASC, freq DESC, word ASC)
QUALIFY row_number() OVER w <= {_FUZZY_TOP_K}
ORDER BY term, rank
"""


# ---------------------------------------------------------------------------
# the full Meili parity composition: typo-tolerant RANKED search
# ---------------------------------------------------------------------------

# query texts carry single-edit typos; the tenant filters are the same
# conjunctive pair as _SEARCH_QUERIES
_TYPO_QUERIES = [
    (1, "merje sort algorithm", "src7", "en"),
    (2, "spak data pipeline", "src18", "en"),
    (3, "the tabble scan quary", "src6", "en"),
]

_TYPO_DAMP = _EXPANSION_DAMP  # single knob: engine (search facade) and every
# oracle render damp expansions identically — tuning one constant cannot
# silently diverge the two sides of the hash-match gate


def q_typo_ranked_search(spark, sf_dir):
    """What the reference's search route actually serves in one call:
    typo-tolerant, ranked, tenant-filtered top-10. Composition of the two
    operators above: each query term expands symspell-style to vocabulary
    words within edit distance 1 (deletion-key equi-join + Levenshtein
    verify — never a cross join against the vocabulary), each matched word
    scores BM25 damped by 0.5^distance (Meili's exact-before-typo rule),
    and per (query, matched word) the BEST expansion wins (min distance).
    The oracle recomputes the expansion by brute-force Levenshtein and the
    scores in closed form, so both the neighborhood completeness and the
    damped scoring are value-checked. Fixture of the parameterized
    `search` facade: typo tolerance on, prefix off."""
    docs = t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        _TYPO_QUERIES, "q_id int, q_text string, f_source string, f_lang string"
    )
    return search(docs, queries, typo=True, prefix=False)


def _typo_queries_values_sql() -> str:
    rows = ", ".join(
        f"({q}, '{text}', '{src}', '{lang}')"
        for q, text, src, lang in _TYPO_QUERIES
    )
    return f"queries(q_id, q_text, f_source, f_lang) AS (VALUES {rows})"


ORACLE_TYPO_RANKED_SEARCH = f"""
WITH {_typo_queries_values_sql()},
toks AS (
  SELECT doc_id, source, lang,
         unnest({_DUCK_TOKENS.format(col='text')}) AS tok
  FROM documents
),
tf AS (
  SELECT doc_id, source, lang, tok, count(*) AS tf FROM toks GROUP BY ALL
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT avg(dl) FROM dl) AS avgdl
),
dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
terms AS (
  SELECT DISTINCT q_id, f_source, f_lang,
         unnest({_DUCK_TOKENS.format(col='q_text')}) AS term
  FROM queries
),
expanded AS (
  SELECT t.q_id, t.f_source, t.f_lang, v.tok,
         min(levenshtein(t.term, v.tok)) AS dist, first(v.df) AS df
  FROM terms t CROSS JOIN dft v
  WHERE levenshtein(t.term, v.tok) <= 1
  GROUP BY 1, 2, 3, 4
),
term_idf AS (
  SELECT e.q_id, e.f_source, e.f_lang, e.tok,
         pow({_TYPO_DAMP}, e.dist)
           * ln(1 + (s.n_docs - e.df + 0.5) / (e.df + 0.5)) AS idf,
         s.avgdl
  FROM expanded e CROSS JOIN stats s
),
contrib AS (
  SELECT ti.q_id, f.doc_id,
         ti.idf * f.tf * ({_BM25_K1} + 1)
           / (f.tf + {_BM25_K1} * ((1 - {_BM25_B}) + {_BM25_B} * l.dl / ti.avgdl))
           AS c
  FROM term_idf ti
  JOIN tf f ON f.tok = ti.tok AND f.source = ti.f_source AND f.lang = ti.f_lang
  JOIN dl l ON l.doc_id = f.doc_id
),
scored AS (
  SELECT q_id, doc_id, round(sum(c), 4) AS score FROM contrib GROUP BY 1, 2
)
SELECT q_id, cast(row_number() OVER w AS int) AS rank, doc_id, score
FROM scored
WINDOW w AS (PARTITION BY q_id ORDER BY score DESC, doc_id ASC)
QUALIFY row_number() OVER w <= {_TOP_K}
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# per-document keywords: top-5 terms by tf-idf
# ---------------------------------------------------------------------------


def q_top_terms_per_doc(spark, sf_dir):
    """Index-building companion to ranked_search: the 5 most
    characteristic terms per document by tf-idf (smoothed idf =
    ln(N / (1 + df)), tf normalized by doc length), deterministic
    tie-break (weight DESC, term ASC). Bounded output: doc_id < 50. Same
    postings/df/stats building blocks as BM25 — in a real index build all
    three materialize once and serve every search-family operator."""
    docs = t(spark, sf_dir, "documents")
    tf, dl, _stats, df_t = _index_relations(docs)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    weighted = (
        tf.filter(F.col("doc_id") < 50)
        .join(dl, "doc_id")
        .join(df_t, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "weight",
            F.round(
                (F.col("tf") / F.col("dl"))
                * F.log(F.col("n_docs") / (F.lit(1.0) + F.col("df"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight"), F.asc("tok"))
    return (
        weighted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "rank", F.col("tok").alias("term"), "weight")
        .orderBy("doc_id", "rank")
    )


ORACLE_TOP_TERMS_PER_DOC = f"""
WITH toks AS (
  SELECT doc_id, unnest({_DUCK_TOKENS.format(col='text')}) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
weighted AS (
  SELECT f.doc_id, f.tok,
         round((f.tf / CAST(l.dl AS DOUBLE))
               * ln(n.n_docs / (1.0 + d.df)), 6) AS weight
  FROM tf f
  JOIN dl l ON l.doc_id = f.doc_id
  JOIN dft d ON d.tok = f.tok
  CROSS JOIN n
  WHERE f.doc_id < 50
)
SELECT doc_id, cast(row_number() OVER w AS int) AS rank, tok AS term, weight
FROM weighted
WINDOW w AS (PARTITION BY doc_id ORDER BY weight DESC, tok ASC)
QUALIFY row_number() OVER w <= 5
ORDER BY doc_id, rank
"""


# ---------------------------------------------------------------------------
# result snippets: what the reference viewer renders around a hit
# ---------------------------------------------------------------------------

_SNIPPET_BEFORE = 20
_SNIPPET_LEN = 60


def q_search_with_snippets(spark, sf_dir):
    """Serving composition: BM25 top-10 hits joined back to their source
    text, each with the earliest query-term occurrence (char offset, the
    T3/W2 span machinery's output) and a fixed-window snippet around it —
    the row the reference viewer renders (hit + highlight position +
    context). The per-hit work joins only the top-k survivors (q x 10
    rows) against the docs table, so text is fetched for hits alone —
    never materialized corpus-wide."""
    hits = q_ranked_search(spark, sf_dir)
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.coalesce(F.col("text"), F.lit(""))).alias("lt")
    )
    terms = _queries_df(spark).select(
        "q_id", F.explode(F.array_distinct(_tokens(F.col("q_text")))).alias("term")
    )
    with_text = hits.join(docs, "doc_id")
    occ = (
        with_text.join(F.broadcast(terms), "q_id")
        # instr via expr: both args are columns (F.locate takes only a
        # literal needle); Spark instr and DuckDB strpos agree on 1-based
        # positions with 0 = not found
        .withColumn("pos", F.expr("instr(lt, term)"))
        .filter(F.col("pos") > 0)
        .groupBy("q_id", "rank", "doc_id", "score", "lt")
        .agg(F.min("pos").alias("first_pos"))
    )
    return occ.select(
        "q_id",
        "rank",
        "doc_id",
        "score",
        "first_pos",
        F.substring(
            F.col("lt"),
            F.greatest(F.col("first_pos") - _SNIPPET_BEFORE, F.lit(1)),
            _SNIPPET_LEN,
        ).alias("snippet"),
    ).orderBy("q_id", "rank")


ORACLE_SEARCH_WITH_SNIPPETS = f"""
WITH {_queries_values_sql()},
hits AS ({ORACLE_RANKED_SEARCH.replace("ORDER BY q_id, rank", "")}),
terms AS (
  SELECT DISTINCT q_id, unnest({_DUCK_TOKENS.format(col='q_text')}) AS term
  FROM queries
),
occ AS (
  SELECT h.q_id, h.rank, h.doc_id, h.score,
         lower(coalesce(d.text, '')) AS lt,
         min(strpos(lower(coalesce(d.text, '')), t.term)) AS first_pos
  FROM hits h
  JOIN documents d ON d.doc_id = h.doc_id
  JOIN terms t ON t.q_id = h.q_id
  WHERE strpos(lower(coalesce(d.text, '')), t.term) > 0
  GROUP BY 1, 2, 3, 4, 5
)
SELECT q_id, rank, doc_id, score, cast(first_pos AS int) AS first_pos,
       substring(lt, greatest(first_pos - {_SNIPPET_BEFORE}, 1), {_SNIPPET_LEN})
         AS snippet
FROM occ ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# incremental index maintenance: the df/tf MERGE is additive
# ---------------------------------------------------------------------------


def q_index_incremental_merge(spark, sf_dir):
    """The index-refresh contract DEPLOYMENT.md claims: doc frequency (and
    by the same construction tf) updates by ADDITIVE merge — build the df
    table over the already-indexed corpus slice and the newly-arrived
    slice separately, full-outer-join on term and sum. The oracle computes
    df over the FULL corpus in one pass, so the merge's correctness (no
    term lost or double-counted across the split, outer-join null
    handling) is value-checked. Split = deterministic doc_id % 10 (the
    'delta' is every 10th doc — what the resume anti-join would feed an
    incremental refresh)."""
    docs = t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)

    def df_of(d: DataFrame, name: str) -> DataFrame:
        toks = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
        return (
            toks.distinct()
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias(name))
        )

    merged = (
        df_of(base, "df_base")
        .join(df_of(delta, "df_delta"), "tok", "full_outer")
        .select(
            "tok",
            (
                F.coalesce(F.col("df_base"), F.lit(0))
                + F.coalesce(F.col("df_delta"), F.lit(0))
            ).alias("df"),
        )
    )
    return merged.orderBy("tok")


ORACLE_INDEX_INCREMENTAL_MERGE = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({_DUCK_TOKENS.format(col='text')}) AS tok
  FROM documents
)
SELECT tok, count(*) AS df FROM toks GROUP BY tok ORDER BY tok
"""


# ---------------------------------------------------------------------------
# phrase search: positional postings + alignment-key grouping
# ---------------------------------------------------------------------------

_PHRASE_QUERIES = [
    (1, "merge sort", "src7", "en"),
    (2, "table scan", "src6", "en"),
    (3, "the fast query", "src18", "en"),
]


def q_phrase_search(spark, sf_dir):
    """Exact-phrase search over POSITIONAL postings (doc, term, position),
    ranked by occurrence count. The classic n-way self-join per phrase
    term is replaced by the alignment-key trick: each (term_j matched at
    position p) maps to align_pos = p - j, and a full phrase occurrence
    is an align_pos where ALL j in 0..len-1 appear — one equi-join of the
    postings against the (tiny, broadcast) term list + one groupBy,
    regardless of phrase length. Top-10 docs per query by (occurrences
    DESC, doc_id ASC), same conjunctive tenant filters as ranked_search.
    The oracle recomputes positions with DuckDB's zipped
    unnest/generate_subscripts and the same alignment grouping."""
    docs = t(spark, sf_dir, "documents")
    toks_pos = docs.select(
        "doc_id",
        "source",
        "lang",
        F.posexplode(_tokens(F.col("text"))).alias("pos", "tok"),
    )
    queries = spark.createDataFrame(
        _PHRASE_QUERIES, "q_id int, phrase string, f_source string, f_lang string"
    )
    terms = queries.select(
        "q_id",
        "f_source",
        "f_lang",
        F.size(_tokens(F.col("phrase"))).alias("phrase_len"),
        F.posexplode(_tokens(F.col("phrase"))).alias("j", "term"),
    )
    aligned = toks_pos.join(
        F.broadcast(terms),
        (toks_pos.tok == terms.term)
        & (toks_pos.source == terms.f_source)
        & (toks_pos.lang == terms.f_lang),
    ).select(
        "q_id",
        "doc_id",
        "phrase_len",
        "j",
        (F.col("pos") - F.col("j")).alias("align_pos"),
    )
    occurrences = (
        aligned.groupBy("q_id", "doc_id", "phrase_len", "align_pos")
        .agg(F.count_distinct("j").alias("n_terms"))
        .filter(F.col("n_terms") == F.col("phrase_len"))
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
    return (
        occurrences.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "rank", "doc_id", "n_occurrences")
        .orderBy("q_id", "rank")
    )


def _phrase_queries_values_sql() -> str:
    rows = ", ".join(
        f"({q}, '{p}', '{s}', '{lang}')" for q, p, s, lang in _PHRASE_QUERIES
    )
    return f"queries(q_id, phrase, f_source, f_lang) AS (VALUES {rows})"


ORACLE_PHRASE_SEARCH = f"""
WITH {_phrase_queries_values_sql()},
toks_pos AS (
  SELECT doc_id, source, lang,
         unnest({_DUCK_TOKENS.format(col='text')}) AS tok,
         generate_subscripts({_DUCK_TOKENS.format(col='text')}, 1) - 1 AS pos
  FROM documents
),
terms AS (
  SELECT q_id, f_source, f_lang,
         len({_DUCK_TOKENS.format(col='phrase')}) AS phrase_len,
         unnest({_DUCK_TOKENS.format(col='phrase')}) AS term,
         generate_subscripts({_DUCK_TOKENS.format(col='phrase')}, 1) - 1 AS j
  FROM queries
),
aligned AS (
  SELECT t.q_id, p.doc_id, t.phrase_len, t.j, p.pos - t.j AS align_pos
  FROM toks_pos p
  JOIN terms t ON t.term = p.tok AND t.f_source = p.source AND t.f_lang = p.lang
),
occ AS (
  SELECT q_id, doc_id, count(*) AS n_occurrences FROM (
    SELECT q_id, doc_id, phrase_len, align_pos, count(DISTINCT j) AS n_terms
    FROM aligned GROUP BY 1, 2, 3, 4
  ) WHERE n_terms = phrase_len GROUP BY 1, 2
)
SELECT q_id, cast(row_number() OVER w AS int) AS rank, doc_id,
       cast(n_occurrences AS bigint) AS n_occurrences
FROM occ
WINDOW w AS (PARTITION BY q_id ORDER BY n_occurrences DESC, doc_id ASC)
QUALIFY row_number() OVER w <= {_TOP_K}
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# prefix search: Meili's search-as-you-type (last term prefix-matches)
# ---------------------------------------------------------------------------

# the viewer searches on EVERY keystroke (the reference debounces input at
# apps/web/components/pdf-viewer/hooks/use-pdf-search.ts:56 and hits
# apps/web/app/api/search/route.ts:35 with the partial query), so Meili's
# default treats the LAST query term as a prefix: "merge s" must already
# surface sort/scan/spark/... docs. Query shapes covered: multi-expansion
# prefix ("s" -> 6 vocabulary words), a last term matching nothing
# ("pipe"), a single-word prefix ("tab" -> table), and a complete last
# word ("window") which must score exact-only, not double as its own
# prefix.
_PREFIX_QUERIES = [
    (1, "merge s", "src7", "en"),
    (2, "spark data pipe", "src18", "en"),
    (3, "the tab", "src6", "en"),
    (4, "window", "src12", "en"),
]

_PREFIX_DAMP = _EXPANSION_DAMP  # alias of the single expansion knob (see _TYPO_DAMP)

# every prefix of a word, shortest first — the prefix-key analogue of
# _DELETES_EXPR: vocabulary-sized * avg word length, never corpus-sized
_PREFIXES_EXPR = "transform(sequence(1, length({w})), i -> substr({w}, 1, i))"


def q_prefix_search(spark, sf_dir):
    """Search-as-you-type: BM25 top-10 where the last query term ALSO
    matches every vocabulary word it prefixes (Meili's default prefix
    rule; non-last terms are whole-word only because the user already
    ended them with a separator). Mechanism mirrors typo_ranked_search:
    the vocabulary explodes into prefix keys (one row per (word, prefix)),
    the tiny query-term table broadcasts into an equi-join against those
    keys — never a LIKE scan over the vocabulary — and each matched word
    scores BM25 with idf damped 0.5 per expansion step (exact = 1.0,
    proper prefix = 0.5; per (query, word) the best wins). The oracle
    recomputes the expansion with brute-force LIKE over the vocabulary,
    so prefix-key completeness is value-checked. Fixture of the
    parameterized `search` facade: prefix on, typo off."""
    docs = t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        _PREFIX_QUERIES, "q_id int, q_text string, f_source string, f_lang string"
    )
    return search(docs, queries, typo=False, prefix=True)


def _prefix_queries_values_sql() -> str:
    rows = ", ".join(
        f"({q}, '{text}', '{src}', '{lang}')"
        for q, text, src, lang in _PREFIX_QUERIES
    )
    return f"queries(q_id, q_text, f_source, f_lang) AS (VALUES {rows})"


ORACLE_PREFIX_SEARCH = f"""
WITH {_prefix_queries_values_sql()},
toks AS (
  SELECT doc_id, source, lang,
         unnest({_DUCK_TOKENS.format(col='text')}) AS tok
  FROM documents
),
tf AS (
  SELECT doc_id, source, lang, tok, count(*) AS tf FROM toks GROUP BY ALL
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT avg(dl) FROM dl) AS avgdl
),
dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
qtoks AS (
  SELECT q_id, f_source, f_lang,
         unnest({_DUCK_TOKENS.format(col='q_text')}) AS term,
         unnest(generate_series(1, len({_DUCK_TOKENS.format(col='q_text')})))
           AS pos,
         len({_DUCK_TOKENS.format(col='q_text')}) AS n
  FROM queries
),
terms AS (
  SELECT q_id, f_source, f_lang, term,
         max(CASE WHEN pos = n THEN 1 ELSE 0 END) AS is_last
  FROM qtoks GROUP BY 1, 2, 3, 4
),
expanded AS (
  SELECT q_id, f_source, f_lang, tok, min(dist) AS dist, first(df) AS df
  FROM (
    SELECT t.q_id, t.f_source, t.f_lang, v.tok, 0 AS dist, v.df
    FROM terms t JOIN dft v ON v.tok = t.term
    UNION ALL
    SELECT t.q_id, t.f_source, t.f_lang, v.tok, 1 AS dist, v.df
    FROM terms t JOIN dft v
      ON t.is_last = 1 AND v.tok LIKE t.term || '%' AND v.tok != t.term
  ) GROUP BY 1, 2, 3, 4
),
term_idf AS (
  SELECT e.q_id, e.f_source, e.f_lang, e.tok,
         pow({_PREFIX_DAMP}, e.dist)
           * ln(1 + (s.n_docs - e.df + 0.5) / (e.df + 0.5)) AS idf,
         s.avgdl
  FROM expanded e CROSS JOIN stats s
),
contrib AS (
  SELECT ti.q_id, f.doc_id,
         ti.idf * f.tf * ({_BM25_K1} + 1)
           / (f.tf + {_BM25_K1} * ((1 - {_BM25_B}) + {_BM25_B} * l.dl / ti.avgdl))
           AS c
  FROM term_idf ti
  JOIN tf f ON f.tok = ti.tok AND f.source = ti.f_source AND f.lang = ti.f_lang
  JOIN dl l ON l.doc_id = f.doc_id
),
scored AS (
  SELECT q_id, doc_id, round(sum(c), 4) AS score FROM contrib GROUP BY 1, 2
)
SELECT q_id, cast(row_number() OVER w AS int) AS rank, doc_id, score
FROM scored
WINDOW w AS (PARTITION BY q_id ORDER BY score DESC, doc_id ASC)
QUALIFY row_number() OVER w <= {_TOP_K}
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# suggest search: the full Meili default in one call — typo tolerance on
# every term PLUS prefix matching on the last (what route.ts serves for a
# keystroke like "merje s")
# ---------------------------------------------------------------------------

_SUGGEST_QUERIES = [
    (1, "merje s", "src7", "en"),  # typo'd first term + prefix last term
    (2, "spak data pipe", "src18", "en"),  # typo + dead prefix
    (3, "the tabble sc", "src6", "en"),  # typo mid-query + prefix last
    (4, "window", "src12", "en"),  # complete exact word
]


def q_suggest_search(spark, sf_dir):
    """Search-as-you-type WITH typo tolerance — the union of
    typo_ranked_search's expansion (symspell deletion-key equi-join +
    Levenshtein verify, every term) and prefix_search's expansion
    (prefix-key equi-join, last term only), scored per matched word at
    0.5^dist with dist = min(edit distance, 1 for a proper-prefix hit)
    so an exact hit always dominates its own typo/prefix shadows. Both
    expansions are broadcast equi-joins against vocabulary-derived key
    tables; the scoring tail is the shared `_bm25_topk`. Fixture of the
    parameterized `search` facade at its defaults (Meili's defaults):
    typo AND prefix on."""
    docs = t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        _SUGGEST_QUERIES, "q_id int, q_text string, f_source string, f_lang string"
    )
    return search(docs, queries)


def suggest_oracle_sql(query_rows) -> str:
    """Render the brute-force DuckDB oracle for the facade's default
    (typo + prefix) configuration over ARBITRARY query rows — backs the
    registered ORACLE_SUGGEST_SEARCH constant and lets tests verify the
    facade on novel user-composed query strings (the reference's
    Playwright test types 'cobra', apps/web/tests/pdfs.spec.ts:32-35)."""
    esc = lambda s: str(s).replace("'", "''")  # SQL string-literal escape:
    # user-composed query text ("cobra's den") must neither break the
    # oracle's syntax nor be able to inject SQL into it
    rows = ", ".join(
        f"({int(q)}, '{esc(text)}', '{esc(src)}', '{esc(lang)}')"
        for q, text, src, lang in query_rows
    )
    values = f"queries(q_id, q_text, f_source, f_lang) AS (VALUES {rows})"
    return f"""
WITH {values},
toks AS (
  SELECT doc_id, source, lang,
         unnest({_DUCK_TOKENS.format(col='text')}) AS tok
  FROM documents
),
tf AS (
  SELECT doc_id, source, lang, tok, count(*) AS tf FROM toks GROUP BY ALL
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT avg(dl) FROM dl) AS avgdl
),
dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
qtoks AS (
  SELECT q_id, f_source, f_lang,
         unnest({_DUCK_TOKENS.format(col='q_text')}) AS term,
         unnest(generate_series(1, len({_DUCK_TOKENS.format(col='q_text')})))
           AS pos,
         len({_DUCK_TOKENS.format(col='q_text')}) AS n
  FROM queries
),
terms AS (
  SELECT q_id, f_source, f_lang, term,
         max(CASE WHEN pos = n THEN 1 ELSE 0 END) AS is_last
  FROM qtoks GROUP BY 1, 2, 3, 4
),
expanded AS (
  SELECT q_id, f_source, f_lang, tok, min(dist) AS dist, first(df) AS df
  FROM (
    SELECT t.q_id, t.f_source, t.f_lang, v.tok,
           cast(levenshtein(t.term, v.tok) AS int) AS dist, v.df
    FROM terms t CROSS JOIN dft v
    WHERE levenshtein(t.term, v.tok) <= 1
    UNION ALL
    SELECT t.q_id, t.f_source, t.f_lang, v.tok, 1 AS dist, v.df
    FROM terms t JOIN dft v
      ON t.is_last = 1 AND v.tok LIKE t.term || '%' AND v.tok != t.term
  ) GROUP BY 1, 2, 3, 4
),
term_idf AS (
  SELECT e.q_id, e.f_source, e.f_lang, e.tok,
         pow({_TYPO_DAMP}, e.dist)
           * ln(1 + (s.n_docs - e.df + 0.5) / (e.df + 0.5)) AS idf,
         s.avgdl
  FROM expanded e CROSS JOIN stats s
),
contrib AS (
  SELECT ti.q_id, f.doc_id,
         ti.idf * f.tf * ({_BM25_K1} + 1)
           / (f.tf + {_BM25_K1} * ((1 - {_BM25_B}) + {_BM25_B} * l.dl / ti.avgdl))
           AS c
  FROM term_idf ti
  JOIN tf f ON f.tok = ti.tok AND f.source = ti.f_source AND f.lang = ti.f_lang
  JOIN dl l ON l.doc_id = f.doc_id
),
scored AS (
  SELECT q_id, doc_id, round(sum(c), 4) AS score FROM contrib GROUP BY 1, 2
)
SELECT q_id, cast(row_number() OVER w AS int) AS rank, doc_id, score
FROM scored
WINDOW w AS (PARTITION BY q_id ORDER BY score DESC, doc_id ASC)
QUALIFY row_number() OVER w <= {_TOP_K}
ORDER BY q_id, rank
"""


ORACLE_SUGGEST_SEARCH = suggest_oracle_sql(_SUGGEST_QUERIES)


SEARCH_QUERIES = {
    "ranked_search": (q_ranked_search, ORACLE_RANKED_SEARCH),
    "prefix_search": (q_prefix_search, ORACLE_PREFIX_SEARCH),
    "suggest_search": (q_suggest_search, ORACLE_SUGGEST_SEARCH),
    "phrase_search": (q_phrase_search, ORACLE_PHRASE_SEARCH),
    "fuzzy_search": (q_fuzzy_search, ORACLE_FUZZY_SEARCH),
    "typo_ranked_search": (q_typo_ranked_search, ORACLE_TYPO_RANKED_SEARCH),
    "top_terms_per_doc": (q_top_terms_per_doc, ORACLE_TOP_TERMS_PER_DOC),
    "search_with_snippets": (q_search_with_snippets, ORACLE_SEARCH_WITH_SNIPPETS),
    "index_incremental_merge": (
        q_index_incremental_merge,
        ORACLE_INDEX_INCREMENTAL_MERGE,
    ),
}
