"""ES analysis chain (_analyze API, index-settings analyzers) as pure
column expressions — the tokenizer/filter surface a reference user
configures in index templates (template mappings travel through the
plugin, out_elasticsearch.rb template install) re-expressed as JVM
higher-order functions: no Python in the data path, each analyzer one
projection.

Supported analyzers: standard (lowercase + non-alnum split), whitespace,
keyword, edge_ngram(min,max), ngram(min,max); token filters: stop list,
asciifolding, the light S-stemmer (textquality.stem_token_col).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..extraction import simple_tokens_col

# asciifolding table (the common Latin-1 accents; fixed, mirrored verbatim)
_FOLD_SRC = "áàâäãåçéèêëíìîïñóòôöõúùûüýÿ"
_FOLD_DST = "aaaaaaceeeeiiiinooooouuuuyy"


def fold_ascii(c: Column) -> Column:
    return F.translate(c, _FOLD_SRC, _FOLD_DST)


def fold_ascii_sql(e: str) -> str:
    return f"translate({e}, '{_FOLD_SRC}', '{_FOLD_DST}')"


def analyze_col(c: Column, analyzer: str = "standard",
                min_gram: int = 2, max_gram: int = 4,
                stopwords: list[str] | None = None,
                stem: bool = False, folding: bool = False,
                synonyms: dict[str, str] | None = None,
                shingles: int | None = None) -> Column:
    """Tokenize `c` with the named analyzer + optional filters; returns
    array<string>. Gram analyzers emit DISTINCT grams in SORTED order
    (DuckDB's list_distinct does not preserve order, so the shared,
    engine-stable contract is the sorted gram set)."""
    if folding:
        c = fold_ascii(F.lower(c))
    if analyzer == "keyword":
        toks = F.array(c)
    elif analyzer == "whitespace":
        toks = F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))
    elif analyzer in ("standard", "edge_ngram", "ngram"):
        toks = simple_tokens_col(c)
    else:
        raise ValueError(f"unsupported analyzer: {analyzer}")
    if analyzer == "edge_ngram":
        toks = F.array_sort(F.array_distinct(F.flatten(F.transform(
            toks, lambda t: F.filter(
                F.transform(F.sequence(F.lit(min_gram), F.lit(max_gram)),
                            lambda n: F.substring(t, F.lit(1), n)),
                lambda g: F.length(g) >= min_gram)))))
    elif analyzer == "ngram":
        toks = F.array_sort(F.array_distinct(F.flatten(F.transform(
            toks, lambda t: F.flatten(F.transform(
                F.sequence(F.lit(min_gram), F.lit(max_gram)),
                lambda n: F.when(
                    F.length(t) >= n,
                    F.transform(F.sequence(F.lit(1), F.length(t) - n + 1),
                                lambda p: F.substring(t, p, n))
                ).otherwise(F.array().cast("array<string>"))))))))
    if stopwords:
        stop_arr = F.array(*[F.lit(s) for s in stopwords])
        toks = F.filter(toks, lambda t: ~F.array_contains(stop_arr, t))
    if stem:
        from .textquality import stem_token_col

        toks = F.transform(toks, stem_token_col)
    if synonyms:
        # ES synonym token filter, replace form (a => b): map lookup per
        # token, identity fallback — one broadcast-literal map, no join
        syn_map = F.create_map(*[F.lit(x) for kv in sorted(synonyms.items())
                                 for x in kv])
        toks = F.transform(
            toks, lambda t: F.coalesce(F.element_at(syn_map, t), t))
    if shingles:
        # ES shingle filter, output_unigrams=false form: word k-grams
        # joined by space (the phrase-index building block)
        k = int(shingles)
        toks = F.when(
            F.size(toks) >= k,
            F.transform(F.sequence(F.lit(1), F.size(toks) - k + 1),
                        lambda i: F.array_join(F.slice(toks, i, k), " "))
        ).otherwise(F.array().cast("array<string>"))
    return toks


def analyze_sql(e: str, analyzer: str = "standard",
                min_gram: int = 2, max_gram: int = 4,
                stopwords: list[str] | None = None,
                stem: bool = False, folding: bool = False,
                synonyms: dict[str, str] | None = None,
                shingles: int | None = None) -> str:
    """DuckDB mirror of analyze_col."""
    if folding:
        e = fold_ascii_sql(f"lower({e})")
    toks_std = (f"list_filter(regexp_split_to_array(lower({e}), '[^a-z0-9]+'),"
                " t -> t <> '')")
    if analyzer == "keyword":
        toks = f"[{e}]"
    elif analyzer == "whitespace":
        toks = f"list_filter(regexp_split_to_array({e}, '\\s+'), t -> t <> '')"
    elif analyzer in ("standard", "edge_ngram", "ngram"):
        toks = toks_std
    else:
        raise ValueError(analyzer)
    if analyzer == "edge_ngram":
        toks = (f"list_sort(list_distinct(flatten(list_transform({toks},"
                f" t -> list_filter(list_transform(range({min_gram}, {max_gram} + 1),"
                f" n -> t[1:n]), g -> len(g) >= {min_gram})))))")
    elif analyzer == "ngram":
        toks = (f"list_sort(list_distinct(flatten(list_transform({toks},"
                f" t -> flatten(list_transform(range({min_gram}, {max_gram} + 1),"
                f" n -> CASE WHEN len(t) >= n THEN"
                f" list_transform(range(1, len(t) - n + 2), p -> t[p:p+n-1])"
                f" ELSE [] END))))))")
    if stopwords:
        lits = ", ".join("'" + s.replace("'", "''") + "'" for s in stopwords)
        toks = f"list_filter({toks}, t -> NOT list_contains([{lits}], t))"
    if stem:
        from .textquality import stem_sql_expr

        toks = f"list_transform({toks}, t -> {stem_sql_expr('t')})"
    if synonyms:
        arms = " ".join(
            f"WHEN '{a.replace(chr(39), chr(39) * 2)}'"
            f" THEN '{b.replace(chr(39), chr(39) * 2)}'"
            for a, b in sorted(synonyms.items()))
        toks = f"list_transform({toks}, t -> CASE t {arms} ELSE t END)"
    if shingles:
        k = int(shingles)
        toks = (f"CASE WHEN len({toks}) >= {k} THEN"
                f" list_transform(range(1, len({toks}) - {k} + 2),"
                f" i -> array_to_string(({toks})[i:i+{k}-1], ' '))"
                f" ELSE [] END")
    return toks


def analyze_api(docs: DataFrame, field: str, analyzer: str = "standard",
                id_col: str = "doc_id", **kw) -> DataFrame:
    """ES _analyze over a column: (id, tokens, n_tokens) — the debugging
    surface for analyzer configs, one projection."""
    toks = analyze_col(F.col(field), analyzer, **kw)
    return docs.select(F.col(id_col).alias("doc_id"), toks.alias("tokens"),
                       F.size(toks).alias("n_tokens"))
