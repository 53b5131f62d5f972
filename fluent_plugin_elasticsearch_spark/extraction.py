"""Vectorized (Arrow-batched) Spark wrappers over the pinned textproc
implementations — the analysis chain the reference delegates to
Elasticsearch (`client.bulk` → ES analyzer; out_elasticsearch.rb:1158).

No per-row Python UDFs anywhere (BASELINE.json input_hint): everything is
``pandas_udf`` — one Python invocation per Arrow batch. The simple
tokenizer additionally has a pure-JVM column-expression form
(``simple_tokens_col``) used on hot paths and for oracle-matched queries.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textproc import extract_text, tokenize_simple, tokenize_unicode


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_unicode_udf(text: pd.Series) -> pd.Series:
    return text.map(tokenize_unicode)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_simple_udf(text: pd.Series) -> pd.Series:
    return text.map(tokenize_simple)


_TF_SCHEMA = T.StructType(
    [
        T.StructField("tfs", T.MapType(T.StringType(), T.IntegerType())),
        T.StructField("doc_len", T.IntegerType()),
    ]
)


def _tf_struct(series: pd.Series, tokenize) -> pd.DataFrame:
    from collections import Counter

    tfs, lens = [], []
    for text in series:
        toks = tokenize(text)
        tfs.append(dict(Counter(toks)))
        lens.append(len(toks))
    return pd.DataFrame({"tfs": tfs, "doc_len": lens})


@F.pandas_udf(_TF_SCHEMA)
def tokenize_unicode_tf_udf(text: pd.Series) -> pd.DataFrame:
    """(term→tf map, doc_len) per doc — the per-doc term-frequency
    aggregation fused into the tokenizer. This removes the corpus-scale
    (doc, term) hash aggregation from the build: a groupBy over ~30M
    exploded rows spills execution memory and measurably ANTI-scales with
    task parallelism; a Counter per doc inside the same Arrow batch is
    local work with perfect combining."""
    return _tf_struct(text, tokenize_unicode)


@F.pandas_udf(_TF_SCHEMA)
def tokenize_simple_tf_udf(text: pd.Series) -> pd.DataFrame:
    return _tf_struct(text, tokenize_simple)


# Fused extract+tokenize variants: chained pandas UDFs (extract_text_udf →
# tokenize_*_tf_udf) plan as TWO ArrowEvalPython nodes, shipping the
# extracted text JVM→Python→JVM→Python. One fused UDF is one crossing and
# the raw html column crosses exactly once (guide §4.1).
@F.pandas_udf(_TF_SCHEMA)
def tokenize_unicode_tf_html_udf(html: pd.Series) -> pd.DataFrame:
    return _tf_struct(html.map(extract_text), tokenize_unicode)


@F.pandas_udf(_TF_SCHEMA)
def tokenize_simple_tf_html_udf(html: pd.Series) -> pd.DataFrame:
    return _tf_struct(html.map(extract_text), tokenize_simple)


def simple_tokens_col(text: Column) -> Column:
    """JVM-side equivalent of textproc.tokenize_simple: stays inside
    whole-stage codegen (no Python worker roundtrip). Same semantics as
    DuckDB `regexp_split_to_array(lower(x), '[^a-z0-9]+')` + empty filter,
    which is what the correctness oracle runs."""
    toks = F.split(F.lower(text), "[^a-z0-9]+")
    return F.filter(toks, lambda t: t != F.lit(""))
