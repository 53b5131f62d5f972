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


def simple_tokens_col(text: Column) -> Column:
    """JVM-side equivalent of textproc.tokenize_simple: stays inside
    whole-stage codegen (no Python worker roundtrip). Same semantics as
    DuckDB `regexp_split_to_array(lower(x), '[^a-z0-9]+')` + empty filter,
    which is what the correctness oracle runs."""
    toks = F.split(F.lower(text), "[^a-z0-9]+")
    return F.filter(toks, lambda t: t != F.lit(""))
