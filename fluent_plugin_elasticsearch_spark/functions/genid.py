"""Deterministic / random document-id generation — the engine equivalent of
the reference's elasticsearch_genid filter
(filter_elasticsearch_genid.rb:46-75; SURVEY.md T11/T12).

Reference semantics reproduced exactly (golden vectors ported from
test/plugin/test_filter_elasticsearch_genid.rb:52-213 live in
tests/test_genid.py):

  * seed = selected ``record_keys`` joined by ``separator`` (default "_"),
    optionally prefixed by tag and/or event time;
  * or the entire record as ``|k|v`` pairs with keys sorted
    (filter_seed_as_record, filter_elasticsearch_genid.rb:51-62);
  * ``_hash`` = Base64(raw digest), digest ∈ {md5, sha1, sha256, sha512}
    (encode_hash, filter_elasticsearch_genid.rb:64-75);
  * random mode: Base64-free UUIDv4 (filter_simple, :46-49).

Everything is a pure column expression — vectorized JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DIGEST = {
    "md5": lambda c: F.unhex(F.md5(c)),
    "sha1": lambda c: F.unhex(F.sha1(c)),
    "sha256": lambda c: F.unhex(F.sha2(c, 256)),
    "sha512": lambda c: F.unhex(F.sha2(c, 512)),
}


def genid_seed(record_keys: list[str], separator: str = "_",
               include_tag: bool = False, tag_col: str = "tag",
               include_time: bool = False, time_col: str = "time") -> Column:
    """Seed string per filter_elasticsearch_genid.rb:51-58: optional tag,
    optional integer epoch-seconds time, then the selected record values,
    all joined by `separator`."""
    parts: list[Column] = []
    if include_tag:
        parts.append(F.col(tag_col))
    if include_time:
        parts.append(F.unix_timestamp(F.col(time_col)).cast("string"))
    parts.extend(F.col(k).cast("string") for k in record_keys)
    return F.concat_ws(separator, *parts)


def genid_seed_entire_record(record_cols: list[str], separator: str = "_",
                             include_tag: bool = False, tag_col: str = "tag",
                             include_time: bool = False, time_col: str = "time") -> Column:
    """Whole-record seed per filter_seed_as_record
    (filter_elasticsearch_genid.rb:59-62): keys sorted, each appended as
    ``{separator}|key{separator}|value``."""
    parts: list[Column] = []
    if include_tag:
        parts.append(F.col(tag_col))
    if include_time:
        parts.append(F.unix_timestamp(F.col(time_col)).cast("string"))
    head = F.concat_ws(separator, *parts) if parts else F.lit("")
    body = F.lit("")
    for k in sorted(record_cols):
        body = F.concat(
            body, F.lit(f"{separator}|{k}{separator}|"), F.col(k).cast("string")
        )
    return F.concat(head, body)


def genid_hash(seed: Column, hash_type: str = "sha1") -> Column:
    """_hash = Base64(raw digest(seed)) — encode_hash,
    filter_elasticsearch_genid.rb:64-75. Spark's base64 is MIME-chunked
    (inserts \\r\\n every 76 chars — visible on sha512 digests); the
    reference uses strict (unchunked) encoding, so strip the breaks."""
    return F.regexp_replace(F.base64(_DIGEST[hash_type](seed)), "[\\r\\n]", "")


def genid_random() -> Column:
    """Random id (UUIDv4) — filter_simple, filter_elasticsearch_genid.rb:46-49.
    Non-deterministic: tests assert shape, not value."""
    return F.expr("uuid()")


def add_genid(df: DataFrame, record_keys: list[str], hash_type: str = "sha1",
              hash_id_key: str = "_hash", separator: str = "_", **kw) -> DataFrame:
    return df.withColumn(hash_id_key, genid_hash(genid_seed(record_keys, separator, **kw), hash_type))
