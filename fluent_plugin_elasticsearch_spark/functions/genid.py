"""Deterministic / random document-id generation — the engine equivalent of
the reference's elasticsearch_genid filter
(filter_elasticsearch_genid.rb:46-75; SURVEY.md T11/T12).

Reference semantics reproduced exactly (all 32 golden vectors from
test/plugin/test_filter_elasticsearch_genid.rb:52-213 are ported to
tests/test_genid.py and asserted byte-identical):

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
        parts.append(_s(F.col(tag_col)))
    if include_time:
        parts.append(_s(F.unix_timestamp(F.col(time_col))))
    # Ruby Array#join keeps nil as an empty slot (['a', nil].join('_') ==
    # 'a_'), while concat_ws would SKIP nulls — coalesce each part to ''
    # so null values still contribute their separators.
    parts.extend(_s(F.col(k)) for k in record_keys)
    return F.concat_ws(separator, *parts)


def _s(c: Column) -> Column:
    return F.coalesce(c.cast("string"), F.lit(""))


def genid_seed_entire_record(record_cols: list[str], separator: str = "_",
                             include_tag: bool = False, tag_col: str = "tag",
                             include_time: bool = False, time_col: str = "time") -> Column:
    """Whole-record seed per filter_seed_as_record
    (filter_elasticsearch_genid.rb:51-62): ``seed += tag + separator`` /
    ``seed += time.to_s + separator`` heads (note the TRAILING separator),
    then keys sorted, each appended as ``|key|value`` with NO separator.
    Byte-identical to the reference UseEntireRecordAsSeedTest goldens
    (test_filter_elasticsearch_genid.rb:146-213, ported to
    tests/test_genid.py)."""
    head = F.lit("")
    if include_tag:
        head = F.concat(head, _s(F.col(tag_col)), F.lit(separator))
    if include_time:
        head = F.concat(head, _s(F.unix_timestamp(F.col(time_col))), F.lit(separator))
    body = head
    for k in sorted(record_cols):
        body = F.concat(body, F.lit(f"|{k}|"), _s(F.col(k)))
    return body


# raw digest size per hash type: base64 of <= 57 bytes stays under the
# 76-char MIME line limit, so only sha512 (64 bytes -> 88 chars) ever gets
# the \r\n chunk break inserted by Spark's base64.
_DIGEST_BYTES = {"md5": 16, "sha1": 20, "sha256": 32, "sha512": 64}


def genid_hash(seed: Column, hash_type: str = "sha1") -> Column:
    """_hash = Base64(raw digest(seed)) — encode_hash,
    filter_elasticsearch_genid.rb:64-75. Spark's base64 is MIME-chunked
    (inserts \\r\\n every 76 chars — visible on sha512 digests); the
    reference uses strict (unchunked) encoding, so strip the breaks.
    md5/sha1/sha256 digests encode to <= 44 chars — never chunked — so the
    strip regex is a per-row no-op there and is skipped (round-7: one
    regex pass less over every generated id)."""
    b64 = F.base64(_DIGEST[hash_type](seed))
    if _DIGEST_BYTES[hash_type] <= 57:
        return b64
    return F.regexp_replace(b64, "[\\r\\n]", "")


def genid_random() -> Column:
    """Random id (UUIDv4) — filter_simple, filter_elasticsearch_genid.rb:46-49.
    Non-deterministic: tests assert shape, not value."""
    return F.expr("uuid()")


def add_genid(df: DataFrame, record_keys: list[str], hash_type: str = "sha1",
              hash_id_key: str = "_hash", separator: str = "_", **kw) -> DataFrame:
    return df.withColumn(hash_id_key, genid_hash(genid_seed(record_keys, separator, **kw), hash_type))
