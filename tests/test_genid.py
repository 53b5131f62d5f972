"""All 32 genid golden vectors ported verbatim from the reference
test/plugin/test_filter_elasticsearch_genid.rb:52-213 (UseRecordAsSeedTest +
UseEntireRecordAsSeedTest, each × {plain, tag, time, tag+time} × 4 digests).

The reference fixture: sample_record {'age'=>26, 'request_id'=>'42',
'parent_id'=>'parent', 'routing_id'=>'routing'} merged with
custom_key='This is also encoded value.', tag 'test.fluentd',
event_time('2017-10-15 15:00:23 UTC') == 1508079623.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from fluent_plugin_elasticsearch_spark.functions.genid import (
    genid_hash,
    genid_seed,
    genid_seed_entire_record,
)

RECORD_KEYS = ["age", "parent_id", "routing_id", "custom_key"]
ENTIRE_COLS = ["age", "custom_key", "parent_id", "request_id", "routing_id"]

# test_filter_elasticsearch_genid.rb:52-75 (UseRecordAsSeedTest::test_simple)
KEYS_PLAIN = {
    "md5": "PPg+zmH1ASUCpNzMUcTzqw==",
    "sha1": "JKfCrEAxeAyRSdcKqkw4unC9xZ8=",
    "sha256": "9Z9i+897bGivSItD/6i0vye9uRwq/sLwWkxOwydtTJY=",
    "sha512": "KWI5OdZPaCFW9/CEY3NoGrvueMtjZJdmGdqIVGJP8vgI4uW+0gHExZVaHerw+RhbtIdLCtVZ43xBgMKH+KliQg==",
}
# :77-97 (test_record_with_tag)
KEYS_TAG = {
    "md5": "qUO/xqWiOJq4D0ApdoHVEQ==",
    "sha1": "v3UWYr90zIH2veGQBVwUH586TuI=",
    "sha256": "4hwh10qfw9B24NtNFoEFF8wCiImvgIy1Vk4gzcKt5Pw=",
    "sha512": "TY3arcmC8mhYClDIjQxH8ePRLnHK01Cj5QQL8FxbwNtPQBY3IZ4qJY9CpOusmdWBYwm1golRVQCmURiAhlnWIQ==",
}
# :99-119 (test_record_with_time)
KEYS_TIME = {
    "md5": "oHo+PoC5I4KC+XCfXvyf9w==",
    "sha1": "50Nwarm2225gLy1ka8d9i+W6cKA=",
    "sha256": "ReX1XgizcrHjBc0sQwx9Sjuf2QBFll2njYf4ee+XSIc=",
    "sha512": "8bcpZrqNUQIz6opdoVZz0MwxP8r9SCqOEPkWF6xGLlFwPCJVqk2SQp99m8rPufr0xPIgvZyOMejA5slBV9xrdg==",
}
# :121-143 (test_record_with_tag_and_time)
KEYS_TAG_TIME = {
    "md5": "u7/hr09gDC9CM5DI7tLc2Q==",
    "sha1": "1WgptcTnVSHtTAlNUwNcoiaY3oM=",
    "sha256": "1iWZHI19m/A1VH8iFK7H2KFoyLdszpJRiVeKBv1Ndis=",
    "sha512": "NM+ui0lUmeDaEJsT7c9EyTc+lQBbRf1x6MQXXYdxp21CX3jZvHy3IT8Xp9ZdIKevZwhoo3Suo/tIBlfyLFXJXw==",
}
# :146-166 (UseEntireRecordAsSeedTest::test_record)
ENTIRE_PLAIN = {
    "md5": "OAod7J0DR9s9/rOQnkeSFw==",
    "sha1": "0CT4aMJ4gxMT3TKaYPCYApiVsq8=",
    "sha256": "mbAuKF5can0TTj/JBk71AXtOyoVqw5W5gMPUxx6pxLk=",
    "sha512": "f7kz5KVuDy+riENePDzqBjGQfbuRNpRBSQMzT2/6hrljXbYtBy3YFmxB86ofIf3zz4ZBao2QM2W7YvcwbRtK1w==",
}
# :168-188 (test_record_with_tag)
ENTIRE_TAG = {
    "md5": "Hb0jwxofNQP+ufQTKK1U4g==",
    "sha1": "BakTtlotl/u+yOON6YcViTz6nms=",
    "sha256": "eLuTCsFqDlk6PfABNyD39r36+yNIBeDTHyNKfJ8fZQw=",
    "sha512": "PhPCNGalM4H4xT19DnCBnpwr56lbvCo8wJGyCiH9dWcyhn1nA5l1diYSZlF2fNiq1+wzMqfGvJILIjgQrlAPcg==",
}
# :190-210 (test_record_with_time)
ENTIRE_TIME = {
    "md5": "C8vfhC4kecNCNutFCuC6MA==",
    "sha1": "+YWVqUEL90wpKJRrionUJwNgXHg=",
    "sha256": "eSqGZqjnO6Uum/4CNfJaolX49+2XKogiGMHGNHiO91Q=",
    "sha512": "iVmuD0D+i/WtBwNza09ZXSIW8Xg8/yrUwK/M/EZaCMjz/x5FyyCiVkb1VVKsgNnJy0SYt4w21dhHewu1aXM6HA==",
}
# :212-233 (test_record_with_tag_and_time)
ENTIRE_TAG_TIME = {
    "md5": "lU7d4EiF+2M1zxWcsmBbjg==",
    "sha1": "nghmz1y3KTEFxalfS2/Oe4n4yfQ=",
    "sha256": "d0le9UOnUeuGPF/2yEBRM1YzOYeHtxYOE1UU6JgJrvU=",
    "sha512": "n7rhisGHUBne6c4Cs9DRMbPror8O5Y/vYajDqAtOaiUTys/Z1EKBMnZQA0iVNFw7joX33cenBW3Yyccct3xSew==",
}


@pytest.fixture(scope="module")
def genid_df(spark):
    return spark.createDataFrame(
        [
            Row(
                tag="test.fluentd",
                time=dt.datetime(2017, 10, 15, 15, 0, 23),
                age=26,
                request_id="42",
                parent_id="parent",
                routing_id="routing",
                custom_key="This is also encoded value.",
            )
        ]
    )


def _one(df, col):
    return df.select(col.alias("h")).collect()[0]["h"]


CASES = [
    (KEYS_PLAIN, dict()),
    (KEYS_TAG, dict(include_tag=True)),
    (KEYS_TIME, dict(include_time=True)),
    (KEYS_TAG_TIME, dict(include_tag=True, include_time=True)),
]
ENTIRE_CASES = [
    (ENTIRE_PLAIN, dict()),
    (ENTIRE_TAG, dict(include_tag=True)),
    (ENTIRE_TIME, dict(include_time=True)),
    (ENTIRE_TAG_TIME, dict(include_tag=True, include_time=True)),
]


@pytest.mark.parametrize("case", range(4))
@pytest.mark.parametrize("alg", ["md5", "sha1", "sha256", "sha512"])
def test_record_keys_goldens(genid_df, case, alg):
    goldens, kw = CASES[case]
    seed = genid_seed(RECORD_KEYS, "_", **kw)
    assert _one(genid_df, genid_hash(seed, alg)) == goldens[alg]


@pytest.mark.parametrize("case", range(4))
@pytest.mark.parametrize("alg", ["md5", "sha1", "sha256", "sha512"])
def test_entire_record_goldens(genid_df, case, alg):
    goldens, kw = ENTIRE_CASES[case]
    seed = genid_seed_entire_record(ENTIRE_COLS, "_", **kw)
    assert _one(genid_df, genid_hash(seed, alg)) == goldens[alg]


def test_entire_record_seed_format(genid_df):
    """filter_seed_as_record (filter_elasticsearch_genid.rb:51-62): sorted
    keys as ``|k|v`` with no separator; tag/time heads carry a TRAILING
    separator each."""
    seed = genid_seed_entire_record(ENTIRE_COLS, "_", include_tag=True, include_time=True)
    got = _one(genid_df, seed)
    assert got == (
        "test.fluentd_1508079623_"
        "|age|26|custom_key|This is also encoded value."
        "|parent_id|parent|request_id|42|routing_id|routing"
    )


def test_null_record_key_keeps_separator(spark):
    """Ruby Array#join keeps nil as an empty slot: ['a', nil].join('_') ==
    'a_'. concat_ws would skip the null entirely — assert we coalesce."""
    df = spark.createDataFrame([Row(a="a", b=None, c="c")],
                               "a string, b string, c string")
    seed = genid_seed(["a", "b", "c"], "_")
    assert _one(df, seed) == "a__c"
    seed2 = genid_seed(["a", "b"], "_")
    assert _one(df, seed2) == "a_"
