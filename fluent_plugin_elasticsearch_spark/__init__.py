"""fluent_plugin_elasticsearch_spark — a from-scratch PySpark-native
full-text analytics engine with the query/data-processing capabilities of
uken/fluent-plugin-elasticsearch (reference, read-only at /root/reference).

The reference is a Fluentd↔Elasticsearch ingestion/retrieval pipeline; it
delegates inverted indexing and BM25 scoring to Elasticsearch. This engine
implements BOTH halves natively on Spark:

  * the plugin's document-processing operators (genid hashing, timestamp
    injection, date-index naming, flattening, write-op MERGE semantics,
    bulk-error triage, affinity routing) — ``functions/``, ``sinks/``,
    ``sources/``;
  * the Elasticsearch-side capabilities the plugin drives — inverted-index
    build (salted term partitioning, delta-gap+varint posting blocks with
    block-max metadata), BM25 (k1=1.2, b=0.75) top-k, block-max WAND, ids
    query, sorted/sliced scroll scans — ``operators/``;
  * large-scale training-data-pipeline operators (dedup, ANN similarity,
    text quality, multimodal plumbing) — ``operators/``.

Everything is DataFrame-first: Catalyst plans the physical execution; the
only Python on the hot path is vectorized pandas/Arrow UDFs (codec, WAND).
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
