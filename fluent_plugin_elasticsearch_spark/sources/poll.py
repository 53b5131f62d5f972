"""Interval-polling input source — the engine form of the reference's
in_elasticsearch timer loop (in_elasticsearch.rb:159-163: ``timer_execute
(:in_elasticsearch_timer, @interval, repeat: @repeat, &method(:run))``,
interval default 5 s :37, repeat :38).

Each poll cycle is one bounded Spark job:

    fresh snapshot read (new files become visible — the Iceberg-snapshot
    analogue of re-running the search)
  → ES query body compiled to scan+filter+sort+limit (plans/query_ast)
  → optional slice repartition (run, :260-270 — slices ≡ partitions)
  → docinfo enrichment under @metadata (process_events, :306-329)
  → optional timestamp parse with quarantine (:200-205)
  → emit(tag, DataFrame) to the caller's router

Cycles are independent (no cross-cycle state), so a slow or failed cycle
never corrupts the next — same contract as the reference, where every
timer tick issues a full search. At cluster scale, drive ``run_once`` from
any scheduler or wire ``cycles``/``interval`` for an in-process loop; for
exactly-once downstream delivery pair it with IngestPipeline's
deterministic-id dedup (streaming/ingest.py).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..plans.query_ast import compile_query
from .scan import parse_timestamps_on_read, sliced_scan, with_docinfo

DEFAULT_QUERY = {"sort": ["_doc"]}  # in_elasticsearch.rb:33


class PollingSource:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        tag: str = "elasticsearch",
        query: dict[str, Any] | None = None,
        size: int | None = None,
        num_slices: int = 1,
        docinfo: bool = False,
        docinfo_fields: tuple[str, ...] = ("_index", "_id"),
        docinfo_target: str = "@metadata",
        index_name: str = "fluentd",
        id_col: str | None = None,
        parse_timestamp: bool = False,
        timestamp_key: str = "@timestamp",
        timestamp_key_format: str | None = None,
        interval: float = 5.0,
        repeat: bool = True,
    ):
        self.spark = spark
        self.path = path
        self.tag = tag
        self.query = dict(query or DEFAULT_QUERY)
        if size is not None:
            self.query.setdefault("size", size)
        self.num_slices = num_slices
        self.docinfo = docinfo
        self.docinfo_fields = docinfo_fields
        self.docinfo_target = docinfo_target
        self.index_name = index_name
        self.id_col = id_col
        self.parse_timestamp = parse_timestamp
        self.timestamp_key = timestamp_key
        self.timestamp_key_format = timestamp_key_format
        self.interval = interval
        self.repeat = repeat
        self.cycles_run = 0

    def run_once(self) -> tuple[DataFrame, DataFrame | None]:
        """One poll cycle (run_slice, in_elasticsearch.rb:272-294).
        Returns (batch, quarantine) — quarantine is None unless
        parse_timestamp is on (parse failures route there instead of
        poisoning the batch, :200-205)."""
        snap = self.spark.read.parquet(self.path)
        out = compile_query(snap, self.query)
        if self.num_slices > 1:
            out = sliced_scan(out, self.num_slices)
        if self.docinfo:
            out = with_docinfo(
                out,
                index_name=self.index_name,
                id_col=self.id_col,
                docinfo_target=self.docinfo_target,
                fields=self.docinfo_fields,
            )
        quarantine = None
        if self.parse_timestamp:
            out, quarantine = parse_timestamps_on_read(
                out, self.timestamp_key, self.timestamp_key_format
            )
        self.cycles_run += 1
        return out, quarantine

    def run(
        self,
        emit: Callable[[str, DataFrame], None],
        *,
        cycles: int | None = None,
        on_error: Callable[[str, DataFrame], None] | None = None,
        sleep_fn: Callable[[float], None] = time.sleep,
    ) -> int:
        """Timer loop: emit(tag, batch) per cycle; repeat=False runs once
        (the reference's one-shot mode). ``cycles`` bounds the loop for
        tests/finite backfills; returns cycles run."""
        n = 0
        while True:
            batch, quarantine = self.run_once()
            emit(self.tag, batch)
            if quarantine is not None and on_error is not None:
                on_error(self.tag, quarantine)
            n += 1
            if not self.repeat or (cycles is not None and n >= cycles):
                return n
            sleep_fn(self.interval)
