"""Schema/DDL + lifecycle operators (SURVEY.md §2.4 D1-D6).

The reference manages ES index templates, rollover aliases, and ILM
policies over HTTP (elasticsearch_index_template.rb,
elasticsearch_index_lifecycle_management.rb). The engine's equivalents on
a table-directory layout (1:1 with Iceberg table properties + partition
specs on a cluster):

  D1 template install      → idempotent create-table-if-absent with schema
  D2 custom template       → parameterized schema/properties
  D3 ILM settings          → table properties (rollover thresholds)
  D4 rollover alias        → generation partitions + current-gen pointer
  D5 ILM policy CRUD       → maintenance job: roll on size/age, expire old
  D6 data-stream bootstrap → validated create-once per stream
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DEFAULT_POLICY = {  # default-ilm-policy.json: hot rollover 50gb/30d
    "max_size_bytes": 50 * 1024**3,
    "max_age_days": 30,
    "retention_generations": None,
}


class TableManager:
    """Directory-backed table with a JSON descriptor (the Iceberg-metadata
    stand-in): schema, properties, generations."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _desc_path(self, name: str) -> str:
        return os.path.join(self.root, name, "_table.json")

    def exists(self, name: str) -> bool:
        """D1/Q9 — index/template existence check (template_exists,
        elasticsearch_index_template.rb:24-33)."""
        return os.path.exists(self._desc_path(name))

    def install_template(self, name: str, schema: T.StructType,
                         properties: dict | None = None, overwrite: bool = False) -> bool:
        """D1 — idempotent DDL (template_install,
        elasticsearch_index_template.rb:93-119): PUT-if-absent unless
        overwrite. Returns True if (re)installed."""
        if self.exists(name) and not overwrite:
            return False
        os.makedirs(os.path.join(self.root, name), exist_ok=True)
        desc = {
            "name": name,
            "schema": schema.json(),
            "properties": properties or {},
            "generations": [1],
            "current_gen": 1,
            "created": time.time(),
        }
        with open(self._desc_path(name), "w") as f:
            json.dump(desc, f)
        return True

    def install_custom_template(self, name: str, schema: T.StructType,
                                base_properties: dict, substitutions: dict) -> bool:
        """D2 — customize_template string substitution
        (elasticsearch_index_template.rb:13-22) applied to properties."""
        props = {
            k: (v.format(**substitutions) if isinstance(v, str) else v)
            for k, v in base_properties.items()
        }
        return self.install_template(name, schema, props)

    def inject_ilm_settings(self, name: str, policy: dict | None = None,
                            rollover_alias: str | None = None) -> None:
        """D3 — ILM settings injection (inject_ilm_settings_to_template,
        elasticsearch_index_template.rb:150-176) as table properties."""
        desc = self._load(name)
        desc["properties"]["ilm"] = {**DEFAULT_POLICY, **(policy or {})}
        if rollover_alias:
            desc["properties"]["rollover_alias"] = rollover_alias
        self._save(name, desc)

    def _load(self, name: str) -> dict:
        with open(self._desc_path(name)) as f:
            return json.load(f)

    def _save(self, name: str, desc: dict) -> None:
        with open(self._desc_path(name), "w") as f:
            json.dump(desc, f)

    # --- D4: generations (rollover alias + bootstrap index) -----------------
    def gen_dir(self, name: str, gen: int) -> str:
        return os.path.join(self.root, name, f"gen={gen:06d}")

    def current_gen(self, name: str) -> int:
        return self._load(name)["current_gen"]

    def write_append(self, name: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.gen_dir(name, self.current_gen(name)))

    def read(self, name: str, all_generations: bool = True) -> DataFrame:
        """The 'alias' view: current generation (write view) or all
        generations (read view) — create_rollover_alias semantics
        (elasticsearch_index_template.rb:178-210)."""
        desc = self._load(name)
        gens = desc["generations"] if all_generations else [desc["current_gen"]]
        paths = [self.gen_dir(name, g) for g in gens if os.path.exists(self.gen_dir(name, g))]
        return self.spark.read.parquet(*paths)

    def rollover(self, name: str) -> int:
        """Roll to a new write generation (<index-000001> → 000002 …)."""
        desc = self._load(name)
        new_gen = max(desc["generations"]) + 1
        desc["generations"].append(new_gen)
        desc["current_gen"] = new_gen
        self._save(name, desc)
        return new_gen

    # --- D5: lifecycle maintenance -------------------------------------------
    def _gen_stats(self, name: str, gen: int) -> tuple[int, float]:
        d = self.gen_dir(name, gen)
        size = 0
        oldest = time.time()
        for root, _dirs, files in os.walk(d):
            for fn in files:
                p = os.path.join(root, fn)
                size += os.path.getsize(p)
                oldest = min(oldest, os.path.getmtime(p))
        return size, oldest

    def maintain(self, name: str, now: float | None = None) -> dict:
        """D5 — the ILM hot-phase check (verify/execute rollover on
        size/age; default 50 GB / 30 d) + retention expiry of old
        generations (≈ Iceberg expireSnapshots)."""
        now = now or time.time()
        desc = self._load(name)
        policy = {**DEFAULT_POLICY, **desc["properties"].get("ilm", {})}
        actions: dict = {"rolled": False, "expired": []}
        cur = desc["current_gen"]
        if os.path.exists(self.gen_dir(name, cur)):
            size, oldest = self._gen_stats(name, cur)
            if size >= policy["max_size_bytes"] or (now - oldest) >= policy["max_age_days"] * 86400:
                actions["rolled"] = self.rollover(name)
        keep = policy.get("retention_generations")
        if keep:
            desc = self._load(name)
            old = sorted(desc["generations"])[:-keep]
            for g in old:
                shutil.rmtree(self.gen_dir(name, g), ignore_errors=True)
                desc["generations"].remove(g)
                actions["expired"].append(g)
            self._save(name, desc)
        return actions

    # --- D6: data streams -----------------------------------------------------
    def bootstrap_data_stream(self, name: str, schema: T.StructType,
                              policy: dict | None = None) -> bool:
        """D6 — data-stream bootstrap (out_elasticsearch_data_stream.rb:95-160)
        incl. name validation (:70-93,186-208): lowercase, no illegal chars,
        ≤ 255 bytes, no leading -/_/+/."""
        validate_data_stream_name(name)
        created = self.install_template(name, schema, {"data_stream": True})
        if created:
            self.inject_ilm_settings(name, policy)
        return created


_ILLEGAL = re.compile(r"[\\/*?\"<>| ,#:]")


def validate_data_stream_name(name: str) -> None:
    """Charset/shape rules from out_elasticsearch_data_stream.rb:186-208."""
    if not name:
        raise ValueError("empty data stream name")
    if len(name.encode("utf-8")) > 255:
        raise ValueError("data stream name must be ≤ 255 bytes")
    if name != name.lower():
        raise ValueError("data stream name must be lowercase")
    if _ILLEGAL.search(name):
        raise ValueError(f"illegal characters in data stream name: {name}")
    if name[0] in "-_+.":
        raise ValueError(f"data stream name must not start with {name[0]!r}")
