"""Engine configuration (reference parity: mongo-etl/utils/config.py).

The reference centralizes its knobs in env-driven dataclasses —
``MongoConfig`` (uri/db/collection, utils/config.py:9-41) and
``ETLConfig`` (batch_size/output_dir/checkpoint_file/max_workers,
utils/config.py:44-92) — composed into ``AppConfig``. The engine mirrors
that shape with the SAME environment variable names, so a deployment's
existing env carries over, and threads one frozen object through the
pipelines instead of scattering constants in function defaults.

Spark-native mapping of the reference's knobs:

  batch_size (marks per output file, mongodb_to_rdf.py:31 = 1000)
      -> ``with_batch_id`` window size in mongo_etl.
  cursor batch (db.mark.find(batch_size=5000), mongodb_to_rdf.py:515;
      ETLConfig.batch_size default 5000)
      -> read-side partition sizing: the Mongo connector's
      partitioner chunk size / file source's maxFilesPerTrigger.
  gzip level 6 (mongodb_to_rdf.py:37) -> sink ``gzip_level``.
  checkpoint_file -> ``ledger_path`` (parquet ledger, operators/ledger).
  max_workers -> nothing: Spark's scheduler owns parallelism; the knob
      survives only as documentation of what it replaced.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class MongoSourceConfig:
    """Document-store source settings (utils/config.py:9-41 parity).

    ``uri=None`` selects the parquet/JSON stand-in path —
    the only testable path in this sandbox; a real deployment sets
    MONGO_URI and reads live collections via the Spark connector
    (sources/mongo.py documents the pushdown mapping).
    """

    uri: str | None = None
    db_name: str = "camic"
    analysis_collection: str = "analysis"
    mark_collection: str = "mark"
    # fallback stand-ins: directory containing <collection>.parquet or
    # <collection>.json with the ANALYSIS_DOC / MARK_DOC schemas
    fallback_dir: str | None = None
    # connector read parallelism: target MB per input partition
    # (the scale analog of the cursor's batch_size=5000 docs)
    partition_size_mb: int = 64

    @classmethod
    def from_env(cls, prefix: str = "MONGO") -> "MongoSourceConfig":
        """Same env names as the reference (utils/config.py:24-41)."""
        return cls(
            uri=os.getenv(f"{prefix}_URI"),
            db_name=os.getenv(f"{prefix}_DB_NAME", cls.db_name),
            fallback_dir=os.getenv(f"{prefix}_FALLBACK_DIR"),
        )


@dataclass(frozen=True)
class EngineConfig:
    """One object for the knobs the pipelines share
    (utils/config.py:44-92 parity; same env names)."""

    batch_size: int = 1000  # marks per output file (mongodb_to_rdf.py:31)
    cursor_batch_size: int = 5000  # read batch (mongodb_to_rdf.py:515)
    gzip_level: int = 6  # sink compression (mongodb_to_rdf.py:37)
    compress: bool = True
    output_dir: str = "ttl_output"  # ETLConfig.output_dir default
    ledger_path: str | None = None  # checkpoint_file analog
    mongo: MongoSourceConfig = field(default_factory=MongoSourceConfig)

    @classmethod
    def from_env(cls, prefix: str = "ETL") -> "EngineConfig":
        """ETL_BATCH_SIZE / ETL_OUTPUT_DIR / ETL_CHECKPOINT_FILE plus
        MONGO_* (utils/config.py:61-92)."""
        d = cls()
        return cls(
            batch_size=int(os.getenv(f"{prefix}_BATCH_SIZE", d.batch_size)),
            cursor_batch_size=int(
                os.getenv(f"{prefix}_CURSOR_BATCH_SIZE", d.cursor_batch_size)
            ),
            gzip_level=int(os.getenv(f"{prefix}_GZIP_LEVEL", d.gzip_level)),
            output_dir=os.getenv(f"{prefix}_OUTPUT_DIR", d.output_dir),
            ledger_path=os.getenv(f"{prefix}_CHECKPOINT_FILE", d.ledger_path),
            mongo=MongoSourceConfig.from_env(),
        )

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        """utils/config.py:126-151 parity (nested {'mongo': {...}})."""
        mongo = MongoSourceConfig(**d.get("mongo", {}))
        etl = {k: v for k, v in d.items() if k != "mongo"}
        return cls(mongo=mongo, **etl)

    @classmethod
    def from_file(cls, path: str) -> "EngineConfig":
        """JSON config file (utils/config.py:154-186; YAML omitted —
        no yaml dependency in the engine's floor)."""
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def with_overrides(self, **kw) -> "EngineConfig":
        return replace(self, **kw)
