"""datax_spark — a brand-new PySpark-native CDC / incremental-ingest engine.

Reimagines the reader/writer plugin model of an offline data-sync tool
(reference: tbs005/DataX @ v1 — /root/reference/README.md:1-3, an empty
pre-release snapshot; capability surface reconstructed in SURVEY.md) as:

* a Structured-Streaming-style **change-event tail source** (binlog/WAL
  semantics: monotone LSN per key, replayable offset ranges),
* an **exactly-once Iceberg-modeled MERGE sink** (idempotent snapshot
  commits keyed on ``(checkpoint_epoch, partition_id)``, additive schema
  evolution, time travel),
* vectorized pandas/Arrow UDF transforms (deterministic HTML→text
  extraction with a frozen byte contract),
* and a library of large-scale training-data operators (dedup families,
  similarity search, text analysis, multimodal plumbing).

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning and
join strategy; the only Python on the hot path is Arrow-vectorized.
"""

__version__ = "0.2.0"

from datax_spark.session import get_spark  # noqa: F401

# primary public API (lazy submodules remain importable directly)
from datax_spark.icetable.table import IceTable  # noqa: F401
from datax_spark.jobspec import run_batch_job, run_cdc_job  # noqa: F401
from datax_spark.operators.lww import lww_resolve  # noqa: F401
from datax_spark.operators.merge import apply_epoch  # noqa: F401
from datax_spark.streaming.driver import EpochDriver, run_structured  # noqa: F401
from datax_spark.streaming.source import ChangeTailSource  # noqa: F401
from datax_spark.cluster import (  # noqa: F401
    IcebergCatalogConfig,
    IcebergMergePlan,
    KafkaSourcePlan,
)
