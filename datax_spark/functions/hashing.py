"""Key partitioning + skew salting (SURVEY.md §2.2 P4, §2.7 T8).

The engine's physical layout is **url-hash partitioning**: a row lands in
partition ``pmod(murmur3(url), num_partitions)`` — murmur3 with seed 42,
exactly Spark's own HashPartitioning function (see ``url_partition``).
The hash identity is recorded in every table's partition_spec as
``PARTITION_HASH`` and validated on load: a table laid out under a
different hash would silently mis-prune and mis-route MERGE, so loading
one is a hard error, not a wrong answer. Deterministic partitioning is
what makes replay produce identical file layouts (BASELINE.json:6).

Hot-domain skew (zipf-distributed domains) is handled with **explicit
salting**: a salt derived from a second, independent hash of a
high-cardinality column (``lsn``) splits one hot key across
``salt_factor`` reducers. Salting is applied only where a full shuffle on
the raw key would bottleneck on one reducer (the LWW pre-combine, the
extraction repartition); the salt never reaches storage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The partitioning function's identity, persisted in partition_spec and
# checked by IceTable.load — changing url_partition REQUIRES changing
# this name (and therefore invalidating stored layouts) in the same
# commit, so a layout/hash mismatch can never load silently.
PARTITION_HASH = "murmur3_x86_32/seed=42"


def url_partition(key: Column | str, num_partitions: int) -> Column:
    """Stable storage partition id for a key: pmod(murmur3(key), P).

    Murmur3 (``F.hash``, fixed seed 42) is exactly the hash Spark's
    HashPartitioning uses, so ``df.repartition(P, key)`` physically
    routes every row to the task whose index equals its storage
    partition id — the write stage needs no range-sampling pass and no
    second shuffle, and when upstream operators (the MERGE join) already
    hash-partition on the key with P partitions the exchange is reused
    outright. Deterministic across runs and Spark versions (it is the
    shuffle contract), which replay requires."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.hash(c), F.lit(num_partitions)).cast("int")


def salted_key(key: Column | str, salt_from: Column | str, salt_factor: int) -> Column:
    """Composite shuffle key (key, salt) that splits hot keys.

    ``salt_from`` must be high-cardinality (e.g. lsn) so the salt is
    deterministic — replay partitions identically (no rand()).
    """
    k = F.col(key) if isinstance(key, str) else key
    s = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    return F.struct(
        k.alias("k"),
        F.pmod(F.xxhash64(s), F.lit(salt_factor)).cast("int").alias("salt"),
    )
