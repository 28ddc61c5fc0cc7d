"""scoped_persist: persist reuse with BOUNDED session residency."""

from __future__ import annotations

from pyspark import StorageLevel

from maston_spark import caching
from maston_spark.caching import release_persisted, scoped_persist

NONE = StorageLevel(False, False, False, False, 1)


def test_scoped_persist_evicts_oldest_beyond_cap(spark):
    release_persisted()
    frames = [
        scoped_persist(spark.range(i + 1).toDF("v"))
        for i in range(caching.MAX_LIVE + 5)
    ]
    # oldest 5 aged out of the registry and were unpersisted
    for f in frames[:5]:
        assert f.storageLevel == NONE
    # newest MAX_LIVE are still cached
    for f in frames[5:]:
        assert f.storageLevel != NONE
    # an evicted frame still COMPUTES correctly (unpersist is lineage-safe)
    assert frames[0].count() == 1
    release_persisted()


def test_release_persisted_clears_everything(spark):
    release_persisted()
    frames = [scoped_persist(spark.range(3).toDF("v")) for _ in range(3)]
    assert release_persisted() == 3
    for f in frames:
        assert f.storageLevel == NONE


def test_scoped_persist_honors_storage_level(spark):
    release_persisted()
    f = scoped_persist(spark.range(2).toDF("v"), StorageLevel.MEMORY_AND_DISK)
    assert f.storageLevel.useDisk and f.storageLevel.useMemory
    release_persisted()
