"""Round-7 edge pins: the adaptive CC gate on media_phash_clusters and
the keyed-merge bucket-count scaling contract."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_media_phash_clusters_distributed_arm_matches_driver_arm(
    spark, monkeypatch
):
    """media_phash_clusters must route through the measured-count chooser:
    with the cap forced to 0 it takes the distributed min-label loop and
    must produce byte-identical labels to the driver union-find arm
    (the r6 verdict's finding #1 — the collect was previously ungated)."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators import (
        dedup,
        multimodal,
    )

    driver_labels = sorted(
        map(tuple, multimodal.media_phash_clusters(spark, SF_DIR).collect())
    )
    assert driver_labels, "fixture should contain at least one phash near-dup"
    monkeypatch.setattr(dedup, "CC_DRIVER_MAX_EDGES", 0)
    dist_labels = sorted(
        map(tuple, multimodal.media_phash_clusters(spark, SF_DIR).collect())
    )
    assert dist_labels == driver_labels
