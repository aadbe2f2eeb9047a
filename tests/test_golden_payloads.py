"""Reference e2e golden test (round-5 brief #6): one availableNow
replay of the full TrafficPipeline over the deterministic telco
fixtures, asserting the emitted JSON payloads for ALL FOUR reference
topics byte-match checked-in goldens:

- celltower metric stats   (MetricStatsProducer.scala:40-58)
- subscriber metric stats  (MetricStatsProducer.scala:17-36)
- geofence matches         (Geofencer.scala:33-37)
- K-Means outlier points   (ClusterAnalyser.scala:62-65, one
  points-array message per batch)

This is the closest sandbox-achievable stand-in for the live Kafka
round-trip (no broker here): the payload strings are exactly what
``kafka_json_sink`` would publish per topic.

Regenerate after an INTENTIONAL shape change with
``UPDATE_GOLDENS=1 python -m pytest tests/test_golden_payloads.py``
and review the diff — an unreviewed golden update defeats the test.
"""

from __future__ import annotations

import os
import shutil

import pytest

from botkop_telcotraffic_spark_spark.streaming.json_stream import (
    attach_source,
    celltower_source,
)
from botkop_telcotraffic_spark_spark.streaming.payloads import (
    cluster_points_payload,
    geofence_payload,
    metric_stats_payload,
)
from botkop_telcotraffic_spark_spark.streaming.pipeline import (
    TrafficPipeline,
    read_geofences,
)
from botkop_telcotraffic_spark_spark.streaming.upsert_join import (
    KeyedUpsertStore,
    run_upsert_stream,
)
from tests.conftest import REPO
from tests.telco_fixtures import write_fixtures

TMP = os.path.join(REPO, ".tmp", "golden")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
TOPICS = ["celltower_stats", "subscriber_stats", "geofence", "kmeans_outliers"]


@pytest.fixture(scope="module")
def payloads(spark):
    """Run the 4-topic pipeline once; return {topic: sorted payload
    strings}."""
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP, exist_ok=True)
    fx = write_fixtures(os.path.join(TMP, "fixtures"))

    store = KeyedUpsertStore(
        spark,
        os.path.join(TMP, "attach_store"),
        key_col="bearerId",
        order_col="ts",
    )
    run_upsert_stream(
        attach_source(spark, fx["attach_path"]),
        store,
        checkpoint=os.path.join(TMP, "ckpt_attach"),
    )

    out: dict[str, list[str]] = {t: [] for t in TOPICS}
    fences = {}  # filled lazily inside the batch (needs the session)

    def cell_stats_sink(df, bid):
        out["celltower_stats"].extend(
            r["value"] for r in metric_stats_payload(df, "celltower").collect()
        )

    def sub_stats_sink(df, bid):
        out["subscriber_stats"].extend(
            r["value"]
            for r in metric_stats_payload(df, "subscriber").collect()
        )

    def geo_sink(df, bid):
        f = read_geofences(df.sparkSession, fx["geo_path"])
        out["geofence"].extend(
            r["value"] for r in geofence_payload(df, f).collect()
        )

    def outlier_sink(df, bid):
        out["kmeans_outliers"].extend(
            r["value"] for r in cluster_points_payload(df).collect()
        )

    pipe = TrafficPipeline(
        metric_names=["rtt", "byteLoss", "jitter"],
        kmeans_dims=["rtt", "byteLoss"],
        geofence_path=fx["geo_path"],
        stats_sink=cell_stats_sink,
        subscriber_stats_sink=sub_stats_sink,
        geofence_sink=geo_sink,
        outlier_sink=outlier_sink,
        publish_all_points=True,  # reference publishes ALL points
    )
    pipe.run(
        celltower_source(spark, fx["cell_path"]),
        store,
        checkpoint=os.path.join(TMP, "ckpt_cell"),
    )
    return {t: sorted(v) for t, v in out.items()}


@pytest.mark.parametrize("topic", TOPICS)
def test_payloads_match_golden(payloads, topic):
    path = os.path.join(GOLDEN_DIR, f"{topic}.jsonl")
    got = payloads[topic]
    assert got, f"{topic}: pipeline emitted no payloads"
    if os.environ.get("UPDATE_GOLDENS"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as fh:
            fh.write("\n".join(got) + "\n")
    with open(path) as fh:
        want = fh.read().splitlines()
    assert got == want, (
        f"{topic}: {len(got)} payloads vs {len(want)} golden; "
        f"first diff: "
        f"{next(((a, b) for a, b in zip(got, want) if a != b), (None, None))}"
    )


def test_payload_shapes_are_reference_exact(payloads):
    """Spot-assert the hand-built reference byte shapes (spacing
    included) independently of the golden files."""
    s = payloads["celltower_stats"][0]
    assert s.startswith('{ "celltower":{"mcc":')
    assert ', "stats":{ "' in s
    assert '"count":' in s and '"stdev":' in s
    sub = payloads["subscriber_stats"][0]
    assert sub.startswith('{ "subscriber":{"id":')
    g = payloads["geofence"][0]
    assert g.startswith('{ "subscriber": {"id":')
    assert ', "celltower": {"mcc":' in g
    assert ', "geofence": {"name":' in g
    k = payloads["kmeans_outliers"][0]
    assert k.startswith('{ "points":  [')
    assert '"prediction":' in k and '"outlier":' in k
