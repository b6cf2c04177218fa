"""Index layer on a ``scheme://`` warehouse root (the round-10
`_warehouse_path` URI awareness, integration-tested): manifests,
pins, locks, epoch GC, bucketed member writes/attach, and the full
build → append → delete → probe lifecycle all running through
HadoopFS. A real session pins its warehouse dir at JVM start (and
``file:`` deliberately unwraps to a local Path), so the URI arm is
driven by patching ``_warehouse_path`` to a ``file://`` UriPath —
the exact object a non-``file:`` scheme would produce, over the one
scheme this container can host."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ods_v3_dbt_spark import fs as FS


@pytest.fixture
def uri_warehouse(tmp_path, monkeypatch):
    from ods_v3_dbt_spark import sinks
    from ods_v3_dbt_spark.operators import neardup_index as NI

    root = FS.norm_root(f"file://{tmp_path}/wh")
    assert isinstance(root, FS.UriPath)
    # patch BOTH binding sites: sinks' module global (BucketedTable
    # methods resolve it there) and neardup_index's imported name
    monkeypatch.setattr(sinks, "_warehouse_path", lambda s: root)
    monkeypatch.setattr(NI, "_warehouse_path", lambda s: root)
    return root


def test_dedup_index_lifecycle_on_uri_warehouse(spark, tmp_path,
                                                uri_warehouse):
    from ods_v3_dbt_spark.operators.neardup_index import (
        _read_manifest,
        dedup_index_append,
        dedup_index_delete,
        dedup_index_write,
        neardup_probe,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, "totally unrelated words live in this one here")],
        "doc_id long, text string",
    )
    idx = dedup_index_write(docs, "t_uriwh_idx", num_buckets=2)

    # the manifest physically lives under the URI root (HadoopFS)
    man_p = uri_warehouse / "t_uriwh_idx__index_manifest.json"
    fs = FS.fs_for(man_p, spark)
    assert isinstance(fs, FS.HadoopFS) and fs.exists(man_p)
    assert json.loads(fs.read_text(man_p))["epoch"] == 1

    # member data dirs also live under the URI root
    names = {n for (n, d, _) in fs.list(uri_warehouse)}
    assert any(n.startswith("t_uriwh_idx__e1_fps") for n in names)

    batch = spark.createDataFrame(
        [(11, base + " suffix"), (12, "genuinely new content words only")],
        "doc_id long, text string",
    )
    hits = neardup_probe(batch, idx, threshold_ppm=500_000)
    assert {r.doc_id for r in hits.collect()} == {11}

    # append + delete: epochs advance, GC retires unreferenced
    # epochs, all listings/deletes through HadoopFS
    dedup_index_append(idx, batch.filter(F.col("doc_id") == 12))
    dedup_index_delete(idx, spark.createDataFrame([(1,)], "doc_id long"))
    man = _read_manifest(spark, "t_uriwh_idx")
    assert man["epoch"] == 3 and man["tombs"] == [3]
    # doc 11's tombstoned source stops matching; doc 12 now matches
    # its own appended corpus copy — exactly the delete semantics
    hits = neardup_probe(batch, idx, threshold_ppm=500_000)
    assert {r.doc_id for r in hits.collect()} == {12}


def test_bucketed_attach_survives_catalog_loss_on_uri_warehouse(
    spark, tmp_path, uri_warehouse
):
    """The in-memory-catalog bridge over HadoopFS: drop the catalog
    entry (a fresh session), attach() re-registers from the
    surviving URI-rooted dir — spec sidecar read included — and a
    spec mismatch still refuses."""
    from ods_v3_dbt_spark.sinks import BucketedTable

    t = BucketedTable("t_uriwh_bt", ["k"], 2)
    t.write(spark.range(10).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("v")))
    assert t.read(spark).count() == 10
    spark.sql("DROP TABLE IF EXISTS t_uriwh_bt")  # simulate restart
    assert BucketedTable("t_uriwh_bt", ["k"], 2).attach(spark)
    assert spark.table("t_uriwh_bt").count() == 10
    spark.sql("DROP TABLE IF EXISTS t_uriwh_bt")
    with pytest.raises(ValueError, match="bucket-spec mismatch"):
        BucketedTable("t_uriwh_bt", ["k"], 4).attach(spark)
