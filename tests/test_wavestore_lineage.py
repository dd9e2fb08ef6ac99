"""WaveStore manifest contract: atomic publish, resume pointer, and
per-partition lineage + metrics (north_rule requirement)."""

import json
import os

from linkinator_spark.sources.tableio import MANIFEST, WaveStore


def test_commit_writes_lineage_and_metrics(spark, tmp_path):
    store = WaveStore(str(tmp_path / "ckpt"))
    df = spark.range(0, 100, 1, 4).selectExpr("id", "id * 2 as v")
    state = store.commit(
        wave=0, clock=1.5, dfs={"frontier": df},
        metrics={"fetched_hosts": {"a.example": 7}},
    )
    # re-read frame is usable and complete
    assert state["frontier"].count() == 100

    wave_dir = store._wave_dir(0)
    manifest = json.load(open(os.path.join(wave_dir, MANIFEST)))
    assert manifest["wave"] == 0 and manifest["clock"] == 1.5
    assert manifest["metrics"]["fetched_hosts"] == {"a.example": 7}
    lin = manifest["lineage"]["frontier"]
    # every written parquet part is accounted for, rows add up
    assert lin["rows"] == 100
    assert sum(p["rows"] for p in lin["parts"].values()) == 100
    assert all(p["bytes"] > 0 for p in lin["parts"].values())
    assert len(lin["parts"]) >= 1

    # resume pointer advances with a second commit
    assert store.latest_wave() == 0
    store.commit(wave=1, clock=2.0, dfs={"frontier": df.limit(10)})
    assert store.latest_wave() == 1
    m1, tables = store.load(spark, 1)
    assert m1["lineage"]["frontier"]["rows"] == 10
    assert tables["frontier"].count() == 10
