"""Pipeline robustness across fixture seeds: the validation split and
renumbering must track ground truth for arbitrary defect mixes, not
just the one seed the main e2e test uses."""

from __future__ import annotations

import pytest

from geoestate_etl_spark.plans.pipeline import run_pipeline
from tests.houses_fixture import generate


@pytest.mark.parametrize("seed", [1, 9, 123])
def test_pipeline_tracks_ground_truth(spark, tmp_path, seed):
    fx = generate(str(tmp_path / f"h{seed}.csv"), n_rows=800, seed=seed)
    res = run_pipeline(spark, fx.path)
    assert res.n_valid == fx.n_valid
    assert res.n_invalid == fx.n_rows - fx.n_valid
    ids = sorted(r.house_id for r in res.clean.select("house_id").collect())
    assert ids == list(range(1, fx.n_valid + 1))
