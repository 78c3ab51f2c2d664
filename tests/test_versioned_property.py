"""Stateful property test for the versioned table: a random sequence of
CDC batches (upserts, deletes, cross-partition moves) applied through
merge_versioned_table must agree with a plain dict reference model at
EVERY version — the latest read, and every historical read after the
fact (time travel must reproduce each intermediate state exactly)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
    create_versioned_table,
    merge_versioned_table,
    read_versioned_table,
)

_PARTS = ["P1", "P2", "P3"]
_IDS = list(range(6))


@st.composite
def cdc_history(draw):
    base = {
        i: (draw(st.sampled_from(_PARTS)), float(draw(st.integers(0, 50))))
        for i in draw(st.sets(st.sampled_from(_IDS), min_size=1, max_size=4))
    }
    n_batches = draw(st.integers(1, 3))
    batches = []
    for _ in range(n_batches):
        n_rows = draw(st.integers(1, 4))
        ids = draw(
            st.lists(st.sampled_from(_IDS), min_size=n_rows, max_size=n_rows, unique=True)
        )
        rows = []
        for i in ids:
            deleted = draw(st.booleans())
            part = draw(st.sampled_from(_PARTS))
            val = float(draw(st.integers(0, 50)))
            rows.append((i, part, val, deleted))
        batches.append(rows)
    return base, batches


@pytest.mark.slow
@given(case=cdc_history())
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_versioned_merges_match_dict_model_at_every_version(spark, tmp_path_factory, case):
    base, batches = case
    path = str(tmp_path_factory.mktemp("vt") / "t")

    snap = spark.createDataFrame(
        [(i, p, v) for i, (p, v) in base.items()], "id long, part string, val double"
    )
    create_versioned_table(snap, path, ["part"])

    model = dict(base)
    states = [dict(model)]  # model state as of each version
    versions = [1]
    v = 1
    for rows in batches:
        changes = spark.createDataFrame(
            rows, "id long, part string, val double, is_deleted boolean"
        )
        touched = merge_versioned_table(
            spark, path, changes, ["id"], ["part"], delete_col="is_deleted"
        )
        assert touched  # every nonempty batch names partitions -> commits
        for i, part, val, deleted in rows:
            if deleted:
                model.pop(i, None)
            else:
                model[i] = (part, val)
        v += 1  # every nonempty batch commits a version (touched proven above)
        versions.append(v)
        states.append(dict(model))

    # every recorded state must be reproducible via time travel
    for version, state in zip(versions, states):
        got = {
            r.id: (r.part, r.val)
            for r in read_versioned_table(spark, path, version=version).collect()
        }
        assert got == state, f"version {version}"
