"""Model-based test for the snapshot table: a random interleaving of
commit / upsert / vacuum operations, checked step-by-step against a
plain-Python dict model. Complements test_snapshots.py's example
cases with randomized operation sequences (the failure modes of
versioned stores are sequence-dependent)."""

from __future__ import annotations

import random

from tile_processor_spark.sources.snapshots import (
    append_snapshot,
    compact_manifest,
    list_versions,
    read_snapshot,
    upsert_snapshot,
    vacuum,
    write_snapshot,
)


def _frame(spark, d: dict[int, str]):
    return spark.createDataFrame(sorted(d.items()), "k long, v string")


def _read(spark, tbl, version=None) -> dict[int, str]:
    return {r.k: r.v for r in read_snapshot(spark, tbl, version).collect()}


def test_random_op_sequence_matches_dict_model(spark, tmp_path):
    rng = random.Random(2024)
    tbl = str(tmp_path / "tbl")
    model: dict[int, str] = {}
    history: dict[int, dict[int, str]] = {}  # version -> state
    ver = 0
    next_key = 100  # append keys are fresh: appends must never collide
    for step in range(16):
        op = (
            rng.choice(
                ["commit", "upsert", "upsert", "vacuum", "append", "compact"]
            )
            if ver
            else "commit"
        )
        if op == "commit":
            model = {
                rng.randint(0, 9): f"s{step}v{i}" for i in range(rng.randint(1, 6))
            }
            ver = write_snapshot(_frame(spark, model), tbl)
            history[ver] = dict(model)
        elif op == "upsert":
            delta = {
                rng.randint(0, 12): f"u{step}v{i}" for i in range(rng.randint(1, 4))
            }
            model = {**model, **delta}
            ver = upsert_snapshot(_frame(spark, delta), tbl, ["k"])
            history[ver] = dict(model)
        elif op == "append":
            delta = {
                next_key + i: f"a{step}v{i}" for i in range(rng.randint(1, 3))
            }
            next_key += len(delta)
            model = {**model, **delta}
            ver = append_snapshot(_frame(spark, delta), tbl)
            history[ver] = dict(model)
        elif op == "compact":
            ver = compact_manifest(tbl, group_files=rng.randint(1, 4))
            history[ver] = dict(model)  # same state, grouped manifest
        else:
            keep = rng.randint(1, 3)
            res = vacuum(tbl, keep_last=keep, claim_ttl_s=0)
            for retired in res["retired_versions"]:
                history.pop(retired, None)
        # latest always equals the model
        assert _read(spark, tbl) == model, f"step {step} ({op})"
        # every retained historical version is still bit-exact
        for v in list_versions(tbl):
            assert _read(spark, tbl, v) == history[v], f"step {step} v{v}"
