"""NumPy mirror for the deterministic k-means IVF trainer: recompute the
identical integer/double algebra driver-side and require bit-equal
assignments from the Spark implementation."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from tile_processor_spark.plans.ann_kmeans import (
    K_CLUSTERS,
    KMEANS_ITERS,
    ann_kmeans_fit,
)

SF = "/root/testdata/sf0.01"
QUANT = 1_048_576.0


def _numpy_kmeans(path: str, k: int, iters: int) -> dict[int, int]:
    t = pq.read_table(path).to_pandas().sort_values("vec_id").reset_index(drop=True)
    vec_ids = t["vec_id"].to_numpy()
    # Spark: float32 element × double literal promotes to double, then floor.
    Q = np.floor(np.stack(t["embedding"].to_numpy()).astype(np.float64) * QUANT).astype(
        np.int64
    )
    q2 = (Q * Q).sum(axis=1)

    # Init: the k smallest vec_ids, centroid id = seed vec_id.
    c_ids = vec_ids[:k].astype(np.int64)
    sv = Q[:k].copy()
    s2 = (sv * sv).sum(axis=1)
    n = np.ones(k, dtype=np.int64)

    def assign() -> np.ndarray:
        # d2[c] = (n²·q2 − 2n·(Q·sv) + s2) / n². The engine computes the
        # numerator in DECIMAL(38,0) (HUGEINT in the oracle), so the
        # mirror uses exact arbitrary-precision Python ints (object
        # dtype) — bit-identical regardless of cluster size — then the
        # same single int→double rounding and double division. Centroid
        # columns are ordered by ascending c_id, so argmin's first-min
        # rule IS the tie-break on centroid id.
        order = np.argsort(c_ids, kind="stable")
        no = n[order].astype(object)
        num = (
            no**2 * q2[:, None].astype(object)
            - 2 * no * (Q.astype(object) @ sv[order].T.astype(object))
            + s2[order].astype(object)
        )
        numf = np.array([[float(x) for x in row] for row in num])
        d2 = numf / (n[order].astype(np.float64) ** 2)
        return c_ids[order][np.argmin(d2, axis=1)]

    for _ in range(iters):
        a = assign()
        keep = np.array(sorted(set(a.tolist())), dtype=np.int64)
        sv = np.stack([Q[a == c].sum(axis=0) for c in keep])
        s2 = (sv * sv).sum(axis=1)
        n = np.array([(a == c).sum() for c in keep], dtype=np.int64)
        c_ids = keep
    final = assign()
    return dict(zip(vec_ids.tolist(), final.tolist()))


def test_kmeans_assignments_match_numpy_mirror(spark):
    got = {
        r["vec_id"]: r["assigned"]
        for r in ann_kmeans_fit(spark, SF).collect()
    }
    want = _numpy_kmeans(f"{SF}/embeddings.parquet", K_CLUSTERS, KMEANS_ITERS)
    assert len(got) == len(want) == 500
    diff = {v: (got[v], want[v]) for v in want if got[v] != want[v]}
    assert not diff, f"{len(diff)} mismatches, e.g. {list(diff.items())[:5]}"


def test_kmeans_forms_multiple_nonempty_lists(spark):
    counts = ann_kmeans_fit(spark, SF).groupBy("assigned").count().collect()
    assert len(counts) > 1, "degenerate single-cluster fit"
    assert sum(r["count"] for r in counts) == 500
