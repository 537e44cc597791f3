"""Invariant tests for the chunking / shard-layout / mixture operators:
edge-case documents through the real query path, plus global properties
the oracle comparison alone can't state (coverage, contiguity, balance).
"""

from __future__ import annotations

import pandas as pd

from tile_processor_spark.plans.llm_ops import CHUNK_S, CHUNK_W, text_chunk_windows
from tile_processor_spark.plans.pipeline_ops import (
    N_SHARDS,
    corpus_shard_assign,
    sample_temperature_mixture,
)

SF = "/root/testdata/sf0.01"


def test_chunk_windows_edge_cases(spark, tmp_path):
    # 0, 1, W-1, W, W+1, and 2S+W tokens: chunk starts every S tokens,
    # sizes min(W, n-start), and every token lands in >= 1 chunk.
    cases = {1: 0, 2: 1, 3: CHUNK_W - 1, 4: CHUNK_W, 5: CHUNK_W + 1, 6: 2 * CHUNK_S + CHUNK_W}
    rows = [
        {"doc_id": d, "text": " ".join(f"w{i}" for i in range(n)),
         "lang": "en", "source": "s", "n_chars": 0}
        for d, n in cases.items()
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    pd.DataFrame(rows).to_parquet(sf / "documents.parquet")
    got = text_chunk_windows(spark, str(sf)).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, n in cases.items():
        chunks = sorted(by_doc[d], key=lambda r: r.chunk_idx)
        want_starts = list(range(0, max(n, 1), CHUNK_S))
        assert [c.start_tok for c in chunks] == want_starts
        assert [c.chunk_idx for c in chunks] == list(range(len(want_starts)))
        for c in chunks:
            assert c.n_tokens == max(0, min(CHUNK_W, n - c.start_tok))
        covered = set()
        for c in chunks:
            covered.update(range(c.start_tok, c.start_tok + c.n_tokens))
        assert covered == set(range(n))


def test_shard_assign_balance_and_contiguity(spark):
    rows = corpus_shard_assign(spark, SF).collect()
    assert all(0 <= r.shard < N_SHARDS for r in rows)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    # positions are dense 1..count within each shard, ordered by pos_key
    for members in by_shard.values():
        members.sort(key=lambda r: (r.pos_key, r.doc_id))
        assert [m.pos for m in members] == list(range(1, len(members) + 1))
    # hash balance: no shard grossly over-loaded (500 docs / 64 shards)
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[-1] <= 25


def test_temperature_mixture_bounds(spark):
    rows = sample_temperature_mixture(spark, SF).collect()
    n_total = 500
    # targets half the corpus; hash sampling keeps it in a loose band
    assert 0.3 * n_total <= len(rows) <= 0.7 * n_total
    # every kept doc respects its source threshold by construction;
    # uniform sf0.01 sources => identical thresholds => roughly even mix
    by_source: dict[str, int] = {}
    for r in rows:
        by_source[r.source] = by_source.get(r.source, 0) + 1
    assert len(by_source) == 20
