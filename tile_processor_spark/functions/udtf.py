"""Python UDTF surface — the third extensibility shape (§2.10).

The reference's registries plug per-tile Python callables in as
workers (one row in → side effects + bool out;
reference worker.py:30-54). The engine already covers the UDF shape
(Arrow-batched pandas UDFs) and the UDAF shape (applyInPandas /
applyInPandasWithState); this module adds the table-function shape —
one row in → many typed rows out — via Spark 4's native Python UDTF,
which is the idiomatic Spark home for the reference's "expand a tile
into its inputs" pattern (reference TileExporter, worker.py:614-668:
one tile → many exported file rows).

Two table functions, both SQL-registrable (``register_udtfs``):

- ``split_tile_id(tile)``: decompose a composite AHN-style tile id
  ("25gn1_a" → stem/row/col/sub) — the filename-parse pattern of
  tile_file_index, exposed as a lateral-joinable table function.
- ``chunk_spans(n_tokens, size, stride)``: the chunk-window generator
  (start/end token offsets) that text_chunk_windows computes with
  array algebra — as a UDTF it composes with any table via LATERAL.

UDTFs run row-at-a-time in Python — deliberately fine HERE because
both functions are dimension-side (tile ids, per-doc chunk counts),
never fact-stream-side; the doc-stream versions of these operations
stay in the vectorized plans (tile_file_index, text_chunk_windows).
That split — UDTF for lateral convenience on small sides, array
algebra for the 100 TB side — is the scaling contract of this module.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="stem string, row int, col string, sub string")
class SplitTileId:
    """'25gn1_a' → ('25gn1', 25, 'gn', 'a'); malformed ids yield no rows
    (a UDTF's native way to express 'skip': zero output rows)."""

    PAT = re.compile(r"^(\d+)([a-z]{2})(\d*)(?:_(\w+))?$")

    def eval(self, tile: str):
        if tile is None:
            return
        m = self.PAT.match(tile)
        if not m:
            return
        num, letters, seq, sub = m.groups()
        stem = num + letters + (seq or "")
        yield stem, int(num), letters, sub


@udtf(returnType="chunk_idx int, start_tok int, end_tok int")
class ChunkSpans:
    """Sliding chunk windows over a token count: [start, end) offsets;
    short docs yield one whole-doc chunk, and generation stops at the
    first window that reaches the end (no redundant tail windows)."""

    def eval(self, n_tokens: int, size: int, stride: int):
        if n_tokens is None or n_tokens <= 0 or size <= 0 or stride <= 0:
            return
        if n_tokens <= size:
            yield 0, 0, n_tokens
            return
        idx = 0
        start = 0
        while start < n_tokens:
            end = min(start + size, n_tokens)
            yield idx, start, end
            if end >= n_tokens:
                return
            idx += 1
            start += stride


def register_udtfs(spark) -> None:
    """Make both table functions addressable from SQL:

        SELECT t.tile, s.* FROM tiles t, LATERAL split_tile_id(t.tile) s
        SELECT d.doc_id, c.* FROM docs d,
               LATERAL chunk_spans(d.n_tokens, 128, 96) c
    """
    spark.udtf.register("split_tile_id", SplitTileId)
    spark.udtf.register("chunk_spans", ChunkSpans)
