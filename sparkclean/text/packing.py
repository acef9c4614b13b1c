"""Token-budget sequence packing — GPT-style corpus chunking as a
distributed prefix sum (Catalyst + SQL twin).

Pretraining pipelines concatenate the tokenized corpus in a fixed
deterministic order and slice it into fixed-length training sequences
(the GPT-2/GPT-3 "document packing" recipe; T5 and most open recipes
since).  The operator computes, for every document, where it lands in
that virtual token stream: its whitespace token count, its exclusive
stream offset, the training-sequence (bin) index its first token falls
in, and how many consecutive bins it spans.  Downstream writers can
group by ``bin_id`` to emit packed sequences without ever building the
stream on one machine.

Zero-token documents occupy no stream positions; they are reported at
their offset with ``n_bins_spanned = 1`` (they attach to the bin their
offset falls in) so every input row appears in the output.

Scale shape: the stream offset is :func:`sparkclean.stats
.global_prefix_sum` — range-partition on the order key, in-partition
running sum, broadcast per-partition totals — so there is NO
unpartitioned window anywhere (the naive ``sum() OVER (ORDER BY id)``
serialises 10^12 rows through one task; plan-asserted in
tests/test_packing.py).  Bin arithmetic is exact integer division
(``DIV``), not floating floor — double division loses exactness past
2^53 stream tokens, which a 10^12-doc corpus exceeds.

cleanlab has no packing operator; this module belongs to the
engine-specific text additions (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..stats import global_prefix_sum
from .tokenize import ws_token_count_col, ws_token_count_sql

DEFAULT_BUDGET = 1024


def pack_sequences(
    df: DataFrame,
    budget: int = DEFAULT_BUDGET,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, stream_offset, bin_id, n_bins_spanned) for every
    input row, under the deterministic ``id`` concatenation order."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = df.select(
        id_col,
        ws_token_count_col(F.coalesce(F.col(text_col), F.lit("")))
        .cast("long")
        .alias("n_tokens"),
    )
    off = global_prefix_sum(toks, "n_tokens", [id_col], "stream_offset")
    start_bin = F.expr(f"stream_offset DIV {budget}")
    end_bin = F.expr(
        f"(stream_offset + greatest(n_tokens, 1L) - 1L) DIV {budget}"
    )
    return off.select(
        id_col,
        "n_tokens",
        "stream_offset",
        start_bin.cast("long").alias("bin_id"),
        (end_bin - start_bin + 1).cast("long").alias("n_bins_spanned"),
    )


def pack_sequences_sql(
    table: str,
    budget: int = DEFAULT_BUDGET,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`pack_sequences` (single-window form — the
    oracle runs at gate scale where one task is fine)."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS id,
         {ws_token_count_sql(f"coalesce({text_col}, '')")}::BIGINT AS n_tokens
  FROM {table}
), off AS (
  SELECT id, n_tokens,
         coalesce(sum(n_tokens) OVER (
             ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS stream_offset
  FROM toks
)
SELECT id AS {id_col}, n_tokens, stream_offset,
       (stream_offset // {budget})::BIGINT AS bin_id,
       ((stream_offset + greatest(n_tokens, 1) - 1) // {budget}
        - stream_offset // {budget} + 1)::BIGINT AS n_bins_spanned
FROM off
"""
