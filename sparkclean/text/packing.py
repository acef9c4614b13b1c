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


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking — (id, chunk_id, chunk_text, n_tokens)
    rows, the embedding/RAG prep recipe (HF tokenizer
    ``return_overflowing_tokens`` semantics): windows of ``chunk_size``
    whitespace tokens starting every ``stride`` tokens; the last window
    starts at the first stride multiple reaching the document end, so
    no chunk is fully contained in its predecessor.  With L tokens the
    chunk count is ``1 + ceil(max(L - chunk_size, 0) / stride)``,
    clamped to ``1 + (L-1) div stride`` so no window starts past the
    end (the clamp only binds when ``stride > chunk_size`` — the
    gap-subsampling regime); empty or null documents produce NO rows
    (documented choice — the output is the exploded chunk table).

    Scale shape: entirely row-local — words materialise once per row,
    windows are O(chunk_size) slices of that attribute, and the explode
    is ``explode_outer`` + null filter to dodge the
    InferFiltersFromGenerate re-inline of the split (CLAUDE.md r1 /
    the winnow plan guard).  No shuffle; partitioning inherited from
    the scan."""
    if chunk_size < 1 or stride < 1:
        raise ValueError(
            f"chunk_size and stride must be >= 1, got {chunk_size}, {stride}"
        )
    from .shared import words_col

    base = df.withColumn(
        "_ck_w", words_col(F.coalesce(F.col(text_col), F.lit("")))
    ).withColumn("_ck_len", F.size("_ck_w"))
    n_chunks = F.when(
        F.col("_ck_len") > 0,
        F.least(
            F.lit(1)
            + F.floor(
                (
                    F.greatest(F.col("_ck_len") - chunk_size, F.lit(0))
                    + (stride - 1)
                )
                / stride
            ).cast("int"),
            F.lit(1)
            + F.floor((F.col("_ck_len") - 1) / stride).cast("int"),
        ),
    ).otherwise(F.lit(0))

    def _chunk_at(i: Column) -> Column:
        start = i * stride + 1
        return F.struct(
            i.alias("chunk_id"),
            F.array_join(
                F.slice(F.col("_ck_w"), start, chunk_size), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_size), F.col("_ck_len") - start + 1
            ).cast("long").alias("n_tokens"),
        )

    chunks = F.when(
        n_chunks >= 1,
        F.transform(F.sequence(F.lit(0), n_chunks - 1), _chunk_at),
    ).otherwise(
        F.array().cast(
            "array<struct<chunk_id:int,chunk_text:string,n_tokens:long>>"
        )
    )
    return (
        base.select(id_col, F.explode_outer(chunks).alias("_ck"))
        .where(F.col("_ck").isNotNull())
        .select(
            id_col,
            F.col("_ck.chunk_id").cast("long").alias("chunk_id"),
            F.col("_ck.chunk_text").alias("chunk_text"),
            F.col("_ck.n_tokens").alias("n_tokens"),
        )
    )


def chunk_documents_sql(
    table: str,
    chunk_size: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`chunk_documents`."""
    from .shared import words_sql

    return f"""
WITH ckw AS MATERIALIZED (
  SELECT {id_col} AS id,
         {words_sql(f"coalesce({text_col}, '')")} AS w
  FROM {table}
), ckc AS (
  SELECT id, w, len(w) AS L,
         CASE WHEN len(w) = 0 THEN 0
              ELSE least(
                  1 + (greatest(len(w) - {chunk_size}, 0) + {stride - 1})
                      // {stride},
                  1 + (len(w) - 1) // {stride})
         END AS nc
  FROM ckw
)
SELECT id AS {id_col},
       i::BIGINT AS chunk_id,
       coalesce(array_to_string(
           w[(i * {stride} + 1):(i * {stride} + {chunk_size})], ' '), '')
           AS chunk_text,
       least({chunk_size}, L - (i * {stride} + 1) + 1)::BIGINT AS n_tokens
FROM ckc, unnest(range(0, nc)) t(i)
"""


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
