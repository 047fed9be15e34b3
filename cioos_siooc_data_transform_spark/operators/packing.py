"""Sequence packing for LLM training pipelines (beyond-reference scope).

Two published packing strategies over a (source, doc_id, token_count)
stream:

- ``pack_chunks_fixed``: GPT-style concat-and-chunk — documents are
  virtually concatenated per source in doc_id order and split at fixed
  context-window boundaries; each document emits one row per window it
  overlaps. Pure integer window arithmetic → whole-stage codegen; the
  only shuffle is the per-source cumulative-sum window. At 100 TB the
  partition key is the source (sub-shard by (source, date) when a single
  source outgrows an executor's window partition).

- ``pack_greedy_nosplit``: first-fit-in-order bin packing that never
  splits a document (the "padded batches" strategy): a bin accumulates
  documents until the next one would overflow the context length, then a
  new bin starts. The running fill is a stateful scan with reset — not
  expressible as a closed-form window — so it runs as an Arrow-batched
  applyInPandas per source group (state confined to one partition key;
  linear in group size; same sub-sharding note as above). A document
  longer than the capacity occupies a bin alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from cioos_siooc_data_transform_spark.session import checkpoint_df

_PACK_SCHEMA = "source string, doc_id long, tokens long, bin_id long"


def doc_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(source, doc_id, tokens) with the registry-wide single-space
    tokenizer.

    Note: ``split('', ' ')`` has size 1 on both Spark and DuckDB
    (``len(string_split('', ' '))``), so an empty text counts as one
    empty-string token and is packed as a 1-token document — the
    ``tokens > 0`` filter is a guard against pathological tokenizers
    (e.g. one returning empty arrays), not an empty-text filter. Both
    engines agree, so the oracle comparison is unaffected.
    """
    tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    return docs.select("source", "doc_id", tokens.alias("tokens")).filter(
        F.col("tokens") > 0
    )


def pack_chunks_fixed(docs: DataFrame, capacity: int) -> DataFrame:
    """Concat-and-chunk: rows (source, doc_id, chunk_id, chunk_tokens)
    where chunk_id is the global fixed-size window (per source) the
    document's token span overlaps."""
    d = doc_tokens(docs)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = d.select(
        "source",
        "doc_id",
        "tokens",
        F.sum("tokens").over(w).alias("e"),
    ).withColumn("s", F.col("e") - F.col("tokens"))
    cap = F.lit(capacity).cast("long")
    first = F.expr(f"s DIV {capacity}")
    last = F.expr(f"(e - 1) DIV {capacity}")
    exploded = spans.select(
        "source",
        "doc_id",
        "s",
        "e",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
    )
    chunk_tokens = F.least(
        F.col("e"), (F.col("chunk_id") + 1) * cap
    ) - F.greatest(F.col("s"), F.col("chunk_id") * cap)
    return exploded.select(
        "source", "doc_id", "chunk_id", chunk_tokens.alias("chunk_tokens")
    )


def pack_greedy_nosplit(
    docs: DataFrame, capacity: int, shard_rows: int | None = None
) -> DataFrame:
    """First-fit-in-order no-split packing: rows (source, doc_id, tokens,
    bin_id), bin ids 1-based per source in doc_id order.

    ``shard_rows`` is the 100 TB escape hatch: without it, every document
    of a source lands in ONE applyInPandas group — correct, but a single
    mega-source becomes one giant task. With ``shard_rows=N``, sources
    whose row count exceeds N (the same windowed-count guard idiom as the
    LSH mega-bucket caps) are sub-sharded into contiguous N-row RANK
    ranges (row_number in doc_id order DIV N — by position, not by
    doc_id value, so sparse or offset id spaces still yield exactly-N-row
    shards), packed per shard, and the per-shard bin ids are renumbered
    into one contiguous 1-based sequence per source via a tiny
    (sources × shards) offset table that is BROADCAST back — no second
    big shuffle. The semantic trade is explicit: a bin never spans a
    shard boundary, so each shard may waste one partial bin — negligible
    at N rows per shard, and packing order within every shard is still
    doc_id order. Small sources keep the exact single-group semantics.
    """
    d = doc_tokens(docs)

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        bin_id, fill = 1, 0
        for t in pdf["tokens"]:
            if fill > 0 and fill + t > capacity:
                bin_id += 1
                fill = 0
            fill += t
            bins.append(bin_id)
        out = pd.DataFrame(
            {
                "source": pdf["source"],
                "doc_id": pdf["doc_id"],
                "tokens": pdf["tokens"],
                "bin_id": pd.Series(bins, dtype="int64"),
            }
        )
        if "shard" in pdf.columns:
            out["shard"] = pdf["shard"]
        return out

    if shard_rows is None:
        return d.groupBy("source").applyInPandas(pack, schema=_PACK_SCHEMA)

    # Guard: only sources that outgrow shard_rows get sub-sharded.
    # Sharding is by per-source RANK (row_number over doc_id) so the
    # shard size bound holds for any id distribution; the rank window
    # sorts on the same source key the packing groupBy shuffles on, so
    # no extra exchange is introduced.
    n_per_source = F.count(F.lit(1)).over(Window.partitionBy("source"))
    rn = F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    sharded = d.withColumn(
        "shard",
        F.when(
            n_per_source > shard_rows,
            F.floor((rn - 1) / shard_rows).cast("long"),
        ).otherwise(F.lit(0)),
    )
    packed_raw = sharded.groupBy("source", "shard").applyInPandas(
        pack, schema=_PACK_SCHEMA + ", shard long"
    )
    # Renumber: cumulative bin count of the preceding shards of the same
    # source. The offsets relation has one row per (source, shard) —
    # vocabulary-sized — so its ordering window is trivial and the join
    # back is broadcast.
    # The pandas packing feeds BOTH the offsets aggregate and the final
    # join; without lineage truncation the expensive applyInPandas stage
    # executes twice. eager=False: materializes on first action.
    packed = checkpoint_df(packed_raw, eager=False)
    shard_bins = packed.groupBy("source", "shard").agg(
        F.max("bin_id").alias("nbins")
    )
    w = Window.partitionBy("source").orderBy("shard")
    offsets = shard_bins.withColumn(
        "offset", F.sum("nbins").over(w) - F.col("nbins")
    ).select("source", "shard", "offset")
    return (
        packed.join(F.broadcast(offsets), ["source", "shard"])
        .select(
            "source",
            "doc_id",
            "tokens",
            (F.col("bin_id") + F.col("offset")).alias("bin_id"),
        )
    )
