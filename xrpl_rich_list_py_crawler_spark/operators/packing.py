"""Training-sequence packing: lay the whole corpus out as one global
token stream and cut it into fixed-capacity training sequences.

GPT-style pretraining consumes fixed-length token sequences (e.g. 2048
or 8192 tokens); the corpus is concatenated in a deterministic document
order, an EOS token is appended per document, and the stream is split
every ``capacity`` tokens — documents freely cross sequence boundaries.
The operator that makes this distributed is a **global prefix sum** over
per-document token counts: once every document knows its absolute start
offset in the stream, its (sequence, slice) assignments are pure row-local
integer arithmetic.

The naive cumulative sum — ``sum() OVER (ORDER BY doc_id)`` — collapses
to ONE partition, the same anti-pattern :func:`frontier.global_rank`
exists to avoid (and the reason the r04 verdict flagged
``unigram_vocab``'s global window). :func:`global_cumsum` is the
prefix-sum twin of ``global_rank``'s two-phase plan:

1. range-repartition by the order keys (one shuffle, sampled balanced
   boundaries) and sort within partitions;
2. one tiny aggregate: per-partition token totals (P rows, P =
   parallelism) → prefix-summed into per-partition offsets on a P-row
   frame;
3. broadcast the offset dim back; each row's global offset = partition
   offset + intra-partition running sum.

The big data is touched by exactly one shuffle; the only global object
is the P-row offset table. The result is **boundary-invariant**: range
partitioning's sampled split points may vary, but "sum of all values
ordered before mine" does not depend on where partition cuts land, so
output is identical at any parallelism (the north_rule local[8] ==
local[32] invariant) — pinned in tests/test_packing.py.

At 100 TB: explode output is ``n_docs + total_tokens/capacity`` rows
(each doc emits one row per sequence it touches; a doc shorter than
``capacity`` usually touches one). Downstream sequence assembly groups
by ``seq_id`` — dense integer ids, so a range repartition co-locates
each sequence's slices with zero skew.

Reference parity: the reference crawler has no packing stage; this is
part of SURVEY.md §2's training-data-pipeline mandate (the step between
a curated corpus and a token-stream dataloader).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count_col


def global_cumsum(
    df: DataFrame,
    order_by: list,
    value_col: str,
    out_col: str = "cum_before",
    n_partitions: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Exclusive global prefix sum of ``value_col`` in ``order_by`` order
    (sum of all strictly-earlier rows; first row gets 0).

    Two-phase distributed plan — see module docstring. ``order_by`` must
    be a total order (ties would make "earlier" ambiguous); callers pass
    a unique key such as ``doc_id``.
    """
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_by).sortWithinPartitions(*order_by)
    # Materialize the partition ids ONCE (same discipline as global_rank:
    # spark_partition_id() is physical-plan-dependent, and the offset
    # branch and the output branch must agree on pids).
    with_pid = parted.withColumn("_pid", F.spark_partition_id()).persist()
    if cache_registry is not None:
        cache_registry.append(with_pid)
    totals = with_pid.groupBy("_pid").agg(F.sum(value_col).alias("_ptotal"))
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_ptotal").over(w), F.lit(0)).cast("long")
    ).select("_pid", "_offset")
    intra = Window.partitionBy("_pid").orderBy(*order_by).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            (
                F.col("_offset")
                + F.coalesce(F.sum(value_col).over(intra), F.lit(0))
            ).cast("long"),
        )
        .drop("_pid", "_offset")
    )


def pack_sequences(
    df: DataFrame,
    capacity: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    eos_tokens: int = 1,
    n_partitions: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Assign every document its slice(s) of the fixed-capacity training
    sequences cut from the concatenated corpus token stream.

    Documents are laid out in ascending ``id_col`` order; each document
    contributes its whitespace token count plus ``eos_tokens`` separator
    tokens. Output one row per (document, sequence it overlaps):

    * ``seq_id``     — 0-based training-sequence index (bigint)
    * ``doc_id``     — the document
    * ``seq_off``    — position within the sequence where this doc's
      slice starts (int, 0..capacity-1)
    * ``doc_off``    — offset within the document's own token stream
      (incl. trailing EOS) where the slice starts (bigint)
    * ``n_toks``     — slice length in tokens (int, ≥1)

    Every column is exact integer arithmetic on the prefix sum, so the
    DuckDB oracle twin reproduces it bit-for-bit.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    cap = F.lit(capacity).cast("long")
    toks = df.select(
        F.col(id_col),
        (token_count_col(F.col(text_col)) + F.lit(eos_tokens)).cast("long").alias(
            "_n_tok"
        ),
    )
    cum = global_cumsum(
        toks,
        [F.col(id_col).asc()],
        "_n_tok",
        out_col="_start",
        n_partitions=n_partitions,
        cache_registry=cache_registry,
    )
    fin = F.col("_start") + F.col("_n_tok")
    s0 = F.floor(F.col("_start") / cap).cast("long")
    s1 = F.floor((fin - 1) / cap).cast("long")
    spans = cum.select(
        F.col(id_col),
        F.col("_start"),
        fin.alias("_fin"),
        F.explode(F.sequence(s0, s1)).alias("seq_id"),
    )
    seq_base = F.col("seq_id") * cap
    slice_start = F.greatest(F.col("_start"), seq_base)
    slice_end = F.least(F.col("_fin"), seq_base + cap)
    return spans.select(
        "seq_id",
        id_col,
        (slice_start - seq_base).cast("int").alias("seq_off"),
        (slice_start - F.col("_start")).cast("long").alias("doc_off"),
        (slice_end - slice_start).cast("int").alias("n_toks"),
    )


def shard_assignment(
    df: DataFrame,
    target_bytes: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    size_col: str | None = None,
) -> DataFrame:
    """Size-balanced output sharding: assign every document to the
    training-data shard file whose byte range its stream offset falls
    in — the deterministic answer to "write this curated corpus as
    ~``target_bytes`` files" that ``repartition(n)`` cannot give
    (hash placement ignores size and changes with partitioning).

    A document is never split: it belongs to shard
    ``floor(offset / target_bytes)`` where ``offset`` is the byte
    prefix-sum of all documents ordered before it (``id_col`` order).
    Shards are therefore contiguous in document order, reproducible on
    any cluster size, and sized within one document of the target — the
    same guarantee a single-writer concatenation would give.

    The prefix sum is :func:`global_cumsum`'s two-phase plan (range
    shuffle + P-row broadcast offset dim) — NEVER a single-partition
    ``SUM() OVER (ORDER BY)``; the naive window is exactly what the
    DuckDB oracle runs to certify it.

    Output: (id_col, n_bytes, offset, shard).
    """
    size = (
        F.col(size_col)
        if size_col
        else F.length(F.col(text_col))
    ).cast("bigint")
    sized = df.select(F.col(id_col), size.alias("n_bytes"))
    cum = global_cumsum(
        sized, order_by=[id_col], value_col="n_bytes", out_col="offset"
    )
    return cum.select(
        id_col,
        "n_bytes",
        F.col("offset").cast("bigint").alias("offset"),
        (F.col("offset") / F.lit(int(target_bytes)))
        .cast("bigint")
        .alias("shard"),
    )


def write_sharded(
    df: DataFrame,
    path: str,
    target_bytes: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the corpus as size-balanced shard directories:
    :func:`shard_assignment` + one shard-keyed repartition +
    ``partitionBy("shard")`` parquet write. Each shard directory holds
    one writer's contiguous document range, so a dataloader can stream
    shards independently with deterministic content."""
    a = shard_assignment(
        df, target_bytes, id_col=id_col, text_col=text_col
    ).select(id_col, "shard")
    (
        df.join(a, id_col)
        .repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def assemble_sequences(
    df: DataFrame,
    capacity: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    eos_tokens: int = 1,
) -> DataFrame:
    """One row per TRAINING SEQUENCE from :func:`pack_sequences`' slice
    rows — the dataloader-facing view: which documents compose each
    sequence, in order, with the boundary offsets an attention mask
    needs so packed documents don't attend across each other.

    Output: (seq_id, n_docs, n_toks, doc_ids, boundaries) where
    ``doc_ids`` is the in-order document list and ``boundaries`` the
    matching sequence offsets (each doc's slice starts at
    boundaries[i], ends at boundaries[i+1] or n_toks). Slices within a
    sequence never overlap by construction, so ``sort_array`` on
    (seq_off, doc_id) structs is a total order and the assembly is
    deterministic at any parallelism.

    Scale shape: one groupBy(seq_id) over the slice rows — dense
    integer keys, bounded group size (≤ capacity slices, typically a
    handful), map-side partial collect. The final sequence table is
    ~total_tokens/capacity rows.
    """
    slices = pack_sequences(
        df, capacity=capacity, text_col=text_col, id_col=id_col,
        eos_tokens=eos_tokens,
    )
    entry = F.struct(
        F.col("seq_off").alias("off"), F.col(id_col).alias("doc")
    )
    g = slices.groupBy("seq_id").agg(
        F.sort_array(F.collect_list(entry)).alias("_e"),
        F.sum("n_toks").cast("int").alias("n_toks"),
    )
    return g.select(
        "seq_id",
        F.size("_e").cast("int").alias("n_docs"),
        "n_toks",
        F.transform(F.col("_e"), lambda e: e["doc"]).alias("doc_ids"),
        F.transform(F.col("_e"), lambda e: e["off"].cast("int")).alias(
            "boundaries"
        ),
    )


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    id_col: str = "seq_id",
    rank_col: str = "position",
    seed: int = 42,
    n_partitions: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Deterministic epoch-wise shuffle of training sequences: the
    dataloader step between :func:`pack_sequences` /
    ``shard_assignment`` and the trainer. Every epoch must present the
    sequences in a different order, but the order must be REPRODUCIBLE
    (resume from step N, re-run on a different cluster size, replay for
    debugging) — so the permutation key is the engine-portable md5
    uniform over ``(id, epoch, seed)``, not an RNG with state.

    ``rank_col`` is the sequence's 1-based position in epoch order,
    assigned by :func:`..operators.frontier.global_rank`'s two-phase
    plan (range shuffle + P-row broadcast offset dim — never a
    single-partition ``ROW_NUMBER() OVER (ORDER BY ..)``). The id is
    the tiebreak after the 32-hex key, making the order total even
    under md5-prefix collisions.

    Scale shape: one range shuffle per epoch over the sequence TABLE
    (ids + offsets — never the token payload, which stays put and is
    fetched by position at read time); everything else is per-row
    codegen.
    """
    from .frontier import global_rank

    key = F.md5(
        F.concat_ws(
            ":",
            F.col(id_col).cast("string"),
            F.lit(str(int(epoch))),
            F.lit(str(int(seed))),
        )
    )
    keyed = df.withColumn("_shuffle_key", key)
    ranked = global_rank(
        keyed,
        rank_col=rank_col,
        n_partitions=n_partitions,
        cache_registry=cache_registry,
        order_by=[F.col("_shuffle_key"), F.col(id_col)],
    )
    return ranked.drop("_shuffle_key")


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG-style document chunking: split each document into
    fixed-token windows with overlap — the retrieval-indexing
    complement of :func:`pack_sequences` (packing CONCATENATES docs
    into training sequences; chunking SPLITS docs into index units
    that preserve local context across boundaries).

    Chunk ``i`` covers tokens ``[i·stride, i·stride + chunk_tokens)``
    with ``stride = chunk_tokens − overlap``; the last chunk is the
    final partial window, and a chunk fully contained in its
    predecessor is never emitted (no trailing duplicate when the tail
    is shorter than the overlap). Tokens are the portable-whitespace
    split; reassembly is a space join (documented lossy re-whitespacing
    — the standard chunker trade).

    Scale shape: per-row JVM expressions end-to-end — ONE
    ``posexplode`` whose fan-out is ``ceil(max(n−overlap,1)/stride)``
    per doc, no shuffle, no Python; output rows carry (id, chunk_ix,
    chunk_text, n_tokens) and downstream embedding/indexing groups on
    keys already present.
    """
    if not 0 <= int(overlap) < int(chunk_tokens):
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    stride = int(chunk_tokens) - int(overlap)
    from ..operators.textstats import WS

    toks = F.filter(
        F.split(F.trim(F.col(text_col)), WS), lambda x: x != ""
    )

    def _windows(tk):
        # number of windows: 1 + ceil(max(n - chunk, 0) / stride), via
        # integral arithmetic; n == 0 → no chunks
        n = F.size(tk)
        extra = F.greatest(n - F.lit(int(chunk_tokens)), F.lit(0))
        n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
            F.lit(1)
            + F.floor((extra + F.lit(stride - 1)) / F.lit(stride)).cast("int")
        )
        return F.when(
            n_chunks > 0,
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(tk, i * stride + 1, int(chunk_tokens)),
            ),
        ).otherwise(F.array().cast("array<array<string>>"))

    from ..operators.textstats import bind_once

    # bind_once: every window slices back into the token array — without
    # the binding the split re-ran once per window and once per size
    # reference (r06)
    out = df.select(
        F.col(id_col),
        F.posexplode(bind_once(toks, _windows)).alias("chunk_ix", "_toks"),
    )
    return out.select(
        id_col,
        "chunk_ix",
        F.array_join("_toks", " ").alias("chunk_text"),
        F.size("_toks").cast("int").alias("n_tokens"),
    )
