"""Training-sequence packing (operators/packing.py): the two-phase
global prefix sum must equal the naive single-window layout, be
invariant to parallelism, satisfy the packing algebra (every sequence
except the last is exactly full), and compile to the scale plan (one
range shuffle, broadcast offset dim, no SinglePartition window on the
data path)."""

import contextlib
import io
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.operators.packing import (
    global_cumsum,
    pack_sequences,
)
from xrpl_rich_list_py_crawler_spark.operators.textstats import (
    bpe_merge_pairs,
    token_count_col,
)

CAP = 64


def _docs(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, ""),  # empty doc: contributes exactly the 1 EOS token
        (2, "one two three " * 40),  # 120 tokens: spans >1 sequence at CAP=64
        (3, "x"),
        (4, "  padded   whitespace\ttokens\n here  "),
        (5, "word " * 200),  # 200 tokens: spans 3+ sequences
    ] + [(10 + i, f"doc {i} body with a few tokens {i}") for i in range(40)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_global_cumsum_matches_naive_window(spark):
    d = _docs(spark).select(
        "doc_id", (token_count_col(F.col("text")) + 1).alias("v")
    )
    got = {
        r["doc_id"]: r["c"]
        for r in global_cumsum(
            d, [F.col("doc_id").asc()], "v", out_col="c", n_partitions=5
        ).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["doc_id"]: r["c"]
        for r in d.withColumn(
            "c", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_pack_sequences_algebra(spark):
    d = _docs(spark)
    out = pack_sequences(d, capacity=CAP).collect()
    n_tok = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", (token_count_col(F.col("text")) + 1).alias("n")
        ).collect()
    }
    total = sum(n_tok.values())

    # every doc's slices cover exactly its token count, contiguously
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_tok)
    for doc, slices in by_doc.items():
        slices.sort(key=lambda r: r["seq_id"])
        assert sum(s["n_toks"] for s in slices) == n_tok[doc]
        assert slices[0]["doc_off"] == 0
        for a, b in zip(slices, slices[1:]):
            assert b["seq_id"] == a["seq_id"] + 1  # consecutive sequences
            assert b["doc_off"] == a["doc_off"] + a["n_toks"]
            assert a["seq_off"] + a["n_toks"] == CAP  # a fills its seq tail
            assert b["seq_off"] == 0  # b starts the next seq

    # every sequence except the last is exactly full
    by_seq: dict = {}
    for r in out:
        by_seq.setdefault(r["seq_id"], 0)
        by_seq[r["seq_id"]] += r["n_toks"]
    last = max(by_seq)
    assert set(by_seq) == set(range(last + 1))  # dense seq ids
    for s, filled in by_seq.items():
        assert filled == (CAP if s < last else total - last * CAP)

    # the long docs really do span multiple sequences
    assert len(by_doc[2]) >= 2 and len(by_doc[5]) >= 3
    # the empty doc contributes its single EOS token
    assert sum(s["n_toks"] for s in by_doc[1]) == 1


def test_pack_sequences_parallelism_invariant(spark):
    d = _docs(spark)
    a = sorted(map(tuple, pack_sequences(d, capacity=CAP, n_partitions=1).collect()))
    b = sorted(map(tuple, pack_sequences(d, capacity=CAP, n_partitions=7).collect()))
    assert a == b


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_pack_sequences_plan_is_two_phase(spark, sf_dir):
    """The scale contract: ONE range shuffle of the data, the offset dim
    joined broadcast, and every window partitioned by _pid — never a
    SinglePartition window over the corpus (the whole point vs the naive
    ``SUM() OVER (ORDER BY)`` the DuckDB oracle runs)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    plan = _plan(pack_sequences(docs, capacity=256))
    assert "rangepartitioning" in plan.lower()
    assert "BroadcastHashJoin" in plan
    # the only SinglePartition exchange allowed is the P-row offset branch
    # (input to the tiny offsets window), never the doc-data branch: the
    # data-side window partitions by _pid
    assert "partitionBy=[_pid]" in plan.replace(" ", "") or "_pid" in plan


def test_bpe_merge_pairs_topk_is_parallel(spark, sf_dir):
    """bpe_merge_pairs' top-k must compile to TakeOrderedAndProject with
    the rank window above it (same discipline as unigram_vocab,
    VERDICT r04 #2)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    plan = _plan(bpe_merge_pairs(docs, k=200))
    assert "TakeOrderedAndProject" in plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")
    assert "Python" not in plan  # pure JVM end to end


def test_bpe_merge_pairs_counts_known_corpus(spark):
    # "aaab" -> pairs: (a a)x2, (a b)x1 per occurrence; two docs share it
    d = spark.createDataFrame(
        [(0, "aaab aaab"), (1, "aaab"), (2, "xy")], ["doc_id", "text"]
    )
    got = {r["pair"]: (r["cnt"], r["rank"]) for r in bpe_merge_pairs(d).collect()}
    assert got == {"a a": (6, 1), "a b": (3, 2), "x y": (1, 3)}


def test_shard_assignment_laws(spark, tmp_path):
    """Offsets are the exact prefix sum in doc_id order; shards are
    contiguous, start at 0, and every shard except possibly the last
    reaches the byte target; assignment is invariant to input
    partitioning; write_sharded round-trips content by shard."""
    import random

    from xrpl_rich_list_py_crawler_spark.operators.packing import (
        shard_assignment,
        write_sharded,
    )

    rng = random.Random(7)
    rows = [(i, "x" * rng.randint(1, 400)) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    target = 3000
    got = {
        r.doc_id: (r.n_bytes, r.offset, r.shard)
        for r in shard_assignment(df, target).collect()
    }
    off = 0
    for i, t in rows:
        assert got[i] == (len(t), off, off // target), i
        off += len(t)
    shards = [got[i][2] for i, _ in rows]
    assert shards == sorted(shards) and shards[0] == 0
    sizes = {}
    for i, t in rows:
        sizes[got[i][2]] = sizes.get(got[i][2], 0) + len(t)
    for s in range(max(shards)):
        assert sizes[s] >= target - 400  # within one doc of target
    got8 = {
        r.doc_id: (r.n_bytes, r.offset, r.shard)
        for r in shard_assignment(df.repartition(8), target).collect()
    }
    assert got == got8
    out = str(tmp_path / "shards")
    write_sharded(df, out, target)
    back = spark.read.parquet(out)
    assert back.count() == 300
    joined = {r.doc_id: r.shard for r in back.collect()}
    assert all(joined[i] == got[i][2] for i, _ in rows)


def test_assemble_sequences_boundaries(spark):
    """Assembly laws: boundaries start at 0 and strictly ascend; every
    sequence except the last is exactly at capacity; doc order within a
    sequence matches ascending seq_off; totals reconcile with the slice
    rows; result is partitioning-invariant."""
    from xrpl_rich_list_py_crawler_spark.operators.packing import (
        assemble_sequences,
        pack_sequences,
    )

    rows = [(i, " ".join(["w"] * (5 + (i * 7) % 40))) for i in range(80)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cap = 64
    seqs = {r.seq_id: r for r in assemble_sequences(df, capacity=cap).collect()}
    last = max(seqs)
    for sid, r in seqs.items():
        assert r.boundaries[0] == 0
        assert list(r.boundaries) == sorted(set(r.boundaries))
        assert r.n_docs == len(r.doc_ids) == len(r.boundaries)
        if sid != last:
            assert r.n_toks == cap
    slices = pack_sequences(df, capacity=cap).collect()
    by_seq = {}
    for s in slices:
        by_seq.setdefault(s.seq_id, []).append(s)
    for sid, ss in by_seq.items():
        ss.sort(key=lambda s: (s.seq_off, s.doc_id))
        assert [s.doc_id for s in ss] == list(seqs[sid].doc_ids)
        assert [s.seq_off for s in ss] == list(seqs[sid].boundaries)
        assert sum(s.n_toks for s in ss) == seqs[sid].n_toks
    again = {
        r.seq_id: (list(r.doc_ids), list(r.boundaries))
        for r in assemble_sequences(df.repartition(16), capacity=cap).collect()
    }
    assert again == {
        k: (list(v.doc_ids), list(v.boundaries)) for k, v in seqs.items()
    }


# ---------------------------------------------------------------------------
# epoch shuffle
# ---------------------------------------------------------------------------


def test_epoch_shuffle_is_a_permutation(spark):
    from xrpl_rich_list_py_crawler_spark.operators.packing import (
        epoch_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(100)], ["seq_id"])
    got = epoch_shuffle(df, epoch=1).collect()
    assert sorted(r.position for r in got) == list(range(1, 101))
    # and it actually shuffles: identity order would be astronomical
    assert [r.seq_id for r in sorted(got, key=lambda r: r.position)] != list(
        range(100)
    )


def test_epoch_shuffle_epochs_differ_runs_repeat(spark):
    from xrpl_rich_list_py_crawler_spark.operators.packing import (
        epoch_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(60)], ["seq_id"])

    def order(epoch, parts):
        out = epoch_shuffle(df.repartition(parts, "seq_id"), epoch=epoch)
        return tuple(
            r.seq_id for r in sorted(out.collect(), key=lambda r: r.position)
        )

    assert order(1, 1) == order(1, 7)      # reproducible at any layout
    assert order(1, 1) != order(2, 1)      # new permutation per epoch


def test_epoch_shuffle_plan_is_two_phase(spark):
    from xrpl_rich_list_py_crawler_spark.operators.packing import (
        epoch_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(50)], ["seq_id"])
    plan = (
        epoch_shuffle(df, epoch=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# unigram-LM tokenizer (SentencePiece hard-EM)
# ---------------------------------------------------------------------------

_UNI_TEXTS = [
    "the cat sat on the mat",
    "the cats sat",
    "a catalog of cats",
    "matting the mat",
    "dogs and cats and dogs",
] * 3


def _uni_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(_UNI_TEXTS)], ["doc_id", "text"]
    )


def test_unigram_train_matches_python_reference(spark):
    from xrpl_rich_list_py_crawler_spark.operators.unigram import (
        py_unigram_train,
        unigram_lm_train,
    )

    got = [
        (r.piece, r.cnt)
        for r in unigram_lm_train(
            _uni_df(spark), vocab_size=30, n_iter=2, seed_size=100
        ).collect()
    ]
    assert got == py_unigram_train(
        _UNI_TEXTS, vocab_size=30, n_iter=2, seed_size=100
    )
    # the vocabulary learned real subwords, not just chars
    pieces = {p for p, _ in got}
    assert "the" in pieces and "cats" in pieces


def test_unigram_train_coverage_and_invariance(spark):
    from xrpl_rich_list_py_crawler_spark.operators.unigram import (
        unigram_lm_train,
    )

    df = _uni_df(spark)
    a = unigram_lm_train(
        df.repartition(1), vocab_size=25, n_iter=1, seed_size=80
    ).collect()
    b = unigram_lm_train(
        df.repartition(7, "doc_id"), vocab_size=25, n_iter=1, seed_size=80
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # coverage: every char of the corpus units survives pruning
    import re

    from xrpl_rich_list_py_crawler_spark.operators.textstats import BPE_UNIT

    corpus_chars = {
        c for t in _UNI_TEXTS for u in re.findall(BPE_UNIT, t) for c in u
    }
    assert corpus_chars <= {r.piece for r in a if len(r.piece) == 1}


def test_unigram_encode_laws(spark):
    from xrpl_rich_list_py_crawler_spark.operators.unigram import (
        _probs,
        _viterbi,
        py_unigram_train,
        unigram_encode_counts,
    )

    df = _uni_df(spark)
    pieces = dict(
        py_unigram_train(_UNI_TEXTS, vocab_size=30, n_iter=1, seed_size=100)
    )
    got = {r.doc_id: r for r in unigram_encode_counts(df, pieces).collect()}
    assert set(got) == set(range(len(_UNI_TEXTS)))  # spine complete
    # twin check on one doc: per-unit Viterbi lengths sum
    import re

    from xrpl_rich_list_py_crawler_spark.operators.textstats import BPE_UNIT

    probs = _probs(pieces)
    units0 = re.findall(BPE_UNIT, _UNI_TEXTS[0])
    want = sum(len(_viterbi(u, probs, 6)) for u in units0)
    assert got[0].n_pieces == want and got[0].n_units == len(units0)
    # bounds: 1 <= pieces per unit <= unit length
    for r in got.values():
        assert r.n_units <= r.n_pieces


# ---------------------------------------------------------------------------
# RAG chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_window_arithmetic(spark):
    from xrpl_rich_list_py_crawler_spark.operators.packing import (
        chunk_documents,
    )

    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame(
        [
            (1, " ".join(toks)),        # 10 tokens → chunks at 0,3,6 (c4 o1)
            (2, "a b c"),               # fits one chunk exactly? 3 < 4 → 1
            (3, ""),                    # empty: no rows
            (4, "x"),                   # single token
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_id, r.chunk_ix): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    }
    # stride 3: windows [0:4],[3:7],[6:10] — covers all 10, overlap 1
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert got[(1, 2)] == ("t6 t7 t8 t9", 4)
    assert (1, 3) not in got
    assert got[(2, 0)] == ("a b c", 3)
    assert not any(d == 3 for d, _ in got)
    assert got[(4, 0)] == ("x", 1)
    # every token of doc 1 appears in some chunk (coverage law)
    covered = set()
    for (d, _), (text, _) in got.items():
        if d == 1:
            covered.update(text.split())
    assert covered == set(toks)


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from xrpl_rich_list_py_crawler_spark.operators.packing import (
        chunk_documents,
    )

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_documents_plan_is_shuffle_free(spark):
    from xrpl_rich_list_py_crawler_spark.operators.packing import (
        chunk_documents,
    )

    df = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    plan = (
        chunk_documents(df, chunk_tokens=3, overlap=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
