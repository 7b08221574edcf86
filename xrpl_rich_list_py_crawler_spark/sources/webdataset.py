"""WebDataset-style tar shard sink/source.

Large-scale (especially multimodal) training loaders consume the corpus
as TAR SHARDS of samples — the WebDataset convention: each sample is a
group of members sharing a key (``{key}.txt``, ``{key}.json``,
``{key}.jpg`` …), shards are a few hundred MB, and the loader streams
tars sequentially. This module is the engine's export/import pair for
that format, the dataloader-facing sibling of the WARC pair
(:mod:`.warc` is the crawl-facing container).

**Determinism contract.** A tar archive embeds metadata that would
normally make output bytes run-dependent; every such field is pinned so
the SAME rows produce the SAME shard bytes at any parallelism, restart,
or build host (the repo-wide reproducibility discipline):

* POSIX ustar format, ``mtime=0``, ``uid=gid=0``, empty ``uname`` /
  ``gname``, mode ``0644``;
* members ordered by (sample key, member name) — a total order;
* sample keys must be unique per shard (caller contract; the natural
  key is the doc id).

Builders run as ``applyInPandas`` over ``groupBy(shard)`` — binary
container assembly is exactly the Python-is-acceptable case (same
stance as ``to_warc_files``): the bytes themselves are the product, no
expression could stay JVM-side. Shard size is the caller's lever via
its shard assignment (pair with ``curation.shard_assignment``'s
size-balanced split); one shard must fit executor memory, which is the
WebDataset shape anyway (hundreds of MB).

Read side: one row per (shard, member) via ``mapInPandas`` over binary
shard blobs — file-per-task parallelism, no shuffle, the
``sources.warc.read_warc`` shape.
"""

from __future__ import annotations

import io
import tarfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of :func:`to_tar_shards`
TAR_SHARD_SCHEMA = "shard string, content binary, n_members long"

#: output schema of :func:`parse_tar_df`
TAR_MEMBER_SCHEMA = "shard string, key string, member string, payload binary"


def _tar_info(name: str, size: int) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name=name)
    ti.size = size
    ti.mtime = 0
    ti.uid = 0
    ti.gid = 0
    ti.uname = ""
    ti.gname = ""
    ti.mode = 0o644
    return ti


def to_tar_shards(
    samples: DataFrame,
    shard_col: str = "shard",
    key_col: str = "key",
    member_col: str = "member",
    payload_col: str = "payload",
) -> DataFrame:
    """Fold sample members into deterministic tar shard blobs.

    Input: one row per member — (shard, key, member, payload binary);
    ``member`` is the full member filename (``{key}.txt`` etc, the
    caller formats it so exotic extensions need no schema change).
    Output: one row per shard — (shard, content, n_members).
    """

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key_col, member_col])
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tf:
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col] or b"")
                tf.addfile(
                    _tar_info(str(row[member_col]), len(payload)),
                    io.BytesIO(payload),
                )
        return pd.DataFrame(
            {
                "shard": [str(pdf[shard_col].iloc[0])],
                "content": [buf.getvalue()],
                "n_members": [len(pdf)],
            }
        )

    return samples.groupBy(shard_col).applyInPandas(
        build, schema=TAR_SHARD_SCHEMA
    )


def parse_tar_df(shards: DataFrame, strict: bool = True) -> DataFrame:
    """Parse (shard, content) blobs back to one row per member.

    ``key`` is the member name up to its FIRST dot (the WebDataset
    sample-grouping rule — ``x.seg.json`` groups under ``x``).
    ``strict=False`` skips undecodable blobs instead of raising (the
    crawl-ingestion stance for third-party shards).
    """

    def parse(batches):
        for pdf in batches:
            out = {"shard": [], "key": [], "member": [], "payload": []}
            for _, row in pdf.iterrows():
                blob = bytes(row["content"])
                try:
                    tf = tarfile.open(
                        fileobj=io.BytesIO(blob), mode="r"
                    )
                    members = tf.getmembers()
                except tarfile.TarError:
                    if strict:
                        raise
                    continue
                for m in members:
                    if not m.isfile():
                        continue
                    out["shard"].append(str(row["shard"]))
                    out["key"].append(m.name.split(".", 1)[0])
                    out["member"].append(m.name)
                    f = tf.extractfile(m)
                    out["payload"].append(f.read() if f else b"")
            yield pd.DataFrame(out)

    return shards.mapInPandas(parse, schema=TAR_MEMBER_SCHEMA)


def read_tar_shards(spark, path: str, strict: bool = True) -> DataFrame:
    """Read ``*.tar`` files under ``path`` as member rows — binaryFile
    scan (file-per-task) → :func:`parse_tar_df`; the WebDataset loader
    front door."""
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("shard"),
            F.col("content"),
        )
    )
    return parse_tar_df(blobs, strict=strict)
