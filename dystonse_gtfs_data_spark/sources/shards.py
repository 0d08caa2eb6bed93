"""WebDataset-style tar shards — the container format large multimodal
training sets ship in (public convention: webdataset.github.io): each
``.tar`` holds samples as adjacent files sharing a basename stem
(``000001.jpg``, ``000001.json`` …); a shard is the unit of IO and of
parallelism (one ~100 MB–1 GB tar per task — sequential reads, no
per-sample object-store round trips).

Dependency-free: ``binaryFile`` brings whole shards to executors and
stdlib ``tarfile`` unpacks them inside an Arrow-batched ``mapInPandas``
— one output row per SAMPLE with a map of member-extension → bytes,
ready for the multimodal decode seam (operators/multimodal.py).
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SHARD_SAMPLE_SCHEMA = "shard string, sample_key string, members map<string,binary>"


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """One row per sample across every ``.tar`` under ``path``.

    Members are grouped by basename stem; the extension (everything
    after the FIRST dot, the WebDataset convention — so ``x.seg.png``
    keys as ``seg.png``) indexes the bytes map.  Non-file members are
    skipped.  Corrupt shards raise — a half-readable shard means
    truncated training data, which must fail loudly, not shrink."""
    files = spark.read.format("binaryFile").load(path)

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    samples: dict[str, dict[str, bytes]] = {}
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        name = m.name.rsplit("/", 1)[-1]
                        stem, _, ext = name.partition(".")
                        fh = tf.extractfile(m)
                        if fh is None:
                            continue
                        samples.setdefault(stem, {})[ext] = fh.read()
                for key in sorted(samples):
                    rows.append(
                        {
                            "shard": shard_path,
                            "sample_key": key,
                            "members": samples[key],
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return files.mapInPandas(unpack, SHARD_SAMPLE_SCHEMA)


def write_tar_shards(
    docs: DataFrame,
    path: str,
    key_col: str = "doc_id",
    members_from: dict[str, str] | None = None,
    samples_per_shard: int = 1000,
) -> None:
    """Stage a table as tar shards: ``members_from`` maps member
    extension → source column (strings utf-8 encoded, binary passed
    through).  Sharding is deterministic on the key (key // size), so a
    re-run writes byte-identical shards.

    Driver-side staging helper (collects): for fixtures and
    modest exports.  At corpus scale shards are written by the
    producing pipeline per partition (foreachPartition + a tar per
    key-range); the READ path above is the scale-critical half."""
    import os

    members_from = members_from or {"txt": "text"}
    os.makedirs(path, exist_ok=True)
    cols = [key_col, *members_from.values()]
    rows = sorted(
        (tuple(r) for r in docs.select(*cols).collect()), key=lambda t: t[0]
    )
    by_shard: dict[int, list[tuple]] = {}
    for row in rows:
        by_shard.setdefault(int(row[0]) // samples_per_shard, []).append(row)
    for shard_id, members in sorted(by_shard.items()):
        out = os.path.join(path, f"shard-{shard_id:06d}.tar")
        with tarfile.open(out, "w") as tf:
            for row in members:
                key = row[0]
                for (ext, _col), value in zip(
                    members_from.items(), row[1:]
                ):
                    data = (
                        value
                        if isinstance(value, (bytes, bytearray))
                        else str(value).encode("utf-8")
                    )
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # deterministic bytes
                    tf.addfile(info, io.BytesIO(data))
