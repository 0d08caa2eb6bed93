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

    Driver-side staging helper (collects): for fixtures and modest
    exports.  At corpus scale use ``write_tar_shards_distributed`` —
    same layout and byte-identical output, written executor-side."""
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


def write_tar_shards_distributed(
    docs: DataFrame,
    path: str,
    key_col: str = "doc_id",
    members_from: dict[str, str] | None = None,
    samples_per_shard: int = 1000,
) -> list[tuple[str, int]]:
    """Executor-side tar-shard writer — the production form of
    ``write_tar_shards``: nothing but the per-shard manifest ever
    reaches the driver.

    Layout and bytes are IDENTICAL to the staging helper: shard id is
    ``floor(key / samples_per_shard)``, members are emitted in key order
    with mtime 0, so a re-run (or a migration from the staging writer)
    produces byte-identical shards.  The plan is one hash shuffle on the
    shard id (`repartition(shard)` co-locates each shard's samples in
    one task) + a within-partition sort; each task then streams its
    shards sequentially — one open tar at a time, state carried across
    Arrow batches, memory O(largest member), not O(shard).

    Returns the manifest ``[(shard_file, n_samples), ...]`` (one row per
    shard — small by construction; collecting it IS the action that
    runs the write).
    """
    import os

    from pyspark.sql import functions as F

    members_from = dict(members_from or {"txt": "text"})
    exts = list(members_from.keys())
    cols = list(members_from.values())
    os.makedirs(path, exist_ok=True)

    staged = (
        docs.select(
            F.col(key_col).cast("long").alias("__key"),
            *[F.col(c).alias(f"__m{i}") for i, c in enumerate(cols)],
        )
        .withColumn(
            "__shard",
            F.floor(F.col("__key") / F.lit(samples_per_shard)).cast("long"),
        )
        .repartition("__shard")
        .sortWithinPartitions("__shard", "__key")
    )

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # attempt-safety: speculative execution or a zombie retry can run
        # TWO attempts of this partition concurrently against the same
        # shared storage.  Each attempt writes to an attempt-unique temp
        # name and atomically renames into place at close — attempts
        # produce byte-identical tars (deterministic member order, mtime
        # 0), so whichever rename lands last leaves a complete, correct
        # file instead of two handles interleaving writes into one path.
        from pyspark import TaskContext

        tc = TaskContext.get()
        attempt = tc.taskAttemptId() if tc is not None else os.getpid()

        cur_shard: int | None = None
        cur_tf: tarfile.TarFile | None = None
        cur_file: str | None = None
        cur_tmp: str | None = None
        cur_n = 0
        manifest: list[dict] = []

        def close_current() -> None:
            nonlocal cur_tf
            if cur_tf is not None:
                cur_tf.close()
                os.rename(cur_tmp, cur_file)  # atomic publish
                manifest.append({"shard_file": cur_file, "n_samples": cur_n})
                cur_tf = None

        for pdf in batches:
            # plain tuples (name=None): itertuples would mangle the
            # underscore-prefixed staging names.  Column order is the
            # select order: __key, __m0.., then __shard appended last.
            for row in pdf.itertuples(index=False, name=None):
                key = int(row[0])
                shard = int(row[-1])
                if shard != cur_shard:
                    close_current()
                    cur_shard = shard
                    cur_file = os.path.join(path, f"shard-{shard:06d}.tar")
                    cur_tmp = f"{cur_file}.attempt-{attempt}"
                    cur_tf = tarfile.open(cur_tmp, "w")
                    cur_n = 0
                cur_n += 1
                for i, ext in enumerate(exts):
                    value = row[1 + i]
                    data = (
                        bytes(value)
                        if isinstance(value, (bytes, bytearray))
                        else str(value).encode("utf-8")
                    )
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # deterministic bytes
                    cur_tf.addfile(info, io.BytesIO(data))
        close_current()
        if manifest:
            yield pd.DataFrame(manifest)

    manifest_df = staged.mapInPandas(
        write_partition, "shard_file string, n_samples long"
    )
    return sorted(
        (r["shard_file"], int(r["n_samples"])) for r in manifest_df.collect()
    )
