"""Arrow-batched xxhash64 minhash/simhash signature kernels — /tmp staging
module (imported by executors via spark.python worker path? NO — must be
importable; we inline everything into closures so pickling by value works)."""

from __future__ import annotations

import numpy as np

MERSENNE_P = (1 << 31) - 1
_M64 = (1 << 64) - 1
_SEED = 42


def _make_xxh64_fixed():
    P1 = np.uint64(0x9E3779B185EBCA87)
    P2 = np.uint64(0xC2B2AE3D27D4EB4F)
    P3 = np.uint64(0x165667B19E3779F9)
    P4 = np.uint64(0x85EBCA77C2B2AE63)
    A1 = np.uint64((_SEED + 0x9E3779B185EBCA87 + 0xC2B2AE3D27D4EB4F) & _M64)
    A2 = np.uint64((_SEED + 0xC2B2AE3D27D4EB4F) & _M64)
    A3 = np.uint64(_SEED)
    A4 = np.uint64((_SEED - 0x9E3779B185EBCA87) & _M64)
    HS = np.uint64((_SEED + 0x27D4EB2F165667C5) & _M64)
    P5 = np.uint64(0x27D4EB2F165667C5)

    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    def rnd(acc, lane):
        return rotl(acc + lane * P2, 31) * P1

    def merge(acc, val):
        return (acc ^ rnd(np.uint64(0), val)) * P1 + P4

    def fixed(m):
        rows, n = m.shape

        def u64(i):
            return np.ascontiguousarray(m[:, i : i + 8]).view("<u8").reshape(rows)

        def u32(i):
            return (
                np.ascontiguousarray(m[:, i : i + 4])
                .view("<u4")
                .reshape(rows)
                .astype(np.uint64)
            )

        pos = 0
        if n >= 32:
            v1 = np.full(rows, A1, dtype=np.uint64)
            v2 = np.full(rows, A2, dtype=np.uint64)
            v3 = np.full(rows, A3, dtype=np.uint64)
            v4 = np.full(rows, A4, dtype=np.uint64)
            while pos + 32 <= n:
                v1 = rnd(v1, u64(pos))
                v2 = rnd(v2, u64(pos + 8))
                v3 = rnd(v3, u64(pos + 16))
                v4 = rnd(v4, u64(pos + 24))
                pos += 32
            h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
            h = merge(h, v1)
            h = merge(h, v2)
            h = merge(h, v3)
            h = merge(h, v4)
        else:
            h = np.full(rows, HS, dtype=np.uint64)
        h = h + np.uint64(n)
        while pos + 8 <= n:
            h = h ^ rnd(np.uint64(0), u64(pos))
            h = rotl(h, 27) * P1 + P4
            pos += 8
        if pos + 4 <= n:
            h = h ^ (u32(pos) * P1)
            h = rotl(h, 23) * P2 + P3
            pos += 4
        while pos < n:
            h = h ^ (m[:, pos].astype(np.uint64) * P5)
            h = rotl(h, 11) * P1
            pos += 1
        h = h ^ (h >> np.uint64(33))
        h = h * P2
        h = h ^ (h >> np.uint64(29))
        h = h * P3
        h = h ^ (h >> np.uint64(32))
        return h

    return fixed


def xxhash64_spans(buf, starts, lens, _fixed=_make_xxh64_fixed()):
    out = np.empty(len(starts), dtype=np.uint64)
    for L in np.unique(lens):
        sel = np.nonzero(lens == L)[0]
        if L == 0:
            m = np.empty((len(sel), 0), dtype=np.uint8)
        else:
            m = buf[starts[sel][:, None] + np.arange(L)]
        out[sel] = _fixed(m)
    return out.view(np.int64)


def doc_token_spans(texts):
    bufs = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    doc_off = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum(lens, out=doc_off[1:])
    buf = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    sep_all = np.nonzero(buf == 32)[0].astype(np.int64)
    # assign separators to docs, build per-doc token boundaries
    tok_starts_parts, tok_ends_parts = [], []
    doc_tok = np.zeros(len(bufs) + 1, dtype=np.int64)
    total = 0
    sep_doc = np.searchsorted(doc_off[1:], sep_all, side="right")
    for i in range(len(bufs)):
        lo, hi = doc_off[i], doc_off[i + 1]
        seps = sep_all[np.searchsorted(sep_all, lo) : np.searchsorted(sep_all, hi)]
        starts = np.concatenate(([lo], seps + 1))
        ends = np.concatenate((seps, [hi]))
        tok_starts_parts.append(starts)
        tok_ends_parts.append(ends)
        total += len(starts)
        doc_tok[i + 1] = total
    if tok_starts_parts:
        tok_starts = np.concatenate(tok_starts_parts)
        tok_ends = np.concatenate(tok_ends_parts)
    else:
        tok_starts = np.zeros(0, np.int64)
        tok_ends = np.zeros(0, np.int64)
    return buf, tok_starts, tok_ends, doc_tok


def minhash_signatures_kernel(docs, text_col, id_col, num_hashes, shingle_k):
    """Bit-identical to the JVM xxhash64 minhash_signatures path."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    import sys as _sys

    _sys.path.insert(0, "/root/repo")
    from dystonse_gtfs_data_spark.operators.dedup import _hash_family, _spread

    id_field = docs.schema[id_col]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("signature", T.ArrayType(T.LongType(), False), False),
        ]
    )
    fam = np.asarray(_hash_family(num_hashes), dtype=np.int64)
    A, B = fam[:, 0][:, None], fam[:, 1][:, None]
    P = np.int64(MERSENNE_P)
    k = shingle_k
    spans_fn = doc_token_spans
    hash_fn = xxhash64_spans

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["_j"].notna()
            ids = pdf[id_col][mask].to_numpy()
            texts = pdf["_j"][mask].tolist()
            if not len(texts):
                continue
            buf, tok_starts, tok_ends, doc_tok = spans_fn(texts)
            sh_starts_parts, sh_lens_parts = [], []
            doc_sh = np.zeros(len(texts) + 1, dtype=np.int64)
            tot = 0
            for i in range(len(texts)):
                a, b = doc_tok[i], doc_tok[i + 1]
                n = b - a
                kk = k if k < n else n
                m = n - kk + 1
                s = tok_starts[a : a + m]
                e = tok_ends[a + kk - 1 : a + kk - 1 + m]
                sh_starts_parts.append(s)
                sh_lens_parts.append(e - s)
                tot += m
                doc_sh[i + 1] = tot
            sh_starts = np.concatenate(sh_starts_parts)
            sh_lens = np.concatenate(sh_lens_parts)
            h = hash_fn(buf, sh_starts, sh_lens)
            with np.errstate(over="ignore"):
                hp = np.abs(h)
            hm = np.fmod(hp, P)
            aff = np.fmod(hm[None, :] * A + B, P)
            sigs = np.minimum.reduceat(aff, doc_sh[:-1], axis=1).T
            yield pd.DataFrame({id_col: ids, "signature": list(sigs)})

    joined = _spread(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.array_join(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), " "
        ).alias("_j"),
    )
    return joined.mapInPandas(run, out_schema)


def simhash_kernel(docs, text_col, id_col, bits=64):
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    import sys as _sys

    _sys.path.insert(0, "/root/repo")
    from dystonse_gtfs_data_spark.operators.dedup import _spread

    id_field = docs.schema[id_col]
    out_schema = T.StructType(
        [id_field, T.StructField("simhash", T.LongType(), False)]
    )
    spans_fn = doc_token_spans
    hash_fn = xxhash64_spans

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["_j"].notna()
            ids = pdf[id_col][mask].to_numpy()
            texts = pdf["_j"][mask].tolist()
            if not len(texts):
                continue
            buf, tok_starts, tok_ends, doc_tok = spans_fn(texts)
            th = hash_fn(buf, tok_starts, tok_ends - tok_starts)
            bmat = (
                (th[:, None] >> np.arange(64, dtype=np.int64)) & 1
            ).astype(np.int64)
            setcnt = np.add.reduceat(bmat, doc_tok[:-1], axis=0)
            ntok = np.diff(doc_tok)
            sign = (2 * setcnt) > ntok[:, None]
            powers = np.left_shift(
                np.uint64(1), np.arange(64, dtype=np.uint64)
            )
            sig = np.where(sign, powers[None, :], np.uint64(0)).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.DataFrame({id_col: ids, "simhash": sig.view(np.int64)})

    joined = _spread(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.array_join(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), " "
        ).alias("_j"),
    )
    return joined.mapInPandas(run, out_schema)
