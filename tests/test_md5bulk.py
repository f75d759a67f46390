"""md5bulk: the vectorized single-block MD5 behind q_dup_spans' r15
kernel must be bit-identical to hashlib on the portable-u32 lattice —
including the seams (non-ASCII fallback, over-length fallback, empty
batch). hashlib is the third implementation here (engine numpy kernel,
DuckDB oracle md5, stdlib hashlib)."""

import hashlib
import random

import numpy as np
import pytest

from hadoop_gpu_spark.dedup.md5bulk import (
    SINGLE_BLOCK_MAX,
    hash_grams_u32,
    md5_u32,
)


def _want(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def _grams(t: str, k: int) -> np.ndarray:
    cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    return np.ascontiguousarray(np.lib.stride_tricks.sliding_window_view(cp, k))


@pytest.mark.parametrize("length", [1, 5, 20, 54, SINGLE_BLOCK_MAX])
def test_md5_u32_matches_hashlib(length):
    rng = random.Random(1000 + length)
    msgs = [bytes(rng.randrange(256) for _ in range(length)) for _ in range(500)]
    arr = np.frombuffer(b"".join(msgs), dtype=np.uint8).reshape(-1, length)
    got = md5_u32(arr)
    assert got.dtype == np.int64
    assert got.tolist() == [int(hashlib.md5(m).hexdigest()[:8], 16) for m in msgs]


def test_md5_u32_crosses_row_block_boundary():
    # > _ROW_BLOCK rows exercises the cache-blocked loop and its tail.
    from hadoop_gpu_spark.dedup.md5bulk import _ROW_BLOCK

    n = _ROW_BLOCK + 7
    arr = np.random.default_rng(7).integers(0, 256, size=(n, 20), dtype=np.uint8)
    got = md5_u32(arr)
    idx = [0, 1, _ROW_BLOCK - 1, _ROW_BLOCK, n - 1]
    for i in idx:
        assert got[i] == int(hashlib.md5(arr[i].tobytes()).hexdigest()[:8], 16)


def test_md5_u32_rejects_multiblock_lengths():
    with pytest.raises(ValueError):
        md5_u32(np.zeros((3, SINGLE_BLOCK_MAX + 1), dtype=np.uint8))
    with pytest.raises(ValueError):
        md5_u32(np.zeros((3, 8), dtype=np.int64))


def test_hash_grams_ascii_and_nonascii_rows_agree_with_hashlib():
    texts = [
        "hello world this is a plain ascii document",
        "héllo wörld ünïcode ⊕⊗ test 文字列テスト continues here and on",
        "mixed ascii then ünicode in the middle then ascii again okay",
        "\U0001f600 astral-plane codepoints surround this ascii middle \U0001f680",
    ]
    k = 20
    for t in texts:
        got = hash_grams_u32(_grams(t, k))
        want = [_want(t[i : i + k]) for i in range(len(t) - k + 1)]
        assert got.tolist() == want, t


def test_hash_grams_over_length_k_falls_back_whole_batch():
    # k > SINGLE_BLOCK_MAX: every row takes the hashlib fallback path.
    t = "x" + "abcdefghij" * 8  # 81 chars
    k = SINGLE_BLOCK_MAX + 5
    got = hash_grams_u32(_grams(t, k))
    assert got.tolist() == [_want(t[i : i + k]) for i in range(len(t) - k + 1)]


def test_hash_grams_empty_batch():
    assert hash_grams_u32(np.empty((0, 20), dtype=np.uint32)).shape == (0,)
