import numpy as np
import pytest

from pbwt_tpu.core import pack3 as p3


def test_roundtrip_simple():
    y = np.array([0, 0, 0, 1, 1, 0, 1, 0, 0, 0], dtype=np.uint8)
    buf = p3.pack3(y)
    Y, offs = p3.unpack_all(buf, len(y))
    assert Y.shape == (1, len(y))
    assert (Y[0] == y).all()
    assert offs[-1] == len(buf)


@pytest.mark.parametrize("seed", range(5))
def test_roundtrip_random(seed):
    rng = np.random.RandomState(seed)
    M = int(rng.randint(1, 300))
    Y = (rng.random_sample((17, M)) < rng.random_sample((17, 1))).astype(np.uint8)
    buf, offs = p3.pack_columns(Y)
    Y2, offs2 = p3.unpack_all(buf, M, 17)
    assert (Y == Y2).all()
    assert (offs == offs2).all()


def test_long_runs():
    # exercise all three encoding tiers plus the >=63488 repeat loop
    for n in [1, 63, 64, 2047, 2048, 63487, 63488, 63489, 200000]:
        y = np.ones(n, dtype=np.uint8)
        buf = p3.pack3(y)
        Y, _ = p3.unpack_all(buf, n)
        assert (Y[0] == 1).all()


def test_greedy_encoding_bytes():
    # run of 63 zeros: single byte 0x3f
    assert p3.pack3(np.zeros(63, np.uint8)) == bytes([63])
    # run of 64 zeros: 0x40|1 (1<<6)
    assert p3.pack3(np.zeros(64, np.uint8)) == bytes([0x41])
    # run of 65: 0x41 then 0x01
    assert p3.pack3(np.zeros(65, np.uint8)) == bytes([0x41, 0x01])
    # ones have the top bit set
    assert p3.pack3(np.ones(63, np.uint8)) == bytes([0x80 | 63])
    # 2048 zeros -> 0x60|1
    assert p3.pack3(np.zeros(2048, np.uint8)) == bytes([0x61])
    # 63488 zeros -> 0x7f
    assert p3.pack3(np.zeros(63488, np.uint8)) == bytes([0x7F])


def test_pack_columns_matches_per_column():
    rng = np.random.RandomState(0)
    Y = (rng.random_sample((9, 40)) < 0.3).astype(np.uint8)
    buf, offs = p3.pack_columns(Y)
    per_col = b"".join(p3.pack3(Y[i]) for i in range(9))
    assert buf == per_col
