"""Native (C++) codec parity vs the NumPy codec — bit-exact contract."""

import numpy as np
import pytest

from dxvae_tpu.data import sysex
from dxvae_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def test_native_unpack_matches_numpy(bank_files):
    raw = np.concatenate([sysex.read_syx(f) for f in bank_files])
    p_np, x_np, a_np = sysex.unpack_voices(raw)
    p_c, x_c, a_c = native.unpack_voices(raw)
    np.testing.assert_array_equal(p_c, p_np)
    np.testing.assert_array_equal(a_c, a_np)
    # float features: same formulas in float32; allow 1-ulp libm drift on logs
    np.testing.assert_allclose(x_c, x_np, rtol=0, atol=2e-7)


def test_native_pack_matches_numpy(bank_files):
    raw = sysex.read_syx(bank_files[0])
    p, _, _ = sysex.unpack_voices(raw)
    np.testing.assert_array_equal(native.pack_voices(p), sysex.pack_voices(p))


def test_native_pack_range_check():
    bad = np.zeros((1, 7, 21), np.int32)
    bad[0, 1, 0] = 200  # lev out of 7-bit range
    with pytest.raises(ValueError):
        native.pack_voices(bad)


def test_native_pack_per_voice_names(bank_files):
    """Per-voice names must match the NumPy codec byte-for-byte (the C ABI
    takes one name; the wrapper stamps the rest) and reject non-7-bit bytes."""
    raw = sysex.read_syx(bank_files[0])
    p, _, _ = sysex.unpack_voices(raw)
    rng = np.random.default_rng(0)
    names = rng.integers(32, 127, (len(p), 10)).astype(np.uint8)
    np.testing.assert_array_equal(
        native.pack_voices(p, names=names), sysex.pack_voices(p, names=names)
    )
    one = np.frombuffer(b"TESTNAME..", np.uint8)
    np.testing.assert_array_equal(
        native.pack_voices(p, names=one), sysex.pack_voices(p, names=one)
    )
    with pytest.raises(ValueError):
        native.pack_voices(p, names=np.full((10,), 0xC8, np.uint8))
    # int inputs that would wrap modulo 256 under a uint8 cast (e.g. 256 -> 0)
    # must be rejected the same way the NumPy codec rejects them (ADVICE r2)
    for bad in (np.full((10,), 256, np.int64), np.full((10,), -1, np.int64)):
        with pytest.raises(ValueError):
            native.pack_voices(p, names=bad)
        with pytest.raises(ValueError):
            sysex.pack_voices(p, names=bad)


def test_native_checksum(bank_files):
    raw = sysex.read_syx(bank_files[0])
    payload = sysex.pack_voices(sysex.unpack_voices(raw)[0]).ravel()
    assert native.dx7_checksum(payload) == sysex.dx7_checksum(payload)


def test_native_roundtrip_speed(bank_files):
    """Sanity bound, not a benchmark: the native codec must not be a dramatic
    regression vs NumPy on bulk decode (min-of-3 each to ride out scheduler
    noise; it is usually much faster, but a one-shot wall-clock race would be
    flaky on a loaded host)."""
    import time

    raw = np.concatenate([sysex.read_syx(f) for f in bank_files])
    raw = np.tile(raw, (8, 1))  # ~8.4k voices

    def best_of(fn, k=3):
        ts = []
        for _ in range(k):
            t0 = time.perf_counter()
            fn(raw)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_native = best_of(native.unpack_voices)
    t_numpy = best_of(sysex.unpack_voices)
    assert t_native < t_numpy * 2.0, (t_native, t_numpy)
