"""SysEx codec unit tests (SURVEY.md §4 unit tier).

The key gate: byte-exact round-trip ``bytes -> params -> bytes`` over all
shipped banks (voice-name bytes excluded — the packer intentionally stamps
"DX-VAE...." like the reference, dxdata.py:342), plus pack/unpack inverse
properties and framing validation.
"""

import numpy as np
import pytest

from dxvae_tpu.data import sysex
from dxvae_tpu.data.algorithms import ALGO_ADJ, ALGO_EDGES


def test_read_all_banks(bank_files):
    for f in bank_files:
        raw = sysex.read_syx(f)
        assert raw.shape == (32, 128)
        assert raw.dtype == np.uint8
        assert raw.max() <= 0x7F


def test_bank_count(bank_files):
    # 32 SynprezFM banks + Dexed_01 = 33 banks = 1056 voices
    assert len(bank_files) == 33


def test_roundtrip_byte_exact(bank_files):
    """Round-trip gates over all 33 shipped banks:

    1. the *semantic* round trip params -> bytes -> params is exact for every
       voice (unpack(pack(p)) == p), i.e. packing is a right inverse;
    2. bytes -> params -> bytes is byte-exact wherever the source bytes are
       canonical.  Some shipped voices are non-canonical — they use
       fixed-frequency mode with fc > 3 (which the decode rules reduce to
       fc % 4, dxdata.py:204) or out-of-range values that the decoder clamps —
       so the reference's own packer could not reproduce them either.  The
       canonical count is pinned (911/1056) to catch codec regressions;
    3. diffs occur only at lossy byte positions (op bytes 13/15/16 and the
       global oks/fb byte 111).
    """
    lossy_op_bytes = {13, 15, 16}
    n_exact = 0
    n_total = 0
    for f in bank_files:
        raw = sysex.read_syx(f)
        params, X, adj = sysex.unpack_voices(raw)
        packed = sysex.pack_voices(params)
        # semantic exactness + idempotence: second cycle is a fixed point
        params2, X2, adj2 = sysex.unpack_voices(packed)
        np.testing.assert_array_equal(params, params2)
        np.testing.assert_allclose(X, X2, rtol=0, atol=0)
        np.testing.assert_array_equal(adj, adj2)
        np.testing.assert_array_equal(sysex.pack_voices(params2), packed)

        d = packed[:, :118] != raw[:, :118]
        for pos in np.flatnonzero(d.any(axis=0)):
            pos = int(pos)
            if pos < 102:
                assert pos % 17 in lossy_op_bytes, f"{f.name}: unexpected diff at op byte {pos}"
            else:
                assert pos == 111, f"{f.name}: unexpected diff at global byte {pos}"
        exact = ~d.any(axis=1)
        n_exact += int(exact.sum())
        n_total += exact.size
    assert n_total == 1056
    assert n_exact == 911, f"{n_exact}/{n_total} voices byte-exact (expected 911)"


def test_unpack_shapes_and_ranges(dataset):
    b = dataset.batch
    n = len(dataset)
    assert n == 1056  # 33 banks x 32 voices (fresh build includes Dexed_01)
    assert b.X.shape == (n, 7, 27) and b.X.dtype == np.float32
    assert b.params.shape == (n, 7, 21) and b.params.dtype == np.int32
    assert b.adj.shape == (n, 7, 7)
    assert np.isfinite(b.X).all()
    assert b.X.min() >= 0.0 and b.X.max() <= 1.0
    # algorithm id lives in params[:, 0, 18] only, never in X (dxdata.py:278)
    assert b.params[:, 0, 18].min() >= 0 and b.params[:, 0, 18].max() <= 31
    # padding dims
    assert np.all(b.params[:, 0, 19:21] == 0)
    assert np.all(b.X[:, 0, 23:27] == 0)


def test_adjacency_matches_algorithm(dataset):
    b = dataset.batch
    alg = b.params[:, 0, 18]
    np.testing.assert_array_equal(b.adj, ALGO_ADJ[alg].astype(b.adj.dtype))


def test_algo_table_invariants():
    assert ALGO_ADJ.shape == (32, 7, 7)
    for a in range(32):
        adj = ALGO_ADJ[a]
        # node 0 (output) has in-edges and no out-edges
        assert adj[:, 0].any() and not adj[0, :].any()
        # exactly one feedback path per algorithm (DX7 hardware fact):
        # 30 algorithms use an operator self-loop; algorithms 4 and 6
        # (indices 3, 5) route feedback around a multi-op cycle instead
        if a in (3, 5):
            assert np.trace(adj.astype(np.int32)) == 0
            # the cycle exists: some node reachable from itself
            reach = adj.astype(bool)
            closure = reach.copy()
            for _ in range(7):
                closure = closure | (closure @ reach)
            assert closure.diagonal().any()
        else:
            assert np.trace(adj.astype(np.int32)) == 1
        # every operator 1..6 modulates or outputs somewhere
        assert all(adj[i, :].any() for i in range(1, 7))
        assert len(ALGO_EDGES[a]) == int(adj.sum())


def test_one_hot_features(dataset):
    X = dataset.batch.X
    # operator lc/rc one-hots (dims 19:23, 23:27) sum to 1
    np.testing.assert_array_equal(X[:, 1:, 19:23].sum(-1), 1.0)
    np.testing.assert_array_equal(X[:, 1:, 23:27].sum(-1), 1.0)
    # global lfw one-hot (dims 17:23)
    np.testing.assert_array_equal(X[:, 0, 17:23].sum(-1), 1.0)


def test_mode_dependent_frequency_normalization(dataset):
    b = dataset.batch
    p_op, x_op = b.params[:, 1:], b.X[:, 1:]
    mode = p_op[..., 18]
    fc, ff = p_op[..., 9], p_op[..., 10]
    ratio = mode == 0
    np.testing.assert_allclose(
        x_op[..., 9][ratio],
        np.log(fc[ratio].astype(np.float32) + 1) / np.float32(np.log(np.float32(32.0))),
        rtol=1e-6,
    )
    fixed = ~ratio
    if fixed.any():
        assert fc[fixed].max() <= 3  # fixed-mode coarse reduced to fc % 4
        np.testing.assert_allclose(x_op[..., 9][fixed], fc[fixed] / 3.0, rtol=1e-6)
        np.testing.assert_allclose(x_op[..., 10][fixed], ff[fixed] / 99.0, rtol=1e-6)


def test_bank_serialization(tmp_path, dataset):
    p32 = dataset.batch.params[:32]
    out = tmp_path / "gen.syx"
    data = sysex.params_to_syx_file(p32, out, checksum="parity")
    blob = np.fromfile(out, dtype=np.uint8)
    assert blob.size == sysex.BANK_FILE_BYTES == 4104
    assert blob[0] == 0xF0 and blob[-1] == 0xF7
    np.testing.assert_array_equal(blob[1:6], sysex.HEADER)
    assert blob[-2] == sysex.PARITY_CHECKSUM  # reference-hardcoded 0x58 (dxdata.py:344)
    # name bytes are "DX-VAE...."
    np.testing.assert_array_equal(blob[6 + 118 : 6 + 128], sysex.GEN_NAME)
    # computed-checksum mode writes a valid DX7 checksum
    sysex.params_to_syx_file(p32, out, checksum="computed")
    blob = np.fromfile(out, dtype=np.uint8)
    payload_plus_ck = blob[6:-1].astype(np.int64)
    assert (payload_plus_ck.sum() & 0x7F) == 0

    with pytest.raises(ValueError):
        sysex.params_to_syx_file(dataset.batch.params[:31], out)  # exactly 32 required


def test_generated_reference_bank_parses():
    """The reference's own generated bank (generated/gen_patch.syx) must parse."""
    import os

    if not os.path.exists("/root/reference/generated/gen_patch.syx"):
        pytest.skip("reference tree not mounted")
    raw = sysex.read_syx("/root/reference/generated/gen_patch.syx")
    params, X, adj = sysex.unpack_voices(raw)
    assert params.shape == (32, 7, 21)
    # and survive our round trip byte-exactly (it was produced by the same
    # packing rules, incl. the DX-VAE name)
    np.testing.assert_array_equal(sysex.pack_voices(params), raw)


def test_dataset_cache_roundtrip(tmp_path):
    from dxvae_tpu.data.dataset import DXDataset

    d1 = DXDataset("/root/reference/DX_data", save_dir=tmp_path, include="synprez")
    assert len(d1) == 1024  # baseline-parity subset (shipped DXDataset.bin count)
    d2 = DXDataset("/root/reference/DX_data", save_dir=tmp_path, include="synprez")
    np.testing.assert_array_equal(d1.batch.X, d2.batch.X)
    np.testing.assert_array_equal(d1.batch.params, d2.batch.params)
    # consistent indexing contract (reference dataset[0] was cache/fresh
    # asymmetric, dxdata.py:325-335)
    g = d1[0]
    assert g.X.shape == (1, 7, 27)
    sub = d1[10:20]
    assert len(sub) == 10


def test_dataset_cache_never_writes_into_reference_mount(tmp_path, monkeypatch):
    """save_dir=None must not drop cache files into the read-only upstream
    mount: caches redirect to ~/.cache/dxvae_tpu (or $DXVAE_CACHE_DIR), and
    a plain user raw_dir still caches in place (reference convention)."""
    from pathlib import Path

    from dxvae_tpu.data.dataset import _default_save_dir, _NO_CACHE_ROOT

    assert _default_save_dir(_NO_CACHE_ROOT / "DX_data") == (
        Path.home() / ".cache" / "dxvae_tpu")
    assert _default_save_dir(tmp_path) == tmp_path
    # a generic unwritable raw_dir falls back too (os.access says no)
    monkeypatch.setattr("dxvae_tpu.data.dataset.os.access",
                        lambda p, m: False)
    assert _default_save_dir(tmp_path) == Path.home() / ".cache" / "dxvae_tpu"
    monkeypatch.undo()
    monkeypatch.setenv("DXVAE_CACHE_DIR", str(tmp_path / "env_cache"))
    assert _default_save_dir(_NO_CACHE_ROOT / "DX_data") == tmp_path / "env_cache"


def test_algo_table_matches_reference_spec():
    """Cross-check the transcribed routing table against the reference's
    DX_ALGO literal (dxdata.py:140-171), parsed as *data* via ast."""
    import ast
    import re
    from pathlib import Path

    ref = Path("/root/reference/dxdata.py")
    if not ref.exists():
        pytest.skip("reference tree not mounted")
    m = re.search(r"self\.DX_ALGO = (\{.*?\})\n\s*super", ref.read_text(), re.S)
    table = ast.literal_eval(m.group(1))
    for a in range(32):
        srcs, dsts = table[a]
        assert sorted(zip(srcs, dsts)) == sorted(ALGO_EDGES[a]), f"algorithm {a} mismatch"


def canonical_random_params(n: int, seed: int = 42) -> np.ndarray:
    """Random (n, 7, 21) parameter tensors with every value on its DX7 grid
    (the codec's canonical domain) — shared by the fuzz property test here and
    the verbatim-reference serializer fuzz in test_reference_exec."""
    rng = np.random.default_rng(seed)
    highs_op = [99] + [99] * 8 + [31, 99, 14, 99, 99, 99, 3, 7, 7, 1, 3, 3]
    p = np.zeros((n, 7, 21), np.int32)
    for d, hi in enumerate(highs_op):
        p[:, 1:, d] = rng.integers(0, hi + 1, (n, 6))
    # fixed-mode coarse is canonical only in 0..3 (dxdata.py:204)
    fixed = p[:, 1:, 18] == 1
    p[:, 1:, 9] = np.where(fixed, p[:, 1:, 9] % 4, p[:, 1:, 9])
    highs_glob = [99] * 8 + [48, 99, 99, 99, 99, 7, 7, 1, 1, 5, 31, 0, 0]
    for d, hi in enumerate(highs_glob):
        p[:, 0, d] = rng.integers(0, hi + 1, n)
    return p


def test_pack_unpack_fuzz_property():
    """Property: for ANY canonical parameter tensor (values on the DX7 grids),
    pack -> unpack is the identity."""
    p = canonical_random_params(256)

    raw = sysex.pack_voices(p)
    p2, X2, adj2 = sysex.unpack_voices(raw)
    np.testing.assert_array_equal(p2, p)
    np.testing.assert_array_equal(adj2, ALGO_ADJ[p[:, 0, 18]].astype(adj2.dtype))
    # and the native codec agrees
    from dxvae_tpu.data import native

    if native.available():
        np.testing.assert_array_equal(native.pack_voices(p), raw)
        np.testing.assert_array_equal(native.unpack_voices(raw)[0], p)


def test_read_syx_verify_checksum_all_banks(bank_files):
    """All 33 shipped banks carry valid DX7 two's-complement checksums; the
    verify_checksum read mode accepts every one of them."""
    for f in bank_files:
        sysex.read_syx(f, verify_checksum=True)


def test_read_syx_verify_checksum_detects_corruption(bank_files, tmp_path):
    blob = np.fromfile(bank_files[0], dtype=np.uint8)
    blob[100] ^= 0x01  # flip one payload bit
    bad = tmp_path / "corrupt.syx"
    blob.tofile(bad)
    sysex.read_syx(bad)  # default mode stays permissive (reference parity)
    with pytest.raises(ValueError, match="checksum mismatch"):
        sysex.read_syx(bad, verify_checksum=True)


def test_reference_generated_bank_fails_verification():
    """The reference's own generated bank hardcodes checksum 0x58
    (dxdata.py:344) and is NOT a valid DX7 dump — verify mode catches it."""
    from pathlib import Path

    gen = Path("/root/reference/generated/gen_patch.syx")
    if not gen.exists():
        pytest.skip("reference generated bank not mounted")
    with pytest.raises(ValueError, match="checksum mismatch"):
        sysex.read_syx(gen, verify_checksum=True)


def test_project_topology_minimal_hamming_and_tiebreak():
    """project_topology must (a) return exact rows of ALGO_ADJ, (b) achieve
    the brute-force minimum Hamming distance, (c) break ties by the supplied
    algorithm-head scores, and (d) be identity on already-valid topologies."""
    import numpy as np

    from dxvae_tpu.data.algorithms import ALGO_ADJ, project_topology

    rng = np.random.default_rng(0)
    adj = (rng.random((64, 7, 7)) < 0.15).astype(np.float32)
    proj, k = project_topology(adj)
    table = ALGO_ADJ.astype(np.float32)
    d_all = np.abs(adj[:, None] - table[None]).sum(axis=(2, 3))  # (64, 32)
    np.testing.assert_array_equal(proj, table[k])
    np.testing.assert_array_equal(d_all[np.arange(64), k], d_all.min(axis=1))
    # no scores: ties go to the lowest algorithm index
    for i in range(64):
        ties = np.flatnonzero(d_all[i] == d_all[i].min())
        assert k[i] == ties[0]

    # with scores: among minimal-distance algorithms, the best score wins —
    # and a huge score on a non-minimal algorithm must NOT override distance
    scores = rng.normal(size=(64, 32))
    scores[:, 0] += 1000.0  # tempt the tie-break to violate minimality
    proj_s, k_s = project_topology(adj, alg_scores=scores)
    np.testing.assert_array_equal(d_all[np.arange(64), k_s], d_all.min(axis=1))
    for i in range(64):
        ties = np.flatnonzero(d_all[i] == d_all[i].min())
        assert k_s[i] == ties[np.argmax(scores[i, ties])]

    # identity on valid topologies, recovering the right algorithm index
    proj_v, k_v = project_topology(ALGO_ADJ.astype(np.float32))
    np.testing.assert_array_equal(proj_v, ALGO_ADJ.astype(np.float32))
    np.testing.assert_array_equal(k_v, np.arange(32))


def test_read_syx_bytes_rejects_foreign_header():
    """A 4104-byte SysEx that is NOT a DX7 32-voice bulk dump (wrong vendor,
    wrong format, non-zero sub-status) must raise, not bit-slice into
    garbage tensors — the HTTP serving path feeds user uploads straight in.
    A non-zero MIDI channel in the header's low nibble stays accepted."""
    import pytest

    from dxvae_tpu.data.sysex import HEADER, dx7_checksum, read_syx_bytes

    payload = np.zeros(32 * 128, np.uint8)

    def frame(header):
        data = np.concatenate([header, payload,
                               [np.uint8(dx7_checksum(payload))]]).astype(np.uint8)
        return b"\xf0" + data.tobytes() + b"\xf7"

    assert read_syx_bytes(frame(HEADER)).shape == (32, 128)
    ch3 = HEADER.copy(); ch3[1] = 0x03  # sub-status 0, MIDI channel 3: valid
    assert read_syx_bytes(frame(ch3)).shape == (32, 128)
    for i, bad in ((0, 0x41), (1, 0x10), (2, 0x08), (3, 0x00), (4, 0x01)):
        h = HEADER.copy(); h[i] = bad
        with pytest.raises(ValueError, match="not a DX7"):
            read_syx_bytes(frame(h))


def test_dataset_indexing_contract(tmp_path):
    """dataset[idx] is always a length-1 GraphBatch for ANY integer type,
    and out-of-range indices raise like the reference's list-of-graphs."""
    import pytest

    from dxvae_tpu.data.dataset import DXDataset

    ds = DXDataset("/root/reference/DX_data", save_dir=tmp_path, include="synprez")
    for idx in (5, np.int64(5), np.int32(5)):
        g = ds[idx]
        assert len(g) == 1 and g.X.shape == (1, 7, 27), type(idx)
    assert len(ds[-1]) == 1
    with pytest.raises(IndexError):
        ds[len(ds)]
    with pytest.raises(IndexError):
        ds[-len(ds) - 1]
    with pytest.raises(ValueError, match="include"):
        DXDataset("/root/reference/DX_data", save_dir=tmp_path, include="Synprez")


def test_graphbatch_tile_to():
    from dxvae_tpu.graph import GraphBatch

    g = GraphBatch(X=np.arange(3 * 7 * 27, dtype=np.float32).reshape(3, 7, 27),
                   params=np.arange(3 * 7 * 21, dtype=np.int32).reshape(3, 7, 21),
                   adj=np.zeros((3, 7, 7), bool))
    t = g.tile_to(8)
    assert len(t) == 8 and t.adj.dtype == np.float32
    np.testing.assert_array_equal(t.X[3:6], g.X)      # cycles the corpus
    np.testing.assert_array_equal(t.X[6:8], g.X[:2])  # partial final cycle
    assert len(g.tile_to(2)) == 2                     # slice-down case
