"""DX7 SysEx bank codec — pure NumPy, vectorized over whole banks.

Replaces the reference's mido-based reader (dxdata.py:314-318), per-voice
Python unpackers (dxdata.py:175-300) and per-voice packer (dxdata.py:341-397)
with array code: one bank (or a concatenation of many banks) is decoded with a
handful of vectorized integer ops, which is what a TPU-native data loader
wants — the output tensors go straight onto the device.

Bank file layout (dxdata.py:8-74 docstring, verified against the 33 shipped
banks): ``F0 43 00 09 20 00 | 32 x 128 voice bytes | checksum F7`` = 4104
bytes.  Within a voice, operator k (k = 1..6) occupies bytes
``(6-k)*17 .. (6-k)*17+16`` (op6 first), global parameters bytes 102..117,
and the 10-char voice name bytes 118..127.

Byte-level bit splits and the normalization rules (including the
mode-dependent log scaling of fc/ff) mirror dxdata.py:178-206 and 246-262
exactly so the tensors are numerically identical to the reference's.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from dxvae_tpu.data.algorithms import ALGO_ADJ, N_NODES

VOICE_BYTES = 128
VOICES_PER_BANK = 32
HEADER = np.array([0x43, 0x00, 0x09, 0x20, 0x00], dtype=np.uint8)  # Yamaha, 32-voice bulk
BANK_FILE_BYTES = 2 + len(HEADER) + VOICES_PER_BANK * VOICE_BYTES + 1  # F0 ... F7 = 4104
#: 10-char generated-bank voice name "DX-VAE...." (dxdata.py:342)
GEN_NAME = np.array([68, 88, 45, 86, 65, 69, 46, 46, 46, 46], dtype=np.uint8)
#: The reference hardcodes checksum byte 0x58 instead of computing it (dxdata.py:344).
PARITY_CHECKSUM = 0x58

N_PARAMS = 21
SIZE_X = 27

_LOG32 = np.float32(np.log(np.float32(32.0)))
_LOG100 = np.float32(np.log(np.float32(100.0)))


# --------------------------------------------------------------------------- #
# file IO
# --------------------------------------------------------------------------- #

def read_syx(path: str | os.PathLike, verify_checksum: bool = False) -> np.ndarray:
    """Read one .syx bank file -> raw voice bytes ``(32, 128) uint8``.

    Takes the first SysEx message in the file and strips the 5 header bytes
    and the trailing checksum byte.  By default the checksum is not verified
    (matching dxdata.py:314-318); ``verify_checksum=True`` additionally checks
    the stored byte against the DX7 two's-complement sum and raises
    ``ValueError`` on corruption.
    """
    blob = np.fromfile(os.fspath(path), dtype=np.uint8)
    return read_syx_bytes(blob, verify_checksum=verify_checksum, label=str(path))


def read_syx_bytes(blob, verify_checksum: bool = False,
                   label: str = "<bytes>") -> np.ndarray:
    """:func:`read_syx` for an in-memory bank message (bytes or uint8 array)
    — serving requests carry banks as base64, not files."""
    blob = np.frombuffer(blob, np.uint8) if isinstance(
        blob, (bytes, bytearray)) else np.asarray(blob, np.uint8)
    starts = np.flatnonzero(blob == 0xF0)
    if starts.size == 0:
        raise ValueError(f"{label}: no SysEx start byte (F0) found")
    s = int(starts[0])
    ends = np.flatnonzero(blob[s:] == 0xF7)
    if ends.size == 0:
        raise ValueError(f"{label}: unterminated SysEx message")
    data = blob[s + 1 : s + int(ends[0])]  # between F0 and F7
    hdr = data[: len(HEADER)]
    # Yamaha ID, sub-status 0 (any MIDI channel in the low nibble), format 9
    # = 32-voice bulk, byte count 0x2000.  The reference strips these bytes
    # blindly (dxdata.py:315); validating them turns "silently bit-slice a
    # foreign SysEx into garbage" into a clear error (the HTTP serving path
    # feeds user-posted banks straight in here)
    if (hdr.size != len(HEADER) or hdr[0] != 0x43 or (hdr[1] & 0x70) != 0
            or hdr[2] != 0x09 or hdr[3] != 0x20 or hdr[4] != 0x00):
        raise ValueError(
            f"{label}: not a DX7 32-voice bulk dump (header {hdr.tolist()})")
    payload = data[len(HEADER) : -1]  # strip header + checksum
    if payload.size != VOICES_PER_BANK * VOICE_BYTES:
        raise ValueError(
            f"{label}: expected {VOICES_PER_BANK * VOICE_BYTES} voice bytes, got {payload.size}"
        )
    if verify_checksum:
        stored, computed = int(data[-1]), dx7_checksum(payload)
        if stored != computed:
            raise ValueError(
                f"{label}: checksum mismatch (stored 0x{stored:02x}, computed 0x{computed:02x})"
            )
    return payload.reshape(VOICES_PER_BANK, VOICE_BYTES).copy()


def write_syx(path: str | os.PathLike, data: np.ndarray) -> None:
    """Write one SysEx message: ``F0 <data> F7``. ``data`` are 7-bit bytes."""
    data = np.asarray(data, dtype=np.uint8).ravel()
    if np.any(data > 0x7F):
        raise ValueError("SysEx data bytes must be 7-bit")
    blob = np.concatenate([[0xF0], data, [0xF7]]).astype(np.uint8)
    blob.tofile(os.fspath(path))


def dx7_checksum(payload: np.ndarray) -> int:
    """The real DX7 bulk-dump checksum: two's complement of the byte sum, masked to 7 bits."""
    return int((128 - (int(np.asarray(payload, dtype=np.int64).sum()) & 0x7F)) & 0x7F)


# --------------------------------------------------------------------------- #
# unpack: raw voice bytes -> (params, X, adj)
# --------------------------------------------------------------------------- #

def unpack_voices(raw: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode raw voice bytes ``(N, 128)`` into dense graph tensors.

    Returns ``(params (N,7,21) int32, X (N,7,27) float32, adj (N,7,7) float32)``.
    Node 0 is the global node; nodes 1..6 are operators 1..6.  All bit splits,
    clamps and normalizations match dxdata.py:175-300, including:

    * ratio mode (mode==0): ``fc_x = log(fc+1)/log 32``, ``ff_x = log(ff+1)/log 100``,
    * fixed mode  (mode==1): the stored coarse param is reduced to ``fc % 4``
      and scaled linearly (dxdata.py:200-206).
    """
    raw = np.ascontiguousarray(raw)
    if raw.ndim != 2 or raw.shape[1] != VOICE_BYTES:
        raise ValueError(f"expected (N, {VOICE_BYTES}) voice bytes, got {raw.shape}")
    b = raw.astype(np.int32)
    n = b.shape[0]

    # ---- operators (nodes 1..6). Operator k starts at byte (6-k)*17.
    op_off = np.array([(6 - k) * 17 for k in range(1, 7)], dtype=np.int64)  # (6,)
    ob = b[:, op_off[:, None] + np.arange(17)[None, :]]  # (N, 6, 17)

    env = np.clip(ob[..., 0:8], 0, 99)                   # r1..r4, l1..l4
    bp = np.clip(ob[..., 8], 0, 99)                      # level-scale breakpoint
    ld = np.clip(ob[..., 9], 0, 99)                      # left depth
    rd = np.clip(ob[..., 10], 0, 99)                     # right depth
    rc = (ob[..., 11] >> 2) % 4                          # right curve
    lc = ob[..., 11] % 4                                 # left curve
    det = np.clip(ob[..., 12] >> 3, 0, 14)               # detune
    rs = ob[..., 12] % 8                                 # rate scale
    kvs = (ob[..., 13] >> 2) % 8                         # key velocity sensitivity
    ams = ob[..., 13] % 4                                # amp mod sensitivity
    lev = np.clip(ob[..., 14], 0, 99)                    # output level
    fc_raw = (ob[..., 15] >> 1) % 32                     # coarse frequency
    mode = ob[..., 15] % 2                               # 0 = ratio, 1 = fixed
    ff = np.clip(ob[..., 16], 0, 99)                     # fine frequency

    ratio = mode == 0
    fc = np.where(ratio, fc_raw, fc_raw % 4)
    f32 = np.float32
    fc_x = np.where(
        ratio,
        np.log(fc_raw.astype(f32) + f32(1.0)) / _LOG32,
        (fc_raw % 4).astype(f32) / f32(3.0),
    ).astype(f32)
    ff_x = np.where(
        ratio,
        np.log(ff.astype(f32) + f32(1.0)) / _LOG100,
        ff.astype(f32) / f32(99.0),
    ).astype(f32)

    # integer params, layout per dxdata.py:208-224
    p_op = np.stack(
        [lev] + [env[..., i] for i in range(8)]
        + [fc, ff, det, bp, ld, rd, ams, kvs, rs, mode, lc, rc],
        axis=-1,
    ).astype(np.int32)  # (N, 6, 21)

    eye4 = np.eye(4, dtype=f32)
    x_op = np.concatenate(
        [
            (lev.astype(f32) / 99)[..., None],
            env.astype(f32) / 99,
            fc_x[..., None],
            ff_x[..., None],
            (det.astype(f32) / 14)[..., None],
            (bp.astype(f32) / 99)[..., None],
            (ld.astype(f32) / 99)[..., None],
            (rd.astype(f32) / 99)[..., None],
            (ams.astype(f32) / 3)[..., None],
            (kvs.astype(f32) / 7)[..., None],
            (rs.astype(f32) / 7)[..., None],
            mode.astype(f32)[..., None],
            eye4[lc],
            eye4[rc],
        ],
        axis=-1,
    )  # (N, 6, 27)

    # ---- global node (node 0), bytes 102..117 (dxdata.py:246-300)
    p_env = np.clip(b[:, 102:110], 0, 99)
    alg = b[:, 110] % 32
    oks = (b[:, 111] >> 3) % 2
    fb = b[:, 111] % 8
    lfs = np.clip(b[:, 112], 0, 99)
    lfd = np.clip(b[:, 113], 0, 99)
    lpmd = np.clip(b[:, 114], 0, 99)
    lamd = np.clip(b[:, 115], 0, 99)
    lpms = b[:, 116] >> 4
    lfw = np.clip((b[:, 116] >> 1) % 8, 0, 5)
    lks = b[:, 116] % 2
    tsp = np.clip(b[:, 117], 0, 48)

    zeros_i = np.zeros(n, dtype=np.int32)
    p_glob = np.stack(
        [p_env[:, i] for i in range(8)]
        + [tsp, lfs, lfd, lpmd, lamd, fb, lpms, oks, lks, lfw, alg, zeros_i, zeros_i],
        axis=-1,
    ).astype(np.int32)  # (N, 21)

    eye6 = np.eye(6, dtype=f32)
    x_glob = np.concatenate(
        [
            p_env.astype(f32) / 99,
            (tsp.astype(f32) / 48)[:, None],
            (lfs.astype(f32) / 99)[:, None],
            (lfd.astype(f32) / 99)[:, None],
            (lpmd.astype(f32) / 99)[:, None],
            (lamd.astype(f32) / 99)[:, None],
            (fb.astype(f32) / 7)[:, None],
            (lpms.astype(f32) / 7)[:, None],
            oks.astype(f32)[:, None],
            lks.astype(f32)[:, None],
            eye6[lfw],
            np.zeros((n, 4), dtype=f32),
        ],
        axis=-1,
    )  # (N, 27)

    params = np.concatenate([p_glob[:, None, :], p_op], axis=1)       # (N, 7, 21)
    X = np.concatenate([x_glob[:, None, :], x_op], axis=1).astype(f32)  # (N, 7, 27)
    adj = ALGO_ADJ[alg].astype(f32)                                   # (N, 7, 7)
    return params, X, adj


# --------------------------------------------------------------------------- #
# pack: params -> raw voice bytes
# --------------------------------------------------------------------------- #

def pack_voices(params: np.ndarray, names: np.ndarray | None = None) -> np.ndarray:
    """Re-pack integer params ``(N, 7, 21)`` into raw voice bytes ``(N, 128)``.

    Inverse of :func:`unpack_voices` on canonical parameter values; the byte
    composition matches dxdata.py:350-391 (op bytes written op6 -> op1,
    global bytes, then the voice name — "DX-VAE...." by default).
    """
    p = np.asarray(params, dtype=np.int64)
    if p.ndim != 3 or p.shape[1:] != (N_NODES, N_PARAMS):
        raise ValueError(f"expected (N, {N_NODES}, {N_PARAMS}) params, got {p.shape}")
    n = p.shape[0]
    out = np.zeros((n, VOICE_BYTES), dtype=np.int64)

    po = p[:, 1:, :]  # (N, 6, 21) operators 1..6
    lev, fc, ff = po[..., 0], po[..., 9], po[..., 10]
    det, bp, ld, rd = po[..., 11], po[..., 12], po[..., 13], po[..., 14]
    ams, kvs, rs = po[..., 15], po[..., 16], po[..., 17]
    mode, lc, rc = po[..., 18], po[..., 19], po[..., 20]

    op_bytes = np.concatenate(
        [
            po[..., 1:9],                      # env r1..r4 l1..l4
            bp[..., None],
            ld[..., None],
            rd[..., None],
            (rc * 4 + lc)[..., None],
            (det * 8 + rs)[..., None],
            (kvs * 4 + ams)[..., None],
            lev[..., None],
            (fc * 2 + mode)[..., None],
            ff[..., None],
        ],
        axis=-1,
    )  # (N, 6, 17) for operators 1..6

    # operator k is stored at offset (6-k)*17, i.e. op6 first
    for k in range(1, 7):
        off = (6 - k) * 17
        out[:, off : off + 17] = op_bytes[:, k - 1]

    pg = p[:, 0, :]
    tsp, lfs, lfd, lpmd, lamd = pg[:, 8], pg[:, 9], pg[:, 10], pg[:, 11], pg[:, 12]
    fb, lpms, oks, lks, lfw, alg = pg[:, 13], pg[:, 14], pg[:, 15], pg[:, 16], pg[:, 17], pg[:, 18]
    out[:, 102:110] = pg[:, 0:8]
    out[:, 110] = alg
    out[:, 111] = oks * 8 + fb
    out[:, 112] = lfs
    out[:, 113] = lfd
    out[:, 114] = lpmd
    out[:, 115] = lamd
    out[:, 116] = lpms * 16 + lfw * 2 + lks
    out[:, 117] = tsp
    out[:, 118:128] = GEN_NAME[None, :] if names is None else np.asarray(names)

    if np.any((out < 0) | (out > 127)):
        raise ValueError("packed voice bytes out of 7-bit range; params not canonical")
    return out.astype(np.uint8)


def _bank_message(
    params: np.ndarray,
    checksum: str,
    names: np.ndarray | None,
) -> np.ndarray:
    """Unframed bank message ``HEADER | payload | checksum`` for exactly 32
    patches (shared by the file and in-memory serializers)."""
    p = np.asarray(params)
    if p.shape[0] != VOICES_PER_BANK:
        raise ValueError(
            f"a DX7 bank holds exactly {VOICES_PER_BANK} voices, got {p.shape[0]} "
            "(the bulk-dump header hardcodes the 4096-byte payload size)"
        )
    payload = pack_voices(p, names=names).ravel()
    if checksum == "parity":
        ck = PARITY_CHECKSUM
    elif checksum == "computed":
        ck = dx7_checksum(payload)
    else:
        raise ValueError(f"unknown checksum mode {checksum!r}")
    return np.concatenate([HEADER, payload, [ck]]).astype(np.uint8)


def params_to_syx_file(
    params: np.ndarray,
    path: str | os.PathLike,
    checksum: str = "parity",
    names: np.ndarray | None = None,
) -> np.ndarray:
    """Serialize exactly 32 patches to a .syx bank file.

    ``checksum='parity'`` writes the reference's hardcoded 0x58 byte
    (dxdata.py:344) for byte-exact output parity; ``checksum='computed'``
    writes the real DX7 two's-complement checksum.  Returns the full message
    data (without F0/F7 framing).
    """
    data = _bank_message(params, checksum, names)
    write_syx(path, data)
    return data


def params_to_syx_bytes(
    params: np.ndarray,
    checksum: str = "parity",
    names: np.ndarray | None = None,
) -> bytes:
    """The fully framed bank message (``F0 ... F7``, 4104 bytes) as Python
    bytes — the in-memory counterpart of :func:`params_to_syx_file` for
    serving responses (identical validation, checksum modes, and framing;
    these bytes written to a file parse back with :func:`read_syx`)."""
    # no 7-bit re-check here: _bank_message output is pack_voices-validated
    # payload + the constant header + a masked checksum, all provably 7-bit
    # (the guard in write_syx covers arbitrary caller data on the file path)
    data = _bank_message(params, checksum, names)
    return b"\xf0" + data.tobytes() + b"\xf7"
