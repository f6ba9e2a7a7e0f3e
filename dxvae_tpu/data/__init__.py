"""Data layer: DX7 SysEx codec, algorithm topology table, dataset.

Replaces the reference's mido + DGL data stack (dxdata.py) with a pure-NumPy,
fully vectorized codec producing dense tensors ready for the TPU model.
"""

from dxvae_tpu.data.algorithms import (
    ALGO_ADJ,
    ALGO_EDGES,
    N_ALGORITHMS,
    N_NODES,
    automorphisms,
    orbit_augment,
)
from dxvae_tpu.data.sysex import (
    read_syx,
    write_syx,
    unpack_voices,
    pack_voices,
    params_to_syx_file,
    VOICE_BYTES,
    VOICES_PER_BANK,
    BANK_FILE_BYTES,
)
from dxvae_tpu.data.dataset import DXDataset

__all__ = [
    "ALGO_ADJ",
    "ALGO_EDGES",
    "N_ALGORITHMS",
    "N_NODES",
    "automorphisms",
    "orbit_augment",
    "read_syx",
    "write_syx",
    "unpack_voices",
    "pack_voices",
    "params_to_syx_file",
    "DXDataset",
    "VOICE_BYTES",
    "VOICES_PER_BANK",
    "BANK_FILE_BYTES",
]
