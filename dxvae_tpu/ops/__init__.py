"""TPU compute ops: the message-passing propagate step and Pallas kernels."""

from dxvae_tpu.ops.propagate import PropState, pack_gate_mapper, gated_aggregate

__all__ = ["PropState", "pack_gate_mapper", "gated_aggregate"]
