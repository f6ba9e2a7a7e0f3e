"""Model layer: the DX-VAE graph variational autoencoder, TPU-native.

Pure-function JAX implementation (params as a pytree) of the reference's
``DXVAE(nn.Module)`` (model.py:10-391): asynchronous-message-passing GRU
encoder, autoregressive node-and-edge decoder, teacher-forced ELBO loss.
"""

from dxvae_tpu.models.dxvae import (
    DXVAEConfig,
    LossWeights,
    init_params,
    param_count,
    encode,
    decode,
    elbo_loss,
    forward,
    generate,
    alg_head_logits,
)

__all__ = [
    "DXVAEConfig",
    "LossWeights",
    "init_params",
    "param_count",
    "encode",
    "decode",
    "elbo_loss",
    "forward",
    "generate",
    "alg_head_logits",
]
