"""Checkpoint save / load / torch import.

Improves on the reference (model.py:388, torch.save of the weights only,
non-atomic, optimizer state lost on resume — SURVEY.md §5):

* a checkpoint is a single ``.npz`` of the flattened pytree (params +
  optimizer state + step + PRNG key), written atomically (tmp + rename), so a
  crash can never leave a torn file;
* ``save_checkpoint(..., params_only=True)`` preserves the reference's
  "weights only / resume restarts AdamW moments" mode for API parity;
* :func:`import_torch_state_dict` maps a reference ``.chk`` state_dict
  (model.py:23-72 module names) onto our pytree weight-for-weight, for
  checkpoint-parity runs when a torch checkpoint exists.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: dict):
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path
        )
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        saved = flat[key]
        if saved.shape != np.asarray(leaf).shape:
            raise ValueError(f"shape mismatch for {key}: {saved.shape} vs {np.asarray(leaf).shape}")
        leaves.append(saved.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path, state, params_only: bool = False) -> None:
    """Atomically save a TrainState (or bare params pytree if params_only)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if params_only or not hasattr(state, "params"):
        tree = {"params": state if not hasattr(state, "params") else state.params}
    else:
        tree = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    flat = {f"t/{k}": v for k, v in _flatten(tree).items()}
    # pid-unique (concurrent writers must not share a tmp file) and
    # .npz-suffixed (np.savez appends it otherwise)
    tmp = path.with_name(f"{path.name}.tmp.{os.getpid()}.npz")
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_checkpoint(path, template):
    """Load into the structure of ``template`` (a TrainState or params pytree).

    If the file only holds params (reference-parity weights-only mode) and the
    template is a TrainState, only ``template.params`` is replaced.
    """
    with np.load(Path(path)) as z:
        flat = {k[2:]: z[k] for k in z.files}
    has_opt = any(k.startswith("opt_state/") for k in flat)
    params_flat = {k[len("params/") :]: v for k, v in flat.items() if k.startswith("params/")}
    if hasattr(template, "params"):
        params = _unflatten_like(template.params, params_flat)
        if has_opt:
            opt_flat = {
                k[len("opt_state/") :]: v for k, v in flat.items() if k.startswith("opt_state/")
            }
            opt_state = _unflatten_like(template.opt_state, opt_flat)
            step = flat.get("step", np.zeros((), np.int32))
            return template._replace(
                params=params, opt_state=opt_state, step=np.asarray(step, np.int32)
            )
        return template._replace(params=params)
    return _unflatten_like(template, params_flat)


#: reference nn.Module attribute name -> our pytree key (same tensor layouts)
_TORCH_NAME_MAP = {
    "combin_encode": "enc_combiner",
    "loop_encode": "enc_looper",
    "root_encode": "enc_rooter",
    "combin_decode": "dec_combiner",
    "loop_decode": "dec_looper",
    "root_decode": "dec_rooter",
}
_TORCH_GRU_FIELDS = {
    "weight_ih": "w_ih",
    "weight_hh": "w_hh",
    "bias_ih": "b_ih",
    "bias_hh": "b_hh",
}


def import_torch_state_dict(state_dict, template_params) -> dict:
    """Convert a reference DXVAE torch state_dict (tensor name -> array) into
    our parameter pytree.  Accepts either torch tensors or numpy arrays.

    Name scheme on the torch side (model.py:23-72): GRU cells are flat modules
    (``combin_encode.weight_ih`` ...), Sequential heads index their Linear
    layers (``h_to_x0.0.weight``, ``h_to_x0.2.weight``, ``h_to_x0.4.weight`` —
    ReLUs occupy odd slots), ``h_to_std``/``z_to_h``/``gate``/``mapper`` wrap a
    single Linear at slot 0.
    """
    sd = {}
    for k, v in state_dict.items():
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    out = jax.tree.map(lambda x: x, template_params)  # shallow copy

    def put(dst_key, sub_key, arr):
        tgt = out[dst_key] if not isinstance(sub_key, tuple) else out[dst_key][sub_key[0]]
        field = sub_key if not isinstance(sub_key, tuple) else sub_key[1]
        if np.asarray(tgt[field]).shape != arr.shape:
            raise ValueError(f"{dst_key}.{sub_key}: shape {arr.shape} != {np.asarray(tgt[field]).shape}")
        tgt[field] = arr

    for tname, jname in _TORCH_NAME_MAP.items():
        for tf, jf in _TORCH_GRU_FIELDS.items():
            put(jname, jf, sd[f"{tname}.{tf}"])

    # single-linear (possibly Sequential-wrapped) heads
    def seq_linear(prefix, dst, slot=None):
        pw = f"{prefix}.weight" if slot is None else f"{prefix}.{slot}.weight"
        pb = f"{prefix}.bias" if slot is None else f"{prefix}.{slot}.bias"
        put(dst, "w", sd[pw])
        if pb in sd:
            put(dst, "b", sd[pb])

    seq_linear("h_to_mu", "h_to_mu")
    seq_linear("h_to_std", "h_to_std", 0)
    seq_linear("z_to_h", "z_to_h", 0)
    seq_linear("gate", "gate", 0)
    seq_linear("mapper", "mapper", 0)

    # MLP heads: Linear layers at even Sequential slots
    for head, n_layers in (("h_to_x0", 3), ("h_to_x", 3), ("h_to_edge_self", 2), ("h_to_edge", 2)):
        for li in range(n_layers):
            slot = 2 * li
            put(head, (li, "w"), sd[f"{head}.{slot}.weight"])
            put(head, (li, "b"), sd[f"{head}.{slot}.bias"])

    return out


def export_torch_state_dict(params) -> dict:
    """Inverse of :func:`import_torch_state_dict`: our pytree -> a dict of
    numpy arrays keyed with the reference's state_dict names (loadable into
    the torch model after tensor conversion)."""
    sd = {}
    for tname, jname in _TORCH_NAME_MAP.items():
        for tf, jf in _TORCH_GRU_FIELDS.items():
            sd[f"{tname}.{tf}"] = np.asarray(params[jname][jf])
    sd["h_to_mu.weight"] = np.asarray(params["h_to_mu"]["w"])
    sd["h_to_mu.bias"] = np.asarray(params["h_to_mu"]["b"])
    for name in ("h_to_std", "z_to_h", "gate", "mapper"):
        sd[f"{name}.0.weight"] = np.asarray(params[name]["w"])
        if "b" in params[name]:
            sd[f"{name}.0.bias"] = np.asarray(params[name]["b"])
    for head, n_layers in (("h_to_x0", 3), ("h_to_x", 3), ("h_to_edge_self", 2), ("h_to_edge", 2)):
        for li in range(n_layers):
            sd[f"{head}.{2 * li}.weight"] = np.asarray(params[head][li]["w"])
            sd[f"{head}.{2 * li}.bias"] = np.asarray(params[head][li]["b"])
    return sd


def infer_sizes(path) -> tuple[int, int]:
    """(size_h, size_z) read off the stored tensor shapes of an .npz
    checkpoint — lets tools load non-default model sizes without flags."""
    with np.load(Path(path)) as z:
        flat = {k[2:]: z[k] for k in z.files}
    return int(flat["params/enc_combiner/w_hh"].shape[1]), int(flat["params/h_to_mu/w"].shape[0])


def convert_checkpoint(src, dst) -> None:
    """Two-way checkpoint conversion between this framework's ``.npz`` and the
    reference's torch ``.chk`` state_dict format (model.py:388), so users can
    move weights in either direction.  Direction is inferred from the source
    extension; model sizes (size_H / size_Z) are inferred from the stored
    tensor shapes, so non-default model sizes convert without flags."""
    import torch

    from dxvae_tpu.models import DXVAEConfig, init_params

    src, dst = Path(src), Path(dst)
    if src.suffix == ".npz":
        size_h, size_z = infer_sizes(src)
        template = init_params(jax.random.PRNGKey(0), DXVAEConfig(size_h=size_h, size_z=size_z))
        params = load_checkpoint(src, template)
        sd = {k: torch.from_numpy(v.copy()) for k, v in export_torch_state_dict(params).items()}
        torch.save(sd, dst)
    else:
        sd = torch.load(src, map_location="cpu")
        size_h = sd["combin_encode.weight_hh"].shape[1]
        size_z = sd["h_to_mu.weight"].shape[0]
        template = init_params(jax.random.PRNGKey(0), DXVAEConfig(size_h=size_h, size_z=size_z))
        params = import_torch_state_dict(sd, jax.tree.map(np.asarray, template))
        save_checkpoint(dst, params, params_only=True)


# --------------------------------------------------------------------------- #
# orbax backend (optional)
# --------------------------------------------------------------------------- #
# The npz format above is the default (single-file, atomic, dependency-free).
# For production serving stacks standardized on orbax, the same state can be
# written/read as an orbax PyTree checkpoint directory.

def save_checkpoint_orbax(path, state, params_only: bool = False) -> None:
    """Save a TrainState (or bare params) as an orbax PyTree checkpoint."""
    import orbax.checkpoint as ocp

    if params_only or not hasattr(state, "params"):
        tree = {"params": state if not hasattr(state, "params") else state.params}
    else:
        tree = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    tree = jax.tree.map(np.asarray, tree)
    ocp.PyTreeCheckpointer().save(os.fspath(Path(path).absolute()), tree, force=True)


def load_checkpoint_orbax(path, template):
    """Restore from an orbax checkpoint into ``template``'s structure (a
    TrainState or a params pytree); weights-only checkpoints restore params
    only, like :func:`load_checkpoint`."""
    import orbax.checkpoint as ocp

    tree = ocp.PyTreeCheckpointer().restore(os.fspath(Path(path).absolute()))
    has_opt = "opt_state" in tree

    def like(template_tree, saved_tree):
        leaves_t, treedef = jax.tree_util.tree_flatten(template_tree)
        leaves_s = jax.tree_util.tree_leaves(saved_tree)
        if len(leaves_t) != len(leaves_s):
            raise ValueError(f"checkpoint leaf count {len(leaves_s)} != template {len(leaves_t)}")
        casted = []
        for i, (t, s_leaf) in enumerate(zip(leaves_t, leaves_s)):
            t, s_leaf = np.asarray(t), np.asarray(s_leaf)
            if t.shape != s_leaf.shape:
                raise ValueError(
                    f"checkpoint leaf {i}: shape {s_leaf.shape} != template "
                    f"{t.shape} (different model size?)")
            casted.append(s_leaf.astype(t.dtype))
        return jax.tree_util.tree_unflatten(treedef, casted)

    if hasattr(template, "params"):
        params = like(template.params, tree["params"])
        if has_opt:
            return template._replace(
                params=params,
                opt_state=like(template.opt_state, tree["opt_state"]),
                step=np.asarray(tree.get("step", 0), np.int32),
            )
        return template._replace(params=params)
    return like(template, tree["params"])
