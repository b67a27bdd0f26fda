"""Checkpoint I/O.

Two layers of capability parity with the reference:

1. The vocoder checkpoint *layout*: files named ``g_XXXXXXXX`` /
   ``do_XXXXXXXX`` (8-digit step), discovered via :func:`scan_checkpoint`
   glob, with ``config.json`` co-located (reference src/utils.py:82-101,
   src/inference.py:41,74). Our native payload is flax msgpack (pure
   numpy; no pickle) instead of torch.save.

2. A converter that ingests the reference's *PyTorch* checkpoints
   (``state_dict['generator']`` with ``weight_g``/``weight_v`` weight-norm
   params, or plain ``weight`` after `remove_weight_norm`) and emits our
   NWC-layout param pytrees — this is what makes the pretrained matrix
   (LJ_V1/V2/V3, UNIVERSAL_V1, ..., reference README.md:49-60) usable.

Layout transposes:
    Conv1d          (O, I, K)     -> (K, I, O)
    Conv2d          (O, I, KH, KW)-> (KH, KW, I, O)
    ConvTranspose1d (I, O, K)     -> (K, I, O)
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any

import jax
import numpy as np
from flax import serialization


# ---------------------------------------------------------------------------
# Native checkpoint format (msgpack of a nested dict of numpy arrays)
# ---------------------------------------------------------------------------


_ASYNC_POOL = None
_PENDING: list = []


def _write(filepath: str, data: bytes) -> None:
    tmp = filepath + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, filepath)


def save_checkpoint(filepath: str, obj: Any, async_: bool = False) -> None:
    """Atomic checkpoint write; ``async_=True`` device_gets synchronously but
    serialises + writes on a background thread (Orbax-style async save — the
    TPU keeps training while the host does I/O). Call
    :func:`wait_for_checkpoints` before relying on the files."""
    obj = jax.tree_util.tree_map(np.asarray, obj)  # device_get barrier
    if not async_:
        _write(filepath, serialization.msgpack_serialize(obj))
        return
    global _ASYNC_POOL
    if _ASYNC_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _ASYNC_POOL = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt")
    _PENDING.append(
        _ASYNC_POOL.submit(lambda: _write(filepath, serialization.msgpack_serialize(obj)))
    )


def wait_for_checkpoints() -> None:
    """Block until all async checkpoint writes are durable."""
    while _PENDING:
        _PENDING.pop().result()


def load_checkpoint(filepath: str) -> Any:
    assert os.path.isfile(filepath), filepath
    with open(filepath, "rb") as f:
        data = f.read()
    if data[:2] == b"PK" or filepath.endswith((".pt", ".pth", ".ckpt")):
        # A PyTorch zip checkpoint — convert transparently.
        return load_torch_checkpoint(filepath)
    return serialization.msgpack_restore(data)


def scan_checkpoint(cp_dir: str, prefix: str) -> str | None:
    """Latest ``prefix + 8-digit-step`` file in ``cp_dir`` (ref src/utils.py:96)."""
    pattern = os.path.join(cp_dir, prefix + "????????")
    cp_list = glob.glob(pattern)
    if len(cp_list) == 0:
        return None
    return sorted(cp_list)[-1]


# ---------------------------------------------------------------------------
# PyTorch ingestion
# ---------------------------------------------------------------------------


def load_torch_checkpoint(filepath: str) -> dict:
    """torch.load a reference checkpoint to numpy (requires torch on host)."""
    import torch

    ckpt = torch.load(filepath, map_location="cpu", weights_only=True)

    def to_np(x):
        return x.detach().cpu().numpy() if isinstance(x, torch.Tensor) else x

    return jax.tree_util.tree_map(to_np, ckpt)


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_conv_entry(
    out: dict, module_path: list[str], pname: str, w: np.ndarray, transposed: bool
) -> None:
    """Map one torch conv tensor into our param tree under module_path."""
    if transposed:
        tr = (2, 0, 1)  # (I,O,K) -> (K,I,O)
    elif w.ndim == 4:
        tr = (2, 3, 1, 0)  # (O,I,KH,KW) -> (KH,KW,I,O)
    else:
        tr = (2, 1, 0)  # (O,I,K) -> (K,I,O)

    if pname == "bias":
        _set(out, module_path + ["bias"], w)
    elif pname in ("weight_v", "weight_orig"):
        key = "v" if pname == "weight_v" else "kernel"
        _set(out, module_path + [key], np.transpose(w, tr))
    elif pname == "weight_g":
        _set(out, module_path + ["g"], w.reshape(-1))
    elif pname == "weight":
        _set(out, module_path + ["kernel"], np.transpose(w, tr))
    elif pname == "weight_u":
        _set(out, module_path + ["__u"], w.reshape(-1))
    # torch sn's weight_v power-iteration buffer is recomputed; skip.


_GEN_KEY = re.compile(
    r"^(conv_pre|conv_post|ups\.(\d+)|resblocks\.(\d+)\.(convs1|convs2|convs)\.(\d+))\.(.+)$"
)


def convert_torch_generator(state_dict: dict) -> dict:
    """Reference generator state_dict -> our Generator params pytree.

    Handles both weight-normed (weight_g/weight_v) and folded (weight)
    checkpoints; the result slots into ``Generator(h, folded=<bool>)``.
    """
    params: dict = {}
    for key, w in state_dict.items():
        w = np.asarray(w)
        m = _GEN_KEY.match(key)
        if not m:
            raise KeyError(f"unrecognised generator key: {key}")
        head, up_i, rb_i, rb_kind, rb_j, pname = m.groups()
        if head in ("conv_pre", "conv_post"):
            _convert_conv_entry(params, [head], pname, w, transposed=False)
        elif head.startswith("ups."):
            _convert_conv_entry(params, [f"ups_{up_i}"], pname, w, transposed=True)
        else:
            _convert_conv_entry(
                params,
                [f"resblocks_{rb_i}", f"{rb_kind}_{rb_j}"],
                pname,
                w,
                transposed=False,
            )
    return {"params": params}


# ---------------------------------------------------------------------------
# PyTorch emission (round-trip: train here -> run in the reference)
# ---------------------------------------------------------------------------


def export_torch_generator(params: dict, h=None) -> dict:
    """Our Generator params pytree -> a reference-layout ``state_dict``
    (flat torch keys), the inverse of :func:`convert_torch_generator`.

    Weight-normed params ({'v','g'}) emit ``weight_v``/``weight_g`` pairs
    (torch weight_norm dim=0 shapes); folded params ({'kernel'}) emit plain
    ``weight`` — matching a post-`remove_weight_norm` reference checkpoint
    (reference src/models.py:118-125, src/inference.py:41).
    """
    out: dict[str, np.ndarray] = {}

    def emit(torch_key: str, leaf: dict, transposed: bool) -> None:
        if transposed:
            tr = (1, 2, 0)  # (K,I,O) -> (I,O,K)
            g_shape = (-1, 1, 1)  # dim=0 over (I,O,K) -> (I,1,1)
        else:
            tr = (
                (2, 1, 0) if leaf.get("v", leaf.get("kernel")).ndim == 3 else (3, 2, 0, 1)
            )  # (K,I,O)->(O,I,K) / (KH,KW,I,O)->(O,I,KH,KW)
            g_shape = (-1,) + (1,) * (leaf.get("v", leaf.get("kernel")).ndim - 1)
        if "v" in leaf and "g" in leaf:
            out[f"{torch_key}.weight_v"] = np.transpose(np.asarray(leaf["v"]), tr)
            out[f"{torch_key}.weight_g"] = np.asarray(leaf["g"]).reshape(g_shape)
        else:
            out[f"{torch_key}.weight"] = np.transpose(np.asarray(leaf["kernel"]), tr)
        if "bias" in leaf:
            out[f"{torch_key}.bias"] = np.asarray(leaf["bias"])

    for name, leaf in params.items():
        if name in ("conv_pre", "conv_post"):
            emit(name, leaf, transposed=False)
        elif name.startswith("ups_"):
            emit(f"ups.{name.split('_')[1]}", leaf, transposed=True)
        elif name.startswith("resblocks_"):
            rb_i = name.split("_")[1]
            for conv_name, conv_leaf in leaf.items():
                kind, j = conv_name.rsplit("_", 1)
                emit(f"resblocks.{rb_i}.{kind}.{j}", conv_leaf, transposed=False)
        else:
            raise KeyError(f"unrecognised generator param subtree: {name}")
    return out


def save_torch_generator(filepath: str, params: dict, h=None) -> None:
    """Write a reference-compatible ``g_*`` checkpoint
    (``{'generator': state_dict}``, torch.save zip) loadable by the
    reference's inference.py:40-41. Requires torch on the host."""
    import torch

    state_dict = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_generator(params, h).items()
    }
    torch.save({"generator": state_dict}, filepath)


def _convert_disc_stack(state_dict: dict, prefix: str = "") -> tuple[dict, dict]:
    """Shared MPD/MSD converter: keys like discriminators.{i}.convs.{j}.*
    and discriminators.{i}.conv_post.* -> params + spectral collections."""
    params: dict = {}
    spectral: dict = {}
    pat = re.compile(r"^discriminators\.(\d+)\.(convs\.(\d+)|conv_post)\.(.+)$")
    # torch spectral_norm stores weight_orig/weight_u/weight_v; its weight_v
    # power-iteration buffer (1-D) collides with weight_norm's weight_v param
    # — drop it wherever weight_orig marks the module as spectral-normed.
    spectral_mods = {k[: -len(".weight_orig")] for k in state_dict if k.endswith(".weight_orig")}
    state_dict = {
        k: v
        for k, v in state_dict.items()
        if not (k.endswith(".weight_v") and k[: -len(".weight_v")] in spectral_mods)
    }
    for key, w in state_dict.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix) :]
        w = np.asarray(w)
        m = pat.match(key)
        if not m:
            raise KeyError(f"unrecognised discriminator key: {key}")
        disc_i, conv, conv_j, pname = m.groups()
        mod = f"convs_{conv_j}" if conv_j is not None else "conv_post"
        path = [f"discriminators_{disc_i}", mod]
        _convert_conv_entry(params, path, pname, w, transposed=False)
    # Hoist spectral-norm u buffers (stored as '__u') into their own tree.
    def hoist(node: dict, spec_node: dict) -> None:
        for k in list(node.keys()):
            if k == "__u":
                spec_node["u"] = node.pop(k)
            elif isinstance(node[k], dict):
                spec_node.setdefault(k, {})
                hoist(node[k], spec_node[k])
                if not spec_node[k]:
                    del spec_node[k]

    hoist(params, spectral)
    return params, spectral


def convert_torch_discriminators(do_ckpt: dict) -> dict:
    """Reference ``do_*`` checkpoint -> {'mpd': vars, 'msd': vars} pytrees."""
    out = {}
    for name in ("mpd", "msd"):
        if name in do_ckpt:
            params, spectral = _convert_disc_stack(do_ckpt[name])
            variables: dict = {"params": params}
            if spectral:
                variables["spectral"] = spectral
            out[name] = variables
    for extra in ("steps", "epoch"):
        if extra in do_ckpt:
            out[extra] = do_ckpt[extra]
    return out


def _l2n(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    return x / (np.linalg.norm(x) + eps)


def export_torch_discriminators(mpd_vars: dict, msd_vars: dict,
                                steps: int = 0, epoch: int = 0) -> dict:
    """{'mpd','msd'} variables -> a reference-layout ``do_*`` dict (flat
    torch keys per stack), the inverse of :func:`convert_torch_discriminators`.

    Weight-normed convs emit ``weight_v``/``weight_g`` (torch dim=0 shapes);
    spectral-normed convs (MSD scale 0) emit ``weight_orig``/``weight_u``
    and a ``weight_v`` power-iteration buffer synthesised as
    l2norm(W_matᵀ u) — torch recomputes it every forward, only the key must
    exist for a strict ``load_state_dict``. Optimizer state is NOT emitted:
    the reference's train.py (which defined torch Adam's parameter ordering)
    is deleted upstream, so no canonical ``optim_g``/``optim_d`` layout
    exists to target (SURVEY §2.1).
    """

    def emit_stack(variables: dict) -> dict:
        params = variables["params"]
        spectral = variables.get("spectral", {})
        out: dict[str, np.ndarray] = {}
        for disc_name, mods in params.items():
            i = disc_name.split("_")[-1]
            for mod_name, leaf in mods.items():
                conv_j = mod_name.split("_")[-1] if mod_name.startswith("convs_") else None
                tk = (
                    f"discriminators.{i}.convs.{conv_j}"
                    if conv_j is not None
                    else f"discriminators.{i}.conv_post"
                )
                kern = np.asarray(leaf.get("v", leaf.get("kernel")))
                tr = (2, 1, 0) if kern.ndim == 3 else (3, 2, 0, 1)  # ->(O,I,K*)
                u = spectral.get(disc_name, {}).get(mod_name, {}).get("u")
                if "v" in leaf and "g" in leaf:
                    out[f"{tk}.weight_v"] = np.transpose(kern, tr)
                    out[f"{tk}.weight_g"] = np.asarray(leaf["g"]).reshape(
                        (-1,) + (1,) * (kern.ndim - 1)
                    )
                elif u is not None:
                    w_t = np.transpose(kern, tr)
                    out[f"{tk}.weight_orig"] = w_t
                    u = np.asarray(u).reshape(-1)
                    w_mat = w_t.reshape(w_t.shape[0], -1)
                    out[f"{tk}.weight_u"] = u
                    out[f"{tk}.weight_v"] = _l2n(w_mat.T @ u)
                else:
                    out[f"{tk}.weight"] = np.transpose(kern, tr)
                if "bias" in leaf:
                    out[f"{tk}.bias"] = np.asarray(leaf["bias"])
        return out

    return {
        "mpd": emit_stack(mpd_vars),
        "msd": emit_stack(msd_vars),
        "steps": int(steps),
        "epoch": int(epoch),
    }


def save_torch_discriminators(filepath: str, mpd_vars: dict, msd_vars: dict,
                              steps: int = 0, epoch: int = 0) -> None:
    """Write a reference-compatible ``do_*`` checkpoint (torch.save zip)."""
    import torch

    do = export_torch_discriminators(mpd_vars, msd_vars, steps=steps, epoch=epoch)
    for name in ("mpd", "msd"):
        do[name] = {
            k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in do[name].items()
        }
    torch.save(do, filepath)
