"""Key/SRS persistence: save and reload proving artifacts.

The reference regenerates SRS/pk/vk on every run — per proof, in the CLI
(/root/reference/src/main.rs:142-145; SURVEY.md section 5.4 calls this out
as a missing subsystem).  At 2^20+-constraint scale the keys are the
dominant startup cost, so the framework persists them: device limb planes
as .npz arrays, host points and metadata as canonical-serialized bytes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

import zkmember_tpu.msm.msm as msmmod
from zkmember_tpu.snark import groth16
from zkmember_tpu.utils import serialize as ser


def _points_to_npz(prefix: str, pa: "msmmod.PointArray", store: dict):
    def put(name, c):
        if isinstance(c, tuple):
            for i, ci in enumerate(c):
                put(f"{name}_c{i}", ci)
        else:
            store[name] = np.asarray(c)

    put(f"{prefix}_x", pa.x)
    put(f"{prefix}_y", pa.y)


def _points_from_npz(prefix: str, data, F, curve, device: bool) -> "msmmod.PointArray":
    conv = jnp.asarray if device else np.asarray

    def get(name):
        sub = sorted(k for k in data.files if k.startswith(name + "_c"))
        if sub:
            return tuple(conv(data[k]) for k in sub)
        return conv(data[name])

    return msmmod.PointArray(F, curve, get(f"{prefix}_x"), get(f"{prefix}_y"))


def save_groth16_keys(path: str, pk: "groth16.ProvingKey"):
    """Write pk+vk: <path>.npz (device planes) + <path>.json (host data)."""
    store: dict = {}
    for name in ("a_query", "b_g1_query", "b_g2_query", "h_query", "l_query"):
        _points_to_npz(name, getattr(pk, name), store)
    np.savez_compressed(path + ".npz", **store)

    import hashlib

    with open(path + ".npz", "rb") as f:
        npz_sha = hashlib.sha256(f.read()).hexdigest()

    cfg = groth16.pairing_config(pk.curve)
    g1, g2 = cfg.mod.G1, cfg.mod.G2
    meta = {
        "npz_sha256": npz_sha,
        "curve": pk.curve,
        "domain_size": pk.domain_size,
        "num_instance": pk.num_instance,
        "a_nonzero": pk.a_nonzero,
        "b_nonzero": pk.b_nonzero,
        "l_nonzero": pk.l_nonzero,
        "beta_g1": ser.sw_point_to_bytes(g1, pk.beta_g1).hex(),
        "delta_g1": ser.sw_point_to_bytes(g1, pk.delta_g1).hex(),
        "vk": ser.vk_to_bytes(pk.vk).hex(),
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_groth16_keys(path: str, device: bool = True) -> "groth16.ProvingKey":
    """device=False keeps the query planes as host numpy — the limb-major
    key builder (snark.prove_lm.Groth16KeysLM) re-lays them out itself, and
    a device round-trip through the tunnel costs seconds at 2^14 points."""
    with open(path + ".json") as f:
        meta = json.load(f)
    curve = meta["curve"]
    cfg = groth16.pairing_config(curve)
    g1 = cfg.mod.G1
    if "npz_sha256" in meta:
        # integrity gate: the bench loads checkpointed keys blindly, so
        # corrupted/stale plane bytes must fail loudly (round-4 advisor)
        import hashlib

        with open(path + ".npz", "rb") as f:
            got = hashlib.sha256(f.read()).hexdigest()
        if got != meta["npz_sha256"]:
            raise ValueError(
                f"checkpoint {path}.npz does not match its recorded sha256; "
                "delete the artifact and regenerate"
            )
    data = np.load(path + ".npz")
    vk = ser.vk_from_bytes(curve, bytes.fromhex(meta["vk"]))

    def pa(name, g2=False):
        F = cfg.F2 if g2 else cfg.F1
        curve_obj = cfg.mod.G2 if g2 else cfg.mod.G1
        return _points_from_npz(name, data, F, curve_obj, device)

    return groth16.ProvingKey(
        curve=curve,
        vk=vk,
        beta_g1=ser.sw_point_from_bytes(g1, bytes.fromhex(meta["beta_g1"])),
        delta_g1=ser.sw_point_from_bytes(g1, bytes.fromhex(meta["delta_g1"])),
        a_query=pa("a_query"),
        b_g1_query=pa("b_g1_query"),
        b_g2_query=pa("b_g2_query", g2=curve == "bls12_381"),
        h_query=pa("h_query"),
        l_query=pa("l_query"),
        a_nonzero=list(meta["a_nonzero"]),
        b_nonzero=list(meta["b_nonzero"]),
        l_nonzero=list(meta["l_nonzero"]),
        domain_size=meta["domain_size"],
        num_instance=meta["num_instance"],
    )
