"""Checkpoint / resume (SURVEY.md §5.4).

The reference loses everything on a kill (best parse lives only in
memory, main.c:50-92).  Here the whole AnnealState — slabs, costs,
probability snapshots, PRNG keys, schedule counters — serializes to one
npz so a multi-hour run resumes exactly (bit-identical continuation,
since the PRNG keys are part of the state).
"""
from __future__ import annotations

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from ..anneal import engine

_FIELDS_CHAIN = list(engine.ChainState._fields)
_FIELDS_TOP = [f for f in engine.AnnealState._fields if f != "chains"]


def save(path: str, state: engine.AnnealState, extra: dict | None = None
         ) -> None:
    """Serialize the state (plus optional caller metadata arrays under
    the "extra." namespace — e.g. the mesh path's block ids — so state
    and metadata are replaced atomically together)."""
    arrays = {}
    for f in _FIELDS_CHAIN:
        v = getattr(state.chains, f)
        if f == "key":
            v = jax.random.key_data(v)
        arrays[f"chains.{f}"] = np.asarray(v)
    for f in _FIELDS_TOP:
        v = getattr(state, f)
        if f == "skey":
            v = jax.random.key_data(v)
        arrays[f] = np.asarray(v)
    for k, v in (extra or {}).items():
        arrays[f"extra.{k}"] = np.asarray(v)
    # atomic write
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


_REQUIRED = ("chains.slab", "chains.cost_hi", "chains.cost_lo",
             "chains.key", "best_slab", "best_hi", "best_lo")


def load_extra(path: str, key: str):
    """Read one "extra." metadata array from a checkpoint (None if the
    file predates the key or was saved without it)."""
    with np.load(path) as z:
        name = f"extra.{key}"
        return z[name] if name in z.files else None


def load(path: str) -> engine.AnnealState:
    """Load a checkpoint, tolerating npz files written before AnnealState
    grew the sweep-schedule fields (snap_carry/sweep_j/snap_pos/u_prev/
    skey).  Missing optional fields get safe defaults — sweep_j=0 forces
    a fresh full-walk re-cost, which is always exact — so a pre-upgrade
    multi-hour run still resumes (not bit-identically, but safely).
    Missing REQUIRED fields raise a clear incompatibility error."""
    with np.load(path) as z:
        names = set(z.files)
        missing = [k for k in _REQUIRED if k not in names]
        if missing:
            raise ValueError(
                f"incompatible checkpoint {path!r}: missing required "
                f"arrays {missing} (delete the file to restart)")
        lead = z["chains.slab"].shape[:-1]   # [C] or [B, C] (mesh stack)

        def default(f):
            if f == "snap_carry":
                return jnp.zeros(lead + (16,), jnp.int32)
            if f == "skey":
                return (jax.vmap(jax.random.PRNGKey)(jnp.arange(lead[0]))
                        if lead[:-1] else jax.random.PRNGKey(0))
            return jnp.zeros(lead[:-1], jnp.int32)  # scalar per block

        chain_kwargs = {}
        for f in _FIELDS_CHAIN:
            if f"chains.{f}" not in names:
                chain_kwargs[f] = default(f)
                continue
            v = jnp.asarray(z[f"chains.{f}"])
            if f == "key":
                v = jax.random.wrap_key_data(v)
            chain_kwargs[f] = v
        top = {}
        for f in _FIELDS_TOP:
            if f not in names:
                top[f] = default(f)
                continue
            v = jnp.asarray(z[f])
            if f == "skey":
                v = jax.random.wrap_key_data(v)
            top[f] = v
    return engine.AnnealState(chains=engine.ChainState(**chain_kwargs), **top)
