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


def save(path: str, state: engine.AnnealState) -> None:
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


def load(path: str) -> engine.AnnealState:
    with np.load(path) as z:
        chain_kwargs = {}
        for f in _FIELDS_CHAIN:
            v = jnp.asarray(z[f"chains.{f}"])
            if f == "key":
                v = jax.random.wrap_key_data(v)
            chain_kwargs[f] = v
        top = {}
        for f in _FIELDS_TOP:
            v = jnp.asarray(z[f])
            if f == "skey":
                v = jax.random.wrap_key_data(v)
            top[f] = v
    return engine.AnnealState(chains=engine.ChainState(**chain_kwargs), **top)
