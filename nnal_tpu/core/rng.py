"""Explicit RNG plumbing.

The reference relies on global ``np.random`` state everywhere (e.g.
NN.py:1540, NNAL_tools.py:105).  Here every stochastic site consumes an
explicit key: ``jax.random`` keys for on-device sampling and a seeded
``np.random.Generator`` for host-side bookkeeping (batch shuffles, PMF
draws), so whole experiments are replayable from one seed.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np


class RngStream:
    """A named, forkable stream of JAX PRNG keys plus a host generator."""

    def __init__(self, seed: int = 0):
        self.seed = int(seed)
        self._key = jax.random.key(self.seed)  # typed key, replayable via key_data
        self.host = np.random.default_rng(self.seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def fold(self, tag: str) -> "RngStream":
        """Deterministically derive an independent child stream.

        The derivation is a keyed blake2b over ``(seed, tag)`` — NOT Python's
        built-in ``hash``, whose per-process salting would make a
        crash-resumed campaign in a fresh interpreter draw different streams
        than the original run (the replayable-journal property of
        SURVEY.md §5.2-5.3 depends on this being process-stable).
        """
        h = hashlib.blake2b(f"{self.seed}|{tag}".encode(), digest_size=4)
        return RngStream(int.from_bytes(h.digest(), "little"))

    def next_n(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs

    # journaling support: the engine checkpoints the stream state each round
    def state(self) -> dict:
        return {
            "key": np.asarray(jax.random.key_data(self._key)).tolist(),
            "host": self.host.bit_generator.state,
        }

    def restore(self, state: dict) -> None:
        self._key = jax.random.wrap_key_data(
            np.asarray(state["key"], dtype=np.uint32)
        )
        self.host.bit_generator.state = state["host"]
