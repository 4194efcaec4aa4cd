"""Deterministic RNG matching the reference's std::mt19937 +
libstdc++ std::uniform_int_distribution.

The reference selects one mapping instance per multi-mapping read with
RandomInclusiveInt (libgramtools src/common/random.cpp:4-19): an
mt19937 engine seeded with a 32-bit seed, drawn through
uniform_int_distribution<uint32_t>(min, max). To reproduce its genotype
calls bit-for-bit we replicate both the engine and libstdc++'s
downscaling algorithm (rejection sampling then integer division).

numpy's RandomState uses the same MT19937 engine and scalar seeding
(init_genrand), so we use it for raw 32-bit draws and implement the
distribution on top.
"""
from __future__ import annotations

import numpy as np

_URNG_RANGE = (1 << 32) - 1  # mt19937 max - min


class RandomInclusiveInt:
    """Replica of gram::RandomInclusiveInt (common/random.cpp:4-19)."""

    def __init__(self, seed: int | None):
        if seed is None:
            seed = int(np.random.SeedSequence().entropy) & 0xFFFFFFFF
        self.seed = int(seed) & 0xFFFFFFFF
        self._state = np.random.RandomState(self.seed)

    def _raw(self) -> int:
        # One raw 32-bit mt19937 output.
        return int(self._state.randint(0, 1 << 32, dtype=np.uint32))

    def generate(self, lo: int, hi: int) -> int:
        """uniform_int_distribution<uint32_t>(lo, hi) draw, libstdc++ algorithm.

        libstdc++ (bits/uniform_int_dist.h) with urngrange = 2^32-1 and
        urange = hi-lo+1 <= 2^32-1 performs:
            scaling = urngrange / urange   (integer division)
            past    = urange * scaling
            do r = raw() while r >= past
            return lo + r / scaling
        """
        urange = hi - lo + 1
        if urange <= 0:
            raise ValueError("empty range")
        if urange == (1 << 32):
            return lo + self._raw()
        scaling = _URNG_RANGE // urange
        past = urange * scaling
        while True:
            r = self._raw()
            if r < past:
                return lo + r // scaling
