"""Engine configuration: frozen dataclass + seeded coefficient generation.

Re-expresses the reference semantics (kritoke/lexis-minhash) from scratch:

- defaults mirror ``/root/reference/src/lexis-minhash/engine.cr:87-92``
  (SIGNATURE_SIZE=100, NUM_BANDS=20, ROWS_PER_BAND=5, SHINGLE_SIZE=5,
  MIN_WORDS=4, DEFAULT_WEIGHT=1.0)
- seeded coefficient formula mirrors
  ``/root/reference/src/lexis-minhash/engine/config.cr:45-67`` bit-exactly
  (uint64 wraparound LCG; ``a[i]`` forced odd via ``| 1``)
- ``signature_size % num_bands == 0`` validation mirrors
  ``/root/reference/src/lexis-minhash/engine/config.cr:86-91``

Unlike the reference there is NO global mutable config (no ``Engine.configure``
mutex); a config object is passed explicitly and broadcast to executors by
closure capture inside the pandas UDFs.  A module-level ``DEFAULT_CONFIG``
constant stands in for the reference's default.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np

# Reference defaults: /root/reference/src/lexis-minhash/engine.cr:87-92
SIGNATURE_SIZE = 100
NUM_BANDS = 20
SHINGLE_SIZE = 5
MIN_WORDS = 4
DEFAULT_WEIGHT = 1.0

# LCG constants (public-domain PCG/splitmix-style constants used by the
# reference's seeded generator, engine/config.cr:52-53)
_LCG_MUL = np.uint64(6364136223846793005)
_LCG_ADD = np.uint64(1442695040888963407)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

U32_MAX = np.float64(4294967295.0)  # UInt32::MAX as Float64 (weighted modulus)


def seeded_coefficients(seed: int, signature_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) uint64 coefficient arrays.

    Bit-exact re-statement of engine/config.cr:45-67:
      a[i] = (((seed * 6364136223846793005) + i) + 1442695040888963407) | 1
      b[i] = ((seed * 6364136223846793005) + i * 0x9e3779b97f4a7c15)
             + 1442695040888963407
    (all arithmetic mod 2**64).
    """
    with np.errstate(over="ignore"):
        seed_u64 = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
        i = np.arange(signature_size, dtype=np.uint64)
        base = seed_u64 * _LCG_MUL
        a = ((base + i) + _LCG_ADD) | np.uint64(1)
        b = (base + i * _GOLDEN) + _LCG_ADD
    return a, b


@dataclass(frozen=True)
class EngineConfig:
    """Immutable engine configuration (reference Engine::Config,
    engine/config.cr:8-29). ``rows_per_band`` is derived."""

    signature_size: int = SIGNATURE_SIZE
    num_bands: int = NUM_BANDS
    shingle_size: int = SHINGLE_SIZE
    min_words: int = MIN_WORDS
    default_weight: float = DEFAULT_WEIGHT
    seed: int = 12345
    # spec'd-but-unimplemented-in-reference configurable stop words
    # (openspec/specs/configurable-engine/spec.md:31-43): tokens removed from
    # the normalized text BEFORE the gates and shingling; default off.
    stop_words: tuple = ()
    # derived / generated — set in __post_init__
    rows_per_band: int = field(init=False, default=0)

    def __post_init__(self) -> None:
        if self.signature_size % self.num_bands != 0:
            # mirrors engine/config.cr:87-89 ArgumentError
            raise ValueError("signature_size must be divisible by num_bands")
        object.__setattr__(self, "rows_per_band", self.signature_size // self.num_bands)

    @property
    def coefficients(self) -> tuple[np.ndarray, np.ndarray]:
        return _coefficients_cached(self.seed, self.signature_size)

    @property
    def a(self) -> np.ndarray:
        return self.coefficients[0]

    @property
    def b(self) -> np.ndarray:
        return self.coefficients[1]

    def to_dict(self) -> dict:
        """Picklable kwargs (used for UDF closure capture / lineage hashing)."""
        return {
            "signature_size": self.signature_size,
            "num_bands": self.num_bands,
            "shingle_size": self.shingle_size,
            "min_words": self.min_words,
            "default_weight": self.default_weight,
            "seed": self.seed,
            "stop_words": list(self.stop_words),
        }

    def config_hash(self) -> str:
        """Stable short hash for lineage records."""
        import hashlib
        import json

        blob = json.dumps(self.to_dict(), sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


@lru_cache(maxsize=64)
def _coefficients_cached(seed: int, signature_size: int) -> tuple[np.ndarray, np.ndarray]:
    a, b = seeded_coefficients(seed, signature_size)
    a.setflags(write=False)
    b.setflags(write=False)
    return a, b


DEFAULT_CONFIG = EngineConfig()

# ---------------------------------------------------------------------------
# Engine.configure / reset_config porting shim (engine/config.cr:73-91)
# ---------------------------------------------------------------------------
# The reference keeps a mutex-guarded global default config.  The Spark
# engine deliberately passes an immutable EngineConfig explicitly through
# every dataflow stage (a mutated global could never reach already-launched
# executors — the config is captured in UDF closures at plan-build time).
# This shim exists so driver-side call sites of the reference's convenience
# API (`Engine.configure(...)` then `Engine.compute_signature(text)`) port
# 1:1: it only affects the api.py convenience functions' default.

import threading as _threading

_CONFIG_LOCK = _threading.Lock()
_CURRENT_CONFIG: EngineConfig = DEFAULT_CONFIG


def configure(**kwargs) -> EngineConfig:
    """Set the process-global default config (reference Engine.configure,
    engine/config.cr:79-96).  Unknown keys raise; returns the new config.
    Driver-side convenience only — dataflow stages take explicit configs.

    Reference parity: ``Engine.configure`` takes DEFAULTED keyword args, so
    every parameter NOT passed resets to the built-in default on each call
    (``configure(min_words: 10)`` then ``configure(num_bands: 25)`` leaves
    min_words back at 4).  The update therefore bases on DEFAULT_CONFIG,
    not the current config (round-2 advice)."""
    global _CURRENT_CONFIG
    with _CONFIG_LOCK:
        base = DEFAULT_CONFIG.to_dict()
        for k in kwargs:
            if k not in base:
                raise TypeError(f"unknown config field {k!r}")
        base.update(kwargs)
        base["stop_words"] = tuple(base["stop_words"])
        _CURRENT_CONFIG = EngineConfig(**base)
        return _CURRENT_CONFIG


def reset_config() -> EngineConfig:
    """Restore the built-in defaults (reference Engine.reset_config,
    engine/config.cr:87-91)."""
    global _CURRENT_CONFIG
    with _CONFIG_LOCK:
        _CURRENT_CONFIG = DEFAULT_CONFIG
        return _CURRENT_CONFIG


def current_config() -> EngineConfig:
    """The config used by api.py convenience functions when none is given."""
    return _CURRENT_CONFIG
