"""HDF5 result storage.

Schema-compatible with the reference's outputs (src/utils.py:90-106) so
downstream analysis written against reference H5 files keeps working:
datasets per key, ``w``/``a`` modes, existing keys replaced, PRNG keys
skipped. Device arrays are fetched once per tree (single host sync).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import numpy as np

try:
    import h5py

    HAVE_H5PY = True
except ImportError:  # pragma: no cover - h5py is available in CI/images
    HAVE_H5PY = False

_SKIPPED_KEYS = {"prng_key", "key"}


def _to_host(value):
    if isinstance(value, jax.Array):
        try:
            return np.asarray(value)
        except TypeError:
            # typed PRNG keys and other extended dtypes are not stored
            return None
    return value


def store_data(data: Dict, path: str, mode: str = "w") -> None:
    """Writes a flat dict of arrays to an H5 file (.npz fallback)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    host = {}
    for k, v in data.items():
        if k in _SKIPPED_KEYS:
            continue
        hv = _to_host(v)
        if hv is None:
            continue
        host[k] = hv

    if HAVE_H5PY and p.suffix != ".npz":
        with h5py.File(p, mode) as h5f:
            for k, v in host.items():
                if k in h5f:
                    del h5f[k]
                h5f.create_dataset(k, data=v)
    else:
        existing = {}
        if mode == "a" and p.exists():
            with np.load(p, allow_pickle=False) as z:
                existing = {k: z[k] for k in z.files}
        existing.update(host)
        np.savez(p, **existing)


def load_data(path: str) -> Dict[str, np.ndarray]:
    """Loads every dataset of an H5 (or .npz) file into host arrays."""
    p = Path(path)
    if HAVE_H5PY and p.suffix != ".npz":
        out = {}
        with h5py.File(p, "r") as h5f:

            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    out[name] = obj[()]

            h5f.visititems(visit)
        return out
    with np.load(p, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}
