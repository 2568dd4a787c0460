"""Disk-backed cache of Mosaic probe-compile results.

Every Pallas kernel is probe-compiled at build time so a Mosaic
rejection falls back to the XLA path instead of failing the solve. The
probe result is a per-(kernel, shape, backend) boolean, but the probe
COMPILE costs seconds per fresh process through the remote compile
helper — persisting the boolean next to the XLA compilation cache makes
warm starts skip the probe entirely. Corrupt/unreadable cache files are
ignored; writes are atomic (tempfile + rename) so concurrent processes
cannot tear the file.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading

_LOCK = threading.Lock()
_MEM: dict = {}
_LOADED = False


def _path():
    import jax
    d = jax.config.jax_compilation_cache_dir
    if not d:
        return None
    return os.path.join(d, "ct_probe_cache.json")


def _load():
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    p = _path()
    if not p or not os.path.exists(p):
        return
    try:
        with open(p) as f:
            _MEM.update({k: bool(v) for k, v in json.load(f).items()})
    except Exception:
        pass


def _key(parts) -> str:
    return "|".join(str(x) for x in parts)


def get(parts):
    """Cached probe result for the key parts, or None."""
    with _LOCK:
        _load()
        return _MEM.get(_key(parts))


def put(parts, ok: bool) -> None:
    with _LOCK:
        _load()
        _MEM[_key(parts)] = bool(ok)
        p = _path()
        if not p:
            return
        try:
            os.makedirs(os.path.dirname(p), exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p))
            with os.fdopen(fd, "w") as f:
                json.dump(_MEM, f)
            os.replace(tmp, p)
        except Exception:
            pass
