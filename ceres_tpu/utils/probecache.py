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


_VER = None


def _version_prefix() -> str:
    # Probe results are only valid for the toolchain that produced them:
    # after a jax/jaxlib upgrade a stale ok=True would bypass the probe
    # and fail at solve time, and a stale ok=False would silently disable
    # the kernel forever.
    global _VER
    if _VER is None:
        import jax
        try:
            import jaxlib
            jl = getattr(jaxlib, "__version__", "?")
        except Exception:
            jl = "?"
        _VER = f"jax{jax.__version__}+jaxlib{jl}"
    return _VER


def _key(parts) -> str:
    return "|".join([_version_prefix()] + [str(x) for x in parts])


def is_transient_error(e: BaseException) -> bool:
    """Heuristic: does this probe failure look like infrastructure (the
    remote compile helper / tunnel) rather than a genuine Mosaic
    rejection? Transient failures must not be persisted as ok=False —
    that would silently disable the kernel in every future process."""
    text = (type(e).__name__ + " " + str(e)).lower()
    return any(s in text for s in (
        "http", "connection", "timeout", "timed out", "unavailable",
        "deadline", "socket", "refused", "reset", "500", "503",
        "internal error", "resource exhausted"))


_LOCAL: dict = {}    # process-local results (transient probe failures)


def get(parts):
    """Cached probe result for the key parts, or None."""
    with _LOCK:
        _load()
        k = _key(parts)
        v = _MEM.get(k)
        return _LOCAL.get(k) if v is None else v


def put(parts, ok: bool, transient: bool = False) -> None:
    """Record a probe result. transient=True (an infrastructure failure,
    see is_transient_error) keeps the result process-local: the next
    process re-probes instead of inheriting a spurious rejection."""
    with _LOCK:
        _load()
        if transient and not ok:
            _LOCAL[_key(parts)] = bool(ok)
            return
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
