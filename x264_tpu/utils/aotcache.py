"""AOT trace cache: disk-cached `jax.export` artifacts for the big
frame cores.

Tracing + lowering a 1080p frame pipeline takes minutes of pure Python
(the graphs are wide: exhaustive ME, per-mode intra batteries, trellis
DP); XLA's persistent compile cache only skips the *backend* compile,
not the trace.  Caching the serialized Exported (StableHLO) makes a
warm process start: deserialize (~ms) + persistent-cache compile
(seconds) — no Python re-trace.  This is the analog of x264 shipping
prebuilt objects: the program text is fixed by (code, config, shapes).

Usage: drop-in for `jax.jit(fn, static_argnames=...)` via
`aot_jit(fn, static_argnames=...)`.  Small invocations (tests) bypass
the disk cache and use plain jit.  Any export failure falls back to
plain jit silently (correctness never depends on this layer).
"""

from __future__ import annotations

import functools
import hashlib
import os
import threading

import numpy as np

_CODE_HASH = None
_LOCK = threading.Lock()

# modules whose source determines the device programs; edits elsewhere
# (bitstream host coders, CLI, muxers) never change a traced core
_HASHED_SUBDIRS = ("ops", "models", "parallel", "utils")
_HASHED_FILES = ("params.py",)


def _code_hash() -> str:
    """Hash of the compute-defining .py sources: any edit invalidates
    the whole AOT cache (coarse but sound — program text is what we
    cache)."""
    global _CODE_HASH
    if _CODE_HASH is None:
        h = hashlib.sha256()
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        roots = [os.path.join(pkg, d) for d in _HASHED_SUBDIRS]
        files = [os.path.join(pkg, f) for f in _HASHED_FILES]
        for root in roots:
            for dirpath, dirs, names in os.walk(root):
                dirs.sort()
                for f in sorted(names):
                    if f.endswith(".py"):
                        files.append(os.path.join(dirpath, f))
        for p in files:
            h.update(p.encode())
            try:
                with open(p, "rb") as fh:
                    h.update(fh.read())
            except OSError:
                pass
        _CODE_HASH = h.hexdigest()[:20]
    return _CODE_HASH


def _cache_dir() -> str:
    d = os.environ.get(
        "X264_TPU_AOT_CACHE",
        os.path.join(os.environ.get(
            "X264_TPU_JAX_CACHE",
            os.path.expanduser("~/.cache/x264_tpu_jax")), "export"))
    os.makedirs(d, exist_ok=True)
    return d


def _leaf_sig(x) -> str:
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return f"{x.dtype}{list(x.shape)}"
    return f"py:{type(x).__name__}:{np.asarray(x).dtype}"


def aot_jit(fn=None, *, static_argnames=(), min_elems=2_000_000):
    """jax.jit with a disk-level AOT trace cache.

    min_elems: only disk-cache invocations whose largest array argument
    has at least this many elements (frame-sized work; tiny test shapes
    trace in milliseconds and would churn the disk cache).
    """
    if fn is None:
        return functools.partial(aot_jit, static_argnames=static_argnames,
                                 min_elems=min_elems)
    import jax

    jfn = jax.jit(fn, static_argnames=static_argnames)
    mem: dict = {}
    statics = frozenset(static_argnames)

    def _split(kwargs):
        skw = {k: v for k, v in kwargs.items() if k in statics}
        tkw = {k: v for k, v in kwargs.items() if k not in statics}
        return skw, tkw

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        import jax
        skw, tkw = _split(kwargs)
        try:
            leaves, treedef = jax.tree_util.tree_flatten((args, tkw))
            st = sorted((k, repr(v)) for k, v in skw.items())
            txt = "|".join([
                fn.__module__, fn.__qualname__, _code_hash(),
                jax.__version__, jax.default_backend(), repr(st),
                str(treedef), ",".join(_leaf_sig(x) for x in leaves)])
            key = hashlib.sha256(txt.encode()).hexdigest()[:32]
        except Exception:
            return jfn(*args, **kwargs)
        ent = mem.get(key)
        if ent is None:
            big = max((int(getattr(x, "size", 0) or np.asarray(x).size)
                       for x in leaves), default=0)
            if big < min_elems:
                ent = jfn
            else:
                ent = _load_or_export(key, treedef, leaves, skw)
            with _LOCK:
                mem[key] = ent
        if ent is jfn:
            return jfn(*args, **kwargs)
        return ent(*leaves)

    def _load_or_export(key, treedef, leaves, skw):
        import jax

        def flatfn(*flat):
            a, k = jax.tree_util.tree_unflatten(treedef, flat)
            return fn(*a, **skw, **k)

        path = os.path.join(_cache_dir(), key + ".jaxexp")
        exported = None
        if os.path.exists(path):
            try:
                with open(path, "rb") as fh:
                    exported = jax.export.deserialize(fh.read())
            except Exception:
                exported = None
        if exported is None:
            try:
                if os.environ.get("X264_TPU_AOT_DEBUG"):
                    import sys
                    print(f"[aot MISS] {fn.__module__}.{fn.__qualname__} "
                          f"key={key} sig="
                          f"{','.join(_leaf_sig(x) for x in leaves)}",
                          file=sys.stderr, flush=True)
                exported = jax.export.export(jax.jit(flatfn))(*leaves)
                tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
                with open(tmp, "wb") as fh:
                    fh.write(exported.serialize())
                os.replace(tmp, path)
            except Exception:
                return jfn
        try:
            return jax.jit(exported.call)
        except Exception:
            return jfn

    wrapper._aot_jfn = jfn          # escape hatch (lower/compile access)
    return wrapper
