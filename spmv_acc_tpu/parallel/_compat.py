"""Version-compat ``shard_map`` wrapper, shared by every distributed module.

jax >= 0.8 promotes ``shard_map`` out of ``jax.experimental`` and renames the
replication-check kwarg ``check_rep`` -> ``check_vma``; older jax only has the
experimental alias.  Call sites may pass either kwarg — it is normalized here —
and may use the decorator either directly or via ``functools.partial``.
"""

from __future__ import annotations

__all__ = ["shard_map"]

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    def shard_map(f=None, **kw):
        kw.setdefault("check_vma", kw.pop("check_rep", False))
        return _shard_map(f, **kw) if f is not None else _shard_map(**kw)

except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f=None, **kw):
        kw.setdefault("check_rep", kw.pop("check_vma", False))
        if f is not None:
            return _shard_map_old(f, **kw)
        return lambda g: _shard_map_old(g, **kw)
