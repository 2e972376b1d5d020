"""shard_map across jax versions: jax.shard_map (0.8+, ``check_vma``) vs
jax.experimental.shard_map (older, ``check_rep``)."""

from __future__ import annotations


def shard_map_compat(f, mesh, in_specs, out_specs):
    try:
        from jax import shard_map as sm
    except ImportError:
        from jax.experimental.shard_map import shard_map as sm
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)
    for kw in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      **kw)
        except TypeError:
            continue
    raise RuntimeError("no compatible shard_map signature found")
