"""Pallas kernel correctness (interpret mode on CPU) vs the XLA einsum path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu.ops.pallas_kernels import (bucket_gram_blocks, bucket_jtjv,
                                          jac_normal_matvec)


def test_bucket_jtjv_matches_einsum(rng):
    n, r, t = 37, 2, 12
    J = jnp.asarray(rng.normal(size=(n, r, t)))
    vb = jnp.asarray(rng.normal(size=(n, t)))
    got = bucket_jtjv(J, vb, tile_n=16)
    w = jnp.einsum("nrt,nt->nr", J, vb)
    expect = jnp.einsum("nrt,nr->nt", J, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-12)


def test_bucket_gram_blocks(rng):
    n, r, t = 21, 3, 5
    J = jnp.asarray(rng.normal(size=(n, r, t)))
    got = bucket_gram_blocks(J, tile_n=8)
    expect = jnp.einsum("nrt,nru->ntu", J, J)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-12)


def test_jac_normal_matvec(rng):
    import sys
    sys.path.insert(0, "tests")
    from test_linear_solvers import make_random_block_jacobian
    jac, res, groups = make_random_block_jacobian(rng)
    v = jnp.asarray(rng.normal(size=jac.num_cols))
    got = jac_normal_matvec(jac, v, use_pallas=True)
    expect = jac.rmatvec(jac.matvec(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-10)


def test_probe_cache_roundtrip(tmp_path):
    """Disk-backed Mosaic probe cache (utils/probecache): atomic write,
    corrupt-file tolerance, cross-'process' (fresh memory) hit."""
    import jax
    from ceres_tpu.utils import probecache

    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        probecache._MEM.clear()
        probecache._LOADED = False
        assert probecache.get(("k", 1, 2)) is None
        probecache.put(("k", 1, 2), True)
        probecache.put(("k", 3, 4), False)
        # simulate a fresh process
        probecache._MEM.clear()
        probecache._LOADED = False
        assert probecache.get(("k", 1, 2)) is True
        assert probecache.get(("k", 3, 4)) is False
        # corrupt file is ignored
        with open(str(tmp_path) + "/ct_probe_cache.json", "w") as f:
            f.write("{broken")
        probecache._MEM.clear()
        probecache._LOADED = False
        assert probecache.get(("k", 1, 2)) is None
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
        probecache._MEM.clear()
        probecache._LOADED = False
