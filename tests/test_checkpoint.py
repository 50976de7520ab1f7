import jax
import numpy as np

from ivfhnsw_tpu import (IVFADCGroupingIndex, IVFADCIndex, IndexConfig,
                         SearchParams)
from ivfhnsw_tpu.utils import checkpoint


def build_small(rng, grouping=False):
    nb, d = 6000, 16
    base = rng.randn(nb, d).astype(np.float32)
    queries = rng.randn(16, d).astype(np.float32)
    cfg = IndexConfig(d=d, nc=32, code_size=4,
                      nsubc=4 if grouping else 0, do_opq=True)
    idx = (IVFADCGroupingIndex if grouping else IVFADCIndex)(cfg)
    key = jax.random.PRNGKey(0)
    idx.train_centroids(key, base[:3000], niter=8)
    if grouping:
        idx.compute_neighbor_centroids()
    idx.train_pq(key, base[:2000], opq_niter=4)
    if grouping:
        idx.add(base, np.arange(nb, dtype=np.int32))
    else:
        idx.add_batch(base, np.arange(nb, dtype=np.int32))
    idx.finalize()
    return idx, queries


def test_checkpoint_roundtrip_ivfadc(tmp_path, rng):
    idx, queries = build_small(rng)
    p = SearchParams(k=10, nprobe=8, max_codes=0)
    d1, l1 = idx.search(queries, p)
    checkpoint.save_index(idx, str(tmp_path / "ckpt"))
    idx2 = checkpoint.load_index(str(tmp_path / "ckpt"))
    d2, l2 = idx2.search(queries, p)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_checkpoint_roundtrip_grouping(tmp_path, rng):
    idx, queries = build_small(rng, grouping=True)
    p = SearchParams(k=10, nprobe=8, max_codes=0, do_pruning=True)
    d1, l1 = idx.search(queries, p)
    checkpoint.save_index(idx, str(tmp_path / "gckpt"))
    idx2 = checkpoint.load_index(str(tmp_path / "gckpt"))
    assert isinstance(idx2, IVFADCGroupingIndex)
    d2, l2 = idx2.search(queries, p)
    np.testing.assert_array_equal(l1, l2)


def test_sharded_checkpoint(tmp_path, rng):
    from ivfhnsw_tpu.parallel import ShardedIVFADC, make_mesh
    idx, queries = build_small(rng)
    sharded = ShardedIVFADC(idx, make_mesh(4))
    checkpoint.save_sharded(sharded, str(tmp_path / "sckpt"))
    a = checkpoint.load_sharded_arrays(str(tmp_path / "sckpt"), 2)
    assert a["manifest"]["n_shards"] == 4
    np.testing.assert_array_equal(
        a["codes"], np.asarray(sharded.codes)[2])


def test_checkpoint_rejects_unknown_format(tmp_path):
    import json
    import pytest
    os_path = tmp_path / "bad"
    os_path.mkdir()
    (os_path / "manifest.json").write_text(json.dumps({"format": "nope"}))
    with pytest.raises(ValueError):
        checkpoint.load_index(str(os_path))
